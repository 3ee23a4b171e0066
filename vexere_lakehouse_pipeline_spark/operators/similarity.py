"""Similarity search over embedding columns.

Two strategies, both pure DataFrame plans:

- **Brute force** — broadcast the (small) query set against the full
  candidate table, score with a JVM-side cosine fold, rank per query.
  Exact; scales linearly in |candidates| × |queries| and stays fully
  distributed (the candidate side never moves).
- **LSH-bucketed** — sign-bucket both sides (random-hyperplane-style),
  equi-join on the bucket, rank within.  Approximate; the join prunes
  the score count by ~2^bits.  An IVF variant would replace the bucket
  fn with a learned centroid id — same plan shape.

For very wide vectors a numpy/Arrow ``mapInPandas`` scorer can beat the
column fold; see operators/multimodal.py for the batch-UDF plumbing
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.functions.vectors import (
    cosine_similarity,
    sign_lsh_bucket,
)


def topk_bruteforce(candidates: DataFrame, queries: DataFrame, k: int = 5,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, vec_id, cos_sim, rank).  Deterministic: ranked
    by (cos_sim desc, vec_id) after 6dp rounding.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    c = candidates.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity("q_emb", "emb"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_lsh_bucketed(candidates: DataFrame, queries: DataFrame, k: int = 5,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      n_bits: int = 4) -> DataFrame:
    """Approximate top-k: candidates are scored only within the query's
    sign-LSH bucket.  Same output shape as :func:`topk_bruteforce`."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        sign_lsh_bucket(vec_col, n_bits).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        sign_lsh_bucket(vec_col, n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity("q_emb", "emb"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
