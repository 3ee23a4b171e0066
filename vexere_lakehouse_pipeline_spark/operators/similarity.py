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


def topk_ivf(candidates: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 32, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the scale path.

    Build: every candidate is assigned to its nearest centroid (the
    inverted list).  Search: each query probes only its ``nprobe``
    nearest lists.  Scoring work drops from |C|×|Q| to
    ~|C|×nprobe/n_centroids×|Q|, and the list assignment is a plain
    column that big tables can be PARTITIONED/bucketed by — probes then
    touch only matching partitions.

    ``centroids`` is pluggable (pass pyspark.ml KMeans centers in
    production).  The default — the first ``n_centroids`` candidates by
    id — is a deterministic coarse quantizer that keeps the whole
    operator oracle-verifiable.
    """
    c = candidates.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb"))
    cents = (
        centroids
        if centroids is not None
        else c.filter(F.col("vec_id") < n_centroids)
    ).select(F.col("vec_id").alias("cid"), F.col("emb").alias("c_emb"))

    def nearest_lists(df: DataFrame, side_id: str, side_emb: str,
                      n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            side_id,
            side_emb,
            "cid",
            F.round(cosine_similarity(side_emb, "c_emb"), 6).alias("_cs"),
        )
        w = Window.partitionBy(side_id).orderBy(F.desc("_cs"), "cid")
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_cs", "_rn")
        )

    inverted = nearest_lists(c, "vec_id", "emb", 1)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    probes = nearest_lists(q, "query_id", "q_emb", nprobe)
    scored = (
        inverted.join(F.broadcast(probes), on="cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity("q_emb", "emb"), 6).alias("cos_sim"),
        )
        .distinct()  # a (query, candidate) pair can meet in ≤1 list; keep explicit
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
