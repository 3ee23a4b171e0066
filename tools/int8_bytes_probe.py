"""Measure the int8 similarity path's scan-byte claim (VERDICT r3 #2).

The claimed 100 TB rationale for ``topk_int8`` is that int8 codes are a
4-8x smaller SCAN than float64 embeddings — a memory-bandwidth win that
local[32] wall-clock at sf0.1 cannot show (the per-pair fold is the
same O(d) either way, so the float path is faster when both tables sit
in page cache).  This probe measures the claim directly instead of
asserting it:

1. materialize the same (replicated) embedding corpus twice — float64
   arrays vs int8 codes stored as ``array<tinyint>`` parquet;
2. record on-disk bytes of both tables AND the per-column compressed
   column-chunk bytes from the parquet footers (pyarrow) — the
   embedding/q8 chunk bytes are EXACTLY what a column-pruned scan
   must move, which is the quantity the claim is about (Spark's
   local-mode stage inputBytes metric is unreliable — it reported
   ~2 KB for a 780 KB scan when probed — so the footer accounting is
   the trustworthy instrument here);
3. run the same top-k scoring over each and record wall time (expected
   NOT to improve locally: both tables are page-cache resident and the
   per-pair fold is O(d) either way — documenting that honestly is
   half the point);
4. write tools/INT8_BYTES.md (picked up into SCALE.md by
   tools/scale_probe.py) and print one JSON line.

Replicas are decorrelated with a deterministic per-replica, per-dim
perturbation — without it parquet dictionary-encodes the repeated
vectors and both tables shrink to fiction.

Usage: python tools/int8_bytes_probe.py [replication] (default 64).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from vexere_lakehouse_pipeline_spark.catalog import load_table  # noqa: E402
from vexere_lakehouse_pipeline_spark.operators.similarity import (  # noqa: E402
    quantize_int8_unit,
)
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _column_chunk_bytes(path: str, col_prefix: str) -> int:
    """Compressed bytes of every column chunk under ``col_prefix``
    across all parquet files in ``path`` — what a column-pruned scan
    of that column reads."""
    import pyarrow.parquet as pq

    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, f)).metadata
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for c in range(g.num_columns):
                    col = g.column(c)
                    if col.path_in_schema.split(".")[0] == col_prefix:
                        total += col.total_compressed_size
    return total


def _force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _topk_float(spark, path: str, k: int = 5) -> DataFrame:
    emb = spark.read.parquet(path)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("qv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", dot.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def _topk_int8(spark, path: str, k: int = 5) -> DataFrame:
    codes = spark.read.parquet(path)
    q = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("q8").alias("qq")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("q8"), F.col("qq"), lambda a, b: a.cast("long") * b
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", dot.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = build_session(
        "int8-bytes-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, BASE, "embeddings").select("vec_id", "embedding")
    # replicate rep x with disjoint ids; replica 0 keeps the original
    # ids so the query set (vec_id < 10) is identical in both tables
    replicated = (
        emb.crossJoin(
            spark.range(rep).select(F.col("id").cast("int").alias("_r"))
        )
        .select(
            (F.col("vec_id") + F.col("_r").cast("long") * 10_000_000).alias(
                "vec_id"
            ),
            # deterministic per-(replica, dim) perturbation: distinct
            # values everywhere, so parquet cannot dictionary-encode
            # the replication away (and the codes differ per replica
            # too — the perturbation changes direction, not just scale)
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: x
                + (
                    F.pmod(F.col("_r") * 31 + i * 7, F.lit(101)) - 50
                ).cast("double")
                / 10000.0,
            ).alias("embedding"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="int8probe_")
    floats_path = os.path.join(tmp, "floats")
    codes_path = os.path.join(tmp, "codes")
    replicated.write.mode("overwrite").parquet(floats_path)
    codes = quantize_int8_unit(
        spark.read.parquet(floats_path), "embedding", "q8"
    ).select(
        "vec_id",
        F.col("q8")
        .cast("array<tinyint>")  # codes are in [-127, 127] by construction
        .alias("q8"),
    )
    codes.write.mode("overwrite").parquet(codes_path)

    float_bytes = _du(floats_path)
    code_bytes = _du(codes_path)
    float_col = _column_chunk_bytes(floats_path, "embedding")
    code_col = _column_chunk_bytes(codes_path, "q8")

    results: dict[str, float] = {}
    for name, fn, path in (
        ("float64", _topk_float, floats_path),
        ("int8", _topk_int8, codes_path),
    ):
        _force(fn(spark, path))  # warm codegen
        spark.catalog.clearCache()
        t0 = time.time()
        _force(fn(spark, path))
        results[name] = round(time.time() - t0, 2)

    out = {
        "replication": rep,
        "rows": emb.count() * rep,
        "file_bytes": {"float64": float_bytes, "int8": code_bytes},
        "file_ratio": round(float_bytes / code_bytes, 2),
        "vector_column_bytes": {"float64": float_col, "int8": code_col},
        "vector_column_ratio": round(float_col / max(1, code_col), 2),
        "wall_s": results,
    }
    md = [
        "## int8 similarity codes — measured scan-byte reduction",
        "",
        "The int8 path's at-scale rationale (topk_int8 docstring) is a "
        "scan-byte claim, measured here rather than asserted "
        "(tools/int8_bytes_probe.py): the same replicated corpus "
        "materialized as float64 arrays vs array<tinyint> codes, "
        "scored with the same broadcast top-k, bytes from the parquet "
        "footers.",
        "",
        "| metric | float64 | int8 codes | ratio |",
        "|---|---|---|---|",
        f"| parquet file bytes | {float_bytes:,} | {code_bytes:,} | "
        f"{out['file_ratio']}x |",
        "| vector column-chunk bytes (what a pruned scan reads) | "
        f"{float_col:,} | {code_col:,} | {out['vector_column_ratio']}x |",
        f"| local wall (s, {out['rows']:,} rows x 64 dims) | "
        f"{out['wall_s']['float64']} | {out['wall_s']['int8']} | — |",
        "",
        "Reading: the byte ratios are the 100 TB story (a scan-bound "
        "fleet moves that much less data); local wall-clock does NOT "
        "show it because both tables fit in page cache and the per-pair "
        "fold costs the same O(d) either way — which is exactly why the "
        "claim needed a bytes measurement, not a stopwatch.  Column-"
        "chunk bytes come from the parquet footers (compressed size of "
        "the embedding/q8 chunks), the exact volume a column-pruned "
        "scan moves per table.",
        "",
    ]
    md_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "INT8_BYTES.md")
    with open(md_path, "w") as f:
        f.write("\n".join(md))
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
