"""Ingestion IO layer: contract-enforced scans and sinks (S1-S8).

The reference reads CSV untyped (header only, to_brz.py:15) and infers
JSON schemas (to_brz.py:21,27) — every downstream step then re-parses
strings.  Here every scan takes an explicit StructType contract
(lenient: malformed values null out, bad rows land in
``_corrupt_record`` instead of failing mid-job or silently drifting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True) -> DataFrame:
    """S1: header CSV scan with an enforced contract (PERMISSIVE mode:
    unparseable values → null, never a job failure at 100 TB)."""
    return (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType | None = None,
              multi_line: bool = False) -> DataFrame:
    """S2/S3: line-delimited or multiLine (pretty-printed array) JSON.
    Schema optional — inference is allowed for exploratory reads but
    contracts are preferred (inference = an extra full scan)."""
    reader = spark.read.option("multiLine", multi_line)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_single_json(df: DataFrame, path: str) -> None:
    """S7: single-file JSON sink (the reference's coalesce(1) + rename,
    crawl_faci.py:334-345).  Kept for interop exports only — a
    single-partition write is by definition not scalable; in-engine
    exchange uses zone tables."""
    df.coalesce(1).write.mode("overwrite").json(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, sort_cols: list[str] | None = None,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Bucketed saved table: pre-shuffles once at write time so every
    later equi-join/aggregation on ``bucket_cols`` between co-bucketed
    tables runs with ZERO exchange (SortMergeJoin reads both sides
    already partitioned — the 100 TB answer to repeated fact⋈fact
    joins on the same key).

    Bucketing requires the session catalog (``saveAsTable``) — plain
    ``.save(path)`` cannot record bucket metadata.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
