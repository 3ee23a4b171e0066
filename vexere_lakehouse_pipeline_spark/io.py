"""Ingestion IO layer: contract-enforced scans and sinks (S1-S8).

The reference reads CSV untyped (header only, to_brz.py:15) and infers
JSON schemas (to_brz.py:21,27) — every downstream step then re-parses
strings.  Here every scan takes an explicit StructType contract
(lenient PERMISSIVE mode: malformed values null out rather than failing
mid-job; pass ``keep_corrupt=True`` to additionally capture each bad
raw line in a ``_corrupt_record`` column for quarantine/audit — Spark
only populates it when the column is present in the schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    # copy — StructType.add would mutate the caller's contract object
    from pyspark.sql.types import StringType, StructField

    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True, keep_corrupt: bool = False) -> DataFrame:
    """S1: header CSV scan with an enforced contract (PERMISSIVE mode:
    unparseable values → null, never a job failure at 100 TB).  With
    ``keep_corrupt`` the raw text of each malformed line is retained in
    ``_corrupt_record`` (null for clean rows) so ingest can quarantine
    instead of silently nulling."""
    if keep_corrupt:
        schema = _with_corrupt(schema)
    return (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
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


def read_text_corpus(spark: SparkSession, path: str,
                     whole_files: bool = False) -> DataFrame:
    """Raw-text corpus ingest: the missing first step when documents
    arrive as flat files rather than parquet.

    ``whole_files=False`` (default): one row per line — the layout for
    line-delimited corpora; at 100 TB the files split normally and
    parallelism follows maxPartitionBytes.  ``whole_files=True``: one
    row per FILE (``wholetext``) for document-per-file corpora; files
    become unsplittable, so this mode is for many small documents, not
    few giant ones.  Returns (path, text) — the source path rides along
    via the metadata column so provenance survives into bronze.
    """
    df = spark.read.text(path, wholetext=whole_files)
    return df.select(
        F.col("_metadata.file_path").alias("path"),
        F.col("value").alias("text"),
    )


def read_orc(spark: SparkSession, path: str,
             schema: StructType | None = None,
             merge_schema: bool = False) -> DataFrame:
    """ORC scan — the columnar alternative where the lake standard is
    ORC rather than parquet (Hive-heritage warehouses).  Same engine
    guarantees as the parquet path: predicate pushdown, column pruning,
    and vectorized reads all apply (Spark's native OrcFileFormat);
    ``merge_schema`` tolerates drift across files like the parquet
    ingest path (operators/incremental.py)."""
    reader = spark.read.option("mergeSchema", merge_schema)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              compression: str = "zstd") -> None:
    """ORC sink with zstd compression (the modern default: snappy-class
    speed at better ratios).  Partitioning semantics identical to the
    parquet zone sinks."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
