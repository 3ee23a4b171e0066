"""Physical-layout operators: multi-dimensional (Z-order) file
clustering for data skipping.

Parquet scans prune files/row-groups by min-max statistics; pruning
only works when the writer CLUSTERS rows so each file covers a small
range.  ``repartitionByRange + sortWithinPartitions`` on one key gives
perfect 1-D clustering but leaves every other column's per-file range
spanning the whole table.  Z-ordering interleaves the bits of several
normalized keys into one sort key, so every file's bounding box is
tight in ALL clustered dimensions — the same technique behind Delta
``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered rewrites, built here
from plain Column bit arithmetic (no UDF, JVM-side).

The min/max normalization bounds are scalar model state (like k-means
centroids): one tiny agg collected to the driver, embedded as
literals.  tests/test_layout.py shows the payoff: a narrow predicate
on the SECOND clustered column touches a fraction of the z-ordered
files but ALL linearly-sorted ones.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Interleaved-bit Z-order key over ``cols`` (numeric), each
    min-max normalized to ``bits`` bits.  Returns a bigint Column.
    Constant columns contribute zero bits (min == max -> bucket 0)."""
    n = len(cols)
    if bits * n > 62:  # bigint sign bit + headroom; shifts wrap mod 64
        raise ValueError(
            f"bits({bits}) * len(cols)({n}) = {bits * n} exceeds 62 — "
            "reduce bits (interleaved key must fit a signed 64-bit long)"
        )
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    scale = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo_v, hi_v = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo_v is None:  # empty frame or all-null column: contributes 0
            continue
        lo, hi = float(lo_v), float(hi_v)
        span = (hi - lo) or 1.0
        # NULL values sort with the minimum (bucket 0) rather than
        # silently landing in the MAX bucket (least() skips nulls).
        val = F.coalesce(F.col(c).cast("double"), F.lit(lo))
        bucket = F.least(
            F.lit(scale),
            F.floor((val - F.lit(lo)) / F.lit(span) * scale),
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 8, bits: int = 12) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order key of ``cols`` — range-partitioned so files hold disjoint
    key ranges, sorted within so row groups are tight too."""
    keyed = df.withColumn("_z", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear(df: DataFrame, path: str, col: str, n_files: int = 8) -> None:
    """1-D clustering baseline: range-partition + sort on one column."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(spark: SparkSession, path: str,
                      cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` — what a stats-based pruner sees.
    Driver loop over the file listing; used for layout audits/tests
    (production readers get this from the parquet footers directly)."""
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        row = (
            spark.read.parquet(os.path.join(path, name))
            .agg(
                *[F.min(c).alias(f"lo_{c}") for c in cols],
                *[F.max(c).alias(f"hi_{c}") for c in cols],
            )
            .first()
        )
        out.append({"file": name, **{k: row[k] for k in row.asDict()}})
    return out


def candidate_files(stats: list[dict], col: str, lo, hi) -> list[str]:
    """Files a min-max pruner must read for ``col BETWEEN lo AND hi``."""
    return [
        s["file"]
        for s in stats
        if not (s[f"hi_{col}"] < lo or s[f"lo_{col}"] > hi)
    ]


def fs_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(data_file_count, total_bytes) under ``path``, recursively,
    via the Hadoop FileSystem API — the same listing a lakehouse
    table-maintenance job does, so it works on HDFS/S3A paths, not
    just the local fs.  Hidden/metadata entries (``_SUCCESS``,
    ``.crc``) are excluded."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n = total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_files(spark: SparkSession, src: str, dst: str,
                  target_mb: float = 128,
                  order_by: list[str] | None = None,
                  fmt: str = "parquet") -> dict:
    """Small-file compaction — the ``OPTIMIZE`` table-maintenance
    operator (Delta OPTIMIZE / Iceberg rewrite_data_files): bin-pack a
    directory of small files into ``ceil(total_bytes / target_mb)``
    right-sized ones.  Streaming sinks and frequent small appends
    fragment tables into thousands of KB-scale files; at 100 TB that
    turns every scan into a file-open/footer-parse storm and starves
    the scheduler with million-task stages.  Compaction is pure
    layout — rows are bit-identical (oracle-gated by
    layout_compact_roundtrip; measured in tools/COMPACT.md).

    Two modes:

    - default (``order_by=None``): ``coalesce(n_out)`` — NO shuffle.
      Coalesce fuses input splits into n_out write tasks, so the job
      moves each byte exactly once, the cheapest possible rewrite.
      Caveat (documented Spark semantics): coalesce caps the whole
      stage's parallelism at n_out and packs by input-split order, so
      output sizes track input locality, not an exact target.
    - ``order_by=[cols]``: ``repartitionByRange + sortWithinPartitions``
      — one range shuffle that ALSO (re)clusters, so min-max pruning
      survives compaction (pass the Z-order key column for the
      ``OPTIMIZE ZORDER BY`` shape, see write_zordered).

    Production notes baked into the contract: compact per partition
    directory (src points AT the partition, the unit Delta/Iceberg
    compact under their partition locks), and write to a NEW dst then
    swap atomically via the table manifest (SnapshotTable.commit here;
    never overwrite src in place — a failed job would destroy data).

    Returns measured stats: files/bytes before and after + n_out.
    """
    files_before, bytes_before = fs_file_stats(spark, src)
    target_bytes = max(1, int(target_mb * (1 << 20)))  # fractional ok (tests)
    n_out = max(1, -(-bytes_before // target_bytes))
    df = spark.read.format(fmt).load(src)
    if order_by:
        out = (df.repartitionByRange(n_out, *order_by)
                 .sortWithinPartitions(*order_by))
    else:
        out = df.coalesce(n_out)
    out.write.format(fmt).mode("overwrite").save(dst)
    files_after, bytes_after = fs_file_stats(spark, dst)
    return {
        "files_before": files_before, "bytes_before": bytes_before,
        "files_after": files_after, "bytes_after": bytes_after,
        "n_out": n_out,
    }


def with_hilbert_key(df: DataFrame, cols: list[str], bits: int = 8,
                     out: str = "hkey") -> DataFrame:
    """Hilbert-curve clustering key over exactly two numeric columns —
    the space-filling curve behind Databricks liquid clustering and
    Iceberg's hilbert rewrite, and Z-order's stronger sibling: the
    Hilbert walk moves one grid cell at a time (no Z-shaped jumps
    across the key space), so consecutive key ranges are genuinely
    contiguous rectangles and per-file bounding boxes come out tighter
    on BOTH dimensions (measured vs zorder in tools/ZORDER_BYTES.md).

    Same min-max bucket normalization as :func:`zorder_key` (nulls ->
    bucket 0, constant column -> 0).  The classic per-bit
    reflect+rotate recurrence (Wikipedia "Hilbert curve", xy2d) is
    unrolled into one narrow projection per bit level — each level's
    (x, y, d) state lands in named columns, so the whole chain stays
    a linear pipeline of ~5-expression projects that whole-stage
    codegen fuses into one pass (a single nested Column expression
    would grow 4x per level).  Exactness vs the reference scalar
    implementation is pinned bit-for-bit in tests/test_layout.py; the
    DuckDB oracle (layout_hilbert_key) replays the same recurrence as
    a generated CTE chain.
    """
    if len(cols) != 2:
        raise ValueError(
            f"hilbert key is the classic 2-D curve — got {len(cols)} cols"
        )
    if 2 * bits > 62:
        raise ValueError(f"2 * bits({bits}) exceeds 62 — reduce bits")
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    scale = (1 << bits) - 1
    buckets = []
    for c in cols:
        lo_v, hi_v = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo_v is None:  # empty frame or all-null column
            buckets.append(F.lit(0).cast("long"))
            continue
        lo, hi = float(lo_v), float(hi_v)
        span = (hi - lo) or 1.0
        val = F.coalesce(F.col(c).cast("double"), F.lit(lo))
        buckets.append(
            F.least(
                F.lit(scale),
                F.floor((val - F.lit(lo)) / F.lit(span) * scale),
            ).cast("long")
        )
    n = 1 << bits
    keep = list(df.columns)
    cur = df.select(
        *keep,
        buckets[0].alias("_hx"),
        buckets[1].alias("_hy"),
        F.lit(0).cast("long").alias(out),
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        cur = cur.select(
            *keep,
            "_hx", "_hy", out,
            F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1)
            .otherwise(0).alias("_rx"),
            F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1)
            .otherwise(0).alias("_ry"),
        ).select(
            *keep,
            # reflect (around n-1) then swap, only in the ry == 0 arm
            F.when(
                F.col("_ry") == 0,
                F.when(F.col("_rx") == 1, F.lit(n - 1) - F.col("_hy"))
                .otherwise(F.col("_hy")),
            ).otherwise(F.col("_hx")).alias("_hx"),
            F.when(
                F.col("_ry") == 0,
                F.when(F.col("_rx") == 1, F.lit(n - 1) - F.col("_hx"))
                .otherwise(F.col("_hx")),
            ).otherwise(F.col("_hy")).alias("_hy"),
            (
                F.col(out)
                + F.lit(s).cast("long") * F.lit(s)
                * (
                    F.col("_rx") * (F.lit(3) - F.col("_ry"))
                    + (F.lit(1) - F.col("_rx")) * F.col("_ry")
                )
            ).alias(out),
        )
    return cur.drop("_hx", "_hy")


def write_hilbert(df: DataFrame, path: str, cols: list[str],
                  n_files: int = 8, bits: int = 8) -> None:
    """Write ``df`` clustered on the Hilbert key of ``cols`` — the
    liquid-clustering twin of :func:`write_zordered`."""
    (
        with_hilbert_key(df, cols, bits, out="_h")
        .repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(path)
    )
