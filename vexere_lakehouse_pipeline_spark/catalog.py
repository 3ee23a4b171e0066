"""Table catalog: schema contracts + loaders for the engine's tables.

The reference addresses every table by raw path with no Spark-side
catalog (`convert/to_silver.py:101-102` etc.).  The rebuild centralizes
that: one place that knows each table's contract (explicit StructType —
SURVEY.md §1.3 calls out the reference's untyped CSV ingest as a defect)
and can register everything as temp views for the SQL layer
(`convert/to_gold.py:21-26`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Synthetic star-schema tables (driver testdata, TESTDATA.md).  These are the
# engine-correctness tables; the vexere domain contracts live in
# sources/contracts.py.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Compute-spread helper (round-10 optimization): the testdata parquet
# files are single-file, SINGLE-ROW-GROUP tables, so Spark's scan can
# never parallelize them no matter how it splits the byte range — a
# split only reads row groups whose midpoint it covers, and there is
# exactly one.  Every expression the optimizer collapses onto the scan
# stage (decimal partial aggregates, interpreted higher-order vector
# folds, shingle explosion + minhashing) therefore ran on ONE task
# while 31 cores idled (measured: tpch_q1's scan+partial-agg stage = 3
# scheduled tasks but one did all 600k rows, 0.78s of single-threaded
# CPU; the ivfpq normalize stages were four ~0.9s single-task stages).
#
# A BLANKET repartition inside load_table was measured first and
# rejected: heavy-compute rows won 1-7s each, but every light star
# query paid the extra exchange (+0.2-1.2s each, consistent over 3
# reps) and the long bench session accumulated pathological state
# (sim_topk_int8 3.3s -> 12.9s in-session while the same plan is
# FASTER in isolation).  So the spread is OPT-IN at the operator/
# fixture call sites where profiling showed the win.
#
# Scale-adaptive by construction: it fires only when the plan's
# estimated input size is below VLPS_SPREAD_MAX_BYTES (default 256 MB)
# — at 100 TB every fact table exceeds that and the scan is natively
# parallel, so this is a no-op there; locally it fixes the
# 1-row-group serialization at the cost of shuffling a few MB once.
# Width = defaultParallelism, so the driver's lower-core-count bench
# runs scale the same way.


def spread_small_input(df: DataFrame, *key_cols: str,
                       parts: int | None = None,
                       min_bytes: int = 0) -> DataFrame:
    """Hash-repartition (round-robin when no key is given) a SMALL
    input so downstream per-row compute leaves the serial scan task.
    No-op when the estimated input exceeds ``VLPS_SPREAD_MAX_BYTES``
    (default 256 MB), is below ``min_bytes`` (callers whose downstream
    work is too light to repay the exchange), or ``VLPS_SPREAD=0``.

    Note (ADVICE r10): the VLPS_SPREAD* env vars are read at PLAN
    CONSTRUCTION time, once per call — they are experiment kill
    switches, not runtime conf; changing them mid-session changes
    plans built afterwards, never already-built ones."""
    import os

    if os.environ.get("VLPS_SPREAD", "1") == "0":
        return df
    hi = int(os.environ.get("VLPS_SPREAD_MAX_BYTES", str(256 * 1024 * 1024)))
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 - stats unavailable: leave layout alone
        return df
    if size > hi or size < min_bytes:
        return df
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    if key_cols:
        return df.repartition(n, *[F.col(k) for k in key_cols])
    return df.repartition(n)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table from parquet.

    Column pruning and predicate pushdown are left to Catalyst — callers
    select/filter on the returned DataFrame and the parquet scan only
    reads what the plan needs.  Compute-heavy consumers opt into
    :func:`spread_small_input` to move per-row work off the serial
    single-row-group scan task.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark only reads it via
        # this legacy conf.  Set it here (runtime SQL conf, idempotent) so
        # the engine works under ANY caller-provided SparkSession, not
        # just ones built by our session factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Micros-precision testdata timestamps carry no isAdjustedToUTC flag;
    # without this conf Spark 4 infers TIMESTAMP_NTZ, which breaks
    # unix_micros()/tz functions and diverges from the DuckDB oracle.
    # SCOPED set-and-restore: parquet schema inference happens eagerly
    # inside .parquet(), so the conf only needs to hold for this call —
    # leaving it flipped would silently retype the CALLER's own
    # unrelated parquet reads for the rest of the session.
    _ntz_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    _ntz_prev = spark.conf.get(_ntz_key, None)
    spark.conf.set(_ntz_key, "false")
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    finally:
        if _ntz_prev is None:
            spark.conf.unset(_ntz_key)
        else:
            spark.conf.set(_ntz_key, _ntz_prev)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # parquet TIMESTAMP(NANOS) read as long nanos (nanosAsLong) —
        # integer-divide to micros (exact; double division would lose
        # precision at 1e18 magnitudes) and restore a timestamp column.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col, dtype in df.dtypes:
        # Safety net for caller-provided sessions where the conf above
        # was fixed after a scan was planned: session tz is UTC, so the
        # NTZ->TZ cast is value-identical and folds into the scan.
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (S10 semantics —
    `createOrReplaceTempView`, convert/to_gold.py:21-26) so the SQL
    parity mode (`spark.sql`) sees the same names DuckDB does."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Vexere domain contracts (SURVEY.md §1.2) — explicit StructTypes replacing
# the reference's inferred/untyped schemas.
# ---------------------------------------------------------------------------

RAW_TICKET_SCHEMA = T.StructType(
    [
        T.StructField("Bus_Key", T.StringType()),
        T.StructField("Bus_Name", T.StringType()),
        T.StructField("Start_Date", T.StringType()),
        T.StructField("Route", T.StringType()),
        T.StructField("Departure_Time", T.StringType()),
        T.StructField("Arrival_Time", T.StringType()),
        T.StructField("Departure_Place", T.StringType()),
        T.StructField("Arrival_Place", T.StringType()),
        T.StructField("Duration", T.StringType()),
        T.StructField("Type_Bus", T.StringType()),
        T.StructField("Price", T.StringType()),
    ]
)

RAW_FACILITY_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.LongType()),
        T.StructField("Bus_Name", T.StringType()),
        # Lenient ingest: the crawler emits either a real JSON array or a
        # stringified Python list (dual-schema branch, to_silver.py:147-152).
        # Bronze keeps the raw string; silver conforms to array<string>.
        T.StructField("Facilities", T.StringType()),
    ]
)

RAW_REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("Bus_Name", T.StringType()),
        T.StructField("Customer_Name", T.StringType()),
        T.StructField("Stars", T.IntegerType()),
        T.StructField("Comment", T.StringType()),
        T.StructField("Date", T.StringType()),
    ]
)

BUS_IDS_SCHEMA = T.StructType(
    [
        T.StructField("Bus_Name", T.StringType()),
        T.StructField("Bus_Id", T.StringType()),
    ]
)

SILVER_TICKET_SCHEMA = T.StructType(
    [
        T.StructField("Bus_Key", T.LongType()),
        T.StructField("Bus_Id", T.StringType()),
        T.StructField("Bus_Name", T.StringType()),
        T.StructField("Start_Date", T.DateType()),
        T.StructField("Route", T.StringType()),
        T.StructField("Departure_Time", T.StringType()),
        T.StructField("Arrival_Time", T.StringType()),
        T.StructField("Departure_Place", T.StringType()),
        T.StructField("Arrival_Place", T.StringType()),
        T.StructField("Duration", T.FloatType()),
        T.StructField("Type_Bus", T.StringType()),
        T.StructField("Bus_Type_Category", T.StringType()),
        T.StructField("Price", T.IntegerType()),
    ]
)

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField("dag_id", T.StringType()),
        T.StructField("task_id", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("end_time", T.StringType()),
        T.StructField("duration_seconds", T.DoubleType()),
        T.StructField("try_number", T.IntegerType()),
        T.StructField("hostname", T.StringType()),
    ]
)
