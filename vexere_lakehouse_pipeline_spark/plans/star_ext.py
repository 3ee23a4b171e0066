"""Extended coverage queries: pandas-UDF sentiment through the oracle
gate, rollup subtotals, pivot, and the batch twin of the streaming
windowed aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.text import LANG_TOKEN_SPLIT_RE
from vexere_lakehouse_pipeline_spark.operators import sampling
from vexere_lakehouse_pipeline_spark.operators.nlp import sentiment_udf
from vexere_lakehouse_pipeline_spark.plans import star as _star
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Sentiment scoring (U5): the ACTUAL Arrow-batched pandas UDF runs on
# Spark; the oracle re-derives the md5-arithmetic contract in SQL.
# This is the one deliberate Python-path query — it exists to pin the
# UDF surface (Arrow batches, struct return), not as the scale path.
# ---------------------------------------------------------------------------
_HEX = "0123456789abcdef"


def _duck_md5_byte(k: int) -> str:  # 0-indexed byte of md5(text)
    c1 = f"substr(md5(text), {2 * k + 1}, 1)"
    c2 = f"substr(md5(text), {2 * k + 2}, 1)"
    return f"((instr('{_HEX}', {c1}) - 1) * 16 + instr('{_HEX}', {c2}) - 1)"


@_register(
    "nlp_sentiment_scores",
    f"""
    WITH b AS (
        SELECT doc_id,
               {_duck_md5_byte(0)} + 1 AS a,
               {_duck_md5_byte(1)} + 1 AS bb,
               {_duck_md5_byte(2)} + 1 AS c
        FROM documents
    )
    SELECT doc_id,
           -- NULL text: md5 propagates NULL, but the scorer contract is
           -- (0, 0, 1) for missing text — mirror fake_score_batch's
           -- None branch exactly
           CASE WHEN a IS NULL THEN 0.0
                ELSE CAST((a * 10000) // (a + bb + c) AS DOUBLE) / 10000
           END AS pos,
           CASE WHEN a IS NULL THEN 0.0
                ELSE CAST((bb * 10000) // (a + bb + c) AS DOUBLE) / 10000
           END AS neg,
           CASE WHEN a IS NULL THEN 1.0
                ELSE CAST((c * 10000) // (a + bb + c) AS DOUBLE) / 10000
           END AS neu
    FROM b ORDER BY doc_id
    """,
)
def nlp_sentiment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("s", sentiment_udf()("text"))
        .select("doc_id", "s.pos", "s.neg", "s.neu")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# ROLLUP subtotals (beyond the reference's flat GROUP BYs — the engine
# exposes cube/rollup/grouping sets).
# ---------------------------------------------------------------------------
@_register(
    "agg_rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation in the oracle — identical column names).
# ---------------------------------------------------------------------------
@_register(
    "agg_pivot_status_counts",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Batch twin of streaming.windowed_event_counts — same semantics the
# watermarked stream produces for closed windows.
# ---------------------------------------------------------------------------
@_register(
    "events_hourly_windows",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Watermark-discard twin — oracle-gates the streaming LATE-DATA rule
# that events_hourly_windows (the closed-window twin above) cannot
# see.  A deterministic ~5% of events is declared late (arrives 3h
# after its event time, hash-chosen so both engines agree); arrivals
# are grouped into hourly micro-batches; the per-batch watermark is
# the running max of preceding batches' event time minus 1h; a row is
# counted by the "stream" only while its window's end is beyond that
# watermark (streaming/ingest.py:watermark_accepted_flags — the
# append-mode state-eviction rule, engine-equivalence pinned in
# tests/test_joins_stateful.py).  Output compares the stream's window
# counts against the full batch truth: n_dropped is exactly the late
# data a real stream would lose at this watermark.
# ---------------------------------------------------------------------------
_LATE_BOUND = 3277  # ~5% of 65536 hash buckets


@_register(
    "events_watermark_discard_twin",
    f"""
    WITH e AS (
        SELECT event_id, event_type, ts, value,
               CASE WHEN {sampling.hash_bucket_sql('event_id', 'late')}
                         < {_LATE_BOUND}
                    THEN ts + INTERVAL 3 HOUR ELSE ts END AS arrival_ts
        FROM events
    ),
    e2 AS (SELECT *, date_trunc('hour', arrival_ts) AS batch FROM e),
    bm AS (SELECT batch, MAX(ts) AS bmax FROM e2 GROUP BY batch),
    wm AS (SELECT batch,
                  MAX(bmax) OVER (ORDER BY batch
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
                  - INTERVAL 1 HOUR AS wm
           FROM bm),
    acc AS (SELECT e2.*,
                   (wm.wm IS NULL
                    OR date_trunc('hour', e2.ts) + INTERVAL 1 HOUR > wm.wm)
                       AS ok
            FROM e2 JOIN wm USING (batch))
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(COUNT(*) FILTER (WHERE ok) AS BIGINT) AS n_stream,
           CAST(COUNT(*) FILTER (WHERE NOT ok) AS BIGINT) AS n_dropped,
           CAST(ROUND(COALESCE(
                    SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE ok),
                    0), 2) AS DOUBLE) AS total_value_stream
    FROM acc GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_watermark_discard_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        watermark_accepted_flags,
    )

    events = load_table(spark, sf_dir, "events")
    seeded = events.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.when(
            sampling.hash_bucket("event_id", "late") < _LATE_BOUND,
            F.col("ts") + F.expr("INTERVAL 3 HOURS"),
        )
        .otherwise(F.col("ts"))
        .alias("arrival_ts"),
    )
    flagged = watermark_accepted_flags(seeded)
    ok = F.col("ok")
    return (
        flagged.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_batch"),
            F.count(F.when(ok, 1)).alias("n_stream"),
            F.count(F.when(~ok, 1)).alias("n_dropped"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(ok, F.col("value").cast("decimal(18,2)"))
                    ),
                    F.lit(0).cast("decimal(18,2)"),
                ),
                2,
            )
            .cast("double")
            .alias("total_value_stream"),
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Dedup-within-watermark twin — oracle-gates the streaming
# dropDuplicatesWithinWatermark semantics (streaming/ingest.py:
# stream_dedup) the way the discard twin above gates the late-data
# rule.  Same deterministic arrival seeding; key = (user_id,
# event_type), delay 2h.  The per-key state walk is a chain recurrence
# (each acceptance depends on the previous ACCEPTED row's expiry), so
# the Spark side runs it as an applyInPandas group walk
# (ingest.dedup_within_watermark_flags — real-engine equivalence
# pinned in tests/test_joins_stateful.py) and the DuckDB side as a
# recursive CTE stepping row-by-row per key.  Output: per event_type,
# how many rows the stream would emit vs drop as in-window duplicates
# vs drop as late input.
# ---------------------------------------------------------------------------
@_register(
    "events_dedup_within_watermark_twin",
    f"""
    WITH RECURSIVE e AS (
        SELECT event_id, user_id, event_type, ts,
               CASE WHEN {sampling.hash_bucket_sql('event_id', 'late')}
                         < {_LATE_BOUND}
                    THEN ts + INTERVAL 3 HOUR ELSE ts END AS arrival_ts
        FROM events
    ),
    e2 AS (SELECT *, date_trunc('hour', arrival_ts) AS batch FROM e),
    bm AS (SELECT batch, MAX(ts) AS bmax FROM e2 GROUP BY batch),
    wm AS (SELECT batch,
                  MAX(bmax) OVER (ORDER BY batch
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
                  - INTERVAL 2 HOUR AS wm
           FROM bm),
    j AS (SELECT e2.*, wm.wm,
                 (wm.wm IS NOT NULL AND e2.ts < wm.wm) AS is_late
          FROM e2 JOIN wm USING (batch)),
    nl AS (SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY batch, ts, event_id) AS rn
           FROM j WHERE NOT is_late),
    ch AS (
        SELECT user_id, event_type, rn, TRUE AS kept,
               ts + INTERVAL 2 HOUR AS expiry
        FROM nl WHERE rn = 1
        UNION ALL
        SELECT n.user_id, n.event_type, n.rn,
               (n.wm IS NOT NULL AND n.wm >= ch.expiry) AS kept,
               CASE WHEN n.wm IS NOT NULL AND n.wm >= ch.expiry
                    THEN n.ts + INTERVAL 2 HOUR ELSE ch.expiry END AS expiry
        FROM nl n JOIN ch ON n.user_id = ch.user_id
                         AND n.event_type = ch.event_type
                         AND n.rn = ch.rn + 1
    ),
    statuses AS (
        SELECT event_type, 'late' AS status FROM j WHERE is_late
        UNION ALL
        SELECT event_type, CASE WHEN kept THEN 'kept' ELSE 'dup' END
        FROM ch
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE status = 'kept') AS BIGINT)
               AS n_kept,
           CAST(COUNT(*) FILTER (WHERE status = 'dup') AS BIGINT)
               AS n_dup_dropped,
           CAST(COUNT(*) FILTER (WHERE status = 'late') AS BIGINT)
               AS n_late_dropped
    FROM statuses GROUP BY event_type ORDER BY event_type
    """,
)
def events_dedup_within_watermark_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        dedup_within_watermark_flags,
    )

    events = load_table(spark, sf_dir, "events")
    seeded = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.when(
            sampling.hash_bucket("event_id", "late") < _LATE_BOUND,
            F.col("ts") + F.expr("INTERVAL 3 HOURS"),
        )
        .otherwise(F.col("ts"))
        .alias("arrival_ts"),
    )
    flagged = dedup_within_watermark_flags(
        seeded, ["user_id", "event_type"], delay="2 hours"
    )
    s = F.col("status")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(s == "kept", 1)).alias("n_kept"),
            F.count(F.when(s == "dup", 1)).alias("n_dup_dropped"),
            F.count(F.when(s == "late", 1)).alias("n_late_dropped"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# JSON functions — events.props is a JSON string column; extract + typed
# aggregate (the reference handles JSON only at scan time, SURVEY §2.7).
# ---------------------------------------------------------------------------
@_register(
    "events_json_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Date/time function family — trunc/extract/diff/last_day over orders.
# ---------------------------------------------------------------------------
@_register(
    "datetime_function_showcase",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(EXTRACT(dow FROM CAST(o_orderdate AS DATE)) AS INTEGER) AS first_dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           COUNT(*) AS n_orders,
           CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01'))
                AS INTEGER) AS max_days_to_2002
    FROM orders
    GROUP BY 1, 2, 3 ORDER BY 1, 2
    """,
)
def datetime_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
            # DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1
            (F.dayofweek(d) - 1).cast("int").alias("first_dow"),
            F.last_day(d).alias("month_end"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.max(F.datediff(F.lit("2002-01-01").cast("date"), d))
            .cast("int")
            .alias("max_days_to_2002"),
        )
        .orderBy("order_month", "first_dow")
    )


# ---------------------------------------------------------------------------
# Array function family — sort/distinct/slice/contains over token arrays.
# ---------------------------------------------------------------------------
@_register(
    "array_function_showcase",
    f"""
    WITH t AS (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '{LANG_TOKEN_SPLIT_RE}'),
                           x -> x <> '') AS w
               FROM documents)
    SELECT doc_id,
           CAST(len(w) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(w)) AS INTEGER) AS n_unique,
           array_to_string(list_sort(list_distinct(w))[1:3], '|') AS first3_sorted,
           CAST(list_contains(w, 'the') AS BOOLEAN) AS has_the
    FROM t ORDER BY doc_id
    """,
)
def array_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    w = tokenize("text")
    return docs.select(
        "doc_id",
        F.size(w).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("int").alias("n_unique"),
        F.concat_ws("|", F.slice(F.array_sort(F.array_distinct(w)), 1, 3)).alias(
            "first3_sorted"
        ),
        F.array_contains(w, "the").alias("has_the"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# String function family — the scalar surface beyond the cleaning chain.
# ---------------------------------------------------------------------------
@_register(
    "string_function_showcase",
    """
    SELECT s_suppkey,
           upper(s_name) AS uname,
           CAST(length(s_name) AS INTEGER) AS name_len,
           substr(s_name, 1, 4) AS prefix,
           replace(s_name, '_', '-') AS dashed,
           CAST(strpos(s_name, '1') AS INTEGER) AS pos1,
           lpad(CAST(s_suppkey AS VARCHAR), 6, '0') AS padded,
           reverse(s_name) AS rname,
           trim(concat('  ', s_name, '  ')) AS trimmed
    FROM supplier ORDER BY s_suppkey
    """,
)
def string_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.upper("s_name").alias("uname"),
        F.length("s_name").cast("int").alias("name_len"),
        F.substring("s_name", 1, 4).alias("prefix"),
        F.replace(F.col("s_name"), F.lit("_"), F.lit("-")).alias("dashed"),
        F.instr(F.col("s_name"), "1").cast("int").alias("pos1"),
        F.lpad(F.col("s_suppkey").cast("string"), 6, "0").alias("padded"),
        F.reverse("s_name").alias("rname"),
        F.trim(F.concat(F.lit("  "), F.col("s_name"), F.lit("  "))).alias(
            "trimmed"
        ),
    ).orderBy("s_suppkey")


# ---------------------------------------------------------------------------
# Unpivot/stack — wide measures to long (measure, value) rows; DuckDB
# oracle uses the portable UNION ALL form.
# ---------------------------------------------------------------------------
@_register(
    "reshape_unpivot_measures",
    """
    WITH agg AS (
        SELECT l_returnflag,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS sum_qty,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS sum_price,
               CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    ORDER BY l_returnflag, measure
    """,
)
def reshape_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double").alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double").alias("sum_price"),
        F.round(F.sum(F.col("l_discount").cast("decimal(18,2)")), 2)
        .cast("double").alias("sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("l_returnflag", "measure")


# ---------------------------------------------------------------------------
# GROUPING SETS — non-hierarchical multi-grouping in one pass (neither
# rollup nor cube expresses {(returnflag), (linestatus)}).  One shuffle
# produces both groupings; at scale this halves the fact-scan cost vs
# two separate aggregations + union.
# ---------------------------------------------------------------------------
@_register(
    "agg_grouping_sets_flags",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_price,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY returnflag, linestatus
    """,
)
def agg_grouping_sets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n_items",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# VariantType semi-structured path (Spark 4): parse the JSON props
# column ONCE into a variant, then extract typed fields.  At scale this
# beats per-field get_json_object (which re-parses the string per
# extraction) — variant stores a parsed binary form, so N extractions
# cost one parse.  Values are identical to the string-JSON path, so the
# DuckDB oracle is plain json_extract.
# ---------------------------------------------------------------------------
@_register(
    "events_variant_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                      THEN 1 END) AS n_big
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("p")
    ).select(
        "event_type",
        F.variant_get("p", "$.k", "bigint").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_big"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Data-quality expectations report (operators/quality.check): violation
# counts for a whole expectation suite in ONE scan+aggregation.
# ---------------------------------------------------------------------------
@_register(
    "quality_expectations_report",
    """
    WITH agg AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(CASE WHEN NOT COALESCE(l_quantity > 0, FALSE)
                          THEN 1 END) AS qty_positive,
               COUNT(CASE WHEN NOT COALESCE(l_discount BETWEEN 0 AND 1, FALSE)
                          THEN 1 END) AS discount_unit_interval,
               COUNT(CASE WHEN NOT COALESCE(l_shipdate IS NOT NULL, FALSE)
                          THEN 1 END) AS shipdate_not_null,
               COUNT(CASE WHEN NOT COALESCE(l_extendedprice >= l_quantity, FALSE)
                          THEN 1 END) AS price_at_least_qty
        FROM lineitem
    )
    SELECT 'discount_unit_interval' AS expectation,
           discount_unit_interval AS n_violations, n_rows FROM agg
    UNION ALL
    SELECT 'price_at_least_qty', price_at_least_qty, n_rows FROM agg
    UNION ALL
    SELECT 'qty_positive', qty_positive, n_rows FROM agg
    UNION ALL
    SELECT 'shipdate_not_null', shipdate_not_null, n_rows FROM agg
    ORDER BY expectation
    """,
)
def quality_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.quality import check

    li = load_table(spark, sf_dir, "lineitem")
    return check(
        li,
        {
            "qty_positive": F.col("l_quantity") > 0,
            "discount_unit_interval": F.col("l_discount").between(0, 1),
            "shipdate_not_null": F.col("l_shipdate").isNotNull(),
            "price_at_least_qty": F.col("l_extendedprice") >= F.col("l_quantity"),
        },
    ).orderBy("expectation")


# ---------------------------------------------------------------------------
# RANGE frame on event time — sliding 1-hour revenue per user: every
# purchase row sees the sum of its trailing hour (value-based frame, not
# row-count).  Frames bound state by TIME, the shape rowsBetween can't
# express when event density varies.
# ---------------------------------------------------------------------------
@_register(
    "window_trailing_hour_value",
    """
    WITH p AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id,
           CAST(SUM(v) OVER (
               PARTITION BY user_id ORDER BY ts_s
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_hour_value
    FROM p ORDER BY user_id, event_id
    """,
)
def window_trailing_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return p.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).cast("double").alias("trailing_hour_value"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# first_value / last_value / nth_value over a full-partition frame —
# per-customer order trajectory (first, latest, second order values).
# last_value needs the explicit unbounded-following frame (the default
# frame ends at CURRENT ROW, a classic window footgun both engines
# share).
# ---------------------------------------------------------------------------
@_register(
    "window_first_last_orders",
    """
    WITH o AS (
        SELECT o_custkey, o_orderkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders
    ), traj AS (
        SELECT o_custkey,
               FIRST_VALUE(price) OVER w AS first_order_value,
               LAST_VALUE(price) OVER w AS last_order_value,
               NTH_VALUE(price, 2) OVER w AS second_order_value,
               ROW_NUMBER() OVER w AS rn
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT o_custkey AS custkey,
           CAST(first_order_value AS DOUBLE) AS first_order_value,
           CAST(last_order_value AS DOUBLE) AS last_order_value,
           CAST(second_order_value AS DOUBLE) AS second_order_value
    FROM traj WHERE rn = 1 ORDER BY custkey
    """,
)
def window_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    traj = o.select(
        F.col("o_custkey").alias("custkey"),
        F.first("price").over(w).alias("first_order_value"),
        F.last("price").over(w).alias("last_order_value"),
        F.nth_value("price", 2).over(w).alias("second_order_value"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderkey"))
        .alias("rn"),
    )
    return (
        traj.filter(F.col("rn") == 1)
        .select(
            "custkey",
            F.col("first_order_value").cast("double").alias("first_order_value"),
            F.col("last_order_value").cast("double").alias("last_order_value"),
            F.col("second_order_value").cast("double").alias("second_order_value"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# ANSI-safe arithmetic — try_divide / try_to_number return NULL instead
# of raising under ANSI mode (Spark 4 default).  The engine's pattern
# for dirty numeric input: parse failures and div-by-zero become nulls
# the quality layer can count, not job failures.
# ---------------------------------------------------------------------------
@_register(
    "ansi_safe_arithmetic",
    """
    SELECT s_suppkey,
           CAST(TRY_CAST(s_name AS DOUBLE) AS DOUBLE) AS bad_parse,
           ROUND(CAST(s_acctbal AS DOUBLE)
                / NULLIF(s_suppkey % 3, 0), 4) AS per_unit
    FROM supplier ORDER BY s_suppkey
    """,
)
def ansi_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.try_to_number("s_name", F.lit("999")).cast("double").alias("bad_parse"),
        F.round(
            F.try_divide(
                F.col("s_acctbal").cast("double"),
                F.nullif(F.col("s_suppkey") % 3, F.lit(0)),
            ),
            4,
        ).alias("per_unit"),
    ).orderBy("s_suppkey")


# ---------------------------------------------------------------------------
# Map function family — build a per-user map<event_type, count>, filter
# entries inside the map, then explode back to rows (map_from_entries /
# map_filter / explode).  Result is row-shaped so the oracle compares
# plain tuples; the map is the intermediate, as it would be in a
# feature-store column.
# ---------------------------------------------------------------------------
@_register(
    "map_function_showcase",
    """
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, n FROM counts
    WHERE n >= 3 AND user_id < 50
    ORDER BY user_id, event_type
    """,
)
def map_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    per_user_map = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            ).alias("m")
        )
        .withColumn("m", F.map_filter("m", lambda _, v: v >= 3))
    )
    return (
        per_user_map.select("user_id", F.explode("m").alias("event_type", "n"))
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Dataset profiling (operators/quality.profile): per-column stats for
# the whole table in one aggregation pass.
# ---------------------------------------------------------------------------
@_register(
    "quality_table_profile",
    """
    WITH agg AS (
        SELECT COUNT(*) AS n,
               COUNT(l_quantity) AS q_nn, COUNT(DISTINCT l_quantity) AS q_nd,
               MIN(CAST(l_quantity AS DOUBLE)) AS q_lo,
               MAX(CAST(l_quantity AS DOUBLE)) AS q_hi,
               COUNT(l_discount) AS d_nn, COUNT(DISTINCT l_discount) AS d_nd,
               MIN(CAST(l_discount AS DOUBLE)) AS d_lo,
               MAX(CAST(l_discount AS DOUBLE)) AS d_hi
        FROM lineitem
    )
    SELECT 'l_discount' AS "column", n AS n_rows, n - d_nn AS n_null,
           d_nd AS n_distinct, d_lo AS min_value, d_hi AS max_value FROM agg
    UNION ALL
    SELECT 'l_quantity', n, n - q_nn, q_nd, q_lo, q_hi FROM agg
    ORDER BY "column"
    """,
)
def quality_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.quality import profile

    li = load_table(spark, sf_dir, "lineitem")
    return profile(li, ["l_quantity", "l_discount"]).orderBy("column")


# ---------------------------------------------------------------------------
# Cohort retention — users bucketed by signup week, activity counted by
# weeks-since-signup: the classic triangle. Self-join of the events
# fact with its own signup slice (broadcastable — signups are a small
# fraction) then a two-key aggregation.
# ---------------------------------------------------------------------------
@_register(
    "events_cohort_retention",
    """
    WITH signup AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS signup_date
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT CAST(date_trunc('week', signup_date) AS DATE) AS cohort_week,
           CAST(FLOOR(date_diff('day', signup_date, CAST(e.ts AS DATE)) / 7)
                AS INT) AS weeks_since,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN signup s ON s.user_id = e.user_id
    WHERE CAST(e.ts AS DATE) >= signup_date
    GROUP BY 1, 2 ORDER BY cohort_week, weeks_since
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("signup_date"))
    )
    return (
        # no broadcast hint: signup is per-user (fact-derived) — it
        # grows with the user population; AQE broadcasts iff it fits
        ev.join(signup, on="user_id")
        .filter(F.to_date("ts") >= F.col("signup_date"))
        .groupBy(
            F.date_trunc("week", "signup_date").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.col("signup_date")) / 7
            ).cast("int").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


# ---------------------------------------------------------------------------
# Funnel analysis — ordered view -> click -> purchase conversion: a
# user converts at step N only if step N's first event follows step
# N-1's.  One conditional-MIN aggregation per user (no joins, no
# window), then a single funnel-count row.
# ---------------------------------------------------------------------------
@_register(
    "events_funnel_conversion",
    """
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id
    )
    SELECT
        COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS step1_view,
        COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                   THEN 1 END) AS step2_click,
        COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                   AND t_buy > t_click THEN 1 END) AS step3_purchase
    FROM per_user
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    reached2 = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("step1_view"),
        F.count(F.when(reached2, 1)).alias("step2_click"),
        F.count(F.when(reached2 & (F.col("t_buy") > F.col("t_click")), 1)).alias(
            "step3_purchase"
        ),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram — price distribution in 20 buckets via floor
# arithmetic (portable; width_bucket isn't).  Bucketing is the
# map-side; one small shuffle on bucket id.
# ---------------------------------------------------------------------------
@_register(
    "agg_price_histogram",
    """
    WITH b AS (
        SELECT LEAST(19, CAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 20.0))
                              AS INT)) AS bucket
        FROM orders,
             (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
              FROM orders)
    )
    SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    return (
        o.join(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(19),
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / 20.0)
                ).cast("int"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Multi-resolution time rollup — the hypertable "continuous aggregate"
# shape: ONE pass over the events fact produces minute, hour, day, and
# grand-total aggregates via ROLLUP on the truncation hierarchy
# (date_trunc is functionally dependent minute -> hour -> day, so the
# rollup lattice is exactly the resolution ladder).  At 100 TB this
# replaces three separate scans with one; Spark expands the rollup
# into partial aggregates BEFORE the exchange, so the shuffle carries
# pre-combined rows per (grain, bucket), not raw events.
# ---------------------------------------------------------------------------
@_register(
    "events_multires_rollup",
    """
    SELECT CAST(ts AS DATE) AS day,
           date_trunc('hour', ts) AS hr,
           date_trunc('minute', ts) AS mi,
           CASE WHEN CAST(ts AS DATE) IS NULL THEN 'total'
                WHEN date_trunc('hour', ts) IS NULL THEN 'day'
                WHEN date_trunc('minute', ts) IS NULL THEN 'hour'
                ELSE 'minute' END AS grain,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_value
    FROM events
    GROUP BY ROLLUP (CAST(ts AS DATE), date_trunc('hour', ts),
                     date_trunc('minute', ts))
    ORDER BY day NULLS FIRST, hr NULLS FIRST, mi NULLS FIRST
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    g = events.select(
        F.to_date("ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hr"),
        F.date_trunc("minute", "ts").alias("mi"),
        "value",
    )
    return (
        g.rollup("day", "hr", "mi")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        # grain labels come from the rollup's NULLed-out columns (ts is
        # never null in events, so NULL here means "aggregated away").
        .withColumn(
            "grain",
            F.when(F.col("day").isNull(), "total")
            .when(F.col("hr").isNull(), "day")
            .when(F.col("mi").isNull(), "hour")
            .otherwise("minute"),
        )
        .select("day", "hr", "mi", "grain", "n_events", "total_value")
        .orderBy(
            F.col("day").asc_nulls_first(),
            F.col("hr").asc_nulls_first(),
            F.col("mi").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (operators/quality.fk_orphan_audit): every
# declared FK edge of the star schema in one report — rows, null keys,
# orphan rows/keys per edge.  The publish-gate a warehouse load runs
# after ingest; at scale each edge is a distinct-key anti-join (keys
# shuffle, rows never do; dimension parents broadcast).
# ---------------------------------------------------------------------------
_FK_EDGES = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]

_FK_SQL = " UNION ALL ".join(
    f"""SELECT '{edge}' AS edge,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {c}) AS n_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {c}
        WHERE {ck} IS NULL) AS n_null_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {c}
        WHERE {ck} IS NOT NULL AND {ck} NOT IN
              (SELECT {pk} FROM {p} WHERE {pk} IS NOT NULL))
           AS n_orphan_rows,
       (SELECT CAST(COUNT(DISTINCT {ck}) AS BIGINT) FROM {c}
        WHERE {ck} IS NOT NULL AND {ck} NOT IN
              (SELECT {pk} FROM {p} WHERE {pk} IS NOT NULL))
           AS n_orphan_keys"""
    for edge, c, ck, p, pk in _FK_EDGES
)


@_register(
    "quality_fk_integrity",
    f"SELECT * FROM ({_FK_SQL}) ORDER BY edge",
)
def quality_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.quality import (
        fk_orphan_audit,
    )

    reports = None
    for edge, child, ck, parent, pk in _FK_EDGES:
        r = fk_orphan_audit(
            load_table(spark, sf_dir, child), ck,
            load_table(spark, sf_dir, parent), pk, edge,
        )
        reports = r if reports is None else reports.unionByName(r)
    return reports.orderBy("edge")


# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER join twin (streaming/ingest.attribution_
# outer_flags): per-click emission classification of the watermarked
# outer interval join — matched / expired_unmatched (NULL row emitted
# once the min-of-inputs watermark passes the join window) / open
# (withheld).  Same seeded arrival timeline as the discard twin; the
# twin's three rules are probed against the real engine in
# tests/test_joins_stateful.py::test_attribution_outer_twin_*.
# ---------------------------------------------------------------------------
@_register(
    "events_attribution_outer_twin",
    f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, ts,
               CASE WHEN {sampling.hash_bucket_sql('event_id', 'late')}
                         < {_LATE_BOUND}
                    THEN ts + INTERVAL 3 HOUR ELSE ts END AS arrival_ts
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    e2 AS (SELECT *, date_trunc('hour', arrival_ts) AS batch FROM e),
    grid AS (SELECT DISTINCT batch FROM e2),
    bc AS (SELECT batch, MAX(ts) AS cmax FROM e2
           WHERE event_type = 'click' GROUP BY batch),
    bp AS (SELECT batch, MAX(ts) AS pmax FROM e2
           WHERE event_type = 'purchase' GROUP BY batch),
    g2 AS (SELECT g.batch, bc.cmax, bp.pmax FROM grid g
           LEFT JOIN bc USING (batch) LEFT JOIN bp USING (batch)),
    wmx AS (SELECT batch,
                   MAX(cmax) OVER (ORDER BY batch
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS wc,
                   MAX(pmax) OVER (ORDER BY batch
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS wp
            FROM g2),
    wm AS (SELECT batch,
                  CASE WHEN wc IS NOT NULL AND wp IS NOT NULL
                       THEN LEAST(wc, wp) - INTERVAL 2 HOUR END AS wm
           FROM wmx),
    fw AS (SELECT CASE WHEN MAX(cmax) IS NOT NULL AND MAX(pmax) IS NOT NULL
                       THEN LEAST(MAX(cmax), MAX(pmax)) - INTERVAL 2 HOUR
                  END AS final_wm FROM g2),
    c AS (SELECT e2.event_id AS click_id, e2.user_id,
                 e2.ts AS click_ts,
                 (wm.wm IS NOT NULL AND e2.ts < wm.wm) AS is_late_input
          FROM e2 JOIN wm USING (batch) WHERE event_type = 'click'),
    p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM e2 WHERE event_type = 'purchase'),
    j AS (SELECT c.click_id, c.user_id, c.click_ts, c.is_late_input,
                 CAST(COUNT(p.purchase_id) AS BIGINT) AS n_matches
          FROM c LEFT JOIN p ON p.user_id = c.user_id
                AND p.purchase_ts > c.click_ts
                AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
          GROUP BY 1, 2, 3, 4)
    SELECT j.click_id, j.user_id, j.is_late_input, j.n_matches,
           CASE WHEN j.n_matches > 0 THEN 'matched'
                WHEN fw.final_wm > j.click_ts + INTERVAL 1 HOUR
                     THEN 'expired_unmatched'
                ELSE 'open' END AS status
    FROM j CROSS JOIN fw ORDER BY click_id
    """,
)
def events_attribution_outer_twin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        attribution_outer_flags,
    )

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    seeded = events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.when(
            sampling.hash_bucket("event_id", "late") < _LATE_BOUND,
            F.col("ts") + F.expr("INTERVAL 3 HOURS"),
        )
        .otherwise(F.col("ts"))
        .alias("arrival_ts"),
    )
    flags = attribution_outer_flags(
        seeded.filter(F.col("event_type") == "click"),
        seeded.filter(F.col("event_type") == "purchase"),
    )
    return flags.select(
        "click_id", "user_id", "is_late_input", "n_matches", "status"
    ).orderBy("click_id")


# ---------------------------------------------------------------------------
# Time-series gap fill + forward fill — densify the sparse hourly
# revenue series per event_type onto the full hour grid (generated
# from the observed min/max, no driver scalars) and carry the last
# known hourly total forward across gaps (LAST_VALUE ... IGNORE
# NULLS).  The dashboard/feature-store shape for "value as of hour h";
# gaps get n_events = 0 and the carried value, leading gaps stay NULL.
# Scale: the hour grid is metadata-sized (one row per hour) and
# broadcast against the aggregated series; the ffill window partitions
# by event_type — bounded state per partition, never a global sort.
# Hourly totals aggregate as decimal(18,2) so the filled value is
# bit-identical cross-engine.
# ---------------------------------------------------------------------------
@_register(
    "events_gap_fill_ffill",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM hourly),
    hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
              FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, h.hr FROM types t CROSS JOIN hours h),
    joined AS (SELECT g.event_type, g.hr,
                      COALESCE(h.n_events, 0) AS n_events,
                      h.sum_value
               FROM grid g LEFT JOIN hourly h
                 ON h.event_type = g.event_type AND h.hr = g.hr)
    SELECT event_type, hr, n_events,
           (n_events = 0) AS is_gap,
           LAST_VALUE(sum_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill
    FROM joined ORDER BY event_type, hr
    """,
)
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round("value", 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
    bounds = hourly.agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    joined = grid.join(hourly, on=["event_type", "hr"], how="left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.select(
            "event_type",
            "hr",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            (F.coalesce("n_events", F.lit(0)) == 0).alias("is_gap"),
            F.last("sum_value", ignorenulls=True).over(w).alias("value_ffill"),
        )
        .orderBy("event_type", "hr")
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance — the materialized-view merge
# proven against a full recompute.  The customer order rollup is built
# as TWO independent partial-aggregate states (history before the
# cutoff date, delta after it) merged by
# operators/incremental.partials_union_combine: counts and sums merge
# by addition, last-order-date by max.  The oracle is a one-shot
# GROUP BY over all orders, so a green row proves the maintenance
# algebra loses nothing — the property that lets a 100 TB rollup fold
# in a daily delta for O(delta + touched partitions) instead of
# rescanning history (incremental_rollup wraps the same combine with
# dynamic-partition-overwrite persistence).  Money merges as
# decimal(18,2) partials, so addition is associative and the merged
# total is bit-identical to the recompute.
# ---------------------------------------------------------------------------
_MV_CUTOFF = "1997-01-01"

@_register(
    "agg_incremental_merge",
    f"""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS sum_total,
           MAX(o_orderdate) AS last_order_date
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        partials_union_combine,
    )

    orders = load_table(spark, sf_dir, "orders")
    measures = {
        "n_orders": ("count", "o_orderkey"),
        "sum_total": ("sum", "price_dec"),
        "last_order_date": ("max", "o_orderdate"),
    }

    def partials(df: DataFrame) -> DataFrame:
        return (
            df.withColumn(
                "price_dec",
                F.round("o_totalprice", 2).cast("decimal(18,2)"),
            )
            .groupBy("o_custkey")
            .agg(
                F.count("o_orderkey").cast("long").alias("n_orders"),
                F.sum("price_dec").alias("sum_total"),
                F.max("o_orderdate").alias("last_order_date"),
            )
        )

    cutoff = F.lit(_MV_CUTOFF).cast("date")
    base = partials(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partials(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = partials_union_combine(base, delta, ["o_custkey"], measures)
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("sum_total").cast("double").alias("sum_total"),
        "last_order_date",
    ).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# Inter-order gaps via LEAD — the forward-looking window twin of the
# lag()-based sessionizer: per customer, the day gaps between
# consecutive orders (repurchase-cadence analysis).  Integer day
# arithmetic end-to-end (both engines CAST to DATE first, so the diff
# is exact calendar days, not boundary-sensitive timestamp math).
# ---------------------------------------------------------------------------
@_register(
    "window_next_order_gap",
    """
    WITH g AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) AS d,
               lead(CAST(o_orderdate AS DATE)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS next_d
        FROM orders
    ),
    gaps AS (
        SELECT o_custkey, date_diff('day', d, next_d) AS gap
        FROM g WHERE next_d IS NOT NULL
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS total_gap_days,
           CAST(MIN(gap) AS BIGINT) AS min_gap_days,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM gaps GROUP BY o_custkey ORDER BY custkey
    """,
)
def window_next_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.withColumn("next_d", F.lead("d").over(w))
        .filter(F.col("next_d").isNotNull())
        .select(
            "o_custkey", F.datediff("next_d", "d").cast("long").alias("gap")
        )
    )
    return (
        gaps.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap").alias("total_gap_days"),
            F.min("gap").alias("min_gap_days"),
            F.max("gap").alias("max_gap_days"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Purged / embargoed time-series split (López de Prado, "Advances in
# Financial Machine Learning" ch. 7 — the leakage-safe TEMPORAL
# counterpart of the group-aware split in corpus_group_split_assign):
# train = events before the split instant, test = events after an
# EMBARGO gap, and everything inside the gap is PURGED — feature
# windows that straddle the boundary would otherwise leak test-period
# information into training rows.  The split instant is min_ts + 70%
# of the corpus time range in exact integer microseconds (min/max are
# order-insensitive aggregates, the integer arithmetic is identical
# on both engines — no percentile, no float).  Scale: one metadata
# aggregate broadcast into a scan-linear projection; nothing shuffles
# but the two-row bounds frame.
# ---------------------------------------------------------------------------
_SPLIT_NUM, _SPLIT_DEN = 7, 10          # train fraction of the time range
_EMBARGO_US = 7 * 86400 * 1000000       # 7-day embargo


@_register(
    "events_purged_time_split",
    f"""
    WITH b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
               FROM events),
    lab AS (
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
               b.mn + (b.mx - b.mn) * {_SPLIT_NUM} // {_SPLIT_DEN} AS t_split,
               CASE
                   WHEN epoch_us(e.ts)
                        < b.mn + (b.mx - b.mn) * {_SPLIT_NUM} // {_SPLIT_DEN}
                       THEN 'train'
                   WHEN epoch_us(e.ts)
                        < b.mn + (b.mx - b.mn) * {_SPLIT_NUM} // {_SPLIT_DEN}
                          + {_EMBARGO_US}
                       THEN 'purged'
                   ELSE 'test'
               END AS split
        FROM events e, b
    )
    SELECT event_id, user_id, ts_us, split FROM lab ORDER BY event_id
    """,
)
def events_purged_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    t_split = (
        F.col("mn")
        + F.expr(f"(mx - mn) * {_SPLIT_NUM} DIV {_SPLIT_DEN}")
    )
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.when(F.unix_micros("ts") < t_split, "train")
            .when(
                F.unix_micros("ts") < t_split + F.lit(_EMBARGO_US), "purged"
            )
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Z-order clustering key (operators/layout.py:zorder_key — the Delta
# OPTIMIZE ZORDER BY / Iceberg rewrite shape): min-max-normalize each
# clustered column to 12 bits and interleave the bits into one bigint
# sort key, all plain Column bit arithmetic.  This row oracle-gates
# the KEY itself (the part a layout rewrite must get right — the
# write path is pinned by tests/test_layout.py's data-skipping
# payoff): the oracle recomputes min/max, replays the identical
# float normalization tree (same IEEE ops in the same order), and
# re-interleaves with integer shifts.  12 bits x 2 cols = 24-bit key.
# ---------------------------------------------------------------------------
_ZO_BITS = 12
_ZO_SCALE = (1 << _ZO_BITS) - 1


@_register(
    "layout_zorder_key",
    f"""
    WITH b AS (SELECT MIN(o_custkey) AS lo0, MAX(o_custkey) AS hi0,
                      MIN(o_totalprice) AS lo1, MAX(o_totalprice) AS hi1
               FROM orders),
    q AS (
        SELECT o_orderkey,
               CAST(least({_ZO_SCALE}, floor(
                   (CAST(o_custkey AS DOUBLE) - lo0)
                   / (CASE WHEN hi0 = lo0 THEN 1.0 ELSE hi0 - lo0 END)
                   * {_ZO_SCALE})) AS BIGINT) AS b0,
               CAST(least({_ZO_SCALE}, floor(
                   (CAST(o_totalprice AS DOUBLE) - lo1)
                   / (CASE WHEN hi1 = lo1 THEN 1.0 ELSE hi1 - lo1 END)
                   * {_ZO_SCALE})) AS BIGINT) AS b1
        FROM orders, b
    )
    SELECT o_orderkey,
           CAST(list_sum(list_transform(range(0, {_ZO_BITS}), i ->
               (((b0 >> CAST(i AS INTEGER)) & 1) << CAST(i * 2 AS INTEGER))
               + (((b1 >> CAST(i AS INTEGER)) & 1)
                  << CAST(i * 2 + 1 AS INTEGER)))) AS BIGINT) AS zkey
    FROM q ORDER BY o_orderkey
    """,
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators import layout

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return orders.select(
        "o_orderkey",
        layout.zorder_key(
            orders, ["o_custkey", "o_totalprice"], bits=_ZO_BITS
        ).alias("zkey"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Small-file compaction (operators/layout.py:compact_files — the
# OPTIMIZE table-maintenance job).  The row PROVES losslessness
# machine-checked: Spark fragments the orders table into 64 tiny
# files (the streaming-sink failure mode), compacts them through the
# shuffle-free coalesce path, and aggregates the COMPACTED copy; the
# oracle aggregates the ORIGINAL table.  A green hash means the
# rewrite changed layout only.  File-count reduction is asserted in
# the row itself (a no-op "compaction" must fail loudly, not pass the
# hash); the measured scan-speed payoff at sf0.1 lives in
# tools/COMPACT.md.
# ---------------------------------------------------------------------------
_COMPACT_MEMO: dict[tuple, str] = {}


@_register(
    "layout_compact_roundtrip",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def layout_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from vexere_lakehouse_pipeline_spark.operators import layout

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    dst = _COMPACT_MEMO.get(key)
    if dst is None:
        base = tempfile.mkdtemp(prefix="vlps_compact_")
        src = os.path.join(base, "fragmented")
        dst = os.path.join(base, "compacted")
        load_table(spark, sf_dir, "orders").repartition(64).write.mode(
            "overwrite"
        ).parquet(src)
        stats = layout.compact_files(spark, src, dst, target_mb=8)
        if stats["files_after"] >= stats["files_before"]:
            raise AssertionError(
                f"compaction did not reduce file count: {stats}"
            )
        _COMPACT_MEMO[key] = dst
    return (
        spark.read.parquet(dst)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Hilbert clustering key (operators/layout.py:with_hilbert_key — the
# space-filling curve behind liquid clustering / Iceberg hilbert
# rewrites; Z-order's stronger sibling, measured against it in
# tools/ZORDER_BYTES.md).  The DuckDB oracle replays the SAME classic
# reflect+rotate recurrence as a generated CTE chain (one pair of
# CTEs per bit level, exactly the per-level projections the Spark
# side unrolls), over the same min-max normalization the zorder
# oracle uses.  bits=8 -> 256x256 grid; all arithmetic integer after
# the one shared normalization floor.
# ---------------------------------------------------------------------------
_HB_BITS = 8
_HB_SCALE = (1 << _HB_BITS) - 1


def _hilbert_oracle() -> str:
    n = 1 << _HB_BITS
    norm = (
        "CAST(least({s}, floor((CAST({c} AS DOUBLE) - lo{j}) "
        "/ (CASE WHEN hi{j} = lo{j} THEN 1.0 ELSE hi{j} - lo{j} END) "
        "* {s})) AS BIGINT)"
    )
    ctes = [
        "b AS (SELECT MIN(o_custkey) AS lo0, MAX(o_custkey) AS hi0, "
        "MIN(o_totalprice) AS lo1, MAX(o_totalprice) AS hi1 FROM orders)",
        "h0 AS (SELECT o_orderkey, "
        + norm.format(s=_HB_SCALE, c="o_custkey", j=0) + " AS hx, "
        + norm.format(s=_HB_SCALE, c="o_totalprice", j=1) + " AS hy, "
        "CAST(0 AS BIGINT) AS hd FROM orders, b)",
    ]
    for lvl, i in enumerate(range(_HB_BITS - 1, -1, -1)):
        s = 1 << i
        ctes.append(
            f"r{lvl} AS (SELECT o_orderkey, hx, hy, hd, "
            f"CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx, "
            f"CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry "
            f"FROM h{lvl})"
        )
        ctes.append(
            f"h{lvl + 1} AS (SELECT o_orderkey, "
            f"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 "
            f"THEN {n - 1} - hy ELSE hy END ELSE hx END AS hx, "
            f"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 "
            f"THEN {n - 1} - hx ELSE hx END ELSE hy END AS hy, "
            f"hd + {s * s} * (rx * (3 - ry) + (1 - rx) * ry) AS hd "
            f"FROM r{lvl})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT o_orderkey, hd AS hkey FROM h{_HB_BITS} "
        "ORDER BY o_orderkey"
    )


@_register("layout_hilbert_key", _hilbert_oracle())
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators import layout

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return (
        layout.with_hilbert_key(
            orders, ["o_custkey", "o_totalprice"], bits=_HB_BITS
        )
        .select("o_orderkey", "hkey")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning, as a gated row (the mechanism
# tests/test_layout.py proves on synthetic data, here on the star
# schema): orders is written hive-partitioned by o_orderpriority (the
# memoized one-time layout job), then a dim-filtered star join runs
# against the PARTITIONED copy.  Catalyst plants a dynamicpruning
# subquery on the fact scan — at runtime the scan reads only the
# partitions the filtered dim selects, the mechanism that makes
# dim-filtered joins touch a sliver of a 100 TB fact.  The row
# ASSERTS the executed plan carries the pruning subquery (a silent
# full scan fails loudly, not just slowly), and the oracle replays
# the same join over the logical table — a green hash proves the
# partitioned rewrite + pruned join changed layout, not answers.
# ---------------------------------------------------------------------------
_DPP_MEMO: dict[tuple, str] = {}


@_register(
    "layout_partitioned_dpp_join",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS total_cents
    FROM orders o
    JOIN (SELECT DISTINCT o_orderpriority AS pr FROM orders
          WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '3-%') d
      ON o.o_orderpriority = d.pr
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def layout_partitioned_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    path = _DPP_MEMO.get(key)
    if path is None:
        path = os.path.join(tempfile.mkdtemp(prefix="vlps_dpp_"), "orders_p")
        load_table(spark, sf_dir, "orders").write.mode(
            "overwrite"
        ).partitionBy("o_orderpriority").parquet(path)
        _DPP_MEMO[key] = path
    fact = spark.read.parquet(path)
    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").startswith("1-")
            | F.col("o_orderpriority").startswith("3-")
        )
        .select(F.col("o_orderpriority").alias("pr"))
        .distinct()
    )
    joined = fact.join(
        F.broadcast(dim), fact["o_orderpriority"] == dim["pr"]
    )
    out = (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(
            "dynamic partition pruning missing from the executed plan — "
            "the fact scan would read every partition"
        )
    return out


# ---------------------------------------------------------------------------
# Incremental gold refresh — IVM-lite (round-8 verdict #3).  The
# reference recomputes every gold table daily and overwrites
# (convert/to_gold.py:221-228); with versioned facts + CDC the engine
# refreshes ONLY the groups a mutation batch touched
# (operators/snapshots.py: incremental_gold_refresh) and commits the
# result as a new gold version.  Two structurally distinct golds are
# gated: cau_4 (single derived key, plain aggregates) and cau_1
# (multi-key incl. an identity key + non-distributive collect_set —
# possible because refresh is GROUP-level recompute, never row-level
# merge arithmetic).  Each row: commit a deterministically STALE fact
# version v0 (deleted slice + in-group value perturbation + a
# group-MOVING key mutation), commit the true table as v1, materialize
# gold(v0), refresh via diff(v0→v1), return the refreshed gold.  The
# oracle is the ORIGINAL cau SQL verbatim over the true table — a
# green hash IS the proof that incremental-refresh(gold(v0), diff) ≡
# full-recompute(v1), including bit-exact untouched rows.
# ---------------------------------------------------------------------------
def _ivm_refresh(spark, sf_dir: str, fact_name: str, pk_cols, group_exprs,
                 agg_fn, mutate_fn, part_col=None,
                 scope_parts: bool = False) -> DataFrame:
    import os
    import shutil
    import tempfile

    from vexere_lakehouse_pipeline_spark.catalog import spread_small_input
    from vexere_lakehouse_pipeline_spark.operators import snapshots as snap

    # Round-10: spread the single-row-group fact scan before the two
    # version commits — the writes, the diff's row signatures and the
    # gold@v0 aggregate otherwise all run on one task (no-op at scale;
    # gold aggregates are decimal/sorted-collect, so layout can't move
    # a value).  Measured −8.6 s on gold_cau2_incremental_refresh and
    # −7 s on gold_cau4_incremental_refresh_pruned (whose partitioned
    # fingerprinted commits dominate); the small unpartitioned
    # fixtures pay ~+1 s of exchange overhead, a net the gold family
    # wins by ~14 s.
    fact = spread_small_input(load_table(spark, sf_dir, fact_name),
                              *pk_cols)
    base = tempfile.mkdtemp(prefix="vlps_ivm_")
    try:
        commit_kw = {}
        if part_col is not None:
            # Hive-partition both versions by a derived column so the
            # journalless diff prunes to fingerprint-changed
            # partitions (and scope_parts restricts the recompute too)
            pname, pexpr = part_col
            fact = fact.withColumn(pname, pexpr)
            commit_kw["part_by"] = [pname]
        tbl = snap.SnapshotTable(os.path.join(base, fact_name))
        stale = mutate_fn(fact)
        if part_col is not None:
            # re-derive the partition column AFTER the mutation so a
            # group-moving date shift moves partitions too
            stale = stale.withColumn(pname, pexpr)
        tbl.commit(stale, note="stale mutation batch", **commit_kw)
        tbl.commit(fact, note="current", **commit_kw)
        gold_tbl = snap.SnapshotTable(os.path.join(base, "gold"))
        gold_tbl.commit(agg_fn(tbl.read(spark, version=0)), note="gold@v0")
        refreshed = snap.incremental_gold_refresh(
            spark, tbl, 0, 1, pk_cols, group_exprs, agg_fn,
            gold_tbl.read(spark, version=0), scope_parts=scope_parts,
        )
        gold_tbl.commit(refreshed, note="gold@v1 incremental")
        # pin the result off the tempdir (ADVICE r9: every invocation
        # leaked two fact copies + gold versions) so it can be removed
        # before returning
        return gold_tbl.read(spark).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@_register("gold_cau4_incremental_refresh",
           _star.ORACLE_SQL["cau4_daily_avg_order_value"])
def gold_cau4_incremental_refresh(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")

    def mutate(orders: DataFrame) -> DataFrame:
        return (
            orders.filter((k % 97) != 0)  # v1 re-inserts this slice
            .withColumn(
                "o_totalprice",
                F.when(k % 89 == 1, F.col("o_totalprice") + 100.0)
                .otherwise(F.col("o_totalprice")),
            )
            .withColumn(  # group-moving update: day changes
                "o_orderdate",
                F.when(k % 83 == 2,
                       F.col("o_orderdate") + F.expr("INTERVAL 40 DAYS"))
                .otherwise(F.col("o_orderdate")),
            )
        )

    return _ivm_refresh(
        spark, sf_dir, "orders", ["o_orderkey"],
        [("order_date", F.to_date("o_orderdate"))],
        _star.cau4_agg, mutate,
    ).orderBy("order_date")


@_register("gold_cau4_incremental_refresh_pruned",
           _star.ORACLE_SQL["cau4_daily_avg_order_value"])
def gold_cau4_incremental_refresh_pruned(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """The CHURN-SCALE journalless refresh (r9 verdict #1): both fact
    versions are committed month-partitioned with manifest
    fingerprints, so snapshot_diff's full-outer join is partition-
    pruned to churned months, the touched set comes off the diff's
    both-side rows (no extra fact scans), and scope_parts=True
    restricts the recompute scan to the same partitions (day groups
    refine month partitions).  Same mutation battery as
    gold_cau4_incremental_refresh — including the 40-day
    partition-MOVING date shift — and the oracle is the original cau4
    SQL verbatim, so a green hash proves the pruned refresh ≡ the
    full recompute.  Measured arm-by-arm in tools/IVM.md; pruning
    behavior pinned in tests/test_snapshots.py."""
    k = F.col("o_orderkey")

    def mutate(orders: DataFrame) -> DataFrame:
        return (
            orders.filter((k % 97) != 0)  # v1 re-inserts this slice
            .withColumn(
                "o_totalprice",
                F.when(k % 89 == 1, F.col("o_totalprice") + 100.0)
                .otherwise(F.col("o_totalprice")),
            )
            .withColumn(  # group- AND partition-moving update
                "o_orderdate",
                F.when(k % 83 == 2,
                       F.col("o_orderdate") + F.expr("INTERVAL 40 DAYS"))
                .otherwise(F.col("o_orderdate")),
            )
        )

    return _ivm_refresh(
        spark, sf_dir, "orders", ["o_orderkey"],
        [("order_date", F.to_date("o_orderdate"))],
        _star.cau4_agg, mutate,
        part_col=("o_month", F.date_format("o_orderdate", "yyyy-MM")),
        scope_parts=True,
    ).orderBy("order_date")


@_register("gold_cau1_incremental_refresh",
           _star.ORACLE_SQL["cau1_daypart_mix"])
def gold_cau1_incremental_refresh(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    e = F.col("event_id")

    def mutate(events: DataFrame) -> DataFrame:
        return (
            events.filter((e % 101) != 0)
            .withColumn(
                "value",
                F.when(e % 103 == 1, F.col("value") + 5.0)
                .otherwise(F.col("value")),
            )
            .withColumn(  # cohort-moving update: user_id % 8 changes
                "user_id",
                F.when(e % 107 == 2, F.col("user_id") + 1)
                .otherwise(F.col("user_id")),
            )
        )

    return _ivm_refresh(
        spark, sf_dir, "events", ["event_id"],
        [("event_type", F.col("event_type")),
         ("user_cohort", F.col("user_id") % 8)],
        _star.cau1_agg, mutate,
    ).orderBy("event_type", F.desc("total_trips"), "user_cohort")


@_register("gold_cau2_incremental_refresh",
           _star.ORACLE_SQL["cau2_cheapest_top_rated"])
def gold_cau2_incremental_refresh(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """IVM over a MULTI-JOIN gold: cau_2 joins lineitem to a per-group
    minimum, left-joins an events-derived score, and RANK-filters per
    (ship_date, l_returnflag) — all group-local in those keys, so the
    same group-level refresh applies with the events side held fixed
    (agg_fn joins it inside the recompute).  Mutations hit lineitem's
    composite PK; the group-moving update shifts l_shipdate."""
    pk = (F.col("l_orderkey") * 7 + F.col("l_linenumber"))

    def mutate(li: DataFrame) -> DataFrame:
        return (
            li.filter((pk % 101) != 0)
            .withColumn(
                "l_extendedprice",
                F.when(pk % 103 == 1, F.col("l_extendedprice") + 50.0)
                .otherwise(F.col("l_extendedprice")),
            )
            .withColumn(  # group-moving update: ship day changes
                "l_shipdate",
                F.when(pk % 107 == 2,
                       F.col("l_shipdate") + F.expr("INTERVAL 30 DAYS"))
                .otherwise(F.col("l_shipdate")),
            )
        )

    events = load_table(spark, sf_dir, "events")
    return _ivm_refresh(
        spark, sf_dir, "lineitem", ["l_orderkey", "l_linenumber"],
        [("ship_date", F.to_date("l_shipdate")),
         ("l_returnflag", F.col("l_returnflag"))],
        lambda li_sub: _star.cau2_agg(li_sub, events), mutate,
    ).orderBy("ship_date", "l_returnflag", "l_suppkey")


@_register("gold_cau2_incremental_refresh_events",
           _star.ORACLE_SQL["cau2_cheapest_top_rated"])
def gold_cau2_incremental_refresh_events(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """MULTI-INPUT IVM (r9 verdict #3): the fact (lineitem) is
    UNCHANGED; the JOINED side input (events → per-user review score)
    mutates — deleted slice, value perturbation, and a USER-MOVING
    update (both the old and new owner's scores change).  The
    affected gold groups are those containing lineitem rows whose
    l_suppkey joins to a changed user (snapshots.touched_keys over
    the events churn, drawn from BOTH versions, semi-joined into the
    fact), passed as ``extra_touched``; ``agg_fn`` closes over the
    NEW events.  The oracle is the ORIGINAL cau2 SQL verbatim over
    the true tables — a green hash proves side-input churn maps to
    exactly the right groups (stale score rows in untouched groups
    would hash-mismatch)."""
    import os
    import shutil
    import tempfile

    from vexere_lakehouse_pipeline_spark.catalog import spread_small_input
    from vexere_lakehouse_pipeline_spark.operators import snapshots as snap

    # spread both single-row-group scans before the commits (see
    # _ivm_refresh — no-op at scale, aggregates are order-insensitive)
    li = spread_small_input(load_table(spark, sf_dir, "lineitem"),
                            "l_orderkey", "l_linenumber")
    events = spread_small_input(load_table(spark, sf_dir, "events"),
                                "event_id")
    e = F.col("event_id")
    stale_events = (
        events.filter((e % 101) != 0)  # v1 restores this slice
        .withColumn(
            "value",
            F.when(e % 103 == 1, F.col("value") + 7.0)
            .otherwise(F.col("value")),
        )
        .withColumn(  # user-moving update: the score of BOTH the old
            "user_id",  # and the new owner changes
            F.when(e % 107 == 2, F.col("user_id") + 1)
            .otherwise(F.col("user_id")),
        )
    )
    base = tempfile.mkdtemp(prefix="vlps_ivm_ev_")
    try:
        li_tbl = snap.SnapshotTable(os.path.join(base, "lineitem"))
        li_tbl.commit(li, note="fact, unchanged")
        ev_tbl = snap.SnapshotTable(os.path.join(base, "events"))
        ev_tbl.commit(stale_events, note="stale side input")
        ev_tbl.commit(events, note="current side input")
        gold0 = _star.cau2_agg(li_tbl.read(spark),
                               ev_tbl.read(spark, version=0))
        changed_users = snap.touched_keys(
            spark, ev_tbl, 0, 1, ["event_id"],
            [("user_id", F.col("user_id"))],
        )
        fact = li_tbl.read(spark)
        side_touched = (
            fact.join(
                F.broadcast(changed_users),
                F.col("l_suppkey").eqNullSafe(F.col("user_id")),
                "left_semi",
            )
            .select(
                F.to_date("l_shipdate").alias("ship_date"),
                "l_returnflag",
            )
            .distinct()
        )
        refreshed = snap.incremental_gold_refresh(
            spark, li_tbl, 0, 0,
            ["l_orderkey", "l_linenumber"],
            [("ship_date", F.to_date("l_shipdate")),
             ("l_returnflag", F.col("l_returnflag"))],
            lambda li_sub: _star.cau2_agg(
                li_sub, ev_tbl.read(spark, version=1)
            ),
            gold0,
            changed_pks=fact.select(
                "l_orderkey", "l_linenumber").limit(0),
            extra_touched=side_touched,
        )
        return (
            refreshed.localCheckpoint(eager=True)
            .orderBy("ship_date", "l_returnflag", "l_suppkey")
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@_register("gold_cau4_stream_refresh",
           _star.ORACLE_SQL["cau4_daily_avg_order_value"])
def gold_cau4_stream_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous IVM end-to-end (streaming/ingest.py:
    run_stream_gold_refresh): the same stale-v0 construction as
    gold_cau4_incremental_refresh, but the delta arrives as CDC
    MICRO-BATCHES — each merges into the versioned fact and refreshes
    only its touched gold groups (changed_pks path: no version-diff
    join at all).  After the stream drains, the fact equals the true
    orders table and the oracle is the ORIGINAL cau4 SQL verbatim — a
    green hash proves per-batch group refresh converges to the full
    recompute through any batch split."""
    import os
    import shutil
    import tempfile

    from vexere_lakehouse_pipeline_spark.operators import snapshots as snap
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        run_stream_gold_refresh,
    )

    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    stale = (
        orders.filter((k % 97) != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 89 == 1, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderdate",
            F.when(k % 83 == 2,
                   F.col("o_orderdate") + F.expr("INTERVAL 40 DAYS"))
            .otherwise(F.col("o_orderdate")),
        )
    )
    base = tempfile.mkdtemp(prefix="vlps_stream_ivm_")
    try:
        fact = snap.SnapshotTable(os.path.join(base, "orders"))
        fact.commit(stale, note="stale v0")
        gold = snap.SnapshotTable(os.path.join(base, "gold"))
        gold.commit(_star.cau4_agg(fact.read(spark)), note="gold@v0")
        # the CDC feed: true rows for every key the staleness touched —
        # after the upserts the fact IS the true table
        delta = orders.filter(
            (k % 97 == 0) | (k % 89 == 1) | (k % 83 == 2)
        )
        src = os.path.join(base, "cdc")
        delta.repartition(2).write.parquet(src)  # 2 files -> 2 batches
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        run_stream_gold_refresh(
            stream, fact, gold, ["o_orderkey"],
            [("order_date", F.to_date("o_orderdate"))],
            _star.cau4_agg, os.path.join(base, "ckpt"),
        )
        # pin off the tempdir before removal (ADVICE r9 leak)
        return (
            gold.read(spark).localCheckpoint(eager=True)
            .orderBy("order_date")
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
