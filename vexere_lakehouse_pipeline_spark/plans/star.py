"""Engine-correctness queries over the driver star schema (TESTDATA.md).

Each entry re-expresses one operator cluster from SURVEY.md §2/§3.3 on
the synthetic TPC-H-ish tables, as (a) a DataFrame builder taking
``(spark, sf_dir)`` and (b) a DuckDB-runnable ANSI-SQL oracle with
IDENTICAL column names and types.  The driver hash-compares the two at
sf=0.01 (CORRECTNESS gate).

Mapping convention for the cau_N analogs (the vexere gold queries,
convert/to_gold.py:28-218, re-targeted at the star schema):
  route → l_returnflag / event_type     operator → l_suppkey / user_id
  price → l_extendedprice / o_totalprice     review POS → events.value
  departure hour → hour(events.ts)      facility_id → part.p_size

Determinism: collect_set is canonicalized with sort_array; every
floating aggregate is rounded; RANK ties are preserved (not "fixed" to
row_number) exactly as the reference does (SURVEY §2.5 W2).

Scale design notes are on each query; the common ones:
  - aggregates are partial (map-side) by construction — groupBy on
    natural keys, no collect/driver loops;
  - every dimension join is broadcast (explicit hint), fact-fact joins
    shuffle on the join key once and AQE handles skew;
  - grids (cau_7/8) broadcast the tiny generated side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.cleaning import daypart

QueryFn = Callable[[SparkSession, str], DataFrame]

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
# cau_1 analog — multi-key groupBy + count/avg + sorted collect_set concat
# (A1, A2, A5, A8; daypart CASE from to_gold.py:35-40).
# Scale: single hash aggregation, map-side partials; no join.
# ---------------------------------------------------------------------------
def cau1_agg(events: DataFrame) -> DataFrame:
    """The cau_1 aggregation over ANY events subset — shared by the
    full-recompute builder below and the incremental gold refresh
    (star_ext.py: gold_cau1_incremental_refresh), so the two paths
    can never drift."""
    return events.groupBy(
        "event_type", (F.col("user_id") % 8).alias("user_cohort")
    ).agg(
        F.count("*").alias("total_trips"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            0,
        ).alias("avg_value"),
        F.concat_ws(
            ", ", F.sort_array(F.collect_set(daypart(F.hour("ts"))))
        ).alias("depart_time_ranges"),
    )


@_register(
    "cau1_daypart_mix",
    """
    SELECT event_type,
           user_id % 8 AS user_cohort,
           COUNT(*) AS total_trips,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 0) AS avg_value,
           array_to_string(list_sort(list(DISTINCT
               CASE WHEN hour(ts) BETWEEN 0 AND 5 THEN '00h-05h'
                    WHEN hour(ts) BETWEEN 6 AND 11 THEN '06h-11h'
                    WHEN hour(ts) BETWEEN 12 AND 17 THEN '12h-17h'
                    WHEN hour(ts) BETWEEN 18 AND 23 THEN '18h-23h' END)), ', ')
             AS depart_time_ranges
    FROM events
    GROUP BY event_type, user_id % 8
    ORDER BY event_type, total_trips DESC, user_cohort
    """,
)
def cau1_daypart_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return cau1_agg(events).orderBy(
        "event_type", F.desc("total_trips"), "user_cohort"
    )


# ---------------------------------------------------------------------------
# cau_2 analog — CTE min-per-group joined back on 3 keys (J3), left join to
# a derived score (J4), COALESCE flag, RANK top-1 with ties (W2).
# Scale: cheapest is a partial agg on the fact's own grouping keys → the
# join back is key-aligned; review_score is tiny → broadcast.
# ---------------------------------------------------------------------------
def cau2_agg(li: DataFrame, events: DataFrame) -> DataFrame:
    """The cau_2 computation over ANY lineitem subset (events held
    fixed) — shared by the full-recompute builder below and the
    incremental gold refresh (star_ext.py:
    gold_cau2_incremental_refresh).  Group-decomposable in
    (ship_date, l_returnflag): cheapest, the join-back, and the RANK
    window are all local to that key, so refreshing a touched group
    from its own rows reproduces the full recompute exactly."""
    li = li.withColumn("ship_date", F.to_date("l_shipdate"))
    cheapest = li.groupBy("ship_date", "l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    review_score = (
        events
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("*"),
                2,
            ).alias("avg_positive")
        )
    )
    candidates = (
        li.join(
            cheapest.withColumnsRenamed(
                {"ship_date": "c_ship_date", "l_returnflag": "c_returnflag"}
            ),
            on=[
                F.col("ship_date") == F.col("c_ship_date"),
                F.col("l_returnflag") == F.col("c_returnflag"),
                F.col("l_extendedprice") == F.col("min_price"),
            ],
        )
        .join(
            review_score,
            on=F.col("l_suppkey") == F.col("user_id"),
            how="left",
        )
        .select(
            "ship_date",
            "l_returnflag",
            "l_suppkey",
            F.col("l_extendedprice").alias("price"),
            F.coalesce("avg_positive", F.lit(0.0)).alias("avg_positive"),
            F.when(F.coalesce("avg_positive", F.lit(0.0)) > 50, 1)
            .otherwise(0)
            .alias("is_good"),
        )
        .distinct()
    )
    w = Window.partitionBy("ship_date", "l_returnflag").orderBy(F.desc("is_good"))
    return (
        candidates.withColumn("rank_in_group", F.rank().over(w))
        .filter(F.col("rank_in_group") == 1)
        .select("ship_date", "l_returnflag", "l_suppkey", "price")
    )


@_register(
    "cau2_cheapest_top_rated",
    """
    WITH cheapest AS (
        SELECT CAST(l_shipdate AS DATE) AS ship_date, l_returnflag,
               MIN(l_extendedprice) AS min_price
        FROM lineitem GROUP BY 1, 2
    ),
    review_score AS (
        SELECT user_id,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2)
                 AS avg_positive
        FROM events GROUP BY user_id
    ),
    candidates AS (
        SELECT DISTINCT CAST(t.l_shipdate AS DATE) AS ship_date,
               t.l_returnflag, t.l_suppkey, t.l_extendedprice AS price,
               COALESCE(r.avg_positive, 0) AS avg_positive,
               CASE WHEN COALESCE(r.avg_positive, 0) > 50 THEN 1 ELSE 0 END AS is_good
        FROM lineitem t
        JOIN cheapest c ON CAST(t.l_shipdate AS DATE) = c.ship_date
           AND t.l_returnflag = c.l_returnflag
           AND t.l_extendedprice = c.min_price
        LEFT JOIN review_score r ON t.l_suppkey = r.user_id
    ),
    ranked AS (
        SELECT *, RANK() OVER (PARTITION BY ship_date, l_returnflag
                               ORDER BY is_good DESC) AS rank_in_group
        FROM candidates
    )
    SELECT ship_date, l_returnflag, l_suppkey, price
    FROM ranked WHERE rank_in_group = 1
    ORDER BY ship_date, l_returnflag, l_suppkey
    """,
)
def cau2_cheapest_top_rated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cau2_agg(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "events"),
    ).orderBy("ship_date", "l_returnflag", "l_suppkey")


# ---------------------------------------------------------------------------
# cau_3 analog — COUNT(DISTINCT) per group (A4).
# Scale: exact distinct = two-phase hash agg; approx_count_distinct is the
# documented knob when exactness isn't required.
# ---------------------------------------------------------------------------
@_register(
    "cau3_distinct_suppliers",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS total_operators
    FROM lineitem GROUP BY l_returnflag
    ORDER BY total_operators DESC, l_returnflag
    """,
)
def cau3_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("total_operators"))
        .orderBy(F.desc("total_operators"), "l_returnflag")
    )


# ---------------------------------------------------------------------------
# cau_4 analog — daily average (A2 by date, to_gold.py:107-114).
# ---------------------------------------------------------------------------
def cau4_agg(orders: DataFrame) -> DataFrame:
    """The cau_4 aggregation over ANY orders subset — shared by the
    full-recompute builder below and the incremental gold refresh
    (star_ext.py: gold_cau4_incremental_refresh)."""
    return orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            0,
        ).alias("avg_price_per_day")
    )


@_register(
    "cau4_daily_avg_order_value",
    """
    SELECT CAST(o_orderdate AS DATE) AS order_date,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 0)
             AS avg_price_per_day
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def cau4_daily_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cau4_agg(load_table(spark, sf_dir, "orders")).orderBy("order_date")


# ---------------------------------------------------------------------------
# cau_5 analog — volume per entity, desc (A1, to_gold.py:116-123).
# ---------------------------------------------------------------------------
@_register(
    "cau5_event_volume",
    """
    SELECT user_id, COUNT(*) AS total_reviews
    FROM events GROUP BY user_id
    ORDER BY total_reviews DESC, user_id
    """,
)
def cau5_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("total_reviews"))
        .orderBy(F.desc("total_reviews"), "user_id")
    )


# ---------------------------------------------------------------------------
# cau_6 analog — expression-inside-AVG + HAVING (A2, A7); parity quirk kept:
# grouped by supplier but only the aggregate is projected (to_gold.py:141-145).
# ---------------------------------------------------------------------------
@_register(
    "cau6_satisfaction_having",
    """
    SELECT ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * 5
                       + CAST(l_tax AS DECIMAL(18,2)) * 10) AS DOUBLE)
                 / COUNT(*), 2) AS avg_rating_10pt
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) >= 50
    ORDER BY avg_rating_10pt DESC
    """,
)
def cau6_satisfaction_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_discount").cast("decimal(18,2)") * 5
                    + F.col("l_tax").cast("decimal(18,2)") * 10
                ).cast("double")
                / F.count("*"),
                2,
            ).alias("avg_rating_10pt"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") >= 50)
        .select("avg_rating_10pt")
        .orderBy(F.desc("avg_rating_10pt"))
    )


# ---------------------------------------------------------------------------
# cau_7 analog — sequence() row generator, DISTINCT flags, CROSS JOIN
# densification + LEFT JOIN + COALESCE (J5, to_gold.py:149-179).
# Scale: the grid is |users| × 24 — built from two broadcast-able distincts;
# the only fact-sized work is the distinct() partial agg.
# ---------------------------------------------------------------------------
@_register(
    "cau7_hourly_coverage_grid",
    """
    WITH hours AS (SELECT unnest(range(0, 24)) AS hour),
    user_hours AS (
        SELECT DISTINCT user_id, CAST(hour(ts) AS BIGINT) AS hour FROM events
    ),
    flags AS (SELECT user_id, hour, 1 AS has_event FROM user_hours),
    users AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id, h.hour,
           COALESCE(f.has_event, 0) AS has_event
    FROM users u CROSS JOIN hours h
    LEFT JOIN flags f ON u.user_id = f.user_id AND h.hour = f.hour
    ORDER BY u.user_id, h.hour
    """,
)
def cau7_hourly_coverage_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hours = (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"))
        .select(F.col("h").cast("bigint").alias("hour"))
    )
    user_hours = events.select(
        "user_id", F.hour("ts").cast("bigint").alias("hour")
    ).distinct()
    flags = user_hours.withColumn("has_event", F.lit(1))
    users = events.select("user_id").distinct()
    return (
        users.crossJoin(F.broadcast(hours))
        .join(flags, on=["user_id", "hour"], how="left")
        .select(
            "user_id", "hour", F.coalesce("has_event", F.lit(0)).alias("has_event")
        )
        .orderBy("user_id", "hour")
    )


# ---------------------------------------------------------------------------
# cau_8 analog — fixed-range grid + MIN-dedup of names (to_gold.py:181-218):
# supplier × p_size(1..25) coverage from lineitem⋈part, with min(p_name)
# as the label per size.
# Scale: lineitem⋈part is the one fact-fact join — it shuffles on partkey
# unless part is broadcast-able (it is, at every SF here: |part| = 200×sf).
# ---------------------------------------------------------------------------
@_register(
    "cau8_size_coverage_grid",
    """
    WITH source AS (
        SELECT l.l_suppkey, p.p_size, p.p_name
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size BETWEEN 1 AND 25
    ),
    sizes AS (SELECT CAST(unnest(range(1, 26)) AS INTEGER) AS p_size),
    suppliers AS (SELECT DISTINCT l_suppkey FROM source),
    flags AS (SELECT DISTINCT l_suppkey, p_size, 1 AS has_size FROM source),
    name_dedup AS (
        SELECT p_size, MIN(p_name) AS size_label
        FROM part WHERE p_size BETWEEN 1 AND 25 GROUP BY p_size
    )
    SELECT s.l_suppkey, z.p_size,
           COALESCE(f.has_size, 0) AS has_size,
           n.size_label
    FROM suppliers s CROSS JOIN sizes z
    LEFT JOIN flags f ON s.l_suppkey = f.l_suppkey AND z.p_size = f.p_size
    LEFT JOIN name_dedup n ON z.p_size = n.p_size
    ORDER BY s.l_suppkey, z.p_size
    """,
)
def cau8_size_coverage_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(1, 25))
    source = li.join(
        F.broadcast(part), on=F.col("l_partkey") == F.col("p_partkey")
    ).select("l_suppkey", "p_size", "p_name")
    sizes = (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(1), F.lit(25))).alias("s"))
        .select(F.col("s").cast("int").alias("p_size"))
    )
    suppliers = source.select("l_suppkey").distinct()
    flags = source.select("l_suppkey", "p_size").distinct().withColumn(
        "has_size", F.lit(1)
    )
    name_dedup = part.groupBy("p_size").agg(F.min("p_name").alias("size_label"))
    return (
        suppliers.crossJoin(F.broadcast(sizes))
        .join(flags, on=["l_suppkey", "p_size"], how="left")
        .join(F.broadcast(name_dedup), on="p_size", how="left")
        .select(
            "l_suppkey",
            "p_size",
            F.coalesce("has_size", F.lit(0)).alias("has_size"),
            "size_label",
        )
        .orderBy("l_suppkey", "p_size")
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 — pricing summary: the headline scan-heavy aggregation.
# Scale: pure map-side partial agg over the biggest table; whole-stage
# codegen end-to-end, filter pushed to parquet.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc_price = price * (1 - disc)
    n = F.count("*")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + tax)), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / n, 4).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / n, 4).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / n, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 — shipping priority: 3-way join with selective filters.
# Scale: customer filter first (pushed down), broadcast customer keys into
# orders, shuffle join orders⋈lineitem on orderkey.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1996-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1996-03-15").cast("date")
    )
    return (
        # customer is a bounded dim -> explicit broadcast; the filtered
        # orders side is FACT-derived, so no hint: AQE broadcasts it at
        # small SF and falls back to shuffle join when it outgrows the
        # threshold (a quarter of orders at 100 TB is not broadcastable).
        li.join(
            orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 — region revenue: 6-table snowflake join.
# Scale: region/nation/supplier/customer broadcast; the only shuffles are
# orders⋈lineitem on orderkey.  Catalyst reorders the small joins freely.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q5_region_revenue",
    """
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {name: load_table(spark, sf_dir, name) for name in
         ("region", "nation", "customer", "orders", "lineitem", "supplier")}
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            F.broadcast(t["supplier"]),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 — forecast revenue change: pure pushed-down filter + global agg.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q6_revenue_delta",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins — not used by the reference but part of the engine's
# exposed join surface (SURVEY §2.3 "gets semi/anti for free").
# ---------------------------------------------------------------------------
@_register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
                        AND CAST(o.o_orderdate AS DATE) < DATE '1996-07-01')
    ORDER BY c_custkey
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join with a pushed-down filter on the right side: customers
    with no order in 1996H1 (a window, so the result is non-empty at
    every SF — every customer has SOME order in this data)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@_register(
    "join_semi_nations_with_suppliers",
    """
    SELECT n.n_name
    FROM nation n
    WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
    ORDER BY n.n_name
    """,
)
def join_semi_nations_with_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey, "left_semi")
        .select("n_name")
        .orderBy("n_name")
    )
