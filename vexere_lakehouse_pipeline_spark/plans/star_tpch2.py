"""Extended TPC-H-style analytics over the driver star schema.

Widens the engine's exercised surface beyond SURVEY.md §2's J1-J8/A1-A8
(the reference never uses subqueries, set ops, top-k, frames beyond
running sums, or temporal joins): EXISTS/IN subqueries, scalar-aggregate
subqueries, anti/semi with residual predicates, INTERSECT/EXCEPT,
LIMIT top-k, ntile/percent_rank, CUBE, median, disjunctive predicate
pushdown, and the as-of / bucketed range joins from operators/joins.py.

Classic TPC-H queries are adapted to the driver schema (TESTDATA.md has
no partsupp table and single-word p_type values); each docstring names
the TPC-H shape it exercises.  Money aggregates go through
decimal(18,2) so Spark and the DuckDB oracle agree bit-for-bit (see
plans/star.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.operators.joins import (
    asof_join,
    asof_join_forward,
    range_join,
)
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


def _dec(c: str):  # money arithmetic: exact decimal, see module docstring
    return F.col(c).cast("decimal(18,2)")


def _revenue():  # built lazily: Columns need an active SparkContext
    return F.round(F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))), 2)
_REVENUE_SQL = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS subquery → left-semi join with residual predicate.
# Scale: orders date filter pushed to parquet; semi join shuffles only
# (orderkey, dates), never materializes the pair.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q4_priority_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 shape — two-nation volume: fact joined to two dimension roles of the
# same table (nation as supplier-nation AND customer-nation).
# Scale: all dims broadcast; lineitem⋈orders is the only big shuffle.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           {_REVENUE_SQL} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND CAST(l.l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1997-12-31'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate").between("1995-01-01", "1997-12-31")
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q10 shape — top-k by aggregate (returned-item revenue): the engine's
# LIMIT/top-k surface.  Scale: TakeOrderedAndProject after partial aggs —
# no global sort materialization.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q10_returned_top_customers",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name, {_REVENUE_SQL} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        # orders is fact-derived (no hint — AQE decides); cust/nation
        # are dims
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 shape — conditional aggregate ratio (promo revenue %).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q14_promo_revenue",
    """
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                 ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
           AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-09-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-10-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * promo.cast("double") / F.sum(disc_price).cast("double"), 4
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape — NOT IN subquery + COUNT(DISTINCT) over a derived
# supplier-part association (driver schema has no partsupp; lineitem
# plays that role).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 shape — correlated scalar-aggregate subquery (per-part average),
# decorrelated into an aggregate + equi-join (the plan Catalyst/any
# sane optimizer produces; written explicitly here).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q17_small_quantity_revenue",
    """
    WITH part_avg AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.5 * a.avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.round(F.sum(_dec("l_extendedprice")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape — IN over a HAVING subquery (large orders) + top-k.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date, o.o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 160)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 160)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(big, F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive (OR-of-ANDs) predicates across joined tables;
# exercises CNF conversion / partial pushdown.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q19_disjunctive_predicates",
    f"""
    SELECT {_REVENUE_SQL} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(_revenue().cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 shape — scalar-aggregate subquery threshold + NOT EXISTS.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q22_wealthy_inactive",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_cust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND CAST(o.o_orderdate AS DATE) >= DATE '1999-01-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("1999-01-01").cast("date")
    )
    # Scalar threshold via a 1-row broadcast cross join — no driver
    # collect, stays one job (SURVEY §2.1 S9 replacement).
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_thresh")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_thresh"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Q15 shape — aggregate view + "= MAX of that view" scalar subquery
# (ties preserved, like the reference's RANK-ties semantics W2).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey, {_REVENUE_SQL} AS total_revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        _revenue().cast("double").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Set operators — INTERSECT / EXCEPT (absent from the reference,
# SURVEY §2.6; part of the engine's exposed surface).
# ---------------------------------------------------------------------------
@_register(
    "setop_nations_intersect",
    """
    SELECT n.n_name FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 9000
    INTERSECT
    SELECT n.n_name FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal > 9000
    ORDER BY n_name
    """,
)
def setop_nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    a = nation.join(
        cust, F.col("n_nationkey") == F.col("c_nationkey"), "left_semi"
    ).select("n_name")
    b = nation.join(
        supp, F.col("n_nationkey") == F.col("s_nationkey"), "left_semi"
    ).select("n_name")
    return a.intersect(b).orderBy("n_name")


@_register(
    "setop_nations_except",
    """
    SELECT n.n_name FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 9000
    EXCEPT
    SELECT n.n_name FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal > 9000
    ORDER BY n_name
    """,
)
def setop_nations_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    a = nation.join(
        cust, F.col("n_nationkey") == F.col("c_nationkey"), "left_semi"
    ).select("n_name")
    b = nation.join(
        supp, F.col("n_nationkey") == F.col("s_nationkey"), "left_semi"
    ).select("n_name")
    # subtract == SQL EXCEPT (set semantics).  exceptAll().distinct()
    # would differ whenever a holds MORE duplicates of a row than b.
    return a.subtract(b).orderBy("n_name")


# ---------------------------------------------------------------------------
# Window ranking family — ntile / dense_rank / percent_rank (the frames
# the reference never uses, SURVEY §2.5).
# ---------------------------------------------------------------------------
@_register(
    "window_spend_quartiles",
    """
    WITH spend AS (
        SELECT o_custkey,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, total_spend,
           ntile(4) OVER w AS quartile,
           dense_rank() OVER w AS drank,
           ROUND(percent_rank() OVER w, 6) AS prank
    FROM spend
    WINDOW w AS (ORDER BY total_spend DESC, o_custkey)
    ORDER BY o_custkey
    """,
)
def window_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_spend")
    )
    w = Window.orderBy(F.desc("total_spend"), "o_custkey")
    return spend.select(
        "o_custkey",
        "total_spend",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    ).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations (rollup's sibling; star_ext has
# ROLLUP).  NULL group markers compared via COALESCE-free sort keys.
# ---------------------------------------------------------------------------
@_register(
    "agg_cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Exact median (percentile_cont 0.5) per group — interpolated identically
# by Spark and DuckDB; rounded to absorb float formatting.
# ---------------------------------------------------------------------------
@_register(
    "agg_median_order_value",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias(
                "median_price"
            ),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias(
                "p90_price"
            ),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# As-of join — for each error event, the user's most recent click at or
# before it (operators/joins.py asof_join; one shuffle, no subquery).
# ---------------------------------------------------------------------------
@_register(
    "asof_join_error_last_click",
    """
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           c.click_id, c.click_ts_us
    FROM events e
    LEFT JOIN LATERAL (
        SELECT c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        FROM events c
        WHERE c.user_id = e.user_id AND c.event_type = 'click'
          AND c.ts <= e.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    ) c ON TRUE
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
)
def asof_join_error_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        "ts",
    )
    out = asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id", "click_ts_us"],
        tiebreak="click_id",
    )
    return out.select(
        "event_id", "user_id", "ts_us", "click_id", "click_ts_us"
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Bounded range join — purchases within 1h after each click, same user
# (operators/joins.py range_join; bucketed equi-join, linear shuffle).
# ---------------------------------------------------------------------------
@_register(
    "range_join_click_then_purchase",
    """
    WITH clicks AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
    purchases AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase'),
    pairs AS (
        SELECT c.event_id, p.event_id AS p_id
        FROM clicks c JOIN purchases p
          ON p.user_id = c.user_id
         AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
    SELECT c.event_id, c.user_id, COUNT(p.p_id) AS n_purchases_1h
    FROM clicks c LEFT JOIN pairs p ON p.event_id = c.event_id
    GROUP BY 1, 2 ORDER BY c.event_id
    """,
)
def range_join_click_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    pairs = range_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        lower=F.expr("INTERVAL 0 SECONDS"),
        upper=F.expr("INTERVAL 1 HOURS"),
        bucket_seconds=3600,
    ).select("event_id", F.col("p_id"))
    return (
        clicks.join(pairs, on="event_id", how="left")
        .groupBy("event_id", "user_id")
        .agg(F.count("p_id").alias("n_purchases_1h"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share: conditional aggregate ratio inside a grouped
# multi-join (nation in two roles).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q8_market_share",
    """
    WITH all_orders AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
               n.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n2.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                                              AND DATE '1996-12-31'
    )
    SELECT order_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_orders GROUP BY order_year ORDER BY order_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    volume = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
    )
    return (
        base.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", volume)
                    .otherwise(F.lit(0).cast("decimal(18,2)"))
                ).cast("double")
                / F.sum(volume).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Q12 shape — bucketed conditional counts (shipping delay classes).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q12_delay_buckets",
    """
    SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) <= 30 THEN 'fast'
                WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) <= 90 THEN 'normal'
                ELSE 'slow' END AS delay_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q12_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(delay <= 30, "fast")
            .when(delay <= 90, "normal")
            .otherwise("slow")
            .alias("delay_class")
        )
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS and NOT EXISTS correlated against the same fact
# (suppliers whose lineitem is the unique latest-shipping line of a
# multi-supplier order): decorrelated into semi + anti joins.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q21_sole_late_supplier",
    """
    WITH latest AS (
        SELECT l_orderkey, MAX(l_shipdate) AS max_ship
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN latest m ON m.l_orderkey = l1.l_orderkey
                 AND l1.l_shipdate = m.max_ship
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate = m.max_ship)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    latest = li.groupBy(F.col("l_orderkey").alias("m_key")).agg(
        F.max("l_shipdate").alias("max_ship")
    )
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            latest,
            (F.col("l_orderkey") == F.col("m_key"))
            & (F.col("l_shipdate") == F.col("max_ship")),
        )
        .drop("m_key")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waited = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    sole = waited.join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("max_ship") == F.col("d3")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ---------------------------------------------------------------------------
# Q13 shape — distribution of counts: aggregate over an aggregate, with
# a left join so zero-order customers keep their bucket.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q13_order_count_distribution",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q2 shape — correlated scalar subquery (min supplycost per part) over a
# derived part-supplier relation, restricted to one region.  TESTDATA has
# no partsupp table, so MIN(l_extendedprice) per (partkey, suppkey) stands
# in for ps_supplycost (MIN of doubles is exact, so equality against the
# per-part minimum is bit-stable across engines).
# Scale: decorrelated as a per-part MIN window over the region-filtered
# relation — one shuffle on partkey, no self-join; supplier/nation/region
# dims broadcast.  (Reference ref: SURVEY §2.3 — subqueries absent there;
# this is engine-widening coverage.)
# ---------------------------------------------------------------------------
@_register(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
        FROM lineitem GROUP BY 1, 2
    ), rps AS (
        SELECT ps.*, s.s_name, s.s_acctbal, n.n_name
        FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT s_acctbal, s_name, n_name, p.p_partkey AS p_partkey, p.p_brand,
           supplycost
    FROM part p JOIN rps ON p.p_partkey = rps.l_partkey
    WHERE p.p_size <= 10 AND p.p_type = 'PROMO'
      AND supplycost = (SELECT MIN(supplycost) FROM rps r2
                        WHERE r2.l_partkey = p.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    region_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    rps = ps.join(F.broadcast(region_supp), ps.l_suppkey == F.col("s_suppkey"))
    # Decorrelate the per-part MIN as a window — no second scan/self-join.
    w = Window.partitionBy("l_partkey")
    best = rps.withColumn("min_cost", F.min("supplycost").over(w)).filter(
        F.col("supplycost") == F.col("min_cost")
    )
    sized = part.filter((F.col("p_size") <= 10) & (F.col("p_type") == "PROMO"))
    return (
        best.join(F.broadcast(sized), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q9 shape — multi-way fact/dim join with computed profit, grouped by
# nation x year.  No ps_supplycost: cost = p_retailprice * l_quantity
# (both decimal(18,2); the product's scale-4 result is identical in Spark
# and DuckDB because precision 37 needs no truncation).
# Scale: one shuffle per join on the fact side; part/supplier/nation
# broadcast at any SF where dims stay small relative to the fact.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q9_product_profit",
    """
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS profit
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY 1, 2 ORDER BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit_expr = _dec("l_extendedprice") * (1 - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit_expr), 2).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# Q11 shape — scalar aggregate subquery as a HAVING threshold: parts whose
# inventory value (within a nation group) exceeds 1/1200 of the group
# total.  The fraction is expressed as an integer multiply (v * 1200 >
# total) so the decimal comparison is exact in both engines.
# Scale: the global total is a 1-row aggregate broadcast into the filter —
# no driver collect, no second shuffle of the big side.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q11_important_stock",
    """
    WITH val AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                      JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        GROUP BY 1
    )
    SELECT partkey, CAST(v AS DOUBLE) AS value FROM val
    WHERE v * 1200 > (SELECT SUM(v) FROM val)
    ORDER BY value DESC, partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_dec("l_extendedprice")).alias("v"))
    )
    total = val.agg(F.sum("v").alias("total"))  # 1 row -> broadcast NL join
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v") * 1200 > F.col("total"))
        .select("partkey", F.col("v").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


# ---------------------------------------------------------------------------
# Q20 shape — nested IN subqueries with a correlated aggregate: suppliers
# who shipped more than half of a red part's 1997 volume.  qty * 2 >
# total keeps the decimal comparison exact.
# Scale: per-part totals via a window over the (partkey, suppkey)
# aggregate — one shuffle; the supplier probe is a left-semi join.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q20_dominant_supplier",
    """
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY 1, 2
    ), tot AS (
        SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY 1
    )
    SELECT s_name, s_acctbal FROM supplier WHERE s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh JOIN tot ON tot.l_partkey = sh.l_partkey
             JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE p.p_name LIKE 'red%' AND sh.qty * 2 > tot.total_qty
    ) ORDER BY s_name
    """,
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load_table(spark, sf_dir, "supplier")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("qty")
    )
    dominant = (
        shipped.withColumn(
            "total_qty", F.sum("qty").over(Window.partitionBy("l_partkey"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Multiset set ops — EXCEPT ALL / INTERSECT ALL keep duplicate
# multiplicity (the bag semantics DISTINCT set ops destroy).  Shape:
# per-customer order-priority bags in two halves of 1996 compared as
# multisets.
# ---------------------------------------------------------------------------
@_register(
    "setop_priority_bags_except_all",
    """
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
    EXCEPT ALL
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    ORDER BY o_custkey, o_orderpriority
    """,
)
def setop_priority_bags_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-07-01").cast("date"))
    ).select("o_custkey", "o_orderpriority")
    h2 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_custkey", "o_orderpriority")
    return h1.exceptAll(h2).orderBy("o_custkey", "o_orderpriority")


@_register(
    "setop_priority_bags_intersect_all",
    """
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
    INTERSECT ALL
    SELECT o_custkey, o_orderpriority FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    ORDER BY o_custkey, o_orderpriority
    """,
)
def setop_priority_bags_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h1 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-07-01").cast("date"))
    ).select("o_custkey", "o_orderpriority")
    h2 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_custkey", "o_orderpriority")
    return h1.intersectAll(h2).orderBy("o_custkey", "o_orderpriority")


# ---------------------------------------------------------------------------
# Forward as-of join — for each error event, the user's NEXT click at
# or after it (operators/joins.py asof_join_forward; the time-to-
# recovery / next-action pattern, same one-shuffle union+window shape
# as the backward join).
# ---------------------------------------------------------------------------
@_register(
    "asof_join_error_next_click",
    """
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           c.click_id, c.click_ts_us
    FROM events e
    LEFT JOIN LATERAL (
        SELECT c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        FROM events c
        WHERE c.user_id = e.user_id AND c.event_type = 'click'
          AND c.ts >= e.ts
        ORDER BY c.ts ASC, c.event_id ASC LIMIT 1
    ) c ON TRUE
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
)
def asof_join_error_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        "ts",
    )
    out = asof_join_forward(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id", "click_ts_us"],
        tiebreak="click_id",
    )
    return out.select(
        "event_id", "user_id", "ts_us", "click_id", "click_ts_us"
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Bounded-history forward as-of join (round-8 verdict #4, the sibling
# of events_journey_paths_capped): the skew16 probe records the as-of
# window chain sorting a 15/16-hot user's history in one task; the
# production defense is the keep-latest-N pre-window cut
# (operators/skew.py:bounded_key_history).  This row pins the capped
# semantics — next-click recovery over each user's latest 50 events —
# with the oracle applying the identical cut before the same lateral.
# The cap bites at every sf (users average ~67 events, max ~99).
# ---------------------------------------------------------------------------
_ASOF_HISTORY_CAP = 50


@_register(
    "asof_join_error_next_click_capped",
    f"""
    WITH hist_capped AS (
        SELECT event_id, user_id, ts, event_type FROM (
            SELECT event_id, user_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS hrn
            FROM events) WHERE hrn <= {_ASOF_HISTORY_CAP}
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           c.click_id, c.click_ts_us
    FROM hist_capped e
    LEFT JOIN LATERAL (
        SELECT c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
        FROM hist_capped c
        WHERE c.user_id = e.user_id AND c.event_type = 'click'
          AND c.ts >= e.ts
        ORDER BY c.ts ASC, c.event_id ASC LIMIT 1
    ) c ON TRUE
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
)
def asof_join_error_next_click_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.skew import (
        bounded_key_history,
    )

    events = load_table(spark, sf_dir, "events")
    capped = bounded_key_history(
        events.select("event_id", "user_id", "ts", "event_type"),
        key="user_id", ts_col="ts", max_rows=_ASOF_HISTORY_CAP,
        tiebreak="event_id",
    )
    errors = capped.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    clicks = capped.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_ts_us"),
        "ts",
    )
    out = asof_join_forward(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_id", "click_ts_us"],
        tiebreak="click_id",
    )
    return out.select(
        "event_id", "user_id", "ts_us", "click_id", "click_ts_us"
    ).orderBy("event_id")
