"""Salting operators (operators/skew.py): correctness vs plain plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join,
    with_salt,
)

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain_groupby(spark):
    li = load_table(spark, SF, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        [F.count("*").alias("c"), F.sum("l_quantity").alias("s")],
        [F.sum("c").alias("n"), F.sum("s").alias("q")],
        salt_from="l_orderkey",
        n_salts=8,
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_partkey", "pk"
    )
    part = load_table(spark, SF, "part").withColumnRenamed("p_partkey", "pk")
    plain = (
        li.join(part, on="pk")
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, part, on="pk", salt_from="l_orderkey", n_salts=8)
        .groupBy("p_type")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_with_salt_spreads_hot_key(spark):
    hot = spark.range(0, 10_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("row_id")
    )
    salted = with_salt(hot, "row_id", 16)
    per_salt = salted.groupBy("_salt").count().collect()
    assert len(per_salt) == 16  # every salt bucket used
    assert max(r["count"] for r in per_salt) < 10_000 * 0.25  # spread out


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    from vexere_lakehouse_pipeline_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, 10)], "k int, fv int")
    dim = spark.createDataFrame([(1, "x")], "k int, dv string")
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(fact, dim, on="k", salt_from="fv", how="full")


def test_bounded_key_history_semantics(spark):
    """The keep-latest-N cut: (a) bit-identical to the naive single-
    window latest-N for any input partitioning; (b) keys under the cap
    pass through whole; (c) hot keys are cut to exactly max_rows of
    their LATEST rows; (d) columns unchanged."""
    from pyspark.sql import Window

    from vexere_lakehouse_pipeline_spark.operators.skew import (
        bounded_key_history,
    )

    events = load_table(spark, SF, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    cap = 20
    got = bounded_key_history(events, key="user_id", ts_col="ts",
                              max_rows=cap, tiebreak="event_id")
    assert got.columns == events.columns
    # naive single-window reference
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    want = (
        events.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap).drop("_r")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # partitioning-invariance: a repartitioned input yields the same cut
    again = bounded_key_history(
        events.repartition(13, "event_id"), key="user_id", ts_col="ts",
        max_rows=cap, tiebreak="event_id",
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, want.collect())
    )
    # per-key counts: min(cap, n_key); survivors are the LATEST rows
    sizes = {r["user_id"]: r["n"] for r in
             events.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    out_sizes = {r["user_id"]: r["n"] for r in
                 got.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert out_sizes == {u: min(cap, n) for u, n in sizes.items()}
    hot = max(sizes, key=sizes.get)
    newest_kept = got.filter(F.col("user_id") == hot).agg(
        F.max("ts")).first()[0]
    newest_all = events.filter(F.col("user_id") == hot).agg(
        F.max("ts")).first()[0]
    assert newest_kept == newest_all  # latest row always survives
