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
