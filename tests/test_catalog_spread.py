"""Round-10 optimization: compute-spread invariants.

The testdata parquet files are single-row-group, so the scan can never
parallelize them; ``catalog.spread_small_input`` hash-repartitions a
SMALL input so downstream per-row compute leaves the serial scan task
(opt-in at operator/fixture call sites; no-op past the size ceiling).
These tests pin: content is unchanged, the spread fires below the
ceiling and is sized to defaultParallelism, it stays off above the
ceiling / when disabled, and predicate pushdown still reaches the scan
through the repartition.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark import catalog

SF001 = "/root/testdata/sf0.01"


@pytest.fixture()
def _spread_env():
    """Snapshot/restore the spread env knobs around each test."""
    keys = ("VLPS_SPREAD", "VLPS_SPREAD_MAX_BYTES")
    saved = {k: os.environ.get(k) for k in keys}
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_spread_preserves_content(spark, _spread_env):
    plain = catalog.load_table(spark, SF001, "lineitem")
    spread = catalog.spread_small_input(plain, "l_orderkey", "l_linenumber")
    assert spread.count() == plain.count()
    cols = plain.columns
    a = plain.select(*cols).exceptAll(spread.select(*cols))
    b = spread.select(*cols).exceptAll(plain.select(*cols))
    assert a.isEmpty() and b.isEmpty()


def test_spread_fires_below_ceiling(spark, _spread_env):
    os.environ["VLPS_SPREAD"] = "1"
    df = catalog.spread_small_input(
        catalog.load_table(spark, SF001, "lineitem"), "l_orderkey"
    )
    n = df.rdd.getNumPartitions()
    assert n == spark.sparkContext.defaultParallelism
    per = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert len(per) > 1  # actually spread across partitions


def test_spread_skips_above_ceiling_and_disabled(spark, _spread_env):
    base = catalog.load_table(spark, SF001, "lineitem")
    # ceiling below the table's size -> layout untouched
    os.environ["VLPS_SPREAD_MAX_BYTES"] = "1024"
    kept = catalog.spread_small_input(base, "l_orderkey")
    assert kept.rdd.getNumPartitions() == base.rdd.getNumPartitions()
    os.environ.pop("VLPS_SPREAD_MAX_BYTES")
    # kill switch
    os.environ["VLPS_SPREAD"] = "0"
    off = catalog.spread_small_input(base, "l_orderkey")
    assert off.rdd.getNumPartitions() == base.rdd.getNumPartitions()


def test_spread_roundrobin_without_keys(spark, _spread_env):
    os.environ["VLPS_SPREAD"] = "1"
    df = catalog.spread_small_input(
        catalog.load_table(spark, SF001, "documents")
    )
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert df.count() == catalog.load_table(spark, SF001, "documents").count()


def test_spread_pushdown_survives(spark, _spread_env):
    """Filters and pruning must push THROUGH the repartition to the scan."""
    os.environ["VLPS_SPREAD"] = "1"
    df = catalog.spread_small_input(
        catalog.load_table(spark, SF001, "lineitem"), "l_orderkey"
    ).filter(F.col("l_shipdate") >= "1995-01-01").select(
        "l_orderkey", "l_shipdate"
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scan = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert scan and "l_shipdate" in scan[0]
