"""Every registered star query hash-matches its DuckDB oracle at
sf0.001 (fast mirror of the driver's sf0.01 gate)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from tools.check_oracle import table_hash  # noqa: E402

from vexere_lakehouse_pipeline_spark.catalog import TESTDATA_TABLES
from vexere_lakehouse_pipeline_spark.plans import (
    corpus,
    corpus_ext,
    governance,
    sketch_gates,
    star,
    star_ext,
    star_ml,
    star_tpch2,
    webcur,
)

ALL_QUERIES = {**star.QUERIES, **star_ml.QUERIES, **star_ext.QUERIES, **star_tpch2.QUERIES, **corpus.QUERIES, **corpus_ext.QUERIES, **governance.QUERIES, **sketch_gates.QUERIES, **webcur.QUERIES}
ALL_ORACLES = {**star.ORACLE_SQL, **star_ml.ORACLE_SQL, **star_ext.ORACLE_SQL, **star_tpch2.ORACLE_SQL, **corpus.ORACLE_SQL, **corpus_ext.ORACLE_SQL, **governance.ORACLE_SQL, **sketch_gates.ORACLE_SQL, **webcur.ORACLE_SQL}

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def spark_results(spark):
    """Every registered query's Spark rows, computed ONCE for the
    module with independent queries overlapped on a small driver
    thread pool (optimization guide §2.6: actions are only sequential
    because the driver calls them sequentially).  Round-11: the
    previous serial per-test collect() made this file ~8 minutes of
    almost pure job-latency wait — the driver's verify budget gate.
    Each query still computes fully on Spark and each parametrized
    test below still compares (and fails) individually; a build/collect
    error is re-raised inside the one test that owns the query."""
    from concurrent.futures import ThreadPoolExecutor

    def run(name):
        try:
            sdf = ALL_QUERIES[name](spark, SF_DIR)
            return name, (sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as exc:  # noqa: BLE001 - owned by that test
            return name, exc

    with ThreadPoolExecutor(max_workers=6) as pool:
        return dict(pool.map(run, sorted(ALL_QUERIES)))


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_star_query_matches_oracle(spark_results, oracle_con, name):
    got = spark_results[name]
    if isinstance(got, Exception):
        raise got
    scols, srows = got
    if name not in ALL_ORACLES:
        assert len(srows) > 0  # rows-only: must at least be non-empty
        return
    cur = oracle_con.execute(ALL_ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(scols, srows) == table_hash(ocols, orows)


def test_approx_count_distinct_within_tolerance(spark):
    """The approximate sketch surface (HLL) has no cross-engine oracle;
    pin it against the exact count instead (rsd 1%)."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    exact, approx = li.agg(
        F.countDistinct("l_orderkey").alias("e"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.03


def test_approx_percentile_brackets_exact(spark):
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders")
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01
