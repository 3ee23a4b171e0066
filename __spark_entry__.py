"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-oracle SQL for the sf0.01 correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vexere_lakehouse_pipeline_spark.plans import (
    corpus,
    corpus_ext,
    governance,
    mining,
    sketch_gates,
    star,
    star_ext,
    star_ml,
    star_tpch2,
    webcur,
)

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return star.QUERIES["tpch_q1_pricing_summary"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator cluster from SURVEY.md §2."""
    return {**star.QUERIES, **star_ml.QUERIES, **star_ext.QUERIES, **star_tpch2.QUERIES, **corpus.QUERIES, **corpus_ext.QUERIES, **governance.QUERIES, **mining.QUERIES, **sketch_gates.QUERIES, **webcur.QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/types)."""
    return {**star.ORACLE_SQL, **star_ml.ORACLE_SQL, **star_ext.ORACLE_SQL, **star_tpch2.ORACLE_SQL, **corpus.ORACLE_SQL, **corpus_ext.ORACLE_SQL, **governance.ORACLE_SQL, **mining.ORACLE_SQL, **sketch_gates.ORACLE_SQL, **webcur.ORACLE_SQL}
