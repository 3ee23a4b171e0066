"""Sequence-packing operator: distributed prefix sum == global-window
semantics, partitioning invariance, chunk-math invariants, and the
no-single-partition-exchange scale guarantee."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators.packing import (
    ordered_prefix_sum,
    pack_concat_chunks,
)


def _rows(n, spark):
    # deterministic pseudo-random token counts incl. zeros
    data = [(i, (i * 37 + 11) % 23) for i in range(n)]
    return spark.createDataFrame(data, "doc_id long, n_tokens long")


def test_prefix_sum_matches_global_window(spark):
    df = _rows(400, spark)
    got = {
        r["doc_id"]: r["start_offset"]
        for r in ordered_prefix_sum(df, "doc_id", "n_tokens").collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["want"]
        for r in df.select(
            "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("want")
        ).collect()
    }
    assert got == want


def test_prefix_sum_invariant_under_repartitioning(spark):
    df = _rows(300, spark)
    base = {
        r["doc_id"]: r["start_offset"]
        for r in ordered_prefix_sum(df, "doc_id", "n_tokens").collect()
    }
    for parts in (1, 3, 17):
        shuffled = df.repartition(parts, "n_tokens")  # adversarial layout
        got = {
            r["doc_id"]: r["start_offset"]
            for r in ordered_prefix_sum(shuffled, "doc_id", "n_tokens").collect()
        }
        assert got == base


def test_prefix_sum_null_values_count_zero(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: r["start_offset"]
        for r in ordered_prefix_sum(df, "doc_id", "n_tokens").collect()
    }
    assert got == {1: 0, 2: 5, 3: 5}


def test_prefix_sum_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    out = ordered_prefix_sum(df, "doc_id", "n_tokens")
    assert out.columns == ["doc_id", "n_tokens", "start_offset"]
    assert out.count() == 0


def test_pack_chunks_invariants(spark):
    ctx = 16
    df = _rows(200, spark)
    out = pack_concat_chunks(df, "doc_id", "n_tokens", ctx)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    # zero-token docs dropped
    assert all(r["n_tokens"] > 0 for r in rows)
    offset = 0
    for r in rows:
        # contiguity: the stream has no gaps once zero-token docs are out
        assert r["start_offset"] == offset
        offset += r["n_tokens"]
        assert r["start_chunk"] == r["start_offset"] // ctx
        assert r["end_chunk"] == (r["start_offset"] + r["n_tokens"] - 1) // ctx
        assert r["n_chunks"] == r["end_chunk"] - r["start_chunk"] + 1
        # a doc spans at most ceil(tokens/ctx)+1 chunks
        assert r["n_chunks"] <= r["n_tokens"] // ctx + 2


def test_pack_chunks_rejects_bad_ctx(spark):
    df = _rows(5, spark)
    with pytest.raises(ValueError, match="ctx"):
        pack_concat_chunks(df, "doc_id", "n_tokens", 0)


def test_prefix_sum_plan_has_no_single_partition_exchange(spark):
    """The scale property the operator exists for: no global-window
    Exchange SinglePartition anywhere in the physical plan."""
    df = _rows(500, spark)
    out = ordered_prefix_sum(df, "doc_id", "n_tokens")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    # the cumulative window must be partitioned by _pid, not global
    # (the range exchange itself sits behind the localCheckpoint cut)
    assert re.search(r"windowspecdefinition\(_pid", plan)


def test_quant_stats_null_and_zero_vectors(spark):
    """embed_int8_quant_stats contract on degenerate vectors: NULL
    embedding and all-zero embedding produce NULL stats, not errors."""
    from vexere_lakehouse_pipeline_spark.plans.corpus_ext import (
        embed_int8_quant_stats,
    )
    import vexere_lakehouse_pipeline_spark.catalog as catalog

    df = spark.createDataFrame(
        [(1, [0.5, -1.0]), (2, None), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    orig = catalog.load_table
    try:
        catalog.load_table = lambda *_a, **_k: df
        # re-point the module-level import used inside the query fn
        import vexere_lakehouse_pipeline_spark.plans.corpus_ext as ce

        ce.load_table = catalog.load_table
        rows = {r["vec_id"]: r for r in embed_int8_quant_stats(spark, "x").collect()}
    finally:
        catalog.load_table = orig
        import vexere_lakehouse_pipeline_spark.plans.corpus_ext as ce

        ce.load_table = orig
    assert rows[1]["max_abs"] == 1.0 and rows[1]["mse"] is not None
    assert rows[2]["mse"] is None and rows[2]["l2_norm"] is None
    assert rows[3]["mse"] is None  # zero vector: no valid scale
    assert rows[3]["l2_norm"] == 0.0


def test_prefix_sum_rejects_null_keys_and_reserved_columns(spark):
    import pytest

    from vexere_lakehouse_pipeline_spark.operators.packing import (
        ordered_prefix_sum,
    )

    with_null = spark.createDataFrame(
        [(None, 5), (1, 3)], "k int, v int"
    )
    with pytest.raises(ValueError, match="NULL"):
        ordered_prefix_sum(with_null, "k", "v")

    reserved = spark.createDataFrame([(1, 2, 3)], "k int, v int, _pid int")
    with pytest.raises(ValueError, match="reserve"):
        ordered_prefix_sum(reserved, "k", "v")


def test_distributed_ntile_matches_window_ntile(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.packing import (
        distributed_ntile,
    )

    # 103 rows, k=4 -> uneven buckets (3 of 26, 1 of 25): must match
    # the window ntile row for row.
    df = spark.createDataFrame(
        [(i, (i * 37) % 103) for i in range(103)], ["id", "v"]
    )
    want = {
        r.id: r.b
        for r in df.select(
            "id", F.ntile(4).over(Window.orderBy("v", "id")).alias("b")
        ).collect()
    }
    got = {
        r.id: r.bucket
        for r in distributed_ntile(df, ["v", "id"], 4).collect()
    }
    assert got == want

    # fewer rows than buckets: every row its own bucket by rank
    tiny = spark.createDataFrame([(1,), (2,)], ["id"])
    got2 = {
        r.id: r.bucket for r in distributed_ntile(tiny, "id", 5).collect()
    }
    want2 = {
        r.id: r.b
        for r in tiny.select(
            "id", F.ntile(5).over(Window.orderBy("id")).alias("b")
        ).collect()
    }
    assert got2 == want2

    import pytest

    with pytest.raises(ValueError, match="positive"):
        distributed_ntile(df, "id", 0)


def test_distributed_ntile_even_split_and_guards(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.packing import (
        distributed_ntile,
    )

    # 100 rows / 4 buckets: the r == 0 (evenly divisible) branch.
    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    want = {
        r.id: r.b
        for r in df.select(
            "id", F.ntile(4).over(Window.orderBy("id")).alias("b")
        ).collect()
    }
    got = {r.id: r.bucket for r in distributed_ntile(df, "id", 4).collect()}
    assert got == want

    # empty input: schema-correct, no crash
    empty = spark.createDataFrame([], "id int")
    assert distributed_ntile(empty, "id", 4).count() == 0

    import pytest

    clash = spark.createDataFrame([(1, 2)], ["id", "bucket"])
    with pytest.raises(ValueError, match="reserve"):
        distributed_ntile(clash, "id", 4)
