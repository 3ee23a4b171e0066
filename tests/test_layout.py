"""Z-order clustering (operators/layout.py): correctness + the
data-skipping payoff it exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import layout

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_zorder_write_roundtrips_all_rows(spark, tmp_path):
    o = _orders(spark)
    path = str(tmp_path / "z")
    layout.write_zordered(o, path, ["o_custkey", "o_totalprice"], n_files=8)
    back = spark.read.parquet(path)
    assert back.columns == o.columns or set(back.columns) == set(o.columns)
    assert back.count() == o.count()
    assert (
        back.agg(F.sum("o_orderkey")).first()[0]
        == o.agg(F.sum("o_orderkey")).first()[0]
    )


def test_zorder_prunes_second_dimension_linear_does_not(spark, tmp_path):
    o = _orders(spark)
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "l")
    layout.write_zordered(o, zpath, ["o_custkey", "o_totalprice"], n_files=8)
    layout.write_linear(o, lpath, "o_custkey", n_files=8)

    lo, hi = o.approxQuantile("o_totalprice", [0.45, 0.55], 0.0)
    zstats = layout.file_minmax_stats(spark, zpath, ["o_totalprice"])
    lstats = layout.file_minmax_stats(spark, lpath, ["o_totalprice"])
    z_hit = layout.candidate_files(zstats, "o_totalprice", lo, hi)
    l_hit = layout.candidate_files(lstats, "o_totalprice", lo, hi)
    # custkey-sorted files each span ~the full price range -> no pruning;
    # z-ordered files have bounded price ranges -> real pruning.
    assert len(l_hit) == len(lstats)
    assert len(z_hit) < len(zstats)
    # and the first dimension still prunes under z-order (tight boxes in
    # BOTH dims is the whole point)
    # off-center box: a mid-span box can straddle the top-bit split
    # (worst case for any space-filling curve) and touch every file
    ck_lo, ck_hi = o.approxQuantile("o_custkey", [0.05, 0.15], 0.0)
    zc = layout.file_minmax_stats(spark, zpath, ["o_custkey"])
    assert len(layout.candidate_files(zc, "o_custkey", ck_lo, ck_hi)) < len(zc)


def test_zorder_key_handles_constant_column(spark):
    df = spark.range(100).select(
        F.col("id").alias("a"), F.lit(7).alias("b")
    )
    keyed = df.withColumn("z", layout.zorder_key(df, ["a", "b"], bits=8))
    assert keyed.filter(F.col("z").isNull()).count() == 0
    # constant column contributes nothing; key stays monotone in `a`
    rows = keyed.orderBy("a").select("z").collect()
    assert all(rows[i].z <= rows[i + 1].z for i in range(len(rows) - 1))


def test_zorder_rejects_overflowing_bit_budget(spark):
    import pytest

    df = spark.range(10).selectExpr(*[f"id as c{i}" for i in range(6)])
    with pytest.raises(ValueError, match="exceeds 62"):
        layout.zorder_key(df, [f"c{i}" for i in range(6)], bits=12)


def test_zorder_nulls_sort_low_and_empty_ok(spark):
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(None, 1.0), (100.0, 1.0), (0.0, 1.0)], "x double, y double"
    )
    keyed = df.withColumn("z", layout.zorder_key(df, ["x", "y"], bits=4))
    rows = {r.x: r.z for r in keyed.collect()}
    assert rows[None] == rows[0.0]  # null buckets with the minimum
    assert rows[100.0] > rows[None]
    empty = df.filter(F2.col("y") < 0)
    assert empty.withColumn("z", layout.zorder_key(empty, ["x"], 8)).count() == 0


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Scale evidence: a date-partitioned fact joined to a filtered dim
    triggers Spark's dynamic partition pruning — the fact scan reads
    only partitions matching the dim filter, discovered AT RUNTIME via
    the reused broadcast.  This is the mechanism that makes
    dim-filtered star joins touch a sliver of a 100 TB fact table."""
    from pyspark.sql import functions as F

    fact = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("part"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "fact_part")
    fact.write.mode("overwrite").partitionBy("part").parquet(path)
    dim = spark.createDataFrame(
        [(3, "keep"), (7, "keep2")], "part long, name string"
    )
    joined = (
        spark.read.parquet(path)
        .join(dim.filter(F.col("name") == "keep"), on="part")
        .select("k", "v", "name")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(part" in plan, plan[:2000]
    rows = joined.collect()
    assert len(rows) == 1000 and {r["name"] for r in rows} == {"keep"}


def test_compact_files_coalesce_mode_lossless(spark, tmp_path):
    """Default (shuffle-free) compaction: fewer files, identical rows."""
    o = _orders(spark)
    src, dst = str(tmp_path / "frag"), str(tmp_path / "opt")
    o.repartition(32).write.mode("overwrite").parquet(src)
    stats = layout.compact_files(spark, src, dst, target_mb=64)
    assert stats["files_before"] == 32
    assert stats["files_after"] == stats["n_out"] == 1
    back = spark.read.parquet(dst)
    assert back.count() == o.count()
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in o.collect()
    )


def test_compact_files_order_by_mode_reclusters(spark, tmp_path):
    """order_by mode: compaction that also (re)clusters — output files
    hold disjoint key ranges, so min-max pruning survives the rewrite."""
    o = _orders(spark)
    src, dst = str(tmp_path / "frag"), str(tmp_path / "opt")
    # fragment WITHOUT clustering: every tiny file spans the key space
    o.repartition(32).write.mode("overwrite").parquet(src)
    total = layout.fs_file_stats(spark, src)[1]
    # target sized to yield ~4 output files (fractional MB: tiny SF)
    stats = layout.compact_files(
        spark, src, dst, target_mb=total / 4 / (1 << 20),
        order_by=["o_custkey"],
    )
    assert 1 < stats["files_after"] < 32
    fstats = layout.file_minmax_stats(spark, dst, ["o_custkey"])
    spans = sorted((s["lo_o_custkey"], s["hi_o_custkey"]) for s in fstats)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next  # disjoint-or-touching ranges
    assert spark.read.parquet(dst).count() == o.count()


def test_fs_file_stats_excludes_metadata_entries(spark, tmp_path):
    o = _orders(spark)
    path = str(tmp_path / "t")
    o.repartition(4).write.mode("overwrite").parquet(path)
    n, total = layout.fs_file_stats(spark, path)
    assert n == 4 and total > 0  # _SUCCESS / .crc not counted


def _xy2d(bits: int, x: int, y: int) -> int:
    """Scalar reference (classic xy2d recurrence) for exactness pins."""
    n = 1 << bits
    d, s = 0, n >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_key_matches_scalar_reference_exactly(spark):
    """Full 16x16 grid at bits=4: the distributed unrolled recurrence
    equals the scalar reference on every cell (grid coords are fixed
    points of the min-max normalization), and the key is a bijection
    whose consecutive cells are grid-adjacent — the locality property
    the curve exists for."""
    bits = 4
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.hkey
        for r in layout.with_hilbert_key(df, ["x", "y"], bits).collect()
    }
    assert got == {(x, y): _xy2d(bits, x, y) for x, y in rows}
    inv = {d: xy for xy, d in got.items()}
    assert len(inv) == n * n
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


def test_hilbert_key_nulls_and_arity(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, None), (7, 2)], "x long, y long"
    )
    out = layout.with_hilbert_key(df, ["x", "y"], bits=4).collect()
    assert all(r.hkey is not None for r in out)  # nulls bucket to 0
    import pytest as _pt
    with _pt.raises(ValueError):
        layout.with_hilbert_key(df, ["x"], bits=4)
    with _pt.raises(ValueError):
        layout.with_hilbert_key(df, ["x", "y"], bits=32)


def test_hilbert_prunes_both_dimensions(spark, tmp_path):
    """The payoff twin of the zorder pruning test: Hilbert clustering
    keeps SECOND-dimension bounding boxes tight too (measured against
    zorder at sf0.1 in tools/ZORDER_BYTES.md)."""
    o = _orders(spark)
    hpath = str(tmp_path / "h")
    layout.write_hilbert(o, hpath, ["o_custkey", "o_totalprice"],
                         n_files=8, bits=8)
    assert spark.read.parquet(hpath).count() == o.count()
    lo, hi = o.approxQuantile("o_totalprice", [0.45, 0.55], 0.0)
    hstats = layout.file_minmax_stats(spark, hpath, ["o_totalprice"])
    pruned = layout.candidate_files(hstats, "o_totalprice", lo, hi)
    assert len(pruned) < 8  # a second-dimension predicate skips files
