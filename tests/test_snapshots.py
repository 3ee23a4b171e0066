"""Versioned-table tests (operators/snapshots.py): commit, time
travel, rollback, atomic publish semantics."""

from __future__ import annotations

import pytest

from vexere_lakehouse_pipeline_spark.operators.snapshots import SnapshotTable


def _counts(spark, t, **kw):
    return t.read(spark, **kw).count()


def test_commit_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    v0 = t.commit(spark.range(10), note="initial")
    v1 = t.commit(spark.range(25), note="grew")
    assert (v0, v1) == (0, 1)
    assert _counts(spark, t) == 25                 # current
    assert _counts(spark, t, version=0) == 10      # time travel
    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["is_current"] and not hist[0]["is_current"]


def test_as_of_timestamp_read(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(5))
    ts_between = t.history()[0]["committed_at"] + 1e-4
    t.commit(spark.range(50))
    assert _counts(spark, t, as_of_ts=ts_between) == 5
    with pytest.raises(ValueError):
        t.read(spark, as_of_ts=0.0)  # before the first commit


def test_rollback_is_metadata_only_and_reversible(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(10))
    t.commit(spark.range(99))
    t.rollback(0)
    assert _counts(spark, t) == 10
    # the newer version's data is still there — roll forward again
    t.rollback(1)
    assert _counts(spark, t) == 99
    with pytest.raises(ValueError):
        t.rollback(7)


def test_versions_are_immutable(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(spark.range(10))
    before = t.read(spark, version=0).collect()
    t.commit(spark.range(3))
    assert t.read(spark, version=0).collect() == before


def test_read_empty_table_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "none"))
    with pytest.raises(FileNotFoundError):
        t.read(spark)


def test_expire_keeps_window_and_current(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path / "versioned"))
    for i in range(4):
        t.commit(spark.range(i + 1).toDF("id"), note=f"c{i}")
    t.rollback(0)  # current is now the OLDEST version
    expired = t.expire(keep_last=2)
    hist = {h["version"] for h in t.history()}
    assert 0 in hist  # current survives despite being outside the window
    assert {2, 3} <= hist  # newest two kept
    assert set(expired) == {1}
    # expired data is gone, survivors still read
    assert t.read(spark, version=0).count() == 1
    assert t.read(spark).count() == 1  # current = v0 after rollback
    import pytest

    with pytest.raises(ValueError):
        t.read(spark, version=1)


def test_commit_skips_colliding_version_dirs(spark, tmp_path):
    import os

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path / "occ"))
    t.commit(spark.range(1).toDF("id"))
    # simulate a concurrent writer that grabbed v=1 but hasn't published
    os.makedirs(str(tmp_path / "occ" / "v=1"))
    v = t.commit(spark.range(2).toDF("id"))
    assert v == 2  # collision detected, next version allocated
    assert t.read(spark).count() == 2
    assert [h["version"] for h in t.history()] == [0, 2]


def test_expire_keep_last_zero_keeps_only_current(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(str(tmp_path / "k0"))
    for i in range(3):
        t.commit(spark.range(i + 1).toDF("id"))
    expired = t.expire(keep_last=0)
    assert set(expired) == {0, 1}
    assert [h["version"] for h in t.history()] == [2]

    import pytest

    with pytest.raises(ValueError, match="local path"):
        SnapshotTable("s3a://bucket/tbl")


def test_snapshot_diff_insert_update_delete(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "sd"))
    v1 = t.commit(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
        )
    )
    v2 = t.commit(
        spark.createDataFrame(
            [(1, "a"), (2, "B2"), (4, "d")], "id int, v string"
        )
    )
    out = {
        (r.id, r._change): r.v
        for r in snapshot_diff(spark, t, v1, v2, ["id"]).collect()
    }
    assert out == {
        (2, "update"): "B2",   # new content
        (3, "delete"): "c",    # old content
        (4, "insert"): "d",
    }


def test_snapshot_diff_null_key_and_schema_drift(spark, tmp_path):
    import pytest

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "sd2"))
    v1 = t.commit(
        spark.createDataFrame([(None, "x"), (1, "y")], "id int, v string")
    )
    v2 = t.commit(
        spark.createDataFrame([(None, "x2"), (1, "y")], "id int, v string")
    )
    out = {
        (r.id, r._change): r.v
        for r in snapshot_diff(spark, t, v1, v2, ["id"]).collect()
    }
    # Null keys match null-safely: one update, never insert+delete.
    assert out == {(None, "update"): "x2"}

    t2 = SnapshotTable(str(tmp_path / "sd3"))
    w1 = t2.commit(spark.createDataFrame([(1, "a")], "id int, v string"))
    w2 = t2.commit(spark.createDataFrame([(1,)], "id int"))
    with pytest.raises(ValueError, match="schema drift"):
        snapshot_diff(spark, t2, w1, w2, ["id"])


def test_optimize_is_a_versioned_commit(spark, tmp_path):
    """OPTIMIZE rewrites layout as a NEW version: fewer files, same
    rows, history intact (time travel reaches the fragmented layout,
    rollback undoes the rewrite, expire reclaims it)."""
    from vexere_lakehouse_pipeline_spark.operators import layout

    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(2000).selectExpr("id", "id * 2 AS v")
    v0 = t.commit(df.repartition(16), note="fragmented ingest")
    new_v, stats = t.optimize(spark, target_mb=64)
    assert new_v == v0 + 1
    assert stats["files_before"] == 16 and stats["files_after"] == 1
    cur = t.read(spark)
    assert cur.count() == 2000
    assert sorted(tuple(r) for r in cur.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # history keeps the fragmented version readable (time travel)
    old_files = layout.fs_file_stats(
        spark, str(tmp_path / "t" / f"v={v0}"))[0]
    assert old_files == 16
    assert t.read(spark, version=v0).count() == 2000
    notes = [h["note"] for h in t.history()]
    assert notes == ["fragmented ingest", "optimize target_mb=64"]
    # rollback undoes the rewrite, metadata-only
    t.rollback(v0)
    assert [h for h in t.history() if h["is_current"]][0]["version"] == v0


def test_optimize_order_by_reclusters(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators import layout

    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(5000).selectExpr("id", "CAST(id % 97 AS LONG) AS k")
    t.commit(df.repartition(8), note="ingest")
    total = layout.fs_file_stats(
        spark, str(tmp_path / "t" / "v=0"))[1]
    new_v, stats = t.optimize(
        spark, target_mb=total / 4 / (1 << 20), order_by=["k"])
    assert stats["files_after"] > 1
    fstats = layout.file_minmax_stats(
        spark, str(tmp_path / "t" / f"v={new_v}"), ["k"])
    spans = sorted((s["lo_k"], s["hi_k"]) for s in fstats)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    assert t.read(spark).count() == 5000


def test_incremental_gold_refresh_matches_full_recompute(spark, tmp_path):
    """IVM-lite (operators/snapshots.py: incremental_gold_refresh):
    after a mutation batch — insert, delete, in-group update, and a
    group-MOVING update — refreshing only the touched groups equals
    the full recompute row-for-row, deleted-out groups disappear, and
    untouched gold rows are the kept originals."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        incremental_gold_refresh,
    )

    def agg(df):
        return df.groupBy("g").agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
            F.concat_ws(",", F.sort_array(F.collect_set("tag"))).alias(
                "tags"
            ),
        )

    rows_v0 = [
        # g=1: will lose a row to a group-move; g=2 gains it
        (1, 1, 10.0, "a"), (2, 1, 20.0, "b"),
        (3, 2, 30.0, "c"),
        (4, 3, 40.0, "d"),          # untouched group
        (5, 4, 50.0, "e"),          # this whole group gets deleted
        (6, 5, 60.0, "f"),          # value update in place
    ]
    rows_v1 = [
        (1, 1, 10.0, "a"),
        (2, 2, 20.0, "b"),          # moved g: 1 -> 2
        (3, 2, 30.0, "c"),
        (4, 3, 40.0, "d"),
        (6, 5, 99.0, "f"),          # updated value
        (7, 6, 70.0, "gg"),         # inserted new group
    ]
    schema = "pk long, g long, v double, tag string"
    t = SnapshotTable(str(tmp_path / "fact"))
    t.commit(spark.createDataFrame(rows_v0, schema), note="v0")
    t.commit(spark.createDataFrame(rows_v1, schema), note="v1")
    gold0 = agg(t.read(spark, version=0))
    got = incremental_gold_refresh(
        spark, t, 0, 1, ["pk"], [("g", F.col("g"))], agg, gold0
    )
    want = agg(t.read(spark, version=1))
    as_rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert as_rows(got) == as_rows(want)
    gs = {r.g for r in got.collect()}
    assert 4 not in gs            # deleted-out group disappeared
    assert {1, 2, 3, 5, 6} <= gs  # moved-from, moved-to, kept, new


def test_incremental_gold_refresh_derived_key_and_no_churn(spark, tmp_path):
    """Derived (non-identity) group keys work, and a zero-churn diff
    keeps the gold table bit-identical without recomputing anything."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        incremental_gold_refresh,
    )

    def agg(df):
        return df.groupBy((F.col("k") % 3).alias("bucket")).agg(
            F.count("*").alias("n")
        )

    t = SnapshotTable(str(tmp_path / "fact"))
    df = spark.range(30).selectExpr("id AS pk", "id AS k")
    t.commit(df, note="v0")
    t.commit(df, note="v1: identical")
    gold0 = agg(t.read(spark, version=0))
    got = incremental_gold_refresh(
        spark, t, 0, 1, ["pk"], [("bucket", F.col("k") % 3)], agg, gold0
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in gold0.collect()
    )
