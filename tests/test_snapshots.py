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
