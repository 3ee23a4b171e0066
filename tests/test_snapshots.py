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


def test_incremental_gold_refresh_null_group_key(spark, tmp_path):
    """NULL is a legal GROUP BY group (ADVICE r9): a mutation touching
    the NULL-key group must recompute it, a NULL-moving update must
    refresh both sides, and a deleted-out NULL group must disappear —
    all of which require the touched/kept joins to be null-safe
    (name-list equi-joins would silently keep the stale NULL row)."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        incremental_gold_refresh,
    )

    def agg(df):
        return df.groupBy("g").agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
        )

    rows_v0 = [
        (1, None, 10.0),   # NULL group: value update in place
        (2, None, 20.0),   # NULL group: moves to g=1
        (3, 1, 30.0),
        (4, 2, 40.0),      # untouched group
        (5, 9, 50.0),      # moves INTO the NULL group
    ]
    rows_v1 = [
        (1, None, 99.0),
        (2, 1, 20.0),
        (3, 1, 30.0),
        (4, 2, 40.0),
        (5, None, 50.0),
    ]
    schema = "pk long, g long, v double"
    t = SnapshotTable(str(tmp_path / "fact"))
    t.commit(spark.createDataFrame(rows_v0, schema), note="v0")
    t.commit(spark.createDataFrame(rows_v1, schema), note="v1")
    gold0 = agg(t.read(spark, version=0))
    got = incremental_gold_refresh(
        spark, t, 0, 1, ["pk"], [("g", F.col("g"))], agg, gold0
    )
    want = agg(t.read(spark, version=1))
    as_rows = lambda df: sorted(  # noqa: E731
        (tuple(r) for r in df.collect()), key=repr
    )
    assert as_rows(got) == as_rows(want)
    # and a NULL group deleted out entirely disappears
    t2 = SnapshotTable(str(tmp_path / "fact2"))
    t2.commit(spark.createDataFrame(
        [(1, None, 1.0), (2, 5, 2.0)], schema), note="v0")
    t2.commit(spark.createDataFrame([(2, 5, 2.0)], schema), note="v1")
    gold0b = agg(t2.read(spark, version=0))
    got2 = incremental_gold_refresh(
        spark, t2, 0, 1, ["pk"], [("g", F.col("g"))], agg, gold0b
    )
    assert as_rows(got2) == as_rows(agg(t2.read(spark, version=1)))
    assert all(r.g is not None for r in got2.collect())


def test_partitioned_commit_schema_and_fingerprints(spark, tmp_path):
    """part_by commits Hive-partition the version, record per-partition
    content fingerprints in the manifest, and read back TYPE-EXACT
    (the manifest schema defeats partition-column type inference that
    would narrow bigint dirs to int)."""
    from pyspark.sql import functions as F  # noqa: F401

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        changed_partitions,
    )

    t = SnapshotTable(str(tmp_path / "pt"))
    df = spark.range(40).selectExpr(
        "id AS pk", "CAST(id % 4 AS LONG) AS g", "CAST(id AS DOUBLE) AS v"
    )
    t.commit(df, part_by=["g"], note="v0")
    back = t.read(spark)
    assert dict(back.dtypes) == dict(df.dtypes)  # no int narrowing
    assert back.count() == 40
    ent = t.history()[0]
    assert ent["part_by"] == ["g"]
    assert sorted(e["k"][0] for e in ent["parts"]) == ["0", "1", "2", "3"]
    assert all(e["n"] == 10 for e in ent["parts"])
    # identical recommit -> zero changed partitions, no diff rows
    t.commit(df, part_by=["g"], note="v1 identical")
    pby, keys = changed_partitions(t, 0, 1)
    assert (pby, keys) == (["g"], [])
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        snapshot_diff,
    )

    assert snapshot_diff(spark, t, 0, 1, ["pk"]).count() == 0


def test_snapshot_diff_partition_pruned_scans(spark, tmp_path):
    """The journalless diff over a part_by table reads ONLY changed
    partitions (r9 verdict #1).  Proof is behavioral: every parquet
    file of an UNTOUCHED partition is corrupted on disk in both
    versions — the pruned diff still answers correctly (it never opens
    them), while stripping the manifest's partition metadata makes the
    same diff fail on the garbage bytes.  Also pins the plan: the
    partition predicate lands in PartitionFilters, with no data
    filter."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        changed_partitions,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "pd"))
    df0 = spark.range(100).selectExpr(
        "id AS pk", "CAST(id % 10 AS LONG) AS g", "CAST(id AS DOUBLE) AS v"
    )
    t.commit(df0, part_by=["g"], note="v0")
    df1 = (
        df0.withColumn(
            "v",
            F.when(F.col("g") == 3, F.col("v") + 1).otherwise(F.col("v")),
        )
        .filter(~((F.col("g") == 7) & (F.col("pk") == 7)))
    )
    t.commit(df1, part_by=["g"], note="v1")
    pby, keys = changed_partitions(t, 0, 1)
    assert pby == ["g"] and sorted(k[0] for k in keys) == ["3", "7"]

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        _restrict_to_partitions,
    )

    side = _restrict_to_partitions(t.read(spark, version=0), pby, keys)
    splan = side._jdf.queryExecution().executedPlan().toString()
    # toString truncates the field label, but the predicate text can
    # only live in PartitionFilters here: DataFilters and
    # PushedFilters are both printed empty
    assert "DataFilters: []" in splan and "PushedFilters: []" in splan
    assert "md5(cast(concat(v, cast(g#" in splan
    d = snapshot_diff(spark, t, 0, 1, ["pk"])
    got = sorted((r.pk, r._change) for r in d.collect())
    assert got == sorted(
        [(pk, "update") for pk in range(3, 100, 10)] + [(7, "delete")]
    )

    # corrupt every file of untouched partition g=5, both versions
    for v in (0, 1):
        for f in glob.glob(str(tmp_path / "pd" / f"v={v}" / "g=5" / "*")):
            with open(f, "wb") as fh:
                fh.write(b"not parquet")
    got2 = sorted(
        (r.pk, r._change)
        for r in snapshot_diff(spark, t, 0, 1, ["pk"]).collect()
    )
    assert got2 == got  # pruned: never touches g=5

    mp = str(tmp_path / "pd" / "_MANIFEST.json")
    m = json.load(open(mp))
    for v in m["versions"]:
        v.pop("parts", None)
        v.pop("part_by", None)
    json.dump(m, open(mp, "w"))
    with pytest.raises(Exception):
        snapshot_diff(spark, t, 0, 1, ["pk"]).collect()  # unpruned scans g=5
    assert os.path.isdir(str(tmp_path / "pd" / "v=0" / "g=5"))


def test_partitioned_commit_null_partition_and_ivm(spark, tmp_path):
    """NULL partition values round-trip through the fingerprint
    protocol (Hive default partition), and incremental_gold_refresh
    composes with the pruned diff end-to-end."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        changed_partitions,
        incremental_gold_refresh,
    )

    def agg(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
        )

    schema = "pk long, g long, v double"
    rows_v0 = [(1, None, 1.0), (2, 2, 2.0), (3, 3, 3.0)]
    rows_v1 = [(1, None, 9.0), (2, 2, 2.0), (3, 3, 3.0)]
    t = SnapshotTable(str(tmp_path / "np"))
    t.commit(spark.createDataFrame(rows_v0, schema), part_by=["g"])
    t.commit(spark.createDataFrame(rows_v1, schema), part_by=["g"])
    pby, keys = changed_partitions(t, 0, 1)
    assert keys == [[None]]  # only the NULL partition churned
    gold0 = agg(t.read(spark, version=0))
    got = incremental_gold_refresh(
        spark, t, 0, 1, ["pk"], [("g", F.col("g"))], agg, gold0
    )
    want = agg(t.read(spark, version=1))
    key = repr
    assert sorted((tuple(r) for r in got.collect()), key=key) == sorted(
        (tuple(r) for r in want.collect()), key=key
    )


def test_incremental_gold_refresh_side_input_churn(spark, tmp_path):
    """Multi-input IVM (r9 verdict #3): the fact is unchanged, a
    JOINED side table churns (value update + key-moving update +
    delete).  touched_keys maps the side churn to keys from BOTH
    versions; semi-joining the fact gives extra_touched groups; the
    refresh with agg_fn closed over the NEW side equals the full
    recompute — and OMITTING extra_touched provably leaves stale
    rows (non-vacuity)."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        incremental_gold_refresh,
        touched_keys,
    )

    fact_rows = [  # (pk, g, supp, v)
        (1, 1, 10, 1.0), (2, 1, 11, 2.0),
        (3, 2, 12, 3.0), (4, 3, 13, 4.0), (5, 4, 99, 5.0),
    ]
    side_v0 = [  # (sid, user, score)
        (1, 10, 5.0), (2, 11, 1.0), (3, 12, 2.0),
        (4, 13, 9.0),  # deleted in v1
        (5, 12, 4.0),  # moves to user 10 in v1
    ]
    side_v1 = [
        (1, 10, 5.0), (2, 11, 7.0), (3, 12, 2.0), (5, 10, 4.0),
    ]
    fact = spark.createDataFrame(fact_rows, "pk long, g long, supp long, v double")
    sv0 = spark.createDataFrame(side_v0, "sid long, user long, score double")
    sv1 = spark.createDataFrame(side_v1, "sid long, user long, score double")

    def agg(fact_df, side_df):
        per_user = side_df.groupBy("user").agg(
            F.sum("score").alias("uscore")
        )
        return (
            fact_df.join(per_user, fact_df.supp == per_user.user, "left")
            .groupBy("g")
            .agg(
                F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
                F.sum(F.coalesce("uscore", F.lit(0.0))).alias("s"),
            )
        )

    ft = SnapshotTable(str(tmp_path / "fact"))
    ft.commit(fact)
    st = SnapshotTable(str(tmp_path / "side"))
    st.commit(sv0)
    st.commit(sv1)
    gold0 = agg(ft.read(spark), st.read(spark, version=0))
    changed_users = touched_keys(
        spark, st, 0, 1, ["sid"], [("user", F.col("user"))]
    )
    # users 11 (update), 13 (delete), 12 -> 10 (move: BOTH change)
    assert sorted(r.user for r in changed_users.collect()) == [
        10, 11, 12, 13,
    ]
    extra = (
        ft.read(spark)
        .join(F.broadcast(changed_users),
              F.col("supp").eqNullSafe(F.col("user")), "left_semi")
        .select(F.col("g"))
        .distinct()
    )
    kw = dict(
        changed_pks=fact.select("pk").limit(0),
    )
    got = incremental_gold_refresh(
        spark, ft, 0, 0, ["pk"], [("g", F.col("g"))],
        lambda f: agg(f, st.read(spark, version=1)), gold0,
        extra_touched=extra, **kw,
    )
    want = agg(ft.read(spark), st.read(spark, version=1))
    rows = lambda df: sorted(  # noqa: E731
        (tuple(r) for r in df.collect()), key=repr
    )
    assert rows(got) == rows(want)
    # group 4 (supp 99, never scored) must be the kept-verbatim row
    assert [r for r in got.collect() if r.g == 4] == [
        r for r in gold0.collect() if r.g == 4
    ]
    stale = incremental_gold_refresh(
        spark, ft, 0, 0, ["pk"], [("g", F.col("g"))],
        lambda f: agg(f, st.read(spark, version=1)), gold0, **kw,
    )
    assert rows(stale) != rows(want)  # without extra_touched: stale


def test_snapshot_diff_rows_both_sides(spark, tmp_path):
    """snapshot_diff_rows emits BOTH versions' rows per changed key:
    updates give an old and a new row, inserts only new, deletes only
    old — the old side is what lets the IVM derive the group a moved
    row LEFT without re-scanning the fact."""
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        snapshot_diff_rows,
    )

    t = SnapshotTable(str(tmp_path / "sdr"))
    t.commit(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"))
    t.commit(spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "id int, v string"))
    out = sorted(
        (r.id, r._change, r._side, r.v)
        for r in snapshot_diff_rows(spark, t, 0, 1, ["id"]).collect()
    )
    assert out == [
        (2, "update", "new", "B2"),
        (2, "update", "old", "b"),
        (3, "delete", "old", "c"),
        (4, "insert", "new", "d"),
    ]


def test_scope_parts_requires_fingerprints(spark, tmp_path):
    """scope_parts=True on a table without part_by metadata must fail
    loudly, never silently fall back to a full scan."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        incremental_gold_refresh,
    )

    t = SnapshotTable(str(tmp_path / "sp"))
    df = spark.range(10).selectExpr("id AS pk", "id % 2 AS g", "id AS v")
    t.commit(df)
    t.commit(df)

    def agg(d):
        return d.groupBy("g").agg(F.count(F.lit(1)).alias("n"))

    with pytest.raises(ValueError, match="scope_parts"):
        incremental_gold_refresh(
            spark, t, 0, 1, ["pk"], [("g", F.col("g"))], agg,
            agg(t.read(spark, version=0)), scope_parts=True,
        ).collect()


def test_touched_keys_changed_pks_path(spark, tmp_path):
    """touched_keys with an explicit changed_pks set skips the diff
    and still draws keys from BOTH versions (key-move safe)."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        touched_keys,
    )

    t = SnapshotTable(str(tmp_path / "tk"))
    t.commit(spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "pk int, owner int"))
    t.commit(spark.createDataFrame(
        [(1, 11), (2, 20), (3, 30)], "pk int, owner int"))
    pks = spark.createDataFrame([(1,)], "pk int")
    got = sorted(
        r.owner for r in touched_keys(
            spark, t, 0, 1, ["pk"], [("owner", F.col("owner"))],
            changed_pks=pks,
        ).collect()
    )
    assert got == [10, 11]  # both the old and the new owner
