"""SCD2 operator tests (operators/scd2.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators.scd2 import (
    scd2_from_changelog,
    scd2_merge,
)


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _rows(df):
    return sorted(
        (
            r["k"],
            r["seg"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in df.collect()
    )


def test_scd2_from_changelog_collapses_noops(spark):
    changes = spark.createDataFrame(
        [
            (1, _ts(1), "A", 10),
            (1, _ts(2), "A", 11),  # no-op on tracked attr -> no version
            (1, _ts(3), "B", 12),
            (2, _ts(1), "X", 13),
        ],
        "k long, ts timestamp, seg string, change_id long",
    )
    hist = scd2_from_changelog(
        changes, key_cols=["k"], ts_col="ts", attr_cols=["seg"],
        tiebreak_col="change_id",
    )
    assert _rows(hist) == [
        (1, "A", _ts(1), _ts(3), False),
        (1, "B", _ts(3), None, True),
        (2, "X", _ts(1), None, True),
    ]


def test_scd2_merge_closes_opens_and_passes_through(spark):
    dim = scd2_from_changelog(
        spark.createDataFrame(
            [(1, _ts(1), "A"), (2, _ts(1), "X")],
            "k long, ts timestamp, seg string",
        ),
        key_cols=["k"], ts_col="ts", attr_cols=["seg"],
    )
    updates = spark.createDataFrame(
        [
            (1, _ts(5), "B"),   # changed -> close + open
            (2, _ts(5), "X"),   # unchanged -> no-op
            (3, _ts(5), "New"),  # new key -> open
        ],
        "k long, ts timestamp, seg string",
    )
    merged = scd2_merge(
        dim, updates, key_cols=["k"], ts_col="ts", attr_cols=["seg"]
    )
    assert _rows(merged) == [
        (1, "A", _ts(1), _ts(5), False),
        (1, "B", _ts(5), None, True),
        (2, "X", _ts(1), None, True),
        (3, "New", _ts(5), None, True),
    ]
    # idempotent: same batch again changes nothing
    again = scd2_merge(
        merged, updates, key_cols=["k"], ts_col="ts", attr_cols=["seg"]
    )
    assert _rows(again) == _rows(merged)


def test_scd2_merge_then_changelog_equivalence(spark):
    """Merging batches one at a time equals rebuilding from the full
    changelog (when each batch has one row per key)."""
    full = spark.createDataFrame(
        [(1, _ts(1), "A"), (1, _ts(4), "B"), (1, _ts(8), "C")],
        "k long, ts timestamp, seg string",
    )
    rebuilt = scd2_from_changelog(
        full, key_cols=["k"], ts_col="ts", attr_cols=["seg"]
    )
    step = scd2_from_changelog(
        full.filter(F.col("ts") == _ts(1)),
        key_cols=["k"], ts_col="ts", attr_cols=["seg"],
    )
    for day in (4, 8):
        step = scd2_merge(
            step,
            full.filter(F.col("ts") == _ts(day)),
            key_cols=["k"], ts_col="ts", attr_cols=["seg"],
        )
    assert _rows(step) == _rows(rebuilt)


def test_scd2_merge_null_key_replay_is_idempotent(spark):
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_merge

    dim = spark.createDataFrame(
        [(None, "a", "2024-01-01", None, True)],
        "k string, attr string, valid_from string, valid_to string, is_current boolean",
    )
    batch = spark.createDataFrame(
        [(None, "2024-02-01", "a")], "k string, ts string, attr string"
    )
    once = scd2_merge(dim, batch, ["k"], "ts", ["attr"])
    twice = scd2_merge(once, batch, ["k"], "ts", ["attr"])
    assert once.count() == 1  # unchanged attrs -> no new version
    assert twice.count() == 1  # replay is a no-op, no duplicate current


def test_scd2_merge_closes_row_with_null_valid_from(spark):
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_merge

    dim = spark.createDataFrame(
        [("k1", "a", None, None, True)],
        "k string, attr string, valid_from string, valid_to string, is_current boolean",
    )
    batch = spark.createDataFrame(
        [("k1", "2024-02-01", "b")], "k string, ts string, attr string"
    )
    out = scd2_merge(dim, batch, ["k"], "ts", ["attr"]).collect()
    # old version closed (not silently dropped), new one opened
    assert len(out) == 2
    states = {(r.attr, r.is_current) for r in out}
    assert states == {("a", False), ("b", True)}


def test_scd2_merge_null_ts_update_not_dropped(spark):
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_merge

    dim = spark.createDataFrame(
        [("k1", "a", "2024-01-01", None, True)],
        "k string, attr string, valid_from string, valid_to string, is_current boolean",
    )
    # brand-new key arriving with a NULL timestamp must still open a row
    batch = spark.createDataFrame(
        [("k2", None, "b")], "k string, ts string, attr string"
    )
    out = scd2_merge(dim, batch, ["k"], "ts", ["attr"]).collect()
    keys = {r.k for r in out}
    assert keys == {"k1", "k2"}  # nothing vanished


def test_scd2_merge_ignores_out_of_order_update(spark):
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_merge

    dim = spark.createDataFrame(
        [("k1", "new", "2026-05-01", None, True)],
        "k string, attr string, valid_from string, valid_to string, is_current boolean",
    )
    stale = spark.createDataFrame(
        [("k1", "2026-04-01", "old")], "k string, ts string, attr string"
    )
    out = scd2_merge(dim, stale, ["k"], "ts", ["attr"]).collect()
    # stale update is a no-op: one row, still current, interval intact
    assert len(out) == 1
    r = out[0]
    assert r.attr == "new" and r.is_current and r.valid_to is None


def test_point_in_time_join_interval_semantics(spark):
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.joins import asof_join
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_from_changelog

    # changelog: user 1 is A at t=10, B at t=20; user 2 never appears
    changes = spark.createDataFrame(
        [(1, 1, 10, "A"), (1, 2, 20, "B")],
        "user_id long, event_id long, ts long, state string",
    )
    hist = scd2_from_changelog(
        changes, ["user_id"], "ts", ["state"],
        tiebreak_col="event_id", keep_tiebreak=True,
    )
    dim = hist.select(
        "user_id", "valid_from", "event_id",
        F.col("state").alias("state_type"),
    )
    # facts: before first version (t=5) -> null; inside v1 (t=15) -> A;
    # exactly at v2 open (t=20) -> B; after (t=99) -> B; unknown user -> null
    facts = spark.createDataFrame(
        [(1, 101, 5), (1, 102, 15), (1, 103, 20), (1, 104, 99), (2, 105, 50)],
        "user_id long, event_id long, ts long",
    )
    out = {
        r["event_id"]: r["state_type"]
        for r in asof_join(
            facts, dim, on="user_id", left_ts="ts", right_ts="valid_from",
            right_payload=["state_type"], tiebreak="event_id",
        ).collect()
    }
    assert out == {101: None, 102: "A", 103: "B", 104: "B", 105: None}


def test_point_in_time_join_tiebreak_on_equal_valid_from(spark):
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.joins import asof_join
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_from_changelog

    # two versions open at the SAME ts (tiebreak by event_id): the
    # higher event_id wins, matching interval semantics where the
    # earlier version's interval [t, t) is empty
    changes = spark.createDataFrame(
        [(1, 1, 10, "A"), (1, 2, 10, "B")],
        "user_id long, event_id long, ts long, state string",
    )
    hist = scd2_from_changelog(
        changes, ["user_id"], "ts", ["state"],
        tiebreak_col="event_id", keep_tiebreak=True,
    )
    dim = hist.select(
        "user_id", "valid_from", "event_id",
        F.col("state").alias("state_type"),
    )
    facts = spark.createDataFrame(
        [(1, 101, 10), (1, 102, 50)], "user_id long, event_id long, ts long"
    )
    out = {
        r["event_id"]: r["state_type"]
        for r in asof_join(
            facts, dim, on="user_id", left_ts="ts", right_ts="valid_from",
            right_payload=["state_type"], tiebreak="event_id",
        ).collect()
    }
    assert out == {101: "B", 102: "B"}


def test_scd2_merge_rejects_duplicate_batch_keys(spark):
    import pytest

    from vexere_lakehouse_pipeline_spark.operators.scd2 import (
        scd2_from_changelog,
        scd2_merge,
    )

    changes = spark.createDataFrame(
        [(1, 1, 10, "A")], "user_id long, event_id long, ts long, state string"
    )
    dim = scd2_from_changelog(changes, ["user_id"], "ts", ["state"])
    dup_batch = spark.createDataFrame(
        [(1, 20, "B"), (1, 30, "C")], "user_id long, ts long, state string"
    )
    with pytest.raises(ValueError, match="duplicate key"):
        scd2_merge(dim, dup_batch, ["user_id"], "ts", ["state"])
