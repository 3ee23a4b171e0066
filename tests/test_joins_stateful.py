"""Edge-case tests for the temporal joins (operators/joins.py) and the
stateful streaming operators (streaming/stateful.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators.joins import asof_join, range_join
from vexere_lakehouse_pipeline_spark.streaming import ingest, stateful


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_join_basic_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(5)), (3, 200, _ts(10)), (4, 300, _ts(10))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        # key 100: rows at :05 (two, tie on ts -> larger rid wins) and :08
        # key 200: only a later row (:15) -> no match at :10
        [(11, 100, _ts(5)), (12, 100, _ts(5)), (13, 100, _ts(8)), (21, 200, _ts(15))],
        "rid long, k long, rts timestamp",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_payload=["rid"], tiebreak="rid",
    )
    got = {r["id"]: r["rid"] for r in out.collect()}
    assert got[1] == 13          # latest at-or-before :10
    assert got[2] == 12          # tie at :05 -> max tiebreak
    assert got[3] is None        # right row is later than left ts
    assert got[4] is None        # key absent from right
    assert out.count() == left.count()  # left-join semantics: no row loss


def test_asof_join_equal_ts_inclusive(spark):
    left = spark.createDataFrame([(1, 1, _ts(5))], "id long, k long, ts timestamp")
    right = spark.createDataFrame([(9, 1, _ts(5))], "rid long, k long, rts timestamp")
    out = asof_join(left, right, "k", "ts", "rts", ["rid"], tiebreak="rid")
    assert out.first()["rid"] == 9  # at-or-before includes equal ts


def test_range_join_bounds_and_buckets(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(0)), (2, 7, _ts(30))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 7, _ts(0)),   # equal to left ts -> excluded (strict lower)
            (11, 7, _ts(10)),  # inside (0, 20]
            (12, 7, _ts(20)),  # on the upper bound -> included
            (13, 7, _ts(35)),  # inside left-2's window (30, 50]
            (14, 8, _ts(10)),  # other key
        ],
        "rid long, k long, rts timestamp",
    )
    out = range_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        lower=F.expr("INTERVAL 0 SECONDS"), upper=F.expr("INTERVAL 20 MINUTES"),
        bucket_seconds=600,  # bucket smaller than span: multi-bucket explode
    )
    pairs = sorted((r["lid"], r["rid"]) for r in out.collect())
    assert pairs == [(1, 11), (1, 12), (2, 13)]
    # no duplicate pairs despite bucket overlap
    assert out.count() == out.select("lid", "rid").distinct().count()


def test_running_user_totals_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp, value double"
    batch_a = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(1), 5.0), (2, _ts(0), 1.0)], schema
    )
    batch_a.write.mode("append").parquet(src)
    stream = spark.readStream.schema(batch_a.schema).parquet(src)
    ingest.run_stream_to_sink(
        stateful.running_user_totals(stream), out, ckpt
    )
    # second run: new file arrives; checkpointed state must carry over
    spark.createDataFrame([(1, _ts(2), 2.5)], schema).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(batch_a.schema).parquet(src)
    ingest.run_stream_to_sink(
        stateful.running_user_totals(stream2), out, ckpt
    )
    latest = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("total_value").alias("v"))
        .collect()
    )
    got = {r["user_id"]: (r["n"], r["v"]) for r in latest}
    assert got[1] == (3, 17.5)  # 2 events from run 1 + 1 from run 2
    assert got[2] == (1, 1.0)


def test_sessionized_event_counts_batch_matches_manual(spark):
    rows = [
        (1, _ts(0), 1.0), (1, _ts(10), 2.0),   # one session (gap < 30m)
        (1, dt.datetime(2024, 1, 1, 2, 0), 4.0),  # new session after 2h
        (2, _ts(0), 8.0),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    sess = stateful.sessionized_event_counts(events, gap="30 minutes")
    got = sorted(
        (r["user_id"], r["n_events"], r["total_value"]) for r in sess.collect()
    )
    assert got == [(1, 1, 4.0), (1, 2, 3.0), (2, 1, 8.0)]


def test_sessionized_event_counts_streaming(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    from vexere_lakehouse_pipeline_spark.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    events.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    ingest.run_stream_to_sink(
        stateful.sessionized_event_counts(stream), out, ckpt
    )
    streamed = spark.read.parquet(out)
    batch = stateful.sessionized_event_counts(spark.read.parquet(src))
    closed = streamed.count()
    assert closed > 0
    joined = streamed.join(
        batch, on=["session_start", "session_end", "user_id"], how="inner"
    )
    assert joined.count() == closed


def test_stream_dedup_drops_replayed_ids(spark, tmp_path):
    src = str(tmp_path / "dup_src")
    out = str(tmp_path / "dup_out")
    ckpt = str(tmp_path / "dup_ckpt")
    schema = "event_id long, ts timestamp, value double"
    rows = [(i, _ts(i % 30), float(i)) for i in range(50)]
    dup_rows = rows + rows[:20]  # 20 replayed ids in the same batch
    spark.createDataFrame(dup_rows, schema).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    deduped = ingest.stream_dedup(stream, ["event_id"])
    ingest.run_stream_merge_sink(
        deduped, out, ckpt, merge_keys=["event_id"]
    )
    got = spark.read.parquet(out)
    assert got.count() == 50
    assert got.select("event_id").distinct().count() == 50


def test_stream_merge_sink_idempotent_across_runs(spark, tmp_path):
    src = str(tmp_path / "m_src")
    out = str(tmp_path / "m_out")
    schema = "event_id long, ts timestamp, value double"
    spark.createDataFrame(
        [(1, _ts(0), 1.0), (2, _ts(1), 2.0)], schema
    ).write.mode("append").parquet(src)
    read = lambda: spark.readStream.schema(  # noqa: E731
        spark.read.parquet(src).schema
    ).parquet(src)
    # two runs with SEPARATE checkpoints: the second reprocesses
    # everything, but the merge sink keeps the target exactly-once
    ingest.run_stream_merge_sink(
        read(), out, str(tmp_path / "ck1"), merge_keys=["event_id"]
    )
    ingest.run_stream_merge_sink(
        read(), out, str(tmp_path / "ck2"), merge_keys=["event_id"]
    )
    assert spark.read.parquet(out).count() == 2


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        stream_stream_attribution_join,
    )

    from vexere_lakehouse_pipeline_spark.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    events.filter(F.col("event_type") == "click").write.parquet(csrc)
    events.filter(F.col("event_type") == "purchase").write.parquet(psrc)

    schema = events.schema
    out = stream_stream_attribution_join(
        spark.readStream.schema(schema).parquet(csrc),
        spark.readStream.schema(schema).parquet(psrc),
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(sink)
    # batch twin: same interval condition, plain join
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 hour")),
    )
    want = {(r.click_id, r.purchase_id) for r in batch.collect()}
    got = {(r.click_id, r.purchase_id) for r in streamed.collect()}
    # availableNow + watermark may hold back pairs newer than the final
    # watermark; everything EMITTED must be correct and cover the
    # watermark-closed prefix.
    assert got <= want
    assert len(got) >= 0.5 * len(want)
    assert len(want) > 0


def test_running_totals_tws_matches_legacy_api(spark, tmp_path):
    """transformWithStateInPandas and applyInPandasWithState compute the
    same final per-user totals over the same input stream."""
    from vexere_lakehouse_pipeline_spark.streaming.stateful import (
        HAS_TWS,
        running_user_totals_tws,
    )

    if not HAS_TWS:
        pytest.skip("pyspark < 4 or protobuf unavailable")
    from vexere_lakehouse_pipeline_spark.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "value"
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    # transformWithState requires the RocksDB state store
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    outs = {}
    for name, op in (("tws", running_user_totals_tws),
                     ("legacy", stateful.running_user_totals)):
        stream = spark.readStream.schema(events.schema).parquet(src)
        sink = str(tmp_path / f"out_{name}")
        q = (
            op(stream).writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # final snapshot per user = row with max n_events
        final = (
            spark.read.parquet(sink)
            .groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
            .select("user_id", "s.n_events", "s.total_value")
        )
        outs[name] = {
            (r.user_id, r.n_events, round(r.total_value, 6))
            for r in final.collect()
        }
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert outs["tws"] == outs["legacy"] and len(outs["tws"]) > 0


def test_cogrouped_asof_matches_window_asof(spark):
    """pd.merge_asof per cogroup == the union+window as-of join."""
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators.joins import (
        asof_join_cogrouped,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    a = asof_join(errors, clicks, "user_id", "ts", "cts", ["click_id"],
                  tiebreak="click_id")
    b = asof_join_cogrouped(errors, clicks, "user_id", "ts", "cts",
                            ["click_id"])
    got_a = {(r.user_id, r.event_id, r.click_id) for r in a.collect()}
    got_b = {(r.user_id, r.event_id, r.click_id) for r in b.collect()}
    # merge_asof keeps the LAST right row at equal ts like the window's
    # last(); identical data -> identical matches
    assert got_a == got_b and len(got_a) > 0


def test_asof_join_ignores_null_right_timestamps(spark):
    left = spark.createDataFrame([(1, 10, 500)], "k long, ts long, eid long")
    right = spark.createDataFrame(
        [(1, None, 99), (1, 5, 7)], "k long, rts long, rid long"
    )
    out = asof_join(left, right, "k", "ts", "rts", ["rid"]).collect()
    assert out[0]["rid"] == 7  # real match wins
    right_only_null = spark.createDataFrame(
        [(1, None, 99)], "k long, rts long, rid long"
    )
    out2 = asof_join(left, right_only_null, "k", "ts", "rts", ["rid"]).collect()
    assert out2[0]["rid"] is None  # null-ts row can never match


def test_asof_cogrouped_null_timestamps_match_window_path(spark):
    from vexere_lakehouse_pipeline_spark.operators.joins import (
        asof_join,
        asof_join_cogrouped,
    )

    left = spark.createDataFrame(
        [(1, 10), (1, None), (2, 5)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, None, 999), (2, 9, 200)],
        "k long, rts long, payload long",
    )
    w = {
        (r["k"], r["lts"]): r["payload"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_payload=["payload"],
        ).collect()
    }
    c = {
        (r["k"], r["lts"]): r["payload"]
        for r in asof_join_cogrouped(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_payload=["payload"],
        ).collect()
    }
    # null right ts never matches; null left ts keeps null payload;
    # k=2 has no right row at-or-before lts=5
    assert w == c == {(1, 10): 100, (1, None): None, (2, 5): None}


def test_asof_joins_reject_payload_name_collision(spark):
    import pytest

    from vexere_lakehouse_pipeline_spark.operators.joins import (
        asof_join,
        asof_join_cogrouped,
    )

    left = spark.createDataFrame([(1, 10, 999)], "k long, lts long, price long")
    right = spark.createDataFrame([(1, 8, 100)], "k long, rts long, price long")
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, right, "k", "lts", "rts", ["price"])
    with pytest.raises(ValueError, match="collides"):
        asof_join_cogrouped(left, right, "k", "lts", "rts", ["price"])


def test_asof_join_forward_semantics(spark):
    from vexere_lakehouse_pipeline_spark.operators.joins import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "u", 400), (4, "v", 10)],
        "lid long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("u", 100, 11), ("u", 100, 10), ("u", 300, 12), ("v", 5, 13),
         ("u", None, 99)],
        "k string, rts long, rid long",
    )
    out = {r["lid"]: r for r in asof_join_forward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_payload=["rid"], tiebreak="rid",
    ).collect()}
    assert out[1]["rid"] == 10   # equal-ts right matches; min tiebreak wins
    assert out[2]["rid"] == 12   # next at-or-after 250 is ts=300
    assert out[3]["rid"] is None  # nothing at-or-after 400
    assert out[4]["rid"] is None  # v's only right (ts=5) is BEFORE 10


def test_asof_join_forward_null_left_ts_gets_null(spark):
    from vexere_lakehouse_pipeline_spark.operators.joins import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, "u", None), (2, "u", 50)], "lid long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("u", 100, 9)], "k string, rts long, rid long"
    )
    out = {r["lid"]: r["rid"] for r in asof_join_forward(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_payload=["rid"],
    ).collect()}
    assert out[1] is None  # null ts must NOT phantom-match earliest right
    assert out[2] == 9


def test_watermark_discard_twin_matches_real_engine(spark, tmp_path):
    """The batch twin's acceptance rule (ingest.watermark_accepted_flags)
    must reproduce the REAL engine's late-data discard: drive a
    watermarked windowed aggregation one micro-batch at a time (one
    file per run, shared checkpoint, AvailableNow), flush with a far-
    future event to finalize every window, and compare the emitted
    (window, type, count) set against the twin's accepted-row
    aggregation."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    # (event_id, type, ts, value, arrival_hour).  Late rows:
    #  id 10 (arr h1, ts 00:15) within delay          -> accepted
    #  id 20 (arr h2, ts 00:25) wm=00:20, end 01:00   -> accepted
    #  id 30 (arr h3, ts 00:30) wm=01:10, end 01:00   -> DROPPED
    #  id 40 (arr h4, ts 02:50) wm=02:10, end 03:00   -> accepted
    rows = [
        (1, "a", t(10), 1.0, 0), (2, "a", t(20), 1.0, 0),
        (11, "a", t(70), 1.0, 1), (12, "a", t(80), 1.0, 1),
        (10, "a", t(15), 1.0, 1),
        (21, "a", t(130), 1.0, 2), (20, "a", t(25), 1.0, 2),
        (31, "a", t(190), 1.0, 3), (30, "a", t(30), 1.0, 3),
        (41, "a", t(250), 1.0, 4), (40, "a", t(170), 1.0, 4),
        (99, "a", t(600), 1.0, 10),  # flush: finalizes all windows
    ]
    schema = ("event_id long, event_type string, ts timestamp,"
              " value double, arrival_hour int")
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "wm_src")
    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    for h in sorted({r[4] for r in rows}):
        df.filter(F.col("arrival_hour") == h).drop("arrival_hour").coalesce(
            1
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "event_id long, event_type string, ts timestamp, value double"
        ).parquet(src)
        ingest.run_stream_to_sink(
            ingest.windowed_event_counts(stream, watermark="1 hour"),
            out, ckpt,
        )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    # twin on the same arrival timeline (flush row's own window is
    # never finalized -> excluded from the comparison)
    seeded = df.withColumn(
        "arrival_ts",
        F.to_timestamp(F.lit(str(base)))
        + F.col("arrival_hour") * F.expr("INTERVAL 1 HOUR"),
    )
    flags = ingest.watermark_accepted_flags(seeded)
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in flags.filter("ok AND event_id <> 99")
        .groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    # the scenario is non-trivial: exactly one row was discarded
    assert sum(want.values()) == len(rows) - 1 - 1  # minus flush, minus id 30


def test_dedup_within_watermark_twin_matches_real_engine(spark, tmp_path):
    """The batch twin (ingest.dedup_within_watermark_flags) must
    reproduce the REAL dropDuplicatesWithinWatermark, including the
    three probed behaviors: late input rows are filtered before the
    state lookup (id 4: never-seen key, old ts, not emitted);
    duplicates do NOT extend the first event's expiry (id 3: emitted
    after first-event expiry even though a mid-window duplicate
    arrived); eviction at wm >= expiry re-opens the key."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    # (event_id, key, ts, arrival_batch); delay 2h
    rows = [
        (1, "a", t(0), 0),      # accept; state expires 02:00
        (90, "z", t(10), 0),
        (2, "a", t(110), 1),    # dup inside window -> dropped
        (91, "z2", t(250), 1),  # ts 04:10 -> wm after batch1 = 02:10
        (3, "a", t(180), 2),    # wm 02:10 >= expiry 02:00 -> accept again
        (4, "c", t(5), 2),      # new key but ts < wm -> late-dropped
        (5, "d", t(230), 2),    # new key, ts >= wm -> accept
        (92, "z3", t(400), 3),  # flush batch
    ]
    sch = "event_id long, k string, ts timestamp"
    src = str(tmp_path / "dw_src")
    out = str(tmp_path / "dw_out")
    ckpt = str(tmp_path / "dw_ckpt")
    full = spark.createDataFrame(rows, sch + ", b int")
    for b in sorted({r[3] for r in rows}):
        full.filter(F.col("b") == b).drop("b").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(sch).parquet(src)
        ingest.run_stream_to_sink(
            ingest.stream_dedup(stream, ["k"], watermark="2 hours"),
            out, ckpt,
        )
    got = sorted(
        (r["event_id"], r["k"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "a"), (3, "a"), (5, "d"), (90, "z"),
                   (91, "z2"), (92, "z3")]

    # twin over the same arrival timeline
    seeded = full.withColumn(
        "arrival_ts",
        F.to_timestamp(F.lit(str(base)))
        + F.col("b") * F.expr("INTERVAL 1 HOUR"),
    ).drop("b")
    flags = ingest.dedup_within_watermark_flags(
        seeded, ["k"], delay="2 hours"
    )
    want = sorted(
        (r["event_id"], r["k"])
        for r in flags.filter("status = 'kept'").collect()
    )
    assert got == want
    # and the reasons split exactly as the probes established
    by_status = {
        r["status"]: r["n"]
        for r in flags.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    assert by_status == {"kept": 6, "dup": 1, "late": 1}


def test_attribution_outer_twin_matches_real_engine(spark, tmp_path):
    """The LEFT OUTER stream-stream join twin must reproduce the real
    engine's emission rules: inner pairs as they match; a NULL row for
    an unmatched click only after the watermark passes its join-window
    end; nothing for late clicks or still-open clicks.

    Harness nuances this test encodes (both probed on Spark 4.1):
    * the global watermark is the MIN over the two inputs' own
      watermarks, so each intended micro-batch writes exactly one file
      PER SIDE (empty parquet via pyarrow when a side has no rows) and
      the query runs ONCE with maxFilesPerTrigger=1 — availableNow
      restart chains never emit the outer NULL rows;
    * mtime ordering pins file->batch assignment (sleep between
      writes).

    Timeline (horizon 1h, delay 2h): c1 matches p1 in-batch; c2 never
    matches and its window closes under the advancing min-side wm ->
    NULL row; c4 arrives when wm = 08:31 with ts 00:05 -> probed: the
    join ACCEPTS late input (no aggregation-style late filter), so c4
    buffers and null-emits on eviction like any expired click; c3/c5
    are young -> withheld."""
    import datetime as dt
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vexere_lakehouse_pipeline_spark.streaming import ingest

    base = dt.datetime(2024, 1, 1, 0, 0)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    # (event_id, event_type, user, ts, arrival_batch)
    rows = [
        (1, "click", "a", t(0), 0),        # matched by p1 (same batch)
        (2, "click", "b", t(10), 0),       # never matches -> NULL row
        (101, "purchase", "a", t(30), 0),
        (3, "click", "d", t(631), 1),      # young: window 11:31 > final wm
        (102, "purchase", "z", t(780), 1),  # drives purchase-side wm up
        (4, "click", "e", t(5), 2),        # late: global wm 08:31 by now
        (103, "purchase", "z2", t(810), 2),
        (5, "click", "f", t(640), 3),      # young unmatched -> withheld
    ]
    sch = "event_id long, event_type string, user_id string, ts timestamp"
    src_c = str(tmp_path / "oc_src")
    src_p = str(tmp_path / "op_src")
    out = str(tmp_path / "oj_out")
    ckpt = str(tmp_path / "oj_ckpt")
    (tmp_path / "oc_src").mkdir()
    (tmp_path / "op_src").mkdir()
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "user_id": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us", tz="UTC")),
        }
    )
    full = spark.createDataFrame(rows, sch + ", b int")
    for b in sorted({r[4] for r in rows}):
        batch = full.filter(F.col("b") == b).drop("b")
        for et, src in (("click", src_c), ("purchase", src_p)):
            side = batch.filter(F.col("event_type") == et)
            if side.isEmpty():
                pq.write_table(empty, f"{src}/pad-{b}.parquet")
            else:
                side.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)  # distinct mtimes: file order == batch order
    joined = ingest.stream_stream_attribution_join_outer(
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_c),
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_p),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, 101), (2, None), (4, None)]

    # twin over the same arrival timeline
    seeded = full.withColumn(
        "arrival_ts",
        F.to_timestamp(F.lit(str(base)))
        + F.col("b") * F.expr("INTERVAL 1 HOUR"),
    ).drop("b")
    flags = ingest.attribution_outer_flags(
        seeded.filter(F.col("event_type") == "click"),
        seeded.filter(F.col("event_type") == "purchase"),
    )
    by_click = {
        r["click_id"]: (r["status"], r["n_matches"])
        for r in flags.collect()
    }
    assert by_click == {
        1: ("matched", 1),
        2: ("expired_unmatched", 0),
        3: ("open", 0),
        4: ("expired_unmatched", 0),  # late input: buffered, not dropped
        5: ("open", 0),
    }
    assert {
        r["click_id"] for r in flags.collect() if r["is_late_input"]
    } == {4}
    # stream emissions == twin's matched pairs + expired NULL rows
    want_emitted = sorted(
        [(cid, 101 if st == "matched" else None)
         for cid, (st, _) in by_click.items() if st != "open"]
    )
    assert got == want_emitted
