"""End-to-end medallion pipeline tests on deterministic fixtures
(SURVEY.md §5 strategy 2): raw → bronze → silver → gold, plus the
idempotency and key-continuation properties the reference lacks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators.incremental import ZoneCatalog
from vexere_lakehouse_pipeline_spark.plans.pipeline import run_full_pipeline
from vexere_lakehouse_pipeline_spark.sources import fixtures


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zones"))
    zones = ZoneCatalog(base, fmt="parquet")
    gold = run_full_pipeline(
        spark,
        zones,
        fixtures.raw_tickets(spark, days=("01-05-2025", "02-05-2025")),
        fixtures.raw_facilities(spark),
        fixtures.raw_reviews(spark),
        fixtures.bus_ids(spark),
    )
    return zones, gold


def test_silver_ticket_typed_and_keyed(spark, pipeline_out):
    zones, _ = pipeline_out
    t = zones.read(spark, "silver", "ticket")
    dt = dict(t.dtypes)
    assert dt["Start_Date"] == "date"
    assert dt["Duration"] == "float"
    assert dt["Price"] == "int"
    assert dt["Bus_Key"] == "bigint"
    n = t.count()
    assert n == 480  # 2 days × 240
    keys = t.select("Bus_Key").distinct().count()
    assert keys == n  # unique surrogate keys
    # prices parsed: all multiples of 1000 or null
    bad = t.filter(F.col("Price").isNotNull() & (F.col("Price") % 1000 != 0))
    assert bad.count() == 0
    # places normalized: no uppercase/punctuation survives
    assert t.filter(F.col("Departure_Place").rlike("[A-Z.,!]")).count() == 0
    cats = {r["Bus_Type_Category"] for r in t.select("Bus_Type_Category").distinct().collect()}
    assert cats <= {
        "giường nằm", "limousine ghế ngồi", "limousine giường nằm có WC",
        "limousine giường nằm", "limousine giường phòng", "ghế ngồi", "khác",
    }


def test_unmatched_operator_gets_null_bus_id(spark, pipeline_out):
    zones, _ = pipeline_out
    t = zones.read(spark, "silver", "ticket")
    # fixtures.bus_ids omits the last operator
    missing = fixtures.OPERATORS[-1]
    rows = t.filter(F.col("Bus_Name") == missing)
    assert rows.count() > 0
    assert rows.filter(F.col("Bus_Id").isNotNull()).count() == 0


def test_facility_bridge_and_dim(spark, pipeline_out):
    zones, _ = pipeline_out
    names = zones.read(spark, "silver", "facility_name")
    bridge = zones.read(spark, "silver", "facility")
    assert names.count() <= 21
    ids = [r["Facility_Id"] for r in names.collect()]
    assert sorted(ids) == list(range(1, len(ids) + 1))
    # ghost/empty facility rows were filtered
    assert bridge.filter(F.col("Bus_Name").isin("Ghost Lines", "Empty Lines")).count() == 0


def test_reviews_split_and_scored(spark, pipeline_out):
    zones, _ = pipeline_out
    vi = zones.read(spark, "silver", "bus_reviews_vi")
    en = zones.read(spark, "silver", "bus_reviews_en")
    assert "NEU" in vi.columns and "NEU" not in en.columns
    for df in (vi, en):
        assert df.filter((F.col("POS") < 0) | (F.col("POS") > 1)).count() == 0
    # vi comments routed vi: the fake heuristic must catch diacritics
    assert vi.count() > 0 and en.count() > 0


def test_gold_outputs_shape(spark, pipeline_out):
    _, gold = pipeline_out
    assert set(gold) == {f"cau_{i}" for i in range(1, 9)}
    c1 = gold["cau_1"]
    assert c1.columns == ["Route", "Bus_Name", "Total_Trips",
                          "Avg_Price_Per_Day", "depart_time_ranges"]
    # cau_7: |operators| × 24 dense grid
    c7 = gold["cau_7"]
    n_ops = c7.select("bus_name").distinct().count()
    assert c7.count() == n_ops * 24
    assert c7.agg(F.max("has_departure")).first()[0] == 1
    # cau_8: |operators| × 21 dense grid
    c8 = gold["cau_8"]
    n_ops8 = c8.select("bus_name").distinct().count()
    assert c8.count() == n_ops8 * 21
    # cau_6 only projects the aggregate (reference parity quirk)
    assert gold["cau_6"].columns == ["avg_rating_10pt"]


def test_rerun_is_idempotent_and_keys_continue(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zones2"))
    zones = ZoneCatalog(base, fmt="parquet")
    day1 = dict(
        raw_tickets=fixtures.raw_tickets(spark, days=("01-05-2025",)),
        raw_facilities=fixtures.raw_facilities(spark),
        raw_reviews=fixtures.raw_reviews(spark),
        bus_ids=fixtures.bus_ids(spark),
    )
    run_full_pipeline(spark, zones, **day1)
    n1 = zones.read(spark, "silver", "ticket").count()
    # replay same batch: merge keys dedupe → no growth (reference would double)
    run_full_pipeline(spark, zones, **day1)
    assert zones.read(spark, "silver", "ticket").count() == n1
    # new day appends with keys continuing above the previous max
    day2 = dict(day1, raw_tickets=fixtures.raw_tickets(spark, days=("02-05-2025",), seed=7))
    run_full_pipeline(spark, zones, **day2)
    t = zones.read(spark, "silver", "ticket")
    assert t.count() > n1
    assert t.select("Bus_Key").distinct().count() == t.count()


def test_audit_rows_written(spark, pipeline_out):
    zones, _ = pipeline_out
    audit = zones.read(spark, "audit", "audit")
    tasks = {r["task_id"] for r in audit.select("task_id").collect()}
    assert {"to_bronze", "ticket_to_silver", "facility_to_silver",
            "review_to_silver", "update_charts"} <= tasks
    assert audit.filter(F.col("state") != "success").count() == 0


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """partitionBy + date predicate -> Catalyst reads ONLY matching
    partition dirs (the pruning the reference's path-string layout
    defeated, SURVEY §4)."""
    import datetime as dt

    from vexere_lakehouse_pipeline_spark.operators import incremental as inc

    path = str(tmp_path / "part_t")
    df = spark.createDataFrame(
        [(i, dt.date(2025, 5, 1 + i % 3)) for i in range(30)],
        "id long, ingest_date date",
    )
    inc.write_overwrite(df, path, partition_by=("ingest_date",))
    q = spark.read.parquet(path).filter(
        F.col("ingest_date") == dt.date(2025, 5, 2)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ingest_date" in plan
    assert q.count() == 10
    # file-level check: only one partition DIRECTORY is touched —
    # parse the actual file paths (asserting on the data column would
    # be vacuous: the filter guarantees it regardless of pruning)
    dirs = {
        f["f"].split("ingest_date=")[1].split("/")[0]
        for f in q.select(F.input_file_name().alias("f")).collect()
    }
    assert dirs == {"2025-05-02"}


def test_compact_table_reduces_files(spark, tmp_path):
    import glob

    from vexere_lakehouse_pipeline_spark.operators import incremental as inc

    path = str(tmp_path / "compact_t")
    # simulate streaming-style small appends
    for i in range(5):
        spark.range(i * 10, (i + 1) * 10).repartition(4).write.mode(
            "append"
        ).parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    inc.compact_table(spark, path, target_rows_per_file=1000)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 20 and after == 1
    assert spark.read.parquet(path).count() == 50


def test_schema_evolution_append_and_merged_read(spark, tmp_path):
    """A later batch adds a column; mergeSchema reads reconcile old
    files (null-filled) with new — no rewrite of history needed."""
    from vexere_lakehouse_pipeline_spark.operators import incremental as inc

    path = str(tmp_path / "evolve")
    inc.merge_append(
        spark.createDataFrame([(1, "a")], "k long, v string"),
        path, merge_keys=["k"],
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "k long, v string, score double"
    ).write.mode("append").parquet(path)
    got = inc.read_table(spark, path, merge_schema=True)
    rows = {r["k"]: (r["v"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        incremental_rollup,
        read_table,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    day = F.to_date("o_orderdate").cast("string")
    o = orders.select(day.alias("day"), "o_custkey", "o_totalprice")
    # split by order date parity: batch1 = even days, batch2 = odd
    b1 = o.filter(F.dayofmonth(F.to_date("day")) % 2 == 0)
    b2 = o.filter(F.dayofmonth(F.to_date("day")) % 2 == 1)
    path = str(tmp_path / "rollup")
    measures = {
        "revenue": ("sum", "o_totalprice"),
        "n_orders": ("count", "o_custkey"),
    }
    incremental_rollup(b1, path, ["day"], measures, "day")
    # partition values round-trip via directory names, so Spark
    # re-infers day as DateType on read — normalize with str()
    before = {
        str(r["day"]): (round(r["revenue"], 2), r["n_orders"])
        for r in read_table(spark, path).collect()
    }
    incremental_rollup(b2, path, ["day"], measures, "day")
    got = {
        str(r["day"]): (round(r["revenue"], 2), r["n_orders"])
        for r in read_table(spark, path).collect()
    }
    want = {
        str(r["day"]): (round(r["revenue"], 2), r["n_orders"])
        for r in o.groupBy("day").agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count("o_custkey").alias("n_orders"),
        ).collect()
    }
    assert got == want
    assert all(got[d] == before[d] for d in before)  # values stable
    # (the rewrite-scope guarantee itself is pinned by the mtime test
    # below — identical values can't distinguish rewrite from skip)


def test_incremental_rollup_leaves_untouched_partitions_alone(spark, tmp_path):
    import os

    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        incremental_rollup,
    )

    rows = spark.createDataFrame(
        [("d1", 10.0), ("d2", 20.0)], "day string, v double"
    )
    path = str(tmp_path / "r2")
    m = {"total": ("sum", "v"), "n": ("count", "v")}
    incremental_rollup(rows, path, ["day"], m, "day")
    d1_files = {
        f: os.path.getmtime(os.path.join(path, "day=d1", f))
        for f in os.listdir(os.path.join(path, "day=d1"))
        if f.endswith(".parquet")
    }
    # second batch touches only d2
    incremental_rollup(
        spark.createDataFrame([("d2", 5.0)], "day string, v double"),
        path, ["day"], m, "day",
    )
    d1_after = {
        f: os.path.getmtime(os.path.join(path, "day=d1", f))
        for f in os.listdir(os.path.join(path, "day=d1"))
        if f.endswith(".parquet")
    }
    assert d1_files == d1_after  # dynamic overwrite skipped day=d1


def test_upsert_updates_matches_and_inserts_new(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        read_table,
        upsert,
    )

    path = str(tmp_path / "scd1")
    v1 = spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c")],
        "day string, id int, v string",
    )
    upsert(v1, path, ["id"], partition_by=("day",))
    v2 = spark.createDataFrame(
        [("d1", 2, "B2"), ("d1", 9, "new")], "day string, id int, v string"
    )
    upsert(v2, path, ["id"], partition_by=("day",))
    got = {
        (r.id, r.v) for r in read_table(spark, path).collect()
    }
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (9, "new")}
    # unpartitioned path too
    p2 = str(tmp_path / "flat")
    upsert(v1.drop("day"), p2, ["id"])
    upsert(v2.drop("day"), p2, ["id"])
    got2 = {(r.id, r.v) for r in read_table(spark, p2).collect()}
    assert got2 == got


def test_upsert_is_idempotent(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        read_table,
        upsert,
    )

    path = str(tmp_path / "idem")
    batch = spark.createDataFrame(
        [("d1", 1, "x"), ("d2", 2, "y")], "day string, id int, v string"
    )
    upsert(batch, path, ["id"], partition_by=("day",))
    upsert(batch, path, ["id"], partition_by=("day",))  # replay
    rows = read_table(spark, path).collect()
    assert len(rows) == 2


def test_runner_retries_and_audits_each_attempt(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        ZoneCatalog,
        read_table,
    )
    from vexere_lakehouse_pipeline_spark.plans.pipeline import PipelineRunner

    zones = ZoneCatalog(str(tmp_path))
    runner = PipelineRunner(spark, zones, dag_id="retry_dag")
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")

    runner.run_task("flaky_task", flaky, retries=1)
    runner.flush_audit()
    audit = read_table(spark, zones.path("audit", "audit")).collect()
    by_try = {(r.try_number, r.state) for r in audit if r.task_id == "flaky_task"}
    assert by_try == {(1, "failed"), (2, "success")}
    assert calls["n"] == 2

    # permanent failure: exhausts retries then raises
    import pytest

    def broken():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        runner.run_task("broken_task", broken, retries=1)


def test_rollup_preserves_null_partition_history(spark, tmp_path):
    """Review finding: isin() never matches NULL, so the null
    partition's prior aggregates were dropped on merge."""
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        incremental_rollup,
        read_table,
    )

    path = str(tmp_path / "nullpart")
    m = {"total": ("sum", "v"), "n": ("count", "v")}
    b1 = spark.createDataFrame([(None, 5.0), ("d1", 1.0)], "day string, v double")
    b2 = spark.createDataFrame([(None, 7.0)], "day string, v double")
    incremental_rollup(b1, path, ["day"], m, "day")
    incremental_rollup(b2, path, ["day"], m, "day")
    got = {r.day: r.total for r in read_table(spark, path).collect()}
    assert got[None] == 12.0  # 5 + 7, not 7
    assert got["d1"] == 1.0


def test_upsert_removes_stale_row_when_partition_changes(spark, tmp_path):
    """Review finding: a key moving partitions left its old row on disk
    because the old partition was never rewritten."""
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        read_table,
        upsert,
    )

    path = str(tmp_path / "move")
    upsert(
        spark.createDataFrame([("d1", 1, "a"), ("d1", 2, "b")],
                              "day string, id int, v string"),
        path, ["id"], partition_by=("day",),
    )
    upsert(
        spark.createDataFrame([("d3", 1, "a2")], "day string, id int, v string"),
        path, ["id"], partition_by=("day",),
    )
    rows = {(r.id, r.day, r.v) for r in read_table(spark, path).collect()}
    assert rows == {(1, "d3", "a2"), (2, "d1", "b")}  # no stale (1, d1, a)


def test_compact_table_ceiling_file_count(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        compact_table,
    )

    path = str(tmp_path / "cmp")
    spark.range(30).repartition(10).write.parquet(path)
    n = compact_table(spark, path, target_rows_per_file=20)
    assert n == 2  # ceil(30/20), not floor -> files stay under target
    assert spark.read.parquet(path).count() == 30


def test_bronze_keeps_prior_ingest_dates(spark, tmp_path):
    """Review finding: static overwrite wiped every earlier ingest_date
    partition on each daily run."""
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        ZoneCatalog,
    )

    zones = ZoneCatalog(str(tmp_path))
    d1 = spark.createDataFrame([("a", "2025-05-01")], "v string, ingest_date string")
    d2 = spark.createDataFrame([("b", "2025-05-02")], "v string, ingest_date string")
    zones.overwrite_partitions(d1, "bronze", "ticket", ("ingest_date",))
    zones.overwrite_partitions(d2, "bronze", "ticket", ("ingest_date",))
    got = {str(r.ingest_date) for r in zones.read(spark, "bronze", "ticket").collect()}
    assert got == {"2025-05-01", "2025-05-02"}  # day 1 survives day 2's run


def test_upsert_clears_emptied_old_partition(spark, tmp_path):
    """Review finding: a key moving out of a partition that then holds
    NO rows left its stale file behind (dynamic overwrite only rewrites
    partitions present in the output)."""
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        read_table,
        upsert,
    )

    path = str(tmp_path / "mv2")
    upsert(
        spark.createDataFrame(
            [("d1", 1, "a"), ("d2", 2, "b")], "day string, id int, v string"
        ),
        path, ["id"], partition_by=("day",),
    )
    upsert(
        spark.createDataFrame([("d3", 1, "a2")], "day string, id int, v string"),
        path, ["id"], partition_by=("day",),
    )
    rows = {(r.id, r.day, r.v) for r in read_table(spark, path).collect()}
    assert rows == {(1, "d3", "a2"), (2, "d2", "b")}  # d1 fully gone


def test_upsert_rejects_duplicate_batch_keys(spark, tmp_path):
    import pytest

    from vexere_lakehouse_pipeline_spark.operators.incremental import upsert

    batch = spark.createDataFrame(
        [("d1", 7, "x"), ("d1", 7, "y")], "day string, id int, v string"
    )
    with pytest.raises(ValueError, match="duplicate merge key"):
        upsert(batch, str(tmp_path / "dup"), ["id"], partition_by=("day",))


def test_upsert_clears_emptied_partition_with_escaped_value(spark, tmp_path):
    """Advisor finding: Spark percent-escapes special chars (':' '/'
    '%') in partition directory names, so the emptied-partition cleanup
    must escape too — a raw f"{k}={v}" path never matches on disk and
    the stale partition survives."""
    import os

    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        read_table,
        upsert,
    )

    path = str(tmp_path / "esc")
    upsert(
        spark.createDataFrame(
            [("2025-05-01 00:00:00", 1, "a"), ("plain", 2, "b")],
            "slot string, id int, v string",
        ),
        path, ["id"], partition_by=("slot",),
    )
    # the colon-bearing value must be written percent-escaped
    assert any("%3A" in d for d in os.listdir(path) if d.startswith("slot="))
    upsert(
        spark.createDataFrame(
            [("moved", 1, "a2")], "slot string, id int, v string"
        ),
        path, ["id"], partition_by=("slot",),
    )
    rows = {(r.id, r.slot, r.v) for r in read_table(spark, path).collect()}
    assert rows == {(1, "moved", "a2"), (2, "plain", "b")}
    assert not any("%3A" in d for d in os.listdir(path))  # stale dir gone


def test_forget_keys_erases_and_reports_count(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        forget_keys,
        read_table,
        upsert,
    )

    path = str(tmp_path / "forget")
    data = spark.createDataFrame(
        [("d1", 1, "a"), ("d1", 2, "b"), ("d2", 3, "c"), ("d3", 4, "d")],
        "day string, id int, v string",
    )
    upsert(data, path, ["id"], partition_by=("day",))
    erase = spark.createDataFrame([(2,), (3,), (999,)], "id int")
    n = forget_keys(spark, path, erase, ["id"], partition_by=("day",))
    assert n == 2  # id 999 never existed
    got = {r.id for r in read_table(spark, path).collect()}
    assert got == {1, 4}
    # d2's only row was erased: the partition directory must be gone,
    # not left as a stale empty dir.
    import os

    assert not os.path.exists(os.path.join(path, "day=d2"))
    assert os.path.exists(os.path.join(path, "day=d3"))


def test_forget_keys_untouched_partition_not_rewritten(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        forget_keys,
        upsert,
    )

    path = str(tmp_path / "forget_untouched")
    data = spark.createDataFrame(
        [("d1", 1, "a"), ("d2", 2, "b")], "day string, id int, v string"
    )
    upsert(data, path, ["id"], partition_by=("day",))
    import os

    def part_files(day):
        d = os.path.join(path, f"day={day}")
        return sorted(f for f in os.listdir(d) if f.startswith("part-"))

    before = part_files("d2")
    forget_keys(
        spark,
        path,
        spark.createDataFrame([(1,)], "id int"),
        ["id"],
        partition_by=("day",),
    )
    # d2 held no matching rows: its files are bit-for-bit untouched.
    assert part_files("d2") == before
    assert not os.path.exists(os.path.join(path, "day=d1"))


def test_forget_keys_noop_and_missing_table(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        forget_keys,
        read_table,
        upsert,
    )

    missing = str(tmp_path / "never_written")
    erase = spark.createDataFrame([(1,)], "id int")
    assert forget_keys(spark, missing, erase, ["id"]) == 0

    path = str(tmp_path / "forget_noop")
    data = spark.createDataFrame([(1, "a")], "id int, v string")
    upsert(data, path, ["id"])
    assert forget_keys(
        spark, path, spark.createDataFrame([(42,)], "id int"), ["id"]
    ) == 0
    assert read_table(spark, path).count() == 1


def test_forget_keys_null_safe_match(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        forget_keys,
        read_table,
        upsert,
    )

    path = str(tmp_path / "forget_null")
    data = spark.createDataFrame(
        [(None, "null-key"), (1, "keep")], "id int, v string"
    )
    upsert(data, path, ["id"])
    n = forget_keys(
        spark, path, spark.createDataFrame([(None,)], "id int"), ["id"]
    )
    assert n == 1
    got = [r.v for r in read_table(spark, path).collect()]
    assert got == ["keep"]


def test_compact_splits_large_hive_partition(spark, tmp_path):
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators.incremental import compact_table

    path = str(tmp_path / "t")
    df = spark.range(10_000).withColumn(
        "day", F.when(F.col("id") < 9_000, "d1").otherwise("d2")
    )
    df.repartition(40).write.partitionBy("day").parquet(path)
    compact_table(
        spark, path, fmt="parquet", target_rows_per_file=2_000,
        partition_by=("day",),
    )
    import glob

    d1_files = glob.glob(f"{path}/day=d1/*.parquet")
    d2_files = glob.glob(f"{path}/day=d2/*.parquet")
    # 9000 rows at 2000/file -> 5 slices (was: ONE file per partition)
    assert len(d1_files) >= 4
    assert len(d2_files) >= 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000  # lossless
