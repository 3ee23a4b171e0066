"""Contract-enforced IO layer tests (S1-S3, S7)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark import io as vio
from vexere_lakehouse_pipeline_spark.catalog import (
    RAW_REVIEW_SCHEMA,
    RAW_TICKET_SCHEMA,
)


def test_read_csv_with_contract(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "Bus_Key,Bus_Name,Start_Date,Route,Departure_Time,Arrival_Time,"
        "Departure_Place,Arrival_Place,Duration,Type_Bus,Price\n"
        '1,Phương Trang,01-05-2025,TP.HCM - Can Tho,06:30,10:00,"BX Miền Tây",'
        '"BX Cần Thơ",3h30m,Giường nằm 40 chỗ,150.000đ\n'
    )
    df = vio.read_csv(spark, str(p), RAW_TICKET_SCHEMA)
    assert df.schema == RAW_TICKET_SCHEMA
    row = df.first()
    assert row["Bus_Name"] == "Phương Trang"
    assert row["Price"] == "150.000đ"


def test_read_json_line_and_multiline(spark, tmp_path):
    rows = [
        {"Bus_Name": "A", "Customer_Name": "x", "Stars": 5,
         "Comment": "good", "Date": "01/05/2025 10:00"},
        {"Bus_Name": "B", "Customer_Name": "y", "Stars": 1,
         "Comment": "bad", "Date": "02/05/2025 11:00"},
    ]
    nd = tmp_path / "nd.json"
    nd.write_text("\n".join(json.dumps(r) for r in rows))
    ml = tmp_path / "ml.json"
    ml.write_text(json.dumps(rows, indent=2))
    a = vio.read_json(spark, str(nd), RAW_REVIEW_SCHEMA)
    b = vio.read_json(spark, str(ml), RAW_REVIEW_SCHEMA, multi_line=True)
    assert a.count() == b.count() == 2
    assert a.schema == b.schema == RAW_REVIEW_SCHEMA


def test_write_single_json(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "id * 2 AS double_id")
    out = str(tmp_path / "out")
    vio.write_single_json(df, out)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    back = spark.read.json(out)
    assert back.count() == 5


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed tables join without a shuffle: the whole point of
    write_bucketed.  Asserts on the physical plan."""
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.io import write_bucketed

    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):  # leftover dirs from a dead session
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    sf = "/root/testdata/sf0.001"
    write_bucketed(
        load_table(spark, sf, "orders"), "b_orders",
        bucket_cols=["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf, "lineitem"), "b_lineitem",
        bucket_cols=["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"],
    )
    # tiny test tables would be broadcast (bypassing bucketing); force
    # the sort-merge path the bucketing exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_python_datasource_ticket_source(spark):
    """Spark-4 Python Data Source: partitioned executor-side generation
    of the raw ticket contract (SURVEY S12)."""
    from vexere_lakehouse_pipeline_spark.catalog import RAW_TICKET_SCHEMA
    from vexere_lakehouse_pipeline_spark.sources.ticket_source import (
        TicketDataSource,
    )

    spark.dataSource.register(TicketDataSource)
    df = (
        spark.read.format("vexere_tickets")
        .option("days", "01-05-2025,02-05-2025,03-05-2025")
        .option("rows_per_day", 40)
        .load()
    )
    assert df.schema == RAW_TICKET_SCHEMA
    assert df.rdd.getNumPartitions() == 3  # one partition per crawl day
    assert df.count() == 120
    # deterministic: re-read yields identical rows
    again = (
        spark.read.format("vexere_tickets")
        .option("days", "01-05-2025,02-05-2025,03-05-2025")
        .option("rows_per_day", 40)
        .load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))
    # feeds the same silver pipeline as any bronze scan
    keys = df.select("Bus_Key").distinct().count()
    assert keys == 120


def test_python_datasource_streaming_reader(spark, tmp_path):
    """Streaming flavor: one micro-batch per crawl day, drains under
    availableNow, total rows match the batch read."""
    from vexere_lakehouse_pipeline_spark.sources.ticket_source import (
        TicketDataSource,
    )

    spark.dataSource.register(TicketDataSource)
    stream = (
        spark.readStream.format("vexere_tickets")
        .option("days", "01-05-2025,02-05-2025")
        .option("rows_per_day", 25)
        .load()
    )
    sink = str(tmp_path / "tickets_out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "tickets_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 50
    assert got.select("Start_Date").distinct().count() == 2


def test_read_csv_captures_corrupt_records(spark, tmp_path):
    from pyspark.sql.types import IntegerType, StructField, StructType

    from vexere_lakehouse_pipeline_spark.io import read_csv

    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\nnot_an_int,5\n3,4\n")
    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", IntegerType())]
    )
    df = read_csv(spark, str(p), schema, keep_corrupt=True).cache()
    bad = df.filter(df["_corrupt_record"].isNotNull()).collect()
    assert len(bad) == 1 and "not_an_int" in bad[0]["_corrupt_record"]
    assert df.filter(df["_corrupt_record"].isNull()).count() == 2
    # contract object not mutated by the corrupt-column addition
    assert len(schema.fields) == 2
    df.unpersist()


def test_read_text_corpus_lines_and_whole_files(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.io import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("single doc body\nsecond line\n")

    lines = read_text_corpus(spark, str(d)).collect()
    assert sorted(r.text for r in lines) == [
        "line one", "line two", "second line", "single doc body",
    ]
    assert all(r.path.startswith("file:") for r in lines)

    docs = read_text_corpus(spark, str(d), whole_files=True).collect()
    by_file = {r.path.rsplit("/", 1)[-1]: r.text for r in docs}
    assert by_file["a.txt"] == "line one\nline two\n"
    assert len(docs) == 2


def test_orc_roundtrip_through_zone_and_upsert(spark, tmp_path):
    """The writers are format-parameterized; prove fmt='orc' actually
    works end-to-end (ORC is built into Spark, unlike Delta here)."""
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        ZoneCatalog,
        forget_keys,
        read_table,
        upsert,
    )

    cat = ZoneCatalog(str(tmp_path / "zones"), fmt="orc")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    cat.overwrite(df, "silver", "t")
    assert {r.v for r in cat.read(spark, "silver", "t").collect()} == {"a", "b"}

    path = str(tmp_path / "orc_upsert")
    upsert(df, path, ["id"], fmt="orc")
    upsert(
        spark.createDataFrame([(2, "B2"), (3, "c")], "id int, v string"),
        path, ["id"], fmt="orc",
    )
    assert {(r.id, r.v) for r in read_table(spark, path, fmt="orc").collect()} == {
        (1, "a"), (2, "B2"), (3, "c"),
    }
    assert forget_keys(
        spark, path, spark.createDataFrame([(1,)], "id int"), ["id"], fmt="orc"
    ) == 1
    assert {r.id for r in read_table(spark, path, fmt="orc").collect()} == {2, 3}


def test_read_write_orc_helpers_pushdown(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.io import read_orc, write_orc

    df = spark.range(1000).selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS s")
    path = str(tmp_path / "orc_direct")
    write_orc(df, path, partition_by=["k"])
    back = read_orc(spark, path)
    assert back.count() == 1000
    # partition pruning: only one of 7 partition dirs is scanned —
    # assert on the PLAN, not the row count (a correct-but-unpruned
    # scan returns the same rows and must still fail this test)
    pruned = back.filter("k = 3").select("id")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "k#" in plan.split("PartitionFilters", 1)[1][:200], plan[:1500]
    assert pruned.count() == df.filter("id % 7 = 3").count()


def test_s3a_conf_wiring(monkeypatch):
    """VERDICT r2 gap #3: the live MinIO path can't run offline, but the
    env-driven conf contract can be pinned — endpoint only when set,
    SSL default ON, plaintext only on explicit opt-out, no creds in
    conf (the s3a provider chain reads them from the env)."""
    from vexere_lakehouse_pipeline_spark.session import assemble_conf

    monkeypatch.delenv("S3_ENDPOINT", raising=False)
    monkeypatch.delenv("S3_SSL", raising=False)
    off = assemble_conf(with_s3a=False)
    assert not any(k.startswith("spark.hadoop.fs.s3a") for k in off)

    base = assemble_conf(with_s3a=True)
    assert base["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert "spark.hadoop.fs.s3a.endpoint" not in base         # AWS default
    assert "spark.hadoop.fs.s3a.connection.ssl.enabled" not in base  # SSL on

    monkeypatch.setenv("S3_ENDPOINT", "http://minio:9000")
    monkeypatch.setenv("S3_SSL", "false")
    minio = assemble_conf(with_s3a=True)
    assert minio["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert minio["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    # empty endpoint must NOT be copied in (breaks the client)
    monkeypatch.setenv("S3_ENDPOINT", "")
    assert "spark.hadoop.fs.s3a.endpoint" not in assemble_conf(with_s3a=True)
    # no credential material ever lands in Spark conf
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIAFAKE")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "fakesecret")
    leaked = [
        (k, v) for k, v in assemble_conf(with_s3a=True).items()
        if "AKIAFAKE" in v or "fakesecret" in v or "secret" in k.lower()
    ]
    assert leaked == []


def test_repetition_scores_crafted(spark, tmp_path):
    """Non-vacuous repetition detection: a doc built from 3 identical
    10-token sentences + 1 unique one must score dup_sent 500 permille
    ((4-2)/4) and a heavy dup_2gram share; a doc of unique words scores
    0 on both."""
    from vexere_lakehouse_pipeline_spark.plans import webcur

    rep = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
           + "unique uno dos tres cuatro cinco seis siete ocho nueve")
    uniq = " ".join(f"w{i}" for i in range(40))
    spark.createDataFrame(
        [(1, rep), (2, uniq)], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in webcur.QUERIES["text_repetition_scores"](
        spark, str(tmp_path)
    ).collect()}
    assert out[1]["n_sents"] == 4 and out[1]["dup_sent_permille"] == 500
    assert out[1]["dup_2gram_permille"] > 400
    assert out[2]["dup_sent_permille"] == 0
    assert out[2]["dup_2gram_permille"] == 0
    assert out[2]["top_2gram_permille"] <= 1000 // 39
