"""Data-quality expectations (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import quality

SF = "/root/testdata/sf0.001"


def _li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_check_counts_violations_in_one_pass(spark):
    li = _li(spark)
    report = quality.check(
        li,
        {
            "qty_positive": F.col("l_quantity") > 0,
            "discount_unit_interval": F.col("l_discount").between(0, 1),
            "impossible": F.col("l_quantity") < 0,
            "orderkey_not_null": F.col("l_orderkey").isNotNull(),
        },
    )
    rows = {r["expectation"]: r for r in report.collect()}
    n = li.count()
    assert rows["qty_positive"]["n_violations"] == 0
    assert rows["discount_unit_interval"]["n_violations"] == 0
    assert rows["impossible"]["n_violations"] == n  # all rows violate
    assert all(r["n_rows"] == n for r in rows.values())


def test_null_condition_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1,), (None,)], "x int"
    )
    report = quality.check(df, {"x_positive": F.col("x") > 0})
    assert report.first()["n_violations"] == 1  # the null row


def test_enforce_raises_with_names_and_passes_through(spark):
    li = _li(spark)
    out = quality.enforce(li, {"qty_positive": F.col("l_quantity") > 0})
    assert out is li
    with pytest.raises(quality.QualityError, match="impossible"):
        quality.enforce(li, {"impossible": F.col("l_quantity") < 0})


def test_quarantine_splits_and_tags_reasons(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id int, v double"
    )
    good, bad = quality.quarantine(
        df, {"v_positive": F.col("v") > 0, "v_not_null": F.col("v").isNotNull()}
    )
    assert [r.id for r in good.orderBy("id").collect()] == [1]
    got = {r.id: set(r.failed_expectations) for r in bad.collect()}
    assert got == {2: {"v_positive"}, 3: {"v_positive", "v_not_null"}}
    assert good.count() + bad.count() == df.count()


def test_unique_key_report(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, s string"
    )
    dups = quality.unique_key(df, ["k", "s"]).collect()
    assert len(dups) == 1 and dups[0]["n"] == 2
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    assert quality.unique_key(orders, ["o_orderkey"]).count() == 0


def test_streaming_quarantine_routes_by_expectation(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.sources.ticket_source import (
        TicketDataSource,
    )
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        run_stream_with_quarantine,
    )

    spark.dataSource.register(TicketDataSource)
    stream = (
        spark.readStream.format("vexere_tickets")
        .option("days", "01-05-2025,02-05-2025")
        .option("rows_per_day", 60)
        .load()
    )
    good_p, bad_p = str(tmp_path / "good"), str(tmp_path / "bad")
    run_stream_with_quarantine(
        stream,
        {
            "price_parses": F.regexp_replace("Price", "[^0-9]", "") != "",
            "departure_known": F.col("Departure_Time") != "Không rõ",
        },
        good_p, bad_p, str(tmp_path / "ck"),
        merge_keys=["Bus_Key"],
    )
    good = spark.read.parquet(good_p)
    bad = spark.read.parquet(bad_p)
    assert good.count() + bad.count() == 120
    assert bad.count() > 0  # fixture injects unparseable rows
    # good rows satisfy both expectations
    assert good.filter(F.col("Departure_Time") == "Không rõ").count() == 0
    # quarantined rows name what failed
    reasons = {r.failed_expectations for r in bad.collect()}
    assert all(r for r in reasons)
    assert any("price_parses" in r or "departure_known" in r for r in reasons)
    # replay the same batch through a FRESH checkpoint: merge_keys make
    # the sinks idempotent, so counts must not grow
    run_stream_with_quarantine(
        (
            spark.readStream.format("vexere_tickets")
            .option("days", "01-05-2025,02-05-2025")
            .option("rows_per_day", 60)
            .load()
        ),
        {
            "price_parses": F.regexp_replace("Price", "[^0-9]", "") != "",
            "departure_known": F.col("Departure_Time") != "Không rõ",
        },
        good_p, bad_p, str(tmp_path / "ck2"),
        merge_keys=["Bus_Key"],
    )
    assert spark.read.parquet(good_p).count() + spark.read.parquet(bad_p).count() == 120


def test_observation_metrics_computed_during_write(spark, tmp_path):
    li = _li(spark)
    observed, obs = quality.with_observation(
        li,
        "silver_write",
        {
            "n_rows": F.count(F.lit(1)),
            "null_qty": F.count(F.when(F.col("l_quantity").isNull(), 1)),
            "revenue": F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2
            ).cast("double"),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    want_rev = li.agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
        .cast("double")
    ).first()[0]
    assert got["n_rows"] == li.count()
    assert got["null_qty"] == 0
    assert abs(got["revenue"] - want_rev) < 0.01


def test_profile_handles_all_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a int, b double")
    rows = {r["column"]: r for r in quality.profile(df, ["a", "b"]).collect()}
    assert rows["b"]["n_null"] == 2 and rows["b"]["min_value"] is None
    assert rows["a"]["min_value"] == 1.0
    empty = df.filter("a < 0")
    out = quality.profile(empty, ["a"]).first()
    assert out["n_rows"] == 0 and out["min_value"] is None


def test_schema_diff_and_enforce(spark):
    import pytest
    from pyspark.sql import types as T

    from vexere_lakehouse_pipeline_spark.operators.quality import (
        QualityError,
        enforce_schema,
        schema_diff,
    )

    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    ok = spark.createDataFrame([(1, "a", 2.0)], "id long, v string, extra double")
    d = schema_diff(contract, ok.schema)
    # measurement always reports the drift; POLICY decides in enforce
    assert d == {
        "missing": [], "added": ["extra"], "retyped": [], "nullability": [],
    }
    assert enforce_schema(ok, contract) is ok
    with pytest.raises(QualityError, match="added"):
        enforce_schema(ok, contract, allow_added=False)
    # retyped + missing always violate
    bad = spark.createDataFrame([("x",)], "id string")
    d3 = schema_diff(contract, bad.schema)
    assert d3["missing"] == ["v"]
    assert d3["retyped"] == ["id: bigint -> string"]
    with pytest.raises(QualityError, match="retyped"):
        enforce_schema(bad, contract)


def test_schema_diff_flags_nullability_loosening(spark):
    import pytest
    from pyspark.sql import types as T

    from vexere_lakehouse_pipeline_spark.operators.quality import (
        QualityError,
        enforce_schema,
        schema_diff,
    )

    contract = T.StructType([T.StructField("id", T.LongType(), nullable=False)])
    loose = T.StructType([T.StructField("id", T.LongType(), nullable=True)])
    assert schema_diff(contract, loose)["nullability"] == [
        "id: non-nullable -> nullable"
    ]
    # the stricter direction is fine
    assert schema_diff(loose, contract)["nullability"] == []
    df = spark.createDataFrame([(1,)], "id long")  # nullable by default
    with pytest.raises(QualityError, match="nullability"):
        enforce_schema(df, contract)


def test_linear_text_classifier_exact_scores_and_edges(spark):
    """Model-based quality gate: exact milli-unit scores against a
    hand-built weight table, unseen buckets weigh 0, a token-less doc
    scores the intercept with n_tokens=0 and NULL mean, and the weight
    table is pluggable (the production contract — hashed_stub_weights
    is just the oracle-friendly stand-in)."""
    from vexere_lakehouse_pipeline_spark.operators.sampling import hash_bucket

    docs = spark.createDataFrame(
        [(1, "aaa bbb aaa"), (2, "ccc"), (3, "")],
        "doc_id long, text string",
    )
    k = 8
    # find the actual buckets the tokens hash into, then weight them
    b = {
        r["t"]: r["b"]
        for r in spark.createDataFrame(
            [("aaa",), ("bbb",), ("ccc",)], "t string"
        ).select("t", (hash_bucket("t", "qclf") % k).alias("b")).collect()
    }
    weights = spark.createDataFrame(
        [(int(b["aaa"]), 500), (int(b["bbb"]), -2000)],
        "bucket int, w_milli long",
    )
    out = {
        r["doc_id"]: r
        for r in quality.linear_text_classifier(
            docs, weights, n_buckets=k, intercept_milli=100
        ).collect()
    }
    if b["aaa"] != b["bbb"]:  # no hash collision in this fixture
        assert out[1]["score_milli"] == 2 * 500 - 2000 + 100  # -900
        assert out[1]["is_high_quality"] is False
        # DIV truncates toward zero: -1000 DIV 3 = -333, not floor -334
        assert out[1]["mean_w_milli"] == -333
    assert out[1]["n_tokens"] == 3
    # 'ccc' bucket has no weight row -> 0 (+ intercept)
    if b["ccc"] not in (b["aaa"], b["bbb"]):
        assert out[2]["score_milli"] == 100
        assert out[2]["is_high_quality"] is True
    # token-less doc: intercept score, zero tokens, NULL mean
    assert out[3]["n_tokens"] == 0
    assert out[3]["score_milli"] == 100
    assert out[3]["mean_w_milli"] is None
    assert out[3]["is_high_quality"] is True


def test_purged_time_split_embargo_gap(spark):
    """Purged/embargoed temporal split: no train event may sit within
    the embargo of any test event — max(train ts) < t_split and
    min(test ts) >= t_split + embargo, so the train→test gap is at
    least the embargo width (the leakage the purge exists to stop)."""
    from vexere_lakehouse_pipeline_spark.plans.star_ext import (
        _EMBARGO_US,
        events_purged_time_split,
    )

    out = events_purged_time_split(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["split"], []).append(r["ts_us"])
    assert set(by) == {"train", "purged", "test"}  # all classes present
    assert max(by["train"]) + _EMBARGO_US <= min(by["test"])
    for t in by["purged"]:
        assert max(by["train"]) < t + 1 and t < min(by["test"])
