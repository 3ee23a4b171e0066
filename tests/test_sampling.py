"""Deterministic-sampling properties (operators/sampling.py).

The load-bearing guarantee is *stability*: the kept set is a pure
function of the key, so repartitioning, retries, or a different engine
must not change it — exactly what rand()-based df.sample does NOT
guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import sampling

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_stable_under_repartition(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in sampling.hash_sample(docs.repartition(17), "doc_id", 0.3).collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_fraction_roughly_holds(spark):
    docs = _docs(spark)
    n = docs.count()
    kept = sampling.hash_sample(docs, "doc_id", 0.5).count()
    assert 0.35 * n < kept < 0.65 * n  # md5 uniformity, small-n tolerance


def test_split_column_partitions_exactly(spark):
    docs = _docs(spark)
    assigned = docs.withColumn(
        "split", sampling.split_column("doc_id", {"train": 0.9, "valid": 0.05, "test": 0.05})
    )
    counts = {r.split: r.n for r in assigned.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "valid", "test"}
    assert sum(counts.values()) == docs.count()  # total partition, no loss
    assert counts.get("train", 0) > counts.get("valid", 0)
    # different salts decorrelate: split assignment is independent of a
    # sampling decision on the same key
    sampled = sampling.hash_sample(assigned, "doc_id", 0.5, salt="other")
    got = {r.split for r in sampled.select("split").distinct().collect()}
    assert "train" in got


def test_stratified_fractions_per_stratum(spark):
    docs = _docs(spark)
    kept = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.25}, default=1.0
    )
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in before.items():
        if lang == "en":
            assert after.get(lang, 0) < 0.55 * n
        else:
            assert after.get(lang) == n  # tail untouched


def test_weighted_mixture_tags_and_rates(spark):
    docs = _docs(spark)
    curated = docs.filter(F.col("source") == "src0")
    web = docs.filter(F.col("source") != "src0")
    mixed = sampling.weighted_mixture(
        {"curated": (curated, 1.0), "web": (web, 0.25)}, key="doc_id"
    )
    counts = {r.mix_source: r.n for r in mixed.groupBy("mix_source").agg(F.count("*").alias("n")).collect()}
    assert counts["curated"] == curated.count()  # rate 1.0 keeps all
    assert 0 < counts["web"] < 0.6 * web.count()
    # idempotent: same mixture twice -> same rows
    again = sampling.weighted_mixture(
        {"curated": (curated, 1.0), "web": (web, 0.25)}, key="doc_id"
    )
    assert again.count() == mixed.count()


def test_no_shuffle_in_hash_sample_plan(spark):
    docs = _docs(spark)
    plan = sampling.hash_sample(docs, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter


def test_weighted_mixture_oversamples_with_epochs(spark):
    docs = _docs(spark)
    n = docs.count()
    mixed = sampling.weighted_mixture({"d": (docs, 2.25)}, key="doc_id")
    total = mixed.count()
    assert 2 * n < total < 2.5 * n  # two full epochs + ~25%
    epochs = {r.epoch for r in mixed.select("epoch").distinct().collect()}
    assert epochs == {0, 1, 2}
    # full epochs are complete copies
    assert mixed.filter(F.col("epoch") == 1).count() == n


def test_hash_sample_fractions_are_nested(spark):
    """sample(f1) ⊆ sample(f2) for f1 < f2 under the same salt — the
    bucket-threshold construction makes samples MONOTONE, so growing a
    sample never churns previously selected rows (critical when a
    training set is later enlarged)."""
    docs = _docs(spark)
    small = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.2).collect()}
    large = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.6).collect()}
    assert small <= large
    assert len(small) < len(large)


def test_weighted_mixture_rejects_empty_config(spark):
    import pytest

    docs = _docs(spark)
    with pytest.raises(ValueError, match="no source contributes"):
        sampling.weighted_mixture({"x": (docs, 0.0)}, key="doc_id")


def test_weighted_hash_sample_proportional_and_deterministic(spark):
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.operators import sampling

    # 20k rows, weight 1 vs weight 10: keep rate must scale ~10x
    df = spark.range(20000).withColumn(
        "w", F.when(F.col("id") % 2 == 0, 1).otherwise(10)
    )
    kept = sampling.weighted_hash_sample(
        df, key="id", weight="w", max_weight=10, rate_num=1, rate_den=2
    )
    rates = {
        r["w"]: r["n"]
        for r in kept.groupBy("w").agg(F.count("*").alias("n")).collect()
    }
    # expected: w=10 -> 50% of 10k = 5000; w=1 -> 5% of 10k = 500
    assert abs(rates[10] - 5000) < 300
    assert abs(rates[1] - 500) < 100
    # deterministic: same call keeps the identical id set
    ids1 = {r["id"] for r in kept.collect()}
    ids2 = {
        r["id"]
        for r in sampling.weighted_hash_sample(
            df, key="id", weight="w", max_weight=10, rate_num=1, rate_den=2
        ).collect()
    }
    assert ids1 == ids2


def test_split_leakage_flags_cross_split_neardups(spark):
    """Crafted (non-vacuous) leakage: doc_ids hash-probed to known
    splits (md5 'split:<id>' buckets: 0->train, 10->test, 91->valid),
    with identical texts planted across splits."""
    from vexere_lakehouse_pipeline_spark.plans.corpus import split_leakage

    dup = "the quick brown fox jumps over the lazy dog again today now"
    other = "wholly unrelated content lives in this document entirely alone"
    docs = spark.createDataFrame(
        [(0, dup), (10, dup), (91, other), (1, other + " extra")],
        "doc_id long, text string",
    )
    rows = split_leakage(docs).collect()
    got = {(r["doc_a"], r["doc_b"]): (r["split_a"], r["split_b"]) for r in rows}
    # the planted train/test duplicate MUST be flagged
    assert got.get((0, 10)) == ("train", "test")
    # every emitted pair crosses splits at >= the threshold
    for r in rows:
        assert r["split_a"] != r["split_b"]
        assert r["jaccard"] >= 0.5
    # near-dups 91/1 cross valid/train: flagged iff above threshold;
    # the unrelated pair (0, 91) must NOT appear
    assert (0, 91) not in got and (10, 91) not in got


def test_split_leakage_ignores_same_split_duplicates(spark):
    from vexere_lakehouse_pipeline_spark.plans.corpus import split_leakage

    dup = "identical text sits in two train documents safely here now"
    # 0, 1, 2 all hash to train -> duplicates within one split are NOT
    # leakage and must not be flagged
    docs = spark.createDataFrame(
        [(0, dup), (1, dup), (2, dup)], "doc_id long, text string"
    )
    assert split_leakage(docs).count() == 0


def test_oov_rate_bounds_and_vocab_coverage(spark):
    from vexere_lakehouse_pipeline_spark.plans.corpus import QUERIES

    out = QUERIES["corpus_oov_rate"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["oov_permille"] <= 1000
    # with a tiny shared vocab, top-20 must cover a nontrivial share:
    # the corpus-wide OOV occurrence share is strictly below 100%
    tot = sum(r["n_tokens"] for r in out)
    oov = sum(r["n_oov"] for r in out)
    assert oov < tot
