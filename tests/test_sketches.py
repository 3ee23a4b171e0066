"""Unit contracts for the mergeable sketches (operators/sketches.py).

Cross-engine value parity for the two gate queries lives in
tests/test_star_oracle.py (sketch_gates is in its module list); here
we pin the operator-level guarantees the gates rely on:

* CMS one-sided error: estimate >= exact for EVERY key, always.
* CMS mergeability: shard sketches summed cell-wise equal the sketch
  of the union (the 100 TB rollup property).
* Bloom: no false negatives for any member; mergeability by bit_or.
* Empty-input robustness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import sketches

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa",
]


def _items(spark, counts: dict[str, int]):
    rows = [(w,) for w, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "token string")


def test_cms_estimate_ge_exact_for_every_key(spark):
    counts = {w: (i + 1) * 3 for i, w in enumerate(WORDS)}
    items = _items(spark, counts)
    # width=16 forces collisions among 10 keys -> overcounts happen,
    # the one-sided guarantee must still hold
    cms = sketches.cms_build(items, "token", depth=3, width=16)
    probes = spark.createDataFrame([(w,) for w in counts], "token string")
    est = {
        r["token"]: r["cms_est"]
        for r in sketches.cms_lookup(
            cms, probes, "token", depth=3, width=16
        ).collect()
    }
    for w, c in counts.items():
        assert est[w] >= c, (w, est[w], c)


def test_cms_shard_merge_equals_union(spark):
    a = _items(spark, {w: i + 1 for i, w in enumerate(WORDS[:6])})
    b = _items(spark, {w: 2 * i + 1 for i, w in enumerate(WORDS[3:])})
    merged = (
        sketches.cms_build(a, "token", 3, 64)
        .unionByName(sketches.cms_build(b, "token", 3, 64))
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("cms_count").cast("long").alias("cms_count"))
    )
    union = sketches.cms_build(a.unionByName(b), "token", 3, 64)
    got = {
        (r["cms_row"], r["cms_bucket"]): r["cms_count"]
        for r in merged.collect()
    }
    want = {
        (r["cms_row"], r["cms_bucket"]): r["cms_count"]
        for r in union.collect()
    }
    assert got == want


def test_bloom_no_false_negatives_and_merge(spark):
    members = spark.createDataFrame(
        [(w,) for w in WORDS], "key string"
    )
    bloom = sketches.bloom_build(members, "key", n_words=8, k=3)
    probed = sketches.bloom_probe(
        bloom,
        spark.createDataFrame(
            [(w,) for w in WORDS + ["nope1", "nope2"]], "key string"
        ),
        "key",
        n_words=8,
        k=3,
    )
    hits = {r["key"]: r["bloom_hit"] for r in probed.collect()}
    for w in WORDS:
        assert hits[w] is True, w
    # merge: per-shard blooms OR-ed word-wise == bloom of the union
    s1 = sketches.bloom_build(members.limit(5), "key", n_words=8, k=3)
    s2 = sketches.bloom_build(
        members.subtract(members.limit(5)), "key", n_words=8, k=3
    )
    merged = {
        r["bloom_word_idx"]: r["bloom_word"]
        for r in s1.unionByName(s2)
        .groupBy("bloom_word_idx")
        .agg(F.bit_or("bloom_word").alias("bloom_word"))
        .collect()
    }
    whole = {
        r["bloom_word_idx"]: r["bloom_word"] for r in bloom.collect()
    }
    assert merged == whole


def test_sketches_empty_inputs(spark):
    empty = spark.createDataFrame([], "token string")
    assert sketches.cms_build(empty, "token").count() == 0
    assert sketches.bloom_build(empty, "token").count() == 0
    # probe against an empty bloom: nothing is a member
    probe = spark.createDataFrame([("x",)], "token string")
    out = sketches.bloom_probe(
        sketches.bloom_build(empty, "token"), probe, "token"
    ).collect()
    assert [r["bloom_hit"] for r in out] == [False]
    # lookup against an empty sketch: estimate 0
    got = sketches.cms_lookup(
        sketches.cms_build(empty, "token"), probe, "token"
    ).collect()
    assert [r["cms_est"] for r in got] == [0]


def test_bloom_semi_join_equals_exact(spark):
    fact = spark.createDataFrame(
        [(i % 40, f"r{i}") for i in range(400)] + [(7, "dup")] * 3,
        "k long, payload string",
    )
    dim = spark.createDataFrame(
        [(i,) for i in range(0, 40, 3)], "k long"
    )
    got = sketches.bloom_semi_join(fact, dim, "k", "k", n_words=8, k=3)
    want = fact.join(dim, on="k", how="left_semi")
    # exact multiset equality, duplicates included
    g = sorted((r["k"], r["payload"]) for r in got.collect())
    w = sorted((r["k"], r["payload"]) for r in want.collect())
    assert g == w
    assert len(g) > 0


def test_bloom_probe_rowwise_matches_grouped(spark):
    df = spark.createDataFrame([(w,) for w in WORDS * 2], "key string")
    members = spark.createDataFrame([(w,) for w in WORDS[:4]], "key string")
    bloom = sketches.bloom_build(members, "key", n_words=8, k=3)
    grouped = {
        r["key"]: r["bloom_hit"]
        for r in sketches.bloom_probe(
            bloom, df.distinct(), "key", n_words=8, k=3
        ).collect()
    }
    rowwise = sketches.bloom_probe_rowwise(
        bloom, df, "key", n_words=8, k=3
    ).collect()
    assert len(rowwise) == 20  # duplicates preserved
    for r in rowwise:
        assert r["bloom_hit"] == grouped[r["key"]]


def test_kmv_two_phase_equals_direct_bottom_m(spark):
    import random

    from pyspark.sql import Window

    random.seed(7)
    rows = [(f"g{i%3}", f"user{random.randrange(500)}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, u string")
    sk = sketches.kmv_sketch(df, "u", ["g"], m=32)
    got = {
        (r["g"], r["kmv_h"]) for r in sk.collect()
    }
    # direct: one window over all distinct hashes per group
    direct = (
        df.select("g", sketches.kmv_hash("u").alias("h"))
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("h"))
        )
        .filter(F.col("rn") <= 32)
    )
    want = {(r["g"], r["h"]) for r in direct.collect()}
    assert got == want
    # merge = union-then-keep-m-smallest is a valid KMV of the union
    merged = (
        sk.filter(F.col("g").isin("g0", "g1"))
        .select("kmv_h")
        .distinct()
        .withColumn("rn", F.row_number().over(
            Window.orderBy("kmv_h")))
        .filter(F.col("rn") <= 32)
    )
    union_direct = (
        df.filter(F.col("g").isin("g0", "g1"))
        .select(sketches.kmv_hash("u").alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= 32)
    )
    assert {r["kmv_h"] for r in merged.collect()} == {
        r["h"] for r in union_direct.collect()
    }
