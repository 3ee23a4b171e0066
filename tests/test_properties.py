"""Property-based tests (SURVEY.md §5.4): normalizer idempotence,
parser round-trips, merge idempotence.

Hypothesis generates the inputs; each property is evaluated through a
single Spark job per test (inputs batched into one DataFrame) to keep
runtime sane.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.functions.cleaning import (
    normalize_place,
    parse_duration_hours,
    parse_price_vnd,
)
from vexere_lakehouse_pipeline_spark.operators.incremental import merge_append

# Text alphabet biased toward the normalizer's interesting inputs:
# Vietnamese diacritics, the abbreviations it expands, punctuation.
_VI_TEXT = st.lists(
    st.one_of(
        st.text(
            alphabet=st.sampled_from(
                list("abcdefghijklmnopqrstuvwxyz0123456789 .,-/()#")
                + list("àáảãạăằắẳẵặâầấẩẫậđèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợ")
            ),
            min_size=0,
            max_size=12,
        ),
        # the abbreviations the normalizer expands
        st.sampled_from(["q1", "tp", "bx", "sg", "hcm", "ql 1a", "tt", "kcn"]),
    ),
    min_size=0,
    max_size=6,
).map(" ".join)


def _run_column(spark, values: list[str | None], col_expr) -> list:
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["y"] for r in df.select(col_expr("x").alias("y")).collect()]


@settings(max_examples=10, deadline=None)
@given(st.lists(_VI_TEXT, min_size=1, max_size=150))
def test_normalizer_idempotent(spark, texts):
    """f(f(x)) == f(x) — except through the reference's own
    non-idempotent duplicate-collapse fixup ('sài gòn sài gòn' →
    'sài gòn', to_silver.py:46), which we reproduce faithfully: an
    input like 'sg  sg' expands on pass 1 and only collapses on pass 2
    because whitespace collapse runs after the fixups."""
    once = _run_column(spark, texts, normalize_place)
    twice = _run_column(spark, once, normalize_place)
    for a, b in zip(once, twice):
        if "sài gòn sài gòn" in a:
            continue  # the documented non-idempotent corner
        assert b == a, (a, b)


def test_normalizer_duplicate_collapse_corner(spark):
    """Pin the reference-faithful non-idempotent corner explicitly."""
    once = _run_column(spark, ["sg  sg"], normalize_place)
    assert once == ["sài gòn sài gòn"]  # pass 1: expand, collapse spaces
    twice = _run_column(spark, once, normalize_place)
    assert twice == ["sài gòn"]  # pass 2: the to_silver.py:46 fixup fires


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 59)),
        min_size=1,
        max_size=150,
    )
)
def test_duration_parser_round_trip(spark, pairs):
    """format(h,m) -> parse == h + m/60 (2dp) for every h/m."""
    raw = [f"{h}h{m}m" for h, m in pairs]
    got = _run_column(spark, raw, parse_duration_hours)
    want = [round(h + m / 60, 2) for h, m in pairs]
    assert [round(g, 2) for g in got] == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 10_000_000), min_size=1, max_size=150))
def test_price_parser_round_trip(spark, prices):
    """Thousands-formatted VND strings parse back to the integer."""
    raw = [f"{p:,}đ".replace(",", ".") for p in prices]
    got = _run_column(spark, raw, parse_price_vnd)
    assert got == prices


def test_price_parser_garbage_is_null(spark):
    got = _run_column(spark, ["", "abc", None, "đ"], parse_price_vnd)
    assert got == [None, None, None, None]


def test_merge_twice_equals_merge_once(spark, tmp_path):
    """Replaying the same batch through merge_append changes nothing
    (the idempotency the reference's blind append lacks, SURVEY §2.9)."""
    path = str(tmp_path / "t")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    merge_append(batch, path, merge_keys=["k"])
    once = sorted(map(tuple, spark.read.parquet(path).collect()))
    merge_append(batch, path, merge_keys=["k"])
    twice = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert twice == once
    # and a genuinely new key still lands
    merge_append(
        spark.createDataFrame([(4, "d")], "k long, v string"),
        path,
        merge_keys=["k"],
    )
    assert spark.read.parquet(path).count() == 4


def test_null_text_yields_no_shingles_and_null_fingerprint(spark):
    """Engine-parity contract: NULL text must behave like the SQL
    oracles (no shingles -> no dedup pairs; fingerprint NULL) instead
    of collapsing every null-text doc into one duplicate cluster."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.functions.text import (
        document_fingerprint,
        word_shingles,
    )

    df = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    out = df.select(
        "doc_id",
        F.size(word_shingles("text", 2)).alias("n_sh"),
        document_fingerprint("text", 2).alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1]["n_sh"] == 0 and by_id[1]["fp"] is None
    assert by_id[2]["n_sh"] > 0 and by_id[2]["fp"] is not None


def test_null_embedding_gets_null_lsh_bucket(spark):
    import pyspark.sql.types as T

    from vexere_lakehouse_pipeline_spark.functions.vectors import sign_lsh_bucket

    df = spark.createDataFrame(
        [(1, [1.0, -1.0]), (2, None)],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    ).select("id", sign_lsh_bucket("embedding", 2).alias("b"))
    got = {r.id: r.b for r in df.collect()}
    assert got[1] == "10" and got[2] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000_000), st.integers(1, 100_000)),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_sample_monotone_in_weight(spark, rows):
    """Raising ONLY the weight can never evict a kept row: the keep
    predicate bucket·den·maxw < B·num·w is monotone in w (with maxw
    held fixed).  Also: weight == maxw at rate 1/1 keeps every row."""
    from vexere_lakehouse_pipeline_spark.operators import sampling

    maxw = max(w for _, w in rows)
    df = spark.createDataFrame(rows, "id long, w long")
    kept_lo = {
        r["id"]
        for r in sampling.weighted_hash_sample(
            df, "id", "w", maxw, rate_num=1, rate_den=2
        ).collect()
    }
    bumped = df.withColumn(
        "w", F.least(F.col("w") * 2, F.lit(maxw).cast("long"))
    )
    kept_hi = {
        r["id"]
        for r in sampling.weighted_hash_sample(
            bumped, "id", "w", maxw, rate_num=1, rate_den=2
        ).collect()
    }
    assert kept_lo <= kept_hi
    full = spark.createDataFrame([(i, maxw) for i, _ in rows], "id long, w long")
    assert sampling.weighted_hash_sample(
        full, "id", "w", maxw, rate_num=1, rate_den=1
    ).count() == len(rows)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=40),
        min_size=1,
        max_size=30,
    )
)
def test_simhash_width_bound_and_determinism(spark, texts):
    """Signatures fit the declared width and are input-deterministic."""
    from vexere_lakehouse_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sig1 = {r["doc_id"]: r["simhash"] for r in dedup.simhash_sig(docs, bits=20).collect()}
    sig2 = {r["doc_id"]: r["simhash"] for r in dedup.simhash_sig(docs, bits=20).collect()}
    assert sig1 == sig2
    assert all(0 <= s < 2 ** 20 for s in sig1.values())


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=1,
                   max_size=6),
    cap=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=8, deadline=None)
def test_split_hot_buckets_partition_properties(spark, sizes, cap):
    """_split_hot_buckets is a PARTITION of its input for any bucket
    sizes and cap: no row lost or duplicated, sub ids live in
    [0, ceil(n/cap)), sub-cap buckets keep sub 0, and the assignment
    is deterministic (pure hash of the id)."""
    from vexere_lakehouse_pipeline_spark.operators import dedup

    rows = []
    next_id = 0
    for b, n in enumerate(sizes):
        for _ in range(n):
            rows.append((next_id, 0, f"k{b}"))
            next_id += 1
    bands = spark.createDataFrame(
        rows, "doc_id long, band int, band_key string"
    )
    out = dedup._split_hot_buckets(bands, cap).collect()
    assert len(out) == len(rows)                       # no loss/dup
    assert {r["doc_id"] for r in out} == {r[0] for r in rows}
    by_bucket: dict[str, list] = {}
    for r in out:
        by_bucket.setdefault(r["band_key"], []).append(r["_sub"])
    for b, n in enumerate(sizes):
        subs = by_bucket[f"k{b}"]
        n_splits = -(-n // cap)
        assert all(0 <= s < n_splits for s in subs)
        if n <= cap:
            assert set(subs) == {0}
    # determinism: a second invocation assigns identically
    again = {
        r["doc_id"]: r["_sub"]
        for r in dedup._split_hot_buckets(bands, cap).collect()
    }
    assert again == {r["doc_id"]: r["_sub"] for r in out}


# ---------------------------------------------------------------------------
# Pair-engine bit-identity fuzz: the order-exact Arrow kernel must
# equal the JVM fold EXACTLY (pairs AND cos_sim doubles) on arbitrary
# inputs — random magnitudes (incl. huge/tiny values), duplicate and
# NULL ids, NULL blocks, NULL/zero/ragged vectors, random thresholds.
# The crafted-edge test pins known corners; this pins the ones nobody
# crafted.
# ---------------------------------------------------------------------------
_VEC = st.one_of(
    st.none(),
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False, width=64,
        ),
        min_size=2,
        max_size=6,
    ),
)
_ROW = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=12)),  # id (dups!)
    st.one_of(st.none(), st.sampled_from(["a", "b"])),             # block
    _VEC,
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(_ROW, min_size=2, max_size=25),
    st.sampled_from([0.0, 0.3, 0.9, -0.5]),
)
def test_pair_engines_bit_identical_fuzz(spark, rows, threshold):
    from vexere_lakehouse_pipeline_spark.operators import dedup

    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    jvm = sorted(
        map(tuple, dedup.embedding_neardup_pairs(
            emb, threshold=threshold, engine="jvm").collect())
    )
    arrow = sorted(
        map(tuple, dedup.embedding_neardup_pairs(
            emb, threshold=threshold, engine="arrow").collect())
    )
    assert arrow == jvm
