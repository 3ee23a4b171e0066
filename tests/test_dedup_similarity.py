"""Semantic unit tests for dedup / similarity operators on crafted
inputs (the oracle tests in test_star_oracle.py check engine parity;
these check the algorithms do the right thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import dedup, similarity


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_duplicate_groups(spark):
    docs = _docs(spark, ["a b c", "a b c", "x y z"])
    got = {
        r["canonical_id"]: r["n_docs"]
        for r in dedup.exact_duplicate_groups(docs).collect()
    }
    assert got == {0: 2, 2: 1}


def test_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    other = "completely different words about spark catalyst optimizer plans"
    docs = _docs(spark, [base, near, other])
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(docs).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_jaccard_values(spark):
    # 0.8-sim pair: high enough that the deterministic md5 banding
    # reliably emits it as a candidate (a 0.6-sim pair sits below the
    # band threshold and is CORRECTLY pruned by LSH)
    docs = _docs(
        spark,
        ["a b c d e f g h i j", "a b c d e f g h i j", "a b c d e f g h i x"],
    )
    j = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs).collect()
    }
    assert j.get((0, 1)) == 1.0  # identical docs
    assert j.get((0, 2)) == 0.8  # 8 shared of 10 distinct bigrams


def test_simhash_close_for_near_dups(spark):
    base = "spark sql catalyst tungsten shuffle partition broadcast join " * 4
    near = base + "extra"
    other = "völlig andere wörter über etwas ganz anderes hier jetzt " * 4
    docs = _docs(spark, [base, near, other])
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash16(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[0], sigs[1]) <= 4
    assert ham(sigs[0], sigs[2]) > ham(sigs[0], sigs[1])


def test_topk_bruteforce_finds_identical_vector(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # identical to 0
        (2, [0.9, 0.1, 0.0, 0.0]),   # close
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.topk_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=3
    ).collect()
    ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2, 3]
    by_rank = sorted(out, key=lambda r: r["rank"])  # collect() order is
    # not guaranteed — index the rank-sorted list
    assert by_rank[0]["cos_sim"] == 1.0


def test_topk_arrow_matches_column_fold(spark):
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import similarity
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    fold = similarity.topk_bruteforce(emb, q, k=5)
    arrow = similarity.topk_bruteforce_arrow(emb, q, k=5)
    a = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in fold.collect())
    b = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in arrow.collect())
    assert a == b


def test_arrow_topk_handles_zero_vectors_like_fold_path(spark):
    import pyspark.sql.types as T

    from vexere_lakehouse_pipeline_spark.operators import similarity

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]), (4, [0.5, 0.5])],
        schema,
    )
    queries = cands.filter("vec_id = 1")
    fold = similarity.topk_bruteforce(cands, queries, k=2)
    arrow = similarity.topk_bruteforce_arrow(cands, queries, k=2)
    f = [(r.vec_id, r.rank) for r in fold.orderBy("rank").collect()]
    a = [(r.vec_id, r.rank) for r in arrow.orderBy("rank").collect()]
    assert a == f
    assert 3 not in {v for v, _ in a}  # zero vector never ranks


def test_ivf_default_quantizer_survives_offset_ids(spark):
    import pyspark.sql.types as T
    from pyspark.sql import functions as F2

    from vexere_lakehouse_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    shifted = emb.withColumn("vec_id", F2.col("vec_id") + 10_000)
    out = similarity.topk_ivf(
        shifted, shifted.filter(F2.col("vec_id") < 10_005), k=3, n_centroids=8
    )
    assert out.count() > 0  # id-offset spaces must not empty the index


def test_topk_paths_agree_on_null_and_zero_vectors(spark):
    import pyspark.sql.types as T

    from vexere_lakehouse_pipeline_spark.operators import similarity

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0]), (4, [0.5, 0.5])],
        schema,
    )
    queries = cands.filter("vec_id = 1")
    fold = {(r.vec_id, r.rank) for r in similarity.topk_bruteforce(cands, queries, k=3).collect()}
    arrow = {(r.vec_id, r.rank) for r in similarity.topk_bruteforce_arrow(cands, queries, k=3).collect()}
    assert fold == arrow
    assert {v for v, _ in fold} == {4}  # null/zero vectors never rank
    # unscoreable QUERY -> no rows on either path
    zq = cands.filter("vec_id = 3")
    assert similarity.topk_bruteforce(cands, zq, k=3).count() == 0
    assert similarity.topk_bruteforce_arrow(cands, zq, k=3).count() == 0


def test_lsh_hot_bucket_split_bounds_degenerate_corpus(spark):
    """VERDICT r1 scale risk + r2 defect #2: a boilerplate corpus
    (thousands of identical docs) puts everything in one band bucket.
    Oversized buckets are hash-SPLIT into ceil(n/cap) sub-buckets:
    work drops from quadratic to ~n*cap/2 pairs, hot-bucket candidates
    are STILL FOUND (the old drop policy emitted none), and the
    oversized-bucket census is reported via stats."""
    import time

    boiler = ["the same boilerplate footer text appears in every document"] * 3000
    base = "a genuinely unique sentence about catalyst optimizer internals"
    near = base.replace("internals", "details")
    docs = _docs(spark, boiler + [base, near])
    stats: dict = {}
    t0 = time.monotonic()
    pairs = dedup.lsh_candidate_pairs(docs, stats=stats)
    # the genuine near-dup outside the hot bucket is still found
    assert pairs.filter("doc_a = 3000 AND doc_b = 3001").count() == 1
    n_split = pairs.count()
    elapsed = time.monotonic() - t0
    # recall inside the hot bucket is partial but NON-ZERO (drop gave 0)
    assert pairs.filter("doc_a < 3000 AND doc_b < 3000").count() > 100_000
    # ... and bounded well below the quadratic 3000*2999/2 ~ 4.5M:
    # 3 sub-buckets of ~1000 give ~3*C(1000,2) ~ 1.5M
    assert n_split < 2_500_000
    assert elapsed < 120
    # no-silent-caps: the census names the hot buckets and their splits
    census = stats["oversized_buckets"].collect()
    assert census and all(r["bucket_size"] == 3000 for r in census)
    assert all(r["n_splits"] == 3 for r in census)
    # cap disabled -> the quadratic blowup is really there (guards the
    # test against vacuously passing if banding ever changes)
    n_uncapped = dedup.lsh_candidate_pairs(
        docs, max_bucket_size=None
    ).count()
    assert n_uncapped > 4_000_000


def test_sub_split_assignment_matches_duckdb(spark):
    """The sub-bucket hash must be IDENTICAL across engines — it is
    part of the oracle contract whenever a gate corpus has hot buckets
    (the sf0.01 gate has none, so this pins the cross-engine parity
    the gate can't see)."""
    import duckdb

    from vexere_lakehouse_pipeline_spark.operators import sampling
    from vexere_lakehouse_pipeline_spark.plans.star_ml import _duck_sub_split

    cap = 10
    n = 95  # one bucket of 95 -> n_splits = 10
    bands = spark.createDataFrame(
        [(i, 0, "k") for i in range(n)], "doc_id long, band int, band_key string"
    )
    out = dedup._split_hot_buckets(bands, cap)
    got = {r["doc_id"]: r["_sub"] for r in out.collect()}
    duck = duckdb.sql(
        "WITH ids AS (SELECT unnest(range(0, 95)) AS doc_id), "
        "b AS (SELECT doc_id, COUNT(*) OVER () AS bn FROM ids) "
        f"SELECT doc_id, {_duck_sub_split('doc_id', 'bn', cap)} AS sub FROM b"
    ).fetchall()
    want = {int(d): int(s) for d, s in duck}
    assert got == want
    assert set(got.values()) == set(range(10))  # all sub-buckets used
    # sub-cap bucket -> everyone in sub 0 (both engines' CASE arm)
    small = spark.createDataFrame(
        [(i, 0, "k") for i in range(cap)], "doc_id long, band int, band_key string"
    )
    assert {
        r["_sub"] for r in dedup._split_hot_buckets(small, cap).collect()
    } == {0}


def test_arrow_topk_refuses_oversized_query_set(spark, monkeypatch):
    """The documented small-|Q| contract is enforced in code: the query
    set is driver-collected + broadcast, so an unbounded one must be
    refused, and the guard must not collect more than MAX+1 rows to
    decide."""
    import pytest

    from vexere_lakehouse_pipeline_spark.operators import similarity

    monkeypatch.setattr(similarity, "MAX_ARROW_QUERIES", 10)
    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.col("id").cast("double")).alias("embedding"),
    )
    with pytest.raises(ValueError, match="exceeds 10"):
        similarity.topk_bruteforce_arrow(emb, emb, k=3)
    # under the cap the path still works
    out = similarity.topk_bruteforce_arrow(emb, emb.limit(5), k=3)
    assert out.count() == 15


def test_simhash_near_pairs_banding(spark):
    # exact dup pair -> hamming 0, must be emitted; unrelated doc sits
    # far in hamming space and must not pair with either copy
    base = "spark sql catalyst tungsten shuffle partition broadcast join " * 6
    other = "völlig andere wörter über etwas ganz anderes hier jetzt " * 6
    docs = _docs(spark, [base, base, other])
    rows = dedup.simhash_near_pairs(docs).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_sig(docs, bits=dedup.SIMHASH_BITS).collect()
    }
    assert bin(sigs[0] ^ sigs[2]).count("1") > 3  # exclusion is correct


def test_simhash_near_pairs_exact_recall_vs_bruteforce(spark):
    # pigeonhole guarantee: banding misses NO pair with hamming <= 3
    import itertools

    texts = [f"w{i} common words shared by all docs here " * 3 for i in range(8)]
    texts += [texts[0] + "tail", texts[3] + "tail"]
    docs = _docs(spark, texts)
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_sig(docs, bits=dedup.SIMHASH_BITS).collect()
    }
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_pairs(docs).collect()
    }
    assert got == want


def test_simhash_hot_bucket_split_bounds_degenerate_corpus(spark):
    # 300 identical docs: uncapped banding would emit C(300,2) pairs
    # per band; with the split they are re-blocked into ~6 sub-buckets
    # of ~50, so boiler-boiler pairs ARE found (hamming 0) but the
    # total stays ~n*cap/2, not quadratic
    texts = ["identical boilerplate body repeated everywhere " * 4] * 300
    texts += [f"unique doc {i} with its own words entirely " * 3 for i in range(5)]
    docs = _docs(spark, texts)
    stats: dict = {}
    capped = dedup.simhash_near_pairs(docs, max_bucket_size=50, stats=stats)
    got = capped.collect()
    boiler = [r for r in got if r["doc_a"] < 300 and r["doc_b"] < 300]
    # recall recovered: sub-bucket mates pair at hamming 0...
    assert len(boiler) > 500
    assert all(r["hamming"] == 0 for r in boiler)
    # ...but bounded: ~6 sub-buckets of ~50 -> ~6*C(50,2)=7350, far
    # under the quadratic C(300,2)=44850 (hash unevenness allowed for)
    assert len(boiler) < 20_000
    # unique docs never pair with the boilerplate mass
    assert not [r for r in got if (r["doc_a"] >= 300) != (r["doc_b"] >= 300)]
    # census reported for every hot (band, value) bucket
    census = stats["oversized_buckets"].collect()
    assert census and all(r["bucket_size"] == 300 and r["n_splits"] == 6
                          for r in census)
    # uncapped emits the quadratic set — the split is what bounds it
    uncapped_n = dedup.simhash_near_pairs(docs, max_bucket_size=None).count()
    assert uncapped_n >= 300 * 299 // 2


def test_embedding_prefilter_equivalence(spark):
    """The int8 two-pass verify (prefilter=True) must be bit-identical
    to the one-pass float plan — the margin provably covers the
    quantization error, including boundary-adversarial vectors and a
    zero-norm row (excluded by BOTH plans)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, f"b{i % 5}", [rng.uniform(-1, 1) for _ in range(16)])
        for i in range(120)
    ]
    rows.append((120, "b0", [0.0] * 16))  # zero-norm: null cosine
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    for thr in (0.3, 0.0, 0.7):
        two_pass = dedup.embedding_neardup_pairs(
            emb, threshold=thr, prefilter=True
        )
        one_pass = dedup.embedding_neardup_pairs(
            emb, threshold=thr, prefilter=False
        )
        assert sorted(map(tuple, two_pass.collect())) == sorted(
            map(tuple, one_pass.collect())
        )


def test_embedding_block_split_finds_matches(spark):
    """Degenerate SemDeDup input (every vector shares one label):
    the split finds near-dup pairs inside bounded sub-blocks where the
    old drop found nothing, and semantic_dedup_survivors dedups to
    ~one survivor per sub-block instead of all-singletons."""
    n, cap = 400, 100
    emb = spark.createDataFrame(
        [(i, "same", [1.0, 2.0, 3.0]) for i in range(n)],
        "vec_id long, label string, embedding array<double>",
    )
    stats: dict = {}
    pairs = dedup.embedding_neardup_pairs(
        emb, threshold=0.99, max_block_size=cap, stats=stats
    )
    n_pairs = pairs.count()
    assert n_pairs > 0  # drop policy produced 0 here
    # bounded: 4 sub-blocks of ~100 -> ~4*C(100,2) ~ 19800 << C(400,2)
    assert n_pairs < 40_000
    census = stats["oversized_blocks"].collect()
    assert [(r["block"], r["bucket_size"], r["n_splits"]) for r in census] == [
        ("same", n, 4)
    ]
    surv = dedup.semantic_dedup_survivors(
        emb, threshold=0.99, max_block_size=cap
    )
    n_surv = surv.filter("is_survivor").count()
    # one survivor per sub-block (identical vectors all pair within a
    # sub-block -> one component each); drop policy left 400 singletons
    assert n_surv == 4


def test_containment_detects_excerpt(spark):
    long_doc = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon")
    excerpt = "alpha beta gamma delta epsilon zeta eta theta"
    other = "wholly different words live here today tomorrow yesterday"
    docs = _docs(spark, [long_doc, excerpt, other])
    got = {
        (r["doc_sub"], r["doc_super"]): r["containment"]
        for r in dedup.containment_pairs(docs, min_containment=0.9).collect()
    }
    # the excerpt is fully contained in the long doc; reverse is not
    assert got.get((1, 0)) == 1.0
    assert (0, 1) not in got
    assert all(0 not in p or 2 not in p for p in got)


def test_containment_finds_small_excerpt_jaccard_lsh_misses(spark):
    """The operator's reason to exist: a small quote inside a much
    longer page has containment 1.0 but Jaccard far below the LSH
    banding threshold — the probe join must surface it even though
    lsh_candidate_pairs does not."""
    words = [f"w{i}" for i in range(400)]
    page = " ".join(words)                      # 399 bigrams
    quote = " ".join(words[100:120])            # 19 bigrams, all in page
    docs = _docs(spark, [page, quote])
    got = {
        (r["doc_sub"], r["doc_super"]): r["containment"]
        for r in dedup.containment_pairs(docs, min_containment=0.9).collect()
    }
    assert got.get((1, 0)) == 1.0               # quote ⊂ page, found
    assert (0, 1) not in got                    # page ⊄ quote
    # negative control: Jaccard ~ 19/399 ≈ 0.05 — the symmetric LSH
    # candidate generator does NOT emit this pair (if it ever starts
    # to, the probe join is redundant and this test should be revisited)
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(docs).collect()
    }
    assert (0, 1) not in lsh


def test_nucleus_vocab_greedy_coverage(spark):
    from vexere_lakehouse_pipeline_spark.plans.corpus_ext import QUERIES

    out = QUERIES["corpus_nucleus_vocab"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "nucleus must keep at least the top token"
    import duckdb

    from vexere_lakehouse_pipeline_spark.functions.text import LANG_TOKEN_SPLIT_RE

    total = duckdb.connect().execute(
        "SELECT SUM(len(list_filter(string_split_regex(lower(text), "
        f"'{LANG_TOKEN_SPLIT_RE}'), x -> x <> ''))) FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    kept = sum(r["n"] for r in rows)
    # greedy exclusive-prefix rule: every kept token entered while
    # coverage was still below the 95% target
    for r in rows:
        assert 20 * r["cum_before"] < 19 * total
    # coverage: kept set reaches the target unless it IS the whole
    # occurrence mass (tiny vocab)
    assert 20 * kept >= 19 * total or kept == total
    # minimality: dropping the last kept token falls below the target
    assert 20 * (kept - rows[-1]["n"]) < 19 * total


def test_zipf_slope_negative_and_median_filter_strict(spark):
    from vexere_lakehouse_pipeline_spark.plans import corpus_ext

    z = corpus_ext.QUERIES["corpus_zipf_fit"](spark, "/root/testdata/sf0.001").collect()[0]
    assert z["slope"] < 0  # frequency falls with rank, always

    kept = corpus_ext.QUERIES["corpus_above_median_quality"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert kept
    for r in kept:
        assert r["n_chars"] > r["lang_median"]


def test_tokenless_texts_are_not_duplicates(spark):
    # '!!!' and '???' tokenize to nothing: they must produce NO
    # shingles (not a shared [''] shingle) and never pair in dedup
    docs = _docs(spark, ["!!!", "???", "", "real words here today"])
    assert dedup.shingle_sets(docs).filter("doc_id <= 2").count() == 0
    assert dedup.ngram_jaccard_pairs(docs).count() == 0
    from vexere_lakehouse_pipeline_spark.functions.text import document_fingerprint

    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", document_fingerprint("text").alias("fp")
        ).collect()
    }
    assert fps[0] is None and fps[1] is None and fps[2] is None
    assert fps[3] is not None


def test_lsh_bucketed_and_ivf_exclude_unscoreable_vectors(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])], schema
    )
    q = cands.filter("vec_id = 1")
    got = similarity.topk_lsh_bucketed(cands, q, k=3).collect()
    assert all(r["cos_sim"] is not None for r in got)
    assert 3 not in {r["vec_id"] for r in got}
    got_ivf = similarity.topk_ivf(cands, q, k=3, n_centroids=1).collect()
    assert all(r["cos_sim"] is not None for r in got_ivf)
    assert 3 not in {r["vec_id"] for r in got_ivf}


def test_train_kmeans_empty_input_raises(spark):
    import pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-empty"):
        similarity.train_kmeans(empty, k=2)


def test_incremental_pairs_vs_stored_band_table_equivalence(spark, tmp_path):
    """The materialized band-key store path must produce EXACTLY the
    pairs the from-text incremental builder does — including under a
    hot-bucket split and for a re-ingested (revised) doc id — while
    never re-reading corpus text."""
    corpus_texts = ["the quick brown fox jumps over the lazy dog today"] * 60
    corpus_texts += [f"corpus doc {i} about catalyst optimizer internals topic {i}"
                     for i in range(10)]
    corpus = _docs(spark, corpus_texts)
    # batch: near-dup of corpus doc 60, a revised version of id 3 (same
    # boilerplate -> lands in the hot bucket), and an unrelated doc
    batch = spark.createDataFrame(
        [
            (60, "corpus doc 0 about catalyst optimizer internals topic 0"),
            (3, "the quick brown fox jumps over the lazy dog today"),
            (999, "entirely unrelated words live in this document here"),
        ],
        "doc_id long, text string",
    )
    store = str(tmp_path / "bands")
    dedup.materialize_band_keys(corpus, store)
    stored = spark.read.parquet(store)
    cap = 20  # boilerplate bucket (60+1 docs) splits 4 ways
    stats_a: dict = {}
    stats_b: dict = {}
    a = {
        (r["doc_new"], r["doc_old"])
        for r in dedup.incremental_pairs_vs_stored(
            batch, stored, max_bucket_size=cap, stats=stats_a
        ).collect()
    }
    b = {
        (r["doc_new"], r["doc_old"])
        for r in dedup.incremental_candidate_pairs(
            batch, corpus, max_bucket_size=cap, stats=stats_b
        ).collect()
    }
    assert a == b
    assert a  # non-vacuous
    # the revised doc still pairs with its stored version: sub-split
    # hashes the ORIGINAL id on both paths
    assert (3, 3) in a
    # both paths report the same oversized-bucket census
    ca = {(r["band"], r["band_key"], r["bucket_size"], r["n_splits"])
          for r in stats_a["oversized_buckets"].collect()}
    cb = {(r["band"], r["band_key"], r["bucket_size"], r["n_splits"])
          for r in stats_b["oversized_buckets"].collect()}
    assert ca == cb and ca
    # append-mode maintenance: adding the batch to the store makes its
    # docs visible to the NEXT ingest
    dedup.materialize_band_keys(batch, store, mode="append")
    stored2 = spark.read.parquet(store)
    nxt = spark.createDataFrame(
        [(1000, "entirely unrelated words live in this document here")],
        "doc_id long, text string",
    )
    nxt_pairs = {
        (r["doc_new"], r["doc_old"])
        for r in dedup.incremental_pairs_vs_stored(nxt, stored2).collect()
    }
    assert (1000, 999) in nxt_pairs


def test_semantic_dedup_auto_scales_k_with_n(spark):
    """The principled SemDeDup scale path: k grows with N so blocks
    stay bounded (empty oversize census = the observable success
    criterion), exact duplicates still collapse to one survivor, and
    distinct directions keep their own survivors."""
    import random

    random.seed(11)
    rows = []
    # 8 well-separated directions x 50 near-copies each
    for g in range(8):
        base = [0.0] * 8
        base[g] = 1.0
        for i in range(50):
            rows.append((g * 100 + i,
                         [x + random.uniform(-0.01, 0.01) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats: dict = {}
    out = dedup.semantic_dedup_auto(
        emb, threshold=0.95, target_block_size=64, max_block_size=256,
        kmeans_iters=4, stats=stats,
    )
    surv = out.filter("is_survivor").count()
    # each direction collapses to ~1 survivor (k-means may split a
    # direction across cluster boundaries -> allow a small excess)
    assert 8 <= surv <= 24
    # scaled k kept every block under the cap: census is EMPTY
    assert stats["oversized_blocks"].count() == 0
    # every vec is assigned to exactly one component
    assert out.count() == 400


def test_embedding_neardup_arrow_matches_jvm_pairs(spark):
    """The Arrow/numpy engine must produce the SAME pair set as the
    oracle-gated JVM fold (values may differ in the last ulp — pair
    membership at a non-boundary threshold must not), including under
    a hot-block split and with zero/NULL vectors excluded."""
    import time

    from vexere_lakehouse_pipeline_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    # add a NULL and a zero vector — both engines must skip them
    extra = spark.createDataFrame(
        [(900001, None, 0), (900002, [0.0] * 64, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    emb = emb.unionByName(extra.withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    ))
    for cap in (2048, 100):  # healthy blocks AND forced splits
        jvm = {
            (r["vec_a"], r["vec_b"])
            for r in dedup.embedding_neardup_pairs(
                emb, threshold=0.3, max_block_size=cap, engine="jvm"
            ).collect()
        }
        arrow = {
            (r["vec_a"], r["vec_b"])
            for r in dedup.embedding_neardup_pairs_arrow(
                emb, threshold=0.3, max_block_size=cap
            ).collect()
        }
        assert arrow == jvm, f"cap={cap}"
        assert jvm  # non-vacuous
        assert not any(900001 in p or 900002 in p for p in jvm)
    # informational timing (not asserted: single-node jitter) — the
    # dense-matmul advantage shows on wide blocks
    t0 = time.monotonic()
    dedup.embedding_neardup_pairs(emb, threshold=0.3, engine="jvm").count()
    t_jvm = time.monotonic() - t0
    t0 = time.monotonic()
    dedup.embedding_neardup_pairs_arrow(emb, threshold=0.3).count()
    t_arrow = time.monotonic() - t0
    print(f"blocked-cosine engines: jvm={t_jvm:.2f}s arrow={t_arrow:.2f}s")


def test_pairs_arrow_exact_bit_identical_to_jvm_fold(spark):
    """The order-exact Arrow engine (engine='arrow', the default — the
    round-5 verdict's top task) must be BIT-IDENTICAL to the JVM fold:
    same pairs AND the exact same cos_sim doubles, not 6dp-equal —
    the kernel replays the fold's per-dimension rounded multiply/add
    sequence, so the gated oracle rows stay green by construction.
    Covered: real testdata (float32 input), a forced hot-block split,
    NULL/zero-norm exclusion, adversarial near-threshold values, and
    several thresholds."""
    import random

    from vexere_lakehouse_pipeline_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    extra = spark.createDataFrame(
        [(900001, None, 0), (900002, [0.0] * 64, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    emb = emb.unionByName(
        extra.withColumn("embedding", F.col("embedding").cast("array<float>"))
    )
    for cap in (2048, 100):
        jvm = sorted(
            map(
                tuple,
                dedup.embedding_neardup_pairs(
                    emb, threshold=0.3, max_block_size=cap, engine="jvm"
                ).collect(),
            )
        )
        arrow = sorted(
            map(
                tuple,
                dedup.embedding_neardup_pairs(
                    emb, threshold=0.3, max_block_size=cap, engine="arrow"
                ).collect(),
            )
        )
        assert arrow == jvm, f"cap={cap}"  # exact doubles, not 6dp
        assert jvm
    # synthetic double-typed vectors at several thresholds incl. 0.0
    rng = random.Random(13)
    rows = [
        (i, f"b{i % 3}", [rng.uniform(-1, 1) for _ in range(16)])
        for i in range(150)
    ]
    rows.append((150, "b0", [0.0] * 16))
    synth = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    for thr in (0.0, 0.3, 0.9):
        jvm = sorted(
            map(
                tuple,
                dedup.embedding_neardup_pairs(
                    synth, threshold=thr, engine="jvm"
                ).collect(),
            )
        )
        arrow = sorted(
            map(
                tuple,
                dedup.embedding_neardup_pairs(
                    synth, threshold=thr, engine="arrow"
                ).collect(),
            )
        )
        assert arrow == jvm, f"thr={thr}"
    # unknown engine name must fail loudly, not fall back
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pair engine"):
        dedup.embedding_neardup_pairs(synth, engine="blas")


def test_pairs_arrow_jvm_parity_edge_cases(spark):
    """Review-found divergences between the engines, now pinned: NULL
    block keys never pair (the JVM equi-join is null-filtering, while
    groupBy would keep NULL as a group), duplicate ids never self-pair
    (the JVM vec_a < vec_b is a VALUE filter), NULL ids never pair
    (NULL < x is NULL), and ragged vector lengths degrade gracefully
    (JVM: zip_with pads -> NULL cosine -> pair drops; arrow must not
    crash np.stack)."""
    rows = [
        # block "b": near-identical pair + a dup-id row + a ragged row
        (1, "b", [1.0, 2.0, 3.0]),
        (2, "b", [1.0, 2.0, 3.0001]),
        (2, "b", [1.0, 2.0, 2.9999]),       # duplicate id 2
        (7, "b", [1.0, 2.0]),               # ragged: 2-dim vs 3-dim
        (8, "b", [1.0, 2.0001]),            # ragged partner
        (None, "b", [1.0, 2.0, 3.0]),       # NULL id
        # NULL block: two near-identical vectors that must NOT pair
        (10, None, [5.0, 5.0, 5.0]),
        (11, None, [5.0, 5.0, 5.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    jvm = sorted(
        map(tuple, dedup.embedding_neardup_pairs(
            emb, threshold=0.3, engine="jvm").collect())
    )
    arrow = sorted(
        map(tuple, dedup.embedding_neardup_pairs(
            emb, threshold=0.3, engine="arrow").collect())
    )
    assert arrow == jvm
    got_pairs = {(a, b) for a, b, _ in arrow}
    assert (10, 11) not in got_pairs        # NULL block never pairs
    assert not any(a == b for a, b in got_pairs)   # no self-pairs
    assert not any(a is None or b is None for a, b in got_pairs)
    assert (7, 8) in got_pairs              # within-length class pairs
    assert (1, 2) in got_pairs


def test_checkpoint_cache_caps_and_releases(spark):
    """CheckpointCache: same key hits the same frame, eviction beyond
    maxsize actually FREES the checkpoint's storage blocks (review
    finding: Dataset.unpersist is a no-op for localCheckpoint — the
    release must go through the LogicalRDD's underlying RDD)."""
    from vexere_lakehouse_pipeline_spark.operators.caching import (
        CheckpointCache,
    )

    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.sc().getPersistentRDDs().size()

    base = n_persistent()
    cache = CheckpointCache(maxsize=2)

    def build(tag: int):
        return lambda: spark.range(1000 + tag).selectExpr("id", "id*2 as x")

    a = cache.get(spark, "t", "sf_a", build(0))
    assert cache.get(spark, "t", "sf_a", build(0)) is a  # hit, no rebuild
    a.count()
    cache.get(spark, "t", "sf_b", build(1)).count()
    assert n_persistent() >= base + 2
    # LRU (round-6 ADVICE): a hit refreshes recency, so after touching
    # sf_a the third insert evicts sf_b — not the sf_a we just used.
    assert cache.get(spark, "t", "sf_a", build(0)) is a
    cache.get(spark, "t", "sf_c", build(2)).count()
    assert len(cache._entries) == 2
    assert cache.get(spark, "t", "sf_a", build(0)) is a  # survived
    assert n_persistent() <= base + 2
    cache.clear()
    assert n_persistent() <= base


def test_connected_components_warns_when_not_converged(spark):
    """No silent caps: running out of iterations must emit a warning
    (partial labels under-merge downstream); a converged run must not."""
    import warnings

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "doc_a long, doc_b long"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.connected_components(chain, max_iterations=1).collect()
    assert any("not converged" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dedup.connected_components(chain, max_iterations=20).collect()
    assert not any("not converged" in str(x.message) for x in w)
    assert {r["component_id"] for r in out} == {0}


def test_topk_int8_contract_and_quality(spark):
    """int8 quantized top-k: integer scores, zero/NULL vectors excluded
    on both sides, identical-direction vectors rank first, and recall
    vs the float ranking stays high on real data (the oracle row pins
    the exact values; this pins the operator contract)."""
    import pyspark.sql.types as T

    from vexere_lakehouse_pipeline_spark.operators import similarity

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 0.0]),
         (4, None), (5, [0.7, 0.7]), (6, [-1.0, 0.0])],
        schema,
    )
    out = similarity.topk_int8(cands, cands.filter("vec_id = 1"), k=5)
    rows = sorted((r["rank"], r["vec_id"], r["dot_q"]) for r in out.collect())
    # same-direction vector 2 is rank 1 with the max code dot 127*127;
    # zero/null vectors never appear; opposite vector ranks last
    assert rows[0][1] == 2 and rows[0][2] == 127 * 127
    ids = [v for _, v, _ in rows]
    assert 3 not in ids and 4 not in ids
    assert ids[-1] == 6 and rows[-1][2] == -(127 * 127)
    # real-data recall@5 against the float truth stays >= 0.9 mean
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    rec = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_int8_vs_bruteforce"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    assert sum(rec) / len(rec) >= 0.9


def test_knn_graph_lsh_recall_gate(spark):
    """knn_graph(strategy='lsh') carries the same gated-recall contract
    as the top-k paths (VERDICT r3 #3): its recall@3 against the exact
    graph is measured by the sim_recall_knn_lsh_vs_exact oracle row and
    floor-pinned here.  The synthetic embeddings are near-orthogonal,
    so ANY single-table sign-LSH is weak in absolute terms — the pin is
    therefore twofold: an absolute floor at the measured level (0.146
    at sf0.001), and a >= 1.5x margin over the random-candidate
    baseline (the recall a random blocking of the same bucket-volume
    would get), which is what "the hash concentrates true neighbors"
    actually means, independent of how hard the corpus is."""
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.functions.vectors import (
        sign_lsh_bucket,
    )
    from vexere_lakehouse_pipeline_spark.plans import governance

    sf_dir = "/root/testdata/sf0.001"
    rec = [
        r["recall"]
        for r in governance.QUERIES["sim_recall_knn_lsh_vs_exact"](
            spark, sf_dir
        ).collect()
    ]
    mean_recall = sum(rec) / len(rec)
    assert mean_recall >= 0.08

    # Random-candidate baseline: P(random pair co-bucketed) given the
    # actual bucket occupancy = sum_b n_b*(n_b-1) / (N*(N-1)).
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    sizes = [
        r["n"]
        for r in emb.groupBy(sign_lsh_bucket("embedding", 4).alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    n_total = sum(sizes)
    baseline = sum(n * (n - 1) for n in sizes) / (n_total * (n_total - 1))
    assert mean_recall >= 1.5 * baseline


def test_multitable_lsh_lifts_recall(spark):
    """n_tables is the LSH recall lever: unioning independent hash
    tables (disjoint dim slices) must lift k-NN graph recall vs the
    exact graph well above the single-table path on real data —
    measured 0.15 (1 table) -> 0.45 (4) -> 0.71 (8) at sf0.001.  Floors
    are set under the measured values; monotonicity is the contract."""
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    truth = {
        (r["src"], r["dst"])
        for r in similarity.knn_graph(emb, k=3, strategy="exact")
        .select("src", "dst")
        .collect()
    }
    recall = {}
    for n_tables in (1, 4, 8):
        got = {
            (r["src"], r["dst"])
            for r in similarity.knn_graph(
                emb, k=3, strategy="lsh", n_bits=4, n_tables=n_tables
            )
            .select("src", "dst")
            .collect()
        }
        recall[n_tables] = len(got & truth) / len(truth)
    assert recall[1] < recall[4] < recall[8]
    assert recall[4] >= 0.35
    assert recall[8] >= 0.6


def test_topk_hamming_contract_and_shortlist_recall(spark):
    """Binary sign-sketch top-k: integer Hamming scores, zero/NULL
    vectors excluded, identical-direction vectors rank first (hamming
    0), and the tier's actual contract — candidate GENERATION — holds
    on real data: a hamming top-50 shortlist (10% of the corpus)
    captures >= 55% of the true cosine top-5 (measured 0.72 at
    sf0.001), ~6x the 10% random baseline.  Exact per-query values are
    pinned cross-engine by the sim_topk_hamming oracle row."""
    import pyspark.sql.types as T

    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import similarity

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    cands = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [2.0, 4.0]), (3, [0.0, 0.0]),
         (4, None), (5, [-1.0, -2.0])],
        schema,
    )
    out = similarity.topk_hamming(cands, cands.filter("vec_id = 1"), k=5,
                                  n_bits=2)
    rows = sorted((r["rank"], r["vec_id"], r["hamming"])
                  for r in out.collect())
    # same-direction vector 2 has hamming 0; zero/null never appear;
    # opposite-sign vector has hamming 2 (both sign bits flip)
    assert rows[0][1] == 2 and rows[0][2] == 0
    ids = [v for _, v, _ in rows]
    assert 3 not in ids and 4 not in ids
    assert rows[-1][1] == 5 and rows[-1][2] == 2

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["vec_id"])
        for r in similarity.topk_bruteforce(emb, qs, k=5).collect()
    }
    short = {
        (r["query_id"], r["vec_id"])
        for r in similarity.topk_hamming(emb, qs, k=50).collect()
    }
    assert len(truth & short) / len(truth) >= 0.55


def test_topk_pq_adc_contract_and_recall(spark):
    """PQ/ADC top-k: m integer codes per vector (codebook-lossless on a
    tiny fixture, so the same-direction candidate scores adc exactly
    0), zero/NULL vectors excluded on both sides, opposite direction
    ranks last, and real-data recall vs the float truth stays above
    the measured floor (the oracle row pins the exact values)."""
    import pyspark.sql.types as T

    from vexere_lakehouse_pipeline_spark.operators import similarity

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 0.0]),
         (4, None), (5, [0.7, 0.7]), (6, [-1.0, 0.0])],
        schema,
    )
    # every distinct subvector fits in the codebook (ksub=8 > 4 valid
    # vectors) -> encode is lossless and ADC equals the exact d2
    cb = similarity.pq_sampled_codebooks(cands, m=2, ksub=8)
    enc = similarity.pq_encode(cands, cb, m=2, dsub=1).collect()
    by_vec = {}
    for r in enc:
        by_vec.setdefault(r["vec_id"], []).append(r["code"])
    assert set(by_vec) == {1, 2, 5, 6}          # zero/null never encoded
    assert all(len(v) == 2 for v in by_vec.values())
    assert all(0 <= c < 8 for v in by_vec.values() for c in v)

    out = similarity.topk_pq_adc(
        cands, cands.filter("vec_id = 1"), k=5, m=2, ksub=8, dsub=1
    )
    rows = sorted((r["rank"], r["vec_id"], r["adc_d2_micro"])
                  for r in out.collect())
    assert [v for _, v, _ in rows] == [2, 5, 6]
    assert rows[0][2] == 0                      # same unit vector: d2=0
    assert rows[-1][2] == 4_000_000             # opposite: (1-(-1))^2

    # real-data recall@5 against the float truth (measured 0.64 mean at
    # sf0.001 for m=32/ksub=64 sampled codebooks; floor set below it)
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    rec = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_pq_vs_bruteforce"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    assert sum(rec) / len(rec) >= 0.5


def test_topk_ivfpq_pruning_and_recall(spark):
    """IVF-PQ: assignment is one deterministic list per vector, a
    query's result set lives entirely inside its probed lists (nprobe=1
    on a separable fixture keeps only the query's own cluster), and
    real-data recall of the composed approximation stays above the
    measured floor (0.70 mean at sf0.001 for nprobe=8/32)."""
    import pyspark.sql.types as T

    from vexere_lakehouse_pipeline_spark.operators import similarity

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    # two well-separated direction clusters; centroids = first 2 by id
    cands = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1]),
         (4, [0.1, 0.9]), (5, [1.0, 0.05]), (6, [0.05, 1.0])],
        schema,
    )
    lists = {r["vec_id"]: r["cid"]
             for r in similarity.assign_ivf_lists(
                 cands, n_centroids=2, dim=2).collect()}
    assert lists == {1: 1, 3: 1, 5: 1, 2: 2, 4: 2, 6: 2}

    out = similarity.topk_ivfpq(
        cands, cands.filter("vec_id = 1"), k=5,
        n_centroids=2, nprobe=1, m=2, ksub=8, dsub=1, dim=2,
    ).collect()
    got = {r["vec_id"] for r in out}
    assert got == {3, 5}          # own list only; list 2 never scanned

    from vexere_lakehouse_pipeline_spark.plans import star_ml

    rec = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_ivfpq_vs_bruteforce"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    assert sum(rec) / len(rec) >= 0.5


def test_topk_ivfpq_rerank_recovers_quantization_loss(spark):
    """Two-tier IVFPQ + exact rerank (the FAISS refine serving shape):
    the 50-deep ADC shortlist + exact cosine rerank must recover
    STRICTLY more recall than the raw ADC ranking on the same
    index parameters — the rerank erases per-vector quantization
    error; what remains is pure nprobe pruning loss (the true
    neighbor living in an unprobed list, which no rerank can fetch
    back).  Measured at sf0.001: raw ADC 0.70 mean -> rerank 0.94;
    floors pinned below with headroom."""
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    sf = "/root/testdata/sf0.001"
    rr = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_ivfpq_rerank_vs_bruteforce"](
            spark, sf
        ).collect()
    ]
    raw = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_ivfpq_vs_bruteforce"](
            spark, sf
        ).collect()
    ]
    mean_rr = sum(rr) / len(rr)
    mean_raw = sum(raw) / len(raw)
    assert mean_rr >= 0.85          # measured 0.94
    assert mean_rr > mean_raw       # the rerank must actually pay rent
    # identical output contract as bruteforce: (query_id, vec_id,
    # cos_sim, rnk), exact cosine values — wherever the true top-k
    # survived the shortlist the rows MATCH bruteforce exactly
    bf = {
        (r["query_id"], r["vec_id"]): (r["cos_sim"], r["rnk"])
        for r in star_ml.QUERIES["sim_topk_bruteforce"](spark, sf).collect()
    }
    rrk = star_ml.QUERIES["sim_topk_ivfpq_rerank"](spark, sf).collect()
    hits = [r for r in rrk if (r["query_id"], r["vec_id"]) in bf]
    assert hits
    for r in hits:
        assert bf[(r["query_id"], r["vec_id"])][0] == r["cos_sim"]


def test_topk_sq8_params_encode_and_recall(spark):
    """Per-dimension affine SQ8 (FAISS ScalarQuantizer QT_8bit):
    params are exact min/max per dimension of the unit vectors, codes
    hit 0 and 255 at the range endpoints, zero/NULL vectors are
    excluded, and real-data recall@5 stays above the floor (measured
    1.0 at sf0.001, 0.98 at sf0.01 — per-dim ranges lose less than the
    global-scale int8 code)."""
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),      # unit (0.6, 0.8)
            (2, [-4.0, 3.0]),     # unit (-0.8, 0.6)
            (3, [0.0, 1.0]),      # unit (0.0, 1.0)
            (4, None),            # excluded
            (5, [0.0, 0.0]),      # zero-norm: excluded
        ],
        "vec_id long, embedding array<double>",
    )
    params = {r["pos"]: r for r in similarity.sq8_params(emb).collect()}
    assert params[0]["mn"] == -0.8 and params[0]["mx"] == 0.6
    assert params[1]["mn"] == 0.6 and params[1]["mx"] == 1.0
    codes = {
        r["vec_id"]: r["sq8"]
        for r in similarity.sq8_encode(
            emb, similarity.sq8_params(emb)
        ).collect()
    }
    assert set(codes) == {1, 2, 3}  # null + zero-norm excluded
    s0, s1 = params[0]["scale_micro"], params[1]["scale_micro"]
    assert codes[1][0] == 255 * s0      # 0.6 is dim-0 max
    assert codes[2][0] == 0             # -0.8 is dim-0 min
    assert codes[3][1] == 255 * s1      # 1.0 is dim-1 max
    # real-data recall floor
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    rec = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_sq8_vs_bruteforce"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    assert sum(rec) / len(rec) >= 0.9   # measured 1.0


def test_topk_cascade_beats_two_tier(spark):
    """Three-tier cascade (hamming 100 -> int8 20 -> exact 5): recall
    must beat the two-tier hamming_rerank@50 on the same data (the
    deeper, cheaper tier-1 funnel admits more true neighbors before
    the precise tiers order them; measured 0.94 vs 0.72 at sf0.001),
    and surviving rows must carry bruteforce's exact cosine values."""
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    sf = "/root/testdata/sf0.001"
    cas = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_cascade_vs_bruteforce"](
            spark, sf
        ).collect()
    ]
    two = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_hamming_rerank_vs_bruteforce"](
            spark, sf
        ).collect()
    ]
    mean_cas = sum(cas) / len(cas)
    assert mean_cas >= 0.85                     # measured 0.94
    assert mean_cas > sum(two) / len(two)       # funnel depth pays rent
    bf = {
        (r["query_id"], r["vec_id"]): r["cos_sim"]
        for r in star_ml.QUERIES["sim_topk_bruteforce"](spark, sf).collect()
    }
    hits = [
        r
        for r in star_ml.QUERIES["sim_topk_cascade"](spark, sf).collect()
        if (r["query_id"], r["vec_id"]) in bf
    ]
    assert hits
    for r in hits:
        assert bf[(r["query_id"], r["vec_id"])] == r["cos_sim"]


def test_pq_trained_codebooks_beat_sampled(spark):
    """pq_train_codebooks is the quality path the PQ docstrings promise
    ("production swaps in trained centroids"): 3 Lloyd's iterations
    over the sampled init must strictly improve recall@5 vs the float
    truth (measured 0.64 sampled -> 0.80 trained at sf0.001), and the
    output keeps the (s, code, cv) contract so it drops into
    topk_pq_adc unchanged."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.vec_id)
             for r in sim.topk_bruteforce(emb, q, k=5).collect()}

    def recall(cbs):
        got = {(r.query_id, r.vec_id)
               for r in sim.topk_pq_adc(emb, q, k=5, m=32, ksub=64,
                                        codebooks=cbs, dsub=2).collect()}
        return len(got & truth) / len(truth)

    r_sampled = recall(sim.pq_sampled_codebooks(emb, m=32, ksub=64))
    trained = sim.pq_train_codebooks(emb, m=32, ksub=64, iters=3, dsub=2)
    assert {tuple(r) for r in trained.select("s").distinct().collect()} \
        == {(s,) for s in range(32)}
    r_trained = recall(trained)
    assert r_trained > r_sampled
    assert r_trained >= 0.7


def test_ivfpq_residual_trained_recall_floor(spark):
    """Residual IVF-PQ (FAISS "IVF,PQ" proper) with trained residual
    codebooks is the quality path: at IDENTICAL bytes (same
    n_centroids/nprobe/m/ksub as sim_topk_ivfpq), 3 Lloyd's iterations
    over the residual subvectors must reach recall@5 >= 0.80 vs the
    float truth (measured exactly 0.80 at sf0.001 — deterministic
    arithmetic end-to-end, so the floor is an equality in practice)
    and beat the trained RAW-vector IVF-PQ (measured 0.78)."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.vec_id)
             for r in sim.topk_bruteforce(emb, q, k=5).collect()}

    got = {(r.query_id, r.vec_id)
           for r in sim.topk_ivfpq_residual(
               emb, q, k=5, n_centroids=32, nprobe=8, m=32, ksub=64,
               dsub=2, dim=64, train_iters=3).collect()}
    r_residual = len(got & truth) / len(truth)
    assert r_residual >= 0.80

    raw_cbs = sim.pq_train_codebooks(emb, m=32, ksub=64, iters=3, dsub=2)
    got_raw = {(r.query_id, r.vec_id)
               for r in sim.topk_ivfpq(
                   emb, q, k=5, n_centroids=32, nprobe=8, m=32, ksub=64,
                   dsub=2, dim=64, codebooks=raw_cbs).collect()}
    r_raw = len(got_raw & truth) / len(truth)
    assert r_residual > r_raw


def test_hamming_rerank_recovers_recall(spark):
    """The two-tier composition (hamming shortlist=50 -> exact rerank)
    must materially beat single-tier hamming@5 (measured 0.16 -> 0.72
    at sf0.001, deterministic) and never emit a pair the brute-force
    ranking wouldn't order the same way for survivors."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.vec_id)
             for r in sim.topk_bruteforce(emb, q, k=5).collect()}

    def recall(df):
        got = {(r.query_id, r.vec_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    r_one = recall(sim.topk_hamming(emb, q, k=5))
    r_two = recall(sim.topk_hamming_rerank(emb, q, k=5, shortlist=50))
    assert r_two >= 0.7
    assert r_two > r_one + 0.3


def test_two_stage_topk_matches_single_window(spark):
    """_two_stage_topk must be bit-identical to the naive single-window
    rank for any partitioning of the scored stream — including ties on
    the score (broken by vec_id) and k larger than some groups."""
    import random

    from pyspark.sql import Window
    from vexere_lakehouse_pipeline_spark.operators.similarity import (
        _two_stage_topk,
    )

    rng = random.Random(11)
    rows = [(q, v, rng.randint(0, 5))  # heavy ties
            for q in range(7) for v in range(200)]
    scored = spark.createDataFrame(
        rows, "query_id long, vec_id long, score long"
    ).repartition(16)  # many input partitions -> many stage-1 groups
    got = sorted(
        tuple(r) for r in
        _two_stage_topk(scored, [F.desc("score"), "vec_id"], 5).collect()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
    want = sorted(
        tuple(r) for r in
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5).collect()
    )
    assert got == want
    # k exceeding the candidate count: every row ranks, none duplicated
    small = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 9)], "query_id long, vec_id long, score long"
    ).repartition(8)
    got2 = sorted(
        (r.query_id, r.vec_id, r.rank) for r in
        _two_stage_topk(small, [F.desc("score"), "vec_id"], 5).collect()
    )
    assert got2 == [(0, 1, 1), (0, 2, 2)]


def test_exact_substring_clean_removes_duplicated_spans(spark):
    """Lee et al. ExactSubstr semantics: a duplicated 8-token span is
    removed from EVERY document containing it (including both copies
    within one doc), non-duplicated text survives in order, and short
    docs (< n tokens) pass through untouched."""
    import hashlib

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _docs(spark, [
        f"intro {span} outro",          # doc 0: span + 2 unique tokens
        f"{span}",                       # doc 1: exactly the span
        "totally unique words only here",  # doc 2: untouched
        "tiny doc",                      # doc 3: < 8 tokens
    ])
    out = {r.doc_id: r for r in dedup.exact_substring_clean(docs).collect()}
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()  # noqa: E731
    # doc 0: "intro <span> outro" has 3 span-positions? no - 10 tokens,
    # 3 windows; only the middle window (exact span) duplicates with
    # doc 1, but windows overlap: positions 0..2 hash differently.
    # Duplicated windows: (doc0, p=1) and (doc1, p=0) share the hash ->
    # both removed; "intro"/"outro" survive only if not covered.
    assert out[0].n_tokens == 10
    assert out[0].n_removed == 8
    assert out[0].clean_hash == md5("intro outro")
    assert out[1].n_tokens == 8 and out[1].n_removed == 8
    assert out[1].clean_hash == md5("")
    assert out[2].n_removed == 0
    assert out[2].clean_hash == md5("totally unique words only here")
    assert out[3].n_tokens == 2 and out[3].n_removed == 0
    # within-doc duplication also counts: one doc, same span twice
    twice = _docs(spark, [f"{span} filler {span}"])
    r = dedup.exact_substring_clean(twice).collect()[0]
    assert r.n_removed == 16 and r.clean_hash == md5("filler")


def test_exact_substring_min_len_keeps_short_quotes(spark):
    """The paper's length threshold (Lee et al. §4.1 remove maximal
    duplicated substrings >= 50 tokens; round-5 verdict #3): with
    min_len > n, a LONG shared passage is removed while a SHORT shared
    quote (>= n but < min_len) SURVIVES — the fixed-n cover
    (min_len=None) excises both."""
    import hashlib

    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()  # noqa: E731
    passage = " ".join(f"p{i}" for i in range(30))   # 30-token passage
    quote = " ".join(f"q{i}" for i in range(10))     # 10-token quote
    docs = _docs(spark, [
        f"one {passage} tail1 {quote} end1",   # doc 0
        f"two {passage} tail2 {quote} end2",   # doc 1
        "independent text with no duplicates at all",  # doc 2
    ])
    # min_len=24: the 30-token passage run >= 24 -> removed;
    # the 10-token quote run (10 < 24) -> SURVIVES
    out = {
        r.doc_id: r
        for r in dedup.exact_substring_clean(docs, n=8, min_len=24).collect()
    }
    assert out[0].n_removed == 30
    assert out[0].clean_hash == md5(f"one tail1 {quote} end1")
    assert out[1].n_removed == 30
    assert out[1].clean_hash == md5(f"two tail2 {quote} end2")
    assert out[2].n_removed == 0
    # default fixed-n cover removes BOTH (more aggressive than paper)
    cover = {
        r.doc_id: r
        for r in dedup.exact_substring_clean(docs, n=8).collect()
    }
    assert cover[0].n_removed == 40
    assert cover[0].clean_hash == md5("one tail1 end1")
    # min_len <= n is the identity with the default cover
    same = {
        r.doc_id: r
        for r in dedup.exact_substring_clean(docs, n=8, min_len=8).collect()
    }
    assert {d: (r.n_removed, r.clean_hash) for d, r in same.items()} == {
        d: (r.n_removed, r.clean_hash) for d, r in cover.items()
    }
    # two overlapping/abutting sub-min_len duplicated substrings chain
    # into one >= min_len run — removed (documented conservative
    # divergence from the suffix-array formulation)
    a = " ".join(f"a{i}" for i in range(14))
    b = " ".join(f"b{i}" for i in range(14))
    chain = _docs(spark, [
        f"x {a} {b} y", f"left {a} r1", f"l2 {b} right",
    ])
    got = {
        r.doc_id: r
        for r in dedup.exact_substring_clean(chain, n=8, min_len=24).collect()
    }
    assert got[0].n_removed == 28          # the chained 28-token run
    assert got[1].n_removed == 0           # isolated 14-token run < 24
    assert got[2].n_removed == 0


def test_jl_projection_signs_and_exactness(spark):
    """Sparse JL projection: the md5-derived sign matrix has the
    Achlioptas {1/6, 2/3, 1/6} shape (roughly 2/3 zeros, signs
    balanced), is identical on re-derivation (no hidden state), and
    the Spark projection equals a plain-Python evaluation of the same
    integer arithmetic — exact int64, no float anywhere."""
    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators.similarity import (
        jl_project_int8,
        jl_signs,
        quantize_int8_unit,
    )

    signs = jl_signs(8)
    assert signs == jl_signs(8)                      # deterministic
    n = len(signs)
    zeros = signs.count(0)
    assert 0.55 * n < zeros < 0.78 * n               # ~2/3 zeros
    assert abs(signs.count(1) - signs.count(-1)) < 0.35 * n / 3
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    few = emb.filter(F.col("vec_id") < 5)
    q8 = {
        r["vec_id"]: r["q8"]
        for r in quantize_int8_unit(few, "embedding")
        .select("vec_id", "q8").collect()
        if r["q8"] is not None
    }
    got = {
        r["vec_id"]: r["jl"]
        for r in jl_project_int8(few, d_out=8).collect()
    }
    s8 = jl_signs(8)
    for vid, code in q8.items():
        want = [
            sum(int(x) * s8[i * 8 + j] for i, x in enumerate(code))
            for j in range(8)
        ]
        assert got[vid] == want, vid


def test_topk_jl_rerank_recovers_projection_loss(spark):
    """JL 64->32 on this corpus is the ADVERSARIAL case (near-uniform
    pairwise similarities -> tiny neighbor margins), so raw projected
    recall is honest-low; the 100-deep shortlist + exact rerank must
    recover STRICTLY more (measured at sf0.001: raw 0.16 -> rerank
    0.74; floors pinned with headroom).  Guards the regression class
    that shipped round-7's first draft: a LINEAR (a*i + b*j) % 6 sign
    hash collapses to a handful of patterns and recall goes to ~0 —
    the raw floor alone catches that."""
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    sf = "/root/testdata/sf0.001"
    raw = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_jl_vs_bruteforce"](
            spark, sf
        ).collect()
    ]
    rr = [
        r["recall"]
        for r in star_ml.QUERIES["sim_recall_jl_rerank_vs_bruteforce"](
            spark, sf
        ).collect()
    ]
    mean_raw = sum(raw) / len(raw)
    mean_rr = sum(rr) / len(rr)
    assert mean_raw >= 0.05         # measured 0.16; 0 means broken hash
    assert mean_rr >= 0.6           # measured 0.74
    assert mean_rr > mean_raw       # the rerank must actually pay rent
