"""Corpus-construction queries: deterministic sampling, splits, source
mixtures, and vocabulary statistics over the ``documents`` table.

The training-data-pipeline layer above dedup/similarity (plans/
star_ml.py): reproducible train/valid/test assignment, per-language
downsampling, weighted source mixing (operators/sampling.py), and the
classic distributed word-count/vocabulary build.  All hash decisions go
through md5 nibbles so the DuckDB oracles reproduce every kept row
bit-for-bit — thresholds are computed ONCE in Python below and
interpolated into both engines' expressions.

No reference analog (SURVEY §2 has no sampling surface); north-star
coverage per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.text import (
    document_fingerprint,
    quality_features,
    redact_pii,
    tokenize,
    whitespace_token_count,
)
from vexere_lakehouse_pipeline_spark.operators import dedup, sampling
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn
from vexere_lakehouse_pipeline_spark.plans.star_ml import (
    _DUCK_SHINGLE_CTES,
    _DUCK_TOKENS,
    _duck_shingles,
)

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Shared constants — single source of truth for Spark AND the oracles.
_SPLIT_WEIGHTS = {"train": 0.90, "valid": 0.05, "test": 0.05}
_TRAIN_BOUND = int(0.90 * sampling.BUCKETS)          # 58982
_VALID_BOUND = int(0.95 * sampling.BUCKETS)          # 62259
_EN_FRACTION = 0.5
_EN_BOUND = int(_EN_FRACTION * sampling.BUCKETS)     # 32768
_MIX_RATES = {"src0": 1.0, "other": 0.25}
_OTHER_BOUND = int(0.25 * sampling.BUCKETS)          # 16384

_DUCK_WS_TOKENS = (
    "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
)


# ---------------------------------------------------------------------------
# Train/valid/test assignment — pure map-side, stable under
# repartitioning/retries (unlike rand()-seeded df.randomSplit).
# ---------------------------------------------------------------------------
@_register(
    "corpus_split_counts",
    f"""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN {sampling.hash_bucket_sql('doc_id', 'split')} < {_TRAIN_BOUND}
                    THEN 'train'
                    WHEN {sampling.hash_bucket_sql('doc_id', 'split')} < {_VALID_BOUND}
                    THEN 'valid' ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs
    FROM assigned GROUP BY split, lang ORDER BY split, lang
    """,
)
def corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", sampling.split_column("doc_id", _SPLIT_WEIGHTS))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# Stratified downsampling — cap the dominant language at 50%, keep the
# tail at 100%.  Emits the kept rows themselves so the oracle verifies
# membership, not just counts.
# ---------------------------------------------------------------------------
@_register(
    "corpus_stratified_sample",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {sampling.hash_bucket_sql('doc_id', 'strata')}
          < CASE WHEN lang = 'en' THEN {_EN_BOUND} ELSE {sampling.BUCKETS} END
    ORDER BY doc_id
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": _EN_FRACTION}, default=1.0
    )
    return kept.select("doc_id", "lang").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Weighted training mix — 100% of the curated source, 25% of everything
# else, tagged by mix_source.  Per-source doc and whitespace-token
# totals (the numbers a data-mix design is balanced on).
# ---------------------------------------------------------------------------
@_register(
    "corpus_training_mix",
    f"""
    WITH mixed AS (
        SELECT 'src0' AS mix_source, text FROM documents
        WHERE source = 'src0'
          AND {sampling.hash_bucket_sql('doc_id', 'mix:src0')} < {sampling.BUCKETS}
        UNION ALL
        SELECT 'other', text FROM documents
        WHERE source <> 'src0'
          AND {sampling.hash_bucket_sql('doc_id', 'mix:other:0')} < {_OTHER_BOUND}
    )
    SELECT mix_source, COUNT(*) AS n_docs,
           CAST(SUM({_DUCK_WS_TOKENS}) AS BIGINT) AS n_tokens
    FROM mixed GROUP BY mix_source ORDER BY mix_source
    """,
)
def corpus_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mixed = sampling.weighted_mixture(
        {
            "src0": (docs.filter(F.col("source") == "src0"), _MIX_RATES["src0"]),
            "other": (docs.filter(F.col("source") != "src0"), _MIX_RATES["other"]),
        },
        key="doc_id",
    )
    return (
        mixed.groupBy("mix_source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(whitespace_token_count("text")).cast("bigint").alias("n_tokens"),
        )
        .orderBy("mix_source")
    )


# ---------------------------------------------------------------------------
# Vocabulary build — the canonical distributed word count: explode
# tokens, partial-aggregate map-side, one shuffle on token, top-k with a
# total deterministic order.  At 100 TB this is exactly the BPE/vocab
# pre-pass; the explode never materializes more than a task's batch.
# ---------------------------------------------------------------------------
@_register(
    "corpus_vocab_topk",
    f"""
    WITH tok AS (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents)
    SELECT token, COUNT(*) AS freq
    FROM tok GROUP BY token
    ORDER BY freq DESC, token LIMIT 50
    """,
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# End-to-end cleaning pipeline — the composite a pre-training corpus
# actually runs: PII redaction -> quality gate (word-count band, drop a
# language) -> fingerprint near-dup collapse keeping the smallest
# doc_id.  Everything is JVM-side Column code; the only shuffle is the
# fingerprint groupBy.  min(struct(doc_id, ...)) picks the canonical
# row per fingerprint in ONE aggregation (no join-back).
# ---------------------------------------------------------------------------
@_register(
    "corpus_clean_pipeline",
    f"""
    WITH docs_r AS (
        SELECT doc_id, lang,
               regexp_replace(regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g'),
                              '[\\w.+-]+@[\\w-]+\\.[\\w.-]+', '<EMAIL>', 'g') AS text
        FROM documents
    ),
    qual AS (
        SELECT doc_id, lang, {_DUCK_TOKENS} AS w
        FROM docs_r WHERE lang <> 'zh'
    ),
    gated AS (
        SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_words,
               list_aggregate(list_transform({_duck_shingles(5)}, s -> md5(s)), 'min')
                 AS fp
        FROM qual WHERE len(w) BETWEEN 30 AND 90
    ),
    canon AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated
    )
    SELECT doc_id, lang, n_words FROM canon WHERE rn = 1 ORDER BY doc_id
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cleaned = docs.select(
        "doc_id", "lang", redact_pii("text").alias("text")
    ).filter(F.col("lang") != "zh")
    gated = cleaned.select(
        "doc_id",
        "lang",
        quality_features("text")["n_words"].alias("n_words"),
        document_fingerprint("text", 5).alias("fp"),
    ).filter(F.col("n_words").between(30, 90))
    canon = gated.groupBy("fp").agg(
        F.min(F.struct("doc_id", "lang", "n_words")).alias("r")
    )
    return canon.select("r.doc_id", "r.lang", "r.n_words").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Unigram language-model quality score — the two-pass "model-based
# filter": pass 1 fits the model (corpus token frequencies), pass 2
# scores every document by mean log10 unigram probability (higher =
# more typical; the cheap perplexity proxy used for corpus filtering).
# Portability: per-token logprobs round to 6dp THEN become
# decimal(18,6), so the per-doc SUM is order-independent and the oracle
# matches bit-for-bit.  The mean is rounded in exact int64 micro-units
# ((2a+n) div 2n = round-half-away of a/n), NOT via ROUND(double,6):
# Spark rounds doubles through BigDecimal HALF_UP while DuckDB scales
# and nearbyint()s in floating point, and a quotient landing on the
# .xxxxxx5 boundary (observed at sf0.001) rounds differently.  The
# final value is CAST(int AS DOUBLE)/1e6 — one identical IEEE op per
# engine.
# Scale: freq table is vocab-sized; the token join shuffles on the
# token hash; no driver state.
# ---------------------------------------------------------------------------
# Integer core of the micro-unit mean ((2a+n) div 2n, signed) — the
# ONE definition both the double-emitting _MEAN_MICRO and integer
# consumers (plans/mining.py tertile scores) must share: any change to
# this rounding contract changes every oracle in lockstep.
_MEAN_MICRO_INT = (
    "CASE WHEN {s} < 0"
    " THEN -(((-2 * {s}) + {n}) {div} (2 * {n}))"
    " ELSE ((2 * {s}) + {n}) {div} (2 * {n}) END"
)
_MEAN_MICRO = "CAST(" + _MEAN_MICRO_INT + " AS DOUBLE) / 1000000.0"

# Shared unigram-LM scoring pipeline (fit corpus frequencies -> 6dp
# decimal logprobs -> per-doc exact micro sums).  ONE definition of the
# oracle CTEs and the Spark builder, consumed by
# text_unigram_logprob_scores here and corpus_ppl_buckets
# (plans/mining.py) — keeps the rounding/typing contract from
# diverging between the two.
_DUCK_UNIGRAM_CTES = f"""tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    freq AS (SELECT token, COUNT(*) AS f FROM tok GROUP BY token),
    lp AS (SELECT token,
                  CAST(ROUND(LOG10(CAST(f AS DOUBLE)
                       / (SELECT SUM(f) FROM freq)), 6) AS DECIMAL(18,6)) AS lp
           FROM freq),
    agg AS (SELECT t.doc_id,
                   CAST(SUM(lp.lp) * 1000000 AS BIGINT) AS s_micro,
                   COUNT(*) AS n_tokens
            FROM tok t JOIN lp ON lp.token = t.token GROUP BY t.doc_id)"""


def doc_token_table(docs: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *extra_cols, token) exploded token table, materialized
    once (localCheckpoint): every two-pass consumer (model fit + doc
    scoring join) reads it twice, and without pinning, the regex
    split/explode — the dominant cost of tokenize-heavy queries —
    re-executes per consumer."""
    return docs.select(
        "doc_id", *extra_cols, F.explode(tokenize("text")).alias("token")
    ).localCheckpoint(eager=True)


def unigram_logprob_agg(tok: DataFrame) -> DataFrame:
    """Per-doc exact unigram-LM sums (doc_id, s_micro, n_tokens) from a
    (doc_id, token) table — the Spark twin of _DUCK_UNIGRAM_CTES."""
    freq = tok.groupBy("token").agg(F.count("*").alias("f"))
    total = freq.agg(F.sum("f").alias("total"))
    lp = freq.join(F.broadcast(total)).select(
        "token",
        F.round(F.log10(F.col("f").cast("double") / F.col("total")), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return (
        tok.select("doc_id", "token")
        .join(lp, on="token")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(SUM(lp) * 1000000 AS BIGINT)").alias("s_micro"),
            F.count("*").alias("n_tokens"),
        )
    )

@_register(
    "text_unigram_logprob_scores",
    f"""
    WITH {_DUCK_UNIGRAM_CTES}
    SELECT doc_id,
           {_MEAN_MICRO.format(s="s_micro", n="n_tokens", div="//")}
             AS mean_logprob,
           n_tokens
    FROM agg ORDER BY doc_id
    """,
)
def text_unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    agg = unigram_logprob_agg(doc_token_table(docs))
    return agg.select(
        "doc_id",
        F.expr(
            _MEAN_MICRO.format(s="s_micro", n="n_tokens", div="DIV")
        ).alias("mean_logprob"),
        "n_tokens",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Intra-document repetition (Gopher-style filter): fraction of word
# bigrams that are duplicates within the doc.  Pure Column arithmetic
# over the shingle array — no shuffle at all beyond the scan; the
# classic cheap screen for degenerate/templated text.
# ---------------------------------------------------------------------------
@_register(
    "corpus_repetition_scores",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    sh AS (SELECT doc_id, {_duck_shingles(3)} AS s FROM t)
    SELECT doc_id, CAST(len(s) AS BIGINT) AS n_ngrams,
           CAST(len(s) - len(list_distinct(s)) AS BIGINT) AS n_dup,
           ROUND((len(s) - len(list_distinct(s))) * 1.0
                 / nullif(len(s), 0), 4) AS dup_ratio
    FROM sh ORDER BY doc_id
    """,
)
def corpus_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", word_shingles("text", 3).alias("s"))
    n = F.size("s").cast("bigint")
    dup = (F.size("s") - F.size(F.array_distinct("s"))).cast("bigint")
    return sh.select(
        "doc_id",
        n.alias("n_ngrams"),
        dup.alias("n_dup"),
        F.round(dup * 1.0 / F.nullif(n, F.lit(0)), 4).alias("dup_ratio"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Deterministic k-per-class example selection — "3 random-looking but
# reproducible examples per language": rank within each stratum by a
# salted md5 of the key (uniform pseudo-order, stable across runs/
# engines/partitionings), keep rank <= k.  The few-shot/eval-set
# sampler; one shuffle on the stratum key.
# ---------------------------------------------------------------------------
@_register(
    "corpus_examples_per_class",
    """
    WITH ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('ex:' || CAST(doc_id AS STRING)), doc_id
               ) AS rnk
        FROM documents
    )
    SELECT lang, doc_id, rnk FROM ranked WHERE rnk <= 3
    ORDER BY lang, rnk
    """,
)
def corpus_examples_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("ex:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "doc_id", "rnk")
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# Weighted (length-proportional) sampling — P(keep) = 0.5 · n_chars /
# max(n_chars).  Uniform doc sampling under-represents long documents'
# tokens; weighting by length makes the expected TOKEN retention
# uniform.  The keep decision is the pure-integer comparison in
# operators/sampling.py:weighted_hash_sample — md5 bucket vs scaled
# weight — so both engines keep bit-identical rows.  The corpus max
# rides a broadcast cross join (1-row aggregate), never the driver.
# ---------------------------------------------------------------------------
_WS_NUM, _WS_DEN = 1, 2

@_register(
    "corpus_weighted_sample",
    f"""
    WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents)
    SELECT doc_id, n_chars,
           {sampling.hash_bucket_sql('doc_id', 'wsample')} AS w_bucket
    FROM documents, mx
    WHERE CAST({sampling.hash_bucket_sql('doc_id', 'wsample')} AS BIGINT)
          * {_WS_DEN} * mx.max_chars
          < {sampling.BUCKETS} * {_WS_NUM} * n_chars
    ORDER BY doc_id
    """,
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("max_chars"))
    kept = sampling.weighted_hash_sample(
        docs.join(F.broadcast(mx)),
        key="doc_id",
        weight="n_chars",
        max_weight=F.col("max_chars"),
        rate_num=_WS_NUM,
        rate_den=_WS_DEN,
    )
    return kept.select(
        "doc_id",
        "n_chars",
        sampling.hash_bucket("doc_id", "wsample").alias("w_bucket"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Cross-split leakage check — verified near-duplicate pairs whose
# members landed in DIFFERENT train/valid/test splits.  Hash-splitting
# assigns near-dups independently, so without this gate a test doc's
# near-copy can sit in train and silently inflate eval numbers.  The
# operator composes the LSH candidate pipeline (banded minhash, bucket
# cap) + exact Jaccard verification + the same split assignment used
# by corpus_split_counts; everything downstream of the pair table
# joins only LSH survivors, so the leakage check costs no more than
# dedup itself at any scale.
# ---------------------------------------------------------------------------
_LEAK_MIN_J = 0.5

def split_leakage(docs: DataFrame,
                  min_jaccard: float = _LEAK_MIN_J) -> DataFrame:
    """The leakage composition on an arbitrary docs DataFrame (unit
    tests craft cross-split near-dups directly; the registered query
    below binds it to the sf_dir documents table)."""
    pairs = dedup.ngram_jaccard_pairs(docs, min_jaccard=min_jaccard)
    # the split label is a PURE hash of the doc id, so it is computed
    # inline on the pair's own columns — no join back to a data-scale
    # splits table (the previous two joins were this plan's only
    # sort-merge joins, and they bought nothing: every pair id comes
    # from docs by construction)
    return (
        pairs.select(
            "doc_a",
            sampling.split_column("doc_a", _SPLIT_WEIGHTS).alias("split_a"),
            "doc_b",
            sampling.split_column("doc_b", _SPLIT_WEIGHTS).alias("split_b"),
            "jaccard",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .orderBy("doc_a", "doc_b")
    )



@_register(
    "corpus_split_leakage",
    f"""
    WITH {_DUCK_SHINGLE_CTES},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_a
        JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
        GROUP BY p.doc_a, p.doc_b
    ),
    jac AS (
        SELECT p.doc_a, p.doc_b,
               ROUND(COALESCE(i.n_inter, 0) * 1.0
                     / (x.n + y.n - COALESCE(i.n_inter, 0)), 4) AS jaccard
        FROM pairs p
        LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        JOIN sizes x ON x.doc_id = p.doc_a
        JOIN sizes y ON y.doc_id = p.doc_b
    ),
    assigned AS (
        SELECT doc_id,
               CASE WHEN {sampling.hash_bucket_sql('doc_id', 'split')} < {_TRAIN_BOUND}
                    THEN 'train'
                    WHEN {sampling.hash_bucket_sql('doc_id', 'split')} < {_VALID_BOUND}
                    THEN 'valid' ELSE 'test' END AS split
        FROM documents
    )
    SELECT j.doc_a, sa.split AS split_a, j.doc_b, sb.split AS split_b,
           j.jaccard
    FROM jac j
    JOIN assigned sa ON sa.doc_id = j.doc_a
    JOIN assigned sb ON sb.doc_id = j.doc_b
    WHERE j.jaccard >= {_LEAK_MIN_J} AND sa.split <> sb.split
    ORDER BY j.doc_a, j.doc_b
    """,
)
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_leakage(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate — share of each document's token OCCURRENCES
# not covered by the corpus' top-K vocabulary (the tokenizer-coverage
# screen run before committing to a vocab size).  The vocab is derived
# in the same job (global counts -> rank window) and is K rows, so the
# coverage join broadcasts; integer permille keeps the oracle exact.
# ---------------------------------------------------------------------------
_OOV_K = 20

@_register(
    "corpus_oov_rate",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    ranked AS (
        SELECT token, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
        FROM counts
    ),
    vocab AS (SELECT token FROM ranked WHERE rnk <= {_OOV_K})
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST((1000 * SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS oov_permille
    FROM tok t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    # top-K via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heaps + driver merge of K rows), NOT a global row_number window,
    # which would single-partition the whole vocab-sized count table.
    vocab = (
        counts.orderBy(F.desc("n"), "token")
        .limit(_OOV_K)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), on="token", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
        .withColumn("oov_permille", F.expr("(1000 * n_oov) DIV n_tokens"))
        .orderBy("doc_id")
    )
