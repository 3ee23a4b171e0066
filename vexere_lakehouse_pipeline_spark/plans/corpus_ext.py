"""Corpus-construction extensions: TF-IDF terms, BM25 retrieval scoring,
sequence packing, and embedding quantization stats.

Second north-star layer over the ``documents``/``embeddings`` tables
(no reference analog — BASELINE.json extension surface, like plans/
corpus.py): the retrieval-style scorers a data pipeline uses for
keyword extraction and query-based corpus selection, the
concat-and-chunk packing pass that turns documents into fixed-size
training sequences, and the int8 quantization error screen run before
shipping vectors to an ANN index.

Portability rules (MEMORY: oracle gate): every double is produced by
the SAME IEEE expression tree on both engines and rounded before
comparison; per-term contributions that get summed across rows are
rounded to 6dp and cast to decimal(18,6) first so the sum is
order-independent; ln/log10 on identical double inputs are bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.text import (
    LANG_STOPWORDS,
    quality_features,
    stopword_hits_sql,
    tokenize,
    word_shingles,
)
from vexere_lakehouse_pipeline_spark.functions.vectors import dot_product
from vexere_lakehouse_pipeline_spark.operators.packing import (
    ordered_prefix_sum,
    ordered_prefix_sum_with_total,
    pack_concat_chunks,
)
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn
from vexere_lakehouse_pipeline_spark.plans.star_ml import _DUCK_TOKENS, _duck_shingles

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction — top-3 terms per document.
#
# Plan shape (shuffles annotated):  tokens -> (doc,term) counts [1: hash
# on (doc_id, token)] -> doc-frequency table [2: hash on token, vocab-
# sized] -> tf x idf join [3: hash on token] -> per-doc window [4: hash
# on doc_id].  The doc-count scalar rides a broadcast.  Nothing is
# driver-side; the vocab table stays distributed (at 100 TB a web vocab
# is far beyond broadcast range).  Ranking uses the ROUNDED score so
# the window order and the emitted value are the same total order on
# both engines.
# ---------------------------------------------------------------------------
_TFIDF_K = 3

@_register(
    "corpus_tfidf_top_terms",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf,
               ROUND(CAST(tf.tf AS DOUBLE)
                     * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)),
                     6) AS score
        FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, token, tf, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, token) AS rnk
        FROM scored
    )
    SELECT doc_id, token, tf, score, rnk FROM ranked WHERE rnk <= {_TFIDF_K}
    ORDER BY doc_id, rnk
    """,
)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", "token", "tf", "score", "rnk")
        .orderBy("doc_id", "rnk")
    )


# ---------------------------------------------------------------------------
# BM25 query scoring — top-20 documents for a fixed term set (the
# query-based corpus-selection / retrieval primitive).
#
# Okapi BM25 with k1=1.2, b=0.75, Lucene idf = ln(1 + (N-df+.5)/(df+.5)).
# Per-(doc,term) contributions are rounded and summed as decimal(18,6)
# (order-independent), so the per-doc score is bit-identical however the
# partial aggregation tree associates.  The final top-20 is orderBy +
# limit — Spark plans TakeOrderedAndProject (per-partition heaps + one
# tiny driver merge), NOT a global sort shuffle, which is the correct
# top-k at any scale.  Doc-length stats ride one broadcast row.
# ---------------------------------------------------------------------------
_BM25_TERMS = ("join", "hash", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

@_register(
    "corpus_bm25_search",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    dl AS (SELECT doc_id, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS dl
           FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    contrib AS (
        SELECT tf.doc_id,
               CAST(ROUND(
                 ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
                          / (CAST(dfreq.df AS DOUBLE) + 0.5))
                 * (CAST(tf.tf AS DOUBLE) * {_BM25_K1 + 1.0})
                 / (CAST(tf.tf AS DOUBLE)
                    + {_BM25_K1} * ({1.0 - _BM25_B}
                                    + {_BM25_B} * (CAST(dl.dl AS DOUBLE) / s.avgdl))),
                 6) AS DECIMAL(18,6)) AS c
        FROM tf JOIN dfreq ON tf.token = dfreq.token
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN stats s
    )
    SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score, COUNT(*) AS n_terms
    FROM contrib GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
    """,
)
def corpus_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    dl = docs.select(
        "doc_id", F.size(tokenize("text")).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + _BM25_K1 * (
        (1.0 - _BM25_B) + _BM25_B * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * (tf_d * (_BM25_K1 + 1.0)) / denom, 6)
            .cast("decimal(18,6)")
            .alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("c").cast("double").alias("score"),
            F.count("*").alias("n_terms"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(_BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Sequence packing — concat-and-chunk layout for training sequences.
#
# The Spark side uses operators/packing.ordered_prefix_sum (range
# shuffle + driver prefix of per-partition totals + per-partition
# window) instead of the oracle's single-partition global window — same
# values, scale-safe.  ctx=128 against sf docs (10-99 whitespace-ish
# tokens) exercises both many-docs-per-chunk and chunk-straddling docs.
# ---------------------------------------------------------------------------
_PACK_CTX = 128

@_register(
    "corpus_pack_chunks",
    f"""
    WITH t AS (SELECT doc_id, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens
               FROM documents),
    o AS (SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS start_offset
          FROM t WHERE n_tokens > 0)
    SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // {_PACK_CTX} AS BIGINT) AS start_chunk,
           CAST((start_offset + n_tokens - 1) // {_PACK_CTX} AS BIGINT) AS end_chunk,
           CAST((start_offset + n_tokens - 1) // {_PACK_CTX}
             - start_offset // {_PACK_CTX} + 1 AS BIGINT) AS n_chunks
    FROM o ORDER BY doc_id
    """,
)
def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.size(tokenize("text")).cast("bigint").alias("n_tokens")
    )
    packed = pack_concat_chunks(sized, "doc_id", "n_tokens", _PACK_CTX)
    return packed.select(
        "doc_id", "n_tokens", "start_offset", "start_chunk", "end_chunk",
        "n_chunks",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Embedding int8 quantization screen — per-vector symmetric-scale
# quantization error, the check run before shipping vectors to a
# quantized ANN index.  Pure Column code: transform/fold inside codegen;
# the compute is map-only over the embeddings scan (the single exchange
# in the plan is the final presentation sort).  The fold order of
# the MSE sum is the list order on both engines (list_dot_product ==
# F.aggregate left fold — same contract the green cosine queries rely
# on).  Null embeddings and all-zero vectors yield NULL stats rows, not
# errors.
# ---------------------------------------------------------------------------
@_register(
    "embed_int8_quant_stats",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    s AS (SELECT vec_id, v,
                 CAST(len(v) AS BIGINT) AS n_dims,
                 127.0 / nullif(list_aggregate(list_transform(v, x -> abs(x)),
                                               'max'), 0.0) AS scale
          FROM e),
    q AS (SELECT vec_id, v, n_dims, scale,
                 list_transform(v, x ->
                     x - least(greatest(round(x * scale), -127.0), 127.0) / scale)
                   AS err
          FROM s)
    SELECT vec_id, n_dims,
           ROUND(127.0 / scale, 6) AS max_abs,
           ROUND(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
           ROUND(list_dot_product(err, err) / CAST(n_dims AS DOUBLE), 8) AS mse
    FROM q ORDER BY vec_id
    """,
)
def embed_int8_quant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        "vec_id",
        v.alias("v"),
        F.size(v).cast("bigint").alias("n_dims"),
        (
            F.lit(127.0)
            / F.nullif(
                F.array_max(F.transform(v, F.abs)), F.lit(0.0)
            )
        ).alias("scale"),
    )
    err = F.transform(
        F.col("v"),
        lambda x: x
        - F.least(
            F.greatest(F.round(x * F.col("scale"), 0), F.lit(-127.0)),
            F.lit(127.0),
        )
        / F.col("scale"),
    )
    quant = base.withColumn("err", err)
    return quant.select(
        "vec_id",
        "n_dims",
        F.round(F.lit(127.0) / F.col("scale"), 6).alias("max_abs"),
        F.round(F.sqrt(dot_product("v", "v")), 6).alias("l2_norm"),
        F.round(
            dot_product("err", "err") / F.col("n_dims").cast("double"), 8
        ).alias("mse"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Token-budget corpus selection — keep the highest-quality documents
# whose cumulative token count fits a budget (40% of the corpus here):
# the greedy data-selection pass behind "train on the best X tokens".
#
# Ordering is (quality DESC, doc_id) — expressed to the distributed
# prefix sum as ascending (-quality, doc_id), which is the identical
# total order (negation is order-reversing and exact on doubles).  The
# budget test is integer arithmetic (cum*5 <= total*2) so the 40%
# threshold is exact on both engines; the total-token scalar rides a
# broadcast.  No global window anywhere (operators/packing.py).
# ---------------------------------------------------------------------------
_BUDGET_NUM, _BUDGET_DEN = 2, 5  # keep while cum_tokens/total <= 2/5

@_register(
    "corpus_budget_selection",
    f"""
    WITH t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS w FROM documents),
    q AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                 ROUND({stopword_hits_sql('text', LANG_STOPWORDS['en'])} * 1.0
                       / nullif(len(w), 0), 4) AS quality
          FROM t),
    f AS (SELECT * FROM q WHERE quality IS NOT NULL),
    o AS (SELECT doc_id, quality, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                     ORDER BY quality DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   + n_tokens AS cum_tokens
          FROM f),
    tot AS (SELECT SUM(n_tokens) AS total_tokens FROM f)
    SELECT doc_id, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM o, tot
    WHERE (cum_tokens - n_tokens) * {_BUDGET_DEN} < total_tokens * {_BUDGET_NUM}
    ORDER BY doc_id
    """,
)
def corpus_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.size(tokenize("text")).cast("bigint").alias("n_tokens"),
        quality_features("text")["stopword_ratio"].alias("quality"),
    ).filter(F.col("quality").isNotNull())
    # Grand total rides out of the prefix sum's driver-side partition
    # stats — no second pass over the raw scan (re-aggregating `scored`
    # would re-run tokenize + the quality regexes over the whole
    # corpus, the most expensive map work in the query).
    ranked, total_tokens = ordered_prefix_sum_with_total(
        scored.withColumn("neg_q", -F.col("quality")),
        ["neg_q", "doc_id"],
        "n_tokens",
        out_col="cum_before",
    )
    return (
        ranked.withColumn("total_tokens", F.lit(total_tokens))
        .withColumn("cum_tokens", F.col("cum_before") + F.col("n_tokens"))
        # greedy take-while on the EXCLUSIVE prefix (see
        # corpus_final_training_set): the top-quality doc is always
        # kept; the inclusive rule emits an empty set whenever one doc
        # alone exceeds the budget.
        .filter(
            (F.col("cum_tokens") - F.col("n_tokens")) * _BUDGET_DEN
            < F.col("total_tokens") * _BUDGET_NUM
        )
        .select("doc_id", "quality", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Label centroids by exact vector mean-pooling — the portable form of
# what k-means' update step computes.  Per-component values are floored
# into integer micro-units BEFORE aggregation (floor of an identical
# double is bit-portable; ROUND/CAST of doubles is NOT — Spark
# truncates double→long while DuckDB rounds, and ROUND(double,6)
# half-up diverges at boundaries), so the component sums are exact
# int64 and the mean uses the shared (2a+n) div 2n integer rounding.
#
# Plan shape: posexplode → ONE hash aggregation on (label, pos) —
# cardinality |labels|×dim, tiny.  At 100 TB this is the centroid /
# class-prototype computation over any labeled embedding corpus; the
# explode inflates rows ×dim but partial aggregation collapses them
# map-side before the only shuffle.
# ---------------------------------------------------------------------------
from vexere_lakehouse_pipeline_spark.plans.corpus import _MEAN_MICRO

@_register(
    "embed_label_centroids",
    f"""
    WITH ex AS (
        SELECT label,
               unnest(range(0, len(embedding))) AS pos,
               unnest(embedding) AS v
        FROM embeddings
    ),
    agg AS (
        SELECT label, pos,
               SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS s,
               COUNT(*) AS n
        FROM ex GROUP BY label, pos
    )
    SELECT label, pos,
           {_MEAN_MICRO.format(s="s", n="n", div="//")} AS mean_val,
           n AS n_vecs
    FROM agg ORDER BY label, pos
    """,
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    agg = ex.groupBy("label", "pos").agg(
        F.expr(
            "SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("s"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "label",
        "pos",
        F.expr(_MEAN_MICRO.format(s="s", n="n", div="DIV")).alias("mean_val"),
        F.col("n").alias("n_vecs"),
    ).orderBy("label", "pos")


# ---------------------------------------------------------------------------
# Sliding-window chunking with overlap — the RAG / long-context
# chunker: W-token windows advancing by stride S (overlap W−S tokens),
# final partial window kept, sub-window docs emit one whole-doc chunk.
# Pure Column code (transform(sequence)→explode→slice): the chunk
# count and offsets are integer arithmetic, the text slice is engine-
# native, so the whole query is oracle-exact.  Map-only over the scan
# (the one exchange is the presentation sort); chunk inflation is
# bounded by ceil(n/S) rows per doc.
# ---------------------------------------------------------------------------
_CHUNK_W = 64
_CHUNK_S = 48

@_register(
    "corpus_sliding_chunks",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    sized AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM t
              WHERE len(w) > 0),
    nc AS (SELECT doc_id, w, n,
                  CASE WHEN n <= {_CHUNK_W} THEN 1
                       ELSE (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} + 1
                  END AS n_chunks
           FROM sized),
    ex AS (SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS chunk_idx
           FROM nc)
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           chunk_idx * {_CHUNK_S} AS chunk_start,
           CAST(len(w[chunk_idx * {_CHUNK_S} + 1
                      : chunk_idx * {_CHUNK_S} + {_CHUNK_W}]) AS BIGINT)
             AS chunk_len,
           array_to_string(w[chunk_idx * {_CHUNK_S} + 1
                             : chunk_idx * {_CHUNK_S} + {_CHUNK_W}], ' ')
             AS chunk_text
    FROM ex ORDER BY doc_id, chunk_idx
    """,
)
def corpus_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokenize("text").alias("w")).withColumn(
        "n", F.size("w").cast("bigint")
    ).filter(F.col("n") > 0)
    nc = t.withColumn(
        "n_chunks",
        F.expr(
            f"CASE WHEN n <= {_CHUNK_W} THEN 1 "
            f"ELSE (n - {_CHUNK_W} + {_CHUNK_S} - 1) DIV {_CHUNK_S} + 1 END"
        ),
    )
    ex = nc.select(
        "doc_id",
        "w",
        F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_idx"),
    )
    chunk = F.expr(f"slice(w, chunk_idx * {_CHUNK_S} + 1, {_CHUNK_W})")
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx") * _CHUNK_S).alias("chunk_start"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Cross-document duplicated n-gram fraction — the Gopher-style
# "duplicate n-gram" boilerplate signal computed ACROSS the corpus
# (within-doc repetition lives in corpus_repetition_scores): for each
# document, what fraction of its distinct word 5-grams also occurs in
# at least one OTHER document.  Docs full of shared boilerplate
# (headers, templates, near-dups that survived hashing) score high and
# get filtered before training.
#
# Plan shape (shuffles annotated): explode shingles -> md5 to a short
# fixed-width key -> DISTINCT (doc, h) [1: hash on (doc_id, h)] ->
# shingle doc-frequency [2: hash on h, vocab-sized, partial agg
# map-side] -> join back on h [3] -> per-doc agg [4].  The frequency
# table stays distributed (a web corpus' shingle vocabulary is far
# beyond broadcast range); everything is integer arithmetic so the
# oracle matches bit-for-bit.
# ---------------------------------------------------------------------------
_XDOC_N = 5

@_register(
    "corpus_crossdoc_ngram_dup",
    f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    shr AS (SELECT doc_id, unnest({_duck_shingles(_XDOC_N)}) AS shingle FROM tok),
    sh AS (SELECT DISTINCT doc_id, md5(shingle) AS h FROM shr),
    dfreq AS (SELECT h, COUNT(*) AS n_docs FROM sh GROUP BY h)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN dfreq.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           CAST((1000 * SUM(CASE WHEN dfreq.n_docs >= 2 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS dup_permille
    FROM sh JOIN dfreq USING (h)
    GROUP BY sh.doc_id ORDER BY sh.doc_id
    """,
)
def corpus_crossdoc_ngram_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc count + permille of word 5-grams shared with any other
    document (inter-document boilerplate screen; cf. the within-doc
    repetition scorer).  NULL/empty texts have no shingles and drop
    out, matching the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "doc_id",
            F.explode(word_shingles("text", _XDOC_N)).alias("shingle"),
        )
        .select("doc_id", F.md5("shingle").alias("h"))
        .distinct()
    )
    dfreq = sh.groupBy("h").agg(F.count("*").alias("n_docs"))
    return (
        sh.join(dfreq, on="h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("n_docs") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_shared"),
        )
        .withColumn(
            "dup_permille", F.expr("(1000 * n_shared) DIV n_shingles")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Nucleus (top-p) vocabulary — the smallest frequency-ranked token set
# covering >= 95% of all token occurrences (the vocabulary-truncation
# decision a tokenizer build makes).  Greedy take-while on the
# EXCLUSIVE prefix sum: a token enters while coverage is still below
# the target, so the top token is always kept.  Uses the distributed
# prefix-sum operator (range shuffle + metadata-only driver stats —
# no single-partition window over the vocab table); the keep decision
# is the pure-integer comparison 20·cum_before < 19·total.
# ---------------------------------------------------------------------------
_NUC_NUM, _NUC_DEN = 19, 20  # p = 0.95

@_register(
    "corpus_nucleus_vocab",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT SUM(n) AS total FROM counts),
    pre AS (
        SELECT token, n,
               CAST(COALESCE(SUM(n) OVER (
                   ORDER BY n DESC, token
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM counts
    )
    SELECT token, n, cum_before
    FROM pre, tot
    WHERE {_NUC_DEN} * cum_before < {_NUC_NUM} * tot.total
    ORDER BY cum_before
    """,
)
def corpus_nucleus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokenize("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    ranked, total = ordered_prefix_sum_with_total(
        counts.withColumn("_negn", -F.col("n")),
        ["_negn", "token"],
        "n",
        out_col="cum_before",
    )
    return (
        ranked.filter(
            F.col("cum_before") * _NUC_DEN < F.lit(total * _NUC_NUM)
        )
        .select("token", "n", "cum_before")
        .orderBy("cum_before")
    )


# ---------------------------------------------------------------------------
# Per-language above-median quality filter — the standard "keep the
# top half per stratum" corpus cut, with the median computed EXACTLY
# (nearest-rank, deterministic tiebreak) rather than via a sketch, so
# the kept set is bit-reproducible.  The per-language median table is
# language-cardinality (tiny) and broadcasts into a map-side filter.
# ---------------------------------------------------------------------------
@_register(
    "corpus_above_median_quality",
    """
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ),
    med AS (
        SELECT lang, n_chars AS lang_median FROM ranked
        WHERE rnk = (50 * n + 99) // 100
    )
    SELECT d.doc_id, d.lang, d.n_chars, med.lang_median
    FROM documents d JOIN med ON med.lang = d.lang
    WHERE d.n_chars > med.lang_median
    ORDER BY d.doc_id
    """,
)
def corpus_above_median_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    med = (
        docs.select(
            "lang",
            "n_chars",
            F.row_number().over(w).alias("rnk"),
            F.count("*").over(Window.partitionBy("lang")).alias("n"),
        )
        .filter(F.col("rnk") == F.expr("(50 * n + 99) DIV 100"))
        .select("lang", F.col("n_chars").alias("lang_median"))
    )
    return (
        docs.join(F.broadcast(med), on="lang")
        .filter(F.col("n_chars") > F.col("lang_median"))
        .select("doc_id", "lang", "n_chars", "lang_median")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Zipf-law fit — closed-form OLS of ln(count) against ln(rank) over
# the token frequency table (natural-language corpora fit slope ≈ −1;
# a corpus whose slope drifts far off is machine junk or template
# spam).  Rank comes from the distributed prefix sum (no global
# window); each OLS term is rounded to 6dp and summed as
# DECIMAL(28,6), so Σx, Σy, Σxy, Σx² are exact and order-independent
# and the closed-form division is bit-identical on both engines.
# ln() on equal double inputs is bit-equal across engines (same
# contract the TF-IDF/BM25 oracles rely on).
# ---------------------------------------------------------------------------
@_register(
    "corpus_zipf_fit",
    f"""
    WITH tok AS (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
        FROM counts
    ),
    terms AS (
        SELECT CAST(ROUND(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(28,6)) AS x,
               CAST(ROUND(ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(28,6)) AS y,
               CAST(ROUND(ln(CAST(rnk AS DOUBLE)) * ln(CAST(n AS DOUBLE)), 6)
                    AS DECIMAL(28,6)) AS xy,
               CAST(ROUND(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE)), 6)
                    AS DECIMAL(28,6)) AS xx
        FROM ranked
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(ROUND((COUNT(*) * CAST(SUM(xy) AS DOUBLE)
                       - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                      / NULLIF(COUNT(*) * CAST(SUM(xx) AS DOUBLE)
                         - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE), 0),
                      6) AS DOUBLE) AS slope,
           CAST(ROUND((CAST(SUM(y) AS DOUBLE)
                       - ((COUNT(*) * CAST(SUM(xy) AS DOUBLE)
                           - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                          / NULLIF(COUNT(*) * CAST(SUM(xx) AS DOUBLE)
                             - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE), 0))
                         * CAST(SUM(x) AS DOUBLE)) / COUNT(*),
                      6) AS DOUBLE) AS intercept
    FROM terms
    """,
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokenize("text")).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    ranked = ordered_prefix_sum(
        counts.withColumn("_negn", -F.col("n")).withColumn("_one", F.lit(1)),
        ["_negn", "token"],
        "_one",
        out_col="rnk0",
    ).withColumn("rnk", F.col("rnk0") + 1)
    terms = ranked.select(
        F.expr("CAST(ROUND(ln(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(28,6))").alias("x"),
        F.expr("CAST(ROUND(ln(CAST(n AS DOUBLE)), 6) AS DECIMAL(28,6))").alias("y"),
        F.expr(
            "CAST(ROUND(ln(CAST(rnk AS DOUBLE)) * ln(CAST(n AS DOUBLE)), 6)"
            " AS DECIMAL(28,6))"
        ).alias("xy"),
        F.expr(
            "CAST(ROUND(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE)), 6)"
            " AS DECIMAL(28,6))"
        ).alias("xx"),
    )
    agg = terms.agg(
        F.count("*").alias("cnt"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    slope = (
        "(cnt * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / NULLIF(cnt * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)"
    )
    return agg.select(
        F.col("cnt").alias("n_tokens"),
        F.expr(f"CAST(ROUND({slope}, 6) AS DOUBLE)").alias("slope"),
        F.expr(
            f"CAST(ROUND((CAST(sy AS DOUBLE) - ({slope}) * CAST(sx AS DOUBLE))"
            " / cnt, 6) AS DOUBLE)"
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Sampling-temperature mixture (alpha = 0.5) — the standard
# multilingual/multi-domain rebalance: domain weights proportional to
# n_tokens^alpha flatten the size distribution (big domains
# down-weighted, small ones boosted), then a token budget of half the
# corpus is allotted per domain and realized as a deterministic
# hash-sample at rate min(1, target/n).  Per-lang census of the
# planned rate and what the sample actually drew.
#
# Portability: sqrt on exact BIGINT inputs is IEEE-identical; the
# per-domain sqrt is rounded to 6dp and summed as decimal(18,6) so the
# normalizer is order-independent; the rate expression is the same
# textual double tree on both engines; thresholds are floor'd to
# integer bucket space before the hash compare.
# ---------------------------------------------------------------------------
from vexere_lakehouse_pipeline_spark.functions.text import (  # noqa: E402
    whitespace_token_count,
)
from vexere_lakehouse_pipeline_spark.operators import sampling  # noqa: E402
from vexere_lakehouse_pipeline_spark.plans.corpus import (  # noqa: E402
    _DUCK_WS_TOKENS,
)

_TEMP_RATE_SQL = (
    "LEAST(1.0, CAST(rd AS DOUBLE) / CAST(s_dec AS DOUBLE)"
    " * (CAST(n_all AS DOUBLE) / 2.0) / CAST(n_tokens AS DOUBLE))"
)


@_register(
    "corpus_temperature_mix",
    f"""
    WITH d AS (SELECT doc_id, lang,
                      CAST({_DUCK_WS_TOKENS} AS BIGINT) AS n_tok
               FROM documents),
    per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS n_tokens
            FROM d GROUP BY lang),
    per2 AS (SELECT *, CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                            AS DECIMAL(18,6)) AS rd FROM per),
    tot AS (SELECT SUM(rd) AS s_dec,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_all FROM per2),
    rates AS (SELECT lang, n_docs, n_tokens, {_TEMP_RATE_SQL} AS rate
              FROM per2 CROSS JOIN tot),
    thr AS (SELECT lang, n_docs, n_tokens,
                   CAST(FLOOR(rate * 1000.0) AS BIGINT) AS rate_permille,
                   CAST(FLOOR(rate * 65536.0) AS INTEGER) AS t
            FROM rates),
    samp AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS sd,
                    CAST(SUM(d.n_tok) AS BIGINT) AS st
             FROM d JOIN thr ON thr.lang = d.lang
             WHERE {sampling.hash_bucket_sql('doc_id', 'tempmix')} < thr.t
             GROUP BY d.lang)
    SELECT t.lang, t.n_docs, t.n_tokens, t.rate_permille,
           COALESCE(s.sd, 0) AS n_docs_sampled,
           COALESCE(s.st, 0) AS n_tokens_sampled
    FROM thr t LEFT JOIN samp s ON s.lang = t.lang ORDER BY t.lang
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang", whitespace_token_count("text").alias("n_tok")
    )
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    per2 = per.withColumn(
        "rd",
        F.round(F.sqrt(F.col("n_tokens").cast("double")), 6)
        .cast("decimal(18,6)"),
    )
    tot = per2.agg(
        F.sum("rd").alias("s_dec"),
        F.sum("n_tokens").cast("long").alias("n_all"),
    )
    rate = F.least(
        F.lit(1.0),
        F.col("rd").cast("double")
        / F.col("s_dec").cast("double")
        * (F.col("n_all").cast("double") / F.lit(2.0))
        / F.col("n_tokens").cast("double"),
    )
    thr = per2.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.floor(rate * F.lit(1000.0)).cast("long").alias("rate_permille"),
        F.floor(rate * F.lit(65536.0)).cast("int").alias("t"),
    )
    samp = (
        d.join(F.broadcast(thr.select("lang", "t")), on="lang")
        .filter(sampling.hash_bucket("doc_id", "tempmix") < F.col("t"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sd"),
            F.sum("n_tok").cast("long").alias("st"),
        )
    )
    return (
        thr.join(samp, on="lang", how="left")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "rate_permille",
            F.coalesce("sd", F.lit(0)).cast("long").alias("n_docs_sampled"),
            F.coalesce("st", F.lit(0)).cast("long").alias("n_tokens_sampled"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Retrieval-quality metrics — the evaluation gate for the search family
# (BM25 / hybrid RRF / MMR): MRR, nDCG@10 and recall@10 of the BM25
# top-20 against deterministic graded qrels (relevance = number of
# distinct query terms a document contains, 0-3 — a judgment column a
# real eval set drops into unchanged).  DCG terms are rounded to 6dp
# decimals before the order-free SUM (the same associativity trick as
# the BM25 score itself), the final ratios round once to integer
# micro/permille — bit-portable.  Everything is metadata-scale after
# the BM25 ranking: the metrics touch top-20 rows plus one qrel
# aggregate.
# ---------------------------------------------------------------------------
_NDCG_K = 10
# compose the REGISTERED BM25 oracle (star_ml recall-gate pattern) so
# the metrics always score the exact ranking corpus_bm25_search defines
# — the decimal contributions sum EXACTLY before the single cast to
# double, so decimal ties order identically in both engines (a
# copy-pasted float-associative SUM(CAST(c AS DOUBLE)) ranking was a
# real cross-engine divergence, caught in round-5 code review)
_BM25_ORACLE = ORACLE_SQL["corpus_bm25_search"]


@_register(
    "search_retrieval_metrics",
    f"""
    WITH bm AS ({_BM25_ORACLE}),
    ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM bm
    ),
    tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    rel AS (SELECT doc_id, COUNT(DISTINCT token) AS rel
            FROM tok WHERE token IN ({_BM25_TERMS_SQL}) GROUP BY doc_id),
    hits AS (
        SELECT r.rnk, COALESCE(rel.rel, 0) AS rel
        FROM ranked r LEFT JOIN rel ON rel.doc_id = r.doc_id
    ),
    dcg AS (SELECT CAST(SUM(CAST(ROUND(
                       ((1 << rel) - 1) / log2(CAST(rnk + 1 AS DOUBLE)), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS dcg
            FROM hits WHERE rnk <= {_NDCG_K} AND rel > 0),
    grades AS (SELECT
                   SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS g3,
                   SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS g2,
                   SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS g1
               FROM rel),
    ideal AS (
        SELECT CAST(i.i AS BIGINT) AS irnk,
               CASE WHEN i.i <= g.g3 THEN 3
                    WHEN i.i <= g.g3 + g.g2 THEN 2
                    WHEN i.i <= g.g3 + g.g2 + g.g1 THEN 1
                    ELSE 0 END AS rel
        FROM range(1, {_NDCG_K} + 1) AS i(i) CROSS JOIN grades g
    ),
    idcg AS (SELECT CAST(SUM(CAST(ROUND(
                        ((1 << rel) - 1) / log2(CAST(irnk + 1 AS DOUBLE)), 6)
                        AS DECIMAL(18,6))) AS DOUBLE) AS idcg
             FROM ideal WHERE rel > 0),
    firstrel AS (SELECT MIN(rnk) AS fr FROM hits WHERE rel > 0),
    totals AS (SELECT COUNT(*) AS n_rel FROM rel),
    hits10 AS (SELECT COUNT(*) AS h FROM hits
               WHERE rnk <= {_NDCG_K} AND rel > 0)
    SELECT CAST(COALESCE(1000000 // firstrel.fr, 0) AS BIGINT)
               AS mrr_micro,
           CAST(ROUND(1000000 * dcg.dcg / idcg.idcg, 0) AS BIGINT)
               AS ndcg10_micro,
           CAST((1000 * hits10.h) // NULLIF(LEAST(totals.n_rel, {_NDCG_K}), 0)
               AS BIGINT) AS recall10_permille,
           CAST(hits10.h AS BIGINT) AS n_hits10,
           CAST(totals.n_rel AS BIGINT) AS n_relevant
    FROM dcg, idcg, firstrel, totals, hits10
    """,
)
def search_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ranked = (
        corpus_bm25_search(spark, sf_dir)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("score"), "doc_id")
            ),
        )
        .select("doc_id", "rnk")
    )
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    rel = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("token").alias("rel"))
    )
    # qrels for the HIT join are computed only for the 20 ranked docs —
    # the tiny ranked side broadcasts INTO the token stream (semi
    # shape); broadcasting the corpus-scale rel table was the round-5
    # review finding #2.  The full rel still feeds the count-only
    # aggregates below (totals/grades) — plain map-side aggregation,
    # nothing broadcast.
    rel20 = (
        tok.join(F.broadcast(ranked.select("doc_id")), on="doc_id")
        .filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.countDistinct("token").alias("rel"))
    )
    hits = ranked.join(F.broadcast(rel20), on="doc_id", how="left").select(
        "rnk", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    # F.shiftleft needs a literal shift — column shifts go via expr
    term = F.round(
        (F.expr("shiftleft(1, CAST(rel AS INT))") - 1)
        / F.log2(F.col("rnk").cast("double") + 1.0),
        6,
    ).cast("decimal(18,6)")
    dcg = (
        hits.filter((F.col("rnk") <= _NDCG_K) & (F.col("rel") > 0))
        .agg(F.sum(term).cast("double").alias("dcg"))
    )
    # IDCG without a global sort: the ideal ordering depends only on
    # grade COUNTS (grades are 1..3), so build the 10 ideal terms from
    # one count-aggregate crossed with a literal 1..10 sequence — no
    # all-relevant-docs ordering at any corpus size.
    grades = rel.agg(
        F.sum(F.expr("CASE WHEN rel = 3 THEN 1 ELSE 0 END")).alias("g3"),
        F.sum(F.expr("CASE WHEN rel = 2 THEN 1 ELSE 0 END")).alias("g2"),
        F.sum(F.expr("CASE WHEN rel = 1 THEN 1 ELSE 0 END")).alias("g1"),
    )
    ideal = grades.select(
        F.explode(F.sequence(F.lit(1), F.lit(_NDCG_K))).alias("irnk"),
        "g3", "g2", "g1",
    ).select(
        F.col("irnk").cast("long").alias("irnk"),
        F.expr(
            "CASE WHEN irnk <= g3 THEN 3"
            " WHEN irnk <= g3 + g2 THEN 2"
            " WHEN irnk <= g3 + g2 + g1 THEN 1 ELSE 0 END"
        ).alias("rel"),
    )
    iterm = F.round(
        (F.expr("shiftleft(1, CAST(rel AS INT))") - 1)
        / F.log2(F.col("irnk").cast("double") + 1.0),
        6,
    ).cast("decimal(18,6)")
    idcg = (
        ideal.filter(F.col("rel") > 0)
        .agg(F.sum(iterm).cast("double").alias("idcg"))
    )
    firstrel = hits.filter(F.col("rel") > 0).agg(F.min("rnk").alias("fr"))
    totals = rel.agg(F.count("*").alias("n_rel"))
    hits10 = (
        hits.filter((F.col("rnk") <= _NDCG_K) & (F.col("rel") > 0))
        .agg(F.count("*").alias("h"))
    )
    return (
        dcg.crossJoin(idcg).crossJoin(firstrel).crossJoin(totals)
        .crossJoin(hits10)
        .select(
            F.coalesce(F.expr("1000000 DIV fr"), F.lit(0)).cast("long")
            .alias("mrr_micro"),
            F.round(F.lit(1000000.0) * F.col("dcg") / F.col("idcg"), 0)
            .cast("long").alias("ndcg10_micro"),
            # NULLIF guard: with zero relevant docs both engines must
            # agree on NULL (DuckDB raises on integer div-by-zero,
            # Spark DIV returns NULL — round-5 ADVICE divergence).
            F.expr(f"(1000 * h) DIV NULLIF(LEAST(n_rel, {_NDCG_K}), 0)")
            .cast("long").alias("recall10_permille"),
            F.col("h").cast("long").alias("n_hits10"),
            F.col("n_rel").cast("long").alias("n_relevant"),
        )
    )
