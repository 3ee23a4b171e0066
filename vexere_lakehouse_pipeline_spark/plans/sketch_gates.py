"""Count-min and Bloom sketch gates over the documents corpus.

North-star surface (no reference analog — SURVEY.md §2 ends at exact
aggregation): the mergeable-summary layer for 100 TB frequency and
membership questions, following mining.py's sketch-gate pattern — the
scalable estimator runs NEXT TO the exact answer and the result rows
carry booleans asserting the estimate stayed inside its envelope.
Unlike the HLL gates (engine-specific estimators, only the exact twin
is compared), the CMS/Bloom sketches here are DETERMINISTIC md5
constructions reproduced cell-for-cell in the DuckDB oracle, so the
gate checks both cross-engine portability AND the error envelope
against an independently aggregated exact count.

Scale shapes (see operators/sketches.py): the CMS build is one
map-side-combinable groupBy with depth*width output cells regardless
of token cardinality; the Bloom decontamination probe broadcasts a
kilobyte word table and never shuffles the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.text import (
    tokenize,
    word_shingles,
)
from vexere_lakehouse_pipeline_spark.operators import sketches
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn
from vexere_lakehouse_pipeline_spark.plans.star_ml import (
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


# ---------------------------------------------------------------------------
# Count-min heavy hitters — estimate the top-15 tokens' frequencies
# from a 3x1024-cell sketch and gate the one-sided error: est >= exact
# always (CMS guarantee), and overcount <= 4 * N / width (4x the
# expected colliding mass per row; deterministic for fixed salts, so
# the gate cannot flap).  The bound compare is exact integer math:
# (est - exact) * width <= 4 * N.
# ---------------------------------------------------------------------------
_CMS_DEPTH, _CMS_WIDTH = 3, 1024

_CMS_CELLS_SQL = " UNION ALL ".join(
    f"SELECT {r} AS cms_row, "
    f"{sketches.cms_bucket_sql('token', r, _CMS_WIDTH)} AS cms_bucket, "
    "token FROM toks"
    for r in range(_CMS_DEPTH)
)


@_register(
    "sketch_cms_heavy_hitters",
    f"""
    WITH toks AS (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents),
    exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact
              FROM toks GROUP BY token),
    total AS (SELECT CAST(SUM(n_exact) AS BIGINT) AS n_total FROM exact),
    cells AS ({_CMS_CELLS_SQL}),
    cms AS (SELECT cms_row, cms_bucket, CAST(COUNT(*) AS BIGINT) AS cms_count
            FROM cells GROUP BY cms_row, cms_bucket),
    top AS (SELECT token, n_exact FROM exact
            ORDER BY n_exact DESC, token LIMIT 15),
    probe AS ({" UNION ALL ".join(
        f"SELECT token, n_exact, {r} AS cms_row, "
        f"{sketches.cms_bucket_sql('token', r, _CMS_WIDTH)} AS cms_bucket "
        "FROM top" for r in range(_CMS_DEPTH))}),
    est AS (SELECT p.token, p.n_exact,
                   CAST(MIN(COALESCE(c.cms_count, 0)) AS BIGINT) AS cms_est
            FROM probe p LEFT JOIN cms c
              ON c.cms_row = p.cms_row AND c.cms_bucket = p.cms_bucket
            GROUP BY p.token, p.n_exact)
    SELECT e.token, e.n_exact, e.cms_est,
           e.cms_est >= e.n_exact AS est_ge_exact,
           (e.cms_est - e.n_exact) * {_CMS_WIDTH} <= 4 * t.n_total
               AS overcount_in_bound
    FROM est e CROSS JOIN total t
    ORDER BY e.n_exact DESC, e.token
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokenize("text")).alias("token"))
    exact = tok.groupBy("token").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    total = exact.agg(F.sum("n_exact").cast("long").alias("n_total"))
    top = exact.orderBy(F.desc("n_exact"), "token").limit(15)
    cms = sketches.cms_build(tok, "token", _CMS_DEPTH, _CMS_WIDTH)
    est = sketches.cms_lookup(cms, top, "token", _CMS_DEPTH, _CMS_WIDTH)
    return (
        est.join(F.broadcast(total))
        .select(
            "token",
            "n_exact",
            "cms_est",
            (F.col("cms_est") >= F.col("n_exact")).alias("est_ge_exact"),
            (
                (F.col("cms_est") - F.col("n_exact")) * _CMS_WIDTH
                <= 4 * F.col("n_total")
            ).alias("overcount_in_bound"),
        )
        .orderBy(F.desc("n_exact"), "token")
    )


# ---------------------------------------------------------------------------
# Bloom decontamination gate — the production benchmark-leak filter
# shape: build a Bloom filter over the benchmark partition's DISTINCT
# 8-gram shingles (source = 'src0' stands in for the eval set), probe
# every other document's shingles against the broadcast word table,
# and verify per source: the bloom NEVER misses a true member shingle
# (no false negatives — the property decontamination relies on), with
# the hit / exact-member / flagged-doc censuses alongside so the
# false-positive cost is visible.  8-gram membership (not whole-text
# md5) because that is what leak-checking actually tests — the corpus
# has zero exact-duplicate texts but ~100 leaked 8-grams at sf0.01
# (consistent with dedup_contamination_flags's containment hits).
# ---------------------------------------------------------------------------
# 8192 x 32-bit words = 256 Kbit (64 KB broadcast): ~12k benchmark
# shingles at sf0.1 load kn/m ~ 0.18 -> fpr ~ 8e-4; production sizes m
# from the benchmark count the same way (1.44 * n * log2(1/fpr) bits).
_BLOOM_WORDS, _BLOOM_K = 8192, 4
_DECON_N = 8

_BLOOM_POS = [
    sketches.bloom_position_sql("shingle", j, _BLOOM_WORDS)
    for j in range(_BLOOM_K)
]
_BPW = sketches.BLOOM_BITS_PER_WORD


@_register(
    "sketch_bloom_decontam_gate",
    f"""
    WITH tok AS (SELECT doc_id, source, {_DUCK_TOKENS} AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, source,
                  unnest({_duck_shingles(_DECON_N)}) AS shingle
           FROM tok),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    corpus AS (SELECT doc_id, source, shingle FROM sh
               WHERE source <> 'src0'),
    bpos AS ({" UNION ALL ".join(
        f"SELECT {p} AS pos FROM bench" for p in _BLOOM_POS)}),
    bloom AS (SELECT CAST(pos // {_BPW} AS BIGINT) AS widx,
                     bit_or(CAST(1 AS BIGINT)
                            << CAST(pos % {_BPW} AS INTEGER)) AS word
              FROM bpos GROUP BY 1),
    cpos AS ({" UNION ALL ".join(
        f"SELECT doc_id, source, shingle, {p} AS pos FROM corpus"
        for p in _BLOOM_POS)}),
    probed AS (SELECT c.doc_id, c.source, c.shingle,
                      bool_and((COALESCE(b.word, 0)
                                & (CAST(1 AS BIGINT)
                                   << CAST(c.pos % {_BPW} AS INTEGER)))
                               <> 0) AS bloom_hit
               FROM cpos c LEFT JOIN bloom b
                 ON b.widx = CAST(c.pos // {_BPW} AS BIGINT)
               GROUP BY c.doc_id, c.source, c.shingle),
    flagged AS (SELECT p.doc_id, p.source, p.bloom_hit,
                       (m.shingle IS NOT NULL) AS is_member
                FROM probed p LEFT JOIN bench m ON m.shingle = p.shingle)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE bloom_hit) AS BIGINT) AS n_bloom_hits,
           CAST(COUNT(*) FILTER (WHERE is_member) AS BIGINT)
               AS n_exact_member,
           CAST(COUNT(DISTINCT doc_id) FILTER (WHERE bloom_hit) AS BIGINT)
               AS n_docs_flagged,
           CAST(COUNT(DISTINCT doc_id) FILTER (WHERE is_member) AS BIGINT)
               AS n_docs_contaminated,
           bool_and(bloom_hit OR NOT is_member) AS no_false_negatives
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def sketch_bloom_decontam_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        F.explode(word_shingles("text", _DECON_N)).alias("shingle"),
    ).distinct()
    bench = (
        sh.filter(F.col("source") == "src0").select("shingle").distinct()
    )
    corpus = sh.filter(F.col("source") != "src0")
    bloom = sketches.bloom_build(bench, "shingle", _BLOOM_WORDS, _BLOOM_K)
    probed = sketches.bloom_probe(
        bloom, corpus, "shingle", _BLOOM_WORDS, _BLOOM_K
    )
    flagged = probed.join(
        F.broadcast(bench.withColumn("is_member", F.lit(True))),
        on="shingle",
        how="left",
    ).withColumn("is_member", F.coalesce("is_member", F.lit(False)))
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.count(F.when(F.col("bloom_hit"), 1))
            .cast("long")
            .alias("n_bloom_hits"),
            F.count(F.when(F.col("is_member"), 1))
            .cast("long")
            .alias("n_exact_member"),
            F.countDistinct(F.when(F.col("bloom_hit"), F.col("doc_id")))
            .cast("long")
            .alias("n_docs_flagged"),
            F.countDistinct(F.when(F.col("is_member"), F.col("doc_id")))
            .cast("long")
            .alias("n_docs_contaminated"),
            F.every(F.col("bloom_hit") | ~F.col("is_member")).alias(
                "no_false_negatives"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# KMV audience-overlap gate — per event-type PAIR, estimate the
# distinct-user union and Jaccard overlap from two merged 256-value
# KMV sketches and gate both against the exact answers.  This is the
# sketch the HLL rollup can't be: HLL unions but never intersects;
# KMV sketches merge (keep the m smallest of the union) AND estimate
# Jaccard as the fraction of the merged sketch present in both sides
# (Beyer et al., SIGMOD'07).  At 100 TB the per-group sketch is 256
# int64s — every pairwise overlap question is then answered from
# kilobytes without re-scanning events.
# ---------------------------------------------------------------------------
_KMV_M = 256
_KMV_EST = (
    f"CAST(ROUND({_KMV_M - 1} * POWER(2.0, 48) / CAST(h_m AS DOUBLE), 0)"
    " AS BIGINT)"
)


@_register(
    "sketch_kmv_overlap_gate",
    f"""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    dh AS (SELECT DISTINCT event_type,
                  {sketches.kmv_hash_sql('user_id')} AS h
           FROM du),
    sk AS (SELECT event_type, h FROM (
               SELECT event_type, h,
                      ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY h) AS rn
               FROM dh) WHERE rn <= {_KMV_M}),
    d_exact AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d
                FROM du GROUP BY event_type),
    prs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
            FROM (SELECT DISTINCT event_type FROM du) a
            JOIN (SELECT DISTINCT event_type FROM du) b
              ON a.event_type < b.event_type),
    inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     CAST(COUNT(*) AS BIGINT) AS n_inter
              FROM du a JOIN du b ON a.user_id = b.user_id
                   AND a.event_type < b.event_type
              GROUP BY 1, 2),
    exact AS (SELECT p.type_a, p.type_b,
                     da.d + db.d - COALESCE(i.n_inter, 0) AS d_union_exact,
                     COALESCE(i.n_inter, 0) AS n_inter
              FROM prs p
              JOIN d_exact da ON da.event_type = p.type_a
              JOIN d_exact db ON db.event_type = p.type_b
              LEFT JOIN inter i ON i.type_a = p.type_a
                   AND i.type_b = p.type_b),
    merged AS (SELECT p.type_a, p.type_b, s.h,
                      MAX(CASE WHEN s.event_type = p.type_a
                               THEN 1 ELSE 0 END) AS in_a,
                      MAX(CASE WHEN s.event_type = p.type_b
                               THEN 1 ELSE 0 END) AS in_b
               FROM prs p JOIN sk s
                 ON s.event_type IN (p.type_a, p.type_b)
               GROUP BY 1, 2, 3),
    usk AS (SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                                             ORDER BY h) AS rn
                FROM merged) WHERE rn <= {_KMV_M}),
    est AS (SELECT type_a, type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_sk,
                   MAX(h) AS h_m,
                   CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
            FROM usk GROUP BY 1, 2),
    scored AS (SELECT e.type_a, e.type_b, x.d_union_exact,
                      CASE WHEN e.n_sk < {_KMV_M} THEN e.n_sk
                           ELSE {_KMV_EST} END AS d_union_est,
                      CAST(FLOOR(1000.0 * x.n_inter
                                 / CAST(x.d_union_exact AS DOUBLE))
                           AS BIGINT) AS jacc_exact_permille,
                      CAST(FLOOR(1000.0 * e.n_both
                                 / CAST(e.n_sk AS DOUBLE))
                           AS BIGINT) AS jacc_est_permille
               FROM est e JOIN exact x
                 ON x.type_a = e.type_a AND x.type_b = e.type_b)
    SELECT type_a, type_b, d_union_exact, d_union_est,
           jacc_exact_permille, jacc_est_permille,
           ABS(d_union_est - d_union_exact) * 4 <= d_union_exact
               AS union_within_25pct,
           ABS(jacc_est_permille - jacc_exact_permille) <= 100
               AS jaccard_within_100pm
    FROM scored ORDER BY type_a, type_b
    """,
)
def sketch_kmv_overlap_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    d_exact = du.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    types = du.select("event_type").distinct()
    prs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    inter = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    exact = (
        prs.join(
            d_exact.select(
                F.col("event_type").alias("type_a"), F.col("d").alias("_da")
            ),
            on="type_a",
        )
        .join(
            d_exact.select(
                F.col("event_type").alias("type_b"), F.col("d").alias("_db")
            ),
            on="type_b",
        )
        .join(inter, on=["type_a", "type_b"], how="left")
        .select(
            "type_a",
            "type_b",
            (
                F.col("_da") + F.col("_db")
                - F.coalesce("n_inter", F.lit(0))
            ).alias("d_union_exact"),
            F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
        )
    )
    sk = sketches.kmv_sketch(ev, "user_id", ["event_type"], m=_KMV_M)
    merged = (
        F.broadcast(prs)
        .join(
            sk.select("event_type", F.col("kmv_h").alias("h")),
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("type_a", "type_b").orderBy("h")
    usk = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_M)
    )
    est = usk.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_sk"),
        F.max("h").alias("h_m"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    scored = est.join(exact, on=["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "d_union_exact",
        F.when(F.col("n_sk") < _KMV_M, F.col("n_sk"))
        .otherwise(F.expr(_KMV_EST))
        .alias("d_union_est"),
        F.floor(
            F.lit(1000.0) * F.col("n_inter")
            / F.col("d_union_exact").cast("double")
        )
        .cast("long")
        .alias("jacc_exact_permille"),
        F.floor(
            F.lit(1000.0) * F.col("n_both") / F.col("n_sk").cast("double")
        )
        .cast("long")
        .alias("jacc_est_permille"),
    )
    return scored.select(
        "*",
        (
            F.abs(F.col("d_union_est") - F.col("d_union_exact")) * 4
            <= F.col("d_union_exact")
        ).alias("union_within_25pct"),
        (
            F.abs(F.col("jacc_est_permille") - F.col("jacc_exact_permille"))
            <= 100
        ).alias("jaccard_within_100pm"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# Hybrid retrieval via reciprocal-rank fusion — the lexical channel
# (BM25 over the corpus_ext fixture query terms) and the semantic
# channel (exact cosine top-20 from the query embedding, vec_id 0)
# each produce a ranking; RRF fuses them as sum over channels of
# floor(1e6 / (60 + rank)) — the standard k=60 formula in INTEGER
# micro-units, so the fusion itself is exact cross-engine (no float
# sum-order anywhere).  This is the two-tower + keyword ensemble every
# retrieval-backed data pipeline runs; at 100 TB each channel is its
# own pruned top-k (BM25 touches only posting rows of the query terms,
# the ANN channel swaps in topk_lsh/topk_hamming), and the fusion is a
# k-row full-outer join.
# ---------------------------------------------------------------------------
from vexere_lakehouse_pipeline_spark.plans.corpus_ext import (  # noqa: E402
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
)
from vexere_lakehouse_pipeline_spark.plans.star_ml import (  # noqa: E402
    _DUCK_COS,
    _DUCK_EMB,
)

_RRF_K = 60
_RRF_TOPK = 10
_RRF_CAND = 20
_RRF_QUERY_VEC = 0  # fixture query embedding (aligned with doc_id 0)

# the Spark side reuses corpus_bm25_search (top _BM25_TOPK rows) as
# the lexical channel, so the oracle's candidate depth must match it
from vexere_lakehouse_pipeline_spark.plans.corpus_ext import (  # noqa: E402
    _BM25_TOPK,
)

assert _RRF_CAND == _BM25_TOPK, "lexical channel depth drifted"
_RRF_COS = _DUCK_COS.format(a="e.v", b="q.v")

_RRF_SQL = f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    dl AS (SELECT doc_id, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS dl
           FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           WHERE token IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
           GROUP BY doc_id, token),
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
    ),
    lex AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
            FROM (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS score
                  FROM contrib GROUP BY doc_id
                  ORDER BY score DESC, doc_id LIMIT {_RRF_CAND})),
    e AS ({_DUCK_EMB}),
    q AS (SELECT v FROM e WHERE vec_id = {_RRF_QUERY_VEC}),
    sem AS (SELECT vec_id AS doc_id,
                   ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id)
                       AS sem_rank
            FROM (SELECT e.vec_id, {_RRF_COS} AS cos_sim
                  FROM e CROSS JOIN q
                  WHERE e.vec_id <> {_RRF_QUERY_VEC}
                    AND {_RRF_COS} IS NOT NULL
                  ORDER BY cos_sim DESC, e.vec_id LIMIT {_RRF_CAND})),
    fused AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                     l.lex_rank, s.sem_rank,
                     COALESCE(CAST(FLOOR(1000000 / ({_RRF_K} + l.lex_rank))
                                   AS BIGINT), 0)
                     + COALESCE(CAST(FLOOR(1000000 / ({_RRF_K} + s.sem_rank))
                                     AS BIGINT), 0) AS rrf_micro
              FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id)
    SELECT doc_id, lex_rank, sem_rank, CAST(rrf_micro AS BIGINT) AS rrf_micro
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_TOPK}
    """


@_register("search_hybrid_rrf", _RRF_SQL)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from vexere_lakehouse_pipeline_spark.operators import similarity
    from vexere_lakehouse_pipeline_spark.plans.corpus_ext import (
        corpus_bm25_search,
    )

    lex = corpus_bm25_search(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("lex_rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    sem = similarity.topk_bruteforce(
        emb, emb.filter(F.col("vec_id") == _RRF_QUERY_VEC), k=_RRF_CAND
    ).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("sem_rank")
    )
    rrf = lambda r: F.coalesce(  # noqa: E731
        F.floor(F.lit(1000000) / (F.lit(_RRF_K) + F.col(r))).cast("long"),
        F.lit(0),
    )
    # union + groupBy instead of a full-outer join: a full outer can't
    # broadcast, so Spark planned the only sort-merge join in the repo
    # for two 20-row rankings; the union agg keeps it all map-side
    both = lex.select(
        "doc_id", "lex_rank", F.lit(None).cast("int").alias("sem_rank")
    ).unionByName(
        sem.select(
            "doc_id", F.lit(None).cast("int").alias("lex_rank"), "sem_rank"
        )
    )
    fused = (
        both.groupBy("doc_id")
        .agg(
            F.max("lex_rank").alias("lex_rank"),
            F.max("sem_rank").alias("sem_rank"),
        )
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (rrf("lex_rank") + rrf("sem_rank")).cast("long")
            .alias("rrf_micro"),
        )
    )
    return fused.orderBy(F.desc("rrf_micro"), "doc_id").limit(_RRF_TOPK)


# ---------------------------------------------------------------------------
# Exact phrase search over a positional inverted index — posting rows
# (token, doc_id, position) for the two query terms are joined on
# doc_id with the adjacency predicate pos2 = pos1 + 1; a doc matches
# where the terms are ADJACENT IN ORDER, not merely co-occurring
# (the precision tier BM25's bag-of-words scoring cannot express).
# At 100 TB the positional index is materialized once, partitioned by
# token, so a phrase query scans exactly its terms' posting lists —
# the fact table is never touched at query time.  Positions are
# 0-based on both engines (posexplode / unnest(range)-1).
# ---------------------------------------------------------------------------
_PHRASE = ("spark", "hash")

_PHRASE_SQL = f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
    pos AS (SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos,
                   t[CAST(i AS BIGINT)] AS token
            FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)),
    p1 AS (SELECT doc_id, pos FROM pos WHERE token = '{_PHRASE[0]}'),
    p2 AS (SELECT doc_id, pos FROM pos WHERE token = '{_PHRASE[1]}'),
    hits AS (SELECT p1.doc_id, p1.pos FROM p1
             JOIN p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           MIN(pos) AS first_pos
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """


@_register("search_phrase_match", _PHRASE_SQL)
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(tokenize("text")).alias("pos", "token"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")
    p1 = pos.filter(F.col("token") == _PHRASE[0]).select("doc_id", "pos")
    p2 = pos.filter(F.col("token") == _PHRASE[1]).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    hits = p1.join(
        p2,
        (F.col("doc_id") == F.col("doc_id2"))
        & (F.col("pos2") == F.col("pos") + F.lit(1)),
    ).select("doc_id", "pos")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("pos").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking — greedy maximal-marginal-relevance over
# the exact top-20 cosine candidates of the fixture query (vec_id 0):
# each of the 5 steps picks argmax of lambda*rel - (1-lambda)*max
# similarity to the already-selected set, lambda = 0.7.  All scores
# are INTEGER micro-units (round(cos6 * 1e6)) and the combine is
# 7*rel - 3*max_sim in exact int64, so every greedy pick is bit-
# portable — no float sum-order anywhere.  The greedy loop is k
# unrolled dataframe steps over a 20-row broadcastable candidate set:
# at 100 TB candidate generation is the ANN tier's job (topk_lsh /
# topk_hamming, recall-gated); MMR itself always runs on a top-N that
# fits in one partition, which is why unrolling is the RIGHT
# distributed shape, not a compromise.
# ---------------------------------------------------------------------------
_MMR_K = 5
_MMR_CAND = 20
_MMR_QUERY_VEC = 0
_MMR_COS_Q = _DUCK_COS.format(a="e.v", b="q.v")
_MMR_COS_P = _DUCK_COS.format(a="a.v", b="b.v")


def _mmr_oracle() -> str:
    parts = [
        f"e AS ({_DUCK_EMB})",
        f"q AS (SELECT v FROM e WHERE vec_id = {_MMR_QUERY_VEC})",
        f"""cand AS (
            SELECT e.vec_id,
                   CAST(ROUND({_MMR_COS_Q} * 1000000, 0) AS BIGINT) AS rel
            FROM e CROSS JOIN q
            WHERE e.vec_id <> {_MMR_QUERY_VEC} AND {_MMR_COS_Q} IS NOT NULL
            ORDER BY {_MMR_COS_Q} DESC, e.vec_id LIMIT {_MMR_CAND})""",
        "ce AS (SELECT e.vec_id, e.v FROM e JOIN cand c"
        " ON c.vec_id = e.vec_id)",
        f"""pair AS (
            SELECT a.vec_id AS pa, b.vec_id AS pb,
                   CAST(ROUND({_MMR_COS_P} * 1000000, 0) AS BIGINT) AS sim
            FROM ce a JOIN ce b ON a.vec_id <> b.vec_id)""",
        "sel1 AS (SELECT CAST(1 AS INTEGER) AS step, vec_id, rel,"
        " 7 * rel AS mmr FROM cand ORDER BY rel DESC, vec_id LIMIT 1)",
    ]
    for i in range(2, _MMR_K + 1):
        parts.append(
            f"""s{i} AS (
            SELECT CAST({i} AS INTEGER) AS step, c.vec_id, c.rel,
                   7 * c.rel - 3 * MAX(p.sim) AS mmr
            FROM cand c JOIN pair p ON p.pa = c.vec_id
                 AND p.pb IN (SELECT vec_id FROM sel{i - 1})
            WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
            GROUP BY c.vec_id, c.rel
            ORDER BY mmr DESC, c.vec_id LIMIT 1)"""
        )
        parts.append(
            f"sel{i} AS (SELECT * FROM sel{i - 1}"
            f" UNION ALL SELECT * FROM s{i})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f""" SELECT step, vec_id, rel AS rel_micro,
               CAST(mmr AS BIGINT) AS mmr_score
           FROM sel{_MMR_K} ORDER BY step"""
    )


@_register("search_mmr_rerank", _mmr_oracle())
def search_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    # cand and pair are reused by every unrolled greedy step; without a
    # checkpoint the deep final plan recomputes the full-table top-k
    # once per step (measured 22s -> 3s at sf0.01).  Both frames are
    # tiny (<= N and N(N-1) rows, N = _MMR_CAND).
    cand = similarity.topk_bruteforce(
        emb, emb.filter(F.col("vec_id") == _MMR_QUERY_VEC), k=_MMR_CAND
    ).select(
        "vec_id",
        F.round(F.col("cos_sim") * 1000000, 0).cast("long").alias("rel"),
    ).localCheckpoint(eager=True)
    ce = emb.join(cand.select("vec_id"), on="vec_id")
    pair = similarity.topk_bruteforce(ce, ce, k=_MMR_CAND - 1).select(
        F.col("query_id").alias("pa"),
        F.col("vec_id").alias("pb"),
        F.round(F.col("cos_sim") * 1000000, 0).cast("long").alias("sim"),
    ).localCheckpoint(eager=True)
    selected = (
        cand.orderBy(F.desc("rel"), "vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("step"),
            "vec_id",
            "rel",
            (F.lit(7) * F.col("rel")).alias("mmr"),
        )
    )
    for step in range(2, _MMR_K + 1):
        chosen = selected.select("vec_id")
        max_sim = (
            pair.join(chosen.withColumnRenamed("vec_id", "pb"), on="pb")
            .groupBy("pa")
            .agg(F.max("sim").alias("max_sim"))
        )
        pick = (
            cand.join(chosen, on="vec_id", how="left_anti")
            .join(max_sim, cand["vec_id"] == max_sim["pa"])
            .select(
                F.lit(step).alias("step"),
                "vec_id",
                "rel",
                (F.lit(7) * F.col("rel") - F.lit(3) * F.col("max_sim"))
                .alias("mmr"),
            )
            .orderBy(F.desc("mmr"), "vec_id")
            .limit(1)
        )
        # keep the greedy chain linear: without this, step i's plan
        # embeds step i-1's twice (anti-join + max-sim join), doubling
        # subtrees per step
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select(
        "step",
        "vec_id",
        F.col("rel").alias("rel_micro"),
        F.col("mmr").cast("long").alias("mmr_score"),
    ).orderBy("step")
