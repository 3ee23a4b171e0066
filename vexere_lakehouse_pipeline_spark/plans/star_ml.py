"""Training-data-pipeline queries (dedup / similarity / text analysis)
over the driver star schema, with DuckDB oracles.

These are the north-star operators (BASELINE.json): each runs the real
distributed operator from ``operators/`` / ``functions/`` on Spark and
is verified against an independently-written DuckDB SQL re-expression
of the same algorithm.  Portability contract: only md5, instr, substr,
regexes and arithmetic — primitives that are bit-stable across engines
— feed anything hashed; float cosines are computed double-precision
with identical fold order on both sides and rounded to 6dp.

Where SQL fragments must match the Spark expression EXACTLY (simhash
bit math, language-ID tie-breaking), the fragment is generated once in
Python and fed to both engines (Spark via ``F.expr``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.cleaning import (
    NORMALIZE_GENERIC_RULES,
    NORMALIZE_SPECIFIC_RULES,
    VIETNAMESE_CHARS,
    bus_type_category,
    normalize_place,
    parse_duration_hours,
    parse_price_vnd,
)
from vexere_lakehouse_pipeline_spark.functions.text import (
    BPE_ISH_RE,
    LANG_STOPWORDS,
    PUNCT_RE,
    bpe_ish_token_count,
    stopword_hits,
    stopword_hits_sql,
    detect_language,
    document_fingerprint,
    quality_features,
    whitespace_token_count,
)
from vexere_lakehouse_pipeline_spark.operators import (
    ann_index,
    dedup,
    sampling,
    similarity,
)
from vexere_lakehouse_pipeline_spark.operators.caching import CheckpointCache
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# One materialization per approximate top-k arm (round-6 verdict #2):
# every sim_topk_X row has a sim_recall_X_vs_bruteforce sibling that
# re-ran the identical approximate arm it had just produced — ~15-20 s
# of duplicated index-build + scan work per bench/gate sweep.  The
# decorator pins the arm's RESULT (|Q|·k rows — trivially small) with
# a lazy localCheckpoint keyed (session, query_name, sf_dir), so
# whichever of the pair runs first materializes it and the other
# reuses the blocks.  Row values are unchanged by construction
# (checkpointing is a barrier, not a transformation), so every oracle
# hash survives.  LRU-capped like every CheckpointCache.
# maxsize covers the full arm population (inline topk rows + their
# prebuilt serving siblings + the truth arm) so a full check_oracle
# sweep never thrashes the LRU; entries are |Q|·k-row checkpoints, KBs
_APPROX_ARM_CACHE = CheckpointCache(maxsize=48)


def reset_shared_arms(keep_names: tuple = ("sim_topk_bruteforce",)) -> None:
    """Benchmark/probe hook: evict every cached arm EXCEPT the named
    ones.  The shared-arm cache exists so a gate reuses the arm its
    sim_topk sibling just computed (the production shape, and what
    check_oracle benefits from) — but a TIMING harness that runs the
    same row twice would otherwise measure the memo on rep 2.  bench.py
    calls this before every rep with the truth arm kept (the recorded
    r6 estimator semantics: every row recomputes its own pipeline per
    rep; the brute-force truth stays warm across the gate rows), and
    tools/scale_probe.py calls it with keep_names=() so exponents are
    fully cold."""
    _APPROX_ARM_CACHE.drop_if(lambda k: k[1] not in keep_names)


def _shared_arm(fn: QueryFn) -> QueryFn:
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        # plan-audit bypass: the cache returns a localCheckpoint
        # wrapper whose plan is an opaque LogicalRDD scan — a plan
        # auditor (tools/explain_report.py) needs the real pipeline
        if os.environ.get("VLPS_DISABLE_ARM_CACHE"):
            return fn(spark, sf_dir)
        return _APPROX_ARM_CACHE.get(
            spark, fn.__name__, sf_dir, lambda: fn(spark, sf_dir)
        )

    return wrapped


# DuckDB mirror of functions.text.tokenize (lowercase word tokens).
from vexere_lakehouse_pipeline_spark.functions.text import LANG_TOKEN_SPLIT_RE

_DUCK_TOKENS = (
    "list_filter(string_split_regex(lower(text), "
    f"'{LANG_TOKEN_SPLIT_RE}'), x -> x <> '')"
)

# DuckDB mirror of word_shingles(n): n-gram list with the whole-text
# fallback for docs shorter than n words (functions/text.py semantics).
def _duck_shingles(n: int) -> str:
    return (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_transform(range(1, len(w) - {n - 2}), i -> array_to_string(w[i:i+{n - 1}], ' ')) "
        "WHEN len(w) > 0 THEN [array_to_string(w, ' ')] "
        "ELSE CAST([] AS VARCHAR[]) END"
    )


_N_HASHES = dedup.N_BANDS * dedup.N_ROWS


def _duck_sub_split(id_sql: str, n_sql: str, cap: int) -> str:
    """DuckDB sub-bucket assignment mirroring dedup._split_hot_buckets:
    sub-cap buckets keep sub 0; oversized buckets hash-assign members
    to ceil(n/cap) sub-buckets with the portable 32-bit md5 bucket
    hash (same SUBSPLIT_SALT both engines)."""
    return (
        f"CASE WHEN {n_sql} <= {cap} THEN 0 "
        f"ELSE ({sampling.hash_bucket_wide_sql(id_sql, dedup.SUBSPLIT_SALT)}) "
        f"% CAST(({n_sql} + {cap} - 1) // {cap} AS INTEGER) END"
    )


_DUCK_SHINGLE_CTES = f"""
    tok AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, unnest({_duck_shingles(dedup.SHINGLE_N)}) AS shingle
           FROM tok),
    grid AS (SELECT unnest(range(0, {_N_HASHES})) AS i),
    mins AS (
        SELECT doc_id, i,
               min(substr(md5(CAST(i // 4 AS VARCHAR) || ':' || shingle),
                          CAST(1 + 8 * (i % 4) AS INTEGER), 8)) AS mh
        FROM sh, grid GROUP BY doc_id, i
    ),
    bands AS (
        SELECT doc_id, i // {dedup.N_ROWS} AS b,
               string_agg(mh, '|' ORDER BY i) AS band_key
        FROM mins GROUP BY doc_id, i // {dedup.N_ROWS}
    ),
    bsz AS (SELECT b, band_key, COUNT(*) AS bn FROM bands GROUP BY b, band_key),
    bok AS (SELECT bands.doc_id, bands.b, bands.band_key,
                   {_duck_sub_split('bands.doc_id', 'bsz.bn',
                                    dedup.MAX_BUCKET_SIZE)} AS sub
            FROM bands JOIN bsz ON bsz.b = bands.b
                 AND bsz.band_key = bands.band_key),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        FROM bok a JOIN bok c ON a.b = c.b AND a.band_key = c.band_key
                     AND a.sub = c.sub AND a.doc_id < c.doc_id
    )"""


# ---------------------------------------------------------------------------
# Dedup: exact
# ---------------------------------------------------------------------------
@_register(
    "dedup_exact_groups",
    """
    SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text) ORDER BY text_hash
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_duplicate_groups(docs).orderBy("text_hash")


# ---------------------------------------------------------------------------
# Dedup: MinHash + LSH candidate pairs
# ---------------------------------------------------------------------------
@_register(
    "dedup_minhash_lsh_pairs",
    f"""
    WITH {_DUCK_SHINGLE_CTES}
    SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(docs).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# LSH pairs with exact-dup collapse first — the production ORDERING
# (exact dedup before near-dup): identical texts are collapsed to one
# representative (min doc_id per text, grouped by md5 so the shuffle
# key is 16 bytes, never the full text) and LSH runs over
# representatives only.  This is the standing fix for boilerplate
# skew: the round-7 skew16 probe shows raw LSH paying bands x n x
# cap/2 bounded-but-real work when one text owns 15/16 of the corpus
# (in-regime exponent 1.26, 139 s at hot-16x), while this variant
# collapses the hot text to ONE doc before any banding — the
# mega-bucket never exists.  Exact-dup membership itself stays
# available n-linearly from dedup_exact_groups.
# ---------------------------------------------------------------------------
def _shingle_ctes_over(src: str) -> str:
    """The shared shingle/band/pair CTE chain re-pointed at ``src``
    instead of the documents table.  Guarded source surgery (ADVICE
    r7): the marker must appear EXACTLY once, so a reformat of
    _DUCK_SHINGLE_CTES that stops (or over-) matching fails loudly at
    import instead of silently desynchronizing oracle and pipeline."""
    marker = "FROM documents)"
    if _DUCK_SHINGLE_CTES.count(marker) != 1:
        raise AssertionError(
            f"_DUCK_SHINGLE_CTES: expected exactly one {marker!r}, "
            f"found {_DUCK_SHINGLE_CTES.count(marker)}"
        )
    return _DUCK_SHINGLE_CTES.replace(marker, f"FROM {src})")


@_register(
    "dedup_minhash_lsh_pairs_collapsed",
    f"""
    WITH reps AS (SELECT MIN(doc_id) AS doc_id, text
                  FROM documents GROUP BY text),
    {_shingle_ctes_over("reps")}
    SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh_pairs_collapsed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    reps = (
        docs.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
        .drop("_h")
    )
    return dedup.lsh_candidate_pairs(reps).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Dedup: exact n-gram Jaccard over the LSH candidates
# ---------------------------------------------------------------------------
@_register(
    "dedup_ngram_jaccard_pairs",
    f"""
    WITH {_DUCK_SHINGLE_CTES},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_a
        JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT p.doc_a, p.doc_b,
           ROUND(COALESCE(i.n_inter, 0) * 1.0
                 / (x.n + y.n - COALESCE(i.n_inter, 0)), 4) AS jaccard
    FROM pairs p
    LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    JOIN sizes x ON x.doc_id = p.doc_a
    JOIN sizes y ON y.doc_id = p.doc_b
    ORDER BY p.doc_a, p.doc_b
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Dedup: 16-bit SimHash signatures (bit math shared with the oracle)
# ---------------------------------------------------------------------------
_SIMHASH_SUMS = ", ".join(
    f"sum({dedup.simhash_bit_contrib_sql(i)}) AS s{i}" for i in range(16)
)
_SIMHASH_COMBINE = " + ".join(
    f"CASE WHEN s{i} > 0 THEN {2 ** i} ELSE 0 END" for i in range(16)
)


@_register(
    "dedup_simhash_signatures",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    hs AS (SELECT doc_id, md5(token) AS h FROM tok),
    sums AS (SELECT doc_id, {_SIMHASH_SUMS} FROM hs GROUP BY doc_id)
    SELECT doc_id, CAST({_SIMHASH_COMBINE} AS BIGINT) AS simhash
    FROM sums ORDER BY doc_id
    """,
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash16(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Dedup: asymmetric containment (excerpt detection) on LSH survivors
# ---------------------------------------------------------------------------
_CONTAIN_MIN = 0.9


@_register(
    "dedup_containment_pairs",
    f"""
    WITH tok AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    shd AS (SELECT DISTINCT doc_id, unnest({_duck_shingles(dedup.CONTAIN_SHINGLE_N)}) AS shingle
            FROM tok),
    hh AS (SELECT doc_id, md5(shingle) AS h FROM shd),
    rk AS (SELECT doc_id, h,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
           FROM hh),
    probes AS (SELECT doc_id AS doc_sub, h FROM rk
               WHERE rn <= {dedup.CONTAIN_PROBES}),
    pc AS (SELECT h, COUNT(*) AS pn FROM hh GROUP BY h),
    post AS (SELECT hh.doc_id AS doc_super, hh.h FROM hh
             JOIN pc USING (h) WHERE pc.pn <= {dedup.MAX_BUCKET_SIZE}),
    cand AS (SELECT DISTINCT doc_sub, doc_super
             FROM probes JOIN post USING (h)
             WHERE doc_sub <> doc_super),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_sub, c.doc_super, COUNT(*) AS n_inter
        FROM cand c
        JOIN hh a ON a.doc_id = c.doc_sub
        JOIN hh b ON b.doc_id = c.doc_super AND b.h = a.h
        GROUP BY c.doc_sub, c.doc_super
    )
    SELECT c.doc_sub, c.doc_super,
           ROUND(COALESCE(i.n_inter, 0) * 1.0 / s.n, 4) AS containment
    FROM cand c
    LEFT JOIN inter i ON i.doc_sub = c.doc_sub AND i.doc_super = c.doc_super
    JOIN sizes s ON s.doc_id = c.doc_sub
    WHERE ROUND(COALESCE(i.n_inter, 0) * 1.0 / s.n, 4) >= {_CONTAIN_MIN}
    ORDER BY c.doc_sub, c.doc_super
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excerpt/quotation detection: docs whose shingle set is ≥90%
    contained in another doc's.  Candidates come from a bottom-m
    sketch probe join, NOT Jaccard LSH — see
    operators/dedup.py:containment_pairs for the recall argument."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, min_containment=_CONTAIN_MIN).orderBy(
        "doc_sub", "doc_super"
    )


# ---------------------------------------------------------------------------
# Dedup: SimHash banded hamming near-pairs (Manku-Jain-Sarma WWW'07
# banding; exact recall for hamming <= SIMHASH_BANDS - 1 by pigeonhole).
# ---------------------------------------------------------------------------
_SIMHASH_BAND_W = dedup.SIMHASH_BITS // dedup.SIMHASH_BANDS
# Wide signature fragments for the near-pair query (the signatures
# query above stays at the oracle-pinned 16-bit width).
_SIMHASH_NP_SUMS = ", ".join(
    f"sum({dedup.simhash_bit_contrib_sql(i)}) AS s{i}"
    for i in range(dedup.SIMHASH_BITS)
)
_SIMHASH_NP_COMBINE = " + ".join(
    f"CASE WHEN s{i} > 0 THEN {2 ** i} ELSE 0 END"
    for i in range(dedup.SIMHASH_BITS)
)


@_register(
    "dedup_simhash_near_pairs",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents),
    hs AS (SELECT doc_id, md5(token) AS h FROM tok),
    sums AS (SELECT doc_id, {_SIMHASH_NP_SUMS} FROM hs GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST({_SIMHASH_NP_COMBINE} AS BIGINT) AS simhash FROM sums),
    bands AS (
        SELECT doc_id, simhash, b,
               (simhash >> CAST({_SIMHASH_BAND_W} * b AS INTEGER))
                 & {2 ** _SIMHASH_BAND_W - 1} AS band_val
        FROM sig, (SELECT unnest(range(0, {dedup.SIMHASH_BANDS})) AS b)
    ),
    sbsz AS (SELECT b, band_val, COUNT(*) AS bn FROM bands GROUP BY b, band_val),
    sbok AS (SELECT bands.*,
                    {_duck_sub_split('bands.doc_id', 'sbsz.bn',
                                     dedup.MAX_BUCKET_SIZE)} AS sub
             FROM bands
             JOIN sbsz ON sbsz.b = bands.b AND sbsz.band_val = bands.band_val),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                        c.doc_id AS doc_b, c.simhash AS sim_b
        FROM sbok a JOIN sbok c
          ON a.b = c.b AND a.band_val = c.band_val AND a.sub = c.sub
         AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup doc pairs within hamming distance 3 in SimHash space —
    the bitwise complement of the MinHash/Jaccard path (same banding
    idea, different similarity geometry).  See
    operators/dedup.py:simhash_near_pairs for the 100 TB shape."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(docs).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Dedup: embedding-cosine near-dup (blocked by label)
# ---------------------------------------------------------------------------
_DUCK_EMB = (
    "SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "FROM embeddings"
)
_DUCK_COS = (
    "ROUND(list_dot_product({a}, {b}) / nullif(sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})), 0), 6)"
)


# The oracle models the operator's block-size cap (MAX_EMB_BLOCK_SIZE:
# oversized blocks hash-split into bounded sub-blocks, pairs only
# within a sub-block — dedup._split_hot_buckets) so Spark and DuckDB
# agree at ANY data scale, not just where the gate corpus happens to
# stay under the cap.
_DUCK_EMB_CAPPED = (
    "e AS ({emb}), "
    "bc AS (SELECT label, COUNT(*) AS bn FROM e GROUP BY label), "
    "ek AS (SELECT e.*, {sub} AS sub FROM e JOIN bc USING (label))"
)


def _duck_emb_capped() -> str:
    return _DUCK_EMB_CAPPED.format(
        emb=_DUCK_EMB,
        sub=_duck_sub_split("e.vec_id", "bc.bn", dedup.MAX_EMB_BLOCK_SIZE),
    )


@_register(
    "dedup_embedding_neardup_pairs",
    f"""
    WITH {_duck_emb_capped()}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
    FROM ek a JOIN ek b ON a.label = b.label AND a.sub = b.sub
                        AND a.vec_id < b.vec_id
    WHERE cos_sim >= 0.3
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs(emb, threshold=0.3).orderBy(
        "vec_a", "vec_b"
    )


# ---------------------------------------------------------------------------
# Similarity search: exact brute-force top-k
# ---------------------------------------------------------------------------
@_register(
    "sim_topk_bruteforce",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id,
               {_DUCK_COS.format(a="qv", b="e.v")} AS cos_sim
        FROM e, q WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# Similarity search: sign-LSH bucketed approximate top-k
# ---------------------------------------------------------------------------
_DUCK_BUCKET = (
    "array_to_string(list_transform({v}[1:4], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
)


@_register(
    "sim_topk_lsh_bucketed",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    eb AS (SELECT vec_id, v, {_DUCK_BUCKET.format(v="v")} AS bucket FROM e),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM eb WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, c.vec_id,
               {_DUCK_COS.format(a="qv", b="c.v")} AS cos_sim
        FROM eb c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_lsh_bucketed(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_bits=4
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# Multi-table sign-LSH top-k — the recall lever over the single-table
# row above: candidates are the UNION over independent hash tables
# (disjoint dim slices), each surviving pair scored once.  Recall vs
# brute force rises with n_tables (pinned in tests); cost is a linear
# n_tables multiplier on bucket-join volume.
# ---------------------------------------------------------------------------
_TOPK_TABLES = 4


@_register(
    "sim_topk_lsh_multitable",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    ts AS (SELECT unnest(range(0, {_TOPK_TABLES})) AS t),
    eb AS (SELECT vec_id, ts.t AS t,
                  array_to_string(list_transform(v[ts.t*4+1 : ts.t*4+4],
                      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')
                      AS bucket
           FROM e CROSS JOIN ts),
    qb AS (SELECT vec_id AS query_id, t, bucket FROM eb WHERE vec_id < 10),
    qv AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    cand AS (SELECT DISTINCT qb.query_id, c.vec_id
             FROM eb c JOIN qb
               ON c.t = qb.t AND c.bucket = qb.bucket
              AND c.vec_id <> qb.query_id),
    scored AS (
        SELECT cand.query_id, cand.vec_id,
               {_DUCK_COS.format(a="qv.qv", b="e.v")} AS cos_sim
        FROM cand JOIN qv USING (query_id)
                  JOIN e ON e.vec_id = cand.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored WHERE cos_sim IS NOT NULL
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
def sim_topk_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_lsh_bucketed(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_bits=4,
        n_tables=_TOPK_TABLES,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_topk_lsh_multitable_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_lsh_multitable_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The lsh artifact kind (round-8 verdict #6): the L banded bucket
    tables + the late-fetch vector table serve from parquet like every
    other kind — the bucket join carries only ids, floats attach per
    surviving pair.  Oracle aliased verbatim to the inline row: a
    green hash IS the prebuilt ≡ inline proof."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "lsh", n_bits=4,
                          n_tables=_TOPK_TABLES)
    out = similarity.topk_lsh_bucketed(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_lsh_multitable_prebuilt"] = (
    ORACLE_SQL["sim_topk_lsh_multitable"]
)


def _lsh_filtered_oracle() -> str:
    """The multitable-LSH oracle with the scope predicate pushed into
    its candidate side — guarded surgery (marker exactly once), same
    pattern as _sq8_filtered_oracle.  Proves ann_index_filter across a
    THIRD artifact structure: banded bucket tables (the semi-join
    prunes bucket rows AND the late-fetch vecs, so out-of-scope ids
    never even pair)."""
    marker = "AND c.vec_id <> qb.query_id"
    src = ORACLE_SQL["sim_topk_lsh_multitable"]
    if src.count(marker) != 1:
        raise AssertionError(
            f"sim_topk_lsh_multitable oracle: expected exactly one "
            f"{marker!r}, found {src.count(marker)}"
        )
    return src.replace(
        marker,
        marker + " AND c.vec_id IN (SELECT vec_id FROM embeddings"
                 " WHERE label <= 2)",
    )


@_register("sim_topk_filtered_lsh_prebuilt", _lsh_filtered_oracle())
@_shared_arm
def sim_topk_filtered_lsh_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "lsh", n_bits=4,
                          n_tables=_TOPK_TABLES)
    fidx = ann_index.ann_index_filter(idx, emb.filter(F.col("label") <= 2))
    out = similarity.topk_lsh_bucketed(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5, index=fidx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")



# ---------------------------------------------------------------------------
# Text analysis: quality features
# ---------------------------------------------------------------------------
@_register(
    "text_quality_scores",
    rf"""
    WITH t AS (SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '{LANG_TOKEN_SPLIT_RE}'),
                           x -> x <> '') AS w
               FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(w) AS BIGINT) AS n_words,
           ROUND(length(array_to_string(w, '')) * 1.0 / nullif(len(w), 0), 4)
             AS avg_word_len,
           ROUND(len(regexp_extract_all(lower(text), '{PUNCT_RE}')) * 1.0
                 / nullif(length(text), 0), 4) AS punct_ratio,
           ROUND(len(regexp_extract_all(text, '[0-9]')) * 1.0
                 / nullif(length(text), 0), 4) AS digit_ratio,
           ROUND({stopword_hits_sql('text', LANG_STOPWORDS['en'])} * 1.0
                 / nullif(len(w), 0), 4) AS stopword_ratio
    FROM t ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # sort-before-project + explicit partition count: see
    # silver_conform_chain (AQE coalesces a no-N range exchange to one
    # partition and serializes the regex-dense projection)
    ordered = docs.repartitionByRange(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).sortWithinPartitions("doc_id")
    return ordered.select(
        "doc_id", quality_features("text").alias("q")
    ).select("doc_id", "q.*")


# ---------------------------------------------------------------------------
# Text analysis: language-ID heuristic (tie-break CASE shared with oracle)
# ---------------------------------------------------------------------------
# Panels come from text.LANG_STOPWORDS (single source of truth); hits
# are token-membership counts via stopword_hits/_sql — \b regex is NOT
# portable across Java (Unicode \b) and RE2 (ASCII \b).
_LANG_PICK = (
    "CASE WHEN greatest(s_en, s_es, s_fr, s_de, s_vi) = 0 THEN 'und' "
    "WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_vi THEN 'en' "
    "WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_vi THEN 'es' "
    "WHEN s_fr >= s_de AND s_fr >= s_vi THEN 'fr' "
    "WHEN s_de >= s_vi THEN 'de' ELSE 'vi' END"
)


@_register(
    "text_language_id",
    "WITH s AS (SELECT doc_id, "
    + ", ".join(
        f"{stopword_hits_sql('text', words)} AS s_{lang}"
        for lang, words in LANG_STOPWORDS.items()
    )
    + f" FROM documents) SELECT doc_id, {_LANG_PICK} AS lang_pred FROM s ORDER BY doc_id",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = docs.select(
        "doc_id",
        *[
            stopword_hits(F.lower("text"), words).alias(f"s_{lang}")
            for lang, words in LANG_STOPWORDS.items()
        ],
    )
    return scores.select(
        "doc_id", F.expr(_LANG_PICK).alias("lang_pred")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Text analysis: token counting (whitespace + BPE-ish)
# ---------------------------------------------------------------------------
@_register(
    "text_token_counts",
    rf"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS BIGINT) AS bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        whitespace_token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Text analysis: winnowing-style document fingerprint
# ---------------------------------------------------------------------------
@_register(
    "text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)
    SELECT doc_id,
           list_aggregate(list_transform({_duck_shingles(5)}, s -> md5(s)), 'min')
             AS fingerprint
    FROM t ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", document_fingerprint("text", 5).alias("fingerprint")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Language-ID library parity: detect_language() (struct-max tie-break)
# against a struct-max oracle — complements text_language_id which pins
# the CASE-chain variant.
# ---------------------------------------------------------------------------
@_register(
    "text_detect_language_lib",
    "WITH s AS (SELECT doc_id, "
    + ", ".join(
        stopword_hits_sql("text", words)
        + (
            " + len(regexp_extract_all(lower(text), '[ăâđêôơưạ-ỹ]'))"
            if lang == "vi"
            else ""
        )
        + f" AS s_{lang}"
        for lang, words in LANG_STOPWORDS.items()
    )
    + """ FROM documents),
    m AS (SELECT doc_id,
                 list_aggregate([struct_pack(score := s_en, lang := 'en'),
                                 struct_pack(score := s_es, lang := 'es'),
                                 struct_pack(score := s_fr, lang := 'fr'),
                                 struct_pack(score := s_de, lang := 'de'),
                                 struct_pack(score := s_vi, lang := 'vi')],
                                'max') AS best
          FROM s)
    SELECT doc_id,
           CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
    FROM m ORDER BY doc_id""",
)
def text_detect_language_lib(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", detect_language("text").alias("lang_pred")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Events: gap-based sessionization (lag + cumulative window)
# ---------------------------------------------------------------------------
@_register(
    "events_sessionization",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ),
    sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    per_sess AS (
        SELECT user_id, session_id, COUNT(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, COUNT(*) AS n_sessions,
           ROUND(SUM(n_events) * 1.0 / COUNT(*), 4) AS avg_events_per_session,
           MAX(n_events) AS max_session_events
    FROM per_sess GROUP BY user_id ORDER BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.sum("n_events") / F.count("*"), 4).alias(
                "avg_events_per_session"
            ),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Window frames: cumulative + day-over-day revenue (rowsBetween, lag)
# ---------------------------------------------------------------------------
@_register(
    "window_cumulative_daily_revenue",
    """
    WITH daily AS (
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS ship_date,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
                 AS day_revenue
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, ship_date, day_revenue,
           ROUND(SUM(day_revenue) OVER (PARTITION BY l_returnflag ORDER BY ship_date
                                        ROWS UNBOUNDED PRECEDING), 2) AS cum_revenue,
           ROUND(day_revenue - COALESCE(lag(day_revenue) OVER (
                 PARTITION BY l_returnflag ORDER BY ship_date), 0), 2) AS dod_delta
    FROM daily ORDER BY l_returnflag, ship_date
    """,
)
def window_cumulative_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag", F.to_date("l_shipdate").alias("ship_date")
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("day_revenue")
    )
    w = Window.partitionBy("l_returnflag").orderBy("ship_date")
    return daily.select(
        "l_returnflag",
        "ship_date",
        "day_revenue",
        F.round(
            F.sum("day_revenue").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("cum_revenue"),
        F.round(
            F.col("day_revenue")
            - F.coalesce(F.lag("day_revenue").over(w), F.lit(0.0)),
            2,
        ).alias("dod_delta"),
    ).orderBy("l_returnflag", "ship_date")


# ---------------------------------------------------------------------------
# Silver conform chain (U1 normalizer + U2 duration + U3 price + P7
# categorizer) through the oracle gate, on synthesized messy strings.
# The raw strings are built with a shared recipe from lineitem columns;
# the oracle re-implements each parser arithmetically (independent path).
# ---------------------------------------------------------------------------
_TYPE_CASES = [
    "giường nằm 40 chỗ",
    "huyndai solati 11 chỗ",
    "limousine ghế ngồi",
    "limousine giường nằm có wc",
    "limousine giường nằm",
    "limousine giường massage",
    "limousine 22 chỗ",
    "limousine 22 phòng (có wc)",
    "ghế ngồi 29 chỗ",
    "xe 16 chỗ",
]
# (l_orderkey + l_linenumber) % 10 covers ALL ten cases — l_linenumber
# alone is 1..7 in TPC-H, which would leave three categorizer branches
# (indices 0, 8, 9) permanently un-exercised by the oracle gate.  The
# ELSE makes an accidental modulus-base change loud (no silent NULLs).
_TYPE_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN (l_orderkey + l_linenumber) % 10 = {i} THEN '{s}'"
        for i, s in enumerate(_TYPE_CASES)
    )
    + f" ELSE '{_TYPE_CASES[0]}' END"
)
_CATEGORY_SQL = """
    CASE WHEN type_raw LIKE '%giường nằm%' AND type_raw NOT LIKE '%limousine%'
           THEN 'giường nằm'
         WHEN type_raw LIKE '%huyndai solati 11 chỗ%' THEN 'limousine ghế ngồi'
         WHEN type_raw LIKE '%limousine%' AND type_raw LIKE '%ghế ngồi%'
           THEN 'limousine ghế ngồi'
         WHEN type_raw LIKE '%limousine%' AND type_raw LIKE '%giường nằm có wc%'
           THEN 'limousine giường nằm có WC'
         WHEN type_raw LIKE '%limousine%' AND (type_raw LIKE '%giường nằm%'
              OR type_raw LIKE '%giường%') THEN 'limousine giường nằm'
         WHEN regexp_matches(type_raw, 'limousine.*[0-9]+\\s*chỗ')
           THEN 'limousine giường nằm'
         WHEN type_raw LIKE '%phòng%' THEN 'limousine giường phòng'
         WHEN type_raw LIKE '%ghế ngồi%' THEN 'ghế ngồi'
         ELSE 'khác' END
"""


def _duck_normalizer_chain(col: str) -> str:
    """DuckDB regexp_replace chain mirroring normalize_place().

    The lookbehind rule ((?<=\\w)ql...) is unsupported by RE2 and cannot
    fire on the synthesized inputs (ql is always space-separated), so it
    is omitted here; all other rules apply in the same order.
    """
    expr = f"lower({col})"
    for pattern, repl in NORMALIZE_GENERIC_RULES + NORMALIZE_SPECIFIC_RULES:
        if "(?<=" in pattern:
            continue
        duck_repl = repl.replace("$2", "\\2")
        expr = f"regexp_replace({expr}, '{pattern}', '{duck_repl}', 'g')"
    expr = f"regexp_replace({expr}, '[^a-z0-9\\s{VIETNAMESE_CHARS}]', '', 'g')"
    expr = f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
    return expr


@_register(
    "silver_conform_chain",
    f"""
    WITH raw AS (
        SELECT l_orderkey, l_linenumber,
               'BX q' || CAST(l_suppkey % 12 + 1 AS VARCHAR)
                 || ' tp hcm ql 1a kcn ' || CAST(l_partkey % 100 AS VARCHAR)
                 AS place_raw,
               CAST(l_quantity AS INTEGER) % 24 AS dh,
               l_partkey % 60 AS dm,
               CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_units,
               {_TYPE_CASE_SQL} AS type_raw
        FROM lineitem WHERE l_orderkey % 7 = 0
    )
    SELECT l_orderkey, l_linenumber,
           {_duck_normalizer_chain("place_raw")} AS place_norm,
           CAST(ROUND(dh + dm / 60.0, 2) AS FLOAT) AS duration_hours,
           CAST(price_units * 1000 AS INTEGER) AS price_vnd,
           {_CATEGORY_SQL} AS bus_type
    FROM raw ORDER BY l_orderkey, l_linenumber
    """,
)
def silver_conform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    raw = li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat(
            F.lit("BX q"),
            (F.col("l_suppkey") % 12 + 1).cast("string"),
            F.lit(" tp hcm ql 1a kcn "),
            (F.col("l_partkey") % 100).cast("string"),
        ).alias("place_raw"),
        F.concat(
            (F.col("l_quantity").cast("int") % 24).cast("string"),
            F.lit("h"),
            (F.col("l_partkey") % 60).cast("string"),
            F.lit("m"),
        ).alias("duration_raw"),
        F.concat(
            F.floor("l_extendedprice").cast("bigint").cast("string"),
            F.lit(".000đ"),
        ).alias("price_raw"),
        F.expr(_TYPE_CASE_SQL).alias("type_raw"),
    )
    # Sort BEFORE the expensive projection: orderBy-last would make the
    # range-partitioning SAMPLING job evaluate the whole regex chain a
    # second time (measured 13.1s -> 4.6s at sf0.1).  repartitionByRange
    # + sortWithinPartitions on the cheap frame gives the same total
    # order; the projection afterwards is narrow and order-preserving.
    # EXPLICIT partition count: without it AQE coalesces the range
    # exchange to ONE partition (rows are narrow, bytes small) and the
    # 19-regex chain — the actual cost — runs single-threaded.  With N
    # pinned the regex projection spreads across every core (the
    # explicit-N exchange is exempt from coalescing; measured 32×
    # parallelism, ~3× wall at sf0.1).
    spark_ctx = li.sparkSession.sparkContext
    ordered = raw.repartitionByRange(
        spark_ctx.defaultParallelism, "l_orderkey", "l_linenumber"
    ).sortWithinPartitions("l_orderkey", "l_linenumber")
    return ordered.select(
        "l_orderkey",
        "l_linenumber",
        normalize_place("place_raw").alias("place_norm"),
        parse_duration_hours("duration_raw").alias("duration_hours"),
        parse_price_vnd("price_raw").alias("price_vnd"),
        bus_type_category("type_raw").alias("bus_type"),
    )


# ---------------------------------------------------------------------------
# Similarity search: IVF (inverted-file) approximate top-k — the scale
# path beyond sign-LSH.  Deterministic coarse quantizer (centroids =
# vec_id < 32) keeps the full build+probe pipeline oracle-checkable.
# ---------------------------------------------------------------------------
@_register(
    "sim_topk_ivf",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 32),
    assign AS (
        SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {_DUCK_COS.format(a="e.v", b="c.cv")} DESC, c.cid) AS rn
            FROM e, cents c) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    probes AS (
        SELECT query_id, qv, cid FROM (
            SELECT q.query_id, q.qv, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY {_DUCK_COS.format(a="q.qv", b="c.cv")} DESC, c.cid) AS rn
            FROM q, cents c) WHERE rn <= 4
    ),
    scored AS (
        SELECT DISTINCT p.query_id, a.vec_id,
               {_DUCK_COS.format(a="p.qv", b="a.v")} AS cos_sim
        FROM assign a JOIN probes p ON p.cid = a.cid
        WHERE a.vec_id <> p.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_ivf(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=32, nprobe=4
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# SCD2 from a changelog: events as a change stream — each user's
# event_type transitions become dimension versions (operators/scd2.py).
# ---------------------------------------------------------------------------
@_register(
    "scd2_user_type_history",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER w AS prev_type,
               lag(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    opens AS (
        SELECT user_id, event_id, ts AS valid_from, event_type
        FROM ordered
        WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type
    ),
    versions AS (
        SELECT user_id, event_type, epoch_us(valid_from) AS valid_from_us,
               epoch_us(lead(valid_from) OVER (PARTITION BY user_id
                        ORDER BY valid_from, event_id)) AS valid_to_us
        FROM opens
    )
    SELECT user_id, event_type, valid_from_us, valid_to_us,
           valid_to_us IS NULL AS is_current
    FROM versions ORDER BY user_id, valid_from_us
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_from_changelog

    events = load_table(spark, sf_dir, "events")
    hist = scd2_from_changelog(
        events,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_col="event_id",
    )
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    ).orderBy("user_id", "valid_from_us")


# ---------------------------------------------------------------------------
# Multimodal plumbing through the oracle gate: documents' text bytes as
# the opaque binary payload; the mapInPandas feature extractor's
# byte-stat columns are reproduced by DuckDB over the same blob.
# ---------------------------------------------------------------------------
@_register(
    "multimodal_payload_stats",
    """
    SELECT doc_id AS media_id,
           CAST(COALESCE(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents ORDER BY media_id
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        extract_features,
        fake_decode,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = extract_features(media, decode_fn=fake_decode)
    return feats.select("media_id", "n_bytes", "payload_md5").orderBy(
        "media_id"
    )


# ---------------------------------------------------------------------------
# Dedup completion: candidate pairs → connected components → clusters.
# Oracle: recursive-CTE transitive closure, component = min reachable id.
# ---------------------------------------------------------------------------
@_register(
    "dedup_duplicate_clusters",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLE_CTES},
    undirected AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM undirected)
        UNION
        SELECT r.u, e.v FROM reach r JOIN undirected e ON e.u = r.v
    ),
    comp AS (SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u)
    SELECT d.doc_id,
           COALESCE(c.component_id, d.doc_id) AS component_id,
           d.doc_id = COALESCE(c.component_id, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_clusters(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# IVF with TRAINED centroids (Lloyd's k-means, operators/similarity.py).
# Oracle-checkable reformulation: with nprobe == n_centroids every
# inverted list is probed, so trained IVF scores EVERY candidate and
# its top-k is exactly the brute-force top-k — independent of the
# (engine-specific, float-accumulation-ordered) centroid values.  The
# brute-force SQL is therefore a true oracle of the full
# train→assign→probe→score pipeline: any bug in k-means plumbing, list
# assignment, the probe join, or scoring breaks the hash.  Pruning
# quality (nprobe < n_centroids) is float-order-sensitive and is pinned
# in tests/test_kmeans.py instead (recall vs brute force, monotone
# inertia, repartition determinism).
# ---------------------------------------------------------------------------
@_register(
    "sim_topk_ivf_trained",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id,
               {_DUCK_COS.format(a="qv", b="e.v")} AS cos_sim
        FROM e, q WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
def sim_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = similarity.train_kmeans(emb, k=8, iters=3)
    out = similarity.topk_ivf(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        nprobe=8,  # == k centroids: exact (see block comment)
        centroids=cents.select(
            F.col("cluster").alias("vec_id"), F.col("centroid").alias("emb")
        ),
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# Benchmark decontamination — corpus docs leaking benchmark shingles.
# source='src0' plays the benchmark; everything else is the corpus.
# ---------------------------------------------------------------------------
@_register(
    "dedup_contamination_flags",
    f"""
    WITH tokc AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents
                  WHERE source <> 'src0'),
    tokb AS (SELECT {_DUCK_TOKENS} AS w FROM documents WHERE source = 'src0'),
    csh AS (SELECT DISTINCT doc_id, md5(unnest({_duck_shingles(4)})) AS h
            FROM tokc),
    bsh AS (SELECT DISTINCT md5(unnest({_duck_shingles(4)})) AS h FROM tokb)
    SELECT doc_id, COUNT(*) AS n_hits
    FROM csh JOIN bsh USING (h)
    GROUP BY doc_id HAVING COUNT(*) >= 1
    ORDER BY doc_id
    """,
)
def dedup_contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    benchmark = docs.filter(F.col("source") == "src0")
    return dedup.contamination_flags(corpus, benchmark, n=4).orderBy("doc_id")


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@5 of the sign-LSH index against exact
# brute-force search, per query.  The standard index-quality metric a
# pipeline tracks before trusting an approximate path at 100 TB; both
# sides reuse the (green) top-k queries above, so the oracle is a pure
# composition of their SQL.  LEFT join from truth: a query whose
# neighbors the index misses entirely still reports recall 0, not a
# dropped row.
# ---------------------------------------------------------------------------
def _bruteforce_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact brute-force top-k truth arm shared by ALL
    sim_recall_*_vs_bruteforce gates (round-5 verdict #2: eight gates
    each recomputed it — ~8-10 s of redundant exact-arm work per bench
    run).  Since round 7 the materialization lives in the SAME
    per-arm cache the sim_topk_bruteforce row uses (``_shared_arm``),
    so the row, this truth arm, and every gate all hit one
    localCheckpoint; this helper is just the 2-column projection."""
    return sim_topk_bruteforce(spark, sf_dir).select("query_id", "vec_id")


def _recall_gate(spark: SparkSession, sf_dir: str, approx_fn,
                 truth_fn=None) -> DataFrame:
    """Shared recall@k rollup every sim_recall_* gate uses: left-join
    the approximate arm onto the brute-force truth and report per-query
    hit counts (one definition — the round-5 review found six divergent
    copies of this block).

    Round 8: every index-backed gate passes its *_prebuilt* serving
    arm (the production shape — a recall audit runs against the LIVE
    index artifact, and the approx arm stops re-encoding the corpus
    per gate).  Values are unchanged by construction: prebuilt ≡
    inline is hash-proven per tier, and every gate keeps its composed
    INLINE oracle, so the driver still verifies the served arm against
    the inline semantics.  The lone exception is the LSH gate —
    bucketing has no trained state or coded corpus (the bucket id IS
    the scan expression), so there is nothing to prebuild.

    ``truth_fn`` overrides the exact arm — the filtered-search gate
    audits against the FILTERED brute force (recall within the scope,
    the number a filtered vector store reports), not the global one."""
    if truth_fn is not None:
        truth = truth_fn(spark, sf_dir).select("query_id", "vec_id")
    else:
        truth = _bruteforce_truth(spark, sf_dir)
    approx = approx_fn(spark, sf_dir).select(
        F.col("query_id").alias("a_query"), F.col("vec_id").alias("a_vec")
    )
    joined = truth.join(
        approx,
        (truth["query_id"] == approx["a_query"])
        & (truth["vec_id"] == approx["a_vec"]),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count("a_vec").alias("n_hit"),
            F.count("*").alias("k"),
            F.round(F.count("a_vec") * 1.0 / F.count("*"), 4).alias("recall"),
        )
        .orderBy("query_id")
    )


def _recall_oracle(approx_name: str,
                   truth_name: str = "sim_topk_bruteforce") -> str:
    """The DuckDB twin of :func:`_recall_gate`, composed from the two
    registered topk oracles."""
    return f"""
    WITH bf AS ({ORACLE_SQL[truth_name]}),
    ap AS ({ORACLE_SQL[approx_name]})
    SELECT bf.query_id,
           COUNT(ap.vec_id) AS n_hit,
           COUNT(*) AS k,
           ROUND(COUNT(ap.vec_id) * 1.0 / COUNT(*), 4) AS recall
    FROM bf LEFT JOIN ap
      ON ap.query_id = bf.query_id AND ap.vec_id = bf.vec_id
    GROUP BY bf.query_id ORDER BY bf.query_id
"""


@_register(
    "sim_recall_lsh_vs_bruteforce",
    None,  # composed below, after both source oracles are registered
)
def sim_recall_lsh_vs_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_lsh_bucketed)


ORACLE_SQL["sim_recall_lsh_vs_bruteforce"] = _recall_oracle("sim_topk_lsh_bucketed")


# ---------------------------------------------------------------------------
# Similarity search: int8-quantized top-k — the memory-bandwidth play
# at 100 TB (codes are 4-8x smaller than float arrays, so the scan
# that dominates brute-force scoring moves 4-8x less data).  Vectors
# are normalized then quantized to ±127 (operators/similarity.py:
# quantize_int8_unit), so an INTEGER dot product of two codes ranks
# like cosine — and being exact int64 arithmetic, the ranking is
# bit-portable and fully oracle-gated (no float score ever is).  The
# recall gate below pins how much ranking quality the quantization
# costs vs the float truth.
# ---------------------------------------------------------------------------
@_register(
    "sim_topk_int8",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    qt AS (SELECT vec_id,
                  list_transform(v, x ->
                      CAST(least(greatest(round(x / nrm * 127), -127.0),
                                 127.0) AS BIGINT)) AS q8
           FROM n WHERE nrm > 0),
    qs AS (SELECT vec_id AS query_id, q8 AS qq FROM qt WHERE vec_id < 10),
    scored AS (
        SELECT qs.query_id, c.vec_id,
               CAST(list_dot_product(c.q8, qs.qq) AS BIGINT) AS dot_q
        FROM qt c, qs WHERE c.vec_id <> qs.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot_q DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, dot_q, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_int8(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_int8_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_int8_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_int8_prebuilt)


ORACLE_SQL["sim_recall_int8_vs_bruteforce"] = _recall_oracle("sim_topk_int8")


# ---------------------------------------------------------------------------
# Similarity search: binary sign-sketch + Hamming ranking — one notch
# below int8 on the compression ladder (functions/vectors.sign_sketch:
# 64-dim float64 -> ONE bigint, 64x smaller scan).  bit_count(xor) is
# pure int64 arithmetic, so the ranking is bit-portable and fully
# oracle-gated, like int8 and unlike any float score.  The recall gate
# below pins the quality cost of 1-bit-per-dim quantization; the tier's
# role is candidate GENERATION (shortlist by Hamming, re-score
# survivors with int8/float).
# ---------------------------------------------------------------------------
_SKETCH_BITS = 63


@_register(
    "sim_topk_hamming",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sk AS (SELECT vec_id,
                  CAST(list_sum(list_transform(
                      list_zip(v[1:{_SKETCH_BITS}], range(0, {_SKETCH_BITS})),
                      p -> CASE WHEN p[1] >= 0
                                THEN CAST(1 AS BIGINT) << CAST(p[2] AS INTEGER)
                                ELSE 0 END)) AS BIGINT) AS s
           FROM n WHERE nrm > 0),
    q AS (SELECT vec_id AS query_id, s AS qs FROM sk WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, c.vec_id,
               CAST(bit_count(xor(c.s, q.qs)) AS BIGINT) AS hamming
        FROM sk c, q WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, hamming, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_hamming(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_bits=_SKETCH_BITS
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_hamming_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_hamming_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_hamming_prebuilt)


ORACLE_SQL["sim_recall_hamming_vs_bruteforce"] = _recall_oracle("sim_topk_hamming")


# ---------------------------------------------------------------------------
# Product quantization + asymmetric distance (PQ/ADC — Jégou et al.
# 2011, the FAISS compression family).  m subspaces x ksub sampled
# codes over the unit vectors: candidates are scanned as m small ints
# instead of 64 floats, and each query scores them by summing m
# integer lookup-table cells.  Deterministic SAMPLED
# codebooks (rank by md5("<id>:<s>")) keep training selection-only, so
# the oracle reproduces codebook -> encode -> ADC -> rank end-to-end;
# every distance is micro-unit int64 after one round() per cell (the
# gated left-to-right fold assumption, same as sim_topk_int8).  The
# recall gate below pins what the 64x code compression costs vs the
# float truth.
# ---------------------------------------------------------------------------
_PQ_D2U = (
    "CAST(ROUND(1000000 * (list_dot_product({a}, {a})"
    " - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b})), 0) AS BIGINT)"
)
# m=32 two-dim subspaces x ksub=64 codes: 32 bytes/vec (16x vs the
# float64 array) at recall@5 = 0.74 on this corpus — the best
# bytes-for-recall point of the sampled-codebook sweep (m=8/ksub=16
# gave 0.10, m=16/ksub=64 gave 0.50; random synthetic embeddings are
# PQ's worst case, trained codebooks only improve on this).
_PQ_M, _PQ_KSUB, _PQ_DSUB = 32, 64, 2

# Shared CTE prefix: normalize -> subvectors -> sampled codebooks ->
# encoded corpus -> per-query LUT cells.  One string feeds BOTH the
# flat-PQ and the IVF-PQ oracles, so the two stay literally in sync.
_PQ_BASE = f"""
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u
          FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
          WHERE nrm > 0),
    sub AS (SELECT vec_id, CAST(r.s AS INTEGER) AS s,
                   u[CAST(r.s AS INTEGER) * {_PQ_DSUB} + 1 : CAST(r.s AS INTEGER) * {_PQ_DSUB} + {_PQ_DSUB}] AS sv
            FROM n, range(0, {_PQ_M}) AS r(s)),
    cb AS (SELECT s, CAST(rn - 1 AS INTEGER) AS code, sv AS cv FROM (
               SELECT s, sv,
                      ROW_NUMBER() OVER (PARTITION BY s ORDER BY
                          md5(CAST(vec_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)),
                          vec_id) AS rn
               FROM sub) WHERE rn <= {_PQ_KSUB}),
    enc AS (SELECT vec_id, s, code FROM (
               SELECT sub.vec_id, sub.s, cb.code,
                      ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                          ORDER BY {_PQ_D2U.format(a="sub.sv", b="cb.cv")},
                                   cb.code) AS rn
               FROM sub JOIN cb USING (s)) WHERE rn = 1),
    lut AS (SELECT q.vec_id AS query_id, s, cb.code,
                   {_PQ_D2U.format(a="q.sv", b="cb.cv")} AS d2u
            FROM sub q JOIN cb USING (s) WHERE q.vec_id < 10)"""


@_register(
    "sim_topk_pq_adc",
    f"""
    WITH {_PQ_BASE},
    scored AS (SELECT lut.query_id, enc.vec_id,
                      CAST(SUM(lut.d2u) AS BIGINT) AS adc_d2_micro
               FROM enc JOIN lut ON enc.s = lut.s AND enc.code = lut.code
               WHERE enc.vec_id <> lut.query_id
               GROUP BY lut.query_id, enc.vec_id),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY adc_d2_micro, vec_id) AS rnk
               FROM scored)
    SELECT query_id, vec_id, adc_d2_micro, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_pq_adc(
        emb, emb.filter(F.col("vec_id") < 10), k=5, m=_PQ_M, ksub=_PQ_KSUB,
        dsub=_PQ_DSUB,  # static width -> unrolled codegen'd distances
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_pq_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_pq_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_pq_adc_prebuilt)


ORACLE_SQL["sim_recall_pq_vs_bruteforce"] = f"""
    WITH bf AS ({{bf}}),
    ap AS ({{ap}})
    SELECT bf.query_id,
           COUNT(ap.vec_id) AS n_hit,
           COUNT(*) AS k,
           ROUND(COUNT(ap.vec_id) * 1.0 / COUNT(*), 4) AS recall
    FROM bf LEFT JOIN ap
      ON ap.query_id = bf.query_id AND ap.vec_id = bf.vec_id
    GROUP BY bf.query_id ORDER BY bf.query_id
""".format(bf=ORACLE_SQL["sim_topk_bruteforce"], ap=ORACLE_SQL["sim_topk_pq_adc"])


# ---------------------------------------------------------------------------
# IVF-PQ — the composed billion-scale serving architecture (FAISS
# IVFPQ): the deterministic coarse quantizer (first 32 candidates by
# id, same as topk_ivf) prunes WHICH rows each query scores (nprobe=8
# of 32 lists -> 75% of the corpus never touched), PQ codes shrink
# WHAT the survivors' scan reads (32 ints vs 64 floats).  Unlike
# sim_topk_ivf_trained (where nprobe == n_centroids makes the path
# exact), the pruning here is REAL — the oracle reproduces
# assignment, probing and ADC bit-for-bit, and the recall gate pins
# what the combined approximation costs vs the float truth.
# ---------------------------------------------------------------------------
_IVFPQ_NCENT, _IVFPQ_NPROBE = 32, 8


@_register(
    "sim_topk_ivfpq",
    f"""
    WITH {_PQ_BASE},
    cents AS (SELECT vec_id AS cid, u AS cu FROM (
                 SELECT vec_id, u, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
                 FROM n) WHERE rn <= {_IVFPQ_NCENT}),
    assign AS (SELECT vec_id, cid FROM (
                 SELECT n.vec_id, cents.cid,
                        ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                            {_PQ_D2U.format(a="n.u", b="cents.cu")},
                            cents.cid) AS rn
                 FROM n, cents) WHERE rn = 1),
    probe AS (SELECT query_id, cid FROM (
                 SELECT n.vec_id AS query_id, cents.cid,
                        ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                            {_PQ_D2U.format(a="n.u", b="cents.cu")},
                            cents.cid) AS rn
                 FROM n, cents WHERE n.vec_id < 10) WHERE rn <= {_IVFPQ_NPROBE}),
    scored AS (SELECT probe.query_id, enc.vec_id,
                      CAST(SUM(lut.d2u) AS BIGINT) AS adc_d2_micro
               FROM enc
               JOIN assign ON assign.vec_id = enc.vec_id
               JOIN probe ON probe.cid = assign.cid
               JOIN lut ON lut.query_id = probe.query_id
                       AND lut.s = enc.s AND lut.code = enc.code
               WHERE enc.vec_id <> probe.query_id
               GROUP BY probe.query_id, enc.vec_id),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY adc_d2_micro, vec_id) AS rnk
               FROM scored)
    SELECT query_id, vec_id, adc_d2_micro, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_ivfpq(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        n_centroids=_IVFPQ_NCENT, nprobe=_IVFPQ_NPROBE,
        m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB,
        dim=64,  # static width -> unrolled codegen'd full-dim distance
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_ivfpq_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_ivfpq_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_ivfpq_prebuilt)


ORACLE_SQL["sim_recall_ivfpq_vs_bruteforce"] = _recall_oracle("sim_topk_ivfpq")


# ---------------------------------------------------------------------------
# Residual IVF-PQ (FAISS "IVF,PQ" proper): PQ encodes r = u − coarse
# centroid instead of the raw unit vector, and each query builds one
# LUT per probed list from its own residual qu − cu.  Within a list
# ‖qr − r‖² = ‖qu − u‖² exactly (the centroid cancels), but residuals
# span the cell, not the sphere — the same m×ksub byte budget buys
# finer cells.  Deterministic everywhere: sampled residual codebooks
# (md5 rank), elementwise double subtraction mirrored by the index
# lambda below, every distance micro-unit int64 — so the oracle
# reproduces assignment → residual → codebook → encode → per-list LUT
# → ADC bit-for-bit.  The recall gate measures the residual win at
# identical bytes; the trained-residual floor lives in pytest (float
# means are not engine-portable).
# ---------------------------------------------------------------------------
_PQR_BASE = f"""
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u
          FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
          WHERE nrm > 0),
    cents AS (SELECT vec_id AS cid, u AS cu FROM (
                 SELECT vec_id, u, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
                 FROM n) WHERE rn <= {_IVFPQ_NCENT}),
    assign AS (SELECT vec_id, cid, cu FROM (
                 SELECT n.vec_id, cents.cid, cents.cu,
                        ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                            {_PQ_D2U.format(a="n.u", b="cents.cu")},
                            cents.cid) AS rn
                 FROM n, cents) WHERE rn = 1),
    res AS (SELECT n.vec_id, a.cid,
                   list_transform(range(1, len(n.u) + 1),
                                  i -> n.u[i] - a.cu[i]) AS r
            FROM n JOIN assign a USING (vec_id)),
    rsub AS (SELECT vec_id, CAST(t.s AS INTEGER) AS s,
                    r[CAST(t.s AS INTEGER) * {_PQ_DSUB} + 1 : CAST(t.s AS INTEGER) * {_PQ_DSUB} + {_PQ_DSUB}] AS sv
             FROM res, range(0, {_PQ_M}) AS t(s)),
    rcb AS (SELECT s, CAST(rn - 1 AS INTEGER) AS code, sv AS cv FROM (
               SELECT s, sv,
                      ROW_NUMBER() OVER (PARTITION BY s ORDER BY
                          md5(CAST(vec_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)),
                          vec_id) AS rn
               FROM rsub) WHERE rn <= {_PQ_KSUB}),
    renc AS (SELECT vec_id, s, code FROM (
               SELECT rsub.vec_id, rsub.s, rcb.code,
                      ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.s
                          ORDER BY {_PQ_D2U.format(a="rsub.sv", b="rcb.cv")},
                                   rcb.code) AS rn
               FROM rsub JOIN rcb USING (s)) WHERE rn = 1),
    probe AS (SELECT query_id, cid, cu FROM (
                 SELECT n.vec_id AS query_id, cents.cid, cents.cu,
                        ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                            {_PQ_D2U.format(a="n.u", b="cents.cu")},
                            cents.cid) AS rn
                 FROM n, cents WHERE n.vec_id < 10) WHERE rn <= {_IVFPQ_NPROBE}),
    qres AS (SELECT p.query_id, p.cid,
                    list_transform(range(1, len(n.u) + 1),
                                   i -> n.u[i] - p.cu[i]) AS qr
             FROM probe p JOIN n ON n.vec_id = p.query_id),
    qrsub AS (SELECT query_id, cid, CAST(t.s AS INTEGER) AS s,
                     qr[CAST(t.s AS INTEGER) * {_PQ_DSUB} + 1 : CAST(t.s AS INTEGER) * {_PQ_DSUB} + {_PQ_DSUB}] AS sv
              FROM qres, range(0, {_PQ_M}) AS t(s)),
    lut AS (SELECT query_id, cid, s, rcb.code,
                   {_PQ_D2U.format(a="qrsub.sv", b="rcb.cv")} AS d2u
            FROM qrsub JOIN rcb USING (s))"""


@_register(
    "sim_topk_ivfpq_residual",
    f"""
    WITH {_PQR_BASE},
    scored AS (SELECT lut.query_id, renc.vec_id,
                      CAST(SUM(lut.d2u) AS BIGINT) AS adc_d2_micro
               FROM renc
               JOIN assign ON assign.vec_id = renc.vec_id
               JOIN lut ON lut.cid = assign.cid
                       AND lut.s = renc.s AND lut.code = renc.code
               WHERE renc.vec_id <> lut.query_id
               GROUP BY lut.query_id, renc.vec_id),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY adc_d2_micro, vec_id) AS rnk
               FROM scored)
    SELECT query_id, vec_id, adc_d2_micro, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_ivfpq_residual(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        n_centroids=_IVFPQ_NCENT, nprobe=_IVFPQ_NPROBE,
        m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB, dim=64,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_ivfpq_residual_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_ivfpq_residual_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_ivfpq_residual_prebuilt)


ORACLE_SQL["sim_recall_ivfpq_residual_vs_bruteforce"] = _recall_oracle("sim_topk_ivfpq_residual")


# ---------------------------------------------------------------------------
# Session journey paths — sequence-pattern mining over the sessionized
# event stream: the ordered event_type path of each session (first 8
# steps — the cap bounds the path string and is mirrored in the
# oracle), then the top-20 most frequent journeys with session and
# user counts.  The classic product-analytics "top user flows" rollup;
# one window + two hash aggregations, all deterministic (ties broken
# by (ts, event_id) inside the path, by path text at the top-k cut).
# ---------------------------------------------------------------------------
_JOURNEY_STEPS, _JOURNEY_TOPK = 8, 20


@_register(
    "events_journey_paths",
    f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ),
    sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:{_JOURNEY_STEPS}],
                   '>') AS path
        FROM sess GROUP BY user_id, session_id
    )
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {_JOURNEY_TOPK}
    """,
)
def events_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return _journey_rollup(events)


def _journey_rollup(events: DataFrame) -> DataFrame:
    """Sessionize → per-session path string → top-K path counts —
    shared by the raw row and the bounded-history (_capped) variant."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda x: x["event_type"],
                    ),
                    1, _JOURNEY_STEPS,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_JOURNEY_TOPK)
    )


# ---------------------------------------------------------------------------
# Contrastive training triples — the deliverable an embedding-finetune
# job consumes: per anchor, its best same-label semantic near-dup as
# the POSITIVE (from the blocked cosine generator, split-cap semantics
# and all) and its most-confusable different-label vector as the hard
# NEGATIVE (from the exact miner; at corpus scale both generators
# swap to their blocked variants through the same contracts).  The
# oracle composes the already-gated near-dup SQL, so the triple
# builder inherits the split-cap fidelity instead of re-deriving it.
# ---------------------------------------------------------------------------
@_register(
    "corpus_contrastive_triples",
    None,  # composed below from the registered near-dup oracle
)
def corpus_contrastive_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.3)
    sym = pairs.select(
        F.col("vec_a").alias("anchor"),
        F.col("vec_b").alias("partner"),
        "cos_sim",
    ).unionAll(
        pairs.select(
            F.col("vec_b").alias("anchor"),
            F.col("vec_a").alias("partner"),
            "cos_sim",
        )
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("cos_sim"), "partner")
    best_pos = (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "anchor",
            F.col("partner").alias("pos_id"),
            F.col("cos_sim").alias("pos_sim"),
        )
    )
    negs = similarity.hard_negative_candidates(emb, k=1).select(
        F.col("src").alias("anchor"),
        F.col("neg").alias("neg_id"),
        F.col("cos_sim").alias("neg_sim"),
    )
    return best_pos.join(negs, on="anchor").orderBy("anchor")


ORACLE_SQL["corpus_contrastive_triples"] = f"""
    WITH pos_pairs AS ({ORACLE_SQL["dedup_embedding_neardup_pairs"]}),
    sym AS (
        SELECT vec_a AS anchor, vec_b AS partner, cos_sim FROM pos_pairs
        UNION ALL
        SELECT vec_b AS anchor, vec_a AS partner, cos_sim FROM pos_pairs
    ),
    best_pos AS (
        SELECT anchor, partner AS pos_id, cos_sim AS pos_sim FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor
                          ORDER BY cos_sim DESC, partner) AS rn
            FROM sym) WHERE rn = 1
    ),
    e AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    neg_scored AS (
        SELECT a.vec_id AS anchor, b.vec_id AS neg_id,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS neg_sim
        FROM e a JOIN e b ON a.label <> b.label
    ),
    negs AS (
        SELECT anchor, neg_id, neg_sim FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor
                          ORDER BY neg_sim DESC, neg_id) AS rn
            FROM neg_scored WHERE neg_sim IS NOT NULL) WHERE rn = 1
    )
    SELECT p.anchor, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim
    FROM best_pos p JOIN negs n USING (anchor)
    ORDER BY anchor
"""


# ---------------------------------------------------------------------------
# Two-tier ANN: Hamming shortlist -> exact float rerank — the
# production serving composition (a 64x-smaller sketch scan generates
# candidates; floats touch only shortlist rows, fetched late by id).
# The oracle replays both tiers; the recall gate measures shortlist
# survival of the true top-k (single-tier hamming recall ~0.42 at k=5;
# the 50-wide shortlist + exact rerank recovers most of it).
# ---------------------------------------------------------------------------
_HRR_SHORTLIST = 50


@_register(
    "sim_topk_hamming_rerank",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sk AS (SELECT vec_id,
                  CAST(list_sum(list_transform(
                      list_zip(v[1:{_SKETCH_BITS}], range(0, {_SKETCH_BITS})),
                      p -> CASE WHEN p[1] >= 0
                                THEN CAST(1 AS BIGINT) << CAST(p[2] AS INTEGER)
                                ELSE 0 END)) AS BIGINT) AS s
           FROM n WHERE nrm > 0),
    q AS (SELECT vec_id AS query_id, s AS qs FROM sk WHERE vec_id < 10),
    hscored AS (
        SELECT q.query_id, c.vec_id,
               CAST(bit_count(xor(c.s, q.qs)) AS BIGINT) AS hamming
        FROM sk c, q WHERE c.vec_id <> q.query_id
    ),
    hranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, vec_id) AS rnk
        FROM hscored
    ),
    short AS (SELECT query_id, vec_id FROM hranked
              WHERE rnk <= {_HRR_SHORTLIST}),
    rescored AS (
        SELECT short.query_id, short.vec_id,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM short JOIN e a ON a.vec_id = short.query_id
                   JOIN e b ON b.vec_id = short.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM rescored WHERE cos_sim IS NOT NULL
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_hamming_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist=_HRR_SHORTLIST, n_bits=_SKETCH_BITS,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_hamming_rerank_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_hamming_rerank_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_hamming_rerank_prebuilt)


ORACLE_SQL["sim_recall_hamming_rerank_vs_bruteforce"] = _recall_oracle("sim_topk_hamming_rerank")


# ---------------------------------------------------------------------------
# Sparse Johnson-Lindenstrauss projection (Achlioptas 2003) over the
# int8 unit codes: the dimensionality-REDUCTION rung — 64 dims -> 16
# integer coordinates with signs {+1,0,-1} drawn from a deterministic
# hash of (i, j), so there is no projection matrix to store or ship
# and both engines regenerate it from arithmetic.  The projected dot
# product is exact int64 (bit-portable ranking, like every integer
# tier); the recall gate prices the distortion, and the rerank row is
# the serving shape that buys the recall back (pinned strictly above
# raw JL by the pytest).
# ---------------------------------------------------------------------------
_JL_DOUT = 32
_JLRR_SHORTLIST = 100

# sign literals shared with the Spark expression (similarity.jl_signs:
# md5-derived, the engine-portable hash) — injected here exactly like
# the JPEG IDCT W table, so both engines evaluate the same matrix
_JL_SIGNS = "[" + ",".join(
    str(v) for v in similarity.jl_signs(_JL_DOUT)
) + "]"

_JL_SQL_CODES = """
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    qt AS (SELECT vec_id,
                  list_transform(v, x ->
                      CAST(least(greatest(round(x / nrm * 127), -127.0),
                                 127.0) AS BIGINT)) AS q8
           FROM n WHERE nrm > 0),
    -- the sign literal rides a 1-row cross join: inlining it in the
    -- inner lambda makes DuckDB rebuild the 2048-element list on
    -- EVERY (vector, i, j) evaluation (~268s at sf0.01); as a joined
    -- value it is built once (sub-second)
    sgn AS (SELECT {signs} AS s),
    jl AS (SELECT vec_id,
                  list_transform(range(0, {dout}), j ->
                      CAST(list_sum(list_transform(range(0, len(q8)), i ->
                          q8[CAST(i AS INTEGER) + 1]
                          * s[CAST(i * {dout} + j AS INTEGER) + 1]))
                        AS BIGINT)) AS y
           FROM qt, sgn)
""".format(dout=_JL_DOUT, signs=_JL_SIGNS)


@_register(
    "sim_topk_jl",
    f"""
    WITH {_JL_SQL_CODES},
    qs AS (SELECT vec_id AS query_id, y AS qy FROM jl WHERE vec_id < 10),
    scored AS (
        SELECT qs.query_id, c.vec_id,
               CAST(list_dot_product(c.y, qs.qy) AS BIGINT) AS dot_jl
        FROM jl c, qs WHERE c.vec_id <> qs.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot_jl DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, dot_jl, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_jl(
        emb, emb.filter(F.col("vec_id") < 10), k=5, d_out=_JL_DOUT
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_jl_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_jl_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_jl_prebuilt)


ORACLE_SQL["sim_recall_jl_vs_bruteforce"] = _recall_oracle("sim_topk_jl")


@_register(
    "sim_topk_jl_rerank",
    f"""
    WITH {_JL_SQL_CODES},
    qs AS (SELECT vec_id AS query_id, y AS qy FROM jl WHERE vec_id < 10),
    jscored AS (
        SELECT qs.query_id, c.vec_id,
               CAST(list_dot_product(c.y, qs.qy) AS BIGINT) AS dot_jl
        FROM jl c, qs WHERE c.vec_id <> qs.query_id
    ),
    jranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot_jl DESC, vec_id) AS rnk
        FROM jscored
    ),
    short AS (SELECT query_id, vec_id FROM jranked
              WHERE rnk <= {_JLRR_SHORTLIST}),
    rescored AS (
        SELECT short.query_id, short.vec_id,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM short JOIN e a ON a.vec_id = short.query_id
                   JOIN e b ON b.vec_id = short.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM rescored WHERE cos_sim IS NOT NULL
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_jl_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_jl_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist=_JLRR_SHORTLIST, d_out=_JL_DOUT,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_jl_rerank_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_jl_rerank_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_jl_rerank_prebuilt)


ORACLE_SQL["sim_recall_jl_rerank_vs_bruteforce"] = _recall_oracle("sim_topk_jl_rerank")


# ---------------------------------------------------------------------------
# Matryoshka truncated-dimension search (MRL, Kusupati et al. 2022):
# rank by the cosine of the FIRST 32 of 64 coordinates — the cheapest
# ANN compression knob (half the scan bytes, quarter the dot-product
# work, zero training/codebooks/re-encoding).  Recall-gated like every
# approximate tier: 0.24 on THIS corpus — random embeddings are MRL's
# worst case (no information concentrates in prefix dims; real MRL
# models are trained so it does), so the row pins machinery + the
# honest floor, not a quality claim.
# ---------------------------------------------------------------------------
_MRL_DIMS = 32


@_register(
    "sim_topk_matryoshka",
    f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding[1:{_MRL_DIMS}],
                                     x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id,
               {_DUCK_COS.format(a="qv", b="e.v")} AS cos_sim
        FROM e, q WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored WHERE cos_sim IS NOT NULL
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_truncated(
        emb, emb.filter(F.col("vec_id") < 10), k=5, dims=_MRL_DIMS
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_matryoshka_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_matryoshka_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_matryoshka_prebuilt)


ORACLE_SQL["sim_recall_matryoshka_vs_bruteforce"] = _recall_oracle("sim_topk_matryoshka")


# ---------------------------------------------------------------------------
# IVF-PQ shortlist + exact rerank — the production serving shape FAISS
# deployments actually run (IVFPQ scan, refine over original floats;
# round-5 verdict task #2).  Tier 1 is the REAL-pruning IVF-PQ above
# (nprobe=8/32 — 75% of the corpus never ADC-scored) widened to a
# 50-deep shortlist; tier 2 late-fetches floats for shortlist rows
# only and reranks by exact cosine.  ADC error is per-vector
# quantization noise, so the true top-5 almost always survives a 10·k
# shortlist: the recall gate pins the recovery strictly above the
# raw-ADC gate's floor while scan bytes stay PQ-dominated
# (m·|C|·nprobe/n_centroids code bytes + 8·d·shortlist·|Q| floats).
# ---------------------------------------------------------------------------
_IVFPQ_RR_SHORTLIST = 50


@_register(
    "sim_topk_ivfpq_rerank",
    f"""
    WITH {_PQ_BASE},
    cents AS (SELECT vec_id AS cid, u AS cu FROM (
                 SELECT vec_id, u, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
                 FROM n) WHERE rn <= {_IVFPQ_NCENT}),
    assign AS (SELECT vec_id, cid FROM (
                 SELECT n.vec_id, cents.cid,
                        ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                            {_PQ_D2U.format(a="n.u", b="cents.cu")},
                            cents.cid) AS rn
                 FROM n, cents) WHERE rn = 1),
    probe AS (SELECT query_id, cid FROM (
                 SELECT n.vec_id AS query_id, cents.cid,
                        ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
                            {_PQ_D2U.format(a="n.u", b="cents.cu")},
                            cents.cid) AS rn
                 FROM n, cents WHERE n.vec_id < 10) WHERE rn <= {_IVFPQ_NPROBE}),
    scored AS (SELECT probe.query_id, enc.vec_id,
                      CAST(SUM(lut.d2u) AS BIGINT) AS adc_d2_micro
               FROM enc
               JOIN assign ON assign.vec_id = enc.vec_id
               JOIN probe ON probe.cid = assign.cid
               JOIN lut ON lut.query_id = probe.query_id
                       AND lut.s = enc.s AND lut.code = enc.code
               WHERE enc.vec_id <> probe.query_id
               GROUP BY probe.query_id, enc.vec_id),
    short AS (SELECT query_id, vec_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY adc_d2_micro, vec_id) AS srnk
                 FROM scored) WHERE srnk <= {_IVFPQ_RR_SHORTLIST}),
    rescored AS (
        SELECT short.query_id, short.vec_id,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM short JOIN e a ON a.vec_id = short.query_id
                   JOIN e b ON b.vec_id = short.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM rescored WHERE cos_sim IS NOT NULL
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_ivfpq_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist=_IVFPQ_RR_SHORTLIST,
        n_centroids=_IVFPQ_NCENT, nprobe=_IVFPQ_NPROBE,
        m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB,
        dim=64,  # static width -> unrolled codegen'd full-dim distance
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_ivfpq_rerank_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_ivfpq_rerank_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_ivfpq_rerank_prebuilt)


ORACLE_SQL["sim_recall_ivfpq_rerank_vs_bruteforce"] = _recall_oracle("sim_topk_ivfpq_rerank")


# ---------------------------------------------------------------------------
# Per-dimension affine scalar quantization (FAISS ScalarQuantizer
# QT_8bit) — the compression-ladder rung between int8-unit (one global
# 127 scale) and PQ (codebooks): each dimension codes into 0..255
# against its OWN corpus min/max, so narrow dimensions lose less
# precision.  Portability is STRONGER than the mean-based trainers:
# MIN/MAX are order-insensitive exact double aggregates, codes are one
# shared round() per cell, and the pair distance Σ(Δ·scale)² is exact
# int64 (≤ 64·(255·7843)² ≈ 2.6e14) — DuckDB verifies the ranking
# bit-for-bit.  Recall vs the float truth is gated like every
# approximate tier.
# ---------------------------------------------------------------------------
@_register(
    "sim_topk_sq8",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u
          FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
          WHERE nrm > 0),
    dims AS (SELECT vec_id, CAST(p AS INTEGER) AS pos,
                    u[CAST(p AS INTEGER) + 1] AS x
             FROM (SELECT vec_id, u, unnest(range(0, len(u))) AS p FROM n)),
    params AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx,
                      CAST(GREATEST(ROUND(1000000.0 * (MAX(x) - MIN(x)) / 255, 0),
                                    1) AS BIGINT) AS scale_micro
               FROM dims GROUP BY pos),
    codes AS (SELECT d.vec_id, d.pos,
                     CASE WHEN p.mx = p.mn THEN CAST(0 AS BIGINT)
                          ELSE CAST(LEAST(GREATEST(
                                   ROUND(255.0 * (d.x - p.mn) / (p.mx - p.mn), 0),
                                   0), 255) AS BIGINT)
                     END * p.scale_micro AS sc
              FROM dims d JOIN params p USING (pos)),
    q AS (SELECT vec_id AS query_id, pos, sc FROM codes WHERE vec_id < 10),
    scored AS (SELECT q.query_id, c.vec_id,
                      CAST(SUM((q.sc - c.sc) * (q.sc - c.sc)) AS BIGINT) AS d2_sq8
               FROM codes c JOIN q ON q.pos = c.pos AND c.vec_id <> q.query_id
               GROUP BY q.query_id, c.vec_id),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY d2_sq8, vec_id) AS rnk
               FROM scored)
    SELECT query_id, vec_id, d2_sq8, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_sq8(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_sq8_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_sq8_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_sq8_prebuilt)


ORACLE_SQL["sim_recall_sq8_vs_bruteforce"] = _recall_oracle("sim_topk_sq8")


# ---------------------------------------------------------------------------
# ANN index build/serve separation (round-6 verdict #1 — the production
# serving shape): the index state is built ONCE, materialized as plain
# parquet tables (operators/ann_index.py), and every later top-k call
# SERVES from the artifact — candidates are never re-trained or
# re-encoded.  The rows below run the exact queries of their inline
# siblings against the prebuilt artifact and reuse the siblings'
# DuckDB oracles VERBATIM: a green hash is the machine-checked proof
# that prebuilt ≡ inline, bit for bit.  bench.py reports build and
# serve time separately for ivfpq (ann_build/ann_serve).
#
# Round 8 finished the ladder: EVERY index-backed tier now has a
# prebuilt row (hamming / int8 / pq_adc / ivfpq / ivfpq_residual /
# hamming_rerank / cascade / matryoshka / jl_rerank below, joining the
# three r7 rows), and every sim_recall_* gate's approximate arm serves
# from the artifact instead of rebuilding inline — the production
# shape (gates audit a LIVE index) and the bench shape (the sim tier
# stops paying the same corpus encode twice per gate pair).  Gate
# values are unchanged by construction: prebuilt ≡ inline is
# hash-proven per tier, and the gates keep their composed inline
# oracles.  Prebuilt rows are _shared_arm-cached like inline rows so
# a gate reuses the serve its sim_topk sibling just produced.
# ---------------------------------------------------------------------------

# Loaded-index memo, keyed (applicationId, sf_dir, kind).  Entries are
# lazy parquet scans — no pinned executor blocks, so unlike the
# CheckpointCaches an unbounded dict holds only driver-side plan
# objects (a few per process: 2 kinds × the sf_dirs visited).
_ANN_INDEX_MEMO: dict[tuple, ann_index.AnnIndex] = {}
# serializes build+save on a memo miss: callers may overlap queries on
# driver threads (guide §2.6), and two concurrent builders of one tag
# would race the same artifact directory
_ANN_INDEX_LOCK = __import__("threading").RLock()


def _prebuilt_index(spark: SparkSession, sf_dir: str,
                    kind: str, alias: str | None = None,
                    **build_kw) -> ann_index.AnnIndex:
    """Build+save the (sf_dir, kind) index on first touch, then LOAD
    it back so every serve genuinely reads the materialized parquet
    (not the in-memory build plan); later calls reuse the loaded
    artifact.  ``alias`` keys the artifact path/memo when two configs
    of one kind coexist (e.g. the 4-table topk LSH vs the 8-table
    k-NN-graph LSH)."""
    tag = alias or kind
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), tag)
    idx = _ANN_INDEX_MEMO.get(key)
    if idx is None:
        with _ANN_INDEX_LOCK:
            idx = _ANN_INDEX_MEMO.get(key)
            if idx is None:
                emb = load_table(spark, sf_dir, "embeddings")
                built = ann_index.ann_index_build(emb, kind=kind,
                                                  **build_kw)
                path = ann_index.default_index_path(sf_dir, tag)
                ann_index.ann_index_save(built, path)
                idx = ann_index.ann_index_load(spark, path)
                _ANN_INDEX_MEMO[key] = idx
    return idx


@_register("sim_topk_ivfpq_rerank_prebuilt",
           None)  # oracle aliased below: identical to the inline row's
@_shared_arm
def sim_topk_ivfpq_rerank_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(
        spark, sf_dir, "ivfpq",
        n_centroids=_IVFPQ_NCENT, m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB,
        dim=64,
    )
    out = similarity.topk_ivfpq_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist=_IVFPQ_RR_SHORTLIST, nprobe=_IVFPQ_NPROBE,
        index=idx,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


# prebuilt ≡ inline is the whole contract: same oracle text, so the
# driver's value-hash compare enforces bit-identity with the inline row
ORACLE_SQL["sim_topk_ivfpq_rerank_prebuilt"] = ORACLE_SQL["sim_topk_ivfpq_rerank"]


@_register("sim_topk_sq8_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_sq8_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "sq8")
    out = similarity.topk_sq8(
        emb, emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_sq8_prebuilt"] = ORACLE_SQL["sim_topk_sq8"]


@_register("sim_topk_jl_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_jl_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "jl", d_out=_JL_DOUT)
    out = similarity.topk_jl(
        emb, emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_jl_prebuilt"] = ORACLE_SQL["sim_topk_jl"]


# ---------------------------------------------------------------------------
# Three-tier ANN cascade — the full production funnel: Hamming sketch
# scan over the whole corpus (8 B/vec) -> int8 re-score of the
# 100-deep survivors (1 B/dim, codes fetched late by id) -> exact
# float rerank of the final 20 (8 B/dim at 20/|C| selectivity).
# Tiers 1-2 are exact int64 arithmetic, so the WHOLE funnel is
# oracle-reproduced bit-for-bit up to the gated 6dp float tier; the
# recall gate pins shortlist-survival loss vs the float truth.
# ---------------------------------------------------------------------------
_CASCADE_L1, _CASCADE_L2 = 100, 20


@_register(
    "sim_topk_cascade",
    f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    sk AS (SELECT vec_id,
                  CAST(list_sum(list_transform(
                      list_zip(v[1:{_SKETCH_BITS}], range(0, {_SKETCH_BITS})),
                      p -> CASE WHEN p[1] >= 0
                                THEN CAST(1 AS BIGINT) << CAST(p[2] AS INTEGER)
                                ELSE 0 END)) AS BIGINT) AS s
           FROM n WHERE nrm > 0),
    hq AS (SELECT vec_id AS query_id, s AS qs FROM sk WHERE vec_id < 10),
    hscored AS (
        SELECT hq.query_id, c.vec_id,
               CAST(bit_count(xor(c.s, hq.qs)) AS BIGINT) AS hamming
        FROM sk c, hq WHERE c.vec_id <> hq.query_id
    ),
    short1 AS (SELECT query_id, vec_id FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY hamming, vec_id) AS rnk
                  FROM hscored) WHERE rnk <= {_CASCADE_L1}),
    qt AS (SELECT vec_id,
                  list_transform(v, x ->
                      CAST(least(greatest(round(x / nrm * 127), -127.0),
                                 127.0) AS BIGINT)) AS q8
           FROM n WHERE nrm > 0),
    q8q AS (SELECT vec_id AS query_id, q8 AS qq FROM qt WHERE vec_id < 10),
    t2scored AS (
        SELECT short1.query_id, short1.vec_id,
               CAST(list_dot_product(c.q8, q8q.qq) AS BIGINT) AS dot_q
        FROM short1 JOIN qt c ON c.vec_id = short1.vec_id
                    JOIN q8q ON q8q.query_id = short1.query_id
    ),
    short2 AS (SELECT query_id, vec_id FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY dot_q DESC, vec_id) AS rnk
                  FROM t2scored) WHERE rnk <= {_CASCADE_L2}),
    rescored AS (
        SELECT short2.query_id, short2.vec_id,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM short2 JOIN e a ON a.vec_id = short2.query_id
                    JOIN e b ON b.vec_id = short2.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM rescored WHERE cos_sim IS NOT NULL
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_cascade(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist1=_CASCADE_L1, shortlist2=_CASCADE_L2,
        n_bits=_SKETCH_BITS,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_recall_cascade_vs_bruteforce",
    None,  # composed below from the two registered oracles
)
def sim_recall_cascade_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_cascade_prebuilt)


ORACLE_SQL["sim_recall_cascade_vs_bruteforce"] = _recall_oracle("sim_topk_cascade")


# ---------------------------------------------------------------------------
# Build/serve ladder completion (round-8 verdict #1): prebuilt rows
# for every remaining index-backed tier.  Same contract as the r7
# trio: the serve runs the inline row's EXACT query against the
# materialized artifact and reuses the inline oracle VERBATIM, so a
# green driver hash is machine-checked proof that prebuilt ≡ inline
# bit-for-bit.  The artifact is built once per (app, sf_dir, kind) and
# loaded back from parquet (_prebuilt_index), so every row below times
# SERVING — candidates are never re-encoded (pinned per kind in
# tests/test_ann_index.py).
# ---------------------------------------------------------------------------


@_register("sim_topk_hamming_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_hamming_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "hamming", n_bits=_SKETCH_BITS)
    out = similarity.topk_hamming(
        emb, emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_hamming_prebuilt"] = ORACLE_SQL["sim_topk_hamming"]


@_register("sim_topk_int8_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_int8_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "int8")
    out = similarity.topk_int8(
        emb, emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_int8_prebuilt"] = ORACLE_SQL["sim_topk_int8"]


@_register("sim_topk_pq_adc_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_pq_adc_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serves from the SAME ivfpq artifact as the ivfpq rows — an
    unpruned ADC scan is IVF-PQ with nprobe = n_centroids, so the cid
    column is simply ignored (topk_pq_adc's index path).  One build
    amortizes across three tiers."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(
        spark, sf_dir, "ivfpq",
        n_centroids=_IVFPQ_NCENT, m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB,
        dim=64,
    )
    out = similarity.topk_pq_adc(
        emb, emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_pq_adc_prebuilt"] = ORACLE_SQL["sim_topk_pq_adc"]


@_register("sim_topk_ivfpq_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_ivfpq_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(
        spark, sf_dir, "ivfpq",
        n_centroids=_IVFPQ_NCENT, m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB,
        dim=64,
    )
    out = similarity.topk_ivfpq(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        nprobe=_IVFPQ_NPROBE, index=idx,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_ivfpq_prebuilt"] = ORACLE_SQL["sim_topk_ivfpq"]


@_register("sim_topk_ivfpq_residual_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_ivfpq_residual_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(
        spark, sf_dir, "ivfpq_residual",
        n_centroids=_IVFPQ_NCENT, m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB,
        dim=64,
    )
    out = similarity.topk_ivfpq_residual(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        nprobe=_IVFPQ_NPROBE, index=idx,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_ivfpq_residual_prebuilt"] = (
    ORACLE_SQL["sim_topk_ivfpq_residual"]
)


@_register("sim_topk_hamming_rerank_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_hamming_rerank_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tier 1 serves sketches from the hamming artifact; tier 2
    late-fetches floats from the corpus at shortlist/|C| selectivity —
    the only candidate-table touch, exactly the production cost."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "hamming", n_bits=_SKETCH_BITS)
    out = similarity.topk_hamming_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist=_HRR_SHORTLIST, index=idx,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_hamming_rerank_prebuilt"] = (
    ORACLE_SQL["sim_topk_hamming_rerank"]
)


@_register("sim_topk_jl_rerank_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_jl_rerank_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "jl", d_out=_JL_DOUT)
    out = similarity.topk_jl_rerank(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist=_JLRR_SHORTLIST, index=idx,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_jl_rerank_prebuilt"] = ORACLE_SQL["sim_topk_jl_rerank"]


@_register("sim_topk_cascade_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_cascade_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiers 1-2 serve from the cascade artifact (sketches + q8codes);
    tier 3 late-fetches floats at shortlist2/|C| selectivity."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "cascade", n_bits=_SKETCH_BITS)
    out = similarity.topk_cascade(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist1=_CASCADE_L1, shortlist2=_CASCADE_L2, index=idx,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_cascade_prebuilt"] = ORACLE_SQL["sim_topk_cascade"]


@_register("sim_topk_matryoshka_prebuilt", None)  # oracle aliased below
@_shared_arm
def sim_topk_matryoshka_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "matryoshka", dims=_MRL_DIMS)
    out = similarity.topk_truncated(
        emb, emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_matryoshka_prebuilt"] = ORACLE_SQL["sim_topk_matryoshka"]


# ---------------------------------------------------------------------------
# Incremental index maintenance (round-8 verdict #2): a growing corpus
# must not retrain/re-encode the world.  ann_index_append encodes ONLY
# the new rows with the STORED quantizer state and unions them into
# the artifact's row-level parts.  This row PROVES the contract
# against DuckDB: Spark serves from append(build(A), B) where
# A = vec_id % 10 != 7 and B = the rest; the oracle computes the SAME
# split — SQ8 params (per-dimension min/max) from A only, codes for
# the whole corpus against A's params.  A green hash is the
# machine-checked append(A,B) ≡ build(A∪B)-with-pinned-params
# identity, on a split where params(A) genuinely differ from
# params(A∪B) (pinned by tests).  The drift caveat (when to rebuild
# instead) lives in ann_index_append's docstring + pytest.
# ---------------------------------------------------------------------------
def _sq8_appended_oracle() -> str:
    """The inline sq8 oracle with its params CTE re-pointed at the
    A-subset — guarded surgery (the marker must appear exactly once),
    same pattern as _shingle_ctes_over."""
    marker = "FROM dims GROUP BY pos"
    src = ORACLE_SQL["sim_topk_sq8"]
    if src.count(marker) != 1:
        raise AssertionError(
            f"sim_topk_sq8 oracle: expected exactly one {marker!r}, "
            f"found {src.count(marker)}"
        )
    return src.replace(
        marker, "FROM dims WHERE vec_id % 10 <> 7 GROUP BY pos"
    )


@_register("sim_topk_sq8_appended", _sq8_appended_oracle())
@_shared_arm
def sim_topk_sq8_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    built_a = ann_index.ann_index_build(
        emb.filter(F.col("vec_id") % 10 != 7), kind="sq8"
    )
    idx = ann_index.ann_index_append(
        built_a, emb.filter(F.col("vec_id") % 10 == 7)
    )
    # candidates=limit(0): the serve reads ONLY the appended index —
    # the corpus never rescans (the same guarantee the pytest pins)
    out = similarity.topk_sq8(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_topk_sq8_stream_appended", None)  # oracle aliased below
@_shared_arm
def sim_topk_sq8_stream_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous indexing end-to-end (round-8 verdict #2): build the
    artifact on A (vec_id % 10 != 7), grow it with B through the REAL
    streaming path — append_ann_stream's foreachBatch encodes each
    micro-batch against the artifact's pinned params and appends to
    the saved row parts — then serve from the RELOADED artifact.  The
    oracle is the in-memory appended row's, verbatim: a green hash
    proves stream-append ≡ ann_index_append ≡ build(A ∪ B) with
    pinned state, end to end through parquet."""
    import tempfile

    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        append_ann_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 10 != 7)
    b = emb.filter(F.col("vec_id") % 10 == 7)
    base = tempfile.mkdtemp(prefix="vlps_stream_append_")
    path = os.path.join(base, "idx")
    ann_index.ann_index_save(ann_index.ann_index_build(a, kind="sq8"),
                             path)
    src = os.path.join(base, "src")
    b.write.parquet(src)
    append_ann_stream(
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src),
        path, os.path.join(base, "ckpt"),
    )
    idx = ann_index.ann_index_load(spark, path)
    out = similarity.topk_sq8(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5, index=idx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


ORACLE_SQL["sim_topk_sq8_stream_appended"] = ORACLE_SQL["sim_topk_sq8_appended"]


# ---------------------------------------------------------------------------
# Filtered vector search — metadata-scoped top-k, the predicate every
# production vector store exposes (FAISS IDSelector, "filter=" in
# Milvus/pgvector/Vespa): "nearest neighbors WHERE label <= 2" (~30%
# of the corpus; tenant/language scoping).  Three rows:
#
# - sim_topk_filtered_bruteforce: the exact truth INSIDE the scope —
#   the predicate restricts candidates, queries stay external (a
#   query need not satisfy its own filter).
# - sim_topk_filtered_sq8_prebuilt: the serving shape —
#   ann_index_filter() wraps the FULL-corpus prebuilt SQ8 artifact in
#   an id-semi-joined view (pre-filter, pruned BEFORE any distance
#   arithmetic; trained params stay full-corpus, the production
#   contract: ONE index serves every scope).  The DuckDB oracle
#   applies the same predicate to the same full-corpus quantization —
#   a green hash proves filter-then-rank, not rank-then-filter (the
#   post-filter shape silently returns < k when the scope is
#   selective).
# - sim_recall_filtered_sq8_vs_bruteforce: recall audited against the
#   FILTERED truth — the number a scoped search actually reports.
# ---------------------------------------------------------------------------
def _sq8_filtered_oracle() -> str:
    """The inline sq8 oracle with the scope predicate pushed into its
    candidate-side join — guarded surgery (marker must appear exactly
    once), same pattern as _sq8_appended_oracle."""
    marker = "AND c.vec_id <> q.query_id"
    src = ORACLE_SQL["sim_topk_sq8"]
    if src.count(marker) != 1:
        raise AssertionError(
            f"sim_topk_sq8 oracle: expected exactly one {marker!r}, "
            f"found {src.count(marker)}"
        )
    return src.replace(
        marker,
        marker + " AND c.vec_id IN (SELECT vec_id FROM embeddings"
                 " WHERE label <= 2)",
    )


@_register(
    "sim_topk_filtered_bruteforce",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id,
               {_DUCK_COS.format(a="qv", b="e.v")} AS cos_sim
        FROM e, q WHERE e.vec_id <> q.query_id AND e.label <= 2
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_filtered_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_bruteforce(
        emb.filter(F.col("label") <= 2), emb.filter(F.col("vec_id") < 10), k=5
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_topk_filtered_sq8_prebuilt", _sq8_filtered_oracle())
@_shared_arm
def sim_topk_filtered_sq8_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "sq8")
    fidx = ann_index.ann_index_filter(idx, emb.filter(F.col("label") <= 2))
    # candidates=limit(0): the serve reads only the filtered artifact
    # view — same never-rescans-the-corpus guarantee the pytest pins
    out = similarity.topk_sq8(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5, index=fidx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_recall_filtered_sq8_vs_bruteforce", None)  # composed below
def sim_recall_filtered_sq8_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_filtered_sq8_prebuilt,
                        truth_fn=sim_topk_filtered_bruteforce)


ORACLE_SQL["sim_recall_filtered_sq8_vs_bruteforce"] = _recall_oracle(
    "sim_topk_filtered_sq8_prebuilt",
    truth_name="sim_topk_filtered_bruteforce",
)


def _jl_filtered_oracle() -> str:
    """The inline JL oracle with the scope predicate pushed into its
    candidate scan — same guarded surgery as _sq8_filtered_oracle,
    proving ann_index_filter across a STATELESS kind too (no trained
    parts to share; the filter view is pure row-part pruning)."""
    marker = "WHERE c.vec_id <> qs.query_id"
    src = ORACLE_SQL["sim_topk_jl"]
    if src.count(marker) != 1:
        raise AssertionError(
            f"sim_topk_jl oracle: expected exactly one {marker!r}, "
            f"found {src.count(marker)}"
        )
    return src.replace(
        marker,
        marker + " AND c.vec_id IN (SELECT vec_id FROM embeddings"
                 " WHERE label <= 2)",
    )


@_register("sim_topk_filtered_jl_prebuilt", _jl_filtered_oracle())
@_shared_arm
def sim_topk_filtered_jl_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "jl", d_out=_JL_DOUT)
    fidx = ann_index.ann_index_filter(idx, emb.filter(F.col("label") <= 2))
    out = similarity.topk_jl(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5, index=fidx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_recall_filtered_jl_vs_bruteforce", None)  # composed below
def sim_recall_filtered_jl_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_filtered_jl_prebuilt,
                        truth_fn=sim_topk_filtered_bruteforce)


ORACLE_SQL["sim_recall_filtered_jl_vs_bruteforce"] = _recall_oracle(
    "sim_topk_filtered_jl_prebuilt",
    truth_name="sim_topk_filtered_bruteforce",
)


def _hamming_filtered_oracle() -> str:
    """The inline hamming oracle with the scope predicate pushed into
    its candidate scan — guarded surgery like _jl_filtered_oracle.
    Hamming is a FLAT scan (every in-scope sketch scored), so the
    filtered serve can never short-fall below k while the scope holds
    >= k vectors — the opposite failure geometry to the IVF family
    below (r9 verdict #6)."""
    marker = "FROM sk c, q WHERE c.vec_id <> q.query_id"
    src = ORACLE_SQL["sim_topk_hamming"]
    if src.count(marker) != 1:
        raise AssertionError(
            f"sim_topk_hamming oracle: expected exactly one "
            f"{marker!r}, found {src.count(marker)}"
        )
    return src.replace(
        marker,
        marker + " AND c.vec_id IN (SELECT vec_id FROM embeddings"
                 " WHERE label <= 2)",
    )


@_register("sim_topk_filtered_hamming_prebuilt", _hamming_filtered_oracle())
@_shared_arm
def sim_topk_filtered_hamming_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "hamming", n_bits=_SKETCH_BITS)
    fidx = ann_index.ann_index_filter(idx, emb.filter(F.col("label") <= 2))
    out = similarity.topk_hamming(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5, index=fidx
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_recall_filtered_hamming_vs_bruteforce", None)
def sim_recall_filtered_hamming_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir,
                        sim_topk_filtered_hamming_prebuilt,
                        truth_fn=sim_topk_filtered_bruteforce)


ORACLE_SQL["sim_recall_filtered_hamming_vs_bruteforce"] = _recall_oracle(
    "sim_topk_filtered_hamming_prebuilt",
    truth_name="sim_topk_filtered_bruteforce",
)


def _cascade_filtered_oracle() -> str:
    """The inline cascade oracle with the scope predicate pushed into
    its TIER-1 candidate scan only — tiers 2-3 operate on tier-1
    survivors (already in-scope), exactly as ann_index_filter
    semi-joins both row parts of the artifact.  Flat within each
    tier, so no short-fall; the shortlist funnel composes with the
    filter (shortlist1 now drawn from the scope)."""
    marker = "FROM sk c, hq WHERE c.vec_id <> hq.query_id"
    src = ORACLE_SQL["sim_topk_cascade"]
    if src.count(marker) != 1:
        raise AssertionError(
            f"sim_topk_cascade oracle: expected exactly one "
            f"{marker!r}, found {src.count(marker)}"
        )
    return src.replace(
        marker,
        marker + " AND c.vec_id IN (SELECT vec_id FROM embeddings"
                 " WHERE label <= 2)",
    )


@_register("sim_topk_filtered_cascade_prebuilt", _cascade_filtered_oracle())
@_shared_arm
def sim_topk_filtered_cascade_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(spark, sf_dir, "cascade", n_bits=_SKETCH_BITS)
    fidx = ann_index.ann_index_filter(idx, emb.filter(F.col("label") <= 2))
    # candidates = full corpus: tier 3's late float fetch joins by
    # survivor vec_id, and survivors are in-scope by construction
    out = similarity.topk_cascade(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        shortlist1=_CASCADE_L1, shortlist2=_CASCADE_L2, index=fidx,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_recall_filtered_cascade_vs_bruteforce", None)
def sim_recall_filtered_cascade_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir,
                        sim_topk_filtered_cascade_prebuilt,
                        truth_fn=sim_topk_filtered_bruteforce)


ORACLE_SQL["sim_recall_filtered_cascade_vs_bruteforce"] = _recall_oracle(
    "sim_topk_filtered_cascade_prebuilt",
    truth_name="sim_topk_filtered_bruteforce",
)


# ---------------------------------------------------------------------------
# Filtered IVF serving with an ADAPTIVE probe budget (round-8 verdict
# #1).  The flat kinds above (sq8/jl) scan the whole filtered view and
# never short-fall; the IVF family prunes by list, so under a
# selective scope a FIXED nprobe demonstrably returns fewer than k
# in-scope answers (at sf0.01, scope `label = 4 AND vec_id % 3 = 0`
# holds 16 of 500 vectors and fixed nprobe=8 bottoms out at 2 of 5 —
# the regime tests/test_ann_index.py constructs).  min_results=k is
# the production fix (vector stores auto-raise the probe budget under
# filters): per query, probe the smallest distance-ranked prefix of
# lists whose cumulative in-scope count covers k, floored at nprobe —
# declarative, one narrow cid-count scan, no driver loop
# (operators/similarity.py:_probe_lists).  The oracle reproduces the
# budget arithmetic bit-for-bit: guarded surgery on the inline ivfpq
# oracle replaces the fixed-rank probe CTE with the cumulative-count
# budget and scopes the scored candidates — a green hash proves the
# adaptive serve returns full-k, in-scope, correctly-ranked answers
# where the fixed budget provably cannot.
# ---------------------------------------------------------------------------
_IVFPQ_FILTER_PRED = "label = 4 AND vec_id % 3 = 0"


def _ivfpq_filtered_oracle() -> str:
    """Guarded surgery on the inline ivfpq oracle: (1) the probe CTE
    becomes an all-ranks `qrank`; (2) scope / per-list in-scope count
    / self-marker / cumulative-coverage CTEs derive each query's
    adaptive budget GREATEST(nprobe, first rank covering k), probing
    every list when the scope can't fill k; (3) scored candidates are
    restricted to the scope — the same semi-join ann_index_filter
    applies to the coded part."""
    src = ORACLE_SQL["sim_topk_ivfpq"]
    m1 = "probe AS (SELECT query_id, cid FROM ("
    m2 = f"WHERE rn <= {_IVFPQ_NPROBE}),"
    m3 = "WHERE enc.vec_id <> probe.query_id"
    for m in (m1, m2, m3):
        if src.count(m) != 1:
            raise AssertionError(
                f"sim_topk_ivfpq oracle: expected exactly one {m!r}, "
                f"found {src.count(m)}"
            )
    src = src.replace(m1, "qrank AS (SELECT query_id, cid, rn FROM (")
    src = src.replace(
        m2,
        f"""),
    scope AS (SELECT vec_id FROM embeddings
              WHERE {_IVFPQ_FILTER_PRED}),
    lc AS (SELECT assign.cid, COUNT(*) AS lc
           FROM assign JOIN scope USING (vec_id) GROUP BY assign.cid),
    selfl AS (SELECT assign.vec_id AS query_id, assign.cid
              FROM assign JOIN scope USING (vec_id)
              WHERE assign.vec_id < 10),
    cum AS (SELECT qrank.query_id, qrank.cid, qrank.rn,
                   SUM(COALESCE(lc.lc, 0)
                       - CASE WHEN selfl.query_id IS NULL THEN 0 ELSE 1 END)
                       OVER (PARTITION BY qrank.query_id
                             ORDER BY qrank.rn) AS cum
            FROM qrank
            LEFT JOIN lc ON lc.cid = qrank.cid
            LEFT JOIN selfl ON selfl.query_id = qrank.query_id
                           AND selfl.cid = qrank.cid),
    need AS (SELECT query_id, MIN(CASE WHEN cum >= 5 THEN rn END) AS nd
             FROM cum GROUP BY query_id),
    probe AS (SELECT cum.query_id, cum.cid
              FROM cum JOIN need ON need.query_id = cum.query_id
              WHERE cum.rn <= GREATEST({_IVFPQ_NPROBE},
                                       COALESCE(need.nd, 2147483647))),""",
    )
    return src.replace(
        m3, m3 + " AND enc.vec_id IN (SELECT vec_id FROM scope)"
    )


@_register("sim_topk_filtered_ivfpq_prebuilt", _ivfpq_filtered_oracle())
@_shared_arm
def sim_topk_filtered_ivfpq_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    idx = _prebuilt_index(
        spark, sf_dir, "ivfpq",
        n_centroids=_IVFPQ_NCENT, m=_PQ_M, ksub=_PQ_KSUB, dsub=_PQ_DSUB,
        dim=64,
    )
    fidx = ann_index.ann_index_filter(
        idx, emb.filter((F.col("label") == 4) & (F.col("vec_id") % 3 == 0))
    )
    # min_results=k: the adaptive budget — nprobe stays the floor, so
    # an unselective scope serves at exactly the fixed-budget cost
    out = similarity.topk_ivfpq(
        emb.limit(0), emb.filter(F.col("vec_id") < 10), k=5,
        nprobe=_IVFPQ_NPROBE, index=fidx, min_results=5,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register(
    "sim_topk_filtered_bruteforce_narrow",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, e.vec_id,
               {_DUCK_COS.format(a="qv", b="e.v")} AS cos_sim
        FROM e, q WHERE e.vec_id <> q.query_id
                    AND e.{_IVFPQ_FILTER_PRED.replace('vec_id', 'e.vec_id')}
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
)
@_shared_arm
def sim_topk_filtered_bruteforce_narrow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exact truth inside the ADAPTIVE-IVF row's narrow scope —
    the recall denominator a filtered vector store reports for this
    tenant (the wider label<=2 truth above serves the sq8/jl gates)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topk_bruteforce(
        emb.filter((F.col("label") == 4) & (F.col("vec_id") % 3 == 0)),
        emb.filter(F.col("vec_id") < 10), k=5,
    )
    return out.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")


@_register("sim_recall_filtered_ivfpq_vs_bruteforce", None)  # composed below
def sim_recall_filtered_ivfpq_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_filtered_ivfpq_prebuilt,
                        truth_fn=sim_topk_filtered_bruteforce_narrow)


ORACLE_SQL["sim_recall_filtered_ivfpq_vs_bruteforce"] = _recall_oracle(
    "sim_topk_filtered_ivfpq_prebuilt",
    truth_name="sim_topk_filtered_bruteforce_narrow",
)
@_register("sim_recall_filtered_lsh_vs_bruteforce", None)  # composed below
def sim_recall_filtered_lsh_vs_bruteforce(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _recall_gate(spark, sf_dir, sim_topk_filtered_lsh_prebuilt,
                        truth_fn=sim_topk_filtered_bruteforce)


ORACLE_SQL["sim_recall_filtered_lsh_vs_bruteforce"] = _recall_oracle(
    "sim_topk_filtered_lsh_prebuilt",
    truth_name="sim_topk_filtered_bruteforce",
)


# ---------------------------------------------------------------------------
# Perceptual image dedup (round-8 verdict #3): pHash each synthesized
# image to a 63-bit DCT perceptual hash (operators/multimodal.py:
# phash64 — integer-pinned classic pHash) and pair within Hamming
# distance 6 via the generic banded joiner (dedup.hamming_near_pairs,
# 9 bands x 7 bits — pigeonhole-exact recall for d <= 8, never
# all-pairs).  This joins the repo's two strongest families: the
# multimodal codec tier supplies real BMP/PNG/JPEG decode paths, the
# dedup tier supplies the banding geometry.
#
# Fixture: docs cluster by g = doc_id // 10; each cluster's BASE image
# is the pinned-integer-IDCT decode of a DENSE-spectrum 16x16 baseline
# JPEG (all 64 zigzag slots carry group-dependent values with
# natural-image-like frequency decay — dense spectra keep the 63
# low-frequency coefficients far from the mean threshold, which is
# what buys the measured intra<=2 / inter>=13 hamming separation).
# Variants v = doc_id % 10: v=0 the JPEG file itself, v=1 the SAME
# pixels re-encoded as BMP, v=2 as PNG (all three decode to identical
# luma -> hamming 0 — "same image re-encoded must pair"), v>=3 BMP
# with 3 pixels brightened by 1..3 levels ("small perturbations must
# pair"); distinct clusters stay >= 13 bits apart ("distinct images
# must not").  The DuckDB oracle replays the ENTIRE chain closed-form:
# dequant -> pinned integer IDCT -> perturbation -> pinned 16-point
# DCT -> mean threshold -> bit packing -> banding (with the shared
# hot-bucket sub-split) -> verified pairs.
# ---------------------------------------------------------------------------

from vexere_lakehouse_pipeline_spark.operators.multimodal import (  # noqa: E402
    JPEG_IDCT_W as _PH_JW,
    JPEG_ZIGZAG as _PH_JZZ,
    PHASH_W16 as _PH_W16,
)

_PHJW = "[" + ",".join(str(v) for v in _PH_JW) + "]"
_PHJZZ = "[" + ",".join(str(v) for v in _PH_JZZ) + "]"
_PHW16 = "[" + ",".join(str(v) for v in _PH_W16) + "]"
_PHASH_BANDS, _PHASH_BAND_BITS, _PHASH_MAXHAM = 9, 7, 6


def _phash_fixture_coeffs(g: int) -> list[list[int]]:
    """Dense zigzag coefficients for cluster g's 16x16 base image —
    four 8x8 blocks, every slot nonzero-capable, magnitude decaying
    with frequency (cap = max(2, 48 >> (i DIV 12)))."""
    blks = []
    for k in range(4):
        zz = []
        for i in range(64):
            cap = max(2, 48 >> (i // 12))
            zz.append((g * (2 * i + 3) + k * (i + 7) + i * 11)
                      % (2 * cap + 1) - cap)
        zz[0] = (g * 5 + k * 17) % 200 - 100
        blks.append(zz)
    return blks


import functools


@functools.lru_cache(maxsize=4096)
def _phash_fixture_base(g: int) -> tuple[bytes, tuple[int, ...]]:
    """Cluster g's JPEG payload + decoded base pixels — cached because
    every variant of a cluster shares them (each mapInPandas worker
    pays the JPEG decode once per cluster, not once per doc)."""
    from vexere_lakehouse_pipeline_spark.operators import multimodal as mm

    jpeg = mm.encode_jpeg_coeffs(16, 16, _phash_fixture_coeffs(g))
    _w, _h, rows = mm.jpeg_decode_gray(jpeg)
    return jpeg, tuple(p for row in rows for p in row)


def _phash_fixture_payload(g: int, v: int) -> bytes:
    """Variant v of cluster g (see the block comment)."""
    from vexere_lakehouse_pipeline_spark.operators import multimodal as mm

    jpeg, base = _phash_fixture_base(g)
    if v == 0:
        return jpeg
    px = list(base)
    if v >= 3:
        delta = 1 + v % 3
        for i in range(256):
            if i % 101 == v:
                px[i] = min(255, px[i] + delta)
    rgb = [(p, p, p) for p in px]
    return (mm.encode_png(16, 16, rgb) if v == 2
            else mm.encode_bmp(16, 16, rgb))


@_register(
    "multimodal_phash_neardup_pairs",
    f"""
    WITH grids AS (SELECT DISTINCT doc_id // 10 AS g FROM documents),
    blocks AS (SELECT g, unnest(range(4)) AS k FROM grids),
    coef AS (
        SELECT g, k, CAST(i AS INTEGER) AS zz,
               CASE WHEN i = 0 THEN (g*5 + k*17) % 200 - 100
                    ELSE (g*(2*i+3) + k*(i+7) + i*11)
                         % (2*GREATEST(2, 48 >> CAST(i // 12 AS INTEGER)) + 1)
                         - GREATEST(2, 48 >> CAST(i // 12 AS INTEGER))
               END AS v
        FROM blocks, unnest(range(64)) AS t(i)
    ),
    deq AS (
        SELECT g, k, v * (1 + zz % 4) AS c,
               {{JZZ}}[zz + 1] // 8 AS fu,
               {{JZZ}}[zz + 1] % 8 AS fv
        FROM coef
    ),
    px AS (
        -- pinned integer IDCT (multimodal_jpeg_stats's bias trick:
        -- keep the dividend non-negative so // floors identically)
        SELECT g,
               CAST((k // 2) * 8 + r AS INTEGER) AS pr,
               CAST((k % 2) * 8 + cc AS INTEGER) AS pc,
               LEAST(255, GREATEST(0,
                   (SUM({{JW}}[fu*8 + r + 1] * {{JW}}[fv*8 + cc + 1] * c)
                    + 33554432 + 68719476736) // 67108864 - 1024 + 128))
                   AS pv
        FROM deq, unnest(range(8)) AS tr(r), unnest(range(8)) AS tc(cc)
        GROUP BY g, k, r, cc
    ),
    docs AS (SELECT doc_id, doc_id // 10 AS g, doc_id % 10 AS v
             FROM documents),
    luma AS (
        SELECT d.doc_id, px.pr, px.pc,
               CASE WHEN d.v >= 3 AND (px.pr * 16 + px.pc) % 101 = d.v
                    THEN LEAST(255, px.pv + 1 + d.v % 3)
                    ELSE px.pv END AS l
        FROM docs d JOIN px ON px.g = d.g
    ),
    co AS (
        SELECT doc_id, CAST(u AS INTEGER) AS u, CAST(w AS INTEGER) AS w,
               SUM({{W16}}[u*16 + pr + 1] * {{W16}}[w*16 + pc + 1] * l) AS c
        FROM luma, unnest(range(8)) AS tu(u), unnest(range(8)) AS tw(w)
        WHERE NOT (u = 0 AND w = 0)
        GROUP BY doc_id, u, w
    ),
    tot AS (SELECT doc_id, SUM(c) AS s FROM co GROUP BY doc_id),
    hashes AS (
        SELECT co.doc_id,
               CAST(SUM(CASE WHEN 63 * co.c > tot.s
                        THEN CAST(1 AS BIGINT)
                             << CAST(co.u * 8 + co.w - 1 AS INTEGER)
                        ELSE 0 END) AS BIGINT) AS ph
        FROM co JOIN tot ON tot.doc_id = co.doc_id
        GROUP BY co.doc_id
    ),
    bands AS (
        SELECT doc_id, ph, CAST(b AS INTEGER) AS b,
               (ph >> CAST(b * {_PHASH_BAND_BITS} AS INTEGER))
               & {2 ** _PHASH_BAND_BITS - 1} AS band_key
        FROM hashes, unnest(range({_PHASH_BANDS})) AS tb(b)
    ),
    bsz AS (SELECT b, band_key, COUNT(*) AS bn FROM bands
            GROUP BY b, band_key),
    bok AS (SELECT bands.doc_id, bands.ph, bands.b, bands.band_key,
                   {{SUB}} AS sub
            FROM bands JOIN bsz ON bsz.b = bands.b
                 AND bsz.band_key = bands.band_key),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.ph AS ph_a,
                        c.doc_id AS doc_b, c.ph AS ph_b
        FROM bok a JOIN bok c
          ON a.b = c.b AND a.band_key = c.band_key AND a.sub = c.sub
         AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(ph_a, ph_b)) AS hamming
    FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= {_PHASH_MAXHAM}
    ORDER BY doc_a, doc_b
    """.format(
        JZZ=_PHJZZ, JW=_PHJW, W16=_PHW16,
        SUB=_duck_sub_split("bands.doc_id", "bsz.bn",
                            dedup.MAX_BUCKET_SIZE),
    ),
)
def multimodal_phash_neardup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")

    def synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(_phash_fixture_payload(d // 10, d % 10))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = docs.select("doc_id").mapInPandas(
        synth, schema="media_id long, payload binary"
    )
    hashes = mm.extract_phash(media)
    return dedup.hamming_near_pairs(
        hashes, sig_col="phash", id_col="media_id",
        bits=mm.PHASH_BITS, n_bands=_PHASH_BANDS,
        max_hamming=_PHASH_MAXHAM,
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Bounded-history journey rollup (round-8 verdict #4): the skew16 probe
# records events_journey_paths processing a 15/16-hot user's history in
# ONE task — the documented defense ("real pipelines bound per-user
# history") is now an OPERATOR (operators/skew.py:bounded_key_history,
# the two-stage keep-latest-N cut) and this row pins its semantics:
# journey paths over each user's latest _HISTORY_CAP events.  The
# oracle applies the identical cut (ROW_NUMBER() OVER ts DESC,
# event_id DESC <= cap) before the same rollup — and the cap BITES at
# every sf (users average ~67 events, max ~99, cap 50).  The capped
# form's skew16 exponent is measured in SCALE.md.
# ---------------------------------------------------------------------------
_HISTORY_CAP = 50


def _capped_events_oracle(src_oracle: str) -> str:
    """Prepend the bounded-history CTE and re-point every events scan
    at it — guarded surgery (exact occurrence count asserted), the
    _shingle_ctes_over pattern."""
    capped = f"""
    WITH hist_capped AS (
        SELECT event_id, user_id, ts, event_type FROM (
            SELECT event_id, user_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS hrn
            FROM events) WHERE hrn <= {_HISTORY_CAP}
    ),"""
    marker = "WITH "
    if not src_oracle.lstrip().startswith("WITH "):
        raise AssertionError("capped oracle: source must start with WITH")
    body = src_oracle.lstrip()[len(marker):]
    if body.count("FROM events") < 1:
        raise AssertionError("capped oracle: no events scan to re-point")
    return capped + body.replace("FROM events", "FROM hist_capped")


ORACLE_SQL["events_journey_paths_capped"] = _capped_events_oracle(
    ORACLE_SQL["events_journey_paths"]
)


@_register("events_journey_paths_capped")
def events_journey_paths_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.skew import (
        bounded_key_history,
    )

    events = load_table(spark, sf_dir, "events")
    capped = bounded_key_history(
        events.select("event_id", "user_id", "ts", "event_type"),
        key="user_id", ts_col="ts", max_rows=_HISTORY_CAP,
        tiebreak="event_id",
    )
    return _journey_rollup(capped)
