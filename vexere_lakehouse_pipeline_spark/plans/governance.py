"""Governance & graph extensions: PII pseudonymization, k-anonymity,
exact-arithmetic anomaly gating, dedup survivor selection, and the
k-NN similarity graph.

North-star surface (no reference analog — the reference publishes raw
operator records straight to gold, SURVEY.md §2.1): the privacy gate a
pipeline runs before any customer slice leaves silver, the
anomaly screen run over revenue rollups, and the two graph-shaped
corpus operators (survivor choice per duplicate cluster, k-NN edges
for diversity/clustering work).

Portability rules (MEMORY: oracle gate):
- sha2(x,256) (Spark) and sha256(x) (DuckDB) both emit lowercase hex.
- Regex patterns are character-class-only (Java regex ≡ RE2); DuckDB
  needs the explicit 'g' flag to match Spark's global-replace default.
- The anomaly gate compares z² > T² entirely in exact DECIMAL(38,0)
  integer arithmetic — money is cast to decimal cents first, so no
  float ever enters the comparison and the flag is bit-portable.
  Trailing means use the (2a+n) div 2n int64 rounding from
  plans/corpus.py, not ROUND(double,·) (engine rounding of doubles
  diverges at .5 boundaries — see text_unigram_logprob_scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.operators import dedup, privacy, quality, sampling, similarity
from vexere_lakehouse_pipeline_spark.operators.caching import CheckpointCache
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn
from vexere_lakehouse_pipeline_spark.plans.star_ml import (
    _DUCK_BUCKET,
    _DUCK_COS,
    _DUCK_EMB,
    _DUCK_SHINGLE_CTES,
    _duck_sub_split,
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
# Pseudonymization — masked display name + salted SHA-256 surrogate.
# Pure projection (regexp + sha2): no shuffle, whole-stage codegen,
# scales with scan bandwidth.  The surrogate is deterministic so joins
# against other pseudonymized tables using the same salt still work.
# ---------------------------------------------------------------------------
_SALT = "v1:"

@_register(
    "privacy_pseudonymize_customers",
    f"""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked_name,
           sha256('{_SALT}' || c_name) AS surrogate_id
    FROM customer ORDER BY c_custkey
    """,
)
def privacy_pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        privacy.mask_digits("c_name").alias("masked_name"),
        privacy.pseudonymize("c_name", _SALT).alias("surrogate_id"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# k-anonymity over quasi-identifiers (segment, nation, coarse balance
# bucket).  One map-side-partial aggregation; output cardinality is the
# anonymity-set count.  floor(double/1000) is a single IEEE divide +
# floor on identical inputs — bit-portable.
# ---------------------------------------------------------------------------
_K_THRESHOLD = 5

@_register(
    "privacy_kanonymity_report",
    f"""
    SELECT c_mktsegment, c_nationkey,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           COUNT(*) AS group_size,
           COUNT(*) >= {_K_THRESHOLD} AS meets_k
    FROM customer
    GROUP BY c_mktsegment, c_nationkey, bal_bucket
    ORDER BY c_mktsegment, c_nationkey, bal_bucket
    """,
)
def privacy_kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    quasi = cust.select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
    )
    return privacy.k_anonymity_report(
        quasi, ["c_mktsegment", "c_nationkey", "bal_bucket"], k=_K_THRESHOLD
    ).orderBy("c_mktsegment", "c_nationkey", "bal_bucket")


# ---------------------------------------------------------------------------
# Trailing-window revenue anomaly gate — |z| > 2 against the 7-day
# trailing mean/stddev, decided WITHOUT floats: with s1 = Σx, s2 = Σx²
# and n over the window (exact integer cents),
#     z² > T²  ⇔  (n·x − s1)² · (n−1)  >  T² · n · (n·s2 − s1²)
# which is exact DECIMAL(38,0) arithmetic on both engines.  The daily
# rollup is one shuffle; the window is one sort within the (tiny)
# day-level frame.  At 1000× data the day cardinality barely grows —
# the rollup output stays a few thousand rows regardless of input TB.
# ---------------------------------------------------------------------------
_Z_T = 2  # |z| threshold
_MIN_N = 4  # minimum trailing days before the gate can fire

_ANOM_FLAG = (
    "n >= {min_n} AND (n * s2 - s1 * s1) > 0 AND "
    "(n * x - s1) * (n * x - s1) * (n - 1) > {t2} * n * (n * s2 - s1 * s1)"
)
# Integer division must run on BIGINT, not DECIMAL: DuckDB's `//` on
# decimals routes through DOUBLE division (decimal `/` is double) and
# its floor can land one off near-integer quotients; int64 `//` is
# exact on both engines.  s1 fits int64 far past 100 TB daily volumes.
_MEAN_CENTS = (
    "CAST((2 * CAST(s1 AS BIGINT) + CAST(n AS BIGINT))"
    " {div} (2 * CAST(n AS BIGINT)) AS BIGINT)"
)

@_register(
    "anomaly_daily_revenue",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                 AS rev_cents
        FROM orders GROUP BY day
    ),
    win AS (
        SELECT day, rev_cents,
               CAST(rev_cents AS DECIMAL(38,0)) AS x,
               SUM(CAST(rev_cents AS DECIMAL(38,0)))
                   OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS s1,
               SUM(CAST(rev_cents AS DECIMAL(38,0))
                   * CAST(rev_cents AS DECIMAL(38,0)))
                   OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS s2,
               CAST(COUNT(*)
                   OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 AS DECIMAL(38,0)) AS n
        FROM daily
    )
    SELECT day, rev_cents,
           CAST(n AS BIGINT) AS trailing_n,
           {_MEAN_CENTS.format(div="//")} AS trailing_mean_cents,
           {_ANOM_FLAG.format(min_n=_MIN_N, t2=_Z_T * _Z_T)} AS is_anomaly
    FROM win ORDER BY day
    """,
)
def anomaly_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"
            ).alias("rev_cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    dec = F.col("rev_cents").cast("decimal(38,0)")
    win = daily.select(
        "day",
        "rev_cents",
        dec.alias("x"),
        F.sum(dec).over(w).cast("decimal(38,0)").alias("s1"),
        F.sum((dec * dec).cast("decimal(38,0)")).over(w)
        .cast("decimal(38,0)")
        .alias("s2"),
        F.count("*").over(w).cast("decimal(38,0)").alias("n"),
    )
    return win.select(
        "day",
        "rev_cents",
        F.col("n").cast("long").alias("trailing_n"),
        F.expr(_MEAN_CENTS.format(div="DIV")).alias("trailing_mean_cents"),
        F.expr(_ANOM_FLAG.format(min_n=_MIN_N, t2=_Z_T * _Z_T)).alias(
            "is_anomaly"
        ),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Dedup survivor selection — the "keep the best copy" policy over
# near-dup clusters (operators/dedup.survivor_selection).  The oracle
# re-derives the clusters with the shared recursive-CTE mirror and
# crowns the same (quality desc, doc_id) winner.
# ---------------------------------------------------------------------------
@_register(
    "dedup_survivor_selection",
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
    comp AS (SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u),
    full_t AS (
        SELECT d.doc_id,
               COALESCE(c.component_id, d.doc_id) AS component_id,
               d.n_chars AS quality
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, component_id, quality,
           FIRST_VALUE(doc_id) OVER (
               PARTITION BY component_id ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS survivor_id,
           doc_id = FIRST_VALUE(doc_id) OVER (
               PARTITION BY component_id ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS is_survivor
    FROM full_t ORDER BY doc_id
    """,
)
def dedup_survivor_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.survivor_selection(docs, quality_col="n_chars").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# k-NN graph (exact strategy, oracle-checked on the full table; the
# LSH strategy is the scale path, recall-gated in tests).
# ---------------------------------------------------------------------------
_KNN_K = 3

@_register(
    "sim_knn_graph",
    f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM scored
    )
    SELECT src, dst, cos_sim, rnk FROM ranked WHERE rnk <= {_KNN_K}
    ORDER BY src, rnk
    """,
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_graph(emb, k=_KNN_K, strategy="exact").orderBy(
        "src", "rnk"
    )


# ---------------------------------------------------------------------------
# Recall gate for the LSH k-NN graph strategy — the same contract the
# top-k paths carry (sim_recall_lsh_vs_bruteforce, sim_recall_int8_vs_
# bruteforce): the approximate scale path is never shipped ungated.
# Per-source recall@k of knn_graph(strategy='lsh') against the exact
# graph; the floor is pinned in tests/test_dedup_similarity.py.
# ---------------------------------------------------------------------------
_EXACT_KNN_CACHE = CheckpointCache(maxsize=4)


def _exact_knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact k-NN truth arm SHARED by both LSH recall gates
    (VERDICT r4 #3): computed once per (session, sf_dir) and pinned
    with a lazy localCheckpoint, so a bench/gate run that evaluates
    both gates pays for the O(n²) exact graph once.  The cache is
    keyed by applicationId — a new session never sees another
    session's (dead) checkpoint — and CAPPED with unpersist-on-evict
    (round-5 ADVICE: unbounded entries pin dead checkpoint blocks when
    one session walks many sf_dirs)."""

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return similarity.knn_graph(emb, k=_KNN_K, strategy="exact").select(
            "src", "dst"
        )

    return _EXACT_KNN_CACHE.get(spark, "exact_knn_edges", sf_dir, build)
@_register(
    "sim_recall_knn_lsh_vs_exact",
    f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM scored WHERE cos_sim IS NOT NULL
    ),
    exact AS (SELECT src, dst FROM ranked WHERE rnk <= {_KNN_K}),
    eb AS (SELECT vec_id, v, {_DUCK_BUCKET.format(v="v")} AS bucket FROM e),
    lscored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM eb a JOIN eb b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    lranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM lscored WHERE cos_sim IS NOT NULL
    ),
    lsh AS (SELECT src, dst FROM lranked WHERE rnk <= {_KNN_K})
    SELECT ex.src,
           COUNT(l.dst) AS n_hit,
           COUNT(*) AS k,
           ROUND(COUNT(l.dst) * 1.0 / COUNT(*), 4) AS recall
    FROM exact ex LEFT JOIN lsh l
      ON l.src = ex.src AND l.dst = ex.dst
    GROUP BY ex.src ORDER BY ex.src
    """,
)
def sim_recall_knn_lsh_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    truth = _exact_knn_edges(spark, sf_dir)
    approx = similarity.knn_graph(
        emb, k=_KNN_K, strategy="lsh", n_bits=4
    ).select(F.col("src").alias("a_src"), F.col("dst").alias("a_dst"))
    joined = truth.join(
        approx,
        (truth["src"] == approx["a_src"]) & (truth["dst"] == approx["a_dst"]),
        "left",
    )
    return (
        joined.groupBy("src")
        .agg(
            F.count("a_dst").alias("n_hit"),
            F.count("*").alias("k"),
            F.round(F.count("a_dst") * 1.0 / F.count("*"), 4).alias("recall"),
        )
        .orderBy("src")
    )


# ---------------------------------------------------------------------------
# Multi-table LSH k-NN recall gate — the recall LEVER, gated the same
# way.  Single-table sign-LSH recall@3 on the near-orthogonal test
# embeddings is ~0.13 (the row above measures it); unioning 8
# independent hash tables over disjoint dim slices lifts it to ~0.70
# at an 8x bucket-join volume multiplier (linear, bounded).  The
# oracle mirrors the union + pair-dedup + score-once semantics.
# ---------------------------------------------------------------------------
_KNN_TABLES = 8


@_register(
    "sim_recall_knn_lsh_multitable",
    f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM scored WHERE cos_sim IS NOT NULL
    ),
    exact AS (SELECT src, dst FROM ranked WHERE rnk <= {_KNN_K}),
    ts AS (SELECT unnest(range(0, {_KNN_TABLES})) AS t),
    eb AS (SELECT vec_id, ts.t AS t,
                  array_to_string(list_transform(v[ts.t*4+1 : ts.t*4+4],
                      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')
                      AS bucket
           FROM e CROSS JOIN ts),
    cand AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
             FROM eb a JOIN eb b
               ON a.t = b.t AND a.bucket = b.bucket
              AND a.vec_id <> b.vec_id),
    lscored AS (
        SELECT cand.src, cand.dst,
               {_DUCK_COS.format(a="ea.v", b="eb2.v")} AS cos_sim
        FROM cand JOIN e ea ON ea.vec_id = cand.src
                  JOIN e eb2 ON eb2.vec_id = cand.dst
    ),
    lranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM lscored WHERE cos_sim IS NOT NULL
    ),
    lsh AS (SELECT src, dst FROM lranked WHERE rnk <= {_KNN_K})
    SELECT ex.src,
           COUNT(l.dst) AS n_hit,
           COUNT(*) AS k,
           ROUND(COUNT(l.dst) * 1.0 / COUNT(*), 4) AS recall
    FROM exact ex LEFT JOIN lsh l
      ON l.src = ex.src AND l.dst = ex.dst
    GROUP BY ex.src ORDER BY ex.src
    """,
)
def sim_recall_knn_lsh_multitable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.plans.star_ml import (
        _prebuilt_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    truth = _exact_knn_edges(spark, sf_dir)
    # round 9: the approx arm serves from the materialized lsh
    # artifact (its own 8-table config, aliased path) — the last gate
    # still rebuilding its index inline; output identical, the bucket
    # self-join now carries only ids with floats late-fetched
    idx = _prebuilt_index(spark, sf_dir, "lsh", alias="lsh_knn8",
                          n_bits=4, n_tables=_KNN_TABLES)
    approx = similarity.knn_graph(
        emb, k=_KNN_K, strategy="lsh", index=idx
    ).select(F.col("src").alias("a_src"), F.col("dst").alias("a_dst"))
    joined = truth.join(
        approx,
        (truth["src"] == approx["a_src"]) & (truth["dst"] == approx["a_dst"]),
        "left",
    )
    return (
        joined.groupBy("src")
        .agg(
            F.count("a_dst").alias("n_hit"),
            F.count("*").alias("k"),
            F.round(F.count("a_dst") * 1.0 / F.count("*"), 4).alias("recall"),
        )
        .orderBy("src")
    )


# ---------------------------------------------------------------------------
# Fixed-point PageRank over the k-NN graph (operators/graph.py).  The
# oracle unrolls the fixed iteration count into chained CTEs; because
# the operator is pure int64 arithmetic, the oracle is exact — no
# float accumulation order anywhere.  Centrality over the similarity
# graph = the "most representative exemplars" score used for
# diversity-aware corpus sampling.
# ---------------------------------------------------------------------------
_PR_ITERS = 3
_PR_DAMP = 85


def _pagerank_oracle() -> str:
    knn_edges = f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM scored
    ),
    edges AS (SELECT src, dst FROM ranked WHERE rnk <= {_KNN_K}),
    odeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS c FROM e),
    pr0 AS (SELECT e.vec_id AS id, 1000000000000 // nn.c AS pr
            FROM e CROSS JOIN nn)"""
    its = []
    prev = "pr0"
    for i in range(1, _PR_ITERS + 1):
        its.append(f"""
    it{i} AS (
        SELECT nd.vec_id AS id,
               ((100 - {_PR_DAMP}) * 1000000000000 // 100) // nn.c
               + ({_PR_DAMP} * COALESCE(SUM(p.pr // o.od), 0)) // 100 AS pr
        FROM e nd CROSS JOIN nn
        LEFT JOIN edges ed ON ed.dst = nd.vec_id
        LEFT JOIN odeg o ON o.src = ed.src
        LEFT JOIN {prev} p ON p.id = ed.src
        GROUP BY nd.vec_id, nn.c
    )""")
        prev = f"it{i}"
    return (
        knn_edges + "," + ",".join(its)
        + f"""
    SELECT id AS vec_id, CAST(pr AS BIGINT) AS pr_e12
    FROM {prev} ORDER BY vec_id
    """
    )


@_register("graph_pagerank_knn", _pagerank_oracle())
def graph_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators import graph

    emb = load_table(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=_KNN_K, strategy="exact").select(
        "src", "dst"
    )
    nodes = emb.select("vec_id")
    return graph.pagerank_fixed_point(
        edges, nodes, iters=_PR_ITERS, damping_pct=_PR_DAMP
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Triangle counting over the k-NN graph (operators/graph.py
# triangle_counts) — the local-density signal behind clustering
# coefficients: a document whose neighbors are also mutual neighbors
# sits in a tight near-duplicate/topic cluster; isolated bridges have
# degree but no triangles.  Pure integer counts, exact oracle.
# ---------------------------------------------------------------------------
@_register(
    "graph_triangle_counts",
    f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM scored
    ),
    edges AS (SELECT src, dst FROM ranked WHERE rnk <= {_KNN_K}),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges WHERE src <> dst),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pern AS (
        SELECT node, COUNT(*) AS n_tri FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY node
    ),
    deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
        ) GROUP BY node
    )
    SELECT e.vec_id,
           CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
           CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_triangles
    FROM e
    LEFT JOIN deg d ON d.node = e.vec_id
    LEFT JOIN pern p ON p.node = e.vec_id
    ORDER BY e.vec_id
    """,
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators import graph

    emb = load_table(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=_KNN_K, strategy="exact").select(
        "src", "dst"
    )
    return graph.triangle_counts(edges, emb.select("vec_id")).orderBy(
        "vec_id"
    )


# ---------------------------------------------------------------------------
# Edit-distance verification of LSH candidates (operators/dedup.py):
# levenshtein is implemented natively AND identically (integer DP) in
# Spark and DuckDB, so the verifier is oracle-exact; the similarity
# score stays in integer permille (1000·dist ÷ maxlen via DIV).  The
# registered query verifies at the near-dup threshold (sim ≥ 700‰) so
# the Spark side can run the length prefilter + Ukkonen band
# (O(len·band) per pair, ~10× less DP work); the oracle computes the
# full distance and applies the same threshold — identical survivors
# by the band-correctness bound enforced in the operator.
# ---------------------------------------------------------------------------
_ED_MAX_PERMILLE = 300
_ED_BAND = 200

@_register(
    "dedup_editdist_verify",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLE_CTES},
    scored AS (
        SELECT p.doc_a, p.doc_b,
               levenshtein(da.text, db.text) AS edit_dist,
               CASE WHEN greatest(length(da.text), length(db.text)) = 0
                    THEN 1000
                    ELSE 1000 - 1000 * levenshtein(da.text, db.text)
                         // greatest(length(da.text), length(db.text)) END
                 AS sim_permille
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    )
    SELECT doc_a, doc_b, edit_dist, sim_permille
    FROM scored WHERE sim_permille >= {1000 - _ED_MAX_PERMILLE}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.editdist_verify_pairs(
        docs, max_permille_dist=_ED_MAX_PERMILLE, band=_ED_BAND
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Bigram-LM quality score — the second-order companion of
# text_unigram_logprob_scores (plans/corpus.py): fit bigram + unigram
# counts over the corpus, score each doc by mean log10 p(w2|w1) =
# log10(c(w1 w2) / c(w1)).  Same portability discipline: per-bigram
# logprobs are 6dp decimals summed exactly; the mean is the shared
# integer micro-unit rounding.  Docs shorter than 2 tokens contribute
# their whole-text fallback shingle (word_shingles semantics, mirrored
# in the oracle) — consistent on both engines by construction.
# Scale: the bigram model is vocab²-bounded but Zipf-sparse; both
# joins are equi-joins on the shingle/token hash, no driver state.
# ---------------------------------------------------------------------------
from vexere_lakehouse_pipeline_spark.functions.text import tokenize, word_shingles
from vexere_lakehouse_pipeline_spark.plans.corpus import _MEAN_MICRO
from vexere_lakehouse_pipeline_spark.plans.star_ml import _DUCK_TOKENS, _duck_shingles


@_register(
    "text_bigram_logprob_scores",
    f"""
    WITH tokt AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    bi AS (SELECT doc_id, unnest({_duck_shingles(2)}) AS bg FROM tokt),
    uni AS (SELECT doc_id, unnest(w) AS token FROM tokt),
    cbi AS (SELECT bg, COUNT(*) AS c2 FROM bi GROUP BY bg),
    cuni AS (SELECT token, COUNT(*) AS c1 FROM uni GROUP BY token),
    lp AS (
        SELECT cbi.bg,
               CAST(ROUND(LOG10(CAST(cbi.c2 AS DOUBLE)
                    / CAST(cuni.c1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp
        FROM cbi JOIN cuni
          ON cuni.token = CASE WHEN strpos(cbi.bg, ' ') > 0
                               THEN substr(cbi.bg, 1, strpos(cbi.bg, ' ') - 1)
                               ELSE cbi.bg END
    ),
    agg AS (
        SELECT b.doc_id,
               CAST(SUM(lp.lp) * 1000000 AS BIGINT) AS s_micro,
               COUNT(*) AS n_bigrams
        FROM bi b JOIN lp ON lp.bg = b.bg GROUP BY b.doc_id
    )
    SELECT doc_id,
           {_MEAN_MICRO.format(s="s_micro", n="n_bigrams", div="//")}
             AS mean_logprob,
           n_bigrams
    FROM agg ORDER BY doc_id
    """,
)
def text_bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialized once: bi feeds both the model fit (cbi) and the
    # final scoring join — unpinned, the shingle explode re-executes
    # per consumer (same pattern as corpus.doc_token_table)
    bi = docs.select(
        "doc_id", F.explode(word_shingles("text", 2)).alias("bg")
    ).localCheckpoint(eager=True)
    uni = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    cbi = bi.groupBy("bg").agg(F.count("*").alias("c2"))
    cuni = uni.groupBy("token").agg(F.count("*").alias("c1"))
    first_word = F.expr(
        "CASE WHEN instr(bg, ' ') > 0"
        " THEN substr(bg, 1, instr(bg, ' ') - 1) ELSE bg END"
    )
    lp = (
        cbi.withColumn("_w1", first_word)
        .join(cuni, F.col("_w1") == F.col("token"))
        .select(
            "bg",
            F.round(
                F.log10(F.col("c2").cast("double") / F.col("c1").cast("double")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    agg = (
        bi.join(lp, on="bg")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(SUM(lp) * 1000000 AS BIGINT)").alias("s_micro"),
            F.count("*").alias("n_bigrams"),
        )
    )
    return agg.select(
        "doc_id",
        F.expr(
            _MEAN_MICRO.format(s="s_micro", n="n_bigrams", div="DIV")
        ).alias("mean_logprob"),
        "n_bigrams",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Event-type transition matrix — first-order Markov behavior model per
# user stream: lag-window pairs → transition counts → integer-permille
# conditional probability (1000·c(a→b) DIV Σc(a→·), exact on both
# engines; no float division anywhere).  One window shuffle on user_id
# + one count aggregation; the matrix is |event_types|² — tiny forever.
# ---------------------------------------------------------------------------
@_register(
    "events_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    pairs_t AS (
        SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    tot AS (SELECT from_type, SUM(n) AS n_from FROM pairs_t GROUP BY from_type)
    SELECT p.from_type, p.to_type, p.n,
           CAST(1000 * p.n // t.n_from AS BIGINT) AS prob_permille
    FROM pairs_t p JOIN tot t ON t.from_type = p.from_type
    ORDER BY p.from_type, p.to_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    pairs_t = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = pairs_t.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs_t.join(tot, on="from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("CAST(1000 * n DIV n_from AS BIGINT)").alias(
                "prob_permille"
            ),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# Edge-weighted PageRank over the k-NN graph: cosine affinity quantized
# to a POSITIVE integer weight w = floor((cos+1)·500)+1 ∈ [1, 1001]
# (floor of an identical double is bit-portable; the +1 shift keeps
# anti-correlated neighbors at positive weight).  Same unrolled-CTE
# oracle discipline as the unweighted query — the operator is pure
# int64, so the oracle is exact.
# ---------------------------------------------------------------------------
_PRW_WEIGHT = "CAST(FLOOR((cos_sim + 1) * 500) AS BIGINT) + 1"


def _pagerank_weighted_oracle() -> str:
    head = f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM scored
    ),
    edges AS (SELECT src, dst, {_PRW_WEIGHT} AS w
              FROM ranked WHERE rnk <= {_KNN_K}),
    wsum AS (SELECT src, SUM(w) AS wsum FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS c FROM e),
    pr0 AS (SELECT e.vec_id AS id, 1000000000000 // nn.c AS pr
            FROM e CROSS JOIN nn)"""
    its = []
    prev = "pr0"
    for i in range(1, _PR_ITERS + 1):
        its.append(f"""
    it{i} AS (
        SELECT nd.vec_id AS id,
               ((100 - {_PR_DAMP}) * 1000000000000 // 100) // nn.c
               + ({_PR_DAMP} * COALESCE(SUM((p.pr * ed.w) // ws.wsum), 0)) // 100
                 AS pr
        FROM e nd CROSS JOIN nn
        LEFT JOIN edges ed ON ed.dst = nd.vec_id
        LEFT JOIN wsum ws ON ws.src = ed.src
        LEFT JOIN {prev} p ON p.id = ed.src
        GROUP BY nd.vec_id, nn.c
    )""")
        prev = f"it{i}"
    return (
        head + "," + ",".join(its)
        + f"""
    SELECT id AS vec_id, CAST(pr AS BIGINT) AS pr_e12
    FROM {prev} ORDER BY vec_id
    """
    )


@_register("graph_pagerank_weighted", _pagerank_weighted_oracle())
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators import graph

    emb = load_table(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=_KNN_K, strategy="exact").select(
        "src",
        "dst",
        F.expr(_PRW_WEIGHT).alias("w"),
    )
    nodes = emb.select("vec_id")
    return graph.pagerank_weighted_fixed_point(
        edges, nodes, weight_col="w", iters=_PR_ITERS, damping_pct=_PR_DAMP
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Corpus distribution drift (PSI) between two sources — the gate run
# when a new crawl lands: bucket a quality feature, compare the two
# distributions with the population-stability index
#   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b).
# Portability: per-bucket contributions are computed from exact integer
# counts via the SAME double expression tree on both engines, rounded
# to 6dp decimals, then summed exactly (TF-IDF discipline); Laplace
# +1 smoothing keeps empty buckets finite.  Two map-side-partial
# aggregations (one per side is fused into one grouped pass on
# (bucket, side)); the bucket table is tiny forever.
# ---------------------------------------------------------------------------
_PSI_BUCKETS = 10
_DRIFT_A, _DRIFT_B = "src0", "src1"

@_register(
    "quality_drift_psi",
    f"""
    WITH scored AS (
        SELECT source,
               CAST(least(floor(length(text) / 60.0), {_PSI_BUCKETS - 1})
                    AS BIGINT) AS bucket
        FROM documents WHERE source IN ('{_DRIFT_A}', '{_DRIFT_B}')
    ),
    counts AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN source = '{_DRIFT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN source = '{_DRIFT_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM scored GROUP BY bucket
    ),
    tot AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM counts),
    contrib AS (
        SELECT c.bucket, c.n_a, c.n_b,
               CAST(ROUND(
                   (CAST(c.n_a + 1 AS DOUBLE) / CAST(t.t_a + {_PSI_BUCKETS} AS DOUBLE)
                    - CAST(c.n_b + 1 AS DOUBLE) / CAST(t.t_b + {_PSI_BUCKETS} AS DOUBLE))
                   * ln((CAST(c.n_a + 1 AS DOUBLE) / CAST(t.t_a + {_PSI_BUCKETS} AS DOUBLE))
                        / (CAST(c.n_b + 1 AS DOUBLE) / CAST(t.t_b + {_PSI_BUCKETS} AS DOUBLE))),
                   6) AS DOUBLE) AS psi_term
        FROM counts c CROSS JOIN tot t
    )
    SELECT bucket, n_a, n_b, psi_term FROM contrib ORDER BY bucket
    """,
)
def quality_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.filter(
        F.col("source").isin(_DRIFT_A, _DRIFT_B)
    ).select(
        "source",
        F.least(
            F.floor(F.length("text") / 60.0), F.lit(_PSI_BUCKETS - 1)
        ).cast("bigint").alias("bucket"),
    )
    counts = scored.groupBy("bucket").agg(
        F.sum(F.when(F.col("source") == _DRIFT_A, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("source") == _DRIFT_B, 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    pa = f"(CAST(n_a + 1 AS DOUBLE) / CAST(t_a + {_PSI_BUCKETS} AS DOUBLE))"
    pb = f"(CAST(n_b + 1 AS DOUBLE) / CAST(t_b + {_PSI_BUCKETS} AS DOUBLE))"
    return (
        counts.join(F.broadcast(tot))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.expr(
                f"CAST(ROUND(({pa} - {pb}) * ln({pa} / {pb}), 6)"
                " AS DOUBLE)"
            ).alias("psi_term"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Incremental ingest dedup — new batch (source='src0') vs the existing
# corpus (every other source).  The oracle reuses the shared band CTE
# (cap over the union, like the operator) and keeps only cross-side
# pairs, oriented new→old.
# ---------------------------------------------------------------------------
@_register(
    "dedup_incremental_new_vs_corpus",
    f"""
    WITH {_DUCK_SHINGLE_CTES},
    src AS (SELECT doc_id, COALESCE(source, '') = 'src0' AS is_new FROM documents)
    SELECT CASE WHEN sa.is_new THEN p.doc_a ELSE p.doc_b END AS doc_new,
           CASE WHEN sa.is_new THEN p.doc_b ELSE p.doc_a END AS doc_old
    FROM pairs p
    JOIN src sa ON sa.doc_id = p.doc_a
    JOIN src sb ON sb.doc_id = p.doc_b
    WHERE sa.is_new <> sb.is_new
    ORDER BY doc_new, doc_old
    """,
)
def dedup_incremental_new_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # null-safe split: a NULL source is corpus, not dropped — keeps the
    # band-bucket census (and emitted pairs) aligned with the oracle,
    # which buckets over ALL documents.
    batch = docs.filter(F.col("source").eqNullSafe("src0"))
    corpus = docs.filter(~F.col("source").eqNullSafe("src0"))
    return dedup.incremental_candidate_pairs(batch, corpus).orderBy(
        "doc_new", "doc_old"
    )


# ---------------------------------------------------------------------------
# Exact per-group quantiles WITHOUT a sketch: rank every row in its
# group (one window shuffle on the group key), pick the rows whose
# rank equals ceil(q·n) — the nearest-rank definition, pure integer
# arithmetic, so unlike approx_percentile/reservoir sketches this is
# bit-portable and oracle-exact.  Right whenever per-group cardinality
# fits a partition (group-level quantiles over sources/languages/
# shards); the sketch path remains the whole-table answer.
# ---------------------------------------------------------------------------
_QUANTS = (25, 50, 75, 90)

@_register(
    "corpus_length_percentiles",
    f"""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    ),
    marks AS (
        SELECT r.source, q.q, r.n_chars
        FROM ranked r
        JOIN (SELECT unnest(ARRAY{list(_QUANTS)}) AS q) q
          ON r.rnk = CAST((q.q * r.n + 99) // 100 AS BIGINT)
    )
    SELECT source, q AS percentile, n_chars AS value
    FROM marks ORDER BY source, percentile
    """,
)
def corpus_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    qs = spark.createDataFrame([(q,) for q in _QUANTS], "q int")
    return (
        ranked.join(
            F.broadcast(qs),
            F.col("rnk") == F.expr("CAST((q * n + 99) DIV 100 AS BIGINT)"),
        )
        .select(
            "source", F.col("q").alias("percentile"), F.col("n_chars").alias("value")
        )
        .orderBy("source", "percentile")
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation — recency (days since last order),
# frequency (order count), monetary (decimal revenue), each cut into
# quartiles over a deterministic total order (metric + custkey
# tiebreak, so ties split identically on both engines).  The quartiles
# come from operators/packing.distributed_ntile — exact NTILE(4)
# semantics WITHOUT the single-partition window a bare
# ntile().over(orderBy) plans (the rollup is customer-cardinality:
# ~1e8 rows at real scale, too big for one task).  One aggregation on
# custkey + three distributed rank passes.
# ---------------------------------------------------------------------------
@_register(
    "customer_rfm_segments",
    """
    WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    per_cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(CAST(o_orderdate AS DATE)), maxd.d0)
                 AS recency_days,
               COUNT(*) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders CROSS JOIN maxd
        GROUP BY o_custkey, maxd.d0
    )
    SELECT o_custkey AS custkey, recency_days, frequency,
           CAST(monetary AS DOUBLE) AS monetary,
           NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_quartile,
           NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_quartile,
           NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_quartile
    FROM per_cust ORDER BY custkey
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("d0")
    )
    per_cust = (
        orders.join(F.broadcast(maxd))
        .groupBy("o_custkey", "d0")
        .agg(
            F.datediff(F.col("d0"), F.max(F.to_date("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
    )
    from vexere_lakehouse_pipeline_spark.operators.packing import (
        distributed_ntile,
    )

    base = per_cust.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        "frequency",
        "monetary",
    )
    # descending metrics: negate for the ascending prefix-sum order
    cut = distributed_ntile(
        base, ["recency_days", "custkey"], 4, out_col="r_quartile"
    )
    cut = distributed_ntile(
        cut.withColumn("_nf", -F.col("frequency")),
        ["_nf", "custkey"],
        4,
        out_col="f_quartile",
    ).drop("_nf")
    cut = distributed_ntile(
        cut.withColumn("_nm", -F.col("monetary")),
        ["_nm", "custkey"],
        4,
        out_col="m_quartile",
    ).drop("_nm")
    return cut.select(
        "custkey",
        "recency_days",
        "frequency",
        # output as double on BOTH engines: no r1 driver precedent
        # exists for decimal-typed outputs (tools/dtype_audit.py); the
        # quartile cuts above ordered on the exact decimal
        F.col("monetary").cast("double").alias("monetary"),
        "r_quartile",
        "f_quartile",
        "m_quartile",
    ).orderBy("custkey")


# ---------------------------------------------------------------------------
# l-diversity — k-anonymity's complement: a quasi-identifier group
# whose SENSITIVE attribute takes too few distinct values leaks it
# even at k >= threshold (everyone in the group shares the secret).
# Sensitive attribute here: the account-balance band.  One aggregation
# with a count-distinct (partial dedup map-side); matrix-sized output.
# ---------------------------------------------------------------------------
_L_THRESHOLD = 2

@_register(
    "privacy_ldiversity_report",
    f"""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS group_size,
           COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) AS l_distinct,
           COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT))
             >= {_L_THRESHOLD} AS meets_l
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def privacy_ldiversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    sens = F.floor(F.col("c_acctbal") / 2000).cast("bigint")
    return (
        cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count("*").alias("group_size"),
            F.countDistinct(sens).alias("l_distinct"),
            (F.countDistinct(sens) >= _L_THRESHOLD).alias("meets_l"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# NATIVE session windows (F.session_window) — the built-in dynamic-gap
# sessionizer, complementing the manual lag/islands implementation
# (events_sessionization, plans/star_ml.py) that predates it.  Works
# identically in batch and Structured Streaming, which is why the
# operator matters: one definition serves both.  Semantics note the
# oracle mirrors: session_window MERGES an event iff gap < 30min
# (STRICT), so the islands CTE breaks on >= — one boundary unit
# different from the manual query's > break.
# ---------------------------------------------------------------------------
@_register(
    "events_session_windows_native",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                       THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ),
    sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def events_session_windows_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        session_window_counts,
    )

    events = load_table(spark, sf_dir, "events")
    return session_window_counts(events).orderBy("user_id", "session_start")


# ---------------------------------------------------------------------------
# END-TO-END corpus construction — the whole dedup-and-select pipeline
# as ONE verified plan: near-dup clustering → keep-best survivor per
# cluster → quality-ranked char-budget selection (top 60% of surviving
# chars).  Every stage is an already-verified operator (survivor
# selection, distributed prefix sum); this query pins their
# COMPOSITION, the thing an integration bug would break while each
# piece stays green.  Budget threshold is exact integer arithmetic
# (cum·5 ≤ total·3); the total rides out of the prefix-sum stats.
# ---------------------------------------------------------------------------
_FINAL_NUM, _FINAL_DEN = 3, 5  # greedy: enter while spent/total < 3/5

@_register(
    "corpus_final_training_set",
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
    comp AS (SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u),
    full_t AS (
        SELECT d.doc_id,
               COALESCE(c.component_id, d.doc_id) AS component_id,
               d.n_chars
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    surv AS (
        SELECT doc_id, component_id, n_chars FROM (
            SELECT *, FIRST_VALUE(doc_id) OVER (
                PARTITION BY component_id ORDER BY n_chars DESC, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
            ) AS sid FROM full_t
        ) WHERE doc_id = sid
    ),
    o AS (
        SELECT doc_id, component_id, n_chars,
               COALESCE(SUM(n_chars) OVER (
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + n_chars AS cum_chars
        FROM surv
    ),
    tot AS (SELECT SUM(n_chars) AS t FROM surv)
    SELECT doc_id, component_id, n_chars, CAST(cum_chars AS BIGINT) AS cum_chars
    FROM o, tot WHERE (cum_chars - n_chars) * {_FINAL_DEN} < t * {_FINAL_NUM}
    ORDER BY doc_id
    """,
)
def corpus_final_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.packing import (
        ordered_prefix_sum_with_total,
    )

    docs = load_table(spark, sf_dir, "documents")
    surv = (
        dedup.survivor_selection(docs, quality_col="n_chars")
        .filter(F.col("is_survivor"))
        .select("doc_id", "component_id", F.col("quality").alias("n_chars"))
    )
    ranked, total = ordered_prefix_sum_with_total(
        surv.withColumn("_negc", -F.col("n_chars")),
        ["_negc", "doc_id"],
        "n_chars",
        out_col="cum_before",
    )
    return (
        ranked.withColumn("cum_chars", F.col("cum_before") + F.col("n_chars"))
        # greedy take-while on the EXCLUSIVE prefix: a row enters while
        # the budget is not yet exhausted, so the top-ranked doc is kept
        # even if it alone exceeds the budget (the inclusive rule would
        # silently emit an EMPTY training set on skewed corpora).
        .filter(
            (F.col("cum_chars") - F.col("n_chars")) * _FINAL_DEN
            < F.lit(total) * _FINAL_NUM
        )
        .select("doc_id", "component_id", "n_chars", "cum_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DAU / WAU — daily and trailing-7-day distinct active users.  Rolling
# DISTINCT cannot ride a window frame (count distinct isn't
# decomposable), so the exact form is the standard day-grid join:
# dedup to (day, user) once [day-cardinality × users rows], join the
# tiny day grid to its trailing week, count distinct per anchor day.
# Day cardinality is bounded (~thousands forever), so the join fan-out
# is 7× the deduped daily-actives table — exact and scale-stable where
# a sketch (HLL) would be approximate.
# ---------------------------------------------------------------------------
@_register(
    "events_dau_wau",
    """
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    wau AS (
        SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
        FROM days d
        JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau
    FROM dau JOIN wau ON wau.day = dau.day
    ORDER BY dau.day
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    wau = (
        days.alias("d")
        .join(
            du.alias("u"),
            F.col("u.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    return (
        dau.join(wau, on="day")
        .select("day", "dau", "wau")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup — the temporal-warehouse join: each fact
# row (purchases) picks up the dimension version (the user's last
# non-purchase activity state) valid AT the fact's timestamp.  Runs as
# a backward as-of join (operators/joins.asof_join: union + one
# partitioned window, ONE shuffle, no inequality-join pair blowup) —
# equivalent to interval containment because SCD2 intervals are
# contiguous per key; the oracle verifies via the interval form.
# Facts before a user's first version keep null state (left join).
# ---------------------------------------------------------------------------
@_register(
    "scd2_point_in_time_join",
    """
    WITH ordered AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER w AS prev_type,
               lag(ts) OVER w AS prev_ts
        FROM events WHERE event_type <> 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    opens AS (
        SELECT user_id, event_id, ts AS valid_from, event_type
        FROM ordered
        WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type
    ),
    dim AS (
        SELECT user_id, event_type AS state_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                    ORDER BY valid_from, event_id) AS valid_to
        FROM opens
    ),
    facts AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(CAST(value AS DECIMAL(18,2)), 2) AS DOUBLE)
                   AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.user_id, f.event_id, f.ts, f.purchase_value,
           d.state_type, epoch_us(d.valid_from) AS state_since_us
    FROM facts f
    LEFT JOIN dim d ON d.user_id = f.user_id
         AND d.valid_from <= f.ts
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    ORDER BY f.user_id, f.event_id
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.joins import asof_join
    from vexere_lakehouse_pipeline_spark.operators.scd2 import scd2_from_changelog

    events = load_table(spark, sf_dir, "events")
    hist = scd2_from_changelog(
        events.filter(F.col("event_type") != "purchase"),
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_col="event_id",
        keep_tiebreak=True,
    )
    dim = hist.select(
        "user_id",
        "valid_from",
        "event_id",
        F.col("event_type").alias("state_type"),
        F.unix_micros("valid_from").alias("state_since_us"),
    )
    facts = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value").cast("decimal(18,2)"), 2)
        .cast("double")
        .alias("purchase_value"),
    )
    return asof_join(
        facts,
        dim,
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_payload=["state_type", "state_since_us"],
        tiebreak="event_id",
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# Entity resolution (record linkage) — blocking + bounded pairwise
# verify over STRUCTURED records (the customer dim), the tabular twin
# of document dedup: block on (nation, segment), verify candidate
# pairs with banded Levenshtein on the name.  Blocks above the size
# cap are hash-split into bounded sub-blocks before the self-join
# (dedup._split_hot_buckets semantics: work stays linear, candidates
# within a sub-block are still found — previously oversized blocks
# were dropped whole and recall silently collapsed; round-2 VERDICT
# defect #2).  Blocking keys must still bound block size at 100 TB —
# finer keys (phone prefixes) or er_sorted_neighborhood_matches are
# the principled fixes; the split is the unconditional guard.
# All-integer output.
# ---------------------------------------------------------------------------
_ER_MAX_DIST = 2
_ER_MAX_BLOCK = 1000

@_register(
    "er_customer_matches",
    f"""
    WITH b AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS bn
        FROM customer
    ),
    ok AS (SELECT *, {_duck_sub_split('c_custkey', 'bn', _ER_MAX_BLOCK)} AS sub
           FROM b)
    SELECT a.c_custkey AS cust_a, c.c_custkey AS cust_b,
           CAST(levenshtein(a.c_name, c.c_name) AS BIGINT) AS name_dist
    FROM ok a JOIN ok c
      ON a.c_nationkey = c.c_nationkey
     AND a.c_mktsegment = c.c_mktsegment
     AND a.sub = c.sub
     AND a.c_custkey < c.c_custkey
    WHERE levenshtein(a.c_name, c.c_name) <= {_ER_MAX_DIST}
    ORDER BY cust_a, cust_b
    """,
)
def er_customer_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # ONE split implementation for the whole engine: the shared helper
    # (census agg + broadcast assignment) rather than a re-derived
    # inline formula, so the sub-bucket semantics can't drift from the
    # dedup family — and the oversize census stays observable.
    counted = dedup._split_hot_buckets(
        cust.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        _ER_MAX_BLOCK,
        keys=("c_nationkey", "c_mktsegment"),
        id_col="c_custkey",
    )
    a = counted.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("c_name").alias("name_a"),
        "c_nationkey",
        "c_mktsegment",
        "_sub",
    )
    b = counted.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("c_name").alias("name_b"),
        "c_nationkey",
        "c_mktsegment",
        "_sub",
    )
    return (
        a.join(b, on=["c_nationkey", "c_mktsegment", "_sub"])
        .filter(F.col("cust_a") < F.col("cust_b"))
        # banded Levenshtein: O(len·threshold) per pair, -1 above the
        # band — strictly cheaper than the full DP at scale
        .withColumn(
            "name_dist",
            F.levenshtein("name_a", "name_b", _ER_MAX_DIST).cast("bigint"),
        )
        .filter((F.col("name_dist") >= 0) & (F.col("name_dist") <= _ER_MAX_DIST))
        .select("cust_a", "cust_b", "name_dist")
        .orderBy("cust_a", "cust_b")
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood entity resolution — the scale-path companion of
# er_customer_matches: instead of equality blocking (whose hot keys
# the size cap can only DROP), rank every record under a global sort
# key and compare each record with its W successors.  Candidate count
# is n·W BY CONSTRUCTION — no key choice can make it quadratic, which
# is exactly the degenerate-input gap the blocked variant's cap leaves
# (see SCALE.md note).  The global rank is the distributed two-phase
# prefix sum (operators/packing.py) — one range shuffle, no
# single-partition window; neighbors come from an equi-join on
# rank + k after a W-way explode, verify is banded Levenshtein.
# ---------------------------------------------------------------------------
_ER_SN_WINDOW = 5

@_register(
    "er_sorted_neighborhood_matches",
    f"""
    WITH r AS (SELECT c_custkey, c_name,
                      ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) - 1 AS rk
               FROM customer),
    p AS (SELECT a.c_custkey AS ca, a.c_name AS na,
                 b.c_custkey AS cb, b.c_name AS nb
          FROM r a JOIN r b ON b.rk BETWEEN a.rk + 1 AND a.rk + {_ER_SN_WINDOW})
    SELECT LEAST(ca, cb) AS cust_a, GREATEST(ca, cb) AS cust_b,
           CAST(levenshtein(na, nb) AS BIGINT) AS name_dist
    FROM p WHERE levenshtein(na, nb) <= {_ER_MAX_DIST}
    ORDER BY cust_a, cust_b
    """,
)
def er_sorted_neighborhood_matches(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators import packing

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    ranked = packing.ordered_prefix_sum(
        cust.withColumn("__one", F.lit(1)),
        ["c_name", "c_custkey"],
        "__one",
        out_col="rk",
    ).drop("__one")
    probe = (
        ranked.select(
            F.col("c_custkey").alias("ca"),
            F.col("c_name").alias("na"),
            F.col("rk").alias("ra"),
        )
        .withColumn("k", F.explode(F.expr(f"sequence(1, {_ER_SN_WINDOW})")))
        .withColumn("rb", F.col("ra") + F.col("k"))
    )
    right = ranked.select(
        F.col("c_custkey").alias("cb"),
        F.col("c_name").alias("nb"),
        F.col("rk").alias("rb"),
    )
    return (
        probe.join(right, on="rb")
        .withColumn(
            "name_dist", F.levenshtein("na", "nb", _ER_MAX_DIST).cast("bigint")
        )
        .filter((F.col("name_dist") >= 0) & (F.col("name_dist") <= _ER_MAX_DIST))
        .select(
            F.least("ca", "cb").alias("cust_a"),
            F.greatest("ca", "cb").alias("cust_b"),
            "name_dist",
        )
        .orderBy("cust_a", "cust_b")
    )


# ---------------------------------------------------------------------------
# Time-decayed user value — recency-weighted LTV: each purchase
# contributes value · 0.5^(age_weeks/4) (4-week half-life).  Neither
# engine's pow() is guaranteed correctly rounded, so the decay factors
# are precomputed ONCE in Python below and interpolated into BOTH
# engines' expressions as literal CASE arms (the repo's shared-
# fragment pattern); per-term products round to 6dp and sum as
# DECIMAL(18,6), making the aggregate order-independent and
# bit-portable.  Age anchors on the corpus max timestamp via a 1-row
# broadcast aggregate, never the driver.
# ---------------------------------------------------------------------------
_DECAY_HALF_LIFE_WEEKS = 4
_DECAY_HORIZON_WEEKS = 52

def _decay_case_sql(week_expr: str) -> str:
    """CASE over integer age-in-weeks -> literal decay factor, shared
    verbatim by Spark (F.expr) and DuckDB."""
    arms = " ".join(
        f"WHEN {w} THEN {0.5 ** (w / _DECAY_HALF_LIFE_WEEKS):.6f}"
        for w in range(_DECAY_HORIZON_WEEKS)
    )
    return f"CASE {week_expr} {arms} ELSE 0.0 END"


@_register(
    "events_decayed_user_value",
    f"""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
    p AS (
        SELECT user_id, value,
               CAST(date_diff('day', CAST(ts AS DATE), mx.max_day) // 7
                    AS INTEGER) AS age_w
        FROM events, mx WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(ROUND(value * {{decay}}, 6) AS DECIMAL(18,6)))
                AS DOUBLE) AS decayed_value
    FROM p GROUP BY user_id ORDER BY user_id
    """.replace("{decay}", _decay_case_sql("age_w")),
)
def events_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(mx))
        .withColumn(
            "age_w",
            (F.datediff(F.col("max_day"), F.to_date("ts")) / 7)
            .cast("int"),
        )
    )
    decayed = F.expr(
        f"CAST(ROUND(value * {_decay_case_sql('age_w')}, 6) AS DECIMAL(18,6))"
    )
    return (
        p.groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(decayed).cast("double").alias("decayed_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# A/B conversion z-test — two-proportion inference in one pass: users
# split into variants by the deterministic user_id parity (stand-in
# for an assignment column), conversion = reached 'purchase'.  The
# statistic is closed-form over four integer counts, so every float
# op is an exact division or a correctly-rounded sqrt — bit-identical
# across engines with NO decimal scaffolding.  Shape: one distinct
# per (user, converted) [shuffle on user], one tiny final aggregate.
# ---------------------------------------------------------------------------
@_register(
    "events_ab_conversion_ztest",
    """
    WITH per_unit AS (
        SELECT user_id, CAST(ts AS DATE) AS day, user_id % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    agg AS (
        SELECT
            CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
            CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b,
            CAST(SUM(conv) FILTER (WHERE variant = 0) AS BIGINT) AS x_a,
            CAST(SUM(conv) FILTER (WHERE variant = 1) AS BIGINT) AS x_b
        FROM per_unit
    )
    SELECT n_a, n_b, x_a, x_b,
           CAST(ROUND(CAST(x_a AS DOUBLE) / NULLIF(n_a, 0), 6) AS DOUBLE) AS p_a,
           CAST(ROUND(CAST(x_b AS DOUBLE) / NULLIF(n_b, 0), 6) AS DOUBLE) AS p_b,
           CAST(ROUND(
               (CAST(x_a AS DOUBLE) / NULLIF(n_a, 0)
                - CAST(x_b AS DOUBLE) / NULLIF(n_b, 0))
               / NULLIF(sqrt((CAST(x_a + x_b AS DOUBLE) / NULLIF(n_a + n_b, 0))
                      * (1 - CAST(x_a + x_b AS DOUBLE) / NULLIF(n_a + n_b, 0))
                      * (CAST(1 AS DOUBLE) / NULLIF(n_a, 0) + CAST(1 AS DOUBLE) / NULLIF(n_b, 0))), 0),
               6) AS DOUBLE) AS z_score
    FROM agg
    """,
)
def events_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit = active user-day (a user-day with any event); conversion =
    that unit saw a purchase.  All divisions are NULLIF-guarded so the
    degenerate pools (empty variant, p in {0, 1}) yield NULL instead of
    an ANSI divide-by-zero — the query must run under a vanilla Spark 4
    session where ANSI mode is the default."""
    events = load_table(spark, sf_dir, "events")
    per_unit = (
        events.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    agg = per_unit.agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv"))).alias("x_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv"))).alias("x_b"),
    )
    z = (
        "(CAST(x_a AS DOUBLE) / NULLIF(n_a, 0)"
        " - CAST(x_b AS DOUBLE) / NULLIF(n_b, 0))"
        " / NULLIF(sqrt((CAST(x_a + x_b AS DOUBLE) / NULLIF(n_a + n_b, 0))"
        " * (1 - CAST(x_a + x_b AS DOUBLE) / NULLIF(n_a + n_b, 0))"
        " * (CAST(1 AS DOUBLE) / NULLIF(n_a, 0) + CAST(1 AS DOUBLE) / NULLIF(n_b, 0))), 0)"
    )
    return agg.select(
        "n_a", "n_b", "x_a", "x_b",
        F.expr(
            "CAST(ROUND(CAST(x_a AS DOUBLE) / NULLIF(n_a, 0), 6) AS DOUBLE)"
        ).alias("p_a"),
        F.expr(
            "CAST(ROUND(CAST(x_b AS DOUBLE) / NULLIF(n_b, 0), 6) AS DOUBLE)"
        ).alias("p_b"),
        F.expr(f"CAST(ROUND({z}, 6) AS DOUBLE)").alias("z_score"),
    )


# ---------------------------------------------------------------------------
# CDC APPLY CHANGES (operators/incremental.py:apply_cdc_changes) — fold
# a keyed change stream into a base snapshot: last change per key by
# sequence wins, deletes remove, untouched base rows pass through.
# The change stream is the events table (event_type='error' plays the
# delete op); the base is the even-thirds of the user space plus a
# shifted synthetic block that no change ever touches, so all three
# code paths (upsert / delete / pass-through) are exercised and the
# oracle pins each.
# ---------------------------------------------------------------------------

@_register(
    "cdc_apply_user_state",
    """
    WITH base AS (
        SELECT DISTINCT user_id, CAST(0.0 AS DOUBLE) AS balance,
               CAST(-1 AS BIGINT) AS seq
        FROM events WHERE user_id % 3 = 0
        UNION ALL
        SELECT DISTINCT user_id + 1000000, CAST(0.0 AS DOUBLE),
               CAST(-1 AS BIGINT)
        FROM events WHERE user_id % 5 = 0
    ),
    ch AS (
        SELECT user_id, ROUND(value, 2) AS balance, event_id AS seq,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM events
    ),
    last AS (
        SELECT user_id, balance, seq, op FROM (
            SELECT ch.*, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY seq DESC) AS rn
            FROM ch
        ) WHERE rn = 1
    ),
    surv AS (SELECT user_id, balance, seq FROM last WHERE op <> 'D'),
    unt AS (
        SELECT b.user_id, b.balance, b.seq FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.user_id = b.user_id)
    )
    SELECT user_id, balance, seq FROM unt
    UNION ALL SELECT user_id, balance, seq FROM surv
    ORDER BY user_id
    """,
)
def cdc_apply_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        apply_cdc_changes,
    )

    events = load_table(spark, sf_dir, "events")
    base = (
        events.filter(F.col("user_id") % 3 == 0)
        .select("user_id").distinct()
        .select(
            "user_id",
            F.lit(0.0).alias("balance"),
            F.lit(-1).cast("long").alias("seq"),
        )
        .unionByName(
            events.filter(F.col("user_id") % 5 == 0)
            .select((F.col("user_id") + 1000000).alias("user_id")).distinct()
            .select(
                "user_id",
                F.lit(0.0).alias("balance"),
                F.lit(-1).cast("long").alias("seq"),
            )
        )
    )
    changes = events.select(
        "user_id",
        F.round("value", 2).alias("balance"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    return apply_cdc_changes(
        base, changes, keys=["user_id"], seq_col="seq"
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Hard-negative mining (operators/similarity.py:hard_negative_candidates)
# — top-k most-similar CROSS-label neighbors per vector, the
# contrastive-training counterpart of sim_knn_graph.  Exact on the
# gate corpus (ceiling enforced); blocked per LSH bucket/cluster at
# scale.
# ---------------------------------------------------------------------------

@_register(
    "sim_hard_negatives",
    f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS neg,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.label <> b.label
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, neg) AS rnk
        FROM scored
    )
    SELECT src, neg, cos_sim, rnk FROM ranked WHERE rnk <= 2
    ORDER BY src, rnk
    """,
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hard_negative_candidates(emb, k=2).orderBy("src", "rnk")


# ---------------------------------------------------------------------------
# Label-noise detection via k-NN disagreement — for every vector,
# count how many of its k=10 nearest cosine neighbors carry a
# DIFFERENT label; a majority of disagreeing neighbors flags the row
# as likely mislabeled (the Confident-Learning / Deep-kNN screen every
# labeled training set runs before fine-tuning).  Exact graph on the
# gate corpus (same O(N^2)-with-ceiling contract as sim_knn_graph);
# at 100 TB the edge generator swaps to knn_graph(strategy='lsh'),
# which is recall-gated by sim_recall_knn_lsh_vs_exact.  The score is
# integer permille and the flag an exact integer compare, so the row
# is bit-portable cross-engine.
# ---------------------------------------------------------------------------
_NOISE_K = 10

@_register(
    "quality_label_noise",
    f"""
    WITH e AS ({_DUCK_EMB}),
    scored AS (
        SELECT a.vec_id AS src, a.label AS src_label,
               b.vec_id AS dst, b.label AS dst_label,
               {_DUCK_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rnk
        FROM scored WHERE cos_sim IS NOT NULL
    )
    SELECT src AS vec_id, src_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(SUM(CASE WHEN dst_label <> src_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_diff,
           CAST(FLOOR(1000.0
                * SUM(CASE WHEN dst_label <> src_label THEN 1 ELSE 0 END)
                / COUNT(*)) AS BIGINT) AS noise_permille,
           (2 * SUM(CASE WHEN dst_label <> src_label THEN 1 ELSE 0 END)
            > COUNT(*)) AS is_suspect
    FROM ranked WHERE rnk <= {_NOISE_K}
    GROUP BY src, src_label ORDER BY vec_id
    """,
)
def quality_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=_NOISE_K, strategy="exact")
    lab = emb.select("vec_id", "label")
    joined = (
        edges.join(
            F.broadcast(lab.select(F.col("vec_id").alias("src"),
                                   F.col("label").alias("src_label"))),
            on="src",
        )
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("dst"),
                                   F.col("label").alias("dst_label"))),
            on="dst",
        )
    )
    diff = F.sum(
        (F.col("dst_label") != F.col("src_label")).cast("long")
    )
    return (
        joined.groupBy(
            F.col("src").alias("vec_id"),
            F.col("src_label").alias("label"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            diff.alias("n_diff"),
        )
        .select(
            "vec_id",
            "label",
            "n_neighbors",
            "n_diff",
            F.floor(
                F.lit(1000.0) * F.col("n_diff")
                / F.col("n_neighbors").cast("double")
            ).cast("long").alias("noise_permille"),
            (F.lit(2) * F.col("n_diff") > F.col("n_neighbors"))
            .alias("is_suspect"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Leakage-free train/val/test assignment — split by DUPLICATE CLUSTER,
# not by document: every doc inherits its connected component's
# deterministic hash bucket, so near-duplicates can never straddle
# splits (the contamination mode corpus_split_leakage DETECTS, this
# op PREVENTS).  Clusters come from the LSH->CC pipeline
# (dedup.duplicate_clusters); the bucket is the portable md5 hash of
# the component id (sampling.hash_bucket % 10: 0-7 train, 8 val,
# 9 test), so the assignment is retry-stable and identical on any
# cluster layout.  At 100 TB this is one map-side hash after the CC
# join — no extra shuffle beyond the dedup pipeline itself.
# ---------------------------------------------------------------------------
@_register(
    "corpus_group_split_assign",
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
    comp AS (SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u),
    assigned AS (
        SELECT d.doc_id,
               COALESCE(c.component_id, d.doc_id) AS component_id
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    bucketed AS (
        SELECT doc_id, component_id,
               {sampling.hash_bucket_sql("component_id", "split")} % 10
                   AS bucket
        FROM assigned
    )
    SELECT doc_id, component_id, bucket,
           CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed ORDER BY doc_id
    """,
)
def corpus_group_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clusters = dedup.duplicate_clusters(docs).select(
        "doc_id", "component_id"
    )
    bucket = F.pmod(
        sampling.hash_bucket("component_id", salt="split"), F.lit(10)
    )
    return clusters.select(
        "doc_id",
        "component_id",
        bucket.alias("bucket"),
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift test — the nonparametric
# complement to quality_drift_psi: PSI needs a bucketing choice, KS
# compares the full empirical CDFs of doc length between two sources
# and reports the max gap.  Everything is EXACT integers: the CDF gap
# at value v is |ca·t_b − cb·t_a| (cross-multiplied — never a float
# division), so the statistic is bit-portable; only the 5% critical
# value touches a double (one sqrt + one round, computed inside the
# engines with identical expressions).  The CDFs come from the
# distributed prefix-sum operator over the per-value counts table
# (bounded by DISTINCT lengths, tiny forever after the first groupBy),
# so no single-partition window touches data-scale rows.
# ---------------------------------------------------------------------------
@_register(
    "quality_drift_ks",
    f"""
    WITH lens AS (
        SELECT source, length(text) AS v FROM documents
        WHERE source IN ('{_DRIFT_A}', '{_DRIFT_B}') AND text IS NOT NULL
    ),
    counts AS (
        SELECT v,
               CAST(SUM(CASE WHEN source = '{_DRIFT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN source = '{_DRIFT_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM lens GROUP BY v
    ),
    cum AS (
        SELECT v,
               CAST(SUM(n_a) OVER (ORDER BY v) AS BIGINT) AS ca,
               CAST(SUM(n_b) OVER (ORDER BY v) AS BIGINT) AS cb
        FROM counts
    ),
    tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
                   CAST(SUM(n_b) AS BIGINT) AS t_b FROM counts)
    SELECT t_a, t_b,
           CAST(MAX(ABS(ca * t_b - cb * t_a)) AS BIGINT) AS d_num,
           CAST((1000 * MAX(ABS(ca * t_b - cb * t_a))) // (t_a * t_b) AS BIGINT)
               AS ks_permille,
           CAST(ROUND(1358 * sqrt(CAST(t_a + t_b AS DOUBLE)
                                  / CAST(t_a * t_b AS DOUBLE)), 0) AS BIGINT)
               AS crit_permille_05,
           CAST(CASE WHEN (1000 * MAX(ABS(ca * t_b - cb * t_a))) // (t_a * t_b)
                       > ROUND(1358 * sqrt(CAST(t_a + t_b AS DOUBLE)
                                           / CAST(t_a * t_b AS DOUBLE)), 0)
                     THEN 1 ELSE 0 END AS INTEGER) AS drift_flag
    FROM cum CROSS JOIN tot
    GROUP BY t_a, t_b
    """,
)
def quality_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vexere_lakehouse_pipeline_spark.operators.packing import (
        ordered_prefix_sum_with_total,
    )

    docs = load_table(spark, sf_dir, "documents")
    lens = docs.filter(
        F.col("source").isin(_DRIFT_A, _DRIFT_B) & F.col("text").isNotNull()
    ).select("source", F.length("text").alias("v"))
    counts = lens.groupBy("v").agg(
        F.sum(F.when(F.col("source") == _DRIFT_A, 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("source") == _DRIFT_B, 1).otherwise(0))
        .cast("long").alias("n_b"),
    )
    # inclusive CDF counts = exclusive prefix + own count; totals come
    # back as driver ints for free (metadata scale, like packing)
    with_a, t_a = ordered_prefix_sum_with_total(counts, "v", "n_a", "_pa")
    with_b, t_b = ordered_prefix_sum_with_total(with_a, "v", "n_b", "_pb")
    diff = F.abs(
        (F.col("_pa") + F.col("n_a")) * F.lit(t_b)
        - (F.col("_pb") + F.col("n_b")) * F.lit(t_a)
    )
    crit = (
        f"CAST(ROUND(1358 * sqrt(CAST({t_a} + {t_b} AS DOUBLE)"
        f" / CAST({t_a} * {t_b} AS DOUBLE)), 0) AS BIGINT)"
    )
    return with_b.agg(
        F.lit(t_a).cast("long").alias("t_a"),
        F.lit(t_b).cast("long").alias("t_b"),
        F.max(diff).cast("long").alias("d_num"),
        F.expr(f"CAST((1000 * {{d}}) DIV ({t_a} * {t_b}) AS BIGINT)".format(
            d="max(abs((_pa + n_a) * " + str(t_b)
              + " - (_pb + n_b) * " + str(t_a) + "))"
        )).alias("ks_permille"),
        F.expr(crit).alias("crit_permille_05"),
        F.expr(
            f"CAST(CASE WHEN (1000 * max(abs((_pa + n_a) * {t_b}"
            f" - (_pb + n_b) * {t_a}))) DIV ({t_a} * {t_b})"
            f" > ROUND(1358 * sqrt(CAST({t_a} + {t_b} AS DOUBLE)"
            f" / CAST({t_a} * {t_b} AS DOUBLE)), 0)"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("drift_flag"),
    )


# ---------------------------------------------------------------------------
# Quality-classifier calibration report — the governance gate every
# model-scored corpus filter needs before its threshold is trusted:
# bucket the classifier score into deciles and compare each bucket's
# predicted confidence (bin midpoint) against its observed positive
# rate; the per-bin |gap| column is the ECE integrand.  The "model
# score" here is a deterministic length-logistic surrogate
# (1000·n/(n+400), integer division — the shape a fastText quality
# scorer produces; a real model drops into the same column), the label
# is an independent text property, and every number is exact integer
# permille — bit-portable, like quality_drift_ks.  One narrow groupBy
# over 10 keys: map-side partial, scan-bound at any corpus size.
# ---------------------------------------------------------------------------
@_register(
    "quality_score_calibration",
    """
    WITH scored AS (
        SELECT doc_id,
               (n_chars * 1000) // (n_chars + 400) AS score_permille,
               CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END
                   AS is_pos
        FROM documents
    ),
    binned AS (
        SELECT LEAST(9, score_permille // 100) AS bin, score_permille,
               is_pos
        FROM scored
    )
    SELECT CAST(bin AS INTEGER) AS bin,
           CAST(bin * 100 + 50 AS BIGINT) AS mid_permille,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_pos) AS BIGINT) AS n_pos,
           CAST((1000 * SUM(is_pos)) // COUNT(*) AS BIGINT)
               AS pos_rate_permille,
           CAST(ABS(bin * 100 + 50 - (1000 * SUM(is_pos)) // COUNT(*))
               AS BIGINT) AS gap_permille
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.expr("(n_chars * 1000) DIV (n_chars + 400)").alias("score_permille"),
        F.when(F.lower(F.col("text")).like("% the %"), 1)
        .otherwise(0).alias("is_pos"),
    )
    binned = scored.withColumn(
        "bin", F.least(F.lit(9), F.expr("score_permille DIV 100"))
    )
    return (
        binned.groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count("*").alias("_n"),
            F.sum("is_pos").alias("_np"),
        )
        .select(
            "bin",
            (F.col("bin") * 100 + 50).cast("long").alias("mid_permille"),
            F.col("_n").cast("long").alias("n_docs"),
            F.col("_np").cast("long").alias("n_pos"),
            F.expr("(1000 * _np) DIV _n").cast("long")
            .alias("pos_rate_permille"),
            F.abs(
                F.col("bin") * 100 + 50 - F.expr("(1000 * _np) DIV _n")
            ).cast("long").alias("gap_permille"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Inter-annotator agreement (Cohen's kappa) — the label-quality gate
# for any corpus with redundant annotations: chance-corrected
# agreement between two labelers from the 2x2 contingency table,
# kappa = (p_o − p_e)/(1 − p_e), computed entirely in exact int64:
# marginals quantized to micro-units (1e6·r DIV n), p_e in pico-units,
# final permille division — every intermediate ≤ ~1e15, so no int64
# overflow up to n ≈ 9.2e12 rows (the naive n²-scaled rational wraps
# at n ≈ 9.6e7), and the ±1e-6 quantization is invisible at permille
# resolution.  Bit-portable: both engines run the identical tree.  The two "annotators"
# here are deterministic heuristics (length >= 300; contains ' the ');
# real annotation columns drop into the same contract.  One count-only
# aggregate: scan-bound.
# ---------------------------------------------------------------------------
@_register(
    "quality_cohens_kappa",
    """
    WITH lab AS (
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
               CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
               CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
        FROM lab
    )
    SELECT n, n00, n01, n10, n11,
           CAST((1000 * ((1000000 * (n00 + n11)) // n * 1000000
                         - (((1000000 * (n00 + n01)) // n)
                            * ((1000000 * (n00 + n10)) // n)
                            + ((1000000 * (n10 + n11)) // n)
                              * ((1000000 * (n01 + n11)) // n))))
                // NULLIF(1000000000000
                    - (((1000000 * (n00 + n01)) // n)
                       * ((1000000 * (n00 + n10)) // n)
                       + ((1000000 * (n10 + n11)) // n)
                         * ((1000000 * (n01 + n11)) // n)), 0)
               AS BIGINT) AS kappa_permille
    FROM c
    """,
)
def quality_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("a"),
        F.when(F.lower(F.col("text")).like("% the %"), 1)
        .otherwise(0).alias("b"),
    )
    c = lab.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END"))
        .cast("long").alias("n00"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END"))
        .cast("long").alias("n01"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END"))
        .cast("long").alias("n10"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END"))
        .cast("long").alias("n11"),
    )
    # Overflow-safe exact-INTEGER evaluation (round-5 review finding:
    # the naive 1000·(n·agree − Σ r·c) numerator exceeds int64 at
    # n ≈ 9.6e7 rows — Spark would wrap silently, DuckDB would raise).
    # Marginals and p_o are first quantized to MICRO-units (1e6·x DIV n
    # — exact, fits int64 for n ≤ 9.2e12), p_e then lives in pico-units
    # (≤ 1e12), and the final permille division peaks at 1e15.  The
    # ±1e-6 marginal quantization moves kappa by ≤ ~2e-6 — invisible at
    # permille resolution — and both engines compute the IDENTICAL
    # integer tree, so the row stays bit-portable at any corpus size.
    return c.select(
        "n", "n00", "n01", "n10", "n11",
        F.expr(
            "CAST((1000 * ((1000000 * (n00 + n11)) DIV n * 1000000"
            " - (((1000000 * (n00 + n01)) DIV n)"
            " * ((1000000 * (n00 + n10)) DIV n)"
            " + ((1000000 * (n10 + n11)) DIV n)"
            " * ((1000000 * (n01 + n11)) DIV n))))"
            " DIV NULLIF(1000000000000"
            " - (((1000000 * (n00 + n01)) DIV n)"
            " * ((1000000 * (n00 + n10)) DIV n)"
            " + ((1000000 * (n10 + n11)) DIV n)"
            " * ((1000000 * (n01 + n11)) DIV n)), 0) AS BIGINT)"
        ).alias("kappa_permille"),
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering — the fasttext-style linear-classifier
# gate (CCNet / LLaMA-recipe "quality classifier" stage) as one scan:
# tokens → hashed md5 feature buckets → broadcast join against the
# K-row weight table → per-doc exact int64 milli-unit sum; the gate
# bit is score >= 0.  The weight table is the pluggable model
# (operators/quality.hashed_stub_weights is the deterministic stand-in
# — same discipline as sampled PQ codebooks — so the WHOLE inference
# path is oracle-reproduced; production swaps in trained weights with
# the identical (bucket, w_milli) contract).  Scale: explode is
# token-linear, weights are model-state scale (always broadcast), one
# doc_id rollup; nothing wider than (doc_id, bucket) shuffles.
# ---------------------------------------------------------------------------
_QCLF_K = 1024

from vexere_lakehouse_pipeline_spark.operators.sampling import hash_bucket_sql  # noqa: E402


@_register(
    "quality_classifier_scores",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
    w AS (SELECT CAST(r.b AS INTEGER) AS bucket,
                 CAST({hash_bucket_sql('r.b', 'qclfw')} % 2001 - 1000
                      AS BIGINT) AS w_milli
          FROM range(0, {_QCLF_K}) AS r(b)),
    feat AS (SELECT doc_id,
                    {hash_bucket_sql('token', 'qclf')} % {_QCLF_K} AS bucket
             FROM tok),
    scored AS (SELECT feat.doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_tokens,
                      CAST(SUM(COALESCE(w.w_milli, 0)) AS BIGINT) AS score_milli
               FROM feat LEFT JOIN w USING (bucket)
               GROUP BY feat.doc_id)
    SELECT d.doc_id,
           COALESCE(s.n_tokens, 0) AS n_tokens,
           COALESCE(s.score_milli, 0) AS score_milli,
           CAST(s.score_milli // NULLIF(s.n_tokens, 0) AS BIGINT)
               AS mean_w_milli,
           COALESCE(s.score_milli, 0) >= 0 AS is_high_quality
    FROM documents d LEFT JOIN scored s USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weights = quality.hashed_stub_weights(spark, n_buckets=_QCLF_K)
    return quality.linear_text_classifier(
        docs, weights, n_buckets=_QCLF_K
    ).orderBy("doc_id")
