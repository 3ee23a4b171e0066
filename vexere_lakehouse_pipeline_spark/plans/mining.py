"""Sketch rollups, importance weighting, and tokenizer statistics.

North-star surface (no reference analog — SURVEY.md §2 ends at exact
aggregation): the approximate/sketch layer a 100 TB deployment runs
INSTEAD of exact distincts, verified here AGAINST the exact answers,
plus two training-data primitives (DSIR-style importance weights, the
first BPE merge iteration) and the distributed twin of the global
ranking window.

Sketch-gate pattern (``*_gate`` queries): the scalable estimator runs
on Spark next to the exact computation, and the RESULT COLUMN is the
exact value plus a boolean asserting the estimate landed inside its
documented error envelope.  The DuckDB oracle recomputes the exact
value independently and pins the boolean TRUE — so the gate fails
loudly if either the exact engines diverge OR the sketch ever leaves
its envelope.  Estimates themselves are engine-specific (DataSketches
HLL vs DuckDB's) and deliberately never compared across engines.

Portability rules follow plans/corpus.py: one ROUND(...,6) per log10,
decimal sums, exact int64 micro-unit means ((2a+n) div 2n), doubles
divided in textually identical expression shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.functions.text import tokenize
from vexere_lakehouse_pipeline_spark.operators import packing
from vexere_lakehouse_pipeline_spark.plans.corpus import (
    _DUCK_UNIGRAM_CTES,
    _MEAN_MICRO,
    _MEAN_MICRO_INT,
    doc_token_table,
    unigram_logprob_agg,
)
from vexere_lakehouse_pipeline_spark.plans.star import QueryFn
from vexere_lakehouse_pipeline_spark.plans.star_ml import _DUCK_TOKENS
from vexere_lakehouse_pipeline_spark.plans import star_tpch2

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
# HLL distinct-count gate — approx_count_distinct (DataSketches-backed
# HLL++, rsd 2%) next to the exact COUNT(DISTINCT), gated at 10%
# (5 sigma of the configured rsd).  At 100 TB the approx IS the
# production path: one map-side-combinable aggregate, no distinct
# shuffle of user ids — the exact twin here is the verification.
# ---------------------------------------------------------------------------
@_register(
    "agg_hll_distinct_gate",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS hll_within_10pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_hll_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", 0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_approx") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(0.1)
            ).alias("hll_within_10pct"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketch ROLLUP — the real 100 TB distinct-count
# architecture: ONE pass builds a tiny per-day sketch (hll_sketch_agg,
# map-side combinable), then ANY trailing window is answered by merging
# 7 kilobyte-sized sketches (hll_union_agg over a broadcast day grid) —
# no re-scan, no user-id shuffle per window.  Verified against the
# exact trailing-7-day distinct (events_dau_wau semantics) at 5%
# (lgConfigK=14 -> rsd ~0.8%).
# ---------------------------------------------------------------------------
@_register(
    "events_wau_hll_gate",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           COUNT(DISTINCT u.user_id) AS wau_exact,
           TRUE AS hll_within_5pct
    FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
)
def events_wau_hll_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    in_window = (F.col("u.day") >= F.date_sub(F.col("d.day"), 6)) & (
        F.col("u.day") <= F.col("d.day")
    )
    exact = (
        F.broadcast(days).alias("d")
        .join(du.alias("u"), in_window)
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau_exact"))
    )
    daily_sk = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    sk_window = (F.col("s.day") >= F.date_sub(F.col("d.day"), 6)) & (
        F.col("s.day") <= F.col("d.day")
    )
    est = (
        F.broadcast(days).alias("d")
        .join(daily_sk.alias("s"), sk_window)
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"))
    )
    return (
        exact.join(est, on="day")
        .select(
            "day",
            "wau_exact",
            (
                F.abs(F.col("_est") - F.col("wau_exact"))
                <= F.col("wau_exact") * F.lit(0.05)
            ).alias("hll_within_5pct"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Approximate-quantile gate — percentile_approx (GK sketch, rank error
# n/2000) must land inside the exact [p45, p55] value band.  Exact
# median rides along as the portable result column (same
# percentile/quantile_cont interpolation as agg_median_order_value).
# ---------------------------------------------------------------------------
@_register(
    "agg_approx_quantile_gate",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(quantile_cont(value, 0.5), 2) AS median_value,
           TRUE AS approx_in_decile
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.expr("percentile(value, 0.5D)"), 2).alias(
                "median_value"
            ),
            F.expr("percentile_approx(value, 0.5D, 2000)").alias("_pa"),
            F.expr("percentile(value, 0.45D)").alias("_lo"),
            F.expr("percentile(value, 0.55D)").alias("_hi"),
        )
        .select(
            "event_type",
            "n_events",
            "median_value",
            (
                (F.col("_pa") >= F.col("_lo")) & (F.col("_pa") <= F.col("_hi"))
            ).alias("approx_in_decile"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Statistical aggregate family — stddev/variance, skewness/kurtosis,
# correlation/covariance, and the regr_* linear-regression aggregates,
# all streaming one-pass co-moment implementations JVM-side (no second
# scan, map-side partial merge).  Definition parity: Spark's
# skewness/kurtosis are POPULATION g1/g2 while DuckDB's are
# sample-corrected G1/G2 — the oracle converts with the exact bias
# factors (verified to 1e-15 on testdata); everything else matches to
# ~1e-13 and is pinned at the per-column rounding below.
# ---------------------------------------------------------------------------
@_register(
    "stats_function_showcase",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
           ROUND(var_samp(l_quantity), 6) AS qty_var,
           ROUND(skewness(l_quantity) * (COUNT(*) - 2)
                 / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 6) AS qty_skew_pop,
           ROUND((kurtosis(l_quantity) * (COUNT(*) - 2.0) * (COUNT(*) - 3.0)
                  / (COUNT(*) - 1.0) - 6.0) / (COUNT(*) + 1.0), 6)
             AS qty_kurt_pop,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2)
             AS price_qty_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS reg_slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2)
             AS reg_intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS reg_r2
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stats_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
            F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
            F.round(F.skewness("l_quantity"), 6).alias("qty_skew_pop"),
            F.round(F.kurtosis("l_quantity"), 6).alias("qty_kurt_pop"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias(
                "price_qty_corr"
            ),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
                "price_qty_covar"
            ),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "reg_slope"
            ),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 2
            ).alias("reg_intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias(
                "reg_r2"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights — score every document by how much its
# unigram distribution looks like a TARGET domain (source='src0')
# versus the background corpus: mean over tokens of
# log10( P_target(tok) / P_background(tok) ), add-one smoothed.
# The data-selection primitive behind importance resampling: rank the
# raw corpus by importance, keep the top slice.
# Scale: two vocab-sized aggregates + one token-key join (same shape as
# text_unigram_logprob_scores); totals are a 1-row broadcast.
# ---------------------------------------------------------------------------
# CAST(1 AS DOUBLE), not the literal 1.0: Spark parses 1.0 as
# DECIMAL(2,1), which drags the whole quotient through decimal
# division (precision-truncated at scale 38) before LOG10 ever sees a
# double — observed as 2e-7 drift vs DuckDB, whose 1.0 is a double.
_LR_EXPR = (
    "CAST(ROUND(LOG10(((COALESCE(ft, 0) + CAST(1 AS DOUBLE)) / (T + V))"
    " / ((fb + CAST(1 AS DOUBLE)) / (B + V))), 6) AS DECIMAL(18,6))"
)

@_register(
    "corpus_importance_weights",
    f"""
    WITH tok AS (SELECT doc_id, source, unnest({_DUCK_TOKENS}) AS token
                 FROM documents),
    bg AS (SELECT token, COUNT(*) AS fb FROM tok GROUP BY token),
    tg AS (SELECT token, COUNT(*) AS ft FROM tok WHERE source = 'src0'
           GROUP BY token),
    tot AS (SELECT (SELECT SUM(fb) FROM bg) AS B,
                   (SELECT COUNT(*) FROM bg) AS V,
                   (SELECT COALESCE(SUM(ft), 0) FROM tg) AS T),
    lr AS (SELECT bg.token, {_LR_EXPR} AS lr
           FROM bg LEFT JOIN tg USING (token) CROSS JOIN tot),
    agg AS (SELECT t.doc_id,
                   CAST(SUM(lr.lr) * 1000000 AS BIGINT) AS s_micro,
                   COUNT(*) AS n_tokens
            FROM tok t JOIN lr ON lr.token = t.token GROUP BY t.doc_id)
    SELECT doc_id,
           {_MEAN_MICRO.format(s="s_micro", n="n_tokens", div="//")}
             AS importance,
           n_tokens
    FROM agg ORDER BY doc_id
    """,
)
def corpus_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # materialized once — feeds bg, tg AND the per-doc scoring join
    tok = doc_token_table(docs, ("source",))
    bg = tok.groupBy("token").agg(F.count("*").alias("fb"))
    tg = (
        tok.filter(F.col("source") == "src0")
        .groupBy("token")
        .agg(F.count("*").alias("ft"))
    )
    totals = bg.agg(
        F.sum("fb").alias("B"), F.count("*").alias("V")
    ).crossJoin(tg.agg(F.coalesce(F.sum("ft"), F.lit(0)).alias("T")))
    lr = (
        bg.join(tg, on="token", how="left")
        .crossJoin(F.broadcast(totals))
        .select("token", F.expr(_LR_EXPR).alias("lr"))
    )
    agg = (
        tok.join(lr, on="token")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(SUM(lr) * 1000000 AS BIGINT)").alias("s_micro"),
            F.count("*").alias("n_tokens"),
        )
    )
    return agg.select(
        "doc_id",
        F.expr(_MEAN_MICRO.format(s="s_micro", n="n_tokens", div="DIV")).alias(
            "importance"
        ),
        "n_tokens",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Hopping (sliding) event-time windows — F.window with a slide: every
# event lands in window_len/slide = 4 overlapping windows, the shape
# behind "last hour, refreshed every 15 minutes" dashboards and the
# batch twin of the slide-windowed stream.  Spark expands the hop
# JVM-side (one explode-like projection, then a plain hash aggregate);
# the oracle reproduces the epoch-aligned starts with integer
# arithmetic over unnest([0..3]).
# ---------------------------------------------------------------------------
@_register(
    "events_sliding_windows",
    """
    SELECT make_timestamp(CAST(((FLOOR(epoch(ts) / 900) - k) * 900)
                               * 1000000 AS BIGINT)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM events, unnest([0, 1, 2, 3]) AS t(k)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# First BPE merge iteration — adjacent character-pair frequencies
# within tokens, the inner statistic a byte-pair-encoding tokenizer
# trainer recomputes every merge.  Explode is O(total chars); one
# shuffle on the pair key with map-side partial counts; deterministic
# top-30 (count desc, pair asc).
# ---------------------------------------------------------------------------
@_register(
    "corpus_bpe_pair_counts",
    f"""
    WITH tok AS (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents),
    pairs AS (SELECT unnest(list_transform(range(1, length(token)),
                            i -> substr(token, CAST(i AS INTEGER), 2))) AS pair
              FROM tok WHERE length(token) >= 2)
    SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 30
    """,
)
def corpus_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokenize("text")).alias("token")).filter(
        F.length("token") >= 2
    )
    pairs = tok.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(token) - 1),"
                " i -> substring(token, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# CCNet-style LM-score tertiles — the canonical "head / middle / tail"
# corpus partition: score every document with the unigram LM (exact
# micro-int mean, same machinery as text_unigram_logprob_scores), rank
# within language, cut into integer-arithmetic tertiles.  Downstream
# pipelines keep head+middle and drop (or tag) the tail.
# Scale: the scoring pass is the proven token-join shape; the tertile
# rank is a per-language window (strata are few and large — for
# millions of strata swap in the distributed prefix-sum rank).
# ---------------------------------------------------------------------------
@_register(
    "corpus_ppl_buckets",
    f"""
    WITH {_DUCK_UNIGRAM_CTES},
    scored AS (SELECT d.doc_id, d.lang,
                      {_MEAN_MICRO_INT.format(s="a.s_micro", n="a.n_tokens", div="//")}
                        AS score_micro
               FROM documents d JOIN agg a ON a.doc_id = d.doc_id),
    ranked AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY score_micro DESC, doc_id)
                        AS rnk,
                      COUNT(*) OVER (PARTITION BY lang) AS n
               FROM scored)
    SELECT doc_id, lang, CAST(score_micro AS BIGINT) AS score_micro,
           CASE WHEN rnk * 3 <= n THEN 'head'
                WHEN rnk * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ranked ORDER BY doc_id
    """,
)
def corpus_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    agg = unigram_logprob_agg(doc_token_table(docs))
    scored = docs.select("doc_id", "lang").join(agg, on="doc_id").select(
        "doc_id",
        "lang",
        F.expr(
            _MEAN_MICRO_INT.format(s="s_micro", n="n_tokens", div="DIV")
        ).alias("score_micro"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("score_micro"), "doc_id"
    )
    ranked = scored.select(
        "*",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        F.col("score_micro").cast("bigint").alias("score_micro"),
        # rnk is int32 from row_number: go through long BEFORE *3 so the
        # tertile arithmetic can't overflow (ANSI error) at billions of
        # rows per stratum
        F.when(F.col("rnk").cast("long") * 3 <= F.col("n"), "head")
        .when(F.col("rnk").cast("long") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MAD-based robust outliers — median absolute deviation per language
# over document length: med = nearest-rank median(n_chars), MAD =
# nearest-rank median(|n_chars - med|), outlier iff |x - med| > 3·MAD.
# Everything is integer arithmetic (lengths, absolute deviations,
# nearest-rank picks), so the flag is bit-portable with no rounding
# contract at all — the robust alternative to the z-score gate
# (anomaly_daily_revenue) for heavy-tailed length distributions.
# Scale: two per-language window passes; same stratum-window shape as
# corpus_above_median_quality.
# ---------------------------------------------------------------------------
@_register(
    "corpus_mad_outliers",
    """
    WITH ranked AS (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    ),
    med AS (SELECT lang, n_chars AS lang_median FROM ranked
            WHERE rnk = (50 * n + 99) // 100),
    dev AS (
        SELECT d.doc_id, d.lang, d.n_chars, m.lang_median,
               ABS(d.n_chars - m.lang_median) AS adev
        FROM documents d JOIN med m ON m.lang = d.lang
    ),
    dranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY adev, doc_id) AS rnk,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM dev
    ),
    mad AS (SELECT lang, adev AS lang_mad FROM dranked
            WHERE rnk = (50 * n + 99) // 100)
    SELECT d.doc_id, d.lang, d.n_chars, d.lang_median,
           CAST(mad.lang_mad AS BIGINT) AS lang_mad,
           d.adev > 3 * mad.lang_mad AS is_outlier
    FROM dev d JOIN mad ON mad.lang = d.lang
    ORDER BY d.doc_id
    """,
)
def corpus_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    def nearest_rank_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("lang").orderBy(val, "doc_id")
        return (
            df.select(
                "lang",
                val,
                F.row_number().over(w).alias("rnk"),
                F.count("*").over(Window.partitionBy("lang")).alias("n"),
            )
            .filter(F.col("rnk") == F.expr("(50 * n + 99) DIV 100"))
            .select("lang", F.col(val).alias(out))
        )

    med = nearest_rank_median(docs, "n_chars", "lang_median")
    dev = docs.join(F.broadcast(med), on="lang").select(
        "doc_id",
        "lang",
        "n_chars",
        "lang_median",
        F.abs(F.col("n_chars") - F.col("lang_median")).alias("adev"),
    )
    mad = nearest_rank_median(dev, "adev", "lang_mad")
    return (
        dev.join(F.broadcast(mad), on="lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "lang_median",
            F.col("lang_mad").cast("bigint").alias("lang_mad"),
            (F.col("adev") > 3 * F.col("lang_mad")).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Distributed twin of window_spend_quartiles — IDENTICAL output (same
# oracle SQL), zero single-partition window: the global rank comes from
# the two-phase prefix sum (operators/packing.py), ntile from the
# SQL-standard bucket arithmetic, percent_rank from rank and the driver
# row count.  Under the unique order (total_spend DESC, o_custkey),
# dense_rank == rank == row_number, so all three window outputs derive
# from one range shuffle — this is the plan the showcase query should
# run at 100 TB.
# ---------------------------------------------------------------------------
@_register(
    "window_spend_quartiles_distributed",
    star_tpch2.ORACLE_SQL["window_spend_quartiles"],
)
def window_spend_quartiles_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
        )
        .cast("double")
        .alias("total_spend")
    )
    ranked, n = packing.distributed_rank_ntile(
        spend.withColumn("_neg", -F.col("total_spend")),
        ["_neg", "o_custkey"],
        4,
        out_col="quartile",
        rank_col="_rk",
    )
    if n <= 1:
        prank = F.lit(0.0)
    else:
        prank = F.round(
            (F.col("_rk") - F.lit(1)).cast("double") / F.lit(float(n - 1)), 6
        )
    return (
        ranked.select(
            "o_custkey",
            "total_spend",
            "quartile",
            F.col("_rk").cast("int").alias("drank"),
            prank.alias("prank"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# BPE merge STEP — the full train-loop body, not just the statistics:
# build the distinct-word frequency table (the trainer's working set —
# all later work is weighted by word count, never per-occurrence),
# count weighted adjacent char pairs, pick the top merge (count desc,
# pair asc — deterministic), APPLY it to every word's spaced symbol
# string, and recount the post-merge pair table.  Composing this step
# k times is exactly BPE training (see corpus_bpe_train_k); one step
# through the oracle gate pins the whole loop body.
#
# Merge application = ONE leftmost non-overlapping replace over
# DOUBLE-space-separated symbols: pattern ' p1  p2 ' -> ' p1p2 '.
# Each boundary carries two spaces; a match consumes one space from
# each flanking boundary and the replacement restores one, so
# consecutive matches in a run never starve each other — this makes
# single-pass replace EQUAL to greedy left-to-right BPE pairing,
# including same-char runs ('a a a a a' -> [aa, aa, a]) where the
# previous single-space two-pass scheme mis-paired (round-2 ADVICE
# finding, verified fixed by tests/test_mining.py::test_bpe_merge_*
# against a pure-Python left-to-right fold).  The single leading/
# trailing pattern spaces also make cross-symbol prefix/suffix matches
# impossible once symbols are multi-char (symbol interiors contain no
# spaces).  replace() is leftmost non-overlapping in both engines.
#
# Scale: distinct-word table is vocabulary-sized (≪ corpus); two
# shuffles (pair agg before, pair agg after); the 1-row top merge is a
# broadcast cross join, never a driver collect.
# ---------------------------------------------------------------------------
@_register(
    "corpus_bpe_merge_step",
    f"""
    WITH tok AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents)
        WHERE length(token) >= 2 GROUP BY token
    ),
    pc AS (
        SELECT pair, SUM(c) AS n FROM (
            SELECT unnest(list_transform(range(1, length(token)),
                          i -> substr(token, CAST(i AS INTEGER), 2))) AS pair,
                   c
            FROM tok
        ) GROUP BY pair
    ),
    top1 AS (SELECT pair AS merged_pair FROM pc
             ORDER BY n DESC, pair LIMIT 1),
    sym AS (
        SELECT '  ' || regexp_replace(token, '(.)', '\\1  ', 'g') AS s, c
        FROM tok
    ),
    merged AS (
        -- double-space separators: one leftmost non-overlapping
        -- replace of ' p1  p2 ' -> ' p1p2 ' IS greedy left-to-right
        -- BPE (see block comment above the Spark twin)
        SELECT replace(s,
                       ' ' || substr(merged_pair, 1, 1) || '  '
                           || substr(merged_pair, 2, 1) || ' ',
                       ' ' || merged_pair || ' ') AS s,
               c, merged_pair
        FROM sym, top1
    ),
    post AS (
        SELECT merged_pair, pair, SUM(c) AS n FROM (
            SELECT merged_pair, c,
                   unnest(list_transform(range(1, len(a)),
                          i -> a[CAST(i AS INTEGER)] || '+'
                               || a[CAST(i AS INTEGER) + 1])) AS pair
            FROM (SELECT merged_pair, c,
                         list_filter(string_split(trim(s), ' '),
                                     x -> x <> '') AS a
                  FROM merged)
        ) GROUP BY merged_pair, pair
    )
    SELECT merged_pair, pair, CAST(n AS BIGINT) AS n FROM post
    ORDER BY n DESC, pair LIMIT 20
    """,
)
def corpus_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(tokenize("text")).alias("token"))
        .filter(F.length("token") >= 2)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pc = (
        tok.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(token) - 1),"
                    " i -> substring(token, i, 2))"
                )
            ).alias("pair"),
            "c",
        )
        .groupBy("pair")
        .agg(F.sum("c").alias("n"))
    )
    top1 = pc.orderBy(F.desc("n"), "pair").limit(1).select(
        F.col("pair").alias("merged_pair")
    )
    sym = tok.select(
        F.concat(F.lit("  "), F.regexp_replace("token", "(.)", "$1  ")).alias(
            "s"
        ),
        "c",
    )
    pat = F.concat(
        F.lit(" "),
        F.substring("merged_pair", 1, 1),
        F.lit("  "),
        F.substring("merged_pair", 2, 1),
        F.lit(" "),
    )
    repl = F.concat(F.lit(" "), F.col("merged_pair"), F.lit(" "))
    # ONE replace pass over DOUBLE-space separators = exact greedy
    # left-to-right BPE application (see block comment above); same
    # single pass in the oracle SQL.
    merged = sym.crossJoin(F.broadcast(top1)).select(
        F.replace(F.col("s"), pat, repl).alias("s"),
        "c",
        "merged_pair",
    )
    # materialize the symbol array ONCE — a filter(split(...)) inside
    # the per-element lambda would re-split the string per output pair
    # (O(len^2) per word; see text_bigram_logprob_scores)
    arr = merged.select(
        "merged_pair",
        "c",
        F.filter(
            F.split(F.trim(F.col("s")), " "), lambda x: x != ""
        ).alias("a"),
    )
    # A 2-char token equal to the chosen merge collapses to ONE symbol;
    # sequence(1, size-1) would then be the DESCENDING [1, 0] and
    # element_at(a, 0) throws.  Single-symbol words contribute no pairs
    # — drop them (DuckDB's range(1, 1) is empty, so the oracle already
    # does).
    arr = arr.filter(F.size("a") >= 2)
    post = (
        arr.select(
            "merged_pair",
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> concat(element_at(a, i), '+',"
                    " element_at(a, i + 1)))"
                )
            ).alias("pair"),
        )
        .groupBy("merged_pair", "pair")
        .agg(F.sum("c").alias("n"))
    )
    return post.orderBy(F.desc("n"), "pair").limit(20)


# ---------------------------------------------------------------------------
# BPE TRAINER — k full merge iterations, proving the iterative-trainer
# shape (VERDICT r2 item 6): per iteration, count weighted adjacent
# symbol pairs, pick the top merge (n desc, p1/p2 asc — deterministic),
# apply it with the exact single-pass double-space replace (see
# corpus_bpe_merge_step), repeat.  Output = the learned merge table
# (step, p1, p2, pre-merge count) — the artifact a tokenizer ships.
#
# Scale shape: the DRIVER holds only the merge table (k rows, one
# 1-row collect per iteration — bounded model state, the same pattern
# as k-means centroids in operators/similarity.py); the vocabulary
# table stays distributed and is localCheckpoint-ed each round so
# lineage stays O(1) instead of O(k) (same pattern as
# operators/graph.py pagerank).  Work per iteration: one pair-count
# shuffle over a vocabulary-sized table (≪ corpus — pair counting is
# weighted by word frequency, never per-occurrence).
#
# The oracle unrolls the same k iterations as chained CTEs — top-1
# selection and merge application are pure SQL, so the whole trainer
# is oracle-gated, not just one step.
# ---------------------------------------------------------------------------
_BPE_TRAIN_K = 4


def _bpe_train_sql(k: int) -> str:
    """Unrolled k-iteration BPE trainer as one DuckDB query."""
    ctes = [
        f"""tok AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents)
        WHERE length(token) >= 2 GROUP BY token
    )""",
        """sym0 AS (
        SELECT '  ' || regexp_replace(token, '(.)', '\\1  ', 'g') AS s, c
        FROM tok
    )""",
    ]
    for i in range(1, k + 1):
        prev = f"sym{i - 1}"
        # '+' is a safe pair separator: tokens are \p{L}\p{N} only
        ctes.append(f"""pc{i} AS (
        SELECT string_split(pr, '+')[1] AS p1,
               string_split(pr, '+')[2] AS p2, SUM(c) AS n
        FROM (
            SELECT c,
                   unnest(list_transform(range(1, len(a)),
                          j -> a[CAST(j AS INTEGER)] || '+'
                               || a[CAST(j AS INTEGER) + 1])) AS pr
            FROM (SELECT list_filter(string_split(trim(s), ' '),
                                     x -> x <> '') AS a, c
                  FROM {prev})
        ) GROUP BY 1, 2
    )""")
        ctes.append(f"""top{i} AS (
        SELECT p1, p2, n FROM pc{i} ORDER BY n DESC, p1, p2 LIMIT 1
    )""")
        if i < k:
            ctes.append(f"""sym{i} AS (
        SELECT replace(s, ' ' || p1 || '  ' || p2 || ' ',
                       ' ' || p1 || p2 || ' ') AS s, c
        FROM {prev}, top{i}
    )""")
    unions = " UNION ALL ".join(
        f"SELECT {i} AS step, p1, p2, CAST(n AS BIGINT) AS n FROM top{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT * FROM ({unions}) ORDER BY step"
    )


def _train_bpe_merges(spark: SparkSession,
                      sf_dir: str) -> list[tuple[int, str, str, int]]:
    """The trainer loop shared by corpus_bpe_train_k (which exposes the
    merge table) and corpus_bpe_apply (which encodes with it)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(tokenize("text")).alias("token"))
        .filter(F.length("token") >= 2)
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    sym = tok.select(
        F.concat(F.lit("  "), F.regexp_replace("token", "(.)", "$1  ")).alias(
            "s"
        ),
        "c",
    ).localCheckpoint()  # materialize the vocabulary once
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, _BPE_TRAIN_K + 1):
        arr = sym.select(
            F.filter(F.split(F.trim("s"), " "), lambda x: x != "").alias("a"),
            "c",
        ).filter(F.size("a") >= 2)  # 1-symbol words contribute no pairs
        pairs = (
            arr.select(
                "c",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(a) - 1),"
                        " j -> named_struct("
                        "'p1', element_at(a, j),"
                        " 'p2', element_at(a, j + 1)))"
                    )
                ).alias("pr"),
            )
            .select("pr.p1", "pr.p2", "c")
            .groupBy("p1", "p2")
            .agg(F.sum("c").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "p1", "p2").limit(1).collect()
        if not top:
            break
        r = top[0]
        merges.append((step, r["p1"], r["p2"], int(r["n"])))
        sym = sym.select(
            F.replace(
                "s",
                F.lit(f" {r['p1']}  {r['p2']} "),
                F.lit(f" {r['p1']}{r['p2']} "),
            ).alias("s"),
            "c",
        ).localCheckpoint()  # truncate lineage: O(1) per round, not O(k)
    return merges


@_register("corpus_bpe_train_k", _bpe_train_sql(_BPE_TRAIN_K))
def corpus_bpe_train_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        _train_bpe_merges(spark, sf_dir),
        "step int, p1 string, p2 string, n long",
    ).orderBy("step")


def _bpe_apply_sql(k: int) -> str:
    """Per-doc encoding with the k trained merges: the train CTEs give
    top1..topk; each doc token is symbolized and run through the same
    k single-pass replaces, then symbols are counted per doc."""
    train = _bpe_train_sql(k)
    ctes = train[len("WITH "):train.rindex("\n    SELECT")]
    apply_ctes = [
        f"""dtok AS (
        SELECT doc_id, token
        FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents)
        WHERE length(token) >= 2
    )""",
        """dsym0 AS (
        SELECT doc_id, length(token) AS n_chars,
               '  ' || regexp_replace(token, '(.)', '\\1  ', 'g') AS s
        FROM dtok
    )""",
    ]
    for i in range(1, k + 1):
        # LEFT JOIN ON TRUE, not a cross join: a corpus with fewer than
        # k learnable merges leaves top{i} EMPTY, and a cross join
        # would annihilate every document (the Spark side just stops
        # merging) — NULL p1 means "no merge this round, keep s".
        apply_ctes.append(f"""dsym{i} AS (
        SELECT doc_id, n_chars,
               CASE WHEN p1 IS NULL THEN s
                    ELSE replace(s, ' ' || p1 || '  ' || p2 || ' ',
                                 ' ' || p1 || p2 || ' ') END AS s
        FROM dsym{i - 1} LEFT JOIN top{i} ON TRUE
    )""")
    return (
        "WITH " + ctes + ",\n    " + ",\n    ".join(apply_ctes) + f"""
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(len(list_filter(string_split(trim(s), ' '),
                                    x -> x <> ''))) AS BIGINT) AS n_symbols,
           CAST(1000 * (SUM(n_chars)
                        - SUM(len(list_filter(string_split(trim(s), ' '),
                                              x -> x <> ''))))
                // SUM(n_chars) AS BIGINT) AS saved_permille
    FROM dsym{k} GROUP BY doc_id ORDER BY doc_id
    """
    )


# ---------------------------------------------------------------------------
# BPE APPLY — the consumer side of the trainer: encode every document
# with the k learned merges and report the compression each doc gets
# (chars -> symbols; saved_permille is the tokenizer's win).  Driver
# state is the k-row merge table; the application is a chain of k
# literal replaces — pure JVM projection over exploded (doc, token)
# rows, one aggregation back to doc grain.  The oracle re-trains AND
# re-applies in SQL, so train->apply stays end-to-end gated.
# ---------------------------------------------------------------------------
@_register("corpus_bpe_apply", _bpe_apply_sql(_BPE_TRAIN_K))
def corpus_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _train_bpe_merges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    dtok = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    ).filter(F.length("token") >= 2)
    s = F.concat(F.lit("  "), F.regexp_replace("token", "(.)", "$1  "))
    for _, p1, p2, _ in merges:
        s = F.replace(s, F.lit(f" {p1}  {p2} "), F.lit(f" {p1}{p2} "))
    enc = dtok.select(
        "doc_id",
        F.length("token").alias("n_chars"),
        F.size(
            F.filter(F.split(F.trim(s), " "), lambda x: x != "")
        ).alias("n_symbols"),
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_symbols").cast("long").alias("n_symbols"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_symbols",
            F.expr(
                "CAST(1000 * (n_chars - n_symbols) DIV n_chars AS BIGINT)"
            ).alias("saved_permille"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bigram PMI collocations — pointwise mutual information of adjacent
# token pairs over the whole corpus: PMI = log10(P(ab) / (P(a)P(b)))
# computed as ONE log of an explicitly parenthesized double ratio
# (((c_ab*Nu)*Nu) / ((Nb*c_a)*c_b)), rounded to 6dp — the same
# single-log-of-a-ratio pattern the green unigram/ppl queries use, so
# cross-engine float drift is confined below the rounding floor.  Row
# MEMBERSHIP is integer-only (c_ab >= min count), so the result set
# never depends on a float compare.  The collocation table is the
# phrase-mining / tokenizer-merge-candidate primitive; at 100 TB it is
# two scan-linear map-side-combinable groupBys (bigrams, unigrams)
# plus a join against the (vocab-sized, distributed) count tables.
# ---------------------------------------------------------------------------
_PMI_MIN_COUNT = 5

@_register(
    "corpus_bigram_pmi",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    uni AS (SELECT unnest(w) AS tokn FROM t),
    ucnt AS (SELECT tokn, CAST(COUNT(*) AS BIGINT) AS c
             FROM uni GROUP BY tokn),
    nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni),
    bi AS (SELECT w[CAST(i AS BIGINT)] AS w1, w[CAST(i AS BIGINT) + 1] AS w2
           FROM t, UNNEST(range(1, len(w))) AS u(i)),
    bcnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
             FROM bi GROUP BY w1, w2),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bi)
    SELECT w1, w2, c_ab,
           ROUND(LOG10(((CAST(c_ab AS DOUBLE) * nu.n) * nu.n)
                       / ((CAST(nb.n AS DOUBLE) * ca.c) * cb.c)), 6) AS pmi
    FROM bcnt
    JOIN ucnt ca ON ca.tokn = w1
    JOIN ucnt cb ON cb.tokn = w2
    CROSS JOIN nu CROSS JOIN nb
    WHERE c_ab >= {_PMI_MIN_COUNT}
    ORDER BY w1, w2
    """,
)
def corpus_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokenize("text").alias("w"))
    uni = t.select(F.explode("w").alias("tokn"))
    ucnt = uni.groupBy("tokn").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nu = uni.agg(F.count(F.lit(1)).cast("long").alias("n_uni"))
    n1 = F.greatest(F.size("w") - 1, F.lit(0))
    bi = t.select(
        F.explode(
            F.zip_with(
                F.slice("w", 1, n1),
                F.slice("w", 2, n1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bcnt = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_ab")
    )
    nb = bi.agg(F.count(F.lit(1)).cast("long").alias("n_bi"))
    ca = ucnt.select(F.col("tokn").alias("w1"), F.col("c").alias("c_a"))
    cb = ucnt.select(F.col("tokn").alias("w2"), F.col("c").alias("c_b"))
    return (
        bcnt.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(ca, on="w1")
        .join(cb, on="w2")
        .join(F.broadcast(nu))
        .join(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log10(
                    (F.col("c_ab").cast("double") * F.col("n_uni"))
                    * F.col("n_uni")
                    / (
                        (F.col("n_bi").cast("double") * F.col("c_a"))
                        * F.col("c_b")
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("w1", "w2")
    )
