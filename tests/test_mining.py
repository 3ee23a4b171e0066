"""Sketch gates, importance weights, BPE pairs, and the distributed
global-ranking window (plans/mining.py + operators/packing.py
distributed_rank_ntile)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import packing
from vexere_lakehouse_pipeline_spark.plans import mining, star_tpch2

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------------------------------------------------------------------------
# distributed_rank_ntile — the rank/total contract behind the window twin
# ---------------------------------------------------------------------------
def test_distributed_rank_ntile_rank_and_buckets(spark):
    df = spark.range(10).withColumn("v", (F.col("id") * 7) % 10)
    out, n = packing.distributed_rank_ntile(
        df, ["v"], 3, out_col="b", rank_col="rk"
    )
    rows = sorted(_rows(out.select("v", "rk", "b")))
    assert n == 10
    # rank follows the v order, 1..10; ntile(3) over 10 rows = 4,3,3
    assert [r[1] for r in rows] == list(range(1, 11))
    assert [r[2] for r in rows] == [1] * 4 + [2] * 3 + [3] * 3


def test_distributed_rank_ntile_empty_input(spark):
    df = spark.range(0).withColumn("v", F.col("id"))
    out, n = packing.distributed_rank_ntile(df, ["v"], 4)
    assert n == 0
    assert out.count() == 0


# ---------------------------------------------------------------------------
# The distributed window twin must be row-identical to the
# single-partition showcase query — same values, no global window.
# ---------------------------------------------------------------------------
def test_spend_quartiles_distributed_matches_window_version(spark):
    a = _rows(star_tpch2.QUERIES["window_spend_quartiles"](spark, SF))
    b = _rows(
        mining.QUERIES["window_spend_quartiles_distributed"](spark, SF)
    )
    assert a == b


def test_spend_quartiles_distributed_no_single_partition_window(spark):
    df = mining.QUERIES["window_spend_quartiles_distributed"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # the showcase version needs Exchange SinglePartition for its global
    # window; the distributed twin must never re-introduce one (the
    # final ORDER BY is a rangepartitioning exchange, not a gather)
    assert "Exchange SinglePartition" not in plan
    assert not re.search(r"Window .*ntile", plan)


# ---------------------------------------------------------------------------
# Sketch gates — the estimate stays inside its documented envelope
# (the oracle pins the booleans TRUE cross-engine; this keeps the
# property in the suite without DuckDB)
# ---------------------------------------------------------------------------
def test_hll_and_quantile_gates_hold(spark):
    hll = mining.QUERIES["agg_hll_distinct_gate"](spark, SF).collect()
    assert hll and all(r.hll_within_10pct for r in hll)
    wau = mining.QUERIES["events_wau_hll_gate"](spark, SF).collect()
    assert wau and all(r.hll_within_5pct for r in wau)
    q = mining.QUERIES["agg_approx_quantile_gate"](spark, SF).collect()
    assert q and all(r.approx_in_decile for r in q)


def test_wau_hll_gate_exact_matches_trailing_window(spark):
    rows = {
        r.day: r.wau_exact
        for r in mining.QUERIES["events_wau_hll_gate"](spark, SF).collect()
    }
    # recompute one day's trailing-7d distinct independently
    from vexere_lakehouse_pipeline_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    day = max(rows)
    expected = (
        ev.select(F.to_date("ts").alias("d"), "user_id")
        .filter(
            (F.col("d") >= F.date_sub(F.lit(day), 6))
            & (F.col("d") <= F.lit(day))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[day] == expected


# ---------------------------------------------------------------------------
# BPE pair counts — cross-checked against a pure-Python recount
# ---------------------------------------------------------------------------
def test_bpe_pair_counts_match_python(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.functions.text import tokenize

    # 50-doc sample written as its own sf dir so the REGISTERED query
    # runs, not a copy of its internals
    docs = load_table(spark, SF, "documents").limit(50)
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")

    toks = [
        r.t
        for r in docs.select(
            F.explode(tokenize("text")).alias("t")
        ).collect()
    ]
    expected: dict[str, int] = {}
    for t in toks:
        for i in range(len(t) - 1):
            p = t[i : i + 2]
            expected[p] = expected.get(p, 0) + 1
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:30]

    got = mining.QUERIES["corpus_bpe_pair_counts"](spark, sf).collect()
    assert [(r.pair, r.n) for r in got] == top


# ---------------------------------------------------------------------------
# Importance weights — direction sanity: a token frequent ONLY in the
# target source must score positive; one absent from the target must
# score negative (add-one smoothing keeps both finite)
# ---------------------------------------------------------------------------
def test_importance_weights_direction(spark):
    df = spark.createDataFrame(
        [
            (1, "aardvark aardvark aardvark", "en", "src0", 26),
            (2, "aardvark aardvark aardvark", "en", "src0", 26),
            (3, "zebra zebra zebra", "en", "src9", 17),
            (4, "zebra zebra zebra", "en", "src9", 17),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/documents.parquet")
        out = {
            r.doc_id: r.importance
            for r in mining.QUERIES["corpus_importance_weights"](
                spark, tmp
            ).collect()
        }
    assert out[1] > 0 and out[2] > 0
    assert out[3] < 0 and out[4] < 0


# ---------------------------------------------------------------------------
# Triangle counting — hand-built graph with a known triangle census
# ---------------------------------------------------------------------------
def test_triangle_counts_hand_graph(spark):
    from vexere_lakehouse_pipeline_spark.operators import graph

    # K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant 5
    # and an isolated 6; edges given messy: duplicated, reversed, loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 5)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "vec_id long")
    out = {
        r.vec_id: (r.degree, r.n_triangles)
        for r in graph.triangle_counts(edges, nodes).collect()
    }
    assert out == {
        1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3), 5: (1, 0), 6: (0, 0)
    }


def test_sliding_windows_each_event_in_four_windows(spark):
    from vexere_lakehouse_pipeline_spark.catalog import load_table

    n_events = load_table(spark, SF, "events").count()
    out = mining.QUERIES["events_sliding_windows"](spark, SF)
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == 4 * n_events


def test_stats_showcase_matches_python(spark):
    import statistics

    from vexere_lakehouse_pipeline_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    vals = {}
    for r in li.collect():
        vals.setdefault(r.l_returnflag, []).append(float(r.l_quantity))
    out = {
        r.l_returnflag: r
        for r in mining.QUERIES["stats_function_showcase"](
            spark, SF
        ).collect()
    }
    for flag, xs in vals.items():
        assert out[flag].n == len(xs)
        assert abs(out[flag].qty_stddev - statistics.stdev(xs)) < 1e-5
        mu = statistics.fmean(xs)
        m2 = sum((x - mu) ** 2 for x in xs) / len(xs)
        m3 = sum((x - mu) ** 3 for x in xs) / len(xs)
        assert abs(out[flag].qty_skew_pop - m3 / m2 ** 1.5) < 1e-5


def test_ppl_buckets_tertile_counts(spark):
    out = mining.QUERIES["corpus_ppl_buckets"](spark, SF).collect()
    assert out
    by_lang: dict[str, dict[str, int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, {}).setdefault(r.ppl_bucket, 0)
        by_lang[r.lang][r.ppl_bucket] += 1
    for lang, buckets in by_lang.items():
        n = sum(buckets.values())
        assert buckets.get("head", 0) == n // 3
        assert buckets.get("middle", 0) == 2 * n // 3 - n // 3
        assert buckets.get("tail", 0) == n - 2 * n // 3


def test_mad_outliers_flag_matches_definition(spark):
    rows = mining.QUERIES["corpus_mad_outliers"](spark, SF).collect()
    assert rows
    import statistics

    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        meds = {r.lang_median for r in rs}
        mads = {r.lang_mad for r in rs}
        assert len(meds) == 1 and len(mads) == 1
        med, mad = meds.pop(), mads.pop()
        for r in rs:
            assert r.is_outlier == (abs(r.n_chars - med) > 3 * mad)


def test_bpe_merge_step_shape(spark):
    from vexere_lakehouse_pipeline_spark.plans import mining

    out = mining.QUERIES["corpus_bpe_merge_step"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 0 < len(out) <= 20
    mp = {r["merged_pair"] for r in out}
    assert len(mp) == 1 and len(mp.pop()) == 2  # one 2-char merge chosen
    ns = [r["n"] for r in out]
    assert ns == sorted(ns, reverse=True)
    for r in out:
        assert "+" in r["pair"]  # post-merge pairs are symbol pairs


def _true_bpe_merge(symbols, p1, p2):
    """Greedy left-to-right BPE application of one merge — the ground
    truth the replace-based scheme must equal."""
    out = []
    for x in symbols:
        if out and out[-1] == p1 and x == p2:
            out[-1] = p1 + p2
        else:
            out.append(x)
    return out


def test_bpe_single_pass_double_space_is_exact(spark):
    """Round-2 ADVICE: single-space two-pass replace mis-paired
    same-char runs >= 5 ('a a a a a' -> [aa, a, aa] instead of
    [aa, aa, a]).  The double-space single-pass scheme must equal the
    pure-Python left-to-right fold on exactly those cases and on
    multi-char-symbol chains."""
    import random

    from pyspark.sql import functions as F

    random.seed(7)
    alpha = ["a", "b", "ba", "ab", "aa", "c", "co", "o"]
    cases = [(["a"] * k, "a", "a") for k in range(2, 9)]
    cases += [(["c", "o"] * k, "c", "o") for k in range(1, 4)]
    for _ in range(40):
        cases.append((
            [random.choice(alpha) for _ in range(random.randint(1, 10))],
            random.choice(alpha), random.choice(alpha),
        ))
    rows = [("  " + "  ".join(syms) + "  ", p1, p2) for syms, p1, p2 in cases]
    df = spark.createDataFrame(rows, "s string, p1 string, p2 string")
    pat = F.concat(F.lit(" "), "p1", F.lit("  "), "p2", F.lit(" "))
    repl = F.concat(F.lit(" "), "p1", "p2", F.lit(" "))
    got = [r["m"] for r in df.select(
        F.replace(F.col("s"), pat, repl).alias("m")
    ).collect()]
    for (syms, p1, p2), m in zip(cases, got):
        assert [t for t in m.split(" ") if t] == _true_bpe_merge(
            syms, p1, p2
        ), (syms, p1, p2, m)
        # output stays canonically double-spaced -> iterable k times
        assert "  ".join([t for t in m.split(" ") if t]) == m.strip()


def test_bpe_apply_survives_sub_k_merge_corpus(spark, tmp_path):
    """Code-review r3: a corpus with fewer learnable merges than
    _BPE_TRAIN_K must not annihilate the oracle (empty top{i} was
    cross-joined); both engines must return every document."""
    import duckdb

    from vexere_lakehouse_pipeline_spark.plans.mining import (
        _BPE_TRAIN_K,
        _bpe_apply_sql,
    )

    spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ab cd")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        tuple(r)
        for r in mining.QUERIES["corpus_bpe_apply"](
            spark, str(tmp_path)
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES (1, 'ab ab ab'),"
        " (2, 'ab cd')) t(doc_id, text)"
    )
    want = sorted(tuple(r) for r in con.sql(
        _bpe_apply_sql(_BPE_TRAIN_K)
    ).fetchall())
    assert got == want
    assert len(got) == 2


# ---------------------------------------------------------------------------
# corpus_bigram_pmi — oracle parity (mining is not in the
# test_star_oracle auto-sweep) + the integer-membership contract
# ---------------------------------------------------------------------------
def test_corpus_bigram_pmi_oracle_parity(spark):
    import duckdb

    from vexere_lakehouse_pipeline_spark.catalog import TESTDATA_TABLES

    got = sorted(_rows(mining.QUERIES["corpus_bigram_pmi"](spark, SF)))
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = sorted(
        tuple(r) for r in
        con.execute(mining.ORACLE_SQL["corpus_bigram_pmi"]).fetchall()
    )
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:3] == w[:3]          # w1, w2, c_ab exact
        assert abs(g[3] - w[3]) < 1e-9  # pmi at 6dp both engines
    # membership is integer-only: every row meets the min count
    assert all(g[2] >= mining._PMI_MIN_COUNT for g in got)
