"""Physical-plan regression guards: the properties that matter at
100 TB, pinned as tests so a refactor that silently degrades a plan
(broadcast lost, pushdown broken, extra shuffle) fails CI instead of
production.  Uses the same plan-text audit as tools/explain_report.py.
"""

from __future__ import annotations

import re

from vexere_lakehouse_pipeline_spark.plans import corpus, star, star_tpch2

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    df.collect()  # materialize so AQE's final plan is available
    text = df._jdf.queryExecution().executedPlan().toString()
    # under AQE the string contains final + initial; audit the final
    return text.split("== Initial Plan ==")[0]


def _shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))


def test_q9_broadcasts_all_dims_no_smj(spark):
    plan = _plan(star_tpch2.QUERIES["tpch_q9_product_profit"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation


def test_q1_pushes_filter_and_prunes_columns(spark):
    plan = _plan(star.QUERIES["tpch_q1_pricing_summary"](spark, SF))
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    assert scans and all("PushedFilters: [" in s for s in scans)
    # executedPlan text lists projected columns in the scan's bracket
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and len(m.group(1).split(",")) <= 7  # not the full 11-col table


def test_vocab_topk_single_wide_shuffle(spark):
    plan = _plan(corpus.QUERIES["corpus_vocab_topk"](spark, SF))
    # explode -> partial agg -> ONE exchange on token -> final agg -> topk
    assert _shuffles(plan) <= 1


def test_split_counts_no_join_no_python(spark):
    plan = _plan(corpus.QUERIES["corpus_split_counts"](spark, SF))
    assert "Join" not in plan  # pure map-side assignment + one agg
    assert "BatchEvalPython" not in plan  # md5 bucketing stays JVM-side
    assert "ArrowEvalPython" not in plan


def test_clean_pipeline_stays_jvm_side(spark):
    plan = _plan(corpus.QUERIES["corpus_clean_pipeline"](spark, SF))
    assert "BatchEvalPython" not in plan  # redact/quality/fingerprint native


def test_bm25_topk_is_heap_not_global_sort(spark):
    from vexere_lakehouse_pipeline_spark.plans import corpus_ext

    plan = _plan(corpus_ext.QUERIES["corpus_bm25_search"](spark, SF))
    # orderBy+limit must plan as per-partition heaps + driver merge,
    # never a full sort shuffle of every scored document
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_tfidf_no_global_window_no_python(spark):
    from vexere_lakehouse_pipeline_spark.plans import corpus_ext

    plan = _plan(corpus_ext.QUERIES["corpus_tfidf_top_terms"](spark, SF))
    # the rank window is partitioned by doc_id; the only SinglePartition
    # exchange allowed is the 1-row n_docs scalar aggregate
    assert "windowspecdefinition(doc_id" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    # Spark's rank-limit pushdown prunes rnk>3 rows BEFORE the window
    # shuffle - the property that keeps per-doc top-k cheap at 100 TB
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_quant_stats_map_only_compute(spark):
    from vexere_lakehouse_pipeline_spark.plans import corpus_ext

    plan = _plan(corpus_ext.QUERIES["embed_int8_quant_stats"](spark, SF))
    # only exchange allowed: the final presentation sort (range); the
    # quantization itself is codegen'd map work - no hash shuffle, no
    # join, no Python
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_pseudonymize_pure_projection_prunes_columns(spark):
    from vexere_lakehouse_pipeline_spark.plans import governance

    plan = _plan(
        governance.QUERIES["privacy_pseudonymize_customers"](spark, SF)
    )
    # masking + sha2 are JVM Columns over a pruned 2-col scan; the only
    # exchange is the deterministic output sort
    assert "BatchEvalPython" not in plan and "Join" not in plan
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and len(m.group(1).split(",")) <= 2
    assert _shuffles(plan) <= 1  # rangepartitioning for orderBy only


def test_kanonymity_single_agg_shuffle(spark):
    from vexere_lakehouse_pipeline_spark.plans import governance

    plan = _plan(governance.QUERIES["privacy_kanonymity_report"](spark, SF))
    # partial agg -> one hash exchange -> final agg (+ output sort)
    assert _shuffles(plan) <= 2
    assert "Join" not in plan


def test_anomaly_window_feeds_on_day_rollup_only(spark):
    from vexere_lakehouse_pipeline_spark.plans import governance

    plan = _plan(governance.QUERIES["anomaly_daily_revenue"](spark, SF))
    # the single-partition window is fed by the day-level rollup (tiny
    # forever), never by raw orders; scan reads only 2 columns
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m and len(m.group(1).split(",")) <= 2
    assert "BatchEvalPython" not in plan


def test_pagerank_iterations_stay_jvm_side(spark):
    from vexere_lakehouse_pipeline_spark.plans import governance

    df = governance.QUERIES["graph_pagerank_knn"](spark, SF)
    plan = _plan(df)
    # localCheckpoint truncates lineage: the FINAL plan holds only the
    # last join-back, not 3 unrolled iterations of everything
    assert "BatchEvalPython" not in plan
    assert plan.count("FileScan parquet") == 0  # reads checkpointed RDDs


def test_simhash_near_pairs_plan_shape(spark):
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    plan = _plan(star_ml.QUERIES["dedup_simhash_near_pairs"](spark, SF))
    # banded equi-join on (band, band_val), never a cartesian; all bit
    # math stays JVM-side
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crossdoc_ngram_dup_no_python_no_cartesian(spark):
    from vexere_lakehouse_pipeline_spark.plans import corpus_ext

    plan = _plan(corpus_ext.QUERIES["corpus_crossdoc_ngram_dup"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_multires_rollup_single_pass(spark):
    from vexere_lakehouse_pipeline_spark.plans import star_ext

    plan = _plan(star_ext.QUERIES["events_multires_rollup"](spark, SF))
    # ONE scan expands to all rollup grains (the point of the operator:
    # minute/hour/day/total from a single pass, not three scans)
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan


def test_weighted_sample_is_map_side_filter(spark):
    from vexere_lakehouse_pipeline_spark.plans import corpus

    plan = _plan(corpus.QUERIES["corpus_weighted_sample"](spark, SF))
    # the only join is the broadcast 1-row max scalar; the keep
    # decision itself is a map-side filter with no extra exchange
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_oov_vocab_is_topk_heap_and_broadcast(spark):
    from vexere_lakehouse_pipeline_spark.plans import corpus

    plan = _plan(corpus.QUERIES["corpus_oov_rate"](spark, SF))
    # derived vocab: per-partition top-K heaps, then broadcast to the
    # coverage join — never a global sort or a shuffled join on token
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lsh_split_census_is_broadcast_no_extra_shuffle(spark):
    """The hot-bucket split must not change the LSH plan class: the
    census assignment is a BROADCAST join (the census is one row per
    hot bucket), never a sort-merge join, and the band self-join stays
    the only equi-join over bulk data."""
    from vexere_lakehouse_pipeline_spark.plans import star_ml

    plan = _plan(star_ml.QUERIES["dedup_minhash_lsh_pairs"](spark, SF))
    assert "SortMergeJoin" not in plan
    # census join + self join are both hash joins; census side broadcast
    assert plan.count("BroadcastHashJoin") >= 1
    # shuffles: minhash agg + pair distinct (+ AQE variance); the split
    # must NOT add a wide exchange for the census
    assert _shuffles(plan) <= 3


def test_er_split_keeps_window_single_pass(spark):
    """ER blocking after the split: one window pass for the block
    census, hash-join self-join on (block, sub) — no SMJ, no second
    wide exchange for the sub assignment."""
    from vexere_lakehouse_pipeline_spark.plans import governance

    plan = _plan(governance.QUERIES["er_customer_matches"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert _shuffles(plan) <= 3


def test_watermark_twin_batch_census_broadcasts(spark):
    """The watermark twin's per-batch census join must broadcast (the
    census is one row per arrival hour — metadata-sized) so the event
    table is touched by exactly one wide aggregation."""
    from vexere_lakehouse_pipeline_spark.plans import star_ext

    plan = _plan(
        star_ext.QUERIES["events_watermark_discard_twin"](spark, SF)
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_norm_hoists_survive_collapse_project(spark):
    """Round-11 (ADVICE r10): the round-10 norm hoists depend on
    CollapseProject KEEPING the carried `_nrm`/`__q8_nrm` aliases (an
    interpreted HOF lambda re-evaluates invariant subtrees once per
    array element, so a re-inlined norm fold silently restores a
    dims-fold-per-row cost with no functional signal).  Pin the plan
    shape: the optimized plan must still contain each hoisted alias."""
    from vexere_lakehouse_pipeline_spark.catalog import load_table
    from vexere_lakehouse_pipeline_spark.operators import dedup, similarity

    emb = load_table(spark, SF, "embeddings")

    def _optimized(df) -> str:
        return df._jdf.queryExecution().optimizedPlan().toString()

    u = similarity._unit_vecs(emb, "embedding", "vec_id", "v")
    assert " AS _nrm#" in _optimized(u)
    sub = similarity._unit_subvectors(emb, 8, "embedding", "vec_id", "v")
    assert " AS _nrm#" in _optimized(sub)
    q8 = similarity.quantize_int8_unit(emb)
    assert " AS __q8_nrm#" in _optimized(q8)
    # the int8-prefilter path carries the same hoist (the default
    # one-pass path scores in the Arrow kernel — no JVM fold to hoist)
    nd = dedup.embedding_neardup_pairs(emb, prefilter=True)
    assert " AS _nrm#" in _optimized(nd)
