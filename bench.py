"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the noop sink (df.write.format("noop")),
which evaluates EVERY output column and row — count() would let
Catalyst prune projection work entirely (a quality-scoring query would
"run" as an empty scan) and answer unfiltered counts from parquet
metadata.  A warmup pass of the first query absorbs JVM/codegen
startup so numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vexere_lakehouse_pipeline_spark.plans import corpus, corpus_ext, governance, mining, sketch_gates, star, star_ext, star_ml, star_tpch2, webcur  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402

ALL_QUERIES = {
    **star.QUERIES,
    **sketch_gates.QUERIES,
    **star_ml.QUERIES,
    **star_ext.QUERIES,
    **star_tpch2.QUERIES,
    **corpus.QUERIES,
    **corpus_ext.QUERIES,
    **governance.QUERIES,
    **mining.QUERIES,
    **webcur.QUERIES,
}

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "tpch_q6_revenue_delta",
    "cau1_daypart_mix",
    "cau2_cheapest_top_rated",
    "cau4_daily_avg_order_value",
    "cau7_hourly_coverage_grid",
    "cau8_size_coverage_grid",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_signatures",
    "sim_topk_bruteforce",
    "text_quality_scores",
    "silver_conform_chain",
    "events_sessionization",
    "tpch_q10_returned_top_customers",
    "tpch_q18_large_orders",
    "sim_topk_ivf",
    "asof_join_error_last_click",
    "range_join_click_then_purchase",
    "scd2_user_type_history",
    "window_spend_quartiles",
    "tpch_q9_product_profit",
    "corpus_vocab_topk",
    "corpus_clean_pipeline",
    "dedup_contamination_flags",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):  # noop sink: full evaluation, zero output cost
        df.write.format("noop").mode("overwrite").save()

    names = [n for n in HEADLINE if n in ALL_QUERIES]
    # Warmup: run the first query once to absorb JVM startup / codegen.
    force(ALL_QUERIES[names[0]](spark, sf_dir))

    # Fixed reference probe (VERDICT r5 #5): one CONSTANT scan-agg over
    # lineitem, frozen forever, timed median-of-3 AFTER warmup.  This
    # box drifts 25-40% day-to-day (BENCH_DRIFT.md); the probe runs
    # code no round ever touches, so cross-round comparisons normalize
    # by the probe ratio instead of being adjudicated by hand.  DO NOT
    # edit this query in future rounds — its only value is constancy.
    from pyspark.sql import functions as _F

    def _noise_probe() -> float:
        t0 = time.time()
        force(
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .groupBy("l_returnflag")
            .agg(
                _F.sum("l_quantity"),
                _F.sum(_F.col("l_extendedprice") * (1 - _F.col("l_discount"))),
                _F.count("*"),
            )
        )
        return time.time() - t0

    from statistics import median as _median

    noise_ref = round(_median(_noise_probe() for _ in range(3)), 3)

    # Best-of-N per query: the min over repetitions is the standard
    # noise-robust estimator of steady-state latency.  The MEDIAN over
    # the same reps is kept alongside (r5 #5): under co-tenant load
    # min and median diverge, and the pair plus noise_ref_sec lets a
    # later round tell host weather from a real regression without a
    # manual rerun.  Round 9 (r8 verdict #4, after r8's bursty-noise
    # misadjudication): the HEADLINE set runs 3 reps (extras keep 2 —
    # the headline is the cross-round contract), the noise probe is
    # re-sampled at start/middle/end of the run so within-run drift is
    # visible, and every rep wall time is recorded to BENCH_REPS.json
    # — the old estimator (min of the FIRST TWO reps; rep order is
    # execution order) is recoverable from that file exactly, and the
    # final line carries it as value_legacy2 (dual-run rule,
    # BENCH_DRIFT.md round-9 note).
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    headline_reps = max(reps, int(os.environ.get(
        "SPARK_GRAFT_BENCH_HEADLINE_REPS", "3")))
    rep_record: dict[str, list[float]] = {}

    def time_query_all(name: str, n_reps: int | None = None) -> list[float]:
        """All rep wall times — one estimator family for headline and
        extra sets so the numbers stay comparable."""
        out = []
        for _ in range(n_reps or reps):
            # Drop cached data between reps: operators that persist()
            # internally would otherwise serve rep 2 from rep 1's cache
            # (CacheManager matches plan-identical subtrees) and the
            # number would measure the cache, not the pipeline.
            spark.catalog.clearCache()
            # Same reasoning for the shared-arm checkpoint cache
            # (round-7): every row recomputes its own pipeline per rep,
            # while the brute-force TRUTH arm stays warm across the
            # gate rows — the recorded r6 estimator semantics, kept
            # frozen.  The bruteforce headline row itself goes fully
            # cold (in r6 the row never read the gates' truth cache).
            star_ml.reset_shared_arms(
                keep_names=() if name == "sim_topk_bruteforce"
                else ("sim_topk_bruteforce",)
            )
            t0 = time.time()
            force(ALL_QUERIES[name](spark, sf_dir))
            out.append(time.time() - t0)
        return out

    def time_query(name: str) -> float:
        rep_times = time_query_all(name)
        rep_record[name] = [round(t, 3) for t in rep_times]
        return round(min(rep_times), 3)

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    legacy2: dict[str, float] = {}
    for name in names:
        rep_times = time_query_all(name, n_reps=headline_reps)
        rep_record[name] = [round(t, 3) for t in rep_times]
        timings[name] = round(min(rep_times), 3)
        medians[name] = round(_median(rep_times), 3)
        # the r1-r8 estimator, recomputed from the SAME run's first
        # two reps — cross-round comparability without a second run
        legacy2[name] = round(min(rep_times[:2]), 3)

    total = round(sum(timings.values()), 3)
    median_total = round(sum(medians.values()), 3)
    legacy2_total = round(sum(legacy2.values()), 3)

    # interleaved probe sample #2: mid-run (after the headline set)
    noise_mid = round(_median(_noise_probe() for _ in range(3)), 3)

    # Non-headline tracked numbers: round-2+ operators timed for
    # round-over-round continuity WITHOUT changing the headline set
    # (the r1-comparable total above stays 1:1).  Additive JSON key.
    extra_names = [
        "graph_pagerank_knn",
        "sim_knn_graph",
        "dedup_editdist_verify",
        "anomaly_daily_revenue",
        "dedup_survivor_selection",
        "text_bigram_logprob_scores",
        "embed_label_centroids",
        "privacy_kanonymity_report",
        "corpus_final_training_set",
        "events_session_windows_native",
        "dedup_simhash_near_pairs",
        "corpus_crossdoc_ngram_dup",
        "events_multires_rollup",
        "corpus_weighted_sample",
        "corpus_split_leakage",
        "corpus_oov_rate",
        "scd2_point_in_time_join",
        "dedup_containment_pairs",
        "corpus_nucleus_vocab",
        "er_customer_matches",
        "events_decayed_user_value",
        "corpus_above_median_quality",
        "corpus_zipf_fit",
        "events_ab_conversion_ztest",
        "agg_hll_distinct_gate",
        "events_wau_hll_gate",
        "agg_approx_quantile_gate",
        "corpus_importance_weights",
        "corpus_bpe_pair_counts",
        "window_spend_quartiles_distributed",
        "er_sorted_neighborhood_matches",
        "stats_function_showcase",
        "events_sliding_windows",
        "graph_triangle_counts",
        "corpus_ppl_buckets",
        "corpus_mad_outliers",
        "text_pii_scrub_report",
        "text_html_strip",
        "corpus_gopher_quality_flags",
        "corpus_domain_curation",
        "dedup_semdedup_survivors",
        "corpus_sentence_dedup",
        "cdc_apply_user_state",
        "multimodal_wav_stats",
        "text_unicode_scrub",
        "corpus_bpe_merge_step",
        "corpus_bpe_train_k",
        "events_watermark_discard_twin",
        "events_dedup_within_watermark_twin",
        "multimodal_bmp_stats",
        "multimodal_png_stats",
        "text_repetition_scores",
        "corpus_bpe_apply",
        "sim_topk_int8",
        "sim_recall_int8_vs_bruteforce",
        "sim_recall_knn_lsh_vs_exact",
        "sim_topk_lsh_multitable",
        "sim_recall_knn_lsh_multitable",
        "sim_topk_hamming",
        "sim_recall_hamming_vs_bruteforce",
        "sketch_cms_heavy_hitters",
        "sketch_bloom_decontam_gate",
        "quality_fk_integrity",
        "corpus_temperature_mix",
        "events_attribution_outer_twin",
        "sketch_kmv_overlap_gate",
        "search_hybrid_rrf",
        "events_gap_fill_ffill",
        "quality_label_noise",
        "corpus_group_split_assign",
        "agg_incremental_merge",
        "search_phrase_match",
        "search_mmr_rerank",
        "search_retrieval_metrics",
        "corpus_bigram_pmi",
        "corpus_intradoc_sentence_dedup",
        "corpus_exact_substring_dedup",
        "corpus_exact_substring_runs",
        "multimodal_wav_downsample",
        "sim_topk_pq_adc",
        "sim_recall_pq_vs_bruteforce",
        "sim_topk_ivfpq",
        "sim_recall_ivfpq_vs_bruteforce",
        "sim_topk_ivfpq_residual",
        "sim_recall_ivfpq_residual_vs_bruteforce",
        "sim_topk_hamming_rerank",
        "sim_recall_hamming_rerank_vs_bruteforce",
        "sim_topk_ivfpq_rerank",
        "sim_recall_ivfpq_rerank_vs_bruteforce",
        "sim_topk_cascade",
        "sim_recall_cascade_vs_bruteforce",
        "sim_topk_sq8",
        "sim_recall_sq8_vs_bruteforce",
        "sim_topk_ivfpq_rerank_prebuilt",
        "sim_topk_sq8_prebuilt",
        "sim_topk_jl_prebuilt",
        "sim_topk_matryoshka",
        "sim_recall_matryoshka_vs_bruteforce",
        "sim_topk_jl",
        "sim_recall_jl_vs_bruteforce",
        "sim_topk_jl_rerank",
        "sim_recall_jl_rerank_vs_bruteforce",
        "quality_drift_ks",
        "quality_score_calibration",
        "quality_cohens_kappa",
        "quality_classifier_scores",
        "events_purged_time_split",
        "events_journey_paths",
        "window_next_order_gap",
        "multimodal_bmp_resize",
        "multimodal_avi_framesample",
        "multimodal_avi_framestride",
        "multimodal_jpeg_stats",
        "multimodal_mulaw_stats",
        "multimodal_gzip_text",
        "multimodal_mjpeg_framesample",
        "multimodal_gif_stats",
        "layout_zorder_key",
        "text_url_canonicalize",
        "dedup_minhash_lsh_pairs_collapsed",
        # round 8: the completed build/serve ladder (each row times a
        # SERVE against the materialized artifact; the build is paid
        # once per app by _prebuilt_index) + the append-path proof row
        "sim_topk_hamming_prebuilt",
        "sim_topk_int8_prebuilt",
        "sim_topk_pq_adc_prebuilt",
        "sim_topk_ivfpq_prebuilt",
        "sim_topk_ivfpq_residual_prebuilt",
        "sim_topk_hamming_rerank_prebuilt",
        "sim_topk_jl_rerank_prebuilt",
        "sim_topk_cascade_prebuilt",
        "sim_topk_matryoshka_prebuilt",
        "sim_topk_sq8_appended",
        "multimodal_phash_neardup_pairs",
        "events_journey_paths_capped",
        "asof_join_error_next_click_capped",
        "sim_topk_filtered_bruteforce",
        "sim_topk_filtered_sq8_prebuilt",
        "sim_recall_filtered_sq8_vs_bruteforce",
        "sim_topk_filtered_jl_prebuilt",
        "layout_compact_roundtrip",
        "layout_hilbert_key",
        "layout_partitioned_dpp_join",
        "sim_recall_filtered_jl_vs_bruteforce",
        # round 9: adaptive probe budget for filtered IVF serving —
        # the row is green at a selectivity where fixed nprobe
        # demonstrably short-falls (tests/test_ann_index.py)
        "sim_topk_filtered_ivfpq_prebuilt",
        "sim_topk_filtered_bruteforce_narrow",
        "sim_recall_filtered_ivfpq_vs_bruteforce",
        # round 9: the freshness path — a real availableNow stream
        # appends B into the saved artifact before serving
        "sim_topk_sq8_stream_appended",
        # round 9: IVM-lite — gold refreshed from CDC diff, not full
        # recompute; oracle is the original cau SQL verbatim
        "gold_cau4_incremental_refresh",
        "gold_cau1_incremental_refresh",
        "gold_cau2_incremental_refresh",
        "gold_cau4_stream_refresh",
        # round 9: the last sim family gets its artifact kind — the
        # banded bucket tables + late-fetch vecs serve from parquet
        "sim_topk_lsh_multitable_prebuilt",
        "sim_topk_filtered_lsh_prebuilt",
        "sim_recall_filtered_lsh_vs_bruteforce",
        # round 10: churn-scale IVM (pruned diff + scoped recompute),
        # multi-input IVM (events-side churn), filtered serving for
        # the remaining flat kinds (hamming/cascade never short-fall)
        "gold_cau4_incremental_refresh_pruned",
        "gold_cau2_incremental_refresh_events",
        "sim_topk_filtered_hamming_prebuilt",
        "sim_recall_filtered_hamming_vs_bruteforce",
        "sim_topk_filtered_cascade_prebuilt",
        "sim_recall_filtered_cascade_vs_bruteforce",
        # sim_hard_negatives / corpus_contrastive_triples are NOT tracked:
        # exact cross-label mining is
        # O(N^2) by contract (enforced ceiling) — the oracle pins its
        # correctness at sf0.01; timing it at sf0.1 would measure the
        # documented quadratic, not a pipeline regression.
    ]
    missing = [n for n in extra_names if n not in ALL_QUERIES]
    assert not missing, f"extras not registered (module missing from ALL_QUERIES?): {missing}"
    extra: dict[str, float] = {name: time_query(name) for name in extra_names}

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # The driver tails stdout and JSON-parses the FINAL line.  Round 2's
    # record was lost because the one line carried a 47-entry "extra"
    # dict and outgrew the driver's tail window (VERDICT r2, defect #1).
    # Fix: extras go to a side file + their own EARLIER stdout line; the
    # final line is the short headline dict only (r1/r2-comparable).
    # interleaved probe sample #3: end of the extras pass
    noise_end = round(_median(_noise_probe() for _ in range(3)), 3)

    # full rep-level record (round 9): every wall time behind every
    # min/median above, in execution order — any past or future
    # estimator over <=3 reps is recomputable from this file
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_REPS.json"), "w") as fh:
            json.dump({"headline_reps": headline_reps, "reps": reps,
                       "noise_probe": {"start": noise_ref,
                                       "mid": noise_mid,
                                       "end": noise_end},
                       "rep_times": rep_record, "sf": sf_val}, fh)
    except OSError:
        pass

    extra_payload = {"metric": "extra_queries_total",
                     "value": round(sum(extra.values()), 3),
                     "unit": "sec", "queries": extra, "sf": sf_val}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_EXTRA.json"), "w") as fh:
            json.dump(extra_payload, fh)
    except OSError:
        pass  # read-only checkout: the stdout line below still carries it
    print(json.dumps(extra_payload))

    # ANN index build/serve split (VERDICT r6 #1): the inline topk_*
    # timings above fold index construction into every call, which
    # misstates serving cost — in production the index is built once
    # and served many times.  This additive line times the two phases
    # separately with the SAME hyperparameters as the
    # sim_topk_ivfpq_rerank / sim_topk_sq8 rows: build = train + encode
    # + materialize parquet, serve = best-of-reps query against the
    # loaded artifact (candidates never rescanned — see
    # tests/test_ann_index.py).  Printed before the final line like
    # every additive metric.
    from pyspark.sql import functions as _Fq

    from vexere_lakehouse_pipeline_spark.catalog import load_table as _lt
    from vexere_lakehouse_pipeline_spark.operators import ann_index as _ai
    from vexere_lakehouse_pipeline_spark.operators import similarity as _sim
    from vexere_lakehouse_pipeline_spark.plans.star_ml import (  # noqa: E402
        _IVFPQ_NCENT, _IVFPQ_NPROBE, _IVFPQ_RR_SHORTLIST,
        _PQ_DSUB, _PQ_KSUB, _PQ_M,
    )

    ann_split: dict[str, float] = {}
    emb = _lt(spark, sf_dir, "embeddings")
    q10 = emb.filter(_Fq.col("vec_id") < 10)
    for kind, build_kw, serve_fn in (
        (
            "ivfpq",
            dict(n_centroids=_IVFPQ_NCENT, m=_PQ_M, ksub=_PQ_KSUB,
                 dsub=_PQ_DSUB, dim=64),
            lambda idx: _sim.topk_ivfpq_rerank(
                emb, q10, k=5, shortlist=_IVFPQ_RR_SHORTLIST,
                nprobe=_IVFPQ_NPROBE, index=idx),
        ),
        (
            "sq8",
            {},
            lambda idx: _sim.topk_sq8(emb, q10, k=5, index=idx),
        ),
    ):
        spark.catalog.clearCache()
        t0 = time.time()
        built = _ai.ann_index_build(emb, kind=kind, **build_kw)
        path = _ai.default_index_path(sf_dir, kind)
        _ai.ann_index_save(built, path)
        ann_split[f"{kind}_build_sec"] = round(time.time() - t0, 3)
        idx = _ai.ann_index_load(spark, path)
        serve_times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            force(serve_fn(idx))
            serve_times.append(time.time() - t0)
        ann_split[f"{kind}_serve_sec"] = round(min(serve_times), 3)
    print(json.dumps({"metric": "ann_index_split", **ann_split,
                      "sf": sf_val}))

    # Second headline set (VERDICT r3 #7): the heaviest REAL operators
    # were driver-invisible because the r1-frozen headline set predates
    # them — promote them on their OWN additive line so regressions in
    # the expensive paths show up round-over-round.  Timings are reused
    # from the extras pass (same best-of-reps estimator), so this line
    # costs nothing extra.  Printed BEFORE the final line: the driver
    # parses only the LAST stdout line, which stays the short
    # r1-comparable headline dict.
    headline2_names = [
        "dedup_semdedup_survivors",
        "corpus_final_training_set",
        "dedup_editdist_verify",
        # VERDICT r4 #7: the flagship 100 TB ANN code paths, promoted
        # from extras so regressions are driver-visible round-over-round
        "sim_topk_pq_adc",
        "sim_topk_ivfpq",
    ]
    headline2 = {
        name: (extra[name] if name in extra else time_query(name))
        for name in headline2_names
        if name in ALL_QUERIES
    }
    print(
        json.dumps(
            {
                "metric": "headline2_queries_total",
                "value": round(sum(headline2.values()), 3),
                "unit": "sec",
                "queries": headline2,
                "sf": sf_val,
            }
        )
    )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                # noise normalization (r5 #5): noise_ref_sec is the
                # median-of-3 of a FROZEN lineitem scan-agg; compare
                # rounds via value/noise_ref_sec (BENCH_DRIFT.md rule).
                # median = sum of per-query median-of-reps — diverges
                # from value (best-of-reps) under co-tenant load.
                "noise_ref_sec": noise_ref,
                "median": median_total,
                # round 9 (r8 verdict #4): interleaved probe re-reads
                # (within-run drift is now data, not adjudication),
                # the rep count, and the r1-r8 estimator recomputed
                # from this run's first two reps (BENCH_REPS.json has
                # every rep) — value stays min-of-headline_reps.
                "noise_mid_sec": noise_mid,
                "noise_end_sec": noise_end,
                "headline_reps": headline_reps,
                "value_legacy2": legacy2_total,
            }
        )
    )


if __name__ == "__main__":
    main()
