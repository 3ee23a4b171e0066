"""Degenerate-input robustness: every operator family must handle an
EMPTY frame without crashing (schema-correct empty output) — at 100 TB
a partition-pruned read or a quiet day produces exactly this."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.functions.text import (
    detect_language,
    document_fingerprint,
    quality_features,
)
from vexere_lakehouse_pipeline_spark.operators import dedup, sampling, similarity
from vexere_lakehouse_pipeline_spark.operators.joins import asof_join
from vexere_lakehouse_pipeline_spark.operators.quality import check, quarantine


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_dedup_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_duplicate_groups(docs).count() == 0
    assert dedup.lsh_candidate_pairs(docs).count() == 0
    assert dedup.simhash16(docs).count() == 0
    assert dedup.contamination_flags(docs, docs).count() == 0


def test_text_functions_on_empty_and_null(spark):
    rows = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    out = rows.select(
        detect_language("text").alias("lang"),
        quality_features("text").alias("q"),
        document_fingerprint("text").alias("fp"),
    ).collect()
    assert len(out) == 2  # no crash; nulls propagate


def test_sampling_on_empty(spark):
    docs = _empty_docs(spark)
    assert sampling.hash_sample(docs, "doc_id", 0.5).count() == 0
    assert (
        docs.withColumn(
            "split", sampling.split_column("doc_id", {"a": 0.5, "b": 0.5})
        ).count()
        == 0
    )
    mixed = sampling.weighted_mixture({"x": (docs, 1.5)}, key="doc_id")
    assert mixed.count() == 0 and "mix_source" in mixed.columns


def test_asof_join_empty_right_keeps_left(spark):
    left = spark.createDataFrame(
        [(1, 10, 100)], "k long, ts long, event long"
    )
    right = spark.createDataFrame([], "k long, rts long, rid long")
    out = asof_join(left, right, "k", "ts", "rts", ["rid"]).collect()
    assert len(out) == 1 and out[0]["rid"] is None


def test_quality_on_empty(spark):
    docs = _empty_docs(spark)
    report = check(docs, {"has_text": F.col("text").isNotNull()})
    assert report.first()["n_violations"] == 0
    good, bad = quarantine(docs, {"has_text": F.col("text").isNotNull()})
    assert good.count() == 0 and bad.count() == 0


def test_similarity_on_empty_queries(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("label", T.IntegerType()),
        ]),
    )
    queries = emb.filter(F.col("vec_id") < 0)  # empty
    assert similarity.topk_bruteforce(emb, queries, k=3).count() == 0


def test_governance_ops_on_empty(spark):
    from vexere_lakehouse_pipeline_spark.operators import graph, privacy

    docs = _empty_docs(spark)
    assert dedup.survivor_selection(docs).count() == 0
    assert dedup.editdist_verify_pairs(docs).count() == 0

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.knn_graph(emb, strategy="exact").count() == 0
    assert similarity.knn_graph(emb, strategy="lsh").count() == 0

    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([], "vec_id long")
    assert graph.pagerank_fixed_point(edges, nodes).count() == 0

    cust = spark.createDataFrame([], "seg string, nat int")
    rep = privacy.k_anonymity_report(cust, ["seg", "nat"])
    assert rep.count() == 0
    assert set(rep.columns) == {"seg", "nat", "group_size", "meets_k"}


def test_forget_and_diff_on_empty(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        forget_keys,
        upsert,
    )

    path = str(tmp_path / "t")
    upsert(spark.createDataFrame([(1, "a")], "id int, v string"), path, ["id"])
    # empty erase set: no-op, zero count
    empty_keys = spark.createDataFrame([], "id int")
    assert forget_keys(spark, path, empty_keys, ["id"]) == 0


def test_new_dedup_and_sampling_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert dedup.simhash_near_pairs(docs).count() == 0
    assert dedup.containment_pairs(docs).count() == 0
    assert dedup.overlap_counts(
        spark.createDataFrame([], "doc_a long, doc_b long"),
        spark.createDataFrame([], "doc_id long, shingle string"),
    ).count() == 0
    kept = sampling.weighted_hash_sample(
        docs, key="doc_id", weight="n_chars", max_weight=100
    )
    assert kept.count() == 0


def test_split_leakage_and_nucleus_on_empty(spark):
    from vexere_lakehouse_pipeline_spark.plans.corpus import split_leakage

    docs = _empty_docs(spark)
    assert split_leakage(docs).count() == 0


def test_webcur_and_cdc_ops_on_empty(spark):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        apply_cdc_changes,
    )
    from vexere_lakehouse_pipeline_spark.plans.webcur import (
        html_to_text,
        scrub_pii_report,
    )

    docs = _empty_docs(spark)
    assert scrub_pii_report(docs).count() == 0
    assert docs.select(html_to_text(F.col("text")).alias("t")).count() == 0

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    out = dedup.semantic_dedup_survivors(emb)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "component_id", "is_survivor"}

    base = spark.createDataFrame([(1, "a", -1)], "k long, v string, seq long")
    empty_ch = spark.createDataFrame(
        [], "k long, v string, seq long, op string"
    )
    # empty change stream -> base passes through unchanged
    got = apply_cdc_changes(base, empty_ch, keys=["k"], seq_col="seq").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "a")]
    # empty base -> only surviving changes
    empty_base = spark.createDataFrame([], "k long, v string, seq long")
    ch = spark.createDataFrame(
        [(2, "b", 1, "U"), (3, "c", 1, "D")], "k long, v string, seq long, op string"
    )
    got2 = apply_cdc_changes(empty_base, ch, keys=["k"], seq_col="seq").collect()
    assert [(r["k"], r["v"]) for r in got2] == [(2, "b")]


def test_round3_ops_on_empty(spark, tmp_path):
    """Round-3 operators on empty frames: schema-correct empty output,
    no crashes (partition-pruned reads produce exactly this)."""
    import pandas as pd

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        extract_audio_stats,
        extract_image_stats,
    )
    from vexere_lakehouse_pipeline_spark.plans import mining, star_ext, webcur
    from vexere_lakehouse_pipeline_spark.streaming.ingest import (
        watermark_accepted_flags,
    )

    docs = _empty_docs(spark)
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    # BPE trainer: no tokens -> empty merge table with the right schema
    out = mining.QUERIES["corpus_bpe_train_k"](spark, sf)
    assert out.count() == 0
    assert out.columns == ["step", "p1", "p2", "n"]
    # repetition scores: empty in, empty out
    assert webcur.QUERIES["text_repetition_scores"](spark, sf).count() == 0
    # watermark twin flags on an empty event frame
    ev = spark.createDataFrame(
        [], "event_id long, event_type string, ts timestamp,"
            " value double, arrival_ts timestamp"
    )
    assert watermark_accepted_flags(ev).count() == 0
    # media stats on empty media frames
    media = spark.createDataFrame([], "media_id long, payload binary")
    assert extract_audio_stats(media).count() == 0
    assert extract_image_stats(media).count() == 0
    # band-key store round trip on an empty corpus
    store = str(tmp_path / "bands")
    dedup.materialize_band_keys(docs, store)
    stored = spark.read.parquet(store)
    batch = _empty_docs(spark)
    assert dedup.incremental_pairs_vs_stored(batch, stored).count() == 0
    # arrow cosine engine on an empty embedding frame
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    assert dedup.embedding_neardup_pairs_arrow(emb).count() == 0
    assert dedup.semantic_dedup_auto(emb).count() == 0
