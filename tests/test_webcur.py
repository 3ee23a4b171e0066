"""Unit semantics for plans/webcur.py — PII scrub, HTML strip, Gopher
flags, domain curation (the sf0.001 oracle parity lives in
test_star_oracle.py; these pin the operator-level contracts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.plans import webcur

SF_DIR = "/root/testdata/sf0.001"


def test_scrub_pii_sequential_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and b@c.org here"),
            (2, "ip 10.0.0.1 phone 0123456789 end"),
            (3, "plain text only"),
            (4, None),
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in webcur.scrub_pii_report(df).collect()
    }
    assert rows[1]["n_emails"] == 2 and rows[1]["n_ips"] == 0
    assert "<EMAIL>" in rows[1]["scrubbed"] and "@" not in rows[1]["scrubbed"]
    assert rows[2]["n_ips"] == 1 and rows[2]["n_phones"] == 1
    assert rows[2]["scrubbed"] == "ip <IP> phone <PHONE> end"
    assert rows[3]["scrubbed"] == "plain text only"
    assert rows[4]["scrubbed"] is None  # null propagates, no crash


def test_scrub_pii_no_double_count(spark):
    # digits inside an email's host must not count as a phone; an IP
    # inside a URL-ish string redacts as IP only once
    df = spark.createDataFrame(
        [(1, "x 0123456789@host.com y")], "id long, text string"
    )
    r = webcur.scrub_pii_report(df).collect()[0]
    assert r["n_emails"] == 1 and r["n_phones"] == 0
    assert r["scrubbed"] == "x <EMAIL> y"


def test_html_to_text_strip_and_entities(spark):
    df = spark.createDataFrame(
        [(1, '<div  class="x">a &amp; b</div><br/>&lt;c&gt;')],
        "id long, html string",
    )
    out = df.select(webcur.html_to_text(F.col("html")).alias("t")).collect()
    assert out[0]["t"] == "a & b <c>"


def test_gopher_flags_pass_is_conjunction(spark):
    df = webcur.corpus_gopher_quality_flags(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        expect = (
            r["flag_word_count"]
            and r["flag_word_len"]
            and r["flag_alpha"]
            and r["flag_stop"]
        )
        assert r["pass"] == expect
    # the thresholds must actually split this corpus
    passes = {r["pass"] for r in rows}
    assert passes == {True, False}


def test_domain_curation_blocklist_and_counts(spark):
    df = webcur.corpus_domain_curation(spark, SF_DIR)
    rows = df.collect()
    blocked = {r["domain"] for r in rows if r["blocked"]}
    assert blocked <= set(webcur._BLOCKLIST)
    # every doc lands in exactly one domain
    total = sum(r["n_docs"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total == docs


def test_webcur_plans_stay_native(spark):
    for name in webcur.QUERIES:
        plan = webcur.QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_semdedup_survivor_is_component_min(spark):
    from vexere_lakehouse_pipeline_spark.operators.dedup import (
        semantic_dedup_survivors,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = semantic_dedup_survivors(emb, threshold=0.3).collect()
    assert len(out) == emb.count()
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r["component_id"], []).append(r)
    for comp, members in by_comp.items():
        ids = sorted(m["vec_id"] for m in members)
        assert comp == ids[0]  # canonical label is the min id
        survivors = [m for m in members if m["is_survivor"]]
        assert len(survivors) == 1 and survivors[0]["vec_id"] == ids[0]


def test_semdedup_kmeans_blocked_path(spark):
    """The scale path: block on TRAINED k-means clusters instead of the
    label column — shape invariants only (centroid floats are not
    oracle-stable)."""
    from vexere_lakehouse_pipeline_spark.operators.dedup import (
        semantic_dedup_survivors,
    )
    from vexere_lakehouse_pipeline_spark.operators.similarity import (
        kmeans_assign,
        train_kmeans,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = train_kmeans(emb, k=4, iters=2)
    blocked = kmeans_assign(emb, cents).withColumnRenamed("cluster", "kblock")
    out = semantic_dedup_survivors(
        blocked, block_col="kblock", threshold=0.3
    )
    rows = out.collect()
    assert len(rows) == emb.count()
    n_survivors = sum(1 for r in rows if r["is_survivor"])
    assert 0 < n_survivors <= len(rows)
    # survivors are exactly the distinct component ids
    assert n_survivors == len({r["component_id"] for r in rows})


def test_sentence_dedup_reassembly(spark):
    out = webcur.QUERIES["corpus_sentence_dedup"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    joined = {r["doc_id"]: r for r in out.collect()}
    for d in docs.collect():
        r = joined[d["doc_id"]]
        assert 0 <= r["n_dropped"] <= r["n_sents"]
        if r["n_dropped"] == 0:
            # nothing dropped -> clean text is exactly the tokenized doc
            toks = [t for t in __import__("re").split(
                r"[^\w]+", d["text"].lower()) if t]
            assert r["clean_text"].split(" ") == toks


def test_apply_cdc_changes_semantics(spark):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        apply_cdc_changes,
    )

    base = spark.createDataFrame(
        [(1, "a", -1), (2, "b", -1), (3, "c", -1)],
        "k long, v string, seq long",
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", 10, "U"),   # upsert over base
            (1, "a2", 20, "U"),   # later seq wins
            (2, "xx", 5, "D"),    # delete
            (4, "d", 7, "U"),     # insert of a new key
            (5, "e", 1, "U"),
            (5, "e2", 2, "D"),    # insert then delete -> absent
        ],
        "k long, v string, seq long, op string",
    )
    out = {r["k"]: r for r in apply_cdc_changes(
        base, changes, keys=["k"], seq_col="seq").collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["v"] == "a2" and out[1]["seq"] == 20
    assert out[3]["v"] == "c" and out[3]["seq"] == -1  # untouched
    assert out[4]["v"] == "d"


def test_wav_roundtrip_and_quarantine_contract():
    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        encode_wav,
        wav_decode,
    )

    samples = [(i * 37) % 256 for i in range(100)]
    rate, ch, bits, n, dur, s, peak = wav_decode(encode_wav(8000, samples))
    assert (rate, ch, bits, n) == (8000, 1, 8, 100)
    assert dur == 100 * 1000 // 8000
    assert s == sum(samples) and peak == max(samples)
    assert wav_decode(b"") == (0,) * 7  # null-payload contract
    import pytest as _pytest
    with _pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxWAVE")  # truncated: no fmt/data
    with _pytest.raises(ValueError):
        wav_decode(b"not audio at all....................................")


def test_normalize_unicode_chain(spark):
    from vexere_lakehouse_pipeline_spark.functions.text import (
        normalize_unicode,
    )

    df = spark.createDataFrame(
        [(1, "﻿“q” – a…​"),
         (2, "‘x’ y"),
         (3, None)],
        "id long, t string",
    )
    out = {r["id"]: r["c"] for r in df.select(
        "id", normalize_unicode("t").alias("c")).collect()}
    assert out[1] == '"q" - a...'
    assert out[2] == "'x' y"
    assert out[3] is None


def test_embedding_block_cap_splits_oversized(spark):
    from vexere_lakehouse_pipeline_spark.operators.dedup import (
        embedding_neardup_pairs,
        semantic_dedup_survivors,
    )

    # one giant block (0) and one small block (1)
    rows = [(i, [1.0, 0.0], 0) for i in range(50)] + [
        (100, [0.0, 1.0], 1), (101, [0.0, 1.0], 1)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    stats: dict = {}
    pairs = embedding_neardup_pairs(
        emb, threshold=0.9, max_block_size=10, stats=stats
    )
    got = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    assert (100, 101) in got  # small block untouched
    # oversized block is SPLIT 5 ways, not dropped: pairs exist within
    # sub-blocks but never across (r2 VERDICT: drop silently killed
    # recall here)
    giant = {(a, b) for a, b in got if a < 50 and b < 50}
    assert giant and len(giant) < 50 * 49 // 2
    census = stats["oversized_blocks"].collect()
    assert [(r["block"], r["bucket_size"], r["n_splits"])
            for r in census] == [(0, 50, 5)]
    out = semantic_dedup_survivors(emb, threshold=0.9, max_block_size=10)
    rows_out = {r["vec_id"]: r for r in out.collect()}
    assert len(rows_out) == 52  # every vector still present
    # split block -> ~one survivor per sub-block (5), not 50 singletons
    n_surv_giant = sum(1 for i in range(50) if rows_out[i]["is_survivor"])
    assert n_surv_giant == 5
    assert rows_out[100]["is_survivor"] and not rows_out[101]["is_survivor"]
    # uncapped: the giant block pairs up
    assert embedding_neardup_pairs(
        emb, threshold=0.9, max_block_size=None).count() == 50 * 49 // 2 + 1


def test_apply_cdc_null_op_upserts(spark):
    from vexere_lakehouse_pipeline_spark.operators.incremental import (
        apply_cdc_changes,
    )

    base = spark.createDataFrame([(7, "a", -1)], "k long, v string, seq long")
    changes = spark.createDataFrame(
        [(7, "x", 5, None)], "k long, v string, seq long, op string"
    )
    got = apply_cdc_changes(base, changes, keys=["k"], seq_col="seq").collect()
    # NULL op is "not the delete op": the key must upsert, not vanish
    assert [(r["k"], r["v"]) for r in got] == [(7, "x")]


def test_wav_truncated_fmt_raises_valueerror():
    import struct

    import pytest as _pytest

    from vexere_lakehouse_pipeline_spark.operators.multimodal import (
        wav_decode,
    )

    # fmt chunk declares 16 bytes but payload ends after 8
    payload = (
        struct.pack("<4sI4s", b"RIFF", 100, b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + b"\x01\x00\x01\x00\x40\x1f\x00\x00"  # 8 of 16 declared bytes
    )
    with _pytest.raises(ValueError):
        wav_decode(payload)


def test_script_mix_counts_and_dominance(spark):
    out = webcur.QUERIES["text_script_mix"](spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        assert 1 <= r["n_han"] <= 4  # every doc got a 1-4 char Han run
        assert (r["n_cyrillic"] >= 1) == (r["doc_id"] % 2 == 0)
        assert r["dominant_script"] in ("latin", "han", "cyrillic")
        # ASCII word salad dominates by construction
        assert r["dominant_script"] == "latin"


def test_script_mix_null_text_yields_null_label(spark):
    from vexere_lakehouse_pipeline_spark.plans.webcur import (
        _script_mix_spark,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    mixed = df.select("doc_id", _script_mix_spark().alias("mixed"))
    assert mixed.collect()[0]["mixed"] is None  # concat propagates null


def test_repetition_scores_null_text_matches_oracle(spark, tmp_path):
    """Code-review r3: NULL text must yield zero-count rows on BOTH
    engines (bare size(NULL array) is -1 under ansi-off Spark, NULL in
    DuckDB — either diverges the gate)."""
    import duckdb

    from vexere_lakehouse_pipeline_spark.plans.webcur import (
        ORACLE_SQL,
        QUERIES,
    )

    rows = [(1, None), (2, "alpha beta gamma")]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = sorted(
        tuple(r)
        for r in QUERIES["text_repetition_scores"](
            spark, str(tmp_path)
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES"
        " (1, CAST(NULL AS VARCHAR)), (2, 'alpha beta gamma'))"
        " t(doc_id, text)"
    )
    want = sorted(tuple(r) for r in con.sql(
        ORACLE_SQL["text_repetition_scores"]
    ).fetchall())
    assert got == want
    assert got[0] == (1, 0, 0, 0, 0, 0, 0)  # NULL text -> zeros
