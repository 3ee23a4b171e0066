"""ANN index build/serve separation (operators/ann_index.py).

The contract under test: an index built ONCE and materialized as
parquet serves every later top-k call with output HASH-IDENTICAL to
the inline (train+encode on the fly) path, while the serve itself
never scans the candidate corpus.  The oracle rows
sim_topk_ivfpq_rerank_prebuilt / sim_topk_sq8_prebuilt pin the same
identity against DuckDB at sf0.01; these tests pin it row-for-row
(exact doubles, not rounded) on sf0.001 plus the serve-side
guarantees the oracle can't see (candidates untouched, build-once /
serve-many with different serve-time knobs, save/load meta adoption).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.catalog import load_table
from vexere_lakehouse_pipeline_spark.operators import ann_index, similarity

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def _rows(df):
    """Fully-ordered plain tuples — exact equality, no rounding."""
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def ivfpq_idx(spark, tmp_path_factory):
    """Build+save+load ONCE for the module — every ivfpq test below is
    a 'serve-many' consumer of this single artifact."""
    path = str(tmp_path_factory.mktemp("ann") / "ivfpq")
    built = ann_index.ann_index_build(_emb(spark), kind="ivfpq",
                                      n_centroids=16, m=8, ksub=16)
    ann_index.ann_index_save(built, path)
    return ann_index.ann_index_load(spark, path)


@pytest.fixture(scope="module")
def sq8_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "sq8")
    built = ann_index.ann_index_build(_emb(spark), kind="sq8")
    ann_index.ann_index_save(built, path)
    return ann_index.ann_index_load(spark, path)


def test_save_load_roundtrip_meta_and_parts(spark, ivfpq_idx, sq8_idx):
    assert ivfpq_idx.kind == "ivfpq"
    assert ivfpq_idx.meta["n_centroids"] == 16
    assert ivfpq_idx.meta["m"] == 8 and ivfpq_idx.meta["ksub"] == 16
    assert set(ivfpq_idx.parts) == {"centroids", "codebooks", "coded"}
    assert ivfpq_idx.parts["centroids"].count() == 16
    # one coded row per non-zero corpus vector, carrying its list id
    coded = ivfpq_idx.parts["coded"]
    assert coded.columns == ["vec_id", "cid", "codes"]
    assert coded.count() == _emb(spark).count()
    assert sq8_idx.kind == "sq8"
    assert set(sq8_idx.parts) == {"params", "codes"}
    assert sq8_idx.parts["params"].count() == 64  # one row per dim


def test_ivfpq_rerank_prebuilt_equals_inline(spark, ivfpq_idx):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=5, shortlist=20, n_centroids=16, nprobe=4, m=8, ksub=16)
    inline = similarity.topk_ivfpq_rerank(emb, q, **kw)
    served = similarity.topk_ivfpq_rerank(emb, q, k=5, shortlist=20,
                                          nprobe=4, index=ivfpq_idx)
    assert _rows(served) == _rows(inline)


def test_pq_adc_prebuilt_equals_inline(spark, ivfpq_idx):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    inline = similarity.topk_pq_adc(emb, q, k=5, m=8, ksub=16)
    served = similarity.topk_pq_adc(emb, q, k=5, index=ivfpq_idx)
    assert _rows(served) == _rows(inline)


def test_sq8_prebuilt_equals_inline(spark, sq8_idx):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    inline = similarity.topk_sq8(emb, q, k=5)
    served = similarity.topk_sq8(emb, q, k=5, index=sq8_idx)
    assert _rows(served) == _rows(inline)


def test_serve_never_scans_candidates(spark, ivfpq_idx, sq8_idx):
    """The serving guarantee the bench split measures: with a prebuilt
    index, the candidate table is NOT an input to the tier-1 scan —
    an EMPTY candidates frame must serve identically, because
    centroids/codes come from the artifact."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    empty = emb.limit(0)
    got = similarity.topk_ivfpq(empty, q, k=5, nprobe=4, index=ivfpq_idx)
    want = similarity.topk_ivfpq(emb, q, k=5, n_centroids=16, nprobe=4,
                                 m=8, ksub=16)
    assert _rows(got) == _rows(want)
    got8 = similarity.topk_sq8(empty, q, k=5, index=sq8_idx)
    want8 = similarity.topk_sq8(emb, q, k=5)
    assert _rows(got8) == _rows(want8)


def test_serve_many_knobs_from_one_artifact(spark, ivfpq_idx):
    """Serve-time knobs (k, nprobe) stay free: one artifact answers
    both a shallow and a deep probe, each matching its inline twin."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    for k, nprobe in ((3, 2), (8, 16)):
        served = similarity.topk_ivfpq(emb, q, k=k, nprobe=nprobe,
                                       index=ivfpq_idx)
        inline = similarity.topk_ivfpq(emb, q, k=k, n_centroids=16,
                                       nprobe=nprobe, m=8, ksub=16)
        assert _rows(served) == _rows(inline)


def test_kind_mismatch_raises(spark, ivfpq_idx, sq8_idx):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="ivfpq"):
        similarity.topk_ivfpq(emb, q, index=sq8_idx)
    with pytest.raises(ValueError, match="sq8"):
        similarity.topk_sq8(emb, q, index=ivfpq_idx)
    with pytest.raises(ValueError, match="sq8"):
        similarity.topk_pq_adc(emb, q, index=sq8_idx)
    with pytest.raises(ValueError, match="unknown"):
        ann_index.ann_index_build(emb, kind="hnsw")


def test_saved_layout_is_plain_parquet(spark, tmp_path):
    """The artifact is engine-agnostic: plain parquet subdirs + a JSON
    meta sidecar (Delta lands via the same layout per the runbook)."""
    path = str(tmp_path / "idx")
    built = ann_index.ann_index_build(_emb(spark), kind="sq8")
    ann_index.ann_index_save(built, path)
    assert os.path.isfile(os.path.join(path, ann_index.META_FILE))
    for part in ("params", "codes"):
        assert any(
            f.endswith(".parquet")
            for f in os.listdir(os.path.join(path, part))
        )
    # reopen with a plain reader outside our loader: parquet is parquet
    assert spark.read.parquet(os.path.join(path, "codes")).count() > 0


@pytest.fixture(scope="module")
def jl_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "jl")
    built = ann_index.ann_index_build(_emb(spark), kind="jl", d_out=32)
    ann_index.ann_index_save(built, path)
    return ann_index.ann_index_load(spark, path)


def test_jl_prebuilt_equals_inline_and_never_scans(spark, jl_idx):
    """JL index: the artifact is just the coded corpus (no trained
    state — the sign matrix is hash-derived), so prebuilt ≡ inline and
    the serve works from an EMPTY candidates frame; the serve also
    ADOPTS the artifact's d_out over the caller's."""
    assert jl_idx.kind == "jl" and jl_idx.meta["d_out"] == 32
    assert set(jl_idx.parts) == {"codes"}
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    inline = similarity.topk_jl(emb, q, k=5, d_out=32)
    served = similarity.topk_jl(emb, q, k=5, index=jl_idx)
    assert _rows(served) == _rows(inline)
    # candidates never scanned at serve time
    empty = emb.limit(0)
    got = similarity.topk_jl(empty, q, k=5, index=jl_idx)
    assert _rows(got) == _rows(inline)
    # the caller's d_out is overridden by the artifact's (a mismatched
    # query-side projection would silently zero every dot product)
    adopted = similarity.topk_jl(empty, q, k=5, d_out=8, index=jl_idx)
    assert _rows(adopted) == _rows(inline)
    # rerank composes: tier 1 from the artifact, tier 2 late-fetches
    # floats from candidates (which ARE needed there)
    rr_inline = similarity.topk_jl_rerank(emb, q, k=5, shortlist=20,
                                          d_out=32)
    rr_served = similarity.topk_jl_rerank(emb, q, k=5, shortlist=20,
                                          index=jl_idx)
    assert _rows(rr_served) == _rows(rr_inline)
    with pytest.raises(ValueError, match="need a jl index"):
        similarity.topk_jl(emb, q, k=5, index=ann_index.AnnIndex(
            "sq8", {"kind": "sq8"}, {}))


# ---------------------------------------------------------------------------
# Round 8: the completed ladder — every remaining index kind builds,
# round-trips, serves hash-identically, and never scans candidates at
# the indexed tiers; plus the incremental-append contract.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ladder_idx(spark, tmp_path_factory):
    """One build+save+load per new kind for the module."""
    root = tmp_path_factory.mktemp("ladder")
    emb = _emb(spark)
    out = {}
    for kind, kw in (
        ("hamming", {"n_bits": 63}),
        ("int8", {}),
        ("cascade", {"n_bits": 63}),
        ("matryoshka", {"dims": 16}),
        ("ivfpq_residual", {"n_centroids": 16, "m": 8, "ksub": 16}),
    ):
        built = ann_index.ann_index_build(emb, kind=kind, **kw)
        path = str(root / kind)
        ann_index.ann_index_save(built, path)
        out[kind] = ann_index.ann_index_load(spark, path)
    return out


def test_ladder_prebuilt_equals_inline_and_never_scans(spark, ladder_idx):
    """For every new kind: serve ≡ inline row-for-row (exact values),
    and the serve works from an EMPTY candidates frame at the indexed
    tiers — the corpus is never re-encoded."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    empty = emb.limit(0)
    cases = [
        ("hamming", similarity.topk_hamming, {}, {"n_bits": 63}, True),
        ("int8", similarity.topk_int8, {}, {}, True),
        ("matryoshka", similarity.topk_truncated, {}, {"dims": 16}, True),
        ("ivfpq_residual", similarity.topk_ivfpq_residual,
         {"nprobe": 4}, {"n_centroids": 16, "m": 8, "ksub": 16,
                         "nprobe": 4}, True),
        # cascade tier-3 late-fetches floats from candidates, so the
        # empty-candidates serve is legitimately empty (like rerank)
        ("cascade", similarity.topk_cascade,
         {"shortlist1": 30, "shortlist2": 10},
         {"shortlist1": 30, "shortlist2": 10, "n_bits": 63}, False),
    ]
    for kind, topk, serve_kw, inline_kw, empty_serves in cases:
        idx = ladder_idx[kind]
        inline = _rows(topk(emb, q, k=5, **inline_kw))
        served = _rows(topk(emb, q, k=5, index=idx, **serve_kw))
        assert served == inline, kind
        if empty_serves:
            got = _rows(topk(empty, q, k=5, index=idx, **serve_kw))
            assert got == inline, f"{kind}: serve scanned candidates"


def test_ladder_rerank_and_kind_mismatch(spark, ladder_idx):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    inline = _rows(similarity.topk_hamming_rerank(
        emb, q, k=5, shortlist=20, n_bits=63))
    served = _rows(similarity.topk_hamming_rerank(
        emb, q, k=5, shortlist=20, index=ladder_idx["hamming"]))
    assert served == inline
    with pytest.raises(ValueError, match="hamming"):
        similarity.topk_hamming(emb, q, index=ladder_idx["int8"])
    with pytest.raises(ValueError, match="int8"):
        similarity.topk_int8(emb, q, index=ladder_idx["hamming"])
    with pytest.raises(ValueError, match="cascade"):
        similarity.topk_cascade(emb, q, index=ladder_idx["int8"])
    with pytest.raises(ValueError, match="matryoshka"):
        similarity.topk_truncated(emb, q, index=ladder_idx["int8"])
    with pytest.raises(ValueError, match="ivfpq_residual"):
        similarity.topk_ivfpq_residual(emb, q, index=ladder_idx["hamming"])


def _split(emb):
    return (emb.filter(F.col("vec_id") % 10 != 7),
            emb.filter(F.col("vec_id") % 10 == 7))


def test_append_equals_pinned_full_build_sq8(spark):
    """append(build(A), B) ≡ build(A∪B) with pinned params — row-for-
    row at the serve level, on a split where params(A) genuinely
    differ from params(A∪B) (so the pin is load-bearing)."""
    emb = _emb(spark)
    a, b = _split(emb)
    q = emb.filter(F.col("vec_id") < 5)
    built_a = ann_index.ann_index_build(a, kind="sq8")
    appended = ann_index.ann_index_append(built_a, b)
    pinned_full = ann_index.ann_index_build(
        emb, kind="sq8", params=built_a.parts["params"])
    empty = emb.limit(0)  # serve never scans candidates, appended or not
    got = _rows(similarity.topk_sq8(empty, q, k=5, index=appended))
    want = _rows(similarity.topk_sq8(empty, q, k=5, index=pinned_full))
    assert got == want
    # the pin is load-bearing: an UNpinned rebuild over A∪B differs
    unpinned = _rows(similarity.topk_sq8(emb, q, k=5))
    assert got != unpinned
    # row-level coverage grew to the full corpus
    assert appended.parts["codes"].count() == emb.count()


def test_append_equals_pinned_full_build_ivfpq(spark):
    """Same contract for the trained-state-heavy kind: centroids AND
    codebooks pinned from A; new rows assign + encode against them."""
    emb = _emb(spark)
    a, b = _split(emb)
    q = emb.filter(F.col("vec_id") < 5)
    built_a = ann_index.ann_index_build(a, kind="ivfpq", n_centroids=16,
                                        m=8, ksub=16)
    appended = ann_index.ann_index_append(built_a, b)
    pinned_full = ann_index.ann_index_build(
        emb, kind="ivfpq", n_centroids=16, m=8, ksub=16,
        centroids=built_a.parts["centroids"],
        codebooks=built_a.parts["codebooks"])
    empty = emb.limit(0)
    got = _rows(similarity.topk_ivfpq(empty, q, k=5, nprobe=4,
                                      index=appended))
    want = _rows(similarity.topk_ivfpq(empty, q, k=5, nprobe=4,
                                       index=pinned_full))
    assert got == want
    assert appended.parts["coded"].count() == emb.count()


def test_append_drift_caveat_documented_and_real(spark):
    """The drift caveat is REAL, not boilerplate: after appending B,
    the stored trained state still reflects A — an appended ivfpq
    index and a from-scratch rebuild over A∪B disagree (different
    centroids ⇒ different lists/codes), which is exactly why the
    docstring prescribes rebuild thresholds.  And the caveat is
    actually written down."""
    emb = _emb(spark)
    a, b = _split(emb)
    q = emb.filter(F.col("vec_id") < 5)
    appended = ann_index.ann_index_append(
        ann_index.ann_index_build(a, kind="ivfpq", n_centroids=16,
                                  m=8, ksub=16),
        b,
    )
    rebuilt = ann_index.ann_index_build(emb, kind="ivfpq", n_centroids=16,
                                        m=8, ksub=16)
    empty = emb.limit(0)
    got = _rows(similarity.topk_ivfpq(empty, q, k=5, nprobe=4,
                                      index=appended))
    fresh = _rows(similarity.topk_ivfpq(empty, q, k=5, nprobe=4,
                                        index=rebuilt))
    assert got != fresh  # drift exists ⇒ the rebuild guidance matters
    doc = ann_index.ann_index_append.__doc__
    assert "rebuild" in doc and "drift" in doc.lower()


def test_append_stateless_kind_is_exact_forever(spark):
    """Stateless kinds (hamming here) have no trained state, so append
    ≡ full rebuild EXACTLY — no pin needed, no drift ever."""
    emb = _emb(spark)
    a, b = _split(emb)
    q = emb.filter(F.col("vec_id") < 5)
    appended = ann_index.ann_index_append(
        ann_index.ann_index_build(a, kind="hamming", n_bits=63), b)
    rebuilt = ann_index.ann_index_build(emb, kind="hamming", n_bits=63)
    empty = emb.limit(0)
    got = _rows(similarity.topk_hamming(empty, q, k=5, index=appended))
    fresh = _rows(similarity.topk_hamming(empty, q, k=5, index=rebuilt))
    assert got == fresh


def test_append_equals_pinned_full_build_ivfpq_residual(spark):
    """The residual kind's append: centroids AND residual codebooks
    pinned from A; B's rows assign, form residuals against A's
    centroids, and encode with A's codebooks."""
    emb = _emb(spark)
    a, b = _split(emb)
    q = emb.filter(F.col("vec_id") < 5)
    kw = dict(n_centroids=16, m=8, ksub=16)
    built_a = ann_index.ann_index_build(a, kind="ivfpq_residual", **kw)
    appended = ann_index.ann_index_append(built_a, b)
    pinned_full = ann_index.ann_index_build(
        emb, kind="ivfpq_residual", **kw,
        centroids=built_a.parts["centroids"],
        codebooks=built_a.parts["codebooks"])
    empty = emb.limit(0)
    got = _rows(similarity.topk_ivfpq_residual(empty, q, k=5, nprobe=4,
                                               index=appended))
    want = _rows(similarity.topk_ivfpq_residual(empty, q, k=5, nprobe=4,
                                                index=pinned_full))
    assert got == want
    assert appended.parts["coded"].count() == emb.count()


def test_filtered_view_sq8_prefilter_semantics(spark, sq8_idx):
    """ann_index_filter: scoped serving from the full-corpus artifact.
    (a) pre-filter, not post-filter — results equal an inline build
    whose CANDIDATES are filtered but whose params are the FULL
    corpus; (b) only allowed ids appear; (c) the scope can return a
    full k even when the global top-k is dominated by out-of-scope
    rows (the bug post-filtering would introduce)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    allowed = emb.filter(F.col("label") <= 2)
    fidx = ann_index.ann_index_filter(sq8_idx, allowed)
    served = similarity.topk_sq8(emb.limit(0), q, k=5, index=fidx)
    # inline twin: full-corpus params, filtered candidate codes
    inline = similarity.topk_sq8(
        allowed, q, k=5, params=sq8_idx.parts["params"])
    assert _rows(served) == _rows(inline)
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    got = served.collect()
    assert got and all(r.vec_id in allowed_ids for r in got)
    # every query keeps a full k inside the scope (sf0.001 has > k
    # allowed rows) — post-filtering the global top-k could not
    per_q = {}
    for r in got:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q.values()) == {5}


def test_filtered_view_keeps_trained_state_and_kind(spark, ivfpq_idx):
    """Multi-part kinds: only ROW parts are filtered; trained state
    (centroids/codebooks) is shared untouched — one index, many
    scopes."""
    emb = _emb(spark)
    allowed = emb.filter(F.col("label") <= 2)
    fidx = ann_index.ann_index_filter(ivfpq_idx, allowed)
    assert fidx.kind == "ivfpq" and fidx.meta == ivfpq_idx.meta
    assert fidx.parts["centroids"] is ivfpq_idx.parts["centroids"]
    assert fidx.parts["codebooks"] is ivfpq_idx.parts["codebooks"]
    n_allowed = allowed.count()
    assert fidx.parts["coded"].count() == n_allowed
    # and it serves through the same plumbing
    q = emb.filter(F.col("vec_id") < 5)
    served = similarity.topk_ivfpq(emb.limit(0), q, k=5, nprobe=4,
                                   index=fidx)
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    got = served.collect()
    assert got and all(r.vec_id in allowed_ids for r in got)


def test_filtered_ivf_shortfall_and_nprobe_recovery(spark, ivfpq_idx):
    """The production caveat of pre-filtered IVF: a selective scope
    empties probed lists, so a query can come back with FEWER than k
    answers even though the scope holds >= k vectors — the fix is a
    bigger probe budget (vector stores auto-raise nprobe under
    filters), NOT post-filtering.  Pinned: full-list probing restores
    k for every query and returns only in-scope ids."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    # a selective scope: ~10% of the corpus
    allowed = emb.filter(F.col("label") == 4)
    n_allowed = allowed.count()
    assert n_allowed >= 5  # the scope itself could satisfy k
    fidx = ann_index.ann_index_filter(ivfpq_idx, allowed)
    got_small = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=2, index=fidx).collect()
    per_q = {}
    for r in got_small:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    # with 16 lists and ~10% of rows in scope, a 2-list probe budget
    # cannot guarantee 5 in-scope hits for every query — assert a
    # STRICT shortfall (the fixture is deterministic), so the caveat
    # and the nprobe-recovery contrast below are both load-bearing
    assert min(per_q.values() or [0]) < 5
    got_full = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=16, index=fidx).collect()
    per_q_full = {}
    for r in got_full:
        per_q_full[r.query_id] = per_q_full.get(r.query_id, 0) + 1
    assert set(per_q_full.values()) == {5}
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    assert all(r.vec_id in allowed_ids for r in got_full)


def test_adaptive_probe_recovers_filtered_shortfall(spark, ivfpq_idx):
    """min_results=k (round-8 verdict #1): in EXACTLY the regime the
    shortfall test above constructs, the adaptive budget returns full
    k in-scope answers for every query while the fixed budget provably
    cannot — and it expands only as far as coverage requires (queries
    whose nprobe-prefix already covers k pay the fixed cost)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    allowed = emb.filter(F.col("label") == 4)
    fidx = ann_index.ann_index_filter(ivfpq_idx, allowed)
    fixed = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=2, index=fidx).collect()
    per_fixed = {}
    for r in fixed:
        per_fixed[r.query_id] = per_fixed.get(r.query_id, 0) + 1
    assert min(per_fixed.values() or [0]) < 5  # the regime is real
    adaptive = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=2, index=fidx,
        min_results=5).collect()
    per_ad = {}
    for r in adaptive:
        per_ad[r.query_id] = per_ad.get(r.query_id, 0) + 1
    assert set(per_ad.values()) == {5}
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    assert all(r.vec_id in allowed_ids for r in adaptive)


def test_adaptive_probe_identity_when_unfiltered(spark, ivfpq_idx):
    """No scope, no shortfall -> the adaptive budget floors at nprobe
    and the serve is BIT-IDENTICAL to the fixed budget (the unfiltered
    path is unchanged by the feature)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    fixed = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=4, index=ivfpq_idx)
    adaptive = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=4, index=ivfpq_idx, min_results=5)
    assert _rows(fixed) == _rows(adaptive)


def test_adaptive_probe_scope_smaller_than_k_returns_all(spark, ivfpq_idx):
    """When the whole scope holds FEWER than k rows, need is NULL and
    every list is probed: the serve returns every in-scope row rather
    than silently fewer while more exist."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    allowed = emb.filter(F.col("vec_id").isin(100, 200, 300))
    fidx = ann_index.ann_index_filter(ivfpq_idx, allowed)
    got = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=2, index=fidx, min_results=5
    ).collect()
    per_q = {}
    for r in got:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    n_q = q.count()
    assert len(per_q) == n_q
    assert set(per_q.values()) == {3}  # all of the 3-row scope, per query


def test_adaptive_probe_residual_kind(spark, tmp_path_factory):
    """The budget helper is shared across the IVF family — the
    residual kind recovers the same way."""
    emb = _emb(spark)
    path = str(tmp_path_factory.mktemp("ann") / "ivfpq_res")
    built = ann_index.ann_index_build(emb, kind="ivfpq_residual",
                                      n_centroids=16, m=8, ksub=16)
    ann_index.ann_index_save(built, path)
    idx = ann_index.ann_index_load(spark, path)
    q = emb.filter(F.col("vec_id") < 5)
    allowed = emb.filter(F.col("label") == 4)
    fidx = ann_index.ann_index_filter(idx, allowed)
    got = similarity.topk_ivfpq_residual(
        emb.limit(0), q, k=5, nprobe=2, index=fidx, min_results=5
    ).collect()
    per_q = {}
    for r in got:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q.values()) == {5}
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    assert all(r.vec_id in allowed_ids for r in got)


def test_filtered_rerank_composes_and_stays_in_scope(spark, ivfpq_idx):
    """Filtered view + two-stage rerank: the shortlist comes from the
    FILTERED coded table, the exact tier late-fetches floats by id
    from the full corpus — survivors are already in scope, so the
    result is scoped AND float-exact, equal to an inline rerank over
    filtered candidates with the same trained state."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    allowed = emb.filter(F.col("label") <= 2)
    fidx = ann_index.ann_index_filter(ivfpq_idx, allowed)
    served = similarity.topk_ivfpq_rerank(
        emb, q, k=5, shortlist=20, nprobe=16, index=fidx)
    got = served.collect()
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    assert got and all(r.vec_id in allowed_ids for r in got)
    # twin identity: filter(index) == build(filtered corpus, SAME
    # pinned trained state) — encoding is row-wise given the
    # quantizers, so the semi-joined view and a fresh scoped encode
    # must serve identically
    rebuilt = ann_index.ann_index_build(
        allowed, kind="ivfpq", n_centroids=16, m=8, ksub=16,
        centroids=ivfpq_idx.parts["centroids"],
        codebooks=ivfpq_idx.parts["codebooks"])
    twin = similarity.topk_ivfpq_rerank(
        emb, q, k=5, shortlist=20, nprobe=16, index=rebuilt)
    assert _rows(served) == _rows(twin)


@pytest.fixture(scope="module")
def lsh_idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ann") / "lsh")
    built = ann_index.ann_index_build(_emb(spark), kind="lsh",
                                      n_bits=4, n_tables=4)
    ann_index.ann_index_save(built, path)
    return ann_index.ann_index_load(spark, path)


def test_lsh_prebuilt_topk_matches_inline(spark, lsh_idx):
    """lsh artifact kind (round-8 verdict #6): serving the multitable
    bucketed top-k from the saved banded bucket + vector tables is
    row-identical to the inline build, and candidates are never
    scanned (limit(0) serve)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    inline = similarity.topk_lsh_bucketed(emb, q, k=5, n_bits=4,
                                          n_tables=4)
    served = similarity.topk_lsh_bucketed(emb.limit(0), q, k=5,
                                          index=lsh_idx)
    assert _rows(served) == _rows(inline)
    with pytest.raises(ValueError, match="need an lsh index"):
        similarity.topk_lsh_bucketed(emb.limit(0), q, k=5,
                                     index=ann_index.AnnIndex(
                                         "sq8", {"kind": "sq8"}, {}))


def test_lsh_prebuilt_knn_graph_matches_inline(spark, tmp_path_factory):
    """knn_graph(strategy='lsh', index=...) — the k-NN-graph shape
    served from the artifact equals the inline multi-table build."""
    emb = _emb(spark)
    path = str(tmp_path_factory.mktemp("ann") / "lsh8")
    built = ann_index.ann_index_build(emb, kind="lsh", n_bits=4,
                                      n_tables=8)
    ann_index.ann_index_save(built, path)
    idx = ann_index.ann_index_load(spark, path)
    inline = similarity.knn_graph(emb, k=3, strategy="lsh", n_bits=4,
                                  n_tables=8)
    served = similarity.knn_graph(emb.limit(0), k=3, strategy="lsh",
                                  index=idx)
    assert _rows(served) == _rows(inline)


def test_lsh_append_and_filter(spark, lsh_idx):
    """Stateless kind: append is exact forever (build(A)+B == the
    grown parts), and ann_index_filter prunes BOTH row parts so a
    scoped serve returns only in-scope ids."""
    emb = _emb(spark)
    a = emb.filter(F.col("vec_id") % 10 != 7)
    b = emb.filter(F.col("vec_id") % 10 == 7)
    grown = ann_index.ann_index_append(
        ann_index.ann_index_build(a, kind="lsh", n_bits=4, n_tables=4), b
    )
    assert grown.parts["buckets"].count() == 4 * emb.count()
    assert grown.parts["vecs"].count() == emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    got = similarity.topk_lsh_bucketed(emb.limit(0), q, k=5, index=grown)
    want = similarity.topk_lsh_bucketed(emb, q, k=5, n_bits=4, n_tables=4)
    assert _rows(got) == _rows(want)

    allowed = emb.filter(F.col("label") <= 2)
    fidx = ann_index.ann_index_filter(lsh_idx, allowed)
    served = similarity.topk_lsh_bucketed(
        emb.limit(0), q, k=5, index=fidx).collect()
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    assert served and all(r.vec_id in allowed_ids for r in served)


def test_adaptive_probe_rerank_passthrough(spark, ivfpq_idx):
    """min_results flows through the rerank tier: under the shortfall
    scope the filtered rerank keeps k exact-scored in-scope answers."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    allowed = emb.filter(F.col("label") == 4)
    fidx = ann_index.ann_index_filter(ivfpq_idx, allowed)
    got = similarity.topk_ivfpq_rerank(
        emb, q, k=5, shortlist=10, nprobe=2, index=fidx, min_results=5
    ).collect()
    per_q = {}
    for r in got:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q.values()) == {5}
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    assert all(r.vec_id in allowed_ids for r in got)


def test_append_filter_adaptive_compose(spark, ivfpq_idx):
    """The full production composition on ONE artifact: grow it with
    pinned state (append), scope it to a tenant (filter), and serve
    with the adaptive budget (min_results) — full k, in scope, only
    ids from the grown corpus rank."""
    emb = _emb(spark)
    # ivfpq_idx was built on the FULL corpus; rebuild on 90% and grow
    a = emb.filter(F.col("vec_id") % 10 != 7)
    b = emb.filter(F.col("vec_id") % 10 == 7)
    grown = ann_index.ann_index_append(
        ann_index.ann_index_build(a, kind="ivfpq", n_centroids=16,
                                  m=8, ksub=16), b
    )
    allowed = emb.filter(F.col("label") == 4)
    fidx = ann_index.ann_index_filter(grown, allowed)
    q = emb.filter(F.col("vec_id") < 5)
    got = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=2, index=fidx, min_results=5
    ).collect()
    per_q = {}
    for r in got:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q.values()) == {5}
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    assert all(r.vec_id in allowed_ids for r in got)
    # appended rows are genuinely servable: at least one appended,
    # in-scope id can appear across the query set when scope∩B ≠ ∅
    b_ids = {r.vec_id for r in b.select("vec_id").collect()}
    assert b_ids & allowed_ids  # the regime is meaningful


@pytest.mark.parametrize(
    "scope_pred",
    [
        lambda: F.col("vec_id").isin(100, 200, 300),        # < k rows
        lambda: F.col("vec_id").isin(2, 100, 200, 300, 400, 500),  # ~k,
        # incl. a query id (self-exclusion arithmetic)
        lambda: F.col("label") == 4,                        # ~10%
        lambda: F.abs(F.hash("vec_id")) % 2 == 0,           # ~50%
    ],
)
def test_adaptive_probe_exact_coverage_property(spark, ivfpq_idx,
                                                scope_pred):
    """The adaptive budget's EXACT coverage contract, across scope
    shapes from tiny to half-corpus: every query returns
    min(k, |scope \\ {query}|) answers — never fewer while more exist,
    never more than k, all in scope."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    allowed = emb.filter(scope_pred())
    allowed_ids = {r.vec_id for r in allowed.select("vec_id").collect()}
    fidx = ann_index.ann_index_filter(ivfpq_idx, allowed)
    got = similarity.topk_ivfpq(
        emb.limit(0), q, k=5, nprobe=2, index=fidx, min_results=5
    ).collect()
    per_q: dict = {}
    for r in got:
        assert r.vec_id in allowed_ids
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    for qid in (r.vec_id for r in q.select("vec_id").collect()):
        expect = min(5, len(allowed_ids - {qid}))
        assert per_q.get(qid, 0) == expect, (qid, expect, per_q.get(qid))
