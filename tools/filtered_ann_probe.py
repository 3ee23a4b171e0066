"""Filtered vector-search selectivity instrument (FILTERED_ANN.md).

The claim behind ann_index_filter is that the scope predicate prunes
BEFORE distance arithmetic — so serve cost should TRACK selectivity
(a 3% scope scores ~3% of the codes), not stay corpus-constant the
way post-filtering would.  This probe measures it at sf0.1: one
full-corpus SQ8 artifact built once, then served through filtered
views at descending selectivities, timing each serve and checking
answer completeness (every query keeps k answers whenever the scope
holds >= k vectors — the filter-then-rank guarantee).

Usage: python tools/filtered_ann_probe.py   (writes FILTERED_ANN.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vexere_lakehouse_pipeline_spark.catalog import load_table  # noqa: E402
from vexere_lakehouse_pipeline_spark.operators import (  # noqa: E402
    ann_index,
    similarity,
)
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402

BASE = "/root/testdata/sf0.1"
K = 5
REPS = 3

# thunks: Column exprs need a live session
SCOPES = [
    ("unfiltered", None),
    ("label <= 8 (~90%)", lambda: F.col("label") <= 8),
    ("label <= 2 (~30%)", lambda: F.col("label") <= 2),
    ("label = 4 (~10%)", lambda: F.col("label") == 4),
    ("hash 1/32 (~3%)", lambda: F.abs(F.hash("vec_id")) % 32 == 0),
]


def main() -> None:
    spark = build_session("filtered-ann-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, BASE, "embeddings")
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    idx = ann_index.ann_index_build(emb, kind="sq8")
    # stage the probe artifact under a tempdir (like compact_probe /
    # zorder_bytes_probe) so runs never pollute the shared index tree
    staging = tempfile.mkdtemp(prefix="filtered_ann_probe_")
    path = os.path.join(staging, "sq8_probe")
    ann_index.ann_index_save(idx, path)
    idx = ann_index.ann_index_load(spark, path)

    lines = [
        "# FILTERED_ANN — filtered-search selectivity sweep, sf0.1",
        "",
        f"One full-corpus SQ8 artifact ({n_corpus:,} vectors), served "
        "through ann_index_filter views at descending selectivity "
        "(tools/filtered_ann_probe.py).  Pre-filtering means serve "
        "cost tracks |scope|; post-filtering would stay flat at the "
        "unfiltered cost AND lose answers.  `full k` = every query "
        "returned k answers (guaranteed whenever the scope holds "
        ">= k vectors; the flat SQ8 scan never short-falls — the IVF "
        "caveat lives in tests/test_ann_index.py).",
        "",
        f"| scope | rows in scope | serve best-of-{REPS} (s) | full k |",
        "|---|---|---|---|",
    ]
    for label, pred in SCOPES:
        sidx = idx
        n_scope = n_corpus
        if pred is not None:
            allowed = emb.filter(pred())
            n_scope = allowed.count()
            sidx = ann_index.ann_index_filter(idx, allowed)
        best = float("inf")
        rows = None
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            rows = similarity.topk_sq8(
                emb.limit(0), queries, k=K, index=sidx
            ).collect()
            best = min(best, time.monotonic() - t0)
        per_q: dict = {}
        for r in rows:
            per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
        full_k = set(per_q.values()) == {K}
        lines.append(
            f"| {label} | {n_scope:,} | {best:.2f} | {full_k} |"
        )
        print(lines[-1])
    lines += [
        "",
        "Serve time falls with scope size because the semi-joined "
        "view shrinks the code scan itself; the fixed floor is the "
        "query-side encode + top-k machinery.  At 100 TB the scan "
        "term dominates, so the slope IS the payoff: one index, "
        "every tenant, each paying only its own bytes.",
        "",
        "## Adaptive probe budget (IVF, min_results=k)",
        "",
        "Same sweep against one full-corpus IVFPQ artifact, serving "
        "each scope twice: fixed nprobe=8 (can silently return < k "
        "under selective scopes) vs the adaptive budget (per query, "
        "probe the smallest distance-ranked list prefix whose "
        "cumulative in-scope count covers k, floored at nprobe — "
        "operators/similarity.py:_probe_lists).  The adaptive column "
        "costs one extra cid-only aggregate over the scope-pruned "
        "coded table; only shortfall queries expand their probe set.",
        "",
        "| scope | rows in scope | fixed s | fixed full k | "
        "adaptive s | adaptive full k |",
        "|---|---|---|---|---|---|",
    ]
    iidx = ann_index.ann_index_build(emb, kind="ivfpq", n_centroids=32,
                                     m=8, ksub=16, dim=64)
    ipath = os.path.join(staging, "ivfpq_probe")
    ann_index.ann_index_save(iidx, ipath)
    iidx = ann_index.ann_index_load(spark, ipath)
    # one extra ultra-selective scope where the FIXED budget
    # demonstrably short-falls at this sf (16 rows over 32 lists)
    ivf_scopes = SCOPES + [
        ("id % 128 = 0 (~0.8%)", lambda: F.col("vec_id") % 128 == 0),
    ]
    for label, pred in ivf_scopes:
        sidx = iidx
        n_scope = n_corpus
        if pred is not None:
            allowed = emb.filter(pred())
            n_scope = allowed.count()
            sidx = ann_index.ann_index_filter(iidx, allowed)
        cells = {}
        for mode, min_results in (("fixed", None), ("adaptive", K)):
            best = float("inf")
            rows = None
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                rows = similarity.topk_ivfpq(
                    emb.limit(0), queries, k=K, nprobe=8, index=sidx,
                    min_results=min_results,
                ).collect()
                best = min(best, time.monotonic() - t0)
            per_q = {}
            for r in rows:
                per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
            cells[mode] = (best, set(per_q.values()) == {K})
        lines.append(
            f"| {label} | {n_scope:,} | {cells['fixed'][0]:.2f} | "
            f"{cells['fixed'][1]} | {cells['adaptive'][0]:.2f} | "
            f"{cells['adaptive'][1]} |"
        )
        print(lines[-1])
    lines += [
        "",
        "The adaptive column stays full-k at every selectivity — "
        "including the ultra-selective scope where the fixed budget "
        "demonstrably loses answers — at roughly fixed-budget cost "
        "(the visible overhead at this tiny sf is the |Q|×n_centroids "
        "budget window + the cid-count pre-scan, both constant-side "
        "terms; at corpus scale the probed-list ADC scan dominates "
        "and only shortfall queries pay expansion).",
    ]
    lines += [
        "",
        "## Flat kinds: hamming + cascade (r9 verdict #6)",
        "",
        "The remaining filtered kinds, same sweep.  Both are FLAT "
        "scans (hamming scores every in-scope sketch; cascade's "
        "tier-1 shortlist is drawn from the scope), so unlike IVF "
        "they can never short-fall below k while the scope holds "
        ">= k vectors — `full k` must read True down both columns "
        "(oracle-gated at sf0.01 by sim_topk_filtered_"
        "{hamming,cascade}_prebuilt + recall gates vs the filtered "
        "truth).",
        "",
        f"| scope | rows in scope | hamming best-of-{REPS} (s) | "
        f"full k | cascade best-of-{REPS} (s) | full k |",
        "|---|---|---|---|---|---|",
    ]
    hidx = ann_index.ann_index_build(emb, kind="hamming", n_bits=63)
    hpath = os.path.join(staging, "hamming_probe")
    ann_index.ann_index_save(hidx, hpath)
    hidx = ann_index.ann_index_load(spark, hpath)
    cidx = ann_index.ann_index_build(emb, kind="cascade", n_bits=63)
    cpath = os.path.join(staging, "cascade_probe")
    ann_index.ann_index_save(cidx, cpath)
    cidx = ann_index.ann_index_load(spark, cpath)
    for label, pred in SCOPES:
        allowed = emb.filter(pred()) if pred is not None else None
        n_scope = allowed.count() if pred is not None else n_corpus
        cells = {}
        for kind, idx0, serve in (
            ("hamming", hidx,
             lambda i: similarity.topk_hamming(
                 emb.limit(0), queries, k=K, index=i)),
            ("cascade", cidx,
             lambda i: similarity.topk_cascade(
                 emb, queries, k=K, shortlist1=100, shortlist2=20,
                 index=i)),
        ):
            sidx = (ann_index.ann_index_filter(idx0, allowed)
                    if allowed is not None else idx0)
            best, rows = float("inf"), None
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                rows = serve(sidx).collect()
                best = min(best, time.monotonic() - t0)
            per_q = {}
            for r in rows:
                per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
            cells[kind] = (best, set(per_q.values()) == {K})
        lines.append(
            f"| {label} | {n_scope:,} | {cells['hamming'][0]:.2f} | "
            f"{cells['hamming'][1]} | {cells['cascade'][0]:.2f} | "
            f"{cells['cascade'][1]} |"
        )
        print(lines[-1])

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "FILTERED_ANN.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    shutil.rmtree(staging, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
