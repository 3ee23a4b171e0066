"""ANN index build/serve separation — the production serving shape.

Every ``topk_*`` tier in :mod:`operators.similarity` can derive its
index state (coarse centroids, inverted-list assignments, PQ
codebooks, PQ codes, SQ8 params/codes) inline from the candidate
table — correct, but it re-trains and re-encodes the WHOLE corpus on
every call.  At 100 TB that is never the serving shape: the index is
built ONCE (a batch job that scans the corpus), persisted as plain
tables, and then served MANY times, each serve touching only
query-scale state plus the (already tiny) coded corpus columns.

This module materializes exactly the intermediates the inline paths
compute, with the same deterministic constructions, so a prebuilt
serve is HASH-IDENTICAL to the inline call (gated:
sim_topk_ivfpq_rerank_prebuilt / sim_topk_sq8_prebuilt reuse the
inline rows' DuckDB oracles verbatim; equality is also pinned
row-for-row in tests/test_dedup_similarity.py).  Why identity holds:
every stored value is either an integer (codes, scale_micro, cid) or
a double produced by the same IEEE expression tree the inline path
evaluates (centroid/codebook components, SQ8 min/max), and parquet
round-trips doubles bit-exactly.

Index kinds:

- ``ivfpq``: parts ``centroids`` (cid, cu), ``codebooks``
  (s, code, cv), ``coded`` (vec_id, cid, codes).  The build pays the
  corpus-scale codes ⋈ lists join ONCE — a served scan reads a single
  table partitioned however the lakehouse likes (bucket by cid and
  probes touch only matching files).  Serves ``topk_ivfpq``,
  ``topk_ivfpq_rerank`` and (ignoring cid) ``topk_pq_adc``.
- ``sq8``: parts ``params`` (pos, mn, mx, scale_micro), ``codes``
  (vec_id, sq8).  Serves ``topk_sq8``.
- ``jl``: part ``codes`` (vec_id, jl) — the projected integer
  coordinates.  No trained state at all (the sign matrix is
  hash-derived), so the artifact IS just the coded corpus; serves
  ``topk_jl`` and ``topk_jl_rerank``.
- ``ivfpq_residual``: same parts as ``ivfpq`` but the codebooks
  quantize RESIDUALS (u − coarse centroid); serves
  ``topk_ivfpq_residual``.
- ``hamming``: part ``codes`` (vec_id, sk) — one int64 sign sketch
  per vector; serves ``topk_hamming`` and ``topk_hamming_rerank``.
- ``int8``: part ``codes`` (vec_id, q8) — ±127 unit-vector codes;
  serves ``topk_int8``.
- ``cascade``: parts ``sketches`` + ``q8codes`` — the tier-1/tier-2
  state of the three-tier funnel; serves ``topk_cascade``.
- ``matryoshka``: part ``codes`` (vec_id, emb) — the truncated float
  prefix (stateless, like ``jl``); serves ``topk_truncated``.
- ``lsh``: parts ``buckets`` (vec_id, t, bucket — the L banded hash
  tables as one narrow table) + ``vecs`` (vec_id, emb, c_norm — the
  late-fetch scoring table).  Stateless (hash-derived planes); serves
  ``topk_lsh_bucketed`` and ``knn_graph(strategy='lsh')``.

Incremental maintenance: :func:`ann_index_append` encodes ONLY new
rows with the stored trained state and unions them into the row-level
parts — append(A, B) ≡ build(A ∪ B) with pinned quantizers (oracle-
gated); see its docstring for the drift/rebuild caveat.

Reference parity note: the reference repo has no ANN tier at all —
this is part of the LLM-data-pipeline extension surface; the shape
follows FAISS's build-once / load / search lifecycle (public API:
faiss.write_index / read_index / Index.search, IndexIVF.add for the
append path).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.functions.vectors import sign_sketch
from vexere_lakehouse_pipeline_spark.operators import similarity as sim

META_FILE = "_ann_meta.json"


def default_index_path(sf_dir: str, kind: str) -> str:
    """Canonical on-disk home for the (corpus, kind) index artifact:
    ``$VLPS_ANN_INDEX_DIR`` (or ``<repo>/.ann_index``, gitignored)
    ``/<sf-tag>/<kind>``.  Keyed by the corpus directory's basename so
    every scale factor keeps its own build, exactly like a lakehouse
    would key the index table by corpus snapshot."""
    root = os.environ.get("VLPS_ANN_INDEX_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        ".ann_index",
    )
    return os.path.join(root, os.path.basename(os.path.normpath(sf_dir)),
                        kind)

# part name -> subdirectory, per kind (also the load order)
_KIND_PARTS = {
    "ivfpq": ("centroids", "codebooks", "coded"),
    "ivfpq_residual": ("centroids", "codebooks", "coded"),
    "sq8": ("params", "codes"),
    "jl": ("codes",),
    "hamming": ("codes",),
    "int8": ("codes",),
    "cascade": ("sketches", "q8codes"),
    "matryoshka": ("codes",),
    "lsh": ("buckets", "vecs"),
}

# the row-level (one row per corpus vector) parts of each kind — what
# ann_index_append grows; everything else is trained/model state that
# appends REUSE, never retrain
_ROW_PARTS = {
    "ivfpq": ("coded",),
    "ivfpq_residual": ("coded",),
    "sq8": ("codes",),
    "jl": ("codes",),
    "hamming": ("codes",),
    "int8": ("codes",),
    "cascade": ("sketches", "q8codes"),
    "matryoshka": ("codes",),
    "lsh": ("buckets", "vecs"),
}


@dataclass
class AnnIndex:
    """A built ANN index: ``meta`` (the build-time hyperparameters a
    serve call must adopt) + ``parts`` (plain DataFrames — parquet on
    disk once saved, so any engine can read them)."""

    kind: str
    meta: dict
    parts: dict[str, DataFrame] = field(default_factory=dict)


def ann_index_build(candidates: DataFrame, kind: str = "ivfpq",
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_centroids: int = 32, m: int = 8, ksub: int = 16,
                    dsub: int | None = None,
                    dim: int | None = None,
                    d_out: int = 16,
                    n_bits: int | None = None,
                    n_tables: int = 4,
                    dims: int = 32,
                    train_iters: int = 0,
                    centroids: DataFrame | None = None,
                    codebooks: DataFrame | None = None,
                    params: DataFrame | None = None) -> AnnIndex:
    """Build the index state for ``kind`` from the candidate table —
    the one corpus-scale pass.  Constructions are identical to the
    inline paths in :mod:`similarity` (same helpers, same order), so
    serving from the result reproduces the inline output exactly.

    ``centroids``/``codebooks``/``params`` pin previously-trained
    state (the :func:`ann_index_append` path): rows encode against
    the GIVEN quantizers instead of re-deriving them from
    ``candidates`` — append(A, B) ≡ build(A ∪ B) with pinned state.

    ``n_bits`` means different things by kind — hamming/cascade use
    it as the SKETCH width (63 = full sign sketch, the right default)
    while lsh uses it as the BUCKET-KEY width (2**n_bits buckets per
    table) — so the default resolves per kind (63 vs 4) and the lsh
    branch rejects widths past 16: a 63-bit bucket key hashes nearly
    every vector into a singleton bucket and recall silently
    collapses to ~0 (ADVICE r9).
    """
    if n_bits is None:
        n_bits = 4 if kind == "lsh" else 63
    elif kind == "lsh" and n_bits > 16:
        raise ValueError(
            f"kind='lsh' would bucket on a {n_bits}-bit key: 2^{n_bits}"
            " buckets per table makes nearly every bucket a singleton"
            " and recall ~0 — use n_bits <= 16 (4-8 typical); 63 is"
            " the hamming/cascade SKETCH width, not a bucket width"
        )
    if kind == "ivfpq":
        if centroids is None:
            centroids = (
                sim._unit_vecs(candidates, vec_col, id_col, "vec_id")
                .orderBy("vec_id").limit(n_centroids)
                .select(F.col("vec_id").alias("cid"), F.col("u").alias("cu"))
            )
        if codebooks is None:
            codebooks = sim.pq_sampled_codebooks(candidates, m, ksub,
                                                 vec_col, id_col)
        lists = sim.assign_ivf_lists(candidates, n_centroids,
                                     vec_col, id_col, dim,
                                     centroids=centroids)
        coded = (
            sim.pq_encode(candidates, codebooks, m, vec_col, id_col, dsub)
            .groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "code"))),
                    lambda x: x["code"],
                ).alias("codes")
            )
            # the one corpus × corpus join of the family — paid HERE,
            # once, instead of on every serve (see topk_ivfpq's
            # shuffle_hash note); the saved table carries cid inline
            .join(lists.hint("shuffle_hash"), on="vec_id")
            .select("vec_id", "cid", "codes")
        )
        meta = {"kind": kind, "n_centroids": n_centroids, "m": m,
                "ksub": ksub, "dsub": dsub, "dim": dim}
        return AnnIndex(kind, meta, {"centroids": centroids,
                                     "codebooks": codebooks,
                                     "coded": coded})
    if kind == "ivfpq_residual":
        cents, cbs, coded = sim.ivfpq_residual_state(
            candidates, n_centroids=n_centroids, m=m, ksub=ksub,
            vec_col=vec_col, id_col=id_col, dsub=dsub, dim=dim,
            train_iters=train_iters, centroids=centroids,
            codebooks=codebooks,
        )
        meta = {"kind": kind, "n_centroids": n_centroids, "m": m,
                "ksub": ksub, "dsub": dsub, "dim": dim,
                "train_iters": train_iters}
        return AnnIndex(kind, meta, {"centroids": cents,
                                     "codebooks": cbs,
                                     "coded": coded})
    if kind == "sq8":
        if params is None:
            params = sim.sq8_params(candidates, vec_col, id_col)
        # dims-sized model state: pin so the corpus min/max aggregate
        # behind it runs once, not once more inside the encode below
        params = params.localCheckpoint(eager=False)
        codes = sim.sq8_encode(candidates, params, vec_col, id_col,
                               "vec_id")
        return AnnIndex(kind, {"kind": kind},
                        {"params": params, "codes": codes})
    if kind == "jl":
        codes = sim.jl_project_int8(candidates, d_out, vec_col, id_col)
        return AnnIndex(kind, {"kind": kind, "d_out": d_out},
                        {"codes": codes})
    if kind == "hamming":
        codes = candidates.select(
            F.col(id_col).alias("vec_id"),
            sign_sketch(vec_col, n_bits).alias("sk"),
        ).filter(F.col("sk").isNotNull())
        return AnnIndex(kind, {"kind": kind, "n_bits": n_bits},
                        {"codes": codes})
    if kind == "int8":
        codes = sim.quantize_int8_unit(candidates, vec_col).select(
            F.col(id_col).alias("vec_id"), "q8"
        ).filter(F.col("q8").isNotNull())
        return AnnIndex(kind, {"kind": kind}, {"codes": codes})
    if kind == "cascade":
        sketches = candidates.select(
            F.col(id_col).alias("vec_id"),
            sign_sketch(vec_col, n_bits).alias("sk"),
        ).filter(F.col("sk").isNotNull())
        q8codes = sim.quantize_int8_unit(candidates, vec_col).select(
            F.col(id_col).alias("vec_id"), "q8"
        ).filter(F.col("q8").isNotNull())
        return AnnIndex(kind, {"kind": kind, "n_bits": n_bits},
                        {"sketches": sketches, "q8codes": q8codes})
    if kind == "matryoshka":
        codes = candidates.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), 1, dims).alias("emb"),
        )
        return AnnIndex(kind, {"kind": kind, "dims": dims},
                        {"codes": codes})
    if kind == "lsh":
        # multi-table sign-LSH (round-8 verdict #6): the L banded
        # bucket tables persist as ONE narrow (vec_id, t, bucket)
        # table — at scale, partition by (t, bucket) and a serve scan
        # prunes to the probed buckets — plus the (vec_id, emb, norm)
        # vector table for exact scoring of surviving pairs (the late
        # fetch).  Stateless (hash-derived planes): append is exact
        # forever, like jl/hamming.
        base = candidates.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("emb"),
            sim.l2_norm(vec_col).alias("c_norm"),
        )
        buckets = base.select(
            "vec_id",
            F.explode(
                sim._table_buckets("emb", n_bits, n_tables)
            ).alias("tb"),
        ).select("vec_id", "tb.t", "tb.bucket")
        return AnnIndex(
            kind,
            {"kind": kind, "n_bits": n_bits, "n_tables": n_tables},
            {"buckets": buckets, "vecs": base},
        )
    raise ValueError(f"unknown ANN index kind: {kind!r}")


# meta keys that are bookkeeping, not ann_index_build hyperparameters
_NON_HYPER = ("kind", "stream_hwm")


def hyper_params(meta: dict) -> dict:
    """The build hyperparameters recorded in an artifact's meta —
    everything except the kind tag and bookkeeping fields (the
    streaming append's exactly-once high-water mark)."""
    return {k: v for k, v in meta.items() if k not in _NON_HYPER}


def update_meta(path: str, **updates) -> None:
    """Atomically update the saved artifact's JSON meta sidecar
    (write-tmp-then-replace, same protocol as SnapshotTable's
    manifest).  Used by the streaming append to advance its
    exactly-once ``stream_hwm`` after a batch's files land."""
    p = os.path.join(path, META_FILE)
    with open(p) as fh:
        meta = json.load(fh)
    meta.update(updates)
    tmp = p + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, p)


def pinned_state(index: AnnIndex) -> dict[str, DataFrame]:
    """The trained/model parts of ``index`` that an append must adopt
    verbatim (never retrain): centroids+codebooks for the IVF family,
    params for sq8, nothing for the stateless kinds.  Shared by
    :func:`ann_index_append` and the streaming append
    (streaming/ingest.py: append_ann_stream)."""
    if index.kind in ("ivfpq", "ivfpq_residual"):
        return {"centroids": index.parts["centroids"],
                "codebooks": index.parts["codebooks"]}
    if index.kind == "sq8":
        return {"params": index.parts["params"]}
    return {}


def ann_index_append(index: AnnIndex, new_rows: DataFrame,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> AnnIndex:
    """Incremental index maintenance — the append path a growing
    corpus needs: encode ONLY ``new_rows`` with the index's STORED
    trained state (centroids/codebooks/params — never retrained) and
    union them into the row-level parts.  This is exactly what a Delta
    MERGE into the coded table would carry in the lakehouse; the
    returned index serves through the same ``index=`` plumbing.

    Identity contract (oracle-gated by sim_topk_sq8_appended and
    pinned for every kind in tests/test_ann_index.py):
    ``append(build(A), B)`` ≡ ``build(A ∪ B)`` *with pinned state* —
    bit-for-bit, because encoding is row-wise given the quantizers.

    Drift caveat — when to REBUILD instead: the trained state still
    reflects the ORIGINAL corpus A.  For ``ivfpq``/``ivfpq_residual``,
    appended mass shifts inverted-list balance (a probe budget tuned
    for balanced lists degrades as hot lists grow) and the codebooks
    quantize B against A's distribution; for ``sq8``, B values outside
    A's per-dimension [mn, mx] clamp to the range edge.  Rule of
    thumb: rebuild when appends exceed ~30-50% of the built corpus or
    when the recall gates drift below their pinned floors.  Stateless
    kinds (hamming/int8/jl/cascade/matryoshka) have no drift — append
    is exact forever.  Callers must keep ids disjoint (no dedup here;
    exact dedup upstream is the repo's standing production ordering).
    """
    pinned = pinned_state(index)
    hyper = hyper_params(index.meta)
    delta = ann_index_build(new_rows, kind=index.kind, vec_col=vec_col,
                            id_col=id_col, **hyper, **pinned)
    parts = dict(index.parts)
    for part in _ROW_PARTS[index.kind]:
        parts[part] = index.parts[part].unionByName(delta.parts[part])
    return AnnIndex(index.kind, dict(index.meta), parts)


def ann_index_filter(index: AnnIndex, allowed: DataFrame,
                     id_col: str = "vec_id",
                     broadcast: bool = True) -> AnnIndex:
    """Attribute-filtered VIEW of a built index — filtered vector
    search (FAISS ``IDSelector`` / the `filter=` predicate of every
    production vector store): restrict serving to the rows whose ids
    appear in ``allowed`` (e.g. a tenant, language, or label scope),
    WITHOUT rebuilding anything.

    The returned index shares the trained state (centroids /
    codebooks / params — trained on the FULL corpus, which is the
    production contract: one index serves every scope) and semi-joins
    each row-level part against the allowed-id set, so the predicate
    prunes candidates BEFORE any distance arithmetic.  ``broadcast``
    hints the id set to every executor — right when the predicate is
    selective (the common case); pass ``False`` for low-selectivity
    scopes so AQE picks the join side by measured size instead.

    IVF caveat (pinned in tests/test_ann_index.py): a selective scope
    empties probed inverted lists, so a fixed ``nprobe`` can return
    FEWER than k in-scope answers — raise the probe budget under
    filters (what production stores do automatically); the flat kinds
    (sq8/jl/hamming/int8) scan the whole filtered view and never
    short-fall.

    Scale note: a left-semi join on the code table's key column is
    the cheapest possible pre-filter (no row widening, bloom-filter
    pushdown eligible).  When one attribute is ALWAYS in the
    predicate, materialize it into the coded part at build time and
    partition by it — the semi-join then becomes a partition-pruned
    scan.  Composition with serving is exercised by
    sim_topk_filtered_sq8_prebuilt (hash-gated against a DuckDB
    oracle that applies the same predicate).
    """
    ids = allowed.select(F.col(id_col).alias("vec_id")).distinct()
    if broadcast:
        ids = F.broadcast(ids)
    parts = dict(index.parts)
    for part in _ROW_PARTS[index.kind]:
        parts[part] = index.parts[part].join(ids, "vec_id", "left_semi")
    return AnnIndex(index.kind, dict(index.meta), parts)


def ann_index_save(index: AnnIndex, path: str) -> None:
    """Materialize every part as parquet under ``path`` (one
    subdirectory per part) plus a JSON meta sidecar.  Overwrites —
    rebuilds are idempotent.  Parquet now; the same layout lands as
    Delta tables when the wheel is available (tools/delta_runbook.md).
    """
    for part in _KIND_PARTS[index.kind]:
        index.parts[part].write.mode("overwrite").parquet(
            os.path.join(path, part)
        )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, META_FILE), "w") as fh:
        json.dump(index.meta, fh)


def ann_index_load(spark: SparkSession, path: str) -> AnnIndex:
    """Reopen a saved index.  Parts are lazy parquet scans — a serve
    plan prunes/pushes down into them like any other table."""
    with open(os.path.join(path, META_FILE)) as fh:
        meta = json.load(fh)
    kind = meta["kind"]
    parts = {
        part: spark.read.parquet(os.path.join(path, part))
        for part in _KIND_PARTS[kind]
    }
    return AnnIndex(kind, meta, parts)
