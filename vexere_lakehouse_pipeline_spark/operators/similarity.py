"""Similarity search over embedding columns.

Strategies, in increasing scale ambition (every approximate path has
an oracle-gated recall row against the brute-force truth):

- **Brute force (column fold)** — broadcast the (small) query set
  against the full candidate table, score with a JVM-side cosine fold,
  rank per query.  Exact; scales linearly in |candidates| × |queries|
  and stays fully distributed (the candidate side never moves).
- **Brute force (Arrow/numpy)** — same plan, but scoring runs as one
  numpy matmul per Arrow batch inside ``mapInPandas``.  Exact; wins
  for wide vectors (d ≳ a few hundred) where BLAS beats the
  interpreted higher-order-function fold.
- **LSH-bucketed** (single + multi-table) — sign-bucket both sides,
  equi-join on the bucket, rank within.  Approximate; the join prunes
  the score count by ~2^bits, extra tables buy recall linearly.
- **Hamming / binary sketch** — 63 sign bits packed into ONE int64;
  xor+bit_count ranks like cosine at 1/64th the bytes.
- **int8 codes** — unit vectors quantized to ±127; integer dot
  products, 28x measured scan-byte reduction (SCALE.md).
- **IVF** — coarse-quantize into inverted lists, probe the nprobe
  nearest lists per query; the list id doubles as a partition/bucket
  key at 100 TB.  Pluggable centroids (deterministic first-n default,
  train_kmeans for quality).
- **PQ / ADC** — m-subspace product quantization with sampled
  codebooks; candidates scanned as m small ints, scored by integer
  LUT lookups (20x measured scan-byte reduction, SCALE.md).
- **IVF-PQ** — the composed production architecture: IVF prunes rows,
  PQ shrinks bytes per surviving row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.functions.vectors import (
    cosine_from_norms,
    hamming_distance,
    l2_norm,
    sign_lsh_bucket,
    sign_sketch,
)

# Hard ceiling on the Arrow brute-force path's query-set size: the set
# is driver-collected and broadcast, so it must stay ~MBs.  100k rows
# × 768-d float64 ≈ 600 MB — already generous; beyond that the right
# tool is topk_ivf/topk_lsh_bucketed.
MAX_ARROW_QUERIES = 100_000


def _two_stage_topk(scored: DataFrame, order_by: list, k: int,
                    rank_col: str = "rank") -> DataFrame:
    """Distributed top-k over a (query_id, vec_id, score…) stream.

    Stage 1: ``row_number`` over (query_id, spark_partition_id())
    capped at k — the shuffle spreads each query's candidates across
    (query, input-partition) keys, so NO single task ever receives a
    query's full candidate list (the 100×-scale hazard of the naive
    per-query window: one task sorts O(|C|) rows, spills, straggles).
    Stage 2: the final rank runs over the ≤ n_partitions·k survivors —
    tiny.

    Bit-identical to the single-window rank for ANY grouping of the
    input: ``order_by`` must be a total order (callers always break
    ties on vec_id), and every row in the global top-k is necessarily
    in the top-k of whichever group contains it, so stage 1 can never
    drop a winner.  Non-determinism of spark_partition_id() under
    retries/AQE is therefore harmless here.
    """
    pre = scored.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy("query_id", "_pid").orderBy(*order_by)
    survivors = (
        pre.withColumn("_prn", F.row_number().over(w1))
        .filter(F.col("_prn") <= k)
        .drop("_pid", "_prn")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def topk_bruteforce(candidates: DataFrame, queries: DataFrame, k: int = 5,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, vec_id, cos_sim, rank).  Deterministic: ranked
    by (cos_sim desc, vec_id) after 6dp rounding.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        l2_norm(vec_col).alias("q_norm"),
    )
    c = candidates.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        l2_norm(vec_col).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_from_norms("q_emb", "emb", "q_norm", "c_norm"), 6
            ).alias("cos_sim"),
        )
    )
    # Unscoreable pairs (null/zero-norm on either side -> null cosine)
    # are EXCLUDED from ranking, not padded in as null rows — the same
    # contract the Arrow path implements by dropping them per batch.
    scored = scored.filter(F.col("cos_sim").isNotNull())
    return _two_stage_topk(scored, [F.desc("cos_sim"), "vec_id"], k)


def topk_ivf(candidates: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 32, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the scale path.

    Build: every candidate is assigned to its nearest centroid (the
    inverted list).  Search: each query probes only its ``nprobe``
    nearest lists.  Scoring work drops from |C|×|Q| to
    ~|C|×nprobe/n_centroids×|Q|, and the list assignment is a plain
    column that big tables can be PARTITIONED/bucketed by — probes then
    touch only matching partitions.

    ``centroids`` is pluggable (pass pyspark.ml KMeans centers in
    production).  The default — the first ``n_centroids`` candidates by
    id — is a deterministic coarse quantizer that keeps the whole
    operator oracle-verifiable.
    """
    c = candidates.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        l2_norm(vec_col).alias("_norm"),
    )
    if centroids is None:
        # First n_centroids candidates BY ID (as documented) — robust
        # to sparse/offset id spaces, unlike a `vec_id < n` filter.
        centroids = (
            c.orderBy("vec_id").limit(n_centroids).drop("_norm")
        )
    elif "cluster" in centroids.columns:  # train_kmeans output, as-is
        centroids = centroids.select(
            F.col("cluster").alias("vec_id"), F.col("centroid").alias("emb")
        )
    cents = centroids.select(
        F.col("vec_id").alias("cid"),
        F.col("emb").alias("c_emb"),
        l2_norm("emb").alias("c_norm"),
    )

    def nearest_lists(df: DataFrame, side_id: str, side_emb: str,
                      n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            side_id,
            side_emb,
            "_norm",
            "cid",
            F.round(
                cosine_from_norms(side_emb, "c_emb", "_norm", "c_norm"), 6
            ).alias("_cs"),
        )
        w = Window.partitionBy(side_id).orderBy(F.desc("_cs"), "cid")
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_cs", "_rn")
        )

    inverted = nearest_lists(c, "vec_id", "emb", 1).withColumnRenamed(
        "_norm", "c_norm2"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        l2_norm(vec_col).alias("_norm"),
    )
    probes = nearest_lists(q, "query_id", "q_emb", nprobe).withColumnRenamed(
        "_norm", "q_norm"
    )
    scored = (
        inverted.join(F.broadcast(probes), on="cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_from_norms("q_emb", "emb", "q_norm", "c_norm2"), 6
            ).alias("cos_sim"),
        )
        .distinct()  # a (query, candidate) pair can meet in ≤1 list; keep explicit
    )
    # bruteforce parity: zero-norm/null vectors are unscoreable and
    # must not occupy ranks (they would sort last but still emit).
    scored = scored.filter(F.col("cos_sim").isNotNull())
    return _two_stage_topk(scored, [F.desc("cos_sim"), "vec_id"], k)


def _table_buckets(vec_col: str, n_bits: int, n_tables: int):
    """(table, bucket) struct array for multi-table sign-LSH: table t
    hashes the disjoint dim slice [t*n_bits, (t+1)*n_bits).  Candidates
    are the UNION over tables, so a true neighbor is lost only if its
    signs disagree with the query's in EVERY slice — the standard LSH
    recall lever, at a linear cost multiplier of n_tables on the
    bucket-join volume."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                sign_lsh_bucket(vec_col, n_bits, t * n_bits).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )


def topk_lsh_bucketed(candidates: DataFrame, queries: DataFrame, k: int = 5,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      n_bits: int = 4, n_tables: int = 1,
                      index=None) -> DataFrame:
    """Approximate top-k: candidates are scored only within the query's
    sign-LSH bucket(s).  Same output shape as :func:`topk_bruteforce`.

    ``n_tables`` > 1 unions candidates over independent hash tables
    (disjoint dim slices, :func:`_table_buckets`) and dedupes the
    (query, candidate) pairs before scoring, so each survivor is
    scored exactly once — recall rises with n_tables (gated:
    sim_topk_lsh_multitable + tests pin multi > single on real data)
    while the scored-pair volume stays bounded by the union size.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``lsh`` — the SERVING path (round-8 verdict #6): the L banded
    bucket tables and the (vec_id, emb, norm) vector table come from
    the saved parts (n_bits/n_tables adopted from meta), so
    ``candidates`` is never scanned and the corpus-side explode +
    norm computation are never redone.  The serve is also a BETTER
    plan than the inline shape: the bucket join carries only
    (vec_id, t, bucket) ids and the float vectors are late-fetched
    per surviving pair — narrow shuffle, wide payload only for
    survivors.  Output is hash-identical to the inline build — gated
    by sim_topk_lsh_multitable_prebuilt.
    """
    if index is not None:
        if index.kind != "lsh":
            raise ValueError(f"need an lsh index, got {index.kind!r}")
        n_bits = index.meta["n_bits"]
        n_tables = index.meta["n_tables"]
        qx = queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(_table_buckets(vec_col, n_bits, n_tables)).alias(
                "tb"
            ),
        ).select("query_id", "tb.t", "tb.bucket")
        # Round-11 (guide §2.3/§2.4, r10 verdict #3): the only output
        # of this dedup is the distinct (query_id, vec_id) set — the
        # previous row_number-over-(pair) window shuffled and SORTED
        # every bucket-collision row; distinct() is a hash aggregate
        # whose map-side partial collapses the up-to-n_tables
        # duplicates before the exchange.
        pairs = (
            index.parts["buckets"]
            .join(F.broadcast(qx), on=["t", "bucket"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id")
            .distinct()
        )
        qv = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_emb"),
            l2_norm(vec_col).alias("q_norm"),
        )
        joined = pairs.join(index.parts["vecs"], on="vec_id").join(
            F.broadcast(qv), on="query_id"
        )
    elif n_tables == 1:
        # single-table fast path: no generator node, bucket stays a
        # plain projected column inside whole-stage codegen (the
        # oracle-gated r2 plan shape, unchanged)
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_emb"),
            l2_norm(vec_col).alias("q_norm"),
            sign_lsh_bucket(vec_col, n_bits).alias("bucket"),
        )
        c = candidates.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("emb"),
            l2_norm(vec_col).alias("c_norm"),
            sign_lsh_bucket(vec_col, n_bits).alias("bucket"),
        )
        joined = c.join(F.broadcast(q), on="bucket").filter(
            F.col("vec_id") != F.col("query_id")
        )
    else:
        # Round-11 (guide §2.3/§8, r10 verdict #3): the inline
        # multi-table path now has the SAME shape as the prebuilt
        # serve (whose output is gated hash-identical to this one):
        # the bucket self-join and the pair dedup carry only ids —
        # never the float arrays — and vectors are late-fetched per
        # surviving pair.  The dedup is a distinct() hash aggregate
        # (map-side partial collapses the ≤ n_tables duplicates),
        # replacing a row_number window that shuffled AND sorted every
        # bucket-collision row with two 64-double arrays aboard.
        qx = queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(_table_buckets(vec_col, n_bits, n_tables)).alias(
                "tb"
            ),
        ).select("query_id", "tb.t", "tb.bucket")
        cx = candidates.select(
            F.col(id_col).alias("vec_id"),
            F.explode(_table_buckets(vec_col, n_bits, n_tables)).alias(
                "tb"
            ),
        ).select("vec_id", "tb.t", "tb.bucket")
        pairs = (
            cx.join(F.broadcast(qx), on=["t", "bucket"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id")
            .distinct()
        )
        qv = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_emb"),
            l2_norm(vec_col).alias("q_norm"),
        )
        cv = candidates.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("emb"),
            l2_norm(vec_col).alias("c_norm"),
        )
        joined = pairs.join(cv, on="vec_id").join(
            F.broadcast(qv), on="query_id"
        )
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(
            cosine_from_norms("q_emb", "emb", "q_norm", "c_norm"), 6
        ).alias("cos_sim"),
    )
    # bruteforce parity: zero-norm/null vectors are unscoreable and
    # must not occupy ranks (they would sort last but still emit).
    scored = scored.filter(F.col("cos_sim").isNotNull())
    return _two_stage_topk(scored, [F.desc("cos_sim"), "vec_id"], k)


def topk_hamming(candidates: DataFrame, queries: DataFrame, k: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_bits: int = 63, index=None) -> DataFrame:
    """Approximate cosine top-k over int64 sign sketches — the binary-
    embedding sibling of :func:`topk_int8`, one notch further down the
    compression ladder.

    Each vector becomes ONE bigint (``sign_sketch``); scoring is
    ``bit_count(xor)`` ascending — pure int64 arithmetic, so the
    DuckDB oracle verifies the ranking bit-for-bit (sim_topk_hamming),
    and the sketch column is 8 bytes vs 512 for a 64-dim float64 array
    (64x smaller scan than floats, ~8x smaller than int8 codes).
    Recall vs the float ranking is pinned by
    sim_recall_hamming_vs_bruteforce — coarser than int8 (1 bit/dim vs
    8), it is the candidate-GENERATION tier: sketch-rank a cheap
    shortlist, re-score survivors with int8 or float.

    Returns (query_id, vec_id, hamming, rank), ranked by
    (hamming asc, vec_id).  Zero/NULL vectors are excluded on both
    sides (NULL sketch).  Same scale contract as topk_bruteforce:
    bounded candidate sets, or compose with IVF/LSH blocking.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``hamming`` — the SERVING path: candidate sketches come from
    the saved table (n_bits adopted from the artifact), so
    ``candidates`` is never scanned; only the |Q|-sized query side
    sketches live.  Output is hash-identical to the inline build —
    gated by sim_topk_hamming_prebuilt.
    """
    if index is not None:
        if index.kind != "hamming":
            raise ValueError(f"need a hamming index, got {index.kind!r}")
        n_bits = index.meta["n_bits"]
        c = index.parts["codes"].select("vec_id", F.col("sk").alias("c_sk"))
    else:
        c = candidates.select(
            F.col(id_col).alias("vec_id"),
            sign_sketch(vec_col, n_bits).alias("c_sk"),
        ).filter(F.col("c_sk").isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"),
        sign_sketch(vec_col, n_bits).alias("q_sk"),
    ).filter(F.col("q_sk").isNotNull())
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            hamming_distance("c_sk", "q_sk").cast("long").alias("hamming"),
        )
    )
    return _two_stage_topk(scored, ["hamming", "vec_id"], k)


def topk_bruteforce_arrow(candidates: DataFrame, queries: DataFrame,
                          k: int = 5, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k scored by numpy matmul over Arrow batches.

    Same contract as :func:`topk_bruteforce` (unscoreable null/zero-
    norm vectors drop out of the ranking on both paths), with one
    restriction: ids must be integral (the Arrow batches are typed
    bigint).  Use for wide vectors.  The query set is collected to the
    driver (it must be small — it is broadcast in every strategy) and
    shipped once per executor; each ``mapInPandas`` batch emits only
    its partial top-k per query, so shuffle volume is
    O(batches × |Q| × k), not O(|C| × |Q|).
    """
    import numpy as np
    import pandas as pd

    # Enforce (not just document) the small-query-set contract: the
    # set is collected to the driver and broadcast, so an unbounded |Q|
    # is a driver OOM at scale.  limit(MAX+1) bounds the collect itself
    # — the guard never materializes a huge set just to refuse it.
    probe = queries.select(id_col, vec_col).limit(
        MAX_ARROW_QUERIES + 1
    ).collect()
    if len(probe) > MAX_ARROW_QUERIES:
        raise ValueError(
            f"topk_bruteforce_arrow: query set exceeds "
            f"{MAX_ARROW_QUERIES} rows; it is collected to the driver "
            "and broadcast — split the query set or use topk_ivf / "
            "topk_lsh_bucketed for large |Q|"
        )
    q_rows = [
        r for r in probe
        if r[1] is not None and any(x != 0 for x in r[1])
    ]
    if not q_rows:
        spark = candidates.sparkSession
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos_sim double, rank int"
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sc = candidates.sparkSession.sparkContext
    bc = sc.broadcast((qids, qn))

    def score(batches):
        b_qids, b_qn = bc.value
        m = len(b_qids)
        for pdf in batches:
            if pdf.empty:
                continue
            # drop null embeddings BEFORE stacking (np.stack raises on
            # None); they are unscoreable like zero-norm vectors below
            notnull = pdf[vec_col].notna()
            pdf = pdf[notnull]
            if pdf.empty:
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(cm, axis=1, keepdims=True)
            vec_ids = pdf[id_col].to_numpy()
            # Drop zero-norm candidates: cosine is undefined for them.
            # (topk_bruteforce's nullif path yields null, sorted last —
            # emitting NaN here would instead sort FIRST under desc.)
            ok = norms[:, 0] > 0
            if not ok.any():
                continue
            cm, norms, vec_ids = cm[ok], norms[ok], vec_ids[ok]
            sims = (cm / norms) @ b_qn.T  # (n, m)
            top = min(k + 1, len(vec_ids))  # +1 absorbs a self-match
            out_q, out_v, out_s = [], [], []
            for j in range(m):
                # lexsort = deterministic (cos_sim desc, vec_id asc)
                # order, so boundary TIES keep the same row the plain
                # column-fold path keeps — batch layout can't change
                # the result.  Prune on the ROUNDED score: the global
                # rank (and topk_bruteforce) order by 6dp-rounded
                # cos_sim, so pruning by raw sims could drop a row the
                # rounded order ranks higher at the k+1 boundary.
                order = np.lexsort((vec_ids, -np.round(sims[:, j], 6)))[:top]
                out_q.extend([b_qids[j]] * len(order))
                out_v.extend(vec_ids[order])
                out_s.extend(np.round(sims[order, j], 6))
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "cos_sim": out_s}
            )

    partial = candidates.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, vec_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        partial.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _init_centroids_hash(emb: DataFrame, k: int, vec_col: str,
                         id_col: str) -> list[tuple[int, list[float]]]:
    """Deterministic hash-stratified seeding: the 32-bit md5 bucket of
    the id splits the corpus into ``k`` strata; each stratum's seed is
    its minimum-(hash, id) vector.  Equivalent to a uniform random
    sample of ~k spread-out points (dense regions get proportionally
    more strata mass, like random init) but with NO rand() — retries,
    re-plans and repartitions reproduce the same model.  One shuffle of
    (stratum, hash, id, vec); empty strata (k close to n) just yield
    fewer seeds.
    """
    from vexere_lakehouse_pipeline_spark.operators import sampling

    h = sampling.hash_bucket_wide(F.col(id_col), "kmeans-init")
    picked = (
        emb.select(
            F.pmod(h, F.lit(k)).alias("_s"),
            h.alias("_h"),
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_s").orderBy("_h", "_id")
            ),
        )
        .filter(F.col("_rn") == 1)
        .filter(F.col("_v").isNotNull())
        .orderBy("_s")
        .collect()
    )
    return [
        (i, [float(x) for x in r["_v"]]) for i, r in enumerate(picked)
    ]


def train_kmeans(emb: DataFrame, k: int = 16, iters: int = 5,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 init: str = "hash_stratified") -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column; returns a
    centroid DataFrame ``(cluster int, centroid array<double>)`` ready
    to feed :func:`topk_ivf` as its coarse quantizer.

    Spark-idiomatic iteration shape (same as MLlib's KMeans):

    - centroids are *model state* — k × dim doubles — collected to the
      driver each round and re-broadcast as literal expressions, so the
      assignment step is a pure projection: NO join, NO shuffle, and
      executors stream the 100 TB side exactly once per iteration;
    - the update step is one groupBy(cluster) with per-dimension AVG —
      the only shuffle, and it moves k × dim partial sums per task,
      not data;
    - ``init`` is deterministic either way (no seeded rand, so
      retries/re-plans reproduce the same model):
      ``"hash_stratified"`` (default) seeds from k hash-strata minima —
      spread across the corpus regardless of id order, so sorted or
      correlated corpora don't start with every seed in one region;
      ``"first_k"`` is the pre-round-4 compat mode (first k vectors by
      id — clustering-quality-poor exactly on those sorted corpora,
      kept for model reproducibility);
    - empty clusters simply drop out (standard Lloyd behavior).
    """
    if init not in ("hash_stratified", "first_k"):
        raise ValueError(
            f"init must be hash_stratified|first_k, got {init!r}"
        )
    first = emb.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError(
            "train_kmeans needs a non-empty embedding frame with a "
            "non-null first vector"
        )
    dim = len(first[0])
    if init == "hash_stratified":
        cents = _init_centroids_hash(emb, k, vec_col, id_col)
    else:
        cents = [
            (i, [float(x) for x in r[0]])
            for i, r in enumerate(
                emb.orderBy(id_col).limit(k).select(vec_col).collect()
            )
        ]
    vec = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        choices = [
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(x) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist2"),
                F.lit(cid).alias("cluster"),
            )
            for cid, c in cents
        ]
        assigned = emb.withColumn(
            "cluster", F.array_min(F.array(*choices))["cluster"]
        )
        new_cents = (
            assigned.groupBy("cluster")
            .agg(*[F.avg(vec[i]).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        cents = sorted(
            (r["cluster"], [float(r[f"c{i}"]) for i in range(dim)])
            for r in new_cents
        )
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(cid, c) for cid, c in cents], "cluster int, centroid array<double>"
    )


def kmeans_assign(emb: DataFrame, centroids: DataFrame,
                  vec_col: str = "embedding") -> DataFrame:
    """Tag each row with its nearest trained centroid (squared-L2).
    Collects the (tiny) centroid table and assigns via a pure
    projection — the shuffle-free path used for IVF list assignment."""
    cents = [
        (r["cluster"], [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    ]
    vec = F.col(vec_col).cast("array<double>")
    choices = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(x) for x in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist2"),
            F.lit(cid).alias("cluster"),
        )
        for cid, c in cents
    ]
    best = F.array_min(F.array(*choices))
    return emb.withColumn("cluster", best["cluster"]).withColumn(
        "dist2", best["dist2"]
    )


# Exact k-NN graph ceiling: the exact strategy is an O(N²) pairwise
# scoring (broadcast self cross-join).  Past this row count the right
# tool is the LSH-bucketed strategy (approximate, recall-gated the same
# way sim_recall_lsh_vs_bruteforce pins topk recall).
MAX_EXACT_KNN_ROWS = 100_000


def knn_graph(emb: DataFrame, k: int = 3, vec_col: str = "embedding",
              id_col: str = "vec_id", strategy: str = "exact",
              n_bits: int = 4, n_tables: int = 1,
              index=None) -> DataFrame:
    """k-nearest-neighbor graph over a single embedding table.

    Returns (src, dst, cos_sim, rnk) — each vector's top-``k`` cosine
    neighbors (self excluded), ranked by (cos_sim desc, dst) after 6dp
    rounding.  The edge list feeds graph clustering, label propagation,
    and diversity-aware sampling over a corpus.

    Strategies:

    - ``exact``: a two-phase exact scorer.  Phase 1 prunes candidates
      with the Arrow/numpy matmul path (``topk_bruteforce_arrow`` with
      the table as its own query set, kept to k+MARGIN per query — the
      column-fold cross-join evaluates the dot product as an
      interpreted HOF per pair and is ~60× slower).  Phase 2 re-scores
      the O(N·k) survivors with the column-fold expression, so the
      EMITTED cos_sim is the exact expression tree the DuckDB oracle
      computes (numpy's normalize-then-matmul + banker's rounding can
      differ in the 6th decimal; the fold is the contract).  The
      margin absorbs rank flips inside the ulp-noise band — Arrow vs
      fold scores differ by at most a few ulps, so a true top-k
      neighbor cannot sit more than MARGIN ranks down the Arrow
      ordering.  Inherently quadratic in phase 1 — enforced ceiling of
      MAX_EXACT_KNN_ROWS rows; right for evaluation sets and
      per-cluster refinement, never for the full corpus.
    - ``lsh``: sign-LSH bucket self-join — each vector is scored only
      against its bucket, one equi-join shuffle, linear in bucket
      volume.  Approximate: vectors whose true neighbors land in other
      buckets lose them (recall is data-dependent; gate it against the
      exact strategy on a sample, as the recall@k query does for
      top-k search).
    """
    if strategy not in ("exact", "lsh"):
        raise ValueError(f"unknown knn_graph strategy {strategy!r}")
    if index is not None and strategy != "lsh":
        raise ValueError(
            "index= serving is the lsh strategy — pass strategy='lsh'"
        )
    if strategy == "exact":
        n = emb.count()
        if n > MAX_EXACT_KNN_ROWS:
            raise ValueError(
                f"knn_graph(strategy='exact') is O(N²) and capped at "
                f"{MAX_EXACT_KNN_ROWS} rows (got {n}); use strategy='lsh'"
            )
        # Margin bounds how far a true top-k neighbor can sit down the
        # Arrow ordering when Arrow-rounded and fold-rounded scores
        # disagree.  Disagreement needs a raw score within ~ulps of a
        # 0.5e-6 boundary AND different accumulation error between the
        # two paths; 16 slots of headroom covers any plausible pile-up
        # at one boundary (exact TIES are harmless — both paths order
        # ties identically by id).  Phase-2 cost is O(N·(k+margin))
        # folds — raising the margin is cheap insurance.
        margin = 16
        pruned = topk_bruteforce_arrow(
            emb, emb, k=k + margin, vec_col=vec_col, id_col=id_col
        ).select(
            F.col("query_id").alias("src"), F.col("vec_id").alias("dst")
        )
        sides = emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_e"),
            l2_norm(vec_col).alias("_n"),
        )
        rescored = (
            pruned.join(
                sides.withColumnsRenamed(
                    {"_id": "src", "_e": "a_emb", "_n": "a_norm"}
                ),
                on="src",
            )
            .join(
                sides.withColumnsRenamed(
                    {"_id": "dst", "_e": "b_emb", "_n": "b_norm"}
                ),
                on="dst",
            )
            .select(
                "src",
                "dst",
                F.round(
                    cosine_from_norms("a_emb", "b_emb", "a_norm", "b_norm"),
                    6,
                ).alias("cos_sim"),
            )
            .filter(F.col("cos_sim").isNotNull())
        )
        w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
        return (
            rescored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
        )
    elif index is not None:
        # SERVING path (lsh artifact): the bucket self-join carries
        # only (vec_id, t, bucket); float vectors are late-fetched per
        # surviving pair from the saved vecs part — same output as the
        # inline lsh strategy (identical expression trees), narrower
        # shuffle.  n_bits/n_tables come from the artifact.
        if index.kind != "lsh":
            raise ValueError(f"need an lsh index, got {index.kind!r}")
        nb = index.parts["buckets"]
        pa = nb.select("t", "bucket", F.col("vec_id").alias("src"))
        pb = nb.select("t", "bucket", F.col("vec_id").alias("dst"))
        # distinct() == the old keep-first-table window here: only the
        # (src, dst) set survives this step (guide §2.3 — hash
        # aggregate with map-side partial vs full shuffle + sort)
        pairs = (
            pa.join(pb, on=["t", "bucket"])
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        v = index.parts["vecs"]
        scored = (
            pairs.join(
                v.select(F.col("vec_id").alias("src"),
                         F.col("emb").alias("a_emb"),
                         F.col("c_norm").alias("a_norm")),
                on="src",
            )
            .join(
                v.select(F.col("vec_id").alias("dst"),
                         F.col("emb").alias("b_emb"),
                         F.col("c_norm").alias("b_norm")),
                on="dst",
            )
            .select(
                "src",
                "dst",
                F.round(
                    cosine_from_norms("a_emb", "b_emb", "a_norm",
                                      "b_norm"), 6
                ).alias("cos_sim"),
            )
            .filter(F.col("cos_sim").isNotNull())
        )
        w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
        )
    else:
        base = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("emb"),
            l2_norm(vec_col).alias("norm"),
        )
        if n_tables == 1:
            bucketed = base.withColumn(
                "bucket", sign_lsh_bucket("emb", n_bits)
            )
            a = bucketed.select(
                "bucket",
                F.col("vec_id").alias("src"),
                F.col("emb").alias("a_emb"),
                F.col("norm").alias("a_norm"),
            )
            b = bucketed.select(
                "bucket",
                F.col("vec_id").alias("dst"),
                F.col("emb").alias("b_emb"),
                F.col("norm").alias("b_norm"),
            )
            pairs = a.join(b, on=["bucket"])
        else:
            # union semantics: score each (src, dst) pair once no
            # matter how many tables co-bucketed it.  Round-11 (guide
            # §2.3/§8, r10 verdict #3): same shape as the serving
            # path — the bucket self-join + dedup carry only ids (the
            # old row_number window shuffled and sorted every
            # bucket-collision row with both float arrays aboard) and
            # the vectors are late-fetched for surviving pairs.
            ids = base.select(
                "vec_id",
                F.explode(_table_buckets("emb", n_bits, n_tables)).alias(
                    "tb"
                ),
            ).select("vec_id", "tb.t", "tb.bucket")
            pairs = (
                ids.select("t", "bucket", F.col("vec_id").alias("src"))
                .join(
                    ids.select("t", "bucket", F.col("vec_id").alias("dst")),
                    on=["t", "bucket"],
                )
                .filter(F.col("src") != F.col("dst"))
                .select("src", "dst")
                .distinct()
            )
            pairs = pairs.join(
                base.select(F.col("vec_id").alias("src"),
                            F.col("emb").alias("a_emb"),
                            F.col("norm").alias("a_norm")),
                on="src",
            ).join(
                base.select(F.col("vec_id").alias("dst"),
                            F.col("emb").alias("b_emb"),
                            F.col("norm").alias("b_norm")),
                on="dst",
            )
    scored = (
        pairs.filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(
                cosine_from_norms("a_emb", "b_emb", "a_norm", "b_norm"), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim").isNotNull())
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "dst")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def hard_negative_candidates(emb: DataFrame, k: int = 2,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training: each vector's
    top-``k`` most-similar neighbors with a DIFFERENT label — the
    "looks alike, isn't" examples a contrastive loss learns most from.

    Exact strategy with the same enforced ceiling as exact k-NN
    (pairwise scoring is O(N²)); at corpus scale run it per LSH bucket
    or per k-means cluster exactly like ``knn_graph(strategy='lsh')`` —
    the label filter composes with any blocked pair generator.
    Returns (src, neg, cos_sim, rnk).
    """
    from pyspark.sql import Window

    from vexere_lakehouse_pipeline_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm,
    )

    n = emb.count()
    if n > MAX_EXACT_KNN_ROWS:
        raise ValueError(
            f"exact hard-negative mining is O(N^2); {n} rows exceeds the "
            f"{MAX_EXACT_KNN_ROWS} ceiling — block by LSH bucket/cluster"
        )
    a = emb.select(
        F.col(id_col).alias("src"),
        F.col(label_col).alias("label_a"),
        F.col(vec_col).alias("emb_a"),
        l2_norm(vec_col).alias("norm_a"),
    )
    b = emb.select(
        F.col(id_col).alias("neg"),
        F.col(label_col).alias("label_b"),
        F.col(vec_col).alias("emb_b"),
        l2_norm(vec_col).alias("norm_b"),
    )
    scored = (
        a.join(b, F.col("label_a") != F.col("label_b"))
        .select(
            "src",
            "neg",
            F.round(
                cosine_from_norms("emb_a", "emb_b", "norm_a", "norm_b"), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "neg")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def quantize_int8_unit(df: DataFrame, vec_col: str = "embedding",
                       out_col: str = "q8") -> DataFrame:
    """Symmetric int8 quantization of the UNIT vector: q_i =
    clamp(round(v_i / |v| * 127), -127, 127) as array<long>.

    Normalize-then-quantize is the standard int8-cosine trick: every
    vector shares the 127 scale, so an integer dot product of two
    codes ranks candidates like (approximate) cosine — no per-vector
    scale factors to rescale by at query time.  Zero/NULL vectors get
    a NULL code (cosine undefined — same exclusion contract as the
    float paths).  At 100 TB this is the memory-bandwidth play,
    MEASURED not asserted (tools/int8_bytes_probe.py → SCALE.md): on
    the sf0.1 corpus replicated 64x and stored as array<tinyint>, the
    vector column's parquet chunks are 27.9x smaller than the float64
    twin's (2.27 MB vs 63.4 MB) — raw width gives 8x, and the narrow
    int8 domain dictionary/RLE-encodes on top while random doubles
    don't compress at all.

    Engine-portable, with one stated caveat: the divide/multiply/round
    tree is mirrored in the DuckDB oracle (sim_topk_int8), but the
    norm is this left-to-right F.aggregate fold vs DuckDB's
    list_dot_product — the codes agree because both engines accumulate
    sequentially left-to-right (the same already-gated assumption the
    float _DUCK_COS pattern rests on), NOT because the trees are
    literally identical.  If either engine ever vectorized its fold, a
    value landing exactly on a round() .5 boundary could flip one code;
    the downstream int64 dot products are unconditionally exact.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # Round-10: the norm is hoisted into its own projection and
    # referenced as a column — interpreted lambda bodies re-evaluate
    # their whole subtree per array element, so the previous inline
    # ``x / nrm * 127`` form paid the full norm fold once PER ELEMENT
    # (64 folds/row).  Values are bit-identical (same expression, same
    # row); CollapseProject keeps the hoist because the alias is
    # non-trivial and referenced twice.
    if "__q8_nrm" in df.columns:
        # the scratch column would silently overwrite (and then drop)
        # a caller column of the same name — refuse loudly (ADVICE r10)
        raise ValueError(
            "quantize_int8_unit: input already has a '__q8_nrm' column"
        )
    code = F.transform(
        v,
        lambda x: F.least(
            F.greatest(F.round(x / F.col("__q8_nrm") * 127, 0),
                       F.lit(-127.0)),
            F.lit(127.0),
        ).cast("long"),
    )
    return (
        df.withColumn("__q8_nrm", nrm)
        .withColumn(
            out_col,
            F.when(F.col("__q8_nrm") > 0, code),  # NULL for zero/NULL
        )
        .drop("__q8_nrm")
    )


def topk_int8(candidates: DataFrame, queries: DataFrame, k: int = 5,
              vec_col: str = "embedding", id_col: str = "vec_id",
              index=None) -> DataFrame:
    """Approximate cosine top-k over int8 unit-vector codes — the
    quantized twin of :func:`topk_bruteforce`.

    Scoring is a pure INTEGER dot product of the codes (|dot| ≤
    127²·dims ≪ 2⁶³ — exact int64, which is what lets the DuckDB
    oracle verify the ranking bit-for-bit, unlike any float score).
    Returns (query_id, vec_id, dot_q, rank), ranked by
    (dot_q desc, vec_id).  Recall vs the float ranking is pinned by
    the sim_recall_int8_vs_bruteforce gate.

    Same scale contract as topk_bruteforce: exact scoring is for
    bounded candidate sets; compose with IVF/LSH blocking for corpus-
    scale serving (stored as array<tinyint> parquet, the codes make
    each block's scan ~28x cheaper in measured column-chunk bytes —
    tools/int8_bytes_probe.py, SCALE.md).

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``int8`` — candidate codes come from the saved table, so
    ``candidates`` is never scanned at serve time; only the |Q|-sized
    query side quantizes live.  Output is hash-identical to the
    inline build — gated by sim_topk_int8_prebuilt.
    """
    q = quantize_int8_unit(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("q8").alias("qq")
    ).filter(F.col("qq").isNotNull())
    if index is not None:
        if index.kind != "int8":
            raise ValueError(f"need an int8 index, got {index.kind!r}")
        c = index.parts["codes"]
    else:
        c = quantize_int8_unit(candidates, vec_col).select(
            F.col(id_col).alias("vec_id"), "q8"
        ).filter(F.col("q8").isNotNull())
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("q8"), F.col("qq"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_q"),
        )
    )
    return _two_stage_topk(scored, [F.desc("dot_q"), "vec_id"], k)


def sq8_params(emb: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """Per-dimension affine SQ8 quantizer parameters (FAISS
    ScalarQuantizer QT_8bit): (pos, mn, mx, scale_micro) from the
    corpus's UNIT vectors — one posexplode + one min/max aggregate
    (map-side partial, dims-sized output; the "model" is 64 rows).

    Stronger portability story than any mean-based trainer: MIN/MAX
    are order-INSENSITIVE exact double aggregates, so both engines
    recover identical parameters without the left-to-right-fold
    assumption.  ``scale_micro`` = round(1e6·(mx−mn)/255) clamped ≥ 1
    (a constant dimension carries code 0 on both sides, so its scale
    never matters — the clamp only keeps downstream integer math
    well-defined)."""
    # norm hoisted to a column so the per-element division doesn't
    # re-run the whole fold per element (round-10, see quantize_int8_unit)
    nrm = l2_norm(F.col(vec_col))
    # The when() guard is a no-op for surviving rows (the filter above
    # already requires _nrm > 0) but gives _nrm a SECOND static
    # reference — CollapseProject inlines a single-use non-trivial
    # alias back into the consumer, which would restore the
    # fold-per-element evaluation this hoist removes.
    u = F.when(
        F.col("_nrm") > 0,
        F.transform(
            F.transform(F.col("_raw"), lambda x: x.cast("double")),
            lambda x: x / F.col("_nrm"),
        ),
    )
    dims = (
        emb.filter(F.col(vec_col).isNotNull() & (nrm > 0))
        .select(F.col(vec_col).alias("_raw"), nrm.alias("_nrm"))
        .select(F.posexplode(u).alias("pos", "x"))
    )
    return dims.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    ).select(
        "pos", "mn", "mx",
        F.greatest(
            F.round(F.lit(1000000.0) * (F.col("mx") - F.col("mn")) / 255, 0),
            F.lit(1.0),
        ).cast("long").alias("scale_micro"),
    )


def sq8_encode(df: DataFrame, params: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id",
               out_id: str = "vec_id") -> DataFrame:
    """(out_id, sq8): each unit-vector dimension affine-coded to
    0..255 then PRE-SCALED by its dimension's scale_micro —
    sq8[i] = clamp(round(255·(u_i−mn_i)/(mx_i−mn_i)), 0, 255) ·
    scale_micro_i as one bigint, so the pair distance needs no
    per-dimension scale lookup: (a_i − b_i) already carries the scale
    ((ca−cb)·s = ca·s − cb·s), and Σ(a_i−b_i)² ≈ 1e12·‖u_a−u_b‖² is
    EXACT int64 arithmetic (≤ 64·(255·scale)² ≈ 2.6e14 ≪ 2⁶³) —
    bit-portable ranking, like every integer tier.  Zero/NULL vectors
    are excluded (cosine undefined)."""
    # norm hoisted to a column so the per-element division doesn't
    # re-run the whole fold per element (round-10, see quantize_int8_unit)
    nrm = l2_norm(F.col(vec_col))
    # The when() guard is a no-op for surviving rows (the filter above
    # already requires _nrm > 0) but gives _nrm a SECOND static
    # reference — CollapseProject inlines a single-use non-trivial
    # alias back into the consumer, which would restore the
    # fold-per-element evaluation this hoist removes.
    u = F.when(
        F.col("_nrm") > 0,
        F.transform(
            F.transform(F.col("_raw"), lambda x: x.cast("double")),
            lambda x: x / F.col("_nrm"),
        ),
    )
    exploded = (
        df.filter(F.col(vec_col).isNotNull() & (nrm > 0))
        .select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias("_raw"),
            nrm.alias("_nrm"),
        )
        .select(out_id, F.posexplode(u).alias("pos", "x"))
        .join(F.broadcast(params), on="pos")
        .select(
            out_id, "pos",
            (
                F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
                .otherwise(
                    F.least(
                        F.greatest(
                            F.round(
                                F.lit(255.0) * (F.col("x") - F.col("mn"))
                                / (F.col("mx") - F.col("mn")),
                                0,
                            ),
                            F.lit(0.0),
                        ),
                        F.lit(255.0),
                    ).cast("long")
                )
                * F.col("scale_micro")
            ).alias("sc"),
        )
    )
    return exploded.groupBy(out_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sc"))),
            lambda s: s["sc"],
        ).alias("sq8")
    )


def topk_sq8(candidates: DataFrame, queries: DataFrame, k: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id",
             params: DataFrame | None = None,
             index=None) -> DataFrame:
    """Approximate cosine top-k over per-dimension affine SQ8 codes —
    the scalar-quantization rung of the compression ladder, between
    int8-unit (symmetric, global 127 scale) and PQ (codebooks): one
    byte per dimension, but each dimension uses its OWN corpus range,
    so dimensions with narrow spread lose less precision than the
    global-scale int8 code.

    Scoring is Σ(sq_a − sq_b)² over the pre-scaled codes — exact
    int64, ranked (d2_sq8 asc, vec_id); on unit vectors squared-L2
    ranks like cosine.  Returns (query_id, vec_id, d2_sq8, rank).
    Recall vs the float truth is pinned by
    sim_recall_sq8_vs_bruteforce.  Same scale contract as
    topk_bruteforce: bounded candidate sets, or compose with IVF/LSH
    blocking; codes store as array<smallint>-equivalent parquet with
    the measured ~20-28x column-chunk reduction of the integer tiers.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``sq8`` — the SERVING path.  Params AND candidate codes come
    from the saved tables, so ``candidates`` is never scanned at
    serve time (pass it only for the id contract); only the |Q|-sized
    query side encodes.  Output is hash-identical to the inline
    build — gated by sim_topk_sq8_prebuilt.
    """
    if index is not None:
        if index.kind != "sq8":
            raise ValueError(f"need an sq8 index, got {index.kind!r}")
        params = index.parts["params"]
        c = index.parts["codes"]
    else:
        if params is None:
            params = sq8_params(candidates, vec_col, id_col)
        # dims-sized model state (64 rows): pin so the corpus-scan
        # aggregate behind it runs once, not once per encode side.  The
        # pinned blocks are KBs and die with the app; callers that loop
        # over many corpora should pass a precomputed `params` instead.
        params = params.localCheckpoint(eager=False)
        c = sq8_encode(candidates, params, vec_col, id_col, "vec_id")
    q = sq8_encode(queries, params, vec_col, id_col, "query_id").select(
        "query_id", F.col("sq8").alias("qq")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("sq8"), F.col("qq"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2_sq8"),
        )
    )
    return _two_stage_topk(scored, ["d2_sq8", "vec_id"], k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the classic ANN compression path
# (Jégou et al. 2011; the FAISS `PQ`/`IVFPQ` family): split each unit
# vector into m subvectors, replace every subvector by the id of its
# nearest codebook entry, and score queries against the CODES with an
# asymmetric-distance lookup table (ADC).  Codes are m small ints per
# vector (m=8 vs 64 float64s = 64x fewer raw bytes before parquet's
# dictionary/RLE even starts), so the corpus scan that dominates
# serving moves ~two orders of magnitude less data than the float
# path — the same memory-bandwidth play the int8 rows measure, taken
# further at the cost of more ranking error (pinned by the
# sim_recall_pq_vs_bruteforce gate).
# ---------------------------------------------------------------------------


def _unit_subvectors(df: DataFrame, m: int, vec_col: str, id_col: str,
                     out_id: str, n_parts: int | None = None) -> DataFrame:
    """(out_id, s, sv): the m per-subspace slices of the UNIT vector.

    Vectors are L2-normalized first so squared-L2 ADC ranking equals
    cosine ranking (d² = 2 − 2·cos on the unit sphere); zero/NULL
    vectors are excluded (cosine undefined — the exclusion contract
    every similarity path shares).  The subspace width is
    ``size(vec) DIV m`` per row; trailing remainder dims are truncated
    (PQ's standard pad-or-truncate choice, mirrored in the oracle).

    The exchange between normalization and explode is load-bearing
    twice over: (1) it MATERIALIZES the unit vector, so the interpreted
    higher-order transform+fold runs once per INPUT row — without the
    barrier, CollapseProject inlines that fold into every post-explode
    reference and the codebook build alone burned ~18 s CPU at sf0.1;
    (2) its explicit partition count pins the fan-out stages'
    parallelism against AQE's small-bytes coalescing (the rows are
    tiny but each carries ksub distance evals downstream).
    """
    nrm = l2_norm(F.col(vec_col))
    # Round-10: the norm fold is computed ONCE per row as a carried
    # column.  Interpreted lambda bodies re-evaluate their whole
    # subtree per array element, so the previous inline ``x / <fold>``
    # form paid the full fold 64 times per row — all of it on the
    # serial single-row-group scan task (four ~0.9s single-task stages
    # in the ivfpq profile; ~0.05s hoisted).  Values are bit-identical
    # (same expression, same row).
    pre = df.filter(F.col(vec_col).isNotNull() & (nrm > 0)).select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias("_raw"),
        nrm.alias("_nrm"),
    )
    # The when() guard is a no-op for surviving rows (the filter above
    # already requires _nrm > 0) but gives _nrm a SECOND static
    # reference — CollapseProject inlines a single-use non-trivial
    # alias back into the consumer, which would restore the
    # fold-per-element evaluation this hoist removes.
    u = F.when(
        F.col("_nrm") > 0,
        F.transform(
            F.transform(F.col("_raw"), lambda x: x.cast("double")),
            lambda x: x / F.col("_nrm"),
        ),
    )
    pre = pre.select(
        out_id,
        u.alias("_u"),
        F.floor(F.size(F.col("_raw")) / m).cast("int").alias("_dsub"),
    )
    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    pre = pre.repartition(n_parts, F.col(out_id))
    return (
        pre.select(
            out_id, "_u", "_dsub",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        )
        .select(
            out_id,
            F.col("s").cast("int").alias("s"),
            F.slice(
                "_u", F.col("s") * F.col("_dsub") + 1, F.col("_dsub")
            ).alias("sv"),
        )
    )


def _d2_micro(a, b, dsub: int | None = None) -> "F.Column":
    """Squared L2 distance between two double arrays in integer
    MICRO-units: round(1e6 · (a·a − 2·a·b + b·b)) as int64.

    The expansion (never elementwise (x−y)²) and the left-to-right
    ``(aa − 2·ab) + bb`` association are load-bearing: the DuckDB twin
    computes the same three list_dot_product folds in the same order,
    so both engines see identical doubles before the single round() —
    the same already-gated portability argument as quantize_int8_unit.
    Integer distances make every downstream sum/argmin/rank exact and
    order-independent.

    When the subspace width is statically known (``dsub``), the three
    dot products UNROLL into plain element_at arithmetic: higher-order
    array folds are codegen-EXCLUDED in Spark (interpreted per
    element, per row), and PQ evaluates this expression n·m·ksub
    times — unrolling measured ~8x on the encode stage.  The unrolled
    left-associated chain is bit-identical to the fold except that the
    fold's leading ``0.0 + x`` can flip a −0.0 to +0.0 — unobservable
    after the micro-unit round.
    """
    def dot(x, y, n):
        acc = F.element_at(x, 1) * F.element_at(y, 1)
        for i in range(2, n + 1):
            acc = acc + F.element_at(x, i) * F.element_at(y, i)
        return acc

    if dsub is not None:
        aa, ab, bb = dot(a, a, dsub), dot(a, b, dsub), dot(b, b, dsub)
    else:
        aa = F.aggregate(
            F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0),
            lambda acc, x: acc + x,
        )
        ab = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bb = F.aggregate(
            F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0),
            lambda acc, x: acc + x,
        )
    return F.round(F.lit(1000000.0) * (aa - F.lit(2.0) * ab + bb), 0).cast(
        "long"
    )


def pq_sampled_codebooks(emb: DataFrame, m: int = 8, ksub: int = 16,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """Deterministic SAMPLED codebooks: per subspace ``s``, the ``ksub``
    unit subvectors whose owners rank first by md5("<id>:<s>") become
    codes 0..ksub−1 (0-iteration k-means — sample-init without the
    averaging steps).  Selection-only training keeps the codebook
    bit-portable, which is what lets the whole PQ pipeline be
    oracle-gated; production swaps in trained centroids through the
    same (s, code, cv) contract (pluggable exactly like topk_ivf's
    ``centroids``).

    Scale: one narrow shuffle of n·m (id, hash-key) rows into m
    subspace partitions, top-ksub window each.  At corpus scale,
    hash-prefilter the training rows first (the rank key IS a uniform
    hash, so `md5 < threshold` preselects a superset of the winners
    without changing them).
    """
    sub = _unit_subvectors(emb, m, vec_col, id_col, "vec_id")
    return _sampled_codebooks_from_sub(sub, ksub)


def _sampled_codebooks_from_sub(sub: DataFrame, ksub: int) -> DataFrame:
    """The md5-ranked selection stage of :func:`pq_sampled_codebooks`
    over an arbitrary (vec_id, s, sv) subvector table — shared with
    the residual-PQ path, whose subvectors are u − coarse_centroid."""
    rank_key = F.md5(
        F.concat_ws(":", F.col("vec_id").cast("string"),
                    F.col("s").cast("string"))
    )
    w = Window.partitionBy("s").orderBy(rank_key, "vec_id")
    return (
        sub.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= ksub)
        .select(
            "s", (F.col("_rn") - 1).cast("int").alias("code"),
            F.col("sv").alias("cv"),
        )
    )


def pq_encode(emb: DataFrame, codebooks: DataFrame, m: int = 8,
              vec_col: str = "embedding",
              id_col: str = "vec_id",
              dsub: int | None = None) -> DataFrame:
    """(vec_id, s, code): each subvector replaced by its nearest
    codebook entry (argmin of integer micro-d², ties to the lower
    code).

    Plan shape: broadcast the (m·ksub)-row codebook, score every
    (row, s, code) triple inside codegen, then groupBy(vec_id, s) with
    ``min(struct(d2, code))`` — the argmin completes MAP-SIDE (all
    ksub candidates for a key live in the partition that exploded the
    row), so the shuffle carries exactly one narrow row per (vec, s).
    Linear n·m·ksub distance evals — the standard PQ encode cost
    (parallelism + fold materialization pinned by _unit_subvectors's
    explicit exchange — see its docstring).
    """
    sub = _unit_subvectors(emb, m, vec_col, id_col, "vec_id")
    return pq_encode_from_sub(sub, codebooks, dsub)


def pq_encode_from_sub(sub: DataFrame, codebooks: DataFrame,
                       dsub: int | None = None) -> DataFrame:
    """pq_encode's argmin stage over PRECOMPUTED (vec_id, s, sv)
    subvectors — lets callers that already hold (and e.g.
    localCheckpointed) the _unit_subvectors output reuse it instead of
    re-deriving the normalize+explode work per call
    (pq_train_codebooks iterates the encode; the slice is the
    expensive half)."""
    scored = sub.join(F.broadcast(codebooks), on="s").select(
        "vec_id", "s", "code",
        _d2_micro(F.col("sv"), F.col("cv"), dsub).alias("d2"),
    )
    # min_by over the (d2, code) struct = argmin with ties to the lower
    # code; unlike min(struct(...)) it stays hash-aggregable (no sort
    # of the n·m·ksub scored rows), and the partial agg still completes
    # map-side so the shuffle is one narrow row per (vec, s).
    return (
        scored.groupBy("vec_id", "s")
        .agg(
            F.min_by(
                "code", F.struct(F.col("d2"), F.col("code"))
            ).alias("code")
        )
    )


def topk_pq_adc(candidates: DataFrame, queries: DataFrame, k: int = 5,
                m: int = 8, ksub: int = 16,
                vec_col: str = "embedding", id_col: str = "vec_id",
                codebooks: DataFrame | None = None,
                dsub: int | None = None,
                index=None) -> DataFrame:
    """Approximate cosine top-k via PQ codes + asymmetric distance
    (ADC): candidates are scanned as CODES ONLY; each float query
    precomputes a (m × ksub) lookup table of micro-d² contributions,
    and a candidate's distance is the integer sum of m table lookups.

    Returns (query_id, vec_id, adc_d2_micro, rank), ranked ascending
    (smaller d² = more similar), ties to the lower vec_id.  Exact
    int64 arithmetic end-to-end from the per-cell round — bit-portable
    ranking, like topk_int8.

    Plan shape mirrors topk_bruteforce: the packed code table
    crossJoins the BROADCAST packed LUTs, and the m lookups run inside
    a codegen'd aggregate over the code array — no per-(pair, s) row
    blowup, no join-key shuffle; the candidate side never moves.  At
    100 TB the scan reads m small ints per vector instead of the float
    array, and the same codes serve every query batch.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``ivfpq`` — codebooks and packed codes come from the saved
    tables (the cid column is simply ignored: an unpruned ADC scan is
    IVF-PQ with nprobe = n_centroids), so ``candidates`` is never
    scanned at serve time.
    """
    if index is not None:
        if index.kind != "ivfpq":
            raise ValueError(f"need an ivfpq index, got {index.kind!r}")
        m, ksub = index.meta["m"], index.meta["ksub"]
        dsub = index.meta["dsub"]
        codebooks = index.parts["codebooks"]
        packed = index.parts["coded"].select("vec_id", "codes")
    else:
        if codebooks is None:
            codebooks = pq_sampled_codebooks(candidates, m, ksub,
                                             vec_col, id_col)
        # Round-11 (guide §5, r10 verdict #1): the codebook subtree is
        # referenced by the corpus encode AND the query LUT build; a
        # LAZY localCheckpoint truncates the logical plan at build
        # time, so Catalyst analyzes/optimizes the build lineage once
        # instead of once per reference (the measured driver-side wall
        # − stage-sum gap on the inline PQ/IVF-PQ rows).  eager=False:
        # no extra job — the pinned RDD computes (and is persisted)
        # inside the main action, and nothing outlives the query.
        codebooks = codebooks.localCheckpoint(eager=False)
        # pack candidate codes: one row per vector, codes[s] ordered by s
        packed = (
            pq_encode(candidates, codebooks, m, vec_col, id_col, dsub)
            .groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "code"))),
                    lambda x: x["code"],
                ).alias("codes")
            )
        )
    # per-query LUT: lut[s][code] = micro-d²(query subvector, codebook cv)
    qsub = _unit_subvectors(queries, m, vec_col, id_col, "query_id")
    cells = qsub.join(F.broadcast(codebooks), on="s").select(
        "query_id", "s", "code",
        _d2_micro(F.col("sv"), F.col("cv"), dsub).alias("d2"),
    )
    lut = (
        cells.groupBy("query_id", "s")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "d2"))),
                lambda x: x["d2"],
            ).alias("row")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "row"))),
                lambda x: x["row"],
            ).alias("lut")
        )
    )
    scored = (
        packed.crossJoin(F.broadcast(lut))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            # statically unrolled integer sum (exact, order-free) —
            # keeps the whole ADC scan inside whole-stage codegen
            sum(
                (
                    F.element_at(
                        F.element_at("lut", s + 1),
                        F.element_at("codes", s + 1) + 1,
                    )
                    for s in range(1, m)
                ),
                start=F.element_at(
                    F.element_at("lut", 1), F.element_at("codes", 1) + 1
                ),
            ).alias("adc_d2_micro"),
        )
    )
    return _two_stage_topk(scored, ["adc_d2_micro", "vec_id"], k)


# ---------------------------------------------------------------------------
# IVF-PQ — the composition that actually serves billion-vector ANN in
# production (FAISS IVFPQ): a coarse quantizer prunes WHICH vectors to
# score (inverted lists, nprobe of n_centroids), PQ codes shrink WHAT
# gets scanned per survivor (m small ints + m LUT lookups).  The two
# knobs multiply: nprobe/n_centroids cuts rows, PQ cuts bytes/row.
# This variant scores PQ codes of the raw unit vectors (no residual
# re-encoding, FAISS's "IVF,PQ" without OPQ/residuals) so the codes
# are shared with topk_pq_adc and the whole path stays oracle-exact.
# ---------------------------------------------------------------------------


def _unit_vecs(df: DataFrame, vec_col: str, id_col: str,
               out_id: str) -> DataFrame:
    """(out_id, u): the L2-normalized vector, zero/NULL excluded —
    same contract and same materialization barrier as
    :func:`_unit_subvectors` (the interpreted normalize fold runs once
    per row, behind an explicit exchange).

    Round-10: the norm is carried as a COLUMN (see _unit_subvectors) —
    interpreted lambda bodies are re-evaluated per array element, so
    the previous inline ``x / <fold>`` form paid the full norm fold 64
    times per row, all of it on the serial scan task."""
    nrm = l2_norm(F.col(vec_col))
    pre = df.filter(F.col(vec_col).isNotNull() & (nrm > 0)).select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias("_raw"),
        nrm.alias("_nrm"),
    )
    # The when() guard is a no-op for surviving rows (the filter above
    # already requires _nrm > 0) but gives _nrm a SECOND static
    # reference — CollapseProject inlines a single-use non-trivial
    # alias back into the consumer, which would restore the
    # fold-per-element evaluation this hoist removes.
    u = F.when(
        F.col("_nrm") > 0,
        F.transform(
            F.transform(F.col("_raw"), lambda x: x.cast("double")),
            lambda x: x / F.col("_nrm"),
        ),
    )
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        pre.select(out_id, u.alias("u"))
        .repartition(n_parts, F.col(out_id))
    )


def assign_ivf_lists(candidates: DataFrame, n_centroids: int = 32,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     dim: int | None = None,
                     centroids: DataFrame | None = None) -> DataFrame:
    """(vec_id, cid): nearest coarse centroid per candidate (argmin of
    integer micro-d² on unit vectors, ties to the lower centroid id).

    Centroids are the first ``n_centroids`` candidates BY ID — the
    same deterministic coarse quantizer topk_ivf documents (pluggable
    for trained centers in production; the list id is the column a
    100 TB table is partitioned/bucketed by, so probes touch only
    matching partitions).  ``dim`` statically unrolls the full-width
    distance (codegen) — pass it when the embedding width is known.
    ``centroids``: a pinned (cid, cu) table — the incremental-append
    path, where NEW rows must assign against the STORED coarse
    quantizer, never a re-derived one.
    """
    u = _unit_vecs(candidates, vec_col, id_col, "vec_id")
    cents = F.broadcast(
        centroids
        if centroids is not None
        else u.orderBy("vec_id").limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("u").alias("cu"))
    )
    scored = u.join(cents).select(
        "vec_id", "cid",
        _d2_micro(F.col("u"), F.col("cu"), dim).alias("d2"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("cid")
        )
    )


def _probe_lists(qd: DataFrame, packed: DataFrame, nprobe: int,
                 min_results: int | None) -> DataFrame:
    """Per-query probe-set selection for the IVF family: rank each
    query's centroid distances (``qd`` carries query_id, cid, d2 and
    any pass-through columns) and keep the lists it will scan.

    ``min_results=None`` — the classic fixed budget: rank ≤ nprobe.

    ``min_results=k`` — the ADAPTIVE budget filtered serving needs
    (round-8 verdict #1): under a selective ann_index_filter scope,
    probed lists can hold fewer than k in-scope rows, so a fixed
    nprobe silently returns short answers.  Production vector stores
    auto-raise the probe budget under filters (FAISS
    SearchParametersIVF.nprobe tuning, Milvus' guarantee levels); this
    is that behavior, declaratively: per query, take the SMALLEST
    prefix of its distance-ranked lists whose cumulative in-scope
    count (excluding the query's own row — the ``vec_id != query_id``
    contract) reaches ``min_results``, floored at ``nprobe``.  When
    the whole scope holds fewer than ``min_results`` rows, every list
    is probed and the serve returns all of them — never silently
    fewer while more exist.

    Cost: one cid-only aggregate over the (already scope-pruned)
    coded table — a single narrow column scan, map-side partial, tiny
    result (≤ n_centroids rows) — plus window work on |Q|×n_centroids
    rows.  Queries whose nprobe-prefix already covers k pay exactly
    the fixed-budget scan; only shortfall queries expand, and only as
    far as needed — the sweep in tools/FILTERED_ANN.md measures the
    budget tracking selectivity.  Guaranteed identical to the fixed
    budget when no query short-falls (pinned in
    tests/test_ann_index.py), so the unfiltered serve is unchanged.
    """
    wprobe = Window.partitionBy("query_id").orderBy("d2", "cid")
    ranked = qd.withColumn("_pr", F.row_number().over(wprobe))
    if min_results is None:
        return ranked.filter(F.col("_pr") <= nprobe)
    list_cnt = packed.groupBy("cid").agg(F.count(F.lit(1)).alias("_lc"))
    qids = qd.select("query_id").distinct()
    self_rows = (
        packed.select(F.col("vec_id").alias("query_id"), "cid")
        .join(F.broadcast(qids), "query_id")
        .withColumn("_self", F.lit(1))
    )
    wcum = (
        Window.partitionBy("query_id").orderBy("_pr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wq = Window.partitionBy("query_id")
    eff = (
        ranked.join(F.broadcast(list_cnt), "cid", "left")
        .join(F.broadcast(self_rows), ["query_id", "cid"], "left")
        .withColumn(
            "_ec",
            F.coalesce("_lc", F.lit(0)) - F.coalesce("_self", F.lit(0)),
        )
        .withColumn("_cum", F.sum("_ec").over(wcum))
    )
    need = F.min(
        F.when(F.col("_cum") >= min_results, F.col("_pr"))
    ).over(wq)
    # need is NULL when the scope can't fill min_results at all —
    # probe EVERY list (return whatever exists, never short silently)
    return eff.withColumn("_need", need).filter(
        F.col("_pr")
        <= F.greatest(
            F.lit(nprobe),
            F.coalesce(F.col("_need"), F.lit(2147483647)),
        )
    )


def topk_ivfpq(candidates: DataFrame, queries: DataFrame, k: int = 5,
               n_centroids: int = 32, nprobe: int = 8,
               m: int = 8, ksub: int = 16,
               vec_col: str = "embedding", id_col: str = "vec_id",
               codebooks: DataFrame | None = None,
               dsub: int | None = None,
               dim: int | None = None,
               index=None,
               min_results: int | None = None) -> DataFrame:
    """IVF-pruned PQ/ADC top-k: each query probes its ``nprobe``
    nearest inverted lists and ADC-scores ONLY those lists' codes.

    Returns (query_id, vec_id, adc_d2_micro, rank) like topk_pq_adc;
    results differ from the unpruned scan exactly where the true
    neighbor lives in an unprobed list — that loss is the recall gate's
    to measure.  Scan work: |C|·nprobe/n_centroids rows × m ints.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``ivfpq`` — the SERVING path.  Centroids/codebooks/coded
    vectors come from the saved tables (hyperparameters adopted from
    ``index.meta``; ``nprobe``/``k`` stay serve-time knobs) and the
    corpus-scale training/encode/join work is skipped entirely:
    ``candidates`` is not touched at this tier (pass it for the
    rerank tier or the ``vec_id != query_id`` contract only).  Output
    is hash-identical to the inline build — gated by
    sim_topk_ivfpq_rerank_prebuilt.

    ``min_results``: opt-in adaptive probe budget (see
    :func:`_probe_lists`) — pass ``k`` when serving a filtered index
    view so every query keeps k in-scope answers whenever the scope
    holds them; gated by sim_topk_filtered_ivfpq_prebuilt.
    """
    if index is not None:
        if index.kind != "ivfpq":
            raise ValueError(f"need an ivfpq index, got {index.kind!r}")
        n_centroids = index.meta["n_centroids"]
        m, ksub = index.meta["m"], index.meta["ksub"]
        dsub, dim = index.meta["dsub"], index.meta["dim"]
        codebooks = index.parts["codebooks"]
        cents = F.broadcast(index.parts["centroids"])
        # codes + list id in ONE saved table: the corpus-scale
        # codes ⋈ lists join was paid at build time, a serve just
        # scans (and at 100 TB, cid-partition-prunes) this table
        packed = index.parts["coded"]
    else:
        if codebooks is None:
            codebooks = pq_sampled_codebooks(candidates, m, ksub,
                                             vec_col, id_col)
        # Round-11 (guide §5, r10 verdict #1): lazy plan pins on the
        # stages the rest of the query references more than once —
        # codebooks feed the corpus encode AND the query LUT build,
        # packed feeds the ADC scan and (under min_results) the
        # adaptive-probe list counts.  Truncating the logical plan
        # here stops Catalyst re-optimizing the whole build lineage
        # per reference (the measured driver-side gap: ~3-4 s wall
        # over ~3 s of stages on the inline ivfpq rows).  eager=False
        # adds no job; the RDD computes once inside the main action.
        codebooks = codebooks.localCheckpoint(eager=False)
        # ONE pinned centroid table shared by the assignment argmin
        # and the query-probe side (identical expression tree — the
        # same first-n_centroids-by-id quantizer either way); before
        # this the two sites each carried their own copy of the full
        # normalize lineage through the optimizer
        cents_tbl = (
            _unit_vecs(candidates, vec_col, id_col, "vec_id")
            .orderBy("vec_id").limit(n_centroids)
            .select(F.col("vec_id").alias("cid"), F.col("u").alias("cu"))
            .localCheckpoint(eager=False)
        )
        lists = assign_ivf_lists(candidates, n_centroids, vec_col, id_col,
                                 dim, centroids=cents_tbl)
        cents = F.broadcast(cents_tbl)
        # packed codes + list id
        packed = (
            pq_encode(candidates, codebooks, m, vec_col, id_col, dsub)
            .groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "code"))),
                    lambda x: x["code"],
                ).alias("codes")
            )
            # codes ⋈ lists is the one data-scale x data-scale join in
            # the similarity family (neither side broadcasts at 100 TB
            # — both have one row per corpus vector).  shuffle_hash
            # beats the default sort-merge: the key is unique on both
            # sides, so the two full sorts buy nothing; at scale both
            # tables would be bucketed by vec_id and the shuffle
            # disappears entirely.  (The prebuilt-index path above
            # removes the join from serving altogether.)
            .join(lists.hint("shuffle_hash"), on="vec_id")
        ).localCheckpoint(eager=False)
    # queries probe their nprobe nearest centroids
    qu = _unit_vecs(queries, vec_col, id_col, "query_id")
    qd = qu.join(cents).select(
        "query_id", "cid",
        _d2_micro(F.col("u"), F.col("cu"), dim).alias("d2"),
    )
    probed = _probe_lists(qd, packed, nprobe, min_results).select(
        "query_id", "cid"
    )
    qsub = _unit_subvectors(queries, m, vec_col, id_col, "query_id")
    cells = qsub.join(F.broadcast(codebooks), on="s").select(
        "query_id", "s", "code",
        _d2_micro(F.col("sv"), F.col("cv"), dsub).alias("d2"),
    )
    lut = (
        cells.groupBy("query_id", "s")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "d2"))),
                lambda x: x["d2"],
            ).alias("row")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "row"))),
                lambda x: x["row"],
            ).alias("lut")
        )
        # fan LUTs out per probed list — both sides are query-scale
        # (|Q| and |Q|·nprobe rows), broadcast explicitly
        .join(F.broadcast(probed), on="query_id")
    )
    scored = (
        packed.join(F.broadcast(lut), on="cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            sum(
                (
                    F.element_at(
                        F.element_at("lut", s + 1),
                        F.element_at("codes", s + 1) + 1,
                    )
                    for s in range(1, m)
                ),
                start=F.element_at(
                    F.element_at("lut", 1), F.element_at("codes", 1) + 1
                ),
            ).alias("adc_d2_micro"),
        )
    )
    return _two_stage_topk(scored, ["adc_d2_micro", "vec_id"], k)


def pq_train_codebooks(emb: DataFrame, m: int = 8, ksub: int = 16,
                       iters: int = 3,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       dsub: int | None = None) -> DataFrame:
    """k-means-trained PQ codebooks (Lloyd's, all m subspaces jointly):
    init from the deterministic sampled codebooks, then iterate
    assign (pq_encode's integer argmin — bit-stable) / update (mean of
    assigned subvectors per (s, code)).  Returns the same (s, code,
    cv) contract as pq_sampled_codebooks, so it drops into
    topk_pq_adc/topk_ivfpq unchanged — this is the quality path whose
    recall improvement over sampled init is pinned in
    tests/test_dedup_similarity.py (the float means are not
    engine-portable, so the ORACLE rows stay on sampled codebooks —
    same split as train_kmeans vs the first-k IVF default).

    Cost per iteration: one n·m·ksub encode + one per-dimension mean
    over n·m·dsub narrow rows — both map-side-partial, both linear.  A
    code that loses all its members keeps its previous centroid (no
    empty-cluster collapse).
    """
    cbs = pq_sampled_codebooks(emb, m, ksub, vec_col, id_col)
    sub = _unit_subvectors(emb, m, vec_col, id_col, "vec_id")
    return _train_codebooks_from_sub(sub, cbs, iters, dsub)


def _train_codebooks_from_sub(sub: DataFrame, cbs: DataFrame, iters: int,
                              dsub: int | None = None) -> DataFrame:
    """The Lloyd's assign/update loop of :func:`pq_train_codebooks`
    over an arbitrary (vec_id, s, sv) subvector table and initial
    (s, code, cv) codebooks — shared with the residual-PQ path."""
    sub = sub.localCheckpoint(eager=True)  # reuse across iterations
    for _ in range(iters):
        # encode from the CHECKPOINTED subvectors — the normalize +
        # slice work runs once, not once per iteration
        assigned = pq_encode_from_sub(sub, cbs, dsub)
        # distributed mean: per-dimension partial-aggregable avg (never
        # collect_list of member vectors — that would buffer whole
        # clusters per task), then rebuild the dsub-wide array
        means = (
            sub.join(assigned, on=["vec_id", "s"])
            .select(
                "s", "code",
                F.posexplode(F.col("sv")).alias("pos", "x"),
            )
            .groupBy("s", "code", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("s", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda e: e["mx"],
                ).alias("new_cv")
            )
        )
        cbs = (
            cbs.join(means, on=["s", "code"], how="left")
            .select(
                "s", "code",
                F.coalesce("new_cv", "cv").alias("cv"),
            )
            .localCheckpoint(eager=True)  # pin; avoid lineage explosion
        )
    return cbs


def ivfpq_residual_state(candidates: DataFrame, n_centroids: int = 32,
                         m: int = 8, ksub: int = 16,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         dsub: int | None = None, dim: int | None = None,
                         train_iters: int = 0,
                         centroids: DataFrame | None = None,
                         codebooks: DataFrame | None = None,
                         ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Corpus-side residual IVF-PQ state — (centroids, codebooks,
    coded) with coded = (vec_id, cid, codes) — shared VERBATIM by the
    inline :func:`topk_ivfpq_residual` path and
    ``ann_index_build(kind='ivfpq_residual')``, so a prebuilt serve is
    bit-identical to the inline call by construction.  ``centroids``/
    ``codebooks`` pin previously-stored state (the incremental-append
    path: new rows encode against the stored quantizers, no retrain).
    """
    u = _unit_vecs(candidates, vec_col, id_col, "vec_id")
    if centroids is None:
        centroids = (
            u.orderBy("vec_id").limit(n_centroids)
            .select(F.col("vec_id").alias("cid"), F.col("u").alias("cu"))
            # n_centroids rows, referenced by the assignment argmin
            # AND the caller's query-probe side — lazy plan pin (§5)
            .localCheckpoint(eager=False)
        )
    cents = F.broadcast(centroids)
    # assignment keeps the winning centroid VECTOR too — the residual
    # needs it, and min_by over the struct avoids a second join
    best = (
        u.join(cents)
        .select(
            "vec_id", "u", "cid", "cu",
            _d2_micro(F.col("u"), F.col("cu"), dim).alias("d2"),
        )
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("cid", "cu", "u"), F.struct(F.col("d2"), F.col("cid"))
            ).alias("b")
        )
    )
    res = best.select(
        "vec_id",
        F.col("b.cid").alias("cid"),
        F.zip_with("b.u", "b.cu", lambda a, c: a - c).alias("r"),
    )
    n_parts = candidates.sparkSession.sparkContext.defaultParallelism
    # same materialization barrier as _unit_subvectors: the zip_with
    # residual is an interpreted HOF — pin it behind an exchange so it
    # computes once per row, not once per post-explode reference.
    # Round-11: ALSO truncate the plan (lazy, no extra job) — res is
    # referenced by the subvector explode AND the final codes ⋈ cid
    # join, so without the pin the whole assignment argmin lineage is
    # re-optimized (and its exchange re-planned) per reference
    # (guide §5 / r10 verdict #1 driver gap).
    res = res.repartition(n_parts, F.col("vec_id")).localCheckpoint(
        eager=False
    )
    rdsub = F.floor(F.size("r") / m).cast("int")
    rsub = (
        res.select(
            "vec_id", "r", rdsub.alias("_dsub"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        )
        .select(
            "vec_id",
            F.col("s").cast("int").alias("s"),
            F.slice(
                "r", F.col("s") * F.col("_dsub") + 1, F.col("_dsub")
            ).alias("sv"),
        )
    )
    if codebooks is None:
        codebooks = _sampled_codebooks_from_sub(rsub, ksub)
        if train_iters > 0:
            codebooks = _train_codebooks_from_sub(rsub, codebooks,
                                                  train_iters, dsub)
    # used by 2 arms (encode + per-list query LUTs); lazy pin = same
    # dedup as the previous eager pin without the extra count() job
    codebooks = codebooks.localCheckpoint(eager=False)
    packed = (
        pq_encode_from_sub(rsub, codebooks, dsub)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "code"))),
                lambda x: x["code"],
            ).alias("codes")
        )
        # codes ⋈ lists: both corpus-scale, key unique both sides —
        # shuffle_hash (bucketed-by-vec_id tables kill this shuffle
        # entirely at 100 TB); see topk_ivfpq
        .join(res.select("vec_id", "cid").hint("shuffle_hash"),
              on="vec_id")
        .select("vec_id", "cid", "codes")
    ).localCheckpoint(eager=False)
    return centroids, codebooks, packed


def topk_ivfpq_residual(candidates: DataFrame, queries: DataFrame,
                        k: int = 5, n_centroids: int = 32, nprobe: int = 8,
                        m: int = 8, ksub: int = 16,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        dsub: int | None = None, dim: int | None = None,
                        train_iters: int = 0, index=None,
                        min_results: int | None = None) -> DataFrame:
    """Residual IVF-PQ (FAISS "IVF,PQ" proper — Jégou et al. 2011 §III):
    PQ encodes the RESIDUAL r = u − coarse_centroid instead of the raw
    unit vector, and each query builds one LUT per probed list from its
    own residual qr = qu − cu.

    Why this beats raw-vector IVF-PQ at identical bytes: within a
    list, ‖qr − r‖² = ‖qu − u‖² exactly (the shared centroid cancels),
    but the residuals live in a ball of radius ≈ the cell size rather
    than the unit sphere, so the same m×ksub codebook budget quantizes
    a much smaller domain — finer cells, lower quantization error.
    The byte cost is UNCHANGED: candidates still scan as m small ints
    plus the list id (the coarse centroid is reconstructed from cid,
    never stored per row).

    ``train_iters > 0`` runs Lloyd's on the residual subvectors (the
    quality path, float means — recall floor pinned in pytest);
    ``train_iters = 0`` keeps the deterministic md5-sampled residual
    codebooks, which is the ORACLE-portable configuration
    (sim_topk_ivfpq_residual reproduces centroid assignment → residual
    → codebook → encode → per-list LUT → ADC bit-for-bit in DuckDB).

    Plan shape: the extra cost vs topk_ivfpq is the per-(query, list)
    LUT build — nprobe LUTs per query instead of 1, each m×ksub
    integer cells from broadcast codebooks — still query-scale, still
    broadcast.  Corpus-side work is identical (one assignment argmin,
    one PQ encode, codes ⋈ lists shuffle_hash join), and the final
    ranking is the shared two-stage top-k.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``ivfpq_residual`` — centroids/residual codebooks/coded rows
    come from the saved tables (hyperparameters adopted from meta;
    ``nprobe``/``k`` stay serve-time knobs), so the corpus-scale
    assignment + residual encode + codes ⋈ lists join are all skipped:
    ``candidates`` is never scanned at serve time.  Output is
    hash-identical to the inline build — gated by
    sim_topk_ivfpq_residual_prebuilt.  ``min_results`` opts into the
    adaptive probe budget for filtered serving (:func:`_probe_lists`).
    """
    if index is not None:
        if index.kind != "ivfpq_residual":
            raise ValueError(
                f"need an ivfpq_residual index, got {index.kind!r}"
            )
        m, ksub = index.meta["m"], index.meta["ksub"]
        dsub, dim = index.meta["dsub"], index.meta["dim"]
        cents = F.broadcast(index.parts["centroids"])
        codebooks = index.parts["codebooks"]
        packed = index.parts["coded"]
    else:
        centroids, codebooks, packed = ivfpq_residual_state(
            candidates, n_centroids=n_centroids, m=m, ksub=ksub,
            vec_col=vec_col, id_col=id_col, dsub=dsub, dim=dim,
            train_iters=train_iters,
        )
        cents = F.broadcast(centroids)
    # query side: probe nprobe nearest lists, carry the QUERY residual
    # per probed list (qu − cu of THAT list, not of the query's own)
    qu = _unit_vecs(queries, vec_col, id_col, "query_id")
    qd = qu.join(cents).select(
        "query_id", "u", "cid", "cu",
        _d2_micro(F.col("u"), F.col("cu"), dim).alias("d2"),
    )
    probed = _probe_lists(qd, packed, nprobe, min_results).select(
        "query_id", "cid",
        F.zip_with("u", "cu", lambda a, c: a - c).alias("qr"),
    )
    qdsub = F.floor(F.size("qr") / m).cast("int")
    qrsub = (
        probed.select(
            "query_id", "cid", "qr", qdsub.alias("_dsub"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        )
        .select(
            "query_id", "cid",
            F.col("s").cast("int").alias("s"),
            F.slice(
                "qr", F.col("s") * F.col("_dsub") + 1, F.col("_dsub")
            ).alias("sv"),
        )
    )
    cells = qrsub.join(F.broadcast(codebooks), on="s").select(
        "query_id", "cid", "s", "code",
        _d2_micro(F.col("sv"), F.col("cv"), dsub).alias("d2"),
    )
    lut = (
        cells.groupBy("query_id", "cid", "s")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "d2"))),
                lambda x: x["d2"],
            ).alias("row")
        )
        .groupBy("query_id", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "row"))),
                lambda x: x["row"],
            ).alias("lut")
        )
    )
    scored = (
        packed.join(F.broadcast(lut), on="cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            # statically unrolled integer sum — see topk_pq_adc
            sum(
                (
                    F.element_at(
                        F.element_at("lut", s + 1),
                        F.element_at("codes", s + 1) + 1,
                    )
                    for s in range(1, m)
                ),
                start=F.element_at(
                    F.element_at("lut", 1), F.element_at("codes", 1) + 1
                ),
            ).alias("adc_d2_micro"),
        )
    )
    return _two_stage_topk(scored, ["adc_d2_micro", "vec_id"], k)


def topk_hamming_rerank(candidates: DataFrame, queries: DataFrame,
                        k: int = 5, shortlist: int = 50,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        n_bits: int = 63, index=None) -> DataFrame:
    """Two-tier ANN — the production serving composition: a Hamming
    sign-sketch scan (ONE int64 per vector, 64x smaller than the
    float array) generates a per-query ``shortlist``, then exact float
    cosine reranks ONLY those shortlist rows (vectors fetched late by
    id, never shuffled through the scan).

    Returns (query_id, vec_id, cos_sim, rank) like topk_bruteforce —
    identical results wherever the true top-k survives the shortlist;
    the recall gate (sim_recall_hamming_rerank_vs_bruteforce) measures
    exactly that survival.  Scan bytes: 8·|C| for tier 1 plus
    8·d·shortlist·|Q| for tier 2 — at 100 TB the float table is
    touched at ~shortlist/|C| selectivity.

    ``index``: a prebuilt ``hamming`` AnnIndex for tier 1 — with it,
    the candidate float table is touched ONLY by the tier-2 late
    fetch at shortlist/|C| selectivity (the production serving cost).
    """
    short = topk_hamming(
        candidates, queries, k=shortlist, vec_col=vec_col, id_col=id_col,
        n_bits=n_bits, index=index,
    ).select("query_id", "vec_id")
    return _exact_rerank(candidates, queries, short, k, vec_col, id_col)


def _exact_rerank(candidates: DataFrame, queries: DataFrame,
                  short: DataFrame, k: int,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Tier 2 shared by every two-tier ANN composition: exact float
    cosine over a (query_id, vec_id) shortlist, vectors LATE-FETCHED
    by id (the float table is touched at shortlist/|C| selectivity,
    never shuffled through the tier-1 scan), ranked by the shared
    two-stage top-k.  Same output contract as topk_bruteforce."""
    c = candidates.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("emb"),
        l2_norm(vec_col).alias("c_norm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_emb"),
        l2_norm(vec_col).alias("q_norm"),
    )
    scored = (
        short.join(c, on="vec_id")
        .join(F.broadcast(q), on="query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_from_norms("q_emb", "emb", "q_norm", "c_norm"), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim").isNotNull())
    )
    return _two_stage_topk(scored, [F.desc("cos_sim"), "vec_id"], k)


def topk_ivfpq_rerank(candidates: DataFrame, queries: DataFrame,
                      k: int = 5, shortlist: int = 50,
                      n_centroids: int = 32, nprobe: int = 8,
                      m: int = 8, ksub: int = 16,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      codebooks: DataFrame | None = None,
                      dsub: int | None = None,
                      dim: int | None = None,
                      index=None,
                      min_results: int | None = None) -> DataFrame:
    """IVF-PQ shortlist + exact rerank — the production serving shape
    FAISS deployments actually run (index=IVFPQ for the scan,
    refine/rerank over the original vectors for the final order):
    tier 1 ADC-scores only the probed lists' PQ codes and keeps
    ``shortlist`` candidates per query; tier 2 late-fetches the float
    vectors for those shortlist rows ONLY and reranks by exact cosine.

    Why this dominates raw IVF-PQ at serving time: ADC error is a
    per-vector quantization artifact — the true neighbor is almost
    always INSIDE a 10·k shortlist even when it isn't ADC-rank-1 — so
    the exact tier recovers near-bruteforce recall (gated:
    sim_recall_ivfpq_rerank_vs_bruteforce, floor strictly above the
    raw-ADC gate's) while scan bytes stay PQ-dominated:
    m·|C|·nprobe/n_centroids code bytes + 8·d·shortlist·|Q| float
    bytes, vs 8·d·|C| for brute force.  Returns (query_id, vec_id,
    cos_sim, rank) like topk_bruteforce.

    ``index``: a prebuilt ``ivfpq`` AnnIndex for tier 1 (see
    :func:`topk_ivfpq`) — with it, ``candidates`` (the raw float
    table) is touched ONLY by the tier-2 late fetch at shortlist/|C|
    selectivity, which is exactly the production serving cost."""
    # min_results (adaptive probe budget under filtered serving,
    # _probe_lists) passes through to the shortlist tier: request at
    # least k in-scope shortlist rows so the exact tier can still
    # return a full k
    short = topk_ivfpq(
        candidates, queries, k=shortlist, n_centroids=n_centroids,
        nprobe=nprobe, m=m, ksub=ksub, vec_col=vec_col, id_col=id_col,
        codebooks=codebooks, dsub=dsub, dim=dim, index=index,
        min_results=min_results,
    ).select("query_id", "vec_id")
    return _exact_rerank(candidates, queries, short, k, vec_col, id_col)


def topk_cascade(candidates: DataFrame, queries: DataFrame, k: int = 5,
                 shortlist1: int = 100, shortlist2: int = 20,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_bits: int = 63, index=None) -> DataFrame:
    """Three-tier ANN cascade — the full production funnel, each tier
    touching ~an order of magnitude fewer rows at ~an order of
    magnitude more bytes per row:

    1. Hamming sign-sketch scan (8 B/vector, the whole corpus) keeps
       ``shortlist1`` per query;
    2. int8 dot product re-scores ONLY those survivors (1 B/dim,
       codes late-fetched by id) down to ``shortlist2``;
    3. exact float cosine reranks the final shortlist
       (:func:`_exact_rerank` — 8 B/dim at shortlist2/|C|
       selectivity).

    Scan bytes: 8·|C| + d·shortlist1·|Q| + 8·d·shortlist2·|Q|, vs
    8·d·|C| for brute force — at 64 dims the full-corpus tier is 64x
    lighter than floats while the exact tier still fixes the final
    order.  Tiers 1-2 are exact int64 arithmetic (bit-portable,
    oracle-gated end-to-end); recall loss is shortlist survival only,
    pinned by sim_recall_cascade_vs_bruteforce.  Returns (query_id,
    vec_id, cos_sim, rank) like topk_bruteforce.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``cascade`` (parts ``sketches`` + ``q8codes``) — tiers 1 and
    2 serve from the saved tables, so ``candidates`` is touched ONLY
    by the tier-3 late fetch at shortlist2/|C| selectivity.  Output is
    hash-identical to the inline build — gated by
    sim_topk_cascade_prebuilt."""
    if index is not None:
        if index.kind != "cascade":
            raise ValueError(f"need a cascade index, got {index.kind!r}")
        from types import SimpleNamespace

        # tier 1 serves through topk_hamming's own index path; the
        # sketches part IS a hamming index's codes part
        h_view = SimpleNamespace(
            kind="hamming",
            meta={"kind": "hamming", "n_bits": index.meta["n_bits"]},
            parts={"codes": index.parts["sketches"]},
        )
        t1 = topk_hamming(
            candidates, queries, k=shortlist1, vec_col=vec_col,
            id_col=id_col, index=h_view,
        ).select("query_id", "vec_id")
        c8 = index.parts["q8codes"]
    else:
        t1 = topk_hamming(
            candidates, queries, k=shortlist1, vec_col=vec_col,
            id_col=id_col, n_bits=n_bits,
        ).select("query_id", "vec_id")
        c8 = quantize_int8_unit(candidates, vec_col).select(
            F.col(id_col).alias("vec_id"), "q8"
        ).filter(F.col("q8").isNotNull())
    q8 = quantize_int8_unit(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("q8").alias("qq")
    ).filter(F.col("qq").isNotNull())
    t2_scored = (
        t1.join(c8, on="vec_id")
        .join(F.broadcast(q8), on="query_id")
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("q8"), F.col("qq"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_q"),
        )
    )
    t2 = _two_stage_topk(
        t2_scored, [F.desc("dot_q"), "vec_id"], shortlist2
    ).select("query_id", "vec_id")
    return _exact_rerank(candidates, queries, t2, k, vec_col, id_col)


def topk_truncated(candidates: DataFrame, queries: DataFrame, k: int = 5,
                   dims: int = 32, vec_col: str = "embedding",
                   id_col: str = "vec_id", index=None) -> DataFrame:
    """Matryoshka-style truncated-dimension top-k: rank by the cosine
    of the FIRST ``dims`` coordinates only (MRL — Kusupati et al.
    2022: embeddings trained so prefixes are themselves usable
    representations).  Halving dims halves scan bytes and quarters
    dot-product work with a measured (recall-gated) quality cost —
    the cheapest knob on the ANN compression ladder because it needs
    no codebooks, no training, no re-encoding.

    Implemented as plain column slices feeding the shared brute-force
    ranker, so it inherits the two-stage top-k plan and the null/zero
    exclusion contract (a vector whose PREFIX is all-zero is
    unscoreable at this tier and excluded, like any zero-norm input).

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``matryoshka`` — the artifact IS the truncated-prefix table
    (no trained state, like ``jl``), so ``candidates`` is never
    scanned and ``dims`` is adopted from the artifact.  Output is
    hash-identical to the inline slice — gated by
    sim_topk_matryoshka_prebuilt.
    """
    if index is not None:
        if index.kind != "matryoshka":
            raise ValueError(f"need a matryoshka index, got {index.kind!r}")
        dims = index.meta["dims"]
        c = index.parts["codes"].select(
            F.col("vec_id").alias(id_col), F.col("emb").alias(vec_col)
        )
    else:
        c = candidates.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, dims).alias(vec_col)
        )
    q = queries.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dims).alias(vec_col)
    )
    return topk_bruteforce(c, q, k=k, vec_col=vec_col, id_col=id_col)


# ---------------------------------------------------------------------------
# Sparse Johnson-Lindenstrauss projection (Achlioptas 2003): the
# dimensionality-REDUCTION rung of the compression ladder.  Where the
# int8/SQ8/PQ tiers shrink bytes-per-dimension, JL shrinks the number
# of dimensions: y_j = sum_i x_i * s(i, j) with s in {+1, 0, -1} at
# probabilities {1/6, 2/3, 1/6}.  The sign matrix is derived ONCE from
# md5("jl:i:j") — the repo's engine-portable hash — and injected into
# both the Spark expression and the DuckDB oracle as integer literals
# (the JPEG-IDCT-table pattern), so no projection matrix is ever
# stored, shipped, or trained: every executor and both engines
# regenerate identical signs.  (A LINEAR integer hash like
# (a*i + b*j) % 6 is NOT usable here: its value depends only on
# (i mod 6, j mod 6), which collapses the matrix to a handful of
# distinct sign patterns and destroys the projection — found
# empirically, recall went to 0.)  Composed over the int8 unit codes
# the projection stays EXACT int64 (|y_j| <= 127 * dims), so the
# projected ranking is bit-portable and fully oracle-gated, like
# every integer tier.
# ---------------------------------------------------------------------------

_JL_D_IN = 64  # corpus embedding dims the sign matrix covers


def jl_signs(d_out: int, d_in: int = _JL_D_IN) -> list[int]:
    """Flat sign matrix S[i * d_out + j] in {+1, 0, -1}: md5-derived,
    deterministic, identical across engines and executors."""
    import hashlib

    out = []
    for i in range(d_in):
        for j in range(d_out):
            h = int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:4], 16)
            m = h % 6
            out.append(1 if m == 0 else (-1 if m == 1 else 0))
    return out


def jl_project_int8(df: DataFrame, d_out: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    out_id: str = "vec_id",
                    out_col: str = "jl") -> DataFrame:
    """(out_id, jl): project each int8 unit code from dims to
    ``d_out`` integer coordinates with the md5-drawn sparse sign
    matrix.  One narrow projection, zero shuffles, zero Python at
    runtime — the sign matrix is baked into the expression tree as
    literals and the transform/aggregate is codegen'd JVM-side.
    Zero/NULL vectors are excluded (cosine undefined upstream)."""
    signs = jl_signs(d_out)
    s_lit = ",".join(f"{v}L" for v in signs)
    q = quantize_int8_unit(df, vec_col)
    proj = F.expr(
        f"""transform(sequence(0, {d_out - 1}), j ->
            aggregate(
              zip_with(q8, sequence(0, size(q8) - 1), (x, i) ->
                x * element_at(array({s_lit}), i * {d_out} + j + 1)),
              0L, (acc, x) -> acc + x))"""
    )
    return (
        q.filter(F.col("q8").isNotNull())
        # the sign matrix is a _JL_D_IN x d_out literal: an embedding
        # wider than _JL_D_IN would index element_at past the array —
        # a runtime error under ANSI mode, silent contamination with
        # ANSI off.  Fail loudly at plan-execution time instead.
        .withColumn(
            "q8",
            F.when(
                F.size("q8") <= _JL_D_IN, F.col("q8")
            ).otherwise(
                F.raise_error(F.concat(
                    F.lit("jl_project_int8: embedding has "),
                    F.size("q8").cast("string"),
                    F.lit(f" dims, sign matrix covers {_JL_D_IN}"),
                ))
            ),
        )
        .select(F.col(id_col).alias(out_id), proj.alias(out_col))
    )


def topk_jl(candidates: DataFrame, queries: DataFrame, k: int = 5,
            d_out: int = 16, vec_col: str = "embedding",
            id_col: str = "vec_id", index=None) -> DataFrame:
    """Approximate cosine top-k in JL-projected space — integer dot
    product over ``d_out`` coordinates instead of dims, so the scan
    reads dims/d_out times fewer numbers than even the int8 tier
    (64 -> 16 is a further 4x on top of int8's 8x byte cut).  Exact
    int64 scoring (|dot| <= d_out * (127*dims)^2 << 2^63); returns
    (query_id, vec_id, dot_jl, rank) ranked (dot_jl desc, vec_id).
    JL distortion costs recall (pinned by the gate) — the serving
    answer is :func:`topk_jl_rerank`, same funnel as every tier.

    ``index``: a prebuilt :class:`operators.ann_index.AnnIndex` of
    kind ``jl`` — the SERVING path: candidate codes come from the
    saved table (built with the index's own d_out), so ``candidates``
    is never scanned; only the |Q|-sized query side projects live.
    Output is hash-identical to the inline build — gated by
    sim_topk_jl_prebuilt."""
    if index is not None:
        if index.kind != "jl":
            raise ValueError(f"need a jl index, got {index.kind!r}")
        d_out = index.meta["d_out"]
        c = index.parts["codes"]
    else:
        c = jl_project_int8(candidates, d_out, vec_col, id_col)
    q = jl_project_int8(queries, d_out, vec_col, id_col,
                        out_id="query_id", out_col="qjl")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("jl"), F.col("qjl"), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_jl"),
        )
    )
    return _two_stage_topk(scored, [F.desc("dot_jl"), "vec_id"], k)


def topk_jl_rerank(candidates: DataFrame, queries: DataFrame, k: int = 5,
                   shortlist: int = 50, d_out: int = 16,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id", index=None) -> DataFrame:
    """JL shortlist -> exact float rerank: the two-tier serving shape
    over the narrowest integer sketch in the ladder.  Tier 1 scans
    d_out-coordinate codes for the whole corpus; tier 2 late-fetches
    floats for ``shortlist`` rows per query only
    (:func:`_exact_rerank`).  Returns (query_id, vec_id, cos_sim,
    rank) like topk_bruteforce; recall pinned strictly above the raw
    JL gate by the pytest."""
    short = topk_jl(
        candidates, queries, k=shortlist, d_out=d_out,
        vec_col=vec_col, id_col=id_col, index=index,
    ).select("query_id", "vec_id")
    return _exact_rerank(candidates, queries, short, k, vec_col, id_col)
