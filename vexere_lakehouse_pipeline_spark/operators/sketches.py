"""Mergeable frequency/membership sketches: count-min and Bloom.

No reference analog (SURVEY.md §2 ends at exact aggregation) — this is
the summary layer a 100 TB corpus pipeline runs where exact structures
don't fit:

* **Count-min sketch** — a depth×width grid of counters answering
  "how often does this token occur?" with one-sided error (estimate
  >= truth, overcount bounded by colliding mass ~ N/width per row,
  min over depth rows).  The build is ONE map-side-combinable
  groupBy whose output size is depth*width REGARDLESS of input size
  or cardinality — the point at 100 TB, where the exact token census
  (corpus_vocab_topk) shuffles every distinct token.  Sketches from
  different shards/days MERGE by summing counters cell-wise.
* **Bloom filter** — an m-bit array answering set membership with no
  false negatives.  The production decontamination shape: build once
  over the (small) benchmark set, broadcast the kilobyte-sized word
  table, and gate petabytes of corpus with a map-side probe — no
  shuffle of the corpus at all.  Merges by OR-ing words.

Both are deterministic given the salt (md5-based
:func:`sampling.hash_bucket` family) — reproduced verbatim in the
DuckDB oracles of plans/sketch_gates.py, and each gate query carries
the exact answer alongside so the error envelope is checked against
an independently computed truth, same pattern as mining.py's HLL
gates.

Sizing at scale: width/n_words here are sf0.01-sized; production picks
width ~ e/eps (eps = tolerated overcount fraction of N) and Bloom bits
~ 1.44 * n * log2(1/fpr).  Both stay broadcast-sized (MBs) far beyond
100 TB inputs because they scale with ERROR TARGETS, not data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import sampling

# Bits used per int64 bloom word — 32 keeps every shift/or inside
# non-negative BIGINT range on BOTH engines (bit 63 of a signed shift
# is an overflow trap in DuckDB and a sign flip in Spark).
BLOOM_BITS_PER_WORD = 32


def cms_bucket(col: Column | str, row: int, width: int,
               salt: str = "cms") -> Column:
    """Deterministic CMS bucket for hash row ``row`` in [0, width).

    ``width`` must divide 65536 (the hash_bucket space) so the modulo
    stays unbiased; asserted because a silent 2x skew in hot buckets
    would quietly inflate overcounts.
    """
    assert 65536 % width == 0, "width must divide 65536"
    return sampling.hash_bucket(col, f"{salt}{row}") % width


def cms_bucket_sql(key_sql: str, row: int, width: int,
                   salt: str = "cms") -> str:
    """DuckDB mirror of :func:`cms_bucket`."""
    return f"({sampling.hash_bucket_sql(key_sql, f'{salt}{row}')} % {width})"


def cms_build(items: DataFrame, col: str, depth: int = 3,
              width: int = 1024, salt: str = "cms") -> DataFrame:
    """Count-min sketch over the multiset ``items[col]``.

    Returns (cms_row, cms_bucket, cms_count) — depth*width cells, the
    mergeable summary (shard sketches sum cell-wise).  One explode to
    depth rows then one map-side-combinable groupBy; no distinct-key
    shuffle, output size independent of input cardinality.
    """
    cells = items.select(
        F.posexplode(
            F.array(*[cms_bucket(col, r, width, salt) for r in range(depth)])
        ).alias("cms_row", "cms_bucket")
    )
    return cells.groupBy("cms_row", "cms_bucket").agg(
        F.count("*").cast("long").alias("cms_count")
    )


def cms_lookup(cms: DataFrame, probes: DataFrame, col: str, depth: int = 3,
               width: int = 1024, salt: str = "cms") -> DataFrame:
    """Point-estimate each probe key against the sketch.

    Adds ``cms_est`` = min over the depth rows' counters (0 if a cell
    is empty).  The sketch side is depth*width rows — broadcast; the
    probe side never shuffles.

    NOTE: the final groupBy is over ALL probe columns, so fully
    duplicate probe rows collapse to one output row (same hazard
    :func:`bloom_probe` documents and solves with
    ``bloom_probe_rowwise``).  Pass probes with a unique key column if
    duplicate rows must be preserved.
    """
    keyed = probes.select(
        "*",
        F.posexplode(
            F.array(*[cms_bucket(col, r, width, salt) for r in range(depth)])
        ).alias("cms_row", "cms_bucket"),
    )
    hit = keyed.join(F.broadcast(cms), ["cms_row", "cms_bucket"], "left")
    others = [c for c in probes.columns]
    return (
        hit.groupBy(*others)
        .agg(
            F.min(F.coalesce("cms_count", F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
    )


def bloom_position(col: Column | str, probe: int, n_words: int,
                   salt: str = "bloom") -> Column:
    """Deterministic bit position for hash probe ``probe`` in
    [0, n_words * 32), from the 32-bit hash so n_words can exceed
    65536/32 at scale."""
    return sampling.hash_bucket_wide(col, f"{salt}{probe}") % (
        n_words * BLOOM_BITS_PER_WORD
    )


def bloom_position_sql(key_sql: str, probe: int, n_words: int,
                       salt: str = "bloom") -> str:
    """DuckDB mirror of :func:`bloom_position`."""
    return (
        f"({sampling.hash_bucket_wide_sql(key_sql, f'{salt}{probe}')}"
        f" % {n_words * BLOOM_BITS_PER_WORD})"
    )


def _bit_mask() -> Column:
    """int64 mask ``1 << (_pos % 32)`` — via F.expr because
    F.shiftleft's shift amount must be a Python int, not a Column."""
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST(pmod(_pos, {BLOOM_BITS_PER_WORD}) AS INT))"
    )


def bloom_build(members: DataFrame, col: str, n_words: int = 2048,
                k: int = 4, salt: str = "bloom") -> DataFrame:
    """Bloom filter over the set ``members[col]``.

    Returns (bloom_word_idx, bloom_word): <= n_words rows of int64
    words using bits 0..31 — kilobytes, broadcastable, mergeable by
    bit_or on word_idx.  Build is one explode + one map-side bit_or
    groupBy.
    """
    pos = members.select(
        F.explode(
            F.array(*[bloom_position(col, j, n_words, salt)
                      for j in range(k)])
        ).alias("_pos")
    )
    word = F.floor(F.col("_pos") / BLOOM_BITS_PER_WORD).cast("long")
    return (
        pos.select(word.alias("bloom_word_idx"), _bit_mask().alias("_mask"))
        .groupBy("bloom_word_idx")
        .agg(F.bit_or("_mask").alias("bloom_word"))
    )


def bloom_probe(bloom: DataFrame, df: DataFrame, col: str,
                n_words: int = 2048, k: int = 4,
                salt: str = "bloom") -> DataFrame:
    """Membership test: adds boolean ``bloom_hit`` to ``df``.

    No false negatives by construction; false-positive rate set by
    n_words/k vs member count.  The filter table joins BROADCAST on
    word index — the probe side (the 100 TB corpus) never shuffles,
    which is the entire point of the shape.

    The regroup over ``df``'s columns collapses fully-duplicate input
    rows — fine for keyed tables; use :func:`bloom_probe_rowwise`
    where row multiplicity must survive (e.g. inside a semi-join).
    """
    keyed = df.select(
        "*",
        F.explode(
            F.array(*[bloom_position(col, j, n_words, salt)
                      for j in range(k)])
        ).alias("_pos"),
    )
    word = F.floor(F.col("_pos") / BLOOM_BITS_PER_WORD).cast("long")
    keyed = keyed.withColumn("bloom_word_idx", word).withColumn(
        "_mask", _bit_mask()
    )
    hit = keyed.join(F.broadcast(bloom), ["bloom_word_idx"], "left")
    bit_set = (
        F.coalesce("bloom_word", F.lit(0)).bitwiseAND(F.col("_mask")) != 0
    )
    return (
        hit.groupBy(*df.columns)
        .agg(F.every(bit_set).alias("bloom_hit"))
    )


def bloom_probe_rowwise(bloom: DataFrame, df: DataFrame, col: str,
                        n_words: int = 2048, k: int = 4,
                        salt: str = "bloom") -> DataFrame:
    """Row-preserving :func:`bloom_probe`: k broadcast lookups instead
    of explode + regroup, so duplicate input rows keep their
    multiplicity (bloom_probe's groupBy over all columns collapses
    them — fine for keyed tables, wrong inside a semi-join)."""
    out = df
    hits = []
    for j in range(k):
        out = out.withColumn(f"_p{j}", bloom_position(col, j, n_words, salt))
        out = out.withColumn(
            f"_w{j}",
            F.floor(F.col(f"_p{j}") / BLOOM_BITS_PER_WORD).cast("long"),
        ).withColumn(
            f"_m{j}",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(_p{j}, {BLOOM_BITS_PER_WORD}) AS INT))"
            ),
        )
        b = bloom.select(
            F.col("bloom_word_idx").alias(f"_w{j}"),
            F.col("bloom_word").alias(f"_bw{j}"),
        )
        out = out.join(F.broadcast(b), on=f"_w{j}", how="left")
        hits.append(
            F.coalesce(f"_bw{j}", F.lit(0)).bitwiseAND(F.col(f"_m{j}")) != 0
        )
    cond = hits[0]
    for h in hits[1:]:
        cond = cond & h
    drop = [c for j in range(k)
            for c in (f"_p{j}", f"_w{j}", f"_m{j}", f"_bw{j}")]
    return out.withColumn("bloom_hit", cond).drop(*drop)


def bloom_semi_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                    dim_key: str, n_words: int = 8192, k: int = 4,
                    salt: str = "bsj") -> DataFrame:
    """Exact semi-join with a Bloom pre-filter on the fact side.

    Semantically IDENTICAL to ``fact.join(dim, on=key, 'left_semi')``
    (equality pinned in tests/test_sketches.py): the bloom pass keeps
    every true match (no false negatives) plus a small false-positive
    residue that the exact semi-join then removes.

    Why at 100 TB: when the dim key set is too big to broadcast as a
    hash relation but its BLOOM fits in kilobytes, the pre-filter
    drops most non-matching fact rows map-side BEFORE the shuffle the
    exact semi-join pays — the hand-rolled equivalent of Spark's
    runtime row-level filters, usable where AQE doesn't inject one
    (non-equi stages, unions, custom sources).  For broadcast-sized
    dims, skip this and let the planner broadcast.
    """
    bloom = bloom_build(
        dim.select(F.col(dim_key).alias("_bk")).distinct(), "_bk",
        n_words, k, salt,
    )
    probed = bloom_probe_rowwise(
        bloom,
        fact.withColumn(
            "_bk", F.col(fact_key).cast(dim.schema[dim_key].dataType)
        ),
        "_bk", n_words, k, salt,
    )
    prefiltered = probed.filter(F.col("bloom_hit")).drop("bloom_hit", "_bk")
    return prefiltered.join(
        dim.select(F.col(dim_key).alias(fact_key)),
        on=fact_key,
        how="left_semi",
    )


# --- KMV (k-minimum-values / bottom-m) distinct sketch ---------------------
# The third leg of the sketch suite: CMS answers frequency, Bloom
# answers membership, KMV answers DISTINCT COUNT **and set overlap** —
# the one the HLL gates can't do (HLL unions but never intersects).
# K(A) = the m smallest distinct 48-bit md5 hashes of A's keys; merge =
# union-then-keep-m-smallest; D ~ (m-1) * 2^48 / h_(m); Jaccard ~ the
# fraction of K(A u B) present in both K(A) and K(B) (Beyer et al.,
# SIGMOD'07).  Deterministic given the salt -> bit-identical in DuckDB.

KMV_HASH_SPACE = float(1 << 48)  # 12 md5 nibbles


def kmv_hash(col: Column | str, salt: str = "kmv") -> Column:
    """Deterministic 48-bit hash in [1, 2^48] (shifted by +1 so the
    estimator's divisor can never be zero)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") + 1)


def kmv_hash_sql(key_sql: str, salt: str = "kmv") -> str:
    """DuckDB mirror of :func:`kmv_hash`."""
    return (
        f"(CAST('0x' || substr(md5('{salt}:' || CAST({key_sql} AS STRING)),"
        f" 1, 12) AS BIGINT) + 1)"
    )


def kmv_sketch(df: DataFrame, key: str, group_cols: list[str], m: int = 256,
               salt: str = "kmv") -> DataFrame:
    """Per-group KMV sketch: (*group_cols, kmv_h, kmv_rnk<=m).

    Scale shape: the m smallest DISTINCT hashes per group are selected
    in two phases so no single task ever sorts a whole group — local
    min-m inside 64 hash sub-buckets (each window partition holds
    ~1/64th of the group's distinct keys), then a final min-m over the
    <= 64*m survivors per group.  The result is identical to a direct
    per-group bottom-m (pure set-of-smallest semantics), which is what
    the DuckDB oracle computes with one window.
    """
    from pyspark.sql import Window

    h = df.select(
        *group_cols, kmv_hash(key, salt).alias("kmv_h")
    ).distinct()
    local = Window.partitionBy(
        *group_cols, F.pmod("kmv_h", F.lit(64))
    ).orderBy("kmv_h")
    cand = (
        h.withColumn("_lr", F.row_number().over(local))
        .filter(F.col("_lr") <= m)
        .drop("_lr")
    )
    final = Window.partitionBy(*group_cols).orderBy("kmv_h")
    return (
        cand.withColumn("kmv_rnk", F.row_number().over(final))
        .filter(F.col("kmv_rnk") <= m)
    )
