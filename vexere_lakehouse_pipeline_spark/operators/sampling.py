"""Deterministic, engine-portable sampling for training-data pipelines.

Reproducible sampling is a core corpus operation at 100 TB: train/valid/
test splits, per-language downsampling, and weighted source mixtures must
give the SAME answer on every run, on every engine, at any parallelism.
``rand()``-based sampling (Spark's ``df.sample`` / ``sampleBy``) is
seed-deterministic only per partitioning, so a repartition or an AQE
re-plan silently changes the sample.  Instead every decision here is a
pure function of the row key: bucket = first 4 hex nibbles of
``md5(salt || ':' || key)`` -> [0, 65536), keep iff bucket < fraction *
65536.  That is embarrassingly parallel (no shuffle, no state), stable
under repartitioning, and reproducible bit-for-bit in any engine with
md5 (the DuckDB oracles in plans/corpus.py recompute it verbatim).

No analog in the reference (its "sampling" is the crawler's 13-province
scope) — this is north-star surface per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 65536  # 4 md5 nibbles


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 65536) from the row key.

    Uniform for md5's purposes; independent buckets for different salts,
    so layered decisions (split, then downsample) don't correlate.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def hash_bucket_sql(key_sql: str, salt: str = "") -> str:
    """DuckDB-portable SQL computing exactly :func:`hash_bucket`."""
    return (
        f"CAST('0x' || substr(md5('{salt}:' || CAST({key_sql} AS STRING)), 1, 4)"
        " AS INTEGER)"
    )


WIDE_BUCKETS = 1 << 32  # 8 md5 nibbles


def hash_bucket_wide(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, 2^32) from the row key.

    The 32-bit sibling of :func:`hash_bucket`, for modulo targets that
    can exceed 65536 — e.g. hot-bucket re-blocking, where a 100 TB
    boilerplate bucket may need >65536 sub-buckets: a 16-bit hash would
    leave sub-buckets >= 65536 unreachable and silently break the
    linear-work bound (sub-bucket size ~ n/65536 instead of <= cap).
    Modulo bias is also negligible here (< n_splits/2^32) where the
    16-bit hash carried up to 2x skew.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def hash_bucket_wide_sql(key_sql: str, salt: str = "") -> str:
    """DuckDB-portable SQL computing exactly :func:`hash_bucket_wide`."""
    return (
        f"CAST('0x' || substr(md5('{salt}:' || CAST({key_sql} AS STRING)), 1, 8)"
        " AS BIGINT)"
    )


def hash_sample(df: DataFrame, key: Column | str, fraction: float,
                salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key.

    A map-side filter — no shuffle, no driver state; at 100 TB this is
    the only sampling primitive that survives retries and re-planning
    unchanged.
    """
    return df.filter(hash_bucket(key, salt) < int(fraction * BUCKETS))


def split_column(key: Column | str, weights: dict[str, float],
                 salt: str = "split") -> Column:
    """Assign each row to a named split (e.g. train/valid/test).

    ``weights`` maps split name -> weight; thresholds are cumulative
    integer bucket bounds so the assignment is exact and portable.
    Insertion order of ``weights`` defines the bucket layout — keep it
    fixed across runs.
    """
    total = sum(weights.values())
    bucket = hash_bucket(key, salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(acc * BUCKETS)
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def stratified_hash_sample(df: DataFrame, key: Column | str, strata: Column | str,
                           fractions: dict[str, float], default: float = 1.0,
                           salt: str = "strata") -> DataFrame:
    """Per-stratum deterministic downsampling (e.g. cap dominant
    languages while keeping the tail intact).  Same guarantees as
    :func:`hash_sample`; the threshold is looked up per row from a
    when-chain (tiny, broadcast-free)."""
    s = F.col(strata) if isinstance(strata, str) else strata
    thr: Column = F.lit(int(default * BUCKETS))
    for name, frac in fractions.items():
        thr = F.when(s == name, int(frac * BUCKETS)).otherwise(thr)
    return df.filter(hash_bucket(key, salt) < thr)


def weighted_mixture(sources: dict[str, tuple[DataFrame, float]],
                     key: Column | str, salt: str = "mix") -> DataFrame:
    """Weighted union of corpora: each source is hash-sampled to its
    rate, tagged with ``mix_source`` and an ``epoch``, and unioned.
    The standard "training mix" operator (e.g. 100% curated + 30% web).

    Rates > 1.0 oversample: floor(rate) full epochs plus one
    hash-sampled fractional epoch (e.g. rate 2.3 -> epochs 0,1 complete
    + ~30% of epoch 2, all deterministic).  Downstream shuffling of
    epochs is the trainer's job; the mix only fixes multiplicity."""
    parts = []
    for name, (df, rate) in sources.items():
        whole, frac = int(rate), rate - int(rate)
        for epoch in range(whole):
            parts.append(
                df.withColumn("mix_source", F.lit(name))
                .withColumn("epoch", F.lit(epoch))
            )
        if frac > 0:
            kept = hash_sample(df, key, frac, salt=f"{salt}:{name}:{whole}")
            parts.append(
                kept.withColumn("mix_source", F.lit(name))
                .withColumn("epoch", F.lit(whole))
            )
    if not parts:
        raise ValueError(
            "weighted_mixture: no source contributes rows "
            "(empty sources dict, or every rate is 0.0)"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_hash_sample(df: DataFrame, key: Column | str,
                         weight: Column | str,
                         max_weight: Column | int,
                         rate_num: int = 1, rate_den: int = 1,
                         salt: str = "wsample") -> DataFrame:
    """Weight-proportional deterministic Bernoulli sampling.

    P(keep) = (rate_num/rate_den) · weight / max_weight, decided by a
    pure-integer comparison so the kept set is bit-reproducible across
    engines, retries, and repartitioning (no RNG state, no floats):

        bucket · rate_den · max_weight  <  BUCKETS · rate_num · weight

    The classic use is length-proportional document sampling (longer
    docs carry more tokens, so uniform-by-doc sampling under-weights
    them).  ``max_weight`` is the corpus max — pass an int or a Column
    from a broadcast 1-row aggregate (a cross-joined scalar, never a
    driver collect).  Map-side filter: zero shuffle at any scale.
    """
    # Integer-exact by design: fractional weights would be silently
    # TRUNCATED by the bigint casts below (a 0.7 quality score becomes
    # 0 — zero keep probability), so named non-integral columns are
    # rejected; scale fractional weights to integers (e.g. permille)
    # before sampling.
    _INTEGRAL = ("byte", "short", "int", "integer", "bigint", "long")
    for name, arg in (("weight", weight), ("max_weight", max_weight)):
        if isinstance(arg, str):
            dt = df.schema[arg].dataType.simpleString()
            if dt not in _INTEGRAL:
                raise ValueError(
                    f"{name} column '{arg}' must be integral, got {dt}; "
                    "scale fractional weights to integers first"
                )
    w = F.col(weight) if isinstance(weight, str) else weight
    mw = F.lit(max_weight) if isinstance(max_weight, int) else max_weight
    bucket = hash_bucket(key, salt)
    # Both products in bigint: with an int32 weight column, 65536 *
    # weight wraps negative past weight=32767 under non-ANSI semantics
    # and would silently drop exactly the heaviest rows.
    return df.filter(
        bucket.cast("bigint") * F.lit(rate_den) * mw.cast("bigint")
        < F.lit(BUCKETS * rate_num) * w.cast("bigint")
    )
