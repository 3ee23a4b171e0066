"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join handling (on by default in session.py) fixes skewed
SORT-MERGE joins at runtime, but two shapes still need explicit
salting at 100 TB:

- **Skewed groupBy** — one hot key funnels into one reduce task.
  :func:`salted_agg` runs the aggregation in two stages: stage 1
  groups on (key, salt) spreading the hot key over ``n_salts`` tasks,
  stage 2 combines the partials.  Works for any algebraic aggregate
  (sum/count/min/max — pass the partial and combine forms).
- **Hot-key equi-join against a medium dimension** — when the dim is
  too big to broadcast whole but hot keys overwhelm one task:
  :func:`salted_join` salts the fact side randomly and EXPLODES the
  dim side across all salts (dim rows × n_salts), restoring a uniform
  equi-join.

Salts are deterministic (hash of a row id), not rand(), so retries and
oracle checks reproduce exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: str, n_salts: int,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from an existing column
    (use a high-cardinality id so salts spread evenly)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    combine_aggs: Sequence[Column],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation immune to per-key skew.

    ``partial_aggs`` aggregate within (group, salt); ``combine_aggs``
    fold the partials (referencing the partial aliases).  Example::

        salted_agg(df, ["k"],
                   [F.count("*").alias("c"), F.sum("v").alias("s")],
                   [F.sum("c").alias("n"), F.sum("s").alias("total")],
                   salt_from="row_id")
    """
    salted = with_salt(df, salt_from, n_salts)
    partial = salted.groupBy(*group_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*combine_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated
    across all salts — hot join keys spread over ``n_salts`` tasks.

    Dim inflation is dim_rows × n_salts: use for medium dims (too big
    to broadcast, small enough to replicate 16x), hot-key facts.

    Only ``inner`` and ``left`` (fact-preserving) joins are
    semantics-safe: a right/full outer would emit each UNMATCHED dim
    row once per salt replica (n_salts duplicates).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r} "
            "(outer joins would duplicate unmatched dim rows per salt)"
        )
    f = with_salt(fact, salt_from, n_salts)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, on=[on, "_salt"], how=how).drop("_salt")


def bounded_key_history(df: DataFrame, key: str = "user_id",
                        ts_col: str = "ts", max_rows: int = 50,
                        tiebreak: str | Sequence[str] | None = None
                        ) -> DataFrame:
    """Deterministic keep-latest-``max_rows``-per-key pre-window cut —
    the hot-key defense for per-key WINDOW CHAINS (round-8 verdict #4).

    Sessionization / as-of / journey rollups sort each key's full
    history in one task; a key owning 15/16 of the corpus (the skew16
    regime) turns that task into the job.  Real pipelines bound
    per-key history before windowing — this operator IS that bound,
    as a reusable cut with pinned semantics: keep each key's latest
    ``max_rows`` rows by (``ts_col`` desc, ``tiebreak`` desc), drop
    the rest.

    Shape: the shared two-stage top-k (similarity._two_stage_topk's
    geometry).  Stage 1 ranks within (key, input-partition) and keeps
    at most ``max_rows`` per task — NO single task ever receives a hot
    key's full history, which is the entire point; stage 2 ranks the
    ≤ n_partitions·max_rows survivors.  Bit-identical to the naive
    single-window cut for any input partitioning PROVIDED
    (ts_col, tiebreak) is a total order per key (pass the row id as
    ``tiebreak``); rows in the global latest-N are necessarily in the
    latest-N of whichever partition holds them.

    Returns the input columns unchanged (minus nothing) — compose as
    ``bounded_key_history(events) |> sessionize/asof/rollup``.
    Measured: SCALE.md skew16 rows for the *_capped query variants.
    """
    tiebreaks = ([tiebreak] if isinstance(tiebreak, str)
                 else list(tiebreak or []))
    order = [F.desc(ts_col)] + [F.desc(c) for c in tiebreaks]
    from pyspark.sql import Window

    pre = df.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(key, "_pid").orderBy(*order)
    survivors = (
        pre.withColumn("_prn", F.row_number().over(w1))
        .filter(F.col("_prn") <= max_rows)
        .drop("_pid", "_prn")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= max_rows)
        .drop("_rn")
    )
