"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join.

The reference has no temporal joins (SURVEY.md §2.3 — J1-J8 are plain
equi/cross joins), but a lakehouse engine serving event data needs
them.  Both are built as compositions of existing DataFrame ops (no
UDFs, no RDDs), shaped so the plan survives 100 TB:

- as-of join: ONE shuffle on the key (a union + running ``last``
  window), never a per-row subquery and never a join blowup.  This is
  the standard distributed as-of pattern (union the two streams, sort
  within key, carry the most recent right row forward).
- range join: equi-join on (key, time-bucket) with the right side
  exploded over the buckets its interval spans.  The fanout is bounded
  by ``span/bucket + 1`` rows per input row, so the shuffle stays
  linear — Spark would otherwise plan key-equi + range-filter, which
  is fine until one key is hot; bucketing also gives AQE a finer
  partitioning to rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward (at-or-before) as-of join.

    For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (ties on ``right_ts`` broken by the greatest ``tiebreak``).  Left
    rows with no earlier right row keep null payloads.

    Plan shape: union(left, right) → window(partitionBy=key,
    orderBy=(ts, side, tiebreak)) running ``last(payload,
    ignorenulls)`` → filter left side.  One shuffle, no O(L×R) pairs.
    """
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_payload collides with left columns: {sorted(collisions)};"
            " alias the right side before joining"
        )
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    # A null right_ts can never satisfy "greatest right_ts <= left_ts";
    # unfiltered it would sort FIRST in the window and become a phantom
    # fallback match for the whole key.
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right rows sort before left at equal ts
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        payload_struct.alias("_payload"),
    )
    left_cols = left.columns
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r, allowMissingColumns=True).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_match")[c].alias(c) for c in right_payload],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    bucket_seconds: int,
) -> DataFrame:
    """Inner join of pairs where ``right_ts`` ∈ (left_ts+lower,
    left_ts+upper], co-keyed on ``on``.

    ``lower``/``upper`` are interval Columns (e.g. ``F.expr("INTERVAL
    0 SECONDS")``).  ``bucket_seconds`` should be ≈ the window span:
    each left row is exploded to the buckets its window covers
    (span/bucket+1 of them), the join is a plain equi-join on
    (key, bucket), and the exact range predicate filters after.
    """
    lb = F.unix_micros(F.col(left_ts) + lower)
    ub = F.unix_micros(F.col(left_ts) + upper)
    step = bucket_seconds * 1_000_000
    lhs = left.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(lb / step), F.floor(ub / step))),
    )
    rhs = right.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(right_ts)) / step)
    )
    joined = lhs.join(rhs, on=[on, "_bucket"]).filter(
        (F.unix_micros(F.col(right_ts)) > lb)
        & (F.unix_micros(F.col(right_ts)) <= ub)
    )
    return joined.drop("_bucket")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Backward as-of join via cogrouped ``applyInPandas`` —
    ``pd.merge_asof`` runs per key group, Arrow-batched.

    Same semantics as :func:`asof_join` (at-or-before match, null
    payload when none) minus the tiebreak knob; exists as the escape
    hatch for per-key alignment logic a window can't express
    (tolerance bands, nearest-direction, interpolation) and as the
    engine's cogroup API coverage.  Prefer :func:`asof_join` when a
    window CAN express it — JVM-side beats Python even Arrow-batched.
    One shuffle per side (cogroup on the key).
    """
    import pandas as pd

    from pyspark.sql.types import StructType

    left_cols = left.columns
    # StructType.add MUTATES — never call it on a DataFrame's cached
    # schema object (it would grow left.columns for every later user).
    out_schema = StructType(
        list(left.schema.fields) + [right.schema[c] for c in right_payload]
    )

    # A payload column sharing a left column's name would produce a
    # duplicate-named output schema (and merge_asof would silently
    # suffix-shadow it, returning the LEFT value as the "match") —
    # reject loudly, same policy as upsert's duplicate-key guard.
    collisions = set(right_payload) & set(left_cols)
    if collisions:
        raise ValueError(
            f"right_payload collides with left columns: {sorted(collisions)};"
            " alias the right side before joining"
        )

    def align(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        # asof_join parity: null right_ts rows can never match (drop
        # them); null left_ts rows keep null payloads (merge_asof
        # raises on null keys, so both cases are peeled off first).
        rg = rg[rg[right_ts].notna()]
        null_left = lg[lg[left_ts].isna()].copy()
        lg = lg[lg[left_ts].notna()].sort_values(left_ts, kind="mergesort")
        if rg.empty:
            merged = lg.copy()
            for c in right_payload:
                merged[c] = None
        else:
            rg = rg[[right_ts, *right_payload]].sort_values(
                right_ts, kind="mergesort"
            )
            merged = pd.merge_asof(
                lg, rg, left_on=left_ts, right_on=right_ts,
                direction="backward", suffixes=("", "_r"),
            )
        for c in right_payload:
            null_left[c] = None
        merged = pd.concat([merged, null_left], ignore_index=True)
        return merged[left_cols + right_payload]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(align, schema=out_schema)
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Forward (at-or-after) as-of join — the mirror of :func:`asof_join`.

    For each left row, attach the payload of the right row with the
    SMALLEST ``right_ts`` >= ``left_ts`` within the same ``on`` key
    (ties on ``right_ts`` broken by the smallest ``tiebreak``).  Same
    union+window shape: one shuffle, no O(L×R) pairs.

    The forward lookup is evaluated as a RUNNING frame over the
    REVERSED sort (``last(payload, ignorenulls)`` over
    [unboundedPreceding, currentRow] with ts/side/tiebreak all
    descending) — semantically identical to ``first`` over
    [currentRow, unboundedFollowing] on the ascending sort, but O(n)
    per partition where Spark's UnboundedFollowing frame re-aggregates
    the whole suffix for EVERY row, i.e. O(n²): the round-7 skew16
    probe measured the ascending form effectively hanging on a hot key
    holding 15/16 of all events (1.5M-row partition ~= 1.1e12 ops),
    while this form is a single linear pass.  Right rows sort AFTER
    left at equal ts ascending — hence BEFORE left in the reversed
    sort — so an exactly-simultaneous right row still matches.
    """
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_payload collides with left columns: {sorted(collisions)};"
            " alias the right side before joining"
        )
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows sort after left at equal ts
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        payload_struct.alias("_payload"),
    )
    left_cols = left.columns
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.desc("_ts"), F.desc("_side"), F.desc("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r, allowMissingColumns=True).withColumn(
        # A null left_ts would sort LAST in this descending order, so
        # its running frame would span every right row in the key —
        # the mirror of the backward join's phantom-match hazard.
        # "smallest right_ts >= NULL" is vacuous: null ts must yield a
        # null payload.
        "_match",
        F.when(
            F.col("_ts").isNotNull(),
            F.last("_payload", ignorenulls=True).over(w),
        ),
    )
    return matched.filter(F.col("_side") == 0).select(
        *left_cols,
        *[F.col("_match")[c].alias(c) for c in right_payload],
    )
