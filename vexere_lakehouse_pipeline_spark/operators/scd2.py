"""Slowly-changing-dimension type 2 (SCD2) operators.

The reference's dimensions are overwrite-only snapshots (SURVEY.md
§1.2); a lakehouse engine needs versioned dimensions.  Two shapes:

- :func:`scd2_from_changelog` — rebuild full version history from an
  event/change log in one pass: collapse consecutive no-op changes,
  then ``lead`` gives each version its close timestamp.  One shuffle
  on the business key; no iteration, no driver loops.
- :func:`scd2_merge` — incremental: apply one batch of updated
  attribute rows to an existing SCD2 dimension, closing changed
  current versions and opening new ones.  Pure DataFrame (union +
  joins); on Delta-enabled clusters the same logic maps to one
  ``MERGE`` with a whenMatched update + insert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _attrs_differ(attr_cols: list[str], other_prefix: str) -> Column:
    cond = F.lit(False)
    for c in attr_cols:
        cond = cond | ~F.col(c).eqNullSafe(F.col(f"{other_prefix}{c}"))
    return cond


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
    keep_tiebreak: bool = False,
) -> DataFrame:
    """Changelog → SCD2 history.

    Returns one row per version: key cols, attr cols, ``valid_from``,
    ``valid_to`` (null while current), ``is_current``.  Consecutive
    changelog rows whose tracked attributes are unchanged do not open
    a new version.  With ``keep_tiebreak`` the opening row's tiebreak
    value is kept in the output — downstream point-in-time lookups
    need it as a deterministic total order when two versions of one
    key share a ``valid_from`` timestamp.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = changes.select(
        *key_cols,
        ts_col,
        *([tiebreak_col] if tiebreak_col else []),
        *attr_cols,
        *[F.lag(c).over(w).alias(f"_prev_{c}") for c in attr_cols],
    )
    # First-row test via row_number, NOT lag(ts).isNull(): a null ts
    # VALUE in the changelog would otherwise make its successor look
    # like a first row and open a spurious no-op version.
    opens = prev.withColumn(
        "_rn", F.row_number().over(w)
    ).filter(
        (F.col("_rn") == 1) | _attrs_differ(attr_cols, "_prev_")
    ).select(*key_cols, F.col(ts_col).alias("valid_from"),
             *([tiebreak_col] if tiebreak_col else []), *attr_cols)
    worder = [F.col("valid_from")] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*worder)
    out = opens.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        *([tiebreak_col] if (keep_tiebreak and tiebreak_col) else []),
    ).withColumn("is_current", F.col("valid_to").isNull())
    return out


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Apply one update batch (one row per key: key cols, ``ts_col``,
    attr cols) to an SCD2 dimension produced by
    :func:`scd2_from_changelog` (or a prior merge).

    Semantics: keys whose current attrs differ (or that are new) get
    their current version closed at the update timestamp and a new
    current version opened.  Unchanged keys pass through untouched —
    idempotent re-application of the same batch is a no-op.
    """
    # One-row-per-key is a CONTRACT, not a convention: a duplicate key
    # in the batch would replicate that key's current row through the
    # full-outer join and open two simultaneous "current" versions —
    # silent dimension corruption.  Reject loudly (same policy as
    # incremental.upsert); multi-change batches belong in
    # scd2_from_changelog.
    dup = (
        updates.groupBy(*key_cols).agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        key = {k: dup[0][k] for k in key_cols}
        raise ValueError(f"scd2_merge batch has duplicate key(s): {key}")
    # Explicit existence marker: after the full outer join, "dim row
    # present" must not be inferred from a NULLABLE data column like
    # valid_from (a matched current row with null valid_from would look
    # absent and be silently dropped).
    cur = dim.filter(F.col("is_current")).withColumn(
        "_dim_exists", F.lit(True)
    )
    hist = dim.filter(~F.col("is_current"))
    # Same existence-marker discipline as the dim side: inferring
    # "update present" from the NULLABLE _u_ts would silently drop or
    # ignore update rows whose timestamp is null.
    upd = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols],
        F.col(ts_col).alias("_u_ts"),
        *[F.col(c).alias(f"_u_{c}") for c in attr_cols],
        F.lit(True).alias("_u_exists"),
    )
    # Null-safe key equality: replayed null-keyed rows must MATCH their
    # existing version, not open a duplicate one (same reason
    # incremental.merge_append uses <=>).
    joined = cur.join(
        upd,
        on=[F.col(k).eqNullSafe(F.col(f"_u_{k}")) for k in key_cols],
        how="full_outer",
    )
    # Out-of-order guard: an update OLDER than the current version's
    # valid_from must not close it backwards (inverted validity
    # interval) — stale updates are treated as no-ops.  A null
    # valid_from (unknown open time) accepts any update.
    update_is_newer = F.col("valid_from").isNull() | (
        F.col("_u_ts") > F.col("valid_from")
    )
    changed = joined.filter(
        F.col("_u_exists").isNotNull()
        & F.col("_dim_exists").isNotNull()
        & update_is_newer
        & _attrs_differ(attr_cols, "_u_")
    )
    unchanged_or_no_update = joined.filter(
        F.col("_dim_exists").isNotNull()
        & (
            F.col("_u_exists").isNull()
            | ~_attrs_differ(attr_cols, "_u_")
            | ~F.coalesce(update_is_newer, F.lit(False))
        )
    ).select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    closed = changed.select(
        *key_cols, *attr_cols, "valid_from",
        F.col("_u_ts").alias("valid_to"), F.lit(False).alias("is_current"),
    )
    new_keys = joined.filter(
        F.col("_u_exists").isNotNull() & F.col("_dim_exists").isNull()
    )
    opened = (
        changed.unionByName(new_keys, allowMissingColumns=True)
        .select(
            *[F.coalesce(F.col(k), F.col(f"_u_{k}")).alias(k) for k in key_cols],
            *[F.col(f"_u_{c}").alias(c) for c in attr_cols],
            F.col("_u_ts").alias("valid_from"),
            F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        hist.select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
        .unionByName(unchanged_or_no_update)
        .unionByName(closed)
        .unionByName(opened)
    )
