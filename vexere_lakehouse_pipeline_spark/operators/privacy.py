"""Privacy / data-governance operators: pseudonymization, digit
masking, and k-anonymity measurement.

No reference analog (the reference pipeline ships raw operator names
straight to gold — SURVEY.md §2.1 notes the absence of any scrubbing
between zones); this is north-star surface a pipeline feeding a
training corpus needs before documents or customer records leave the
silver zone.  Sister module of functions/text.py's ``redact_pii``
(URL/email scrub): text.py handles free-text PII, this module handles
STRUCTURED identifiers.

All transforms are pure JVM Columns (regexp / sha2 / groupBy) — no
UDFs, no driver state, no shuffle beyond the k-anonymity aggregation —
so every one of them whole-stage-codegens and scales linearly.

Portability (oracle gate): sha2(x, 256) and DuckDB sha256(x) both emit
lowercase hex; Java regex and RE2 agree on the character-class-only
patterns used here; Spark's regexp_replace is global by default while
DuckDB needs the explicit 'g' flag (oracle SQL must pass it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Character-class only (no lookaround): identical under Java regex and
# RE2, so the DuckDB/Presto oracle can run the same pattern.
_DIGIT_RE = "[0-9]"


def mask_digits(col: Column | str, replacement: str = "X") -> Column:
    """Mask every digit in an identifier-bearing string column.

    The coarse, irreversible scrub for account numbers / customer keys
    embedded in display names.  RE2-safe on purpose: masking must
    behave identically in the engine and in any SQL-pushdown serving
    layer, or masked and unmasked rows could coexist downstream.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _DIGIT_RE, replacement)


def pseudonymize(col: Column | str, salt: str) -> Column:
    """Deterministic salted SHA-256 surrogate for a direct identifier.

    Same input + salt -> same surrogate (joins across tables keep
    working); without the salt the digest is not reversible by
    dictionary attack on the (small) identifier space.  The salt is a
    plan-time literal — at 100 TB this stays a pure projection, no
    shuffle, no driver round-trip.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(salt), c), 256)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Group sizes over quasi-identifier combinations.

    A released table is k-anonymous iff every quasi-identifier
    combination maps to >= k rows; groups below k re-identify
    individuals by linkage.  Output: one row per combination with its
    size and a ``meets_k`` flag — the survey a governance gate runs
    before publishing any slice of customer data.

    Scale: one map-side-partial hash aggregation on the quasi columns
    (cardinality = the anonymity-set count, far below row count); no
    further shuffle.  The flag threshold is a literal, so Catalyst
    folds it into the aggregate's projection.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_report needs at least one quasi column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("group_size"))
        .withColumn("meets_k", F.col("group_size") >= F.lit(k))
    )
