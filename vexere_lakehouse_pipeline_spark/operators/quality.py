"""Declarative data-quality expectations, evaluated in one pass.

The lakehouse contract layer (Delta Live Tables expectations / dbt
tests / Great Expectations, re-expressed Spark-first): each expectation
is a boolean Column; violation counts for ALL expectations are computed
in a SINGLE aggregation over one scan (conditional-count fusion), so a
50-expectation suite costs the same scan as one.  The reference has no
checks at all — errors are swallowed (convert/to_silver.py:137-140,
SURVEY §3.2); this is the engine-grade replacement.

Three verbs:
- :func:`check`     -> tidy report DataFrame (expectation, n_violations, n_rows)
- :func:`enforce`   -> raise QualityError if any hard expectation fails
- :func:`quarantine`-> split (good, bad) in one lazy pass; bad rows carry
  the list of failed expectation names for triage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class QualityError(AssertionError):
    """Raised by :func:`enforce` when hard expectations fail."""


def check(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """Violation report for all expectations in one aggregation.

    ``expectations`` maps name -> boolean Column that should hold for
    every row (null counts as a violation — unknown is not a pass).
    """
    aggs = [
        F.count(F.when(~F.coalesce(cond, F.lit(False)), 1)).alias(name)
        for name, cond in expectations.items()
    ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs).first()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(name, int(row[name]), int(row["__n"])) for name in expectations],
        "expectation string, n_violations long, n_rows long",
    )


def enforce(df: DataFrame, expectations: dict[str, Column]) -> DataFrame:
    """Raise :class:`QualityError` naming every failed expectation (with
    counts); returns ``df`` unchanged when all hold — composes as a
    pipeline stage: ``silver = enforce(conform(bronze), CONTRACT)``."""
    report = check(df, expectations)
    failed = [
        f"{r['expectation']} ({r['n_violations']}/{r['n_rows']} rows)"
        for r in report.collect()
        if r["n_violations"] > 0
    ]
    if failed:
        raise QualityError("expectations failed: " + "; ".join(failed))
    return df


def quarantine(df: DataFrame,
               expectations: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Split into (good, bad) lazily — no extra scan at split time; the
    bad side carries ``failed_expectations array<string>``.  The scale
    path for continuous ingest: good rows flow on, bad rows land in a
    quarantine table with their reasons."""
    fails = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in expectations.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_expectations", fails)
    good = tagged.filter(F.size("failed_expectations") == 0).drop(
        "failed_expectations"
    )
    bad = tagged.filter(F.size("failed_expectations") > 0)
    return good, bad


def unique_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicate-key report (uniqueness can't be a per-row Column —
    it needs a groupBy): keys appearing more than once, with counts."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .orderBy(F.desc("n"), *cols)
    )


def with_observation(df: DataFrame, name: str,
                     metrics: dict[str, Column]):
    """Attach in-flight metrics to a plan: returns (df, Observation).
    The metrics are computed DURING the next action on ``df`` (no
    second scan — the rows are observed as they stream through), then
    read with ``obs.get``.  The audit-friendly way to record row
    counts / violation counts of every pipeline write for free."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[m.alias(k) for k, m in metrics.items()]), obs


def profile(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """One-pass dataset profile: n / nulls / distinct / min / max per
    column, returned long-format (column, n_rows, n_null, n_distinct,
    min_value, max_value).  All columns' stats compute in a SINGLE
    aggregation (one scan, map-side partials) — the catalog/discovery
    primitive; countDistinct keeps it exact (swap approx_count_distinct
    at 100 TB if ±2% is acceptable)."""
    aggs = []
    for c in numeric_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
            F.max(F.col(c).cast("double")).alias(f"{c}__hi"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs).first()
    spark = df.sparkSession
    opt = lambda v: None if v is None else float(v)  # noqa: E731 — all-null
    # columns / empty frames profile as NULL min/max, they don't crash
    return spark.createDataFrame(
        [
            (
                c,
                int(row["__n"]),
                int(row["__n"]) - int(row[f"{c}__nn"]),
                int(row[f"{c}__nd"]),
                opt(row[f"{c}__lo"]),
                opt(row[f"{c}__hi"]),
            )
            for c in numeric_cols
        ],
        "column string, n_rows long, n_null long, n_distinct long, "
        "min_value double, max_value double",
    )


def schema_diff(contract: T.StructType,
                actual: T.StructType) -> dict[str, list[str]]:
    """Contract-vs-actual schema comparison — the check a zone boundary
    runs before accepting a producer's output.

    MEASUREMENT only (policy lives in :func:`enforce_schema`): always
    reports every difference.  Returns {"missing", "added", "retyped",
    "nullability"} where retyped entries read
    "col: contract_type -> actual_type" and nullability lists columns
    the contract requires NON-NULL but the producer now allows null
    (the loosening direction — an actual column STRICTER than the
    contract is fine).  Pure metadata — no Spark job.
    """
    c = {f.name: f.dataType.simpleString() for f in contract.fields}
    a = {f.name: f.dataType.simpleString() for f in actual.fields}
    c_null = {f.name: f.nullable for f in contract.fields}
    a_null = {f.name: f.nullable for f in actual.fields}
    both = set(c) & set(a)
    return {
        "missing": sorted(set(c) - set(a)),
        "added": sorted(set(a) - set(c)),
        "retyped": sorted(
            f"{k}: {c[k]} -> {a[k]}" for k in both if c[k] != a[k]
        ),
        "nullability": sorted(
            f"{k}: non-nullable -> nullable"
            for k in both
            if not c_null[k] and a_null[k]
        ),
    }


def enforce_schema(df: DataFrame, contract: T.StructType,
                   allow_added: bool = True) -> DataFrame:
    """Raise :class:`QualityError` when ``df`` violates ``contract``
    (see :func:`schema_diff`); returns ``df`` unchanged when clean so
    it composes into write pipelines as a pass-through gate.
    ``allow_added`` mirrors additive schema evolution (mergeSchema
    tolerates it); missing, retyped, and nullability-loosened columns
    are always violations."""
    d = schema_diff(contract, df.schema)
    if allow_added:
        d["added"] = []
    problems = [f"{k}={v}" for k, v in d.items() if v]
    if problems:
        raise QualityError(f"schema contract violation: {'; '.join(problems)}")
    return df


def fk_orphan_audit(child: DataFrame, child_key: str, parent: DataFrame,
                    parent_key: str, edge: str) -> DataFrame:
    """Referential-integrity audit for one declared FK edge.

    One row: (edge, n_rows, n_null_keys, n_orphan_rows, n_orphan_keys)
    where an orphan is a non-null child key with no parent match — the
    data-contract check every warehouse load runs before publishing.

    Scale shape: the child is first reduced to DISTINCT keys with
    per-key row counts (map-side combinable; the shuffle moves keys,
    not rows), then anti-joined against the parent's distinct key set —
    for dimension-sized parents Spark broadcasts that side; for
    fact-to-fact edges it is a key-vs-key shuffle, never row-vs-row.
    """
    keyed = child.select(F.col(child_key).alias("_k"))
    stats = keyed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("_k").isNull(), 1)).alias("n_null_keys"),
    )
    key_counts = (
        keyed.filter(F.col("_k").isNotNull())
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    orphans = key_counts.join(
        parent.select(F.col(parent_key).alias("_k")).distinct(),
        on="_k",
        how="left_anti",
    )
    orphan_stats = orphans.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_orphan_rows"),
        F.count(F.lit(1)).cast("long").alias("n_orphan_keys"),
    )
    return stats.crossJoin(orphan_stats).select(
        F.lit(edge).alias("edge"),
        F.col("n_rows").cast("long"),
        F.col("n_null_keys").cast("long"),
        "n_orphan_rows",
        "n_orphan_keys",
    )


def hashed_stub_weights(spark, n_buckets: int = 1024,
                        salt: str = "qclfw") -> DataFrame:
    """Deterministic stand-in weight table for
    :func:`linear_text_classifier` — (bucket, w_milli) with w_milli =
    hash(bucket) % 2001 − 1000 ∈ [−1000, 1000] milli-units.  Plays the
    role trained fasttext/logistic weights play in production (the
    operator takes ANY (bucket, w_milli) table); being hash-derived,
    selection-only, it keeps the whole inference path oracle-
    reproducible, the same stand-in discipline as the sampled PQ
    codebooks and the deterministic sentiment fake."""
    from vexere_lakehouse_pipeline_spark.operators.sampling import hash_bucket

    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (hash_bucket(F.col("id"), salt) % 2001 - 1000)
        .cast("long").alias("w_milli"),
    )


def linear_text_classifier(docs: DataFrame, weights: DataFrame,
                           text_col: str = "text", id_col: str = "doc_id",
                           n_buckets: int = 1024,
                           intercept_milli: int = 0,
                           salt: str = "qclf") -> DataFrame:
    """Model-based quality filtering — the fasttext-style LINEAR
    classifier inference stage every production corpus pipeline runs
    (CCNet/LLaMA-style "quality classifier" gating), as one scan:

    tokens → hashed feature bucket (md5, engine-portable) → broadcast
    join against the K-row weight table → per-doc integer sum.  Score
    is exact int64 milli-units (w ∈ milli-units, |score| ≤ n_tokens ·
    1e3·max|w| ≪ 2⁶³); is_high_quality = score ≥ 0 is the gate bit.

    ``weights`` is the model: (bucket, w_milli), trained offline in
    production (fasttext → hashed-bucket projection) —
    :func:`hashed_stub_weights` is the deterministic stand-in that
    keeps the row oracle-gated.  Unseen buckets weigh 0 (left join +
    coalesce), token-less docs score ``intercept_milli`` with
    n_tokens = 0 and a NULL mean.

    Scale shape: explode is the only fan-out (token-linear), the
    weight table is K rows (model-state scale — ALWAYS broadcast), and
    the per-doc rollup is one map-side-partial aggregation on doc_id.
    No shuffle touches anything wider than (doc_id, bucket).
    Returns (doc_id, n_tokens, score_milli, mean_w_milli,
    is_high_quality).
    """
    from vexere_lakehouse_pipeline_spark.functions.text import tokenize
    from vexere_lakehouse_pipeline_spark.operators.sampling import hash_bucket

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(text_col)).alias("token"),
    )
    feat = tok.select(
        "doc_id", (hash_bucket("token", salt) % n_buckets).alias("bucket")
    )
    scored = (
        feat.join(F.broadcast(weights), on="bucket", how="left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("w_milli"), F.lit(0)))
            .cast("long").alias("_sum_w"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(scored, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (F.coalesce("_sum_w", F.lit(0)) + F.lit(intercept_milli))
            .cast("long").alias("score_milli"),
            # mean of the TOKEN weights (intercept excluded); NULL for
            # token-less docs.  DIV truncates toward zero on both
            # engines (DuckDB // matches — verified on negatives).
            F.expr("_sum_w DIV NULLIF(n_tokens, 0)")
            .cast("long").alias("mean_w_milli"),
            (
                F.coalesce("_sum_w", F.lit(0)) + F.lit(intercept_milli) >= 0
            ).alias("is_high_quality"),
        )
    )
