"""Versioned tables: commit / time travel / rollback over plain parquet.

Delta/Iceberg provide this in production (and `ZoneCatalog` maps onto
them when delta-spark is present); this is the engine's dependency-free
equivalent so versioned semantics are testable anywhere:

- every commit writes a NEW immutable version directory ``v=N`` and
  then atomically publishes a tiny manifest file naming it — readers
  either see the old version or the new one, never a half-written mix
  (the same commit-protocol idea as a Delta log entry);
- time travel = reading an older version directory;
- rollback = publishing a manifest that points back to it (the data is
  immutable, so rollback is metadata-only and O(1)).

Full-copy-on-write per commit: simple and correct, trades storage for
simplicity.  At 100 TB you want Delta/Iceberg's file-level manifests —
the API here is deliberately shaped so swapping the backend is a
one-class change.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    """A versioned table rooted at ``base`` — a LOCAL (or locally
    mounted) filesystem path: the manifest protocol uses os.* atomic
    rename, so remote URIs (hdfs://, s3a://) are not supported here.
    On clusters, back the same API with Delta/Iceberg, whose commit
    logs provide this natively."""

    # (df.write itself could target any Hadoop path, but the manifest
    # would silently live on the driver's local disk — refuse instead.)

    def __init__(self, base: str, fmt: str = "parquet"):
        if "://" in base:
            raise ValueError(
                "SnapshotTable requires a local path (manifest uses "
                f"os.rename); got remote URI {base!r} — use Delta/Iceberg"
            )
        self.base = base.rstrip("/")
        self.fmt = fmt

    # -- manifest protocol -------------------------------------------------
    def _manifest_path(self) -> str:
        return f"{self.base}/_MANIFEST.json"

    def _read_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"current": None, "versions": []}
        with open(p) as f:
            return json.load(f)

    def _publish(self, manifest: dict) -> None:
        os.makedirs(self.base, exist_ok=True)
        tmp = f"{self.base}/._manifest.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())  # atomic publish

    # -- public API --------------------------------------------------------
    def commit(self, df: DataFrame, note: str = "",
               max_attempts: int = 5) -> int:
        """Write ``df`` as the next version and publish it.  Optimistic
        concurrency: the version directory is created with
        ``errorifexists``, so two racing writers cannot share one — the
        loser re-reads the manifest and retries the NEXT number; the
        manifest is re-read immediately before publish so a concurrent
        winner's entry is merged, not clobbered.  (A true multi-writer
        log needs a CAS primitive the local FS lacks — Delta/Iceberg
        provide it in production; this makes the local behavior safe
        for retrying single writers and honest about the residual
        window.)  Returns the new version number."""
        last_err: Exception | None = None
        for _ in range(max_attempts):
            m = self._read_manifest()
            version = (m["versions"][-1]["version"] + 1) if m["versions"] else 0
            # advance past any version dir a concurrent (or crashed)
            # writer already claimed, published or not
            if os.path.isdir(self.base):
                claimed = [
                    int(d[2:]) for d in os.listdir(self.base)
                    if d.startswith("v=") and d[2:].isdigit()
                ]
                if claimed:
                    version = max(version, max(claimed) + 1)
            path = f"{self.base}/v={version}"
            try:
                df.write.format(self.fmt).mode("errorifexists").save(path)
            except Exception as e:  # noqa: BLE001 - collision -> retry next id
                last_err = e
                continue
            m = self._read_manifest()  # merge any concurrent publishes
            m["versions"] = [v for v in m["versions"] if v["version"] != version]
            m["versions"].append(
                {
                    "version": version,
                    "committed_at": time.time(),
                    "note": note,
                }
            )
            m["versions"].sort(key=lambda v: v["version"])
            m["current"] = version
            self._publish(m)
            return version
        raise RuntimeError(
            f"commit failed after {max_attempts} attempts: {last_err}"
        )

    def read(self, spark: SparkSession, version: int | None = None,
             as_of_ts: float | None = None) -> DataFrame:
        """Read the current version, a specific ``version``, or the
        latest version committed at-or-before ``as_of_ts``."""
        m = self._read_manifest()
        if m["current"] is None:
            raise FileNotFoundError(f"no committed version at {self.base}")
        if version is None and as_of_ts is not None:
            eligible = [
                v["version"] for v in m["versions"]
                if v["committed_at"] <= as_of_ts
            ]
            if not eligible:
                raise ValueError(f"no version at or before {as_of_ts}")
            version = max(eligible)
        if version is None:
            version = m["current"]
        known = {v["version"] for v in m["versions"]}
        if version not in known:
            raise ValueError(f"unknown version {version}; have {sorted(known)}")
        return spark.read.format(self.fmt).load(f"{self.base}/v={version}")

    def history(self) -> list[dict]:
        m = self._read_manifest()
        return [
            {**v, "is_current": v["version"] == m["current"]}
            for v in m["versions"]
        ]

    def rollback(self, version: int) -> None:
        """Point the table back at an older version (metadata-only)."""
        m = self._read_manifest()
        if version not in {v["version"] for v in m["versions"]}:
            raise ValueError(f"unknown version {version}")
        m["current"] = version
        self._publish(m)

    def optimize(self, spark: SparkSession, target_mb: float = 128,
                 order_by: list[str] | None = None) -> tuple[int, dict]:
        """``OPTIMIZE`` as a TABLE operation (Delta OPTIMIZE writes a
        commit, not a directory): rewrite the current version's small
        files into ``ceil(bytes/target)`` right-sized ones and publish
        the result as a NEW version with the same rows.  History is
        preserved — time travel to the fragmented version still works,
        rollback undoes the rewrite, and :meth:`expire` reclaims the
        old layout under the normal retention window.  Shuffle-free
        ``coalesce`` by default; ``order_by`` re-clusters while
        compacting (the OPTIMIZE ZORDER shape — pass a z-order/hilbert
        key column, operators/layout.py).  Returns
        ``(new_version, stats)`` with measured file/byte counts.
        Row-identity of the standalone path is oracle-gated by
        layout_compact_roundtrip; the version plumbing is pinned in
        tests/test_snapshots.py."""
        from vexere_lakehouse_pipeline_spark.operators import layout

        m = self._read_manifest()
        if m["current"] is None:
            raise FileNotFoundError(f"no committed version at {self.base}")
        cur_path = f"{self.base}/v={m['current']}"
        files_before, bytes_before = layout.fs_file_stats(spark, cur_path)
        target_bytes = max(1, int(target_mb * (1 << 20)))
        n_out = max(1, -(-bytes_before // target_bytes))
        df = spark.read.format(self.fmt).load(cur_path)
        if order_by:
            df = (df.repartitionByRange(n_out, *order_by)
                    .sortWithinPartitions(*order_by))
        else:
            df = df.coalesce(n_out)
        version = self.commit(df, note=f"optimize target_mb={target_mb}")
        files_after, bytes_after = layout.fs_file_stats(
            spark, f"{self.base}/v={version}"
        )
        return version, {
            "files_before": files_before, "bytes_before": bytes_before,
            "files_after": files_after, "bytes_after": bytes_after,
            "n_out": n_out,
        }

    def expire(self, keep_last: int = 2) -> list[int]:
        """Retention maintenance (Delta VACUUM / Iceberg
        expire_snapshots): drop all but the newest ``keep_last``
        versions' data directories.  The current version is always
        kept even if older than the window (a rollback target must
        stay readable).  Publishes the pruned manifest FIRST, then
        deletes data — a crash between the two steps leaves unreferenced
        directories (garbage), never dangling references.  Returns the
        expired version numbers."""
        import shutil

        m = self._read_manifest()
        versions = sorted(v["version"] for v in m["versions"])
        window = set(versions[-keep_last:]) if keep_last > 0 else set()
        keep = window | {m["current"]}
        expired = [v for v in versions if v not in keep]
        if not expired:
            return []
        m["versions"] = [v for v in m["versions"] if v["version"] in keep]
        self._publish(m)
        for v in expired:
            shutil.rmtree(os.path.join(self.base, f"v={v}"),
                          ignore_errors=True)
        return expired


def snapshot_diff(spark: SparkSession, table: "SnapshotTable",
                  from_version: int, to_version: int,
                  key_cols: list[str]) -> DataFrame:
    """Row-level diff between two committed versions: the CDC feed a
    downstream consumer replays instead of re-reading the whole table.

    Returns the union of rows tagged ``_change``:
    ``insert`` (key only in ``to``), ``delete`` (key only in ``from``,
    row content from the old version), ``update`` (key in both, any
    non-key column changed — emitted once with the NEW content).
    Unchanged rows are absent, so the diff's size tracks the actual
    churn, not the table.

    Scale shape: one full-outer join on the key columns (null-safe) —
    the same single wide shuffle a Delta/Iceberg changes() scan pays
    when no change journal exists.  Change detection compares the
    md5 of all non-key columns JVM-side, no Python.
    """
    old = table.read(spark, version=from_version)
    new = table.read(spark, version=to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema drift between versions: {sorted(old.columns)} vs "
            f"{sorted(new.columns)}; diff requires a shared schema"
        )
    # Align column ORDER before comparing types: a reordered-but-equal
    # schema must diff cleanly (the struct CASE below requires both
    # sides field-for-field identical), and a TYPE change is drift.
    old = old.select(*new.columns)
    if old.dtypes != new.dtypes:
        raise ValueError(
            f"schema drift between versions: {old.dtypes} vs "
            f"{new.dtypes}; diff requires identical column types"
        )
    val_cols = [c for c in new.columns if c not in key_cols]
    def _sig(df: DataFrame):
        # Per-column md5 FIRST, then md5 of the fixed-width digest
        # concatenation: each token is exactly 32 hex chars, so no
        # value content can shift column boundaries (a raw-value
        # separator scheme is forgeable by values containing the
        # separator).  Nulls encode as the bare tag 'n' and values as
        # md5('v'+string) — prefix-tagged so no real string collides
        # with the null encoding.
        parts = []
        for c in val_cols:
            parts.append(
                F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                    F.md5(F.concat(F.lit("v"), F.col(c).cast("string")))
                )
            )
        return F.md5(F.concat_ws("", *parts)) if parts else F.lit("")

    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        F.struct(*old.columns).alias("__old_row"),
        _sig(old).alias("__old_sig"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        F.struct(*new.columns).alias("__new_row"),
        _sig(new).alias("__new_sig"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, on=cond, how="full_outer")
    change = (
        F.when(F.col("__old_sig").isNull(), F.lit("insert"))
        .when(F.col("__new_sig").isNull(), F.lit("delete"))
        .when(F.col("__old_sig") != F.col("__new_sig"), F.lit("update"))
    )
    picked = joined.withColumn("_change", change).filter(
        F.col("_change").isNotNull()
    )
    row = F.when(F.col("_change") == "delete", F.col("__old_row")).otherwise(
        F.col("__new_row")
    )
    return picked.select(row.alias("r"), "_change").select("r.*", "_change")


def incremental_gold_refresh(spark: SparkSession, table: "SnapshotTable",
                             from_version: int, to_version: int,
                             pk_cols: list[str],
                             group_exprs: list[tuple],
                             agg_fn, gold_prev: DataFrame,
                             changed_pks: DataFrame | None = None
                             ) -> DataFrame:
    """IVM-lite: refresh a materialized GROUP-BY gold table by
    recomputing ONLY the groups touched by a fact-table mutation batch
    (round-8 verdict #3) — the incremental-refresh shape of
    materialized-view maintenance (Delta MERGE-driven aggregate
    refresh, BigQuery/Snowflake incremental MVs), replacing the
    reference's daily full recompute + overwrite (convert/
    to_gold.py:221-228).

    Inputs: the fact ``table`` at ``from_version`` (what ``gold_prev``
    was computed from) and ``to_version`` (current), the fact's
    ``pk_cols``, ``group_exprs`` — the gold table's derived group keys
    as ``(output_name, Column)`` pairs (e.g. ``("order_date",
    F.to_date("o_orderdate"))``), and ``agg_fn(fact_subset) ->
    gold_rows`` — the UNCHANGED full-recompute builder, applied to a
    subset.

    Shape (all group-level, never row-level merge arithmetic — which
    is why non-distributive aggregates like collect_set need no
    special casing):

    1. ``snapshot_diff`` yields the churn rows;
    2. touched groups = group keys of the changed PKs' rows in BOTH
       versions (the old-side semi-join catches group MOVES — an
       update that relocates a row must refresh the losing group too,
       and the diff's update rows carry only the new content);
    3. the gold rows for touched groups are recomputed by ``agg_fn``
       over the new fact restricted to those groups;
    4. untouched gold rows are kept verbatim (anti-join) — bit-exact
       because every gold aggregate in this repo is
       deterministic (decimal sums, sorted collect_set), so
       kept-rows ≡ what a full recompute would produce.

    Deleted-out groups disappear (removed by the anti-join, absent
    from the recompute).  Equality with the full recompute is
    oracle-hash-proven by gold_cau4_incremental_refresh /
    gold_cau1_incremental_refresh (plans/star_ext.py) and pinned in
    tests/test_snapshots.py.

    ``changed_pks``: pass the mutation batch's key set when the churn
    is already known (CDC feed / MERGE source) — the version diff is
    skipped and the whole refresh is churn-scale; step 1 becomes free.

    Scale: cost tracks CHURN, not table size — the diff is one
    key-aligned full-outer join (partition-prunable when the fact is
    date-partitioned), the two semi-joins broadcast the changed-PK
    set, the recompute scans only touched groups' rows (partition-
    pruned under a group-aligned layout), and the anti-join broadcasts
    the touched-group keys.  A 0.1% daily mutation rate refreshes
    ~0.1% of the gold table instead of 100%.  For churn too large to
    broadcast, drop the hints — AQE picks shuffle sides — or fall
    back to the full recompute (cheaper past ~30-50% churn, the same
    rule of thumb as index rebuilds).
    """
    names = [n for n, _ in group_exprs]
    old = table.read(spark, version=from_version)
    new = table.read(spark, version=to_version)
    # internal join-key aliases so identity group keys (a group column
    # used as-is, e.g. event_type) never collide with fact columns
    tags = [f"__g_{n}" for n in names]
    clash = [t for t in tags if t in new.columns]
    if clash:
        raise ValueError(f"fact columns collide with internal {clash}")
    if changed_pks is not None:
        # the caller ALREADY knows the churn (a CDC batch, a MERGE's
        # source, a change journal) — skip the version diff entirely,
        # so refresh cost is churn-scale with no table-scale join at
        # all (the streaming maintenance path,
        # streaming/ingest.run_stream_gold_refresh).  A superset of
        # the true churn is safe: extra groups recompute to their
        # unchanged values.
        pks = changed_pks.select(*pk_cols).distinct()
    else:
        diff = snapshot_diff(spark, table, from_version, to_version,
                             pk_cols)
        pks = diff.select(*pk_cols).distinct()

    def _touched(side: DataFrame) -> DataFrame:
        return (
            side.join(F.broadcast(pks), pk_cols, "left_semi")
            .select(*[c.alias(n) for n, c in group_exprs])
            .distinct()
        )

    touched = _touched(old).unionByName(_touched(new)).distinct()
    touched_t = touched.select(
        *[F.col(n).alias(t) for n, t in zip(names, tags)]
    )
    scoped = (
        new.select(
            "*", *[c.alias(t) for (_, c), t in zip(group_exprs, tags)]
        )
        .join(F.broadcast(touched_t), tags, "left_semi")
        .drop(*tags)
    )
    refreshed = agg_fn(scoped)
    kept = gold_prev.join(F.broadcast(touched), names, "left_anti")
    return kept.unionByName(refreshed)
