"""Incremental-gold-refresh payoff instrument (IVM.md).

The r9 verdict noted the gated IVM rows time the whole FIXTURE
lifecycle (two full-fact commits + gold@v0 + diff), so they cannot
show the operator's point: refresh cost should track CHURN, not table
size.  This probe isolates the refresh itself at sf0.1 on the cau4
gold (orders grouped by day), with REALISTIC churn — late-arriving
mutations concentrated in the most recent months, the shape that
makes date partitioning pay — across five arms:

- **recompute**   — the full cau4_agg over the current fact (what
  the reference's daily job pays, convert/to_gold.py:221-228);
- **journal**     — incremental_gold_refresh with ``changed_pks``
  given (a CDC batch / MERGE source knows its keys): no diff at all;
- **pruned diff** — journalless; the fact was committed with
  ``part_by`` month fingerprints, so snapshot_diff reads ONLY
  fingerprint-changed partitions and the touched set comes off the
  diff's both-side rows (no extra fact scans);
- **pruned+scoped** — same, plus ``scope_parts=True`` (day groups
  refine month partitions), so the RECOMPUTE scan is also restricted
  to changed partitions: the whole refresh reads churned partitions
  + the previous gold, nothing else;
- **unpruned diff** — journalless against a plain (unpartitioned)
  commit of the SAME content: the r8-shape table-scale diff.

Every refresh arm's output is checked row-identical to the recompute
before timing is reported.  `fact rows read` counts every fact-scan
the arm's plan performs (both diff sides + the recompute input) —
the number that scales with table size at 100 TB, where wall-clock
at sf0.1 is dominated by fixed per-stage overhead.

Usage: python tools/ivm_probe.py   (writes tools/IVM.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vexere_lakehouse_pipeline_spark.catalog import load_table  # noqa: E402
from vexere_lakehouse_pipeline_spark.operators import snapshots as snap  # noqa: E402
from vexere_lakehouse_pipeline_spark.operators.snapshots import (  # noqa: E402
    _restrict_to_partitions,
)
from vexere_lakehouse_pipeline_spark.plans import star  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3

# (label, months back from the max date, key modulus within the
#  window, fact inflation factor)
FRACTIONS = [
    ("last month, 1/8 keys", 1, 8, 1),
    ("last month", 1, 1, 1),
    ("last 8 months", 8, 1, 1),
    # inflated facts: same churn window, 16x/48x the rows — the
    # pruned-vs-unpruned wall-clock gap opens here (~flat vs linear)
    ("last month @ 16x fact", 1, 1, 16),
    ("last month @ 48x fact", 1, 1, 48),
]

PKS = ["o_orderkey"]


def _time_best(fn):
    best, out = float("inf"), None
    for _ in range(REPS):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def main() -> None:
    spark = build_session("ivm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    groups = [("order_date", F.to_date("o_orderdate"))]
    orders = load_table(spark, BASE, "orders")
    n_base = orders.count()
    max_d = orders.agg(F.max(F.to_date("o_orderdate"))).collect()[0][0]
    staging = tempfile.mkdtemp(prefix="ivm_probe_")

    lines = [
        "# IVM — refresh-only cost vs full recompute, sf0.1 "
        f"({n_base:,} base orders, cau4 gold, month-partitioned)",
        "",
        "Late-arriving churn concentrated in the newest months (the "
        "layout-aligned shape date partitioning exists for).  Fixture "
        "commits + gold@v0 excluded; arms timed "
        f"best-of-{REPS} to a driver collect of the ~2.4k-row gold, "
        "refresh outputs first checked row-identical to the "
        "recompute (tools/ivm_probe.py).  `parts` = fingerprint-"
        "changed month partitions / total; `fact rows read` = every "
        "fact scan in the arm's plan (diff sides + recompute input) "
        "— the table-size-scaling term.",
        "",
        "| churn | rows churned | parts | arm | fact rows read | "
        f"best-of-{REPS} s |",
        "|---|---|---|---|---|---|",
    ]

    for label, months, keymod, inflate in FRACTIONS:
        fact = orders
        if inflate > 1:
            # widen the fact with distinct keys, same date spread:
            # the churn window stays month-shaped while every scan
            # term grows by the factor
            fact = (
                orders.withColumn(
                    "__i", F.explode(F.sequence(F.lit(0),
                                                F.lit(inflate - 1)))
                )
                .withColumn(
                    "o_orderkey",
                    F.col("o_orderkey") * inflate + F.col("__i"),
                )
                .drop("__i")
            )
        n_fact = fact.count()
        cutoff = F.add_months(F.lit(max_d), -months)
        k = F.col("o_orderkey")
        in_window = (F.to_date("o_orderdate") >= cutoff) & (
            k % keymod == 0
        )
        stale = (
            fact.withColumn(
                "o_totalprice",
                F.when(in_window, F.col("o_totalprice") + 100.0)
                .otherwise(F.col("o_totalprice")),
            )
            .withColumn(  # day-moving update inside the window
                "o_orderdate",
                F.when(in_window & (k % 5 == 1),
                       F.col("o_orderdate") - F.expr("INTERVAL 10 DAYS"))
                .otherwise(F.col("o_orderdate")),
            )
        )

        def _with_month(df):
            return df.withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            )

        fdir = os.path.join(staging, f"w{months}_{keymod}_{inflate}")
        part_t = snap.SnapshotTable(os.path.join(fdir, "fact_part"))
        plain_t = snap.SnapshotTable(os.path.join(fdir, "fact_plain"))
        part_t.commit(_with_month(stale), part_by=["o_month"],
                      note="stale v0")
        part_t.commit(_with_month(fact), part_by=["o_month"],
                      note="true v1")
        plain_t.commit(stale, note="stale v0")
        plain_t.commit(fact, note="true v1")
        gold0 = star.cau4_agg(
            part_t.read(spark, version=0)
        ).localCheckpoint(eager=True)
        churn_keys = (
            fact.filter(in_window).select("o_orderkey")
            .localCheckpoint(eager=True)
        )
        n_churn = churn_keys.count()
        pby, changed = snap.changed_partitions(part_t, 0, 1)
        n_parts = len(part_t.history()[1]["parts"])
        c0 = _restrict_to_partitions(
            part_t.read(spark, version=0), pby, changed).count()
        c1 = _restrict_to_partitions(
            part_t.read(spark, version=1), pby, changed).count()

        def _recompute():
            return star.cau4_agg(part_t.read(spark)).collect()

        def _refresh(**kw):
            tbl = kw.pop("tbl")
            return snap.incremental_gold_refresh(
                spark, tbl, 0, 1, PKS, groups, star.cau4_agg, gold0,
                **kw,
            ).collect()

        arms = [
            ("recompute", n_fact, _recompute),
            ("journal", 3 * n_fact,
             lambda: _refresh(tbl=part_t, changed_pks=churn_keys)),
            ("pruned diff", c0 + c1 + n_fact,
             lambda: _refresh(tbl=part_t)),
            ("pruned+scoped", c0 + 2 * c1,
             lambda: _refresh(tbl=part_t, scope_parts=True)),
            ("unpruned diff", 2 * n_fact + n_fact,
             lambda: _refresh(tbl=plain_t)),
        ]
        want = sorted(map(tuple, _recompute()), key=repr)
        for name, _, fn in arms[1:]:
            got = sorted(map(tuple, fn()), key=repr)
            assert got == want, f"{label}/{name} diverged from recompute"
        for name, rows_read, fn in arms:
            spark.catalog.clearCache()
            t, _ = _time_best(fn)
            lines.append(
                f"| {label} | {n_churn:,} | {len(changed)}/{n_parts} "
                f"| {name} | {rows_read:,} | {t:.2f} |"
            )
            print(lines[-1])

    lines += [
        "",
        "Reading the table: `fact rows read` is the scale story — "
        "the pruned+scoped journalless refresh reads only the "
        "churned months (3 scans of the changed partitions) while "
        "the unpruned journalless diff re-scans everything.  The "
        "measured crossover is that pair: ~flat vs linear-in-fact "
        "as the inflated rows grow the table at fixed churn.  The "
        "full RECOMPUTE of this particular gold stays sub-second at "
        "probe sizes because cau4 is a single-table scan-agg that "
        "parallelizes perfectly on a warm local[32] JVM — its "
        "rows-read column (the whole fact, every cycle) is the term "
        "that becomes hours at 100 TB; join-heavy golds shift the "
        "wall-clock crossover far earlier.  The JOURNAL arm is the "
        "streaming path (run_stream_gold_refresh passes the batch "
        "as changed_pks): zero diff cost but broadcast semi-joins "
        "against the full fact — at the largest probe the "
        "pruned+scoped journalless arm already beats it; combining "
        "a journal with scope_parts-style layout alignment gets "
        "both.",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "IVM.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    shutil.rmtree(staging, ignore_errors=True)
    print("wrote tools/IVM.md")


if __name__ == "__main__":
    main()
