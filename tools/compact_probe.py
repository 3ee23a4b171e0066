"""Small-file compaction instrument (tools/COMPACT.md).

tests/test_layout.py proves compact_files is lossless at sf0.001;
this probe MEASURES the operational payoff at sf0.1 with the
production failure shape: lineitem fragmented into 512 tiny files
(what a minutely streaming sink leaves behind in a day) vs the same
rows compacted to a right-sized layout by the shuffle-free coalesce
path.  Measured: file count, bytes, full-scan aggregate wall time,
and compaction wall time.  The question at 100 TB: a million-file
table pays file-open + footer-parse + task-schedule overhead per
file — how much scan time does OPTIMIZE buy back, and what does the
rewrite itself cost?

Usage: python tools/compact_probe.py   (writes COMPACT.md)
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
from vexere_lakehouse_pipeline_spark.operators import layout  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402

BASE = "/root/testdata/sf0.1"
N_FRAGMENTS = 512
TARGET_MB = 32
REPS = 3


def _scan_time(spark, path: str) -> float:
    """Median full-scan aggregate wall time over REPS runs."""
    times = []
    for _ in range(REPS):
        t0 = time.monotonic()
        spark.read.parquet(path).agg(
            F.count("*"), F.sum("l_quantity"), F.min("l_shipdate")
        ).collect()
        times.append(time.monotonic() - t0)
    return sorted(times)[len(times) // 2]


def main() -> None:
    spark = build_session("compact-probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, BASE, "lineitem")
    frag = tempfile.mkdtemp(prefix="cp_frag_")
    opt = tempfile.mkdtemp(prefix="cp_opt_")
    try:
        li.repartition(N_FRAGMENTS).write.mode("overwrite").parquet(frag)
        t0 = time.monotonic()
        stats = layout.compact_files(spark, frag, opt, target_mb=TARGET_MB)
        compact_s = time.monotonic() - t0
        frag_scan = _scan_time(spark, frag)
        opt_scan = _scan_time(spark, opt)
        rows_f = spark.read.parquet(frag).count()
        rows_o = spark.read.parquet(opt).count()
        assert rows_f == rows_o, (rows_f, rows_o)
        out = f"""# COMPACT — measured small-file compaction, sf0.1 lineitem

The streaming-sink failure shape (tools/compact_probe.py): lineitem
({rows_o:,} rows) fragmented into {stats['files_before']} tiny files,
then compacted by the shuffle-free coalesce path
(operators/layout.py:compact_files, target {TARGET_MB} MB).

| layout | files | bytes | full-scan agg (median of {REPS}) |
|---|---|---|---|
| fragmented | {stats['files_before']} | {stats['bytes_before']:,} | {frag_scan:.2f} s |
| compacted | {stats['files_after']} | {stats['bytes_after']:,} | {opt_scan:.2f} s |

Compaction itself (one read + one write, no shuffle): {compact_s:.2f} s.
Bytes shrink {stats['bytes_before'] / max(1, stats['bytes_after']):.2f}x
as a side effect — {stats['files_before']} per-file dictionaries/footers
collapse into {stats['files_after']} and column chunks grow into
efficient encodings.  Scan speedup {frag_scan / max(1e-9, opt_scan):.1f}x
at only {stats['files_before']} files on local SSD; at 100 TB with
object-store latencies (tens of ms per open) and million-file tables
the per-file overhead dominates scans long before this point — which
is why OPTIMIZE is scheduled maintenance, not a luxury.  Rows verified
equal before/after; bit-losslessness is oracle-gated by
layout_compact_roundtrip.
"""
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "COMPACT.md"), "w") as fh:
            fh.write(out)
        print(out)
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(opt, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
