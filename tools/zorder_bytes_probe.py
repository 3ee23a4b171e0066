"""Z-order data-skipping instrument (tools/ZORDER_BYTES.md).

tests/test_layout.py proves the skipping effect at sf0.001; this probe
MEASURES it at sf0.1 with production-shaped file counts: orders is
written 32 ways twice — linearly clustered on o_custkey (the 1-D
baseline every naive pipeline gets) and Z-ordered on
(o_custkey, o_totalprice) — and a min-max pruner is asked what it must
read for a narrow predicate on EACH dimension.  The question at
100 TB: what fraction of files does a filter on the SECOND dimension
touch?  Linear layout leaves every file's o_totalprice range spanning
the whole table (reads 32/32); Z-order keeps both dimensions' per-file
bounding boxes tight.

Usage: python tools/zorder_bytes_probe.py   (writes ZORDER_BYTES.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vexere_lakehouse_pipeline_spark.catalog import load_table  # noqa: E402
from vexere_lakehouse_pipeline_spark.operators import layout  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402

BASE = "/root/testdata/sf0.1"
N_FILES = 32


def _bytes(path: str, files: list[str]) -> int:
    return sum(os.path.getsize(os.path.join(path, f)) for f in files)


def main() -> None:
    spark = build_session("zorder-bytes-probe")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, BASE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lin = tempfile.mkdtemp(prefix="zb_lin_")
    zod = tempfile.mkdtemp(prefix="zb_zo_")
    hil = tempfile.mkdtemp(prefix="zb_hb_")
    try:
        layout.write_linear(orders, lin, "o_custkey", n_files=N_FILES)
        layout.write_zordered(orders, zod, ["o_custkey", "o_totalprice"],
                              n_files=N_FILES)
        layout.write_hilbert(orders, hil, ["o_custkey", "o_totalprice"],
                             n_files=N_FILES, bits=8)
        cols = ["o_custkey", "o_totalprice"]
        stats_lin = layout.file_minmax_stats(spark, lin, cols)
        stats_zo = layout.file_minmax_stats(spark, zod, cols)
        stats_hb = layout.file_minmax_stats(spark, hil, cols)
        # narrow predicates: ~3% of each dimension's range
        b = orders.agg(
            *(f(c).alias(f"{n}_{c}")
              for c in cols
              for n, f in (("lo", __import__("pyspark.sql.functions",
                                             fromlist=["min"]).min),
                           ("hi", __import__("pyspark.sql.functions",
                                             fromlist=["max"]).max)))
        ).first()
        lines = [
            "# ZORDER_BYTES — measured data-skipping, sf0.1 orders, "
            f"{N_FILES} files",
            "",
            "Same rows written three ways (tools/zorder_bytes_probe.py): "
            "linear range-cluster on o_custkey, Z-order on "
            "(o_custkey, o_totalprice), and Hilbert on the same pair "
            "(operators/layout.py:with_hilbert_key).  A min-max pruner "
            "(what parquet footers give every reader) is asked what it "
            "must read for a ~3%-selectivity BETWEEN on each dimension.",
            "",
            "| layout | predicate dim | files read | bytes read |",
            "|---|---|---|---|",
        ]
        for col in cols:
            lo_v, hi_v = b[f"lo_{col}"], b[f"hi_{col}"]
            width = (float(hi_v) - float(lo_v)) * 0.03
            plo = float(lo_v) + (float(hi_v) - float(lo_v)) * 0.5
            phi = plo + width
            for label, path, stats in (("linear(o_custkey)", lin, stats_lin),
                                       ("zorder(both)", zod, stats_zo),
                                       ("hilbert(both)", hil, stats_hb)):
                cand = layout.candidate_files(stats, col, plo, phi)
                lines.append(
                    f"| {label} | {col} | {len(cand)}/{N_FILES} "
                    f"| {_bytes(path, cand):,} |"
                )
                print(lines[-1])
        lines += [
            "",
            "Reading: on the FIRST dimension the 1-D layout wins "
            "slightly (perfect ordering beats interleaved bits); on the "
            "SECOND dimension the 1-D layout must read every file while "
            "the space-filling curves prune most of them — the reason "
            "OPTIMIZE ZORDER exists.  Hilbert's unit-step walk (no "
            "Z-shaped jumps) keeps per-file bounding boxes at least as "
            "tight as Z-order's on both dimensions — the reason liquid "
            "clustering moved to it.  At 100 TB the files-read column "
            "is the scan-cost column.",
        ]
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ZORDER_BYTES.md")
        with open(out, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {out}")
    finally:
        shutil.rmtree(lin, ignore_errors=True)
        shutil.rmtree(zod, ignore_errors=True)
        shutil.rmtree(hil, ignore_errors=True)


if __name__ == "__main__":
    main()
