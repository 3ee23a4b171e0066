"""Time a subset of bench rows with bench.py's exact estimator shape
(warmup + clearCache + reset_shared_arms per rep, min-of-2 reps, noop
sink) — for fast optimization iteration without the full ~18 min bench.

Usage: python tools/time_subset.py NAME [NAME...]
       python tools/time_subset.py @/tmp/rows.txt     (one name per line)
Prints one JSON line {name: sec} plus a total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ALL_QUERIES  # noqa: E402
from vexere_lakehouse_pipeline_spark.plans import star_ml  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("@"):
            names += [l.strip() for l in open(a[1:]) if l.strip()]
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = build_session("time-subset")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(ALL_QUERIES[names[0]](spark, sf_dir))  # warmup

    # bench.py's frozen noise probe, sampled at start and end: this
    # box has multi-hour slow phases (host co-tenancy — BENCH_DRIFT.md);
    # a probe much above ~0.3 s at sf0.1 means the numbers are weather,
    # not code.
    from statistics import median

    from pyspark.sql import functions as F

    def _noise_probe() -> float:
        t0 = time.time()
        force(
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .groupBy("l_returnflag")
            .agg(F.sum("l_quantity"),
                 F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                 F.count("*"))
        )
        return time.time() - t0

    noise_start = round(median(_noise_probe() for _ in range(3)), 3)
    out: dict[str, float] = {}
    for name in names:
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            star_ml.reset_shared_arms(
                keep_names=() if name == "sim_topk_bruteforce"
                else ("sim_topk_bruteforce",)
            )
            t0 = time.time()
            force(ALL_QUERIES[name](spark, sf_dir))
            ts.append(time.time() - t0)
        out[name] = round(min(ts), 3)
        print(f"  {out[name]:8.3f}  {name}", file=sys.stderr)
    noise_end = round(median(_noise_probe() for _ in range(3)), 3)
    print(json.dumps({"queries": out,
                      "total": round(sum(out.values()), 3),
                      "noise_start": noise_start,
                      "noise_end": noise_end}))


if __name__ == "__main__":
    main()
