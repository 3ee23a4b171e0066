"""Per-stage wall/CPU profile of one bench query (guide §1: measure first).

Runs NAME through the noop sink (warmup + one timed rep, same estimator
shape as bench.py), then dumps every Spark stage of the timed rep from
the UI REST API: wall span, executor run/CPU time, task count, shuffle
bytes, and the stage name.  The gap between query wall time and the
summed stage spans is driver-side work (planning, collects, commits).

Usage: python tools/stage_profile.py NAME [sf_dir] [--cold]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ALL_QUERIES  # noqa: E402
from vexere_lakehouse_pipeline_spark.plans import star_ml  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cold = "--cold" in sys.argv
    spark = build_session("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    fn = ALL_QUERIES[name]

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup on an unrelated tiny query, like bench.py's
    # warmup pass, so the timed rep isn't dominated by first-run costs.
    force(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))
    if not cold:
        spark.catalog.clearCache()
        star_ml.reset_shared_arms(keep_names=())
        force(fn(spark, sf_dir))  # warm rep (bench times min-of-reps)

    spark.catalog.clearCache()
    star_ml.reset_shared_arms(keep_names=())
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages() -> list[dict]:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    t0 = time.time()
    force(fn(spark, sf_dir))
    wall = time.time() - t0

    rows = []
    for s in stages():
        if s["stageId"] in seen:
            continue
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        span = 0.0
        if sub and comp:
            fmt = "%Y-%m-%dT%H:%M:%S.%f"
            span = (
                time.mktime(time.strptime(comp[:-3], fmt))
                + float(comp[-7:-3])
                - time.mktime(time.strptime(sub[:-3], fmt))
                - float(sub[-7:-3])
            )
        rows.append({
            "id": s["stageId"],
            "span_s": round(span, 3),
            "run_s": round(s.get("executorRunTime", 0) / 1e3, 3),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 3),
            "tasks": s.get("numCompleteTasks", 0),
            "in_mb": round(s.get("inputBytes", 0) / 1e6, 2),
            "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
            "name": s.get("name", "")[:100],
        })
    rows.sort(key=lambda r: -r["span_s"])
    total_span = sum(r["span_s"] for r in rows)
    print(f"query={name} wall={wall:.3f}s stages={len(rows)} "
          f"stage_span_sum={total_span:.2f}s "
          f"driver_gap~{wall - total_span:.2f}s (overlap makes this a floor)")
    for r in rows[:40]:
        print(f"  [{r['id']:>5}] span={r['span_s']:6.3f} run={r['run_s']:7.3f} "
              f"cpu={r['cpu_s']:7.3f} tasks={r['tasks']:3d} in={r['in_mb']:7.2f}MB "
              f"shR={r['sh_r_mb']:6.2f} shW={r['sh_w_mb']:6.2f}  {r['name']}")


if __name__ == "__main__":
    main()
