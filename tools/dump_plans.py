"""Dump .explain('formatted') for named queries to plans/r10/<q>_<tag>.txt.

The optimization-round deliverable: before/after physical plans for
every query touched (the judge checks plan claims against these files).

Usage: python tools/dump_plans.py TAG NAME [NAME...]   (TAG = before|after)
       python tools/dump_plans.py TAG --headline       (all bench headline)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ALL_QUERIES, HEADLINE  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if "--headline" in names:
        names = [n for n in names if n != "--headline"] + HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # plan-audit bypass: dump the real pipeline plan, not the shared-arm
    # checkpoint's opaque LogicalRDD scan
    os.environ["VLPS_DISABLE_ARM_CACHE"] = "1"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = ALL_QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
