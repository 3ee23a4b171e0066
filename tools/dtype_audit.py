"""Cross-engine dtype audit — the static gate for the r1 hash-fail mode.

The driver's correctness gate canonicalizes rows from BOTH engines; a
column whose pandas dtype diverges between DuckDB and Spark (DuckDB
HUGEINT -> float64 vs Spark int64 was round 1's `events_json_props`
hash-fail) can stringify differently even when values are identical.
This audit catches the hazard before the driver does:

1. DuckDB float64 where Spark is integer/decimal -> usually an uncast
   SUM(int)/window-sum (HUGEINT).  Fix: CAST(... AS BIGINT) in the
   oracle.  NULL-induced float64 over a BIGINT-typed column is reported
   as `null-induced` (the driver handled those green in r1).
2. DuckDB int where Spark is double -> cast the Spark side or the SQL.
3. Complex-typed Spark output (array/struct/map) -> the driver's
   canonicalizer crashes on unhashable cells (r1's
   `array_function_showcase`).  Stringify in both engines.

Usage: python tools/dtype_audit.py [sf_dir]   (exit 1 on any finding)
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from vexere_lakehouse_pipeline_spark.catalog import TESTDATA_TABLES  # noqa: E402
from vexere_lakehouse_pipeline_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entry_mod.oracle_sql()
    duck: dict[str, dict[str, tuple[str, str]]] = {}
    for name, sql in oracles.items():
        rel = con.execute(sql)
        df = rel.df()
        # typeof() distinguishes true HUGEINT from NULL-induced float64
        cols = list(df.columns)
        sel = ", ".join(
            f'typeof("{c}") AS t_{i}' for i, c in enumerate(cols)
        )
        row = con.execute(f"SELECT {sel} FROM ({sql}) LIMIT 1").fetchone()
        sql_types = dict(zip(cols, row)) if row else {c: "?" for c in cols}
        duck[name] = {
            c: (str(d), sql_types.get(c, "?")) for c, d in df.dtypes.items()
        }

    spark = build_session("dtype-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    findings: list[str] = []
    for name, fn in entry_mod.queries().items():
        sdf = fn(spark, sf_dir)
        stypes = dict(sdf.dtypes)
        for c, st in stypes.items():
            if st.startswith(("array", "struct", "map")):
                findings.append(
                    f"{name}.{c}: complex Spark type {st} — the driver "
                    "canonicalizer crashes on list cells; stringify"
                )
        for c, (pd_t, sql_t) in duck.get(name, {}).items():
            st = stypes.get(c)
            if st is None:
                continue
            if pd_t == "float64" and st not in ("double", "float"):
                if sql_t == "BIGINT":
                    # NULLs force pandas to float64; driver-proven green
                    continue
                findings.append(
                    f"{name}.{c}: duck {sql_t}->float64 vs spark {st} — "
                    "CAST the oracle expression"
                )
            if pd_t in ("int64", "int32") and st in ("double", "float"):
                findings.append(
                    f"{name}.{c}: duck int vs spark {st} — align the types"
                )
    for f in findings:
        print("DTYPE", f)
    print(f"{len(findings)} dtype findings over {len(oracles)} queries")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
