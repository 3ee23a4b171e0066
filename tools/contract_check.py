"""Static driver-contract guard (no Spark session): every oracle has a
query, every bench headline exists, names are unique across plan
modules, and oracle SQL strings reference only the driver's tables.
Run in CI / before commit: python tools/contract_check.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vexere_lakehouse_pipeline_spark.catalog import TESTDATA_TABLES

TABLES = set(TESTDATA_TABLES)


def main() -> int:
    import __spark_entry__ as em
    from bench import ALL_QUERIES, HEADLINE

    q, o = em.queries(), em.oracle_sql()
    errors: list[str] = []

    dangling = set(o) - set(q)
    if dangling:
        errors.append(f"oracles without queries: {sorted(dangling)}")
    rows_only = set(q) - set(o)
    print(f"{len(q)} queries, {len(o)} oracled, rows-only: {sorted(rows_only)}")

    missing_bench = [n for n in HEADLINE if n not in ALL_QUERIES]
    if missing_bench:
        errors.append(f"bench headline missing: {missing_bench}")

    # module-level name collisions (later module would silently shadow)
    from vexere_lakehouse_pipeline_spark.plans import (
        corpus, star, star_ext, star_ml, star_tpch2,
    )
    mods = {"star": star, "star_ml": star_ml, "star_ext": star_ext,
            "star_tpch2": star_tpch2, "corpus": corpus}
    seen: dict[str, str] = {}
    for mname, m in mods.items():
        for name in m.QUERIES:
            if name in seen:
                errors.append(f"duplicate query name {name}: "
                              f"{seen[name]} and {mname}")
            seen[name] = mname

    # oracle SQL should reference only known tables (catches typos that
    # would fail in the driver's DuckDB harness, not ours)
    # \b guard: without it, column names CONTAINING the keyword (e.g.
    # `n_from AS total`) match as "FROM <next-token>" and flag phantom
    # relations ('AS', aliases, ...).
    ident = re.compile(r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", re.I)
    # `x IS [NOT] DISTINCT FROM y` is a comparison operator, not a
    # relation reference — strip the phrase before scanning.
    distinct_from = re.compile(r"IS\s+(?:NOT\s+)?DISTINCT\s+FROM", re.I)
    for name, sql in o.items():
        sql = distinct_from.sub("IS_DISTINCT_CMP", sql)
        ctes = set(re.findall(
            r"(?:WITH(?:\s+RECURSIVE)?|,)\s*([a-z_][a-z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*\(",
            sql, re.I))
        # FROM/JOIN can be preceded by non-relation syntax: EXTRACT(x
        # FROM ...), JOIN LATERAL (...); ignore those tokens
        ctes |= {"cast", "lateral", "unnest"}
        for t in ident.findall(sql):
            if t.lower() not in TABLES and t.lower() not in {c.lower() for c in ctes}:
                errors.append(f"{name}: unknown relation '{t}' in oracle SQL")

    if errors:
        print("CONTRACT ERRORS:")
        for e in errors:
            print(" -", e)
        return 1
    print("contract OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
