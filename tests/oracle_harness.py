"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs every registry query on Spark AND its oracle SQL on DuckDB over the same
parquet, then compares: row count, sorted column names, and the full multiset
of values (exact for non-floats; floats must agree to 1e-9 — the registry
rounds all double outputs, so any visible drift here predicts a driver
hash mismatch).

Usage:  python -m tests.oracle_harness [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

from data_pipeline_eng_project_1_spark import get_spark
from data_pipeline_eng_project_1_spark.plans import queries as Q
from data_pipeline_eng_project_1_spark.sources.catalog import TABLES

FLOAT_TOL = 1e-9

#: DuckDB output types whose pandas/arrow serialization diverges from the
#: Spark-side type even when values are numerically identical — the
#: driver's value-hash is TYPE-SENSITIVE, so any oracle emitting one of
#: these passes the canonicalized compare below yet fails the driver's
#: typed hash (r9: events_kaplan_meier's uncasted window sum came back
#: HUGEINT/int128 vs Spark's int64 — rows/schema matched, hash failed).
#: Wrap the offending expression in CAST(... AS BIGINT/DOUBLE).
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def banned_oracle_types(con, oracle_sql: str) -> list[str]:
    """Return ``col:TYPE`` for every oracle output column whose DuckDB
    type is in the typed-hash-unsafe set (empty list == safe). Planning
    only — the query is not executed. Matched as word-bounded tokens
    ANYWHERE in the type string, so a HUGEINT nested inside a STRUCT or
    LIST is caught too (a prefix check would pass
    ``STRUCT(cnt HUGEINT)`` — the exact class the lint exists for),
    while a struct FIELD merely named e.g. ``decimal_x`` is not
    (underscore continues the word, so no boundary)."""
    import re as _re

    pat = _re.compile(r"\b(" + "|".join(_BANNED_DUCK_TYPES) + r")\b")
    rel = con.sql(oracle_sql)
    return [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
            if pat.search(str(t).upper())]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    spec = next(s for s in Q.specs() if s.name == name)
    sdf = spec.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        return True, f"rows-only: {len(srows)} rows"
    bad = banned_oracle_types(con, spec.oracle)
    if bad:
        return False, (f"ORACLE TYPE {bad}: driver's typed value-hash "
                       f"will mismatch even on bit-exact values — CAST "
                       f"the expression (r9 kaplan lesson)")
    ddf = con.execute(spec.oracle).fetchall()
    dcols = [d[0] for d in con.description]
    if sorted(scols) != sorted(dcols):
        return False, f"SCHEMA spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(ddf):
        return False, f"ROWCOUNT spark={len(srows)} duck={len(ddf)}"
    a, b = _canon(srows, scols), _canon(ddf, dcols)
    mism = sum(1 for x, y in zip(a, b) if x != y)
    if mism:
        ex = next((x, y) for x, y in zip(a, b) if x != y)
        return False, f"VALUES {mism}/{len(a)} rows differ; e.g. {ex[0]} vs {ex[1]}"
    return True, f"{len(a)} rows match"


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or [s.name for s in Q.specs()]
    if names and names[0] == "--walk":
        # Driver-walk simulation: the first N specs in GRADING order
        # (needy first, family-interleaved, then stalest) — exactly the
        # rows the next CORRECTNESS_r{N}.json will hold. Run this before
        # a round ends to pre-validate the graded walk end-to-end.
        # Usage: python -m tests.oracle_harness [sf_dir] --walk 50
        from data_pipeline_eng_project_1_spark.plans import registry

        n = int(names[1]) if len(names) > 1 else 50
        Q.specs()
        names = [s.name for s in registry.all_specs()][:n]
        print(f"walk {len(names)}: {' '.join(names)}", flush=True)
    elif names and names[0] == "--stalest":
        # Evidence-freshness spot check: re-verify the N queries whose
        # latest green correctness row is OLDEST (the registry's own
        # stalest-first order, skipping the needs-evidence block the
        # driver will grade anyway) — the one-liner form of the judge's
        # manual r7 rerun. Usage: python -m tests.oracle_harness
        # [sf_dir] --stalest 20
        from data_pipeline_eng_project_1_spark.plans import registry

        n = int(names[1]) if len(names) > 1 else 20
        Q.specs()  # ensure every plan module has registered
        names = [s.name for s in registry.all_specs()
                 if not registry._needs_evidence(s.name)][:n]
        print(f"stalest {len(names)}: {' '.join(names)}", flush=True)
    spark = get_spark("oracle-harness", cores=16, shuffle_partitions=16)
    con = duck_connection(sf_dir)
    failed, costs = [], {}
    for n in names:
        t0 = time.perf_counter()
        try:
            ok, msg = compare_query(spark, con, n, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"ERROR {type(e).__name__}: {str(e)[:300]}"
        costs[n] = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} {n} [{costs[n]:.2f}s "
              f"cum={sum(costs.values()):.1f}s]: {msg}", flush=True)
        if not ok:
            failed.append(n)
    print(f"\n{len(names) - len(failed)}/{len(names)} pass "
          f"in {sum(costs.values()):.1f}s")
    # Paste-ready refresh for registry._MEASURED_COST_S (sorted cheapest
    # first); written only on a full-registry run.
    if len(names) == len(Q.specs()):
        with open("/tmp/measured_costs.py", "w") as f:
            f.write("_MEASURED_COST_S = {\n")
            for n, c in sorted(costs.items(), key=lambda kv: kv[1]):
                f.write(f'    "{n}": {c:.2f},\n')
            f.write("}\n")
        print("cost table -> /tmp/measured_costs.py")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
