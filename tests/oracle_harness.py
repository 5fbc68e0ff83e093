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

#: ALLOWLIST of DuckDB type ids whose pandas/arrow serialization is
#: proven to match the Spark-side type under the driver's TYPE-SENSITIVE
#: value hash (r9: events_kaplan_meier's uncasted window sum came back
#: HUGEINT/int128 vs Spark's int64 — rows/schema matched, hash failed).
#: Calibrated from the full registry: every id below appears in the
#: output of at least one driver-GREEN oracle (uinteger comes from
#: DuckDB's regr_count, green since r8), plus the container ids whose
#: CHILDREN are recursed. Everything else — hugeint/uhugeint/decimal
#: (the observed failure class), but also ubigint (uint64 vs int64),
#: float (float32 vs double), time/interval/blob/enum — is flagged
#: until an oracle proves it green; extending this set is a conscious
#: decision, not a default (an r10-review lesson: the blacklist form
#: silently admitted every type nobody had thought about).
#: DATE and TIMESTAMP are DELIBERATELY absent: every registered oracle
#: projects time as epoch-millis BIGINT (the registry convention — raw
#: temporal columns differ in unit/tz representation between engines),
#: so no driver-green row has ever proven their hash behavior. An
#: oracle that wants a raw DATE/TIMESTAMP output column must first
#: prove the pair green through a driver round, then add the id here.
_SAFE_DUCK_TYPE_IDS = frozenset({
    "bigint", "integer", "smallint", "tinyint", "uinteger",
    "double", "varchar", "boolean",
    "list", "struct", "map", "array",
})


def banned_oracle_types(con, oracle_sql: str) -> list[str]:
    """Return ``col:TYPE`` for every oracle output column containing a
    type id outside the proven-safe allowlist (empty list == safe).
    Planning only — the query is not executed. Container types recurse
    into their CHILD types, so a HUGEINT nested inside a STRUCT or LIST
    is caught (a type-string prefix check passed ``STRUCT(cnt
    HUGEINT)`` — the exact class the lint exists for), while struct
    FIELD NAMES are never inspected (a field named ``decimal_x`` is
    legal)."""
    from duckdb.typing import DuckDBPyType

    def unsafe(t) -> bool:
        if str(t.id) not in _SAFE_DUCK_TYPE_IDS:
            return True
        try:
            kids = t.children
        except Exception:  # primitive types have no children
            kids = []
        return any(unsafe(c) for _, c in kids
                   if isinstance(c, DuckDBPyType))

    rel = con.sql(oracle_sql)
    return [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
            if unsafe(t)]


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


def compare_df_vs_sql(sdf, oracle_sql: str, sf_dir: str) -> int:
    """Shared (Spark DataFrame, DuckDB SQL) parity assertion for the
    banked-spec and registered-pair pytest files — ONE definition of the
    canonicalized compare + the output-type lint, so a canonicalization
    or lint fix can never again land in some copies and not others (the
    r10 review found four drifting copies). Returns the row count."""
    con = duck_connection(sf_dir)
    assert banned_oracle_types(con, oracle_sql) == []
    srows = [tuple(r) for r in sdf.collect()]
    drows = con.execute(oracle_sql).fetchall()
    dcols = [d[0] for d in con.description]
    assert sorted(sdf.columns) == sorted(dcols), (sdf.columns, dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    a, b = _canon(srows, sdf.columns), _canon(drows, dcols)
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, mism[:3]
    return len(a)


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
