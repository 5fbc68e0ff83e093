"""Dump .explain("formatted") for registry queries to plans/<round>/<name>_<tag>.txt.

Usage:  python scripts/plan_dump.py <tag> [query ...]
        (no query names -> every registered query)

The optimization rounds commit before/after plan files under
plans/<round>/ where <round> comes from $SPARK_GRAFT_PLAN_ROUND
(default "r17" — r16 hardcoded it, ADVICE r16). Plans are captured at
the bench scale factor ($SPARK_GRAFT_SF_DIR, default sf0.1) so
PushedFilters/row estimates match what the bench executes.

Materialized queries (llm_ops._ckpt sites) are dumped with
llm_ops.MATERIALIZE=False so the FULL lineage is visible instead of a
Scan ExistingRDD boundary — and so the dump doesn't execute the heavy
upstream jobs just to print a plan (under AQE even a lazy
localCheckpoint runs its upstream stages at DataFrame build time). Set
$SPARK_GRAFT_PLAN_MATERIALIZE=1 to dump the production (checkpointed)
shape instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_eng_project_1_spark.plans import llm_ops
from data_pipeline_eng_project_1_spark.plans import queries as Q
from data_pipeline_eng_project_1_spark.session import default_parallelism, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUND = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17")
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", ROUND)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: plan_dump.py <tag: before|after> [query ...]")
    tag = sys.argv[1]
    names = sys.argv[2:]
    specs = Q.specs()
    if names:
        known = {s.name for s in specs}
        unknown = set(names) - known
        if unknown:
            sys.exit(f"plan_dump: unknown query name(s) {sorted(unknown)}")
        specs = [s for s in specs if s.name in names]
    os.makedirs(OUT_ROOT, exist_ok=True)
    n = default_parallelism()
    spark = get_spark("plan-dump", cores=n, shuffle_partitions=n)
    llm_ops.MATERIALIZE = (
        os.environ.get("SPARK_GRAFT_PLAN_MATERIALIZE", "0") == "1")
    for s in specs:
        df = s.builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_ROOT, f"{s.name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
