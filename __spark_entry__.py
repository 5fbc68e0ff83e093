"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_pipeline_eng_project_1_spark/``; this module
is a thin adapter over the query registry
(data_pipeline_eng_project_1_spark/plans/queries.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from data_pipeline_eng_project_1_spark.plans import queries as _registry
from data_pipeline_eng_project_1_spark.session import apply_runtime_confs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H Q3-shaped join+agg+top-k
    (plans/queries.py::join_topk_revenue)."""
    apply_runtime_confs(spark)
    return _registry.queries()["join_topk_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; non-SQL-expressible ops are omitted
    (driver falls back to a rows-only check)."""
    return _registry.oracle_sql()
