"""Query registry shared by all plan modules.

Each named query pairs a Spark DataFrame builder with the exact DuckDB SQL
oracle the driver hash-compares it against (oracle=None → rows-only check
for non-SQL-expressible ops). Conventions that keep the comparison
deterministic are documented in plans/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check (non-SQL op)
    doc: str = ""


_SPECS: list[QuerySpec] = []


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn
    return deco


def all_specs() -> list[QuerySpec]:
    return list(_SPECS)
