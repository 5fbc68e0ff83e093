"""Bucketed tables: co-located, shuffle-free joins.

A normal equi-join of two large tables shuffles BOTH sides on the join key
every time the join runs. Bucketing moves that shuffle to write time, once:
`bucketBy(n, key)` hash-partitions rows into `n` files per partition keyed
by `key`, and records the layout in the catalog. Two tables bucketed on the
same key with the same bucket count then sort-merge join with NO exchange on
either side — at 100 TB this converts the recurring dominant cost of a
fact-to-fact join into a one-time write cost.

This is the Spark-native answer to the reference's positional-zip "join"
(dags/utils.py:300,339): relate tables by key, and organize storage so the
relation is cheap to traverse repeatedly.

Notes for real clusters:
- bucket count is fixed at write time; pick ~(largest table size / target
  partition size) and keep it a multiple of the other bucketed tables'.
- `sortBy` within buckets removes the sort from the merge join too.
- requires `saveAsTable` (the catalog carries the bucket spec; a bare
  parquet path loses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a bucketed catalog table (parquet storage)."""
    w = (df.write.format("parquet").mode(mode)
         .bucketBy(num_buckets, bucket_col))
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two same-key, same-count bucketed tables. With both layouts in
    the catalog, Catalyst plans a sort-merge join with zero Exchange nodes
    — verify with .explain(): no 'Exchange hashpartitioning' above either
    scan."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (test probe)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
