"""Fixture-table catalog.

Loads the driver-generated TPC-H-ish parquet tables (TESTDATA.md) with the
normalizations the rest of the engine relies on:

- ``events.ts`` arrives in one of two physical layouts depending on the
  fixture generation: parquet TIMESTAMP(NANOS) (which Spark's vectorized
  reader rejects — read as long nanos via
  ``spark.sql.legacy.parquet.nanosAsLong``) or plain TIMESTAMP(MICROS)
  (isAdjustedToUTC=false → TIMESTAMP_NTZ). The loader detects which it got
  and surfaces the SAME two columns either way:
    * ``ts``      TimestampType (microsecond, session-UTC — matches
                  DuckDB's CAST(ts AS TIMESTAMP) semantics), and
    * ``ts_ms``   epoch milliseconds as BIGINT (exact integer column for
                  oracle-parity bucketing — no float, no timezone).
- every other table is passed through untouched; filters/column pruning are
  left to Catalyst so parquet pushdown stays effective (check with
  ``df.explain``: PushedFilters + ReadSchema).

At 100 TB these readers are unchanged: parquet scans scale horizontally, and
nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_events(df: DataFrame) -> DataFrame:
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) fixture read via nanosAsLong: BIGINT nanos.
        # Integer DIV (never `/`): ns values exceed 2^53 and would lose
        # precision through a double. DIV truncates toward zero while the
        # micros branch's unix_millis floors — they'd diverge for pre-epoch
        # timestamps, so subtract the sign correction to make this branch
        # floor-consistent (a no-op for the post-1970 fixtures).
        ts = F.expr("timestamp_micros(CAST(ts DIV 1000"
                    " - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END) AS LONG))")
        ts_ms = F.expr("CAST(ts DIV 1000000"
                       " - (CASE WHEN ts % 1000000 < 0 THEN 1 ELSE 0 END) AS LONG)")
    else:
        # TIMESTAMP(MICROS) fixture: TIMESTAMP_NTZ (or LTZ). The NTZ→LTZ
        # cast reinterprets the wall clock in the session zone — UTC per
        # _RUNTIME_CONFS — so the instant is exact, as is unix_millis.
        ts = F.col("ts").cast("timestamp")
        ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return df.select(
        "event_id",
        ts.alias("ts"),
        ts_ms.cast("long").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one fixture table, applying per-table normalization."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view (for the SQL entry points)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
