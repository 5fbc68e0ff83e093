"""Flashscore-shaped JSON source.

The reference downloads one GCS object at a time and lets pandas infer a
schema from it (reference: dags/utils.py:54-71,79-81). Here the schema is
declared once — inference on 100 TB of JSON means an extra full pass and
schema drift between files — and Spark reads any number of files in one
partition-parallel scan (replacing the reference's serial per-file loop at
dags/utils.py:350-365).

Schema follows the implicit input contract surveyed in SURVEY.md §1.1 /
FIXTURES.md §B (reference consumers: dags/utils.py:83-105,158-162,226-235).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PLAYER = T.StructType([T.StructField("name", T.StringType())])

MATCH_SCHEMA = T.StructType([
    T.StructField("current_status", T.StringType()),
    T.StructField("current_country", T.StringType()),
    T.StructField("current_tournament", T.StringType()),
    T.StructField("participant_home", T.StringType()),
    T.StructField("participant_away", T.StringType()),
    # Stringly-typed scores; cast-to-int-null-on-error downstream
    # (reference: dags/utils.py:104-105, errors='coerce').
    T.StructField("participant_home_current_score", T.StringType()),
    T.StructField("participant_away_current_score", T.StringType()),
    T.StructField("year", T.IntegerType()),
    T.StructField("month", T.IntegerType()),
    T.StructField("day", T.IntegerType()),
    T.StructField("hour", T.IntegerType()),
    T.StructField("minute", T.IntegerType()),
    T.StructField("match_hour", T.StringType()),  # dropped downstream
    T.StructField("lineups_data", T.StructType([
        T.StructField("Team1", T.ArrayType(PLAYER)),
        T.StructField("Team2", T.ArrayType(PLAYER)),
    ])),
    T.StructField("bookmakers_data", T.ArrayType(T.StructType([
        T.StructField("bookmaker", T.StringType()),
        T.StructField("odds", T.ArrayType(T.StringType())),
    ]))),
])


def read_matches(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read flashscore match-dump JSON (array-of-records per file).

    ``multiLine=True`` because each file is one JSON array (the reference
    parses whole files with json.loads, dags/utils.py:69-71). PERMISSIVE mode
    keeps dirty rows as nulls instead of failing the batch.
    """
    return (
        spark.read.schema(MATCH_SCHEMA)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .json(paths)
    )
