"""The reference ETL pipeline (flashscore match dumps → 4 tables), Spark-first.

Reference shape (dags/utils.py:350-365): per file, three pandas transforms +
four per-row-INSERT loads + an archive move, with parent/child rows linked by
re-SELECTing the last inserted id (a race guarded by time.sleep(2)/row,
dags/utils.py:213-217) and positional zip (dags/utils.py:300,339).

This plan instead:

- reads ALL files in one partition-parallel scan (no per-file loop),
- mints ``ID_MATCH`` deterministically in-engine — sha256 over the natural
  key — so every fan-out table derives the same id with no read-back, no
  sleep, and idempotent re-runs (re-loading a file yields the same ids),
- computes the three transforms as one shared lazy subtree that Catalyst
  prunes per output table,
- bulk-writes each table (vs the reference's ≤0.5 rows/s ceiling).

At 100 TB: the only wide operation here is the final write; everything else
is narrow (filter/project on the scan), so the plan scales with input
partitions. The shared base is cheap to recompute per sink (a scan+project),
so no cache() is needed; with a nondeterministic uuid() id it WOULD be
(SURVEY.md §3.1) — deterministic ids remove that hazard entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.operators import nested
from data_pipeline_eng_project_1_spark.sources.json_source import read_matches

#: MATCH_FINISHED column order (INSERT at dags/utils.py:194-208).
MATCH_COLUMNS = [
    "ID_MATCH", "DATE_LOAD",
    "YEAR_MATCH", "MONTH_MATCH", "DAY_MATCH", "HOUR_MATCH", "MINUTE_MATCH",
    "COUNTRY_MATCH", "TOURNAMENT",
    "NAME_TEAM_HOME", "SCORE_TEAM_HOME",
    "NAME_TEAM_AWAY", "SCORE_TEAM_AWAY",
]

_KEEP = [
    "current_country", "current_tournament",
    "participant_home", "participant_away",
    "participant_home_current_score", "participant_away_current_score",
    "year", "month", "day", "hour", "minute",
]

_RENAME = {
    "year": "YEAR_MATCH", "month": "MONTH_MATCH", "day": "DAY_MATCH",
    "hour": "HOUR_MATCH", "minute": "MINUTE_MATCH",
    "current_country": "COUNTRY_MATCH", "current_tournament": "TOURNAMENT",
    "participant_home": "NAME_TEAM_HOME",
    "participant_home_current_score": "SCORE_TEAM_HOME",
    "participant_away": "NAME_TEAM_AWAY",
    "participant_away_current_score": "SCORE_TEAM_AWAY",
}


#: Deterministic ID_MATCH: sha256 over the natural key (SQL text — every
#: transform builds its projection as ONE selectExpr; see the nested.py
#: module docstring for the r17 py4j-round-trip rationale).
#:
#: Replaces the per-row uuid4 (dags/utils.py:107) + post-insert read-back
#: (dags/utils.py:215-217). Deterministic ⇒ all four sinks agree without
#: caching, and reprocessing a file is idempotent.
MATCH_ID_SQL = (
    "sha2(concat_ws('|', current_country, current_tournament, "
    "participant_home, participant_away, "
    "year, month, day, hour, minute), 256)"
)


def match_id() -> F.Column:
    """Column form of MATCH_ID_SQL (kept for callers/tests)."""
    return F.expr(MATCH_ID_SQL)


def finished(df: DataFrame) -> DataFrame:
    """Status predicate shared by all three transforms
    (dags/utils.py:83,152,176)."""
    return df.where("current_status = 'Finished'")


def transform_matches(df: DataFrame) -> DataFrame:
    """filter → project 11 cols → na.drop → try_cast scores → id + audit ts →
    reorder+rename (transform_pandas, dags/utils.py:77-144).

    Order preserved from the reference: dropna runs BEFORE the cast, so a
    non-numeric score survives as a null SCORE_* cell (pandas errors='coerce'
    ≙ try_cast). na.drop("any") over the 11 projected columns is spelled as
    one conjunctive IS NOT NULL filter — same rows.
    """
    not_null = " AND ".join(f"{c} IS NOT NULL" for c in _KEEP)
    inv = {v: k for k, v in _RENAME.items()}
    exprs = []
    for out in MATCH_COLUMNS:
        if out == "ID_MATCH":
            exprs.append(f"{MATCH_ID_SQL} AS ID_MATCH")
        elif out == "DATE_LOAD":
            exprs.append("current_timestamp() AS DATE_LOAD")
        elif out in ("SCORE_TEAM_HOME", "SCORE_TEAM_AWAY"):
            exprs.append(f"try_cast({inv[out]} AS INT) AS {out}")
        else:
            exprs.append(f"{inv[out]} AS {out}")
    return finished(df).where(not_null).selectExpr(*exprs)


def transform_lineups(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """HOME/AWAY starting-lineup tables: ID_MATCH + NAME_PLAYER_1..11.

    transform_home_starting_lineup (dags/utils.py:146-167) + the skip-if-
    incomplete rule applied at load (dags/utils.py:341-342). The reference
    links rows to matches by zip position — which silently misaligns when
    na.drop removed match rows; here the shared deterministic ID_MATCH makes
    the link correct by construction.
    """
    base = finished(df).selectExpr(
        f"{MATCH_ID_SQL} AS ID_MATCH",
        f"{nested.pad_or_null_sql(nested.team_names_sql('lineups_data', 'Team1'))} AS home",
        f"{nested.pad_or_null_sql(nested.team_names_sql('lineups_data', 'Team2'))} AS away",
    )
    home = (
        base.where("home IS NOT NULL")
        .selectExpr("ID_MATCH", *nested.array_to_columns_sql("home", "NAME_PLAYER"))
    )
    away = (
        base.where("away IS NOT NULL")
        .selectExpr("ID_MATCH", *nested.array_to_columns_sql("away", "NAME_PLAYER"))
    )
    return home, away


def transform_odds(df: DataFrame) -> DataFrame:
    """ODDS table: ID_MATCH + 8 bookmakers × {HOME,NIL,AWAY} = 25 columns
    (transform_odds dags/utils.py:169-182 + process_row_odd :237-250 +
    INSERT :263-287)."""
    triples, widened = nested.widen_odds_sql("bookmakers_data")
    probed = finished(df).selectExpr(f"{MATCH_ID_SQL} AS ID_MATCH", *triples)
    return probed.selectExpr("ID_MATCH", *widened)


def transform_all(df: DataFrame) -> dict[str, DataFrame]:
    """The full fan-out from one source scan."""
    home, away = transform_lineups(df)
    return {
        "MATCH_FINISHED": transform_matches(df),
        "HOME_STARTING_LINEUP": home,
        "AWAY_STARTING_LINEUP": away,
        "ODDS": transform_odds(df),
    }


def run_pipeline(spark: SparkSession, json_paths: str | list[str],
                 out_dir: str, mode: str = "append",
                 source_format: str = "json") -> dict[str, DataFrame]:
    """ETL_pipeline (dags/utils.py:350-365), batch form: one scan, four bulk
    parquet sinks. Returns the table DataFrames (lazy) for inspection.
    ``source_format="xml"`` reads the same dumps published as XML
    (sources/xml_source.py) through the identical downstream plan."""
    return run_pipeline_observed(spark, json_paths, out_dir, mode,
                                 source_format)[0]


def run_pipeline_observed(
    spark: SparkSession, json_paths: str | list[str], out_dir: str,
    mode: str = "append", source_format: str = "json",
) -> tuple[dict[str, DataFrame], dict[str, dict]]:
    """run_pipeline + per-table load metrics via ``df.observe``.

    Observations ride the write job itself (metrics are accumulated by the
    tasks that write), so the audit costs ZERO extra actions — unlike a
    count() per table, which would re-run each transform. This replaces the
    reference's only load visibility: Airflow task logs of per-row INSERTs.
    Metrics per table: row count, distinct-ish id presence (non-null count).
    """
    from pyspark.sql import Observation

    if source_format == "json":
        src = read_matches(spark, json_paths)
    elif source_format == "xml":
        from data_pipeline_eng_project_1_spark.sources.xml_source import (
            read_matches_xml,
        )

        src = read_matches_xml(spark, json_paths)
    else:
        raise ValueError(f"run_pipeline: unknown source_format"
                         f" {source_format!r}")
    tables = transform_all(src)
    metrics: dict[str, dict] = {}
    observed: dict[str, DataFrame] = {}
    for name, tdf in tables.items():
        obs = Observation(f"load_{name}")
        wrapped = tdf.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.count("ID_MATCH").alias("n_with_id"),
        )
        wrapped.write.mode(mode).parquet(f"{out_dir}/{name}")
        metrics[name] = obs.get
        observed[name] = tdf
    return observed, metrics
