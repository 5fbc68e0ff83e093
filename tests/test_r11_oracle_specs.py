"""Pytest-level parity for the seven queries registered in round 11
(docs/BACKLOG.md: the round-10 bank — seasonal_outliers, kfold audit,
calibration bins, hourly ACF, per-nation Gini, Wilson pass-rate gate,
session top paths): each test runs the REGISTERED builder on Spark AND
the REGISTERED oracle SQL on DuckDB over the same fixture parquet,
comparing with the harness's canonicalization — the same pairs the
driver hash-grades. Pre-registration these tests held the candidate
SQL as module constants (the banking proof); post-registration they
re-point at the registered pairs so the graded surface cannot drift
from the pytest pin (the r8->r9->r10 pattern).

All seven registered oracles also ride the registry-wide output-type
lint (tests/test_oracle_types.py) via compare_df_vs_sql's per-call
assert, so the r9 kaplan HUGEINT class can't creep in through an edit.
"""

from data_pipeline_eng_project_1_spark.plans import queries as Q

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _spec(name):
    return next(s for s in Q.specs() if s.name == name)


def _compare_registered(spark, name, sf=SF):
    spec = _spec(name)
    return compare_df_vs_sql(spec.builder(spark, sf), spec.oracle, sf)


def test_seasonal_outliers_registered_pair(spark):
    n = _compare_registered(spark, "events_seasonal_outliers")
    assert n >= 5  # 14 at sf0.001 — heavy-tailed value column


def test_kfold_audit_registered_pair(spark):
    n = _compare_registered(spark, "orders_kfold_audit")
    assert n == 25  # 5 folds x 5 priorities


def test_calibration_registered_pair(spark):
    n = _compare_registered(spark, "docs_quality_calibration")
    assert 2 <= n <= 10


def test_acf_hourly_registered_pair(spark):
    n = _compare_registered(spark, "events_acf_hourly")
    assert n == 24


def test_nation_gini_registered_pair(spark):
    n = _compare_registered(spark, "nation_customer_gini")
    assert n == 25  # every nation has ordering customers at sf0.001


def test_wilson_quality_registered_pair(spark):
    n = _compare_registered(spark, "docs_wilson_quality")
    assert n == 20  # 20 sources in the fixture


def test_session_top_paths_registered_pair(spark):
    n = _compare_registered(spark, "events_session_top_paths")
    assert n == 20  # 5 event types -> plenty of distinct trigrams
