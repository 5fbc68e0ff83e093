"""Pytest-level parity for the two queries registered in round 10
(docs/BACKLOG.md: ecdf_drift and conversion_latency, banked in round 9
with pre-proven specs): each test runs the REGISTERED builder on Spark
AND the REGISTERED oracle SQL on DuckDB over the same fixture parquet,
comparing with the harness's canonicalization — the same pairs the
driver hash-grades (pre-registration these were the proof the specs
were copy-paste-ready; post-registration they pin the registered pair
against drift). Semantic tests beyond parity ride along.
"""

import pytest

from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.plans import queries as Q

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _spec(name):
    return next(s for s in Q.specs() if s.name == name)


def _compare_registered(spark, name, sf=SF):
    spec = _spec(name)
    return compare_df_vs_sql(spec.builder(spark, sf), spec.oracle, sf)


def test_ecdf_drift_registered_pair(spark):
    n = _compare_registered(spark, "events_ecdf_drift")
    assert 2 <= n <= 20


def test_conversion_latency_registered_pair(spark):
    n = _compare_registered(spark, "events_conversion_latency")
    assert n == 1


def test_ecdf_drift_detects_planted_shift(spark):
    """Semantic check beyond parity: a deliberate location shift between
    halves produces a large ks_stat; identical halves produce ~0."""
    import numpy as np

    rng = np.random.RandomState(5)
    n = 400
    shifted = np.where(np.arange(n) < n // 2,
                       rng.normal(50, 10, n), rng.normal(75, 10, n))
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(shifted)], ["ts", "v"])
    ks = relational.ecdf_drift(df, "v", "ts", bins=10).collect()[0]["ks_stat"]
    assert ks > 0.5

    same = rng.normal(50, 10, n)
    df2 = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(same)], ["ts", "v"])
    ks2 = relational.ecdf_drift(df2, "v", "ts", bins=10).collect()[0]["ks_stat"]
    assert ks2 < 0.2

    with pytest.raises(ValueError, match="bins must be >= 2"):
        relational.ecdf_drift(df, "v", "ts", bins=1)
    frac = df.withColumn("ts", df["ts"].cast("double"))
    with pytest.raises(TypeError, match="integer epoch-units"):
        relational.ecdf_drift(frac, "v", "ts")


def test_conversion_latency_manual_fixture(spark):
    """Hand-computable micro-fixture: two attributed conversions with
    known lags (10 s, 30 s), one unattributed (touch outside horizon)."""
    rows = [
        (1, 1, 1_000_000, "click"), (2, 1, 1_010_000, "purchase"),
        (3, 2, 2_000_000, "view"), (4, 2, 2_030_000, "purchase"),
        (5, 3, 100_000, "click"), (6, 3, 100_000 + 3_600_001, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_ms", "event_type"])
    r = relational.conversion_latency(
        df, "purchase", ["view", "click"], horizon=3_600_000).collect()[0]
    assert r["n_conversions"] == 3 and r["n_attributed"] == 2
    assert r["p50_ms"] == pytest.approx(20_000.0)
    assert r["mean_latency_ms"] == pytest.approx(20_000.0)
    assert r["p25_ms"] == pytest.approx(15_000.0)
    assert r["p90_ms"] == pytest.approx(28_000.0)
