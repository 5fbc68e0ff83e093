"""Pre-proven oracle specs for the operators BANKED for round 10
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the harness's
canonicalization — the same r8->r9 banking pattern, so round 10 can
register the pairs copy-paste with the parity already machine-checked.

NOT registered yet by design: round 9 pushed the stale-spill guard to
28/30; these wait for round 10's walk capacity.
"""

import math

import duckdb
import pytest

from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.sources import catalog

SF = "/root/testdata/sf0.001"


def _duck(sf=SF):
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def _compare(spark, sdf, oracle_sql, sf=SF):
    srows = [tuple(r) for r in sdf.collect()]
    con = _duck(sf)
    drows = con.execute(oracle_sql).fetchall()
    dcols = [d[0] for d in con.description]
    assert sorted(sdf.columns) == sorted(dcols), (sdf.columns, dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    a, b = _canon(srows, sdf.columns), _canon(drows, dcols)
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, mism[:3]
    return len(a)


#: Candidate oracle for `events_ecdf_drift` (relational.ecdf_drift over
#: events.value, bins=20) — the psi_drift CTE shape plus cumulative-share
#: and max-gap windows.
ECDF_DRIFT_SQL = """
WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value
           FROM events),
m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM e),
b AS (SELECT list_distinct(quantile_cont(value,
        [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5,
         0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95])) AS bs
      FROM e, m WHERE ts_ms < mid),
a AS (SELECT 1 + len(list_filter(b.bs, x -> x < value)) AS bucket,
             CASE WHEN ts_ms < mid THEN 1 ELSE 0 END AS isb
      FROM e, m, b),
g AS (SELECT bucket, sum(isb) AS n_base, sum(1 - isb) AS n_curr
      FROM a GROUP BY bucket),
s AS (SELECT bucket, n_base, n_curr,
             (sum(n_base) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * 1.0 / (sum(n_base) OVER ()) AS fb,
             (sum(n_curr) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * 1.0 / (sum(n_curr) OVER ()) AS fc
      FROM g),
s2 AS (SELECT *, abs(fb - fc) AS gap FROM s)
SELECT CAST(dense_rank() OVER (ORDER BY bucket) AS INTEGER) AS bucket,
       CAST(n_base AS BIGINT) AS n_base,
       CAST(n_curr AS BIGINT) AS n_curr,
       round(fb, 6) AS f_base,
       round(fc, 6) AS f_curr,
       round(gap, 6) AS gap,
       round(max(gap) OVER (), 6) AS ks_stat
FROM s2
"""

#: Candidate oracle for `events_conversion_latency`
#: (relational.conversion_latency, purchase <- view/click, 1 h horizon) —
#: the graded last-touch QUALIFY oracle + one quantile/mean aggregate.
CONVERSION_LATENCY_SQL = """
WITH e AS (SELECT event_id, user_id, event_type,
                  epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
           FROM events),
conv AS (SELECT user_id, ts_ms, event_id FROM e
         WHERE event_type = 'purchase'),
t AS (SELECT user_id, ts_ms, event_id FROM e
      WHERE event_type IN ('view', 'click')),
att AS (
  SELECT c.event_id, c.ts_ms - t.ts_ms AS lag_ms
  FROM conv c LEFT JOIN t
    ON t.user_id = c.user_id
   AND t.ts_ms <= c.ts_ms AND t.ts_ms >= c.ts_ms - 3600000
  QUALIFY row_number() OVER (
      PARTITION BY c.event_id
      ORDER BY t.ts_ms DESC NULLS LAST, t.event_id DESC NULLS LAST) = 1)
SELECT count(*) AS n_conversions,
       count(lag_ms) AS n_attributed,
       round(quantile_cont(lag_ms, 0.25), 4) AS p25_ms,
       round(quantile_cont(lag_ms, 0.50), 4) AS p50_ms,
       round(quantile_cont(lag_ms, 0.75), 4) AS p75_ms,
       round(quantile_cont(lag_ms, 0.90), 4) AS p90_ms,
       round(avg(lag_ms), 4) AS mean_latency_ms
FROM att
"""


def test_ecdf_drift_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.ecdf_drift(
        ev.select("ts_ms", "value"), "value", "ts_ms", bins=20)
    n = _compare(spark, sdf, ECDF_DRIFT_SQL)
    assert 2 <= n <= 20


def test_conversion_latency_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.conversion_latency(
        ev.select("event_id", "user_id", "ts_ms", "event_type"),
        conversion_type="purchase", touch_types=["view", "click"],
        horizon=3_600_000)
    n = _compare(spark, sdf, CONVERSION_LATENCY_SQL)
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
