"""Pytest-level parity for the two queries registered in round 15
(docs/BACKLOG.md: the round-14 bank — Cox PH score test of activity,
Conover tie-corrected Friedman blocked k-sample test over day-of-week
blocks): each test runs the REGISTERED builder on Spark AND the
REGISTERED oracle SQL on DuckDB over the same fixture parquet,
comparing with the harness's canonicalization — the same pairs the
driver hash-grades. Pre-registration these tests held the candidate
SQL as module constants (the banking proof); post-registration they
re-point at the registered pairs so the graded surface cannot drift
from the pytest pin (the r8->r14 pattern).

Both registered oracles also ride the registry-wide output-type lint
(tests/test_oracle_types.py) via compare_df_vs_sql's per-call assert.

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction and preserved by registration):

- cox_score_test keeps EVERY accumulation integer-exact or ordered:
  the covariate contract is INTEGRAL (null/fractional x raises
  in-plan — a null x would silently vanish from the risk-set moments
  S1/S2 while the subject stays in S0, the r13 logrank-observed bug
  class closed from birth), so S0/S1/S2 are integer window sums; u/v
  accumulate as ORDERED cumulative double sums ascending by duration
  (the nelson/logrank precedent); the per-row algebra interleaves
  multiplications with divisions with identical operand order in both
  engines, and S1/S0, S2/S0 go double on the first step. The oracle
  CASTs every windowed BIGINT sum (the r9 kaplan HUGEINT hash lesson).
- The covariate is the user's EVENT COUNT (activity level) — an
  integer derived identically on both engines (count(*) per user), so
  no float ever enters the risk sums; binning/scaling guidance for
  truly continuous covariates lives in the operator docstring.
- friedman_test is FULLY integer-exact (one step beyond kruskal): with
  2 * midrank = 2 cum_le - t + 1 (RANGE-frame counts, no engine
  rank()), BOTH folds are integers — numerator sum((2R_j - b(k+1))^2)
  and denominator sum((2r)^2) - b k (k+1)^2 — so no float accumulates
  anywhere and no ordered-fold discipline is even needed; the single
  double division happens at the end.
- The Friedman block is DAY-OF-WEEK derived as (ts_ms // 86400000
  + 4) % 7 on BOTH engines — integer epoch-day arithmetic, NOT the
  engines' dayofweek() functions (Spark's is 1-7 Sunday-first,
  DuckDB's 0-6 Sunday-first: a guaranteed cross-engine mismatch).
  Cell values are per-(dow, event_type) COUNTS — integers, so the
  within-block tie structure is identical on both engines (ranking
  float aggregates would risk last-bit tie divergence).
- DuckDB output-type lint: rank_sum divides CAST(r2 AS DOUBLE) / 2.0
  (a bare `r2 / 2.0` parses as DECIMAL — off-allowlist).
- The pre-bank adversarial review caught a real nested-window bug in
  the Friedman num/den folds (Spark forbids window results nesting
  inside another window function); b/k/complete now materialize in a
  staging select first — preserved by the plan audit in
  tests/test_plans.py.
"""

import pytest

from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.plans import queries as Q
from data_pipeline_eng_project_1_spark.sources import catalog
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _spec(name):
    return next(s for s in Q.specs() if s.name == name)


def _compare_registered(spark, name, sf=SF):
    spec = _spec(name)
    return compare_df_vs_sql(spec.builder(spark, sf), spec.oracle, sf)


def test_cox_registered_pair(spark):
    n = _compare_registered(spark, "events_cox_activity")
    assert n >= 10  # one row per distinct duration


def test_cox_trace_invariants(spark):
    spec = _spec("events_cox_activity")
    rows = sorted(spec.builder(spark, SF).collect(),
                  key=lambda r: r["duration_h"])
    # risk sets nonincreasing; information accumulates monotonically
    nr = [r["n_risk"] for r in rows]
    assert all(b <= a for a, b in zip(nr, nr[1:]))
    vs = [r["info_cum"] for r in rows]
    assert all(b >= a for a, b in zip(vs, vs[1:]))
    # unlike the md5-split tests this covariate is REAL data, so the
    # z magnitude/sign are fixture-dependent (measured +0.26 at
    # sf0.001, -3.36 at sf0.01) — pin only that the verdict is
    # defined; the structural invariants above are the contract
    assert rows[-1]["z_stat"] is not None


def test_friedman_registered_pair(spark):
    n = _compare_registered(spark, "events_friedman_dow")
    assert n >= 3  # one row per event_type


def test_friedman_fixture_grid_and_rank_partition(spark):
    spec = _spec("events_friedman_dow")
    rows = spec.builder(spark, SF).collect()
    # the fixture grid is complete: 7 dow blocks x k event types
    assert all(r["b_blocks"] == 7 for r in rows)
    k = rows[0]["k_treatments"]
    assert k == len(rows) and all(r["dof"] == k - 1 for r in rows)
    assert all(r["t1_stat"] is not None for r in rows)
    # rank sums partition the total b*k(k+1)/2
    assert sum(r["rank_sum"] for r in rows) == 7 * k * (k + 1) / 2.0


def test_cox_on_ab9_arm_equals_registered_logrank_query(spark):
    """Fixture-level stack coherence: cox_score_test with the ab9 arm
    as a binary covariate must reproduce the REGISTERED
    events_logrank_ab trace row for row (score_cum = o_minus_e,
    info_cum = var_cum, z = z) — the score test IS the log-rank test,
    pinned on the very frame the driver grades."""
    from data_pipeline_eng_project_1_spark.plans.queries import _ab9_variant

    ev = catalog.load_table(spark, "events", SF)
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
          .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
          .alias("observed"))
    cox = {r["duration_h"]: r for r in relational.cox_score_test(
        per_user.select("duration_h", "observed",
                        _ab9_variant().cast("int").alias("grp")),
        duration="duration_h", observed="observed",
        covariate="grp").collect()}
    lr = {r["duration_h"]: r
          for r in _spec("events_logrank_ab").builder(spark, SF).collect()}
    assert set(cox) == set(lr) and len(cox) >= 10
    for t in cox:
        assert cox[t]["n_risk"] == lr[t]["n_risk0"] + lr[t]["n_risk1"]
        assert cox[t]["score_cum"] == pytest.approx(
            lr[t]["o_minus_e"], abs=1e-5)
        assert cox[t]["info_cum"] == pytest.approx(
            lr[t]["var_cum"], abs=1e-5)
        if lr[t]["z_stat"] is not None:
            assert cox[t]["z_stat"] == pytest.approx(
                lr[t]["z_stat"], abs=1e-3)
