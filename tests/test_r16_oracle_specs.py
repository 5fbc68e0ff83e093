"""Pytest-level parity for the two queries registered in round 16
(docs/BACKLOG.md: the round-15 bank — stratified log-rank over the
dominant-event-type strata, Page's trend test over ordered six-hour
bands): each test runs the REGISTERED builder on Spark AND the
REGISTERED oracle SQL on DuckDB over the same fixture parquet,
comparing with the harness's canonicalization — the same pairs the
driver hash-grades. Pre-registration these tests held the candidate
SQL as module constants (the banking proof, parametrized over sf0.001
AND sf0.01); post-registration they re-point at the registered pairs
so the graded surface cannot drift from the pytest pin (the r8->r15
pattern).

Both registered oracles also ride the registry-wide output-type lint
(tests/test_oracle_types.py) via compare_df_vs_sql's per-call assert.

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction and preserved by registration):

- stratified_logrank inherits logrank_test's discipline unchanged:
  integer risk-set window sums per (stratum, duration); e1/v algebra
  interleaving multiplications with divisions in identical operand
  order; the CROSS-strata O-E/V fold is ONE ordered cumulative double
  sum ascending by (stratum, duration) — one deterministic addition
  order on both engines; oracles CAST every windowed BIGINT sum (the
  r9 kaplan HUGEINT hash lesson). Strata are lowercase-ASCII event
  types, so Spark and DuckDB agree on the fold's string order (both
  byte-order ASCII; no collation divergence surface).
- The stratum is the user's DOMINANT event_type (argmax count with
  MIN-NAME tiebreak — deterministic and engine-agnostic: the max
  count and the min name are both order-free aggregates; no engine
  rank()/argmax builtin whose tie rules could differ). Both engines
  derive it by the same window-max + filter + min-name construction.
- The user-keyed equi-join attaching the stratum to the survival
  frame joins two user-keyed aggregates (co-partitioned after one
  exchange) — the OPERATOR itself stays join-free; the join is
  fixture derivation, same as every star-schema builder.
- page_trend_test is FULLY integer-exact (the friedman discipline):
  2 * midrank = 2 cum_le - t + 1 from RANGE-frame counts; the fold
  keeps 2L = sum_j j * (2 R_j) and centers as 4(L - E[L]) =
  2*(2L) - b k (k+1)^2 — all integers (k(k+1)^2 is even); the single
  double division is the final z. The j ordinal is a RANGE-frame
  count of treatments at-or-below (distinct after the grid dedup, so
  the count IS the position — no engine rank()).
- Page treatments MUST carry a real order: hour-of-day BANDS
  (ts_ms // 3600000) % 24 // 6, ordered 0..3 — integer epoch-hour
  arithmetic identical on both engines (same reasoning as the
  friedman dow blocks: never the engines' hour()/dayofweek()
  builtins). Blocks are the friedman dow (epoch-day + 4) % 7.
- Cell values are per-(dow, band) COUNTS — integers, so within-block
  tie structure is cross-engine identical.
- DuckDB output-type lint: rank_sum / l_stat divide
  CAST(x AS DOUBLE) / 2.0 (bare `x / 2.0` parses as DECIMAL —
  off-allowlist); every windowed BIGINT sum is CAST.
"""

import pytest

from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.plans import queries as Q
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _spec(name):
    return next(s for s in Q.specs() if s.name == name)


def _compare_registered(spark, name, sf):
    spec = _spec(name)
    return spec, compare_df_vs_sql(spec.builder(spark, sf), spec.oracle,
                                   sf)


@pytest.mark.parametrize("sf", SFS)
def test_stratified_logrank_registered_pair(spark, sf):
    spec, n = _compare_registered(spark, "events_logrank_strat", sf)
    # one row per (stratum, distinct duration): 14 at sf0.001 (few
    # durations survive the per-stratum split), 115 at sf0.01
    assert n >= (10 if sf.endswith("0.001") else 20)
    rows = sorted(spec.builder(spark, sf).collect(),
                  key=lambda r: (r["strat"], r["duration_h"]))
    # within each stratum, risk sets are nonincreasing; across the
    # whole fold, variance accumulates monotonically
    for s in {r["strat"] for r in rows}:
        nr = [r["n_risk0"] + r["n_risk1"] for r in rows
              if r["strat"] == s]
        assert all(b <= a for a, b in zip(nr, nr[1:]))
    vs = [r["var_cum"] for r in rows]
    assert all(b >= a for a, b in zip(vs, vs[1:]))
    assert rows[-1]["z_stat"] is not None


@pytest.mark.parametrize("sf", SFS)
def test_page_registered_pair(spark, sf):
    spec, n = _compare_registered(spark, "events_page_hourband", sf)
    assert n == 4  # the four six-hour bands
    rows = sorted(spec.builder(spark, sf).collect(),
                  key=lambda r: r["band"])
    assert [r["j_index"] for r in rows] == [1, 2, 3, 4]
    assert all(r["b_blocks"] == 7 and r["k_treatments"] == 4
               for r in rows)
    # rank sums partition the total b*k(k+1)/2
    assert sum(r["rank_sum"] for r in rows) == 7 * 4 * 5 / 2.0
    assert rows[0]["z_stat"] is not None


def test_strat_logrank_single_stratum_equals_registered_logrank(spark):
    """Fixture-level stack coherence: collapsing every user into ONE
    stratum must reproduce the REGISTERED events_logrank_ab trace row
    for row — stratification with a constant confounder is a no-op,
    pinned on the very frame the driver grades."""
    from data_pipeline_eng_project_1_spark.plans.queries import (
        _ab9_variant,
    )
    from data_pipeline_eng_project_1_spark.sources import catalog

    sf = SFS[0]
    ev = catalog.load_table(spark, "events", sf)
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    frame = per_user.select(
        F.lit("all").alias("strat"), "duration_h", "observed",
        _ab9_variant().cast("int").alias("grp"))
    mine = {r["duration_h"]: r for r in relational.stratified_logrank(
        frame, duration="duration_h", observed="observed", grp="grp",
        stratum="strat").collect()}
    lr = {r["duration_h"]: r
          for r in _spec("events_logrank_ab").builder(spark, sf)
          .collect()}
    assert set(mine) == set(lr) and len(mine) >= 10
    for t in mine:
        for c in ("n_risk0", "n_risk1", "n_event0", "n_event1",
                  "expected1", "o_minus_e", "var_cum", "z_stat",
                  "significant_05"):
            assert mine[t][c] == lr[t][c], (t, c)
