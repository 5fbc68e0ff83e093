"""Pytest-level parity for the two queries registered in round 14
(docs/BACKLOG.md: the round-13 bank — Kruskal-Wallis H by group,
log-rank test between the A/B arms): each test runs the REGISTERED
builder on Spark AND the REGISTERED oracle SQL on DuckDB over the same
fixture parquet, comparing with the harness's canonicalization — the
same pairs the driver hash-grades. Pre-registration these tests held
the candidate SQL as module constants (the banking proof);
post-registration they re-point at the registered pairs so the graded
surface cannot drift from the pytest pin (the r8->r13 pattern).

Both registered oracles also ride the registry-wide output-type lint
(tests/test_oracle_types.py) via compare_df_vs_sql's per-call assert.

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction and preserved by registration):

- kruskal_wallis extends mann_whitney_u's RANK-FUNCTION-FREE identity
  to k classes: 2*avg_rank = 2*cum_le - t + 1 where cum_le/t are
  RANGE-frame window sums of a (group, class, value) count aggregate —
  integer-exact on both engines, no engine rank(). The ONE
  cross-class double fold (sum of (r2x2/2)^2/n) runs as an ORDERED
  cumulative window sum ascending by class read off at the last class
  row, NOT an unordered aggregate whose float summation order the
  engines could disagree on (the srm-stream r11 lesson, applied from
  birth). The tie term is deduplicated onto the min class of each
  value's peers (min is not a rank function).
- logrank_test's statistic accumulates ONLY via integer window sums
  (risk sets) and ORDERED cumulative double sums ascending by duration
  (the nelson_aalen precedent); the per-row e1/v algebra interleaves
  multiplications with divisions (d * n1 / n * n0 / n * (n-d) / (n-1))
  so no integer product can overflow, written with identical operand
  order in both engines. Oracles CAST every windowed BIGINT sum (the
  r9 kaplan HUGEINT hash lesson).
- The two r13 ADVICE findings on logrank_test were fixed BEFORE
  registration (no re-needy slot burned): observed outside {0, 1}
  (incl. null) raises in-plan, and null durations raise in-plan
  (Spark windows sort NULLS FIRST vs the oracle's NULLS LAST —
  regression-pinned in tests/test_stats_ops.py).
- The binary split comes from the ONE factored `_ab9_variant` helper
  the registered experiment stack reads (the r13 dedup's whole point);
  the 3-way `_kw3_clazz` split lives beside it in plans/queries.py —
  neither spec test holds a private copy that could desynchronize.
"""

from data_pipeline_eng_project_1_spark.plans import queries as Q

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _spec(name):
    return next(s for s in Q.specs() if s.name == name)


def _compare_registered(spark, name, sf=SF):
    spec = _spec(name)
    return compare_df_vs_sql(spec.builder(spark, sf), spec.oracle, sf)


def test_kruskal_registered_pair(spark):
    n = _compare_registered(spark, "events_kruskal_value")
    assert n >= 3  # one row per event_type present in the fixture


def test_kruskal_fixture_tests_are_defined_and_unremarkable(spark):
    spec = _spec("events_kruskal_value")
    rows = spec.builder(spark, SF).collect()
    # every fixture event_type has all 3 arms populated -> dof = 2,
    # defined corrected statistic
    assert all(r["k_classes"] == 3 and r["dof"] == 2 for r in rows)
    assert all(r["h_corrected"] is not None for r in rows)
    # the md5 split has no real effect on value: H should be
    # unremarkable (chi2(2) at 5% is 5.991; allow slack for ~5
    # parallel tests but pin the envelope)
    assert all(r["h_corrected"] < 15.0 for r in rows)


def test_logrank_registered_pair(spark):
    n = _compare_registered(spark, "events_logrank_ab")
    assert n >= 10  # one row per distinct duration


def test_logrank_trace_invariants(spark):
    spec = _spec("events_logrank_ab")
    rows = sorted(spec.builder(spark, SF).collect(),
                  key=lambda r: r["duration_h"])
    # risk sets are nonincreasing and partition the cohort
    r0 = [r["n_risk0"] for r in rows]
    r1 = [r["n_risk1"] for r in rows]
    assert all(b <= a for a, b in zip(r0, r0[1:]))
    assert all(b <= a for a, b in zip(r1, r1[1:]))
    # variance accumulates monotonically; the final z is defined and
    # unremarkable under the no-lift md5 split
    vs = [r["var_cum"] for r in rows]
    assert all(b >= a for a, b in zip(vs, vs[1:]))
    assert rows[-1]["z_stat"] is not None
    assert abs(rows[-1]["z_stat"]) < 4.0
