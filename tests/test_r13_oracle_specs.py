"""Pytest-level parity for the two queries registered in round 13
(docs/BACKLOG.md: the round-12 bank — Mann-Whitney U by group,
Nelson-Aalen cumulative hazard): each test runs the REGISTERED builder
on Spark AND the REGISTERED oracle SQL on DuckDB over the same fixture
parquet, comparing with the harness's canonicalization — the same
pairs the driver hash-grades. Pre-registration these tests held the
candidate SQL as module constants (the banking proof);
post-registration they re-point at the registered pairs so the graded
surface cannot drift from the pytest pin (the r8->r12 pattern).

Both registered oracles also ride the registry-wide output-type lint
(tests/test_oracle_types.py) via compare_df_vs_sql's per-call assert.

Cross-engine parity design notes (the adversarial pre-review's two
risks, both closed by construction and preserved by registration):

- mann_whitney_u is RANK-FUNCTION-FREE: the tie-corrected average
  ranks are never produced by an engine rank() — 2*avg_rank =
  2*prefix_count + t + 1 is an INTEGER derived from a (group, value)
  count aggregate, so every cross-engine accumulation (rank sum, tie
  term) is an integer-exact sum and the only double math is the final
  per-group scalar algebra, written with identical operand order in
  both engines. The DuckDB-vs-Spark rank()-tie-semantics question the
  r11 verdict told us to check first is therefore moot: neither engine
  ranks.
- nelson_aalen's cumulative sums are ordered-window sums of doubles —
  ONE deterministic addition order on both engines (the kaplan_meier
  precedent) — and its oracle CASTs the windowed BIGINT risk sums
  (DuckDB would return HUGEINT: the r9 kaplan int128 hash lesson).
"""

from data_pipeline_eng_project_1_spark.plans import queries as Q

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _spec(name):
    return next(s for s in Q.specs() if s.name == name)


def _compare_registered(spark, name, sf=SF):
    spec = _spec(name)
    return compare_df_vs_sql(spec.builder(spark, sf), spec.oracle, sf)


def test_mann_whitney_registered_pair(spark):
    n = _compare_registered(spark, "events_mannwhitney_value")
    assert n >= 3  # one row per event_type present in the fixture


def test_mann_whitney_fixture_tests_are_defined_and_unremarkable(spark):
    spec = _spec("events_mannwhitney_value")
    rows = spec.builder(spark, SF).collect()
    # every fixture event_type has both arms populated -> defined tests
    assert all(r["z_stat"] is not None for r in rows)
    # the md5 split has no real treatment effect on value; with ~5
    # parallel tests at 5% a flag is possible but all |z| should be
    # unremarkable — pin the magnitude envelope, not the flag
    assert all(abs(r["z_stat"]) < 4.0 for r in rows)


def test_nelson_aalen_registered_pair(spark):
    n = _compare_registered(spark, "events_nelson_aalen")
    assert n >= 10  # one row per distinct duration


def test_nelson_aalen_fixture_curve_is_monotone(spark):
    spec = _spec("events_nelson_aalen")
    rows = sorted(spec.builder(spark, SF).collect(),
                  key=lambda r: r["duration_h"])
    # cumulative hazard is nondecreasing and finite everywhere
    hs = [r["cum_hazard"] for r in rows]
    assert all(b >= a for a, b in zip(hs, hs[1:]))
    assert rows[0]["n_risk"] == sum(r["n_event"] + r["n_censor"]
                                    for r in rows)
