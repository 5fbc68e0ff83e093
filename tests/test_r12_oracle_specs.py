"""Pytest-level parity for the two queries registered in round 12
(docs/BACKLOG.md: the round-11 bank — SRM chi-square experiment gate,
Wald SPRT sequential A/B monitor): each test runs the REGISTERED
builder on Spark AND the REGISTERED oracle SQL on DuckDB over the same
fixture parquet, comparing with the harness's canonicalization — the
same pairs the driver hash-grades. Pre-registration these tests held
the candidate SQL as module constants (the banking proof);
post-registration they re-point at the registered pairs so the graded
surface cannot drift from the pytest pin (the r8->r11 pattern).

Both registered oracles also ride the registry-wide output-type lint
(tests/test_oracle_types.py) via compare_df_vs_sql's per-call assert,
so the r9 kaplan HUGEINT class can't creep in through an edit.

Cross-engine float discipline (pinned at banking time, preserved by
registration): the SPRT constants (ln(2q), ln(2(1-q)), the Wald
boundaries) are computed ONCE in plans/queries.py and inlined as
repr() double literals in the oracle SQL, exactly as the live operator
inlines them as F.lit doubles — both engines multiply bit-identical
operands (the pca_power literal-handoff convention).
"""

from data_pipeline_eng_project_1_spark.plans import queries as Q

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _spec(name):
    return next(s for s in Q.specs() if s.name == name)


def _compare_registered(spark, name, sf=SF):
    spec = _spec(name)
    return compare_df_vs_sql(spec.builder(spark, sf), spec.oracle, sf)


def test_srm_check_registered_pair(spark):
    n = _compare_registered(spark, "events_srm_check")
    assert n == 2  # one row per declared variant


def test_sprt_ab_registered_pair(spark):
    n = _compare_registered(spark, "events_sprt_ab")
    assert n >= 100  # one row per non-empty purchase hour


def test_sprt_ab_fixture_decision_is_honest(spark):
    """The md5 split has no real lift; at sf0.001 (~250 successes) the
    LLR walk stays inside the Wald boundaries (range -1.49..1.12) so
    the honest state is 'continue' — at the graded sf0.01 the ~2500
    successes drift to accept_h0 (verified at banking time: bin
    473374), the CORRECT no-lift conclusion; the synthetic-lift unit
    tests in tests/test_stats_ops.py pin both accept branches exactly."""
    spec = _spec("events_sprt_ab")
    rows = spec.builder(spark, SF).collect()
    assert {r["decision"] for r in rows} == {"continue"}
    assert all(r["decision_bin"] is None for r in rows)
