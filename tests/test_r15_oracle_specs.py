"""Pre-proven oracle specs for the operators BANKED for round 15
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the
harness's canonicalization — the r8->r14 banking pattern, so round 15
can register the pairs copy-paste with the parity already
machine-checked.

NOT registered yet by design: round 14's walk is full (2 registrations
+ the 37-row r10 tail + r11 refreshes); these wait for round 15's
capacity (tests/test_registry.py's spill guard is the arbiter —
re-derive the reserve from docs/BACKLOG.md before registering).

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction):

- cox_score_test keeps EVERY accumulation integer-exact or ordered:
  the covariate contract is INTEGRAL (null/fractional x raises
  in-plan — a null x would silently vanish from the risk-set moments
  S1/S2 while the subject stays in S0, the r13 logrank-observed bug
  class closed from birth), so S0/S1/S2 are integer window sums; u/v
  accumulate as ORDERED cumulative double sums ascending by duration
  (the nelson/logrank precedent); the per-row algebra interleaves
  multiplications with divisions with identical operand order in both
  engines, and S1/S0, S2/S0 go double on the first step. Oracles CAST
  every windowed BIGINT sum (the r9 kaplan HUGEINT hash lesson).
- The covariate here is the user's EVENT COUNT (activity level) — an
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

Both candidate oracles pass the typed-hash output lint
(tests/test_oracle_types.py's banned_oracle_types) via
compare_df_vs_sql's per-call assert.
"""

import pytest

from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.sources import catalog
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _compare(spark, sdf, oracle_sql, sf=SF):
    return compare_df_vs_sql(sdf, oracle_sql, sf)


#: Candidate oracle for `events_cox_activity`
#: (relational.cox_score_test of the user's event count — activity
#: level — on the SAME per-user duration/observed survival frame the
#: graded events_kaplan_meier / events_nelson_aalen / events_logrank_ab
#: read). The scalar algebra lines mirror the Spark expressions token
#: for token — same operand order, same literals.
COX_SQL = """
WITH u AS (SELECT user_id,
                  CAST((max(epoch_ms(CAST(ts AS TIMESTAMP)))
                        - min(epoch_ms(CAST(ts AS TIMESTAMP))))
                       // 3600000 AS INTEGER) AS duration_h,
                  max(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS observed,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
t AS (SELECT duration_h,
             CAST(sum(observed) AS BIGINT) AS d,
             CAST(sum(CASE WHEN observed = 1 THEN x ELSE 0 END)
               AS BIGINT) AS sx,
             CAST(count(*) AS BIGINT) AS a,
             CAST(sum(x) AS BIGINT) AS ax,
             CAST(sum(x * x) AS BIGINT) AS ax2
      FROM u GROUP BY 1),
s AS (SELECT duration_h, d, sx,
             -- CAST: DuckDB's windowed sum(BIGINT) returns HUGEINT
             -- (the r9 kaplan int128 hash lesson)
             CAST(sum(a) OVER ()
               - coalesce(sum(a) OVER (ORDER BY duration_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s0,
             CAST(sum(ax) OVER ()
               - coalesce(sum(ax) OVER (ORDER BY duration_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s1,
             CAST(sum(ax2) OVER ()
               - coalesce(sum(ax2) OVER (ORDER BY duration_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS s2
      FROM t),
x AS (SELECT *,
             sx - CAST(d AS DOUBLE) * s1 / s0 AS u,
             CASE WHEN s0 > 1 THEN
                  CAST(d AS DOUBLE) * (s0 - d) / (s0 - 1)
                  * (CAST(s2 AS DOUBLE) / s0
                     - (CAST(s1 AS DOUBLE) / s0)
                       * (CAST(s1 AS DOUBLE) / s0))
             ELSE CAST(0.0 AS DOUBLE) END AS v
      FROM s)
SELECT duration_h,
       s0 AS n_risk, d AS n_events,
       round(CAST(s1 AS DOUBLE) / s0, 6) AS x_risk_mean,
       round(sum(u) OVER cum, 6) AS score_cum,
       round(sum(v) OVER cum, 6) AS info_cum,
       round(CASE WHEN sum(v) OVER cum > 0
                  THEN sum(u) OVER cum / sqrt(sum(v) OVER cum)
             END, 4) AS z_stat,
       CASE WHEN sum(v) OVER cum > 0
            THEN abs(sum(u) OVER cum / sqrt(sum(v) OVER cum)) > 1.96
       END AS significant_05
FROM x
WINDOW cum AS (ORDER BY duration_h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

#: Candidate oracle for `events_friedman_dow`
#: (relational.friedman_test of per-(day-of-week, event_type) traffic
#: counts: blocks = epoch-day dow, treatments = event_type — does
#: traffic differ across event types once the weekly cycle is blocked
#: out?). Epoch day 0 is a Thursday, hence the +4 Sunday alignment.
FRIEDMAN_SQL = """
WITH cells AS (SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000
                       + 4) % 7 AS dow,
                      event_type AS etype,
                      CAST(count(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
r AS (SELECT dow, etype,
             2 * count(*) OVER (PARTITION BY dow ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - count(*) OVER (PARTITION BY dow ORDER BY v
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
             + 1 AS rank2
      FROM cells),
p AS (SELECT etype,
             CAST(count(*) AS BIGINT) AS b,
             CAST(sum(rank2) AS BIGINT) AS r2,
             CAST(sum(rank2 * rank2) AS BIGINT) AS r2sq
      FROM r GROUP BY 1),
f AS (SELECT etype, r2, r2sq,
             CAST(max(b) OVER () AS BIGINT) AS bb,
             CAST(count(*) OVER () AS BIGINT) AS kk
      FROM p),
g AS (SELECT etype, r2, bb, kk,
             CAST(sum((r2 - bb * (kk + 1)) * (r2 - bb * (kk + 1)))
               OVER () AS BIGINT) AS num,
             CAST(sum(r2sq) OVER ()
               - bb * kk * (kk + 1) * (kk + 1) AS BIGINT) AS den
      FROM f)
SELECT etype, bb AS b_blocks, CAST(kk AS INTEGER) AS k_treatments,
       CAST(r2 AS DOUBLE) / 2.0 AS rank_sum,
       round(CAST(r2 AS DOUBLE) / 2.0 / bb, 6) AS mean_rank,
       round(CASE WHEN den > 0
                  THEN (kk - 1) * CAST(num AS DOUBLE) / den END, 4)
         AS t1_stat,
       CAST(kk - 1 AS INTEGER) AS dof,
       CASE WHEN den > 0 THEN ((kk - 1) * CAST(num AS DOUBLE) / den) >
            (CASE kk - 1 WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
                 WHEN 3 THEN 7.815 WHEN 4 THEN 9.488 WHEN 5 THEN 11.070
                 WHEN 6 THEN 12.592 WHEN 7 THEN 14.067
                 WHEN 8 THEN 15.507 WHEN 9 THEN 16.919
                 WHEN 10 THEN 18.307 END)
       END AS significant_05
FROM g
"""


def _cox_frame(spark, sf):
    ev = catalog.load_table(spark, "events", sf)
    # the graded events_kaplan_meier builder's derivation plus the
    # activity covariate — the survival stack reads one identical frame
    return ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"),
        F.count(F.lit(1)).cast("long").alias("x"))


def test_cox_spec_proven(spark):
    sdf = relational.cox_score_test(
        _cox_frame(spark, SF), duration="duration_h",
        observed="observed", covariate="x")
    n = _compare(spark, sdf, COX_SQL)
    assert n >= 10  # one row per distinct duration
    rows = sorted(sdf.collect(), key=lambda r: r["duration_h"])
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


def _friedman_frame(spark, sf):
    ev = catalog.load_table(spark, "events", sf)
    return ev.groupBy(
        F.expr("(ts_ms DIV 86400000 + 4) % 7").alias("dow"),
        F.col("event_type").alias("etype")).agg(
        F.count(F.lit(1)).cast("long").alias("v"))


def test_friedman_spec_proven(spark):
    sdf = relational.friedman_test(
        _friedman_frame(spark, SF), block="dow", treatment="etype",
        value="v")
    n = _compare(spark, sdf, FRIEDMAN_SQL)
    assert n >= 3  # one row per event_type
    rows = sdf.collect()
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
    from data_pipeline_eng_project_1_spark.plans import queries as Q
    from data_pipeline_eng_project_1_spark.plans.queries import _ab9_variant
    from pyspark.sql import functions as FF

    ev = catalog.load_table(spark, "events", SF)
    per_user = ev.groupBy("user_id").agg(
        FF.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
          .alias("duration_h"),
        FF.max((FF.col("event_type") == "purchase").cast("int"))
          .alias("observed"))
    cox = {r["duration_h"]: r for r in relational.cox_score_test(
        per_user.select("duration_h", "observed",
                        _ab9_variant().cast("int").alias("grp")),
        duration="duration_h", observed="observed",
        covariate="grp").collect()}
    spec = next(s for s in Q.specs() if s.name == "events_logrank_ab")
    lr = {r["duration_h"]: r
          for r in spec.builder(spark, SF).collect()}
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
