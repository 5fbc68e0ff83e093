"""Pre-proven oracle specs for the operators BANKED for round 14
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the
harness's canonicalization — the r8->r13 banking pattern, so round 14
can register the pairs copy-paste with the parity already
machine-checked.

NOT registered yet by design: round 13's walk is full (2 registrations
+ the welch re-needy + the 35-row r9 tail + r10 refreshes); these wait
for round 14's capacity (tests/test_registry.py's spill guard is the
arbiter — re-derive the reserve from docs/BACKLOG.md before
registering).

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction):

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

Both candidate oracles pass the typed-hash output lint
(tests/test_oracle_types.py's banned_oracle_types) via
compare_df_vs_sql's per-call assert.
"""

from data_pipeline_eng_project_1_spark.functions import hashing
from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.sources import catalog
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _compare(spark, sdf, oracle_sql, sf=SF):
    return compare_df_vs_sql(sdf, oracle_sql, sf)


#: Candidate oracle for `events_kruskal_value`
#: (relational.kruskal_wallis of event value across a 3-way md5 split,
#: one test per event_type — the k-sample rung above the graded
#: mann_whitney pair test). The scalar algebra lines mirror the Spark
#: expressions token for token — same operand order, same literals.
KRUSKAL_SQL = """
WITH e AS (SELECT event_type AS etype, value,
                  CAST(CAST('0x' || substr(md5('kw3:' ||
                      CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 3
                    AS INTEGER) AS clazz
           FROM events WHERE value IS NOT NULL),
a AS (SELECT etype, clazz, value, count(*) AS cnt
      FROM e GROUP BY 1, 2, 3),
r AS (SELECT etype, clazz, cnt,
             sum(cnt) OVER (PARTITION BY etype ORDER BY value
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_le,
             sum(cnt) OVER (PARTITION BY etype ORDER BY value
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS t,
             min(clazz) OVER (PARTITION BY etype ORDER BY value
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS min_clazz
      FROM a),
p AS (SELECT etype, clazz,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt * (2 * cum_le - t + 1)) AS BIGINT) AS r2x2,
             CAST(sum(CASE WHEN clazz = min_clazz
                           THEN t * t * t - t ELSE 0 END) AS BIGINT)
               AS ties
      FROM r GROUP BY 1, 2),
f AS (SELECT etype,
             CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) OVER w
               AS INTEGER) AS k_classes,
             CAST(sum(n) OVER w AS BIGINT) AS n_total,
             sum(CASE WHEN n > 0
                      THEN (r2x2 / 2.0) * (r2x2 / 2.0) / n
                      ELSE CAST(0.0 AS DOUBLE) END)
               OVER (PARTITION BY etype ORDER BY clazz
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sumr_run,
             CAST(sum(ties) OVER w AS BIGINT) AS tiesum,
             clazz = max(clazz) OVER w AS is_last
      FROM p
      WINDOW w AS (PARTITION BY etype)),
g AS (SELECT etype, k_classes, n_total, sumr_run, tiesum
      FROM f WHERE is_last AND n_total > 0),
s AS (SELECT etype, k_classes, n_total,
             12.0 / (CAST(n_total AS DOUBLE)
                     * (CAST(n_total AS DOUBLE) + 1.0)) * sumr_run
               - 3.0 * (CAST(n_total AS DOUBLE) + 1.0) AS h,
             CASE WHEN n_total > 1 THEN
                  1.0 - tiesum / (CAST(n_total AS DOUBLE)
                                  * CAST(n_total AS DOUBLE)
                                  * CAST(n_total AS DOUBLE)
                                  - CAST(n_total AS DOUBLE))
             END AS corr
      FROM g)
SELECT etype, k_classes, n_total,
       round(h, 4) AS h_stat,
       round(CASE WHEN corr > 0 THEN h / corr END, 4) AS h_corrected,
       CAST(k_classes - 1 AS INTEGER) AS dof,
       CASE WHEN corr > 0 THEN (h / corr) >
            (CASE k_classes - 1 WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
                 WHEN 3 THEN 7.815 WHEN 4 THEN 9.488 WHEN 5 THEN 11.070
                 WHEN 6 THEN 12.592 WHEN 7 THEN 14.067
                 WHEN 8 THEN 15.507 WHEN 9 THEN 16.919
                 WHEN 10 THEN 18.307 END)
       END AS significant_05
FROM s
"""

#: Candidate oracle for `events_logrank_ab` (relational.logrank_test
#: between the md5 A/B arms over the SAME per-user duration/observed
#: frame the graded events_kaplan_meier / events_nelson_aalen read).
LOGRANK_SQL = """
WITH u AS (SELECT user_id,
                  CAST((max(epoch_ms(CAST(ts AS TIMESTAMP)))
                        - min(epoch_ms(CAST(ts AS TIMESTAMP))))
                       // 3600000 AS INTEGER) AS duration_h,
                  max(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS observed,
                  CAST(CAST('0x' || substr(md5('ab9:' ||
                      CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
                    AS INTEGER) AS grp
           FROM events GROUP BY 1),
t AS (SELECT duration_h,
             CAST(sum(CASE WHEN grp = 0 THEN observed ELSE 0 END)
               AS BIGINT) AS d0,
             CAST(sum(CASE WHEN grp = 1 THEN observed ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS a0,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS a1
      FROM u GROUP BY 1),
s AS (SELECT duration_h, d0, d1,
             -- CAST: DuckDB's windowed sum(BIGINT) returns HUGEINT
             -- (the r9 kaplan int128 hash lesson)
             CAST(sum(a0) OVER ()
               - coalesce(sum(a0) OVER (ORDER BY duration_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n0,
             CAST(sum(a1) OVER ()
               - coalesce(sum(a1) OVER (ORDER BY duration_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1
      FROM t),
x AS (SELECT *,
             CAST(d0 + d1 AS DOUBLE) * n1 / (n0 + n1) AS e1,
             CASE WHEN n0 + n1 > 1 THEN
                  CAST(d0 + d1 AS DOUBLE) * n1 / (n0 + n1) * n0
                  / (n0 + n1) * ((n0 + n1) - (d0 + d1))
                  / ((n0 + n1) - 1)
             ELSE CAST(0.0 AS DOUBLE) END AS v
      FROM s)
SELECT duration_h,
       n0 AS n_risk0, n1 AS n_risk1,
       d0 AS n_event0, d1 AS n_event1,
       round(e1, 6) AS expected1,
       round(sum(d1 - e1) OVER cum, 6) AS o_minus_e,
       round(sum(v) OVER cum, 6) AS var_cum,
       round(CASE WHEN sum(v) OVER cum > 0
                  THEN sum(d1 - e1) OVER cum / sqrt(sum(v) OVER cum)
             END, 4) AS z_stat,
       CASE WHEN sum(v) OVER cum > 0
            THEN abs(sum(d1 - e1) OVER cum / sqrt(sum(v) OVER cum))
                 > 1.96
       END AS significant_05
FROM x
WINDOW cum AS (ORDER BY duration_h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _kw3_clazz():
    """3-way deterministic md5 user-level split for the k-sample test
    (distinct salt from the ab9 binary split — a 3-arm experiment is a
    different assignment, not a re-bucketing of the A/B one)."""
    return (hashing.hex_int(
        F.concat(F.lit("kw3:"), F.col("user_id").cast("string"))) % 3)


# the binary split comes from the ONE factored helper the registered
# experiment stack reads (the r13 _ab9_variant dedup's whole point —
# a private copy here could silently desynchronize the banked logrank
# spec from the split the registration will grade; review finding)
from data_pipeline_eng_project_1_spark.plans.queries import (  # noqa: E402
    _ab9_variant,
)


def test_kruskal_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.kruskal_wallis(
        ev.select(F.col("event_type").alias("etype"),
                  _kw3_clazz().cast("int").alias("clazz"), "value"),
        group="etype", clazz="clazz", value="value")
    n = _compare(spark, sdf, KRUSKAL_SQL)
    assert n >= 3  # one row per event_type present in the fixture
    rows = sdf.collect()
    # every fixture event_type has all 3 arms populated -> dof = 2,
    # defined corrected statistic
    assert all(r["k_classes"] == 3 and r["dof"] == 2 for r in rows)
    assert all(r["h_corrected"] is not None for r in rows)
    # the md5 split has no real effect on value: H should be
    # unremarkable (chi2(2) at 5% is 5.991; allow slack for ~5
    # parallel tests but pin the envelope)
    assert all(r["h_corrected"] < 15.0 for r in rows)


def test_logrank_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    # the graded events_kaplan_meier builder's derivation, verbatim —
    # the survival stack reads one identical frame
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    sdf = relational.logrank_test(
        per_user.select("duration_h", "observed",
                        _ab9_variant().cast("int").alias("grp")),
        duration="duration_h", observed="observed", grp="grp")
    n = _compare(spark, sdf, LOGRANK_SQL)
    assert n >= 10  # one row per distinct duration
    rows = sorted(sdf.collect(), key=lambda r: r["duration_h"])
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
