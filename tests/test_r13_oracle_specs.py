"""Pre-proven oracle specs for the operators BANKED for round 13
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the
harness's canonicalization — the r8->r12 banking pattern, so round 13
can register the pairs copy-paste with the parity already
machine-checked.

NOT registered yet by design: round 12 is the r8-tail retirement round
(2 registrations + 48 stale refreshes fill the walk); these wait for
round 13's capacity (tests/test_registry.py's spill guard is the
arbiter — re-derive the reserve from docs/BACKLOG.md before
registering).

Cross-engine parity design notes (the adversarial pre-review's two
risks, both closed by construction):

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


def _ab_variant():
    """The experiment stack's deterministic md5 user-level A/B
    assignment (welch/srm/sprt all grade THE SAME split)."""
    return (hashing.hex_int(
        F.concat(F.lit("ab9:"), F.col("user_id").cast("string"))) % 2)


#: Candidate oracle for `events_mannwhitney_value`
#: (relational.mann_whitney_u of event value between the md5 A/B arms,
#: one test per event_type). The scalar algebra lines mirror the Spark
#: expressions token for token — same operand order, same literals.
MANN_WHITNEY_SQL = """
WITH e AS (SELECT event_type AS etype, value,
                  CAST(CAST('0x' || substr(md5('ab9:' ||
                      CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
                    AS INTEGER) AS variant
           FROM events WHERE value IS NOT NULL),
a AS (SELECT etype, value,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
      FROM e GROUP BY 1, 2),
r AS (SELECT etype, c0, c1, c0 + c1 AS t,
             coalesce(sum(c0 + c1) OVER (PARTITION BY etype ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
      FROM a),
g AS (SELECT etype,
             CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1x2,
             CAST(sum(t * t * t - t) AS BIGINT) AS ties
      FROM r GROUP BY 1),
s AS (SELECT *,
             r1x2 / 2.0 - n1 * (n1 + 1.0) / 2.0 AS u1,
             CAST(n0 AS DOUBLE) * n1 / 2.0 AS mu,
             CASE WHEN n0 + n1 > 1 THEN
                  CAST(n0 AS DOUBLE) * n1 / 12.0
                  * ((CAST(n0 + n1 AS DOUBLE) + 1.0)
                     - ties / (CAST(n0 + n1 AS DOUBLE)
                               * (CAST(n0 + n1 AS DOUBLE) - 1.0)))
             END AS s2
      FROM g)
SELECT etype, n0, n1,
       round(u1, 2) AS u_stat,
       round(mu, 2) AS mu_u,
       CASE WHEN s2 > 0 THEN round(sqrt(s2), 4) END AS sigma_u,
       CASE WHEN s2 > 0 THEN round((u1 - mu) / sqrt(s2), 4) END AS z_stat,
       CASE WHEN s2 > 0 THEN abs((u1 - mu) / sqrt(s2)) > 1.96
       END AS significant_05
FROM s
"""

#: Candidate oracle for `events_nelson_aalen` (relational.nelson_aalen
#: over the SAME per-user duration/observed derivation the graded
#: events_kaplan_meier uses — the two estimators read one survival
#: frame from its two canonical sides).
NELSON_AALEN_SQL = """
WITH u AS (SELECT user_id,
                  CAST((max(epoch_ms(CAST(ts AS TIMESTAMP)))
                        - min(epoch_ms(CAST(ts AS TIMESTAMP))))
                       // 3600000 AS INTEGER) AS duration_h,
                  max(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS observed
           FROM events GROUP BY 1),
t AS (SELECT duration_h,
             CAST(sum(observed) AS BIGINT) AS n_event,
             CAST(sum(1 - observed) AS BIGINT) AS n_censor
      FROM u GROUP BY 1),
s AS (SELECT duration_h, n_event, n_censor,
             -- CAST: DuckDB's windowed sum(BIGINT) returns HUGEINT
             -- (the r9 kaplan int128 hash lesson)
             CAST(sum(n_event + n_censor) OVER ()
               - coalesce(sum(n_event + n_censor) OVER
                   (ORDER BY duration_h
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM t)
SELECT duration_h, n_risk, n_event, n_censor,
       round(sum(n_event / n_risk) OVER cum, 6) AS cum_hazard,
       round(sum(n_event / n_risk / n_risk) OVER cum, 8) AS hazard_var
FROM s
WINDOW cum AS (ORDER BY duration_h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def test_mann_whitney_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.mann_whitney_u(
        ev.select(F.col("event_type").alias("etype"),
                  _ab_variant().cast("int").alias("variant"), "value"),
        group="etype", variant="variant", value="value")
    n = _compare(spark, sdf, MANN_WHITNEY_SQL)
    assert n >= 3  # one row per event_type present in the fixture
    rows = sdf.collect()
    # every fixture event_type has both arms populated -> defined tests
    assert all(r["z_stat"] is not None for r in rows)
    # the md5 split has no real treatment effect on value; with ~5
    # parallel tests at 5% a flag is possible but all |z| should be
    # unremarkable — pin the magnitude envelope, not the flag
    assert all(abs(r["z_stat"]) < 4.0 for r in rows)


def test_nelson_aalen_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    # the graded events_kaplan_meier builder's derivation, verbatim —
    # the r13 registration reuses it so the two estimators read one
    # identical survival frame
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    sdf = relational.nelson_aalen(per_user, "duration_h", "observed")
    n = _compare(spark, sdf, NELSON_AALEN_SQL)
    assert n >= 10  # one row per distinct duration
    rows = sorted(sdf.collect(), key=lambda r: r["duration_h"])
    # cumulative hazard is nondecreasing and finite everywhere
    hs = [r["cum_hazard"] for r in rows]
    assert all(b >= a for a, b in zip(hs, hs[1:]))
    assert rows[0]["n_risk"] == sum(r["n_event"] + r["n_censor"]
                                    for r in rows)
