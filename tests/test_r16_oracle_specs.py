"""Pre-proven oracle specs for the operators BANKED for round 16
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the
harness's canonicalization — the r8->r15 banking pattern, so round 16
can register the pairs copy-paste with the parity already
machine-checked. Parametrized over sf0.001 AND the graded sf0.01 so
both proofs live in the suite.

NOT registered yet by design: round 15's walk is full (2 registrations
+ the 41-row r11 tail + r12 refreshes); these wait for round 16's
capacity (tests/test_registry.py's spill guard is the arbiter —
re-derive the reserve from docs/BACKLOG.md before registering).

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction):

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
from data_pipeline_eng_project_1_spark.sources import catalog
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


#: Candidate oracle for `events_logrank_strat`
#: (relational.stratified_logrank of the md5 A/B arms over the SAME
#: per-user duration/observed survival frame the graded
#: events_kaplan_meier / events_logrank_ab read, stratified by the
#: user's dominant event_type — does the arm effect hold once the
#: user's behavioral type is controlled?). The per-duration algebra
#: mirrors the registered events_logrank_ab oracle token for token,
#: with the stratum added to every window partition and the final
#: fold ordered by (strat, duration_h).
STRAT_LOGRANK_SQL = """
WITH c AS (SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2),
m AS (SELECT user_id, event_type, cnt,
             max(cnt) OVER (PARTITION BY user_id) AS mx
      FROM c),
dom AS (SELECT user_id, min(event_type) AS strat
        FROM m WHERE cnt = mx GROUP BY 1),
u AS (SELECT user_id,
             CAST((max(epoch_ms(CAST(ts AS TIMESTAMP)))
                   - min(epoch_ms(CAST(ts AS TIMESTAMP))))
                  // 3600000 AS INTEGER) AS duration_h,
             max(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS observed,
             CAST(CAST('0x' || substr(md5('ab9:' ||
                 CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
               AS INTEGER) AS grp
      FROM events GROUP BY 1),
j AS (SELECT u.user_id, dom.strat, u.duration_h, u.observed, u.grp
      FROM u JOIN dom USING (user_id)),
t AS (SELECT strat, duration_h,
             CAST(sum(CASE WHEN grp = 0 THEN observed ELSE 0 END)
               AS BIGINT) AS d0,
             CAST(sum(CASE WHEN grp = 1 THEN observed ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS a0,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS a1
      FROM j GROUP BY 1, 2),
s AS (SELECT strat, duration_h, d0, d1,
             -- CAST: DuckDB's windowed sum(BIGINT) returns HUGEINT
             -- (the r9 kaplan int128 hash lesson)
             CAST(sum(a0) OVER (PARTITION BY strat)
               - coalesce(sum(a0) OVER (PARTITION BY strat
                   ORDER BY duration_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n0,
             CAST(sum(a1) OVER (PARTITION BY strat)
               - coalesce(sum(a1) OVER (PARTITION BY strat
                   ORDER BY duration_h
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
SELECT strat, duration_h,
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
WINDOW cum AS (ORDER BY strat, duration_h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

#: Candidate oracle for `events_page_hourband`
#: (relational.page_trend_test of per-(day-of-week, six-hour-band)
#: traffic counts: blocks = epoch-day dow, ORDERED treatments = the
#: four six-hour bands of the day — does traffic trend monotonically
#: across the day once the weekly cycle is blocked out?). Epoch day 0
#: is a Thursday, hence the +4 Sunday alignment; the band is pure
#: integer epoch-hour arithmetic on both engines.
PAGE_SQL = """
WITH cells AS (SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000
                       + 4) % 7 AS dow,
                      CAST((epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000)
                           % 24 // 6 AS INTEGER) AS band,
                      CAST(count(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
r AS (SELECT dow, band,
             2 * count(*) OVER (PARTITION BY dow ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - count(*) OVER (PARTITION BY dow ORDER BY v
                 RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
             + 1 AS rank2
      FROM cells),
p AS (SELECT band,
             CAST(count(*) AS BIGINT) AS b,
             CAST(sum(rank2) AS BIGINT) AS r2
      FROM r GROUP BY 1),
f AS (SELECT band, r2, b,
             CAST(count(*) OVER (ORDER BY band
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS j,
             CAST(max(b) OVER () AS BIGINT) AS bb,
             CAST(count(*) OVER () AS BIGINT) AS kk
      FROM p),
g AS (SELECT band, r2, j, bb, kk,
             CAST(sum(j * r2) OVER () AS BIGINT) AS twol
      FROM f)
SELECT band, CAST(j AS INTEGER) AS j_index,
       bb AS b_blocks, CAST(kk AS INTEGER) AS k_treatments,
       CAST(r2 AS DOUBLE) / 2.0 AS rank_sum,
       round(CAST(r2 AS DOUBLE) / 2.0 / bb, 6) AS mean_rank,
       CAST(twol AS DOUBLE) / 2.0 AS l_stat,
       round(CASE WHEN CAST(bb * kk * kk * (kk + 1) * (kk + 1)
                          * (kk - 1) AS DOUBLE) / 9.0 > 0
                  THEN CAST(2 * twol - bb * kk * (kk + 1) * (kk + 1)
                         AS DOUBLE)
                       / sqrt(CAST(bb * kk * kk * (kk + 1) * (kk + 1)
                                   * (kk - 1) AS DOUBLE) / 9.0)
             END, 4) AS z_stat,
       CASE WHEN CAST(bb * kk * kk * (kk + 1) * (kk + 1)
                      * (kk - 1) AS DOUBLE) / 9.0 > 0
            THEN abs(CAST(2 * twol - bb * kk * (kk + 1) * (kk + 1)
                       AS DOUBLE)
                     / sqrt(CAST(bb * kk * kk * (kk + 1) * (kk + 1)
                                 * (kk - 1) AS DOUBLE) / 9.0)) > 1.96
       END AS significant_05
FROM g
"""


def _strat_frame(spark, sf):
    ev = catalog.load_table(spark, "events", sf)
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"))
    wu = Window.partitionBy("user_id")
    dom = (cnts.withColumn("__mx", F.max("cnt").over(wu))
           .filter(F.col("cnt") == F.col("__mx"))
           .groupBy("user_id")
           .agg(F.min("event_type").alias("strat")))
    from data_pipeline_eng_project_1_spark.plans.queries import _ab9_variant
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    return (per_user.join(dom, "user_id")
            .select("strat", "duration_h", "observed",
                    _ab9_variant().cast("int").alias("grp")))


@pytest.mark.parametrize("sf", SFS)
def test_stratified_logrank_spec_proven(spark, sf):
    sdf = relational.stratified_logrank(
        _strat_frame(spark, sf), duration="duration_h",
        observed="observed", grp="grp", stratum="strat")
    n = compare_df_vs_sql(sdf, STRAT_LOGRANK_SQL, sf)
    # one row per (stratum, distinct duration): 14 at sf0.001 (few
    # durations survive the per-stratum split), >= 20 at sf0.01
    assert n >= (10 if sf.endswith("0.001") else 20)
    rows = sorted(sdf.collect(), key=lambda r: (r["strat"],
                                                r["duration_h"]))
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
def test_page_spec_proven(spark, sf):
    ev = catalog.load_table(spark, "events", sf)
    cells = ev.groupBy(
        F.expr("(ts_ms DIV 86400000 + 4) % 7").alias("dow"),
        F.expr("CAST((ts_ms DIV 3600000) % 24 DIV 6 AS INT)")
         .alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("v"))
    sdf = relational.page_trend_test(
        cells, block="dow", treatment="band", value="v")
    n = compare_df_vs_sql(sdf, PAGE_SQL, sf)
    assert n == 4  # the four six-hour bands
    rows = sorted(sdf.collect(), key=lambda r: r["band"])
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
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    sf = SFS[0]
    frame = _strat_frame(spark, sf).withColumn("strat", F.lit("all"))
    mine = {r["duration_h"]: r for r in relational.stratified_logrank(
        frame, duration="duration_h", observed="observed", grp="grp",
        stratum="strat").collect()}
    spec = next(s for s in Q.specs() if s.name == "events_logrank_ab")
    lr = {r["duration_h"]: r for r in spec.builder(spark, sf).collect()}
    assert set(mine) == set(lr) and len(mine) >= 10
    for t in mine:
        for c in ("n_risk0", "n_risk1", "n_event0", "n_event1",
                  "expected1", "o_minus_e", "var_cum", "z_stat",
                  "significant_05"):
            assert mine[t][c] == lr[t][c], (t, c)
