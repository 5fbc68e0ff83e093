"""Pre-proven oracle specs for the operators BANKED for round 17
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the
harness's canonicalization — the r8->r16 banking pattern, so round 17
can register the pairs copy-paste with the parity already
machine-checked. Parametrized over sf0.001 AND the graded sf0.01 so
both proofs live in the suite.

NOT registered yet by design: round 16's walk is full (2 registrations
+ the friedman advice-class re-needy + the 43-row r12 tail + r13
refreshes); these wait for round 17's capacity
(tests/test_registry.py's spill guard is the arbiter — re-derive the
reserve from docs/BACKLOG.md before registering).

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction):

- The one-stratum reduction is to the HYPERGEOMETRIC-variance
  chi-square, which equals (n-1)/n x Pearson (property-pinned as the
  exact relation — NOT Pearson itself; the (n_k - 1) variance
  denominators are what keep the pooled statistic valid under
  sparse-strata asymptotics).
- cmh_test reuses the stratified_logrank fold discipline VERBATIM:
  every 2x2 margin (n, r1, c1, a) is an integer stratum aggregate;
  O-E / V accumulate as ORDERED cumulative double sums ascending by
  stratum — one deterministic addition order on both engines; the
  E/V algebra interleaves multiplications with divisions
  (CAST(r1) * c1 / n; CAST(r1) * r0 / n * c1 / n * c0 / (n - 1)) in
  identical operand order, so no integer product overflows int64.
  The oracle CASTs every aggregate it outputs (HUGEINT discipline).
- The CMH stratum is the SAME dominant-event-type key the registered
  events_logrank_strat derives (window-max + filter + min-name —
  order-free aggregates, no engine argmax); strata are
  lowercase-ASCII event types, so both engines agree on the fold's
  string order. Exposure = the md5 ab9 arm (the registered split,
  salt drift-guarded); outcome = the HEAVY-PURCHASER flag
  5 * purchase_count > event_count — integer cross-multiplication on
  both engines, no rate rounding (the ever-purchase flag the
  survival stack reads is DEGENERATE here: every fixture user
  eventually purchases, making every 2x2 margin c1 = n and V = 0 —
  measured, which is why the share threshold is the fixture).
  5 strata at BOTH fixture SFs (measured); the 'purchase' stratum is
  degenerate BY CONSTRUCTION (dominant-purchase implies share > 1/5,
  so c1 = n there and it contributes V = 0) — the pooled fold rides
  the other four, exercising the degenerate-stratum rule on real
  data.
- chi2_stat = ome * ome / var with ome itself a windowed sum: Spark
  computes F.sum(a - e1).over(cum) once and squares the column; the
  oracle writes sum(a - e1) OVER cum * (sum(a - e1) OVER cum) — the
  same double value squared, division last, identical order.
- significant_05 compares chi2 to the inlined df=1 critical value
  3.841 (the srm literal precedent; the drift-guard's chi-square
  table pins the constant set).
- cochran_q_test is FULLY integer-exact (one step simpler than
  friedman — no ranks): num = (k-1)(k sum C_j^2 - N^2) and
  den = k N - sum R_i^2 are INTEGER folds; the single double
  division happens at the end, so no float accumulates anywhere and
  no ordered-fold discipline is needed.
- The Q fixture's binary outcome is derived WITHOUT floats: cell
  (dow, band) gets v = 1 iff pc * eb > pb * e — the cell's purchase
  share beats its day's overall purchase share by integer
  cross-multiplication (BIGINT products, bounded ~1e13 at sf0.1 —
  no overflow, no rate rounding, no engine median). Blocks = the
  friedman epoch-day dow, treatments = the page six-hour bands —
  both pure integer epoch arithmetic on both engines, never
  hour()/dayofweek() builtins. The grid is complete 7x4 at BOTH
  fixture SFs (measured).
- DuckDB output-type lint: success_rate divides
  CAST(cj AS DOUBLE) / bb; every windowed BIGINT sum is CAST
  (HUGEINT discipline); q_stat/chi2_stat round to 4dp, rates/
  expectations to 6dp (the statistic-rounding convention).

Adversarial pre-review risks and closures:

1. RISK: a stratum where every subject is exposed (or every outcome
   positive) makes V_k = 0 — cross-engine NULL-vs-0 drift? CLOSED:
   both engines emit v = 0.0 for degenerate margins (the CASE/when
   branch), and chi2 is NULL only while the RUNNING sum of V is 0 —
   same rule both sides, unit-pinned (test_stats_ops).
2. RISK: Q's completeness read depends on per-treatment R_i sums
   agreeing — an incomplete grid would silently read one treatment's
   partial N. CLOSED: the operator validates completeness in-plan
   (min/max cells-per-block AND cross-treatment sum agreement) and
   raises; the fixture grid is measured complete at both SFs.
3. RISK: ties in the share comparison (pc * eb == pb * e) could flip
   v per engine under float rates. CLOSED: the comparison is strict
   integer cross-multiplication on both engines — no floats exist.
4. RISK: the natural outcome (ever-purchase, the survival stack's
   observed flag) is DEGENERATE on these fixtures — every user
   eventually purchases, so c1 = n and V = 0 in every stratum and
   the statistic is vacuously NULL. CLOSED: measured at all three
   SFs before banking; the fixture outcome is the heavy-purchaser
   share threshold instead, non-degenerate in 4 of 5 strata.

One-off deep-fuzz (not in the suite — the r10+ banking convention):
20k random cases per operator twin, zero violations — CMH: label-swap
negation/V-preservation, per-stratum decomposition, V >= 0; Q:
integer fold == textbook, concordant-append EXACT invariance,
treatment-rotation invariance, k=2 == uncorrected McNemar,
nonnegativity.
"""

import pytest

from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.sources import catalog
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


#: Candidate oracle for `events_cmh_arm_conversion`
#: (relational.cmh_test of the md5 A/B arm's association with the
#: ever-purchase outcome, stratified by the user's dominant
#: event_type — the contingency counterpart of the registered
#: events_logrank_strat: does the arm move CONVERSION once the user's
#: behavioral type is controlled?). The stratum derivation mirrors
#: events_logrank_strat token for token.
CMH_SQL = """
WITH c AS (SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2),
m AS (SELECT user_id, event_type, cnt,
             max(cnt) OVER (PARTITION BY user_id) AS mx
      FROM c),
dom AS (SELECT user_id, min(event_type) AS strat
        FROM m WHERE cnt = mx GROUP BY 1),
u AS (SELECT user_id,
             CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) > count(*)
                  THEN 1 ELSE 0 END AS outcome,
             CAST(CAST('0x' || substr(md5('ab9:' ||
                 CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
               AS INTEGER) AS exposure
      FROM events GROUP BY 1),
j AS (SELECT dom.strat, u.exposure, u.outcome
      FROM u JOIN dom USING (user_id)),
t AS (SELECT strat,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(exposure) AS BIGINT) AS r1,
             CAST(sum(outcome) AS BIGINT) AS c1,
             CAST(sum(exposure * outcome) AS BIGINT) AS a
      FROM j GROUP BY 1),
x AS (SELECT *,
             CAST(r1 AS DOUBLE) * c1 / n AS e1,
             CASE WHEN n > 1 THEN
                  CAST(r1 AS DOUBLE) * (n - r1) / n * c1 / n
                  * (n - c1) / (n - 1)
             ELSE CAST(0.0 AS DOUBLE) END AS v
      FROM t)
SELECT strat,
       n AS n_total, r1 AS n_exposed, c1 AS n_success, a AS a_obs,
       round(e1, 6) AS expected1,
       round(sum(a - e1) OVER cum, 6) AS o_minus_e,
       round(sum(v) OVER cum, 6) AS var_cum,
       round(CASE WHEN sum(v) OVER cum > 0
                  THEN sum(a - e1) OVER cum * (sum(a - e1) OVER cum)
                       / sum(v) OVER cum
             END, 4) AS chi2_stat,
       CASE WHEN sum(v) OVER cum > 0
            THEN sum(a - e1) OVER cum * (sum(a - e1) OVER cum)
                 / sum(v) OVER cum > 3.841
       END AS significant_05
FROM x
WINDOW cum AS (ORDER BY strat
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

#: Candidate oracle for `events_cochranq_hourband`
#: (relational.cochran_q_test of whether each six-hour band's purchase
#: share beats its day-of-week's overall purchase share: blocks = dow,
#: treatments = the four ORDERED bands, v = the integer
#: cross-multiplied share comparison — do the bands differ in
#: over-converting once the weekly cycle is blocked out?).
COCHRANQ_SQL = """
WITH ev AS (SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000
                    + 4) % 7 AS dow,
                   CAST((epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000)
                        % 24 // 6 AS INTEGER) AS band,
                   CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END AS p
            FROM events),
cell AS (SELECT dow, band,
                CAST(count(*) AS BIGINT) AS e,
                CAST(sum(p) AS BIGINT) AS pc
         FROM ev GROUP BY 1, 2),
blk AS (SELECT dow, band, e, pc,
               CAST(sum(e) OVER (PARTITION BY dow) AS BIGINT) AS eb,
               CAST(sum(pc) OVER (PARTITION BY dow) AS BIGINT) AS pb
        FROM cell),
g AS (SELECT dow, band,
             CASE WHEN pc * eb > pb * e THEN 1 ELSE 0 END AS v
      FROM blk),
r AS (SELECT dow, band, v,
             CAST(sum(v) OVER (PARTITION BY dow) AS BIGINT) AS ri
      FROM g),
p2 AS (SELECT band,
              CAST(count(*) AS BIGINT) AS b,
              CAST(sum(v) AS BIGINT) AS cj,
              CAST(sum(ri) AS BIGINT) AS sumri,
              CAST(sum(ri * ri) AS BIGINT) AS sumri2
       FROM r GROUP BY 1),
f AS (SELECT band, cj, b,
             CAST(max(b) OVER () AS BIGINT) AS bb,
             CAST(count(*) OVER () AS BIGINT) AS kk,
             CAST(max(sumri) OVER () AS BIGINT) AS nn,
             CAST(max(sumri2) OVER () AS BIGINT) AS ri2,
             CAST(sum(cj * cj) OVER () AS BIGINT) AS cj2
      FROM p2)
SELECT band,
       bb AS b_blocks, CAST(kk AS INTEGER) AS k_treatments,
       cj AS successes,
       round(CAST(cj AS DOUBLE) / bb, 6) AS success_rate,
       round(CASE WHEN kk * nn - ri2 > 0
                  THEN CAST((kk - 1) * (kk * cj2 - nn * nn) AS DOUBLE)
                       / (kk * nn - ri2)
             END, 4) AS q_stat,
       CAST(kk - 1 AS INTEGER) AS dof,
       CASE WHEN kk * nn - ri2 > 0
            THEN CAST((kk - 1) * (kk * cj2 - nn * nn) AS DOUBLE)
                 / (kk * nn - ri2) >
                 (CASE kk - 1 WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
                      WHEN 3 THEN 7.815 WHEN 4 THEN 9.488
                      WHEN 5 THEN 11.070 WHEN 6 THEN 12.592
                      WHEN 7 THEN 14.067 WHEN 8 THEN 15.507
                      WHEN 9 THEN 16.919 WHEN 10 THEN 18.307 END)
       END AS significant_05
FROM f
"""


def _cmh_frame(spark, sf):
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
        (5 * F.sum((F.col("event_type") == "purchase").cast("long"))
         > F.count(F.lit(1))).cast("int").alias("outcome"))
    return (per_user.join(dom, "user_id")
            .select("strat",
                    _ab9_variant().cast("int").alias("exposure"),
                    "outcome"))


def _q_frame(spark, sf):
    ev = catalog.load_table(spark, "events", sf)
    cell = ev.groupBy(
        F.expr("(ts_ms DIV 86400000 + 4) % 7").alias("dow"),
        F.expr("CAST((ts_ms DIV 3600000) % 24 DIV 6 AS INT)")
         .alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("e"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
         .alias("pc"))
    wd = Window.partitionBy("dow")
    staged = cell.select(
        "dow", "band", "e", "pc",
        F.sum("e").over(wd).alias("eb"),
        F.sum("pc").over(wd).alias("pb"))
    return staged.select(
        "dow", "band",
        (F.col("pc") * F.col("eb") > F.col("pb") * F.col("e"))
        .cast("int").alias("v"))


@pytest.mark.parametrize("sf", SFS)
def test_cmh_spec_proven(sf, spark):
    sdf = relational.cmh_test(
        _cmh_frame(spark, sf), stratum="strat", exposure="exposure",
        outcome="outcome")
    n = compare_df_vs_sql(sdf, CMH_SQL, sf)
    assert n == 5  # one row per dominant-event-type stratum
    rows = sorted(sdf.collect(), key=lambda r: r["strat"])
    # margins are consistent 2x2 tables and variance accumulates
    for r in rows:
        assert 0 <= r["a_obs"] <= min(r["n_exposed"], r["n_success"])
        assert r["n_exposed"] <= r["n_total"]
    vs = [r["var_cum"] for r in rows]
    assert all(b >= a for a, b in zip(vs, vs[1:]))
    # the pooled fold carries evidence at both SFs (non-degenerate
    # margins in the click/error/signup/view strata — measured)
    assert rows[-1]["chi2_stat"] is not None
    # the 'purchase' stratum is degenerate by construction: dominant
    # purchase implies share > 1/5, so its c1 = n and it adds no V
    purch = next(r for r in rows if r["strat"] == "purchase")
    assert purch["n_success"] == purch["n_total"]


@pytest.mark.parametrize("sf", SFS)
def test_cochran_q_spec_proven(sf, spark):
    sdf = relational.cochran_q_test(
        _q_frame(spark, sf), block="dow", treatment="band", value="v")
    n = compare_df_vs_sql(sdf, COCHRANQ_SQL, sf)
    assert n == 4  # the four six-hour bands
    rows = sorted(sdf.collect(), key=lambda r: r["band"])
    assert all(r["b_blocks"] == 7 and r["k_treatments"] == 4
               and r["dof"] == 3 for r in rows)
    assert all(0 <= r["successes"] <= 7 for r in rows)
    # v is a strict 'beats the day share' flag: a day cannot have
    # every band above its own average, so no treatment sweeps 7
    # unless others lose them — totals bounded by construction
    assert sum(r["successes"] for r in rows) <= 7 * 3


def test_cmh_one_stratum_equals_classic_chi2_on_fixture(spark):
    """Fixture-level stack coherence: collapsing every user into ONE
    stratum reduces CMH to the uncorrected hypergeometric-variance
    2x2 chi-square of arm vs outcome — equal to (n-1)/n x the Pearson
    statistic (the classical exact relation, also property-pinned) —
    computed directly from the collapsed margins on the same frame."""
    sf = SFS[1]
    frame = _cmh_frame(spark, sf).withColumn("strat", F.lit("all"))
    r = relational.cmh_test(
        frame, stratum="strat", exposure="exposure",
        outcome="outcome").collect()[0]
    n, r1, c1, a = (r["n_total"], r["n_exposed"], r["n_success"],
                    r["a_obs"])
    e1 = r1 * c1 / n
    v = r1 * (n - r1) / n * c1 / n * (n - c1) / (n - 1)
    assert r["o_minus_e"] == pytest.approx(a - e1, abs=1e-5)
    assert r["var_cum"] == pytest.approx(v, abs=1e-5)
    assert r["chi2_stat"] == pytest.approx(
        (a - e1) ** 2 / v, abs=2e-4)
