"""Pre-proven oracle specs for the operators BANKED for round 18
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the
harness's canonicalization — the r8->r16 banking pattern, so a later
round can register the pairs copy-paste with the parity already
machine-checked. Parametrized over sf0.001 AND the graded sf0.01 so
both proofs live in the suite.

NOT registered yet by design: the registry sits at the ~200-spec
structural freshness ceiling (docs/BACKLOG.md) — r17's walk is
committed to the CMH/Cochran-Q registrations plus the ~44-row r13
tail; these wait for round 18's capacity (tests/test_registry.py's
spill guard is the arbiter — re-derive the reserve from
docs/BACKLOG.md before registering).

Both operators COMPLETE the stratified contingency stack on the SAME
frame the banked ``events_cmh_arm_conversion`` reads (dominant-
event-type strata, md5 ab9 arm exposure, integer heavy-purchaser
outcome): ``cmh_test`` answers IS there a common association,
``mh_odds_ratio`` answers HOW BIG with an RBG 95% CI, ``woolf_test``
answers WAS pooling into one common OR legitimate at all.

Cross-engine parity design notes (the adversarial pre-review's risks,
closed by construction):

- mh_odds_ratio reuses the cmh fold discipline VERBATIM: cells
  (a, b, c, d, n) are integer stratum aggregates; R_k / S_k / P_k /
  Q_k interleave multiplications with divisions in identical operand
  order (CAST(a) * d / n — no integer product ever forms, nothing
  overflows int64); all five running sums are ORDERED cumulative
  double sums ascending by stratum; the RBG variance reads as a
  division CHAIN (pr / 2 / R / R + psqr / 2 / R / S + qs / 2 / S / S)
  — one deterministic evaluation order on both engines.
- The only transcendentals are ln / exp / sqrt on IDENTICAL doubles
  (the kaplan/sprt precedent: same-input libm differences are below
  the 4dp/6dp rounding convention). 1.96 is the pinned z-critical
  literal on both sides (the registry drift-guard's constant).
- woolf_test applies the Haldane-Anscombe +0.5 UNCONDITIONALLY: the
  fixture's degenerate 'purchase' stratum (all outcomes 1 -> b = d =
  0, infinite uncorrected log-OR) contributes FINITE corrected L and
  w — the diagnostic runs on exactly the strata the pooling tools
  see, no fixture filter, no zero-cell contract to trip.
- woolf's chi2 is clamped with greatest(..., 0.0) on BOTH engines:
  the computational form sum wL^2 - (sum wL)^2 / sum w cancels to
  ~-1e-16 under homogeneity, and -0.0 vs 0.0 would drift the rounded
  hash. The DuckDB literal is CAST(0.0 AS DOUBLE) (bare float
  literals parse DECIMAL — the output-type lint).
- or_mh is NULL while the running S = 0, exactly 0.0 when R = 0 with
  S > 0; se/ci are NULL unless BOTH running sums are positive — the
  (rr > 0 AND ss > 0) guard is load-bearing under ANSI (ln(0),
  divide-by-zero) and mirrored as the oracle's CASE condition.
- Degenerate strata drop out of mh_odds_ratio's sums with NO
  correction (a_k d_k = 0 contributes nothing to R, b_k c_k = 0
  nothing to S): the fixture's 'purchase' stratum has b = d = 0 so
  BOTH its terms are 0 — pinned in the spec assertions.
- dof handling (woolf): running count - 1; the first trace row's
  dof = 0 yields NULL chi2/flag; dof > 10 would yield NULL flag via
  the shared inlined chi-square table (df 1..10 — the cochran_q
  convention; fixture dof = 4, crit 9.488).

Adversarial pre-review risks and closures:

1. RISK: Spark computes se_log ONCE and reuses it in both CI bounds;
   the oracle recomputes sqrt(var) inline per bound — could the two
   sqrt sites see different doubles? CLOSED: both read the SAME
   var expression over the same running sums; sqrt is deterministic
   per engine, and cross-engine ulps are absorbed by 4dp rounding.
2. RISK: ln() evaluated on a degenerate stratum's R/S = 0 under
   ANSI. CLOSED: the CI expressions live INSIDE F.when /
   CASE WHEN (rr > 0 AND ss > 0) — CaseWhen branches evaluate
   lazily on both engines; unit-pinned
   (test_mh_degenerate_and_zero_sum_rules).
3. RISK: woolf's unconditional +0.5 makes its per-stratum log-ORs
   differ from mh_odds_ratio's raw R/S on the same frame — a reader
   could 'cross-check' them and see disagreement. CLOSED: documented
   in both docstrings (the correction is the Haldane-Anscombe
   convention, O(1/n_k) on large strata); the spec asserts the
   fixture's pooled log_or_pooled and ln(or_mh) agree in sign and to
   within 0.15 at sf0.01 (measured 0.3911 vs 0.4545 on the
   ~25-40-subject strata — the degenerate stratum's corrected log-OR
   shrinks toward 0 and drags the Woolf mean slightly).
4. RISK: the sf0.001 frame is only 15 users and EVERY stratum has a
   zero diagonal — the running R is 0 and or_mh is 0.0 with no CI.
   CLOSED by pinning, not dodging: the spec asserts exactly that
   shape at sf0.001 (the R = 0 rule on real data); the healthy
   estimate (OR 1.5754, CI brackets it) is the graded sf0.01 case,
   and BOTH SFs hash-match their oracles.
5. RISK: CTE alias collision — the base frame CTEs already use
   single letters (c, m, t, x); the cell columns b/c/d could shadow.
   CLOSED: the oracles name the derived cells bcell/ccell/dcell.

Rounding-boundary margin audit (one-off, r16 closing session — a new
pre-registration evidence class for TRANSCENDENTAL-bearing pairs,
where cross-engine ln/exp ulp differences are the only remaining
drift channel): stripped the round() calls from both oracles and
measured every unrounded output value's distance from its nearest
half-way rounding boundary at sf0.001 / sf0.01 / sf0.1. Worst margin
across all columns, rows and SFs: 2.33e-4 grid units (ci_high
3.3973500233... at sf0.01's 4dp grid, ~2e-8 absolute) — roughly
EIGHT orders of magnitude above libm ulp noise (~1e-16 relative), so
no engine pair can disagree on any rounded digit. All other margins
>= 4e-3 grid units.

One-off deep-fuzz (not in the suite — the r10+ banking convention):
20k random cases per operator twin, zero violations — MH: label-swap
R<->S with var preservation, duplication (OR invariant, var exactly
1/j), one-stratum RBG == Woolf's uncorrected 1/a+1/b+1/c+1/d,
nonnegativity; Woolf: exposure/outcome-swap invariance, identical-
strata cancellation to 0, duplication scales chi2 by exactly j, k=2
closed form w1 w2 (L1-L2)^2 / (w1+w2).
"""

import math

import pytest

from data_pipeline_eng_project_1_spark.operators import relational

from tests.oracle_harness import compare_df_vs_sql
from tests.test_r17_oracle_specs import SFS, _cmh_frame

#: Shared base CTEs — the banked events_cmh_arm_conversion frame
#: token for token (dominant event_type strata via window-max +
#: min-name, md5 ab9 arm, integer heavy-purchaser outcome), folded to
#: per-stratum 2x2 cells.
_CELLS_CTES = """
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
cells AS (SELECT strat, n, r1, c1, a,
                 r1 - a AS bcell, c1 - a AS ccell,
                 n - r1 - c1 + a AS dcell
          FROM t)
"""

#: Candidate oracle for `events_mh_or_arm` (relational.mh_odds_ratio
#: on the cmh frame: HOW MUCH does the ab9 arm move the
#: heavy-purchaser odds once the user's dominant event type is
#: controlled — the estimate companion of the banked
#: events_cmh_arm_conversion, with the RBG 95% CI).
MH_OR_SQL = _CELLS_CTES + """,
terms AS (SELECT strat, n, r1, c1, a,
                 CAST(a AS DOUBLE) * dcell / n AS rt,
                 CAST(bcell AS DOUBLE) * ccell / n AS st2,
                 CAST(a + dcell AS DOUBLE) / n AS pt,
                 CAST(bcell + ccell AS DOUBLE) / n AS qt
          FROM cells),
folded AS (SELECT strat, n, r1, c1, a, rt, st2,
                  sum(rt) OVER cum AS rr,
                  sum(st2) OVER cum AS ss,
                  sum(pt * rt) OVER cum AS pr,
                  sum(pt * st2 + qt * rt) OVER cum AS psqr,
                  sum(qt * st2) OVER cum AS qs
           FROM terms
           WINDOW cum AS (ORDER BY strat
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW))
SELECT strat,
       n AS n_total, r1 AS n_exposed, c1 AS n_success, a AS a_obs,
       round(rt, 6) AS r_term, round(st2, 6) AS s_term,
       round(rr, 6) AS r_cum, round(ss, 6) AS s_cum,
       round(CASE WHEN ss > 0 THEN rr / ss END, 4) AS or_mh,
       round(CASE WHEN rr > 0 AND ss > 0 THEN
             sqrt(pr / 2 / rr / rr + psqr / 2 / rr / ss
                  + qs / 2 / ss / ss) END, 6) AS se_log,
       round(CASE WHEN rr > 0 AND ss > 0 THEN
             exp(ln(rr / ss) - 1.96 *
                 sqrt(pr / 2 / rr / rr + psqr / 2 / rr / ss
                      + qs / 2 / ss / ss)) END, 4) AS ci_low,
       round(CASE WHEN rr > 0 AND ss > 0 THEN
             exp(ln(rr / ss) + 1.96 *
                 sqrt(pr / 2 / rr / rr + psqr / 2 / rr / ss
                      + qs / 2 / ss / ss)) END, 4) AS ci_high
FROM folded
"""

#: Candidate oracle for `events_woolf_homogeneity`
#: (relational.woolf_test on the same frame: IS one common arm effect
#: even the right summary, or do the behavioral strata carry
#: genuinely different odds ratios? — the diagnostic in front of the
#: banked cmh_test / mh_odds_ratio pooling).
WOOLF_SQL = _CELLS_CTES + """,
hald AS (SELECT strat, n, r1, c1, a,
                ln((CAST(a AS DOUBLE) + 0.5)
                   * (CAST(dcell AS DOUBLE) + 0.5)
                   / (CAST(bcell AS DOUBLE) + 0.5)
                   / (CAST(ccell AS DOUBLE) + 0.5)) AS l,
                1 / (1 / (CAST(a AS DOUBLE) + 0.5)
                     + 1 / (CAST(bcell AS DOUBLE) + 0.5)
                     + 1 / (CAST(ccell AS DOUBLE) + 0.5)
                     + 1 / (CAST(dcell AS DOUBLE) + 0.5)) AS w
         FROM cells),
folded AS (SELECT strat, n, r1, c1, a, l, w,
                  sum(w) OVER cum AS ws,
                  sum(w * l) OVER cum AS wls,
                  sum(w * l * l) OVER cum AS wl2s,
                  CAST(count(*) OVER cum AS BIGINT) AS kk
           FROM hald
           WINDOW cum AS (ORDER BY strat
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW))
SELECT strat,
       n AS n_total, r1 AS n_exposed, c1 AS n_success, a AS a_obs,
       round(l, 6) AS log_or, round(w, 6) AS weight,
       round(wls / ws, 6) AS log_or_pooled,
       round(CASE WHEN kk > 1 THEN
             greatest(wl2s - wls * wls / ws, CAST(0.0 AS DOUBLE))
             END, 4) AS chi2_stat,
       CAST(kk - 1 AS INTEGER) AS dof,
       (CASE WHEN kk > 1 THEN
             greatest(wl2s - wls * wls / ws, CAST(0.0 AS DOUBLE))
        END) >
       (CASE kk - 1 WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
            WHEN 3 THEN 7.815 WHEN 4 THEN 9.488
            WHEN 5 THEN 11.070 WHEN 6 THEN 12.592
            WHEN 7 THEN 14.067 WHEN 8 THEN 15.507
            WHEN 9 THEN 16.919 WHEN 10 THEN 18.307 END)
       AS significant_05
FROM folded
"""


@pytest.mark.parametrize("sf", SFS)
def test_mh_or_spec_proven(sf, spark):
    sdf = relational.mh_odds_ratio(
        _cmh_frame(spark, sf), stratum="strat", exposure="exposure",
        outcome="outcome")
    n = compare_df_vs_sql(sdf, MH_OR_SQL, sf)
    assert n == 5  # one row per dominant-event-type stratum
    rows = sorted(sdf.collect(), key=lambda r: r["strat"])
    # running sums are monotone and the final estimate exists
    rs = [r["r_cum"] for r in rows]
    ss = [r["s_cum"] for r in rows]
    assert all(b >= a for a, b in zip(rs, rs[1:]))
    assert all(b >= a for a, b in zip(ss, ss[1:]))
    final = rows[-1]
    if sf.endswith("0.001"):
        # 15 users: EVERY stratum has a zero diagonal (measured), so
        # the running R is 0 — or_mh is exactly 0.0 with no CI. The
        # R = 0 rule exercised on real data (the r17 purchase-stratum
        # precedent); the healthy estimate is the graded sf0.01 case.
        assert final["r_cum"] == 0.0 and final["s_cum"] > 0
        assert final["or_mh"] == 0.0
        assert final["se_log"] is None and final["ci_low"] is None
    else:
        assert final["or_mh"] is not None and final["or_mh"] > 0
        assert final["ci_low"] < final["or_mh"] < final["ci_high"]
    # the degenerate 'purchase' stratum (b = d = 0) drops out of BOTH
    # sums — no Haldane correction needed for the estimate
    purch = next(r for r in rows if r["strat"] == "purchase")
    assert purch["r_term"] == 0.0 and purch["s_term"] == 0.0


@pytest.mark.parametrize("sf", SFS)
def test_woolf_spec_proven(sf, spark):
    sdf = relational.woolf_test(
        _cmh_frame(spark, sf), stratum="strat", exposure="exposure",
        outcome="outcome")
    n = compare_df_vs_sql(sdf, WOOLF_SQL, sf)
    assert n == 5
    rows = sorted(sdf.collect(), key=lambda r: r["strat"])
    final = rows[-1]
    assert final["dof"] == 4  # five strata pool to df 4
    assert final["chi2_stat"] is not None and final["chi2_stat"] >= 0
    assert final["significant_05"] is not None
    # every stratum — including the degenerate 'purchase' one —
    # contributes finite corrected evidence
    assert all(r["log_or"] is not None and r["weight"] > 0
               for r in rows)
    # the first trace row cannot be heterogeneous
    assert rows[0]["dof"] == 0 and rows[0]["chi2_stat"] is None


def test_mh_and_woolf_pooled_estimates_agree_on_fixture(spark):
    """Stack coherence at sf0.01: ln(OR_MH) and Woolf's
    inverse-variance pooled log-OR are DIFFERENT estimators of the
    same common effect. On these ~25-40-subject strata (with one
    degenerate stratum whose Haldane-corrected log-OR shrinks toward
    0) they measure 0.4545 vs 0.3911 — same direction, gap ~0.06
    from the O(1/n_k) corrections. Pin agreement in sign and to
    within 0.15, loose enough to survive fixture regeneration but
    tight enough that a wrong formula (sign flip, missing weight,
    un-logged ratio) still fails."""
    sf = SFS[1]
    frame = _cmh_frame(spark, sf)
    mh = max(relational.mh_odds_ratio(
        frame, "strat", "exposure", "outcome").collect(),
        key=lambda r: r["strat"])
    wf = max(relational.woolf_test(
        frame, "strat", "exposure", "outcome").collect(),
        key=lambda r: r["strat"])
    lom = math.log(mh["or_mh"])
    assert (lom > 0) == (wf["log_or_pooled"] > 0)
    assert wf["log_or_pooled"] == pytest.approx(lom, abs=0.15)
