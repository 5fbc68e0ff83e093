"""Pre-proven oracle specs for the operators BANKED for round 12
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the
harness's canonicalization — the r8->r11 banking pattern, so round 12
can register the pairs copy-paste with the parity already
machine-checked.

NOT registered yet by design: the round-11 walk spills ~46 r8-stale
rows, capping round 12's definition load at 4 (tests/test_registry.py's
re-derived spill guard) — the bank is sized to 2 specs.

Cross-engine float discipline: the SPRT constants (ln(2q), ln(2(1-q)),
the Wald boundaries) are computed ONCE in this process and inlined as
repr() double literals in the oracle SQL, exactly as the live operator
inlines them as F.lit doubles — both engines multiply bit-identical
operands (the pca_power literal-handoff convention).
"""

import math

from data_pipeline_eng_project_1_spark.functions import hashing
from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.sources import catalog
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _compare(spark, sdf, oracle_sql, sf=SF):
    return compare_df_vs_sql(sdf, oracle_sql, sf)


def _ab_variant():
    """The graded Welch query's deterministic md5 user-level A/B
    assignment — SRM audits and SPRT monitors THE SAME split."""
    return (hashing.hex_int(
        F.concat(F.lit("ab9:"), F.col("user_id").cast("string"))) % 2)


#: Candidate oracle for `events_srm_check` (relational.srm_check of the
#: welch assignment against its declared 50/50 split, df=1 critical
#: value 3.841 at 5%).
SRM_CHECK_SQL = """
WITH v AS (SELECT CAST(CAST('0x' || substr(md5('ab9:' ||
               CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
             AS INTEGER) AS variant
           FROM events),
a AS (SELECT variant, count(*) AS n FROM v GROUP BY 1),
d AS (SELECT * FROM (VALUES (0, CAST(0.5 AS DOUBLE)),
                            (1, CAST(0.5 AS DOUBLE)))
      AS t(variant, expected_share)),
f AS (SELECT d.variant, coalesce(a.n, 0) AS n, d.expected_share
      FROM d LEFT JOIN a USING (variant)),
s AS (SELECT variant, n, expected_share, sum(n) OVER () AS total
      FROM f),
c AS (SELECT *,
             CASE WHEN total > 0
                  THEN (n - expected_share * total)
                       * (n - expected_share * total)
                       / (expected_share * total) END AS ct
      FROM s)
SELECT CAST(variant AS INTEGER) AS variant,
       CAST(n AS BIGINT) AS n,
       round(expected_share, 6) AS expected_share,
       round(CASE WHEN total > 0 THEN n * 1.0 / total END, 6)
         AS observed_share,
       round(ct, 6) AS chi_term,
       round(sum(ct) OVER (), 4) AS chi2_total,
       CAST(1 AS INTEGER) AS dof,
       sum(ct) OVER () > 3.841 AS srm_flag
FROM c
"""

_Q = 1.5 / (1.0 + 1.5)
_C1 = math.log(2.0 * _Q)
_C0 = math.log(2.0 * (1.0 - _Q))
_LN_A = math.log((1.0 - 0.05) / 0.05)
_LN_B = math.log(0.05 / (1.0 - 0.05))

#: Candidate oracle for `events_sprt_ab` (relational.sprt_ab on the
#: purchase-success stream of the welch assignment, hourly decision
#: bins, lift_ratio 1.5, alpha = beta = 0.05).
SPRT_AB_SQL = f"""
WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
                  CAST('0x' || substr(md5('ab9:' ||
                      CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
                    AS variant
           FROM events WHERE event_type = 'purchase'),
b AS (SELECT ts_ms // 3600000 AS bin, count(*) AS n_succ,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b
      FROM e GROUP BY 1),
s AS (SELECT bin, n_succ, n_b,
             n_b * CAST({_C1!r} AS DOUBLE)
               + (n_succ - n_b) * CAST({_C0!r} AS DOUBLE) AS lb
      FROM b),
r AS (SELECT *, sum(lb) OVER (ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM s),
x AS (SELECT *, CASE WHEN run >= {_LN_A!r} THEN 'accept_h1'
                     WHEN run <= {_LN_B!r} THEN 'accept_h0'
                END AS crossed
      FROM r),
fb AS (SELECT min(CASE WHEN crossed IS NOT NULL THEN bin END) AS f
       FROM x)
SELECT CAST(x.bin AS BIGINT) AS bin_idx,
       CAST(n_succ AS BIGINT) AS n_succ,
       CAST(n_b AS BIGINT) AS n_b_succ,
       round(lb, 6) AS llr_bin,
       round(run, 6) AS llr_running,
       coalesce(max(CASE WHEN x.bin = fb.f THEN crossed END) OVER (),
                'continue') AS decision,
       CAST(fb.f AS BIGINT) AS decision_bin
FROM x, fb
"""


def test_srm_check_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.srm_check(
        ev.select(_ab_variant().cast("int").alias("variant")),
        "variant", {0: 0.5, 1: 0.5}, chi2_threshold=3.841)
    n = _compare(spark, sdf, SRM_CHECK_SQL)
    assert n == 2  # one row per declared variant


def test_sprt_ab_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.sprt_ab(
        ev.select("ts_ms", "event_type",
                  _ab_variant().cast("int").alias("variant")),
        ts="ts_ms", variant="variant",
        success=F.col("event_type") == "purchase",
        lift_ratio=1.5, alpha=0.05, beta=0.05, bin_ms=3_600_000)
    n = _compare(spark, sdf, SPRT_AB_SQL)
    assert n >= 100  # one row per non-empty purchase hour
    rows = sdf.collect()
    # the md5 split has no real lift; at sf0.001 (~250 successes) the
    # LLR walk stays inside the Wald boundaries (range -1.49..1.12) so
    # the honest state is 'continue' — at the graded sf0.01 the ~2500
    # successes drift to accept_h0 (verified: bin 473374), the CORRECT
    # no-lift conclusion; the synthetic-lift unit tests pin both accept
    # branches exactly
    assert {r["decision"] for r in rows} == {"continue"}
    assert all(r["decision_bin"] is None for r in rows)
