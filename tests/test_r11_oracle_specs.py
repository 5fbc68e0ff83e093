"""Pre-proven oracle specs for the operators BANKED for round 11
(docs/BACKLOG.md): each test runs the live operator on Spark AND the
candidate DuckDB oracle over the same fixture parquet with the harness's
canonicalization — the r8->r9->r10 banking pattern, so round 11 can
register the pairs copy-paste with the parity already machine-checked.

NOT registered yet by design: the round-10 walk carries 9 needy rows +
the 28-row r6 freshness tail; these wait for round 11's capacity
(tests/test_registry.py's spill guard is the arbiter).

All seven candidate oracles pass the typed-hash output lint
(tests/test_oracle_types.py's banned_oracle_types) — asserted per spec
below, so the r9 kaplan HUGEINT class can't hide in a banked spec.
"""

from data_pipeline_eng_project_1_spark.functions import texts
from data_pipeline_eng_project_1_spark.operators import dedup, relational
from data_pipeline_eng_project_1_spark.plans.llm_ops import (
    _SQL_STOPS,
    SQL_TOKS,
)
from data_pipeline_eng_project_1_spark.sources import catalog
from pyspark.sql import functions as F

from tests.oracle_harness import compare_df_vs_sql

SF = "/root/testdata/sf0.001"


def _compare(spark, sdf, oracle_sql, sf=SF):
    return compare_df_vs_sql(sdf, oracle_sql, sf)


#: Candidate oracle for `events_seasonal_outliers`
#: (relational.seasonal_outliers over events.value, hour-of-day profile).
SEASONAL_OUTLIERS_SQL = """
WITH e AS (SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
                  value
           FROM events WHERE value IS NOT NULL),
b AS (SELECT event_id, ts_ms, value,
             CAST((ts_ms // 3600000) % 24 AS INTEGER) AS bucket
      FROM e),
p AS (SELECT bucket, count(value) AS n_bucket, avg(value) AS m,
             stddev_samp(value) AS sd
      FROM b GROUP BY 1)
SELECT b.event_id, b.ts_ms, b.bucket, b.value,
       CAST(p.n_bucket AS BIGINT) AS n_bucket,
       round(p.m, 6) AS base_mean,
       round(p.sd, 6) AS base_std,
       round((b.value - p.m) / p.sd, 4) AS zscore
FROM b JOIN p USING (bucket)
WHERE p.n_bucket >= 8 AND p.sd > 1e-9
  AND abs((b.value - p.m) / p.sd) >= 3.0
"""

#: Candidate oracle for `orders_kfold_audit`
#: (relational.kfold_assignment_audit, k=5, stratum = order priority).
KFOLD_AUDIT_SQL = """
WITH f AS (SELECT CAST('0x' || substr(md5('fold:' ||
               CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 5
             AS fold,
           o_orderpriority
           FROM orders),
a AS (SELECT CAST(fold AS INTEGER) AS fold, o_orderpriority,
             count(*) AS n
      FROM f GROUP BY 1, 2),
s AS (SELECT fold, o_orderpriority, n,
             sum(n) OVER (PARTITION BY fold) AS fold_total,
             n * 1.0 / sum(n) OVER (PARTITION BY fold) AS share,
             sum(n) OVER (PARTITION BY o_orderpriority) * 1.0
               / sum(n) OVER () AS gshare
      FROM a)
SELECT fold, o_orderpriority, CAST(n AS BIGINT) AS n,
       CAST(fold_total AS BIGINT) AS fold_total,
       round(share, 6) AS stratum_share,
       round(gshare, 6) AS global_share,
       round(share - gshare, 6) AS share_gap,
       round(max(abs(share - gshare)) OVER (), 6) AS max_abs_gap
FROM s
"""

#: Shared scan CTE: the quality-classifier score (rounded to 4dp BEFORE
#: binning so bucket assignment is cross-engine exact) and the rule-gate
#: label the score distills (corpus_curation's gate).
_QC = texts.DEFAULT_QUALITY_WEIGHTS
_SCORED_DOCS_CTE = f"""
f AS (
  SELECT len({SQL_TOKS}) AS n_tokens,
         len(list_filter({SQL_TOKS},
             t -> list_contains({_SQL_STOPS}, t))) * 1.0
           / len({SQL_TOKS}) AS stop_r,
         (length(lower(text))
          - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
           * 1.0 / length(text) AS punct_r,
         length(replace(text, ' ', '')) * 1.0
           / len({SQL_TOKS}) AS alen
  FROM documents WHERE len({SQL_TOKS}) > 0
),
q AS (
  SELECT round(1.0 / (1.0 + exp(-({_QC['bias']}
           + {_QC['stop']} * stop_r
           + {_QC['punct']} * punct_r
           + {_QC['alen']} * alen
           + {_QC['lntok']} * ln(n_tokens)))), 4) AS score,
         CASE WHEN n_tokens BETWEEN 20 AND 1000
               AND stop_r BETWEEN 0.01 AND 0.6
              THEN 1 ELSE 0 END AS y
  FROM f
)
"""

#: Candidate oracle for `docs_quality_calibration`
#: (relational.calibration_bins: is the distilled linear classifier
#: calibrated against the rule gate it stands in for?).
CALIBRATION_SQL = f"""
WITH {_SCORED_DOCS_CTE},
b AS (SELECT list_distinct(quantile_cont(score,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS bs
      FROM q),
a AS (SELECT 1 + len(list_filter(b.bs, x -> x < score)) AS bucket,
             score, y
      FROM q, b),
g AS (SELECT bucket, count(*) AS n, sum(score) AS ssum,
             sum(y) AS n_pos,
             sum((score - y) * (score - y)) AS sq
      FROM a GROUP BY 1),
s AS (SELECT bucket, n, n_pos,
             ssum / n AS avg_s,
             n_pos * 1.0 / n AS obs,
             sum(abs(n_pos * 1.0 / n - ssum / n) * n) OVER ()
               / sum(n) OVER () AS ece,
             sum(sq) OVER () / sum(n) OVER () AS brier
      FROM g)
SELECT CAST(dense_rank() OVER (ORDER BY bucket) AS INTEGER) AS bucket,
       CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       round(avg_s, 6) AS avg_score,
       round(obs, 6) AS obs_rate,
       round(obs - avg_s, 6) AS gap,
       round(ece, 6) AS ece_total,
       round(brier, 6) AS brier_total
FROM s
"""

#: Candidate oracle for `events_acf_hourly` (relational.acf_binned of
#: the hourly event-count series, gap-filled zeros, lags 1..24).
ACF_HOURLY_SQL = """
WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS bin
           FROM events),
g AS (SELECT bin, count(*) AS n FROM e GROUP BY 1),
r AS (SELECT min(bin) AS lo, max(bin) AS hi FROM g),
filled AS (SELECT gs.bin, coalesce(g.n, 0) * 1.0 AS x
           FROM (SELECT unnest(generate_series(lo, hi)) AS bin FROM r) gs
           LEFT JOIN g USING (bin)),
st AS (SELECT avg(x) AS xbar, count(*) AS nb FROM filled),
c AS (SELECT bin, x - st.xbar AS cx FROM filled, st),
ss AS (SELECT sum(cx * cx) AS d FROM c),
pairs AS (SELECT CAST(b.bin - a.bin AS INTEGER) AS lag,
                 sum(a.cx * b.cx) AS num
          FROM c a JOIN c b
            ON b.bin > a.bin AND b.bin <= a.bin + 24
          GROUP BY 1)
SELECT p.lag,
       CAST(st.nb - p.lag AS BIGINT) AS n_pairs,
       round(p.num / ss.d, 6) AS acf
FROM pairs p, ss, st
"""

#: Candidate oracle for `nation_customer_gini`
#: (relational.gini_by_group of per-customer spend within each nation).
NATION_GINI_SQL = """
WITH per AS (SELECT o_custkey AS ck, sum(o_totalprice) AS spend
             FROM orders GROUP BY 1),
j AS (SELECT n.n_name, per.spend, per.ck
      FROM per JOIN customer c ON per.ck = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey),
r AS (SELECT n_name, spend,
             row_number() OVER (PARTITION BY n_name
                                ORDER BY spend, ck) AS i
      FROM j),
a AS (SELECT n_name, count(*) AS n, sum(spend) AS tot,
             sum(i * spend) AS iw
      FROM r GROUP BY 1)
SELECT n_name, CAST(n AS BIGINT) AS n_members,
       round(tot, 2) AS total_value,
       round(CASE WHEN tot > 0
                  THEN 2.0 * iw / (n * tot) - (n + 1.0) / n END,
             6) AS gini
FROM a
"""

#: Candidate oracle for `docs_wilson_quality` (relational.wilson_pass_rate
#: of the rule-gate pass rate per source, z = 1.96).
WILSON_QUALITY_SQL = f"""
WITH q AS (SELECT source,
             CASE WHEN len({SQL_TOKS}) BETWEEN 20 AND 1000
                   AND len(list_filter({SQL_TOKS},
                       t -> list_contains({_SQL_STOPS}, t))) * 1.0
                     / len({SQL_TOKS}) BETWEEN 0.01 AND 0.6
                  THEN 1 ELSE 0 END AS ok
           FROM documents WHERE len({SQL_TOKS}) > 0),
a AS (SELECT source, count(*) AS n, sum(ok) AS n_pass FROM q GROUP BY 1)
SELECT source, CAST(n AS BIGINT) AS n,
       CAST(n_pass AS BIGINT) AS n_pass,
       round(n_pass * 1.0 / n, 6) AS pass_rate,
       round((n_pass * 1.0 / n + 1.96 * 1.96 / (2 * n)
              - 1.96 * sqrt((n_pass * 1.0 / n) * (1 - n_pass * 1.0 / n) / n
                            + 1.96 * 1.96 / (4.0 * n * n)))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_lower
FROM a
"""


def test_seasonal_outliers_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.seasonal_outliers(
        ev.select("event_id", "ts_ms", "value"),
        ts="ts_ms", value="value", id_col="event_id",
        period_ms=3_600_000, cycle=24, z_thresh=3.0, min_n=8)
    n = _compare(spark, sdf, SEASONAL_OUTLIERS_SQL)
    assert n >= 5  # 14 at sf0.001 — heavy-tailed value column


def test_kfold_audit_spec_proven(spark):
    o = catalog.load_table(spark, "orders", SF)
    sdf = relational.kfold_assignment_audit(
        o.select("o_orderkey", "o_orderpriority"),
        id_col="o_orderkey", stratum="o_orderpriority", k=5, seed="fold")
    n = _compare(spark, sdf, KFOLD_AUDIT_SQL)
    assert n == 25  # 5 folds x 5 priorities


def test_calibration_spec_proven(spark):
    d = catalog.load_table(spark, "documents", SF)
    toked = dedup.tokenized(d, "doc_id", "text", extra_cols=("text",))
    toks, text = F.col("__toks"), F.col("text")
    base = toked.filter(F.size("__toks") > 0).select(
        F.round(texts.quality_score_of(text, toks), 4).alias("score"),
        (F.size(toks).between(20, 1000)
         & texts.stopword_ratio_of(toks).between(0.01, 0.6)).alias("y"))
    sdf = relational.calibration_bins(base, "score", F.col("y"), bins=10)
    n = _compare(spark, sdf, CALIBRATION_SQL)
    assert 2 <= n <= 10


def test_acf_hourly_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.acf_binned(
        ev.select("ts_ms"), ts="ts_ms", bin_ms=3_600_000, max_lag=24)
    n = _compare(spark, sdf, ACF_HOURLY_SQL)
    assert n == 24


def test_nation_gini_spec_proven(spark):
    o = catalog.load_table(spark, "orders", SF)
    c = catalog.load_table(spark, "customer", SF)
    nat = catalog.load_table(spark, "nation", SF)
    per = (o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
           .join(c.select("c_custkey", "c_nationkey"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(nat.select("n_nationkey", "n_name")),
                 F.col("c_nationkey") == F.col("n_nationkey")))
    sdf = relational.gini_by_group(
        per.select("n_name", "spend", "c_custkey"),
        group="n_name", value="spend", id_col="c_custkey")
    n = _compare(spark, sdf, NATION_GINI_SQL)
    assert n == 25  # every nation has ordering customers at sf0.001


def test_wilson_quality_spec_proven(spark):
    d = catalog.load_table(spark, "documents", SF)
    toked = dedup.tokenized(d, "doc_id", "text",
                            extra_cols=("text", "source"))
    toks = F.col("__toks")
    base = toked.filter(F.size("__toks") > 0).select(
        "source",
        (F.size(toks).between(20, 1000)
         & texts.stopword_ratio_of(toks).between(0.01, 0.6)).alias("ok"))
    sdf = relational.wilson_pass_rate(base, "source", F.col("ok"), z=1.96)
    n = _compare(spark, sdf, WILSON_QUALITY_SQL)
    assert n == 20  # 20 sources in the fixture


#: Candidate oracle for `events_session_top_paths`
#: (relational.session_top_paths: top event-type trigram journeys within
#: DAILY sessions — the 30-minute gap of the graded sessionize query
#: leaves almost no 3-event runs at fixture time-density, so the path
#: query sessionizes at a 24 h gap: 791 trigram runs at sf0.001). Nested-window-free: the lag,
#: the running session-id sum, and the leads are staged in separate CTEs
#: (DuckDB rejects nested window calls).
SESSION_TOP_PATHS_SQL = """
WITH e AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
                  event_id, event_type
           FROM events),
l AS (SELECT *, CASE WHEN ts_ms - lag(ts_ms) OVER
                     (PARTITION BY user_id ORDER BY ts_ms, event_id)
                     > 86400000 THEN 1 ELSE 0 END AS nw
      FROM e),
s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id
                              ORDER BY ts_ms, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM l),
t AS (SELECT event_type AS t0,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2,
             sid,
             lead(sid, 1) OVER w AS sid1,
             lead(sid, 2) OVER w AS sid2
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
g AS (SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n
      FROM t
      WHERE sid1 = sid AND sid2 = sid
        AND t0 IS NOT NULL AND t1 IS NOT NULL AND t2 IS NOT NULL
      GROUP BY 1)
SELECT path, CAST(n AS BIGINT) AS n_occurrences,
       round(n / (sum(n) OVER ()), 6) AS share
FROM g
ORDER BY n DESC, path
LIMIT 20
"""


def test_session_top_paths_spec_proven(spark):
    ev = catalog.load_table(spark, "events", SF)
    sdf = relational.session_top_paths(
        ev.select("user_id", "ts_ms", "event_id", "event_type"),
        key="user_id", ts="ts_ms", type_col="event_type",
        id_col="event_id", gap=86_400_000, path_len=3, top=20)
    n = _compare(spark, sdf, SESSION_TOP_PATHS_SQL)
    assert n == 20  # 5 event types -> plenty of distinct trigrams
