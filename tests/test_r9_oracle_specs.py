"""Pre-validation of the round-9 registry candidates' DuckDB oracles
(docs/BACKLOG.md): each test runs the banked operator's query shape on
Spark AND the proposed oracle SQL on DuckDB over the same fixture
parquet, comparing with the harness's canonicalization — so the r9
registration is a copy-paste of a proven pair, not a first draft.
"""

import math

import duckdb
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.operators import dedup, relational
from data_pipeline_eng_project_1_spark.sources import catalog

SF = "/root/testdata/sf0.001"


def _duck(sf=SF):
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def _compare(sdf, con, sql):
    srows = [tuple(r) for r in sdf.collect()]
    drows = con.execute(sql).fetchall()
    dcols = [d[0] for d in con.description]
    assert sorted(sdf.columns) == sorted(dcols), (sdf.columns, dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    a, b = _canon(srows, sdf.columns), _canon(drows, dcols)
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, mism[:3]
    return len(a)


MULTI_TOUCH_SQL = """
WITH e AS (SELECT event_id, user_id, event_type,
                  epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
           FROM events),
conv AS (SELECT user_id, ts_ms, event_id FROM e
         WHERE event_type = 'purchase'),
t AS (SELECT user_id, ts_ms, event_id, event_type FROM e
      WHERE event_type IN ('view', 'click')),
p AS (
  SELECT c.user_id,
         c.event_id AS conversion_id, c.ts_ms AS conversion_ts,
         t.event_id AS touch_id, t.event_type AS touch_type,
         t.ts_ms AS touch_ts,
         count(*) OVER (PARTITION BY c.event_id) AS n,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY t.ts_ms, t.event_id) AS pos
  FROM conv c JOIN t
    ON t.user_id = c.user_id
   AND t.ts_ms <= c.ts_ms AND t.ts_ms >= c.ts_ms - 3600000
)
SELECT user_id, conversion_id, conversion_ts,
       touch_id, touch_type, touch_ts,
       CAST(n AS INTEGER) AS n_touches,
       round(CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN pos = 1 OR pos = n THEN 0.4
                  ELSE 0.2 / (n - 2) END, 6) AS credit
FROM p
"""


def test_multi_touch_attribution_oracle_spec(spark):
    # sf0.01: the denser event stream yields hundreds of attributed
    # pairs (sf0.001 has only ~8 — too thin to exercise the credit CASE)
    sf = "/root/testdata/sf0.01"
    ev = catalog.load_table(spark, "events", sf)
    out = relational.attribute_multi_touch(
        ev.select("event_id", "user_id", "ts_ms", "event_type"),
        conversion_type="purchase", touch_types=["view", "click"],
        horizon=3_600_000, model="u_shaped")
    sdf = out.select(
        "user_id", "conversion_id", "conversion_ts", "touch_id",
        "touch_type", "touch_ts", "n_touches",
        F.round("credit", 6).alias("credit"))
    n = _compare(sdf, _duck(sf), MULTI_TOUCH_SQL)
    assert n > 50  # enough pairs to exercise every credit branch


VOCAB_GROWTH_SQL = """
WITH rng AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
d AS (
  SELECT doc_id,
         ((doc_id - rng.lo) * 8) // (rng.hi - rng.lo + 1) AS b,
         list_filter(string_split(text, ' '), x -> x != '') AS toks
  FROM documents, rng
),
tok_b AS (
  SELECT b, max(doc_id) AS hi_id, count(*) AS nd,
         sum(len(toks)) AS nt
  FROM d GROUP BY b
),
firsts AS (
  SELECT ((fid - rng.lo) * 8) // (rng.hi - rng.lo + 1) AS b,
         count(*) AS nv
  FROM (SELECT min(doc_id) AS fid
        FROM (SELECT doc_id, unnest(toks) AS t FROM d)
        GROUP BY t), rng
  GROUP BY 1
)
SELECT CAST(tok_b.b + 1 AS INTEGER) AS checkpoint,
       CAST(hi_id AS BIGINT) AS hi_id,
       CAST(sum(nd) OVER w AS BIGINT) AS n_docs_cum,
       CAST(sum(nt) OVER w AS BIGINT) AS n_tokens_cum,
       CAST(sum(coalesce(nv, 0)) OVER w AS BIGINT) AS vocab_cum
FROM tok_b LEFT JOIN firsts ON tok_b.b = firsts.b
WINDOW w AS (ORDER BY tok_b.b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def test_vocab_growth_curve_oracle_spec(spark):
    docs = catalog.load_table(spark, "documents", SF)
    sdf = dedup.vocab_growth_curve(docs, checkpoints=8)
    n = _compare(sdf, _duck(), VOCAB_GROWTH_SQL)
    assert n >= 4


SPLIT_ACCOUNTING_SQL = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN len(list_filter(string_split(text, ' '),
                                   x -> x != '')) > 0
              THEN {score} END AS score
  FROM documents
),
r AS (SELECT doc_id, coalesce(score >= 0.5, FALSE) AS keep FROM s)
SELECT keep,
       CAST(count(*) AS BIGINT) AS n_docs,
       md5(string_agg(CAST(doc_id AS VARCHAR), ','
           ORDER BY CAST(doc_id AS VARCHAR))) AS ids_md5
FROM r GROUP BY keep
"""


def test_split_accounting_oracle_spec(spark):
    from data_pipeline_eng_project_1_spark.functions import texts
    from data_pipeline_eng_project_1_spark.plans.llm_ops import (
        SQL_TOKS,
        _QC_W,
        _SQL_STOPS,
    )

    docs = catalog.load_table(spark, "documents", SF)
    toks = texts.tokens(F.col("text"))
    score = F.when(F.size(toks) > 0,
                   texts.quality_score_of(F.col("text"), toks))
    sdf = (docs
           .withColumn("keep", F.coalesce(score >= 0.5, F.lit(False)))
           .groupBy("keep")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.md5(F.encode(F.concat_ws(",", F.sort_array(
                    F.collect_list(F.col("doc_id").cast("string")))),
                    "UTF-8")).alias("ids_md5")))
    score_sql = (f"1.0 / (1.0 + exp(-({_QC_W['bias']}"
                 f" + {_QC_W['stop']} * (len(list_filter({SQL_TOKS},"
                 f" t -> list_contains({_SQL_STOPS}, t))) * 1.0"
                 f" / len({SQL_TOKS}))"
                 f" + {_QC_W['punct']} * ((length(lower(text))"
                 f" - length(regexp_replace(lower(text),"
                 f" '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(text))"
                 f" + {_QC_W['alen']} * (length(replace(text, ' ', ''))"
                 f" * 1.0 / len({SQL_TOKS}))"
                 f" + {_QC_W['lntok']} * ln(len({SQL_TOKS})))))")
    n = _compare(sdf, _duck(),
                 SPLIT_ACCOUNTING_SQL.replace("{score}", score_sql))
    assert n == 2


def _kmeans_unrolled_sql(k: int, iters: int, dim: int) -> str:
    """The r9 oracle shape for kmeans_lloyd: ORDER BY id LIMIT k init,
    then per iteration one assignment CTE (row_number argmin over the
    vector x centroid cross join — smallest-cell ties) and one update
    CTE (per-dim AVG via position unnest, ROUNDED to 6 — the same
    handoff the Spark trainer re-broadcasts)."""
    dist = ("list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            "list_transform(generate_series(1, {dim}), "
            "i -> (v[i] - c[i]) * (v[i] - c[i]))), (a, x) -> a + x)"
            .format(dim=dim))
    sql = [f"""
WITH base AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cell,
         list_transform(v, x -> round(x, 6)) AS c
  FROM (SELECT id, v FROM base ORDER BY id LIMIT {k})
)"""]
    prev = "c0"
    for r in range(1, iters + 1):
        sql.append(f""",
a{r} AS (
  SELECT id, v, cell, d FROM (
    SELECT b.id, b.v, {prev}.cell, {dist.replace('c[i]', f'{prev}.c[i]')} AS d,
           row_number() OVER (PARTITION BY b.id
                              ORDER BY {dist.replace('c[i]', f'{prev}.c[i]')},
                                       {prev}.cell) AS rn
    FROM base b CROSS JOIN {prev}
  ) WHERE rn = 1
),
c{r} AS (
  SELECT cell, list(m ORDER BY i) AS c FROM (
    SELECT cell, i, round(avg(v[i]), 6) AS m
    FROM a{r}, unnest(generate_series(1, {dim})) AS t(i)
    GROUP BY cell, i
  ) GROUP BY cell
  UNION ALL
  SELECT p.cell, p.c FROM {prev} p
  WHERE p.cell NOT IN (SELECT DISTINCT cell FROM a{r})
)""")
        prev = f"c{r}"
    sql.append(f"""
SELECT b.id, fin.cell, round(fin.d, 6) AS dist FROM (
  SELECT b2.id AS id, {prev}.cell,
         {dist.replace('v[i]', 'b2.v[i]').replace('c[i]', f'{prev}.c[i]')} AS d,
         row_number() OVER (PARTITION BY b2.id
                            ORDER BY {dist.replace('v[i]', 'b2.v[i]').replace('c[i]', f'{prev}.c[i]')},
                                     {prev}.cell) AS rn
  FROM base b2 CROSS JOIN {prev}
) fin JOIN base b ON b.id = fin.id
WHERE fin.rn = 1""")
    return "".join(sql)


def test_kmeans_lloyd_unrolled_cte_oracle_spec(spark):
    """The unrolled-CTE oracle replays the distributed trainer exactly:
    same init, same rounded centroid handoff per iteration, same
    smallest-cell argmin ties — final per-vector (cell, dist) must
    hash-match (the centroids themselves are implied by the agreement
    of every assignment and distance)."""
    from data_pipeline_eng_project_1_spark.operators import similarity

    emb = catalog.load_table(spark, "embeddings", SF)
    _, assign = similarity.kmeans_lloyd(emb, k=4, iters=2, dim=64)
    n = _compare(assign, _duck(), _kmeans_unrolled_sql(k=4, iters=2, dim=64))
    assert n == emb.count()
