"""Driver-facing query registry: every operator of SURVEY.md §2 as a named
query over the fixture tables, each paired with the exact DuckDB SQL oracle.

Conventions that make the oracle hash-compare deterministic:

- every computed column is aliased IDENTICALLY on both sides;
- double aggregates are wrapped in round(x, 2|4|6) on both sides — decimal
  rounding absorbs the last-ulp differences of different summation orders;
- timestamps never appear raw in output: they become epoch-millis BIGINT
  (``unix_millis`` / ``epoch_ms``) — exact integers on both engines;
- derived integers are cast to the same width on both sides (Spark INT ↔
  DuckDB INTEGER, Spark LONG ↔ DuckDB BIGINT);
- every ORDER BY that feeds a LIMIT or row_number carries a unique
  tiebreaker column.

Scale posture (local-mode numbers test correctness; the plan shapes are the
100 TB story): dimension tables are broadcast, fact-fact joins shuffle on
their keys once, aggregations are partial+final (Spark default), windows
shuffle once on their partition keys, and no builder ever collects.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.functions import hashing, texts, vectors
from data_pipeline_eng_project_1_spark.operators import relational
from data_pipeline_eng_project_1_spark.plans.registry import (
    QuerySpec,
    all_specs,
    register as _register,
)
from data_pipeline_eng_project_1_spark.sources import catalog


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Filters / projections / casts (SURVEY.md §2.2-2.3)
# ---------------------------------------------------------------------------

@_register(
    "filter_project_cast",
    """
    SELECT o_orderkey,
           o_custkey,
           CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_class,
           upper(o_orderstatus) AS status_u,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000
    """,
    doc="filter_status + project_keep + cast (dags/utils.py:83-105 analogue)",
)
def _q_filter_project_cast(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
        .select(
            "o_orderkey",
            "o_custkey",
            F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_class"),
            F.upper("o_orderstatus").alias("status_u"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("total_cents"),
        )
    )


@_register(
    "pricing_summary_agg",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-filter + hash agg (partial+final, map-side combine)",
)
def _q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "group_distinct_agg",
    """
    SELECT o_orderpriority,
           count(*)                    AS n_orders,
           count(DISTINCT o_custkey)   AS n_customers,
           round(avg(o_totalprice), 2) AS avg_price,
           round(max(o_totalprice), 2) AS max_price,
           round(min(o_totalprice), 2) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="aggregation with exact distinct (two-phase hash agg)",
)
def _q_group_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.7 — the star schema the reference links by zip)
# ---------------------------------------------------------------------------

@_register(
    "join_topk_revenue",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           epoch_ms(o_orderdate) AS odate_ms
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + agg + global top-k (TakeOrderedAndProject)",
)
def _q_join_topk_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue",
                # parquet ts is TIMESTAMP_NTZ; session TZ is UTC so the cast
                # to (LTZ) timestamp is exact and unix_millis applies.
                F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("odate_ms"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_register(
    "star_join_region_revenue",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 5-way star join; dims broadcast, facts shuffle once",
)
def _q_star_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@_register(
    "semi_anti_customers",
    """
    WITH flags AS (
      SELECT c_custkey, c_nationkey,
             EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
      FROM customer c
    )
    SELECT n_name,
           count(*) FILTER (WHERE has_order)     AS n_with_orders,
           count(*) FILTER (WHERE NOT has_order) AS n_without_orders
    FROM flags JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
    doc="left-semi (EXISTS) + left-anti (NOT EXISTS) joins per nation",
)
def _q_semi_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    n = _t(spark, sf_dir, "nation")
    semi = (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .groupBy("c_nationkey").agg(F.count("*").alias("n_with_orders")))
    anti = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_nationkey").agg(F.count("*").alias("n_without_orders")))
    both = (
        semi.join(anti, "c_nationkey", "full_outer")
        .na.fill({"n_with_orders": 0, "n_without_orders": 0})
    )
    return (
        both.join(F.broadcast(n), both.c_nationkey == n.n_nationkey)
        .select("n_name", "n_with_orders", "n_without_orders")
    )


@_register(
    "conditional_promo_ratio",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: broadcast join + CASE WHEN conditional aggregate",
)
def _q_conditional_promo(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev), 4).alias("promo_pct"))
    )


# ---------------------------------------------------------------------------
# Windows / sort / limit / set ops / grouping sets (SURVEY.md §2.7)
# ---------------------------------------------------------------------------

@_register(
    "window_latest_per_key",
    """
    SELECT o_custkey, o_orderkey AS last_orderkey,
           epoch_ms(o_orderdate) AS odate_ms,
           round(o_totalprice, 2) AS last_price
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
    doc="latest-per-key window dedup (the ORDER BY DATE_LOAD DESC LIMIT 1 "
        "read-back of dags/utils.py:215, done right)",
)
def _q_window_latest(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    out = relational.latest_per_key(
        o, ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()])
    return out.select(
        "o_custkey",
        F.col("o_orderkey").alias("last_orderkey"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("odate_ms"),
        F.round("o_totalprice", 2).alias("last_price"),
    )


@_register(
    "window_running_rank",
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rank,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    WHERE o_custkey <= 500
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="ranking + running aggregate in one window shuffle",
)
def _q_window_running(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 500)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rank"),
        F.round(F.sum("o_totalprice").over(run), 2).alias("running_spend"),
    )


@_register(
    "window_range_moving_avg",
    """
    WITH d AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(epoch_ms(o_orderdate) / 86400000) AS BIGINT) AS day,
             o_totalprice
      FROM orders WHERE o_custkey <= 200
    )
    SELECT o_orderkey, o_custkey, day,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY day
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS avg_30d
    FROM d
    """,
    doc="RANGE-frame window (30-day moving average per customer): the frame "
        "is defined by the ORDER-BY value, not row position, so same-day "
        "ties share one deterministic frame — no tiebreaker needed",
)
def _q_window_range_moving_avg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    d = o.select(
        "o_orderkey", "o_custkey",
        # o_orderdate is TIMESTAMP_NTZ; session TZ is UTC, so the cast is a
        # pure reinterpretation and epoch math matches DuckDB's epoch_ms.
        F.floor(F.unix_millis(F.col("o_orderdate").cast("timestamp"))
                / 86400000).cast("long").alias("day"),
        "o_totalprice")
    w = (Window.partitionBy("o_custkey").orderBy("day")
         .rangeBetween(-30, Window.currentRow))
    return d.select(
        "o_orderkey", "o_custkey", "day",
        F.round(F.avg("o_totalprice").over(w), 4).alias("avg_30d"))


@_register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="global top-k -> TakeOrderedAndProject (no full sort)",
)
def _q_sort_limit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        relational.topk_global(
            o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 25)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


@_register(
    "set_ops_custkeys",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="INTERSECT / EXCEPT set algebra",
)
def _q_set_ops(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    by = lambda s: o.filter(F.col("o_orderstatus") == s).select("o_custkey")
    return by("F").intersect(by("O")).exceptAll(by("P")).distinct()


@_register(
    "rollup_status_priority",
    """
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                          AS n,
           round(sum(o_totalprice), 2)       AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP grouping sets (subtotals + grand total in one pass)",
)
def _q_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total")
    )


@_register(
    "cube_nation_segment",
    """
    SELECT coalesce(CAST(c_nationkey AS INTEGER), -1) AS nationkey,
           coalesce(c_mktsegment, 'ALL')              AS segment,
           count(*)                                   AS n,
           round(sum(c_acctbal), 2)                   AS bal
    FROM customer
    GROUP BY CUBE (c_nationkey, c_mktsegment)
    """,
    doc="CUBE grouping sets (all 4 grouping combinations in one pass)",
)
def _q_cube(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.cube("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("c_acctbal"), 2).alias("bal"))
        .select(
            F.coalesce(F.col("c_nationkey").cast("int"), F.lit(-1)).alias("nationkey"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n", "bal")
    )


@_register(
    "approx_distinct_custkeys",
    """
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust_exact,
           TRUE AS approx_within_5pct,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="approx_count_distinct (HyperLogLog++): the mergeable-sketch form "
        "of group_distinct_agg for the 100 TB path — partial sketches merge "
        "map-side, no exact-distinct expansion; error ~2% at default rsd. "
        "HLL estimates differ across engines, so the hash-compared output "
        "is the engine-independent derived form: the exact count plus a "
        "boolean asserting Spark's sketch landed within 5% of it (the "
        "oracle asserts the exact count and TRUE)",
)
def _q_approx_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    # Two-level agg instead of countDistinct-beside-approx in one agg:
    # mixing exact-distinct and non-distinct aggregates makes Catalyst
    # plan an Expand (every input row duplicated per aggregate group —
    # 3.7x slower measured at sf0.1). Deduping to (priority, custkey)
    # grain first needs one extra shuffle but no Expand, and the HLL
    # sketch over the deduped keys is the SAME estimate (HLL is
    # duplicate-insensitive by construction).
    per_cust = (
        o.groupBy("o_orderpriority", "o_custkey")
        .agg(F.count("*").alias("__n"))
    )
    return (
        per_cust.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_cust_exact"),
             F.approx_count_distinct("o_custkey", 0.01).alias("__approx"),
             F.sum("__n").alias("n_orders"))
        .select(
            "o_orderpriority", "n_cust_exact",
            (F.abs(F.col("__approx") - F.col("n_cust_exact"))
             / F.col("n_cust_exact") <= 0.05).alias("approx_within_5pct"),
            "n_orders",
        )
    )


@_register(
    "above_avg_orders",
    """
    SELECT o.o_custkey, count(*) AS n_above
    FROM orders o
    JOIN (SELECT o_custkey, avg(o_totalprice) AS avg_price
          FROM orders GROUP BY o_custkey) a
      ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_price
    GROUP BY o.o_custkey
    """,
    doc="correlated-subquery pattern (orders above their customer's own "
        "average) decorrelated into an aggregate+self-join — the plan "
        "Catalyst produces for the correlated SQL form too",
)
def _q_above_avg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_above"))
    )


@_register(
    "grouping_sets_status_priority",
    """
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                          AS n,
           round(sum(o_totalprice), 2)       AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="explicit GROUPING SETS (arbitrary grouping combinations — the "
        "general form ROLLUP/CUBE specialize)",
)
def _q_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets([["o_orderstatus"], ["o_orderpriority"], []],
                       "o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total")
    )


@_register(
    "skew_salted_join",
    """
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="salted fact⋈dim join: hot join keys spread over 8 salt partitions "
        "(operators/relational.py::salted_join); result identical to the "
        "plain join, so the oracle is the plain join",
)
def _q_skew_salted_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    return (
        relational.salted_join(li, p, "l_partkey", salt=8)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2).alias("revenue"),
            F.count("*").alias("n_items"))
    )


@_register(
    "quantiles_per_priority",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="exact interpolated percentiles per group (Spark percentile() ≡ "
        "DuckDB quantile_cont; the 100 TB path swaps in approx_percentile, "
        "a mergeable KLL-style sketch, at the same call site)",
)
def _q_quantiles(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@_register(
    "stats_agg_lineitem",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 2)              AS sd_qty,
           round(var_samp(l_quantity), 2)                 AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4)    AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 3)   AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="statistical aggregates (stddev/variance/correlation/covariance)",
)
def _q_stats_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 2).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 3).alias("cov_qty_disc"),
    )


@_register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'size' AS metric,
           round(CAST(p_size AS DOUBLE), 2) AS val
    FROM part WHERE p_partkey <= 50
    UNION ALL
    SELECT p_partkey, 'retail' AS metric, round(p_retailprice, 2) AS val
    FROM part WHERE p_partkey <= 50
    """,
    doc="unpivot/melt wide→long (df.unpivot; oracle mirrors via UNION ALL)",
)
def _q_unpivot(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retail"))
        .unpivot(["p_partkey"], ["size", "retail"], "metric", "v")
        .select("p_partkey", "metric", F.round("v", 2).alias("val"))
    )


@_register(
    "pivot_returnflag",
    """
    SELECT l_linestatus,
           round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 2) AS "A",
           round(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 2) AS "N",
           round(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 2) AS "R"
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="pivot (wide conditional aggregate)",
)
def _q_pivot(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_linestatus",
        F.round("A", 2).alias("A"),
        F.round("N", 2).alias("N"),
        F.round("R", 2).alias("R"),
    )


# ---------------------------------------------------------------------------
# Scalar function library (SURVEY.md §2.7): strings, dates, nulls
# ---------------------------------------------------------------------------

@_register(
    "string_funcs_part",
    """
    SELECT p_partkey,
           upper(p_brand)                          AS brand_u,
           substr(p_name, 1, 5)                    AS name5,
           CAST(length(p_name) AS BIGINT)          AS name_len,
           replace(p_type, 'ECONOMY', 'ECO')       AS type_s,
           concat(p_brand, ':', p_type)            AS brand_type
    FROM part
    WHERE p_name LIKE '%bolt%' AND regexp_matches(p_name, '^(red|blue|small)')
    """,
    doc="string scalar functions + LIKE + regexp predicate",
)
def _q_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%bolt%")
                 & F.regexp_like("p_name", F.lit("^(red|blue|small)")))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.length("p_name").cast("long").alias("name_len"),
            F.regexp_replace("p_type", "ECONOMY", "ECO").alias("type_s"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        )
    )


@_register(
    "date_parts_orders",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER)    AS y,
           CAST(month(o_orderdate) AS INTEGER)   AS m,
           count(*)                              AS n,
           round(sum(o_totalprice), 2)           AS total
    FROM orders
    GROUP BY 1, 2
    """,
    doc="date-part extraction + temporal grouping",
)
def _q_date_parts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@_register(
    "null_conditional_agg",
    """
    SELECT c_nationkey,
           count(*)                                                       AS n_cust,
           count(CASE WHEN c_acctbal < 0 THEN 1 END)                      AS n_negative,
           round(coalesce(avg(CASE WHEN c_acctbal >= 0 THEN c_acctbal END), 0.0), 4)
                                                                          AS avg_positive_bal
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="null-aware conditional aggregation + coalesce",
)
def _q_null_conditional(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        F.round(
            F.coalesce(F.avg(F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal"))),
                       F.lit(0.0)), 4).alias("avg_positive_bal"),
    )


# ---------------------------------------------------------------------------
# Events: JSON props, tumbling windows, sessionization, as-of join
# ---------------------------------------------------------------------------

@_register(
    "events_json_extract",
    """
    SELECT event_type,
           count(*)                                                       AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))        AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="semi-structured JSON column probing (get_json_object ≙ the "
        "reference's nested-JSON field access, dags/utils.py:158-162)",
)
def _q_events_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@_register(
    "events_tumbling_1h",
    """
    SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000 AS bucket_ms,
           event_type,
           count(*)              AS n,
           round(sum(value), 2)  AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h time-window aggregate (batch form of the streaming op)",
)
def _q_events_tumbling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_millis("w.start").alias("bucket_ms"),
                "event_type", "n", "sum_value")
    )


@_register(
    "events_sliding_1h_15m",
    """
    WITH e AS (
      SELECT event_type, value,
             epoch_ms(CAST(ts AS TIMESTAMP)) AS tms
      FROM events
    ),
    b AS (
      SELECT event_type, value,
             ((tms // 900000) - k) * 900000 AS bucket_ms
      FROM e, unnest(generate_series(0, 3)) AS t(k)
    )
    SELECT bucket_ms, event_type,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM b GROUP BY 1, 2
    """,
    doc="sliding 1h window every 15m (batch form of "
        "streaming/pipeline.py::sliding_counts): each event lands in "
        "exactly window/slide = 4 epoch-aligned buckets, so the oracle "
        "replays Spark's window assignment as an explicit 4-way "
        "generate_series fan-out. The fan-out multiplies rows BEFORE the "
        "agg's map-side combine, so the shuffle still carries only "
        "(bucket, type) partials — overlap factor is a constant, not a "
        "data-volume multiplier, at any scale",
)
def _q_events_sliding(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                   "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_millis("w.start").alias("bucket_ms"),
                "event_type", "n", "sum_value")
    )


@_register(
    "events_sessionize",
    """
    WITH g AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
                       - lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id)
                       > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    SELECT user_id,
           CAST(sum(is_new) + 1 AS BIGINT) AS n_sessions,
           count(*)                        AS n_events
    FROM g GROUP BY user_id
    """,
    doc="sessionization: lag + gap threshold (30 min), one window shuffle",
)
def _q_events_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    s = relational.sessionize(ev, "user_id", "ts_ms", 1800000, "event_id")
    return s.groupBy("user_id").agg(
        (F.max("session_id") + 1).cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@_register(
    "events_asof_click",
    """
    WITH p AS (SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.ts_ms, c.ts_ms AS last_click_ms
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts_ms >= c.ts_ms
    """,
    doc="as-of (backward) join: purchase ← latest prior click per user; "
        "union+window formulation, single shuffle, no UDF",
)
def _q_events_asof(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms", "event_id")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ms").alias("click_ms"))
    out = relational.asof_join(
        p, c, on="user_id", left_ts="ts_ms", right_ts="click_ms",
        right_value="click_ms", out_col="last_click_ms")
    return out.select("event_id", "ts_ms", "last_click_ms")


@_register(
    "events_range_join_1h",
    """
    WITH p AS (SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
               FROM events WHERE event_type = 'click')
    SELECT p.event_id, count(c.ts_ms) AS n_clicks_1h
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id
     AND c.ts_ms >= p.ts_ms - 3600000 AND c.ts_ms < p.ts_ms
    GROUP BY p.event_id
    """,
    doc="range (interval) join: clicks in the hour before each purchase, "
        "binned into a shuffled equi-join on (user, time-bucket) instead of "
        "the O(n·m) inequality join Spark would otherwise plan",
)
def _q_range_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ms")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ms").alias("click_ms"))
    pairs = relational.binned_range_join(
        p, c, on="user_id", left_ts="ts_ms", right_ts="click_ms",
        lower=-3600000, upper=0)
    counts = pairs.groupBy("event_id").agg(F.count("*").alias("n_clicks_1h"))
    return (
        p.select("event_id").join(counts, "event_id", "left")
        .na.fill({"n_clicks_1h": 0})
    )


@_register(
    "events_rollup_multigrain",
    """
    SELECT day_ms, coalesce(hour_ms, -1) AS hour_ms,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM (SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000) * 86400000 AS day_ms,
                 (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000   AS hour_ms,
                 value
          FROM events)
    GROUP BY GROUPING SETS ((day_ms), (day_ms, hour_ms))
    """,
    doc="hypertable-style multi-granularity rollup: hourly + daily buckets "
        "in ONE scan via GROUPING SETS (continuous-aggregate pattern)",
)
def _q_rollup_multigrain(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        F.expr("(ts_ms DIV 86400000) * 86400000").alias("day_ms"),
        F.expr("(ts_ms DIV 3600000) * 3600000").alias("hour_ms"),
        "value",
    )
    return (
        b.groupingSets([["day_ms"], ["day_ms", "hour_ms"]], "day_ms", "hour_ms")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select("day_ms",
                F.coalesce("hour_ms", F.lit(-1)).alias("hour_ms"),
                "n", "sum_value")
    )


@_register(
    "events_hourly_retention",
    """
    WITH hours AS (
        SELECT DISTINCT user_id,
               epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS h
        FROM events
    )
    SELECT CAST(a.h * 3600000 AS BIGINT) AS hour_ms,
           count(*)                      AS n_retained
    FROM hours a JOIN hours b
      ON a.user_id = b.user_id AND b.h = a.h + 1
    GROUP BY a.h
    """,
    doc="cohort retention: users active in hour H who return in H+1 — "
        "dedup to (user, hour) grain (one shuffle), then lead(h) over "
        "each user's hour sequence marks consecutive-hour returns: one "
        "scan, no self-join, no second evaluation of the distinct "
        "subtree. The window shuffles on user_id only; at 100 TB both "
        "exchanges carry the deduped grain, not raw events.",
)
def _q_events_hourly_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hours = ev.select(
        "user_id",
        F.expr("ts_ms DIV 3600000").alias("h"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("h")
    return (
        hours.withColumn("__next", F.lead("h").over(w))
        .filter(F.col("__next") == F.col("h") + 1)
        .groupBy((F.col("h") * 3600000).cast("long").alias("hour_ms"))
        .agg(F.count("*").alias("n_retained"))
    )


@_register(
    "events_gap_fill",
    """
    WITH hourly AS (
      SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS h,
             sum(value) AS v
      FROM events WHERE user_id < 20 GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(h) AS lo, max(h) AS hi
             FROM hourly GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS h FROM span),
    j AS (SELECT g.user_id, g.h, hourly.v
          FROM grid g LEFT JOIN hourly USING (user_id, h))
    SELECT user_id, CAST(h * 3600000 AS BIGINT) AS hour_ms,
           round(last_value(v IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS value_filled,
           v IS NULL AS is_gap
    FROM j
    """,
    doc="time-series resample + gap fill (LOCF): per-user hourly sums on a "
        "dense hour grid spanning each user's observed range, missing "
        "hours carry the last observation forward. The grid fan-out is "
        "sequence+explode in the span row (no driver loop); the fill is "
        "operators/relational.py::locf_fill — the two-level segmented-scan "
        "form whose window frames are BOUNDED at bucket_size rows "
        "(LOCF within (user, day-bucket) + per-bucket-last carry-in), "
        "bit-identical to the oracle's single unbounded-frame window but "
        "safe for multi-year keys at 100 TB",
)
def _q_events_gap_fill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = (
        ev.groupBy("user_id", F.expr("ts_ms DIV 3600000").alias("h"))
        .agg(F.sum("value").alias("v"))
    )
    span = hourly.groupBy("user_id").agg(F.min("h").alias("lo"),
                                         F.max("h").alias("hi"))
    grid = span.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("h"))
    j = grid.join(hourly, ["user_id", "h"], "left")
    filled = relational.locf_fill(j, "user_id", "h", "v", bucket_size=24)
    return filled.select(
        "user_id",
        (F.col("h") * 3600000).cast("long").alias("hour_ms"),
        F.round("value_filled", 2).alias("value_filled"),
        F.col("v").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# Vectors / similarity search
# ---------------------------------------------------------------------------

@_register(
    "vector_norms",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2,
           label
    FROM embeddings
    """,
    doc="array math in codegen: per-vector L2 norm (no UDF)",
)
def _q_vector_norms(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(vectors.l2_norm(F.col("embedding")), 4).alias("l2"),
        "label",
    )


@_register(
    "late_shipment_priority",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape via the spark.sql string API over temp views — "
        "same Catalyst plan as the DataFrame form (fact-fact shuffle join "
        "on the order key, interval arithmetic in the join-side filter, "
        "conditional counts with map-side partial aggregation)",
)
def _q_late_shipment_priority(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM v_orders JOIN v_lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAYS
        GROUP BY l_returnflag
    """)


@_register(
    "try_cast_dirty",
    """
    SELECT p_partkey,
           try_cast(CASE WHEN p_partkey % 3 = 0
                         THEN CAST(p_size AS VARCHAR)
                         ELSE p_type END AS INTEGER) AS maybe_size,
           round(p_retailprice / nullif(CAST(p_size - 25 AS DOUBLE), 0), 4)
               AS price_per_adj
    FROM part
    """,
    doc="null-on-failure coercion under ANSI mode: try_cast over a "
        "dirty-numeric string column (≙ pandas errors='coerce', "
        "dags/utils.py:104-105) and try_divide for zero denominators — "
        "bad rows become NULL, never a job abort",
)
def _q_try_cast_dirty(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    dirty = F.when(F.col("p_partkey") % 3 == 0,
                   F.col("p_size").cast("string")).otherwise(F.col("p_type"))
    return p.select(
        "p_partkey",
        dirty.try_cast("int").alias("maybe_size"),
        F.round(
            F.try_divide("p_retailprice",
                         (F.col("p_size") - 25).cast("double")), 4
        ).alias("price_per_adj"),
    )


@_register(
    "topk_per_priority",
    """
    WITH r AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders
    )
    SELECT o_orderpriority, o_orderkey,
           round(o_totalprice, 2) AS total,
           CAST(rank AS INTEGER)  AS rank
    FROM r WHERE rank <= 3
    """,
    doc="per-key top-k via operators/relational.py::topk_per_key — one "
        "window shuffle on the key; the rank<=k filter drops rows before "
        "anything downstream, so per-group state never exceeds k",
)
def _q_topk_per_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    top = relational.topk_per_key(
        o, ["o_orderpriority"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")], k=3,
    )
    return top.select(
        "o_orderpriority", "o_orderkey",
        F.round("o_totalprice", 2).alias("total"),
        F.col("rank").cast("int").alias("rank"),
    )


@_register(
    "top_revenue_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1995-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev_cents / 100.0 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
    """,
    doc="TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue — "
        "a max-over-derived-aggregate scalar subquery, decorrelated into "
        "agg -> 1-row max -> broadcast filter (ties all surface, per spec). "
        "Revenue accumulates in integer CENTS (per-row round, BIGINT sum) "
        "so the max-equality filter is exact — a double sum would make "
        "'equals the max' depend on engine summation order at the last "
        "ulp. One lineitem scan with the date filter pushed down, one "
        "suppkey shuffle; rev feeds both the max and the join from the "
        "same exchange (ReuseExchange).",
)
def _q_top_revenue_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")
    rev = (
        li.filter((F.col("l_shipdate") >= "1995-01-01")
                  & (F.col("l_shipdate") < "1995-04-01"))
        .groupBy("l_suppkey")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    mx = rev.agg(F.max("rev_cents").alias("__mx"))
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("__mx"))
        .select("s_suppkey", "s_name",
                (F.col("rev_cents") / 100.0).alias("total_revenue"))
    )


@_register(
    "scalar_subquery_share",
    """
    WITH per AS (
        SELECT n_name, sum(o_totalprice) AS rev
        FROM orders
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT n_name,
           round(rev, 2) AS rev,
           round(rev / (SELECT sum(rev) FROM per), 6) AS share
    FROM per
    WHERE rev / (SELECT sum(rev) FROM per) > 0.04
    """,
    doc="TPC-H Q11 shape: HAVING against a global-total scalar subquery. "
        "Spark form: the one-row total is a broadcast nested-loop join "
        "(crossJoin of a 1-row aggregate) — no second scan of the fact "
        "table, no driver collect.",
)
def _q_scalar_subquery_share(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    total = per.agg(F.sum("rev").alias("total"))
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.col("rev") / F.col("total") > 0.04)
        .select(
            "n_name",
            F.round("rev", 2).alias("rev"),
            F.round(F.col("rev") / F.col("total"), 6).alias("share"),
        )
    )


@_register(
    "array_hof_stats",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_sum(list_transform(embedding,
                 x -> least(greatest(CAST(x AS DOUBLE), -0.25), 0.25))), 4)
               AS clipped_sum,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_c
    FROM embeddings
    """,
    doc="higher-order array functions (filter/transform/aggregate lambdas) "
        "— all inside codegen, zero Python. Fold order is left-to-right on "
        "both engines, so the clipped double sum is bit-identical.",
)
def _q_array_hof_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    clip = lambda x: F.least(F.greatest(x.cast("double"), F.lit(-0.25)),  # noqa: E731
                             F.lit(0.25))
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(
            F.aggregate("embedding", F.lit(0.0),
                        lambda acc, x: acc + clip(x)), 4
        ).alias("clipped_sum"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_c"),
    )


@_register(
    "window_lead_lag",
    """
    WITH seq AS (
        SELECT o_custkey, o_orderkey,
               epoch_ms(o_orderdate) AS odate_ms,
               lag(epoch_ms(o_orderdate))  OVER w AS prev_ms,
               lead(epoch_ms(o_orderdate)) OVER w AS next_ms
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, odate_ms,
           CAST(coalesce((odate_ms - prev_ms) // 86400000, -1) AS BIGINT) AS gap_days,
           CAST(coalesce((next_ms - odate_ms) // 86400000, -1) AS BIGINT) AS next_gap_days
    FROM seq
    """,
    doc="lead/lag window: inter-order gap per customer (one shuffle on o_custkey)",
)
def _q_window_lead_lag(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    seq = o.select(
        "o_custkey", "o_orderkey",
        ms.alias("odate_ms"),
        F.lag(ms).over(w).alias("prev_ms"),
        F.lead(ms).over(w).alias("next_ms"),
    )
    day = F.lit(86400000)
    return seq.select(
        "o_custkey", "o_orderkey", "odate_ms",
        F.coalesce(
            F.floor((F.col("odate_ms") - F.col("prev_ms")) / day), F.lit(-1)
        ).cast("long").alias("gap_days"),
        F.coalesce(
            F.floor((F.col("next_ms") - F.col("odate_ms")) / day), F.lit(-1)
        ).cast("long").alias("next_gap_days"),
    )


@_register(
    "ntile_spend_quartiles",
    """
    WITH spend AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    ), tiled AS (
        SELECT o_custkey, total_spend,
               ntile(4) OVER (ORDER BY total_spend DESC, o_custkey) AS quartile
        FROM spend
    )
    SELECT CAST(quartile AS INTEGER)   AS quartile,
           count(*)                    AS n_customers,
           round(avg(total_spend), 2)  AS avg_spend,
           round(min(total_spend), 2)  AS min_spend,
           round(max(total_spend), 2)  AS max_spend
    FROM tiled GROUP BY quartile
    """,
    doc="ntile global quantile bucketing WITHOUT the single-partition sort "
        "the naive `ntile(4) OVER (ORDER BY ...)` plans (Exchange "
        "SinglePartition — one task sees every customer; the canonical "
        "100 TB failure mode, plan-audited absent in tests/test_plans.py). "
        "Instead: operators.relational.dense_index range-partitions the "
        "spend table for a distributed global rank, and the exact ntile "
        "bucket is pure arithmetic on (rank, N) — first N%4 buckets get "
        "ceil(N/4) rows — reproducing SQL ntile semantics bit-for-bit. "
        "N is driver metadata the index's offsets pass already computed, "
        "folded in as a literal (dense_index_n).",
)
def _q_ntile_spend(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    ranked, n = relational.dense_index_n(
        spend, [F.desc("total_spend"), F.asc("o_custkey")])
    idx = F.col("idx")
    base, rem = n // 4, n % 4
    cut = rem * (base + 1)                      # rows in the fat buckets
    quartile = (
        F.when(idx < F.lit(cut), F.floor(idx / (base + 1)))
        .otherwise(F.lit(rem) + F.floor((idx - cut) / max(base, 1)))
        .cast("long") + 1
    )
    return (
        ranked
        .select("o_custkey", "total_spend", quartile.alias("quartile"))
        .groupBy(F.col("quartile").cast("int").alias("quartile"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("total_spend"), 2).alias("avg_spend"),
            F.round(F.min("total_spend"), 2).alias("min_spend"),
            F.round(F.max("total_spend"), 2).alias("max_spend"),
        )
    )


@_register(
    "posexplode_tokens",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE doc_id % 10 = 0
    ), flat AS (
        SELECT doc_id,
               CAST(unnest(range(len(t))) AS INTEGER) AS pos,
               unnest(t) AS token
        FROM toks
    )
    SELECT doc_id, pos, token
    FROM flat WHERE pos < 32 AND token <> ''
    """,
    doc="posexplode / LATERAL VIEW with ordinality: token position within "
        "document (generator runs inside codegen; no shuffle at all)",
)
def _q_posexplode_tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id",
                F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .filter((F.col("pos") < 32) & (F.col("token") != ""))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "token")
    )


@_register(
    "stringagg_nations",
    """
    SELECT r_name,
           count(*) AS n_nations,
           array_to_string(list(n_name ORDER BY n_name), ',') AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="ordered string aggregation (LISTAGG): collect_list is not "
        "order-stable in a distributed agg, so sort inside the group via "
        "array_sort before joining — deterministic on any partitioning",
)
def _q_stringagg_nations(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",")
             .alias("nations"),
        )
    )


# ---------------------------------------------------------------------------
# Classic multi-join / decorrelation shapes (TPC-H Q7/Q13/Q18/Q19/Q21/Q22
# analogues, adapted to the slimmed fixture schemas). The reference has no
# joins at all (SURVEY.md §2.7) — these are the engine-floor shapes the
# oracle exercises.
# ---------------------------------------------------------------------------

@_register(
    "nation_trade_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue,
           count(*)              AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: two broadcast nation dims aliased twice, "
        "lineitem-orders-customer shuffle joins, date-range pushdown to the "
        "lineitem scan; nation filters prune before the fact joins",
)
def _q_nation_trade_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "customer_order_histogram",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join with a join-side residual "
        "predicate, then a double aggregation (per-key count, then "
        "histogram of counts). count(o_orderkey) counts matched rows only",
)
def _q_customer_order_histogram(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@_register(
    "large_order_customers",
    """
    SELECT c_name, c_custkey, o_orderkey,
           epoch_ms(o_orderdate)     AS order_ms,
           round(o_totalprice, 2)    AS total,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 shape: IN-subquery over an aggregate becomes a "
        "left-semi join against the grouped fact (no decorrelation "
        "needed — the semi join shuffles on l_orderkey once, AQE can "
        "broadcast the small filtered side)",
)
def _q_large_order_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot_qty"))
        .filter(F.col("tot_qty") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
               "o_orderkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_ms"),
            F.round("o_totalprice", 2).alias("total"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@_register(
    "disjunctive_bracket_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 25 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunction of mixed-table predicate brackets. "
        "Catalyst pushes the derivable per-table disjunctions "
        "(brand/size to the part scan, quantity range union to lineitem) "
        "and keeps the cross-table OR as a post-join filter",
)
def _q_disjunctive_bracket_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(10, 30)
           & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(25, 50)
           & qty.between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "sole_blame_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (adapted: l_returnflag='R' stands in for the "
        "missing receiptdate>commitdate): correlated EXISTS / NOT EXISTS "
        "self-joins on the fact become one left-semi and one left-anti "
        "shuffle join on l_orderkey with a non-equi residual "
        "(l2.l_suppkey <> l1.l_suppkey)",
)
def _q_sole_blame_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("l2_orderkey"),
                   F.col("l_suppkey").alias("l2_suppkey"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("l3_orderkey"),
                F.col("l_suppkey").alias("l3_suppkey"))
    )
    blamed = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        blamed.join(o, blamed.l_orderkey == o.o_orderkey, "left_semi")
        .join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@_register(
    "rich_quiet_customers",
    """
    SELECT n_name AS nation, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY n_name
    """,
    doc="TPC-H Q22 shape (adapted: 'no URGENT orders' stands in for 'no "
        "orders' since every fixture customer has orders): uncorrelated "
        "scalar subquery broadcast as a one-row cross join, left-anti join "
        "against the filtered orders side. The scalar avg is rounded to 2 "
        "decimals on both engines so the > comparison cannot flip on "
        "last-ulp summation differences",
)
def _q_rich_quiet_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("u_custkey"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("u_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@_register(
    "orders_dense_index",
    """
    SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) - 1 AS idx
    FROM orders
    """,
    doc="global dense row numbering (operators.relational.dense_index): "
        "range-partition + local sort + Arrow-batched local enumeration + "
        "per-partition offsets. Equals row_number() OVER (ORDER BY ...) "
        "but never plans an Exchange SinglePartition — the whole-dataset "
        "single-task sort the naive window forces (plan-audited)",
)
def _q_orders_dense_index(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    return relational.dense_index(o, ["o_orderkey"])


@_register(
    "events_scd2_history",
    """
    WITH ordered AS (
      SELECT user_id, event_id,
             epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
             event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             row_number()    OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ), changes AS (
      SELECT user_id, event_id, ts_ms, event_type FROM ordered
      WHERE rn = 1 OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type,
           ts_ms AS effective_from,
           lead(ts_ms) OVER (PARTITION BY user_id
                             ORDER BY ts_ms, event_id) AS effective_to,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts_ms, event_id) AS BIGINT)
             AS version
    FROM changes
    """,
    doc="type-2 SCD history (operators.relational.scd2_history): collapse "
        "an event change-log to versioned validity intervals "
        "[effective_from, effective_to), open row has null end. Null-safe "
        "change detection; lag + filter + lead/row_number all reuse ONE "
        "hash shuffle on the key",
)
def _q_events_scd2_history(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_ms", "event_type")
    return relational.scd2_history(
        ev, key="user_id", ts="ts_ms", attrs=["event_type"],
        tiebreak="event_id")


@_register(
    "bloom_pruned_join",
    """
    SELECT s_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY s_name
    """,
    doc="explicit runtime filter (operators.relational.bloom_prune): the "
        "selective build side (suppliers of one nation) collapses to a "
        "broadcastable bit-position table that pre-filters lineitem "
        "map-side before the exact join. False positives are removed by "
        "the exact join, so the result equals the plain join — the bloom "
        "only shrinks the probe-side shuffle, which is the scale win when "
        "the build side is too large to broadcast exactly",
)
def _q_bloom_pruned_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    build = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey", "s_name")
    )
    pruned = relational.bloom_prune(
        li, build, "l_suppkey", "s_suppkey", n_bits=1 << 16, k=2)
    return (
        pruned.join(F.broadcast(build), pruned.l_suppkey == build.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "map_priority_counts",
    """
    SELECT o_custkey, priority, n,
           count(*) OVER (PARTITION BY o_custkey) AS n_priorities
    FROM (
      SELECT o_custkey, o_orderpriority AS priority, count(*) AS n
      FROM orders GROUP BY o_custkey, o_orderpriority
    )
    """,
    doc="map-typed operator surface: per-customer priority histogram built "
        "as a map<string,bigint> column (map_from_entries over "
        "collect_list(struct)), then exploded back to rows with "
        "map cardinality via size(). Oracle is the flat relational "
        "equivalent — the map is an engine-internal representation",
)
def _q_map_priority_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    per = (
        o.groupBy("o_custkey", F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n"))
    )
    mapped = (
        per.groupBy("o_custkey")
        .agg(F.map_from_entries(F.collect_list(F.struct("priority", "n")))
              .alias("prio_map"))
    )
    return mapped.select(
        "o_custkey",
        F.explode("prio_map").alias("priority", "n"),
        F.size("prio_map").cast("long").alias("n_priorities"),
    )


@_register(
    "small_qty_part_revenue",
    """
    WITH th AS (
      SELECT l_partkey, round(0.5 * avg(l_quantity), 6) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           round(sum(l_extendedprice), 2) AS below_avg_revenue,
           count(*)                       AS n_lines
    FROM lineitem l
    JOIN th USING (l_partkey)
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l_quantity < qty_thresh
    GROUP BY p_brand
    """,
    doc="TPC-H Q17 shape (correlated avg subquery, decorrelated): per-part "
        "avg-quantity threshold computed as ONE partial+final agg over the "
        "fact, joined back on the fact's own key (no re-shuffle of the "
        "threshold side beyond the agg's), part dim broadcast. The 100 TB "
        "plan: fact shuffles once on l_partkey, reused by agg AND join",
)
def _q_small_qty_part_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    thresh = (
        li.groupBy("l_partkey")
        .agg(F.round(F.avg("l_quantity") * 0.5, 6).alias("qty_thresh"))
    )
    return (
        li.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("below_avg_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "window_distribution",
    """
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume,
           CAST(ntile(10) OVER w AS INTEGER) AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="distribution window functions (percent_rank / cume_dist / ntile) "
        "in one single-shuffle window over the segment key; unique "
        "(acctbal, custkey) ordering makes ranks deterministic",
)
def _q_window_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


@_register(
    "grouped_zscore_pandas",
    """
    SELECT o_orderkey, o_orderpriority,
           round((o_totalprice - avg(o_totalprice)
                    OVER (PARTITION BY o_orderpriority))
                 / stddev_samp(o_totalprice)
                    OVER (PARTITION BY o_orderpriority), 6) AS z
    FROM orders
    """,
    doc="per-group z-score through the applyInPandas grouped-map Arrow "
        "path (operators/relational.py::grouped_zscore) — proves the "
        "Pandas-UDF escape hatch is oracle-exact, not just approximately "
        "right. The oracle is the native-SQL twin (window avg/stddev_samp); "
        "the unit test additionally pins the pandas path equal to Spark's "
        "own window algebra",
)
def _q_grouped_zscore(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    z = relational.grouped_zscore(o, "o_orderpriority", "o_totalprice")
    return z.select(
        "o_orderkey", "o_orderpriority", F.round("z", 6).alias("z"))


@_register(
    "regression_price_qty",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           regr_count(l_extendedprice, l_quantity)               AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="linear-regression aggregates (slope/intercept/r2/count) per "
        "return flag — single partial+final hash agg; the moment sums are "
        "map-side combined so the shuffle carries one row per flag",
)
def _q_regression_price_qty(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(price, qty), 4).alias("slope"),
        F.round(F.regr_intercept(price, qty), 4).alias("intercept"),
        F.round(F.regr_r2(price, qty), 6).alias("r2"),
        F.regr_count(price, qty).alias("n_pairs"),
    )


@_register(
    "events_funnel_conversion",
    """
    WITH e AS (SELECT user_id, event_type,
                      epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
               FROM events),
    v AS (SELECT user_id, min(ts_ms) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts_ms) AS t2, min(v.t1) AS t1
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts_ms > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts_ms) AS t3
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts_ms > c.t2
          GROUP BY e.user_id)
    SELECT CAST(v.user_id % 10 AS INTEGER) AS cohort,
           CAST(count(*) AS BIGINT) AS n_view,
           CAST(count(c.t2) AS BIGINT) AS n_click,
           CAST(count(p.t3) AS BIGINT) AS n_purchase,
           round(avg(CASE WHEN p.t3 IS NOT NULL
                          THEN (p.t3 - v.t1) / 1000.0 END), 2)
               AS avg_convert_s
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    GROUP BY v.user_id % 10
    """,
    doc="ordered event funnel (view -> later click -> later purchase) "
        "with per-cohort conversion counts and mean seconds-to-convert — "
        "the product-analytics staple that needs ORDER, not mere "
        "presence (a purchase before the first view must not count). "
        "Three user-keyed conditional min-aggregates chained by joins: "
        "every shuffle is on user_id, so AQE plans ONE exchange family "
        "and the stage-2/3 frames are per-user rows (collapsed "
        "grain, not raw events). At 100 TB the same shape holds — the "
        "funnel state per user is O(steps) longs, never an event list; "
        "timestamps compare as exact epoch-millis BIGINTs.",
)
def _q_events_funnel(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    e = ev.select("user_id", "event_type", "ts_ms")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts_ms").alias("t1")))
    c = (e.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts_ms") > F.col("t1"))
         .groupBy("user_id")
         .agg(F.min("ts_ms").alias("t2"), F.min("t1").alias("t1")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c.select("user_id", "t2"), "user_id")
         .filter(F.col("ts_ms") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts_ms").alias("t3")))
    return (
        v.join(c.select("user_id", "t2"), "user_id", "left")
        .join(p, "user_id", "left")
        .groupBy((F.col("user_id") % 10).cast("int").alias("cohort"))
        .agg(
            F.count("*").alias("n_view"),
            F.count("t2").alias("n_click"),
            F.count("t3").alias("n_purchase"),
            F.round(F.avg(F.when(F.col("t3").isNotNull(),
                                 (F.col("t3") - F.col("t1")) / 1000.0)), 2)
             .alias("avg_convert_s"),
        )
    )


@_register(
    "events_anomaly_zscore",
    """
    WITH h AS (
      SELECT event_type,
             epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS hour_idx,
             count(*) AS n
      FROM events GROUP BY event_type, hour_idx
    ),
    s AS (
      SELECT event_type, hour_idx, n,
             avg(n) OVER (PARTITION BY event_type) AS mu,
             stddev_samp(n) OVER (PARTITION BY event_type) AS sd
      FROM h
    )
    SELECT event_type, CAST(hour_idx AS BIGINT) AS hour_idx,
           CAST(n AS BIGINT) AS n,
           round((n - mu) / sd, 4) AS z
    FROM s
    WHERE abs(round((n - mu) / sd, 4)) >= 2.0
    """,
    doc="volume-anomaly monitoring: hourly event counts per type scored "
        "as z-scores against the type's own mean/std, flagging |z| >= 2 "
        "— the pipeline-health gate a production intake runs next to "
        "its quality checks (a scraper loop or an outage shows up as a "
        "count spike/hole hours before downstream metrics drift). Two "
        "aggregations: raw events collapse to the (type, hour) grain "
        "first (at 100 TB the only full-data pass), then the per-type "
        "stats window runs over hours-per-type rows — thousands, not "
        "billions. The flag compares the ROUNDED z on both engines so "
        "ulp-level stddev drift cannot flip membership.",
)
def _q_events_anomaly_zscore(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    h = (ev.select("event_type",
                   F.floor(F.col("ts_ms") / 3600000).alias("hour_idx"))
         .groupBy("event_type", "hour_idx").agg(F.count("*").alias("n")))
    w = Window.partitionBy("event_type")
    z = F.round((F.col("n") - F.avg("n").over(w))
                / F.stddev_samp(F.col("n")).over(w), 4)
    return (h.withColumn("z", z)
            .filter(F.abs(F.col("z")) >= 2.0)
            .select("event_type", F.col("hour_idx").cast("long"),
                    F.col("n").cast("long").alias("n"), "z"))


@_register(
    "basket_brand_lift",
    """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
    bs AS (SELECT brand, count(*) AS n_b FROM ob GROUP BY brand),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
      FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(n_ab * 1.0 / sa.n_b, 4) AS confidence_a_b,
           round(n_ab * 1.0 * n.n_orders / (sa.n_b * sb.n_b), 4) AS lift
    FROM pairs
    JOIN bs sa ON pairs.brand_a = sa.brand
    JOIN bs sb ON pairs.brand_b = sb.brand
    CROSS JOIN n
    WHERE n_ab >= 20
    """,
    doc="market-basket association rules (support / confidence / lift) "
        "over brand co-occurrence within orders — the frequent-itemset "
        "primitive behind recommendations and assortment analysis. "
        "Spark derives the pair supports from per-order distinct-brand "
        "SETS fanned out with array algebra (the supplier_pagerank edge "
        "shape: one shuffle of (order, brand) rows, pair fan-out "
        "bounded by basket size squared, never a fact-table self-join), "
        "brand supports ride the same distinct frame, and the 25-row "
        "support table broadcasts back onto the pair aggregate. At "
        "100 TB the only wide exchanges carry the DISTINCT "
        "(order, item) grain; a hot item is an aggregate reducer. The "
        "oracle replays the definition as a plain self-join, and "
        "lift's integer cross-multiplication happens before the one "
        "float divide.",
)
def _q_basket_brand_lift(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.plans import llm_ops

    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    ob = (li.select("l_orderkey", "l_partkey")
          .join(F.broadcast(pt.select("p_partkey", "p_brand")),
                li["l_partkey"] == pt["p_partkey"])
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("p_brand").alias("brand"))
          .distinct())
    # ONE fact-table pass (r17): the old shape re-planned the
    # lineitem x part distinct subtree FOUR times (pairs, sa, sb, n) —
    # four full fact scans at 100 TB. Everything now derives from the
    # materialized per-order brand-set frame: n is its row count, the
    # brand supports re-explode its (deduped) sets, and the pair
    # fan-out reads it in place.
    per_order = llm_ops._ckpt(
        ob.groupBy("okey").agg(F.collect_set("brand").alias("bs")))
    n = per_order.agg(F.count("*").alias("n_orders"))
    bs = (per_order.select(F.explode("bs").alias("brand"))
          .groupBy("brand").agg(F.count("*").alias("n_b")))
    # Pair fan-out as TWO NATIVE explodes + a codegen'd predicate (the
    # supplier_pagerank edge-derivation lesson: the nested
    # transform/filter/struct lambda chain this replaces is interpreted
    # CodegenFallback — per-element struct builds in the interpreter;
    # Generate is whole-stage codegen, and b > a keeps each unordered
    # pair once, collect_set order notwithstanding).
    pairs = (
        per_order
        .select(F.explode("bs").alias("brand_a"), "bs")
        .select("brand_a", F.explode("bs").alias("brand_b"))
        .filter(F.col("brand_b") > F.col("brand_a"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    sa = bs.select(F.col("brand").alias("brand_a"),
                   F.col("n_b").alias("n_a"))
    sb = bs.select(F.col("brand").alias("brand_b"),
                   F.col("n_b").alias("n_bb"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a", "brand_b", F.col("n_ab").cast("long").alias("n_ab"),
            F.round(F.col("n_ab") * F.lit(1.0) / F.col("n_a"), 4)
             .alias("confidence_a_b"),
            F.round(F.col("n_ab") * F.lit(1.0) * F.col("n_orders")
                    / (F.col("n_a") * F.col("n_bb")), 4).alias("lift"))
    )


@_register(
    "entity_match_fuzzy",
    """
    WITH names AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS blk,
             count(*) AS n_parts
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
           CAST(a.n_parts AS BIGINT) AS n_parts_a,
           CAST(b.n_parts AS BIGINT) AS n_parts_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 3
    """,
    doc="fuzzy entity resolution over the product-name vocabulary: "
        "blocked edit-distance matching (the record-linkage primitive "
        "behind catalog dedup and master-data management). Two-stage "
        "shape that survives 100 TB: (1) collapse the fact table to its "
        "DISTINCT entity vocabulary with one hash aggregate (64 names "
        "from 2k parts here; vocabularies stay bounded while fact "
        "tables grow), (2) block the vocabulary on the head noun and "
        "run the quadratic levenshtein verify only WITHIN blocks — the "
        "classic blocking trick that turns all-pairs O(V^2) into "
        "sum-of-block-squares; at web scale add soundex/length "
        "composite block keys. levenshtein is a JVM intrinsic on Spark "
        "and a native function on DuckDB — identical integer distances, "
        "no float parity surface.",
)
def _q_entity_match_fuzzy(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    names = (p.groupBy("p_name")
             .agg(F.count("*").alias("n_parts"))
             .select("p_name",
                     F.split("p_name", " ").getItem(1).alias("blk"),
                     "n_parts"))
    a = names.select(F.col("p_name").alias("name_a"),
                     F.col("blk").alias("blk_a"),
                     F.col("n_parts").alias("n_parts_a"))
    b = names.select(F.col("p_name").alias("name_b"),
                     F.col("blk").alias("blk_b"),
                     F.col("n_parts").alias("n_parts_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b"))
               & (F.col("name_a") < F.col("name_b"))
               & (F.levenshtein("name_a", "name_b") <= 3))
        .select("name_a", "name_b",
                F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
                F.col("n_parts_a").cast("long").alias("n_parts_a"),
                F.col("n_parts_b").cast("long").alias("n_parts_b"))
    )


@_register(
    "orders_table_profile",
    """
    SELECT 'o_orderkey' AS column_name,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           round(CAST(min(o_orderkey) AS DOUBLE), 4) AS min_num,
           round(CAST(max(o_orderkey) AS DOUBLE), 4) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           round(CAST(min(o_custkey) AS DOUBLE), 4),
           round(CAST(max(o_custkey) AS DOUBLE), 4)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           round(CAST(min(length(o_orderstatus)) AS DOUBLE), 4),
           round(CAST(max(length(o_orderstatus)) AS DOUBLE), 4)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(CAST(min(o_totalprice) AS DOUBLE), 4),
           round(CAST(max(o_totalprice) AS DOUBLE), 4)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           round(CAST(epoch_ms(CAST(min(o_orderdate) AS TIMESTAMP)) AS DOUBLE), 4),
           round(CAST(epoch_ms(CAST(max(o_orderdate) AS TIMESTAMP)) AS DOUBLE), 4)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           round(CAST(min(length(o_orderpriority)) AS DOUBLE), 4),
           round(CAST(max(length(o_orderpriority)) AS DOUBLE), 4)
    FROM orders
    """,
    doc="single-pass data profiling of the orders table (the ANALYZE/"
        "data-quality-report operator every ingestion pipeline runs "
        "before trusting a new drop): per column null count, exact "
        "distinct count, numeric/temporal min-max (timestamps as "
        "epoch-millis, varchar profiled by value LENGTH so no "
        "cross-engine string-formatting surface exists). Spark runs "
        "one single-DISTINCT aggregate per column and unions the 1-row "
        "frames (r17: the old single multi-DISTINCT aggregate planned "
        "as Expand — every row multiplied x7 through a wide-key hash "
        "aggregate — and measured 1.61 vs 0.61 s at sf0.1; with "
        "parquet column pruning the six branches decode the same total "
        "bytes as one full-width scan). At 100 TB call "
        "relational.table_profile(..., approx=True) for the ONE-pass "
        "form — approx_count_distinct HLL sketches for every column in "
        "a single aggregate, same output schema (plan-shape + "
        "error-bound pinned by tests/test_stats_ops.py).",
)
def _q_orders_table_profile(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return relational.table_profile(o, [
        ("o_orderkey", "num"), ("o_custkey", "num"),
        ("o_orderstatus", "str"), ("o_totalprice", "num"),
        ("o_orderdate", "ts"), ("o_orderpriority", "str")])


@_register(
    "customer_k_anonymity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS group_size
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    tot AS (SELECT count(*) AS n FROM customer)
    SELECT c_nationkey, c_mktsegment,
           CAST(group_size AS BIGINT) AS group_size,
           group_size < 10 AS below_k,
           round(group_size * 1.0 / n, 6) AS share
    FROM g CROSS JOIN tot
    """,
    doc="k-anonymity audit over the (nation, market-segment) "
        "quasi-identifier pair (the privacy gate run before releasing "
        "or training on user-attributable records): equivalence-class "
        "sizes, a below-k=10 re-identification-risk flag per class, and "
        "each class's population share. ONE hash aggregate on the "
        "quasi-identifier key plus a broadcast scalar total — the class "
        "count is bounded by the QI domain product, so the result "
        "frame stays tiny no matter the fact-table scale; suppression/"
        "generalization policies downstream consume exactly this frame.",
)
def _q_customer_k_anonymity(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count("*").alias("group_size")))
    tot = c.agg(F.count("*").alias("n"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select("c_nationkey", "c_mktsegment",
                F.col("group_size").cast("long").alias("group_size"),
                (F.col("group_size") < 10).alias("below_k"),
                F.round(F.col("group_size") * F.lit(1.0) / F.col("n"), 6)
                 .alias("share"))
    )


@_register(
    "referential_integrity_audit",
    """
    SELECT * FROM (
      SELECT 'fk_lineitem_orders' AS constraint_name,
             (SELECT count(*) FROM lineitem) AS n_rows,
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
               AS n_violations
      UNION ALL
      SELECT 'fk_lineitem_part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'fk_lineitem_supplier',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
               (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
      UNION ALL
      SELECT 'fk_orders_customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o WHERE NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'fk_customer_nation',
             (SELECT count(*) FROM customer),
             (SELECT count(*) FROM customer c WHERE NOT EXISTS
               (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
      UNION ALL
      SELECT 'fk_supplier_nation',
             (SELECT count(*) FROM supplier),
             (SELECT count(*) FROM supplier s WHERE NOT EXISTS
               (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
      UNION ALL
      SELECT 'pk_orders', (SELECT count(*) FROM orders),
             (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
      UNION ALL
      SELECT 'pk_customer', (SELECT count(*) FROM customer),
             (SELECT count(*) - count(DISTINCT c_custkey) FROM customer)
      UNION ALL
      SELECT 'pk_lineitem_composite', (SELECT count(*) FROM lineitem),
             (SELECT count(*) - count(DISTINCT l_orderkey * 10 + l_linenumber)
              FROM lineitem)
    )
    """,
    doc="declarative data-quality constraint audit over the star schema "
        "(the expectation-suite gate a warehouse pipeline runs before "
        "publishing a snapshot): six foreign-key orphan counts plus "
        "three primary-key uniqueness checks, one row per constraint "
        "with rows-checked and violation counts. Plan shape per FK: a "
        "LEFT ANTI join of the child on the parent key — dimension "
        "parents (nation/customer/supplier/part) broadcast, and the "
        "fact-fact check (lineitem->orders) shuffles both sides on the "
        "orderkey once; PK checks are a single partial+final "
        "count-distinct aggregate. Each check reduces to ONE scalar row "
        "before the tiny 9-row union, so the audit costs one pass over "
        "each child table regardless of scale — and the checks are "
        "independent jobs, schedulable concurrently. The composite "
        "lineitem PK folds (orderkey, linenumber) into one integer so "
        "the distinct is a single 8-byte key, not a struct compare.",
)
def _q_referential_integrity_audit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")

    def fk(name, child, key, parent, pkey, bcast=True):
        # ONE child pass per FK (r17): the old anti-join + separate
        # count(*) scanned every child twice — a left join against the
        # flagged parent keyset folds the orphan count and the row
        # count into one conditional aggregate (a NULL child key never
        # matches, exactly like NOT EXISTS).
        p = (parent.select(F.col(pkey).alias(key)).distinct()
             .withColumn("__hit", F.lit(True)))
        if bcast:
            p = F.broadcast(p)
        return (child.join(p, key, "left")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.count_if(F.col("__hit").isNull())
                      .alias("n_violations"))
                .select(F.lit(name).alias("constraint_name"),
                        "n_rows", "n_violations"))

    def pk(name, tbl, key_col):
        return (tbl.agg(
                    F.count("*").alias("n_rows"),
                    (F.count("*") - F.countDistinct(key_col))
                    .alias("n_violations"))
                .select(F.lit(name).alias("constraint_name"),
                        "n_rows", "n_violations"))

    checks = [
        fk("fk_lineitem_orders", li, "l_orderkey", orders, "o_orderkey",
           bcast=False),
        fk("fk_lineitem_part", li, "l_partkey", part, "p_partkey"),
        fk("fk_lineitem_supplier", li, "l_suppkey", supp, "s_suppkey"),
        fk("fk_orders_customer", orders, "o_custkey", cust, "c_custkey"),
        fk("fk_customer_nation", cust, "c_nationkey", nation, "n_nationkey"),
        fk("fk_supplier_nation", supp, "s_nationkey", nation, "n_nationkey"),
        pk("pk_orders", orders, "o_orderkey"),
        pk("pk_customer", cust, "c_custkey"),
        pk("pk_lineitem_composite",
           li.select((F.col("l_orderkey") * 10 + F.col("l_linenumber"))
                     .alias("k")), "k"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out.select("constraint_name",
                      F.col("n_rows").cast("long").alias("n_rows"),
                      F.col("n_violations").cast("long").alias("n_violations"))


@_register(
    "orders_cohort_retention",
    """
    WITH firsts AS (
      SELECT o_custkey,
             min(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT f.cohort, o.o_custkey,
             datediff('month', f.cohort,
                      date_trunc('month', o.o_orderdate)) AS months_since
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ),
    sizes AS (SELECT cohort, count(*) AS cohort_size FROM firsts
              GROUP BY cohort)
    SELECT strftime(a.cohort, '%Y-%m') AS cohort_month,
           CAST(a.months_since AS INTEGER) AS months_since,
           count(DISTINCT a.o_custkey) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(count(DISTINCT a.o_custkey) * 1.0 / s.cohort_size, 6)
             AS retention
    FROM activity a JOIN sizes s ON s.cohort = a.cohort
    GROUP BY a.cohort, a.months_since, s.cohort_size
    """,
    doc="monthly cohort-retention matrix from the orders fact (the "
        "classic warehouse lifecycle report): each customer joins the "
        "cohort of their first order month; each later order marks them "
        "active at months-since-cohort offset; cells carry the distinct "
        "active count and the share of the cohort it represents. Plan: "
        "the first-order aggregate and the activity join both key on "
        "o_custkey, so the SAME hash partitioning serves the groupBy "
        "and the join (one exchange, AQE-reused); the distinct-count "
        "rolls up to (cohort, offset) — a frame bounded by "
        "months_span^2 cells regardless of fact scale; cohort sizes "
        "broadcast back onto it. No window functions, so no per-cohort "
        "sort anywhere.",
)
def _q_orders_cohort_retention(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    firsts = (o.groupBy("o_custkey")
              .agg(F.min(month).alias("cohort")))
    activity = (
        o.join(firsts, "o_custkey")
        .select("o_custkey", "cohort",
                F.months_between(F.date_trunc("month", F.col("o_orderdate")),
                                 F.col("cohort")).cast("int")
                 .alias("months_since"))
    )
    sizes = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    return (
        activity.groupBy("cohort", "months_since")
        .agg(F.countDistinct("o_custkey").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
                F.col("months_since").cast("int").alias("months_since"),
                F.col("n_active").cast("long").alias("n_active"),
                F.col("cohort_size").cast("long").alias("cohort_size"),
                F.round(F.col("n_active") * F.lit(1.0) / F.col("cohort_size"),
                        6).alias("retention"))
    )


@_register(
    "customer_l_diversity",
    """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_bucket
      FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT bal_bucket) AS BIGINT) AS l_distinct,
           count(DISTINCT bal_bucket) < 3 AS below_l
    FROM s GROUP BY c_nationkey, c_mktsegment
    """,
    doc="l-diversity audit — the privacy rung above customer_k_anonymity "
        "(a k-anonymous class is still re-identifying when everyone in "
        "it shares the same sensitive value): per (nation, segment) "
        "quasi-identifier class, the count of DISTINCT sensitive values "
        "(account-balance thousand-buckets) and an l<3 flag. One "
        "count-distinct aggregate on the QI key — Spark plans it as the "
        "two-phase expand/partial-agg, so a hot class aggregates "
        "map-side; output is bounded by the QI domain, scale-free.",
)
def _q_customer_l_diversity(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("int")
    return (
        c.select("c_nationkey", "c_mktsegment", bucket.alias("bal_bucket"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("group_size"),
             F.countDistinct("bal_bucket").cast("long").alias("l_distinct"))
        .withColumn("below_l", F.col("l_distinct") < 3)
    )


@_register(
    "orders_incremental_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    doc="incremental aggregate maintenance, PROVED exact by the oracle: "
        "the Spark side splits orders at the latest month boundary into "
        "a base partition (the standing pre-aggregate a warehouse keeps "
        "materialized) and a delta (the newly arrived month), aggregates "
        "each INDEPENDENTLY, and merges the partials — count/sum add, "
        "max folds with greatest() — while the oracle aggregates the "
        "full table directly, so the hash compare certifies that the "
        "merge algebra loses nothing. This is the §2.6-adjacent "
        "incremental-ETL primitive: at 100 TB you never re-scan "
        "history, you aggregate the delta (one partition's scan) and "
        "merge D^0-sized partial frames; every aggregate here is "
        "decomposable (sum/count/max), which is exactly the property "
        "the merge step needs. The month boundary derives from a "
        "broadcast one-row max, keeping the split predicates "
        "scan-side.",
)
def _q_orders_incremental_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cutoff = o.agg(F.date_trunc("month", F.max("o_orderdate"))
                   .alias("cut"))
    with_cut = o.crossJoin(F.broadcast(cutoff))
    base = with_cut.filter(F.col("o_orderdate") < F.col("cut"))
    delta = with_cut.filter(F.col("o_orderdate") >= F.col("cut"))

    def part(df):
        return (df.groupBy("o_orderstatus", "o_orderpriority")
                .agg(F.count("*").alias("n"),
                     F.sum("o_totalprice").alias("rev"),
                     F.max("o_totalprice").alias("mx")))

    merged = (
        part(base).unionAll(part(delta))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.sum("n").alias("n_orders"),
             F.sum("rev").alias("revenue"),
             F.max("mx").alias("max_price"))
    )
    return merged.select(
        "o_orderstatus", "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round("revenue", 2).alias("revenue"),
        F.round("max_price", 2).alias("max_price"))


@_register(
    "events_time_weighted_avg",
    """
    WITH seq AS (
      SELECT user_id, value, epoch_ms(ts) AS t,
             lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t_next
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(max(t_next) - min(t) AS BIGINT) AS span_ms,
           round(sum(value * (t_next - t)) / sum(t_next - t), 4) AS twa
    FROM seq WHERE t_next IS NOT NULL
    GROUP BY user_id
    """,
    doc="time-weighted average of a sampled metric per user (the "
        "correct mean for irregularly-sampled gauges — a value that "
        "held for an hour must weigh 60x one that held a minute; the "
        "row-mean the naive avg() computes is biased toward bursty "
        "periods): each event's value is weighted by its holding "
        "interval (until the next event), via one lead() window per "
        "user and a per-user agg. Epoch-millis arithmetic keeps the "
        "weights exact integers on both engines; only the final ratio "
        "is a round-4 double. Scale: one shuffle on user_id serves "
        "both the window sort and the aggregate (same key, exchange "
        "reused); per-user sequences are the only sort unit, so no "
        "global funnel.",
)
def _q_events_time_weighted_avg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "value",
        F.col("ts_ms").alias("t"),
        F.lead("ts_ms").over(w).alias("t_next"),
    )
    return (
        seq.filter(F.col("t_next").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_intervals"),
             (F.max("t_next") - F.min("t")).cast("long").alias("span_ms"),
             F.round(F.sum(F.col("value") * (F.col("t_next") - F.col("t")))
                     / F.sum(F.col("t_next") - F.col("t")), 4).alias("twa"))
    )


@_register(
    "parts_abc_pareto",
    """
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS rev_e4
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(rev_e4) AS t FROM rev),
    c AS (
      SELECT l_partkey, rev_e4,
             sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey) AS cum
      FROM rev
    )
    SELECT l_partkey,
           CAST(rev_e4 AS BIGINT) AS revenue_e4,
           round(cum * 1.0 / t, 6) AS cum_share,
           CASE WHEN round(cum * 1.0 / t, 6) <= 0.8 THEN 'A'
                WHEN round(cum * 1.0 / t, 6) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c CROSS JOIN tot
    """,
    doc="Pareto/ABC classification of parts by revenue share — the "
        "80/15/5 cut behind inventory tiering and 'which domains are "
        "80% of the tokens' corpus reports. The interesting part is "
        "the GLOBAL cumulative sum: the oracle's unpartitioned window "
        "is a single-reducer funnel at scale, so the Spark side runs "
        "operators/relational.py::banded_running_total — value-range "
        "bands from a broadcast min/max, per-band totals whose own "
        "prefix sum is a window over num_bands ROWS (not N), offsets "
        "broadcast back, and a parallel within-band window. Revenue "
        "runs in EXACT integer 1e-4-dollar units (2-decimal prices x "
        "2-decimal discount rates are integers after scaling), so the "
        "per-part sums, banded prefix sums, and grand total are "
        "bit-exact on both engines regardless of addition order — the "
        "cent-boundary round flips a double-sum version showed "
        "(3/2000 rows) are impossible by construction; the class "
        "derives from the round-6 share of two exact integers.",
)
def _q_parts_abc_pareto(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dpct = F.round(F.col("l_discount") * 100, 0).cast("long")
    rev = (li.groupBy("l_partkey")
           .agg(F.sum(cents * (F.lit(100) - dpct)).alias("rev_e4")))
    tot = rev.agg(F.sum("rev_e4").alias("t"))
    c = relational.banded_running_total(
        rev, value="rev_e4", tiebreak="l_partkey", out_col="cum")
    share = F.round(F.col("cum") * F.lit(1.0) / F.col("t"), 6)
    return (
        c.crossJoin(F.broadcast(tot))
        .select("l_partkey",
                F.col("rev_e4").cast("long").alias("revenue_e4"),
                share.alias("cum_share"),
                F.when(share <= 0.8, "A")
                 .when(share <= 0.95, "B")
                 .otherwise("C").alias("abc_class"))
    )



# ---------------------------------------------------------------------------
# Data-quality expectations / statistical testing / interval algebra
# ---------------------------------------------------------------------------

#: (rule name, DuckDB predicate) for the one-pass expectations audit; the
#: Spark side mirrors each predicate with column algebra. Mixed on
#: purpose: some rules PASS on the fixture (zero-violation rows prove the
#: report includes clean rules) and some FIRE (real violation counts).
_EXPECT_RULES_SQL = [
    ("qty_positive", "l_quantity >= 1"),
    ("qty_le_40", "l_quantity <= 40"),
    ("discount_le_5pct", "l_discount <= 0.05"),
    ("tax_range", "l_tax BETWEEN 0 AND 0.08"),
    ("returnflag_domain", "l_returnflag IN ('A', 'N', 'R')"),
    ("shipdate_lt_2001", "l_shipdate < TIMESTAMP '2001-01-01'"),
    ("price_floor_1000", "l_extendedprice >= 1000"),
]


@_register(
    "lineitem_expectations_audit",
    "SELECT rule, n_rows, n_violations, violation_pct, first_bad_key "
    "FROM (\n"
    + "\n    UNION ALL\n".join(
        f"""    SELECT '{name}' AS rule, count(*) AS n_rows,
           CAST(sum(CASE WHEN NOT coalesce({pred}, FALSE) THEN 1
                         ELSE 0 END) AS BIGINT) AS n_violations,
           round(sum(CASE WHEN NOT coalesce({pred}, FALSE) THEN 1.0
                          ELSE 0 END) / count(*), 4) AS violation_pct,
           min(CASE WHEN NOT coalesce({pred}, FALSE)
                    THEN l_orderkey * 10 + l_linenumber END)
             AS first_bad_key
    FROM lineitem"""
        for name, pred in _EXPECT_RULES_SQL)
    + "\n)",
    doc="one-pass row-level expectations engine (the Deequ/"
        "Great-Expectations gate): K business rules evaluated as "
        "scan-side boolean columns on a SINGLE pass over the fact table "
        "— rules-as-data via explode(array(struct(rule, violated, "
        "key))) then a K-group aggregate — reporting rows checked, "
        "violations, violation rate, and the smallest violating "
        "composite key per rule. Null predicate results count as "
        "violations (the expectations convention). Complements "
        "referential_integrity_audit (cross-table FK/PK checks, one "
        "job per constraint): here all K rules share ONE scan, so at "
        "100 TB the audit costs the same as any single aggregate, and "
        "the explode fans out K tiny structs per row that collapse "
        "map-side into K running counters. The oracle replays each "
        "rule as its own aggregate and unions the K scalar rows.",
)
def _q_lineitem_expectations_audit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    preds = [
        ("qty_positive", F.col("l_quantity") >= 1),
        ("qty_le_40", F.col("l_quantity") <= 40),
        ("discount_le_5pct", F.col("l_discount") <= 0.05),
        ("tax_range", (F.col("l_tax") >= 0) & (F.col("l_tax") <= 0.08)),
        ("returnflag_domain", F.col("l_returnflag").isin("A", "N", "R")),
        ("shipdate_lt_2001",
         F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp")),
        ("price_floor_1000", F.col("l_extendedprice") >= 1000),
    ]
    key = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    rules = F.explode(F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 (~F.coalesce(pred, F.lit(False))).alias("viol"),
                 key.alias("k"))
        for name, pred in preds])).alias("r")
    return (
        li.select(rules)
        .select("r.rule", "r.viol", "r.k")
        .groupBy("rule")
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.col("viol").cast("long")).alias("n_violations"),
             F.round(F.sum(F.when(F.col("viol"), 1.0).otherwise(0.0))
                     / F.count("*"), 4).alias("violation_pct"),
             F.min(F.when(F.col("viol"), F.col("k")))
             .alias("first_bad_key"))
    )


@_register(
    "events_chisq_independence",
    """
    WITH obs AS (
      SELECT event_type,
             CAST(epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 % 7
                  AS INTEGER) AS dow,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, d.dow, coalesce(o.n, 0) AS n
      FROM (SELECT DISTINCT event_type FROM obs) t
      CROSS JOIN (SELECT DISTINCT dow FROM obs) d
      LEFT JOIN obs o ON o.event_type = t.event_type AND o.dow = d.dow
    ),
    m AS (
      SELECT event_type, dow, n,
             sum(n) OVER (PARTITION BY event_type) AS r,
             sum(n) OVER (PARTITION BY dow) AS c,
             sum(n) OVER () AS total
      FROM grid
    )
    SELECT round(sum((n - r * c * 1.0 / total) * (n - r * c * 1.0 / total)
                     / (r * c * 1.0 / total)), 4) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS INTEGER) AS dof,
           CAST(max(total) AS BIGINT) AS n
    FROM m
    """,
    doc="chi-square test of independence between event_type and "
        "day-of-week (epoch-day % 7 — integer-exact on both engines, "
        "dodging the Sunday=0-vs-1 dayofweek() mismatch): the "
        "categorical-drift monitor behind 'did the event mix shift by "
        "weekday'. ONE partial+final aggregate reduces 100 TB of events "
        "to a |types| x 7 contingency table; margins, expected counts, "
        "and the statistic are window algebra over that tiny frame "
        "(zero-observed cells restored via the distinct-types x "
        "distinct-dows grid, since (0-e)^2/e = e still contributes). "
        "Output: chi2, degrees of freedom, N.",
)
def _q_events_chisq_independence(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    obs = (ev.select("event_type",
                     (F.floor(F.col("ts_ms") / 86400000) % 7)
                     .cast("int").alias("dow"))
           .groupBy("event_type", "dow").agg(F.count("*").alias("n")))
    grid = (obs.select("event_type").distinct()
            .crossJoin(obs.select("dow").distinct())
            .join(obs, ["event_type", "dow"], "left")
            .select("event_type", "dow",
                    F.coalesce(F.col("n"), F.lit(0)).alias("n")))
    r = F.sum("n").over(Window.partitionBy("event_type"))
    c = F.sum("n").over(Window.partitionBy("dow"))
    total = F.sum("n").over(Window.partitionBy())
    m = grid.select("event_type", "dow", "n", r.alias("r"), c.alias("c"),
                    total.alias("total"))
    e = F.col("r") * F.col("c") / F.col("total")
    return m.agg(
        F.round(F.sum((F.col("n") - e) * (F.col("n") - e) / e), 4)
        .alias("chi2"),
        ((F.count_distinct(F.col("event_type")) - 1)
         * (F.count_distinct(F.col("dow")) - 1)).cast("int").alias("dof"),
        F.max("total").cast("long").alias("n"))


@_register(
    "events_interval_coverage",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_ms(CAST(ts AS TIMESTAMP)) AS s,
             epoch_ms(CAST(ts AS TIMESTAMP)) + 300000 AS e
      FROM events
    ),
    sweep AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM iv
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(greatest(0, e - greatest(s, coalesce(pmax, s))))
                AS BIGINT) AS covered_ms,
           CAST(max(e) - min(s) AS BIGINT) AS span_ms,
           round(sum(greatest(0, e - greatest(s, coalesce(pmax, s))))
                 * 1.0 / (max(e) - min(s)), 4) AS coverage_ratio
    FROM sweep GROUP BY user_id
    """,
    doc="interval-union length per user (sweep-line in SQL): each event "
        "opens a 5-minute activity interval; overlapping intervals must "
        "count once, so per user the window carries the running max "
        "end-time over all EARLIER intervals (rows unbounded preceding "
        "to 1 preceding) and each row contributes only its uncovered "
        "suffix max(0, e - max(s, prev_max)) — the classic O(n log n) "
        "union-of-intervals, as ONE user-keyed window plus ONE "
        "aggregate on the same exchange (sort within partitions, no "
        "second shuffle). All math is epoch-millis integers: "
        "bit-exact across engines. The active-time / uptime primitive "
        "sessionization cannot express when intervals have fixed "
        "extents that overlap arbitrarily.",
)
def _q_events_interval_coverage(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    iv = ev.select("user_id", "event_id", F.col("ts_ms").alias("s"),
                   (F.col("ts_ms") + 300000).alias("e"))
    w = (Window.partitionBy("user_id").orderBy("s", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    sweep = iv.select("user_id", "s", "e", F.max("e").over(w).alias("pmax"))
    contrib = F.greatest(
        F.lit(0),
        F.col("e") - F.greatest(F.col("s"),
                                F.coalesce(F.col("pmax"), F.col("s"))))
    return (
        sweep.groupBy("user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum(contrib).cast("long").alias("covered_ms"),
             (F.max("e") - F.min("s")).cast("long").alias("span_ms"),
             F.round(F.sum(contrib) * 1.0 / (F.max("e") - F.min("s")), 4)
             .alias("coverage_ratio"))
    )


@_register(
    "orders_subsample_variance",
    """
    WITH h AS (
      SELECT o_totalprice,
             CAST('0x' || substr(md5('hs:' || CAST(o_orderkey AS VARCHAR)),
                                 1, 8) AS BIGINT) AS hv
      FROM orders
    ),
    reps AS (
      SELECT b.b, o_totalprice
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
      WHERE (hv >> b.b) & 1 = 0
    ),
    means AS (
      SELECT b, avg(o_totalprice) AS mu, count(*) AS n FROM reps GROUP BY b
    ),
    full_ AS (SELECT avg(o_totalprice) AS mu_full, count(*) AS n_full
              FROM orders)
    SELECT CAST(count(*) AS INTEGER) AS n_replicates,
           round(avg(mu), 4) AS mean_of_means,
           round(stddev_samp(mu) / sqrt(2), 6) AS se_half_sample,
           round(max(mu_full), 4) AS full_mean,
           CAST(max(n_full) AS BIGINT) AS n_rows
    FROM means CROSS JOIN full_
    """,
    doc="half-sample replication error bars: 32 deterministic "
        "md5-bit half-samples of orders, each yielding a replicate "
        "mean of o_totalprice; the spread of the replicate means "
        "(scaled by 1/sqrt(2), since half-samples double the variance "
        "of a mean) IS a standard error for the full-data mean — the "
        "distributed bootstrap-lite that needs no random state and no "
        "resampling-with-replacement. Plan: ONE md5 per row (32 bits "
        "= 32 independent fair coins; replicate b keeps rows whose "
        "bit b is 0), and the 32x explode runs AFTER a gated spread "
        "to full parallelism — profiling showed the 4.5 s r7 debut "
        "cost was the one-row-group orders file pinning the whole "
        "fan-out to a single task, not the hashing (single-task 4.9 s "
        "vs 32-task 1.0 s cold / 0.1 s warm at sf0.1; the per-row md5 "
        "cut is still the right shape at 100 TB where the scan is "
        "already wide and the spread no-ops). Partial+final agg to "
        "32 replicate rows and a scalar aggregate; at 100 TB the "
        "fan-out collapses map-side into 32 running (sum, count) "
        "pairs per task, so the whole audit is one pass with KB-scale "
        "state. avg() of doubles is order-sensitive only at the last "
        "ulp; both outputs round (4 for means, 6 for the se).",
)
def _q_orders_subsample_variance(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.functions import hashing
    from data_pipeline_eng_project_1_spark.plans.llm_ops import _spread

    o = _t(spark, sf_dir, "orders")
    hv = hashing.hex_int(
        F.concat(F.lit("hs:"), F.col("o_orderkey").cast("string")), 8)
    reps = (_spread(o)
            .select("o_totalprice", hv.alias("hv"),
                    F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
            .filter(F.expr("(hv >> b) & 1") == 0))
    means = reps.groupBy("b").agg(F.avg("o_totalprice").alias("mu"),
                                  F.count("*").alias("n"))
    full = o.agg(F.avg("o_totalprice").alias("mu_full"),
                 F.count("*").alias("n_full"))
    return (
        means.crossJoin(F.broadcast(full))
        .agg(F.count("*").cast("int").alias("n_replicates"),
             F.round(F.avg("mu"), 4).alias("mean_of_means"),
             F.round(F.stddev_samp("mu") / F.sqrt(F.lit(2.0)), 6)
             .alias("se_half_sample"),
             F.round(F.max("mu_full"), 4).alias("full_mean"),
             F.max("n_full").cast("long").alias("n_rows"))
    )


@_register(
    "orders_mad_outliers",
    """
    WITH med AS (
      SELECT quantile_cont(o_totalprice, 0.5) AS med FROM orders
    ),
    mad AS (
      SELECT quantile_cont(abs(o_totalprice - med), 0.5) AS mad
      FROM orders CROSS JOIN med
    )
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           round(0.6745 * (o_totalprice - med) / mad, 4) AS robust_z
    FROM orders CROSS JOIN med CROSS JOIN mad
    ORDER BY abs(round(0.6745 * (o_totalprice - med) / mad, 4)) DESC,
             o_orderkey
    LIMIT 20
    """,
    doc="robust outlier detection by median/MAD (the Iglewicz-Hoaglin "
        "modified z-score, |z*|=0.6745(x-med)/MAD): unlike "
        "events_anomaly_zscore's mean/stddev, the medians do not move "
        "when the outliers themselves get more extreme — the monitor "
        "you want when bad rows are the thing you're hunting. Output: "
        "the 20 most extreme orders by |modified z| (rounded before "
        "rank, key tiebreak). Plan: two exact-median aggregates "
        "(percentile / quantile_cont interpolate with the same "
        "lower+(upper-lower)*frac arithmetic in both engines), each "
        "broadcast as a 1-row scalar, then a scan-side score and "
        "TakeOrdered(20) — per-partition heaps, no global sort. Exact "
        "percentile holds all values per group; at 100 TB swap "
        "approx_percentile(1e-4 accuracy) in — the z-scores move in "
        "the 4th decimal, the top-20 set does not (the dial is "
        "documented, the fixture grades the exact form).",
)
def _q_orders_mad_outliers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    med = o.agg(F.percentile(F.col("o_totalprice"), F.lit(0.5))
                .alias("med"))
    mad = (o.crossJoin(F.broadcast(med))
           .agg(F.percentile(F.abs(F.col("o_totalprice") - F.col("med")),
                             F.lit(0.5)).alias("mad")))
    rz = F.round(F.lit(0.6745) * (F.col("o_totalprice") - F.col("med"))
                 / F.col("mad"), 4)
    return (
        o.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(mad))
        .select("o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"),
                rz.alias("robust_z"))
        .orderBy(F.abs(F.col("robust_z")).desc(), "o_orderkey")
        .limit(20)
    )


@_register(
    "parts_skyline_frontier",
    """
    SELECT a.p_partkey, a.p_size, round(a.p_retailprice, 2) AS p_retailprice
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_size >= a.p_size AND b.p_retailprice <= a.p_retailprice
        AND (b.p_size > a.p_size OR b.p_retailprice < a.p_retailprice)
    )
    """,
    doc="2-D Pareto skyline (maximize p_size, minimize p_retailprice): "
        "the parts no other part beats on both axes — the multi-"
        "objective 'best tradeoffs' operator behind price-performance "
        "frontiers, and a shape Spark has no built-in for. The naive "
        "form is a quadratic dominance anti-join (the oracle spells "
        "exactly that, NOT EXISTS); the Spark plan exploits that a "
        "2-D skyline is DISTRIBUTIVE over the sort dimension: one "
        "per-size aggregate (min price per distinct size — partial+"
        "final, corpus never pairs with itself), a suffix-min window "
        "over that aggregate frame ordered by size descending (rows "
        "= distinct sizes, KB-scale — the only sequential step runs "
        "on the aggregate, never the data), broadcast back, and a "
        "scan-side keep rule: on the frontier iff price == own-size "
        "min AND price < min over all strictly larger sizes. At "
        "100 TB this is one agg + one broadcast join per pass; a "
        "continuous sort dimension takes the IMPLEMENTED buckets= path "
        "(relational.skyline_2d: equal-range bucket witness prunes to "
        "near-frontier candidates, exact pass on those — row-identical "
        "by test).",
)
def _q_parts_skyline_frontier(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        relational.skyline_2d(p, "p_size", "p_retailprice")
        .select("p_partkey", "p_size",
                F.round("p_retailprice", 2).alias("p_retailprice"))
    )


@_register(
    "hll_distinct_audit",
    """
    WITH h AS (
      SELECT CAST('0x' || substr(md5('hll:' || CAST(o_custkey AS VARCHAR)),
                                 1, 15) AS BIGINT) AS hv
      FROM orders
    ),
    r AS (
      SELECT hv % 256 AS b,
             max(CASE WHEN hv // 256 = 0 THEN 53
                      ELSE 53 - length(bin(hv // 256)) END) AS mreg
      FROM h GROUP BY 1
    ),
    agg AS (
      SELECT sum(pow(2.0, -mreg)) + (256 - count(*)) * 1.0 AS s,
             CAST(count(*) AS INTEGER) AS nz
      FROM r
    ),
    ex AS (SELECT count(DISTINCT o_custkey) AS n_exact FROM orders),
    est AS (
      SELECT CASE WHEN (0.7213 / (1 + 1.079 / 256)) * 65536 / s <= 640
                       AND 256 - nz > 0
                  THEN 256 * ln(256.0 / (256 - nz))
                  ELSE (0.7213 / (1 + 1.079 / 256)) * 65536 / s END AS e,
             nz
      FROM agg
    )
    SELECT CAST(256 AS INTEGER) AS m,
           CAST(n_exact AS BIGINT) AS n_exact,
           round(e, 2) AS n_est,
           round((e - n_exact) * 100.0 / n_exact, 2) AS err_pct,
           CAST(nz AS INTEGER) AS nonzero_registers
    FROM est CROSS JOIN ex
    """,
    doc="HyperLogLog distinct-count audit (Flajolet et al., m=256 "
        "registers): every row hashes once (md5 60-bit), the low 8 bits "
        "pick a register, and the register keeps the max leading-zero "
        "rank of the remaining 52 bits — rank via the length of the "
        "integer's binary string, INTEGER-exact on both engines (no "
        "float log2 near power-of-2 boundaries). The estimate is the "
        "bias-corrected harmonic mean with the linear-counting "
        "small-range branch spelled identically in both engines, "
        "audited against the exact distinct. Completes the sketch "
        "family (count-min = frequencies, SpaceSaving = heavy hitters, "
        "Bloom = membership, HLL = cardinality): at 100 TB the register "
        "frame is <=256 rows built by one partial+final max-aggregate — "
        "registers from disjoint shards/days MERGE by cell-wise max, "
        "the property that makes HLL the cross-partition distinct "
        "counter exact DISTINCT can't be (the audit's exact side is the "
        "expensive expand it replaces). err_pct is the measured "
        "sketch error at m=256 (~2%, 1.04/sqrt(m) expected).",
)
def _q_hll_distinct_audit(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.functions import hashing

    o = _t(spark, sf_dir, "orders")
    hv = hashing.hex_int(
        F.concat(F.lit("hll:"), F.col("o_custkey").cast("string")))
    w = F.shiftright(F.col("hv"), 8)
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(w)))
    r = (o.select(hv.alias("hv"))
         .select((F.col("hv") % 256).alias("b"), rho.alias("mreg"))
         .groupBy("b").agg(F.max("mreg").alias("mreg")))
    agg = r.agg(
        (F.sum(F.pow(F.lit(2.0), -F.col("mreg")))
         + (F.lit(256) - F.count("*")) * 1.0).alias("s"),
        F.count("*").cast("int").alias("nz"))
    ex = o.agg(F.count_distinct(F.col("o_custkey")).alias("n_exact"))
    alpha_m2 = (0.7213 / (1 + 1.079 / 256)) * 65536
    raw = F.lit(alpha_m2) / F.col("s")
    e = F.when((raw <= 640) & (F.lit(256) - F.col("nz") > 0),
               F.lit(256) * F.log(F.lit(256.0) / (F.lit(256) - F.col("nz")))
               ).otherwise(raw)
    return (
        agg.select(e.alias("e"), "nz")
        .crossJoin(F.broadcast(ex))
        .select(F.lit(256).cast("int").alias("m"),
                F.col("n_exact").cast("long").alias("n_exact"),
                F.round(F.col("e"), 2).alias("n_est"),
                F.round((F.col("e") - F.col("n_exact")) * 100.0
                        / F.col("n_exact"), 2).alias("err_pct"),
                F.col("nz").cast("int").alias("nonzero_registers"))
    )


@_register(
    "orders_equidepth_histogram",
    """
    WITH b AS (
      SELECT list_distinct(quantile_cont(o_totalprice,
               [0.0625, 0.125, 0.1875, 0.25, 0.3125, 0.375, 0.4375, 0.5,
                0.5625, 0.625, 0.6875, 0.75, 0.8125, 0.875, 0.9375])) AS bs
      FROM orders
    ),
    a AS (
      SELECT o_totalprice AS v,
             1 + len(list_filter(b.bs, x -> x < o_totalprice)) AS bucket
      FROM orders, b
    ),
    g AS (
      SELECT bucket,
             round(min(v), 2) AS lo,
             round(max(v), 2) AS hi,
             count(*) AS n_rows
      FROM a GROUP BY bucket
    )
    SELECT CAST(dense_rank() OVER (ORDER BY bucket) AS INTEGER) AS bucket,
           lo, hi, n_rows
    FROM g
    """,
    doc="equi-depth (equal-frequency) 16-bucket histogram of order "
        "totals — the optimizer-statistics primitive (selectivity "
        "estimation, skew detection) done WITHOUT a global sort: one "
        "exact percentile aggregate yields the 15 interior boundaries "
        "(deduped, so bucket ids stay dense under tie mass), broadcast "
        "to a scan-side strictly-below count, then one partial+final "
        "aggregate per bucket. The ntile formulation this avoids costs "
        "a full-data range exchange; at 100 TB swap the boundary pass "
        "to approx_percentile — the plan shape is unchanged "
        "(operators/relational.py::equidepth_histogram).",
)
def _q_orders_equidepth_histogram(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    h = relational.equidepth_histogram(o, "o_totalprice", k=16)
    return h.select(
        "bucket",
        F.round("lo", 2).alias("lo"),
        F.round("hi", 2).alias("hi"),
        "n_rows")


@_register(
    "events_last_touch_attribution",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
               FROM events),
    conv AS (SELECT user_id, ts_ms, event_id FROM e
             WHERE event_type = 'purchase'),
    t AS (SELECT user_id, ts_ms, event_id, event_type FROM e
          WHERE event_type IN ('view', 'click'))
    SELECT c.user_id,
           c.ts_ms AS conversion_ts,
           c.event_id AS conversion_id,
           t.event_id AS touch_id,
           t.event_type AS touch_type,
           t.ts_ms AS touch_ts,
           c.ts_ms - t.ts_ms AS lag_ms
    FROM conv c LEFT JOIN t
      ON t.user_id = c.user_id
     AND t.ts_ms <= c.ts_ms AND t.ts_ms >= c.ts_ms - 3600000
    QUALIFY row_number() OVER (
        PARTITION BY c.event_id
        ORDER BY t.ts_ms DESC NULLS LAST, t.event_id DESC NULLS LAST) = 1
    """,
    doc="last-touch marketing attribution: every purchase credits the "
        "most recent view/click by the same user within a 1-hour "
        "horizon (backward-inclusive; same-instant ties credit the "
        "largest event id — a pinned total order), unattributed "
        "purchases keep null credit. Spark plan is the asof-join "
        "shape — one union + ONE user-keyed shuffle/sort carrying a "
        "running last(touch-struct, ignoreNulls) — so at 100 TB a "
        "power user is a sorted run inside one task, never a join "
        "fan-out; the oracle spells the same semantics as a "
        "horizon-bounded join + QUALIFY row_number, which is only "
        "viable at fixture scale "
        "(operators/relational.py::attribute_last_touch).",
)
def _q_events_last_touch_attribution(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.attribute_last_touch(
        ev.select("event_id", "user_id", "ts_ms", "event_type"),
        conversion_type="purchase", touch_types=["view", "click"],
        horizon=3_600_000)


@_register(
    "events_multi_touch_attribution",
    """
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
    """,
    doc="multi-touch (position-based / u-shaped) attribution: every "
        "view/click within 1 hour before a purchase by the same user "
        "splits the credit — 40% first, 40% last, 20%/(n-2) middle "
        "(n=1 -> 1.0, n=2 -> 0.5 each); same horizon and same-instant "
        "tie conventions as the graded last-touch query, different "
        "credit curve — the model-comparison pair marketing teams "
        "actually run. Spark plan: the (conversion x in-horizon touch) "
        "pairs come from binned_range_join — a plain shuffled equi-join "
        "on (user, time-bucket) with <=2x replication, never the "
        "O(n*m) BroadcastNestedLoopJoin Spark would plan for the raw "
        "inequality — then two conversion-keyed windows over the PAIR "
        "frame, whose per-conversion fan-out the horizon bounds; the "
        "oracle spells the same pairs as a fixture-scale inequality "
        "join (operators/relational.py::attribute_multi_touch).",
)
def _q_events_multi_touch_attribution(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = relational.attribute_multi_touch(
        ev.select("event_id", "user_id", "ts_ms", "event_type"),
        conversion_type="purchase", touch_types=["view", "click"],
        horizon=3_600_000, model="u_shaped")
    return out.select(
        "user_id", "conversion_id", "conversion_ts", "touch_id",
        "touch_type", "touch_ts", "n_touches",
        F.round("credit", 6).alias("credit"))


@_register(
    "events_conversion_latency",
    """
    WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms
               FROM events),
    conv AS (SELECT user_id, ts_ms, event_id FROM e
             WHERE event_type = 'purchase'),
    t AS (SELECT user_id, ts_ms, event_id FROM e
          WHERE event_type IN ('view', 'click')),
    att AS (
      SELECT c.event_id, c.ts_ms - t.ts_ms AS lag_ms
      FROM conv c LEFT JOIN t
        ON t.user_id = c.user_id
       AND t.ts_ms <= c.ts_ms AND t.ts_ms >= c.ts_ms - 3600000
      QUALIFY row_number() OVER (
          PARTITION BY c.event_id
          ORDER BY t.ts_ms DESC NULLS LAST, t.event_id DESC NULLS LAST) = 1)
    SELECT count(*) AS n_conversions,
           count(lag_ms) AS n_attributed,
           round(quantile_cont(lag_ms, 0.25), 4) AS p25_ms,
           round(quantile_cont(lag_ms, 0.50), 4) AS p50_ms,
           round(quantile_cont(lag_ms, 0.75), 4) AS p75_ms,
           round(quantile_cont(lag_ms, 0.90), 4) AS p90_ms,
           round(avg(lag_ms), 4) AS mean_latency_ms
    FROM att
    """,
    doc="conversion-latency distribution: quantiles and mean of "
        "(purchase ts - last view/click ts) over attributed conversions "
        "— the 'how long after the ad do people buy' funnel-velocity "
        "statistic, built ON the graded last-touch semantics (same "
        "1-hour horizon and same-instant tie conventions; unattributed "
        "purchases counted but excluded from the latency aggregates). "
        "Spark plan: the attribution union-sort (ONE user-keyed "
        "exchange, the asof shape — never a join fan-out) + ONE global "
        "percentile aggregate over the per-conversion latencies (exact "
        "here; approx_percentile is the 100 TB dial, same plan); the "
        "oracle spells the same semantics as the fixture-scale "
        "horizon-bounded join + QUALIFY "
        "(operators/relational.py::conversion_latency).",
)
def _q_events_conversion_latency(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.conversion_latency(
        ev.select("event_id", "user_id", "ts_ms", "event_type"),
        conversion_type="purchase", touch_types=["view", "click"],
        horizon=3_600_000)


@_register(
    "events_grouped_regression",
    """
    WITH e AS (SELECT event_type,
                      (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) % 24
                          AS hour_of_day,
                      value
               FROM events)
    SELECT event_type,
           regr_count(value, hour_of_day)               AS n,
           round(regr_slope(value, hour_of_day), 4)     AS slope,
           round(regr_intercept(value, hour_of_day), 4) AS intercept,
           round(regr_r2(value, hour_of_day), 6)        AS r2
    FROM e GROUP BY event_type
    """,
    doc="group-wise OLS as a reusable operator (y = event value, x = "
        "UTC hour-of-day, one fit per event type) — per-group "
        "regression via the moment aggregates, so the shuffle carries "
        "five running sums per group, never the points; distinct from "
        "regression_price_qty in that it exercises the "
        "grouped_regression OPERATOR (multi-key capable, zero-variance "
        "groups -> null slope) rather than inline regr_* calls "
        "(operators/relational.py::grouped_regression).",
)
def _q_events_grouped_regression(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type", "value",
        F.expr("(ts_ms div 3600000) % 24").alias("hour_of_day"))
    r = relational.grouped_regression(
        e, ["event_type"], x="hour_of_day", y="value")
    return r.select(
        "event_type", "n",
        F.round("slope", 4).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 6).alias("r2"))


@_register(
    "events_psi_drift",
    """
    WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value
               FROM events),
    m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM e),
    b AS (SELECT list_distinct(quantile_cont(value,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS bs
          FROM e, m WHERE ts_ms < mid),
    a AS (SELECT 1 + len(list_filter(b.bs, x -> x < value)) AS bucket,
                 CASE WHEN ts_ms < mid THEN 1 ELSE 0 END AS isb
          FROM e, m, b),
    g AS (SELECT bucket, sum(isb) AS n_base, sum(1 - isb) AS n_curr
          FROM a GROUP BY bucket),
    s AS (SELECT bucket, n_base, n_curr,
                 (n_base + 0.5)
                   / (sum(n_base) OVER () + 0.5 * count(*) OVER ()) AS p,
                 (n_curr + 0.5)
                   / (sum(n_curr) OVER () + 0.5 * count(*) OVER ()) AS q
          FROM g)
    SELECT CAST(dense_rank() OVER (ORDER BY bucket) AS INTEGER) AS bucket,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_curr AS BIGINT) AS n_curr,
           round(p, 6) AS base_pct,
           round(q, 6) AS curr_pct,
           round((q - p) * ln(q / p), 6) AS psi_term,
           round(sum((q - p) * ln(q / p)) OVER (), 6) AS psi_total
    FROM s
    """,
    doc="population stability index of the event value distribution "
        "between the first and second halves of the time range — the "
        "tabular-drift go/no-go statistic model-ops teams gate "
        "retraining on (< 0.1 stable, 0.1-0.25 drifting, > 0.25 "
        "broken), binned by the BASELINE's deciles with add-half "
        "smoothing so empty current-side buckets stay finite. Scale "
        "shape (equidepth_histogram twice over): one (min,max) scalar "
        "aggregate -> integer midpoint broadcast, one percentile "
        "aggregate over the baseline slice (approx_percentile at "
        "100 TB, same plan) -> <= 9 boundaries broadcast, scan-side "
        "strictly-below bucketing, ONE partial+final bucket aggregate; "
        "the share/psi/total windows run over the <= 10-row AGGREGATE "
        "frame, never the data — no sort, no ntile exchange, no join "
        "(operators/relational.py::psi_drift).",
)
def _q_events_psi_drift(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.psi_drift(
        ev.select("ts_ms", "value"), "value", "ts_ms", bins=10)


@_register(
    "events_ecdf_drift",
    """
    WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value
               FROM events),
    m AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM e),
    b AS (SELECT list_distinct(quantile_cont(value,
            [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5,
             0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95])) AS bs
          FROM e, m WHERE ts_ms < mid),
    a AS (SELECT 1 + len(list_filter(b.bs, x -> x < value)) AS bucket,
                 CASE WHEN ts_ms < mid THEN 1 ELSE 0 END AS isb
          FROM e, m, b),
    g AS (SELECT bucket, sum(isb) AS n_base, sum(1 - isb) AS n_curr
          FROM a GROUP BY bucket),
    s AS (SELECT bucket, n_base, n_curr,
                 (sum(n_base) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   * 1.0 / (sum(n_base) OVER ()) AS fb,
                 (sum(n_curr) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   * 1.0 / (sum(n_curr) OVER ()) AS fc
          FROM g),
    s2 AS (SELECT *, abs(fb - fc) AS gap FROM s)
    SELECT CAST(dense_rank() OVER (ORDER BY bucket) AS INTEGER) AS bucket,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_curr AS BIGINT) AS n_curr,
           round(fb, 6) AS f_base,
           round(fc, 6) AS f_curr,
           round(gap, 6) AS gap,
           round(max(gap) OVER (), 6) AS ks_stat
    FROM s2
    """,
    doc="Kolmogorov-Smirnov-style ecdf drift of the event value between "
        "the first and second halves of the time range: the "
        "NONPARAMETRIC companion to the graded PSI monitor — cumulative "
        "shares of both halves compared at the baseline's 20-quantile "
        "boundaries, ks_stat = max gap (a lower bound of exact "
        "two-sample D that converges as bins grow; exact D needs the "
        "total order this formulation exists to avoid). Scale shape "
        "(psi_drift verbatim): one (min,max) scalar aggregate -> integer "
        "midpoint broadcast, one baseline percentile aggregate "
        "(approx_percentile at 100 TB, same plan) -> boundary broadcast, "
        "scan-side strictly-below bucketing, ONE partial+final bucket "
        "aggregate; the cumulative/max windows run over the <= 20-row "
        "AGGREGATE frame — no sort of the data, no join "
        "(operators/relational.py::ecdf_drift).",
)
def _q_events_ecdf_drift(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.ecdf_drift(
        ev.select("ts_ms", "value"), "value", "ts_ms", bins=20)


@_register(
    "orders_target_encoding",
    """
    WITH s AS (SELECT o_orderpriority AS cat, sum(o_totalprice) AS cs,
                      count(*) AS cn
               FROM orders GROUP BY 1),
    g AS (SELECT avg(o_totalprice) AS gm FROM orders)
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           CAST(s.cn AS BIGINT) AS cat_n,
           round(CASE WHEN s.cn > 1
                      THEN (s.cs - o.o_totalprice) / (s.cn - 1) END,
                 4) AS te_loo,
           round((s.cs - o.o_totalprice + 10.0 * g.gm) / (s.cn - 1 + 10.0),
                 4) AS te_smooth
    FROM orders o CROSS JOIN g JOIN s ON o.o_orderpriority = s.cat
    ORDER BY o.o_orderkey
    LIMIT 50
    """,
    doc="leave-one-out target encoding of order priority against total "
        "price with m=10 smoothing toward the global mean — the feature-"
        "pipeline staple, self-leakage-free by construction. Scale shape: "
        "one category aggregate broadcast back onto the scan (the encode "
        "is a scan-side projection; no window over the data, no fact "
        "shuffle) — operators/relational.py::target_encode_loo.",
)
def _q_orders_target_encoding(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    enc = relational.target_encode_loo(
        o, "o_orderpriority", "o_totalprice", m=10.0)
    return enc.orderBy("o_orderkey").limit(50)


@_register(
    "lineitem_skew_profile",
    """
    WITH c AS (SELECT l_suppkey, count(*) AS cnt
               FROM lineitem GROUP BY 1),
    w AS (SELECT l_suppkey, cnt,
                 row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rank,
                 sum(cnt) OVER () AS total,
                 sum(cnt) OVER (ORDER BY cnt DESC, l_suppkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS run,
                 count(*) OVER () AS n_keys,
                 max(cnt) OVER () AS mx
          FROM c)
    SELECT CAST(rank AS INTEGER) AS rank, l_suppkey, cnt,
           round(cnt / total, 6) AS share,
           round(run / total, 6) AS cum_share,
           CAST(n_keys AS BIGINT) AS n_keys,
           round(mx * n_keys / total, 4) AS skew_ratio
    FROM w WHERE rank <= 10
    """,
    doc="shuffle-key skew diagnostic on lineitem.l_suppkey: top heavy "
        "keys with share/cumulative share plus max/mean skew ratio — the "
        "pre-flight check before keying a 100 TB shuffle (salt or AQE-"
        "split when the ratio blows up). One partial+final key aggregate; "
        "all windows run over the per-key AGGREGATE frame (bounded by key "
        "cardinality; CMS heavy-hitters is the unbounded-cardinality "
        "dial) — operators/relational.py::key_skew_profile.",
)
def _q_lineitem_skew_profile(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return relational.key_skew_profile(li, "l_suppkey", top=10)


@_register(
    "orders_mutual_information",
    """
    WITH c AS (SELECT o_orderpriority AS x, o_orderstatus AS y,
                      count(*) AS n
               FROM orders GROUP BY 1, 2),
    s AS (SELECT x, y, n,
                 n / (sum(n) OVER ()) AS pxy,
                 (sum(n) OVER (PARTITION BY x)) / (sum(n) OVER ()) AS px,
                 (sum(n) OVER (PARTITION BY y)) / (sum(n) OVER ()) AS py
          FROM c)
    SELECT x AS o_orderpriority, y AS o_orderstatus, n,
           round(pxy, 6) AS p_xy,
           round(ln(pxy / (px * py)), 6) AS pmi,
           round(pxy * ln(pxy / (px * py)), 6) AS mi_term,
           round(sum(pxy * ln(pxy / (px * py))) OVER (), 6) AS mi_total
    FROM s
    """,
    doc="mutual information (nats) between order priority and status "
        "with per-cell pointwise MI — quantifies the dependence the "
        "chi-square test only detects; the feature-selection/redundancy "
        "statistic. One (x, y) count aggregate; marginal/total windows "
        "run over the <= |X|x|Y|-cell AGGREGATE frame, never the data — "
        "operators/relational.py::mutual_information.",
)
def _q_orders_mutual_information(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return relational.mutual_information(
        o, "o_orderpriority", "o_orderstatus")


@_register(
    "orders_roc_auc",
    """
    WITH b AS (SELECT list_distinct(quantile_cont(o_totalprice,
                 [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5,
                  0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95])) AS bs
               FROM orders),
    a AS (SELECT 1 + len(list_filter(b.bs, x -> x < o_totalprice))
                   AS bucket,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
          FROM orders, b),
    g AS (SELECT bucket, sum(pos) AS n_pos, sum(1 - pos) AS n_neg
          FROM a GROUP BY bucket),
    p AS (SELECT row_number() OVER (ORDER BY bucket DESC) AS point,
                 n_pos, n_neg,
                 (sum(n_pos) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   / (sum(n_pos) OVER ()) AS tpr,
                 (sum(n_neg) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   / (sum(n_neg) OVER ()) AS fpr
          FROM g),
    t AS (SELECT point, n_pos, n_neg, fpr, tpr,
                 (fpr - lag(fpr, 1, 0.0) OVER (ORDER BY point))
                   * (tpr + lag(tpr, 1, 0.0) OVER (ORDER BY point)) / 2
                   AS trap
          FROM p)
    SELECT CAST(point AS INTEGER) AS point,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           round(fpr, 6) AS fpr, round(tpr, 6) AS tpr,
           round(sum(trap) OVER (), 6) AS auc_total
    FROM t
    """,
    doc="binned ROC curve + trapezoid AUC of total price as a predictor "
        "of finished status, thresholded at the score's 20-quantile "
        "boundaries — the curation-classifier evaluation statistic, "
        "computed WITHOUT the textbook rank-sum's global sort: one "
        "percentile aggregate (approx_percentile at 100 TB, same plan) "
        "broadcast, scan-side bucket fold, one bucket aggregate; "
        "TPR/FPR/trapezoid windows run over the <= 20-row AGGREGATE "
        "frame. r14 hardening: null score/label values raise in-plan "
        "(a null label silently scored as a NEGATIVE and biased every "
        "TPR/FPR point), aligning the eval-tool contract with "
        "calibration_bins — operators/relational.py::roc_auc_binned.",
)
def _q_orders_roc_auc(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return relational.roc_auc_binned(
        o, "o_totalprice", F.col("o_orderstatus") == "F", bins=20)


@_register(
    "events_rolling_anomaly",
    """
    WITH w AS (SELECT user_id,
                      epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
                      event_id, value,
                      count(value) OVER f AS n_prior,
                      avg(value) OVER f AS m,
                      stddev_samp(value) OVER f AS sd
               FROM events
               WHERE value IS NOT NULL
               WINDOW f AS (PARTITION BY user_id
                            ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)),
                                     event_id
                            ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT user_id, ts_ms, event_id, value,
           CAST(n_prior AS BIGINT) AS n_prior,
           round(m, 6) AS roll_mean,
           round(sd, 6) AS roll_std,
           round((value - m) / sd, 4) AS zscore
    FROM w
    WHERE n_prior >= 8 AND sd > 1e-9 AND abs((value - m) / sd) >= 3.0
    """,
    doc="per-user rolling z-score anomaly flags: each event scored "
        "against the mean/stddev of its own trailing 20 PRIOR non-null "
        "observations (null values are dropped before the window, the "
        "same trailing-value semantics as the live streaming twin's "
        "O(w) ring; strictly causal — the row never sees itself), "
        "|z| >= 3 with a "
        "min_n=8 cold-start guard. One hash shuffle on user_id + per-key "
        "sort (the sessionize/asof exchange shape); the sliding frame "
        "bounds state at w values per key regardless of run length — "
        "operators/relational.py::rolling_anomaly.",
)
def _q_events_rolling_anomaly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.rolling_anomaly(
        ev.select("user_id", "ts_ms", "event_id", "value"),
        key="user_id", ts="ts_ms", value="value", id_col="event_id",
        w=20, z_thresh=3.0, min_n=8)


@_register(
    "events_ab_welch_ttest",
    """
    WITH v AS (SELECT CAST('0x' || substr(md5('ab9:' ||
                   CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
                 AS variant,
               value
               FROM events),
    g AS (SELECT variant, count(value) AS n, avg(value) AS m,
                 var_samp(value) AS vv
          FROM v GROUP BY 1),
    r AS (SELECT max(CASE WHEN variant = 0 THEN n END) AS n_a,
                 max(CASE WHEN variant <> 0 THEN n END) AS n_b,
                 max(CASE WHEN variant = 0 THEN m END) AS ma,
                 max(CASE WHEN variant <> 0 THEN m END) AS mb,
                 max(CASE WHEN variant = 0 THEN vv END) AS va,
                 max(CASE WHEN variant <> 0 THEN vv END) AS vb
          FROM g)
    SELECT n_a, n_b,
           round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
           round(va, 4) AS var_a, round(vb, 4) AS var_b,
           round((ma - mb) / sqrt(va / n_a + vb / n_b), 4) AS t_stat,
           round((va / n_a + vb / n_b) * (va / n_a + vb / n_b)
                 / ((va / n_a) * (va / n_a) / (n_a - 1)
                    + (vb / n_b) * (vb / n_b) / (n_b - 1)), 2) AS df_welch,
           abs((ma - mb) / sqrt(va / n_a + vb / n_b)) > 1.96
             AS significant_05
    FROM r
    """,
    doc="Welch's two-sample t-test on event value between the two arms "
        "of a deterministic md5 user-level A/B assignment (the "
        "experiment-analysis primitive; unequal-variance form with "
        "Welch-Satterthwaite df). ONE variant-keyed moment aggregate "
        "(count/mean/var running sums — observations never move), folded "
        "to one row — operators/relational.py::welch_ttest.",
)
def _q_events_ab_welch_ttest(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # the shared factored split (r13 dedup): the Welch arm reads THE
    # SAME _ab9_variant() expression the SRM gate, SPRT monitor, and
    # Mann-Whitney test audit, so the four can never silently
    # desynchronize on the assignment
    return relational.welch_ttest(
        ev.select(_ab9_variant().alias("variant"), "value"),
        "variant", "value")


@_register(
    "events_kaplan_meier",
    """
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
                 -- (int128); the driver's value-hash is type-sensitive,
                 -- so an uncasted window sum hash-mismatches Spark's
                 -- int64 even when values are bit-exact (r9 lesson —
                 -- the registry-wide type lint now pins this).
                 CAST(sum(n_event + n_censor) OVER ()
                   - coalesce(sum(n_event + n_censor) OVER
                       (ORDER BY duration_h
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
          FROM t),
    k AS (SELECT duration_h, n_event, n_censor, n_risk,
                 max(CASE WHEN n_event >= n_risk THEN 1 ELSE 0 END)
                   OVER cum AS dead,
                 sum(CASE WHEN n_event > 0 AND n_event < n_risk
                          THEN ln(1.0 - n_event / n_risk)
                          ELSE 0.0 END) OVER cum AS lsum
          FROM s
          WINDOW cum AS (ORDER BY duration_h
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW))
    SELECT duration_h, n_risk, n_event, n_censor,
           CASE WHEN dead = 1 THEN 0.0
                ELSE round(exp(lsum), 6) END AS survival
    FROM k
    """,
    doc="Kaplan-Meier product-limit survival curve over per-user "
        "observation spans (event = the user ever purchases, censored "
        "otherwise; duration = hours between first and last activity) — "
        "the churn/time-to-event estimator. One user-keyed aggregate -> "
        "one duration-keyed aggregate; risk-set and exp(running ln-sum) "
        "product windows run over the <= distinct-durations AGGREGATE "
        "frame. r14 hardening (shared _survival_counts, stack-wide): "
        "observed outside {0,1} incl. null and null durations raise "
        "in-plan — operators/relational.py::kaplan_meier.",
)
def _q_events_kaplan_meier(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    return relational.kaplan_meier(per_user, "duration_h", "observed")


@_register(
    "orders_benford_audit",
    """
    WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
               FROM orders),
    a AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit,
                 count(*) AS n
          FROM c WHERE cents > 0 GROUP BY 1),
    d AS (SELECT CAST(range AS INTEGER) AS digit FROM range(1, 10)),
    j AS (SELECT d.digit, CAST(coalesce(a.n, 0) AS BIGINT) AS n
          FROM d LEFT JOIN a USING (digit)),
    p AS (SELECT digit, n,
                 CASE WHEN sum(n) OVER () > 0
                      THEN n / (sum(n) OVER ()) END AS obs,
                 ln(1.0 + 1.0 / digit) / ln(10.0) AS expp,
                 sum(n) OVER () AS total
          FROM j)
    SELECT digit, n,
           round(obs, 6) AS obs_pct,
           round(expp, 6) AS exp_pct,
           round(sum((obs - expp) * (obs - expp) / expp * total) OVER (),
                 4) AS chisq_total
    FROM p
    """,
    doc="Benford first-digit audit of order totals: observed vs expected "
        "leading-digit shares + chi-square distance — the forensic/"
        "synthetic-data smell test. Digit extracted via integer string "
        "math (exact cents -> leading digit), never log10 floors; the "
        "counts are left-joined onto the full 1..9 domain so an absent "
        "digit still contributes its (0-E)^2/E*N chi term (the textbook "
        "goodness-of-fit); one digit aggregate, all shares over the "
        "9-row frame — operators/relational.py::benford_audit.",
)
def _q_orders_benford_audit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return relational.benford_audit(o, "o_totalprice")


@_register(
    "lineitem_fd_violations",
    """
    WITH per AS (SELECT l_partkey,
                        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_rhs,
                        count(*) AS n_rows
                 FROM lineitem GROUP BY 1),
    s AS (SELECT count(*) AS n_keys,
                 CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating
          FROM per)
    SELECT l_partkey, n_rhs, n_rows,
           CAST(s.n_keys AS BIGINT) AS n_keys, s.n_violating,
           round(1.0 - s.n_violating / s.n_keys, 6) AS fd_holds_pct
    FROM per CROSS JOIN s
    WHERE n_rhs > 1
    ORDER BY n_rhs DESC, n_rows DESC, l_partkey
    LIMIT 10
    """,
    doc="functional-dependency audit: does l_partkey determine "
        "l_suppkey? Top violating keys plus corpus FD-health columns "
        "(Metanome-style single-dependency profiling — the data-contract "
        "check). One lhs aggregate with an exact two-column DISTINCT, a "
        "1-row summary broadcast back, TakeOrdered top violators — no "
        "window, no global sort — "
        "operators/relational.py::fd_violations.",
)
def _q_lineitem_fd_violations(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return relational.fd_violations(li, "l_partkey", "l_suppkey", top=10)


@_register(
    "events_cusum_changepoint",
    """
    WITH b AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS bin,
                      value
               FROM events),
    g AS (SELECT bin, count(value) AS n, avg(value) AS m
          FROM b GROUP BY 1),
    g2 AS (SELECT bin, n, m, avg(m) OVER () AS xbar FROM g),
    s AS (SELECT bin, n, m,
                 sum(m - xbar) OVER
                   (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS cs
          FROM g2),
    p AS (SELECT *, first_value(bin) OVER
                      (ORDER BY abs(cs) DESC, bin
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS cp,
                 max(abs(cs)) OVER () AS mx
          FROM s)
    SELECT CAST(bin AS BIGINT) AS bin_idx,
           CAST(n AS BIGINT) AS n,
           round(m, 6) AS bin_mean,
           round(cs, 6) AS cusum,
           round(mx, 6) AS max_abs_cusum,
           CAST(cp AS BIGINT) AS changepoint_bin,
           bin = cp AS is_changepoint
    FROM p
    """,
    doc="CUSUM change-point detection over hourly event-value means: "
        "S_t = running sum of (bin mean - series mean), peak |S| "
        "localizes the level shift the drift monitors only detect — "
        "the classic sequential-monitoring estimator. One bin-keyed "
        "partial+final aggregate; series-mean / running-CUSUM / "
        "arg-peak windows all run over the <= #bins AGGREGATE frame — "
        "operators/relational.py::cusum_changepoint.",
)
def _q_events_cusum_changepoint(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.cusum_changepoint(
        ev.select("ts_ms", "value"), ts="ts_ms", value="value",
        bin_ms=3_600_000)


# ---------------------------------------------------------------------------
# Flashscore intake format parity (SURVEY.md §2.1: JSON + XML twins)
# ---------------------------------------------------------------------------

#: The six-record adversarial dump of tests/test_flashscore.py::_record —
#: clean row, non-Finished (filtered), null country (na.drop on MATCH,
#: kept by the lineup/odds branches), non-numeric score (try_cast null),
#: 10-player home lineup (skipped), and a short-arity + off-roster
#: bookmaker list (null odds cells).
_PARITY_RECORDS = [
    {
        "current_status": st, "current_country": co,
        "current_tournament": "Ligue 1",
        "participant_home": ho, "participant_away": "OM",
        "participant_home_current_score": hs,
        "participant_away_current_score": "1",
        "year": 2023, "month": 11, "day": 4, "hour": 18, "minute": 38,
        "match_hour": "18:38",
        "lineups_data": {
            "Team1": [{"name": f"H{i}"} for i in range(1, hn + 1)],
            "Team2": [{"name": f"A{i}"} for i in range(1, 12)],
        },
        "bookmakers_data": bm if bm is not None else [
            {"bookmaker": "Betclic.fr", "odds": ["1.5", "3.2", "5.0"]},
            {"bookmaker": "bet365", "odds": ["1.4", "3.5", "5.5"]},
        ],
    }
    for st, co, ho, hs, hn, bm in [
        ("Finished", "France", "PSG", "2", 11, None),
        ("Scheduled", "France", "Lyon", "2", 11, None),
        ("Finished", None, "Lille", "2", 11, None),
        ("Finished", "France", "Nantes", "abc", 11, None),
        ("Finished", "France", "Brest", "2", 10, None),
        ("Finished", "France", "Nice", "2", 11, [
            {"bookmaker": "Betclic.fr", "odds": ["1.1", "2.2"]},
            {"bookmaker": "Winamax", "odds": ["2.0", "3.0", "4.0"]},
        ]),
    ]
]


def _parity_xml_of(tag, val):
    # the tests/test_xml_source.py::_xml_of convention: None -> omitted
    # element (the JSON-null twin), list -> repeated elements
    if val is None:
        return ""
    if isinstance(val, dict):
        return (f"<{tag}>"
                + "".join(_parity_xml_of(k, v) for k, v in val.items())
                + f"</{tag}>")
    if isinstance(val, list):
        return "".join(_parity_xml_of(tag, v) for v in val)
    return f"<{tag}>{val}</{tag}>"


def _write_parity_dumps() -> tuple[str, str]:
    import json as _json
    import os

    d = "/tmp/spark_graft_format_parity"
    os.makedirs(d, exist_ok=True)
    jp, xp = f"{d}/dump.json", f"{d}/dump.xml"
    with open(jp, "w") as f:
        _json.dump(_PARITY_RECORDS, f)
    body = "".join(_parity_xml_of("match", r) for r in _PARITY_RECORDS)
    with open(xp, "w") as f:
        f.write(f"<matches>{body}</matches>")
    return jp, xp


def _canonical_rows(tdf: DataFrame, fmt: str, table: str) -> DataFrame:
    """(source_format, table_name, __r) — one canonical row string per
    table row. DATE_LOAD (wall clock) is excluded; float cells
    canonicalize as round(x*1000) BIGINT milli-units (cross-engine
    string rendering of doubles is not pinned; integer strings are);
    nulls as a '~null~' marker so concat_ws's null-skip can never alias
    two different rows."""
    cells = []
    for c, t in tdf.dtypes:
        if c == "DATE_LOAD":
            continue
        col = f"`{c}`"
        if t in ("float", "double"):
            col = (f"CAST(round(CAST({col} AS DOUBLE) * 1000, 0) "
                   f"AS BIGINT)")
        cells.append(f"coalesce(CAST({col} AS STRING), '~null~')")
    # one selectExpr per table — the Column form cost ~40 py4j
    # round-trips per table, ~0.4 s of pure driver time over 8 tables
    return tdf.selectExpr(f"'{fmt}' AS source_format",
                          f"'{table}' AS table_name",
                          f"concat_ws('|', {', '.join(cells)}) AS __r")


def _fingerprint_frame(tdf: DataFrame, fmt: str, table: str) -> DataFrame:
    """(source_format, table_name, n_rows, content_md5) for one pipeline
    table: md5 over the sorted canonical row strings of
    ``_canonical_rows``."""
    agg = _canonical_rows(tdf, fmt, table).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.md5(F.array_join(F.array_sort(F.collect_list("__r")), "\n"))
         .alias("content_md5"))
    return agg.select(
        F.lit(fmt).alias("source_format"),
        F.lit(table).alias("table_name"),
        "n_rows", "content_md5")


def _format_parity_sql() -> str:
    """The oracle rebuilds all four pipeline tables IN SQL from the same
    literal input records (filter -> na.drop -> try_cast -> sha256 id ->
    lineup arity guard -> bookmaker probe + odds widening), fingerprints
    them identically, and expects BOTH intake formats to match that
    derivation — an independent replay of the whole flashscore
    transform, not an echo of Spark's output."""
    from data_pipeline_eng_project_1_spark.operators.nested import (
        BOOKMAKERS,
    )

    def lit_rec(r):
        co = ("NULL" if r["current_country"] is None
              else f"'{r['current_country']}'")
        t1 = ", ".join(f"'{p['name']}'" for p in r["lineups_data"]["Team1"])
        t2 = ", ".join(f"'{p['name']}'" for p in r["lineups_data"]["Team2"])
        bms = ", ".join(
            "{'bookmaker': '%s', 'odds': [%s]}"
            % (b["bookmaker"], ", ".join(f"'{o}'" for o in b["odds"]))
            for b in r["bookmakers_data"])
        return (f"('{r['current_status']}', {co}, "
                f"'{r['current_tournament']}', "
                f"'{r['participant_home']}', '{r['participant_away']}', "
                f"'{r['participant_home_current_score']}', "
                f"'{r['participant_away_current_score']}', "
                f"{r['year']}, {r['month']}, {r['day']}, {r['hour']}, "
                f"{r['minute']}, [{t1}], [{t2}], [{bms}])")

    values = ",\n      ".join(lit_rec(r) for r in _PARITY_RECORDS)
    odd_cells = []
    for name in BOOKMAKERS:
        trip = (f"(CASE WHEN len(list_filter(bms, b -> b.bookmaker = "
                f"'{name}')[1].odds) = 3 THEN list_filter(bms, "
                f"b -> b.bookmaker = '{name}')[1].odds END)")
        for i in (1, 2, 3):
            odd_cells.append(
                f"coalesce(CAST(CAST(round(TRY_CAST({trip}[{i}] AS DOUBLE)"
                f" * 1000, 0) AS BIGINT) AS VARCHAR), '~null~')")
    odds_concat = ",\n             ".join(odd_cells)
    p11 = ", ".join(f"team1[{i}]" for i in range(1, 12))
    p11b = ", ".join(f"team2[{i}]" for i in range(1, 12))
    return f"""
    WITH raw(status, country, tournament, home, away, hs, ascore,
             yy, mm, dd, hh, mi, team1, team2, bms) AS (VALUES
      {values}
    ),
    fin AS (SELECT *, sha256(concat_ws('|', country, tournament, home,
                                       away, yy, mm, dd, hh, mi)) AS id
            FROM raw WHERE status = 'Finished'),
    mrows AS (
      SELECT concat_ws('|', id, yy, mm, dd, hh, mi, country, tournament,
                       home,
                       coalesce(CAST(TRY_CAST(hs AS INTEGER) AS VARCHAR),
                                '~null~'),
                       away,
                       coalesce(CAST(TRY_CAST(ascore AS INTEGER)
                                     AS VARCHAR), '~null~')) AS r
      FROM fin
      WHERE country IS NOT NULL AND tournament IS NOT NULL
        AND home IS NOT NULL AND away IS NOT NULL
        AND hs IS NOT NULL AND ascore IS NOT NULL
        AND yy IS NOT NULL AND mm IS NOT NULL AND dd IS NOT NULL
        AND hh IS NOT NULL AND mi IS NOT NULL),
    hrows AS (SELECT concat_ws('|', id, {p11}) AS r
              FROM fin WHERE len(team1) = 11),
    arows AS (SELECT concat_ws('|', id, {p11b}) AS r
              FROM fin WHERE len(team2) = 11),
    orows AS (
      SELECT concat_ws('|', id,
             {odds_concat}) AS r
      FROM fin),
    exp AS (
      SELECT 'MATCH_FINISHED' AS table_name, count(*) AS n_rows,
             md5(string_agg(r, chr(10) ORDER BY r)) AS content_md5
      FROM mrows
      UNION ALL
      SELECT 'HOME_STARTING_LINEUP', count(*),
             md5(string_agg(r, chr(10) ORDER BY r)) FROM hrows
      UNION ALL
      SELECT 'AWAY_STARTING_LINEUP', count(*),
             md5(string_agg(r, chr(10) ORDER BY r)) FROM arows
      UNION ALL
      SELECT 'ODDS', count(*),
             md5(string_agg(r, chr(10) ORDER BY r)) FROM orows)
    SELECT f.fmt AS source_format, e.table_name, e.n_rows, e.content_md5
    FROM (VALUES ('json'), ('xml')) f(fmt) CROSS JOIN exp e
    ORDER BY source_format, table_name
    """


@_register(
    "flashscore_format_parity",
    _format_parity_sql(),
    doc="JSON-vs-XML intake parity as a GRADED invariant: the six-record "
        "adversarial dump is published in both formats, both flow through "
        "the UNCHANGED downstream plan, and each of the four pipeline "
        "tables is fingerprinted (n_rows + md5 of sorted canonical rows, "
        "DATE_LOAD excluded, float cells as milli-unit BIGINTs). The "
        "oracle REBUILDS all four tables in SQL from the same literal "
        "records — filter, na.drop, try_cast coercion, sha256 match id, "
        "lineup arity guard, bookmaker probe with odds widening — so a "
        "divergence in either intake OR any transform rule "
        "hash-mismatches. Format is an intake option, not a pipeline "
        "fork (sources/xml_source.py; plans/flashscore.py).",
)
def _q_flashscore_format_parity(spark, sf_dir):
    from data_pipeline_eng_project_1_spark.plans import flashscore
    from data_pipeline_eng_project_1_spark.sources.json_source import (
        read_matches,
    )
    from data_pipeline_eng_project_1_spark.sources.xml_source import (
        read_matches_xml,
    )

    from data_pipeline_eng_project_1_spark.plans import llm_ops

    jp, xp = _write_parity_dumps()
    frames = []
    for fmt, src in (("json", read_matches(spark, jp)),
                     ("xml", read_matches_xml(spark, xp))):
        # Parse each dump ONCE (r17, guide §2.4/§5): the four table
        # branches otherwise each re-run the multiLine-JSON / XML intake
        # — the r16 plan held 8 format scans. The parsed source is
        # record-count-sized (the parity fixture), and at a real intake
        # scale "land the parse once, fan the tables out of it" is
        # exactly what run_pipeline's parquet landing does.
        src = llm_ops._ckpt(src)
        for name, tdf in flashscore.transform_all(src).items():
            frames.append(_canonical_rows(tdf, fmt, name))
    rows = frames[0]
    for f in frames[1:]:
        rows = rows.unionByName(f)
    # ONE keyed aggregate instead of 8 global ones (8 partial+final
    # exchange stage pairs -> 1): per (format, table) the count and the
    # md5-over-sorted-rows are computed by the identical expressions, so
    # the output rows are unchanged. The 8 groups are literal keys — the
    # exchange carries 8 tiny partitions; no group can be empty (the
    # parity records are code literals and every table keeps >= 1 row).
    return (rows.groupBy("source_format", "table_name")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.md5(F.array_join(F.array_sort(F.collect_list("__r")),
                                    "\n")).alias("content_md5"))
            .orderBy("source_format", "table_name"))


@_register(
    "events_seasonal_outliers",
    """
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
    """,
    doc="seasonal-profile outliers: events whose value is >= 3 sigma "
        "from their HOUR-OF-DAY bucket's (mean, stddev) profile — the "
        "PROFILE complement of the graded causal-window rolling_anomaly "
        "('high for 3 AM' vs 'high vs recent history'); min_n=8 guards "
        "cold buckets. Scale shape: ONE (bucket) aggregate folds the "
        "stream to a <= 24-row profile, broadcast back onto the scan — "
        "scoring is a scan-side projection, the facts NEVER shuffle "
        "(plan-asserted). The live stream-static twin "
        "(streaming/pipeline.py::seasonal_gate_stream) broadcast-joins "
        "the same batch-built profile onto a stream "
        "(operators/relational.py::seasonal_outliers).",
)
def _q_events_seasonal_outliers(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.seasonal_outliers(
        ev.select("event_id", "ts_ms", "value"),
        ts="ts_ms", value="value", id_col="event_id",
        period_ms=3_600_000, cycle=24, z_thresh=3.0, min_n=8)


@_register(
    "orders_kfold_audit",
    """
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
    """,
    doc="deterministic k-fold assignment + balance audit: every order "
        "gets fold = md5('fold:' || key) % 5 (stable across runs, "
        "engines, partitionings — the graded A/B assignment's hex-int "
        "trick), then per (fold, priority) cell the stratum's share "
        "WITHIN its fold is compared to the stratum's global share — "
        "the CV-hygiene check that a hash split is stratum-balanced. "
        "Scale shape: scan-side fold algebra + ONE partial+final "
        "(fold, stratum) aggregate; every share/gap/max window runs "
        "over the <= k*|strata| AGGREGATE frame (25 rows here), never "
        "the orders; raises in-plan on null ids (a null id has no "
        "fold) (operators/relational.py::kfold_assignment_audit).",
)
def _q_orders_kfold_audit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return relational.kfold_assignment_audit(
        o.select("o_orderkey", "o_orderpriority"),
        id_col="o_orderkey", stratum="o_orderpriority", k=5, seed="fold")


@_register(
    "events_acf_hourly",
    """
    WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS bin
               FROM events),
    g AS (SELECT bin, count(*) AS n FROM e GROUP BY 1),
    r AS (SELECT min(bin) AS lo, max(bin) AS hi FROM g),
    filled AS (SELECT gs.bin, coalesce(g.n, 0) * 1.0 AS x
               FROM (SELECT unnest(generate_series(lo, hi)) AS bin
                     FROM r) gs
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
    """,
    doc="sample autocorrelation of the HOURLY event-count series at "
        "lags 1..24, gap-filled with zero counts (an hour with no "
        "events is a real zero of the series, not a missing "
        "observation) — the periodicity diagnostic that tells you WHICH "
        "cycle the seasonal profile and drift monitors should condition "
        "on (a daily cycle peaks at lag 24). Scale shape: ONE "
        "partial+final (bin) aggregate touches the events exactly once; "
        "the gap-fill sequence (max_bins-guarded), centering window, "
        "24 lead windows, and the products fold ALL run over the "
        "<= #bins AGGREGATE frame (plan-asserted); the oracle computes "
        "the same lag products via a bounded self-join of the 720-row "
        "binned frame (operators/relational.py::acf_binned).",
)
def _q_events_acf_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.acf_binned(
        ev.select("ts_ms"), ts="ts_ms", bin_ms=3_600_000, max_lag=24)


@_register(
    "nation_customer_gini",
    """
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
    """,
    doc="per-nation Gini concentration of customer spend via the rank "
        "identity G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over the "
        "(spend, custkey)-ordered members — 'how dependent is this "
        "nation's revenue on its top customers', the concentration "
        "audit behind mixture-balance decisions. Scale shape: the "
        "per-customer spend AGGREGATE collapses orders first, the rank "
        "window partitions by nation over THAT frame (one exchange on "
        "the group, never the raw orders), and the final (nation) "
        "aggregate folds each partition to a row; nulls drop before "
        "ranking, negative values raise in-plan "
        "(operators/relational.py::gini_by_group).",
)
def _q_nation_customer_gini(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    per = (o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
           .join(c.select("c_custkey", "c_nationkey"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(nat.select("n_nationkey", "n_name")),
                 F.col("c_nationkey") == F.col("n_nationkey")))
    return relational.gini_by_group(
        per.select("n_name", "spend", "c_custkey"),
        group="n_name", value="spend", id_col="c_custkey")


@_register(
    "events_session_top_paths",
    """
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
    """,
    doc="top session journeys: the 20 most frequent event-type TRIGRAM "
        "runs within DAILY sessions (24 h gap — the graded 30-minute "
        "sessionize gap leaves almost no 3-event runs at fixture "
        "time-density), ties broken by path text — whole-journey "
        "sequence mining, the path complement of the graded memoryless "
        "Markov transition matrix. Scale shape: ONE hash exchange on "
        "user_id carries sessionize AND the path leads (cross-session "
        "runs drop by session-id equality — no second (key, session) "
        "exchange, plan-asserted); '>' in a type value raises in-plan "
        "(path-splice guard); counting is one aggregate over the "
        "<= |types|^3 frame and the top-20 ships as TakeOrdered "
        "(operators/relational.py::session_top_paths).",
)
def _q_events_session_top_paths(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.session_top_paths(
        ev.select("user_id", "ts_ms", "event_id", "event_type"),
        key="user_id", ts="ts_ms", type_col="event_type",
        id_col="event_id", gap=86_400_000, path_len=3, top=20)


def _ab9_variant():
    """The graded Welch query's deterministic md5 user-level A/B
    assignment — the SRM audit and SPRT monitor gate THE SAME split the
    Welch result reads, so the three registrations form one coherent
    experiment stack."""
    return (hashing.hex_int(
        F.concat(F.lit("ab9:"), F.col("user_id").cast("string"))) % 2)


@_register(
    "events_srm_check",
    """
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
    """,
    doc="sample-ratio-mismatch audit: chi-square GOODNESS-OF-FIT of the "
        "md5 A/B assignment's observed variant counts against its "
        "declared 50/50 split (df = 1, critical value 3.841 at 5%) — "
        "the experiment-health gate in front of the graded Welch test "
        "and the SPRT monitor (a broken splitter or logging path shows "
        "up here before it corrupts either result). Distinct from the "
        "graded chi-square INDEPENDENCE test: one-way with a-priori "
        "shares, not two-way with estimated margins. Declared-but-"
        "absent variants keep their E*N chi term via a k-row domain "
        "join (the benford absent-digit lesson); undeclared observed "
        "variants raise in-plan. Scale shape: ONE partial+final "
        "(variant) aggregate folds the events to <= k rows; the domain "
        "join and every share/chi/total window run over that AGGREGATE "
        "frame (operators/relational.py::srm_check). Live stateful "
        "twin: streaming/pipeline.py::srm_stream (per-look chi-square "
        "from O(k) cumulative state).",
)
def _q_events_srm_check(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.srm_check(
        ev.select(_ab9_variant().cast("int").alias("variant")),
        "variant", {0: 0.5, 1: 0.5}, chi2_threshold=3.841)


#: SPRT constants under the rate-ratio alternative p1 = 1.5 * p0
#: (q = r/(1+r)) at alpha = beta = 0.05 — computed ONCE here and inlined
#: as repr() double literals in the oracle SQL exactly as the live
#: operator inlines them as F.lit doubles (the pca_power literal-handoff
#: convention), so both engines' running sums multiply bit-identical
#: operands.
_SPRT_Q = 1.5 / (1.0 + 1.5)
_SPRT_C1 = math.log(2.0 * _SPRT_Q)
_SPRT_C0 = math.log(2.0 * (1.0 - _SPRT_Q))
_SPRT_LN_A = math.log((1.0 - 0.05) / 0.05)
_SPRT_LN_B = math.log(0.05 / (1.0 - 0.05))


@_register(
    "events_sprt_ab",
    f"""
    WITH e AS (SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
                      CAST('0x' || substr(md5('ab9:' ||
                          CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
                        AS variant
               FROM events WHERE event_type = 'purchase'),
    b AS (SELECT ts_ms // 3600000 AS bin, count(*) AS n_succ,
                 sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b
          FROM e GROUP BY 1),
    s AS (SELECT bin, n_succ, n_b,
                 n_b * CAST({_SPRT_C1!r} AS DOUBLE)
                   + (n_succ - n_b) * CAST({_SPRT_C0!r} AS DOUBLE) AS lb
          FROM b),
    r AS (SELECT *, sum(lb) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM s),
    x AS (SELECT *, CASE WHEN run >= {_SPRT_LN_A!r} THEN 'accept_h1'
                         WHEN run <= {_SPRT_LN_B!r} THEN 'accept_h0'
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
    """,
    doc="Wald sequential probability ratio test on the A/B purchase-"
        "success stream of the same md5 split the Welch test grades "
        "(success-from-B reduction: each success is variant 1 with "
        "prob 1/2 under H0, q = r/(1+r) under the rate-ratio "
        "alternative p1 = 1.5 * p0; alpha = beta = 0.05), decisions "
        "evaluated at hourly bin boundaries — says WHEN the evidence "
        "crossed a Wald boundary instead of requiring a fixed horizon; "
        "at the graded scale the no-lift md5 split correctly drifts to "
        "accept_h0. The four log constants are computed once and "
        "inlined as identical double literals on both engines (the "
        "pca_power literal-handoff convention). Scale shape: scan-side "
        "success filter + ONE partial+final (bin) aggregate; running-"
        "LLR / crossing / first-decision windows all ride the <= #bins "
        "AGGREGATE frame, never the events "
        "(operators/relational.py::sprt_ab). Live stateful twin: "
        "streaming/pipeline.py::sprt_stream (O(1) state — the LLR is "
        "an arrival-order-invariant sum).",
)
def _q_events_sprt_ab(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.sprt_ab(
        ev.select("ts_ms", "event_type",
                  _ab9_variant().cast("int").alias("variant")),
        ts="ts_ms", variant="variant",
        success=F.col("event_type") == "purchase",
        lift_ratio=1.5, alpha=0.05, beta=0.05, bin_ms=3_600_000)


@_register(
    "events_mannwhitney_value",
    """
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
                 coalesce(sum(c0 + c1) OVER (PARTITION BY etype
                     ORDER BY value
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
           CASE WHEN s2 > 0 THEN round((u1 - mu) / sqrt(s2), 4)
           END AS z_stat,
           CASE WHEN s2 > 0 THEN abs((u1 - mu) / sqrt(s2)) > 1.96
           END AS significant_05
    FROM s
    """,
    doc="tie-corrected Mann-Whitney U / rank-sum z-test of event value "
        "between the md5 A/B arms, one independent test per event_type "
        "— the NONPARAMETRIC complement to the graded Welch test "
        "(robust to the heavy tails that wreck a t-test on revenue-like "
        "values), completing the experiment stack: srm_check gates the "
        "split, welch tests means, this tests distributions, sprt "
        "monitors sequentially. RANK-FUNCTION-FREE: 2*avg_rank = "
        "2*prefix_count + t + 1 is an INTEGER derived from a "
        "(group, value) count aggregate, so the rank sum and tie term "
        "are integer-exact sums on both engines (neither engine calls "
        "rank()); the only double math is per-group scalar algebra "
        "written with identical operand order in both. Scale shape: "
        "ONE (group, value) aggregate collapses observations; the "
        "rank-prefix window and the per-group fold ride a second "
        "group-keyed exchange over the DISTINCT-VALUE frame — no "
        "global sort, no join "
        "(operators/relational.py::mann_whitney_u).",
)
def _q_events_mannwhitney_value(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.mann_whitney_u(
        ev.select(F.col("event_type").alias("etype"),
                  _ab9_variant().cast("int").alias("variant"), "value"),
        group="etype", variant="variant", value="value")


@_register(
    "events_nelson_aalen",
    """
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
    """,
    doc="Nelson-Aalen cumulative-hazard estimator over the SAME "
        "per-user duration/observed survival frame the graded "
        "events_kaplan_meier reads (duration = hours between first and "
        "last activity, event = the user ever purchases) — the two "
        "estimators view one frame from its two canonical sides "
        "(product-limit survival vs running hazard sum; exp(-H) "
        "approximates S). Also reports the classical d/n^2 variance, "
        "divided TWICE (d/n/n) so the integer square can't overflow at "
        "scale on either engine; no zero-latch is needed (the "
        "all-at-risk-fail row contributes d/n = 1 like any other). The "
        "cumulative sums are ordered-window double sums — ONE "
        "deterministic addition order on both engines; the oracle "
        "CASTs its windowed BIGINT sums (the r9 kaplan HUGEINT "
        "lesson). r14 hardening (shared _survival_counts, stack-wide): "
        "observed outside {0,1} incl. null and null durations raise "
        "in-plan. Scale shape: one user-keyed aggregate -> one "
        "duration-keyed aggregate; risk-set and running-sum windows "
        "ride the <= distinct-durations AGGREGATE frame "
        "(operators/relational.py::nelson_aalen).",
)
def _q_events_nelson_aalen(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # the graded events_kaplan_meier builder's derivation, verbatim —
    # the two estimators must read one identical survival frame
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    return relational.nelson_aalen(per_user, "duration_h", "observed")


def _kw3_clazz():
    """3-way deterministic md5 user-level split for the k-sample test
    (distinct salt from the binary ``_ab9_variant`` split — a 3-arm
    experiment is a different assignment, not a re-bucketing of the
    A/B one)."""
    return (hashing.hex_int(
        F.concat(F.lit("kw3:"), F.col("user_id").cast("string"))) % 3)


@_register(
    "events_kruskal_value",
    """
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
    """,
    doc="tie-corrected Kruskal-Wallis H of event value across a 3-way "
        "md5 user split ('kw3:' salt — a 3-arm experiment is a "
        "different assignment, not a re-bucketing of the binary ab9 "
        "split), one independent test per event_type — the k-SAMPLE "
        "rung of the experiment stack (srm_check gates the split, "
        "welch tests two means, mannwhitney tests two distributions, "
        "THIS tests k distributions, sprt monitors sequentially). "
        "Extends mann_whitney's RANK-FUNCTION-FREE identity to k "
        "classes: 2*avg_rank = 2*cum_le - t + 1 where cum_le/t are "
        "RANGE-frame window sums of a (group, class, value) count "
        "aggregate — integer-exact on both engines, no engine rank(); "
        "the tie term deduplicates onto the min class of each value's "
        "peers (min is not a rank function); the ONE cross-class "
        "double fold (sum of (r2x2/2)^2/n) runs as an ORDERED "
        "cumulative window sum ascending by class read off at the "
        "last class row, never an unordered float aggregate (the "
        "srm-stream summation lesson). For k = 2 the corrected H "
        "equals mann_whitney's z^2 (property-tested and pinned "
        "end-to-end on the operators). Significance against inlined "
        "chi-square 5% critical values for df 1..10 (NULL beyond). "
        "Scale shape: two group-keyed exchanges (observation collapse, "
        "then windows + fold over the DISTINCT-(class, value) frame), "
        "no single-partition stage, no join, plan-asserted "
        "(operators/relational.py::kruskal_wallis).",
)
def _q_events_kruskal_value(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return relational.kruskal_wallis(
        ev.select(F.col("event_type").alias("etype"),
                  _kw3_clazz().cast("int").alias("clazz"), "value"),
        group="etype", clazz="clazz", value="value")


@_register(
    "events_logrank_ab",
    """
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
    """,
    doc="log-rank (Mantel-Cox) test between the md5 A/B arms' survival "
        "curves over the SAME per-user duration/observed frame the "
        "graded events_kaplan_meier / events_nelson_aalen read "
        "(duration = hours between first and last activity, event = "
        "the user ever purchases) — completes the survival stack: "
        "kaplan estimates S, nelson estimates H, THIS tests S_a vs "
        "S_b. At each distinct duration the expected group-1 events "
        "e1 = d*n1/n and hypergeometric variance v come from the "
        "pooled risk sets; emitted PER DURATION as a monotone evidence "
        "trace (the survival stack's curve-output convention — the "
        "final row carries the verdict). Group and observed validation "
        "are welch-strict in-plan; null durations raise (Spark windows "
        "sort NULLS FIRST vs SQL NULLS LAST — the r13 advice fixes). "
        "Cross-engine float discipline: every accumulation is an "
        "integer window sum (risk sets) or an ORDERED cumulative "
        "double sum ascending by duration; the e1/v algebra "
        "interleaves multiplications with divisions "
        "(d * n1 / n * n0 / n * (n-d)/(n-1)) so no integer product "
        "overflows, identical operand order in both engines; the "
        "oracle CASTs its windowed BIGINT sums (the r9 kaplan HUGEINT "
        "lesson). Scale shape (kaplan/nelson's exact shape): one "
        "user-keyed aggregate -> one (duration) aggregate collapsing "
        "subjects; risk-set and running windows ride a SinglePartition "
        "exchange of the <= distinct-durations AGGREGATE frame, no "
        "join, plan-asserted "
        "(operators/relational.py::logrank_test).",
)
def _q_events_logrank_ab(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # the graded events_kaplan_meier builder's derivation, verbatim —
    # the survival stack reads one identical frame
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    return relational.logrank_test(
        per_user.select("duration_h", "observed",
                        _ab9_variant().cast("int").alias("grp")),
        duration="duration_h", observed="observed", grp="grp")


@_register(
    "events_cox_activity",
    """
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
    """,
    doc="Cox proportional-hazards SCORE test (beta = 0) of the user's "
        "event count (activity level) on the SAME per-user "
        "duration/observed survival frame the graded "
        "events_kaplan_meier / events_nelson_aalen / events_logrank_ab "
        "read — the REGRESSION rung of the survival stack (kaplan "
        "estimates S, nelson estimates H, logrank compares two arms, "
        "THIS scores a covariate's effect). The covariate contract is "
        "INTEGRAL + non-null (raises in-plan — a null x would vanish "
        "from the risk-set moments S1/S2 while the subject stays in "
        "S0, the r13 logrank-observed bug class closed from birth), so "
        "S0/S1/S2 are integer window sums; u/v accumulate as ORDERED "
        "cumulative double sums ascending by duration; the per-row "
        "algebra interleaves multiplications with divisions with "
        "identical operand order in both engines, and S1/S0, S2/S0 go "
        "double on the first step (documented loud-overflow bounds on "
        "S2 = sum(x^2)). For a binary 0/1 covariate every per-duration "
        "term reduces ALGEBRAICALLY to logrank_test — property-tested "
        "AND pinned end-to-end on the registered events_logrank_ab "
        "frame (tests/test_r15_oracle_specs.py). The oracle CASTs its "
        "windowed BIGINT sums (the r9 kaplan HUGEINT lesson). Scale "
        "shape (kaplan/nelson's exact shape): one user-keyed aggregate "
        "-> one (duration) aggregate collapsing subjects; risk-set and "
        "running windows ride a SinglePartition exchange of the "
        "<= distinct-durations AGGREGATE frame, no join, plan-asserted "
        "(operators/relational.py::cox_score_test).",
)
def _q_events_cox_activity(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # the graded events_kaplan_meier builder's derivation plus the
    # activity covariate — the survival stack reads one identical frame
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"),
        F.count(F.lit(1)).cast("long").alias("x"))
    return relational.cox_score_test(
        per_user, duration="duration_h", observed="observed",
        covariate="x")


@_register(
    "events_friedman_dow",
    """
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
    """,
    doc="Conover tie-corrected Friedman blocked k-sample rank test of "
        "per-(day-of-week, event_type) traffic counts: blocks = dow, "
        "treatments = event_type — does traffic differ across event "
        "types once the weekly cycle is blocked out? The BLOCKED rung "
        "of the experiment stack (kruskal tests k free-standing "
        "samples; THIS tests k treatments when a known nuisance factor "
        "would swamp the signal). The block is derived as integer "
        "epoch-day arithmetic (ts_ms DIV 86400000 + 4) % 7 on BOTH "
        "engines — NOT the engines' dayofweek() functions (Spark's is "
        "1-7 Sunday-first, DuckDB's 0-6: a guaranteed cross-engine "
        "mismatch); cells are per-(dow, etype) COUNTS, integers, so "
        "the within-block tie structure is identical on both engines. "
        "FULLY integer-exact, one step beyond kruskal: with the "
        "rank-free identity 2*midrank = 2 cum_le - t + 1 (RANGE-frame "
        "cell counts, no engine rank()), BOTH folds are integers — "
        "numerator sum((2R_j - b(k+1))^2) and denominator sum((2r)^2) "
        "- b k (k+1)^2 — so no float accumulates anywhere; the single "
        "double division happens at the end. Strict in-plan grid "
        "validation: duplicate cells, null block/treatment/value, and "
        "INCOMPLETE blocks all raise. Output-type lint: rank_sum "
        "divides CAST(r2 AS DOUBLE) / 2.0 (a bare r2 / 2.0 parses as "
        "DECIMAL in DuckDB — off-allowlist). Significance against the "
        "inlined chi-square 5% critical values for df 1..10, "
        "drift-guarded to relational._CHI2_CRIT_05 "
        "(tests/test_registry.py). Scale shape: ONE partial+final "
        "(block, treatment) cell combine (the only full-data shuffle "
        "moves pre-combined cells); block-keyed + treatment-keyed "
        "exchanges over the <= b*k CELL frame; SinglePartition fold "
        "over <= k rows, plan-asserted "
        "(operators/relational.py::friedman_test).",
)
def _q_events_friedman_dow(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("(ts_ms DIV 86400000 + 4) % 7").alias("dow"),
        F.col("event_type").alias("etype")).agg(
        F.count(F.lit(1)).cast("long").alias("v"))
    return relational.friedman_test(
        cells, block="dow", treatment="etype", value="v")


@_register(
    "events_logrank_strat",
    """
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
    """,
    doc="STRATIFIED log-rank test between the md5 A/B arms' survival "
        "curves over the SAME per-user duration/observed frame the "
        "graded events_kaplan_meier / events_logrank_ab read, "
        "stratified by the user's DOMINANT event_type — does the arm "
        "effect hold once the user's behavioral type is controlled? "
        "The confounder-controlled rung of the survival stack (kaplan "
        "estimates S, nelson estimates H, logrank compares two arms, "
        "cox scores a covariate, THIS compares arms within strata and "
        "pools the evidence). The stratum is the argmax-count event "
        "type with MIN-NAME tiebreak, derived on BOTH engines by the "
        "same window-max + filter + min-name construction (the max "
        "count and min name are order-free aggregates — no engine "
        "argmax/rank whose tie rules could differ); strata are "
        "lowercase-ASCII event types, so both engines agree on the "
        "fold's string order (byte-order ASCII, no collation surface). "
        "Per (stratum, duration) the e1/v algebra is logrank_test's "
        "verbatim (integer risk-set window sums per stratum; "
        "multiplications interleaved with divisions in identical "
        "operand order); the CROSS-strata O-E/V fold is ONE ordered "
        "cumulative double sum ascending by (stratum, duration) read "
        "off at the last row — one deterministic addition order on "
        "both engines (the kruskal cross-class fold shape). ONE "
        "stratum reduces to logrank_test VERBATIM — property-tested, "
        "operator-pinned, and pinned end-to-end against the registered "
        "events_logrank_ab builder (tests/test_r16_oracle_specs.py). "
        "Strict in-plan contract extends logrank's with null-stratum "
        "raises (a null stratum has no risk set, and Spark windows "
        "sort NULLS FIRST vs SQL NULLS LAST). The oracle CASTs every "
        "windowed BIGINT sum (the r9 kaplan HUGEINT lesson). Scale "
        "shape: the fixture derivation adds a user-keyed equi-join of "
        "two user-keyed aggregates (co-partitioned after one "
        "exchange); the OPERATOR itself stays join-free — "
        "stratum-keyed exchange for the risk-set windows + "
        "SinglePartition fold over the <= distinct-(stratum, duration) "
        "AGGREGATE frame (115 rows at sf0.01, 299 at sf0.1), "
        "plan-asserted (operators/relational.py::stratified_logrank).",
)
def _q_events_logrank_strat(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"))
    wu = Window.partitionBy("user_id")
    dom = (cnts.withColumn("__mx", F.max("cnt").over(wu))
           .filter(F.col("cnt") == F.col("__mx"))
           .groupBy("user_id")
           .agg(F.min("event_type").alias("strat")))
    # the graded events_kaplan_meier builder's derivation, verbatim —
    # the survival stack reads one identical frame
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST((max(ts_ms) - min(ts_ms)) DIV 3600000 AS INT)")
         .alias("duration_h"),
        F.max((F.col("event_type") == "purchase").cast("int"))
         .alias("observed"))
    frame = (per_user.join(dom, "user_id")
             .select("strat", "duration_h", "observed",
                     _ab9_variant().cast("int").alias("grp")))
    return relational.stratified_logrank(
        frame, duration="duration_h", observed="observed", grp="grp",
        stratum="strat")


@_register(
    "events_page_hourband",
    """
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
    """,
    doc="Page's trend test for ORDERED alternatives over "
        "per-(day-of-week, six-hour-band) traffic counts: blocks = "
        "epoch-day dow, ORDERED treatments = the four six-hour bands "
        "of the day — does traffic trend monotonically across the day "
        "once the weekly cycle is blocked out? The ordered-alternative "
        "rung of the experiment stack (kruskal tests k free-standing "
        "samples, friedman blocks a nuisance factor, THIS adds the "
        "monotone alternative when treatments carry a natural order). "
        "Blocks AND treatments are pure integer epoch arithmetic on "
        "BOTH engines — dow = (ts_ms DIV 86400000 + 4) % 7, band = "
        "(ts_ms DIV 3600000) % 24 DIV 6, ordered 0..3 — never the "
        "engines' hour()/dayofweek() builtins (Spark's dayofweek is "
        "1-7 Sunday-first vs DuckDB's 0-6: a guaranteed mismatch); "
        "cells are COUNTS, integers, so within-block tie structure is "
        "cross-engine identical. FULLY integer-exact (the friedman "
        "discipline): 2*midrank = 2 cum_le - t + 1 from RANGE-frame "
        "counts; the j ordinal is a RANGE-frame count of treatments "
        "at-or-below (distinct after the grid dedup, so the count IS "
        "the position — no engine rank()); the fold keeps 2L = "
        "sum_j j * (2 R_j) and centers as 4(L - E[L]) = 2*(2L) - "
        "b k (k+1)^2 — all integers (k(k+1)^2 is even); the single "
        "double division is the final z with 16 Var = b k^2 (k+1)^2 "
        "(k-1) / 9. significant_05 is the TWO-SIDED |z| > 1.96 flag "
        "(reversing the treatment order negates z — property-pinned; "
        "the z drift-guard in tests/test_registry.py covers the "
        "literal). Strict friedman-grade in-plan validation with the "
        "treatment-integrity diagnostic taking priority. Output-type "
        "lint: rank_sum / l_stat divide CAST(x AS DOUBLE) / 2.0 (bare "
        "x / 2.0 parses DECIMAL in DuckDB — off-allowlist). Scale "
        "shape (friedman_test's exact shape): ONE partial+final "
        "(block, treatment) cell combine is the only full-data "
        "shuffle; within-block RANGE windows ride a block-keyed "
        "exchange over the <= b*k CELL frame; the j-ordinal and 2L "
        "folds are SinglePartition windows over the <= k-row "
        "per-treatment frame, plan-asserted "
        "(operators/relational.py::page_trend_test).",
)
def _q_events_page_hourband(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("(ts_ms DIV 86400000 + 4) % 7").alias("dow"),
        F.expr("CAST((ts_ms DIV 3600000) % 24 DIV 6 AS INT)")
         .alias("band")).agg(
        F.count(F.lit(1)).cast("long").alias("v"))
    return relational.page_trend_test(
        cells, block="dow", treatment="band", value="v")


# ---------------------------------------------------------------------------
# Registry API
# ---------------------------------------------------------------------------

def specs() -> list[QuerySpec]:
    # Importing the sibling plan modules triggers their registrations;
    # deferred to call time to avoid import cycles.
    from data_pipeline_eng_project_1_spark.plans import llm_ops  # noqa: F401

    return all_specs()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.builder for s in specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in specs() if s.oracle is not None}
