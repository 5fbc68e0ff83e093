"""Relational operators the reference implies but never implements.

SURVEY.md §2.7: the reference's only cross-table relationship is a positional
zip (dags/utils.py:300,339) and its only ordering is the per-row
``ORDER BY DATE_LOAD DESC LIMIT 1`` read-back (dags/utils.py:215). This module
provides the real operators — latest-per-key, top-k, as-of join,
sessionization — as reusable, shuffle-conscious DataFrame combinators.

Scale notes baked into each operator:
- latest_per_key / topk_per_key: one hash shuffle on the partition keys; the
  window sort is per-partition. Skewed keys are AQE's problem (enabled in
  session.py).
- asof_join: the union+window formulation — ONE shuffle on the join key,
  then a per-key sort. This is the scalable plan; a broadcast+filter+max
  would explode, and per-group applyInPandas(merge_asof) would serialize
  through Python. No UDFs here.
- sessionize: lag + running sum over (key, time) — same single-shuffle shape.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _require_plain_identifier(op: str, name: str) -> None:
    """Guard for operators that interpolate a column NAME into a generated
    SQL string (``F.expr(f"min({name}) ..."``): a name needing backticks
    (space, dot, quote) would break or splice the generated expression.
    Same contract as table_profile's stack() guard — alias the column to a
    plain identifier before calling."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(
            f"{op}: column name {name!r} is not a plain identifier "
            "([A-Za-z_][A-Za-z0-9_]*); alias it first — the name is "
            "interpolated into a generated SQL expression")


def _require_integer_epoch_ts(op: str, df: DataFrame, ts: str) -> None:
    """Shared guard for time-binning operators: ``ts`` must be integer
    epoch units so the DIV binning / midpoint arithmetic is exact (a
    fractional timestamp silently floors). One definition for the six
    call sites (psi/ecdf/cusum/seasonal x2/acf)."""
    ts_t = df.schema[ts].dataType.simpleString()
    if ts_t not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(f"{op}: ts column {ts!r} must be an integer "
                        f"epoch-units type, got {ts_t}")


def latest_per_key(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the first row per key under `order` (the distributed form of the
    reference's ORDER BY … DESC LIMIT 1 read-back, dags/utils.py:215-217).

    `order` must be a total order (include a unique tiebreaker) or the
    result is nondeterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_key(df: DataFrame, keys: list[str], order: list[Column], k: int) -> DataFrame:
    """Top-k rows per key; adds a ``rank`` column (1-based)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_global(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject — each
    partition keeps k rows, the driver merges k*partitions, no full sort."""
    return df.orderBy(*order).limit(k)


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_value: str, out_col: str) -> DataFrame:
    """As-of join: for each left row, the `right_value` of the latest right
    row with right_ts <= left_ts within the same `on` key (backward match,
    inclusive).

    Plan: tag both sides, union, single shuffle+sort on (on, ts), then a
    running last_value(ignoreNulls) — right rows sort before left rows at
    equal ts so an exactly-simultaneous right row matches. Scales to any
    side sizes (no broadcast, no pandas).
    """
    l_tag = left.select(
        F.col(on), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("__val"),
        *[F.col(c) for c in left.columns if c not in (on,)],
    )
    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_value).alias("__val"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on,)],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tag.unionByName(r_tag)
        .withColumn(out_col, F.last("__val", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .drop("__ts", "__is_left", "__val")
    )


def binned_range_join(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      lower: int, upper: int) -> DataFrame:
    """Inner range join: pairs (l, r) sharing `on` with
    ``right_ts ∈ [left_ts + lower, left_ts + upper)``.

    Plan: both sides bucket by ``w = upper - lower``; each left row explodes
    to every bucket its window overlaps (≤2 when the span ≤ w), turning the
    inequality join — which Spark would plan as a BroadcastNestedLoopJoin,
    O(n·m) and broadcast-bounded — into a plain shuffled equi-join on
    (key, bucket) plus an exact range filter. Cost: ≤2× replication of the
    left side, one hash shuffle per side, AQE handles per-bucket skew.

    Timestamps must be non-negative integers (epoch ms): bucket math uses
    integer DIV (exact; a double division could mis-floor near bucket edges).
    """
    _require_plain_identifier("binned_range_join", left_ts)
    _require_plain_identifier("binned_range_join", right_ts)
    w = int(upper - lower)
    l = left.withColumn(
        "__b",
        F.explode(F.sequence(
            F.expr(f"({left_ts} + {lower}) DIV {w}"),
            F.expr(f"({left_ts} + {upper} - 1) DIV {w}"),
        )),
    )
    r = right.withColumn("__b", F.expr(f"{right_ts} DIV {w}"))
    return (
        l.join(r, [on, "__b"])
        .filter((F.col(right_ts) >= F.col(left_ts) + lower)
                & (F.col(right_ts) < F.col(left_ts) + upper))
        .drop("__b")
    )


def salted_join(left: DataFrame, right: DataFrame, on: str,
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Skew-resistant equi-join: spread a hot join key over `salt` shuffle
    partitions.

    Standard hash joins send ALL rows of one key to one task — a key holding
    1% of 100 TB pins 1 TB on a single executor. Here the big `left` side
    gets a uniform per-row salt (seeded rand: reproduced per partition on
    task retry, and — unlike a hash of the whole row — it adds no column
    references, so scan pruning is untouched), the small `right` side is
    replicated `salt` times, and the join key becomes (key, salt): the hot
    key's rows now land on `salt` different tasks. The result is EXACTLY
    the plain join — salt never changes matching, only placement. Cost:
    `salt`× replication of the right side, so keep right small
    (dimension-sized) or salt modest.

    AQE's skew-join split (enabled in session.py) handles moderate skew
    after the fact by splitting oversized partitions; explicit salting is
    the stronger tool when one key alone exceeds a single task's capacity
    or the skew is known ahead of time.
    """
    salted_l = left.withColumn(
        "__salt", F.floor(F.rand(42) * salt).cast("int"))
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def sessionize(df: DataFrame, key: str, ts: str, gap: int,
               order_tiebreak: str) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to the
    previous event exceeds `gap` (same units as `ts`). Adds ``session_id``
    (0-based per key)."""
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    is_new = F.when(
        F.col(ts) - F.lag(ts).over(w) > gap, 1
    ).otherwise(0)
    run = Window.partitionBy(key).orderBy(ts, order_tiebreak) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__new", is_new) \
        .withColumn("session_id", F.sum("__new").over(run)) \
        .drop("__new")


def locf_fill(df: DataFrame, key: str, order: str, value: str,
              filled_col: str = "value_filled",
              bucket_size: int = 24) -> DataFrame:
    """Last-observation-carried-forward over a dense integer grid, with
    BOUNDED window frames — the 100 TB form of gap filling.

    The naive LOCF is one window per key over the key's entire history
    (``last(v, ignorenulls) OVER (PARTITION BY key ORDER BY t ROWS
    UNBOUNDED PRECEDING)``): a multi-year key becomes one giant sorted
    window partition on one task. This operator is the standard two-level
    segmented-scan rewrite, algebraically identical output:

    1. local:  LOCF within (key, bucket = t DIV bucket_size) — frames are
       capped at ``bucket_size`` rows;
    2. carry:  per-bucket last non-null value (an aggregate, one row per
       bucket), LOCF'd across buckets per key — a window over the compact
       bucket grain, ``bucket_size``× smaller than the data;
    3. filled = coalesce(local, carry-in from strictly earlier buckets).

    Identity: if the latest non-null observation at or before t is in the
    same bucket, (1) finds it; otherwise (1) is null and (3) takes (2),
    the latest non-null of all earlier buckets. No arithmetic touches the
    values, so results are bit-identical to the unbounded form.

    Input must have one row per (key, order) grid point (densify first —
    sequence+explode over each key's span). Adds ``filled_col``; keeps
    every input column.
    """
    df = df.withColumn(
        "__bkt", F.floor(F.col(order) / bucket_size).cast("long"))
    w_local = (Window.partitionBy(key, "__bkt").orderBy(order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = F.last(value, ignorenulls=True).over(w_local)
    # Last non-null per bucket: max_by skips rows whose ordering expr is
    # null, so gaps don't shadow real observations; an all-null bucket
    # yields null and the carry passes through it.
    bucket_last = (
        df.groupBy(key, "__bkt")
        .agg(F.max_by(value, F.when(F.col(value).isNotNull(),
                                    F.col(order))).alias("__last"))
    )
    w_carry = (Window.partitionBy(key).orderBy("__bkt")
               .rowsBetween(Window.unboundedPreceding, -1))
    carry = bucket_last.select(
        key, "__bkt",
        F.last("__last", ignorenulls=True).over(w_carry).alias("__carry"))
    return (
        df.withColumn("__local", local)
        .join(carry, [key, "__bkt"], "left")
        .withColumn(filled_col, F.coalesce("__local", "__carry"))
        .drop("__bkt", "__local", "__carry")
    )


def bloom_prune(probe: DataFrame, build: DataFrame, probe_key: str,
                build_key: str, n_bits: int = 1 << 20, k: int = 2) -> DataFrame:
    """Runtime-filter (semi-join reduction): drop probe rows whose key
    cannot possibly match a build-side key, before the real join.

    A Bloom filter built from column algebra: the build side collapses to
    at most ``min(k * |build|, n_bits)`` distinct bit positions
    (``xxhash64(key, seed) mod n_bits``, one shared position space for all
    k seeds — standard Bloom semantics). That position table is
    broadcastable even at scales where the build keys themselves are not,
    which is the whole point on a 1000-executor cluster: the probe side is
    filtered map-side by k broadcast left-semi joins — no probe shuffle, no
    false negatives, false-positive rate ≈ (1 - e^(-k·n/m))^k.

    Follow with the exact join; this operator only shrinks its shuffle
    input. Spark's own InjectRuntimeFilter applies the same idea
    automatically but only when the build side carries a selective filter
    it can see through the join graph; this operator makes the reduction
    explicit and tunable.
    """
    def pos(col: Column, seed: int) -> Column:
        return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_bits))

    bits = (
        build.select(
            F.explode(
                F.array(*[pos(F.col(build_key), i) for i in range(k)])
            ).alias("_bit")
        ).distinct()
    )
    out = probe
    for i in range(k):
        b = bits.alias(f"_bloom_{i}")
        out = out.join(
            F.broadcast(b),
            pos(F.col(probe_key), i) == F.col(f"_bloom_{i}._bit"),
            "left_semi",
        )
    return out


def scd2_history(df: DataFrame, key: str, ts: str, attrs: list[str],
                 tiebreak: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: one row
    per genuine attribute change, valid over [effective_from,
    effective_to); the current row has a null effective_to.

    Change detection is null-safe (``eqNullSafe`` against the lagged
    value; the first row per key always opens a version). Both windows
    partition on ``key``, and the second runs on the filtered output of
    the first, so the whole operator costs ONE hash shuffle — the
    partitioning is reused across the lag, the filter, and the
    lead/row_number (plan-audited in tests/test_plans.py).
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    change = F.row_number().over(w) == 1
    for a in attrs:
        change = change | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    changes = df.withColumn("__chg", change).filter(F.col("__chg"))
    return changes.select(
        key, *attrs,
        F.col(ts).alias("effective_from"),
        F.lead(ts).over(w).alias("effective_to"),
        F.row_number().over(w).cast("long").alias("version"),
    )


def dense_index(df: DataFrame, order_cols: list[str], idx_col: str = "idx",
                partitions: int | None = None) -> DataFrame:
    """Global 0-based dense row index in the total order of ``order_cols``
    — without the single-partition bottleneck.

    The naive ``row_number() OVER (ORDER BY ...)`` funnels every row
    through ONE task (Spark plans an Exchange SinglePartition), which is
    the canonical 100 TB failure mode. This operator keeps the sort
    distributed: range-partition on the order columns, sort within
    partitions, enumerate each partition locally (Arrow-batched
    mapInPandas — a narrow map, no shuffle), then add per-partition
    offsets. The offsets come from a count-per-partition aggregate — P
    integers to the driver, metadata not data — folded back in as a
    literal map lookup.

    The input is persisted before the two passes so both see the same
    range boundaries (repartitionByRange samples its splits; without the
    persist the count pass and the output pass could disagree).
    """
    import pandas as pd  # local import: only the driver needs it here

    spark = df.sparkSession
    n = partitions or spark.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartitionByRange(int(n), *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )

    # fresh StructType: StructType.add mutates in place, which would
    # corrupt the input DataFrame's own schema object
    from pyspark.sql import types as T
    schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("__local", T.LongType())])

    def enumerate_partition(batches):
        base = 0
        for pdf in batches:
            pdf = pdf.assign(__local=pd.RangeIndex(base, base + len(pdf)))
            base += len(pdf)
            yield pdf

    local = ranged.mapInPandas(enumerate_partition, schema).persist()
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in local.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])
    out = (
        local.withColumn(
            idx_col,
            (F.col("__local") + offset_map[F.col("__pid")]).cast("long"))
        .drop("__pid", "__local")
    )
    # Total row count falls out of the offsets pass for free — callers that
    # need N (quantile arithmetic) read it from here instead of paying a
    # second count job + broadcast (see dense_index_n).
    out._dense_index_total = acc  # type: ignore[attr-defined]
    return out


def dense_index_n(df: DataFrame, order_cols: list,
                  idx_col: str = "idx",
                  partitions: int | None = None) -> tuple[DataFrame, int]:
    """`dense_index` plus the exact total row count N as a Python int —
    already computed by the per-partition offsets pass (driver metadata),
    so exposing it costs nothing and saves callers a count job."""
    out = dense_index(df, order_cols, idx_col, partitions)
    return out, out._dense_index_total  # type: ignore[attr-defined]


def grouped_zscore(df: DataFrame, key: str, value: str,
                   z_col: str = "z") -> DataFrame:
    """Per-group z-score via ``applyInPandas`` — the grouped-map Arrow path.

    The same math is one line of native window algebra (and the unit test
    pins both paths equal); this exists as the template for per-group logic
    that genuinely needs numpy/pandas (model scoring, per-group fits, …):
    one shuffle on the group key, each group materialized as ONE pandas
    DataFrame in an executor (so groups must fit in executor memory —
    at 100 TB that means keying by something bounded, not e.g. a global
    constant), Arrow both ways, no driver involvement.

    Degenerate groups (n=1 or zero variance) yield null z, matching SQL's
    ``x / NULL`` and ``stddev_samp`` of a singleton.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(z_col, T.DoubleType())])

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value].astype("float64")
        sd = x.std(ddof=1)  # sample std == SQL stddev_samp
        if not np.isfinite(sd) or sd == 0.0:
            return pdf.assign(**{z_col: pd.Series([None] * len(pdf),
                                                  dtype="float64")})
        return pdf.assign(**{z_col: (x - x.mean()) / sd})

    return df.groupBy(key).applyInPandas(zscore, out_schema)


def capped_per_key(df: DataFrame, key: str, id_col: str, quota: int,
                   method: str = "threshold",
                   salt_buckets: int = 64) -> DataFrame:
    """Deterministic per-key cap sampling: keep at most ``quota`` rows per
    ``key`` value, picked by a seeded-uniform rule (rank by
    (md5 of the id, id)) — the per-domain/per-source quota every web-scale
    corpus applies before training (a handful of giant domains otherwise
    dominate the token budget). Returns the input columns plus
    ``pick_rank`` (1-based within the key).

    Same dual-form contract as similarity.cluster_balanced_sample, which
    this generalizes from embedding cells to an arbitrary key column:

    - ``method="window"``: one ``row_number`` per key — the obvious form,
      but a hot key (one domain = 30% of the crawl) funnels through a
      single reducer that sorts the whole domain.
    - ``method="threshold"`` (default, the scale form): the quota-th
      smallest sort key per key is found with a salted two-level
      aggregate (level 1: ``quota`` smallest per (key, salt) — a bounded
      array_sort; level 2: merge ``salt_buckets`` quota-arrays), then a
      broadcast join keeps rows ``<=`` the threshold — no per-key sort
      ever sees more than key/salt_buckets rows, so the hot-domain
      reducer disappears. Survivors (output-sized) get ``pick_rank``
      from a window that is no longer a funnel. Exact at every scale:
      the k-th order statistic's prefix equals the sort's prefix (ties
      impossible — the key embeds the unique id; ids must be
      non-negative for the zero-padded spelling).
    """
    if method not in ("window", "threshold"):
        raise ValueError(f"unknown method {method!r}")
    if method == "window":
        w = Window.partitionBy(key).orderBy(
            F.md5(F.col(id_col).cast("string")), id_col)
        return (df.withColumn("pick_rank", F.row_number().over(w))
                .filter(F.col("pick_rank") <= quota))
    keyed = df.withColumn(
        "__k", F.concat(F.md5(F.col(id_col).cast("string")), F.lit("|"),
                        F.lpad(F.col(id_col).cast("string"), 20, "0")))
    thr = (
        keyed
        .withColumn("__s", F.pmod(F.xxhash64(F.col(id_col)),
                                  F.lit(salt_buckets)))
        .groupBy(key, "__s")
        .agg(F.slice(F.array_sort(F.collect_list("__k")), 1, quota)
             .alias("__ks"))
        .groupBy(key)
        .agg(F.array_sort(F.flatten(F.collect_list("__ks"))).alias("__all"))
        .select(key,
                F.element_at("__all",
                             F.least(F.lit(quota), F.size("__all")))
                .alias("__thr"))
    )
    survivors = (keyed.join(F.broadcast(thr), key)
                 .filter(F.col("__k") <= F.col("__thr")))
    w = Window.partitionBy(key).orderBy("__k")
    return (survivors.withColumn("pick_rank", F.row_number().over(w))
            .drop("__k", "__thr"))


def banded_running_total(df: DataFrame, value: str, tiebreak: str,
                         num_bands: int = 64,
                         out_col: str = "running_total") -> DataFrame:
    """Global DESCENDING running total of ``value`` (ties broken by
    ``tiebreak`` ascending) WITHOUT a global-sort single reducer — the
    distributed prefix-sum that backs Pareto/ABC cuts, top-share
    reports, and budget-threshold selection at scale.

    An unpartitioned ``sum() OVER (ORDER BY ...)`` funnels every row
    through ONE reducer (Spark even warns). Instead: rows land in
    value-range bands (band 0 = highest values) via a broadcast
    min/max; per-band totals aggregate map-side into a ``num_bands``-row
    frame whose own prefix sum IS computed with the naive window — over
    num_bands rows, not N; the per-band offsets broadcast-join back and
    a within-band window (partitioned, so parallel) finishes. Banding by
    VALUE keeps band order consistent with the global order, and ties
    can't straddle bands (equal values share a band). Cost: two narrow
    passes + one bounded window; the prefix regrouping changes float
    ADDITION GROUPING vs a sequential scan (same multiset of addends),
    so compare prefix totals at a rounded precision.

    Returns the input plus ``out_col``; uniform band width degrades to
    populated-band skew under heavy value skew — acceptable because the
    within-band window still parallelizes across bands, and a quantile
    bander (approx_percentile bounds) slots in without changing the
    contract.
    """
    bounds = df.agg(F.min(value).alias("__lo"),
                    F.max(value).alias("__hi"))
    banded = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__band",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(num_bands - 1),
                    F.floor((F.col("__hi") - F.col(value))
                            / ((F.col("__hi") - F.col("__lo"))
                               / num_bands)).cast("int"))))
        .drop("__lo", "__hi")
    )
    totals = banded.groupBy("__band").agg(F.sum(value).alias("__bt"))
    w_bands = (Window.orderBy("__band")
               .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "__band",
        F.coalesce(F.sum("__bt").over(w_bands), F.lit(0.0)).alias("__off"))
    w_in = (Window.partitionBy("__band")
            .orderBy(F.col(value).desc(), F.col(tiebreak))
            .rowsBetween(Window.unboundedPreceding, 0))
    return (
        banded.join(F.broadcast(offsets), "__band")
        .withColumn(out_col, F.col("__off") + F.sum(value).over(w_in))
        .drop("__band", "__off")
    )


def skyline_2d(df: DataFrame, max_col: str, min_col: str,
               buckets: int | None = None) -> DataFrame:
    """2-D Pareto skyline: rows not dominated on (maximize `max_col`,
    minimize `min_col`) — dominance = other row >= on the max axis, <= on
    the min axis, strict on at least one.

    The naive form is a quadratic dominance anti-join. A 2-D skyline is
    distributive over the sort dimension, so the plan is: one per-key
    aggregate (min of `min_col` per distinct `max_col` value — partial+
    final, the data never pairs with itself), a suffix-min window over
    that AGGREGATE frame ordered by `max_col` descending (rows = distinct
    keys — the only sequential step never touches the fact rows), then a
    broadcast join back with the keep rule: on the frontier iff the row
    hits its own key's min AND beats the min over all strictly-greater
    keys. Ties on both axes all survive (neither dominates — matches the
    NOT EXISTS definition).

    ``buckets``: the scale path for a CONTINUOUS `max_col`, where the
    per-key aggregate frame would be O(distinct values) and its window a
    single fat partition. Rows bucket into `buckets` equal ranges of
    `max_col`; a suffix-min of `min_col` over the strictly-higher buckets
    is an EXACT dominance witness (any point there has strictly larger
    `max_col`, so a row with `min_col` >= that suffix-min is dominated)
    — the surviving candidates are near-frontier only, and the exact
    per-key pass runs on them alone. Bucket-boundary ties cost nothing:
    the witness only PRUNES; the exact pass decides. Result is
    row-identical to the unbucketed form (pytest-pinned).
    """
    if buckets:
        bounds = df.agg(F.min(max_col).alias("__lo"),
                        F.max(max_col).alias("__hi"))
        wb = df.crossJoin(F.broadcast(bounds)).withColumn(
            "__b",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(buckets - 1),
                    F.floor((F.col(max_col) - F.col("__lo"))
                            / ((F.col("__hi") - F.col("__lo")) / buckets))
                    .cast("int"))))
        per_b = wb.groupBy("__b").agg(F.min(min_col).alias("__bmin"))
        suffix_b = Window.orderBy(F.col("__b").desc()).rowsBetween(
            Window.unboundedPreceding, -1)
        witness = per_b.select(
            "__b", F.min("__bmin").over(suffix_b).alias("__w"))
        df = (wb.join(F.broadcast(witness), "__b")
              .filter(F.col("__w").isNull() | (F.col(min_col) < F.col("__w")))
              .drop("__b", "__w", "__lo", "__hi"))
    per_key = df.groupBy(max_col).agg(F.min(min_col).alias("__minv"))
    suffix = Window.orderBy(F.col(max_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1)
    frontier = per_key.select(
        max_col, "__minv", F.min("__minv").over(suffix).alias("__larger"))
    return (
        df.join(F.broadcast(frontier), max_col)
        .filter((F.col(min_col) == F.col("__minv"))
                & (F.col("__larger").isNull()
                   | (F.col(min_col) < F.col("__larger"))))
        .drop("__minv", "__larger")
    )


def table_profile(df: DataFrame, columns: list[tuple[str, str]],
                  approx: bool = False) -> DataFrame:
    """Long-format table profiling (the ANALYZE / trust-a-new-drop
    report): per column null count, distinct count, and numeric min/max.

    ``columns`` is a list of (name, kind): kind "num" profiles min/max of
    the value, "str" of the value LENGTH (no cross-engine string-format
    surface), "ts" as epoch-millis.

    Plan shapes (r17 — the exact form changed, same output):
    ``approx=False`` runs ONE single-DISTINCT aggregate per column and
    stacks the 1-row frames with unionAll. A single multi-DISTINCT
    aggregate plans as Expand — every input row multiplied x(N_cols+1)
    through a wide-key hash aggregate — and measured 1.61 s vs 0.61 s
    for this union form on the 150k-row orders profile at sf0.1; with
    parquet column pruning the N branches decode the same total bytes
    as one full-width scan, each through a narrow partial+final
    aggregate instead of the row fan-out. NOTE: the branches re-plan
    ``df`` once per column — profile a DERIVED frame by persisting it
    first; a raw table scan (the intended use) needs nothing.
    ``approx=True`` stays the single-pass form: approx_count_distinct
    (HLL++, default 5% rsd) sketches all columns in one aggregate over
    one scan — the 100 TB one-pass option, identical output schema
    (tests/test_stats_ops.py pins the plan shapes and the sketch error
    bound).

    Column names are interpolated into the approx path's generated
    stack() expression, so they are validated against a
    plain-identifier regex up front — a name carrying a quote or comma
    would otherwise splice into the SQL string (profile such columns by
    aliasing them first; the exact path validates identically so the
    two forms accept the same inputs).
    """
    import re

    for c, _ in columns:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
            raise ValueError(
                f"table_profile: column name {c!r} is not a plain "
                "identifier ([A-Za-z_][A-Za-z0-9_]*); alias it before "
                "profiling — names are interpolated into a generated "
                "stack() expression")

    def _minmax(c: str, kind: str) -> tuple[Column, Column]:
        if kind == "num":
            return F.min(c).cast("double"), F.max(c).cast("double")
        if kind == "str":
            return (F.min(F.length(c)).cast("double"),
                    F.max(F.length(c)).cast("double"))
        if kind == "ts":
            return (F.unix_millis(F.min(F.col(c).cast("timestamp")))
                    .cast("double"),
                    F.unix_millis(F.max(F.col(c).cast("timestamp")))
                    .cast("double"))
        raise ValueError(f"table_profile: unknown kind {kind!r}")

    if not approx:
        out = None
        for c, kind in columns:
            mn, mx = _minmax(c, kind)
            branch = df.agg(
                (F.count(F.lit(1)) - F.count(c)).alias("nn"),
                F.countDistinct(c).alias("ndist"),
                mn.alias("mn"), mx.alias("mx"),
            ).select(
                F.lit(c).alias("column_name"),
                F.col("nn").cast("long").alias("n_nulls"),
                F.col("ndist").cast("long").alias("n_distinct"),
                F.round("mn", 4).alias("min_num"),
                F.round("mx", 4).alias("max_num"))
            out = branch if out is None else out.unionAll(branch)
        return out

    aggs: list[Column] = []
    rows: list[str] = []
    for i, (c, kind) in enumerate(columns):
        mn, mx = _minmax(c, kind)
        aggs += [(F.count(F.lit(1)) - F.count(c)).alias(f"nn_{i}"),
                 F.approx_count_distinct(c).alias(f"nd_{i}"),
                 mn.alias(f"mn_{i}"), mx.alias(f"mx_{i}")]
        rows.append(f"'{c}', nn_{i}, nd_{i}, mn_{i}, mx_{i}")
    stacked = df.agg(*aggs).select(F.expr(
        "stack({}, {}) AS (column_name, n_nulls, n_distinct, "
        "min_raw, max_raw)".format(len(columns), ", ".join(rows))))
    return stacked.select(
        "column_name",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round("min_raw", 4).alias("min_num"),
        F.round("max_raw", 4).alias("max_num"))


def equidepth_histogram(df: DataFrame, value: str, k: int = 16) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of ``value`` in ``k``
    buckets: the optimizer-statistics primitive (selectivity estimation,
    skew detection) and the binning step before per-bucket modeling.

    Returns (bucket, lo, hi, n_rows) where lo/hi are the bucket's
    actual min/max. Bucket ids are DENSE 1..k' (k' <= k) over the
    non-empty buckets: duplicate percentile boundaries under heavy tie
    mass are collapsed before the strictly-below count, and a final
    dense_rank over the <=k-row AGGREGATE frame (bounded — never the
    data) renumbers past empty buckets (a raw strictly-below id can
    skip when no value falls between two interpolated boundaries, e.g.
    sparse data or n < k — caught by the hypothesis property test).
    Scale shape: the k-1 interior boundaries come from
    ONE exact percentile aggregate (`percentile(value, array(...))` —
    a single pass + KB-scale state per group at fixture scale; swap
    `approx_percentile` in at 100 TB, same plan), broadcast as a 1-row
    frame; bucket assignment is a scan-side binary-search-free fold over
    the k-1 literals-at-runtime, then one partial+final aggregate. No
    global sort, no single-partition window — the ntile formulation
    (exactly equal counts, ties split arbitrarily) costs a full-data
    range exchange and is what this operator exists to avoid; with
    percentile boundaries, ties on a boundary value land in one bucket,
    so bucket counts are equal only up to tie mass (exact equi-depth
    semantics for continuous-ish columns).
    """
    if k < 2:
        raise ValueError("equidepth_histogram: k must be >= 2")
    fracs = F.array(*[F.lit(i / k) for i in range(1, k)])
    bounds = df.agg(F.array_distinct(
        F.percentile(F.col(value), fracs)).alias("__bs"))
    # bucket = 1 + number of boundaries strictly below the value
    bucket = (F.size(F.filter(F.col("__bs"),
                              lambda b: b < F.col(value))) + 1).alias("bucket")
    agg = (
        df.crossJoin(F.broadcast(bounds))
        .select(bucket, F.col(value).alias("__v"))
        .groupBy("bucket")
        .agg(F.min("__v").alias("lo"), F.max("__v").alias("hi"),
             F.count("*").alias("n_rows"))
    )
    dense = Window.orderBy("bucket")  # <=k aggregate rows, not the data
    return agg.select(
        F.dense_rank().over(dense).alias("bucket"), "lo", "hi", "n_rows")


def psi_drift(df: DataFrame, value: str, ts: str,
              bins: int = 10) -> DataFrame:
    """Population stability index between the first and second halves of
    a table's time range: the tabular-drift twin of the token-level KL
    drift monitor — THE go/no-go statistic model-ops teams gate
    retraining and feature pipelines on (rule of thumb: < 0.1 stable,
    0.1-0.25 drifting, > 0.25 broken).

    Semantics: split at the integer midpoint of [min(ts), max(ts)]
    (baseline = ts < mid, current = ts >= mid; ``ts`` must be integer
    epoch units so the midpoint is exact), bin by the BASELINE's
    ``bins``-quantile boundaries (the industry convention — drift is
    measured against where the baseline mass sat), and per bucket
    compute smoothed shares p (baseline) and q (current) with add-half
    smoothing over the observed buckets (an empty current bucket must
    not produce ln(0)), psi_term = (q - p) * ln(q / p), and the
    summary psi_total = sum of terms.

    Scale shape (the equidepth_histogram pattern, twice): ONE scalar
    (min, max) aggregate -> 1-row broadcast; ONE percentile aggregate
    over the baseline slice (swap to approx_percentile at 100 TB, same
    plan) -> 1-row broadcast of <= bins-1 boundaries; then a scan-side
    strictly-below fold and ONE partial+final (bucket) aggregate. The
    dense_rank / share / total windows all run over the <= ``bins``-row
    AGGREGATE frame — never the data. No global sort, no ntile range
    exchange, no join.

    Returns (bucket, n_base, n_curr, base_pct, curr_pct, psi_term,
    psi_total) with bucket ids dense 1..k' over non-empty buckets.
    """
    if bins < 2:
        raise ValueError("psi_drift: bins must be >= 2")
    _require_plain_identifier("psi_drift", ts)
    _require_integer_epoch_ts("psi_drift", df, ts)
    mid = df.agg(F.expr(f"(min({ts}) + max({ts})) DIV 2").alias("__mid"))
    with_mid = df.crossJoin(F.broadcast(mid))
    is_base = F.col(ts) < F.col("__mid")
    fracs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    bounds = (with_mid.filter(is_base)
              .agg(F.array_distinct(
                  F.percentile(F.col(value), fracs)).alias("__bs")))
    bucket = (F.size(F.filter(F.col("__bs"),
                              lambda b: b < F.col(value))) + 1)
    agg = (
        with_mid.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("__bucket"),
                is_base.cast("long").alias("__b"),
                (~is_base).cast("long").alias("__c"))
        .groupBy("__bucket")
        .agg(F.sum("__b").alias("n_base"), F.sum("__c").alias("n_curr"))
    )
    # everything below runs over the <= bins-row aggregate frame
    whole = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    nb = F.count(F.lit(1)).over(whole)
    p = (F.col("n_base") + 0.5) / (F.sum("n_base").over(whole) + 0.5 * nb)
    q = (F.col("n_curr") + 0.5) / (F.sum("n_curr").over(whole) + 0.5 * nb)
    shares = agg.select(
        F.dense_rank().over(Window.orderBy("__bucket")).alias("bucket"),
        "n_base", "n_curr", p.alias("__p"), q.alias("__q"))
    term = (F.col("__q") - F.col("__p")) * \
        F.log(F.col("__q") / F.col("__p"))
    whole2 = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return shares.select(
        "bucket", "n_base", "n_curr",
        F.round("__p", 6).alias("base_pct"),
        F.round("__q", 6).alias("curr_pct"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(whole2), 6).alias("psi_total"))


def attribute_last_touch(events: DataFrame, conversion_type: str,
                         touch_types: list[str], horizon: int,
                         key: str = "user_id", ts: str = "ts_ms",
                         type_col: str = "event_type",
                         id_col: str = "event_id") -> DataFrame:
    """Last-touch marketing attribution: every conversion event gets the
    most recent PRECEDING touch event (same ``key``, any of
    ``touch_types``, within ``horizon`` units of ``ts``) or null — the
    credit-assignment primitive behind 'which channel drove this
    purchase'.

    Distinct from a plain as-of join in two ways a naive composition
    gets wrong: the attribution WINDOW (a touch older than the horizon
    must not get credit, so the as-of match is post-filtered against
    conversion_ts - horizon), and ties (a touch exactly at the
    conversion instant counts — backward-inclusive, the industry
    convention; two touches at the same instant credit the one with the
    LARGEST id, a pinned total order rather than partition luck). Plan:
    one union + single key-keyed shuffle/sort (the
    asof_join shape — no broadcast, both sides any size), carrying the
    touch's id, type, and timestamp through one running
    last_value(ignoreNulls) struct; at 100 TB a power user is one
    sorted run inside a task, never a join fan-out.

    Returns the conversion rows (key, ts, id) plus ``touch_id``,
    ``touch_type``, ``touch_ts`` (nulls when unattributed) and
    ``lag_ms`` = conversion ts - touch ts. ``touch_id`` keeps
    ``id_col``'s source type (same as ``conversion_id``); ``ts`` must
    be numeric (epoch units).
    """
    id_t = events.schema[id_col].dataType.simpleString()
    ts_t = events.schema[ts].dataType.simpleString()
    conv = events.filter(F.col(type_col) == conversion_type)
    touch = events.filter(F.col(type_col).isin(*touch_types))
    l_tag = conv.select(
        F.col(key), F.col(ts).alias("__ts"), F.lit(1).alias("__is_conv"),
        F.lit(None).cast(f"struct<i:{id_t},t:string,s:{ts_t}>")
        .alias("__touch"),
        F.col(id_col).alias("conversion_id"),
        F.col(id_col).alias("__oid"))
    r_tag = touch.select(
        F.col(key), F.col(ts).alias("__ts"), F.lit(0).alias("__is_conv"),
        F.struct(F.col(id_col).alias("i"),
                 F.col(type_col).alias("t"),
                 F.col(ts).alias("s")).alias("__touch"),
        F.lit(None).cast(id_t).alias("conversion_id"),
        F.col(id_col).alias("__oid"))
    w = (Window.partitionBy(key).orderBy("__ts", "__is_conv", "__oid")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("__m", F.last("__touch", ignorenulls=True).over(w))
        .filter(F.col("__is_conv") == 1)
    )
    in_horizon = F.col("__m").isNotNull() & \
        (F.col("__m.s") >= F.col("__ts") - horizon)
    return matched.select(
        key, F.col("__ts").alias("conversion_ts"), "conversion_id",
        F.when(in_horizon, F.col("__m.i")).alias("touch_id"),
        F.when(in_horizon, F.col("__m.t")).alias("touch_type"),
        F.when(in_horizon, F.col("__m.s")).alias("touch_ts"),
        F.when(in_horizon, F.col("__ts") - F.col("__m.s")).alias("lag_ms"))


def attribute_multi_touch(events: DataFrame, conversion_type: str,
                          touch_types: list[str], horizon: int,
                          model: str = "linear",
                          key: str = "user_id", ts: str = "ts_ms",
                          type_col: str = "event_type",
                          id_col: str = "event_id") -> DataFrame:
    """Multi-touch attribution: every touch within
    ``[conversion_ts - horizon, conversion_ts]`` (backward-inclusive, the
    attribute_last_touch convention) splits the conversion's credit —
    ``model="linear"`` gives each of the n touches 1/n;
    ``model="u_shaped"`` gives 40% to the first touch, 40% to the last,
    and 20%/(n-2) to each middle one (n=1 -> 1.0, n=2 -> 0.5 each; the
    standard position-based rule). Complements attribute_last_touch the
    way marketing teams actually compare models: same horizon, same tie
    convention (same-instant ties order by id — first = smallest,
    last = largest), different credit curve.

    Plan: the (conversion x in-horizon touch) pairs come from
    ``binned_range_join`` — a plain shuffled equi-join on
    (key, time-bucket) with <=2x replication, never the O(n*m)
    BroadcastNestedLoopJoin Spark would plan for the raw inequality —
    then two conversion-keyed windows (count + position rank) over the
    PAIR frame, whose per-conversion fan-out the horizon bounds.
    Credits per attributed conversion sum to exactly 1 up to float
    rounding (tested); unattributed conversions don't appear (inner
    join) — use attribute_last_touch for the null-credit accounting.

    ``ts`` must be INTEGER epoch units (the attribute_last_touch
    convention, validated here): binned_range_join's bucket math uses
    integer DIV, and backward-inclusiveness is encoded as the
    half-open window ``(-horizon, 1)`` — i.e. [cts - horizon, cts] —
    which is equivalent only when timestamps are integral (a
    fractional ts would silently admit touches in (cts, cts + 1)).

    Returns (key, conversion_id, conversion_ts, touch_id, touch_type,
    touch_ts, n_touches, credit).
    """
    if model not in ("linear", "u_shaped"):
        raise ValueError(f"attribute_multi_touch: unknown model {model!r}")
    ts_t = events.schema[ts].dataType.simpleString()
    if ts_t not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"attribute_multi_touch: ts column {ts!r} must be an integer "
            f"epoch-units type, got {ts_t} (the [cts - horizon, cts] "
            "window is encoded as the half-open integer range "
            "(-horizon, 1))")
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(key), F.col(ts).alias("__cts"),
        F.col(id_col).alias("conversion_id"))
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(key), F.col(ts).alias("__tts"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"))
    pairs = binned_range_join(conv, touch, key, "__cts", "__tts",
                              -horizon, 1)
    w = Window.partitionBy("conversion_id")
    asc = w.orderBy("__tts", "touch_id")
    n = F.count(F.lit(1)).over(w)
    pos = F.row_number().over(asc)
    if model == "linear":
        credit = F.lit(1.0) / n
    else:
        first, last = pos == 1, pos == n
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when(first | last, F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - 2)))
    return pairs.select(
        key, "conversion_id", F.col("__cts").alias("conversion_ts"),
        "touch_id", "touch_type", F.col("__tts").alias("touch_ts"),
        n.cast("int").alias("n_touches"), credit.alias("credit"))


def grouped_regression(df: DataFrame, keys: list[str], x: str,
                       y: str) -> DataFrame:
    """Per-group OLS of y on x via Spark's moment aggregates — one
    partial+final aggregate per group, sufficient statistics only (no
    per-group data movement beyond the running sums). Returns
    (keys..., n, slope, intercept, r2); groups with zero x-variance get
    null slope/intercept/r2 (regr_* semantics)."""
    return df.groupBy(*keys).agg(
        F.regr_count(F.col(y), F.col(x)).alias("n"),
        F.regr_slope(F.col(y), F.col(x)).alias("slope"),
        F.regr_intercept(F.col(y), F.col(x)).alias("intercept"),
        F.regr_r2(F.col(y), F.col(x)).alias("r2"))


def target_encode_loo(df: DataFrame, cat: str, target: str,
                      m: float = 10.0) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing: the feature-
    pipeline staple for turning a categorical column into the mean of a
    numeric target over the OTHER rows of its category (dropping the row's
    own contribution kills the self-leakage that makes naive mean encoding
    overfit), plus the m-weighted blend toward the global mean that keeps
    rare categories sane.

    te_loo    = (sum_cat - own) / (n_cat - 1)          (null when n_cat = 1)
    te_smooth = (sum_cat - own + m * global_mean) / (n_cat - 1 + m)

    Scale shape: ONE partial+final (category) aggregate -> a frame bounded
    by category cardinality, broadcast-joined back onto the scan; the
    global mean is a 1-row broadcast. No window over the data, no shuffle
    of the fact table at all — the encode is a scan-side projection, which
    is what lets it run inside the same stage as downstream filters at
    100 TB. (A partitionBy(cat) window would hash all rows onto ~k keys —
    the exact skew this formulation avoids.)
    """
    stats = df.groupBy(cat).agg(
        F.sum(target).alias("__sum"), F.count(target).alias("__n"))
    glob = df.agg(F.avg(target).alias("__gmean"))
    out = (df.join(F.broadcast(stats), cat)
             .crossJoin(F.broadcast(glob)))
    own = F.col(target)
    loo = F.when(F.col("__n") > 1,
                 (F.col("__sum") - own) / (F.col("__n") - 1))
    smooth = ((F.col("__sum") - own + F.lit(m) * F.col("__gmean"))
              / (F.col("__n") - 1 + F.lit(m)))
    return out.select(
        *df.columns,
        F.col("__n").alias("cat_n"),
        # 4 dp, the house precision for money-scale means: the category
        # sums behind these ratios reorder under partial aggregation, and
        # 4 dp absorbs that last-ulp drift at fixture magnitudes (~1e5).
        F.round(loo, 4).alias("te_loo"),
        F.round(smooth, 4).alias("te_smooth"))


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Partition-skew diagnostic for a prospective shuffle/join key: per-key
    row counts -> the top heavy keys with their share and cumulative share,
    plus corpus-level skew summary columns (distinct keys, max/mean count
    ratio). THE pre-flight check before keying a 100 TB shuffle — a
    max/mean ratio in the hundreds says salt this key or let AQE split it.

    Scale shape: ONE partial+final (key) count aggregate; every window
    below runs over the per-key AGGREGATE frame (bounded by key
    cardinality), never the data. For key spaces too large to hold even as
    an aggregate, the documented dial is the CMS heavy-hitter sketch
    (plans/llm_ops.py::text_heavy_hitters) — same output contract, bounded
    state.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    order = [F.desc("cnt"), F.col(key).asc()]
    whole = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    run = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    total = F.sum("cnt").over(whole)
    n_keys = F.count(F.lit(1)).over(whole)
    ranked = counts.select(
        F.row_number().over(Window.orderBy(*order)).alias("rank"),
        F.col(key),
        F.col("cnt"),
        F.round(F.col("cnt") / total, 6).alias("share"),
        F.round(F.sum("cnt").over(run) / total, 6).alias("cum_share"),
        n_keys.alias("n_keys"),
        F.round(F.max("cnt").over(whole) * n_keys / total, 4)
         .alias("skew_ratio"))
    return ranked.filter(F.col("rank") <= top)


def mutual_information(df: DataFrame, x: str, y: str) -> DataFrame:
    """Mutual information between two categorical columns, with per-cell
    pointwise MI: the feature-selection / redundancy statistic that
    quantifies what the chi-square independence test only detects. Natural
    log; mi_total is in nats.

    Scale shape: ONE partial+final (x, y) count aggregate; the marginal /
    total / sum windows all run over the <= |X|x|Y|-cell AGGREGATE frame,
    never the data. No join, no sort of the data path.
    """
    cells = df.groupBy(x, y).agg(F.count(F.lit(1)).alias("n"))
    whole = Window.orderBy(x, y).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    wx = Window.partitionBy(x).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    wy = Window.partitionBy(y).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    tot = F.sum("n").over(whole)
    pxy = F.col("n") / tot
    px = F.sum("n").over(wx) / tot
    py = F.sum("n").over(wy) / tot
    pmi = F.log(pxy / (px * py))
    scored = cells.select(
        x, y, "n",
        F.round(pxy, 6).alias("p_xy"),
        F.round(pmi, 6).alias("pmi"),
        (pxy * pmi).alias("__term"))
    whole2 = Window.orderBy(x, y).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return scored.select(
        x, y, "n", "p_xy", "pmi",
        F.round(F.col("__term"), 6).alias("mi_term"),
        F.round(F.sum("__term").over(whole2), 6).alias("mi_total"))


def roc_auc_binned(df: DataFrame, score: str, label: Column,
                   bins: int = 20) -> DataFrame:
    """Binned ROC curve + trapezoidal AUC for a numeric score against a
    boolean label — the evaluation statistic for every quality/toxicity/
    langid classifier a curation pipeline gates on. Thresholds are the
    score's ``bins``-quantile boundaries (the equidepth_histogram
    pattern), so the curve is the exact ROC evaluated at those operating
    points and the AUC is its trapezoid integral (a lower-resolution —
    never biased — estimate of the exact AUC; more bins converge on it).

    Null score/label values raise in-plan (r14 hardening, aligning
    with calibration_bins — the two classifier-eval tools share one
    contract): a null label previously counted in the bucket total but
    not its positives, silently scoring "unknown" as "negative" and
    biasing every TPR/FPR point; an eval tool must be loud, not
    conservative (wilson_pass_rate keeps its documented conservative
    coercion because it IS a gate). Filter or impute nulls explicitly
    first.

    Scale shape: ONE percentile aggregate (swap to approx_percentile at
    100 TB, same plan) -> <= bins-1 boundaries broadcast; scan-side
    strictly-below bucket fold; ONE partial+final (bucket) aggregate; the
    cumulative TPR/FPR and trapezoid windows run over the <= bins-row
    AGGREGATE frame. No global sort of the data — the thing the textbook
    rank-sum AUC (a total order over every score) cannot avoid.
    """
    if bins < 2:
        raise ValueError("roc_auc_binned: bins must be >= 2")
    fracs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    bounds = df.agg(F.array_distinct(
        F.percentile(F.col(score), fracs)).alias("__bs"))
    bucket = (F.size(F.filter(F.col("__bs"),
                              lambda bnd: bnd < F.col(score))) + 1)
    agg = (df.crossJoin(F.broadcast(bounds))
             .select(bucket.alias("__bucket"),
                     F.col(score).alias("__s"),
                     label.cast("long").alias("__pos"))
             .groupBy("__bucket")
             .agg(F.sum("__pos").alias("n_pos"),
                  (F.count(F.lit(1)) - F.sum("__pos")).alias("n_neg"),
                  F.sum(F.when(F.col("__pos").isNull()
                               | F.col("__s").isNull(), 1).otherwise(0))
                   .alias("__badl")))
    # guard as a FILTER (prune-proof — the welch_ttest lesson): any
    # bucket holding a null score/label raises
    agg = agg.filter(F.when(
        F.col("__badl") > 0,
        F.raise_error(F.lit(
            "roc_auc_binned: null score/label values found — a null "
            "label silently scores as a negative and biases every "
            "TPR/FPR point; filter or impute them explicitly first"))
    ).otherwise(F.lit(True)))
    # everything below runs over the <= bins-row aggregate frame
    desc = Window.orderBy(F.desc("__bucket"))
    run = desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = desc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    tpr = F.sum("n_pos").over(run) / F.sum("n_pos").over(whole)
    fpr = F.sum("n_neg").over(run) / F.sum("n_neg").over(whole)
    pts = agg.select(
        F.row_number().over(desc).alias("point"),
        "n_pos", "n_neg", tpr.alias("__tpr"), fpr.alias("__fpr"))
    desc2 = Window.orderBy("point")
    lag_t = F.lag("__tpr", 1, 0.0).over(desc2)
    lag_f = F.lag("__fpr", 1, 0.0).over(desc2)
    trap = (F.col("__fpr") - lag_f) * (F.col("__tpr") + lag_t) / 2
    whole2 = Window.orderBy("point").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return pts.select(
        "point", "n_pos", "n_neg",
        F.round("__fpr", 6).alias("fpr"),
        F.round("__tpr", 6).alias("tpr"),
        F.round(F.sum(trap).over(whole2), 6).alias("auc_total"))


def rolling_anomaly(df: DataFrame, key: str, ts: str, value: str,
                    id_col: str, w: int = 20, z_thresh: float = 3.0,
                    min_n: int = 8) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each row is scored
    against the mean/stddev of its own trailing window of ``w`` PRIOR
    rows (same key, (ts, id) order — strictly causal, the row never sees
    itself), and rows with |z| >= ``z_thresh`` are flagged. The streaming-
    shaped tabular outlier monitor (metric spikes, fraud amounts, sensor
    glitches); ``min_n`` prior points are required before scoring so
    cold-start rows never alert off a 2-point "distribution".

    Null ``value`` rows are dropped BEFORE the window, so the trailing
    frame spans the last ``w`` non-null OBSERVATIONS — the same
    semantics as the live streaming twin's O(w) value ring
    (streaming/pipeline.py::anomaly_stream); without the filter a null
    row would occupy a frame slot and silently shrink n_prior, and the
    two forms would diverge on data containing nulls. (A null-value row
    can never be scored anyway — its z-score is null.)

    Scale shape: ONE hash shuffle on ``key`` + per-key sort — the same
    single-exchange shape as sessionize/asof_join; the sliding frame is
    w-bounded per row, state never exceeds w values regardless of run
    length. Deterministic under ties via the (ts, id) total order.
    """
    df = df.filter(F.col(value).isNotNull())
    win = (Window.partitionBy(key)
           .orderBy(F.col(ts).asc(), F.col(id_col).asc())
           .rowsBetween(-w, -1))
    mean = F.avg(value).over(win)
    sd = F.stddev_samp(value).over(win)
    n = F.count(value).over(win)
    z = (F.col(value) - mean) / sd
    scored = df.select(
        key, ts, id_col, F.col(value),
        n.alias("n_prior"),
        F.round(mean, 6).alias("roll_mean"),
        F.round(sd, 6).alias("roll_std"),
        F.round(z, 4).alias("zscore"),
        z.alias("__z"), sd.alias("__sd"))
    return (scored
            .filter((F.col("n_prior") >= min_n) & (F.col("__sd") > 1e-9)
                    & (F.abs(F.col("__z")) >= z_thresh))
            .drop("__z", "__sd"))


def welch_ttest(df: DataFrame, variant: str, value: str) -> DataFrame:
    """Two-sample Welch's t-test between variant 0 and variant 1 of an
    A/B assignment column: the experiment-analysis statistic for unequal
    variances/sizes (the default test — Student's equal-variance form is
    the special case nobody's data satisfies). Returns ONE row:
    (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat, df_welch,
    significant_05) with df from the Welch-Satterthwaite approximation
    and the 5% two-sided normal-approximation flag.

    The variant column must be a binary {0, 1} assignment: the fold
    below takes per-moment maxima across the non-zero groups, so a third
    variant value would silently mix moments from DIFFERENT groups into
    one incoherent t-statistic. Validated inside the plan (the per-
    variant aggregate is the only frame that sees the distinct values —
    a raise_error fires on the first non-{0,1}/null variant) rather than
    with a driver-side pre-pass that would cost a second scan. The guard
    rides a FILTER predicate, not an output column: a column-wrapped
    raise is silently removed by Catalyst column pruning the moment a
    consumer selects a subset (verified), while a filter decides row
    membership and can never be pruned.

    Scale shape: ONE partial+final (variant) aggregate carrying count/
    mean/var moments — five running sums through the shuffle, never the
    observations (the grouped_regression pattern); the 2-row result is
    folded to one row with a second trivial aggregate. Nothing else
    moves.
    """
    g = df.groupBy(variant).agg(
        F.count(value).alias("__n"),
        F.avg(value).alias("__m"),
        F.var_samp(value).alias("__v"))
    is_a = F.col(variant) == 0
    row = g.agg(
        F.max(F.when(is_a, F.col("__n"))).alias("n_a"),
        F.max(F.when(~is_a, F.col("__n"))).alias("n_b"),
        F.max(F.when(is_a, F.col("__m"))).alias("__ma"),
        F.max(F.when(~is_a, F.col("__m"))).alias("__mb"),
        F.max(F.when(is_a, F.col("__v"))).alias("__va"),
        F.max(F.when(~is_a, F.col("__v"))).alias("__vb"),
        F.sum(F.when(F.col(variant).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__bad"))
    sa = F.col("__va") / F.col("n_a")
    sb = F.col("__vb") / F.col("n_b")
    t = (F.col("__ma") - F.col("__mb")) / F.sqrt(sa + sb)
    dfw = ((sa + sb) * (sa + sb)
           / (sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)))
    guard = F.when(
        F.col("__bad") > 0,
        F.raise_error(F.lit(
            "welch_ttest: variant column must be a binary {0, 1} "
            "assignment — found other/null variant values; the two-"
            "group moment fold is undefined for 3+ variants"))
    ).otherwise(F.lit(True))
    return row.filter(guard).select(
        "n_a", "n_b",
        F.round("__ma", 4).alias("mean_a"),
        F.round("__mb", 4).alias("mean_b"),
        F.round("__va", 4).alias("var_a"),
        F.round("__vb", 4).alias("var_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(dfw, 2).alias("df_welch"),
        (F.abs(t) > 1.96).alias("significant_05"))


def _survival_counts(df: DataFrame, duration: str,
                     observed: str) -> DataFrame:
    """Shared (duration)-aggregate for the survival estimators:
    per-duration event/censor counts under the survival stack's strict
    contract (the r13-advice bug class closed STACK-WIDE in r14, not
    just in logrank/cox): ``observed`` outside {0, 1} (incl. null)
    raises in-plan — a bad value silently skews n_event AND drives
    n_censor = sum(1 - observed) negative while the subject stays in
    the risk set; a null observed silently drops the subject from the
    risk set entirely. Null durations raise in-plan — Spark windows
    sort NULLS FIRST while SQL oracles' ORDER BY sorts NULLS LAST, so
    a null-duration row shifts every risk set differently per
    engine."""
    per_t = df.groupBy(duration).agg(
        F.sum(F.col(observed).cast("long")).alias("n_event"),
        F.sum(F.lit(1) - F.col(observed).cast("long")).alias("n_censor"),
        F.sum(F.when(F.col(observed).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__badobs"))
    return per_t.filter(
        F.when(F.col("__badobs") > 0, F.raise_error(F.lit(
            "survival estimator: observed column must be a 0/1 event "
            "indicator — found other/null observed values")))
         .when(F.isnull(duration), F.raise_error(F.lit(
            "survival estimator: duration column must be non-null — "
            "null durations sort NULLS FIRST on Spark windows but "
            "NULLS LAST in SQL oracles, shifting every risk set")))
         .otherwise(F.lit(True))).drop("__badobs")


def kaplan_meier(df: DataFrame, duration: str, observed: str) -> DataFrame:
    """Kaplan-Meier survival estimator over per-subject
    (``duration``, ``observed``) rows (observed = 1 event, 0 censored):
    the churn/retention/time-to-failure curve. Standard product-limit
    semantics — censored subjects leave the risk set without moving the
    curve; S drops only at observed-event times; if every subject at
    risk fails at once S hits 0 and stays there.

    Scale shape: ONE partial+final (duration) aggregate -> a frame
    bounded by distinct duration values (day-binned in any sane use);
    the risk-set and product-limit windows (the product computed as
    exp of a running ln-sum, zero-guarded) run over that AGGREGATE
    frame, never the subjects.

    Contract (r14 hardening, shared with nelson_aalen / logrank_test /
    cox_score_test via ``_survival_counts``): observed outside {0, 1}
    and null durations raise in-plan.
    """
    per_t = _survival_counts(df, duration, observed)
    ordw = Window.orderBy(duration)
    prior = ordw.rowsBetween(Window.unboundedPreceding, -1)
    whole = ordw.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = F.sum(F.col("n_event") + F.col("n_censor")).over(whole)
    n_risk = total - F.coalesce(
        F.sum(F.col("n_event") + F.col("n_censor")).over(prior), F.lit(0))
    staged = per_t.select(
        duration, "n_event", "n_censor", n_risk.alias("n_risk"))
    # product via exp(sum(ln)): ln terms only where S actually moves.
    # The all-at-risk-fail row would be ln(0) — Spark yields null there
    # and DuckDB -inf, so it is excluded from the sum on BOTH engines
    # and the `dead` latch pins S to exactly 0.0 from that row on.
    dead = F.max((F.col("n_event") >= F.col("n_risk")).cast("int")).over(cum)
    term = F.when((F.col("n_event") > 0)
                  & (F.col("n_event") < F.col("n_risk")),
                  F.log(F.lit(1.0) - F.col("n_event") / F.col("n_risk"))
                  ).otherwise(F.lit(0.0))
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(cum)))
    return staged.select(
        duration, "n_risk", "n_event", "n_censor",
        F.round(surv, 6).alias("survival"))


def nelson_aalen(df: DataFrame, duration: str, observed: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over per-subject
    (``duration``, ``observed``) rows — ``kaplan_meier``'s machinery
    verbatim with a running SUM of d_i/n_i instead of a running product
    of (1 - d_i/n_i): H(t) = sum_{t_i <= t} d_i / n_i, the
    hazard-domain view of the same survival data (exp(-H) approximates
    S, and H is the natural scale for comparing hazards or feeding a
    proportional-hazards fit). Also returns the classical variance
    estimator var(H(t)) = sum d_i / n_i^2 (Klein & Moeschberger form).

    Unlike the KM product, the hazard sum has no zero-latch: the
    all-at-risk-fail row contributes d/n = 1 like any other, so no
    ln(0)/dead-latch guard is needed — every term is a plain division
    by the (>= 1 by construction) risk count.

    Scale shape: identical to ``kaplan_meier`` — ONE partial+final
    (duration) aggregate to a frame bounded by distinct duration
    values; the risk-set and running-sum windows run over that
    AGGREGATE frame, never the subjects.

    Contract (r14 hardening, shared with kaplan_meier / logrank_test /
    cox_score_test via ``_survival_counts``): observed outside {0, 1}
    and null durations raise in-plan.
    """
    per_t = _survival_counts(df, duration, observed)
    ordw = Window.orderBy(duration)
    prior = ordw.rowsBetween(Window.unboundedPreceding, -1)
    whole = ordw.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = F.sum(F.col("n_event") + F.col("n_censor")).over(whole)
    n_risk = total - F.coalesce(
        F.sum(F.col("n_event") + F.col("n_censor")).over(prior), F.lit(0))
    staged = per_t.select(
        duration, "n_event", "n_censor", n_risk.alias("n_risk"))
    # the ordered cumulative sums add doubles in ONE deterministic
    # order on both engines (the window is sorted), so no rounding
    # slack beyond the output round is needed
    hazard = F.sum(F.col("n_event") / F.col("n_risk")).over(cum)
    # d / n / n, NOT d / (n * n): the integer square would overflow
    # long (Spark ANSI throws, DuckDB errors) once the risk set passes
    # ~3e9 subjects; dividing twice goes double after the first step
    # and both engines evaluate the same two-division expression
    haz_var = F.sum(F.col("n_event")
                    / F.col("n_risk") / F.col("n_risk")).over(cum)
    return staged.select(
        duration, "n_risk", "n_event", "n_censor",
        F.round(hazard, 6).alias("cum_hazard"),
        F.round(haz_var, 8).alias("hazard_var"))


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution of a positive money-scale
    column against Benford's law, with the chi-square goodness-of-fit
    distance — the forensic-accounting / synthetic-data smell test.
    The digit is extracted through INTEGER string math (value -> exact
    cents -> leading digit of the BIGINT), never log10 floors, so the
    bucketing is bit-identical on any engine.

    The output always carries all NINE digit rows: a digit that never
    occurs still contributes its (0 - E)^2 / E * N term to the textbook
    goodness-of-fit statistic (omitting absent digits understates
    chi-square exactly when the distribution is most broken), so the
    observed counts are left-joined onto the 1..9 domain before the
    chi-square fold.

    Scale shape: scan-side digit algebra + ONE partial+final (digit)
    aggregate; the 9-row domain join and the shares/expected/chi-square
    windows run over the <= 9-row AGGREGATE frame.
    """
    cents = F.round(F.col(col) * 100, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    agg = (df.select(cents.alias("__c"), digit.alias("digit"))
             .filter(F.col("__c") > 0)
             .groupBy("digit")
             .agg(F.count(F.lit(1)).alias("n")))
    domain = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"))
    full = domain.join(agg, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"))
    whole = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    total = F.sum("n").over(whole)
    # degenerate input (no positive values at all): total = 0 would be
    # 0/0 — ANSI Spark throws and DuckDB yields NaN, so both sides
    # guard the share to NULL explicitly (rows stay, shares/chi null)
    obs = F.when(total > 0, F.col("n") / total)
    exp_p = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    chi_term = (obs - exp_p) * (obs - exp_p) / exp_p * total
    return full.select(
        "digit", "n",
        F.round(obs, 6).alias("obs_pct"),
        F.round(exp_p, 6).alias("exp_pct"),
        F.round(F.sum(chi_term).over(whole), 4).alias("chisq_total"))


def fd_violations(df: DataFrame, lhs: str, rhs: str,
                  top: int = 10) -> DataFrame:
    """Functional-dependency profiling: does ``lhs`` determine ``rhs``?
    Reports the top violating left-hand-side values (those mapping to
    more than one distinct rhs) plus corpus-level FD health columns —
    the schema-discovery / data-contract audit (Metanome-style FD
    checking, the single-dependency case).

    Scale shape: ONE partial+final (lhs) aggregate with an exact
    DISTINCT rhs count (Expand on two columns only); the summary is a
    second aggregate over the per-lhs frame, broadcast back; top
    violators ship via TakeOrdered — no window over the per-key frame,
    no global sort.
    """
    per = df.groupBy(lhs).agg(
        F.countDistinct(rhs).alias("n_rhs"),
        F.count(F.lit(1)).alias("n_rows"))
    summary = per.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating"))
    out = (per.crossJoin(F.broadcast(summary))
              .filter(F.col("n_rhs") > 1)
              .select(
                  lhs, "n_rhs", "n_rows", "n_keys", "n_violating",
                  F.round(F.lit(1.0) - F.col("n_violating") / F.col("n_keys"),
                          6).alias("fd_holds_pct")))
    return out.orderBy(F.desc("n_rhs"), F.desc("n_rows"),
                       F.col(lhs).asc()).limit(top)


def cusum_changepoint(df: DataFrame, ts: str, value: str,
                      bin_ms: int = 3_600_000) -> DataFrame:
    """CUSUM change-point detection over a time-binned series: bin the
    stream, take each bin's mean, and accumulate S_t = sum_{i<=t}
    (x_i - x_bar); the bin where |S| peaks is the classic CUSUM
    change-point estimate — it LOCALIZES the shift the drift monitors
    (psi_drift, text_kl_drift) only detect. Returns one row per bin:
    (bin_idx, n, bin_mean, cusum, max_abs_cusum, changepoint_bin,
    is_changepoint).

    ``ts`` must be integer epoch units (integer DIV binning, exact).

    Scale shape: ONE partial+final (bin) aggregate -> a frame bounded by
    the time range over ``bin_ms``; the series mean / running CUSUM /
    arg-peak windows all run over that AGGREGATE frame, never the
    events. No global sort of the data, no join.
    """
    _require_plain_identifier("cusum_changepoint", ts)
    _require_integer_epoch_ts("cusum_changepoint", df, ts)
    binned = (df.select(F.expr(f"{ts} DIV {bin_ms}").alias("__bin"),
                        F.col(value).alias("__v"))
              .groupBy("__bin")
              .agg(F.count("__v").alias("n"), F.avg("__v").alias("__m")))
    ordw = Window.orderBy("__bin")
    whole = ordw.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    xbar = F.avg("__m").over(whole)
    staged = binned.select(
        "__bin", "n", "__m",
        F.sum(F.col("__m") - xbar).over(cum).alias("__s"))
    peak = Window.orderBy(F.abs(F.col("__s")).desc(), F.col("__bin").asc())
    arg = F.first("__bin").over(
        peak.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    whole2 = Window.orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return staged.select(
        F.col("__bin").cast("long").alias("bin_idx"),
        "n",
        F.round("__m", 6).alias("bin_mean"),
        F.round("__s", 6).alias("cusum"),
        F.round(F.max(F.abs(F.col("__s"))).over(whole2), 6)
         .alias("max_abs_cusum"),
        arg.cast("long").alias("changepoint_bin"),
        (F.col("__bin") == arg).alias("is_changepoint"))


def ecdf_drift(df: DataFrame, value: str, ts: str,
               bins: int = 20) -> DataFrame:
    """Kolmogorov-Smirnov-style ecdf drift between the first and second
    halves of a table's time range: the NONPARAMETRIC companion to
    psi_drift — instead of binned mass ratios it compares the two
    cumulative distributions at the baseline's quantile boundaries and
    reports the max gap (a lower bound of the exact two-sample KS D
    that converges as bins grow; exact D needs a total order over every
    distinct value, which is precisely the sort this formulation
    avoids). Same split/binning conventions as psi_drift (integer-ts
    midpoint, baseline quantile boundaries, strictly-below fold).

    Returns per non-empty bucket: (bucket, n_base, n_curr, f_base,
    f_curr, gap, ks_stat) where f_* are the cumulative shares at the
    bucket's upper boundary and ks_stat = max gap over all buckets.

    Scale shape (psi_drift verbatim): ONE (min, max) scalar aggregate,
    ONE baseline percentile aggregate (approx_percentile at 100 TB),
    scan-side bucket fold, ONE partial+final bucket aggregate; the
    cumulative/max windows run over the <= bins-row AGGREGATE frame.
    """
    if bins < 2:
        raise ValueError("ecdf_drift: bins must be >= 2")
    _require_plain_identifier("ecdf_drift", ts)
    _require_integer_epoch_ts("ecdf_drift", df, ts)
    mid = df.agg(F.expr(f"(min({ts}) + max({ts})) DIV 2").alias("__mid"))
    with_mid = df.crossJoin(F.broadcast(mid))
    is_base = F.col(ts) < F.col("__mid")
    fracs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    bounds = (with_mid.filter(is_base)
              .agg(F.array_distinct(
                  F.percentile(F.col(value), fracs)).alias("__bs")))
    bucket = (F.size(F.filter(F.col("__bs"),
                              lambda b: b < F.col(value))) + 1)
    agg = (
        with_mid.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("__bucket"),
                is_base.cast("long").alias("__b"),
                (~is_base).cast("long").alias("__c"))
        .groupBy("__bucket")
        .agg(F.sum("__b").alias("n_base"), F.sum("__c").alias("n_curr"))
    )
    # everything below runs over the <= bins-row aggregate frame
    ordw = Window.orderBy("__bucket")
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = ordw.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    f_base = F.sum("n_base").over(cum) / F.sum("n_base").over(whole)
    f_curr = F.sum("n_curr").over(cum) / F.sum("n_curr").over(whole)
    gap = F.abs(f_base - f_curr)
    staged = agg.select(
        F.dense_rank().over(ordw).alias("bucket"),
        "n_base", "n_curr",
        F.round(f_base, 6).alias("f_base"),
        F.round(f_curr, 6).alias("f_curr"),
        gap.alias("__gap"))
    whole2 = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return staged.select(
        "bucket", "n_base", "n_curr", "f_base", "f_curr",
        F.round(F.col("__gap"), 6).alias("gap"),
        F.round(F.max("__gap").over(whole2), 6).alias("ks_stat"))


def conversion_latency(events: DataFrame, conversion_type: str,
                       touch_types: list[str], horizon: int,
                       key: str = "user_id", ts: str = "ts_ms",
                       type_col: str = "event_type",
                       id_col: str = "event_id") -> DataFrame:
    """Conversion-latency distribution: quantiles and mean of
    (conversion_ts - last_touch_ts) over attributed conversions — the
    'how long after the ad do people buy' funnel-velocity statistic,
    built ON the attribute_last_touch semantics (same horizon and tie
    conventions, unattributed conversions counted but excluded from the
    latency aggregates). Returns ONE row: (n_conversions, n_attributed,
    p25_ms, p50_ms, p75_ms, p90_ms, mean_latency_ms).

    Scale shape: the attribution union-sort (one key-keyed exchange) +
    ONE global percentile aggregate over the per-conversion latencies
    (exact here; approx_percentile is the 100 TB dial, same plan).
    """
    att = attribute_last_touch(events, conversion_type, touch_types,
                               horizon, key, ts, type_col, id_col)
    lat = F.col("conversion_ts") - F.col("touch_ts")
    fr = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.9))
    agg = att.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.count("touch_ts").alias("n_attributed"),
        F.percentile(lat, fr).alias("__q"),
        F.round(F.avg(lat), 4).alias("mean_latency_ms"))
    return agg.select(
        "n_conversions", "n_attributed",
        F.round(F.element_at("__q", 1), 4).alias("p25_ms"),
        F.round(F.element_at("__q", 2), 4).alias("p50_ms"),
        F.round(F.element_at("__q", 3), 4).alias("p75_ms"),
        F.round(F.element_at("__q", 4), 4).alias("p90_ms"),
        "mean_latency_ms")


def seasonal_outliers(df: DataFrame, ts: str, value: str, id_col: str,
                      period_ms: int = 3_600_000, cycle: int = 24,
                      z_thresh: float = 3.0, min_n: int = 8) -> DataFrame:
    """Seasonal-profile residual outliers: each row is scored against the
    mean/stddev of its own SEASONAL bucket (``(ts DIV period_ms) %
    cycle`` — hour-of-day with the defaults), and rows with |z| >=
    ``z_thresh`` are flagged. The profile-based complement of
    rolling_anomaly: that one asks "is this high vs the key's RECENT
    history", this one asks "is this high FOR A TUESDAY 3 AM" — a
    nightly batch spike that is normal at noon alerts here and not
    there, and vice versa. Buckets with fewer than ``min_n`` non-null
    observations never alert (cold-profile guard); null values can never
    score and are excluded from both the profile and the output.

    Scale shape: ONE partial+final (bucket) aggregate -> a <= ``cycle``-
    row profile frame BROADCAST back onto the scan — scoring is a
    scan-side projection, no window over the data, no data-sized
    shuffle (the target_encode_loo choreography).
    """
    prof = seasonal_profile(df, ts, value, period_ms, cycle)
    return score_against_seasonal_profile(
        df, prof, ts=ts, value=value, id_col=id_col, period_ms=period_ms,
        cycle=cycle, z_thresh=z_thresh, min_n=min_n)


def seasonal_profile(df: DataFrame, ts: str, value: str,
                     period_ms: int = 3_600_000,
                     cycle: int = 24) -> DataFrame:
    """The <= ``cycle``-row seasonal profile frame (bucket, n_bucket,
    mean, sd) that seasonal scoring runs against — computed in batch
    over history, applied in batch by seasonal_outliers or LIVE by
    streaming.pipeline.seasonal_gate_stream (the precompute-offline /
    score-online ops split). ONE partial+final (bucket) aggregate over
    the non-null values."""
    if period_ms < 1 or cycle < 1:
        raise ValueError("seasonal_profile: period_ms and cycle must be "
                         ">= 1 (cycle = 0 would divide by zero in the "
                         "bucket fold)")
    _require_plain_identifier("seasonal_profile", ts)
    _require_integer_epoch_ts("seasonal_profile", df, ts)
    bucket = F.expr(f"({ts} DIV {period_ms}) % {cycle}").cast("int")
    return (df.filter(F.col(value).isNotNull())
              .select(bucket.alias("bucket"), F.col(value).alias("__v"))
              .groupBy("bucket")
              .agg(F.count("__v").alias("n_bucket"),
                   F.avg("__v").alias("mean"),
                   F.stddev_samp("__v").alias("sd")))


def score_against_seasonal_profile(df: DataFrame, profile: DataFrame,
                                   ts: str, value: str, id_col: str,
                                   period_ms: int = 3_600_000,
                                   cycle: int = 24, z_thresh: float = 3.0,
                                   min_n: int = 8) -> DataFrame:
    """Score rows against a (possibly pre-computed) seasonal profile
    from ``seasonal_profile`` and keep the |z| >= ``z_thresh`` outliers.
    Pure column algebra + a broadcast join of the <= cycle-row profile,
    so it works unchanged on a STREAMING ``df`` (stream-static join,
    stateless append) — the live gate wraps exactly this function."""
    if period_ms < 1 or cycle < 1:
        raise ValueError("score_against_seasonal_profile: period_ms "
                         "and cycle must be >= 1")
    _require_plain_identifier("score_against_seasonal_profile", ts)
    _require_integer_epoch_ts("score_against_seasonal_profile", df, ts)
    bucket = F.expr(f"({ts} DIV {period_ms}) % {cycle}").cast("int")
    based = (df.filter(F.col(value).isNotNull())
               .select(F.col(id_col), F.col(ts), F.col(value),
                       bucket.alias("bucket")))
    z = (F.col(value) - F.col("mean")) / F.col("sd")
    scored = based.join(F.broadcast(profile), "bucket").select(
        id_col, ts, "bucket", value,
        F.col("n_bucket"),
        F.round("mean", 6).alias("base_mean"),
        F.round("sd", 6).alias("base_std"),
        F.round(z, 4).alias("zscore"),
        z.alias("__z"), F.col("sd").alias("__s"))
    return (scored
            .filter((F.col("n_bucket") >= min_n) & (F.col("__s") > 1e-9)
                    & (F.abs(F.col("__z")) >= z_thresh))
            .drop("__z", "__s"))


def kfold_assignment_audit(df: DataFrame, id_col: str, stratum: str,
                           k: int = 5, seed: str = "fold") -> DataFrame:
    """Deterministic k-fold assignment + balance audit: every row gets
    fold = md5-hash(``seed``:id) mod ``k`` (stable across runs, engines,
    and partitionings — the same hex-int trick as the graded A/B
    assignment), then the audit reports, per (fold, stratum) cell, the
    stratum's share WITHIN the fold against its global share — the
    cross-validation hygiene check that a hash-based split really is
    stratum-balanced (a skewed id space or tiny stratum shows up as a
    large share_gap; max_abs_gap is the corpus-level verdict).

    Scale shape: scan-side fold algebra + ONE partial+final
    (fold, stratum) aggregate; every share/gap/max window runs over the
    <= k * |strata| AGGREGATE frame, never the rows. A NULL stratum
    value audits as its own stratum group (you usually want to know a
    fold is over-weighted in unlabeled rows too) — but a NULL id has no
    fold at all (the hash of null is null), so the plan raises on the
    first one instead of silently parking those rows in a NULL fold
    that skews every share (the welch_ttest validation pattern).
    """
    from data_pipeline_eng_project_1_spark.functions import hashing

    if k < 2:
        raise ValueError("kfold_assignment_audit: k must be >= 2")
    # the stratum column passes through to the output NEXT TO the fixed
    # output names — a stratum literally named "fold" or "n" would make
    # the groupBy/select ambiguous (sibling operators namespace their
    # internals with __; here fold/n ARE the outputs, so reject instead)
    reserved = ("fold", "n", "fold_total", "stratum_share",
                "global_share", "share_gap", "max_abs_gap")
    if stratum in reserved:
        raise ValueError(
            f"kfold_assignment_audit: stratum column {stratum!r} collides "
            f"with an output column of this audit {reserved}; alias it "
            "first")
    fold = (hashing.hex_int(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))) % k)
    agg = (df.select(fold.cast("int").alias("fold"), F.col(stratum))
             .groupBy("fold", stratum)
             .agg(F.count(F.lit(1)).alias("n")))
    whole = Window.orderBy("fold", stratum).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    fold_w = Window.partitionBy("fold")
    strat_w = Window.partitionBy(stratum)
    share = F.col("n") / F.sum("n").over(fold_w)
    gshare = F.sum("n").over(strat_w) / F.sum("n").over(whole)
    gap = share - gshare
    staged = agg.select(
        "fold", stratum, "n",
        F.sum("n").over(fold_w).alias("fold_total"),
        F.round(share, 6).alias("stratum_share"),
        F.round(gshare, 6).alias("global_share"),
        F.round(gap, 6).alias("share_gap"),
        F.abs(gap).alias("__ag"))
    # guard as a FILTER (prune-proof — the welch_ttest lesson): the
    # NULL-fold group only exists when some id hashed to null
    staged = staged.filter(F.when(
        F.col("fold").isNull(),
        F.raise_error(F.lit(
            "kfold_assignment_audit: null id values found — a null id "
            "has no fold; filter or impute ids first"))
    ).otherwise(F.lit(True)))
    return staged.select(
        "fold", stratum, "n", "fold_total",
        "stratum_share", "global_share", "share_gap",
        F.round(F.max("__ag").over(whole), 6).alias("max_abs_gap"))


def calibration_bins(df: DataFrame, score: str, label: Column,
                     bins: int = 10) -> DataFrame:
    """Classifier calibration audit: bin a [0, 1] ``score`` at its own
    equi-depth quantile boundaries, and per bin compare the OBSERVED
    positive rate of ``label`` against the mean predicted score —
    the reliability-diagram companion to the graded ROC/AUC evaluation
    (AUC measures ranking; this measures whether 0.8 MEANS 80%).
    Summary columns: ece_total = sum over bins of (n_b/N)*|obs - mean
    score| (expected calibration error) and brier_total = mean squared
    error of score vs label.

    Scale shape (roc_auc_binned verbatim): ONE percentile aggregate
    (swap in approx_percentile at 100 TB, same plan) broadcast as
    boundaries, scan-side strictly-below bucket fold, ONE partial+final
    bucket aggregate (count / score sum / positive count / squared-error
    sum ride together); the ECE/Brier windows run over the <= bins-row
    AGGREGATE frame. No global sort, no rank pass.
    """
    if bins < 2:
        raise ValueError("calibration_bins: bins must be >= 2")
    fracs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    bounds = df.agg(F.array_distinct(
        F.percentile(F.col(score), fracs)).alias("__bs"))
    bucket = (F.size(F.filter(F.col("__bs"),
                              lambda b: b < F.col(score))) + 1)
    y = label.cast("int")
    agg = (
        df.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("__bucket"), F.col(score).alias("__s"),
                y.alias("__y"))
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("__s").alias("__ssum"),
             F.sum("__y").cast("long").alias("n_pos"),
             F.sum((F.col("__s") - F.col("__y"))
                   * (F.col("__s") - F.col("__y"))).alias("__sq"),
             # null labels/scores would silently drop out of n_pos and
             # the Brier sum while still counting in n, skewing every
             # rate — raise in-plan instead (the welch_ttest pattern)
             F.sum(F.when(F.col("__y").isNull() | F.col("__s").isNull(),
                          1).otherwise(0)).alias("__badl"))
    )
    # guard as a FILTER (prune-proof — the welch_ttest lesson): any
    # bucket holding a null score/label raises
    agg = agg.filter(F.when(
        F.col("__badl") > 0,
        F.raise_error(F.lit(
            "calibration_bins: null score/label values found — a null "
            "drops out of the rate and Brier sums while still counting "
            "in n; filter or impute them explicitly first"))
    ).otherwise(F.lit(True)))
    # everything below runs over the <= bins-row aggregate frame
    whole = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    total = F.sum("n").over(whole)
    avg_s = F.col("__ssum") / F.col("n")
    obs = F.col("n_pos") / F.col("n")
    ece = F.sum(F.abs(obs - avg_s) * F.col("n")).over(whole) / total
    brier = F.sum("__sq").over(whole) / total
    return agg.select(
        F.dense_rank().over(Window.orderBy("__bucket")).alias("bucket"),
        "n", "n_pos",
        F.round(avg_s, 6).alias("avg_score"),
        F.round(obs, 6).alias("obs_rate"),
        F.round(obs - avg_s, 6).alias("gap"),
        F.round(ece, 6).alias("ece_total"),
        F.round(brier, 6).alias("brier_total"))


def acf_binned(df: DataFrame, ts: str, bin_ms: int = 3_600_000,
               max_lag: int = 24, max_bins: int = 1_000_000) -> DataFrame:
    """Autocorrelation function of the event-COUNT series: bin the
    stream, gap-fill empty bins with zero counts (an hour with no events
    is a real zero of the series, not a missing observation), and report
    the sample ACF at lags 1..``max_lag`` — the periodicity/seasonality
    diagnostic that tells you WHICH cycle (hourly? daily?) the seasonal
    profile and the drift monitors should be conditioned on. Standard
    sample-ACF convention: one global mean, denominator = full-series
    sum of squares, lag-ℓ numerator over the n-ℓ overlapping pairs.
    A constant series has zero variance -> null acf (documented); lags
    with NO overlapping pair (lag >= #bins) are OMITTED from the output
    rather than emitted with a meaningless non-positive n_pairs.

    ``ts`` must be integer epoch units (integer DIV binning, exact).

    Scale shape: ONE partial+final (bin) aggregate -> a frame bounded by
    the time range over ``bin_ms``; the gap-fill sequence, the centering
    window, the ``max_lag`` lead windows, and the final products
    aggregate ALL run over that <= #bins AGGREGATE frame — the events
    are touched exactly once. ``max_bins`` is the explicit contract on
    that frame: the series windows are GLOBALLY ordered, so the filled
    frame lands on one task regardless of how the gap-fill is produced
    (a distributed spark.range fill would need a driver collect of
    lo/hi — a second job over the events — only to re-exchange into the
    same single-task window); a tiny ``bin_ms`` over a wide ts range is
    a caller error, and the plan raises in-plan before exploding the
    fill sequence rather than materializing an arbitrarily long array.
    """
    _require_plain_identifier("acf_binned", ts)
    _require_integer_epoch_ts("acf_binned", df, ts)
    if max_lag < 1:
        raise ValueError("acf_binned: max_lag must be >= 1")
    if bin_ms < 1:
        raise ValueError("acf_binned: bin_ms must be >= 1")
    if max_bins < max_lag + 1:
        raise ValueError("acf_binned: max_bins must be >= max_lag + 1")
    binned = (df.select(F.expr(f"{ts} DIV {bin_ms}").alias("__bin"))
                .groupBy("__bin").agg(F.count(F.lit(1)).alias("__n")))
    rng = binned.agg(F.min("__bin").alias("__lo"),
                     F.max("__bin").alias("__hi"))
    # bound guard as a FILTER (prune-proof): the fill sequence explodes
    # from this one row — an unbounded range would materialize a
    # near-2^31 array on one executor before any window even runs
    rng = rng.filter(F.when(
        F.col("__hi") - F.col("__lo") + 1 > max_bins,
        F.raise_error(F.concat(
            F.lit(f"acf_binned: gap-fill range exceeds max_bins="
                  f"{max_bins} bins ("),
            (F.col("__hi") - F.col("__lo") + 1).cast("string"),
            F.lit(" needed) — the filled series is a single-task frame "
                  "by construction (globally ordered windows); raise "
                  "bin_ms or max_bins")))
    ).otherwise(F.lit(True)))
    filled = (rng.select(F.explode(F.sequence("__lo", "__hi"))
                         .alias("__bin"))
              .join(binned, "__bin", "left")
              .select("__bin",
                      F.coalesce(F.col("__n"), F.lit(0))
                       .cast("double").alias("__x")))
    whole = Window.orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    centered = filled.select(
        "__bin", (F.col("__x") - F.avg("__x").over(whole)).alias("__c"))
    ordw = Window.orderBy("__bin")
    leads = centered.select(
        "__c", *[F.lead("__c", lag).over(ordw).alias(f"__l{lag}")
                 for lag in range(1, max_lag + 1)])
    agg = leads.agg(
        F.count(F.lit(1)).alias("__nb"),
        F.sum(F.col("__c") * F.col("__c")).alias("__ss"),
        *[F.sum(F.col("__c") * F.col(f"__l{lag}")).alias(f"__num{lag}")
          for lag in range(1, max_lag + 1)])
    rows = ", ".join(
        f"{lag}, __nb - {lag}, __num{lag}" for lag in range(1, max_lag + 1))
    stacked = agg.select(
        F.col("__ss"),
        F.expr(f"stack({max_lag}, {rows}) AS (lag, n_pairs, __num)"))
    return (stacked
            .filter(F.col("n_pairs") >= 1)  # lag >= #bins: no pairs
            .select(
                F.col("lag").cast("int").alias("lag"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                # try_divide: a constant series has zero variance -> null
                # acf (ANSI mode would otherwise throw on the 0/0)
                F.round(F.try_divide(F.col("__num"), F.col("__ss")), 6)
                 .alias("acf")))


def gini_by_group(df: DataFrame, group: str, value: str,
                  id_col: str) -> DataFrame:
    """Per-group Gini concentration coefficient of a nonnegative
    ``value`` over member rows (0 = perfectly even, -> 1 = one member
    holds everything): the revenue/volume concentration audit behind
    'how dependent is this nation on its top customers'. Computed with
    the rank identity G = 2*sum(i*x_i) / (n*sum(x)) - (n+1)/n over the
    (value, id)-ordered members — deterministic under ties via the id
    tiebreak; a zero-total group has no defined concentration -> null;
    negative values make G meaningless, so the plan raises on the first
    one (the welch_ttest in-plan validation pattern). NULL values carry
    no concentration information and are dropped BEFORE ranking (they
    would otherwise take the lowest ranks and inflate n_members while
    escaping the sums — a silently corrupted statistic); a group whose
    values are all null disappears entirely.

    Scale shape: ``df`` is expected to be an AGGREGATE frame (e.g. one
    row per customer) — the rank window partitions by ``group`` over
    that frame, never the raw facts, and the final (group) aggregate
    folds each partition to one row. One exchange on ``group``.
    """
    df = df.filter(F.col(value).isNotNull())
    rnk = Window.partitionBy(group).orderBy(
        F.col(value).asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(group), F.col(value).alias("__x"),
        F.row_number().over(rnk).alias("__i"))
    agg = ranked.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("__x").alias("__tot"),
        F.sum(F.col("__i") * F.col("__x")).alias("__iw"),
        F.min("__x").alias("__mn"))
    n = F.col("n_members")
    gini = (F.lit(2.0) * F.col("__iw") / (n * F.col("__tot"))
            - (n + F.lit(1.0)) / n)
    # guard as a FILTER (prune-proof — the welch_ttest lesson)
    agg = agg.filter(F.when(
        F.col("__mn") < 0,
        F.raise_error(F.lit(
            "gini_by_group: value column must be nonnegative — the Gini "
            "rank identity is undefined for negative values"))
    ).otherwise(F.lit(True)))
    # total_value at 2dp: per-group money SUMS reorder under partial
    # aggregation, and at large n the float drift approaches the 0.5e-4
    # boundary a 4dp round would need — 2dp (cents) keeps 50x margin
    return agg.select(
        group, "n_members",
        F.round("__tot", 2).alias("total_value"),
        F.when(F.col("__tot") > 0, F.round(gini, 6)).alias("gini"))


def session_top_paths(df: DataFrame, key: str, ts: str, type_col: str,
                      id_col: str, gap: int = 1_800_000,
                      path_len: int = 3, top: int = 20) -> DataFrame:
    """Top session journeys: the most frequent length-``path_len`` runs
    of consecutive event types WITHIN a session (same ``gap``/tiebreak
    sessionization as the graded events_sessionize) — 'what are the top
    click-paths' sequence mining, the path complement of the graded
    Markov transition matrix (that one is memoryless bigram rates; this
    one surfaces whole journeys). Returns (path, n_occurrences, share)
    for the ``top`` most frequent paths, ties broken by path text so the
    k-boundary is deterministic.

    Path strings join the steps with ``>``; a type VALUE containing the
    delimiter would make distinct journeys collide into one path string
    (``['A>B','C']`` vs ``['A','B>C']``) and silently merge their
    counts, so the plan raises on the first offending value (the
    welch_ttest in-plan validation pattern, riding a filter so column
    pruning can't remove it).

    Scale shape: ONE hash exchange on ``key`` carries sessionize AND the
    path leads — the leads run over the key partition (sessions are
    contiguous in its (ts, id) order) and cross-session runs are dropped
    by session-id equality, so no second exchange on (key, session).
    Path counting is one partial+final aggregate over a frame bounded by
    |event types|^path_len; share windows run over that frame; the top-k
    ships as TakeOrdered.
    """
    if path_len < 2:
        raise ValueError("session_top_paths: path_len must be >= 2")
    if gap < 1:
        raise ValueError("session_top_paths: gap must be >= 1")
    sess = sessionize(df, key, ts, gap, order_tiebreak=id_col)
    # delimiter guard as a FILTER (prune-proof): a '>' inside a type
    # value would splice into the path string and merge distinct paths
    sess = sess.filter(F.when(
        F.col(type_col).contains(">"),
        F.raise_error(F.concat(
            F.lit("session_top_paths: event type value contains the "
                  "'>' path delimiter and would corrupt path strings: "),
            F.col(type_col)))
    ).otherwise(F.lit(True)))
    w = Window.partitionBy(key).orderBy(ts, id_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, path_len)]
    same_session = [
        F.lead("session_id", i).over(w) == F.col("session_id")
        for i in range(1, path_len)]
    runs = (sess.select(
                F.concat_ws(">", *steps).alias("path"),
                *[c.alias(f"__ok{i}") for i, c in enumerate(same_session)],
                *[s.isNotNull().alias(f"__nn{i}")
                  for i, s in enumerate(steps)])
            .filter(F.expr(" AND ".join(
                [f"__ok{i}" for i in range(len(same_session))]
                + [f"__nn{i}" for i in range(path_len)]))))
    agg = runs.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    whole = Window.orderBy("path").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    share = F.col("n_occurrences") / F.sum("n_occurrences").over(whole)
    return (agg.select("path", "n_occurrences",
                       F.round(share, 6).alias("share"))
               .orderBy(F.desc("n_occurrences"), F.asc("path"))
               .limit(top))


def wilson_pass_rate(df: DataFrame, group: str, passed: Column,
                     z: float = 1.96) -> DataFrame:
    """Per-group pass rate with the Wilson score interval's LOWER bound:
    the statistically honest way to rank or gate groups on a boolean
    outcome when group sizes differ wildly — a 3/3 source does NOT
    outrank a 950/1000 one (the plain rate says it does; the Wilson
    lower bound at z=1.96 says 0.44 vs 0.936). The curation use: gate
    sources/domains on their quality-pass rate without tiny sources
    free-riding on noise.

    Null semantics: a NULL ``passed`` value counts in ``n`` but not in
    ``n_pass`` — i.e. "not provably passing" is treated as a failure,
    the conservative reading for a gate (coalesce the predicate first
    for a different policy).

    Scale shape: scan-side predicate + ONE partial+final (group)
    aggregate; the Wilson algebra is a projection over the per-group
    frame. Nothing else moves.
    """
    if z <= 0:
        raise ValueError("wilson_pass_rate: z must be > 0")
    agg = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(passed.cast("long")), F.lit(0))
         .cast("long").alias("n_pass"))
    p = F.col("n_pass") / F.col("n")
    nn = F.col("n").cast("double")
    z2 = F.lit(float(z) * float(z))
    lower = ((p + z2 / (2 * nn)
              - F.lit(float(z)) * F.sqrt(p * (1 - p) / nn
                                         + z2 / (4 * nn * nn)))
             / (1 + z2 / nn))
    return agg.select(
        group, "n", "n_pass",
        F.round(p, 6).alias("pass_rate"),
        F.round(lower, 6).alias("wilson_lower"))


def srm_check(df: DataFrame, variant: str, expected: dict,
              chi2_threshold: float) -> DataFrame:
    """Sample-ratio-mismatch audit: chi-square GOODNESS-OF-FIT of the
    observed per-variant counts against the DECLARED assignment ratios
    — the experiment-health gate that must pass before any A/B result
    (Welch, SPRT) is trusted; a broken splitter/logging path shows up
    here first. Distinct from the graded chi-square INDEPENDENCE test
    (two-way contingency, margins estimated): this is one-way with the
    expected shares given a priori, df = k - 1.

    ``expected`` maps each variant value to its expected share (> 0,
    summing to 1 within 1e-6); ``chi2_threshold`` is the critical value
    for df = k - 1 at the caller's alpha (3.841 for k = 2 at 5% — no
    default, because a k-blind default silently misflags k > 2).
    A variant VALUE in the data that is not in ``expected`` has no
    expected share and raises in-plan (the welch filter pattern); a
    declared variant with zero observations still contributes its
    (0 - E*N)^2 / (E*N) = E*N term via a domain join (the benford
    absent-digit lesson).

    Scale shape: ONE partial+final (variant) aggregate folds the table
    to <= k observed rows; the k-row expected domain joins and every
    share/chi/total window runs over that AGGREGATE frame. Nothing
    else moves.
    """
    # the variant name is interpolated into the domain frame's DDL schema
    # string below AND passes through to the output next to fixed aliases
    # (the kfold collision lesson) — guard both up front
    _require_plain_identifier("srm_check", variant)
    reserved = ("n", "expected_share", "observed_share", "chi_term",
                "chi2_total", "dof", "srm_flag")
    if variant in reserved:
        raise ValueError(
            f"srm_check: variant column {variant!r} collides with an "
            f"output column of this audit {reserved}; alias it first")
    if len(expected) < 2:
        raise ValueError("srm_check: expected must declare >= 2 variants")
    shares = list(expected.values())
    if any(s <= 0 for s in shares):
        raise ValueError("srm_check: expected shares must be > 0")
    if abs(sum(shares) - 1.0) > 1e-6:
        raise ValueError(
            f"srm_check: expected shares must sum to 1, got {sum(shares)}")
    if chi2_threshold <= 0:
        raise ValueError("srm_check: chi2_threshold must be > 0")
    agg = df.groupBy(variant).agg(F.count(F.lit(1)).alias("__obs"))
    domain = df.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in expected.items()],
        schema=f"{variant} {df.schema[variant].dataType.simpleString()}, "
               f"expected_share double")
    # full outer: a declared-but-absent variant keeps its E*N chi term
    # (left side null), an UNDECLARED observed variant arrives with a
    # null expected share and trips the in-plan raise below
    full = (domain.join(agg, variant, "full")
            .select(variant,
                    F.coalesce(F.col("__obs"), F.lit(0)).cast("long")
                     .alias("n"),
                    "expected_share"))
    full = full.filter(F.when(
        F.col("expected_share").isNull(),
        F.raise_error(F.concat(
            F.lit("srm_check: observed variant value not declared in "
                  "expected: "),
            # a NULL variant (broken assignment logging — exactly what an
            # SRM gate exists to catch) must still produce a readable
            # message: concat(NULL) would null the whole diagnostic
            F.coalesce(F.col(variant).cast("string"), F.lit("NULL"))))
    ).otherwise(F.lit(True)))
    whole = Window.orderBy(variant).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    total = F.sum("n").over(whole)
    exp_n = F.col("expected_share") * total
    # degenerate input (zero rows observed anywhere): guard to NULL on
    # both engines instead of 0/0 (the benford convention)
    chi_term = F.when(total > 0,
                      (F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n)
    chi2 = F.sum(chi_term).over(whole)
    return full.select(
        variant, "n",
        F.round("expected_share", 6).alias("expected_share"),
        F.round(F.when(total > 0, F.col("n") / total), 6)
         .alias("observed_share"),
        F.round(chi_term, 6).alias("chi_term"),
        F.round(chi2, 4).alias("chi2_total"),
        F.lit(len(expected) - 1).cast("int").alias("dof"),
        (chi2 > chi2_threshold).alias("srm_flag"))


def sprt_ab(df: DataFrame, ts: str, variant: str, success: Column,
            lift_ratio: float = 1.5, alpha: float = 0.05,
            beta: float = 0.05, bin_ms: int = 3_600_000) -> DataFrame:
    """Wald sequential probability ratio test on an A/B success stream:
    the SEQUENTIAL companion to the one-shot Welch test — it monitors
    the experiment as data arrives and says WHEN the evidence crossed a
    decision boundary, instead of requiring a fixed horizon (peeking at
    a fixed-horizon test inflates false positives; SPRT's boundaries
    are valid at every look by construction).

    Model (the success-stream reduction): under balanced assignment
    (gate with srm_check first), each SUCCESS comes from variant 1 with
    probability 1/2 under H0 (no lift) and q = r / (1 + r) under H1 —
    the alternative where variant 1's success RATE is ``lift_ratio`` r
    times variant 0's (p1 = r * p0; NOT an odds ratio — the two only
    coincide as the baseline rate tends to 0, so calibrate r from a
    rate ratio, not a logistic-regression odds estimate). The
    log-likelihood ratio after each success is LLR += ln(2q) for a
    variant-1 success, ln(2(1-q)) for a variant-0 one; accept H1 when
    LLR >= ln((1-beta)/alpha), accept H0 when LLR <= ln(beta/(1-alpha)).
    The four constants are computed ONCE in Python and inlined as
    double literals on both engines (the pca_power literal-handoff
    convention), so the running sum multiplies bit-identical operands.

    Granularity: decisions are evaluated at ``bin_ms`` boundaries (the
    cusum binning convention) — the crossing is localized to a bin, not
    an event; a within-bin crossing that retreats by bin end is not
    seen, which only DELAYS a decision (the test stays valid: both
    hypotheses' boundary guarantees are per-look, and bins are the
    looks). Returns one row per non-empty bin: (bin_idx, n_succ,
    n_b_succ, llr_bin, llr_running, decision, decision_bin) with the
    corpus-level decision ('accept_h1' / 'accept_h0' / 'continue') and
    first crossing bin repeated per row (the cusum/ecdf summary-column
    convention). Variant values outside {0, 1} raise in-plan (the
    welch filter pattern).

    Scale shape: scan-side success filter + ONE partial+final (bin)
    aggregate -> a frame bounded by the time range over ``bin_ms``; the
    running-LLR, crossing, and first-decision windows all run over that
    <= #bins AGGREGATE frame, never the events.

    Live twin: ``streaming/pipeline.py::sprt_stream``. Its count
    columns are named ``n_succ_total``/``n_b_succ_total`` because they
    are CUMULATIVE, while this operator's ``n_succ``/``n_b_succ`` are
    PER-BIN — the deliberate name split keeps a by-column-name consumer
    from misreading one as the other.
    """
    import math

    _require_plain_identifier("sprt_ab", ts)
    _require_integer_epoch_ts("sprt_ab", df, ts)
    if lift_ratio <= 0 or lift_ratio == 1.0:
        raise ValueError("sprt_ab: lift_ratio must be > 0 and != 1")
    if not (0 < alpha < 1 and 0 < beta < 1 and alpha + beta < 1):
        raise ValueError(
            "sprt_ab: alpha and beta must be in (0, 1) with "
            "alpha + beta < 1")
    if bin_ms < 1:
        raise ValueError("sprt_ab: bin_ms must be >= 1")
    q = lift_ratio / (1.0 + lift_ratio)
    c1 = math.log(2.0 * q)          # per variant-1 success
    c0 = math.log(2.0 * (1.0 - q))  # per variant-0 success
    ln_a = math.log((1.0 - beta) / alpha)   # accept-H1 boundary (> 0)
    ln_b = math.log(beta / (1.0 - alpha))   # accept-H0 boundary (< 0)
    succ = df.filter(success)
    binned = (succ.select(F.expr(f"{ts} DIV {bin_ms}").alias("__bin"),
                          F.col(variant).alias("__v"))
              .groupBy("__bin")
              .agg(F.count(F.lit(1)).alias("n_succ"),
                   F.sum(F.when(F.col("__v") == 1, 1).otherwise(0))
                    .cast("long").alias("n_b_succ"),
                   F.sum(F.when(F.col("__v").isin(0, 1), F.lit(0))
                          .otherwise(F.lit(1))).alias("__bad")))
    binned = binned.filter(F.when(
        F.col("__bad") > 0,
        F.raise_error(F.lit(
            "sprt_ab: variant column must be a binary {0, 1} assignment "
            "— found other/null variant values among successes"))
    ).otherwise(F.lit(True)))
    llr_bin = (F.col("n_b_succ") * F.lit(c1)
               + (F.col("n_succ") - F.col("n_b_succ")) * F.lit(c0))
    ordw = Window.orderBy("__bin")
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = binned.select(
        "__bin", "n_succ", "n_b_succ", llr_bin.alias("__lb"),
        F.sum(llr_bin).over(cum).alias("__run"))
    whole = Window.orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cross = F.when(F.col("__run") >= ln_a, F.lit("accept_h1")).when(
        F.col("__run") <= ln_b, F.lit("accept_h0"))
    # two-stage: first_bin is itself a window result, so the decision
    # lookup must run in a LATER select (nested window calls are
    # rejected by both engines — the r9 DuckDB lesson applies to Spark
    # analysis too); both windows ride the same <= #bins frame
    staged = staged.select(
        "__bin", "n_succ", "n_b_succ", "__lb", "__run",
        cross.alias("__cross"),
        F.min(F.when(cross.isNotNull(), F.col("__bin"))).over(whole)
         .alias("__fb"))
    decision = F.coalesce(
        F.max(F.when(F.col("__bin") == F.col("__fb"), F.col("__cross")))
         .over(whole),
        F.lit("continue"))
    return staged.select(
        F.col("__bin").cast("long").alias("bin_idx"),
        "n_succ", "n_b_succ",
        F.round("__lb", 6).alias("llr_bin"),
        F.round("__run", 6).alias("llr_running"),
        decision.alias("decision"),
        F.col("__fb").cast("long").alias("decision_bin"))


def mann_whitney_u(df: DataFrame, group: str, variant: str,
                   value: str) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test between variant 0 and
    variant 1 of an A/B assignment, computed independently per
    ``group`` — the NONPARAMETRIC complement to ``welch_ttest`` (no
    normality assumption; sensitive to any location shift of the
    distributions, robust to the heavy tails that wreck a t-test on
    revenue-like values). Normal approximation with the textbook TIE
    CORRECTION: z = (U1 - mu) / sigma with mu = n0*n1/2 and
    sigma^2 = n0*n1/12 * ((N+1) - sum(t^3 - t) / (N*(N-1))).

    Rank-function-free by design (the cross-engine parity risk the
    banking review flagged): average ranks are never produced by an
    engine rank() — they are DERIVED arithmetically from a
    (group, value) count aggregate. For a distinct value with t members
    after c others, 2 * avg_rank = 2*c + t + 1 is an INTEGER, so the
    rank sum R1 is accumulated as the integer sum(c1 * (2c + t + 1))
    and halved once at the end — every cross-engine sum is
    integer-exact (no float-associativity drift), and the only double
    math is the final per-group scalar algebra, written identically on
    both engines. (Caveats: the integer tie term t^3 - t overflows
    int64 if a single (group, value) cell exceeds ~2e6 duplicate rows
    — at that point the value column is effectively categorical and a
    rank test is the wrong tool; and the rank-sum accumulator
    sum(c1 * 2*avg_rank) ~ N^2 overflows int64 once a GROUP passes
    ~3e9 observations — sample below that per group. Both paths fail
    LOUDLY on both engines — Spark runs ANSI arithmetic (overflow
    raises), DuckDB errors likewise; neither silently wraps.)

    Null ``value`` rows are dropped before ranking (the welch/rolling
    convention: a null observation is a missing measurement, not a
    rank) — but variant validation sees EVERY input row, including
    null-value ones (welch_ttest strictness: a row with a bad/null
    variant and a null value still trips the raise; the null filter is
    folded into the rank counters, not applied up front — r12 advice).
    Variant values outside {0, 1} raise in-plan (the welch filter
    pattern). Groups where either side is empty, or where every value
    is tied, have sigma = 0: u_stat/mu_u still report, z_stat /
    sigma_u / significant_05 are NULL (no defined test).

    Scale shape: ONE partial+final (group, value) aggregate collapses
    the observations; the rank-prefix window and the per-group fold run
    over that DISTINCT-VALUE frame (a second exchange on the group key
    carries both), never the raw rows. No global sort, no engine rank.

    Live/batch family: completes the experiment stack —
    ``srm_check`` gates the split, ``welch_ttest`` tests means,
    this tests distributions, ``sprt_ab`` monitors sequentially.
    """
    # no generated-SQL interpolation here (pure column API), so no
    # plain-identifier guard — only the output-collision check matters
    reserved = ("n0", "n1", "u_stat", "mu_u", "sigma_u", "z_stat",
                "significant_05")
    if group in reserved:
        raise ValueError(
            f"mann_whitney_u: group column {group!r} collides with an "
            f"output column of this test {reserved}; alias it first")
    # The null-value filter lives INSIDE the rank counters (not a
    # pre-filter): a null-value cell gets __c0 = __c1 = 0, so t = 0 and
    # it contributes nothing to prefix counts, rank sums, or the tie
    # term — while __bad still counts its variant, so validation sees
    # every row (welch_ttest aggregates the unfiltered frame the same
    # way). Same single (group, value) exchange as before.
    obs = F.col(value).isNotNull()
    agg = df.groupBy(group, value).agg(
        F.sum(F.when(obs & (F.col(variant) == 0), 1).otherwise(0))
         .cast("long").alias("__c0"),
        F.sum(F.when(obs & (F.col(variant) == 1), 1).otherwise(0))
         .cast("long").alias("__c1"),
        F.sum(F.when(F.col(variant).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__bad"))
    t = F.col("__c0") + F.col("__c1")
    prior = (Window.partitionBy(group).orderBy(value)
             .rowsBetween(Window.unboundedPreceding, -1))
    cb = F.coalesce(F.sum(t).over(prior), F.lit(0))
    ranked = agg.select(
        group, "__c0", "__c1", "__bad", t.alias("__t"),
        # 2 * average rank of this value's members — an exact integer
        (2 * cb + t + 1).alias("__rank2"))
    g = ranked.groupBy(group).agg(
        F.sum("__c0").alias("n0"),
        F.sum("__c1").alias("n1"),
        F.sum(F.col("__c1") * F.col("__rank2")).alias("__r1x2"),
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t"))
         .alias("__ties"),
        F.sum("__bad").alias("__badsum"))
    g = g.filter(F.when(
        F.col("__badsum") > 0,
        F.raise_error(F.lit(
            "mann_whitney_u: variant column must be a binary {0, 1} "
            "assignment — found other/null variant values"))
    ).otherwise(F.lit(True)))
    # a group whose every value is null has zero observations after
    # validation — it vanishes (the pre-fix output contract), it does
    # not report a degenerate 0/0 test
    g = g.filter((F.col("n0") + F.col("n1")) > 0)
    n0d = F.col("n0").cast("double")
    nd = (F.col("n0") + F.col("n1")).cast("double")
    u1 = (F.col("__r1x2") / F.lit(2.0)
          - F.col("n1") * (F.col("n1") + F.lit(1.0)) / F.lit(2.0))
    mu = n0d * F.col("n1") / F.lit(2.0)
    sigma2 = F.when(
        (F.col("n0") + F.col("n1")) > 1,
        n0d * F.col("n1") / F.lit(12.0)
        * ((nd + F.lit(1.0))
           - F.col("__ties") / (nd * (nd - F.lit(1.0)))))
    z = F.when(sigma2 > 0, (u1 - mu) / F.sqrt(sigma2))
    return g.select(
        group, "n0", "n1",
        F.round(u1, 2).alias("u_stat"),
        F.round(mu, 2).alias("mu_u"),
        F.when(sigma2 > 0, F.round(F.sqrt(sigma2), 4)).alias("sigma_u"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_05"))


#: Upper-tail 5% chi-square critical values for df 1..10 (textbook
#: table) — inlined as identical literals in the DuckDB oracle (the
#: pca_power literal-handoff convention), so both engines compare the
#: same constants. Beyond df 10 the flag is NULL (report H and let the
#: consumer bring their own quantile).
_CHI2_CRIT_05 = (3.841, 5.991, 7.815, 9.488, 11.070,
                 12.592, 14.067, 15.507, 16.919, 18.307)


def _chi2_crit_05(dof: Column) -> Column:
    """The 5% critical value for ``dof`` as a when-chain over the
    inlined table (NULL beyond df 10) — shared by every chi-square-
    flagged test so the operators and their oracles cannot drift on
    the constants."""
    crit = F.when(dof == 1, F.lit(_CHI2_CRIT_05[0]))
    for i, cv in enumerate(_CHI2_CRIT_05[1:], start=2):
        crit = crit.when(dof == i, F.lit(cv))
    return crit


def kruskal_wallis(df: DataFrame, group: str, clazz: str,
                   value: str) -> DataFrame:
    """Kruskal-Wallis H test of ``value`` across k classes (``clazz``),
    computed independently per ``group`` — the k-sample generalization
    of ``mann_whitney_u`` (H0: all k class distributions are equal;
    normal-theory-free, robust to heavy tails). Tie-corrected textbook
    form: H = 12 / (N (N+1)) * sum_g R_g^2 / n_g - 3 (N+1), corrected
    H' = H / (1 - sum(t^3 - t) / (N^3 - N)); H' ~ chi-square(k - 1)
    under H0, flagged against the inlined 5% critical value for
    df 1..10 (NULL flag beyond — bring your own quantile).

    RANK-FUNCTION-FREE by the same avg-rank identity as
    ``mann_whitney_u``: for a distinct value whose peers (across ALL
    classes) total t after c smaller observations, 2 * avg_rank =
    2 c + t + 1 is an INTEGER derived from a (group, class, value)
    count aggregate — cum_le - t gives c via two RANGE-frame window
    sums over the same exchange, so the per-class rank sums and the
    tie term accumulate as integer-exact sums on both engines; no
    engine rank() is involved. The cross-class fold of the (double)
    R_g^2 / n_g terms is an ORDERED running window sum ascending by
    class (one deterministic addition order on both engines — the
    sprt/nelson running-sum precedent, NOT an unordered aggregate
    whose float summation order the engines could disagree on).

    Class validation is welch/mann-strict and sees EVERY row: a NULL
    class raises in-plan even when the row's value is also null (any
    non-null class value is legal — k is discovered from the data).
    Null ``value`` rows drop from the ranks only. Classes with zero
    observations vanish; groups with zero observations vanish; a
    single-class group reports H = 0 with dof = 0 and NULL flag; an
    all-tied group has correction C = 0: h_stat reports, h_corrected /
    significant_05 are NULL.

    Overflow bounds (documented, loud on both engines — Spark ANSI
    raises, DuckDB errors): the int64 tie term t^3 - t dies if one
    (group, value) cell exceeds ~2e6 duplicates (the column is
    categorical at that point — wrong tool); the integer rank-sum
    accumulator ~ N^2 dies once a group passes ~3e9 observations
    (sample below that); the N^3 in the correction is computed in
    DOUBLE on both engines, so it does not bound N.

    Scale shape (mann_whitney's exact two-exchange shape): ONE
    (group, class, value) partial+final aggregate collapses the
    observations; the rank-prefix RANGE windows, the per-class fold,
    and the ordered cross-class fold all ride ONE further exchange
    keyed on the group (hash-partitioning by group satisfies every
    downstream (group, class) clustering) over DISTINCT-VALUE /
    per-class AGGREGATE frames. No global sort, no join, no engine
    rank().

    Family: the k-sample rung of the experiment stack — srm_check
    gates the split, welch_ttest tests two means, mann_whitney_u tests
    two distributions, THIS tests k distributions, sprt_ab monitors
    sequentially. For k = 2, H' equals the square of mann_whitney_u's
    tie-corrected z (pinned by test).
    """
    reserved = ("k_classes", "n_total", "h_stat", "h_corrected", "dof",
                "significant_05")
    for c, what in ((group, "group"), (clazz, "class")):
        if c in reserved:
            raise ValueError(
                f"kruskal_wallis: {what} column {c!r} collides with an "
                f"output column of this test {reserved}; alias it first")
    obs = F.col(value).isNotNull()
    # null-value rows drop from the rank counters INSIDE the aggregate
    # (never a pre-filter) so class validation sees every row — the
    # mann_whitney r12-advice convention, applied from birth
    agg = df.groupBy(group, clazz, value).agg(
        F.sum(F.when(obs, 1).otherwise(0)).cast("long").alias("__cnt"),
        F.sum(F.when(F.col(clazz).isNull(), 1).otherwise(0))
         .alias("__bad"))
    wg = Window.partitionBy(group).orderBy(value)
    le = wg.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    peers = wg.rangeBetween(Window.currentRow, Window.currentRow)
    # peers = every class's cell tied at this value; cum_le = all
    # observations at or below it. Both are RANGE frames on the SAME
    # group-keyed exchange; null-value cells carry __cnt = 0 and
    # contribute nothing anywhere (and Spark-vs-DuckDB null ordering
    # is moot for zero terms).
    t = F.sum("__cnt").over(peers)
    cum_le = F.sum("__cnt").over(le)
    rank2 = 2 * cum_le - t + 1  # == 2*prefix + t + 1, an exact integer
    # the tie term belongs to the VALUE, not the (class, value) cell:
    # mark it on the minimum class among the peers (min is not a rank
    # function and both engines agree on it)
    tie = F.when(F.col(clazz) == F.min(clazz).over(peers),
                 t * t * t - t).otherwise(F.lit(0))
    ranked = agg.select(group, clazz, "__cnt", "__bad",
                        rank2.alias("__rank2"), tie.alias("__tie"))
    per_class = ranked.groupBy(group, clazz).agg(
        F.sum("__cnt").alias("__n"),
        F.sum(F.col("__cnt") * F.col("__rank2")).alias("__r2x2"),
        F.sum("__tie").alias("__ties"),
        F.sum("__bad").alias("__badsum"))
    # cross-class folds as windows over the <= k-row per-class frame:
    # integer sums are order-free; the ONE double sum (R_g^2 / n_g)
    # runs as an ordered cumulative sum ascending by class and is read
    # off at the last class row
    wcls = Window.partitionBy(group).orderBy(clazz)
    whole = wcls.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cum = wcls.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    term = F.when(
        F.col("__n") > 0,
        (F.col("__r2x2") / F.lit(2.0)) * (F.col("__r2x2") / F.lit(2.0))
        / F.col("__n")).otherwise(F.lit(0.0))
    folded = per_class.select(
        group, clazz,
        F.sum(F.when(F.col("__n") > 0, 1).otherwise(0)).over(whole)
         .cast("int").alias("k_classes"),
        F.sum("__n").over(whole).alias("n_total"),
        F.sum(term).over(cum).alias("__sumr_run"),
        F.sum("__ties").over(whole).alias("__tiesum"),
        F.sum("__badsum").over(whole).alias("__badall"),
        (F.col(clazz) == F.max(clazz).over(whole)).alias("__is_last"))
    g = folded.filter(F.when(
        F.col("__badall") > 0,
        F.raise_error(F.lit(
            "kruskal_wallis: class column must be non-null on every "
            "row — found null class values"))
    ).otherwise(F.col("__is_last")))
    g = g.filter(F.col("n_total") > 0)
    nd = F.col("n_total").cast("double")
    h = (F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("__sumr_run")
         - F.lit(3.0) * (nd + F.lit(1.0)))
    corr = F.when(
        F.col("n_total") > 1,
        F.lit(1.0) - F.col("__tiesum") / (nd * nd * nd - nd))
    h_corr = F.when(corr > 0, h / corr)
    dof = (F.col("k_classes") - 1).cast("int")
    crit = _chi2_crit_05(dof)
    return g.select(
        group, "k_classes", "n_total",
        F.round(h, 4).alias("h_stat"),
        F.round(h_corr, 4).alias("h_corrected"),
        dof.alias("dof"),
        (h_corr > crit).alias("significant_05"))


def logrank_test(df: DataFrame, duration: str, observed: str,
                 grp: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test between the survival experiences of
    two groups over per-subject (``duration``, ``observed``, ``grp``)
    rows — the hypothesis-test companion to ``kaplan_meier`` /
    ``nelson_aalen`` (H0: the two hazard functions are equal). At each
    distinct duration: expected group-1 events e1 = d * n1 / n and
    hypergeometric variance v = d * (n1/n) * (n0/n) * (n-d)/(n-1) from
    the pooled risk sets; the statistic is the running
    sum(d1 - e1) / sqrt(sum v), emitted PER DURATION as a monotone
    evidence trace (the kaplan/nelson curve-output convention — the
    final row carries the test verdict; consumers read max(duration)).

    Group validation is welch/mann-strict: values outside {0, 1} raise
    in-plan on every row. ``observed`` is equally strict (r13 advice):
    a null or non-{0, 1} observed value would silently skew the event
    counts (sums skip nulls; observed = 5 would count 5 events) while
    the subject stays in the risk set, so it raises in-plan instead.
    Null durations also raise in-plan (r13 advice): Spark's
    Window.orderBy sorts NULLS FIRST while a SQL oracle's ORDER BY
    sorts NULLS LAST, so a null-duration row would shift every risk
    set differently per engine — there is no principled place on the
    time axis for an unknown duration anyway. Durations with no events
    still emit rows (risk sets move; their e1/v terms are 0). n = 1
    rows contribute v = 0 (the n - 1 denominator guard).

    Cross-engine float discipline: every accumulation that feeds the
    statistic is either an integer window sum (risk sets, event
    counts) or an ORDERED cumulative double sum ascending by duration
    (one deterministic addition order on both engines — the
    nelson_aalen precedent); the per-row e1/v algebra is written with
    identical operand order in both engines, all divisions go double
    on the first step (d * n1 * n0 * (n - d) as integers would
    overflow int64 near n ~ 55k — the factors are interleaved with
    the divisions instead).

    Scale shape (kaplan/nelson's exact shape): ONE partial+final
    (duration) aggregate collapses the subjects; risk-set and running
    windows ride a SinglePartition exchange of the <= distinct-
    durations AGGREGATE frame.

    Family: completes the survival stack — kaplan_meier estimates S,
    nelson_aalen estimates H, THIS tests S_a vs S_b.
    """
    reserved = ("n_risk0", "n_risk1", "n_event0", "n_event1",
                "expected1", "o_minus_e", "var_cum", "z_stat",
                "significant_05")
    if duration in reserved:
        raise ValueError(
            f"logrank_test: duration column {duration!r} collides with "
            f"an output column of this test {reserved}; alias it first")
    o = F.col(observed).cast("long")
    per_t = df.groupBy(duration).agg(
        F.sum(F.when(F.col(grp) == 0, o).otherwise(0)).alias("__d0"),
        F.sum(F.when(F.col(grp) == 1, o).otherwise(0)).alias("__d1"),
        F.sum(F.when(F.col(grp) == 0, 1).otherwise(0))
         .cast("long").alias("__a0"),
        F.sum(F.when(F.col(grp) == 1, 1).otherwise(0))
         .cast("long").alias("__a1"),
        F.sum(F.when(F.col(grp).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__bad"),
        F.sum(F.when(F.col(observed).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__badobs"))
    per_t = per_t.filter(
        F.when(F.col("__bad") > 0, F.raise_error(F.lit(
            "logrank_test: group column must be a binary {0, 1} "
            "assignment — found other/null group values")))
         .when(F.col("__badobs") > 0, F.raise_error(F.lit(
            "logrank_test: observed column must be a 0/1 event "
            "indicator — found other/null observed values")))
         .when(F.isnull(duration), F.raise_error(F.lit(
            "logrank_test: duration column must be non-null — null "
            "durations sort NULLS FIRST on Spark windows but NULLS "
            "LAST in SQL oracles, shifting every risk set")))
         .otherwise(F.lit(True)))
    ordw = Window.orderBy(duration)
    prior = ordw.rowsBetween(Window.unboundedPreceding, -1)
    whole = ordw.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n0 = (F.sum("__a0").over(whole)
          - F.coalesce(F.sum("__a0").over(prior), F.lit(0)))
    n1 = (F.sum("__a1").over(whole)
          - F.coalesce(F.sum("__a1").over(prior), F.lit(0)))
    staged = per_t.select(
        duration, "__d0", "__d1",
        n0.alias("__n0"), n1.alias("__n1"))
    d = F.col("__d0") + F.col("__d1")
    n = F.col("__n0") + F.col("__n1")
    dd = d.cast("double")
    # identical operand order in the oracle: CAST(d) * n1 / n and
    # CAST(d) * n1 / n * n0 / n * (n - d) / (n - 1)
    e1 = dd * F.col("__n1") / n
    v = F.when(n > 1,
               dd * F.col("__n1") / n * F.col("__n0") / n
               * (n - d) / (n - F.lit(1))).otherwise(F.lit(0.0))
    scored = staged.select(
        duration, "__n0", "__n1", "__d0", "__d1",
        e1.alias("__e1"), v.alias("__v"))
    ome = F.sum(F.col("__d1") - F.col("__e1")).over(cum)
    var = F.sum("__v").over(cum)
    z = F.when(var > 0, ome / F.sqrt(var))
    return scored.select(
        duration,
        F.col("__n0").alias("n_risk0"),
        F.col("__n1").alias("n_risk1"),
        F.col("__d0").alias("n_event0"),
        F.col("__d1").alias("n_event1"),
        F.round("__e1", 6).alias("expected1"),
        F.round(ome, 6).alias("o_minus_e"),
        F.round(var, 6).alias("var_cum"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_05"))


def cox_score_test(df: DataFrame, duration: str, observed: str,
                   covariate: str) -> DataFrame:
    """Cox proportional-hazards SCORE test (beta = 0) of a single
    INTEGRAL covariate over per-subject (``duration``, ``observed``,
    ``covariate``) rows — the continuous-covariate generalization of
    ``logrank_test`` (H0: the covariate has no effect on the hazard).
    At each distinct duration with d events: the Breslow score
    contribution is sx - d * S1/S0 (sx = covariate sum over the
    events; S0/S1 = risk-set count / covariate sum) and the
    tie-corrected information contribution is
    d * (S0-d)/(S0-1) * (S2/S0 - (S1/S0)^2); the statistic is the
    running sum(u) / sqrt(sum v), emitted PER DURATION as a monotone
    evidence trace (the kaplan/nelson/logrank curve-output convention
    — the final row carries the verdict). For a binary 0/1 covariate
    every per-duration term reduces ALGEBRAICALLY to logrank_test's
    (S1 = n1, S2 = n1, sx = d1), so this IS the log-rank test as a
    score test — pinned end-to-end by test.

    The covariate contract is INTEGRAL (long-castable, non-null,
    no fractional part) by design: the risk-set sums S1 = sum(x) and
    S2 = sum(x^2) then accumulate as integer-exact window sums on
    both engines — the same cross-engine discipline that makes
    mann_whitney/kruskal rank-free. A null or fractional covariate
    raises in-plan (a null x would silently vanish from S1/S2 while
    the subject stays in S0 — the r13 logrank-observed bug class);
    scale or bin a continuous covariate to integers first (the test
    is invariant to positive affine maps of x only up to sign, so
    document the scaling at the call site). ``observed`` and
    ``duration`` follow logrank_test's strict contract: non-{0, 1}
    observed and null durations raise in-plan.

    Cross-engine float discipline: risk sets and covariate sums are
    integer window sums; u/v accumulate as ORDERED cumulative double
    sums ascending by duration; the per-row algebra interleaves
    multiplications with divisions (d * (S0-d) / (S0-1) * (...)) with
    identical operand order in both engines, and S1/S0, S2/S0 go
    double on the first step.

    Overflow bounds (documented, loud on both engines — Spark ANSI
    raises, DuckDB errors): S2 = sum(x^2) over the full cohort dies
    at ~9.2e18, i.e. |x| <= ~3e6 with 1e6 subjects or |x| <= ~1e5
    with 1e9 subjects — bin wider or clip at the call site above
    that; sx/S1 bounds are the looser |x| * n < 9.2e18.

    Scale shape (the survival stack's exact shape): ONE partial+final
    (duration) aggregate collapses the subjects; risk-set and running
    windows ride a SinglePartition exchange of the <= distinct-
    durations AGGREGATE frame.

    Family: the regression rung of the survival stack — kaplan_meier
    estimates S, nelson_aalen estimates H, logrank_test compares two
    arms, THIS scores a covariate's effect.
    """
    reserved = ("n_risk", "n_events", "x_risk_mean", "score_cum",
                "info_cum", "z_stat", "significant_05")
    if duration in reserved:
        raise ValueError(
            f"cox_score_test: duration column {duration!r} collides "
            f"with an output column of this test {reserved}; alias it "
            "first")
    o = F.col(observed).cast("long")
    x = F.col(covariate).cast("long")
    frac = (F.col(covariate).isNull()
            | (F.col(covariate).cast("double") != x.cast("double")))
    per_t = df.groupBy(duration).agg(
        F.sum(o).alias("__d"),
        F.sum(F.when(o == 1, x).otherwise(F.lit(0))).alias("__sx"),
        F.count(F.lit(1)).cast("long").alias("__a"),
        F.sum(x).alias("__ax"),
        F.sum(x * x).alias("__ax2"),
        F.sum(F.when(F.col(observed).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__badobs"),
        F.sum(F.when(frac, F.lit(1)).otherwise(F.lit(0)))
         .alias("__badx"))
    per_t = per_t.filter(
        F.when(F.col("__badobs") > 0, F.raise_error(F.lit(
            "cox_score_test: observed column must be a 0/1 event "
            "indicator — found other/null observed values")))
         .when(F.col("__badx") > 0, F.raise_error(F.lit(
            "cox_score_test: covariate column must be integral and "
            "non-null — a null x silently vanishes from S1/S2 while "
            "the subject stays in the risk set; bin/scale continuous "
            "covariates to integers at the call site")))
         .when(F.isnull(duration), F.raise_error(F.lit(
            "cox_score_test: duration column must be non-null — null "
            "durations sort NULLS FIRST on Spark windows but NULLS "
            "LAST in SQL oracles, shifting every risk set")))
         .otherwise(F.lit(True)))
    ordw = Window.orderBy(duration)
    prior = ordw.rowsBetween(Window.unboundedPreceding, -1)
    whole = ordw.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def _risk(col: str):
        return (F.sum(col).over(whole)
                - F.coalesce(F.sum(col).over(prior), F.lit(0)))

    staged = per_t.select(
        duration, "__d", "__sx",
        _risk("__a").alias("__s0"),
        _risk("__ax").alias("__s1"),
        _risk("__ax2").alias("__s2"))
    dd = F.col("__d").cast("double")
    s0 = F.col("__s0")
    # identical operand order in the oracle: CAST(s1 AS DOUBLE) / s0
    # twice for xbar, and CAST(d) * (s0 - d) / (s0 - 1) * (...)
    xb = F.col("__s1").cast("double") / s0
    u = F.col("__sx") - dd * F.col("__s1") / s0
    v = F.when(s0 > 1,
               dd * (s0 - F.col("__d")) / (s0 - F.lit(1))
               * (F.col("__s2").cast("double") / s0 - xb * xb)
               ).otherwise(F.lit(0.0))
    scored = staged.select(
        duration, "__s0", "__d",
        xb.alias("__xb"), u.alias("__u"), v.alias("__v"))
    score = F.sum("__u").over(cum)
    info = F.sum("__v").over(cum)
    z = F.when(info > 0, score / F.sqrt(info))
    return scored.select(
        duration,
        F.col("__s0").alias("n_risk"),
        F.col("__d").alias("n_events"),
        F.round("__xb", 6).alias("x_risk_mean"),
        F.round(score, 6).alias("score_cum"),
        F.round(info, 6).alias("info_cum"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_05"))


def friedman_test(df: DataFrame, block: str, treatment: str,
                  value: str) -> DataFrame:
    """Friedman blocked k-sample rank test over a COMPLETE b x k grid
    of (``block``, ``treatment``, ``value``) cells — the
    within-block complement of ``kruskal_wallis`` (H0: all k
    treatments share one distribution, blocks absorb the nuisance
    variation). Values are midranked WITHIN each block across the k
    treatments; the tie-corrected statistic is Conover's T1 =
    (k-1) * sum_j (R_j - b(k+1)/2)^2 / (A2 - C) with A2 = sum of all
    squared midranks and C = b k (k+1)^2 / 4, chi-square(k-1) under
    H0 (equals the classic 12/(bk(k+1)) sum R_j^2 - 3b(k+1) when no
    ties). Emits one row per treatment (rank sums are the evidence;
    the verdict columns repeat — the kruskal per-group convention).

    FULLY INTEGER-EXACT cross-engine, one step beyond kruskal: with
    the rank-free identity 2 * midrank = 2 cum_le - t + 1 (an integer
    from RANGE-frame window sums — no engine rank()), both folds are
    integers: the numerator sum of (2 R_j - b(k+1))^2 and the
    denominator 4(A2 - C) = sum((2r)^2) - b k (k+1)^2. No float
    accumulates ANYWHERE — the single double division happens at the
    end, so no ordered-fold discipline is even needed.

    Grid validation is strict and in-plan: a duplicate
    (block, treatment) cell, a null block/treatment/value, or an
    INCOMPLETE block (any block missing any treatment — checked as
    per-block cell count == k AND per-treatment block count == b,
    which together with dedup implies the full grid) raises — an
    unbalanced design silently biases rank sums toward the treatments
    present in easy blocks. Pre-aggregate multiple observations per
    cell at the call site (mean/sum — document which).

    Overflow bounds (documented, loud on both engines): the integer
    numerator term (2 R_j - b(k+1))^2 <= (b(k-1))^2 summed over k
    dies near b^2 k^3 ~ 9.2e18 — i.e. b * k^1.5 <= ~3e9, far beyond
    any real blocked design.

    Significance flags against the inlined chi-square 5% critical
    values for df 1..10 (NULL beyond); an all-tied grid (A2 = C) has
    zero rank variance: t1_stat / significant_05 are NULL.

    Scale shape: ONE partial+final (block, treatment) aggregate
    collapses the observations (map-side combine — the only
    full-data shuffle moves pre-combined cells, and callers that
    pre-aggregate make it a no-op re-group); the within-block RANGE
    windows ride a block-keyed exchange and the per-treatment fold a
    treatment-keyed exchange, both over the <= b*k-row CELL frame;
    the final fold is a SinglePartition window over the <= k-row
    per-treatment frame (the logrank aggregate-frame convention).

    Family: the blocked rung of the experiment stack — kruskal tests
    k free-standing samples, THIS tests k treatments when a known
    nuisance factor (day-of-week, shard, site) would otherwise
    swamp the signal.
    """
    reserved = ("b_blocks", "k_treatments", "rank_sum", "mean_rank",
                "t1_stat", "dof", "significant_05")
    for c, what in ((block, "block"), (treatment, "treatment")):
        if c in reserved:
            raise ValueError(
                f"friedman_test: {what} column {c!r} collides with an "
                f"output column of this test {reserved}; alias it "
                "first")
    cells = df.groupBy(block, treatment).agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.max(value).alias("__v"),
        F.sum(F.when(F.col(value).isNull()
                     | F.isnull(block) | F.isnull(treatment),
                     F.lit(1)).otherwise(F.lit(0))).alias("__badnull"))
    # Null keys are the more fundamental violation (they break the
    # within-block ordering itself), so that diagnostic outranks the
    # duplicate-cell one when a cell violates both (the r16
    # page_trend_test advice class, applied family-wide).
    cells = cells.filter(
        F.when(F.col("__badnull") > 0, F.raise_error(F.lit(
            "friedman_test: block, treatment and value must be "
            "non-null on every row")))
         .when(F.col("__c") > 1, F.raise_error(F.lit(
            "friedman_test: duplicate (block, treatment) cell — "
            "pre-aggregate multiple observations per cell at the "
            "call site")))
         .otherwise(F.lit(True)))
    wb = Window.partitionBy(block).orderBy("__v")
    le = wb.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    peers = wb.rangeBetween(Window.currentRow, Window.currentRow)
    bwhole = (Window.partitionBy(block)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    t = F.count(F.lit(1)).over(peers)
    cum_le = F.count(F.lit(1)).over(le)
    ranked = cells.select(
        block, treatment,
        (2 * cum_le - t + 1).alias("__rank2"),  # 2 * midrank, integer
        F.count(F.lit(1)).over(bwhole).alias("__cells_in_block"))
    per_trt = ranked.groupBy(treatment).agg(
        F.count(F.lit(1)).cast("long").alias("__b"),
        F.sum("__rank2").cast("long").alias("__r2"),
        F.sum(F.col("__rank2") * F.col("__rank2")).cast("long")
         .alias("__r2sq"),
        F.min("__cells_in_block").alias("__minc"),
        F.max("__cells_in_block").alias("__maxc"))
    wt = Window.orderBy(treatment)
    whole = wt.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    k = F.count(F.lit(1)).over(whole).cast("long")
    b = F.max("__b").over(whole)
    complete = ((F.min("__b").over(whole) == b)
                & (F.min("__minc").over(whole) == k)
                & (F.max("__maxc").over(whole) == k))
    # b/k/complete materialize FIRST (a window result cannot nest
    # inside another window function); the num/den folds then window
    # over the same <= k-row SinglePartition frame
    staged = per_trt.select(
        treatment, "__r2", "__r2sq",
        b.alias("__bb"), k.alias("__kk"),
        complete.alias("__complete"))
    # numerator/denominator folds: INTEGER sums, order-free on both
    # engines (see docstring) — b(k+1) is the all-treatment-equal
    # rank-sum baseline 2 * b(k+1)/2
    dev = F.col("__r2") - F.col("__bb") * (F.col("__kk") + 1)
    num = F.sum(dev * dev).over(whole)
    den = (F.sum("__r2sq").over(whole)
           - F.col("__bb") * F.col("__kk") * (F.col("__kk") + 1)
             * (F.col("__kk") + 1))
    folded = staged.select(
        treatment, "__r2", F.col("__bb").alias("b_blocks"),
        F.col("__kk").cast("int").alias("k_treatments"),
        "__complete",
        num.alias("__num"), den.alias("__den"))
    folded = folded.filter(F.when(
        ~F.col("__complete"),
        F.raise_error(F.lit(
            "friedman_test: incomplete design — every block must "
            "contain every treatment exactly once")))
    .otherwise(F.lit(True)))
    t1 = F.when(
        F.col("__den") > 0,
        (F.col("k_treatments") - 1) * F.col("__num").cast("double")
        / F.col("__den"))
    dof = (F.col("k_treatments") - 1).cast("int")
    crit = _chi2_crit_05(dof)
    return folded.select(
        treatment, "b_blocks", "k_treatments",
        (F.col("__r2") / F.lit(2.0)).alias("rank_sum"),
        F.round(F.col("__r2") / F.lit(2.0) / F.col("b_blocks"), 6)
         .alias("mean_rank"),
        F.round(t1, 4).alias("t1_stat"),
        dof.alias("dof"),
        (t1 > crit).alias("significant_05"))


def stratified_logrank(df: DataFrame, duration: str, observed: str,
                       grp: str, stratum: str) -> DataFrame:
    """Stratified log-rank test between two groups' survival curves,
    controlling a confounder: ``logrank_test``'s machinery with the
    ``stratum`` key added to every risk-set window (risk sets per
    (stratum, duration) — subjects are only ever compared to others
    in their own stratum), then the final O-E / V running sums fold
    ACROSS strata as ONE ordered cumulative sum ascending by
    (stratum, duration), read off at the last row (the kruskal
    cross-class fold shape). H0: the two hazard functions are equal
    within every stratum; the confounder's own effect on the hazard
    cancels out of the statistic.

    Emits the per-(stratum, duration) trace (the survival stack's
    curve-output convention, per stratum); ``o_minus_e`` / ``var_cum``
    / ``z_stat`` are the CROSS-strata running sums in (stratum,
    duration) order, so the final row carries the verdict — consumers
    read max(stratum, duration). With ONE stratum every output column
    except the stratum equals ``logrank_test`` verbatim (pinned
    end-to-end by test).

    Validation is logrank-strict in-plan, plus the stratum: group
    outside {0, 1}, observed outside {0, 1} (incl. null), null
    durations AND null strata all raise — a null stratum has no
    principled risk set, and Spark windows order NULLS FIRST vs SQL
    oracles NULLS LAST, so it would also shift the cross-strata fold
    differently per engine.

    Cross-engine float discipline (logrank_test's, unchanged): risk
    sets and event counts are integer window sums; o_minus_e/var_cum
    accumulate as ORDERED cumulative double sums ascending by
    (stratum, duration) — one deterministic addition order on both
    engines; the per-row e1/v algebra interleaves multiplications
    with divisions (d * n1 / n * n0 / n * (n-d)/(n-1)) so no integer
    product overflows int64 near n ~ 55k, identical operand order in
    both engines.

    Scale shape: ONE partial+final (stratum, duration) aggregate
    collapses the subjects; risk-set windows ride a stratum-keyed
    exchange over the <= distinct-(stratum, duration) AGGREGATE
    frame; the cross-strata fold is a SinglePartition window over
    that same aggregate frame (correct there: the frame is
    aggregate-sized, not data-sized — the logrank convention).

    Family: the confounder-controlled rung of the survival stack —
    kaplan estimates S, nelson estimates H, logrank compares two
    arms, cox scores a covariate, THIS compares two arms when a
    known nuisance factor (site, cohort, device class) would
    otherwise confound the comparison.
    """
    reserved = ("n_risk0", "n_risk1", "n_event0", "n_event1",
                "expected1", "o_minus_e", "var_cum", "z_stat",
                "significant_05")
    for c, what in ((duration, "duration"), (stratum, "stratum")):
        if c in reserved:
            raise ValueError(
                f"stratified_logrank: {what} column {c!r} collides "
                f"with an output column of this test {reserved}; "
                "alias it first")
    o = F.col(observed).cast("long")
    per_t = df.groupBy(stratum, duration).agg(
        F.sum(F.when(F.col(grp) == 0, o).otherwise(0)).alias("__d0"),
        F.sum(F.when(F.col(grp) == 1, o).otherwise(0)).alias("__d1"),
        F.sum(F.when(F.col(grp) == 0, 1).otherwise(0))
         .cast("long").alias("__a0"),
        F.sum(F.when(F.col(grp) == 1, 1).otherwise(0))
         .cast("long").alias("__a1"),
        F.sum(F.when(F.col(grp).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__bad"),
        F.sum(F.when(F.col(observed).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__badobs"))
    per_t = per_t.filter(
        F.when(F.col("__bad") > 0, F.raise_error(F.lit(
            "stratified_logrank: group column must be a binary {0, 1} "
            "assignment — found other/null group values")))
         .when(F.col("__badobs") > 0, F.raise_error(F.lit(
            "stratified_logrank: observed column must be a 0/1 event "
            "indicator — found other/null observed values")))
         .when(F.isnull(duration), F.raise_error(F.lit(
            "stratified_logrank: duration column must be non-null — "
            "null durations sort NULLS FIRST on Spark windows but "
            "NULLS LAST in SQL oracles, shifting every risk set")))
         .when(F.isnull(stratum), F.raise_error(F.lit(
            "stratified_logrank: stratum column must be non-null — a "
            "null stratum has no risk set, and null order keys sort "
            "differently per engine in the cross-strata fold")))
         .otherwise(F.lit(True)))
    strw = Window.partitionBy(stratum).orderBy(duration)
    prior = strw.rowsBetween(Window.unboundedPreceding, -1)
    swhole = strw.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    n0 = (F.sum("__a0").over(swhole)
          - F.coalesce(F.sum("__a0").over(prior), F.lit(0)))
    n1 = (F.sum("__a1").over(swhole)
          - F.coalesce(F.sum("__a1").over(prior), F.lit(0)))
    staged = per_t.select(
        stratum, duration, "__d0", "__d1",
        n0.alias("__n0"), n1.alias("__n1"))
    d = F.col("__d0") + F.col("__d1")
    n = F.col("__n0") + F.col("__n1")
    dd = d.cast("double")
    # identical operand order in the oracle: CAST(d) * n1 / n and
    # CAST(d) * n1 / n * n0 / n * (n - d) / (n - 1)
    e1 = dd * F.col("__n1") / n
    v = F.when(n > 1,
               dd * F.col("__n1") / n * F.col("__n0") / n
               * (n - d) / (n - F.lit(1))).otherwise(F.lit(0.0))
    scored = staged.select(
        stratum, duration, "__n0", "__n1", "__d0", "__d1",
        e1.alias("__e1"), v.alias("__v"))
    cum = (Window.orderBy(stratum, duration)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ome = F.sum(F.col("__d1") - F.col("__e1")).over(cum)
    var = F.sum("__v").over(cum)
    z = F.when(var > 0, ome / F.sqrt(var))
    return scored.select(
        stratum, duration,
        F.col("__n0").alias("n_risk0"),
        F.col("__n1").alias("n_risk1"),
        F.col("__d0").alias("n_event0"),
        F.col("__d1").alias("n_event1"),
        F.round("__e1", 6).alias("expected1"),
        F.round(ome, 6).alias("o_minus_e"),
        F.round(var, 6).alias("var_cum"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_05"))


def page_trend_test(df: DataFrame, block: str, treatment: str,
                    value: str) -> DataFrame:
    """Page's trend test for an ORDERED alternative over a COMPLETE
    b x k grid of (``block``, ``treatment``, ``value``) cells — the
    monotone-alternative companion to ``friedman_test`` (H0: all k
    treatments share one distribution within blocks; H1: the
    treatment medians are MONOTONE in the treatment order — strictly
    more powerful than Friedman when the alternative really is
    ordered). L = sum_j j * R_j with j the treatment's 1-based ordinal
    in ascending treatment order and R_j its within-block midrank sum;
    z = (L - b k (k+1)^2 / 4) / sqrt(b k^2 (k+1)^2 (k-1) / 144).

    The treatment contract is INTEGRAL + non-null (raises in-plan):
    the treatment VALUE defines the trend order, so an unordered
    label (event types, names) has no defensible j — derive an
    ordered bucket (hour-of-day band, size class, dose level) at the
    call site. The ordinal j is computed RANK-FREE as a RANGE-frame
    count of treatments at-or-below (treatments are distinct after
    the grid dedup, so the count IS the position — the kruskal
    cum_le trick on the <= k-row frame, no engine rank()).

    INTEGER-EXACT accumulation (the friedman discipline): with
    2 * midrank = 2 cum_le - t + 1, the fold keeps 2L = sum_j
    j * (2 R_j) and centers as 4(L - E[L]) = 2 * (2L) - b k (k+1)^2
    — all integers (k(k+1)^2 is even, so b k (k+1)^2 = 4 E[L] is
    exact); the single double division is the final
    z = 4(L - E[L]) / sqrt(16 Var) with 16 Var = b k^2 (k+1)^2
    (k-1) / 9. Ties get midranks in L; the variance is the classical
    no-ties formula (the standard Page approximation — with heavy
    ties prefer friedman_test, whose denominator is tie-corrected).

    Grid validation is friedman-strict in-plan: duplicate
    (block, treatment) cells, null block/treatment/value, and
    INCOMPLETE blocks all raise. Emits one row per treatment
    (j_index and rank sums are the evidence; the verdict columns
    repeat — the kruskal/friedman per-group convention).
    significant_05 is the TWO-SIDED |z| > 1.96 flag: it detects a
    monotone trend in either direction (reversing the treatment
    order negates z — property-pinned), so callers test "is there a
    trend" without pre-committing to a sign; one-sided readers
    compare z to 1.645 themselves.

    Overflow bounds (documented, loud on both engines): 2L <=
    k * b * k * (2k) ~ 2 b k^3 and the centered fold is bounded by
    b k^3 — dies near b k^3 ~ 9.2e18, far beyond any real blocked
    design (the friedman bound's shape).

    Scale shape (friedman_test's exact shape): ONE partial+final
    (block, treatment) cell combine (the only full-data shuffle moves
    pre-combined cells); within-block RANGE windows ride a
    block-keyed exchange over the <= b*k CELL frame; the j-ordinal
    and L folds are SinglePartition windows over the <= k-row
    per-treatment frame.

    Family: the ordered-alternative rung of the experiment stack —
    kruskal tests k free-standing samples, friedman blocks a nuisance
    factor, THIS adds the monotone alternative when the treatments
    carry a natural order (dose, time band, size tier).
    """
    reserved = ("j_index", "b_blocks", "k_treatments", "rank_sum",
                "mean_rank", "l_stat", "z_stat", "significant_05")
    for c, what in ((block, "block"), (treatment, "treatment")):
        if c in reserved:
            raise ValueError(
                f"page_trend_test: {what} column {c!r} collides with "
                f"an output column of this test {reserved}; alias it "
                "first")
    trt = F.col(treatment).cast("long")
    frac = (F.col(treatment).isNull()
            | (F.col(treatment).cast("double") != trt.cast("double")))
    cells = df.groupBy(block, treatment).agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.max(value).alias("__v"),
        F.sum(F.when(F.col(value).isNull() | F.isnull(block),
                     F.lit(1)).otherwise(F.lit(0))).alias("__badnull"),
        F.max(F.when(frac, F.lit(1)).otherwise(F.lit(0)))
         .alias("__badtrt"))
    # Diagnostic priority mirrors the docstring's contract order: the
    # treatment-integrity message is the actionable one, so it wins
    # when a cell violates several contracts at once (r16 advice fix —
    # a duplicated cell with a fractional treatment used to report
    # 'duplicate cell').
    cells = cells.filter(
        F.when(F.col("__badtrt") > 0, F.raise_error(F.lit(
            "page_trend_test: treatment column must be integral and "
            "non-null — its VALUE defines the trend order; derive an "
            "ordered bucket at the call site")))
         .when(F.col("__badnull") > 0, F.raise_error(F.lit(
            "page_trend_test: block and value must be non-null on "
            "every row")))
         .when(F.col("__c") > 1, F.raise_error(F.lit(
            "page_trend_test: duplicate (block, treatment) cell — "
            "pre-aggregate multiple observations per cell at the "
            "call site")))
         .otherwise(F.lit(True)))
    wb = Window.partitionBy(block).orderBy("__v")
    le = wb.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    peers = wb.rangeBetween(Window.currentRow, Window.currentRow)
    bwhole = (Window.partitionBy(block)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    t = F.count(F.lit(1)).over(peers)
    cum_le = F.count(F.lit(1)).over(le)
    ranked = cells.select(
        block, treatment,
        (2 * cum_le - t + 1).alias("__rank2"),  # 2 * midrank, integer
        F.count(F.lit(1)).over(bwhole).alias("__cells_in_block"))
    per_trt = ranked.groupBy(treatment).agg(
        F.count(F.lit(1)).cast("long").alias("__b"),
        F.sum("__rank2").cast("long").alias("__r2"),
        F.min("__cells_in_block").alias("__minc"),
        F.max("__cells_in_block").alias("__maxc"))
    # j ordinal: RANGE-frame count of treatments at-or-below — the
    # treatments are DISTINCT here, so the count is the position
    wt = Window.orderBy(treatment)
    jle = wt.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    whole = wt.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    k = F.count(F.lit(1)).over(whole).cast("long")
    b = F.max("__b").over(whole)
    complete = ((F.min("__b").over(whole) == b)
                & (F.min("__minc").over(whole) == k)
                & (F.max("__maxc").over(whole) == k))
    # j/b/k/complete materialize FIRST (a window result cannot nest
    # inside another window function); the 2L fold then windows over
    # the same <= k-row SinglePartition frame
    staged = per_trt.select(
        treatment, "__r2",
        F.count(F.lit(1)).over(jle).cast("long").alias("__j"),
        b.alias("__bb"), k.alias("__kk"),
        complete.alias("__complete"))
    twol = F.sum(F.col("__j") * F.col("__r2")).over(
        Window.orderBy(treatment).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    folded = staged.select(
        treatment, "__r2", "__j",
        F.col("__bb").alias("b_blocks"),
        F.col("__kk").cast("int").alias("k_treatments"),
        "__complete", "__bb", "__kk",
        twol.alias("__twol"))
    folded = folded.filter(F.when(
        ~F.col("__complete"),
        F.raise_error(F.lit(
            "page_trend_test: incomplete design — every block must "
            "contain every treatment exactly once")))
    .otherwise(F.lit(True)))
    # centered4 = 4 (L - E[L]) = 2 * 2L - b k (k+1)^2, an exact integer
    kk = F.col("__kk")
    centered4 = (2 * F.col("__twol")
                 - F.col("__bb") * kk * (kk + 1) * (kk + 1))
    # 16 Var = b k^2 (k+1)^2 (k-1) / 9 — multiplications stay integer,
    # the division by 9.0 goes double at the end
    var16 = (F.col("__bb") * kk * kk * (kk + 1) * (kk + 1)
             * (kk - 1)).cast("double") / F.lit(9.0)
    z = F.when(var16 > 0, centered4.cast("double") / F.sqrt(var16))
    return folded.select(
        treatment,
        F.col("__j").cast("int").alias("j_index"),
        "b_blocks", "k_treatments",
        (F.col("__r2") / F.lit(2.0)).alias("rank_sum"),
        F.round(F.col("__r2") / F.lit(2.0) / F.col("b_blocks"), 6)
         .alias("mean_rank"),
        (F.col("__twol") / F.lit(2.0)).alias("l_stat"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_05"))


def _stratified_2x2_margins(df: DataFrame, stratum: str,
                            exposure: str, outcome: str,
                            op: str) -> DataFrame:
    """Shared per-stratum 2x2 margin aggregate + in-plan contract for
    the stratified contingency stack (``cmh_test`` /
    ``mh_odds_ratio`` / ``woolf_test``) — ONE partial+final
    stratum-keyed aggregate collapsing the subjects to integer
    margins ``__n`` / ``__r1`` / ``__c1`` / ``__a``, with the
    welch-strict validation raising in-plan: exposure outside {0, 1}
    (incl. null), outcome outside {0, 1} (incl. null), and null
    strata (a null stratum has no principled table, and null order
    keys sort NULLS FIRST on Spark windows vs NULLS LAST in SQL
    oracles, shifting every cross-strata fold per engine). Factored
    so the three operators that read the SAME frame cannot
    desynchronize on the contract (the _ab9_variant precedent)."""
    e = F.col(exposure).cast("long")
    o = F.col(outcome).cast("long")
    per_s = df.groupBy(stratum).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(e).alias("__r1"),
        F.sum(o).alias("__c1"),
        F.sum(e * o).alias("__a"),
        F.sum(F.when(F.col(exposure).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__bade"),
        F.sum(F.when(F.col(outcome).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__bado"))
    return per_s.filter(
        F.when(F.col("__bade") > 0, F.raise_error(F.lit(
            f"{op}: exposure column must be a binary {{0, 1}} "
            "assignment — found other/null exposure values")))
         .when(F.col("__bado") > 0, F.raise_error(F.lit(
            f"{op}: outcome column must be a 0/1 indicator — "
            "found other/null outcome values")))
         .when(F.isnull(stratum), F.raise_error(F.lit(
            f"{op}: stratum column must be non-null — a null "
            "stratum has no principled 2x2 table, and null order "
            "keys sort differently per engine in the cross-strata "
            "fold")))
         .otherwise(F.lit(True)))


def cmh_test(df: DataFrame, stratum: str, exposure: str,
             outcome: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of a binary exposure's association
    with a binary outcome across K strata — the CONTINGENCY
    counterpart of ``stratified_logrank`` (H0: exposure and outcome
    are conditionally independent within every stratum; the stratum's
    own effect on the outcome cancels out of the statistic). One row
    per subject in; per stratum k the 2x2 table contributes
    O_k = a_k (exposed successes), E_k = row1_k * col1_k / n_k and
    V_k = row1_k row0_k col1_k col0_k / (n_k^2 (n_k - 1)); the
    statistic is chi2 = (sum_k (O_k - E_k))^2 / sum_k V_k on 1 degree
    of freedom, continuity-UNCORRECTED with the HYPERGEOMETRIC
    (randomization) variance: with ONE stratum this equals
    (n-1)/n times the Pearson 2x2 chi-square — the classical exact
    relation, property-pinned (the two converge as n grows; V_k's
    (n_k - 1) denominator is what makes the pooled statistic valid
    under sparse-strata asymptotics, the whole point of CMH).

    Emits the per-stratum 2x2 trace (the stratified_logrank
    convention): ``o_minus_e`` / ``var_cum`` / ``chi2_stat`` are the
    CROSS-strata running sums in stratum order, so the final row
    carries the verdict — consumers read max(stratum). Duplicating
    every stratum j times multiplies chi2 by j (evidence accumulates
    — property-pinned); a stratum with n_k <= 1 or a degenerate
    margin contributes V_k = 0 and chi2 is NULL while sum V = 0.

    Validation is welch-strict in-plan: exposure outside {0, 1}
    (incl. null), outcome outside {0, 1} (incl. null), and null
    strata all raise — a null stratum has no principled table, and
    null order keys sort NULLS FIRST on Spark windows vs NULLS LAST
    in SQL oracles, shifting the cross-strata fold per engine.

    Cross-engine float discipline (the stratified_logrank fold,
    unchanged): every margin (a, row1, row0, col1, col0, n) is an
    integer aggregate; o_minus_e / var_cum accumulate as ORDERED
    cumulative double sums ascending by stratum — one deterministic
    addition order on both engines; the E/V algebra interleaves
    multiplications with divisions
    (CAST(r1) * c1 / n and CAST(r1) * r0 / n * c1 / n * c0 / (n - 1))
    so no integer product overflows int64, identical operand order in
    both engines. significant_05 compares chi2 to the inlined df = 1
    critical value 3.841 (the srm literal precedent; the chi-square
    drift-guard pins the table).

    Scale shape: ONE partial+final stratum aggregate collapses the
    subjects; the cross-strata fold is a SinglePartition window over
    the <= K-row AGGREGATE frame (correct there: the frame is the
    stratum count, not data-sized — the stratified_logrank
    convention). No joins, no row explosion.

    Family: the stratified rung of the contingency stack —
    chisq_independence tests one r x c table, THIS pools K 2x2
    tables when a known confounder (site, cohort, device class)
    would otherwise mix the margins (Simpson's-paradox-proof
    pooling).
    """
    reserved = ("n_total", "n_exposed", "n_success", "a_obs",
                "expected1", "o_minus_e", "var_cum", "chi2_stat",
                "significant_05")
    if stratum in reserved:
        raise ValueError(
            f"cmh_test: stratum column {stratum!r} collides with an "
            f"output column of this test {reserved}; alias it first")
    per_s = _stratified_2x2_margins(df, stratum, exposure, outcome,
                                    "cmh_test")
    n = F.col("__n")
    r1 = F.col("__r1")
    r0 = n - r1
    c1 = F.col("__c1")
    c0 = n - c1
    # identical operand order in the oracle: CAST(r1) * c1 / n and
    # CAST(r1) * r0 / n * c1 / n * c0 / (n - 1)
    e1 = r1.cast("double") * c1 / n
    v = F.when(n > 1,
               r1.cast("double") * r0 / n * c1 / n * c0
               / (n - F.lit(1))).otherwise(F.lit(0.0))
    scored = per_s.select(
        stratum, "__n", "__r1", "__c1", "__a",
        e1.alias("__e1"), v.alias("__v"))
    cum = (Window.orderBy(stratum)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ome = F.sum(F.col("__a") - F.col("__e1")).over(cum)
    var = F.sum("__v").over(cum)
    chi2 = F.when(var > 0, ome * ome / var)
    return scored.select(
        stratum,
        F.col("__n").alias("n_total"),
        F.col("__r1").alias("n_exposed"),
        F.col("__c1").alias("n_success"),
        F.col("__a").alias("a_obs"),
        F.round("__e1", 6).alias("expected1"),
        F.round(ome, 6).alias("o_minus_e"),
        F.round(var, 6).alias("var_cum"),
        F.round(chi2, 4).alias("chi2_stat"),
        (chi2 > 3.841).alias("significant_05"))


def cochran_q_test(df: DataFrame, block: str, treatment: str,
                   value: str) -> DataFrame:
    """Cochran's Q test over a COMPLETE b x k grid of BINARY
    (``block``, ``treatment``, ``value``) cells — the 0/1
    specialization of ``friedman_test`` (H0: all k treatments share
    one success probability within blocks; the blocked counterpart of
    a k-proportion test). Q = k (k-1) sum_j (C_j - N/k)^2 /
    (k N - sum_i R_i^2) with C_j the per-treatment success totals,
    R_i the per-block success totals and N the grand total,
    chi-square on k-1 degrees of freedom.

    FULLY integer-exact, one step simpler than friedman (no ranks at
    all): with sum_j (C_j - N/k)^2 = sum_j C_j^2 - N^2 / k, the
    numerator folds as (k-1) (k sum_j C_j^2 - N^2) — ALL integers —
    and the denominator k N - sum_i R_i^2 is an integer aggregate;
    the single double division happens at the end. Blocks where every
    treatment agrees (all 0 or all 1) contribute zero to both sides
    (the classical Q ignores concordant blocks implicitly); a
    degenerate grid (denominator 0) yields NULL q_stat/flag.

    Grid validation is friedman-strict in-plan: duplicate
    (block, treatment) cells, null block/treatment/value, value
    outside {0, 1}, and INCOMPLETE blocks all raise (aggregate
    multiple binary observations per cell to one 0/1 at the call
    site — e.g. 'did the cell's rate beat the grid median').

    Emits one row per treatment (successes and rates are the
    evidence; the verdict columns repeat — the kruskal/friedman
    per-group convention). significant_05 compares Q to the inlined
    chi-square 5% critical values for df 1..10 via the shared
    ``_chi2_crit_05`` handoff (drift-guarded in
    tests/test_registry.py automatically).

    Property pins: k = 2 reduces to McNemar's chi-square WITHOUT
    continuity correction, Q = (b01 - b10)^2 / (b01 + b10) over the
    discordant block counts; permuting treatment labels leaves Q
    unchanged; duplicating every block j times multiplies Q by j
    (C_j and N scale by j so k sum C^2 - N^2 scales by j^2, while
    the denominator k N - sum R^2 scales by j — evidence
    accumulates, property-pinned).

    Overflow bounds (documented, loud on both engines): the numerator
    fold is bounded by k (k C_max^2 + N^2) <= 2 k N^2 — dies near
    N ~ sqrt(9.2e18 / 2k) ~ 6e8 blocks at k = 10, far beyond any
    real blocked binary design; the ANSI overflow raise on both
    engines is the loud failure.

    Scale shape (friedman_test's exact shape): ONE partial+final
    (block, treatment) cell combine (the only full-data shuffle moves
    pre-combined cells); the per-block R_i fold rides a block-keyed
    aggregate over the <= b*k CELL frame; the final fold is a
    SinglePartition window over the <= k-row per-treatment frame.

    Family: the binary rung of the blocked experiment stack —
    friedman ranks ordinal values within blocks, page adds an ordered
    alternative, THIS tests 0/1 outcomes (conversion, pass/fail,
    defect) where ranks collapse to the success counts.
    """
    reserved = ("b_blocks", "k_treatments", "successes",
                "success_rate", "q_stat", "dof", "significant_05")
    for c, what in ((block, "block"), (treatment, "treatment")):
        if c in reserved:
            raise ValueError(
                f"cochran_q_test: {what} column {c!r} collides with "
                f"an output column of this test {reserved}; alias it "
                "first")
    v = F.col(value).cast("long")
    cells = df.groupBy(block, treatment).agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.max(v).alias("__v"),
        F.sum(F.when(F.col(value).isin(0, 1), F.lit(0))
               .otherwise(F.lit(1))).alias("__badval"),
        F.max(F.when(F.isnull(block) | F.isnull(treatment), F.lit(1))
               .otherwise(F.lit(0))).alias("__badkey"))
    cells = cells.filter(
        F.when(F.col("__badkey") > 0, F.raise_error(F.lit(
            "cochran_q_test: block and treatment must be non-null on "
            "every row")))
         .when(F.col("__badval") > 0, F.raise_error(F.lit(
            "cochran_q_test: value column must be a 0/1 indicator — "
            "aggregate multiple binary observations per cell to one "
            "0/1 at the call site")))
         .when(F.col("__c") > 1, F.raise_error(F.lit(
            "cochran_q_test: duplicate (block, treatment) cell — "
            "pre-aggregate multiple observations per cell at the "
            "call site")))
         .otherwise(F.lit(True)))
    bwhole = (Window.partitionBy(block)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    with_r = cells.select(
        block, treatment, "__v",
        F.sum("__v").over(bwhole).alias("__ri"),
        F.count(F.lit(1)).over(bwhole).alias("__cells_in_block"))
    per_trt = with_r.groupBy(treatment).agg(
        F.count(F.lit(1)).cast("long").alias("__b"),
        F.sum("__v").cast("long").alias("__cj"),
        F.sum(F.col("__ri")).cast("long").alias("__sumri"),
        F.sum(F.col("__ri") * F.col("__ri")).cast("long")
         .alias("__sumri2"),
        F.min("__cells_in_block").alias("__minc"),
        F.max("__cells_in_block").alias("__maxc"))
    # per_trt sums R_i and R_i^2 over each treatment's OWN block set;
    # on a complete grid every treatment sees every block, so any
    # single treatment's __sumri2 is THE sum over blocks (and __sumri
    # is N) — completeness is validated before they are read
    whole = (Window.orderBy(treatment)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    k = F.count(F.lit(1)).over(whole).cast("long")
    b = F.max("__b").over(whole)
    nn = F.max("__sumri").over(whole)
    sumri2 = F.max("__sumri2").over(whole)
    sumcj2 = F.sum(F.col("__cj") * F.col("__cj")).over(whole)
    complete = ((F.min("__b").over(whole) == b)
                & (F.min("__minc").over(whole) == k)
                & (F.max("__maxc").over(whole) == k)
                & (F.min("__sumri").over(whole) == nn)
                & (F.min("__sumri2").over(whole) == sumri2))
    staged = per_trt.select(
        treatment, "__cj",
        b.alias("__bb"), k.alias("__kk"),
        nn.alias("__nn"), sumri2.alias("__ri2"),
        sumcj2.alias("__cj2"),
        complete.alias("__complete"))
    staged = staged.filter(F.when(
        ~F.col("__complete"),
        F.raise_error(F.lit(
            "cochran_q_test: incomplete design — every block must "
            "contain every treatment exactly once")))
    .otherwise(F.lit(True)))
    kk = F.col("__kk")
    num = (kk - 1) * (kk * F.col("__cj2") - F.col("__nn")
                      * F.col("__nn"))
    den = kk * F.col("__nn") - F.col("__ri2")
    q = F.when(den > 0, num.cast("double") / den)
    dof = (kk - 1).cast("int")
    crit = _chi2_crit_05(dof)
    return staged.select(
        treatment,
        F.col("__bb").alias("b_blocks"),
        kk.cast("int").alias("k_treatments"),
        F.col("__cj").alias("successes"),
        F.round(F.col("__cj").cast("double") / F.col("__bb"), 6)
         .alias("success_rate"),
        F.round(q, 4).alias("q_stat"),
        dof.alias("dof"),
        (q > crit).alias("significant_05"))


def mh_odds_ratio(df: DataFrame, stratum: str, exposure: str,
                  outcome: str) -> DataFrame:
    """Mantel-Haenszel common odds-ratio ESTIMATE with the
    Robins-Breslow-Greenland (1986) variance of its log — the
    estimation companion of ``cmh_test`` (cmh answers IS there a
    common association; THIS answers HOW BIG it is, with a 95%
    confidence interval that stays valid under sparse-strata
    asymptotics — the same regime cmh's hypergeometric variance
    targets). One row per subject in; per stratum k with 2x2 cells
    a (exposed successes), b (exposed failures), c (unexposed
    successes), d (unexposed failures) and n = a+b+c+d:

        OR_MH = R / S,  R = sum_k a_k d_k / n_k,
                        S = sum_k b_k c_k / n_k
        Var(ln OR_MH) = sum(P R)/ (2 R^2)
                      + sum(P S + Q R) / (2 R S)
                      + sum(Q S) / (2 S^2)          [RBG]
        P_k = (a_k + d_k) / n_k,  Q_k = (b_k + c_k) / n_k

    and the 95% CI is exp(ln(R/S) -/+ 1.96 sqrt(Var)) (the pinned
    z-critical literal — identical on both engines).

    Zero cells need NO correction here (unlike ``woolf_test``): a
    stratum with a_k d_k = 0 simply contributes nothing to R, one
    with b_k c_k = 0 nothing to S — the estimator is defined whenever
    ANY stratum has a complete diagonal. A fully degenerate margin
    stratum (cmh's V_k = 0 case) drops out of BOTH sums. or_mh is
    NULL while the running S = 0; it is exactly 0.0 when R = 0 with
    S > 0; se_log / ci_low / ci_high are NULL unless both running
    sums are positive (ln(0) has no CI).

    Emits the per-stratum trace in the cmh/stratified_logrank
    convention: ``r_term`` / ``s_term`` are the stratum's own
    diagonal products; ``r_cum`` / ``s_cum`` / ``or_mh`` / ``se_log``
    / ``ci_low`` / ``ci_high`` are the CROSS-strata running values in
    stratum order, so the final row carries the estimate — consumers
    read max(stratum). Validation is cmh-verbatim in-plan: exposure
    outside {0, 1} (incl. null), outcome outside {0, 1} (incl.
    null), and null strata all raise.

    Cross-engine float discipline (the cmh fold, unchanged): every
    cell (a, b, c, d, n) is an integer stratum aggregate; R_k / S_k /
    P_k / Q_k interleave multiplications with divisions in identical
    operand order on both engines (CAST(a) * d / n — no integer
    product ever forms, so nothing overflows int64 at any n_k); all
    five running sums are ORDERED cumulative double sums ascending by
    stratum; the variance reads as a division CHAIN
    (pr / 2 / R / R + psqr / 2 / R / S + qs / 2 / S / S) — one
    deterministic evaluation order, no engine-chosen association.

    Scale shape (cmh-verbatim): ONE partial+final stratum aggregate
    collapses the subjects; every running value is a SinglePartition
    window over the <= K-row AGGREGATE frame. No joins, no row
    explosion.

    Family: the estimate rung of the stratified contingency stack —
    ``cmh_test`` tests, THIS estimates, ``woolf_test`` checks that
    pooling into one common OR was legitimate in the first place.
    """
    reserved = ("n_total", "n_exposed", "n_success", "a_obs",
                "r_term", "s_term", "r_cum", "s_cum", "or_mh",
                "se_log", "ci_low", "ci_high")
    if stratum in reserved:
        raise ValueError(
            f"mh_odds_ratio: stratum column {stratum!r} collides "
            f"with an output column {reserved}; alias it first")
    per_s = _stratified_2x2_margins(df, stratum, exposure, outcome,
                                    "mh_odds_ratio")
    n = F.col("__n")
    a = F.col("__a")
    b = F.col("__r1") - a
    c = F.col("__c1") - a
    d = n - F.col("__r1") - F.col("__c1") + a
    # identical operand order in the oracle: CAST(a) * d / n etc.
    r_t = a.cast("double") * d / n
    s_t = b.cast("double") * c / n
    p_t = (a + d).cast("double") / n
    q_t = (b + c).cast("double") / n
    scored = per_s.select(
        stratum, "__n", "__r1", "__c1", "__a",
        r_t.alias("__r"), s_t.alias("__s"),
        (p_t * r_t).alias("__pr"),
        (p_t * s_t + q_t * r_t).alias("__psqr"),
        (q_t * s_t).alias("__qs"))
    cum = (Window.orderBy(stratum)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rr = F.sum("__r").over(cum)
    ss = F.sum("__s").over(cum)
    pr = F.sum("__pr").over(cum)
    psqr = F.sum("__psqr").over(cum)
    qs = F.sum("__qs").over(cum)
    or_mh = F.when(ss > 0, rr / ss)
    # division chain — identical evaluation order in the oracle; the
    # (rr > 0) & (ss > 0) guard is load-bearing under ANSI: the
    # divisions and ln(0) below only evaluate inside the CASE branch
    ci_ok = (rr > 0) & (ss > 0)
    var_log = F.when(ci_ok,
                     pr / 2 / rr / rr + psqr / 2 / rr / ss
                     + qs / 2 / ss / ss)
    se = F.sqrt(var_log)
    ci_low = F.when(ci_ok, F.exp(F.log(rr / ss) - 1.96 * se))
    ci_high = F.when(ci_ok, F.exp(F.log(rr / ss) + 1.96 * se))
    return scored.select(
        stratum,
        F.col("__n").alias("n_total"),
        F.col("__r1").alias("n_exposed"),
        F.col("__c1").alias("n_success"),
        F.col("__a").alias("a_obs"),
        F.round("__r", 6).alias("r_term"),
        F.round("__s", 6).alias("s_term"),
        F.round(rr, 6).alias("r_cum"),
        F.round(ss, 6).alias("s_cum"),
        F.round(or_mh, 4).alias("or_mh"),
        F.round(se, 6).alias("se_log"),
        F.round(ci_low, 4).alias("ci_low"),
        F.round(ci_high, 4).alias("ci_high"))


def woolf_test(df: DataFrame, stratum: str, exposure: str,
               outcome: str) -> DataFrame:
    """Woolf's chi-square test of odds-ratio HOMOGENEITY across K
    strata, with the Haldane-Anscombe +0.5 correction applied to
    every cell — the diagnostic in FRONT of ``cmh_test`` /
    ``mh_odds_ratio`` (H0: all strata share one odds ratio; reject
    and the 'common' OR those tools pool is averaging genuinely
    different effects — report per-stratum instead). One row per
    subject in; per stratum k with corrected cells a' = a + 0.5 ...
    d' = d + 0.5:

        L_k = ln(a' d' / b' / c')          [per-stratum log-OR]
        w_k = 1 / (1/a' + 1/b' + 1/c' + 1/d')   [inverse variance]
        chi2 = sum w L^2 - (sum w L)^2 / sum w   ~ chi2(K - 1)

    The +0.5 correction is applied UNCONDITIONALLY (the documented
    Haldane-Anscombe convention, not a zero-cell patch): every
    stratum — including ones with empty cells, which would otherwise
    have infinite log-OR and zero weight — contributes finite L_k and
    w_k, so the test runs on exactly the strata the pooling tools
    see. On large balanced strata the correction is O(1/n_k) and the
    statistic converges to the uncorrected Woolf form.

    Emits the per-stratum trace in the cmh convention: ``log_or`` /
    ``weight`` are the stratum's own corrected values;
    ``log_or_pooled`` (the weighted mean so far) / ``chi2_stat`` /
    ``dof`` / ``significant_05`` are CROSS-strata running values in
    stratum order — the final row carries the verdict over all K
    strata (dof = K - 1); consumers read max(stratum). The first
    row's dof = 0 yields NULL chi2/flag (one stratum cannot be
    heterogeneous); dof > 10 yields NULL flag via the shared
    ``_chi2_crit_05`` handoff (drift-guarded). chi2 is clamped at 0
    with greatest() on BOTH engines: the computational form can go
    ~-1e-16 under float cancellation when strata are homogeneous,
    and -0.0 vs 0.0 would drift the rounded hash.

    Validation is cmh-verbatim in-plan: exposure outside {0, 1}
    (incl. null), outcome outside {0, 1} (incl. null), and null
    strata all raise.

    Cross-engine float discipline: cells are integer stratum
    aggregates; +0.5 is exact in doubles; L_k reads as
    ln(a' * d' / b' / c') and w_k as 1 / (1/a' + 1/b' + 1/c' +
    1/d') — identical operand order on both engines (the only
    transcendental is ln, same-input-same-double, absorbed by the
    rounding convention as in kaplan/sprt); the three running sums
    (w, wL, wL^2) are ORDERED cumulative double sums ascending by
    stratum.

    Scale shape (cmh-verbatim): ONE partial+final stratum aggregate
    collapses the subjects; the fold is a SinglePartition window over
    the <= K-row AGGREGATE frame. No joins, no row explosion.

    Property pins: K identical strata give chi2 ~ 0; K = 2 reduces to
    w1 w2 (L1 - L2)^2 / (w1 + w2); swapping exposure labels negates
    every L_k and preserves every w_k, leaving chi2 invariant (same
    for outcome labels); duplicating every stratum j times multiplies
    chi2 by j (heterogeneity evidence accumulates).
    """
    reserved = ("n_total", "n_exposed", "n_success", "a_obs",
                "log_or", "weight", "log_or_pooled", "chi2_stat",
                "dof", "significant_05")
    if stratum in reserved:
        raise ValueError(
            f"woolf_test: stratum column {stratum!r} collides with "
            f"an output column {reserved}; alias it first")
    per_s = _stratified_2x2_margins(df, stratum, exposure, outcome,
                                    "woolf_test")
    n = F.col("__n")
    a = F.col("__a")
    b = F.col("__r1") - a
    c = F.col("__c1") - a
    d = n - F.col("__r1") - F.col("__c1") + a
    ah = a.cast("double") + 0.5
    bh = b.cast("double") + 0.5
    ch = c.cast("double") + 0.5
    dh = d.cast("double") + 0.5
    # identical operand order in the oracle: ln(a*d/b/c); the weight's
    # reciprocal sum reads left-to-right
    lor = F.log(ah * dh / bh / ch)
    w = 1 / (1 / ah + 1 / bh + 1 / ch + 1 / dh)
    scored = per_s.select(
        stratum, "__n", "__r1", "__c1", "__a",
        lor.alias("__l"), w.alias("__w"),
        (w * lor).alias("__wl"),
        (w * lor * lor).alias("__wl2"))
    cum = (Window.orderBy(stratum)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ws = F.sum("__w").over(cum)
    wls = F.sum("__wl").over(cum)
    wl2s = F.sum("__wl2").over(cum)
    kk = F.count(F.lit(1)).over(cum)
    chi2 = F.when(kk > 1,
                  F.greatest(wl2s - wls * wls / ws, F.lit(0.0)))
    dof = (kk - 1).cast("int")
    crit = _chi2_crit_05(dof)
    return scored.select(
        stratum,
        F.col("__n").alias("n_total"),
        F.col("__r1").alias("n_exposed"),
        F.col("__c1").alias("n_success"),
        F.col("__a").alias("a_obs"),
        F.round("__l", 6).alias("log_or"),
        F.round("__w", 6).alias("weight"),
        F.round(wls / ws, 6).alias("log_or_pooled"),
        F.round(chi2, 4).alias("chi2_stat"),
        dof.alias("dof"),
        (chi2 > crit).alias("significant_05"))
