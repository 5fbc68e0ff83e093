"""Unit tests for shuffle-conscious relational combinators."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.operators import relational


def test_salted_join_equals_plain_join(spark):
    # One hot key (90% of rows) + a tail: the salting target shape.
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(90)] + [(k, f"t{k}") for k in range(2, 12)],
        ["k", "lv"])
    right = spark.createDataFrame(
        [(k, f"r{k}") for k in range(1, 12)], ["k", "rv"])
    salted = relational.salted_join(left, right, "k", salt=4)
    plain = left.join(right, "k")
    assert sorted(salted.collect()) == sorted(plain.collect())
    assert salted.columns == plain.columns


def test_salted_join_left_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "no-match")], ["k", "lv"])
    right = spark.createDataFrame([(1, "r1")], ["k", "rv"])
    out = {r["k"]: r["rv"]
           for r in relational.salted_join(left, right, "k", "left", 4).collect()}
    assert out == {1: "r1", 99: None}


def test_grouped_zscore_matches_native_window(spark):
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0),
         ("b", 5.0), ("b", 5.0),          # zero variance -> null z
         ("c", 42.0)],                    # singleton -> null z
        ["g", "x"])
    got = {(r["g"], r["x"]): r["z"]
           for r in relational.grouped_zscore(df, "g", "x").collect()}

    w = Window.partitionBy("g")
    native = df.withColumn(
        "z", F.try_divide(F.col("x") - F.avg("x").over(w),
                          F.stddev_samp("x").over(w)))
    want = {(r["g"], r["x"]): r["z"] for r in native.collect()}

    assert set(got) == set(want)
    for k, v in want.items():
        if v is None:
            assert got[k] is None
        else:
            assert abs(got[k] - v) < 1e-12


def test_locf_fill_matches_unbounded_window(spark):
    """The bounded two-level fill (LOCF within bucket + per-bucket-last
    carry-in) must equal the single unbounded-frame window on every shape
    that exercises its seams: leading nulls, all-null buckets (carry must
    pass through), values exactly on bucket boundaries, and a value-free
    key."""
    from pyspark.sql import Window

    rows = []
    # key 1: observation at t=0 then a 60-wide gap spanning whole buckets
    for t in range(70):
        rows.append((1, t, float(t) if t in (0, 3, 65) else None))
    # key 2: leading nulls (nothing to carry), then sparse values
    for t in range(30):
        rows.append((2, t, float(t * 10) if t in (7, 29) else None))
    # key 3: all null
    for t in range(10):
        rows.append((3, t, None))
    df = spark.createDataFrame(rows, "k int, t int, v double")

    got = relational.locf_fill(df, "k", "t", "v", bucket_size=8)
    w = (Window.partitionBy("k").orderBy("t")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = df.withColumn("value_filled", F.last("v", ignorenulls=True).over(w))
    a = sorted(map(tuple, got.select("k", "t", "value_filled").collect()))
    b = sorted(map(tuple, want.select("k", "t", "value_filled").collect()))
    assert a == b

    # Bounded-frame claim: no window partition is wider than one bucket on
    # the row grain — the only unbounded-preceding frame over raw rows is
    # keyed by (k, __bkt).
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "__bkt" in plan


def test_dot_dim_truncation_consistent_across_forms(spark):
    """dot/dot_expr with dim < len(array) must sum exactly the first dim
    elements in BOTH physical forms (unrolled and fold) — the fold used to
    silently ignore dim and sum the whole array."""
    from data_pipeline_eng_project_1_spark.functions import vectors

    a = [float(i + 1) for i in range(20)]   # 1..20
    b = [2.0] * 20
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    want_4 = 2.0 * sum(a[:4])     # unrolled form (dim <= 16)
    want_18 = 2.0 * sum(a[:18])   # fold form (dim > 16)
    row = df.select(
        vectors.dot(F.col("a"), F.col("b"), 4).alias("u"),
        vectors.dot(F.col("a"), F.col("b"), 18).alias("f"),
        vectors.dot_expr("a", "b", 4).alias("ue"),
        vectors.dot_expr("a", "b", 18).alias("fe"),
        vectors.dot(F.col("a"), F.col("b")).alias("full"),
    ).first()
    assert row["u"] == row["ue"] == want_4
    assert row["f"] == row["fe"] == want_18
    assert row["full"] == 2.0 * sum(a)


def test_capped_per_key_threshold_matches_window(spark):
    """Both methods of capped_per_key select the IDENTICAL rows and ranks
    (the k-th order statistic's prefix equals the sort's prefix), the
    quota binds per key, and the pick is deterministic across runs."""
    from data_pipeline_eng_project_1_spark.operators import relational

    rows = [(i, f"k{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string")
    w = relational.capped_per_key(df, key="grp", id_col="id", quota=7,
                                  method="window")
    t = relational.capped_per_key(df, key="grp", id_col="id", quota=7,
                                  method="threshold")
    got_w = sorted((r.grp, r.id, r.pick_rank) for r in w.collect())
    got_t = sorted((r.grp, r.id, r.pick_rank) for r in t.collect())
    assert got_w == got_t
    assert len(got_w) == 5 * 7
    per_key: dict[str, list[int]] = {}
    for g, _, rank in got_w:
        per_key.setdefault(g, []).append(rank)
    for g, ranks in per_key.items():
        assert sorted(ranks) == list(range(1, 8)), g
    # deterministic: a second run picks the same rows
    again = sorted((r.grp, r.id, r.pick_rank) for r in relational
                   .capped_per_key(df, "grp", "id", 7, "threshold")
                   .collect())
    assert again == got_t


def test_capped_per_key_quota_above_key_size_keeps_all(spark):
    from data_pipeline_eng_project_1_spark.operators import relational

    df = spark.createDataFrame([(i, "only") for i in range(4)],
                               "id long, grp string")
    for method in ("window", "threshold"):
        got = relational.capped_per_key(df, "grp", "id", 10, method)
        assert got.count() == 4, method


def test_entity_match_fuzzy_blocks_and_distance(spark, sf_dir):
    """Fuzzy entity pairs: same head-noun block only, ordered names,
    distance within threshold and symmetric-free (each pair once)."""
    from data_pipeline_eng_project_1_spark.plans import queries as Q

    rows = Q.queries()["entity_match_fuzzy"](spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[1] == r["name_b"].split(" ")[1]
        assert 0 <= r["dist"] <= 3
        key = (r["name_a"], r["name_b"])
        assert key not in seen
        seen.add(key)


def test_banded_running_total_matches_global_window(spark):
    """Band-decomposed prefix sum == the naive global window, on integer
    values (exact compare), including heavy skew and duplicate values."""
    import random

    from pyspark.sql import Window

    rng = random.Random(7)
    rows = [(i, rng.choice([1, 2, 5, 1000, 10**6])) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(5)
    got = {r["id"]: r["running_total"]
           for r in relational.banded_running_total(
               df, value="v", tiebreak="id").collect()}
    w = (Window.orderBy(F.col("v").desc(), "id")
         .rowsBetween(Window.unboundedPreceding, 0))
    want = {r["id"]: r["rt"]
            for r in df.withColumn("rt", F.sum("v").over(w)).collect()}
    assert got == want


def test_banded_running_total_constant_values(spark):
    """All-equal values (zero band width) must not divide by zero; order
    falls back to the tiebreak."""
    df = spark.createDataFrame([(i, 10) for i in range(8)], ["id", "v"])
    got = sorted((r["id"], r["running_total"])
                 for r in relational.banded_running_total(
                     df, value="v", tiebreak="id").collect())
    assert got == [(i, (i + 1) * 10) for i in range(8)]


def test_attribute_last_touch_horizon_and_ties(spark):
    """Last-touch attribution: nearest preceding touch wins, a touch at
    the exact conversion instant counts (backward-inclusive), touches
    beyond the horizon do NOT get credit, and conversions with no touch
    attribute null."""
    from pyspark.sql import functions as F  # noqa: F401

    from data_pipeline_eng_project_1_spark.operators import relational

    rows = [
        # user 1: click@100, email@900, purchase@1000 -> email (latest)
        (1, 1, 100, "click"), (2, 1, 900, "email"),
        (3, 1, 1000, "purchase"),
        # user 2: click exactly at the purchase instant -> counts
        (4, 2, 500, "click"), (5, 2, 500, "purchase"),
        # user 3: click too old for the 300 horizon -> null
        (6, 3, 100, "click"), (7, 3, 900, "purchase"),
        # user 4: no touches at all -> null
        (8, 4, 700, "purchase"),
        # user 5: a LATER click never attributes backward
        (9, 5, 800, "purchase"), (10, 5, 900, "click"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_ms", "event_type"])
    got = {r["conversion_id"]: (r["touch_id"], r["touch_type"], r["lag_ms"])
           for r in relational.attribute_last_touch(
               ev, "purchase", ["click", "email"], horizon=300).collect()}
    assert got[3] == (2, "email", 100)
    assert got[5] == (4, "click", 0)
    assert got[7] == (None, None, None)
    assert got[8] == (None, None, None)
    assert got[9] == (None, None, None)


def test_attribute_last_touch_tiebreak_and_id_type(spark):
    """Two touches at the exact same (key, ts) credit the LARGEST id
    deterministically, and non-numeric event ids survive: touch_id keeps
    the source id type instead of silently nulling under a long cast."""
    from data_pipeline_eng_project_1_spark.operators import relational

    rows = [
        ("t1", 1, 500, "click"), ("t2", 1, 500, "email"),
        ("t9", 1, 500, "click"),
        ("c1", 1, 600, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_ms", "event_type"])
    got = relational.attribute_last_touch(
        ev, "purchase", ["click", "email"], horizon=300).collect()
    assert len(got) == 1
    assert got[0]["conversion_id"] == "c1"
    assert got[0]["touch_id"] == "t9"  # max id among the ts-500 ties
    assert got[0]["touch_type"] == "click"
    assert got[0]["lag_ms"] == 100


def test_attribute_multi_touch_linear_and_u_shaped(spark):
    """Linear splits 1/n across in-horizon touches; u-shaped gives
    40/20.../40 with the n=1 and n=2 degenerate cases; horizon and
    backward-inclusiveness match attribute_last_touch; credits per
    conversion sum to 1."""
    from data_pipeline_eng_project_1_spark.operators import relational

    rows = [
        # user 1: touches at 100, 500, 900 + one out-of-horizon at 10;
        # purchase@1000, horizon 900 -> three in-horizon touches
        (1, 1, 10, "click"), (2, 1, 100, "click"), (3, 1, 500, "email"),
        (4, 1, 900, "click"), (5, 1, 1000, "purchase"),
        # user 2: single touch exactly at the instant (inclusive)
        (6, 2, 700, "click"), (7, 2, 700, "purchase"),
        # user 3: two touches -> 0.5/0.5 under u_shaped
        (8, 3, 300, "click"), (9, 3, 400, "email"), (10, 3, 450, "purchase"),
        # user 4: no in-horizon touch -> absent from output
        (11, 4, 100, "click"), (12, 4, 9999, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_ms", "event_type"])

    lin = relational.attribute_multi_touch(
        ev, "purchase", ["click", "email"], horizon=900, model="linear")
    got = {(r["conversion_id"], r["touch_id"]): (r["n_touches"], r["credit"])
           for r in lin.collect()}
    assert set(got) == {(5, 2), (5, 3), (5, 4), (7, 6), (10, 8), (10, 9)}
    assert all(abs(c - 1.0 / n) < 1e-12 for n, c in got.values())

    u = relational.attribute_multi_touch(
        ev, "purchase", ["click", "email"], horizon=900, model="u_shaped")
    cred = {(r["conversion_id"], r["touch_id"]): r["credit"]
            for r in u.collect()}
    assert cred[(5, 2)] == pytest.approx(0.4)   # first
    assert cred[(5, 3)] == pytest.approx(0.2)   # middle
    assert cred[(5, 4)] == pytest.approx(0.4)   # last
    assert cred[(7, 6)] == pytest.approx(1.0)   # n=1
    assert cred[(10, 8)] == pytest.approx(0.5)  # n=2
    assert cred[(10, 9)] == pytest.approx(0.5)
    # credits sum to 1 per conversion in both models
    for frame in (lin, u):
        from pyspark.sql import functions as F
        sums = frame.groupBy("conversion_id").agg(
            F.sum("credit").alias("s")).collect()
        assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)

    # fractional timestamps are rejected: the [cts-horizon, cts] window
    # is encoded as the half-open integer range (-horizon, 1), and
    # binned_range_join's bucket math needs integer DIV — a double ts
    # would silently admit touches in (cts, cts + 1)
    frac = ev.withColumn("ts_ms", F.col("ts_ms").cast("double"))
    with pytest.raises(TypeError, match="integer epoch-units"):
        relational.attribute_multi_touch(
            frac, "purchase", ["click"], horizon=900)


def test_grouped_regression_matches_numpy_per_group(spark):
    import numpy as np

    from data_pipeline_eng_project_1_spark.operators import relational

    rng = np.random.RandomState(5)
    rows = []
    for g, (a, b) in enumerate([(2.0, 1.0), (-0.5, 3.0), (0.0, 7.0)]):
        xs = rng.uniform(0, 10, 40)
        ys = a * xs + b + rng.normal(0, 0.1, 40)
        rows += [(g, float(x), float(yv)) for x, yv in zip(xs, ys)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r["g"]: r for r in
           relational.grouped_regression(df, ["g"], "x", "y").collect()}
    for g in range(3):
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([yv for gg, _, yv in rows if gg == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[g]["n"] == 40
        assert got[g]["slope"] == pytest.approx(slope, abs=1e-9)
        assert got[g]["intercept"] == pytest.approx(intercept, abs=1e-9)
        r = np.corrcoef(xs, ys)[0, 1] ** 2
        assert got[g]["r2"] == pytest.approx(r, abs=1e-9)
