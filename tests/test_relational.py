"""Unit tests for shuffle-conscious relational combinators."""

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
