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
