"""Bucketed co-located join: the write-once / join-shuffle-free layout."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.sources import bucketed, catalog

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = catalog.load_table(spark, "orders", SF_DIR)
    c = catalog.load_table(spark, "customer", SF_DIR)
    bucketed.write_bucketed(o.withColumnRenamed("o_custkey", "custkey"),
                            "orders_b", "custkey", 4)
    bucketed.write_bucketed(c.withColumnRenamed("c_custkey", "custkey"),
                            "customer_b", "custkey", 4)
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # Force the sort-merge path: broadcast would hide the bucketing story.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed.bucketed_join(spark, lt, rt, "custkey")
        assert not bucketed.has_shuffle(j), j._jdf.queryExecution().toString()
        # And the plain (non-bucketed) join DOES shuffle — the contrast that
        # proves the bucket layout, not some small-input accident, removed it.
        o = catalog.load_table(spark, "orders", SF_DIR)
        c = catalog.load_table(spark, "customer", SF_DIR)
        plain = o.join(c, o.o_custkey == c.c_custkey)
        assert bucketed.has_shuffle(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = (bucketed.bucketed_join(spark, lt, rt, "custkey")
         .groupBy("c_mktsegment")
         .agg(F.count("*").alias("n"),
              F.round(F.sum("o_totalprice"), 2).alias("total")))
    o = catalog.load_table(spark, "orders", SF_DIR)
    c = catalog.load_table(spark, "customer", SF_DIR)
    plain = (o.join(c, o.o_custkey == c.c_custkey)
             .groupBy("c_mktsegment")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("o_totalprice"), 2).alias("total")))
    assert sorted(j.collect()) == sorted(plain.collect())
