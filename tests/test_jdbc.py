"""JDBC warehouse sink/source round-trip against embedded Derby (the JDBC
database that ships in Spark's own jars — a real driver + real SQL engine,
no network). Mirrors the reference pipeline's terminal Snowflake load
(/root/reference/dags/utils.py:184-224) minus its per-row anti-patterns:
bulk batches, engine-minted keys, no id read-back.
"""

import pytest
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.sources import files

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "wh"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_sink_roundtrip_bulk(spark, derby_url):
    df = spark.range(0, 200, 1, 8).select(
        F.col("id").alias("match_id"),
        (F.col("id") * 2).cast("int").alias("score"),
        F.round(F.col("id") * 1.5, 2).alias("odd"),
    )
    files.sink_jdbc(df, derby_url, "MATCHES", mode="overwrite",
                    batchsize=50, driver=DRIVER)
    back = files.read_jdbc(spark, derby_url, "MATCHES", driver=DRIVER)
    assert back.count() == 200
    got = {(r["match_id"], r["score"], r["odd"]) for r in back.collect()}
    want = {(i, i * 2, round(i * 1.5, 2)) for i in range(200)}
    assert got == want


def test_jdbc_sink_append_and_connection_cap(spark, derby_url):
    df = spark.range(0, 40, 1, 16).select(F.col("id").alias("k"))
    files.sink_jdbc(df, derby_url, "APPENDS", mode="overwrite",
                    driver=DRIVER, num_partitions=2)  # ≤2 connections
    files.sink_jdbc(df, derby_url, "APPENDS", mode="append",
                    driver=DRIVER, num_partitions=2)
    back = files.read_jdbc(spark, derby_url, "APPENDS", driver=DRIVER)
    assert back.count() == 80  # append-only: duplicates are the CONTRACT
    # (idempotent targets collapse engine-minted keys via merge, not the sink)


def test_jdbc_parallel_range_read(spark, derby_url):
    df = spark.range(0, 100, 1, 4).select(F.col("id").alias("k"))
    files.sink_jdbc(df, derby_url, "RANGED", mode="overwrite", driver=DRIVER)
    back = files.read_jdbc(spark, derby_url, "RANGED", driver=DRIVER,
                           partition_column="k", lower_bound=0,
                           upper_bound=100, num_partitions=4)
    assert back.rdd.getNumPartitions() == 4  # 4 bounded range queries
    assert sorted(r["k"] for r in back.collect()) == list(range(100))


def test_jdbc_four_table_fanout_shares_minted_id(spark, derby_url, tmp_path):
    """The reference's 4-table load recovers parent ids by re-SELECTing the
    warehouse after every row (dags/utils.py:215-217). Here the id is
    minted once in-engine, both writes share it, and the join key lines up
    in the warehouse with zero read-backs."""
    base = spark.range(0, 30).select(
        F.sha2(F.concat_ws("|", F.col("id").cast("string")), 256).alias("id_match"),
        F.col("id").alias("n"),
    ).localCheckpoint()  # deterministic id, materialized once
    files.sink_jdbc(base.select("id_match", "n"), derby_url,
                    "PARENT", mode="overwrite", driver=DRIVER)
    files.sink_jdbc(base.select("id_match", (F.col("n") * 10).alias("v")),
                    derby_url, "CHILD", mode="overwrite", driver=DRIVER)
    p = files.read_jdbc(spark, derby_url, "PARENT", driver=DRIVER)
    c = files.read_jdbc(spark, derby_url, "CHILD", driver=DRIVER)
    joined = p.join(c, "id_match")
    assert joined.count() == 30
    assert joined.filter(F.col("v") != F.col("n") * 10).count() == 0
