"""Partitioned-layout writes and partition pruning."""

from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.sources import catalog, files

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    ev = catalog.load_table(spark, "events", SF_DIR)
    out = str(tmp_path / "ev_by_type")
    files.write_partitioned(ev, out, ["event_type"])

    back = spark.read.parquet(out)
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # The filter must land in PartitionFilters (directory-level skip),
    # not PushedFilters (row-group-level) — pruned partitions cost zero I/O.
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1].split("]")[0]

    expect = ev.filter(F.col("event_type") == "click").count()
    assert one.count() == expect


def test_partitioned_roundtrip_preserves_rows(spark, tmp_path):
    ev = catalog.load_table(spark, "events", SF_DIR)
    out = str(tmp_path / "ev_rt")
    files.write_partitioned(ev, out, ["event_type"])
    assert spark.read.parquet(out).count() == ev.count()


def test_csv_roundtrip_schema_explicit(spark, tmp_path):
    o = catalog.load_table(spark, "orders", SF_DIR).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    out = str(tmp_path / "orders_csv")
    files.write_csv(o, out)
    back = files.read_csv(spark, o.schema, out)
    assert back.schema == o.schema  # explicit schema, no inference drift
    a = {tuple(r) for r in o.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
