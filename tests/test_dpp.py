"""Dynamic partition pruning: the partition-layout half of the 100 TB scan
story.

A date/key-partitioned fact joined to a filtered dimension must not scan
every fact partition: Spark plans a DPP subquery (dynamicpruning#N) that
evaluates the dim filter first and prunes fact directories at runtime. On a
100 TB fact partitioned by day, this is the difference between reading 3
days and reading 10 years.
"""

import pytest
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.sources import catalog, files

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fact_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dpp") / "events_by_type")
    ev = catalog.load_table(spark, "events", SF_DIR)
    files.write_partitioned(ev, out, ["event_type"])
    return out


def test_dpp_subquery_prunes_fact_partitions(spark, fact_dir):
    # DPP is on by default in Spark 3+/4; assert rather than set, so the
    # shared session conf is never mutated (no leak into later tests).
    assert spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled") == "true"
    fact = spark.read.parquet(fact_dir)
    # dim filtered on a NON-join column: the surviving etype set is only
    # known at runtime, so static constant-propagation can't prune — this
    # is the exact shape DPP exists for. (A literal filter on the join
    # column itself gets constant-folded into a static PartitionFilter,
    # see the test below.)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 3.0)],
        ["etype", "weight"],
    ).filter(F.col("weight") > 2.0)

    joined = fact.join(dim, fact.event_type == dim.etype).groupBy(
        "event_type").agg(F.round(F.sum(F.col("value") * F.col("weight")), 2)
                          .alias("weighted"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan
    assert "PartitionFilters" in plan

    # Semantics unchanged by the pruning: equals the unpartitioned compute.
    ev = catalog.load_table(spark, "events", SF_DIR)
    expect = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(F.round(F.sum(F.col("value") * 3.0), 2).alias("weighted"))
        .collect()[0]["weighted"]
    )
    got = joined.collect()
    assert len(got) == 1
    assert got[0]["weighted"] == expect


def test_static_partition_filter_still_prunes(spark, fact_dir):
    # The degenerate case: a literal filter on the partition column needs no
    # DPP machinery — it must land in PartitionFilters at plan time.
    fact = spark.read.parquet(fact_dir)
    one = fact.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan, plan  # clean assert, not IndexError
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "event_type" in part_filters
