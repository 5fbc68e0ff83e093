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


def test_merge_keyed_upsert_and_idempotent_replay(spark, tmp_path):
    out = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], ["k", "v", "ver"])
    base.write.parquet(out)

    updates = spark.createDataFrame(
        [(2, "b2", 20), (4, "d", 20)], ["k", "v", "ver"])
    files.merge_keyed(spark, out, updates, ["k"], "ver")
    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(out).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}

    # replaying the same batch must change nothing (idempotent reload)
    files.merge_keyed(spark, out, updates, ["k"], "ver")
    again = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(out).collect()}
    assert again == got


def test_compact_reduces_file_count(spark, tmp_path):
    out = str(tmp_path / "frag")
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    df.repartition(32).write.parquet(out)
    import glob
    assert len(glob.glob(out + "/part-*")) == 32

    n = files.compact(spark, out, target_rows_per_file=500)
    assert n == 2
    assert len(glob.glob(out + "/part-*")) == 2
    assert spark.read.parquet(out).count() == 1000


def test_write_sorted_yields_disjoint_file_ranges(spark, tmp_path):
    out = str(tmp_path / "clustered")
    df = spark.range(0, 10_000).withColumnRenamed("id", "k") \
        .withColumn("k", (F.col("k") * 7919) % 10_000)  # scrambled input
    files.write_sorted(df, out, ["k"], n_files=4)

    import glob
    import pyarrow.parquet as pq
    ranges = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        ki = next(i for i in range(md.num_columns)
                  if md.row_group(0).column(i).path_in_schema == "k")
        mins = [md.row_group(g).column(ki).statistics.min
                for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(ki).statistics.max
                for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # files cover disjoint key ranges -> footer stats alone skip files
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo
    assert spark.read.parquet(out).count() == 10_000


def test_merge_keyed_partitioned_touches_only_update_partitions(spark, tmp_path):
    out = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "a", 10, "p1"), (2, "b", 10, "p1"), (3, "c", 10, "p2")],
        ["k", "v", "ver", "part"])
    base.write.partitionBy("part").parquet(out)

    import glob
    import os
    p2_files = {f: os.path.getmtime(f)
                for f in glob.glob(out + "/part=p2/*.parquet")}

    updates = spark.createDataFrame(
        [(2, "b2", 20, "p1"), (4, "d", 20, "p1")], ["k", "v", "ver", "part"])
    merged = files.merge_keyed_partitioned(
        spark, out, updates, ["k"], "ver", "part")
    assert merged == ["p1"]

    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(out).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}
    # p2's files were not rewritten
    assert {f: os.path.getmtime(f)
            for f in glob.glob(out + "/part=p2/*.parquet")} == p2_files
