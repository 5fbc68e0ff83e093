"""bloom_prune: no false negatives ever, effective pruning on selective
build sides, and a probe side that is never shuffled (broadcast semi joins
only — the property that makes the operator a runtime filter at scale)."""

from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.operators import relational


def _probe_build(spark):
    probe = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("payload"))
    # build keys: a sparse, disjoint-ish subset (every 400th key) plus some
    # keys outside the probe domain
    build = spark.range(0, 25000, 400).select(F.col("id").alias("bk"))
    return probe, build


def test_no_false_negatives(spark):
    probe, build = _probe_build(spark)
    pruned = relational.bloom_prune(probe, build, "k", "bk",
                                    n_bits=1 << 14, k=2)
    true_matches = probe.join(build, probe.k == build.bk, "left_semi")
    # every true match survives the bloom
    missing = true_matches.join(pruned, "k", "left_anti").count()
    assert missing == 0
    assert true_matches.count() == 50  # 0,400,...,19600


def test_pruning_is_effective(spark):
    probe, build = _probe_build(spark)
    pruned = relational.bloom_prune(probe, build, "k", "bk",
                                    n_bits=1 << 14, k=2)
    n_pruned, n_probe = pruned.count(), probe.count()
    # 63 build keys x 2 seeds in 16384 bits -> fp rate well under 1%;
    # allow 10x slack before calling the filter ineffective
    assert n_pruned <= 50 + n_probe * 0.01 * 10


def test_probe_side_never_shuffles(spark):
    probe, build = _probe_build(spark)
    pruned = relational.bloom_prune(probe, build, "k", "bk",
                                    n_bits=1 << 14, k=2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") == 2
    assert "SortMergeJoin" not in plan
    # every hash-partitioning exchange is the build-side distinct (on _bit,
    # once per semi join in the printed plan; AQE reuses it at runtime) —
    # the probe flows broadcast-join to broadcast-join unshuffled
    segs = plan.split("Exchange hashpartitioning(")[1:]
    assert segs and all(seg.split(",")[0].startswith("_bit") for seg in segs)
