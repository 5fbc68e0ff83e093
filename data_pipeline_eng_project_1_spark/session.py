"""SparkSession factory tuned for this engine.

Local mode is the test bed; the config story is written for a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions sized to the parallelism at hand, UTC session timezone so
timestamp semantics match the DuckDB oracle, and Arrow enabled so the few
Pandas-UDF paths (multimodal decode) transfer columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime (non-static) confs applied even when the caller hands us an
# existing session — e.g. the verification driver builds its own.
_RUNTIME_CONFS: dict[str, str] = {
    # The fixture `events` table stores TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects; read as long nanos and convert (sources/catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # InferFiltersFromGenerate synthesizes `size(arr) > 0` from every
    # explode() and predicate-pushdown then drags that filter — with the
    # generator child's WHOLE expression tree substituted in — below the
    # spread repartitions to the scan. For this engine's text operators
    # the exploded array is a computed tokenize/shingle pipeline, so the
    # inferred filter re-evaluates that pipeline per row at the scan
    # (pre-spread, so also at scan parallelism) for the sole benefit of
    # dropping rows whose array would explode to nothing — rare in real
    # corpora and cheap to drop at the Generate itself. Measured r16
    # (sf0.1, same-session A/B): corpus_decontamination 3.73→1.33 s,
    # corpus_vocab_growth 0.75×, text_bigram_lm_perplexity 0.86×,
    # text_ngram_novelty 0.91×; no query slowed beyond noise. Purely an
    # optimizer-rule exclusion — plans stay semantics-identical.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
}


def default_parallelism() -> int:
    """Worker-thread count: $SPARK_GRAFT_CPUS, else all cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def apply_runtime_confs(spark: SparkSession,
                        shuffle_partitions: int | None = None) -> SparkSession:
    """Apply session-level confs this engine depends on to any session.

    Safe to call on a session we did not build (the driver's); every key
    here is a runtime SQLConf, not a static one.

    Shuffle width is sized to the session's actual parallelism rather
    than Spark's default 200: on a local[N] test/verify session a
    200-partition shuffle is pure task-scheduling overhead with zero
    parallelism gain (AQE coalesces the excess anyway, but only after
    paying the map-side split). On a real cluster the same rule gives
    ~1× executor cores — the get_spark docstring notes production would
    use 2-3× and let AQE coalesce. The parallelism-sized default is only
    applied when the shuffle width is still Spark's out-of-the-box 200 —
    an explicitly tuned value (ours via ``shuffle_partitions``, or one
    already set on an externally built session) is left alone.
    """
    for k, v in _RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(shuffle_partitions))
    elif spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(spark.sparkContext.defaultParallelism))
    return spark


def get_spark(app_name: str = "data_pipeline_eng_project_1_spark",
              cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Shuffle partitions default to the core count: at local scale the Spark
    default of 200 over-fragments tiny shuffles; on a real cluster this would
    be ~2-3x total executor cores (and AQE coalesces the rest).
    """
    n = cores or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        # Task-retry budget — the engine-level analogue of the reference's
        # Airflow retry policy (retries: 5, dag_pipeline.py:19-23). Retries
        # are safe because every sink here is idempotent (checkpointed
        # streaming + merge_keyed batch restarts, sources/files.py). Static
        # conf: must be set at session build, not per-query.
        .config("spark.task.maxFailures",
                os.environ.get("SPARK_GRAFT_TASK_RETRIES", "4"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # Whole-stage codegen emits one large generated class per plan
        # shape; a many-query session (100-query bench/harness, or a real
        # multi-tenant driver) overflows the JVM's default 240 MB code
        # cache, and C2 silently stops compiling — measured ~20-70% slowdown
        # on late-session queries. Static conf: set at JVM start.
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=512m")
        # The compiled-codegen-class cache defaults to 100 entries; a
        # many-query session generates several classes per plan, so by
        # mid-walk the cache is evicting shapes that later queries (and
        # every round of an iterative operator) would otherwise reuse —
        # each miss is a full Janino+JIT recompile, the dominant
        # first-execution cost at small scale. Static conf: JVM start.
        .config("spark.sql.codegen.cache.maxEntries", "3000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Files: pack small fixture files into few partitions, but keep the
        # knob visible — at 100 TB this is the scan-granularity control.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    spark = builder.getOrCreate()
    apply_runtime_confs(spark, shuffle_partitions=shuffle_partitions or n)
    spark.sparkContext.setLogLevel("WARN")
    return spark
