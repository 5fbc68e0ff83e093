"""Incremental file intake + archive lifecycle.

The reference polls a GCS bucket every 8 hours, re-listing the whole bucket
(the recency filter is commented out — dags/utils.py:367-383), then moves each
processed file to a second bucket as a poor-man's checkpoint
(move_file, dags/utils.py:31-52; main.py:62-90). That design is O(bucket) per
run and at-least-once (crash between load and move ⇒ duplicate rows).

Spark-first replacements, in preference order:

1. Structured Streaming file source (streaming/pipeline.py) — exactly-once
   discovery via checkpoint, optional ``cleanSource=archive`` = move_file.
2. Batch ``modifiedAfter`` reader option (below) — the fixed version of the
   reference's "files published today" listing (main.py:34-56), pushed into
   the DataSource so listing happens once, driver-side, cheaply.
3. Explicit driver-side archive for batch mode (below) — same observable
   behavior as move_file but applied AFTER a successful bulk write, so the
   at-least-once window shrinks to the archive step alone.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json_modified_after(spark: SparkSession, schema: T.StructType,
                             src_dir: str, modified_after: datetime,
                             multiline: bool = True) -> DataFrame:
    """Batch incremental intake: only files newer than the watermark.

    Equivalent to the blob.updated date filter at main.py:51-52, but executed
    by Spark's file index (no per-file HTTPS metadata round-trips) and exact
    to the second.
    """
    ts = modified_after.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    return (
        spark.read.schema(schema)
        .option("multiLine", str(multiline).lower())
        .option("modifiedAfter", ts)
        .json(src_dir)
    )


def list_files(src_dir: str, suffix: str = ".json") -> list[str]:
    """Work-queue listing (reference: get_files_published_today,
    dags/utils.py:367-383). Local-fs stand-in for the GCS list_blobs call."""
    return sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(suffix)
    )


def write_partitioned(df, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet layout: one directory level per
    partition column value. Readers filtering on those columns scan only
    the matching directories (partition pruning — `PartitionFilters` in the
    plan, zero I/O for pruned values). At 100 TB this is the first-order
    data-skipping lever: partition by the dominant filter axis (ingest
    date, source, language), keep cardinality modest so files stay large,
    and leave fine-grained skipping to parquet row-group stats."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def archive_file(src_path: str, archive_dir: str) -> str:
    """Move one processed file to the archive dir (reference: move_file,
    dags/utils.py:31-52 — copy to used-bucket then delete source).

    Call only after the batch write has committed; the move itself is the
    only remaining at-least-once window (same as the reference, minus its
    per-row failure modes).
    """
    os.makedirs(archive_dir, exist_ok=True)
    dst = os.path.join(archive_dir, os.path.basename(src_path))
    shutil.move(src_path, dst)
    return dst


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None,
                      recursive: bool = True) -> DataFrame:
    """Ingest raw files (images/audio/video blobs) as binary rows via
    Spark's built-in ``binaryFile`` source: (path, modificationTime,
    length, content binary) — the intake step of the multimodal
    pipeline, feeding operators/multimodal.py (sniff_modality on the
    magic bytes, PPM/BMP decode, frame sampling) without any driver-side
    file walking.

    Scale notes: one file never splits (a blob is atomic), so
    parallelism = file count and a 100 TB media corpus wants the
    many-small-files layout it naturally has; oversized single blobs are
    bounded by spark.sql.sources.binaryFile.maxLength (2 GB hard cap —
    segment bigger media upstream). ``glob`` maps to pathGlobFilter
    (pushdown file pruning by extension); modifiedAfter/modifiedBefore
    options compose for incremental intake just like the JSON source.
    """
    r = (spark.read.format("binaryFile")
         .option("recursiveFileLookup", str(recursive).lower()))
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_text_corpus(spark: SparkSession, path: str, whole: bool = True,
                     glob: str | None = None,
                     recursive: bool = True) -> DataFrame:
    """Ingest raw text files as a document corpus: ``whole=True`` maps
    ONE FILE -> ONE DOC (wholetext mode, (path, text) rows — the shape
    crawl dumps and plain-text corpora arrive in, feeding the dedup /
    quality / tokenize ladder directly); ``whole=False`` maps one LINE
    -> one row (JSONL-adjacent log shape, splittable scans).

    Scale notes: wholetext files are atomic like binary blobs (one task
    per file, never split — segment giant files upstream), while line
    mode splits normally under maxPartitionBytes. ``glob`` maps to
    pathGlobFilter for extension pruning; the path column is the
    natural stable doc id (`xxhash64(path)` for a numeric key).
    """
    r = (spark.read.format("text")
         .option("wholetext", str(whole).lower())
         .option("recursiveFileLookup", str(recursive).lower()))
    if glob:
        r = r.option("pathGlobFilter", glob)
    return (r.load(path)
            .select(F.input_file_name().alias("path"),
                    F.col("value").alias("text")))


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    """CSV export for interchange with non-parquet consumers. CSV is a
    last-resort format at scale (no column pruning, no predicate pushdown,
    full-file parse) — keep parquet as the working format and treat this
    as an edge sink."""
    df.write.option("header", header).mode(mode).csv(path)


def read_csv(spark: SparkSession, schema: T.StructType, path: str,
             header: bool = True) -> DataFrame:
    """Schema-explicit CSV read: no inference pass over the data (inference
    costs one full extra scan and guesses types from a sample — the same
    trap as the reference's pd.read_json inference, dags/utils.py:81)."""
    return (spark.read.schema(schema)
            .option("header", header)
            .option("mode", "PERMISSIVE")
            .csv(path))


def merge_keyed(spark: SparkSession, table_dir: str, updates: DataFrame,
                keys: list[str], order_col: str) -> None:
    """Keyed upsert into a parquet table: union existing rows with updates,
    keep the row with the greatest `order_col` per key, rewrite. This is
    the idempotent-reload primitive the reference lacks — its at-least-once
    intake re-INSERTs rows on retry (SURVEY.md §2.7, dags/utils.py:107);
    replaying the same batch through merge_keyed is a no-op.

    Plan: one shuffle on the keys (window rank), one write. Scale path:
    pair with a partitioned layout (write_partitioned) and merge only the
    partitions the update batch touches — rewrite cost tracks batch size,
    not table size. (A table format with row-level merge — Delta/Iceberg —
    replaces the rewrite when available; the dedup semantics stay the same.)
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    existing = spark.read.schema(updates.schema).parquet(table_dir)
    merged = existing.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )
    # Parquet cannot be overwritten in place from a plan that still reads
    # it: localCheckpoint (eager) materializes first, then the write reads
    # the checkpoint, not the files being replaced.
    staged = latest.localCheckpoint()
    staged.write.mode("overwrite").parquet(table_dir)


def compact(spark: SparkSession, table_dir: str,
            target_rows_per_file: int = 1_000_000) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(rows / target_rows_per_file) files. Streaming sinks and frequent
    merges accrete small files; at scale the file count — not the byte
    count — throttles the scan (one task + one open per file, tiny
    row-groups defeat column-chunk skipping). Returns the file count
    written. Run where a real deployment would schedule it: off the hot
    path, per partition directory."""
    df = spark.read.parquet(table_dir)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    staged = df.repartition(n_files).localCheckpoint()
    staged.write.mode("overwrite").parquet(table_dir)
    return n_files


def write_sorted(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 8, mode: str = "overwrite") -> None:
    """Range-clustered parquet layout: repartitionByRange gives each output
    file a disjoint value range of `cols`, sortWithinPartitions orders rows
    inside, so parquet row-group min/max stats become tight, disjoint
    intervals. Readers filtering on `cols` then skip whole files and
    row-groups from footer stats alone — the poor man's cluster/Z-order,
    and the second data-skipping lever after directory partitioning
    (write_partitioned). Range boundaries come from a sampled sketch of the
    data (one extra narrow pass), so skew in `cols` spreads evenly."""
    (df.repartitionByRange(n_files, *cols)
       .sortWithinPartitions(*cols)
       .write.mode(mode).parquet(path))


def merge_keyed_partitioned(spark: SparkSession, table_dir: str,
                            updates: DataFrame, keys: list[str],
                            order_col: str, partition_col: str) -> list:
    """merge_keyed's scale path: the table is Hive-partitioned on
    `partition_col`, and only the partitions present in the update batch
    are read, merged, and rewritten — via dynamic partition overwrite, so
    untouched partition directories are not touched. Rewrite cost tracks
    the update batch's partition footprint, not the table size. Returns the
    list of partition values merged.

    Requires the natural constraint that a key never moves between
    partitions (partition_col is derived from the key or immutable).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    existing = (
        spark.read.schema(updates.schema).parquet(table_dir)
        .filter(F.col(partition_col).isin(parts))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    latest = (
        existing.unionByName(updates)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    ).localCheckpoint()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (latest.write.mode("overwrite")
         .partitionBy(partition_col).parquet(table_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return parts


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                max_records_per_file: int = 0,
                compression: str | None = None) -> None:
    """Line-delimited JSON corpus export (one object per line) — the
    interchange format tokenizer/training loaders ingest. Spark's json
    sink IS JSONL: one document per line, written partition-parallel.

    ``max_records_per_file`` bounds file size WITHOUT a repartition (each
    task rolls to a new file at the limit) — the knob that prevents both
    the giant-file and the 10k-tiny-files failure modes when exporting a
    100 TB corpus. JSONL is an edge sink like CSV: ~3-5x parquet bytes, no
    pruning, no pushdown — keep parquet as the working format.
    """
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, schema: T.StructType,
               path: str) -> DataFrame:
    """Schema-explicit JSONL read — no inference pass (inference costs a
    full extra scan; same trap as the reference's pd.read_json,
    dags/utils.py:81). PERMISSIVE mode nulls malformed lines instead of
    failing the job."""
    return (spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .json(path))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink: the other first-class columnar format (zstd-compressed by
    Spark default codec settings, stripe-level stats). Same scale
    properties as parquet — column pruning + predicate pushdown — for
    consumers standardized on ORC (Hive-lineage warehouses)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; pruning/pushdown arrive via the native vectorized reader
    exactly as with parquet (verified in tests/test_sources_formats.py)."""
    return spark.read.orc(path)


def write_zorder(df: DataFrame, path: str, cols: list[str],
                 bits: int = 8, partitions: int | None = None) -> None:
    """Z-order (Morton-curve) clustered parquet write: rows are sorted by
    the bit-interleaving of their per-column bucket codes, so rows close
    in ANY of ``cols`` land in the same row groups and parquet min/max
    stats prune scans filtered on ANY of them — where a plain sort only
    prunes its leading column. This is the lakehouse multi-dimensional
    clustering trick (Delta OPTIMIZE ZORDER BY), built from primitives:

    - per-column [min, max] comes from ONE aggregate (driver metadata);
    - each value maps to a ``bits``-bit equal-width bucket in codegen
      (``width_bucket``; a production variant would use approxQuantile
      cuts for heavy skew — same plan, different boundaries);
    - the z-value interleaves bucket bits with shift/mask column algebra
      (no UDF), and ``repartitionByRange(z) + sortWithinPartitions(z)``
      is an ordinary distributed sort — at 100 TB this is exactly one
      extra shuffle at write time, bought back on every filtered read.

    Verified in tests/test_zorder.py: per-row-group min/max spans on BOTH
    dimensions shrink vs an unclustered write, and the data round-trips
    bit-identically."""
    def _numeric(field):
        """Clustering expression for one column: numerics as-is, temporals
        epoch-cast in-engine (days for dates, seconds for timestamps) —
        time is the single most common clustering dimension, so making
        callers pre-cast it by hand was pure friction. Bucketing only
        needs a monotone map to doubles; the stored column is untouched."""
        dt, c = field.dataType, F.col(field.name)
        if isinstance(dt, T.NumericType):
            return c.cast("double")
        if isinstance(dt, T.DateType):
            return F.unix_date(c).cast("double")
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return (F.unix_micros(c.cast("timestamp")) / 1e6).cast("double")
        raise ValueError(
            f"write_zorder clustering column {field.name!r} has type "
            f"{dt.simpleString()}; only numeric, date, and timestamp "
            "columns can be range-bucketed")

    zcols = {f.name: _numeric(f) for f in df.select(*cols).schema.fields}
    stats = df.agg(*[f(zcols[c]).alias(f"{tag}_{c}")
                     for c in cols for tag, f in (("min", F.min), ("max", F.max))]
                   ).first()
    if any(stats[f"min_{c}"] is None for c in cols):
        # Empty input or an all-NULL clustering column: no range to bucket,
        # so fall back to a plain write (still correct, just unclustered).
        df.write.mode("overwrite").parquet(path)
        return
    nb = 1 << bits
    codes = []
    for c in cols:
        lo, hi = float(stats[f"min_{c}"]), float(stats[f"max_{c}"])
        hi = hi if hi > lo else lo + 1.0
        # width_bucket: 1..nb inside the range -> 0-based, clamped
        codes.append(
            F.least(F.lit(nb - 1), F.greatest(F.lit(0),
                    F.width_bucket(zcols[c],
                                   F.lit(lo), F.lit(hi), F.lit(nb)) - 1)))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, code in enumerate(codes):
            z = z + ((F.shiftright(code.cast("long"), i).bitwiseAND(F.lit(1)))
                     .cast("long") * F.lit(1 << (i * len(codes) + d)))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    (df.withColumn("__z", z)
       .repartitionByRange(n, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def sink_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
              batchsize: int = 10_000,
              isolation_level: str = "READ_COMMITTED",
              num_partitions: int | None = None,
              driver: str | None = None,
              options: dict[str, str] | None = None) -> None:
    """Warehouse/JDBC sink — the Spark-native analogue of the reference's
    terminal Snowflake load (/root/reference/dags/utils.py:184-224, batch
    variant etl_functions.py:158-190), with its anti-patterns designed out:

    - BULK batched inserts: each partition streams `batchsize`-row
      executemany batches over one connection — vs the reference's per-row
      INSERT + time.sleep(2) + per-row `SELECT ... ORDER BY DATE_LOAD DESC
      LIMIT 1` id read-back (≤0.5 rows/s, race-prone under concurrency).
    - IDs are minted IN-ENGINE before the write (plans/flashscore.py's
      deterministic sha2 key), so parent/child tables share the key by
      construction and nothing is ever read back from the warehouse.
    - `num_partitions` caps concurrent connections (a 1000-executor
      cluster must not open 32k warehouse sessions): Spark coalesces to
      at most that many partitions before writing.
    - `isolation_level` maps straight to the JDBC option (NONE disables
      transactions for append-only bulk loads where the warehouse
      dedups/stages anyway).

    Retries compose with merge_keyed-style idempotent targets: a replayed
    partition re-inserts the same engine-minted keys, which a keyed
    MERGE/upsert target collapses — the at-least-once duplicate window of
    the reference (SURVEY.md §2.7) closes in the sink contract, not the
    scheduler."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int | None = None,
              driver: str | None = None,
              options: dict[str, str] | None = None) -> DataFrame:
    """JDBC source with parallel range reads: when ``partition_column`` +
    bounds are given, Spark issues ``num_partitions`` bounded range
    queries instead of one single-connection full scan — the difference
    between a distributed ingest and a driver-shaped straw at warehouse
    scale. Catalyst pushes filters/column pruning into the remote SQL."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions or 8)))
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
