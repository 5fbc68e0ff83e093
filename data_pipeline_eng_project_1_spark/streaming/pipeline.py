"""Structured Streaming: the engine-native form of the reference's intake.

The reference hand-rolls incremental processing: an Airflow cron lists a
bucket every 8 h (dags/dag_pipeline.py:33, dags/utils.py:367-383), a serial
loop transforms+loads each file (dags/utils.py:350-365), and `move_file`
archives processed blobs as a poor-man's checkpoint (dags/utils.py:31-52).
Crash between load and move ⇒ duplicate rows: at-least-once with no dedup.

Structured Streaming replaces every piece:

| reference                          | here                                  |
|------------------------------------|---------------------------------------|
| cron poll + full bucket relist     | file source incremental listing       |
| move_file archive "checkpoint"     | checkpoint dir (exactly-once) +       |
|                                    | optional cleanSource=archive          |
| serial per-file loop               | partition-parallel micro-batches      |
| duplicate rows on crash            | idempotent restart from checkpoint    |
| no late-data story                 | watermarks + windowed aggregation     |

Batch/stream parity: the SAME transform functions (plans/flashscore.py)
apply to the streaming DataFrame — one definition of the logic, two
execution modes. `trigger(availableNow=True)` gives the scheduled-batch
cadence of the reference (run under any scheduler, drain everything new,
stop) with streaming's bookkeeping.

At 100 TB: `maxFilesPerTrigger` bounds micro-batch size; state stores back
the windowed/session aggs (RocksDB provider on a real cluster); watermarks
bound state growth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_pipeline_eng_project_1_spark.plans import flashscore
from data_pipeline_eng_project_1_spark.sources.json_source import MATCH_SCHEMA

#: events-stream schema (ts as epoch-millis long: fixture parity, and no
#: parquet-NANOS hazard on the streaming path).
EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


# ---------------------------------------------------------------------------
# Flashscore intake (reference pipeline, streaming form)
# ---------------------------------------------------------------------------


def stream_matches(spark: SparkSession, src_dir: str,
                   max_files_per_trigger: int | None = None,
                   archive_dir: str | None = None,
                   source_format: str = "json") -> DataFrame:
    """Streaming source over a directory of flashscore dumps (JSON, or
    the same records published as XML — sources/xml_source.py's batch
    contract, streamed).

    `archive_dir` enables cleanSource=archive — the exact observable
    behavior of the reference's move_file, but applied only after the
    checkpoint has committed the batch.
    """
    reader = (
        spark.readStream.schema(MATCH_SCHEMA)
        .option("mode", "PERMISSIVE")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if archive_dir:
        reader = (reader.option("cleanSource", "archive")
                  .option("sourceArchiveDir", archive_dir))
    if source_format == "json":
        return reader.option("multiLine", "true").json(src_dir)
    if source_format == "xml":
        return reader.format("xml").option("rowTag", "match").load(src_dir)
    raise ValueError(f"stream_matches: unknown source_format"
                     f" {source_format!r}")


def run_matches_pipeline(spark: SparkSession, src_dir: str, out_dir: str,
                         checkpoint_dir: str,
                         archive_dir: str | None = None,
                         source_format: str = "json") -> StreamingQuery:
    """Drain all new files into the four output tables, then stop
    (availableNow ≙ one scheduled run of the reference DAG).

    foreachBatch fans one micro-batch out to all four sinks; the transform
    subtree is shared and the deterministic ID_MATCH (flashscore.match_id)
    keeps parent/child keys consistent across sinks AND across retries —
    a replayed batch overwrites itself instead of duplicating.
    """
    src = stream_matches(spark, src_dir, archive_dir=archive_dir,
                         source_format=source_format)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        tables = flashscore.transform_all(batch_df)
        for name, tdf in tables.items():
            (tdf.withColumn("__batch_id", F.lit(batch_id))
             .write.mode("append").parquet(f"{out_dir}/{name}"))

    return (
        src.writeStream
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Event-stream analytics (windowed aggregation + sessionization)
# ---------------------------------------------------------------------------


def stream_events(spark: SparkSession, src_dir: str) -> DataFrame:
    """JSON event stream with an event-time timestamp column."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(src_dir)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts/sums per event type, late data bounded by the
    watermark (batch twin: plans/queries.py::events_tumbling_1h)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Sliding-window counts per event type: each event lands in
    window/slide overlapping windows (2 here), giving a smoothed rate
    readout that tumbling windows quantize away. State per open window is
    bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Native session windows per user (state-store backed; the batch twin
    is operators/relational.py::sessionize's lag+running-sum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id", "n_events")
    )


def trending_tokens_stream(docs: DataFrame, window: str = "1 hour",
                           watermark: str = "30 minutes",
                           min_count: int = 3,
                           ts_col: str = "ts",
                           text_col: str = "text") -> DataFrame:
    """Streaming twin of the text_heavy_hitters rung: per-tumbling-window
    frequent tokens over an arriving document stream — the trending-terms
    monitor a live ingestion pipeline runs next to its quality gates (a
    token suddenly dominating a window flags a scraper loop or spam
    flood before it pollutes the corpus).

    Tokens explode scan-side from each micro-batch; the stateful
    aggregate is keyed on (window, token), so state is bounded by the
    watermark horizon times the ACTIVE vocabulary of the window — and a
    hot token is one state row with a counter, never a fan-out. The
    ``min_count`` gate applies to the windowed count, mirroring the
    batch query's N/s threshold in spirit (a per-window absolute floor —
    a streaming aggregate cannot see the final window total until the
    watermark closes it, so the corpus-relative form belongs to the
    batch op). Batch twin: plans/llm_ops.py::text_heavy_hitters.
    """
    from data_pipeline_eng_project_1_spark.functions import texts as _texts

    return (
        docs.withWatermark(ts_col, watermark)
        .select(F.col(ts_col),
                F.explode(_texts.tokens(F.col(text_col))).alias("token"))
        .groupBy(F.window(ts_col, window).alias("w"), "token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "token", "n")
    )


def token_drift_stream(docs: DataFrame, side_col: str = "side",
                       window: str = "1 hour",
                       watermark: str = "30 minutes",
                       ts_col: str = "ts",
                       text_col: str = "text") -> DataFrame:
    """Streaming twin of the text_kl_drift rung: per-tumbling-window
    token counts for TWO corpus slices (``side_col`` ∈ {0, 1} — e.g.
    reference crawl vs new source, or last week's mirror vs today's),
    emitted as the vocab-sized (window, term, cp, cq) frame the
    divergence is algebra over. The KL/JS scalar itself is one stateless
    aggregate per closed window — it belongs in the foreachBatch sink or
    a downstream batch job, because chaining a second stateful aggregate
    after a streaming aggregation is the shape Structured Streaming
    restricts, and the per-term frame is the more useful artifact anyway
    (it names WHICH terms drifted, not just how much).

    State is keyed on (window, term): bounded by the watermark horizon
    times the window's active vocabulary, both sides sharing one state
    row as conditional sums — the same one-pass shape as the batch op
    (plans/llm_ops.py::text_kl_drift), so 100 TB/day of arriving text
    reduces map-side per micro-batch before touching state.
    """
    from data_pipeline_eng_project_1_spark.functions import texts as _texts

    return (
        docs.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.col(side_col).alias("__side"),
                F.explode(_texts.tokenize_words(F.col(text_col)))
                .alias("term"))
        .groupBy(F.window(ts_col, window).alias("w"), "term")
        .agg(F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
             .alias("cp"),
             F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
             .alias("cq"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "term", "cp", "cq")
    )


def quality_gate_stream(docs: DataFrame, threshold: float = 0.5,
                        weights: dict | None = None,
                        text_col: str = "text") -> DataFrame:
    """Stateless curation-at-ingest: score every arriving document with
    the SAME linear quality classifier the batch gate applies
    (functions/texts.py::quality_score_of — one shared weight map, so
    the stream and the backfill can never disagree about a document),
    and flag keep = score >= threshold. Pure scan-side column algebra —
    no state store, no watermark, no shuffle: at ingest scale the gate
    rides the micro-batch's read stage. Empty docs (zero tokens) get
    score NULL and keep FALSE rather than being dropped: the dead-letter
    split (run_split_sink) routes them to the reject side for audit,
    matching the batch pipeline's quality-gate accounting."""
    from data_pipeline_eng_project_1_spark.functions import texts as _texts

    toks = _texts.tokens(F.col(text_col))
    score = F.when(
        F.size(toks) > 0,
        _texts.quality_score_of(F.col(text_col), toks, weights))
    return docs.withColumn("score", F.round(score, 4)) \
               .withColumn("keep", F.coalesce(score >= threshold,
                                              F.lit(False)))


def run_split_sink(df: DataFrame, predicate_col: str, pass_dir: str,
                   reject_dir: str, checkpoint_dir: str) -> StreamingQuery:
    """Dead-letter routing: drain a stream into TWO parquet directories —
    rows where ``predicate_col`` is true to ``pass_dir``, the rest to
    ``reject_dir`` — from ONE source read per micro-batch (foreachBatch
    caches the batch, writes both slices, then releases it; two separate
    writeStreams would double the source read and could diverge on
    retries). Rejected rows are data, not garbage: quality-gate
    failures, malformed records, and PII-flagged docs all need the
    audit trail the reference pipeline loses by filtering in place.

    Delivery: foreachBatch is AT-LEAST-ONCE (a crash between a side's
    write and the checkpoint commit replays the batch), so each side is
    partitioned by the stamped ``batch_id`` and written with DYNAMIC
    partition overwrite — a replayed batch rewrites its own partition
    instead of appending duplicates, which makes the sink idempotent
    (hence effectively exactly-once) for Structured Streaming's
    replayable-source contract (same batch_id => same rows). The one
    residue dynamic overwrite cannot clear: a replay whose recomputed
    batch has ZERO rows on a side leaves that side's earlier partial
    partition in place — unreachable under the deterministic-replay
    contract, identifiable by batch_id if a non-deterministic source
    breaks it.

    Layout note (changed in round 8): ``batch_id`` is a PARTITION
    directory, not a physical column — its type is re-INFERRED on read
    (int), and a sink directory written by the pre-r8 flat-append
    layout cannot be read together with this partitioned layout.
    Migrate old dirs by rewriting them once through
    ``partitionBy("batch_id")``, and read sides back with
    ``read_split_side`` (below), which pins batch_id to BIGINT so the
    read-back schema matches the long the writer stamped."""
    def write_both(batch: DataFrame, batch_id: int) -> None:
        batch = batch.withColumn("batch_id", F.lit(batch_id)).persist()
        try:
            for out_dir, pred in (
                    (pass_dir, F.col(predicate_col)),
                    (reject_dir, ~F.col(predicate_col)
                     | F.col(predicate_col).isNull())):
                batch.filter(pred).write.mode("overwrite") \
                     .option("partitionOverwriteMode", "dynamic") \
                     .partitionBy("batch_id").parquet(out_dir)
        finally:
            batch.unpersist()

    return (
        df.writeStream.foreachBatch(write_both)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_split_side(spark: SparkSession, side_dir: str) -> DataFrame:
    """Read one side (pass or reject) of a run_split_sink directory with
    the ``batch_id`` partition column pinned back to BIGINT — partition
    directory values are type-inferred on read (int), while the writer
    stamped a long; the explicit cast keeps the round-trip schema
    stable for downstream unions and joins on batch_id."""
    df = spark.read.parquet(side_dir)
    return df.withColumn("batch_id", F.col("batch_id").cast("long"))


def enrich_with_dim(events: DataFrame, dim: DataFrame,
                    on: str) -> DataFrame:
    """Stream-static left join: per-micro-batch broadcast hash join of the
    stream against a static dimension.

    Stateless — no watermark and no state store, because the static side
    is re-resolved every trigger; overwrite the dimension snapshot (e.g. a
    parquet dir maintained by a batch job) and the NEXT micro-batch joins
    against the fresh rows. ``broadcast`` keeps the stream side
    shuffle-free, the scale posture for dimension enrichment."""
    return events.join(F.broadcast(dim), on, "left")


def click_to_purchase(events: DataFrame, within_minutes: int = 15,
                      watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same user's
    click(s) in the preceding `within_minutes`.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so each side's buffered state is evicted once the other
    side's watermark passes the window — without the time bound a
    stream-stream join would buffer forever. Output schema:
    (user_id, click_ts, purchase_ts, purchase_value).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("value").alias("purchase_value"))
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return (
        clicks.join(purchases, cond)
        .select("user_id", "click_ts", "purchase_ts", "purchase_value")
    )


def dedup_events(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once-ish intake repair: drop replayed events by id within the
    watermark horizon.

    This is the streaming answer to the reference's crash-window duplicates
    (load succeeded, move_file didn't — SURVEY.md §2.7): re-delivered events
    carry the same event_id and are dropped as long as they arrive within
    the watermark; state is bounded because ids older than the horizon are
    evicted (plain dropDuplicates on a stream would grow state forever).
    """
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def dedup_documents_stream(docs: DataFrame, ts_col: str = "ts",
                           text_col: str = "text",
                           watermark: str = "1 hour") -> DataFrame:
    """Content-based dedup-on-arrival for a document stream: fingerprint
    the normalized text (operators/dedup.py::add_fingerprint — the same
    digest the batch dedup_exact groups on) and keep the first arrival of
    each fingerprint within the watermark horizon.

    This is the streaming rung of the §2.8 dedup ladder: exact-dup pages
    re-scraped within the horizon are dropped at intake, before they cost
    tokenization or near-dup candidate generation downstream. State is one
    16-byte digest per unique doc inside the horizon — bounded by the
    watermark, unlike a plain dropDuplicates which grows forever. Near-dup
    (MinHash/SimHash) stays a batch/compaction concern: its candidate join
    needs a corpus-wide index, not per-arrival state.
    """
    from data_pipeline_eng_project_1_spark.operators import dedup as _dedup

    return (
        _dedup.add_fingerprint(docs, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def known_content_stream(docs: DataFrame, reference: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Streaming twin of the exact rung of
    operators/dedup.py::incremental_dedup_flags: flag each ARRIVING doc
    whose normalized-text fingerprint already exists in a static
    reference corpus (``is_known``) — a sink/filter drops knowns at
    intake so re-crawled pages never cost tokenization or near-dup
    candidate generation downstream.

    Entirely STATELESS: the fingerprint is per-row column algebra and
    the stream-static left-outer join against the reference's distinct
    fingerprints re-plans each micro-batch, so a nightly-rebuilt corpus
    index is picked up without restarting the stream (and a small
    fingerprint set broadcasts). Compose with
    ``dedup_documents_stream`` for WITHIN-stream replays (that one needs
    watermark-bounded state; this one needs none). Near-dup screening
    stays a batch/compaction concern — its candidate join needs a
    corpus-wide index, not per-arrival state.
    """
    from data_pipeline_eng_project_1_spark.operators import dedup as _dedup

    ref = (_dedup.add_fingerprint(reference, text_col)
           .select("fingerprint").distinct()
           .withColumn("__k", F.lit(True)))
    return (
        _dedup.add_fingerprint(docs, text_col)
        .join(ref, "fingerprint", "left")
        .withColumn("is_known", F.coalesce("__k", F.lit(False)))
        .drop("__k")
    )


def semantic_hits_stream(vectors_stream: DataFrame, reference: DataFrame,
                         threshold: float = 0.4, num_cells: int = 16,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dim: int | None = None,
                         centroids: list[tuple[int, list[float]]] | None = None,
                         same_id_space: bool = True) -> DataFrame:
    """Streaming rung of semantic dedup: screen each ARRIVING embedding
    against a static reference corpus and emit its near-duplicate hits
    (arrival_id, ref_id, cosine) — a sink/filter drops arrivals with hits.

    Entirely STATELESS stream ops, so it runs at any arrival rate with
    zero state store: per-row cell assignment is a constant fan-out
    ``array_max`` over the C broadcast-able centroid scores (windows and
    groupBy aggs — the batch operator's shapes — aren't available on
    streams; an expression over driver-side centroid metadata is), then a
    stream-static equi-join on the cell id against the reference corpus
    pre-assigned by the SAME centroids (operators/similarity.assign_cells),
    with the exact-cosine filter on the joined pairs. The static side is
    re-plannable per micro-batch, so a nightly-rebuilt reference index is
    picked up without restarting the stream. Tiebreak (cos DESC, cid ASC)
    matches the batch operator bit-for-bit: struct comparison on
    (cos, -cid) maximizes cos first, then the smallest cid.

    ``same_id_space`` (default True) excludes ``arrival_id == ref_id``
    pairs — correct when the stream replays the reference corpus itself
    (a vector must not flag as its own duplicate). Pass False when
    arrivals and the reference assign ids INDEPENDENTLY: an arrival that
    happens to reuse a reference id is a coincidence there, and dropping
    the pair would silently skip screening it against that reference
    vector.
    """
    from data_pipeline_eng_project_1_spark.operators import similarity as _sim

    cents = (centroids if centroids is not None
             else _sim.ivf_centroids(reference, num_cells, id_col, vec_col))
    if dim is None:
        dim = len(cents[0][1])
    from data_pipeline_eng_project_1_spark.functions import vectors as _vec

    v = F.col(vec_col)
    vn = F.sqrt(_vec.dot(v, v, dim))

    def _cell_score(cid: int, cv: list[float]):
        import math
        cn = math.sqrt(sum(x * x for x in cv))
        cos = _vec.dot(v, F.array(*[F.lit(float(x)) for x in cv]), dim) \
            / (vn * F.lit(cn))
        return F.struct(cos.alias("cos"), F.lit(-cid).alias("negcid"))

    best = F.array_max(F.array(*[_cell_score(cid, cv) for cid, cv in cents]))
    arrivals = vectors_stream.select(
        F.col(id_col).alias("arrival_id"), v.alias("av"), vn.alias("an"),
        (-best["negcid"]).alias("cell"))

    ref = _sim.assign_cells(reference, cents, dim=dim, id_col=id_col,
                            vec_col=vec_col).select(
        F.col("match_id").alias("ref_id"), F.col("cv").alias("rv"),
        F.col("cn").alias("rn"), "cell")
    cos = _vec.dot(F.col("av"), F.col("rv"), dim) / (F.col("an") * F.col("rn"))
    joined = arrivals.join(ref, "cell")
    if same_id_space:
        joined = joined.filter(F.col("arrival_id") != F.col("ref_id"))
    return (
        joined.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("arrival_id", "ref_id", "cell", "cosine")
    )


def user_activity_stateful(events: DataFrame,
                           watermark: str = "30 minutes",
                           idle_timeout_ms: int = 1_800_000) -> DataFrame:
    """Custom stateful operator: per-user running activity profile via
    applyInPandasWithState — the escape hatch for stream logic that windowed
    aggs can't express (cross-batch running state with timeout-driven
    emission).

    Keeps (n_events, total_value, last_ts_ms) per user across micro-batches;
    emits a final profile when the user goes idle past `idle_timeout_ms`
    of EVENT time (event-time timeout: the timer fires when the watermark
    passes last_event + idle gap) — a "session summary on inactivity"
    pattern. Event-time timers are deterministic and replay-safe, and —
    unlike processing-time timers — don't keep an availableNow drain alive
    waiting on wall-clock timeouts. State is per-key and partitioned by the
    groupBy, so it scales horizontally; the watermark bounds state size.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("emitted_on", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_ms", T.LongType()),
    ])

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, total, last = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id, "n_events": n, "total_value": total,
                "last_ts_ms": last, "emitted_on": "timeout",
            }])
            return
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts_ms"].max()))
        state.update((n, total, last))
        state.setTimeoutTimestamp(last + idle_timeout_ms)
        yield pd.DataFrame([{
            "user_id": user_id, "n_events": n, "total_value": total,
            "last_ts_ms": last, "emitted_on": "update",
        }])

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout)
    )


def anomaly_stream(events: DataFrame, w: int = 20,
                   z_thresh: float = 3.0, min_n: int = 8,
                   watermark: str = "30 minutes") -> DataFrame:
    """Live twin of ``relational.rolling_anomaly`` (the graded batch
    query): per-user rolling z-score anomaly flags with BOUNDED state —
    applyInPandasWithState keeps only the last ``w`` values per user
    (a true O(w) ring, not the user's history), scores each arriving
    event against the trailing window of PRIOR values (strictly causal),
    and appends flagged rows.

    Ordering contract: rows are scored in (ts_ms, event_id) order WITHIN
    each micro-batch and in arrival order across batches — identical to
    the batch operator whenever a batch drains in-order data (pinned by
    the parity test); late rows inside the watermark are scored on
    arrival against the state as-of arrival, the standard
    streaming-vs-batch divergence every stateful op here documents.
    State is per-key and partitioned by the groupBy, so it scales
    horizontally; w bounds each key's state regardless of run length.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("roll_mean", T.DoubleType()),
        T.StructField("roll_std", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ])

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        vals = list(state.get[0]) if state.exists else []
        hits = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_ms", "event_id"])
            for ts_ms, event_id, value in zip(
                    pdf["ts_ms"], pdf["event_id"], pdf["value"]):
                if value is not None and not pd.isna(value):
                    n = len(vals)
                    if n >= min_n:
                        mean = sum(vals) / n
                        var = sum((x - mean) ** 2 for x in vals) / (n - 1)
                        sd = math.sqrt(var)
                        if sd > 1e-9:
                            z = (float(value) - mean) / sd
                            if abs(z) >= z_thresh:
                                hits.append({
                                    "user_id": user_id,
                                    "ts_ms": int(ts_ms),
                                    "event_id": int(event_id),
                                    "value": float(value),
                                    "n_prior": n,
                                    "roll_mean": round(mean, 6),
                                    "roll_std": round(sd, 6),
                                    "zscore": round(z, 4),
                                })
                    vals.append(float(value))
                    if len(vals) > w:
                        vals.pop(0)
        state.update((vals,))
        if hits:
            yield pd.DataFrame(hits)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout)
    )


def _round_half_up(x, nd: int):
    """Round a double exactly as Spark's F.round / DuckDB's round do:
    HALF_UP on the shortest decimal repr of the double (Spark's
    BigDecimal.valueOf goes through Double.toString, which is Python's
    repr). Python's built-in round() is banker's rounding and diverges
    on half-way decimals — which would break the stream twins'
    documented exact-parity contract with their batch operators
    (r11 advice finding).

    JVM caveat: pre-JDK-19 Double.toString can emit a non-shortest
    (but round-trip-exact) decimal for some doubles (JDK-4511638),
    which could in principle round differently at the cut position
    than Python's always-shortest repr. Empirically swept clean on
    this repo's Java 17: 240k mixed-magnitude + engineered-half-way
    values at 2/4/6 dp, zero mismatches vs F.round; the regression
    test pins a seeded 2k slice of that sweep per run."""
    import decimal
    import math

    if x is None:
        return None
    x = float(x)
    # F.round passes NaN/±inf through unchanged; Decimal.quantize would
    # raise InvalidOperation — short-circuit so a non-finite
    # state-derived value emits the batch-parity value instead of
    # killing the streaming query (r12 advice)
    if not math.isfinite(x):
        return x
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP))


def srm_stream(events: DataFrame, variant: str, expected: dict,
               chi2_threshold: float, experiment: str = "experiment",
               watermark: str = "30 minutes") -> DataFrame:
    """Live twin of ``relational.srm_check`` (banked r12): the
    sample-ratio-mismatch health gate running ON the assignment stream,
    so a broken splitter or logging path fires an alert while the
    experiment is still salvageable instead of at the post-hoc readout.
    Together with ``sprt_stream`` this completes the live experiment
    stack: this gate says whether the assignment can be trusted, the
    SPRT says when the result is decided.

    State per experiment is the k declared variants' cumulative counts
    — O(k) longs, arrival-order invariant (counts are a sum), so late
    data inside the watermark changes nothing about the terminal
    state. Each micro-batch emits the batch operator's exact output
    shape (one row per DECLARED variant: n, expected_share,
    observed_share, chi_term, chi2_total, dof, srm_flag) plus the
    experiment key and a monotone per-experiment ``look`` counter
    (kept in state), so rows accumulated in an append sink group into
    looks deterministically — select ``max(look)`` for the current
    state of each experiment (r11 advice: without it, looks could only
    be told apart by chi2 value, which can collide). Values are
    recomputed from the cumulative counts with the same formulas and
    the same HALF_UP rounding as F.round (``_round_half_up``) — after
    the final drain the rows equal ``srm_check`` run over the union of
    all drained data (pinned by the parity test). Chi-square is
    evaluated per LOOK, so a transient early-traffic flag can clear as
    counts grow (the standard monitoring caveat: SRM dashboards alert
    on PERSISTENT flags); unlike the SPRT this gate has no stopping
    rule to make sticky.

    An observed variant value not declared in ``expected`` (including
    NULL) fails the stream, mirroring the batch in-plan raise; a
    declared variant with zero arrivals so far still contributes its
    E*N chi term, exactly as the batch domain join does.

    Parameters are part of the checkpoint's meaning: the declared
    split is fingerprinted into every state row, so restarting with
    ANY different ``expected`` — resized, renamed, or reshared — fails
    loudly at the first arrival instead of silently re-interpreting
    the persisted counts. Start a fresh checkpoint when the split
    changes, as you would for a new experiment. (``chi2_threshold`` is
    excluded from the fingerprint: it gates the flag, not the state's
    meaning — tightening an alert threshold mid-run is legitimate.)
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if len(expected) < 2:
        raise ValueError("srm_stream: expected must declare >= 2 variants")
    shares = list(expected.values())
    if any(s <= 0 for s in shares):
        raise ValueError("srm_stream: expected shares must be > 0")
    if abs(sum(shares) - 1.0) > 1e-6:
        raise ValueError(
            f"srm_stream: expected shares must sum to 1, got {sum(shares)}")
    if chi2_threshold <= 0:
        raise ValueError("srm_stream: chi2_threshold must be > 0")
    # a stable (value, share) order keyed once here; state is the counts
    # array aligned with it. NATIVE value order, not str() order: the
    # batch operator's chi2 window sums terms ascending by the variant
    # column (Window.orderBy), and float addition is non-associative —
    # a str-sorted walk over 3+ numeric variants (e.g. [0, 10, 2]) can
    # differ from the batch sum by an ulp, and srm_flag compares the
    # UNROUNDED chi2 to the threshold (r12 review). Mixed-type variant
    # values raise here (loudly) instead of sorting arbitrarily.
    try:
        domain = sorted(expected.items(), key=lambda kv: kv[0])
    except TypeError:
        raise ValueError(
            "srm_stream: expected keys must be mutually orderable (same "
            "type) — the chi2 summation order is keyed on them; got "
            f"{sorted((type(k).__name__ for k in expected))} for keys "
            f"{list(expected)!r}") from None
    values = [k for k, _ in domain]
    shares = [float(v) for _, v in domain]
    dof = len(domain) - 1

    key_type = events.schema[experiment].dataType
    variant_type = events.schema[variant].dataType
    out_schema = T.StructType([
        T.StructField("experiment", key_type),
        T.StructField("look", T.LongType()),
        T.StructField("variant", variant_type),
        T.StructField("n", T.LongType()),
        T.StructField("expected_share", T.DoubleType()),
        T.StructField("observed_share", T.DoubleType()),
        T.StructField("chi_term", T.DoubleType()),
        T.StructField("chi2_total", T.DoubleType()),
        T.StructField("dof", T.IntegerType()),
        T.StructField("srm_flag", T.BooleanType()),
    ])
    state_schema = T.StructType([
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("look", T.LongType()),
        T.StructField("params", T.StringType()),
    ])
    # the declared split IS the meaning of the counts array: fingerprint
    # it into every state row so ANY restart under a different split —
    # resized, renamed, or reshared — fails loudly instead of silently
    # misattributing counts (the threshold is deliberately excluded: it
    # gates the flag, not the state's meaning)
    params_fp = repr([(str(v), s) for v, s in zip(values, shares)])

    def update(key, pdfs, state: GroupState):
        (exp,) = key
        if state.exists:
            counts, look, state_fp = (list(state.get[0]), state.get[1],
                                      state.get[2])
            if state_fp != params_fp:
                raise ValueError(
                    "srm_stream: checkpointed state was built under a "
                    f"different declared split ({state_fp}) than this "
                    f"run's ({params_fp}) — the split changed across a "
                    "restart; start a fresh checkpoint for the new "
                    f"split (experiment {exp!r})")
        else:
            counts, look = [0] * len(values), 0
        idx = {v: i for i, v in enumerate(values)}
        for pdf in pdfs:
            vc = pdf["__v"].value_counts(dropna=False)
            for val, cnt in vc.items():
                if pd.isna(val) or val not in idx:
                    raise ValueError(
                        "srm_stream: observed variant value not declared "
                        f"in expected: {'NULL' if pd.isna(val) else val!r}"
                        f" (experiment {exp!r})")
                counts[idx[val]] += int(cnt)
        look += 1
        state.update((counts, look, params_fp))
        total = sum(counts)
        terms = [(n - s * total) ** 2 / (s * total) if total > 0 else None
                 for n, s in zip(counts, shares)]
        chi2 = sum(terms) if total > 0 else None
        yield pd.DataFrame([{
            "experiment": exp, "look": look, "variant": v, "n": n,
            "expected_share": _round_half_up(s, 6),
            "observed_share": (_round_half_up(n / total, 6)
                               if total > 0 else None),
            "chi_term": _round_half_up(t, 6),
            "chi2_total": _round_half_up(chi2, 4),
            "dof": dof,
            "srm_flag": (chi2 > chi2_threshold) if chi2 is not None
                        else None,
        } for v, n, s, t in zip(values, counts, shares, terms)])

    return (
        events
        .select(F.col(experiment).alias("experiment"),
                F.col(variant).alias("__v"), F.col("ts"))
        .withWatermark("ts", watermark)
        .groupBy("experiment")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout)
    )


def sprt_stream(events: DataFrame, variant: str, success: Column,
                experiment: str = "experiment", lift_ratio: float = 1.5,
                alpha: float = 0.05, beta: float = 0.05,
                watermark: str = "30 minutes") -> DataFrame:
    """Live twin of ``relational.sprt_ab`` (banked r12): Wald sequential
    A/B monitoring as the experiment runs — which is what a SEQUENTIAL
    test is FOR; the batch form replays history, this form decides on
    the live stream.

    The reduction makes streaming trivial: the cumulative LLR is a SUM
    of per-success constants (ln(2q) per variant-1 success, ln(2(1-q))
    per variant-0), so state per experiment is O(1) — (n_succ,
    n_b_succ, llr, decision) — and the final LLR is arrival-order
    INVARIANT: late or reordered successes inside the watermark change
    nothing about the terminal value, unlike every windowed detector
    here. Each micro-batch is a "look"; Wald's boundary guarantees hold
    at every look by construction, so evaluating the crossing once per
    drained batch (after the batch's whole increment, mirroring the
    batch operator's per-BIN evaluation) keeps the stated alpha/beta.
    Decision granularity is the only batch/stream divergence: a
    crossing that retreats within one look is not seen (same caveat as
    a within-bin retreat in ``sprt_ab``), so WHICH look decides can
    differ from which bin decides while both remain valid SPRTs.

    The decision is STICKY: once a boundary is crossed the test is
    over, and contradicting later data moves ``llr_running`` (kept for
    observability) but never the decision — re-opening a decided
    sequential test forfeits its error guarantees. State is per-key and
    partitioned by the groupBy (one tiny row per experiment), so a
    thousand concurrent experiments cost a thousand state rows.
    Emits one row per experiment per micro-batch that saw data:
    (experiment, n_succ_total, n_b_succ_total, llr_running, decision).
    The count columns are deliberately NOT named like ``sprt_ab``'s
    ``n_succ``/``n_b_succ``: the batch columns are PER-BIN counts,
    these are CUMULATIVE totals — same-named they would invite a
    by-column-name misread across the twins (r11 advice). Only
    successes reach state, so ``n_succ_total`` strictly increases
    across a key's emitted rows — it doubles as the monotone look
    identifier for selecting the latest row from an append sink.

    Constants are computed once here with the same formulas as
    ``sprt_ab`` (q = r/(1+r) under the rate-ratio alternative
    p1 = r*p0), so a batch replay and this stream agree to float
    associativity (pinned at 6dp by the parity test). Variant values
    outside {0, 1} fail the stream, mirroring the batch in-plan raise.

    Parameters are part of the checkpoint's meaning: an SPRT's
    constants must be FIXED for its alpha/beta guarantees, so
    (lift_ratio, alpha, beta) are fingerprinted into every state row —
    restarting under a different hypothesis fails loudly at the first
    arrival instead of silently re-scoring the persisted LLR under new
    boundaries. Start a fresh checkpoint for a new hypothesis, as you
    would for a new experiment.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if lift_ratio <= 0 or lift_ratio == 1.0:
        raise ValueError("sprt_stream: lift_ratio must be > 0 and != 1")
    if not (0 < alpha < 1 and 0 < beta < 1 and alpha + beta < 1):
        raise ValueError(
            "sprt_stream: alpha and beta must be in (0, 1) with "
            "alpha + beta < 1")
    q = lift_ratio / (1.0 + lift_ratio)
    c1 = math.log(2.0 * q)
    c0 = math.log(2.0 * (1.0 - q))
    ln_a = math.log((1.0 - beta) / alpha)
    ln_b = math.log(beta / (1.0 - alpha))

    key_type = events.schema[experiment].dataType
    out_schema = T.StructType([
        T.StructField("experiment", key_type),
        T.StructField("n_succ_total", T.LongType()),
        T.StructField("n_b_succ_total", T.LongType()),
        T.StructField("llr_running", T.DoubleType()),
        T.StructField("decision", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("n_succ", T.LongType()),
        T.StructField("n_b_succ", T.LongType()),
        T.StructField("llr", T.DoubleType()),
        T.StructField("decision", T.StringType()),
        T.StructField("params", T.StringType()),
    ])
    # the hypothesis IS the meaning of the persisted LLR: fingerprint
    # (lift_ratio, alpha, beta) into every state row so a restart under
    # different constants/boundaries fails loudly instead of silently
    # re-scoring the walk and voiding the alpha/beta guarantees
    params_fp = repr((float(lift_ratio), float(alpha), float(beta)))

    def update(key, pdfs, state: GroupState):
        (exp,) = key
        if state.exists:
            n, nb, llr, decision, state_fp = state.get
            if state_fp != params_fp:
                raise ValueError(
                    "sprt_stream: checkpointed state was built under "
                    f"different SPRT parameters ({state_fp}, as "
                    "(lift_ratio, alpha, beta)) than this run's "
                    f"({params_fp}) — a sequential test's constants "
                    "must be fixed; start a fresh checkpoint for the "
                    f"new hypothesis (experiment {exp!r})")
        else:
            n, nb, llr, decision = 0, 0, 0.0, None
        dn = dnb = 0
        for pdf in pdfs:
            v = pdf["__v"]
            if bool((~v.isin([0, 1]) | v.isna()).any()):
                raise ValueError(
                    "sprt_stream: variant column must be a binary {0, 1} "
                    "assignment — found other/null variant values among "
                    f"successes for experiment {exp!r}")
            dn += len(pdf)
            dnb += int((v == 1).sum())
        n += dn
        nb += dnb
        # counts x constants, the batch operator's per-bin increment form
        llr = llr + dnb * c1 + (dn - dnb) * c0
        if decision is None:
            if llr >= ln_a:
                decision = "accept_h1"
            elif llr <= ln_b:
                decision = "accept_h0"
        state.update((n, nb, llr, decision, params_fp))
        yield pd.DataFrame([{
            "experiment": exp, "n_succ_total": n, "n_b_succ_total": nb,
            "llr_running": _round_half_up(llr, 6),
            "decision": decision if decision is not None else "continue",
        }])

    return (
        events.filter(success)
        .select(F.col(experiment).alias("experiment"),
                F.col(variant).alias("__v"), F.col("ts"))
        .withWatermark("ts", watermark)
        .groupBy("experiment")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout)
    )


def seasonal_gate_stream(events: DataFrame, profile: DataFrame,
                         period_ms: int = 3_600_000, cycle: int = 24,
                         z_thresh: float = 3.0, min_n: int = 8) -> DataFrame:
    """Live twin of ``relational.seasonal_outliers``: score an event
    stream against a PRECOMPUTED seasonal profile (the <= ``cycle``-row
    frame from ``relational.seasonal_profile``, built in batch over
    history) — the precompute-offline / score-online ops split every
    seasonality-aware monitor runs in production: the profile refreshes
    on a batch cadence, the gate applies it to events as they arrive.

    Plan shape: a STREAM-STATIC broadcast join + scan-side projection —
    completely STATELESS (append mode, no watermark, no state store), so
    a restart loses nothing and throughput is bound by the scan, unlike
    the stateful rolling detector (``anomaly_stream``) whose per-key
    ring must persist. The scoring is literally the batch operator's
    column algebra (``relational.score_against_seasonal_profile``) run
    on the streaming frame, so batch-stream parity holds by construction
    WHEN the same profile is passed; passing yesterday's profile to
    today's stream is the intended production use (and the semantic
    difference from the batch op, which profiles the frame it scores).
    """
    from data_pipeline_eng_project_1_spark.operators import relational

    return relational.score_against_seasonal_profile(
        events.select("event_id", "ts_ms", "value"),
        profile, ts="ts_ms", value="value", id_col="event_id",
        period_ms=period_ms, cycle=cycle, z_thresh=z_thresh, min_n=min_n)


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (StatefulProcessor + typed state handles)
    that succeeds applyInPandasWithState. Same per-key/partitioned scaling
    story as ``user_activity_stateful`` above; the API differences that
    matter: named, TYPED state slots (ValueState/ListState/MapState)
    instead of one tuple blob — so state evolves by adding slots, not by
    migrating a packed schema — and RocksDB-backed state (required by
    this API; the caller must configure the provider session-wide — this
    operator refuses to overwrite the session conf, see below) with
    changelog checkpointing for state larger than executor memory.

    Emits the updated (user_id, n_events, total_value) row for every user
    seen in each micro-batch (Update output mode).

    Runtime dependency: the API's Python↔state-server protocol uses
    google.protobuf; environments without it fail at stream start (the
    test gates on it), while ``user_activity_stateful`` has no such
    dependency and remains the portable form.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ])

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, total = (self._totals.get() if self._totals.exists()
                        else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame([{
                "user_id": user_id, "n_events": n, "total_value": total,
            }])

        def close(self) -> None:
            pass

    # transformWithStateInPandas REQUIRES the RocksDB provider, but the
    # provider class is session-global: silently overwriting it here would
    # leak RocksDB into every OTHER streaming query started later in the
    # session (a query restarting from a checkpoint created under the
    # default HDFS-backed provider fails or corrupts on the mismatch). So:
    # require the caller/session factory to have configured it, and fail
    # loudly at plan-build time if not.
    rocksdb = ("org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider")
    current = events.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", "")
    if rocksdb not in (current or ""):
        raise ValueError(
            "user_totals_tws needs the RocksDB state-store provider, which "
            "must be configured session-wide (it affects every streaming "
            "query's checkpoints): set spark.sql.streaming.stateStore."
            f"providerClass={rocksdb} on the session before building this "
            "operator")
    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(), out_schema, "Update", "None")
    )


def run_to_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str,
                   output_mode: str = "append") -> StreamingQuery:
    """availableNow drain into a parquet directory. Unlike the memory sink,
    the file sink supports restarting from its checkpoint, so repeated
    drains of a growing source resume incrementally (the scheduled-batch
    cadence of the reference's 8-hour Airflow poll)."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory(df: DataFrame, name: str, checkpoint_dir: str,
                  output_mode: str = "append") -> StreamingQuery:
    """availableNow drain into an in-memory table (test/debug sink)."""
    return (
        df.writeStream.format("memory").queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_merge_stream(df: DataFrame, table_dir: str, keys: list[str],
                     order_col: str, checkpoint_dir: str) -> StreamingQuery:
    """Streaming upsert (CDC-apply): each micro-batch merges into a keyed
    parquet table via foreachBatch + sources.files.merge_keyed, keeping the
    greatest `order_col` row per key. foreachBatch is the escape hatch for
    sinks Structured Streaming cannot express declaratively (MERGE); the
    checkpoint still gives exactly-once batch tracking, and merge_keyed is
    itself idempotent, so a replayed batch (crash between merge and commit)
    converges to the same table.
    """
    import os

    from data_pipeline_eng_project_1_spark.sources import files

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not os.path.isdir(table_dir):
            # bootstrap: first batch becomes the table (deduped per key)
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
            (batch_df.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1).drop("__rn")
             .write.mode("overwrite").parquet(table_dir))
        else:
            files.merge_keyed(batch_df.sparkSession, table_dir, batch_df,
                              keys, order_col)

    return (
        df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_jdbc_stream(df: DataFrame, url: str, table: str, checkpoint_dir: str,
                    batch_id_col: str = "batch_id",
                    driver: str | None = None,
                    batchsize: int = 10_000) -> StreamingQuery:
    """Streaming → warehouse: each micro-batch bulk-appends to a JDBC
    table via foreachBatch + sources.files.sink_jdbc, stamped with its
    batch id. This is the streaming form of the reference's terminal
    Snowflake load (dags/utils.py:184-224) with the same contract as the
    batch sink: engine-minted keys, bulk batches, no read-backs.

    Delivery is at-least-once INTO the warehouse (a crash between the
    JDBC commit and the checkpoint commit replays one batch); the stamped
    batch id makes replays observable and idempotent to consume —
    downstream dedups on (key) or (key, batch_id), exactly the
    merge-on-read convention warehouse loaders use. The checkpoint still
    guarantees each source file is processed once per successful run."""
    from data_pipeline_eng_project_1_spark.sources import files

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        files.sink_jdbc(
            batch_df.withColumn(batch_id_col, F.lit(batch_id)),
            url, table, mode="append", batchsize=batchsize, driver=driver)

    return (
        df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
