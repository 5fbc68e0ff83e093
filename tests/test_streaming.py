"""Structured Streaming tests: flashscore intake exactly-once semantics and
windowed event analytics, all with availableNow (drain-and-stop) triggers."""

import json

import pytest

from data_pipeline_eng_project_1_spark.streaming import pipeline as sp
from tests.test_flashscore import _record

TABLES = ("MATCH_FINISHED", "HOME_STARTING_LINEUP",
          "AWAY_STARTING_LINEUP", "ODDS")


def _write_events(path, events):
    path.write_text("\n".join(json.dumps(e) for e in events))


def _event(eid, ts_ms, user=1, etype="click", value=1.0):
    return {"event_id": eid, "ts_ms": ts_ms, "user_id": user,
            "event_type": etype, "value": value}


def test_matches_stream_end_to_end(spark, tmp_path):
    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    (src / "a.json").write_text(json.dumps([_record(), _record(home="Lyon")]))
    q = sp.run_matches_pipeline(spark, str(src), str(out), str(ckpt))
    q.awaitTermination()
    match = spark.read.parquet(f"{out}/MATCH_FINISHED")
    assert match.count() == 2
    for t in TABLES[1:]:
        assert spark.read.parquet(f"{out}/{t}").count() == 2

    # Restart with NO new files: checkpoint prevents reprocessing (the
    # reference would re-ingest anything not yet archived).
    q2 = sp.run_matches_pipeline(spark, str(src), str(out), str(ckpt))
    q2.awaitTermination()
    assert spark.read.parquet(f"{out}/MATCH_FINISHED").count() == 2

    # New file arrives -> only it is processed, ids stay deterministic.
    (src / "b.json").write_text(json.dumps([_record(home="Metz")]))
    q3 = sp.run_matches_pipeline(spark, str(src), str(out), str(ckpt))
    q3.awaitTermination()
    match3 = spark.read.parquet(f"{out}/MATCH_FINISHED")
    assert match3.count() == 3
    assert match3.select("ID_MATCH").distinct().count() == 3


def test_tumbling_counts_with_watermark(spark, tmp_path):
    src, ckpt = tmp_path / "ev", tmp_path / "ck"
    src.mkdir()
    h = 3600 * 1000
    _write_events(src / "e1.json", [
        _event(1, 0 * h + 60_000), _event(2, 0 * h + 120_000),
        _event(3, 1 * h + 60_000, etype="purchase"),
    ])
    # append mode would hold back windows the watermark hasn't closed when
    # the drain ends; complete mode emits every window's current state.
    q = sp.run_to_memory(
        sp.tumbling_counts(sp.stream_events(spark, str(src))),
        "tumbling_t", str(ckpt), output_mode="complete")
    q.awaitTermination()
    rows = {(r["window_start"].minute + 60 * r["window_start"].hour,
             r["event_type"]): r["n"]
            for r in spark.table("tumbling_t").collect()}
    assert rows[(0, "click")] == 2
    assert rows[(60, "purchase")] == 1


def test_sliding_counts(spark, tmp_path):
    src, ckpt = tmp_path / "ev", tmp_path / "ck"
    src.mkdir()
    m = 60 * 1000
    # One event at minute 45: hour-long windows sliding by 30 min put it in
    # [0:00,1:00) and [0:30,1:30).
    _write_events(src / "e1.json", [_event(1, 45 * m)])
    q = sp.run_to_memory(
        sp.sliding_counts(sp.stream_events(spark, str(src))),
        "sliding_t", str(ckpt), output_mode="complete")
    q.awaitTermination()
    starts = sorted(r["window_start"].minute + 60 * r["window_start"].hour
                    for r in spark.table("sliding_t").collect())
    assert starts == [0, 30]


def test_session_counts(spark, tmp_path):
    src, ckpt = tmp_path / "ev", tmp_path / "ck"
    src.mkdir()
    m = 60 * 1000
    _write_events(src / "e1.json", [
        _event(1, 0), _event(2, 5 * m), _event(3, 10 * m),   # session 1
        _event(4, 120 * m), _event(5, 125 * m),              # session 2
        _event(6, 0, user=2),                                # other user
    ])
    q = sp.run_to_memory(
        sp.session_counts(sp.stream_events(spark, str(src)), gap="30 minutes"),
        "sessions_t", str(ckpt), output_mode="complete")
    q.awaitTermination()
    rows = sorted((r["user_id"], r["n_events"])
                  for r in spark.table("sessions_t").collect())
    assert rows == [(1, 2), (1, 3), (2, 1)]


def test_click_to_purchase_stream_join(spark, tmp_path):
    src, ckpt = tmp_path / "ev", tmp_path / "ck"
    src.mkdir()
    m = 60 * 1000
    b = 100 * 60 * m  # clear of the epoch-0 initial watermark
    _write_events(src / "e1.json", [
        _event(1, b, user=1, etype="click"),
        _event(2, b + 10 * m, user=1, etype="purchase", value=9.0),   # in window
        _event(3, b + 40 * m, user=1, etype="purchase", value=5.0),   # too late
        _event(4, b + 5 * m, user=2, etype="purchase", value=3.0),    # no click
    ])
    q = sp.run_to_memory(
        sp.click_to_purchase(sp.stream_events(spark, str(src))),
        "cp_t", str(ckpt))
    q.awaitTermination()
    rows = spark.table("cp_t").collect()
    assert [(r["user_id"], r["purchase_value"]) for r in rows] == [(1, 9.0)]


def test_stream_static_dim_enrichment(spark, tmp_path):
    src, ckpt = tmp_path / "ev", tmp_path / "ck"
    src.mkdir()
    b = 100 * 60 * 60 * 1000
    _write_events(src / "e1.json", [
        _event(1, b, user=1), _event(2, b + 1, user=2),
        _event(3, b + 2, user=9),                      # no dim row
    ])
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "trial")], "user_id long, segment string")
    q = sp.run_to_memory(
        sp.enrich_with_dim(sp.stream_events(spark, str(src)), dim, "user_id")
          .select("event_id", "segment"),
        "enriched_t", str(ckpt))
    q.awaitTermination()
    got = {(r.event_id, r.segment) for r in spark.table("enriched_t").collect()}
    assert got == {(1, "gold"), (2, "trial"), (3, None)}


def test_dedup_events_drops_replayed_ids(spark, tmp_path):
    src, ckpt = tmp_path / "ev", tmp_path / "ck"
    src.mkdir()
    # Same event_id delivered twice (intake replay) + one unique event.
    _write_events(src / "e1.json", [
        _event(1, 60_000), _event(1, 60_000), _event(2, 120_000),
    ])
    q = sp.run_to_memory(
        sp.dedup_events(sp.stream_events(spark, str(src))),
        "dedup_t", str(ckpt))
    q.awaitTermination()
    ids = sorted(r["event_id"] for r in spark.table("dedup_t").collect())
    assert ids == [1, 2]


def test_dedup_documents_stream_content_based(spark, tmp_path):
    """Same TEXT under different ids/timestamps is dropped on arrival;
    distinct text passes. (Content fingerprint, not id equality.)"""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src, ckpt = tmp_path / "docs", tmp_path / "ck"
    src.mkdir()
    docs = [
        {"doc_id": 1, "ts_ms": 60_000, "text": "Alpha,  beta GAMMA."},
        {"doc_id": 2, "ts_ms": 65_000, "text": "alpha beta gamma"},  # dup
        {"doc_id": 3, "ts_ms": 70_000, "text": "entirely different"},
    ]
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (spark.readStream.schema(schema).json(str(src))
              .withColumn("ts", F.timestamp_millis(F.col("ts_ms"))))
    q = sp.run_to_memory(
        sp.dedup_documents_stream(stream), "docdedup_t", str(ckpt))
    q.awaitTermination()
    kept = sorted(r["doc_id"] for r in spark.table("docdedup_t").collect())
    assert kept == [1, 3]  # doc 2 is a normalized-content replay of doc 1


def test_known_content_stream_flags_reference_matches(spark, tmp_path):
    """Arriving docs whose normalized text already exists in the static
    reference corpus are flagged is_known (content match survives
    case/punctuation differences); novel docs pass unflagged. Stateless
    stream-static join — no watermark, no state store."""
    from pyspark.sql import types as T

    src, ckpt = tmp_path / "docs", tmp_path / "ck_known"
    src.mkdir()
    ref = spark.createDataFrame(
        [(100, "Alpha,  beta GAMMA."), (101, "existing corpus page")],
        ["doc_id", "text"])
    docs = [
        {"doc_id": 1, "text": "alpha beta gamma"},        # known (norm.)
        {"doc_id": 2, "text": "a brand new document"},    # novel
        {"doc_id": 3, "text": "EXISTING corpus page"},    # known (case)
    ]
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    q = sp.run_to_memory(
        sp.known_content_stream(stream, ref), "known_t", str(ckpt))
    q.awaitTermination()
    got = {r["doc_id"]: r["is_known"]
           for r in spark.table("known_t").collect()}
    assert got == {1: True, 2: False, 3: True}


def test_user_activity_stateful(spark, tmp_path):
    src, ckpt = tmp_path / "ev", tmp_path / "ck"
    src.mkdir()
    m = 60 * 1000
    # Timestamps sit well above epoch 0: the stateful operator drops rows at
    # or below the current watermark, and the initial watermark is 0.
    b = 100 * 60 * m
    _write_events(src / "e1.json", [
        _event(1, b, user=1, value=2.0),
        _event(2, b + 5 * m, user=1, value=3.0),
        _event(3, b, user=2, value=7.0),
    ])
    out = tmp_path / "out"
    q = sp.run_to_parquet(
        sp.user_activity_stateful(sp.stream_events(spark, str(src))),
        str(out), str(ckpt))
    q.awaitTermination()
    rows = {r["user_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert rows[1]["n_events"] == 2
    assert rows[1]["total_value"] == 5.0
    assert rows[1]["last_ts_ms"] == b + 5 * m
    assert rows[2]["n_events"] == 1
    assert rows[2]["emitted_on"] == "update"

    # Second micro-batch, restarted from the checkpoint: state carries
    # across batches (running totals) and only the new file is read.
    _write_events(src / "e2.json", [_event(4, b + 10 * m, user=1, value=1.0)])
    q2 = sp.run_to_parquet(
        sp.user_activity_stateful(sp.stream_events(spark, str(src))),
        str(out), str(ckpt))
    q2.awaitTermination()
    latest = {}
    for r in spark.read.parquet(str(out)).collect():
        if (r["user_id"] not in latest
                or r["n_events"] > latest[r["user_id"]]["n_events"]):
            latest[r["user_id"]] = r
    assert latest[1]["n_events"] == 3
    assert latest[1]["total_value"] == 6.0


def test_stream_archive_source(spark, tmp_path):
    src, out, ckpt, arch = (tmp_path / "in", tmp_path / "out",
                            tmp_path / "ckpt", tmp_path / "done")
    src.mkdir()
    (src / "a.json").write_text(json.dumps([_record()]))
    q = sp.run_matches_pipeline(spark, str(src), str(out), str(ckpt),
                                archive_dir=str(arch))
    q.awaitTermination()
    assert spark.read.parquet(f"{out}/MATCH_FINISHED").count() == 1
    # cleanSource=archive moves consumed files out of the source dir
    # (reference: move_file to the used-bucket, dags/utils.py:31-52) —
    # archival is asynchronous/best-effort, so only assert non-loss.
    remaining = list(src.glob("*.json"))
    archived = list(arch.rglob("*.json"))
    assert len(remaining) + len(archived) >= 1


def test_merge_stream_upserts_latest_per_key(spark, tmp_path):
    src = tmp_path / "merge_src"
    src.mkdir()
    table = str(tmp_path / "merge_table")
    ckpt = str(tmp_path / "merge_ckpt")
    schema = "k LONG, v STRING, ver LONG"

    def drain(rows, fname):
        (src / fname).write_text("\n".join(json.dumps(r) for r in rows))
        stream = spark.readStream.schema(schema).json(str(src))
        q = sp.run_merge_stream(stream, table, ["k"], "ver", ckpt)
        q.awaitTermination(120)

    drain([{"k": 1, "v": "a", "ver": 10},
           {"k": 2, "v": "b", "ver": 10},
           {"k": 2, "v": "b1", "ver": 11}], "b1.json")
    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(table).collect()}
    assert got == {1: ("a", 10), 2: ("b1", 11)}

    drain([{"k": 2, "v": "b2", "ver": 20},
           {"k": 3, "v": "c", "ver": 5}], "b2.json")
    got = {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(table).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 20), 3: ("c", 5)}


def test_jdbc_stream_bulk_appends_per_batch(spark, tmp_path):
    """Streaming → warehouse: micro-batches bulk-append into a JDBC table
    (embedded Derby), stamped with their batch id; a restart with no new
    files appends nothing (checkpoint), a new file appends only itself."""
    src = tmp_path / "jdbc_src"
    src.mkdir()
    ckpt = str(tmp_path / "jdbc_ckpt")
    url = f"jdbc:derby:{tmp_path / 'wh'};create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    schema = "k LONG, v STRING"

    def drain(rows, fname):
        if rows:
            (src / fname).write_text("\n".join(json.dumps(r) for r in rows))
        stream = spark.readStream.schema(schema).json(str(src))
        q = sp.run_jdbc_stream(stream, url, "EVENTS_WH", ckpt, driver=driver)
        q.awaitTermination(120)

    drain([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}], "f1.json")
    from data_pipeline_eng_project_1_spark.sources import files

    got = files.read_jdbc(spark, url, "EVENTS_WH", driver=driver)
    assert got.count() == 2
    assert got.select("batch_id").distinct().count() == 1

    drain([], "noop")  # restart, nothing new: checkpoint prevents re-append
    assert files.read_jdbc(spark, url, "EVENTS_WH", driver=driver).count() == 2

    drain([{"k": 3, "v": "c"}], "f2.json")
    got = files.read_jdbc(spark, url, "EVENTS_WH", driver=driver)
    assert got.count() == 3
    assert {r["k"] for r in got.collect()} == {1, 2, 3}


def test_semantic_hits_stream_flags_near_dup_arrivals(spark, tmp_path):
    """Arriving embeddings are screened against a static reference: an
    arrival near a same-cell reference vector emits a hit pair; a novel
    direction emits nothing. Stateless — no watermark, no state store."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src, ckpt = tmp_path / "vecs", tmp_path / "ck_sem"
    src.mkdir()
    ref = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 0.0])],
        ["vec_id", "embedding"])
    arrivals = [
        {"vec_id": 10, "embedding": [3.0, 0.0]},   # dup of refs 0 and 2
        {"vec_id": 11, "embedding": [-1.0, -1.0]}, # novel direction
    ]
    (src / "a.json").write_text("\n".join(json.dumps(d) for d in arrivals))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    hits = sp.semantic_hits_stream(stream, ref, threshold=0.99, num_cells=2,
                                   dim=2)
    q = sp.run_to_memory(hits, "semhits_t", str(ckpt))
    q.awaitTermination()
    got = {(r["arrival_id"], r["ref_id"]): r["cosine"]
           for r in spark.table("semhits_t").collect()}
    assert set(got) == {(10, 0), (10, 2)}
    assert all(abs(c - 1.0) < 1e-12 for c in got.values())


def test_user_totals_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas accumulates per-user state ACROSS
    micro-batches (maxFilesPerTrigger=1 forces one batch per file): the
    second batch's emission includes the first batch's totals.

    The API's state-server protocol needs google.protobuf at stream
    runtime; sandboxes without it skip here (the operator itself is
    plain PySpark — nothing else to gate)."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import types as T

    src, ckpt = tmp_path / "ev", tmp_path / "ck_tws"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(e) for e in [
        {"user_id": 1, "value": 10.0}, {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ]))
    (src / "b2.json").write_text("\n".join(json.dumps(e) for e in [
        {"user_id": 1, "value": 2.0},
    ]))
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    # user_totals_tws refuses to run on the default HDFS-backed provider
    # (transformWithStateInPandas requires RocksDB) and deliberately does
    # NOT set it session-globally itself — so this test must, and must
    # restore the previous value for the other streaming tests.
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                        "state.RocksDBStateStoreProvider")
    try:
        q = sp.run_to_memory(sp.user_totals_tws(stream), "tws_t", str(ckpt),
                             output_mode="update")
        q.awaitTermination()
        rows = spark.table("tws_t").collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # final state per user: max n_events row
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]][0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (3, 17.0)   # state crossed the batch boundary
    assert final[2] == (1, 1.0)


def test_user_totals_tws_requires_explicit_rocksdb_provider(spark):
    """user_totals_tws must not silently flip the session-global state
    store provider (later queries restarting from HDFS-provider
    checkpoints would inherit RocksDB and corrupt): without the conf it
    raises at plan-build time, with it the plan builds."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    df = spark.createDataFrame([], schema)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.unset(key)
        with pytest.raises(ValueError, match="RocksDB"):
            sp.user_totals_tws(df)
        spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                            "state.RocksDBStateStoreProvider")
        assert sp.user_totals_tws(df) is not None  # plan builds
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_semantic_hits_same_id_space_flag(spark):
    """With independent id spaces an arrival reusing a reference id must
    still be screened (same_id_space=False); the default keeps
    self-exclusion for corpus-vs-itself streams. Stream ops here are all
    stateless projections/joins, so the batch plan is the same code
    path."""
    ref = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"])
    # arrival id 0 collides with reference id 0 and IS its near-dup
    arrivals = spark.createDataFrame([(0, [2.0, 0.0])],
                                     ["vec_id", "embedding"])
    dflt = sp.semantic_hits_stream(arrivals, ref, threshold=0.99,
                                   num_cells=2, dim=2)
    indep = sp.semantic_hits_stream(arrivals, ref, threshold=0.99,
                                    num_cells=2, dim=2, same_id_space=False)
    assert dflt.filter("ref_id = 0").count() == 0   # self-excluded
    assert indep.filter("ref_id = 0").count() == 1  # screened


def test_token_drift_stream_counts_and_divergence(spark, tmp_path):
    """The streamed (window, term, cp, cq) frame must match exact Python
    token counts per window/side, and the JS divergence computed from it
    must equal the same formula on those counts — proving the stream
    emits exactly the frame the batch drift op aggregates."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src, ckpt = tmp_path / "docs_kd", tmp_path / "ck_kd"
    src.mkdir()
    h = 3_600_000
    docs = [
        {"doc_id": 1, "ts_ms": 5 * 60_000, "side": 0, "text": "aa bb aa"},
        {"doc_id": 2, "ts_ms": 9 * 60_000, "side": 1, "text": "aa cc"},
        {"doc_id": 3, "ts_ms": h + 60_000, "side": 0, "text": "dd"},
    ]
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("side", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (spark.readStream.schema(schema).json(str(src))
              .withColumn("ts", F.timestamp_millis(F.col("ts_ms"))))
    q = sp.run_to_memory(sp.token_drift_stream(stream), "token_drift",
                         str(ckpt), output_mode="complete")
    q.awaitTermination()
    rows = spark.table("token_drift").collect()
    got = {(r.window_start.hour, r.term): (r.cp, r.cq) for r in rows}
    assert got == {(0, "aa"): (2, 1), (0, "bb"): (1, 0), (0, "cc"): (0, 1),
                   (1, "dd"): (1, 0)}
    # JS over window 0's frame, same smoothing as the batch op
    w0 = [(cp, cq) for (hh, _), (cp, cq) in got.items() if hh == 0]
    np_, nq, v = sum(c for c, _ in w0), sum(c for _, c in w0), len(w0)
    js = 0.0
    for cp, cq in w0:
        p, qq = (cp + 1.0) / (np_ + v), (cq + 1.0) / (nq + v)
        m = 0.5 * p + 0.5 * qq
        js += 0.5 * p * math.log(p / m) + 0.5 * qq * math.log(qq / m)
    assert 0.0 < js < math.log(2.0)


def test_token_drift_stream_append_mode_emits_closed_windows(spark, tmp_path):
    """Production (append) mode: a window's counts emit exactly once,
    FINALIZED, after the watermark passes its end — proving the drift
    frame is safe to consume incrementally (each emitted row is the
    window's last word, not a running update)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src, ckpt = tmp_path / "docs_ka", tmp_path / "ck_ka"
    out = tmp_path / "out_ka"
    src.mkdir()
    h = 3_600_000
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("side", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])

    def drain():
        stream = (spark.readStream.schema(schema).json(str(src))
                  .withColumn("ts", F.timestamp_millis(F.col("ts_ms"))))
        q = sp.run_to_parquet(sp.token_drift_stream(stream), str(out),
                              str(ckpt))
        q.awaitTermination()
        try:
            return spark.read.parquet(str(out)).collect()
        except Exception:  # noqa: BLE001 — no closed window emitted yet
            return []

    # Drain 1: window-0 data plus a 2h event that advances the watermark
    # to 1.5h (> window 0's end) at BATCH END — append emission of the
    # closed window happens on a subsequent batch.
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in [
        {"doc_id": 1, "ts_ms": 5 * 60_000, "side": 0, "text": "aa aa"},
        {"doc_id": 2, "ts_ms": 9 * 60_000, "side": 1, "text": "aa"},
        {"doc_id": 3, "ts_ms": 2 * h, "side": 0, "text": "zz"},
    ]))
    drain()

    # Drain 2 (restart on the checkpoint with one new file): window 0 is
    # now past the watermark and must emit, finalized.
    (src / "d2.json").write_text(json.dumps(
        {"doc_id": 4, "ts_ms": 3 * h, "side": 1, "text": "yy"}))
    rows = drain()
    got = {(r.window_start.hour, r.term): (r.cp, r.cq) for r in rows}
    assert got.get((0, "aa")) == (2, 1)
    # the still-open windows (2h, 3h) must NOT have emitted yet
    assert all(hh == 0 for hh, _ in got)


def test_trending_tokens_stream_windowed_floor(spark, tmp_path):
    """Per-window token counts respect the min_count gate and the window
    boundaries: a token spread across two windows must not pool."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src, ckpt = tmp_path / "docs_tt", tmp_path / "ck_tt"
    src.mkdir()
    h = 3_600_000
    docs = [
        # window 0: "spam" x4 (passes), "rare" x1 (gated)
        {"doc_id": 1, "ts_ms": 10 * 60_000, "text": "spam spam rare"},
        {"doc_id": 2, "ts_ms": 20 * 60_000, "text": "spam spam"},
        # window 1: "spam" x2 only -> gated there (no pooling across windows)
        {"doc_id": 3, "ts_ms": h + 10 * 60_000, "text": "spam spam"},
    ]
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (spark.readStream.schema(schema).json(str(src))
              .withColumn("ts", F.timestamp_millis(F.col("ts_ms"))))
    q = sp.run_to_memory(
        sp.trending_tokens_stream(stream, min_count=3), "trending_t",
        str(ckpt), output_mode="complete")
    q.awaitTermination()
    rows = {(r.window_start.minute + 60 * r.window_start.hour, r.token): r.n
            for r in spark.table("trending_t").collect()}
    assert rows == {(0, "spam"): 4}


def test_quality_gate_split_sink_routes_and_checkpoints(spark, tmp_path):
    """Curation-at-ingest e2e: arriving docs score through the SHARED
    quality model, the split sink routes keep/reject to separate parquet
    dirs from one batch read, empty docs land on the reject side (not
    dropped), and a checkpointed re-drain with no new files appends
    nothing to either side."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_pipeline_eng_project_1_spark.functions import texts

    src = tmp_path / "docs_qg"
    src.mkdir()
    good = "the cat sat of the mat and the dog ran to the park in town"
    bad = "zzzzqqqq!!!! ####&&&& @@@@***"
    docs = [
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": bad},
        {"doc_id": 3, "text": ""},
    ]
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])

    def drain():
        stream = spark.readStream.schema(schema).json(str(src))
        q = sp.run_split_sink(
            sp.quality_gate_stream(stream), "keep",
            str(tmp_path / "pass"), str(tmp_path / "reject"),
            str(tmp_path / "ck_qg"))
        q.awaitTermination()

    drain()
    kept = spark.read.parquet(str(tmp_path / "pass")).collect()
    rej = spark.read.parquet(str(tmp_path / "reject")).collect()
    assert {r.doc_id for r in kept} == {1}
    assert {r.doc_id for r in rej} == {2, 3}
    empty = next(r for r in rej if r.doc_id == 3)
    assert empty.score is None and empty.keep is False

    # the stream's score equals the shared batch model's score
    batch_score = spark.createDataFrame([(good,)], ["text"]).select(
        F.round(texts.quality_score_of(
            F.col("text"), texts.tokens(F.col("text"))), 4)
        .alias("s")).collect()[0]["s"]
    assert kept[0].score == batch_score

    # checkpointed restart, no new data: nothing re-appends on either side
    drain()
    assert spark.read.parquet(str(tmp_path / "pass")).count() == len(kept)
    assert spark.read.parquet(str(tmp_path / "reject")).count() == len(rej)

    # simulated REPLAY (checkpoint lost, same source): batch 0 re-executes
    # under the same batch_id — dynamic partition overwrite rewrites the
    # batch_id=0 partition instead of appending duplicates, so the sink
    # is idempotent (foreachBatch alone is only at-least-once)
    import shutil

    shutil.rmtree(str(tmp_path / "ck_qg"))
    drain()
    p = sp.read_split_side(spark, str(tmp_path / "pass"))
    r = sp.read_split_side(spark, str(tmp_path / "reject"))
    assert p.count() == len(kept) and r.count() == len(rej)
    assert {row.batch_id for row in p.select("batch_id").collect()} == {0}
    # read_split_side pins the inferred batch_id partition type to the
    # long the writer stamped
    assert p.schema["batch_id"].dataType.simpleString() == "bigint"


def test_split_sink_multi_batch_partitions_are_isolated(spark, tmp_path):
    """Multiple micro-batches (maxFilesPerTrigger=1) land in distinct
    batch_id partitions, and a replay of the WHOLE stream only ever
    rewrites per-batch partitions — later batches' data survives a
    batch-0 rewrite untouched."""
    from pyspark.sql import types as T

    src = tmp_path / "docs_mb"
    src.mkdir()
    good = "the cat sat on the mat and the dog ran to the park in town"
    (src / "f0.json").write_text(json.dumps({"doc_id": 1, "text": good}))
    (src / "f1.json").write_text(json.dumps({"doc_id": 2, "text": good}))
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        q = sp.run_split_sink(
            sp.quality_gate_stream(stream), "keep",
            str(tmp_path / "mb_pass"), str(tmp_path / "mb_reject"),
            str(tmp_path / "ck_mb"))
        q.awaitTermination()

    drain()
    p = spark.read.parquet(str(tmp_path / "mb_pass"))
    got = {(r.doc_id, r.batch_id) for r in p.collect()}
    assert {b for _, b in got} == {0, 1}  # one file per micro-batch
    assert {d for d, _ in got} == {1, 2}
    # full replay: same per-batch partitions, still no duplication
    import shutil

    shutil.rmtree(str(tmp_path / "ck_mb"))
    drain()
    p2 = spark.read.parquet(str(tmp_path / "mb_pass"))
    assert {(r.doc_id, r.batch_id) for r in p2.collect()} == got


def test_split_sink_accounting_matches_batch_twin(spark, tmp_path):
    """Pre-validation of the r9 corpus_split_accounting oracle spec
    (docs/BACKLOG.md): the batch-side quality-gate accounting — per side
    n_docs + md5 of the comma-joined sorted doc_id list — must equal
    what the streaming split sink actually wrote. Membership proof, not
    just counts: the SAME weight map scores both paths."""
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_pipeline_eng_project_1_spark.functions import texts

    src = tmp_path / "docs_acct"
    src.mkdir()
    good = "the cat sat on the mat and the dog ran to the park in town"
    docs = [{"doc_id": i,
             "text": good if i % 3 else "zzzqqq!!! ###&&& @@@***"}
            for i in range(1, 13)] + [{"doc_id": 99, "text": ""}]
    (src / "d.json").write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    stream = spark.readStream.schema(schema).json(str(src))
    q = sp.run_split_sink(
        sp.quality_gate_stream(stream), "keep",
        str(tmp_path / "acct_pass"), str(tmp_path / "acct_reject"),
        str(tmp_path / "acct_ck"))
    q.awaitTermination()

    # batch twin: same weights, same routing predicate (null -> reject)
    bdf = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in docs], ["doc_id", "text"])
    toks = texts.tokens(F.col("text"))
    score = F.when(F.size(toks) > 0, texts.quality_score_of(F.col("text"), toks))
    batch = bdf.withColumn("keep", F.coalesce(score >= 0.5, F.lit(False)))
    acct = {r["keep"]: (r["n"], r["ids_md5"]) for r in
            batch.groupBy("keep").agg(
                F.count(F.lit(1)).alias("n"),
                F.md5(F.encode(F.concat_ws(",", F.sort_array(
                    F.collect_list(F.col("doc_id").cast("string")))),
                    "UTF-8")).alias("ids_md5")).collect()}

    for side, keep in (("acct_pass", True), ("acct_reject", False)):
        ids = sorted(str(r["doc_id"]) for r in
                     spark.read.parquet(str(tmp_path / side)).collect())
        md5 = hashlib.md5(",".join(sorted(ids)).encode()).hexdigest()
        assert (len(ids), md5) == acct[keep], side


def test_anomaly_stream_matches_batch_rolling_anomaly(spark, tmp_path):
    """The live anomaly detector == the graded batch operator on an
    in-order drain: same spike flagged with identical trailing stats,
    cold-start rows suppressed, constant-series (sd=0) users silent,
    and NULL values skip frame slots on BOTH sides (user 3's 15 nulls
    sit between the stable run and the spike — under the pre-r10
    physical-rows batch frame they would crowd n_prior below min_n and
    the two forms would diverge; with the shared trailing-VALUE
    semantics both flag the spike against all 10 prior observations).
    State is the O(w) value ring, never the user's history."""
    import json as _json

    from data_pipeline_eng_project_1_spark.operators import relational

    src = tmp_path / "ev"
    src.mkdir()
    vals = [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.0, 10.1, 9.9, 10.0,
            50.0, 10.05]
    rows = [{"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": 1,
             "event_type": "view", "value": v}
            for i, v in enumerate(vals)]
    rows += [{"event_id": 100 + i, "ts_ms": 60_000 * (i + 1), "user_id": 2,
              "event_type": "view", "value": 5.0} for i in range(12)]
    vals3 = ([10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.0, 10.1, 9.9, 10.0]
             + [None] * 15 + [50.0])
    rows += [{"event_id": 200 + i, "ts_ms": 60_000 * (i + 1), "user_id": 3,
              "event_type": "view", "value": v}
             for i, v in enumerate(vals3)]
    (src / "e1.json").write_text("\n".join(_json.dumps(r) for r in rows))

    q = sp.run_to_memory(
        sp.anomaly_stream(sp.stream_events(spark, str(src)),
                          w=20, z_thresh=3.0, min_n=8),
        "anoms", str(tmp_path / "ck"))
    q.awaitTermination()
    got = [tuple(r) for r in
           spark.table("anoms")
           .select("user_id", "ts_ms", "event_id", "value", "n_prior",
                   "roll_mean", "roll_std", "zscore")
           .orderBy("user_id", "ts_ms").collect()]

    batch_df = spark.createDataFrame(
        [(r["user_id"], r["ts_ms"], r["event_id"], r["value"])
         for r in rows],
        "user_id long, ts_ms long, event_id long, value double")
    want = [tuple(r) for r in
            relational.rolling_anomaly(
                batch_df, key="user_id", ts="ts_ms", value="value",
                id_col="event_id", w=20, z_thresh=3.0, min_n=8)
            .orderBy("user_id", "ts_ms").collect()]
    assert got == want
    # exactly the two spike rows; user 3's n_prior counts all 10 stable
    # observations — the 15 nulls never occupied frame slots
    assert [(g[0], g[3]) for g in got] == [(1, 50.0), (3, 50.0)]
    assert got[1][4] == 10  # n_prior


def test_anomaly_stream_state_survives_restart(spark, tmp_path):
    """The value ring persists in the checkpoint: a spike arriving in a
    LATER drain is scored against state built by the earlier one
    (n_prior counts the first file's events), and the ring stays
    w-bounded."""
    import json as _json

    src = tmp_path / "ev"
    src.mkdir()
    stable = [{"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": 7,
               "event_type": "view", "value": 20.0 + (i % 3) * 0.1}
              for i in range(10)]
    (src / "e1.json").write_text("\n".join(_json.dumps(r) for r in stable))
    ck, out_dir = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        # parquet sink: the memory sink cannot recover from a checkpoint,
        # and checkpoint recovery IS what this test exercises
        q = sp.run_to_parquet(
            sp.anomaly_stream(sp.stream_events(spark, str(src)),
                              w=5, z_thresh=3.0, min_n=4),
            out_dir, ck)
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out_dir).count() == 0  # stable, no alerts

    (src / "e2.json").write_text(_json.dumps(
        {"event_id": 99, "ts_ms": 60_000 * 20, "user_id": 7,
         "event_type": "view", "value": 90.0}))
    drain()
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["event_id"] == 99
    # w=5 bounds the ring: only the LAST 5 stable values are the window
    assert r["n_prior"] == 5
    import statistics as st
    tail = [20.0 + (i % 3) * 0.1 for i in range(5, 10)]
    assert abs(r["roll_mean"] - round(st.mean(tail), 6)) < 1e-9
    assert abs(r["roll_std"] - round(st.stdev(tail), 6)) < 1e-9


def test_seasonal_gate_stream_matches_batch_with_same_profile(spark, tmp_path):
    """The live seasonal gate == the batch seasonal_outliers when scored
    against the SAME profile (parity by construction — the stream runs
    the batch operator's column algebra through a stream-static
    broadcast join). Stateless: no watermark, no state store."""
    import json as _json

    from data_pipeline_eng_project_1_spark.operators import relational

    src = tmp_path / "ev"
    src.mkdir()
    rows = []
    eid = 0
    for day in range(10):                      # hour-0 ~10, hour-12 ~100
        for hour, base in ((0, 10.0), (12, 100.0)):
            rows.append({"event_id": eid, "user_id": 1,
                         "ts_ms": ((day * 24 + hour) * 3_600_000),
                         "event_type": "view",
                         "value": base + (day % 3) * 0.1})
            eid += 1
    rows.append({"event_id": 999, "user_id": 1,
                 "ts_ms": 10 * 24 * 3_600_000, "event_type": "view",
                 "value": 100.0})              # hour-0 spike
    (src / "e1.json").write_text("\n".join(_json.dumps(r) for r in rows))

    batch_df = spark.createDataFrame(
        [(r["event_id"], r["ts_ms"], r["value"]) for r in rows],
        "event_id long, ts_ms long, value double")
    profile = relational.seasonal_profile(batch_df, "ts_ms", "value")

    q = sp.run_to_memory(
        sp.seasonal_gate_stream(sp.stream_events(spark, str(src)), profile),
        "seasonal_gate", str(tmp_path / "ck"))
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("seasonal_gate").collect())

    want = sorted(tuple(r) for r in relational.seasonal_outliers(
        batch_df, ts="ts_ms", value="value", id_col="event_id").collect())
    assert got == want
    assert len(got) == 1 and got[0][0] == 999  # exactly the hour-0 spike


def test_seasonal_gate_stream_scores_against_stale_profile(spark, tmp_path):
    """The production semantics: the gate scores TODAY's stream against
    YESTERDAY's profile — a level shift the profile has not seen flags
    every shifted event, which the self-profiling batch operator would
    partially absorb into its own mean."""
    import json as _json

    from data_pipeline_eng_project_1_spark.operators import relational

    hist = spark.createDataFrame(
        [(i, (d * 24) * 3_600_000, 10.0 + (i % 5) * 0.1)
         for d in range(10) for i in (d,)],
        "event_id long, ts_ms long, value double")
    profile = relational.seasonal_profile(hist, "ts_ms", "value")

    src = tmp_path / "ev2"
    src.mkdir()
    live = [{"event_id": 100 + d, "user_id": 1,
             "ts_ms": ((10 + d) * 24) * 3_600_000, "event_type": "view",
             "value": 50.0} for d in range(3)]
    (src / "e1.json").write_text("\n".join(_json.dumps(r) for r in live))

    q = sp.run_to_memory(
        sp.seasonal_gate_stream(sp.stream_events(spark, str(src)), profile),
        "seasonal_gate2", str(tmp_path / "ck2"))
    q.awaitTermination()
    got = spark.table("seasonal_gate2").collect()
    assert sorted(r["event_id"] for r in got) == [100, 101, 102]
    assert all(r["n_bucket"] == 10 for r in got)  # profile is history's


def test_seasonal_gate_stream_checkpoint_restart_no_reprocess(spark, tmp_path):
    """Statelessness in practice: a restart from the checkpoint with no
    new files emits nothing (no reprocessing), and a new file is scored
    against the SAME static profile — only its rows append."""
    import json as _json

    from data_pipeline_eng_project_1_spark.operators import relational

    hist = spark.createDataFrame(
        [(i, (d * 24) * 3_600_000, 10.0 + (i % 5) * 0.1)
         for d in range(10) for i in (d,)],
        "event_id long, ts_ms long, value double")
    profile = relational.seasonal_profile(hist, "ts_ms", "value")

    src, out, ck = tmp_path / "ev", tmp_path / "out", tmp_path / "ck"
    src.mkdir()
    (src / "a.json").write_text(_json.dumps(
        {"event_id": 1, "user_id": 1, "ts_ms": 10 * 24 * 3_600_000,
         "event_type": "view", "value": 50.0}))

    def drain():
        q = sp.run_to_parquet(
            sp.seasonal_gate_stream(sp.stream_events(spark, str(src)),
                                    profile),
            str(out), str(ck))
        q.awaitTermination()
        return sorted(r["event_id"] for r in
                      spark.read.parquet(str(out)).collect())

    assert drain() == [1]
    assert drain() == [1]          # restart, no new files: no reprocess
    (src / "b.json").write_text(_json.dumps(
        {"event_id": 2, "user_id": 1, "ts_ms": 11 * 24 * 3_600_000,
         "event_type": "view", "value": 55.0}))
    assert drain() == [1, 2]       # only the new file scored


def test_sprt_stream_matches_batch_sprt_ab(spark, tmp_path):
    """The live SPRT == the banked batch operator on a one-drain replay:
    identical cumulative counts, 6dp-identical LLR (the stream adds
    counts x the same inlined constants, so only float associativity
    differs), and the same accept_h1 decision on decisive evidence.
    Non-success events are filtered before they reach state."""
    import json as _json

    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.operators import relational

    src = tmp_path / "ev"
    src.mkdir()
    # 20 variant-1 successes (odd user ids) + noise that must not count:
    # non-purchase events from BOTH variants
    rows = [{"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": 2 * i + 1,
             "event_type": "purchase", "value": 1.0} for i in range(20)]
    rows += [{"event_id": 100 + i, "ts_ms": 60_000 * (i + 1),
              "user_id": i, "event_type": "view", "value": 1.0}
             for i in range(30)]
    (src / "e1.json").write_text("\n".join(_json.dumps(r) for r in rows))

    stream = sp.sprt_stream(
        sp.stream_events(spark, str(src))
        .withColumn("experiment", F.lit("exp1"))
        .withColumn("v", (F.col("user_id") % 2).cast("int")),
        variant="v", success=F.col("event_type") == "purchase",
        lift_ratio=1.5)
    q = sp.run_to_memory(stream, "sprt_live", str(tmp_path / "ck"))
    q.awaitTermination()
    got = spark.table("sprt_live").orderBy("n_succ_total").collect()
    final = got[-1]

    batch_df = spark.createDataFrame(
        [(r["ts_ms"], r["event_type"], r["user_id"] % 2) for r in rows],
        "ts_ms long, event_type string, v int")
    want = sorted(relational.sprt_ab(
        batch_df, ts="ts_ms", variant="v",
        success=F.col("event_type") == "purchase",
        lift_ratio=1.5, bin_ms=3_600_000).collect(),
        key=lambda r: r["bin_idx"])[-1]

    assert final["n_succ_total"] == 20
    assert final["n_b_succ_total"] == 20
    assert final["llr_running"] == pytest.approx(
        want["llr_running"], abs=2e-6)
    assert final["decision"] == want["decision"] == "accept_h1"


def test_sprt_stream_decision_sticky_across_restart(spark, tmp_path):
    """A decided sequential test stays decided: drain 1 crosses the H1
    boundary; drain 2 floods contradicting variant-0 successes through
    the SAME checkpoint — the LLR (kept for observability) collapses
    but the decision remains accept_h1, and the counts prove the state
    survived the restart."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    (src / "e1.json").write_text("\n".join(_json.dumps(
        {"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": 2 * i + 1,
         "event_type": "purchase", "value": 1.0}) for i in range(20)))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        stream = sp.sprt_stream(
            sp.stream_events(spark, str(src))
            .withColumn("experiment", F.lit("exp1"))
            .withColumn("v", (F.col("user_id") % 2).cast("int")),
            variant="v", success=F.col("event_type") == "purchase",
            lift_ratio=1.5)
        q = sp.run_to_parquet(stream, out, ck)
        q.awaitTermination()

    drain()
    first = spark.read.parquet(out).collect()
    assert len(first) == 1 and first[0]["decision"] == "accept_h1"

    (src / "e2.json").write_text("\n".join(_json.dumps(
        {"event_id": 100 + i, "ts_ms": 60_000 * (30 + i), "user_id": 2 * i,
         "event_type": "purchase", "value": 1.0}) for i in range(40)))
    drain()
    rows = sorted(spark.read.parquet(out).collect(),
                  key=lambda r: r["n_succ_total"])
    final = rows[-1]
    assert final["n_succ_total"] == 60 and final["n_b_succ_total"] == 20
    assert final["llr_running"] < 0       # evidence now points the other way
    assert final["decision"] == "accept_h1"  # but the test already ended


def test_sprt_stream_rejects_non_binary_variant(spark, tmp_path):
    """Variant values outside {0, 1} among successes fail the stream,
    mirroring the batch operator's in-plan raise; eager parameter
    validation mirrors it too."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    (src / "e1.json").write_text(_json.dumps(
        {"event_id": 1, "ts_ms": 60_000, "user_id": 1,
         "event_type": "purchase", "value": 1.0}))

    with pytest.raises(ValueError, match="lift_ratio"):
        sp.sprt_stream(
            sp.stream_events(spark, str(src))
            .withColumn("experiment", F.lit("x"))
            .withColumn("v", F.lit(1)),
            variant="v", success=F.col("event_type") == "purchase",
            lift_ratio=1.0)

    stream = sp.sprt_stream(
        sp.stream_events(spark, str(src))
        .withColumn("experiment", F.lit("x"))
        .withColumn("v", F.lit(3)),   # not a {0, 1} assignment
        variant="v", success=F.col("event_type") == "purchase")
    q = sp.run_to_memory(stream, "sprt_bad", str(tmp_path / "ck"))
    with pytest.raises(Exception, match="binary"):
        q.awaitTermination()


def test_srm_stream_matches_batch_srm_check(spark, tmp_path):
    """The live SRM gate == the batch operator over the union of drained
    data (identical per-variant rows to the digit), and the interim look
    shows the documented transient: drain 1 is all variant 0 (absent
    declared variant contributes its E*N term, flag fires), drain 2
    rebalances and the flag CLEARS — chi-square is per-look, no
    stopping rule."""
    import json as _json

    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.operators import relational

    src = tmp_path / "ev"
    src.mkdir()
    (src / "e1.json").write_text("\n".join(_json.dumps(
        {"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": 2 * i,
         "event_type": "view", "value": 1.0}) for i in range(100)))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        stream = sp.srm_stream(
            sp.stream_events(spark, str(src))
            .withColumn("experiment", F.lit("exp1"))
            .withColumn("v", (F.col("user_id") % 2).cast("int")),
            variant="v", expected={0: 0.5, 1: 0.5}, chi2_threshold=3.841)
        q = sp.run_to_parquet(stream, out, ck)
        q.awaitTermination()

    drain()
    look1 = {r["variant"]: r for r in spark.read.parquet(out).collect()}
    assert all(r["look"] == 1 for r in look1.values())
    # all-variant-0 drain: the absent declared variant still contributes
    # (0 - 50)^2/50 = 50, chi2 = 100, flag on — the batch absent-digit
    # semantics, live
    assert look1[1]["n"] == 0
    assert look1[1]["chi_term"] == pytest.approx(50.0)
    assert look1[0]["chi2_total"] == pytest.approx(100.0)
    assert look1[0]["srm_flag"] is True

    (src / "e2.json").write_text("\n".join(_json.dumps(
        {"event_id": 100 + i, "ts_ms": 60_000 * (100 + i),
         "user_id": 2 * i + 1, "event_type": "view", "value": 1.0})
        for i in range(100)))
    drain()
    rows = spark.read.parquet(out).collect()
    # the monotone look counter selects the final look deterministically
    # (r11 advice: chi2-value matching could collide across looks)
    last = max(r["look"] for r in rows)
    assert last == 2
    final = {r["variant"]: r for r in rows if r["look"] == last}
    assert set(final) == {0, 1}
    assert final[0]["srm_flag"] is False      # the transient cleared

    want = {r["variant"]: r for r in relational.srm_check(
        spark.createDataFrame([(i % 2,) for i in range(200)],
                              "variant int"),
        "variant", {0: 0.5, 1: 0.5}, chi2_threshold=3.841).collect()}
    for v in (0, 1):
        got = final[v]
        assert got["n"] == want[v]["n"]
        assert got["observed_share"] == want[v]["observed_share"]
        assert got["chi_term"] == want[v]["chi_term"]
        assert got["chi2_total"] == want[v]["chi2_total"]
        assert got["srm_flag"] == want[v]["srm_flag"]


def test_round_half_up_matches_spark_f_round(spark):
    """The stream twins round state-derived doubles with
    _round_half_up; their batch operators round with F.round
    (HALF_UP on the double's shortest decimal repr). Pin the two
    against each other on the exact divergence class the r11 advice
    flagged: half-way decimals, where Python's built-in round()
    (banker's) disagrees (round(2.675, 2) == 2.67, F.round == 2.68)."""
    from pyspark.sql import functions as F

    values = [2.675, 0.125, 0.135, 2.5, -2.675, -0.125,
              0.0000005, 1.0000005, 100.00005, 0.3333335]
    for nd in (2, 4, 6):
        df = spark.createDataFrame([(v,) for v in values], "x double")
        want = [r[0] for r in
                df.select(F.round("x", nd)).collect()]
        got = [sp._round_half_up(v, nd) for v in values]
        assert got == want, (nd, list(zip(values, got, want)))
    assert sp._round_half_up(None, 6) is None
    # the named divergence: banker's would give 2.67 here
    assert sp._round_half_up(2.675, 2) == 2.68
    # non-finite parity (r12 advice): F.round passes NaN/±inf through;
    # the helper must too, not die in Decimal.quantize
    import math as _math
    nonfinite = [float("nan"), float("inf"), float("-inf")]
    df = spark.createDataFrame([(v,) for v in nonfinite], "x double")
    want_nf = [r[0] for r in df.select(F.round("x", 2)).collect()]
    got_nf = [sp._round_half_up(v, 2) for v in nonfinite]
    assert _math.isnan(want_nf[0]) and _math.isnan(got_nf[0])
    assert got_nf[1:] == want_nf[1:] == [float("inf"), float("-inf")]
    # seeded randomized pin (a slice of the 240k clean sweep recorded
    # in the helper's docstring): mixed magnitudes plus values
    # engineered to land near a 6dp half boundary, where a JVM
    # non-shortest Double.toString (pre-JDK-19) could diverge
    import random
    rng = random.Random(42)
    rand = ([rng.uniform(-1e6, 1e6) for _ in range(700)]
            + [rng.uniform(-1, 1) for _ in range(700)]
            + [(rng.randrange(-10**9, 10**9) + 0.5) / 10**6
               * rng.choice([1, 1e-3, 1e3]) for _ in range(600)])
    df = spark.createDataFrame([(v,) for v in rand], "x double")
    want6 = [r[0] for r in df.select(F.round("x", 6)).collect()]
    got6 = [sp._round_half_up(v, 6) for v in rand]
    assert got6 == want6


def test_srm_stream_k3_numeric_variants_match_batch_exactly(spark,
                                                            tmp_path):
    """k = 3 NUMERIC variants whose str() order ([0, 10, 2]) differs
    from their native order ([0, 2, 10]): the stream must sum its
    chi-square terms in the BATCH operator's native ascending variant
    order (float addition is non-associative and srm_flag compares the
    unrounded chi2 to the threshold — the r12 review finding); every
    per-variant column must equal the batch to the digit."""
    import json as _json

    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.operators import relational

    src = tmp_path / "ev"
    src.mkdir()
    # user_id % 4 -> variants 0, 2, 10, 10 (so 10 gets ~half)
    rows = [{"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": i,
             "event_type": "view", "value": 1.0} for i in range(97)]
    (src / "e1.json").write_text("\n".join(_json.dumps(r) for r in rows))
    variant = (F.when(F.col("user_id") % 4 == 0, 0)
               .when(F.col("user_id") % 4 == 1, 2)
               .otherwise(10).cast("int"))
    expected = {0: 0.25, 2: 0.25, 10: 0.5}

    stream = sp.srm_stream(
        sp.stream_events(spark, str(src))
        .withColumn("experiment", F.lit("exp1"))
        .withColumn("v", variant),
        variant="v", expected=expected, chi2_threshold=5.991)
    q = sp.run_to_memory(stream, "srm_k3", str(tmp_path / "ck"))
    q.awaitTermination()
    got = {r["variant"]: r for r in spark.table("srm_k3").collect()}

    want = {r["variant"]: r for r in relational.srm_check(
        spark.createDataFrame(
            [(0 if i % 4 == 0 else 2 if i % 4 == 1 else 10,)
             for i in range(97)], "variant int"),
        "variant", expected, chi2_threshold=5.991).collect()}
    assert set(got) == set(want) == {0, 2, 10}
    for v in (0, 2, 10):
        for c in ("n", "expected_share", "observed_share", "chi_term",
                  "chi2_total", "dof", "srm_flag"):
            assert got[v][c] == want[v][c], (v, c, got[v][c], want[v][c])


def test_srm_stream_rejects_undeclared_and_validates_eagerly(spark,
                                                             tmp_path):
    """An observed variant outside the declared set (here: a NULL from a
    broken assignment path) fails the stream like the batch in-plan
    raise; parameter validation mirrors srm_check eagerly."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    (src / "e1.json").write_text(_json.dumps(
        {"event_id": 1, "ts_ms": 60_000, "user_id": 1,
         "event_type": "view", "value": 1.0}))

    base = (sp.stream_events(spark, str(src))
            .withColumn("experiment", F.lit("x")))
    with pytest.raises(ValueError, match="sum to 1"):
        sp.srm_stream(base.withColumn("v", F.lit(0)), variant="v",
                      expected={0: 0.5, 1: 0.6}, chi2_threshold=3.841)
    with pytest.raises(ValueError, match=">= 2"):
        sp.srm_stream(base.withColumn("v", F.lit(0)), variant="v",
                      expected={0: 1.0}, chi2_threshold=3.841)
    # mixed-type declared keys can't define the chi2 summation order —
    # a named ValueError, not a bare TypeError from sorted() (r12
    # advice)
    with pytest.raises(ValueError, match="mutually orderable"):
        sp.srm_stream(base.withColumn("v", F.lit(0)), variant="v",
                      expected={0: 0.5, "1": 0.5}, chi2_threshold=3.841)

    stream = sp.srm_stream(
        base.withColumn("v", F.lit(None).cast("int")),
        variant="v", expected={0: 0.5, 1: 0.5}, chi2_threshold=3.841)
    q = sp.run_to_memory(stream, "srm_bad", str(tmp_path / "ck"))
    with pytest.raises(Exception, match="not declared"):
        q.awaitTermination()


def test_experiment_streams_keep_independent_state_per_key(spark,
                                                           tmp_path):
    """The 'thousand concurrent experiments' claim, concretely: two
    experiments share one stream and one checkpoint; each gets its own
    SPRT state (opposite decisions from opposite evidence) and its own
    SRM counts, with no cross-talk."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    rows = []
    # exp A: 20 variant-1 successes (odd users) -> accept_h1
    rows += [{"event_id": i, "ts_ms": 60_000 * (i + 1),
              "user_id": 2 * i + 1, "event_type": "purchase", "value": 1.0}
             for i in range(20)]
    # exp B: 20 variant-0 successes (even users) -> accept_h0
    rows += [{"event_id": 100 + i, "ts_ms": 60_000 * (i + 1),
              "user_id": 2 * i, "event_type": "purchase", "value": 1.0}
             for i in range(20)]
    (src / "e1.json").write_text("\n".join(_json.dumps(r) for r in rows))

    tagged = (sp.stream_events(spark, str(src))
              .withColumn("experiment",
                          F.when(F.col("event_id") < 100, F.lit("A"))
                           .otherwise(F.lit("B")))
              .withColumn("v", (F.col("user_id") % 2).cast("int")))
    q = sp.run_to_memory(
        sp.sprt_stream(tagged, variant="v",
                       success=F.col("event_type") == "purchase",
                       lift_ratio=1.5),
        "sprt_multi", str(tmp_path / "ck1"))
    q.awaitTermination()
    got = {r["experiment"]: r for r in spark.table("sprt_multi").collect()}
    assert got["A"]["decision"] == "accept_h1"
    assert got["B"]["decision"] == "accept_h0"
    assert got["A"]["n_succ_total"] == got["B"]["n_succ_total"] == 20
    assert (got["A"]["n_b_succ_total"] == 20
            and got["B"]["n_b_succ_total"] == 0)

    q = sp.run_to_memory(
        sp.srm_stream(tagged, variant="v", expected={0: 0.5, 1: 0.5},
                      chi2_threshold=3.841),
        "srm_multi", str(tmp_path / "ck2"))
    q.awaitTermination()
    srm = {(r["experiment"], r["variant"]): r
           for r in spark.table("srm_multi").collect()}
    assert srm[("A", 1)]["n"] == 20 and srm[("A", 0)]["n"] == 0
    assert srm[("B", 0)]["n"] == 20 and srm[("B", 1)]["n"] == 0
    assert srm[("A", 0)]["srm_flag"] is True   # both splits are broken,
    assert srm[("B", 1)]["srm_flag"] is True   # each in its own direction


def test_srm_stream_rejects_changed_split_across_restart(spark, tmp_path):
    """The checkpointed counts array is only meaningful under the split
    that built it: the split is fingerprinted into state, so a restart
    under ANY different 'expected' — resized OR same-size reshared —
    raises instead of silently mis-attributing counts. A changed
    chi2_threshold alone is deliberately allowed (it gates the flag,
    not the state's meaning)."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    (src / "e1.json").write_text("\n".join(_json.dumps(
        {"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": i,
         "event_type": "view", "value": 1.0}) for i in range(10)))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain(expected, thresh=7.815):
        stream = sp.srm_stream(
            sp.stream_events(spark, str(src))
            .withColumn("experiment", F.lit("exp1"))
            .withColumn("v", (F.col("user_id") % 2).cast("int")),
            variant="v", expected=expected, chi2_threshold=thresh)
        q = sp.run_to_parquet(stream, out, ck)
        q.awaitTermination()

    drain({0: 0.5, 1: 0.5})
    assert len(spark.read.parquet(out).collect()) == 2

    (src / "e2.json").write_text(_json.dumps(
        {"event_id": 99, "ts_ms": 60_000 * 99, "user_id": 0,
         "event_type": "view", "value": 1.0}))
    with pytest.raises(Exception, match="split changed"):
        drain({0: 0.4, 1: 0.4, 2: 0.2})     # resized
    with pytest.raises(Exception, match="split changed"):
        drain({0: 0.9, 1: 0.1})             # same size, reshared
    drain({0: 0.5, 1: 0.5}, thresh=3.841)   # threshold-only: fine
    assert max(r["n"] for r in spark.read.parquet(out).collect()) == 6


def test_sprt_stream_rejects_changed_hypothesis_across_restart(
        spark, tmp_path):
    """(lift_ratio, alpha, beta) are fingerprinted into the SPRT state:
    restarting the same checkpoint under a different hypothesis raises
    instead of silently re-scoring the persisted LLR under new
    boundaries (which would void the alpha/beta guarantees)."""
    import json as _json

    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    (src / "e1.json").write_text("\n".join(_json.dumps(
        {"event_id": i, "ts_ms": 60_000 * (i + 1), "user_id": 2 * i + 1,
         "event_type": "purchase", "value": 1.0}) for i in range(5)))
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain(lift):
        stream = sp.sprt_stream(
            sp.stream_events(spark, str(src))
            .withColumn("experiment", F.lit("exp1"))
            .withColumn("v", (F.col("user_id") % 2).cast("int")),
            variant="v", success=F.col("event_type") == "purchase",
            lift_ratio=lift)
        q = sp.run_to_parquet(stream, out, ck)
        q.awaitTermination()

    drain(1.5)
    (src / "e2.json").write_text(_json.dumps(
        {"event_id": 99, "ts_ms": 60_000 * 99, "user_id": 1,
         "event_type": "purchase", "value": 1.0}))
    with pytest.raises(Exception, match="different SPRT parameters"):
        drain(2.0)


# ---------------------------------------------------------------------------
# Streaming plan audits (r17 optimization round): pin the EXECUTED plan
# shape and the state-store row counts the docstrings promise, the same
# way the batch paths pin their plans in test_plans.py. The plan string
# is the last trigger's executed physical plan (what
# StreamingQuery.explain() prints); state rows come from
# lastProgress["stateOperators"]. Observability only — no semantics.
# ---------------------------------------------------------------------------


def _executed_plan(q) -> str:
    """Executed physical plan of the query's last trigger, returned
    instead of printed (explainInternal backs StreamingQuery.explain)."""
    return q._jsq.explainInternal(False)


def _state_rows(q) -> list[int]:
    """numRowsTotal per stateful operator in the final progress."""
    return [op["numRowsTotal"] for op in q.lastProgress["stateOperators"]]


def test_seasonal_gate_stream_plan_broadcast_joins_profile(spark, tmp_path):
    """The stream-static seasonal gate must BROADCAST its <= cycle-row
    profile (a sort-merge join would shuffle the event stream every
    micro-batch) and carry no state store — the executed plan is the
    audit, not the docstring."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.operators import relational

    src = tmp_path / "ev"
    src.mkdir()
    rows = [{"event_id": i, "user_id": 1 + i % 3,
             "ts_ms": (i * 24 + (i % 2) * 12) * 3_600_000,
             "event_type": "view", "value": 10.0 + (i % 3) * 0.1}
            for i in range(20)]
    _write_events(src / "e1.json", rows)
    profile = relational.seasonal_profile(
        spark.createDataFrame(
            [(r["event_id"], r["ts_ms"], r["value"]) for r in rows],
            "event_id long, ts_ms long, value double"),
        "ts_ms", "value")

    q = sp.run_to_memory(
        sp.seasonal_gate_stream(sp.stream_events(spark, str(src)), profile),
        "sg_plan_audit", str(tmp_path / "ck"))
    q.awaitTermination()
    plan = _executed_plan(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "StateStore" not in plan          # stateless, as documented
    assert q.lastProgress["stateOperators"] == []


def test_quality_gate_stream_plan_is_scan_side_stateless(spark, tmp_path):
    """quality_gate_stream promises pure scan-side column algebra: the
    executed micro-batch plan must have NO exchange, NO join, and NO
    state store — the score rides the read stage."""
    from pyspark.sql import types as T

    src = tmp_path / "docs"
    src.mkdir()
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in [
        {"doc_id": 1, "text": "clean useful prose with several words"},
        {"doc_id": 2, "text": ""},
    ]))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    q = sp.run_to_memory(
        sp.quality_gate_stream(spark.readStream.schema(schema)
                               .json(str(src))),
        "qg_plan_audit", str(tmp_path / "ck"))
    q.awaitTermination()
    plan = _executed_plan(q)
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "StateStore" not in plan
    assert q.lastProgress["stateOperators"] == []


def test_anomaly_stream_state_rows_are_per_key(spark, tmp_path):
    """The rolling detector's state is ONE row per user (holding the
    O(w) ring), never a row per event: 60 events over 3 users must
    leave exactly 3 state rows after the drain."""
    src = tmp_path / "ev"
    src.mkdir()
    _write_events(src / "e1.json",
                  [_event(i, 60_000 * (i + 1), user=1 + i % 3,
                          value=float(i % 7))
                   for i in range(60)])
    q = sp.run_to_memory(
        sp.anomaly_stream(sp.stream_events(spark, str(src)),
                          w=5, z_thresh=3.0, min_n=4),
        "an_state_audit", str(tmp_path / "ck"))
    q.awaitTermination()
    assert _state_rows(q) == [3]
    assert "FlatMapGroupsInPandasWithState" in _executed_plan(q)


def test_srm_stream_state_rows_are_per_experiment(spark, tmp_path):
    """SRM state is O(k) counts per EXPERIMENT: two experiments sharing
    one stream leave exactly 2 state rows regardless of event volume."""
    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    _write_events(src / "e1.json",
                  [_event(i, 60_000 * (i + 1), user=i) for i in range(80)])
    stream = sp.srm_stream(
        sp.stream_events(spark, str(src))
        .withColumn("experiment",
                    F.when(F.col("user_id") % 2 == 0, "expA")
                    .otherwise("expB"))
        .withColumn("v", ((F.col("user_id") % 4) < 2).cast("int")),
        variant="v", expected={0: 0.5, 1: 0.5}, chi2_threshold=3.841)
    q = sp.run_to_memory(stream, "srm_state_audit", str(tmp_path / "ck"))
    q.awaitTermination()
    assert _state_rows(q) == [2]


def test_sprt_stream_state_rows_are_per_experiment(spark, tmp_path):
    """SPRT state is O(1) per experiment (counts + llr + decision): two
    experiments leave exactly 2 state rows after a shared drain."""
    from pyspark.sql import functions as F

    src = tmp_path / "ev"
    src.mkdir()
    _write_events(src / "e1.json",
                  [_event(i, 60_000 * (i + 1), user=i, etype="purchase")
                   for i in range(40)])
    stream = sp.sprt_stream(
        sp.stream_events(spark, str(src))
        .withColumn("experiment",
                    F.when(F.col("user_id") % 2 == 0, "expA")
                    .otherwise("expB"))
        .withColumn("v", ((F.col("user_id") % 4) < 2).cast("int")),
        variant="v", success=F.col("event_type") == "purchase")
    q = sp.run_to_memory(stream, "sprt_state_audit", str(tmp_path / "ck"))
    q.awaitTermination()
    assert _state_rows(q) == [2]


def test_token_drift_stream_state_rows_bounded_by_active_vocab(
        spark, tmp_path):
    """Drift state is keyed on (window, term) with BOTH sides sharing
    one row as conditional sums: one open window over a 3-term
    vocabulary holds exactly 3 state rows, however many documents or
    token occurrences arrived."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = tmp_path / "docs"
    src.mkdir()
    docs = [{"doc_id": i, "ts_ms": 60_000 * (1 + i % 5), "side": i % 2,
             "text": "alpha beta alpha gamma"} for i in range(30)]
    (src / "d1.json").write_text("\n".join(json.dumps(d) for d in docs))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("side", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    stream = (spark.readStream.schema(schema).json(str(src))
              .withColumn("ts", F.timestamp_millis(F.col("ts_ms"))))
    q = sp.run_to_memory(sp.token_drift_stream(stream), "td_state_audit",
                         str(tmp_path / "ck"), output_mode="complete")
    q.awaitTermination()
    # all docs land in the single hour-0 window, which stays open (the
    # watermark never passes its end), so every (window, term) state row
    # is still live: exactly the 3-term vocabulary.
    assert _state_rows(q) == [3]
