"""JSONL and ORC edge formats: lossless round-trips, bounded file sizes on
export, and (for ORC) the same scan-level pruning/pushdown as parquet."""

import glob

from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.sources import catalog, files

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return catalog.load_table(spark, "documents", SF_DIR) \
        .select("doc_id", "text", "lang", "source", "n_chars")


def test_jsonl_round_trip_lossless(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "corpus")
    files.write_jsonl(docs, out)
    back = files.read_jsonl(spark, docs.schema, out)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, docs.collect()))


def test_jsonl_max_records_bounds_files(spark, tmp_path):
    docs = _docs(spark).coalesce(1)  # single task -> rolling is the only split
    out = str(tmp_path / "rolled")
    files.write_jsonl(docs, out, max_records_per_file=10)
    parts = glob.glob(out + "/part-*")
    n = docs.count()
    assert len(parts) >= n // 10  # each file capped at 10 records


def test_jsonl_permissive_nulls_bad_lines(spark, tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        'NOT JSON AT ALL\n'
        '{"doc_id": 2, "text": "also ok"}\n')
    schema = "doc_id LONG, text STRING"
    from pyspark.sql import types as T
    back = files.read_jsonl(spark, T._parse_datatype_string(schema), str(p))
    rows = back.collect()
    assert len(rows) == 3  # bad line survives as an all-null row
    assert sum(r.doc_id is not None for r in rows) == 2


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "docs_orc")
    files.write_orc(docs, out)
    back = files.read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, docs.collect()))
    filtered = back.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" not in schema  # column pruning reaches the ORC scan


def test_read_text_corpus_whole_and_line_modes(spark, tmp_path):
    """wholetext: one file -> one doc (the crawl-dump corpus shape,
    pipes straight into the dedup ladder); line mode: one line -> one
    row. Glob prunes extensions in both."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.operators import dedup
    from data_pipeline_eng_project_1_spark.sources import files as src

    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_text("alpha beta gamma\ndelta epsilon")
    (d / "sub" / "b.txt").write_text("alpha beta gamma\ndelta epsilon")
    (d / "c.md").write_text("ignored by the glob")

    docs = src.read_text_corpus(spark, str(d), whole=True, glob="*.txt")
    got = {r["path"].rsplit("/", 1)[-1]: r["text"] for r in docs.collect()}
    assert set(got) == {"a.txt", "b.txt"}
    assert got["a.txt"] == "alpha beta gamma\ndelta epsilon"

    # the sourced corpus feeds dedup directly: both files are exact dups
    keyed = docs.select(F.xxhash64("path").alias("doc_id"), "text")
    kept = dedup.dedup_exact(keyed).count()
    assert kept == 1

    lines = src.read_text_corpus(spark, str(d), whole=False, glob="*.txt")
    assert lines.count() == 4  # 2 files x 2 lines


def test_normalize_events_unifies_all_timestamp_layouts(spark, tmp_path):
    """Fixture-regeneration insurance: the driver's events.parquet has
    shipped as TIMESTAMP(NANOS) in some generations and TIMESTAMP
    (MICROS, NTZ) in others. catalog.load_table must surface identical
    (ts, ts_ms) for the same logical instants whichever layout arrives
    (and for the UTC-adjusted micros variant for good measure)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    instants = [
        datetime.datetime(2024, 1, 1, 0, 0, 7, 179000),
        datetime.datetime(2024, 1, 30, 23, 57, 12, 194000),
        datetime.datetime(2024, 6, 15, 12, 30, 45, 500000),
    ]
    base = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase"]),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    }
    layouts = {
        "ns": pa.array(instants, pa.timestamp("ns")),
        "us_ntz": pa.array(instants, pa.timestamp("us")),
        "us_utc": pa.array(instants, pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for name, ts_arr in layouts.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.table({**base, "ts": ts_arr}), str(d / "events.parquet"))
        df = catalog.load_table(spark, "events", str(d))
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert dict(df.dtypes)["ts_ms"] == "bigint"
        got[name] = sorted(
            (r["event_id"], r["ts"], r["ts_ms"])
            for r in df.select("event_id", "ts", "ts_ms").collect())
    assert got["ns"] == got["us_ntz"] == got["us_utc"]
    # ts_ms is the exact epoch-millis integer of each instant
    want_ms = sorted(
        (i + 1, int(dt.replace(tzinfo=datetime.timezone.utc).timestamp()
                    * 1000))
        for i, dt in enumerate(instants))
    assert [(e, ms) for e, _, ms in got["ns"]] == want_ms
