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
