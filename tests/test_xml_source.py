"""XML intake parity (sources/xml_source.py): the same match dump
published as XML must flow through the UNCHANGED downstream plan and
produce byte-identical tables to the JSON path — format is an intake
option, not a pipeline fork (reference hard-wires json.loads,
dags/utils.py:54-71)."""

import json

import pytest

from data_pipeline_eng_project_1_spark.plans import flashscore
from data_pipeline_eng_project_1_spark.sources.json_source import read_matches
from data_pipeline_eng_project_1_spark.sources.xml_source import (
    read_matches_xml,
    read_xml,
)
from tests.test_flashscore import _record


def _xml_of(tag, val):
    if val is None:
        return ""  # omitted element -> null (the JSON null twin)
    if isinstance(val, dict):
        inner = "".join(_xml_of(k, v) for k, v in val.items())
        return f"<{tag}>{inner}</{tag}>"
    if isinstance(val, list):
        return "".join(_xml_of(tag, v) for v in val)
    return f"<{tag}>{val}</{tag}>"


def _dump_xml(records, path):
    body = "".join(_xml_of("match", r) for r in records)
    path.write_text(f"<matches>{body}</matches>")


@pytest.fixture(scope="module")
def dumps(tmp_path_factory):
    records = [
        _record(),                                          # clean row
        _record(status="Scheduled", home="Lyon"),           # filtered out
        _record(country=None, home="Lille"),                # na.drop
        _record(home="Nantes", hs="abc"),                   # score -> null
        _record(home="Brest", home_n=10),                   # lineup skipped
        _record(home="Nice", bookmakers=[
            {"bookmaker": "Betclic.fr", "odds": ["1.1", "2.2"]},
            {"bookmaker": "Winamax", "odds": ["2.0", "3.0", "4.0"]},
        ]),
    ]
    d = tmp_path_factory.mktemp("xml_dump")
    (d / "dump.json").write_text(json.dumps(records))
    _dump_xml(records, d / "dump.xml")
    return str(d / "dump.json"), str(d / "dump.xml")


def test_xml_and_json_intakes_produce_identical_tables(spark, dumps):
    """Every downstream table — including the deterministic sha2 match
    ids, the skipped-lineup accounting, and the odds arity nulls — must
    be row-identical whichever format carried the dump."""
    jp, xp = dumps
    jt = flashscore.transform_all(read_matches(spark, jp))
    xt = flashscore.transform_all(read_matches_xml(spark, xp))
    assert set(jt) == set(xt)
    for name in jt:
        jdf, xdf = jt[name], xt[name]
        cols = [c for c in jdf.columns if c != "DATE_LOAD"]  # wall clock
        jrows = sorted(map(tuple, jdf.select(cols).collect()))
        xrows = sorted(map(tuple, xdf.select(cols).collect()))
        assert jrows == xrows, name
        assert len(jrows) > 0, name
        assert jdf.schema == xdf.schema, name


def test_generic_read_xml_respects_explicit_schema(spark, tmp_path):
    from pyspark.sql import types as T

    p = tmp_path / "r.xml"
    p.write_text("<rows><row><id>1</id><v>2.5</v></row>"
                 "<row><id>x</id><v>3.5</v></row></rows>")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.DoubleType())])
    rows = {r["v"]: r["id"]
            for r in read_xml(spark, str(p), "row", schema).collect()}
    # PERMISSIVE keeps the batch alive; NOTE the XML reader nulls the
    # WHOLE malformed record (all fields), unlike JSON's per-field
    # recovery — downstream na.drop/filters handle it the same way
    assert rows == {2.5: 1, None: None}
    assert len(rows) == 2  # no row was dropped


def test_run_pipeline_from_xml_writes_four_tables(spark, dumps, tmp_path):
    _, xp = dumps
    tables = flashscore.run_pipeline(
        spark, xp, str(tmp_path / "out_xml"), mode="overwrite",
        source_format="xml")
    assert set(tables) == {"MATCH_FINISHED", "HOME_STARTING_LINEUP",
                           "AWAY_STARTING_LINEUP", "ODDS"}
    mf = spark.read.parquet(str(tmp_path / "out_xml" / "MATCH_FINISHED"))
    assert mf.count() > 0


def test_streaming_intake_drains_xml_dumps(spark, dumps, tmp_path):
    """The incremental intake (the reference's 8h drain) works on XML
    dumps unchanged: one availableNow drain writes the four tables, a
    re-drain with no new files appends nothing."""
    import shutil

    from data_pipeline_eng_project_1_spark.streaming import pipeline as sp

    _, xp = dumps
    src = tmp_path / "xml_in"
    src.mkdir()
    shutil.copy(xp, src / "dump.xml")

    def drain():
        q = sp.run_matches_pipeline(
            spark, str(src), str(tmp_path / "xml_out"),
            str(tmp_path / "xml_ck"), source_format="xml")
        q.awaitTermination()

    drain()
    mf = spark.read.parquet(str(tmp_path / "xml_out" / "MATCH_FINISHED"))
    n = mf.count()
    assert n > 0
    drain()  # checkpointed: no new files -> no new rows
    assert spark.read.parquet(
        str(tmp_path / "xml_out" / "MATCH_FINISHED")).count() == n
