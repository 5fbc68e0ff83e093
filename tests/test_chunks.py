"""Document chunking: the native column-algebra chunker and its Python
UDTF twin must produce identical spans, including on edge-case inputs the
fixture corpus doesn't contain (empty, shorter-than-size, exact-multiple)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_eng_project_1_spark.functions import texts, udtfs

EDGE_TEXTS = [
    (1, ""),                      # empty -> no chunks
    (2, "ab"),                    # shorter than size -> one chunk
    (3, "x" * 12),                # exact multiple of step
    (4, "y" * 13),                # one char past a step boundary
    (5, "hello world this is a test of chunking"),
    (6, None),                    # null -> no chunks
]
SIZE, STEP = 8, 6


def _native(spark, df):
    return (
        df.filter(F.length("text") > 0)
        .select("doc_id",
                F.explode(texts.chunk_spans(F.col("text"), SIZE, STEP)).alias("c"))
        .select("doc_id", "c.chunk_start", "c.chunk")
    )


def _via_udtf(spark, df):
    udtfs.register_all(spark)
    df.createOrReplaceTempView("chunk_in")
    return spark.sql(
        f"SELECT doc_id, chunk_start, chunk "
        f"FROM chunk_in, LATERAL chunk_document(text, {SIZE}, {STEP})"
    )


@pytest.fixture()
def edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id int, text string")


def test_native_matches_udtf_on_edges(spark, edge_df):
    a = sorted(map(tuple, _native(spark, edge_df).collect()))
    b = sorted(map(tuple, _via_udtf(spark, edge_df).collect()))
    assert a == b and len(a) > 0


def test_native_matches_udtf_on_fixture_docs(spark):
    from data_pipeline_eng_project_1_spark.sources import catalog
    docs = catalog.load_table(spark, "documents", "/root/testdata/sf0.001") \
        .select("doc_id", "text")
    a = sorted(map(tuple, _native(spark, docs).collect()))
    b = sorted(map(tuple, _via_udtf(spark, docs).collect()))
    assert a == b and len(a) >= docs.count()


def test_chunk_overlap_and_coverage(spark, edge_df):
    rows = _native(spark, edge_df).filter(F.col("doc_id") == 5).collect()
    starts = sorted(r.chunk_start for r in rows)
    # starts advance by exactly STEP and the reassembled prefixes cover the doc
    assert starts == list(range(0, 39, STEP))
    text = dict(EDGE_TEXTS)[5]
    for r in rows:
        assert r.chunk == text[r.chunk_start:r.chunk_start + SIZE]
