"""Unit tests for the multimodal binary-column plumbing."""

import pytest

from data_pipeline_eng_project_1_spark.operators import multimodal

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
JPEG = b"\xff\xd8\xff\xe0" + b"\x01" * 8
WAV = b"RIFF" + b"\x02" * 12


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(0, PNG), (1, JPEG), (2, WAV), (3, b"plain text bytes")]
    return spark.createDataFrame(rows, ["doc_id", "content"])


def test_extract_binary_meta(payloads):
    meta = {r["doc_id"]: r for r in
            multimodal.extract_binary_meta(payloads).collect()}
    assert meta[0]["byte_len"] == len(PNG)
    assert meta[0]["head_hex"] == "89504E47"
    assert meta[3]["head_hex"] == b"plai".hex().upper()


def test_sniff_modality(payloads):
    meta = multimodal.extract_binary_meta(payloads)
    mod = {r["doc_id"]: r["modality"]
           for r in multimodal.sniff_modality(meta).collect()}
    assert mod == {0: "PNG", 1: "JPEG", 2: "RIFF", 3: "UNKNOWN"}


def test_text_payload_roundtrip(spark):
    df = spark.createDataFrame([(7, "héllo")], ["doc_id", "text"])
    out = multimodal.extract_binary_meta(
        multimodal.with_binary_payload(df)).collect()[0]
    assert out["byte_len"] == len("héllo".encode())  # utf-8 bytes, not chars


def test_native_meta_matches_pandas_template(payloads):
    """The codegen path and the mapInPandas decode template must agree on
    the shared output contract."""
    a = sorted(multimodal.extract_binary_meta(payloads).collect())
    b = sorted(multimodal.extract_binary_meta_native(payloads).collect())
    assert a == b


def test_decode_image_is_stubbed(payloads):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(payloads)
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(payloads)


def test_extract_features_contract(payloads):
    out = {r["doc_id"]: r["feature"]
           for r in multimodal.extract_features(payloads, dim=8).collect()}
    assert set(out) == {0, 1, 2, 3}
    for vec in out.values():
        assert len(vec) == 8
        assert abs(sum(vec) - 1.0) < 1e-5  # normalized histogram
    # deterministic: same payload → same vector
    again = {r["doc_id"]: r["feature"]
             for r in multimodal.extract_features(payloads, dim=8).collect()}
    assert out == again


def test_extract_features_joins_into_similarity(payloads):
    """The fake featurizer's output must be directly consumable by the
    vector operators (array<float> column, one row per doc)."""
    from data_pipeline_eng_project_1_spark.functions import vectors
    from pyspark.sql import functions as F

    feats = multimodal.extract_features(payloads, dim=8)
    norms = feats.select("doc_id", vectors.l2_norm(F.col("feature")).alias("l2"))
    assert all(r["l2"] >= 0 for r in norms.collect())


def test_sample_frames_fanout(payloads):
    frames = multimodal.sample_frames(payloads, n_frames=4,
                                      frame_bytes=8).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1, 2, 3}
    for rows in by_doc.values():
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
        assert all(len(r["frame"]) <= 8 for r in rows)
    # first frame starts at offset 0 of the payload
    first = {r["doc_id"]: r["frame"] for r in frames if r["frame_idx"] == 0}
    assert first[0] == PNG[:8]
