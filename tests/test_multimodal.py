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


def _ppm(w, h, rgb_fn):
    body = bytes(c for y in range(h) for x in range(w) for c in rgb_fn(x, y))
    return f"P6 {w} {h} 255\n".encode() + body


def _bmp24(w, h, rgb_fn):
    """Minimal uncompressed 24-bit BMP: bottom-up rows, 4-byte padded."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = b""
    for y in reversed(range(h)):  # bottom-up
        row = bytes(c for x in range(w) for c in reversed(rgb_fn(x, y)))  # BGR
        body += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                            0, 0, 0, 0))
    return header + body


def _grad(x, y):
    return ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)


def test_decode_image_real_formats(spark):
    rows = [(0, _ppm(6, 4, _grad)), (1, _bmp24(5, 3, _grad)),
            (2, PNG), (3, b"junk")]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    out = {r["doc_id"]: r for r in multimodal.decode_image(df).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["mode"]) == (6, 4, "RGB")
    assert (out[1]["width"], out[1]["height"], out[1]["mode"]) == (5, 3, "RGB")
    assert out[2]["mode"] == "UNSUPPORTED"  # PNG needs PIL
    assert out[3]["mode"] == "UNSUPPORTED"


def test_bmp_and_ppm_decode_to_identical_pixels():
    """Same logical image through both parsers -> same RGB array (proves
    BGR swap, bottom-up flip, and row padding are all handled)."""
    p = multimodal._parse_ppm(_ppm(5, 3, _grad))
    b = multimodal._parse_bmp(_bmp24(5, 3, _grad))
    assert p[0:2] == b[0:2] == (5, 3)
    assert (p[2] == b[2]).all()


def test_resize_image_nearest_neighbor_roundtrip(spark):
    rows = [(0, _ppm(8, 8, _grad)), (1, b"junk")]
    df = spark.createDataFrame(rows, ["doc_id", "content"])
    out = multimodal.resize_image(df, width=4, height=2).collect()
    assert [r["doc_id"] for r in out] == [0]  # unsupported row dropped
    r = out[0]
    assert (r["width"], r["height"]) == (4, 2)
    # output is itself valid PPM; spot-check nearest-neighbor pixels
    w, h, px = multimodal._parse_ppm(bytes(r["content"]))
    assert (w, h) == (4, 2)
    assert tuple(px[0, 0]) == _grad(0, 0)
    assert tuple(px[1, 3]) == _grad((3 * 8) // 4, (1 * 8) // 2)


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


def test_binary_file_source_feeds_decode(spark, tmp_path):
    """End-to-end multimodal intake: raw .ppm files on disk -> the
    binaryFile source (path/length/content rows, extension-pruned via
    pathGlobFilter) -> the existing numpy PPM decoder. The .txt decoy
    must be pruned by the glob, and decoded dimensions must match the
    written images."""
    from pyspark.sql import functions as F

    from data_pipeline_eng_project_1_spark.sources import files as src

    d = tmp_path / "media"
    (d / "sub").mkdir(parents=True)
    (d / "a.ppm").write_bytes(_ppm(6, 4, _grad))
    (d / "sub" / "b.ppm").write_bytes(_ppm(3, 5, _grad))
    (d / "decoy.txt").write_text("not an image")

    df = src.read_binary_files(spark, str(d), glob="*.ppm")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 2 and all(r["path"].endswith(".ppm") for r in rows)
    assert all(r["length"] == len(bytes(r["content"])) for r in rows)

    dims = {}
    for r in rows:
        w, h, _px = multimodal._parse_ppm(bytes(r["content"]))
        dims[r["path"].rsplit("/", 1)[-1]] = (w, h)
    assert dims == {"a.ppm": (6, 4), "b.ppm": (3, 5)}

    # and the Arrow-batch decode operator runs on the sourced frame
    payload = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"))
    meta = {r["doc_id"]: r for r in
            multimodal.extract_binary_meta(
                payload, id_col="doc_id", payload_col="payload").collect()}
    assert len(meta) == 2


def _wav(rate, seconds, amp=0.5, freq=440.0, channels=1):
    """Minimal RIFF/WAVE PCM16 with a constant-amplitude sine."""
    import math
    import struct

    n = int(rate * seconds)
    frames = bytearray()
    for i in range(n):
        v = int(amp * 32767 * math.sin(2 * math.pi * freq * i / rate))
        frames += struct.pack("<h", v) * channels
    block = 2 * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    data = bytes(frames)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_audio_meta_and_unsupported(spark):
    rows = [(0, _wav(8000, 0.25)), (1, _wav(16000, 0.5, channels=2)),
            (2, b"not audio at all")]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in multimodal.decode_audio(df).collect()}
    assert out[0]["mode"] == "PCM" and out[0]["sample_rate"] == 8000
    assert out[0]["n_frames"] == 2000 and abs(out[0]["duration_ms"] - 250) < 1e-9
    assert out[1]["channels"] == 2 and out[1]["n_frames"] == 8000
    assert out[2]["mode"] == "UNSUPPORTED"


def test_audio_features_rms_of_known_sine(spark):
    """A constant-amplitude sine has RMS ~ amp/sqrt(2) in every window
    and peak ~ amp; a near-silent clip screens out by rms_mean."""
    rows = [(0, _wav(8000, 1.0, amp=0.5)), (1, _wav(8000, 1.0, amp=0.001)),
            (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in multimodal.audio_features(df).collect()}
    assert set(out) == {0, 1}  # junk dropped
    assert out[0]["n_windows"] == 10  # 1 s / 100 ms
    assert abs(out[0]["rms_mean"] - 0.5 / 2 ** 0.5) < 0.01
    assert abs(out[0]["peak"] - 0.5) < 0.01
    assert out[1]["rms_mean"] < 0.001


def test_image_ahash_known_image_and_dup_groups(spark):
    """aHash bits verified against a hand-computed 4x2 PPM; identical
    payloads land in one hash group, a visually different payload lands
    in another."""
    from data_pipeline_eng_project_1_spark.operators import multimodal

    def ppm(pixels):  # pixels: flat list of (r, g, b)
        body = bytes([c for px in pixels for c in px])
        return b"P6 4 2 255\n" + body

    # left half dark (0), right half bright (200): bits for quadrants
    # 1 (top-right) and 3 (bottom-right) only -> phash = 0b1010 = 10
    row = [(0, 0, 0), (0, 0, 0), (200, 200, 200), (200, 200, 200)]
    bright_right = ppm(row + row)
    flat = ppm([(7, 7, 7)] * 8)  # uniform: no block exceeds the mean
    rows = [(1, bytearray(bright_right)), (2, bytearray(bright_right)),
            (3, bytearray(flat)), (4, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r.doc_id: r for r in multimodal.image_ahash(df).collect()}
    assert set(got) == {1, 2, 3}  # undecodable row dropped
    assert got[1].phash == got[2].phash == 10
    assert got[3].phash == 0
    assert (got[1].width, got[1].height) == (4, 2)


def test_audio_fingerprint_codes_and_dedup(spark):
    """Known-amplitude sine: rms = amp/sqrt(2) per window, so the code is
    floor(amp/sqrt(2) * 64); identical payloads produce identical fp,
    different amplitude a different fp; junk is dropped."""
    rows = [(0, _wav(8000, 1.0, amp=0.5)), (1, _wav(8000, 1.0, amp=0.5)),
            (2, _wav(8000, 1.0, amp=0.9)), (3, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in
           multimodal.audio_fingerprint(df).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n_windows"] == 10
    codes = out[0]["fp"].split(",")
    assert len(codes) == 10
    # sine rms ~ 0.5/sqrt(2) ~ 0.3535 -> floor(0.3535 * 64) = 22 (+-1 for
    # quantized sine harmonics)
    assert all(abs(int(c) - 22) <= 1 for c in codes)
    assert out[0]["fp"] == out[1]["fp"]
    assert out[0]["fp"] != out[2]["fp"]


def test_audio_fingerprint_full_scale_clamps(spark):
    """A full-scale square-ish clip pushes rms toward 1.0: codes must
    clamp at levels-1, never reach levels."""
    import struct

    n = 800
    frames = b"".join(struct.pack("<h", 32767) for _ in range(n))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    df = spark.createDataFrame([(0, wav)], "doc_id long, content binary")
    out = multimodal.audio_fingerprint(df).collect()[0]
    assert out["fp"] == "63"
