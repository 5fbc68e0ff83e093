"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video travel as `binary` columns with a struct of typed
metadata beside them. All relational operators treat the payload as opaque
bytes (project/filter/join/partition work unchanged); modality-specific work
happens in Arrow-batched Pandas iterators (`mapInPandas`) so bytes move
columnar, never row-at-a-time.

`decode_image` / `resize_image` are REAL decoders for the two raster
formats parseable without an imaging library (binary PPM, uncompressed
24-bit BMP — numpy struct/slice parsing); compressed formats (PNG/JPEG,
which need the absent PIL) classify as UNSUPPORTED per-row instead of
failing the job, and a PIL body would slot into the same batch iterators.
Everything Spark-side (schema, batch iteration, partition behavior,
output contract) is real and tested.

At 100 TB: payload columns dominate bytes; keep them OUT of shuffles —
extract metadata first, shuffle/join on metadata, and re-join payloads by
key only where needed. `spark.sql.files.maxPartitionBytes` sizes scan
partitions; Arrow batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`)
bounds per-batch memory for fat rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Output contract of extract_binary_meta.
BINARY_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("head_hex", T.StringType()),  # first 4 bytes, upper hex
])

MAGIC_PREFIXES = {
    "PNG": b"\x89PNG",
    "JPEG": b"\xff\xd8\xff",
    "RIFF": b"RIFF",  # wav/avi containers
}


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out: str = "content") -> DataFrame:
    """Fixture adapter: utf-8 encode a text column into a binary payload so
    the multimodal path is exercisable on the driver fixtures (which carry
    no real media)."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "content") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    The pandas function sees columnar batches (pyarrow → pandas zero-ish
    copy); per-batch it runs plain vectorized python over `bytes` objects.
    This is the template every real decoder (image resize, audio resample,
    frame sample) plugs into: same iterator signature, same output-schema
    declaration, different per-batch body.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            payload = pdf["p"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                # .str accessors vectorize over the bytes column — no
                # per-element Python lambdas in the batch body.
                "byte_len": payload.str.len().astype("int64"),
                "head_hex": payload.str[:4].map(bytes.hex).str.upper(),
            })

    return src.mapInPandas(batches, BINARY_META_SCHEMA)


def extract_binary_meta_native(df: DataFrame, id_col: str = "doc_id",
                               payload_col: str = "content") -> DataFrame:
    """Metadata extraction as pure column algebra — same output contract as
    `extract_binary_meta`, but byte length and head bytes need no decoder,
    so they stay JVM-side in whole-stage codegen (no Python workers, no
    Arrow transfer of the payload). Use this whenever the per-payload work
    is expressible with built-ins; reserve the mapInPandas template for
    steps that genuinely need a Python library."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.upper(F.hex(F.substring(F.col(payload_col), 1, 4))).alias("head_hex"),
    )


def sniff_modality(meta: DataFrame, head_col: str = "head_hex") -> DataFrame:
    """Classify payloads by magic bytes (column algebra over the extracted
    metadata — the payload itself is no longer needed)."""
    col = F.col(head_col)
    out = F.lit("UNKNOWN")
    for name, magic in MAGIC_PREFIXES.items():
        prefix = magic.hex().upper()
        out = F.when(col.startswith(prefix), F.lit(name)).otherwise(out)
    return meta.withColumn("modality", out)


#: Output contract of extract_features.
FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

#: Output contract of sample_frames (one row per sampled frame).
FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "content", dim: int = 8) -> DataFrame:
    """Feature extraction over binary payloads: payload → fixed-dim float
    vector, Arrow-batched. The featurizer here is a DETERMINISTIC FAKE
    (per-dimension byte histograms, normalized) standing in for a real
    embedding model — the Spark-side contract (batch iteration, vector
    column output, downstream joinability with the similarity operators) is
    the real deliverable and is what the tests pin down.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats = []
            for b in pdf["p"]:
                arr = np.frombuffer(b, dtype=np.uint8)
                if arr.size == 0:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                # bucket bytes into `dim` value-range histogram bins
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
                feats.append(hist / arr.size)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return src.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "content", n_frames: int = 4,
                  frame_bytes: int = 16) -> DataFrame:
    """Frame sampling over "video" payloads: one input row fans out to
    `n_frames` rows of fixed-size byte slices taken at evenly spaced
    offsets. A real variant swaps the slicer for an av/ffmpeg keyframe
    decoder; the fan-out shape (mapInPandas emitting more rows than it
    reads, frame index column, binary frame column) is identical.
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["p"]):
                n = max(len(b) - frame_bytes, 0)
                for i in range(n_frames):
                    off = (n * i) // max(n_frames - 1, 1) if n else 0
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[off:off + frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return src.mapInPandas(batches, FRAME_SCHEMA)


#: Output contract of decode_image.
DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mode", T.StringType()),  # RGB | UNSUPPORTED
])

#: Output contract of resize_image (payload re-encoded as binary P6 PPM).
RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def _parse_ppm(b: bytes):
    """P6 (binary RGB) PPM → (width, height, HxWx3 uint8 array) or None.

    PPM is the simplest real raster format: an ASCII header
    ``P6 <w> <h> <maxval>\\n`` followed by raw RGB bytes — decodable with
    numpy alone, no imaging library. The parser tolerates comment lines
    (#...) per the spec."""
    import numpy as np

    if not b.startswith(b"P6"):
        return None
    # header = 4 whitespace-separated fields, comments allowed between
    fields, i, n = [], 2, len(b)
    while len(fields) < 3 and i < n:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        fields.append(b[i:j])
        i = j
    i += 1  # single whitespace after maxval
    try:
        w, h, maxval = (int(x) for x in fields)
    except (ValueError, TypeError):
        return None
    if maxval != 255 or w <= 0 or h <= 0 or n - i < w * h * 3:
        return None
    arr = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, arr.reshape(h, w, 3)


def _parse_bmp(b: bytes):
    """Uncompressed 24-bit BMP → (width, height, HxWx3 RGB array) or None.

    Pure header-struct parsing (BITMAPFILEHEADER + BITMAPINFOHEADER) +
    numpy slicing: rows are bottom-up and padded to 4 bytes, pixels are
    BGR — all handled here, no imaging library."""
    import struct

    import numpy as np

    if len(b) < 54 or not b.startswith(b"BM"):
        return None
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flipped = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(b) < data_off + stride * h:
        return None
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if flipped:
        px = px[::-1]
    return w, h, px


def _decode_any(b: bytes):
    return _parse_ppm(b) or _parse_bmp(b)


def decode_image(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "content") -> DataFrame:
    """Decode image payloads to (width, height, mode), Arrow-batched.

    Real decoders for the two library-free raster formats (binary PPM and
    uncompressed 24-bit BMP — numpy struct/slice parsing, see `_parse_ppm`
    / `_parse_bmp`); anything else classifies as UNSUPPORTED rather than
    erroring, so a mixed corpus degrades per-row, not per-job. Compressed
    formats (PNG/JPEG) need PIL — absent here — and would slot into this
    same batch body via `PIL.Image.open(io.BytesIO(b))`."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ws, hs, modes = [], [], []
            for b in pdf["p"]:
                dec = _decode_any(bytes(b))
                if dec is None:
                    ws.append(0); hs.append(0); modes.append("UNSUPPORTED")
                else:
                    ws.append(dec[0]); hs.append(dec[1]); modes.append("RGB")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "mode": modes,
            })

    return src.mapInPandas(batches, DECODE_SCHEMA)


def resize_image(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "content",
                 width: int = 64, height: int = 64) -> DataFrame:
    """Nearest-neighbor resize of PPM/BMP payloads, re-encoded as binary
    PPM (P6). Decode + resize + encode all inside one Arrow batch body —
    payload bytes never leave the executor, and the resize itself is two
    numpy fancy-index gathers (no per-pixel Python). Unsupported payloads
    are dropped (filter upstream with `decode_image` to see which)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        header = f"P6 {width} {height} 255\n".encode()
        for pdf in it:
            ids, outs = [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["p"]):
                dec = _decode_any(bytes(b))
                if dec is None:
                    continue
                w0, h0, px = dec
                yi = (np.arange(height) * h0) // height
                xi = (np.arange(width) * w0) // width
                resized = px[yi][:, xi]
                ids.append(doc_id)
                outs.append(header + resized.tobytes())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "content": outs,
                "width": pd.Series([width] * len(ids), dtype="int32"),
                "height": pd.Series([height] * len(ids), dtype="int32"),
            })

    return src.mapInPandas(batches, RESIZE_SCHEMA)


#: Output contract of decode_audio.
AUDIO_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bits", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("mode", T.StringType()),  # PCM | UNSUPPORTED
])

#: Output contract of audio_features.
AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("rms_mean", T.DoubleType()),
    T.StructField("rms_max", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
])


def _parse_wav(b: bytes):
    """RIFF/WAVE PCM → (sample_rate, channels, bits, n_frames, samples)
    or None; ``samples`` is a float64 numpy array normalized to [-1, 1]
    for 16-bit PCM, else None (meta still returned for 8/24/32-bit PCM).

    Pure chunk-walk struct parsing — the audio analogue of `_parse_ppm`:
    no soundfile/librosa needed for the container format itself.
    Compressed codecs (MP3/AAC/float WAV) classify UNSUPPORTED upstream.
    """
    import struct

    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    fmt, data = None, None
    while i + 8 <= n:
        cid = b[i:i + 4]
        (sz,) = struct.unpack_from("<I", b, i + 4)
        body = b[i + 8: i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format, ch, rate, _br, block, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0)
    if audio_format != 1 or ch <= 0 or rate <= 0 or block <= 0:
        return None  # PCM only
    n_frames = len(data) // block
    samples = None
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2",
                            count=n_frames * ch).astype(np.float64)
        samples = arr.reshape(n_frames, ch).mean(axis=1) / 32768.0
    return rate, ch, bits, n_frames, samples


def decode_audio(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "content") -> DataFrame:
    """Decode WAV payloads to typed audio metadata, Arrow-batched —
    the audio rung of the multimodal ladder: (sample_rate, channels,
    bits, n_frames, duration_ms, mode). Non-RIFF/non-PCM payloads
    classify UNSUPPORTED per row (mixed corpora degrade per-row, not
    per-job), exactly like `decode_image`."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["p"]):
                dec = _parse_wav(bytes(b))
                if dec is None:
                    rows.append((doc_id, 0, 0, 0, 0, 0.0, "UNSUPPORTED"))
                else:
                    rate, ch, bits, nf, _ = dec
                    rows.append((doc_id, rate, ch, bits, nf,
                                 1000.0 * nf / rate, "PCM"))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "channels", "bits", "n_frames",
                "duration_ms", "mode"])

    return src.mapInPandas(batches, AUDIO_META_SCHEMA)


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "content",
                   window_ms: int = 100) -> DataFrame:
    """Windowed loudness features over 16-bit PCM WAV payloads: per-doc
    RMS energy per ``window_ms`` window (channel-averaged, normalized to
    [-1, 1]), reduced to (n_windows, rms_mean, rms_max, peak) — the
    silence/clipping screens an audio-corpus curation pass runs. All
    vectorized numpy inside the Arrow batch body (frombuffer + reshape +
    one sqrt(mean(square)) per window matrix); payload bytes never leave
    the executor. Non-decodable payloads are dropped (use `decode_audio`
    upstream to see which)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["p"]):
                dec = _parse_wav(bytes(b))
                if dec is None or dec[4] is None or dec[3] == 0:
                    continue
                rate, _ch, _bits, _nf, x = dec
                win = max(1, rate * window_ms // 1000)
                n_win = max(1, len(x) // win)
                mat = x[: n_win * win].reshape(n_win, win)
                rms = np.sqrt((mat * mat).mean(axis=1))
                rows.append((doc_id, n_win, float(rms.mean()),
                             float(rms.max()), float(np.abs(x).max())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_windows", "rms_mean", "rms_max", "peak"])

    return src.mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


#: Output contract of image_ahash.
AHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("phash", T.IntegerType()),
])


def image_ahash(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "content") -> DataFrame:
    """Perceptual average-hash over decoded image payloads — the image
    counterpart of the text fingerprint rungs: images whose hash (plus
    dimensions) collide are visual duplicates/near-duplicates, found with
    a plain hash groupBy instead of pairwise pixel compares.

    The 4-bit aHash here is the 2x2 block form of the standard 8x8
    algorithm (the fixture images are tiny; a production corpus would
    resize to 8x8 grayscale first — `resize_image` is the hook): each
    quadrant's bit says whether its mean luminance exceeds the image
    mean. All comparisons are EXACT integer cross-multiplications
    (sum_block * n_total > sum_total * n_block) over uint8 sums — no
    float means, so the hash is bit-reproducible anywhere, including in
    a SQL oracle replaying the synthesis rule.

    Decoding runs on the REAL payload bytes (PPM/BMP numpy parsers) in
    Arrow batches inside the scan stage; payload bytes never shuffle —
    only (id, w, h, phash) rows leave the stage, so the dedup groupBy
    downstream moves 4 scalars per image at any corpus size.
    Undecodable payloads are dropped (mirror decode_image's UNSUPPORTED
    row if you need the accounting)."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "phash": []}
            for did, b in zip(pdf["doc_id"], pdf["p"]):
                dec = _decode_any(bytes(b))
                if dec is None:
                    continue
                w, h, arr = dec
                lum = arr.astype(np.int64).sum(axis=2)  # h x w
                hw, hh = w // 2, h // 2
                st, ct = int(lum.sum()), w * h
                phash = 0
                quads = (lum[:hh, :hw], lum[:hh, hw:],
                         lum[hh:, :hw], lum[hh:, hw:])
                for bit, blk in enumerate(quads):
                    if blk.size and int(blk.sum()) * ct > st * blk.size:
                        phash |= 1 << bit
                out["doc_id"].append(did)
                out["width"].append(w)
                out["height"].append(h)
                out["phash"].append(phash)
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "phash": pd.Series(out["phash"], dtype="int32"),
            })

    return src.mapInPandas(batches, AHASH_SCHEMA)


#: Output contract of audio_fingerprint.
AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_windows", T.IntegerType()),
    T.StructField("fp", T.StringType()),
])


def audio_fingerprint(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "content", window_ms: int = 100,
                      levels: int = 64) -> DataFrame:
    """Acoustic fingerprint over 16-bit PCM WAV payloads: the per-window
    RMS envelope (the `audio_features` windowing rule) quantized to
    ``levels`` buckets and joined into a code string — a
    Chromaprint-flavored coarse fingerprint that makes audio dedup a
    hash groupBy, the audio rung next to `image_ahash`.

    Quantization is floor(rms * levels) clamped to levels-1 (a full-scale
    clip hits rms 1.0 exactly). Determinism story mirrors the image
    hash: the per-window sum of squares over PCM samples is a sum of
    dyadic rationals (int16 / 32768 squared) whose partial sums stay
    exactly representable in float64, so ANY summation order yields the
    same double, and the divide+sqrt+floor chain is bit-identical IEEE
    everywhere — a SQL oracle replaying the synthesis rule reproduces
    the codes exactly. Payload bytes decode in Arrow batches inside the
    scan stage and never shuffle; only (id, n_windows, fp) rows leave.
    Non-decodable payloads are dropped."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("p"))

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["p"]):
                dec = _parse_wav(bytes(b))
                if dec is None or dec[4] is None or dec[3] == 0:
                    continue
                rate, _ch, _bits, _nf, x = dec
                win = max(1, rate * window_ms // 1000)
                n_win = max(1, len(x) // win)
                mat = x[: n_win * win].reshape(n_win, win)
                rms = np.sqrt((mat * mat).mean(axis=1))
                codes = np.minimum((rms * levels).astype(np.int64),
                                   levels - 1)
                rows.append((doc_id, n_win,
                             ",".join(str(int(c)) for c in codes)))
            yield pd.DataFrame(rows,
                               columns=["doc_id", "n_windows", "fp"])

    return src.mapInPandas(batches, AUDIO_FP_SCHEMA)
