"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video travel as `binary` columns with a struct of typed
metadata beside them. All relational operators treat the payload as opaque
bytes (project/filter/join/partition work unchanged); modality-specific work
happens in Arrow-batched Pandas iterators (`mapInPandas`) so bytes move
columnar, never row-at-a-time.

The decode step itself (PIL/librosa/av) is NOT available in this
environment, so `decode_image` raises NotImplementedError behind an
import-try — but everything Spark-side (schema, batch iteration, partition
behavior, output contract) is real and tested, including a deterministic
metadata extractor (`extract_binary_meta`) that exercises the exact same
plumbing with verifiable output.

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


def resize_image(df: DataFrame, payload_col: str = "content",
                 width: int = 64, height: int = 64) -> DataFrame:
    """Image resize — requires an imaging library not present in this
    environment. Slot a PIL/opencv body into the `extract_binary_meta`
    iterator shape; output schema would be (doc_id, resized binary)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "image resize requires PIL; this environment ships none. "
            "See extract_features()/sample_frames() for the live "
            "mapInPandas templates a resize body plugs into."
        ) from e
    raise NotImplementedError("decoder body intentionally out of scope")


def decode_image(df: DataFrame, payload_col: str = "content") -> DataFrame:
    """Decode an image payload column to (width, height, mode) — requires an
    imaging library not present in this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "image decode requires PIL; this environment ships none. "
            "The mapInPandas plumbing to slot a decoder into is "
            "extract_binary_meta()."
        ) from e
    raise NotImplementedError("decoder body intentionally out of scope")
