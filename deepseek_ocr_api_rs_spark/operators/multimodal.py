"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video bytes are carried as ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. The decode itself is STUBBED in this container (no
image/audio libraries available — clearly marked below); the Spark-side
plumbing — schema, batching, partitioning, UDF signature — is real and
tested, which is the part that has to hold at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


def _fake_decode_dims(n_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """DETERMINISTIC FAKE of an image-header decode (this container has no
    PIL/libjpeg). Real implementation would parse magic + header bytes; the
    fake derives dims arithmetically from payload length so the oracle can
    reproduce it. Swap with a real decoder via ``decode_fn``."""
    width = (n_bytes % 640 + 1).astype(np.int32)
    height = (n_bytes % 480 + 1).astype(np.int32)
    return width, height


def real_decode_stub(payload: bytes) -> tuple[int, int, str]:
    """Placeholder for a real image decode. Kept separate so the pipeline
    shape doesn't change when a real library lands."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; production deployments plug a decoder in here"
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
    ]
)


def resize_images(
    docs: DataFrame,
    max_side: int = 640,
    id_col: str = "doc_id",
    binary_col: str = "payload",
) -> DataFrame:
    """Resize stage plumbing (P1 letterbox analogue): computes the target
    dims with the reference's min-side-ratio rule over the (fake-decoded)
    source dims; the pixel work is the stubbed part. Arrow-batched,
    vectorized numpy arithmetic — the exact shape a real resize UDF has."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[binary_col].map(
                lambda b: len(b) if b is not None else 0
            ).to_numpy(dtype=np.int64)
            w, h = _fake_decode_dims(n_bytes)
            scale = np.minimum(max_side / np.maximum(w, 1), max_side / np.maximum(h, 1))
            scale = np.minimum(scale, 1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "width": w,
                    "height": h,
                    # banker's rounding — the P1 round_ties_to_even rule
                    "out_width": np.rint(w * scale).astype(np.int32),
                    "out_height": np.rint(h * scale).astype(np.int32),
                }
            )

    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias(binary_col)
    ).mapInPandas(process, schema=RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("byte_offset", LongType()),
    ]
)


def sample_frames(
    docs: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    binary_col: str = "payload",
) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame (the P6
    temporal-tiling analogue — preprocess.rs:207-217). The frame decode is
    the stubbed part; offsets are the deterministic uniform-stride rule a
    real sampler uses. Output is a fan-out (doc → n_frames rows) — the
    schema/explode shape that matters at scale."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                n = len(payload) if payload is not None else 0
                if n == 0:
                    continue
                k = min(n_frames, n)
                for j in range(k):
                    ids.append(int(doc_id))
                    idxs.append(j)
                    offs.append((j * n) // k)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "byte_offset": offs}
            )

    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias(binary_col)
    ).mapInPandas(process, schema=FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("duration_s", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def audio_features(
    docs: DataFrame, id_col: str = "doc_id", binary_col: str = "payload"
) -> DataFrame:
    """Audio feature-extraction plumbing: deterministic per-payload numeric
    features (real impl would run an FFT/VAD over decoded samples — no
    audio libs in this container). The byte-sum 'energy' is computed with
    vectorized numpy over the Arrow buffer — the batch shape is real."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, energy = [], []
            for payload in pdf[binary_col]:
                if payload is None:
                    n_bytes.append(0)
                    energy.append(0)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_bytes.append(arr.size)
                energy.append(int(arr.sum()))
            nb = np.asarray(n_bytes, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "n_bytes": nb,
                    "duration_s": (nb // 16000 + 1).astype(np.int32),  # fake 16kHz
                    "energy": np.asarray(energy, dtype=np.int64),
                }
            )

    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias(binary_col)
    ).mapInPandas(process, schema=AUDIO_FEATURES_SCHEMA)


def image_metadata(docs: DataFrame, id_col: str = "doc_id", binary_col: str = "payload") -> DataFrame:
    """binary column → typed metadata rows, Arrow-batched.

    The batch shape is the point: one pandas DataFrame per Arrow batch,
    vectorized numpy over the byte lengths, zero per-row Python calls.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[binary_col].map(
                lambda b: len(b) if b is not None else 0
            ).to_numpy(dtype=np.int64)
            width, height = _fake_decode_dims(n_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "mode": np.where(n_bytes > 0, "RGB", "EMPTY"),
                }
            )

    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(binary_col).alias(binary_col)
    ).mapInPandas(process, schema=IMAGE_META_SCHEMA)
