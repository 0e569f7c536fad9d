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
