"""Grounding-box artifact: draw <|ref|>/<|det|> boxes onto the page raster.

The reference's golden capture renders `result_with_boxes.jpg` by drawing
every grounding detection returned by the model onto the input image
(scripts/capture_baseline.py:763-781 via the public DeepSeek-OCR
``process_image_with_refs``). This is the Spark restatement: parse the
det tags out of the markdown column (the same tag grammar the X3 polish
chain consumes, functions/text.py), scale the 0-999-normalized coordinates
to the raster dims (the public model emits coordinates on a 1000-grid),
draw rectangle OUTLINES with pure numpy slicing, and re-encode — PNG in,
PNG out (extraction.raster; the container has no JPEG encoder, documented
format deviation). Arrow-batched mapInPandas, map-only, never raises:
undecodable payloads pass through with a null artifact.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <|ref|>label<|/ref|><|det|>[[x0, y0, x1, y1], ...]<|/det|> — the public
# DeepSeek-OCR grounding grammar (same pattern family as functions.text X3)
_DET_RE = re.compile(
    r"<\|ref\|>(.*?)<\|/ref\|><\|det\|>\[(.*?)\]<\|/det\|>", re.DOTALL
)
_BOX_RE = re.compile(r"\[\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\]")

GRID = 999  # the model's normalized coordinate grid


def parse_det_boxes(markdown: str) -> list[tuple[str, int, int, int, int]]:
    """[(label, x0, y0, x1, y1), ...] in 0-999 grid coordinates."""
    out: list[tuple[str, int, int, int, int]] = []
    for m in _DET_RE.finditer(markdown or ""):
        label = m.group(1)
        for b in _BOX_RE.finditer("[" + m.group(2) + "]"):
            x0, y0, x1, y1 = (int(b.group(i)) for i in range(1, 5))
            out.append((label, x0, y0, x1, y1))
    return out


def draw_box_outline(
    img: np.ndarray,
    x0: int,
    y0: int,
    x1: int,
    y1: int,
    color: tuple[int, int, int] = (255, 0, 0),
    thickness: int = 2,
) -> None:
    """In-place rectangle outline via numpy slice assignment (no PIL)."""
    h, w, _ = img.shape
    x0 = max(0, min(x0, w - 1))
    x1 = max(x0 + 1, min(x1, w))
    y0 = max(0, min(y0, h - 1))
    y1 = max(y0 + 1, min(y1, h))
    t = max(1, thickness)
    c = np.asarray(color, dtype=np.uint8)
    img[y0 : min(y0 + t, y1), x0:x1] = c  # top
    img[max(y1 - t, y0) : y1, x0:x1] = c  # bottom
    img[y0:y1, x0 : min(x0 + t, x1)] = c  # left
    img[y0:y1, max(x1 - t, x0) : x1] = c  # right


def render_grounded_png(payload: bytes, markdown: str) -> tuple[bytes | None, int]:
    """(artifact PNG with boxes drawn | None, n_boxes). Grid coords scale
    to raster dims by x/999*(w-1) rounded — the public renderer's rule."""
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_png_pixels,
        encode_png_rgb,
    )

    boxes = parse_det_boxes(markdown)
    img = decode_png_pixels(payload if payload is not None else b"")
    if img is None:
        return None, len(boxes)
    img = img.copy()
    h, w, _ = img.shape
    for _label, gx0, gy0, gx1, gy1 in boxes:
        x0 = int(round(gx0 / GRID * (w - 1)))
        x1 = int(round(gx1 / GRID * (w - 1))) + 1
        y0 = int(round(gy0 / GRID * (h - 1)))
        y1 = int(round(gy1 / GRID * (h - 1))) + 1
        draw_box_outline(img, x0, y0, x1, y1)
    return encode_png_rgb(img), len(boxes)


def grounded_artifacts(
    docs: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    markdown_col: str = "markdown",
) -> DataFrame:
    """(id, payload, markdown) → (doc_id, n_boxes, artifact) — the
    result_with_boxes sink as a map-only Arrow stage."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arts, counts = [], []
            for payload, md in zip(pdf[binary_col], pdf[markdown_col]):
                art, n = render_grounded_png(
                    bytes(payload) if payload is not None else b"", str(md)
                )
                arts.append(art)
                counts.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "n_boxes": np.asarray(counts, dtype=np.int32),
                    "artifact": arts,
                }
            )

    return docs.select(
        F.col(id_col).alias(id_col),
        F.col(binary_col).alias(binary_col),
        F.col(markdown_col).alias(markdown_col),
    ).mapInPandas(process, schema="doc_id long, n_boxes int, artifact binary")
