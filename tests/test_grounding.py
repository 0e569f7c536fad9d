"""Grounding-box artifact (operators/grounding.py): the reference golden
capture's result_with_boxes rendering (scripts/capture_baseline.py:763-781)
restated on the stdlib PNG raster path."""

from __future__ import annotations

import numpy as np

from deepseek_ocr_api_rs_spark.extraction.raster import (
    decode_png_pixels,
    encode_png_rgb,
)
from deepseek_ocr_api_rs_spark.operators.grounding import (
    draw_box_outline,
    parse_det_boxes,
    render_grounded_png,
)

MD = (
    "<|ref|>title<|/ref|><|det|>[[0, 0, 999, 99]]<|/det|> body text "
    "<|ref|>figure<|/ref|><|det|>[[100, 200, 499, 599], [600, 600, 899, 899]]<|/det|>"
)


def _img(h=100, w=100):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x + y) % 200 + 20] * 3, axis=2).astype(np.uint8)


def test_parse_det_boxes():
    got = parse_det_boxes(MD)
    assert got == [
        ("title", 0, 0, 999, 99),
        ("figure", 100, 200, 499, 599),
        ("figure", 600, 600, 899, 899),
    ]
    assert parse_det_boxes("no tags here") == []
    assert parse_det_boxes("") == []


def test_draw_box_outline_pixels():
    img = _img()
    draw_box_outline(img, 10, 20, 50, 60, thickness=2)
    # outline painted red
    assert (img[20, 10:50] == (255, 0, 0)).all()  # top edge
    assert (img[59, 10:50] == (255, 0, 0)).all()  # bottom edge
    assert (img[20:60, 10] == (255, 0, 0)).all()  # left edge
    assert (img[20:60, 49] == (255, 0, 0)).all()  # right edge
    # interior untouched
    ref = _img()
    assert (img[25:55, 15:45] == ref[25:55, 15:45]).all()
    # clipping never raises
    draw_box_outline(img, -50, -50, 500, 500)
    draw_box_outline(img, 99, 99, 99, 99)


def test_render_grounded_png_roundtrip():
    src = _img()
    art, n = render_grounded_png(encode_png_rgb(src), MD)
    assert n == 3 and art is not None
    out = decode_png_pixels(art)
    assert out is not None and out.shape == src.shape
    # title box spans the full width at the top: row 0 must be red
    assert (out[0, :, 0] == 255).all() and (out[0, :, 1] == 0).all()
    # a pixel far from every box is unchanged
    assert (out[15, 50] == src[15, 50]).all()
    # deterministic
    art2, _ = render_grounded_png(encode_png_rgb(src), MD)
    assert art2 == art


def test_render_grounded_png_non_png():
    art, n = render_grounded_png(b"not a png", MD)
    assert art is None and n == 3
    art, n = render_grounded_png(b"", "")
    assert art is None and n == 0


def test_grounded_artifacts_spark(spark):
    import pandas as pd

    from deepseek_ocr_api_rs_spark.operators.grounding import grounded_artifacts

    src = _img(40, 60)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [encode_png_rgb(src), b"junk"],
            "markdown": [MD, MD],
        }
    )
    rows = {r.doc_id: r for r in grounded_artifacts(spark.createDataFrame(pdf)).collect()}
    assert rows[1].n_boxes == 3 and rows[1].artifact is not None
    assert rows[2].n_boxes == 3 and rows[2].artifact is None
    # Spark path byte-equal to scalar path
    scalar, _ = render_grounded_png(encode_png_rgb(src), MD)
    assert bytes(rows[1].artifact) == scalar
