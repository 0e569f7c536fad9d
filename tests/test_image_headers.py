"""Real image-header decode tests (operators/multimodal.py).

The decode is stdlib-only header parsing (PNG IHDR / JPEG SOF marker scan /
GIF logical screen descriptor / BMP BITMAPINFOHEADER / TIFF IFD) — the
real-input contract of the reference's image loads
(crates/server/src/generation.rs:276-305). Pixel decode is REAL for all
five formats too (extraction/raster.py + jpeg.py + tiff.py); the resize
tests below assert byte parity against the scalar chain.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from deepseek_ocr_api_rs_spark.operators.multimodal import (
    decode_image_dims,
    make_gif_bytes,
    make_jpeg_bytes,
    make_png_bytes,
)


@pytest.mark.parametrize("w,h", [(1, 1), (64, 48), (640, 480), (3000, 2)])
def test_png_roundtrip(w, h):
    assert decode_image_dims(make_png_bytes(w, h)) == (w, h, "PNG")


@pytest.mark.parametrize("w,h", [(1, 1), (64, 48), (4096, 2160)])
def test_jpeg_roundtrip(w, h):
    assert decode_image_dims(make_jpeg_bytes(w, h)) == (w, h, "JPEG")


@pytest.mark.parametrize("w,h", [(1, 1), (320, 200), (65535, 1)])
def test_gif_roundtrip(w, h):
    assert decode_image_dims(make_gif_bytes(w, h)) == (w, h, "GIF")


def test_png_chunks_are_crc_valid():
    data = make_png_bytes(5, 7)
    i = 8  # after signature
    seen = {}
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", data[i + 8 + length : i + 12 + length])
        assert crc == zlib.crc32(typ + payload) & 0xFFFFFFFF, typ
        seen[typ] = payload
        i += 12 + length
    assert list(seen) == [b"IHDR", b"IDAT", b"IEND"]
    # IDAT inflates to the full zero raster: h * (1 + 3w) bytes
    assert zlib.decompress(seen[b"IDAT"]) == b"\x00" * (7 * (1 + 3 * 5))


def test_jpeg_sof_after_app_segments():
    # decode must skip APP0/APPn/DQT segments before SOF0 (our writer emits
    # APP0; add an extra APP1 + progressive SOF2 variant by hand)
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    components = b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 99, 321, 3) + components
    data = b"\xff\xd8" + app1 + sof2 + b"\xff\xd9"
    assert decode_image_dims(data) == (321, 99, "JPEG")


def test_jpeg_dht_is_not_sof():
    # 0xC4 (DHT) carries no dims and must be skipped
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    components = b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 10, 20, 3) + components
    data = b"\xff\xd8" + dht + sof0 + b"\xff\xd9"
    assert decode_image_dims(data) == (20, 10, "JPEG")


def test_unrecognized_and_truncated_return_none():
    assert decode_image_dims(None) is None
    assert decode_image_dims(b"") is None
    assert decode_image_dims(b"plain text payload") is None
    assert decode_image_dims(make_png_bytes(4, 4)[:20]) is None  # cut IHDR
    assert decode_image_dims(b"\xff\xd8\xff\xd9" + b"\x00" * 8) is None  # SOI+EOI
    assert decode_image_dims(b"GIF89a" + b"\x01") is None  # truncated GIF


def test_image_metadata_real_decode_via_spark(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        image_metadata,
        synthesize_image_payloads,
    )

    import pyspark.sql.functions as F

    base = spark.range(30).select(F.col("id").alias("doc_id"))
    payloads = synthesize_image_payloads(base)
    rows = {r.doc_id: r for r in image_metadata(payloads).collect()}
    assert len(rows) == 30
    for d, r in rows.items():
        assert r.width == d % 64 + 1
        assert r.height == d % 48 + 1
        assert r.mode == ["PNG", "JPEG", "GIF", "BMP", "TIFF"][d % 5]


def test_fallback_for_text_payloads(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import image_metadata

    df = spark.createDataFrame(
        [(1, b"hello world bytes"), (2, None)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in image_metadata(df).collect()}
    assert rows[1].mode == "RGB" and rows[1].width == 17 % 640 + 1
    assert rows[2].mode == "EMPTY" and rows[2].n_bytes == 0


def test_resize_png_payloads_real_pixels_via_spark(spark):
    """Spark path of the real pixel pipeline: gradient PNG → raster decode →
    fixed-point bicubic → re-encoded PNG whose bytes equal the same chain
    run scalar-side (driver) — full engine/driver byte parity."""
    import hashlib

    import numpy as np
    import pyspark.sql.functions as F

    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_png_pixels,
        encode_png_rgb,
        resize_bicubic,
    )
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        resize_png_payloads,
        synthesize_gradient_pngs,
    )

    base = spark.range(20).select(F.col("id").alias("doc_id"))
    payload_rows = {r.doc_id: bytes(r.payload) for r in synthesize_gradient_pngs(base).collect()}
    got = {r.doc_id: r for r in resize_png_payloads(synthesize_gradient_pngs(base), max_side=16).collect()}
    assert len(got) == 20
    for d, r in got.items():
        img = decode_png_pixels(payload_rows[d])
        assert img is not None and img.shape == (r.height, r.width, 3)
        scale = min(16 / r.width, 16 / r.height, 1.0)
        assert r.out_width == max(int(np.rint(r.width * scale)), 1)
        assert r.out_height == max(int(np.rint(r.height * scale)), 1)
        expected = encode_png_rgb(resize_bicubic(img, r.out_width, r.out_height))
        assert bytes(r.resized) == expected, f"doc {d}: byte mismatch"
        # and the resized payload is itself a decodable PNG of the right dims
        back = decode_png_pixels(bytes(r.resized))
        assert back is not None and back.shape == (r.out_height, r.out_width, 3)


def test_resize_png_payloads_non_image_passthrough(spark):
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_image_pixels,
        encode_png_rgb,
        resize_bicubic,
    )
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        make_jpeg_bytes,
        resize_png_payloads,
    )

    jpeg = make_jpeg_bytes(40, 20)
    df = spark.createDataFrame(
        [(1, jpeg), (2, b"not an image"), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in resize_png_payloads(df, max_side=16).collect()}
    # JPEG now takes the REAL path: full entropy decode → bicubic → PNG
    assert rows[1].width == 40 and rows[1].out_width == 16
    expected = encode_png_rgb(resize_bicubic(decode_image_pixels(jpeg), 16, 8))
    assert bytes(rows[1].resized) == expected
    assert rows[2].resized is None and rows[3].resized is None


def test_resize_handles_gif_payloads(spark):
    """GIF payloads take the REAL pixel path now: LZW decode → bicubic →
    PNG re-encode, byte-equal to the scalar chain."""
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_image_pixels,
        decode_png_pixels,
        encode_png_rgb,
        resize_bicubic,
    )
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        make_gif_bytes,
        resize_png_payloads,
    )

    payload = make_gif_bytes(40, 24)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    r = resize_png_payloads(df, max_side=16).collect()[0]
    assert r.width == 40 and r.height == 24
    assert r.out_width == 16 and r.out_height == 10
    img = decode_image_pixels(payload)
    expected = encode_png_rgb(resize_bicubic(img, 16, 10))
    assert bytes(r.resized) == expected
    assert decode_png_pixels(bytes(r.resized)).shape == (10, 16, 3)
