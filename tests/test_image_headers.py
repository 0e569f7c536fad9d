"""Real image-header decode tests (operators/multimodal.py).

The decode is stdlib-only header parsing (PNG IHDR / JPEG SOF marker scan /
GIF logical screen descriptor) — the real-input contract of the reference's
image loads (crates/server/src/generation.rs:276-305). Pixel decode stays
behind real_decode_stub.
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
        assert r.mode == ["PNG", "JPEG", "GIF"][d % 3]


def test_fallback_for_text_payloads(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import image_metadata

    df = spark.createDataFrame(
        [(1, b"hello world bytes"), (2, None)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in image_metadata(df).collect()}
    assert rows[1].mode == "RGB" and rows[1].width == 17 % 640 + 1
    assert rows[2].mode == "EMPTY" and rows[2].n_bytes == 0
