"""ICO favicon container (r7): ICONDIR walk, PNG-in-ICO and headerless
BMP-DIB entries (doubled-height AND-mask convention), full pixel decode
through the existing raster stack."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_api_rs_spark.extraction.raster import (
    encode_ico,
    parse_ico,
)


def _grad(h: int, w: int, k: int = 1) -> np.ndarray:
    g = (np.add.outer(np.arange(h), np.arange(w)) * k) % 256
    return np.stack([g, (g * 2) % 256, (g * 3) % 256], axis=-1).astype(
        np.uint8
    )


def test_mixed_entry_roundtrip_bit_exact():
    a, b, c = _grad(16, 16, 3), _grad(32, 32, 5), _grad(48, 48, 7)
    ico = encode_ico([(a, "bmp"), (b, "png"), (c, "png")])
    recs = parse_ico(ico)
    assert recs is not None and len(recs) == 3
    assert [r["fmt"] for r in recs] == ["bmp", "png", "png"]
    for r, src in zip(recs, (a, b, c)):
        assert (r["height"], r["width"]) == src.shape[:2]
        assert np.array_equal(r["pixels"], src)


def test_256_pixel_dimension_encoding():
    """A 256-wide icon stores 0 in the one-byte entry dims; the decoded
    pixels override the entry metadata."""
    img = _grad(256, 256, 2)
    recs = parse_ico(encode_ico([(img, "png")]))
    assert recs is not None and recs[0]["width"] == 256
    assert recs[0]["height"] == 256
    assert np.array_equal(recs[0]["pixels"], img)


def test_undecodable_entry_keeps_metadata():
    """A corrupt PNG entry keeps (idx, dims, fmt) with pixels None —
    honest scope, never a fake decode."""
    img = _grad(16, 16, 3)
    ico = bytearray(encode_ico([(img, "png")]))
    # corrupt the PNG's IDAT zlib stream (past the 8-byte magic + IHDR)
    ico[6 + 16 + 60] ^= 0xFF
    recs = parse_ico(bytes(ico))
    assert recs is not None and len(recs) == 1
    assert recs[0]["fmt"] == "png" and recs[0]["pixels"] is None
    assert recs[0]["width"] == 16  # entry metadata survives


def test_not_an_ico_returns_none():
    assert parse_ico(b"") is None
    assert parse_ico(b"\x00\x00\x02\x00\x01\x00") is None  # type 2 = cursor
    assert parse_ico(_grad(8, 8).tobytes()) is None
    # entry table promising data beyond EOF
    short = encode_ico([(_grad(8, 8), "bmp")])[:-10]
    assert parse_ico(short) is None


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_parser_never_raises(junk):
    parse_ico(junk)
    parse_ico(struct.pack("<HHH", 0, 1, 3) + junk)


def test_spark_inventory_matches_scalar(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        favicon_inventory,
        synthesize_favicons,
    )

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    payloads = synthesize_favicons(docs)
    got = {
        (r["doc_id"], r["idx"]): (
            r["fmt"], r["width"], r["height"], r["pixel_sha"]
        )
        for r in favicon_inventory(payloads).collect()
    }
    want = {}
    for row in payloads.collect():
        for rec in parse_ico(bytes(row["payload"])) or []:
            want[(row["doc_id"], rec["idx"])] = (
                rec["fmt"], rec["width"], rec["height"],
                hashlib.sha256(rec["pixels"].tobytes()).hexdigest()
                if rec["pixels"] is not None else None,
            )
    assert got == want
    assert {f for f, _, _, _ in got.values()} == {"png", "bmp"}
    # every fifth doc carries the third (48x48) entry
    assert (0, 2) in got and got[(0, 2)][1] == 48
