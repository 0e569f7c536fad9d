"""Raster tier: PNG pixel decode (stdlib zlib + scanline unfilter) and the
reference's fixed-point bicubic resize (crates/infer-deepseek/src/vision/
resample.rs) — numpy-vectorized vs scalar-transliteration parity plus pinned
byte-exact goldens."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from deepseek_ocr_api_rs_spark.extraction.raster import (
    PNG_MAGIC,
    decode_png_pixels,
    encode_png_rgb,
    resize_bicubic,
    resize_bicubic_scalar,
    unfilter_scanlines,
)


def _gradient(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7 + y * 3) % 256, (x * 2 + y * 11) % 256, (x * 13 + y * 5) % 256],
        axis=2,
    ).astype(np.uint8)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, channels, raw_rows, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_rows))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# scanline filters


def _apply_filter(ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Forward PNG filter (spec §9) — the inverse of unfilter_scanlines."""
    n = len(cur)
    out = bytearray([ftype])
    for x in range(n):
        a = int(cur[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if ftype == 0:
            v = int(cur[x])
        elif ftype == 1:
            v = (int(cur[x]) - a) % 256
        elif ftype == 2:
            v = (int(cur[x]) - b) % 256
        elif ftype == 3:
            v = (int(cur[x]) - (a + b) // 2) % 256
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = (int(cur[x]) - pred) % 256
        out.append(v)
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_unfilter_inverts_each_filter(ftype):
    rng = _gradient(6, 10).reshape(6, 30)  # 6 rows of 30 bytes, bpp=3
    filtered = b"".join(
        _apply_filter(
            ftype, rng[y], rng[y - 1] if y > 0 else np.zeros(30, np.uint8), 3
        )
        for y in range(6)
    )
    got = unfilter_scanlines(filtered, 30, 3)
    assert got == rng.tobytes()


def test_unfilter_mixed_filters_per_row():
    rng = _gradient(5, 8).reshape(5, 24)
    ftypes = [0, 1, 2, 3, 4]
    filtered = b"".join(
        _apply_filter(
            ftypes[y], rng[y], rng[y - 1] if y > 0 else np.zeros(24, np.uint8), 3
        )
        for y in range(5)
    )
    assert unfilter_scanlines(filtered, 24, 3) == rng.tobytes()


def test_unfilter_rejects_malformed():
    assert unfilter_scanlines(b"", 10, 3) is None
    assert unfilter_scanlines(b"\x00" * 7, 10, 3) is None  # not a multiple
    assert unfilter_scanlines(b"\x09" + b"\x00" * 10, 10, 3) is None  # bad type


# ---------------------------------------------------------------------------
# PNG decode


def test_png_rgb_roundtrip():
    img = _gradient(30, 40)
    assert (decode_png_pixels(encode_png_rgb(img)) == img).all()


def test_png_grayscale_broadcasts():
    g = (np.arange(12, dtype=np.uint8) * 5).reshape(3, 4)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(3))
    got = decode_png_pixels(_png(4, 3, 0, 1, raw))
    assert got.shape == (3, 4, 3)
    assert (got == g[:, :, None]).all()


def test_png_rgba_drops_alpha():
    img = _gradient(3, 4)
    rgba = np.concatenate([img, np.full((3, 4, 1), 7, np.uint8)], axis=2)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    got = decode_png_pixels(_png(4, 3, 6, 4, raw))
    assert (got == img).all()


def test_png_palette_lookup():
    lut = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    got = decode_png_pixels(_png(2, 2, 3, 1, raw, extra=_chunk(b"PLTE", lut.tobytes())))
    assert (got == lut[idx]).all()


def test_png_decode_never_raises_on_garbage():
    for payload in [b"", b"\x89PNG", PNG_MAGIC + b"\x00" * 3, b"GIF89a", None,
                    PNG_MAGIC + b"\xff" * 64]:
        assert decode_png_pixels(payload) is None


def test_png_unsupported_returns_none():
    img = _gradient(2, 2)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(2))
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    assert decode_png_pixels(bad) is None
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    assert decode_png_pixels(bad) is None


# ---------------------------------------------------------------------------
# fixed-point bicubic (resample.rs parity)


GOLDEN_HASHES = {
    (17, 11): "3977d6b41e5602d6",
    (80, 64): "f9ce2fc7fc39ff28",  # upscale
    (40, 30): "9f8186af18763214",  # same-size (goes through the kernel)
    (1, 1): "38c4d90c15493d92",
}


@pytest.mark.parametrize("dims", sorted(GOLDEN_HASHES))
def test_resize_vectorized_equals_scalar_and_golden(dims):
    img = _gradient(30, 40)
    tw, th = dims
    v = resize_bicubic(img, tw, th)
    s = resize_bicubic_scalar(img, tw, th)
    assert v.shape == (th, tw, 3)
    assert (v == s).all(), "numpy path diverges from scalar transliteration"
    assert hashlib.sha256(v.tobytes()).hexdigest()[:16] == GOLDEN_HASHES[dims]


def test_resize_identity_is_exact():
    # at scale 1.0 the a=-0.5 kernel is 1 at offset 0 and 0 at ±1 — the
    # fixed-point pipeline must reproduce the input byte-for-byte
    img = _gradient(30, 40)
    assert (resize_bicubic(img, 40, 30) == img).all()


def test_resize_deterministic_across_runs():
    img = _gradient(12, 9)
    a = resize_bicubic(img, 5, 7)
    b = resize_bicubic(img.copy(), 5, 7)
    assert (a == b).all()


# ---------------------------------------------------------------------------
# GIF pixel decode (LZW)


def test_gif_lzw_roundtrip_with_width_growth():
    from deepseek_ocr_api_rs_spark.extraction.raster import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(7)
    for min_code in (2, 4, 8):
        data = rng.randint(0, 1 << min_code, size=20000).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data, min_code), min_code) == data, min_code


def test_gif_pixel_roundtrip_plain_and_interlaced():
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        GIF_PALETTE,
        decode_gif_pixels,
        encode_gif_rgb_indexed,
    )

    h, w = 37, 53
    y, x = np.mgrid[0:h, 0:w]
    idx = ((x * 3 + y * 5) % 256).astype(np.uint8)
    for interlace in (False, True):
        out = decode_gif_pixels(encode_gif_rgb_indexed(idx, GIF_PALETTE, interlace))
        assert out is not None and (out == GIF_PALETTE[idx]).all(), interlace


def test_gif_small_palette_and_garbage():
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_gif_pixels,
        encode_gif_rgb_indexed,
    )

    idx = (np.mgrid[0:9, 0:11][0] % 3).astype(np.uint8)
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], np.uint8)
    assert (decode_gif_pixels(encode_gif_rgb_indexed(idx, pal)) == pal[idx]).all()
    for junk in (b"", b"GIF89a\x01", b"GIF89a" + b"\xff" * 40, None):
        assert decode_gif_pixels(junk) is None


def test_decode_image_pixels_dispatch():
    from deepseek_ocr_api_rs_spark.extraction.raster import decode_image_pixels
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        make_gif_bytes,
        make_jpeg_bytes,
        make_png_bytes,
    )

    png = decode_image_pixels(make_png_bytes(8, 6))
    assert png is not None and png.shape == (6, 8, 3)
    gif = decode_image_pixels(make_gif_bytes(8, 6))
    assert gif is not None and gif.shape == (6, 8, 3)
    assert gif.any(), "make_gif_bytes must carry real (non-black) pixels"
    jpg = decode_image_pixels(make_jpeg_bytes(8, 6))
    assert jpg is not None and jpg.shape == (6, 8, 3)
    assert jpg.any(), "make_jpeg_bytes must carry real (non-black) pixels"
    assert decode_image_pixels(b"who knows") is None


# ---------------------------------------------------------------------------
# Adam7 interlace + 16-bit depth (round 5)


def test_adam7_and_16bit_roundtrip_exact():
    """Every (interlace × bit-depth × row-filter) combination decodes to
    the source pixels exactly: 16-bit widens as v*257 (high byte == v),
    Adam7 passes are independently filtered sub-images."""
    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (2, 3), (7, 5), (16, 16), (23, 31)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for interlace in (False, True):
            for bit_depth in (8, 16):
                for row_filter in (0, 1):
                    blob = encode_png_rgb(
                        img,
                        interlace=interlace,
                        bit_depth=bit_depth,
                        row_filter=row_filter,
                    )
                    got = decode_png_pixels(blob)
                    assert got is not None and np.array_equal(got, img), (
                        h, w, interlace, bit_depth, row_filter,
                    )


def test_adam7_golden_pinned():
    """Deterministic interlaced/16-bit fixture → pinned decode sha256:
    pass-grid or depth-scaling regressions break the hash."""
    import hashlib

    yy, xx = np.mgrid[0:21, 0:17]
    img = np.stack(
        [(xx * 11) % 256, (yy * 7) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    shas = [
        hashlib.sha256(
            decode_png_pixels(encode_png_rgb(img, interlace=True)).tobytes()
        ).hexdigest()[:16],
        hashlib.sha256(
            decode_png_pixels(
                encode_png_rgb(img, interlace=True, bit_depth=16, row_filter=1)
            ).tobytes()
        ).hexdigest()[:16],
    ]
    # both must equal the plain decode (content-identical containers)
    plain = hashlib.sha256(
        decode_png_pixels(encode_png_rgb(img)).tobytes()
    ).hexdigest()[:16]
    assert shas == [plain, plain]
    assert plain == "207cb93065c53101", plain


def test_png_malformed_interlace_returns_none():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = encode_png_rgb(img, interlace=True)
    assert decode_png_pixels(blob[: len(blob) // 2]) is None
    # sub-8-bit depth stays out of scope → None, not garbage
    bad = bytearray(blob)
    ihdr_depth = blob.index(b"IHDR") + 4 + 8
    bad[ihdr_depth] = 4
    assert decode_png_pixels(bytes(bad)) is None


def test_sub_byte_depths_palette_and_grayscale():
    """1/2/4-bit packed samples (the icons/diagrams PNG family): palette
    lookup and exact grayscale scaling (255 divisible by 1/3/15), plain
    and Adam7, all round-trip exactly; sub-byte truecolor stays out of
    spec → None."""
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        encode_png_indexed,
    )

    rng = np.random.RandomState(9)
    pal256 = np.stack(
        [np.arange(256), 255 - np.arange(256), (np.arange(256) * 3) % 256],
        axis=1,
    ).astype(np.uint8)
    for d in (1, 2, 4, 8):
        n = 1 << d
        pal = pal256[:n]
        for h, w in [(1, 1), (3, 5), (13, 23)]:
            idx = rng.randint(0, n, (h, w)).astype(np.uint8)
            for inter in (False, True):
                got = decode_png_pixels(
                    encode_png_indexed(idx, pal, bit_depth=d, interlace=inter)
                )
                assert got is not None and np.array_equal(got, pal[idx])
                got = decode_png_pixels(
                    encode_png_indexed(
                        idx, pal, bit_depth=d, interlace=inter, grayscale=True
                    )
                )
                exp = (idx * (255 // (n - 1)))[..., None].repeat(3, axis=2)
                assert got is not None and np.array_equal(
                    got, exp.astype(np.uint8)
                )
    # depth 4 on truecolor is out of spec → None, not garbage
    blob = bytearray(
        encode_png_rgb(rng.randint(0, 256, (8, 8, 3), dtype=np.uint8))
    )
    blob[blob.index(b"IHDR") + 4 + 8] = 4
    assert decode_png_pixels(bytes(blob)) is None


def test_bmp_decode_roundtrip_and_guards():
    """Uncompressed BI_RGB BMPs (screenshots/legacy-tooling family):
    24/32-bit, bottom-up and top-down, all round-trip exactly through
    the dispatcher; 8-bit palette decodes; text starting 'BM' can never
    parse (strict header gates)."""
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_bmp_pixels,
        decode_image_pixels,
        encode_bmp_rgb,
    )

    rng = np.random.RandomState(4)
    for h, w in [(1, 1), (3, 5), (13, 23)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for bpp in (24, 32):
            for td in (False, True):
                blob = encode_bmp_rgb(img, bpp=bpp, top_down=td)
                assert np.array_equal(decode_bmp_pixels(blob), img)
                assert np.array_equal(decode_image_pixels(blob), img)
    # 8-bit palette form (hand-assembled: 40-byte header + BGRX palette)
    import struct as _s

    pal = bytes(
        b for i in range(4) for b in (i * 80, 255 - i * 80, i * 10, 0)
    )
    idx_rows = bytes([0, 1, 2, 3]) + bytes([3, 2, 1, 0])  # 4 wide, 2 rows
    head = b"BM" + _s.pack("<IHHI", 14 + 40 + len(pal) + 8, 0, 0, 14 + 40 + len(pal))
    info = _s.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 0, 8, 0, 0, 4, 0)
    got = decode_bmp_pixels(head + info + pal + idx_rows)
    assert got is not None and got.shape == (2, 4, 3)
    # bottom-up: file row 0 is image row 1
    assert got[1, 0, 0] == 0 and got[1, 0, 1] == 255  # palette entry 0 BGR→RGB... R=third byte
    # strictness: text payloads never parse
    assert decode_bmp_pixels(b"BMarker text long enough to cover a header" * 3) is None
    truncated = encode_bmp_rgb(rng.randint(0, 256, (8, 8, 3), dtype=np.uint8))[:30]
    assert decode_bmp_pixels(truncated) is None


def test_bmp_bad_data_offset_rejected():
    """A corrupt bfOffBits pointing inside the header must reject — the
    header bytes would otherwise decode as pixel rows (code-review r5
    pass 2); the dims path shares the same parser."""
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_bmp_pixels,
        encode_bmp_rgb,
        parse_bmp_header,
    )
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        decode_image_dims,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp_rgb(img))
    blob[10:14] = (0).to_bytes(4, "little")  # bfOffBits = 0
    assert parse_bmp_header(bytes(blob)) is None
    assert decode_bmp_pixels(bytes(blob)) is None
    assert decode_image_dims(bytes(blob)) is None
