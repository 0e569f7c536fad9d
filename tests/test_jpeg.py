"""Baseline JPEG codec (extraction/jpeg.py): Huffman + DCT roundtrips with
bounded error (JPEG is lossy — unlike the PNG/GIF paths, equality is
bit-determinism plus an error budget), 4:4:4 and 4:2:0 layouts, restart
markers, grayscale, and never-raise on garbage."""

from __future__ import annotations

import numpy as np
import pytest

from deepseek_ocr_api_rs_spark.extraction.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_rgb,
)


def _smooth(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(60 + x * 1.5 + y, 0, 255),
            np.clip(40 + x + y * 2.0, 0, 255),
            np.clip(90 + x * 0.5 + y * 1.2, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_roundtrip_bounded_error(subsampling, restart_interval):
    img = _smooth(45, 67)
    jpg = encode_jpeg_rgb(
        img, quality=90, subsampling=subsampling, restart_interval=restart_interval
    )
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    out = decode_jpeg_pixels(jpg)
    assert out is not None and out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 6, (subsampling, restart_interval, err.max())
    # lossy but deterministic: same bytes decode to the same pixels
    assert (decode_jpeg_pixels(jpg) == out).all()


def test_hard_gradient_all_layouts_decode():
    y, x = np.mgrid[0:33, 0:41]
    img = np.stack(
        [(x * 3 + y * 2) % 256, (x + y * 4) % 256, (x * 5 + y) % 256], axis=2
    ).astype(np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg_pixels(
            encode_jpeg_rgb(img, quality=90, subsampling=sub, restart_interval=2)
        )
        assert out is not None and out.shape == img.shape


def test_odd_dimensions_and_tiny():
    for h, w in [(9, 13), (8, 8), (1, 1), (17, 32)]:
        img = _smooth(h, w)
        for sub in ("444", "420"):
            out = decode_jpeg_pixels(encode_jpeg_rgb(img, subsampling=sub))
            assert out is not None and out.shape == (h, w, 3), (h, w, sub)


def test_quality_monotone_size():
    img = _smooth(40, 40)
    sizes = [len(encode_jpeg_rgb(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_decode_never_raises_on_garbage_and_out_of_scope():
    base = encode_jpeg_rgb(_smooth(16, 16))
    seeds = [b"", b"\xff\xd8", b"\xff\xd8\xff\xd9", b"PNG nope", None,
             base[: len(base) // 2]]
    # deterministic byte-flip fuzz
    state = 99
    mut = bytearray(base)
    for _ in range(150):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        mut[state % len(mut)] = (mut[state % len(mut)] + 1 + state % 250) % 256
        if state % 7 == 0:
            seeds.append(bytes(mut))
    for payload in seeds:
        decode_jpeg_pixels(payload)  # result may be None/array; must not raise
    # SOF2 now decodes (test_jpeg_progressive.py) — but a frame whose
    # marker is swapped to SOF2 while keeping the BASELINE scan header
    # (Ss=0, Se=63) is malformed for progressive (a DC scan must be
    # DC-only, T.81 G.1.1.1.1) and must come back None, not raise
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg_pixels(prog) is None


def test_grayscale_single_component():
    """Hand-build a 1-component scan by reusing the encoder's luma plane:
    encode an RGB gray image 4:4:4 and also check the decoder's 1-component
    path via a crafted SOF with nc=1 (skip if layout differs)."""
    g = _smooth(24, 24)
    g[:, :, 1] = g[:, :, 0]
    g[:, :, 2] = g[:, :, 0]
    out = decode_jpeg_pixels(encode_jpeg_rgb(g, quality=92))
    assert out is not None
    # channels stay near-equal through YCbCr (gray input → Cb,Cr ≈ 128)
    assert int(np.abs(out.astype(int) - g.astype(int)).max()) <= 6


def test_resize_pipeline_consumes_real_jpeg(spark):
    """End-to-end Spark: real JPEG payload → entropy decode → fixed-point
    bicubic → PNG artifact, byte-equal to the scalar chain."""
    from deepseek_ocr_api_rs_spark.extraction.raster import (
        decode_image_pixels,
        encode_png_rgb,
        resize_bicubic,
    )
    from deepseek_ocr_api_rs_spark.operators.multimodal import resize_png_payloads

    img = _smooth(48, 32)
    jpg = encode_jpeg_rgb(img, quality=88, subsampling="420")
    df = spark.createDataFrame([(7, jpg)], "doc_id long, payload binary")
    r = resize_png_payloads(df, max_side=16).collect()[0]
    assert (r.width, r.height, r.out_width, r.out_height) == (32, 48, 11, 16)
    expected = encode_png_rgb(resize_bicubic(decode_image_pixels(jpg), 11, 16))
    assert bytes(r.resized) == expected


# ---------------------------------------------------------------------------
# CMYK / YCCK (4-component, Adobe APP14)


def _cmyk_gradient(h: int = 24, w: int = 40) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
            np.full((h, w), 40),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_cmyk_and_ycck_decode_bounded_error():
    """Adobe 4-component JPEGs: samples stored inverted; YCCK adds the
    YCbCr stage over the inverted CMY. Decode must land within
    quantization error of the true CMYK→RGB conversion."""
    from deepseek_ocr_api_rs_spark.extraction.jpeg import encode_jpeg_cmyk

    cmyk = _cmyk_gradient()
    c, m, y, k = [cmyk[..., i].astype(np.float64) for i in range(4)]
    exp = np.stack(
        [
            (255 - c) * (255 - k) / 255,
            (255 - m) * (255 - k) / 255,
            (255 - y) * (255 - k) / 255,
        ],
        axis=-1,
    )
    for transform, tol in ((0, 3.0), (2, 5.0)):
        blob = encode_jpeg_cmyk(cmyk, quality=95, transform=transform)
        assert blob.count(b"\xff\xee") == 1 and b"Adobe" in blob
        rgb = decode_jpeg_pixels(blob)
        assert rgb is not None and rgb.shape == cmyk.shape[:2] + (3,)
        err = np.abs(rgb.astype(np.float64) - exp).max()
        assert err <= tol, (transform, err)


def test_cmyk_decode_golden_pinned():
    """Deterministic fixture → pinned sha256 of the decoded pixels: any
    change to the APP14 parse, 4-component scan, or the inversion /
    YCCK convention shows up as a hash break."""
    import hashlib

    from deepseek_ocr_api_rs_spark.extraction.jpeg import encode_jpeg_cmyk

    shas = []
    for transform in (0, 2):
        rgb = decode_jpeg_pixels(
            encode_jpeg_cmyk(_cmyk_gradient(), quality=85, transform=transform)
        )
        shas.append(hashlib.sha256(rgb.tobytes()).hexdigest()[:16])
    # pinned values — regenerate deliberately if the convention changes
    assert shas == ["54cc0bc227f5c84c", "e533001abe5d7e03"], shas


def test_cmyk_without_app14_is_true_ink():
    """A bare 4-component frame (APP14 stripped) is TRUE ink coverage:
    all-zero CMYK means white paper."""
    from deepseek_ocr_api_rs_spark.extraction.jpeg import encode_jpeg_cmyk

    cmyk = np.zeros((16, 16, 4), dtype=np.uint8)
    blob = encode_jpeg_cmyk(cmyk, quality=95, transform=0)
    i = blob.index(b"\xff\xee")
    # stripping APP14 flips the interpretation: stored bytes are 255
    # (inverted zero-ink) → read as ink 255 → black
    with_marker = decode_jpeg_pixels(blob)
    without = decode_jpeg_pixels(blob[:i] + blob[i + 16 :])
    assert with_marker is not None and without is not None
    assert with_marker.mean() > 250  # white
    assert without.mean() < 5  # black


def test_cmyk_encoder_rejects_bad_input():
    from deepseek_ocr_api_rs_spark.extraction.jpeg import encode_jpeg_cmyk

    with pytest.raises(ValueError):
        encode_jpeg_cmyk(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_cmyk(np.zeros((8, 8, 4), dtype=np.uint8), transform=1)


def test_16bit_dqt_tables_decode_identically():
    """pq=1 (16-bit) quantization tables: rewrite an image's 8-bit DQT
    segments into the 16-bit encoding — same values, so the decode must
    be bit-identical to the 8-bit-table original."""
    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    blob = encode_jpeg_rgb(img, quality=80)
    base = decode_jpeg_pixels(blob)

    out = bytearray()
    i = 0
    while i < len(blob):
        if blob[i] == 0xFF and i + 4 <= len(blob) and blob[i + 1] == 0xDB:
            seg_len = int.from_bytes(blob[i + 2 : i + 4], "big")
            seg = blob[i + 4 : i + 2 + seg_len]
            pq_tq, vals = seg[0], seg[1:65]
            assert pq_tq >> 4 == 0
            wide = b"".join(bytes([0, v]) for v in vals)  # same values, >u2
            new_seg = bytes([0x10 | (pq_tq & 0x0F)]) + wide
            out += b"\xff\xdb" + (len(new_seg) + 2).to_bytes(2, "big") + new_seg
            i += 2 + seg_len
        else:
            out.append(blob[i])
            i += 1
    got = decode_jpeg_pixels(bytes(out))
    assert got is not None and np.array_equal(got, base)


def test_adobe_transform0_rgb_three_component():
    """Adobe APP14 transform 0 on a 3-component frame declares RAW RGB
    planes (no color transform — the Photoshop no-transform family);
    running them through YCbCr->RGB scrambles colors (code-review r5)."""
    g = np.zeros((16, 16, 3), dtype=np.uint8)
    g[..., 1] = 255  # pure green
    blob = encode_jpeg_rgb(g, quality=95, color="rgb")
    assert b"Adobe" in blob
    got = decode_jpeg_pixels(blob)
    assert got is not None
    # green stays green (YCbCr misinterpretation would yield magenta-ish)
    assert got[8, 8, 1] > 240 and got[8, 8, 0] < 15 and got[8, 8, 2] < 15
    # bounded error on a gradient too
    yy, xx = np.mgrid[0:24, 0:32]
    img = np.stack(
        [xx * 255 // 31, yy * 255 // 23, (xx + yy) * 255 // 54], axis=-1
    ).astype(np.uint8)
    got = decode_jpeg_pixels(encode_jpeg_rgb(img, quality=95, color="rgb"))
    assert np.abs(got.astype(float) - img.astype(float)).max() <= 2.0
    with pytest.raises(ValueError):
        encode_jpeg_rgb(img, subsampling="420", color="rgb")


def test_12bit_extended_sequential_roundtrip():
    """prec=12 (SOF1 extended sequential — the scanned-document/medical
    family): 12-bit samples level-shift at 2048, render to 8-bit via the
    high nibble; round-trip lands within quantization error of
    img12 >> 4. Encoder uses universal 16-category DC / 14-size AC
    tables (Annex K's 8-bit examples cannot express 12-bit
    magnitudes)."""
    from deepseek_ocr_api_rs_spark.extraction.jpeg import encode_jpeg_12bit

    yy, xx = np.mgrid[0:24, 0:32]
    img12 = np.stack(
        [xx * 4095 // 31, yy * 4095 // 23, (xx + yy) * 4095 // 54],
        axis=-1,
    ).astype(np.uint16)
    blob = encode_jpeg_12bit(img12, quality=92)
    i = blob.index(b"\xff\xc1")
    assert blob[i + 4] == 12  # SOF1 precision byte
    got = decode_jpeg_pixels(blob)
    assert got is not None and got.shape == (24, 32, 3)
    err = np.abs(got.astype(np.float64) - (img12 >> 4).astype(np.float64))
    assert err.max() <= 2.0, err.max()
    # extremes: full-range white/black survive the widened DC categories
    flat = np.zeros((8, 8, 3), dtype=np.uint16)
    flat[..., :] = 4095
    got = decode_jpeg_pixels(encode_jpeg_12bit(flat, quality=95))
    assert got is not None and got.min() >= 253
    with pytest.raises(ValueError):
        encode_jpeg_12bit(np.full((8, 8, 3), 5000, dtype=np.uint16))
    # precision byte other than 8/12 still rejects
    bad = bytearray(blob)
    bad[i + 4] = 10
    assert decode_jpeg_pixels(bytes(bad)) is None
