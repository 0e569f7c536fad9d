"""Property-based sweeps over the round-4 codecs (hypothesis): random
inputs through encoder→decoder must round-trip exactly (LZW, ASCII85,
RunLength, AES-CBC) and random images through the progressive JPEG
pipeline must equal the baseline pipeline bit-for-bit — the fixed-fixture
equality tests generalized to arbitrary inputs."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from deepseek_ocr_api_rs_spark.extraction.aes import cbc_decrypt, cbc_encrypt
from deepseek_ocr_api_rs_spark.extraction.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_progressive,
    encode_jpeg_rgb,
)
from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
    ascii85_decode,
    ascii85_encode,
    lzw_decode,
    lzw_encode,
    runlength_decode,
    runlength_encode,
)


@given(st.binary(max_size=3000), st.sampled_from([0, 1]))
@settings(max_examples=120, deadline=None)
def test_lzw_roundtrip_any_bytes(data, early):
    assert lzw_decode(lzw_encode(data, early=early), early=early) == data


@given(st.binary(max_size=2000))
@settings(max_examples=120, deadline=None)
def test_ascii85_roundtrip_any_bytes(data):
    assert ascii85_decode(ascii85_encode(data)) == data


@given(st.binary(max_size=2000))
@settings(max_examples=120, deadline=None)
def test_runlength_roundtrip_any_bytes(data):
    assert runlength_decode(runlength_encode(data)) == data


@given(st.binary(min_size=16, max_size=16), st.binary(max_size=600))
@settings(max_examples=60, deadline=None)
def test_aes_cbc_roundtrip_any_key_and_payload(key, data):
    iv = bytes(range(16))
    assert cbc_decrypt(key, cbc_encrypt(key, iv, data)) == data


# random small images: dims, quality, subsampling, pixel content all drawn
_img = st.builds(
    lambda h, w, seed: (
        np.clip(
            np.stack(
                [
                    (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 3 + seed) % 256,
                    (np.arange(h)[:, None] * 2 + np.arange(w)[None, :] * 11 + seed * 5) % 256,
                    (np.arange(h)[:, None] * 13 + np.arange(w)[None, :] * 5 + seed * 9) % 256,
                ],
                axis=2,
            ),
            0,
            255,
        ).astype(np.uint8)
    ),
    h=st.integers(8, 40),
    w=st.integers(8, 48),
    seed=st.integers(0, 10_000),
)


@given(_img, st.integers(12, 96), st.sampled_from(["444", "420", "422", "440"]))
@settings(max_examples=80, deadline=None)
def test_progressive_equals_baseline_on_random_images(img, quality, subsampling):
    base = decode_jpeg_pixels(encode_jpeg_rgb(img, quality, subsampling))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, quality, subsampling))
    assert base is not None and prog is not None
    assert np.array_equal(base, prog), (img.shape, quality, subsampling)


def _formula_img(h: int, w: int, seed: int) -> np.ndarray:
    """The same deterministic pixel formula the hypothesis strategy uses."""
    return np.clip(
        np.stack(
            [
                (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 3 + seed) % 256,
                (np.arange(h)[:, None] * 2 + np.arange(w)[None, :] * 11 + seed * 5) % 256,
                (np.arange(h)[:, None] * 13 + np.arange(w)[None, :] * 5 + seed * 9) % 256,
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)


def test_progressive_equals_baseline_pinned_tie_flip_counterexample():
    """Pinned regression: 16x8, seed=3, quality=96, 4:2:0 (partial-MCU
    chroma). With a whole-plane einsum DCT in _quantized_comp_blocks,
    one chroma coefficient (comp 1, block (0,0), zigzag 14) lands within
    1 ulp of -0.5 and np.rint flips it 0/-1 versus the baseline
    per-block _dct2 path, so decoded pixels differ by +/-2. Both
    encoders must share one float summation order bit-for-bit."""
    img = _formula_img(16, 8, 3)
    base = decode_jpeg_pixels(encode_jpeg_rgb(img, 96, "420"))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, 96, "420"))
    assert base is not None and prog is not None
    assert np.array_equal(base, prog)


@given(
    st.integers(8, 40), st.integers(8, 48), st.integers(0, 10_000),
    st.integers(95, 96),
)
@settings(max_examples=60, deadline=None)
def test_progressive_equals_baseline_high_quality_420_corner(h, w, seed, quality):
    """Focused sweep of the corner the general property under-samples:
    quality >= 95 (quantizers near 1 keep sub-ulp DCT differences alive)
    x 4:2:0 x dims that are not multiples of 16 (partial-MCU chroma)."""
    img = _formula_img(h, w, seed)
    base = decode_jpeg_pixels(encode_jpeg_rgb(img, quality, "420"))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, quality, "420"))
    assert base is not None and prog is not None
    assert np.array_equal(base, prog), (h, w, seed, quality)


@given(
    st.integers(8, 32), st.integers(8, 40), st.integers(0, 10_000),
    st.integers(50, 96), st.sampled_from([0, 2]),
)
@settings(max_examples=25, deadline=None)
def test_cmyk_roundtrip_bounded_error(h, w, seed, quality, transform):
    """Property sweep for the 4-component Adobe path: smooth synthetic
    CMYK encodes/decodes within a quality-dependent error bound and
    never raises."""
    from deepseek_ocr_api_rs_spark.extraction.jpeg import encode_jpeg_cmyk

    yy, xx = np.mgrid[0:h, 0:w]
    cmyk = np.clip(
        np.stack(
            [
                (xx * 3 + seed) % 256,
                (yy * 5 + seed * 7) % 256,
                (xx + yy * 2 + seed * 3) % 256,
                np.full((h, w), (seed * 11) % 200),
            ],
            axis=-1,
        ),
        0,
        255,
    ).astype(np.uint8)
    blob = encode_jpeg_cmyk(cmyk, quality=quality, transform=transform)
    rgb = decode_jpeg_pixels(blob)
    assert rgb is not None and rgb.shape == (h, w, 3)
    c, m, y, k = [cmyk[..., i].astype(np.float64) for i in range(4)]
    exp = np.stack(
        [
            (255 - c) * (255 - k) / 255,
            (255 - m) * (255 - k) / 255,
            (255 - y) * (255 - k) / 255,
        ],
        axis=-1,
    )
    # modulo gradients have hard wrap edges: bound the MEAN error (ringing
    # at wraps makes max unbounded at low quality), tight for smooth runs
    err = np.abs(rgb.astype(np.float64) - exp).mean()
    assert err < 30.0, (h, w, seed, quality, transform, err)


# --- simple-font encodings (round 5) ---------------------------------------

from deepseek_ocr_api_rs_spark.extraction.pdf_encodings import (  # noqa: E402
    apply_differences,
    encode_with_table,
    macroman_table,
    standard_table,
    winansi_table,
)

_WINANSI = winansi_table()
# printable, bullet-free (bullet marks undefined slots), encoder-reachable
_WINANSI_ALPHABET = "".join(
    sorted(
        {
            ch
            for code, ch in enumerate(_WINANSI)
            if 0x20 <= code and ch not in ("•", "\x7f")
            and not (0x7F <= ord(ch) < 0xA0)
        }
    )
)


@given(st.text(alphabet=_WINANSI_ALPHABET, min_size=1, max_size=60))
@settings(max_examples=60, deadline=None)
def test_winansi_pdf_roundtrip_property(text):
    """Any WinAnsi-encodable span text survives the classic-writer →
    parser round-trip byte-exact through the /Encoding table."""
    from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
        make_pdf_bytes,
        parse_real_pdf,
    )

    spans = [{"page": 0, "x0": 40.0, "y0": 90.0, "x1": 400.0,
              "y1": 102.0, "text": text}]
    parsed = parse_real_pdf(make_pdf_bytes(spans, font_encoding="winansi"))
    assert parsed is not None
    assert parsed[1][0]["text"] == text


@given(st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_apply_differences_never_raises(junk):
    for base in (winansi_table(), macroman_table(), standard_table()):
        t = apply_differences(base, junk)
        assert len(t) == 256 and all(isinstance(c, str) for c in t)


@given(st.text(alphabet=_WINANSI_ALPHABET, min_size=0, max_size=80))
@settings(max_examples=60, deadline=None)
def test_encode_decode_table_inverse(text):
    enc = encode_with_table(text, _WINANSI)
    assert len(enc) == len(text)
    assert "".join(_WINANSI[b] for b in enc) == text


@given(
    st.integers(1, 40), st.integers(1, 40), st.integers(0, 10_000),
    st.sampled_from([1, 5, 32773]), st.sampled_from([1, 2]),
    st.booleans(),
    st.sampled_from([None, (8, 8), (16, 16), (16, 8)]),
    st.sampled_from([8, 16]),
)
@settings(max_examples=60, deadline=None)
def test_tiff_roundtrip_any_combination(h, w, seed, comp, pred, be, tile, bits):
    """Property sweep over the full TIFF encode space: strip/tiled x
    none/LZW/PackBits x predictor x byte order x 8/16-bit must
    round-trip exactly (16-bit → high byte)."""
    from deepseek_ocr_api_rs_spark.extraction.tiff import (
        decode_tiff_pixels,
        encode_tiff_rgb,
        encode_tiff_rgb16,
    )

    img = _formula_img(h, w, seed)
    if bits == 8:
        blob = encode_tiff_rgb(
            img, compression=comp, predictor=pred, big_endian=be, tile=tile
        )
        want = img
    else:
        img16 = img.astype(np.uint16) * 257
        blob = encode_tiff_rgb16(
            img16, compression=comp, predictor=pred, big_endian=be, tile=tile
        )
        want = img
    got = decode_tiff_pixels(blob)
    assert got is not None and np.array_equal(got, want), (
        h, w, comp, pred, be, tile, bits,
    )


@given(
    st.integers(1, 4096), st.integers(1, 4096), st.integers(0, 10_000_000),
    st.sampled_from([600, 1000, 90000]),
    st.sampled_from([b"avc1", b"hev1", b"mp4v", b"av01"]),
)
@settings(max_examples=60, deadline=None)
def test_mp4_meta_roundtrip_any_fields(w, h, dur, ts, codec):
    from deepseek_ocr_api_rs_spark.operators.video import (
        make_mp4_meta,
        parse_mp4_meta,
    )

    m = parse_mp4_meta(make_mp4_meta(w, h, dur, timescale=ts, codec=codec))
    assert m is not None
    assert (m["width"], m["height"], m["timescale"]) == (w, h, ts)
    assert m["codec"] == codec.decode()
    assert m["duration_ms"] == (dur * ts // 1000) * 1000 // ts


@given(st.binary(max_size=200), st.integers(0, 120))
@settings(max_examples=120, deadline=None)
def test_mp4_and_tiff_parsers_never_raise_on_garbage(junk, cut):
    """Truncation/garbage fuzz: tolerant parsers return None, never
    raise (error-branch discipline)."""
    from deepseek_ocr_api_rs_spark.extraction.tiff import decode_tiff_pixels
    from deepseek_ocr_api_rs_spark.operators.video import (
        make_mp4_meta,
        parse_mp4_meta,
    )

    blob = make_mp4_meta(64, 48, 2500)
    parse_mp4_meta(blob[: min(cut, len(blob))] + junk)
    parse_mp4_meta(junk)
    decode_tiff_pixels(b"II*\x00" + junk)
    decode_tiff_pixels(junk)
