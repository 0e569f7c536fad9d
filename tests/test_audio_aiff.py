"""AIFF container (r7): FORM/AIFF writer + chunk-walk parser with the
IEEE 754 extended 80-bit sample-rate field, cross-checked against WAV."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_api_rs_spark.operators.audio import (
    DEFAULT_N,
    f80_decode,
    f80_encode,
    make_aiff_bytes,
    make_wav_bytes,
    parse_aiff,
    parse_audio,
    parse_wav,
    spectral_features,
)


@given(st.integers(1, 2**40))
@settings(max_examples=200, deadline=None)
def test_f80_roundtrip_any_positive_rate(rate):
    assert f80_decode(f80_encode(rate)) == rate


def test_f80_edge_values():
    assert f80_decode(f80_encode(0)) == 0
    assert f80_decode(b"\x00" * 10) == 0
    assert f80_decode(b"\x00" * 9) == 0  # wrong length
    # absurd exponent (would be a fractional/huge rate): rejected
    assert f80_decode(struct.pack(">HQ", 16383 + 70, 1 << 63)) == 0


def test_wav_and_aiff_carry_identical_pcm():
    w = parse_wav(make_wav_bytes(bin_k=96, harmonic_k=192))
    a = parse_aiff(make_aiff_bytes(bin_k=96, harmonic_k=192))
    assert w is not None and a is not None
    assert w[0] == a[0] == 8000
    assert np.array_equal(w[1], a[1].astype(w[1].dtype))
    fw = spectral_features(*w)
    fa = spectral_features(*a)
    assert fw == fa
    assert fw["dominant_hz"] == 96 * 8000 / DEFAULT_N


def test_parse_audio_dispatch_and_rejections():
    w = make_wav_bytes(bin_k=80)
    a = make_aiff_bytes(bin_k=80)
    assert parse_audio(w) is not None and parse_audio(a) is not None
    # cross-parsers reject the other container
    assert parse_wav(a) is None and parse_aiff(w) is None
    assert parse_audio(b"") is None
    assert parse_audio(b"FORMxxxxAIFC") is None  # AIFF-C not claimed
    # stereo/8-bit COMM rejected
    bad = bytearray(a)
    comm = bad.index(b"COMM") + 8
    struct.pack_into(">H", bad, comm, 2)  # channels = 2
    assert parse_aiff(bytes(bad)) is None


@given(st.binary(max_size=600), st.integers(0, 2**32 - 1))
@settings(max_examples=150, deadline=None)
def test_aiff_parser_never_raises(junk, clen):
    parse_aiff(junk)
    # plausible header + junk chunks
    payload = b"FORM" + struct.pack(">I", clen) + b"AIFF" + junk
    parse_aiff(payload)


def test_ssnd_offset_honored():
    """SSND's offset field skips pad bytes before the PCM."""
    a = make_aiff_bytes(bin_k=72)
    base = parse_aiff(a)
    assert base is not None
    # rebuild with offset 4: four pad bytes prepended to the data
    idx = a.index(b"SSND")
    (clen,) = struct.unpack(">I", a[idx + 4 : idx + 8])
    body = a[idx + 8 : idx + 8 + clen]
    _off, _blk = struct.unpack(">II", body[:8])
    new_body = struct.pack(">II", 4, 0) + b"\x00" * 4 + body[8:]
    rebuilt = (
        a[: idx + 4]
        + struct.pack(">I", len(new_body))
        + new_body
    )
    rebuilt = (
        b"FORM" + struct.pack(">I", len(rebuilt) - 8) + rebuilt[8:]
    )
    got = parse_aiff(rebuilt)
    assert got is not None
    assert np.array_equal(got[1], base[1])
