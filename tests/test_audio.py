"""Real audio path (operators/audio.py): RIFF/WAVE synth → stdlib chunk
parse → numpy rfft spectral features. The synthesizer places the sine
exactly on an FFT bin, so the dominant frequency is doc-arithmetic-exact."""

from __future__ import annotations

import struct

import numpy as np

from deepseek_ocr_api_rs_spark.operators.audio import (
    DEFAULT_N,
    DEFAULT_RATE,
    make_wav_bytes,
    parse_wav,
    spectral_features,
)


def test_wav_roundtrip_and_header():
    wav = make_wav_bytes(bin_k=100)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    parsed = parse_wav(wav)
    assert parsed is not None
    rate, samples = parsed
    assert rate == DEFAULT_RATE and len(samples) == DEFAULT_N
    assert samples.dtype == np.int16
    assert int(np.abs(samples).max()) > 15000  # real signal, not silence


def test_dominant_bin_is_exact():
    for k in (64, 129, 300, DEFAULT_N // 2 - 1):
        rate, samples = parse_wav(make_wav_bytes(bin_k=k))
        feats = spectral_features(rate, samples)
        assert feats["dominant_hz"] == k * DEFAULT_RATE / DEFAULT_N, k


def test_harmonic_does_not_steal_dominance():
    rate, samples = parse_wav(make_wav_bytes(bin_k=80, harmonic_k=160))
    feats = spectral_features(rate, samples)
    assert feats["dominant_hz"] == 80 * DEFAULT_RATE / DEFAULT_N
    # but the harmonic carries real energy: band containing bin 160 > empty top band
    assert feats["band_energies"][0] > feats["band_energies"][3]


def test_parse_wav_rejects_non_pcm_and_garbage():
    assert parse_wav(b"") is None
    assert parse_wav(b"RIFFxxxxNOPE") is None
    assert parse_wav(b"not audio at all" * 10) is None
    # stereo (channels=2) rejected
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    assert parse_wav(wav) is None
    # truncated data chunk
    wav2 = make_wav_bytes(bin_k=64)[:-100]
    assert parse_wav(wav2) is None


def test_audio_spectral_features_spark(spark):
    import pyspark.sql.functions as F

    from deepseek_ocr_api_rs_spark.operators.audio import (
        audio_spectral_features,
        synthesize_wav_payloads,
    )

    base = spark.range(40).select(F.col("id").alias("doc_id"))
    rows = {
        r.doc_id: r
        for r in audio_spectral_features(synthesize_wav_payloads(base)).collect()
    }
    assert len(rows) == 40
    for d, r in rows.items():
        k = 64 + (d % 32) * 8
        assert r.sample_rate == DEFAULT_RATE and r.n_samples == DEFAULT_N
        assert r.dominant_hz == k * DEFAULT_RATE / DEFAULT_N, d


def test_non_wav_payloads_yield_nulls(spark):
    from deepseek_ocr_api_rs_spark.operators.audio import audio_spectral_features

    df = spark.createDataFrame(
        [(1, b"junk bytes"), (2, None)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in audio_spectral_features(df).collect()}
    assert rows[1].dominant_hz is None and rows[2].sample_rate is None
