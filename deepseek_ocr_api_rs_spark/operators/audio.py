"""Real audio path: WAV containers + numpy FFT spectral features.

Upgrades the audio branch of the multimodal mandate from "deterministic
fake" to real signal work with what the container has (stdlib struct +
numpy): ``make_wav_bytes`` synthesizes genuine RIFF/WAVE 16-bit PCM files,
``parse_wav`` walks the chunk structure back (fmt/data, PCM mono 16-bit —
anything else returns None, error-branch discipline), and
``spectral_features`` runs an actual rfft.

Oracle trick (same discipline as the pinned hash family): the synthesizer
places the sine EXACTLY on an FFT bin (frequency = k · rate/n), so the
dominant-bin frequency out of the FFT equals k · rate/n with zero leakage —
a value DuckDB can recompute from doc_id arithmetic. The whole
synth → RIFF encode → chunk parse → rfft → argmax chain is therefore
hash-exact against a SQL oracle, not rows-only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from functools import lru_cache as _lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RATE = 8000
DEFAULT_N = 2048  # power of two: bin width = rate/n = 3.90625 Hz exactly


@_lru_cache(maxsize=4096)
def make_wav_bytes(
    bin_k: int,
    amp: float = 0.6,
    harmonic_k: int | None = None,
    n_samples: int = DEFAULT_N,
    rate: int = DEFAULT_RATE,
) -> bytes:
    """Genuine RIFF/WAVE PCM file: mono 16-bit, one sine placed exactly on
    FFT bin ``bin_k`` (+ an optional weaker harmonic on another bin).
    Memoized — a pure function of its args, and corpora reuse few distinct
    (bin, harmonic) pairs (the sine synthesis dominates otherwise)."""
    t = np.arange(n_samples, dtype=np.float64)
    x = amp * np.sin(2.0 * np.pi * bin_k * t / n_samples)
    if harmonic_k is not None:
        x = x + (amp * 0.25) * np.sin(2.0 * np.pi * harmonic_k * t / n_samples)
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM mono 16
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(pcm)) + pcm
    return bytes(out)


def parse_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """RIFF chunk walk → (sample_rate, int16 mono samples), or None for
    anything that is not PCM mono 16-bit WAVE. Never raises."""
    try:
        if payload is None or len(payload) < 44 or payload[:4] != b"RIFF":
            return None
        if payload[8:12] != b"WAVE":
            return None
        pos = 12
        rate = None
        data = None
        n = len(payload)
        while pos + 8 <= n:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                return None
            if cid == b"fmt ":
                if clen < 16:
                    return None
                fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if fmt_tag != 1 or channels != 1 or bits != 16:
                    return None
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if rate is None or data is None or len(data) % 2:
            return None
        return int(rate), np.frombuffer(data, dtype="<i2")
    except Exception:
        return None


def spectral_features(rate: int, samples: np.ndarray) -> dict:
    """rfft over the raw PCM: dominant-bin frequency (Hz), total in-band
    energy split over 4 equal bands (integer-ish magnitudes rounded), rms."""
    x = samples.astype(np.float64)
    mag = np.abs(np.fft.rfft(x))
    mag[0] = 0.0  # DC out of the argmax
    k = int(np.argmax(mag))
    n = len(x)
    dominant_hz = k * rate / n
    bands = np.array_split(mag[1:], 4)
    return {
        "n_samples": n,
        "dominant_hz": dominant_hz,
        "band_energies": [float(np.sum(b**2)) for b in bands],
        "rms": float(np.sqrt(np.mean(x**2))) if n else 0.0,
    }


def audio_spectral_features(
    docs: DataFrame, id_col: str = "doc_id", binary_col: str = "payload"
) -> DataFrame:
    """binary audio column (WAV or AIFF, dispatched by magic) → typed
    spectral rows, Arrow-batched map-only. Unparseable payloads yield
    nulls (error-branch discipline)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            n = len(ids)
            rates = np.full(n, 0, dtype=np.int64)
            ns = np.full(n, 0, dtype=np.int64)
            doms = np.full(n, np.nan, dtype=np.float64)
            # batch the FFTs: group equal-length clips into ONE rfft call
            # (the whole batch in practice — one synth pipeline, one length)
            groups: dict[int, list[tuple[int, int, np.ndarray]]] = {}
            for i, payload in enumerate(pdf[binary_col]):
                parsed = parse_audio(bytes(payload) if payload is not None else b"")
                if parsed is None:
                    continue
                rate, samples = parsed
                groups.setdefault(len(samples), []).append((i, rate, samples))
            for length, items in groups.items():
                X = np.stack([s for _, _, s in items]).astype(np.float64)
                mag = np.abs(np.fft.rfft(X, axis=1))
                mag[:, 0] = 0.0  # DC out of the argmax
                ks = np.argmax(mag, axis=1)
                for (i, rate, _), k in zip(items, ks):
                    rates[i] = rate
                    ns[i] = length
                    doms[i] = int(k) * rate / length
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": pd.array(
                        [int(r) if r else None for r in rates], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [int(x) if x else None for x in ns], dtype="Int64"
                    ),
                    "dominant_hz": pd.array(
                        [None if np.isnan(d) else float(d) for d in doms],
                        dtype="float64",
                    ),
                }
            )

    return docs.select(
        F.col(id_col).alias(id_col), F.col(binary_col).alias(binary_col)
    ).mapInPandas(
        process,
        schema="doc_id long, sample_rate int, n_samples long, dominant_hz double",
    )


def synthesize_wav_payloads(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc_id → deterministic WAV: fundamental on bin 64 + (doc_id%32)·8,
    weak harmonic on twice that bin (capped below Nyquist)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            payloads = [
                make_wav_bytes(
                    bin_k=64 + int(d % 32) * 8,
                    harmonic_k=min((64 + int(d % 32) * 8) * 2, DEFAULT_N // 2 - 1),
                )
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        process, schema="doc_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# AIFF (r7) — the big-endian IFF sibling of WAV (Apple AIFF-C ancestor,
# EA IFF 85 chunk layout): FORM/AIFF container, COMM chunk whose sample
# rate is an IEEE 754 EXTENDED 80-bit float, SSND big-endian PCM. The
# f80 encode/decode below is the real parsing work — everything else is
# the same chunk-walk discipline as parse_wav.


def f80_encode(value: int) -> bytes:
    """Positive integer → IEEE 754 extended 80-bit (1+15 exponent bits,
    64 mantissa bits WITH explicit integer bit), the AIFF COMM sample
    rate field."""
    if value <= 0:
        return b"\x00" * 10
    e = value.bit_length() - 1
    mant = value << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def f80_decode(b: bytes) -> int:
    """The inverse for the integer rates audio containers carry."""
    if len(b) != 10:
        return 0
    se, mant = struct.unpack(">HQ", b)
    if mant == 0:
        return 0
    e = (se & 0x7FFF) - 16383
    if not 0 <= e <= 62:
        return 0  # fractional or absurd rates: out of scope
    return int(round(mant / float(1 << (63 - e))))


@_lru_cache(maxsize=4096)
def make_aiff_bytes(
    bin_k: int,
    amp: float = 0.6,
    harmonic_k: int | None = None,
    n_samples: int = DEFAULT_N,
    rate: int = DEFAULT_RATE,
) -> bytes:
    """Genuine FORM/AIFF file: mono 16-bit big-endian PCM, the same
    exact-bin sine as make_wav_bytes so the two containers cross-check
    numerically."""
    t = np.arange(n_samples, dtype=np.float64)
    x = amp * np.sin(2.0 * np.pi * bin_k * t / n_samples)
    if harmonic_k is not None:
        x = x + (amp * 0.25) * np.sin(2.0 * np.pi * harmonic_k * t / n_samples)
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype(">i2").tobytes()
    comm = struct.pack(">HIH", 1, n_samples, 16) + f80_encode(rate)
    ssnd = struct.pack(">II", 0, 0) + pcm  # offset, blockSize, data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def parse_aiff(payload: bytes) -> tuple[int, np.ndarray] | None:
    """FORM/AIFF chunk walk → (sample_rate, int16 mono samples), or None
    for anything not PCM mono 16-bit. Never raises."""
    try:
        if payload is None or len(payload) < 12 or payload[:4] != b"FORM":
            return None
        if payload[8:12] != b"AIFF":
            return None
        pos = 12
        n = len(payload)
        rate = None
        frames = None
        data = None
        while pos + 8 <= n:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                return None
            if cid == b"COMM":
                if clen < 18:
                    return None
                channels, frames, bits = struct.unpack(">HIH", body[:8])
                if channels != 1 or bits != 16:
                    return None
                rate = f80_decode(body[8:18])
            elif cid == b"SSND":
                if clen < 8:
                    return None
                offset, _block = struct.unpack(">II", body[:8])
                data = body[8 + offset :]
            pos += 8 + clen + (clen & 1)  # IFF chunks are word-aligned
        if rate is None or not rate or data is None or len(data) % 2:
            return None
        samples = np.frombuffer(data, dtype=">i2")
        if frames is not None:
            samples = samples[:frames]
        return int(rate), samples
    except Exception:
        return None


def parse_audio(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Container dispatch by magic: RIFF/WAVE or FORM/AIFF."""
    if payload is None or len(payload) < 4:
        return None
    if payload[:4] == b"RIFF":
        return parse_wav(payload)
    if payload[:4] == b"FORM":
        return parse_aiff(payload)
    return None


def synthesize_audio_payloads(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """doc_id → WAV (even ids) or AIFF (odd ids), identical exact-bin
    sine arithmetic — the mixed-container corpus for parse_audio."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            payloads = []
            for d in ids:
                bin_k = 64 + int(d % 32) * 8
                hk = min(bin_k * 2, DEFAULT_N // 2 - 1)
                maker = make_wav_bytes if d % 2 == 0 else make_aiff_bytes
                payloads.append(maker(bin_k=bin_k, harmonic_k=hk))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        process, schema="doc_id long, payload binary"
    )
