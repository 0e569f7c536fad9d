"""Baseline JPEG codec, stdlib + numpy only — closes the last pixel-decode
stub.

Decoder (``decode_jpeg_pixels``): marker parse (DQT/DHT/SOF0/SOS/DRI),
canonical Huffman table build, entropy decode with 0xFF00 unstuffing and
RSTn restart handling, DPCM DC + run/size AC, dezigzag, dequantize, float64
matrix IDCT, chroma upsampling for sampling factors h,v ∈ {1,2} (4:4:4,
4:2:2, 4:2:0), JFIF YCbCr→RGB. Progressive (SOF2), arithmetic coding,
12-bit precision and >2 sampling factors return None (documented scope).

Encoder (``encode_jpeg_rgb``): the test/fixture inverse — 4:4:4 baseline
with the ITU-T T.81 Annex K example quantization + Huffman tables, quality
scaling per the public IJG rule. JPEG is lossy: roundtrips assert bounded
error + bit determinism, not byte equality (unlike the PNG/GIF paths).

All per the public ITU-T T.81 (1992) spec + JFIF 1.02. Mirrors the
reference accepting real JPEG inputs (crates/server/src/generation.rs:
276-305 decodes fetched image payloads via the image crate).
"""

from __future__ import annotations

import struct

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


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value — simple exact-match decode dict."""
    enc = _canonical_codes(bits, values)
    return {(ln, code): v for v, (code, ln) in enc.items()}


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
        v = 0
        for _ in range(k):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

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


def _read_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        b = reader.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        v = table.get((length, code))
        if v is not None:
            return v
    return None


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


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    enc_dc: dict,
    enc_ac: dict,
    prev_dc: int,
) -> int:
    coef = _dct2(block - 128.0)
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


def encode_jpeg_rgb(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 → baseline JFIF JPEG, Annex K tables.
    ``subsampling``: '444' (no chroma decimation) or '420' (2×2 chroma —
    the layout virtually every camera/web writer emits). Optional DRI/RSTn
    restart markers every ``restart_interval`` MCUs."""
    if subsampling not in ("444", "420"):
        raise ValueError(subsampling)
    h, w, _ = img.shape
    sub = 2 if subsampling == "420" else 1
    qy = _quality_scale(STD_LUMA_Q, quality)
    qc = _quality_scale(STD_CHROMA_Q, quality)
    ycc = _rgb_to_ycbcr(img)
    mcu = 8 * sub
    ph = (h + mcu - 1) // mcu * mcu
    pw = (w + mcu - 1) // mcu * mcu
    yp = _pad_edge(ycc[..., 0], ph, pw)
    cbp = _pad_edge(ycc[..., 1], ph, pw)
    crp = _pad_edge(ycc[..., 2], ph, pw)
    if sub == 2:  # 2×2 mean chroma decimation
        cbp = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    enc_dc = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    enc_ac = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    qyt, qct = qy.reshape(8, 8), qc.reshape(8, 8)
    writer = _BitWriter()
    prev_dc = [0, 0, 0]
    mcus_y, mcus_x = ph // mcu, pw // mcu
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
            for by in range(sub):
                for bx in range(sub):
                    y0, x0 = my * mcu + by * 8, mx * mcu + bx * 8
                    prev_dc[0] = _encode_block(
                        writer, yp[y0 : y0 + 8, x0 : x0 + 8],
                        qyt, enc_dc[0], enc_ac[0], prev_dc[0],
                    )
            cy, cx = my * 8, mx * 8
            prev_dc[1] = _encode_block(
                writer, cbp[cy : cy + 8, cx : cx + 8],
                qct, enc_dc[1], enc_ac[1], prev_dc[1],
            )
            prev_dc[2] = _encode_block(
                writer, crp[cy : cy + 8, cx : cx + 8],
                qct, enc_dc[1], enc_ac[1], prev_dc[2],
            )
            mcu_count += 1
    entropy += writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, qtab in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qtab[z]) for z in ZIGZAG)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    samp = [(sub << 4) | sub, 0x11, 0x11]
    tsel = [0, 1, 1]
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


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg_pixels(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale broadcast), or None
    outside scope (progressive, arithmetic, 12-bit, sampling > 2). Never
    raises."""
    try:
        b = bytes(payload or b"")
        if b[:2] != b"\xff\xd8":
            return None
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None
        restart_interval = 0
        i = 2
        n = len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                return None  # EOI before SOS
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            seg = b[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0x0F
                    p += 1
                    if pq != 0:
                        return None  # 16-bit tables out of scope
                    tab = np.zeros(64, dtype=np.int32)
                    tab[ZIGZAG] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    qt[tq] = tab.reshape(8, 8)
                    p += 64
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
            elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
                prec = seg[0]
                if prec != 8:
                    return None
                fh = int.from_bytes(seg[1:3], "big")
                fw = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                comps = []
                for c in range(nc):
                    cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                    comps.append((cid, samp >> 4, samp & 0x0F, tq))
                frame = (fh, fw, comps)
            elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return None  # progressive / arithmetic / lossless
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                sel = {}
                for c in range(ns):
                    cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                    sel[cid] = (tabs >> 4, tabs & 0x0F)
                data_start = i + 2 + seg_len
                return _decode_scan(
                    b[data_start:], frame, qt, huff, sel, restart_interval
                )
            i += 2 + seg_len
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
) -> np.ndarray | None:
    fh, fw, comps = frame
    if fh <= 0 or fw <= 0 or len(comps) not in (1, 3):
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
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
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
    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    ycc = np.stack(full, axis=-1)
    return _ycbcr_to_rgb(ycc)
