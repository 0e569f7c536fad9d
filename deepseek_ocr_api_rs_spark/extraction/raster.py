"""Real raster work, stdlib + numpy only: PNG pixel decode and the
reference's fixed-point bicubic resize.

PNG decode (``decode_png_pixels``): chunk walk, concatenated-IDAT zlib
inflate, and scanline UNFILTERING (filters 0-4: None/Sub/Up/Average/Paeth,
PNG spec §9 / RFC 2083) — no image library involved. Supported: 8-bit
greyscale (0), truecolor (2), palette (3), grey+alpha (4) and RGBA (6),
non-interlaced; everything else returns None (caller falls back to
header-only metadata). Output is always an (h, w, 3) uint8 RGB array —
alpha is dropped, grey broadcast, palette looked up — matching how the
reference converts every load to RGB8 before preprocessing
(crates/infer-deepseek/src/vision/preprocess.rs uses RgbImage throughout).

Bicubic resize (``resize_bicubic``): a 1:1 restatement of the reference's
fixed-point separable resampler (crates/infer-deepseek/src/vision/
resample.rs:1-160, itself Pillow's algorithm): a=-0.5 kernel, per-output-
pixel float64 coefficient rows normalized then quantized to int32 at 22-bit
precision, i64 accumulation seeded with the rounding bias, arithmetic-shift
clip8 — horizontal pass then vertical pass. Integer accumulation makes the
result bit-exact and association-order-independent, so the numpy
vectorization below and a scalar loop produce identical bytes (pinned by
tests/test_raster.py).

The PNG scanline unfilter doubles as the FlateDecode /Predictor 10-15
decoder for real-PDF streams (extraction/pdf_real.py) — same algorithm per
the PDF 32000 §7.4.4.4 reference to PNG filtering.
"""

from __future__ import annotations

import struct
import zlib
from functools import lru_cache as _lru_cache

import numpy as np

PRECISION_BITS = 22
PRECISION_SCALE = float(1 << PRECISION_BITS)
ROUNDING_BIAS = 1 << (PRECISION_BITS - 1)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG scanline unfiltering (shared: PNG pixel decode + PDF stream predictors)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def unfilter_scanlines(data: bytes, rowlen: int, bpp: int) -> bytes | None:
    """Reverse PNG per-row filtering: ``data`` is rows of
    (1 filter byte + ``rowlen`` payload bytes); ``bpp`` is the byte distance
    to the corresponding byte of the pixel to the left (≥1). Returns the
    concatenated unfiltered rows, or None on malformed input.

    Row filters per PNG spec §9: 0 None, 1 Sub (left), 2 Up, 3 Average
    (floor((left+up)/2)), 4 Paeth. Sub is a cumulative sum mod 256 along
    the row (vectorized); Average/Paeth need the just-computed left byte so
    they run as per-byte loops — rows are short (≤ a few KB) and this path
    is exactness-critical, not throughput-critical.
    """
    stride = rowlen + 1
    if rowlen <= 0 or len(data) < stride or len(data) % stride != 0:
        return None
    n_rows = len(data) // stride
    arr = np.frombuffer(data, dtype=np.uint8).reshape(n_rows, stride)
    if not arr[:, 0].any():  # every row filter 0 — one vectorized copy
        return arr[:, 1:].tobytes()
    out = np.zeros((n_rows, rowlen), dtype=np.uint8)
    for y in range(n_rows):
        ftype = int(arr[y, 0])
        row = arr[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(rowlen, np.int64)
        if ftype == 0:
            out[y] = row.astype(np.uint8)
        elif ftype == 1:  # Sub: cumsum mod 256 per left-offset lane
            res = row.copy()
            for lane in range(bpp):
                res[lane::bpp] = np.cumsum(row[lane::bpp]) % 256
            out[y] = res.astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = ((row + prev) % 256).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(rowlen):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + (left + int(prev[x])) // 2) % 256
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(rowlen):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                cur[x] = (int(row[x]) + _paeth(a, b, c)) % 256
        else:
            return None
    return out.tobytes()


# ---------------------------------------------------------------------------
# PNG pixel decode


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png_pixels(payload: bytes) -> np.ndarray | None:
    """Full PNG pixel decode → (h, w, 3) uint8 RGB, or None if the payload
    is malformed or out of spec. Sample depths 1/2/4 (grayscale and
    palette, MSB-first packed), 8, AND 16 (scaled to 8 by taking the high
    byte, libpng's default); non-interlaced AND Adam7 interlaced (each
    pass is an independently filtered sub-image; the 7 passes are
    scattered back onto the x/y stride grid). stdlib zlib + the shared
    scanline unfilter; never raises."""
    try:
        if not payload or not payload.startswith(PNG_MAGIC):
            return None
        pos = len(PNG_MAGIC)
        width = height = -1
        bit_depth = color_type = interlace = -1
        idat = bytearray()
        palette: bytes | None = None
        n = len(payload)
        while pos + 8 <= n:
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if len(data) < length:
                return None
            if ctype == b"IHDR":
                if length < 13:
                    return None
                width, height, bit_depth, color_type, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", data[:13])
                )
            elif ctype == b"PLTE":
                palette = bytes(data)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        if (
            width <= 0
            or height <= 0
            or bit_depth not in (1, 2, 4, 8, 16)
            or interlace not in (0, 1)
        ):
            return None
        channels = _CHANNELS.get(color_type)
        if channels is None or not idat:
            return None
        if bit_depth == 16 and color_type == 3:
            return None  # palette indices are 8-bit max by spec
        if bit_depth < 8 and color_type not in (0, 3):
            return None  # sub-byte depths: grayscale/palette only (§11.2.2)
        # filter distance: whole bytes, min 1 (sub-byte rows filter by byte)
        bpp = max(1, channels * bit_depth // 8)

        def row_bytes(w: int) -> int:
            return (w * channels * bit_depth + 7) // 8

        raw = zlib.decompress(bytes(idat))

        def rows_to_img(flat: bytes, h: int, w: int) -> np.ndarray:
            if bit_depth == 16:
                a = np.frombuffer(flat, dtype=">u2").reshape(h, w, channels)
                return (a >> 8).astype(np.uint8)
            if bit_depth == 8:
                return np.frombuffer(flat, dtype=np.uint8).reshape(
                    h, w, channels
                ).copy()
            # 1/2/4-bit: MSB-first packed single-channel samples
            a = np.frombuffer(flat, dtype=np.uint8).reshape(h, row_bytes(w))
            bits = np.unpackbits(a, axis=1)[:, : w * bit_depth]
            bits = bits.reshape(h, w, bit_depth)
            vals = np.zeros((h, w), dtype=np.uint8)
            for k in range(bit_depth):
                vals = (vals << 1) | bits[:, :, k]
            if color_type == 0:
                # exact sample scaling: 255 is divisible by 1, 3 and 15
                vals = vals * (255 // ((1 << bit_depth) - 1))
            return vals[:, :, None].astype(np.uint8)

        if interlace == 0:
            flat = unfilter_scanlines(raw, row_bytes(width), bpp)
            if flat is None:
                return None
            img = rows_to_img(flat, height, width)
        else:
            img = np.zeros((height, width, channels), dtype=np.uint8)
            pos2 = 0
            for xs, ys, xstep, ystep in _ADAM7:
                pw = (width - xs + xstep - 1) // xstep
                ph = (height - ys + ystep - 1) // ystep
                if pw <= 0 or ph <= 0:
                    continue  # empty pass emits no scanlines (spec §8.2)
                stride = row_bytes(pw) + 1
                chunk = raw[pos2 : pos2 + ph * stride]
                pos2 += ph * stride
                flat = unfilter_scanlines(chunk, row_bytes(pw), bpp)
                if flat is None:
                    return None
                img[ys::ystep, xs::xstep, :] = rows_to_img(flat, ph, pw)
        if color_type == 2:
            return img.copy()
        if color_type == 6:
            return img[:, :, :3].copy()
        if color_type == 0:
            return np.repeat(img, 3, axis=2)
        if color_type == 4:
            return np.repeat(img[:, :, :1], 3, axis=2)
        if color_type == 3:
            if palette is None or len(palette) % 3:
                return None
            lut = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
            idx = img[:, :, 0]
            if int(idx.max(initial=0)) >= lut.shape[0]:
                return None
            return lut[idx]
        return None
    except Exception:
        return None


def encode_png_rgb(
    img: np.ndarray,
    interlace: bool = False,
    bit_depth: int = 8,
    row_filter: int = 0,
) -> bytes:
    """(h, w, 3) uint8 → valid truecolor PNG (one IDAT). Fixture knobs for
    the decoder's full input space: ``interlace=True`` emits the Adam7
    pass sequence; ``bit_depth=16`` widens samples as v*257 (the spec's
    8→16 expansion, whose high byte round-trips to v exactly);
    ``row_filter=1`` writes Sub-filtered rows (left-delta) so filtered
    scanlines inside interlace passes are exercised too."""
    if bit_depth not in (8, 16) or row_filter not in (0, 1):
        raise ValueError("bit_depth must be 8/16, row_filter 0/1")
    h, w, _ = img.shape
    bpp = 3 * (bit_depth // 8)

    def sample_bytes(a: np.ndarray) -> np.ndarray:
        # (rows, cols, 3) uint8 → flat filtered-ready byte rows
        if bit_depth == 16:
            wide = (a.astype(np.uint16) * 257).astype(">u2")
            return wide.reshape(a.shape[0], -1).view(np.uint8)
        return a.reshape(a.shape[0], -1)

    def filter_rows(rows: np.ndarray) -> bytes:
        if row_filter == 0:
            return b"".join(b"\x00" + rows[y].tobytes() for y in range(rows.shape[0]))
        out = bytearray()
        for y in range(rows.shape[0]):
            r = rows[y].astype(np.int16)
            left = np.zeros_like(r)
            left[bpp:] = r[:-bpp]
            out += b"\x01" + ((r - left) % 256).astype(np.uint8).tobytes()
        return bytes(out)

    if interlace:
        raw = b""
        for xs, ys, xstep, ystep in _ADAM7:
            sub = img[ys::ystep, xs::xstep, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += filter_rows(sample_bytes(sub))
    else:
        raw = filter_rows(sample_bytes(img))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, 2, 0, 0, 1 if interlace else 0
    )
    # level 6: deterministic like any fixed level, ~2× faster than 9 on the
    # photographic-ish rasters this path carries
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png_indexed(
    idx: np.ndarray,
    palette: np.ndarray,
    bit_depth: int = 8,
    interlace: bool = False,
    grayscale: bool = False,
) -> bytes:
    """(h, w) uint8 sample raster → paletted (type 3, with the given
    (n, 3) palette) or grayscale (type 0) PNG at depth 1/2/4/8,
    MSB-first bit packing, filter-0 rows, optionally Adam7 — the fixture
    inverse for the sub-byte decode paths (icons/diagrams family)."""
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError("bit_depth must be 1/2/4/8")
    if int(idx.max(initial=0)) >= (1 << bit_depth):
        raise ValueError("sample exceeds bit depth")
    h, w = idx.shape

    def pack_rows(rows: np.ndarray) -> bytes:
        if bit_depth == 8:
            return b"".join(
                b"\x00" + rows[y].tobytes() for y in range(rows.shape[0])
            )
        out = bytearray()
        for y in range(rows.shape[0]):
            bits = (
                (rows[y][:, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
            ).astype(np.uint8)
            out += b"\x00" + np.packbits(bits.reshape(-1)).tobytes()
        return bytes(out)

    if interlace:
        raw = b""
        for xs, ys, xstep, ystep in _ADAM7:
            sub = idx[ys::ystep, xs::xstep]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += pack_rows(sub)
    else:
        raw = pack_rows(idx)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    color_type = 0 if grayscale else 3
    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1 if interlace else 0
    )
    out = PNG_MAGIC + chunk(b"IHDR", ihdr)
    if not grayscale:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# fixed-point bicubic resize (resample.rs transliteration)


def _round_half_towards_zero(value: float) -> int:
    import math

    if value >= 0.0:
        return int(math.floor(value + 0.5))
    return int(math.ceil(value + 0.5))


def _bicubic_kernel(value: float) -> float:
    a = -0.5
    x = abs(value)
    if x < 1.0:
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    if x < 2.0:
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return 0.0


@_lru_cache(maxsize=4096)
def compute_resample_coeffs(
    input_size: int, output_size: int
) -> list[tuple[int, np.ndarray]]:
    """Per-output-index (xmin, int32 coefficient row) — resample.rs
    compute_resample_coeffs with identical float64 math, normalization and
    int32 quantization (truncate-toward-zero after ±0.5 bias, as Rust's
    ``as i32`` does). Cached: coefficient tables depend only on the
    (input, output) size pair, and a corpus reuses few distinct pairs —
    recomputing them per image dominated the resize stage."""
    scale = input_size / output_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    out: list[tuple[int, np.ndarray]] = []
    ss = 1.0 / filterscale
    for out_index in range(output_size):
        center = (out_index + 0.5) * scale
        xmin = _round_half_towards_zero(center - support)
        if xmin < 0:
            xmin = 0
        xmax = _round_half_towards_zero(center + support)
        if xmax > input_size:
            xmax = input_size
        if xmin >= input_size:
            xmin = max(input_size - 1, 0)
        if xmax <= xmin:
            xmax = xmin + 1
        length = xmax - xmin
        weights = [
            _bicubic_kernel((xmin + i - center + 0.5) * ss) for i in range(length)
        ]
        total = sum(weights)
        if total != 0.0:
            weights = [w / total for w in weights]
        coeffs = np.empty(length, dtype=np.int32)
        for i, v in enumerate(weights):
            coeffs[i] = int(
                (-0.5 + v * PRECISION_SCALE)
                if v < 0.0
                else (0.5 + v * PRECISION_SCALE)
            )
        out.append((xmin, coeffs))
    return out


def resize_bicubic(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Fixed-point separable bicubic resize of an (h, w, 3) uint8 image —
    bit-exact restatement of resample.rs resize_bicubic: horizontal pass to
    (src_h, dst_w) u8, then vertical pass to (dst_h, dst_w) u8, each output
    byte = clip((Σ src*coeff_int + ROUNDING_BIAS) >> 22, 0, 255). All-int64
    accumulation ⇒ the numpy matmul order cannot change the result."""
    if width <= 0 or height <= 0:
        return np.zeros((max(height, 0), max(width, 0), 3), dtype=np.uint8)
    src_h, src_w, _ = img.shape
    cx = compute_resample_coeffs(src_w, width)
    cy = compute_resample_coeffs(src_h, height)

    src = img.astype(np.int64)
    horizontal = np.empty((src_h, width, 3), dtype=np.uint8)
    for dst_x, (start, coeffs) in enumerate(cx):
        seg = src[:, start : start + len(coeffs), :]  # (src_h, len, 3)
        acc = np.tensordot(seg, coeffs.astype(np.int64), axes=([1], [0]))
        horizontal[:, dst_x, :] = np.clip(
            (acc + ROUNDING_BIAS) >> PRECISION_BITS, 0, 255
        ).astype(np.uint8)

    hsrc = horizontal.astype(np.int64)
    output = np.empty((height, width, 3), dtype=np.uint8)
    for dst_y, (start, coeffs) in enumerate(cy):
        seg = hsrc[start : start + len(coeffs), :, :]  # (len, dst_w, 3)
        acc = np.tensordot(coeffs.astype(np.int64), seg, axes=([0], [0]))
        output[dst_y, :, :] = np.clip(
            (acc + ROUNDING_BIAS) >> PRECISION_BITS, 0, 255
        ).astype(np.uint8)
    return output


def resize_bicubic_scalar(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Direct per-pixel scalar transliteration of resample.rs (loops, no
    numpy reductions) — the parity witness for the vectorized path."""
    if width <= 0 or height <= 0:
        return np.zeros((max(height, 0), max(width, 0), 3), dtype=np.uint8)
    src_h, src_w, _ = img.shape
    cx = compute_resample_coeffs(src_w, width)
    cy = compute_resample_coeffs(src_h, height)

    def clip8(v: int) -> int:
        return min(max(v >> PRECISION_BITS, 0), 255)

    horizontal = np.zeros((src_h, width, 3), dtype=np.uint8)
    for y in range(src_h):
        for dst_x, (start, coeffs) in enumerate(cx):
            for c in range(3):
                acc = ROUNDING_BIAS
                for i, wgt in enumerate(coeffs):
                    acc += int(img[y, start + i, c]) * int(wgt)
                horizontal[y, dst_x, c] = clip8(acc)
    output = np.zeros((height, width, 3), dtype=np.uint8)
    for dst_y, (start, coeffs) in enumerate(cy):
        for dst_x in range(width):
            for c in range(3):
                acc = ROUNDING_BIAS
                for i, wgt in enumerate(coeffs):
                    acc += int(horizontal[start + i, dst_x, c]) * int(wgt)
                output[dst_y, dst_x, c] = clip8(acc)
    return output


# ---------------------------------------------------------------------------
# GIF pixel decode (LZW) + encoder — GIF89a spec (public, CompuServe 1990)


def _lzw_decode(data: bytes, min_code: int) -> bytes | None:
    """GIF-flavor LZW: variable code width (min+1 → 12 bits, LSB-first bit
    packing), CLEAR resets the dictionary, EOI terminates. Returns the
    decoded index stream or None on malformed input."""
    if not (2 <= min_code <= 11):
        return None
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code + 1
        prev = None

    reset()
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                continue
            if code == eoi:
                return bytes(out)
            if code < len(table) and code != clear and code != eoi:
                entry = table[code]
                if not entry and code >= clear:
                    return None
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return bytes(out)  # tolerant: missing EOI (some writers omit it)


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Real dictionary-building GIF LZW encoder (greedy longest match) —
    exercises the decoder's code-width growth, not just literals."""
    clear = 1 << min_code
    eoi = clear + 1
    codes: list[int] = [clear]
    widths: list[int] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    widths.append(width)

    def emit(code: int) -> None:
        codes.append(code)
        widths.append(width)

    w = b""
    for b in bytes(indices):
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            # the ENCODER grows its width when next_code exceeds the
            # current width's range — mirrored by the decoder
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    # pack LSB-first with per-code widths (width at emission time)
    acc = 0
    nbits = 0
    out = bytearray()
    widths = widths[: len(codes)]
    for code, cw in zip(codes, widths):
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif_pixels(payload: bytes) -> np.ndarray | None:
    """Full GIF pixel decode → (h, w, 3) uint8 RGB for the FIRST image
    block (global or local palette, non-interlaced and interlaced), or
    None when unsupported/malformed. stdlib-only; never raises."""
    try:
        b = bytes(payload or b"")
        if len(b) < 13 or b[:3] != b"GIF" or b[3:6] not in (b"87a", b"89a"):
            return None
        sw = int.from_bytes(b[6:8], "little")
        sh = int.from_bytes(b[8:10], "little")
        packed = b[10]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            if gct.shape[0] < n:
                return None
            pos += 3 * n
        while pos < len(b):
            block = b[pos]
            if block == 0x3B:  # trailer
                return None
            if block == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(b) and b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
                continue
            if block != 0x2C:
                return None
            # image descriptor
            w = int.from_bytes(b[pos + 5 : pos + 7], "little")
            h = int.from_bytes(b[pos + 7 : pos + 9], "little")
            ipacked = b[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if pal is None or w <= 0 or h <= 0 or w > sw * 4 or h > sh * 4:
                return None
            min_code = b[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                lzw += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx_stream = _lzw_decode(bytes(lzw), min_code)
            if idx_stream is None or len(idx_stream) < w * h:
                return None
            idx = np.frombuffer(idx_stream[: w * h], dtype=np.uint8).reshape(h, w)
            if ipacked & 0x40:  # interlaced: de-interlace the row order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(idx)
                de[order] = idx
                idx = de
            if int(idx.max(initial=0)) >= pal.shape[0]:
                return None
            return pal[idx]
        return None
    except Exception:
        return None


def encode_gif_rgb_indexed(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 index raster + (n, 3) palette → real GIF89a bytes with
    a genuine dictionary-building LZW stream (test/fixture inverse of
    decode_gif_pixels)."""
    h, w = idx.shape
    n = palette.shape[0]
    size_bits = max((n - 1).bit_length(), 1)
    n_slots = 1 << size_bits
    pal = np.zeros((n_slots, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", w, h)
    out.append(0x80 | (size_bits - 1))  # GCT present
    out += b"\x00\x00" + pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = idx[order]
    min_code = max(size_bits, 2)
    out.append(min_code)
    lzw = _lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


GIF_PALETTE = np.stack(
    [
        np.arange(256, dtype=np.uint8),
        (255 - np.arange(256)).astype(np.uint8),
        ((np.arange(256) * 7) % 256).astype(np.uint8),
    ],
    axis=1,
)


# ---------------------------------------------------------------------------
# ANIMATED GIF (r7) — writer, budget-aware frame walk, and disposal-
# correct compositor. Animated GIFs are the web's third moving-picture
# container (after MJPEG-AVI and MP4 here); frames are DELTA-coded
# sub-rectangles over a shared canvas with per-frame disposal and
# transparency (GIF89a Graphic Control Extension, public CompuServe
# spec + NETSCAPE2.0 loop extension). The honest frame budget for a
# delta-coded format: the walk never LZW-decodes anything (it records
# sub-block byte ranges only), and rendering decodes frames 0..max(
# sampled) — a later frame's canvas depends on every prior frame — but
# never past the last sampled index.


def encode_gif_animation(
    canvas_w: int,
    canvas_h: int,
    frames: list[dict],
    palette: np.ndarray,
    loop: int = 0,
    bg_index: int = 0,
) -> bytes:
    """Real GIF89a animation: LSD + GCT + NETSCAPE2.0 loop + per-frame
    GCE (delay, disposal, optional transparency) + image descriptors at
    sub-rect offsets, each with a genuine LZW stream. Each ``frames``
    entry: {idx: (h, w) uint8 raster, x, y, delay_cs, disposal,
    transparent: int | None}."""
    n = palette.shape[0]
    size_bits = max((n - 1).bit_length(), 1)
    n_slots = 1 << size_bits
    pal = np.zeros((n_slots, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", canvas_w, canvas_h)
    out.append(0x80 | (size_bits - 1))
    out.append(bg_index)
    out.append(0)  # aspect
    out += pal.tobytes()
    # NETSCAPE2.0 application extension: loop count
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for f in frames:
        idx = f["idx"]
        h, w = idx.shape
        trans = f.get("transparent")
        flags = (f.get("disposal", 0) & 0x07) << 2
        if trans is not None:
            flags |= 0x01
        out += b"\x21\xf9\x04" + bytes([flags]) + struct.pack(
            "<H", f.get("delay_cs", 4)
        ) + bytes([trans if trans is not None else 0]) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHH", f.get("x", 0), f.get("y", 0), w, h
        ) + b"\x00"  # no local table, not interlaced
        min_code = max(size_bits, 2)
        out.append(min_code)
        lzw = _lzw_encode(idx.tobytes(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def parse_gif_animation(payload: bytes) -> dict | None:
    """GIF bytes → {width, height, loop_count, bg_index, palette,
    frames: [{x, y, w, h, delay_cs, disposal, transparent, min_code,
    lzw, palette}]} WITHOUT decoding any LZW stream — the walk records
    each frame's concatenated sub-block bytes so the renderer can decode
    only what the frame budget asks for. Tolerant; never raises."""
    try:
        b = bytes(payload or b"")
        if len(b) < 13 or b[:3] != b"GIF" or b[3:6] not in (b"87a", b"89a"):
            return None
        sw = int.from_bytes(b[6:8], "little")
        sh = int.from_bytes(b[8:10], "little")
        packed = b[10]
        bg_index = b[11]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            if gct.shape[0] < n:
                return None
            pos += 3 * n
        loop_count = 0
        gce = {"delay_cs": 0, "disposal": 0, "transparent": None}
        frames: list[dict] = []
        while pos < len(b):
            block = b[pos]
            if block == 0x3B:
                break
            if block == 0x21:  # extension
                label = b[pos + 1] if pos + 1 < len(b) else 0
                pos += 2
                subs = []
                while pos < len(b) and b[pos] != 0:
                    ln = b[pos]
                    subs.append(b[pos + 1 : pos + 1 + ln])
                    pos += 1 + ln
                pos += 1
                if label == 0xF9 and subs and len(subs[0]) >= 4:
                    flags = subs[0][0]
                    gce = {
                        "delay_cs": int.from_bytes(subs[0][1:3], "little"),
                        "disposal": (flags >> 2) & 0x07,
                        "transparent": subs[0][3] if flags & 0x01 else None,
                    }
                elif (
                    label == 0xFF
                    and subs
                    and subs[0][:11] == b"NETSCAPE2.0"
                    and len(subs) > 1
                    and len(subs[1]) >= 3
                ):
                    loop_count = int.from_bytes(subs[1][1:3], "little")
                continue
            if block != 0x2C:
                return None
            x = int.from_bytes(b[pos + 1 : pos + 3], "little")
            y = int.from_bytes(b[pos + 3 : pos + 5], "little")
            w = int.from_bytes(b[pos + 5 : pos + 7], "little")
            h = int.from_bytes(b[pos + 7 : pos + 9], "little")
            ipacked = b[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    b[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if pal is None or w <= 0 or h <= 0:
                return None
            min_code = b[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                lzw += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            frames.append(
                {
                    "x": x, "y": y, "w": w, "h": h,
                    "delay_cs": gce["delay_cs"],
                    "disposal": gce["disposal"],
                    "transparent": gce["transparent"],
                    "interlace": bool(ipacked & 0x40),
                    "min_code": min_code,
                    "lzw": bytes(lzw),
                    "palette": pal,
                }
            )
            gce = {"delay_cs": 0, "disposal": 0, "transparent": None}
        if not frames:
            return None
        return {
            "width": sw, "height": sh, "loop_count": loop_count,
            "bg_index": bg_index, "palette": gct, "frames": frames,
        }
    except Exception:
        return None


def render_gif_frames(
    parsed: dict, targets: list[int]
) -> dict[int, np.ndarray] | None:
    """Composite the requested frame indexes → {idx: (H, W, 3) canvas}.
    Disposal semantics per GIF89a: 0/1 leave the canvas, 2 restores the
    frame's rect to the background color, 3 restores the canvas to its
    pre-frame state. Transparent pixels leave the canvas unchanged.
    Decodes frames 0..max(targets) (delta coding — a frame's canvas
    depends on every prior frame) and NOTHING past it: the budget lever
    for a delta-coded container. None on any undecodable frame."""
    if not targets:
        return {}
    last = max(targets)
    want = set(targets)
    W, H = parsed["width"], parsed["height"]
    gct = parsed["palette"]
    bg = (
        gct[parsed["bg_index"]]
        if gct is not None and parsed["bg_index"] < gct.shape[0]
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg, (H, W, 3)).astype(np.uint8).copy()
    out: dict[int, np.ndarray] = {}
    frames = parsed["frames"]
    if last >= len(frames):
        return None
    for i in range(last + 1):
        f = frames[i]
        idx_stream = _lzw_decode(f["lzw"], f["min_code"])
        if idx_stream is None or len(idx_stream) < f["w"] * f["h"]:
            return None
        idx = np.frombuffer(
            idx_stream[: f["w"] * f["h"]], dtype=np.uint8
        ).reshape(f["h"], f["w"])
        if f["interlace"]:
            h = f["h"]
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        pal = f["palette"]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            return None
        x0, y0 = f["x"], f["y"]
        x1, y1 = min(x0 + f["w"], W), min(y0 + f["h"], H)
        if x1 <= x0 or y1 <= y0:
            return None
        sub = idx[: y1 - y0, : x1 - x0]
        prev = canvas[y0:y1, x0:x1].copy() if f["disposal"] == 3 else None
        rgb = pal[sub]
        if f["transparent"] is not None:
            mask = sub != f["transparent"]
            region = canvas[y0:y1, x0:x1]
            region[mask] = rgb[mask]
        else:
            canvas[y0:y1, x0:x1] = rgb
        if i in want:
            out[i] = canvas.copy()
        if f["disposal"] == 2:
            canvas[y0:y1, x0:x1] = bg
        elif f["disposal"] == 3 and prev is not None:
            canvas[y0:y1, x0:x1] = prev
    return out


# ---------------------------------------------------------------------------
# BMP (Windows DIB) — the no-compression raster containers screenshots and
# legacy tooling emit. Public layout: BITMAPFILEHEADER (14 bytes) +
# BITMAPINFOHEADER (biSize ≥ 40), BGR(A) rows padded to 4 bytes, stored
# bottom-up unless the height is negative (top-down).


def parse_bmp_header(payload: bytes) -> dict | None:
    """Strictly-validated BMP header parse (ONE source of truth for the
    pixel decoder and the header-dims path): header size, BI_RGB only,
    bpp ∈ {8,24,32}, sane dims, and data_off pointing PAST the header
    (a corrupt offset would otherwise decode the header bytes as
    pixels). Returns {w, h, bpp, hsize, data_off, top_down} or None —
    arbitrary text starting 'BM' can never parse."""
    b = bytes(payload or b"")
    if b[:2] != b"BM" or len(b) < 54:
        return None
    data_off = int.from_bytes(b[10:14], "little")
    hsize = int.from_bytes(b[14:18], "little")
    if hsize not in (40, 52, 56, 108, 124):
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    top_down = h < 0
    h = abs(h)
    if comp != 0 or bpp not in (8, 24, 32):
        return None
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        return None
    if not (14 + hsize <= data_off <= len(b)):
        return None
    return {
        "w": w, "h": h, "bpp": bpp, "hsize": hsize,
        "data_off": data_off, "top_down": top_down,
    }


def decode_bmp_pixels(payload: bytes) -> np.ndarray | None:
    """Uncompressed BI_RGB BMP → (h, w, 3) uint8 RGB: 8-bit palette,
    24-bit BGR, 32-bit BGRA (alpha dropped). Header gates live in
    ``parse_bmp_header``; anything invalid → None, never raises."""
    try:
        b = bytes(payload or b"")
        hd = parse_bmp_header(b)
        if hd is None:
            return None
        w, h = hd["w"], hd["h"]
        bpp, hsize = hd["bpp"], hd["hsize"]
        data_off, top_down = hd["data_off"], hd["top_down"]
        rowlen = (w * bpp // 8 + 3) & ~3
        px = b[data_off : data_off + rowlen * h]
        if len(px) < rowlen * h:
            return None
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, rowlen)
        if bpp == 8:
            ncol = int.from_bytes(b[46:50], "little") or 256
            pal = np.frombuffer(
                b[14 + hsize : 14 + hsize + 4 * ncol], dtype=np.uint8
            ).reshape(-1, 4)
            if pal.shape[0] < ncol:
                return None
            idx = arr[:, :w]
            if int(idx.max(initial=0)) >= ncol:
                return None
            rgb = pal[idx][:, :, [2, 1, 0]]  # BGRX entries
        elif bpp == 24:
            rgb = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        else:
            rgb = arr[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
        if not top_down:
            rgb = rgb[::-1]  # bottom-up storage
        return np.ascontiguousarray(rgb)
    except Exception:
        return None


def encode_bmp_rgb(
    img: np.ndarray, bpp: int = 24, top_down: bool = False
) -> bytes:
    """(h, w, 3) uint8 → uncompressed BI_RGB BMP (24-bit BGR or 32-bit
    BGRA), padded rows, bottom-up by default — the fixture inverse."""
    if bpp not in (24, 32):
        raise ValueError("bpp must be 24 or 32")
    h, w, _ = img.shape
    rows = img if top_down else img[::-1]
    if bpp == 24:
        px = rows[:, :, ::-1]
    else:
        px = np.concatenate(
            [rows[:, :, ::-1], np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    rowlen = (w * bpp // 8 + 3) & ~3
    body = bytearray()
    for y in range(h):
        r = px[y].tobytes()
        body += r + b"\x00" * (rowlen - len(r))
    data_off = 14 + 40
    size = data_off + len(body)
    head = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, bpp, 0, len(body),
        2835, 2835, 0, 0,
    )
    return bytes(head + info + body)


def decode_image_pixels(payload: bytes) -> np.ndarray | None:
    """Format-dispatched full pixel decode → (h, w, 3) uint8 RGB. All five
    formats are REAL, stdlib + numpy: PNG (zlib inflate + scanline
    unfilter), GIF (LZW), baseline/progressive JPEG (Huffman + dequant +
    IDCT, extraction/jpeg.py), uncompressed BMP (BGR(A)/palette DIBs),
    and baseline strip TIFF (none/LZW/PackBits + predictor,
    extraction/tiff.py). Unrecognized or out-of-scope payloads →
    None."""
    b = bytes(payload or b"")
    if b.startswith(PNG_MAGIC):
        return decode_png_pixels(b)
    if b[:3] == b"GIF":
        return decode_gif_pixels(b)
    if b[:2] == b"\xff\xd8":
        from deepseek_ocr_api_rs_spark.extraction.jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(b)
    if b[:2] == b"BM":
        return decode_bmp_pixels(b)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        from deepseek_ocr_api_rs_spark.extraction.tiff import (
            decode_tiff_pixels,
        )

        return decode_tiff_pixels(b)
    return None


# ---------------------------------------------------------------------------
# ICO favicons (r7) — the crawl-side icon container (favicon.ico):
# ICONDIR + ICONDIRENTRY table, each image either a PNG stream (modern
# writers) or a headerless BMP DIB whose BITMAPINFOHEADER height is
# DOUBLED to cover the 1-bit AND transparency mask below the XOR pixels.
# Both payload forms reuse the existing real decoders.


def encode_ico(images: list[tuple[np.ndarray, str]]) -> bytes:
    """[(rgb (h,w,3) uint8, 'png'|'bmp')] → a real .ico file. BMP
    entries store 32-bit BGRA bottom-up with an all-opaque AND mask;
    PNG entries embed the encoder's stream verbatim."""
    count = len(images)
    header = struct.pack("<HHH", 0, 1, count)
    entries = bytearray()
    blobs = bytearray()
    offset = 6 + 16 * count
    for img, kind in images:
        h, w, _ = img.shape
        if kind == "png":
            data = encode_png_rgb(img)
            bitcount = 32
        elif kind == "bmp":
            rows = img[::-1]  # bottom-up
            bgra = np.concatenate(
                [rows[:, :, ::-1], np.full((h, w, 1), 255, np.uint8)],
                axis=2,
            ).tobytes()
            mask_rowlen = ((w + 31) // 32) * 4  # 1-bit rows, dword pad
            mask = b"\x00" * (mask_rowlen * h)  # all opaque
            info = struct.pack(
                "<IiiHHIIiiII",
                40, w, h * 2, 1, 32, 0, len(bgra) + len(mask),
                0, 0, 0, 0,
            )
            data = info + bgra + mask
            bitcount = 32
        else:
            raise ValueError(kind)
        entries += struct.pack(
            "<BBBBHHII",
            w % 256, h % 256, 0, 0, 1, bitcount, len(data), offset,
        )
        blobs += data
        offset += len(data)
    return bytes(header + entries + blobs)


def parse_ico(payload: bytes) -> list[dict] | None:
    """.ico bytes → one dict per icon image: {idx, width, height, fmt,
    pixels (h,w,3) | None}. PNG entries run the real PNG decoder; DIB
    entries decode 32/24-bit BGRA bottom-up with the doubled-height
    mask convention (the AND mask is parsed past, alpha dropped — the
    BMP contract). Entries the decoders cannot prove → pixels None,
    fmt kept (honest-scope metadata). Not an ICO → None."""
    try:
        b = bytes(payload or b"")
        if len(b) < 6:
            return None
        zero, typ, count = struct.unpack("<HHH", b[:6])
        if zero != 0 or typ != 1 or count == 0 or count > 256:
            return None
        if len(b) < 6 + 16 * count:
            return None
        out: list[dict] = []
        for i in range(count):
            e = b[6 + 16 * i : 6 + 16 * (i + 1)]
            ew, eh, _ncol, _res, _planes, _bc, size, off = struct.unpack(
                "<BBBBHHII", e
            )
            data = b[off : off + size]
            if len(data) < size:
                return None
            rec = {
                "idx": i,
                "width": ew or 256,
                "height": eh or 256,
                "fmt": "png" if data[:8] == PNG_MAGIC else "bmp",
                "pixels": None,
            }
            if rec["fmt"] == "png":
                px = decode_png_pixels(data)
                if px is not None:
                    rec["width"], rec["height"] = (
                        px.shape[1], px.shape[0],
                    )
                    rec["pixels"] = px
            else:
                px = _decode_ico_dib(data)
                if px is not None:
                    rec["width"], rec["height"] = (
                        px.shape[1], px.shape[0],
                    )
                    rec["pixels"] = px
            out.append(rec)
        return out
    except Exception:
        return None


def _decode_ico_dib(data: bytes) -> np.ndarray | None:
    """Headerless ICO DIB: BITMAPINFOHEADER with doubled height, 32- or
    24-bit XOR pixels bottom-up, then the AND mask (skipped)."""
    if len(data) < 40:
        return None
    hsize, w, h2, planes, bpp = struct.unpack("<IiiHH", data[:16])
    comp = struct.unpack("<I", data[16:20])[0]
    if hsize != 40 or comp != 0 or planes != 1 or bpp not in (24, 32):
        return None
    if h2 <= 0 or h2 % 2 or w <= 0:
        return None
    h = h2 // 2
    rowlen = (w * bpp // 8 + 3) & ~3
    px = data[40 : 40 + rowlen * h]
    if len(px) < rowlen * h:
        return None
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, rowlen)
    if bpp == 24:
        rgb = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    else:
        rgb = arr[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
    return np.ascontiguousarray(rgb[::-1])
