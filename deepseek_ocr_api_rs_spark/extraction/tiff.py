"""Baseline TIFF decode, stdlib + numpy — the scanner/fax/archival raster
family (TIFF 6.0, public Adobe spec).

Scope: both byte orders (II/MM), single-image (first IFD), strip-based
storage, compression 1 (none), 5 (LZW — the SAME MSB-first variable-width
coder as PDF's LZWDecode, reused from extraction/pdf_real) and 32773
(PackBits — PDF's RunLengthDecode except 0x80, which PackBits defines as
a no-op rather than end-of-data, so the decoder is local; the PDF
RunLength ENCODER minus its EOD byte is still a valid PackBits stream
and serves as the fixture writer),
horizontal-differencing predictor (tag 317 = 2), photometric 0/1
(grayscale, incl. WhiteIsZero inversion), 2 (RGB, 3 or 4
samples/pixel — extra alpha dropped) and 3 (palette via ColorMap's
16-bit-per-channel entries), 8 bits per sample. Tiled TIFFs, 16-bit
samples, CCITT/JPEG-in-TIFF → None (documented scope; the reference's
image crate accepts the strip-based baseline forms,
crates/cli/src/app.rs:116-122). ``encode_tiff_rgb`` is the fixture
inverse (II order, one or many strips, optional LZW/PackBits +
predictor), so every supported combination round-trips byte-exact in
tests. Never raises."""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFFS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PREDICTOR, _COLORMAP = 317, 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(b: bytes, off: int, e: str) -> dict[int, list[int]] | None:
    """First IFD → {tag: [values]} (SHORT/LONG/BYTE values only)."""
    if off + 2 > len(b):
        return None
    (n,) = struct.unpack_from(e + "H", b, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        p = off + 2 + 12 * i
        if p + 12 > len(b):
            return None
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, p)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * cnt
        if total <= 4:
            vp = p + 8
        else:
            (vp,) = struct.unpack_from(e + "I", b, p + 8)
        if vp + total > len(b):
            return None
        if typ in (1, 6, 7):
            vals = list(b[vp : vp + cnt])
        elif typ in (3, 8):
            vals = list(struct.unpack_from(e + "H" * cnt, b, vp))
        elif typ in (4, 9):
            vals = list(struct.unpack_from(e + "I" * cnt, b, vp))
        else:
            continue  # rationals/ascii: not needed for pixel decode
        tags[tag] = vals
    return tags


def _undo_horizontal_predictor(rows: np.ndarray, spp: int) -> np.ndarray:
    """Predictor 2: each sample stored as delta from the sample one pixel
    left (per channel) — cumulative sum mod 256 per channel lane."""
    h, rowlen = rows.shape
    out = rows.reshape(h, rowlen // spp, spp).astype(np.int64)
    out = np.cumsum(out, axis=1) % 256
    return out.reshape(h, rowlen).astype(np.uint8)


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (TIFF 6.0 §9). Same algorithm as PDF's
    RunLengthDecode EXCEPT the 0x80 control byte: PackBits defines it as
    a NO-OP (some writers emit it as padding), while the PDF filter
    treats it as end-of-data — so reusing the PDF decoder dropped
    spec-valid strips short (code-review r5 pass 2)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i < n:
                out += data[i : i + 1] * (257 - c)
                i += 1
        # c == 128: no-op
    return bytes(out)


def decode_tiff_pixels(payload: bytes) -> np.ndarray | None:
    """Baseline strip TIFF → (h, w, 3) uint8 RGB, or None out of scope."""
    try:
        b = bytes(payload or b"")
        if len(b) < 8:
            return None
        if b[:4] == b"II*\x00":
            e = "<"
        elif b[:4] == b"MM\x00*":
            e = ">"
        else:
            return None
        (ifd_off,) = struct.unpack_from(e + "I", b, 4)
        tags = _read_ifd(b, ifd_off, e)
        if not tags:
            return None
        w = tags.get(_W, [0])[0]
        h = tags.get(_H, [0])[0]
        comp = tags.get(_COMP, [1])[0]
        photo = tags.get(_PHOTO, [1])[0]
        spp = tags.get(_SPP, [1])[0]
        bits = tags.get(_BITS, [8])
        offs = tags.get(_STRIP_OFFS)
        counts = tags.get(_STRIP_COUNTS)
        rps = tags.get(_ROWS_PER_STRIP, [h])[0] or h
        predictor = tags.get(_PREDICTOR, [1])[0]
        if (
            w <= 0
            or h <= 0
            or offs is None
            or counts is None
            or len(offs) != len(counts)
            or any(x != 8 for x in bits)
            or comp not in (1, 5, 32773)
            or photo not in (0, 1, 2, 3)
            or predictor not in (1, 2)
            or spp not in (1, 3, 4)
        ):
            return None
        if photo in (0, 1, 3) and spp != 1:
            return None
        if photo == 2 and spp not in (3, 4):
            return None
        rowlen = w * spp
        raw = bytearray()
        for si, (o, c) in enumerate(zip(offs, counts)):
            strip = b[o : o + c]
            if len(strip) < c:
                return None
            if comp == 5:
                from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
                    lzw_decode,
                )

                dec = lzw_decode(strip, 1)
            elif comp == 32773:
                dec = _packbits_decode(strip)
            else:
                dec = strip
            if dec is None:
                return None
            n_rows = min(rps, h - si * rps)
            need = n_rows * rowlen
            if len(dec) < need:
                return None
            rows = np.frombuffer(dec[:need], dtype=np.uint8).reshape(
                n_rows, rowlen
            )
            if predictor == 2:
                rows = _undo_horizontal_predictor(rows, spp)
            raw += rows.tobytes()
        img = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
        if photo == 2:
            return np.ascontiguousarray(img[:, :, :3])
        if photo == 3:
            cmap = tags.get(_COLORMAP)
            if cmap is None or len(cmap) < 3 * 256:
                return None
            # ColorMap: 16-bit channels, R[256] G[256] B[256]
            lut = (
                np.array(cmap[: 3 * 256], dtype=np.uint32)
                .reshape(3, 256)
                .T
                >> 8
            ).astype(np.uint8)
            return lut[img[:, :, 0]]
        g = img[:, :, 0]
        if photo == 0:  # WhiteIsZero
            g = (255 - g.astype(np.int32)).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    except Exception:
        return None


def encode_tiff_rgb(
    img: np.ndarray,
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    big_endian: bool = False,
) -> bytes:
    """(h, w, 3) uint8 → baseline strip TIFF (II by default), compression
    1/5/32773, optional horizontal predictor — the decoder's fixture
    inverse, reusing the PDF filter encoders."""
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5 or 32773")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    h, w, spp = img.shape
    if spp != 3:
        raise ValueError("expected (h, w, 3)")
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        rows = img[y0 : y0 + rps].reshape(-1, w * spp)
        if predictor == 2:
            wide = rows.reshape(rows.shape[0], w, spp).astype(np.int16)
            diff = wide.copy()
            diff[:, 1:] = (wide[:, 1:] - wide[:, :-1]) % 256
            rows = diff.reshape(rows.shape[0], w * spp).astype(np.uint8)
        raw = rows.tobytes()
        if compression == 5:
            from deepseek_ocr_api_rs_spark.extraction.pdf_real import lzw_encode

            strips.append(lzw_encode(raw))
        elif compression == 32773:
            from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
                runlength_encode,
            )

            strips.append(runlength_encode(raw)[:-1])  # PDF adds EOD 0x80
        else:
            strips.append(raw)

    entries: list[tuple[int, int, int, int]] = []  # (tag, type, count, value)
    extra = bytearray()
    header_ifd = 8
    n_tags = 10
    ifd_size = 2 + 12 * n_tags + 4
    data_start = header_ifd + ifd_size

    def alloc(data: bytes) -> int:
        off = data_start + len(extra)
        extra.extend(data)
        return off

    bits_off = alloc(struct.pack(e + "HHH", 8, 8, 8))
    strip_offsets: list[int] = []
    for s in strips:
        strip_offsets.append(alloc(s))
    if len(strips) > 1:
        offs_val = alloc(struct.pack(e + "I" * len(strips), *strip_offsets))
        cnts_val = alloc(
            struct.pack(e + "I" * len(strips), *(len(s) for s in strips))
        )
    else:
        offs_val = strip_offsets[0]
        cnts_val = len(strips[0])
    entries = [
        (_W, 4, 1, w),
        (_H, 4, 1, h),
        (_BITS, 3, 3, bits_off),
        (_COMP, 3, 1, compression),
        (_PHOTO, 3, 1, 2),
        (_STRIP_OFFS, 4, len(strips), offs_val),
        (_SPP, 3, 1, 3),
        (_ROWS_PER_STRIP, 4, 1, rps),
        (_STRIP_COUNTS, 4, len(strips), cnts_val),
        (_PREDICTOR, 3, 1, predictor),
    ]
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(e + "I", header_ifd)
    out += struct.pack(e + "H", n_tags)
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack(e + "HH", val, 0)
        else:
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)  # no next IFD
    out += extra
    return bytes(out)
