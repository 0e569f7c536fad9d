"""Baseline TIFF decode, stdlib + numpy — the scanner/fax/archival raster
family (TIFF 6.0, public Adobe spec).

Scope: both byte orders (II/MM), single-image (first IFD), strip-based
AND tiled (tags 322-325) storage, compression 1 (none), 5 (LZW — the
SAME MSB-first variable-width coder as PDF's LZWDecode, reused from
extraction/pdf_real) and 32773 (PackBits — PDF's RunLengthDecode except
0x80, which PackBits defines as a no-op rather than end-of-data, so the
decoder is local; the PDF RunLength ENCODER minus its EOD byte is still
a valid PackBits stream and serves as the fixture writer),
horizontal-differencing predictor (tag 317 = 2, on 8- and 16-bit
samples), photometric 0/1 (grayscale, incl. WhiteIsZero inversion),
2 (RGB, 3 or 4 samples/pixel — extra alpha dropped) and 3 (palette via
ColorMap's 16-bit-per-channel entries, 8-bit indices), 8 or 16 bits per
sample (16-bit renders the high byte, the same convention as the 16-bit
PNG path in extraction/raster). Planar configuration 1 (chunky) only.
CCITT/JPEG-in-TIFF → None (documented scope; the reference's image
crate accepts these baseline forms, crates/cli/src/app.rs:116-122).
``encode_tiff_rgb`` / ``encode_tiff_rgb16`` are the fixture inverses
(strip or tiled, optional LZW/PackBits + predictor), so every supported
combination round-trips byte-exact in tests. Never raises."""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFFS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _COLORMAP = 284, 317, 320
_TILE_W, _TILE_L, _TILE_OFFS, _TILE_COUNTS = 322, 323, 324, 325

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
    left (per channel) — cumulative sum per channel lane, mod the sample
    range (256 for uint8 rows, 65536 for uint16)."""
    mod = 65536 if rows.dtype == np.uint16 else 256
    h, rowlen = rows.shape
    out = rows.reshape(h, rowlen // spp, spp).astype(np.int64)
    out = np.cumsum(out, axis=1) % mod
    return out.reshape(h, rowlen).astype(rows.dtype)


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


def _decompress(chunk: bytes, comp: int) -> bytes | None:
    if comp == 5:
        from deepseek_ocr_api_rs_spark.extraction.pdf_real import lzw_decode

        return lzw_decode(chunk, 1)
    if comp == 32773:
        return _packbits_decode(chunk)
    return chunk


def _samples(dec: bytes, need: int, shape: tuple[int, int], bits: int, e: str
             ) -> np.ndarray | None:
    """Decompressed chunk bytes → (rows, rowlen-in-samples) array of the
    sample dtype (uint8, or uint16 in the FILE byte order), or None if
    the chunk is short."""
    if len(dec) < need:
        return None
    dt = np.uint8 if bits == 8 else np.dtype(e + "u2")
    return np.frombuffer(dec[:need], dtype=dt).reshape(shape).astype(
        np.uint8 if bits == 8 else np.uint16
    )


def _render8(img: np.ndarray, bits: int) -> np.ndarray:
    """16-bit samples render to 8-bit via the high byte (the 16-bit PNG
    convention in extraction/raster)."""
    return (img >> 8).astype(np.uint8) if bits == 16 else img


def decode_tiff_pixels(payload: bytes) -> np.ndarray | None:
    """Strip or tiled baseline TIFF → (h, w, 3) uint8 RGB, or None out
    of scope."""
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
        bits_l = tags.get(_BITS, [8])
        predictor = tags.get(_PREDICTOR, [1])[0]
        planar = tags.get(_PLANAR, [1])[0]
        tiled = _TILE_OFFS in tags
        bits = bits_l[0]
        if (
            w <= 0
            or h <= 0
            or any(x != bits for x in bits_l)
            or bits not in (8, 16)
            or comp not in (1, 5, 32773)
            or photo not in (0, 1, 2, 3)
            or predictor not in (1, 2)
            or spp not in (1, 3, 4)
            or planar != 1
        ):
            return None
        if photo in (0, 1, 3) and spp != 1:
            return None
        if photo == 2 and spp not in (3, 4):
            return None
        if photo == 3 and bits != 8:
            return None
        sdtype = np.uint8 if bits == 8 else np.uint16
        ssize = bits // 8

        if tiled:
            tw = tags.get(_TILE_W, [0])[0]
            tl = tags.get(_TILE_L, [0])[0]
            offs = tags.get(_TILE_OFFS)
            counts = tags.get(_TILE_COUNTS)
            if tw <= 0 or tl <= 0 or offs is None or counts is None:
                return None
            across = (w + tw - 1) // tw
            down = (h + tl - 1) // tl
            if len(offs) != across * down or len(counts) != len(offs):
                return None
            img = np.zeros((h, w, spp), dtype=sdtype)
            tile_rowlen = tw * spp
            need = tl * tile_rowlen * ssize  # edge tiles are padded FULL
            for ti, (o, c) in enumerate(zip(offs, counts)):
                chunk = b[o : o + c]
                if len(chunk) < c:
                    return None
                dec = _decompress(chunk, comp)
                if dec is None:
                    return None
                rows = _samples(dec, need, (tl, tile_rowlen), bits, e)
                if rows is None:
                    return None
                if predictor == 2:
                    rows = _undo_horizontal_predictor(rows, spp)
                ty, tx = (ti // across) * tl, (ti % across) * tw
                eh, ew = min(tl, h - ty), min(tw, w - tx)
                tile = rows.reshape(tl, tw, spp)
                img[ty : ty + eh, tx : tx + ew] = tile[:eh, :ew]
        else:
            offs = tags.get(_STRIP_OFFS)
            counts = tags.get(_STRIP_COUNTS)
            rps = tags.get(_ROWS_PER_STRIP, [h])[0] or h
            if offs is None or counts is None or len(offs) != len(counts):
                return None
            rowlen = w * spp
            parts: list[np.ndarray] = []
            for si, (o, c) in enumerate(zip(offs, counts)):
                strip = b[o : o + c]
                if len(strip) < c:
                    return None
                dec = _decompress(strip, comp)
                if dec is None:
                    return None
                n_rows = min(rps, h - si * rps)
                rows = _samples(
                    dec, n_rows * rowlen * ssize, (n_rows, rowlen), bits, e
                )
                if rows is None:
                    return None
                if predictor == 2:
                    rows = _undo_horizontal_predictor(rows, spp)
                parts.append(rows)
            img = np.concatenate(parts, axis=0).reshape(h, w, spp)

        if photo == 2:
            return _render8(np.ascontiguousarray(img[:, :, :3]), bits)
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
            full = 255 if bits == 8 else 65535
            g = (full - g.astype(np.int64)).astype(sdtype)
        return np.repeat(_render8(g, bits)[:, :, None], 3, axis=2)
    except Exception:
        return None


def _compress_chunk(raw: bytes, compression: int) -> bytes:
    if compression == 5:
        from deepseek_ocr_api_rs_spark.extraction.pdf_real import lzw_encode

        return lzw_encode(raw)
    if compression == 32773:
        from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
            runlength_encode,
        )

        return runlength_encode(raw)[:-1]  # PDF adds EOD 0x80
    return raw


def _apply_predictor(rows: np.ndarray, w: int, spp: int) -> np.ndarray:
    """Forward horizontal differencing (encoder side), 8- or 16-bit."""
    mod = 65536 if rows.dtype == np.uint16 else 256
    wide = rows.reshape(rows.shape[0], w, spp).astype(np.int64)
    diff = wide.copy()
    diff[:, 1:] = (wide[:, 1:] - wide[:, :-1]) % mod
    return diff.reshape(rows.shape[0], w * spp).astype(rows.dtype)


def _encode_tiff(
    img: np.ndarray,
    bits: int,
    compression: int,
    rows_per_strip: int | None,
    predictor: int,
    big_endian: bool,
    tile: tuple[int, int] | None,
) -> bytes:
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5 or 32773")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    h, w, spp = img.shape
    if spp != 3:
        raise ValueError("expected (h, w, 3)")
    e = ">" if big_endian else "<"
    sdt = np.uint8 if bits == 8 else np.dtype(e + "u2")

    chunks: list[bytes] = []
    if tile is not None:
        tw, tl = tile
        if tw <= 0 or tl <= 0:
            raise ValueError("tile dims must be positive")
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        for ti in range(across * down):
            ty, tx = (ti // across) * tl, (ti % across) * tw
            full = np.zeros((tl, tw, spp), dtype=img.dtype)
            eh, ew = min(tl, h - ty), min(tw, w - tx)
            full[:eh, :ew] = img[ty : ty + eh, tx : tx + ew]
            rows = full.reshape(tl, tw * spp)
            if predictor == 2:
                rows = _apply_predictor(rows, tw, spp)
            chunks.append(_compress_chunk(rows.astype(sdt).tobytes(), compression))
        rps = 0
    else:
        rps = rows_per_strip or h
        for y0 in range(0, h, rps):
            rows = img[y0 : y0 + rps].reshape(-1, w * spp)
            if predictor == 2:
                rows = _apply_predictor(rows, w, spp)
            chunks.append(_compress_chunk(rows.astype(sdt).tobytes(), compression))

    n_tags = 10 if tile is None else 11
    header_ifd = 8
    ifd_size = 2 + 12 * n_tags + 4
    data_start = header_ifd + ifd_size
    extra = bytearray()

    def alloc(data: bytes) -> int:
        off = data_start + len(extra)
        extra.extend(data)
        return off

    bits_off = alloc(struct.pack(e + "HHH", bits, bits, bits))
    chunk_offsets = [alloc(s) for s in chunks]
    if len(chunks) > 1:
        offs_val = alloc(struct.pack(e + "I" * len(chunks), *chunk_offsets))
        cnts_val = alloc(
            struct.pack(e + "I" * len(chunks), *(len(s) for s in chunks))
        )
    else:
        offs_val = chunk_offsets[0]
        cnts_val = len(chunks[0])
    entries = [
        (_W, 4, 1, w),
        (_H, 4, 1, h),
        (_BITS, 3, 3, bits_off),
        (_COMP, 3, 1, compression),
        (_PHOTO, 3, 1, 2),
        (_SPP, 3, 1, 3),
        (_PREDICTOR, 3, 1, predictor),
    ]
    if tile is not None:
        entries += [
            (_TILE_W, 4, 1, tile[0]),
            (_TILE_L, 4, 1, tile[1]),
            (_TILE_OFFS, 4, len(chunks), offs_val),
            (_TILE_COUNTS, 4, len(chunks), cnts_val),
        ]
    else:
        entries += [
            (_STRIP_OFFS, 4, len(chunks), offs_val),
            (_ROWS_PER_STRIP, 4, 1, rps),
            (_STRIP_COUNTS, 4, len(chunks), cnts_val),
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


def encode_tiff_rgb(
    img: np.ndarray,
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    big_endian: bool = False,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """(h, w, 3) uint8 → baseline TIFF (II by default), strip-based or —
    with ``tile=(tw, tl)`` — tiled (tags 322-325, edge tiles padded
    full per TIFF 6.0 §15), compression 1/5/32773, optional horizontal
    predictor. The decoder's fixture inverse, reusing the PDF filter
    encoders."""
    if img.dtype != np.uint8:
        raise ValueError("expected uint8 samples")
    return _encode_tiff(
        img, 8, compression, rows_per_strip, predictor, big_endian, tile
    )


def encode_tiff_rgb16(
    img16: np.ndarray,
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    big_endian: bool = False,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """(h, w, 3) uint16 → 16-bit-per-sample TIFF (samples stored in the
    file byte order). The decoder renders the high byte, so the
    round-trip target is ``img16 >> 8``."""
    if img16.dtype != np.uint16:
        raise ValueError("expected uint16 samples")
    return _encode_tiff(
        img16, 16, compression, rows_per_strip, predictor, big_endian, tile
    )
