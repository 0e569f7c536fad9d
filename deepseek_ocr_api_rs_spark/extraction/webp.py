"""WebP container metadata — writer + tolerant parser (no pixel decode).

WebP is the modern crawl's second image format; its container is RIFF
(the chunk walk ``operators.audio``/``operators.video`` already do for
WAV/AVI) and every variant's DIMENSIONS live in plain header fields per
the public spec (RFC 9649 / Google WebP container + RFC 6386 VP8):

- simple lossy  — one ``VP8 `` chunk: 3-byte frame tag, the
  ``9D 01 2A`` keyframe start code, then 14-bit width/height;
- simple lossless — one ``VP8L`` chunk: ``2F`` signature then a 32-bit
  LE field packing 14-bit (w-1), 14-bit (h-1), 1 alpha bit, 3 version;
- extended — ``VP8X`` (flag byte + 24-bit canvas w-1/h-1), optionally
  ``ANIM`` (bg color + loop count) and one ``ANMF`` per frame.

Metadata-only by design, same contract as the MP4 branch: VP8 entropy
decode is a full video codec and no pixel decode is claimed here (the
pixel contract is carried by PNG/GIF/JPEG/BMP/TIFF and the MJPEG/MP4
frame paths). Parsers are tolerant — malformed bytes → None, never
raises.
"""

from __future__ import annotations

import struct

_VP8X_ICC = 0x20
_VP8X_ALPHA = 0x10
_VP8X_EXIF = 0x08
_VP8X_XMP = 0x04
_VP8X_ANIM = 0x02


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff(body: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def _vp8_body(width: int, height: int) -> bytes:
    """Minimal parseable VP8 keyframe header (RFC 6386 §9.1): frame tag
    (keyframe, version 0, show_frame, a nominal first-partition size),
    start code, 14-bit dims — plus a few deterministic filler bytes
    standing in for the entropy-coded partitions."""
    part_size = 16
    tag = 0 | (0 << 1) | (1 << 4) | (part_size << 5)  # key, ver0, show
    return (
        struct.pack("<I", tag)[:3]
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        + bytes((i * 37 + width + height) % 256 for i in range(part_size))
    )


def make_webp_lossy(width: int, height: int) -> bytes:
    return _riff(_chunk(b"VP8 ", _vp8_body(width, height)))


def make_webp_lossless(width: int, height: int, alpha: bool = False) -> bytes:
    field = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)  # +3 version bits 0
    return _riff(_chunk(b"VP8L", b"\x2f" + struct.pack("<I", field) + b"\x00" * 6))


def make_webp_extended(
    width: int,
    height: int,
    alpha: bool = False,
    n_frames: int = 0,
    loop_count: int = 0,
) -> bytes:
    """VP8X container: still (one VP8 chunk) when n_frames == 0, else
    ANIM + one ANMF per frame, each frame carrying a VP8 subchunk."""
    flags = (_VP8X_ALPHA if alpha else 0) | (_VP8X_ANIM if n_frames else 0)
    vp8x = _chunk(
        b"VP8X",
        bytes([flags]) + b"\x00\x00\x00"
        + struct.pack("<I", width - 1)[:3]
        + struct.pack("<I", height - 1)[:3],
    )
    if not n_frames:
        return _riff(vp8x + _chunk(b"VP8 ", _vp8_body(width, height)))
    anim = _chunk(b"ANIM", struct.pack("<IH", 0xFF000000, loop_count))
    frames = b""
    for i in range(n_frames):
        dur = 40 + 10 * (i % 3)
        head = (
            struct.pack("<I", 0)[:3]          # frame x / 2
            + struct.pack("<I", 0)[:3]        # frame y / 2
            + struct.pack("<I", width - 1)[:3]
            + struct.pack("<I", height - 1)[:3]
            + struct.pack("<I", dur)[:3]
            + b"\x00"                          # blend=source-over, dispose=none
        )
        frames += _chunk(b"ANMF", head + _chunk(b"VP8 ", _vp8_body(width, height)))
    return _riff(vp8x + anim + frames)


def parse_webp_meta(payload: bytes) -> dict | None:
    """WebP bytes → {fmt, width, height, alpha, animated, n_frames,
    loop_count} via a tolerant RIFF chunk walk. fmt is the FIRST
    bitstream form encountered ('vp8', 'vp8l', 'vp8x'). None for
    anything that is not a parseable WebP; never raises."""
    try:
        b = bytes(payload or b"")
        if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
            return None
        end = min(8 + struct.unpack("<I", b[4:8])[0], len(b))
        meta = {
            "fmt": "", "width": 0, "height": 0, "alpha": False,
            "animated": False, "n_frames": 0, "loop_count": 0,
        }
        pos = 12
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            lo = pos + 8
            hi = lo + size
            if hi > end:
                return None
            if fourcc == b"VP8 " and size >= 10:
                if b[lo + 3 : lo + 6] == b"\x9d\x01\x2a" and not (b[lo] & 1):
                    if not meta["fmt"]:
                        meta["fmt"] = "vp8"
                        w, h = struct.unpack("<HH", b[lo + 6 : lo + 10])
                        meta["width"], meta["height"] = w & 0x3FFF, h & 0x3FFF
                    meta["n_frames"] = meta["n_frames"] or 1
            elif fourcc == b"VP8L" and size >= 5 and b[lo] == 0x2F:
                field = struct.unpack("<I", b[lo + 1 : lo + 5])[0]
                if not meta["fmt"]:
                    meta["fmt"] = "vp8l"
                    meta["width"] = (field & 0x3FFF) + 1
                    meta["height"] = ((field >> 14) & 0x3FFF) + 1
                    meta["alpha"] = bool((field >> 28) & 1)
                meta["n_frames"] = meta["n_frames"] or 1
            elif fourcc == b"VP8X" and size >= 10:
                flags = b[lo]
                meta["fmt"] = meta["fmt"] or "vp8x"
                meta["alpha"] = bool(flags & _VP8X_ALPHA) or meta["alpha"]
                meta["animated"] = bool(flags & _VP8X_ANIM)
                meta["width"] = (
                    int.from_bytes(b[lo + 4 : lo + 7], "little") + 1
                )
                meta["height"] = (
                    int.from_bytes(b[lo + 7 : lo + 10], "little") + 1
                )
            elif fourcc == b"ANIM" and size >= 6:
                meta["loop_count"] = struct.unpack(
                    "<H", b[lo + 4 : lo + 6]
                )[0]
            elif fourcc == b"ANMF":
                meta["n_frames"] += 1
            pos = hi + (size % 2)
        if not meta["fmt"] or not meta["width"] or not meta["height"]:
            return None
        return meta
    except Exception:
        return None
