"""EXIF APP1 metadata for JPEG payloads: writer, parser, GPS scrub.

Crawled images carry EXIF (Exif 2.3 / CIPA DC-008, a TIFF 6.0 IFD tree
inside a JPEG APP1 segment): camera make/model, orientation, capture
time — and, critically for training corpora, GPS coordinates. A
multimodal pipeline needs the metadata surfaced (orientation drives
rendering; capture time is a dating signal) and the GPS REMOVED — the
image-side analogue of the text pipeline's PII redaction
(functions/text.redact_pii). The reference ingests user images
wholesale (crates/server/src/generation.rs:276) and never inspects
EXIF; this is corpus-side hygiene on the same payloads.

Exactness discipline: GPS rationals are written with fixed denominators
(degrees/1, minutes/1, milliseconds-of-arc/1000) and the parser returns
the raw integer numerators — no floating point anywhere, so the
cross-engine oracle reproduces every field with integer arithmetic.

All functions are pure bytes→bytes/dict and run inside Arrow batch
stages; nothing here touches Spark.
"""

from __future__ import annotations

import struct

_SOI = b"\xff\xd8"
_EXIF_HDR = b"Exif\x00\x00"

# IFD0
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
# Exif sub-IFD
_TAG_DT_ORIGINAL = 0x9003
# GPS IFD
_TAG_GPS_LAT_REF = 0x0001
_TAG_GPS_LAT = 0x0002
_TAG_GPS_LON_REF = 0x0003
_TAG_GPS_LON = 0x0004

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _build_ifd(
    entries: list[tuple[int, int, object]], base: int
) -> tuple[bytes, bytes]:
    """One IFD at offset ``base`` (within the TIFF region) → (ifd bytes,
    heap bytes appended right after the IFD). entries = (tag, type,
    value): type 2 ASCII (str, NUL appended), 3 SHORT (int), 4 LONG
    (int), 5 RATIONAL (list of (num, den))."""
    entries = sorted(entries)
    heap = bytearray()
    heap_base = base + 2 + 12 * len(entries) + 4
    out = bytearray(struct.pack("<H", len(entries)))
    for tag, typ, val in entries:
        if typ == 2:
            data = str(val).encode("ascii") + b"\x00"
            cnt = len(data)
        elif typ == 3:
            data = struct.pack("<H", int(val))
            cnt = 1
        elif typ == 4:
            data = struct.pack("<I", int(val))
            cnt = 1
        else:  # RATIONAL
            pairs = list(val)
            data = b"".join(struct.pack("<II", n, d) for n, d in pairs)
            cnt = len(pairs)
        out += struct.pack("<HHI", tag, typ, cnt)
        if len(data) <= 4:
            out += data.ljust(4, b"\x00")
        else:
            out += struct.pack("<I", heap_base + len(heap))
            heap += data
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out), bytes(heap)


def build_exif_app1(fields: dict) -> bytes:
    """fields → a complete APP1 segment (marker + length + Exif TIFF).

    Keys: make, model, orientation, datetime, datetime_original, and
    optionally gps = {lat_ref, lat (deg, min, sec_milli), lon_ref,
    lon}. Little-endian TIFF, IFD0 → Exif sub-IFD (+ GPS IFD).

    Absent-sentinel fields are OMITTED, not written as zero/empty tags
    (ADVICE r7): '' for the ASCII tags and 0 for orientation are
    exactly what parse_exif returns for a MISSING tag, so the
    strip_gps rebuild (build(parse(x)) minus gps) never adds tags the
    source image lacked — orientation=0 is outside the spec's 1–8
    range and a present-but-empty DateTime is a metadata mutation
    beyond the GPS removal. An Exif sub-IFD with nothing to hold is
    likewise omitted entirely (no dangling pointer tag)."""
    gps = fields.get("gps")
    ifd0_entries = []
    if fields.get("make"):
        ifd0_entries.append((_TAG_MAKE, 2, fields["make"]))
    if fields.get("model"):
        ifd0_entries.append((_TAG_MODEL, 2, fields["model"]))
    if int(fields.get("orientation") or 0):
        ifd0_entries.append((_TAG_ORIENTATION, 3, fields["orientation"]))
    if fields.get("datetime"):
        ifd0_entries.append((_TAG_DATETIME, 2, fields["datetime"]))
    has_exif_ifd = bool(fields.get("datetime_original"))
    if has_exif_ifd:
        ifd0_entries.append((_TAG_EXIF_IFD, 4, 0))  # patched below
    if gps is not None:
        ifd0_entries.append((_TAG_GPS_IFD, 4, 0))
    # sizes are layout-independent of pointer VALUES, so compute the
    # block offsets with dummy pointers first, then rebuild
    ifd0, heap0 = _build_ifd(ifd0_entries, 8)
    exif_base = 8 + len(ifd0) + len(heap0)
    exif_ifd, exif_heap = b"", b""
    if has_exif_ifd:
        exif_entries = [(_TAG_DT_ORIGINAL, 2, fields["datetime_original"])]
        exif_ifd, exif_heap = _build_ifd(exif_entries, exif_base)
    gps_base = exif_base + len(exif_ifd) + len(exif_heap)
    gps_blob = b""
    if gps is not None:
        d, m, s = gps["lat"]
        ld, lm, ls = gps["lon"]
        gps_entries = [
            (_TAG_GPS_LAT_REF, 2, gps["lat_ref"]),
            (_TAG_GPS_LAT, 5, [(d, 1), (m, 1), (s, 1000)]),
            (_TAG_GPS_LON_REF, 2, gps["lon_ref"]),
            (_TAG_GPS_LON, 5, [(ld, 1), (lm, 1), (ls, 1000)]),
        ]
        gps_ifd, gps_heap = _build_ifd(gps_entries, gps_base)
        gps_blob = gps_ifd + gps_heap
    # rebuild IFD0 with real pointers (same layout, same sizes)
    ifd0_entries = [
        (t, ty, exif_base if t == _TAG_EXIF_IFD else v)
        for t, ty, v in ifd0_entries
    ]
    if gps is not None:
        ifd0_entries = [
            (t, ty, gps_base if t == _TAG_GPS_IFD else v)
            for t, ty, v in ifd0_entries
        ]
    ifd0, heap0 = _build_ifd(ifd0_entries, 8)
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + ifd0 + heap0 + exif_ifd + exif_heap + gps_blob
    )
    payload = _EXIF_HDR + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_exif(jpeg: bytes, fields: dict) -> bytes:
    """Splice an APP1 Exif segment right after SOI. The entropy stream
    and every other segment are byte-untouched."""
    if jpeg[:2] != _SOI:
        raise ValueError("not a JPEG (no SOI)")
    return _SOI + build_exif_app1(fields) + jpeg[2:]


def _segments(jpeg: bytes):
    """Yield (marker, start, end) for each segment up to SOS; the
    entropy-coded tail is not walked."""
    i = 2
    n = len(jpeg)
    while i + 4 <= n:
        if jpeg[i] != 0xFF:
            return
        marker = jpeg[i + 1]
        if marker == 0xDA:  # SOS — stop before entropy data
            return
        (seg_len,) = struct.unpack_from(">H", jpeg, i + 2)
        end = i + 2 + seg_len
        if end > n:
            return
        yield marker, i, end
        i = end


def _read_full_ifd(b: bytes, off: int, e: str) -> dict[int, object] | None:
    """Typed IFD read: ASCII → str, SHORT/LONG → int or list,
    RATIONAL → list of (num, den)."""
    if off + 2 > len(b):
        return None
    (n,) = struct.unpack_from(e + "H", b, off)
    tags: dict[int, object] = {}
    for i in range(n):
        p = off + 2 + 12 * i
        if p + 12 > len(b):
            return None
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, p)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * cnt
        vp = p + 8
        if total > 4:
            (vp,) = struct.unpack_from(e + "I", b, p + 8)
        if vp + total > len(b):
            return None
        if typ == 2:
            tags[tag] = b[vp : vp + cnt].split(b"\x00")[0].decode(
                "ascii", "replace"
            )
        elif typ == 3:
            vals = list(struct.unpack_from(e + "H" * cnt, b, vp))
            tags[tag] = vals[0] if cnt == 1 else vals
        elif typ == 4:
            vals = list(struct.unpack_from(e + "I" * cnt, b, vp))
            tags[tag] = vals[0] if cnt == 1 else vals
        elif typ == 5:
            tags[tag] = [
                struct.unpack_from(e + "II", b, vp + 8 * k)
                for k in range(cnt)
            ]
    return tags


def parse_exif(jpeg: bytes) -> dict | None:
    """JPEG bytes → {make, model, orientation, datetime,
    datetime_original, gps} or None when no Exif APP1 exists. ``gps``
    is None or {lat_ref, lat: (deg, min, sec_milli), lon_ref, lon} with
    the raw integer numerators (denominators 1/1/1000 enforced by the
    writer; foreign denominators are surfaced as-is in ``gps_raw``)."""
    if jpeg[:2] != _SOI:
        return None
    for marker, start, end in _segments(jpeg):
        if marker != 0xE1:
            continue
        seg = jpeg[start + 4 : end]
        if not seg.startswith(_EXIF_HDR):
            continue
        tiff = seg[len(_EXIF_HDR) :]
        if len(tiff) < 8:
            return None
        e = "<" if tiff[:2] == b"II" else ">"
        magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
        if magic != 42:
            return None
        ifd0 = _read_full_ifd(tiff, ifd0_off, e)
        if ifd0 is None:
            return None
        out = {
            "make": ifd0.get(_TAG_MAKE, ""),
            "model": ifd0.get(_TAG_MODEL, ""),
            "orientation": int(ifd0.get(_TAG_ORIENTATION, 0)),
            "datetime": ifd0.get(_TAG_DATETIME, ""),
            "datetime_original": "",
            "gps": None,
        }
        exif_ptr = ifd0.get(_TAG_EXIF_IFD)
        if isinstance(exif_ptr, int):
            sub = _read_full_ifd(tiff, exif_ptr, e)
            if sub:
                out["datetime_original"] = sub.get(_TAG_DT_ORIGINAL, "")
        gps_ptr = ifd0.get(_TAG_GPS_IFD)
        if isinstance(gps_ptr, int):
            g = _read_full_ifd(tiff, gps_ptr, e)
            if g and _TAG_GPS_LAT in g and _TAG_GPS_LON in g:
                lat, lon = g[_TAG_GPS_LAT], g[_TAG_GPS_LON]
                out["gps"] = {
                    "lat_ref": g.get(_TAG_GPS_LAT_REF, ""),
                    "lon_ref": g.get(_TAG_GPS_LON_REF, ""),
                    "lat": tuple(n for n, _d in lat),
                    "lon": tuple(n for n, _d in lon),
                    "gps_raw": {"lat": lat, "lon": lon},
                }
        return out
    return None


def strip_gps(jpeg: bytes) -> bytes:
    """Remove GPS coordinates, keep everything else: the APP1 segment is
    canonically rebuilt from the parsed fields WITHOUT the GPS IFD; all
    other segments and the entropy stream are byte-identical. A JPEG
    with no Exif or no GPS comes back unchanged (identity, not a
    rewrite)."""
    meta = parse_exif(jpeg)
    if meta is None or meta["gps"] is None:
        return jpeg
    rebuilt = build_exif_app1(
        {
            "make": meta["make"],
            "model": meta["model"],
            "orientation": meta["orientation"],
            "datetime": meta["datetime"],
            "datetime_original": meta["datetime_original"],
        }
    )
    for marker, start, end in _segments(jpeg):
        if marker == 0xE1 and jpeg[start + 4 : start + 10] == _EXIF_HDR:
            return jpeg[:start] + rebuilt + jpeg[end:]
    return jpeg
