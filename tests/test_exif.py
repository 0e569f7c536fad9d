"""EXIF APP1 writer/parser/GPS-scrub (r7): field roundtrip, pixel
identity under scrub, endianness, malformed tolerance."""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from deepseek_ocr_api_rs_spark.extraction.exif import (
    build_exif_app1,
    insert_exif,
    parse_exif,
    strip_gps,
)
from deepseek_ocr_api_rs_spark.extraction.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_rgb,
)

FIELDS = {
    "make": "Cam1",
    "model": "M2",
    "orientation": 6,
    "datetime": "2023:01:05 12:34:05",
    "datetime_original": "2023:01:05 12:00:00",
    "gps": {
        "lat_ref": "N",
        "lat": (51, 30, 12345),
        "lon_ref": "W",
        "lon": (0, 7, 654),
    },
}


def _jpeg() -> bytes:
    img = (np.arange(24 * 24 * 3, dtype=np.uint32) * 7 % 251).astype(
        np.uint8
    ).reshape(24, 24, 3)
    return encode_jpeg_rgb(img, quality=90)


def test_field_roundtrip_including_gps_rationals():
    m = parse_exif(insert_exif(_jpeg(), FIELDS))
    assert m["make"] == "Cam1" and m["model"] == "M2"
    assert m["orientation"] == 6
    assert m["datetime"] == "2023:01:05 12:34:05"
    assert m["datetime_original"] == "2023:01:05 12:00:00"
    assert m["gps"]["lat"] == (51, 30, 12345)
    assert m["gps"]["lon"] == (0, 7, 654)
    assert m["gps"]["lat_ref"] == "N" and m["gps"]["lon_ref"] == "W"
    # writer's fixed denominators are visible in the raw view
    assert m["gps"]["gps_raw"]["lat"] == [(51, 1), (30, 1), (12345, 1000)]


def test_scrub_removes_gps_keeps_rest_and_pixels():
    raw = _jpeg()
    tagged = insert_exif(raw, FIELDS)
    scrubbed = strip_gps(tagged)
    m = parse_exif(scrubbed)
    assert m["gps"] is None
    assert m["orientation"] == 6
    assert m["datetime_original"] == "2023:01:05 12:00:00"
    # the entropy stream and every non-APP1 segment are byte-identical
    assert scrubbed.endswith(raw[2:])
    shas = {
        hashlib.sha256(decode_jpeg_pixels(b).tobytes()).hexdigest()
        for b in (raw, tagged, scrubbed)
    }
    assert len(shas) == 1


def test_scrub_is_identity_without_exif_or_gps():
    raw = _jpeg()
    assert strip_gps(raw) is raw
    no_gps = {k: v for k, v in FIELDS.items() if k != "gps"}
    tagged = insert_exif(raw, no_gps)
    assert strip_gps(tagged) is tagged


def test_no_exif_parses_none():
    assert parse_exif(_jpeg()) is None
    assert parse_exif(b"\x00\x01") is None


def test_big_endian_tiff_parses():
    tiff = (
        b"MM" + struct.pack(">HI", 42, 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 8) + b"\x00\x00"
        + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    jpeg = b"\xff\xd8" + app1 + _jpeg()[2:]
    m = parse_exif(jpeg)
    assert m is not None and m["orientation"] == 8


def test_truncated_app1_is_tolerated():
    tagged = insert_exif(_jpeg(), FIELDS)
    # chop inside the APP1 payload: parse must return None, never raise
    assert parse_exif(tagged[:30]) is None


def test_app1_not_first_segment_still_found():
    raw = _jpeg()
    app1 = build_exif_app1(FIELDS)
    # place the Exif segment AFTER the first existing segment
    # (some writers put APP0/JFIF first)
    import struct as _s

    (seg_len,) = _s.unpack_from(">H", raw, 4)
    cut = 2 + 2 + seg_len
    jpeg = raw[:cut] + app1 + raw[cut:]
    m = parse_exif(jpeg)
    assert m is not None and m["make"] == "Cam1"
    scrubbed = strip_gps(jpeg)
    assert parse_exif(scrubbed)["gps"] is None
    assert scrubbed[:cut] == raw[:cut] and scrubbed.endswith(raw[cut:])


def _ifd0_entry_count(jpeg: bytes) -> int:
    """Entry count of IFD0 in the APP1 right after SOI (writer layout)."""
    (seg_len,) = struct.unpack_from(">H", jpeg, 4)
    tiff = jpeg[2 + 4 + 6 : 2 + 2 + seg_len]
    (ifd0_off,) = struct.unpack_from("<I", tiff, 4)
    (n,) = struct.unpack_from("<H", tiff, ifd0_off)
    return n


def test_scrub_does_not_invent_absent_tags():
    # ADVICE r7: a source image missing Orientation/DateTime must not come
    # back from strip_gps with orientation=0 (invalid; spec range 1-8) or
    # present-but-empty ASCII tags — absent stays ABSENT in the rebuilt IFD.
    raw = _jpeg()
    gps_only = {
        "make": "",
        "model": "",
        "orientation": 0,
        "datetime": "",
        "datetime_original": "",
        "gps": FIELDS["gps"],
    }
    tagged = insert_exif(raw, gps_only)
    assert parse_exif(tagged)["gps"] is not None
    # writer side: only the GPS pointer tag is present
    assert _ifd0_entry_count(tagged) == 1
    scrubbed = strip_gps(tagged)
    m2 = parse_exif(scrubbed)
    assert m2["gps"] is None
    assert m2["orientation"] == 0 and m2["make"] == "" and m2["datetime"] == ""
    assert m2["datetime_original"] == ""
    # scrubbed IFD0 holds ZERO tags — nothing invented
    assert _ifd0_entry_count(scrubbed) == 0
    assert scrubbed.endswith(raw[2:])


def test_scrub_partial_fields_keep_only_what_existed():
    raw = _jpeg()
    partial = {
        "make": "CamX",
        "model": "",
        "orientation": 3,
        "datetime": "",
        "datetime_original": "",
        "gps": FIELDS["gps"],
    }
    scrubbed = strip_gps(insert_exif(raw, partial))
    m = parse_exif(scrubbed)
    assert m["gps"] is None
    assert m["make"] == "CamX" and m["orientation"] == 3
    assert m["model"] == "" and m["datetime"] == ""
    # make + orientation only
    assert _ifd0_entry_count(scrubbed) == 2
