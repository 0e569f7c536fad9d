"""WebP container metadata (extraction/webp.py): writer↔parser roundtrip
across all three variants, tolerance fuzz, Spark operator."""

from __future__ import annotations

from deepseek_ocr_api_rs_spark.extraction.webp import (
    make_webp_extended,
    make_webp_lossless,
    make_webp_lossy,
    parse_webp_meta,
)


def test_lossy_vp8_roundtrip():
    m = parse_webp_meta(make_webp_lossy(320, 240))
    assert m == {
        "fmt": "vp8", "width": 320, "height": 240, "alpha": False,
        "animated": False, "n_frames": 1, "loop_count": 0,
    }


def test_lossless_vp8l_roundtrip_with_alpha():
    m = parse_webp_meta(make_webp_lossless(17, 23, alpha=True))
    assert (m["fmt"], m["width"], m["height"], m["alpha"]) == ("vp8l", 17, 23, True)
    m2 = parse_webp_meta(make_webp_lossless(16383, 16383))
    assert (m2["width"], m2["height"], m2["alpha"]) == (16383, 16383, False)


def test_extended_vp8x_still_and_animated():
    still = parse_webp_meta(make_webp_extended(64, 48, alpha=True))
    assert (still["fmt"], still["animated"], still["n_frames"]) == ("vp8x", False, 1)
    assert still["alpha"] and still["width"] == 64 and still["height"] == 48
    anim = parse_webp_meta(
        make_webp_extended(100, 80, n_frames=5, loop_count=3)
    )
    assert (anim["animated"], anim["n_frames"], anim["loop_count"]) == (True, 5, 3)
    assert (anim["width"], anim["height"]) == (100, 80)


def test_rejects_non_webp_and_fuzz_never_raises():
    assert parse_webp_meta(b"") is None
    assert parse_webp_meta(b"RIFF\x10\x00\x00\x00WAVEdata") is None
    assert parse_webp_meta(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert parse_webp_meta(make_webp_lossy(32, 24)[:15]) is None
    blob = make_webp_extended(64, 48, n_frames=4)
    state = 17
    mut = bytearray(blob)
    for _ in range(200):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        mut[state % len(mut)] = (mut[state % len(mut)] + 1 + state % 250) % 256
        if state % 5 == 0:
            parse_webp_meta(bytes(mut))  # None or parsed; never raises


def test_vp8_interframe_not_treated_as_keyframe():
    blob = bytearray(make_webp_lossy(32, 24))
    # set the frame-type bit (bit 0 of the tag) → interframe: no dims
    lo = blob.find(b"VP8 ") + 8
    blob[lo] |= 1
    assert parse_webp_meta(bytes(blob)) is None


def test_webp_operator_and_query(spark):
    from deepseek_ocr_api_rs_spark.operators.multimodal import (
        synthesize_webps,
        webp_metadata,
    )

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    rows = {r.doc_id: r for r in webp_metadata(synthesize_webps(docs)).collect()}
    assert len(rows) == 30
    for d in (0, 1, 2, 7, 14):
        r = rows[d]
        assert r.width == d % 320 + 16 and r.height == d % 240 + 16
        assert r.fmt == ("vp8", "vp8l", "vp8x")[d % 3]
        if d % 3 == 2:
            assert r.animated and r.n_frames == d % 7 + 2
        else:
            assert not r.animated and r.n_frames == 1
