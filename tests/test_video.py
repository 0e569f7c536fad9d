"""Video frame-sampling (operators/video.py): MJPEG-in-AVI container
roundtrip, frame-budgeted decode, Spark↔scalar parity, never-raise fuzz."""

from __future__ import annotations

import hashlib

import numpy as np

from deepseek_ocr_api_rs_spark.extraction.jpeg import decode_jpeg_pixels
from deepseek_ocr_api_rs_spark.operators.video import (
    make_avi_mjpeg,
    parse_avi,
    sample_video_frames,
    synthesize_avi_for_dims,
    synthesize_videos,
)


def _clip(n=7, h=24, w=32):
    y, x = np.mgrid[0:h, 0:w]
    return [
        np.clip(
            np.stack([x * 3 + t * 10, y * 4 + t, (x + y) * 2], axis=2), 0, 255
        ).astype(np.uint8)
        for t in range(n)
    ]


def test_avi_container_roundtrip():
    frames = _clip()
    blob = make_avi_mjpeg(frames, fps=12)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    w, h, fps, fr = parse_avi(blob)
    assert (w, h, fps, len(fr)) == (32, 24, 12, 7)
    # each chunk is a genuine decodable JPEG of the source frame
    for orig, jbytes in zip(frames, fr):
        img = decode_jpeg_pixels(jbytes)
        assert img.shape == orig.shape
        assert np.abs(img.astype(int) - orig.astype(int)).max() <= 8


def test_parse_avi_tolerant_and_fuzz():
    blob = make_avi_mjpeg(_clip(3))
    assert parse_avi(b"") is None
    assert parse_avi(b"RIFF1234AVI") is None
    assert parse_avi(blob[:40]) is None
    state = 3
    mut = bytearray(blob)
    for _ in range(200):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        mut[state % len(mut)] = (mut[state % len(mut)] + 1 + state % 250) % 256
        if state % 5 == 0:
            parse_avi(bytes(mut))  # None or parsed; never raises


def test_frame_budget_only_decodes_sampled(spark):
    """every_k=3 over a 9-frame clip → frames 0, 3, 6 only; shas match the
    scalar decode of exactly those frames."""
    blob = synthesize_avi_for_dims(32, 24)
    df = spark.createDataFrame([(5, blob)], "doc_id long, payload binary")
    rows = sample_video_frames(df, every_k=3).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 3, 6]
    assert all((r.width, r.height, r.n_frames) == (32, 24, 9) for r in rows)
    _, _, _, frames = parse_avi(blob)
    for r in rows:
        img = decode_jpeg_pixels(frames[r.frame_idx])
        assert r.frame_sha == hashlib.sha256(img.tobytes()).hexdigest()


def test_corrupt_video_yields_zero_rows_not_failure(spark):
    df = spark.createDataFrame(
        [(1, synthesize_avi_for_dims(20, 20)), (2, b"junk"), (3, None)],
        "doc_id long, payload binary",
    )
    rows = sample_video_frames(df).collect()
    assert {r.doc_id for r in rows} == {1}


def test_q_video_frame_sample_matches_scalar(spark):
    import __spark_entry__ as entry

    got = entry.q_video_frame_sample(spark, "/root/testdata/sf0.001").collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) >= 50
    for doc_id in sorted(by_doc)[:5]:
        blob = synthesize_avi_for_dims(doc_id % 48 + 16, doc_id % 40 + 16)
        _, _, _, frames = parse_avi(blob)
        rows = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, len(frames), 3))
        for r in rows:
            img = decode_jpeg_pixels(frames[r.frame_idx])
            assert r.frame_sha == hashlib.sha256(img.tobytes()).hexdigest()
