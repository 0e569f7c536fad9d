"""Animated GIF (extraction/raster.py + operators/video.py): writer↔walk
roundtrip, disposal/transparency compositing, frame budget, fuzz."""

from __future__ import annotations

import hashlib

import numpy as np

from deepseek_ocr_api_rs_spark.extraction.raster import (
    GIF_PALETTE,
    encode_gif_animation,
    parse_gif_animation,
    render_gif_frames,
)


def _anim(n=4, w=30, h=20):
    y, x = np.mgrid[0:h, 0:w]
    frames = [
        {
            "idx": ((x + y) % 64).astype(np.uint8),
            "x": 0, "y": 0, "delay_cs": 5, "disposal": 1, "transparent": None,
        }
    ]
    ys, xs = np.mgrid[0:6, 0:8]
    for k in range(1, n):
        frames.append(
            {
                "idx": ((xs + ys * 2 + k) % 64).astype(np.uint8),
                "x": 3 * k, "y": 2 * k, "delay_cs": 4 + k,
                "disposal": (1, 2, 3)[k % 3],
                "transparent": 5 if k % 2 else None,
            }
        )
    return encode_gif_animation(w, h, frames, GIF_PALETTE[:64], loop=2, bg_index=3)


def test_walk_roundtrip_without_decode():
    blob = _anim(5)
    p = parse_gif_animation(blob)
    assert p is not None
    assert (p["width"], p["height"], p["loop_count"], p["bg_index"]) == (30, 20, 2, 3)
    assert len(p["frames"]) == 5
    f1 = p["frames"][1]
    assert (f1["x"], f1["y"], f1["delay_cs"], f1["disposal"], f1["transparent"]) == (
        3, 2, 5, 2, 5,
    )
    # the walk stored raw LZW bytes, not decoded rasters
    assert isinstance(f1["lzw"], bytes) and len(f1["lzw"]) > 0


def test_disposal_semantics():
    """disposal 2 restores the rect to background; disposal 3 restores the
    pre-frame canvas — later frames must see the restored state."""
    pal = GIF_PALETTE[:64]
    base = {"idx": np.full((10, 10), 7, np.uint8), "x": 0, "y": 0,
            "delay_cs": 4, "disposal": 1, "transparent": None}
    d2 = {"idx": np.full((4, 4), 9, np.uint8), "x": 2, "y": 2,
          "delay_cs": 4, "disposal": 2, "transparent": None}
    d3 = {"idx": np.full((4, 4), 11, np.uint8), "x": 4, "y": 4,
          "delay_cs": 4, "disposal": 3, "transparent": None}
    last = {"idx": np.full((1, 1), 13, np.uint8), "x": 0, "y": 0,
            "delay_cs": 4, "disposal": 0, "transparent": None}
    blob = encode_gif_animation(10, 10, [base, d2, d3, last], pal, bg_index=3)
    r = render_gif_frames(parse_gif_animation(blob), [0, 1, 2, 3])
    # frame 1 shows the 9-block
    assert (r[1][2:6, 2:6] == pal[9]).all()
    # frame 2: the 9-block rect was restored to BACKGROUND, 11-block shows
    assert (r[2][2:4, 2:6] == pal[3]).all()
    assert (r[2][4:8, 4:8] == pal[11]).all()
    # frame 3: the 11-block rect was restored to the PRE-frame state
    # (which at (4:6, 4:6) is background from d2's disposal, and base
    # color 7 outside d2's rect)
    assert (r[3][4:6, 4:6] == pal[3]).all()
    assert (r[3][6:8, 6:8] == pal[7]).all()
    assert (r[3][0, 0] == pal[13]).all()


def test_transparency_leaves_canvas():
    pal = GIF_PALETTE[:64]
    base = {"idx": np.full((6, 6), 7, np.uint8), "x": 0, "y": 0,
            "delay_cs": 4, "disposal": 1, "transparent": None}
    over = {"idx": np.array([[5, 9], [9, 5]], np.uint8), "x": 1, "y": 1,
            "delay_cs": 4, "disposal": 0, "transparent": 5}
    blob = encode_gif_animation(6, 6, [base, over], pal)
    r = render_gif_frames(parse_gif_animation(blob), [1])
    assert (r[1][1, 1] == pal[7]).all()  # transparent pixel → base shows
    assert (r[1][1, 2] == pal[9]).all()


def test_frame_budget_never_decodes_past_last_sampled(monkeypatch):
    import deepseek_ocr_api_rs_spark.extraction.raster as R

    blob = _anim(6)
    p = parse_gif_animation(blob)
    calls = []
    orig = R._lzw_decode
    monkeypatch.setattr(R, "_lzw_decode", lambda d, m: calls.append(1) or orig(d, m))
    render_gif_frames(p, [0, 3])
    assert len(calls) == 4  # frames 0..3, never 4 or 5


def test_fuzz_never_raises():
    blob = _anim(4)
    assert parse_gif_animation(b"") is None
    assert parse_gif_animation(blob[:11]) is None
    state = 23
    mut = bytearray(blob)
    for _ in range(200):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        mut[state % len(mut)] = (mut[state % len(mut)] + 1 + state % 250) % 256
        if state % 5 == 0:
            p = parse_gif_animation(bytes(mut))
            if p is not None:
                render_gif_frames(p, [0])  # None or rendered; never raises


def test_q_gif_anim_frames_matches_scalar(spark):
    import __spark_entry__ as entry
    from deepseek_ocr_api_rs_spark.operators.video import (
        synthesize_gif_anim_for_doc,
    )

    got = entry.q_gif_anim_frames(spark, "/root/testdata/sf0.001").collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) >= 400
    for doc_id in sorted(by_doc)[:5]:
        p = parse_gif_animation(synthesize_gif_anim_for_doc(doc_id))
        n = len(p["frames"])
        targets = list(range(0, n, 3))
        rendered = render_gif_frames(p, targets)
        rows = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == targets
        for r in rows:
            assert r.n_frames == n and (r.width, r.height) == (
                p["width"], p["height"],
            )
            assert r.frame_sha == hashlib.sha256(
                rendered[r.frame_idx].tobytes()
            ).hexdigest()
