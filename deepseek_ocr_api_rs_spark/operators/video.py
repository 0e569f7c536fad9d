"""Video frame-sampling — the last multimodal column, with REAL plumbing.

A training-data pipeline treats video as an opaque binary column and needs
container parse → frame-sample → per-frame decode/feature-extract, never
whole-video decode (100 TB of video decodes frame-budgeted or not at all).
No video codec library exists in this container, but none is needed for a
REAL implementation: MJPEG-in-AVI is a genuine, historically common video
format whose container is RIFF (the chunk walk ``operators.audio`` already
does for WAV) and whose per-frame codec is baseline JPEG — which
``extraction.jpeg`` implements from the spec. So both sides of this module
are real bytes, not stubs:

- ``make_avi_mjpeg`` assembles a spec-shaped AVI (RIFF 'AVI ' → LIST hdrl
  [avih + strl[strh 'vids'/'MJPG' + strf BITMAPINFOHEADER]] → LIST movi
  ['00dc' JPEG chunks] → idx1), playable structure per the public
  AVI/RIFF layout (msdn AVIMAINHEADER et al.);
- ``parse_avi`` walks the chunks back (tolerant — malformed → None);
- ``sample_video_frames`` is the Spark operator: Arrow ``mapInPandas``
  over (id, payload) rows, decode ONLY every k-th frame through the real
  JPEG path, one output row per sampled frame with dims + a pixel sha256
  (any decoder or sampler change is visible). Map-only — no shuffle; the
  frame budget (``every_k``) is the 100 TB lever.

Reference parity note: the reference decodes fetched image payloads via
the image crate (crates/server/src/generation.rs:276-305); video is the
natural next container for the same "decode real bytes" contract.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_avi_mjpeg(frames: list[np.ndarray], fps: int = 10, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 frames → MJPEG-in-AVI bytes (RIFF container with
    one '00dc' JPEG chunk per frame + idx1 index)."""
    from deepseek_ocr_api_rs_spark.extraction.jpeg import encode_jpeg_rgb

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg_rgb(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0x10,        # maxbytes, padding, flags (HASINDEX)
        len(frames), 0, 1, 0,  # totalframes, initial, streams, sugbuf
        w, h, 0, 0, 0, 0,  # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        # flags, prio, lang, initframes, scale, rate, start, length,
        # sugbuf, quality, samplesize
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per chunk, offsets relative to the start of 'movi'
    idx = bytearray()
    off = 4  # past the 'movi' list-type fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> tuple[int, int, int, list[bytes]] | None:
    """AVI bytes → (width, height, fps, [jpeg frame bytes]) via a tolerant
    RIFF chunk walk; None for anything that is not a parseable AVI."""
    try:
        b = bytes(payload or b"")
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
            return None
        width = height = 0
        fps = 0
        frames: list[bytes] = []

        def walk(lo: int, hi: int) -> None:
            nonlocal width, height, fps
            pos = lo
            while pos + 8 <= hi:
                cid = b[pos : pos + 4]
                size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                body_lo = pos + 8
                body_hi = min(body_lo + size, hi)
                if cid == b"LIST":
                    walk(body_lo + 4, body_hi)  # past the list-type fourcc
                elif cid == b"avih" and size >= 40:
                    vals = struct.unpack("<III", b[body_lo : body_lo + 12])
                    if vals[0]:
                        fps = round(1_000_000 / vals[0])
                elif cid == b"strf" and size >= 24:
                    _, w_, h_ = struct.unpack("<Iii", b[body_lo : body_lo + 12])
                    width, height = int(w_), abs(int(h_))
                elif cid[2:4] in (b"dc", b"db") and size > 0:
                    frames.append(b[body_lo:body_hi])
                pos = body_lo + size + (size % 2)

        walk(12, min(12 + struct.unpack("<I", b[4:8])[0] - 4, len(b)))
        if not frames:
            return None
        return width, height, fps, frames
    except Exception:
        return None


@lru_cache(maxsize=2048)
def synthesize_avi_for_dims(w: int, h: int, n_frames: int = 9) -> bytes:
    """Deterministic moving-gradient MJPEG clip for one (w, h) — pixels are
    a pure function of (dims, frame index) so synthesis memoizes across a
    corpus (same policy as the progressive-JPEG and WAV synths)."""
    y, x = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n_frames):
        base = 110.0 + 70.0 * np.sin((x + 5.0 * t) / 9.0) + 40.0 * np.cos((y - 3.0 * t) / 7.0)
        img = np.stack(
            [base, base * 0.8 + ((x + t) % 23), base * 0.6 + ((y + 2 * t) % 29)],
            axis=2,
        )
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return make_avi_mjpeg(frames)


def synthesize_videos(
    docs: DataFrame, id_col: str = "doc_id", max_w: int = 48, max_h: int = 40
) -> DataFrame:
    """doc_id → real MJPEG-AVI payload (dims from doc_id arithmetic)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            payloads = [
                synthesize_avi_for_dims(int(d % max_w + 16), int(d % max_h + 16))
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        process, schema="doc_id long, payload binary"
    )


def sample_video_frames(
    docs: DataFrame,
    every_k: int = 3,
    id_col: str = "doc_id",
    binary_col: str = "payload",
) -> DataFrame:
    """Container parse + frame-budgeted decode: one output row per SAMPLED
    frame (indexes 0, k, 2k, …) with dims and the decoded frame's pixel
    sha256. Frames that are not sampled are never JPEG-decoded — the
    100 TB budget lever. Malformed payloads yield zero rows (error-branch
    discipline: a corrupt video must not fail the batch). Map-only."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deepseek_ocr_api_rs_spark.extraction.jpeg import decode_jpeg_pixels

        for pdf in batches:
            ids, fidx, nfr, ws, hs, shas = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                parsed = parse_avi(bytes(payload) if payload is not None else b"")
                if parsed is None:
                    continue
                w, h, _fps, frames = parsed
                for i in range(0, len(frames), every_k):
                    img = decode_jpeg_pixels(frames[i])
                    if img is None:
                        continue
                    ids.append(int(doc_id))
                    fidx.append(i)
                    nfr.append(len(frames))
                    ws.append(img.shape[1])
                    hs.append(img.shape[0])
                    shas.append(hashlib.sha256(img.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": fidx,
                    "n_frames": nfr,
                    "width": ws,
                    "height": hs,
                    "frame_sha": shas,
                }
            )

    return docs.mapInPandas(
        process,
        schema=(
            "doc_id long, frame_idx int, n_frames int, "
            "width int, height int, frame_sha string"
        ),
    )
