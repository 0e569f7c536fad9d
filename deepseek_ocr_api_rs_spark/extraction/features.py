"""Pinned feature + linear-scorer definition (the "projector" weight table).

Analogue of ``ImageProjector.project`` — a single linear map over extracted
features (crates/infer-deepseek/src/model/mod.rs:334-377). The weight table
is small, read-only and shared: on Spark it travels to executors as a
module-level constant inside the --py-files zip (the broadcast pattern of
S6, mmap'd weights model/mod.rs:857-860).

Determinism contract (the P1/P2 lesson — exact rounding discipline,
model/mod.rs:1921-1932): every feature is a ratio of integer counts computed
in float64, and the score is accumulated FEATURE BY FEATURE, left to right,
with elementwise IEEE ops only. The scalar path and the numpy-vectorized
path therefore produce bit-identical scores — no dot-product reassociation
(np.dot/BLAS may reorder; we never use it for scoring).
"""

from __future__ import annotations

import numpy as np

# Fixed feature order. Index comments are load-bearing: tests assert the
# golden fixture's `features` arrays in exactly this order.
FEATURE_NAMES: tuple[str, ...] = (
    "log_text_len",     # 0: log1p(n_text_chars)
    "link_density",     # 1: n_link_chars / max(n_text_chars, 1)
    "text_density",     # 2: n_text_chars / (1 + n_tags)
    "stopword_ratio",   # 3: n_stop_words / max(n_words, 1)
    "punct_ratio",      # 4: n_punct / max(n_text_chars, 1)
    "avg_word_len",     # 5: n_text_chars / max(n_words, 1)
    "depth",            # 6: stack depth at block start
    "boiler_ctx",       # 7: 1.0 if nav/header/footer/aside/form ancestor
    "tag_weight",       # 8: TAG_WEIGHTS lookup on the block's leaf tag
    # --- second feature view (E2): GLOBAL document stats, broadcast to
    # every block of the document — the CLIP-global + SAM-local two-tower
    # concat (build_clip_sam_tokens, model/mod.rs:510-556). Both are exact
    # integer-derived float64s, so scalar and pooled paths agree bitwise.
    "doc_link_density",  # 9: Σ n_link_chars / max(Σ n_text_chars, 1) per doc
    "doc_log_blocks",    # 10: log1p(n_blocks in document)
)

N_FEATURES = len(FEATURE_NAMES)
N_BLOCK_FEATURES = 9    # features 0-8 are per-block (the "SAM" local view)

# jusText/Readability-style linear weights: long, stopword-rich, low-link
# text wins; link-heavy shallow boilerplate loses.
WEIGHTS: tuple[float, ...] = (
    0.75,   # log_text_len       — longer blocks are content
    -4.0,   # link_density       — nav/footer link walls
    0.02,   # text_density       — markup-sparse text is content
    2.0,    # stopword_ratio     — prose has function words
    1.0,    # punct_ratio        — sentences have punctuation
    -0.05,  # avg_word_len       — tag-soup tokens are long
    -0.15,  # depth              — deeply nested fragments are chrome
    -3.0,   # boiler_ctx         — hard structural prior
    1.0,    # tag_weight         — per-tag prior (scaled by table below)
    -0.8,   # doc_link_density   — link-farm PAGES depress every block
    0.05,   # doc_log_blocks     — richly-structured docs get a mild boost
)

ACCEPT_THRESHOLD = 2.0

# Leaf-tag prior. Applied as feature 8 (weight 1.0) so it shows up in the
# golden feature arrays like any other feature.
TAG_WEIGHTS: dict[str, float] = {
    "p": 1.5,
    "h1": 1.0, "h2": 1.0, "h3": 1.0, "h4": 0.8, "h5": 0.8, "h6": 0.8,
    "pre": 1.5,
    "blockquote": 1.2,
    "li": 0.3,
    "td": 0.0, "th": 0.0, "caption": 0.5, "figcaption": 0.5,
    "title": -1.0,
    "nav": -2.0, "header": -1.5, "footer": -2.0, "aside": -1.5,
    "form": -1.5,
}
DEFAULT_TAG_WEIGHT = 0.0

# Smoothing (jusText context pass): a short rejected block flanked by two
# accepted neighbours is promoted; a heading directly above an accepted
# block is promoted. Pinned constants:
SHORT_BLOCK_WORDS = 10
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

BLOCK_SEPARATOR = "\n\n"

# P5 bounded-size normalization (smart_resize clamps pixel area,
# crates/infer-paddleocr/src/vision/preprocess.rs:261-300): documents above
# this byte budget are truncated DETERMINISTICALLY (at a UTF-8 boundary) and
# the truncation is recorded — "no silent caps".
MAX_DOC_BYTES = 1_048_576


def truncate_payload(data: bytes) -> tuple[bytes, bool]:
    """Cap per-document work. Returns (payload, truncated?)."""
    if len(data) <= MAX_DOC_BYTES:
        return data, False
    cut = data[:MAX_DOC_BYTES]
    # back off to a UTF-8 sequence boundary (≤3 continuation bytes)
    for back in range(4):
        try:
            cut[: MAX_DOC_BYTES - back].decode("utf-8")
            return cut[: MAX_DOC_BYTES - back], True
        except UnicodeDecodeError:
            continue
    return cut, True


def leaf_tag(tag_path: str) -> str:
    return tag_path.rsplit("/", 1)[-1] if tag_path else ""


def tag_weight(tag_path: str) -> float:
    return TAG_WEIGHTS.get(leaf_tag(tag_path), DEFAULT_TAG_WEIGHT)


def score_matrix(features: np.ndarray) -> np.ndarray:
    """Score a (n_blocks, N_FEATURES) float64 matrix.

    Elementwise accumulate in fixed feature order — bit-identical to the
    scalar loop in reference.py for every row.
    """
    score = np.zeros(features.shape[0], dtype=np.float64)
    for j, w in enumerate(WEIGHTS):
        score = score + features[:, j] * w
    return score
