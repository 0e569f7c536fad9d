"""Vectorized batch extraction kernel — what the Spark Arrow-UDF stage runs.

The reference engine is row-oriented (one document at a time, batch dim
asserted == 1 at crates/infer-deepseek/src/model/mod.rs:1541-1544) but
vectorized *within* a document. This kernel inverts that (SURVEY.md §1.2):
columnar ACROSS documents — all blocks of an Arrow batch are pooled into
flat numpy arrays, features and scores are computed columnwise over the
whole pool, the accept-smoothing pass is shifted-boolean-array logic, and
only parsing + final string assembly stay scalar (like lxml would be).

Bit-identical to ``reference.extract_document`` per document — enforced by
tests (the Rust-vs-Python golden parity pattern, tests/baseline.rs:479-708).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd

from deepseek_ocr_api_rs_spark.extraction import charset as CS
from deepseek_ocr_api_rs_spark.extraction import features as FT
from deepseek_ocr_api_rs_spark.extraction import markdown as MD
from deepseek_ocr_api_rs_spark.extraction.html_blocks import RawBlock, segment_html
from deepseek_ocr_api_rs_spark.extraction.normalize import normalize_text
from deepseek_ocr_api_rs_spark.extraction.pdf_spans import (
    PDF_MAGIC,
    assemble_pdf_text,
    parse_pdf_payload,
)

DOC_SCHEMA_COLUMNS = [
    "extracted_text", "branch", "n_chars", "n_blocks_total", "n_blocks_accepted",
    "span_starts", "span_ends", "truncated",
]


@dataclass
class BlockPool:
    """All HTML blocks of a batch, flattened (struct-of-arrays)."""

    doc_idx: np.ndarray      # int64, which batch row each block belongs to
    block_idx: np.ndarray    # int64, position within its document
    features: np.ndarray     # float64 (n_blocks, N_FEATURES)
    scores: np.ndarray       # float64 (n_blocks,)
    raw_accept: np.ndarray   # bool
    accepted: np.ndarray     # bool (post-smoothing)
    texts: list[str]
    tag_paths: list[str]


def _pool_features(blocks: list[RawBlock], doc_of: np.ndarray) -> np.ndarray:
    """Columnwise feature computation over the pooled block arrays.

    Same numerators/denominators/division order as the scalar
    ``reference.block_features`` — elementwise IEEE ops ⇒ bit-identical.
    """
    n = len(blocks)
    feats = np.empty((n, FT.N_FEATURES), dtype=np.float64)
    n_text = np.fromiter((b.n_text_chars for b in blocks), np.float64, n)
    n_link = np.fromiter((b.n_link_chars for b in blocks), np.float64, n)
    n_tags = np.fromiter((b.n_tags for b in blocks), np.float64, n)
    n_words = np.fromiter((b.n_words for b in blocks), np.float64, n)
    n_stop = np.fromiter((b.n_stop_words for b in blocks), np.float64, n)
    n_punct = np.fromiter((b.n_punct for b in blocks), np.float64, n)
    depth = np.fromiter((b.depth for b in blocks), np.float64, n)
    boiler = np.fromiter((b.boiler for b in blocks), np.float64, n)
    text_den = np.maximum(n_text, 1.0)
    word_den = np.maximum(n_words, 1.0)
    feats[:, 0] = np.log1p(n_text)
    feats[:, 1] = n_link / text_den
    feats[:, 2] = n_text / (1.0 + n_tags)
    feats[:, 3] = n_stop / word_den
    feats[:, 4] = n_punct / text_den
    feats[:, 5] = n_text / word_den
    feats[:, 6] = depth
    feats[:, 7] = boiler
    feats[:, 8] = np.fromiter((FT.tag_weight(b.tag_path) for b in blocks), np.float64, n)
    # second feature view (E2): per-DOC global stats broadcast to each block
    # row — bincount sums of integer-valued float64s are exact regardless of
    # order, so this matches reference.doc_features bitwise
    if n:
        uniq, inv = np.unique(doc_of, return_inverse=True)
        tot_text = np.bincount(inv, weights=n_text)
        tot_link = np.bincount(inv, weights=n_link)
        blocks_per_doc = np.bincount(inv).astype(np.float64)
        feats[:, 9] = tot_link[inv] / np.maximum(tot_text[inv], 1.0)
        feats[:, 10] = np.log1p(blocks_per_doc)[inv]
    return feats


def _smooth_accept_pooled(
    raw: np.ndarray,
    doc_of: np.ndarray,
    n_words: np.ndarray,
    boiler: np.ndarray,
    is_heading: np.ndarray,
) -> np.ndarray:
    """Vectorized jusText context pass over the pooled arrays.

    Neighbour = adjacent pooled row *within the same document* (blocks are
    pooled in (doc, block) order, so same-doc adjacency is array adjacency
    with a doc-boundary mask). Reads only `raw` — exactly the semantics of
    the scalar ``reference.smooth_accept``.
    """
    n = raw.shape[0]
    if n == 0:
        return raw.copy()
    same_prev = np.zeros(n, dtype=bool)
    same_next = np.zeros(n, dtype=bool)
    same_prev[1:] = doc_of[1:] == doc_of[:-1]
    same_next[:-1] = doc_of[1:] == doc_of[:-1]
    prev_raw = np.zeros(n, dtype=bool)
    next_raw = np.zeros(n, dtype=bool)
    prev_raw[1:] = raw[:-1]
    next_raw[:-1] = raw[1:]
    prev_ok = same_prev & prev_raw
    next_ok = same_next & next_raw
    promote_heading = is_heading & next_ok
    promote_short = (
        (n_words < FT.SHORT_BLOCK_WORDS) & (boiler == 0) & prev_ok & next_ok
    )
    return raw | promote_heading | promote_short


def pool_html_blocks(html_docs: list[tuple[int, str]]) -> BlockPool:
    """Parse + pool all blocks for the html-branch docs of a batch."""
    all_blocks: list[RawBlock] = []
    doc_of_list: list[int] = []
    for doc_i, html in html_docs:
        blocks = segment_html(html)
        all_blocks.extend(blocks)
        doc_of_list.extend([doc_i] * len(blocks))
    n = len(all_blocks)
    doc_of = np.asarray(doc_of_list, dtype=np.int64)
    feats = _pool_features(all_blocks, doc_of)
    scores = FT.score_matrix(feats)
    raw = scores > FT.ACCEPT_THRESHOLD
    n_words = np.fromiter((b.n_words for b in all_blocks), np.float64, n)
    boiler = np.fromiter((b.boiler for b in all_blocks), np.float64, n)
    heading = np.fromiter(
        (FT.leaf_tag(b.tag_path) in FT.HEADING_TAGS for b in all_blocks), bool, n
    )
    accepted = _smooth_accept_pooled(raw, doc_of, n_words, boiler, heading)
    return BlockPool(
        doc_idx=doc_of,
        block_idx=np.fromiter((b.idx for b in all_blocks), np.int64, n),
        features=feats,
        scores=scores,
        raw_accept=raw,
        accepted=accepted,
        texts=[b.text for b in all_blocks],
        tag_paths=[b.tag_path for b in all_blocks],
    )


def extract_batch(payloads: Sequence[bytes | None]) -> pd.DataFrame:
    """Extract a batch of raw documents → doc-level pandas DataFrame.

    Routing (MoE-dispatch pattern D8: group rows by branch, process each
    branch, scatter results back by original index —
    crates/infer-deepseek/src/transformer/block.rs:682-727):
    PDF magic → pdf; decodable text (strict UTF-8, or a DECLARED legacy
    charset via the shared WHATWG BOM/meta-prescan sniff —
    extraction/charset.py, r7) with markup → html; without markup →
    text (plain-text/Markdown passthrough, the crates/infer-dots
    backend analogue — every paragraph block accepted, no scorer);
    else → error.
    """
    n = len(payloads)
    texts = [""] * n
    branch = ["error"] * n
    n_total = np.zeros(n, dtype=np.int64)
    n_acc = np.zeros(n, dtype=np.int64)
    truncated = np.zeros(n, dtype=bool)
    span_starts: list[list[int]] = [[] for _ in range(n)]
    span_ends: list[list[int]] = [[] for _ in range(n)]

    html_docs: list[tuple[int, str]] = []
    for i, payload in enumerate(payloads):
        if payload is None:
            continue
        data = bytes(payload)
        if data.startswith(PDF_MAGIC):
            parsed = parse_pdf_payload(data)
            if parsed is None:
                continue
            width, spans = parsed
            texts[i] = normalize_text(assemble_pdf_text(spans, width))
            branch[i] = "pdf"
            n_total[i] = len(spans)
            # spans flagged undecodable (Type0 font with a predefined
            # non-Unicode CMap and no /ToUnicode) count toward the total
            # but not accepted — pdf block_accept_rate < 1 is the per-doc
            # undecodable_font metric
            n_acc[i] = sum(1 for s in spans if not s.get("undecodable"))
        else:
            routed = CS.route_decode(data, FT.truncate_payload)
            if routed is None:
                continue
            decoded, trunc = routed
            truncated[i] = trunc
            if MD.looks_like_markup(decoded):
                html_docs.append((i, decoded))
                continue
            # third branch (dots analogue): plain-text/Markdown
            # passthrough — paragraph blocks, ALL accepted, no scorer
            blocks = MD.markdown_blocks(decoded)
            parts: list[str] = []
            ss: list[int] = []
            se: list[int] = []
            off = 0
            sep_len_md = len(FT.BLOCK_SEPARATOR)
            for t in blocks:
                if parts:
                    off += sep_len_md
                parts.append(t)
                ss.append(off)
                se.append(off + len(t))
                off += len(t)
            texts[i] = normalize_text(FT.BLOCK_SEPARATOR.join(parts))
            span_starts[i] = ss
            span_ends[i] = se
            branch[i] = "text"
            n_total[i] = len(blocks)
            n_acc[i] = len(blocks)

    if html_docs:
        pool = pool_html_blocks(html_docs)
        # scatter-merge back by original index: per-doc assembly in block
        # order (pool rows are already (doc, block)-ordered)
        bounds = np.flatnonzero(np.diff(pool.doc_idx, prepend=-1)) if len(pool.doc_idx) else np.array([], dtype=np.int64)
        starts = list(bounds) + [len(pool.doc_idx)]
        sep_len = len(FT.BLOCK_SEPARATOR)
        for s_i in range(len(starts) - 1):
            lo, hi = starts[s_i], starts[s_i + 1]
            doc_i = int(pool.doc_idx[lo])
            acc = pool.accepted[lo:hi]
            parts = []
            ss, se = [], []
            off = 0
            for j in range(lo, hi):
                if not pool.accepted[j]:
                    continue
                if parts:
                    off += sep_len
                t = pool.texts[j]
                parts.append(t)
                ss.append(off)
                se.append(off + len(t))
                off += len(t)
            texts[doc_i] = normalize_text(FT.BLOCK_SEPARATOR.join(parts))
            span_starts[doc_i] = ss
            span_ends[doc_i] = se
            branch[doc_i] = "html"
            n_total[doc_i] = hi - lo
            n_acc[doc_i] = int(acc.sum())
        # html docs with zero blocks still belong to the html branch
        pooled_docs = set(int(d) for d in np.unique(pool.doc_idx))
        for doc_i, _ in html_docs:
            if doc_i not in pooled_docs:
                branch[doc_i] = "html"

    return pd.DataFrame(
        {
            "extracted_text": texts,
            "branch": branch,
            "n_chars": np.fromiter((len(t) for t in texts), np.int64, n),
            "n_blocks_total": n_total,
            "n_blocks_accepted": n_acc,
            "span_starts": span_starts,
            "span_ends": span_ends,
            "truncated": truncated,
        }
    )
