"""Tier-1/2 parity: vectorized batch kernel vs scalar reference extractor.

The engine's core correctness contract (analogue of
baseline_generation_matches_reference, tests/baseline.rs:479-708): the
production numpy path must be BYTE-IDENTICAL to the golden scalar path —
final text (tier 1) AND per-block features/scores/accept masks (tier 2,
bisection — tests/baseline.rs:249-477) with EXACT float equality, no
tolerance bands (we control both sides, unlike the reference's
Rust-vs-PyTorch comparison)."""

from __future__ import annotations

import numpy as np

from deepseek_ocr_api_rs_spark.extraction import charset as CS
from deepseek_ocr_api_rs_spark.extraction.batch import extract_batch, pool_html_blocks
from deepseek_ocr_api_rs_spark.extraction.reference import extract_document


def test_doc_level_byte_parity(corpus_pdf):
    payloads = list(corpus_pdf.html)
    bat = extract_batch(payloads)
    for i, payload in enumerate(payloads):
        ref = extract_document(payload)
        assert bat.branch[i] == ref.branch, i
        assert bat.extracted_text[i] == ref.extracted_text, i
        assert bat.n_chars[i] == ref.n_chars, i
        assert bat.n_blocks_total[i] == ref.n_blocks_total, i
        assert bat.n_blocks_accepted[i] == ref.n_blocks_accepted, i
        assert list(bat.span_starts[i]) == ref.span_starts, i
        assert list(bat.span_ends[i]) == ref.span_ends, i
        assert bool(bat.truncated[i]) == ref.truncated, i


def test_block_level_exact_float_parity(corpus_pdf):
    html_docs = []
    refs = {}
    for i, payload in enumerate(corpus_pdf.html[:120]):
        ref = extract_document(payload)
        if ref.branch == "html":
            # v12: html-branch payloads may be in a declared legacy
            # charset — decode through the same sniff the router uses
            decoded, _codec = CS.sniff_decode(bytes(payload))
            html_docs.append((i, decoded))
            refs[i] = ref
    pool = pool_html_blocks(html_docs)
    for doc_i, ref in refs.items():
        sel = pool.doc_idx == doc_i
        feats = pool.features[sel]
        scores = pool.scores[sel]
        accepted = pool.accepted[sel]
        assert feats.shape[0] == len(ref.blocks)
        for r, trace in enumerate(ref.blocks):
            # EXACT equality — bit-identical arithmetic, the P1/P2 rounding
            # discipline. Any np.isclose here would hide reassociation bugs.
            assert feats[r].tolist() == trace.features, (doc_i, r)
            assert scores[r] == trace.score, (doc_i, r)
            assert bool(accepted[r]) == trace.accepted, (doc_i, r)


def test_empty_and_edge_batches():
    out = extract_batch([])
    assert len(out) == 0
    out = extract_batch([None, b"", b"<p>hi</p>", b"# just markdown"])
    # r7 router: tagless strict-UTF-8 (even empty) → the text
    # passthrough branch; markup → html
    assert list(out.branch) == ["error", "text", "html", "text"]
    assert out.extracted_text[3] == "just markdown"


def test_batch_split_invariance(corpus_pdf):
    """Batch boundaries must not affect results (Arrow batch purity —
    the prompt-scoped state-reset guarantee, crates/core/src/cache.rs:366-401)."""
    payloads = list(corpus_pdf.html[:60])
    whole = extract_batch(payloads)
    parts = [extract_batch(payloads[i : i + 7]) for i in range(0, 60, 7)]
    stitched = np.concatenate([p.extracted_text.values for p in parts])
    assert list(whole.extracted_text.values) == list(stitched)
