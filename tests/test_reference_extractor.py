"""Tier-3 unit tests on the scalar reference extractor (SURVEY.md §5-3:
operator unit tests, no Spark needed — pattern of
crates/infer-deepseek/tests/baseline.rs:98-150)."""

from __future__ import annotations

import json

from deepseek_ocr_api_rs_spark.extraction import features as FT
from deepseek_ocr_api_rs_spark.extraction.html_blocks import segment_html
from deepseek_ocr_api_rs_spark.extraction.normalize import END_SENTINEL, normalize_text
from deepseek_ocr_api_rs_spark.extraction.pdf_spans import (
    assemble_pdf_text,
    detect_columns,
    ordered_spans,
)
from deepseek_ocr_api_rs_spark.extraction.reference import (
    extract_document,
    extract_html,
)


def test_normalize_text():
    assert normalize_text("a\r\nb\rc\n") == "a\nb\nc"
    assert normalize_text("  x  " + END_SENTINEL) == "x"
    assert normalize_text("x" + END_SENTINEL) == "x"
    # reference uses str::replace — ALL occurrences go, not just a suffix
    assert normalize_text(f"a{END_SENTINEL}b{END_SENTINEL}") == "ab"


def test_segment_skips_script_style():
    html = "<html><head><script>var x=1;</script><style>p{}</style></head><body><p>real text here</p></body></html>"
    blocks = segment_html(html)
    texts = [b.text for b in blocks]
    assert texts == ["real text here"]


def test_link_density_counted():
    html = '<body><p>word <a href="/x">link text</a> tail</p></body>'
    (b,) = segment_html(html)
    assert b.n_link_chars == len("link text")
    assert b.n_text_chars == len("word link text tail")


def test_boiler_context_flag():
    html = "<body><nav><li>home</li></nav><p>content</p></body>"
    blocks = segment_html(html)
    by_text = {b.text: b for b in blocks}
    assert by_text["home"].boiler == 1
    assert by_text["content"].boiler == 0


def test_main_content_accepted_nav_rejected():
    html = (
        "<body><nav><ul>"
        + "".join(f'<li><a href="/{w}">{w}</a></li>' for w in ["home", "about", "contact", "login"])
        + "</ul></nav>"
        "<main><p>The quick brown fox jumps over the lazy dog and keeps "
        "running through the long meadow, because it is being chased.</p></main>"
        "<footer><a href='/terms'>terms</a> <a href='/privacy'>privacy</a></footer></body>"
    )
    res = extract_html(html)
    assert "quick brown fox" in res.extracted_text
    assert "home" not in res.extracted_text
    assert "privacy" not in res.extracted_text


def test_heading_promotion():
    html = (
        "<body><h2>Short Title</h2>"
        "<p>The quick brown fox jumps over the lazy dog and keeps running "
        "through the long meadow, because it is being chased by the farmer.</p></body>"
    )
    res = extract_html(html)
    assert res.extracted_text.startswith("Short Title")


def test_blocks_invariants():
    """FIXTURES.md §3 invariants: sum(accepted)==n_blocks_accepted and
    accepted-text concat == extracted_text."""
    from deepseek_ocr_api_rs_spark.fixtures.corpus import make_documents

    docs = make_documents(50)
    for payload in docs.html:
        res = extract_document(payload)
        if res.branch != "html":
            continue
        assert sum(t.accepted for t in res.blocks) == res.n_blocks_accepted
        joined = normalize_text(
            FT.BLOCK_SEPARATOR.join(t.block_text for t in res.blocks if t.accepted)
        )
        assert joined == res.extracted_text
        assert len(res.blocks) == res.n_blocks_total


def test_error_branch():
    assert extract_document(b"\xff\xfe\x80garbage\x80").branch == "error"
    assert extract_document(None).branch == "error"


def test_pdf_column_detection():
    centers = [50.0, 55.0, 60.0, 350.0, 355.0]
    bounds = detect_columns(centers, 612.0)
    assert len(bounds) == 1
    assert 60.0 < bounds[0] < 350.0


def test_pdf_reading_order_two_columns():
    # two columns; spans supplied out of order with y-jitter inside Y_QUANTUM
    spans = [
        {"page": 0, "x0": 320.0, "y0": 40.3, "x1": 580.0, "y1": 52.0, "text": "C1"},
        {"page": 0, "x0": 20.0, "y0": 54.0, "x1": 280.0, "y1": 66.0, "text": "A2"},
        {"page": 0, "x0": 20.0, "y0": 40.9, "x1": 280.0, "y1": 52.0, "text": "A1"},
        {"page": 0, "x0": 320.0, "y0": 54.8, "x1": 580.0, "y1": 66.0, "text": "C2"},
    ]
    order = [spans[i]["text"] for i, *_ in ordered_spans(spans, 612.0)]
    assert order == ["A1", "A2", "C1", "C2"]
    text = assemble_pdf_text(spans, 612.0)
    assert text == "A1\nA2\n\nC1\nC2"


def test_pdf_branch_end_to_end():
    payload = b"%PDF-1.7\n" + json.dumps(
        {
            "width": 612.0,
            "spans": [
                {"page": 0, "x0": 20.0, "y0": 40.0, "x1": 300.0, "y1": 52.0, "text": "hello"},
                {"page": 0, "x0": 120.0, "y0": 40.5, "x1": 300.0, "y1": 52.0, "text": "world"},
            ],
        }
    ).encode()
    res = extract_document(payload)
    assert res.branch == "pdf"
    assert res.extracted_text == "hello world"


def test_determinism_repeat():
    from deepseek_ocr_api_rs_spark.fixtures.corpus import make_documents

    a = make_documents(20)
    b = make_documents(20)
    assert list(a.url) == list(b.url)
    for x, y in zip(a.html, b.html):
        assert x == y
    ra = [extract_document(p).extracted_text for p in a.html]
    rb = [extract_document(p).extracted_text for p in b.html]
    assert ra == rb


def test_spans_are_exact_provenance():
    """T2 provenance invariant: extracted_text[start:end] == block text for
    every span, in document order."""
    from deepseek_ocr_api_rs_spark.fixtures.corpus import make_documents

    docs = make_documents(60)
    for payload in docs.html:
        res = extract_document(payload)
        if res.branch != "html":
            continue
        accepted = [t for t in res.blocks if t.accepted]
        assert len(accepted) == len(res.span_starts)
        for t, s0, s1, bi in zip(
            accepted, res.span_starts, res.span_ends, res.span_block_idx
        ):
            assert res.extracted_text[s0:s1] == t.block_text
            assert bi == t.block_idx


def test_truncation_cap_applied():
    """P5 bounded-work cap: oversized docs are truncated at a UTF-8
    boundary and flagged — never silently."""
    from deepseek_ocr_api_rs_spark.extraction import features as FT

    big = ("<p>" + "word " * 200 + "</p>") * 2000  # ~2.2 MB
    payload = big.encode("utf-8")
    assert len(payload) > FT.MAX_DOC_BYTES
    res = extract_document(payload)
    assert res.branch == "html"
    assert res.truncated is True
    assert len(res.extracted_text) > 0
    # multi-byte boundary: payload cut mid-codepoint must still decode
    big_zh = ("<p>" + "数据处理" * 50 + "</p>") * 3000
    res2 = extract_document(big_zh.encode("utf-8"))
    assert res2.branch == "html" and res2.truncated is True

    small = extract_document(b"<p>tiny</p>")
    assert small.truncated is False
