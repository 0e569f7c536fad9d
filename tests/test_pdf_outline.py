"""PDF outline (bookmark tree) writer↔parser roundtrip (r7):
PDF 32000 §12.3.3 sibling/child chains, §7.9.2.2 title encodings,
malformed-tree robustness."""

from __future__ import annotations

from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
    extract_pdf_outline,
    make_pdf_bytes,
    parse_real_pdf,
)


def _spans(n_pages: int = 3) -> list[dict]:
    return [
        {"page": p, "x0": 40.0, "y0": 90.0 + p, "x1": 200.0,
         "y1": 102.0 + p, "text": f"page {p} body"}
        for p in range(n_pages)
    ]


OUTLINE = [
    {"title": "Intro", "page": 0, "level": 0},
    {"title": "Background", "page": 0, "level": 1},
    {"title": "Méthodes 中文", "page": 1, "level": 1},
    {"title": "Deep (sub) title", "page": 1, "level": 2},
    {"title": "Results", "page": 2, "level": 0},
]


def test_roundtrip_preorder_levels_pages():
    blob = make_pdf_bytes(_spans(), outline=OUTLINE, compress=True)
    got = extract_pdf_outline(blob)
    assert [i["title"] for i in got] == [o["title"] for o in OUTLINE]
    assert [i["level"] for i in got] == [0, 1, 1, 2, 0]
    assert [i["page"] for i in got] == [0, 0, 1, 1, 2]
    assert [i["idx"] for i in got] == list(range(5))


def test_no_outline_returns_none():
    assert extract_pdf_outline(make_pdf_bytes(_spans())) is None


def test_text_extraction_unaffected_by_outline():
    with_o = make_pdf_bytes(_spans(), outline=OUTLINE)
    without = make_pdf_bytes(_spans())
    a = parse_real_pdf(with_o)
    b = parse_real_pdf(without)
    assert a is not None and b is not None
    assert [s["text"] for s in a[1]] == [s["text"] for s in b[1]]


def test_utf16_title_roundtrips_nonascii():
    o = [{"title": "日本語 — café", "page": 0,
          "level": 0}]
    got = extract_pdf_outline(make_pdf_bytes(_spans(1), outline=o))
    assert got[0]["title"] == "日本語 — café"


def test_title_with_nested_parens_and_backslash():
    o = [{"title": r"A (nested (deep)) \ title", "page": 0, "level": 0}]
    got = extract_pdf_outline(make_pdf_bytes(_spans(1), outline=o))
    assert got[0]["title"] == r"A (nested (deep)) \ title"


def test_cycle_in_next_chain_terminates():
    blob = make_pdf_bytes(_spans(), outline=OUTLINE)
    # find the first outline item object and point its /Next at itself:
    # the walker's visited set must break the loop, not hang or dup
    import re

    m = re.search(rb"(\d+) 0 obj\n<< /Title \(Intro\)", blob)
    assert m is not None
    num = m.group(1)
    patched = blob.replace(
        b"<< /Title (Intro)",
        b"<< /Next " + num + b" 0 R /Title (Intro)",
        1,
    )
    got = extract_pdf_outline(patched)
    assert got is not None
    assert sum(1 for i in got if i["title"] == "Intro") == 1


def test_dangling_dest_page_is_minus_one():
    blob = make_pdf_bytes(_spans(1), outline=[
        {"title": "x", "page": 0, "level": 0},
    ])
    # retarget the /Dest at an object number that is not a page
    patched = blob.replace(b"/Dest [4 0 R /Fit]", b"/Dest [99 0 R /Fit]")
    assert patched != blob
    got = extract_pdf_outline(patched)
    assert got[0]["page"] == -1


def test_outline_rejected_with_encrypt():
    import pytest

    with pytest.raises(ValueError):
        make_pdf_bytes(_spans(1), outline=OUTLINE[:1], encrypt=True)


def test_levels_that_skip_depths_nest_under_last_shallower():
    o = [
        {"title": "top", "page": 0, "level": 0},
        {"title": "jump", "page": 0, "level": 3},  # still a child of top
        {"title": "back", "page": 0, "level": 1},
    ]
    got = extract_pdf_outline(make_pdf_bytes(_spans(1), outline=o))
    assert [i["title"] for i in got] == ["top", "jump", "back"]
    assert got[0]["level"] == 0
    assert got[1]["level"] == 1  # tree depth, not the declared number
    assert got[2]["level"] == 1
