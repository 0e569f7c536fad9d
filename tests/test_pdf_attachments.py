"""PDF embedded files (§7.11) writer↔parser roundtrip (r7): name-tree
order, both string encodings, filters, /Kids recursion, composition
with outlines, malformed tolerance."""

from __future__ import annotations

import re

import pytest

from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
    extract_pdf_attachments,
    extract_pdf_outline,
    make_pdf_bytes,
    parse_real_pdf,
)

SPANS = [
    {"page": 0, "x0": 40.0, "y0": 90.0, "x1": 200.0, "y1": 102.0,
     "text": "hello body"},
]
ATTS = [
    {"name": "data (v2).csv", "data": b"a,b\n1,2\n" * 10,
     "mime": "text/csv", "desc": "tabular"},
    {"name": "notes.txt", "data": b"plain \xffbytes",
     "mime": "text/plain"},
    {"name": "日本.json", "data": b'{"k":1}',
     "mime": "application/json"},
]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_names_mimes_payloads(compress):
    blob = make_pdf_bytes(SPANS, attachments=ATTS, compress=compress)
    got = extract_pdf_attachments(blob)
    by = {g["name"]: g for g in got}
    assert by["data (v2).csv"]["data"] == b"a,b\n1,2\n" * 10
    assert by["data (v2).csv"]["mime"] == "text/csv"
    assert by["notes.txt"]["data"] == b"plain \xffbytes"
    assert by["日本.json"]["mime"] == "application/json"
    # name-tree (sorted-key) order, idx follows it
    assert [g["name"] for g in got] == sorted(g["name"] for g in got)
    assert [g["idx"] for g in got] == list(range(len(got)))
    assert all(g["size"] == len(g["data"]) for g in got)


def test_page_text_unaffected_and_composes_with_outline():
    blob = make_pdf_bytes(
        SPANS,
        attachments=ATTS[:1],
        outline=[{"title": "T", "page": 0, "level": 0}],
    )
    assert extract_pdf_attachments(blob)[0]["name"] == "data (v2).csv"
    assert extract_pdf_outline(blob)[0]["title"] == "T"
    a = parse_real_pdf(blob)
    b = parse_real_pdf(make_pdf_bytes(SPANS))
    assert [s["text"] for s in a[1]] == [s["text"] for s in b[1]]


def test_no_attachments_returns_none():
    assert extract_pdf_attachments(make_pdf_bytes(SPANS)) is None


def test_xref_size_covers_every_object():
    blob = make_pdf_bytes(
        SPANS,
        attachments=ATTS[:1],
        outline=[{"title": "T", "page": 0, "level": 0}],
    )
    size = int(re.search(rb"trailer\n<< /Size (\d+)", blob).group(1))
    max_obj = max(
        int(x) for x in re.findall(rb"\n(\d+) 0 obj", b"\n" + blob)
    )
    assert size == max_obj + 1


def test_kids_node_recursion_with_cycle_guard():
    blob = make_pdf_bytes(SPANS, attachments=ATTS[:2])
    # find the /Names node object and wrap it behind a /Kids node that
    # ALSO points back at itself: the walker must recurse once and stop
    m = re.search(rb"(\d+) 0 obj\n<< /Names \[", blob)
    node = int(m.group(1))
    patched = blob.replace(
        b"/EmbeddedFiles %d 0 R" % node,
        b"/EmbeddedFiles 90 0 R",
    ) + (
        b"90 0 obj\n<< /Kids [90 0 R %d 0 R] >>\nendobj\n" % node
    )
    got = extract_pdf_attachments(patched)
    assert got is not None
    assert [g["name"] for g in got] == ["data (v2).csv", "notes.txt"]


def test_attachments_rejected_with_encrypt():
    with pytest.raises(ValueError):
        make_pdf_bytes(SPANS, attachments=ATTS[:1], encrypt=True)


def test_dangling_filespec_and_stream_tolerated():
    blob = make_pdf_bytes(SPANS, attachments=ATTS[:2])
    # retarget one /EF stream ref at a missing object: entry skipped,
    # the other survives
    m = re.search(rb"/EF << /F (\d+) 0 R >>", blob)
    patched = blob.replace(
        b"/EF << /F %s 0 R >>" % m.group(1), b"/EF << /F 95 0 R >>", 1
    )
    got = extract_pdf_attachments(patched)
    assert got is not None and len(got) == 1
