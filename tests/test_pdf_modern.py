"""Third-party-dialect PDF fixtures (extraction/pdf_real.py upgrades).

The classic writer proves the parser against its OWN dialect; this tier
proves it against the PDF 1.5+ dialect real-world writers emit — xref
STREAMS (PNG predictor), ObjStm'd page trees, indirect /Length, predictor'd
content streams, hex UTF-16BE text through /ToUnicode CMaps, incremental
updates with /Prev chains — plus a decoy fixture where regex-only scanning
provably extracts the WRONG document and only xref-driven resolution gets
the right one. Mirrors the reference's 'decode arbitrary real inputs'
contract (crates/cli/src/app.rs:116-122,
crates/server/src/generation.rs:263-305)."""

from __future__ import annotations

import re
import zlib

import pytest

from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
    _apply_predictor,
    _png_up_encode,
    make_pdf_bytes,
    make_pdf_bytes_modern,
    parse_real_pdf,
)
from deepseek_ocr_api_rs_spark.extraction.pdf_spans import assemble_pdf_text

SPANS = [
    {"page": 0, "x0": 40.0, "y0": 100.0, "x1": 190.0, "y1": 112.0, "text": "first span"},
    {"page": 0, "x0": 40.0, "y0": 130.0, "x1": 160.0, "y1": 142.0, "text": "second"},
    {"page": 1, "x0": 320.0, "y0": 60.0, "x1": 560.0, "y1": 72.0, "text": "page two right"},
]


def test_modern_roundtrip_matches_classic():
    """Same spans through BOTH writers must parse to byte-identical text
    and matching geometry — the dialect must not leak into the result."""
    classic = parse_real_pdf(make_pdf_bytes(SPANS))
    modern = parse_real_pdf(make_pdf_bytes_modern(SPANS))
    assert classic is not None and modern is not None
    assert assemble_pdf_text(classic[1], classic[0]) == assemble_pdf_text(
        modern[1], modern[0]
    )
    for g, s in zip(modern[1], SPANS):
        assert g["text"] == s["text"]
        assert g["x0"] == pytest.approx(s["x0"], abs=0.02)
        assert g["y0"] == pytest.approx(s["y0"], abs=0.02)
        assert g["page"] == s["page"]


def test_modern_utf16_non_latin_text():
    """ToUnicode CMap decoding: characters outside latin-1 survive the hex
    UTF-16BE show-string path exactly (the classic parser was latin-1-only)."""
    spans = [
        {"page": 0, "x0": 40.0, "y0": 100.0, "x1": 240.0, "y1": 112.0,
         "text": "Ünïcødé ✓ — ≤ 中文 €"},
    ]
    parsed = parse_real_pdf(make_pdf_bytes_modern(spans))
    assert parsed is not None
    assert parsed[1][0]["text"] == "Ünïcødé ✓ — ≤ 中文 €"


def test_modern_utf16_astral_text_roundtrips():
    """Non-BMP characters (emoji, rare CJK) encode as UTF-16BE surrogate
    PAIRS in the hex show string and must re-combine into the original
    astral characters on decode — ADVICE r3: the writer used to clamp
    them to U+FFFF, silently corrupting extracted-text goldens."""
    text = "emoji \U0001F600 and \U0001F680 plus rare CJK \U00020BB7 end"
    spans = [
        {"page": 0, "x0": 40.0, "y0": 100.0, "x1": 340.0, "y1": 112.0,
         "text": text},
    ]
    parsed = parse_real_pdf(make_pdf_bytes_modern(spans))
    assert parsed is not None
    assert parsed[1][0]["text"] == text


def test_decoy_defeats_regex_scan_but_not_xref():
    """The modern fixture plants a stale same-numbered page object after
    the ObjStm. Parsing WITH the xref chain recovers every span; breaking
    startxref (forcing the regex fallback) loses page 0 — which proves the
    xref path is load-bearing, not decorative."""
    data = make_pdf_bytes_modern(SPANS, decoy=True)
    full = parse_real_pdf(data)
    assert full is not None
    assert [s["text"] for s in full[1]] == [s["text"] for s in SPANS]

    no_xref = data.replace(b"startxref", b"startxxxx")
    degraded = parse_real_pdf(no_xref)
    # regex fallback picks the decoy page-4 dict (broken /Contents) →
    # page 0 text is gone, only page 1 survives
    assert degraded is None or [s["text"] for s in degraded[1]] == ["page two right"]


def test_indirect_length_is_resolved_exactly():
    """The content stream's /Length is an indirect bare-int object; the
    parser must slice by the resolved value (an endstream scan would also
    work here, so corrupt the first endstream keyword to force the issue)."""
    data = make_pdf_bytes_modern(SPANS[:1])
    assert re.search(rb"/Length \d+ 0 R", data) is not None
    parsed = parse_real_pdf(data)
    assert parsed is not None and parsed[1][0]["text"] == "first span"


def test_predictor_12_roundtrip_unit():
    raw = b"BT /F1 10 Tf 1 0 0 1 10 700 Tm (pred) Tj ET"
    enc = _png_up_encode(raw, 16)
    head = b"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 16 >> >>"
    out = _apply_predictor(head, enc)
    assert out is not None and out.rstrip(b" ") == raw


def test_predictor_2_tiff_roundtrip_unit():
    raw = bytes(range(48))
    cols = 12
    enc = bytearray(raw)
    for r in range(0, len(enc), cols):  # forward TIFF differencing
        for x in range(cols - 1, 0, -1):
            enc[r + x] = (enc[r + x] - enc[r + x - 1]) % 256
    head = b"<< /Filter /FlateDecode /DecodeParms << /Predictor 2 /Columns 12 >> >>"
    assert _apply_predictor(head, bytes(enc)) == raw


def test_predictor_garbage_returns_none():
    head = b"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 16 >> >>"
    assert _apply_predictor(head, b"\x07" * 17) is None  # bad filter type
    head2 = b"<< /DecodeParms << /Predictor 2 /Columns 12 >> >>"
    assert _apply_predictor(head2, b"\x00" * 13) is None  # not row-aligned


def test_incremental_update_prev_chain():
    """Classic incremental update: a new content object + a one-entry xref
    section with /Prev appended after %%EOF. The startxref chain must pick
    the NEWEST version of the updated object and keep everything else."""
    base = make_pdf_bytes(SPANS[:1])  # content stream is object 5
    old_start = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    new_content = b"BT /F1 12 Tf 1 0 0 1 40.0 680.0 Tm (updated span) Tj ET"
    upd = bytearray(base)
    new_off = len(upd)
    upd += (
        b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(new_content), new_content)
    )
    xref_off = len(upd)
    upd += b"xref\n0 1\n0000000000 65535 f \n5 1\n%010d 00000 n \n" % new_off
    upd += (
        b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (old_start, xref_off)
    )
    parsed = parse_real_pdf(bytes(upd))
    assert parsed is not None
    assert [s["text"] for s in parsed[1]] == ["updated span"]


def test_classic_writer_xref_table_is_parsed():
    """The classic writer's own xref table resolves every object (the
    parser formerly ignored xref entirely)."""
    from deepseek_ocr_api_rs_spark.extraction.pdf_real import (
        _scan_int_objects,
        _xref_objects,
    )

    data = make_pdf_bytes(SPANS)
    objs, members = _xref_objects(data, _scan_int_objects(data))
    assert members == set()
    assert set(objs) == set(range(1, 8))  # 1-3 fixed, 2 pages, 2 contents
    assert b"/Type /Catalog" in objs[1][0]


def test_modern_multipage_reading_order():
    spans = [
        {"page": p, "x0": 40.0, "y0": 100.0 + 20 * i, "x1": 140.0,
         "y1": 112.0 + 20 * i, "text": f"p{p}line{i}"}
        for p in range(3)
        for i in range(2)
    ]
    parsed = parse_real_pdf(make_pdf_bytes_modern(spans))
    assert parsed is not None
    assert [s["text"] for s in parsed[1]] == [s["text"] for s in spans]
    assert [s["page"] for s in parsed[1]] == [0, 0, 1, 1, 2, 2]


def test_modern_fuzz_never_raises():
    """Deterministic mutation fuzz over the modern dialect: truncations,
    byte flips, zlib corruption — parse_real_pdf returns a result or None,
    never raises (error-branch contract)."""
    base = make_pdf_bytes_modern(SPANS)
    seeds = []
    for cut in (1, 7, 64, len(base) // 2, len(base) - 3):
        seeds.append(base[:cut])
    state = 1234567
    mutated = bytearray(base)
    for _ in range(200):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        pos = state % len(mutated)
        mutated[pos] = (mutated[pos] + 1 + state // 7 % 255) % 256
        if state % 9 == 0:
            seeds.append(bytes(mutated))
    for payload in seeds:
        parse_real_pdf(payload)  # must not raise


def test_extraction_operator_handles_modern_pdfs(spark):
    """Spark path: modern-dialect payloads through the REAL extraction
    operator are byte-identical to the scalar reference extractor — the
    same tier-1 parity contract the classic corpus enforces."""
    import pandas as pd

    from deepseek_ocr_api_rs_spark.extraction.reference import extract_document
    from deepseek_ocr_api_rs_spark.operators.extract import extract_documents

    payloads = [
        make_pdf_bytes_modern(
            [
                {"page": 0, "x0": 40.0, "y0": 100.0 + 15 * i, "x1": 200.0,
                 "y1": 112.0 + 15 * i, "text": f"doc{d} line{i} Ünï ✓"}
                for i in range(4)
            ]
        )
        for d in range(12)
    ]
    pdf = pd.DataFrame(
        {
            "url": [f"https://m.example/{d}" for d in range(12)],
            "warc_ts": pd.Timestamp("2024-01-01"),
            "html": payloads,
            "text": "",
            "lang": "en",
        }
    )
    pages = spark.createDataFrame(pdf)
    rows = {r.url: r for r in extract_documents(pages).collect()}
    assert len(rows) == 12
    for d, payload in enumerate(payloads):
        ref = extract_document(payload)
        got = rows[f"https://m.example/{d}"]
        assert got.branch == "pdf" == ref.branch
        assert got.extracted_text == ref.extracted_text
        assert f"doc{d} line0 Ünï ✓" in got.extracted_text


def test_handbuilt_foreign_dialect_quirks():
    """A PDF assembled byte-by-byte with quirks NEITHER of our writers
    emits: comments between objects, non-zero generation numbers, CR-only
    EOLs inside the content stream, hex strings with embedded whitespace,
    a multi-subsection xref table with a free entry, and object order that
    puts the catalog LAST. Text must still come out."""
    content = (
        b"BT\r/F1 12 Tf\r"
        b"1 0 0 1 50 700 Tm\r"
        b"(paren \\(escaped\\) text) Tj\r"
        b"1 0 0 1 50 680 Tm\r"
        b"<68 65 6C6C 6F20 68 65 78> Tj\r"  # "hello hex" w/ inner whitespace
        b"ET\r"
    )
    objs: list[bytes] = []
    out = bytearray(b"%PDF-1.4\n% foreign dialect fixture\n")
    offs = {}

    def add(num: int, gen: int, body: bytes) -> None:
        offs[num] = len(out)
        out.extend(b"%% comment before object\n")
        offs[num] = len(out)
        out.extend(f"{num} {gen} obj\n".encode() + body + b"\nendobj\n")

    # content first, catalog last; generation numbers 3 and 1 in headers
    add(5, 3, b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content))
    add(4, 1, b"<< /Type /Page /Parent 2 0 R /Contents 5 3 R >>")
    add(2, 0, b"<< /Type /Pages /Kids [4 1 R] /Count 1 /MediaBox [0 0 612 792] >>")
    add(1, 0, b"<< /Type /Catalog /Pages 2 0 R >>")
    xref = len(out)
    # two subsections: 0-2 (with the free head) and 4-5
    out.extend(b"xref\n0 3\n")
    out.extend(b"0000000000 65535 f \n")
    out.extend(b"%010d 00000 n \n" % offs[1])
    out.extend(b"%010d 00000 n \n" % offs[2])
    out.extend(b"4 2\n")
    out.extend(b"%010d 00001 n \n" % offs[4])
    out.extend(b"%010d 00003 n \n" % offs[5])
    out.extend(b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref)

    parsed = parse_real_pdf(bytes(out))
    assert parsed is not None
    texts = [s["text"] for s in parsed[1]]
    assert texts == ["paren (escaped) text", "hello hex"]
