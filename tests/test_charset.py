"""Declaration-driven charset sniff (extraction/charset.py, r7).

WHATWG BOM + meta-prescan subset: declared encodings decode strictly,
anything undeclared or lying stays undecodable — never mojibake.
"""

from __future__ import annotations

from deepseek_ocr_api_rs_spark.extraction import charset as CS
from deepseek_ocr_api_rs_spark.extraction import features as FT
from deepseek_ocr_api_rs_spark.extraction.reference import extract_document


def test_bom_priority_and_strip():
    assert CS.sniff_decode("﻿hi".encode("utf-8")) == ("hi", "utf-8")
    assert CS.sniff_decode("﻿hi".encode("utf-16-le")) == (
        "hi", "utf-16-le"
    )
    assert CS.sniff_decode("﻿hi".encode("utf-16-be")) == (
        "hi", "utf-16-be"
    )


def test_lying_bom_is_undecodable_not_guessed():
    # utf-16 BOM followed by an ODD number of bytes cannot be utf-16;
    # there is no fallback past a BOM
    assert CS.sniff_decode(b"\xff\xfeabc") is None
    # utf-8 BOM followed by invalid utf-8
    assert CS.sniff_decode(b"\xef\xbb\xbf\xff\xfe\xff") is None


def test_meta_prescan_both_forms_and_label_aliases():
    body = "Café déjà vu".encode("cp1252")
    http = (
        b'<html><head><meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1252"></head><body>'
        + body
    )
    meta = b'<html><head><meta charset=ISO-8859-1></head><body>' + body
    for payload in (http, meta):
        got = CS.sniff_decode(payload)
        assert got is not None and got[1] == "cp1252"
        assert "Café déjà vu" in got[0]
    # per WHATWG, latin1/ascii labels all map to windows-1252
    assert CS.declared_codec(b'<meta charset="latin1">') == "cp1252"
    assert CS.declared_codec(b'<meta charset="us-ascii">') == "cp1252"
    # and a meta-declared utf-16 is processed as utf-8
    assert CS.declared_codec(b'<meta charset="utf-16">') == "utf-8"


def test_multibyte_legacy_codecs_decode():
    jp = "これは日本語です。"
    sj = b'<html><head><meta charset="Shift_JIS"></head><body><p>' + \
        jp.encode("shift_jis") + b"</p>"
    got = CS.sniff_decode(sj)
    assert got is not None and got[1] == "shift_jis" and jp in got[0]
    ko = "한국어 문장"
    kr = b'<html><meta charset="EUC-KR"><p>' + ko.encode("euc_kr") + b"</p>"
    got = CS.sniff_decode(kr)
    assert got is not None and got[1] == "euc_kr" and ko in got[0]


def test_no_declaration_means_undecodable():
    # valid cp1252, no meta, not valid utf-8: stays None (no
    # windows-1252 fallback-of-last-resort)
    assert CS.sniff_decode("café".encode("cp1252")) is None
    assert CS.sniff_decode(bytes(range(128, 192))) is None


def test_declaration_must_match_the_bytes():
    # declares Shift_JIS but carries a lone 0x80 continuation: strict
    # decode fails -> undecodable, never re-guessed
    bad = b'<meta charset="shift_jis">\x80\x80\x80ab'
    assert CS.sniff_decode(bad) is None
    # a failed utf-8 payload whose declaration ALSO says utf-8 is done
    assert CS.sniff_decode(b'<meta charset="utf-8">\xff\xff') is None


def test_prescan_window_is_bounded():
    # a declaration past the first 1024 bytes is not honored (HTML
    # prescan contract) -> undecodable
    pad = b"<!-- " + b"x" * 1100 + b" -->"
    late = pad + b'<meta charset="windows-1252">' + b"caf\xe9"
    assert CS.sniff_decode(late) is None


def test_legacy_error_fixture_stays_error():
    """The corpus error slice opens with \\xff\\xfe (a utf-16le BOM) over
    an odd-length body — it must keep routing to the error branch after
    the sniff landed."""
    doc = b"\xff\xfe<html><body>truncated" + bytes(
        [b | 0x80 for b in range(16)]
    )
    assert CS.sniff_decode(doc) is None
    assert extract_document(doc).branch == "error"


def test_route_decode_fast_path_matches_old_semantics():
    """BOM-less strict-UTF-8 payloads take the historical
    truncate-then-decode path byte-for-byte (incl. the truncation flag
    at the 1 MiB cap)."""
    small = "<p>plain utf-8 page</p>".encode("utf-8")
    assert CS.route_decode(small, FT.truncate_payload) == (
        small.decode("utf-8"), False
    )
    big = ("<p>" + "word " * 300_000 + "</p>").encode("utf-8")
    cut, trunc = FT.truncate_payload(big)
    got = CS.route_decode(big, FT.truncate_payload)
    assert got == (cut.decode("utf-8"), True) and trunc


def test_route_decode_truncates_after_decode_for_legacy():
    """A big declared-Shift_JIS page must decode FIRST, then truncate at
    the UTF-8 cap — cutting the raw legacy bytes first could split a
    multibyte sequence and bounce a valid page to error."""
    jp_para = ("あ" * 1000 + " ") * 800  # ~2.4 MB as utf-8
    payload = (
        '<html><head><meta charset="Shift_JIS"></head><body><p>'
        + jp_para
    ).encode("shift_jis")
    got = CS.route_decode(payload, FT.truncate_payload)
    assert got is not None
    text, truncated = got
    assert truncated
    assert len(text.encode("utf-8")) <= FT.MAX_DOC_BYTES
    assert text.endswith("あ") or text.endswith(" ")


def test_extraction_branches_for_declared_charsets():
    fr = (
        '<html><head><meta http-equiv="Content-Type" content='
        '"text/html; charset=windows-1252"></head><body><p>'
        "Voilà une phrase assez longue pour former un bloc de "
        "contenu acceptable dans le document extrait.</p></body></html>"
    ).encode("cp1252")
    r = extract_document(fr)
    assert r.branch == "html" and "Voilà" in r.extracted_text
    u16 = (
        "﻿<html><body><p>A BOM-declared UTF-16 page with enough "
        "paragraph text to be accepted as content.</p></body></html>"
    ).encode("utf-16-le")
    r2 = extract_document(u16)
    assert r2.branch == "html" and "BOM-declared" in r2.extracted_text
