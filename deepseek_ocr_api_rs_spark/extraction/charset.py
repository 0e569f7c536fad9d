"""Charset sniffing for non-UTF-8 pages (r7).

The reference accepts whatever bytes the client posts and lets the image
crate sort out the container (crates/server/src/generation.rs:276-305);
our document analogue is the page encoding. Real Common-Crawl HTML is
routinely windows-1252 / Shift_JIS / EUC-KR / GBK with the encoding
DECLARED (BOM or an HTML meta tag), so a strict-UTF-8-only router sends
extractable pages to the error branch. This module implements the
deterministic, declaration-driven subset of the WHATWG encoding sniff
(https://encoding.spec.whatwg.org/ + HTML §13.2.3.2 prescan — public
knowledge):

1. a BOM wins (UTF-8 / UTF-16LE / UTF-16BE) and is stripped; a payload
   whose BOM lies (strict decode fails) is UNDECODABLE, never guessed;
2. otherwise strict UTF-8 (the dominant real-web case, zero new cost on
   that path — callers keep their existing truncate-then-decode fast
   path and only reach this module on failure);
3. otherwise the meta prescan over the first 1024 bytes: a recognized
   label decodes STRICTLY under the mapped stdlib codec;
4. otherwise undecodable — there is NO windows-1252 fallback-of-last-
   resort: an undeclared binary payload must stay on the error branch,
   not turn into mojibake (the q_pdf CMap 'never mojibake' contract).
"""

from __future__ import annotations

import re

# WHATWG label → Python codec, the subset with real crawl hit rates.
# Per the spec, latin-1/ascii family labels all mean windows-1252, and
# a meta-declared utf-16 is processed as utf-8 (the prescan sees ASCII
# bytes, so a real utf-16 page can only get here via its BOM).
_LABELS: dict[str, str] = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin1": "cp1252",
    "latin-1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "l1": "cp1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15", "latin9": "iso8859-15",
    "windows-1250": "cp1250", "cp1250": "cp1250",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "koi8-r": "koi8-r", "koi8": "koi8-r",
    "windows-1254": "cp1254", "iso-8859-9": "cp1254", "latin5": "cp1254",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "x-sjis": "shift_jis", "sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc_jp", "x-euc-jp": "euc_jp",
    "gbk": "gbk", "gb2312": "gbk", "x-gbk": "gbk", "chinese": "gbk",
    "gb_2312": "gbk", "gb_2312-80": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "x-x-big5": "big5",
    "euc-kr": "euc_kr", "korean": "euc_kr", "ks_c_5601-1987": "euc_kr",
    "ksc_5601": "euc_kr", "windows-949": "euc_kr",
}

# HTML §13.2.3.2 prescan, regex form: any charset= inside a <meta ...>
# tag within the first 1024 bytes (covers both <meta charset=X> and
# <meta http-equiv="Content-Type" content="...; charset=X">).
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_][a-zA-Z0-9._\-]*)",
    re.IGNORECASE | re.DOTALL,
)

PRESCAN_BYTES = 1024


def bom_encoding(data: bytes) -> tuple[str, int] | None:
    """(codec, bom_length) when the payload opens with a BOM. UTF-8's
    three-byte form is checked first (its prefix is not a UTF-16 BOM);
    UTF-32 BOMs are out of scope like the rest of UTF-32."""
    if data[:3] == b"\xef\xbb\xbf":
        return ("utf-8", 3)
    if data[:2] == b"\xff\xfe":
        return ("utf-16-le", 2)
    if data[:2] == b"\xfe\xff":
        return ("utf-16-be", 2)
    return None


def declared_codec(data: bytes) -> str | None:
    """The meta-prescan codec for the payload, or None when no
    recognized declaration exists in the first 1024 bytes."""
    m = _META_CHARSET_RE.search(data[:PRESCAN_BYTES])
    if m is None:
        return None
    return _LABELS.get(m.group(1).decode("latin-1").lower())


def sniff_decode(data: bytes) -> tuple[str, str] | None:
    """Full declaration-driven decode: (text, codec) or None. Strict at
    every step — a declaration that does not match the bytes is
    undecodable, never silently re-guessed."""
    bom = bom_encoding(data)
    if bom is not None:
        codec, n = bom
        try:
            return data[n:].decode(codec), codec
        except UnicodeDecodeError:
            return None
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    codec = declared_codec(data)
    if codec is None or codec == "utf-8":
        return None  # no declaration, or a utf-8 claim that just failed
    try:
        return data.decode(codec), codec
    except (UnicodeDecodeError, LookupError):
        return None


def truncate_text(text: str, truncate_payload) -> tuple[str, bool]:
    """Apply the byte-cap contract to ALREADY-DECODED text: round-trip
    through UTF-8 so every branch truncates under the identical
    1 MiB UTF-8-safe rule (``truncate_payload`` is
    features.truncate_payload, passed in to avoid an import cycle)."""
    raw = text.encode("utf-8")
    cut, truncated = truncate_payload(raw)
    if not truncated:
        return text, False
    return cut.decode("utf-8"), True


def route_decode(data: bytes, truncate_payload) -> tuple[str, bool] | None:
    """The router's decode step, shared verbatim by the scalar reference
    extractor and the Arrow batch path (byte parity by construction):
    keep the historical truncate-then-strict-UTF-8 fast path for
    BOM-less payloads (zero new cost for the dominant case), fall back
    to the declaration-driven sniff, and re-apply the byte cap to the
    decoded text (decode-then-truncate is the only correct order for a
    multi-byte legacy codec — cutting Shift_JIS bytes mid-sequence
    before decoding would turn a big valid page into an error).
    Returns (text, truncated) or None for the error branch."""
    # Fast-path gate: a BOM can only start with EF/FF/FE, so one leading-
    # byte compare keeps the ~95% ASCII/UTF-8 slice on the historical
    # truncate-then-decode path with near-zero added cost (a false hit,
    # e.g. latin-1 'ï' bytes, just takes the full sniff — same result).
    if data[:1] not in (b"\xef", b"\xff", b"\xfe"):
        cut, trunc = truncate_payload(data)
        try:
            return cut.decode("utf-8"), trunc
        except UnicodeDecodeError:
            pass
    elif bom_encoding(data) is None:
        cut, trunc = truncate_payload(data)
        try:
            return cut.decode("utf-8"), trunc
        except UnicodeDecodeError:
            pass
    sniffed = sniff_decode(data)
    if sniffed is None:
        return None
    return truncate_text(sniffed[0], truncate_payload)
