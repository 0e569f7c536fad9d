"""Simple-font byte→character encodings (PDF 32000-1 Annex D).

Fonts WITHOUT a /ToUnicode CMap declare how their single-byte codes map to
glyphs via /Encoding: a base-encoding name (/WinAnsiEncoding,
/MacRomanEncoding, the implicit StandardEncoding) optionally patched by a
/Differences array of ``code /glyphname ...`` runs. The reference accepts
arbitrary real documents (crates/server/src/generation.rs:276-305,
crates/cli/src/app.rs:116-122), and classic-dialect PDFs — the most common
real-PDF family — carry exactly these fonts, so decoding them as latin-1
turns curly quotes / dashes / accents into mojibake. This module builds the
Annex D tables and resolves Adobe Glyph List names so ``pdf_real`` can
decode those bytes to the text the document actually shows.

Table provenance (all public):
- WinAnsiEncoding is Windows code page 1252 (Annex D note 1) — built from
  Python's ``cp1252`` codec. The five cp1252 holes (0x81 0x8D 0x8F 0x90
  0x9D) map to BULLET per Annex D note 3 ("all unused codes greater than
  40 map to the bullet character"); 0xA0→space and 0xAD→hyphen per the
  Annex D code table (NBSP/soft-hyphen are cp1252's, not WinAnsi's).
- MacRomanEncoding is Mac OS Roman — Python's ``mac_roman`` codec, except
  code 0xDB which Annex D keeps as CURRENCY SIGN (Apple later rebound it
  to the euro; the PDF encoding predates that change).
- StandardEncoding is Adobe's original Type-1 layout, an explicit
  {code: glyph-name} table over an ASCII base (quoteright/quoteleft at
  0x27/0x60, the sparse 0xA1+ punctuation block, ligatures at 0xAE/0xAF).
- Glyph names resolve through an Adobe Glyph List subset: the composable
  accented-letter names are DERIVED (base letter + combining mark → NFC,
  kept only when Unicode composes them to one character — exactly the AGL
  rule for those names), the non-compositional names are explicit, and the
  ``uniXXXX`` / ``uXXXX[XX]`` families are computed.
"""

from __future__ import annotations

import functools
import re
import unicodedata

# --- Adobe Glyph List subset ------------------------------------------------

_ASCII_NAMES = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
}

_EXTRA_NAMES = {
    # Latin-1 supplement punctuation / symbols
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "twosuperior": "²",
    "threesuperior": "³", "acute": "´", "mu": "µ",
    "paragraph": "¶", "periodcentered": "·", "cedilla": "¸",
    "onesuperior": "¹", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿",
    "multiply": "×", "divide": "÷",
    # non-compositional letters
    "AE": "Æ", "ae": "æ", "Eth": "Ð", "eth": "ð",
    "Thorn": "Þ", "thorn": "þ", "germandbls": "ß",
    "Oslash": "Ø", "oslash": "ø", "OE": "Œ", "oe": "œ",
    "Lslash": "Ł", "lslash": "ł", "dotlessi": "ı",
    # general punctuation / typographic
    "endash": "–", "emdash": "—", "quoteleft": "‘",
    "quoteright": "’", "quotesinglbase": "‚",
    "quotedblleft": "“", "quotedblright": "”",
    "quotedblbase": "„", "dagger": "†", "daggerdbl": "‡",
    "bullet": "•", "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fraction": "⁄", "minus": "−", "Euro": "€",
    "trademark": "™", "florin": "ƒ", "fi": "ﬁ",
    "fl": "ﬂ",
    # standalone (spacing) accent glyphs
    "circumflex": "ˆ", "caron": "ˇ", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "tilde": "˜", "hungarumlaut": "˝",
    "apple": "",
}

_COMBINING = {
    "grave": "̀", "acute": "́", "circumflex": "̂",
    "tilde": "̃", "macron": "̄", "breve": "̆",
    "dotaccent": "̇", "dieresis": "̈", "ring": "̊",
    "hungarumlaut": "̋", "caron": "̌", "cedilla": "̧",
    "ogonek": "̨",
}


def _build_agl() -> dict[str, str]:
    agl = dict(_ASCII_NAMES)
    for ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
        agl[ch] = ch
        for accent, comb in _COMBINING.items():
            composed = unicodedata.normalize("NFC", ch + comb)
            if len(composed) == 1:
                agl[ch + accent] = composed
    agl.update(_EXTRA_NAMES)
    return agl


AGL = _build_agl()

_UNI_RE = re.compile(r"^uni([0-9A-F]{4})$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_char(name: str) -> str | None:
    """AGL-subset glyph name → character (None when unknown)."""
    ch = AGL.get(name)
    if ch is not None:
        return ch
    m = _UNI_RE.match(name)
    if m is not None:
        return chr(int(m.group(1), 16))
    m = _U_RE.match(name)
    if m is not None:
        cp = int(m.group(1), 16)
        return chr(cp) if cp < 0x110000 else None
    return None


# --- base encoding tables (256-entry char lists) ----------------------------


def _from_codec(codec: str) -> list[str]:
    table = []
    for b in range(256):
        try:
            table.append(bytes([b]).decode(codec))
        except UnicodeDecodeError:
            table.append("•")  # Annex D note 3: unused → bullet
    return table


# tables are constants; _page_fonts resolves one per font per page, so
# the builders cache an immutable tuple and the public functions hand
# out fresh lists (apply_differences and the fixture writer mutate)


@functools.lru_cache(maxsize=None)
def _winansi_cached() -> tuple[str, ...]:
    t = _from_codec("cp1252")
    t[0xA0] = " "   # Annex D: "space", not NBSP
    t[0xAD] = "-"   # Annex D: "hyphen", not soft hyphen
    return tuple(t)


def winansi_table() -> list[str]:
    return list(_winansi_cached())


@functools.lru_cache(maxsize=None)
def _macroman_cached() -> tuple[str, ...]:
    t = _from_codec("mac_roman")
    t[0xDB] = "¤"  # Annex D keeps currency (pre-euro Mac OS Roman)
    return tuple(t)


def macroman_table() -> list[str]:
    return list(_macroman_cached())


# Annex D StandardEncoding: sparse {code: glyph name} over an ASCII base.
_STANDARD_HIGH = {
    0x27: "quoteright", 0x60: "quoteleft",
    0xA1: "exclamdown", 0xA2: "cent", 0xA3: "sterling", 0xA4: "fraction",
    0xA5: "yen", 0xA6: "florin", 0xA7: "section", 0xA8: "currency",
    0xA9: "quotesingle", 0xAA: "quotedblleft", 0xAB: "guillemotleft",
    0xAC: "guilsinglleft", 0xAD: "guilsinglright", 0xAE: "fi", 0xAF: "fl",
    0xB1: "endash", 0xB2: "dagger", 0xB3: "daggerdbl",
    0xB4: "periodcentered", 0xB6: "paragraph", 0xB7: "bullet",
    0xB8: "quotesinglbase", 0xB9: "quotedblbase", 0xBA: "quotedblright",
    0xBB: "guillemotright", 0xBC: "ellipsis", 0xBD: "perthousand",
    0xBF: "questiondown", 0xC1: "grave", 0xC2: "acute", 0xC3: "circumflex",
    0xC4: "tilde", 0xC5: "macron", 0xC6: "breve", 0xC7: "dotaccent",
    0xC8: "dieresis", 0xCA: "ring", 0xCB: "cedilla", 0xCD: "hungarumlaut",
    0xCE: "ogonek", 0xCF: "caron", 0xD0: "emdash",
    0xE1: "AE", 0xE3: "ordfeminine", 0xE8: "Lslash", 0xE9: "Oslash",
    0xEA: "OE", 0xEB: "ordmasculine", 0xF1: "ae", 0xF5: "dotlessi",
    0xF8: "lslash", 0xF9: "oslash", 0xFA: "oe", 0xFB: "germandbls",
}


@functools.lru_cache(maxsize=None)
def _standard_cached() -> tuple[str, ...]:
    t = [chr(b) if 0x20 <= b < 0x7F else "•" for b in range(256)]
    for code, name in _STANDARD_HIGH.items():
        ch = glyph_to_char(name)
        t[code] = ch if ch is not None else "•"
    return tuple(t)


def standard_table() -> list[str]:
    return list(_standard_cached())


_BASE_TABLES = {
    "WinAnsiEncoding": winansi_table,
    "MacRomanEncoding": macroman_table,
    "StandardEncoding": standard_table,
}


def base_encoding_table(name: str) -> list[str] | None:
    fn = _BASE_TABLES.get(name)
    return fn() if fn is not None else None


# --- /Differences -----------------------------------------------------------

_DIFF_TOKEN_RE = re.compile(rb"(\d+)|/([^\s/<>\[\]()]+)")


def apply_differences(table: list[str], body: bytes) -> list[str]:
    """Patch a copy of ``table`` with a /Differences array body: an integer
    sets the next code, each following name fills consecutive codes
    (PDF 32000 §9.6.6.3). Unknown glyph names keep the base table's
    character for that code (documented non-destructive fallback — better
    mojibake-free text than U+FFFD for private ``gNN``-style names)."""
    out = list(table)
    code = 0
    for m in _DIFF_TOKEN_RE.finditer(body):
        if m.group(1) is not None:
            code = int(m.group(1))
            continue
        if 0 <= code < 256:
            ch = glyph_to_char(m.group(2).decode("latin-1"))
            if ch is not None:
                out[code] = ch
        code += 1
    return out


def encode_with_table(text: str, table: list[str]) -> bytes:
    """Fixture-writer inverse: char → code via the table (first occurrence
    wins; codes 0x20-0x7E preferred so ASCII stays ASCII). Unmapped chars
    become '?'. Exercised by tests to prove byte-exact round-trips."""
    inverse: dict[str, int] = {}
    for code in list(range(0x20, 0x7F)) + list(range(256)):
        ch = table[code]
        if ch not in inverse:
            inverse[ch] = code
    q = inverse.get("?", 0x3F)
    return bytes(inverse.get(ch, q) for ch in text)
