"""Text-analysis column functions: token counting, quality scoring,
language-ID, fingerprinting (SURVEY.md build mandate: training-data
pipeline text ops as first-class components).

Each function returns a Spark Column built purely from
pyspark.sql.functions (whole-stage-codegen friendly); the matching
``*_duckdb`` returns the equivalent DuckDB SQL fragment so the driver's
oracle check can hold the two engines equal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pinned per-language stopword lists (feature tables — the broadcastable
# "weight table" idea of S6/E4; tiny, so they inline as literals).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "von"),
    "fr": ("le", "la", "les", "des", "et", "est", "dans", "une"),
    "es": ("el", "los", "las", "por", "con", "una", "para", "que"),
}

_WS = "\\s+"


def token_count(text_col: str) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, _WS))
    ).cast("long")


def token_count_duckdb(text_col: str) -> str:
    return (
        f"cast(case when trim({text_col}) = '' then 0 else "
        f"len(regexp_split_to_array(trim({text_col}), '{_WS}')) end as bigint)"
    )


def char_count(text_col: str) -> Column:
    return F.length(F.col(text_col)).cast("long")


def _stopword_hits(text_col: str, words: tuple[str, ...]) -> Column:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), F.lit(0)))


def _stopword_hits_duckdb(text_col: str, words: tuple[str, ...]) -> str:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return f"len(regexp_extract_all(lower({text_col}), '{pat}'))"


def quality_score(text_col: str) -> Column:
    """Deterministic quality heuristic in [0, ~1]: rewards stopword-bearing
    prose of reasonable length, penalizes digit soup.

    q = 0.4*min(len/500, 1) + 0.4*min(stop_ratio*5, 1) + 0.2*(1 - digit_ratio)
    All ratios are exact integer divisions in float64 — identical across
    engines; the query layer rounds to 4 decimals anyway.
    """
    n = F.length(F.col(text_col)).cast("double")
    words = token_count(text_col).cast("double")
    stops = _stopword_hits(text_col, LANG_STOPWORDS["en"]).cast("double")
    digits = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[0-9]"), F.lit(0))
    ).cast("double")
    len_term = F.least(n / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stops / F.greatest(words, F.lit(1.0)) * 5.0, F.lit(1.0))
    digit_term = F.lit(1.0) - digits / F.greatest(n, F.lit(1.0))
    return len_term * 0.4 + stop_term * 0.4 + digit_term * 0.2


def quality_score_duckdb(text_col: str) -> str:
    n = f"cast(length({text_col}) as double)"
    words = f"cast({token_count_duckdb(text_col)} as double)"
    stops = f"cast({_stopword_hits_duckdb(text_col, LANG_STOPWORDS['en'])} as double)"
    digits = f"cast(len(regexp_extract_all({text_col}, '[0-9]')) as double)"
    return (
        f"(least({n} / 500.0, 1.0) * 0.4"
        f" + least({stops} / greatest({words}, 1.0) * 5.0, 1.0) * 0.4"
        f" + (1.0 - {digits} / greatest({n}, 1.0)) * 0.2)"
    )


def lang_id(text_col: str) -> Column:
    """n-gram/stopword heuristic language ID.

    Rules (first match wins; all counts are integers → engine-independent):
    1. any CJK codepoint               → 'zh'
    2. argmax of per-language stopword hits, ties broken by fixed language
       order (en > de > fr > es), zero hits → 'unknown'
    """
    cjk = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[\\x{4e00}-\\x{9fff}]"), F.lit(0))
    )
    hits = {lang: _stopword_hits(text_col, ws) for lang, ws in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("unknown")
    # reversed fixed order so earlier languages win ties via later when()
    for lang in ["es", "fr", "de", "en"]:
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return F.when(cjk > 0, F.lit("zh")).otherwise(expr)


def lang_id_duckdb(text_col: str) -> str:
    hits = {
        lang: _stopword_hits_duckdb(text_col, ws)
        for lang, ws in LANG_STOPWORDS.items()
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    cases = " ".join(
        f"when {hits[lang]} > 0 and {hits[lang]} = {best} then '{lang}'"
        for lang in ["en", "de", "fr", "es"]
    )
    return (
        f"case when len(regexp_extract_all({text_col}, '[\\x{{4e00}}-\\x{{9fff}}]')) > 0 "
        f"then 'zh' {cases} else 'unknown' end"
    )


def fingerprint(text_col: str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    (the X1-canonicalize-then-hash pattern; md5 is identical across engines)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), _WS, " ")
    return F.md5(norm)


def fingerprint_duckdb(text_col: str) -> str:
    return f"md5(regexp_replace(trim(lower({text_col})), '{_WS}', ' ', 'g'))"


# ---------------------------------------------------------------------------
# X3 grounding-ref markdown polish (the reference's Python post-processing:
# scripts/capture_baseline.py:756-777 + the public DeepSeek-OCR re_match —
# grounding blocks are <|ref|>label<|/ref|><|det|>[[boxes]]<|/det|>; blocks
# whose label is exactly "image" become indexed ![](images/N.jpg) tags, all
# other blocks are stripped, then \coloneqq := / \eqqcolon =: unescape).

# (?s): boxes may contain newlines; non-greedy within each tag pair
IMG_REF_PATTERN = r"(?s)<\|ref\|>image<\|/ref\|><\|det\|>.*?<\|/det\|>"
OTHER_REF_PATTERN = r"(?s)<\|ref\|>.*?<\|/ref\|>(<\|det\|>.*?<\|/det\|>)?"


def polish_markdown(md: Column, stop_token: str = "<|eos|>") -> Column:
    """Full X3/X4 chain as pure built-ins (codegen, no UDF):

    1. stop-string suffix trim (X4);
    2. image refs → ``![](images/N.jpg)\\n`` with N = occurrence index —
       split on the image-ref pattern, reassemble with a ``transform``
       index (regexp_replace cannot count; the split carries the order);
    3. strip remaining (non-image) ref/det blocks;
    4. ``\\coloneqq`` → ``:=``, ``\\eqqcolon`` → ``=:``;
    5. trim.
    """
    out = F.regexp_replace(md, _re_escape(stop_token) + "$", "")
    segs = F.split(out, IMG_REF_PATTERN)
    # transform's lambda index i is 0-based; segment i is followed by
    # image-ref i for every i except the last segment
    idx = F.transform(
        segs,
        lambda s, i: F.concat(
            s,
            F.when(
                i < F.size(segs) - 1,
                F.concat(F.lit("![](images/"), i.cast("string"), F.lit(".jpg)\n")),
            ).otherwise(F.lit("")),
        ),
    )
    out = F.array_join(idx, "")
    out = F.regexp_replace(out, OTHER_REF_PATTERN, "")
    out = F.regexp_replace(out, r"\\coloneqq", ":=")
    out = F.regexp_replace(out, r"\\eqqcolon", "=:")
    return F.trim(out)


def _re_escape(s: str) -> str:
    import re as _re

    return _re.escape(s)


def polish_markdown_duckdb(md_sql: str, stop_token: str = "<|eos|>") -> str:
    """DuckDB-equivalent SQL fragment (indexed list_transform reassembly;
    lambda index is 1-based there)."""
    stop = stop_token.replace("|", "\\|")
    img = IMG_REF_PATTERN.replace("'", "''")
    other = OTHER_REF_PATTERN.replace("'", "''")
    trimmed = f"regexp_replace({md_sql}, '{stop}$', '')"
    segs = f"regexp_split_to_array({trimmed}, '{img}')"
    joined = (
        f"array_to_string(list_transform({segs}, (s, i) -> s || "
        f"case when i < len({segs}) "
        f"then '![](images/' || cast(i - 1 as varchar) || '.jpg)' || chr(10) "
        f"else '' end), '')"
    )
    return (
        f"trim(regexp_replace(regexp_replace(regexp_replace("
        f"{joined}, '{other}', '', 'g'), "
        f"'\\\\coloneqq', ':=', 'g'), "
        f"'\\\\eqqcolon', '=:', 'g'))"
    )


# BPE-ish pre-tokenizer (the GPT-2 pattern family, restricted to syntax both
# Java regex and DuckDB's RE2 accept — no lookahead): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_TOKEN_REGEX = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N}\s]+|\s+"
)


def bpe_token_count(text_col: str) -> Column:
    """Count BPE-style pre-tokens (whitespace-only matches excluded) — the
    'token counting' mandate's regex variant alongside ``token_count``'s
    whitespace splitter. Pure built-ins: regexp_extract_all + filter + size."""
    matches = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_REGEX), F.lit(0))
    non_ws = F.filter(matches, lambda m: F.trim(m) != F.lit(""))
    return F.size(non_ws).cast("long")


def bpe_token_count_duckdb(text_col: str) -> str:
    rx = BPE_TOKEN_REGEX.replace("'", "''")
    return (
        f"cast(len(list_filter(regexp_extract_all({text_col}, '{rx}'), "
        f"m -> trim(m) != '')) as bigint)"
    )


# ---------------------------------------------------------------------------
# PII redaction — the C4/Dolma-style scrub stage every public training
# corpus runs before release. Shared RE2-safe patterns (no lookarounds) so
# Spark (Java regex) and DuckDB (RE2) redact identically; replacement
# order matters only for determinism (emails first — '@' text can contain
# digit runs; IPs before phones — dots keep phones from spanning them
# anyway, but the fixed order makes the chain auditable).

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# structured phone shapes, not a loose char-class run (ADVICE r4: \s in
# the run merged unrelated space-separated digit tokens — '1999 2000
# 2018 2021' over-redacted as one <PHONE>). Three RE2-safe alternatives:
# +CC with up to 4 optionally-parenthesized digit groups; the NANP
# (555) 123-4567 / 555 010 9999 family (3-3-4); a bare 7-15 digit run.
# Separators are single space/dash only — never \n/\t, never consecutive
# spaces — and the 3-3-4 / leading-+ structure means year runs and
# number tables cannot chain into one match.
# every alternative ends with an unbounded digit run so an over-long
# number is consumed WHOLE — a bounded tail ({4} / {7,15}) redacted only
# a prefix and leaked the remaining digits (code-review r5). The bare
# alternative is \b-anchored (ADVICE r5): it must START at a word
# boundary so it never redacts the digit tail of a longer alphanumeric
# token (serials like SN12345678); greediness means the match always
# runs to the last digit, so no trailing anchor is needed and no
# partial-redaction leak is possible. \b is ASCII-word-boundary in both
# Java regex (Spark) and RE2 (DuckDB oracle).
PHONE_RE = (
    r"\+[0-9]{1,3}(?:[ \-]?\(?[0-9]{1,4}\)?){1,4}[0-9]*"
    r"|\(?[0-9]{3}\)?[ \-]?[0-9]{3}[ \-][0-9]{4,}"
    r"|\b[0-9]{7,}"
)

_PII_CHAIN = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def redact_pii(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in _PII_CHAIN:
        c = F.regexp_replace(c, pat, tag)
    return c


def redact_pii_duckdb(expr: str) -> str:
    s = expr
    for pat, tag in _PII_CHAIN:
        s = f"regexp_replace({s}, '{pat}', '{tag}', 'g')"
    return s


def pii_counts(col: str | Column) -> dict[str, Column]:
    """{kind: count column} of matches (audit metrics). Phones are counted
    AFTER email/IP redaction — digit runs inside an address never double-
    count — mirroring the chain order (Column API throughout: SQL-literal
    backslash escaping never enters the picture)."""
    c = F.col(col) if isinstance(col, str) else col
    after = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return {
        "n_emails": F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))),
        "n_ips": F.size(F.regexp_extract_all(c, F.lit(IPV4_RE), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(after, F.lit(PHONE_RE), F.lit(0))),
    }


def pii_counts_duckdb(expr: str) -> dict[str, str]:
    return {
        "n_emails": f"len(regexp_extract_all({expr}, '{EMAIL_RE}'))",
        "n_ips": f"len(regexp_extract_all({expr}, '{IPV4_RE}'))",
        "n_phones": (
            f"len(regexp_extract_all(regexp_replace(regexp_replace({expr}, "
            f"'{EMAIL_RE}', '<EMAIL>', 'g'), '{IPV4_RE}', '<IP>', 'g'), '{PHONE_RE}'))"
        ),
    }
