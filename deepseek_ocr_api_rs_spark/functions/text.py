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
