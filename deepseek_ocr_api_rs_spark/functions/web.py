"""URL canonicalization — the first operator of every Common-Crawl-style
pipeline (dedup by canonical URL, host-level grouping, politeness shards).

The canonicalizer is a fixed regex chain (identical patterns run on both
engines — Java regex and DuckDB RE2, so: no lookahead, no inline flags):

1. drop the fragment;
2. lowercase the scheme://authority part ONLY (paths stay case-sensitive,
   per RFC 3986 — hosts are case-insensitive, paths are not);
3. strip default ports (:80 for http, :443 for https);
4. strip ``utm_*`` tracking parameters (and the separators they leave
   behind), dropping an emptied query string entirely.

Documented non-goals: dot-segment resolution, percent-encoding
normalization, query-param sorting — each is a rabbit hole real pipelines
configure per-source; the chain here is the deterministic, oracle-exact
core. Strings with no scheme://authority prefix pass through steps 3-4
unchanged (step 2 requires the match).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://authority | rest — anchored, no lookahead (RE2-safe)
AUTH_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$"
HTTPS_PORT_RE = r"^(https://[^/:?#]*):443($|[/?#].*)"
HTTP_PORT_RE = r"^(http://[^/:?#]*):80($|[/?#].*)"
# utm_* stripping, anchored at a parameter separator so a param merely
# CONTAINING "utm_" (?myutm_x=1) or "utm_" text in a path never matches
# (RE2 has no lookbehind, so the separator is consumed — three rules):
# 1. every '&utm_...' param (covers mid, consecutive-run, and tail params);
# 2. a LEADING '?utm_...&' (its separator is '?', which must survive);
# 3. a sole '?utm_...' / '&utm_...' left at end-of-string.
# Known limit (shared with real canonicalizers): a literal '&utm_' inside a
# PATH segment (legal but vanishingly rare) would also match rule 1.
AMP_UTM_RE = r"&utm_[^&#]*"
LEAD_UTM_RE = r"\?utm_[^&#]*&"
UTM_TAIL_RE = r"[?&]utm_[^&#]*$"
TRAIL_Q_RE = r"\?$"
FRAGMENT_RE = r"#.*"
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]*)"


def canonicalize_url(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(c, FRAGMENT_RE, "")
    auth = F.regexp_extract(s, AUTH_RE, 1)
    rest = F.regexp_extract(s, AUTH_RE, 2)
    s = F.when(auth == "", s).otherwise(F.concat(F.lower(auth), rest))
    s = F.regexp_replace(s, HTTPS_PORT_RE, "$1$2")
    s = F.regexp_replace(s, HTTP_PORT_RE, "$1$2")
    s = F.regexp_replace(s, AMP_UTM_RE, "")
    s = F.regexp_replace(s, LEAD_UTM_RE, "?")
    s = F.regexp_replace(s, UTM_TAIL_RE, "")
    return F.regexp_replace(s, TRAIL_Q_RE, "")


def canonicalize_url_duckdb(expr: str) -> str:
    s = f"regexp_replace({expr}, '{FRAGMENT_RE}', '', 'g')"
    auth = f"regexp_extract({s}, '{AUTH_RE}', 1)"
    rest = f"regexp_extract({s}, '{AUTH_RE}', 2)"
    s = f"(case when {auth} = '' then {s} else lower({auth}) || {rest} end)"
    s = f"regexp_replace({s}, '{HTTPS_PORT_RE}', '\\1\\2')"
    s = f"regexp_replace({s}, '{HTTP_PORT_RE}', '\\1\\2')"
    s = f"regexp_replace({s}, '{AMP_UTM_RE}', '', 'g')"
    # 'g' everywhere Spark replaces globally (a literal second '?utm_…&'
    # deeper in the string must canonicalize identically on both engines)
    s = f"regexp_replace({s}, '{LEAD_UTM_RE}', '?', 'g')"
    s = f"regexp_replace({s}, '{UTM_TAIL_RE}', '')"
    return f"regexp_replace({s}, '{TRAIL_Q_RE}', '')"


def url_host(col: str | Column) -> Column:
    """Host of an already-canonicalized URL ('' when absent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, HOST_RE, 1)


def url_host_duckdb(expr: str) -> str:
    return f"regexp_extract({expr}, '{HOST_RE}', 1)"
