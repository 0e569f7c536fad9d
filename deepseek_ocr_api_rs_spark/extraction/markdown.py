"""Plain-text / Markdown passthrough — the third extractor branch.

The reference routes requests across THREE inference backends
(crates/infer-deepseek, crates/infer-paddle, crates/infer-dots); the
dots backend is the lightweight "just read the text" path. Our D8
router (extraction/batch.py) gains the same third shape: a strict-UTF-8
payload with no HTML markup is a plain-text or Markdown document and is
passed through WITHOUT the block scorer — every paragraph block is
accepted (the branch has no model, that is its point), only the Markdown
surface syntax is stripped so downstream text analysis sees prose.

Everything here is deterministic regex rewriting (CommonMark's
block/inline surface, not a full parser — the corpus never nests
constructs, and real-web .md/.txt bodies are overwhelmingly this
shape): ATX headings, list bullets, blockquotes, fenced-code markers,
emphasis/strong, inline code, links and images.
"""

from __future__ import annotations

import re

# one tag-shaped token anywhere → markup, route to the html branch.
# (comments/doctype via '!', closers via '/'; markdown autolinks like
# <https://…> are NOT tag-shaped because of the scheme colon — excluded
# by the attribute-less body check.)
_TAG_RE = re.compile(r"<(?:[a-zA-Z][a-zA-Z0-9-]*(?:\s[^<>]*)?|![^<>]*|/[a-zA-Z][a-zA-Z0-9-]*\s*)>")

_FENCE_RE = re.compile(r"^(?:```|~~~)[^\n]*$", re.M)
_HEADING_RE = re.compile(r"^\s{0,3}#{1,6}\s+", re.M)
_BULLET_RE = re.compile(r"^\s{0,3}(?:[-*+]|\d{1,9}[.)])\s+", re.M)
_QUOTE_RE = re.compile(r"^\s{0,3}(?:>\s?)+", re.M)
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_LINK_RE = re.compile(r"\[([^\]]+)\]\([^)]*\)")
_STRONG_RE = re.compile(r"(\*\*|__)(.+?)\1", re.S)
_EM_RE = re.compile(r"(\*|_)(.+?)\1", re.S)
_CODE_RE = re.compile(r"`([^`\n]*)`")
_RULE_RE = re.compile(r"^\s{0,3}(?:-{3,}|\*{3,}|_{3,})\s*$", re.M)


def looks_like_markup(text: str) -> bool:
    """True when the decoded payload carries HTML tags (→ html branch)."""
    return _TAG_RE.search(text) is not None


def strip_markdown(text: str) -> str:
    """Markdown surface syntax → prose, deterministically."""
    t = _FENCE_RE.sub("", text)
    t = _RULE_RE.sub("", t)
    t = _HEADING_RE.sub("", t)
    t = _QUOTE_RE.sub("", t)
    t = _BULLET_RE.sub("", t)
    t = _IMAGE_RE.sub(r"\1", t)
    t = _LINK_RE.sub(r"\1", t)
    t = _STRONG_RE.sub(r"\2", t)
    t = _EM_RE.sub(r"\2", t)
    t = _CODE_RE.sub(r"\1", t)
    return t


def markdown_blocks(text: str) -> list[str]:
    """Blank-line paragraph segmentation, then per-block markdown strip +
    whitespace collapse. Every returned block is non-empty; the caller
    accepts them ALL (passthrough branch — no scorer)."""
    blocks = []
    for seg in re.split(r"\n\s*\n", text):
        cleaned = " ".join(strip_markdown(seg).split())
        if cleaned:
            blocks.append(cleaned)
    return blocks
