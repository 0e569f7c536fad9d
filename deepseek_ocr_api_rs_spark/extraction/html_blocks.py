"""HTML → deterministic block list (the shared low-level tokenizer).

Plays the role of the reference's image preprocessing + tiling
(crates/infer-deepseek/src/vision/preprocess.rs:13-76 — deterministic
enumeration, stable order, pinned rounding): one HTML document becomes an
ordered list of text blocks with integer count features. Everything
downstream (scoring, accept/reject, assembly) is pure arithmetic on these
counts, implemented twice (scalar vs vectorized) and parity-checked.

stdlib ``html.parser`` only — no lxml/bs4 in this environment; a hand-rolled
walk is also the easiest thing to make byte-deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

# Tags whose text content is never document text.
_SKIP_CONTENT = frozenset({"script", "style", "noscript", "template", "svg", "head"})
# Opening or closing any of these flushes the current block.
_BLOCK_BOUNDARY = frozenset(
    {
        "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "pre",
        "blockquote", "figcaption", "caption", "dd", "dt", "div", "section",
        "article", "main", "aside", "nav", "header", "footer", "body",
        "table", "tr", "ul", "ol", "form", "br", "hr", "title",
    }
)
# Ancestor tags that mark a block as boilerplate-context.
_BOILER_ANCESTORS = frozenset({"nav", "header", "footer", "aside", "form"})
# Void elements never pushed on the stack.
_VOID = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


@dataclass
class RawBlock:
    """One segmented block with integer count features (pre-scoring)."""

    idx: int
    tag_path: str       # stack at block start, e.g. "html/body/div/p"
    text: str           # whitespace-collapsed block text
    n_text_chars: int   # len(text)
    n_link_chars: int   # chars contributed while inside an <a>
    n_tags: int         # tag opens observed inside the block (density denom)
    depth: int          # stack depth at block start
    boiler: int         # 1 if any _BOILER_ANCESTORS on the stack
    n_words: int
    n_stop_words: int
    n_punct: int
    n_digits: int


# Small multilingual stopword table — feature input only (its exact content
# is part of the pinned "weight table", the analogue of the projector weights
# crates/infer-deepseek/src/model/mod.rs:334-377).
STOPWORDS = frozenset(
    """a an and are as at be but by for from has have if in into is it its of
    on or that the their there this to was were will with you your we our not
    der die das und ist ein eine im mit für von zu den le la les des un une
    et est dans que pour el los las por con una para""".split()
)

_PUNCT = frozenset(".,;:!?\"'()[]{}-—…")


def _word_stats(text: str) -> tuple[int, int, int, int]:
    words = text.split()
    n_stop = 0
    for w in words:
        if w.strip("\".,;:!?()'").lower() in STOPWORDS:
            n_stop += 1
    n_punct = 0
    n_digits = 0
    for ch in text:
        if ch in _PUNCT:
            n_punct += 1
        elif ch.isdigit():
            n_digits += 1
    return len(words), n_stop, n_punct, n_digits


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.blocks: list[RawBlock] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._tags_in_block = 0
        self._link_depth = 0
        self._skip_depth = 0
        self._block_path = "html/body"
        self._block_depth = 0
        self._block_boiler = 0

    # -- block lifecycle -------------------------------------------------
    def _begin_block_context(self) -> None:
        self._block_path = "/".join(self.stack) if self.stack else ""
        self._block_depth = len(self.stack)
        self._block_boiler = int(any(t in _BOILER_ANCESTORS for t in self.stack))

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            n_words, n_stop, n_punct, n_digits = _word_stats(text)
            self.blocks.append(
                RawBlock(
                    idx=len(self.blocks),
                    tag_path=self._block_path,
                    text=text,
                    n_text_chars=len(text),
                    n_link_chars=min(self._link_chars, len(text)),
                    n_tags=self._tags_in_block,
                    depth=self._block_depth,
                    boiler=self._block_boiler,
                    n_words=n_words,
                    n_stop_words=n_stop,
                    n_punct=n_punct,
                    n_digits=n_digits,
                )
            )
        self._parts = []
        self._link_chars = 0
        self._tags_in_block = 0
        self._begin_block_context()

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_BOUNDARY:
            self._flush()
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        if tag == "a":
            self._link_depth += 1
        self._tags_in_block += 1
        if tag not in _VOID and tag not in ("html",):
            self.stack.append(tag)
        if tag in _BLOCK_BOUNDARY:
            self._begin_block_context()

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_BOUNDARY:
            self._flush()
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1
        # pop to the innermost matching open tag (forgiving, deterministic)
        if tag in self.stack:
            while self.stack:
                popped = self.stack.pop()
                if popped == tag:
                    break
        if tag in _BLOCK_BOUNDARY:
            self._begin_block_context()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_BOUNDARY:
            self._flush()
            self._begin_block_context()
        self._tags_in_block += 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._link_depth:
            self._link_chars += len(" ".join(data.split()))


def segment_html(html: str) -> list[RawBlock]:
    """Parse one HTML document into its ordered block list."""
    parser = _BlockParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Truncated/hostile input: keep whatever was segmented before the
        # failure (deterministic — parser state depends only on the prefix).
        pass
    parser._flush()
    return parser.blocks
