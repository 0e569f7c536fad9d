"""HTML → deterministic block list (the shared low-level tokenizer).

Plays the role of the reference's image preprocessing + tiling
(crates/infer-deepseek/src/vision/preprocess.rs:13-76 — deterministic
enumeration, stable order, pinned rounding): one HTML document becomes an
ordered list of text blocks with integer count features. Everything
downstream (scoring, accept/reject, assembly) is pure arithmetic on these
counts, implemented twice (scalar vs vectorized) and parity-checked.

Two parse drivers feed ONE event sink (identical segmentation semantics):

- ``segment_html``        — fast single-pass regex tokenizer (default; the
  production path — ~4× faster than stdlib HTMLParser);
- ``segment_html_stdlib`` — stdlib ``html.parser`` driver, kept as the slow
  cross-check path (the reference keeps ``generate_without_cache`` for
  exactly this purpose — parity debugging, model/mod.rs:1684-1914). Tests
  hold the two drivers block-identical over the fixture corpus.

No lxml/bs4 in this environment; a hand-rolled walk is also the easiest
thing to make byte-deterministic.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape
from html.parser import HTMLParser

# Tags whose text content is never document text.
_SKIP_CONTENT = frozenset({"script", "style", "noscript", "template", "svg", "head"})
# Tags the tokenizers treat as raw text (scan straight to the close tag) —
# must mirror stdlib HTMLParser.CDATA_CONTENT_ELEMENTS for driver parity.
_RAWTEXT = frozenset({"script", "style"})
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

_PUNCT = ".,;:!?\"'()[]{}-—…"
_STRIP = "\".,;:!?()'"
# C-speed counting: deletion translate tables (exactly equivalent to the
# per-char membership loops they replaced; digits pinned to ASCII 0-9).
_DEL_PUNCT = str.maketrans("", "", _PUNCT)
_DEL_DIGITS = str.maketrans("", "", "0123456789")


def _word_stats(text: str) -> tuple[int, int, int, int]:
    words = text.split()
    n_stop = 0
    stops = STOPWORDS
    for w in words:
        # fast path: already-lowercase alpha words (the common case) need
        # no strip/lower allocation — identical result by construction
        if w.isalpha():
            if (w if w.islower() else w.lower()) in stops:
                n_stop += 1
        elif w.strip(_STRIP).lower() in stops:
            n_stop += 1
    n_punct = len(text) - len(text.translate(_DEL_PUNCT))
    n_digits = len(text) - len(text.translate(_DEL_DIGITS))
    return len(words), n_stop, n_punct, n_digits


class _BlockSink:
    """Parser-independent event sink holding the segmentation state
    machine. Both drivers emit (starttag, endtag, startendtag, data) events
    into this; the resulting block list is driver-invariant (tested)."""

    __slots__ = (
        "stack", "blocks", "_parts", "_link_chars", "_tags_in_block",
        "_link_depth", "_skip_depth", "_boiler_depth",
        "_ctx_stack", "_ctx_boiler", "_stack_cache", "_open_counts",
    )

    def __init__(self) -> None:
        self.stack: list[str] = []
        self.blocks: list[RawBlock] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._tags_in_block = 0
        self._link_depth = 0
        self._skip_depth = 0
        self._boiler_depth = 0
        self._ctx_stack: tuple[str, ...] = ()
        self._ctx_boiler = 0
        # hot-path accelerators (pure caches — every observable value is
        # still derived from `stack` exactly as before):
        # memoized tuple(stack), invalidated on push/pop
        self._stack_cache: tuple[str, ...] | None = ()
        # multiset of open tags so endtag's `tag in stack` test is O(1)
        self._open_counts: dict[str, int] = {}

    # -- block lifecycle -------------------------------------------------
    def _begin_block_context(self) -> None:
        # O(1) snapshot; the (rarer) flush pays the join/any cost instead
        t = self._stack_cache
        if t is None:
            t = self._stack_cache = tuple(self.stack)
        self._ctx_stack = t
        self._ctx_boiler = self._boiler_depth

    def _flush(self) -> None:
        if not self._parts:  # empty block: skip the join/split entirely
            self._link_chars = 0
            self._tags_in_block = 0
            self._begin_block_context()
            return
        text = " ".join("".join(self._parts).split())
        if text:
            n_words, n_stop, n_punct, n_digits = _word_stats(text)
            self.blocks.append(
                RawBlock(
                    idx=len(self.blocks),
                    tag_path="/".join(self._ctx_stack),
                    text=text,
                    n_text_chars=len(text),
                    n_link_chars=min(self._link_chars, len(text)),
                    n_tags=self._tags_in_block,
                    depth=len(self._ctx_stack),
                    boiler=int(self._ctx_boiler > 0),
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

    # -- events ------------------------------------------------------
    def starttag(self, tag: str) -> None:
        if tag in _BLOCK_BOUNDARY:
            self._flush()
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        if tag == "a":
            self._link_depth += 1
        self._tags_in_block += 1
        if tag not in _VOID and tag != "html":
            self.stack.append(tag)
            self._stack_cache = None
            counts = self._open_counts
            counts[tag] = counts.get(tag, 0) + 1
            if tag in _BOILER_ANCESTORS:
                self._boiler_depth += 1
        if tag in _BLOCK_BOUNDARY:
            self._begin_block_context()

    def endtag(self, tag: str) -> None:
        if tag in _BLOCK_BOUNDARY:
            self._flush()
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1
        # pop to the innermost matching open tag (forgiving, deterministic;
        # the open-tag multiset makes the membership test O(1))
        counts = self._open_counts
        if counts.get(tag, 0):
            self._stack_cache = None
            while self.stack:
                popped = self.stack.pop()
                counts[popped] -= 1
                if popped in _BOILER_ANCESTORS:
                    self._boiler_depth -= 1
                if popped == tag:
                    break
        if tag in _BLOCK_BOUNDARY:
            self._begin_block_context()

    def startendtag(self, tag: str) -> None:
        if tag in _BLOCK_BOUNDARY:
            self._flush()
            self._begin_block_context()
        self._tags_in_block += 1

    def data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._link_depth:
            self._link_chars += len(" ".join(data.split()))

    def finish(self) -> list[RawBlock]:
        self._flush()
        return self.blocks


# ---------------------------------------------------------------------------
# Driver 1 (default): single-pass regex tokenizer — the production path.

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"                       # comments
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"              # cdata
    r"|<![^>]*>?"                              # doctype / declarations
    r"|<\?[^>]*>?"                             # processing instructions
    r"|</\s*>"                                 # bare `</>` — consumed silently
    r"|</\s*([a-zA-Z][^\s>\x00]*)[^>]*>"       # end tag        -> group 1
    r"|<([a-zA-Z][^\s/>\x00]*)"                # start tag name -> group 2
    # (name charset mirrors stdlib HTMLParser's tagfind: anything up to
    # whitespace / '/' / '>', so `<a;>` names the tag "a;" in both drivers)
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"       # attrs (quote-aware)
    r"(/?)>",                                  # self-close     -> group 4
    re.DOTALL,
)


def segment_html(html: str) -> list[RawBlock]:
    """Parse one HTML document into its ordered block list (fast driver)."""
    sink = _BlockSink()
    lower = html.lower()
    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.search(html, pos)
        if m is None:
            tail = html[pos:]
            if tail:
                sink.data(unescape(tail) if "&" in tail else tail)
            break
        if m.start() > pos:
            seg = html[pos : m.start()]
            sink.data(unescape(seg) if "&" in seg else seg)
        end_name, start_name, _attrs, selfclose = m.group(1, 2, 3, 4)
        pos = m.end()
        if start_name is not None:
            tag = start_name.lower()
            if selfclose:
                sink.startendtag(tag)
            else:
                sink.starttag(tag)
                if tag in _RAWTEXT:
                    # rawtext scan to the matching close (mirrors stdlib
                    # CDATA_CONTENT_ELEMENTS handling; content discarded
                    # by the sink's skip_depth anyway)
                    close = lower.find("</" + tag, pos)
                    if close == -1:
                        sink.endtag(tag)
                        break
                    gt = html.find(">", close)
                    pos = (gt + 1) if gt != -1 else n
                    sink.endtag(tag)
        elif end_name is not None:
            sink.endtag(end_name.lower())
        # else: comment/doctype/PI — consumed silently
    return sink.finish()


# ---------------------------------------------------------------------------
# Driver 2: stdlib html.parser — slow cross-check path (D2 pattern).

class _StdlibAdapter(HTMLParser):
    def __init__(self, sink: _BlockSink) -> None:
        super().__init__(convert_charrefs=True)
        self.sink = sink

    def handle_starttag(self, tag: str, attrs) -> None:
        self.sink.starttag(tag)

    def handle_endtag(self, tag: str) -> None:
        self.sink.endtag(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.sink.startendtag(tag)

    def handle_data(self, data: str) -> None:
        self.sink.data(data)


def segment_html_stdlib(html: str) -> list[RawBlock]:
    """Stdlib-parser driver — used only by parity tests."""
    sink = _BlockSink()
    parser = _StdlibAdapter(sink)
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Truncated/hostile input: keep whatever was segmented before the
        # failure (deterministic — parser state depends only on the prefix).
        pass
    return sink.finish()
