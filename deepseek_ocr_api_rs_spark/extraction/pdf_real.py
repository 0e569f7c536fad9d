"""Real-PDF text extraction, stdlib only (re + zlib).

The reference's whole purpose is decoding REAL documents — the CLI loads
real image/PDF inputs (crates/cli/src/app.rs:116-122) and the server decodes
data-URL / fetched payloads (crates/server/src/generation.rs:263-305). This
module gives the PDF branch that "real input" contract: it parses actual PDF
syntax — object scan, FlateDecode content streams via stdlib ``zlib``, and a
BT/ET text-operator interpreter (Tj/TJ/Td/TD/TL/T*/Tm/Tf/'/") — and emits
the same positioned-span dicts the layout operator (``pdf_spans.ordered_spans``)
already consumes. Page geometry: PDF y grows upward from the bottom-left, so
spans are flipped to top-down reading coordinates using the page MediaBox.

Scope (documented, not silent): direct-value /Length or endstream-scan,
FlateDecode only (the one filter stdlib can do), latin-1 text strings,
no CMap/ToUnicode (fixture PDFs use standard encodings), glyph widths
estimated at 0.5 em (column detection needs centers + gaps, not exact
metrics). ``make_pdf_bytes`` is the inverse: assembles a real, readable
PDF (optionally Flate-compressed) from span dicts for fixtures and tests.
"""

from __future__ import annotations

import re
import zlib

DEFAULT_PAGE_WIDTH = 612.0
DEFAULT_PAGE_HEIGHT = 792.0
CHAR_WIDTH_EM = 0.5  # estimated average glyph advance, in units of font size

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.DOTALL)
_STREAM_START_RE = re.compile(rb"stream(?:\r\n|\n|\r)")
# direct /Length only: the integer must be followed by the next dict token
# ("/" key or ">>"), which excludes indirect "/Length N G R" references —
# a bare negative lookahead backtracks into matching a digit prefix.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\s*[/>]")
_FLATE_RE = re.compile(rb"/Filter\s*(?:/FlateDecode\b|\[[^\]]*?/FlateDecode\b)")
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(rb"/MediaBox\s*\[([^\]]*)\]")
_CONTENTS_RE = re.compile(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)")
_PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages\b")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")

_WHITESPACE = b" \t\r\n\f\x00"
_DELIMS = b"()<>[]{}/%"


def _extract_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Scan ``N G obj ... endobj`` spans → {obj_num: (head_bytes, stream|None)}.

    The stream payload is sliced by direct /Length when present (exact, safe
    for binary Flate data), else by scanning to ``endstream``.
    """
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if m is None:
            break
        num, body = int(m.group(1)), m.group(3)
        sm = _STREAM_START_RE.search(body)
        if sm is None:
            objs[num] = (body, None)
            pos = m.end()
            continue
        head = body[: sm.start()]
        lm = _LENGTH_RE.search(head)
        if lm is not None:
            start = m.start(3) + sm.end()
            stream = data[start : start + int(lm.group(1))]
            # resume the object scan after this stream's real end — the
            # non-greedy .*? may have stopped at a fake "endobj" inside
            # compressed bytes, so re-anchor past `endstream`.
            end = data.find(b"endobj", start + int(lm.group(1)))
            pos = end + 6 if end >= 0 else len(data)
        else:
            es = body.find(b"endstream", sm.end())
            stream = body[sm.end() : es if es >= 0 else len(body)]
            stream = stream.rstrip(b"\r\n")
            pos = m.end()
        objs[num] = (head, stream)
    return objs


def _decode_stream(head: bytes, stream: bytes) -> bytes | None:
    if _FLATE_RE.search(head):
        try:
            return zlib.decompress(stream)
        except zlib.error:
            return None
    return stream


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_INT_RE = re.compile(rb"\d+")


def _expand_object_streams(
    objs: dict[int, tuple[bytes, bytes | None]],
) -> None:
    """Inline objects stored inside /Type /ObjStm compressed object streams
    (PDF 1.5+ — modern writers put page/catalog DICTS there, so a parser
    without this sees no page tree at all). Layout per PDF 32000 §7.5.7:
    /N pairs of (objnum, offset) ints, then the objects back to back
    starting at /First. Contained objects are dict-only (no streams).
    Existing top-level objects win on number collision."""
    for num in list(objs):
        head, stream = objs[num]
        if stream is None or not _OBJSTM_RE.search(head):
            continue
        data = _decode_stream(head, stream)
        if data is None:
            continue
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        if nm is None or fm is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header_ints = [int(x) for x in _INT_RE.findall(data[:first])]
        pairs = list(zip(header_ints[0::2], header_ints[1::2]))[:n]
        for i, (objnum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
            body = data[first + off : first + end]
            if objnum not in objs:
                objs[objnum] = (body, None)


def _parse_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal string starting at the '(' — PDF 32000 §7.3.4.2:
    nested parens, backslash escapes incl. up-to-3-digit octal, line folds."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt and nxt in b"nrtbf":
                out += {"n": b"\n", "r": b"\r", "t": b"\t", "b": b"\b", "f": b"\f"}[
                    nxt.decode()
                ]
                i += 2
            elif nxt in (b"(", b")", b"\\"):
                out += nxt
                i += 2
            elif nxt and nxt in b"01234567":
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and data[j : j + 1] in b"01234567":
                    oct_digits += data[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                i += 2  # unknown escape: drop backslash
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth > 0:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _tokenize(content: bytes):
    """Yield ('str', bytes) | ('num', float) | ('name', str) | ('op', str)."""
    i, n = 0, len(content)
    while i < n:
        c = content[i : i + 1]
        if c in _WHITESPACE:
            i += 1
        elif c == b"%":
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _parse_literal_string(content, i)
            yield ("str", s)
        elif c == b"<":
            if content[i : i + 2] == b"<<":
                yield ("op", "<<")
                i += 2
            else:
                j = content.find(b">", i)
                j = n if j < 0 else j
                hx = re.sub(rb"\s", b"", content[i + 1 : j])
                if len(hx) % 2:
                    hx += b"0"
                try:
                    yield ("str", bytes.fromhex(hx.decode("ascii")))
                except ValueError:
                    pass
                i = j + 1
        elif c == b">":
            yield ("op", ">>")
            i += 2
        elif c in b"[]{}":
            yield ("op", c.decode())
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and content[j : j + 1] not in _WHITESPACE + _DELIMS:
                j += 1
            yield ("name", content[i + 1 : j].decode("latin-1"))
            i = j
        elif c in b"+-.0123456789":
            j = i + 1
            while j < n and content[j : j + 1] in b"+-.0123456789eE":
                j += 1
            try:
                yield ("num", float(content[i:j]))
            except ValueError:
                pass
            i = j
        else:
            j = i + 1
            while j < n and content[j : j + 1] not in _WHITESPACE + _DELIMS:
                j += 1
            yield ("op", content[i:j].decode("latin-1", "replace"))
            i = j


def _decode_text(raw: bytes) -> str:
    return raw.decode("latin-1")


def _page_spans(content: bytes, page: int, page_height: float) -> list[dict]:
    """Interpret one page's content stream(s) → positioned span dicts.

    Text state machine per PDF 32000 §9.4: line matrix updated by Td/TD/Tm/T*,
    glyph cursor advanced after each show operator so consecutive Tj on one
    line land on the same quantized visual line with increasing x.
    """
    spans: list[dict] = []
    stack: list[tuple] = []
    arr: list[tuple] | None = None
    font_size = 12.0
    leading = 0.0
    line_x = line_y = 0.0  # line matrix origin
    cur_x = cur_y = 0.0  # glyph cursor

    def nums(k: int) -> list[float]:
        vals = [v for t, v in stack if t == "num"]
        return vals[-k:] if len(vals) >= k else []

    def emit(text: str, kern_advance: float = 0.0) -> None:
        nonlocal cur_x
        if not text:
            return
        w = CHAR_WIDTH_EM * font_size * len(text) + kern_advance
        y_top = page_height - cur_y
        spans.append(
            {
                "page": page,
                "x0": round(cur_x, 2),
                "y0": round(y_top - font_size, 2),
                "x1": round(cur_x + w, 2),
                "y1": round(y_top, 2),
                "text": text,
            }
        )
        cur_x += w

    def newline() -> None:
        nonlocal line_y, cur_x, cur_y
        line_y -= leading
        cur_x, cur_y = line_x, line_y

    for typ, val in _tokenize(content):
        if typ != "op":
            (arr if arr is not None else stack).append((typ, val))
            continue
        op = val
        if op == "[":
            arr = []
            continue
        if op == "]":
            stack.append(("arr", arr or []))
            arr = None
            continue
        if op == "BT":
            line_x = line_y = cur_x = cur_y = 0.0
        elif op == "Tf":
            v = nums(1)
            if v:
                font_size = v[0]
        elif op == "TL":
            v = nums(1)
            if v:
                leading = v[0]
        elif op in ("Td", "TD"):
            v = nums(2)
            if len(v) == 2:
                if op == "TD":
                    leading = -v[1]
                line_x += v[0]
                line_y += v[1]
                cur_x, cur_y = line_x, line_y
        elif op == "Tm":
            v = nums(6)
            if len(v) == 6:
                line_x, line_y = v[4], v[5]
                cur_x, cur_y = line_x, line_y
        elif op == "T*":
            newline()
        elif op in ("Tj", "'", '"'):
            if op in ("'", '"'):
                newline()
            raws = [v for t, v in stack if t == "str"]
            if raws:
                emit(_decode_text(raws[-1]))
        elif op == "TJ":
            arrs = [v for t, v in stack if t == "arr"]
            if arrs:
                text = "".join(
                    _decode_text(v) for t, v in arrs[-1] if t == "str"
                )
                kern = sum(
                    -v / 1000.0 * font_size for t, v in arrs[-1] if t == "num"
                )
                emit(text, kern_advance=kern)
        stack.clear()
    return spans


def _mediabox(head: bytes, fallback: tuple[float, float]) -> tuple[float, float]:
    m = _MEDIABOX_RE.search(head)
    if m is None:
        return fallback
    try:
        a, b, c, d = [float(x) for x in m.group(1).split()[:4]]
        return (c - a, d - b)
    except (ValueError, IndexError):
        return fallback


def parse_real_pdf(data: bytes) -> tuple[float, list[dict]] | None:
    """Real PDF bytes → (page_width, spans) in ``pdf_spans`` layout format,
    or None if no page structure / text is recoverable (→ error branch)."""
    objs = _extract_objects(data)
    if not objs:
        return None
    _expand_object_streams(objs)
    pages_nodes = sorted(
        n for n, (h, _) in objs.items() if _PAGES_TYPE_RE.search(h)
    )
    kid_order: list[int] = []
    root_wh = (DEFAULT_PAGE_WIDTH, DEFAULT_PAGE_HEIGHT)
    for n in pages_nodes:
        head = objs[n][0]
        root_wh = _mediabox(head, root_wh)
        km = _KIDS_RE.search(head)
        if km:
            kid_order += [int(x) for x in _REF_RE.findall(km.group(1))]
    page_objs = {n for n, (h, _) in objs.items() if _PAGE_TYPE_RE.search(h)}
    ordered = [n for n in kid_order if n in page_objs]
    ordered += sorted(page_objs - set(ordered))
    if not ordered:
        return None

    spans: list[dict] = []
    page_width = None
    for page_idx, pnum in enumerate(ordered):
        head = objs[pnum][0]
        w, h = _mediabox(head, root_wh)
        if page_width is None:
            page_width = w
        cm = _CONTENTS_RE.search(head)
        if cm is None:
            continue
        content = b""
        for ref in (int(x) for x in _REF_RE.findall(cm.group(1))):
            if ref not in objs:
                continue
            chead, cstream = objs[ref]
            if cstream is None:
                continue
            decoded = _decode_stream(chead, cstream)
            if decoded is not None:
                content += decoded + b"\n"
        spans.extend(_page_spans(content, page_idx, h))
    if not spans:
        return None
    return (page_width or DEFAULT_PAGE_WIDTH, spans)


# ---------------------------------------------------------------------------
# writer — fixtures/tests assemble real PDFs from the same span dicts


def _escape_literal(text: str) -> str:
    return text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def make_pdf_bytes(
    spans: list[dict],
    width: float = DEFAULT_PAGE_WIDTH,
    height: float = DEFAULT_PAGE_HEIGHT,
    compress: bool = False,
    use_tj_every: int = 0,
) -> bytes:
    """Assemble a real single/multi-page PDF from top-down span dicts.

    Per-span font size is derived from the span's own bbox width so the
    parser's 0.5-em width estimate reproduces (x0, x1) — geometry round-trips
    and column detection sees the same centers. ``use_tj_every=k`` writes
    every k-th span as a split TJ array (kerning-path coverage).
    """
    by_page: dict[int, list[dict]] = {}
    for s in spans:
        by_page.setdefault(int(s["page"]), []).append(s)
    n_pages = (max(by_page) + 1) if by_page else 1

    def content_for(page: int) -> bytes:
        lines = ["BT"]
        for i, s in enumerate(by_page.get(page, [])):
            text = str(s["text"])
            if not text:
                continue
            x0, y0 = float(s["x0"]), float(s["y0"])
            x1 = float(s.get("x1", x0 + CHAR_WIDTH_EM * 11.0 * len(text)))
            size = (x1 - x0) / (CHAR_WIDTH_EM * len(text))
            size = min(max(size, 1.0), 100.0)
            y_pdf = height - y0 - size  # parser emits y0 = H - cur_y - size
            lines.append(f"/F1 {size:.4f} Tf")
            lines.append(f"1 0 0 1 {x0:.2f} {y_pdf:.4f} Tm")
            if use_tj_every and i % use_tj_every == 0 and len(text) > 2:
                cut = len(text) // 2
                a, b = _escape_literal(text[:cut]), _escape_literal(text[cut:])
                lines.append(f"[({a}) 0 ({b})] TJ")
            else:
                lines.append(f"({_escape_literal(text)}) Tj")
        lines.append("ET")
        return "\n".join(lines).encode("latin-1")

    # object numbering: 1 catalog, 2 pages, 3 font,
    # 4..3+n pages, 4+n..3+2n content streams
    first_page = 4
    first_content = first_page + n_pages
    objects: dict[int, bytes] = {}
    kids = " ".join(f"{first_page + p} 0 R" for p in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
        f"/MediaBox [0 0 {width:g} {height:g}] >>"
    ).encode("latin-1")
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for p in range(n_pages):
        objects[first_page + p] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {first_content + p} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >> >>"
        ).encode("latin-1")

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    for p in range(n_pages):
        num = first_content + p
        raw = content_for(p)
        if compress:
            payload = zlib.compress(raw, 9)
            head = f"<< /Length {len(payload)} /Filter /FlateDecode >>"
        else:
            payload = raw
            head = f"<< /Length {len(payload)} >>"
        offsets[num] = len(out)
        out += (
            f"{num} 0 obj\n{head}\nstream\n".encode()
            + payload
            + b"\nendstream\nendobj\n"
        )
    xref_pos = len(out)
    n_objs = first_content + n_pages
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)
