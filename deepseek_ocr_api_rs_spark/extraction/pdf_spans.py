"""PDF branch: span parsing + column detection + reading-order reconstruction.

Analogue of the reference's tile regroup/permute/flatten reading-order math
(``format_local_tokens``, crates/infer-deepseek/src/model/mod.rs:578-609):
2-D layout (page, column, y, x) flattened to a 1-D deterministic text order,
with newline separators inserted exactly like ``append_row_breaks``
(model/mod.rs:496-508) inserts the image_newline token per grid row.

Two container formats feed the same layout math:

1. **Real PDFs** — actual PDF syntax (objects, FlateDecode streams, BT/ET
   text operators), parsed by ``pdf_real.parse_real_pdf`` (stdlib re+zlib).
   This is the reference's "real input" contract
   (crates/cli/src/app.rs:116-122, crates/server/src/generation.rs:263-305).
2. **JSON geometry container** — ``%PDF-`` magic + JSON
   ``{"width": W, "spans": [...]}`` with spans
   ``{"page": int, "x0,y0,x1,y1": float, "text": str}`` — kept for layout
   goldens where exact hand-authored geometry matters.
"""

from __future__ import annotations

import json

from deepseek_ocr_api_rs_spark.extraction.pdf_real import parse_real_pdf

PDF_MAGIC = b"%PDF-"
DEFAULT_PAGE_WIDTH = 612.0
COLUMN_GAP_FRACTION = 0.18  # min x-gap (fraction of page width) splitting columns
Y_QUANTUM = 2.0             # spans within this y distance are one visual line


def parse_pdf_payload(data: bytes) -> tuple[float, list[dict]] | None:
    """Return (page_width, spans) or None if not parseable.

    Dispatch: JSON geometry container if the byte after the header line is
    ``{``; otherwise real-PDF object parse (pdf_real)."""
    if not data.startswith(PDF_MAGIC):
        return None
    parts = data.split(b"\n", 1)
    body = parts[1] if len(parts) > 1 else b""
    if body.lstrip()[:1] == b"{":
        try:
            obj = json.loads(body.decode("utf-8"))
            spans = obj["spans"]
            width = float(obj.get("width", DEFAULT_PAGE_WIDTH))
        except Exception:
            return None
        return width, spans
    return parse_real_pdf(data)


def detect_columns(x_centers: list[float], page_width: float) -> list[float]:
    """Return sorted column-boundary x positions.

    Deterministic 1-D gap clustering: sort the distinct centers (stable),
    cut wherever the gap exceeds COLUMN_GAP_FRACTION * page_width. Mirrors
    the BTreeSet-determinism style of tile-ratio enumeration
    (crates/infer-deepseek/src/vision/preprocess.rs:23-32).
    """
    if not x_centers:
        return []
    xs = sorted(set(x_centers))
    min_gap = COLUMN_GAP_FRACTION * page_width
    bounds: list[float] = []
    for prev, cur in zip(xs, xs[1:]):
        if cur - prev > min_gap:
            bounds.append((prev + cur) / 2.0)
    return bounds


def column_of(x_center: float, bounds: list[float]) -> int:
    col = 0
    for b in bounds:
        if x_center > b:
            col += 1
    return col


def ordered_spans(spans: list[dict], page_width: float) -> list[tuple[int, int, int, int]]:
    """Reading order: list of (span_idx, page, column, line) tuples.

    Sort key per page: (column, y0 quantized to Y_QUANTUM, x0); stable on
    ties (Timsort), so equal keys keep input order — same rule the
    vectorized path reproduces with np.lexsort (also stable).
    """
    by_page: dict[int, list[int]] = {}
    for i, s in enumerate(spans):
        by_page.setdefault(int(s["page"]), []).append(i)
    result: list[tuple[int, int, int, int]] = []
    for page in sorted(by_page):
        idxs = by_page[page]
        centers = [(float(spans[i]["x0"]) + float(spans[i]["x1"])) / 2.0 for i in idxs]
        bounds = detect_columns(centers, page_width)
        rows = []
        for i, c in zip(idxs, centers):
            col = column_of(c, bounds)
            line = int(float(spans[i]["y0"]) // Y_QUANTUM)
            rows.append(((col, line, float(spans[i]["x0"])), i, col, line))
        rows.sort(key=lambda t: t[0])
        result.extend((i, page, col, line) for _, i, col, line in rows)
    return result


def assemble_pdf_text(spans: list[dict], page_width: float) -> str:
    """Spans → text: ' ' within a visual line, '\\n' between lines,
    '\\n\\n' between (page, column) groups."""
    parts: list[str] = []
    prev_group = None
    prev_line = None
    for i, page, col, line in ordered_spans(spans, page_width):
        text = " ".join(str(spans[i]["text"]).split())
        if not text:
            continue
        group = (page, col)
        if prev_group is None:
            parts.append(text)
        elif group != prev_group:
            parts.append("\n\n" + text)
        elif line != prev_line:
            parts.append("\n" + text)
        else:
            parts.append(" " + text)
        prev_group = group
        prev_line = line
    return "".join(parts)
