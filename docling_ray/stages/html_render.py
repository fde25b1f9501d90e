"""Render-layout bbox provenance for HTML-extracted spans.

The reference can render an HTML document in headless Chromium and
attach each item's on-screen bounding box + page screenshot as
provenance (``docling/backend/html_backend.py:640-900``,
``_render_with_browser`` — Playwright, ``render_page`` option, JS
disabled for determinism). No browser exists in this environment, so
this module rebuilds the *provenance computation* as a deterministic
fixed-metric flow layout — the same stand-in discipline as the OCR/VLM
engines: the plumbing (viewport, block stacking, line wrapping, page
pagination, per-span rects) is real and tested; the glyph metrics are a
fixed approximation (0.5em monospace advance, the same convention as
``stages/pdf_bytes._advance_width``) instead of Chromium's text shaper.

Model: block spans stack vertically in a ``viewport_w``-wide page with
``PAD`` margins; text wraps at the character capacity of the content
width; per-kind font sizes give heading/caption/code heights; tables
add one row-height per grid row; pictures get a fixed aspect box.
``page_no`` advances every ``viewport_h`` of flow (the analogue of the
reference's ``render_page_size`` + screenshot pagination).
"""

from __future__ import annotations

import json

import pyarrow as pa

VIEWPORT_W = 1280.0
VIEWPORT_H = 720.0
PAD = 16.0

# per-kind (font_px, pre_gap) — fixed metrics, not a text shaper
_KIND_FONT = {
    "title": (32.0, 16.0),
    "section_header": (24.0, 12.0),
    "text": (16.0, 8.0),
    "list_item": (16.0, 4.0),
    "caption": (13.0, 4.0),
    "footnote": (12.0, 4.0),
    "code": (14.0, 8.0),
    "formula": (16.0, 8.0),
    "page_header": (12.0, 0.0),
    "page_footer": (12.0, 0.0),
    "checkbox_selected": (16.0, 4.0),
    "checkbox_unselected": (16.0, 4.0),
}
_ROW_H = 28.0      # table row height
_PIC_H = 240.0     # fixed picture box height
_LINE_SPACING = 1.25


def _n_lines(text: str, font_px: float, content_w: float) -> int:
    """Wrapped line count at the fixed 0.5em advance metric."""
    if not text:
        return 1
    cap = max(1, int(content_w / (0.5 * font_px)))
    lines = 0
    for hard in text.split("\n"):
        lines += max(1, -(-len(hard) // cap))
    return lines


def _block_height(kind: str, text: str, media_ref: str,
                  content_w: float) -> float:
    if kind == "table":
        try:
            n_rows = len(json.loads(media_ref[5:]).get("cells") or [])
        except (json.JSONDecodeError, AttributeError):
            n_rows = 0
        return max(1, n_rows) * _ROW_H
    if kind == "picture":
        return _PIC_H
    font, _gap = _KIND_FONT.get(kind, (16.0, 8.0))
    return _n_lines(text, font, content_w) * font * _LINE_SPACING


def layout_spans(
    spans: list[dict], viewport_w: float = VIEWPORT_W,
    viewport_h: float = VIEWPORT_H,
) -> list[dict]:
    """Spans in reading order → provenance rects.

    Returns one dict per span: ``{offset, page_no, l, t, r, b}`` with t/b
    in PAGE-LOCAL coordinates (top-left origin, like the reference's
    rendered-page provenance). Deterministic in the span sequence."""
    content_w = viewport_w - 2 * PAD
    out: list[dict] = []
    y = PAD  # flow position within the current page
    page = 1
    for s in spans:
        kind = s["kind"]
        _font, gap = _KIND_FONT.get(kind, (16.0, 8.0))
        h = _block_height(kind, s["text"] or "", s["media_ref"] or "",
                          content_w)
        y += gap
        if y + h > viewport_h - PAD and y > PAD:
            page += 1
            y = PAD
        out.append({
            "offset": s["offset"],
            "page_no": page,
            "l": PAD,
            "t": round(y, 2),
            "r": round(PAD + content_w, 2),
            "b": round(y + h, 2),
        })
        y += h
    return out


def render_bboxes_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: extraction output rows → one provenance
    rect row per span."""
    doc_ids, offs, pages, ls, ts, rs, bs = [], [], [], [], [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for rect in layout_spans(spans or []):
            doc_ids.append(did)
            offs.append(rect["offset"])
            pages.append(rect["page_no"])
            ls.append(rect["l"])
            ts.append(rect["t"])
            rs.append(rect["r"])
            bs.append(rect["b"])
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "offset": pa.array(offs, pa.int32()),
        "page_no": pa.array(pages, pa.int32()),
        "l": pa.array(ls, pa.float64()),
        "t": pa.array(ts, pa.float64()),
        "r": pa.array(rs, pa.float64()),
        "b": pa.array(bs, pa.float64()),
    })
