"""PDF page-cells → span extractor (layout parse + reading order core).

A from-scratch geometric rebuild of the reference's PDF page-stage chain
(SURVEY.md §2.3): preprocessing parse-quality scoring
(``docling/models/stages/page_preprocessing/page_preprocessing_model.py:25-151``),
layout-region classification (``layout_object_detection_model.py`` +
``docling/utils/layout_postprocessor.py`` — rebuilt as a deterministic
geometric classifier, no NN), page assembly with hyphen-merge/ligature
sanitation (``page_assemble_model.py:33-157``) and a column-aware XY-cut
reading order (``readingorder_model.py:44-649``).

Input payload: one JSON document per page (the stand-in for docling-core's
``SegmentedPdfPage``, reference ``docling/backend/pdf_backend.py:18-56``):

    {"page_no": int, "width": f, "height": f,
     "cells":  [{"text": str, "l": f, "t": f, "r": f, "b": f, "font_size": f}],
     "tables": [{"l": f, "t": f, "r": f, "b": f}],          # ruling-derived regions
     "images": [{"l": f, "t": f, "r": f, "b": f, "media_ref": str}]}

``tables``/``images`` regions are the analogue of what the reference gets
from ruling lines / ``get_bitmap_rects`` (pdf_backend.py:41) + the layout
model; cells are classified against them geometrically.

Layout rules (deterministic, shared with the fixture generator):
  * margin bands: a cell fully above ``HEADER_BAND`` → ``page_header``;
    fully below ``height - FOOTER_BAND`` → ``page_footer`` (furniture split,
    page_assemble_model.py splits headers vs body).
  * footnotes: body cells with ``font_size <= FOOTNOTE_FONT`` are
    footnote lines, grouped into paragraphs and emitted AFTER the body
    columns, before the page footer (the reading-order footnote mapping,
    readingorder_model.py:309-399 — footnotes follow their page's body).
  * heading detection by font size: ``>= TITLE_FONT`` → ``title``,
    ``>= HEADING_FONT`` → ``section_header`` (stand-in for the reference's
    bookmark/numbering/font-size precedence, heading_hierarchy_model.py:1-26).
  * body cells cluster into columns by x-position (gap > ``COL_GAP``);
    reading order = left column fully before right (XY-cut).
  * within a column, consecutive cells with top-gap <= ``PARA_GAP`` and the
    same font size form one paragraph; lines join via
    ``sanitize_cell_text`` (hyphen merge + ligature expansion).
  * cells inside a table region → row/col clustering → one ``table`` span
    with the canonical expanded-grid media_ref (the TableFormer stand-in,
    table_structure_model.py:32 — rebuilt as x/y clustering per SURVEY §7.1).
  * a paragraph starting within ``CAPTION_GAP`` below a table/image region
    and horizontally overlapping it is its caption, emitted right after the
    region's span (caption mapping, readingorder_model.py:631-639).
  * page parse quality = 10th percentile of per-cell text quality
    (page_preprocessing_model.py:126-151); a page scoring below
    ``MIN_PARSE_SCORE`` is dropped and the document degrades to
    ``partial_success`` (standard_pdf_pipeline.py:1007-1026).
"""

from __future__ import annotations

import json

import numpy as np

from operator import itemgetter

from docling_ray.functions.normalize import (
    is_suspect_text,
    sanitize_cell_text,
    text_quality_score,
)
from docling_ray.stages.html_extract import grid_media_ref
from docling_ray.stages.layout_postprocess import dedupe_overlapping_items

Span = tuple[str, str, str]

# C-level sort keys (tuple-building lambdas dominate the page sorts);
# cells are plain tuples (l, t, r, b, font, text)
_BY_T_L = itemgetter(1, 0)
_BY_L_T = itemgetter(0, 1)
_BY_TOP_L = itemgetter("top", "l")

HEADER_BAND = 50.0
FOOTER_BAND = 50.0
TITLE_FONT = 18.0
HEADING_FONT = 14.0
COL_GAP = 20.0
PARA_GAP = 18.0
CAPTION_GAP = 26.0
MIN_PARSE_SCORE = 0.5
FOOTNOTE_FONT = 7.5  # body cells at or below this size are footnotes


def parse_page_payload(payload: str) -> dict:
    """Parse and minimally validate a page JSON payload. Raises ValueError."""
    page = json.loads(payload)
    if not isinstance(page, dict) or "cells" not in page:
        raise ValueError("pdf_cells payload missing 'cells'")
    page.setdefault("page_no", 0)
    page.setdefault("width", 612.0)
    page.setdefault("height", 792.0)
    page.setdefault("tables", [])
    page.setdefault("images", [])
    return page


def page_parse_score(texts: list[str]) -> float:
    """10th-percentile per-cell text quality (page_preprocessing parity).
    Linear-interpolated quantile computed in plain Python — numpy call
    overhead dominates at ~30 cells/page.

    Fast path: one suspect-marker regex scan over the page's JOINED cell
    text. Any per-cell match also matches in the join (each cell appears
    contiguously), so a clean join proves every cell scores 1.0 → the
    percentile is 1.0 without per-cell scoring. Empty cells score 0.0, so
    the fast path also requires every text non-empty. A cross-cell false
    positive in the join merely falls through to the exact per-cell path."""
    if not texts:
        return 1.0
    if all(texts) and not is_suspect_text("\n".join(texts)):
        return 1.0
    scores = sorted(text_quality_score(t) for t in texts)
    pos = 0.1 * (len(scores) - 1)
    lo = int(pos)
    frac = pos - lo
    if lo + 1 >= len(scores):
        return float(scores[lo])
    return float(scores[lo] * (1.0 - frac) + scores[lo + 1] * frac)


def _center(c: dict) -> tuple[float, float]:
    return (0.5 * (c["l"] + c["r"]), 0.5 * (c["t"] + c["b"]))


def _in_region(c: dict, reg: dict) -> bool:
    x, y = _center(c)
    return reg["l"] <= x <= reg["r"] and reg["t"] <= y <= reg["b"]


def _cluster_positions(vals: list[float], tol: float) -> list[float]:
    """1-D cluster centers for sorted positions (columns/rows of a grid)."""
    out: list[list[float]] = []
    for v in sorted(vals):
        if out and v - out[-1][-1] <= tol:
            out[-1].append(v)
        else:
            out.append([v])
    return [sum(g) / len(g) for g in out]


def _nearest_index(pos: list[float], v: float) -> int:
    """Index of the nearest cluster center (pos is sorted; bisect beats a
    per-cell argmin by ~10x at grid sizes)."""
    from bisect import bisect_left

    i = bisect_left(pos, v)
    if i == 0:
        return 0
    if i >= len(pos):
        return len(pos) - 1
    return i if pos[i] - v < v - pos[i - 1] else i - 1


def _nearest_indices(pos: list[float], vals: list[float]) -> "np.ndarray":
    """Vectorized :func:`_nearest_index` over all cells at once (same
    tie rule: the left center wins an exact midpoint)."""
    p = np.asarray(pos, dtype=np.float64)
    v = np.asarray(vals, dtype=np.float64)
    if len(p) == 1:
        return np.zeros(len(v), dtype=np.int64)
    i = np.clip(np.searchsorted(p, v), 1, len(p) - 1)
    return np.where(p[i] - v < v - p[i - 1], i, i - 1)


def table_grid_from_cells(
    cells: list[tuple], rich_pics: list[dict] | None = None,
) -> list[list[str]]:
    """Row/col clustering of region cells into a canonical text grid.

    ``rich_pics`` are picture regions matched INTO this table (the
    reference's picture-in-table-cell rich cells,
    readingorder_model.py:162-302): each is located at the text cell
    containing (else nearest to) its center, and its media_ref is
    appended to that cell's text as a ``[ref]`` marker — the string-grid
    analogue of a rich cell holding a FigureElement."""
    if not cells:
        return []
    col_pos = _cluster_positions([c[0] for c in cells], tol=4.0)
    row_pos = _cluster_positions([c[1] for c in cells], tol=4.0)
    grid = [["" for _ in col_pos] for _ in row_pos]
    cis = _nearest_indices(col_pos, [c[0] for c in cells])
    ris = _nearest_indices(row_pos, [c[1] for c in cells])
    for ri, ci, c in zip(ris.tolist(), cis.tolist(), cells):
        t = c[5]
        txt = t.strip() if t.isascii() else sanitize_cell_text([t])
        if grid[ri][ci]:
            grid[ri][ci] += " " + txt
        else:
            grid[ri][ci] = txt
    coords = (list(zip(ris.tolist(), cis.tolist(), cells))
              if rich_pics else [])
    for pic in rich_pics or ():
        px = 0.5 * (pic["l"] + pic["r"])
        py = 0.5 * (pic["t"] + pic["b"])
        host = None
        for ri, ci, c in coords:
            if c[0] <= px <= c[2] and c[1] <= py <= c[3]:
                host = (ri, ci)
                break
        if host is None:  # no containing text cell: nearest by center
            host = min(
                ((ri, ci) for ri, ci, c in coords),
                key=lambda rc: abs(col_pos[rc[1]] - px)
                + abs(row_pos[rc[0]] - py),
            )
        ri, ci = host
        marker = f"[{pic.get('media_ref', '')}]"
        grid[ri][ci] = (grid[ri][ci] + " " + marker).strip()
    return grid


def _split_columns(cells: list[tuple]) -> list[list[tuple]]:
    """Split body cells into columns: sort by left edge, cut where the next
    cell starts right of the running max right edge + COL_GAP."""
    if not cells:
        return []
    ordered = sorted(cells, key=_BY_L_T)
    cols: list[list[tuple]] = [[ordered[0]]]
    max_r = ordered[0][2]
    for c in ordered[1:]:
        if c[0] > max_r + COL_GAP:
            cols.append([c])
            max_r = c[2]
        else:
            cols[-1].append(c)
            max_r = max(max_r, c[2])
    return cols


def _paragraphs(col_cells: list[tuple]) -> list[dict]:
    """Group a column's cells into paragraph/heading items by vertical gap
    and font-size change. Returns items: {top, l, r, b, font, lines}."""
    items: list[dict] = []
    cur: dict | None = None
    for c in sorted(col_cells, key=_BY_T_L):
        l, t, r, b, font, text = c
        if (
            cur is not None
            and font == cur["font"]
            and t - cur["last_t"] <= PARA_GAP
            and font < HEADING_FONT  # headings never merge lines
        ):
            cur["lines"].append(text)
            cur["last_t"] = t
            if b > cur["b"]:
                cur["b"] = b
            if l < cur["l"]:
                cur["l"] = l
            if r > cur["r"]:
                cur["r"] = r
        else:
            cur = {
                "top": t,
                "last_t": t,
                "l": l,
                "r": r,
                "b": b,
                "font": font,
                "lines": [text],
            }
            items.append(cur)
    return items


def _h_overlap(a_l: float, a_r: float, b_l: float, b_r: float) -> float:
    return max(0.0, min(a_r, b_r) - max(a_l, b_l))


def extract_page(page: dict) -> tuple[list[Span], float]:
    """One page → (spans in reading order, parse_score). A page scoring below
    MIN_PARSE_SCORE returns no spans (caller degrades doc status)."""
    # one dict-extraction pass: every later stage reads the plain tuple
    # (l, t, r, b, font, text) — dict hashing out of the hot loops
    cells = [
        (c["l"], c["t"], c["r"], c["b"],
         float(c.get("font_size", 10.0)), c.get("text", ""))
        for c in page["cells"]
    ]
    # duplicated-text-layer dedup (a PDF carrying an original + an OCR
    # layer stamps every line twice, reference _deduplicate_cells,
    # layout_postprocessor.py:592): same text at the same ~2pt-quantized
    # anchor is one cell. Identity for well-formed pages — distinct
    # lines never share an anchor.
    if len(cells) > 1:
        seen: set = set()
        uniq = []
        for c in cells:
            k = (round(c[0] * 0.5), round(c[1] * 0.5), c[5])
            if k not in seen:
                seen.add(k)
                uniq.append(c)
        if len(uniq) < len(cells):
            cells = uniq
    score = page_parse_score([c[5] for c in cells])
    if score < MIN_PARSE_SCORE:
        return [], score
    height = float(page["height"])

    headers: list[tuple] = []
    footers: list[tuple] = []
    mid: list[tuple] = []
    for c in cells:
        if c[3] <= HEADER_BAND:
            headers.append(c)
        elif c[1] >= height - FOOTER_BAND:
            footers.append(c)
        else:
            mid.append(c)

    footnotes = [c for c in mid if c[4] <= FOOTNOTE_FONT]
    mid = [c for c in mid if c[4] > FOOTNOTE_FONT]

    regions: list[dict] = []
    for reg in page.get("tables", []):
        regions.append({**reg, "kind": "table", "cells": [],
                        "rich_pics": []})
    # a picture mostly inside a table region becomes that table's rich
    # cell, not an independent flow item (readingorder_model.py:162-302)
    for reg in page.get("images", []):
        cx = 0.5 * (reg["l"] + reg["r"])
        cy = 0.5 * (reg["t"] + reg["b"])
        host = None
        for tr in regions:
            if tr["l"] <= cx <= tr["r"] and tr["t"] <= cy <= tr["b"]:
                host = tr
                break
        if host is not None:
            host["rich_pics"].append(reg)
        else:
            regions.append({**reg, "kind": "picture", "cells": []})

    body: list[tuple] = []
    for c in mid:
        # inlined _in_region/_center: this is cells × regions, the page's
        # hottest loop — function-call overhead dominates at ~30 cells/page
        x = 0.5 * (c[0] + c[2])
        y = 0.5 * (c[1] + c[3])
        for reg in regions:
            if reg["l"] <= x <= reg["r"] and reg["t"] <= y <= reg["b"]:
                reg["cells"].append(c)
                break
        else:
            body.append(c)

    spans: list[Span] = []
    for c in sorted(headers, key=_BY_T_L):
        t = c[5]
        txt = t.strip() if t.isascii() else sanitize_cell_text([t])
        if txt:
            spans.append(("page_header", txt, ""))

    # column-aware flow: columns are detected over body cells AND region
    # boxes together (a column may contain only a figure), then each
    # column's cells become paragraph items and its regions become
    # table/picture items, ordered by top y. A region rides the column
    # split as a pseudo-cell tuple carrying its dict at index 5.
    reg_tuples = [
        (reg["l"], reg["t"], reg["r"], reg["b"], 0.0, reg)
        for reg in regions
    ]
    cols = _split_columns(body + reg_tuples)
    col_items: list[list[dict]] = []
    for cc in cols:
        cell_part = [c for c in cc if type(c[5]) is str]
        reg_part = [c for c in cc if type(c[5]) is not str]
        items = _paragraphs(cell_part)
        for rt in reg_part:
            reg = rt[5]
            items.append(
                {"top": reg["t"], "l": reg["l"], "r": reg["r"], "b": reg["b"],
                 "font": 0.0, "region": reg}
            )
        col_items.append(items)

    for items in col_items:
        if len(items) > 1:
            # collapse duplicated text layers (identity on disjoint
            # layouts; stages/layout_postprocess.dedupe_overlapping_items)
            items = dedupe_overlapping_items(items)
        items.sort(key=_BY_TOP_L)
        # caption matching: paragraph starting just below a region, overlapping it
        consumed: set[int] = set()
        caption_of: dict[int, int] = {}  # region item idx -> caption item idx
        for ri, it in enumerate(items):
            if "region" not in it:
                continue
            for pi, cand in enumerate(items):
                if pi in consumed or "region" in cand:
                    continue
                if (
                    0.0 <= cand["top"] - it["b"] <= CAPTION_GAP
                    and _h_overlap(it["l"], it["r"], cand["l"], cand["r"]) > 0.0
                ):
                    caption_of[ri] = pi
                    consumed.add(pi)
                    break
        for idx, it in enumerate(items):
            if idx in consumed:
                continue
            if "region" in it:
                reg = it["region"]
                if reg["kind"] == "table":
                    grid = table_grid_from_cells(reg["cells"],
                                                 reg.get("rich_pics"))
                    spans.append(("table", "", grid_media_ref(grid)))
                else:
                    spans.append(("picture", "", reg.get("media_ref", "")))
                if idx in caption_of:
                    cap = items[caption_of[idx]]
                    txt = sanitize_cell_text(cap["lines"])
                    if txt:
                        spans.append(("caption", txt, ""))
            else:
                txt = sanitize_cell_text(it["lines"])
                if not txt:
                    continue
                if it["font"] >= TITLE_FONT:
                    spans.append(("title", txt, ""))
                elif it["font"] >= HEADING_FONT:
                    spans.append(("section_header", txt, ""))
                else:
                    spans.append(("text", txt, ""))

    for c in sorted(footnotes, key=_BY_T_L):
        t = c[5]
        txt = t.strip() if t.isascii() else sanitize_cell_text([t])
        if txt:
            spans.append(("footnote", txt, ""))

    for c in sorted(footers, key=_BY_T_L):
        t = c[5]
        txt = t.strip() if t.isascii() else sanitize_cell_text([t])
        if txt:
            spans.append(("page_footer", txt, ""))
    return spans, score


def extract_pdf_unit(payload: str) -> tuple[list[Span], int, float, str | None]:
    """One pdf_cells input span (= one page) → (spans, page_no, score, error)."""
    try:
        page = parse_page_payload(payload)
    except (ValueError, json.JSONDecodeError) as e:
        return [], -1, 0.0, f"pdf_cells parse error: {e}"
    spans, score = extract_page(page)
    err = None
    if not spans and score < MIN_PARSE_SCORE:
        err = f"page {page['page_no']} dropped: parse_score={score:.3f}"
    return spans, int(page["page_no"]), score, err
