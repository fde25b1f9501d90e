"""Office Open XML backends: WordprocessingML and SpreadsheetML payloads.

Rebuilds the core semantics of the reference's MS Office backends over
stdlib ``xml.etree`` (the reference uses python-docx/openpyxl, not present
here; the corpus carries the inner XML parts as span payloads):

  * ``docx_xml`` — one WordprocessingML ``document.xml``
    (``docling/backend/msword_backend.py:244-...``): paragraph styles →
    Title/Heading levels (``:1096-1147``), ``numPr`` numbering →
    ``list_item`` (``:919-1095``), tables with ``gridSpan``/``vMerge``
    resolved into the canonical expanded grid (same serialization as the
    HTML/PDF tables), ``drawing`` blips → ``picture`` spans.
  * ``xlsx_xml`` — one SpreadsheetML ``sheet.xml``
    (``docling/backend/msexcel_backend.py:246-...``): ``sheetData`` cells
    at A1-style refs → one ``table`` span per sheet; inline strings and
    numeric values; blank-row/column trimmed bounding region (the
    reference's rectangular DataRegion, ``:126``).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.stages.html_extract import grid_media_ref

Span = tuple[str, str, str]

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"

_HEADING_STYLE_RE = re.compile(r"^heading\s*(\d)$", re.IGNORECASE)


def _para_text(p: ET.Element) -> str:
    parts = []
    for t in p.iter(f"{_W}t"):
        parts.append(t.text or "")
    for _ in p.iter(f"{_W}br"):
        pass  # soft breaks collapse into the flow
    return collapse_whitespace(clean_unicode("".join(parts)))


def _para_style(p: ET.Element) -> str:
    el = p.find(f"{_W}pPr/{_W}pStyle")
    return (el.get(f"{_W}val") or "") if el is not None else ""


def _is_list_para(p: ET.Element) -> bool:
    return p.find(f"{_W}pPr/{_W}numPr") is not None


def _docx_table(tbl: ET.Element) -> list[list[str]]:
    """tr/tc walk with gridSpan (colspan) and vMerge (rowspan continue)."""
    grid: list[list[str]] = []
    for tr in tbl.findall(f"{_W}tr"):
        row: list[str] = []
        ci = 0
        for tc in tr.findall(f"{_W}tc"):
            span_el = tc.find(f"{_W}tcPr/{_W}gridSpan")
            colspan = int(span_el.get(f"{_W}val", "1")) if span_el is not None else 1
            vmerge = tc.find(f"{_W}tcPr/{_W}vMerge")
            text = " ".join(
                t for t in (_para_text(p) for p in tc.findall(f"{_W}p")) if t
            )
            if (vmerge is not None
                    and (vmerge.get(f"{_W}val") or "continue") == "continue"
                    and grid and ci < len(grid[-1])):
                text = grid[-1][ci]  # rowspan continuation inherits above
            row.extend([text] * colspan)
            ci += colspan
        grid.append(row)
    ncols = max((len(r) for r in grid), default=0)
    return [r + [""] * (ncols - len(r)) for r in grid]


def extract_docx_xml(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    body = root.find(f"{_W}body")
    if body is None:
        return []
    spans: list[Span] = []
    for child in body:
        if child.tag == f"{_W}p":
            # pictures anchored in this paragraph
            for blip in child.iter(f"{_A}blip"):
                rid = blip.get(f"{_R}embed", "")
                spans.append(("picture", "", f"rel://{rid}"))
            text = _para_text(child)
            if not text:
                continue
            style = _para_style(child)
            m = _HEADING_STYLE_RE.match(style)
            if style.lower() == "title" or m and m.group(1) == "1":
                spans.append(("title" if style.lower() == "title" else
                              "section_header", text, ""))
            elif m:
                spans.append(("section_header", text, ""))
            elif _is_list_para(child):
                spans.append(("list_item", text, ""))
            else:
                spans.append(("text", text, ""))
        elif child.tag == f"{_W}tbl":
            grid = _docx_table(child)
            spans.append(("table", "", grid_media_ref(grid)))
    return spans


# ---------------------------------------------------------------------------
# SpreadsheetML
# ---------------------------------------------------------------------------

_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    out = 0
    for ch in ref:
        out = out * 26 + (ord(ch) - ord("A") + 1)
    return out - 1


def extract_xlsx_xml(raw: str, shared: list[str] | None = None) -> list[Span]:
    """``shared`` is the workbook's sharedStrings table (``t="s"`` cells
    hold an index into it — the container layer passes it; standalone
    inner-XML payloads use inline strings only)."""
    root = ET.fromstring(raw)
    cells: dict[tuple[int, int], str] = {}
    for c in root.iter(f"{_S}c"):
        m = _CELL_REF_RE.match(c.get("r", ""))
        if not m:
            continue
        ci, ri = _col_index(m.group(1)), int(m.group(2)) - 1
        text = ""
        is_el = c.find(f"{_S}is")
        if is_el is not None:
            text = "".join(t.text or "" for t in is_el.iter(f"{_S}t"))
        else:
            v = c.find(f"{_S}v")
            if v is not None:
                text = v.text or ""
                if c.get("t") == "s" and shared:
                    try:
                        text = shared[int(text)]
                    except (ValueError, IndexError):
                        pass  # bad index: keep the raw value
        text = collapse_whitespace(clean_unicode(text))
        if text:
            cells[(ri, ci)] = text
    if not cells:
        return []
    r0 = min(r for r, _ in cells)
    r1 = max(r for r, _ in cells)
    c0 = min(c for _, c in cells)
    c1 = max(c for _, c in cells)
    grid = [[cells.get((r, c), "") for c in range(c0, c1 + 1)]
            for r in range(r0, r1 + 1)]
    return [("table", "", grid_media_ref(grid))]
