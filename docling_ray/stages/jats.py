"""JATS scientific-article XML backend.

Rebuild of the reference's JATS backend semantics
(``docling/backend/xml/jats_backend.py:137-...``): article-title → title,
abstract paragraphs prefixed by an ``Abstract`` section header, recursive
``sec`` walk (sec/title → section_header, ``p`` → text, lists, figures
with graphics + captions, table-wrap delegating to the HTML-style grid),
back-matter ``ref-list`` citations as list items under a ``References``
header. Stdlib ElementTree; JATS carries no default namespace.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.stages.html_extract import grid_media_ref

Span = tuple[str, str, str]


def _text_of(el: ET.Element | None) -> str:
    if el is None:
        return ""
    return collapse_whitespace(clean_unicode("".join(el.itertext())))


def _table_grid(table: ET.Element) -> list[list[str]]:
    grid: list[list[str]] = []
    for tr in table.iter("tr"):
        row = []
        for cell in tr:
            if cell.tag in ("td", "th"):
                colspan = int(cell.get("colspan", "1") or 1)
                row.extend([_text_of(cell)] * colspan)
        grid.append(row)
    ncols = max((len(r) for r in grid), default=0)
    return [r + [""] * (ncols - len(r)) for r in grid]


def _walk_sec(sec: ET.Element, spans: list[Span]) -> None:
    for child in sec:
        if child.tag == "title":
            t = _text_of(child)
            if t:
                spans.append(("section_header", t, ""))
        elif child.tag == "p":
            t = _text_of(child)
            if t:
                spans.append(("text", t, ""))
        elif child.tag == "sec":
            _walk_sec(child, spans)
        elif child.tag == "list":
            for item in child.iter("list-item"):
                t = _text_of(item)
                if t:
                    spans.append(("list_item", t, ""))
        elif child.tag == "fig":
            graphic = child.find(".//graphic")
            href = ""
            if graphic is not None:
                for k, v in graphic.attrib.items():
                    if k.endswith("href"):
                        href = v
            spans.append(("picture", "", href))
            cap = _text_of(child.find("caption"))
            if cap:
                spans.append(("caption", cap, ""))
        elif child.tag == "table-wrap":
            cap = _text_of(child.find("caption"))
            if cap:
                spans.append(("caption", cap, ""))
            table = child.find(".//table")
            if table is not None:
                spans.append(("table", "", grid_media_ref(_table_grid(table))))


def extract_jats(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    spans: list[Span] = []
    title = _text_of(root.find(".//front//article-title"))
    if title:
        spans.append(("title", title, ""))
    abstract = root.find(".//front//abstract")
    if abstract is not None:
        texts = [t for t in (_text_of(p) for p in abstract.iter("p")) if t]
        if texts:
            spans.append(("section_header", "Abstract", ""))
            spans.extend(("text", t, "") for t in texts)
    body = root.find("body")
    if body is not None:
        _walk_sec(body, spans)
    refs = root.findall(".//back//ref-list//ref")
    if refs:
        spans.append(("section_header", "References", ""))
        for ref in refs:
            t = _text_of(ref)
            if t:
                spans.append(("list_item", t, ""))
    return spans
