"""Patent / financial / scanned-archive XML dialects: USPTO, XBRL, METS.

Rebuilds of the reference's remaining XML backends (SURVEY.md §2.1):

  * ``uspto`` — USPTO grant/application XML
    (``docling/backend/xml/uspto_backend.py:110``; the reference carries
    four dialect parsers — this subset reads the modern ICE grant shape):
    invention title → title, abstract → section + text, description
    paragraphs/headings, claims → ``Claims`` section with one list item
    per claim.
  * ``xbrl`` — XBRL instance documents
    (``docling/backend/xml/xbrl_backend.py:65``): contexts (period) +
    non-numeric-namespaced facts → one fact table (concept, context,
    unit, value), the reference's financial-fact extraction shape.
  * ``mets_gbs`` — METS scanned-book manifests
    (``docling/backend/mets_gbs_backend.py:55``): one page per structMap
    div with its image file reference → paginated picture spans + any
    OCR text content; pages ordered by ORDER attribute.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.stages.html_extract import grid_media_ref

Span = tuple[str, str, str]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text_of(el: ET.Element | None) -> str:
    if el is None:
        return ""
    return collapse_whitespace(clean_unicode("".join(el.itertext())))


def _find_local(root: ET.Element, name: str) -> ET.Element | None:
    for el in root.iter():
        if _local(el.tag) == name:
            return el
    return None


def _findall_local(root: ET.Element, name: str) -> list[ET.Element]:
    return [el for el in root.iter() if _local(el.tag) == name]


# ---------------------------------------------------------------------------
# USPTO
# ---------------------------------------------------------------------------

def extract_uspto(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    spans: list[Span] = []
    title = _text_of(_find_local(root, "invention-title"))
    if title:
        spans.append(("title", title, ""))
    abstract = _find_local(root, "abstract")
    if abstract is not None:
        texts = [t for t in (_text_of(p) for p in _findall_local(abstract, "p")) if t]
        if texts:
            spans.append(("section_header", "Abstract", ""))
            spans.extend(("text", t, "") for t in texts)
    desc = _find_local(root, "description")
    if desc is not None:
        spans.append(("section_header", "Description", ""))
        for el in desc:
            name = _local(el.tag)
            t = _text_of(el)
            if not t:
                continue
            if name == "heading":
                spans.append(("section_header", t, ""))
            elif name == "p":
                spans.append(("text", t, ""))
    claims = _find_local(root, "claims")
    if claims is not None:
        items = [t for t in (_text_of(c) for c in _findall_local(claims, "claim")) if t]
        if items:
            spans.append(("section_header", "Claims", ""))
            spans.extend(("list_item", t, "") for t in items)
    return spans


# ---------------------------------------------------------------------------
# XBRL
# ---------------------------------------------------------------------------

_XBRL_SKIP = {"context", "unit", "schemaRef", "roleRef", "arcroleRef",
              "footnoteLink"}


def extract_xbrl(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    periods: dict[str, str] = {}
    for ctx in _findall_local(root, "context"):
        cid = ctx.get("id", "")
        period = _find_local(ctx, "period")
        if period is not None:
            parts = [_text_of(p) for p in period]
            periods[cid] = "/".join(p for p in parts if p)
    grid: list[list[str]] = [["concept", "period", "unit", "value"]]
    for el in root:
        name = _local(el.tag)
        if name in _XBRL_SKIP or el.get("contextRef") is None:
            continue
        grid.append([
            name,
            periods.get(el.get("contextRef", ""), el.get("contextRef", "")),
            el.get("unitRef", ""),
            _text_of(el),
        ])
    if len(grid) == 1:
        return []
    return [("section_header", "Facts", ""),
            ("table", "", grid_media_ref(grid))]


# ---------------------------------------------------------------------------
# METS (scanned book)
# ---------------------------------------------------------------------------

def extract_mets(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    # file id → href
    files: dict[str, str] = {}
    for f in _findall_local(root, "file"):
        fid = f.get("ID", "")
        floc = _find_local(f, "FLocat")
        if floc is not None:
            for k, v in floc.attrib.items():
                if k.endswith("href"):
                    files[fid] = v
    spans: list[Span] = []
    pages = []
    for div in _findall_local(root, "div"):
        if (div.get("TYPE", "") or "").lower() != "page":
            continue
        order = int(div.get("ORDER", "0") or 0)
        refs = [fp.get("FILEID", "") for fp in _findall_local(div, "fptr")]
        label = collapse_whitespace(clean_unicode(div.get("LABEL", "") or ""))
        pages.append((order, label, refs))
    for order, label, refs in sorted(pages):
        header = label or f"Page {order}"
        spans.append(("page_header", header, ""))
        for rid in refs:
            if rid in files:
                spans.append(("picture", "", files[rid]))
    return spans


PATENT_FORMAT_EXTRACTORS = {
    "uspto": extract_uspto,
    "xbrl": extract_xbrl,
    "mets_gbs": extract_mets,
}
