"""Heading-hierarchy assignment: section levels from numbering patterns.

Rebuild of the reference's ``HeadingHierarchyModel``
(``docling/models/stages/heading_hierarchy/heading_hierarchy_model.py:1-110``):
precedence there is bookmarks > numbering > font size; our span model has no
bookmarks, so numbering governs, with flat fallback. Numbering families
(``:43-110``): PART/CHAPTER/ARTICLE keywords, roman numerals, arabic dotted
(``1.``, ``1.1``, ``1.1.1``), alpha markers (``(a)``, ``a)``).

Operator shape: a vectorized ``map_batches`` stage over extraction output
that explodes heading spans to ``(doc_id, offset, text, level)`` rows.
``title`` spans are level 0; ``section_header`` levels start at 1.
"""

from __future__ import annotations

import re

import pyarrow as pa

_ARABIC_RE = re.compile(r"^(\d+(?:\.\d+)*)[.)]?\s+")
_ALPHA_RE = re.compile(r"^\(?([a-z])[.)]\s+")
_ROMAN_RE = re.compile(r"^\(?([ivxlcdm]+)[.)]\s+", re.IGNORECASE)
_KEYWORD_RE = re.compile(r"^(part|chapter|article|section|appendix)\b", re.IGNORECASE)

_ROMAN_CHARS = set("ivxlcdmIVXLCDM")


def heading_level(text: str, prev_level: int = 1) -> int:
    """Level for one section_header text (1-based)."""
    m = _ARABIC_RE.match(text)
    if m:
        return m.group(1).count(".") + 1
    m = _ROMAN_RE.match(text)
    if m and set(m.group(1)) <= _ROMAN_CHARS:
        return 1
    if _ALPHA_RE.match(text):
        # alpha markers sit below the enclosing numbered level
        return prev_level + 1
    if _KEYWORD_RE.match(text):
        return 1
    return prev_level  # unnumbered: sibling of the previous heading


def assign_levels(spans: list[dict]) -> list[tuple[int, str, int]]:
    """Extraction spans → [(offset, text, level)] for title/section_header."""
    out: list[tuple[int, str, int]] = []
    prev = 1
    for s in spans:
        if s["kind"] == "title":
            out.append((s["offset"], s["text"], 0))
            prev = 1
        elif s["kind"] == "section_header":
            lvl = heading_level(s["text"], prev)
            out.append((s["offset"], s["text"], lvl))
            prev = lvl
    return out


def heading_levels_batch(batch: pa.Table) -> pa.Table:
    doc_ids, offsets, texts, levels = [], [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for off, text, lvl in assign_levels(spans or []):
            doc_ids.append(did)
            offsets.append(off)
            texts.append(text)
            levels.append(lvl)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "offset": pa.array(offsets, pa.int32()),
        "text": pa.array(texts, pa.string()),
        "level": pa.array(levels, pa.int32()),
    })


def assign_levels_with_bookmarks(
    spans: list[dict], outline: list[dict],
) -> list[tuple[int, str, int]]:
    """Bookmark-precedence variant (reference precedence: bookmarks >
    numbering > font size, heading_hierarchy_model.py:1-26 +
    utils/pdf_outline.py): a heading whose text equals a PDF outline
    entry's title takes the outline's depth (+1 — outline depth 0 is our
    title level 0 / section level 1); everything else falls back to the
    numbering rules."""
    by_title: dict[str, int] = {}
    for o in outline:
        by_title.setdefault(o["title"], int(o["level"]))
    out: list[tuple[int, str, int]] = []
    prev = 1
    for s in spans:
        if s["kind"] == "title":
            out.append((s["offset"], s["text"], 0))
            prev = 1
        elif s["kind"] == "section_header":
            if s["text"] in by_title:
                lvl = max(1, by_title[s["text"]])  # section levels start at 1
            else:
                lvl = heading_level(s["text"], prev)
            out.append((s["offset"], s["text"], lvl))
            prev = lvl
    return out
