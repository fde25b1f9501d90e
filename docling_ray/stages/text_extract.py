"""Plain-text / markdown-ish → span extractor.

Covers the reference's Markdown/TXT backend surface
(``docling/backend/md_backend.py:98-759``) for the subset used by the
interleaved corpus: ATX headings, bullet/numbered list items, fenced code
blocks, blank-line paragraph separation. (The reference walks a marko AST;
our rebuild is a line scanner — same observable span output for this
grammar subset.)
"""

from __future__ import annotations

import re

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace

Span = tuple[str, str, str]

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*\S)\s*$")
_BULLET_RE = re.compile(r"^\s*[-*+]\s+(.*\S)\s*$")
_NUMBERED_RE = re.compile(r"^\s*\d+[.)]\s+(.*\S)\s*$")
_FENCE_RE = re.compile(r"^\s*```")
_FORMULA_RE = re.compile(r"^\s*\$\$(.+)\$\$\s*$")


def extract_text(raw: str) -> list[Span]:
    spans: list[Span] = []
    lines = clean_unicode(raw).split("\n")
    para: list[str] = []
    code: list[str] | None = None

    def flush_para() -> None:
        if para:
            text = collapse_whitespace(" ".join(para))
            if text:
                spans.append(("text", text, ""))
            para.clear()

    for line in lines:
        if code is not None:
            if _FENCE_RE.match(line):
                spans.append(("code", "\n".join(code), ""))
                code = None
            else:
                code.append(line)
            continue
        if _FENCE_RE.match(line):
            flush_para()
            code = []
            continue
        m = _FORMULA_RE.match(line)
        if m:
            flush_para()
            spans.append(("formula", collapse_whitespace(m.group(1)), ""))
            continue
        m = _HEADING_RE.match(line)
        if m:
            flush_para()
            kind = "title" if len(m.group(1)) == 1 else "section_header"
            spans.append((kind, collapse_whitespace(m.group(2)), ""))
            continue
        m = _BULLET_RE.match(line) or _NUMBERED_RE.match(line)
        if m:
            flush_para()
            spans.append(("list_item", collapse_whitespace(m.group(1)), ""))
            continue
        if not line.strip():
            flush_para()
            continue
        para.append(line.strip())
    if code is not None and code:
        spans.append(("code", "\n".join(code), ""))
    flush_para()
    return spans


def extract_media(caption_text: str, media_ref: str) -> list[Span]:
    """``media`` input span → picture span (+ caption when alt text present)."""
    spans: list[Span] = [("picture", "", media_ref)]
    cap = collapse_whitespace(clean_unicode(caption_text or ""))
    if cap:
        spans.append(("caption", cap, ""))
    return spans
