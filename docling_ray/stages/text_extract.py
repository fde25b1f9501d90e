"""Plain-text / markdown → span extractor.

Covers the reference's Markdown/TXT backend surface
(``docling/backend/md_backend.py:98-759``): ATX + setext headings,
bullet/numbered list items, fenced code blocks, blank-line paragraph
separation, pipe tables (``md_backend.py:204-257`` — row 0 header,
separator row skipped, simple cells only), blockquotes, inline links
(flattened to their anchor text in the span stream, preserved in the
:func:`extract_md_links` companion stream — the reference attaches
them as item hyperlink attributes), inline images (picture span +
title caption, alt text kept in the flow — ``md_backend.py:449-466``),
and embedded-HTML delegation to the HTML extractor
(``md_backend.py:682-716`` re-parses HTML blocks with the HTML
backend; this rebuild delegates each block's fragment in place, with
furniture inference off exactly as the reference passes
``infer_furniture=False``). The reference walks a marko AST; our
rebuild is a line scanner — same observable span output for this
grammar subset. Ordering convention for inline images follows the
repo's other backends (picture, then caption, then alt text) rather
than the reference's caption-first order.
"""

from __future__ import annotations

import re

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.functions.refs import grid_media_ref

Span = tuple[str, str, str]

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*\S)\s*$")
_BULLET_RE = re.compile(r"^\s*[-*+]\s+(.*\S)\s*$")
_NUMBERED_RE = re.compile(r"^\s*\d+[.)]\s+(.*\S)\s*$")
_FENCE_RE = re.compile(r"^\s*```")
_FORMULA_RE = re.compile(r"^\s*\$\$(.+)\$\$\s*$")
_SETEXT_H1_RE = re.compile(r"^ {0,3}=+\s*$")
_SETEXT_H2_RE = re.compile(r"^ {0,3}-{2,}\s*$")
_HR_RE = re.compile(r"^ {0,3}([-_*])\s*(?:\1\s*){2,}$")
_QUOTE_RE = re.compile(r"^ {0,3}> ?")
_HTML_BLOCK_RE = re.compile(r"^ {0,3}<(?:[a-zA-Z][a-zA-Z0-9-]*|!--|/)")
# CommonMark-ish inline link/image: [text](dest "title") / ![alt](...)
_LINK_RE = re.compile(
    r"(?<!!)\[([^\]\[]*)\]\(\s*(<[^<>]*>|[^()\s]+)"
    r"(?:\s+(\"[^\"]*\"|'[^']*'))?\s*\)")
_IMAGE_RE = re.compile(
    r"!\[([^\]\[]*)\]\(\s*(<[^<>]*>|[^()\s]+)"
    r"(?:\s+(\"[^\"]*\"|'[^']*'))?\s*\)")


def _clean_dest(dest: str) -> str:
    return dest[1:-1] if dest.startswith("<") and dest.endswith(">") else dest


def _strip_inline(text: str) -> str:
    """Flatten inline markup out of flow text: links → anchor text,
    images → alt text (the span model keeps annotations in companion
    streams)."""
    text = _IMAGE_RE.sub(lambda m: m.group(1), text)
    return _LINK_RE.sub(lambda m: m.group(1), text)


def _close_table(spans: list[Span], rows: list[str]) -> None:
    """Pipe-table buffer → expanded-grid table span. Mirrors the
    reference's _close_table (md_backend.py:204-257): cells are
    ``split("|")[1:-1]`` stripped, row 0 is the header, row 1 (the
    ``---|---`` separator) is skipped, no row/col spans; ragged rows
    are padded to the widest row so the canonical grid stays
    rectangular."""
    if not rows:
        return
    grid: list[list[str]] = []
    for n, raw in enumerate(rows):
        if n == 1:
            continue
        cells = [collapse_whitespace(_strip_inline(c.strip()))
                 for c in raw.split("|")[1:-1]]
        grid.append(cells)
    if not grid or not any(grid):
        return
    width = max(len(r) for r in grid)
    grid = [r + [""] * (width - len(r)) for r in grid]
    spans.append(("table", "", grid_media_ref(grid)))


def extract_text(raw: str) -> list[Span]:
    spans: list[Span] = []
    lines = clean_unicode(raw).split("\n")
    para: list[str] = []
    code: list[str] | None = None
    table: list[str] = []
    html_block: list[str] = []
    quote_depth = 0

    def flush_para(kind: str = "text") -> None:
        if para:
            flow = " ".join(para)
            para.clear()
            # inline images split the flow: picture (+ title caption,
            # + alt as flow text) in order of appearance
            pos = 0
            segs: list[tuple[str, tuple[str, str, str] | None]] = []
            for m in _IMAGE_RE.finditer(flow):
                segs.append((flow[pos:m.start()], m.groups()))
                pos = m.end()
            segs.append((flow[pos:], None))
            if kind != "text" or len(segs) == 1:
                text = collapse_whitespace(_strip_inline(flow))
                if text:
                    spans.append((kind, text, ""))
                return
            for seg, img in segs:
                text = collapse_whitespace(_strip_inline(seg))
                if text:
                    spans.append(("text", text, ""))
                if img is not None:
                    alt, dest, title = img
                    spans.append(("picture", "", _clean_dest(dest)))
                    cap = collapse_whitespace(title[1:-1]) if title else ""
                    if cap:
                        spans.append(("caption", cap, ""))
                    alt_text = collapse_whitespace(alt)
                    if alt_text:
                        spans.append(("text", alt_text, ""))

    def flush_html() -> None:
        if html_block:
            from docling_ray.stages.html_extract import HtmlExtractor

            fragment = "\n".join(html_block)
            html_block.clear()
            spans.extend(HtmlExtractor(infer_furniture=False)
                         .extract(fragment))

    for line in lines:
        if code is not None:
            if _FENCE_RE.match(line):
                spans.append(("code", "\n".join(code), ""))
                code = None
            else:
                code.append(line)
            continue
        if html_block:
            if line.strip():
                html_block.append(line)
                continue
            flush_html()
        # blockquote markers strip off; a depth change closes the
        # current paragraph (a new quote block starts)
        depth = 0
        while True:
            m = _QUOTE_RE.match(line)
            if not m:
                break
            line = line[m.end():]
            depth += 1
        if depth != quote_depth:
            flush_para()
            if table:
                _close_table(spans, table)
                table = []
            quote_depth = depth
        stripped = line.strip()
        if table:
            if stripped.startswith("|"):
                table.append(stripped)
                continue
            _close_table(spans, table)
            table = []
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
            spans.append((kind,
                          collapse_whitespace(_strip_inline(m.group(2))),
                          ""))
            continue
        # setext underline promotes the open paragraph to a heading
        if para and _SETEXT_H1_RE.match(line):
            flush_para("title")
            continue
        if para and _SETEXT_H2_RE.match(line):
            flush_para("section_header")
            continue
        if _HR_RE.match(line):
            flush_para()
            continue
        m = _BULLET_RE.match(line) or _NUMBERED_RE.match(line)
        if m:
            flush_para()
            spans.append(("list_item",
                          collapse_whitespace(_strip_inline(m.group(1))),
                          ""))
            continue
        if stripped.startswith("|"):
            flush_para()
            table = [stripped]
            continue
        if not stripped:
            flush_para()
            continue
        if not para and _HTML_BLOCK_RE.match(line):
            html_block.append(line)
            continue
        para.append(stripped)
    if code is not None and code:
        spans.append(("code", "\n".join(code), ""))
    if table:
        _close_table(spans, table)
    flush_html()
    flush_para()
    return spans


def extract_md_links(raw: str) -> list[tuple[str, str, str]]:
    """Hyperlink annotations from markdown inline links: (anchor_text,
    href, region) in document order — the markdown twin of
    html_extract.extract_links (the reference resolves these into item
    hyperlink attributes, md_backend.py:478-482). Fenced code blocks
    are opaque; markdown has no furniture model, so region is always
    "body"."""
    out: list[tuple[str, str, str]] = []
    in_code = False
    for line in clean_unicode(raw).split("\n"):
        if _FENCE_RE.match(line):
            in_code = not in_code
            continue
        if in_code:
            continue
        for m in _LINK_RE.finditer(line):
            text = collapse_whitespace(_strip_inline(m.group(1)))
            out.append((text, _clean_dest(m.group(2)), "body"))
    return out


def extract_media(caption_text: str, media_ref: str) -> list[Span]:
    """``media`` input span → picture span (+ caption when alt text present)."""
    spans: list[Span] = [("picture", "", media_ref)]
    cap = collapse_whitespace(clean_unicode(caption_text or ""))
    if cap:
        spans.append(("caption", cap, ""))
    return spans
