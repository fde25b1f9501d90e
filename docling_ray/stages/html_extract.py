"""HTML → span-sequence extractor (the DOM-heuristics core).

A from-scratch rebuild, on stdlib ``html.parser``, of the reference HTML
backend's semantics (``docling/backend/html_backend.py``, 4642 LoC — see
SURVEY.md §2.2). Behavior parity targets, with reference anchors:

  * drop ``script``/``style``/``noscript`` and any ``hidden`` element
    (html_backend.py:543-547); ``<head>``/``<title>`` are furniture
    (html_backend.py:533-541).
  * everything before the first heading is furniture and excluded from the
    body span stream when ``infer_furniture`` is on (html_backend.py:560-574);
    documents with no headings at all keep all content in the body (our
    documented choice — an all-furniture document would be useless).
  * ``<footer>`` subtrees are furniture (html_backend.py:2094).
  * heading dispatch: ``h1`` → ``title`` span, ``h2``-``h6`` →
    ``section_header`` (html_backend.py:2157-2228; the level-stack tree
    structure collapses away in the flat DFS span stream).
  * lists ``ul``/``ol``/``dl`` with nesting and ``start`` attributes →
    ``list_item`` spans in DFS order (html_backend.py:2418).
  * tables → one ``table`` span whose ``media_ref`` carries the canonical
    expanded grid (rowspan/colspan resolved, html_backend.py:1467-1599,
    2599-2621,4609-4633); ``<caption>`` → ``caption`` span before it.
  * ``<figure><img><figcaption>`` → ``picture`` span (media_ref = src) +
    ``caption`` span; bare ``<img>`` uses ``alt`` as caption
    (html_backend.py:2627-2632,4408).
  * ``<pre>`` → ``code`` span with internal whitespace preserved
    (html_backend.py:2740-2771).
  * inline formatting/anchors buffered across ``b/i/u/a/span/...`` and
    flushed at block boundaries; ``<br>`` splits the flushed text into
    separate spans (sentinel mechanism, html_backend.py:83,553-558,1600-1817).
  * unicode normalization per ``_clean_unicode`` (html_backend.py:4568-4606)
    — see ``docling_ray.functions.normalize.clean_unicode``.

North-rule addition (not in the reference): link-density boilerplate
stripping — a block whose anchor-text density exceeds ``link_density_max``
with at least ``min_links`` anchors (nav bars, link farms) is dropped.
``<nav>`` elements are always treated as boilerplate.

This module is pure Python with no Ray dependency; the pipeline wraps
``extract_html`` in ``map_batches`` (stateless task stage — per SURVEY.md
§2.2 no actor state is needed).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.functions.refs import grid_media_ref  # noqa: F401  (re-export)

Span = tuple[str, str, str]  # (kind, text, media_ref)

_VOID = {
    "img", "br", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
}
_DROP = {"script", "style", "noscript", "template", "svg", "iframe", "head"}
_INLINE = {
    "b", "strong", "i", "em", "u", "s", "strike", "sub", "sup", "span", "a",
    "code", "small", "mark", "abbr", "font", "q", "cite", "time", "var",
    "kbd", "samp", "bdi", "bdo", "data", "dfn", "ins", "del", "label",
}
_BLOCK = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "dl", "li",
    "dt", "dd", "table", "figure", "pre", "blockquote", "address", "summary",
    "details", "footer", "header", "nav", "section", "article", "main",
    "aside", "form", "fieldset", "tr", "td", "th", "thead", "tbody", "tfoot",
    "caption", "figcaption", "hr", "body", "html", "title", "math",
}
# Tags that auto-close an open <p> (subset of the reference's _PARA_BREAKERS,
# html_backend.py:113-147)
_P_BREAKERS = _BLOCK - {"body", "html"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # _Node | str
        self.parent = parent


class _DomBuilder(HTMLParser):
    """Tolerant DOM builder: void elements, implied </p>/</li>/</td> closes,
    stray end tags ignored."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        amap = {k.lower(): (v if v is not None else "") for k, v in attrs}
        # implied closes
        if tag in _P_BREAKERS:
            if self.cur.tag == "p":
                self.cur = self.cur.parent or self.root
        if tag == "li":
            while self.cur.tag in ("li",):
                self.cur = self.cur.parent or self.root
        if tag in ("dt", "dd"):
            while self.cur.tag in ("dt", "dd"):
                self.cur = self.cur.parent or self.root
        if tag in ("td", "th"):
            while self.cur.tag in ("td", "th"):
                self.cur = self.cur.parent or self.root
        if tag == "tr":
            while self.cur.tag in ("td", "th", "tr"):
                self.cur = self.cur.parent or self.root
        node = _Node(tag, amap, self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        amap = {k.lower(): (v if v is not None else "") for k, v in attrs}
        self.cur.children.append(_Node(tag, amap, self.cur))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in _VOID:
            return
        node = self.cur
        while node is not None and node.tag != tag:
            node = node.parent
        if node is not None and node.parent is not None:
            self.cur = node.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def build_dom(html: str) -> _Node:
    p = _DomBuilder()
    p.feed(html)
    p.close()
    return p.root


def _is_hidden(node: _Node) -> bool:
    if "hidden" in node.attrs:
        return True
    style = node.attrs.get("style", "")
    return "display:none" in style.replace(" ", "").lower()


def _inline_text(node: _Node) -> str:
    """Concatenate inline content; <br> becomes a newline split point."""
    parts: list[str] = []

    def rec(n: object) -> None:
        if isinstance(n, str):
            parts.append(n)
            return
        assert isinstance(n, _Node)
        if n.tag in _DROP or _is_hidden(n):
            return
        if n.tag == "br":
            parts.append("\n")
            return
        for c in n.children:
            rec(c)

    for c in node.children:
        rec(c)
    return "".join(parts)


def _norm_flow(raw: str) -> list[str]:
    """Normalize inline flow text: unicode cleanup, then split on <br> newlines,
    collapse whitespace per segment, drop empties."""
    cleaned = clean_unicode(raw)
    return [s for s in (collapse_whitespace(seg) for seg in cleaned.split("\n")) if s]


def _link_density(node: _Node) -> tuple[int, int, int]:
    """(n_anchors, anchor_text_chars, total_text_chars) for a subtree."""
    n_links = 0
    link_chars = 0
    total_chars = 0

    def rec(n: object, in_link: bool) -> None:
        nonlocal n_links, link_chars, total_chars
        if isinstance(n, str):
            t = collapse_whitespace(n)
            total_chars += len(t)
            if in_link:
                link_chars += len(t)
            return
        assert isinstance(n, _Node)
        if n.tag in _DROP or _is_hidden(n):
            return
        is_a = n.tag == "a"
        if is_a:
            n_links += 1
        for c in n.children:
            rec(c, in_link or is_a)

    rec(node, False)
    return n_links, link_chars, total_chars


def _span_int(attr: str | None) -> int:
    """colspan/rowspan attribute → int, default 1 (html_backend.py:4609-4633)."""
    if not attr:
        return 1
    s = str(attr).strip()
    num = ""
    for ch in s:
        if ch.isdigit():
            num += ch
        elif num:
            break
    if not s or not s[0].isdigit() or not num:
        return 1
    return max(1, int(num))


def parse_table_grid(table: _Node) -> tuple[list[list[str]], str]:
    """Build the canonical expanded grid (rowspan/colspan resolved, spanned
    cells replicated) and the caption text. Rows are <tr> anywhere under
    the table (thead/tbody/tfoot transparent), cells are td/th."""
    caption = ""
    rows: list[_Node] = []

    def find_rows(n: _Node) -> None:
        nonlocal caption
        for c in n.children:
            if not isinstance(c, _Node):
                continue
            if c.tag == "tr":
                rows.append(c)
            elif c.tag == "caption":
                caption = " ".join(_norm_flow(_inline_text(c)))
            elif c.tag in ("thead", "tbody", "tfoot"):
                find_rows(c)

    find_rows(table)
    grid: list[list[str | None]] = []
    max_cols = 0
    for ri, tr in enumerate(rows):
        while len(grid) <= ri:
            grid.append([])
        ci = 0
        for cell in tr.children:
            if not isinstance(cell, _Node) or cell.tag not in ("td", "th"):
                continue
            row = grid[ri]
            while ci < len(row) and row[ci] is not None:
                ci += 1
            cs = _span_int(cell.attrs.get("colspan"))
            rs = _span_int(cell.attrs.get("rowspan"))
            text = " ".join(_norm_flow(_inline_text(cell)))
            for dr in range(rs):
                while len(grid) <= ri + dr:
                    grid.append([])
                trow = grid[ri + dr]
                while len(trow) < ci + cs:
                    trow.append(None)
                for dc in range(cs):
                    if trow[ci + dc] is None:
                        trow[ci + dc] = text
            ci += cs
            max_cols = max(max_cols, ci)
    out = [[c if c is not None else "" for c in row] + [""] * (max_cols - len(row))
           for row in grid if True]
    return out, caption


# grid_media_ref moved to functions/refs.py (generator-shared layer, pinned
# by literal tests); re-exported here for the extractor stages that use it.


class HtmlExtractor:
    """Configurable HTML → spans extractor (pure function of the markup)."""

    def __init__(
        self,
        infer_furniture: bool = True,
        strip_boilerplate: bool = True,
        link_density_max: float = 0.65,
        min_links: int = 3,
    ):
        self.infer_furniture = infer_furniture
        self.strip_boilerplate = strip_boilerplate
        self.link_density_max = link_density_max
        self.min_links = min_links

    # -- public API --------------------------------------------------------
    def extract(self, html: str) -> list[Span]:
        dom = build_dom(html)
        spans: list[Span] = []
        self._has_heading = self._subtree_has_heading(dom)
        self._in_body = not (self.infer_furniture and self._has_heading)
        self._walk_children(dom, spans, pre=False)
        return spans

    # -- internals ----------------------------------------------------------
    def _subtree_has_heading(self, node: _Node) -> bool:
        stack: list[object] = [node]
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                continue
            if n.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
                return True
            if n.tag in _DROP or n.tag in ("footer", "nav"):
                continue
            stack.extend(n.children)
        return False

    def _emit(self, spans: list[Span], kind: str, text: str, media_ref: str = "") -> None:
        if self._in_body:
            spans.append((kind, text, media_ref))

    def _is_boilerplate(self, node: _Node) -> bool:
        if not self.strip_boilerplate:
            return False
        if node.tag == "nav":
            return True
        if node.tag in ("div", "section", "aside", "ul", "ol", "header"):
            n_links, link_chars, total = _link_density(node)
            if n_links >= self.min_links and total > 0:
                if link_chars / total > self.link_density_max:
                    return True
        return False

    def _walk_children(self, node: _Node, spans: list[Span], pre: bool) -> None:
        """Walk mixed inline/block children: buffer inline runs, flush them as
        text spans at block boundaries (the reference's AnnotatedTextList
        buffering, html_backend.py:1600-1817)."""
        buf: list[str] = []

        def flush() -> None:
            if not buf:
                return
            raw = "".join(buf)
            buf.clear()
            for seg in _norm_flow(raw):
                self._emit(spans, "text", seg)

        for c in node.children:
            if isinstance(c, str):
                buf.append(c)
                continue
            if c.tag in _DROP or _is_hidden(c):
                continue
            if c.tag == "br":
                buf.append("\n")
                continue
            if c.tag in _INLINE:
                buf.append(_inline_text(c))
                continue
            # block-level child: flush pending inline text first
            flush()
            self._handle_block(c, spans)
        flush()

    def _handle_block(self, node: _Node, spans: list[Span]) -> None:
        tag = node.tag
        if tag in _DROP or _is_hidden(node):
            return
        if tag == "title":
            return  # head furniture (html_backend.py:533-541)
        if tag == "footer":
            return  # furniture subtree (html_backend.py:2094)
        if self._is_boilerplate(node):
            return
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            text = " ".join(_norm_flow(_inline_text(node)))
            self._in_body = True  # first heading switches layer to BODY
            if text:
                kind = "title" if tag == "h1" else "section_header"
                self._emit(spans, kind, text)
            return
        if tag in ("ul", "ol", "dl"):
            self._handle_list(node, spans)
            return
        if tag == "table":
            grid, caption = parse_table_grid(node)
            if caption:
                self._emit(spans, "caption", caption)
            self._emit(spans, "table", "", grid_media_ref(grid))
            return
        if tag == "figure":
            self._handle_figure(node, spans)
            return
        if tag == "img":
            src = node.attrs.get("src", "")
            alt = collapse_whitespace(clean_unicode(node.attrs.get("alt", "")))
            self._emit(spans, "picture", "", src)
            if alt:
                self._emit(spans, "caption", alt)
            return
        if tag == "math":
            text = " ".join(_norm_flow(_inline_text(node)))
            if text:
                self._emit(spans, "formula", text)
            return
        if tag == "pre":
            text = clean_unicode(_inline_text(node))
            # preserve internal layout; trim outer blank lines only
            text = text.strip("\n")
            if text:
                self._emit(spans, "code", text)
            return
        if tag in ("p", "address", "summary", "blockquote", "dt", "dd",
                   "caption", "figcaption"):
            for seg in _norm_flow(_inline_text(node)):
                self._emit(spans, "text", seg)
            return
        if tag == "input":
            if node.attrs.get("type", "").lower() == "checkbox":
                kind = ("checkbox_selected" if "checked" in node.attrs
                        else "checkbox_unselected")
                self._emit(spans, kind, "")
            return
        if tag == "form":
            self._handle_form(node, spans)
            return
        # transparent containers: walk through
        self._walk_children(node, spans, pre=False)

    def _handle_form(self, node: _Node, spans: list[Span]) -> None:
        """Form container → structured field spans instead of loose
        widget text (reference _handle_form_container,
        html_backend.py:4303): checkbox/radio fields keep the existing
        checkbox-kind + label-text convention; value widgets become the
        canonical ``key: value`` text line the kv miner consumes
        (kv_extract.mine_pairs). Non-widget form prose (legends, help
        text) is out of scope — the field set IS the form's content."""
        for f in _iter_form_fields(node):
            if f["widget"] in ("checkbox", "radio"):
                kind = ("checkbox_selected" if f["value"] == "true"
                        else "checkbox_unselected")
                self._emit(spans, kind, "")
                if f["key"]:
                    self._emit(spans, "text", f["key"])
            elif f["key"] and f["value"]:
                self._emit(spans, "text", f"{f['key']}: {f['value']}")
            elif f["value"]:
                self._emit(spans, "text", f["value"])

    def _handle_figure(self, node: _Node, spans: list[Span]) -> None:
        """figure → picture span (+ caption from figcaption, else img alt)
        (html_backend.py:2627-2632,4408)."""
        src = ""
        alt = ""
        figcaption = ""
        stack: list[object] = list(node.children)
        while stack:
            c = stack.pop(0)
            if not isinstance(c, _Node):
                continue
            if c.tag == "img" and not src:
                src = c.attrs.get("src", "")
                alt = collapse_whitespace(clean_unicode(c.attrs.get("alt", "")))
            elif c.tag == "figcaption":
                figcaption = " ".join(_norm_flow(_inline_text(c)))
            elif c.tag not in _DROP:
                stack.extend(c.children)
        self._emit(spans, "picture", "", src)
        caption = figcaption or alt
        if caption:
            self._emit(spans, "caption", caption)

    def _handle_list(self, node: _Node, spans: list[Span]) -> None:
        for c in node.children:
            if not isinstance(c, _Node):
                continue
            if c.tag == "li":
                # item text = inline content before any nested list; nested
                # lists recursed afterwards (html_backend.py:2418)
                buf: list[str] = []
                nested: list[_Node] = []
                for cc in c.children:
                    if isinstance(cc, _Node) and cc.tag in ("ul", "ol", "dl"):
                        nested.append(cc)
                    elif isinstance(cc, _Node) and cc.tag in _BLOCK and cc.tag not in _INLINE:
                        # block content inside li: flush item text, then handle
                        nested.append(cc)
                    elif isinstance(cc, str):
                        buf.append(cc)
                    elif isinstance(cc, _Node):
                        if cc.tag == "br":
                            buf.append("\n")
                        else:
                            buf.append(_inline_text(cc))
                segs = _norm_flow("".join(buf))
                if segs:
                    self._emit(spans, "list_item", " ".join(segs))
                for nn in nested:
                    self._handle_block(nn, spans)
            elif c.tag in ("dt", "dd"):
                text = " ".join(_norm_flow(_inline_text(c)))
                if text:
                    self._emit(spans, "list_item", text)
            elif c.tag in ("ul", "ol", "dl"):
                self._handle_list(c, spans)


_DEFAULT = HtmlExtractor()


def extract_links(
    html: str, extractor: "HtmlExtractor | None" = None,
) -> list[tuple[str, str, str]]:
    """Hyperlink annotations: (anchor_text, href, region) in document
    order. The span model intentionally flattens inline markup out of the
    text; this companion pass preserves the reference's hyperlink
    resolution (html_backend.py:1840 _resolve_hyperlink) as a separate
    annotation stream. ``region`` classifies where the link lives using
    the SAME rules as the extractor: "boilerplate" (nav / link-farm
    subtrees the body strip removes), "furniture" (pre-first-heading
    region or footer), "body" (everything the span pipeline keeps).
    A document-level ``<link rel="canonical" href=...>`` (normally in
    ``<head>``, which the body walk skips via _DROP) is emitted FIRST
    as ``("", href, "canonical")`` — the page's self-identity and the
    src-host anchor of the link graph (stages/webgraph.py)."""
    ex = extractor or HtmlExtractor()
    dom = build_dom(html)
    in_body = not (ex.infer_furniture and ex._subtree_has_heading(dom))
    out: list[tuple[str, str, str]] = []

    def find_canonical(node: _Node) -> str:
        for c in node.children:
            if isinstance(c, str):
                continue
            if c.tag == "link" \
                    and c.attrs.get("rel", "").lower() == "canonical" \
                    and c.attrs.get("href"):
                return c.attrs["href"]
            got = find_canonical(c)
            if got:
                return got
        return ""

    canonical = find_canonical(dom)
    if canonical:
        out.append(("", canonical, "canonical"))

    def walk(node: _Node, boiler: bool, furn: bool) -> None:
        nonlocal in_body
        for c in node.children:
            if isinstance(c, str):
                continue
            if c.tag in _DROP or _is_hidden(c) or c.tag == "title":
                continue
            b = boiler or ex._is_boilerplate(c)
            f = furn or c.tag == "footer"
            if c.tag in ("h1", "h2", "h3", "h4", "h5", "h6") and not b:
                in_body = True
            if c.tag == "a":
                href = c.attrs.get("href", "")
                if href:
                    text = collapse_whitespace(clean_unicode(_inline_text(c)))
                    region = ("boilerplate" if b
                              else "furniture" if (f or not in_body)
                              else "body")
                    out.append((text, href, region))
            walk(c, b, f)

    walk(dom, False, False)
    return out


# inline formatting tags → style label (reference _FORMAT_TAG_MAP,
# html_backend.py:151-166; code-ish tags handled by the code span path)
_FORMAT_TAGS = {
    "b": "bold", "strong": "bold",
    "i": "italic", "em": "italic", "var": "italic",
    "s": "strikethrough", "del": "strikethrough",
    "u": "underline", "ins": "underline",
    "sub": "subscript", "sup": "superscript",
}


def extract_list_markers(html: str) -> list[tuple[str, str]]:
    """Ordered-list marker annotations: (item_text, marker) in document
    order — the reference enumerates ``<ol>`` items honoring the ``start``
    attribute (fixture example_01.html "ordered list start 42"); the span
    model keeps item text clean, so markers ride in this companion stream.
    Unordered/definition items are not enumerated (no entry)."""
    dom = build_dom(html)
    out: list[tuple[str, str]] = []

    def item_text(li: _Node) -> str:
        buf: list[str] = []
        for cc in li.children:
            if isinstance(cc, str):
                buf.append(cc)
            elif isinstance(cc, _Node) and cc.tag not in ("ul", "ol", "dl") \
                    and cc.tag in _INLINE:
                buf.append(_inline_text(cc))
        segs = _norm_flow("".join(buf))
        return " ".join(segs)

    def walk(node: _Node) -> None:
        for c in node.children:
            if not isinstance(c, _Node):
                continue
            if c.tag in _DROP or _is_hidden(c):
                continue
            if c.tag == "ol":
                try:
                    counter = int(c.attrs.get("start", "1") or "1")
                except ValueError:
                    counter = 1
                for li in c.children:
                    if isinstance(li, _Node) and li.tag == "li":
                        text = item_text(li)
                        if text:
                            out.append((text, f"{counter}."))
                            counter += 1
                        walk(li)  # nested lists inside the item
            else:
                walk(c)

    walk(dom)
    return out


def extract_formatting(
    html: str, extractor: "HtmlExtractor | None" = None,
) -> list[tuple[str, str, str]]:
    """Inline-formatting annotations: (text, style, region) in document
    order — the companion stream to :func:`extract_links` for the
    bold/italic/strike/underline/script markup the flattened span texts
    drop (reference Formatting model, html_backend.py:151-166). Region
    classification shares the extractor's boilerplate/furniture rules."""
    ex = extractor or HtmlExtractor()
    dom = build_dom(html)
    in_body = not (ex.infer_furniture and ex._subtree_has_heading(dom))
    out: list[tuple[str, str, str]] = []

    def walk(node: _Node, boiler: bool, furn: bool) -> None:
        nonlocal in_body
        for c in node.children:
            if isinstance(c, str):
                continue
            if c.tag in _DROP or _is_hidden(c) or c.tag == "title":
                continue
            b = boiler or ex._is_boilerplate(c)
            f = furn or c.tag == "footer"
            if c.tag in ("h1", "h2", "h3", "h4", "h5", "h6") and not b:
                in_body = True
            if c.tag in _FORMAT_TAGS:
                text = collapse_whitespace(clean_unicode(_inline_text(c)))
                if text:
                    region = ("boilerplate" if b
                              else "furniture" if (f or not in_body)
                              else "body")
                    out.append((text, _FORMAT_TAGS[c.tag], region))
            walk(c, b, f)

    walk(dom, False, False)
    return out


# --- DOM form mining (reference _extract_form_region /
# _handle_form_container, html_backend.py:3827,4303) ----------------------

# input types that carry no user data (never mined as fields)
_WIDGET_SKIP_TYPES = {"submit", "button", "reset", "image", "hidden", "file"}


def _label_text(label: _Node) -> str:
    """A label's own text, excluding any wrapped widget subtrees (a
    ``<label>Color <select>…</select></label>`` must not absorb the
    option texts into the key)."""
    parts: list[str] = []

    def rec(n: object) -> None:
        if isinstance(n, str):
            parts.append(n)
            return
        assert isinstance(n, _Node)
        if n.tag in _DROP or _is_hidden(n):
            return
        if n.tag in ("select", "textarea", "input", "option"):
            return
        for c in n.children:
            rec(c)

    rec(label)
    text = collapse_whitespace(clean_unicode("".join(parts))).strip()
    return text[:-1].rstrip() if text.endswith(":") else text


def _iter_form_fields(form: _Node) -> list[dict]:
    """Widgets of a form subtree in document order, each resolved to a
    (key, value, widget) field. Key precedence mirrors the reference's
    DOM pairing: ``label[for=id]`` → wrapping ``<label>`` → ``name``
    attr → ``placeholder``. Values: inputs from ``value``/``checked``,
    selects from the selected (else first) option, textareas from their
    text content."""
    labels_by_for: dict[str, str] = {}

    def collect(n: _Node) -> None:
        for c in n.children:
            if not isinstance(c, _Node) or c.tag in _DROP or _is_hidden(c):
                continue
            if c.tag == "label" and c.attrs.get("for"):
                labels_by_for.setdefault(c.attrs["for"], _label_text(c))
            collect(c)

    collect(form)
    fields: list[dict] = []

    def key_for(widget: _Node, wrap_label: str) -> str:
        by_id = labels_by_for.get(widget.attrs.get("id", ""), "")
        return (by_id or wrap_label or widget.attrs.get("name", "")
                or widget.attrs.get("placeholder", "")).strip()

    def walk(n: _Node, wrap_label: str) -> None:
        for c in n.children:
            if not isinstance(c, _Node) or c.tag in _DROP or _is_hidden(c):
                continue
            lbl = _label_text(c) if c.tag == "label" else wrap_label
            if c.tag == "input":
                typ = c.attrs.get("type", "text").lower()
                if typ in _WIDGET_SKIP_TYPES:
                    continue
                if typ in ("checkbox", "radio"):
                    fields.append({
                        "key": key_for(c, lbl),
                        "value": "true" if "checked" in c.attrs else "false",
                        "widget": typ,
                    })
                else:
                    fields.append({
                        "key": key_for(c, lbl),
                        "value": collapse_whitespace(
                            clean_unicode(c.attrs.get("value", ""))).strip(),
                        "widget": "input",
                    })
                continue
            if c.tag == "select":
                chosen = ""
                first = None
                for opt in c.children:
                    if not isinstance(opt, _Node) or opt.tag != "option":
                        continue
                    text = collapse_whitespace(
                        clean_unicode(_inline_text(opt))).strip()
                    if first is None:
                        first = text
                    if "selected" in opt.attrs:
                        chosen = text
                        break
                fields.append({
                    "key": key_for(c, lbl),
                    "value": chosen or (first or ""),
                    "widget": "select",
                })
                continue  # options consumed
            if c.tag == "textarea":
                fields.append({
                    "key": key_for(c, lbl),
                    "value": collapse_whitespace(
                        clean_unicode(_inline_text(c))).strip(),
                    "widget": "textarea",
                })
                continue
            walk(c, lbl)

    walk(form, "")
    return fields


def extract_form_fields(html: str) -> list[tuple[str, str, str]]:
    """DOM form-field annotations: (key, value, widget) in document
    order across every ``<form>`` — the structural pairs the reference's
    GraphData key-value regions carry (html_backend.py:3827,4303),
    surfaced as a companion stream like :func:`extract_links`. Fields
    with neither key nor value are dropped."""
    dom = build_dom(html)
    out: list[tuple[str, str, str]] = []

    def walk(node: _Node) -> None:
        for c in node.children:
            if not isinstance(c, _Node) or c.tag in _DROP or _is_hidden(c):
                continue
            if c.tag == "form":
                for f in _iter_form_fields(c):
                    if f["key"] or f["value"]:
                        out.append((f["key"], f["value"], f["widget"]))
                continue
            walk(c)

    walk(dom)
    return out


_CONFIGURED: tuple[tuple, HtmlExtractor] | None = None


def extract_html(html: str) -> list[Span]:
    """Extract spans with the engine's configured html options
    (docling_ray/settings.py: defaults ∪ DOCLING_RAY_HTML__* env ∪
    configure()); the extractor instance is rebuilt only when the
    resolved options change."""
    global _CONFIGURED
    from docling_ray.settings import options_for

    opts = options_for("html")
    key = tuple(sorted(opts.items()))
    if _CONFIGURED is None or _CONFIGURED[0] != key:
        _CONFIGURED = (key, HtmlExtractor(**opts))
    return _CONFIGURED[1].extract(html)
