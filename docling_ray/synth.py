"""Deterministic synthetic interleaved-corpus generator (FIXTURES.md).

Produces pairs of tables:

  * ``input``    — ``(doc_id, spans)`` rows of raw interleaved content
    (html markup / markdown-ish text / pdf_cells page JSON / media refs),
    the shape fixed by ``BASELINE.json.input_hint``;
  * ``expected`` — ``(doc_id, spans, status)`` ground-truth extraction
    output, the analogue of the reference's golden fixtures
    (``tests/data/<fmt>/groundtruth`` — SURVEY.md §5).

Every primitive below renders raw content *and* hand-computes the spans the
extractor must produce, so the generator and the engine are independent
implementations of the same specification (the generator never calls the
extractor). The only shared code is the character-level sanitation in
``docling_ray.functions.normalize``, which has its own hand-written unit
tests (tests/test_normalize.py) — sharing it here keeps the geometric layout
logic, the DOM logic and the ordering logic independently verified.

Corpus mix (FIXTURES.md §1): ~60% html docs, ~25% pdf_cells docs (1-50
pages, heavy tail for skew tests), ~15% mixed text+media. All draws come
from ``random.Random(stable_hash64(f"{seed}:{doc_id}"))`` so any document is
reproducible in isolation — generation parallelizes embarrassingly
(``map_batches`` over a seed table, see :func:`render_docs_batch`).
"""

from __future__ import annotations

import base64
import json
import random
import re
import zlib

import pyarrow as pa

from docling_ray import schema as S
from docling_ray.functions.hashing import stable_hash64
from docling_ray.functions.normalize import sanitize_cell_text
from docling_ray.functions.refs import grid_media_ref

Span = tuple[str, str, str]

VOCAB = (
    "data engine ray arrow span table layout column page text media stream "
    "block batch shuffle actor pool parse extract document corpus heading "
    "list figure caption code cell grid row order reading model stage task "
    "pipeline lineage metric partition skew checkpoint resume throughput "
    "scale node cluster worker driver object store memory disk parquet "
    "lance schema struct offset kind value result status error quality"
).split()

PAGE_W, PAGE_H = 612.0, 792.0


def _words(rng: random.Random, pool: list[str], n: int) -> list[str]:
    return [pool[rng.randrange(len(pool))] for _ in range(n)]


def _sentence(rng: random.Random, pool: list[str]) -> str:
    ws = _words(rng, pool, rng.randint(4, 10))
    return ws[0].capitalize() + " " + " ".join(ws[1:]) + "."


def _para_text(rng: random.Random, pool: list[str], n_sent: int | None = None) -> str:
    n = n_sent or rng.randint(1, 4)
    return " ".join(_sentence(rng, pool) for _ in range(n))


# ======================================================================
# HTML document
# ======================================================================

def _site_host(rng: random.Random) -> str:
    """Skewed host pick for the synthetic web graph: 24 sites, quadratic
    bias toward the low indices so the host-level in-degree distribution
    has real hubs (the skew the PageRank / host-graph pipelines must
    survive)."""
    k = min(int(rng.random() ** 2 * 24), 23)
    return f"site{k:02d}.example"


def build_html_doc(
    rng: random.Random, pool: list[str], doc_id: str
) -> tuple[str, list[Span], list[tuple[str, str, str]],
           list[tuple[str, str, str]]]:
    """Render one HTML document + its expected span sequence + expected
    hyperlink, inline-formatting and form-field annotations, each in
    document order."""
    exp: list[Span] = []
    links_exp: list[tuple[str, str, str]] = []
    # ~85% of pages declare a canonical URL in <head> — the extractor
    # emits it FIRST as ("", url, "canonical"); it assigns the page its
    # host in the link graph (docs without one never become src nodes)
    canon_tag = ""
    if rng.random() < 0.85:
        canon_url = f"https://{_site_host(rng)}/{doc_id}"
        canon_tag = f'<link rel="canonical" href="{canon_url}"/>'
        links_exp.append(("", canon_url, "canonical"))
    frags: list[str] = ["<html><head><title>Ignored head title</title>",
                       canon_tag,
                       "<style>body{color:#000}</style></head><body>"]
    fmt_exp: list[tuple[str, str, str]] = []
    marker_exp: list[tuple[str, str]] = []
    fields_exp: list[tuple[str, str, str]] = []
    media_n = 0
    has_headings = rng.random() < 0.9

    def para(target: list[str], emit: bool) -> None:
        t = _para_text(rng, pool)
        target.append(f"<p>{t}</p>")
        if emit:
            exp.append(("text", t, ""))

    # junk that must be stripped
    if rng.random() < 0.7:
        frags.append("<script>var x = 'never extract this';</script>")
    if rng.random() < 0.4:
        frags.append("<div hidden><p>hidden content</p></div>")
    if rng.random() < 0.4:
        frags.append("<noscript>enable js</noscript>")
    # nav link farm → boilerplate-stripped (link density)
    if rng.random() < 0.6:
        nav_words = _words(rng, pool, rng.randint(4, 8))
        links = "".join(f'<a href="/{w}">{w}</a> ' for w in nav_words)
        frags.append(f"<nav>{links}</nav>")
        menu_words = _words(rng, pool, 5)
        frags.append(f'<div class="menu"><ul>'
                     + "".join(f'<li><a href="/{w}">{w}</a></li>'
                               for w in menu_words)
                     + "</ul></div>")
        links_exp.extend((w, f"/{w}", "boilerplate") for w in nav_words)
        links_exp.extend((w, f"/{w}", "boilerplate") for w in menu_words)

    if has_headings:
        # pre-heading furniture: excluded from body spans
        if rng.random() < 0.5:
            para(frags, emit=False)
        title = _sentence(rng, pool)[:-1]
        frags.append(f"<h1>{title}</h1>")
        exp.append(("title", title, ""))
    # body blocks
    for _ in range(rng.randint(2, 8)):
        r = rng.random()
        if r < 0.30:
            para(frags, emit=True)
        elif r < 0.42 and has_headings:
            h = _sentence(rng, pool)[:-1]
            lvl = rng.choice(["h2", "h3"])
            frags.append(f"<{lvl}>{h}</{lvl}>")
            exp.append(("section_header", h, ""))
        elif r < 0.54:
            items = [_sentence(rng, pool) for _ in range(rng.randint(2, 5))]
            tag = rng.choice(["ul", "ol"])
            start = ' start="42"' if tag == "ol" and rng.random() < 0.3 else ""
            nested = rng.random() < 0.3
            html_items = []
            for i, it in enumerate(items):
                if nested and i == 1:
                    sub = [_sentence(rng, pool) for _ in range(2)]
                    html_items.append(
                        f"<li>{it}<ul>" + "".join(f"<li>{s}</li>" for s in sub)
                        + "</ul></li>"
                    )
                    exp.append(("list_item", it, ""))
                    exp.extend(("list_item", s, "") for s in sub)
                else:
                    html_items.append(f"<li>{it}</li>")
                    exp.append(("list_item", it, ""))
            frags.append(f"<{tag}{start}>" + "".join(html_items) + f"</{tag}>")
            if tag == "ol":
                counter = 42 if start else 1
                for it in items:
                    marker_exp.append((it, f"{counter}."))
                    counter += 1
        elif r < 0.62:
            # definition list
            pairs = [(w.capitalize(), _sentence(rng, pool))
                     for w in _words(rng, pool, rng.randint(2, 3))]
            frags.append("<dl>" + "".join(
                f"<dt>{k}</dt><dd>{v}</dd>" for k, v in pairs) + "</dl>")
            for k, v in pairs:
                exp.append(("list_item", k, ""))
                exp.append(("list_item", v, ""))
        elif r < 0.74:
            frag, e = _build_html_table(rng, pool)
            frags.append(frag)
            exp.extend(e)
        elif r < 0.84:
            media_n += 1
            ref = f"img://{doc_id}/{media_n}"
            cap = _sentence(rng, pool)[:-1]
            if rng.random() < 0.6:
                frags.append(
                    f'<figure><img src="{ref}"/><figcaption>{cap}</figcaption></figure>'
                )
            else:
                frags.append(f'<img src="{ref}" alt="{cap}"/>')
            exp.append(("picture", "", ref))
            exp.append(("caption", cap, ""))
        elif r < 0.90:
            code = "def f_{}():\n    return {}".format(
                rng.randrange(100), rng.randrange(1000))
            frags.append(f"<pre>{code}</pre>")
            exp.append(("code", code, ""))
        elif r < 0.95:
            # <br>-split paragraph → two text spans
            a, b = _sentence(rng, pool), _sentence(rng, pool)
            frags.append(f"<p>{a}<br/>{b}</p>")
            exp.append(("text", a, ""))
            exp.append(("text", b, ""))
        else:
            # unicode-normalization paragraph (raw → cleaned)
            raw = "Café menu — “daily” ‘special’ co­operate z​ip…"
            clean = "Café menu - \"daily\" 'special' cooperate zip..."
            frags.append(f"<p>{raw}</p>")
            exp.append(("text", clean, ""))
    # cross-site outlinks: absolute https URLs onto the 24-host synthetic
    # web (skewed via _site_host) — the edges of the host link graph
    if rng.random() < 0.8:
        for _ in range(rng.randint(1, 4)):
            w = rng.choice(pool)
            out_url = f"https://{_site_host(rng)}/{w}"
            pre = _sentence(rng, pool)
            frags.append(f'<p>{pre} See <a href="{out_url}">{w} docs</a>.</p>')
            exp.append(("text", f"{pre} See {w} docs.", ""))
            links_exp.append((f"{w} docs", out_url, "body"))
    # form region: DOM-structural key-value fields (the extractor's
    # _handle_form consumes the whole subtree — loose widget text never
    # leaks; expectations here are hand-computed, reading-order)
    if rng.random() < 0.30:
        parts = ["<form>"]
        n_fields = rng.randint(2, 5)
        for fi in range(n_fields):
            k = _words(rng, pool, 1)[0].capitalize()
            widget = rng.choice(["input", "input", "checkbox", "select",
                                 "textarea", "named"])
            fid = f"fl{fi}"
            if widget == "input":
                v = " ".join(_words(rng, pool, rng.randint(1, 3)))
                colon = ":" if rng.random() < 0.4 else ""
                parts.append(f'<label for="{fid}">{k}{colon}</label>'
                             f'<input id="{fid}" type="text" value="{v}"/>')
                exp.append(("text", f"{k}: {v}", ""))
                fields_exp.append((k, v, "input"))
            elif widget == "checkbox":
                checked = rng.random() < 0.5
                lab = " ".join(_words(rng, pool, 2))
                parts.append(
                    '<label><input type="checkbox"'
                    + (" checked" if checked else "") + f"/> {lab}</label>")
                exp.append(("checkbox_selected" if checked
                            else "checkbox_unselected", "", ""))
                exp.append(("text", lab, ""))
                fields_exp.append((lab, "true" if checked else "false",
                                   "checkbox"))
            elif widget == "select":
                opts = _words(rng, pool, rng.randint(2, 4))
                sel = rng.randrange(-1, len(opts))  # -1: none → first wins
                parts.append(
                    f'<label for="{fid}">{k}</label><select id="{fid}">'
                    + "".join(
                        f'<option{" selected" if i == sel else ""}>{o}'
                        "</option>" for i, o in enumerate(opts))
                    + "</select>")
                v = opts[sel] if sel >= 0 else opts[0]
                exp.append(("text", f"{k}: {v}", ""))
                fields_exp.append((k, v, "select"))
            elif widget == "textarea":
                v = _sentence(rng, pool)
                parts.append(f'<label for="{fid}">{k}</label>'
                             f'<textarea id="{fid}">{v}</textarea>')
                exp.append(("text", f"{k}: {v}", ""))
                fields_exp.append((k, v, "textarea"))
            else:  # name-attr input, no label
                v = _words(rng, pool, 1)[0]
                parts.append(
                    f'<input type="text" name="{k}" value="{v}"/>')
                exp.append(("text", f"{k}: {v}", ""))
                fields_exp.append((k, v, "input"))
        parts.append('<input type="submit" value="Go"/></form>')
        frags.append("".join(parts))
    # formula block
    if rng.random() < 0.25:
        expr = f"E_{rng.randrange(9)} = m c^{rng.randrange(2, 5)}"
        frags.append(f"<math>{expr}</math>")
        exp.append(("formula", expr, ""))
    # inline formatting paragraph
    if rng.random() < 0.5:
        w1, w2 = _words(rng, pool, 2)
        frags.append(
            f'<p>Mixed <b>{w1}</b> and <a href="/x">{w2}</a> inline text.</p>'
        )
        exp.append(("text", f"Mixed {w1} and {w2} inline text.", ""))
        links_exp.append((w2, "/x", "body"))
        fmt_exp.append((w1, "bold", "body"))
    # footer furniture
    if rng.random() < 0.5:
        frags.append(f"<footer><p>{_sentence(rng, pool)}</p></footer>")
    # inline emphasis paragraph (formatting-annotation coverage)
    if rng.random() < 0.3:
        w3, w4 = _words(rng, pool, 2)
        frags.append(f"<p>Note <em>{w3}</em> versus <u>{w4}</u> here.</p>")
        exp.append(("text", f"Note {w3} versus {w4} here.", ""))
        fmt_exp.append((w3, "italic", "body"))
        fmt_exp.append((w4, "underline", "body"))
    frags.append("</body></html>")
    return "".join(frags), exp, links_exp, fmt_exp, marker_exp, fields_exp


def _build_html_table(
    rng: random.Random, pool: list[str]
) -> tuple[str, list[Span]]:
    nrows = rng.randint(2, 4)
    ncols = rng.randint(2, 4)
    grid = [[" ".join(_words(rng, pool, rng.randint(1, 2)))
             for _ in range(ncols)] for _ in range(nrows)]
    caption = _sentence(rng, pool)[:-1] if rng.random() < 0.4 else ""
    colspan_row = rng.randrange(nrows) if ncols >= 2 and rng.random() < 0.3 else -1

    parts = ["<table>"]
    if caption:
        parts.append(f"<caption>{caption}</caption>")
    expanded: list[list[str]] = []
    for ri in range(nrows):
        tag = "th" if ri == 0 else "td"
        parts.append("<tr>")
        row_out: list[str] = []
        ci = 0
        while ci < ncols:
            if ri == colspan_row and ci == 0:
                parts.append(f'<{tag} colspan="2">{grid[ri][0]}</{tag}>')
                row_out.extend([grid[ri][0], grid[ri][0]])
                ci += 2
            else:
                parts.append(f"<{tag}>{grid[ri][ci]}</{tag}>")
                row_out.append(grid[ri][ci])
                ci += 1
        parts.append("</tr>")
        expanded.append(row_out)
    parts.append("</table>")
    exp: list[Span] = []
    if caption:
        exp.append(("caption", caption, ""))
    exp.append(("table", "", grid_media_ref(expanded)))
    return "".join(parts), exp


# ======================================================================
# PDF document (pdf_cells pages)
# ======================================================================

BODY_FONT = 10.0
HEADING_FONT_GEN = 16.0
TITLE_FONT_GEN = 20.0
LINE_H = 13.0
PARA_GAP_GEN = 26.0
BODY_TOP = 72.0
BODY_BOTTOM = 716.0


class _PageBuilder:
    def __init__(self, page_no: int, two_col: bool):
        self.page_no = page_no
        self.two_col = two_col
        self.cells: list[dict] = []
        self.tables: list[dict] = []
        self.images: list[dict] = []
        self.col = 0
        self.y = BODY_TOP
        self.col_x = [72.0, 322.0] if two_col else [72.0]
        self.col_w = 220.0 if two_col else 468.0
        self.exp_cols: list[list[Span]] = [[] for _ in self.col_x]
        self.exp_header: list[Span] = []
        self.exp_footnotes: list[Span] = []
        self.exp_footer: list[Span] = []
        self.footnote_y = 700.0

    def room(self, h: float) -> bool:
        return self.y + h <= BODY_BOTTOM

    def next_col(self) -> bool:
        """Advance to next column; False when the page is full."""
        if self.col + 1 < len(self.col_x):
            self.col += 1
            self.y = BODY_TOP
            return True
        return False

    def add_cell(self, text: str, h: float, font: float, x: float | None = None,
                 w: float | None = None, y: float | None = None) -> None:
        l = x if x is not None else self.col_x[self.col]
        t = y if y is not None else self.y
        self.cells.append({
            "text": text, "l": l, "t": t,
            "r": l + (w if w is not None else self.col_w), "b": t + h,
            "font_size": font,
        })

    def header(self, text: str) -> None:
        self.cells.append({"text": text, "l": 72.0, "t": 20.0, "r": 540.0,
                           "b": 32.0, "font_size": 8.0})
        self.exp_header.append(("page_header", text, ""))

    def footer(self, text: str) -> None:
        self.cells.append({"text": text, "l": 72.0, "t": 762.0, "r": 540.0,
                           "b": 774.0, "font_size": 8.0})
        self.exp_footer.append(("page_footer", text, ""))

    def paragraph(self, lines: list[str]) -> None:
        for ln in lines:
            self.add_cell(ln, 11.0, BODY_FONT)
            self.y += LINE_H
        self.y += PARA_GAP_GEN - LINE_H
        self.exp_cols[self.col].append(("text", sanitize_cell_text(lines), ""))

    def heading(self, text: str, title: bool = False) -> None:
        font = TITLE_FONT_GEN if title else HEADING_FONT_GEN
        self.add_cell(text, font + 2, font)
        self.y += font + 2 + (PARA_GAP_GEN - LINE_H)
        kind = "title" if title else "section_header"
        self.exp_cols[self.col].append((kind, sanitize_cell_text([text]), ""))

    def table(self, grid: list[list[str]], caption: str | None,
              rich_cell: tuple[int, int, str] | None = None) -> None:
        """``rich_cell=(ri, ci, media_ref)`` places an image region INSIDE
        that cell's box — the expected grid hand-appends the ``[ref]``
        marker (picture-in-table-cell rich cells,
        readingorder_model.py:162-302)."""
        nrows, ncols = len(grid), len(grid[0])
        rh, x0 = 16.0, self.col_x[self.col]
        cw = self.col_w / ncols
        y0 = self.y
        for ri in range(nrows):
            for ci in range(ncols):
                self.cells.append({
                    "text": grid[ri][ci], "l": x0 + ci * cw + 2.0,
                    "t": y0 + ri * rh, "r": x0 + (ci + 1) * cw - 2.0,
                    "b": y0 + ri * rh + 12.0, "font_size": 9.0,
                })
        reg_b = y0 + nrows * rh + 2.0
        self.tables.append({"l": x0 - 2.0, "t": y0 - 2.0,
                            "r": x0 + self.col_w + 2.0, "b": reg_b})
        exp_grid = [[sanitize_cell_text([t]) for t in row] for row in grid]
        if rich_cell is not None:
            ri, ci, ref = rich_cell
            self.images.append({
                "l": x0 + ci * cw + 4.0, "t": y0 + ri * rh + 1.0,
                "r": x0 + (ci + 1) * cw - 4.0, "b": y0 + ri * rh + 11.0,
                "media_ref": ref,
            })
            exp_grid[ri][ci] = (exp_grid[ri][ci] + f" [{ref}]").strip()
        self.exp_cols[self.col].append(("table", "", grid_media_ref(exp_grid)))
        self.y = reg_b
        if caption:
            self.y += 8.0
            self.add_cell(caption, 11.0, BODY_FONT)
            self.exp_cols[self.col].append(("caption", sanitize_cell_text([caption]), ""))
            self.y += LINE_H
        self.y += PARA_GAP_GEN + 6.0

    def image(self, media_ref: str, caption: str | None) -> None:
        x0 = self.col_x[self.col]
        h = 90.0
        self.images.append({"l": x0, "t": self.y, "r": x0 + self.col_w,
                            "b": self.y + h, "media_ref": media_ref})
        self.exp_cols[self.col].append(("picture", "", media_ref))
        self.y += h
        if caption:
            self.y += 8.0
            self.add_cell(caption, 11.0, BODY_FONT)
            self.exp_cols[self.col].append(("caption", sanitize_cell_text([caption]), ""))
            self.y += LINE_H
        self.y += PARA_GAP_GEN + 6.0

    def footnote(self, text: str) -> None:
        """Small-font footnote line near the page bottom (emitted after
        the body columns in reading order)."""
        self.cells.append({"text": text, "l": 72.0, "t": self.footnote_y,
                           "r": 540.0, "b": self.footnote_y + 8.0,
                           "font_size": 6.5})
        self.footnote_y += 10.0
        self.exp_footnotes.append(("footnote", sanitize_cell_text([text]), ""))

    def payload(self) -> str:
        return json.dumps(
            {"page_no": self.page_no, "width": PAGE_W, "height": PAGE_H,
             "cells": self.cells, "tables": self.tables, "images": self.images},
            separators=(",", ":"), ensure_ascii=False,
        )

    def expected(self) -> list[Span]:
        out = list(self.exp_header)
        for col in self.exp_cols:
            out.extend(col)
        out.extend(self.exp_footnotes)
        out.extend(self.exp_footer)
        return out


def _pdf_para_lines(rng: random.Random, pool: list[str]) -> list[str]:
    n = rng.randint(1, 4)
    lines = [_sentence(rng, pool) for _ in range(n)]
    r = rng.random()
    if r < 0.15 and n >= 2:
        # hyphenated line break across lines 0/1
        lines[0] = lines[0][:-1] + " transfor-"
        lines[1] = "mation " + lines[1]
    elif r < 0.25:
        lines[0] = lines[0].replace(" ", " ﬁ eld ", 1)  # ligature + spurious space
    return lines


def build_pdf_page(
    rng: random.Random, pool: list[str], doc_id: str, page_no: int,
    media_seq: list[int], garbage: bool = False, first_page: bool = False,
    two_col_allowed: bool = True,
) -> tuple[str, list[Span], bool]:
    """One page → (payload JSON, expected spans, is_garbage)."""
    two_col = rng.random() < 0.35 and not garbage and two_col_allowed
    pb = _PageBuilder(page_no, two_col)
    if garbage:
        for _ in range(rng.randint(3, 8)):
            pb.add_cell("GLYPH<aa>GLYPH<bb>�/G12/G34/G56", 11.0, BODY_FONT)
            pb.y += LINE_H
        return pb.payload(), [], True
    if rng.random() < 0.7:
        pb.header(f"Running header {doc_id}")
    if rng.random() < 0.7:
        pb.footer(f"Page {page_no}")
    if rng.random() < 0.25:
        for k in range(rng.randint(1, 2)):
            pb.footnote(f"{k + 1}. " + _sentence(rng, pool))
    if first_page:
        pb.heading(_sentence(rng, pool)[:-1], title=True)
    filled = False
    while not filled:
        r = rng.random()
        if r < 0.18:
            item_h = HEADING_FONT_GEN + 2 + PARA_GAP_GEN
            if not pb.room(item_h):
                filled = not pb.next_col()
                continue
            pb.heading(_sentence(rng, pool)[:-1])
        elif r < 0.70:
            lines = _pdf_para_lines(rng, pool)
            item_h = len(lines) * LINE_H + PARA_GAP_GEN
            if not pb.room(item_h):
                filled = not pb.next_col()
                continue
            pb.paragraph(lines)
        elif r < 0.85 and not two_col:
            nrows, ncols = rng.randint(2, 4), rng.randint(2, 4)
            grid = [[" ".join(_words(rng, pool, 1)) for _ in range(ncols)]
                    for _ in range(nrows)]
            cap = (f"Table {rng.randrange(100)}: " + _sentence(rng, pool)
                   if rng.random() < 0.6 else None)
            item_h = nrows * 16.0 + 40.0 + (24.0 if cap else 0.0)
            if not pb.room(item_h):
                filled = not pb.next_col()
                continue
            rich = None
            if rng.random() < 0.25:
                media_seq[0] += 1
                rich = (rng.randrange(nrows), rng.randrange(ncols),
                        f"img://{doc_id}/{media_seq[0]}")
            pb.table(grid, cap, rich_cell=rich)
        elif r < 0.95:
            media_seq[0] += 1
            ref = f"img://{doc_id}/{media_seq[0]}"
            cap = (f"Figure {media_seq[0]}: " + _sentence(rng, pool)
                   if rng.random() < 0.7 else None)
            item_h = 90.0 + 40.0 + (24.0 if cap else 0.0)
            if not pb.room(item_h):
                filled = not pb.next_col()
                continue
            pb.image(ref, cap)
        else:
            # early stop: sparse page
            if pb.y > BODY_TOP + 100:
                break
    return pb.payload(), pb.expected(), False


def build_hyphen_pair(
    rng: random.Random, pool: list[str], doc_id: str,
    p1: int, first_page: bool,
) -> tuple[list[str], list[Span]]:
    """Two simple single-column pages whose boundary splits a word with a
    hyphen: the last body paragraph of page ``p1`` ends ``...transfor-``
    and page ``p1+1`` opens with ``mation ...``. The expected spans are
    hand-computed ALREADY MERGED (the cross-page hyphen rule the engine's
    assembly applies, readingorder_model.py:589-621) — one text span that
    concatenates the halves without the hyphen, the continuation paragraph
    absent from page two. Furniture is sprinkled on both sides so the
    boundary search has to skip footnotes/footers and headers."""
    word_a, word_b = "transfor", "mation"
    a_para = _sentence(rng, pool)[:-1] + f" {word_a}-"
    b_rest = _sentence(rng, pool)
    b_para = f"{word_b} continues the {b_rest[:-1].lower()}."

    pa_b = _PageBuilder(p1, two_col=False)
    if rng.random() < 0.7:
        pa_b.header(f"Running header {doc_id}")
    if rng.random() < 0.5:
        pa_b.footer(f"Page {p1}")
    if rng.random() < 0.4:
        pa_b.footnote("1. " + _sentence(rng, pool))
    if first_page:
        pa_b.heading(_sentence(rng, pool)[:-1], title=True)
    for _ in range(rng.randint(0, 2)):
        pa_b.paragraph([_sentence(rng, pool)])
    pa_b.paragraph([a_para])

    pb_b = _PageBuilder(p1 + 1, two_col=False)
    if rng.random() < 0.7:
        pb_b.header(f"Running header {doc_id}")
    if rng.random() < 0.5:
        pb_b.footer(f"Page {p1 + 1}")
    pb_b.paragraph([b_para])
    for _ in range(rng.randint(1, 2)):
        pb_b.paragraph([_sentence(rng, pool)])

    # hand-computed merge: drop the hyphen, concatenate the halves
    merged_text = a_para[:-1] + b_para
    exp_a = pa_b.expected()
    ia = max(i for i, s in enumerate(exp_a) if s[0] == "text")
    exp_a[ia] = ("text", merged_text, "")
    exp_b = pb_b.expected()
    ib = min(i for i, s in enumerate(exp_b) if s[0] == "text")
    del exp_b[ib]
    return [pa_b.payload(), pb_b.payload()], exp_a + exp_b


def build_pdf_doc(
    rng: random.Random, pool: list[str], doc_id: str, heavy_tail: bool = True
) -> tuple[list[str], list[Span], str]:
    """Multi-page PDF doc → (page payloads in input order, expected spans,
    status). Pages may be shuffled in the input (FIXTURES §4 case 8) — the
    expected spans stay in page_no order."""
    r = rng.random()
    if heavy_tail and r < 0.01:
        n_pages = rng.randint(200, 260)
    elif r < 0.30:
        n_pages = rng.randint(20, 50)
    else:
        n_pages = rng.randint(1, 8)
    media_seq = [0]
    garbage_at = rng.randrange(n_pages) if (n_pages > 1 and rng.random() < 0.15) else -1
    # cross-page hyphen pair: two consecutive non-garbage pages whose
    # boundary splits a word (expected spans carry the merged text)
    hyph_at = -1
    if n_pages >= 2 and rng.random() < 0.25:
        cand = [i for i in range(n_pages - 1)
                if i != garbage_at and i + 1 != garbage_at]
        if cand:
            hyph_at = cand[rng.randrange(len(cand))]
    payloads: list[str] = []
    expected: list[Span] = []
    any_garbage = False
    p = 0
    while p < n_pages:
        if p == hyph_at:
            pair_payloads, pair_exp = build_hyphen_pair(
                rng, pool, doc_id, p1=p + 1, first_page=(p == 0))
            payloads.extend(pair_payloads)
            expected.extend(pair_exp)
            p += 2
            continue
        payload, exp, is_garbage = build_pdf_page(
            rng, pool, doc_id, page_no=p + 1, media_seq=media_seq,
            garbage=(p == garbage_at), first_page=(p == 0),
        )
        payloads.append(payload)
        expected.extend(exp)
        any_garbage |= is_garbage
        p += 1
    if rng.random() < 0.2 and n_pages > 1:
        order = list(range(n_pages))
        rng.shuffle(order)
        payloads = [payloads[i] for i in order]
    status = S.STATUS_PARTIAL if any_garbage else S.STATUS_SUCCESS
    return payloads, expected, status


# ======================================================================
# Real-PDF-bytes documents (generator-side WRITER; the engine's parser in
# stages/pdf_bytes.py is an independent implementation — round-trip span
# equality across the two is the correctness oracle for the PDF backend)
# ======================================================================


def _pdf_num(v: float) -> str:
    """Shortest decimal that round-trips through float() — the parser
    recovers coordinates exactly."""
    return str(int(v)) if v == int(v) else repr(float(v))


def _pdf_text_op(text: str) -> str:
    """PDF string literal for ``text``: ASCII/latin-1 → escaped literal,
    anything else → BOM-prefixed UTF-16BE hex string."""
    if all(31 < ord(ch) < 256 for ch in text):
        esc = text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        return f"({esc})"
    raw = b"\xfe\xff" + text.encode("utf-16-be")
    return "<" + raw.hex().upper() + ">"


def _enc_asciihex(data: bytes) -> bytes:
    return data.hex().encode("ascii") + b">"


def _enc_ascii85(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i: i + 4]
        k = len(chunk)
        v = int.from_bytes(chunk + b"\x00" * (4 - k), "big")
        if v == 0 and k == 4:
            out += b"z"
            continue
        digits = []
        for _ in range(5):
            digits.append(v % 85)
            v //= 85
        out += bytes(33 + d for d in reversed(digits))[: k + 1]
    return bytes(out) + b"~>"


def _enc_runlength(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        lits = bytearray()
        while j < n and len(lits) < 128:
            run = 1
            while j + run < n and run < 3 and data[j + run] == data[j]:
                run += 1
            if run >= 3:
                break
            lits.append(data[j])
            j += 1
        out += bytes([len(lits) - 1]) + lits
        i = j
    return bytes(out) + b"\x80"


def _enc_pdf_lzw(data: bytes) -> bytes:
    """LZW writer, literal-only with a CLEAR every 250 codes so the
    decoder's table never reaches a width boundary — spec-valid
    (encoders may clear at any time) and protocol-unambiguous; codes
    pack MSB-first at a constant 9 bits."""
    codes = [256]
    since_clear = 0
    for b in data:
        if since_clear >= 250:
            codes.append(256)
            since_clear = 0
        codes.append(b)
        since_clear += 1
    codes.append(257)
    acc = 0
    nbits = 0
    out = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        nbits += 9
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


_PDF_CONTENT_FILTERS = {
    "flate": (b"/FlateDecode", lambda d: zlib.compress(d)),
    "lzw": (b"/LZWDecode", _enc_pdf_lzw),
    "rl": (b"/RunLengthDecode", _enc_runlength),
    "ahx": (b"/ASCIIHexDecode", _enc_asciihex),
    "a85": (b"/ASCII85Decode", _enc_ascii85),
}

# corpus-wide AES-256 material: FIXED (not per-doc) so the expensive
# revision-6 Algorithm-2.B derivation runs once per process on both the
# writer (r6_make_entries) and reader (r6_file_key_from_user) lru_caches
_AES256_FILE_KEY = __import__("hashlib").sha256(
    b"docling_ray synthetic corpus aes256 file key").digest()
_AES256_SALTS = __import__("hashlib").sha256(
    b"docling_ray synthetic corpus aes256 salts").digest()

# Deterministic 1024-bit test RSA keypair for the PubSec (certificate)
# encryption modes: primes derived from fixed-seed SHA-256 streams +
# Miller-Rabin, e = 65537. Tests configure the READER with the same
# (N, D) via settings ``pdf.pubsec_keys`` — the keypair is test
# material, not a secret.
PUBSEC_RSA_N = int(
    "896b936e5b9edac263793137728b99233fd52ee58ad1136a687f13f3bb63de29"
    "4c02bd0c832251607a51a4d20f00d1f36bb21de38d2ecc11b67215785b5af3a2"
    "3c3ca407c691217edae4fa894f520db4cb07de331061025b9e71a582fb02d9d9"
    "eba41a8df74303a56e041c5ae9448d4782f48599ef4db7e2ed7f288beeb6bf9f", 16)
PUBSEC_RSA_E = 65537
PUBSEC_RSA_D = int(
    "7a508b48963a5de2da217c222b4d7ffff5082e96d7a9630bba7929ec2ea6248f"
    "437dc88183931f35ad8a50173c8d7152a65042f450ad0facd064d92168c71ac4"
    "c2c8380837ebf5957cc791ca635a6952e41e9fd5fe425776174fd12c99df6bea"
    "9fbec4f73da95eee5af882687017b7214e46a8d78d70f8545410d4e75dfb72c1", 16)


class _PdfEncryptor:
    """Writer-side standard security handler (empty user/owner password).
    Serialization-level protocol code lives HERE, independently of the
    reader (stages/pdf_bytes.py); only the published algorithms in
    functions/pdfcrypt.py + functions/cms.py (spec-vector-pinned) are
    shared. Modes: ``rc4`` = V2/R3 RC4-128, ``aes`` = V4/R4 AESV2
    (AES-128-CBC), ``aes256`` = V5/R6 AESV3, ``pubsec`` = Adobe.PubSec
    V4/AESV2 (certificate-encrypted, adbe.pkcs7.s5), ``pubsec256`` =
    Adobe.PubSec V5/AESV3."""

    def __init__(self, mode: str, seed_bytes: bytes,
                 user_pw: bytes = b"", owner_pw: bytes = b"") -> None:
        import hashlib

        from docling_ray.functions import pdfcrypt as PC

        self.mode = mode
        self.p = -44
        h = hashlib.sha256(b"pdfenc" + seed_bytes).digest()
        self.id0 = h[:16]
        self._iv_ctr = 0
        if mode == "rc4":
            self.rev, self.aes = 3, False
            self.o = PC.compute_o(owner_pw, user_pw, 3, 16)
            self.key = PC.std_file_key(user_pw, self.o, self.p, self.id0,
                                       3, 16)
            self.u = PC.compute_u(self.key, self.id0, 3)
        elif mode == "aes":
            self.rev, self.aes = 4, True
            self.o = PC.compute_o(owner_pw, user_pw, 4, 16)
            self.key = PC.std_file_key(user_pw, self.o, self.p, self.id0,
                                       4, 16)
            self.u = PC.compute_u(self.key, self.id0, 4)
        elif mode == "aes256":
            self.rev, self.aes = 6, True
            self.key = _AES256_FILE_KEY
            self.u, self.ue, self.o, self.oe = PC.r6_make_entries(
                self.key, user_pw, owner_pw, salts=_AES256_SALTS)
        elif mode in ("pubsec", "pubsec256"):
            from docling_ray.functions.cms import (
                build_enveloped_data, pubsec_file_key)

            self.rev, self.aes = 0, True
            wide = mode == "pubsec256"
            seed = hashlib.sha256(b"pubsec-seed" + seed_bytes).digest()[:20]
            cek = hashlib.sha256(
                b"pubsec-cek" + seed_bytes).digest()[: 32 if wide else 16]
            iv = hashlib.md5(b"pubsec-iv" + seed_bytes).digest()
            ps = hashlib.sha256(b"pubsec-ps" + seed_bytes).digest()
            perms = __import__("struct").pack("<i", self.p)
            self.recipients = build_enveloped_data(
                cek, seed + perms, iv, PUBSEC_RSA_N, PUBSEC_RSA_E,
                serial=7, ps=ps)
            self.key = pubsec_file_key(
                seed, [self.recipients], 32 if wide else 16, sha256=wide)
        else:
            raise ValueError(f"unknown encrypt mode {mode!r}")

    def _iv(self) -> bytes:
        import hashlib

        self._iv_ctr += 1
        return hashlib.md5(
            self.id0 + self._iv_ctr.to_bytes(4, "big")).digest()

    def enc_bytes(self, data: bytes, num: int) -> bytes:
        from docling_ray.functions import pdfcrypt as PC

        if self.mode in ("aes256", "pubsec256"):
            key = self.key  # Algorithm 1.A: file key used directly
        else:
            key = PC.object_key(self.key, num, 0, aes=self.aes)
        if not self.aes:
            return PC.rc4(key, data)
        padn = 16 - len(data) % 16
        iv = self._iv()
        return iv + PC.aes_cbc_encrypt(key, iv,
                                       data + bytes([padn]) * padn)

    def encrypt_dict(self) -> bytes:
        from docling_ray.functions import pdfcrypt as PC

        def hexs(b: bytes) -> bytes:
            return b"<" + b.hex().encode("ascii") + b">"

        if self.mode == "rc4":
            return (b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44"
                    b" /O " + hexs(self.o) + b" /U " + hexs(self.u)
                    + b" >>")
        if self.mode == "aes":
            return (b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44"
                    b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                    b" /StmF /StdCF /StrF /StdCF"
                    b" /O " + hexs(self.o) + b" /U " + hexs(self.u)
                    + b" >>")
        if self.mode in ("pubsec", "pubsec256"):
            cfm, ln = (b"/AESV3", 32) if self.mode == "pubsec256" \
                else (b"/AESV2", 16)
            return (b"<< /Filter /Adobe.PubSec /SubFilter /adbe.pkcs7.s5"
                    b" /V %d /Length %d" % (5 if ln == 32 else 4, ln * 8)
                    + b" /CF << /DefaultCryptFilter << /CFM " + cfm
                    + b" /Length %d /Recipients [" % ln
                    + hexs(self.recipients) + b"] >> >>"
                    b" /StmF /DefaultCryptFilter /StrF /DefaultCryptFilter"
                    b" >>")
        import struct

        perms = PC.aes_encrypt_blocks(
            self.key, struct.pack("<i", self.p) + b"\xff\xff\xff\xff"
            + b"Tadb" + self.id0[:4])
        return (b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44"
                b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                b" /StmF /StdCF /StrF /StdCF"
                b" /O " + hexs(self.o) + b" /U " + hexs(self.u)
                + b" /OE " + hexs(self.oe) + b" /UE " + hexs(self.ue)
                + b" /Perms " + hexs(perms) + b" >>")

    def _enc_strings(self, body: bytes, num: int) -> bytes:
        """Re-emit every string in a serialized object body encrypted
        (always as hex strings). The writer's own literal escapes are
        only ``\\\\ \\( \\)``, so unescaping here is exact."""
        out = bytearray()
        i, n = 0, len(body)
        while i < n:
            c = body[i]
            if c == 0x28:  # ( literal
                j = i + 1
                depth = 1
                buf = bytearray()
                while j < n and depth:
                    ch = body[j]
                    if ch == 0x5C:
                        nxt = body[j + 1: j + 2]
                        buf += nxt if nxt in (b"\\", b"(", b")") \
                            else b"\\" + nxt
                        j += 2
                    elif ch == 0x28:
                        depth += 1
                        buf.append(ch)
                        j += 1
                    elif ch == 0x29:
                        depth -= 1
                        if depth:
                            buf.append(ch)
                        j += 1
                    else:
                        buf.append(ch)
                        j += 1
                out += (b"<" + self.enc_bytes(bytes(buf), num)
                        .hex().encode("ascii") + b">")
                i = j
            elif c == 0x3C and body[i + 1: i + 2] == b"<":  # <<
                out += b"<<"
                i += 2
            elif c == 0x3C:  # hex string
                j = body.index(b">", i)
                raw = bytes.fromhex(body[i + 1: j].decode("ascii"))
                out += (b"<" + self.enc_bytes(raw, num)
                        .hex().encode("ascii") + b">")
                i = j + 1
            else:
                out.append(c)
                i += 1
        return bytes(out)

    def encrypt_obj_body(self, num: int, body: bytes) -> bytes:
        """Encrypt one serialized object: stream data as a unit (crypt is
        the outermost filter; /Length rewritten), strings individually."""
        sm = body.find(b">>\nstream\n")
        if sm < 0:
            return self._enc_strings(body, num)
        dpart = self._enc_strings(body[: sm + 2], num)
        data = body[sm + len(b">>\nstream\n"): -len(b"\nendstream")]
        enc = self.enc_bytes(data, num)
        dpart = re.sub(rb"/Length \d+",
                       b"/Length %d" % len(enc), dpart, count=1)
        return dpart + b"\nstream\n" + enc + b"\nendstream"

    def trailer_entries(self, encrypt_oid: int) -> bytes:
        idhex = b"<" + self.id0.hex().encode("ascii") + b">"
        return (b" /Encrypt %d 0 R /ID [" % encrypt_oid
                + idhex + b" " + idhex + b"]")


def _build_tounicode_cmap(cid_map: dict[str, int]) -> bytes:
    """Serialize a /ToUnicode CMap for char → CID mapping: runs of >= 3
    consecutive (ord, cid) pairs become bfrange entries (exercising the
    increment rule), the rest bfchar — both section kinds appear."""
    items = sorted((cid, ch) for ch, cid in cid_map.items())
    ranges: list[tuple[int, int, int]] = []  # (cid_lo, cid_hi, ord_lo)
    chars: list[tuple[int, int]] = []
    i = 0
    while i < len(items):
        j = i
        while (j + 1 < len(items)
               and items[j + 1][0] == items[j][0] + 1
               and ord(items[j + 1][1]) == ord(items[j][1]) + 1):
            j += 1
        if j - i + 1 >= 3:
            ranges.append((items[i][0], items[j][0], ord(items[i][1])))
        else:
            chars.extend((c, ord(ch)) for c, ch in items[i: j + 1])
        i = j + 1
    out = [b"/CIDInit /ProcSet findresource begin\n"
           b"begincmap\n"
           b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"]
    if chars:
        out.append(b"%d beginbfchar\n" % len(chars))
        for cid, o in chars:
            out.append(b"<%04X> <%04X>\n" % (cid, o))
        out.append(b"endbfchar\n")
    if ranges:
        out.append(b"%d beginbfrange\n" % len(ranges))
        for lo, hi, o in ranges:
            out.append(b"<%04X> <%04X> <%04X>\n" % (lo, hi, o))
        out.append(b"endbfrange\n")
    out.append(b"endcmap\nend\n")
    return b"".join(out)


def _encode_simple_text(text: str, enc_font: dict) -> bytes | None:
    """Encode ``text`` through the simple-font scheme, or None when any
    char falls outside it (caller falls back to a UTF-16 hex string,
    which bypasses font decoding on both sides)."""
    if enc_font["kind"] == "winansi":
        try:
            return text.encode("cp1252")
        except UnicodeEncodeError:
            return None
    codes = enc_font["codes"]
    out = bytearray()
    for ch in text:
        code = codes.get(ch)
        if code is None:
            o = ord(ch)
            if o >= 256 or 0x80 <= o <= 0x9F:
                return None  # non-latin1 / claimed-range collision
            code = o
        out.append(code)
    return bytes(out)


def pages_to_pdf_bytes(pages: list[dict],
                       outline: list[tuple[int, str, int]] | None = None,
                       style: str = "classic",
                       content_filter: str = "flate",
                       cid_font: bool = False,
                       enc_font: dict | None = None,
                       form_split: bool = False,
                       encrypt: str | None = None,
                       acroform: list[dict] | None = None,
                       user_pw: bytes = b"",
                       owner_pw: bytes = b"") -> bytes:
    """Render page dicts (the pdf_cells schema) into a real PDF file:
    FlateDecode content streams, Helvetica Type1 font, text placed so the
    parser's geometry convention (baseline at cell bottom, leading = cell
    height) recovers l/t/b/font exactly; table regions as stroked
    rectangles; images as 1×1 XObjects carrying /DoclingRef.

    ``style="classic"`` serializes a PDF 1.4 file with a plain xref
    table; ``style="xrefstream"`` serializes a PDF 1.5 file whose
    non-stream objects live in a compressed /ObjStm and whose xref is a
    /Type /XRef stream (W [1 4 2], Flate + PNG-Up Predictor 12) — the
    modern-PDF shape the parser must handle independently.
    ``content_filter`` picks the page-content stream encoding: flate
    (default) / lzw / rl / ahx / a85 — the classic PDF stream filters,
    each encoded here independently of the parser's decoders.
    ``cid_font=True`` writes the text through an Identity-H Type0 font:
    show strings become 2-byte-CID hex strings and a /ToUnicode CMap
    stream (bfchar + bfrange sections) carries the mapping — the
    modern-subset-font shape whose text is garbage without CMap
    support. ``enc_font`` picks a simple-font /Encoding shape instead:
    ``{"kind": "winansi"}`` writes /Encoding /WinAnsiEncoding and
    encodes show strings via cp1252; ``{"kind": "diff", "codes":
    {ch: byte}, "names": {ch: glyphname}}`` writes an /Encoding dict
    with a /Differences array (consecutive codes collapsed, exercising
    the sequential-advance rule) — text through either is garbage
    unless the parser resolves the encoding."""
    objs: dict[int, bytes] = {}
    stream_ids: set[int] = set()
    next_id = [4]  # 1=catalog, 2=pages, 3=font
    cid_map: dict[str, int] = {}
    if cid_font:
        charset = sorted({ch for page in pages
                          for c in page.get("cells", [])
                          for ch in c["text"]})
        cid_map = {ch: k + 1 for k, ch in enumerate(charset)}

    def text_op(text: str) -> str:
        if cid_font:
            return "<" + "".join("%04X" % cid_map[ch]
                                 for ch in text) + ">"
        if enc_font is not None:
            raw = _encode_simple_text(text, enc_font)
            if raw is not None:
                esc = raw.replace(b"\\", b"\\\\") \
                    .replace(b"(", b"\\(").replace(b")", b"\\)")
                return "(" + esc.decode("latin-1") + ")"
        return _pdf_text_op(text)

    def add(body: bytes, *, is_stream: bool = False) -> int:
        oid = next_id[0]
        next_id[0] += 1
        objs[oid] = body
        if is_stream:
            stream_ids.add(oid)
        return oid

    page_ids: list[int] = []
    for page in pages:
        h = float(page.get("height", PAGE_H))
        w = float(page.get("width", PAGE_W))
        ops: list[str] = []
        xobj_entries: list[tuple[str, int]] = []
        # form_split: route a prefix of the page's text through a
        # /Subtype /Form XObject placed by a q..cm..Do..Q translation —
        # the reused-header shape. Offsets are only used when the
        # float subtraction round-trips exactly ((v-d)+d == v), so the
        # parser recovers identical geometry; a cell that fails the
        # check ends the prefix (op order preserved).
        form_ops: list[str] = []
        cells_list = page.get("cells", [])
        n_form = min(3, len(cells_list)) if form_split else 0
        fdx, fdy = 16.0, 32.0
        for ci, c in enumerate(cells_list):
            lead = float(c["b"]) - float(c["t"])
            l = float(c["l"])
            yb = h - float(c["b"])
            if (ci < n_form and (l - fdx) + fdx == l
                    and (yb - fdy) + fdy == yb):
                form_ops.append(
                    f"BT /F1 {_pdf_num(c['font_size'])} Tf "
                    f"{_pdf_num(lead)} TL "
                    f"{_pdf_num(l - fdx)} {_pdf_num(yb - fdy)} Td "
                    f"{text_op(c['text'])} Tj ET"
                )
                continue
            if ci < n_form:
                n_form = ci
            ops.append(
                f"BT /F1 {_pdf_num(c['font_size'])} Tf "
                f"{_pdf_num(lead)} TL "
                f"{_pdf_num(c['l'])} {_pdf_num(h - c['b'])} Td "
                f"{text_op(c['text'])} Tj ET"
            )
        if form_ops:
            fbody = zlib.compress("\n".join(form_ops).encode("latin-1"))
            form_id = add(
                (f"<< /Type /XObject /Subtype /Form /BBox [0 0 "
                 f"{_pdf_num(w)} {_pdf_num(h)}] /Resources "
                 f"<< /Font << /F1 3 0 R >> >> /Filter /FlateDecode "
                 f"/Length {len(fbody)} >>").encode("latin-1")
                + b"\nstream\n" + fbody + b"\nendstream",
                is_stream=True)
            xobj_entries.append(("Fm0", form_id))
            ops.insert(0, f"q 1 0 0 1 {_pdf_num(fdx)} {_pdf_num(fdy)}"
                          f" cm /Fm0 Do Q")
        for reg in page.get("tables", []):
            ops.append(
                f"{_pdf_num(reg['l'])} {_pdf_num(h - reg['b'])} "
                f"{_pdf_num(reg['r'] - reg['l'])} "
                f"{_pdf_num(reg['b'] - reg['t'])} re S"
            )
        for k, img in enumerate(page.get("images", [])):
            ref = img.get("media_ref", "")
            px = img.get("px")
            if px is not None and px["codec"] == "inline":
                # inline image (BI..ID..EI) with abbreviated keys; Flate
                # unless the compressed payload embeds the EI delimiter
                # pattern, then ASCIIHex (always delimiter-safe)
                raw = px["data"]
                cs = "/G" if px["mode"] == "gray" else "/RGB"
                body = zlib.compress(raw)
                filt = "/Fl"
                if re.search(rb"[\x00\t\n\x0c\r\x20]EI"
                             rb"[\x00\t\n\x0c\r\x20]", body + b" "):
                    body = raw.hex().encode("ascii") + b">"
                    filt = "/AHx"
                ops.append(
                    f"q {_pdf_num(img['r'] - img['l'])} 0 0 "
                    f"{_pdf_num(img['b'] - img['t'])} "
                    f"{_pdf_num(img['l'])} {_pdf_num(h - img['b'])} cm "
                    f"BI /W {px['w']} /H {px['h']} /CS {cs} /BPC 8 "
                    f"/F {filt} ID " + body.decode("latin-1") + " EI Q"
                )
                continue
            if px is not None and px["codec"] == "ccitt":
                # fax-scan payload: /CCITTFaxDecode with K/Columns/
                # Rows/BlackIs1 DecodeParms (+EncodedByteAlign for MH)
                body = px["data"]
                parms = (b"<< /K " + str(px["k"]).encode()
                         + b" /Columns " + str(px["w"]).encode()
                         + b" /Rows " + str(px["h"]).encode()
                         + (b" /BlackIs1 true" if px["black1"] else b"")
                         + (b" /EncodedByteAlign true" if px["align"]
                            else b"")
                         + b" >>")
                img_body = (
                    b"<< /Type /XObject /Subtype /Image /Width "
                    + str(px["w"]).encode() + b" /Height "
                    + str(px["h"]).encode()
                    + b" /ColorSpace /DeviceGray /BitsPerComponent 1"
                    b" /Filter /CCITTFaxDecode /DecodeParms " + parms
                    + b" /Length " + str(len(body)).encode()
                    + b" >>\nstream\n" + body + b"\nendstream"
                )
            elif px is not None:
                # real pixel payload: JPEG (/DCTDecode) or Flate raw
                # samples — no /DoclingRef; the parser must DECODE to
                # recover the imgpx:// ref the generator hand-computed
                cs = (b"/DeviceGray" if px["mode"] == "gray"
                      else b"/DeviceRGB")
                fl = (b"/DCTDecode" if px["codec"] == "jpeg"
                      else b"/FlateDecode")
                body = (px["data"] if px["codec"] == "jpeg"
                        else zlib.compress(px["data"]))
                img_body = (
                    b"<< /Type /XObject /Subtype /Image /Width "
                    + str(px["w"]).encode() + b" /Height "
                    + str(px["h"]).encode() + b" /ColorSpace " + cs
                    + b" /BitsPerComponent 8 /Filter " + fl
                    + b" /Length " + str(len(body)).encode()
                    + b" >>\nstream\n" + body + b"\nendstream"
                )
            else:
                img_body = (
                    b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1"
                    b" /ColorSpace /DeviceGray /BitsPerComponent 8"
                    b" /DoclingRef (" + ref.encode("latin-1") + b")"
                    b" /Length 1 >>\nstream\n\x00\nendstream"
                )
            img_id = add(img_body, is_stream=True)
            name = f"Im{k}"
            xobj_entries.append((name, img_id))
            ops.append(
                f"q {_pdf_num(img['r'] - img['l'])} 0 0 "
                f"{_pdf_num(img['b'] - img['t'])} "
                f"{_pdf_num(img['l'])} {_pdf_num(h - img['b'])} cm "
                f"/{name} Do Q"
            )
        annot_ids: list[int] = []
        for ln in page.get("links", []):
            rect = (f"[{_pdf_num(ln['l'])} {_pdf_num(h - ln['b'])} "
                    f"{_pdf_num(ln['r'])} {_pdf_num(h - ln['t'])}]")
            annot_ids.append(add(
                b"<< /Type /Annot /Subtype /Link /Rect "
                + rect.encode("latin-1") + b" /A << /S /URI /URI "
                + _pdf_text_op(ln["uri"]).encode("latin-1")
                + b" >> >>"))
        filt_name, filt_fn = _PDF_CONTENT_FILTERS[content_filter]
        content = filt_fn("\n".join(ops).encode("latin-1"))
        content_id = add(
            b"<< /Filter " + filt_name + b" /Length "
            + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream",
            is_stream=True,
        )
        res = "<< /Font << /F1 3 0 R >>"
        if xobj_entries:
            res += (" /XObject << "
                    + " ".join(f"/{n} {i} 0 R" for n, i in xobj_entries)
                    + " >>")
        res += " >>"
        annots = (b" /Annots ["
                  + b" ".join(b"%d 0 R" % a for a in annot_ids)
                  + b"]") if annot_ids else b""
        page_ids.append(add(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_pdf_num(w)} "
             f"{_pdf_num(h)}] /Resources {res} /Contents ").encode("latin-1")
            + str(content_id).encode() + b" 0 R" + annots + b" >>"
        ))

    outline_root = b""
    if outline:
        # /Outlines tree: levels nest via First/Last, siblings via
        # Next/Prev, each item Dest-ing its page
        base = next_id[0]
        root_id = base
        item_ids = list(range(base + 1, base + 1 + len(outline)))
        next_id[0] = base + 1 + len(outline)
        parent_of: list[int] = []
        stack: list[tuple[int, int]] = []  # (level, item_id)
        for k, (lvl, _title, _pg) in enumerate(outline):
            while stack and stack[-1][0] >= lvl:
                stack.pop()
            parent_of.append(stack[-1][1] if stack else root_id)
            stack.append((lvl, item_ids[k]))
        kids: dict[int, list[int]] = {}
        for k, iid in enumerate(item_ids):
            kids.setdefault(parent_of[k], []).append(iid)
        for k, (lvl, title, pg) in enumerate(outline):
            iid = item_ids[k]
            sibs = kids[parent_of[k]]
            pos = sibs.index(iid)
            parts = [b"<< /Title " + _pdf_text_op(title).encode("latin-1"),
                     b" /Parent %d 0 R" % parent_of[k],
                     b" /Dest [%d 0 R /Fit]" % page_ids[pg]]
            if pos > 0:
                parts.append(b" /Prev %d 0 R" % sibs[pos - 1])
            if pos + 1 < len(sibs):
                parts.append(b" /Next %d 0 R" % sibs[pos + 1])
            if iid in kids:
                parts.append(b" /First %d 0 R /Last %d 0 R /Count %d"
                             % (kids[iid][0], kids[iid][-1], len(kids[iid])))
            parts.append(b" >>")
            objs[iid] = b"".join(parts)
        top = kids.get(root_id, [])
        objs[root_id] = (b"<< /Type /Outlines /First %d 0 R /Last %d 0 R"
                         b" /Count %d >>" % (top[0], top[-1], len(outline))
                         if top else b"<< /Type /Outlines /Count 0 >>")
        outline_root = b" /Outlines %d 0 R" % root_id

    acro_entry = b""
    if acroform:
        # interactive form fields: /FT /Tx text, /Btn checkbox (/V on
        # name or /Off), /Ch choice (+/Opt); nested dicts via /Kids with
        # /FT inheritable from the parent
        def field_obj(f: dict) -> int:
            t = _pdf_text_op(f["name"]).encode("latin-1")
            kids = f.get("kids")
            if kids:
                kid_ids = [field_obj(k) for k in kids]
                ftp = (b" /FT /" + f["ft"].encode("ascii")
                       if f.get("ft") else b"")
                return add(b"<< /T " + t + ftp + b" /Kids ["
                           + b" ".join(b"%d 0 R" % i for i in kid_ids)
                           + b"] >>")
            ft = f.get("ft", "Tx")
            if ft == "Btn":
                v = b"/Yes" if f.get("on") else b"/Off"
                return add(b"<< /FT /Btn /T " + t + b" /V " + v + b" >>")
            vz = _pdf_text_op(f.get("value", "")).encode("latin-1")
            if ft == "Ch":
                opts = b""
                if f.get("options"):
                    opts = (b" /Opt ["
                            + b" ".join(_pdf_text_op(o).encode("latin-1")
                                        for o in f["options"]) + b"]")
                return add(b"<< /FT /Ch /T " + t + b" /V " + vz + opts
                           + b" >>")
            return add(b"<< /FT /Tx /T " + t + b" /V " + vz + b" >>")

        fids = [field_obj(f) for f in acroform]
        acro_id = add(b"<< /Fields ["
                      + b" ".join(b"%d 0 R" % i for i in fids) + b"] >>")
        acro_entry = b" /AcroForm %d 0 R" % acro_id
    objs[1] = (b"<< /Type /Catalog /Pages 2 0 R" + outline_root
               + acro_entry + b" >>")
    objs[2] = (b"<< /Type /Pages /Kids ["
               + b" ".join(b"%d 0 R" % p for p in page_ids)
               + b"] /Count " + str(len(page_ids)).encode() + b" >>")
    if cid_font:
        cmap_data = zlib.compress(_build_tounicode_cmap(cid_map))
        tu_id = add(
            b"<< /Filter /FlateDecode /Length "
            + str(len(cmap_data)).encode() + b" >>\nstream\n" + cmap_data
            + b"\nendstream", is_stream=True)
        desc_id = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthCID"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            b" /Supplement 0 >> >>")
        objs[3] = (b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID"
                   b" /Encoding /Identity-H /DescendantFonts ["
                   + str(desc_id).encode() + b" 0 R] /ToUnicode "
                   + str(tu_id).encode() + b" 0 R >>")
    elif enc_font is not None and enc_font["kind"] == "winansi":
        objs[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                   b" /Encoding /WinAnsiEncoding >>")
    elif enc_font is not None and enc_font["kind"] == "diff":
        parts = []
        prev = None
        for ch, code in sorted(enc_font["codes"].items(),
                               key=lambda kv: kv[1]):
            if prev is None or code != prev + 1:
                parts.append(str(code))
            parts.append("/" + enc_font["names"][ch])
            prev = code
        objs[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                   b" /Encoding << /Type /Encoding /Differences ["
                   + " ".join(parts).encode("ascii") + b"] >> >>")
    else:
        objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    enc = None
    if encrypt is not None:
        seed = __import__("hashlib").sha256(
            b"\x00".join(objs[o] for o in sorted(objs))).digest()
        enc = _PdfEncryptor(encrypt, seed, user_pw, owner_pw)
    if style == "xrefstream":
        return _serialize_pdf_xrefstream(objs, stream_ids, enc)
    encrypt_oid = -1
    if enc is not None:
        encrypt_oid = max(objs) + 1
        objs[encrypt_oid] = enc.encrypt_dict()
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        body = objs[oid]
        if enc is not None and oid != encrypt_oid:
            body = enc.encrypt_obj_body(oid, body)
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    xref_pos = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for oid in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets[oid]
    extra = enc.trailer_entries(encrypt_oid) if enc is not None else b""
    out += (b"trailer\n<< /Size %d /Root 1 0 R" % n_obj + extra
            + b" >>\nstartxref\n%d\n%%%%EOF" % xref_pos)
    return bytes(out)


def _png_up_filter(rows: list[bytes]) -> bytes:
    """Apply the PNG Up filter (Predictor 12) to fixed-width rows — each
    output row is 0x02 then byte-wise (row - prev_row) mod 256."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(len(row)))
        prev = row
    return bytes(out)


def _serialize_pdf_xrefstream(objs: dict[int, bytes],
                              stream_ids: set[int],
                              enc: "_PdfEncryptor | None" = None) -> bytes:
    """PDF 1.5 serialization: non-stream objects packed into one Flate
    /ObjStm (type-2 xref entries), stream objects written top-level
    (type 1), cross-reference emitted as a /Type /XRef stream whose entry
    table is Flate + PNG-Up (Predictor 12) encoded — exercising the
    parser's W-array, /Index, ObjStm and predictor paths.

    With ``enc``: top-level streams (incl. the ObjStm payload) encrypt
    as units; objects INSIDE the ObjStm are protected by its encryption
    and never individually encrypted (PDF 32000-1 §7.5.7); the /Encrypt
    dictionary itself is written top-level unencrypted; the xref stream
    is never encrypted and carries /Encrypt + /ID."""
    encrypt_oid = -1
    if enc is not None:
        encrypt_oid = max(objs) + 1
        objs[encrypt_oid] = enc.encrypt_dict()
    nonstream = sorted(oid for oid in objs
                       if oid not in stream_ids and oid != encrypt_oid)
    objstm_id = max(objs) + 1
    xref_id = objstm_id + 1

    # /ObjStm payload: "num off" pair table, then the objects
    body = bytearray()
    pair_offs: list[tuple[int, int]] = []
    for oid in nonstream:
        pair_offs.append((oid, len(body)))
        body += objs[oid] + b"\n"
    header = " ".join(f"{o} {off}" for o, off in pair_offs).encode() + b"\n"
    payload = zlib.compress(bytes(header) + bytes(body))
    if enc is not None:
        payload = enc.enc_bytes(payload, objstm_id)
    objstm_body = (
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode"
        b" /Length %d >>\nstream\n" % (len(nonstream), len(header),
                                       len(payload))
        + payload + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(stream_ids):
        offsets[oid] = len(out)
        body_i = objs[oid]
        if enc is not None:
            body_i = enc.encrypt_obj_body(oid, body_i)
        out += b"%d 0 obj\n" % oid + body_i + b"\nendobj\n"
    if encrypt_oid >= 0:
        offsets[encrypt_oid] = len(out)
        out += b"%d 0 obj\n" % encrypt_oid + objs[encrypt_oid] \
            + b"\nendobj\n"
    offsets[objstm_id] = len(out)
    out += b"%d 0 obj\n" % objstm_id + objstm_body + b"\nendobj\n"

    # xref stream: W [1 4 2], one row per object 0..xref_id (the xref
    # stream itself gets a type-1 entry at its own byte offset)
    xref_pos = len(out)
    offsets[xref_id] = xref_pos
    size = xref_id + 1
    rows: list[bytes] = []
    idx_of = {oid: k for k, oid in enumerate(nonstream)}
    for num in range(size):
        if num == 0:
            rows.append(b"\x00" + (0).to_bytes(4, "big")
                        + (0xFFFF).to_bytes(2, "big"))
        elif num in idx_of:
            rows.append(b"\x02" + objstm_id.to_bytes(4, "big")
                        + idx_of[num].to_bytes(2, "big"))
        else:
            rows.append(b"\x01" + offsets[num].to_bytes(4, "big")
                        + (0).to_bytes(2, "big"))
    xdata = zlib.compress(_png_up_filter(rows))
    extra = enc.trailer_entries(encrypt_oid) if enc is not None else b""
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R"
            % (xref_id, size) + extra
            + b" /Filter /FlateDecode"
            b" /DecodeParms << /Predictor 12 /Columns 7 >>"
            b" /Length %d >>\nstream\n" % len(xdata)
            + xdata + b"\nendstream\nendobj\n")
    out += b"startxref\n%d\n%%%%EOF" % xref_pos
    return bytes(out)


def _make_embedded_image(rng: random.Random) -> tuple[str, dict]:
    """One embedded-image XObject payload for the PDF writer → (expected
    imgpx:// media_ref, px dict for pages_to_pdf_bytes). Variants: JPEG
    gray/color (constant MCU-aligned tiles + identity quantization, so
    the reconstruction is hand-computable — same trick as the standalone
    image corpus) and Flate-compressed raw RGB/Gray samples. The expected
    ref is computed HERE from the source pixels, never via the decoder."""
    import numpy as np

    from docling_ray.functions.refs import image_media_ref

    variant = rng.randrange(6)
    if variant == 5:  # inline image (BI..ID..EI), raw gray/RGB samples
        w, h = rng.randrange(4, 25), rng.randrange(4, 25)
        gray = rng.random() < 0.5
        raw = rng.randbytes(w * h * (1 if gray else 3))
        if gray:
            rgb = np.repeat(np.frombuffer(raw, np.uint8)
                            .reshape(h, w, 1), 3, axis=2).tobytes()
        else:
            rgb = raw
        return (image_media_ref(w, h, "L" if gray else "RGB", rgb),
                {"w": w, "h": h, "mode": "gray" if gray else "rgb",
                 "codec": "inline", "data": raw})
    if variant == 4:  # CCITT G4 / byte-aligned-MH bilevel (fax scan)
        w, h = rng.randrange(4, 60), rng.randrange(4, 40)
        bits = np.zeros((h, w), np.uint8)
        for r in range(h):
            x = 0
            c = rng.randrange(2)
            while x < w:
                run = min(rng.randrange(1, w + 1), w - x)
                bits[r, x: x + run] = c
                x += run
                c ^= 1
        black1 = rng.random() < 0.3
        # four coding shapes: G4 (K<0), byte-aligned MH (K=0+align),
        # unaligned 1D (K=0, EOLs optional), mixed 1D/2D (K>0)
        shape = rng.choice(["g4", "mh", "g3_1d", "g3_2d"])
        if shape == "g4":
            data, k, align = fax_g4_encode(bits), -1, False
        elif shape == "mh":
            data, k, align = fax_mh_encode(bits), 0, True
        elif shape == "g3_1d":
            data = fax_g3_encode(bits, k=0,
                                 with_eol=rng.random() < 0.5)
            k, align = 0, False
        else:
            kk = rng.choice([2, 4])
            data = fax_g3_encode(bits, k=kk)
            k, align = kk, False
        # PDF 1.7 §7.4.6: BlackIs1 false (default) → black = sample 0
        gray = (bits if black1 else 1 - bits).astype(np.uint8) * 255
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        return (image_media_ref(w, h, "1", rgb.tobytes()),
                {"w": w, "h": h, "mode": "bilevel", "codec": "ccitt",
                 "data": data, "k": k, "align": align,
                 "black1": black1})
    if variant == 0:  # JPEG grayscale, constant 8x8 tiles
        w, h = rng.randrange(8, 33), rng.randrange(8, 33)
        tiles = np.frombuffer(
            rng.randbytes(((h + 7) // 8) * ((w + 7) // 8)), np.uint8
        ).reshape((h + 7) // 8, (w + 7) // 8)
        img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:h, :w]
        rows = [img[r].tobytes() for r in range(h)]
        data = pixels_to_jpeg(rows, w, h, gray=True,
                              progressive=rng.random() < 0.35)
        rgb = np.stack([img] * 3, axis=-1).tobytes()
        return (image_media_ref(w, h, "L", rgb),
                {"w": w, "h": h, "mode": "gray", "codec": "jpeg",
                 "data": data})
    if variant == 1:  # JPEG color, constant tiles (444/420)
        from docling_ray.functions.colorspace import (rgb_to_ycbcr,
                                                      ycbcr_to_rgb)

        sub = rng.choice(["444", "420"])
        t = 8 if sub == "444" else 16
        w, h = rng.randrange(8, 33), rng.randrange(8, 33)
        tiles = np.frombuffer(
            rng.randbytes(3 * ((h + t - 1) // t) * ((w + t - 1) // t)),
            np.uint8,
        ).reshape((h + t - 1) // t, (w + t - 1) // t, 3)
        img = np.repeat(np.repeat(tiles, t, axis=0), t, axis=1)[:h, :w]
        rows = [img[r].tobytes() for r in range(h)]
        data = pixels_to_jpeg(rows, w, h, gray=False, subsample=sub,
                              progressive=rng.random() < 0.35)
        expected = ycbcr_to_rgb(rgb_to_ycbcr(img))
        return (image_media_ref(w, h, "RGB", expected.tobytes()),
                {"w": w, "h": h, "mode": "rgb", "codec": "jpeg",
                 "data": data})
    w, h = rng.randrange(4, 41), rng.randrange(4, 41)
    if variant == 2:  # Flate raw RGB
        raw = rng.randbytes(3 * w * h)
        return (image_media_ref(w, h, "RGB", raw),
                {"w": w, "h": h, "mode": "rgb", "codec": "flate",
                 "data": raw})
    raw = rng.randbytes(w * h)  # Flate raw gray
    rgb = np.repeat(np.frombuffer(raw, np.uint8).reshape(h, w, 1),
                    3, axis=2)
    return (image_media_ref(w, h, "L", rgb.tobytes()),
            {"w": w, "h": h, "mode": "gray", "codec": "flate",
             "data": raw})


def _subst_page(pd_obj: dict, exp: list[Span],
                subst: dict[str, str]) -> tuple[dict, list[Span]]:
    """Apply the encoded-font char substitution to one page: every cell
    text in the payload and every expected span text; grid: media refs
    re-serialize with only their cell strings substituted (JSON keys and
    embedded img:// refs never contain substitution sources)."""
    tr = str.maketrans(subst)
    for c in pd_obj.get("cells", []):
        c["text"] = c["text"].translate(tr)
    out: list[Span] = []
    for (k, t, r) in exp:
        if r.startswith("grid:"):
            g = json.loads(r[5:])
            g["cells"] = [[cell.translate(tr) for cell in row]
                          for row in g["cells"]]
            r = "grid:" + json.dumps(g, separators=(",", ":"),
                                     ensure_ascii=False)
        out.append((k, t.translate(tr), r))
    return pd_obj, out


def build_pdf_bytes_doc(
    rng: random.Random, pool: list[str], doc_id: str
) -> tuple[str, list[Span], str, list[tuple[str, int, int]],
           list[tuple[str, str, str]]]:
    """Real-PDF-bytes document → (base64 of the file, expected spans,
    status, expected outline, expected links). Pages are built by the
    same geometry builder as pdf_cells docs (single-column: the parser's
    fixed advance metric cannot bound long lines inside a column gap),
    serialized to actual PDF bytes."""
    n_pages = rng.randint(1, 10)
    media_seq = [0]
    # font mode: 25% CID/Type0+ToUnicode, 10% /WinAnsiEncoding base,
    # 10% /Encoding dict with /Differences glyph names. The encoded
    # variants substitute chars the chosen encoding must carry into
    # every non-garbage single page's cells AND expected spans — the
    # substitution chars are sanitation-neutral and absent from every
    # media-ref alphabet (img:// ids, imgpx:// hex, grid JSON keys),
    # and the writer's char→code/name tables here are independent of
    # the parser's AGL resolver (the round trip proves the decode).
    fm = rng.random()
    cid_font = fm < 0.25
    enc_font: dict | None = None
    subst: dict[str, str] | None = None
    if 0.25 <= fm < 0.35:
        enc_font = {"kind": "winansi"}
        subst = {"q": "€", "z": "ž", "j": "‰", "w": "œ"}
    elif 0.35 <= fm < 0.45:
        # one name per resolver path: Greek table, accent construction,
        # algorithmic uniXXXX, literal AGL entry
        enc_font = {"kind": "diff",
                    "codes": {"α": 128, "ž": 129, "Δ": 130, "œ": 131},
                    "names": {"α": "alpha", "ž": "zcaron",
                              "Δ": "uni0394", "œ": "oe"}}
        subst = {"q": "α", "z": "ž", "j": "Δ", "w": "œ"}
    garbage_at = rng.randrange(n_pages) if (n_pages > 1 and rng.random() < 0.15) else -1
    hyph_at = -1
    if n_pages >= 2 and rng.random() < 0.25:
        cand = [i for i in range(n_pages - 1)
                if i != garbage_at and i + 1 != garbage_at]
        if cand:
            hyph_at = cand[rng.randrange(len(cand))]
    page_dicts: list[dict] = []
    expected: list[Span] = []
    per_page_exp: list[list[Span]] = []
    garbage_flags: list[bool] = []
    any_garbage = False
    p = 0
    while p < n_pages:
        if p == hyph_at:
            pair_payloads, pair_exp = build_hyphen_pair(
                rng, pool, doc_id, p1=p + 1, first_page=(p == 0))
            page_dicts.extend(json.loads(pl) for pl in pair_payloads)
            expected.extend(pair_exp)
            # keep physical page indexing for the outline: the pair's spans
            # land on its first page, the second page gets an empty slot
            per_page_exp.append(pair_exp)
            per_page_exp.append([])
            garbage_flags.extend((False, False))
            p += 2
            continue
        payload, exp, is_garbage = build_pdf_page(
            rng, pool, doc_id, page_no=p + 1, media_seq=media_seq,
            garbage=(p == garbage_at), first_page=(p == 0),
            two_col_allowed=False,
        )
        pd_obj = json.loads(payload)
        if subst is not None and not is_garbage:
            pd_obj, exp = _subst_page(pd_obj, exp, subst)
        page_dicts.append(pd_obj)
        expected.extend(exp)
        per_page_exp.append(exp)
        garbage_flags.append(is_garbage)
        any_garbage |= is_garbage
        p += 1
    # ~35% of files embed REAL pixel payloads for some figures (JPEG via
    # /DCTDecode, raw samples via /FlateDecode) instead of the 1×1
    # /DoclingRef placeholder: the parser must decode the pixels to
    # recover the imgpx:// ref hand-computed here (rich-cell images keep
    # placeholders — their ref is welded into the expected table grid)
    if rng.random() < 0.35:
        pic_refs = {r for (k, _t, r) in expected if k == "picture"}
        for pd_ in page_dicts:
            for img in pd_.get("images", []):
                old = img["media_ref"]
                if old not in pic_refs or rng.random() < 0.4:
                    continue
                new_ref, px = _make_embedded_image(rng)
                img["media_ref"] = new_ref
                img["px"] = px
                expected = [
                    (k, t, new_ref) if (k == "picture" and r == old)
                    else (k, t, r) for (k, t, r) in expected]
                for exp_spans in per_page_exp:
                    exp_spans[:] = [
                        (k, t, new_ref) if (k == "picture" and r == old)
                        else (k, t, r) for (k, t, r) in exp_spans]
    # outline = the document's headings (title level 0, sections level 1),
    # recorded as the expected TOC — the parser must recover it from the
    # /Outlines tree (bookmarks are the authoritative hierarchy signal)
    outline: list[tuple[int, str, int]] = []
    exp_outline: list[tuple[str, int, int]] = []
    has_title = False
    for pg_idx, exp_spans in enumerate(per_page_exp):
        for kind, text, _ref in exp_spans:
            if kind == "title":
                outline.append((0, text, pg_idx))
                exp_outline.append((text, 0, pg_idx + 1))
                has_title = True
            elif kind == "section_header":
                # depth under the title when one exists; top-level otherwise
                # (outline levels are DEPTHS, not semantic ranks)
                lvl = 1 if has_title else 0
                outline.append((lvl, text, pg_idx))
                exp_outline.append((text, lvl, pg_idx + 1))
    # half the corpus uses the modern PDF 1.5 shape (xref stream + ObjStm);
    # a third of content streams use a non-Flate filter (LZW / RunLength /
    # ASCIIHex / ASCII85 — each an independently-written encoder)
    # ~30% of files carry /Annots URI hyperlinks over 1-3 text cells
    # (never on garbage pages); the expected (text, href, 'pdf') list is
    # recorded HERE from the same rects handed to the writer — the link
    # rect covers exactly one cell under BOTH geometry conventions
    # (writer r and the parser's fixed 0.5-em advance)
    exp_links: list[tuple[str, str, str]] = []
    if rng.random() < 0.30:
        cand = [(pi, ci) for pi, pd_ in enumerate(page_dicts)
                if not garbage_flags[pi]
                for ci in range(len(pd_.get("cells", [])))]
        if cand:
            n_links = min(len(cand), rng.randint(1, 3))
            for idx in sorted(rng.sample(range(len(cand)), n_links)):
                pi, ci = cand[idx]
                c = page_dicts[pi]["cells"][ci]
                uri = (f"https://example.com/{rng.choice(pool)}"
                       f"/{pi}-{ci}")
                r_parser = c["l"] + 0.5 * c["font_size"] * len(c["text"])
                page_dicts[pi].setdefault("links", []).append({
                    "l": c["l"] - 0.5, "t": c["t"] - 0.5,
                    "r": max(c["r"], r_parser) + 0.5, "b": c["b"] + 0.5,
                    "uri": uri,
                })
                exp_links.append((c["text"], uri, "pdf"))
    # a quarter of files carry a filled AcroForm; the expected spans are
    # hand-computed HERE from the same field list handed to the writer
    # (never via the extractor) — checkbox kind + label, or the
    # canonical "Key: value" text line the kv miner consumes
    acroform: list[dict] | None = None
    if rng.random() < 0.25:
        acroform = []
        for fi in range(rng.randint(1, 4)):
            w1, w2 = rng.choice(pool), rng.choice(pool)
            key = f"{w1.capitalize()} {fi + 1}"
            r = rng.random()
            if r < 0.30:
                on = rng.random() < 0.5
                acroform.append({"name": key, "ft": "Btn", "on": on})
                expected.append(("checkbox_selected" if on
                                 else "checkbox_unselected", "", ""))
                expected.append(("text", key, ""))
            elif r < 0.45:
                acroform.append({"name": key, "ft": "Ch", "value": w2,
                                 "options": sorted({w2, rng.choice(pool)})})
                expected.append(("text", f"{key}: {w2}", ""))
            else:
                val = f"{w2} {rng.choice(pool)}"
                acroform.append({"name": key, "ft": "Tx", "value": val})
                expected.append(("text", f"{key}: {val}", ""))
    style = "xrefstream" if rng.random() < 0.5 else "classic"
    content_filter = (rng.choice(["lzw", "rl", "ahx", "a85"])
                      if rng.random() < 0.33 else "flate")
    # ~18% of files are encrypted with the standard security handler,
    # split across RC4-128 (V2/R3), AES-128 (V4/R4 AESV2) and AES-256
    # (V5/R6 AESV3) — all with an empty user password, the
    # encrypted-but-openable shape of real-world protected PDFs
    er = rng.random()
    encrypt = ("rc4" if er < 0.06 else "aes" if er < 0.12
               else "aes256" if er < 0.18 else None)
    # font mode drawn up top (cid / winansi / differences / plain);
    # a quarter of files route each page's leading text through a
    # /Subtype /Form XObject placed by a cm translation
    data = pages_to_pdf_bytes(page_dicts, outline=outline or None,
                              style=style, content_filter=content_filter,
                              cid_font=cid_font, enc_font=enc_font,
                              form_split=rng.random() < 0.25,
                              encrypt=encrypt, acroform=acroform)
    status = S.STATUS_PARTIAL if any_garbage else S.STATUS_SUCCESS
    return (base64.b64encode(data).decode("ascii"), expected, status,
            exp_outline, exp_links)


# ======================================================================
# Text / mixed documents
# ======================================================================

# (label, template) code snippets for text docs — the label is the
# generator's independent ground truth for the code-language detector
# (tests assert detect_code_language(template) == label for every entry)
CODE_SNIPPETS: list[tuple[str, str]] = [
    ("python", "def scale(x):\n    return x * {m}\nprint(scale({n}))"),
    ("javascript", "const v = {n};\nconsole.log(v * {m});"),
    ("sql", "SELECT key, value FROM metrics WHERE value > {n};"),
    ("go", "package main\n\nfunc main() {{\n\tfmt.Println({n})\n}}"),
    ("bash", "#!/bin/bash\necho $(({n} * {m}))"),
    ("rust", "fn main() {{\n    let mut x = {n};\n    x *= {m};\n}}"),
    ("unknown", "x = {n}\ny = x * {m}"),
]


def build_text_doc(
    rng: random.Random, pool: list[str], doc_id: str
) -> tuple[list[tuple[str, str, str]], list[Span],
           list[tuple[str, str, str]]]:
    """Mixed markdown text + media input spans → (input spans,
    expected spans, expected hyperlinks). Every expected span and link
    is hand-computed HERE from the same values handed to the markdown
    writer — never via the extractor (the round-trip discipline);
    ``grid_media_ref`` is the pinned generator-shared serialization
    (functions/refs.py)."""
    from docling_ray.functions.refs import grid_media_ref

    input_spans: list[tuple[str, str, str]] = []  # (kind, text, media_ref)
    exp: list[Span] = []
    links: list[tuple[str, str, str]] = []
    lines: list[str] = []
    title = _sentence(rng, pool)[:-1]
    lines.append(f"# {title}")
    exp.append(("title", title, ""))
    img_n = 0
    for _ in range(rng.randint(2, 6)):
        r = rng.random()
        if r < 0.12:
            h = _sentence(rng, pool)[:-1]
            lines.extend(["", f"## {h}"])
            exp.append(("section_header", h, ""))
        elif r < 0.18:
            # setext heading: underlined with = (title) or - (h2)
            h = _sentence(rng, pool)[:-1]
            if rng.random() < 0.5:
                lines.extend(["", h, "=" * rng.randint(3, 8)])
                exp.append(("title", h, ""))
            else:
                lines.extend(["", h, "-" * rng.randint(3, 8)])
                exp.append(("section_header", h, ""))
        elif r < 0.44:
            t = _para_text(rng, pool)
            lines.extend(["", t])
            exp.append(("text", t, ""))
        elif r < 0.52:
            # paragraph with an inline link: span keeps the anchor
            # text, the hyperlink goes to the companion stream
            pre = _sentence(rng, pool)
            post = _sentence(rng, pool)
            anchor = f"{rng.choice(pool)} {rng.choice(pool)}"
            url = f"https://ex.test/{rng.choice(pool)}"
            lines.extend(["", f"{pre} [{anchor}]({url}) {post}"])
            exp.append(("text", f"{pre} {anchor} {post}", ""))
            links.append((anchor, url, "body"))
        elif r < 0.58:
            # pipe table: header row, separator skipped, data rows
            ncols = rng.randint(2, 3)
            hdr = [rng.choice(pool) for _ in range(ncols)]
            data = [[rng.choice(pool) for _ in range(ncols)]
                    for _ in range(rng.randint(1, 3))]
            lines.append("")
            lines.append("| " + " | ".join(hdr) + " |")
            lines.append("|" + "---|" * ncols)
            lines.extend("| " + " | ".join(row) + " |" for row in data)
            exp.append(("table", "", grid_media_ref([hdr] + data)))
        elif r < 0.64:
            # blockquote: stripped markers, one flow paragraph
            sents = [_sentence(rng, pool)
                     for _ in range(rng.randint(1, 2))]
            lines.append("")
            lines.extend(f"> {s}" for s in sents)
            exp.append(("text", " ".join(sents), ""))
        elif r < 0.70:
            # inline image: picture + title caption + alt in the flow
            ref = f"img://{doc_id}/t{img_n}"
            img_n += 1
            alt = (f"{rng.choice(pool)} {rng.choice(pool)}"
                   if rng.random() < 0.7 else "")
            cap = _sentence(rng, pool)[:-1] if rng.random() < 0.6 else ""
            trail = _sentence(rng, pool) if rng.random() < 0.5 else ""
            part = f"![{alt}]({ref}" + (f' "{cap}")' if cap else ")")
            lines.extend(["", part + (f" {trail}" if trail else "")])
            exp.append(("picture", "", ref))
            if cap:
                exp.append(("caption", cap, ""))
            if alt:
                exp.append(("text", alt, ""))
            if trail:
                exp.append(("text", trail, ""))
        elif r < 0.76:
            # embedded HTML block, delegated to the HTML extractor
            if rng.random() < 0.5:
                t = _sentence(rng, pool)
                lines.extend(["", f"<p>{t}</p>"])
                exp.append(("text", t, ""))
            else:
                grid = [[rng.choice(pool) for _ in range(2)]
                        for _ in range(2)]
                frag = "<table>" + "".join(
                    "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                    for row in grid) + "</table>"
                lines.extend(["", frag])
                exp.append(("table", "", grid_media_ref(grid)))
        elif r < 0.84:
            items = [_sentence(rng, pool) for _ in range(rng.randint(2, 4))]
            lines.append("")
            lines.extend(f"- {it}" for it in items)
            exp.extend(("list_item", it, "") for it in items)
        elif r < 0.92:
            lang, tmpl = CODE_SNIPPETS[rng.randrange(len(CODE_SNIPPETS))]
            code = tmpl.format(n=rng.randrange(100), m=rng.randrange(9) + 2)
            lines.extend(["", "```", code, "```"])
            exp.append(("code", code, ""))
        else:
            expr = f"a_{rng.randrange(9)} + b^{rng.randrange(2, 6)}"
            lines.extend(["", f"$$ {expr} $$"])
            exp.append(("formula", expr, ""))
    input_spans.append(("text", "\n".join(lines), ""))
    for k in range(rng.randint(1, 3)):
        ref = f"img://{doc_id}/m{k}"
        cap = _sentence(rng, pool)[:-1] if rng.random() < 0.7 else ""
        input_spans.append(("media", cap, ref))
        exp.append(("picture", "", ref))
        if cap:
            exp.append(("caption", cap, ""))
    return input_spans, exp, links


# ======================================================================
# Image documents (raster files)
# ======================================================================
# stages/image_codec.py is the independent decoder — this writer is the
# other half of the round trip (the same discipline as pages_to_pdf_bytes
# above). Filter-0 PNG scanlines here; the decoder handles all filters
# (pinned by literal tests). The expected media_ref is hand-computed from
# the SOURCE pixel array via the shared functions/refs serialization.

import struct as _struct

import numpy as np


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (_struct.pack(">I", len(payload)) + tag + payload
            + _struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


_PNG_SPP = {0: 1, 2: 3, 3: 1, 6: 4}  # color type → samples per pixel
_ADAM7_PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def pixels_to_png(scanlines: list[bytes], width: int, height: int,
                  color_type: int, bit_depth: int = 8,
                  palette: bytes | None = None,
                  interlace: bool = False) -> bytes:
    """Minimal PNG writer: filter byte 0 per scanline, one IDAT.
    ``interlace=True`` writes Adam7 (8-bit types only): the seven passes
    serialized as independent filter-0 sub-images in pass order."""
    if interlace:
        if bit_depth != 8:
            raise ValueError("interlaced writer supports bit depth 8 only")
        spp = _PNG_SPP[color_type]
        body = bytearray()
        for x0, y0, dx, dy in _ADAM7_PASSES:
            for y in range(y0, height, dy):
                row = scanlines[y]
                sub = b"".join(row[x * spp: (x + 1) * spp]
                               for x in range(x0, width, dx))
                if sub:
                    body += b"\x00" + sub
        body = bytes(body)
    else:
        body = b"".join(b"\x00" + ln for ln in scanlines)
    ihdr = _struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                        0, 0, 1 if interlace else 0)
    out = [b"\x89PNG\r\n\x1a\n", _png_chunk(b"IHDR", ihdr)]
    if palette is not None:
        out.append(_png_chunk(b"PLTE", palette))
    out.append(_png_chunk(b"IDAT", zlib.compress(body)))
    out.append(_png_chunk(b"IEND", b""))
    return b"".join(out)


def pixels_to_bmp(rgb_rows: list[bytes], width: int, height: int) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (bottom-up rows, 4-byte padding).
    ``rgb_rows`` are top-down RGB byte rows; storage converts to BGR."""
    pad = (-(width * 3)) % 4
    raster = bytearray()
    for row in reversed(rgb_rows):
        bgr = bytearray()
        for x in range(width):
            r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            bgr += bytes((b, g, r))
        raster += bgr + b"\x00" * pad
    pix_off = 54
    file_size = pix_off + len(raster)
    header = (b"BM" + _struct.pack("<IHHI", file_size, 0, 0, pix_off)
              + _struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                             0, len(raster), 2835, 2835, 0, 0))
    return header + bytes(raster)


def pixels_to_ico(rgb_rows: list[bytes], width: int, height: int,
                  mask_rows: list[bytes] | None = None,
                  png: bool = False,
                  alpha_rows: list[bytes] | None = None) -> bytes:
    """One-entry ICO writer (independent of the decoder). ``png=True``
    embeds a PNG payload; otherwise a classic DIB with doubled-height
    BITMAPINFOHEADER, bottom-up BGR(A) XOR rows and the bottom-up 1-bit
    AND mask (``mask_rows`` of 0/1 bytes per pixel; all-opaque when
    None). ``alpha_rows`` switches the DIB to 32-bpp BGRA."""
    if png:
        payload = pixels_to_png(rgb_rows, width, height, color_type=2)
    else:
        bpp = 32 if alpha_rows is not None else 24
        raster = bytearray()
        for y in reversed(range(height)):
            row = rgb_rows[y]
            line = bytearray()
            for x in range(width):
                r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                line += bytes((b, g, r))
                if bpp == 32:
                    line.append(alpha_rows[y][x])
            line += b"\x00" * ((-len(line)) % 4)
            raster += line
        and_stride = ((width + 31) // 32) * 4
        for y in reversed(range(height)):
            bits = bytearray(and_stride)
            if mask_rows is not None:
                for x in range(width):
                    if mask_rows[y][x]:
                        bits[x >> 3] |= 0x80 >> (x & 7)
            raster += bits
        payload = _struct.pack("<IiiHHIIiiII", 40, width, height * 2, 1,
                               bpp, 0, len(raster), 0, 0, 0, 0) \
            + bytes(raster)
    entry = _struct.pack(
        "<BBBBHHII",
        width if width < 256 else 0, height if height < 256 else 0,
        0, 0, 1, 32, len(payload), 22)
    return b"\x00\x00\x01\x00\x01\x00" + entry + payload


def pixels_to_bmp8(idx_rows: list[bytes], width: int, height: int,
                   palette: bytes, rle: bool = False) -> bytes:
    """8-bit paletted BMP writer (bottom-up rows), BI_RGB or BI_RLE8
    (encoded runs + end-of-line/end-of-bitmap escapes). ``palette`` is
    RGB triples; storage quads are BGR0."""
    n_colors = len(palette) // 3
    quads = b"".join(bytes((palette[3 * i + 2], palette[3 * i + 1],
                            palette[3 * i], 0)) for i in range(n_colors))
    if rle:
        raster = bytearray()
        for row in reversed(idx_rows):  # bottom-up
            x = 0
            while x < width:
                run = 1
                while (x + run < width and run < 255
                       and row[x + run] == row[x]):
                    run += 1
                raster += bytes([run, row[x]])
                x += run
            raster += b"\x00\x00"  # end of line
        raster += b"\x00\x01"  # end of bitmap
        compression = 1
    else:
        pad = (-width) % 4
        raster = bytearray()
        for row in reversed(idx_rows):
            raster += row + b"\x00" * pad
        compression = 0
    pix_off = 54 + len(quads)
    header = (b"BM" + _struct.pack("<IHHI", pix_off + len(raster), 0, 0,
                                   pix_off)
              + _struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8,
                             compression, len(raster), 0, 0, n_colors, 0))
    return header + quads + bytes(raster)


def pixels_to_bmp_lowbpp(idx_rows: list[bytes], width: int, height: int,
                         palette: bytes, bpp: int,
                         rle4: bool = False) -> bytes:
    """1/4-bit paletted BMP writer (bottom-up, rows padded to 4 bytes),
    or BI_RLE4 (encoded alternating-nibble runs). Independent of the
    decoder; ``palette`` is RGB triples, storage quads BGR0."""
    n_colors = len(palette) // 3
    quads = b"".join(bytes((palette[3 * i + 2], palette[3 * i + 1],
                            palette[3 * i], 0)) for i in range(n_colors))
    if rle4:
        raster = bytearray()
        for row in reversed(idx_rows):
            x = 0
            while x < width:
                run = 1
                while (x + run < width and run < 255
                       and row[x + run] == row[x]):
                    run += 1
                raster += bytes([run, (row[x] << 4) | row[x]])
                x += run
            raster += b"\x00\x00"
        raster += b"\x00\x01"
        compression, out_bpp = 2, 4
    else:
        row_bytes = ((width * bpp + 31) // 32) * 4
        raster = bytearray()
        for row in reversed(idx_rows):
            if bpp == 4:
                packed = bytearray()
                for k in range(0, width, 2):
                    hi = row[k] << 4
                    lo = row[k + 1] if k + 1 < width else 0
                    packed.append(hi | lo)
            else:
                packed = bytearray(np.packbits(
                    np.frombuffer(bytes(row), np.uint8)).tobytes())
            raster += bytes(packed) + b"\x00" * (row_bytes - len(packed))
        compression, out_bpp = 0, bpp
    pix_off = 54 + len(quads)
    header = (b"BM" + _struct.pack("<IHHI", pix_off + len(raster), 0, 0,
                                   pix_off)
              + _struct.pack("<IiiHHIIiiII", 40, width, height, 1,
                             out_bpp, compression, len(raster), 0, 0,
                             n_colors, 0))
    return header + quads + bytes(raster)


def pixels_to_pnm(rows: list[bytes], width: int, height: int,
                  gray: bool) -> bytes:
    """Binary P5 (gray) / P6 (RGB) writer."""
    magic = b"P5" if gray else b"P6"
    return (magic + b"\n" + f"{width} {height}\n255\n".encode("ascii")
            + b"".join(rows))


def pixels_to_tiff(frames: list[list[bytes]], width: int, height: int,
                   gray: bool, packbits: bool = False,
                   lzw: bool = False, predictor: bool = False,
                   tiled: bool = False) -> bytes:
    """Minimal little-endian TIFF writer: one IFD per frame, one strip,
    compression none, PackBits (literal-run-only encoding — valid
    PackBits) or LZW (compression 5, sharing the literal+CLEAR
    MSB-first encoder with the PDF filter writer), optionally with
    predictor 2 (horizontal differencing) — all independent of the
    decoder."""
    spp = 1 if gray else 3
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_ptr_pos = 4

    for fi, rows in enumerate(frames):
        if predictor and not tiled:  # horizontal differencing per row
            diffed = []
            for row in rows:
                d = bytearray(row)
                for x in range(len(d) - 1, spp - 1, -1):
                    d[x] = (d[x] - d[x - spp]) & 0xFF
                diffed.append(bytes(d))
            rows = diffed
        if tiled:
            # tiled layout: 16x16 tiles (the TIFF §15 minimum multiple),
            # edge tiles padded to FULL size, each tile its own
            # (optionally LZW) byte stream
            tw = th = 16
            ntx = (width + tw - 1) // tw
            nty = (height + th - 1) // th
            tile_offs: list[int] = []
            tile_cnts: list[int] = []
            for ty in range(nty):
                for tx in range(ntx):
                    tile = bytearray()
                    for yy in range(th):
                        y = ty * th + yy
                        row = rows[y] if y < height else b""
                        seg = row[tx * tw * spp: (tx + 1) * tw * spp]
                        seg = bytearray(
                            seg + b"\x00" * (tw * spp - len(seg)))
                        if predictor:  # per TILE row, per sample
                            for x in range(len(seg) - 1, spp - 1, -1):
                                seg[x] = (seg[x] - seg[x - spp]) & 0xFF
                        tile += seg
                    blob = _enc_pdf_lzw(bytes(tile)) if lzw \
                        else bytes(tile)
                    tile_offs.append(len(out))
                    tile_cnts.append(len(blob))
                    out += blob
                    if len(out) % 2:
                        out += b"\x00"
            ifd_off = len(out)
            entries = [
                (256, 4, 1, width), (257, 4, 1, height),
                (258, 3, spp, None),
                (259, 3, 1, 5 if lzw else 1),
                (262, 3, 1, 1),
                (277, 3, 1, spp),
                (322, 4, 1, tw), (323, 4, 1, th),
                (324, 4, len(tile_offs), tile_offs),
                (325, 4, len(tile_cnts), tile_cnts),
            ]
            if predictor:
                entries.append((317, 3, 1, 2))
            extra = b""
            extra_base = ifd_off + 2 + 12 * len(entries) + 4
            body = bytearray(_struct.pack("<H", len(entries)))
            for tag, typ, cnt, val in entries:
                if tag == 258:
                    if spp == 1:
                        body += _struct.pack("<HHIHH", tag, typ, cnt,
                                             8, 0)
                    else:
                        body += _struct.pack("<HHII", tag, typ, cnt,
                                             extra_base + len(extra))
                        extra += _struct.pack("<HHH", 8, 8, 8) \
                            + b"\x00\x00"
                elif isinstance(val, list):
                    if cnt == 1:
                        body += _struct.pack("<HHII", tag, typ, cnt,
                                             val[0])
                    else:
                        body += _struct.pack("<HHII", tag, typ, cnt,
                                             extra_base + len(extra))
                        extra += _struct.pack(f"<{cnt}I", *val)
                elif typ == 3:
                    body += _struct.pack("<HHIHH", tag, typ, cnt, val, 0)
                else:
                    body += _struct.pack("<HHII", tag, typ, cnt, val)
            next_ptr_pos = ifd_off + 2 + 12 * len(entries)
            body += _struct.pack("<I", 0)
            out[ifd_ptr_pos: ifd_ptr_pos + 4] = _struct.pack(
                "<I", ifd_off)
            out += body + extra
            ifd_ptr_pos = next_ptr_pos
            continue
        raster = b"".join(rows)
        if lzw:
            strip = _enc_pdf_lzw(raster)
        elif packbits:
            # literal runs of ≤128 bytes per row (no RLE — still valid)
            enc = bytearray()
            for row in rows:
                for off in range(0, len(row), 128):
                    chunk = row[off: off + 128]
                    enc.append(len(chunk) - 1)
                    enc += chunk
            strip = bytes(enc)
        else:
            strip = raster
        comp_tag = 5 if lzw else (32773 if packbits else 1)
        strip_off = len(out)
        out += strip
        if len(out) % 2:
            out += b"\x00"
        ifd_off = len(out)
        entries = [
            (256, 4, 1, width),            # ImageWidth
            (257, 4, 1, height),           # ImageLength
            (258, 3, spp, None),           # BitsPerSample (8 each)
            (259, 3, 1, comp_tag),
            (262, 3, 1, 1),                # BlackIsZero
            (273, 4, 1, strip_off),        # StripOffsets
            (277, 3, 1, spp),              # SamplesPerPixel
            (278, 4, 1, height),           # RowsPerStrip
            (279, 4, 1, len(strip)),       # StripByteCounts
        ]
        if predictor:
            entries.append((317, 3, 1, 2))  # Predictor: horizontal diff
        extra = b""
        extra_base = ifd_off + 2 + 12 * len(entries) + 4
        body = bytearray(_struct.pack("<H", len(entries)))
        for tag, typ, cnt, val in entries:
            if tag == 258:
                if spp == 1:
                    body += _struct.pack("<HHIHH", tag, typ, cnt, 8, 0)
                else:
                    body += _struct.pack("<HHII", tag, typ, cnt,
                                         extra_base + len(extra))
                    extra += _struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"
            elif typ == 3:
                body += _struct.pack("<HHIHH", tag, typ, cnt, val, 0)
            else:
                body += _struct.pack("<HHII", tag, typ, cnt, val)
        next_ptr_pos = ifd_off + 2 + 12 * len(entries)
        body += _struct.pack("<I", 0)  # next-IFD placeholder
        out[ifd_ptr_pos: ifd_ptr_pos + 4] = _struct.pack("<I", ifd_off)
        out += body + extra
        ifd_ptr_pos = next_ptr_pos
    return bytes(out)


class _FaxBitWriter:
    """MSB-first bit accumulator for the CCITT encoders."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: str) -> None:
        for ch in bits:
            self.acc = (self.acc << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        if self.n:
            self.out.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _fax_put_run(bw: _FaxBitWriter, run: int, black: bool) -> None:
    """Emit one run as make-up code(s) + terminating code (T.4 MH)."""
    from docling_ray.functions import faxcodes as _F

    makeup = dict(_F.BLACK_MAKEUP if black else _F.WHITE_MAKEUP)
    makeup.update(_F.EXT_MAKEUP)
    term = _F.BLACK_TERM if black else _F.WHITE_TERM
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        bw.put(makeup[m])
        run -= m
    bw.put(term[run])


def _fax_transitions(row: "np.ndarray") -> list[int]:
    """Changing-element positions of one bilevel row (1 = black)."""
    idx = np.flatnonzero(row[1:] != row[:-1]) + 1
    out = idx.tolist()
    if len(row) and row[0]:
        out.insert(0, 0)
    return out


def _fax_encode_2d_line(bw: "_FaxBitWriter", cur: list[int],
                        ref: list[int], w: int) -> None:
    """One 2D-coded line (T.6 / T.4 K>0) against the reference line."""
    from docling_ray.functions import faxcodes as _F

    curx = cur + [w, w]
    a0, color, ci = -1, 0, 0
    while a0 < w:
        i = 0
        while ref[i] <= a0:
            i += 1
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else w
        b2 = ref[i + 1] if i + 1 < len(ref) else w
        a1 = curx[ci] if ci < len(curx) else w
        if b2 < a1:
            bw.put(_F.MODE_CODES["P"])
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            bw.put(_F.MODE_CODES[
                "V0" if d == 0 else
                (f"VR{d}" if d > 0 else f"VL{-d}")])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            a2 = curx[ci + 1] if ci + 1 < len(curx) else w
            a0s = max(a0, 0)
            bw.put(_F.MODE_CODES["H"])
            _fax_put_run(bw, a1 - a0s, black=bool(color))
            _fax_put_run(bw, a2 - a1, black=not bool(color))
            a0 = a2
            ci += 2


def _fax_encode_1d_line(bw: "_FaxBitWriter", bits_row: "np.ndarray",
                        w: int) -> None:
    """One modified-Huffman line (white run first)."""
    pos = 0
    black = False
    trans = _fax_transitions(bits_row) + [w]
    for t in trans:
        if t > w:
            break
        _fax_put_run(bw, t - pos, black)
        pos = t
        black = not black
        if pos >= w:
            break


def fax_g4_encode(bits: "np.ndarray") -> bytes:
    """ITU-T T.6 (Group 4 / MMR) encoder over an (H, W) 0/1 array —
    independent of stages/fax_codec (only the functions/faxcodes tables
    are shared, per the repo's shared-code rule). Ends with EOFB."""
    from docling_ray.functions import faxcodes as _F

    h, w = bits.shape
    bw = _FaxBitWriter()
    ref = [w, w]
    for r in range(h):
        cur = _fax_transitions(bits[r])
        _fax_encode_2d_line(bw, cur, ref, w)
        ref = cur + [w, w]
    bw.put(_F.EOL)
    bw.put(_F.EOL)  # EOFB
    return bw.flush()


def fax_g3_encode(bits: "np.ndarray", k: int = 0,
                  with_eol: bool = True,
                  byte_align: bool = False) -> bytes:
    """ITU-T T.4 (Group 3) encoder: ``k == 0`` writes pure 1D MH lines
    (unaligned unless ``byte_align``); ``k > 0`` writes mixed mode —
    every K-th line 1D, the rest 2D, each line preceded by EOL + tag
    bit (1 = 1D, 0 = 2D). ``with_eol=False`` (k == 0 only) packs raw
    MH lines back to back — the no-EOL unaligned shape."""
    from docling_ray.functions import faxcodes as _F

    h, w = bits.shape
    if k > 0 and not with_eol:
        raise ValueError("K>0 requires EOL tag bits")
    bw = _FaxBitWriter()
    ref = [w, w]
    for r in range(h):
        one_d = k == 0 or r % k == 0
        if byte_align:
            bw.align()
        if with_eol:
            bw.put(_F.EOL)
            if k > 0:
                bw.put("1" if one_d else "0")
        cur = _fax_transitions(bits[r])
        if one_d:
            _fax_encode_1d_line(bw, bits[r], w)
        else:
            _fax_encode_2d_line(bw, cur, ref, w)
        ref = cur + [w, w]
    return bw.flush()


def fax_mh_encode(bits: "np.ndarray") -> bytes:
    """TIFF Compression=2 ("CCITT RLE") encoder: modified Huffman runs,
    white first, each row byte-aligned."""
    h, w = bits.shape
    bw = _FaxBitWriter()
    for r in range(h):
        pos = 0
        black = False
        trans = _fax_transitions(bits[r]) + [w]
        for t in trans:
            if t > w:
                break
            _fax_put_run(bw, t - pos, black)
            pos = t
            black = not black
            if pos >= w:
                break
        bw.align()
    return bw.flush()


def bits_to_pbm(bits: "np.ndarray", ascii_: bool = False) -> bytes:
    """PBM writer (P1 ASCII / P4 raw packed, rows byte-padded,
    1 = black) — the decoder's independent round-trip half."""
    h, w = bits.shape
    if ascii_:
        body = "\n".join(" ".join(str(int(v)) for v in row)
                         for row in bits)
        return f"P1\n{w} {h}\n{body}\n".encode("ascii")
    packed = np.packbits(bits, axis=1)
    return f"P4\n{w} {h}\n".encode("ascii") + packed.tobytes()


def bilevel_to_tiff(frames_bits: list["np.ndarray"], width: int,
                    height: int, g4: bool = True,
                    compression: str = "fax",
                    g3_2d: bool = False,
                    g3_align: bool = False) -> bytes:
    """Little-endian bilevel TIFF: BitsPerSample 1, Photometric 0
    (WhiteIsZero — the fax sense: 1 codes black), Compression 4 (G4) or
    2 (MH RLE) when ``compression="fax"``, Compression 3 (Group 3 with
    per-line EOLs; ``g3_2d`` = mixed 1D/2D with tag bits, ``g3_align``
    = byte-aligned EOLs — both recorded in T4Options) when
    ``compression="g3"``, or 1 (raw packed rows, byte-padded MSB-first)
    when ``compression="none"``; one strip per page."""
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_ptr_pos = 4
    for bits in frames_bits:
        if compression == "none":
            strip = np.packbits(bits, axis=1).tobytes()
        elif compression == "g3":
            strip = fax_g3_encode(bits, k=(4 if g3_2d else 0),
                                  byte_align=g3_align)
        else:
            strip = fax_g4_encode(bits) if g4 else fax_mh_encode(bits)
        strip_off = len(out)
        out += strip
        if len(out) % 2:
            out += b"\x00"
        ifd_off = len(out)
        comp_tag = (1 if compression == "none"
                    else 3 if compression == "g3"
                    else (4 if g4 else 2))
        entries = [
            (256, 4, 1, width), (257, 4, 1, height),
            (258, 3, 1, 1),                 # BitsPerSample = 1
            (259, 3, 1, comp_tag),          # Compression
            (262, 3, 1, 0),                 # WhiteIsZero
            (273, 4, 1, strip_off),
            (277, 3, 1, 1),
            (278, 4, 1, height),
            (279, 4, 1, len(strip)),
        ]
        if compression == "g3":
            entries.append((292, 4, 1,      # T4Options
                            (1 if g3_2d else 0)
                            | (4 if g3_align else 0)))
        entries.sort()
        body = bytearray(_struct.pack("<H", len(entries)))
        for tag, typ, cnt, val in entries:
            if typ == 3:
                body += _struct.pack("<HHIHH", tag, typ, cnt, val, 0)
            else:
                body += _struct.pack("<HHII", tag, typ, cnt, val)
        next_ptr_pos = ifd_off + 2 + 12 * len(entries)
        body += _struct.pack("<I", 0)
        out[ifd_ptr_pos: ifd_ptr_pos + 4] = _struct.pack("<I", ifd_off)
        out += body
        ifd_ptr_pos = next_ptr_pos
    return bytes(out)


def _gif_lzw_encode(min_code_size: int, idx: bytes) -> bytes:
    """Independent GIF LZW encoder (dict-building, variable code width,
    clear first, EOI last, LSB-first bit packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    buf = 0
    nbits = 0
    out = bytearray()

    def put(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    put(clear)
    w = b""
    for byte in idx:
        c = bytes((byte,))
        wc = w + c
        if wc in table:
            w = wc
            continue
        put(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            put(clear)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = c
    if w:
        put(table[w])
    put(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def pixels_to_gif(frames_idx: list[bytes], width: int, height: int,
                  palette: bytes,
                  frames_meta: list[dict] | None = None) -> bytes:
    """Minimal GIF89a writer: global palette; full-screen frames by
    default. ``frames_meta[k]`` (optional, per frame) may carry
    ``rect=(x, y, w, h)`` for a sub-rectangle frame (its pixel bytes
    then cover just the rect), ``disposal`` (0-3) and ``transparent``
    (palette index) — emitted as a Graphic Control Extension, the
    animation paths the decoder must compose."""
    n_colors = len(palette) // 3
    depth = max(1, (n_colors - 1).bit_length())
    pal_size = 1 << depth
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", width, height)
    out.append(0x80 | (depth - 1))  # GCT present
    out += b"\x00\x00"  # bg index, aspect
    out += palette + b"\x00" * (3 * pal_size - len(palette))
    min_code = max(2, depth)
    for k, idx in enumerate(frames_idx):
        meta = (frames_meta[k] if frames_meta and k < len(frames_meta)
                else {}) or {}
        rect = meta.get("rect", (0, 0, width, height))
        disposal = int(meta.get("disposal", 0))
        transparent = meta.get("transparent", None)
        if disposal or transparent is not None:
            packed = (disposal & 7) << 2
            tidx = 0
            if transparent is not None:
                packed |= 1
                tidx = int(transparent)
            out += bytes([0x21, 0xF9, 4, packed, 0, 0, tidx, 0])
        out += b"\x2c" + _struct.pack("<HHHH", *rect)
        out.append(0)  # no local palette, not interlaced
        out.append(min_code)
        enc = _gif_lzw_encode(min_code, idx)
        for off in range(0, len(enc), 255):
            chunk = enc[off: off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


# --- baseline JPEG writer (ITU-T T.81 Annex K tables, identity quant) ---
# Forward DCT + Huffman encode implemented here, independent of the
# decoder's inverse path (stages/image_codec.decode_jpeg). With the
# all-ones quantization table a constant 8x8 block carries ONLY an
# integral DC coefficient, so quantization is lossless and a correct
# decoder reconstructs the source bit-exactly — which is what lets the
# generator hand-compute the expected pixel fingerprint for images built
# from constant MCU-aligned tiles. Color expectation additionally runs
# through the shared functions/colorspace pair (pinned by literal tests).

_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical tables: (BITS counts per length 1..16, HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


# Progressive AC scans additionally need EOBn (n>1) symbols, which the
# baseline Annex-K tables do not contain; real encoders emit custom
# per-scan tables. One complete flat table covers every symbol a
# progressive AC scan can produce: (run, size 1-10) x 16 runs, ZRL, and
# EOB0..EOB14 - 176 symbols, all at code length 8 (Kraft 176/256 < 1).
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)] + [0xF0],
)


def _jpeg_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman codes (T.81 Annex C): symbol → (code, length)."""
    assert sum(bits) == len(vals)
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad


def _jpeg_fdct(block) -> list[int]:
    """8x8 spatial block → integer-rounded DCT coefficients (the writer's
    own forward transform; the decoder owns the inverse)."""
    import numpy as np

    a = np.array([
        [(0.5 / np.sqrt(2) if u == 0 else 0.5)
         * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
        for u in range(8)
    ])
    f = a @ (np.asarray(block, dtype=np.float64) - 128.0) @ a.T
    return [int(v) for v in np.rint(f).astype(np.int64).ravel()]


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit two's-complement-style appended bits)."""
    s = 0
    a = abs(v)
    while a:
        s += 1
        a >>= 1
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _jpeg_encode_block(w: _JpegBitWriter, zz: list[int], pred: int,
                       dc_codes, ac_codes) -> int:
    """Huffman-encode one block's zigzag coefficients (sequential);
    returns the new DC predictor."""
    diff = zz[0] - pred
    s, bits_v = _jpeg_magnitude(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(bits_v, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s, bits_v = _jpeg_magnitude(zz[k])
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(bits_v, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return zz[0]


class _AcProgState:
    """Cross-block EOB-run + buffered-correction-bit state for one
    progressive AC scan (T.81 G.1.2.2/G.1.2.3 encoder side)."""

    def __init__(self, w: _JpegBitWriter, ac_codes):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            n = self.eobrun
            r = n.bit_length() - 1
            code, ln = self.ac[r << 4]
            self.w.put(code, ln)
            if r:
                self.w.put(n - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.w.put(b, 1)
        self.pending = []

    def symbol(self, rs: int) -> None:
        """A real (run, size) symbol ends any pending EOB run first."""
        self.flush()
        code, ln = self.ac[rs]
        self.w.put(code, ln)

    def eob(self, correction_bits: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(correction_bits)
        if self.eobrun == 0x7FFF:
            self.flush()


def _enc_ac_first(state: _AcProgState, zz: list[int], ss: int, se: int,
                  al: int) -> None:
    """First AC pass over band [ss, se] at approximation al."""
    run = 0
    wrote = False
    for k in range(ss, se + 1):
        t = zz[k]
        t = -((-t) >> al) if t < 0 else t >> al  # sign-magnitude shift
        if t == 0:
            run += 1
            continue
        while run > 15:
            state.symbol(0xF0)
            run -= 16
        s, bits_v = _jpeg_magnitude(t)
        state.symbol((run << 4) | s)
        state.w.put(bits_v, s)
        run = 0
        wrote = True
    if run > 0 or not wrote:
        state.eob([])


def _enc_ac_refine(state: _AcProgState, zz: list[int], ss: int, se: int,
                   al: int) -> None:
    """Refinement AC pass: newly-significant coefficients (magnitude 1
    at this precision) as (run, 1) + sign; correction bits for
    already-significant ones ride the bit stream behind the next
    symbol. A pending >15 zero run flushes as ZRL at ANY nonzero
    arrival - but only up to the last newly-significant position;
    trailing runs and bits fold into the EOB run (the decoder reads
    correction bits during each symbol's traversal span, so the
    interleaving must match position for position)."""
    t = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # index of the last newly-significant coefficient
    for idx, tv in enumerate(t):
        if tv == 1:
            eob = ss + idx
    run = 0
    bits: list[int] = []
    wrote = False
    for k in range(ss, se + 1):
        tv = t[k - ss]
        if tv == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            state.symbol(0xF0)
            run -= 16
            for b in bits:
                state.w.put(b, 1)
            bits = []
        if tv > 1:  # already significant: correction bit
            bits.append(tv & 1)
            continue
        state.symbol((run << 4) | 1)
        state.w.put(1 if zz[k] > 0 else 0, 1)
        for b in bits:
            state.w.put(b, 1)
        bits = []
        run = 0
        wrote = True
    if run > 0 or bits or not wrote:
        state.eob(bits)


def pixels_to_jpeg(pixels, width: int, height: int, gray: bool,
                   subsample: str = "444",
                   restart_interval: int = 0,
                   progressive: bool = False) -> bytes:
    """JPEG writer with identity quantization: baseline sequential, or
    progressive (``progressive=True``) with the standard spectral
    selection + successive approximation scan script (DC Al=1 →
    per-component AC 1-5 and 6-63 at Al=1 → DC refinement → AC
    refinements), exercising EOB runs and correction bits.

    ``pixels``: top-down rows of bytes — ``width`` grays or ``3*width``
    RGB per row. Color converts through the shared
    functions/colorspace.rgb_to_ycbcr; ``subsample`` is ``"444"`` or
    ``"420"`` (2x2 box-mean chroma). ``restart_interval`` applies to the
    baseline path only."""
    import numpy as np

    from docling_ray.functions.colorspace import rgb_to_ycbcr

    if gray:
        arr = np.frombuffer(b"".join(pixels), dtype=np.uint8).reshape(
            height, width)
        planes = [arr]
        samps = [(1, 1)]
    else:
        rgb = np.frombuffer(b"".join(pixels), dtype=np.uint8).reshape(
            height, width, 3)
        ycc = rgb_to_ycbcr(rgb)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "420":
            def down(p):
                ph = (height + 1) // 2 * 2
                pw = (width + 1) // 2 * 2
                padded = np.pad(p.astype(np.float64),
                                ((0, ph - height), (0, pw - width)),
                                mode="edge")
                return np.floor(
                    padded.reshape(ph // 2, 2, pw // 2, 2)
                    .mean(axis=(1, 3)) + 0.5).astype(np.uint8)
            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    # pad every plane to its block grid (edge replication keeps constant
    # tiles constant, so the padding never perturbs the DC-only property)
    padded = []
    for p, (h, v) in zip(planes, samps):
        ph, pw = p.shape
        bh = -(-ph // 8) * 8
        bw = -(-pw // 8) * 8
        # the interleaved MCU grid may demand more blocks than the
        # plane's own ceil-division (odd dims with subsampling)
        bh = max(bh, -(-height // (8 * vmax)) * 8 * v)
        bw = max(bw, -(-width // (8 * hmax)) * 8 * h)
        padded.append(np.pad(p, ((0, bh - ph), (0, bw - pw)), mode="edge"))

    dc_l = _jpeg_codes(*_DC_LUM)
    ac_l = _jpeg_codes(*_AC_LUM)
    dc_c = _jpeg_codes(*_DC_CHR)
    ac_c = _jpeg_codes(*_AC_CHR)

    # all block coefficients up front (zigzag order), shared by both
    # emission paths; the MCU-padded plane grid covers every data unit
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    comp_coefs = []
    for p, (h, v) in zip(padded, samps):
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        rows = []
        for by in range(bh):
            row = []
            for bx in range(bw):
                coef = _jpeg_fdct(p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8])
                row.append([coef[_JPEG_ZZ[k]] for k in range(64)])
            rows.append(row)
        comp_coefs.append(rows)

    dc_l = _jpeg_codes(*_DC_LUM)
    dc_c = _jpeg_codes(*_DC_CHR)
    if progressive:
        ac_l = ac_c = _jpeg_codes(*_AC_PROG)
    else:
        ac_l = _jpeg_codes(*_AC_LUM)
        ac_c = _jpeg_codes(*_AC_CHR)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + _struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + _struct.pack(">HH", 1, 1) + b"\x00\x00")  # APP0
    qt = bytes([1] * 64)
    out += b"\xff\xdb" + _struct.pack(">H", 67) + b"\x00" + qt  # DQT id 0
    nf = len(planes)
    sof = _struct.pack(">BHHB", 8, height, width, nf)
    for ci, (h, v) in enumerate(samps):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + _struct.pack(">H", 2 + len(sof)) + sof
    ac_lum_spec = _AC_PROG if progressive else _AC_LUM
    ac_chr_spec = _AC_PROG if progressive else _AC_CHR
    for tc, th, (bits, vals) in (
        (0, 0, _DC_LUM), (1, 0, ac_lum_spec),
        *(((0, 1, _DC_CHR), (1, 1, ac_chr_spec)) if nf == 3 else ()),
    ):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + _struct.pack(">H", 2 + len(body)) + body

    def sos_header(comp_ids: list[int], ss: int, se: int,
                   ah: int, al: int) -> bytes:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + _struct.pack(">H", 2 + len(sos)) + sos

    def mcu_units():
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, (h, v) in enumerate(samps):
                for by in range(v):
                    for bx in range(h):
                        yield mcu, ci, my * v + by, mx * h + bx

    if not progressive:
        if restart_interval:
            out += b"\xff\xdd" + _struct.pack(">HH", 4, restart_interval)
        out += sos_header(list(range(nf)), 0, 63, 0, 0)
        w = _JpegBitWriter()
        preds = [0] * nf
        rst = 0
        last_mcu = -1
        for mcu, ci, by, bx in mcu_units():
            if (restart_interval and mcu != last_mcu and mcu
                    and mcu % restart_interval == 0):
                w.flush()
                out += w.out
                w = _JpegBitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * nf
            last_mcu = mcu
            zz = comp_coefs[ci][by][bx]
            preds[ci] = _jpeg_encode_block(
                w, zz, preds[ci],
                dc_l if ci == 0 else dc_c, ac_l if ci == 0 else ac_c)
        w.flush()
        out += w.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # ---- progressive scan script ----
    def comp_grid(ci):
        h, v = samps[ci]
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        return -(-ch // 8), -(-cw // 8)

    # 1. DC first pass (Al=1), all components interleaved
    out += sos_header(list(range(nf)), 0, 0, 0, 1)
    w = _JpegBitWriter()
    preds = [0] * nf
    for _, ci, by, bx in mcu_units():
        dc_codes = dc_l if ci == 0 else dc_c
        diff = (comp_coefs[ci][by][bx][0] >> 1) - preds[ci]
        preds[ci] += diff
        s, bits_v = _jpeg_magnitude(diff)
        code, ln = dc_codes[s]
        w.put(code, ln)
        if s:
            w.put(bits_v, s)
    w.flush()
    out += w.out
    # 2. AC first passes (Al=1), per component, two spectral bands
    for ci in range(nf):
        rows, cols = comp_grid(ci)
        for ss, se in ((1, 5), (6, 63)):
            out += sos_header([ci], ss, se, 0, 1)
            w = _JpegBitWriter()
            state = _AcProgState(w, ac_l if ci == 0 else ac_c)
            for u in range(rows * cols):
                _enc_ac_first(state, comp_coefs[ci][u // cols][u % cols],
                              ss, se, 1)
            state.flush()
            w.flush()
            out += w.out
    # 3. DC refinement (Ah=1, Al=0): one raw bit per data unit
    out += sos_header(list(range(nf)), 0, 0, 1, 0)
    w = _JpegBitWriter()
    for _, ci, by, bx in mcu_units():
        w.put(comp_coefs[ci][by][bx][0] & 1, 1)
    w.flush()
    out += w.out
    # 4. AC refinements (Ah=1, Al=0), per component, same bands
    for ci in range(nf):
        rows, cols = comp_grid(ci)
        for ss, se in ((1, 5), (6, 63)):
            out += sos_header([ci], ss, se, 1, 0)
            w = _JpegBitWriter()
            state = _AcProgState(w, ac_l if ci == 0 else ac_c)
            for u in range(rows * cols):
                _enc_ac_refine(state, comp_coefs[ci][u // cols][u % cols],
                               ss, se, 0)
            state.flush()
            w.flush()
            out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _VP8LBitWriter:
    """LSB-first bit packer; Huffman codes go in MSB-first (deflate
    convention, mirroring the decoder's read order)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v: int, k: int) -> None:
        self.acc |= v << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _pm_lengths(freqs: list[tuple[int, int]], max_len: int) -> dict[int, int]:
    """Length-limited Huffman code lengths via package-merge.
    ``freqs``: (symbol, count>0) with >= 2 entries."""
    pkgs = None
    solution: dict[int, int] = {s: 0 for s, _ in freqs}
    for _ in range(max_len - 1):
        level = [(c, (s,)) for s, c in freqs]
        if pkgs:
            level += pkgs
        level.sort(key=lambda e: e[0])
        merged = []
        for i in range(0, len(level) - 1, 2):
            a, b = level[i], level[i + 1]
            merged.append((a[0] + b[0], a[1] + b[1]))
        pkgs = merged
    # take the 2(n-1) cheapest items across all levels: package-merge's
    # standard accounting — each symbol's selection count is its length
    level = [(c, (s,)) for s, c in freqs]
    if pkgs:
        level += pkgs
    level.sort(key=lambda e: e[0])
    for _, syms in level[: 2 * (len(freqs) - 1)]:
        for s in syms:
            solution[s] += 1
    return solution


def _vp8l_canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (symbol order within each length)."""
    used = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    codes: dict[int, tuple[int, int]] = {}
    code, prev = 0, used[0][0]
    for ln, s in used:
        code <<= ln - prev
        prev = ln
        codes[s] = (code, ln)
        code += 1
    return codes


def _vp8l_emit_code(w: _VP8LBitWriter, hist: dict[int, int],
                    alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Write one Huffman code header (simple or normal variant) for the
    given symbol histogram; returns symbol → (code, length)."""
    syms = sorted(s for s, c in hist.items() if c > 0)
    if len(syms) <= 2 and syms[-1] <= 255:  # simple codes carry 8-bit symbols
        w.put(1, 1)  # simple
        w.put(len(syms) - 1, 1)
        w.put(1, 1)  # first symbol in 8 bits
        w.put(syms[0], 8)
        if len(syms) == 2:
            w.put(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    lengths = _pm_lengths([(s, hist[s]) for s in syms], 15)
    codes = _vp8l_canonical(lengths)
    # token stream: one literal code length per symbol up to the last used
    last = max(syms)
    tokens = [lengths.get(s, 0) for s in range(last + 1)]
    tok_hist: dict[int, int] = {}
    for t in tokens:
        tok_hist[t] = tok_hist.get(t, 0) + 1
    tok_syms = sorted(tok_hist)
    if len(tok_syms) == 1:
        tok_lengths = {tok_syms[0]: 1}
        tok_codes = {tok_syms[0]: (0, 0)}
    else:
        tok_lengths = _pm_lengths([(t, tok_hist[t]) for t in tok_syms], 7)
        tok_codes = _vp8l_canonical(tok_lengths)
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    need = max(4, 1 + max(order.index(t) for t in tok_syms))
    w.put(0, 1)  # normal variant
    w.put(need - 4, 4)
    for i in range(need):
        w.put(tok_lengths.get(order[i], 0), 3)
    # bounded token count: exactly len(tokens) literal tokens follow
    w.put(1, 1)
    value = len(tokens) - 2
    nbits_sel = 0
    while (2 + 2 * nbits_sel) < max(1, value.bit_length()):
        nbits_sel += 1
    w.put(nbits_sel, 3)
    w.put(value, 2 + 2 * nbits_sel)
    for t in tokens:
        w.put_code(*tok_codes[t])
    return codes


def _vp8l_sub_px(a: int, b: int) -> int:
    """Per-channel modular subtract of packed ARGB pixels."""
    return (((((a >> 24) - (b >> 24)) & 0xFF) << 24)
            | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
            | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
            | (((a & 0xFF) - (b & 0xFF)) & 0xFF))


def _vp8l_add_px(a: int, b: int) -> int:
    return (((((a >> 24) + (b >> 24)) & 0xFF) << 24)
            | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
            | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
            | (((a & 0xFF) + (b & 0xFF)) & 0xFF))


def _vp8l_predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    """The 14 spatial predictors (independent re-derivation from the
    spec; the decoder carries its own copy)."""
    def ch(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)

    def pk(c):
        return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]

    def avg2(a, b):
        return pk(tuple((x + y) >> 1 for x, y in zip(ch(a), ch(b))))

    def clamp(v):
        return 0 if v < 0 else 255 if v > 255 else v

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return avg2(avg2(l, tr), t)
    if mode == 6:
        return avg2(l, tl)
    if mode == 7:
        return avg2(l, t)
    if mode == 8:
        return avg2(tl, t)
    if mode == 9:
        return avg2(t, tr)
    if mode == 10:
        return avg2(avg2(l, tl), avg2(t, tr))
    if mode == 11:
        lc, tc, cc = ch(l), ch(t), ch(tl)
        est = [lc[i] + tc[i] - cc[i] for i in range(4)]
        p_l = sum(abs(est[i] - lc[i]) for i in range(4))
        p_t = sum(abs(est[i] - tc[i]) for i in range(4))
        return l if p_l < p_t else t
    if mode == 12:
        lc, tc, cc = ch(l), ch(t), ch(tl)
        return pk(tuple(clamp(lc[i] + tc[i] - cc[i]) for i in range(4)))
    # mode 13
    ac, cc = ch(avg2(l, t)), ch(tl)
    out = []
    for i in range(4):
        d = ac[i] - cc[i]
        half = d // 2 if d >= 0 else -((-d) // 2)
        out.append(clamp(ac[i] + half))
    return pk(tuple(out))


def _vp8l_ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _vp8l_value_to_prefix(v: int) -> tuple[int, int, int]:
    """Inverse of the LZ77 prefix coding: value → (symbol, extra_bits
    payload, extra_bits count)."""
    if v <= 4:
        return v - 1, 0, 0
    extra = (v - 1).bit_length() - 2
    rem = v - 1 - (2 << extra)
    sym = 2 + 2 * extra + (rem >> extra)
    return sym, rem & ((1 << extra) - 1), extra


def _vp8l_entropy(w: _VP8LBitWriter, pixels: list[int], *,
                  level0: bool, cache_bits: int = 0,
                  lz_runs: bool = False) -> None:
    """Emit one entropy-coded (sub-)image: color-cache header, meta bit
    (top level), the five Huffman codes and the token stream. LZ77 run
    coding (dist=1 repeats, length >= 4) and color-cache references are
    optional so corpora exercise those decoder paths."""
    if cache_bits:
        w.put(1, 1)
        w.put(cache_bits, 4)
    else:
        w.put(0, 1)
    if level0:
        w.put(0, 1)  # no meta-huffman
    # tokenize
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    tokens: list[tuple] = []
    n = len(pixels)
    i = 0
    while i < n:
        px = pixels[i]
        if lz_runs and i > 0 and px == pixels[i - 1]:
            run = 1
            while (i + run < n and run < 4096
                   and pixels[i + run] == pixels[i - 1]):
                run += 1
            if run >= 4:
                sym, extra_v, extra_n = _vp8l_value_to_prefix(run)
                tokens.append(("len", 256 + sym, extra_v, extra_n))
                if cache is not None:
                    for j in range(i, i + run):
                        key = ((0x1E35A7BD * pixels[j]) & 0xFFFFFFFF) >> shift
                        cache[key] = pixels[j]
                i += run
                continue
        if cache is not None:
            key = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift
            if cache[key] == px:
                tokens.append(("cache", 280 + key))
                i += 1
                continue
            cache[key] = px
        tokens.append(("lit", px))
        i += 1

    def hist(vals):
        h: dict[int, int] = {}
        for v in vals:
            h[v] = h.get(v, 0) + 1
        return h

    g_hist: dict[int, int] = {}
    r_vals, b_vals, a_vals = [], [], []
    used_dist = False
    for tok in tokens:
        if tok[0] == "lit":
            px = tok[1]
            g_hist[(px >> 8) & 0xFF] = g_hist.get((px >> 8) & 0xFF, 0) + 1
            r_vals.append((px >> 16) & 0xFF)
            b_vals.append(px & 0xFF)
            a_vals.append((px >> 24) & 0xFF)
        else:
            g_hist[tok[1]] = g_hist.get(tok[1], 0) + 1
            if tok[0] == "len":
                used_dist = True
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    g_codes = _vp8l_emit_code(w, g_hist, green_alpha)
    r_codes = _vp8l_emit_code(w, hist(r_vals) or {0: 1}, 256)
    b_codes = _vp8l_emit_code(w, hist(b_vals) or {0: 1}, 256)
    a_codes = _vp8l_emit_code(w, hist(a_vals) or {0: 1}, 256)
    # distance: dist=1 is plane code 2 ((dx,dy)=(1,0)) → prefix symbol 1
    d_codes = _vp8l_emit_code(w, {1: 1} if used_dist else {0: 1}, 40)
    for tok in tokens:
        if tok[0] == "lit":
            px = tok[1]
            w.put_code(*g_codes[(px >> 8) & 0xFF])
            w.put_code(*r_codes[(px >> 16) & 0xFF])
            w.put_code(*b_codes[px & 0xFF])
            w.put_code(*a_codes[(px >> 24) & 0xFF])
        elif tok[0] == "len":
            _, sym, extra_v, extra_n = tok
            w.put_code(*g_codes[sym])
            if extra_n:
                w.put(extra_v, extra_n)
            w.put_code(*d_codes[1])  # plane code 2 → distance 1
        else:
            w.put_code(*g_codes[tok[1]])


def pixels_to_webp(rgb_rows: list[bytes], width: int, height: int, *,
                   subtract_green: bool = False, predictor: int | None = None,
                   color_deltas: tuple[int, int, int] | None = None,
                   palette: bool = False, cache_bits: int = 0,
                   lz_runs: bool = False) -> bytes:
    """Lossless WebP (VP8L) writer. Forward transforms (announced in
    stream order, applied forward in that order — the decoder inverts in
    reverse): optional predictor (one whole-image tile of the given
    mode), cross-color (one tile of fixed deltas), subtract-green, or
    color-indexing with pixel bundling (``palette=True``, exclusive of
    the others). Entropy options: color cache and dist-1 LZ77 runs.
    Independent of stages/webp_codec.py — the two sides of the
    round-trip oracle, like the other raster writers here."""
    w = _VP8LBitWriter()
    w.put(0x2F, 8)  # VP8L signature
    w.put(width - 1, 14)
    w.put(height - 1, 14)
    w.put(0, 1)  # alpha hint
    w.put(0, 3)  # version
    rgb = b"".join(rgb_rows)
    n = width * height
    pixels = [(0xFF << 24) | (rgb[3 * i] << 16) | (rgb[3 * i + 1] << 8)
              | rgb[3 * i + 2] for i in range(n)]
    img_w = width

    if palette:
        order: dict[int, int] = {}
        for px in pixels:
            if px not in order:
                order[px] = len(order)
        colors = list(order)
        psize = len(colors)
        if psize > 16:
            raise ValueError("palette mode requires <= 16 colors")
        width_bits = 3 if psize <= 2 else 2 if psize <= 4 else 1
        per = 1 << width_bits
        bpp = 8 >> width_bits
        w.put(1, 1)
        w.put(3, 2)  # color-indexing transform
        w.put(psize - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_vp8l_sub_px(c, prev))
            prev = c
        _vp8l_entropy(w, deltas, level0=False)
        packed_w = (width + per - 1) >> width_bits
        packed = []
        for y in range(height):
            for bx in range(packed_w):
                byte = 0
                for k in range(per):
                    x = (bx << width_bits) + k
                    if x < width:
                        byte |= order[pixels[y * width + x]] << (k * bpp)
                packed.append(0xFF000000 | (byte << 8))
        pixels = packed
        img_w = packed_w
    else:
        if predictor is not None:
            size_bits = 9  # one 512px tile covers the whole image
            w.put(1, 1)
            w.put(0, 2)  # predictor transform
            w.put(size_bits - 2, 3)
            _vp8l_entropy(w, [0xFF000000 | (predictor << 8)],
                          level0=False)
            res = [0] * n
            for pos in range(n):
                x, y = pos % width, pos // width
                if pos == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pixels[pos - 1]
                elif x == 0:
                    pred = pixels[pos - width]
                else:
                    pred = _vp8l_predict(
                        predictor, pixels[pos - 1], pixels[pos - width],
                        pixels[pos - width - 1], pixels[pos - width + 1])
                res[pos] = _vp8l_sub_px(pixels[pos], pred)
            pixels = res
        if color_deltas is not None:
            g2r, g2b, r2b = color_deltas
            size_bits = 9
            w.put(1, 1)
            w.put(1, 2)  # cross-color transform
            w.put(size_bits - 2, 3)
            te = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
            _vp8l_entropy(w, [te], level0=False)
            out = []
            for px in pixels:
                a = (px >> 24) & 0xFF
                r = (px >> 16) & 0xFF
                g = (px >> 8) & 0xFF
                b = px & 0xFF
                nr = (r - _vp8l_ct_delta(g2r, g)) & 0xFF
                nb = (b - _vp8l_ct_delta(g2b, g) - _vp8l_ct_delta(r2b, r)) \
                    & 0xFF
                out.append((a << 24) | (nr << 16) | (g << 8) | nb)
            pixels = out
        if subtract_green:
            w.put(1, 1)
            w.put(2, 2)  # subtract-green transform
            out = []
            for px in pixels:
                g = (px >> 8) & 0xFF
                r = (((px >> 16) & 0xFF) - g) & 0xFF
                b = ((px & 0xFF) - g) & 0xFF
                out.append((px & 0xFF00FF00) | (r << 16) | b)
            pixels = out
    w.put(0, 1)  # end of transforms
    _vp8l_entropy(w, pixels, level0=True,
                  cache_bits=cache_bits, lz_runs=lz_runs)
    payload = w.flush()
    chunk = b"VP8L" + _struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def pcm_to_wav(samples: "np.ndarray", rate: int, bits: int = 16,
               channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer (PCM, 8-bit unsigned or 16-bit signed,
    channels duplicated from the mono input) — independent of
    stages/audio_codec."""
    if channels > 1:
        samples = np.repeat(samples, channels)
    if bits == 16:
        pcm = samples.astype("<i2").tobytes()
    else:
        pcm = ((samples.astype(np.int32) >> 8) + 128) \
            .astype(np.uint8).tobytes()
    ba = channels * bits // 8
    fmt = _struct.pack("<HHIIHH", 1, channels, rate, rate * ba, ba, bits)
    chunks = (b"fmt " + _struct.pack("<I", len(fmt)) + fmt
              + b"data" + _struct.pack("<I", len(pcm)) + pcm
              + (b"\x00" if len(pcm) & 1 else b""))
    return b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _plan_voice_signal(
    rng: random.Random, rate: int, frame_ms: int = 20,
) -> tuple["np.ndarray", list[tuple[int, int]], int]:
    """Amplitude-PLANNED voice/silence signal → (mono int16 samples,
    expected VAD segments [(start_ms, end_ms)], duration_ms). The runs
    use amplitudes cleanly above/below the VAD peak threshold (and
    multiples of 256 so the 8-bit WAV byte round trip is exact); the
    expected segments derive from the PLAN, never from the detector —
    the independent round trip."""
    import numpy as np

    spf = rate * frame_ms // 1000
    runs: list[tuple[bool, int]] = []
    voice = rng.random() < 0.5
    for _ in range(rng.randint(2, 8)):
        runs.append((voice, rng.randint(1, 8)))
        voice = not voice
    parts = []
    for is_voice, n_frames in runs:
        amp = (rng.choice([2560, 8192, 16384]) if is_voice
               else rng.choice([0, 256, 1024]))
        seg = np.full(n_frames * spf, amp, np.int16)
        seg[1::2] = -amp  # square wave: frame peak == amp exactly
        parts.append(seg)
    samples = np.concatenate(parts)
    if runs[-1][1] > 1 and rng.random() < 0.4:
        samples = samples[: len(samples) - rng.randint(1, spf - 1)]
    n = len(samples)
    duration_ms = n * 1000 // rate
    n_frames_total = (n + spf - 1) // spf
    segs: list[tuple[int, int]] = []
    f0 = 0
    for is_voice, n_fr in runs:
        f1 = min(f0 + n_fr, n_frames_total)
        if is_voice and f1 > f0:
            segs.append((f0 * frame_ms,
                         min(f1 * frame_ms, duration_ms)))
        f0 = f1
        if f0 >= n_frames_total:
            break
    return samples, segs, duration_ms


def build_audio_doc(
    rng: random.Random, doc_id: str,
) -> tuple[str, list[Span], str]:
    """One WAV audio document → (base64 payload, expected spans, status).
    Signal + expected segments come from :func:`_plan_voice_signal`
    (the plan, never the detector)."""
    rate = rng.choice([8000, 16000])
    samples, segs, duration_ms = _plan_voice_signal(rng, rate)
    n = len(samples)

    from docling_ray.functions.hashing import stable_hash64

    fp = stable_hash64(samples.astype("<i2").tobytes()) \
        & 0xFFFFFFFFFFFFFFFF
    ref = f"wavpcm://{rate}/{n}/{fp:016x}"
    exp: list[Span] = [("audio_meta", f"{rate}hz {duration_ms}ms", ref)]
    exp.extend(("audio_segment", f"{s}-{e}", ref) for s, e in segs)
    bits = 8 if rng.random() < 0.3 else 16
    channels = 2 if rng.random() < 0.3 else 1
    data = pcm_to_wav(samples, rate, bits=bits, channels=channels)
    return (base64.b64encode(data).decode("ascii"), exp,
            S.STATUS_SUCCESS)


def _mp4_box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return (_struct.pack(">I", 1) + btype
                + _struct.pack(">Q", 16 + len(body)) + body)
    return _struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_audio_trak(n_frames: int, rate: int, fmt: str, channels: int,
                    chunk_counts: list[int], offsets: list[int],
                    stsz_table: bool) -> bytes:
    """Sound trak with full sample tables for a raw-PCM track
    (SoundSampleEntry 'twos'/'sowt'). One stsc run per chunk; stsz
    either the constant-size fast path or an explicit table."""
    frame_sz = 2 * channels
    tkhd = b"\x00" * 76 + _struct.pack(">II", 0, 0)
    mdhd = (b"\x00" * 12 + _struct.pack(">II", rate, n_frames)
            + b"\x00" * 4)
    hdlr = b"\x00" * 8 + b"soun" + b"\x00" * 12 + b"\x00"
    entry = (_struct.pack(">I", 36) + fmt.encode("ascii")
             + b"\x00" * 6 + _struct.pack(">H", 1)
             + b"\x00" * 8  # version/revision/vendor
             + _struct.pack(">HHHH", channels, 16, 0, 0)
             + _struct.pack(">I", rate << 16))
    stsd = _mp4_box(b"stsd", b"\x00" * 4 + _struct.pack(">I", 1) + entry)
    stts = _mp4_box(b"stts", b"\x00" * 4
                    + _struct.pack(">III", 1, n_frames, 1))
    stsc = _mp4_box(b"stsc", b"\x00" * 4
                    + _struct.pack(">I", len(chunk_counts))
                    + b"".join(_struct.pack(">III", i + 1, c, 1)
                               for i, c in enumerate(chunk_counts)))
    if stsz_table:
        stsz = _mp4_box(b"stsz", b"\x00" * 4
                        + _struct.pack(">II", 0, n_frames)
                        + _struct.pack(">I", frame_sz) * n_frames)
    else:
        stsz = _mp4_box(b"stsz", b"\x00" * 4
                        + _struct.pack(">II", frame_sz, n_frames))
    stco = _mp4_box(b"stco", b"\x00" * 4
                    + _struct.pack(">I", len(offsets))
                    + b"".join(_struct.pack(">I", o) for o in offsets))
    stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
    smhd = _mp4_box(b"smhd", b"\x00" * 8)
    minf = _mp4_box(b"minf", smhd + stbl)
    mdia = _mp4_box(b"mdia", _mp4_box(b"mdhd", mdhd)
                    + _mp4_box(b"hdlr", hdlr) + minf)
    return _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd) + mdia)


def duration_to_mp4(duration_ms: int, width: int, height: int,
                    mvhd_v1: bool = False,
                    largesize_moov: bool = False,
                    audio: tuple | None = None) -> bytes:
    """Minimal ISO BMFF writer: ftyp + moov{mvhd, trak{tkhd}} + mdat —
    enough structure for the container walk (independent of
    stages/video_codec). ``mvhd_v1`` writes the 64-bit-duration layout;
    ``largesize_moov`` exercises the size==1 largesize path. ``audio``
    = (mono int16 samples, rate, fmt 'twos'/'sowt', channels,
    n_chunks, stsz_table) adds a raw-PCM sound trak whose sample data
    lives in the mdat (absolute stco offsets resolved in a second
    pass — box sizes don't depend on the offset values)."""
    timescale = 1000
    if mvhd_v1:
        mvhd = (b"\x01" + b"\x00" * 3 + b"\x00" * 16
                + _struct.pack(">IQ", timescale, duration_ms)
                + b"\x00" * 80)
    else:
        mvhd = (b"\x00" * 12
                + _struct.pack(">II", timescale, duration_ms)
                + b"\x00" * 80)
    tkhd = (b"\x00" * 76
            + _struct.pack(">II", width << 16, height << 16))
    trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd))
    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    if audio is None:
        moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + trak,
                        largesize=largesize_moov)
        return ftyp + moov + _mp4_box(b"mdat", b"")
    samples, rate, fmt, channels, n_chunks, stsz_table = audio
    inter = (np.repeat(samples, channels) if channels > 1 else samples)
    pcm = inter.astype(">i2" if fmt == "twos" else "<i2").tobytes()
    n_frames = len(samples)
    frame_sz = 2 * channels
    n_chunks = max(1, min(n_chunks, n_frames))
    base = n_frames // n_chunks
    chunk_counts = [base + (1 if i < n_frames % n_chunks else 0)
                    for i in range(n_chunks)]

    def build(offsets: list[int]) -> bytes:
        atrak = _mp4_audio_trak(n_frames, rate, fmt, channels,
                                chunk_counts, offsets, stsz_table)
        return _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + trak + atrak,
                        largesize=largesize_moov)

    moov0 = build([0] * n_chunks)
    mdat_off = len(ftyp) + len(moov0) + 8
    offs, acc = [], 0
    for c in chunk_counts:
        offs.append(mdat_off + acc)
        acc += c * frame_sz
    return ftyp + build(offs) + _mp4_box(b"mdat", pcm)


def build_video_doc(
    rng: random.Random, doc_id: str,
) -> tuple[str, list[Span], str]:
    """One MP4 video document → (base64 payload, expected spans,
    status). The expected keyframe schedule is re-derived HERE from the
    chosen duration (uniform interval with a frame cap — the
    video_frame_sampling strategy), never by calling the extractor."""
    duration_ms = rng.randint(1_000, 900_000)
    w = rng.choice([320, 640, 1280, 1920])
    h = rng.choice([240, 480, 720, 1080])
    # half the videos carry a raw-PCM audio track (twos/sowt) demuxed
    # into the same VAD path as WAV docs; expected segments come from
    # the amplitude plan, the fingerprint from the planned samples
    audio = None
    audio_exp: list[Span] = []
    if rng.random() < 0.5:
        rate = rng.choice([8000, 16000])
        samples, segs, a_dur = _plan_voice_signal(rng, rate)
        fmt = rng.choice(["twos", "sowt"])
        channels = 2 if rng.random() < 0.3 else 1
        audio = (samples, rate, fmt, channels, rng.randint(1, 3),
                 rng.random() < 0.3)
        from docling_ray.functions.hashing import stable_hash64

        fp = stable_hash64(samples.astype("<i2").tobytes()) \
            & 0xFFFFFFFFFFFFFFFF
        aref = f"mp4pcm://{rate}/{len(samples)}/{fp:016x}"
        audio_exp.append(("audio_meta", f"{rate}hz {a_dur}ms", aref))
        audio_exp.extend(("audio_segment", f"{s}-{e}", aref)
                         for s, e in segs)
    data = duration_to_mp4(duration_ms, w, h,
                           mvhd_v1=rng.random() < 0.4,
                           largesize_moov=rng.random() < 0.25,
                           audio=audio)
    ref = f"mp4://{duration_ms}/{w}x{h}"
    exp: list[Span] = [("video_meta", f"{duration_ms}ms {w}x{h}", ref)]
    # uniform keyframe schedule, cap 64 (hand-derived, one formula)
    interval = 5_000
    n = duration_ms // interval + 1
    if n > 64:
        interval = duration_ms // 63
        n = 64
    for i in range(int(n)):
        exp.append(("video_frame", str(min(i * interval, duration_ms)),
                    ref))
    exp.extend(audio_exp)
    return (base64.b64encode(data).decode("ascii"), exp,
            S.STATUS_SUCCESS)


def build_image_doc(
    rng: random.Random, doc_id: str,
) -> tuple[str, list[Span], str]:
    """One raster-image document → (base64 payload, expected spans, status).
    Pixels come from the seeded byte stream (stable across versions), so
    the expected fingerprint is computable without the decoder."""
    w = rng.randrange(8, 49)
    h = rng.randrange(8, 41)
    variant = rng.randrange(17)
    from docling_ray.functions.refs import image_media_ref

    if variant == 4 and rng.random() < 0.5:  # paletted BMP
        # 8-bit (plain / RLE8), 4-bit (plain / RLE4) or 1-bit rows
        bpp = rng.choice([8, 8, 4, 1])
        n_colors = 2 if bpp == 1 else rng.randrange(2, 17)
        palette = rng.randbytes(3 * n_colors)
        idx_rows = [bytes(rng.randrange(n_colors) for _ in range(w))
                    for _ in range(h)]
        if bpp == 8:
            data = pixels_to_bmp8(idx_rows, w, h, palette,
                                  rle=rng.random() < 0.5)
        else:
            data = pixels_to_bmp_lowbpp(idx_rows, w, h, palette, bpp,
                                        rle4=(bpp == 4
                                              and rng.random() < 0.5))
        rgb = b"".join(
            bytes(v for i in row for v in palette[3 * i: 3 * i + 3])
            for row in idx_rows)
        ref = image_media_ref(w, h, "P", rgb)
    elif variant == 0 or variant == 4:  # RGB png / bmp
        rgb_rows = [rng.randbytes(3 * w) for _ in range(h)]
        rgb = b"".join(rgb_rows)
        if variant == 0:
            data = pixels_to_png(rgb_rows, w, h, color_type=2,
                                 interlace=rng.random() < 0.3)
        else:
            data = pixels_to_bmp(rgb_rows, w, h)
        ref = image_media_ref(w, h, "RGB", rgb)
    elif variant == 1:  # grayscale png
        g_rows = [rng.randbytes(w) for _ in range(h)]
        rgb = b"".join(bytes(v for b_ in row for v in (b_, b_, b_))
                       for row in g_rows)
        data = pixels_to_png(g_rows, w, h, color_type=0,
                             interlace=rng.random() < 0.3)
        ref = image_media_ref(w, h, "L", rgb)
    elif variant == 2:  # palette png (8-bit indices)
        n_colors = rng.randrange(2, 17)
        palette = rng.randbytes(3 * n_colors)
        idx_rows = [bytes(rng.randrange(n_colors) for _ in range(w))
                    for _ in range(h)]
        rgb = b"".join(
            bytes(v for i in row for v in palette[3 * i: 3 * i + 3])
            for row in idx_rows)
        data = pixels_to_png(idx_rows, w, h, color_type=3, palette=palette,
                             interlace=rng.random() < 0.3)
        ref = image_media_ref(w, h, "P", rgb)
    elif variant == 3:  # RGBA png (alpha dropped on RGB conversion)
        rgba_rows = [rng.randbytes(4 * w) for _ in range(h)]
        rgb = b"".join(bytes(v for x in range(w)
                             for v in row[4 * x: 4 * x + 3])
                       for row in rgba_rows)
        data = pixels_to_png(rgba_rows, w, h, color_type=6,
                             interlace=rng.random() < 0.3)
        ref = image_media_ref(w, h, "RGBA", rgb)
    elif variant == 5:  # binary PPM
        rgb_rows = [rng.randbytes(3 * w) for _ in range(h)]
        rgb = b"".join(rgb_rows)
        data = pixels_to_pnm(rgb_rows, w, h, gray=False)
        ref = image_media_ref(w, h, "RGB", rgb)
    elif variant == 6:  # binary PGM
        g_rows = [rng.randbytes(w) for _ in range(h)]
        rgb = b"".join(bytes(v for b_ in row for v in (b_, b_, b_))
                       for row in g_rows)
        data = pixels_to_pnm(g_rows, w, h, gray=True)
        ref = image_media_ref(w, h, "L", rgb)
    elif variant in (7, 8):  # TIFF: multi-page RGB (plain or PackBits)
        n_pages = rng.randrange(1, 4)
        frames = [[rng.randbytes(3 * w) for _ in range(h)]
                  for _ in range(n_pages)]
        if variant == 8:
            data = pixels_to_tiff(frames, w, h, gray=False, packbits=True)
        elif rng.random() < 0.35:  # tiled layout (16x16, plain or LZW
            # + per-tile predictor)
            lzw = rng.random() < 0.5
            data = pixels_to_tiff(frames, w, h, gray=False, tiled=True,
                                  lzw=lzw,
                                  predictor=lzw and rng.random() < 0.5)
        elif rng.random() < 0.5:  # LZW strips, half with predictor 2
            data = pixels_to_tiff(frames, w, h, gray=False, lzw=True,
                                  predictor=rng.random() < 0.5)
        else:
            data = pixels_to_tiff(frames, w, h, gray=False)
        refs = [image_media_ref(w, h, "RGB", b"".join(rows))
                for rows in frames]
        b64 = base64.b64encode(data).decode("ascii")
        return (b64, [("picture", "", r) for r in refs],
                S.STATUS_SUCCESS)
    elif variant == 10:  # baseline JPEG, grayscale constant 8x8 tiles
        # identity quantization + constant tiles → DC-only blocks →
        # bit-exact reconstruction (the hand-computable expectation)
        import numpy as np

        tiles = np.frombuffer(
            rng.randbytes(((h + 7) // 8) * ((w + 7) // 8)), np.uint8
        ).reshape((h + 7) // 8, (w + 7) // 8)
        img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)[:h, :w]
        rows = [img[r].tobytes() for r in range(h)]
        data = pixels_to_jpeg(rows, w, h, gray=True,
                              restart_interval=rng.choice([0, 0, 2]),
                              progressive=rng.random() < 0.35)
        rgb = np.stack([img] * 3, axis=-1).tobytes()
        ref = image_media_ref(w, h, "L", rgb)
    elif variant == 11:  # baseline JPEG, color constant tiles (444/420)
        import numpy as np

        from docling_ray.functions.colorspace import (rgb_to_ycbcr,
                                                      ycbcr_to_rgb)

        sub = rng.choice(["444", "420"])
        t = 8 if sub == "444" else 16  # constant per MCU, any dims
        tiles = np.frombuffer(
            rng.randbytes(3 * ((h + t - 1) // t) * ((w + t - 1) // t)),
            np.uint8,
        ).reshape((h + t - 1) // t, (w + t - 1) // t, 3)
        img = np.repeat(np.repeat(tiles, t, axis=0), t, axis=1)[:h, :w]
        rows = [img[r].tobytes() for r in range(h)]
        data = pixels_to_jpeg(rows, w, h, gray=False, subsample=sub,
                              progressive=rng.random() < 0.35)
        # decoder reconstructs the YCbCr planes exactly; the only loss is
        # the shared (pinned) color conversion round trip
        expected = ycbcr_to_rgb(rgb_to_ycbcr(img))
        ref = image_media_ref(w, h, "RGB", expected.tobytes())
    elif variant == 12:  # WebP lossless (VP8L), random transform config
        cfg = rng.randrange(6)
        if cfg >= 4:  # paletted / run-heavy content (lz + cache paths)
            n_colors = rng.randrange(2, 17)
            pal = [rng.randbytes(3) for _ in range(n_colors)]
            rows = []
            for _ in range(h):
                row = bytearray()
                x = 0
                while x < w:
                    run = min(rng.randrange(1, 10), w - x)
                    row += pal[rng.randrange(n_colors)] * run
                    x += run
                rows.append(bytes(row))
            if cfg == 4:
                data = pixels_to_webp(rows, w, h, palette=True)
            else:
                data = pixels_to_webp(rows, w, h, lz_runs=True,
                                      cache_bits=rng.randrange(1, 9))
        else:
            rows = [rng.randbytes(3 * w) for _ in range(h)]
            if cfg == 0:
                data = pixels_to_webp(rows, w, h)
            elif cfg == 1:
                data = pixels_to_webp(rows, w, h, subtract_green=True)
            elif cfg == 2:
                data = pixels_to_webp(rows, w, h,
                                      predictor=rng.randrange(14))
            else:
                data = pixels_to_webp(
                    rows, w, h,
                    color_deltas=(rng.randrange(256), rng.randrange(256),
                                  rng.randrange(256)))
        rgb = b"".join(rows)
        ref = image_media_ref(w, h, "RGB", rgb)
    elif variant == 13:  # WebP lossy (VP8 keyframe)
        data, exp = vp8_lossy_webp(rng, w, h)
        ref = image_media_ref(w, h, "RGB", exp.tobytes())
    elif variant == 15:  # bilevel PBM (P1/P4) or raw packed TIFF
        import numpy as np

        bits = (np.frombuffer(rng.randbytes(w * h), np.uint8)
                .reshape(h, w) & 1).astype(np.uint8)
        which = rng.randrange(3)
        if which == 2:
            data = bilevel_to_tiff([bits], w, h, compression="none")
        else:
            data = bits_to_pbm(bits, ascii_=(which == 1))
        rgb = np.repeat(((1 - bits) * 255).astype(np.uint8)[:, :, None],
                        3, axis=2).tobytes()
        ref = image_media_ref(w, h, "1", rgb)
    elif variant == 14:  # CCITT fax TIFF (Group 4 MMR or MH RLE)
        # run-structured bilevel pages (the fax-natural content shape);
        # the expected RGB is hand-computed from the same bit matrix
        import numpy as np

        n_pages = rng.randrange(1, 4)
        frames_bits = []
        for _ in range(n_pages):
            bits = np.zeros((h, w), np.uint8)
            for r in range(h):
                x = 0
                c = rng.randrange(2)
                while x < w:
                    run = min(rng.randrange(1, w + 1), w - x)
                    bits[r, x: x + run] = c
                    x += run
                    c ^= 1
            frames_bits.append(bits)
        if rng.random() < 0.35:  # Group 3 (compression 3, T4Options)
            data = bilevel_to_tiff(frames_bits, w, h,
                                   compression="g3",
                                   g3_2d=rng.random() < 0.5,
                                   g3_align=rng.random() < 0.3)
        else:
            data = bilevel_to_tiff(frames_bits, w, h,
                                   g4=rng.random() < 0.6)
        refs = [image_media_ref(
            w, h, "1",
            np.repeat(((1 - bb) * 255).astype(np.uint8)[:, :, None],
                      3, axis=2).tobytes())
            for bb in frames_bits]
        b64 = base64.b64encode(data).decode("ascii")
        return (b64, [("picture", "", r) for r in refs],
                S.STATUS_SUCCESS)
    elif variant == 16:  # ICO: embedded PNG, DIB24+AND mask, or DIB32
        which = rng.randrange(3)
        rgb_rows = [rng.randbytes(3 * w) for _ in range(h)]
        if which == 0:  # PNG payload
            data = pixels_to_ico(rgb_rows, w, h, png=True)
            ref = image_media_ref(w, h, "RGB", b"".join(rgb_rows))
        elif which == 1:  # classic DIB24, AND-masked pixels go black
            mask_rows = [bytes(int(rng.random() < 0.2) for _ in range(w))
                         for _ in range(h)]
            data = pixels_to_ico(rgb_rows, w, h, mask_rows=mask_rows)
            exp = bytearray()
            for y in range(h):
                for x in range(w):
                    exp += b"\x00\x00\x00" if mask_rows[y][x] \
                        else rgb_rows[y][3 * x: 3 * x + 3]
            ref = image_media_ref(w, h, "RGB", bytes(exp))
        else:  # DIB32: alpha authoritative (dropped on RGB conversion)
            alpha_rows = [rng.randbytes(w) for _ in range(h)]
            data = pixels_to_ico(rgb_rows, w, h, alpha_rows=alpha_rows)
            ref = image_media_ref(w, h, "RGBA", b"".join(rgb_rows))
    else:  # GIF: global palette; plain full-screen or animated frames
        import numpy as np

        n_colors = rng.randrange(2, 17)
        palette = rng.randbytes(3 * n_colors)
        pal_arr = np.frombuffer(palette, np.uint8).reshape(n_colors, 3)
        if rng.random() < 0.5:  # plain: 1-2 independent full-screen frames
            n_frames = rng.randrange(1, 3)
            frames_idx = [bytes(rng.randrange(n_colors)
                                for _ in range(w * h))
                          for _ in range(n_frames)]
            data = pixels_to_gif(frames_idx, w, h, palette)
            refs = []
            for idx in frames_idx:
                rgb = b"".join(palette[3 * i: 3 * i + 3] for i in idx)
                refs.append(image_media_ref(w, h, "P", rgb))
        else:  # animated: subrects + disposal + transparency; the
            # generator composes frames itself (independent of the
            # decoder's composition) to hand-compute the expectations
            n_frames = rng.randrange(2, 4)
            frames_idx: list[bytes] = []
            metas: list[dict] = []
            screen = np.zeros((h, w), np.uint8)  # bg index 0
            refs = []
            for k in range(n_frames):
                if k == 0:
                    rect = (0, 0, w, h)
                else:
                    fw = rng.randrange(1, w + 1)
                    fh = rng.randrange(1, h + 1)
                    rect = (rng.randrange(0, w - fw + 1),
                            rng.randrange(0, h - fh + 1), fw, fh)
                grid = np.frombuffer(
                    rng.randbytes(rect[2] * rect[3]), np.uint8
                ).astype(np.uint8) % n_colors
                grid = grid.reshape(rect[3], rect[2])
                meta: dict = {"rect": rect}
                if k > 0:
                    meta["disposal"] = rng.choice([0, 2, 3])
                    if rng.random() < 0.5 and n_colors > 1:
                        meta["transparent"] = int(grid.flat[0])
                frames_idx.append(grid.tobytes())
                metas.append(meta)
                before = screen.copy()
                x0, y0, fw, fh = rect
                target = screen[y0: y0 + fh, x0: x0 + fw]
                t = meta.get("transparent")
                if t is not None:
                    m = grid != t
                    target[m] = grid[m]
                else:
                    target[:] = grid
                refs.append(image_media_ref(
                    w, h, "P", pal_arr[screen].tobytes()))
                d = meta.get("disposal", 0)
                if d == 2:
                    screen[y0: y0 + fh, x0: x0 + fw] = 0
                elif d == 3:
                    screen = before
            data = pixels_to_gif(frames_idx, w, h, palette,
                                 frames_meta=metas)
        b64 = base64.b64encode(data).decode("ascii")
        return (b64, [("picture", "", r) for r in refs],
                S.STATUS_SUCCESS)

    b64 = base64.b64encode(data).decode("ascii")
    return b64, [("picture", "", ref)], S.STATUS_SUCCESS


# ======================================================================
# Document / corpus assembly
# ======================================================================

def make_doc(
    doc_id: str, seed: int = 42, pool: list[str] | None = None,
    heavy_tail: bool = True,
) -> tuple[dict, dict]:
    """One document → (input row, expected row)."""
    pool = pool or VOCAB
    rng = random.Random(stable_hash64(f"{seed}:{doc_id}"))
    r = rng.random()
    status = S.STATUS_SUCCESS
    links: list[tuple[str, str, str]] = []
    fmts: list[tuple[str, str, str]] = []
    markers: list[tuple[str, str]] = []
    outline: list[tuple[str, int, int]] = []
    fields: list[tuple[str, str, str]] = []
    if r < 0.60:
        html, exp, links, fmts, markers, fields = build_html_doc(
            rng, pool, doc_id)
        in_spans = [("html", html, "")]
    elif r < 0.85:
        payloads, exp, status = build_pdf_doc(rng, pool, doc_id, heavy_tail)
        in_spans = [("pdf_cells", p, "") for p in payloads]
    elif r < 0.915:
        b64, exp, status, outline, links = build_pdf_bytes_doc(
            rng, pool, doc_id)
        in_spans = [("pdf", b64, "")]
    elif r < 0.945:
        b64, exp, status = build_image_doc(rng, doc_id)
        in_spans = [("image", b64, "")]
    elif r < 0.96:
        b64, exp, status = build_audio_doc(rng, doc_id)
        in_spans = [("audio", b64, "")]
    elif r < 0.97:
        b64, exp, status = build_video_doc(rng, doc_id)
        in_spans = [("video", b64, "")]
    else:
        in_spans, exp, links = build_text_doc(rng, pool, doc_id)
    input_row = {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(in_spans)
        ],
    }
    expected_row = {
        "doc_id": doc_id,
        "spans": S.spans_to_arrow(exp),
        "status": status,
        "links": [{"text": t, "href": h, "region": r_} for t, h, r_ in links],
        "fmts": [{"text": t, "style": st, "region": r_}
                 for t, st, r_ in fmts],
        "outline": [{"title": t, "level": lv, "page_no": pg}
                    for t, lv, pg in outline],
        "markers": [{"text": t, "marker": m} for t, m in markers],
        "fields": [{"key": k, "value": v, "widget": w}
                   for k, v, w in fields],
    }
    return input_row, expected_row


def make_corpus(
    n_docs: int, seed: int = 42, pool: list[str] | None = None,
    heavy_tail: bool = True,
) -> tuple[pa.Table, pa.Table]:
    """Small-scale driver-side corpus (tests). For big corpora use
    :func:`render_docs_batch` inside ``map_batches``."""
    inputs, expecteds = [], []
    for i in range(n_docs):
        inp, exp = make_doc(f"doc-{seed}-{i:08d}", seed, pool, heavy_tail)
        inputs.append(inp)
        expecteds.append(exp)
    return (
        pa.Table.from_pylist(inputs, schema=S.INPUT_SCHEMA),
        pa.Table.from_pylist(
            expecteds,
            schema=pa.schema(
                [("doc_id", pa.string()), ("spans", pa.list_(S.SPAN_STRUCT)),
                 ("status", pa.string()),
                 ("links", pa.list_(pa.struct(
                     [("text", pa.string()), ("href", pa.string()),
                      ("region", pa.string())]))),
                 ("fmts", pa.list_(pa.struct(
                     [("text", pa.string()), ("style", pa.string()),
                      ("region", pa.string())]))),
                 ("outline", pa.list_(pa.struct(
                     [("title", pa.string()), ("level", pa.int32()),
                      ("page_no", pa.int32())]))),
                 ("markers", pa.list_(pa.struct(
                     [("text", pa.string()), ("marker", pa.string())]))),
                 ("fields", pa.list_(pa.struct(
                     [("key", pa.string()), ("value", pa.string()),
                      ("widget", pa.string())])))]
            ),
        ),
    )


def render_docs_batch(batch: pa.Table, seed: int = 42,
                      with_expected: bool = False,
                      docs_per_row: int = 1) -> pa.Table:
    """Ray ``map_batches`` kernel: rows with (doc_id[, text]) → interleaved
    input rows (optionally + expected columns). When a ``text`` column is
    present its tokens become the word pool, tying content volume to the
    source table (used to derive the bench corpus from
    ``/root/testdata/sf*/documents.parquet``). ``docs_per_row`` replicates
    each source row into several distinct documents (bench corpus sizing)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist() if "text" in batch.column_names else [None] * len(doc_ids)
    inputs, expecteds = [], []
    for did, text in zip(doc_ids, texts):
        base = did if isinstance(did, str) else f"doc-{did:08d}"
        pool = text.split() if text else None
        for j in range(docs_per_row):
            sid = base if docs_per_row == 1 else f"{base}-r{j}"
            inp, exp = make_doc(sid, seed, pool)
            inputs.append(inp)
            expecteds.append(exp)
    tbl = pa.Table.from_pylist(inputs, schema=S.INPUT_SCHEMA)
    if with_expected:
        exp_spans = pa.array([e["spans"] for e in expecteds],
                             type=pa.list_(S.SPAN_STRUCT))
        exp_status = pa.array([e["status"] for e in expecteds], type=pa.string())
        exp_links = pa.array(
            [e["links"] for e in expecteds],
            type=pa.list_(pa.struct([("text", pa.string()),
                                     ("href", pa.string()),
                                     ("region", pa.string())])))
        exp_fmts = pa.array(
            [e["fmts"] for e in expecteds],
            type=pa.list_(pa.struct([("text", pa.string()),
                                     ("style", pa.string()),
                                     ("region", pa.string())])))
        tbl = tbl.append_column("expected_spans", exp_spans)
        tbl = tbl.append_column("expected_status", exp_status)
        exp_outline = pa.array(
            [e["outline"] for e in expecteds],
            type=pa.list_(pa.struct([("title", pa.string()),
                                     ("level", pa.int32()),
                                     ("page_no", pa.int32())])))
        exp_markers = pa.array(
            [e["markers"] for e in expecteds],
            type=pa.list_(pa.struct([("text", pa.string()),
                                     ("marker", pa.string())])))
        exp_fields = pa.array(
            [e["fields"] for e in expecteds],
            type=pa.list_(pa.struct([("key", pa.string()),
                                     ("value", pa.string()),
                                     ("widget", pa.string())])))
        tbl = tbl.append_column("expected_links", exp_links)
        tbl = tbl.append_column("expected_fmts", exp_fmts)
        tbl = tbl.append_column("expected_outline", exp_outline)
        tbl = tbl.append_column("expected_markers", exp_markers)
        tbl = tbl.append_column("expected_fields", exp_fields)
    return tbl


# ======================================================================
# Lossy VP8 WebP writer (RFC 6386 keyframe serializer)
# ======================================================================
#
# The boolean range ENCODER below is written from the RFC independently
# of the decoder's range decoder (stages/webp_codec.py); normative
# constants and the reconstruction math are shared via functions/vp8.py
# (see its docstring). The generator picks modes and quantized levels
# directly and DEFINES the source image as the spec reconstruction, so
# the expected pixels are hand-computable without running the decoder —
# the same discipline as the constant-tile JPEG writer, but covering
# every prediction mode and token category.

class _VP8BoolEnc:
    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i < 0:
            self.out.insert(0, 1)
        else:
            self.out[i] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put((v >> k) & 1, 128)

    def signed(self, v: int, n: int) -> None:
        self.literal(abs(v), n)
        self.put(1 if v < 0 else 0, 128)

    def tree(self, tree: tuple, probs, leaf: int) -> None:
        for idx, bit in _vp8_tree_path(tree, leaf):
            self.put(bit, probs[idx >> 1])

    def flush(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


def _vp8_tree_path(tree: tuple, leaf: int,
                   start: int = 0) -> list[tuple[int, int]]:
    """Path to ``leaf`` as [(node_index, bit)], via DFS from ``start``."""
    stack = [(start, [])]
    while stack:
        node, path = stack.pop()
        for bit in (0, 1):
            nxt = tree[node + bit]
            if nxt <= 0:
                if -nxt == leaf:
                    return path + [(node, bit)]
            else:
                stack.append((nxt, path + [(node, bit)]))
    raise ValueError(f"leaf {leaf} not in tree")


def _vp8_write_block(enc: "_VP8BoolEnc", probs, first: int, ctx: int,
                     levels: list[int]) -> None:
    """Serialize one block's scan-order quantized levels as coefficient
    tokens (mirrors the RFC token loop: EOB after the last nonzero, no
    EOB branch right after a ZERO token)."""
    from docling_ray.functions import vp8 as V

    last = -1
    for j in range(first, 16):
        if levels[j]:
            last = j
    i, start = first, 0
    while i <= last:
        band = probs[V.COEF_BANDS[i]][ctx]
        v = levels[i]
        if v == 0:
            for idx, bit in _vp8_tree_path(V.COEF_TREE, 0, start):
                enc.put(bit, band[idx >> 1])
            ctx, start = 0, 2
            i += 1
            continue
        a = abs(v)
        if a <= 4:
            tok = a
            extra = None
        else:
            cat = 0
            while cat < 5 and a >= V.CAT_BASE[cat + 1]:
                cat += 1
            tok = 5 + cat
            extra = a - V.CAT_BASE[cat]
        for idx, bit in _vp8_tree_path(V.COEF_TREE, tok, start):
            enc.put(bit, band[idx >> 1])
        if extra is not None:
            cp = V.CAT_PROBS[tok - 5]
            for k, p in enumerate(cp):
                enc.put((extra >> (len(cp) - 1 - k)) & 1, p)
        enc.put(1 if v < 0 else 0, 128)
        ctx = 1 if a == 1 else 2
        start = 0
        i += 1
    if last < 15:
        band = probs[V.COEF_BANDS[max(first, last + 1)]][ctx]
        for idx, bit in _vp8_tree_path(V.COEF_TREE, V.TOKEN_EOB, start):
            enc.put(bit, band[idx >> 1])


def vp8_lossy_webp(rng: random.Random, w: int, h: int
                   ) -> tuple[bytes, "object"]:
    """One lossy-VP8 WebP file → (bytes, expected HxWx3 RGB np.ndarray).
    Modes, quantizers, loop-filter config and quantized levels are drawn
    at random; the source image is DEFINED as the RFC reconstruction of
    that stream (computed through the shared functions/vp8.py math), so
    the expectation never runs the decoder."""
    import numpy as np

    from docling_ray.functions import vp8 as V

    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    y_ac_qi = rng.randrange(0, 128)
    deltas = tuple(rng.choice([0, 0, rng.randrange(-15, 16)])
                   for _ in range(5))
    quants = V.segment_quants(y_ac_qi, deltas, False, False, [0] * 4)
    filter_type = rng.randrange(2)
    filter_level = rng.choice([0, rng.randrange(1, 64)])
    sharpness = rng.choice([0, 0, rng.randrange(8)])
    nparts = rng.choice([1, 1, 2, 4])
    skip_enabled = rng.random() < 0.7
    prob_skip = rng.randrange(1, 255) if skip_enabled else 0

    def rand_levels(maxmag: int, density: float, dcq: int,
                    acq: int) -> list[int]:
        # dequantized coefficients must fit int16 (the range every
        # conformant encoder produces from 8-bit input; decoders,
        # including libwebp's, carry coefficients in int16 surfaces) —
        # with headroom so the Y2 WHT row sums stay in range too
        lv = [0] * 16
        for j in range(16):
            if rng.random() < density:
                cap = max(1, 2000 // (dcq if j == 0 else acq))
                m = rng.randrange(1, min(maxmag, cap) + 1)
                lv[j] = m if rng.random() < 0.5 else -m
        return lv

    mbs = []
    for _ in range(mb_w * mb_h):
        ymode = rng.choice([V.DC_PRED, V.V_PRED, V.H_PRED, V.TM_PRED,
                            V.B_PRED, V.B_PRED])
        bmodes = [rng.randrange(10) for _ in range(16)] \
            if ymode == V.B_PRED else None
        uvmode = rng.randrange(4)
        density = rng.choice([0.0, 0.1, 0.3, 0.6])
        maxmag = rng.choice([1, 3, 8, 40, 500, 2000])
        y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quants[0]
        mb = {"ymode": ymode, "bmodes": bmodes, "uvmode": uvmode,
              "segment": 0, "skip": 0,
              "y2": rand_levels(maxmag, density, y2dc, y2ac)
              if ymode != V.B_PRED else None,
              "y": [rand_levels(maxmag, density, y1dc, y1ac)
                    for _ in range(16)],
              "u": [rand_levels(maxmag, density, uvdc, uvac)
                    for _ in range(4)],
              "v": [rand_levels(maxmag, density, uvdc, uvac)
                    for _ in range(4)]}
        if ymode != V.B_PRED:
            # type-0 Y blocks never code coefficient 0 (it comes from Y2)
            for lv in mb["y"]:
                lv[0] = 0
        empty = not (any(any(b) for b in mb["y"])
                     or any(any(b) for b in mb["u"])
                     or any(any(b) for b in mb["v"])
                     or (mb["y2"] is not None and any(mb["y2"])))
        if skip_enabled and empty:
            mb["skip"] = 1
        mbs.append(mb)

    # --- first partition: header + per-MB mode records ---
    enc = _VP8BoolEnc()
    enc.literal(0, 1)  # color space
    enc.literal(0, 1)  # clamping
    enc.put(0, 128)    # segmentation disabled
    enc.literal(filter_type, 1)
    enc.literal(filter_level, 6)
    enc.literal(sharpness, 3)
    enc.put(0, 128)    # no lf deltas
    enc.literal({1: 0, 2: 1, 4: 2, 8: 3}[nparts], 2)
    enc.literal(y_ac_qi, 7)
    for d in deltas:
        if d:
            enc.put(1, 128)
            enc.signed(d, 4)
        else:
            enc.put(0, 128)
    enc.put(0, 128)    # refresh_entropy_probs
    for k in range(4 * 8 * 3 * 11):
        enc.put(0, V.COEF_UPDATE_PROBS[k])  # keep default coef probs
    if skip_enabled:
        enc.put(1, 128)
        enc.literal(prob_skip, 8)
    else:
        enc.put(0, 128)
    above_bm = [[V.B_DC_PRED] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_bm = [V.B_DC_PRED] * 4
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            if skip_enabled:
                enc.put(mb["skip"], prob_skip)
            enc.tree(V.KF_YMODE_TREE, V.KF_YMODE_PROBS, mb["ymode"])
            if mb["ymode"] == V.B_PRED:
                bm = mb["bmodes"]
                for b in range(16):
                    above = above_bm[mx][b & 3] if b < 4 else bm[b - 4]
                    left = left_bm[b >> 2] if (b & 3) == 0 else bm[b - 1]
                    probs = V.KF_BMODE_PROBS[
                        (above * 10 + left) * 9:(above * 10 + left) * 9 + 9]
                    enc.tree(V.BMODE_TREE, probs, bm[b])
                above_bm[mx] = bm[12:16]
                left_bm = [bm[3], bm[7], bm[11], bm[15]]
            else:
                m = V.MODE_TO_BMODE[mb["ymode"]]
                above_bm[mx] = [m] * 4
                left_bm = [m] * 4
            enc.tree(V.UV_MODE_TREE, V.KF_UV_MODE_PROBS, mb["uvmode"])
    part0 = enc.flush()

    # --- token partitions (MB row r -> partition r % nparts) ---
    probs = [[[list(V.DEFAULT_COEF_PROBS[
        ((t * 8 + b) * 3 + c) * 11:((t * 8 + b) * 3 + c) * 11 + 11])
        for c in range(3)] for b in range(8)] for t in range(4)]
    encs = [_VP8BoolEnc() for _ in range(nparts)]
    above_nz = [[0] * 9 for _ in range(mb_w)]
    for my in range(mb_h):
        te = encs[my % nparts]
        left_nz = [0] * 9
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            a, lf_ = above_nz[mx], left_nz
            has_y2 = mb["ymode"] != V.B_PRED
            if mb["skip"]:
                for k in range(8):
                    a[k] = lf_[k] = 0
                if has_y2:
                    a[8] = lf_[8] = 0
                continue
            if has_y2:
                ctx = a[8] + lf_[8]
                _vp8_write_block(te, probs[1], 0, ctx, mb["y2"])
                a[8] = lf_[8] = int(any(mb["y2"]))
                ytype, yfirst = 0, 1
            else:
                ytype, yfirst = 3, 0
            ys = mb["y"]
            for b in range(16):
                r, c = b >> 2, b & 3
                ctx = (a[c] if r == 0 else int(any(ys[b - 4]))) + \
                    (lf_[r] if c == 0 else int(any(ys[b - 1])))
                _vp8_write_block(te, probs[ytype], yfirst, ctx, ys[b])
            for c in range(4):
                a[c] = int(any(ys[12 + c]))
            for r in range(4):
                lf_[r] = int(any(ys[4 * r + 3]))
            for key, base in (("u", 4), ("v", 6)):
                blocks = mb[key]
                for b in range(4):
                    r, c = b >> 1, b & 1
                    ctx = (a[base + c] if r == 0
                           else int(any(blocks[b - 2]))) + \
                        (lf_[base + r] if c == 0
                         else int(any(blocks[b - 1])))
                    _vp8_write_block(te, probs[2], 0, ctx, blocks[b])
                a[base] = int(any(blocks[2]))
                a[base + 1] = int(any(blocks[3]))
                lf_[base] = int(any(blocks[1]))
                lf_[base + 1] = int(any(blocks[3]))
    parts = [e.flush() for e in encs]

    tag = len(part0) << 5 | 0x10  # keyframe, version 0, show_frame
    frame = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    frame += b"\x9d\x01\x2a"
    frame += bytes([w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
    frame += part0
    for p in parts[:-1]:
        frame += bytes([len(p) & 0xFF, (len(p) >> 8) & 0xFF,
                        (len(p) >> 16) & 0xFF])
    frame += b"".join(parts)

    lf = {"type": filter_type, "level": filter_level,
          "sharpness": sharpness, "delta_enabled": False,
          "ref_delta_intra": 0, "mode_delta_bpred": 0,
          "seg_enabled": False, "seg_abs": False, "seg_lf": [0] * 4}
    yp, up, vp = V.reconstruct_frame(mb_w, mb_h, mbs, quants, lf)
    expected = V.yuv420_to_rgb(yp, up, vp, w, h)

    chunk = b"VP8 " + _struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    data = b"RIFF" + _struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return data, expected
