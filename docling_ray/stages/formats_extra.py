"""Second tier of format backends: PPTX, ODT, EPUB, BoxNote, LaTeX.

Rebuilds of the remaining reference backends (SURVEY.md §2.1), registered
as input-span kinds:

  * ``pptx_xml`` — one PresentationML slide XML
    (``docling/backend/mspowerpoint_backend.py:96``): title placeholders →
    title, bulleted paragraphs → list items, shapes' text bodies → text,
    ``a:tbl`` → grid, ``p:pic`` blips → pictures. Slide = page in the
    reference; here one payload = one slide.
  * ``odt_xml`` — ODF ``content.xml``
    (``docling/backend/opendocument_backend.py:124``): ``text:h`` outline
    levels, ``text:p``, ``text:list``, ``table:table`` grids,
    ``draw:image`` refs.
  * ``epub_xhtml`` — the EPUB spine's concatenated XHTML: delegates to the
    HTML extractor exactly like the reference's EPUB backend delegates
    (``docling/backend/epub_backend.py:336-450``).
  * ``boxnote`` — ProseMirror-style JSON tree walk
    (``docling/backend/boxnote_backend.py:39``): paragraph/heading/list/
    code/image/table nodes.
  * ``latex`` — TeX subset (``docling/backend/latex/backend.py:51``):
    ``\\title``/``\\section``-family, itemize/enumerate, verbatim,
    display math, ``\\includegraphics``, tabular grids, comment stripping,
    common inline commands unwrapped.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.stages.html_extract import extract_html, grid_media_ref

Span = tuple[str, str, str]

# ---------------------------------------------------------------------------
# PPTX slide
# ---------------------------------------------------------------------------

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _runs_text(ap: ET.Element) -> str:
    return collapse_whitespace(clean_unicode(
        "".join(t.text or "" for t in ap.iter(f"{_A}t"))))


def extract_pptx_xml(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    spans: list[Span] = []
    for sp in root.iter(f"{_P}sp"):
        ph = sp.find(f"{_P}nvSpPr/{_P}nvPr/{_P}ph")
        ph_type = ph.get("type", "") if ph is not None else ""
        is_title = ph_type in ("title", "ctrTitle")
        for ap in sp.iter(f"{_A}p"):
            text = _runs_text(ap)
            if not text:
                continue
            if is_title:
                spans.append(("title", text, ""))
            elif (ap.find(f"{_A}pPr/{_A}buChar") is not None
                  or ap.find(f"{_A}pPr/{_A}buAutoNum") is not None):
                spans.append(("list_item", text, ""))
            else:
                spans.append(("text", text, ""))
    for tbl in root.iter(f"{_A}tbl"):
        grid = []
        for tr in tbl.findall(f"{_A}tr"):
            grid.append([_runs_text(tc) for tc in tr.findall(f"{_A}tc")])
        ncols = max((len(r) for r in grid), default=0)
        grid = [r + [""] * (ncols - len(r)) for r in grid]
        spans.append(("table", "", grid_media_ref(grid)))
    for pic in root.iter(f"{_P}pic"):
        for blip in pic.iter(f"{_A}blip"):
            spans.append(("picture", "", f"rel://{blip.get(f'{_R}embed', '')}"))
    return spans


# ---------------------------------------------------------------------------
# ODT content.xml
# ---------------------------------------------------------------------------

_T = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TB = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_DR = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"
_XL = "{http://www.w3.org/1999/xlink}"
_OF = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"


def _odt_text(el: ET.Element) -> str:
    return collapse_whitespace(clean_unicode("".join(el.itertext())))


def _walk_odt(el: ET.Element, spans: list[Span]) -> None:
    for child in el:
        if child.tag == f"{_T}h":
            text = _odt_text(child)
            if text:
                lvl = int(child.get(f"{_T}outline-level", "1") or 1)
                spans.append(("title" if lvl == 1 else "section_header",
                              text, ""))
        elif child.tag == f"{_T}p":
            for frame in child.iter(f"{_DR}frame"):
                for img in frame.iter(f"{_DR}image"):
                    spans.append(("picture", "",
                                  img.get(f"{_XL}href", "")))
            text = _odt_text(child)
            if text:
                spans.append(("text", text, ""))
        elif child.tag == f"{_T}list":
            for item in child.findall(f"{_T}list-item"):
                text = _odt_text(item)
                if text:
                    spans.append(("list_item", text, ""))
        elif child.tag == f"{_TB}table":
            grid = []
            for tr in child.findall(f"{_TB}table-row"):
                grid.append([_odt_text(tc)
                             for tc in tr.findall(f"{_TB}table-cell")])
            ncols = max((len(r) for r in grid), default=0)
            grid = [r + [""] * (ncols - len(r)) for r in grid]
            spans.append(("table", "", grid_media_ref(grid)))
        else:
            _walk_odt(child, spans)


def extract_odt_xml(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    spans: list[Span] = []
    body = root.find(f"{_OF}body")
    _walk_odt(body if body is not None else root, spans)
    return spans


# ---------------------------------------------------------------------------
# ODS spreadsheet / ODP presentation (flat content XML; the reference's
# opendocument_backend.py:1392 spreadsheet/presentation branches rebuilt
# over ElementTree)
# ---------------------------------------------------------------------------

_PR = "{urn:oasis:names:tc:opendocument:xmlns:presentation:1.0}"


def extract_ods_xml(raw: str) -> list[Span]:
    """ODS content.xml → one section_header + table span per sheet, empty
    trailing rows/columns trimmed (the reference's true-data-bounds rule,
    opendocument_backend.py:162)."""
    root = ET.fromstring(raw)
    spans: list[Span] = []
    for sheet in root.iter(f"{_TB}table"):
        grid: list[list[str]] = []
        for tr in sheet.iter(f"{_TB}table-row"):
            row: list[str] = []
            for tc in tr.findall(f"{_TB}table-cell"):
                rep = int(tc.get(f"{_TB}number-columns-repeated", "1") or 1)
                text = _odt_text(tc)
                row.extend([text] * min(rep, 1024))
            grid.append(row)
        # trim trailing empty rows, then trailing empty columns
        while grid and not any(c for c in grid[-1]):
            grid.pop()
        ncols = 0
        for r in grid:
            for ci in range(len(r) - 1, -1, -1):
                if r[ci]:
                    ncols = max(ncols, ci + 1)
                    break
        grid = [r[:ncols] + [""] * (ncols - len(r[:ncols])) for r in grid]
        if not grid:
            continue
        name = sheet.get(f"{_TB}name", "")
        if name:
            spans.append(("section_header", name, ""))
        spans.append(("table", "", grid_media_ref(grid)))
    return spans


def extract_odp_xml(raw: str) -> list[Span]:
    """ODP content.xml → per draw:page: title frame → section_header,
    other text frames → text paragraphs / list items, images → pictures."""
    root = ET.fromstring(raw)
    spans: list[Span] = []
    for page in root.iter(f"{_DR}page"):
        for frame in page.findall(f"{_DR}frame"):
            cls = frame.get(f"{_PR}class", "")
            texts = [t for t in (_odt_text(pp)
                                 for pp in frame.iter(f"{_T}p")) if t]
            if cls in ("title", "outline-title"):
                for t in texts:
                    spans.append(("section_header", t, ""))
                continue
            for img in frame.iter(f"{_DR}image"):
                spans.append(("picture", "", img.get(f"{_XL}href", "")))
            in_list = frame.find(f".//{_T}list") is not None
            for t in texts:
                spans.append(("list_item" if in_list else "text", t, ""))
    return spans


# ---------------------------------------------------------------------------
# EPUB: container (base64 zip → container.xml → OPF spine → XHTML docs,
# the reference's epub_backend.py:336-450 package walk) and single-file
# XHTML delegation
# ---------------------------------------------------------------------------

def extract_epub_xhtml(raw: str) -> list[Span]:
    return extract_html(raw)


def extract_epub(b64: str) -> list[Span]:
    """Full EPUB container: META-INF/container.xml names the OPF package,
    whose manifest+spine give the reading order of the XHTML documents —
    each is extracted by the HTML pipeline and concatenated."""
    import base64
    import io
    import posixpath
    import zipfile

    data = base64.b64decode(b64, validate=True)
    spans: list[Span] = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = set(zf.namelist())
        container = zf.read("META-INF/container.xml").decode("utf-8")
        croot = ET.fromstring(container)
        opf_path = ""
        for rf in croot.iter():
            if rf.tag.rsplit("}", 1)[-1] == "rootfile":
                opf_path = rf.get("full-path", "")
                break
        if not opf_path or opf_path not in names:
            raise ValueError("epub: no OPF package in container.xml")
        opf_dir = posixpath.dirname(opf_path)
        opf = ET.fromstring(zf.read(opf_path).decode("utf-8"))
        hrefs: dict[str, str] = {}
        spine: list[str] = []
        for el in opf.iter():
            local = el.tag.rsplit("}", 1)[-1]
            if local == "item" and el.get("id") and el.get("href"):
                hrefs[el.get("id")] = el.get("href")
            elif local == "itemref" and el.get("idref"):
                spine.append(el.get("idref"))
        for idref in spine:
            href = hrefs.get(idref)
            if not href:
                continue
            path = posixpath.normpath(posixpath.join(opf_dir, href))
            if path not in names:
                continue
            spans.extend(extract_epub_xhtml(
                zf.read(path).decode("utf-8", errors="replace")))
    return spans


# ---------------------------------------------------------------------------
# BoxNote (ProseMirror JSON)
# ---------------------------------------------------------------------------

def _pm_text(node: dict) -> str:
    if node.get("type") == "text":
        return node.get("text", "")
    return "".join(_pm_text(c) for c in node.get("content", []))


def _walk_boxnote(node: dict, spans: list[Span]) -> None:
    ntype = node.get("type", "")
    if ntype == "paragraph":
        text = collapse_whitespace(clean_unicode(_pm_text(node)))
        if text:
            spans.append(("text", text, ""))
        return
    if ntype == "heading":
        text = collapse_whitespace(clean_unicode(_pm_text(node)))
        if text:
            lvl = int(node.get("attrs", {}).get("level", 2) or 2)
            spans.append(("title" if lvl == 1 else "section_header", text, ""))
        return
    if ntype == "list_item":
        text = collapse_whitespace(clean_unicode(_pm_text(node)))
        if text:
            spans.append(("list_item", text, ""))
        for c in node.get("content", []):
            if c.get("type") in ("bullet_list", "ordered_list"):
                _walk_boxnote(c, spans)
        return
    if ntype == "code_block":
        spans.append(("code", clean_unicode(_pm_text(node)), ""))
        return
    if ntype == "image":
        attrs = node.get("attrs", {})
        spans.append(("picture", "", attrs.get("src", "") or ""))
        alt = collapse_whitespace(clean_unicode(attrs.get("alt", "") or ""))
        if alt:
            spans.append(("caption", alt, ""))
        return
    if ntype == "table":
        grid = []
        for row in node.get("content", []):
            grid.append([
                collapse_whitespace(clean_unicode(_pm_text(cell)))
                for cell in row.get("content", [])
            ])
        ncols = max((len(r) for r in grid), default=0)
        grid = [r + [""] * (ncols - len(r)) for r in grid]
        spans.append(("table", "", grid_media_ref(grid)))
        return
    for c in node.get("content", []):
        _walk_boxnote(c, spans)


def extract_boxnote(raw: str) -> list[Span]:
    data = json.loads(raw)
    root = data.get("doc", data) if isinstance(data, dict) else {}
    spans: list[Span] = []
    _walk_boxnote(root, spans)
    return spans


# ---------------------------------------------------------------------------
# LaTeX subset
# ---------------------------------------------------------------------------

_TEX_COMMENT_RE = re.compile(r"(?<!\\)%.*$", re.MULTILINE)
_TEX_INLINE_RE = re.compile(
    r"\\(?:textbf|textit|emph|texttt|underline|textsc)\{([^{}]*)\}")
_TEX_CMD_RE = re.compile(r"\\[a-zA-Z]+\*?(?:\[[^\]]*\])?")


def _tex_clean(text: str) -> str:
    text = _TEX_INLINE_RE.sub(r"\1", text)
    text = _TEX_CMD_RE.sub("", text)
    text = text.replace("{", "").replace("}", "").replace("~", " ")
    return collapse_whitespace(clean_unicode(text))


def extract_latex(raw: str) -> list[Span]:
    src = _TEX_COMMENT_RE.sub("", raw)
    spans: list[Span] = []
    # verbatim blocks out first
    placeholders: list[str] = []

    def stash_verbatim(m: re.Match) -> str:
        placeholders.append(m.group(1).strip("\n"))
        return f"\n\\VERB{len(placeholders) - 1}\n"

    src = re.sub(r"\\begin\{verbatim\}(.*?)\\end\{verbatim\}",
                 stash_verbatim, src, flags=re.DOTALL)

    nb = r"((?:[^{}]|\{[^{}]*\})*)"  # one nesting level, e.g. \textbf{..}
    token_re = re.compile(
        r"\\title\{" + nb + r"\}"
        r"|\\(?:section|chapter)\*?\{" + nb + r"\}"
        r"|\\(?:subsection|subsubsection|paragraph)\*?\{" + nb + r"\}"
        r"|\\item\s+([^\n\\]*)"
        r"|\\includegraphics(?:\[[^\]]*\])?\{([^{}]*)\}"
        r"|\\caption\{" + nb + r"\}"
        r"|\$\$(.+?)\$\$|\\\[(.+?)\\\]"
        r"|\\begin\{tabular\}\{[^{}]*\}(.*?)\\end\{tabular\}"
        r"|\\VERB(\d+)",
        re.DOTALL,
    )

    pos = 0

    def flush_prose(chunk: str) -> None:
        for para in re.split(r"\n\s*\n", chunk):
            text = _tex_clean(para)
            if text:
                spans.append(("text", text, ""))

    for m in token_re.finditer(src):
        flush_prose(src[pos:m.start()])
        pos = m.end()
        (title, sect, subsect, item, graphic, caption, math1, math2,
         tabular, verb) = m.groups()
        if title is not None:
            spans.append(("title", _tex_clean(title), ""))
        elif sect is not None:
            spans.append(("section_header", _tex_clean(sect), ""))
        elif subsect is not None:
            spans.append(("section_header", _tex_clean(subsect), ""))
        elif item is not None:
            text = _tex_clean(item)
            if text:
                spans.append(("list_item", text, ""))
        elif graphic is not None:
            spans.append(("picture", "", graphic.strip()))
        elif caption is not None:
            spans.append(("caption", _tex_clean(caption), ""))
        elif math1 is not None or math2 is not None:
            spans.append(("formula",
                          collapse_whitespace(math1 or math2 or ""), ""))
        elif tabular is not None:
            grid = []
            for row in tabular.replace("\\hline", "").split("\\\\"):
                if row.strip():
                    grid.append([_tex_clean(c) for c in row.split("&")])
            ncols = max((len(r) for r in grid), default=0)
            grid = [r + [""] * (ncols - len(r)) for r in grid]
            if grid:
                spans.append(("table", "", grid_media_ref(grid)))
        elif verb is not None:
            spans.append(("code", placeholders[int(verb)], ""))
    flush_prose(src[pos:])
    return spans


# ---------------------------------------------------------------------------
# DocLang — docling's own lossless XML serialization
# (reference doclang_backend.py:14 delegates to docling_core's
# DocLangDocDeserializer; the wire format is a flat XML of DocItemLabel
# elements, read here directly onto the span model)
# ---------------------------------------------------------------------------

_DOCLANG_KINDS = {
    "title", "section_header", "text", "paragraph", "list_item", "caption",
    "code", "formula", "footnote", "page_header", "page_footer",
    "checkbox_selected", "checkbox_unselected",
}


def extract_doclang(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    if root.tag.rsplit("}", 1)[-1].lower() != "doclang":
        raise ValueError("not a doclang document")
    spans: list[Span] = []

    def walk(node: ET.Element) -> None:
        for el in node:
            local = el.tag.rsplit("}", 1)[-1].lower()
            if local in _DOCLANG_KINDS:
                kind = "text" if local == "paragraph" else local
                text = collapse_whitespace(clean_unicode(
                    "".join(el.itertext())))
                if text or kind.startswith("checkbox"):
                    spans.append((kind, text, ""))
            elif local == "picture":
                spans.append(("picture", "",
                              el.get("src", el.get("ref", ""))))
                cap = el.find("caption")
                if cap is not None:
                    t = collapse_whitespace(clean_unicode(
                        "".join(cap.itertext())))
                    if t:
                        spans.append(("caption", t, ""))
            elif local == "table":
                grid = []
                for row in el:
                    if row.tag.rsplit("}", 1)[-1].lower() in ("row", "tr"):
                        grid.append([
                            collapse_whitespace(clean_unicode(
                                "".join(c.itertext())))
                            for c in row])
                spans.append(("table", "", grid_media_ref(grid)))
            else:
                walk(el)

    walk(root)
    return spans


def extract_dclx(b64: str) -> list[Span]:
    """.dclx DocLang archive (reference doclang_archive_backend.py:17 —
    the zip counterpart of the DocLang XML reader): ``document.dclg`` is
    the document; ``artifacts/`` members carry referenced media. The
    writer half is stages/export.spans_to_dclx (round-trip tested)."""
    import base64
    import io
    import zipfile

    data = base64.b64decode(b64, validate=True)
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = zf.namelist()
        doc_name = next((n for n in names if n.endswith(".dclg")), None)
        if doc_name is None:
            raise ValueError("dclx archive has no .dclg document member")
        raw = zf.read(doc_name).decode("utf-8")
    return extract_doclang(raw)


EXTRA_FORMAT_EXTRACTORS = {
    "pptx_xml": extract_pptx_xml,
    "odt_xml": extract_odt_xml,
    "ods_xml": extract_ods_xml,
    "odp_xml": extract_odp_xml,
    "epub_xhtml": extract_epub_xhtml,
    "epub": extract_epub,
    "boxnote": extract_boxnote,
    "latex": extract_latex,
    "doclang": extract_doclang,
    "dclx": extract_dclx,
}
