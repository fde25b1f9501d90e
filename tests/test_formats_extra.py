"""PPTX / ODT / EPUB / BoxNote / LaTeX backends + doctags parse + VLM stub."""

import json

import pyarrow as pa
import pytest

from docling_ray.stages.export import parse_doctags, spans_to_doctags
from docling_ray.stages.formats_extra import (
    extract_boxnote,
    extract_epub_xhtml,
    extract_latex,
    extract_odt_xml,
    extract_pptx_xml,
)


def _grid(span):
    return json.loads(span[2][len("grid:"):])["cells"]


def test_pptx_slide():
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    raw = f"""<p:sld xmlns:a="{a}" xmlns:p="{p}">
      <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
        <p:txBody><a:p><a:r><a:t>Slide Title</a:t></a:r></a:p></p:txBody></p:sp>
      <p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr><p:txBody>
        <a:p><a:pPr><a:buChar char="-"/></a:pPr><a:r><a:t>bullet one</a:t></a:r></a:p>
        <a:p><a:r><a:t>plain body</a:t></a:r></a:p>
      </p:txBody></p:sp>
      <a:tbl><a:tr><a:tc><a:txBody><a:p><a:r><a:t>x</a:t></a:r></a:p></a:txBody></a:tc>
        <a:tc><a:txBody><a:p><a:r><a:t>y</a:t></a:r></a:p></a:txBody></a:tc></a:tr></a:tbl>
    </p:sld>"""
    spans = extract_pptx_xml(raw)
    assert spans[0] == ("title", "Slide Title", "")
    assert ("list_item", "bullet one", "") in spans
    assert ("text", "plain body", "") in spans
    table = [s for s in spans if s[0] == "table"][0]
    assert _grid(table) == [["x", "y"]]


def test_odt_content():
    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    o = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    raw = f"""<office:document-content xmlns:office="{o}" xmlns:text="{t}">
      <office:body><office:text>
        <text:h text:outline-level="1">Doc</text:h>
        <text:h text:outline-level="2">Part</text:h>
        <text:p>Body text.</text:p>
        <text:list><text:list-item><text:p>li one</text:p></text:list-item></text:list>
      </office:text></office:body></office:document-content>"""
    assert extract_odt_xml(raw) == [
        ("title", "Doc", ""),
        ("section_header", "Part", ""),
        ("text", "Body text.", ""),
        ("list_item", "li one", ""),
    ]


def test_epub_delegates_to_html():
    spans = extract_epub_xhtml("<body><h1>Chapter 1</h1><p>Once upon.</p></body>")
    assert spans == [("title", "Chapter 1", ""), ("text", "Once upon.", "")]


def test_boxnote_tree():
    doc = {"doc": {"type": "doc", "content": [
        {"type": "heading", "attrs": {"level": 1},
         "content": [{"type": "text", "text": "Note"}]},
        {"type": "paragraph", "content": [{"type": "text", "text": "Hello "},
                                          {"type": "text", "text": "world"}]},
        {"type": "bullet_list", "content": [
            {"type": "list_item", "content": [
                {"type": "paragraph", "content": [{"type": "text", "text": "item"}]}]}]},
        {"type": "code_block", "content": [{"type": "text", "text": "x=1"}]},
        {"type": "image", "attrs": {"src": "box://i", "alt": "pic"}},
    ]}}
    spans = extract_boxnote(json.dumps(doc))
    assert spans == [
        ("title", "Note", ""),
        ("text", "Hello world", ""),
        ("list_item", "item", ""),
        ("code", "x=1", ""),
        ("picture", "", "box://i"),
        ("caption", "pic", ""),
    ]


def test_latex_subset():
    raw = r"""% comment line
\title{My \textbf{Paper}}
\section{Intro}
Some prose here
spanning lines.

\subsection{Detail}
\begin{itemize}
\item first thing
\item second thing
\end{itemize}
$$ e = m c^2 $$
\begin{verbatim}
raw code
\end{verbatim}
\includegraphics[width=5cm]{fig1.png}
\caption{A figure}
\begin{tabular}{ll}
a & b \\ \hline
c & d \\
\end{tabular}
"""
    spans = extract_latex(raw)
    assert spans[0] == ("title", "My Paper", "")
    assert ("section_header", "Intro", "") in spans
    assert ("text", "Some prose here spanning lines.", "") in spans
    assert ("list_item", "first thing", "") in spans
    assert ("formula", "e = m c^2", "") in spans
    assert ("code", "raw code", "") in spans
    assert ("picture", "", "fig1.png") in spans
    assert ("caption", "A figure", "") in spans
    table = [s for s in spans if s[0] == "table"][0]
    assert _grid(table) == [["a", "b"], ["c", "d"]]


def test_doctags_roundtrip():
    spans = [
        {"kind": "title", "text": "T", "media_ref": ""},
        {"kind": "picture", "text": "", "media_ref": "img://x"},
        {"kind": "code", "text": "a\nb", "media_ref": ""},
    ]
    dt = spans_to_doctags(spans)
    assert parse_doctags(dt) == [("title", "T", ""), ("picture", "", "img://x"),
                                 ("code", "a\nb", "")]


def test_doctags_otsl_table_roundtrip():
    """Tables serialize as OTSL (<ched>/<fcel>/<ecel>/<nl>) and parse
    back to the canonical grid ref — incl. empty cells, markup-looking
    cell text, entities and ragged rows."""
    from docling_ray.functions.refs import grid_media_ref

    grid = [["h1", "", "a<b"], ["x&y", "<fcel>literal", "z"], ["tail"]]
    spans = [
        {"kind": "text", "text": "before", "media_ref": ""},
        {"kind": "table", "text": "", "media_ref": grid_media_ref(grid)},
        {"kind": "caption", "text": "after", "media_ref": ""},
    ]
    dt = spans_to_doctags(spans)
    assert "<otsl>" in dt and "<ched>h1<ecel>" in dt and "<nl>" in dt
    assert parse_doctags(dt) == [
        ("text", "before", ""),
        ("table", "", grid_media_ref(grid)),
        ("caption", "after", ""),
    ]


def test_doctags_corpus_totalization(ray_session):
    """Every span sequence the extractors emit round-trips through
    doctags exactly — tables (OTSL), pictures, code, formulas, AV spans."""
    import ray

    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.synth import make_corpus

    inp, _exp = make_corpus(150, seed=23)
    out = extract_corpus(ray.data.from_arrow(inp)).to_pandas()
    n_tables = 0
    for spans in out.spans:
        if spans is None:
            continue
        sl = [{"kind": s["kind"], "text": s["text"],
               "media_ref": s["media_ref"]} for s in spans]
        n_tables += sum(1 for s in sl if s["kind"] == "table")
        assert parse_doctags(spans_to_doctags(sl)) == [
            (s["kind"], s["text"], s["media_ref"]) for s in sl]
    assert n_tables > 0  # the corpus must actually exercise OTSL


def test_vlm_stub_stage(ray_session):
    import ray

    from docling_ray.stages.asr import VlmConvertStage, resolve_vlm
    from docling_ray.synth import build_pdf_page
    import random

    with pytest.raises(NotImplementedError):
        resolve_vlm("granite_docling")
    rng = random.Random(5)
    payload, expected, _ = build_pdf_page(rng, ["alpha", "beta"], "d1", 1, [0],
                                          first_page=True)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["d1"]), "payload": pa.array([payload]),
    }))
    out = ds.map_batches(VlmConvertStage, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    got = [(s["kind"], s["text"], s["media_ref"]) for s in out.spans.iloc[0]]
    assert got == expected  # fake VLM output parses back to the page's spans
    assert out.page_no.iloc[0] == 1 and "<" in out.doctags.iloc[0]


def test_extra_formats_through_kernel():
    from docling_ray.stages.assemble import extract_document

    out = extract_document([
        {"kind": "latex", "text": r"\section{S} text", "media_ref": "", "offset": 0},
        {"kind": "boxnote", "text": "{bad json", "media_ref": "", "offset": 1},
    ])
    assert out["status"] == "partial_success"
    assert out["spans"][0]["kind"] == "section_header"
