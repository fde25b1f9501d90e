"""Export format round trips (stages/export.py vs OutputFormat
html/html_split_page/vtt/chunks/json/doclang/dclx, reference
base_models.py:129-140): export → re-extract → span equality, the same
discipline as the doctags round trip."""

from __future__ import annotations

import json

from docling_ray.functions.refs import grid_media_ref
from docling_ray.stages.export import (
    spans_to_chunks,
    spans_to_dclx,
    spans_to_doclang,
    spans_to_html,
    spans_to_html_split_page,
    spans_to_json,
    spans_to_vtt,
)


def _sp(kind, text, ref=""):
    return {"kind": kind, "text": text, "media_ref": ref}


_HTML_SPANS = [
    _sp("title", "Main Title"),
    _sp("text", "intro paragraph"),
    _sp("section_header", "Section One"),
    _sp("list_item", "alpha"),
    _sp("list_item", "beta"),
    _sp("code", "def f():\n    return 1"),
    _sp("formula", "a + b"),
    _sp("caption", "Table 1"),
    _sp("table", "", grid_media_ref([["h", "v"], ["x", "1"]])),
    _sp("picture", "", "img://d/0"),
    _sp("caption", "Figure 1"),
    _sp("checkbox_selected", ""),
    _sp("checkbox_unselected", ""),
]


def test_html_round_trip():
    from docling_ray.stages.html_extract import extract_html

    out = extract_html(spans_to_html(_HTML_SPANS))
    want = [(s["kind"], s["text"], s["media_ref"]) for s in _HTML_SPANS]
    assert out == want


def test_html_table_after_caption_and_caption_after_table_canonicalize():
    from docling_ray.stages.html_extract import extract_html

    # pdf-source order (table, caption) canonicalizes to the html-source
    # order (caption, table) — the caption lands inside <table><caption>
    spans = [_sp("table", "", grid_media_ref([["a"]])), _sp("caption", "C")]
    out = extract_html(spans_to_html(spans))
    assert out == [("caption", "C", ""),
                   ("table", "", grid_media_ref([["a"]]))]


def test_html_split_page_sections():
    spans = [
        _sp("page_header", "H1"), _sp("text", "page one"),
        _sp("page_header", "H2"), _sp("text", "page two"),
    ]
    html = spans_to_html_split_page(spans)
    assert html.count('<section class="page">') == 2
    assert "page one" in html.split("</section>")[0]


def test_vtt_round_trip():
    from docling_ray.stages.formats import extract_vtt

    spans = [
        _sp("text", "Alice: hello there", "vtt://00:00.000-->00:04.000"),
        _sp("text", "plain narration", "vtt://00:04.000-->00:09.500"),
    ]
    out = extract_vtt(spans_to_vtt(spans))
    assert out == [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_vtt_untimed_spans_get_cues():
    from docling_ray.stages.formats import extract_vtt

    spans = [_sp("text", "first"), _sp("text", "second")]
    out = extract_vtt(spans_to_vtt(spans))
    assert [t for _, t, _ in out] == ["first", "second"]
    assert out[0][2] == "vtt://00:00:00.000-->00:00:05.000"


def test_json_round_trip():
    from docling_ray.stages.formats import extract_spans_json

    out = extract_spans_json(spans_to_json(_HTML_SPANS))
    assert out == [(s["kind"], s["text"], s["media_ref"])
                   for s in _HTML_SPANS]


def test_chunks_export_is_valid_chunker_output():
    data = json.loads(spans_to_chunks(_HTML_SPANS))
    assert isinstance(data, list) and data
    assert set(data[0]) == {"text", "headings", "n_tokens"}
    assert data[0]["headings"] == ["Main Title"]


_DCLX_SPANS = [
    _sp("title", "T"),
    _sp("page_header", "running head"),
    _sp("section_header", "S"),
    _sp("text", "body text"),
    _sp("list_item", "item one"),
    _sp("code", "x = 1"),
    _sp("formula", "e = mc2"),
    _sp("footnote", "a note"),
    _sp("table", "", grid_media_ref([["k", "v"], ["a", "1"]])),
    _sp("picture", "", "img://d/9"),
    _sp("caption", "pic caption"),
    _sp("checkbox_selected", ""),
    _sp("page_footer", "p. 1"),
]


def test_doclang_round_trip():
    from docling_ray.stages.formats_extra import extract_doclang

    out = extract_doclang(spans_to_doclang(_DCLX_SPANS))
    assert out == [(s["kind"], s["text"], s["media_ref"])
                   for s in _DCLX_SPANS]


def test_dclx_round_trip_and_detection():
    from docling_ray.stages.detect import sniff_kind
    from docling_ray.stages.formats_extra import extract_dclx

    b64 = spans_to_dclx(_DCLX_SPANS)
    assert sniff_kind(b64) == "dclx"
    out = extract_dclx(b64)
    assert out == [(s["kind"], s["text"], s["media_ref"])
                   for s in _DCLX_SPANS]
    # determinism (fixed zip timestamps)
    assert spans_to_dclx(_DCLX_SPANS) == b64


def test_dclx_through_kernel():
    from docling_ray.stages.assemble import extract_document

    out = extract_document([
        {"kind": "dclx", "text": spans_to_dclx([_sp("title", "Z")]),
         "media_ref": "", "offset": 0}])
    assert out["status"] == "success"
    assert out["spans"][0]["kind"] == "title"
    # poison: not a zip
    bad = extract_document([
        {"kind": "dclx", "text": "bm90IGEgemlw", "media_ref": "",
         "offset": 0}])
    assert bad["status"] == "failure"


def test_export_corpus_new_formats(ray_session):
    import pyarrow as pa
    import ray

    from docling_ray.stages.export import export_corpus

    rows = pa.table({
        "doc_id": ["d1"],
        "spans": [[{**s, "offset": i} for i, s in enumerate(_HTML_SPANS)]],
    })
    for fmt in ("html", "vtt", "chunks", "json", "doclang", "dclx",
                "html_split_page"):
        out = export_corpus(ray.data.from_arrow(rows), fmt=fmt).to_pandas()
        assert len(out) == 1 and out["content"][0]


def test_yaml_round_trip():
    from docling_ray.stages.export import parse_yaml_spans, spans_to_yaml

    spans = _HTML_SPANS + [
        _sp("text", 'tricky: "quotes" \\ and\nnewline'),
        _sp("text", "unicode ﬁ café"),
    ]
    out = parse_yaml_spans(spans_to_yaml(spans))
    assert out == [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    assert spans_to_yaml([]) == ""


def test_markdown_round_trip_textual_subset():
    """Markdown export re-extracts through the MD/TXT backend for the
    textual kinds (title/section/text/list/code/formula) — the same
    export→reload discipline as doctags/html/yaml; media kinds are
    documented lossy in markdown (image links, flattened tables)."""
    from docling_ray.stages.export import spans_to_markdown
    from docling_ray.stages.text_extract import extract_text

    spans = [
        _sp("title", "T"),
        _sp("text", "body para"),
        _sp("section_header", "S"),
        _sp("list_item", "item one"),
        _sp("list_item", "item two"),
        _sp("code", "x = 1"),
        _sp("formula", "a + b"),
    ]
    out = extract_text(spans_to_markdown(spans))
    assert out == [(s["kind"], s["text"], s["media_ref"]) for s in spans]
