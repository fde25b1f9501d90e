"""Property-based robustness: extractors are total functions — any input
produces spans or error rows, never exceptions (the reference's errors-as-
data contract, docling/datamodel/base_models.py:85-91)."""

import json

from hypothesis import given, settings, strategies as st

from docling_ray.functions.normalize import (
    clean_unicode,
    merge_hyphenated_lines,
    sanitize_cell_text,
    text_quality_score,
)
from docling_ray.stages.assemble import extract_document
from docling_ray.stages.csv_extract import extract_csv
from docling_ray.stages.html_extract import extract_html
from docling_ray.stages.text_extract import extract_text


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_html_never_raises(s):
    spans = extract_html(s)
    assert all(len(t) == 3 for t in spans)


@given(st.text(alphabet=st.characters(), max_size=300))
@settings(max_examples=100, deadline=None)
def test_normalize_total(s):
    clean_unicode(s)
    sanitize_cell_text([s])
    assert 0.0 <= text_quality_score(s) <= 1.0


@given(st.lists(st.text(max_size=40), max_size=8))
@settings(max_examples=100, deadline=None)
def test_hyphen_merge_total(lines):
    out = merge_hyphenated_lines(lines)
    assert isinstance(out, str)


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_text_and_csv_never_raise(s):
    extract_text(s)
    extract_csv(s)


@given(
    st.lists(
        st.fixed_dictionaries({
            "kind": st.sampled_from(["html", "text", "pdf_cells", "media",
                                     "csv", "vtt", "eml", "asciidoc",
                                     "ebcdic", "spans_json", "docx_xml",
                                     "xlsx_xml", "jats", "pptx_xml",
                                     "odt_xml", "epub_xhtml", "boxnote",
                                     "latex", "uspto", "xbrl", "mets_gbs",
                                     "image", "audio", "video", "dclx", "doclang", "pdf",
                                     "epub", "csv", "docx", "xlsx", "pptx",
                                     "odt", "ods", "odp", "garbage_kind"]),
            "text": st.text(max_size=200),
            "media_ref": st.text(max_size=20),
            "offset": st.integers(min_value=0, max_value=100),
        }),
        max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_extract_document_total(spans):
    out = extract_document(spans)
    assert out["status"] in ("success", "partial_success", "failure")
    assert out["n_spans"] == len(out["spans"])


def test_pdf_adversarial_payloads():
    for payload in [
        "{}", "[]", "null", '{"cells": "notalist"}',
        '{"cells": [{"l": 1}]}',  # missing keys
        json.dumps({"cells": [{"text": "x", "l": 1e308, "t": -1e308,
                               "r": 1e308, "b": 1e308, "font_size": 1e9}]}),
    ]:
        out = extract_document([{"kind": "pdf_cells", "text": payload,
                                 "media_ref": "", "offset": 0}])
        assert out["status"] in ("success", "partial_success", "failure")


@given(st.integers(0, 10_000), st.integers(0, 255), st.integers(1, 40))
@settings(max_examples=60, deadline=None)
def test_pdf_parser_total_under_byte_corruption(pos, byte, count):
    """Random byte smashes over a real PDF must surface as error DATA from
    the unit extractor, never as an exception."""
    import base64

    from docling_ray.stages.pdf_bytes import extract_pdf_bytes_unit
    from docling_ray.synth import pages_to_pdf_bytes

    data = bytearray(pages_to_pdf_bytes([{
        "page_no": 1, "width": 612.0, "height": 792.0,
        "cells": [{"text": "hello fuzzing world", "l": 72.0, "t": 100.0,
                   "r": 292.0, "b": 111.0, "font_size": 10.0}],
        "tables": [], "images": [],
    }]))
    for i in range(count):
        data[(pos + i * 37) % len(data)] = byte
    spans, _pno, score, err = extract_pdf_bytes_unit(
        base64.b64encode(bytes(data)).decode())
    assert isinstance(spans, list)
    assert err is None or isinstance(err, str)
