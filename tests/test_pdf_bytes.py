"""PDF-bytes backend tests: the generator-side writer (synth) and the
engine-side parser (stages/pdf_bytes) are independent implementations —
round-trip span equality across them is the backend's correctness oracle
(the same role the reference's conversion fixtures play for
pypdfium2_backend.py:409 / docling_parse_backend.py:85)."""

import base64
import random

import pytest

from docling_ray import schema as S
from docling_ray.stages.pdf_bytes import (
    PdfDocument,
    extract_pdf_bytes_unit,
    parse_pdf_pages,
)
from docling_ray.synth import (
    VOCAB,
    build_pdf_bytes_doc,
    pages_to_pdf_bytes,
)


def _simple_pages():
    return [{
        "page_no": 1, "width": 612.0, "height": 792.0,
        "cells": [
            {"text": "A Title Here", "l": 72.0, "t": 72.0, "r": 292.0,
             "b": 94.0, "font_size": 20.0},
            {"text": "body line one", "l": 72.0, "t": 110.0, "r": 292.0,
             "b": 121.0, "font_size": 10.0},
            {"text": "body line two", "l": 72.0, "t": 123.0, "r": 292.0,
             "b": 134.0, "font_size": 10.0},
        ],
        "tables": [{"l": 70.0, "t": 300.0, "r": 542.0, "b": 360.0}],
        "images": [{"l": 72.0, "t": 400.0, "r": 300.0, "b": 490.0,
                    "media_ref": "img://t/1"}],
    }]


def test_writer_parser_cell_geometry_roundtrip():
    pages = _simple_pages()
    parsed = parse_pdf_pages(pages_to_pdf_bytes(pages))
    assert len(parsed) == 1
    got = parsed[0]
    assert got["width"] == 612.0 and got["height"] == 792.0
    for orig, cell in zip(pages[0]["cells"], got["cells"]):
        # l, t, b, font recovered exactly; r uses the parser's fixed
        # advance metric (0.5 em/char)
        assert cell["text"] == orig["text"]
        assert cell["l"] == orig["l"]
        assert cell["t"] == orig["t"]
        assert cell["b"] == orig["b"]
        assert cell["font_size"] == orig["font_size"]
        assert cell["r"] == cell["l"] + 0.5 * cell["font_size"] * len(cell["text"])
    assert got["tables"] == pages[0]["tables"]
    assert got["images"] == pages[0]["images"]


def test_unicode_and_escapes_roundtrip():
    pages = [{
        "page_no": 1, "width": 612.0, "height": 792.0,
        "cells": [
            {"text": "par(en)s and \\ backslash", "l": 72.0, "t": 100.0,
             "r": 292.0, "b": 111.0, "font_size": 10.0},
            {"text": "ligature ﬁeld and � replacement", "l": 72.0,
             "t": 120.0, "r": 292.0, "b": 131.0, "font_size": 10.0},
        ],
        "tables": [], "images": [],
    }]
    parsed = parse_pdf_pages(pages_to_pdf_bytes(pages))
    texts = [c["text"] for c in parsed[0]["cells"]]
    assert texts == [c["text"] for c in pages[0]["cells"]]


def test_fixture_roundtrip_many_seeds():
    ok = 0
    for seed in range(25):
        rng = random.Random(seed)
        b64, exp, status, _outline = build_pdf_bytes_doc(rng, VOCAB,
                                                         f"d{seed}")
        spans, _pno, _score, err = extract_pdf_bytes_unit(b64)
        assert spans == exp, f"seed {seed}"
        if status == S.STATUS_PARTIAL:
            assert err and "dropped" in err
        ok += 1
    assert ok == 25


def test_multipage_order_and_flate():
    rng = random.Random(4)
    pages = []
    for p in range(3):
        pages.append({
            "page_no": p + 1, "width": 612.0, "height": 792.0,
            "cells": [{"text": f"page {p} text content here", "l": 72.0,
                       "t": 100.0, "r": 292.0, "b": 111.0,
                       "font_size": 10.0}],
            "tables": [], "images": [],
        })
    data = pages_to_pdf_bytes(pages)
    assert b"FlateDecode" in data
    spans, *_ = extract_pdf_bytes_unit(base64.b64encode(data).decode())
    assert [s[1] for s in spans] == [f"page {p} text content here"
                                     for p in range(3)]


def test_poison_inputs_are_data_not_exceptions():
    # not base64
    spans, pno, score, err = extract_pdf_bytes_unit("@@@not-b64@@@")
    assert spans == [] and err and "pdf parse error" in err
    # base64 of garbage bytes
    spans, _, _, err = extract_pdf_bytes_unit(
        base64.b64encode(b"this is not a pdf at all").decode())
    assert spans == [] and err
    # truncated file
    data = pages_to_pdf_bytes(_simple_pages())
    trunc = base64.b64encode(data[: len(data) // 3]).decode()
    spans, _, _, err = extract_pdf_bytes_unit(trunc)
    assert err is None or isinstance(err, str)  # never raises


def test_broken_xref_falls_back_to_object_scan():
    data = pages_to_pdf_bytes(_simple_pages())
    # corrupt the startxref offset — parser must rescan N 0 obj headers
    broken = data.replace(b"startxref", b"startxrff")
    doc = PdfDocument(broken)
    pages = doc.pages()
    assert len(pages) == 1
    spans, _, _, err = extract_pdf_bytes_unit(
        base64.b64encode(broken).decode())
    assert any("A Title Here" in s[1] for s in spans)


def test_pdf_kind_in_full_pipeline(ray_session):
    import ray

    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.synth import make_corpus

    # make a corpus slice and confirm at least one pdf-bytes doc exists
    inp, exp = make_corpus(80, seed=23)
    kinds = {s["kind"] for row in inp.to_pylist() for s in row["spans"]}
    assert "pdf" in kinds
    out = extract_corpus(ray.data.from_arrow(inp), mode="fast").to_pandas()
    got = {r.doc_id: [(s["kind"], s["text"], s["media_ref"]) for s in r.spans]
           for r in out.itertuples(index=False)}
    for row in exp.to_pylist():
        want = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        assert got[row["doc_id"]] == want


def test_outline_roundtrip_and_nesting():
    import random

    from docling_ray.synth import build_pdf_bytes_doc

    for seed in range(15):
        rng = random.Random(seed)
        b64, exp, status, exp_outline = build_pdf_bytes_doc(
            rng, VOCAB, f"o{seed}")
        doc = PdfDocument(base64.b64decode(b64))
        got = [(o["title"], o["level"], o["page_no"]) for o in doc.outline()]
        assert got == list(exp_outline)


def test_outline_absent_and_cycle_guard():
    data = pages_to_pdf_bytes(_simple_pages())
    assert PdfDocument(data).outline() == []
    # cycle in Next chain must not loop forever
    pages = _simple_pages()
    from docling_ray.synth import pages_to_pdf_bytes as w

    data = w(pages, outline=[(0, "A", 0), (0, "B", 0)])
    doc = PdfDocument(data)
    assert [o["title"] for o in doc.outline()] == ["A", "B"]
