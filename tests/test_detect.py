"""Format detection tests (reference _guess_format parity,
document.py:763-1108): every registered extractor kind must be
recoverable from content alone, and the synthetic corpus must detect
100% against the generator's known labels."""

from docling_ray.stages.detect import detect_format_batch, sniff_kind
from docling_ray.synth import make_corpus

CASES = [
    ("vtt", "WEBVTT\n\n00:00:00.000 --> 00:00:02.000\n<v Alice>Hello"),
    ("eml", "From: a@b.c\nTo: d@e.f\nSubject: Hi there\n\nBody text here"),
    ("asciidoc", "= Document Title\n\nSome paragraph text"),
    ("csv", "a,b,c\n1,2,3\n4,5,6"),
    ("latex", "\\documentclass{article}\\begin{document}Hi\\end{document}"),
    ("jats", "<article><front><article-title>T</article-title></front>"
             "</article>"),
    ("uspto", "<us-patent-grant><us-bibliographic-data-grant/>"
              "</us-patent-grant>"),
    ("xbrl", '<xbrl xmlns="http://www.xbrl.org/2003/instance">'
             '<context id="c"/></xbrl>'),
    ("mets_gbs", '<mets xmlns="http://www.loc.gov/METS/"><structMap/>'
                 "</mets>"),
    ("docx_xml", '<w:document xmlns:w="http://schemas.openxmlformats.org/'
                 'wordprocessingml/2006/main"><w:body/></w:document>'),
    ("xlsx_xml", '<worksheet xmlns="http://schemas.openxmlformats.org/'
                 'spreadsheetml/2006/main"><sheetData/></worksheet>'),
    ("pptx_xml", '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
                 'presentationml/2006/main"/>'),
    ("odt_xml", '<office:document-content xmlns:office="urn:oasis:names:'
                'tc:opendocument:xmlns:office:1.0"/>'),
    ("epub_xhtml", '<?xml version="1.0"?><html xmlns="http://www.w3.org/'
                   '1999/xhtml"><body><p>x</p></body></html>'),
    ("html", "<!DOCTYPE html><html><body><p>hello</p></body></html>"),
    ("boxnote", '{"type": "doc", "content": [{"type": "paragraph"}]}'),
    ("spans_json", '{"doc_id": "d", "spans": [], "status": "success"}'),
    ("text", "# Title\n\nsome paragraph"),
    ("ebcdic", "È" * 30),
]


def test_sniff_every_registered_kind():
    for want, payload in CASES:
        assert sniff_kind(payload) == want, (want, sniff_kind(payload))


def test_sniff_dialect_doctypes():
    # USPTO by DOCTYPE rather than root (document.py:920-931)
    raw = ('<!DOCTYPE us-patent-grant SYSTEM "us-patent-grant-v45.dtd">'
           "<us-patent-grant/>")
    assert sniff_kind(raw) == "uspto"
    raw = ('<!DOCTYPE article PUBLIC "-//NLM//DTD JATS-journalpublishing1'
           '.dtd"><article/>')
    assert sniff_kind(raw) == "jats"


def test_sniff_media_and_pdf():
    assert sniff_kind("a caption", media_ref="img://d/1") == "media"
    assert sniff_kind("", media_ref="audio://d/2") == "media"
    assert sniff_kind("%PDF-1.4\nxref") == "pdf"
    import base64

    from docling_ray.synth import pages_to_pdf_bytes

    b64 = base64.b64encode(pages_to_pdf_bytes(
        [{"page_no": 1, "width": 612.0, "height": 792.0, "cells": [],
          "tables": [], "images": []}])).decode()
    assert sniff_kind(b64) == "pdf"
    assert sniff_kind(
        '{"page_no": 1, "cells": [], "width": 1, "height": 1}'
    ) == "pdf_cells"


def test_sniff_doclang_extension():
    assert sniff_kind("<doclang/>", filename="x.dclg") == "doclang"
    assert sniff_kind("<doclang><text>x</text></doclang>") == "doclang"
    # .dclx archives are now supported (export/reload round trip)
    assert sniff_kind("", filename="y.dclx") == "dclx"


def test_corpus_detection_matches_generator_labels():
    inp, _ = make_corpus(120, seed=33)
    miss = [
        (s["kind"], sniff_kind(s["text"] or "", s["media_ref"] or ""))
        for row in inp.to_pylist() for s in row["spans"]
        if sniff_kind(s["text"] or "", s["media_ref"] or "") != s["kind"]
    ]
    assert miss == []


def test_detect_batch_shape():
    inp, _ = make_corpus(10, seed=5)
    out = detect_format_batch(inp)
    assert out.column_names == ["doc_id", "offset", "kind"]
    n_spans = sum(len(r["spans"]) for r in inp.to_pylist())
    assert out.num_rows == n_spans


def test_auto_kind_routes_through_extractor():
    from docling_ray.stages.assemble import extract_document

    out = extract_document([
        {"kind": "auto", "text": "<html><body><p>hi there</p></body></html>",
         "media_ref": "", "offset": 0},
        {"kind": "", "text": "# T\n\nbody", "media_ref": "", "offset": 1},
    ])
    kinds = [s["kind"] for s in out["spans"]]
    assert out["status"] == "success"
    assert "text" in kinds and "title" in kinds
