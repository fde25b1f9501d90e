"""PDF-cells layout conformance — hand-written geometric fixtures per
FIXTURES.md §4 (single/two-column reading order, margin furniture,
hyphen/ligature merge, table grid, caption attach, garbage-page drop)."""

import json

from docling_ray.stages.pdf_layout import (
    extract_page,
    extract_pdf_unit,
    parse_page_payload,
)


def cell(text, l, t, r, b, font=10.0):
    return {"text": text, "l": l, "t": t, "r": r, "b": b, "font_size": font}


def page(cells, tables=(), images=(), page_no=1):
    return {"page_no": page_no, "width": 612.0, "height": 792.0,
            "cells": cells, "tables": list(tables), "images": list(images)}


def test_single_column_reading_order():
    p = page([
        cell("second paragraph", 72, 200, 540, 211),
        cell("first paragraph", 72, 100, 540, 111),
    ])
    spans, score = extract_page(p)
    assert [s[1] for s in spans] == ["first paragraph", "second paragraph"]
    assert score == 1.0


def test_two_column_order_left_before_right():
    p = page([
        cell("L1", 72, 100, 292, 111),
        cell("R1", 322, 80, 542, 91),
        cell("L2", 72, 400, 292, 411),
        cell("R2", 322, 300, 542, 311),
    ])
    spans, _ = extract_page(p)
    assert [s[1] for s in spans] == ["L1", "L2", "R1", "R2"]


def test_header_footer_margin_bands():
    p = page([
        cell("Running Head", 72, 20, 540, 32, font=8),
        cell("body text", 72, 100, 540, 111),
        cell("Page 1", 72, 762, 540, 774, font=8),
    ])
    spans, _ = extract_page(p)
    assert spans == [
        ("page_header", "Running Head", ""),
        ("text", "body text", ""),
        ("page_footer", "Page 1", ""),
    ]


def test_paragraph_grouping_and_hyphen_merge():
    p = page([
        cell("the exam-", 72, 100, 540, 111),
        cell("ple continues here", 72, 113, 540, 124),
        cell("new paragraph", 72, 150, 540, 161),
    ])
    spans, _ = extract_page(p)
    assert [s[1] for s in spans] == [
        "the example continues here",
        "new paragraph",
    ]


def test_ligature_and_font_heading():
    p = page([
        cell("Document Title", 72, 80, 540, 102, font=20),
        cell("Section ﬁ rst", 72, 130, 540, 147, font=16),
        cell("body ﬂow text", 72, 170, 540, 181),
    ])
    spans, _ = extract_page(p)
    assert spans == [
        ("title", "Document Title", ""),
        ("section_header", "Section first", ""),
        ("text", "body flow text", ""),
    ]


def test_table_region_grid_and_caption():
    cells = []
    for ri in range(2):
        for ci in range(2):
            cells.append(cell(f"c{ri}{ci}", 72 + ci * 100 + 2, 200 + ri * 16,
                              72 + (ci + 1) * 100 - 2, 200 + ri * 16 + 12, font=9))
    cells.append(cell("Table 1: demo", 72, 240, 300, 251))
    p = page(cells, tables=[{"l": 70, "t": 198, "r": 274, "b": 234}])
    spans, _ = extract_page(p)
    assert spans[0][0] == "table"
    grid = json.loads(spans[0][2][len("grid:"):])
    assert grid["cells"] == [["c00", "c01"], ["c10", "c11"]]
    assert spans[1] == ("caption", "Table 1: demo", "")


def test_image_region_caption_attach():
    p = page(
        [cell("Figure 1: a chart", 72, 305, 400, 316),
         cell("unrelated far paragraph", 72, 400, 540, 411)],
        images=[{"l": 72, "t": 200, "r": 540, "b": 300, "media_ref": "img://d/1"}],
    )
    spans, _ = extract_page(p)
    assert spans == [
        ("picture", "", "img://d/1"),
        ("caption", "Figure 1: a chart", ""),
        ("text", "unrelated far paragraph", ""),
    ]


def test_garbage_page_dropped():
    p = page([cell("GLYPH<aa>GLYPH<bb>�/G12/G34/G56", 72, 100, 540, 111)])
    spans, score = extract_page(p)
    assert spans == [] and score < 0.5


def test_pdf_unit_error_and_page_no():
    spans, page_no, score, err = extract_pdf_unit("{not json")
    assert spans == [] and err and page_no == -1
    payload = json.dumps(page([cell("ok", 72, 100, 540, 111)], page_no=7))
    spans, page_no, score, err = extract_pdf_unit(payload)
    assert page_no == 7 and err is None and spans == [("text", "ok", "")]


def test_payload_defaults():
    p = parse_page_payload('{"cells": []}')
    assert p["width"] == 612.0 and p["tables"] == []


def test_duplicated_text_layer_dedupes():
    """A page carrying an original + a jittered OCR text layer (every
    line stamped twice) extracts identically to the single layer
    (reference _deduplicate_cells, layout_postprocessor.py:592)."""
    from docling_ray.stages.pdf_layout import extract_page

    cells = [{"l": 72.0, "t": 100.0 + 20 * i, "r": 300.0, "b": 112.0 + 20 * i,
              "font_size": 10.0, "text": f"line {i} of the body text"}
             for i in range(4)]
    jittered = [dict(c, l=c["l"] + 0.3, t=c["t"] + 0.4) for c in cells]
    page = {"page_no": 1, "width": 612.0, "height": 792.0,
            "cells": cells + jittered, "tables": [], "images": []}
    single = {"page_no": 1, "width": 612.0, "height": 792.0,
              "cells": cells, "tables": [], "images": []}
    assert extract_page(page)[0] == extract_page(single)[0]
