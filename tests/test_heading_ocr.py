"""Heading-hierarchy numbering rules (FIXTURES.md §4 case 10) and the OCR
stage registry/rect selection."""

import pyarrow as pa
import pytest

from docling_ray.stages.heading_hierarchy import (
    assign_levels,
    heading_level,
    heading_levels_batch,
)
from docling_ray.stages.ocr import OcrStage, resolve_engine, select_ocr_rects


def test_numbering_families():
    assert heading_level("1. Introduction") == 1
    assert heading_level("1.1 Details") == 2
    assert heading_level("2.3.4 Deep dive") == 3
    assert heading_level("(a) variant", prev_level=2) == 3
    assert heading_level("IV. Results") == 1
    assert heading_level("Chapter One") == 1
    assert heading_level("Unnumbered", prev_level=2) == 2


def test_assign_levels_sequence():
    spans = [
        {"kind": "title", "text": "Doc", "media_ref": "", "offset": 0},
        {"kind": "section_header", "text": "1. A", "media_ref": "", "offset": 1},
        {"kind": "text", "text": "x", "media_ref": "", "offset": 2},
        {"kind": "section_header", "text": "1.1 B", "media_ref": "", "offset": 3},
        {"kind": "section_header", "text": "(a) C", "media_ref": "", "offset": 4},
        {"kind": "section_header", "text": "2. D", "media_ref": "", "offset": 5},
    ]
    assert assign_levels(spans) == [
        (0, "Doc", 0), (1, "1. A", 1), (3, "1.1 B", 2),
        (4, "(a) C", 3), (5, "2. D", 1),
    ]


def test_heading_levels_batch():
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "spans": pa.array([[
            {"kind": "title", "text": "T", "media_ref": "", "offset": 0},
            {"kind": "section_header", "text": "1. S", "media_ref": "", "offset": 1},
        ]]),
    })
    out = heading_levels_batch(batch).to_pylist()
    assert out == [
        {"doc_id": "d1", "offset": 0, "text": "T", "level": 0},
        {"doc_id": "d1", "offset": 1, "text": "1. S", "level": 1},
    ]


def test_ocr_engine_registry():
    with pytest.raises(NotImplementedError):
        resolve_engine("easyocr")
    eng = resolve_engine("auto")  # falls through to the fake engine
    r = {"l": 10.0, "t": 20.0, "r": 110.0, "b": 120.0}
    assert eng.recognize(r) == eng.recognize(dict(r))  # deterministic


def test_ocr_rect_selection_pdf_aware():
    page = {
        "cells": [{"text": "covered", "l": 10, "t": 10, "r": 90, "b": 20}],
        "images": [
            {"l": 0, "t": 0, "r": 100, "b": 30},     # has text → skip
            {"l": 0, "t": 200, "r": 100, "b": 300},  # no text → OCR
        ],
    }
    rects = select_ocr_rects(page)
    assert len(rects) == 1 and rects[0]["t"] == 200


def test_ocr_stage_batch():
    import json

    page = {"page_no": 3, "cells": [],
            "images": [{"l": 0, "t": 0, "r": 50, "b": 50}]}
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "payload": pa.array([json.dumps(page)]),
    })
    out = OcrStage(engine="fake")(batch).to_pylist()
    assert len(out) == 1 and out[0]["page_no"] == 3
    assert out[0]["ocr_text"].startswith("ocr_")


def test_bookmark_precedence_over_numbering():
    from docling_ray.stages.heading_hierarchy import (
        assign_levels,
        assign_levels_with_bookmarks,
    )

    spans = [
        {"kind": "title", "text": "Doc", "media_ref": "", "offset": 0},
        {"kind": "section_header", "text": "1. Intro", "media_ref": "",
         "offset": 1},
        {"kind": "section_header", "text": "Deep Dive", "media_ref": "",
         "offset": 2},
    ]
    # numbering alone: "Deep Dive" is unnumbered → sibling of previous (1)
    assert assign_levels(spans)[2][2] == 1
    # the outline says Deep Dive sits at depth 2 → bookmarks win
    outline = [{"title": "Deep Dive", "level": 2, "page_no": 3}]
    got = assign_levels_with_bookmarks(spans, outline)
    assert got[1][2] == 1  # numbering fallback unchanged
    assert got[2][2] == 2  # bookmark precedence
