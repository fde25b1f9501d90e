

def test_cross_page_hyphen_merge_literal():
    """readingorder_model.py:589-621 parity: split word joins without the
    hyphen; furniture between the halves is skipped; uppercase
    continuations and non-text boundaries never merge."""
    from docling_ray.stages.assemble import merge_page_boundary

    prev = [("page_header", "H", ""), ("text", "runs the transfor-", ""),
            ("footnote", "1. note", ""), ("page_footer", "p1", "")]
    nxt = [("page_header", "H", ""), ("text", "mation step.", ""),
           ("text", "More.", "")]
    out = merge_page_boundary(prev, nxt)
    assert out is not None
    a, b = out
    assert a[1] == ("text", "runs the transformation step.", "")
    assert b == [("page_header", "H", ""), ("text", "More.", "")]
    # soft hyphen merges regardless of continuation case
    soft = merge_page_boundary([("text", "trans­", "")],
                               [("text", "Formation.", "")])
    assert soft is not None and soft[0][0][1] == "transFormation."
    # uppercase continuation after a hard hyphen: no merge
    assert merge_page_boundary([("text", "end-", "")],
                               [("text", "Start.", "")]) is None
    # non-text boundary: no merge
    assert merge_page_boundary([("table", "", "grid:{}")],
                               [("text", "mation", "")]) is None
    assert merge_page_boundary([("text", "plain text", "")],
                               [("text", "lower start", "")]) is None


def test_picture_in_table_cell_rich_cell_literal():
    """readingorder_model.py:162-302 parity: a picture region inside a
    table region becomes a [ref] marker in its host cell, not a flow
    picture; pictures outside tables stay independent."""
    from docling_ray.stages.pdf_layout import extract_page

    cells = [
        {"text": "k", "l": 74, "t": 200, "r": 180, "b": 212, "font_size": 9},
        {"text": "v", "l": 306, "t": 200, "r": 412, "b": 212, "font_size": 9},
        {"text": "a", "l": 74, "t": 216, "r": 180, "b": 228, "font_size": 9},
        {"text": "b", "l": 306, "t": 216, "r": 412, "b": 228, "font_size": 9},
    ]
    page = {
        "page_no": 1, "width": 612.0, "height": 792.0, "cells": cells,
        "tables": [{"l": 70, "t": 198, "r": 542, "b": 234}],
        "images": [
            {"l": 310, "t": 217, "r": 408, "b": 227,
             "media_ref": "img://d/7"},          # inside cell (1,1)
            {"l": 72, "t": 400, "r": 540, "b": 490,
             "media_ref": "img://d/8"},          # free-standing
        ],
    }
    spans, score = extract_page(page)
    import json

    tables = [m for k, _, m in spans if k == "table"]
    assert len(tables) == 1
    grid = json.loads(tables[0][5:])["cells"]
    assert grid == [["k", "v"], ["a", "b [img://d/7]"]]
    pics = [(m) for k, _, m in spans if k == "picture"]
    assert pics == ["img://d/8"]
