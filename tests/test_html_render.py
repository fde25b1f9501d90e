"""Render-layout provenance tests (stages/html_render.py — deterministic
stand-in for html_backend.py:640-900 browser rendering)."""

from __future__ import annotations

from docling_ray.stages.html_render import (
    PAD,
    VIEWPORT_H,
    layout_spans,
)


def _sp(kind, text, ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_blocks_stack_and_wrap():
    spans = [_sp("title", "Short", off=0),
             _sp("text", "x" * 2000, off=1)]  # forces multi-line wrap
    rects = layout_spans(spans)
    assert rects[0]["t"] < rects[1]["t"]
    assert rects[0]["page_no"] == 1
    one_line_h = 16.0 * 1.25
    assert rects[1]["b"] - rects[1]["t"] > 5 * one_line_h


def test_pagination_advances_page_no():
    # enough picture blocks to overflow several viewports
    spans = [_sp("picture", "", f"img://d/{i}", off=i) for i in range(10)]
    rects = layout_spans(spans)
    assert rects[0]["page_no"] == 1
    assert rects[-1]["page_no"] > 1
    # every block starts at the margin after a page break
    for r in rects:
        assert PAD <= r["t"] and r["b"] <= VIEWPORT_H  # page-local coords
    # page numbers are monotonic
    pages = [r["page_no"] for r in rects]
    assert pages == sorted(pages)


def test_table_height_tracks_rows():
    from docling_ray.functions.refs import grid_media_ref

    g1 = layout_spans([_sp("table", "", grid_media_ref([["a"]]), 0)])[0]
    g3 = layout_spans([_sp("table", "",
                           grid_media_ref([["a"], ["b"], ["c"]]), 0)])[0]
    assert (g3["b"] - g3["t"]) == 3 * (g1["b"] - g1["t"])


def test_deterministic():
    spans = [_sp("text", "hello world", off=i) for i in range(5)]
    assert layout_spans(spans) == layout_spans(spans)
