"""Export sinks and CSV backend tests."""

import json

import pyarrow as pa

from docling_ray.stages.csv_extract import extract_csv
from docling_ray.stages.export import (
    export_batch,
    spans_to_doctags,
    spans_to_markdown,
    spans_to_text,
)


def _spans(*tuples):
    return [{"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(tuples)]


SAMPLE = _spans(
    ("title", "Doc Title", ""),
    ("text", "Some prose.", ""),
    ("section_header", "Part", ""),
    ("list_item", "item one", ""),
    ("code", "x = 1", ""),
    ("picture", "", "img://d/1"),
    ("caption", "A figure", ""),
    ("table", "", 'grid:{"num_rows":2,"num_cols":2,"cells":[["a","b"],["c","d"]]}'),
    ("page_header", "furniture", ""),
)


def test_markdown_export():
    md = spans_to_markdown(SAMPLE)
    assert md.startswith("# Doc Title")
    assert "## Part" in md and "- item one" in md
    assert "```\nx = 1\n```" in md
    assert "![image](img://d/1)" in md and "*A figure*" in md
    assert "| a | b |" in md and "| c | d |" in md
    assert "furniture" not in md  # page furniture excluded


def test_text_and_doctags_export():
    txt = spans_to_text(SAMPLE)
    assert "Some prose." in txt and "furniture" not in txt
    dt = spans_to_doctags(SAMPLE)
    assert "<title>Doc Title</title>" in dt
    assert '<picture ref="img://d/1"></picture>' in dt


def test_export_batch_shape():
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "spans": pa.array([SAMPLE]),
    })
    out = export_batch(batch, fmt="markdown")
    assert out.column_names == ["doc_id", "content"]
    assert out["content"][0].as_py().startswith("# Doc Title")


def test_csv_basic_and_dialects():
    spans = extract_csv("a,b,c\n1,2,3\n4,5,6")
    assert len(spans) == 1 and spans[0][0] == "table"
    grid = json.loads(spans[0][2][len("grid:"):])
    assert grid["cells"] == [["a", "b", "c"], ["1", "2", "3"], ["4", "5", "6"]]
    # semicolon dialect, ragged row padded
    spans = extract_csv("x;y\n1;2\n3")
    grid = json.loads(spans[0][2][len("grid:"):])
    assert grid["cells"] == [["x", "y"], ["1", "2"], ["3", ""]]
    assert extract_csv("") == []


def test_csv_unit_in_document():
    from docling_ray.stages.assemble import extract_document

    out = extract_document([
        {"kind": "csv", "text": "a,b\n1,2", "media_ref": "", "offset": 0},
    ])
    assert out["status"] == "success"
    assert out["spans"][0]["kind"] == "table"
