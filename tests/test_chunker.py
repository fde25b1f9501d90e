"""Structure-aware chunker tests (stages/chunker.py vs the reference's
HierarchicalChunker/HybridChunker semantics, docling/chunking/__init__.py).
Hand-written literal expectations — the chunker is also exercised
end-to-end by the doc_chunks_hybrid expected-table oracle."""

from __future__ import annotations

import pyarrow as pa

from docling_ray.functions.refs import grid_media_ref
from docling_ray.stages.chunker import (
    chunk_docs_batch,
    contextualize,
    grid_ref_to_text,
    hierarchical_chunks,
    hybrid_chunks,
)


def _sp(kind, text, ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_heading_path_and_leaves():
    spans = [
        _sp("title", "Doc Title"),
        _sp("text", "intro para"),
        _sp("section_header", "1. Alpha"),
        _sp("text", "alpha body"),
        _sp("section_header", "1.1 Sub"),
        _sp("text", "sub body"),
        _sp("section_header", "2. Beta"),
        _sp("text", "beta body"),
    ]
    out = hierarchical_chunks(spans)
    assert [(c["text"], c["headings"]) for c in out] == [
        ("intro para", ["Doc Title"]),
        ("alpha body", ["Doc Title", "1. Alpha"]),
        ("sub body", ["Doc Title", "1. Alpha", "1.1 Sub"]),
        # "2. Beta" is level 1: pops both Alpha and Sub
        ("beta body", ["Doc Title", "2. Beta"]),
    ]


def test_furniture_excluded_lists_grouped_captions_attached():
    grid = [["h1", "h2"], ["a", "b"]]
    spans = [
        _sp("page_header", "RUNNING HEAD"),
        _sp("title", "T"),
        _sp("list_item", "one"),
        _sp("list_item", "two"),
        _sp("table", "", grid_media_ref(grid)),
        _sp("caption", "Table 1. Caption"),
        _sp("picture", "", "img://d/0"),
        _sp("caption", "Figure 1. Pic"),
        _sp("picture", "", "img://d/1"),  # captionless → no chunk
        _sp("page_footer", "page 3"),
    ]
    out = hierarchical_chunks(spans)
    assert [c["kind"] for c in out] == ["list", "table", "picture"]
    assert out[0]["text"] == "one\ntwo"
    assert out[1]["text"] == "Table 1. Caption\nh1, h2\na, b"
    assert out[2]["text"] == "Figure 1. Pic"


def test_grid_ref_to_text():
    assert grid_ref_to_text(grid_media_ref([["a", "b"], ["c", "d"]])) == \
        "a, b\nc, d"
    assert grid_ref_to_text("not a grid") == ""
    assert grid_ref_to_text("grid:{broken") == ""


def test_hybrid_split_oversized():
    long = ". ".join(f"sentence number {i} with several words here"
                     for i in range(20)) + "."
    spans = [_sp("text", long)]
    out = hybrid_chunks(spans, max_tokens=30)
    assert len(out) > 1
    assert all(c["n_tokens"] <= 30 for c in out)
    # nothing lost: token multiset preserved
    from docling_ray.functions.hashing import tokenize

    got = [t for c in out for t in tokenize(c["text"])]
    assert got == tokenize(long)


def test_hybrid_merge_peers_same_heading_only():
    spans = [
        _sp("title", "T"),
        _sp("text", "short one"),
        _sp("text", "short two"),
        _sp("section_header", "Section A"),
        _sp("text", "short three"),
    ]
    out = hybrid_chunks(spans, max_tokens=64)
    # first two merge (same path), third does not (new heading path)
    assert len(out) == 2
    assert out[0]["text"] == "short one\nshort two"
    assert out[1]["headings"] == ["T", "Section A"]


def test_hybrid_no_merge_flag():
    spans = [_sp("title", "T"), _sp("text", "a"), _sp("text", "b")]
    assert len(hybrid_chunks(spans, merge_peers=False)) == 2


def test_single_word_over_budget_never_loops():
    spans = [_sp("text", "supercalifragilistic")]
    out = hybrid_chunks(spans, max_tokens=1)
    assert len(out) == 1 and out[0]["text"] == "supercalifragilistic"


def test_contextualize():
    c = {"text": "body", "headings": ["T", "S"], "n_tokens": 1}
    assert contextualize(c) == "T / S\nbody"
    assert contextualize({"text": "x", "headings": []}) == "x"


def test_chunk_docs_batch_schema():
    spans = [_sp("title", "T"), _sp("text", "hello world")]
    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "spans": pa.array([spans], type=pa.list_(pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]))),
    })
    out = chunk_docs_batch(batch, max_tokens=64)
    assert out.column_names == ["doc_id", "chunk_idx", "text",
                                "headings", "n_tokens"]
    assert out["headings"][0].as_py() == "T"
    assert out["n_tokens"][0].as_py() == 2
