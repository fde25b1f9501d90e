"""The extraction pipeline, Ray-Data-first (SURVEY.md §3.4).

Physical plans over the interleaved corpus ``(doc_id, spans)``:

  * **fast path** — one stateless ``map_batches`` stage; each document is
    extracted whole inside its batch. No shuffle. This is the default: at
    10^12-document scale extraction is embarrassingly parallel and the
    streaming executor pipelines read → extract → write with backpressure.
  * **explode path** — documents explode into unit rows (one per input
    span ≈ one PDF page), units extract independently, and
    ``groupby(doc_id).map_groups`` reassembles in deterministic order —
    the one mandatory shuffle, used for documents so large that one row
    would straggle a task (the reference's page-threaded pipeline,
    ``standard_pdf_pipeline.py:578-979``, re-expressed).
  * **hybrid (skew split, the north rule's explicit answer to giant
    PDFs)** — route by ``byte_size``: small docs take the fast path, docs
    above ``big_threshold`` take the explode path, results union. Both
    branches scan the input (column-pruned, filter pushdown when
    ``byte_size`` is materialized in the corpus parquet — see
    ``sources/corpus.py``); re-scanning storage is deliberately preferred
    over shuffling every finished document through the object store.

All kernels are Arrow-in/Arrow-out (``batch_format="pyarrow"``); rows never
fail a block — errors are ``status``/``errors`` columns (see
``stages/assemble.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from docling_ray import schema as S
from docling_ray.stages.assemble import assemble_units, extract_document, extract_unit

DEFAULT_BIG_THRESHOLD = 1 << 20  # 1 MiB of raw content per document


# ---------------------------------------------------------------------------
# byte-size annotation (vectorized, zero-copy over the list<struct> column)
# ---------------------------------------------------------------------------

def _row_byte_sizes(spans_col: pa.ChunkedArray | pa.ListArray) -> np.ndarray:
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    offsets = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    texts = spans_col.values.field("text")
    lens = pc.binary_length(pc.coalesce(texts, pa.scalar(""))).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(lens)])
    return cs[offsets[1:] - offsets[0]] - cs[offsets[:-1] - offsets[0]]


def add_byte_size(batch: pa.Table) -> pa.Table:
    if "byte_size" in batch.column_names:
        return batch
    return batch.append_column(
        "byte_size", pa.array(_row_byte_sizes(batch["spans"]), type=pa.int64())
    )


# ---------------------------------------------------------------------------
# fast path
# ---------------------------------------------------------------------------

def extract_docs_batch(batch: pa.Table) -> pa.Table:
    """Whole-document extraction kernel (fast path)."""
    if "byte_size" not in batch.column_names:
        batch = add_byte_size(batch)
    doc_ids = batch["doc_id"].to_pylist()
    spans_rows = batch["spans"].to_pylist()
    sizes = batch["byte_size"].to_pylist()
    out = []
    for did, spans, size in zip(doc_ids, spans_rows, sizes):
        res = extract_document(spans or [])
        res["doc_id"] = did
        res["byte_size"] = size
        out.append(res)
    return pa.Table.from_pylist(out, schema=S.OUTPUT_SCHEMA)


# ---------------------------------------------------------------------------
# explode path
# ---------------------------------------------------------------------------

_UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("unit_offset", pa.int32()),
        ("kind", pa.string()),
        ("spans", pa.list_(S.SPAN_STRUCT)),
        ("page_no", pa.int32()),
        ("score", pa.float64()),
        ("error", pa.string()),
        ("n_units", pa.int32()),
        ("byte_size", pa.int64()),
    ]
)


def explode_and_extract_units(batch: pa.Table) -> pa.Table:
    """Doc rows → extracted unit rows (one per input span). The explode and
    the per-unit extraction are fused into one stage so raw payloads never
    cross the shuffle — only extracted spans do (the analogue of the
    reference's eager ``_release_page_resources``,
    standard_pdf_pipeline.py:689-699)."""
    if "byte_size" not in batch.column_names:
        batch = add_byte_size(batch)
    out = []
    for did, spans, size in zip(
        batch["doc_id"].to_pylist(),
        batch["spans"].to_pylist(),
        batch["byte_size"].to_pylist(),
    ):
        spans = spans or []
        if not spans:
            out.append({
                "doc_id": did, "unit_offset": 0, "kind": "", "spans": [],
                "page_no": -1, "score": 1.0, "error": None, "n_units": 0,
                "byte_size": size,
            })
            continue
        for s in spans:
            unit_spans, page_no, score, err = extract_unit(
                s.get("kind", ""), s.get("text") or "", s.get("media_ref") or ""
            )
            out.append({
                "doc_id": did,
                "unit_offset": int(s.get("offset", 0)),
                "kind": s.get("kind", ""),
                "spans": S.spans_to_arrow(unit_spans),
                "page_no": page_no,
                "score": score,
                "error": err,
                "n_units": len(spans),
                "byte_size": size,
            })
    return pa.Table.from_pylist(out, schema=_UNIT_SCHEMA)


def reassemble_group(group) -> "pa.Table":
    """``map_groups`` kernel: one document's unit rows → one output row.
    Deterministic ordering is re-established here (never block arrival
    order) — see assemble_units."""
    import pandas as pd  # noqa: F401  (map_groups hands us a DataFrame)

    doc_id = group["doc_id"].iloc[0]
    byte_size = int(group["byte_size"].iloc[0])
    n_units = int(group["n_units"].iloc[0])
    units = []
    if n_units > 0:
        for row in group.itertuples(index=False):
            raw = row.spans if row.spans is not None else []
            spans = [(s["kind"], s["text"], s["media_ref"]) for s in raw]
            err = row.error if isinstance(row.error, str) else None
            units.append(
                (int(row.unit_offset), row.kind, spans, int(row.page_no),
                 float(row.score), err)
            )
    res = assemble_units(units)
    res["doc_id"] = doc_id
    res["byte_size"] = byte_size
    return pa.Table.from_pylist([res], schema=S.OUTPUT_SCHEMA)


# ---------------------------------------------------------------------------
# public pipeline
# ---------------------------------------------------------------------------

def extract_corpus(
    ds: "ray.data.Dataset",
    mode: str = "fast",
    big_threshold: int = DEFAULT_BIG_THRESHOLD,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    """Interleaved corpus → extracted span rows (OUTPUT_SCHEMA).

    mode:
      * ``"fast"``    — single stateless map stage, no shuffle (default).
      * ``"explode"`` — page-parallel with groupby(doc_id) reassembly.
      * ``"hybrid"``  — byte-size routed: fast for small docs, explode for
        giant ones (> big_threshold), union (the skew split).
    """
    if mode == "fast":
        return ds.map_batches(
            extract_docs_batch, batch_format="pyarrow", batch_size=batch_size
        )
    if mode == "explode":
        units = ds.map_batches(
            explode_and_extract_units, batch_format="pyarrow",
            batch_size=max(1, batch_size // 4),
        )
        return units.groupby("doc_id").map_groups(
            reassemble_group, batch_format="pandas"
        )
    if mode == "hybrid":
        sized = ds.map_batches(add_byte_size, batch_format="pyarrow")
        small = sized.map_batches(
            lambda t: t.filter(pc.less_equal(t["byte_size"], big_threshold)),
            batch_format="pyarrow",
        )
        big = sized.map_batches(
            lambda t: t.filter(pc.greater(t["byte_size"], big_threshold)),
            batch_format="pyarrow",
        )
        small_out = small.map_batches(
            extract_docs_batch, batch_format="pyarrow", batch_size=batch_size
        )
        big_units = big.map_batches(
            explode_and_extract_units, batch_format="pyarrow", batch_size=1
        )
        big_out = big_units.groupby("doc_id").map_groups(
            reassemble_group, batch_format="pandas"
        )
        return small_out.union(big_out)
    raise ValueError(f"unknown mode: {mode!r}")


# ---------------------------------------------------------------------------
# byte-balanced block splitting (the explicit size-binned repartition)
# ---------------------------------------------------------------------------

def rebalance_by_bytes(
    ds: "ray.data.Dataset", target_bytes: int = 4 << 20
) -> "ray.data.Dataset":
    """Re-cut blocks on document byte-size boundaries so a giant document
    lands alone in its own block and downstream per-task time is bounded by
    ``max(doc_bytes, target_bytes)`` — the explicit byte-size partitioning,
    applied at block level.

    Implementation note: a generator ``map_batches`` that yields sub-tables
    does NOT work — the streaming executor coalesces small outputs back
    into target_max_block_size blocks. The boundary-preserving primitive is
    ``split_at_indices`` (one metadata pass over a pruned byte_size scan,
    then a split whose parts keep their own blocks, re-unioned). This costs
    a materialization, so it is an opt-in for heavy-tail corpora where the
    hybrid/explode route is not wanted; at warehouse scale the equivalent
    is writing the corpus size-binned at derivation time
    (``sources/corpus.write_corpus`` materializes byte_size for exactly
    that)."""
    sizes = (
        ds.map_batches(add_byte_size, batch_format="pyarrow")
        .select_columns(["byte_size"])
        .to_pandas()["byte_size"]
        .to_numpy()
    )
    cuts: list[int] = []
    acc = 0
    for i, s in enumerate(sizes):
        acc += int(s)
        if acc >= target_bytes and i + 1 < len(sizes):
            cuts.append(i + 1)
            acc = 0
    if not cuts:
        return ds
    parts = ds.split_at_indices(cuts)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
