"""Structure-aware document chunking (HybridChunker analogue).

The reference exports ``HierarchicalChunker`` and ``HybridChunker``
(``docling/chunking/__init__.py`` re-exporting docling_core's
``transforms/chunker``): the hierarchical pass walks the document tree
emitting one chunk per leaf item with its active heading path and
captions (furniture excluded, list items grouped, tables serialized);
the hybrid pass then applies a tokenizer budget — oversized chunks are
split, and successive undersized chunks that share the same heading
path are merged ("merge peers").

This module rebuilds both passes over the engine's reading-ordered span
sequence (the DFS-flattened analogue of the DoclingDocument tree):

* heading path — maintained from ``title`` / ``section_header`` spans
  via the same numbering rules as :mod:`heading_hierarchy` (a heading at
  level L pops deeper/equal entries and pushes itself);
* leaf items — ``text``/``code``/``formula``/``footnote`` spans chunk
  individually; consecutive ``list_item`` spans form ONE chunk; a
  ``table`` span serializes its grid media_ref to text; a ``picture``
  chunk carries its caption (pictures without captions produce no text
  and are skipped); ``page_header``/``page_footer`` are furniture and
  never chunked; a ``caption`` directly after a table/picture attaches
  to that chunk, not to the running text;
* token budget — the shared ``[a-z0-9]+`` tokenizer (the engine's
  oracle-checkable token definition, functions/hashing.py) stands in
  for the reference's HF tokenizer; splitting prefers sentence
  boundaries and falls back to word windows.

Every function here is deterministic and driver-free; the distributed
operator is :func:`chunk_docs_batch` inside ``map_batches``.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from docling_ray.functions.hashing import tokenize
from docling_ray.stages.heading_hierarchy import heading_level

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")

_LEAF_KINDS = {"text", "code", "formula", "footnote", "checkbox",
               "key_value", "form"}
_FURNITURE = {"page_header", "page_footer"}


def grid_ref_to_text(media_ref: str) -> str:
    """Serialize a ``grid:`` table media_ref to chunk text: one line per
    row, cells joined with ", " (the flat analogue of docling_core's
    table serialization)."""
    if not media_ref.startswith("grid:"):
        return ""
    try:
        grid = json.loads(media_ref[5:])["cells"]
    except (json.JSONDecodeError, KeyError, TypeError):
        return ""
    return "\n".join(", ".join(c for c in row) for row in grid)


def hierarchical_chunks(spans: list[dict]) -> list[dict]:
    """Reading-ordered spans → leaf chunks with heading-path metadata.

    Returns dicts ``{"text": str, "headings": list[str], "kind": str}``
    in document order (the HierarchicalChunker pass)."""
    chunks: list[dict] = []
    # heading stack entries: (level, text); title is level 0
    stack: list[tuple[int, str]] = []
    prev_level = 1
    pending_items: list[str] = []  # consecutive list_item run

    def flush_list() -> None:
        if pending_items:
            chunks.append({"text": "\n".join(pending_items),
                           "headings": [t for _, t in stack],
                           "kind": "list"})
            pending_items.clear()

    i = 0
    n = len(spans)
    while i < n:
        s = spans[i]
        kind = s["kind"]
        text = s["text"] or ""
        if kind == "list_item":
            pending_items.append(text)
            i += 1
            continue
        flush_list()
        if kind in _FURNITURE:
            i += 1
            continue
        if kind == "title":
            stack.clear()
            stack.append((0, text))
            prev_level = 1
        elif kind == "section_header":
            lvl = heading_level(text, prev_level)
            prev_level = lvl
            while stack and stack[-1][0] >= lvl:
                stack.pop()
            stack.append((lvl, text))
        elif kind in ("table", "picture"):
            body = grid_ref_to_text(s["media_ref"] or "") \
                if kind == "table" else ""
            caption = ""
            if i + 1 < n and spans[i + 1]["kind"] == "caption":
                caption = spans[i + 1]["text"] or ""
                i += 1  # caption consumed by this chunk
            text_out = body if body else caption
            if body and caption:
                text_out = caption + "\n" + body
            if text_out:
                chunks.append({"text": text_out,
                               "headings": [t for _, t in stack],
                               "kind": kind})
        elif kind in _LEAF_KINDS or kind == "caption":
            # a stray caption (no preceding table/picture) chunks as text
            if text:
                chunks.append({"text": text,
                               "headings": [t for _, t in stack],
                               "kind": kind})
        # unknown kinds: skipped (furniture-safe default)
        i += 1
    flush_list()
    return chunks


def _split_text(text: str, max_tokens: int) -> list[str]:
    """Split one oversized text: sentence-boundary packing first, then
    hard word windows for any single sentence above the budget."""
    sentences = _SENT_SPLIT_RE.split(text)
    parts: list[str] = []
    cur: list[str] = []
    cur_tok = 0
    for sent in sentences:
        stok = len(tokenize(sent))
        if stok > max_tokens:
            if cur:
                parts.append(" ".join(cur))
                cur, cur_tok = [], 0
            words = sent.split()
            window: list[str] = []
            wtok = 0
            for w in words:
                t = len(tokenize(w))
                if window and wtok + t > max_tokens:
                    parts.append(" ".join(window))
                    window, wtok = [], 0
                window.append(w)
                wtok += t
            if window:
                parts.append(" ".join(window))
            continue
        if cur and cur_tok + stok > max_tokens:
            parts.append(" ".join(cur))
            cur, cur_tok = [], 0
        cur.append(sent)
        cur_tok += stok
    if cur:
        parts.append(" ".join(cur))
    return parts or [text]


def hybrid_chunks(
    spans: list[dict], max_tokens: int = 64, merge_peers: bool = True,
) -> list[dict]:
    """The HybridChunker pass: hierarchical chunks → split oversized →
    merge undersized peers (same heading path, combined within budget).
    Returns ``{"text", "headings", "n_tokens"}`` dicts in order."""
    base = hierarchical_chunks(spans)
    split: list[dict] = []
    for c in base:
        ntok = len(tokenize(c["text"]))
        if ntok <= max_tokens:
            split.append({**c, "n_tokens": ntok})
            continue
        for part in _split_text(c["text"], max_tokens):
            split.append({"text": part, "headings": c["headings"],
                          "kind": c["kind"],
                          "n_tokens": len(tokenize(part))})
    if not merge_peers:
        return [{k: c[k] for k in ("text", "headings", "n_tokens")}
                for c in split]
    merged: list[dict] = []
    for c in split:
        if (
            merged
            and merged[-1]["headings"] == c["headings"]
            and merged[-1]["n_tokens"] + c["n_tokens"] <= max_tokens
        ):
            merged[-1]["text"] += "\n" + c["text"]
            merged[-1]["n_tokens"] += c["n_tokens"]
        else:
            merged.append({"text": c["text"],
                           "headings": list(c["headings"]),
                           "n_tokens": c["n_tokens"]})
    return merged


def contextualize(chunk: dict) -> str:
    """Heading path + text — the embedding-input serialization
    (HybridChunker.contextualize parity)."""
    head = " / ".join(chunk["headings"])
    return f"{head}\n{chunk['text']}" if head else chunk["text"]


def chunk_docs_batch(batch: pa.Table,
                     max_tokens: int | None = None) -> pa.Table:
    """``map_batches`` kernel: extraction output rows (doc_id, spans) →
    chunk rows (doc_id, chunk_idx, text, headings, n_tokens). The token
    budget and peer-merge flag default from the ``chunker`` settings
    kind (driver configure() reaches workers via the shipped snapshot)."""
    from docling_ray.settings import options_for

    opts = options_for("chunker")
    if max_tokens is None:
        max_tokens = int(opts.get("max_tokens", 64))
    merge_peers = bool(opts.get("merge_peers", True))
    doc_ids, idxs, texts, heads, ntoks = [], [], [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for j, c in enumerate(hybrid_chunks(spans or [],
                                            max_tokens=max_tokens,
                                            merge_peers=merge_peers)):
            doc_ids.append(did)
            idxs.append(j)
            texts.append(c["text"])
            heads.append(" / ".join(c["headings"]))
            ntoks.append(c["n_tokens"])
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "chunk_idx": pa.array(idxs, pa.int32()),
        "text": pa.array(texts, pa.string()),
        "headings": pa.array(heads, pa.string()),
        "n_tokens": pa.array(ntoks, pa.int32()),
    })
