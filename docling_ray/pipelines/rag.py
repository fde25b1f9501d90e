"""RAG-ingestion composite pipeline: extraction → structure-aware
chunking → contextualized embedding → similarity retrieval.

The end-to-end path an LLM retrieval corpus needs from raw documents
(the reference stops at extraction + chunking; the embedding/retrieval
half is this engine's training-data extension). Every stage is the
already-oracled operator composed, so the pipeline itself is
oracle-checkable end to end:

  extract_corpus → hybrid_chunks (heading-aware, token-budgeted)
  → contextualize (heading path + text, the HybridChunker embedding
  serialization) → feature-hash embedding → per-batch partial top-k
  → one small final sort (the ann_brute_topk prune pattern).

The embedding is a deterministic signed feature-hash projection
(hash-bucketed token counts with a hash-bit sign, L2-normalized) — the
classic "hashing trick" text embedding: real vector math, no model
download, reproducible bit-for-bit on any machine (which is what lets
the DuckDB-side oracle recompute the retrieval exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_ray.functions.hashing import stable_hash64, tokenize

EMBED_DIM = 64


def embed_text(text: str) -> np.ndarray:
    """Deterministic feature-hash embedding: each token adds ±1 to one
    of EMBED_DIM buckets (bucket = hash % dim, sign = next hash bit),
    then L2 normalization. Empty/stopword-free text embeds to zeros."""
    vec = np.zeros(EMBED_DIM, dtype=np.float64)
    for tok in tokenize(text):
        h = stable_hash64(tok)
        vec[h % EMBED_DIM] += 1.0 if (h >> 7) & 1 else -1.0
    n = float(np.sqrt((vec * vec).sum()))
    if n > 0.0:
        vec /= n
    return vec


def rag_query_vector() -> np.ndarray:
    """The demo retrieval query (fixed, embedded like any chunk)."""
    return embed_text("data engine ray arrow stream pipeline")


def chunk_embeddings_batch(batch: pa.Table) -> pa.Table:
    """Chunk rows (doc_id, chunk_idx, text, headings, ...) → embedding
    rows; the embedded string is the CONTEXTUALIZED form (heading path +
    text), HybridChunker.contextualize parity."""
    doc_ids = batch["doc_id"].to_pylist()
    idxs = batch["chunk_idx"].to_pylist()
    texts = batch["text"].to_pylist()
    heads = batch["headings"].to_pylist()
    embs = np.empty((len(texts), EMBED_DIM), dtype=np.float64)
    for i, (t, hd) in enumerate(zip(texts, heads)):
        ctx = f"{hd}\n{t}" if hd else t
        embs[i] = embed_text(ctx)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "chunk_idx": pa.array(idxs, pa.int32()),
        "embedding": pa.array(list(embs), pa.list_(pa.float64())),
    })


def topk_chunks(emb_ds, query: np.ndarray, k: int = 20):
    """Brute-force cosine top-k over chunk embeddings: per-batch partial
    top-k (k rows leave each batch) then one small final sort — no full
    shuffle of the embedding set."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch["embedding"].combine_chunks()
        flat = arr.values.to_numpy(zero_copy_only=False)
        mat = flat.reshape(-1, EMBED_DIM)
        sims = mat @ query
        sim_e6 = np.floor(sims * 1_000_000.0).astype(np.int64)
        if len(sim_e6) > k:
            # keep every row tied with the k-th score so the global sort
            # (with its deterministic doc/chunk tie-break) sees all
            # candidates — a plain per-batch cut could drop a tied row
            # the tie-break would have ranked inside the top k
            kth = np.partition(sim_e6, -k)[-k]
            keep = np.flatnonzero(sim_e6 >= kth)
        else:
            keep = np.arange(len(sim_e6))
        idx = pa.array(keep)
        return pa.table({
            "doc_id": batch["doc_id"].take(idx),
            "chunk_idx": batch["chunk_idx"].take(idx),
            "sim_e6": pa.array(sim_e6[keep]),
        })

    partials = emb_ds.map_batches(partial, batch_format="pyarrow")
    return partials.sort(
        ["sim_e6", "doc_id", "chunk_idx"],
        descending=[True, False, False]).limit(k)


def rag_corpus_topk(sf_dir: str, seed: int = 42, k: int = 20):
    """The composite: corpus → extract → hybrid chunks → contextualized
    feature-hash embeddings → cosine top-k for the demo query."""
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.chunker import chunk_docs_batch

    corpus = derive_corpus(sf_dir, seed=seed)
    extracted = extract_corpus(corpus, mode="fast")
    chunks = extracted.map_batches(chunk_docs_batch, batch_format="pyarrow")
    embs = chunks.map_batches(chunk_embeddings_batch, batch_format="pyarrow")
    return topk_chunks(embs, rag_query_vector(), k=k)
