"""RAG composite pipeline tests (pipelines/rag.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_ray.pipelines.rag import (
    EMBED_DIM,
    chunk_embeddings_batch,
    embed_text,
    topk_chunks,
)


def test_embed_deterministic_and_normalized():
    a = embed_text("ray data engine")
    b = embed_text("ray data engine")
    assert np.array_equal(a, b)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-12
    assert embed_text("").tolist() == [0.0] * EMBED_DIM


def test_embed_similarity_orders_sensibly():
    q = embed_text("ray data engine stream")
    close = embed_text("the ray data engine processes a stream")
    far = embed_text("completely unrelated zebra xylophone words")
    assert float(close @ q) > float(far @ q)


def test_chunk_embeddings_contextualize():
    batch = pa.table({
        "doc_id": ["d1", "d1"],
        "chunk_idx": pa.array([0, 1], pa.int32()),
        "text": ["same text", "same text"],
        "headings": ["Heading A", ""],
        "n_tokens": pa.array([2, 2], pa.int32()),
    })
    out = chunk_embeddings_batch(batch)
    e0 = np.array(out["embedding"][0].as_py())
    e1 = np.array(out["embedding"][1].as_py())
    # heading path participates in the embedded string
    assert not np.array_equal(e0, e1)


def test_topk_keeps_boundary_ties(ray_session):
    import ray

    # 5 identical embeddings → identical sims; k=3 must resolve by the
    # deterministic (doc_id, chunk_idx) tie-break, never by batch luck
    v = embed_text("tie tie tie")
    rows = pa.table({
        "doc_id": [f"d{i}" for i in range(5)],
        "chunk_idx": pa.array([0] * 5, pa.int32()),
        "embedding": pa.array([list(v)] * 5, pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(rows).repartition(3)
    out = topk_chunks(ds, v, k=3).to_pandas()
    assert out["doc_id"].tolist() == ["d0", "d1", "d2"]
