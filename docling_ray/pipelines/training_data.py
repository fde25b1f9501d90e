"""The composite LLM training-data pipeline: quality filter → exact
dedup → near-dup dedup → surviving corpus.

The flagship composition of the training-data operators (the thing a
100 TB pretraining-corpus run actually executes): C4/Gopher-style
quality gates drop junk documents, exact dedup keeps one copy per
identical text, MinHash near-dup clustering drops every cluster member
except its representative. Everything stays distributed:

  * the three decision streams (kept ids, exact-dedup survivors,
    near-dup drops) are combined by ONE keyed co-group over doc ids —
    8-byte rows, never text;
  * near-dup clustering runs only over quality-kept documents (junk
    never reaches the shingle stage);
  * the result is the survivor id set, streamable into a pruned join /
    write of the full corpus.

Oracle: the whole pipeline is SQL-expressible by composing the quality,
exact-dedup and recursive-CTE cluster oracles over the same tables —
hash-checked end-to-end by the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def training_corpus_survivors(
    docs: "ray.data.Dataset",
    minhash_threshold: float = 0.8,
) -> "ray.data.Dataset":
    """(doc_id, text) Dataset → surviving doc_id Dataset (sorted)."""
    from docling_ray.stages.dedup import (
        exact_dedup_survivors,
        minhash_lsh_clusters,
    )
    from docling_ray.stages.text_quality import quality_batch

    def kept_rows(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        mask = q["keep"]
        return batch.filter(mask)

    # kept is consumed by three downstream streams (exact dedup, near-dup
    # clustering, id tagging) — materialize once; at warehouse scale write
    # it to parquet instead and read it back pruned (same shape, storage-
    # backed instead of object-store-backed)
    kept = docs.map_batches(kept_rows, batch_format="pyarrow").materialize()

    exact = exact_dedup_survivors(kept)
    clusters = minhash_lsh_clusters(kept, threshold=minhash_threshold)
    drops = clusters.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["doc_id"], t["rep_id"])))
                   .select(["doc_id"]),
        batch_format="pyarrow",
    )

    # one keyed co-group over ids: keep iff quality-kept AND exact-survivor
    # AND not a dropped near-dup member (tags: 1=kept, 2=exact, 4=drop)
    def tag(ds: "ray.data.Dataset", bit: int) -> "ray.data.Dataset":
        return ds.map_batches(
            lambda t, b=bit: pa.table({
                "doc_id": t["doc_id"],
                "tag": pa.array([b] * t.num_rows, pa.int64()),
            }),
            batch_format="pyarrow",
        )

    from ray.data.aggregate import Sum

    tagged = tag(kept.select_columns(["doc_id"]), 1) \
        .union(tag(exact, 2)) \
        .union(tag(drops, 4))
    agg = tagged.groupby("doc_id").aggregate(Sum("tag", alias_name="tags"))
    return agg.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["tags"], 7), 3))
                   .select(["doc_id"]),
        batch_format="pyarrow",
    ).sort("doc_id")
