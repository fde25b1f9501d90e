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

import numpy as np
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


def curated_corpus(
    docs: "ray.data.Dataset",
    quotas: dict[str, int],
    lm_threshold: int = 33_000,
    lm_min_count: int | None = None,
    lm_vocab_topk: int | None = None,
    lm_bigram_topk: int | None = None,
) -> "ray.data.Dataset":
    """End-to-end curation composite — the full pre-training data
    recipe chained from the repo's already-oracled operators, no
    materialization between stages:

      quality gate → corpus-trained bigram-LM score gate → exact dedup
      (min doc_id per content hash) → domain-mixture sampling.

    The LM trains on the QUALITY-KEPT subset (garbage must not teach
    the model) with the pruned trainer (:func:`lm_train` — min-count +
    top-K caps, so the broadcast model is hard-bounded regardless of
    corpus vocabulary); exact-dedup survivor ids rejoin their source
    column in a tag co-group (Sum(tag) + Max(source) per doc_id — no
    broadcast of corpus-scale id sets, no per-group Python); the final
    mixture cut is the deterministic per-source bottom-quota. Output:
    (doc_id, source, h) ordered by source, h.
    """
    import ray as _ray
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from docling_ray.functions.hashing import content_md5
    from docling_ray.stages.sketches import mixture_sample
    from docling_ray.stages.text_quality import (LM_BIGRAM_TOPK,
                                                 LM_MIN_COUNT,
                                                 LM_VOCAB_TOPK,
                                                 lm_score_texts,
                                                 lm_train,
                                                 quality_batch)

    def kept_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(quality_batch(batch)["keep"])

    q = docs.map_batches(kept_rows, batch_format="pyarrow")

    model_ref = _ray.put(lm_train(
        q, "text",
        LM_MIN_COUNT if lm_min_count is None else lm_min_count,
        LM_VOCAB_TOPK if lm_vocab_topk is None else lm_vocab_topk,
        LM_BIGRAM_TOPK if lm_bigram_topk is None else lm_bigram_topk))

    def lm_gate(batch: pa.Table) -> pa.Table:
        m = _ray.get(model_ref)
        n_bi, ss = lm_score_texts(m, batch["text"].to_pylist())
        keep = (n_bi > 0) & (ss // np.maximum(n_bi, 1) >= lm_threshold)
        return batch.filter(pa.array(keep))

    g = q.map_batches(lm_gate, batch_format="pyarrow")

    def hash_partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "h": pa.array([content_md5(t or "")
                           for t in batch["text"].to_pylist()]),
            "doc_id": batch["doc_id"],
        })

    survivors = g.map_batches(hash_partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Min("doc_id", alias_name="doc_id")) \
        .select_columns(["doc_id"])

    # rejoin source without broadcasting corpus-scale id sets: tag
    # co-group on doc_id (survivor=1, gated row=2 with its source)
    tag_s = survivors.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "tag": pa.array([1] * t.num_rows, pa.int64()),
                            "source": pa.nulls(t.num_rows, pa.string())}),
        batch_format="pyarrow")
    tag_g = g.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "tag": pa.array([2] * t.num_rows, pa.int64()),
                            "source": t["source"]}),
        batch_format="pyarrow")
    merged = tag_s.union(tag_g).groupby("doc_id") \
        .aggregate(Sum("tag", alias_name="tags"),
                   Max("source", alias_name="source"))
    final_in = merged.filter(expr="tags == 3") \
        .select_columns(["doc_id", "source"])
    return mixture_sample(final_in, quotas=quotas)


def extracted_training_corpus(
    corpus: "ray.data.Dataset",
    min_tokens: int = 30,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """The full document→training-data story in one composite: run the
    extraction engine, render each document to markdown, gate on token
    count, exact-dedup the rendered text (min doc_id per content
    survives) — the Docling-convert-then-curate chain a pre-training
    pipeline actually runs, expressed as one streaming Dataset chain
    (extract → export → map → groupby → join; nothing driver-side).

    The DuckDB oracle replays the SAME gate and dedup over the
    generator's expected markdown exports, so this also transitively
    re-verifies the extraction+export path end to end. Output:
    (doc_id, n_tokens) for surviving docs, ordered by doc_id.
    """
    from ray.data.aggregate import Min

    from docling_ray.functions.hashing import content_md5, tokenize
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.stages.export import export_corpus

    md = export_corpus(extract_corpus(corpus, mode="fast"),
                       fmt="markdown")

    def gate(batch: pa.Table) -> pa.Table:
        ids, hs, nt = [], [], []
        for did, content in zip(batch["doc_id"].to_pylist(),
                                batch["content"].to_pylist()):
            n = len(tokenize(content or ""))
            if n >= min_tokens:
                ids.append(did)
                hs.append(content_md5(content or ""))
                nt.append(n)
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "h": pa.array(hs, pa.string()),
            "n_tokens": pa.array(nt, pa.int64()),
        })

    kept = md.map_batches(gate, batch_format="pyarrow").materialize()
    survivors = kept.groupby("h") \
        .aggregate(Min("doc_id", alias_name="doc_id")) \
        .select_columns(["doc_id"]) \
        .repartition(num_partitions).materialize()
    return kept.select_columns(["doc_id", "n_tokens"]) \
        .repartition(num_partitions) \
        .join(survivors, join_type="inner",
              num_partitions=num_partitions, on=("doc_id",))


def web_curated_corpus(
    corpus: "ray.data.Dataset",
    min_tokens: int = 30,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """RefinedWeb-style curation where the LINK GRAPH gates the data:
    extraction → markdown render → token gate → exact dedup
    (:func:`extracted_training_corpus`), then keep only documents whose
    canonical host EARNED PageRank mass (rank strictly above the
    dangling-host base term — i.e. the host has real in-links). The
    graph side reuses the one-pass union kernel
    (webgraph.ranks_and_doc_hosts); the doc→rank attachment and the
    survivor∩ranked intersection are distributed hash joins.

    Output: (doc_id, n_tokens, rank_scaled) ordered by doc_id.
    """
    from docling_ray.stages.webgraph import PR_SCALE, ranks_and_doc_hosts

    surv = extracted_training_corpus(corpus, min_tokens, num_partitions)
    ranks, docs, n_nodes = ranks_and_doc_hosts(corpus, num_partitions)
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64()),
             "rank_scaled": pa.array([], pa.int64())}))
    base = (15 * (PR_SCALE // n_nodes)) // 100

    def earned(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["rank_scaled"], base))

    ranked_docs = docs.join(
        ranks.map_batches(earned, batch_format="pyarrow")
             .repartition(num_partitions).materialize(),
        join_type="inner", num_partitions=num_partitions, on=("host",))
    return surv.join(
        ranked_docs.select_columns(["doc_id", "rank_scaled"])
                   .repartition(num_partitions).materialize(),
        join_type="inner", num_partitions=num_partitions, on=("doc_id",))
