"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes:

  * **exact** — vectorized content-hash column → ``groupby(hash)`` keep-min
    (hash-partition + per-group first). One shuffle of (hash, doc_id) pairs
    only — the text column is dropped before the shuffle.
  * **MinHash+LSH** — shingle → signature per batch (numpy, no shuffle) →
    explode to (band_id, band_hash, doc_id) rows → ``groupby`` over band
    buckets → candidate pairs → exact-Jaccard verification → connected
    components. Candidate pairs are provably sparse (only docs agreeing on
    a full band collide), so verification gathers just the candidate docs'
    texts (broadcast via ``ray.put``) and union-find runs on the driver
    over pairs, not docs — documented scale assumption: #candidate-pairs
    ≪ #docs (holds when thresholds are tuned; if it breaks, verification
    itself shards by pair hash).
  * **SimHash** — 64-bit signature per doc; bucket by each of B bit-bands
    (Hamming-LSH); verify Hamming distance ≤ k within buckets.

Cluster representative = min doc_id (deterministic). Output:
(doc_id, rep_id) for every doc in a duplicate cluster, plus helpers that
return the surviving (deduplicated) id set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from docling_ray.functions.hashing import (
    content_md5,
    hamming64,
    minhash_from_hashes,
    simhash64,
    stable_hash64,
    word_shingles,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    h = pa.array([content_md5(t or "") for t in texts])
    return pa.table({"doc_id": batch["doc_id"], "content_hash": h})


def exact_dedup_survivors(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, text, ...) → survivors (min doc_id per identical text).
    Shuffles only (hash, doc_id)."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow")
    agg = hashed.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_batch(
    batch: pa.Table, *, num_perm: int, n_bands: int, shingle_k: int, text_col: str
) -> pa.Table:
    """doc rows → (band_id, band_hash, doc_id) bucket rows."""
    rows_per_band = num_perm // n_bands
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch[text_col].to_pylist()
    band_ids: list[int] = []
    band_hashes: list[int] = []
    out_docs: list = []
    for did, text in zip(doc_ids, texts):
        sh = word_shingles(text or "", k=shingle_k)
        hashes = np.array([stable_hash64(s) for s in sh], dtype=np.uint64)
        sig = minhash_from_hashes(hashes, num_perm=num_perm)
        for b in range(n_bands):
            band = sig[b * rows_per_band : (b + 1) * rows_per_band]
            band_hashes.append(stable_hash64(band.tobytes()))
            band_ids.append(b)
            out_docs.append(did)
    return pa.table(
        {
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_hashes, type=pa.int64()),
            "doc_id": pa.array(out_docs),
        }
    )


def _bucket_pairs(group) -> pa.Table:
    """map_groups kernel: docs sharing a band bucket → candidate pairs."""
    ids = sorted(group["doc_id"].tolist())
    a, b = [], []
    # cap quadratic blowup on degenerate buckets (hot-key guard): a bucket
    # of n docs yields n-1 chain pairs, enough for connected components
    if len(ids) > 64:
        for x, y in zip(ids, ids[1:]):
            a.append(x)
            b.append(y)
    else:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def _jaccard(sa: set, sb: set) -> float:
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent.get(p, p):
            self.parent[p] = self.parent.get(self.parent[p], self.parent[p])
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if str(ry) < str(rx):
            rx, ry = ry, rx
        self.parent[ry] = rx


def minhash_lsh_clusters(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
) -> pa.Table:
    """Near-duplicate clusters. Returns a small table (doc_id, rep_id) of
    docs that belong to a duplicate cluster (rep included)."""
    buckets = ds.map_batches(
        _minhash_batch,
        batch_format="pyarrow",
        fn_kwargs={
            "num_perm": num_perm,
            "n_bands": n_bands,
            "shingle_k": shingle_k,
            "text_col": text_col,
        },
    )
    pairs_ds = buckets.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    pairs = {(r["a"], r["b"]) for r in pairs_ds.to_pandas().to_dict("records")}
    if not pairs:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "rep_id": pa.array([], type=pa.int64())})
    cand_ids = sorted({x for p in pairs for x in p})
    cand_set_ref = ray.put(set(cand_ids))

    def keep_candidates(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_set_ref)
        mask = pa.array([d in cand for d in batch["doc_id"].to_pylist()])
        return batch.select(["doc_id", text_col]).filter(mask)

    cand_tbl = ds.map_batches(keep_candidates, batch_format="pyarrow").to_pandas()
    shingles = {
        r["doc_id"]: word_shingles(r[text_col] or "", k=shingle_k)
        for r in cand_tbl.to_dict("records")
    }
    uf = _UnionFind()
    for a, b in sorted(pairs):
        if a in shingles and b in shingles:
            if _jaccard(shingles[a], shingles[b]) >= threshold:
                uf.union(a, b)
    clusters: dict = {}
    for d in uf.parent:
        clusters.setdefault(uf.find(d), []).append(d)
    doc_ids, reps = [], []
    for rep, members in sorted(clusters.items(), key=lambda kv: str(kv[0])):
        if len(members) < 2:
            continue
        rep_id = min(members)
        for m in sorted(members):
            doc_ids.append(m)
            reps.append(rep_id)
    return pa.table({"doc_id": pa.array(doc_ids), "rep_id": pa.array(reps)})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_batch(batch: pa.Table, *, n_bands: int, text_col: str) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch[text_col].to_pylist()
    band_bits = 64 // n_bands
    band_ids, band_vals, sigs, out_docs = [], [], [], []
    for did, t in zip(doc_ids, texts):
        sig = simhash64(t or "")
        for b in range(n_bands):
            band_ids.append(b)
            band_vals.append((sig >> (b * band_bits)) & ((1 << band_bits) - 1))
            sigs.append(np.int64(np.uint64(sig).astype(np.int64)))
            out_docs.append(did)
    return pa.table(
        {
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_vals, type=pa.int64()),
            "sig": pa.array(sigs, type=pa.int64()),
            "doc_id": pa.array(out_docs),
        }
    )


def simhash_clusters(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    n_bands: int = 4,
    text_col: str = "text",
) -> pa.Table:
    """SimHash near-dup clusters: band-bucket candidates, Hamming-verified."""
    buckets = ds.map_batches(
        _simhash_batch, batch_format="pyarrow",
        fn_kwargs={"n_bands": n_bands, "text_col": text_col},
    )

    def bucket_pairs(group) -> pa.Table:
        rows = sorted(zip(group["doc_id"].tolist(), group["sig"].tolist()))
        a, b = [], []
        n = len(rows)
        if n > 64:
            rows = rows[:64]
            n = 64
        for i in range(n):
            for j in range(i + 1, n):
                ha = int(np.uint64(np.int64(rows[i][1])))
                hb = int(np.uint64(np.int64(rows[j][1])))
                if hamming64(ha, hb) <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    pairs_df = (
        buckets.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    uf = _UnionFind()
    for r in pairs_df.itertuples(index=False):
        uf.union(r.a, r.b)
    clusters: dict = {}
    for d in uf.parent:
        clusters.setdefault(uf.find(d), []).append(d)
    doc_ids, reps = [], []
    for rep, members in sorted(clusters.items(), key=lambda kv: str(kv[0])):
        if len(members) < 2:
            continue
        rep_id = min(members)
        for m in sorted(members):
            doc_ids.append(m)
            reps.append(rep_id)
    return pa.table({"doc_id": pa.array(doc_ids), "rep_id": pa.array(reps)})
