"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes, distributed END-TO-END (no driver-side pair/text
materialization, no silent caps — every stage is proportional to its own
data, the driver holds only fixed-size Bloom bitmaps and scalar
convergence sums):

  * **exact** — vectorized content-hash column → ``groupby(hash)`` keep-min
    (hash-partition + per-group first). One shuffle of (hash, doc_id) pairs
    only — the text column is dropped before the shuffle.
  * **MinHash+LSH** — shingle → signature per batch (numpy, no shuffle) →
    (bucket_key, doc_id) band-bucket rows → hot-bucket pre-count (a
    vectorized ``groupby().count()`` so only buckets with ≥2 docs ever
    reach a per-group Python kernel; singleton buckets — the overwhelming
    majority — never do) → candidate pairs → **distributed exact-Jaccard
    verification** (candidate docs' shingle-hash arrays attached to pairs
    via two keyed co-group shuffles; texts/shingles never visit the
    driver) → **distributed connected components** (iterated min-label
    propagation over the edge Dataset).
  * **SimHash** — 64-bit signature; bucket by each of B bit-bands
    (Hamming-LSH, recall is exact by pigeonhole: ≤k differing bits across
    B>k bands leave ≥1 band identical); Hamming-verify inside the bucket
    group (signatures ride along — no text join needed) → distributed CC.
  * **n-gram Jaccard pairs** — the exact near-dup-pair operator: same
    LSH candidate generation at high-recall parameters + exact verify,
    returning (a, b, j_ppm). SQL-expressible, oracle-checked.

Scale notes (10^12 docs): bucket/signature tables are materialized once
(they are ~50-100× smaller than the corpus: two int64s per band-row, no
text) — pass ``persist_dir`` to spill them to parquet instead of the
object store. Semi-joins against derived sets (hot bucket keys, candidate
doc ids) use fixed-size Bloom bitmaps (``state/bloom.py``) — false
positives only admit extra rows into exact verification. Degenerate
buckets above ``max_allpairs`` fall back to chain pairs (n-1 edges keep
connectivity for clustering) and LOG the event — never a silent drop.

Cluster representative = min doc_id (deterministic). Output:
(doc_id, rep_id) for every doc in a duplicate cluster (rep included).
Reference parity anchor: the reference engine has no dedup subsystem
(SURVEY.md §4) — semantics defined here, oracle-checked against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min

from docling_ray.functions.hashing import (
    content_md5,
    minhash_from_hashes,
    simhash64,
    stable_hash64,
    word_shingles,
)
from docling_ray.state.bloom import bloom_from_column, filter_by_bloom

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


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
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow")
    agg = hashed.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# shared machinery
# ---------------------------------------------------------------------------

# per-process shingle-hash cache: natural-language corpora repeat
# shingles heavily (Zipf), so memoizing blake2b per distinct shingle cuts
# the dominant signature-stage cost; bounded to keep worker heaps sane
_SHINGLE_CACHE: dict[str, int] = {}
_SHINGLE_CACHE_MAX = 1 << 20


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Sorted unique int64 views of the 64-bit shingle hashes (the set used
    for both MinHash signatures and exact-Jaccard verification)."""
    sh = word_shingles(text or "", k=k)
    if not sh:
        return np.empty(0, dtype=np.int64)
    cache = _SHINGLE_CACHE
    if len(cache) > _SHINGLE_CACHE_MAX:
        cache.clear()
    vals = []
    for s in sh:
        h = cache.get(s)
        if h is None:
            h = stable_hash64(s)
            cache[s] = h
        vals.append(h)
    arr = np.array(vals, dtype=np.uint64)
    return np.unique(arr.view(np.int64))


def _mix_keys(band_hash: np.ndarray, band_id: np.ndarray) -> np.ndarray:
    """(band_hash, band_id) → one int64 bucket key (vectorized). A key
    collision merely merges two buckets — extra candidates, verified away."""
    with np.errstate(over="ignore"):
        mixed = (band_hash.astype(np.int64).view(np.uint64)
                 + _GOLDEN * (band_id.astype(np.uint64) + np.uint64(1)))
        mixed ^= mixed >> np.uint64(29)
    return mixed.view(np.int64)


def _hot_bucket_rows(
    buckets: "ray.data.Dataset", m_bits: int = 1 << 23,
) -> "ray.data.Dataset":
    """Keep only bucket rows whose bucket_key holds ≥2 docs: vectorized
    count shuffle → Bloom over hot keys → broadcast filter. ``buckets``
    must be materialized/stored by the caller (it is consumed twice)."""
    counts = buckets.groupby("bucket_key").aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], 2)).select(["bucket_key"]),
        batch_format="pyarrow",
    )
    bloom = bloom_from_column(hot, "bucket_key", m_bits=m_bits)
    return filter_by_bloom(buckets, "bucket_key", bloom)


def _distinct_pairs(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Dedupe (a, b) candidate edges (each pair collides in up to n_bands
    buckets) — one vectorized count shuffle, no per-group Python."""
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n")) \
                .select_columns(["a", "b"])


def _bucket_pairs_kernel(
    group: pa.Table, max_allpairs: int, on_overflow: str = "chain",
    hard_cap: int = 4096,
) -> pa.Table:
    """One ≥2-doc bucket → candidate pairs. Above ``max_allpairs`` docs the
    quadratic blowup is handled per ``on_overflow``:

    * ``"chain"`` (clustering path): n-1 chain pairs over sorted ids —
      connectivity preserved, logged. Incomplete as a PAIRS answer but
      exactly right for connected components.
    * ``"full"`` (pairs path, whose contract is every pair): all pairs up
      to ``hard_cap`` docs (bounded: hard_cap²/2 int64 pairs per bucket),
      logged; beyond that the bucket is quadratically degenerate and the
      kernel raises rather than silently under-reporting — the caller
      should use the clustering operator on such a corpus."""
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
    n = len(ids)
    if n < 2:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    if n > max_allpairs:
        if on_overflow == "chain":
            print(f"[dedup] bucket {group['bucket_key'][0]} has {n} docs "
                  f"> max_allpairs={max_allpairs}: chain-pair fallback "
                  f"({n - 1} edges instead of {n * (n - 1) // 2})")
            return pa.table({"a": pa.array(ids[:-1]), "b": pa.array(ids[1:])})
        if n > hard_cap:
            raise ValueError(
                f"bucket {group['bucket_key'][0]} has {n} docs > "
                f"hard_cap={hard_cap}: the exact-pairs output would be "
                f"quadratically degenerate ({n * (n - 1) // 2} pairs); "
                f"use the clustering operator for this corpus")
        print(f"[dedup] bucket {group['bucket_key'][0]} has {n} docs "
              f"> max_allpairs={max_allpairs}: emitting all "
              f"{n * (n - 1) // 2} pairs (pairs-contract completeness)")
    ia, ib = np.triu_indices(n, k=1)
    return pa.table({"a": pa.array(ids[ia]), "b": pa.array(ids[ib])})


def connected_components(
    edges: "ray.data.Dataset", max_rounds: int = 64,
) -> "ray.data.Dataset":
    """(a, b) edge Dataset → (doc_id, rep_id) component labels, rep = min
    member id. Iterated min-label propagation: each round every node takes
    the min label over itself and its neighbors (two small shuffles over
    the edge-scale data); the driver sees only the scalar label sum, which
    strictly decreases until the fixed point. Rounds ≈ component diameter
    (near-dup clusters are cliques/stars → 1-3 rounds)."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "rep_id": pa.array([], pa.int64())}))
    # Edge-scale data is tiny relative to the corpus; size the block count
    # to the data so each propagation round pays a handful of tasks, not
    # (cpus × rounds) fixed overheads. Grows with the edge set at scale.
    n_blocks = max(1, n_edges // 65536)
    edges = edges.repartition(n_blocks).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        m = np.minimum(a, b)
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "label": pa.array(np.concatenate([m, m]))})

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
                  .groupby("node").aggregate(Min("label", alias_name="label")) \
                  .repartition(n_blocks).materialize()

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(np.concatenate([a, b])),
                         "nbr": pa.array(np.concatenate([b, a]))})

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("label")

    # Each round: new_label[v] = min(label[v], min_{u∈N(v)} label[u]).
    # Expressed as two vectorized all-to-all steps — a hash join attaching
    # label[key] to every (key, nbr) edge, then a min-groupby over the
    # receiving endpoint — no per-group Python kernel anywhere (each round
    # used to be one `map_groups` Python call per node; at 10^9 duplicate
    # nodes that is the slowest possible shape for what is algebraically
    # two joins).
    def nbr_to_node(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["nbr"], "label": t["label"]})

    for _ in range(max_rounds):
        joined = sym_edges.join(
            labels, join_type="inner", num_partitions=n_blocks,
            on=("key",), right_on=("node",))
        nbr_min = joined.select_columns(["nbr", "label"]) \
                        .groupby("nbr") \
                        .aggregate(Min("label", alias_name="label")) \
                        .map_batches(nbr_to_node, batch_format="pyarrow")
        labels = labels.union(nbr_min).groupby("node").aggregate(
            Min("label", alias_name="label")).repartition(n_blocks) \
            .materialize()
        cur = labels.sum("label")
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        print(f"[dedup] connected_components: not converged after "
              f"{max_rounds} rounds (pathological component diameter); "
              f"labels are a refinement (over-segmented), not wrong-merged")

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "rep_id": t["label"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_buckets_batch(
    batch: pa.Table, *, num_perm: int, n_bands: int, shingle_k: int,
    text_col: str,
) -> pa.Table:
    """doc rows → (bucket_key, doc_id) band-bucket rows."""
    rows_per_band = num_perm // n_bands
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    band_hashes = np.empty(len(texts) * n_bands, dtype=np.int64)
    for i, text in enumerate(texts):
        hashes = _shingle_hashes(text, shingle_k).view(np.uint64)
        sig = minhash_from_hashes(hashes, num_perm=num_perm)
        for b in range(n_bands):
            band = sig[b * rows_per_band : (b + 1) * rows_per_band]
            band_hashes[i * n_bands + b] = stable_hash64(band.tobytes())
    band_ids = np.tile(np.arange(n_bands, dtype=np.int64), len(texts))
    return pa.table({
        "bucket_key": pa.array(_mix_keys(band_hashes, band_ids)),
        "doc_id": pa.array(np.repeat(doc_ids, n_bands)),
    })


_SH_LIST = pa.list_(pa.int64())


def _candidate_shingles(
    ds: "ray.data.Dataset", pairs: "ray.data.Dataset", *, shingle_k: int,
    text_col: str, m_bits: int,
) -> "ray.data.Dataset":
    """(doc_id, sh) shingle-hash rows for (a superset of) the docs named in
    ``pairs`` — Bloom semi-join, then one pruned scan of the corpus."""
    ids = pairs.map_batches(
        lambda t: pa.table({"doc_id": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])}),
        batch_format="pyarrow",
    )
    bloom = bloom_from_column(ids, "doc_id", m_bits=m_bits)
    cand = filter_by_bloom(ds.select_columns(["doc_id", text_col]),
                           "doc_id", bloom)

    def to_shingles(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "sh": pa.array([_shingle_hashes(t, shingle_k) for t in texts],
                           type=_SH_LIST),
        })

    return cand.map_batches(to_shingles, batch_format="pyarrow")


def _jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    if union == 0:
        return 1.0  # both shingle sets empty → identical (degenerate docs)
    return inter / union


def jaccard_verified_pairs(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    threshold: float,
    shingle_k: int = 3,
    text_col: str = "text",
    m_bits: int = 1 << 23,
    emit_j: bool = True,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate (a, b) pairs, distributed:
    shingle arrays are attached to each pair via two keyed co-group
    shuffles (key = doc id), and the Jaccard test runs inside the second
    group kernel. Nothing data-proportional reaches the driver. Returns
    (a, b, j_ppm) for pairs at or above ``threshold``."""
    shingles = _candidate_shingles(
        ds, pairs, shingle_k=shingle_k, text_col=text_col, m_bits=m_bits,
    ).materialize()  # candidate-scale, consumed by both attach stages

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["a"], "a": t["a"], "b": t["b"],
                         "sh": pa.nulls(t.num_rows, _SH_LIST)})

    def doc_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["doc_id"],
                         "a": pa.nulls(t.num_rows, pa.int64()),
                         "b": pa.nulls(t.num_rows, pa.int64()),
                         "sh": t["sh"]})

    def attach_a(group: pa.Table) -> pa.Table:
        is_doc = pc.is_null(group["a"])
        doc = group.filter(is_doc)
        prs = group.filter(pc.invert(is_doc))
        if doc.num_rows == 0 or prs.num_rows == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sh_a": pa.array([], _SH_LIST)})
        # replicate the doc's shingle array per pair without materializing
        # python lists: tile the values buffer, rebuild list offsets
        sh_arr = doc["sh"].combine_chunks()
        vals = sh_arr.values.to_numpy(zero_copy_only=False)[
            sh_arr.offsets[0].as_py() : sh_arr.offsets[1].as_py()]
        n = prs.num_rows
        offsets = np.arange(n + 1, dtype=np.int32) * len(vals)
        rep = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       pa.array(np.tile(vals, n)))
        return pa.table({"key": prs["b"], "a": prs["a"], "b": prs["b"],
                         "sh_a": rep})

    half = pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        shingles.map_batches(doc_rows, batch_format="pyarrow")
    ).groupby("key").map_groups(attach_a, batch_format="pyarrow")

    def doc_rows2(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["doc_id"],
                         "a": pa.nulls(t.num_rows, pa.int64()),
                         "b": pa.nulls(t.num_rows, pa.int64()),
                         "sh_a": t["sh"]})

    thr = threshold

    def verify(group: pa.Table) -> pa.Table:
        is_doc = pc.is_null(group["a"])
        doc = group.filter(is_doc)
        prs = group.filter(pc.invert(is_doc))
        out_a, out_b, out_j = [], [], []
        if doc.num_rows and prs.num_rows:
            doc_sh = doc["sh_a"].combine_chunks()
            sh_b = doc_sh.values.to_numpy(zero_copy_only=False)[
                doc_sh.offsets[0].as_py() : doc_sh.offsets[1].as_py()]
            pair_sh = prs["sh_a"].combine_chunks()
            offs = pair_sh.offsets.to_numpy(zero_copy_only=False)
            vals = pair_sh.values.to_numpy(zero_copy_only=False)
            a_ids = prs["a"].to_numpy(zero_copy_only=False)
            b_ids = prs["b"].to_numpy(zero_copy_only=False)
            for i in range(prs.num_rows):
                sh_a = vals[offs[i] : offs[i + 1]]
                j = _jaccard(sh_a, sh_b)
                if j >= thr:
                    out_a.append(a_ids[i])
                    out_b.append(b_ids[i])
                    out_j.append(int(np.floor(j * 1_000_000.0)))
        if not emit_j:
            # clusters path consumes only the edge — emitting (a, b)
            # directly keeps every output bundle on one schema (no
            # downstream projection, no executor schema-drift warning)
            return pa.table({"a": pa.array(out_a, pa.int64()),
                             "b": pa.array(out_b, pa.int64())})
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "j_ppm": pa.array(out_j, pa.int64())})

    return half.union(
        shingles.map_batches(doc_rows2, batch_format="pyarrow")
    ).groupby("key").map_groups(verify, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    n_bands: int = 21,
    shingle_k: int = 3,
    text_col: str = "text",
    max_allpairs: int = 256,
    m_bits: int = 1 << 23,
    on_overflow: str = "chain",
) -> "ray.data.Dataset":
    """LSH candidate (a, b) pairs, deduped. Defaults are high-recall
    (rows-per-band 3: a true 0.8-Jaccard pair escapes all 21 bands with
    probability (1-0.8³)²¹ ≈ 3e-7), trading extra candidates — which the
    exact verifier removes — for near-certain recall. ``on_overflow``
    picks the degenerate-bucket policy (see _bucket_pairs_kernel)."""
    buckets = ds.map_batches(
        _minhash_buckets_batch, batch_format="pyarrow",
        fn_kwargs={"num_perm": num_perm, "n_bands": n_bands,
                   "shingle_k": shingle_k, "text_col": text_col},
    ).materialize()  # 2 int64s per band-row; persist to parquet at PB scale
    hot = _hot_bucket_rows(buckets, m_bits=m_bits)
    pairs = hot.groupby("bucket_key").map_groups(
        lambda g: _bucket_pairs_kernel(g, max_allpairs, on_overflow),
        batch_format="pyarrow",
    )
    return _distinct_pairs(pairs)


def jaccard_neardup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 64,
    n_bands: int = 21,
    shingle_k: int = 3,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Exact n-gram-Jaccard near-duplicate pairs (a < b, j_ppm), computed
    as LSH candidates + exact distributed verification. Oracle-checkable:
    equals the brute-force shingle-Jaccard self-join at/above threshold
    (recall argument in minhash_candidate_pairs). Degenerate buckets emit
    ALL their pairs (``on_overflow="full"``) — the pairs contract is
    completeness; the n-1 chain shortcut stays clustering-only."""
    pairs = minhash_candidate_pairs(
        ds, num_perm=num_perm, n_bands=n_bands, shingle_k=shingle_k,
        text_col=text_col, on_overflow="full",
    ).materialize()
    return jaccard_verified_pairs(
        ds, pairs, threshold, shingle_k=shingle_k, text_col=text_col,
    ).sort(["a", "b"])


def minhash_lsh_clusters(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 64,
    n_bands: int = 21,
    shingle_k: int = 3,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Near-duplicate clusters (doc_id, rep_id), distributed end-to-end:
    LSH candidates → exact-Jaccard verify (co-group joins) → connected
    components (min-label propagation). Docs in no ≥2 cluster are absent."""
    pairs = minhash_candidate_pairs(
        ds, num_perm=num_perm, n_bands=n_bands, shingle_k=shingle_k,
        text_col=text_col,
    ).materialize()
    edges = jaccard_verified_pairs(
        ds, pairs, threshold, shingle_k=shingle_k, text_col=text_col,
        emit_j=False,
    )
    return connected_components(edges).sort("doc_id")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_buckets_batch(
    batch: pa.Table, *, n_bands: int, text_col: str
) -> pa.Table:
    """doc rows → (bucket_key, sig, doc_id) band rows. The signature rides
    along so Hamming verification happens inside the bucket group — no
    second join."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    band_bits = 64 // n_bands
    mask = np.uint64((1 << band_bits) - 1)
    sigs = np.fromiter((simhash64(t or "") for t in texts), dtype=np.uint64,
                       count=len(texts))
    band_ids = np.tile(np.arange(n_bands, dtype=np.uint64), len(texts))
    rep = np.repeat(sigs, n_bands)
    band_vals = ((rep >> (band_ids * np.uint64(band_bits))) & mask)
    return pa.table({
        "bucket_key": pa.array(_mix_keys(band_vals.view(np.int64),
                                         band_ids.astype(np.int64))),
        "sig": pa.array(rep.view(np.int64)),
        "doc_id": pa.array(np.repeat(doc_ids, n_bands)),
    })


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — no per-element Python."""
    x = x.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        return ((x * h) >> np.uint64(56)).astype(np.int64)


def simhash_clusters(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    n_bands: int = 4,
    text_col: str = "text",
    max_allpairs: int = 16384,
) -> "ray.data.Dataset":
    """SimHash near-dup clusters, distributed end-to-end. Recall is exact:
    a pair within Hamming ``k < n_bands`` differs in ≤k bands, so ≥1 band
    matches (pigeonhole) and the pair is generated; Hamming verification
    inside the bucket kernel is exact, and connected components run
    distributed. Output = clusters over ALL pairs with Hamming ≤ k.

    Hamming verification is a vectorized xor+popcount, so the all-pairs
    path is cheap and runs CHUNKED (bounded memory) up to
    ``max_allpairs`` docs per bucket — a 291-doc degenerate bucket at
    sf0.1 used to hit the 256 chain fallback and LOSE qualifying pairs
    (under-clustering vs the oracle); now only truly pathological
    buckets (> 16 k docs sharing one 16-bit band) chain, logged."""
    buckets = ds.map_batches(
        _simhash_buckets_batch, batch_format="pyarrow",
        fn_kwargs={"n_bands": n_bands, "text_col": text_col},
    ).materialize()
    hot = _hot_bucket_rows(buckets)

    def bucket_verified_pairs(group: pa.Table) -> pa.Table:
        ids_all = group["doc_id"].to_numpy(zero_copy_only=False)
        sigs_all = group["sig"].to_numpy(zero_copy_only=False)
        ids, idx = np.unique(ids_all, return_index=True)
        sigs = sigs_all[idx].view(np.uint64)
        n = len(ids)
        if n < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        if n > max_allpairs:
            print(f"[dedup] simhash bucket {group['bucket_key'][0]} has "
                  f"{n} docs > max_allpairs={max_allpairs}: chain-pair "
                  f"fallback over sig-sorted order")
            order = np.argsort(sigs, kind="stable")
            ids, sigs = ids[order], sigs[order]
            x = sigs[:-1] ^ sigs[1:]
            keep = _popcount64(x) <= max_hamming
            a, b = ids[:-1][keep], ids[1:][keep]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pa.table({"a": pa.array(lo), "b": pa.array(hi)})
        # chunked all-pairs: CH×n xor matrix per block (bounded memory)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        ch = max(1, min(n, (1 << 22) // max(n, 1)))  # ≤ ~32 MB per block
        jj = np.arange(n)
        for s0 in range(0, n - 1, ch):
            i_idx = np.arange(s0, min(s0 + ch, n))
            x = sigs[i_idx][:, None] ^ sigs[None, :]
            mask = (_popcount64(x) <= max_hamming) \
                & (jj[None, :] > i_idx[:, None])
            ii, js = np.nonzero(mask)
            if len(ii):
                out_a.append(ids[i_idx[ii]])
                out_b.append(ids[js])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi)})

    pairs = hot.groupby("bucket_key").map_groups(
        bucket_verified_pairs, batch_format="pyarrow")
    edges = _distinct_pairs(pairs)
    return connected_components(edges).sort("doc_id")


# ---------------------------------------------------------------------------
# corpus-level line dedup (RefinedWeb / CCNet paragraph dedup analogue)
# ---------------------------------------------------------------------------

def _doc_lines(text: str, words_per_line: int) -> list[str]:
    """Deterministic line segmentation: the corpus is single-line synthetic
    text, so a 'line' is a fixed run of ``words_per_line`` space-separated
    words (the last line may be short). Mirrored exactly by the SQL
    oracle's ``words[(i*w+1):(i*w+w)]`` slices."""
    words = [w for w in (text or "").split(" ") if w]
    w = words_per_line
    return [" ".join(words[i: i + w]) for i in range(0, len(words), w)]


def _line_df_partial(batch: pa.Table, words_per_line: int,
                     text_col: str) -> pa.Table:
    """Per-batch partial document-frequency of each DISTINCT-per-doc line:
    emits (line_hash, ndocs) pre-aggregated within the batch so the
    ``groupby`` shuffle moves one row per (line, batch), never per
    occurrence. Hashes (not raw lines) ride the shuffle — 8 bytes/row."""
    from collections import Counter

    cnt: Counter = Counter()
    for t in batch[text_col].to_pylist():
        for line in set(_doc_lines(t, words_per_line)):
            cnt[stable_hash64(line)] += 1
    items = sorted(cnt.items())
    return pa.table({
        "line_hash": pa.array([k for k, _ in items], pa.int64()),
        "ndocs": pa.array([v for _, v in items], pa.int64()),
    })


def line_dedup(
    ds: "ray.data.Dataset",
    words_per_line: int = 3,
    min_docs: int = 2,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Corpus-level line deduplication (the RefinedWeb/CCNet paragraph-hash
    dedup shape): strip every line whose exact text occurs in >=
    ``min_docs`` distinct documents. Two passes over the corpus:

      1. distinct-per-doc line hashes -> per-batch partial counts ->
         ``groupby(line_hash).sum`` -> common-line set. Only (hash, count)
         pairs shuffle; the text never leaves its block.
      2. broadcast the common-line hash set (``ray.put`` once, read per
         task) and strip matching lines per batch.

    Scale note (10^12 docs): the common set is bounded by lines that
    repeat across documents (boilerplate — small relative to the corpus);
    if it outgrows the object store, swap the frozenset broadcast for the
    Bloom bitmap used by the MinHash path (``state/bloom.py``) — false
    positives then only admit lines into an exact re-check against a
    partitioned common-lines table. No reference analogue (its scope ends
    at extraction); semantics defined here, oracle-checked against DuckDB.

    Output: (doc_id, n_lines, n_removed, text_clean), text_clean = kept
    lines rejoined with single spaces.
    """
    from ray.data.aggregate import Sum

    df = ds.map_batches(
        _line_df_partial, batch_format="pyarrow",
        fn_kwargs={"words_per_line": words_per_line, "text_col": text_col},
    ).groupby("line_hash").aggregate(Sum("ndocs", alias_name="ndocs"))
    common = df.filter(expr=f"ndocs >= {int(min_docs)}") \
               .select_columns(["line_hash"])
    common_set = frozenset(
        h for b in common.iter_batches(batch_format="pyarrow")
        for h in b["line_hash"].to_numpy(zero_copy_only=False).tolist())
    common_ref = ray.put(common_set)

    def strip(batch: pa.Table) -> pa.Table:
        commons = ray.get(common_ref)  # object-store read, once per task
        n_lines = np.empty(batch.num_rows, np.int64)
        n_removed = np.empty(batch.num_rows, np.int64)
        cleaned: list[str] = []
        for i, t in enumerate(batch[text_col].to_pylist()):
            lines = _doc_lines(t, words_per_line)
            kept = [ln for ln in lines
                    if stable_hash64(ln) not in commons]
            n_lines[i] = len(lines)
            n_removed[i] = len(lines) - len(kept)
            cleaned.append(" ".join(kept))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines),
            "n_removed": pa.array(n_removed),
            "text_clean": pa.array(cleaned, pa.string()),
        })

    return ds.map_batches(strip, batch_format="pyarrow")


def _gram_df_partial(batch: pa.Table, k: int,
                     text_col: str) -> pa.Table:
    """Per-batch partial: distinct-per-doc k-gram hashes → (hash, ndocs)
    counts (one row per gram per batch, not per occurrence)."""
    from docling_ray.functions.hashing import tokenize

    counts: dict[int, int] = {}
    for t in batch[text_col].to_pylist():
        toks = tokenize(t or "")
        seen = {stable_hash64(" ".join(toks[i:i + k]))
                for i in range(len(toks) - k + 1)}
        for h in seen:
            counts[h] = counts.get(h, 0) + 1
    return pa.table({
        "gram_hash": pa.array(list(counts.keys()), pa.int64()),
        "ndocs": pa.array(list(counts.values()), pa.int64()),
    })


def _common_gram_ref(
    ds: "ray.data.Dataset", k: int, min_docs: int, text_col: str,
):
    """Pass 1 shared by the substring-dup profile and removal operators:
    distinct-per-doc gram hashes → partial counts → cross-doc gram set,
    broadcast once via ``ray.put``. Bounded by grams that REPEAT across
    documents (see the scale note on line_dedup; Bloom fallback applies
    identically)."""
    from ray.data.aggregate import Sum

    df = ds.map_batches(
        _gram_df_partial, batch_format="pyarrow",
        fn_kwargs={"k": k, "text_col": text_col},
    ).groupby("gram_hash").aggregate(Sum("ndocs", alias_name="ndocs"))
    common = df.filter(expr=f"ndocs >= {int(min_docs)}") \
               .select_columns(["gram_hash"])
    common_set = frozenset(
        h for b in common.iter_batches(batch_format="pyarrow")
        for h in b["gram_hash"].to_numpy(zero_copy_only=False).tolist())
    return ray.put(common_set)


def substring_dup(
    ds: "ray.data.Dataset",
    k: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Cross-document duplicated-substring profile — the per-document
    signal behind suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for
    every document, how many of its token ``k``-gram windows also occur
    in >= ``min_docs`` distinct documents. Same two-pass shape as
    :func:`line_dedup`:

      1. distinct-per-doc gram hashes → per-batch partial counts →
         ``groupby(gram_hash).sum`` → cross-doc gram set. Only
         (hash, count) pairs shuffle; text never leaves its block.
      2. broadcast the cross-doc gram hash set and count matching
         windows per document per batch (no second shuffle).

    Scale note (10^12 docs): the broadcast set is bounded by grams that
    REPEAT across documents (shared boilerplate/quotes), not the corpus
    gram vocabulary; the Bloom fallback documented on line_dedup applies
    identically. Shuffle keys are stable_hash64 of the gram (2^-64
    collision odds); the DuckDB oracle groups by the gram STRINGS, so a
    collision would surface as a hash mismatch rather than hide.

    Output: (doc_id, n_windows, dup_windows).
    """
    from docling_ray.functions.hashing import tokenize

    common_ref = _common_gram_ref(ds, k, min_docs, text_col)

    def profile(batch: pa.Table) -> pa.Table:
        commons = ray.get(common_ref)  # object-store read, once per task
        n_windows = np.empty(batch.num_rows, np.int64)
        dup = np.empty(batch.num_rows, np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = tokenize(t or "")
            n = max(len(toks) - k + 1, 0)
            n_windows[i] = n
            dup[i] = sum(
                1 for j in range(n)
                if stable_hash64(" ".join(toks[j:j + k])) in commons)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_windows": pa.array(n_windows),
            "dup_windows": pa.array(dup),
        })

    return ds.map_batches(profile, batch_format="pyarrow")


def substring_dedup_removal(
    ds: "ray.data.Dataset",
    k: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Cross-document duplicated-substring REMOVAL — the action behind
    the :func:`substring_dup` profile (Lee et al. 2022 remove duplicated
    spans of >= k tokens from the training text; this is the window-hash
    variant of their suffix-array construction): every token covered by
    ANY k-gram window that occurs in >= ``min_docs`` distinct documents
    is dropped, overlapping duplicate windows merge naturally, and the
    survivors are rejoined with single spaces.

    Same two-pass shape as the profile — pass 1 is SHARED
    (:func:`_common_gram_ref`): only (hash, count) pairs shuffle, pass 2
    is a stateless map over the broadcast cross-doc gram set. The DuckDB
    oracle recomputes the exact same coverage from the gram STRINGS, so
    a stable_hash64 collision would surface as a hash mismatch.

    Output: (doc_id, n_tokens, n_removed, text_clean).
    """
    from docling_ray.functions.hashing import tokenize

    common_ref = _common_gram_ref(ds, k, min_docs, text_col)

    def remove(batch: pa.Table) -> pa.Table:
        commons = ray.get(common_ref)  # object-store read, once per task
        n_tokens = np.empty(batch.num_rows, np.int64)
        n_removed = np.empty(batch.num_rows, np.int64)
        cleaned: list[str] = []
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = tokenize(t or "")
            n = len(toks)
            covered = np.zeros(n, bool)
            for j in range(max(n - k + 1, 0)):
                if stable_hash64(" ".join(toks[j:j + k])) in commons:
                    covered[j:j + k] = True
            n_tokens[i] = n
            n_removed[i] = int(covered.sum())
            cleaned.append(" ".join(
                tok for tok, c in zip(toks, covered) if not c))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_removed": pa.array(n_removed),
            "text_clean": pa.array(cleaned, pa.string()),
        })

    return ds.map_batches(remove, batch_format="pyarrow")


def exact_dedup_against_index(
    new_docs: "ray.data.Dataset",
    index: "ray.data.Dataset",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Incremental exact dedup: admit only new documents whose content
    hash is absent from a persisted index of previously-admitted hashes
    (column ``h``), first (min doc_id) per hash within the new batch —
    the production shape for continuously-ingested corpora (the batch
    :func:`exact_dedup_survivors` is the index-less special case).

    Tag co-group, no broadcast: union(index rows tag=1, new rows tag=0)
    → one groupby(h) with Sum(tag) + Min(doc_id) → keep groups the index
    never touched. Index rows carry a sentinel doc_id above any real id
    so Min always returns a real new-doc id. Only (hash, tag) pairs
    shuffle — text never leaves its block; the index side is
    hash-column-only and may be read straight from parquet.

    Output: (doc_id, h) of admitted documents. Appending the admitted
    ``h`` column back to the index parquet is the caller's commit step
    (atomic-rename like pipelines/checkpoint.py).
    """
    from ray.data.aggregate import Min, Sum

    from docling_ray.functions.hashing import content_md5

    # sentinel doc_id for index rows: sorts after every real id of the
    # new side's id type, so Min always returns a real new-doc id
    sch = new_docs.schema()
    id_type = dict(zip(sch.names, sch.types))["doc_id"]
    if pa.types.is_integer(id_type):
        sentinel, sentinel_type = (1 << 63) - 1, pa.int64()
    else:
        sentinel, sentinel_type = "\x7f", pa.string()

    def new_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "h": pa.array([content_md5(t or "")
                           for t in batch[text_col].to_pylist()]),
            "doc_id": pc.cast(batch["doc_id"], sentinel_type),
            "tag": pa.array(np.zeros(batch.num_rows, np.int64)),
        })

    def index_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "h": batch["h"],
            "doc_id": pa.array([sentinel] * batch.num_rows, sentinel_type),
            "tag": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    both = new_docs.map_batches(new_rows, batch_format="pyarrow").union(
        index.map_batches(index_rows, batch_format="pyarrow"))
    agg = both.groupby("h").aggregate(
        Sum("tag", alias_name="tag"),
        Min("doc_id", alias_name="doc_id"))

    def keep(t: pa.Table) -> pa.Table:
        k = t.filter(pc.equal(t["tag"], 0))
        return pa.table({"doc_id": k["doc_id"], "h": k["h"]})

    return agg.map_batches(keep, batch_format="pyarrow")


def neardup_best_survivors(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    text_col: str = "text",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Quality-aware near-dup survivor selection: within each MinHash+LSH
    cluster keep the member with the MOST tokens (tie → min doc_id) —
    real curation keeps the best member, not the first; duplicates often
    differ by truncation, and min-id picks arbitrarily. Clusters come
    from :func:`minhash_lsh_clusters` (already distributed end to end);
    token counts attach via a hash join; the per-cluster argmax runs
    once per cluster (clusters are ≥2 members by construction — no
    singleton ever reaches the Python kernel).

    Output: (rep_id, kept_doc_id, n_members) per cluster."""
    from docling_ray.functions.hashing import tokenize

    clusters = minhash_lsh_clusters(ds, threshold=threshold) \
        .repartition(num_partitions).materialize()

    def counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(
                [len(tokenize(t or ""))
                 for t in batch[text_col].to_pylist()], pa.int64()),
        })

    tk = ds.map_batches(counts, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    j = clusters.join(tk, join_type="inner",
                      num_partitions=num_partitions, on=("doc_id",))

    def best(group) -> pa.Table:
        g = group.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True])
        return pa.table({
            "rep_id": pa.array([int(g["rep_id"].iloc[0])], pa.int64()),
            "kept_doc_id": pa.array([int(g["doc_id"].iloc[0])],
                                    pa.int64()),
            "n_members": pa.array([len(g)], pa.int64()),
        })

    return j.groupby("rep_id").map_groups(best, batch_format="pandas")
