"""Cardinality sketches and deterministic sampling.

Distributed-aggregation primitives a 100 TB pipeline needs where exact
``groupby``/``unique`` would shuffle the full key set:

- :func:`hll_distinct` — HyperLogLog approximate distinct count as a
  single ``Dataset.aggregate`` pass: every block folds into a fixed
  2^p-byte register array on the map side, merges are elementwise max
  (associative + commutative, so Ray's tree merge is exact), and only
  the 4 KiB register arrays ever move. Nothing key-proportional
  shuffles and the driver sees one array.
- :func:`bottomk_sample` — deterministic uniform sample: the k ids with
  the smallest ``md5(id)``. Per-batch partial bottom-k keeps the global
  sort k-sized. Content-free, stable across runs/machines/partitioning,
  and SQL-recomputable (``ORDER BY md5(id) LIMIT k``) — the oracle-able
  replacement for ``random_shuffle().limit(k)``.
- :func:`kmv_distinct` — k-minimum-values estimate reusing the same
  bottom-k pass: the k-th smallest hash fraction estimates the
  cardinality as (k-1)/h_k.

The reference has no sketch subsystem (its scale ceiling is one node);
these follow the published algorithms (Flajolet et al. 2007 HyperLogLog;
Bar-Yossef et al. 2002 KMV) and the repo's determinism rules — no
``Math.random``-style seeds, every hash is content-derived.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

# splitmix64 constants — deterministic vectorized mix for integer keys
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _hash64_column(col: "pa.ChunkedArray") -> np.ndarray:
    """Deterministic 64-bit hashes for a column: splitmix64 (fully
    vectorized) for integer keys; for strings a vectorized polars
    ``hash`` (zero-copy from Arrow, fixed seed — stable within a
    polars version, which is all the rows-only HLL/KMV sketches need),
    falling back to a blake2b loop when polars is absent; blake2b for
    any other type."""
    if pa.types.is_integer(col.type):
        x = col.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x + _SM_GAMMA)
            x = (x ^ (x >> np.uint64(30))) * _SM_M1
            x = (x ^ (x >> np.uint64(27))) * _SM_M2
            x = x ^ (x >> np.uint64(31))
        return x
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        try:
            import polars as pl

            return pl.from_arrow(col).hash(seed=0) \
                .to_numpy().astype(np.uint64)
        except ImportError:
            pass
    digests = b"".join(
        hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        for v in col.to_pylist())
    return np.frombuffer(digests, dtype="<u8")


def _hll_fold(regs: np.ndarray, col: "pa.ChunkedArray",
              p: int) -> np.ndarray:
    """Fold one column chunk into the register array (elementwise max)."""
    h = _hash64_column(col)
    if not h.size:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading-zero count within the (64-p)-bit window, + 1.
    # frexp is exact for integers < 2^53, so floor(log2(w)) is exact.
    _, exp = np.frexp(w.astype(np.float64))
    rho = np.where(w == 0, 64 - p + 1, 64 - p - (exp - 1)) \
        .astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate (64-bit variant: linear counting for
    the small range, no large-range correction needed)."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_aggregate(col: str, p: int = 12) -> AggregateFn:
    """A Ray ``AggregateFn`` computing the HLL register array for one
    column. Map side folds whole Arrow blocks; merge is elementwise max
    so the tree combine is exact regardless of partitioning."""
    m = 1 << p

    def acc_block(regs: np.ndarray, block) -> np.ndarray:
        t = block if isinstance(block, pa.Table) else pa.Table \
            .from_pandas(block)
        return _hll_fold(regs.copy(), t[col], p)

    return AggregateFn(
        init=lambda k: np.zeros(m, np.uint8),
        merge=np.maximum,
        accumulate_block=acc_block,
        finalize=_hll_estimate,
        name=f"hll_distinct({col})",
    )


def hll_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> int:
    """Approximate distinct count of ``ds[col]`` — one aggregate pass,
    standard error ≈ 1.04/sqrt(2^p) (~1.6% at the default p=12)."""
    out = ds.aggregate(hll_aggregate(col, p))
    return int(out[f"hll_distinct({col})"])


def _mg_shrink(counters: dict, k: int) -> dict:
    """Keep at most k-1 counters by subtracting the k-th largest weight
    from everyone (the Misra-Gries decrement, batched)."""
    if len(counters) < k:
        return counters
    weights = sorted(counters.values(), reverse=True)
    cut = weights[k - 1]
    return {key: c - cut for key, c in counters.items() if c > cut}


def mg_aggregate(col: str, k: int = 64) -> "AggregateFn":
    """Misra-Gries heavy-hitters summary as a Ray ``AggregateFn``:
    at most k-1 (item, weight) counters whose error is bounded by N/k.
    Map side folds whole Arrow blocks (one value_counts per block, then
    one batched decrement); merges add counters then shrink — the
    mergeable-summaries construction (Agarwal et al. 2012), so the
    result is partitioning-DEPENDENT only in its weights, while the
    guarantee (every item with true frequency > N/k survives) holds
    under any partitioning. Only k-sized dicts ever move."""

    def acc_block(counters: dict, block) -> dict:
        t = block if isinstance(block, pa.Table) else pa.Table \
            .from_pandas(block)
        vc = t[col].value_counts()
        merged = dict(counters)
        for item, cnt in zip(vc.field("values").to_pylist(),
                             vc.field("counts").to_pylist()):
            merged[item] = merged.get(item, 0) + cnt
        return _mg_shrink(merged, k)

    def merge(a: dict, b: dict) -> dict:
        out = dict(a)
        for key, c in b.items():
            out[key] = out.get(key, 0) + c
        return _mg_shrink(out, k)

    return AggregateFn(
        init=lambda _k: {},
        merge=merge,
        accumulate_block=acc_block,
        finalize=lambda c: c,
        name=f"heavy_hitters({col})",
    )


def heavy_hitters(ds: "ray.data.Dataset", col: str,
                  k: int = 64) -> "pa.Table":
    """Approximate frequent items of ``ds[col]``: every item with true
    frequency > N/k is guaranteed present; reported weights
    underestimate true counts by at most N/k. One aggregate pass, no
    shuffle. Output: (item, min_count) sorted by min_count desc, item."""
    out = ds.aggregate(mg_aggregate(col, k))
    counters = out[f"heavy_hitters({col})"]
    items = sorted(counters.items(), key=lambda kv: (-kv[1], str(kv[0])))
    return pa.table({
        "item": pa.array([str(i) for i, _ in items], pa.string()),
        "min_count": pa.array([c for _, c in items], pa.int64()),
    })


def _md5_digests(col: "pa.ChunkedArray") -> np.ndarray:
    """16-byte md5 digests per value, as a (n, 16) uint8 matrix. Byte
    ordering of the digest equals lexicographic ordering of the hex
    string, so sorts match SQL ``ORDER BY md5(id)``."""
    vals = col.to_pylist()
    buf = b"".join(hashlib.md5(str(v).encode()).digest() for v in vals)
    return np.frombuffer(buf, np.uint8).reshape(-1, 16)


def _local_bottomk(ds: "ray.data.Dataset", k: int,
                   id_col: str) -> "ray.data.Dataset":
    """Per-batch bottom-k candidates by md5 hex (at most k rows per
    batch survive into any global step)."""

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col],
                             "h": pa.array([], pa.string())})
        dig = _md5_digests(batch[id_col])
        hexes = np.array([d.tobytes().hex() for d in dig])
        order = np.argsort(hexes, kind="stable")[:k]
        return pa.table({
            id_col: batch[id_col].take(pa.array(order, pa.int64())),
            "h": pa.array(hexes[order], pa.string()),
        })

    return ds.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)


def bottomk_sample(
    ds: "ray.data.Dataset", k: int = 100, id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic uniform sample: the ``k`` rows with the smallest
    ``md5(id)``. Each batch keeps only its local bottom-k (lexicographic
    on the digest bytes == hex order), so the global sort sees at most
    k rows per batch. Output: (id_col, h) ordered by h."""
    return _local_bottomk(ds, k, id_col).sort("h").limit(k)


def mixture_sample(
    ds: "ray.data.Dataset",
    quotas: dict[str, int],
    id_col: str = "doc_id",
    key_col: str = "source",
) -> "ray.data.Dataset":
    """Deterministic domain-mixture sampling — the dataset-balancing
    step of training-data pipelines (fix per-domain proportions before
    training): for each domain, the ``quotas[domain]`` rows with the
    smallest ``md5(id)``. Content-free and partitioning-invariant like
    :func:`bottomk_sample`; per batch each PRESENT domain keeps only
    its local bottom-quota (so the per-domain finalize sees at most
    quota × n_batches rows), and the per-domain cut runs vectorized in
    ``map_groups`` (domains are few by construction — the pivot
    precondition). Domains outside ``quotas`` drop. Output:
    (id_col, key_col, h) ordered by key_col, h."""
    import pyarrow.compute as pc

    def local(batch: pa.Table) -> pa.Table:
        keep_idx: list[int] = []
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        dig = _md5_digests(batch[id_col])
        hexes = np.array([d.tobytes().hex() for d in dig])
        for dom, q in quotas.items():
            rows = np.flatnonzero(keys == dom)
            if rows.size:
                order = np.argsort(hexes[rows], kind="stable")[:q]
                keep_idx.extend(rows[order].tolist())
        keep = pa.array(sorted(keep_idx), pa.int64())
        sel = batch.take(keep)
        return pa.table({
            id_col: sel[id_col],
            key_col: sel[key_col],
            "h": pa.array(hexes[np.asarray(sorted(keep_idx), np.int64)]
                          if keep_idx else [], pa.string()),
        })

    cand = ds.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)

    def cut(group: pa.Table) -> pa.Table:
        q = quotas.get(group[key_col][0].as_py(), 0)
        idx = pc.sort_indices(group, sort_keys=[("h", "ascending")])
        return group.take(idx[:q])

    return cand.groupby(key_col).map_groups(cut, batch_format="pyarrow") \
        .sort([key_col, "h"])


def kmv_distinct(ds: "ray.data.Dataset", col: str,
                 k: int = 256) -> int:
    """K-minimum-values distinct estimate: with h_k = the k-th smallest
    DISTINCT hash mapped to (0,1), the unbiased estimator is (k-1)/h_k;
    if fewer than k distinct hashes exist the count is exact (the
    candidate set IS the distinct set). Duplicates collapse in two
    cheap layers before anything global: per-batch ``unique`` then a
    local bottom-k, so the candidate groupby sees at most k rows per
    batch; the final sort is candidate-sized."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    def uniq(batch: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(batch[col])})

    # no global limit before dedup: cross-batch duplicates of one hash
    # would otherwise hide later distinct hashes behind the k-row cut.
    cand = _local_bottomk(
        ds.map_batches(uniq, batch_format="pyarrow", batch_size=65536),
        k, col)
    dedup = cand.groupby("h").aggregate(Count()) \
        .sort("h").limit(k).take_all()
    hashes = [r["h"] for r in dedup]
    if len(hashes) < k:
        return len(hashes)
    frac = int(hashes[k - 1][:16], 16) / float(1 << 64)
    return int(round((k - 1) / frac))


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (deterministic compaction)
# ---------------------------------------------------------------------------

class KLLSketch:
    """Mergeable quantile sketch in the KLL compactor-hierarchy shape
    (Karnin-Lang-Liberty 2016): level i holds values each representing
    2^i inputs; a full level sorts and promotes every other element to
    level i+1. One deliberate departure from the paper: the compactor
    offset ALTERNATES deterministically per level instead of a random
    coin, so two runs over the same blocks (and the pytest pins) are
    bit-identical. The alternation keeps the error centered in practice
    (pinned ≤ 1% rank error in tests/test_sketches.py); the paper's
    probabilistic worst-case bound formally needs the coin. Memory is
    O(k·log(n/k)) values regardless of n; merge concatenates levels then
    recompacts, so the tree combine never grows past the cap."""

    __slots__ = ("k", "levels", "parity", "n")

    def __init__(self, k: int = 512):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.int64)]
        self.parity: list[int] = [0]
        self.n = 0

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            lvl = self.levels[i]
            if len(lvl) <= self.k:
                i += 1
                continue
            srt = np.sort(lvl)
            off = self.parity[i] & 1
            self.parity[i] ^= 1
            promoted = srt[off::2]
            # the classic compactor: half promotes, half drops, the
            # level empties (each promoted value now weighs 2^(i+1))
            self.levels[i] = srt[:0]
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.int64))
                self.parity.append(0)
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], promoted])
            i += 1

    def add_block(self, values: np.ndarray) -> None:
        if not len(values):
            return
        self.n += len(values)
        self.levels[0] = np.concatenate(
            [self.levels[0], values.astype(np.int64)])
        self._compact()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        out = KLLSketch(self.k)
        out.n = self.n + other.n
        h = max(len(self.levels), len(other.levels))
        out.levels = []
        out.parity = []
        for i in range(h):
            a = self.levels[i] if i < len(self.levels) \
                else np.empty(0, np.int64)
            b = other.levels[i] if i < len(other.levels) \
                else np.empty(0, np.int64)
            out.levels.append(np.concatenate([a, b]))
            pa_ = self.parity[i] if i < len(self.parity) else 0
            pb = other.parity[i] if i < len(other.parity) else 0
            out.parity.append(pa_ ^ pb)
        out._compact()
        return out

    def quantile(self, q: float) -> int:
        """Smallest value whose weighted rank reaches ceil(q*n) (the
        event_quantiles rank convention)."""
        vals = []
        wts = []
        for i, lvl in enumerate(self.levels):
            if len(lvl):
                vals.append(lvl)
                wts.append(np.full(len(lvl), 1 << i, np.int64))
        if not vals:
            raise ValueError("empty sketch")
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = max(1, int(np.ceil(q * cum[-1])))
        idx = int(np.searchsorted(cum, target))
        return int(v[min(idx, len(v) - 1)])


def kll_aggregate(col: str, qs: "tuple[float, ...]" = (0.5, 0.95),
                  k: int = 512) -> "AggregateFn":
    """Ray ``AggregateFn`` producing approximate quantiles of an int64
    column via one KLLSketch per partition (map side folds whole Arrow
    blocks; merge is the sketch merge, exact under any partitioning
    tree). Finalize emits the list of quantile values for ``qs``.
    O(k log n) state per group — nothing value-proportional shuffles,
    unlike the exact sort-based event_quantiles."""

    def acc_block(sk: KLLSketch, block) -> KLLSketch:
        t = block if isinstance(block, pa.Table) else pa.Table \
            .from_pandas(block)
        sk.add_block(t[col].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        return sk

    return AggregateFn(
        init=lambda _k: KLLSketch(k),
        merge=lambda a, b: a.merge(b),
        accumulate_block=acc_block,
        finalize=lambda sk: [sk.quantile(q) for q in qs] if sk.n
        else [0] * len(qs),
        name=f"kll({col})",
    )
