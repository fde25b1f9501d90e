"""Distributed Bloom filter over an int64 column — bounded broadcast state.

The primitive behind every "semi-join against a derived small-ish set"
step in the dedup pipelines (candidate doc ids, hot LSH bucket keys):
the exact value set can grow with the data (a driver gather of it would
not scale), but a Bloom bitmap is FIXED SIZE regardless of input — each
input block contributes a local bitmap, the driver ORs ``n_blocks``
fixed-size arrays, and the merged bitmap broadcasts once via ``ray.put``.
False positives only let extra rows through to the exact downstream
verification, never drop rows (no false negatives), so correctness is
unaffected.

Hashing is splitmix64 with k salts — deterministic, vectorized numpy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_SALTS = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
     0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A5, 0xC2B2AE3D27D4EB4F],
    dtype=np.uint64,
)


def _splitmix64(x: np.ndarray, salt: np.uint64) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x + salt
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _positions(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for each value."""
    v = values.astype(np.int64).view(np.uint64)
    return np.stack(
        [_splitmix64(v, _SALTS[i]) % np.uint64(m_bits) for i in range(k)],
        axis=1,
    )


class Bloom:
    """Immutable bitmap + membership test; built via :func:`bloom_from_column`."""

    def __init__(self, bits: np.ndarray, m_bits: int, k: int):
        self.bits = bits  # uint8 array of m_bits/8 bytes
        self.m_bits = m_bits
        self.k = k

    def contains(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (True = possibly present)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(np.asarray(values), self.m_bits, self.k)
        byte_idx = (pos >> 3).astype(np.int64)
        bit_mask = (np.uint8(1) << (pos & 7).astype(np.uint8))
        return ((self.bits[byte_idx] & bit_mask) != 0).all(axis=1)


def local_bitmap(values: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(values):
        pos = _positions(np.asarray(values), m_bits, k)
        np.bitwise_or.at(bits, (pos >> 3).astype(np.int64),
                         np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits


def bloom_from_column(
    ds: "ray.data.Dataset", col: str, m_bits: int = 1 << 23, k: int = 4,
) -> Bloom:
    """Build a Bloom filter over ``ds[col]`` distributedly.

    Each batch emits one fixed-size bitmap row; the driver ORs them —
    driver memory is O(n_batches seen at once) × m_bits/8, independent of
    the number of values. m_bits=2^23 (1 MiB) holds ~10^6 values at k=4
    under 3% FP; size up for bigger candidate sets.
    """
    def to_bitmap(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        bm = local_bitmap(vals, m_bits, k)
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.large_binary())})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    parts = ds.map_batches(to_bitmap, batch_format="pyarrow",
                           batch_size=65536)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=16):
        for buf in b["bitmap"].to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint8)
    return Bloom(merged, m_bits, k)


def filter_by_bloom(
    ds: "ray.data.Dataset", col: str, bloom: Bloom,
) -> "ray.data.Dataset":
    """Keep rows whose ``col`` is (possibly) in the filter — broadcast once
    via ``ray.put``, tested vectorized per batch."""
    ref = ray.put(bloom)

    def keep(batch: pa.Table) -> pa.Table:
        from docling_ray.state.broadcast import read_broadcast

        bl: Bloom = read_broadcast(ref)
        vals = batch[col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bl.contains(vals)))

    return ds.map_batches(keep, batch_format="pyarrow")
