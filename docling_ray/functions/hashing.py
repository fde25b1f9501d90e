"""Stable hashing / fingerprinting primitives for dedup & lineage.

All hashes are deterministic across processes and platforms (no PYTHONHASHSEED
dependence), so that groupby keys, dedup survivors and checkpoint manifests
are reproducible — the analogue of the reference's stable document hash
(``docling/datamodel/document.py:178`` ``create_file_hash``).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np

_WS_RE = re.compile(r"\s+")


def content_md5(text: str) -> str:
    """Hex MD5 of the raw utf-8 text (matches DuckDB ``md5(text)``)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def normalized_fingerprint(text: str) -> str:
    """Document fingerprint: MD5 of lowercased, whitespace-collapsed text.

    Matches DuckDB ``md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))`` so the
    operator is oracle-checkable.
    """
    return hashlib.md5(_WS_RE.sub(" ", text).lower().encode("utf-8")).hexdigest()


def stable_hash64(data: bytes | str) -> int:
    """64-bit stable hash (first 8 bytes of blake2b), unsigned range [0, 2^63)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = hashlib.blake2b(data, digest_size=8).digest()
    return struct.unpack("<q", h)[0] & 0x7FFFFFFFFFFFFFFF


_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """Lowercase alphanumeric tokens (matches the oracle regex [a-z0-9]+)."""
    return _TOKEN_RE.findall(text.lower())


def word_shingles(text: str, k: int = 3) -> set[str]:
    """Set of k-word shingles of the lowercased token stream."""
    toks = tokenize(text)
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_signature(
    shingles: set[str], num_perm: int = 128, seed: int = 42
) -> np.ndarray:
    """MinHash signature over a shingle set.

    Universal-hash family h_i(x) = (a_i * x + b_i) mod p over 64-bit shingle
    hashes; vectorized with numpy. Deterministic for a fixed seed.
    """
    rng = np.random.RandomState(seed)
    p = (1 << 61) - 1  # Mersenne prime
    a = rng.randint(1, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array([stable_hash64(s) for s in shingles], dtype=np.uint64)
    # (n_shingles, num_perm) would be large; do it per-perm-block instead
    vals = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(p)
    return vals.min(axis=0)


# Cache the permutation coefficients once per process (they depend only on
# num_perm/seed) — recomputing per row would dominate runtime.
_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _perm_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        rng = np.random.RandomState(seed)
        p = (1 << 61) - 1
        a = rng.randint(1, p, size=num_perm, dtype=np.int64).astype(np.uint64)
        b = rng.randint(0, p, size=num_perm, dtype=np.int64).astype(np.uint64)
        _PERM_CACHE[key] = (a, b)
    return _PERM_CACHE[key]


def minhash_from_hashes(
    shingle_hashes: np.ndarray, num_perm: int = 128, seed: int = 42
) -> np.ndarray:
    """MinHash signature given precomputed 64-bit shingle hashes."""
    a, b = _perm_coeffs(num_perm, seed)
    p = np.uint64((1 << 61) - 1)
    if shingle_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = (shingle_hashes[:, None] * a[None, :] + b[None, :]) % p
    return vals.min(axis=0)


def md5_hash64(token: str) -> int:
    """First 8 bytes of MD5 as a big-endian uint64 — chosen (over blake2b)
    because DuckDB can recompute it: ``('0x' || substr(md5(t),1,16))::UBIGINT``,
    which makes every simhash-derived operator oracle-checkable."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:16], 16)


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercased alphanumeric tokens, token frequency
    as the weight; token hash = :func:`md5_hash64` (SQL-expressible). Empty
    token stream → 0."""
    toks = tokenize(text)
    if not toks:
        return 0
    from collections import Counter

    cnt = Counter(toks)
    hashes = np.fromiter((md5_hash64(t) for t in cnt), dtype=np.uint64,
                         count=len(cnt))
    weights = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    votes = ((2 * bits - 1) * weights[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_hashes(text: str, window: int = 64, base: int = 257) -> list[int]:
    """Rabin-Karp rolling hashes over byte windows (document fingerprinting)."""
    data = text.encode("utf-8")
    if len(data) < window:
        return [stable_hash64(data)] if data else []
    mod = (1 << 61) - 1
    power = pow(base, window - 1, mod)
    h = 0
    out = []
    for i, byte in enumerate(data):
        h = (h * base + byte) % mod
        if i >= window - 1:
            out.append(h)
            h = (h - data[i - window + 1] * power) % mod
    return out
