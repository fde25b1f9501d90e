"""Broadcast state helpers: ship a small lookup once, read it everywhere.

The pattern behind every small-side join / model-weights / query-vector
stage in this engine: ``ray.put`` the object once on the driver, pass the
ObjectRef into the batch fn / actor ``__init__``, and cache the ``ray.get``
per process — the object crosses the cluster once per node, not once per
batch (SURVEY.md §2.9 / ray guide "Joins and lookups").
"""

from __future__ import annotations

from typing import Any

import ray

_LOCAL_CACHE: dict[str, Any] = {}


def broadcast(obj: Any) -> "ray.ObjectRef":
    """Put a small object in the object store once (driver side)."""
    return ray.put(obj)


def read_broadcast(ref: "ray.ObjectRef") -> Any:
    """Worker-side cached get: one deserialization per process, not per
    batch (plasma gives zero-copy for numpy/Arrow; the cache avoids repeated
    python deserialization for dicts/sets)."""
    key = ref.hex()
    if key not in _LOCAL_CACHE:
        _LOCAL_CACHE[key] = ray.get(ref)
    return _LOCAL_CACHE[key]
