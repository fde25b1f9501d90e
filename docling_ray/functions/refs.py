"""Canonical media_ref serializations shared across extractors.

Lives in ``functions/`` (not ``stages/``) because the synthetic-corpus
generator is allowed to share exactly this layer with the engine — every
function here is pinned by hand-written literal expectations in
``tests/test_refs.py`` (the same discipline as ``normalize.py``), so a bug
cannot hide on both sides of the round-trip selfcheck.
"""

from __future__ import annotations

import json


def grid_media_ref(grid: list[list[str]]) -> str:
    """Canonical serialized-grid media_ref for a ``table`` span.

    Format: ``grid:`` + compact JSON ``{"num_rows", "num_cols", "cells"}``
    (no spaces, non-ASCII kept raw). The analogue of the reference's
    ``TableData`` cell matrix (docling_core TableItem) flattened to a string
    column so table structure survives the Arrow span schema.
    """
    return "grid:" + json.dumps(
        {"num_rows": len(grid), "num_cols": len(grid[0]) if grid else 0,
         "cells": grid},
        separators=(",", ":"), ensure_ascii=False,
    )


def image_media_ref(width: int, height: int, mode: str,
                    rgb_bytes: bytes) -> str:
    """Canonical media_ref for a DECODED raster image (``picture`` span
    emitted by the image backend, stages/image_codec.py): geometry +
    original color mode + a 64-bit fingerprint of the RGB-converted pixel
    bytes. The generator computes this from its source pixel array and the
    decoder from its reconstruction — equality proves the decode."""
    from docling_ray.functions.hashing import stable_hash64

    return (f"imgpx://{width}x{height}/{mode}/"
            f"{stable_hash64(rgb_bytes) & 0xFFFFFFFFFFFFFFFF:016x}")
