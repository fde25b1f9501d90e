"""JFIF color conversions shared by the JPEG writer and decoder.

Like ``normalize.py``/``refs.py``, this is the narrow band of code the
synthetic generator (encoder side) and the extractor (decoder side) are
ALLOWED to share — pinned by hand-written literal tests so a bug cannot
silently cancel across the round trip. The formulas are the public JFIF
specification's (ITU-T T.871 §7): BT.601 luma weights, chroma centered
on 128, rounding = floor(x + 0.5) for cross-platform determinism (numpy
``np.round`` is banker's rounding and would disagree with a naive C
implementation at .5 boundaries).
"""

from __future__ import annotations

import numpy as np


def _quantize(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) clipped to [0, 255] → uint8 (deterministic
    round-half-up, not banker's)."""
    return np.clip(np.floor(x + 0.5), 0.0, 255.0).astype(np.uint8)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 RGB → (..., 3) uint8 YCbCr (JFIF full-range)."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([_quantize(y), _quantize(cb), _quantize(cr)], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """(..., 3) uint8/float YCbCr → (..., 3) uint8 RGB (JFIF full-range)."""
    f = ycc.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([_quantize(r), _quantize(g), _quantize(b)], axis=-1)
