"""Lossy VP8 WebP: writer↔decoder round trip, literal pins for the
shared reconstruction primitives, and fuzz totalization.

The bitstream layers are independent (synth._VP8BoolEnc vs
webp_codec._BoolDec); the shared functions/vp8.py math is pinned here by
literal vectors and — when the system libwebp is present — bit-exactly
against the real decoder in tests/test_vp8_parity.py.
"""

import random

import numpy as np
import pytest

from docling_ray.functions import vp8 as V
from docling_ray.stages.image_codec import ImageError, decode_frames
from docling_ray.stages.webp_codec import decode_webp
from docling_ray.synth import vp8_lossy_webp


def test_idct_literal():
    # DC-only block: every output pixel = (dc + 4) >> 3
    out = V.idct4x4([100] + [0] * 15)
    assert (out == 13).all()
    # spec multipliers: a pure second-basis row input (value pinned by
    # the libwebp bit-exactness suite, kept here as a fast regression)
    out = V.idct4x4([0, 50, 0, 0] + [0] * 12)
    assert out[0].tolist() == [8, 3, -3, -8]
    assert (out == out[0][None, :]).all()


def test_iwht_literal():
    dcs = V.iwht4x4([64] + [0] * 15)
    assert dcs == [8] * 16
    dcs = V.iwht4x4([0, 16, 0, 0] + [0] * 12)
    assert dcs == [2, 2, -2, -2] * 4


def test_segment_quants_literal():
    q = V.segment_quants(0, (0, 0, 0, 0, 0), False, False, [0] * 4)[0]
    assert q == (4, 4, 8, 8, 4, 4)  # y2dc=2*4, y2ac=max(8, 4*155//100)
    q = V.segment_quants(127, (0, 0, 0, 0, 0), False, False, [0] * 4)[0]
    assert q == (157, 284, 314, 440, 132, 284)  # uvdc capped at 132


def test_predict_b_dc_tm():
    a = np.arange(8, dtype=np.int64) + 10
    left = np.array([1, 2, 3, 4], np.int64)
    out = V.predict_b(V.B_DC_PRED, a, left, 99)
    assert (out == (10 + 11 + 12 + 13 + 1 + 2 + 3 + 4 + 4 >> 3)).all()
    out = V.predict_b(V.B_TM_PRED, a, left, 5)
    assert out[2, 1] == 3 + 11 - 5


def test_roundtrip_seeded():
    rng = random.Random(2024)
    for _ in range(12):
        w, h = rng.randrange(4, 64), rng.randrange(4, 64)
        data, exp = vp8_lossy_webp(rng, w, h)
        arr, mode = decode_webp(data)
        assert mode == "RGB"
        assert arr.shape == exp.shape
        assert (arr == exp).all(), (w, h)


def test_decode_frames_dispatch():
    rng = random.Random(7)
    data, exp = vp8_lossy_webp(rng, 20, 12)
    frames, fmt = decode_frames(data)
    assert fmt == "webp" and len(frames) == 1
    assert (frames[0][0] == exp).all()


def test_fuzz_totalized():
    rng = random.Random(5)
    data, _ = vp8_lossy_webp(rng, 24, 18)
    mut = bytearray(data)
    for pos in range(12, len(mut), 7):
        m = bytearray(mut)
        m[pos] ^= 0xA5
        try:
            decode_frames(bytes(m))
        except ImageError:
            pass  # clean structured failure is the contract
    # truncations too
    for cut in range(12, len(data), 11):
        try:
            decode_frames(data[:cut])
        except ImageError:
            pass


def test_non_keyframe_rejected():
    rng = random.Random(6)
    data = bytearray(vp8_lossy_webp(rng, 16, 16)[0])
    data[20] |= 1  # flip the keyframe bit of the frame tag
    with pytest.raises(ImageError, match="keyframe"):
        decode_webp(bytes(data))
