"""Bit-exact parity of the from-scratch VP8 decoder against the system
libwebp decoder (ctypes; tests-only dependency — the product path never
touches it). Skipped when the shared library is absent.

Two directions close the triangle:
  * libwebp-ENCODED frames decode to identical Y/U/V planes under both
    decoders (catches any spec-table or reconstruction error);
  * synth-encoded frames (synth.vp8_lossy_webp) decode identically under
    both decoders (catches complementary encoder/decoder bug pairs).
"""

import ctypes
import ctypes.util
import random

import numpy as np
import pytest

from docling_ray.stages.webp_codec import decode_vp8_planes
from docling_ray.synth import vp8_lossy_webp

_LIB_PATHS = ["libwebp.so.7", "/usr/lib/x86_64-linux-gnu/libwebp.so.7"]


def _load():
    for p in _LIB_PATHS:
        try:
            return ctypes.CDLL(p)
        except OSError:
            continue
    return None


_lib = _load()
pytestmark = pytest.mark.skipif(_lib is None,
                                reason="system libwebp not present")

if _lib is not None:
    _lib.WebPEncodeRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    _lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeYUV.argtypes = (
        [ctypes.c_char_p, ctypes.c_size_t]
        + [ctypes.POINTER(ctypes.c_int)] * 2
        + [ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))] * 2
        + [ctypes.POINTER(ctypes.c_int)] * 2)


def _encode(rgb: np.ndarray, q: float) -> bytes:
    h, w = rgb.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.WebPEncodeRGB(rgb.tobytes(), w, h, w * 3, q,
                           ctypes.byref(out))
    assert n > 0
    return bytes(bytearray(
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents))


def _libwebp_yuv(data: bytes):
    W, H = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    st, ust = ctypes.c_int(), ctypes.c_int()
    yp = _lib.WebPDecodeYUV(data, len(data), ctypes.byref(W),
                            ctypes.byref(H), ctypes.byref(up),
                            ctypes.byref(vp), ctypes.byref(st),
                            ctypes.byref(ust))
    assert yp
    w, h, s, us = W.value, H.value, st.value, ust.value
    ch, cw = (h + 1) // 2, (w + 1) // 2

    def plane(ptr, stride, rows, cols):
        buf = ctypes.cast(
            ptr, ctypes.POINTER(ctypes.c_uint8 * (stride * rows))).contents
        return np.frombuffer(bytearray(buf), np.uint8).reshape(
            rows, stride)[:, :cols]

    return plane(yp, s, h, w), plane(up, us, ch, cw), plane(vp, us, ch, cw)


def _assert_planes_equal(data: bytes):
    ly, lu, lv = _libwebp_yuv(data)
    my, mu, mv, w, h = decode_vp8_planes(data[20:])
    cw, ch = (w + 1) // 2, (h + 1) // 2
    assert (my[:h, :w] == ly).all()
    assert (mu[:ch, :cw] == lu).all()
    assert (mv[:ch, :cw] == lv).all()


def test_decoder_matches_libwebp_on_real_frames():
    rng = np.random.default_rng(11)
    for w, h in [(16, 16), (33, 21), (64, 48), (8, 8), (80, 50)]:
        for q, noisy in [(10.0, False), (60.0, True), (95.0, True)]:
            xx, yy = np.meshgrid(np.arange(w), np.arange(h))
            base = (xx * 5 + yy * 3) % 256
            noise = rng.integers(0, 120 if noisy else 20, (h, w))
            rgb = np.stack([(base + noise) % 256, (base * 2) % 256,
                            (255 - base) % 256], -1).astype(np.uint8)
            _assert_planes_equal(_encode(rgb, q))


def test_libwebp_decodes_synth_frames_identically():
    rng = random.Random(77)
    for _ in range(8):
        w, h = rng.randrange(4, 70), rng.randrange(4, 70)
        data, _exp = vp8_lossy_webp(rng, w, h)
        _assert_planes_equal(data)
