"""CCITT Group 3/4 fax codec: literal table pins (the shared
functions/faxcodes tables must match ITU-T T.4/T.6 exactly), structural
code-set properties, encoder↔decoder round trips (independent
implementations sharing only the tables), and decode totality."""

import random

import numpy as np
import pytest

from docling_ray.functions import faxcodes as F
from docling_ray.stages.fax_codec import (
    FaxError,
    decode_g4,
    decode_mh_rle,
)
from docling_ray.synth import bilevel_to_tiff, fax_g4_encode, fax_mh_encode


def test_table_literal_pins():
    """Hand-checked values straight from the T.4 tables."""
    assert F.WHITE_TERM[0] == "00110101"
    assert F.WHITE_TERM[1] == "000111"
    assert F.WHITE_TERM[63] == "00110100"
    assert F.BLACK_TERM[0] == "0000110111"
    assert F.BLACK_TERM[1] == "010"
    assert F.BLACK_TERM[2] == "11"
    assert F.BLACK_TERM[63] == "000001100111"
    assert F.WHITE_MAKEUP[64] == "11011"
    assert F.WHITE_MAKEUP[1728] == "010011011"
    assert F.BLACK_MAKEUP[64] == "0000001111"
    assert F.BLACK_MAKEUP[1728] == "0000001100101"
    assert F.EXT_MAKEUP[1792] == "00000001000"
    assert F.EXT_MAKEUP[2560] == "000000011111"
    assert F.MODE_CODES == {
        "P": "0001", "H": "001", "V0": "1",
        "VR1": "011", "VR2": "000011", "VR3": "0000011",
        "VL1": "010", "VL2": "000010", "VL3": "0000010"}
    assert F.EOL == "000000000001"


def test_table_structure():
    """64 terminating codes per color, 27 make-ups each, 13 shared
    extended make-ups; every full per-color code set is prefix-free
    (a single typo in any entry almost always breaks this)."""
    assert len(F.WHITE_TERM) == 64 and len(F.BLACK_TERM) == 64
    assert len(F.WHITE_MAKEUP) == 27 and len(F.BLACK_MAKEUP) == 27
    assert len(F.EXT_MAKEUP) == 13
    assert sorted(F.WHITE_TERM) == list(range(64))
    assert sorted(F.WHITE_MAKEUP) == [64 * k for k in range(1, 28)]
    assert sorted(F.EXT_MAKEUP) == [1792 + 64 * k for k in range(13)]

    for codes in (F.white_codes(), F.black_codes()):
        vals = sorted(codes.values())
        assert len(set(vals)) == len(vals)
        for i, a in enumerate(vals):
            for b in vals[i + 1:]:
                assert not b.startswith(a), (a, b)
    # mode codes + EOL are mutually prefix-free too
    mode_vals = sorted(list(F.MODE_CODES.values()) + [F.EOL])
    for i, a in enumerate(mode_vals):
        for b in mode_vals[i + 1:]:
            assert not b.startswith(a), (a, b)


def _random_bits(rng, w, h, run_heavy=False):
    if not run_heavy:
        return np.frombuffer(
            bytes(rng.randrange(2) for _ in range(w * h)),
            np.uint8).reshape(h, w).copy()
    bits = np.zeros((h, w), np.uint8)
    for r in range(h):
        x = 0
        c = rng.randrange(2)
        while x < w:
            run = min(rng.randrange(1, w + 1), w - x)
            bits[r, x: x + run] = c
            x += run
            c ^= 1
    return bits


@pytest.mark.parametrize("codec", ["g4", "mh"])
def test_roundtrip_random(codec):
    rng = random.Random(11)
    enc = fax_g4_encode if codec == "g4" else fax_mh_encode
    dec = decode_g4 if codec == "g4" else decode_mh_rle
    for trial in range(120):
        w = rng.randrange(1, 90)
        h = rng.randrange(1, 40)
        bits = _random_bits(rng, w, h, run_heavy=trial % 2 == 0)
        assert np.array_equal(dec(enc(bits), w, h), bits), (codec, trial)


@pytest.mark.parametrize("codec", ["g4", "mh"])
def test_roundtrip_extremes(codec):
    enc = fax_g4_encode if codec == "g4" else fax_mh_encode
    dec = decode_g4 if codec == "g4" else decode_mh_rle
    for bits in (
        np.zeros((4, 2000), np.uint8),           # all white
        np.ones((4, 2000), np.uint8),            # all black
        np.tile([0, 1], (3, 1000)).astype(np.uint8),  # 1px stripes
    ):
        h, w = bits.shape
        assert np.array_equal(dec(enc(bits), w, h), bits)
    # make-up chains past 2560 (multiple extended make-ups per run)
    bits = np.zeros((3, 6000), np.uint8)
    bits[1, 2700:5900] = 1
    assert np.array_equal(dec(enc(bits), 6000, 3), bits)


def test_tiff_container_both_compressions():
    from docling_ray.stages.image_codec import decode_tiff

    frames = [(np.arange(20 * 30).reshape(20, 30) % 3 == 0)
              .astype(np.uint8) for _ in range(2)]
    for g4 in (True, False):
        out = decode_tiff(bilevel_to_tiff(frames, 30, 20, g4=g4))
        assert len(out) == 2
        for (rgb, mode), bb in zip(out, frames):
            assert mode == "1"
            # WhiteIsZero: decoded 1 (black) → intensity 0
            assert np.array_equal(rgb[:, :, 0], (1 - bb) * 255)


def test_decode_is_total():
    """Corrupt fax payloads raise FaxError/ImageError, never anything
    else, never hang — errors-are-data at the extractor layer."""
    from docling_ray.stages.image_codec import ImageError, decode_frames

    rng = random.Random(3)
    bits = _random_bits(rng, 40, 20, run_heavy=True)
    for g4 in (True, False):
        data = bytearray(bilevel_to_tiff([bits], 40, 20, g4=g4))
        for _ in range(150):
            mut = bytearray(data)
            for _k in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            try:
                decode_frames(bytes(mut))
            except ImageError:
                pass
    raw = fax_g4_encode(bits)
    for cut in (0, 1, len(raw) // 2):
        with pytest.raises(FaxError):
            decode_g4(raw[:cut] if cut else b"", 40, 20)


def test_image_doc_generator_roundtrip():
    """Fax variant flows through the corpus generator round trip."""
    from docling_ray.stages.image_codec import extract_image_unit
    from docling_ray.synth import build_image_doc

    rng = random.Random(5)
    n_fax = 0
    for i in range(250):
        b64, exp, _status = build_image_doc(rng, f"img-{i}")
        got = [tuple(s) for s in extract_image_unit(b64)[0]]
        assert got == exp, i
        if any("/1/" in r for (_k, _t, r) in exp):
            n_fax += 1
    assert n_fax >= 5  # the fax variant is actually exercised


def test_pdf_ccittfax_xobject_roundtrip():
    """Embedded /CCITTFaxDecode image XObjects decode to the same
    imgpx:// fingerprint the generator hand-computes (G4 and aligned-MH,
    BlackIs1 both ways)."""
    import random

    from docling_ray.stages.pdf_bytes import extract_pdf_bytes_unit
    from docling_ray.synth import VOCAB, build_pdf_bytes_doc

    rng = random.Random(17)
    n_ccitt = 0
    for i in range(120):
        b64, exp, _st, _out, _lk = build_pdf_bytes_doc(
            rng, VOCAB[:], f"pd-{i}")
        got = [tuple(s) for s in extract_pdf_bytes_unit(b64)[0]]
        assert got == exp, i
        if any("/1/" in str(x) for x in exp):
            n_ccitt += 1
    assert n_ccitt >= 5


def test_pbm_and_raw_bilevel_tiff_roundtrip():
    """P1/P4 PBM and uncompressed packed-bit TIFF round trip; odd
    widths exercise the row byte-padding."""
    import numpy as np

    from docling_ray.stages.image_codec import decode_pnm, decode_tiff
    from docling_ray.synth import bilevel_to_tiff, bits_to_pbm

    rng = random.Random(13)
    for w, h in ((1, 1), (7, 3), (8, 2), (9, 5), (33, 4)):
        bits = (np.frombuffer(rng.randbytes(w * h), np.uint8)
                .reshape(h, w) & 1).astype(np.uint8)
        want = (1 - bits) * 255
        for ascii_ in (False, True):
            rgb, mode = decode_pnm(bits_to_pbm(bits, ascii_=ascii_))
            assert mode == "1" and np.array_equal(rgb[:, :, 0], want)
        rgb, mode = decode_tiff(
            bilevel_to_tiff([bits], w, h, compression="none"))[0]
        assert mode == "1" and np.array_equal(rgb[:, :, 0], want)


def test_lowbpp_bmp_roundtrip():
    """1/4-bit paletted BMP (plain rows and RLE4) round trips; odd
    widths exercise nibble/bit packing and 4-byte row padding."""
    import numpy as np

    from docling_ray.stages.image_codec import decode_bmp
    from docling_ray.synth import pixels_to_bmp_lowbpp

    rng = random.Random(3)
    for w, h, bpp, rle4 in ((7, 3, 4, False), (9, 2, 4, True),
                            (13, 5, 1, False), (8, 4, 1, False),
                            (1, 1, 4, True)):
        nc = 2 if bpp == 1 else 16
        pal = rng.randbytes(3 * nc)
        rows = [bytes(rng.randrange(nc) for _ in range(w))
                for _ in range(h)]
        rgb, mode = decode_bmp(
            pixels_to_bmp_lowbpp(rows, w, h, pal, bpp, rle4=rle4))
        want = np.array([[list(pal[3 * i: 3 * i + 3]) for i in row]
                         for row in rows], dtype=np.uint8)
        assert mode == "P" and np.array_equal(rgb, want), (w, h, bpp)


def test_tiled_tiff_roundtrip():
    """Tiled TIFF organization (16x16, plain/LZW, per-tile predictor)
    round trips; non-multiple dimensions exercise edge-tile padding."""
    import numpy as np

    from docling_ray.stages.image_codec import decode_tiff
    from docling_ray.synth import pixels_to_tiff

    rng = random.Random(5)
    for w, h, lzw, pred in ((17, 9, False, False), (16, 16, True, False),
                            (40, 33, True, True), (48, 17, True, True)):
        rows = [rng.randbytes(3 * w) for _ in range(h)]
        out = decode_tiff(pixels_to_tiff(
            [rows, rows], w, h, gray=False, tiled=True, lzw=lzw,
            predictor=pred))
        want = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, 3)
        assert len(out) == 2
        for rgb, mode in out:
            assert mode == "RGB" and np.array_equal(rgb, want)


def test_g3_roundtrip_all_shapes():
    """K=0 (EOL / no-EOL / byte-aligned) and K>0 mixed 1D/2D round
    trip through decode_g3; encoder in synth, decoder in stages."""
    import numpy as np

    from docling_ray.stages.fax_codec import decode_g3
    from docling_ray.synth import fax_g3_encode

    rng = random.Random(4242)
    for _ in range(60):
        w, h = rng.randrange(1, 64), rng.randrange(1, 24)
        bits = np.zeros((h, w), np.uint8)
        for r in range(h):
            x = 0
            c = rng.randrange(2)
            while x < w:
                run = min(rng.randrange(1, w + 1), w - x)
                bits[r, x: x + run] = c
                x += run
                c ^= 1
        for k, eol, align in ((0, True, False), (0, False, False),
                              (0, True, True), (2, True, False),
                              (4, True, False), (4, True, True)):
            data = fax_g3_encode(bits, k=k, with_eol=eol,
                                 byte_align=align)
            got = decode_g3(data, w, h, k=k, byte_align=align)
            assert (got == bits).all(), (w, h, k, eol, align)


def test_g3_tiff_compression3_roundtrip():
    """TIFF Compression=3 (1D and mixed-2D T4Options) decodes."""
    import numpy as np

    from docling_ray.stages.image_codec import decode_tiff
    from docling_ray.synth import bilevel_to_tiff

    rng = random.Random(77)
    for g3_2d in (False, True):
        for g3_align in (False, True):
            bits = (np.frombuffer(rng.randbytes(30 * 12), np.uint8)
                    .reshape(12, 30) & 1).astype(np.uint8)
            data = bilevel_to_tiff([bits], 30, 12, compression="g3",
                                   g3_2d=g3_2d, g3_align=g3_align)
            rgb, mode = decode_tiff(data)[0]
            assert mode == "1"
            assert np.array_equal(rgb[:, :, 0], (1 - bits) * 255)


def test_g3_decoder_rejects_garbage():
    import pytest

    from docling_ray.stages.fax_codec import FaxError, decode_g3

    with pytest.raises(FaxError):
        decode_g3(b"\xff\xff\xff", 16, 4, k=0)
    with pytest.raises(FaxError):
        decode_g3(b"", 16, 4, k=4)


def test_g3_decode_is_total():
    """Corrupt Group-3 payloads raise FaxError/ImageError only."""
    import numpy as np

    from docling_ray.stages.image_codec import ImageError, decode_frames

    rng = random.Random(9)
    bits = (np.frombuffer(rng.randbytes(40 * 20), np.uint8)
            .reshape(20, 40) & 1).astype(np.uint8)
    for g3_2d in (False, True):
        data = bytearray(bilevel_to_tiff([bits], 40, 20,
                                         compression="g3", g3_2d=g3_2d))
        for _ in range(150):
            mut = bytearray(data)
            for _k in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            try:
                decode_frames(bytes(mut))
            except ImageError:
                pass
