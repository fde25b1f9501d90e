"""Image backend tests (stages/image_codec.py vs reference
image_backend.py:26,127 semantics).

Three independent legs, mirroring the pdf_bytes discipline:
  1. hand-written literal containers (every PNG filter type constructed
     byte-by-byte here, never by the writer under test);
  2. fresh-seed writer↔decoder round trips (synth writer is the
     independent implementation);
  3. poison inputs → errors-as-data, never exceptions.
"""

from __future__ import annotations

import base64
import random
import struct
import zlib

import numpy as np
import pytest

from docling_ray.stages.image_codec import (
    ImageError,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    extract_image_unit,
    image_to_page,
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _png(width, height, depth, ctype, raw_scanlines, palette=None):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, 0)
    out = [b"\x89PNG\r\n\x1a\n", _chunk(b"IHDR", ihdr)]
    if palette is not None:
        out.append(_chunk(b"PLTE", palette))
    out.append(_chunk(b"IDAT", zlib.compress(b"".join(raw_scanlines))))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


# --- PNG filter reconstruction, one literal per filter type ---------------

def test_png_filter_none():
    # 2x2 RGB, filter 0: stored bytes are the pixels
    rows = [b"\x00" + bytes([10, 20, 30, 40, 50, 60]),
            b"\x00" + bytes([70, 80, 90, 100, 110, 120])]
    arr, mode = decode_png(_png(2, 2, 8, 2, rows))
    assert mode == "RGB"
    assert arr.tolist() == [[[10, 20, 30], [40, 50, 60]],
                            [[70, 80, 90], [100, 110, 120]]]


def test_png_filter_sub():
    # filter 1: out[x] = stored[x] + out[x-bpp]; bpp=3 for RGB
    # want pixels (10,20,30),(15,25,35) → deltas (10,20,30),(5,5,5)
    rows = [b"\x01" + bytes([10, 20, 30, 5, 5, 5])]
    arr, _ = decode_png(_png(2, 1, 8, 2, rows))
    assert arr.tolist() == [[[10, 20, 30], [15, 25, 35]]]


def test_png_filter_up():
    # filter 2: out[x] = stored[x] + prev_row[x]
    rows = [b"\x00" + bytes([100, 100, 100]),
            b"\x02" + bytes([1, 2, 3])]
    arr, _ = decode_png(_png(1, 2, 8, 2, rows))
    assert arr.tolist() == [[[100, 100, 100]], [[101, 102, 103]]]


def test_png_filter_average():
    # filter 3: out[x] = stored[x] + floor((left + up)/2)
    # row0 filter0 = (100,2,8); row1 stored (10,10,10):
    #   x0: left=0 up=100 → 10+50=60 ; x1: left=0 up=2 → 10+1=11
    #   x2: left=0 up=8 → 10+4=14   (bpp=3: first 3 bytes have left=0)
    rows = [b"\x00" + bytes([100, 2, 8]),
            b"\x03" + bytes([10, 10, 10])]
    arr, _ = decode_png(_png(1, 2, 8, 2, rows))
    assert arr.tolist() == [[[100, 2, 8]], [[60, 11, 14]]]


def test_png_filter_paeth():
    # filter 4 on first row: a=left, b=0, c=0 → predictor = a (p = a)
    # gray 8-bit, width 3: stored (5, 5, 5) → out (5, 10, 15)
    rows = [b"\x04" + bytes([5, 5, 5])]
    arr, mode = decode_png(_png(3, 1, 8, 0, rows))
    assert mode == "L"
    assert arr[:, :, 0].tolist() == [[5, 10, 15]]


def test_png_paeth_second_row():
    # full Paeth: row1 with up/left/up-left all live.
    # row0 = (10, 20); row1 stored = (1, 1) gray bpp=1
    #   x0: a=0 b=10 c=0 → p=10 closest to b → pred=10 → out=11
    #   x1: a=11 b=20 c=10 → p=21: pa=10 pb=1 pc=11 → pred=b=20 → out=21
    rows = [b"\x00" + bytes([10, 20]), b"\x04" + bytes([1, 1])]
    arr, _ = decode_png(_png(2, 2, 8, 0, rows))
    assert arr[:, :, 0].tolist() == [[10, 20], [11, 21]]


def test_png_palette_subbyte_depths():
    # 1-bit palette: 4 px/row packed into 1 byte (0b1010....)
    pal = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    rows = [b"\x00" + bytes([0b10100000])]
    arr, mode = decode_png(_png(4, 1, 1, 3, rows, palette=pal))
    assert mode == "P"
    assert arr.tolist() == [[[0, 0, 255], [255, 0, 0], [0, 0, 255],
                             [255, 0, 0]]]
    # 4-bit palette, 2 px in 1 byte
    pal = bytes(range(48))  # 16 colors
    rows = [b"\x00" + bytes([0x21])]
    arr, _ = decode_png(_png(2, 1, 4, 3, rows, palette=pal))
    assert arr.tolist() == [[[6, 7, 8], [3, 4, 5]]]


def test_png_16bit_high_byte():
    # 16-bit gray: sample 0xABCD → high byte 0xAB
    rows = [b"\x00" + bytes([0xAB, 0xCD])]
    arr, _ = decode_png(_png(1, 1, 16, 0, rows))
    assert arr.tolist() == [[[0xAB, 0xAB, 0xAB]]]


def test_png_rgba_drops_alpha():
    rows = [b"\x00" + bytes([1, 2, 3, 200])]
    arr, mode = decode_png(_png(1, 1, 8, 6, rows))
    assert mode == "RGBA"
    assert arr.tolist() == [[[1, 2, 3]]]


# --- BMP ------------------------------------------------------------------

def _bmp24(width, height_field, bgr_raster):
    header = (b"BM" + struct.pack("<IHHI", 54 + len(bgr_raster), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height_field, 1, 24,
                            0, len(bgr_raster), 0, 0, 0, 0))
    return header + bgr_raster


def test_bmp_bottom_up_and_padding():
    # 1x2 bottom-up: rows stored last-first; row stride pads 3→4 bytes
    raster = bytes([30, 20, 10, 0,     # bottom row BGR + pad
                    60, 50, 40, 0])    # top row
    arr, mode = decode_bmp(_bmp24(1, 2, raster))
    assert mode == "RGB"
    assert arr.tolist() == [[[40, 50, 60]], [[10, 20, 30]]]


def test_bmp_top_down():
    raster = bytes([3, 2, 1, 0, 6, 5, 4, 0])
    arr, _ = decode_bmp(_bmp24(1, -2, raster))
    assert arr.tolist() == [[[1, 2, 3]], [[4, 5, 6]]]


# --- PNM ------------------------------------------------------------------

def test_pnm_p6_and_comment_header():
    data = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    arr, mode = decode_pnm(data)
    assert mode == "RGB"
    assert arr.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_pnm_ascii_and_16bit_maxval():
    arr, mode = decode_pnm(b"P2\n2 1\n255\n0 128\n")
    assert mode == "L"
    assert arr[:, :, 0].tolist() == [[0, 128]]
    # maxval 65535: 16-bit big-endian samples, scaled to 8-bit
    data = b"P5\n1 1\n65535\n" + bytes([0xFF, 0xFF])
    arr, _ = decode_pnm(data)
    assert arr.tolist() == [[[255, 255, 255]]]


# --- round trip vs the independent writer ---------------------------------

def test_writer_decoder_round_trip_fresh_seeds():
    from docling_ray.synth import build_image_doc

    for i in range(60):
        rng = random.Random(77_000 + i)
        b64, exp, status = build_image_doc(rng, f"rt-{i}")
        spans, _, score, err = extract_image_unit(b64)
        assert err is None and score == 1.0
        assert [tuple(s) for s in spans] == [tuple(e) for e in exp]


# --- poison: errors are data ----------------------------------------------

@pytest.mark.parametrize("payload", [
    "not base64 at all!!",
    base64.b64encode(b"\x89PNG\r\n\x1a\n" + b"garbage").decode(),
    base64.b64encode(b"\xff\xd8\xff\xe0 jpeg here").decode(),     # JPEG
    base64.b64encode(b"II*\x00tiff").decode(),                    # TIFF
    base64.b64encode(b"random junk that is long enough").decode(),
    base64.b64encode(b"BM" + b"\x00" * 20).decode(),              # short BMP
    base64.b64encode(b"P6\n4 4\n255\n" + b"\x00" * 5).decode(),   # truncated
])
def test_poison_becomes_error_string(payload):
    spans, page_no, score, err = extract_image_unit(payload)
    assert spans == [] and err is not None


def test_png_crc_and_unknown_interlace():
    rows = [b"\x00" + bytes([1, 2, 3])]
    good = _png(1, 1, 8, 2, rows)
    bad_crc = good[:-8] + b"\x00\x00\x00\x00" + good[-4:]
    with pytest.raises(ImageError):
        decode_png(bad_crc)
    # Adam7 (method 1) decodes: a 1x1 image is pass 1 alone
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    interlaced = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                  + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
                  + _chunk(b"IEND", b""))
    arr, _ = decode_png(interlaced)
    assert arr.tolist() == [[[1, 2, 3]]]
    # unknown interlace methods still reject
    ihdr2 = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 2)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr2)
           + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
           + _chunk(b"IEND", b""))
    with pytest.raises(ImageError, match="interlace"):
        decode_png(bad)


def test_decode_image_dispatch():
    rows = [b"\x00" + bytes([9, 9, 9])]
    arr, mode, fmt = decode_image(_png(1, 1, 8, 2, rows))
    assert fmt == "png"
    with pytest.raises(ImageError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xdb rest")
    with pytest.raises(ImageError, match="magic"):
        decode_image(b"totally unknown bytes")


# --- TIFF ----------------------------------------------------------------

def test_tiff_packbits_rle_runs():
    # RLE runs (257-n repeats) which the literal-only writer never emits
    from docling_ray.stages.image_codec import decode_tiff
    from docling_ray.synth import pixels_to_tiff

    rows = [bytes([7] * 6)]  # 2x1 RGB of (7,7,7)(7,7,7)
    data = bytearray(pixels_to_tiff([rows], 2, 1, gray=False))
    # replace the strip: find the literal-encoded strip is not there
    # (writer wrote compression=1); craft a PackBits strip by hand
    import struct as st

    # simplest: write uncompressed via writer, then decode a hand-built
    # PackBits variant: header says 32773, strip = [0xFB, 7] (repeat 6x)
    hand = bytearray(b"II*\x00" + st.pack("<I", 8))
    # no: use the writer for structure, only verify _unpackbits_decode
    from docling_ray.stages.image_codec import _unpackbits_decode

    assert _unpackbits_decode(bytes([0xFB, 7]), 6) == bytes([7] * 6)
    assert _unpackbits_decode(bytes([2, 1, 2, 3]), 3) == bytes([1, 2, 3])
    with pytest.raises(ImageError):
        _unpackbits_decode(bytes([0xFB]), 6)


def test_tiff_big_endian_and_white_is_zero():
    import struct as st

    # hand-built big-endian 2x1 gray, WhiteIsZero, one strip
    strip = bytes([0, 255])
    ifd_off = 8 + len(strip)

    def ent(tag, typ, cnt, val):
        if typ == 3:
            return st.pack(">HHIHH", tag, typ, cnt, val, 0)
        return st.pack(">HHII", tag, typ, cnt, val)

    entries = [ent(256, 4, 1, 2), ent(257, 4, 1, 1), ent(258, 3, 1, 8),
               ent(259, 3, 1, 1), ent(262, 3, 1, 0),  # WhiteIsZero
               ent(273, 4, 1, 8), ent(277, 3, 1, 1), ent(278, 4, 1, 1),
               ent(279, 4, 1, 2)]
    data = (b"MM\x00*" + st.pack(">I", ifd_off) + strip
            + st.pack(">H", len(entries)) + b"".join(entries)
            + st.pack(">I", 0))
    from docling_ray.stages.image_codec import decode_tiff

    frames = decode_tiff(data)
    assert len(frames) == 1
    arr, mode = frames[0]
    assert mode == "L"
    # inverted: 0 → white (255), 255 → black (0)
    assert arr[0, 0].tolist() == [255, 255, 255]
    assert arr[0, 1].tolist() == [0, 0, 0]


def test_tiff_multipage_round_trip():
    import random

    from docling_ray.stages.image_codec import decode_tiff
    from docling_ray.synth import pixels_to_tiff

    rng = random.Random(9)
    frames = [[rng.randbytes(9) for _ in range(2)] for _ in range(3)]
    data = pixels_to_tiff(frames, 3, 2, gray=False, packbits=True)
    out = decode_tiff(data)
    assert len(out) == 3
    for rows, (arr, mode) in zip(frames, out):
        assert mode == "RGB"
        assert arr.tobytes() == b"".join(rows)


# --- GIF -----------------------------------------------------------------

def test_gif_round_trip_and_multiframe():
    from docling_ray.stages.image_codec import decode_gif
    from docling_ray.synth import pixels_to_gif

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    f1 = bytes([0, 1, 2, 3, 0, 1])  # 3x2
    f2 = bytes([3, 3, 3, 0, 0, 0])
    data = pixels_to_gif([f1, f2], 3, 2, pal)
    frames = decode_gif(data)
    assert len(frames) == 2
    arr1, mode = frames[0]
    assert mode == "P"
    assert arr1[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert frames[1][0][0, 0].tolist() == [9, 9, 9]  # row 0 = index 3s
    assert frames[1][0][1, 0].tolist() == [255, 0, 0]


def test_gif_subrect_frame_composes_on_screen():
    import struct as st

    # 2x2 screen, bg=1 (green); frame covers only the right column
    pal = bytes([255, 0, 0, 0, 255, 0])
    from docling_ray.synth import _gif_lzw_encode

    out = bytearray(b"GIF89a" + st.pack("<HH", 2, 2))
    out.append(0x80)  # GCT, depth 1 (2 colors)
    out += bytes([1, 0])  # bg index 1
    out += pal
    enc = _gif_lzw_encode(2, bytes([0, 0]))  # 1x2 frame of color 0
    out += b"\x2c" + st.pack("<HHHH", 1, 0, 1, 2) + bytes([0, 2])
    out.append(len(enc))
    out += enc + b"\x00" + b"\x3b"
    from docling_ray.stages.image_codec import decode_gif

    (arr, mode), = decode_gif(bytes(out))
    assert arr[0, 0].tolist() == [0, 255, 0]   # bg green
    assert arr[0, 1].tolist() == [255, 0, 0]   # frame red
    assert arr[1, 1].tolist() == [255, 0, 0]


# --- OCR-path wrapping (reference: whole page is one bitmap rect) ---------

def test_image_to_page_feeds_ocr_stage():
    import json

    import pyarrow as pa

    from docling_ray.stages.ocr import OcrStage, select_ocr_rects

    arr = np.zeros((10, 20, 3), dtype=np.uint8)
    page = image_to_page(arr, "imgpx://20x10/RGB/0000000000000000")
    assert page["cells"] == [] and page["width"] == 20.0
    rects = select_ocr_rects(page)
    assert len(rects) == 1 and rects[0]["r"] == 20.0
    stage = OcrStage(engine="fake")
    out = stage(pa.table({
        "doc_id": ["d1"], "payload": [json.dumps(page)]}))
    assert out.num_rows == 1
    assert out["ocr_text"][0].as_py().startswith("ocr_")


def test_detect_image_kind():
    from docling_ray.stages.detect import sniff_kind

    rows = [b"\x00" + bytes([9, 9, 9])]
    png_b64 = base64.b64encode(_png(1, 1, 8, 2, rows)).decode()
    assert sniff_kind(png_b64) == "image"
    bmp_b64 = base64.b64encode(
        _bmp24(1, 1, bytes([1, 2, 3, 0]))).decode()
    assert sniff_kind(bmp_b64) == "image"


# --- fuzz: decoders are total functions -----------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=512))
    def test_fuzz_decode_never_raises_unexpected(data):
        from docling_ray.stages.image_codec import decode_frames

        try:
            decode_frames(data)
        except ImageError:
            pass  # the only allowed failure mode

    @settings(max_examples=100, deadline=None)
    @given(st.binary(min_size=0, max_size=256))
    def test_fuzz_valid_magic_corrupt_body(data):
        from docling_ray.stages.image_codec import decode_frames

        for magic in (b"\x89PNG\r\n\x1a\n", b"BM", b"P6\n", b"II*\x00",
                      b"MM\x00*", b"GIF89a", b"\xff\xd8\xff\xe0",
                      b"RIFF\xff\x00\x00\x00WEBPVP8L\xf0\x00\x00\x00",
                      b"RIFF\x10\x00\x00\x00WEBP"):
            try:
                decode_frames(magic + data)
            except ImageError:
                pass
except ImportError:  # pragma: no cover
    pass


# --- JPEG (baseline sequential) -------------------------------------------

def test_colorspace_literals():
    """Pin the shared JFIF conversions by hand-computed values — the one
    band of code the generator and decoder share for JPEG."""
    import numpy as np

    from docling_ray.functions.colorspace import rgb_to_ycbcr, ycbcr_to_rgb

    # pure colors, hand-evaluated from the ITU-T T.871 formulas
    assert rgb_to_ycbcr(np.array([[0, 0, 0]], np.uint8)).tolist() == [[0, 128, 128]]
    assert rgb_to_ycbcr(np.array([[255, 255, 255]], np.uint8)).tolist() == [[255, 128, 128]]
    # R=255: Y=76.245→76, Cb=128-43.028=84.97→85, Cr=128+127.5=255.5→255
    assert rgb_to_ycbcr(np.array([[255, 0, 0]], np.uint8)).tolist() == [[76, 85, 255]]
    # G=255: Y=149.685→150, Cb=128-84.47=43.53→44, Cr=128-106.77=21.23→21
    assert rgb_to_ycbcr(np.array([[0, 255, 0]], np.uint8)).tolist() == [[150, 44, 21]]
    # inverse: Y=76,Cb=85,Cr=255 → R=76+1.402*127=254.054→254
    assert ycbcr_to_rgb(np.array([[76, 85, 255]], np.uint8)).tolist()[0][0] == 254
    # gray axis is exact both ways
    g = np.array([[128, 128, 128]], np.uint8)
    assert ycbcr_to_rgb(rgb_to_ycbcr(g)).tolist() == [[128, 128, 128]]


def test_jpeg_gray_constant_tiles_exact():
    import numpy as np

    from docling_ray.stages.image_codec import decode_jpeg
    from docling_ray.synth import pixels_to_jpeg

    rng = np.random.RandomState(3)
    w, h = 24, 16
    tiles = rng.randint(0, 256, size=(h // 8, w // 8), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    data = pixels_to_jpeg([img[r].tobytes() for r in range(h)], w, h,
                          gray=True)
    arr, mode = decode_jpeg(data)
    assert mode == "L"
    assert np.array_equal(arr[..., 0], img)
    assert np.array_equal(arr[..., 0], arr[..., 2])


def test_jpeg_color_444_and_420_exact_on_mcu_tiles():
    import numpy as np

    from docling_ray.functions.colorspace import rgb_to_ycbcr, ycbcr_to_rgb
    from docling_ray.stages.image_codec import decode_jpeg
    from docling_ray.synth import pixels_to_jpeg

    rng = np.random.RandomState(4)
    for sub, t, w, h in (("444", 8, 24, 16), ("420", 16, 48, 32)):
        tiles = rng.randint(0, 256, size=(h // t, w // t, 3), dtype=np.uint8)
        img = np.repeat(np.repeat(tiles, t, axis=0), t, axis=1)
        data = pixels_to_jpeg([img[r].tobytes() for r in range(h)], w, h,
                              gray=False, subsample=sub)
        arr, mode = decode_jpeg(data)
        assert mode == "RGB"
        assert np.array_equal(arr, ycbcr_to_rgb(rgb_to_ycbcr(img))), sub


def test_jpeg_identity_quant_is_near_lossless_on_noise():
    import numpy as np

    from docling_ray.stages.image_codec import decode_jpeg
    from docling_ray.synth import pixels_to_jpeg

    rng = np.random.RandomState(5)
    w, h = 21, 13  # non-multiple-of-8 exercises padding + crop
    img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    data = pixels_to_jpeg([img[r].tobytes() for r in range(h)], w, h,
                          gray=True, restart_interval=2)
    arr, _ = decode_jpeg(data)
    assert arr.shape == (h, w, 3)
    assert np.abs(arr[..., 0].astype(int) - img.astype(int)).max() <= 1


def test_jpeg_rejects_progressive_and_bad_streams():
    import struct as st

    import pytest as _pytest

    from docling_ray.stages.image_codec import ImageError, decode_jpeg

    # SOF9 (arithmetic) after a minimal DQT
    arith = (b"\xff\xd8"
             + b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + bytes(64)
             + b"\xff\xc9" + st.pack(">H", 11)
             + st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with _pytest.raises(ImageError, match="arithmetic"):
        decode_jpeg(arith)
    # SOF2 (progressive) is supported, but a scanless file still errors
    prog = (b"\xff\xd8"
            + b"\xff\xdb" + st.pack(">H", 67) + b"\x00" + bytes(64)
            + b"\xff\xc2" + st.pack(">H", 11)
            + st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
            + b"\xff\xd9")
    with _pytest.raises(ImageError, match="SOS"):
        decode_jpeg(prog)
    with _pytest.raises(ImageError, match="SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    # zero-length segment must not loop forever
    with _pytest.raises(ImageError):
        decode_jpeg(b"\xff\xd8\xff\xdb\x00\x00\xff\xd9")


def test_jpeg_corpus_variants_round_trip():
    """The synth image-doc JPEG variants (10: gray, 11: color) round-trip
    through extract_image_unit against their hand-computed refs."""
    import random

    from docling_ray.stages.image_codec import extract_image_unit
    from docling_ray.synth import build_image_doc

    seen = set()
    for t in range(200):
        rng = random.Random(9_000 + t)
        variant_probe = random.Random(9_000 + t)
        variant_probe.randrange(8, 49), variant_probe.randrange(8, 41)
        variant = variant_probe.randrange(12)
        b64, exp, status = build_image_doc(rng, f"jp-{t}")
        spans, _, score, err = extract_image_unit(b64)
        assert err is None, err
        assert [tuple(s) for s in spans] == [tuple(e) for e in exp]
        seen.add(variant)
        if {10, 11} <= seen:
            break
    assert {10, 11} <= seen, "JPEG variants never drawn"


# --- progressive JPEG (spectral selection + successive approximation) ------

def test_jpeg_progressive_exact_on_constant_tiles():
    import numpy as np

    from docling_ray.stages.image_codec import decode_jpeg
    from docling_ray.synth import pixels_to_jpeg

    rng = np.random.RandomState(13)
    w, h = 24, 16
    tiles = rng.randint(0, 256, size=(h // 8, w // 8), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    data = pixels_to_jpeg([img[r].tobytes() for r in range(h)], w, h,
                          gray=True, progressive=True)
    arr, mode = decode_jpeg(data)
    assert mode == "L" and np.array_equal(arr[..., 0], img)


def test_jpeg_progressive_matches_baseline_coefficients():
    """The scan script (DC Al=1 -> AC bands Al=1 -> refinements to
    Al=0) reconstructs the exact same quantized coefficients as the
    sequential path, so decodes are pixel-identical — the refinement
    correction-bit interleave is bit-for-bit right or this fails."""
    import numpy as np

    from docling_ray.stages.image_codec import decode_jpeg
    from docling_ray.synth import pixels_to_jpeg

    rng = np.random.RandomState(14)
    for gray, sub, w, h in ((True, "444", 21, 13), (False, "444", 24, 16),
                            (False, "420", 40, 24)):
        if gray:
            img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        else:
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows = [img[r].tobytes() for r in range(h)]
        prog, _ = decode_jpeg(pixels_to_jpeg(rows, w, h, gray, sub,
                                             progressive=True))
        base, _ = decode_jpeg(pixels_to_jpeg(rows, w, h, gray, sub))
        assert np.array_equal(prog, base), (gray, sub)


def test_jpeg_progressive_long_eob_runs():
    """A nearly flat image with one AC-significant spot exercises
    multi-block EOB runs (EOBn, n >> 1) in every AC scan."""
    import numpy as np

    from docling_ray.stages.image_codec import decode_jpeg
    from docling_ray.synth import pixels_to_jpeg

    w, h = 64, 64
    img = np.full((h, w), 128, np.uint8)
    img[5, 5] = 131
    data = pixels_to_jpeg([img[r].tobytes() for r in range(h)], w, h,
                          gray=True, progressive=True)
    arr, _ = decode_jpeg(data)
    assert np.abs(arr[..., 0].astype(int) - img.astype(int)).max() <= 1


# --- WebP lossless (VP8L) ---------------------------------------------------

def _webp_rt(rows, w, h, **kw):
    import numpy as np

    from docling_ray.stages.webp_codec import decode_webp
    from docling_ray.synth import pixels_to_webp

    arr, mode = decode_webp(pixels_to_webp(rows, w, h, **kw))
    exp = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, 3)
    assert arr.shape == exp.shape
    assert (arr == exp).all(), kw


def test_webp_literal_round_trip():
    import random
    rng = random.Random(3)
    for _ in range(8):
        w, h = rng.randrange(1, 40), rng.randrange(1, 30)
        _webp_rt([rng.randbytes(3 * w) for _ in range(h)], w, h)


def test_webp_all_predictor_modes():
    import random
    rng = random.Random(4)
    for mode in range(14):
        w, h = rng.randrange(2, 25), rng.randrange(2, 20)
        rows = [rng.randbytes(3 * w) for _ in range(h)]
        _webp_rt(rows, w, h, predictor=mode)


def test_webp_transforms_and_entropy_features():
    import random
    rng = random.Random(5)
    w, h = 21, 13
    noise = [rng.randbytes(3 * w) for _ in range(h)]
    _webp_rt(noise, w, h, subtract_green=True)
    _webp_rt(noise, w, h, color_deltas=(200, 37, 129))
    _webp_rt(noise, w, h, predictor=12, subtract_green=True, cache_bits=5)
    pal = [bytes((i * 31 % 256, i * 7 % 256, i * 91 % 256)) for i in range(5)]
    runs = [b"".join(pal[rng.randrange(5)] * 3 for _ in range(7)) for _ in range(h)]
    _webp_rt(runs, 21, h, lz_runs=True)
    _webp_rt(runs, 21, h, cache_bits=6, lz_runs=True)
    for ncol in (2, 4, 16):  # bundling widths 3/2/1
        rows = [b"".join(pal[rng.randrange(min(ncol, 5))]
                         for _ in range(w)) for _ in range(h)]
        _webp_rt(rows, w, h, palette=True)


def test_webp_distance_map_pinned():
    """First entries of the generated 2D distance map vs the published
    spec table (RFC 9649 §4.2.2) — pins the generation rule."""
    from docling_ray.stages.webp_codec import _DIST_MAP

    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[:20] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3)]
    assert _DIST_MAP[-4:] == [(7, 7), (-7, 7), (8, 6), (8, 7)]


def test_webp_rejects_truncated_lossy_and_garbage():
    import pytest

    from docling_ray.stages.image_codec import ImageError, decode_frames
    from docling_ray.stages.webp_codec import decode_webp

    # a 4-byte VP8 chunk is a truncated frame header, not a clean image
    lossy = b"RIFF\x14\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00"
    with pytest.raises(ImageError, match="truncated"):
        decode_webp(lossy)
    with pytest.raises(ImageError):
        decode_webp(b"RIFF\x08\x00\x00\x00WEBPJUNK")
    with pytest.raises(ImageError):
        decode_frames(b"RIFF\x0c\x00\x00\x00WEBPVP8L\x02\x00\x00\x00\x00\x00")


def test_webp_vp8x_container_scan():
    """A VP8X extended container whose VP8L chunk comes after metadata
    chunks still decodes (the RIFF walk skips unknown chunks)."""
    import struct

    from docling_ray.stages.webp_codec import decode_webp
    from docling_ray.synth import pixels_to_webp

    rows = [bytes((9, 8, 7)) * 4 for _ in range(3)]
    plain = pixels_to_webp(rows, 4, 3)
    vp8l_chunk = plain[12:]  # "VP8L" + size + payload
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    exif = b"EXIF" + struct.pack("<I", 3) + b"abc\x00"  # odd size, padded
    body = b"WEBP" + vp8x + exif + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    arr, _ = decode_webp(data)
    assert arr.shape == (3, 4, 3)
    assert (arr == [9, 8, 7]).all()


def test_webp_corpus_variant_round_trip():
    """build_image_doc's webp variant: decoded fingerprint must equal the
    generator's hand-computed media_ref across seeds."""
    import random

    from docling_ray.stages.image_codec import extract_image_unit
    from docling_ray.synth import build_image_doc

    seen = 0
    for i in range(300):
        rng = random.Random(1000 + i)
        b64, exp_spans, status = build_image_doc(rng, f"wp{i}")
        import base64 as b64mod
        data = b64mod.b64decode(b64)
        if not (data[:4] == b"RIFF" and data[8:12] == b"WEBP"):
            continue
        seen += 1
        spans, _, _, err = extract_image_unit(b64)
        assert err is None, err
        assert [(k, t, m) for k, t, m in spans] == list(exp_spans)
    assert seen >= 5, f"only {seen} webp variants in 300 seeds"


# --- PNG Adam7 interlace ----------------------------------------------------

def test_adam7_pass_table_partitions_grid():
    """The seven passes exactly tile the 8x8 reference grid (libpng
    canonical layout — row 0 reads 1 6 4 6 2 6 4 6)."""
    from docling_ray.stages.image_codec import _ADAM7

    grid = {}
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
        for y in range(y0, 8, dy):
            for x in range(x0, 8, dx):
                assert (x, y) not in grid
                grid[(x, y)] = p + 1
    assert len(grid) == 64
    assert [grid[(x, 0)] for x in range(8)] == [1, 6, 4, 6, 2, 6, 4, 6]
    assert [grid[(x, 1)] for x in range(8)] == [7] * 8


def test_adam7_round_trip_all_color_types():
    import random

    from docling_ray.synth import pixels_to_png

    rng = random.Random(21)
    for ct, spp in ((0, 1), (2, 3), (3, 1), (6, 4)):
        for _ in range(4):
            w, h = rng.randrange(1, 36), rng.randrange(1, 30)
            rows = [rng.randbytes(spp * w) for _ in range(h)]
            pal = None
            if ct == 3:
                pal = rng.randbytes(3 * 16)
                rows = [bytes(b % 16 for b in r) for r in rows]
            arr, _ = decode_png(pixels_to_png(rows, w, h, color_type=ct,
                                              palette=pal, interlace=True))
            seq, _ = decode_png(pixels_to_png(rows, w, h, color_type=ct,
                                              palette=pal))
            assert (arr == seq).all(), (ct, w, h)


def test_adam7_literal_tiny():
    """2x2 RGB interlaced by hand: pass 1 carries (0,0), pass 2/3 empty,
    pass 4 empty (w<3), pass 5 empty (h<3), pass 6 carries (1,0)? —
    no: for 2x2, pass 1=(0,0), 6=(1,0), 7=(0,1),(1,1)."""
    import struct as st
    import zlib as zl

    def chunk(tag, payload):
        return (st.pack(">I", len(payload)) + tag + payload
                + st.pack(">I", zl.crc32(tag + payload) & 0xFFFFFFFF))

    px = {(0, 0): b"\x10\x20\x30", (1, 0): b"\x40\x50\x60",
          (0, 1): b"\x70\x80\x90", (1, 1): b"\xa0\xb0\xc0"}
    body = (b"\x00" + px[(0, 0)]          # pass 1
            + b"\x00" + px[(1, 0)]        # pass 6
            + b"\x00" + px[(0, 1)] + px[(1, 1)])  # pass 7
    ihdr = st.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zl.compress(body)) + chunk(b"IEND", b""))
    arr, mode = decode_png(data)
    assert mode == "RGB"
    assert arr.tolist() == [[[0x10, 0x20, 0x30], [0x40, 0x50, 0x60]],
                            [[0x70, 0x80, 0x90], [0xA0, 0xB0, 0xC0]]]


def test_gif_disposal_and_transparency_literal():
    """Hand-built 2-frame GIF: frame 1 paints a 1x1 subrect with a
    transparent-index pixel (leaves canvas) after frame 0 painted the
    screen; disposal 2 on frame 0 restores background first."""
    from docling_ray.stages.image_codec import decode_gif
    from docling_ray.synth import pixels_to_gif

    pal = bytes([10, 0, 0,  0, 20, 0,  0, 0, 30])  # idx0 bg, idx1, idx2
    # frame 0: full 2x1 screen [1, 2], disposal 2 (restore to bg after)
    # frame 1: rect (1,0,1,1) painting transparent idx 1 -> canvas kept
    data = pixels_to_gif(
        [bytes([1, 2]), bytes([1])], 2, 1, pal,
        frames_meta=[{"rect": (0, 0, 2, 1), "disposal": 2},
                     {"rect": (1, 0, 1, 1), "transparent": 1}])
    frames = decode_gif(data)
    assert len(frames) == 2
    f0 = frames[0][0].tolist()
    assert f0 == [[[0, 20, 0], [0, 0, 30]]]
    # after disposal 2 the canvas is bg (idx 0) everywhere; frame 1's
    # only pixel is transparent, so the composed frame is all-bg
    f1 = frames[1][0].tolist()
    assert f1 == [[[10, 0, 0], [10, 0, 0]]]


def test_gif_disposal_previous():
    """Disposal 3 restores the pre-frame canvas for the NEXT frame."""
    from docling_ray.stages.image_codec import decode_gif
    from docling_ray.synth import pixels_to_gif

    pal = bytes([1, 1, 1,  2, 2, 2,  3, 3, 3])
    data = pixels_to_gif(
        [bytes([0]), bytes([1]), bytes([2])], 1, 1, pal,
        frames_meta=[{}, {"rect": (0, 0, 1, 1), "disposal": 3}, {}])
    frames = decode_gif(data)
    assert [f[0][0, 0].tolist() for f in frames] == [
        [1, 1, 1], [2, 2, 2], [3, 3, 3]]
    # and with a transparent third frame the restored canvas (frame 0)
    # shows through
    data = pixels_to_gif(
        [bytes([0]), bytes([1]), bytes([2])], 1, 1, pal,
        frames_meta=[{}, {"rect": (0, 0, 1, 1), "disposal": 3},
                     {"transparent": 2}])
    frames = decode_gif(data)
    assert frames[2][0][0, 0].tolist() == [1, 1, 1]


def test_tiff_lzw_and_predictor():
    """Compression 5 (LZW, the PDF filter's wire format) with and
    without predictor 2 (horizontal differencing)."""
    import random

    from docling_ray.stages.image_codec import decode_tiff
    from docling_ray.synth import pixels_to_tiff

    rng = random.Random(8)
    frames = [[rng.randbytes(3 * 9) for _ in range(7)]]
    for pred in (False, True):
        arr, mode = decode_tiff(pixels_to_tiff(frames, 9, 7, gray=False,
                                               lzw=True, predictor=pred))[0]
        exp = np.frombuffer(b"".join(frames[0]), np.uint8).reshape(7, 9, 3)
        assert mode == "RGB" and (arr == exp).all(), pred


def test_bmp8_palette_rle_and_absolute_mode():
    """Paletted BMP: writer round trip for plain/RLE8, plus a hand-built
    RLE8 stream exercising absolute mode and the delta escape."""
    import struct as st

    from docling_ray.stages.image_codec import decode_bmp
    from docling_ray.synth import pixels_to_bmp8

    pal = bytes([250, 0, 0,  0, 250, 0,  0, 0, 250,  9, 9, 9])
    rows = [bytes([0, 1, 2, 3]), bytes([3, 3, 3, 3])]
    for rle in (False, True):
        arr, mode = decode_bmp(pixels_to_bmp8(rows, 4, 2, pal, rle=rle))
        assert mode == "P"
        assert arr[0].tolist() == [[250, 0, 0], [0, 250, 0],
                                   [0, 0, 250], [9, 9, 9]]
        assert arr[1].tolist() == [[9, 9, 9]] * 4
    # hand-built: absolute run of 3, delta (0,1), a run — 4x3 top-down
    quads = b"".join(bytes((pal[3*i+2], pal[3*i+1], pal[3*i], 0))
                     for i in range(4))
    raster = (b"\x00\x03" + bytes([0, 1, 2]) + b"\x00"  # absolute 3 + pad
              + b"\x00\x02\x00\x01"                      # delta dx=0 dy=1
              + b"\x01\x03"                              # run: one idx 3
              + b"\x00\x01")                             # end of bitmap
    pix_off = 54 + len(quads)
    hdr = (b"BM" + st.pack("<IHHI", pix_off + len(raster), 0, 0, pix_off)
           + st.pack("<IiiHHIIiiII", 40, 4, -3, 1, 8, 1, len(raster),
                     0, 0, 4, 0))  # top-down (negative height)
    arr, _ = decode_bmp(hdr + quads + raster)
    assert arr[0].tolist() == [[250, 0, 0], [0, 250, 0], [0, 0, 250],
                               [250, 0, 0]]  # idx 0,1,2, untouched bg 0
    assert arr[1].tolist() == [[250, 0, 0]] * 3 + [[9, 9, 9]]
    assert arr[2].tolist() == [[250, 0, 0]] * 4  # untouched bg row


def test_ico_literal_dib24_mask_and_dib32():
    """Hand-checkable ICO facts: AND-masked pixels go black in a 24-bpp
    DIB; a 32-bpp entry keeps RGB with alpha dropped; an embedded PNG
    payload routes through the PNG decoder; largest entry wins."""
    import numpy as np

    from docling_ray.stages.image_codec import decode_ico
    from docling_ray.synth import pixels_to_ico, pixels_to_png

    # 2x2 DIB24, mask hides the top-right pixel
    rows = [bytes((255, 0, 0, 0, 255, 0)), bytes((0, 0, 255, 9, 9, 9))]
    mask = [bytes((0, 1)), bytes((0, 0))]
    arr, mode = decode_ico(pixels_to_ico(rows, 2, 2, mask_rows=mask))
    assert mode == "RGB"
    assert arr.tolist() == [[[255, 0, 0], [0, 0, 0]],
                            [[0, 0, 255], [9, 9, 9]]]

    # DIB32: alpha dropped, mask ignored
    arr, mode = decode_ico(pixels_to_ico(rows, 2, 2, mask_rows=mask,
                                         alpha_rows=[b"\x00\x7f", b"\xff\x01"]))
    assert mode == "RGBA"
    assert arr.tolist() == [[[255, 0, 0], [0, 255, 0]],
                            [[0, 0, 255], [9, 9, 9]]]

    # PNG payload
    arr, mode = decode_ico(pixels_to_ico(rows, 2, 2, png=True))
    assert mode == "RGB" and arr.shape == (2, 2, 3)
    assert arr.tolist()[0][0] == [255, 0, 0]

    # two entries: the larger (second) one is decoded
    small = pixels_to_ico([b"\x01\x02\x03"], 1, 1)
    big = pixels_to_ico(rows, 2, 2)
    pay_s, pay_b = small[22:], big[22:]
    hdr = (b"\x00\x00\x01\x00\x02\x00"
           + bytes((1, 1, 0, 0)) + b"\x01\x00\x20\x00"
           + len(pay_s).to_bytes(4, "little") + (38).to_bytes(4, "little")
           + bytes((2, 2, 0, 0)) + b"\x01\x00\x20\x00"
           + len(pay_b).to_bytes(4, "little")
           + (38 + len(pay_s)).to_bytes(4, "little"))
    arr, _ = decode_ico(hdr + pay_s + pay_b)
    assert arr.shape == (2, 2, 3)
