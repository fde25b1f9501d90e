"""Raster image decoders built from scratch on stdlib zlib + numpy.

The reference's image backend (``docling/backend/image_backend.py:26,127``)
wraps PIL: an image file becomes a sequence of pages with no text cells and
one full-page bitmap rect, which the OCR stage then consumes. This module
rebuilds the decode layer without an imaging stack — the same playbook as
``stages/pdf_bytes.py`` (zlib is stdlib; PNG filter reconstruction is
arithmetic) — and :func:`image_to_page` reproduces the page-wrapping shape
(`_ImagePageBackend.get_bitmap_rects` yields the full page,
image_backend.py:79-91).

Supported containers (decode → HxWx3 uint8 RGB, like the reference's
eager ``.convert("RGB")``, image_backend.py:168):

* **PNG** — bit depth 8 and 16 (high byte) for gray/RGB/RGBA/gray+alpha,
  palette at bit depth 1/2/4/8, all five scanline filters, Adam7
  interlace (seven independently-filtered passes scattered onto the
  grid), tRNS ignored (RGB conversion drops alpha, PIL parity).
* **BMP** — uncompressed BI_RGB 24/32-bit, bottom-up or top-down
  rows; 1/4/8-bit paletted incl. BI_RLE8 and BI_RLE4 runs.
* **PNM** — binary P5 (gray) / P6 (RGB), maxval ≤ 65535 (16-bit scaled
  down by high byte), ASCII P2/P3, and P1/P4 PBM bitmaps.
* **TIFF** — baseline IFD walk (II/MM byte order), strip- OR
  tile-organized (TileWidth/TileLength, edge tiles padded) gray/RGB/
  RGBA at 8 bits/sample, compression 1 (none), 5 (LZW, optionally with
  predictor 2), 32773 (PackBits), packed 1-bit bilevel, and bilevel
  CCITT fax: 2 (MH RLE) and 4 (Group 4 / T.6 MMR) via
  ``stages/fax_codec.py``; multi-page via chained IFDs (each page a
  frame, the reference's eager multi-frame extraction,
  image_backend.py:160-170).
* **GIF** — LZW decode (variable code width, clear/EOI), global/local
  palettes, interlace, multi-frame animation composition over the
  logical screen honoring GCE transparency and disposal methods
  (keep / restore-to-background / restore-previous).

* **JPEG** — sequential baseline AND progressive DCT (ITU-T T.81):
  Huffman entropy decode from the file's own DHT tables, 8-bit
  quantization, gray or YCbCr with any sampling factors up to 2×2
  (4:4:4 / 4:2:2 / 4:2:0), restart intervals, progressive spectral
  selection + successive approximation (EOB runs, correction bits).
  The IDCT runs vectorized over all blocks of a component (one einsum
  against the 8×8 DCT basis). Arithmetic-coded and 12-bit variants are
  rejected with a clear error. The exact-fingerprint round trip holds
  because the generator writes constant-per-MCU tiles with identity
  quantization — a DC-only block reconstructs bit-exactly
  (see synth.pixels_to_jpeg).
* **WebP** — full decoders in ``stages/webp_codec.py``: lossless VP8L
  (all four transforms, color cache, meta groups, LZ77) and lossy VP8
  keyframes (RFC 6386: range decoder, all intra modes, token contexts,
  loop filter — bit-exact against libwebp in tests).

Out of scope in this container (documented, poison-safe): HEIC — this
raises :class:`ImageError`, which the extract path converts to a
``status="failure"`` row, never an exception (ConversionStatus parity,
base_models.py:85-91).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from docling_ray.functions.refs import image_media_ref


class ImageError(ValueError):
    """Malformed or unsupported image payload."""


def _max_pixels() -> int:
    """Per-frame decoded-pixel ceiling (settings kind ``image``) — the
    memory guard for adversarial headers claiming huge dimensions."""
    from docling_ray.settings import options_for

    return int(options_for("image").get("max_pixels", 64_000_000))


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/px


def _png_chunks(data: bytes):
    """Yield (type, payload) chunks; validates lengths + CRC."""
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        end = i + 8 + length
        if end + 4 > n:
            raise ImageError("PNG chunk truncated")
        payload = data[i + 8 : end]
        (crc,) = struct.unpack(">I", data[end : end + 4])
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ImageError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, payload
        i = end + 4
        if ctype == b"IEND":
            return
    raise ImageError("PNG missing IEND")


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct PNG scanlines (filters 0-4). ``raw`` is the inflated
    byte stream as uint8 of shape (height, 1 + stride); returns (height,
    stride). Sequential in rows (each row depends on the previous — the
    format's data dependency), vectorized across the row where the filter
    allows (None/Up are whole-row ops; Sub/Average/Paeth walk columns in
    steps of bpp with numpy slices)."""
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = int(raw[y, 0])
        row = raw[y, 1:].astype(np.uint16)
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ftype == 1:  # Sub
            rec = row.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = row.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = row.copy()
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb_ and pa_ <= pc_:
                    pred = a
                elif pb_ <= pc_:
                    pred = b
                else:
                    pred = c
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ImageError(f"PNG unknown filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _unpack_bits(row_bytes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """Sub-byte sample depths (palette/gray 1/2/4) → one sample per entry."""
    bits = np.unpackbits(row_bytes, axis=-1)
    if depth == 1:
        samples = bits
    else:
        per = 8 // depth
        shaped = bits.reshape(bits.shape[0], -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        samples = (shaped * weights).sum(axis=-1)
        del per
    return samples[:, :width].astype(np.uint8)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_recon(raw: bytes, width: int, height: int, depth: int,
                 channels: int) -> tuple[np.ndarray, bool]:
    """Adam7 deinterlace: seven independently-filtered sub-images
    scattered onto the full grid. Returns (plane, unpacked): for
    depth >= 8 the plane matches the sequential ``recon`` byte layout
    (height × width·bytes_per_px); for sub-byte depths it is one SAMPLE
    per entry (height × width) and ``unpacked`` is True."""
    sample_bits = depth * channels
    if depth >= 8:
        bpx = sample_bits // 8
        out = np.zeros((height, width * bpx), dtype=np.uint8)
    else:
        bpx = 0
        out = np.zeros((height, width), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * sample_bits + 7) // 8
        need = ph * (1 + stride)
        if pos + need > len(raw):
            raise ImageError("PNG interlaced pixel data truncated")
        sub = np.frombuffer(raw[pos: pos + need],
                            dtype=np.uint8).reshape(ph, 1 + stride)
        pos += need
        rec = _unfilter(sub, ph, stride, max(1, sample_bits // 8))
        ys = y0 + np.arange(ph) * dy
        xs = x0 + np.arange(pw) * dx
        if depth >= 8:
            px = rec[:, : pw * bpx].reshape(ph, pw, bpx)
            out.reshape(height, width, bpx)[np.ix_(ys, xs)] = px
        else:
            out[np.ix_(ys, xs)] = _unpack_bits(rec, depth, pw)
    if pos != len(raw):
        raise ImageError("PNG interlaced pixel data length mismatch")
    return out, depth < 8


def decode_png(data: bytes) -> tuple[np.ndarray, str]:
    """PNG bytes → (HxWx3 uint8 RGB array, original mode string)."""
    if data[:8] != PNG_SIG:
        raise ImageError("not a PNG (bad signature)")
    width = height = -1
    depth = ctype = interlace = 0
    palette: np.ndarray | None = None
    idat = bytearray()
    seen_ihdr = False
    for tag, payload in _png_chunks(data):
        if tag == b"IHDR":
            if len(payload) != 13:
                raise ImageError("PNG bad IHDR length")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if comp != 0 or filt != 0:
                raise ImageError("PNG unknown compression/filter method")
            seen_ihdr = True
        elif tag == b"PLTE":
            if len(payload) % 3:
                raise ImageError("PNG bad PLTE length")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
    if not seen_ihdr:
        raise ImageError("PNG missing IHDR")
    if width <= 0 or height <= 0 or width * height > _max_pixels():
        raise ImageError(f"PNG bad dimensions {width}x{height}")
    if interlace not in (0, 1):
        raise ImageError(f"PNG unknown interlace method {interlace}")
    if ctype not in _PNG_CHANNELS:
        raise ImageError(f"PNG unknown color type {ctype}")
    channels = _PNG_CHANNELS[ctype]
    if ctype == 3:
        if depth not in (1, 2, 4, 8):
            raise ImageError(f"PNG palette bit depth {depth} invalid")
        if palette is None:
            raise ImageError("PNG palette image missing PLTE")
    elif depth not in (8, 16):
        raise ImageError(f"PNG bit depth {depth} not supported")

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ImageError(f"PNG IDAT inflate failed: {e}") from None

    sample_bits = depth * channels
    pre_unpacked = False
    if interlace:
        recon, pre_unpacked = _adam7_recon(raw, width, height, depth,
                                           channels)
    else:
        stride = (width * sample_bits + 7) // 8
        if len(raw) != height * (1 + stride):
            raise ImageError(
                f"PNG pixel data length {len(raw)} != expected "
                f"{height * (1 + stride)}"
            )
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
        bpp = max(1, sample_bits // 8)
        recon = _unfilter(arr, height, stride, bpp)

    if ctype == 3:
        if pre_unpacked:
            idx = recon
        elif depth < 8:
            idx = _unpack_bits(recon, depth, width)
        else:
            idx = recon[:, :width]
        if int(idx.max(initial=0)) >= len(palette):
            raise ImageError("PNG palette index out of range")
        rgb = palette[idx]
        return rgb, "P"
    if depth == 16:
        # high byte (PIL I;16→L convention for display purposes)
        px = recon.reshape(height, width, channels, 2)[:, :, :, 0]
    else:
        px = recon.reshape(height, width, channels)
    if ctype == 0:
        return np.repeat(px, 3, axis=2), "L"
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2), "LA"
    if ctype == 2:
        return np.ascontiguousarray(px), "RGB"
    # ctype 6: RGBA → drop alpha (PIL convert("RGB") parity)
    return np.ascontiguousarray(px[:, :, :3]), "RGBA"


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def _bmp_rle8(data: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE8 → index grid in STORAGE row order (bottom-up handled by
    the caller). Escapes: 0=end-of-line, 1=end-of-bitmap, 2=delta;
    count>=3 after 0 is absolute mode (word-aligned)."""
    grid = np.zeros((height, width), np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= height or x + cnt > width:
                raise ImageError("BMP RLE8 run outside bitmap")
            grid[y, x: x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return grid
        elif val == 2:  # delta
            if i + 1 >= n:
                raise ImageError("BMP RLE8 truncated delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise ImageError("BMP RLE8 delta outside bitmap")
        else:  # absolute mode: val literal indices, padded to even
            if y >= height or x + val > width or i + val > n:
                raise ImageError("BMP RLE8 absolute run outside bitmap")
            grid[y, x: x + val] = np.frombuffer(data, np.uint8, val, i)
            x += val
            i += val + (val & 1)
    return grid


def _bmp_rle4(data: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE4 → index grid in STORAGE row order. Encoded runs
    alternate the byte's high/low nibbles; absolute mode packs two
    indices per byte, padded to a word boundary."""
    grid = np.zeros((height, width), np.uint8)
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run: alternating nibbles
            if y >= height or x + cnt > width:
                raise ImageError("BMP RLE4 run outside bitmap")
            pair = np.array([val >> 4, val & 0x0F], np.uint8)
            grid[y, x: x + cnt] = np.tile(pair, (cnt + 1) // 2)[:cnt]
            x += cnt
        elif val == 0:
            x, y = 0, y + 1
        elif val == 1:
            return grid
        elif val == 2:
            if i + 1 >= n:
                raise ImageError("BMP RLE4 truncated delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > width or y > height:
                raise ImageError("BMP RLE4 delta outside bitmap")
        else:  # absolute: val indices, two per byte, word-aligned
            nbytes = (val + 1) // 2
            if y >= height or x + val > width or i + nbytes > n:
                raise ImageError("BMP RLE4 absolute run outside bitmap")
            packed = np.frombuffer(data, np.uint8, nbytes, i)
            nibs = np.empty(nbytes * 2, np.uint8)
            nibs[0::2] = packed >> 4
            nibs[1::2] = packed & 0x0F
            grid[y, x: x + val] = nibs[:val]
            x += val
            i += nbytes + (nbytes & 1)
    return grid


def decode_bmp(data: bytes) -> tuple[np.ndarray, str]:
    """BMP bytes → (HxWx3 uint8 RGB, mode). BI_RGB 24/32-bit truecolor,
    plus 1/4/8-bit paletted (BI_RGB rows, BI_RLE8 or BI_RLE4 runs)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ImageError("not a BMP")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ImageError(f"BMP core header {hdr_size} not supported")
    width, height_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    clr_used = struct.unpack("<I", data[46:50])[0]
    allowed = {8: (0, 1), 4: (0, 2), 1: (0,), 24: (0,), 32: (0,)}
    if bpp not in allowed:
        raise ImageError(f"BMP {bpp}-bit not supported")
    if compression not in allowed[bpp]:
        raise ImageError(f"BMP compression {compression} not supported")
    if width <= 0 or height_raw == 0 or \
            width * abs(height_raw) > _max_pixels():
        raise ImageError(f"BMP bad dimensions {width}x{height_raw}")
    height = abs(height_raw)
    if bpp in (1, 4, 8):
        n_colors = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(data):
            raise ImageError("BMP palette truncated")
        quads = np.frombuffer(data, np.uint8, 4 * n_colors,
                              pal_off).reshape(n_colors, 4)
        palette = np.ascontiguousarray(quads[:, 2::-1])  # BGRx → RGB
        if compression == 1:
            grid = _bmp_rle8(data[pix_off:], width, height)
        elif compression == 2:
            grid = _bmp_rle4(data[pix_off:], width, height)
        else:
            row_bytes = ((width * bpp + 31) // 32) * 4
            need = pix_off + row_bytes * height
            if len(data) < need:
                raise ImageError(
                    f"BMP pixel data truncated ({len(data)} < {need})")
            rows = np.frombuffer(data, np.uint8, row_bytes * height,
                                 pix_off).reshape(height, row_bytes)
            if bpp == 8:
                grid = rows[:, :width]
            elif bpp == 4:
                nibs = np.empty((height, row_bytes * 2), np.uint8)
                nibs[:, 0::2] = rows >> 4
                nibs[:, 1::2] = rows & 0x0F
                grid = nibs[:, :width]
            else:
                grid = np.unpackbits(rows, axis=1)[:, :width]
        if int(grid.max(initial=0)) >= n_colors:
            raise ImageError("BMP palette index out of range")
        if height_raw > 0:  # bottom-up storage
            grid = grid[::-1]
        return np.ascontiguousarray(palette[grid]), "P"
    bytes_px = bpp // 8
    row_bytes = (width * bytes_px + 3) & ~3
    need = pix_off + row_bytes * height
    if len(data) < need:
        raise ImageError(f"BMP pixel data truncated ({len(data)} < {need})")
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=row_bytes * height, offset=pix_off)
    rows = raw.reshape(height, row_bytes)[:, : width * bytes_px]
    px = rows.reshape(height, width, bytes_px)
    if height_raw > 0:  # bottom-up storage
        px = px[::-1]
    # BGR(A) → RGB
    rgb = np.ascontiguousarray(px[:, :, 2::-1])
    return rgb, "RGB" if bpp == 24 else "RGBA"


# ---------------------------------------------------------------------------
# PNM (PPM/PGM)
# ---------------------------------------------------------------------------

def _pnm_header(data: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse PNM header fields after the magic, skipping comments.
    Returns (fields, offset-of-raster)."""
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < n_fields:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":
            while i < n and data[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ImageError("PNM truncated header")
        try:
            fields.append(int(data[i:j]))
        except ValueError:
            raise ImageError(f"PNM bad header token {data[i:j]!r}") from None
        i = j
    return fields, i + 1  # single whitespace after last field


def decode_pnm(data: bytes) -> tuple[np.ndarray, str]:
    """P5/P6 (binary) and P2/P3 (ASCII) → (HxWx3 uint8 RGB, mode);
    P1/P4 bitmaps (PBM: no maxval field, 1 = black; P4 rows packed
    MSB-first and byte-padded) → mode "1"."""
    magic = data[:2]
    if magic in (b"P1", b"P4"):
        (width, height), off = _pnm_header(data, 2)
        if width <= 0 or height <= 0 or width * height > _max_pixels():
            raise ImageError(f"PNM bad dimensions {width}x{height}")
        if magic == b"P1":
            body = np.frombuffer(data, np.uint8, offset=off - 1)
            digits = body[(body == 48) | (body == 49)]
            if len(digits) < width * height:
                raise ImageError("PBM ASCII raster truncated")
            bits = (digits[: width * height] == 49).astype(np.uint8) \
                .reshape(height, width)
        else:
            row_bytes = (width + 7) // 8
            need = height * row_bytes
            if len(data) < off + need:
                raise ImageError("PBM raster truncated")
            packed = np.frombuffer(data, np.uint8, count=need,
                                   offset=off).reshape(height, row_bytes)
            bits = np.unpackbits(packed, axis=1)[:, :width]
        gray = ((1 - bits) * 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2), "1"
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ImageError("not a PNM")
    gray = magic in (b"P2", b"P5")
    ascii_ = magic in (b"P2", b"P3")
    (width, height, maxval), off = _pnm_header(data, 3)
    if width <= 0 or height <= 0 or width * height > _max_pixels():
        raise ImageError(f"PNM bad dimensions {width}x{height}")
    if not 0 < maxval < 65536:
        raise ImageError(f"PNM bad maxval {maxval}")
    nsamp = width * height * (1 if gray else 3)
    if ascii_:
        try:
            vals = np.array(data[off - 1 :].split()[:nsamp], dtype=np.int64)
        except ValueError:
            raise ImageError("PNM bad ASCII sample") from None
        if len(vals) < nsamp:
            raise ImageError("PNM ASCII raster truncated")
        px = vals
    elif maxval < 256:
        if len(data) < off + nsamp:
            raise ImageError("PNM raster truncated")
        px = np.frombuffer(data, dtype=np.uint8, count=nsamp,
                           offset=off).astype(np.int64)
    else:
        if len(data) < off + 2 * nsamp:
            raise ImageError("PNM raster truncated")
        px = np.frombuffer(data, dtype=">u2", count=nsamp,
                           offset=off).astype(np.int64)
    if px.max(initial=0) > maxval:
        raise ImageError("PNM sample exceeds maxval")
    # scale to 8-bit (ties to PIL's point transform for non-255 maxval)
    if maxval != 255:
        px = (px * 255 + maxval // 2) // maxval
    px = px.astype(np.uint8)
    if gray:
        arr = px.reshape(height, width, 1)
        return np.repeat(arr, 3, axis=2), "L"
    return np.ascontiguousarray(px.reshape(height, width, 3)), "RGB"


# ---------------------------------------------------------------------------
# TIFF
# ---------------------------------------------------------------------------

def _unpackbits_decode(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF compression 32773) decode."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i: i + h + 1]
            i += h + 1
        elif h > 128:
            if i >= n:
                raise ImageError("TIFF PackBits truncated")
            out += data[i: i + 1] * (257 - h)
            i += 1
        # 128: no-op
    if len(out) < expected:
        raise ImageError("TIFF PackBits output short")
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> list[tuple[np.ndarray, str]]:
    """TIFF bytes → [(HxWx3 RGB, mode)] per page (chained IFDs)."""
    if data[:4] == b"II*\x00":
        end = "<"
    elif data[:4] == b"MM\x00*":
        end = ">"
    else:
        raise ImageError("not a TIFF")

    def u16(off: int) -> int:
        return struct.unpack(end + "H", data[off: off + 2])[0]

    def u32(off: int) -> int:
        return struct.unpack(end + "I", data[off: off + 4])[0]

    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

    def tag_values(entry_off: int) -> tuple[int, list[int]]:
        tag = u16(entry_off)
        typ = u16(entry_off + 2)
        cnt = u32(entry_off + 4)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            return tag, []
        total = size * cnt
        voff = entry_off + 8 if total <= 4 else u32(entry_off + 8)
        vals: list[int] = []
        for k in range(cnt):
            o = voff + k * size
            if typ == 3:
                vals.append(u16(o))
            elif typ == 4:
                vals.append(u32(o))
            elif typ in (1, 2):
                vals.append(data[o])
            else:  # rational: value = num/den truncated (resolution tags)
                vals.append(u32(o))
        return tag, vals

    frames: list[tuple[np.ndarray, str]] = []
    ifd = u32(4)
    seen: set[int] = set()
    while ifd and ifd not in seen and len(frames) < 64:
        seen.add(ifd)
        if ifd + 2 > len(data):
            raise ImageError("TIFF IFD out of range")
        n_ent = u16(ifd)
        tags: dict[int, list[int]] = {}
        for e in range(n_ent):
            tag, vals = tag_values(ifd + 2 + 12 * e)
            tags[tag] = vals
        nxt_off = ifd + 2 + 12 * n_ent
        ifd = u32(nxt_off) if nxt_off + 4 <= len(data) else 0

        width = tags.get(256, [0])[0]
        height = tags.get(257, [0])[0]
        bits = tags.get(258, [8])
        comp = tags.get(259, [1])[0]
        photometric = tags.get(262, [1])[0]
        strip_offs = tags.get(273, [])
        spp = tags.get(277, [1])[0]
        rows_per_strip = tags.get(278, [height])[0] or height
        strip_counts = tags.get(279, [])
        if width <= 0 or height <= 0 or width * height > _max_pixels():
            raise ImageError(f"TIFF bad dimensions {width}x{height}")
        if comp in (2, 3, 4):
            # CCITT fax (MH RLE / Group 3 / Group 4): bilevel strips
            # decode via the from-scratch T.4/T.6 decoder; each strip
            # is an independently-coded block. Compression 3 reads
            # T4Options (tag 292): bit 0 = 2D (mixed K>0 lines),
            # bit 2 = EOLs byte-aligned
            from docling_ray.stages.fax_codec import (FaxError,
                                                      decode_g3,
                                                      decode_g4,
                                                      decode_mh_rle)

            t4opts = tags.get(292, [0])[0]

            if spp != 1 or bits != [1]:
                raise ImageError(
                    f"TIFF fax needs 1-bit gray, got {bits}x{spp}")
            if photometric not in (0, 1):
                raise ImageError(
                    f"TIFF fax photometric {photometric} unsupported")
            if not strip_offs:
                raise ImageError("TIFF missing StripOffsets")
            if not strip_counts:
                strip_counts = [len(data) - strip_offs[0]]
            parts = []
            for si, (so, sc) in enumerate(zip(strip_offs, strip_counts)):
                n_rows = min(rows_per_strip, height - si * rows_per_strip)
                if n_rows <= 0:
                    break
                try:
                    strip = data[so: so + sc]
                    if comp == 4:
                        dec = decode_g4(strip, width, n_rows)
                    elif comp == 3:
                        dec = decode_g3(strip, width, n_rows,
                                        k=(2 if t4opts & 1 else 0),
                                        byte_align=bool(t4opts & 4))
                    else:
                        dec = decode_mh_rle(strip, width, n_rows)
                except FaxError as e:
                    raise ImageError(str(e)) from None
                parts.append(dec)
            bw = np.concatenate(parts, axis=0)
            if bw.shape[0] != height:
                raise ImageError("TIFF fax raster truncated")
            # decoded 1 = black run; photometric 0 (WhiteIsZero) is the
            # fax sense, photometric 1 inverts
            gray = ((1 - bw) if photometric == 0 else bw) \
                .astype(np.uint8) * 255
            frames.append((np.repeat(gray[:, :, None], 3, axis=2), "1"))
            continue
        if comp == 1 and bits == [1] and spp == 1:
            # packed bilevel: rows byte-padded, MSB-first (TIFF §4)
            if photometric not in (0, 1):
                raise ImageError(
                    f"TIFF bilevel photometric {photometric} unsupported")
            row_b = (width + 7) // 8
            raster = bytearray()
            for so, sc in zip(strip_offs, strip_counts):
                raster += data[so: so + sc]
            if len(raster) < height * row_b:
                raise ImageError("TIFF bilevel raster truncated")
            packed = np.frombuffer(bytes(raster), np.uint8,
                                   count=height * row_b) \
                .reshape(height, row_b)
            bw = np.unpackbits(packed, axis=1)[:, :width]
            gray = ((1 - bw) if photometric == 0 else bw) \
                .astype(np.uint8) * 255
            frames.append((np.repeat(gray[:, :, None], 3, axis=2), "1"))
            continue
        if any(b != 8 for b in bits):
            raise ImageError(f"TIFF bits/sample {bits} not supported")
        if comp not in (1, 5, 32773):
            raise ImageError(f"TIFF compression {comp} not supported")
        predictor = tags.get(317, [1])[0]
        if predictor not in (1, 2):
            raise ImageError(f"TIFF predictor {predictor} not supported")
        if spp not in (1, 3, 4):
            raise ImageError(f"TIFF {spp} samples/px not supported")
        tile_w = tags.get(322, [0])[0]
        tile_h = tags.get(323, [0])[0]
        if tile_w and tile_h:
            # tiled organization (the large-scan layout): each tile is
            # an independently-compressed FULL tile_w×tile_h block
            # (edges padded), stitched then cropped
            tile_offs = tags.get(324, [])
            tile_cnts = tags.get(325, [])
            if tile_w % 16 or tile_h % 16:
                raise ImageError("TIFF tile size must be multiple of 16")
            ntx = (width + tile_w - 1) // tile_w
            nty = (height + tile_h - 1) // tile_h
            if len(tile_offs) < ntx * nty or len(tile_cnts) < ntx * nty:
                raise ImageError("TIFF tile tables truncated")
            tbytes = tile_w * tile_h * spp
            full = np.zeros((nty * tile_h, ntx * tile_w, spp), np.uint8)
            for ti in range(ntx * nty):
                chunk = data[tile_offs[ti]: tile_offs[ti] + tile_cnts[ti]]
                if comp == 32773:
                    chunk = _unpackbits_decode(chunk, tbytes)
                elif comp == 5:
                    from docling_ray.stages.pdf_bytes import (
                        PdfError, _pdf_lzw_decode)

                    try:
                        chunk = _pdf_lzw_decode(chunk, early_change=1)
                    except PdfError as e:
                        raise ImageError(f"TIFF LZW: {e}") from None
                if len(chunk) < tbytes:
                    raise ImageError("TIFF tile truncated")
                t = np.frombuffer(chunk, np.uint8, tbytes) \
                    .reshape(tile_h, tile_w, spp)
                if predictor == 2:
                    t = (np.cumsum(t.astype(np.int64), axis=1) % 256) \
                        .astype(np.uint8)
                ty, tx = divmod(ti, ntx)
                full[ty * tile_h: (ty + 1) * tile_h,
                     tx * tile_w: (tx + 1) * tile_w] = t
            px = full[:height, :width]
            if spp == 1:
                if photometric == 0:
                    px = 255 - px
                frames.append((np.repeat(px, 3, axis=2), "L"))
            elif spp == 3:
                frames.append((np.ascontiguousarray(px), "RGB"))
            else:
                frames.append((np.ascontiguousarray(px[:, :, :3]),
                               "RGBA"))
            continue
        if not strip_offs:
            raise ImageError("TIFF missing StripOffsets")
        if not strip_counts:
            strip_counts = [width * height * spp]
        raster = bytearray()
        row_bytes = width * spp
        for si, (so, sc) in enumerate(zip(strip_offs, strip_counts)):
            chunk = data[so: so + sc]
            if comp == 32773:
                n_rows = min(rows_per_strip, height - si * rows_per_strip)
                chunk = _unpackbits_decode(chunk, n_rows * row_bytes)
            elif comp == 5:  # TIFF LZW: the PDF filter's wire format
                from docling_ray.stages.pdf_bytes import (PdfError,
                                                          _pdf_lzw_decode)

                try:
                    chunk = _pdf_lzw_decode(chunk, early_change=1)
                except PdfError as e:
                    raise ImageError(f"TIFF LZW: {e}") from None
            raster += chunk
        need = height * row_bytes
        if len(raster) < need:
            raise ImageError("TIFF raster truncated")
        px = np.frombuffer(bytes(raster[:need]), dtype=np.uint8) \
            .reshape(height, width, spp)
        if predictor == 2:  # horizontal differencing: cumsum per row
            px = (np.cumsum(px.astype(np.int64), axis=1) % 256) \
                .astype(np.uint8)
        if spp == 1:
            if photometric == 0:  # WhiteIsZero
                px = 255 - px
            frames.append((np.repeat(px, 3, axis=2), "L"))
        elif spp == 3:
            frames.append((np.ascontiguousarray(px), "RGB"))
        else:
            frames.append((np.ascontiguousarray(px[:, :, :3]), "RGBA"))
    if not frames:
        raise ImageError("TIFF has no images")
    return frames


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes, max_px: int) -> bytes:
    """GIF LZW decode (variable code width, clear + EOI codes)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = buf & ((1 << code_size) - 1)
            buf >>= code_size
            nbits -= code_size
            if code == clear:
                table = [bytes((i,)) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ImageError("GIF LZW bad code")
            out += entry
            if len(out) > max_px:
                raise ImageError("GIF LZW output overrun")
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def decode_gif(data: bytes) -> list[tuple[np.ndarray, str]]:
    """GIF bytes → [(HxWx3 RGB, mode 'P')] per frame, composed onto the
    logical screen with animation semantics: each frame renders over the
    accumulated canvas honoring the Graphic Control Extension's
    transparency index, and its disposal method (1 keep, 2 restore the
    frame rect to background, 3 restore the pre-frame canvas) decides
    what the NEXT frame composes over — PIL's seek-through-frames
    convert(\"RGB\") parity."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ImageError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    if sw <= 0 or sh <= 0 or sw * sh > _max_pixels():
        raise ImageError(f"GIF bad dimensions {sw}x{sh}")
    flags = data[10]
    bg = data[11]
    i = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, 3 * n, i).reshape(n, 3)
        i += 3 * n
    frames: list[tuple[np.ndarray, str]] = []
    screen = np.zeros((sh, sw), np.uint8)
    if gct is not None:
        screen[:] = bg
    disposal = 0
    transparent = -1
    while i < len(data):
        b0 = data[i]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[i + 1] if i + 1 < len(data) else 0
            j = i + 2
            if label == 0xF9 and j < len(data) and data[j] >= 4:
                packed = data[j + 1]
                disposal = (packed >> 2) & 7
                transparent = data[j + 4] if packed & 1 else -1
            while j < len(data) and data[j]:
                j += 1 + data[j]
            i = j + 1
            continue
        if b0 != 0x2C:
            raise ImageError(f"GIF unknown block 0x{b0:02x}")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[i + 1: i + 9])
        lflags = data[i + 9]
        i += 10
        pal = gct
        if lflags & 0x80:
            n = 2 << (lflags & 7)
            pal = np.frombuffer(data, np.uint8, 3 * n, i).reshape(n, 3)
            i += 3 * n
        if pal is None:
            raise ImageError("GIF frame has no palette")
        min_code = data[i]
        i += 1
        blocks = bytearray()
        while i < len(data) and data[i]:
            sz = data[i]
            blocks += data[i + 1: i + 1 + sz]
            i += 1 + sz
        i += 1
        idx = np.frombuffer(
            _lzw_decode(min_code, bytes(blocks), fw * fh), np.uint8)
        if len(idx) < fw * fh:
            raise ImageError("GIF frame pixel data short")
        grid = idx[: fw * fh].reshape(fh, fw)
        if lflags & 0x40:  # interlaced rows
            de = np.empty_like(grid)
            rows = list(range(0, fh, 8)) + list(range(4, fh, 8)) + \
                list(range(2, fh, 4)) + list(range(1, fh, 2))
            de[np.array(rows, dtype=np.int64)] = grid
            grid = de
        if int(grid.max(initial=0)) >= len(pal):
            raise ImageError("GIF palette index out of range")
        if fy + fh > sh or fx + fw > sw:
            raise ImageError("GIF frame rect outside logical screen")
        before = screen.copy()
        target = screen[fy: fy + fh, fx: fx + fw]
        if transparent >= 0:
            mask = grid != transparent
            target[mask] = grid[mask]
        else:
            target[:] = grid
        frames.append((pal[screen], "P"))
        if disposal == 2:  # restore frame rect to background
            screen[fy: fy + fh, fx: fx + fw] = bg if gct is not None else 0
        elif disposal == 3:  # restore to previous canvas
            screen = before
        disposal = 0
        transparent = -1
    if not frames:
        raise ImageError("GIF has no frames")
    return frames


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, ITU-T T.81)
# ---------------------------------------------------------------------------

# zigzag scan position k → natural (row-major) coefficient index
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal DCT-II basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16);
# inverse transform of a coefficient block F is Aᵀ·F·A
_DCT_A = np.array([
    [(0.5 / np.sqrt(2) if u == 0 else 0.5)
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])


class _HuffTable:
    """Canonical JPEG Huffman decode table (F.2.2.3 mincode/maxcode)."""

    def __init__(self, counts: list[int], values: bytes):
        if sum(counts) != len(values) or sum(counts) > 256:
            raise ImageError("JPEG bad Huffman table")
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if counts[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one de-stuffed entropy segment."""

    def __init__(self, segment: bytes):
        self.bits = np.unpackbits(np.frombuffer(segment, dtype=np.uint8))
        self.pos = 0

    def read1(self) -> int:
        if self.pos >= len(self.bits):
            raise ImageError("JPEG truncated entropy data")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ImageError("JPEG truncated entropy data")
        v = 0
        for b in self.bits[self.pos: self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def _huff_decode(reader: _BitReader, tbl: _HuffTable) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read1()
        if tbl.maxcode[ln] >= 0 and code <= tbl.maxcode[ln]:
            return tbl.values[tbl.valptr[ln] + code - tbl.mincode[ln]]
    raise ImageError("JPEG invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude (T.81 F.12)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy-coded data at RST markers, de-stuffing
    0xFF00 → 0xFF. Returns (segments, index of the terminating marker).
    Scans only the 0xFF positions (numpy), not every byte."""
    ff = np.where(np.frombuffer(data, dtype=np.uint8)[pos:] == 0xFF)[0]
    segs: list[bytes] = []
    cur = bytearray()
    start = pos
    for off in ff:
        i = pos + int(off)
        if i < start:
            continue  # 0xFF inside an already-consumed stuffing pair
        if i + 1 >= len(data):
            start = i
            break
        m = data[i + 1]
        if m == 0x00:
            cur += data[start:i + 1]  # keep the 0xFF, drop the stuffing 0x00
            start = i + 2
        elif 0xD0 <= m <= 0xD7:
            cur += data[start:i]
            segs.append(bytes(cur))
            cur = bytearray()
            start = i + 2
        else:
            cur += data[start:i]
            segs.append(bytes(cur))
            return segs, i
    cur += data[start:]
    segs.append(bytes(cur))
    return segs, len(data)


def decode_jpeg(data: bytes) -> tuple[np.ndarray, str]:
    """Baseline JPEG bytes → (HxWx3 uint8 RGB, mode 'L' or 'RGB')."""
    if data[:2] != b"\xff\xd8":
        raise ImageError("not a JPEG (bad SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    restart_interval = 0
    frame = None  # (H, W, [(cid, h, v, tq)])
    progressive = False
    saw_scan = False
    geom = None  # (coefs, mcus_x, mcus_y, hmax, vmax), allocated at 1st SOS
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ImageError("JPEG marker expected")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if i + 2 > n:
            raise ImageError("JPEG truncated segment")
        seg_len = struct.unpack(">H", data[i:i + 2])[0]
        if seg_len < 2:
            raise ImageError("JPEG bad segment length")
        seg = data[i + 2:i + seg_len]
        i += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                if vals.size != 64:
                    raise ImageError("JPEG truncated DQT")
                qtables[tq] = vals.astype(np.int32)
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nv = sum(counts)
                values = seg[p + 17:p + 17 + nv]
                htables[(tc, th)] = _HuffTable(counts, values)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, height, width, nf = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ImageError(f"JPEG {prec}-bit precision unsupported")
            if nf not in (1, 3):
                raise ImageError(f"JPEG {nf}-component images unsupported")
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (height, width, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageError(
                "JPEG arithmetic/lossless/hierarchical variants unsupported "
                "(Huffman sequential + progressive only)")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ImageError("JPEG SOS before SOF")
            height, width, comps = frame
            if height <= 0 or width <= 0:
                raise ImageError("JPEG bad dimensions")
            if width * height > _max_pixels():
                raise ImageError("JPEG exceeds max_pixels")
            if geom is None:
                geom = _alloc_coefs(height, width, comps, qtables)
            coefs, mcus_x, mcus_y, hmax, vmax = geom
            ns = seg[0]
            scan_comps = []  # (component index, dc table id, ac table id)
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                ci = next((k for k, cm in enumerate(comps) if cm[0] == cs),
                          None)
                if ci is None:
                    raise ImageError("JPEG scan/frame component mismatch")
                scan_comps.append((ci, tt >> 4, tt & 15))
            if not progressive:
                if ns != len(comps):
                    raise ImageError("JPEG partial sequential scans "
                                     "unsupported")
                segs, i = _entropy_segments(data, i)
                _decode_baseline_entropy(coefs, comps, scan_comps, htables,
                                         restart_interval, segs,
                                         mcus_x, mcus_y)
                return _reconstruct(height, width, comps, coefs, qtables,
                                    hmax, vmax)
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            segs, i = _entropy_segments(data, i)
            _decode_progressive_scan(
                coefs, comps, scan_comps, htables, restart_interval, segs,
                mcus_x, mcus_y, hmax, vmax, height, width,
                ss, se, a >> 4, a & 15)
            saw_scan = True
        # APPn / COM / others: skipped
    if progressive and saw_scan and geom is not None:
        height, width, comps = frame
        coefs, mcus_x, mcus_y, hmax, vmax = geom
        return _reconstruct(height, width, comps, coefs, qtables, hmax, vmax)
    raise ImageError("JPEG missing SOS scan")


def _alloc_coefs(height, width, comps, qtables):
    """Validate frame geometry and allocate the per-component
    zigzag-order coefficient stores (shared by sequential and
    progressive decoding)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ImageError("JPEG sampling factors above 2x2 unsupported")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    coefs = []
    for cid, h, v, tq in comps:
        if h < 1 or v < 1:
            raise ImageError("JPEG zero sampling factor")
        coefs.append(np.zeros((mcus_y * v, mcus_x * h, 64), dtype=np.int32))
    return coefs, mcus_x, mcus_y, hmax, vmax


def _scan_tables(scan_comps, htables, need_dc: bool, need_ac: bool):
    out = []
    for ci, td, ta in scan_comps:
        dc_t = htables.get((0, td)) if need_dc else None
        ac_t = htables.get((1, ta)) if need_ac else None
        if (need_dc and dc_t is None) or (need_ac and ac_t is None):
            raise ImageError("JPEG missing Huffman table")
        out.append((ci, dc_t, ac_t))
    return out


def _decode_baseline_entropy(coefs, comps, scan_comps, htables,
                             restart_interval, segs, mcus_x, mcus_y) -> None:
    tabs = _scan_tables(scan_comps, htables, True, True)
    interval = restart_interval or mcus_x * mcus_y
    mcu = 0
    total = mcus_x * mcus_y
    for seg in segs:
        if mcu >= total:
            break
        reader = _BitReader(seg)
        preds = [0] * len(comps)
        for _ in range(min(interval, total - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, dc_t, ac_t in tabs:
                _, h, v, _ = comps[ci]
                for by in range(v):
                    for bx in range(h):
                        blk = coefs[ci][my * v + by, mx * h + bx]
                        s = _huff_decode(reader, dc_t)
                        if s > 11:
                            raise ImageError("JPEG bad DC category")
                        preds[ci] += _extend(reader.read(s), s)
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_t)
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ImageError("JPEG AC index overflow")
                            blk[k] = _extend(reader.read(sz), sz)
                            k += 1
            mcu += 1
    if mcu < total:
        raise ImageError("JPEG truncated scan (missing MCUs)")


def _comp_block_grid(ci, comps, hmax, vmax, height, width):
    """Non-interleaved data-unit grid for one component (T.81 A.2.2:
    ceil of the component's own sample dimensions, not the MCU grid)."""
    _, h, v, _ = comps[ci]
    cw = -(-width * h // hmax)
    ch = -(-height * v // vmax)
    return -(-ch // 8), -(-cw // 8)  # (rows, cols)


def _decode_progressive_scan(coefs, comps, scan_comps, htables,
                             restart_interval, segs, mcus_x, mcus_y,
                             hmax, vmax, height, width,
                             ss, se, ah, al) -> None:
    """One progressive scan (T.81 G.1.2): DC scans may interleave
    components; AC scans cover one component's spectral band [ss, se]
    with EOB-run coding; ah > 0 marks successive-approximation
    refinement of bit ``al``."""
    if ss > se or se > 63 or al > 13:
        raise ImageError("JPEG bad progressive scan parameters")
    if ss == 0:
        if se != 0:
            raise ImageError("JPEG DC scan with AC band")
        _decode_dc_scan(coefs, comps, scan_comps, htables, restart_interval,
                        segs, mcus_x, mcus_y, hmax, vmax, height, width,
                        ah, al)
    else:
        if len(scan_comps) != 1:
            raise ImageError("JPEG AC scans must be non-interleaved")
        _decode_ac_scan(coefs, comps, scan_comps[0], htables,
                        restart_interval, segs, hmax, vmax, height, width,
                        ss, se, ah, al)


def _decode_dc_scan(coefs, comps, scan_comps, htables, restart_interval,
                    segs, mcus_x, mcus_y, hmax, vmax, height, width,
                    ah, al) -> None:
    first = ah == 0
    tabs = _scan_tables(scan_comps, htables, first, False)
    if len(scan_comps) == 1:
        ci = scan_comps[0][0]
        rows, cols = _comp_block_grid(ci, comps, hmax, vmax, height, width)
        units = [(ci, u // cols, u % cols) for u in range(rows * cols)]
    else:
        units = []
        for mcu in range(mcus_x * mcus_y):
            my, mx = divmod(mcu, mcus_x)
            for ci, _, _ in scan_comps:
                _, h, v, _ = comps[ci]
                for by in range(v):
                    for bx in range(h):
                        units.append((ci, my * v + by, mx * h + bx))
        # interleaved restart counts MCUs, not data units
    per_mcu = (1 if len(scan_comps) == 1
               else sum(comps[ci][1] * comps[ci][2] for ci, _, _ in scan_comps))
    interval = (restart_interval or (len(units) // per_mcu)) * per_mcu
    dc_tab = {ci: t for ci, t, _ in tabs}
    done = 0
    for seg in segs:
        if done >= len(units):
            break
        reader = _BitReader(seg)
        preds = dict.fromkeys(dc_tab, 0)
        for ci, by, bx in units[done:done + interval]:
            blk = coefs[ci][by, bx]
            if first:
                s = _huff_decode(reader, dc_tab[ci])
                if s > 11:
                    raise ImageError("JPEG bad DC category")
                preds[ci] += _extend(reader.read(s), s)
                blk[0] = preds[ci] << al
            else:
                if reader.read1():
                    blk[0] |= 1 << al
            done += 1
    if done < len(units):
        raise ImageError("JPEG truncated DC scan")


def _decode_ac_scan(coefs, comps, scan_comp, htables, restart_interval,
                    segs, hmax, vmax, height, width, ss, se, ah, al) -> None:
    ci, _, ta = scan_comp
    ac_t = htables.get((1, ta))
    if ac_t is None:
        raise ImageError("JPEG missing Huffman table")
    rows, cols = _comp_block_grid(ci, comps, hmax, vmax, height, width)
    total = rows * cols
    interval = restart_interval or total
    p1 = 1 << al
    m1 = -p1
    done = 0
    for seg in segs:
        if done >= total:
            break
        reader = _BitReader(seg)
        eobrun = 0
        for u in range(done, min(done + interval, total)):
            blk = coefs[ci][u // cols, u % cols]
            if ah == 0:
                # first pass over this band (G.1.2.2)
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _huff_decode(reader, ac_t)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read(r)
                                break
                            k += 16
                            continue
                        k += r
                        if k > se:
                            raise ImageError("JPEG AC band overflow")
                        blk[k] = _extend(reader.read(sz), sz) << al
                        k += 1
            else:
                # refinement pass (G.1.2.3): correction bits on known
                # coefficients, run-length over zero-history positions
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(reader, ac_t)
                        r, sz = rs >> 4, rs & 15
                        val = 0
                        if sz == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read(r)
                                break
                            # r == 15: ZRL skips 16 zero-history slots
                        else:
                            if sz != 1:
                                raise ImageError(
                                    "JPEG bad refinement magnitude")
                            val = p1 if reader.read1() else m1
                        while k <= se:
                            if blk[k] != 0:
                                if reader.read1() and (blk[k] & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            if reader.read1() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
            done += 1
    if done < total:
        raise ImageError("JPEG truncated AC scan")


def _reconstruct(height, width, comps, coefs, qtables,
                 hmax, vmax) -> tuple[np.ndarray, str]:
    planes = []
    for ci, (cid, h, v, tq) in enumerate(comps):
        if tq not in qtables:
            raise ImageError("JPEG missing quantization table")
        qt = qtables[tq]
        rows_b, cols_b, _ = coefs[ci].shape
        flat = coefs[ci].reshape(-1, 64) * qt[None, :]
        nat = np.zeros_like(flat)
        nat[:, _JPEG_ZIGZAG] = flat  # inverse zigzag
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        # f = Aᵀ·F·A for every block at once
        pix = np.einsum("ux,nuv,vy->nxy", _DCT_A, blocks, _DCT_A)
        pix = np.clip(np.floor(pix + 128.0 + 0.5), 0.0, 255.0)
        plane = (pix.reshape(rows_b, cols_b, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(rows_b * 8, cols_b * 8))
        # crop to the component's true extent, then upsample to full size
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // v, axis=0),
                          hmax // h, axis=1)[:height, :width]
        planes.append(plane)

    if len(planes) == 1:
        gray = planes[0].astype(np.uint8)
        return np.stack([gray] * 3, axis=-1), "L"
    from docling_ray.functions.colorspace import ycbcr_to_rgb

    ycc = np.stack(planes, axis=-1)
    return ycbcr_to_rgb(ycc), "RGB"


# ---------------------------------------------------------------------------
# dispatch + page wrapping
# ---------------------------------------------------------------------------

def decode_ico(data: bytes) -> tuple[np.ndarray, str]:
    """ICO container → (HxWx3 uint8 RGB, mode) of the LARGEST icon
    entry (the reference gets ICO via PIL, which exposes the largest
    size by default). Entries are either embedded PNGs (Vista+) or
    classic DIBs: a BITMAPINFOHEADER with DOUBLED height covering the
    XOR color image then the 1-bit AND transparency mask, both
    bottom-up and 4-byte row aligned. For <32-bpp entries, AND-masked
    pixels render black; a 32-bpp entry's alpha channel is
    authoritative (mask ignored, alpha dropped like 32-bit BMP)."""
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ImageError("not an ICO")
    count = struct.unpack("<H", data[4:6])[0]
    if count == 0 or 6 + 16 * count > len(data):
        raise ImageError("ICO directory truncated")
    best = None
    for i in range(count):
        off = 6 + 16 * i
        bw, bh = data[off], data[off + 1]
        bw, bh = bw or 256, bh or 256
        size, img_off = struct.unpack("<II", data[off + 8: off + 16])
        if img_off + size > len(data):
            raise ImageError("ICO entry out of range")
        if best is None or bw * bh > best[0]:
            best = (bw * bh, img_off, size)
    _, img_off, size = best
    payload = data[img_off: img_off + size]
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if len(payload) < 40 or struct.unpack("<I", payload[:4])[0] != 40:
        raise ImageError("ICO DIB header not BITMAPINFOHEADER")
    width, height2 = struct.unpack("<ii", payload[4:12])
    bpp = struct.unpack("<H", payload[14:16])[0]
    compression = struct.unpack("<I", payload[16:20])[0]
    clr_used = struct.unpack("<I", payload[32:36])[0]
    if compression != 0:
        raise ImageError(f"ICO DIB compression {compression} not supported")
    if bpp not in (1, 4, 8, 24, 32):
        raise ImageError(f"ICO {bpp}-bit not supported")
    height = height2 // 2
    if width <= 0 or height <= 0 or width * height > _max_pixels():
        raise ImageError(f"ICO bad dimensions {width}x{height2}")
    pos = 40
    if bpp <= 8:
        n_colors = clr_used or (1 << bpp)
        if pos + 4 * n_colors > len(payload):
            raise ImageError("ICO palette truncated")
        quads = np.frombuffer(payload, np.uint8, 4 * n_colors,
                              pos).reshape(n_colors, 4)
        palette = np.ascontiguousarray(quads[:, 2::-1])
        pos += 4 * n_colors
    xor_stride = ((width * bpp + 31) // 32) * 4
    and_stride = ((width + 31) // 32) * 4
    need = pos + (xor_stride + and_stride) * height
    if len(payload) < need:
        raise ImageError(f"ICO pixel data truncated ({len(payload)} < {need})")
    xor_rows = np.frombuffer(payload, np.uint8, xor_stride * height,
                             pos).reshape(height, xor_stride)[::-1]
    mask_rows = np.frombuffer(
        payload, np.uint8, and_stride * height,
        pos + xor_stride * height).reshape(height, and_stride)[::-1]
    mask = np.unpackbits(mask_rows, axis=1)[:, :width].astype(bool)
    if bpp <= 8:
        grid = _unpack_bits(xor_rows, bpp, width) if bpp < 8 \
            else xor_rows[:, :width]
        if int(grid.max(initial=0)) >= len(palette):
            raise ImageError("ICO palette index out of range")
        rgb = palette[grid]
        rgb[mask] = 0
        return np.ascontiguousarray(rgb), "P"
    bytes_px = bpp // 8
    px = xor_rows[:, : width * bytes_px].reshape(height, width, bytes_px)
    rgb = np.ascontiguousarray(px[:, :, 2::-1])
    if bpp == 24:
        rgb[mask] = 0
        return np.ascontiguousarray(rgb), "RGB"
    return rgb, "RGBA"


_UNSUPPORTED_MAGICS = ()


def _total(fn, data: bytes):
    """Totalize a decoder: structural failures on corrupt bytes (short
    buffers, bad indices, numeric overflow) become ImageError — the fuzz
    contract that the extract path turns into status=failure rows."""
    try:
        return fn(data)
    except ImageError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError,
            ValueError, zlib.error) as e:
        raise ImageError(
            f"malformed image: {type(e).__name__}: {e}") from None


def decode_frames(data: bytes) -> tuple[list[tuple[np.ndarray, str]], str]:
    """Magic-dispatch decode → ([(HxWx3 RGB, mode)] per frame, format).
    Single-frame containers return one frame; TIFF pages and GIF frames
    each become one entry (reference image_backend.py:160-170 eager
    multi-frame extraction)."""
    if data[:8] == PNG_SIG:
        return [_total(decode_png, data)], "png"
    if data[:2] == b"BM":
        return [_total(decode_bmp, data)], "bmp"
    if data[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        return [_total(decode_pnm, data)], "pnm"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return _total(decode_tiff, data), "tiff"
    if data[:4] == b"GIF8":
        return _total(decode_gif, data), "gif"
    if data[:2] == b"\xff\xd8":
        return [_total(decode_jpeg, data)], "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from docling_ray.stages.webp_codec import decode_webp

        return [_total(decode_webp, data)], "webp"
    if data[:4] == b"\x00\x00\x01\x00":
        return [_total(decode_ico, data)], "ico"
    for magic, name in _UNSUPPORTED_MAGICS:
        if data[: len(magic)] == magic:
            raise ImageError(
                f"{name} decode requires an imaging stack not present in "
                "this environment"
            )
    raise ImageError("unrecognized image container (bad magic)")


def decode_image(data: bytes) -> tuple[np.ndarray, str, str]:
    """First-frame decode → (HxWx3 uint8 RGB, mode, container format)."""
    frames, fmt = decode_frames(data)
    arr, mode = frames[0]
    return arr, mode, fmt


def image_to_page(arr: np.ndarray, media_ref: str) -> dict:
    """Wrap a decoded frame as a pdf_cells-schema page with no text cells
    and one full-page bitmap region — exactly what the OCR stage consumes
    (the reference's ``get_bitmap_rects`` yields the full page for raw
    images, image_backend.py:79-91)."""
    h, w = arr.shape[:2]
    return {
        "page_no": 1,
        "width": float(w),
        "height": float(h),
        "cells": [],
        "tables": [],
        "images": [{"l": 0.0, "t": 0.0, "r": float(w), "b": float(h),
                    "media_ref": media_ref}],
    }


def extract_image_unit(
    payload_b64: str,
) -> tuple[list[tuple[str, str, str]], int, float, str | None]:
    """One ``image`` input span (base64 of an image file) → one
    ``picture`` span PER FRAME (TIFF pages / GIF frames; single frame for
    the other containers), media_ref carrying the decoded geometry, mode
    and pixel fingerprint. Returns (spans, page_no=-1, score, error)."""
    import base64
    import binascii

    try:
        data = base64.b64decode(payload_b64, validate=True)
    except (binascii.Error, ValueError) as e:
        return [], -1, 0.0, f"image base64 decode error: {e}"
    try:
        frames, fmt = decode_frames(data)
    except ImageError as e:
        return [], -1, 0.0, f"image decode error: {e}"
    spans = [
        ("picture", "",
         image_media_ref(arr.shape[1], arr.shape[0], mode, arr.tobytes()))
        for arr, mode in frames
    ]
    return spans, -1, 1.0, None
