"""CCITT Group 3/4 fax decoding (TIFF compressions 2 and 4).

From-scratch decoders for the two dominant bilevel fax encodings —
the same playbook as the repo's PNG/JPEG/WebP/TIFF/GIF decoders (the
reference gets these free via PIL, image_backend.py:26):

- :func:`decode_g4` — ITU-T T.6 two-dimensional (MMR) coding: vertical
  / horizontal / pass modes against the previous line's changing
  elements, modified-Huffman run codes inside horizontal mode, EOFB
  tolerated or absent (TIFF Compression=4, PDF /CCITTFaxDecode K<0).
- :func:`decode_mh_rle` — modified Huffman with byte-aligned rows
  (TIFF Compression=2, "CCITT RLE").

Both return an (H, W) uint8 array with 1 = black — the raw fax sense;
the TIFF PhotometricInterpretation decides the final gray mapping in
image_codec. Code tables live in functions/faxcodes (shared with the
synth encoder under the repo's shared-code rule; pinned literal tests).
Lines decode to changing-element positions — the T.6 native
representation — and expand to pixels vectorized at the end.
"""

from __future__ import annotations

import numpy as np

from docling_ray.functions import faxcodes as F


class FaxError(ValueError):
    """Malformed CCITT data (total: callers convert to their error)."""


def _decode_table(codes: dict[int, str]) -> dict[tuple[int, int], int]:
    return {(len(b), int(b, 2)): run for run, b in codes.items()}


_WHITE = _decode_table(F.white_codes())
_BLACK = _decode_table(F.black_codes())
_MODES = _decode_table(
    {i: b for i, b in enumerate(F.MODE_CODES.values())})
_MODE_NAMES = list(F.MODE_CODES)
_EOL_INT = int(F.EOL, 2)


class _BitReader:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def eof(self) -> bool:
        return self.pos >= self.nbits

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise FaxError("fax: bitstream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_code(br: _BitReader,
               table: dict[tuple[int, int], int],
               what: str, max_bits: int = 14) -> int:
    code = 0
    for n in range(1, max_bits + 1):
        code = (code << 1) | br.read_bit()
        hit = table.get((n, code))
        if hit is not None:
            return hit
    raise FaxError(f"fax: bad {what} code")


def _read_run(br: _BitReader, black: bool) -> int:
    """One complete run: repeated make-ups (≥64) then the terminator."""
    table = _BLACK if black else _WHITE
    total = 0
    for _ in range(64):  # bound: a run is at most a few make-ups long
        val = _read_code(br, table, "black run" if black else "white run")
        total += val
        if val < 64:
            return total
    raise FaxError("fax: runaway make-up chain")


def _rows_to_pixels(rows: list[list[int]], width: int) -> np.ndarray:
    out = np.zeros((len(rows), width), np.uint8)
    for i, trans in enumerate(rows):
        if not trans:
            continue
        flips = np.zeros(width + 1, np.int64)
        idx = np.asarray([t for t in trans if t < width], np.int64)
        np.add.at(flips, idx, 1)
        out[i] = (np.cumsum(flips[:width]) & 1).astype(np.uint8)
    return out


def _decode_2d_line(br: _BitReader, ref: list[int],
                    width: int) -> list[int] | None:
    """One 2D-coded line (shared by T.6 and T.4 K>0 lines) → changing
    elements, or None when the stream hits EOL/EOFB at line start."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 = white
    while a0 < width:
        # b1: first changing element on the reference line right of
        # a0 with color opposite to a0's color; b2: the next one
        i = 0
        while ref[i] <= a0:
            i += 1
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        mode = _read_mode(br)
        if mode == "EOFB":
            if cur:
                raise FaxError("fax: EOL mid-line")
            return None
        if mode == "P":
            a0 = b2
        elif mode == "H":
            a0s = max(a0, 0)
            r1 = _read_run(br, black=bool(color))
            r2 = _read_run(br, black=not bool(color))
            a1 = a0s + r1
            a2 = a1 + r2
            if a2 > width:
                raise FaxError("fax: H runs overflow line")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:  # vertical
            d = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                 "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = b1 + d
            if a1 < 0 or a1 > width:
                raise FaxError("fax: vertical move out of line")
            cur.append(a1)
            a0 = a1
            color ^= 1
    if len(cur) & 1:
        cur.append(width)
    return cur


def _decode_1d_line(br: _BitReader, width: int) -> list[int]:
    """One modified-Huffman line (white run first) → changing elements."""
    trans: list[int] = []
    pos = 0
    black = False
    while pos < width:
        run = _read_run(br, black)
        pos += run
        if pos > width:
            raise FaxError("fax: run overflows line")
        trans.append(pos)
        black = not black
    return trans


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 (MMR) decode → (height, width) uint8, 1 = black."""
    if width <= 0 or height <= 0:
        raise FaxError("fax: bad dimensions")
    br = _BitReader(data)
    ref: list[int] = [width, width]
    rows: list[list[int]] = []
    while len(rows) < height:
        cur = _decode_2d_line(br, ref, width)
        if cur is None:  # EOFB
            if rows:
                return _finish(rows, [], width, height)
            raise FaxError("fax: EOFB before any data")
        rows.append(cur)
        ref = cur + [width, width]
    return _rows_to_pixels(rows, width)


def _try_consume_eol(br: _BitReader) -> bool:
    """Consume fill zeros + one EOL (000000000001) if present at the
    current position; restore the position and return False otherwise."""
    save = br.pos
    zeros = 0
    while not br.eof() and zeros <= 4096:
        if br.read_bit():
            if zeros >= 11:
                return True
            br.pos = save
            return False
        zeros += 1
    br.pos = save
    return False


def decode_g3(data: bytes, width: int, height: int, k: int = 0,
              byte_align: bool = False) -> np.ndarray:
    """ITU-T T.4 (Group 3) decode → (height, width) uint8, 1 = black.

    ``k == 0``: pure one-dimensional MH lines, byte-aligned or packed
    back to back, EOL codes (with optional fill) tolerated anywhere
    between lines (TIFF Compression=3 1D, PDF /CCITTFaxDecode K=0
    without EncodedByteAlign — the "unaligned MH" shape).
    ``k > 0``: mixed mode — every line after an EOL carries a tag bit
    (1 = 1D MH, 0 = 2D coded against the previous line, reusing the
    T.6 machinery). Lines without a preceding EOL are legal only for
    the leading 1D line."""
    if width <= 0 or height <= 0:
        raise FaxError("fax: bad dimensions")
    br = _BitReader(data)
    ref: list[int] = [width, width]
    rows: list[list[int]] = []
    while len(rows) < height:
        if byte_align:
            br.align_byte()
        saw_eol = _try_consume_eol(br)
        one_d = True
        if k > 0:
            if saw_eol:
                one_d = br.read_bit() == 1
            elif rows:
                raise FaxError("fax: K>0 line missing EOL tag")
        if one_d:
            cur = _decode_1d_line(br, width)
        else:
            got = _decode_2d_line(br, ref, width)
            if got is None:
                raise FaxError("fax: unexpected EOL mid-stream")
            cur = got
        rows.append(cur)
        ref = cur + [width, width]
    return _rows_to_pixels(rows, width)


def _finish(rows: list[list[int]], cur: list[int],
            width: int, height: int) -> np.ndarray:
    if cur:
        raise FaxError("fax: EOFB mid-line")
    if len(rows) != height:
        raise FaxError(
            f"fax: {len(rows)} rows decoded, {height} expected")
    return _rows_to_pixels(rows, width)


def _read_mode(br: _BitReader) -> str:
    code = 0
    for n in range(1, 13):
        code = (code << 1) | br.read_bit()
        hit = _MODES.get((n, code))
        if hit is not None:
            return _MODE_NAMES[hit]
        if n == 12 and code == _EOL_INT:
            return "EOFB"
    raise FaxError("fax: bad mode code")


def decode_mh_rle(data: bytes, width: int, height: int) -> np.ndarray:
    """TIFF Compression=2 ("CCITT RLE"): modified Huffman, each row
    starts with a white run and is byte-aligned."""
    if width <= 0 or height <= 0:
        raise FaxError("fax: bad dimensions")
    br = _BitReader(data)
    rows: list[list[int]] = []
    for _ in range(height):
        trans: list[int] = []
        pos = 0
        black = False
        while pos < width:
            run = _read_run(br, black)
            pos += run
            if pos > width:
                raise FaxError("fax: run overflows line")
            trans.append(pos)
            black = not black
        rows.append(trans)
        br.align_byte()
    return _rows_to_pixels(rows, width)
