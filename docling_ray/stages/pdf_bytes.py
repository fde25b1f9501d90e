"""From-scratch minimal PDF *bytes* backend.

The reference's default input is raw PDF bytes parsed by a native backend
(``docling/backend/pypdfium2_backend.py:409``,
``docling_parse_backend.py:85``); no pdfium exists in this environment, so
this module implements the subset needed to recover text cells and layout
regions from real PDF files using only the stdlib:

  * xref table + trailer parsing (incremental sections via ``/Prev``),
    PDF 1.5+ cross-reference *streams* (``/Type /XRef`` with W-array
    fields, ``/Index`` subsections, ``/Prev`` chains, hybrid ``/XRefStm``)
    and compressed *object streams* (``/Type /ObjStm``), with a
    brute-force ``N 0 obj`` scan fallback for broken xrefs;
  * the COS object model — dicts, arrays, names, numbers, literal and hex
    strings, references, streams (``/Length`` may itself be a reference);
  * stream filters: ``FlateDecode`` via ``zlib``, plus from-scratch
    ``LZWDecode`` (MSB-first variable width, EarlyChange),
    ``RunLengthDecode``, ``ASCIIHexDecode`` and ``ASCII85Decode``;
    PNG/TIFF predictors declared in ``/DecodeParms`` (Predictor 2 and
    10–15, the forms real xref streams use) apply after Flate/LZW;
  * page-tree walk with ``/MediaBox``/``/Resources`` inheritance;
  * a content-stream interpreter for the text ops ``BT ET Tf TL Td TD Tm
    T* Tj TJ ' "`` plus ``q/Q/cm`` (translate+scale), ``re``+paint
    (ruling rectangles → table regions) and ``Do`` on image XObjects
    (→ picture regions; provenance ref read from the XObject's
    ``/DoclingRef`` entry when present, else synthesized).

Recovered cells use the deterministic geometry convention shared with the
page layout stage (``pdf_layout.py`` schema): baseline at the cell bottom,
cell height = the text leading (``TL``), advance width = 0.5·font·chars
(fixed monospace metric — real font widths are out of scope without
embedded font programs). The output feeds the existing geometric layout
pipeline unchanged, so PDF bytes and pre-parsed ``pdf_cells`` payloads
share every downstream rule (reference parity anchors in pdf_layout.py).

Text through CID/Type0 fonts decodes via the font's ``/ToUnicode`` CMap
(bfchar/bfrange/codespacerange); wide negative ``TJ`` kerns render as
word separators; inline images (``BI..ID..EI``) are skipped as opaque
spans so their binary payload never reaches the tokenizer.

Limitations (documented, not silent): rotation/skew matrices are ignored
(translation+scale honored), small per-glyph ``TJ`` kerns are not
applied to geometry, and JBIG2/JPX/DCT image-payload filters stay
undecoded (image XObjects carry provenance refs, never pixels, on this
path).
"""

from __future__ import annotations

import base64
import re
import zlib
from typing import Any, NamedTuple

from docling_ray.stages.pdf_layout import extract_page

Span = tuple[str, str, str]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    pass


class Ref(NamedTuple):
    num: int
    gen: int


class Stream(NamedTuple):
    dict: dict
    raw: bytes


class PdfString(str):
    """A parsed PDF string that remembers its raw (decrypted) bytes —
    /O /U /OE /UE and /ID values are binary, and a bytes-roundtrip
    through the text decode would corrupt anything starting with a
    UTF-16 BOM."""

    raw: bytes = b""


def _str_raw(x: Any) -> bytes:
    """Raw bytes of a parsed PDF string (lossless via PdfString.raw;
    latin-1 re-encode as the fallback for plain strs)."""
    if isinstance(x, PdfString):
        return x.raw
    if isinstance(x, str):
        return x.encode("latin-1", errors="replace")
    return b""


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OBJ_SCAN_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NAME_BODY_RE = re.compile(rb"[^\x00\t\n\x0c\r\x20()<>\[\]{}/%]*")
_WS_RUN_RE = re.compile(rb"(?:[\x00\t\n\x0c\r\x20]+|%[^\r\n]*)*")


class _Lexer:
    """Positioned COS-object reader over the raw bytes."""

    def __init__(self, data: bytes):
        self.data = data
        # encryption context: a _StdSecurityHandler plus the (num, gen)
        # of the object being parsed; strings decrypt at the bytes level
        # before text decoding (PDF 32000-1 §7.6.2)
        self.crypt: Any = None
        self.crypt_obj: tuple[int, int] | None = None

    def skip_ws(self, i: int) -> int:
        # one C-level regex pass over the whitespace/comment run
        return _WS_RUN_RE.match(self.data, i).end()

    def parse(self, i: int) -> tuple[Any, int]:
        d = self.data
        i = self.skip_ws(i)
        if i >= len(d):
            raise PdfError("unexpected EOF")
        c = d[i : i + 1]
        if d[i : i + 2] == b"<<":
            return self._parse_dict(i)
        if c == b"<":
            return self._parse_hex_string(i)
        if c == b"(":
            return self._parse_lit_string(i)
        if c == b"/":
            return self._parse_name(i)
        if c == b"[":
            return self._parse_array(i)
        if d[i : i + 4] == b"true":
            return True, i + 4
        if d[i : i + 5] == b"false":
            return False, i + 5
        if d[i : i + 4] == b"null":
            return None, i + 4
        m = _NUM_RE.match(d, i)
        if m:
            # lookahead for "N G R" references
            j = self.skip_ws(m.end())
            m2 = _NUM_RE.match(d, j)
            if m2 and b"." not in m.group():
                k = self.skip_ws(m2.end())
                if d[k : k + 1] == b"R" and (
                    k + 1 >= len(d) or d[k + 1] in _WS or d[k + 1] in _DELIM
                ):
                    return Ref(int(m.group()), int(m2.group())), k + 1
            tok = m.group()
            return (float(tok) if b"." in tok else int(tok)), m.end()
        raise PdfError(f"cannot parse object at byte {i}")

    def _parse_name(self, i: int) -> tuple[str, int]:
        d = self.data
        i += 1
        j = _NAME_BODY_RE.match(d, i).end()
        raw = d[i:j]
        # #xx hex escapes in names
        if b"#" in raw:
            out = bytearray()
            k = 0
            while k < len(raw):
                if raw[k : k + 1] == b"#" and k + 2 < len(raw) + 1:
                    out.append(int(raw[k + 1 : k + 3], 16))
                    k += 3
                else:
                    out.append(raw[k])
                    k += 1
            raw = bytes(out)
        return raw.decode("latin-1"), j

    def _parse_array(self, i: int) -> tuple[list, int]:
        out: list[Any] = []
        i += 1
        while True:
            i = self.skip_ws(i)
            if self.data[i : i + 1] == b"]":
                return out, i + 1
            obj, i = self.parse(i)
            out.append(obj)

    def _parse_dict(self, i: int) -> tuple[Any, int]:
        d = self.data
        out: dict[str, Any] = {}
        i += 2
        while True:
            i = self.skip_ws(i)
            if d[i : i + 2] == b">>":
                i += 2
                break
            key, i = self._parse_name(self.skip_ws(i))
            val, i = self.parse(i)
            out[key] = val
        # stream?
        j = self.skip_ws(i)
        if d[j : j + 6] == b"stream":
            j += 6
            if d[j : j + 2] == b"\r\n":
                j += 2
            elif d[j : j + 1] == b"\n":
                j += 1
            return ("__stream__", out, j), j  # caller resolves /Length
        return out, i

    def _parse_lit_string(self, i: int) -> tuple[str, int]:
        d = self.data
        i += 1
        out = bytearray()
        depth = 1
        while i < len(d):
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                e = d[i : i + 1]
                mapping = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                           b"b": b"\b", b"f": b"\x0c", b"(": b"(",
                           b")": b")", b"\\": b"\\"}
                if e in mapping:
                    out += mapping[e]
                    i += 1
                elif e.isdigit():
                    k = i
                    while k < i + 3 and d[k : k + 1].isdigit():
                        k += 1
                    out.append(int(d[i:k], 8) & 0xFF)
                    i = k
                elif e in (b"\n", b"\r"):  # line continuation
                    i += 1
                    if e == b"\r" and d[i : i + 1] == b"\n":
                        i += 1
                else:
                    out += e
                    i += 1
            elif c == 0x28:  # (
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    return self._finish_string(bytes(out)), i + 1
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise PdfError("unterminated string")

    def _parse_hex_string(self, i: int) -> tuple[str, int]:
        d = self.data
        j = d.index(b">", i)
        hx = re.sub(rb"\s", b"", d[i + 1 : j])
        if len(hx) % 2:
            hx += b"0"
        return self._finish_string(
            bytes.fromhex(hx.decode("ascii"))), j + 1

    def _finish_string(self, raw: bytes) -> PdfString:
        if self.crypt is not None and self.crypt_obj is not None:
            raw = self.crypt.decrypt_string(raw, *self.crypt_obj)
        s = PdfString(_decode_pdf_text(raw))
        s.raw = raw
        return s


def _asciihex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (PDF 7.4.2): hex pairs, whitespace ignored, '>'
    terminates, odd trailing nibble pads with 0."""
    hx = []
    for b in data:
        c = chr(b)
        if c == ">":
            break
        if c.strip():
            if c not in "0123456789abcdefABCDEF":
                raise PdfError("ASCIIHexDecode: bad hex digit")
            hx.append(c)
    if len(hx) % 2:
        hx.append("0")
    return bytes.fromhex("".join(hx))


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (PDF 7.4.3): base-85 groups, 'z' = four zero bytes,
    '~>' terminates, partial final group truncates."""
    out = bytearray()
    group: list[int] = []
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c in b" \t\r\n\f\x00":
            i += 1
            continue
        if c == 0x7E:  # '~' begins EOD
            break
        if c == 0x7A:  # 'z'
            if group:
                raise PdfError("ASCII85Decode: z inside group")
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not 0x21 <= c <= 0x75:
            raise PdfError("ASCII85Decode: char out of range")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for d in group:
                v = v * 85 + d
            if v > 0xFFFFFFFF:
                raise PdfError("ASCII85Decode: group overflow")
            out += v.to_bytes(4, "big")
            group = []
        i += 1
    if group:
        if len(group) == 1:
            raise PdfError("ASCII85Decode: lone trailing digit")
        k = len(group)
        v = 0
        for d in group + [84] * (5 - k):
            v = v * 85 + d
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (PDF 7.4.5): n<128 copy n+1 literals; n>128 repeat
    the next byte 257-n times; 128 = EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln < 128:
            if i + ln + 1 > n:
                raise PdfError("RunLengthDecode: truncated literal run")
            out += data[i: i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise PdfError("RunLengthDecode: truncated repeat run")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


def _pdf_lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """LZWDecode (PDF 7.4.4): MSB-first variable-width codes, clear=256,
    EOD=257, code width grows at 511/1023/2047 (one code earlier with
    EarlyChange=1, the default). The GIF decoder in image_codec is
    LSB-first — a different wire format, hence the separate routine."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise PdfError("LZWDecode: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfError("LZWDecode: code out of range")
            out += entry
            prev = entry
            if (len(table) >= (1 << width) - (1 if early_change else 0)
                    and width < 12):
                width += 1
    return bytes(out)


def _parse_tounicode(text: bytes) -> tuple[dict[int, str], int]:
    """Parse a /ToUnicode CMap stream (beginbfchar / beginbfrange /
    begincodespacerange) → (code → unicode map, code byte length).
    bfrange destinations increment their final 16-bit unit per the CMap
    spec; array-form ranges list one destination per code."""
    mapping: dict[int, str] = {}
    code_len = 2
    m = re.search(rb"begincodespacerange(.*?)endcodespacerange", text, re.S)
    if m:
        h = re.search(rb"<([0-9A-Fa-f]+)>", m.group(1))
        if h:
            code_len = max(1, len(h.group(1)) // 2)
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", text, re.S):
        for pm in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                              m.group(1)):
            src = int(pm.group(1), 16)
            mapping[src] = bytes.fromhex(
                pm.group(2).decode("ascii")).decode("utf-16-be", "replace")
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", text, re.S):
        for rm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(\[[^\]]*\]|<[0-9A-Fa-f]+>)", m.group(1)
        ):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            if hi < lo or hi - lo > 0xFFFF:
                raise PdfError("ToUnicode: bad bfrange bounds")
            tgt = rm.group(3)
            if tgt.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", tgt)
                for k, d in enumerate(dsts[: hi - lo + 1]):
                    mapping[lo + k] = bytes.fromhex(
                        d.decode("ascii")).decode("utf-16-be", "replace")
            else:
                base = bytes.fromhex(tgt[1:-1].decode("ascii"))
                if len(base) >= 2:
                    head, last = base[:-2], int.from_bytes(base[-2:], "big")
                else:
                    head, last = b"", int.from_bytes(base, "big")
                for k in range(hi - lo + 1):
                    dst = head + ((last + k) & 0xFFFF).to_bytes(2, "big")
                    mapping[lo + k] = dst.decode("utf-16-be", "replace")
    return mapping, code_len


def _apply_tounicode(s: str, mapping: dict[int, str], code_len: int) -> str:
    """Re-map a show-text string through the active font's ToUnicode
    CMap. The lexer decoded string bytes as latin-1 (lossless byte ↔
    char), so the raw code bytes are recoverable; strings that came in
    as real UTF-16 text pass through unchanged."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError:
        return s
    if code_len == 1 and len(mapping) == 256:
        # complete single-byte map (simple-font encodings): the
        # latin-1 char ordinals ARE the codes, so str.translate is the
        # same remap at C speed (no per-char Python loop)
        return s.translate(mapping)
    out = []
    n = len(raw)
    i = 0
    while i + code_len <= n:
        out.append(mapping.get(
            int.from_bytes(raw[i: i + code_len], "big"), "�"))
        i += code_len
    if i < n:  # trailing short code
        out.append(mapping.get(int.from_bytes(raw[i:], "big"), "�"))
    return "".join(out)


def _decode_pdf_text(raw: bytes) -> str:
    """PDF text-string decode: UTF-16BE when BOM-prefixed, else latin-1
    (the PDFDocEncoding subset our writer/corpus uses)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


# --- simple-font /Encoding (BaseEncoding + /Differences) -------------------
# Glyph-name → unicode per the public Adobe Glyph List conventions
# (reference capability anchor: pdfium resolves simple-font encodings in
# docling/backend/pypdfium2_backend.py:409). Literal entries cover the
# ASCII names, Latin-1 names, typographic punctuation and common
# ligature/letter names; Greek letters and accented Latin construct
# through unicodedata.lookup; uniXXXX / uXXXX[XX] resolve algorithmically.
_AGL_NAMES: dict[str, str] = {
    # ASCII
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # Latin-1 block
    "exclamdown": "¡", "cent": "¢", "sterling": "£", "currency": "¤",
    "yen": "¥", "brokenbar": "¦", "section": "§", "dieresis": "¨",
    "copyright": "©", "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯", "degree": "°",
    "plusminus": "±", "twosuperior": "²", "threesuperior": "³",
    "acute": "´", "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "onesuperior": "¹", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "questiondown": "¿", "multiply": "×",
    "divide": "÷", "germandbls": "ß", "ae": "æ", "AE": "Æ",
    "oslash": "ø", "Oslash": "Ø", "thorn": "þ", "Thorn": "Þ",
    "eth": "ð", "Eth": "Ð", "dotlessi": "ı", "lslash": "ł",
    "Lslash": "Ł",
    # typographic punctuation / symbols
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "dagger": "†", "daggerdbl": "‡", "bullet": "•", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹", "guilsinglright": "›",
    "fraction": "⁄", "florin": "ƒ", "circumflex": "ˆ", "caron": "ˇ",
    "tilde": "˜", "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "hungarumlaut": "˝", "endash": "–", "emdash": "—",
    "trademark": "™", "Euro": "€", "minus": "−",
    # ligature / digraph letter names
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "oe": "œ", "OE": "Œ",
}
_AGL_ACCENTS = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "tilde": "TILDE", "dieresis": "DIAERESIS", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "macron": "MACRON", "breve": "BREVE",
    "caron": "CARON", "ogonek": "OGONEK", "slash": "STROKE",
    "dotaccent": "DOT ABOVE", "hungarumlaut": "DOUBLE ACUTE",
}
_GREEK = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
          "psi omega").split()
_UNI_NAME_RE = re.compile(r"^uni((?:[0-9A-Fa-f]{4})+)$")
_U_NAME_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")
_ACCENT_RE = re.compile(
    r"^([A-Za-z])(" + "|".join(_AGL_ACCENTS) + r")$")


def _glyph_to_unicode(name: str) -> str | None:
    """Resolve one glyph name to its unicode string, or None for names
    outside the supported AGL subset (gXX/cidXX subset names etc.)."""
    hit = _AGL_NAMES.get(name)
    if hit is not None:
        return hit
    if len(name) == 1 and name.isalnum() and ord(name) < 128:
        return name
    m = _UNI_NAME_RE.match(name)
    if m:
        h = m.group(1)
        return "".join(chr(int(h[i: i + 4], 16))
                       for i in range(0, len(h), 4))
    m = _U_NAME_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else None
    import unicodedata

    m = _ACCENT_RE.match(name)
    if m:
        base, accent = m.group(1), m.group(2)
        case = "CAPITAL" if base.isupper() else "SMALL"
        try:
            return unicodedata.lookup(
                f"LATIN {case} LETTER {base.upper()} "
                f"WITH {_AGL_ACCENTS[accent]}")
        except KeyError:
            return None
    low = name.lower()
    if low in _GREEK and name in (low, low.capitalize()):
        case = "CAPITAL" if name[0].isupper() else "SMALL"
        try:
            return unicodedata.lookup(
                f"GREEK {case} LETTER {low.upper()}")
        except KeyError:
            return None
    return None


import functools


@functools.lru_cache(maxsize=8)
def _base_encoding_map_cached(name: str) -> dict[int, str]:
    codec = {"WinAnsiEncoding": "cp1252",
             "MacRomanEncoding": "mac_roman"}.get(name)
    out: dict[int, str] = {}
    for c in range(256):
        ch = chr(c)
        if codec:
            try:
                ch = bytes([c]).decode(codec)
            except UnicodeDecodeError:
                pass
        out[c] = ch
    return out


def _base_encoding_map(name: str | None) -> dict[int, str]:
    """Full 256-entry code→char map for a named base encoding.
    WinAnsi = cp1252 (undefined codes fall back to latin-1),
    MacRoman = mac_roman; anything else (absent, StandardEncoding,
    font-built-in) keeps the repo's latin-1 convention. Cached per
    name; callers get a fresh copy to overlay /Differences on."""
    return dict(_base_encoding_map_cached(name or ""))


def _simple_encoding_map(
    doc: "PdfDocument", enc: Any,
) -> tuple[dict[int, str], int] | None:
    """Build the (code→unicode, code_len=1) map for a simple font's
    /Encoding entry — a name (/WinAnsiEncoding, /MacRomanEncoding) or a
    dict with optional /BaseEncoding + /Differences (glyph-name
    overrides; unresolvable names keep the base char rather than going
    to .notdef — conservative, never loses text). Returns None when the
    result is the latin-1 identity (no remap needed — keeps the default
    fast path allocation-free)."""
    diffs = None
    if isinstance(enc, str):
        base = enc
    elif isinstance(enc, dict):
        base = doc.resolve(enc.get("BaseEncoding"))
        diffs = doc.resolve(enc.get("Differences"))
        if base is not None and not isinstance(base, str):
            base = None
    else:
        return None
    mapping = _base_encoding_map(base)
    if isinstance(diffs, list):
        code = 0
        for item in diffs:
            if isinstance(item, (int, float)):
                code = int(item)
                continue
            name = item[1] if (isinstance(item, tuple) and len(item) == 2
                               ) else item
            if isinstance(name, str) and 0 <= code <= 255:
                u = _glyph_to_unicode(name)
                if u is not None:
                    mapping[code] = u
            code += 1
    if all(mapping[c] == chr(c) for c in range(256)):
        return None
    return mapping, 1


def _candidate_passwords() -> list[bytes]:
    """Configured candidate passwords (settings kind ``pdf``, option
    ``passwords``), tried after the empty password, as user then owner
    password. Accepts a comma-separated string (env-friendly) or a
    list/tuple from ``configure("pdf", passwords=[...])``. Reference:
    pdfium's FPDF_LoadMemDocument(password) surface that
    pypdfium2_backend.py:409 inherits."""
    from docling_ray import settings

    raw = settings.options_for("pdf").get("passwords", "")
    if isinstance(raw, (list, tuple)):
        items = [str(x) for x in raw]
    else:
        items = [s for s in str(raw).split(",") if s]
    return [p.encode("utf-8") for p in items]


def _pubsec_keys() -> list[tuple[int, int]]:
    """Configured recipient RSA private keys for certificate-encrypted
    PDFs (settings kind ``pdf``, option ``pubsec_keys``): a list of
    (n, d) int tuples from ``configure()``, or the env-friendly string
    form ``"nhex:dhex,nhex:dhex"``. Reference: pdfium's PubSec handler
    takes the recipient certificate + key the same way."""
    from docling_ray import settings

    raw = settings.options_for("pdf").get("pubsec_keys", "")
    keys: list[tuple[int, int]] = []
    if isinstance(raw, (list, tuple)):
        for item in raw:
            n, d = item
            keys.append((int(n), int(d)))
    else:
        for item in str(raw).split(","):
            if ":" in item:
                nh, dh = item.split(":", 1)
                keys.append((int(nh, 16), int(dh, 16)))
    return keys


class _CryptHandlerBase:
    """Shared per-object decryption given ``file_key`` and the stream /
    string crypt-filter methods (PDF 32000-1 Algorithm 1 / 1.A)."""

    file_key: bytes
    stm_cfm: str
    str_cfm: str

    def _apply(self, data: bytes, num: int, gen: int, cfm: str) -> bytes:
        from docling_ray.functions.pdfcrypt import (
            aes_cbc_decrypt, object_key, rc4)

        if cfm == "Identity" or not data:
            return data
        if cfm == "AESV3":
            key = self.file_key  # Algorithm 1.A: no per-object key
        else:
            key = object_key(self.file_key, num, gen, aes=cfm == "AESV2")
        if cfm == "V2":
            return rc4(key, data)
        # AES-CBC: leading 16-byte IV, trailing RFC-2898-style padding
        if len(data) < 32 or len(data) % 16:
            raise PdfError("encrypted PDF: bad AES payload length")
        plain = aes_cbc_decrypt(key, data[:16], data[16:])
        padn = plain[-1]
        if not 1 <= padn <= 16:
            raise PdfError("encrypted PDF: bad AES padding")
        return plain[:-padn]

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.str_cfm)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(data, num, gen, self.stm_cfm)


class _PubSecSecurityHandler(_CryptHandlerBase):
    """Public-key security handler (/Filter /Adobe.PubSec, SubFilter
    adbe.pkcs7.s4/s5 — PDF 32000-1 §7.6.5): each /Recipients entry is a
    CMS EnvelopedData blob whose RSA-wrapped content carries a 20-byte
    seed + 4 permission bytes; the file key is a SHA-1 (SHA-256 for
    AESV3) digest over seed + recipient blobs (+ FFFFFFFF when metadata
    stays clear). Recipient private keys come from settings
    ``pdf.pubsec_keys``. Reference capability anchor: pdfium's PubSec
    handler behind pypdfium2_backend.py:409. No matching key, malformed
    CMS, unsupported cipher — PdfError, recorded as a failure row."""

    def __init__(self, edict: dict, resolve,
                 keys: list[tuple[int, int]] | None = None) -> None:
        from docling_ray.functions.cms import (
            DerError, open_enveloped_data, pubsec_file_key)

        if keys is None:
            keys = _pubsec_keys()
        v = int(resolve(edict.get("V", 0)) or 0)
        length = int(resolve(edict.get("Length", 40)) or 40)
        em = resolve(edict.get("EncryptMetadata", True))
        em = True if em is None else bool(em)
        if v in (1, 2):
            cfm, key_len = "V2", max(5, min(16, length // 8))
            recip = resolve(edict.get("Recipients"))
        elif v in (4, 5):
            cf = resolve(edict.get("CF")) or {}
            name = resolve(edict.get("StmF", "Identity"))
            if resolve(edict.get("StrF", "Identity")) != name:
                raise PdfError("PubSec: split StmF/StrF unsupported")
            d = resolve(cf.get(name)) or {}
            cfm = str(resolve(d.get("CFM", "None")))
            if cfm not in ("V2", "AESV2", "AESV3"):
                raise PdfError(f"unsupported crypt filter CFM {cfm!r}")
            key_len = 32 if cfm == "AESV3" else 16
            recip = resolve(d.get("Recipients"))
            if recip is None:
                recip = resolve(edict.get("Recipients"))
        else:
            raise PdfError(f"unsupported PubSec version V={v}")
        if isinstance(recip, (bytes, str)):
            recip = [recip]
        if not isinstance(recip, list) or not recip:
            raise PdfError("PubSec: missing /Recipients")
        blobs = [_str_raw(resolve(r)) for r in recip]
        seed = None
        for blob in blobs:
            try:
                content = open_enveloped_data(blob, keys)
            except DerError as exc:
                raise PdfError(f"PubSec: {exc}") from exc
            if content is not None and len(content) >= 20:
                seed = content[:20]
                break
        if seed is None:
            raise PdfError("encrypted PDF: no matching recipient key")
        self.file_key = pubsec_file_key(
            seed, blobs, key_len, encrypt_metadata=em,
            sha256=cfm == "AESV3")
        self.stm_cfm = self.str_cfm = cfm
        self.rev = 0


class _StdSecurityHandler(_CryptHandlerBase):
    """Standard security handler (/Filter /Standard). Tries the empty
    user password first — the "encrypted but openable" shape that covers
    the vast majority of encrypted PDFs in the wild — then any configured
    candidate passwords (settings ``pdf.passwords``) as user and owner
    passwords. Supports V1/V2 (RC4), V4 crypt filters (V2 = RC4, AESV2 =
    AES-128-CBC) and V5/R6 (AESV3 = AES-256). Reference capability
    anchor: pdfium's standard handler + password argument
    (docling/backend/pypdfium2_backend.py:409). Anything else —
    unknown filters (PubSec routes to :class:`_PubSecSecurityHandler`
    first), no matching password — raises PdfError, which the
    extractor records as a failure row (errors are data, never
    exceptions)."""

    def __init__(self, edict: dict, id0: bytes, resolve,
                 passwords: list[bytes] | None = None) -> None:
        from docling_ray.functions.pdfcrypt import (
            compute_u, r6_file_key_from_owner, r6_file_key_from_user,
            std_file_key, user_key_from_owner)

        if passwords is None:
            passwords = _candidate_passwords()

        filt = resolve(edict.get("Filter"))
        if filt != "Standard":
            raise PdfError(f"unsupported encryption filter {filt!r}")
        v = int(resolve(edict.get("V", 0)) or 0)
        rev = int(resolve(edict.get("R", 2)))
        length = int(resolve(edict.get("Length", 40)) or 40)
        o_raw = _str_raw(resolve(edict.get("O")))
        u_raw = _str_raw(resolve(edict.get("U")))
        p = int(resolve(edict.get("P", -1)))
        em = resolve(edict.get("EncryptMetadata", True))
        em = True if em is None else bool(em)
        self.stm_cfm = self.str_cfm = "V2"  # RC4 unless crypt filters say
        if v in (1, 2):
            key_len = 5 if v == 1 else max(5, min(16, length // 8))
        elif v == 4:
            key_len = max(5, min(16, length // 8))
            cf = resolve(edict.get("CF")) or {}

            def cfm_of(name: Any) -> str:
                name = resolve(name) or "Identity"
                if name == "Identity":
                    return "Identity"
                d = resolve(cf.get(name)) or {}
                return str(resolve(d.get("CFM", "None")))

            self.stm_cfm = cfm_of(edict.get("StmF", "Identity"))
            self.str_cfm = cfm_of(edict.get("StrF", "Identity"))
            for m in (self.stm_cfm, self.str_cfm):
                if m not in ("V2", "AESV2", "Identity"):
                    raise PdfError(f"unsupported crypt filter CFM {m!r}")
            if "AESV2" in (self.stm_cfm, self.str_cfm):
                key_len = 16
        elif v == 5:
            self.stm_cfm = self.str_cfm = "AESV3"
            ue_raw = _str_raw(resolve(edict.get("UE")))
            oe_raw = _str_raw(resolve(edict.get("OE")))
            key = None
            for pw in [b"", *passwords]:
                key = r6_file_key_from_user(pw, u_raw, ue_raw)
                if key is not None:
                    break
                key = r6_file_key_from_owner(pw, u_raw, o_raw, oe_raw)
                if key is not None:
                    break
            if key is None:
                raise PdfError("encrypted PDF: password required")
            self.file_key = key
            self.rev = rev
            return
        else:
            raise PdfError(f"unsupported encryption version V={v}")
        self.rev = rev

        def auth_user(pw: bytes) -> bytes | None:
            # Algorithm 6: derive the file key and check it regenerates /U
            fk = std_file_key(pw, o_raw, p, id0, rev, key_len,
                              encrypt_metadata=em)
            expect = compute_u(fk, id0, rev)
            ok = (expect[:16] == u_raw[:16]) if rev >= 3 \
                else (expect == u_raw[:32])
            return fk if ok else None

        self.file_key = b""
        for pw in [b"", *passwords]:
            fk = auth_user(pw)
            if fk is None:
                # Algorithm 7: try it as the owner password — recover the
                # padded user password from /O, then the user path
                fk = auth_user(user_key_from_owner(pw, o_raw, rev, key_len))
            if fk is not None:
                self.file_key = fk
                break
        else:
            raise PdfError("encrypted PDF: password required")

class PdfDocument:
    """Parsed PDF file: object store + page tree."""

    def __init__(self, data: bytes,
                 passwords: list[bytes] | None = None):
        self.data = data
        self._passwords = passwords
        self.lex = _Lexer(data)
        self._cache: dict[int, Any] = {}
        self.offsets: dict[int, int] = {}
        # num -> (objstm num, index) for objects living in /ObjStm streams
        self.compressed: dict[int, tuple[int, int]] = {}
        self._loaded_objstms: set[int] = set()
        self.trailer: dict = {}
        try:
            self._load_xref()
        except Exception:
            self._scan_objects()
        if not self.offsets and not self.compressed:
            self._scan_objects()
        self._crypt = None
        self._encrypt_num = -1
        enc = self.trailer.get("Encrypt")
        if enc is not None:
            if isinstance(enc, Ref):
                self._encrypt_num = enc.num
            ids = self.resolve(self.trailer.get("ID"))
            id0 = _str_raw(ids[0]) if isinstance(ids, list) and ids else b""
            edict = self.resolve(enc)
            filt = self.resolve(edict.get("Filter")) \
                if isinstance(edict, dict) else None
            if filt == "Adobe.PubSec":
                self._crypt = _PubSecSecurityHandler(edict, self.resolve)
            else:
                self._crypt = _StdSecurityHandler(
                    edict, id0, self.resolve,
                    passwords=self._passwords)
            self.lex.crypt = self._crypt
            # objects cached before the handler existed (the /Encrypt
            # chain itself) hold still-encrypted strings; drop them so a
            # later fetch re-parses under the decryption context
            self._cache = {
                n: v for n, v in self._cache.items()
                if n == self._encrypt_num}
            self._loaded_objstms.clear()
        if "Root" not in self.trailer:
            # find the catalog by scanning
            for num in self.offsets:
                obj = self.obj(Ref(num, 0))
                if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                    self.trailer["Root"] = Ref(num, 0)
                    break
        if "Root" not in self.trailer:
            raise PdfError("no document catalog found")

    # -- xref -------------------------------------------------------------
    def _load_xref(self) -> None:
        d = self.data
        tail = d[-2048:]
        m = list(re.finditer(rb"startxref\s+(\d+)", tail))
        if not m:
            raise PdfError("no startxref")
        pos = int(m[-1].group(1))
        seen = set()
        while pos and pos not in seen:
            seen.add(pos)
            pos = self._load_xref_section(pos)

    def _load_xref_section(self, pos: int) -> int:
        d = self.data
        i = self.lex.skip_ws(pos)
        if d[i : i + 4] != b"xref":
            return self._load_xref_stream(i)
        i += 4
        while True:
            i = self.lex.skip_ws(i)
            if d[i : i + 7] == b"trailer":
                i = self.lex.skip_ws(i + 7)
                trailer, _ = self.lex.parse(i)
                for k, v in trailer.items():
                    self.trailer.setdefault(k, v)
                # hybrid-reference file: the table's trailer points at a
                # parallel xref STREAM carrying the compressed-object map
                xstm = trailer.get("XRefStm")
                if xstm is not None:
                    try:
                        self._load_xref_stream(
                            self.lex.skip_ws(int(xstm)))
                    except (PdfError, ValueError, zlib.error):
                        pass  # hybrid stream broken: table entries stand
                prev = trailer.get("Prev")
                return int(prev) if prev is not None else 0
            m = re.match(rb"(\d+)\s+(\d+)", d[i:])
            if not m:
                raise PdfError("bad xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            i += m.end()
            i = self.lex.skip_ws(i)
            for k in range(count):
                m2 = re.match(rb"(\d{10}) (\d{5}) ([nf])", d[i : i + 20])
                if not m2:
                    raise PdfError(f"bad xref entry at {i}")
                if m2.group(3) == b"n":
                    self.offsets.setdefault(start + k, int(m2.group(1)))
                i += 20  # entries are fixed 20 bytes including EOL

    def _load_xref_stream(self, i: int) -> int:
        """PDF 1.5+ ``/Type /XRef`` cross-reference stream at byte ``i``
        (just past the startxref / XRefStm target, whitespace skipped).
        Decodes the W-array-packed entry table: type 0 = free, type 1 =
        byte offset, type 2 = (object stream number, index within it)."""
        d = self.data
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", d[i : i + 64])
        if not m:
            raise PdfError("xref table or xref stream expected")
        val, _ = self.lex.parse(i + m.end())
        if not (isinstance(val, tuple) and val and val[0] == "__stream__"):
            raise PdfError("xref stream: stream object expected")
        _, sdict, data_start = val
        # /Length in an xref stream must be direct (the xref needed to
        # resolve a reference is the one being built) — guard anyway
        length = sdict.get("Length", 0)
        if isinstance(length, Ref):
            raise PdfError("xref stream /Length is indirect")
        raw = d[data_start : data_start + int(length)]
        data = self.stream_data(Stream(sdict, raw))
        w = [int(x) for x in (sdict.get("W") or [])]
        if not w or any(x < 0 for x in w) or sum(w) == 0:
            raise PdfError("xref stream: bad /W")
        size = int(sdict.get("Size", 0))
        index = sdict.get("Index") or [0, size]
        entry_len = sum(w)
        pos = 0
        for k in range(0, len(index) - 1, 2):
            start, count = int(index[k]), int(index[k + 1])
            for j in range(count):
                if pos + entry_len > len(data):
                    raise PdfError("xref stream: truncated entry table")
                fields: list[int] = []
                for wi in w:
                    if wi == 0:
                        # omitted field: type defaults to 1, others to 0
                        fields.append(1 if not fields else 0)
                    else:
                        fields.append(
                            int.from_bytes(data[pos : pos + wi], "big"))
                        pos += wi
                typ = fields[0]
                f2 = fields[1] if len(fields) > 1 else 0
                f3 = fields[2] if len(fields) > 2 else 0
                num = start + j
                if num in self.offsets or num in self.compressed:
                    continue  # newer section wins (/Prev chain order)
                if typ == 1:
                    self.offsets[num] = f2
                elif typ == 2:
                    self.compressed[num] = (f2, f3)
        for k, v in sdict.items():
            if k not in ("Type", "W", "Index", "Filter", "DecodeParms",
                         "Length", "Prev"):
                self.trailer.setdefault(k, v)
        prev = sdict.get("Prev")
        return int(prev) if prev is not None else 0

    def _load_objstm(self, stm_num: int) -> None:
        """Decode one ``/Type /ObjStm`` compressed object stream and cache
        every object it contains (N pairs of ``objnum offset`` then the
        serialized objects starting at /First)."""
        if stm_num in self._loaded_objstms:
            return
        self._loaded_objstms.add(stm_num)
        stm = self.obj(Ref(stm_num, 0))
        if not isinstance(stm, Stream) or \
                self.resolve(stm.dict.get("Type")) != "ObjStm":
            raise PdfError(f"object stream {stm_num} missing or not ObjStm")
        data = self.stream_data(stm)
        n = int(self.resolve(stm.dict.get("N", 0)))
        first = int(self.resolve(stm.dict.get("First", 0)))
        lex = _Lexer(data)
        pairs: list[tuple[int, int]] = []
        i = 0
        for _ in range(n):
            m1 = _NUM_RE.match(data, lex.skip_ws(i))
            if not m1:
                raise PdfError("ObjStm: bad pair table")
            m2 = _NUM_RE.match(data, lex.skip_ws(m1.end()))
            if not m2:
                raise PdfError("ObjStm: bad pair table")
            pairs.append((int(m1.group()), int(m2.group())))
            i = m2.end()
        for num, off in pairs:
            if num in self._cache:
                continue
            val, _ = lex.parse(first + off)
            if isinstance(val, tuple) and val and val[0] == "__stream__":
                val = val[1]  # streams are illegal inside ObjStm: keep dict
            self._cache[num] = val

    def _scan_objects(self) -> None:
        for m in _OBJ_SCAN_RE.finditer(self.data):
            self.offsets[int(m.group(1))] = m.start()

    # -- objects ----------------------------------------------------------
    def obj(self, ref: Ref) -> Any:
        if ref.num in self._cache:
            return self._cache[ref.num]
        off = self.offsets.get(ref.num)
        if off is None:
            loc = self.compressed.get(ref.num)
            if loc is not None:
                self._load_objstm(loc[0])
                if ref.num in self._cache:
                    return self._cache[ref.num]
            raise PdfError(f"object {ref.num} not in xref")
        d = self.data
        m = re.match(rb"\s*\d+\s+\d+\s+obj", d[off : off + 64])
        if not m:
            raise PdfError(f"object header missing at {off}")
        decrypting = (self._crypt is not None
                      and ref.num != self._encrypt_num)
        if decrypting:
            self.lex.crypt_obj = (ref.num, ref.gen)
        try:
            val, i = self.lex.parse(off + m.end())
        finally:
            self.lex.crypt_obj = None
        if isinstance(val, tuple) and val and val[0] == "__stream__":
            _, sdict, data_start = val
            length = self.resolve(sdict.get("Length", 0))
            raw = d[data_start : data_start + int(length)]
            # streams decrypt before filters (crypt is the outermost
            # layer); xref streams are never encrypted by spec
            if decrypting and sdict.get("Type") != "XRef":
                raw = self._crypt.decrypt_stream(raw, ref.num, ref.gen)
            val = Stream(sdict, raw)
        self._cache[ref.num] = val
        return val

    def resolve(self, x: Any) -> Any:
        while isinstance(x, Ref):
            x = self.obj(x)
        return x

    def stream_data(self, s: Stream) -> bytes:
        filt = self.resolve(s.dict.get("Filter"))
        parms = self.resolve(s.dict.get("DecodeParms"))
        data = s.raw
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        parms_list = parms if isinstance(parms, list) else [parms]
        for k, f in enumerate(filters):
            f = self.resolve(f)
            p = self.resolve(parms_list[k]) if k < len(parms_list) else None
            if f == "FlateDecode":
                data = zlib.decompress(data)
            elif f == "ASCIIHexDecode":
                data = _asciihex_decode(data)
            elif f == "ASCII85Decode":
                data = _ascii85_decode(data)
            elif f == "RunLengthDecode":
                data = _runlength_decode(data)
            elif f == "LZWDecode":
                early = 1
                if isinstance(p, dict):
                    early = int(self.resolve(p.get("EarlyChange", 1)) or 0)
                data = _pdf_lzw_decode(data, early)
            else:
                raise PdfError(f"unsupported stream filter {f!r}")
            if f in ("FlateDecode", "LZWDecode") and isinstance(p, dict):
                data = self._apply_predictor(data, p)
        return data

    def _apply_predictor(self, data: bytes, parms: dict) -> bytes:
        """Undo the /DecodeParms predictor after Flate: 1 = none, 2 = TIFF
        horizontal differencing, >=10 = PNG per-row filters (the form every
        real xref stream uses, typically Predictor 12 = Up)."""
        pred = int(self.resolve(parms.get("Predictor", 1)) or 1)
        if pred <= 1:
            return data
        colors = int(self.resolve(parms.get("Colors", 1)) or 1)
        bpc = int(self.resolve(parms.get("BitsPerComponent", 8)) or 8)
        columns = int(self.resolve(parms.get("Columns", 1)) or 1)
        if bpc != 8:
            raise PdfError(f"predictor bpc {bpc} unsupported")
        bpp = max(1, colors)
        rowlen = colors * columns
        if pred == 2:  # TIFF: each byte += byte one sample earlier
            out = bytearray(data)
            for r0 in range(0, len(out) - rowlen + 1, rowlen):
                for j in range(bpp, rowlen):
                    out[r0 + j] = (out[r0 + j] + out[r0 + j - bpp]) & 0xFF
            return bytes(out)
        # PNG predictors: every row is prefixed with its filter byte
        out = bytearray()
        prev = bytearray(rowlen)
        i = 0
        while i + 1 + rowlen <= len(data):
            ft = data[i]
            row = bytearray(data[i + 1 : i + 1 + rowlen])
            i += 1 + rowlen
            if ft == 1:  # Sub
                for j in range(bpp, rowlen):
                    row[j] = (row[j] + row[j - bpp]) & 0xFF
            elif ft == 2:  # Up
                for j in range(rowlen):
                    row[j] = (row[j] + prev[j]) & 0xFF
            elif ft == 3:  # Average
                for j in range(rowlen):
                    left = row[j - bpp] if j >= bpp else 0
                    row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for j in range(rowlen):
                    a = row[j - bpp] if j >= bpp else 0
                    b = prev[j]
                    c = prev[j - bpp] if j >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    row[j] = (row[j] + pr) & 0xFF
            elif ft != 0:
                raise PdfError(f"bad PNG filter byte {ft}")
            out += row
            prev = row
        return bytes(out)

    # -- page tree --------------------------------------------------------
    def _walk_pages(self) -> list[tuple[int, dict]]:
        """(object number, merged page dict) per page, in tree order."""
        root = self.resolve(self.trailer["Root"])
        out: list[tuple[int, dict]] = []

        def walk(node_ref, inherited):
            node = self.resolve(node_ref)
            inh = dict(inherited)
            for k in ("MediaBox", "Resources"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page":
                num = node_ref.num if isinstance(node_ref, Ref) else -1
                out.append((num, {**inh, **node}))
            else:
                for kid in self.resolve(node.get("Kids", [])) or []:
                    walk(kid, inh)

        walk(root.get("Pages"), {})
        return out

    def pages(self) -> list[dict]:
        return [p for _, p in self._walk_pages()]

    def outline(self) -> list[dict]:
        """Flat bookmark list [{title, level, page_no}] in document order —
        the PDF's table of contents, the most authoritative
        heading-hierarchy signal when present (reference
        docling/utils/pdf_outline.py: flat list, each entry carrying its
        own level; 1-based page numbers, None when unresolvable)."""
        root = self.resolve(self.trailer["Root"])
        ol = self.resolve(root.get("Outlines"))
        if not isinstance(ol, dict):
            return []
        page_no_by_obj = {num: i + 1
                          for i, (num, _) in enumerate(self._walk_pages())}
        out: list[dict] = []
        seen: set[int] = set()

        def walk(item_ref, level: int) -> None:
            while isinstance(item_ref, Ref) and item_ref.num not in seen:
                seen.add(item_ref.num)
                item = self.resolve(item_ref)
                if not isinstance(item, dict):
                    return
                title = item.get("Title", "")
                dest = self.resolve(item.get("Dest"))
                page_no = None
                if isinstance(dest, list) and dest and                         isinstance(dest[0], Ref):
                    page_no = page_no_by_obj.get(dest[0].num)
                out.append({"title": str(title), "level": level,
                            "page_no": page_no})
                if item.get("First") is not None:
                    walk(item.get("First"), level + 1)
                item_ref = item.get("Next")

        walk(ol.get("First"), 0)
        return out

    def form_fields(self) -> list[dict]:
        """AcroForm interactive fields in document order:
        [{key, value, widget}] with widget ∈ {input, checkbox, choice}.
        Walks /AcroForm /Fields with /Kids recursion (fully-qualified
        names join with '.'), /FT inheritance from parent to terminal
        field, /V decode (string for Tx/Ch, on-state name for Btn —
        anything but /Off counts as checked). Reference capability
        anchor: the reference reads filled forms through pdfium's form
        API (docling/backend/pypdfium2_backend.py:409); the output
        pairs feed the same kv miner as HTML DOM forms
        (kv_extract.mine_pairs)."""
        root = self.resolve(self.trailer["Root"])
        acro = self.resolve(root.get("AcroForm")) \
            if isinstance(root, dict) else None
        if not isinstance(acro, dict):
            return []
        out: list[dict] = []
        seen: set[int] = set()

        def walk(ref: Any, prefix: str, ft_inh: str | None) -> None:
            if isinstance(ref, Ref):
                if ref.num in seen:
                    return
                seen.add(ref.num)
            f = self.resolve(ref)
            if not isinstance(f, dict):
                return
            t = self.resolve(f.get("T"))
            name = (f"{prefix}.{t}" if prefix and t
                    else str(t or prefix or ""))
            ft = self.resolve(f.get("FT")) or ft_inh
            kids = self.resolve(f.get("Kids"))
            if isinstance(kids, list) and kids:
                for k in kids:
                    walk(k, name, ft)
                return
            v = self.resolve(f.get("V"))
            if ft == "Btn":
                on = isinstance(v, str) and str(v) not in ("", "Off")
                out.append({"key": name,
                            "value": "true" if on else "false",
                            "widget": "checkbox"})
            elif ft in ("Tx", "Ch"):
                if isinstance(v, list):  # multi-select choice
                    val = ", ".join(str(x) for x in v)
                else:
                    val = str(v) if v is not None else ""
                out.append({"key": name, "value": val,
                            "widget": "input" if ft == "Tx" else "choice"})

        for f in (self.resolve(acro.get("Fields")) or []):
            walk(f, "", None)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, Stream):
            return self.stream_data(contents)
        parts = []
        for c in contents:
            parts.append(self.stream_data(self.resolve(c)))
        return b"\n".join(parts)


# ---------------------------------------------------------------------------
# content-stream interpretation → cells / tables / images
# ---------------------------------------------------------------------------

# Master content-stream tokenizer: one regex consumes leading whitespace +
# the next token, so the interpreter loop is one `match` per token instead
# of a byte-wise `skip_ws` + per-class scanner (the round-2 hot loop —
# 2.7x of the pdf parse wall was spent under skip_ws/_parse_lit_string).
# The `lit` alternative only matches strings whose parens are balanced via
# escapes; a *nested unescaped* "(" makes the whole alternative fail, and
# the interpreter falls back to the slow exact `_parse_lit_string`.
# DOTALL so `\\.` covers backslash-newline line continuations.
# Fast path for the canonical simple text block every basic generator
# emits (set font, leading, position, show one string): recognized as ONE
# regex instead of ~11 token matches + dispatch rounds. Anything that
# deviates (T*, Tm, TJ arrays, multiple shows per block, graphics inside
# BT) fails the match and takes the general interpreter below — the fast
# path is a pure shortcut, never a semantic change.
_SIMPLE_BT_RE = re.compile(
    rb"""[\x00\t\n\x0c\r\x20]*BT
     [\x00\t\n\x0c\r\x20]+/(?P<fn>[^\x00\t\n\x0c\r\x20]+)
     [\x00\t\n\x0c\r\x20]+(?P<fs>[+-]?(?:\d+\.?\d*|\.\d+))
     [\x00\t\n\x0c\r\x20]+Tf
     [\x00\t\n\x0c\r\x20]+(?P<tl>[+-]?(?:\d+\.?\d*|\.\d+))
     [\x00\t\n\x0c\r\x20]+TL
     [\x00\t\n\x0c\r\x20]+(?P<x>[+-]?(?:\d+\.?\d*|\.\d+))
     [\x00\t\n\x0c\r\x20]+(?P<y>[+-]?(?:\d+\.?\d*|\.\d+))
     [\x00\t\n\x0c\r\x20]+Td
     [\x00\t\n\x0c\r\x20]+(?:\((?P<txt>(?:[^()\\]|\\.)*)\)
       |<(?P<htx>[0-9A-Fa-f\x00\t\n\x0c\r\x20]*)>)
     [\x00\t\n\x0c\r\x20]*Tj
     [\x00\t\n\x0c\r\x20]+ET(?=[\x00\t\n\x0c\r\x20]|$)""",
    re.VERBOSE | re.DOTALL,
)

_CS_TOKEN_RE = re.compile(
    rb"""[\x00\t\n\x0c\r\x20]*
     (?: (?P<num>[+-]?(?:\d+\.?\d*|\.\d+))
       | \((?P<lit>(?:[^()\\]|\\.)*)\)
       | /(?P<name>[^\x00\t\n\x0c\r\x20()<>\[\]{}/%]*)
       | (?P<op>[A-Za-z'"*]+)
       | (?P<ldict><<)
       | <(?P<hex>[^>]*)>
       | (?P<larr>\[)
       | (?P<rarr>\])
       | (?P<cmt>%[^\r\n]*)
     )""",
    re.VERBOSE | re.DOTALL,
)

_LIT_ESCAPE_RE = re.compile(rb"\\(\d{1,3}|\r\n|.)", re.DOTALL)
_LIT_ESCAPE_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                   b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\",
                   b"\n": b"", b"\r": b"", b"\r\n": b""}


def _unescape_lit(raw: bytes) -> bytes:
    """Decode PDF literal-string escapes (same table as _parse_lit_string)."""
    def sub(m: "re.Match[bytes]") -> bytes:
        e = m.group(1)
        hit = _LIT_ESCAPE_MAP.get(e)
        if hit is not None:
            return hit
        if e.isdigit():
            return bytes([int(e, 8) & 0xFF])
        return e
    return _LIT_ESCAPE_RE.sub(sub, raw)


def _advance_width(text: str, font: float) -> float:
    """Fixed deterministic advance metric (0.5 em per char) — mirrored by
    the synthetic writer; real per-glyph widths need embedded fonts."""
    return 0.5 * font * len(text)


def interpret_content(
    content: bytes, *, height: float, page_no: int,
    resources: dict | None, doc: "PdfDocument | None",
    _depth: int = 0,
) -> dict:
    """Interpret one page's content stream into the pdf_cells page schema.

    Form XObjects (``/Subtype /Form`` — reused headers/footers/logos,
    the second-most-common XObject in wild PDFs) recurse through this
    same interpreter with the form's own /Resources and compose back
    under the repo's translation+scale CTM convention (rotation/skew
    and /BBox clipping ignored, same as page-level geometry); ``_depth``
    bounds form-in-form nesting so reference cycles terminate."""
    lex = _Lexer(content)
    cells: list[dict] = []
    tables: list[dict] = []
    images: list[dict] = []

    font = 10.0
    leading = 0.0
    lx = ly = 0.0  # line matrix origin
    x = y = 0.0
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    ctm_stack: list[tuple] = []
    stack: list[Any] = []
    pending_rects: list[tuple[float, float, float, float]] = []

    # per-font ToUnicode CMaps (CID/Type0 text), resolved lazily on Tf
    cmap: tuple[dict[int, str], int] | None = None
    cmap_cache: dict[str, tuple[dict[int, str], int] | None] = {}

    def font_cmap(name: str):
        if name in cmap_cache:
            return cmap_cache[name]
        result = None
        if doc is not None and isinstance(resources, dict):
            fonts = doc.resolve(resources.get("Font"))
            if isinstance(fonts, dict):
                fd = doc.resolve(fonts.get(name))
                if isinstance(fd, dict):
                    tu = doc.resolve(fd.get("ToUnicode"))
                    if isinstance(tu, Stream):
                        result = _parse_tounicode(doc.stream_data(tu))
                    elif "Encoding" in fd:
                        # simple-font /Encoding: named base and/or
                        # /Differences glyph names (no ToUnicode)
                        result = _simple_encoding_map(
                            doc, doc.resolve(fd.get("Encoding")))
        cmap_cache[name] = result
        return result

    def emit(text: str) -> None:
        nonlocal x
        if cmap is not None:
            text = _apply_tounicode(text, cmap[0], cmap[1])
        if text == "":
            return
        b = height - y
        h = leading if leading > 0 else font
        w = _advance_width(text, font)
        cells.append({
            "text": text, "l": x, "t": b - h,
            "r": x + w, "b": b,
            "font_size": font,
        })
        x += w

    def flush_rects() -> None:
        for (rx, ry, rw, rh) in pending_rects:
            tables.append({"l": rx, "t": height - (ry + rh),
                           "r": rx + rw, "b": height - ry})
        pending_rects.clear()

    i = 0
    n = len(content)
    match_token = _CS_TOKEN_RE.match
    match_simple = _SIMPLE_BT_RE.match
    while i < n:
        ms = match_simple(content, i)
        if ms is not None and b"#" in ms.group("fn"):
            ms = None  # #-escaped font name: take the general tokenizer
        if ms is not None:
            font = float(ms.group("fs"))
            leading = float(ms.group("tl"))
            lx = x = float(ms.group("x"))
            ly = y = float(ms.group("y"))
            # the fast path tracks the block's font too, so CID/Type0
            # text (ToUnicode CMaps) stays on the shortcut
            cmap = font_cmap(ms.group("fn").decode("latin-1"))
            raw = ms.group("txt")
            if raw is not None:
                if b"\\" in raw:
                    raw = _unescape_lit(raw)
                emit(_decode_pdf_text(raw))
            else:
                hx = re.sub(rb"[\x00\t\n\x0c\r\x20]", b"",
                            ms.group("htx"))
                if len(hx) % 2:
                    hx += b"0"
                emit(_decode_pdf_text(bytes.fromhex(hx.decode("ascii"))))
            i = ms.end()
            continue
        m = match_token(content, i)
        if m is None:
            # nested unescaped parens (lit alternative gave up) → exact
            # slow-path string parse; anything else: skip one byte.
            j = lex.skip_ws(i)
            if j < n and content[j : j + 1] == b"(":
                s, i = lex._parse_lit_string(j)
                stack.append(s)
            else:
                i = j + 1
            continue
        i = m.end()
        kind = m.lastgroup
        if kind == "num":
            stack.append(float(m.group("num")))
            continue
        if kind == "lit":
            raw = m.group("lit")
            if b"\\" in raw:
                raw = _unescape_lit(raw)
            stack.append(_decode_pdf_text(raw))
            continue
        if kind == "name":
            raw = m.group("name")
            if b"#" in raw:
                name, _ = lex._parse_name(m.start("name") - 1)
            else:
                name = raw.decode("latin-1")
            stack.append(("__name__", name))
            continue
        if kind != "op":
            if kind == "hex":
                s, i = lex._parse_hex_string(m.start("hex") - 1)
                stack.append(s)
            elif kind == "larr":
                arr, i = lex._parse_array(m.start("larr"))
                stack.append(arr)
            elif kind == "ldict":
                dct, i = lex.parse(m.start("ldict"))
                stack.append(dct)
            # rarr (stray "]") and cmt: skip
            continue
        op = m.group("op").decode("latin-1")

        try:
            if op == "BT":
                lx = ly = x = y = 0.0
            elif op == "Tf" and len(stack) >= 2:
                font = float(stack[-1])
                fname = stack[-2]
                cmap = (font_cmap(fname[1])
                        if isinstance(fname, tuple) and len(fname) == 2
                        else None)
            elif op == "TL" and stack:
                leading = float(stack[-1])
            elif op == "Td" and len(stack) >= 2:
                lx += float(stack[-2]); ly += float(stack[-1])
                x, y = lx, ly
            elif op == "TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                lx += float(stack[-2]); ly += float(stack[-1])
                x, y = lx, ly
            elif op == "Tm" and len(stack) >= 6:
                lx, ly = float(stack[-2]), float(stack[-1])
                x, y = lx, ly
            elif op == "T*":
                ly -= leading
                x, y = lx, ly
            elif op == "Tj" and stack:
                emit(stack[-1] if isinstance(stack[-1], str) else "")
            elif op == "'" and stack:
                ly -= leading
                x, y = lx, ly
                emit(stack[-1] if isinstance(stack[-1], str) else "")
            elif op == '"' and stack:
                ly -= leading
                x, y = lx, ly
                emit(stack[-1] if isinstance(stack[-1], str) else "")
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                # numeric array elements kern the pen by -n/1000 em;
                # kerns wider than ~a space are word gaps many real PDFs
                # use instead of space glyphs — render them as spaces so
                # words don't fuse (pdfium/docling word assembly parity)
                parts: list[str] = []
                for t in stack[-1]:
                    if isinstance(t, str):
                        parts.append(t)
                    elif isinstance(t, (int, float)) and float(t) <= -180:
                        if parts and not parts[-1].endswith(" "):
                            parts.append(" ")
                emit("".join(parts))
            elif op == "q":
                ctm_stack.append(ctm)
            elif op == "Q":
                ctm = ctm_stack.pop() if ctm_stack else (1, 0, 0, 1, 0, 0)
            elif op == "cm" and len(stack) >= 6:
                a2, b2, c2, d2, e2, f2 = (float(v) for v in stack[-6:])
                a1, b1, c1, d1, e1, f1 = ctm
                ctm = (a2 * a1 + b2 * c1, a2 * b1 + b2 * d1,
                       c2 * a1 + d2 * c1, c2 * b1 + d2 * d1,
                       e2 * a1 + f2 * c1 + e1, e2 * b1 + f2 * d1 + f1)
            elif op == "re" and len(stack) >= 4:
                rx, ry, rw, rh = (float(v) for v in stack[-4:])
                pending_rects.append((rx, ry, rw, rh))
            elif op in ("S", "s", "f", "F", "f*", "B", "B*", "b", "b*"):
                flush_rects()
            elif op == "n":
                pending_rects.clear()
            elif op == "BI":
                # inline image: parse abbreviated key/value pairs up to
                # ID, capture the binary payload to the EI delimiter
                # (whitespace-EI-whitespace, the standard scan — raw
                # sample bytes never reach the tokenizer), and decode it
                # into a real imgpx:// ref; unsupported subsets keep the
                # old opaque-skip behavior
                params: dict = {}
                key = None
                j = i
                while True:
                    mt = match_token(content, j)
                    if mt is None:
                        raise PdfError("inline image missing ID")
                    j = mt.end()
                    kt = mt.lastgroup
                    if kt == "op":
                        tok = mt.group("op")
                        if tok == b"ID":
                            break
                        if key is not None and tok in (b"true", b"false"):
                            params[key] = tok == b"true"
                            key = None
                        continue
                    if kt == "name":
                        nm = mt.group("name").decode("latin-1")
                        if key is None:
                            key = nm
                        else:
                            params[key] = nm
                            key = None
                    elif kt == "num" and key is not None:
                        params[key] = float(mt.group("num"))
                        key = None
                    elif kt == "larr":
                        arr, j = lex._parse_array(mt.start("larr"))
                        if key is not None:
                            params[key] = arr
                            key = None
                    elif kt == "ldict":
                        dct, j = lex.parse(mt.start("ldict"))
                        if key is not None:
                            params[key] = dct
                            key = None
                if j < n and content[j: j + 1] in (b"\x00", b"\t", b"\n",
                                                   b"\x0c", b"\r", b" "):
                    j += 1
                m_ei = re.compile(
                    rb"[\x00\t\n\x0c\r\x20]EI(?=[\x00\t\n\x0c\r\x20]|$)"
                ).search(content, j)
                if m_ei is None:
                    raise PdfError("inline image missing EI")
                try:
                    ref = _inline_image_ref(params, content[j: m_ei.start()])
                except Exception:
                    ref = None
                if ref is not None:
                    a, _b, _c, dd, e, f = ctm
                    images.append({
                        "l": e, "t": height - (f + dd), "r": e + a,
                        "b": height - f, "media_ref": ref,
                    })
                i = m_ei.end()
                stack.clear()
            elif op == "Do" and stack and resources is not None and doc is not None:
                name = stack[-1][1] if isinstance(stack[-1], tuple) else None
                xobjs = doc.resolve(resources.get("XObject", {})) or {}
                xo = doc.resolve(xobjs.get(name)) if name else None
                if isinstance(xo, Stream) and \
                        doc.resolve(xo.dict.get("Subtype")) == "Image":
                    a, _b, _c, dd, e, f = ctm
                    ref = doc.resolve(xo.dict.get("DoclingRef"))
                    if ref is None:
                        # real pixel payload: decode into the canonical
                        # imgpx:// ref (geometry + mode + fingerprint)
                        try:
                            ref = _image_xobject_ref(doc, xo)
                        except Exception:
                            ref = None
                    if ref is None:
                        ref = f"pdfimg://page{page_no}/{name}"
                    images.append({
                        "l": e, "t": height - (f + dd), "r": e + a,
                        "b": height - f, "media_ref": str(ref),
                    })
                elif isinstance(xo, Stream) and \
                        doc.resolve(xo.dict.get("Subtype")) == "Form" \
                        and _depth < 8:
                    a, _b, _c, dd, e, f = ctm
                    mtx = doc.resolve(xo.dict.get("Matrix"))
                    if isinstance(mtx, list) and len(mtx) == 6:
                        # compose the form /Matrix (translation+scale)
                        ma, _, _, md, me, mf = (float(v) for v in mtx)
                        e, f = a * me + e, dd * mf + f
                        a, dd = a * ma, dd * md
                    fres = doc.resolve(xo.dict.get("Resources"))
                    sub = interpret_content(
                        doc.stream_data(xo), height=height,
                        page_no=page_no,
                        resources=fres if isinstance(fres, dict)
                        else resources,
                        doc=doc, _depth=_depth + 1)
                    for c in sub["cells"]:
                        cells.append({
                            "text": c["text"],
                            "l": a * c["l"] + e,
                            "r": a * c["r"] + e,
                            "t": height - (dd * (height - c["t"]) + f),
                            "b": height - (dd * (height - c["b"]) + f),
                            "font_size": dd * c["font_size"],
                        })
                    for tb in sub["tables"]:
                        tables.append({
                            "l": a * tb["l"] + e,
                            "r": a * tb["r"] + e,
                            "t": height - (dd * (height - tb["t"]) + f),
                            "b": height - (dd * (height - tb["b"]) + f),
                        })
                    for im in sub["images"]:
                        images.append({
                            "l": a * im["l"] + e,
                            "r": a * im["r"] + e,
                            "t": height - (dd * (height - im["t"]) + f),
                            "b": height - (dd * (height - im["b"]) + f),
                            "media_ref": im["media_ref"],
                        })
        except (ValueError, IndexError, KeyError, PdfError):
            pass  # malformed operator input: skip, never raise
        stack.clear()
    return {"page_no": page_no, "width": 0.0, "height": height,
            "cells": cells, "tables": tables, "images": images}


def _image_xobject_ref(doc: "PdfDocument", xo: Stream) -> str | None:
    """Decode an image XObject's pixel payload into the canonical
    ``imgpx://WxH/mode/fp`` media_ref (functions/refs.image_media_ref —
    the same convention the standalone image backend emits, so embedded
    and standalone pictures fingerprint identically). Supported payloads:
    /DCTDecode (JPEG, via stages/image_codec.decode_jpeg, any preceding
    filters applied first) and raw 8-bit /DeviceRGB | /DeviceGray samples
    under the generic filter chain. Returns None for anything else —
    the caller falls back to a synthesized provenance ref. Reference:
    pdfium decodes embedded images for the picture-extraction options
    (docling/datamodel/pipeline_options.py generate_picture_images;
    pypdfium2_backend.py:409)."""
    import numpy as np

    from docling_ray.functions.refs import image_media_ref

    d = xo.dict
    w = int(doc.resolve(d.get("Width", 0)) or 0)
    h = int(doc.resolve(d.get("Height", 0)) or 0)
    if w <= 0 or h <= 0:
        return None
    filt = doc.resolve(d.get("Filter"))
    filters = [doc.resolve(f) for f in
               (filt if isinstance(filt, list) else [filt] if filt else [])]
    if filters and filters[-1] == "DCTDecode":
        from docling_ray.stages.image_codec import decode_jpeg

        pre = dict(d)
        pre["Filter"] = filters[:-1]
        parms = doc.resolve(d.get("DecodeParms"))
        if isinstance(parms, list):
            pre["DecodeParms"] = parms[:-1]
        arr, mode = decode_jpeg(doc.stream_data(Stream(pre, xo.raw)))
        return image_media_ref(arr.shape[1], arr.shape[0], mode,
                               arr.tobytes())
    if filters and filters[-1] == "CCITTFaxDecode":
        # scanned-page shape: G4 (K<0), byte-aligned MH (K=0 +
        # EncodedByteAlign), unaligned 1D (K=0) or mixed 1D/2D (K>0);
        # BlackIs1 maps fax-black runs to sample 1 (PDF 1.7 §7.4.6 —
        # default false: black = sample 0)
        from docling_ray.stages.fax_codec import (FaxError, decode_g3,
                                                  decode_g4,
                                                  decode_mh_rle)

        pre = dict(d)
        pre["Filter"] = filters[:-1]
        parms = doc.resolve(d.get("DecodeParms"))
        if isinstance(parms, list):
            plist = [doc.resolve(p) for p in parms]
            parm = plist[-1] if plist else None
            pre["DecodeParms"] = parms[:-1]
        else:
            parm = parms
        parm = parm if isinstance(parm, dict) else {}
        k = int(doc.resolve(parm.get("K", 0)) or 0)
        cols = int(doc.resolve(parm.get("Columns", 1728)) or 1728)
        rows = int(doc.resolve(parm.get("Rows", h)) or h)
        aligned = bool(doc.resolve(parm.get("EncodedByteAlign", False)))
        black1 = bool(doc.resolve(parm.get("BlackIs1", False)))
        raw = doc.stream_data(Stream(pre, xo.raw))
        try:
            if k < 0:
                bits = decode_g4(raw, cols, rows)
            elif k == 0 and aligned:
                bits = decode_mh_rle(raw, cols, rows)
            else:
                bits = decode_g3(raw, cols, rows, k=k,
                                 byte_align=aligned)
        except FaxError:
            return None
        gray = ((bits if black1 else 1 - bits)
                .astype(np.uint8) * 255)[:rows, :cols]
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        return image_media_ref(cols, rows, "1", rgb.tobytes())
    bpc = int(doc.resolve(d.get("BitsPerComponent", 8)) or 8)
    cs = doc.resolve(d.get("ColorSpace"))
    if bpc != 8 or cs not in ("DeviceRGB", "DeviceGray"):
        return None
    nch = 3 if cs == "DeviceRGB" else 1
    data = doc.stream_data(xo)
    if len(data) < w * h * nch:
        return None
    a = np.frombuffer(data[: w * h * nch], dtype=np.uint8)
    if nch == 1:
        rgb = np.repeat(a.reshape(h, w, 1), 3, axis=2)
        return image_media_ref(w, h, "L", rgb.tobytes())
    return image_media_ref(w, h, "RGB", a.reshape(h, w, 3).tobytes())


_INLINE_KEYS = {"W": "Width", "H": "Height", "BPC": "BitsPerComponent",
                "CS": "ColorSpace", "F": "Filter", "DP": "DecodeParms",
                "IM": "ImageMask", "D": "Decode"}
_INLINE_CS = {"G": "DeviceGray", "RGB": "DeviceRGB",
              "DeviceGray": "DeviceGray", "DeviceRGB": "DeviceRGB"}
_INLINE_FILTERS = {"AHx": "ASCIIHexDecode", "A85": "ASCII85Decode",
                   "LZW": "LZWDecode", "Fl": "FlateDecode",
                   "RL": "RunLengthDecode", "CCF": "CCITTFaxDecode",
                   "DCT": "DCTDecode"}


def _inline_image_ref(params: dict, payload: bytes) -> str | None:
    """Decode one inline image (BI..ID..EI) into the canonical
    imgpx:// media_ref, or None for the unsupported subset (image
    masks, indexed/CMYK color, JBIG2 etc.) — the caller keeps the old
    opaque-skip behavior then. Abbreviated keys/filters expand per
    PDF 1.7 table 93; payload filters reuse the stream-filter
    decoders; DCT routes to the JPEG decoder, CCF to the fax codec."""
    import numpy as np

    from docling_ray.functions.refs import image_media_ref

    p = {_INLINE_KEYS.get(k, k): v for k, v in params.items()}
    if p.get("ImageMask"):
        return None
    try:
        w = int(p.get("Width", 0))
        h = int(p.get("Height", 0))
        bpc = int(p.get("BitsPerComponent", 8))
    except (TypeError, ValueError):
        return None
    if w <= 0 or h <= 0:
        return None
    filt = p.get("Filter")
    filters = [_INLINE_FILTERS.get(f, f)
               for f in (filt if isinstance(filt, list)
                         else [filt] if filt else [])]
    dp = p.get("DecodeParms")
    dp = dp if isinstance(dp, dict) else {}
    last = filters[-1] if filters else None
    data = payload
    pre = filters[:-1] if last in ("DCTDecode", "CCITTFaxDecode") \
        else filters
    for f in pre:
        if f == "FlateDecode":
            data = zlib.decompress(data)
        elif f == "ASCIIHexDecode":
            data = _asciihex_decode(data)
        elif f == "ASCII85Decode":
            data = _ascii85_decode(data)
        elif f == "RunLengthDecode":
            data = _runlength_decode(data)
        elif f == "LZWDecode":
            data = _pdf_lzw_decode(data)
        else:
            return None
    if last == "DCTDecode":
        from docling_ray.stages.image_codec import ImageError, decode_jpeg

        try:
            arr, mode = decode_jpeg(data)
        except ImageError:
            return None
        return image_media_ref(arr.shape[1], arr.shape[0], mode,
                               arr.tobytes())
    if last == "CCITTFaxDecode":
        from docling_ray.stages.fax_codec import (FaxError, decode_g3,
                                                  decode_g4,
                                                  decode_mh_rle)

        k = int(dp.get("K", 0) or 0)
        cols = int(dp.get("Columns", 1728) or 1728)
        rows = int(dp.get("Rows", h) or h)
        black1 = bool(dp.get("BlackIs1", False))
        align = bool(dp.get("EncodedByteAlign"))
        try:
            if k < 0:
                bits = decode_g4(data, cols, rows)
            elif k == 0 and align:
                bits = decode_mh_rle(data, cols, rows)
            else:
                # K=0 unaligned 1D (EOLs tolerated) and K>0 mixed
                # 1D/2D (EOL + tag bit per line)
                bits = decode_g3(data, cols, rows, k=k,
                                 byte_align=align)
        except FaxError:
            return None
        gray = (bits if black1 else 1 - bits).astype(np.uint8) * 255
        return image_media_ref(
            cols, rows, "1",
            np.repeat(gray[:, :, None], 3, axis=2).tobytes())
    cs = _INLINE_CS.get(p.get("ColorSpace"))
    if bpc != 8 or cs is None:
        return None
    nch = 3 if cs == "DeviceRGB" else 1
    if len(data) < w * h * nch:
        return None
    a = np.frombuffer(data[: w * h * nch], dtype=np.uint8)
    if nch == 1:
        rgb = np.repeat(a.reshape(h, w, 1), 3, axis=2)
        return image_media_ref(w, h, "L", rgb.tobytes())
    return image_media_ref(w, h, "RGB", a.reshape(h, w, 3).tobytes())


def parse_pdf_pages(data: bytes) -> list[dict]:
    """PDF bytes → list of page dicts in the pdf_cells payload schema."""
    return _pages_from_doc(PdfDocument(data))


def _pages_from_doc(doc: PdfDocument) -> list[dict]:
    out: list[dict] = []
    for pno, page in enumerate(doc.pages(), start=1):
        media = doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792]
        media = [float(doc.resolve(v)) for v in media]
        width, height = media[2] - media[0], media[3] - media[1]
        content = doc.page_content(page)
        resources = doc.resolve(page.get("Resources")) or {}
        pd = interpret_content(content, height=height, page_no=pno,
                               resources=resources, doc=doc)
        pd["width"] = width
        pd["links"] = _page_link_annots(doc, page, pd["cells"], height)
        out.append(pd)
    return out


def _page_link_annots(doc: PdfDocument, page: dict, cells: list,
                      height: float) -> list[dict]:
    """/Annots URI link actions on one page → [{text, href}] in annot
    order; the anchor text is the cells whose centers fall inside the
    link rectangle (the reference surfaces PDF hyperlinks through
    pdfium's link API the same rect-hit way)."""
    links: list[dict] = []
    for aref in (doc.resolve(page.get("Annots")) or []):
        a = doc.resolve(aref)
        if not isinstance(a, dict) or doc.resolve(a.get("Subtype")) != "Link":
            continue
        act = doc.resolve(a.get("A"))
        if not isinstance(act, dict) or doc.resolve(act.get("S")) != "URI":
            continue
        uri = doc.resolve(act.get("URI"))
        rect = doc.resolve(a.get("Rect")) or []
        if uri is None or len(rect) != 4:
            continue
        x0, x1 = sorted((float(doc.resolve(rect[0])),
                         float(doc.resolve(rect[2]))))
        y0, y1 = sorted((float(doc.resolve(rect[1])),
                         float(doc.resolve(rect[3]))))
        top, bot = height - y1, height - y0  # top-down band
        texts = [c["text"] for c in cells
                 if x0 <= (c["l"] + c["r"]) / 2 <= x1
                 and top <= (c["t"] + c["b"]) / 2 <= bot]
        links.append({"text": " ".join(texts), "href": str(uri)})
    return links


def extract_pdf_links(payload_b64: str) -> list[tuple[str, str, str]]:
    """Hyperlink annotations of one ``pdf`` input span → (text, href,
    region) triples in page/annot order, region fixed to ``"pdf"`` —
    the PDF twin of html_extract.extract_links. Total: malformed input
    returns []."""
    try:
        pages = parse_pdf_pages(base64.b64decode(payload_b64,
                                                 validate=True))
    except Exception:
        return []
    return [(ln["text"], ln["href"], "pdf")
            for page in pages for ln in page.get("links", [])]


def extract_pdf_bytes_unit(
    payload_b64: str,
) -> tuple[list[Span], int, float, str | None]:
    """One ``pdf`` input span (base64 of a whole PDF file) → (spans in page
    order, page_no=-1, min page score, error). Pages below the parse-score
    floor are dropped and reported — same degradation semantics as the
    pdf_cells path (errors are data, never exceptions)."""
    try:
        data = base64.b64decode(payload_b64, validate=True)
        doc = PdfDocument(data)
        pages = _pages_from_doc(doc)
    except Exception as e:
        return [], -1, 0.0, f"pdf parse error: {type(e).__name__}: {e}"
    spans: list[Span] = []
    errs: list[str] = []
    score = 1.0
    from docling_ray.stages.pdf_layout import MIN_PARSE_SCORE

    page_lists: list[tuple[int, list[Span]]] = []
    for page in pages:
        p_spans, p_score = extract_page(page)
        score = min(score, p_score)
        if not p_spans and p_score < MIN_PARSE_SCORE:
            errs.append(f"page {page['page_no']} dropped: "
                        f"parse_score={p_score:.3f}")
        if p_spans:
            page_lists.append((int(page["page_no"]), p_spans))
    # cross-page hyphen merge between consecutive pages (same rule as the
    # pdf_cells assembly — see assemble.merge_page_boundary)
    from docling_ray.stages.assemble import merge_page_boundary

    for i in range(len(page_lists) - 1):
        pa_, la = page_lists[i]
        pb_, lb = page_lists[i + 1]
        if pb_ == pa_ + 1:
            merged = merge_page_boundary(la, lb)
            if merged is not None:
                page_lists[i] = (pa_, merged[0])
                page_lists[i + 1] = (pb_, merged[1])
    for _pno, p_spans in page_lists:
        spans.extend(p_spans)
    # AcroForm fields append after page content with the same span
    # convention as HTML DOM forms (html_extract._handle_form): the
    # field set is document data, not page geometry
    try:
        fields = doc.form_fields()
    except Exception as e:  # a broken form tree never drops the doc
        fields = []
        errs.append(f"acroform error: {type(e).__name__}: {e}")
    for f in fields:
        if f["widget"] == "checkbox":
            spans.append(("checkbox_selected" if f["value"] == "true"
                          else "checkbox_unselected", "", ""))
            if f["key"]:
                spans.append(("text", f["key"], ""))
        elif f["key"] and f["value"]:
            spans.append(("text", f"{f['key']}: {f['value']}", ""))
        elif f["value"]:
            spans.append(("text", f["value"], ""))
    return spans, -1, score, ("; ".join(errs) or None)
