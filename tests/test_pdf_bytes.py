"""PDF-bytes backend tests: the generator-side writer (synth) and the
engine-side parser (stages/pdf_bytes) are independent implementations —
round-trip span equality across them is the backend's correctness oracle
(the same role the reference's conversion fixtures play for
pypdfium2_backend.py:409 / docling_parse_backend.py:85)."""

import base64
import random

import pytest

from docling_ray import schema as S
from docling_ray.stages.pdf_bytes import (
    PdfDocument,
    extract_pdf_bytes_unit,
    parse_pdf_pages,
)
from docling_ray.synth import (
    VOCAB,
    build_pdf_bytes_doc,
    pages_to_pdf_bytes,
)


def _simple_pages():
    return [{
        "page_no": 1, "width": 612.0, "height": 792.0,
        "cells": [
            {"text": "A Title Here", "l": 72.0, "t": 72.0, "r": 292.0,
             "b": 94.0, "font_size": 20.0},
            {"text": "body line one", "l": 72.0, "t": 110.0, "r": 292.0,
             "b": 121.0, "font_size": 10.0},
            {"text": "body line two", "l": 72.0, "t": 123.0, "r": 292.0,
             "b": 134.0, "font_size": 10.0},
        ],
        "tables": [{"l": 70.0, "t": 300.0, "r": 542.0, "b": 360.0}],
        "images": [{"l": 72.0, "t": 400.0, "r": 300.0, "b": 490.0,
                    "media_ref": "img://t/1"}],
    }]


def test_writer_parser_cell_geometry_roundtrip():
    pages = _simple_pages()
    parsed = parse_pdf_pages(pages_to_pdf_bytes(pages))
    assert len(parsed) == 1
    got = parsed[0]
    assert got["width"] == 612.0 and got["height"] == 792.0
    for orig, cell in zip(pages[0]["cells"], got["cells"]):
        # l, t, b, font recovered exactly; r uses the parser's fixed
        # advance metric (0.5 em/char)
        assert cell["text"] == orig["text"]
        assert cell["l"] == orig["l"]
        assert cell["t"] == orig["t"]
        assert cell["b"] == orig["b"]
        assert cell["font_size"] == orig["font_size"]
        assert cell["r"] == cell["l"] + 0.5 * cell["font_size"] * len(cell["text"])
    assert got["tables"] == pages[0]["tables"]
    assert got["images"] == pages[0]["images"]


def test_unicode_and_escapes_roundtrip():
    pages = [{
        "page_no": 1, "width": 612.0, "height": 792.0,
        "cells": [
            {"text": "par(en)s and \\ backslash", "l": 72.0, "t": 100.0,
             "r": 292.0, "b": 111.0, "font_size": 10.0},
            {"text": "ligature ﬁeld and � replacement", "l": 72.0,
             "t": 120.0, "r": 292.0, "b": 131.0, "font_size": 10.0},
        ],
        "tables": [], "images": [],
    }]
    parsed = parse_pdf_pages(pages_to_pdf_bytes(pages))
    texts = [c["text"] for c in parsed[0]["cells"]]
    assert texts == [c["text"] for c in pages[0]["cells"]]


def test_fixture_roundtrip_many_seeds():
    ok = 0
    for seed in range(25):
        rng = random.Random(seed)
        b64, exp, status, _outline, _links = build_pdf_bytes_doc(rng, VOCAB,
                                                         f"d{seed}")
        spans, _pno, _score, err = extract_pdf_bytes_unit(b64)
        assert spans == exp, f"seed {seed}"
        if status == S.STATUS_PARTIAL:
            assert err and "dropped" in err
        ok += 1
    assert ok == 25


def test_multipage_order_and_flate():
    rng = random.Random(4)
    pages = []
    for p in range(3):
        pages.append({
            "page_no": p + 1, "width": 612.0, "height": 792.0,
            "cells": [{"text": f"page {p} text content here", "l": 72.0,
                       "t": 100.0, "r": 292.0, "b": 111.0,
                       "font_size": 10.0}],
            "tables": [], "images": [],
        })
    data = pages_to_pdf_bytes(pages)
    assert b"FlateDecode" in data
    spans, *_ = extract_pdf_bytes_unit(base64.b64encode(data).decode())
    assert [s[1] for s in spans] == [f"page {p} text content here"
                                     for p in range(3)]


def test_poison_inputs_are_data_not_exceptions():
    # not base64
    spans, pno, score, err = extract_pdf_bytes_unit("@@@not-b64@@@")
    assert spans == [] and err and "pdf parse error" in err
    # base64 of garbage bytes
    spans, _, _, err = extract_pdf_bytes_unit(
        base64.b64encode(b"this is not a pdf at all").decode())
    assert spans == [] and err
    # truncated file
    data = pages_to_pdf_bytes(_simple_pages())
    trunc = base64.b64encode(data[: len(data) // 3]).decode()
    spans, _, _, err = extract_pdf_bytes_unit(trunc)
    assert err is None or isinstance(err, str)  # never raises


def test_broken_xref_falls_back_to_object_scan():
    data = pages_to_pdf_bytes(_simple_pages())
    # corrupt the startxref offset — parser must rescan N 0 obj headers
    broken = data.replace(b"startxref", b"startxrff")
    doc = PdfDocument(broken)
    pages = doc.pages()
    assert len(pages) == 1
    spans, _, _, err = extract_pdf_bytes_unit(
        base64.b64encode(broken).decode())
    assert any("A Title Here" in s[1] for s in spans)


def test_pdf_kind_in_full_pipeline(ray_session):
    import ray

    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.synth import make_corpus

    # make a corpus slice and confirm at least one pdf-bytes doc exists
    inp, exp = make_corpus(80, seed=23)
    kinds = {s["kind"] for row in inp.to_pylist() for s in row["spans"]}
    assert "pdf" in kinds
    out = extract_corpus(ray.data.from_arrow(inp), mode="fast").to_pandas()
    got = {r.doc_id: [(s["kind"], s["text"], s["media_ref"]) for s in r.spans]
           for r in out.itertuples(index=False)}
    for row in exp.to_pylist():
        want = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        assert got[row["doc_id"]] == want


def test_outline_roundtrip_and_nesting():
    import random

    from docling_ray.synth import build_pdf_bytes_doc

    for seed in range(15):
        rng = random.Random(seed)
        b64, exp, status, exp_outline, _links = build_pdf_bytes_doc(
            rng, VOCAB, f"o{seed}")
        doc = PdfDocument(base64.b64decode(b64))
        got = [(o["title"], o["level"], o["page_no"]) for o in doc.outline()]
        assert got == list(exp_outline)


def test_outline_absent_and_cycle_guard():
    data = pages_to_pdf_bytes(_simple_pages())
    assert PdfDocument(data).outline() == []
    # cycle in Next chain must not loop forever
    pages = _simple_pages()
    from docling_ray.synth import pages_to_pdf_bytes as w

    data = w(pages, outline=[(0, "A", 0), (0, "B", 0)])
    doc = PdfDocument(data)
    assert [o["title"] for o in doc.outline()] == ["A", "B"]


# --- PDF 1.5 xref streams + object streams (reference parity anchor:
# pypdfium2_backend.py:409 parses any conforming PDF; most post-2005 files
# use /Type /XRef + /Type /ObjStm) ---------------------------------------

def test_xrefstream_roundtrip_simple():
    pages = _simple_pages()
    data = pages_to_pdf_bytes(pages, style="xrefstream")
    assert data.startswith(b"%PDF-1.5")
    assert b"/Type /XRef" in data and b"/ObjStm" in data
    assert b"trailer" not in data  # no classic table at all
    parsed = parse_pdf_pages(data)
    got = parsed[0]
    assert [c["text"] for c in got["cells"]] == \
        [c["text"] for c in pages[0]["cells"]]
    assert got["tables"] == pages[0]["tables"]
    assert got["images"] == pages[0]["images"]


def test_xrefstream_fixture_roundtrip_many_seeds():
    saw = {"classic": 0, "xrefstream": 0}
    for seed in range(30):
        rng = random.Random(seed)
        b64, exp, status, exp_outline, _links = build_pdf_bytes_doc(
            rng, VOCAB, f"x{seed}")
        data = base64.b64decode(b64)
        style = "xrefstream" if data.startswith(b"%PDF-1.5") else "classic"
        saw[style] += 1
        spans, _pno, _score, err = extract_pdf_bytes_unit(b64)
        assert spans == exp, f"seed {seed} ({style})"
        doc = PdfDocument(data)
        got = [(o["title"], o["level"], o["page_no"]) for o in doc.outline()]
        assert got == list(exp_outline), f"seed {seed} ({style})"
    # the generator must exercise BOTH serializations
    assert saw["classic"] > 0 and saw["xrefstream"] > 0, saw


def test_predictor_png_up_and_none_agree():
    """The xref-stream writer uses PNG Up (Predictor 12); hand-build the
    same entry table with no predictor and with TIFF predictor 2 and
    check the parser decodes all three identically."""
    import zlib as _z

    from docling_ray.stages.pdf_bytes import PdfDocument as _D, Stream

    doc = _D(pages_to_pdf_bytes(_simple_pages()))  # any doc for resolve()
    raw = bytes(range(7)) * 3  # three 7-byte rows
    # PNG Up
    rows = [raw[i:i + 7] for i in range(0, 21, 7)]
    from docling_ray.synth import _png_up_filter
    enc = _z.compress(_png_up_filter(rows))
    s = Stream({"Filter": "FlateDecode", "Length": len(enc),
                "DecodeParms": {"Predictor": 12, "Columns": 7}}, enc)
    assert doc.stream_data(s) == raw
    # no predictor
    enc2 = _z.compress(raw)
    s2 = Stream({"Filter": "FlateDecode", "Length": len(enc2)}, enc2)
    assert doc.stream_data(s2) == raw
    # TIFF predictor 2 (horizontal differencing per row)
    tif = bytearray()
    for r in rows:
        tif.append(r[0])
        for j in range(1, 7):
            tif.append((r[j] - r[j - 1]) & 0xFF)
    enc3 = _z.compress(bytes(tif))
    s3 = Stream({"Filter": "FlateDecode", "Length": len(enc3),
                 "DecodeParms": {"Predictor": 2, "Columns": 7}}, enc3)
    assert doc.stream_data(s3) == raw


def test_xrefstream_corruption_is_total():
    """Byte smashes over a 1.5-style file surface as error data, never
    exceptions (same totality bar as the classic-xref fuzz)."""
    data = bytearray(pages_to_pdf_bytes(_simple_pages(),
                                        style="xrefstream"))
    for pos in range(0, len(data), 13):
        smashed = bytearray(data)
        smashed[pos] = 0xFF
        spans, _pno, _score, err = extract_pdf_bytes_unit(
            base64.b64encode(bytes(smashed)).decode())
        assert isinstance(spans, list)
        assert err is None or isinstance(err, str)


def test_xrefstream_broken_falls_back_to_scan():
    data = pages_to_pdf_bytes(_simple_pages(), style="xrefstream")
    broken = data.replace(b"startxref", b"startxrff")
    # xref gone; ObjStm-compressed catalog is invisible to the N-0-obj
    # scan, but the top-level streams (content) still parse via scan +
    # catalog discovery fails -> error data, not an exception
    spans, _, _, err = extract_pdf_bytes_unit(
        base64.b64encode(broken).decode())
    assert isinstance(spans, list)
    assert err is None or isinstance(err, str)


# --- classic stream filters (PDF 7.4.2-7.4.5) ------------------------------

def test_filter_decoders_pinned_literals():
    """Hand-written byte vectors per decoder — the literal leg; the
    writer round trip is the other leg (synth content_filter variants)."""
    from docling_ray.stages.pdf_bytes import (_ascii85_decode,
                                              _asciihex_decode, _pdf_lzw_decode,
                                              _runlength_decode)

    assert _asciihex_decode(b"48 65 6c6C 6F>") == b"Hello"
    assert _asciihex_decode(b"7>") == b"\x70"  # odd nibble pads 0
    assert _ascii85_decode(b"9jqo^~>") == b"Man "  # the published vector
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _ascii85_decode(b"9jqo~>") == b"Man"  # partial group
    assert _runlength_decode(b"\x02abc\xfeX\x80") == b"abcXXX"
    # LZW: codes [CLEAR, 'A', 'B', EOD] packed MSB-first at 9 bits
    bits = ""
    for c in (256, 65, 66, 257):
        bits += format(c, "09b")
    bits += "0" * (-len(bits) % 8)
    data = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert _pdf_lzw_decode(data) == b"AB"
    # LZW KwKwK case: [CLEAR, 'A', 258, EOD] -> "A" + "AA"
    bits = "".join(format(c, "09b") for c in (256, 65, 258, 257))
    bits += "0" * (-len(bits) % 8)
    data = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert _pdf_lzw_decode(data) == b"AAA"


def test_filter_variants_extract_end_to_end():
    """Docs whose content streams use LZW/RunLength/ASCIIHex/ASCII85
    extract identically to their Flate twins."""
    import json as _json

    from docling_ray.stages.pdf_bytes import parse_pdf_pages
    from docling_ray.synth import build_pdf_page, pages_to_pdf_bytes
    import random

    rng = random.Random(9)
    payload, exp, _ = build_pdf_page(rng, ["alpha", "beta", "gamma"],
                                     "f1", page_no=1, media_seq=[0],
                                     first_page=True, two_col_allowed=False)
    page = _json.loads(payload)
    base = None
    for filt in ("flate", "lzw", "rl", "ahx", "a85"):
        data = pages_to_pdf_bytes([page], content_filter=filt)
        pages = parse_pdf_pages(data)
        cells = [(c["text"], round(c["l"], 2), round(c["t"], 2))
                 for c in pages[0]["cells"]]
        if base is None:
            base = cells
        assert cells == base, filt


def test_tj_kern_word_gaps():
    """TJ numeric kerns wider than ~a space become word separators;
    small kerns (letter-fitting) do not split words."""
    import zlib as zl

    from docling_ray.stages.pdf_bytes import parse_pdf_pages

    content = b"BT /F1 10 Tf 12 TL 50 700 Td " \
              b"[(Hello) -300 (world) -40 (!)] TJ ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R >>",
    }
    comp = zl.compress(content)
    objs[4] = (b"<< /Filter /FlateDecode /Length "
               + str(len(comp)).encode() + b" >>\nstream\n" + comp
               + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for num in sorted(objs):
        offs[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for num in sorted(objs):
        out += f"{offs[num]:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    pages = parse_pdf_pages(bytes(out))
    texts = [c["text"] for c in pages[0]["cells"]]
    assert texts == ["Hello world!"]


def test_tounicode_cmap_literals():
    """Pin the CMap parser on hand-written bfchar/bfrange sections."""
    from docling_ray.stages.pdf_bytes import _apply_tounicode, _parse_tounicode

    cmap = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            b"2 beginbfchar\n<0001> <0041>\n<0002> <00E9>\nendbfchar\n"
            b"1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n"
            b"1 beginbfrange\n<0020> <0021> [<0058> <20AC>]\nendbfrange\n")
    mapping, code_len = _parse_tounicode(cmap)
    assert code_len == 2
    assert mapping[1] == "A" and mapping[2] == "é"
    assert (mapping[0x10], mapping[0x11], mapping[0x12]) == ("a", "b", "c")
    assert mapping[0x20] == "X" and mapping[0x21] == "€"
    # raw 2-byte codes arrive latin-1-decoded from the lexer
    raw = bytes([0, 1, 0, 0x10, 0, 0x21]).decode("latin-1")
    assert _apply_tounicode(raw, mapping, 2) == "Aa€"
    # unmapped code -> replacement char, never an exception
    raw = bytes([0, 0x7F]).decode("latin-1")
    assert _apply_tounicode(raw, mapping, 2) == "�"


def test_cid_font_extracts_like_type1():
    """Identity-H Type0 text with /ToUnicode recovers the same cells as
    the Type1 twin across styles and stream filters."""
    import json as _json
    import random

    from docling_ray.stages.pdf_bytes import parse_pdf_pages
    from docling_ray.synth import build_pdf_page, pages_to_pdf_bytes

    rng = random.Random(15)
    payload, _, _ = build_pdf_page(rng, ["spark", "graft", "table"], "cf",
                                   page_no=1, media_seq=[0],
                                   first_page=True, two_col_allowed=False)
    page = _json.loads(payload)
    base = parse_pdf_pages(pages_to_pdf_bytes([page]))
    for style in ("classic", "xrefstream"):
        for filt in ("flate", "lzw"):
            got = parse_pdf_pages(pages_to_pdf_bytes(
                [page], style=style, content_filter=filt, cid_font=True))
            a = [(c["text"], round(c["l"], 2)) for c in base[0]["cells"]]
            b = [(c["text"], round(c["l"], 2)) for c in got[0]["cells"]]
            assert a == b, (style, filt)


def test_inline_image_skipped():
    """BI..ID..EI binary payload (including bytes that look like tokens)
    is skipped; surrounding text still extracts."""
    from docling_ray.stages.pdf_bytes import interpret_content

    content = (b"BT /F1 10 Tf 12 TL 50 700 Td (before) Tj ET\n"
               b"BI /W 4 /H 1 /CS /G /BPC 8 ID \x00\xff(\\garbage BT ( EI\n"
               b"BT /F1 10 Tf 12 TL 50 680 Td (after) Tj ET")
    page = interpret_content(content, height=792.0, page_no=1,
                             resources=None, doc=None)
    assert [c["text"] for c in page["cells"]] == ["before", "after"]


# ----------------------------------------------------------------------
# encrypted PDFs (standard security handler, empty user password)
# ----------------------------------------------------------------------

def test_embedded_image_xobjects_roundtrip():
    """Image XObjects carrying REAL pixels (JPEG /DCTDecode, Flate raw
    RGB/Gray) decode to the exact imgpx:// ref the generator hand-computes
    — across both serializer styles and under encryption."""
    import random

    from docling_ray.synth import _make_embedded_image

    rng = random.Random(1234)
    for trial in range(24):
        ref, px = _make_embedded_image(rng)
        page = {"page_no": 1, "width": 612.0, "height": 792.0,
                "cells": [], "tables": [],
                "images": [{"l": 72.0, "t": 72.0, "r": 300.0, "b": 200.0,
                            "media_ref": ref, "px": px}]}
        style = ["classic", "xrefstream"][trial % 2]
        enc = [None, "rc4", "aes", "aes256"][trial % 4]
        data = pages_to_pdf_bytes([page], style=style, encrypt=enc)
        got = parse_pdf_pages(data)[0]["images"][0]["media_ref"]
        assert got == ref, (trial, px["codec"], px["mode"])
        assert got.startswith("imgpx://")


def test_image_xobject_unsupported_payload_falls_back():
    """An undecodable image XObject (unsupported colorspace) degrades to
    the synthesized pdfimg:// provenance ref — never an exception."""
    pdf = pages_to_pdf_bytes([{
        "page_no": 1, "width": 612.0, "height": 792.0, "cells": [],
        "tables": [], "images": [{"l": 10.0, "t": 10.0, "r": 50.0,
                                  "b": 50.0, "media_ref": "x",
                                  "px": {"w": 2, "h": 2, "mode": "gray",
                                         "codec": "flate",
                                         "data": b"\x00\x01\x02\x03"}}]}])
    pdf = pdf.replace(b"/DeviceGray", b"/CalGray\x20\x20\x20")
    got = parse_pdf_pages(pdf)[0]["images"][0]["media_ref"]
    assert got.startswith("pdfimg://page1/")


def test_encrypted_roundtrip_all_modes_and_styles():
    import json

    pages = _simple_pages()
    outline = [(0, "Tïtle (Ünïcode)", 0)]
    base_cells = json.dumps(parse_pdf_pages(
        pages_to_pdf_bytes(pages, outline=outline)),
        sort_keys=True, default=str)
    from docling_ray.stages.pdf_bytes import PdfDocument

    base_outline = PdfDocument(
        pages_to_pdf_bytes(pages, outline=outline)).outline()
    for mode in ("rc4", "aes", "aes256"):
        for style in ("classic", "xrefstream"):
            data = pages_to_pdf_bytes(pages, outline=outline, style=style,
                                      encrypt=mode)
            assert b"/Encrypt" in data
            got = json.dumps(parse_pdf_pages(data),
                             sort_keys=True, default=str)
            assert got == base_cells, (mode, style)
            # outline titles are strings OUTSIDE content streams — they
            # exercise the string-decryption path incl. UTF-16 titles
            assert PdfDocument(data).outline() == base_outline, (mode,
                                                                 style)


def test_encrypted_plaintext_not_in_file():
    pages = _simple_pages()
    for mode in ("rc4", "aes", "aes256"):
        data = pages_to_pdf_bytes(pages, encrypt=mode,
                                  content_filter="ahx")
        # with the hex content filter the plaintext WOULD be visible
        # unencrypted; under encryption it must not be
        assert b"A Title Here" not in data
        assert "A Title Here".encode().hex().encode() not in data.lower()


def test_encrypted_wrong_password_is_detected():
    from docling_ray.stages.pdf_bytes import PdfDocument, PdfError

    data = pages_to_pdf_bytes(_simple_pages(), encrypt="rc4")
    i = data.find(b"/U <") + 5
    bad = data[:i] + (b"0" if data[i:i+1] != b"0" else b"1") + data[i+1:]
    with pytest.raises(PdfError, match="password"):
        PdfDocument(bad)


def test_encrypted_password_user_and_owner_paths():
    """Password-protected PDFs open when settings supply the password —
    via the user path AND (distinct password) the owner path — for every
    handler revision; without it they fail as `password required`."""
    import json

    from docling_ray import settings
    from docling_ray.stages.pdf_bytes import PdfDocument, PdfError

    pages = _simple_pages()
    base_cells = json.dumps(parse_pdf_pages(pages_to_pdf_bytes(pages)),
                            sort_keys=True, default=str)
    for mode in ("rc4", "aes", "aes256"):
        data = pages_to_pdf_bytes(pages, encrypt=mode,
                                  user_pw=b"s3cret", owner_pw=b"0wner")
        with pytest.raises(PdfError, match="password"):
            PdfDocument(data)
        with pytest.raises(PdfError, match="password"):
            PdfDocument(data, passwords=[b"wrong"])
        for pw in (b"s3cret", b"0wner"):  # user path, then owner path
            got = json.dumps(
                _cells_of(PdfDocument(data, passwords=[pw])),
                sort_keys=True, default=str)
            assert got == base_cells, (mode, pw)
        # the settings route (what corpus extraction uses)
        settings.configure("pdf", passwords="decoy,s3cret")
        try:
            got = json.dumps(parse_pdf_pages(data),
                             sort_keys=True, default=str)
            assert got == base_cells, mode
        finally:
            settings.reset()


def _cells_of(doc) -> list[dict]:
    from docling_ray.stages.pdf_bytes import _pages_from_doc

    return _pages_from_doc(doc)


def test_encrypted_corruption_is_total():
    # corrupting bytes all over an encrypted file must yield failure
    # spans, never exceptions (errors are data)
    data = bytearray(pages_to_pdf_bytes(_simple_pages(), encrypt="aes"))
    for pos in range(50, len(data), 97):
        mut = bytearray(data)
        mut[pos] ^= 0x55
        b64 = base64.b64encode(bytes(mut)).decode()
        spans, _pno, _score, err = extract_pdf_bytes_unit(b64)
        assert isinstance(spans, list)  # no exception escaped


def test_encrypted_docs_flow_through_corpus_generator():
    # build_pdf_bytes_doc emits encrypted variants (~18%); every one
    # must still round-trip span-exactly
    n_enc = 0
    for seed in range(40):
        rng = random.Random(9000 + seed)
        b64, exp, status, _outline, _links = build_pdf_bytes_doc(
            rng, VOCAB, f"e{seed}")
        raw = base64.b64decode(b64)
        enc = b"/Encrypt" in raw
        n_enc += enc
        spans, _pno, _score, err = extract_pdf_bytes_unit(b64)
        assert spans == exp, f"seed {seed} (encrypted={enc})"
    assert n_enc >= 3  # the encrypted slice actually exercised


# ----------------------------------------------------------------------
# AcroForm interactive fields
# ----------------------------------------------------------------------

def test_acroform_fields_walk_and_span_convention():
    from docling_ray.stages.pdf_bytes import PdfDocument

    form = [
        {"name": "Applicant", "ft": "Tx", "value": "Jane Doe"},
        {"name": "Subscribed", "ft": "Btn", "on": True},
        {"name": "Declined", "ft": "Btn", "on": False},
        {"name": "Color", "ft": "Ch", "value": "blue",
         "options": ["red", "blue"]},
        # hierarchy: kids inherit /FT from the parent, names join with .
        {"name": "Address", "ft": "Tx", "kids": [
            {"name": "City", "value": "Springfield"},
            {"name": "Zip", "value": "49007"},
        ]},
    ]
    data = pages_to_pdf_bytes(_simple_pages(), acroform=form)
    fields = PdfDocument(data).form_fields()
    assert fields == [
        {"key": "Applicant", "value": "Jane Doe", "widget": "input"},
        {"key": "Subscribed", "value": "true", "widget": "checkbox"},
        {"key": "Declined", "value": "false", "widget": "checkbox"},
        {"key": "Color", "value": "blue", "widget": "choice"},
        {"key": "Address.City", "value": "Springfield", "widget": "input"},
        {"key": "Address.Zip", "value": "49007", "widget": "input"},
    ]
    # span emission follows the HTML DOM-form convention
    spans, *_ = extract_pdf_bytes_unit(
        base64.b64encode(data).decode("ascii"))
    assert spans[-8:] == [
        ("text", "Applicant: Jane Doe", ""),
        ("checkbox_selected", "", ""),
        ("text", "Subscribed", ""),
        ("checkbox_unselected", "", ""),
        ("text", "Declined", ""),
        ("text", "Color: blue", ""),
        ("text", "Address.City: Springfield", ""),
        ("text", "Address.Zip: 49007", ""),
    ]


def test_acroform_fields_feed_kv_miner():
    from docling_ray.stages.kv_extract import mine_pairs

    data = pages_to_pdf_bytes(_simple_pages(), acroform=[
        {"name": "Case Number", "ft": "Tx", "value": "A-17"},
        {"name": "Expedite", "ft": "Btn", "on": True},
    ])
    spans, *_ = extract_pdf_bytes_unit(
        base64.b64encode(data).decode("ascii"))
    dicts = [{"kind": k, "text": t, "media_ref": r} for k, t, r in spans]
    pairs = mine_pairs(dicts)
    assert ("Case Number", "A-17", "text") in pairs
    assert ("Expedite", "true", "checkbox") in pairs


def test_acroform_under_encryption_and_xrefstream():
    from docling_ray.stages.pdf_bytes import PdfDocument

    form = [{"name": "Sécret Fïeld", "ft": "Tx", "value": "väl (ue)"}]
    for mode in (None, "rc4", "aes", "aes256"):
        for style in ("classic", "xrefstream"):
            data = pages_to_pdf_bytes(_simple_pages(), style=style,
                                      encrypt=mode, acroform=form)
            fields = PdfDocument(data).form_fields()
            assert fields == [{"key": "Sécret Fïeld", "value": "väl (ue)",
                               "widget": "input"}], (mode, style)


# ----------------------------------------------------------------------
# /Annots URI hyperlinks
# ----------------------------------------------------------------------

def test_link_annots_rect_to_cell_text():
    from docling_ray.stages.pdf_bytes import extract_pdf_links

    pages = _simple_pages()
    # rect over "body line one" under the PARSER's advance metric
    c = pages[0]["cells"][1]
    r_parser = c["l"] + 0.5 * c["font_size"] * len(c["text"])
    pages[0]["links"] = [
        {"l": c["l"] - 0.5, "t": c["t"] - 0.5, "r": r_parser + 0.5,
         "b": c["b"] + 0.5, "uri": "https://example.com/one"},
        # a rect over empty space anchors no text but still yields a link
        {"l": 500.0, "t": 700.0, "r": 540.0, "b": 710.0,
         "uri": "https://example.com/empty"},
    ]
    data = pages_to_pdf_bytes(pages)
    assert b"/Annots" in data
    got = extract_pdf_links(base64.b64encode(data).decode("ascii"))
    assert got == [("body line one", "https://example.com/one", "pdf"),
                   ("", "https://example.com/empty", "pdf")]
    # malformed input is total
    assert extract_pdf_links("@@@") == []


def test_link_annots_generator_roundtrip_and_encryption():
    n_linked = 0
    for seed in range(40):
        rng = random.Random(7100 + seed)
        b64, exp, _st, _ol, exp_links = build_pdf_bytes_doc(
            rng, VOCAB, f"L{seed}")
        from docling_ray.stages.pdf_bytes import extract_pdf_links

        assert extract_pdf_links(b64) == list(exp_links), f"seed {seed}"
        n_linked += bool(exp_links)
    assert n_linked >= 5  # the link slice actually exercised


def test_link_annots_under_encryption():
    from docling_ray.stages.pdf_bytes import extract_pdf_links

    pages = _simple_pages()
    c = pages[0]["cells"][0]
    r_parser = c["l"] + 0.5 * c["font_size"] * len(c["text"])
    pages[0]["links"] = [{"l": c["l"] - 0.5, "t": c["t"] - 0.5,
                          "r": r_parser + 0.5, "b": c["b"] + 0.5,
                          "uri": "https://example.com/(secret)"}]
    for mode in ("rc4", "aes", "aes256"):
        for style in ("classic", "xrefstream"):
            data = pages_to_pdf_bytes(pages, style=style, encrypt=mode)
            got = extract_pdf_links(base64.b64encode(data).decode())
            assert got == [("A Title Here",
                            "https://example.com/(secret)", "pdf")], \
                (mode, style)


# --- simple-font /Encoding (BaseEncoding + /Differences) -------------------

def test_glyph_name_resolver_paths():
    """One pin per resolver path: literal AGL table, single-char,
    algorithmic uniXXXX/uXXXXXX, accent construction, Greek names, and
    the unresolvable subset-name fallback."""
    from docling_ray.stages.pdf_bytes import _glyph_to_unicode as g

    assert g("quotedblleft") == "“"
    assert g("Euro") == "€"
    assert g("oe") == "œ"
    assert g("dagger") == "†"
    assert g("A") == "A" and g("seven") == "7"
    assert g("uni0394") == "Δ"
    assert g("uni00E90041") == "éA"  # multi-group uni name
    assert g("u1F600") == "\U0001f600"
    assert g("eacute") == "é" and g("Zcaron") == "Ž"
    assert g("alpha") == "α" and g("Omega") == "Ω"
    assert g("g12") is None and g("cid042") is None
    assert g("notaglyphname") is None


def test_winansi_encoding_roundtrip():
    pages = _simple_pages()
    pages[0]["cells"][0]["text"] = "café €100 ‰ œuvre"
    data = pages_to_pdf_bytes(pages, enc_font={"kind": "winansi"})
    got = parse_pdf_pages(data)[0]["cells"][0]["text"]
    assert got == pages[0]["cells"][0]["text"]


def test_differences_encoding_roundtrip():
    pages = _simple_pages()
    pages[0]["cells"][0]["text"] = "α body Δelta ž œ"
    enc = {"kind": "diff",
           "codes": {"α": 128, "ž": 129,
                     "Δ": 130, "œ": 131},
           "names": {"α": "alpha", "ž": "zcaron",
                     "Δ": "uni0394", "œ": "oe"}}
    data = pages_to_pdf_bytes(pages, enc_font=enc)
    got = parse_pdf_pages(data)[0]["cells"][0]["text"]
    assert got == pages[0]["cells"][0]["text"]


def test_differences_sequential_advance_and_unresolved_names():
    """A /Differences run advances codes for names it cannot resolve
    (subset gXX names keep the base char rather than dropping text)."""
    from docling_ray.stages.pdf_bytes import _simple_encoding_map

    class _Doc:
        def resolve(self, x):
            return x

    enc = {"Differences": [128.0, "alpha", "g99", "uni0394",
                           200.0, "Euro"]}
    mapping, code_len = _simple_encoding_map(_Doc(), enc)
    assert code_len == 1
    assert mapping[128] == "α"
    assert mapping[129] == chr(129)  # unresolved: base char kept
    assert mapping[130] == "Δ"
    assert mapping[200] == "€"
    assert mapping[65] == "A"  # untouched base


def test_simple_encoding_identity_returns_none():
    from docling_ray.stages.pdf_bytes import _simple_encoding_map

    class _Doc:
        def resolve(self, x):
            return x

    assert _simple_encoding_map(_Doc(), "Identity-H") is None
    assert _simple_encoding_map(_Doc(), {"Differences": []}) is None
    assert _simple_encoding_map(_Doc(), 42.0) is None


def test_unencodable_text_falls_back_to_utf16():
    """Text outside the simple encoding (the garbage-page shape) rides a
    UTF-16 hex string, which bypasses font decoding on both sides."""
    pages = _simple_pages()
    pages[0]["cells"][0]["text"] = "GLYPH<aa>�/G12"
    data = pages_to_pdf_bytes(pages, enc_font={"kind": "winansi"})
    got = parse_pdf_pages(data)[0]["cells"][0]["text"]
    assert got == pages[0]["cells"][0]["text"]


# --- Form XObjects (/Subtype /Form) ----------------------------------------

class _FakeDoc:
    def resolve(self, x):
        return x

    def stream_data(self, s):
        return s.raw


def test_form_xobject_matrix_composition():
    """Form /Matrix (translation+scale) composes under the outer cm."""
    from docling_ray.stages.pdf_bytes import Stream, interpret_content

    form = Stream(
        {"Subtype": "Form", "Matrix": [2.0, 0.0, 0.0, 2.0, 10.0, 20.0],
         "Resources": {"Font": {}}},
        b"BT /F1 10 Tf 12 TL 5 30 Td (hi) Tj ET")
    res = {"XObject": {"F": form}, "Font": {}}
    out = interpret_content(
        b"q 1 0 0 1 100 50 cm /F Do Q", height=792.0, page_no=1,
        resources=res, doc=_FakeDoc())
    assert len(out["cells"]) == 1
    c = out["cells"][0]
    assert c["text"] == "hi"
    assert c["l"] == 2.0 * 5 + (10 + 100)       # scale*x + (me + e)
    assert c["b"] == 792.0 - (2.0 * 30 + 70)    # y' = sy*y + (mf + f)
    assert c["font_size"] == 20.0


def test_form_xobject_cycle_terminates():
    """A form whose content invokes itself stops at the depth bound."""
    from docling_ray.stages.pdf_bytes import Stream, interpret_content

    res: dict = {"Font": {}}
    form = Stream({"Subtype": "Form"}, b"BT /F1 9 Tf 9 TL 1 2 Td "
                                       b"(x) Tj ET /F Do")
    res["XObject"] = {"F": form}
    # form has no /Resources → inherits the caller's, which contains it
    out = interpret_content(b"/F Do", height=100.0, page_no=1,
                            resources=res, doc=_FakeDoc())
    assert len(out["cells"]) == 8  # depth bound, one cell per level
    assert all(c["text"] == "x" for c in out["cells"])


def test_form_split_geometry_roundtrip():
    pages = _simple_pages()
    parsed = parse_pdf_pages(
        pages_to_pdf_bytes(pages, form_split=True))[0]
    for orig, got in zip(pages[0]["cells"], parsed["cells"]):
        assert got["text"] == orig["text"]
        assert got["l"] == orig["l"] and got["t"] == orig["t"]
        assert got["b"] == orig["b"]
        assert got["font_size"] == orig["font_size"]
    assert parsed["tables"] == pages[0]["tables"]


def test_inline_image_decodes_to_fingerprint():
    """BI..ID..EI inline images decode into real imgpx:// refs; the
    AHx fallback fires when the Flate payload embeds the EI pattern."""
    import random

    from docling_ray.stages.pdf_bytes import extract_pdf_bytes_unit
    from docling_ray.synth import VOCAB, build_pdf_bytes_doc

    rng = random.Random(41)
    n_inline = 0
    for i in range(150):
        b64, exp, _st, _o, _lk = build_pdf_bytes_doc(
            rng, VOCAB[:], f"pi-{i}")
        got = [tuple(s) for s in extract_pdf_bytes_unit(b64)[0]]
        assert got == exp, i
        n_inline += sum(1 for (_k, _t, r) in exp
                        if str(r).startswith("imgpx://"))
    assert n_inline >= 5


def test_inline_image_unsupported_stays_opaque():
    """An image-mask inline image (IM true) keeps the opaque-skip
    behavior: no picture emitted, no exception."""
    from docling_ray.stages.pdf_bytes import interpret_content

    content = (b"q 10 0 0 10 50 50 cm BI /W 8 /H 8 /IM true /BPC 1 "
               b"ID \x00\xff\x00\xff\x00\xff\x00\xff EI Q")
    out = interpret_content(content, height=200.0, page_no=1,
                            resources=None, doc=None)
    assert out["images"] == []


def test_macroman_base_encoding():
    """/MacRomanEncoding text decodes through the mac_roman map (bytes
    written here by hand — the writer never emits MacRoman, so this
    pins the decoder side alone)."""
    from docling_ray.stages.pdf_bytes import _simple_encoding_map

    class _Doc:
        def resolve(self, x):
            return x

    mapping, code_len = _simple_encoding_map(_Doc(), "MacRomanEncoding")
    assert code_len == 1
    # hand-picked MacRoman positions (public table)
    assert mapping[0x80] == "Ä"
    assert mapping[0x8E] == "é"
    assert mapping[0xA5] == "•"
    assert mapping[0xD0] == "–"
    assert mapping[0x41] == "A"  # ASCII identity


def test_pubsec_roundtrip_modes_and_styles():
    """Certificate-encrypted PDFs (/Filter /Adobe.PubSec) open with the
    recipient RSA key and parse identically to the clear document —
    AESV2 and AESV3 crypt filters, both serializer styles, settings
    route in both tuple and hex-string forms."""
    import json

    from docling_ray import settings
    from docling_ray.stages.pdf_bytes import PdfDocument, PdfError
    from docling_ray.synth import PUBSEC_RSA_D, PUBSEC_RSA_N

    pages = _simple_pages()
    outline = [(0, "Tïtle (Ünïcode)", 0)]
    base_cells = json.dumps(parse_pdf_pages(
        pages_to_pdf_bytes(pages, outline=outline)),
        sort_keys=True, default=str)
    base_outline = PdfDocument(
        pages_to_pdf_bytes(pages, outline=outline)).outline()
    for mode in ("pubsec", "pubsec256"):
        for style in ("classic", "xrefstream"):
            data = pages_to_pdf_bytes(pages, outline=outline, style=style,
                                      encrypt=mode)
            assert b"/Adobe.PubSec" in data and b"/Recipients" in data
            # no key configured → a clean PdfError (failure row upstream)
            with pytest.raises(PdfError, match="recipient key"):
                PdfDocument(data)
            settings.configure(
                "pdf", pubsec_keys=[(PUBSEC_RSA_N, PUBSEC_RSA_D)])
            try:
                got = json.dumps(parse_pdf_pages(data),
                                 sort_keys=True, default=str)
                assert got == base_cells, (mode, style)
                doc = PdfDocument(data)
                assert doc.outline() == base_outline, (mode, style)
            finally:
                settings.reset()
            # env-friendly string form, with a decoy key first
            settings.configure(
                "pdf", pubsec_keys=f"{PUBSEC_RSA_N - 2:x}:3,"
                f"{PUBSEC_RSA_N:x}:{PUBSEC_RSA_D:x}")
            try:
                got = json.dumps(parse_pdf_pages(data),
                                 sort_keys=True, default=str)
                assert got == base_cells, (mode, style)
            finally:
                settings.reset()


def test_pubsec_plaintext_not_in_file_and_total():
    from docling_ray.stages.pdf_bytes import extract_pdf_bytes_unit

    data = pages_to_pdf_bytes(_simple_pages(), encrypt="pubsec",
                              content_filter="ahx")
    assert b"A Title Here" not in data
    assert "A Title Here".encode().hex().encode() not in data.lower()
    # corruption anywhere yields failure spans, never an exception
    for pos in range(50, len(data), 211):
        mut = bytearray(data)
        mut[pos] ^= 0x55
        b64 = base64.b64encode(bytes(mut)).decode()
        spans, _pno, _score, err = extract_pdf_bytes_unit(b64)
        assert isinstance(spans, list)
