"""Zip-container routing tests: real .docx/.xlsx/.pptx/.odt/.ods/.odp
packages built in-test (independent of the extractors), sniffed from
content alone and extracted end to end — the container analogue of the
reference's member sniff (docling/datamodel/document.py:763-1108) and
package-walking office backends."""

import base64
import io
import zipfile

from docling_ray.stages.assemble import extract_unit
from docling_ray.stages.containers import (
    extract_docx,
    extract_pptx,
    extract_xlsx,
    sniff_zip_kind,
)
from docling_ray.stages.detect import sniff_kind
from docling_ray.stages.html_extract import grid_media_ref


def _zip_b64(members: dict[str, bytes], *, mimetype: bytes | None = None) -> str:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        if mimetype is not None:
            # ODF spec: mimetype first and STORED
            zf.writestr(zipfile.ZipInfo("mimetype"), mimetype,
                        zipfile.ZIP_STORED)
        for name, data in members.items():
            zf.writestr(name, data)
    return base64.b64encode(buf.getvalue()).decode("ascii")


_DOCX_XML = b"""<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>Doc Title</w:t></w:r></w:p>
  <w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Part One</w:t></w:r></w:p>
  <w:p><w:r><w:t>Body paragraph text.</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr><w:r><w:t>item one</w:t></w:r></w:p>
 </w:body>
</w:document>"""


def _docx_b64() -> str:
    return _zip_b64({
        "[Content_Types].xml": b"<Types/>",
        "_rels/.rels": b"<Relationships/>",
        "word/document.xml": _DOCX_XML,
    })


def test_docx_container_sniff_and_extract():
    b64 = _docx_b64()
    assert sniff_kind(b64) == "docx"
    spans = extract_docx(b64)
    assert spans == [
        ("title", "Doc Title", ""),
        ("section_header", "Part One", ""),
        ("text", "Body paragraph text.", ""),
        ("list_item", "item one", ""),
    ]
    # the sniffed kind routes through the unit dispatcher too
    got, _pno, _score, err = extract_unit("docx", b64, "")
    assert err is None and got == spans


_SHEET1 = b"""<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2"><v>10</v></c><c r="B2"><v>20</v></c></row>
 </sheetData>
</worksheet>"""

_SHEET2 = b"""<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>solo</t></is></c></row>
 </sheetData>
</worksheet>"""

_WORKBOOK = b"""<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="Second" sheetId="2" r:id="rId2"/>
  <sheet name="First" sheetId="1" r:id="rId1"/>
 </sheets>
</workbook>"""

_WORKBOOK_RELS = b"""<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SHARED = b"""<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
 <si><t>alpha</t></si><si><r><t>be</t></r><r><t>ta</t></r></si>
</sst>"""


def test_xlsx_container_sheet_order_and_shared_strings():
    b64 = _zip_b64({
        "xl/workbook.xml": _WORKBOOK,
        "xl/_rels/workbook.xml.rels": _WORKBOOK_RELS,
        "xl/worksheets/sheet1.xml": _SHEET1,
        "xl/worksheets/sheet2.xml": _SHEET2,
        "xl/sharedStrings.xml": _SHARED,
    })
    assert sniff_kind(b64) == "xlsx"
    spans = extract_xlsx(b64)
    # workbook order: "Second" (sheet2) before "First" (sheet1); shared
    # strings resolved (t="s" indices 0/1 -> alpha / beta)
    assert spans == [
        ("table", "", grid_media_ref([["solo"]])),
        ("table", "", grid_media_ref([["alpha", "beta"], ["10", "20"]])),
    ]


def test_xlsx_fallback_without_rels():
    b64 = _zip_b64({"xl/worksheets/sheet1.xml": _SHEET2})
    assert sniff_kind(b64) == "xlsx"
    assert extract_xlsx(b64) == [("table", "", grid_media_ref([["solo"]]))]


_SLIDE_TPL = """<?xml version="1.0"?>
<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
 xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
 <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
  <a:p><a:r><a:t>{title}</a:t></a:r></a:p></p:sp>
 <p:sp><p:nvSpPr><p:nvPr/></p:nvSpPr>
  <a:p><a:r><a:t>{body}</a:t></a:r></a:p></p:sp>
</p:sld>"""

_PRESENTATION = b"""<?xml version="1.0"?>
<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <p:sldIdLst><p:sldId id="257" r:id="rId2"/><p:sldId id="256" r:id="rId1"/></p:sldIdLst>
</p:presentation>"""

_PRES_RELS = b"""<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="s" Target="slides/slide1.xml"/>
 <Relationship Id="rId2" Type="s" Target="slides/slide2.xml"/>
</Relationships>"""


def test_pptx_container_slide_order():
    b64 = _zip_b64({
        "ppt/presentation.xml": _PRESENTATION,
        "ppt/_rels/presentation.xml.rels": _PRES_RELS,
        "ppt/slides/slide1.xml": _SLIDE_TPL.format(
            title="One", body="first body").encode(),
        "ppt/slides/slide2.xml": _SLIDE_TPL.format(
            title="Two", body="second body").encode(),
    })
    assert sniff_kind(b64) == "pptx"
    spans = extract_pptx(b64)
    # sldIdLst order: rId2 (slide2) first
    assert spans == [
        ("title", "Two", ""), ("text", "second body", ""),
        ("title", "One", ""), ("text", "first body", ""),
    ]


_ODT_CONTENT = b"""<?xml version="1.0"?>
<office:document-content
 xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
 xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
 <office:body><office:text>
  <text:h text:outline-level="1">Odt Title</text:h>
  <text:p>A paragraph.</text:p>
  <text:list><text:list-item><text:p>li</text:p></text:list-item></text:list>
 </office:text></office:body>
</office:document-content>"""


def test_odf_containers_route_by_mimetype():
    odt = _zip_b64({"content.xml": _ODT_CONTENT},
                   mimetype=b"application/vnd.oasis.opendocument.text")
    assert sniff_kind(odt) == "odt"
    got, _pno, _score, err = extract_unit("odt", odt, "")
    assert err is None
    assert got == [("title", "Odt Title", ""), ("text", "A paragraph.", ""),
                   ("list_item", "li", "")]

    ods_content = b"""<?xml version="1.0"?>
<office:document-content
 xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
 xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
 xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
 <office:body><office:spreadsheet>
  <table:table table:name="S1">
   <table:table-row><table:table-cell><text:p>x</text:p></table:table-cell>
    <table:table-cell><text:p>y</text:p></table:table-cell></table:table-row>
  </table:table>
 </office:spreadsheet></office:body>
</office:document-content>"""
    ods = _zip_b64({"content.xml": ods_content},
                   mimetype=b"application/vnd.oasis.opendocument.spreadsheet")
    assert sniff_kind(ods) == "ods"
    got, _, _, err = extract_unit("ods", ods, "")
    assert err is None
    assert got == [("section_header", "S1", ""),
                   ("table", "", grid_media_ref([["x", "y"]]))]


def test_epub_and_dclx_zip_sniff_still_win():
    epub = _zip_b64({"META-INF/container.xml": b"<container/>"},
                    mimetype=b"application/epub+zip")
    assert sniff_kind(epub) == "epub"
    dclx = _zip_b64({"document.dclg": b"<doclang/>"})
    assert sniff_kind(dclx) == "dclx"


def test_container_poison_is_data_not_exception():
    # truncated zip / missing parts surface as failure rows
    bad = base64.b64encode(b"PK\x03\x04 not a real zip").decode()
    got, _pno, _score, err = extract_unit("docx", bad, "")
    assert got == [] and err
    # zip without the expected inner part
    empty = _zip_b64({"something/else.txt": b"hi"})
    got, _, _, err = extract_unit("xlsx", empty, "")
    assert (got == [] and err is None) or err is not None
    assert sniff_zip_kind(base64.b64decode(empty)) is None
