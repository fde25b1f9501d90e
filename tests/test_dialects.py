"""Dialect-debt tests: USPTO APS, ODS/ODP flat XML, EPUB container,
METS tar.gz with OCR text — the reference's remaining format coverage
(uspto_backend.py:926, opendocument_backend.py:1392, epub_backend.py:336,
mets_gbs_backend.py:203)."""

import base64
import io
import json
import tarfile
import zipfile

from docling_ray.stages.detect import sniff_kind
from docling_ray.stages.formats_extra import (
    extract_epub,
    extract_odp_xml,
    extract_ods_xml,
)
from docling_ray.stages.patent_xml import extract_mets_any, extract_uspto

APS = """PATN
WKU  039305848
TTL  Widget with improved flange
     coupling assembly
ABST
PAL  A widget having a flange
     that couples to a base.
PAL  The flange is serrated.
BSUM
PAC  BACKGROUND OF THE INVENTION
PAR  Widgets have long required flanges.
PAR  Prior art flanges were smooth.
CLMS
NUM  1.
PAR  A widget comprising a flange.
NUM  2.
PAR  The widget of claim 1 wherein
     the flange is serrated.
"""


def test_uspto_aps():
    spans = extract_uspto(APS)
    assert spans[0] == ("title",
                        "Widget with improved flange coupling assembly", "")
    assert ("section_header", "ABSTRACT", "") in spans
    i = spans.index(("section_header", "ABSTRACT", ""))
    assert spans[i + 1] == (
        "text", "A widget having a flange that couples to a base. "
                "The flange is serrated.", "")
    assert ("section_header", "BACKGROUND OF THE INVENTION", "") in spans
    assert ("text", "Widgets have long required flanges.", "") in spans
    # NUM opens a claim; the number itself is not part of the claim text
    # (reference Field.NUMBER adds an empty item, uspto_backend.py:1051-1057)
    j = spans.index(("section_header", "CLAIMS", ""))
    assert spans[j + 1] == ("text", "A widget comprising a flange.", "")
    assert spans[j + 2] == (
        "text", "The widget of claim 1 wherein the flange is serrated.", "")
    assert sniff_kind(APS) == "uspto"


ODS = """<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
 <office:body><office:spreadsheet>
  <table:table table:name="Revenue">
   <table:table-row>
    <table:table-cell><text:p>Region</text:p></table:table-cell>
    <table:table-cell table:number-columns-repeated="2"><text:p>Q1</text:p></table:table-cell>
   </table:table-row>
   <table:table-row>
    <table:table-cell><text:p>EMEA</text:p></table:table-cell>
    <table:table-cell><text:p>10</text:p></table:table-cell>
    <table:table-cell><text:p>20</text:p></table:table-cell>
   </table:table-row>
   <table:table-row>
    <table:table-cell table:number-columns-repeated="3"><text:p></text:p></table:table-cell>
   </table:table-row>
  </table:table>
 </office:spreadsheet></office:body>
</office:document-content>"""


def test_ods_sheet_grid_trimmed():
    spans = extract_ods_xml(ODS)
    assert spans[0] == ("section_header", "Revenue", "")
    grid = json.loads(spans[1][2][len("grid:"):])
    assert grid["cells"] == [["Region", "Q1", "Q1"], ["EMEA", "10", "20"]]
    assert sniff_kind(ODS) == "ods_xml"


ODP = """<office:document-content
  xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
  xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:presentation:1.0"
  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  xmlns:xlink="http://www.w3.org/1999/xlink">
 <office:body><office:presentation>
  <draw:page draw:name="page1">
   <draw:frame presentation:class="title"><draw:text-box>
     <text:p>Quarterly Review</text:p></draw:text-box></draw:frame>
   <draw:frame><draw:text-box>
     <text:list><text:list-item><text:p>Revenue up</text:p></text:list-item>
     <text:list-item><text:p>Costs down</text:p></text:list-item></text:list>
   </draw:text-box></draw:frame>
   <draw:frame><draw:image xlink:href="Pictures/chart.png"/></draw:frame>
  </draw:page>
 </office:presentation></office:body>
</office:document-content>"""


def test_odp_slides():
    spans = extract_odp_xml(ODP)
    assert spans[0] == ("section_header", "Quarterly Review", "")
    assert ("list_item", "Revenue up", "") in spans
    assert ("list_item", "Costs down", "") in spans
    assert ("picture", "", "Pictures/chart.png") in spans
    assert sniff_kind(ODP) == "odp_xml"


def _make_epub() -> str:
    xhtml1 = ("<?xml version='1.0'?><html xmlns='http://www.w3.org/1999/"
              "xhtml'><body><h1>Chapter One</h1><p>First chapter text."
              "</p></body></html>")
    xhtml2 = ("<?xml version='1.0'?><html xmlns='http://www.w3.org/1999/"
              "xhtml'><body><p>Second chapter text.</p></body></html>")
    opf = """<package xmlns="http://www.idpf.org/2007/opf">
      <manifest>
        <item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
        <item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
      </manifest>
      <spine><itemref idref="c1"/><itemref idref="c2"/></spine>
    </package>"""
    container = """<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
      <rootfiles><rootfile full-path="OEBPS/content.opf"
        media-type="application/oebps-package+xml"/></rootfiles>
    </container>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip",
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        zf.writestr("OEBPS/ch1.xhtml", xhtml1)
        zf.writestr("OEBPS/ch2.xhtml", xhtml2)
    return base64.b64encode(buf.getvalue()).decode()


def test_epub_container_spine_order():
    b64 = _make_epub()
    spans = extract_epub(b64)
    texts = [s[1] for s in spans]
    # spine order (c1 before c2) wins over manifest order
    assert texts.index("First chapter text.") < texts.index(
        "Second chapter text.")
    assert any(s[0] in ("title", "section_header")
               and s[1] == "Chapter One" for s in spans)
    assert sniff_kind(b64) == "epub"


def _make_mets_tgz() -> str:
    mets = """<mets xmlns="http://www.loc.gov/METS/"
      xmlns:xlink="http://www.w3.org/1999/xlink">
      <fileSec>
        <fileGrp USE="OCR">
          <file ID="OCR1"><FLocat xlink:href="0001.txt"/></file>
          <file ID="OCR2"><FLocat xlink:href="0002.html"/></file>
        </fileGrp>
        <fileGrp USE="IMAGE">
          <file ID="IMG1"><FLocat xlink:href="0001.jp2"/></file>
        </fileGrp>
      </fileSec>
      <structMap>
        <div TYPE="book">
          <div TYPE="page" ORDER="2" LABEL="Page ii">
            <fptr FILEID="OCR2"/></div>
          <div TYPE="page" ORDER="1" LABEL="Page i">
            <fptr FILEID="IMG1"/><fptr FILEID="OCR1"/></div>
        </div>
      </structMap>
    </mets>"""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name, content in [
            ("book/book.mets.xml", mets.encode()),
            ("book/0001.txt", b"ocr text of page one"),
            ("book/0002.html", b"<html><body><span class='ocrx_word'>page"
                               b"</span> <span>two</span></body></html>"),
            ("book/0001.jp2", b"\x00\x00"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tar.addfile(info, io.BytesIO(content))
    return base64.b64encode(buf.getvalue()).decode()


def test_mets_container_pages_in_order_with_ocr():
    b64 = _make_mets_tgz()
    spans = extract_mets_any(b64)
    assert spans[0] == ("page_header", "Page i", "")
    assert ("picture", "", "0001.jp2") in spans
    i1 = spans.index(("text", "ocr text of page one", ""))
    i2 = spans.index(("text", "page two", ""))
    assert i1 < i2  # ORDER attribute governs, not manifest order
    assert sniff_kind(b64) == "mets_gbs"


def test_container_poison_is_data():
    from docling_ray.stages.assemble import extract_unit

    for kind, payload in [("epub", "@@bad@@"), ("mets_gbs", "@@bad@@"),
                          ("epub", base64.b64encode(b"PK\x03\x04junk").decode()),
                          ("uspto", "PATN\nonly header")]:
        spans, _, _, err = extract_unit(kind, payload, "")
        assert isinstance(spans, list)  # never raises


def test_doclang_reader():
    from docling_ray.stages.formats_extra import extract_doclang

    raw = """<doclang>
      <title>Doc Title</title>
      <section_header>Part One</section_header>
      <paragraph>Some body text.</paragraph>
      <list><list_item>alpha</list_item><list_item>beta</list_item></list>
      <table><row><cell>a</cell><cell>b</cell></row>
             <row><cell>1</cell><cell>2</cell></row></table>
      <picture src="img://d/1"><caption>A figure</caption></picture>
      <code>x = 1</code>
    </doclang>"""
    spans = extract_doclang(raw)
    kinds = [s[0] for s in spans]
    assert kinds == ["title", "section_header", "text", "list_item",
                     "list_item", "table", "picture", "caption", "code"]
    import json

    grid = json.loads(spans[5][2][len("grid:"):])
    assert grid["cells"] == [["a", "b"], ["1", "2"]]
    from docling_ray.stages.detect import sniff_kind

    assert sniff_kind(raw) == "doclang"
    assert sniff_kind(raw, filename="x.dclg") == "doclang"
    assert sniff_kind("", filename="y.dclx") == "dclx"
