"""DOCX/XLSX XML and JATS backend tests."""

import json

from docling_ray.stages.jats import extract_jats
from docling_ray.stages.office_xml import extract_docx_xml, extract_xlsx_xml

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def _grid(span):
    return json.loads(span[2][len("grid:"):])["cells"]


def test_docx_styles_lists_text():
    raw = f"""<w:document {_W}><w:body>
      <w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>Doc Title</w:t></w:r></w:p>
      <w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Sect</w:t></w:r></w:p>
      <w:p><w:r><w:t>Plain </w:t></w:r><w:r><w:t>merged runs.</w:t></w:r></w:p>
      <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr><w:r><w:t>item a</w:t></w:r></w:p>
      <w:p/>
    </w:body></w:document>"""
    assert extract_docx_xml(raw) == [
        ("title", "Doc Title", ""),
        ("section_header", "Sect", ""),
        ("text", "Plain merged runs.", ""),
        ("list_item", "item a", ""),
    ]


def test_docx_table_gridspan_vmerge():
    raw = f"""<w:document {_W}><w:body><w:tbl>
      <w:tr>
        <w:tc><w:tcPr><w:gridSpan w:val="2"/></w:tcPr><w:p><w:r><w:t>H</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>C</w:t></w:r></w:p></w:tc>
      </w:tr>
      <w:tr>
        <w:tc><w:tcPr><w:vMerge w:val="restart"/></w:tcPr><w:p><w:r><w:t>R</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>1</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>2</w:t></w:r></w:p></w:tc>
      </w:tr>
      <w:tr>
        <w:tc><w:tcPr><w:vMerge/></w:tcPr><w:p/></w:tc>
        <w:tc><w:p><w:r><w:t>3</w:t></w:r></w:p></w:tc>
        <w:tc><w:p><w:r><w:t>4</w:t></w:r></w:p></w:tc>
      </w:tr>
    </w:tbl></w:body></w:document>"""
    spans = extract_docx_xml(raw)
    assert spans[0][0] == "table"
    assert _grid(spans[0]) == [["H", "H", "C"], ["R", "1", "2"], ["R", "3", "4"]]


def test_xlsx_sheet_grid():
    s = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    raw = f"""<worksheet {s}><sheetData>
      <row r="2"><c r="B2" t="inlineStr"><is><t>Name</t></is></c>
                 <c r="C2" t="inlineStr"><is><t>Qty</t></is></c></row>
      <row r="3"><c r="B3" t="inlineStr"><is><t>apples</t></is></c>
                 <c r="C3"><v>12</v></c></row>
    </sheetData></worksheet>"""
    spans = extract_xlsx_xml(raw)
    assert len(spans) == 1
    assert _grid(spans[0]) == [["Name", "Qty"], ["apples", "12"]]


def test_jats_article():
    raw = """<article>
      <front><article-meta>
        <title-group><article-title>A Study of Things</article-title></title-group>
        <abstract><p>We study things.</p></abstract>
      </article-meta></front>
      <body>
        <sec><title>Methods</title><p>We did stuff.</p>
          <sec><title>Data</title><p>Numbers.</p></sec>
          <fig><caption><p>Fig one</p></caption><graphic xlink:href="f1.png"
            xmlns:xlink="http://www.w3.org/1999/xlink"/></fig>
          <table-wrap><caption><p>Tab one</p></caption>
            <table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>
          </table-wrap>
        </sec>
      </body>
      <back><ref-list><ref><mixed-citation>Smith 2020</mixed-citation></ref></ref-list></back>
    </article>"""
    spans = extract_jats(raw)
    assert spans[0] == ("title", "A Study of Things", "")
    assert ("section_header", "Abstract", "") in spans
    assert ("text", "We study things.", "") in spans
    assert ("section_header", "Methods", "") in spans
    assert ("section_header", "Data", "") in spans
    assert ("picture", "", "f1.png") in spans
    assert ("caption", "Fig one", "") in spans
    table = [s for s in spans if s[0] == "table"][0]
    assert _grid(table) == [["a", "b"], ["1", "2"]]
    assert spans[-2:] == [("section_header", "References", ""),
                          ("list_item", "Smith 2020", "")]


def test_through_document_kernel():
    from docling_ray.stages.assemble import extract_document

    out = extract_document([
        {"kind": "jats", "text": "<article><front><article-meta><title-group>"
         "<article-title>T</article-title></title-group></article-meta></front>"
         "</article>", "media_ref": "", "offset": 0},
        {"kind": "docx_xml", "text": "<bad xml", "media_ref": "", "offset": 1},
    ])
    assert out["status"] == "partial_success"
    assert out["spans"][0]["kind"] == "title" and out["errors"]
