"""USPTO / XBRL / METS backend tests."""

import json

from docling_ray.stages.patent_xml import extract_mets, extract_uspto, extract_xbrl


def _grid(span):
    return json.loads(span[2][len("grid:"):])["cells"]


def test_uspto_grant():
    raw = """<us-patent-grant>
      <us-bibliographic-data-grant>
        <invention-title>Widget Improvement</invention-title>
        <abstract><p>A better widget.</p></abstract>
      </us-bibliographic-data-grant>
      <description>
        <heading>BACKGROUND</heading>
        <p>Widgets exist.</p>
        <p>They break.</p>
      </description>
      <claims>
        <claim><claim-text>1. A widget comprising a thing.</claim-text></claim>
        <claim><claim-text>2. The widget of claim 1.</claim-text></claim>
      </claims>
    </us-patent-grant>"""
    spans = extract_uspto(raw)
    assert spans[0] == ("title", "Widget Improvement", "")
    assert ("section_header", "Abstract", "") in spans
    assert ("text", "A better widget.", "") in spans
    assert ("section_header", "BACKGROUND", "") in spans
    assert ("section_header", "Claims", "") in spans
    assert ("list_item", "1. A widget comprising a thing.", "") in spans


def test_xbrl_facts():
    raw = """<xbrl xmlns="http://www.xbrl.org/2003/instance"
                 xmlns:us-gaap="http://fasb.org/us-gaap/2023">
      <context id="FY23"><period><startDate>2023-01-01</startDate>
        <endDate>2023-12-31</endDate></period></context>
      <unit id="usd"><measure>iso4217:USD</measure></unit>
      <us-gaap:Revenues contextRef="FY23" unitRef="usd">1000</us-gaap:Revenues>
      <us-gaap:NetIncomeLoss contextRef="FY23" unitRef="usd">100</us-gaap:NetIncomeLoss>
    </xbrl>"""
    spans = extract_xbrl(raw)
    assert spans[0] == ("section_header", "Facts", "")
    grid = _grid(spans[1])
    assert grid[0] == ["concept", "period", "unit", "value"]
    assert ["Revenues", "2023-01-01/2023-12-31", "usd", "1000"] in grid
    assert ["NetIncomeLoss", "2023-01-01/2023-12-31", "usd", "100"] in grid


def test_mets_pages_ordered():
    raw = """<mets xmlns="http://www.loc.gov/METS/"
                 xmlns:xlink="http://www.w3.org/1999/xlink">
      <fileSec><fileGrp>
        <file ID="IMG2"><FLocat xlink:href="p2.jp2"/></file>
        <file ID="IMG1"><FLocat xlink:href="p1.jp2"/></file>
      </fileGrp></fileSec>
      <structMap><div TYPE="volume">
        <div TYPE="page" ORDER="2" LABEL="Page 2"><fptr FILEID="IMG2"/></div>
        <div TYPE="page" ORDER="1"><fptr FILEID="IMG1"/></div>
      </div></structMap>
    </mets>"""
    spans = extract_mets(raw)
    assert spans == [
        ("page_header", "Page 1", ""),
        ("picture", "", "p1.jp2"),
        ("page_header", "Page 2", ""),
        ("picture", "", "p2.jp2"),
    ]


def test_through_kernel():
    from docling_ray.stages.assemble import extract_document

    out = extract_document([
        {"kind": "uspto", "text": "<g><us-bibliographic-data-grant>"
         "<invention-title>X</invention-title></us-bibliographic-data-grant></g>",
         "media_ref": "", "offset": 0},
        {"kind": "xbrl", "text": "<not closed", "media_ref": "", "offset": 1},
    ])
    assert out["status"] == "partial_success"
    assert out["spans"][0] == {"kind": "title", "text": "X", "media_ref": "",
                               "offset": 0}
