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
    assert grid[0] == ["concept", "period", "unit", "decimals",
                       "dimensions", "value"]
    assert ["Revenues", "2023-01-01 - 2023-12-31", "USD", "", "", "1000"] in grid
    assert ["NetIncomeLoss", "2023-01-01 - 2023-12-31", "USD", "", "", "100"] in grid


def test_xbrl_contexts_units_dimensions():
    """Instant periods, explicit dimensions, divide units, decimals, the
    DEI title triplet and escaped-HTML text blocks (reference
    xbrl_backend.py:265-380)."""
    raw = """<xbrl xmlns="http://www.xbrl.org/2003/instance"
                 xmlns:xbrldi="http://xbrl.org/2006/xbrldi"
                 xmlns:us-gaap="http://fasb.org/us-gaap/2023"
                 xmlns:dei="http://xbrl.sec.gov/dei/2023">
      <context id="I23"><entity><identifier scheme="s">X</identifier>
        <segment><xbrldi:explicitMember dimension="us-gaap:SegmentAxis">
          us-gaap:EuropeMember</xbrldi:explicitMember></segment></entity>
        <period><instant>2023-12-31</instant></period></context>
      <context id="FY23"><period><startDate>2023-01-01</startDate>
        <endDate>2023-12-31</endDate></period></context>
      <unit id="usd"><measure>iso4217:USD</measure></unit>
      <unit id="eps"><divide><unitNumerator><measure>iso4217:USD</measure>
        </unitNumerator><unitDenominator><measure>xbrli:shares</measure>
        </unitDenominator></divide></unit>
      <dei:DocumentType contextRef="FY23">10-K</dei:DocumentType>
      <dei:EntityRegistrantName contextRef="FY23">Acme Corp</dei:EntityRegistrantName>
      <dei:DocumentPeriodEndDate contextRef="FY23">2023-12-31</dei:DocumentPeriodEndDate>
      <us-gaap:Assets contextRef="I23" unitRef="usd" decimals="-3">500</us-gaap:Assets>
      <us-gaap:EarningsPerShareBasic contextRef="FY23" unitRef="eps">2.5</us-gaap:EarningsPerShareBasic>
      <us-gaap:DescriptionTextBlock contextRef="FY23">&lt;p&gt;We make widgets.&lt;/p&gt;</us-gaap:DescriptionTextBlock>
    </xbrl>"""
    spans = extract_xbrl(raw)
    assert spans[0] == ("title", "10-K Acme Corp 2023-12-31", "")
    assert ("text", "We make widgets.", "") in spans
    grid = _grid(spans[-1])
    assert ["Assets", "2023-12-31", "USD", "-3",
            "SegmentAxis: EuropeMember", "500"] in grid
    assert ["EarningsPerShareBasic", "2023-01-01 - 2023-12-31", "USD",
            "", "", "2.5"] in grid
    # DEI facts also land in the grid
    assert ["DocumentType", "2023-01-01 - 2023-12-31", "", "", "", "10-K"] in grid


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


def test_uspto_grant_v2_patdoc():
    """Grant v2.5 (2002-2004): PATDOC root, PDAT-wrapped text, SDOAB
    abstract, CL/CLM claims, H headings, CALS table, undefined DTD
    entities tolerated (uspto_backend.py:567-924)."""
    from docling_ray.stages.patent_xml import extract_uspto

    raw = """<!DOCTYPE PATDOC SYSTEM "ST32-US-Grant-025xml.dtd">
    <PATDOC>
      <SDOBI><B500><B540><STEXT><PDAT>Widget Device</PDAT></STEXT></B540>
      </B500></SDOBI>
      <SDOAB><BTEXT><PARA><PTEXT><PDAT>An abstract about widgets&excl;
      </PDAT></PTEXT></PARA></BTEXT></SDOAB>
      <SDODE>
        <H LVL="1"><STEXT><PDAT>FIELD OF THE INVENTION</PDAT></STEXT></H>
        <PARA><PTEXT><PDAT>Widgets are described.</PDAT></PTEXT></PARA>
        <PARA><PTEXT><PDAT>See results:</PDAT></PTEXT>
          <table><tgroup cols="2"><tbody>
            <row><entry>k</entry><entry>v</entry></row>
            <row><entry>a</entry><entry>1</entry></row>
          </tbody></tgroup></table>
        </PARA>
      </SDODE>
      <SDOCL>
        <H LVL="1"><STEXT><PDAT>What is claimed is:</PDAT></STEXT></H>
        <CL>
          <CLM><PARA><PTEXT><PDAT>1. A widget.</PDAT></PTEXT></PARA></CLM>
          <CLM><PARA><PTEXT><PDAT>2. The widget of claim 1.</PDAT></PTEXT></PARA></CLM>
        </CL>
      </SDOCL>
    </PATDOC>"""
    spans = extract_uspto(raw)
    kinds_texts = [(k, t) for k, t, _ in spans]
    assert kinds_texts[0] == ("title", "Widget Device")
    assert ("section_header", "ABSTRACT") in kinds_texts
    assert ("text", "An abstract about widgets!") in kinds_texts
    assert ("section_header", "FIELD OF THE INVENTION") in kinds_texts
    assert ("text", "Widgets are described.") in kinds_texts
    # claims present, the "What is claimed is:" SDOCL heading skipped
    assert ("section_header", "What is claimed is:") not in kinds_texts
    assert ("section_header", "CLAIMS") in kinds_texts
    assert ("text", "1. A widget.") in kinds_texts
    assert ("text", "2. The widget of claim 1.") in kinds_texts
    # CALS table became a grid span
    tables = [m for k, _, m in spans if k == "table"]
    assert len(tables) == 1 and '"cells":[["k","v"],["a","1"]]' in tables[0]


def test_uspto_app_v1():
    """Application v1.x (2001-2004): patent-application-publication root,
    subdoc sections, claim-text items (uspto_backend.py:1141-1494)."""
    from docling_ray.stages.patent_xml import extract_uspto

    raw = """<!DOCTYPE patent-application-publication SYSTEM "pap-v15-2001-01-31.dtd">
    <patent-application-publication>
      <subdoc-bibliographic-information>
        <title-of-invention>Gadget Method</title-of-invention>
      </subdoc-bibliographic-information>
      <subdoc-abstract>
        <paragraph>A method for gadgets.</paragraph>
      </subdoc-abstract>
      <subdoc-description>
        <heading lvl="1">BACKGROUND</heading>
        <paragraph>Gadgets exist.</paragraph>
        <paragraph>More detail <superscript>2</superscript> here.</paragraph>
      </subdoc-description>
      <subdoc-claims>
        <claim><claim-text>1. A method comprising
          <claim-text>providing a gadget.</claim-text>
        </claim-text></claim>
        <claim><claim-text>2. The method of claim 1.</claim-text></claim>
      </subdoc-claims>
    </patent-application-publication>"""
    spans = extract_uspto(raw)
    kinds_texts = [(k, t) for k, t, _ in spans]
    assert kinds_texts[0] == ("title", "Gadget Method")
    assert ("section_header", "ABSTRACT") in kinds_texts
    assert ("text", "A method for gadgets.") in kinds_texts
    assert ("section_header", "BACKGROUND") in kinds_texts
    assert ("text", "Gadgets exist.") in kinds_texts
    assert ("text", "More detail 2 here.") in kinds_texts
    assert ("section_header", "CLAIMS") in kinds_texts
    assert ("text", "1. A method comprising providing a gadget.") in kinds_texts
    assert ("text", "2. The method of claim 1.") in kinds_texts


def test_uspto_dialect_detection():
    from docling_ray.stages.detect import sniff_kind

    assert sniff_kind("<PATDOC><SDOBI/></PATDOC>") == "uspto"
    assert sniff_kind(
        "<patent-application-publication/>") == "uspto"


def test_cals_table_spans():
    """colspec-aware namest/nameend column spans + morerows row spans
    replicate text across the expanded grid (XmlTable parity subset,
    uspto_backend.py:1496-1816)."""
    import xml.etree.ElementTree as ET

    from docling_ray.stages.patent_xml import _cals_table_grid

    raw = """<table><tgroup cols="3">
      <colspec colname="c1"/><colspec colname="c2"/><colspec colname="c3"/>
      <tbody>
        <row><entry namest="c1" nameend="c2">wide</entry>
             <entry>x</entry></row>
        <row><entry morerows="1">tall</entry>
             <entry>a</entry><entry>b</entry></row>
        <row><entry>c</entry><entry>d</entry></row>
      </tbody>
    </tgroup></table>"""
    grid = _cals_table_grid(ET.fromstring(raw))
    assert grid == [["wide", "wide", "x"],
                    ["tall", "a", "b"],
                    ["tall", "c", "d"]]


def test_cals_table_plain_rows_still_work():
    import xml.etree.ElementTree as ET

    from docling_ray.stages.patent_xml import _cals_table_grid

    raw = """<table><tgroup cols="2"><tbody>
      <row><entry>k</entry><entry>v</entry></row>
      <row><entry>a</entry></row>
    </tbody></tgroup></table>"""
    grid = _cals_table_grid(ET.fromstring(raw))
    assert grid == [["k", "v"], ["a", ""]]
