"""HTML extractor conformance — hand-written fixtures per FIXTURES.md §3,
mirroring the reference's groundtruth style
(tests/data/html/groundtruth/example_01.html.itxt)."""

import json

from docling_ray.stages.html_extract import extract_html, HtmlExtractor


def kinds(spans):
    return [s[0] for s in spans]


def test_reference_example_01_shape():
    # the reference's own example_01.html source structure
    html = """<html><body>
    <h1>Introduction</h1>
    <p>This is the first paragraph of the introduction.</p>
    <h2>Background</h2>
    <p>Some background information here.</p>
    <img src="example_image_01.png" alt="Example image"/>
    <ul><li>First item in unordered list</li><li>Second item in unordered list</li></ul>
    <ol><li>First item in ordered list</li><li>Second item in ordered list</li></ol>
    <ol start="42"><li>First item in ordered list with start</li>
    <li>Second item in ordered list with start</li></ol>
    </body></html>"""
    spans = extract_html(html)
    assert spans == [
        ("title", "Introduction", ""),
        ("text", "This is the first paragraph of the introduction.", ""),
        ("section_header", "Background", ""),
        ("text", "Some background information here.", ""),
        ("picture", "", "example_image_01.png"),
        ("caption", "Example image", ""),
        ("list_item", "First item in unordered list", ""),
        ("list_item", "Second item in unordered list", ""),
        ("list_item", "First item in ordered list", ""),
        ("list_item", "Second item in ordered list", ""),
        ("list_item", "First item in ordered list with start", ""),
        ("list_item", "Second item in ordered list with start", ""),
    ]


def test_script_style_hidden_stripped():
    html = ("<body><h1>T</h1><script>bad()</script><style>p{}</style>"
            "<noscript>no</noscript><div hidden><p>gone</p></div>"
            "<div style='display: none'><p>gone2</p></div><p>kept</p></body>")
    spans = extract_html(html)
    assert spans == [("title", "T", ""), ("text", "kept", "")]


def test_furniture_before_first_heading():
    html = "<body><p>masthead junk</p><h1>Title</h1><p>body</p></body>"
    assert extract_html(html) == [("title", "Title", ""), ("text", "body", "")]
    # no headings at all → everything is body (documented choice)
    html2 = "<body><p>only paragraph</p></body>"
    assert extract_html(html2) == [("text", "only paragraph", "")]


def test_footer_and_nav_dropped():
    html = ("<body><h1>T</h1><nav><a href='/a'>a</a><a href='/b'>b</a></nav>"
            "<p>body</p><footer><p>copyright</p></footer></body>")
    assert extract_html(html) == [("title", "T", ""), ("text", "body", "")]


def test_link_farm_boilerplate_density():
    farm = "<div>" + "".join(f"<a href='/{i}'>link number {i}</a> " for i in range(8)) + "</div>"
    html = f"<body><h1>T</h1>{farm}<p>real content stays here</p></body>"
    assert extract_html(html) == [
        ("title", "T", ""),
        ("text", "real content stays here", ""),
    ]
    # low link density div is kept
    html2 = ("<body><h1>T</h1><div><p>lots of prose around a single "
             "<a href='/x'>link</a> means content not boilerplate</p></div></body>")
    assert kinds(extract_html(html2)) == ["title", "text"]


def test_heading_hierarchy_and_skipped_level():
    html = "<body><h1>A</h1><h3>B</h3><h2>C</h2><p>x</p></body>"
    assert extract_html(html) == [
        ("title", "A", ""),
        ("section_header", "B", ""),
        ("section_header", "C", ""),
        ("text", "x", ""),
    ]


def test_nested_list_and_dl():
    html = ("<body><h1>T</h1><ul><li>a<ul><li>a1</li><li>a2</li></ul></li>"
            "<li>b</li></ul><dl><dt>K</dt><dd>V</dd></dl></body>")
    assert extract_html(html) == [
        ("title", "T", ""),
        ("list_item", "a", ""),
        ("list_item", "a1", ""),
        ("list_item", "a2", ""),
        ("list_item", "b", ""),
        ("list_item", "K", ""),
        ("list_item", "V", ""),
    ]


def test_table_grid_rowspan_colspan():
    html = ("<body><h1>T</h1><table><caption>Cap</caption>"
            "<tr><th colspan='2'>H</th><th>C</th></tr>"
            "<tr><td rowspan='2'>R</td><td>1</td><td>2</td></tr>"
            "<tr><td>3</td><td>4</td></tr></table></body>")
    spans = extract_html(html)
    assert spans[1] == ("caption", "Cap", "")
    kind, text, ref = spans[2]
    assert kind == "table" and text == ""
    grid = json.loads(ref[len("grid:"):])
    assert grid["num_rows"] == 3 and grid["num_cols"] == 3
    assert grid["cells"] == [["H", "H", "C"], ["R", "1", "2"], ["R", "3", "4"]]


def test_figure_pre_br_checkbox():
    html = ("<body><h1>T</h1>"
            "<figure><img src='i.png'/><figcaption>Fig cap</figcaption></figure>"
            "<pre>line1\n  line2</pre>"
            "<p>a<br>b</p>"
            "<input type='checkbox' checked/><input type='checkbox'/></body>")
    assert extract_html(html) == [
        ("title", "T", ""),
        ("picture", "", "i.png"),
        ("caption", "Fig cap", ""),
        ("code", "line1\n  line2", ""),
        ("text", "a", ""),
        ("text", "b", ""),
        ("checkbox_selected", "", ""),
        ("checkbox_unselected", "", ""),
    ]


def test_inline_formatting_flow():
    html = ("<body><h1>T</h1><p>Mixed <b>bold</b> and <i>italic</i> with "
            "<a href='/x'>a link</a> inline.</p></body>")
    assert extract_html(html)[1] == (
        "text", "Mixed bold and italic with a link inline.", "")


def test_unicode_normalization_in_flow():
    html = "<body><h1>T</h1><p>“q” — a b co­op z​ip…</p></body>"
    assert extract_html(html)[1] == ("text", '"q" - a b coop zip...', "")


def test_malformed_html_no_crash():
    spans = extract_html("<p>ok<table><tr><td>x")
    assert ("text", "ok", "") in spans


def test_no_furniture_inference_option():
    html = "<body><p>lead</p><h1>T</h1></body>"
    ex = HtmlExtractor(infer_furniture=False)
    assert ex.extract(html) == [("text", "lead", ""), ("title", "T", "")]


def test_hyperlink_annotations_regions():
    from docling_ray.stages.html_extract import extract_links

    html = (
        "<html><body>"
        '<nav><a href="/home">home</a><a href="/about">about</a>'
        '<a href="/faq">faq</a></nav>'
        '<p>intro furniture with <a href="/pre">a pre-heading link</a></p>'
        "<h1>Title</h1>"
        '<p>Body with <a href="https://x.test/page">an inline link</a>.</p>'
        '<footer><a href="/imprint">imprint</a></footer>'
        "</body></html>"
    )
    links = extract_links(html)
    assert links == [
        ("home", "/home", "boilerplate"),
        ("about", "/about", "boilerplate"),
        ("faq", "/faq", "boilerplate"),
        ("a pre-heading link", "/pre", "furniture"),
        ("an inline link", "https://x.test/page", "body"),
        ("imprint", "/imprint", "furniture"),
    ]


def test_hyperlink_generator_roundtrip():
    import random

    from docling_ray.stages.html_extract import extract_links
    from docling_ray.synth import VOCAB, build_html_doc

    for seed in range(40):
        rng = random.Random(seed)
        html, _exp, links, fmts, markers, fields = build_html_doc(
            rng, VOCAB, f"d{seed}")
        assert extract_links(html) == links
        from docling_ray.stages.html_extract import extract_formatting

        assert extract_formatting(html) == fmts
        from docling_ray.stages.html_extract import extract_list_markers

        assert extract_list_markers(html) == markers
        from docling_ray.stages.html_extract import extract_form_fields

        assert extract_form_fields(html) == fields


def test_ordered_list_markers_honor_start():
    from docling_ray.stages.html_extract import extract_list_markers

    html = (
        "<html><body>"
        "<ul><li>no marker</li></ul>"
        '<ol start="42"><li>first</li><li>second</li></ol>'
        "<ol><li>one</li><li>two<ol start=\"7\"><li>seven</li></ol></li></ol>"
        "</body></html>"
    )
    got = extract_list_markers(html)
    assert got == [("first", "42."), ("second", "43."),
                   ("one", "1."), ("two", "2."), ("seven", "7.")]
