"""Hand-written literal expectations for the markdown backend depth
added in round 5: pipe tables, setext headings, blockquotes, inline
links/images, embedded-HTML delegation (reference surface:
md_backend.py:98-759)."""

from docling_ray.stages.text_extract import (
    extract_md_links,
    extract_text,
)


def test_pipe_table_header_separator_data():
    md = "| A | B |\n|---|---|\n| 1 | 2 |\n| 3 | 4 |"
    assert extract_text(md) == [
        ("table", "",
         'grid:{"num_rows":3,"num_cols":2,'
         '"cells":[["A","B"],["1","2"],["3","4"]]}'),
    ]


def test_pipe_table_header_only_and_ragged_padding():
    # header + separator only -> single-row table (reference keeps n==0)
    assert extract_text("| H1 | H2 |\n|---|---|") == [
        ("table", "", 'grid:{"num_rows":1,"num_cols":2,'
                      '"cells":[["H1","H2"]]}'),
    ]
    # ragged data row padded to the widest row
    md = "| a | b | c |\n|---|---|---|\n| x |"
    assert extract_text(md) == [
        ("table", "", 'grid:{"num_rows":2,"num_cols":3,'
                      '"cells":[["a","b","c"],["x","",""]]}'),
    ]


def test_setext_headings_and_thematic_break():
    md = "Top Head\n========\n\nSub Head\n--------\n\npara one\n\n---\n\npara two"
    assert extract_text(md) == [
        ("title", "Top Head", ""),
        ("section_header", "Sub Head", ""),
        ("text", "para one", ""),
        ("text", "para two", ""),
    ]


def test_blockquote_strips_markers_and_breaks_paragraph():
    md = "lead para\n> quoted a\n> quoted b\n\ntail"
    assert extract_text(md) == [
        ("text", "lead para", ""),
        ("text", "quoted a quoted b", ""),
        ("text", "tail", ""),
    ]


def test_inline_link_flattened_and_collected():
    md = "see [the docs](https://d.test/x 'title') now"
    assert extract_text(md) == [("text", "see the docs now", "")]
    assert extract_md_links(md) == [("the docs", "https://d.test/x", "body")]


def test_links_in_headings_lists_and_code_opacity():
    md = ("# Top [a](u1)\n\n- item [b](u2)\n\n```\n[c](u3)\n```")
    assert extract_text(md) == [
        ("title", "Top a", ""),
        ("list_item", "item b", ""),
        ("code", "[c](u3)", ""),
    ]
    assert extract_md_links(md) == [("a", "u1", "body"), ("b", "u2", "body")]


def test_inline_image_picture_caption_alt_order():
    md = 'before ![alt words](img://d/1 "Cap text") after'
    assert extract_text(md) == [
        ("text", "before", ""),
        ("picture", "", "img://d/1"),
        ("caption", "Cap text", ""),
        ("text", "alt words", ""),
        ("text", "after", ""),
    ]


def test_inline_image_angle_dest_no_title():
    assert extract_text("![](<img://d/2>)") == [
        ("picture", "", "img://d/2"),
    ]


def test_embedded_html_block_delegation():
    md = "intro\n\n<table><tr><td>a</td><td>b</td></tr></table>\n\noutro"
    assert extract_text(md) == [
        ("text", "intro", ""),
        ("table", "", 'grid:{"num_rows":1,"num_cols":2,'
                      '"cells":[["a","b"]]}'),
        ("text", "outro", ""),
    ]
    assert extract_text("<p>frag text.</p>") == [("text", "frag text.", "")]


def test_html_block_at_eof_flushes():
    assert extract_text("<p>tail block</p>") == [("text", "tail block", "")]


def test_table_interrupted_by_nontable_line():
    md = "| a |\n|---|\n| b |\nplain tail"
    assert extract_text(md) == [
        ("table", "", 'grid:{"num_rows":2,"num_cols":1,'
                      '"cells":[["a"],["b"]]}'),
        ("text", "plain tail", ""),
    ]
