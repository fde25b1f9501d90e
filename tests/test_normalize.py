"""Hand-written expectations for the character-level sanitation rules
(FIXTURES.md §3 case 10, §4 cases 4-5). These pin the functions shared
between the generator and the engine, so round-trip equality elsewhere
stays meaningful."""

from docling_ray.functions.normalize import (
    clean_unicode,
    collapse_whitespace,
    expand_ligatures,
    merge_hyphenated_lines,
    sanitize_cell_text,
    text_quality_score,
)


def test_clean_unicode_nbsp_quotes_dashes():
    assert clean_unicode("a b") == "a b"
    assert clean_unicode("“q” ‘s’") == "\"q\" 's'"
    assert clean_unicode("x–y—z‐w") == "x-y-z-w"
    assert clean_unicode("wait…") == "wait..."
    assert clean_unicode("co­operate") == "cooperate"  # soft hyphen
    assert clean_unicode("z​ip‌‍﻿") == "zip"  # zero-width
    assert clean_unicode("a b⁠c") == "a bc"


def test_collapse_whitespace():
    assert collapse_whitespace("  a \t b\n c  ") == "a b c"


def test_ligature_expansion():
    assert expand_ligatures("eﬃcient") == "efficient"
    assert expand_ligatures("ﬁ eld") == "field"  # spurious-space absorb
    assert expand_ligatures("ﬂoat") == "float"
    assert expand_ligatures("Ĳ is") == "IJ is"  # digraph keeps boundary
    assert expand_ligatures("a b") == "a b"  # PUA glyph discarded


def test_hyphen_merge():
    assert merge_hyphenated_lines(["exam-", "ple text"]) == "example text"
    # reference rule: merge whenever the last word before the hyphen and the
    # first word of the next line are both alphanumeric
    # (page_assemble_model.py:116-133)
    assert merge_hyphenated_lines(["end -", "dash"]) == "end dash"
    assert merge_hyphenated_lines(["twenty-", "(five)"]) == "twenty(five)"
    assert merge_hyphenated_lines(["a", "b", "c"]) == "a b c"
    assert merge_hyphenated_lines([]) == ""
    # no word on the next line: hyphen kept, NO separator (the reference's
    # failed-merge branch joins directly — page_assemble_model.py:119-130
    # only appends the space to lines that do NOT end in "-")
    assert merge_hyphenated_lines(["x-", "..."]) == "x-..."
    assert merge_hyphenated_lines(["foo_ -", "bar"]) == "foo_ -bar"


def test_sanitize_cell_text_full():
    assert sanitize_cell_text(["the ﬁ eld is transfor-", "mation ready"]) == (
        "the field is transformation ready"
    )
    assert sanitize_cell_text(["• item ’s"]) == "· item 's"


def test_text_quality_garbage():
    assert text_quality_score("normal readable sentence here") > 0.9
    assert text_quality_score("GLYPH<aa>GLYPH<bb>�/G12/G34") < 0.5
    assert text_quality_score("") == 0.0
