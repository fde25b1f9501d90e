"""Enrichment tests: code-language detection (reference contract,
docling/utils/code_language.py:196 — hint first, conservative content
markers, unknown over wrong) and the deterministic picture classifier
(document_picture_classifier.py:37 label vocabulary)."""

from docling_ray.functions.code_language import (
    detect_code_language,
    normalize_code_hint,
)
from docling_ray.stages.enrich import (
    PICTURE_CLASSES,
    classify_picture,
    code_languages_batch,
    picture_classes_batch,
)


def test_hint_normalization_and_priority():
    assert normalize_code_hint("py") == "python"
    assert normalize_code_hint("language-ts") == "typescript"
    assert normalize_code_hint("golang") == "go"
    assert normalize_code_hint("C++") == "c++"
    assert normalize_code_hint("nope") == "unknown"
    # hint is trusted over content
    assert detect_code_language("console.log(1)", hint="py") == "python"


def test_content_markers():
    assert detect_code_language("def f(x):\n    return x") == "python"
    assert detect_code_language("console.log('hi')") == "javascript"
    assert detect_code_language("SELECT a FROM t WHERE a > 1;") == "sql"
    assert detect_code_language("package main\nfunc main() {}") == "go"
    assert detect_code_language("#!/bin/bash\necho hi") == "bash"
    assert detect_code_language("fn main() {\n    let mut x = 1;\n}") == "rust"
    assert detect_code_language(
        "#include <iostream>\nstd::cout << 1;") == "c++"
    assert detect_code_language(
        '#include <stdio.h>\nint main() { printf("x"); }') == "c"
    assert detect_code_language("<?php echo 1; ?>") == "php"
    assert detect_code_language('{"a": [1, 2]}') == "json"
    # conservative: ambiguous snippets stay unknown, never guessed
    assert detect_code_language("x = 3\ny = x * 4") == "unknown"
    assert detect_code_language("") == "unknown"


def test_generator_snippets_all_detected():
    """Every synth code snippet's hardcoded label is the independent
    ground truth — the detector must recover each one."""
    from docling_ray.synth import CODE_SNIPPETS

    for label, tmpl in CODE_SNIPPETS:
        code = tmpl.format(n=7, m=3)
        assert detect_code_language(code) == label, (label, code)


def test_picture_classifier_rules_and_determinism():
    assert classify_picture("img://d/1", "Figure 1: bar chart of rates") \
        == "bar_chart"
    assert classify_picture("img://d/2", "A flowchart of the pipeline") \
        == "flow_chart"
    assert classify_picture("img://d/3", "photo of a cat") == "natural_image"
    # no caption keyword → deterministic feature-hash fallback
    a = classify_picture("img://d/4", "")
    assert a in PICTURE_CLASSES
    assert classify_picture("img://d/4", "") == a


def test_batch_kernels_over_extraction_output():
    import pyarrow as pa

    batch = pa.table({
        "doc_id": pa.array(["d1"]),
        "spans": pa.array([[
            {"kind": "code", "text": "def f():\n    pass", "media_ref": "",
             "offset": 0},
            {"kind": "code", "text": "whatever", "media_ref": "lang:rb",
             "offset": 1},
            {"kind": "picture", "text": "", "media_ref": "img://d1/1",
             "offset": 2},
            {"kind": "caption", "text": "a pie chart of things",
             "media_ref": "", "offset": 3},
        ]]),
    })
    langs = code_languages_batch(batch).to_pylist()
    assert [r["code_language"] for r in langs] == ["python", "ruby"]
    pics = picture_classes_batch(batch).to_pylist()
    assert pics == [{"doc_id": "d1", "offset": 2, "media_ref": "img://d1/1",
                     "predicted_class": "pie_chart"}]


def test_picture_description_and_chart_stub():
    from docling_ray.stages.enrich import (
        describe_picture,
        extract_chart_table,
    )

    d = describe_picture("img://d/1", "Figure 2: bar chart of revenue")
    assert d == "A bar chart captioned: Figure 2: bar chart of revenue"
    assert describe_picture("img://d/1", "").startswith("A ")
    ctype, data = extract_chart_table("img://d/1",
                                      "Figure 2: bar chart of revenue")
    assert ctype == "bar_chart" and data.startswith("grid:")
    # non-chart picture → no chart table
    assert extract_chart_table("img://d/2", "photo of a cat") == ("", "")
    # determinism
    assert extract_chart_table("img://d/1", "bar chart") == \
        extract_chart_table("img://d/1", "bar chart")
