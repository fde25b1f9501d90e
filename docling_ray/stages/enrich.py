"""Enrichment stages over extraction output: code-language annotation and
picture classification.

Reference anchors: code/formula enrichment
(``docling/models/stages/code_formula/code_formula_vlm_model.py:37`` — the
language-detection part is pure logic, rebuilt in
``functions/code_language.py``; the VLM transcription is out of scope) and
the document picture classifier
(``document_picture_classifier.py:37`` — an NN classifier over 16 figure
classes; no imaging stack exists in this environment, so the classifier
here is a DETERMINISTIC stand-in: caption-keyword rules first, then a
feature-hash fallback over the stubbed decode, keeping the actor-pool
shape, label vocabulary and output schema real).

Both stages are vectorized ``map_batches`` kernels over OUTPUT_SCHEMA rows.
"""

from __future__ import annotations

import pyarrow as pa

from docling_ray.functions.code_language import detect_code_language

# the reference classifier's label vocabulary (DocumentFigureClassifier
# classes, document_picture_classifier.py predicted_classes)
PICTURE_CLASSES = (
    "bar_chart", "line_chart", "pie_chart", "scatter_chart", "flow_chart",
    "map", "logo", "screenshot", "signature", "stamp", "qr_code",
    "natural_image", "icon", "table_image", "remote_sensing", "other",
)

# caption keyword → class (checked in order; first hit wins)
_CAPTION_RULES: tuple[tuple[str, str], ...] = (
    ("bar chart", "bar_chart"),
    ("line chart", "line_chart"),
    ("pie chart", "pie_chart"),
    ("scatter", "scatter_chart"),
    ("flow chart", "flow_chart"),
    ("flowchart", "flow_chart"),
    ("diagram", "flow_chart"),
    ("map of", "map"),
    ("logo", "logo"),
    ("screenshot", "screenshot"),
    ("signature", "signature"),
    ("photograph", "natural_image"),
    ("photo", "natural_image"),
)


def classify_picture(media_ref: str, caption: str = "") -> str:
    """Deterministic picture class: caption keywords, else feature hash."""
    cap = (caption or "").lower()
    for kw, cls in _CAPTION_RULES:
        if kw in cap:
            return cls
    from docling_ray.functions.hashing import stable_hash64

    return PICTURE_CLASSES[stable_hash64("cls:" + (media_ref or ""))
                           % len(PICTURE_CLASSES)]


def _iter_pictures_with_captions(spans: list[dict]):
    """(picture span, following caption text) pairs — the caption is the
    caption span emitted immediately after the picture (reading order
    invariant established by the extractors)."""
    for i, s in enumerate(spans):
        if s["kind"] != "picture":
            continue
        cap = ""
        if i + 1 < len(spans) and spans[i + 1]["kind"] == "caption":
            cap = spans[i + 1]["text"]
        yield s, cap


def picture_classes_batch(batch: pa.Table) -> pa.Table:
    """OUTPUT_SCHEMA rows → (doc_id, offset, media_ref, predicted_class)."""
    doc_ids, offsets, refs, classes = [], [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for s, cap in _iter_pictures_with_captions(spans or []):
            doc_ids.append(did)
            offsets.append(s["offset"])
            refs.append(s["media_ref"])
            classes.append(classify_picture(s["media_ref"], cap))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "offset": pa.array(offsets, pa.int32()),
        "media_ref": pa.array(refs, pa.string()),
        "predicted_class": pa.array(classes, pa.string()),
    })


def code_languages_batch(batch: pa.Table) -> pa.Table:
    """OUTPUT_SCHEMA rows → (doc_id, offset, code_language) per code span.
    The fence hint, when the source format carried one, is stored in the
    span's media_ref as ``lang:<token>`` (extractors' convention)."""
    doc_ids, offsets, langs = [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for s in spans or []:
            if s["kind"] != "code":
                continue
            ref = s["media_ref"] or ""
            hint = ref[5:] if ref.startswith("lang:") else None
            doc_ids.append(did)
            offsets.append(s["offset"])
            langs.append(detect_code_language(s["text"], hint))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "offset": pa.array(offsets, pa.int32()),
        "code_language": pa.array(langs, pa.string()),
    })


# ---------------------------------------------------------------------------
# picture description + chart extraction — VLM stages in the reference
# (picture_description_vlm_model.py:24, chart_extraction/granite_vision.py);
# no VLM exists in this environment, so both are DETERMINISTIC stand-ins:
# template description from the predicted class + caption, and a
# hash-seeded data table for chart-classed pictures. The schemas, queries
# and batch plumbing are real; swap the kernel for a model call when one
# exists (same registry pattern as stages/ocr.py engines).
# ---------------------------------------------------------------------------

def describe_picture(media_ref: str, caption: str = "") -> str:
    cls = classify_picture(media_ref, caption)
    noun = cls.replace("_", " ")
    if caption:
        return f"A {noun} captioned: {caption}"
    return f"A {noun}"


def picture_descriptions_batch(batch: pa.Table) -> pa.Table:
    """OUTPUT_SCHEMA rows → (doc_id, offset, media_ref, description)."""
    doc_ids, offsets, refs, descs = [], [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for s, cap in _iter_pictures_with_captions(spans or []):
            doc_ids.append(did)
            offsets.append(s["offset"])
            refs.append(s["media_ref"])
            descs.append(describe_picture(s["media_ref"], cap))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "offset": pa.array(offsets, pa.int32()),
        "media_ref": pa.array(refs, pa.string()),
        "description": pa.array(descs, pa.string()),
    })


_CHART_CLASSES = {"bar_chart", "line_chart", "pie_chart", "scatter_chart"}


def extract_chart_table(media_ref: str, caption: str = "") -> tuple[str, str]:
    """(chart_type, serialized data grid) for chart-classed pictures —
    deterministic stand-in for the VLM's chart-to-table transcription.
    Returns ("", "") for non-chart pictures."""
    from docling_ray.functions.hashing import stable_hash64
    from docling_ray.functions.refs import grid_media_ref

    cls = classify_picture(media_ref, caption)
    if cls not in _CHART_CLASSES:
        return "", ""
    h = stable_hash64("chart:" + (media_ref or ""))
    n_rows = 2 + h % 4
    grid = [["series", "value"]]
    for i in range(n_rows):
        grid.append([f"s{i}", str((h >> (8 * (i % 4))) % 1000)])
    return cls, grid_media_ref(grid)


def chart_tables_batch(batch: pa.Table) -> pa.Table:
    """OUTPUT_SCHEMA rows → (doc_id, offset, media_ref, chart_type, data)
    for pictures classed as charts."""
    doc_ids, offsets, refs, types, datas = [], [], [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for s, cap in _iter_pictures_with_captions(spans or []):
            ctype, data = extract_chart_table(s["media_ref"], cap)
            if not ctype:
                continue
            doc_ids.append(did)
            offsets.append(s["offset"])
            refs.append(s["media_ref"])
            types.append(ctype)
            datas.append(data)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "offset": pa.array(offsets, pa.int32()),
        "media_ref": pa.array(refs, pa.string()),
        "chart_type": pa.array(types, pa.string()),
        "data": pa.array(datas, pa.string()),
    })
