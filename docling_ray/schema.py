"""Arrow schema constants for the corpus and extraction output.

Input shape fixed by BASELINE.json.input_hint: a table of interleaved
text+media documents ``(doc_id: string, spans: array<struct<kind, text,
media_ref, offset>>)``.  Output rows carry the extracted reading-ordered
span sequence plus status/error columns — errors are data, never raised
(parity with the reference's ``ConversionStatus``/``ErrorItem`` model,
``docling/datamodel/document.py:394-594``).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("status", pa.string()),
        ("n_spans", pa.int32()),
        ("errors", pa.list_(pa.string())),
        ("byte_size", pa.int64()),
        ("parse_score", pa.float64()),
    ]
)

# Input-span kinds (raw interleaved side, FIXTURES.md §1)
KIND_HTML = "html"
KIND_TEXT = "text"
KIND_PDF_CELLS = "pdf_cells"
KIND_PDF = "pdf"  # base64 of a real PDF file (stages/pdf_bytes.py)
KIND_IMAGE = "image"  # base64 of a raster image (stages/image_codec.py)
KIND_MEDIA = "media"

# Output-span kinds — the DocItemLabel subset the extractor emits
# (reference docling-core DocItemLabel; observed in
# tests/data/html/groundtruth/*.itxt)
OUT_KINDS = (
    "title",
    "section_header",
    "text",
    "list_item",
    "caption",
    "code",
    "table",
    "picture",
    "page_header",
    "page_footer",
    "formula",
    "footnote",
    "checkbox_selected",
    "checkbox_unselected",
)

STATUS_SUCCESS = "success"
STATUS_PARTIAL = "partial_success"
STATUS_FAILURE = "failure"


def spans_to_arrow(spans: list[tuple[str, str, str]]) -> list[dict]:
    """Attach DFS offsets and convert (kind, text, media_ref) tuples to
    struct dicts ready for an Arrow list<struct> column."""
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(spans)
    ]
