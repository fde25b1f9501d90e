"""Per-document extraction + assembly kernel.

The single place where a document's interleaved input spans become its
reading-ordered output span sequence (the DFS flatten of the reference's
DoclingDocument, SURVEY.md §1.2). Used in two physical plans:

  * **fast path** — the whole document is one row; this kernel runs inside a
    stateless ``map_batches`` task (no shuffle at all — the analogue of the
    reference's per-document ``DocumentConverter.convert``).
  * **page-parallel path** — giant documents are exploded to unit rows, each
    unit extracted independently, then ``groupby(doc_id).map_groups`` calls
    :func:`assemble_units` to reassemble (the reference's page-order gather,
    ``standard_pdf_pipeline.py:1038-1050``).

Ordering invariant (FIXTURES.md §4 case 8): non-PDF units keep input-span
``offset`` order; PDF page units of a document are ordered by ``page_no``
(anchored at the document's first pdf span offset) — never by block arrival
order, so output is deterministic under any task schedule.

Error model: extraction failures become per-unit error strings; a document
degrades to ``partial_success`` (some units/pages lost) or ``failure`` (all
units lost) — errors are data, never exceptions that kill a block
(ConversionStatus parity, ``docling/datamodel/base_models.py:85-91``).
"""

from __future__ import annotations

from docling_ray import schema as S
from docling_ray.stages.html_extract import extract_html
from docling_ray.stages.pdf_layout import extract_pdf_unit
from docling_ray.stages.text_extract import extract_media, extract_text

Span = tuple[str, str, str]


def extract_unit(kind: str, text: str, media_ref: str) -> tuple[list[Span], int, float, str | None]:
    """Extract one input span (unit). Returns (spans, page_no, score, error);
    page_no is -1 for non-PDF units."""
    try:
        if kind in ("", "auto"):
            # unlabeled corpora: content-sniff the kind (the reference's
            # _guess_format entry condition, document.py:763); gated by
            # the detect.auto_sniff setting
            from docling_ray.settings import options_for

            if options_for("detect").get("auto_sniff", True):
                from docling_ray.stages.detect import sniff_kind

                kind = sniff_kind(text, media_ref)
        if kind == S.KIND_HTML:
            return extract_html(text), -1, 1.0, None
        if kind == S.KIND_TEXT:
            return extract_text(text), -1, 1.0, None
        if kind == S.KIND_MEDIA:
            return extract_media(text, media_ref), -1, 1.0, None
        if kind == S.KIND_PDF_CELLS:
            return extract_pdf_unit(text)
        if kind == S.KIND_PDF:
            from docling_ray.stages.pdf_bytes import extract_pdf_bytes_unit

            return extract_pdf_bytes_unit(text)
        if kind == S.KIND_IMAGE:
            from docling_ray.stages.image_codec import extract_image_unit

            return extract_image_unit(text)
        if kind == "csv":
            from docling_ray.stages.csv_extract import extract_csv

            return extract_csv(text), -1, 1.0, None
        from docling_ray.stages.formats import FORMAT_EXTRACTORS

        if kind in FORMAT_EXTRACTORS:
            return FORMAT_EXTRACTORS[kind](text), -1, 1.0, None
        from docling_ray.stages.formats_extra import EXTRA_FORMAT_EXTRACTORS

        if kind in EXTRA_FORMAT_EXTRACTORS:
            return EXTRA_FORMAT_EXTRACTORS[kind](text), -1, 1.0, None
        from docling_ray.stages.patent_xml import PATENT_FORMAT_EXTRACTORS

        if kind in PATENT_FORMAT_EXTRACTORS:
            return PATENT_FORMAT_EXTRACTORS[kind](text), -1, 1.0, None
        return [], -1, 0.0, f"unknown input span kind: {kind!r}"
    except Exception as e:  # poison units must never fail the block
        return [], -1, 0.0, f"{kind} extraction error: {type(e).__name__}: {e}"


def assemble_units(
    units: list[tuple[int, str, list[Span], int, float, str | None]],
) -> dict:
    """Reassemble extracted units of one document.

    ``units``: (input_offset, kind, spans, page_no, score, error) per unit.
    Returns the output-row dict (without doc_id): spans (with DFS offsets),
    status, n_spans, errors, parse_score.
    """
    first_pdf_offset = min(
        (off for off, kind, *_ in units if kind == S.KIND_PDF_CELLS),
        default=-1,
    )

    def sort_key(u: tuple) -> tuple:
        off, kind, _spans, page_no, _score, _err = u
        if kind == S.KIND_PDF_CELLS:
            return (first_pdf_offset, page_no, off)
        return (off, -1, off)

    spans: list[Span] = []
    errors: list[str] = []
    scores: list[float] = []
    n_failed = 0
    for off, kind, unit_spans, page_no, score, err in sorted(units, key=sort_key):
        spans.extend(unit_spans)
        scores.append(score)
        if err is not None:
            errors.append(err)
            if not unit_spans:
                n_failed += 1

    if units and n_failed == len(units) and not spans:
        status = S.STATUS_FAILURE
    elif errors:
        status = S.STATUS_PARTIAL
    else:
        status = S.STATUS_SUCCESS
    return {
        "spans": S.spans_to_arrow(spans),
        "status": status,
        "n_spans": len(spans),
        "errors": errors,
        "parse_score": min(scores) if scores else 1.0,
    }


def extract_document(input_spans: list[dict]) -> dict:
    """Fast-path kernel: all units of one document, extracted and assembled."""
    units = []
    for s in input_spans:
        kind = s.get("kind", "")
        spans, page_no, score, err = extract_unit(
            kind, s.get("text") or "", s.get("media_ref") or ""
        )
        units.append((int(s.get("offset", 0)), kind, spans, page_no, score, err))
    return assemble_units(units)
