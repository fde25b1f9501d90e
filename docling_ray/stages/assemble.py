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
        if kind == "audio":
            from docling_ray.stages.audio_codec import extract_audio_unit

            return extract_audio_unit(text)
        if kind == "video":
            from docling_ray.stages.video_codec import extract_video_unit

            return extract_video_unit(text)
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


_SOFT_HYPHEN = "­"
_PAGE_TAIL_FURNITURE = ("footnote", "page_footer")


def merge_page_boundary(
    prev_spans: list[Span], next_spans: list[Span],
) -> tuple[list[Span], list[Span]] | None:
    """Cross-page hyphenated-word merge (the reading-order model's merge
    application, readingorder_model.py:589-621): the last body text span
    of page P joins the first body text span of page P+1 when P's text
    ends with a soft hyphen, or ends with "-" and the continuation starts
    lowercase — the split-word case; the hyphen is dropped and the texts
    concatenated directly. Page furniture (header before, footnotes and
    footer after) is skipped when locating the boundary pair. Returns the
    rewritten (prev, next) span lists, or None when the rule does not
    apply."""
    ia = len(prev_spans) - 1
    while ia >= 0 and prev_spans[ia][0] in _PAGE_TAIL_FURNITURE:
        ia -= 1
    if ia < 0 or prev_spans[ia][0] != "text":
        return None
    ib = 0
    while ib < len(next_spans) and next_spans[ib][0] == "page_header":
        ib += 1
    if ib >= len(next_spans) or next_spans[ib][0] != "text":
        return None
    a = prev_spans[ia][1]
    b = next_spans[ib][1]
    if not b or not (
        a.endswith(_SOFT_HYPHEN) or (a.endswith("-") and b[0].islower())
    ):
        return None
    new_prev = list(prev_spans)
    new_next = list(next_spans)
    new_prev[ia] = ("text", a[:-1] + b, "")
    del new_next[ib]
    return new_prev, new_next


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

    ordered = sorted(units, key=sort_key)

    # cross-page hyphen merge between consecutive non-empty pdf pages
    # (page-parallel safe: runs on the page_no-ordered gather, so the
    # explode path reassembly sees the same result as the fast path)
    for i in range(len(ordered) - 1):
        off_a, kind_a, spans_a, page_a, score_a, err_a = ordered[i]
        off_b, kind_b, spans_b, page_b, score_b, err_b = ordered[i + 1]
        if (
            kind_a == S.KIND_PDF_CELLS and kind_b == S.KIND_PDF_CELLS
            and page_b == page_a + 1 and spans_a and spans_b
        ):
            merged = merge_page_boundary(spans_a, spans_b)
            if merged is not None:
                ordered[i] = (off_a, kind_a, merged[0], page_a, score_a, err_a)
                ordered[i + 1] = (off_b, kind_b, merged[1], page_b, score_b,
                                  err_b)

    spans: list[Span] = []
    errors: list[str] = []
    scores: list[float] = []
    n_failed = 0
    for off, kind, unit_spans, page_no, score, err in ordered:
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
    """Fast-path kernel: all units of one document, extracted and
    assembled. A positive ``extract.document_timeout`` (settings, in
    seconds) bounds the per-doc wall clock: the first unit always runs;
    once the budget is exceeded, remaining units are skipped as timeout
    errors and the doc comes back ``partial_success`` — the reference's
    document_timeout semantics (standard_pdf_pipeline.py:886-963: close
    page intake, mark missing pages TIMEOUT, PARTIAL_SUCCESS). The
    explode path bounds big-doc wall differently — by unit-level
    parallelism — so the guard lives here only."""
    import time as _time

    from docling_ray.settings import options_for

    timeout = float(options_for("extract").get("document_timeout", 0.0)
                    or 0.0)
    deadline = (_time.monotonic() + timeout) if timeout > 0 else None
    units = []
    for s in input_spans:
        kind = s.get("kind", "")
        if (deadline is not None and units
                and _time.monotonic() >= deadline):
            units.append((int(s.get("offset", 0)), kind, [], -1, 1.0,
                          "document timeout: unit skipped"))
            continue
        spans, page_no, score, err = extract_unit(
            kind, s.get("text") or "", s.get("media_ref") or ""
        )
        units.append((int(s.get("offset", 0)), kind, spans, page_no, score, err))
    return assemble_units(units)
