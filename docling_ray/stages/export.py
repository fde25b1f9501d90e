"""Export sinks: extracted span rows → markdown / plain text / doctags.

The reference's export surface (SURVEY.md §2.7: ``export_to_markdown``,
``export_to_doctags``, ``save_as_json``, OutputFormat md/text/doctags/json)
rebuilt as vectorized ``map_batches`` stages over the OUTPUT_SCHEMA rows —
each export is a pure function of the span sequence.

Mapping (kind → markdown), mirroring the reference's flattened rendering:
title → ``# ``, section_header → ``## ``, list_item → ``- ``, code →
fenced block, caption → italic line, footnote → ``[^]: `` line,
picture → image link with media_ref,
table → markdown grid rendered from the serialized grid media_ref,
page_header/page_footer → skipped (furniture stays out of exports),
checkbox_* → ``[x]`` / ``[ ]``.
"""

from __future__ import annotations

import json

import pyarrow as pa


def _table_to_markdown(media_ref: str) -> str:
    if not media_ref.startswith("grid:"):
        return ""
    try:
        grid = json.loads(media_ref[len("grid:"):])
    except json.JSONDecodeError:
        return ""
    cells = grid.get("cells") or []
    if not cells:
        return ""
    out = ["| " + " | ".join(cells[0]) + " |",
           "|" + "---|" * len(cells[0])]
    for row in cells[1:]:
        out.append("| " + " | ".join(row) + " |")
    return "\n".join(out)


def spans_to_markdown(spans: list[dict]) -> str:
    parts: list[str] = []
    for s in spans:
        kind, text, ref = s["kind"], s["text"], s["media_ref"]
        if kind == "title":
            parts.append(f"# {text}")
        elif kind == "section_header":
            parts.append(f"## {text}")
        elif kind == "text":
            parts.append(text)
        elif kind == "list_item":
            parts.append(f"- {text}")
        elif kind == "code":
            parts.append(f"```\n{text}\n```")
        elif kind == "caption":
            parts.append(f"*{text}*")
        elif kind == "picture":
            parts.append(f"![image]({ref})")
        elif kind == "table":
            md = _table_to_markdown(ref)
            if md:
                parts.append(md)
        elif kind == "formula":
            parts.append(f"$${text}$$")
        elif kind == "footnote":
            parts.append(f"[^]: {text}")
        elif kind == "checkbox_selected":
            parts.append("[x]")
        elif kind == "checkbox_unselected":
            parts.append("[ ]")
        elif kind in ("audio_meta", "video_meta"):
            parts.append(f"[{kind.split('_')[0]}: {text}]({ref})")
        elif kind == "audio_segment":
            parts.append(f"- segment {text}")
        elif kind == "video_frame":
            parts.append(f"- frame @{text}ms")
        # page_header / page_footer: furniture, skipped
    return "\n\n".join(parts)


def spans_to_text(spans: list[dict]) -> str:
    return "\n".join(
        s["text"] for s in spans
        if s["text"] and s["kind"] not in ("page_header", "page_footer")
    )


def _otsl_escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;")


def _otsl_unescape(t: str) -> str:
    return t.replace("&lt;", "<").replace("&amp;", "&")


def spans_to_doctags(spans: list[dict]) -> str:
    """Compact doctags-style serialization: <kind>text</kind> per span (the
    reference's DocTags analogue, lossless for our span model).

    Table spans carrying a canonical ``grid:`` ref serialize as OTSL
    markup — ``<otsl><ched>h…<nl><fcel>c…<nl></otsl>`` with ``<ched>``
    column headers on the first row, ``<fcel>`` body cells, ``<ecel>``
    empties and ``<nl>`` row terminators — the same public table
    vocabulary SmolDocling emits and the reference reloads through
    docling_core ``load_from_doctags`` (vlm_pipeline.py:461-465). Cell
    text is entity-escaped so the round trip is lossless for any cell
    content; :func:`parse_doctags` rebuilds the canonical grid ref."""
    parts = []
    for s in spans:
        kind, text, ref = s["kind"], s["text"], s["media_ref"]
        if kind == "table" and not text and ref.startswith("grid:"):
            try:
                cells = json.loads(ref[len("grid:"):]).get("cells") or []
            except (json.JSONDecodeError, AttributeError):
                cells = None
            if cells is not None:
                body = []
                for r, row in enumerate(cells):
                    for c in row:
                        tok = "ecel" if c == "" else \
                            ("ched" if r == 0 else "fcel")
                        body.append(f"<{tok}>" if tok == "ecel"
                                    else f"<{tok}>{_otsl_escape(c)}")
                    body.append("<nl>")
                parts.append(f"<otsl>{''.join(body)}</otsl>")
                continue
        attr = f' ref="{ref}"' if ref else ""
        parts.append(f"<{kind}{attr}>{text}</{kind}>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# HTML (+ split-page) — reference OutputFormat.HTML / HTML_SPLIT_PAGE
# (base_models.py:133-134). The rendering is chosen so extract_html
# re-extracts the same span sequence (round-trip pytest): h1/h2, p, one
# <ul> per list-item run, <pre>, <math>, <table><caption>, <figure>.
# Canonicalization: a caption adjacent to a table serializes INSIDE the
# table element (re-extracting caption-before-table, the HTML-source
# order); a caption after a picture serializes as its figcaption.
# Footnotes render as <p> (the HTML extractor has no footnote tag — a
# documented lossy mapping, like furniture which is skipped entirely).
# ---------------------------------------------------------------------------

import html as _html_mod


def _esc(t: str) -> str:
    return _html_mod.escape(t, quote=False)


def _grid_to_html(media_ref: str, caption: str) -> str:
    try:
        cells = json.loads(media_ref[len("grid:"):]).get("cells") or []
    except (json.JSONDecodeError, AttributeError):
        cells = []
    parts = ["<table>"]
    if caption:
        parts.append(f"<caption>{_esc(caption)}</caption>")
    for row in cells:
        parts.append("<tr>" + "".join(f"<td>{_esc(c)}</td>" for c in row)
                     + "</tr>")
    parts.append("</table>")
    return "".join(parts)


def _spans_to_html_body(spans: list[dict]) -> list[str]:
    parts: list[str] = []
    i = 0
    n = len(spans)
    while i < n:
        s = spans[i]
        kind, text, ref = s["kind"], s["text"], s["media_ref"]
        nxt = spans[i + 1] if i + 1 < n else None
        if kind == "title":
            parts.append(f"<h1>{_esc(text)}</h1>")
        elif kind == "section_header":
            parts.append(f"<h2>{_esc(text)}</h2>")
        elif kind == "text":
            parts.append(f"<p>{_esc(text)}</p>")
        elif kind == "list_item":
            items = [text]
            while i + 1 < n and spans[i + 1]["kind"] == "list_item":
                i += 1
                items.append(spans[i]["text"])
            parts.append("<ul>" + "".join(f"<li>{_esc(t)}</li>"
                                          for t in items) + "</ul>")
        elif kind == "code":
            parts.append(f"<pre>{_esc(text)}</pre>")
        elif kind == "formula":
            parts.append(f"<math>{_esc(text)}</math>")
        elif kind == "caption" and nxt is not None and nxt["kind"] == "table":
            parts.append(_grid_to_html(nxt["media_ref"], text))
            i += 1
        elif kind == "table":
            cap = ""
            if nxt is not None and nxt["kind"] == "caption":
                cap = nxt["text"]
                i += 1
            parts.append(_grid_to_html(ref, cap))
        elif kind == "picture":
            cap = ""
            if nxt is not None and nxt["kind"] == "caption":
                cap = nxt["text"]
                i += 1
            fc = f"<figcaption>{_esc(cap)}</figcaption>" if cap else ""
            parts.append(f'<figure><img src="{_html_mod.escape(ref)}"/>'
                         f"{fc}</figure>")
        elif kind == "caption":
            parts.append(f"<p>{_esc(text)}</p>")  # orphan caption: lossy
        elif kind == "footnote":
            parts.append(f"<p>{_esc(text)}</p>")  # lossy (no footnote tag)
        elif kind == "checkbox_selected":
            parts.append('<input type="checkbox" checked/>')
        elif kind == "checkbox_unselected":
            parts.append('<input type="checkbox"/>')
        # page_header / page_footer: furniture, skipped
        i += 1
    return parts


def spans_to_html(spans: list[dict]) -> str:
    body = "\n".join(_spans_to_html_body(spans))
    return f"<html><body>\n{body}\n</body></html>"


def spans_to_html_split_page(spans: list[dict]) -> str:
    """One <section class="page"> per page, split at page_header spans
    (the page boundary marker the extractors emit); documents without
    page furniture render as a single section."""
    pages: list[list[dict]] = [[]]
    for s in spans:
        if s["kind"] == "page_header" and pages[-1]:
            pages.append([])
        pages[-1].append(s)
    sections = []
    for pg in pages:
        if not pg:
            continue
        body = "\n".join(_spans_to_html_body(pg))
        sections.append(f'<section class="page">\n{body}\n</section>')
    return "<html><body>\n" + "\n".join(sections) + "\n</body></html>"


# ---------------------------------------------------------------------------
# VTT — reference OutputFormat.VTT (base_models.py:137). Spans that carry
# vtt:// timing media_refs (the WebVTT/ASR extraction shape) round-trip
# through extract_vtt; untimed spans get deterministic 5-second cues.
# ---------------------------------------------------------------------------

def _cue_ts(idx: int) -> str:
    start = idx * 5
    end = start + 5

    def fmt(t: int) -> str:
        return f"{t // 3600:02d}:{t % 3600 // 60:02d}:{t % 60:02d}.000"

    return f"{fmt(start)}-->{fmt(end)}"


def spans_to_vtt(spans: list[dict]) -> str:
    parts = ["WEBVTT"]
    idx = 0
    for s in spans:
        if s["kind"] in ("page_header", "page_footer") or not s["text"]:
            continue
        ref = s["media_ref"] or ""
        timing = ref[len("vtt://"):] if ref.startswith("vtt://") \
            else _cue_ts(idx)
        parts.append(timing.replace("-->", " --> ") + "\n" + s["text"])
        idx += 1
    return "\n\n".join(parts) + "\n"


# ---------------------------------------------------------------------------
# chunks — reference OutputFormat.CHUNKS (base_models.py:140): the
# structure-aware chunker's output as one JSON array per document.
# ---------------------------------------------------------------------------

def spans_to_chunks(spans: list[dict]) -> str:
    from docling_ray.stages.chunker import hybrid_chunks

    return json.dumps(hybrid_chunks(spans), ensure_ascii=False,
                      separators=(",", ":"))


# ---------------------------------------------------------------------------
# JSON — the lossless spans_json serialization; extract_spans_json is the
# reload inverse (reference save_as_json / docling_json_backend.py:13).
# ---------------------------------------------------------------------------

def spans_to_json(spans: list[dict]) -> str:
    return json.dumps(
        [{"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"]}
         for s in spans],
        ensure_ascii=False, separators=(",", ":"))


# ---------------------------------------------------------------------------
# DocLang XML + .dclx archive — reference OutputFormat.DOCLANG / DCLX
# (base_models.py:138-139); extract_doclang / extract_dclx are the reload
# inverses (formats_extra.py).
# ---------------------------------------------------------------------------

def spans_to_doclang(spans: list[dict]) -> str:
    parts = ["<doclang>"]
    i = 0
    n = len(spans)
    while i < n:
        s = spans[i]
        kind, text, ref = s["kind"], s["text"], s["media_ref"]
        nxt = spans[i + 1] if i + 1 < n else None
        if kind == "table" and ref.startswith("grid:"):
            try:
                cells = json.loads(ref[5:]).get("cells") or []
            except json.JSONDecodeError:
                cells = []
            parts.append("<table>" + "".join(
                "<row>" + "".join(f"<cell>{_esc(c)}</cell>" for c in row)
                + "</row>" for row in cells) + "</table>")
        elif kind == "picture":
            cap = ""
            if nxt is not None and nxt["kind"] == "caption":
                cap = nxt["text"]
                i += 1
            inner = f"<caption>{_esc(cap)}</caption>" if cap else ""
            parts.append(f'<picture src="{_html_mod.escape(ref)}">'
                         f"{inner}</picture>")
        else:
            tag = "paragraph" if kind == "text" else kind
            parts.append(f"<{tag}>{_esc(text)}</{tag}>")
        i += 1
    parts.append("</doclang>")
    return "".join(parts)


def spans_to_dclx(spans: list[dict]) -> str:
    """Base64 of a .dclx zip archive: ``document.dclg`` first (the sniff
    anchor), referenced media listed under ``artifacts/`` as placeholder
    members. Deterministic (fixed timestamps, no compression jitter)."""
    import base64
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        info = zipfile.ZipInfo("document.dclg", date_time=(1980, 1, 1,
                                                           0, 0, 0))
        zf.writestr(info, spans_to_doclang(spans))
        for s in spans:
            ref = s["media_ref"] or ""
            if s["kind"] == "picture" and ref:
                name = "artifacts/" + ref.replace("://", "_").replace(
                    "/", "_")
                ainfo = zipfile.ZipInfo(name, date_time=(1980, 1, 1,
                                                         0, 0, 0))
                zf.writestr(ainfo, ref)
    return base64.b64encode(buf.getvalue()).decode("ascii")


# ---------------------------------------------------------------------------
# YAML — reference OutputFormat.YAML (base_models.py:132). No yaml lib in
# this container, so the writer emits a strict subset (block sequence of
# flat mappings, scalars as JSON strings — YAML's double-quoted style
# accepts JSON escapes, so every emitted document is valid YAML) and
# parse_yaml_spans reads exactly that subset back (round-trip tested).
# ---------------------------------------------------------------------------

def spans_to_yaml(spans: list[dict]) -> str:
    lines = []
    for s in spans:
        lines.append(f"- kind: {json.dumps(s['kind'])}")
        lines.append(f"  text: {json.dumps(s['text'], ensure_ascii=False)}")
        lines.append(f"  media_ref: "
                     f"{json.dumps(s['media_ref'], ensure_ascii=False)}")
    return "\n".join(lines) + ("\n" if lines else "")


def parse_yaml_spans(raw: str) -> list[tuple[str, str, str]]:
    """Inverse of :func:`spans_to_yaml` for the emitted subset."""
    spans: list[tuple[str, str, str]] = []
    cur: dict[str, str] = {}
    for line in raw.splitlines():
        body = line.strip()
        if not body:
            continue
        if body.startswith("- "):
            if cur:
                spans.append((cur.get("kind", "text"), cur.get("text", ""),
                              cur.get("media_ref", "")))
            cur = {}
            body = body[2:]
        key, _, val = body.partition(":")
        val = val.strip()
        try:
            cur[key.strip()] = json.loads(val) if val else ""
        except json.JSONDecodeError:
            raise ValueError(f"yaml subset: bad scalar {val!r}") from None
    if cur:
        spans.append((cur.get("kind", "text"), cur.get("text", ""),
                      cur.get("media_ref", "")))
    return spans


_EXPORTERS = {
    "markdown": spans_to_markdown,
    "text": spans_to_text,
    "doctags": spans_to_doctags,
    "html": spans_to_html,
    "html_split_page": spans_to_html_split_page,
    "vtt": spans_to_vtt,
    "chunks": spans_to_chunks,
    "json": spans_to_json,
    "doclang": spans_to_doclang,
    "dclx": spans_to_dclx,
    "yaml": spans_to_yaml,
}


def export_batch(batch: pa.Table, fmt: str = "markdown") -> pa.Table:
    """OUTPUT_SCHEMA rows → (doc_id, content) rendered in ``fmt``."""
    fn = _EXPORTERS[fmt]
    contents = [fn(spans or []) for spans in batch["spans"].to_pylist()]
    return pa.table({
        "doc_id": batch["doc_id"],
        "content": pa.array(contents, pa.string()),
    })


def export_corpus(ds, fmt: str = "markdown"):
    """Extraction output Dataset → (doc_id, content) Dataset."""
    return ds.map_batches(export_batch, batch_format="pyarrow",
                          fn_kwargs={"fmt": fmt})


# ---------------------------------------------------------------------------
# DocTags parsing (the lossless inverse of spans_to_doctags) — the reload
# path used by the VLM pipeline's doctags output
# (reference vlm_pipeline.py:446 _turn_dt_into_doc analogue).
# ---------------------------------------------------------------------------

import re as _re

_DOCTAG_RE = _re.compile(
    r"<otsl>(?P<otsl>.*?)</otsl>"
    r"|<(?P<kind>[a-z_]+)(?:\s+ref=\"(?P<ref>[^\"]*)\")?>"
    r"(?P<text>.*?)</(?P=kind)>",
    _re.DOTALL,
)

_OTSL_TOK_RE = _re.compile(r"<(fcel|ched|rhed|ecel|nl)>([^<]*)")


def _parse_otsl(body: str) -> list[list[str]]:
    rows: list[list[str]] = []
    cur: list[str] = []
    for m in _OTSL_TOK_RE.finditer(body):
        tok, text = m.group(1), m.group(2)
        if tok == "nl":
            rows.append(cur)
            cur = []
        elif tok == "ecel":
            cur.append("")
        else:
            cur.append(_otsl_unescape(text))
    if cur:
        rows.append(cur)
    return rows


def parse_doctags(raw: str) -> list[tuple[str, str, str]]:
    """DocTags string → (kind, text, media_ref) spans. Inverse of
    :func:`spans_to_doctags` for our span model; ``<otsl>`` table
    markup rebuilds the canonical ``grid:`` ref via
    :func:`~docling_ray.functions.refs.grid_media_ref`."""
    from docling_ray.functions.refs import grid_media_ref

    out = []
    for m in _DOCTAG_RE.finditer(raw):
        if m.group("otsl") is not None:
            out.append(("table", "", grid_media_ref(
                _parse_otsl(m.group("otsl")))))
        else:
            out.append((m.group("kind"), m.group("text"),
                        m.group("ref") or ""))
    return out
