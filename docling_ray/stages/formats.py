"""Additional format backends, each a pure function ``payload → spans``.

Rebuilds of the reference's smaller declarative backends (SURVEY.md §2.1),
registered as input-span kinds in ``stages/assemble.py``:

  * ``vtt``    — WebVTT cues with speakers/timestamps
    (``docling/backend/webvtt_backend.py:53-209``): cue text becomes
    ``text`` spans; ``<v Speaker>`` voice tags become ``"Speaker: text"``;
    cue timestamps are preserved in a trailing media_ref
    (``vtt://start-->end``) so exports can reconstruct timing.
  * ``eml``    — RFC-822 email (``docling/backend/email_backend.py:41-176``):
    Subject → title span, From/To/Date headers → furniture (dropped, like
    the reference's headers→furniture), text/plain body → text spans;
    text/html parts delegate to the HTML extractor (same delegation as the
    reference).
  * ``asciidoc`` — line-regex parser
    (``docling/backend/asciidoc_backend.py:34-458``): ``= Title`` levels,
    ``*``/``.`` list items, ``----`` literal blocks, ``image::`` macros.
  * ``ebcdic`` — codepage decode + fixed-record parse
    (``docling/backend/ebcdic_backend.py:198-321``): cp037-decoded
    fixed-width records → one text span per record line.
  * ``spans_json`` — lossless reload of an extracted span list
    (``docling/backend/json/docling_json_backend.py:13``): validated and
    passed through.
"""

from __future__ import annotations

import email
import email.policy
import json
import re

from docling_ray import schema as S
from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.stages.html_extract import extract_html

Span = tuple[str, str, str]

# ---------------------------------------------------------------------------
# WebVTT
# ---------------------------------------------------------------------------

_TS_RE = re.compile(
    r"(\d{1,2}:)?\d{2}:\d{2}\.\d{3}\s*-->\s*(\d{1,2}:)?\d{2}:\d{2}\.\d{3}"
)
_VOICE_RE = re.compile(r"<v(?:\.[^ >]*)?\s+([^>]+)>")
_TAG_RE = re.compile(r"</?[^>]+>")


def extract_vtt(raw: str) -> list[Span]:
    spans: list[Span] = []
    lines = raw.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    i = 0
    if lines and lines[0].startswith("WEBVTT"):
        i = 1
    while i < len(lines):
        line = lines[i].strip()
        m = _TS_RE.search(line)
        if not m:
            i += 1
            continue
        timing = collapse_whitespace(m.group(0)).replace(" --> ", "-->")
        i += 1
        cue_lines: list[str] = []
        while i < len(lines) and lines[i].strip():
            cue_lines.append(lines[i].strip())
            i += 1
        text = " ".join(cue_lines)
        vm = _VOICE_RE.search(text)
        speaker = collapse_whitespace(vm.group(1)) if vm else ""
        text = collapse_whitespace(clean_unicode(_TAG_RE.sub("", text)))
        if text:
            if speaker:
                text = f"{speaker}: {text}"
            spans.append(("text", text, f"vtt://{timing}"))
    return spans


# ---------------------------------------------------------------------------
# Email (RFC-822)
# ---------------------------------------------------------------------------

def extract_eml(raw: str) -> list[Span]:
    msg = email.message_from_string(raw, policy=email.policy.default)
    spans: list[Span] = []
    subject = collapse_whitespace(clean_unicode(msg.get("Subject", "") or ""))
    if subject:
        spans.append(("title", subject, ""))
    # From/To/Date/etc headers are furniture (email_backend.py:41-176) — dropped
    for part in msg.walk():
        ctype = part.get_content_type()
        if ctype == "text/plain":
            try:
                body = part.get_content()
            except Exception:
                body = part.get_payload()
            for para in re.split(r"\n\s*\n", str(body)):
                text = collapse_whitespace(clean_unicode(para))
                if text:
                    spans.append(("text", text, ""))
        elif ctype == "text/html":
            try:
                body = str(part.get_content())
            except Exception:
                body = str(part.get_payload())
            spans.extend(extract_html(body))
    return spans


# ---------------------------------------------------------------------------
# AsciiDoc
# ---------------------------------------------------------------------------

_ADOC_TITLE_RE = re.compile(r"^(=+)\s+(.*\S)\s*$")
_ADOC_LIST_RE = re.compile(r"^\s*(\*+|\.+|-)\s+(.*\S)\s*$")
_ADOC_IMAGE_RE = re.compile(r"^image::([^\[]+)\[(.*?)\]\s*$")


def extract_asciidoc(raw: str) -> list[Span]:
    spans: list[Span] = []
    lines = clean_unicode(raw).split("\n")
    para: list[str] = []
    literal: list[str] | None = None

    def flush() -> None:
        if para:
            text = collapse_whitespace(" ".join(para))
            if text:
                spans.append(("text", text, ""))
            para.clear()

    for line in lines:
        if literal is not None:
            if line.strip() == "----":
                spans.append(("code", "\n".join(literal), ""))
                literal = None
            else:
                literal.append(line)
            continue
        if line.strip() == "----":
            flush()
            literal = []
            continue
        m = _ADOC_TITLE_RE.match(line)
        if m:
            flush()
            kind = "title" if len(m.group(1)) == 1 else "section_header"
            spans.append((kind, collapse_whitespace(m.group(2)), ""))
            continue
        m = _ADOC_IMAGE_RE.match(line.strip())
        if m:
            flush()
            spans.append(("picture", "", m.group(1).strip()))
            cap = collapse_whitespace(m.group(2))
            if cap:
                spans.append(("caption", cap, ""))
            continue
        m = _ADOC_LIST_RE.match(line)
        if m:
            flush()
            spans.append(("list_item", collapse_whitespace(m.group(2)), ""))
            continue
        if not line.strip():
            flush()
            continue
        para.append(line.strip())
    if literal:
        spans.append(("code", "\n".join(literal), ""))
    flush()
    return spans


# ---------------------------------------------------------------------------
# EBCDIC fixed records
# ---------------------------------------------------------------------------

def extract_ebcdic(raw: str, codepage: str | None = None,
                   record_len: int | None = None) -> list[Span]:
    """``raw`` is latin-1-escaped EBCDIC bytes (binary travels as a string
    column in the interleaved schema). Decode per codepage, split into
    fixed-width records, emit one text span per non-blank record."""
    if codepage is None or record_len is None:
        from docling_ray.settings import options_for

        opts = options_for("ebcdic")
        codepage = codepage or opts["codepage"]
        record_len = record_len or int(opts["record_len"])
    data = raw.encode("latin-1", errors="ignore")
    try:
        decoded = data.decode(codepage)
    except (LookupError, UnicodeDecodeError):
        return []
    spans: list[Span] = []
    for off in range(0, len(decoded), record_len):
        rec = collapse_whitespace(decoded[off : off + record_len])
        if rec:
            spans.append(("text", rec, ""))
    return spans


# ---------------------------------------------------------------------------
# Lossless span-JSON reload
# ---------------------------------------------------------------------------

def extract_spans_json(raw: str) -> list[Span]:
    data = json.loads(raw)
    if not isinstance(data, list):
        raise ValueError("spans_json payload must be a list of span objects")
    spans: list[Span] = []
    for s in data:
        kind = s.get("kind", "text")
        if kind not in S.OUT_KINDS:
            raise ValueError(f"invalid span kind {kind!r}")
        spans.append((kind, s.get("text", "") or "", s.get("media_ref", "") or ""))
    return spans


def _lazy_office(name):
    def fn(raw: str):
        from docling_ray.stages import jats, office_xml

        table = {
            "docx_xml": office_xml.extract_docx_xml,
            "xlsx_xml": office_xml.extract_xlsx_xml,
            "jats": jats.extract_jats,
        }
        return table[name](raw)

    return fn


def _lazy_container(name):
    def fn(raw: str):
        from docling_ray.stages.containers import CONTAINER_EXTRACTORS

        return CONTAINER_EXTRACTORS[name](raw)

    return fn


FORMAT_EXTRACTORS = {
    "vtt": extract_vtt,
    "eml": extract_eml,
    "asciidoc": extract_asciidoc,
    "ebcdic": extract_ebcdic,
    "spans_json": extract_spans_json,
    "docx_xml": _lazy_office("docx_xml"),
    "xlsx_xml": _lazy_office("xlsx_xml"),
    "jats": _lazy_office("jats"),
    # zip containers (base64 payloads; stages/containers.py resolves the
    # package structure and delegates to the inner-XML extractors)
    "docx": _lazy_container("docx"),
    "xlsx": _lazy_container("xlsx"),
    "pptx": _lazy_container("pptx"),
    "odt": _lazy_container("odt"),
    "ods": _lazy_container("ods"),
    "odp": _lazy_container("odp"),
}
