"""Format detection / content sniffing: payload → input-span ``kind``.

Behavior-parity rebuild of the reference's ``_guess_format`` chain
(``docling/datamodel/document.py:763-1108``): extension hint → magic
bytes → XML-root / DOCTYPE dialect sniff → HTML sniff → CSV sniff →
plain-text fallback — mapped onto this engine's kind vocabulary
(the keys of ``stages/assemble.extract_unit``'s dispatch). Every corpus
row can arrive UNLABELED and still route to the right extractor.

Priority order matters and mirrors the reference: specific dialect
signatures (XBRL namespace, USPTO DOCTYPE/root, JATS, METS, OOXML /
ODF roots) are tested before the generic HTML/XML fallbacks, and CSV
sniffing runs only after all markup sniffs fail (document.py:832-835).

Vectorized ``map_batches`` stage: :func:`detect_format_batch` explodes a
corpus row into one (doc_id, offset, kind) per input span, ignoring the
stored kind — used by the ``detect_format`` query, whose oracle is the
generator's known labels.
"""

from __future__ import annotations

import base64
import json
import re

import pyarrow as pa

_DOCTYPE_RE = re.compile(r"<!DOCTYPE\s+([^>\s]+)[^>]*>", re.IGNORECASE)
_ROOT_RE = re.compile(r"<\s*([A-Za-z_][\w:.-]*)")
_EML_HEADER_RE = re.compile(
    r"^(From|To|Subject|Date|Received|Return-Path|MIME-Version|Message-ID)"
    r":", re.IGNORECASE | re.MULTILINE,
)
_VTT_TS_RE = re.compile(r"\d\d:\d\d[:.]\d\d")
_B64_RE = re.compile(r"^[A-Za-z0-9+/=\s]+$")


def _strip_xml_prolog(s: str) -> str:
    s = re.sub(r"<!--.*?-->", "", s, flags=re.DOTALL).lstrip()
    s = re.sub(r"<\?xml[^>]*\?>", "", s, count=1).lstrip()
    return s


def _xml_root(s: str) -> str:
    body = _strip_xml_prolog(s)
    body = _DOCTYPE_RE.sub("", body, count=1).lstrip()
    m = _ROOT_RE.match(body)
    return m.group(1).lower() if m else ""


def _looks_like_csv(s: str) -> bool:
    """CSV sniff (reference _detect_csv semantics): ≥2 non-empty lines with
    a consistent delimiter count > 0 for , ; or tab."""
    lines = [ln for ln in s.splitlines() if ln.strip()][:10]
    if len(lines) < 2:
        return False
    for delim in (",", ";", "\t", "|"):
        counts = [ln.count(delim) for ln in lines]
        if counts[0] > 0 and all(c == counts[0] for c in counts):
            return True
    return False


_MD_MARK_RE = re.compile(r"^(#{1,6} |- |\* |\d+\. |```|\$\$)", re.MULTILINE)


def sniff_kind(payload: str, media_ref: str = "", filename: str = "") -> str:
    """Detect the input-span kind of an unlabeled payload."""
    s = payload or ""
    head = s[:4096]
    stripped = head.lstrip()
    name = (filename or "").lower()

    # --- extension hints that are unambiguous (reference checks these
    # before any content read: doclang/dclx, document.py:770-774)
    if name.endswith((".dclg", ".dclg.xml")):
        return "doclang"
    if name.endswith(".dclx"):
        return "dclx"
    # an attached media resource (img:// audio:// ...) makes the span a
    # media unit — its text, if any, is the caption
    if media_ref and "://" in media_ref:
        return "media"

    # --- magic bytes: raw or base64 PDF / zip (epub) / gzip (mets tar)
    if stripped.startswith("%PDF-"):
        return "pdf"
    if len(s) > 16 and _B64_RE.match(head) is not None:
        try:
            blob = base64.b64decode(head[:512] + "=" * (-len(head[:512]) % 4),
                                    validate=False)
            if blob[:5] == b"%PDF-":
                return "pdf"
            if blob[:8] == b"\x89PNG\r\n\x1a\n" or blob[:2] == b"BM" or \
                    blob[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6") or \
                    blob[:3] == b"\xff\xd8\xff" or blob[:4] in (
                        b"II*\x00", b"MM\x00*", b"GIF8") or \
                    (blob[:4] == b"RIFF" and blob[8:12] == b"WEBP") or \
                    blob[:4] == b"\x00\x00\x01\x00":
                # raster containers (decoded or rejected by image_codec)
                return "image"
            if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                return "audio"  # WAV PCM (stages/audio_codec)
            if blob[4:8] == b"ftyp":
                return "video"  # ISO BMFF / MP4 (stages/video_codec)
            if blob[:2] == b"\x1f\x8b":
                return "mets_gbs"  # gzipped tar container
            if blob[:4] == b"PK\x03\x04":
                # zip container: decode the FULL payload and sniff member
                # names (the central directory lives at the end) — the
                # reference's member sniff, document.py:763-1108: word/ →
                # docx, xl/ → xlsx, ppt/ → pptx, ODF mimetype, epub
                # container.xml, document.dclg → dclx
                from docling_ray.stages.containers import sniff_zip_kind

                try:
                    full = base64.b64decode(s, validate=False)
                except Exception:
                    full = blob
                kind = sniff_zip_kind(full)
                if kind:
                    return kind
                return "epub"  # unrecognized zip: the lenient fallback
        except Exception:
            pass

    # --- USPTO APS plain text (uspto_backend.py:123 "PATN" probe)
    if stripped.startswith("PATN"):
        return "uspto"

    # --- JSON payloads
    if stripped.startswith(("{", "[")):
        try:
            data = json.loads(s)
        except json.JSONDecodeError:
            data = None
        if isinstance(data, dict):
            if "cells" in data and "page_no" in data:
                return "pdf_cells"
            if "spans" in data and ("doc_id" in data or "status" in data):
                return "spans_json"
            if isinstance(data, dict) and data.get("spans") is not None:
                return "spans_json"
            if data.get("type") == "doc" or "atext" in data:
                return "boxnote"
            if "content" in data and isinstance(data.get("content"), list):
                return "boxnote"

    # --- WebVTT
    if stripped.startswith("WEBVTT") and _VTT_TS_RE.search(head):
        return "vtt"
    if stripped.startswith("WEBVTT"):
        return "vtt"

    # --- XML dialects (specific before generic — document.py:900-947)
    if stripped.startswith("<"):
        low = head.lower()
        root = _xml_root(head)
        doctype = _DOCTYPE_RE.search(head)
        dt = doctype.group(0).lower() if doctype else ""
        if "http://www.xbrl.org/2003/instance" in head and "<xbrl" in low:
            return "xbrl"
        if root in ("us-patent-grant", "us-patent-application",
                    "patent-application-publication", "patdoc") or any(
                sig in dt for sig in ("us-patent-application-v4",
                                      "us-patent-grant-v4", "us-grant-025",
                                      "patent-application-publication")):
            return "uspto"
        if root == "article" or "jats-journalpublishing" in dt or \
                "jats-archive" in dt:
            return "jats"
        if root == "doclang":
            return "doclang"
        if root == "mets" or "loc.gov/mets" in low:
            return "mets_gbs"
        if root == "w:document":
            return "docx_xml"
        if root in ("worksheet", "workbook") or root == "x:worksheet":
            return "xlsx_xml"
        if root in ("p:sld", "p:presentation"):
            return "pptx_xml"
        if root.startswith("office:document"):
            # flat ODF content: body child picks text/spreadsheet/presentation
            if "office:spreadsheet" in low:
                return "ods_xml"
            if "office:presentation" in low or "draw:page" in low:
                return "odp_xml"
            return "odt_xml"
        if root == "html":
            # XHTML with an XML prolog / epub namespace → epub branch
            if head.lstrip().startswith("<?xml") or \
                    "http://www.idpf.org" in low or "epub:" in low:
                return "epub_xhtml"
            return "html"
        if "<html" in low or "<!doctype html" in low or "<body" in low or \
                "<div" in low or "<p>" in low:
            return "html"
        if root:
            return "html"  # unknown markup: the HTML extractor is lenient

    # --- email
    if _EML_HEADER_RE.search(head[:512]) and "\n\n" in s[:4096].replace(
            "\r\n", "\n"):
        return "eml"
    if head.startswith(("From:", "Subject:", "Received:", "Return-Path:")):
        return "eml"

    # --- AsciiDoc: "= Title" first line or ":attr:" header lines
    first = stripped.splitlines()[0] if stripped else ""
    if first.startswith("= ") or re.match(r"^:[\w-]+:", first):
        return "asciidoc"

    # --- LaTeX
    if "\\documentclass" in head or "\\begin{document}" in head:
        return "latex"

    # --- CSV (after markup sniffs — document.py:834)
    if _looks_like_csv(head) and not _MD_MARK_RE.search(head):
        return "csv"

    # --- EBCDIC: latin-1-escaped bytes, mostly high-bit characters
    if s and sum(1 for ch in head[:256] if ord(ch) >= 0x80) > len(head[:256]) * 0.6:
        return "ebcdic"

    # --- markdown-ish plain text (the engine's "text" kind)
    return "text"


def detect_format_batch(batch: pa.Table) -> pa.Table:
    """Corpus rows (doc_id, spans) → one (doc_id, offset, kind) row per
    input span, detected from content alone (stored kinds ignored)."""
    doc_ids, offsets, kinds = [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for s in spans or []:
            doc_ids.append(did)
            offsets.append(int(s.get("offset", 0)))
            kinds.append(sniff_kind(s.get("text") or "",
                                    s.get("media_ref") or ""))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "offset": pa.array(offsets, pa.int32()),
        "kind": pa.array(kinds, pa.string()),
    })
