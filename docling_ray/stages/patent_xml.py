"""Patent / financial / scanned-archive XML dialects: USPTO, XBRL, METS.

Rebuilds of the reference's remaining XML backends (SURVEY.md §2.1):

  * ``uspto`` — USPTO grant/application XML
    (``docling/backend/xml/uspto_backend.py:110``; the reference carries
    four dialect parsers — this subset reads the modern ICE grant shape):
    invention title → title, abstract → section + text, description
    paragraphs/headings, claims → ``Claims`` section with one list item
    per claim.
  * ``xbrl`` — XBRL instance documents
    (``docling/backend/xml/xbrl_backend.py:65``): contexts (period) +
    non-numeric-namespaced facts → one fact table (concept, context,
    unit, value), the reference's financial-fact extraction shape.
  * ``mets_gbs`` — METS scanned-book manifests
    (``docling/backend/mets_gbs_backend.py:55``): one page per structMap
    div with its image file reference → paginated picture spans + any
    OCR text content; pages ordered by ORDER attribute.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.stages.html_extract import grid_media_ref

Span = tuple[str, str, str]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text_of(el: ET.Element | None) -> str:
    if el is None:
        return ""
    return collapse_whitespace(clean_unicode("".join(el.itertext())))


def _find_local(root: ET.Element, name: str) -> ET.Element | None:
    for el in root.iter():
        if _local(el.tag) == name:
            return el
    return None


def _findall_local(root: ET.Element, name: str) -> list[ET.Element]:
    return [el for el in root.iter() if _local(el.tag) == name]


# ---------------------------------------------------------------------------
# USPTO
# ---------------------------------------------------------------------------

_APS_SECTIONS = {"ABST", "BSUM", "DETD", "CLMS", "DRWD", "PATN"}
_APS_PARA_FIELDS = {"PAR", "PA1", "PA2", "PA3", "PAL"}


def _extract_uspto_aps(raw: str) -> list[Span]:
    """USPTO Patent Grant Full Text Data / APS (1976-2001): fixed-width
    field codes in column 1-4, value from column 6, bare section markers
    (ABST/BSUM/DETD/CLMS/DRWD), continuation lines indented. Behavior
    parity with the reference's PatentUsptoGrantAps
    (uspto_backend.py:926-1110): TTL → title, ABST → heading + one merged
    abstract paragraph, CLMS → heading + one text item per NUM-started
    claim, PAC captions → section headers, PARs → paragraphs."""
    fields: list[tuple[str, str]] = []  # (code, value) after continuation merge
    for line in raw.splitlines():
        if not line.strip():
            continue
        code = line[:4].strip()
        value = line[5:].strip() if len(line) > 5 else ""
        if code:
            fields.append((code, value))
        elif fields:  # indented continuation of the previous field
            prev_code, prev_val = fields[-1]
            fields[-1] = (prev_code,
                          (prev_val + " " + line.strip()).strip())
    spans: list[Span] = []
    section = ""
    abstract_parts: list[str] = []
    claims: list[str] = []
    claim_open = False

    def flush_abstract() -> None:
        if abstract_parts:
            spans.append(("section_header", "ABSTRACT", ""))
            spans.append(("text", _clean(" ".join(abstract_parts)), ""))
            abstract_parts.clear()

    def flush_claims() -> None:
        if claims:
            spans.append(("section_header", "CLAIMS", ""))
            spans.extend(("text", _clean(c), "") for c in claims if c.strip())
            claims.clear()

    for code, value in fields:
        if code in _APS_SECTIONS:
            flush_abstract()
            flush_claims()
            section = code
            claim_open = False
            continue
        if code == "TTL":
            spans.append(("title", _clean(value), ""))
        elif section == "ABST" and code in _APS_PARA_FIELDS:
            abstract_parts.append(value)
        elif section == "CLMS":
            if code == "NUM":
                claims.append("")
                claim_open = True
            elif code in _APS_PARA_FIELDS:
                if not claim_open:
                    claims.append("")
                    claim_open = True
                claims[-1] = (claims[-1] + " " + value).strip()
        elif code == "PAC" and section in ("BSUM", "DETD", "DRWD"):
            spans.append(("section_header", _clean(value), ""))
        elif code in _APS_PARA_FIELDS and section in ("BSUM", "DETD", "DRWD"):
            spans.append(("text", _clean(value), ""))
    flush_abstract()
    flush_claims()
    return [s for s in spans if s[1] or s[2]]


def _clean(text: str) -> str:
    return collapse_whitespace(clean_unicode(text))


def extract_uspto(raw: str) -> list[Span]:
    """USPTO dispatcher: APS plain text (PATN header) vs XML dialects —
    the reference's doctype probe (uspto_backend.py:112-155)."""
    if raw.lstrip().startswith("PATN"):
        return _extract_uspto_aps(raw)
    root = ET.fromstring(raw)
    spans: list[Span] = []
    title = _text_of(_find_local(root, "invention-title"))
    if title:
        spans.append(("title", title, ""))
    abstract = _find_local(root, "abstract")
    if abstract is not None:
        texts = [t for t in (_text_of(p) for p in _findall_local(abstract, "p")) if t]
        if texts:
            spans.append(("section_header", "Abstract", ""))
            spans.extend(("text", t, "") for t in texts)
    desc = _find_local(root, "description")
    if desc is not None:
        spans.append(("section_header", "Description", ""))
        for el in desc:
            name = _local(el.tag)
            t = _text_of(el)
            if not t:
                continue
            if name == "heading":
                spans.append(("section_header", t, ""))
            elif name == "p":
                spans.append(("text", t, ""))
    claims = _find_local(root, "claims")
    if claims is not None:
        items = [t for t in (_text_of(c) for c in _findall_local(claims, "claim")) if t]
        if items:
            spans.append(("section_header", "Claims", ""))
            spans.extend(("list_item", t, "") for t in items)
    return spans


# ---------------------------------------------------------------------------
# XBRL
# ---------------------------------------------------------------------------

_XBRL_SKIP = {"context", "unit", "schemaRef", "roleRef", "arcroleRef",
              "footnoteLink"}


def extract_xbrl(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    periods: dict[str, str] = {}
    for ctx in _findall_local(root, "context"):
        cid = ctx.get("id", "")
        period = _find_local(ctx, "period")
        if period is not None:
            parts = [_text_of(p) for p in period]
            periods[cid] = "/".join(p for p in parts if p)
    grid: list[list[str]] = [["concept", "period", "unit", "value"]]
    for el in root:
        name = _local(el.tag)
        if name in _XBRL_SKIP or el.get("contextRef") is None:
            continue
        grid.append([
            name,
            periods.get(el.get("contextRef", ""), el.get("contextRef", "")),
            el.get("unitRef", ""),
            _text_of(el),
        ])
    if len(grid) == 1:
        return []
    return [("section_header", "Facts", ""),
            ("table", "", grid_media_ref(grid))]


# ---------------------------------------------------------------------------
# METS (scanned book)
# ---------------------------------------------------------------------------

def extract_mets(raw: str) -> list[Span]:
    root = ET.fromstring(raw)
    # file id → href
    files: dict[str, str] = {}
    for f in _findall_local(root, "file"):
        fid = f.get("ID", "")
        floc = _find_local(f, "FLocat")
        if floc is not None:
            for k, v in floc.attrib.items():
                if k.endswith("href"):
                    files[fid] = v
    spans: list[Span] = []
    pages = []
    for div in _findall_local(root, "div"):
        if (div.get("TYPE", "") or "").lower() != "page":
            continue
        order = int(div.get("ORDER", "0") or 0)
        refs = [fp.get("FILEID", "") for fp in _findall_local(div, "fptr")]
        label = collapse_whitespace(clean_unicode(div.get("LABEL", "") or ""))
        pages.append((order, label, refs))
    for order, label, refs in sorted(pages):
        header = label or f"Page {order}"
        spans.append(("page_header", header, ""))
        for rid in refs:
            if rid in files:
                spans.append(("picture", "", files[rid]))
    return spans


def extract_mets_container(b64: str) -> list[Span]:
    """METS GBS tar.gz container (the reference's
    mets_gbs_backend.py:203-300): base64 of a gzipped tar holding the
    METS manifest plus per-page OCR text members. fileGrp USE=OCR maps
    file ids to member paths; structMap page divs give the order; each
    page emits its header, its image reference (if any) and the OCR
    member's text (hOCR markup stripped). Bounded member count/size
    guards mirror the reference's archive limits."""
    import base64
    import io
    import re as _re
    import tarfile

    data = base64.b64decode(b64, validate=True)
    max_members, max_member_bytes = 10_000, 64 << 20
    members: dict[str, bytes] = {}
    mets_xml: str | None = None
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tar:
        for i, member in enumerate(tar.getmembers()):
            if i >= max_members:
                raise ValueError("mets archive exceeds member-count limit")
            if not member.isfile() or member.size > max_member_bytes:
                continue
            f = tar.extractfile(member)
            if f is None:
                continue
            content = f.read()
            members[member.name] = content
            if member.name.endswith(".xml") and mets_xml is None and                     b"loc.gov/METS" in content[:4096]:
                mets_xml = content.decode("utf-8", errors="replace")
    if mets_xml is None:
        raise ValueError("mets archive has no METS manifest")
    root = ET.fromstring(mets_xml)

    ocr_files: dict[str, str] = {}
    img_files: dict[str, str] = {}
    for grp in _findall_local(root, "fileGrp"):
        use = grp.get("USE", "")
        for f in _findall_local(grp, "file"):
            fid = f.get("ID", "")
            floc = _find_local(f, "FLocat")
            href = ""
            if floc is not None:
                for k, v in floc.attrib.items():
                    if k.endswith("href"):
                        href = v
            if not fid or not href:
                continue
            if use in ("OCR", "coordOCR"):
                ocr_files.setdefault(fid, href)
            else:
                img_files.setdefault(fid, href)

    def member_text(href: str) -> str:
        raw_bytes = members.get(href) or members.get(href.lstrip("./"), b"")
        if not raw_bytes:
            for name, content in members.items():
                if name.endswith("/" + href) or name.endswith(href):
                    raw_bytes = content
                    break
        text = raw_bytes.decode("utf-8", errors="replace")
        if "<" in text:  # hOCR / ALTO-ish markup: strip tags
            text = _re.sub(r"<[^>]+>", " ", text)
        return collapse_whitespace(clean_unicode(text))

    spans: list[Span] = []
    pages = []
    for div in _findall_local(root, "div"):
        if (div.get("TYPE", "") or "").lower() != "page":
            continue
        order = int(div.get("ORDER", "0") or 0)
        refs = [fp.get("FILEID", "") for fp in _findall_local(div, "fptr")]
        label = collapse_whitespace(clean_unicode(div.get("LABEL", "") or ""))
        pages.append((order, label, refs))
    for order, label, refs in sorted(pages):
        spans.append(("page_header", label or f"Page {order}", ""))
        for rid in refs:
            if rid in img_files:
                spans.append(("picture", "", img_files[rid]))
        for rid in refs:
            if rid in ocr_files:
                text = member_text(ocr_files[rid])
                if text:
                    spans.append(("text", text, ""))
    return spans


def extract_mets_any(raw: str) -> list[Span]:
    """mets_gbs dispatcher: base64 tar.gz container vs bare manifest XML."""
    if raw.lstrip().startswith("<"):
        return extract_mets(raw)
    return extract_mets_container(raw)


PATENT_FORMAT_EXTRACTORS = {
    "uspto": extract_uspto,
    "xbrl": extract_xbrl,
    "mets_gbs": extract_mets_any,
}
