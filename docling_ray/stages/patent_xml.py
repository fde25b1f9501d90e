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

import re
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


# --- CALS/OASIS exchange tables (soextblx.dtd) -----------------------------
# GrantV2 and AppV1 embed <table><tgroup><tbody><row><entry> markup (the
# reference parses them with XmlTable, uspto_backend.py:1496-1816).
# Rebuilt as a grid walk with colspec-aware column spans (colname /
# namest+nameend) and morerows row spans; spanned cells replicate their
# text — the same expanded-grid canonical form the HTML table parser
# emits, so downstream grid consumers see one convention.

def _cals_table_grid(tbl: ET.Element) -> list[list[str]]:
    tgroup = _find_local(tbl, "tgroup")
    scope = tgroup if tgroup is not None else tbl

    # colspec name → 0-based index (explicit colnum or document order)
    col_of: dict[str, int] = {}
    next_col = 0
    for cs in scope.iter():
        if _local(cs.tag) != "colspec":
            continue
        num = cs.get("colnum")
        idx = int(num) - 1 if num and num.isdigit() else next_col
        name = cs.get("colname")
        if name:
            col_of[name] = idx
        next_col = idx + 1
    try:
        ncols = int(scope.get("cols", "0")) if scope is tgroup else 0
    except ValueError:
        ncols = 0
    ncols = max(ncols, next_col)

    rows_el = [r for r in scope.iter() if _local(r.tag) == "row"]
    grid: list[list[str | None]] = []
    # (col, remaining_rows, text) carried down by morerows
    carry: list[tuple[int, int, int, str]] = []  # (c0, c1, remaining, text)
    for row in rows_el:
        out: list[str | None] = [None] * max(ncols, 1)

        def put(c0: int, c1: int, text: str) -> None:
            nonlocal out
            if c1 >= len(out):
                out.extend([None] * (c1 + 1 - len(out)))
            for c in range(c0, c1 + 1):
                out[c] = text

        new_carry: list[tuple[int, int, int, str]] = []
        for (c0, c1, rem, text) in carry:
            put(c0, c1, text)
            if rem > 1:
                new_carry.append((c0, c1, rem - 1, text))
        carry = new_carry
        cursor = 0
        for e in row:
            if _local(e.tag) != "entry":
                continue
            text = _text_of(e)
            st = e.get("namest")
            en = e.get("nameend")
            cn = e.get("colname")
            if st and en and st in col_of and en in col_of:
                c0, c1 = col_of[st], col_of[en]
            elif cn and cn in col_of:
                c0 = c1 = col_of[cn]
            else:
                while cursor < len(out) and out[cursor] is not None:
                    cursor += 1
                c0 = c1 = cursor
            put(c0, c1, text)
            cursor = c1 + 1
            mr = e.get("morerows")
            if mr and mr.isdigit() and int(mr) > 0:
                carry.append((c0, c1, int(mr), text))
        if any(v is not None for v in out):
            grid.append(out)
    width = max((len(r) for r in grid), default=0)
    return [[("" if v is None else v) for v in r] + [""] * (width - len(r))
            for r in grid]


_V2_SKIP_TEXT = {"CWU"}  # tables/chemicals/formulas never join paragraph text


def _v2_text(el: ET.Element) -> str:
    """Joined PDAT descendant text, skipping CWU complex work units — the
    GrantV2 handler only accumulates characters inside PDAT wrappers
    (uspto_backend.py:630-646,788-799)."""
    parts: list[str] = []

    def walk(e: ET.Element) -> None:
        name = _local(e.tag)
        if name in _V2_SKIP_TEXT or name == "table":
            return
        if name == "PDAT" and e.text:
            parts.append(e.text)
        for ch in e:
            walk(ch)

    walk(el)
    return _clean("".join(parts))


def _extract_uspto_grant_v2(root: ET.Element) -> list[Span]:
    """USPTO Grant Full Text v2.5 (2002-2004, <PATDOC> root) — behavior
    parity with PatentUsptoGrantV2 (uspto_backend.py:567-924): B540 →
    title, SDOAB → ABSTRACT heading + one merged paragraph, PARA → text,
    H (outside SDOCL) → section_header, CL/CLM → CLAIMS heading + one
    text item per claim, <table> → grid span via the CALS parser."""
    spans: list[Span] = []
    # NB: explicit None test — an ET.Element with no children is falsy
    title_el = _find_local(root, "B540")
    title = _v2_text(title_el) if title_el is not None else ""
    if title:
        spans.append(("title", title, ""))
    abstract_el = _find_local(root, "SDOAB")
    if abstract_el is not None:
        abstract = _v2_text(abstract_el)
        if abstract:
            spans.append(("section_header", "ABSTRACT", ""))
            spans.append(("text", abstract, ""))

    def walk_body(el: ET.Element, in_sdocl: bool) -> None:
        for ch in el:
            name = _local(ch.tag)
            if name in ("SDOAB", "B500", "B100", "B200"):  # biblio/abstract
                continue
            if name == "SDOCL":
                walk_body(ch, True)
                continue
            if name == "CL":
                claims = [t for t in (_v2_text(c)
                                      for c in _findall_local(ch, "CLM")) if t]
                if claims:
                    spans.append(("section_header", "CLAIMS", ""))
                    spans.extend(("text", c, "") for c in claims)
                continue
            if name == "H":
                t = _v2_text(ch)
                if t and not in_sdocl:  # claims-statement headings skipped
                    spans.append(("section_header", t, ""))
                continue
            if name == "PARA":
                t = _v2_text(ch)
                if t:
                    spans.append(("text", t, ""))
                # tables ride inside paragraphs
                for tbl in _findall_local(ch, "table"):
                    grid = _cals_table_grid(tbl)
                    if grid:
                        spans.append(("table", "", grid_media_ref(grid)))
                continue
            if name == "table":
                grid = _cals_table_grid(ch)
                if grid:
                    spans.append(("table", "", grid_media_ref(grid)))
                continue
            walk_body(ch, in_sdocl)

    walk_body(root, False)
    return spans


def _app_v1_text(el: ET.Element, *, skip: tuple[str, ...] = ("table",
                                                             "math-cwu")) -> str:
    """Joined text excluding embedded tables/formulas (the AppV1 handler
    registers table and math-cwu as non-text, uspto_backend.py:1216-1224)."""
    parts: list[str] = []

    def walk(e: ET.Element) -> None:
        if _local(e.tag) in skip:
            return
        if e.text:
            parts.append(e.text)
        for ch in e:
            walk(ch)
            if ch.tail:
                parts.append(ch.tail)

    walk(el)
    return _clean("".join(parts))


def _extract_uspto_app_v1(root: ET.Element) -> list[Span]:
    """USPTO Application Full Text v1.x (2001-2004,
    <patent-application-publication> root) — parity with PatentUsptoAppV1
    (uspto_backend.py:1141-1494): title-of-invention → title,
    subdoc-abstract → ABSTRACT heading + one merged paragraph, heading →
    section_header, paragraph → text, subdoc-claims → CLAIMS heading +
    one text item per claim (claim-text joined), tables → grid spans."""
    spans: list[Span] = []
    title_el = _find_local(root, "title-of-invention")
    title = _app_v1_text(title_el) if title_el is not None else ""
    if title:
        spans.append(("title", title, ""))
    abstract_el = _find_local(root, "subdoc-abstract")
    if abstract_el is not None:
        abstract = _app_v1_text(abstract_el)
        if abstract:
            spans.append(("section_header", "ABSTRACT", ""))
            spans.append(("text", abstract, ""))

    def walk_body(el: ET.Element) -> None:
        for ch in el:
            name = _local(ch.tag)
            if name in ("subdoc-abstract", "subdoc-bibliographic-information"):
                continue
            if name == "subdoc-claims":
                claims = []
                for c in _findall_local(ch, "claim"):
                    # only DIRECT claim-text children: a nested claim-text's
                    # text is already inside its parent's subtree join
                    t = _clean(" ".join(
                        _app_v1_text(ct) for ct in c
                        if _local(ct.tag) == "claim-text"))
                    if t:
                        claims.append(t)
                if claims:
                    spans.append(("section_header", "CLAIMS", ""))
                    spans.extend(("text", c, "") for c in claims)
                continue
            if name == "heading":
                t = _app_v1_text(ch)
                if t:
                    spans.append(("section_header", t, ""))
                continue
            if name == "paragraph":
                t = _app_v1_text(ch)
                if t:
                    spans.append(("text", t, ""))
                for tbl in _findall_local(ch, "table"):
                    grid = _cals_table_grid(tbl)
                    if grid:
                        spans.append(("table", "", grid_media_ref(grid)))
                continue
            if name == "table":
                grid = _cals_table_grid(ch)
                if grid:
                    spans.append(("table", "", grid_media_ref(grid)))
                continue
            walk_body(ch)

    walk_body(root)
    return spans


_ENTITY_RE = re.compile(r"&(?!amp;|lt;|gt;|quot;|apos;|#)(\w+);")


def _parse_lenient(raw: str) -> ET.Element:
    """USPTO v1/v2 files lean on DTD entities (&num;, &excl;, Greek names)
    that ElementTree rejects; on an undefined-entity parse error, unescape
    the known HTML names and drop the rest, then retry."""
    try:
        return ET.fromstring(raw)
    except ET.ParseError:
        import html as _html

        def sub(m: re.Match) -> str:
            un = _html.unescape(m.group(0))
            return un if un != m.group(0) else ""

        return ET.fromstring(_ENTITY_RE.sub(sub, raw))


def extract_uspto(raw: str) -> list[Span]:
    """USPTO dispatcher: APS plain text (PATN header) vs XML dialects —
    the reference's doctype probe (uspto_backend.py:112-155). All four
    reference dialects are covered: ICE grant/application v4.x (generic
    shape below), Grant APS, Grant v2.5 (PATDOC), Application v1.x."""
    if raw.lstrip().startswith("PATN"):
        return _extract_uspto_aps(raw)
    root = _parse_lenient(raw)
    root_name = _local(root.tag)
    if root_name == "PATDOC":
        return _extract_uspto_grant_v2(root)
    if root_name == "patent-application-publication":
        return _extract_uspto_app_v1(root)
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
    """XBRL instance → title + text blocks + resolved fact table.

    Mirrors the reference backend's instance-level resolution
    (``docling/backend/xml/xbrl_backend.py:265-380``) without arelle:

    * contexts resolve to period text (instant date, or
      ``start - end`` for durations) and explicit dimensions
      (``DimensionLocal: MemberLocal`` from ``xbrldi:explicitMember``
      under segment/scenario, joined with ``; ``);
    * units resolve ``unitRef`` to the first measure's local name
      (numerator-first for ``divide`` units);
    * the DEI triplet DocumentType / EntityRegistrantName /
      DocumentPeriodEndDate becomes the document title
      (xbrl_backend.py:265-274);
    * ``*TextBlock`` facts carry escaped HTML — extracted through the
      HTML backend into regular spans (xbrl_backend.py:288-311);
    * every remaining fact lands in the grid with concept, period,
      unit, decimals, dimensions and value columns.
    """
    root = ET.fromstring(raw)
    contexts: dict[str, tuple[str, str]] = {}
    for ctx in _findall_local(root, "context"):
        cid = ctx.get("id", "")
        period_text = ""
        period = _find_local(ctx, "period")
        if period is not None:
            instant = _find_local(period, "instant")
            if instant is not None:
                period_text = _text_of(instant)
            else:
                start = _text_of(_find_local(period, "startDate"))
                end = _text_of(_find_local(period, "endDate"))
                if start or end:
                    period_text = f"{start} - {end}"
        dims = []
        for em in _findall_local(ctx, "explicitMember"):
            dim_local = (em.get("dimension", "") or "").split(":")[-1]
            member_local = _text_of(em).split(":")[-1]
            if dim_local or member_local:
                dims.append(f"{dim_local}: {member_local}")
        contexts[cid] = (period_text, "; ".join(dims))
    units: dict[str, str] = {}
    for unit in _findall_local(root, "unit"):
        uid = unit.get("id", "")
        measure = _find_local(unit, "measure")
        units[uid] = (_text_of(measure).split(":")[-1]
                      if measure is not None else uid)
    meta: dict[str, str] = {}
    text_blocks: list[Span] = []
    grid: list[list[str]] = [["concept", "period", "unit", "decimals",
                              "dimensions", "value"]]
    for el in root:
        name = _local(el.tag)
        if name in _XBRL_SKIP or el.get("contextRef") is None:
            continue
        if name in ("DocumentType", "EntityRegistrantName",
                    "DocumentPeriodEndDate"):
            meta[name] = _text_of(el)
        if name.endswith("TextBlock"):
            content = _text_of(el)
            if content.strip():
                from docling_ray.stages.html_extract import extract_html

                text_blocks.extend(extract_html(content))
            continue
        cref = el.get("contextRef", "")
        period_text, dims_text = contexts.get(cref, (cref, ""))
        grid.append([
            name,
            period_text,
            units.get(el.get("unitRef", ""), el.get("unitRef", "")),
            el.get("decimals", ""),
            dims_text,
            _text_of(el),
        ])
    spans: list[Span] = []
    title = " ".join(
        v for v in (meta.get("DocumentType"), meta.get("EntityRegistrantName"),
                    meta.get("DocumentPeriodEndDate")) if v).strip()
    if title:
        spans.append(("title", title, ""))
    spans.extend(text_blocks)
    if len(grid) > 1:
        spans.append(("section_header", "Facts", ""))
        spans.append(("table", "", grid_media_ref(grid)))
    return spans


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
