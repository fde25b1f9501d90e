"""Zip-container routing for OOXML / ODF documents.

The reference sniffs zip members to pick a backend
(``docling/datamodel/document.py:763-1108``: ``word/`` → DOCX,
``xl/`` → XLSX, ``ppt/`` → PPTX, ODF ``mimetype``) and its office
backends then walk the package parts (``msword_backend.py:244``,
``msexcel_backend.py:246`` via openpyxl's package reader,
``mspowerpoint_backend.py:96`` via python-pptx). This module is the
container layer over the existing inner-XML extractors: it unzips the
base64 payload, resolves the package structure (workbook sheet order via
``_rels``, presentation slide order via ``sldIdLst``, shared strings),
and delegates each part to ``office_xml`` / ``formats_extra`` parsers.

Payloads are base64 zip (the corpus/CLI convention for binary
containers). Errors raise ValueError/KeyError/zipfile.BadZipFile — the
assemble layer turns them into ``status="failure"`` rows (errors are
data, never exceptions escaping the stage).
"""

from __future__ import annotations

import base64
import io
import posixpath
import re
import xml.etree.ElementTree as ET
import zipfile

from docling_ray.stages.formats_extra import (
    extract_odp_xml,
    extract_ods_xml,
    extract_odt_xml,
    extract_pptx_xml,
)
from docling_ray.stages.office_xml import extract_docx_xml, extract_xlsx_xml

Span = tuple[str, str, str]

_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_R_ATTR = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}id")
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


def _open_zip(b64: str) -> zipfile.ZipFile:
    data = base64.b64decode(b64, validate=True)
    return zipfile.ZipFile(io.BytesIO(data))


def _read_text(zf: zipfile.ZipFile, name: str) -> str:
    return zf.read(name).decode("utf-8", errors="replace")


def _rels(zf: zipfile.ZipFile, part: str) -> dict[str, str]:
    """rId → target (package path relative to the part's directory) from
    the part's ``_rels/<name>.rels`` sidecar."""
    d = posixpath.dirname(part)
    rels_path = posixpath.join(d, "_rels", posixpath.basename(part) + ".rels")
    if rels_path not in zf.namelist():
        return {}
    root = ET.fromstring(_read_text(zf, rels_path))
    out: dict[str, str] = {}
    for rel in root.iter(f"{_REL_NS}Relationship"):
        rid, target = rel.get("Id"), rel.get("Target")
        if rid and target:
            out[rid] = posixpath.normpath(
                target if target.startswith("/") else
                posixpath.join(d, target)).lstrip("/")
    return out


def extract_docx(b64: str) -> list[Span]:
    """.docx container → ``word/document.xml`` → the WordprocessingML
    extractor (reference: msword_backend.py:244 over the full package)."""
    with _open_zip(b64) as zf:
        return extract_docx_xml(_read_text(zf, "word/document.xml"))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(_read_text(zf, "xl/sharedStrings.xml"))
    out: list[str] = []
    for si in root.findall(f"{_S}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    return out


def extract_xlsx(b64: str) -> list[Span]:
    """.xlsx container: workbook sheet order (``xl/workbook.xml`` +
    its rels) → one table span per worksheet, shared-strings resolved
    (reference: msexcel_backend.py:246 iterates workbook sheets in
    order)."""
    with _open_zip(b64) as zf:
        names = set(zf.namelist())
        shared = _shared_strings(zf)
        sheet_paths: list[str] = []
        if "xl/workbook.xml" in names:
            wb = ET.fromstring(_read_text(zf, "xl/workbook.xml"))
            rels = _rels(zf, "xl/workbook.xml")
            for sh in wb.iter(f"{_S}sheet"):
                target = rels.get(sh.get(_R_ATTR, ""))
                if target and target in names:
                    sheet_paths.append(target)
        if not sheet_paths:  # rels missing/broken: deterministic fallback
            sheet_paths = sorted(
                n for n in names
                if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n))
        spans: list[Span] = []
        for path in sheet_paths:
            spans.extend(extract_xlsx_xml(_read_text(zf, path),
                                          shared=shared))
        return spans


def extract_pptx(b64: str) -> list[Span]:
    """.pptx container: slide order from ``ppt/presentation.xml``'s
    ``sldIdLst`` resolved through its rels → per-slide PresentationML
    extraction (reference: mspowerpoint_backend.py:96 walks
    ``prs.slides`` in presentation order)."""
    with _open_zip(b64) as zf:
        names = set(zf.namelist())
        slide_paths: list[str] = []
        if "ppt/presentation.xml" in names:
            prs = ET.fromstring(_read_text(zf, "ppt/presentation.xml"))
            rels = _rels(zf, "ppt/presentation.xml")
            for sid in prs.iter(f"{_P}sldId"):
                target = rels.get(sid.get(_R_ATTR, ""))
                if target and target in names:
                    slide_paths.append(target)
        if not slide_paths:
            slide_paths = sorted(
                (n for n in names
                 if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
                key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)))
        spans: list[Span] = []
        for path in slide_paths:
            spans.extend(extract_pptx_xml(_read_text(zf, path)))
        return spans


_ODF_EXTRACTORS = {
    "odt": extract_odt_xml,
    "ods": extract_ods_xml,
    "odp": extract_odp_xml,
}

_ODF_MIME = {
    "application/vnd.oasis.opendocument.text": "odt",
    "application/vnd.oasis.opendocument.spreadsheet": "ods",
    "application/vnd.oasis.opendocument.presentation": "odp",
}


def odf_flavor(zf: zipfile.ZipFile) -> str | None:
    """ODF flavor from the (first, stored) ``mimetype`` member."""
    if "mimetype" not in zf.namelist():
        return None
    return _ODF_MIME.get(zf.read("mimetype").decode("ascii",
                                                    errors="replace").strip())


def _extract_odf(b64: str, flavor: str) -> list[Span]:
    """ODF package → ``content.xml`` → the flat-XML extractor for the
    flavor (reference: opendocument_backend.py:124 loads the package via
    odfdo and walks the content tree)."""
    with _open_zip(b64) as zf:
        detected = odf_flavor(zf)
        return _ODF_EXTRACTORS[detected or flavor](
            _read_text(zf, "content.xml"))


def extract_odt(b64: str) -> list[Span]:
    return _extract_odf(b64, "odt")


def extract_ods(b64: str) -> list[Span]:
    return _extract_odf(b64, "ods")


def extract_odp(b64: str) -> list[Span]:
    return _extract_odf(b64, "odp")


CONTAINER_EXTRACTORS = {
    "docx": extract_docx,
    "xlsx": extract_xlsx,
    "pptx": extract_pptx,
    "odt": extract_odt,
    "ods": extract_ods,
    "odp": extract_odp,
}


def sniff_zip_kind(blob: bytes) -> str | None:
    """Zip payload → container kind from member names, mirroring the
    reference's member sniff (document.py:763-1108). Returns None when
    the zip does not open or matches no known container."""
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            names = set(zf.namelist())
            if "document.dclg" in names:
                return "dclx"
            if "word/document.xml" in names:
                return "docx"
            if "xl/workbook.xml" in names or any(
                    n.startswith("xl/worksheets/") for n in names):
                return "xlsx"
            if "ppt/presentation.xml" in names or any(
                    n.startswith("ppt/slides/") for n in names):
                return "pptx"
            flavor = odf_flavor(zf)
            if flavor:
                return flavor
            if "META-INF/container.xml" in names:
                return "epub"
    except (zipfile.BadZipFile, OSError, ValueError, KeyError):
        return None
    return None
