"""Text normalization rules matching the reference engine's semantics.

Character-level rule sets are behavior-parity rebuilds of:
  * HTML unicode cleanup — reference ``docling/backend/html_backend.py:4568-4606``
    (``_clean_unicode``): nbsp family → space, zero-width family removed,
    dash family → ``-``, curly quotes → ASCII, ellipsis → ``...``,
    soft hyphen removed.
  * PDF cell sanitation — reference
    ``docling/models/stages/page_assemble/page_assemble_model.py:33-157``
    (``sanitize_text`` + ``_LIGATURE_MAP``): hyphenated-line merge when both
    sides are alphanumeric words, fraction-slash / curly-quote / bullet
    normalization, ligature expansion (U+FB00–FB06, IJ/ij digraphs, PUA
    U+F0A0 discard) with spurious-space absorption after fb-block ligatures.

Implementation is our own: one-pass ``str.translate`` tables + precompiled
regexes, chosen so the per-batch cost is a single C-level pass per string.
"""

from __future__ import annotations

import re

# --- HTML-side unicode cleanup (one-pass translation table) ---------------
_CLEAN_TABLE = str.maketrans(
    {
        " ": " ",   # non-breaking space
        " ": " ",   # narrow no-break space
        "​": None,  # zero-width space
        "‌": None,  # zero-width non-joiner
        "‍": None,  # zero-width joiner
        "⁠": None,  # word joiner
        "﻿": None,  # BOM / zero-width no-break space
        "­": None,  # soft hyphen
        "‐": "-",
        "‑": "-",
        "‒": "-",
        "–": "-",
        "—": "-",
        "―": "-",
        "‘": "'",
        "’": "'",
        "“": '"',
        "”": '"',
        "…": "...",
    }
)


def clean_unicode(text: str) -> str:
    """Normalize typical HTML unicode noise (parity with html_backend.py:4568)."""
    return text.translate(_CLEAN_TABLE)


_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def collapse_whitespace(text: str) -> str:
    """Collapse whitespace runs to single spaces and strip (HTML text-flow rule)."""
    return _WS_RE.sub(" ", text).strip()


# --- PDF-side sanitation ---------------------------------------------------
_LIGATURES = {
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "st",
    "ﬆ": "st",
    "Ĳ": "IJ",
    "ĳ": "ij",
    "": "",  # private-use glyph from broken PDF fonts: discard
}
# fb-block ligatures absorb one spurious following space before a word char
# ("ﬁ eld" → "field"); digraph/PUA entries keep real word boundaries.
_LIG_RE = re.compile(r"([ﬀ-ﬆĲĳ])( (?=\w))?")

_PDF_PUNCT_TABLE = str.maketrans(
    {
        "⁄": "/",   # fraction slash
        "’": "'",
        "‘": "'",
        "“": '"',
        "”": '"',
        "•": "·",  # bullet → middle dot
    }
)

_WORD_RE = re.compile(r"\b\w+\b")


def expand_ligatures(text: str) -> str:
    """Expand presentation-form ligatures, absorbing PDF-parser spurious spaces."""

    def _sub(m: re.Match) -> str:
        ch = m.group(1)
        out = _LIGATURES[ch]
        if "ﬀ" <= ch <= "ﬆ":
            return out  # absorb the captured space
        return out + (m.group(2) or "")

    return _LIG_RE.sub(_sub, text)


def merge_hyphenated_lines(lines: list[str]) -> str:
    """Join PDF text lines, merging ``exam-``/``ple`` hyphen breaks.

    A trailing ``-`` is dropped (lines joined without space) only when the
    last word before it and the first word of the next line are both
    alphanumeric. When the merge condition fails the hyphen is kept and the
    next line is appended with NO separator; only lines NOT ending in ``-``
    get a joining space. Parity with page_assemble_model.py:112-133
    (``sanitize_text``), including that no-separator failed-merge branch.
    """
    if not lines:
        return ""
    parts: list[str] = []
    for ix, line in enumerate(lines):
        if ix:
            prev = parts[-1]
            if prev.endswith("-"):
                prev_words = _WORD_RE.findall(prev)
                line_words = _WORD_RE.findall(line)
                if (
                    prev_words
                    and line_words
                    and prev_words[-1].isalnum()
                    and line_words[0].isalnum()
                ):
                    parts[-1] = prev[:-1]
            else:
                parts[-1] = prev + " "
        parts.append(line)
    return "".join(parts)


def sanitize_cell_text(lines: list[str]) -> str:
    """Full PDF cell/cluster text sanitation: hyphen merge → punctuation
    normalization → ligature expansion → strip (page_assemble_model.py:112-157).

    Fast paths are exact: every punctuation-table key and ligature char is
    non-ASCII, so ASCII text (the overwhelming majority of PDF cells) skips
    both passes; a single line needs no hyphen merge."""
    if len(lines) == 1:
        text = lines[0]
    else:
        text = merge_hyphenated_lines(lines)
    if text.isascii():
        return text.strip()
    text = text.translate(_PDF_PUNCT_TABLE)
    text = expand_ligatures(text)
    return text.strip()


# --- parse-quality garbage detectors --------------------------------------
# Parity with page_preprocessing_model.py:30-35,126-151: GLYPH<..> markers,
# /G\d+ glyph-id runs, replacement chars, fragmented single-letter words.
_GLYPH_RE = re.compile(r"GLYPH<[^>]*>")
_SLASH_G_RE = re.compile(r"(?:/G\d+){2,}")
_FRAG_RE = re.compile(r"(?:\b\w\b ){4,}")
# one cheap pre-scan: clean text (the overwhelming majority) takes a single
# regex search instead of three finditer passes
_SUSPECT_RE = re.compile(r"GLYPH<|�|/G\d|(?:\b\w\b ){4,}")
# frag proxy: any match of _FRAG_RE contains a "a b c d" shape, so this
# \b-free pattern is a strict superset and ~3x faster to scan
_FRAG_PROXY_RE = re.compile(r"\w \w \w \w")


def is_suspect_text(text: str) -> bool:
    """Cheap conservative garbage pre-scan: literal membership tests (C
    memchr speed) + a boundary-free fragment proxy. Superset of
    _SUSPECT_RE's matches — a True only routes to the exact scorer."""
    return ("GLYPH<" in text or "�" in text or "/G" in text
            or _FRAG_PROXY_RE.search(text) is not None)


def text_quality_score(text: str) -> float:
    """Heuristic parse quality in [0,1]; low for glyph-garbage PDF text."""
    if not text:
        return 0.0
    if not is_suspect_text(text):
        return 1.0
    n = len(text)
    bad = 0
    for m in _GLYPH_RE.finditer(text):
        bad += len(m.group())
    for m in _SLASH_G_RE.finditer(text):
        bad += len(m.group())
    for m in _FRAG_RE.finditer(text):
        bad += len(m.group()) // 2
    bad += text.count("�") * 4
    return max(0.0, 1.0 - bad / n)
