"""CSV → table-span extractor (reference ``docling/backend/csv_backend.py:18-135``:
dialect sniff → one TableItem). The whole CSV payload becomes a single
``table`` span whose media_ref carries the canonical expanded grid, matching
the HTML/PDF table serialization."""

from __future__ import annotations

import csv
import io

from docling_ray.functions.normalize import clean_unicode, collapse_whitespace
from docling_ray.stages.html_extract import grid_media_ref

Span = tuple[str, str, str]


def extract_csv(raw: str) -> list[Span]:
    # normalize newlines first: a bare \r in an unquoted field is a hard
    # _csv.Error otherwise (found by hypothesis fuzzing)
    raw = raw.replace("\r\n", "\n").replace("\r", "\n").strip("\n")
    if not raw.strip():
        return []
    sample = raw[:4096]
    try:
        dialect: csv.Dialect | type[csv.Dialect] = csv.Sniffer().sniff(
            sample, delimiters=",;\t|"
        )
    except csv.Error:
        # sniffer needs consistent rows; fall back to the most frequent
        # candidate delimiter in the first line
        first = raw.split("\n", 1)[0]
        delim = max(",;\t|", key=first.count)

        class _Fallback(csv.excel):
            delimiter = delim

        dialect = _Fallback
    try:
        reader = csv.reader(io.StringIO(raw), dialect)
        rows = [[collapse_whitespace(clean_unicode(c)) for c in row]
                for row in reader if row]
    except csv.Error:
        # degenerate input: fall back to one column per line
        rows = [[collapse_whitespace(clean_unicode(line))]
                for line in raw.split("\n") if line.strip()]
    if not rows:
        return []
    ncols = max(len(r) for r in rows)
    grid = [r + [""] * (ncols - len(r)) for r in rows]
    return [("table", "", grid_media_ref(grid))]
