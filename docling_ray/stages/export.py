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
        # page_header / page_footer: furniture, skipped
    return "\n\n".join(parts)


def spans_to_text(spans: list[dict]) -> str:
    return "\n".join(
        s["text"] for s in spans
        if s["text"] and s["kind"] not in ("page_header", "page_footer")
    )


def spans_to_doctags(spans: list[dict]) -> str:
    """Compact doctags-style serialization: <kind>text</kind> per span (the
    reference's DocTags analogue, lossless for our span model)."""
    parts = []
    for s in spans:
        attr = f' ref="{s["media_ref"]}"' if s["media_ref"] else ""
        parts.append(f"<{s['kind']}{attr}>{s['text']}</{s['kind']}>")
    return "".join(parts)


_EXPORTERS = {
    "markdown": spans_to_markdown,
    "text": spans_to_text,
    "doctags": spans_to_doctags,
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
    r"<(?P<kind>[a-z_]+)(?:\s+ref=\"(?P<ref>[^\"]*)\")?>(?P<text>.*?)</(?P=kind)>",
    _re.DOTALL,
)


def parse_doctags(raw: str) -> list[tuple[str, str, str]]:
    """DocTags string → (kind, text, media_ref) spans. Inverse of
    :func:`spans_to_doctags` for our span model."""
    return [
        (m.group("kind"), m.group("text"), m.group("ref") or "")
        for m in _DOCTAG_RE.finditer(raw)
    ]
