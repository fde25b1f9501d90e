"""Key-value / form extraction over extracted span sequences.

The reference's second public entry point is ``DocumentExtractor``
(``docling/document_extractor.py:91``): template-driven extraction of
structured key-value data, with the HTML form subsystem
(``html_backend.py:3827-4303``) feeding checkbox / field items. Its
extraction engine is a VLM; none exists in this environment, so the
engine here is a DETERMINISTIC miner over the already-extracted span
sequence — the Ray-side plumbing (template model, per-document result
rows, type casting, form-checkbox pairing) is real and tested:

  * ``Key: value`` lines in text spans (the classic form-field shape);
  * two-column tables → one pair per row (label column / value column);
  * ``checkbox_selected``/``checkbox_unselected`` spans paired with the
    immediately following text span as their label → boolean fields;
  * a template (field name → expected type) filters and casts the mined
    pairs; fields are matched on a casefolded alnum-normalized key.

Vectorized ``map_batches`` kernels over OUTPUT_SCHEMA rows.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

Span = tuple[str, str, str]

_KV_LINE_RE = re.compile(
    r"^\s*([A-Za-z][\w ()/&.-]{0,48}?)\s*:\s+(.{1,200}?)\s*$")


def _norm_key(key: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", key.casefold()).strip("_")


def mine_pairs(spans: list[dict]) -> list[tuple[str, str, str]]:
    """Span sequence → (key, value, source) triples, in reading order.
    source ∈ {"text", "table", "checkbox"}."""
    out: list[tuple[str, str, str]] = []
    for i, s in enumerate(spans):
        kind = s["kind"]
        if kind == "text":
            m = _KV_LINE_RE.match(s["text"])
            # require a short key and a non-sentence-like key (no verbs
            # heuristic: ≤5 words) to avoid mining prose with colons
            if m and len(m.group(1).split()) <= 5:
                out.append((m.group(1), m.group(2), "text"))
        elif kind == "table" and s["media_ref"].startswith("grid:"):
            try:
                grid = json.loads(s["media_ref"][len("grid:"):])
            except json.JSONDecodeError:
                continue
            cells = grid.get("cells") or []
            if cells and all(len(r) == 2 for r in cells):
                for key, value in cells:
                    if key:
                        out.append((key, value, "table"))
        elif kind in ("checkbox_selected", "checkbox_unselected"):
            label = ""
            if i + 1 < len(spans) and spans[i + 1]["kind"] == "text":
                label = spans[i + 1]["text"]
            if label:
                out.append((label,
                            "true" if kind == "checkbox_selected" else "false",
                            "checkbox"))
    return out


def _cast(value: str, typ: str):
    if typ == "int":
        m = re.search(r"[+-]?\d+", value.replace(",", ""))
        return int(m.group()) if m else None
    if typ == "float":
        m = re.search(r"[+-]?\d+(?:\.\d+)?", value.replace(",", ""))
        return float(m.group()) if m else None
    if typ == "bool":
        return value.strip().lower() in ("true", "yes", "x", "checked", "1",
                                         "on")
    return value


def apply_template(
    pairs: list[tuple[str, str, str]], template: dict[str, str],
) -> dict[str, object]:
    """Template {field: type} → {field: cast value | None}; first mined
    pair whose normalized key equals the normalized field name wins (the
    reference template semantics: every requested field present in the
    result, unmatched fields null)."""
    by_key: dict[str, tuple[str, str]] = {}
    for key, value, src in pairs:
        by_key.setdefault(_norm_key(key), (value, src))
    out: dict[str, object] = {}
    for field, typ in template.items():
        hit = by_key.get(_norm_key(field))
        out[field] = _cast(hit[0], typ) if hit else None
    return out


def kv_pairs_batch(batch: pa.Table) -> pa.Table:
    """OUTPUT_SCHEMA rows → (doc_id, pair_idx, key, value, source)."""
    doc_ids, idxs, keys, vals, srcs = [], [], [], [], []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for j, (key, value, src) in enumerate(mine_pairs(spans or [])):
            doc_ids.append(did)
            idxs.append(j)
            keys.append(key)
            vals.append(value)
            srcs.append(src)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "pair_idx": pa.array(idxs, pa.int32()),
        "key": pa.array(keys, pa.string()),
        "value": pa.array(vals, pa.string()),
        "source": pa.array(srcs, pa.string()),
    })


def extract_with_template(ds, template: dict[str, str]):
    """DocumentExtractor analogue: Dataset of extraction output →
    (doc_id, field, value) rows per template field (value as string,
    nulls kept — schema-stable regardless of match rate)."""
    import ray.data  # noqa: F401

    tmpl = dict(template)

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids, fields, values = [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            res = apply_template(mine_pairs(spans or []), tmpl)
            for field in tmpl:
                doc_ids.append(did)
                fields.append(field)
                v = res[field]
                values.append(None if v is None else str(v))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "field": pa.array(fields, pa.string()),
            "value": pa.array(values, pa.string()),
        })

    return ds.map_batches(kernel, batch_format="pyarrow")
