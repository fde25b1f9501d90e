"""OCR stage: plugin-selectable engines behind an actor-pool interface.

Mirrors the reference's OCR subsystem shape (SURVEY.md §2.3,
``docling/models/base_ocr_model.py:40-322``): rect selection over page
regions that carry no programmatic text, an engine registry
(``auto`` picks the first available — reference ``auto_ocr_model.py:27``),
and engine state loaded once per actor. No OCR library exists in this
container, so the only *available* engine is the deterministic ``fake``
engine (seeded by rect geometry) — the real-engine slots raise
``NotImplementedError`` at construction, keeping the registry, rect logic
and actor plumbing real and tested.
"""

from __future__ import annotations

import json

import pyarrow as pa

from docling_ray.functions.hashing import stable_hash64


def select_ocr_rects(page: dict) -> list[dict]:
    """pdf-aware mode (base_ocr_model.py:106-153): OCR only bitmap regions
    that no text cell overlaps."""
    rects = []
    cells = page.get("cells", [])
    for reg in page.get("images", []):
        covered = any(
            reg["l"] <= 0.5 * (c["l"] + c["r"]) <= reg["r"]
            and reg["t"] <= 0.5 * (c["t"] + c["b"]) <= reg["b"]
            for c in cells
        )
        if not covered:
            rects.append(reg)
    return rects


class _FakeEngine:
    """Deterministic stand-in: 'recognizes' a stable pseudo-word per rect."""

    def recognize(self, rect: dict) -> str:
        h = stable_hash64(f"{rect['l']:.0f},{rect['t']:.0f},{rect['r']:.0f},{rect['b']:.0f}")
        return f"ocr_{h % 100000:05d}"


def _unavailable(name: str):
    class _Missing:
        def __init__(self):
            raise NotImplementedError(
                f"OCR engine {name!r} requires a library not present in this "
                "environment"
            )

    return _Missing


ENGINES = {
    "fake": _FakeEngine,
    "easyocr": _unavailable("easyocr"),
    "tesseract": _unavailable("tesseract"),
    "rapidocr": _unavailable("rapidocr"),
}


def resolve_engine(kind: str = "auto"):
    if kind == "auto":
        for cls in ENGINES.values():
            try:
                return cls()
            except NotImplementedError:
                continue
        raise NotImplementedError("no OCR engine available")
    return ENGINES[kind]()


class OcrStage:
    """Actor-pool stage: ``map_batches(OcrStage, concurrency=N,
    batch_size=B)`` over rows carrying a ``pdf_cells`` payload column.
    Engine constructed once per actor."""

    def __init__(self, engine: str = "auto"):
        self.engine = resolve_engine(engine)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, pages, texts, rects_out = [], [], [], []
        for did, payload in zip(batch["doc_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            try:
                page = json.loads(payload)
            except json.JSONDecodeError:
                continue
            for rect in select_ocr_rects(page):
                doc_ids.append(did)
                pages.append(int(page.get("page_no", 0)))
                texts.append(self.engine.recognize(rect))
                rects_out.append(json.dumps(
                    [rect["l"], rect["t"], rect["r"], rect["b"]]))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "page_no": pa.array(pages, pa.int32()),
            "ocr_text": pa.array(texts, pa.string()),
            "rect": pa.array(rects_out, pa.string()),
        })
