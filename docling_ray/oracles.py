"""Fixture-derived expected tables for extraction-derived queries.

Three queries (``extract_summary``, ``heading_levels``,
``export_markdown``) are deterministic functions of the extraction
output, which itself must equal the synthetic generator's hand-computed
expected spans (the repo's correctness oracle — same role as the
reference's golden fixtures). This module materializes those expectations
as parquet tables so the driver's DuckDB oracle can hash-compare them:
``oracle_sql()`` builds the tables from ``expected_spans`` (never by
running the extractors) and returns ``read_parquet`` SQL over them.

What the oracle then checks end-to-end: the distributed pipeline
(derive → skew-routed extract → enrich/export) reproduces the generator
expectations through the driver's hard hash signal — previously this
was visible only to pytest. The enrichment/export functions themselves
(assign_levels, spans_to_markdown) are pinned by literal unit tests.

The output directory is keyed by a content hash of every module the
expectations depend on, so editing the generator or an export rule
invalidates the cache automatically.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_PKG = os.path.dirname(os.path.abspath(__file__))
_DEP_FILES = [
    os.path.join(_PKG, "synth.py"),
    os.path.join(_PKG, "stages", "export.py"),
    os.path.join(_PKG, "stages", "heading_hierarchy.py"),
    os.path.join(_PKG, "stages", "chunker.py"),
    os.path.join(_PKG, "stages", "html_render.py"),
    os.path.join(_PKG, "pipelines", "rag.py"),
    os.path.join(_PKG, "stages", "enrich.py"),
    os.path.join(_PKG, "stages", "kv_extract.py"),
    os.path.join(_PKG, "stages", "multimodal.py"),
    os.path.join(_PKG, "functions", "normalize.py"),
    os.path.join(_PKG, "functions", "refs.py"),
    os.path.join(_PKG, "functions", "code_language.py"),
    os.path.join(_PKG, "functions", "colorspace.py"),
    os.path.join(_PKG, "functions", "vp8.py"),
]


# bump when the set of expected tables changes (cache layout version)
_LAYOUT_VERSION = b"v17"


def _fingerprint() -> str:
    h = hashlib.md5(_LAYOUT_VERSION)
    for p in _DEP_FILES:
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


_SUMMARY_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("status", pa.string()),
    ("n_spans", pa.int32()),
    ("byte_size", pa.int64()),
])
_HEADINGS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("text", pa.string()),
    ("level", pa.int32()),
])
_EXPORT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("content", pa.string()),
])
_DETECT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("kind", pa.string()),
])
_CODELANG_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("code_language", pa.string()),
])
_KV_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("pair_idx", pa.int32()),
    ("key", pa.string()),
    ("value", pa.string()),
    ("source", pa.string()),
])
_OUTLINE_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("outline_idx", pa.int32()),
    ("title", pa.string()),
    ("level", pa.int32()),
    ("page_no", pa.int32()),
])
_MARKERS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("marker_idx", pa.int32()),
    ("text", pa.string()),
    ("marker", pa.string()),
])
_FIELDS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("field_idx", pa.int32()),
    ("key", pa.string()),
    ("value", pa.string()),
    ("widget", pa.string()),
])
_FMTS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("fmt_idx", pa.int32()),
    ("text", pa.string()),
    ("style", pa.string()),
    ("region", pa.string()),
])
_LINKS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("link_idx", pa.int32()),
    ("text", pa.string()),
    ("href", pa.string()),
    ("region", pa.string()),
])
_MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("pixel_mean", pa.float64()),
])
_PICDESC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("media_ref", pa.string()),
    ("description", pa.string()),
])
_CHART_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("media_ref", pa.string()),
    ("chart_type", pa.string()),
    ("data", pa.string()),
])
_RAG_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("chunk_idx", pa.int32()),
    ("sim_e6", pa.int64()),
])
_BBOX_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("page_no", pa.int32()),
    ("l", pa.float64()),
    ("t", pa.float64()),
    ("r", pa.float64()),
    ("b", pa.float64()),
])
_CHUNKS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("chunk_idx", pa.int32()),
    ("text", pa.string()),
    ("headings", pa.string()),
    ("n_tokens", pa.int32()),
])
_IMAGE_META_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("mode", pa.string()),
    ("fingerprint", pa.string()),
])
_AV_META_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("seq", pa.int32()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
])
_PICCLS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("offset", pa.int32()),
    ("media_ref", pa.string()),
    ("predicted_class", pa.string()),
])


def ensure_expected_tables(
    sf_dir: str, seed: int = 42,
    root: str = "/tmp/docling_ray_expected",
) -> str:
    """Build (once, cached) the expected parquet tables for ``sf_dir``.
    Returns the directory containing ``extract_summary.parquet``,
    ``heading_levels.parquet``, ``export_markdown.parquet``."""
    from docling_ray.functions.code_language import detect_code_language
    from docling_ray.stages.enrich import (
        _iter_pictures_with_captions,
        classify_picture,
        describe_picture,
        extract_chart_table,
    )
    from docling_ray.stages.chunker import hybrid_chunks
    from docling_ray.stages.html_render import layout_spans
    from docling_ray.pipelines.rag import embed_text, rag_query_vector
    from docling_ray.stages.export import (
        spans_to_chunks,
        spans_to_html,
        spans_to_markdown,
    )
    from docling_ray.stages.kv_extract import mine_pairs
    from docling_ray.stages.multimodal import MediaFeatureExtractor
    from docling_ray.stages.heading_hierarchy import assign_levels
    from docling_ray.synth import render_docs_batch

    tag = sf_dir.strip("/").replace("/", "_")
    final = os.path.join(root, f"{tag}-s{seed}-{_fingerprint()}")
    marker = os.path.join(final, "_SUCCESS")
    if os.path.exists(marker):
        return final
    # atomic publish: build under a per-process temp dir, then rename into
    # place — a concurrent bench/oracle run either sees the complete
    # published dir or none of it, never a half-written parquet set
    out = f"{final}.tmp-{os.getpid()}"
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    summaries, headings, exports, detects = [], [], [], []
    codelangs, piccls, kvpairs, media, links, fmts = [], [], [], [], [], []
    outlines, picdescs, charts, markers = [], [], [], []
    formfields = []
    imgmeta, hybchunks, exp_html, exp_chunks, bboxes = [], [], [], [], []
    avmeta = []
    rag_rows = []
    rag_query = rag_query_vector()
    feat = MediaFeatureExtractor()
    for i in range(0, docs.num_rows, 64):
        rend = render_docs_batch(docs.slice(i, 64), seed=seed,
                                 with_expected=True)
        for row in rend.to_pylist():
            for s in row["spans"]:  # generator-known kind per input span
                detects.append({"doc_id": row["doc_id"],
                                "offset": s["offset"], "kind": s["kind"]})
            spans = row["expected_spans"]
            byte_size = sum(len((s["text"] or "").encode("utf-8"))
                            for s in row["spans"])
            summaries.append({
                "doc_id": row["doc_id"],
                "status": row["expected_status"],
                "n_spans": len(spans),
                "byte_size": byte_size,
            })
            for off, text, lvl in assign_levels(spans):
                headings.append({"doc_id": row["doc_id"], "offset": off,
                                 "text": text, "level": lvl})
            exports.append({"doc_id": row["doc_id"],
                            "content": spans_to_markdown(spans)})
            exp_html.append({"doc_id": row["doc_id"],
                             "content": spans_to_html(spans)})
            exp_chunks.append({"doc_id": row["doc_id"],
                               "content": spans_to_chunks(spans)})
            for idx, s in enumerate(spans):
                if s["kind"] == "code":
                    ref = s["media_ref"] or ""
                    hint = ref[5:] if ref.startswith("lang:") else None
                    codelangs.append({
                        "doc_id": row["doc_id"], "offset": s["offset"],
                        "code_language": detect_code_language(s["text"],
                                                              hint)})
            for j, (key, value, source) in enumerate(mine_pairs(spans)):
                kvpairs.append({"doc_id": row["doc_id"], "pair_idx": j,
                                "key": key, "value": value,
                                "source": source})
            for j, ln in enumerate(row.get("expected_links") or []):
                links.append({"doc_id": row["doc_id"], "link_idx": j,
                              "text": ln["text"], "href": ln["href"],
                              "region": ln["region"]})
            for j, ol in enumerate(row.get("expected_outline") or []):
                outlines.append({"doc_id": row["doc_id"], "outline_idx": j,
                                 "title": ol["title"], "level": ol["level"],
                                 "page_no": ol["page_no"]})
            for j, mk in enumerate(row.get("expected_markers") or []):
                markers.append({"doc_id": row["doc_id"], "marker_idx": j,
                                "text": mk["text"], "marker": mk["marker"]})
            for j, fd in enumerate(row.get("expected_fields") or []):
                formfields.append({"doc_id": row["doc_id"], "field_idx": j,
                                   "key": fd["key"], "value": fd["value"],
                                   "widget": fd["widget"]})
            for j, fm in enumerate(row.get("expected_fmts") or []):
                fmts.append({"doc_id": row["doc_id"], "fmt_idx": j,
                             "text": fm["text"], "style": fm["style"],
                             "region": fm["region"]})
            for rect in layout_spans(spans):
                bboxes.append({"doc_id": row["doc_id"], **rect})
            for j, c in enumerate(hybrid_chunks(spans)):
                hybchunks.append({
                    "doc_id": row["doc_id"], "chunk_idx": j,
                    "text": c["text"],
                    "headings": " / ".join(c["headings"]),
                    "n_tokens": c["n_tokens"]})
                head = " / ".join(c["headings"])
                ctx = f"{head}\n{c['text']}" if head else c["text"]
                sim = float(embed_text(ctx) @ rag_query)
                rag_rows.append({
                    "doc_id": row["doc_id"], "chunk_idx": j,
                    "sim_e6": int(np.floor(sim * 1_000_000.0))})
            av_seq = 0
            for s_ in spans:
                if s_["kind"].startswith(("audio_", "video_")):
                    avmeta.append({"doc_id": row["doc_id"],
                                   "seq": av_seq, "kind": s_["kind"],
                                   "text": s_["text"],
                                   "media_ref": s_["media_ref"]})
                    av_seq += 1
            for s_ in spans:
                ref = s_["media_ref"] or ""
                if s_["kind"] == "picture" and ref.startswith("imgpx://"):
                    geom, mode_, fp = ref[8:].split("/")
                    w_, h_ = geom.split("x")
                    imgmeta.append({"doc_id": row["doc_id"],
                                    "width": int(w_), "height": int(h_),
                                    "mode": mode_, "fingerprint": fp})
            pic_rows = pa.table({
                "doc_id": pa.array(
                    [row["doc_id"]] * sum(1 for s in spans
                                          if s["kind"] == "picture"
                                          and s["media_ref"])),
                "media_ref": pa.array([s["media_ref"] for s in spans
                                       if s["kind"] == "picture"
                                       and s["media_ref"]]),
            })
            if pic_rows.num_rows:
                media.extend(feat(pic_rows).select(
                    ["doc_id", "media_ref", "pixel_mean"]).to_pylist())
            for s, cap in _iter_pictures_with_captions(spans):
                piccls.append({
                    "doc_id": row["doc_id"], "offset": s["offset"],
                    "media_ref": s["media_ref"],
                    "predicted_class": classify_picture(s["media_ref"],
                                                        cap)})
                picdescs.append({
                    "doc_id": row["doc_id"], "offset": s["offset"],
                    "media_ref": s["media_ref"],
                    "description": describe_picture(s["media_ref"], cap)})
                ctype, data = extract_chart_table(s["media_ref"], cap)
                if ctype:
                    charts.append({
                        "doc_id": row["doc_id"], "offset": s["offset"],
                        "media_ref": s["media_ref"],
                        "chart_type": ctype, "data": data})

    pq.write_table(pa.Table.from_pylist(summaries, schema=_SUMMARY_SCHEMA),
                   os.path.join(out, "extract_summary.parquet"))
    pq.write_table(pa.Table.from_pylist(headings, schema=_HEADINGS_SCHEMA),
                   os.path.join(out, "heading_levels.parquet"))
    pq.write_table(pa.Table.from_pylist(exports, schema=_EXPORT_SCHEMA),
                   os.path.join(out, "export_markdown.parquet"))
    pq.write_table(pa.Table.from_pylist(detects, schema=_DETECT_SCHEMA),
                   os.path.join(out, "detect_format.parquet"))
    pq.write_table(pa.Table.from_pylist(codelangs, schema=_CODELANG_SCHEMA),
                   os.path.join(out, "code_langs.parquet"))
    pq.write_table(pa.Table.from_pylist(piccls, schema=_PICCLS_SCHEMA),
                   os.path.join(out, "picture_classes.parquet"))
    pq.write_table(pa.Table.from_pylist(kvpairs, schema=_KV_SCHEMA),
                   os.path.join(out, "kv_pairs.parquet"))
    pq.write_table(pa.Table.from_pylist(media, schema=_MEDIA_SCHEMA),
                   os.path.join(out, "media_features.parquet"))
    pq.write_table(pa.Table.from_pylist(links, schema=_LINKS_SCHEMA),
                   os.path.join(out, "hyperlinks.parquet"))
    pq.write_table(pa.Table.from_pylist(fmts, schema=_FMTS_SCHEMA),
                   os.path.join(out, "formatting.parquet"))
    pq.write_table(pa.Table.from_pylist(outlines, schema=_OUTLINE_SCHEMA),
                   os.path.join(out, "pdf_outline.parquet"))
    pq.write_table(pa.Table.from_pylist(picdescs, schema=_PICDESC_SCHEMA),
                   os.path.join(out, "picture_descriptions.parquet"))
    pq.write_table(pa.Table.from_pylist(charts, schema=_CHART_SCHEMA),
                   os.path.join(out, "chart_tables.parquet"))
    pq.write_table(pa.Table.from_pylist(markers, schema=_MARKERS_SCHEMA),
                   os.path.join(out, "list_markers.parquet"))
    pq.write_table(pa.Table.from_pylist(formfields, schema=_FIELDS_SCHEMA),
                   os.path.join(out, "form_fields.parquet"))
    pq.write_table(pa.Table.from_pylist(imgmeta, schema=_IMAGE_META_SCHEMA),
                   os.path.join(out, "image_meta.parquet"))
    pq.write_table(pa.Table.from_pylist(avmeta, schema=_AV_META_SCHEMA),
                   os.path.join(out, "av_meta.parquet"))
    pq.write_table(pa.Table.from_pylist(hybchunks, schema=_CHUNKS_SCHEMA),
                   os.path.join(out, "doc_chunks_hybrid.parquet"))
    pq.write_table(pa.Table.from_pylist(exp_html, schema=_EXPORT_SCHEMA),
                   os.path.join(out, "export_html.parquet"))
    pq.write_table(pa.Table.from_pylist(exp_chunks, schema=_EXPORT_SCHEMA),
                   os.path.join(out, "export_chunks.parquet"))
    pq.write_table(pa.Table.from_pylist(bboxes, schema=_BBOX_SCHEMA),
                   os.path.join(out, "render_bboxes.parquet"))
    rag_rows.sort(key=lambda r: (-r["sim_e6"], r["doc_id"],
                                 r["chunk_idx"]))
    pq.write_table(pa.Table.from_pylist(rag_rows[:20], schema=_RAG_SCHEMA),
                   os.path.join(out, "rag_topk.parquet"))
    from docling_ray.functions.fsutil import publish_dir

    # another process may publish first (ours is equivalent — discarded);
    # a stale marker-less destination is removed and the rename retried
    publish_dir(out, final)
    return final
