"""The extraction pipeline, Ray-Data-first (SURVEY.md §3.4).

Physical plans over the interleaved corpus ``(doc_id, spans)``:

  * **fast path** — one stateless ``map_batches`` stage; each document is
    extracted whole inside its batch. No shuffle. This is the default: at
    10^12-document scale extraction is embarrassingly parallel and the
    streaming executor pipelines read → extract → write with backpressure.
  * **explode path** — documents explode into unit rows (one per input
    span ≈ one PDF page), units extract independently, and
    ``groupby(doc_id).map_groups`` reassembles in deterministic order —
    the one mandatory shuffle, used for documents so large that one row
    would straggle a task (the reference's page-threaded pipeline,
    ``standard_pdf_pipeline.py:578-979``, re-expressed).
  * **hybrid (skew split, the north rule's explicit answer to giant
    PDFs)** — route by ``byte_size``: small docs take the fast path, docs
    above ``big_threshold`` take the explode path, results union. Both
    branches scan the input (column-pruned, filter pushdown when
    ``byte_size`` is materialized in the corpus parquet — see
    ``sources/corpus.py``); re-scanning storage is deliberately preferred
    over shuffling every finished document through the object store.

All kernels are Arrow-in/Arrow-out (``batch_format="pyarrow"``); rows never
fail a block — errors are ``status``/``errors`` columns (see
``stages/assemble.py``).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from docling_ray import schema as S
from docling_ray.stages.assemble import assemble_units, extract_document, extract_unit

DEFAULT_BIG_THRESHOLD = 1 << 20  # 1 MiB of raw content per document


# ---------------------------------------------------------------------------
# byte-size annotation (vectorized, zero-copy over the list<struct> column)
# ---------------------------------------------------------------------------

def _row_byte_sizes(spans_col: pa.ChunkedArray | pa.ListArray) -> np.ndarray:
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    offsets = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    texts = spans_col.values.field("text")
    lens = pc.binary_length(pc.coalesce(texts, pa.scalar(""))).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(lens)])
    return cs[offsets[1:] - offsets[0]] - cs[offsets[:-1] - offsets[0]]


def add_byte_size(batch: pa.Table) -> pa.Table:
    if "byte_size" in batch.column_names:
        return batch
    return batch.append_column(
        "byte_size", pa.array(_row_byte_sizes(batch["spans"]), type=pa.int64())
    )


# ---------------------------------------------------------------------------
# fast path
# ---------------------------------------------------------------------------

def _limits() -> tuple[int, int]:
    from docling_ray.settings import options_for

    o = options_for("extract")
    return int(o.get("max_file_size", 0) or 0), \
        int(o.get("max_num_pages", 0) or 0)


def _profile_on() -> bool:
    from docling_ray.settings import options_for

    return bool(options_for("extract").get("profile", False))


def _with_profile(schema: pa.Schema) -> pa.Schema:
    """OUTPUT/UNIT schema + the opt-in extract_ms timing column
    (reference TimeRecorder parity, docling/utils/profiling.py)."""
    return schema.append(pa.field("extract_ms", pa.float64()))


def _limit_error(size: int, n_units: int,
                 max_bytes: int, max_units: int) -> str | None:
    """Document-limits check (reference DocumentLimits, settings.py:23-26
    — enforced at intake, before conversion)."""
    if max_bytes and size > max_bytes:
        return f"document exceeds max_file_size ({size} > {max_bytes})"
    if max_units and n_units > max_units:
        return f"document exceeds max_num_pages ({n_units} > {max_units})"
    return None


def extract_docs_batch(batch: pa.Table, settings_overrides=None) -> pa.Table:
    """Whole-document extraction kernel (fast path). ``settings_overrides``
    is the driver's ``settings.snapshot()`` shipped via ``fn_kwargs`` so a
    driver-side ``configure()`` reaches every worker process."""
    if settings_overrides is not None:
        from docling_ray import settings

        settings.ensure(settings_overrides)
    if "byte_size" not in batch.column_names:
        batch = add_byte_size(batch)
    max_bytes, max_units = _limits()
    profile = _profile_on()
    doc_ids = batch["doc_id"].to_pylist()
    spans_rows = batch["spans"].to_pylist()
    sizes = batch["byte_size"].to_pylist()
    out = []
    for did, spans, size in zip(doc_ids, spans_rows, sizes):
        limit_err = _limit_error(size, len(spans or []),
                                 max_bytes, max_units)
        if limit_err is not None:
            res = {"spans": [], "status": S.STATUS_FAILURE, "n_spans": 0,
                   "errors": [limit_err], "parse_score": 0.0}
            if profile:
                res["extract_ms"] = 0.0
        elif profile:
            t0 = time.perf_counter()
            res = extract_document(spans or [])
            res["extract_ms"] = (time.perf_counter() - t0) * 1000.0
        else:
            res = extract_document(spans or [])
        res["doc_id"] = did
        res["byte_size"] = size
        out.append(res)
    schema = _with_profile(S.OUTPUT_SCHEMA) if profile else S.OUTPUT_SCHEMA
    return pa.Table.from_pylist(out, schema=schema)


# ---------------------------------------------------------------------------
# explode path
# ---------------------------------------------------------------------------

_UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("unit_offset", pa.int32()),
        ("kind", pa.string()),
        ("spans", pa.list_(S.SPAN_STRUCT)),
        ("page_no", pa.int32()),
        ("score", pa.float64()),
        ("error", pa.string()),
        ("n_units", pa.int32()),
        ("byte_size", pa.int64()),
    ]
)


_RAW_UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("unit_offset", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("n_units", pa.int32()),
        ("byte_size", pa.int64()),
    ]
)


def explode_units_raw(batch: pa.Table) -> pa.Table:
    """Doc rows → RAW unit rows (one per input span, payload untouched).
    The cheap split stage of the page-parallel path: giant documents'
    units are redistributed across the cluster BEFORE extraction, so one
    multi-GB document's pages extract in parallel instead of straggling a
    single task (the reference's page-threaded pipeline,
    standard_pdf_pipeline.py:578-979, re-expressed as a shuffle of the
    rare big-doc payloads)."""
    if "byte_size" not in batch.column_names:
        batch = add_byte_size(batch)
    out = []
    for did, spans, size in zip(
        batch["doc_id"].to_pylist(),
        batch["spans"].to_pylist(),
        batch["byte_size"].to_pylist(),
    ):
        spans = spans or []
        if not spans:
            out.append({
                "doc_id": did, "unit_offset": 0, "kind": "", "text": "",
                "media_ref": "", "n_units": 0, "byte_size": size,
            })
            continue
        for s in spans:
            out.append({
                "doc_id": did,
                "unit_offset": int(s.get("offset", 0)),
                "kind": s.get("kind", ""),
                "text": s.get("text") or "",
                "media_ref": s.get("media_ref") or "",
                "n_units": len(spans),
                "byte_size": size,
            })
    return pa.Table.from_pylist(out, schema=_RAW_UNIT_SCHEMA)


def extract_units_batch(batch: pa.Table, settings_overrides=None) -> pa.Table:
    """RAW unit rows → extracted unit rows. Stateless, runs after the unit
    redistribution — payloads are dropped here, so only extracted spans
    reach the reassembly shuffle (the analogue of the reference's eager
    ``_release_page_resources``, standard_pdf_pipeline.py:689-699)."""
    if settings_overrides is not None:
        from docling_ray import settings

        settings.ensure(settings_overrides)
    max_bytes, max_units = _limits()
    profile = _profile_on()
    out = []
    for row in batch.to_pylist():
        if row["n_units"] == 0:
            rec = {
                "doc_id": row["doc_id"], "unit_offset": 0, "kind": "",
                "spans": [], "page_no": -1, "score": 1.0, "error": None,
                "n_units": 0, "byte_size": row["byte_size"],
            }
            if profile:
                rec["extract_ms"] = 0.0
            out.append(rec)
            continue
        limit_err = _limit_error(row["byte_size"], row["n_units"],
                                 max_bytes, max_units)
        t0 = time.perf_counter() if profile else 0.0
        if limit_err is not None:  # intake limits, no extraction work
            unit_spans, page_no, score, err = [], -1, 0.0, limit_err
        else:
            unit_spans, page_no, score, err = extract_unit(
                row["kind"], row["text"], row["media_ref"]
            )
        rec = {
            "doc_id": row["doc_id"],
            "unit_offset": row["unit_offset"],
            "kind": row["kind"],
            "spans": S.spans_to_arrow(unit_spans),
            "page_no": page_no,
            "score": score,
            "error": err,
            "n_units": row["n_units"],
            "byte_size": row["byte_size"],
        }
        if profile:
            rec["extract_ms"] = (time.perf_counter() - t0) * 1000.0
        out.append(rec)
    schema = _with_profile(_UNIT_SCHEMA) if profile else _UNIT_SCHEMA
    return pa.Table.from_pylist(out, schema=schema)


def reassemble_group(group) -> "pa.Table":
    """``map_groups`` kernel: one document's unit rows → one output row.
    Deterministic ordering is re-established here (never block arrival
    order) — see assemble_units."""
    import pandas as pd  # noqa: F401  (map_groups hands us a DataFrame)

    doc_id = group["doc_id"].iloc[0]
    byte_size = int(group["byte_size"].iloc[0])
    n_units = int(group["n_units"].iloc[0])
    units = []
    if n_units > 0:
        for row in group.itertuples(index=False):
            raw = row.spans if row.spans is not None else []
            spans = [(s["kind"], s["text"], s["media_ref"]) for s in raw]
            err = row.error if isinstance(row.error, str) else None
            units.append(
                (int(row.unit_offset), row.kind, spans, int(row.page_no),
                 float(row.score), err)
            )
    res = assemble_units(units)
    res["doc_id"] = doc_id
    res["byte_size"] = byte_size
    if "extract_ms" in group.columns:  # profile on: doc time = Σ unit time
        res["extract_ms"] = float(group["extract_ms"].sum())
        return pa.Table.from_pylist(
            [res], schema=_with_profile(S.OUTPUT_SCHEMA))
    return pa.Table.from_pylist([res], schema=S.OUTPUT_SCHEMA)


# ---------------------------------------------------------------------------
# public pipeline
# ---------------------------------------------------------------------------

def extract_corpus(
    ds: "ray.data.Dataset",
    mode: str = "fast",
    big_threshold: int = DEFAULT_BIG_THRESHOLD,
    batch_size: int = 32,
) -> "ray.data.Dataset":
    """Interleaved corpus → extracted span rows (OUTPUT_SCHEMA).

    mode:
      * ``"fast"``    — single stateless map stage, no shuffle (default).
      * ``"explode"`` — page-parallel with groupby(doc_id) reassembly.
      * ``"hybrid"``  — byte-size routed: fast for small docs, explode for
        giant ones (> big_threshold), union (the skew split).
    """
    if mode == "fast":
        from docling_ray import settings

        return ds.map_batches(
            extract_docs_batch, batch_format="pyarrow", batch_size=batch_size,
            fn_kwargs={"settings_overrides": settings.snapshot()},
        )
    if mode == "explode":
        return _explode_pipeline(ds, batch_size)
    if mode == "hybrid":
        # NOTE: both filter branches re-execute the upstream lineage (a Ray
        # Data dataset consumed twice recomputes) — fine for a cheap stored
        # read, 2× waste for a derived/rendered input. When the corpus is
        # stored parquet with byte_size materialized, use
        # :func:`extract_corpus_stored` instead: two PRUNED reads with
        # filter pushdown, no recompute.
        sized = ds.map_batches(add_byte_size, batch_format="pyarrow")
        small = sized.map_batches(
            lambda t: t.filter(pc.less_equal(t["byte_size"], big_threshold)),
            batch_format="pyarrow",
        )
        big = sized.map_batches(
            lambda t: t.filter(pc.greater(t["byte_size"], big_threshold)),
            batch_format="pyarrow",
        )
        return _hybrid_union(small, big, batch_size)
    raise ValueError(f"unknown mode: {mode!r}")


def _explode_pipeline(ds, batch_size: int):
    """split → redistribute raw units → extract → reassemble."""
    raw = ds.map_batches(explode_units_raw, batch_format="pyarrow",
                         batch_size=max(1, batch_size // 4))
    # redistribute so one giant doc's units land on many tasks; the unit
    # count is unknown at plan time, so spread to CPU-scale block count
    import ray as _ray

    n_blocks = max(8, int(_ray.cluster_resources().get("CPU", 8)) * 2)
    raw = raw.repartition(n_blocks)
    from docling_ray import settings

    units = raw.map_batches(extract_units_batch, batch_format="pyarrow",
                            batch_size=4,
                            fn_kwargs={"settings_overrides":
                                       settings.snapshot()})
    return units.groupby("doc_id").map_groups(
        reassemble_group, batch_format="pandas"
    )


def _hybrid_union(small, big, batch_size: int):
    from docling_ray import settings

    small_out = small.map_batches(
        extract_docs_batch, batch_format="pyarrow", batch_size=batch_size,
        fn_kwargs={"settings_overrides": settings.snapshot()},
    )
    return small_out.union(_explode_pipeline(big, batch_size))


def extract_corpus_stored(
    path: str,
    mode: str = "hybrid",
    big_threshold: int = DEFAULT_BIG_THRESHOLD,
    batch_size: int = 32,
    parallelism: int | None = None,
) -> "ray.data.Dataset":
    """Extraction over a STORED corpus (``sources/corpus.write_corpus``
    layout, ``byte_size`` materialized). The hybrid skew split becomes two
    parquet reads with ``byte_size`` filter pushdown — row groups outside
    each branch's range are pruned at the scan, and nothing upstream is
    executed twice (the fix for the derived-input double-scan)."""
    import pyarrow.dataset as pads

    from docling_ray.sources.corpus import read_corpus

    if mode != "hybrid":
        return extract_corpus(read_corpus(path, parallelism=parallelism),
                              mode=mode, big_threshold=big_threshold,
                              batch_size=batch_size)
    small = read_corpus(path, parallelism=parallelism,
                        filter=pads.field("byte_size") <= big_threshold)
    # the big side is few rows but heavy per row — force many read tasks
    # too, or the pushdown read coalesces it into one serial block
    big = read_corpus(path, parallelism=parallelism,
                      filter=pads.field("byte_size") > big_threshold)
    return _hybrid_union(small, big, batch_size)


# ---------------------------------------------------------------------------
# byte-balanced block splitting (the explicit size-binned repartition)
# ---------------------------------------------------------------------------

def extract_corpus_stored_write(
    path: str,
    out_dir: str,
    mode: str = "hybrid",
    big_threshold: int = DEFAULT_BIG_THRESHOLD,
    batch_size: int = 32,
    parallelism: int | None = None,
) -> None:
    """Terminal form of the stored-corpus extraction: extract and write
    partitioned parquet. In hybrid mode the two branches execute
    CONCURRENTLY (two driver threads, each its own streaming execution)
    writing into the same sink — ``Dataset.union`` pulls its inputs
    sequentially in the current streaming executor, which would make the
    skew split additive instead of overlapped; two independent executions
    give wall ≈ max(branch walls). File names are uuid-unique per write,
    so a shared sink directory is safe."""
    import pyarrow.dataset as pads

    from docling_ray.sources.corpus import read_corpus

    if mode != "hybrid":
        extract_corpus(read_corpus(path, parallelism=parallelism),
                       mode=mode, big_threshold=big_threshold,
                       batch_size=batch_size).write_parquet(out_dir)
        return
    small = read_corpus(path, parallelism=parallelism,
                        filter=pads.field("byte_size") <= big_threshold)
    big = read_corpus(path, parallelism=parallelism,
                      filter=pads.field("byte_size") > big_threshold)
    small_out = small.map_batches(
        extract_docs_batch, batch_format="pyarrow", batch_size=batch_size
    )
    big_out = _explode_pipeline(big, batch_size)

    import threading

    # The write path probes fsspec's HTTP filesystem lazily; with aiohttp
    # absent that import fails, and two threads racing the failed import
    # surface a plain ImportError that ray's probe doesn't catch. Pre-seed
    # a placeholder module so the probe resolves deterministically (its
    # isinstance check is then simply False for local filesystems).
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import sys
        import types

        _mod = types.ModuleType("fsspec.implementations.http")

        class _NeverHTTPFileSystem:
            pass

        _mod.HTTPFileSystem = _NeverHTTPFileSystem
        sys.modules.setdefault("fsspec.implementations.http", _mod)

    errs: list[BaseException] = []

    def run(ds) -> None:
        try:
            ds.write_parquet(out_dir)
        except BaseException as e:  # surfaced after join
            errs.append(e)

    threads = [threading.Thread(target=run, args=(d,))
               for d in (small_out, big_out)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]


def rebalance_by_bytes(
    ds: "ray.data.Dataset", target_bytes: int = 4 << 20
) -> "ray.data.Dataset":
    """Byte-balanced block re-cut: repartition so the average block carries
    ~``target_bytes`` of document content.

    Bounded by design: the driver sees only ONE (rows, bytes) partial per
    input batch (a distributed aggregate), never the per-document sizes —
    at 10^12 docs that is thousands of scalars, not terabytes (the
    redesign of the old exact-cut implementation, which gathered every
    document's byte_size to the driver and built an O(cuts)-deep union
    plan). The block count comes from total_bytes / target_bytes;
    ``repartition`` then splits evenly by rows. Exact giant-document
    ISOLATION is not this helper's job — that is the hybrid/explode route
    (the skew split), and the warehouse-scale default is writing the
    corpus with byte_size materialized at derivation time
    (``sources/corpus.write_corpus``)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        sized = add_byte_size(batch)
        return pa.table({
            "rows": pa.array([batch.num_rows], pa.int64()),
            "bytes": pa.array(
                [int(pc.sum(sized["byte_size"]).as_py() or 0)], pa.int64()),
        })

    totals = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("rows", alias_name="rows"), Sum("bytes", alias_name="bytes"))
    total_bytes = int(totals["bytes"] or 0)
    n_blocks = max(1, total_bytes // target_bytes)
    return ds.repartition(n_blocks)
