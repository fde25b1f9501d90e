"""Corpus IO: read/write the interleaved-document table.

Storage is Parquet (the environment has no Lance wheel; the layout mirrors a
Lance dataset — one directory of column-pruned fragments — behind this one
shim, per SURVEY.md §7: "keep a Parquet mirror of the identical schema behind
one IO shim"). ``read_corpus``/``write_corpus`` are the only places the
format is named, so swapping in ``ray.data.read_lance``/``write_lance`` is a
two-line change when the wheel is available.

``derive_corpus`` builds the bench/test corpus deterministically from the
driver-provided ``documents.parquet`` (TESTDATA.md): each source row seeds
one interleaved document whose word pool is the row's own text — no external
data, reproducible at any scale factor, synthesized in parallel inside
``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from docling_ray.pipelines.extract import add_byte_size
from docling_ray.synth import render_docs_batch


def derive_corpus(
    sf_dir: str, seed: int = 42, with_expected: bool = False,
    docs_per_row: int = 1,
) -> "ray.data.Dataset":
    """documents.parquet → interleaved corpus Dataset (doc_id, spans[, byte_size])."""
    from docling_ray.sources.tables import read_sf_table

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def render(batch: pa.Table) -> pa.Table:
        return add_byte_size(render_docs_batch(batch, seed=seed,
                                               with_expected=with_expected,
                                               docs_per_row=docs_per_row))

    return ds.map_batches(render, batch_format="pyarrow", batch_size=64)


def write_corpus(
    ds: "ray.data.Dataset", path: str, size_binned: bool = False, **kwargs
) -> None:
    """Materialize a corpus to the storage layout (partitioned parquet dir).

    ``byte_size`` is materialized as a column so downstream skew routing
    (hybrid extract) gets parquet row-group filter pushdown instead of a
    second full scan. ``size_binned=True`` additionally writes rows in
    byte-size order (tight row-group stats → precise pruning) — but note
    the measured trade: extraction cost is SUPERLINEAR in document size,
    so size-clustered blocks turn the biggest-docs blocks into stragglers
    for whole-corpus scans (fast path 3× slower on this corpus). Keep the
    default interleaved order unless downstream reads are always
    size-filtered."""
    sized = ds.map_batches(add_byte_size, batch_format="pyarrow")
    if size_binned:
        sized = sized.sort("byte_size")
    sized.write_parquet(path, **kwargs)


def read_corpus(
    path: str, columns: list[str] | None = None,
    parallelism: int | None = None,
    filter=None,
) -> "ray.data.Dataset":
    """Read a stored corpus. ``parallelism`` forces the block count — for a
    compute-bound downstream (extraction ~6ms/doc) the right block size is
    work-balanced, far below the IO-oriented 128 MiB default (which would
    coalesce small fragments into a handful of read tasks and serialize the
    pipeline). ``filter`` is a pyarrow.dataset expression pushed down to the
    parquet scan (row-group pruning) — the skew router uses it to split on
    the materialized ``byte_size`` column without a second full scan."""
    kwargs = {}
    if parallelism:
        kwargs["override_num_blocks"] = parallelism
    if path.rstrip("/").endswith(".lance"):
        return _read_lance(path, columns, filter, kwargs)
    if filter is not None:
        kwargs["filter"] = filter
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def _read_lance(path: str, columns, filter, kwargs) -> "ray.data.Dataset":
    """Lance-format corpus source (the north rule's native table format):
    delegates to ``ray.data.read_lance`` with the same column pruning and
    pushdown filter as the parquet path. Gated behind the optional
    ``pylance`` dependency — absent in this sandbox, so the parquet path
    is the tested stand-in; the seam is the extension point (same schema
    either way)."""
    try:
        import lance  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "corpus path ends in .lance but the 'pylance' package is not "
            "installed in this environment; store the corpus as parquet "
            "(write_corpus) or install pylance") from exc
    if filter is not None:
        # read_lance pushes string predicates, not pyarrow expressions
        kwargs["filter"] = str(filter)
    return ray.data.read_lance(path, columns=columns, **kwargs)


def derive_corpus_stored(
    sf_dir: str, seed: int = 42, docs_per_row: int = 1,
    root: str = "/tmp/docling_ray_corpus",
) -> str:
    """Derive the corpus once and store it (partitioned parquet with
    ``byte_size`` materialized), returning the path. Cached by
    (sf, seed, docs_per_row, generator fingerprint) — callers that need
    byte-size routing read it back with filter pushdown instead of
    re-rendering the corpus per branch."""
    import os

    from docling_ray.oracles import _fingerprint

    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(root, f"{tag}-s{seed}-x{docs_per_row}-{_fingerprint()}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        # atomic publish (see oracles.ensure_expected_tables): write into a
        # per-process temp dir, rename into place; concurrent callers never
        # read a half-written corpus
        tmp = f"{path}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        write_corpus(derive_corpus(sf_dir, seed=seed,
                                   docs_per_row=docs_per_row), tmp)
        from docling_ray.functions.fsutil import publish_dir

        publish_dir(tmp, path)  # self-heals a stale marker-less destination
    return path
