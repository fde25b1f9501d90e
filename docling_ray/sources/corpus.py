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
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def render(batch: pa.Table) -> pa.Table:
        return add_byte_size(render_docs_batch(batch, seed=seed,
                                               with_expected=with_expected,
                                               docs_per_row=docs_per_row))

    return ds.map_batches(render, batch_format="pyarrow", batch_size=64)


def write_corpus(ds: "ray.data.Dataset", path: str, **kwargs) -> None:
    """Materialize a corpus to the storage layout (partitioned parquet dir).

    ``byte_size`` is materialized as a column so downstream skew routing
    (hybrid extract) gets parquet row-group filter pushdown instead of a
    second full scan."""
    ds.map_batches(add_byte_size, batch_format="pyarrow").write_parquet(
        path, **kwargs
    )


def read_corpus(
    path: str, columns: list[str] | None = None,
    parallelism: int | None = None,
) -> "ray.data.Dataset":
    """Read a stored corpus. ``parallelism`` forces the block count — for a
    compute-bound downstream (extraction ~6ms/doc) the right block size is
    work-balanced, far below the IO-oriented 128 MiB default (which would
    coalesce small fragments into a handful of read tasks and serialize the
    pipeline)."""
    kwargs = {}
    if parallelism:
        kwargs["override_num_blocks"] = parallelism
    return ray.data.read_parquet(path, columns=columns, **kwargs)
