"""Readers for the driver-provided testdata parquet tables.

The testdata files carry a ``pandas`` schema-metadata dict (written by
``DataFrame.to_parquet``); ``hash(pyarrow.Schema)`` raises on such
metadata, which defeats Ray Data's schema-deduplication fast path and
emits a ``Failed to hash the schemas (for deduplication)`` warning per
block merge. Reading with the file's schema stripped of metadata keeps
the data identical and the schema hashable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def read_sf_table(
    sf_dir: str, table: str, columns: list[str] | None = None, **kwargs
) -> "ray.data.Dataset":
    """``read_parquet`` of ``{sf_dir}/{table}.parquet`` with a
    metadata-free schema (see module docstring). With a column projection
    the schema must be the projected one."""
    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=schema,
                                 **kwargs)
