"""Resumable partitioned runs: per-partition commits + lineage/metrics.

The north rule requires runs over 10^12 documents to be resumable with
per-partition lineage and metrics (the reference's only persistence is a
zip-of-JSONs per document, ``ConversionAssets.save/load``,
``docling/datamodel/document.py:431-584`` — that does not scale; this is
the distributed redesign).

Layout under ``out_dir``::

    part=0000/ ... part=NNNN/      extracted span rows (parquet fragments)
    _manifest/shard-0000.json ...  one lineage+metrics record per finished shard

A shard = the documents whose ``stable_hash64(doc_id) % num_shards`` equals
the shard id — deterministic, independent of input file layout. Each shard
is one streamed Ray Data job: read (pruned) → extract → write to a temp dir
→ atomic rename → manifest record. Resume = skip shards whose manifest
record exists (the anti-join against the manifest, SURVEY.md §7.1 step 5).
A killed run loses at most one in-flight shard and its temp dir.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa

import ray.data

from docling_ray import __version__
from docling_ray.functions.hashing import stable_hash64
from docling_ray.pipelines.extract import extract_corpus


def _shard_filter(num_shards: int, shard: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        mask = np.fromiter(
            (stable_hash64(d) % num_shards == shard for d in ids),
            dtype=bool, count=len(ids),
        )
        return batch.filter(pa.array(mask))
    return fn


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _shard_record_path(out_dir: str, shard: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"shard-{shard:04d}.json")


def completed_shards(out_dir: str) -> set[int]:
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("shard-") and name.endswith(".json"):
            out.add(int(name[len("shard-"):-len(".json")]))
    return out


def run_resumable(
    corpus_path: str,
    out_dir: str,
    num_shards: int = 8,
    mode: str = "hybrid",
    batch_size: int = 32,
) -> list[dict]:
    """Run (or resume) extraction over a stored corpus. Returns the manifest
    records of all shards (previously finished + newly computed)."""
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    done = completed_shards(out_dir)
    if done:
        # Resume guard: the shard partitioning is a function of
        # (num_shards, corpus). Resuming with different arguments would
        # silently skip shards that happen to share an id — duplicated
        # and/or missing documents with no error. Refuse instead.
        with open(_shard_record_path(out_dir, min(done))) as f:
            prior = json.load(f)
        if prior.get("num_shards") != num_shards:
            raise ValueError(
                f"resume mismatch: {out_dir} was written with "
                f"num_shards={prior.get('num_shards')}, got {num_shards}"
            )
        if prior.get("input") != corpus_path:
            raise ValueError(
                f"resume mismatch: {out_dir} was written from "
                f"{prior.get('input')!r}, got {corpus_path!r}"
            )
    records: list[dict] = []
    for shard in range(num_shards):
        rec_path = _shard_record_path(out_dir, shard)
        if shard in done:
            with open(rec_path) as f:
                records.append(json.load(f))
            continue
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(corpus_path)
        ds = ds.map_batches(
            _shard_filter(num_shards, shard), batch_format="pyarrow"
        )
        out = extract_corpus(ds, mode=mode, batch_size=batch_size)
        part_dir = os.path.join(out_dir, f"part={shard:04d}")
        tmp_dir = os.path.join(out_dir, f".tmp-part-{shard:04d}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        out.write_parquet(tmp_dir)
        # metrics from the written shard (small: one partition's worth)
        import pyarrow.dataset as pads
        written = pads.dataset(tmp_dir, format="parquet")
        tbl = written.to_table(columns=["status", "n_spans", "byte_size"])
        statuses = tbl["status"].to_pylist()
        shutil.rmtree(part_dir, ignore_errors=True)
        os.rename(tmp_dir, part_dir)
        rec = {
            "shard": shard,
            "num_shards": num_shards,
            "input": corpus_path,
            "output": part_dir,
            "engine_version": __version__,
            "mode": mode,
            "n_docs": tbl.num_rows,
            "n_spans": int(pa.compute.sum(tbl["n_spans"]).as_py() or 0),
            "bytes_in": int(pa.compute.sum(tbl["byte_size"]).as_py() or 0),
            "status_counts": {
                s: statuses.count(s) for s in sorted(set(statuses))
            },
            "wall_sec": round(time.perf_counter() - t0, 3),
        }
        with open(rec_path + ".tmp", "w") as f:
            json.dump(rec, f)
        os.replace(rec_path + ".tmp", rec_path)
        records.append(rec)
    return records
