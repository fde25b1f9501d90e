"""Resumable partitioned runs: per-partition commits + lineage/metrics.

The north rule requires runs over 10^12 documents to be resumable with
per-partition lineage and metrics (the reference's only persistence is a
zip-of-JSONs per document, ``ConversionAssets.save/load``,
``docling/datamodel/document.py:431-584`` — that does not scale; this is
the distributed redesign).

Layout under ``out_dir``::

    _sharded/shard=0/ ...          one-pass hash-partitioned corpus copy
                                   (skipped when the INPUT is already
                                   ``shard=N`` hive-partitioned)
    part=0000/ ... part=NNNN/      extracted span rows (parquet fragments)
    _manifest/shard-0000.json ...  one lineage+metrics record per finished shard

A shard = the documents whose ``stable_hash64(doc_id) % num_shards`` equals
the shard id — deterministic, independent of input file layout. The shard
key is materialized ONCE in a single streamed pass that hive-partitions
the corpus (``write_parquet(partition_cols=["shard"])``); every shard job
then reads ONLY its own ``shard=K`` fragments, so a full resumable run
reads ≈ 2× corpus bytes total (1× prepass + 1× extraction) instead of the
old N full scans with a per-row Python hash filter in each. A corpus that
was STORED hash-partitioned (``shard=K`` dirs matching ``num_shards``)
skips the prepass entirely — 1× total.

Each shard is one streamed Ray Data job: read (pruned) → extract → write
to a temp dir → atomic rename → manifest record, and shard jobs run
concurrently from a small driver thread pool (separate streaming
executions overlap their stage walls — the ``extract_corpus_stored_write``
branch-overlap pattern). Resume = skip shards whose manifest record exists
(the anti-join against the manifest, SURVEY.md §7.1 step 5). A killed run
loses at most the in-flight shards' temp dirs.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa

import ray.data

from docling_ray import __version__
from docling_ray.functions.fsutil import publish_dir
from docling_ray.functions.hashing import stable_hash64
from docling_ray.pipelines.extract import extract_corpus


def _add_shard_column(num_shards: int):
    """Materialize ``shard = stable_hash64(doc_id) % num_shards``. Runs
    once per corpus row in the single prepass (blake2b is C-backed;
    amortized against ~ms/doc extraction cost downstream)."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        shard = np.fromiter(
            (stable_hash64(d) % num_shards for d in ids),
            dtype=np.int32, count=len(ids),
        )
        if "shard" in batch.column_names:
            batch = batch.drop_columns(["shard"])
        return batch.append_column("shard", pa.array(shard, pa.int32()))
    return fn


def _input_shard_dirs(corpus_path: str, num_shards: int) -> list[str] | None:
    """If the input corpus is already hive-partitioned into exactly
    ``shard=0..num_shards-1`` dirs, return them (prepass not needed)."""
    if not os.path.isdir(corpus_path):
        return None
    dirs = {}
    for p in glob.glob(os.path.join(corpus_path, "shard=*")):
        m = re.fullmatch(r"shard=(\d+)", os.path.basename(p))
        if m and os.path.isdir(p):
            dirs[int(m.group(1))] = p
    if sorted(dirs) == list(range(num_shards)):
        return [dirs[i] for i in range(num_shards)]
    return None


def ensure_sharded(corpus_path: str, out_dir: str, num_shards: int) -> list[str]:
    """Per-shard read roots for the corpus, building the one-pass
    hash-partitioned copy under ``out_dir/_sharded`` if needed (atomic
    publish; a finished copy is reused across resumes)."""
    pre = _input_shard_dirs(corpus_path, num_shards)
    if pre is not None:
        return pre
    sharded = os.path.join(out_dir, "_sharded")
    marker = os.path.join(sharded, "_SUCCESS")
    if not os.path.exists(marker):
        tmp = f"{sharded}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        ds = ray.data.read_parquet(corpus_path)
        ds = ds.map_batches(_add_shard_column(num_shards),
                            batch_format="pyarrow")
        ds.write_parquet(tmp, partition_cols=["shard"])
        publish_dir(tmp, sharded)
    if not os.path.exists(marker):
        raise RuntimeError(f"shard prepass failed to publish {sharded}")
    return [os.path.join(sharded, f"shard={i}") for i in range(num_shards)]


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


def _run_shard(
    shard: int, shard_dir: str, corpus_path: str, out_dir: str,
    num_shards: int, mode: str, batch_size: int,
) -> dict:
    """One shard end to end: pruned read → extract → atomic commit →
    manifest record. Thread-safe (own Ray Data execution, own files)."""
    t0 = time.perf_counter()
    ds = ray.data.read_parquet(shard_dir)
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
    rec_path = _shard_record_path(out_dir, shard)
    with open(rec_path + ".tmp", "w") as f:
        json.dump(rec, f)
    os.replace(rec_path + ".tmp", rec_path)
    return rec


def run_resumable(
    corpus_path: str,
    out_dir: str,
    num_shards: int = 8,
    mode: str = "hybrid",
    batch_size: int = 32,
    max_parallel_shards: int = 4,
) -> list[dict]:
    """Run (or resume) extraction over a stored corpus. Returns the manifest
    records of all shards (previously finished + newly computed), in shard
    order."""
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
    from docling_ray.functions.fsutil import ensure_threadsafe_fs_imports

    ensure_threadsafe_fs_imports()
    todo = [s for s in range(num_shards) if s not in done]
    records: dict[int, dict] = {}
    for shard in done:
        with open(_shard_record_path(out_dir, shard)) as f:
            records[shard] = json.load(f)
    if todo:
        shard_dirs = ensure_sharded(corpus_path, out_dir, num_shards)
        workers = max(1, min(max_parallel_shards, len(todo)))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = {
                shard: pool.submit(
                    _run_shard, shard, shard_dirs[shard], corpus_path,
                    out_dir, num_shards, mode, batch_size)
                for shard in todo
            }
            for shard, fut in futs.items():
                records[shard] = fut.result()
    return [records[s] for s in sorted(records)]
