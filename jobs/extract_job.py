"""Submittable extraction job.

Run locally or via job submission::

    ray job submit --working-dir . -- \
        python jobs/extract_job.py --input /path/corpus --output /tmp/out \
        --mode hybrid --num-shards 8

Owns its Ray session (guarded init — safe when a cluster session already
exists). Resumable: rerunning with the same --output skips finished shards
via the manifest (pipelines/checkpoint.py)."""

from __future__ import annotations

import argparse
import json
import os
import sys

# the script lives in <repo>/jobs/; make the package importable regardless
# of the submitter's cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="docling_ray extraction job")
    ap.add_argument("--input", required=True, help="corpus parquet dir/file")
    ap.add_argument("--output", required=True, help="output dir (resumable)")
    ap.add_argument("--mode", default="hybrid",
                    choices=["fast", "explode", "hybrid"])
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--max-parallel-shards", type=int, default=4,
                    help="concurrent shard jobs (driver threads)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local only; ignored when a cluster is attached")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from docling_ray.pipelines.checkpoint import run_resumable

    records = run_resumable(
        args.input, args.output,
        num_shards=args.num_shards, mode=args.mode,
        batch_size=args.batch_size,
        max_parallel_shards=args.max_parallel_shards,
    )
    summary = {
        "n_shards": len(records),
        "n_docs": sum(r["n_docs"] for r in records),
        "n_spans": sum(r["n_spans"] for r in records),
        "wall_sec_total": round(sum(r["wall_sec"] for r in records), 2),
        "status_counts": {},
    }
    for r in records:
        for k, v in r["status_counts"].items():
            summary["status_counts"][k] = summary["status_counts"].get(k, 0) + v
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
