"""Submittable training-data curation job.

Run locally or via job submission::

    ray job submit --working-dir . -- \
        python jobs/curate_job.py --input /path/docs --output /tmp/out \
        --quotas src0=1000,src1=500 --lm-threshold 33000

Reads a documents table (doc_id, text, source), runs the full curation
recipe (quality gate → corpus-trained bigram-LM gate → exact dedup →
per-source mixture cut — pipelines/training_data.curated_corpus), and
writes the selected ids partitioned by source (one directory per
domain, so a downstream trainer reads its mixture slice directly and a
rerun into a fresh --output is cheap to diff). Owns its Ray session
(guarded init — safe when a cluster session already exists)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_quotas(spec: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for part in spec.split(","):
        if not part.strip():
            continue
        dom, _, n = part.partition("=")
        out[dom.strip()] = int(n)
    if not out:
        raise SystemExit("--quotas must name at least one domain=count")
    return out


def main() -> int:
    ap = argparse.ArgumentParser(
        description="docling_ray training-data curation job")
    ap.add_argument("--input", required=True,
                    help="documents parquet dir/file")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--quotas", required=True,
                    help="per-domain sample quotas: src0=1000,src1=500")
    ap.add_argument("--lm-threshold", type=int, default=33_000,
                    help="bigram-LM floor-ppm mean cutoff")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local only; ignored when a cluster is attached")
    args = ap.parse_args()
    quotas = _parse_quotas(args.quotas)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    import ray.data

    from docling_ray.pipelines.training_data import curated_corpus

    ds = ray.data.read_parquet(
        args.input, columns=["doc_id", "text", "source"])
    out = curated_corpus(ds, quotas=quotas,
                         lm_threshold=args.lm_threshold)
    out.write_parquet(args.output, partition_cols=["source"])
    n = ray.data.read_parquet(args.output).count()
    print(f"curated {n} docs -> {args.output}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
