"""Submittable web-graph analytics job.

Run locally or via job submission::

    ray job submit --working-dir . -- \
        python jobs/webgraph_job.py --input /path/corpus --output /tmp/wg \
        --pagerank-iters 8

Reads a stored extraction corpus (write_corpus parquet; .lance routes
through the gated Lance source), extracts the hyperlink stream, and
writes the host-graph artifact set under --output:

    edges/       (src_host, dst_host, n_links)   weighted host graph
    ranks/       (host, rank_scaled)             integer-exact PageRank
    degrees/     (host, out/in links+hosts)      degree dashboard
    components/  (host, component)               site clusters

Each table is partitioned parquet written independently, so a rerun
into a fresh --output is cheap to diff and a consumer reads only the
artifact it needs. Owns its Ray session (guarded init — safe when a
cluster session already exists)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="docling_ray web-graph job")
    ap.add_argument("--input", required=True,
                    help="stored corpus (write_corpus parquet dir)")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--pagerank-iters", type=int, default=8)
    ap.add_argument("--parallelism", type=int, default=None,
                    help="read block count (default: 8 x CPUs)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local only; ignored when a cluster is attached")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from docling_ray.sources.corpus import read_corpus
    from docling_ray.stages.webgraph import (
        host_components, host_degree, host_edges, pagerank_hosts)

    par = args.parallelism or 8 * int(ray.cluster_resources().get("CPU", 4))
    corpus = read_corpus(args.input, columns=["doc_id", "spans"],
                         parallelism=par)
    edges = host_edges(corpus).materialize()

    edges.write_parquet(os.path.join(args.output, "edges"))
    pagerank_hosts(edges, iters=args.pagerank_iters) \
        .write_parquet(os.path.join(args.output, "ranks"))
    host_degree(edges).write_parquet(os.path.join(args.output, "degrees"))
    host_components(edges) \
        .write_parquet(os.path.join(args.output, "components"))

    import ray.data

    n_e = ray.data.read_parquet(os.path.join(args.output, "edges")).count()
    n_h = ray.data.read_parquet(os.path.join(args.output, "ranks")).count()
    print(f"web graph: {n_e} edges over {n_h} hosts -> {args.output}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
