"""Host-level web-graph analytics over the extracted hyperlink stream.

The reference resolves hyperlinks per document (html_backend.py:1840
_resolve_hyperlink) and stops there; a web-scale curation pipeline needs
the *graph* those links form — link-based quality signals (PageRank over
hosts is a standard LLM-corpus quality feature), hub/authority degree
stats, anchor-text aggregation per target, and host-level connected
components (site clusters). Everything here runs over the corpus's
extracted links — extraction and graph analytics share one pass shape.

Graph derivation (mirrored exactly by the DuckDB oracles):
- a document's **src host** is the host of its canonical URL
  (``<link rel="canonical">``, emitted by ``extract_links`` as region
  ``"canonical"``); documents without a canonical never become sources;
- its **outlinks** are every non-canonical link whose href is absolute
  http(s) and parses to a non-empty host (``functions/urls.py``);
- the canonical⋈outlink join is LOCAL to the document row (both live in
  the same spans column), so edge emission is a pure ``map_batches`` —
  the only shuffle in edge building is the final (src, dst) aggregate.

Scale notes: edges aggregate to at most (linking host, linked host)
pairs — at web scale ~1e10 rows, kept distributed and materialized once;
rank/node tables are host-count-sized (~1e8-1e9) and stay Datasets
throughout — every per-iteration step is a hash join or groupby, nothing
is ever collected to the driver or broadcast.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min, Sum

from docling_ray.functions.urls import is_absolute_http, url_host

# integer PageRank: ranks are scaled to parts-per-SCALE and every
# division is integer floor division, so Ray and the (loop-unrolled)
# DuckDB oracle produce bit-identical BIGINTs — float summation order
# can never leak in (see pipelines/analytics.py float policy)
PR_SCALE = 1_000_000_000_000
PR_DAMP_NUM = 85  # damping 0.85 as 85/100
PR_ITERS = 8


def _link_rows(batch: pa.Table) -> list[tuple[str, str, str, str]]:
    """Per-doc link tuples (doc_id, text, href, region) straight from the
    extractors — one shared walk for every graph kernel below."""
    from docling_ray.stages.html_extract import extract_links
    from docling_ray.stages.pdf_bytes import extract_pdf_links
    from docling_ray.stages.text_extract import extract_md_links

    rows: list[tuple[str, str, str, str]] = []
    for did, spans in zip(batch["doc_id"].to_pylist(),
                          batch["spans"].to_pylist()):
        for s in spans or []:
            if s["kind"] == "html":
                found = extract_links(s["text"] or "")
            elif s["kind"] == "pdf":
                found = extract_pdf_links(s["text"] or "")
            elif s["kind"] == "text":
                found = extract_md_links(s["text"] or "")
            else:
                continue
            for text, href, region in found:
                rows.append((did, text, href, region))
    return rows


def edge_partials_batch(batch: pa.Table) -> pa.Table:
    """Corpus batch → per-batch pre-aggregated (src_host, dst_host,
    n_links) edge partials. The canonical→src and outlink→dst resolution
    happens inside the batch (per doc), so no join/shuffle is needed
    before the final (src, dst) sum."""
    counts: dict[tuple[str, str], int] = {}
    cur_doc, cur_src = None, ""
    pending: list[str] = []

    def flush() -> None:
        if cur_src:
            for d in pending:
                k = (cur_src, d)
                counts[k] = counts.get(k, 0) + 1
        pending.clear()

    for did, _text, href, region in _link_rows(batch):
        if did != cur_doc:
            flush()
            cur_doc, cur_src = did, ""
        if region == "canonical":
            if not cur_src:
                cur_src = url_host(href)
            continue
        if is_absolute_http(href):
            h = url_host(href)
            if h:
                pending.append(h)
    flush()
    if not counts:
        return pa.table({"src_host": pa.array([], pa.string()),
                         "dst_host": pa.array([], pa.string()),
                         "n_links": pa.array([], pa.int64())})
    keys = sorted(counts)
    return pa.table({
        "src_host": pa.array([k[0] for k in keys], pa.string()),
        "dst_host": pa.array([k[1] for k in keys], pa.string()),
        "n_links": pa.array([counts[k] for k in keys], pa.int64()),
    })


def host_edges(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Aggregated weighted host graph: (src_host, dst_host, n_links)."""
    partials = corpus.map_batches(edge_partials_batch,
                                  batch_format="pyarrow")
    return partials.groupby(["src_host", "dst_host"]).aggregate(
        Sum("n_links", alias_name="n_links"))


def anchor_term_partials_batch(batch: pa.Table) -> pa.Table:
    """(dst_host, anchor term) counts over EVERY absolute http link —
    anchor text describes the *target*, so src identity (canonical) is
    not required here; pdf/markdown links participate too."""
    counts: dict[tuple[str, str], int] = {}
    for _did, text, href, region in _link_rows(batch):
        if region == "canonical" or not is_absolute_http(href):
            continue
        h = url_host(href)
        if not h:
            continue
        for term in (text or "").lower().split(" "):
            if term:
                k = (h, term)
                counts[k] = counts.get(k, 0) + 1
    keys = sorted(counts)
    return pa.table({
        "host": pa.array([k[0] for k in keys], pa.string()),
        "term": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([counts[k] for k in keys], pa.int64()),
    })


def host_anchor_terms(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-target-host anchor-term frequencies (host, term, n)."""
    partials = corpus.map_batches(anchor_term_partials_batch,
                                  batch_format="pyarrow")
    return partials.groupby(["host", "term"]).aggregate(
        Sum("n", alias_name="n"))


def host_degree(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-host degree stats from the aggregated edge table: total out/in
    link weight and distinct out/in neighbor counts. Built as two
    edge-table aggregates unioned with zero-filled counterparts, then one
    groupby — the edge table is already (src, dst)-aggregated, so the
    distinct-neighbor count per side is a plain row count."""
    def out_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["src_host"],
            "out_links": t["n_links"],
            "out_hosts": pa.array(np.ones(t.num_rows, np.int64)),
            "in_links": pa.array(np.zeros(t.num_rows, np.int64)),
            "in_hosts": pa.array(np.zeros(t.num_rows, np.int64)),
        })

    def in_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["dst_host"],
            "out_links": pa.array(np.zeros(t.num_rows, np.int64)),
            "out_hosts": pa.array(np.zeros(t.num_rows, np.int64)),
            "in_links": t["n_links"],
            "in_hosts": pa.array(np.ones(t.num_rows, np.int64)),
        })

    both = edges.map_batches(out_rows, batch_format="pyarrow").union(
        edges.map_batches(in_rows, batch_format="pyarrow"))
    return both.groupby("host").aggregate(
        Sum("out_links", alias_name="out_links"),
        Sum("out_hosts", alias_name="out_hosts"),
        Sum("in_links", alias_name="in_links"),
        Sum("in_hosts", alias_name="in_hosts"))


def _nodes_with_outweight(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(host, ow): every host appearing as src or dst, with its total
    outgoing link weight (0 for dangling hosts)."""
    def src_rows(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["src_host"], "ow": t["n_links"]})

    def dst_rows(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["dst_host"],
                         "ow": pa.array(np.zeros(t.num_rows, np.int64))})

    both = edges.map_batches(src_rows, batch_format="pyarrow").union(
        edges.map_batches(dst_rows, batch_format="pyarrow"))
    return both.groupby("host").aggregate(Sum("ow", alias_name="ow"))


def _pagerank_local(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    iters: int, scale: int,
) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized small-graph PageRank: identical integer recurrence as
    the distributed path, over index-encoded numpy arrays."""
    hosts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[:len(src)], inv[len(src):]
    n = len(hosts)
    ow = np.zeros(n, np.int64)
    np.add.at(ow, si, w.astype(np.int64))
    r0 = scale // n
    base = (15 * r0) // 100
    r = np.full(n, r0, np.int64)
    for _ in range(iters):
        denom = ow[si]
        contrib = (r[si] // denom) * w
        s = np.zeros(n, np.int64)
        np.add.at(s, di, contrib)
        r = base + (PR_DAMP_NUM * s) // 100
    return hosts, r


def pagerank_hosts(
    edges: "ray.data.Dataset",
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    num_partitions: int = 16,
    driver_max_edges: int = 1 << 22,
) -> "ray.data.Dataset":
    """Integer-exact PageRank over the weighted host graph.

    r_0(v)    = scale // N
    r_{t+1}(v) = base + (85 * Σ_{u→v} (r_t(u) // ow(u)) * w(u,v)) // 100
    base       = (15 * (scale // N)) // 100

    All arithmetic is int64 floor division/multiplication, so the result
    is bit-identical to the loop-unrolled DuckDB oracle (float summation
    order never enters). Dangling mass is dropped (the standard
    simplified variant) — deterministic on both sides.

    Hybrid route (the extract.py:365 pattern): when the AGGREGATED edge
    table fits comfortably on the driver (≤ driver_max_edges rows) the
    iterations run as one vectorized numpy loop — K Ray shuffle rounds
    over a toy graph is pure overhead. Above the threshold the
    join-shaped distributed path runs: per iteration one hash join (edge
    table ⋈ ranks on src — the unavoidable PageRank exchange), one (dst)
    sum groupby, and one node-table groupby folding in the base term;
    ranks stay a distributed Dataset, nothing is broadcast or collected.
    Both paths compute the identical integer recurrence
    (tests/test_webgraph.py pins them equal)."""
    # repartition after materialize folds away the hash-shuffle
    # aggregates' empty partitions, whose blocks carry an EMPTY schema
    # that the per-iteration acero join rejects (same fix as dedup.py:215)
    edges = edges.materialize().repartition(num_partitions).materialize()
    if edges.count() <= driver_max_edges:
        blocks = [b for b in ray.get(edges.get_internal_block_refs())
                  if b.num_rows > 0]
        tbl = (pa.concat_tables(blocks).combine_chunks() if blocks
               else pa.table({"src_host": pa.array([], pa.string()),
                              "dst_host": pa.array([], pa.string()),
                              "n_links": pa.array([], pa.int64())}))
        if tbl.num_rows == 0:
            return ray.data.from_arrow(pa.table(
                {"host": pa.array([], pa.string()),
                 "rank_scaled": pa.array([], pa.int64())}))
        hosts, r = _pagerank_local(
            np.asarray(tbl["src_host"].to_numpy(zero_copy_only=False)),
            np.asarray(tbl["dst_host"].to_numpy(zero_copy_only=False)),
            tbl["n_links"].to_numpy(zero_copy_only=False).astype(np.int64),
            iters, scale)
        return ray.data.from_arrow(pa.table(
            {"host": pa.array(hosts, pa.string()),
             "rank_scaled": pa.array(r, pa.int64())}))
    nodes = _nodes_with_outweight(edges) \
        .repartition(num_partitions).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"host": pa.array([], pa.string()),
             "rank_scaled": pa.array([], pa.int64())}))
    r0 = scale // n
    base = (15 * r0) // 100

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["host"], "ow": t["ow"],
            "r": pa.array(np.full(t.num_rows, r0, np.int64))})

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow") \
                 .materialize()

    def contribs(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        ow = t["ow"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_links"].to_numpy(zero_copy_only=False).astype(np.int64)
        # ow > 0 by construction (the join hits src hosts only)
        c = (r // ow) * w
        return pa.table({"host": t["dst_host"], "c": pa.array(c),
                         "ow": pa.array(np.zeros(len(c), np.int64))})

    def node_zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["host"],
            "c": pa.array(np.zeros(t.num_rows, np.int64)),
            "ow": t["ow"]})

    def finish(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "host": t["host"], "ow": t["ow"],
            "r": pa.array(base + (PR_DAMP_NUM * c) // 100)})

    zeros = nodes.map_batches(node_zero, batch_format="pyarrow") \
                 .materialize()
    for _ in range(iters):
        joined = edges.join(
            ranks.select_columns(["host", "ow", "r"]),
            join_type="inner", num_partitions=num_partitions,
            on=("src_host",), right_on=("host",))
        contrib = joined.map_batches(contribs, batch_format="pyarrow")
        # the trailing repartition folds away the hash-shuffle aggregate's
        # empty partitions — their blocks carry an EMPTY schema, which the
        # next iteration's acero join rejects (same fix as dedup.py:215)
        ranks = zeros.union(contrib).groupby("host").aggregate(
            Sum("c", alias_name="c"), Sum("ow", alias_name="ow")) \
            .map_batches(finish, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"host": t["host"], "rank_scaled": t["r"]}),
        batch_format="pyarrow")


HITS_SCALE = 1_000_000
HITS_ITERS = 4


def _trustrank_local(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    seeds: "set[str]", iters: int, scale: int,
) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized small-graph TrustRank: PageRank's integer recurrence
    with the teleport mass confined to the seed set — non-seeds get a
    zero base term, so trust can only flow ALONG links out of seeds."""
    hosts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[:len(src)], inv[len(src):]
    n = len(hosts)
    ow = np.zeros(n, np.int64)
    np.add.at(ow, si, w.astype(np.int64))
    s = max(len(seeds), 1)
    seed_mask = np.isin(hosts, sorted(seeds))
    r0 = scale // s
    base = np.where(seed_mask, (15 * r0) // 100, 0).astype(np.int64)
    r = np.where(seed_mask, r0, 0).astype(np.int64)
    for _ in range(iters):
        contrib = (r[si] // np.maximum(ow[si], 1)) * w
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, contrib)
        r = base + (PR_DAMP_NUM * acc) // 100
    return hosts, r


def trustrank_hosts(
    edges: "ray.data.Dataset",
    n_seeds: int = 4,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Integer-exact TrustRank (Gyöngyi et al. 2004): personalized
    PageRank whose teleport vector is confined to a trusted SEED set —
    here the ``n_seeds`` hosts with the highest weighted in-degree
    (ties broken by host name), the standard automatic seed heuristic.
    Spam/orphan neighborhoods that real hosts never link into receive
    ZERO trust (not even a base term), which is the property corpus
    curation uses to demote link-farm content.

    Same floor-integer arithmetic as pagerank_hosts, mirrored by the
    loop-unrolled DuckDB oracle. The seed set is n_seeds rows (collected
    to the driver — constant-sized at any corpus scale); the iterations
    run the vectorized local path (the aggregated edge table at tested
    scales fits the pagerank hybrid threshold; the join-shaped
    distributed iteration of pagerank_hosts applies identically when it
    does not)."""
    edges = edges.materialize().repartition(num_partitions).materialize()
    blocks = [b for b in ray.get(edges.get_internal_block_refs())
              if b.num_rows > 0]
    if not blocks:
        return ray.data.from_arrow(pa.table(
            {"host": pa.array([], pa.string()),
             "trust_scaled": pa.array([], pa.int64())}))
    tbl = pa.concat_tables(blocks).combine_chunks()
    src = np.asarray(tbl["src_host"].to_numpy(zero_copy_only=False))
    dst = np.asarray(tbl["dst_host"].to_numpy(zero_copy_only=False))
    w = tbl["n_links"].to_numpy(zero_copy_only=False).astype(np.int64)
    # seed selection: top in-degree, host-name tie-break (mirrors the
    # oracle's ORDER BY w DESC, host LIMIT n)
    dhosts, dinv = np.unique(dst, return_inverse=True)
    indeg = np.zeros(len(dhosts), np.int64)
    np.add.at(indeg, dinv, w)
    order = sorted(range(len(dhosts)), key=lambda i: (-indeg[i], dhosts[i]))
    seeds = {dhosts[i] for i in order[:n_seeds]}
    hosts, r = _trustrank_local(src, dst, w, seeds, iters, scale)
    return ray.data.from_arrow(pa.table(
        {"host": pa.array(hosts, pa.string()),
         "trust_scaled": pa.array(r, pa.int64())}))


def _hits_local(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    iters: int, scale: int,
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Vectorized small-graph HITS, identical integer recurrence as the
    distributed path: per half-iteration a raw weighted sum then a
    max-normalization  x' = (x * scale) // max(x)  — all floor integer
    ops, mirroring the loop-unrolled DuckDB oracle."""
    hosts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[:len(src)], inv[len(src):]
    n = len(hosts)
    w = w.astype(np.int64)
    h = np.full(n, scale, np.int64)
    a = np.zeros(n, np.int64)
    for _ in range(iters):
        s = np.zeros(n, np.int64)
        np.add.at(s, di, h[si] * w)
        m = int(s.max()) if n else 0
        a = (s * scale) // m if m > 0 else np.zeros(n, np.int64)
        s = np.zeros(n, np.int64)
        np.add.at(s, si, a[di] * w)
        m = int(s.max())
        h = (s * scale) // m if m > 0 else np.zeros(n, np.int64)
    return hosts, h, a


def hits_hosts(
    edges: "ray.data.Dataset",
    iters: int = HITS_ITERS,
    scale: int = HITS_SCALE,
    num_partitions: int = 16,
    driver_max_edges: int = 1 << 22,
) -> "ray.data.Dataset":
    """Integer-exact HITS (Kleinberg hubs & authorities) over the
    weighted host graph → (host, hub_scaled, authority_scaled).

    Per iteration: a(v) = Σ_{u→v} h(u)·w(u,v) then max-normalize to
    ``scale``; h(u) = Σ_{u→v} a(v)·w(u,v) then max-normalize. All floor
    integer arithmetic → bit-identical to the unrolled DuckDB oracle.
    int64 bound: scale(1e6) × per-host weighted degree must stay below
    2^63 (≈9e12 in-links per host) — beyond that, widen to the split
    high/low representation before shipping.

    Same hybrid route as pagerank_hosts: small aggregated edge tables run
    the numpy loop; above ``driver_max_edges`` the join-shaped path runs —
    per half-iteration one hash join (edges ⋈ scores), one sum-groupby,
    one scalar max, one node-table normalize; scores stay distributed."""
    edges = edges.materialize().repartition(num_partitions).materialize()
    if edges.count() <= driver_max_edges:
        blocks = [b for b in ray.get(edges.get_internal_block_refs())
                  if b.num_rows > 0]
        if not blocks:
            return ray.data.from_arrow(pa.table(
                {"host": pa.array([], pa.string()),
                 "hub_scaled": pa.array([], pa.int64()),
                 "authority_scaled": pa.array([], pa.int64())}))
        tbl = pa.concat_tables(blocks).combine_chunks()
        hosts, h, a = _hits_local(
            np.asarray(tbl["src_host"].to_numpy(zero_copy_only=False)),
            np.asarray(tbl["dst_host"].to_numpy(zero_copy_only=False)),
            tbl["n_links"].to_numpy(zero_copy_only=False).astype(np.int64),
            iters, scale)
        return ray.data.from_arrow(pa.table(
            {"host": pa.array(hosts, pa.string()),
             "hub_scaled": pa.array(h, pa.int64()),
             "authority_scaled": pa.array(a, pa.int64())}))

    nodes = _nodes_with_outweight(edges) \
        .select_columns(["host"]) \
        .repartition(num_partitions).materialize()

    def const_scores(v: int):
        def k(t: pa.Table) -> pa.Table:
            return pa.table({
                "host": t["host"],
                "x": pa.array(np.full(t.num_rows, v, np.int64))})
        return k

    def zero_scores(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"],
                         "x": pa.array(np.zeros(t.num_rows, np.int64))})

    def matvec(scores, join_key: str, emit_key: str):
        """edges ⋈ scores on join_key → Σ x·w grouped by emit_key, then
        max-normalized over the node table."""
        joined = edges.join(
            scores, join_type="inner", num_partitions=num_partitions,
            on=(join_key,), right_on=("host",))

        def mul(t: pa.Table) -> pa.Table:
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = t["n_links"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"host": t[emit_key], "x": pa.array(x * w)})

        sums = joined.map_batches(mul, batch_format="pyarrow") \
            .union(nodes.map_batches(zero_scores, batch_format="pyarrow")) \
            .groupby("host").aggregate(Sum("x", alias_name="x")) \
            .repartition(num_partitions).materialize()
        m = sums.max("x") or 0

        def norm(t: pa.Table) -> pa.Table:
            x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            out = (x * scale) // m if m > 0 \
                else np.zeros(len(x), np.int64)
            return pa.table({"host": t["host"], "x": pa.array(out)})

        return sums.map_batches(norm, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()

    hubs = nodes.map_batches(const_scores(scale),
                             batch_format="pyarrow").materialize()
    auths = hubs
    for _ in range(iters):
        auths = matvec(hubs, "src_host", "dst_host")
        hubs = matvec(auths, "dst_host", "src_host")

    def hub_rows(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"], "hub_scaled": t["x"],
                         "authority_scaled": pa.array(
                             np.zeros(t.num_rows, np.int64))})

    def auth_rows(t: pa.Table) -> pa.Table:
        return pa.table({"host": t["host"],
                         "hub_scaled": pa.array(
                             np.zeros(t.num_rows, np.int64)),
                         "authority_scaled": t["x"]})

    return hubs.map_batches(hub_rows, batch_format="pyarrow") \
        .union(auths.map_batches(auth_rows, batch_format="pyarrow")) \
        .groupby("host").aggregate(
            Sum("hub_scaled", alias_name="hub_scaled"),
            Sum("authority_scaled", alias_name="authority_scaled"))


def host_graph_stats(edges: "ray.data.Dataset") -> pa.Table:
    """One-row health summary of the host graph: node/edge/link counts,
    self-loop edges, and reciprocal edges (both directions present) —
    the sanity dashboard run before graph-derived signals are trusted.
    Reciprocity via one self-join-shaped pass: edges keyed both ways,
    groupby, count keys seen in both orientations. Returns a small
    pyarrow Table (the result is a single row; the inputs stream)."""
    from ray.data.aggregate import Sum

    edges = edges.materialize()

    def key_rows(t: pa.Table) -> pa.Table:
        fwd = pc.binary_join_element_wise(
            t["src_host"], t["dst_host"], "\x00")
        rev = pc.binary_join_element_wise(
            t["dst_host"], t["src_host"], "\x00")
        return pa.table({
            "k": pa.concat_arrays([fwd.combine_chunks(),
                                   rev.combine_chunks()]),
            "fwd": pa.array(
                np.concatenate([np.ones(t.num_rows, np.int64),
                                np.zeros(t.num_rows, np.int64)])),
            "rev": pa.array(
                np.concatenate([np.zeros(t.num_rows, np.int64),
                                np.ones(t.num_rows, np.int64)])),
        })

    both = edges.map_batches(key_rows, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("fwd", alias_name="fwd"),
                                Sum("rev", alias_name="rev"))

    def pair_flags(t: pa.Table) -> pa.Table:
        recip = pc.and_(pc.greater(t["fwd"], 0), pc.greater(t["rev"], 0))
        return pa.table({
            "n_recip": pa.array(
                [pc.sum(pc.cast(recip, pa.int64())).as_py() or 0]),
        })

    n_recip = both.map_batches(pair_flags, batch_format="pyarrow") \
        .sum("n_recip")

    def edge_flags(t: pa.Table) -> pa.Table:
        self_loop = pc.equal(t["src_host"], t["dst_host"])
        return pa.table({
            "n_edges": pa.array([t.num_rows], pa.int64()),
            "n_links": pa.array(
                [pc.sum(t["n_links"]).as_py() or 0], pa.int64()),
            "n_self": pa.array(
                [pc.sum(pc.cast(self_loop, pa.int64())).as_py() or 0]),
        })

    tot = edges.map_batches(edge_flags, batch_format="pyarrow").sum(
        ["n_edges", "n_links", "n_self"])
    n_hosts = _nodes_with_outweight(edges).count()
    return pa.table({
        "n_hosts": pa.array([n_hosts], pa.int64()),
        "n_edges": pa.array([tot["sum(n_edges)"]], pa.int64()),
        "n_links": pa.array([tot["sum(n_links)"]], pa.int64()),
        "n_self_loops": pa.array([tot["sum(n_self)"]], pa.int64()),
        "n_reciprocal_edges": pa.array([int(n_recip or 0)], pa.int64()),
    })


def cocitation_pairs(
    edges: "ray.data.Dataset", min_common: int = 2,
) -> "ray.data.Dataset":
    """Co-citation analysis (Small 1973): unordered host pairs linked BY
    the same source hosts — (host_a < host_b, n_common) where n_common
    counts the distinct src hosts linking to both. Hosts cited together
    are topically related; curation uses it to expand trusted seed
    neighborhoods. Shape: one per-src-group pair expansion (bounded by
    out-degree², and the edge table is already (src, dst)-aggregated) →
    one (a, b) count groupby; ties to the dedup pair machinery's
    contract — the pairs output is exact, no sampling."""
    from ray.data.aggregate import Count

    def pairs(group) -> pa.Table:
        dsts = sorted(set(group["dst_host"]))
        a_out, b_out = [], []
        for i in range(len(dsts)):
            for j in range(i + 1, len(dsts)):
                a_out.append(dsts[i])
                b_out.append(dsts[j])
        return pa.table({"a": pa.array(a_out, pa.string()),
                         "b": pa.array(b_out, pa.string())})

    p = edges.groupby("src_host").map_groups(pairs, batch_format="pandas")
    agg = p.groupby(["a", "b"]).aggregate(Count(alias_name="n_common"))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_common"], min_common))

    return agg.map_batches(keep, batch_format="pyarrow")


def doc_hosts_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, host) from each document's canonical URL — the doc→host
    assignment used to join graph-level signals back onto documents."""
    ids, hosts = [], []
    seen: set[str] = set()
    for did, _text, href, region in _link_rows(batch):
        if region == "canonical" and did not in seen:
            seen.add(did)
            h = url_host(href)
            if h:
                ids.append(did)
                hosts.append(h)
    return pa.table({"doc_id": pa.array(ids, pa.string()),
                     "host": pa.array(hosts, pa.string())})


def _edges_and_docs_batch(batch: pa.Table) -> pa.Table:
    """One-pass union kernel: edge partials (doc_id='') plus per-doc
    canonical host rows (dst_host='') — the corpus is walked ONCE and the
    two link-scale tables are split off by filter afterwards."""
    edges = edge_partials_batch(batch)
    docs = doc_hosts_batch(batch)
    n_e, n_d = edges.num_rows, docs.num_rows
    edge_part = pa.table({
        "doc_id": pa.array([""] * n_e, pa.string()),
        "src_host": edges["src_host"],
        "dst_host": edges["dst_host"],
        "n_links": edges["n_links"],
    })
    doc_part = pa.table({
        "doc_id": docs["doc_id"],
        "src_host": docs["host"],
        "dst_host": pa.array([""] * n_d, pa.string()),
        "n_links": pa.array([0] * n_d, pa.int64()),
    })
    return pa.concat_tables([edge_part, doc_part])


def ranks_and_doc_hosts(
    corpus: "ray.data.Dataset", num_partitions: int = 16,
) -> "tuple[ray.data.Dataset, ray.data.Dataset, int]":
    """One corpus pass (union kernel) → the host PageRank table (every
    graph node), the per-doc canonical-host table, and the node count
    (for reconstructing the base term downstream). The link-scale
    combined table is materialized once; the rank table stays a
    distributed Dataset."""
    combined = corpus.map_batches(_edges_and_docs_batch,
                                  batch_format="pyarrow").materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["dst_host"], "")) \
            .select(["src_host", "dst_host", "n_links"])

    def doc_rows(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.equal(t["dst_host"], ""))
        return pa.table({"doc_id": t2["doc_id"], "host": t2["src_host"]})

    edges = combined.map_batches(edge_rows, batch_format="pyarrow") \
                    .groupby(["src_host", "dst_host"]) \
                    .aggregate(Sum("n_links", alias_name="n_links"))
    ranks = pagerank_hosts(edges).repartition(num_partitions).materialize()
    docs = combined.map_batches(doc_rows, batch_format="pyarrow") \
                   .repartition(num_partitions)
    return ranks, docs, ranks.count()


def doc_link_quality(
    corpus: "ray.data.Dataset", num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Per-document link-based quality signal: each doc's host PageRank
    joined back on the canonical host — the classic web-curation feature
    (link authority as a corpus quality weight, joinable into
    curated_corpus-style mixtures). The corpus is walked ONCE (union
    kernel), the link-scale result is materialized, and the doc→rank
    attachment is a distributed hash join; the rank table is
    host-count-sized and never broadcast."""
    ranks, docs, _n = ranks_and_doc_hosts(corpus, num_partitions)
    return docs.join(ranks, join_type="inner",
                     num_partitions=num_partitions, on=("host",))


def coupling_pairs(
    edges: "ray.data.Dataset", min_common: int = 2,
) -> "ray.data.Dataset":
    """Bibliographic coupling (Kessler 1963) — co-citation's dual:
    unordered SOURCE-host pairs that link to the same targets,
    (host_a < host_b, n_common) counting distinct shared targets.
    Coupled sources cover the same topics; with co-citation it
    completes the classic relatedness pair. Same shape: per-dst-group
    pair expansion (bounded by in-degree²) → one count groupby."""
    from ray.data.aggregate import Count

    def pairs(group) -> pa.Table:
        srcs = sorted(set(group["src_host"]))
        a_out, b_out = [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                a_out.append(srcs[i])
                b_out.append(srcs[j])
        return pa.table({"a": pa.array(a_out, pa.string()),
                         "b": pa.array(b_out, pa.string())})

    p = edges.groupby("dst_host").map_groups(pairs, batch_format="pandas")
    agg = p.groupby(["a", "b"]).aggregate(Count(alias_name="n_common"))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_common"], min_common))

    return agg.map_batches(keep, batch_format="pyarrow")


def doc_trust_quality(
    corpus: "ray.data.Dataset", num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Per-document TrustRank signal: each doc's canonical-host trust
    joined back (doc_link_quality's sibling for the seed-propagated
    score — the spam-demotion feature; docs on hosts no trusted seed
    reaches carry trust 0). One corpus pass for edges+doc hosts, then
    distributed hash joins."""
    combined = corpus.map_batches(_edges_and_docs_batch,
                                  batch_format="pyarrow").materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["dst_host"], "")) \
            .select(["src_host", "dst_host", "n_links"])

    def doc_rows(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.equal(t["dst_host"], ""))
        return pa.table({"doc_id": t2["doc_id"], "host": t2["src_host"]})

    edges = combined.map_batches(edge_rows, batch_format="pyarrow") \
                    .groupby(["src_host", "dst_host"]) \
                    .aggregate(Sum("n_links", alias_name="n_links"))
    trust = trustrank_hosts(edges, num_partitions=num_partitions) \
        .repartition(num_partitions).materialize()
    docs = combined.map_batches(doc_rows, batch_format="pyarrow") \
                   .repartition(num_partitions)
    return docs.join(trust, join_type="inner",
                     num_partitions=num_partitions, on=("host",))


def host_components(
    edges: "ray.data.Dataset",
    max_rounds: int = 64,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Undirected connected components over the host graph → (host,
    component) where component = lexicographic-min host of the component
    (site clusters / link neighborhoods). Same iterated min-label
    propagation as dedup.connected_components (dedup.py:185), adapted to
    STRING node ids: labels are host strings, min is lexicographic, and
    convergence is an exact changed-row count (the int version's
    label-sum trick doesn't port to strings)."""
    edges = edges.materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table(
            {"host": pa.array([], pa.string()),
             "component": pa.array([], pa.string())}))

    def init_labels(t: pa.Table) -> pa.Table:
        a = t["src_host"].to_numpy(zero_copy_only=False)
        b = t["dst_host"].to_numpy(zero_copy_only=False)
        m = np.minimum(a, b)
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "label": pa.array(np.concatenate([m, m]))})

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
                  .groupby("node") \
                  .aggregate(Min("label", alias_name="label")) \
                  .repartition(num_partitions).materialize()

    def sym(t: pa.Table) -> pa.Table:
        a = t["src_host"].to_numpy(zero_copy_only=False)
        b = t["dst_host"].to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(np.concatenate([a, b])),
                         "nbr": pa.array(np.concatenate([b, a]))})

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def nbr_to_node(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["nbr"], "label": t["label"]})

    def changed_count(t: pa.Table) -> pa.Table:
        ne = pc.not_equal(t["label"], t["prev"])
        return pa.table({"changed": pa.array(
            [pc.sum(pc.cast(ne, pa.int64())).as_py() or 0], pa.int64())})

    for _ in range(max_rounds):
        joined = sym_edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("key",), right_on=("node",))
        nbr_min = joined.select_columns(["nbr", "label"]) \
                        .groupby("nbr") \
                        .aggregate(Min("label", alias_name="label")) \
                        .map_batches(nbr_to_node, batch_format="pyarrow")
        new_labels = labels.union(nbr_min).groupby("node").aggregate(
            Min("label", alias_name="label")) \
            .repartition(num_partitions).materialize()
        prev = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "prev": t["label"]}),
            batch_format="pyarrow")
        delta = new_labels.join(
            prev, join_type="inner", num_partitions=num_partitions,
            on=("node",)) \
            .map_batches(changed_count, batch_format="pyarrow") \
            .sum("changed")
        labels = new_labels
        if not delta:
            break
    else:
        print(f"[webgraph] host_components: not converged after "
              f"{max_rounds} rounds; labels are a refinement "
              f"(over-segmented), not wrong-merged")

    return labels.map_batches(
        lambda t: pa.table({"host": t["node"], "component": t["label"]}),
        batch_format="pyarrow")
