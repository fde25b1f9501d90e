"""Web-graph operators: URL primitives, canonical-link extraction, edge
derivation, integer PageRank (local vs distributed path equality), and
string-labeled connected components."""
import numpy as np
import pyarrow as pa
import pytest

from docling_ray.functions.urls import is_absolute_http, normalize_url, url_host


# ---------------------------------------------------------------------------
# URL primitives (literal pins — mirrored byte for byte by the DuckDB
# regexp in __ray_entry__._webgraph_sql)
# ---------------------------------------------------------------------------

def test_url_host_literals():
    assert url_host("https://site01.example/doc") == "site01.example"
    assert url_host("http://EXAMPLE.com/Path?q=1#f") == "example.com"
    assert url_host("https://user:pw@host.org:8443/x") == "host.org"
    assert url_host("https://host.org:8443") == "host.org"
    assert url_host("ftp://files.example/x") == "files.example"
    assert url_host("/relative/path") == ""
    assert url_host("mailto:user@example.com") == ""  # no ://
    assert url_host("") == ""
    assert url_host("https://") == ""


def test_is_absolute_http():
    assert is_absolute_http("https://a.example/")
    assert is_absolute_http("HTTP://a.example")
    assert not is_absolute_http("ftp://a.example")
    assert not is_absolute_http("/w")
    assert not is_absolute_http("")


def test_normalize_url():
    assert normalize_url("HTTPS://Host.Example:443/A/b?Q=1#frag") == \
        "https://host.example/A/b?Q=1"
    assert normalize_url("http://h.example:80/") == "http://h.example"
    assert normalize_url("http://h.example:8080/x") == \
        "http://h.example:8080/x"
    assert normalize_url("not a url") == "not a url"


# ---------------------------------------------------------------------------
# canonical <link> extraction
# ---------------------------------------------------------------------------

def test_extract_links_canonical_first():
    from docling_ray.stages.html_extract import extract_links

    html = ('<html><head><title>t</title>'
            '<link rel="canonical" href="https://s.example/p1"/>'
            '</head><body><h1>T</h1>'
            '<p>see <a href="https://t.example/x">x docs</a></p>'
            '</body></html>')
    links = extract_links(html)
    assert links[0] == ("", "https://s.example/p1", "canonical")
    assert links[1] == ("x docs", "https://t.example/x", "body")


def test_extract_links_no_canonical_unchanged():
    from docling_ray.stages.html_extract import extract_links

    html = '<html><body><p><a href="/w">w</a></p></body></html>'
    assert extract_links(html) == [("w", "/w", "body")]


def test_canonical_first_only():
    from docling_ray.stages.html_extract import extract_links

    html = ('<head><link rel="canonical" href="https://a.example/1"/>'
            '<link rel="canonical" href="https://b.example/2"/></head>'
            '<body><p>x</p></body>')
    links = extract_links(html)
    assert links == [("", "https://a.example/1", "canonical")]


# ---------------------------------------------------------------------------
# edge derivation (map-side, per-doc canonical ⋈ outlinks)
# ---------------------------------------------------------------------------

def _doc_row(doc_id: str, html: str) -> dict:
    return {"doc_id": doc_id,
            "spans": [{"kind": "html", "text": html, "media_ref": "",
                       "offset": 0}]}


def test_edge_partials_batch():
    from docling_ray.stages.webgraph import edge_partials_batch

    with_canon = ('<head><link rel="canonical" '
                  'href="https://src.example/p"/></head><body><h1>T</h1>'
                  '<p><a href="https://a.example/1">one</a>'
                  '<a href="https://a.example/2">two</a>'
                  '<a href="https://b.example/3">three</a>'
                  '<a href="/rel">rel skipped</a>'
                  '<a href="ftp://c.example/4">non-http skipped</a></p>'
                  '</body>')
    no_canon = ('<body><p><a href="https://z.example/9">orphan</a></p>'
                '</body>')
    batch = pa.Table.from_pylist([
        _doc_row("d1", with_canon), _doc_row("d2", no_canon)])
    out = edge_partials_batch(batch).to_pylist()
    assert out == [
        {"src_host": "src.example", "dst_host": "a.example", "n_links": 2},
        {"src_host": "src.example", "dst_host": "b.example", "n_links": 1},
    ]


# ---------------------------------------------------------------------------
# PageRank: local path pinned against the distributed join-shaped path
# ---------------------------------------------------------------------------

def _toy_edges():
    # a skewed 6-host graph with a dangling host (f) and a self-loop
    rows = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
            ("d", "c", 5), ("d", "f", 1), ("e", "e", 2), ("e", "c", 1)]
    return pa.table({
        "src_host": pa.array([r[0] for r in rows]),
        "dst_host": pa.array([r[1] for r in rows]),
        "n_links": pa.array([r[2] for r in rows], pa.int64())})


def test_pagerank_paths_identical(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import pagerank_hosts

    edges1 = ray.data.from_arrow(_toy_edges())
    edges2 = ray.data.from_arrow(_toy_edges())
    local = pagerank_hosts(edges1, iters=4).take_all()
    dist = pagerank_hosts(edges2, iters=4, num_partitions=4,
                          driver_max_edges=0).take_all()
    key = lambda r: r["host"]  # noqa: E731
    assert sorted(local, key=key) == sorted(dist, key=key)
    # total mass conserved within truncation loss, every rank positive
    for r in local:
        assert r["rank_scaled"] > 0


def test_pagerank_rank_ordering(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import pagerank_hosts

    out = {r["host"]: r["rank_scaled"]
           for r in pagerank_hosts(ray.data.from_arrow(_toy_edges()),
                                   iters=8).take_all()}
    # d has no in-links → exactly the base term: (15 * (SCALE//N)) // 100
    assert out["d"] == (15 * (10 ** 12 // 6)) // 100
    # a and c dominate (c collects 4 hosts' mass, a collects all of c's);
    # dangling f sees only d's trickle
    top2 = sorted(out, key=out.get, reverse=True)[:2]
    assert set(top2) == {"a", "c"}
    assert out["f"] < out["b"] < out["c"]


# ---------------------------------------------------------------------------
# connected components over string host ids
# ---------------------------------------------------------------------------

def test_host_components(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import host_components

    edges = pa.table({
        "src_host": ["b", "c", "x", "q"],
        "dst_host": ["a", "b", "y", "q"],
        "n_links": pa.array([1, 1, 1, 1], pa.int64())})
    out = {r["host"]: r["component"]
           for r in host_components(
               ray.data.from_arrow(edges), num_partitions=4).take_all()}
    assert out == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "q": "q"}


def test_hits_paths_identical(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import hits_hosts

    local = hits_hosts(ray.data.from_arrow(_toy_edges()),
                       iters=3).take_all()
    dist = hits_hosts(ray.data.from_arrow(_toy_edges()), iters=3,
                      num_partitions=4, driver_max_edges=0).take_all()
    key = lambda r: r["host"]  # noqa: E731
    assert sorted(local, key=key) == sorted(dist, key=key)


def test_hits_scores_sane(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import HITS_SCALE, hits_hosts

    out = {r["host"]: r for r in hits_hosts(
        ray.data.from_arrow(_toy_edges())).take_all()}
    # c has the heaviest in-weight → the top authority (max-normalized)
    assert out["c"]["authority_scaled"] == HITS_SCALE
    # d points at the top authority with weight 5 → the top hub
    assert out["d"]["hub_scaled"] == HITS_SCALE
    # dangling f links to nothing → zero hub score
    assert out["f"]["hub_scaled"] == 0


def test_doc_link_quality(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import (
        doc_link_quality, host_edges, pagerank_hosts)

    a = ('<head><link rel="canonical" href="https://a.example/p"/></head>'
         '<body><h1>T</h1><p><a href="https://b.example/x">x</a></p></body>')
    b = ('<head><link rel="canonical" href="https://b.example/q"/></head>'
         '<body><h1>T</h1><p><a href="https://a.example/y">y</a></p></body>')
    corpus = ray.data.from_items([_doc_row("d1", a), _doc_row("d2", b)])
    out = {r["doc_id"]: r for r in doc_link_quality(
        corpus, num_partitions=2).take_all()}
    assert out["d1"]["host"] == "a.example"
    assert out["d2"]["host"] == "b.example"
    # ranks agree with the standalone pagerank over the same corpus
    corpus2 = ray.data.from_items([_doc_row("d1", a), _doc_row("d2", b)])
    ranks = {r["host"]: r["rank_scaled"] for r in pagerank_hosts(
        host_edges(corpus2)).take_all()}
    assert out["d1"]["rank_scaled"] == ranks["a.example"]
    assert out["d2"]["rank_scaled"] == ranks["b.example"]


def test_host_degree(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import host_degree

    out = {r["host"]: r for r in host_degree(
        ray.data.from_arrow(_toy_edges())).take_all()}
    assert out["c"]["in_links"] == 9 and out["c"]["in_hosts"] == 4
    assert out["a"]["out_links"] == 4 and out["a"]["out_hosts"] == 2
    assert out["f"]["out_links"] == 0 and out["f"]["in_links"] == 1


# ---------------------------------------------------------------------------
# fuzz: the URL primitives and canonical scan are total functions
# ---------------------------------------------------------------------------

def test_url_functions_total():
    import random

    from docling_ray.functions.urls import (
        is_absolute_http, normalize_url, url_host)

    rng = random.Random(5)
    pool = "htps:/?#@a.bZ09%\x00é 😀[]()"
    for _ in range(3000):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 30)))
        h = url_host(s)
        assert isinstance(h, str)
        assert h == h.lower()
        is_absolute_http(s)
        normalize_url(s)


def test_canonical_scan_on_garbage_html():
    import random

    from docling_ray.stages.html_extract import extract_links

    rng = random.Random(9)
    frags = ['<link rel="canonical"', 'href="https://x.example/p"',
             "<head>", "</head>", "<a href=", '">', "<", ">", "&#x27;",
             "plain text", '<link rel="stylesheet" href="/css">']
    for _ in range(300):
        doc = "".join(rng.choice(frags)
                      for _ in range(rng.randrange(0, 12)))
        out = extract_links(doc)   # must never raise
        for text, href, region in out:
            assert isinstance(href, str) and isinstance(region, str)


def test_webgraph_job_script(tmp_path, ray_session):
    """The ray-job-submit entrypoint writes all four artifact tables
    from a stored corpus."""
    import subprocess
    import sys

    import pyarrow as pa
    import ray.data

    from docling_ray.sources.corpus import write_corpus
    from docling_ray.synth import make_corpus

    inp, _exp = make_corpus(60, seed=17)
    corpus_dir = str(tmp_path / "corpus")
    write_corpus(ray.data.from_arrow(inp), corpus_dir)
    out_dir = str(tmp_path / "wg")
    # run in-process is impossible (owns its Ray session) — subprocess
    r = subprocess.run(
        [sys.executable, "jobs/webgraph_job.py", "--input", corpus_dir,
         "--output", out_dir, "--num-cpus", "4", "--parallelism", "8"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    import pyarrow.parquet as pq
    edges = pq.read_table(out_dir + "/edges")
    ranks = pq.read_table(out_dir + "/ranks")
    degs = pq.read_table(out_dir + "/degrees")
    comps = pq.read_table(out_dir + "/components")
    hosts = set(ranks["host"].to_pylist())
    assert edges.num_rows > 0 and len(hosts) > 0
    assert set(comps["host"].to_pylist()) == hosts
    assert set(degs["host"].to_pylist()) == hosts


def test_trustrank_zero_for_unreached(ray_session):
    """Hosts no seed can reach get ZERO trust; seeds carry the base."""
    import ray.data

    from docling_ray.stages.webgraph import trustrank_hosts

    # hub 'a' (in-degree 9 via b,c) is the only seed at n_seeds=1;
    # isolated pair x->y is unreachable from a's out-edges
    edges = pa.table({
        "src_host": ["b", "c", "a", "x"],
        "dst_host": ["a", "a", "b", "y"],
        "n_links": pa.array([5, 4, 1, 7], pa.int64())})
    out = {r["host"]: r["trust_scaled"] for r in trustrank_hosts(
        ray.data.from_arrow(edges), n_seeds=1).take_all()}
    assert out["x"] == 0 and out["y"] == 0
    assert out["a"] > 0 and out["b"] > 0
    # c has no in-links from the seed component → zero
    assert out["c"] == 0


def test_cocitation_pairs(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import cocitation_pairs

    # s1 and s2 both link to {x, y}; s3 links to {x, z} only
    edges = pa.table({
        "src_host": ["s1", "s1", "s2", "s2", "s3", "s3"],
        "dst_host": ["x", "y", "x", "y", "x", "z"],
        "n_links": pa.array([1, 2, 3, 1, 1, 1], pa.int64())})
    out = cocitation_pairs(ray.data.from_arrow(edges)).take_all()
    assert out == [{"a": "x", "b": "y", "n_common": 2}]


def test_webgraph_queries_match_duckdb(ray_session):
    """Every webgraph registry query vs its DuckDB oracle at sf0.001 —
    the in-suite version of the check_oracles harness (which re-runs
    them at sf0.01/sf0.1)."""
    import importlib.util

    import duckdb
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    E = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(E)
    sf = "/root/testdata/sf0.001"
    qs, sqls = E.queries(), E.oracle_sql(sf)
    con = duckdb.connect()
    for name in ("host_graph", "host_degree", "pagerank_hosts",
                 "hits_hosts", "trustrank_hosts", "host_components",
                 "cocitation_hosts", "doc_link_quality",
                 "host_graph_stats"):
        res = qs[name](sf)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        ora = con.sql(sqls[name]).df()
        assert sorted(df.columns) == sorted(ora.columns), name
        cols = sorted(df.columns)
        a = df[cols].sort_values(cols).reset_index(drop=True)
        b = ora[cols].sort_values(cols).reset_index(drop=True)
        assert len(a) == len(b), name
        for c in cols:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind in "fiu" or bv.dtype.kind in "fiu":
                av = av.astype("int64")
                bv = bv.astype("int64")
            assert (av == bv).all(), f"{name}.{c}"


def test_host_graph_stats(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import host_graph_stats

    edges = pa.table({
        "src_host": ["a", "b", "c", "c"],
        "dst_host": ["b", "a", "c", "d"],
        "n_links": pa.array([2, 1, 5, 1], pa.int64())})
    out = host_graph_stats(ray.data.from_arrow(edges)).to_pylist()[0]
    assert out == {"n_hosts": 4, "n_edges": 4, "n_links": 9,
                   "n_self_loops": 1, "n_reciprocal_edges": 3}


def test_coupling_pairs(ray_session):
    import ray.data

    from docling_ray.stages.webgraph import coupling_pairs

    # s1 and s2 both link to x and y; s3 shares only x with them
    edges = pa.table({
        "src_host": ["s1", "s1", "s2", "s2", "s3"],
        "dst_host": ["x", "y", "x", "y", "x"],
        "n_links": pa.array([1, 1, 1, 1, 1], pa.int64())})
    out = coupling_pairs(ray.data.from_arrow(edges)).take_all()
    assert out == [{"a": "s1", "b": "s2", "n_common": 2}]
