"""Sketch correctness: HLL/KMV error bounds, merge-exactness, and the
deterministic bottom-k sample vs a DuckDB recomputation."""

import random

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from docling_ray.stages.sketches import (
    bottomk_sample,
    hll_distinct,
    kmv_distinct,
)


def _ids_table(n: int, dup: int = 1) -> pa.Table:
    ids = np.repeat(np.arange(n, dtype=np.int64) * 2654435761 % (1 << 31),
                    dup)
    return pa.table({"user_id": pa.array(ids)})


def test_hll_error_bound():
    n = 50_000
    ds = ray.data.from_arrow(_ids_table(n)).repartition(8)
    est = hll_distinct(ds, "user_id", p=12)
    assert abs(est - n) / n < 0.05  # 3 sigma at p=12 is ~4.9%


def test_hll_duplicates_do_not_inflate():
    n = 2_000
    ds = ray.data.from_arrow(_ids_table(n, dup=25)).repartition(8)
    est = hll_distinct(ds, "user_id", p=12)
    # 2000 << 2.5*m so the linear-counting path is near-exact
    assert abs(est - n) / n < 0.02


def test_hll_partitioning_invariant():
    """max-merge is associative/commutative: the estimate cannot depend
    on how blocks were cut."""
    t = _ids_table(10_000)
    a = hll_distinct(ray.data.from_arrow(t).repartition(2), "user_id")
    b = hll_distinct(ray.data.from_arrow(t).repartition(16), "user_id")
    assert a == b


def test_hll_string_keys():
    t = pa.table({"k": pa.array([f"doc-{i}" for i in range(3000)])})
    est = hll_distinct(ray.data.from_arrow(t).repartition(4), "k")
    assert abs(est - 3000) / 3000 < 0.05


def test_kmv_exact_below_k():
    t = _ids_table(100, dup=7)
    assert kmv_distinct(ray.data.from_arrow(t).repartition(5),
                        "user_id", k=256) == 100


def test_kmv_error_bound():
    n = 30_000
    ds = ray.data.from_arrow(_ids_table(n, dup=2)).repartition(8)
    est = kmv_distinct(ds, "user_id", k=256)
    assert abs(est - n) / n < 0.2  # 3 sigma at k=256 is ~19%


def test_bottomk_matches_duckdb():
    t = pa.table({"doc_id": pa.array([f"d{i:05d}" for i in range(5000)])})
    got = bottomk_sample(ray.data.from_arrow(t).repartition(7),
                         k=50, id_col="doc_id").to_pandas()
    want = duckdb.sql(
        "SELECT doc_id, md5(doc_id) AS h FROM t "
        "ORDER BY h LIMIT 50").df()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.h) == list(want.h)


def test_bottomk_partitioning_invariant():
    t = pa.table({"doc_id": pa.array([f"x{i}" for i in range(2000)])})
    a = bottomk_sample(ray.data.from_arrow(t).repartition(2),
                       k=20, id_col="doc_id").to_pandas()
    b = bottomk_sample(ray.data.from_arrow(t).repartition(13),
                       k=20, id_col="doc_id").to_pandas()
    assert list(a.h) == list(b.h)


def test_mixture_sample_quotas_and_invariance():
    from docling_ray.stages.sketches import mixture_sample

    t = pa.table({
        "doc_id": pa.array(list(range(600)), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(600)]),
    })
    quotas = {"s0": 7, "s1": 3}  # s2 drops entirely
    a = mixture_sample(ray.data.from_arrow(t).repartition(2),
                       quotas, key_col="source").to_pandas()
    b = mixture_sample(ray.data.from_arrow(t).repartition(17),
                       quotas, key_col="source").to_pandas()
    assert list(a.doc_id) == list(b.doc_id)
    assert a.source.value_counts().to_dict() == {"s0": 7, "s1": 3}
    # per-source hashes are each source's true bottom-k
    import hashlib
    for src, q in quotas.items():
        ids = [i for i in range(600) if f"s{i % 3}" == src]
        want = sorted(hashlib.md5(str(i).encode()).hexdigest()
                      for i in ids)[:q]
        assert sorted(a[a.source == src].h) == want


def test_curate_job_script(tmp_path, ray_session):
    """The submittable curation job writes source-partitioned output
    matching the quotas (same surface `ray job submit` drives)."""
    import subprocess
    import sys

    out = tmp_path / "curated"
    r = subprocess.run(
        [sys.executable, "jobs/curate_job.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(out),
         "--quotas", "src0=3,src1=2", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb

    got = duckdb.sql(
        f"SELECT source, count(*) FROM read_parquet("
        f"'{out}/**/*.parquet', hive_partitioning=1) "
        f"GROUP BY 1 ORDER BY 1").fetchall()
    assert dict(got) == {"src0": 3, "src1": 2}


def test_heavy_hitters_guarantee():
    """Misra-Gries: every item with true frequency > N/k survives, and
    reported weights never exceed true counts nor undershoot by > N/k."""
    from collections import Counter

    from docling_ray.stages.sketches import heavy_hitters

    rng = random.Random(19)
    vals = ([7] * 4000 + [13] * 2500 + [21] * 1200
            + [rng.randrange(10_000, 99_999) for _ in range(2300)])
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    true = Counter(vals)
    n = len(vals)
    k = 32
    for parts in (3, 11):
        out = heavy_hitters(ray.data.from_arrow(t).repartition(parts),
                            "v", k=k).to_pandas()
        got = dict(zip(out.item, out.min_count))
        for item, c in true.items():
            if c > n / k:
                assert str(item) in got, item
        for item, w in got.items():
            c = true[int(item)]
            assert w <= c and c - w <= n / k, (item, w, c)
    # the three planted heavy items lead the report
    assert set(out.item[:3]) == {"7", "13", "21"}


def test_kll_rank_error():
    """KLL quantile values land within 1% rank error of exact, across
    three distributions, purely deterministic (two runs identical)."""
    import numpy as np

    from docling_ray.stages.sketches import KLLSketch

    rng = np.random.RandomState(7)
    dists = {
        "uniform": rng.randint(0, 1_000_000, 50_000),
        "zipfy": (1_000.0 / (rng.pareto(1.5, 50_000) + 1)).astype(int),
        "steps": np.repeat(np.arange(100), 500),
    }
    for name, vals in dists.items():
        vals = vals.astype(np.int64)
        sk = KLLSketch(k=512)
        for chunk in np.array_split(vals, 23):
            sk.add_block(chunk)
        srt = np.sort(vals)
        n = len(vals)
        for q in (0.1, 0.5, 0.9, 0.95, 0.99):
            got = sk.quantile(q)
            # rank of the returned value in the exact data
            lo = np.searchsorted(srt, got, side="left") / n
            hi = np.searchsorted(srt, got, side="right") / n
            assert lo - 0.01 <= q <= hi + 0.01, (name, q, got, lo, hi)


def test_kll_merge_matches_single():
    """Merging two half-sketches stays within the pinned error too, and
    the merge is deterministic."""
    import numpy as np

    from docling_ray.stages.sketches import KLLSketch

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 10_000, 40_000).astype(np.int64)
    a, b = KLLSketch(256), KLLSketch(256)
    a.add_block(vals[:20_000])
    b.add_block(vals[20_000:])
    m1 = a.merge(b)
    m2 = a.merge(b)
    assert m1.n == 40_000
    assert [m1.quantile(q) for q in (0.25, 0.5, 0.75)] == \
        [m2.quantile(q) for q in (0.25, 0.5, 0.75)]
    srt = np.sort(vals)
    n = len(vals)
    for q in (0.25, 0.5, 0.75):
        got = m1.quantile(q)
        lo = np.searchsorted(srt, got, "left") / n
        hi = np.searchsorted(srt, got, "right") / n
        assert lo - 0.02 <= q <= hi + 0.02


def test_approx_quantiles_vs_exact(ray_session):
    """The registry query's KLL output tracks the exact event_quantiles
    within 1% rank error per group at sf0.001."""
    import importlib.util

    import numpy as np
    import pyarrow as pa

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf = "/root/testdata/sf0.001"
    approx = mod.queries()["approx_quantiles"](sf).to_pandas()
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    ev = con.sql("SELECT event_type, CAST(floor(value*100+0.5) AS BIGINT) v "
                 "FROM events").df()
    for _, row in approx.iterrows():
        grp = np.sort(ev[ev.event_type == row.event_type].v.values)
        n = len(grp)
        assert row.n_events == n
        for q, col in ((0.5, "p50_x100"), (0.95, "p95_x100")):
            got = row[col]
            lo = np.searchsorted(grp, got, "left") / n
            hi = np.searchsorted(grp, got, "right") / n
            assert lo - 0.01 <= q <= hi + 0.01, (row.event_type, q)
