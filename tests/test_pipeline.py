"""End-to-end Ray Data pipeline tests: all three physical plans must produce
identical, expected output; resume must skip finished shards."""

import os

import pyarrow as pa
import pytest

from docling_ray import schema as S
from docling_ray.synth import make_corpus


def _expected_map(exp: pa.Table) -> dict:
    out = {}
    for row in exp.to_pylist():
        out[row["doc_id"]] = (
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]],
            row["status"],
        )
    return out


def _result_map(df) -> dict:
    out = {}
    for row in df.itertuples(index=False):
        out[row.doc_id] = (
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row.spans],
            row.status,
        )
    return out


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(80, seed=5, heavy_tail=False)


@pytest.mark.parametrize("mode", ["fast", "explode", "hybrid"])
def test_modes_match_expected(ray_session, corpus, mode):
    import ray
    from docling_ray.pipelines.extract import extract_corpus

    inp, exp = corpus
    kwargs = {"big_threshold": 20_000} if mode == "hybrid" else {}
    out = extract_corpus(ray.data.from_arrow(inp), mode=mode, **kwargs)
    df = out.to_pandas()
    got = _result_map(df)
    want = _expected_map(exp)
    assert set(got) == set(want)
    bad = [d for d in want if got[d] != want[d]]
    assert bad == [], f"{len(bad)} mismatching docs, first: {bad[:3]}"


def test_hybrid_actually_routes(ray_session, corpus):
    import ray
    from docling_ray.pipelines.extract import add_byte_size

    inp, _ = corpus
    sized = ray.data.from_arrow(inp).map_batches(
        add_byte_size, batch_format="pyarrow"
    )
    sizes = sized.to_pandas()["byte_size"]
    # the threshold used above must split the corpus non-trivially
    assert (sizes > 20_000).sum() > 0 and (sizes <= 20_000).sum() > 0


def test_resume_skips_finished_shards(ray_session, tmp_path):
    import ray
    from docling_ray.pipelines.checkpoint import (
        completed_shards,
        run_resumable,
    )

    inp, exp = make_corpus(40, seed=6, heavy_tail=False)
    corpus_path = str(tmp_path / "corpus")
    ray.data.from_arrow(inp).write_parquet(corpus_path)
    out_dir = str(tmp_path / "out")

    recs1 = run_resumable(corpus_path, out_dir, num_shards=4, mode="fast")
    assert completed_shards(out_dir) == {0, 1, 2, 3}
    assert sum(r["n_docs"] for r in recs1) == 40
    # simulate a partial failure: drop one shard's manifest + output
    os.remove(os.path.join(out_dir, "_manifest", "shard-0002.json"))
    recs2 = run_resumable(corpus_path, out_dir, num_shards=4, mode="fast")
    # untouched shards kept their original metrics records (not recomputed)
    assert [r["wall_sec"] for r in recs1 if r["shard"] != 2] == [
        r["wall_sec"] for r in recs2 if r["shard"] != 2
    ]
    # full output equals expectations
    import pyarrow.dataset as pads
    tbl = pads.dataset(out_dir + "", format="parquet",
                       exclude_invalid_files=True).to_table()
    got = _result_map(tbl.to_pandas())
    want = _expected_map(exp)
    assert got == want


def test_resume_rejects_mismatched_args(ray_session, tmp_path):
    import pytest
    import ray
    from docling_ray.pipelines.checkpoint import run_resumable

    inp, _ = make_corpus(20, seed=7, heavy_tail=False)
    corpus_path = str(tmp_path / "corpus")
    ray.data.from_arrow(inp).write_parquet(corpus_path)
    out_dir = str(tmp_path / "out")
    run_resumable(corpus_path, out_dir, num_shards=2, mode="fast")
    # resuming with a different shard count or input must refuse, not
    # silently skip shards whose ids happen to exist
    with pytest.raises(ValueError, match="num_shards"):
        run_resumable(corpus_path, out_dir, num_shards=4, mode="fast")
    with pytest.raises(ValueError, match="written from"):
        run_resumable(str(tmp_path / "other"), out_dir, num_shards=2,
                      mode="fast")


def test_output_schema_stable(ray_session, corpus):
    import ray
    from docling_ray.pipelines.extract import extract_corpus

    inp, _ = corpus
    out = extract_corpus(ray.data.from_arrow(inp), mode="fast")
    assert [f.name for f in out.schema().base_schema] == [
        f.name for f in S.OUTPUT_SCHEMA
    ]


def test_rebalance_by_bytes(ray_session):
    import ray
    from docling_ray.pipelines.extract import add_byte_size, rebalance_by_bytes

    inp, exp = make_corpus(60, seed=21, heavy_tail=False)
    ds = ray.data.from_arrow(inp)
    out = rebalance_by_bytes(ds, target_bytes=50_000)
    # no rows lost, content identical
    assert out.count() == 60
    sizes = out.map_batches(add_byte_size, batch_format="pyarrow").to_pandas()
    orig = ds.map_batches(add_byte_size, batch_format="pyarrow").to_pandas()
    assert sorted(sizes.doc_id) == sorted(orig.doc_id)
    # extraction over rebalanced input still matches expectations
    from docling_ray.pipelines.extract import extract_corpus

    got = _result_map(extract_corpus(out, mode="fast").to_pandas())
    assert got == _expected_map(exp)
