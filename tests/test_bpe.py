"""BPE trainer/encoder: the published example pins the merge loop; the
distributed count path must agree exactly with a driver-side Counter."""

import pyarrow as pa
import pytest

from docling_ray.stages.tokenizer import (
    BpeEncodeStage,
    _encode_word,
    bpe_merges_from_word_counts,
    bpe_train,
    corpus_word_counts,
)


def test_sennrich_2016_published_example():
    # Sennrich, Haddow & Birch 2016 §3.2: corpus {low×5, lower×2,
    # newest×6, widest×3}; the first merges are (e,s) → (es,t) →
    # (est,</w>) → (l,o) → (lo,w)
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_merges_from_word_counts(wc, num_merges=5)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o"), ("lo", "w")]


def test_encode_applies_ranks_greedily_and_roundtrips():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_merges_from_word_counts(wc, num_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    assert _encode_word("newest", ranks)[-1].endswith("</w>")
    for w in ("low", "lower", "newest", "widest", "lowest", "zzz"):
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"  # lossless segmentation
    # trained words segment compactly; 'low' is a single learned symbol
    assert _encode_word("low", ranks) == ["low</w>"]
    # an unseen word falls back to characters
    assert _encode_word("zzz", ranks) == ["z", "z", "z", "</w>"]


def test_distributed_counts_match_local(ray_session):
    import ray
    from collections import Counter

    from docling_ray.functions.hashing import tokenize

    texts = [f"alpha beta beta gamma-{i % 7} Alpha" for i in range(50)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(50)]),
        "text": pa.array(texts),
    }))
    got = corpus_word_counts(ds, vocab_topk=1000)
    want = Counter()
    for t in texts:
        want.update(tokenize(t))
    assert dict(got) == dict(want)
    # the top-V cut is (count desc, word asc)
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))


def test_bpe_train_and_encode_end_to_end(ray_session):
    import ray

    texts = ["the quick brown fox", "the quicker browner fox",
             "the quickest fox"] * 10
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(30)]),
        "text": pa.array(texts),
    }))
    merges = bpe_train(ds, num_merges=30)
    assert merges.num_rows > 0
    from docling_ray.stages.tokenizer import bpe_encode

    out = bpe_encode(ds, merges, concurrency=1).to_pandas() \
        .set_index("doc_id")
    # frequent whole words collapse to single symbols + </w>
    assert out.loc["d0", "n_bpe_tokens"] <= 10
    toks = list(out.loc["d0", "bpe_tokens"])
    assert "".join(toks) == "the</w>quick</w>brown</w>fox</w>"


def test_stage_caches_per_actor():
    merges = pa.table({"rank": pa.array([0], pa.int64()),
                       "left": pa.array(["a"], pa.string()),
                       "right": pa.array(["b"], pa.string())})
    st = BpeEncodeStage(merges)
    b = pa.table({"doc_id": pa.array(["x"]),
                  "text": pa.array(["ab ab ab"])})
    out = st(b)
    assert out["n_bpe_tokens"].to_pylist() == [6]  # ('ab','</w>') ×3 words
    assert "ab" in st._cache
