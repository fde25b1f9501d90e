"""Pruned bigram-LM trainer: hand-computed scoring semantics, the
hard broadcast bound on a corpus whose raw vocabulary exceeds the
caps, and deterministic tie-breaks (count desc, gram asc)."""

import numpy as np
import pyarrow as pa

import ray.data

from docling_ray.stages.text_quality import (
    bigram_lm_score,
    lm_score_texts,
    lm_train,
)


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i:03d}" for i in range(len(texts))]),
        "text": pa.array(texts),
    }))


def test_lm_pruned_scoring_hand_computed():
    # tokens [x x x y y z]: uni x:3 y:2 z:1; bi xx:2 xy:1 yy:1 yz:1
    ds = _docs(["x x x y y z"])
    uk, uc, bk, bc = lm_train(ds, min_count=2, vocab_topk=100,
                              bigram_topk=100)
    assert len(uk) == 2 and len(bk) == 1  # {x, y}, {xx}
    n_bi, s = lm_score_texts((uk, uc, bk, bc), ["x x x y y z", "", "x"])
    # xx twice: 2*1e6//3 each; xy/yy/yz pruned -> 0
    assert n_bi.tolist() == [5, 0, 0]
    assert s.tolist() == [2 * (2 * 1_000_000 // 3), 0, 0]


def test_lm_broadcast_hard_bound():
    # 120 distinct words, each appearing twice (min_count-proof), raw
    # bigram vocabulary ~ 120 -- far above the tiny caps
    words = [f"w{i:04d}" for i in range(120)]
    text = " ".join(words + words)
    uk, uc, bk, bc = lm_train(_docs([text]), min_count=1, vocab_topk=5,
                              bigram_topk=7)
    assert len(uk) <= 5 and len(uc) <= 5
    assert len(bk) <= 7 and len(bc) <= 7
    # sorted-key invariant the vectorized lookup relies on
    assert (np.sort(uk) == uk).all() and (np.sort(bk) == bk).all()


def test_lm_topk_tiebreak_gram_asc():
    # all unigrams count 2 -> top-3 must be the 3 smallest grams
    ds = _docs(["b b", "a a", "c c", "d d"])
    uk, uc, _, _ = lm_train(ds, min_count=1, vocab_topk=3, bigram_topk=10)
    from docling_ray.stages.text_quality import _gram_digest
    want = sorted(np.frombuffer(
        b"".join(_gram_digest("u\x1f" + w) for w in ("a", "b", "c")),
        dtype="S16"))
    assert uk.tolist() == want
    assert uc.tolist() == [2, 2, 2]


def test_bigram_lm_score_dataset_roundtrip():
    ds = _docs(["x x x y y z", "y y y y"])
    out = bigram_lm_score(ds).sort("doc_id").take_all()
    by_id = {r["doc_id"]: r for r in out}
    # corpus: uni x:3 y:6 z:1; bi xx:2 xy:1 yy:4 yz:1; pruned at
    # min_count=2 -> uni {x,y}, bi {xx, yy}
    d0 = by_id["d000"]
    assert d0["n_bigrams"] == 5
    # xx twice + yy once; xy/yz pruned
    assert d0["sum_score"] == 2 * (2 * 1_000_000 // 3) + 4 * 1_000_000 // 6
    d1 = by_id["d001"]
    assert d1["n_bigrams"] == 3
    assert d1["sum_score"] == 3 * (4 * 1_000_000 // 6)  # yy thrice
    assert d1["avg_score"] == d1["sum_score"] // 3


def test_hll_string_column_error_bound():
    # string keys take the vectorized polars hash path; the error
    # bound must hold there too (p=12 -> 3 sigma ~ 4.9%)
    import pyarrow as pa

    from docling_ray.stages.sketches import hll_distinct

    n = 50_000
    t = pa.table({"k": pa.array([f"user-{i:06d}" for i in range(n)])})
    ds = ray.data.from_arrow(t).repartition(8)
    est = hll_distinct(ds, "k", p=12)
    assert abs(est - n) / n < 0.05
