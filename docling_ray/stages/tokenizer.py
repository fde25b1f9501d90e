"""Distributed BPE tokenizer training and encoding.

Training a subword tokenizer is a standard step of a training-data
pipeline (the reference's HybridChunker *consumes* a trained tokenizer,
chunker.py analogue; this is the producer side). The published
algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units", Algorithm 1) iteratively merges the
most frequent adjacent symbol pair — but the iteration runs over the
WORD-FREQUENCY table, not the corpus, so the scalable decomposition is:

1. distributed: ONE per-batch word-count partial + one
   vocabulary-shaped ``groupby`` + a distributed top-V cut
   (count desc, word asc — the same bounded-gather shape as
   ``lm_train``), so the driver never sees more than ``vocab_topk``
   rows no matter the corpus size;
2. local: the merge loop over that bounded table
   (:func:`bpe_merges_from_word_counts`) — corpus-size-independent,
   exactly how production trainers (SentencePiece, HF tokenizers)
   structure BPE training.

Encoding is a stateless ``map_batches`` stage applying the learned
merge ranks greedily (lowest rank first), memoized per distinct word —
web text repeats words heavily, so the per-batch cache collapses the
work to the distinct-word set.

Determinism: pair ties break lexicographically; the top-V word cut
orders by (count desc, word asc). No randomness anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from docling_ray.functions.hashing import tokenize

_END = "</w>"


def _word_counts_partial(batch: pa.Table, text_col: str) -> pa.Table:
    from collections import Counter

    c: Counter = Counter()
    for t in batch[text_col].to_pylist():
        c.update(tokenize(t or ""))
    return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                     "c": pa.array(list(c.values()), pa.int64())})


def corpus_word_counts(ds: "ray.data.Dataset", text_col: str = "text",
                       vocab_topk: int = 65536,
                       min_count: int = 1) -> list[tuple[str, int]]:
    """Top-``vocab_topk`` (word, count) pairs by (count desc, word asc).
    Per-batch Counter partial → one groupby → per-block exact pruning
    (keys are distinct post-groupby) → bounded sort+limit; at most
    ``vocab_topk`` rows reach the driver."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        _word_counts_partial, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col},
    ).groupby("word").aggregate(Sum("c", alias_name="c"))

    def prune(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["c"], min_count))
        if t.num_rows > vocab_topk:
            idx = pc.sort_indices(
                t, sort_keys=[("c", "descending"), ("word", "ascending")])
            t = t.take(idx.slice(0, vocab_topk))
        return t

    top = counts.map_batches(prune, batch_format="pyarrow") \
        .sort(key=["c", "word"], descending=[True, False]) \
        .limit(vocab_topk)
    out: list[tuple[str, int]] = []
    for b in top.iter_batches(batch_format="pyarrow"):
        out.extend(zip(b["word"].to_pylist(),
                       b["c"].to_numpy(zero_copy_only=False).tolist()))
    return out


def bpe_merges_from_word_counts(
    word_counts: list[tuple[str, int]], num_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Sennrich et al. 2016 Algorithm 1 over an aggregated word-count
    table: each word is a symbol sequence (characters + a ``</w>``
    end-of-word marker); each round merges the (count-max, lex-min)
    adjacent pair everywhere it occurs. Stops early when no pair
    reaches ``min_pair_count``. O(num_merges × Σ|word|) on the BOUNDED
    vocab — corpus-size-independent by construction."""
    from collections import Counter

    words: list[tuple[list[str], int]] = [
        (list(w) + [_END], c) for w, c in word_counts if w]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (la, lb), _cnt = best
        joined = la + lb
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == la and syms[i + 1] == lb:
                    syms[i: i + 2] = [joined]
                else:
                    i += 1
        merges.append((la, lb))
    return merges


def bpe_train(ds: "ray.data.Dataset", text_col: str = "text",
              num_merges: int = 200, vocab_topk: int = 65536,
              min_count: int = 1,
              min_pair_count: int = 2) -> pa.Table:
    """Train BPE merges over a corpus: distributed bounded word counts,
    then the local merge loop. Returns (rank, left, right)."""
    wc = corpus_word_counts(ds, text_col, vocab_topk, min_count)
    merges = bpe_merges_from_word_counts(wc, num_merges, min_pair_count)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
    })


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncodeStage:
    """Actor-pool ``map_batches`` stage: text → BPE token count +
    tokens. The merge-rank dict builds once per actor from the
    broadcast merges table; encoding memoizes per distinct word
    (``functools.lru_cache``-free explicit dict so the cache is
    shared across batches within the actor)."""

    def __init__(self, merges_ref) -> None:
        import ray

        merges: pa.Table = ray.get(merges_ref) \
            if not isinstance(merges_ref, pa.Table) else merges_ref
        self.ranks = {
            (l, r): int(k) for k, l, r in zip(
                merges["rank"].to_pylist(), merges["left"].to_pylist(),
                merges["right"].to_pylist())}
        self._cache: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_col: list[list[str]] = []
        for t in batch["text"].to_pylist():
            out: list[str] = []
            for w in tokenize(t or ""):
                enc = self._cache.get(w)
                if enc is None:
                    enc = _encode_word(w, self.ranks)
                    if len(self._cache) < 1 << 20:  # bounded actor state
                        self._cache[w] = enc
                out.extend(enc)
            toks_col.append(out)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pa.array([len(x) for x in toks_col], pa.int64()),
            "bpe_tokens": pa.array(toks_col, pa.list_(pa.string())),
        })


def bpe_encode(ds: "ray.data.Dataset", merges: pa.Table,
               concurrency: int = 4) -> "ray.data.Dataset":
    """Encode ``ds.text`` with trained merges: the merges table ships
    once via ``ray.put`` and each actor builds its rank dict in
    ``__init__`` — never per batch."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(BpeEncodeStage, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_args=(ref,))
