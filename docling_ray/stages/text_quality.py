"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting.

All kernels are vectorized ``map_batches`` stages over the ``documents``
table. The token/stopword/fingerprint definitions are chosen to be exactly
expressible in ANSI SQL (DuckDB) so every operator is oracle-checkable:
tokens = ``[a-z0-9]+`` over lowercased text; fingerprint = MD5 of
lowercased whitespace-collapsed text.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

from docling_ray.functions.hashing import content_md5, normalized_fingerprint, tokenize

# Fixed stopword list — mirrored verbatim in the oracle SQL literal.
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "on", "with")
_STOP_SET = frozenset(STOPWORDS)


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → per-doc token statistics (oracle-checkable)."""
    texts = batch["text"].to_pylist()
    n_tokens = np.empty(len(texts), dtype=np.int64)
    n_stop = np.empty(len(texts), dtype=np.int64)
    tok_chars = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = tokenize(t or "")
        n_tokens[i] = len(toks)
        n_stop[i] = sum(1 for w in toks if w in _STOP_SET)
        tok_chars[i] = sum(len(w) for w in toks)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_stop": pa.array(n_stop),
            "tok_chars": pa.array(tok_chars),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring stage: ratios + keep flag (C4/Gopher-style length and
    stopword filters, simplified to stay SQL-expressible)."""
    stats = token_stats_batch(batch)
    n_tokens = stats["n_tokens"].to_numpy()
    n_stop = stats["n_stop"].to_numpy()
    tok_chars = stats["tok_chars"].to_numpy()
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    # floor-scaled integers, not rounded doubles: floor after identical IEEE
    # division is deterministic across engines (see pipelines/analytics.py)
    stop_ratio_ppm = np.floor(n_stop * 1_000_000.0 / denom).astype(np.int64)
    avg_token_len_ppm = np.floor(tok_chars * 1_000_000.0 / denom).astype(np.int64)
    keep = (n_tokens >= 5) & (n_tokens <= 100_000) & (stop_ratio_ppm >= 10_000)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": stats["n_tokens"],
            "n_stop": stats["n_stop"],
            "stop_ratio_ppm": pa.array(stop_ratio_ppm),
            "avg_token_len_ppm": pa.array(avg_token_len_ppm),
            "keep": pa.array(keep),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → MD5 fingerprints: raw and normalized."""
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "content_hash": pa.array([content_md5(t or "") for t in texts]),
            "fingerprint": pa.array(
                [normalized_fingerprint(t or "") for t in texts]
            ),
        }
    )


# ---------------------------------------------------------------------------
# Language ID — character n-gram + stopword heuristic (no model download).
# Stateful profile tables → actor-pool stage (class form), mirroring the
# reference's load-once-in-__init__ engines (SURVEY.md §7.2).
# ---------------------------------------------------------------------------

_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that for on with as are".split()),
    "fr": frozenset("le la les de des et un une est dans que pour sur avec ne pas".split()),
    "de": frozenset("der die das und ist von zu mit den nicht ein eine auf für".split()),
    "es": frozenset("el la los las de y un una es en que por con para no se".split()),
    "it": frozenset("il lo la gli le di e un una è che per con non si del".split()),
    "pt": frozenset("o a os as de e um uma é que para com não se do da em".split()),
}

_LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", " th", "he ", "ing", "nd ", "ion", " an", "er ", " of", "of "),
    "fr": ("es ", " de", "de ", "le ", " le", "ent", "ion", "la ", " la", "que"),
    "de": ("en ", "er ", "ch ", "der", " de", "ein", "sch", "ich", "nde", "die"),
    "es": (" de", "de ", "os ", "la ", " la", "el ", " el", "que", " qu", "ión"),
    "it": (" di", "di ", "to ", "la ", " la", "re ", "che", " ch", "one", "ell"),
    "pt": (" de", "de ", "os ", " a ", "ão ", "do ", " do", "da ", " da", "que"),
}


class LangIdModel:
    """Callable-class stage for ``map_batches(LangIdModel, concurrency=N)``:
    profile tables built once per actor, scored per batch."""

    def __init__(self) -> None:
        # explicit Latin word-char class (not \w) so DuckDB's RE2 regex can
        # reproduce the token stream exactly — the classifier is fully
        # SQL-expressible and oracle-checked (see __ray_entry__ lang_id)
        self.word_re = re.compile(r"[a-zß-öø-ÿ]+")
        self.tri_index: dict[str, dict[str, int]] = {
            lang: {g: i for i, g in enumerate(tris)}
            for lang, tris in _LANG_TRIGRAMS.items()
        }

    def classify(self, text: str) -> tuple[str, float]:
        text_l = (text or "").lower()
        words = self.word_re.findall(text_l)
        scores: dict[str, float] = {}
        for lang, stops in _LANG_STOPWORDS.items():
            sw = sum(1 for w in words if w in stops) / max(1, len(words))
            padded = f" {text_l} "
            tri = sum(padded.count(g) for g in _LANG_TRIGRAMS[lang]) / max(
                1, len(text_l)
            )
            scores[lang] = 2.0 * sw + tri
        best = max(scores, key=scores.get)  # ties: dict order (deterministic)
        total = sum(scores.values()) or 1.0
        conf = scores[best] / total
        if scores[best] < 1e-3:
            return "und", 0.0
        return best, conf

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for t in batch["text"].to_pylist():
            lang, conf = self.classify(t or "")
            preds.append(lang)
            confs.append(round(conf, 6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds),
                "confidence": pa.array(confs, type=pa.float64()),
            }
        )


def shannon_entropy(text: str) -> float:
    """Character entropy (bits/char) — a cheap gibberish signal."""
    if not text:
        return 0.0
    counts: dict[str, int] = {}
    for ch in text:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(text)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style intra-document repetition signals (Rae et al. 2021's
    repetition filters, word-granular because the corpus is single-line):
    duplicate-word fraction, top-word fraction, and top word-bigram
    fraction, each as an exact integer ppm (count * 1e6 // denominator —
    integer arithmetic, no float parity concerns). Docs with zero words
    drop out (mirrors the SQL oracle's inner aggregation). Stateless
    vectorized-per-batch map; the per-doc Counter is C-backed."""
    from collections import Counter

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_id, out_n, out_dup, out_top, out_big = [], [], [], [], []
    for doc_id, text in zip(ids, texts):
        words = [w for w in (text or "").split(" ") if w]
        n = len(words)
        if n == 0:
            continue
        cnt = Counter(words)
        big = Counter(zip(words, words[1:]))
        out_id.append(doc_id)
        out_n.append(n)
        out_dup.append((n - len(cnt)) * 1_000_000 // n)
        out_top.append(max(cnt.values()) * 1_000_000 // n)
        out_big.append((max(big.values()) if big else 0)
                       * 1_000_000 // max(n - 1, 1))
    return pa.table({
        "doc_id": pa.array(out_id, batch["doc_id"].type),
        "n_words": pa.array(out_n, pa.int64()),
        "dup_word_ppm": pa.array(out_dup, pa.int64()),
        "top_word_ppm": pa.array(out_top, pa.int64()),
        "top_bigram_ppm": pa.array(out_big, pa.int64()),
    })


# ---------------------------------------------------------------------------
# TF-IDF top terms — corpus document frequency broadcast, per-doc scoring.
# ---------------------------------------------------------------------------

def _df_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial document frequency: one (token, ndocs) row per
    distinct token per batch — pre-aggregated so the ``groupby`` shuffle
    moves vocabulary-sized partials, never per-occurrence rows."""
    from collections import Counter

    cnt: Counter = Counter()
    for t in batch[text_col].to_pylist():
        for tok in set(tokenize(t or "")):
            cnt[tok] += 1
    items = sorted(cnt.items())
    return pa.table({
        "token": pa.array([k for k, _ in items], pa.string()),
        "df": pa.array([v for _, v in items], pa.int64()),
    })


def tfidf_topk(
    ds: "ray.data.Dataset",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Per-document top-``k`` distinctive terms by TF-IDF with a *linear*
    inverse document frequency: ``score = tf * N * 1e6 // df`` (integer
    arithmetic end to end — monotone in tf·(N/df), no float log so the
    DuckDB oracle matches bit for bit; see the float policy in
    pipelines/analytics.py). Ties break by token ascending.

    Scale shape: DF is a per-batch partial count + one vocabulary-sized
    ``groupby(token).sum`` shuffle; the resulting DF table is
    language-vocabulary-sized (millions of rows at web scale, not
    corpus-sized) so it is gathered once and ``ray.put`` broadcast; the
    scoring pass streams with no shuffle. No reference analogue
    (SURVEY.md §4); semantics defined here, oracle-checked.

    Output: (doc_id, rank, token, tf, df, score), rank in 1..k.
    """
    import ray
    from ray.data.aggregate import Sum

    n_docs = ds.count()
    df_tbl = ds.map_batches(
        _df_partial, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col},
    ).groupby("token").aggregate(Sum("df", alias_name="df"))
    df_map: dict[str, int] = {}
    for b in df_tbl.iter_batches(batch_format="pyarrow"):
        df_map.update(zip(b["token"].to_pylist(),
                          b["df"].to_numpy(zero_copy_only=False).tolist()))
    df_ref = ray.put(df_map)

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        dfs = ray.get(df_ref)  # object-store read, once per task
        out_id, out_rank, out_tok, out_tf, out_df, out_score = (
            [], [], [], [], [], [])
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            tf = Counter(tokenize(t or ""))
            scored = sorted(
                ((-(c * n_docs * 1_000_000 // dfs[tok]), tok, c)
                 for tok, c in tf.items()),
            )[:k]
            for rank, (neg, tok, c) in enumerate(scored, start=1):
                out_id.append(did)
                out_rank.append(rank)
                out_tok.append(tok)
                out_tf.append(c)
                out_df.append(dfs[tok])
                out_score.append(-neg)
        return pa.table({
            "doc_id": pa.array(out_id, batch[id_col].type),
            "rank": pa.array(out_rank, pa.int64()),
            "token": pa.array(out_tok, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
            "df": pa.array(out_df, pa.int64()),
            "score": pa.array(out_score, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _lm_counts_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial: tagged unigram + bigram counts in one pass
    (one row per distinct key per batch — the pre-aggregation rule)."""
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in batch[text_col].to_pylist():
        toks = tokenize(t or "")
        uni.update(toks)
        bi.update("\x1f".join(p) for p in zip(toks, toks[1:]))
    keys = ["u\x1f" + k for k in uni] + ["b\x1f" + k for k in bi]
    cnts = list(uni.values()) + list(bi.values())
    return pa.table({"key": pa.array(keys, pa.string()),
                     "c": pa.array(cnts, pa.int64())})


# Default LM pruning bounds. min_count drops hapax grams (the long
# tail that dominates a web corpus vocabulary); the top-K caps are the
# HARD bound on the broadcast model regardless of corpus size — a
# KenLM-style quality filter needs the frequent head of the
# distribution, not the tail (CCNet prunes its LM the same way).
LM_MIN_COUNT = 2
LM_VOCAB_TOPK = 262_144
LM_BIGRAM_TOPK = 1_048_576


def _gram_digest(key: str) -> bytes:
    """128-bit blake2b digest of a tagged gram key. The model stores
    digests, not strings: fixed-width ``S16`` numpy arrays are
    zero-copy out of the object store (one copy per NODE, not per
    worker) and support vectorized ``searchsorted`` lookup. 128 bits
    makes a collision across even a billion-entry vocabulary
    negligible (~1e-20)."""
    import hashlib

    return hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()


def _topk_counts(counts_tbl: "ray.data.Dataset", prefix: str, k: int,
                 min_count: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (count desc, key asc) rows of one tag of the aggregated
    gram-count table, as (sorted digest S16 array, aligned int64
    counts). Per-block partial top-k (keys are distinct post-groupby,
    so block-local pruning is exact) keeps the sort shuffle bounded by
    k × blocks; only k rows ever reach the driver."""
    import pyarrow.compute as pc

    def prune(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.starts_with(t["key"], pattern=prefix),
                       pc.greater_equal(t["c"], min_count))
        t = t.filter(mask)
        if t.num_rows > k:
            idx = pc.sort_indices(
                t, sort_keys=[("c", "descending"), ("key", "ascending")])
            t = t.take(idx.slice(0, k))
        return t

    top = counts_tbl.map_batches(prune, batch_format="pyarrow") \
        .sort(key=["c", "key"], descending=[True, False]).limit(k)
    keys: list[str] = []
    cnts: list[int] = []
    for b in top.iter_batches(batch_format="pyarrow"):
        keys.extend(b["key"].to_pylist())
        cnts.extend(b["c"].to_numpy(zero_copy_only=False).tolist())
    dig = np.frombuffer(b"".join(_gram_digest(s) for s in keys), dtype="S16")
    c = np.asarray(cnts, dtype=np.int64)
    order = np.argsort(dig, kind="stable")
    return np.ascontiguousarray(dig[order]), np.ascontiguousarray(c[order])


def lm_train(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    min_count: int = LM_MIN_COUNT,
    vocab_topk: int = LM_VOCAB_TOPK,
    bigram_topk: int = LM_BIGRAM_TOPK,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Train a PRUNED corpus bigram model: (uni_keys, uni_counts,
    bi_keys, bi_counts), keys sorted S16 digests. Counting is a
    per-batch tagged partial + ONE vocabulary-sized groupby; pruning
    (count >= min_count, then top-K by count desc / gram asc) happens
    distributed, so the driver gather and the broadcast are bounded by
    vocab_topk + bigram_topk entries no matter the corpus size —
    unpruned web-scale vocabularies are corpus-proportional and must
    never be broadcast."""
    from ray.data.aggregate import Sum

    counts_tbl = ds.map_batches(
        _lm_counts_partial, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col},
    ).groupby("key").aggregate(Sum("c", alias_name="c")).materialize()
    uk, uc = _topk_counts(counts_tbl, "u\x1f", vocab_topk, min_count)
    bk, bc = _topk_counts(counts_tbl, "b\x1f", bigram_topk, min_count)
    return uk, uc, bk, bc


def _lookup_counts(keys: np.ndarray, counts: np.ndarray,
                   probes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (found, count) lookup of S16 probes in a sorted model
    column. Missing probes get found=False, count=1 (safe divisor)."""
    if len(keys) == 0 or len(probes) == 0:
        n = len(probes)
        return np.zeros(n, dtype=bool), np.ones(n, dtype=np.int64)
    idx = np.searchsorted(keys, probes)
    clip = np.minimum(idx, len(keys) - 1)
    found = keys[clip] == probes
    c = np.where(found, counts[clip], 1)
    return found, c


def lm_score_texts(
    model: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    texts: list[str | None],
) -> tuple[np.ndarray, np.ndarray]:
    """Score a batch of texts against a pruned model: per-doc
    (n_bigrams, sum_score) where each bigram contributes
    ``1e6 * c(w1,w2) // c(w1)`` if BOTH the bigram and its unigram
    context survived pruning, else 0 (the unseen-gram floor). The
    lookups and arithmetic are one vectorized pass over the whole
    batch's gram stream."""
    uk, uc, bk, bc = model
    n = len(texts)
    n_bi = np.zeros(n, np.int64)
    hb: list[bytes] = []
    hu: list[bytes] = []
    offs = np.zeros(n + 1, np.int64)
    for i, t in enumerate(texts):
        toks = tokenize(t or "")
        for w1, w2 in zip(toks, toks[1:]):
            hb.append(_gram_digest("b\x1f" + w1 + "\x1f" + w2))
            hu.append(_gram_digest("u\x1f" + w1))
        n_bi[i] = max(len(toks) - 1, 0)
        offs[i + 1] = len(hb)
    if not hb:
        return n_bi, np.zeros(n, np.int64)
    hb_a = np.frombuffer(b"".join(hb), dtype="S16")
    hu_a = np.frombuffer(b"".join(hu), dtype="S16")
    fb, cb = _lookup_counts(bk, bc, hb_a)
    fu, cu = _lookup_counts(uk, uc, hu_a)
    contrib = np.where(fb & fu, cb * 1_000_000 // cu, 0)
    csum = np.concatenate(([0], np.cumsum(contrib)))
    return n_bi, (csum[offs[1:]] - csum[offs[:-1]]).astype(np.int64)


def bigram_lm_score(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = LM_MIN_COUNT,
    vocab_topk: int = LM_VOCAB_TOPK,
    bigram_topk: int = LM_BIGRAM_TOPK,
) -> "ray.data.Dataset":
    """Statistical language-model quality scoring — the KenLM-style
    filter of web-scale training pipelines (e.g. CCNet), rebuilt with
    integer arithmetic so the DuckDB oracle matches bit for bit: train
    a PRUNED corpus bigram model (count >= min_count, then top-K by
    count desc / gram asc — mirrored exactly in the oracle SQL via
    QUALIFY row_number()), then score every document by the mean
    conditional-probability of its bigrams,
    ``score(w1,w2) = 1e6 * count(w1 w2) // count(w1)`` (floor — no
    float log-prob; monotone in P(w2|w1), which is what a quality
    threshold needs); bigrams pruned out of the model contribute 0
    (the unseen-gram floor).

    Scale shape: counting is a per-batch tagged partial (unigrams +
    bigrams in one pass) and ONE vocabulary-sized groupby; pruning is
    distributed (per-block partial top-k, then sort+limit), so the
    broadcast model is HARD-BOUNDED at vocab_topk + bigram_topk
    entries regardless of corpus vocabulary — stored as sorted S16
    digest numpy arrays (zero-copy per node out of the object store,
    vectorized searchsorted lookup). The scoring pass streams with no
    shuffle. No reference analogue (SURVEY.md §4).

    Output: (doc_id, n_bigrams, sum_score, avg_score) — avg is the
    floor mean, 0 for docs with < 2 tokens — ordered by doc_id.
    """
    import ray

    model_ref = ray.put(lm_train(ds, text_col, min_count,
                                 vocab_topk, bigram_topk))

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)  # object-store read, once per task
        n_bi, s = lm_score_texts(m, batch[text_col].to_pylist())
        avg = np.where(n_bi > 0, s // np.maximum(n_bi, 1), 0)
        return pa.table({
            "doc_id": batch[id_col],
            "n_bigrams": pa.array(n_bi),
            "sum_score": pa.array(s),
            "avg_score": pa.array(avg),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def source_quality_report(
    ds: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Corpus health report per source domain — the per-provider quality
    dashboard every ingestion pipeline publishes: doc counts, quality
    keep-rate (floor ppm), token volume and dedup pressure (distinct
    content hashes vs docs). One per-batch partial + one domain-sized
    groupby; exact-dup pressure pre-reduces as per-batch distinct
    hashes then a (hash, source) groupby — one row per distinct hash
    per batch. Output: (source, n_docs, n_kept, kept_ppm, sum_tokens,
    n_distinct) ordered by source."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        t = pa.table({
            "source": batch["source"],
            "kept": q["keep"].cast(pa.int64()),
            "toks": q["n_tokens"].cast(pa.int64()),
        })
        g = pa.TableGroupBy(t, "source").aggregate(
            [("kept", "sum"), ("toks", "sum"), ([], "count_all")])
        return pa.table({
            "source": g["source"],
            "n_kept": g["kept_sum"],
            "sum_tokens": g["toks_sum"],
            "n_docs": g["count_all"].cast(pa.int64()),
        })

    stats = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("source") \
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_kept", alias_name="n_kept"),
                   Sum("sum_tokens", alias_name="sum_tokens"))

    def hash_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "h": pa.array([content_md5(x or "")
                           for x in batch["text"].to_pylist()]),
            "source": batch["source"],
        })
        return pa.TableGroupBy(t, ["h", "source"]).aggregate([])

    distinct = ds.map_batches(hash_partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby(["h", "source"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: pa.TableGroupBy(
            t.select(["source"]), "source").aggregate([([], "count_all")])
            .rename_columns(["source", "n_distinct"]),
            batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_distinct",
                                         alias_name="n_distinct"))

    # both sides are domain-sized: a tag co-group joins them without
    # any corpus-scale movement
    import ray as _ray  # noqa: F401  (parity with module convention)

    s_pd = stats.to_pandas().set_index("source")
    d_pd = distinct.to_pandas().set_index("source")
    joined = s_pd.join(d_pd, how="left").fillna(0).reset_index() \
        .sort_values("source")
    out = pa.table({
        "source": pa.array(joined.source, pa.string()),
        "n_docs": pa.array(joined.n_docs, pa.int64()),
        "n_kept": pa.array(joined.n_kept, pa.int64()),
        "kept_ppm": pa.array(
            (joined.n_kept.astype("int64") * 1_000_000
             // joined.n_docs.astype("int64")), pa.int64()),
        "sum_tokens": pa.array(joined.sum_tokens, pa.int64()),
        "n_distinct": pa.array(joined.n_distinct, pa.int64()),
    })
    import ray.data as _rd

    return _rd.from_arrow(out)


def dsir_weights(
    ds: "ray.data.Dataset",
    target_col: str = "lang",
    target_val: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = LM_MIN_COUNT,
    vocab_topk: int = LM_VOCAB_TOPK,
    bigram_topk: int = LM_BIGRAM_TOPK,
) -> "ray.data.Dataset":
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much more
    target-like than corpus-average its bigrams read. Two PRUNED bigram
    models train the same way as :func:`bigram_lm_score` — one on the
    target slice (rows where ``target_col == target_val``), one on the
    whole corpus — and the weight is the integer difference of the two
    sum-scores, ``Σ (1e6·c_t(w1w2)//c_t(w1)) − Σ (1e6·c_s(w1w2)//c_s(w1))``
    (monotone in the target-vs-source likelihood ratio the paper ranks
    by, with pruning standing in for its hash-bucket compression; floor
    integer arithmetic so the DuckDB oracle matches bit for bit).

    Scale shape: each model is the hard-bounded lm_train broadcast
    (min-count + top-K pruning — never corpus-vocabulary-sized); the
    scoring pass streams once with both models read zero-copy from the
    object store. Selection is then a threshold or top-k over the
    weight column. Output: (doc_id, n_bigrams, weight) by doc_id."""
    import ray

    target = ds.filter(expr=f"{target_col} == '{target_val}'")
    model_t = ray.put(lm_train(target, text_col, min_count,
                               vocab_topk, bigram_topk))
    model_s = ray.put(lm_train(ds, text_col, min_count,
                               vocab_topk, bigram_topk))

    def score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n_bi, s_t = lm_score_texts(ray.get(model_t), texts)
        _, s_s = lm_score_texts(ray.get(model_s), texts)
        return pa.table({
            "doc_id": batch[id_col],
            "n_bigrams": pa.array(n_bi),
            "weight": pa.array(s_t - s_s),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def c4_signals_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id",
                     min_words: int = 30) -> pa.Table:
    """C4/FineWeb-style document quality signals (Raffel et al. 2020
    §2.2, arXiv:1910.10683; the reference has no corpus-filter stage —
    this belongs to the LLM-training-data op set): per document the
    line-level terminal-punctuation counts, short-line count (<5 words —
    C4 drops them), total word count, and the classic boilerplate
    markers (``lorem ipsum``; ``{`` = C4's javascript/code rule), plus
    the integer-exact keep decision: no markers, ``>= min_words`` words,
    and terminal-punctuated lines at least a third of all lines
    (``3*term_lines >= n_lines``; C4 keeps punctuation-terminated lines
    — we grade the whole doc by that ratio so the op stays a row-level
    signal table a downstream filter consumes).

    Fully vectorized (polars string/list kernels — no per-row Python);
    all outputs int64 so the DuckDB oracle compares exact integers.
    Stateless map stage: scales as a pure streaming pass."""
    import polars as pl

    df = pl.from_arrow(batch.select([id_col, text_col]))
    ls = pl.col(text_col).str.split("\n")
    sig = df.select(
        pl.col(id_col),
        ls.list.len().cast(pl.Int64).alias("n_lines"),
        ls.list.eval(
            pl.element().str.contains(r'[.!?"]$').cast(pl.Int64)
        ).list.sum().alias("term_lines"),
        ls.list.eval(
            (pl.element().str.to_lowercase()
             .str.count_matches(r"[a-z0-9]+") < 5).cast(pl.Int64)
        ).list.sum().alias("short_lines"),
        pl.col(text_col).str.to_lowercase()
        .str.count_matches(r"[a-z0-9]+").cast(pl.Int64).alias("n_words"),
        pl.col(text_col).str.to_lowercase()
        .str.contains("lorem ipsum", literal=True)
        .cast(pl.Int64).alias("has_lorem"),
        pl.col(text_col).str.contains("{", literal=True)
        .cast(pl.Int64).alias("has_brace"),
    ).with_columns(
        ((pl.col("has_lorem") == 0) & (pl.col("has_brace") == 0)
         & (pl.col("n_words") >= min_words)
         & (3 * pl.col("term_lines") >= pl.col("n_lines")))
        .cast(pl.Int64).alias("keep")
    )
    out = sig.to_arrow()
    # polars may emit large_string/compat types — pin the id column type
    return out.set_column(0, id_col, out[id_col].combine_chunks().cast(
        batch[id_col].type))


def phrase_detect(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    min_count: int = 5,
    delta: int = 1,
    threshold_x1000: int = 2000,
    vocab_topk: int = LM_VOCAB_TOPK,
) -> "ray.data.Dataset":
    """Corpus-level phrase detection (word2vec phrase pass, Mikolov et
    al. 2013 §4, arXiv:1310.4546): bigrams whose corpus count is high
    relative to their parts' counts are collocations. Score is the
    paper's ``(count(ab) - delta) * N / (count(a) * count(b))`` kept in
    floor-integer arithmetic (``*1000 //``) so the DuckDB oracle
    matches exactly; ``is_phrase`` = score >= threshold.

    Scale shape: counting reuses the bigram-LM tagged partial (one row
    per distinct gram per batch, then ONE vocabulary-sized groupby);
    the unigram side ships as the same hard-bounded digest model as
    :func:`lm_train` (min_count=1 here so, below the top-K cap, pruning
    is a no-op and the SQL oracle needs no mirror — above it, top-K is
    the documented scale bound); scoring then streams over the
    *aggregated bigram rows*, never re-reading text. int64 scores hold
    to ~1e18: fine for any corpus this engine oracles; a true 1e14-token
    run would switch the score column to float64 (comparison only,
    no equality contract). Output: (phrase, pair_count, score_x1000,
    is_phrase) sorted by phrase."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    counts = ds.map_batches(
        _lm_counts_partial, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col},
    ).groupby("key").aggregate(Sum("c", alias_name="c")).materialize()

    def uni_partial(t: pa.Table) -> pa.Table:
        m = pc.starts_with(t["key"], pattern="u\x1f")
        s = pc.sum(pc.filter(t["c"], m))
        return pa.table({"n": pa.array(
            [s.as_py() or 0], pa.int64())})

    n_total = int(counts.map_batches(
        uni_partial, batch_format="pyarrow").sum("n"))
    uk, uc = _topk_counts(counts, "u\x1f", vocab_topk, 1)
    model = ray.put((uk, uc, n_total))

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.starts_with(t["key"], pattern="b\x1f"),
            pc.greater_equal(t["c"], min_count)))
        keys, counts_np = (t["key"].to_pylist(),
                           t["c"].to_numpy(zero_copy_only=False))
        uk_, uc_, n_ = ray.get(model)
        parts = [k[2:].split("\x1f", 1) for k in keys]
        pa_dig = np.frombuffer(
            b"".join(_gram_digest("u\x1f" + p[0]) for p in parts) or b"",
            dtype="S16")
        pb_dig = np.frombuffer(
            b"".join(_gram_digest("u\x1f" + p[1]) for p in parts) or b"",
            dtype="S16")
        fa, ca = _lookup_counts(uk_, uc_, pa_dig)
        fb, cb = _lookup_counts(uk_, uc_, pb_dig)
        ok = fa & fb
        sc = (counts_np - delta) * n_ * 1000 // (ca * cb)
        phrases = np.array([p[0] + " " + p[1] for p in parts], dtype=object)
        return pa.table({
            "phrase": pa.array(phrases[ok], pa.string()),
            "pair_count": pa.array(counts_np[ok], pa.int64()),
            "score_x1000": pa.array(sc[ok], pa.int64()),
            "is_phrase": pa.array(
                (sc[ok] >= threshold_x1000).astype(np.int64), pa.int64()),
        })

    return counts.map_batches(score, batch_format="pyarrow").sort("phrase")
