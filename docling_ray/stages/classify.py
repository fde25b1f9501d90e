"""Supervised bag-of-words document classifier (Naive-Bayes shape).

Web-scale curation pipelines gate documents with a cheap linear
text classifier trained on labeled seed data — CCNet and the GPT-3 /
LLaMA data recipes use fastText for exactly this (quality vs random,
language, domain). The reference consumes such labels downstream; this
is the producer side, rebuilt Ray-Data-first (no reference analogue,
SURVEY.md §4).

Training is the same bounded shape as ``lm_train``
(text_quality.py): ONE per-batch (label, token) count partial + one
vocabulary-sized ``groupby`` + a distributed per-class top-K cut
(count desc, token asc), so the broadcast model is HARD-BOUNDED at
``n_classes × topk`` entries regardless of corpus vocabulary. The
class set itself must be small (languages, domains, quality tiers) —
that is the operator's contract: per-class model slices ship as
sorted S16 digest arrays (zero-copy per node, vectorized
``searchsorted`` lookup).

Scoring avoids float log-probabilities so the DuckDB oracle matches
bit for bit: each token occurrence contributes
``1e6 * c(tok, cls) // total(cls)`` (floor — monotone in the
multinomial likelihood P(tok|cls), which is what an argmax needs);
tokens pruned out of a class's model contribute 0. Prediction is
argmax over classes, ties broken by class asc. Empty documents score
0 everywhere and predict the lex-min class.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from docling_ray.functions.hashing import tokenize
from docling_ray.stages.text_quality import _gram_digest, _lookup_counts

NB_MIN_COUNT = 2
NB_TOPK = 65_536

_SEP = "\x1f"


def _class_counts_partial(batch: pa.Table, text_col: str,
                          label_col: str) -> pa.Table:
    from collections import Counter

    c: Counter = Counter()
    labels = batch[label_col].to_pylist()
    for lbl, t in zip(labels, batch[text_col].to_pylist()):
        lbl = lbl or ""
        for tok in tokenize(t or ""):
            c[lbl + _SEP + tok] += 1
    return pa.table({"key": pa.array(list(c.keys()), pa.string()),
                     "c": pa.array(list(c.values()), pa.int64())})


def _topk_class_slice(counts_tbl: "ray.data.Dataset", cls: str, k: int,
                      min_count: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (count desc, token asc) rows of ONE class's slice of the
    aggregated (label\\x1ftoken) count table, as (sorted TOKEN-ONLY S16
    digest array, aligned int64 counts). Token-only digests let the
    scorer probe every class with the same digest array. Per-block
    partial pruning is exact (keys are distinct post-groupby); only k
    rows per class reach the driver."""
    import pyarrow.compute as pc

    prefix = cls + _SEP

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
    toks: list[str] = []
    cnts: list[int] = []
    npre = len(prefix)
    for b in top.iter_batches(batch_format="pyarrow"):
        toks.extend(s[npre:] for s in b["key"].to_pylist())
        cnts.extend(b["c"].to_numpy(zero_copy_only=False).tolist())
    dig = np.frombuffer(b"".join(_gram_digest(s) for s in toks), dtype="S16")
    c = np.asarray(cnts, dtype=np.int64)
    order = np.argsort(dig, kind="stable")
    return np.ascontiguousarray(dig[order]), np.ascontiguousarray(c[order])


def nb_train(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    label_col: str = "lang",
    min_count: int = NB_MIN_COUNT,
    topk: int = NB_TOPK,
) -> dict[str, tuple[np.ndarray, np.ndarray, int]]:
    """Train per-class pruned token-count models:
    ``{class: (sorted token S16 digests, aligned counts, total)}``
    where ``total`` sums the PRUNED counts (the oracle mirrors that).
    The class list comes from a distinct pass (classes are small by
    contract); the count table materializes once and each class takes
    one bounded top-K cut over it."""
    from ray.data.aggregate import Sum

    classes = sorted(ds.select_columns([label_col]).unique(label_col))
    counts_tbl = ds.map_batches(
        _class_counts_partial, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "label_col": label_col},
    ).groupby("key").aggregate(Sum("c", alias_name="c")).materialize()

    model: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for cls in classes:
        keys, cnts = _topk_class_slice(counts_tbl, cls, topk, min_count)
        model[cls] = (keys, cnts, int(cnts.sum()))
    return model


def nb_score_texts(
    model: dict[str, tuple[np.ndarray, np.ndarray, int]],
    texts: list[str | None],
) -> tuple[list[str], np.ndarray]:
    """Score a batch against a trained model: per-doc (pred, score).
    Tokens digest ONCE per distinct batch token (np.unique inverse),
    then every class probes the same digest stream vectorized."""
    classes = sorted(model)
    n = len(texts)
    toks_flat: list[str] = []
    offs = np.zeros(n + 1, np.int64)
    for i, t in enumerate(texts):
        toks_flat.extend(tokenize(t or ""))
        offs[i + 1] = len(toks_flat)
    scores = np.zeros((len(classes), n), np.int64)
    if toks_flat:
        uniq, inv = np.unique(np.asarray(toks_flat, dtype=object),
                              return_inverse=True)
        uniq_dig = np.frombuffer(
            b"".join(_gram_digest(s) for s in uniq), dtype="S16")
        probes = uniq_dig[inv]
        for ci, cls in enumerate(classes):
            keys, cnts, total = model[cls]
            found, c = _lookup_counts(keys, cnts, probes)
            contrib = np.where(found, c * 1_000_000 // max(total, 1), 0)
            csum = np.concatenate(([0], np.cumsum(contrib)))
            scores[ci] = csum[offs[1:]] - csum[offs[:-1]]
    best = np.argmax(scores, axis=0)  # ties -> lowest index = class asc
    return [classes[i] for i in best], scores[best, np.arange(n)]


def nb_classify(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    min_count: int = NB_MIN_COUNT,
    topk: int = NB_TOPK,
    emit_label: bool = False,
) -> "ray.data.Dataset":
    """Train on (text, label) and classify every document: output
    ``(doc_id, pred, score)`` (+ ``label`` passthrough when
    ``emit_label`` — saves the truth-join for evaluation). The model
    ships once via ``ray.put`` (object-store read per task, not per
    batch shipment); scoring streams with no shuffle."""
    import ray

    model_ref = ray.put(nb_train(ds, text_col, label_col,
                                 min_count, topk))

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        pred, s = nb_score_texts(m, batch[text_col].to_pylist())
        cols = {
            "doc_id": batch[id_col],
            "pred": pa.array(pred, pa.string()),
            "score": pa.array(s, type=pa.int64()),
        }
        if emit_label:
            cols["label"] = batch[label_col]
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def classification_report(
    ds: "ray.data.Dataset",
    label_col: str = "label",
    pred_col: str = "pred",
) -> "ray.data.Dataset":
    """Per-class evaluation of a classifier's predictions — the
    train-pipeline QA stage that closes the classify loop: confusion
    counts → tp/fp/fn → precision/recall/F1, all in floor-integer ppm
    so the DuckDB oracle compares exactly.

    Scale shape: per-batch (label, pred) partial counts, then ONE
    class²-sized groupby — the report itself is class-count-sized, so
    the driver materialization is bounded by the label alphabet (the
    source_quality_report rule), never by corpus size."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([label_col, pred_col]).group_by(
            [label_col, pred_col]).aggregate([([], "count_all")])
        return pa.table({
            "label": g[label_col],
            "pred": g[pred_col],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    conf = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["label", "pred"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()

    classes = sorted(set(conf["label"]) | set(conf["pred"]))
    rows = []
    for c in classes:
        tp = int(conf[(conf["label"] == c) & (conf["pred"] == c)]["n"].sum())
        fp = int(conf[(conf["label"] != c) & (conf["pred"] == c)]["n"].sum())
        fn = int(conf[(conf["label"] == c) & (conf["pred"] != c)]["n"].sum())
        rows.append({
            "label": c, "tp": tp, "fp": fp, "fn": fn,
            "precision_ppm": tp * 1_000_000 // (tp + fp) if tp + fp else 0,
            "recall_ppm": tp * 1_000_000 // (tp + fn) if tp + fn else 0,
            "f1_ppm": (2 * tp * 1_000_000 // (2 * tp + fp + fn)
                       if 2 * tp + fp + fn else 0),
        })
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        k: pa.array([r[k] for r in rows],
                    pa.string() if k == "label" else pa.int64())
        for k in ("label", "tp", "fp", "fn",
                  "precision_ppm", "recall_ppm", "f1_ppm")}))
