"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator, one entry
per SURVEY.md §2 / training-data op. Ray is initialised by the driver before
this module is imported — nothing here calls ``ray.init``/``ray.shutdown``.

Oracle-parity notes: computed/aggregate columns use the same names in the
Ray pipelines and the SQL; float policy documented in
``docling_ray/pipelines/analytics.py`` (floor-scaled integers for exact
integer-numerator ratios, input-precision rounding for sums of decimal
columns). Near-dup dedup is oracled by brute-force shingle-Jaccard /
SQL-simhash self-joins + recursive-CTE connected components; language ID
by a full SQL re-computation of the classifier; extraction-derived queries
(extract_summary / heading_levels / export_markdown) against generator-
expected parquet tables (docling_ray/oracles.py). Rows-only remainder:
``extract_selfcheck`` (it IS a check — reports the span-equality pass
rate) and ``ann_lsh``/``ann_ivf`` (approximate by design; recall pinned
vs brute force in tests/test_ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# make the docling_ray package importable regardless of the driver's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SEED = 42


def read_sf_table(sf_dir: str, table: str, columns=None, **kwargs):
    """Metadata-stripped parquet read of a testdata table (the files carry
    pandas schema metadata that breaks Ray's schema-hash dedup — see
    docling_ray/sources/tables.py). Lazy import: Ray is driver-owned."""
    from docling_ray.sources.tables import read_sf_table as _read

    return _read(sf_dir, table, columns, **kwargs)


_STOP_SQL = "['the','and','of','a','to','in','is','for','on','with']"
_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# Supervised NB-shape classifier prediction, shared by the nb_classify
# oracle and (as a subquery) classifier_eval: per-class token counts
# pruned (c >= 2, top-K by c desc / token asc), totals over the PRUNED
# model; each token occurrence contributes c * 1e6 // total (floor);
# argmax with ties -> class asc; empty docs predict the lex-min class
# at score 0.
_NB_PRED_SQL = (
    "WITH tk AS (SELECT doc_id, lang, unnest("
    f"{_TOKS}) AS token FROM documents), "
    "cnt AS (SELECT lang, token, count(*)::BIGINT AS c "
    "FROM tk GROUP BY 1, 2), "
    "pruned AS (SELECT lang, token, c FROM cnt WHERE c >= 2 "
    "QUALIFY row_number() OVER (PARTITION BY lang "
    "ORDER BY c DESC, token ASC) <= 65536), "
    "tot AS (SELECT lang, sum(c)::BIGINT AS tot "
    "FROM pruned GROUP BY 1), "
    "classes AS (SELECT DISTINCT lang AS cls FROM documents), "
    "contrib AS (SELECT tk.doc_id, cl.cls, "
    "coalesce(sum(p.c * 1000000 // t.tot), 0)::BIGINT AS score "
    "FROM tk CROSS JOIN classes cl "
    "LEFT JOIN pruned p ON p.lang = cl.cls AND p.token = tk.token "
    "JOIN tot t ON t.lang = cl.cls GROUP BY 1, 2), "
    "alldocs AS (SELECT d.doc_id, cl.cls, "
    "coalesce(c.score, 0)::BIGINT AS score "
    "FROM documents d CROSS JOIN classes cl "
    "LEFT JOIN contrib c ON c.doc_id = d.doc_id "
    "AND c.cls = cl.cls), "
    "best AS (SELECT doc_id, cls, score, row_number() OVER ("
    "PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn "
    "FROM alldocs) "
    "SELECT doc_id, cls AS pred, score FROM best WHERE rn = 1"
)


def entry() -> Any:
    """Flagship: interleaved corpus derived from sf0.001 (stored once with
    byte_size materialized) → skew-routed extraction with filter pushdown →
    span rows."""
    from docling_ray.pipelines.extract import extract_corpus_stored
    from docling_ray.sources.corpus import derive_corpus_stored

    path = derive_corpus_stored("/root/testdata/sf0.001", seed=SEED)
    return extract_corpus_stored(path, mode="hybrid", big_threshold=200_000)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _extract_summary(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus_stored
    from docling_ray.sources.corpus import derive_corpus_stored

    path = derive_corpus_stored(sf_dir, seed=SEED)
    out = extract_corpus_stored(path, mode="hybrid", big_threshold=200_000)
    tbl = out.select_columns(["doc_id", "status", "n_spans", "byte_size"])
    return tbl.sort("doc_id")


def _extract_selfcheck(sf_dir: str):
    """Extraction correctness as data: span-sequence equality pass rate vs
    the generator's expected spans, computed distributedly."""
    import pyarrow as pa

    from docling_ray.pipelines.extract import extract_docs_batch
    from docling_ray.sources.corpus import derive_corpus

    corpus = derive_corpus(sf_dir, seed=SEED, with_expected=True)

    def check(batch: pa.Table) -> pa.Table:
        got = extract_docs_batch(
            batch.select(["doc_id", "spans", "byte_size"])
        )
        ok, n = 0, batch.num_rows
        for g_spans, g_status, e_spans, e_status in zip(
            got["spans"].to_pylist(), got["status"].to_pylist(),
            batch["expected_spans"].to_pylist(),
            batch["expected_status"].to_pylist(),
        ):
            g = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                 for s in g_spans]
            e = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                 for s in e_spans]
            ok += int(g == e and g_status == e_status)
        return pa.table({"n_docs": pa.array([n], pa.int64()),
                         "n_equal": pa.array([ok], pa.int64())})

    import pandas as pd
    from ray.data.aggregate import Sum

    parts = corpus.map_batches(check, batch_format="pyarrow")
    agg = parts.aggregate(Sum("n_docs", alias_name="n_docs"),
                          Sum("n_equal", alias_name="n_equal"))
    return pd.DataFrame([agg])


def _lang_id(sf_dir: str):
    import ray

    from docling_ray.stages.text_quality import LangIdModel

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return ds.map_batches(
        LangIdModel, batch_format="pyarrow", batch_size=256, concurrency=2
    ).select_columns(["doc_id", "pred_lang"]).sort("doc_id")


def _minhash_dedup(sf_dir: str):
    import ray

    from docling_ray.stages.dedup import minhash_lsh_clusters

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return minhash_lsh_clusters(ds, threshold=0.8)


def _simhash_dedup(sf_dir: str):
    import ray

    from docling_ray.stages.dedup import simhash_clusters

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return simhash_clusters(ds, max_hamming=3)


def _detect_format(sf_dir: str):
    """Content sniffing over the UNLABELED corpus payloads — stored kinds
    ignored; oracle = the generator's known labels."""
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.detect import detect_format_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    return corpus.map_batches(
        detect_format_batch, batch_format="pyarrow"
    ).sort(["doc_id", "offset"])


def _jaccard_pairs(sf_dir: str):
    import ray

    from docling_ray.stages.dedup import jaccard_neardup_pairs

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return jaccard_neardup_pairs(ds, threshold=0.8)


def _embedding_neardup(sf_dir: str):
    import pyarrow as pa
    import ray

    from docling_ray.stages.similarity import embedding_neardup_pairs

    ds = read_sf_table(sf_dir, "embeddings",
                               columns=["vec_id", "embedding"])
    out = embedding_neardup_pairs(ds, threshold=0.95)
    if out.count() == 0:
        # ray Dataset.to_pandas() drops the schema of an empty dataset —
        # hand the driver a typed empty table so columns still compare
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "sim_e6": pa.array([], pa.int64())})
    return out


def _ann_sq8(sf_dir: str):
    """Scalar-quantized ANN (rows-only: lossy by design; recall vs
    brute force pinned in tests/test_similarity-style sq8 tests)."""
    from docling_ray.pipelines.analytics import _query_vector
    from docling_ray.stages.similarity import sq8_topk

    ds = read_sf_table(sf_dir, "embeddings",
                       columns=["vec_id", "embedding"])
    return sq8_topk(ds, _query_vector(sf_dir), k=10)


def _ann_lsh(sf_dir: str):
    import ray

    from docling_ray.pipelines.analytics import _query_vector
    from docling_ray.stages.similarity import lsh_topk

    ds = read_sf_table(sf_dir, "embeddings",
                               columns=["vec_id", "embedding"])
    return lsh_topk(ds, _query_vector(sf_dir), k=10)


def _ann_ivf(sf_dir: str):
    import ray

    from docling_ray.pipelines.analytics import _query_vector
    from docling_ray.stages.similarity import ivf_topk

    ds = read_sf_table(sf_dir, "embeddings",
                               columns=["vec_id", "embedding"])
    return ivf_topk(ds, _query_vector(sf_dir), k=10)


def _kmeans_clusters(sf_dir: str):
    from docling_ray.stages.similarity import kmeans_cluster_sizes

    return kmeans_cluster_sizes(sf_dir, n_clusters=8, n_iter=4)


def _semantic_dedup(sf_dir: str):
    from docling_ray.stages.similarity import semantic_dedup

    ds = read_sf_table(sf_dir, "embeddings",
                       columns=["vec_id", "embedding"])
    return semantic_dedup(ds, n_clusters=8, threshold=0.99).sort("vec_id")


def _media_features(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.multimodal import (
        MediaFeatureExtractor,
        picture_spans_to_media_rows,
    )

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    media = out.map_batches(picture_spans_to_media_rows, batch_format="pyarrow")
    feats = media.map_batches(
        MediaFeatureExtractor, batch_format="pyarrow", batch_size=256,
        concurrency=2, num_cpus=1,
    )
    return feats.select_columns(["doc_id", "media_ref", "pixel_mean"]).sort(
        ["doc_id", "media_ref"]
    )


def _exact_dedup(sf_dir: str):
    import ray

    from docling_ray.stages.dedup import exact_dedup_survivors

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return exact_dedup_survivors(ds).sort("doc_id")


def _fingerprint(sf_dir: str):
    import ray

    from docling_ray.stages.text_quality import fingerprint_batch

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").sort("doc_id")


def _token_stats(sf_dir: str):
    import ray

    from docling_ray.stages.text_quality import token_stats_batch

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow").sort("doc_id")


def _repetition(sf_dir: str):
    from docling_ray.stages.text_quality import repetition_batch

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch,
                          batch_format="pyarrow").sort("doc_id")


def _line_dedup(sf_dir: str):
    from docling_ray.stages.dedup import line_dedup

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return line_dedup(ds, words_per_line=3, min_docs=2).sort("doc_id")


def _substring_dup(sf_dir: str):
    from docling_ray.stages.dedup import substring_dup

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return substring_dup(ds, k=5, min_docs=2).sort("doc_id")


def _substring_dedup_removal(sf_dir: str):
    """Duplicated-substring REMOVAL (Lee et al. 2022 action for the
    substring_dup profile): drop every token covered by a cross-doc
    duplicated 5-gram window, rejoin the survivors."""
    from docling_ray.stages.dedup import substring_dedup_removal

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return substring_dedup_removal(ds, k=5, min_docs=2).sort("doc_id")


def _extracted_training_corpus(sf_dir: str):
    """Extraction → markdown export → token gate → exact dedup, the
    document-conversion-to-training-data chain in one streaming
    composite (pipelines/training_data.py)."""
    from docling_ray.pipelines.training_data import extracted_training_corpus
    from docling_ray.sources.corpus import derive_corpus

    corpus = derive_corpus(sf_dir, seed=SEED)
    return extracted_training_corpus(corpus).sort("doc_id")


def _web_curated_corpus(sf_dir: str):
    """Link-graph-gated curation: extraction→markdown gate+dedup
    survivors whose canonical host earned PageRank mass
    (pipelines/training_data.py web_curated_corpus)."""
    from docling_ray.pipelines.training_data import web_curated_corpus
    from docling_ray.sources.corpus import derive_corpus

    corpus = derive_corpus(sf_dir, seed=SEED)
    return web_curated_corpus(corpus).sort("doc_id")


def _funnel_counts(sf_dir: str):
    """Ordered view→click→purchase funnel: users reaching each step,
    every step the first event of its type strictly after the previous
    step (pipelines/analytics.py funnel_counts)."""
    from docling_ray.pipelines import analytics as A

    return A.funnel_counts(sf_dir)


def _neardup_best(sf_dir: str):
    """Quality-aware near-dup survivor selection: per MinHash cluster
    keep the member with the most tokens, tie → min doc_id
    (stages/dedup.py neardup_best_survivors)."""
    from docling_ray.stages.dedup import neardup_best_survivors

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return neardup_best_survivors(ds, threshold=0.8).sort("rep_id")


def _incremental_dedup(sf_dir: str):
    """Incremental exact dedup against a persisted hash index
    (stages/dedup.py exact_dedup_against_index): the even-doc_id half of
    the table plays the previously-admitted index, the odd half is the
    incoming batch; admitted = odd docs whose content the index never
    saw, first per hash."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from docling_ray.functions.hashing import content_md5
    from docling_ray.stages.dedup import exact_dedup_against_index

    docs = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def split(parity: int):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(
                pc.bit_wise_and(pc.cast(t["doc_id"], pa.int64()), 1),
                parity)
            return t.filter(keep)
        return f

    new_docs = docs.map_batches(split(1), batch_format="pyarrow")

    def index_rows(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(
            [content_md5(x or "") for x in t["text"].to_pylist()])})

    index = docs.map_batches(split(0), batch_format="pyarrow") \
                .map_batches(index_rows, batch_format="pyarrow")
    return exact_dedup_against_index(new_docs, index).sort("doc_id")


def _sample_bottomk(sf_dir: str):
    from docling_ray.stages.sketches import bottomk_sample

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id"])
    return bottomk_sample(ds, k=100, id_col="doc_id")


_MIX_QUOTAS = {"src0": 10, "src1": 5, "src2": 5, "src3": 2, "src4": 2}


def _mixture_sample(sf_dir: str):
    from docling_ray.stages.sketches import mixture_sample

    ds = read_sf_table(sf_dir, "documents",
                       columns=["doc_id", "source"])
    return mixture_sample(ds, quotas=_MIX_QUOTAS)


def _approx_quantiles(sf_dir: str):
    """KLL-sketched per-group quantiles (rows-only: the sketch has no SQL
    twin; rank error pinned ≤1% vs the exact sort in tests/test_sketches).
    Same output shape as the exact ``event_quantiles`` so the two are
    directly comparable — but only O(k log n) state per group shuffles,
    never the values themselves."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    from docling_ray.stages.sketches import kll_aggregate

    ev = read_sf_table(sf_dir, "events", columns=["event_type", "value"])

    def to_int(t: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)),
                    pa.int64())
        return pa.table({"event_type": t["event_type"], "v": v})

    agg = ev.map_batches(to_int, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(Count(), kll_aggregate("v", qs=(0.5, 0.95)))

    def fin(t: pa.Table) -> pa.Table:
        qs = t["kll(v)"].to_pylist()
        return pa.table({
            "event_type": t["event_type"],
            "n_events": pc.cast(t["count()"], pa.int64()),
            "p50_x100": pa.array([int(x[0]) for x in qs], pa.int64()),
            "p95_x100": pa.array([int(x[1]) for x in qs], pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow").sort("event_type")


def _approx_distinct(sf_dir: str):
    """Sketched cardinalities (rows-only: approximations have no SQL
    twin; error bounds + merge-exactness pinned in tests/test_sketches)."""
    import pyarrow as pa

    from docling_ray.stages.sketches import hll_distinct, kmv_distinct

    ev = read_sf_table(sf_dir, "events", columns=["user_id"])
    return pa.table({
        "hll_users": pa.array([hll_distinct(ev, "user_id")],
                              pa.int64()),
        "kmv_users": pa.array([kmv_distinct(ev, "user_id")],
                              pa.int64()),
    })


def _source_quality_report(sf_dir: str):
    from docling_ray.stages.text_quality import source_quality_report

    ds = read_sf_table(sf_dir, "documents",
                       columns=["doc_id", "text", "source"])
    return source_quality_report(ds)


def _lm_score(sf_dir: str):
    from docling_ray.stages.text_quality import bigram_lm_score

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_lm_score(ds).sort("doc_id")


def _dsir_weights(sf_dir: str):
    from docling_ray.stages.text_quality import dsir_weights

    ds = read_sf_table(sf_dir, "documents",
                       columns=["doc_id", "text", "lang"])
    return dsir_weights(ds).sort("doc_id")


def _bpe_vocab(sf_dir: str):
    """Distributed word-count table that feeds BPE training: top-256
    words by (count desc, word asc) — the bounded-gather cut."""
    import pyarrow as pa

    from docling_ray.stages.tokenizer import corpus_word_counts

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    wc = corpus_word_counts(ds, vocab_topk=256)
    return pa.table({
        "word": pa.array([w for w, _ in wc], pa.string()),
        "c": pa.array([c for _, c in wc], pa.int64()),
    })


def _bpe_token_counts(sf_dir: str):
    """Train BPE merges on the corpus, then encode it (rows-only: the
    iterative merge loop has no SQL analogue; the trainer is pinned to
    the published Sennrich 2016 example in tests/test_bpe.py)."""
    from docling_ray.stages.tokenizer import bpe_encode, bpe_train

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    merges = bpe_train(ds, num_merges=128, vocab_topk=4096)
    return bpe_encode(ds, merges).select_columns(
        ["doc_id", "n_bpe_tokens"]).sort("doc_id")


def _nb_classify(sf_dir: str):
    """fastText-style supervised classifier: train per-lang pruned
    token models on the corpus, classify every doc (integer floor
    scoring — oracle-exact)."""
    from docling_ray.stages.classify import nb_classify

    ds = read_sf_table(sf_dir, "documents",
                       columns=["doc_id", "text", "lang"])
    return nb_classify(ds).sort("doc_id")


def _classifier_eval(sf_dir: str):
    """Evaluation report for the supervised classifier: per-class
    tp/fp/fn + precision/recall/F1 in integer ppm. The oracle chains
    the nb_classify SQL as a subquery and recomputes the confusion
    arithmetic independently."""
    from docling_ray.stages.classify import classification_report, nb_classify

    ds = read_sf_table(sf_dir, "documents",
                       columns=["doc_id", "text", "lang"])
    return classification_report(
        nb_classify(ds, emit_label=True)).sort("label")


def _tfidf_topk(sf_dir: str):
    from docling_ray.stages.text_quality import tfidf_topk

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=5).sort(["doc_id", "rank"])


def _c4_filters(sf_dir: str):
    """C4-style quality filters (stages/text_quality.c4_signals_batch).
    The documents table is single-line word salad, so — like pii_scrub /
    contamination — the query first derives a deterministic lined doc
    (6-word lines; '.' appended to lines ending in a vowel; 'lorem
    ipsum' / '{' boilerplate appended for doc_id % 31 / % 29 == 0) with
    the SAME derivation arithmetic in the SQL oracle, then runs the
    REAL vectorized filter kernel over the derived text."""
    import polars as pl
    import pyarrow as pa

    from docling_ray.stages.text_quality import c4_signals_batch

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def derive(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        doc = (pl.col("text").str.to_lowercase()
               .str.extract_all(r"[a-z0-9]+").list.join(" ")
               .str.replace_all(r"((?:\S+ ){5}\S+) ", "${1}\n")
               .str.replace_all(r"([aeiou])(\n|$)", "${1}.${2}"))
        doc = pl.when(pl.col("doc_id") % 31 == 0) \
                .then(doc + pl.lit("\nlorem ipsum dolor")).otherwise(doc)
        doc = pl.when(pl.col("doc_id") % 29 == 0) \
                .then(doc + pl.lit("\nfunction() { var x; }")).otherwise(doc)
        out = df.select(pl.col("doc_id"), doc.alias("text")).to_arrow()
        return out.set_column(0, "doc_id", out["doc_id"].combine_chunks()
                              .cast(batch["doc_id"].type))

    return ds.map_batches(derive, batch_format="pyarrow") \
             .map_batches(c4_signals_batch, batch_format="pyarrow") \
             .sort("doc_id")


def _phrase_detect(sf_dir: str):
    from docling_ray.stages.text_quality import phrase_detect

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    return phrase_detect(ds, min_count=5, delta=1, threshold_x1000=2000)


def _quality(sf_dir: str):
    import ray

    from docling_ray.stages.text_quality import quality_batch

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow").sort("doc_id")


def _code_langs(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.enrich import code_languages_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(code_languages_batch, batch_format="pyarrow") \
              .sort(["doc_id", "offset"])


def _picture_classes(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.enrich import picture_classes_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(picture_classes_batch, batch_format="pyarrow") \
              .sort(["doc_id", "offset"])


def _hyperlinks(sf_dir: str):
    """Hyperlink annotations from every html input span (the reference's
    _resolve_hyperlink stream, html_backend.py:1840) AND every pdf input
    span's /Annots URI link actions (pdfium's link API analogue) —
    oracle = the generator's independently recorded links."""
    import pyarrow as pa

    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.html_extract import extract_links
    from docling_ray.stages.pdf_bytes import extract_pdf_links
    from docling_ray.stages.text_extract import extract_md_links

    corpus = derive_corpus(sf_dir, seed=SEED)

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids, idxs, texts, hrefs, regions = [], [], [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            j = 0
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
                    doc_ids.append(did)
                    idxs.append(j)
                    texts.append(text)
                    hrefs.append(href)
                    regions.append(region)
                    j += 1
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "link_idx": pa.array(idxs, pa.int32()),
            "text": pa.array(texts, pa.string()),
            "href": pa.array(hrefs, pa.string()),
            "region": pa.array(regions, pa.string()),
        })

    return corpus.map_batches(kernel, batch_format="pyarrow") \
                 .sort(["doc_id", "link_idx"])


def _webgraph_edges(sf_dir: str):
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.webgraph import host_edges

    return host_edges(derive_corpus(sf_dir, seed=SEED))


def _host_graph(sf_dir: str):
    """Weighted host-level link graph from the extracted hyperlink stream
    (stages/webgraph.py): canonical-URL host → outlink host, aggregated.
    The canonical⋈outlink join is local to each document row — the only
    shuffle is the final (src, dst) sum."""
    return _webgraph_edges(sf_dir).sort(["src_host", "dst_host"])


def _host_degree(sf_dir: str):
    """Per-host degree dashboard over the aggregated host graph: total
    out/in link weight + distinct out/in neighbor counts."""
    from docling_ray.stages.webgraph import host_degree

    return host_degree(_webgraph_edges(sf_dir)).sort("host")


def _host_anchor_terms(sf_dir: str):
    """Anchor-text term frequencies per target host — the classic web
    signal (anchor terms describe the linked page; used for retrieval and
    corpus quality weighting)."""
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.webgraph import host_anchor_terms

    return host_anchor_terms(derive_corpus(sf_dir, seed=SEED)) \
        .sort(["host", "term"])


def _pagerank_hosts(sf_dir: str):
    """Integer-exact PageRank over the host graph (8 iterations, damping
    85/100, ranks in parts-per-10^12) — bit-identical to the loop-unrolled
    DuckDB oracle because every step is int64 floor arithmetic."""
    from docling_ray.stages.webgraph import pagerank_hosts

    return pagerank_hosts(_webgraph_edges(sf_dir)).sort("host")


def _host_graph_stats(sf_dir: str):
    """One-row host-graph health summary (nodes/edges/links, self-loops,
    reciprocal edges) — stages/webgraph.py host_graph_stats."""
    from docling_ray.stages.webgraph import host_graph_stats

    return host_graph_stats(_webgraph_edges(sf_dir))


def _coupling_hosts(sf_dir: str):
    """Bibliographic-coupling pairs: source hosts sharing >= 2 distinct
    targets (stages/webgraph.py coupling_pairs)."""
    from docling_ray.stages.webgraph import coupling_pairs

    return coupling_pairs(_webgraph_edges(sf_dir)).sort(["a", "b"])


def _cocitation_hosts(sf_dir: str):
    """Co-citation pairs: hosts linked by >= 2 common source hosts
    (stages/webgraph.py cocitation_pairs)."""
    from docling_ray.stages.webgraph import cocitation_pairs

    return cocitation_pairs(_webgraph_edges(sf_dir)).sort(["a", "b"])


def _trustrank_hosts(sf_dir: str):
    """Integer-exact TrustRank: teleport confined to the top-in-degree
    seed hosts; spam/orphan neighborhoods receive zero trust
    (stages/webgraph.py trustrank_hosts)."""
    from docling_ray.stages.webgraph import trustrank_hosts

    return trustrank_hosts(_webgraph_edges(sf_dir)).sort("host")


def _hits_hosts(sf_dir: str):
    """Integer-exact HITS hubs & authorities over the host graph (4
    iterations, scores max-normalized to parts-per-10^6) — link-analysis
    companion to PageRank (stages/webgraph.py)."""
    from docling_ray.stages.webgraph import hits_hosts

    return hits_hosts(_webgraph_edges(sf_dir)).sort("host")


def _doc_trust_quality(sf_dir: str):
    """Per-doc TrustRank join-back: the seed-propagated spam-demotion
    feature (stages/webgraph.py doc_trust_quality)."""
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.webgraph import doc_trust_quality

    return doc_trust_quality(derive_corpus(sf_dir, seed=SEED)) \
        .sort("doc_id")


def _doc_link_quality(sf_dir: str):
    """Graph signal joined back to documents: each doc's canonical-host
    PageRank as a per-doc quality feature (the web-curation weight that
    feeds mixture/curation pipelines)."""
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.webgraph import doc_link_quality

    return doc_link_quality(derive_corpus(sf_dir, seed=SEED)).sort("doc_id")


def _host_components(sf_dir: str):
    """Undirected connected components over the host graph (site
    clusters), labels = lexicographic-min member host; string-labeled
    min-label propagation (stages/webgraph.py)."""
    from docling_ray.stages.webgraph import host_components

    return host_components(_webgraph_edges(sf_dir)).sort("host")


def _form_fields(sf_dir: str):
    """DOM form-field pairs from every html input span (the reference's
    GraphData key-value regions, html_backend.py:3827,4303) — oracle =
    the generator's independently recorded field list."""
    import pyarrow as pa

    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.html_extract import extract_form_fields

    corpus = derive_corpus(sf_dir, seed=SEED)

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids, idxs, keys, vals, widgets = [], [], [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            j = 0
            for s in spans or []:
                if s["kind"] != "html":
                    continue
                for key, value, widget in extract_form_fields(s["text"] or ""):
                    doc_ids.append(did)
                    idxs.append(j)
                    keys.append(key)
                    vals.append(value)
                    widgets.append(widget)
                    j += 1
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "field_idx": pa.array(idxs, pa.int32()),
            "key": pa.array(keys, pa.string()),
            "value": pa.array(vals, pa.string()),
            "widget": pa.array(widgets, pa.string()),
        })

    return corpus.map_batches(kernel, batch_format="pyarrow") \
                 .sort(["doc_id", "field_idx"])


def _formatting(sf_dir: str):
    """Inline bold/italic/strike/underline/script annotations from every
    html input span (reference _FORMAT_TAG_MAP, html_backend.py:151-166)."""
    import pyarrow as pa

    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.html_extract import extract_formatting

    corpus = derive_corpus(sf_dir, seed=SEED)

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids, idxs, texts, styles, regions = [], [], [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            j = 0
            for s in spans or []:
                if s["kind"] != "html":
                    continue
                for text, style, region in extract_formatting(s["text"] or ""):
                    doc_ids.append(did)
                    idxs.append(j)
                    texts.append(text)
                    styles.append(style)
                    regions.append(region)
                    j += 1
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "fmt_idx": pa.array(idxs, pa.int32()),
            "text": pa.array(texts, pa.string()),
            "style": pa.array(styles, pa.string()),
            "region": pa.array(regions, pa.string()),
        })

    return corpus.map_batches(kernel, batch_format="pyarrow") \
                 .sort(["doc_id", "fmt_idx"])


def _pdf_outline(sf_dir: str):
    """PDF bookmark / table-of-contents entries from every `pdf` input
    span (the reference's utils/pdf_outline.py flat list: title, depth,
    1-based page) — oracle = the generator's recorded outline."""
    import base64

    import pyarrow as pa

    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.pdf_bytes import PdfDocument

    corpus = derive_corpus(sf_dir, seed=SEED)

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids, idxs, titles, levels, pages = [], [], [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            j = 0
            for s in spans or []:
                if s["kind"] != "pdf":
                    continue
                try:
                    doc = PdfDocument(base64.b64decode(s["text"] or ""))
                    entries = doc.outline()
                except Exception:
                    continue  # poison input: no outline rows
                for o in entries:
                    doc_ids.append(did)
                    idxs.append(j)
                    titles.append(o["title"])
                    levels.append(o["level"])
                    pages.append(o["page_no"] if o["page_no"] is not None
                                 else -1)
                    j += 1
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "outline_idx": pa.array(idxs, pa.int32()),
            "title": pa.array(titles, pa.string()),
            "level": pa.array(levels, pa.int32()),
            "page_no": pa.array(pages, pa.int32()),
        })

    return corpus.map_batches(kernel, batch_format="pyarrow") \
                 .sort(["doc_id", "outline_idx"])


def _curated_corpus(sf_dir: str):
    from docling_ray.pipelines.training_data import curated_corpus

    ds = read_sf_table(sf_dir, "documents",
                       columns=["doc_id", "text", "source"])
    return curated_corpus(ds, quotas=_MIX_QUOTAS, lm_threshold=33_000)


def _training_corpus(sf_dir: str):
    """Composite LLM training-data pipeline: quality gate → exact dedup →
    near-dup drop → surviving doc ids."""
    import ray

    from docling_ray.pipelines.training_data import training_corpus_survivors

    ds = read_sf_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
    return training_corpus_survivors(ds, minhash_threshold=0.8)


def _list_markers(sf_dir: str):
    """Ordered-list marker annotations (ol start enumeration) from every
    html input span — oracle = the generator's recorded markers."""
    import pyarrow as pa

    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.html_extract import extract_list_markers

    corpus = derive_corpus(sf_dir, seed=SEED)

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids, idxs, texts, marks = [], [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            j = 0
            for s in spans or []:
                if s["kind"] != "html":
                    continue
                for text, marker in extract_list_markers(s["text"] or ""):
                    doc_ids.append(did)
                    idxs.append(j)
                    texts.append(text)
                    marks.append(marker)
                    j += 1
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "marker_idx": pa.array(idxs, pa.int32()),
            "text": pa.array(texts, pa.string()),
            "marker": pa.array(marks, pa.string()),
        })

    return corpus.map_batches(kernel, batch_format="pyarrow") \
                 .sort(["doc_id", "marker_idx"])


def _kv_pairs(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.kv_extract import kv_pairs_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(kv_pairs_batch, batch_format="pyarrow") \
              .sort(["doc_id", "pair_idx"])


def _picture_descriptions(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.enrich import picture_descriptions_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(picture_descriptions_batch,
                           batch_format="pyarrow").sort(["doc_id", "offset"])


def _chart_tables(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.enrich import chart_tables_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(chart_tables_batch,
                           batch_format="pyarrow").sort(["doc_id", "offset"])


def _heading_levels(sf_dir: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.heading_hierarchy import heading_levels_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(heading_levels_batch, batch_format="pyarrow").sort(
        ["doc_id", "offset"]
    )


def _rag_topk(sf_dir: str):
    """RAG-ingestion composite (pipelines/rag.py): extraction →
    heading-aware chunks → contextualized feature-hash embeddings →
    cosine top-20 for the demo query. Oracle = the same chunker+embed
    applied to the generator's expected spans."""
    from docling_ray.pipelines.rag import rag_corpus_topk

    return rag_corpus_topk(sf_dir, seed=SEED, k=20)


def _render_bboxes(sf_dir: str):
    """Render-layout bbox provenance per span (stages/html_render.py —
    deterministic fixed-metric stand-in for the reference's headless-
    Chromium render provenance, html_backend.py:640-900)."""
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.html_render import render_bboxes_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(render_bboxes_batch, batch_format="pyarrow") \
              .sort(["doc_id", "offset"])


def _doc_chunks_hybrid(sf_dir: str):
    """Structure-aware chunks (stages/chunker.py — the HybridChunker
    analogue, docling/chunking/__init__.py): heading-path metadata,
    grouped lists, serialized tables, token-budget split + peer merge.
    Oracle = the same chunker applied to the generator's expected spans
    (validates extraction + distributed plumbing end-to-end)."""
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.chunker import chunk_docs_batch

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return out.map_batches(chunk_docs_batch, batch_format="pyarrow") \
              .sort(["doc_id", "chunk_idx"])


def _image_meta(sf_dir: str):
    """Decoded raster-image geometry/mode/pixel-fingerprint per image doc
    (the image backend, stages/image_codec.py — reference
    image_backend.py:26,127). The extractor decodes real PNG/BMP/PNM bytes;
    the oracle is the generator's expected table computed from the SOURCE
    pixels — hash equality proves the from-scratch decode."""
    import pyarrow as pa

    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids, ws, hs, modes, fps = [], [], [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            for s in spans or []:
                ref = s["media_ref"] or ""
                if s["kind"] == "picture" and ref.startswith("imgpx://"):
                    geom, mode, fp = ref[8:].split("/")
                    w, h = geom.split("x")
                    doc_ids.append(did)
                    ws.append(int(w))
                    hs.append(int(h))
                    modes.append(mode)
                    fps.append(fp)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mode": pa.array(modes, pa.string()),
            "fingerprint": pa.array(fps, pa.string()),
        })

    return out.map_batches(kernel, batch_format="pyarrow").sort("doc_id")


def _av_meta(sf_dir: str):
    """Audio/video front-end spans per doc (stages/audio_codec +
    stages/video_codec): WAV decode fingerprints, VAD segments, MP4
    duration/geometry and the keyframe schedule. The oracle is the
    generator's expected table computed from its amplitude/duration
    PLANS — hash equality proves the decode + segmentation."""
    import pyarrow as pa

    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")

    def kernel(batch: pa.Table) -> pa.Table:
        ids, seqs, kinds, texts, refs = [], [], [], [], []
        for did, spans in zip(batch["doc_id"].to_pylist(),
                              batch["spans"].to_pylist()):
            seq = 0
            for s in spans or []:
                if s["kind"].startswith(("audio_", "video_")):
                    ids.append(did)
                    seqs.append(seq)
                    kinds.append(s["kind"])
                    texts.append(s["text"])
                    refs.append(s["media_ref"])
                    seq += 1
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "seq": pa.array(seqs, pa.int32()),
            "kind": pa.array(kinds, pa.string()),
            "text": pa.array(texts, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
        })

    return out.map_batches(kernel, batch_format="pyarrow") \
        .sort(["doc_id", "seq"])


def _pii_scrub(sf_dir: str):
    """PII redaction over documents (stages/scrub.py): synthetic email +
    IPv4 columns are appended deterministically per doc (the documents
    table carries no PII), then scrubbed — the oracle runs the SAME
    regexes through DuckDB regexp_replace/regexp_extract_all."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from docling_ray.stages.scrub import pii_scrub_batch

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        aug = [
            f"{t or ''} contact doc{i}@example.com from "
            f"10.0.{i % 256}.{(i // 7) % 256}"
            for i, t in zip(ids, texts)
        ]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(aug, pa.string())})

    return ds.map_batches(augment, batch_format="pyarrow") \
             .map_batches(pii_scrub_batch, batch_format="pyarrow") \
             .sort("doc_id")


_CONTAM_PASSAGE = ("benchmark passage {j} shares these exact tokens "
                   "alpha beta gamma delta epsilon zeta")


def _contamination(sf_dir: str):
    """Benchmark-contamination flags (stages/scrub.py): docs sharing any
    8-word-gram with the doc_id%97==0 benchmark slice; broadcast exact
    gram set, no corpus shuffle. The synthetic corpus has no natural
    8-gram overlap, so the query appends deterministic shared passages
    (benchmark docs get passage doc_id%5, some non-benchmark docs get
    passage doc_id%7 — overlap iff the indices collide) — the SAME
    augmentation runs in the SQL oracle, whose n-gram self-join then
    independently recomputes the flags and hit counts."""
    import pyarrow as pa

    from docling_ray.stages.scrub import contamination_flags

    ds = read_sf_table(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = []
        for i, t in zip(ids, texts):
            t = t or ""
            if i % 97 == 0:
                t = f"{t} " + _CONTAM_PASSAGE.format(j=i % 5)
            elif i % 13 == 0:
                t = f"{t} " + _CONTAM_PASSAGE.format(j=i % 7)
            out.append(t)
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(out, pa.string())})

    return contamination_flags(
        ds.map_batches(augment, batch_format="pyarrow")).sort("doc_id")


def _export_fmt(sf_dir: str, fmt: str):
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.sources.corpus import derive_corpus
    from docling_ray.stages.export import export_corpus

    corpus = derive_corpus(sf_dir, seed=SEED)
    out = extract_corpus(corpus, mode="fast")
    return export_corpus(out, fmt=fmt).sort("doc_id")


def _export_markdown(sf_dir: str):
    return _export_fmt(sf_dir, "markdown")


def _export_html(sf_dir: str):
    return _export_fmt(sf_dir, "html")


def _export_chunks(sf_dir: str):
    return _export_fmt(sf_dir, "chunks")


def queries() -> dict[str, Callable[[str], Any]]:
    from docling_ray.pipelines import analytics as A

    return {
        # extraction engine (rows-only; pytest golden corpus is the oracle)
        "extract_summary": _extract_summary,
        "extract_selfcheck": _extract_selfcheck,
        "detect_format": _detect_format,
        "media_features": _media_features,
        # training-data ops over documents
        "exact_dedup": _exact_dedup,
        "fingerprint": _fingerprint,
        "token_stats": _token_stats,
        "repetition": _repetition,
        "quality": _quality,
        "line_dedup": _line_dedup,
        "substring_dup": _substring_dup,
        "substring_dedup_removal": _substring_dedup_removal,
        "incremental_dedup": _incremental_dedup,
        "sample_bottomk": _sample_bottomk,
        "mixture_sample": _mixture_sample,
        "approx_distinct": _approx_distinct,
        "approx_quantiles": _approx_quantiles,
        "tfidf_topk": _tfidf_topk,
        "c4_filters": _c4_filters,
        "phrase_detect": _phrase_detect,
        "bpe_vocab": _bpe_vocab,
        "bpe_token_counts": _bpe_token_counts,
        "nb_classify": _nb_classify,
        "classifier_eval": _classifier_eval,
        "lm_score": _lm_score,
        "dsir_weights": _dsir_weights,
        "source_quality_report": _source_quality_report,
        "lang_id": _lang_id,
        "minhash_dedup": _minhash_dedup,
        "neardup_best": _neardup_best,
        "simhash_dedup": _simhash_dedup,
        "jaccard_pairs": _jaccard_pairs,
        "training_corpus": _training_corpus,
        "curated_corpus": _curated_corpus,
        "doc_chunks": A.doc_chunks,
        "pii_scrub": _pii_scrub,
        "contamination": _contamination,
        "doc_chunks_hybrid": _doc_chunks_hybrid,
        "render_bboxes": _render_bboxes,
        "rag_topk": _rag_topk,
        # embeddings / similarity
        "ann_topk": A.ann_brute_topk,
        "ann_lsh": _ann_lsh,
        "ann_sq8": _ann_sq8,
        "ann_ivf": _ann_ivf,
        # full-corpus distributed Lloyd's k-means (iterative — no SQL
        # analogue; blob-recovery pinned in tests/test_ops.py)
        "kmeans_clusters": _kmeans_clusters,
        # SemDeDup composite (k-means + in-cluster cosine pruning;
        # planted-near-dup pruning pinned in tests/test_ops.py)
        "semantic_dedup": _semantic_dedup,
        "embedding_neardup": _embedding_neardup,
        "embedding_norms": A.embedding_label_norms,
        # enrichment
        "heading_levels": _heading_levels,
        "code_langs": _code_langs,
        "picture_classes": _picture_classes,
        "picture_descriptions": _picture_descriptions,
        "chart_tables": _chart_tables,
        "kv_pairs": _kv_pairs,
        "hyperlinks": _hyperlinks,
        "host_graph": _host_graph,
        "host_degree": _host_degree,
        "host_anchor_terms": _host_anchor_terms,
        "pagerank_hosts": _pagerank_hosts,
        "hits_hosts": _hits_hosts,
        "trustrank_hosts": _trustrank_hosts,
        "cocitation_hosts": _cocitation_hosts,
        "coupling_hosts": _coupling_hosts,
        "host_graph_stats": _host_graph_stats,
        "doc_link_quality": _doc_link_quality,
        "doc_trust_quality": _doc_trust_quality,
        "host_components": _host_components,
        "form_fields": _form_fields,
        "formatting": _formatting,
        "list_markers": _list_markers,
        "pdf_outline": _pdf_outline,
        "image_meta": _image_meta,
        "av_meta": _av_meta,
        # exports
        "export_markdown": _export_markdown,
        "export_html": _export_html,
        "export_chunks": _export_chunks,
        # relational coverage
        "q1_lineitem_agg": A.q1_lineitem_agg,
        "q3_top_orders": A.q3_top_orders,
        "q5_local_supplier_revenue": A.q5_local_supplier_revenue,
        "q4_order_priority": A.q4_order_priority,
        "q7_nation_volume": A.q7_nation_volume,
        "q22_global_sales_opportunity": A.q22_global_sales_opportunity,
        "q10_returned_items": A.q10_returned_items,
        "q18_large_orders": A.q18_large_orders,
        "q19_disjunctive_revenue": A.q19_disjunctive_revenue,
        "event_lag_deltas": A.event_lag_deltas,
        "q14_promo_revenue": A.q14_promo_revenue,
        "q6_forecast_revenue": A.q6_forecast_revenue,
        "q13_customer_distribution": A.q13_customer_distribution,
        "q15_top_supplier": A.q15_top_supplier,
        "q2_min_cost_part": A.q2_min_cost_part,
        "q16_part_supplier_counts": A.q16_part_supplier_counts,
        "q17_small_quantity_revenue": A.q17_small_quantity_revenue,
        "q8_market_share": A.q8_market_share,
        "q21_waiting_supplier": A.q21_waiting_supplier,
        "q9_profit_by_nation_year": A.q9_profit_by_nation_year,
        "q11_important_parts": A.q11_important_parts,
        "q20_potential_promotion": A.q20_potential_promotion,
        "cube_revenue": A.cube_revenue,
        "pack_sequences": A.pack_sequences,
        "intersect_users": A.intersect_users,
        "except_users": A.except_users,
        "json_props_stats": A.json_props_stats,
        "pivot_user_events": A.pivot_user_events,
        "unpivot_user_events": A.unpivot_user_events,
        "q12_late_shipments": A.q12_late_shipments,
        "full_outer_user_activity": A.full_outer_user_activity,
        "funnel_conversions": A.funnel_conversions,
        "order_priority_revenue": A.order_priority_revenue,
        "mktsegment_order_stats": A.mktsegment_order_stats,
        "topk_orders": A.topk_orders,
        "topk_orders_per_group": A.topk_orders_per_group,
        "events_hourly": A.events_hourly_window,
        "events_sliding": A.sliding_window_events,
        "event_quantiles": A.event_value_quantiles,
        "distinct_event_types": A.distinct_event_types,
        "sessionize": A.sessionize_events,
        "asof_join": A.asof_join_events_orders,
        "range_join": A.range_join_events_orders,
        "train_split": A.train_split,
        "docs_by_lang_source": A.docs_by_lang_source,
        "anti_join_customers": A.anti_join_customers,
        "stratified_sample": A.stratified_sample,
        "customer_urgent_counts": A.customer_urgent_counts,
        "rollup_revenue": A.rollup_revenue,
        "user_running_value": A.user_running_value,
        "funnel_counts": _funnel_counts,
        "extracted_training_corpus": _extracted_training_corpus,
        "web_curated_corpus": _web_curated_corpus,
        "event_rank_windows": A.event_rank_windows,
    }


# Shared SQL fragments for the shingle/Jaccard oracles: word 3-shingle sets
# over [a-z0-9]+ tokens — mirrors functions/hashing.word_shingles exactly.
_SHINGLES_CTE = (
    "t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks "
    "FROM documents), "
    "s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN "
    "(CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] ELSE [] END) "
    "ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END AS sh FROM t)"
)
_JACCARD_EXPR = (
    "CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 1.0 "
    "ELSE len(list_intersect(a.sh, b.sh)) * 1.0 "
    "/ len(list_distinct(a.sh || b.sh)) END"
)
# Semantics-preserving pair prefilter for threshold 0.8: J(A,B) >= 0.8
# implies |A| >= 0.8|B| and |B| >= 0.8|A| (|A∩B| <= min sizes,
# |A∪B| >= max sizes), so the integer size band prunes pairs BEFORE the
# O(|A|+|B|) list ops — the all-pairs oracle stays exact but stops being
# list-op-quadratic on corpora where most pairs differ in length.
_JACCARD_BAND = ("5 * len(a.sh) >= 4 * len(b.sh) "
                 "AND 5 * len(b.sh) >= 4 * len(a.sh)")
# transitive closure + min-reachable representative over a pair CTE ``p``
_CC_SQL = (
    "e AS (SELECT a, b FROM p UNION SELECT b, a FROM p "
    "UNION SELECT a, a FROM p UNION SELECT b, b FROM p), "
    "reach AS (SELECT a, b FROM e "
    "UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a) "
    "SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a "
    "ORDER BY doc_id"
)
# SQL re-computation of functions/hashing.simhash64: md5-derived token
# hashes, frequency-weighted bit votes, vote>0 → bit set
_SIMHASH_CTE = (
    "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
    "'[a-z0-9]+')) AS w FROM documents), "
    "hv AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h "
    "FROM tok), "
    "votes AS (SELECT doc_id, b, sum(CASE WHEN (h >> CAST(b AS UBIGINT)) "
    "& 1::UBIGINT = 1::UBIGINT THEN 1 ELSE -1 END) AS v "
    "FROM hv CROSS JOIN (SELECT unnest(range(64)) AS b) bs "
    "GROUP BY doc_id, b), "
    "sig0 AS (SELECT doc_id, bit_or(CASE WHEN v > 0 THEN "
    "(1::HUGEINT << b)::UBIGINT ELSE 0::UBIGINT END) AS s "
    "FROM votes GROUP BY doc_id), "
    "sig AS (SELECT d.doc_id, coalesce(s0.s, 0::UBIGINT) AS s "
    "FROM documents d LEFT JOIN sig0 s0 USING (doc_id))"
)


def _sql_list(items) -> str:
    return "[" + ", ".join("'" + i.replace("'", "''") + "'" for i in items) + "]"


def _lang_id_sql() -> str:
    """SQL re-computation of stages/text_quality.LangIdModel.classify: the
    profile tables are shared data, the scoring arithmetic (stopword ratio
    ×2 + trigram density, argmax with insertion-order ties, <1e-3 → und)
    is recomputed independently by DuckDB."""
    from docling_ray.stages.text_quality import _LANG_STOPWORDS, _LANG_TRIGRAMS

    vals = ", ".join(
        f"('{lang}', {idx}, {_sql_list(sorted(_LANG_STOPWORDS[lang]))}, "
        f"{_sql_list(_LANG_TRIGRAMS[lang])})"
        for idx, lang in enumerate(_LANG_STOPWORDS)
    )
    return (
        f"WITH langs(lang, idx, stops, tris) AS (VALUES {vals}), "
        "base AS (SELECT doc_id, lower(text) AS tl, "
        "' ' || lower(text) || ' ' AS p, "
        "regexp_extract_all(lower(text), '[a-zß-öø-ÿ]+') AS words "
        "FROM documents), "
        "scored AS (SELECT b.doc_id, l.lang, l.idx, "
        "2.0 * (len(list_filter(b.words, w -> list_contains(l.stops, w))) "
        "* 1.0 / greatest(len(b.words), 1)) "
        "+ (list_sum(list_transform(l.tris, g -> "
        "(length(b.p) - length(replace(b.p, g, ''))) // 3)) "
        "* 1.0 / greatest(length(b.tl), 1)) AS score "
        "FROM base b CROSS JOIN langs l), "
        "best AS (SELECT doc_id, lang, score, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score DESC, idx) AS rn FROM scored) "
        "SELECT doc_id, CASE WHEN score < 0.001 THEN 'und' ELSE lang END "
        "AS pred_lang FROM best WHERE rn = 1 ORDER BY doc_id"
    )


def _expected_table_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Oracles for the extraction-derived queries: expected tables built
    from the generator's hand-computed spans (docling_ray/oracles.py),
    never by running the extractors. Defaults to sf0.01 — the sf the
    driver's correctness gate runs at; ``oracle_sql(sf_dir)`` threads a
    different sf through so tools/check_oracles.py compares like with
    like at any scale."""
    try:
        from docling_ray.oracles import ensure_expected_tables

        exp = ensure_expected_tables(sf_dir, seed=SEED)
    except Exception:
        return {}
    return {
        "extract_summary": (
            "SELECT doc_id, status, n_spans, byte_size "
            f"FROM read_parquet('{exp}/extract_summary.parquet') "
            "ORDER BY doc_id"
        ),
        "heading_levels": (
            'SELECT doc_id, "offset", text, level '
            f"FROM read_parquet('{exp}/heading_levels.parquet') "
            'ORDER BY doc_id, "offset"'
        ),
        "export_html": (
            "SELECT doc_id, content "
            f"FROM read_parquet('{exp}/export_html.parquet') "
            "ORDER BY doc_id"
        ),
        "export_chunks": (
            "SELECT doc_id, content "
            f"FROM read_parquet('{exp}/export_chunks.parquet') "
            "ORDER BY doc_id"
        ),
        "export_markdown": (
            "SELECT doc_id, content "
            f"FROM read_parquet('{exp}/export_markdown.parquet') "
            "ORDER BY doc_id"
        ),
        "extracted_training_corpus": (
            # same token gate + exact dedup over the EXPECTED markdown
            # exports: min doc_id per distinct content survives
            "WITH m AS (SELECT doc_id, content "
            f"FROM read_parquet('{exp}/export_markdown.parquet')), "
            "q AS (SELECT doc_id, content, "
            "len(regexp_extract_all(lower(content), '[a-z0-9]+'))::BIGINT "
            "AS n_tokens FROM m), "
            "k AS (SELECT * FROM q WHERE n_tokens >= 30), "
            "d AS (SELECT min(doc_id) AS doc_id FROM k GROUP BY content) "
            "SELECT k.doc_id, k.n_tokens FROM k JOIN d USING (doc_id) "
            "ORDER BY k.doc_id"
        ),
        "detect_format": (
            'SELECT doc_id, "offset", kind '
            f"FROM read_parquet('{exp}/detect_format.parquet') "
            'ORDER BY doc_id, "offset"'
        ),
        "code_langs": (
            'SELECT doc_id, "offset", code_language '
            f"FROM read_parquet('{exp}/code_langs.parquet') "
            'ORDER BY doc_id, "offset"'
        ),
        "picture_classes": (
            'SELECT doc_id, "offset", media_ref, predicted_class '
            f"FROM read_parquet('{exp}/picture_classes.parquet') "
            'ORDER BY doc_id, "offset"'
        ),
        "kv_pairs": (
            "SELECT doc_id, pair_idx, key, value, source "
            f"FROM read_parquet('{exp}/kv_pairs.parquet') "
            "ORDER BY doc_id, pair_idx"
        ),
        "media_features": (
            "SELECT doc_id, media_ref, pixel_mean "
            f"FROM read_parquet('{exp}/media_features.parquet') "
            "ORDER BY doc_id, media_ref"
        ),
        "hyperlinks": (
            "SELECT doc_id, link_idx, text, href, region "
            f"FROM read_parquet('{exp}/hyperlinks.parquet') "
            "ORDER BY doc_id, link_idx"
        ),
        "form_fields": (
            "SELECT doc_id, field_idx, key, value, widget "
            f"FROM read_parquet('{exp}/form_fields.parquet') "
            "ORDER BY doc_id, field_idx"
        ),
        "formatting": (
            "SELECT doc_id, fmt_idx, text, style, region "
            f"FROM read_parquet('{exp}/formatting.parquet') "
            "ORDER BY doc_id, fmt_idx"
        ),
        "list_markers": (
            "SELECT doc_id, marker_idx, text, marker "
            f"FROM read_parquet('{exp}/list_markers.parquet') "
            "ORDER BY doc_id, marker_idx"
        ),
        "pdf_outline": (
            "SELECT doc_id, outline_idx, title, level, page_no "
            f"FROM read_parquet('{exp}/pdf_outline.parquet') "
            "ORDER BY doc_id, outline_idx"
        ),
        "image_meta": (
            "SELECT doc_id, width, height, mode, fingerprint "
            f"FROM read_parquet('{exp}/image_meta.parquet') "
            "ORDER BY doc_id"
        ),
        "doc_chunks_hybrid": (
            "SELECT doc_id, chunk_idx, text, headings, n_tokens "
            f"FROM read_parquet('{exp}/doc_chunks_hybrid.parquet') "
            "ORDER BY doc_id, chunk_idx"
        ),
        "render_bboxes": (
            'SELECT doc_id, "offset", page_no, l, t, r, b '
            f"FROM read_parquet('{exp}/render_bboxes.parquet') "
            'ORDER BY doc_id, "offset"'
        ),
        "rag_topk": (
            "SELECT doc_id, chunk_idx, sim_e6 "
            f"FROM read_parquet('{exp}/rag_topk.parquet') "
            "ORDER BY sim_e6 DESC, doc_id, chunk_idx"
        ),
        "av_meta": (
            "SELECT doc_id, seq, kind, text, media_ref "
            f"FROM read_parquet('{exp}/av_meta.parquet') "
            "ORDER BY doc_id, seq"
        ),
        "picture_descriptions": (
            'SELECT doc_id, "offset", media_ref, description '
            f"FROM read_parquet('{exp}/picture_descriptions.parquet') "
            'ORDER BY doc_id, "offset"'
        ),
        "chart_tables": (
            'SELECT doc_id, "offset", media_ref, chart_type, data '
            f"FROM read_parquet('{exp}/chart_tables.parquet') "
            'ORDER BY doc_id, "offset"'
        ),
        **_webgraph_sql(exp),
    }


# host() in SQL — mirrors functions/urls.py:url_host byte for byte
_HOST_RE_SQL = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_ABS_HTTP_SQL = "regexp_matches(href, '^[hH][tT][tT][pP][sS]?://')"


def _webgraph_sql(exp: str) -> dict[str, str]:
    """Web-graph oracles, all derived from the expected hyperlinks table
    with the same edge rule as stages/webgraph.py: src host = host of the
    doc's canonical URL, dst hosts = hosts of its absolute http(s)
    outlinks; anchor terms aggregate over all absolute links."""
    cte = (
        "links AS (SELECT doc_id, text, href, region "
        f"FROM read_parquet('{exp}/hyperlinks.parquet')), "
        "canon AS (SELECT doc_id, lower(regexp_extract(href, "
        f"'{_HOST_RE_SQL}', 1)) AS src_host FROM links "
        "WHERE region = 'canonical'), "
        "out_links AS (SELECT doc_id, text, lower(regexp_extract(href, "
        f"'{_HOST_RE_SQL}', 1)) AS dst_host FROM links "
        f"WHERE region <> 'canonical' AND {_ABS_HTTP_SQL}), "
        "edges AS MATERIALIZED (SELECT src_host, dst_host, "
        "COUNT(*)::BIGINT AS n_links "
        "FROM canon JOIN out_links USING (doc_id) "
        "WHERE src_host <> '' AND dst_host <> '' GROUP BY 1, 2)"
    )
    # loop-unrolled integer PageRank: r0 = SCALE // N; each iteration
    # r_{t+1} = base + (85 * Σ (r_t(src) // ow(src)) * w) // 100, all
    # floor integer division — bit-identical to the Ray implementation
    pr = (
        ", nodes AS MATERIALIZED (SELECT DISTINCT host FROM "
        "(SELECT src_host AS host "
        "FROM edges UNION ALL SELECT dst_host FROM edges)), "
        "ow AS MATERIALIZED (SELECT src_host AS host, "
        "SUM(n_links)::BIGINT AS w FROM edges GROUP BY 1), "
        "nn AS MATERIALIZED (SELECT COUNT(*)::BIGINT AS c FROM nodes), "
        "r0 AS (SELECT host, (SELECT 1000000000000 // c FROM nn) AS r "
        "FROM nodes)"
    )
    for i in range(1, 9):
        pr += (
            f", r{i} AS (SELECT nodes.host, CAST("
            "(SELECT (15 * (1000000000000 // c)) // 100 FROM nn) "
            "+ (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r FROM nodes "
            "LEFT JOIN (SELECT e.dst_host AS host, "
            "SUM((r.r // o.w) * e.n_links) AS s FROM edges e "
            f"JOIN r{i - 1} r ON e.src_host = r.host "
            "JOIN ow o ON e.src_host = o.host GROUP BY 1) s "
            "ON nodes.host = s.host)"
        )
    # loop-unrolled integer HITS: per half-iteration a weighted sum then a
    # max-normalization x' = (x * 1e6) // max(x) — all floor integer ops
    hits = (
        ", nodes AS MATERIALIZED (SELECT DISTINCT host FROM "
        "(SELECT src_host AS host "
        "FROM edges UNION ALL SELECT dst_host FROM edges)), "
        "h0 AS (SELECT host, CAST(1000000 AS BIGINT) AS x FROM nodes)"
    )
    for i in range(1, 5):
        for tgt, prev, jk, ek in (
                (f"a{i}", f"h{i - 1}", "src_host", "dst_host"),
                (f"h{i}", f"a{i}", "dst_host", "src_host")):
            # AS MATERIALIZED: DuckDB inlines single-use CTEs, and this
            # chain re-expands each level into the previous ones —
            # exponential plan growth without it
            hits += (
                f", {tgt}s AS MATERIALIZED (SELECT e.{ek} AS host, "
                f"SUM(p.x * e.n_links) AS s FROM edges e "
                f"JOIN {prev} p ON e.{jk} = p.host GROUP BY 1), "
                f"{tgt}m AS MATERIALIZED (SELECT MAX(s) AS m FROM {tgt}s), "
                f"{tgt} AS MATERIALIZED (SELECT n.host, CAST(COALESCE("
                f"(s.s * 1000000) // (SELECT m FROM {tgt}m), 0) AS BIGINT) "
                f"AS x FROM nodes n LEFT JOIN {tgt}s s ON n.host = s.host)"
            )
    # loop-unrolled integer TrustRank: teleport mass confined to the
    # top-in-degree seed hosts; non-seeds have a ZERO base term
    seed_case = (
        "CASE WHEN nodes.host IN (SELECT host FROM seeds) "
        "THEN (SELECT (15 * (1000000000000 // s)) // 100 FROM ns) "
        "ELSE 0 END"
    )
    tr = (
        ", nodes AS MATERIALIZED (SELECT DISTINCT host FROM "
        "(SELECT src_host AS host FROM edges "
        "UNION ALL SELECT dst_host FROM edges)), "
        "ow AS MATERIALIZED (SELECT src_host AS host, "
        "SUM(n_links)::BIGINT AS w FROM edges GROUP BY 1), "
        "indeg AS MATERIALIZED (SELECT dst_host AS host, "
        "SUM(n_links)::BIGINT AS w FROM edges GROUP BY 1), "
        "seeds AS MATERIALIZED (SELECT host FROM indeg "
        "ORDER BY w DESC, host LIMIT 4), "
        "ns AS MATERIALIZED (SELECT COUNT(*)::BIGINT AS s FROM seeds), "
        "t0 AS (SELECT nodes.host, CAST(CASE WHEN nodes.host IN "
        "(SELECT host FROM seeds) "
        "THEN (SELECT 1000000000000 // s FROM ns) ELSE 0 END AS BIGINT) "
        "AS r FROM nodes)"
    )
    for i in range(1, 9):
        tr += (
            f", t{i} AS MATERIALIZED (SELECT nodes.host, CAST("
            f"{seed_case} + (85 * COALESCE(sq.s2, 0)) // 100 AS BIGINT) "
            "AS r FROM nodes LEFT JOIN (SELECT e.dst_host AS host, "
            "SUM((r.r // o.w) * e.n_links) AS s2 FROM edges e "
            f"JOIN t{i - 1} r ON e.src_host = r.host "
            "JOIN ow o ON e.src_host = o.host GROUP BY 1) sq "
            "ON nodes.host = sq.host)"
        )
    return {
        "host_graph": (
            f"WITH {cte} SELECT src_host, dst_host, n_links FROM edges "
            "ORDER BY src_host, dst_host"
        ),
        "trustrank_hosts": (
            f"WITH {cte}{tr} "
            "SELECT host, r AS trust_scaled FROM t8 ORDER BY host"
        ),
        "coupling_hosts": (
            # unordered src pairs sharing >= 2 distinct targets
            f"WITH {cte} "
            "SELECT e1.src_host AS a, e2.src_host AS b, "
            "COUNT(*)::BIGINT AS n_common "
            "FROM edges e1 JOIN edges e2 ON e1.dst_host = e2.dst_host "
            "AND e1.src_host < e2.src_host "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY a, b"
        ),
        "host_graph_stats": (
            # reciprocal = ordered edges whose reverse edge exists
            # (self-loops are their own reverse)
            f"WITH {cte}, "
            "r AS (SELECT COUNT(*)::BIGINT AS c FROM edges e1 "
            "JOIN edges e2 ON e1.src_host = e2.dst_host "
            "AND e1.dst_host = e2.src_host), "
            "n AS (SELECT COUNT(*)::BIGINT AS c FROM "
            "(SELECT src_host AS h FROM edges "
            "UNION SELECT dst_host FROM edges)), "
            "t AS (SELECT COUNT(*)::BIGINT AS e, "
            "SUM(n_links)::BIGINT AS l, "
            "SUM(CASE WHEN src_host = dst_host THEN 1 ELSE 0 "
            "END)::BIGINT AS s FROM edges) "
            "SELECT n.c AS n_hosts, t.e AS n_edges, t.l AS n_links, "
            "t.s AS n_self_loops, r.c AS n_reciprocal_edges FROM n, t, r"
        ),
        "cocitation_hosts": (
            # unordered dst pairs sharing >= 2 distinct linking sources
            f"WITH {cte} "
            "SELECT e1.dst_host AS a, e2.dst_host AS b, "
            "COUNT(*)::BIGINT AS n_common "
            "FROM edges e1 JOIN edges e2 ON e1.src_host = e2.src_host "
            "AND e1.dst_host < e2.dst_host "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY a, b"
        ),
        "hits_hosts": (
            f"WITH {cte}{hits} "
            "SELECT n.host, h.x AS hub_scaled, a.x AS authority_scaled "
            "FROM nodes n JOIN h4 h ON n.host = h.host "
            "JOIN a4 a ON n.host = a.host ORDER BY n.host"
        ),
        "host_degree": (
            f"WITH {cte}, "
            "o AS (SELECT src_host AS host, SUM(n_links)::BIGINT AS "
            "out_links, COUNT(*)::BIGINT AS out_hosts FROM edges "
            "GROUP BY 1), "
            "i AS (SELECT dst_host AS host, SUM(n_links)::BIGINT AS "
            "in_links, COUNT(*)::BIGINT AS in_hosts FROM edges "
            "GROUP BY 1) "
            "SELECT COALESCE(o.host, i.host) AS host, "
            "COALESCE(out_links, 0)::BIGINT AS out_links, "
            "COALESCE(out_hosts, 0)::BIGINT AS out_hosts, "
            "COALESCE(in_links, 0)::BIGINT AS in_links, "
            "COALESCE(in_hosts, 0)::BIGINT AS in_hosts "
            "FROM o FULL OUTER JOIN i ON o.host = i.host ORDER BY host"
        ),
        "host_anchor_terms": (
            f"WITH {cte} "
            "SELECT host, term, COUNT(*)::BIGINT AS n FROM ("
            "SELECT dst_host AS host, "
            "unnest(string_split(lower(text), ' ')) AS term "
            "FROM out_links WHERE dst_host <> '') "
            "WHERE term <> '' GROUP BY 1, 2 ORDER BY host, term"
        ),
        "pagerank_hosts": (
            f"WITH {cte}{pr} "
            "SELECT host, r AS rank_scaled FROM r8 ORDER BY host"
        ),
        "doc_link_quality": (
            f"WITH {cte}{pr} "
            "SELECT c.doc_id, c.src_host AS host, r.r AS rank_scaled "
            "FROM canon c JOIN r8 r ON c.src_host = r.host "
            "WHERE c.src_host <> '' ORDER BY c.doc_id"
        ),
        "doc_trust_quality": (
            f"WITH {cte}{tr} "
            "SELECT c.doc_id, c.src_host AS host, t.r AS trust_scaled "
            "FROM canon c JOIN t8 t ON c.src_host = t.host "
            "WHERE c.src_host <> '' ORDER BY c.doc_id"
        ),
        "web_curated_corpus": (
            # extraction→markdown gate+dedup survivors ∩ docs whose
            # canonical host EARNED rank (strictly above the base term)
            f"WITH {cte}{pr}, "
            "m AS (SELECT doc_id, content "
            f"FROM read_parquet('{exp}/export_markdown.parquet')), "
            "q AS (SELECT doc_id, content, "
            "len(regexp_extract_all(lower(content), '[a-z0-9]+'))::BIGINT "
            "AS n_tokens FROM m), "
            "k AS (SELECT * FROM q WHERE n_tokens >= 30), "
            "d AS (SELECT min(doc_id) AS doc_id FROM k GROUP BY content), "
            "surv AS (SELECT k.doc_id, k.n_tokens FROM k "
            "JOIN d USING (doc_id)), "
            "base AS (SELECT (15 * (1000000000000 // c)) // 100 AS b "
            "FROM nn), "
            "docrank AS (SELECT c.doc_id, r.r FROM canon c "
            "JOIN r8 r ON c.src_host = r.host WHERE c.src_host <> '' "
            "AND r.r > (SELECT b FROM base)) "
            "SELECT s.doc_id, s.n_tokens, "
            "CAST(dr.r AS BIGINT) AS rank_scaled "
            "FROM surv s JOIN docrank dr USING (doc_id) "
            "ORDER BY s.doc_id"
        ),
        "host_components": (
            f"WITH RECURSIVE {cte}, "
            "e AS (SELECT src_host AS a, dst_host AS b FROM edges "
            "UNION SELECT dst_host, src_host FROM edges "
            "UNION SELECT src_host, src_host FROM edges "
            "UNION SELECT dst_host, dst_host FROM edges), "
            "reach AS (SELECT a, b FROM e "
            "UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a) "
            "SELECT a AS host, min(b) AS component FROM reach GROUP BY a "
            "ORDER BY host"
        ),
    }


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Driver contract: zero-arg call compares at sf0.01 (the driver's
    gate); the optional ``sf_dir`` lets local tooling check other scales."""
    return {
        **_expected_table_sql(sf_dir),
        "lang_id": _lang_id_sql(),
        "event_quantiles": (
            "WITH b AS (SELECT event_type, "
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events), "
            "r AS (SELECT event_type, v, "
            "row_number() OVER (PARTITION BY event_type ORDER BY v) rn, "
            "COUNT(*) OVER (PARTITION BY event_type) n FROM b) "
            "SELECT event_type, MAX(n)::BIGINT AS n_events, "
            "MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) "
            "THEN v END) AS p50_x100, "
            "MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) "
            "THEN v END) AS p95_x100 "
            "FROM r GROUP BY event_type ORDER BY event_type"
        ),
        "events_sliding": (
            # each event joins its 4 enclosing 60-min windows at 15-min
            # steps; window key kept in epoch-us (exact integers)
            "SELECT e.event_type, "
            "(epoch_us(e.ts) // 900000000) * 900000000 "
            "- k.k * 900000000 AS window_start_us, "
            "COUNT(*)::BIGINT AS n_events, "
            "CAST(round(SUM(e.value) * 100) AS BIGINT) AS sum_value_x100 "
            "FROM events e, (SELECT unnest(range(0, 4)) AS k) k "
            "GROUP BY e.event_type, window_start_us "
            "ORDER BY e.event_type, window_start_us"
        ),
        "range_join": (
            # order dates mapped into the events month (same epoch-us
            # arithmetic as the Ray side) so the interval is non-vacuous
            "WITH o2 AS (SELECT o_custkey, "
            "TIMESTAMP '2024-01-01' + to_microseconds("
            "(epoch_us(o_orderdate::TIMESTAMP) - "
            "epoch_us(TIMESTAMP '1995-01-01')) % "
            "(30::BIGINT * 86400 * 1000000)) AS odate FROM orders) "
            "SELECT e.event_type, COUNT(*)::BIGINT AS n_matched "
            "FROM events e WHERE EXISTS (SELECT 1 FROM o2 o "
            "WHERE o.o_custkey = e.user_id "
            "AND e.ts >= o.odate "
            "AND e.ts <= o.odate + INTERVAL 7 DAY) "
            "GROUP BY e.event_type ORDER BY e.event_type"
        ),
        "train_split": (
            "SELECT doc_id, CASE "
            "WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
            "::UBIGINT % 100 < 80 THEN 'train' "
            "WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
            "::UBIGINT % 100 < 90 THEN 'val' ELSE 'test' END AS split "
            "FROM documents ORDER BY doc_id"
        ),
        "q3_top_orders": (
            # TPC-H Q3 shape over the available columns; revenue is the
            # exact 4-decimal x10000 integer, date as epoch days
            "SELECT l_orderkey, CAST(round(sum(l_extendedprice * "
            "(1 - l_discount)) * 10000) AS BIGINT) AS revenue_x10000, "
            "epoch_us(max(o_orderdate)) // 86400000000 "
            "AS o_orderdate_days "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND o_orderdate < TIMESTAMP '1996-06-01' "
            "AND l_shipdate > TIMESTAMP '1996-06-01' "
            "GROUP BY l_orderkey "
            "ORDER BY revenue_x10000 DESC, l_orderkey LIMIT 10"
        ),
        "q5_local_supplier_revenue": (
            # six-table TPC-H Q5 shape: local-supplier revenue per
            # nation in ASIA, calendar-1996 orders
            "SELECT n_name, CAST(round(sum(l_extendedprice * "
            "(1 - l_discount)) * 10000) AS BIGINT) AS revenue_x10000 "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey "
            "AND n_regionkey = r_regionkey AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name ORDER BY revenue_x10000 DESC, n_name"
        ),
        "q14_promo_revenue": (
            # Q14 shape: promo share of January-1996 revenue; the ppm
            # divides two exact x10000 integers (floor — int both sides)
            "WITH s AS (SELECT CAST(round(sum(CASE WHEN "
            "p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) "
            "ELSE 0 END) * 10000) AS BIGINT) AS promo_x10000, "
            "CAST(round(sum(l_extendedprice * (1 - l_discount)) "
            "* 10000) AS BIGINT) AS total_x10000 "
            "FROM lineitem, part WHERE l_partkey = p_partkey "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-02-01') "
            "SELECT promo_x10000, total_x10000, "
            "promo_x10000 * 1000000 // total_x10000 AS promo_ppm FROM s"
        ),
        "q6_forecast_revenue": (
            # Q6 shape: scan-filter-sum; discount band on the exact
            # x100 integer (float BETWEEN is representation-dependent)
            "SELECT CAST(round(sum(l_extendedprice * l_discount) "
            "* 10000) AS BIGINT) AS revenue_x10000 FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"
        ),
        "q13_customer_distribution": (
            # Q13 shape: customer ⟕ orders double aggregate
            "WITH pc AS (SELECT c_custkey, "
            "count(o_orderkey)::BIGINT AS c_count "
            "FROM customer LEFT OUTER JOIN orders ON "
            "c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
            "GROUP BY c_custkey) "
            "SELECT c_count, count(*)::BIGINT AS custdist FROM pc "
            "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
        ),
        "q15_top_supplier": (
            # Q15 shape: argmax-revenue supplier(s), ties kept; the max
            # compares exact x10000 integers on both engines
            "WITH rev AS (SELECT l_suppkey, "
            "CAST(round(sum(l_extendedprice * (1 - l_discount)) "
            "* 10000) AS BIGINT) AS total_revenue_x10000 FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' "
            "GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_revenue_x10000 "
            "FROM supplier JOIN rev ON s_suppkey = l_suppkey "
            "WHERE total_revenue_x10000 = "
            "(SELECT max(total_revenue_x10000) FROM rev) "
            "ORDER BY s_suppkey"
        ),
        "q2_min_cost_part": (
            # Q2 shape: argmin-per-group join-back (partkey tie-break)
            "SELECT p_brand, p_partkey, p_name, "
            "CAST(round(p_retailprice * 100) AS BIGINT) "
            "AS retailprice_x100 FROM part "
            "QUALIFY row_number() OVER (PARTITION BY p_brand "
            "ORDER BY p_retailprice, p_partkey) = 1 ORDER BY p_brand"
        ),
        "q16_part_supplier_counts": (
            # Q16 shape: distinct suppliers per (brand, size), NOT-IN
            # supplier exclusion (negative balance stands in for the
            # complaints predicate — schema has no s_comment)
            "SELECT p_brand, p_size::BIGINT AS p_size, "
            "count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_size IN (1, 5, 9, 13) AND p_brand <> 'Brand#45' "
            "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
            "WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_size "
            "ORDER BY supplier_cnt DESC, p_brand, p_size"
        ),
        "q17_small_quantity_revenue": (
            # Q17 shape: correlated per-partkey average; qty < 0.2*avg
            # restated float-free as 5*qty_x100*cnt < sum_qty_x100
            "WITH a AS (SELECT l_partkey, "
            "CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) "
            "AS BIGINT) AS sq, count(*)::BIGINT AS c "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand = 'Brand#23' GROUP BY l_partkey) "
            "SELECT CAST(round(sum(l_extendedprice) * 100) AS BIGINT) "
            "// 7 AS avg_yearly_x100 "
            "FROM lineitem JOIN a USING (l_partkey) "
            "WHERE 5 * CAST(round(l_quantity * 100) AS BIGINT) * c < sq"
        ),
        "q8_market_share": (
            # Q8 shape: national market share per order year (floor ppm
            # over the exact x10000 integers)
            "WITH t AS (SELECT EXTRACT(year FROM o_orderdate)::BIGINT "
            "AS o_year, l_extendedprice * (1 - l_discount) AS vol, "
            "n2.n_name AS supp_nation "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
            "JOIN region ON n1.n_regionkey = r_regionkey "
            "WHERE p_type = 'STANDARD' AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01'), "
            "s AS (SELECT o_year, CAST(round(sum(CASE WHEN "
            "supp_nation = 'NATION_1' THEN vol ELSE 0 END) * 10000) "
            "AS BIGINT) AS nation_x10000, "
            "CAST(round(sum(vol) * 10000) AS BIGINT) AS total_x10000 "
            "FROM t GROUP BY o_year) "
            "SELECT o_year, nation_x10000, total_x10000, "
            "nation_x10000 * 1000000 // total_x10000 AS share_ppm "
            "FROM s ORDER BY o_year"
        ),
        "q21_waiting_supplier": (
            # Q21 shape: double-EXISTS anti-join over (order, supplier)
            # pairs; lateness = shipdate > orderdate + 60 days (the
            # schema has no commit/receipt dates)
            "WITH ls AS (SELECT l_orderkey, l_suppkey, "
            "max(l_shipdate) AS ms FROM lineitem GROUP BY 1, 2) "
            "SELECT s_name, count(*)::BIGINT AS numwait "
            "FROM ls l1 JOIN orders ON o_orderkey = l1.l_orderkey "
            "JOIN supplier ON s_suppkey = l1.l_suppkey "
            "WHERE o_orderstatus = 'F' "
            "AND l1.ms > o_orderdate + INTERVAL 60 DAY "
            "AND EXISTS (SELECT 1 FROM ls l2 WHERE "
            "l2.l_orderkey = l1.l_orderkey "
            "AND l2.l_suppkey <> l1.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM ls l3 WHERE "
            "l3.l_orderkey = l1.l_orderkey "
            "AND l3.l_suppkey <> l1.l_suppkey "
            "AND l3.ms > o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY s_name ORDER BY numwait DESC, s_name"
        ),
        "q9_profit_by_nation_year": (
            # Q9 shape (no partsupp): profit by supplier nation and
            # order year; part cost stands in as retailprice * quantity
            "SELECT n_name AS nation, "
            "EXTRACT(year FROM o_orderdate)::BIGINT AS o_year, "
            "CAST(round(sum(l_extendedprice * (1 - l_discount) "
            "- p_retailprice * l_quantity) * 10000) AS BIGINT) "
            "AS profit_x10000 "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE p_name LIKE 'red%' "
            "GROUP BY 1, 2 ORDER BY nation, o_year DESC"
        ),
        "q11_important_parts": (
            # Q11 shape (no partsupp): per-part shipped value from one
            # nation's suppliers, HAVING value > 2x the average per-part
            # value (scale-free) — integer arithmetic on exact x100s
            "WITH v AS (SELECT l_partkey, "
            "CAST(round(sum(l_extendedprice) * 100) AS BIGINT) "
            "AS value_x100 "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_1' GROUP BY l_partkey) "
            "SELECT l_partkey, value_x100 FROM v "
            "WHERE value_x100 * (SELECT count(*) FROM v) > "
            "2 * (SELECT sum(value_x100) FROM v) "
            "ORDER BY value_x100 DESC, l_partkey"
        ),
        "q20_potential_promotion": (
            # Q20 shape (no partsupp): nested-IN semi-join chain —
            # suppliers in NATION_1 that shipped > 30 units of any
            # 'blue%' part during 1996 (exact x100 quantities)
            "SELECT s_suppkey, s_name "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_1' AND s_suppkey IN ("
            "SELECT l_suppkey FROM lineitem "
            "WHERE l_partkey IN (SELECT p_partkey FROM part "
            "WHERE p_name LIKE 'blue%') "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "GROUP BY l_suppkey, l_partkey "
            "HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) "
            "> 3000) "
            "ORDER BY s_name"
        ),
        "pivot_user_events": (
            # PIVOT: long (user, type) → wide per-user count columns
            "SELECT user_id, "
            "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_click, "
            "sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_error, "
            "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_purchase, "
            "sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_signup, "
            "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_view "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "q12_late_shipments": (
            # Q12 shape: two-way conditional counts of LATE (order,
            # returnflag) pairs after the orders join; lateness =
            # max shipdate > orderdate + 90 days (pair semantics — the
            # max is a lossless reduction for an EXISTS-late test)
            "WITH lp AS (SELECT l_orderkey, l_returnflag, "
            "max(l_shipdate) AS ms FROM lineitem GROUP BY 1, 2) "
            "SELECT l_returnflag, "
            "CAST(sum(CASE WHEN o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
            "AS high_line_count, "
            "CAST(sum(CASE WHEN o_orderpriority NOT IN "
            "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
            "AS low_line_count "
            "FROM lp JOIN orders ON o_orderkey = l_orderkey "
            "WHERE lp.ms > o_orderdate + INTERVAL 90 DAY "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "unpivot_user_events": (
            # UNPIVOT: the wide per-user matrix melted back to long
            # rows (zero counts kept — the melt is total)
            "WITH w AS (SELECT user_id, "
            "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_click, "
            "sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_error, "
            "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_purchase, "
            "sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_signup, "
            "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
            "::BIGINT AS n_view "
            "FROM events GROUP BY user_id) "
            "SELECT user_id, 'click' AS event_type, n_click AS n FROM w "
            "UNION ALL SELECT user_id, 'error', n_error FROM w "
            "UNION ALL SELECT user_id, 'purchase', n_purchase FROM w "
            "UNION ALL SELECT user_id, 'signup', n_signup FROM w "
            "UNION ALL SELECT user_id, 'view', n_view FROM w "
            "ORDER BY user_id, event_type"
        ),
        "json_props_stats": (
            # semi-structured extraction: json_extract of props.k, then
            # per-type aggregate (floor ppm — int arithmetic both sides)
            "WITH j AS (SELECT event_type, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS k "
            "FROM events) "
            "SELECT event_type, count(k)::BIGINT AS n_events, "
            "CAST(sum(k) AS BIGINT) AS sum_k, "
            "CAST(sum(k) AS BIGINT) * 1000000 // count(k) AS avg_k_ppm "
            "FROM j WHERE k IS NOT NULL "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "full_outer_user_activity": (
            # FULL OUTER join of per-user click vs purchase aggregates;
            # one-sided users survive with the other side zeroed
            "WITH l AS (SELECT user_id, count(*)::BIGINT AS n, "
            "sum(value) AS s FROM events WHERE event_type = 'click' "
            "GROUP BY user_id), "
            "r AS (SELECT user_id, count(*)::BIGINT AS n, "
            "sum(value) AS s FROM events WHERE event_type = 'purchase' "
            "GROUP BY user_id) "
            "SELECT COALESCE(l.user_id, r.user_id) AS user_id, "
            "COALESCE(l.n, 0)::BIGINT AS click_n, "
            "CAST(round(COALESCE(l.s, 0) * 100) AS BIGINT) "
            "AS click_value_x100, "
            "COALESCE(r.n, 0)::BIGINT AS purchase_n, "
            "CAST(round(COALESCE(r.s, 0) * 100) AS BIGINT) "
            "AS purchase_value_x100 "
            "FROM l FULL OUTER JOIN r ON l.user_id = r.user_id "
            "ORDER BY user_id"
        ),
        "q4_order_priority": (
            # Q4 shape: EXISTS lineitem shipped after the order date
            "SELECT o_orderpriority, count(*)::BIGINT AS n_orders "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-04-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "q22_global_sales_opportunity": (
            # Q22 shape: above-average balance, NOT EXISTS orders
            "SELECT n_name, count(*)::BIGINT AS n_cust, "
            "CAST(round(sum(c_acctbal) * 100) AS BIGINT) "
            "AS acctbal_sum_x100 "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer "
            "WHERE c_acctbal > 0.0) "
            "AND NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey "
            "AND o_orderpriority = '1-URGENT') "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "q7_nation_volume": (
            # Q7 shape: cross-nation shipping volume by ship year
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) "
            "AS BIGINT) AS revenue_x10000 "
            "FROM supplier, lineitem, orders, customer, "
            "nation n1, nation n2 "
            "WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey "
            "AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey "
            "AND c_nationkey = n2.n_nationkey "
            "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
            "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY supp_nation, cust_nation, l_year "
            "ORDER BY supp_nation, cust_nation, l_year"
        ),
        "q10_returned_items": (
            # Q10 shape: returned-item revenue per customer, top 20
            "SELECT c_custkey, c_name, CAST(round(sum(l_extendedprice "
            "* (1 - l_discount)) * 10000) AS BIGINT) AS revenue_x10000, "
            "CAST(round(max(c_acctbal) * 100) AS BIGINT) "
            "AS c_acctbal_x100, max(n_name) AS n_name "
            "FROM customer, orders, lineitem, nation "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-04-01' "
            "AND l_returnflag = 'R' AND c_nationkey = n_nationkey "
            "GROUP BY c_custkey, c_name "
            "ORDER BY revenue_x10000 DESC, c_custkey LIMIT 20"
        ),
        "q18_large_orders": (
            # Q18 shape: orders whose total quantity exceeds 200
            "SELECT o_custkey AS c_custkey, o_orderkey, "
            "epoch_us(o_orderdate) // 86400000000 AS o_orderdate_days, "
            "CAST(round(o_totalprice * 100) AS BIGINT) "
            "AS o_totalprice_x100, "
            "CAST(round(t.qty * 100) AS BIGINT) AS sum_qty_x100 "
            "FROM orders JOIN (SELECT l_orderkey, sum(l_quantity) AS qty "
            "FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) "
            "> 200) t ON o_orderkey = t.l_orderkey "
            "ORDER BY o_totalprice_x100 DESC, o_orderkey LIMIT 100"
        ),
        "q19_disjunctive_revenue": (
            # Q19 shape: disjunctive brand/size/quantity predicates
            "SELECT CAST(round(sum(l_extendedprice * (1 - l_discount)) "
            "* 10000) AS BIGINT) AS revenue_x10000 "
            "FROM lineitem, part WHERE p_partkey = l_partkey AND ("
            "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30))"
        ),
        "event_lag_deltas": (
            # lag() window: per-user consecutive-event gaps, exact µs
            "WITH d AS (SELECT user_id, date_diff('microsecond', "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), "
            "ts) AS g FROM events) "
            "SELECT user_id, count(g)::BIGINT AS n_gaps, "
            "sum(g)::BIGINT AS sum_gap_us FROM d WHERE g IS NOT NULL "
            "GROUP BY user_id ORDER BY user_id"
        ),
        "funnel_conversions": (
            # EXISTS semantics: each 'view' counts once if any same-user
            # 'purchase' lands strictly after it within one hour
            "SELECT a.user_id, count(*)::BIGINT AS n_converted "
            "FROM events a WHERE a.event_type = 'view' "
            "AND EXISTS (SELECT 1 FROM events b "
            "WHERE b.user_id = a.user_id AND b.event_type = 'purchase' "
            "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR) "
            "GROUP BY a.user_id ORDER BY a.user_id"
        ),
        "customer_urgent_counts": (
            "SELECT c.c_custkey, count(o.o_orderkey) AS n_urgent "
            "FROM customer c LEFT JOIN orders o "
            "ON o.o_custkey = c.c_custkey "
            "AND o.o_orderpriority = '1-URGENT' "
            "GROUP BY c.c_custkey ORDER BY c.c_custkey"
        ),
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
            "::UBIGINT % 100 < (CASE WHEN lang = 'en' THEN 20 ELSE 10 END) "
            "ORDER BY doc_id"
        ),
        "pii_scrub": (
            "WITH aug AS (SELECT doc_id, COALESCE(text, '') || "
            "' contact doc' || CAST(doc_id AS VARCHAR) || "
            "'@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) "
            "|| '.' || CAST((doc_id // 7) % 256 AS VARCHAR) AS t "
            "FROM documents) "
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'[EMAIL]', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', "
            "'[IP]', 'g') AS text_redacted, "
            "len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "AS n_emails, "
            "len(regexp_extract_all(regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'[EMAIL]', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) "
            "AS n_ips "
            "FROM aug ORDER BY doc_id"
        ),
        "contamination": (
            "WITH aug AS (SELECT doc_id, COALESCE(text, '') || "
            "CASE WHEN doc_id % 97 = 0 THEN "
            "' benchmark passage ' || CAST(doc_id % 5 AS VARCHAR) || "
            "' shares these exact tokens alpha beta gamma delta epsilon"
            " zeta' WHEN doc_id % 13 = 0 THEN "
            "' benchmark passage ' || CAST(doc_id % 7 AS VARCHAR) || "
            "' shares these exact tokens alpha beta gamma delta epsilon"
            " zeta' ELSE '' END AS text FROM documents), "
            "toks AS (SELECT doc_id, "
            "string_split(lower(text), ' ') AS ws "
            "FROM aug), "
            "grams AS (SELECT doc_id, ws[i:i+7] AS gl "
            "FROM toks, UNNEST(range(1, len(ws) - 6)) AS t(i)), "
            "gs AS (SELECT doc_id, array_to_string(gl, ' ') AS g "
            "FROM grams) "
            "SELECT a.doc_id, COUNT(DISTINCT a.g) AS n_hits "
            "FROM gs a JOIN (SELECT DISTINCT g FROM gs "
            "WHERE doc_id % 97 = 0) b ON a.g = b.g "
            "WHERE a.doc_id % 97 != 0 "
            "GROUP BY a.doc_id ORDER BY a.doc_id"
        ),
        "minhash_dedup": (
            # brute-force exact-Jaccard pairs + recursive-CTE connected
            # components; the Ray side equals this because LSH recall at the
            # high-recall defaults is ~1-7e-15 and verification is exact
            f"WITH RECURSIVE {_SHINGLES_CTE}, "
            "p AS (SELECT a.doc_id AS a, b.doc_id AS b FROM s a "
            "JOIN s b ON a.doc_id < b.doc_id "
            f"AND {_JACCARD_BAND} "
            f"WHERE {_JACCARD_EXPR} >= 0.8), "
            f"{_CC_SQL}"
        ),
        "neardup_best": (
            # same clusters as minhash_dedup, then per-cluster argmax by
            # token count (tie -> min doc_id)
            f"WITH RECURSIVE {_SHINGLES_CTE}, "
            "p AS (SELECT a.doc_id AS a, b.doc_id AS b FROM s a "
            "JOIN s b ON a.doc_id < b.doc_id "
            f"AND {_JACCARD_BAND} "
            f"WHERE {_JACCARD_EXPR} >= 0.8), "
            "e AS (SELECT a, b FROM p UNION SELECT b, a FROM p "
            "UNION SELECT a, a FROM p UNION SELECT b, b FROM p), "
            "reach AS (SELECT a, b FROM e "
            "UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a), "
            "c AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach "
            "GROUP BY a), "
            f"tk AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens "
            "FROM documents), "
            "j AS (SELECT c.rep_id, c.doc_id, tk.n_tokens "
            "FROM c JOIN tk USING (doc_id)) "
            "SELECT j1.rep_id, min(j1.doc_id) AS kept_doc_id, "
            "(SELECT count(*)::BIGINT FROM c WHERE c.rep_id = j1.rep_id) "
            "AS n_members FROM j j1 "
            "WHERE j1.n_tokens = (SELECT max(n_tokens) FROM j j2 "
            "WHERE j2.rep_id = j1.rep_id) "
            "GROUP BY j1.rep_id ORDER BY j1.rep_id"
        ),
        "jaccard_pairs": (
            f"WITH {_SHINGLES_CTE} "
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            f"CAST(floor(({_JACCARD_EXPR}) * 1000000.0) AS BIGINT) AS j_ppm "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            f"AND {_JACCARD_BAND} "
            f"WHERE {_JACCARD_EXPR} >= 0.8 ORDER BY a, b"
        ),
        "simhash_dedup": (
            # recall is exact (pigeonhole over 4 bands at Hamming ≤ 3), so
            # the clusters equal brute-force Hamming pairs + CC
            f"WITH RECURSIVE {_SIMHASH_CTE}, "
            "p AS (SELECT a.doc_id AS a, b.doc_id AS b FROM sig a "
            "JOIN sig b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.s, b.s)) <= 3), "
            f"{_CC_SQL}"
        ),
        "training_corpus": (
            # q/s are referenced multiple times (and s twice in the
            # self-join) — AS MATERIALIZED stops DuckDB's single-use
            # inlining from re-evaluating the quality gate per reference
            # (the HITS-chain lesson; sf0.1 went from hours to minutes)
            "WITH RECURSIVE "
            "tk AS MATERIALIZED (SELECT doc_id, text, "
            f"{_TOKS} AS toks FROM documents), "
            "q AS MATERIALIZED (SELECT doc_id, text, toks FROM tk "
            "WHERE len(toks) >= 5 "
            "AND len(toks) <= 100000 AND floor(len(list_filter(toks, "
            f"x -> list_contains({_STOP_SQL}, x))) * 1000000.0 "
            "/ greatest(len(toks), 1)) >= 10000), "
            "ex AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)), "
            "s AS MATERIALIZED (SELECT doc_id, CASE WHEN len(toks) < 3 THEN "
            "(CASE WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
            "ELSE [] END) ELSE list_distinct(list_transform("
            "generate_series(1, len(toks) - 2), i -> toks[i] || ' ' || "
            "toks[i+1] || ' ' || toks[i+2])) END AS sh FROM q), "
            "p AS (SELECT a.doc_id AS a, b.doc_id AS b FROM s a "
            "JOIN s b ON a.doc_id < b.doc_id "
            f"AND {_JACCARD_BAND} "
            f"WHERE {_JACCARD_EXPR} >= 0.8), "
            "e AS (SELECT a, b FROM p UNION SELECT b, a FROM p "
            "UNION SELECT a, a FROM p UNION SELECT b, b FROM p), "
            "reach AS (SELECT a, b FROM e "
            "UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a), "
            "cl AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach "
            "GROUP BY a), "
            "drops AS (SELECT doc_id FROM cl WHERE doc_id != rep_id) "
            "SELECT q.doc_id FROM q "
            "WHERE q.doc_id IN (SELECT doc_id FROM ex) "
            "AND q.doc_id NOT IN (SELECT doc_id FROM drops) "
            "ORDER BY q.doc_id"
        ),
        "embedding_neardup": (
            "SELECT a.vec_id AS a, b.vec_id AS b, "
            "CAST(floor(list_cosine_similarity("
            "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) "
            "* 1000000.0) AS BIGINT) AS sim_e6 "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.95 ORDER BY a, b"
        ),
        "exact_dedup": (
            "SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY md5(text) ORDER BY doc_id"
        ),
        "fingerprint": (
            "SELECT doc_id, md5(text) AS content_hash, "
            "md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint "
            "FROM documents ORDER BY doc_id"
        ),
        "token_stats": (
            f"SELECT doc_id, len({_TOKS}) AS n_tokens, "
            f"len(list_filter({_TOKS}, x -> list_contains({_STOP_SQL}, x))) AS n_stop, "
            f"CAST(coalesce(list_sum(list_transform({_TOKS}, x -> length(x))), 0) AS BIGINT) AS tok_chars "
            "FROM documents ORDER BY doc_id"
        ),
        "repetition": (
            "WITH w AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS words "
            "FROM documents), "
            "wc AS (SELECT doc_id, unnest(words) AS word FROM w), "
            "cnt AS (SELECT doc_id, word, count(*) AS c FROM wc "
            "GROUP BY 1, 2), "
            "top AS (SELECT doc_id, max(c) AS top_c, count(*) AS distinct_w, "
            "CAST(sum(c) AS BIGINT) AS n_words FROM cnt GROUP BY 1), "
            "bg AS (SELECT doc_id, unnest(list_transform("
            "range(1, len(words)), i -> words[i] || ' ' || words[i+1])) "
            "AS bigram FROM w), "
            "bcnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg "
            "GROUP BY 1, 2), "
            "btop AS (SELECT doc_id, max(c) AS top_b FROM bcnt GROUP BY 1) "
            "SELECT t.doc_id, t.n_words, "
            "(t.n_words - t.distinct_w) * 1000000 // t.n_words "
            "AS dup_word_ppm, "
            "t.top_c * 1000000 // t.n_words AS top_word_ppm, "
            "coalesce(b.top_b, 0) * 1000000 // greatest(t.n_words - 1, 1) "
            "AS top_bigram_ppm "
            "FROM top t LEFT JOIN btop b USING (doc_id) ORDER BY t.doc_id"
        ),
        "line_dedup": (
            # 'lines' = fixed 3-word runs (single-line synthetic corpus);
            # a line is common when >= 2 distinct docs contain it
            "WITH w AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS words "
            "FROM documents), "
            "l AS (SELECT doc_id, i AS line_idx, "
            "array_to_string(words[(i*3+1):(i*3+3)], ' ') AS line "
            "FROM w, UNNEST(range(0, (len(words) + 2) // 3)) t(i)), "
            "common AS (SELECT line FROM l GROUP BY line "
            "HAVING count(DISTINCT doc_id) >= 2), "
            "agg AS (SELECT doc_id, count(*)::BIGINT AS n_lines, "
            "sum(CASE WHEN line IN (SELECT line FROM common) "
            "THEN 1 ELSE 0 END)::BIGINT AS n_removed, "
            "array_to_string(list(line ORDER BY line_idx) "
            "FILTER (WHERE line NOT IN (SELECT line FROM common)), ' ') "
            "AS text_clean FROM l GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(a.n_lines, 0) AS n_lines, "
            "coalesce(a.n_removed, 0) AS n_removed, "
            "coalesce(a.text_clean, '') AS text_clean "
            "FROM documents d LEFT JOIN agg a USING (doc_id) "
            "ORDER BY d.doc_id"
        ),
        "substring_dup": (
            # per-doc duplicated k-gram windows (k=5): a window is
            # duplicated when its exact gram occurs in >= 2 distinct docs
            "WITH t AS (SELECT doc_id, "
            f"{_TOKS} AS toks FROM documents), "
            "g0 AS (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 4)) AS i FROM t), "
            "g AS (SELECT doc_id, "
            "array_to_string(toks[i:i+4], ' ') AS gram FROM g0), "
            "common AS (SELECT gram FROM g GROUP BY gram "
            "HAVING count(DISTINCT doc_id) >= 2), "
            "dup AS (SELECT doc_id, count(*)::BIGINT AS dup_windows "
            "FROM g WHERE gram IN (SELECT gram FROM common) "
            "GROUP BY doc_id) "
            "SELECT t.doc_id, "
            "GREATEST(len(t.toks) - 4, 0)::BIGINT AS n_windows, "
            "coalesce(dup.dup_windows, 0)::BIGINT AS dup_windows "
            "FROM t LEFT JOIN dup USING (doc_id) ORDER BY t.doc_id"
        ),
        "incremental_dedup": (
            # even-doc_id half = the persisted index, odd half = the
            # incoming batch; admit first-per-hash unseen content
            "WITH idx AS (SELECT md5(text) AS h FROM documents "
            "WHERE CAST(doc_id AS BIGINT) % 2 = 0), "
            "nw AS (SELECT doc_id, md5(text) AS h FROM documents "
            "WHERE CAST(doc_id AS BIGINT) % 2 = 1) "
            "SELECT min(doc_id) AS doc_id, h FROM nw "
            "WHERE h NOT IN (SELECT h FROM idx) "
            "GROUP BY h ORDER BY doc_id"
        ),
        "substring_dedup_removal": (
            # every token covered by a cross-doc duplicated 5-gram is
            # dropped; overlapping windows merge via DISTINCT positions
            "WITH t AS MATERIALIZED (SELECT doc_id, "
            f"{_TOKS} AS toks FROM documents), "
            "g0 AS (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 4)) AS i FROM t), "
            "g AS MATERIALIZED (SELECT doc_id, i, "
            "array_to_string(toks[i:i+4], ' ') AS gram FROM g0), "
            "common AS (SELECT gram FROM g GROUP BY gram "
            "HAVING count(DISTINCT doc_id) >= 2), "
            "covered AS (SELECT DISTINCT doc_id, p FROM ("
            "SELECT d.doc_id, unnest(generate_series(d.i, d.i + 4)) AS p "
            "FROM g d WHERE d.gram IN (SELECT gram FROM common))), "
            "pos AS (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks))) AS p FROM t), "
            "kept AS (SELECT pos.doc_id, pos.p, pos.toks[pos.p] AS tok "
            "FROM pos LEFT JOIN covered c "
            "ON pos.doc_id = c.doc_id AND pos.p = c.p WHERE c.p IS NULL), "
            "recon AS (SELECT doc_id, count(*)::BIGINT AS n_kept, "
            "string_agg(tok, ' ' ORDER BY p) AS text_clean "
            "FROM kept GROUP BY doc_id) "
            "SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens, "
            "(len(t.toks) - coalesce(recon.n_kept, 0))::BIGINT "
            "AS n_removed, coalesce(recon.text_clean, '') AS text_clean "
            "FROM t LEFT JOIN recon USING (doc_id) ORDER BY t.doc_id"
        ),
        "curated_corpus": (
            # full curation recipe end to end: quality gate → bigram-LM
            # gate (model trained on the kept subset, floor-ppm mean
            # >= 33000) → exact dedup (min doc_id per md5) → per-source
            # bottom-quota mixture cut
            "WITH t AS (SELECT doc_id, source, text, "
            f"{_TOKS} AS toks FROM documents), "
            "q AS (SELECT * FROM t WHERE len(toks) BETWEEN 5 AND 100000 "
            f"AND floor(len(list_filter(toks, x -> list_contains("
            f"{_STOP_SQL}, x))) * 1000000.0 "
            "/ greatest(len(toks), 1)) >= 10000), "
            # pruned LM (mirror of lm_train): count >= 2, then top-K
            # by (count desc, gram asc); unseen grams contribute 0
            "uc AS (SELECT w, c FROM (SELECT w, count(*)::BIGINT AS c "
            "FROM (SELECT unnest(toks) AS w FROM q) GROUP BY w) "
            "WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w) <= 262144), "
            "b0 AS (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 1)) AS i FROM q), "
            "b AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 "
            "FROM b0), "
            "bc AS (SELECT w1, w2, c FROM (SELECT w1, w2, "
            "count(*)::BIGINT AS c FROM b GROUP BY w1, w2) "
            "WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w1, w2) <= 1048576), "
            "s AS (SELECT b.doc_id, count(*)::BIGINT AS nb, "
            "CAST(sum(CASE WHEN bc.c IS NOT NULL AND uc.c IS NOT NULL "
            "THEN bc.c * 1000000 // uc.c ELSE 0 END) AS BIGINT) AS ss "
            "FROM b LEFT JOIN bc USING (w1, w2) "
            "LEFT JOIN uc ON uc.w = b.w1 "
            "GROUP BY b.doc_id), "
            "l AS (SELECT q.* FROM q JOIN s USING (doc_id) "
            "WHERE s.nb > 0 AND s.ss // s.nb >= 33000), "
            "e AS (SELECT min(doc_id) AS doc_id FROM l "
            "GROUP BY md5(text)), "
            "le AS (SELECT l.doc_id, l.source FROM l JOIN e "
            "USING (doc_id)) "
            "SELECT doc_id, source, "
            "md5(CAST(doc_id AS VARCHAR)) AS h FROM le "
            "WHERE source IN ('src0','src1','src2','src3','src4') "
            "QUALIFY row_number() OVER (PARTITION BY source "
            "ORDER BY h) <= CASE source WHEN 'src0' THEN 10 "
            "WHEN 'src1' THEN 5 WHEN 'src2' THEN 5 ELSE 2 END "
            "ORDER BY source, h"
        ),
        "mixture_sample": (
            # domain-mixture sampling: per-source bottom-quota by
            # md5(doc_id) — deterministic dataset balancing
            "SELECT doc_id, source, "
            "md5(CAST(doc_id AS VARCHAR)) AS h FROM documents "
            "WHERE source IN ('src0','src1','src2','src3','src4') "
            "QUALIFY row_number() OVER (PARTITION BY source "
            "ORDER BY h) <= CASE source WHEN 'src0' THEN 10 "
            "WHEN 'src1' THEN 5 WHEN 'src2' THEN 5 ELSE 2 END "
            "ORDER BY source, h"
        ),
        "sample_bottomk": (
            # deterministic uniform sample: k smallest md5(doc_id) —
            # content-free, stable across partitioning, SQL-recomputable
            "SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h "
            "FROM documents ORDER BY h LIMIT 100"
        ),
        "source_quality_report": (
            # per-source corpus health: docs, quality keep-rate (floor
            # ppm), token volume, distinct-content pressure
            "WITH t AS (SELECT doc_id, source, text, "
            f"{_TOKS} AS toks FROM documents), "
            "q AS (SELECT source, len(toks) AS n_tokens, "
            "(len(toks) BETWEEN 5 AND 100000 AND "
            f"floor(len(list_filter(toks, x -> list_contains("
            f"{_STOP_SQL}, x))) * 1000000.0 "
            "/ greatest(len(toks), 1)) >= 10000) AS keep, "
            "md5(text) AS h FROM t) "
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_kept, "
            "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) "
            "* 1000000 // count(*) AS kept_ppm, "
            "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens, "
            "count(DISTINCT h)::BIGINT AS n_distinct "
            "FROM q GROUP BY source ORDER BY source"
        ),
        "lm_score": (
            # corpus-trained bigram LM quality score: per-bigram
            # 1e6*c(w1,w2)//c(w1) (floor — int arithmetic both sides),
            # per-doc sum + floor mean
            "WITH t AS (SELECT doc_id, "
            f"{_TOKS} AS toks FROM documents), "
            # pruned LM (mirror of lm_train): count >= 2, then top-K
            # by (count desc, gram asc); unseen grams contribute 0
            "uc AS (SELECT w, c FROM (SELECT w, count(*)::BIGINT AS c "
            "FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w) "
            "WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w) <= 262144), "
            "b0 AS (SELECT doc_id, toks, "
            "unnest(generate_series(1, len(toks) - 1)) AS i FROM t), "
            "b AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 "
            "FROM b0), "
            "bc AS (SELECT w1, w2, c FROM (SELECT w1, w2, "
            "count(*)::BIGINT AS c FROM b GROUP BY w1, w2) "
            "WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w1, w2) <= 1048576), "
            "s AS (SELECT b.doc_id, count(*)::BIGINT AS n_bigrams, "
            "CAST(sum(CASE WHEN bc.c IS NOT NULL AND uc.c IS NOT NULL "
            "THEN bc.c * 1000000 // uc.c ELSE 0 END) AS BIGINT) "
            "AS sum_score "
            "FROM b LEFT JOIN bc USING (w1, w2) "
            "LEFT JOIN uc ON uc.w = b.w1 "
            "GROUP BY b.doc_id) "
            "SELECT t.doc_id, "
            "coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams, "
            "coalesce(s.sum_score, 0)::BIGINT AS sum_score, "
            "CAST(CASE WHEN coalesce(s.n_bigrams, 0) > 0 "
            "THEN s.sum_score // s.n_bigrams ELSE 0 END AS BIGINT) "
            "AS avg_score "
            "FROM t LEFT JOIN s USING (doc_id) ORDER BY t.doc_id"
        ),
        "dsir_weights": (
            # DSIR-style importance weight: target-model (lang='en')
            # bigram sum-score minus source-model (all docs) sum-score;
            # each model pruned exactly like lm_train (count >= 2 then
            # top-K by count desc / gram asc); all integer arithmetic
            "WITH t AS (SELECT doc_id, lang, "
            f"{_TOKS} AS toks FROM documents), "
            "b0 AS (SELECT doc_id, lang, toks, "
            "unnest(generate_series(1, len(toks) - 1)) AS i FROM t), "
            "b AS (SELECT doc_id, lang, toks[i] AS w1, toks[i+1] AS w2 "
            "FROM b0), "
            "uc_s AS (SELECT w, c FROM (SELECT w, count(*)::BIGINT AS c "
            "FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w) "
            "WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w) <= 262144), "
            "bc_s AS (SELECT w1, w2, c FROM (SELECT w1, w2, "
            "count(*)::BIGINT AS c FROM b GROUP BY w1, w2) "
            "WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w1, w2) <= 1048576), "
            "uc_t AS (SELECT w, c FROM (SELECT w, count(*)::BIGINT AS c "
            "FROM (SELECT unnest(toks) AS w FROM t WHERE lang = 'en') "
            "GROUP BY w) WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w) <= 262144), "
            "bc_t AS (SELECT w1, w2, c FROM (SELECT w1, w2, "
            "count(*)::BIGINT AS c FROM b WHERE lang = 'en' "
            "GROUP BY w1, w2) WHERE c >= 2 QUALIFY row_number() OVER "
            "(ORDER BY c DESC, w1, w2) <= 1048576), "
            "s AS (SELECT b.doc_id, count(*)::BIGINT AS n_bigrams, "
            "CAST(sum(CASE WHEN bt.c IS NOT NULL AND ut.c IS NOT NULL "
            "THEN bt.c * 1000000 // ut.c ELSE 0 END) "
            "- sum(CASE WHEN bs.c IS NOT NULL AND us.c IS NOT NULL "
            "THEN bs.c * 1000000 // us.c ELSE 0 END) AS BIGINT) "
            "AS weight "
            "FROM b "
            "LEFT JOIN bc_t bt ON bt.w1 = b.w1 AND bt.w2 = b.w2 "
            "LEFT JOIN uc_t ut ON ut.w = b.w1 "
            "LEFT JOIN bc_s bs ON bs.w1 = b.w1 AND bs.w2 = b.w2 "
            "LEFT JOIN uc_s us ON us.w = b.w1 "
            "GROUP BY b.doc_id) "
            "SELECT t.doc_id, "
            "coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams, "
            "coalesce(s.weight, 0)::BIGINT AS weight "
            "FROM t LEFT JOIN s USING (doc_id) ORDER BY t.doc_id"
        ),
        "nb_classify": _NB_PRED_SQL + " ORDER BY doc_id",
        "classifier_eval": (
            # chain the nb_classify prediction SQL, join truth, and
            # recompute the confusion arithmetic independently
            "WITH predn AS (SELECT p.doc_id, p.pred, d.lang AS label "
            f"FROM ({_NB_PRED_SQL}) p "
            "JOIN documents d USING (doc_id)), "
            "conf AS (SELECT label, pred, count(*)::BIGINT AS n "
            "FROM predn GROUP BY 1, 2), "
            "cls AS (SELECT DISTINCT lang AS c FROM documents), "
            "per AS (SELECT cl.c AS label, "
            "coalesce(sum(CASE WHEN conf.label = cl.c "
            "AND conf.pred = cl.c THEN n END), 0)::BIGINT AS tp, "
            "coalesce(sum(CASE WHEN conf.label <> cl.c "
            "AND conf.pred = cl.c THEN n END), 0)::BIGINT AS fp, "
            "coalesce(sum(CASE WHEN conf.label = cl.c "
            "AND conf.pred <> cl.c THEN n END), 0)::BIGINT AS fn "
            "FROM cls cl LEFT JOIN conf "
            "ON (conf.label = cl.c OR conf.pred = cl.c) GROUP BY 1) "
            "SELECT label, tp, fp, fn, "
            "CASE WHEN tp + fp = 0 THEN 0 "
            "ELSE tp * 1000000 // (tp + fp) END AS precision_ppm, "
            "CASE WHEN tp + fn = 0 THEN 0 "
            "ELSE tp * 1000000 // (tp + fn) END AS recall_ppm, "
            "CASE WHEN 2 * tp + fp + fn = 0 THEN 0 "
            "ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_ppm "
            "FROM per ORDER BY label"
        ),
        "bpe_vocab": (
            # top-256 (count desc, word asc) corpus word counts — the
            # bounded cut that feeds BPE training
            "WITH tk AS (SELECT "
            f"{_TOKS} AS toks FROM documents), "
            "t AS (SELECT unnest(toks) AS word FROM tk) "
            "SELECT word, count(*)::BIGINT AS c FROM t GROUP BY word "
            "ORDER BY c DESC, word ASC LIMIT 256"
        ),
        "tfidf_topk": (
            # linear-idf TF-IDF: score = tf * N * 1e6 // df (integer
            # arithmetic both sides — no float log); ties by token asc
            "WITH tk AS (SELECT doc_id, "
            f"{_TOKS} AS toks FROM documents), "
            "t AS (SELECT doc_id, unnest(toks) AS token FROM tk), "
            "tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf "
            "FROM t GROUP BY 1, 2), "
            "df AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df "
            "FROM t GROUP BY 1), "
            "n AS (SELECT count(*)::BIGINT AS n FROM documents), "
            "s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df, "
            "tf.tf * n.n * 1000000 // df.df AS score, "
            "row_number() OVER (PARTITION BY tf.doc_id "
            "ORDER BY tf.tf * n.n * 1000000 // df.df DESC, tf.token) "
            "AS rank FROM tf JOIN df USING (token), n) "
            "SELECT doc_id, rank, token, tf, df, score FROM s "
            "WHERE rank <= 5 ORDER BY doc_id, rank"
        ),
        "quality": (
            "WITH s AS ("
            f"SELECT doc_id, len({_TOKS}) AS n_tokens, "
            f"len(list_filter({_TOKS}, x -> list_contains({_STOP_SQL}, x))) AS n_stop, "
            f"CAST(coalesce(list_sum(list_transform({_TOKS}, x -> length(x))), 0) AS BIGINT) AS tok_chars "
            "FROM documents) "
            "SELECT doc_id, n_tokens, n_stop, "
            "CAST(floor(n_stop * 1000000.0 / greatest(n_tokens, 1)) AS BIGINT) AS stop_ratio_ppm, "
            "CAST(floor(tok_chars * 1000000.0 / greatest(n_tokens, 1)) AS BIGINT) AS avg_token_len_ppm, "
            "(n_tokens >= 5 AND n_tokens <= 100000 "
            "AND floor(n_stop * 1000000.0 / greatest(n_tokens, 1)) >= 10000) AS keep "
            "FROM s ORDER BY doc_id"
        ),
        "doc_chunks": (
            "SELECT d.doc_id, r.i AS chunk_idx, "
            "substr(d.text, CAST(r.i * 200 + 1 AS BIGINT), 200) AS chunk "
            "FROM documents d JOIN (SELECT unnest(range(0, 2000)) AS i) r "
            "ON r.i * 200 < greatest(length(d.text), 1) "
            "ORDER BY doc_id, chunk_idx"
        ),
        "ann_topk": (
            # x1000-quantized vectors → exact integer dots/norms →
            # floor(dot/sqrt(na*nb)*1e6): three correctly-rounded IEEE
            # ops, bit-identical to numpy (list_cosine_similarity's
            # float summation order diverged by one ulp at sf0.1)
            "WITH q AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),"
            " x -> floor(x * 1000.0 + 0.5)) AS qv "
            "FROM embeddings WHERE vec_id = 0), "
            "ev AS (SELECT vec_id, list_transform("
            "CAST(embedding AS DOUBLE[]), x -> floor(x * 1000.0 + 0.5)) "
            "AS v FROM embeddings), "
            "s AS (SELECT ev.vec_id, "
            "list_dot_product(ev.v, q.qv) AS dot, "
            "list_dot_product(ev.v, ev.v) AS na, "
            "list_dot_product(q.qv, q.qv) AS nb FROM ev, q) "
            "SELECT vec_id, CAST(CASE WHEN na * nb = 0 "
            "THEN -1000000000 "
            "ELSE floor(dot / sqrt(na * nb) * 1000000.0) END AS BIGINT) "
            "AS sim_e6 FROM s ORDER BY sim_e6 DESC, vec_id LIMIT 10"
        ),
        "embedding_norms": (
            "SELECT label, count(*) AS n, "
            "CAST(floor(sum(sqrt(list_sum(list_transform("
            "CAST(embedding AS DOUBLE[]), x -> x * x)))) / count(*) * 10000.0) AS BIGINT) AS avg_norm_e4 "
            "FROM embeddings GROUP BY label ORDER BY label"
        ),
        "q1_lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(round(sum(l_quantity) * 100.0, 0) AS BIGINT) AS sum_qty_x100, "
            "CAST(round(sum(l_extendedprice) * 100.0, 0) AS BIGINT) AS sum_price_x100, "
            "CAST(round(sum(l_discount) * 100.0, 0) AS BIGINT) AS sum_disc_x100, "
            "count(*) AS n_rows "
            "FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01' "
            "GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "order_priority_revenue": (
            # per-row x10000 quantization INSIDE the sum (integer sums
            # thereafter) — round-after-float-sum diverged at sf0.1
            "SELECT o_orderpriority, "
            "SUM(CAST(round(l_extendedprice * (1 - l_discount) "
            "* 10000.0, 0) AS BIGINT))::BIGINT AS revenue_x10000, "
            "count(*) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "mktsegment_order_stats": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "CAST(round(sum(o_totalprice) * 100.0, 0) AS BIGINT) AS sum_price_x100 "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "topk_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "topk_orders_per_group": (
            "SELECT o_orderpriority, o_orderkey, price_x100 FROM ("
            "SELECT o_orderpriority, o_orderkey, "
            "CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS price_x100, "
            "row_number() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
            "WHERE rn <= 3 ORDER BY o_orderpriority, o_orderkey"
        ),
        "anti_join_customers": (
            "SELECT c_mktsegment, count(*) AS n_customers FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderpriority = '1-URGENT') "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "rollup_revenue": (
            "SELECT COALESCE(o_year, -1) AS o_year, "
            "COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "count(*) AS n_orders, "
            "CAST(round(sum(o_totalprice) * 100.0, 0) AS BIGINT) "
            "AS sum_price_x100 "
            "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "o_orderpriority, o_totalprice FROM orders) "
            "GROUP BY ROLLUP (o_year, o_orderpriority) "
            "ORDER BY o_year, o_orderpriority"
        ),
        "cube_revenue": (
            "SELECT COALESCE(o_year, -1) AS o_year, "
            "COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, "
            "count(*) AS n_orders, "
            "CAST(round(sum(o_totalprice) * 100.0, 0) AS BIGINT) "
            "AS sum_price_x100 "
            "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "o_orderpriority, o_totalprice FROM orders) "
            "GROUP BY CUBE (o_year, o_orderpriority) "
            "ORDER BY o_year, o_orderpriority"
        ),
        "pack_sequences": (
            # concat-and-chunk sequence packing: global token stream in
            # doc_id order cut into 2048-token bins (integer window fn)
            "WITH t AS (SELECT doc_id, "
            "len(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS n_tokens FROM documents), "
            "c AS (SELECT doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) "
            "OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 PRECEDING), 0) AS BIGINT) AS s FROM t) "
            "SELECT doc_id, n_tokens, s // 2048 AS bin_id, "
            "s % 2048 AS bin_offset FROM c ORDER BY doc_id"
        ),
        "intersect_users": (
            "SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'click' "
            "INTERSECT SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'purchase' ORDER BY user_id"
        ),
        "except_users": (
            # high-value threshold on side B keeps the difference
            # non-empty (every user eventually hits every plain type)
            "SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'click' "
            "EXCEPT SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'purchase' AND value > 99 "
            "ORDER BY user_id"
        ),
        "funnel_counts": (
            # chained min-ts self-joins: each step is the first event of
            # its type STRICTLY after the previous step's time
            "WITH v AS (SELECT user_id, min(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "c AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN v ON e.user_id = v.user_id AND e.ts > v.t "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "p AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "JOIN c ON e.user_id = c.user_id AND e.ts > c.t "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT * FROM (VALUES "
            "(1::BIGINT, 'view', (SELECT count(*)::BIGINT FROM v)), "
            "(2::BIGINT, 'click', (SELECT count(*)::BIGINT FROM c)), "
            "(3::BIGINT, 'purchase', (SELECT count(*)::BIGINT FROM p))"
            ") AS t(step, event_type, n_users) ORDER BY step"
        ),
        "user_running_value": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS running_x100 FROM events ORDER BY event_id"
        ),
        "event_rank_windows": (
            "WITH b AS (SELECT event_id, user_id, ts, "
            "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents "
            "FROM events), "
            "r AS (SELECT event_id, user_id, ts, cents, "
            "rank() OVER (PARTITION BY user_id ORDER BY cents) AS rnk, "
            "COUNT(*) OVER (PARTITION BY user_id) AS cnt FROM b) "
            "SELECT event_id, user_id, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS row_num, "
            "dense_rank() OVER (PARTITION BY user_id ORDER BY cents) "
            "AS dense_rank_cents, "
            "ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS ntile4, "
            "CASE WHEN cnt = 1 THEN 0 "
            "ELSE ((rnk - 1) * 1000000) // (cnt - 1) END AS pct_rank_ppm "
            "FROM r ORDER BY event_id"
        ),
        "c4_filters": (
            # derivation mirrors _c4_filters.derive, then the signal
            # arithmetic mirrors stages/text_quality.c4_signals_batch
            "WITH base AS (SELECT doc_id, array_to_string("
            "regexp_extract_all(lower(text), '[a-z0-9]+'), ' ') AS norm "
            "FROM documents), "
            "d1 AS (SELECT doc_id, regexp_replace(norm, "
            "'((?:\\S+ ){5}\\S+) ', '\\1' || chr(10), 'g') AS s FROM base), "
            "d2 AS (SELECT doc_id, regexp_replace(s, "
            "'([aeiou])(' || chr(10) || '|$)', '\\1.\\2', 'g') AS s FROM d1), "
            "doc AS (SELECT doc_id, s || "
            "CASE WHEN doc_id % 31 = 0 THEN chr(10) || 'lorem ipsum dolor' "
            "ELSE '' END || "
            "CASE WHEN doc_id % 29 = 0 THEN chr(10) || 'function() { var x; }' "
            "ELSE '' END AS s FROM d2), "
            "sig AS (SELECT doc_id, s, string_split(s, chr(10)) AS ls, "
            "len(regexp_extract_all(lower(s), '[a-z0-9]+'))::BIGINT AS nw "
            "FROM doc) "
            "SELECT doc_id, len(ls)::BIGINT AS n_lines, "
            "len(list_filter(ls, x -> regexp_matches(x, '[.!?\"]$')))::BIGINT "
            "AS term_lines, "
            "len(list_filter(ls, x -> len(regexp_extract_all(lower(x), "
            "'[a-z0-9]+')) < 5))::BIGINT AS short_lines, "
            "nw AS n_words, "
            "CAST(contains(lower(s), 'lorem ipsum') AS BIGINT) AS has_lorem, "
            "CAST(contains(s, '{') AS BIGINT) AS has_brace, "
            "CAST(NOT contains(lower(s), 'lorem ipsum') "
            "AND NOT contains(s, '{') AND nw >= 30 "
            "AND 3 * len(list_filter(ls, x -> regexp_matches(x, "
            "'[.!?\"]$'))) >= len(ls) AS BIGINT) AS keep "
            "FROM sig ORDER BY doc_id"
        ),
        "phrase_detect": (
            # word2vec phrase score in the same floor-integer arithmetic
            # as stages/text_quality.phrase_detect
            "WITH tok AS (SELECT regexp_extract_all(lower(text), "
            "'[a-z0-9]+') AS toks FROM documents), "
            "n AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n FROM tok), "
            "uni AS (SELECT w, count(*)::BIGINT AS c FROM "
            "(SELECT unnest(toks) AS w FROM tok) GROUP BY w), "
            "bi AS (SELECT g, count(*)::BIGINT AS c FROM "
            "(SELECT unnest(list_transform(generate_series(1, "
            "len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])) AS g "
            "FROM tok WHERE len(toks) >= 2) GROUP BY g) "
            "SELECT g AS phrase, bi.c AS pair_count, "
            "((bi.c - 1) * n.n * 1000) // (ua.c * ub.c) AS score_x1000, "
            "CAST(((bi.c - 1) * n.n * 1000) // (ua.c * ub.c) >= 2000 "
            "AS BIGINT) AS is_phrase "
            "FROM bi "
            "JOIN uni ua ON ua.w = split_part(g, ' ', 1) "
            "JOIN uni ub ON ub.w = split_part(g, ' ', 2) CROSS JOIN n "
            "WHERE bi.c >= 5 ORDER BY phrase"
        ),
        "events_hourly": (
            "SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket, "
            "count(*) AS n_events, "
            "CAST(round(sum(value) * 100.0, 0) AS BIGINT) AS sum_value_x100 "
            "FROM events GROUP BY event_type, hour_bucket "
            "ORDER BY event_type, hour_bucket"
        ),
        "distinct_event_types": (
            "SELECT DISTINCT event_type FROM events ORDER BY event_type"
        ),
        "docs_by_lang_source": (
            "SELECT lang, source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents "
            "GROUP BY lang, source ORDER BY lang, source"
        ),
        "sessionize": (
            "WITH g AS (SELECT user_id, ts, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts FROM events) "
            "SELECT user_id, count(*) AS n_events, "
            "CAST(1 + sum(CASE WHEN pts IS NOT NULL "
            "AND epoch(ts) - epoch(pts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions "
            "FROM g GROUP BY user_id ORDER BY user_id"
        ),
        "asof_join": (
            # orders deduped to one per (custkey, date), highest orderkey —
            # as-of tie order among equal dates is engine-defined otherwise
            "WITH o2 AS (SELECT * FROM ("
            "SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey, o_orderdate "
            "ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1) "
            "SELECT e.event_type, count(*) AS n_matched, "
            "CAST(round(sum(o2.o_totalprice) * 100.0, 0) AS BIGINT) AS sum_price_x100 "
            "FROM events e ASOF JOIN o2 "
            "ON e.user_id = o2.o_custkey AND e.ts >= o2.o_orderdate "
            "GROUP BY e.event_type ORDER BY e.event_type"
        ),
    }
