"""Training-data hygiene operators: PII scrubbing and benchmark
contamination detection.

Neither exists in the reference (its scope ends at extraction) — these
are the LLM-data-pipeline operators a 100 TB training corpus needs
between extraction and training, built Ray-Data-first:

* **PII scrub** — stateless vectorized ``map_batches``: RE2-compatible
  patterns (email / IPv4) so the DuckDB oracle can run the *same*
  regexes via ``regexp_replace``; redaction plus per-kind counts.
* **Contamination check** — flag corpus documents sharing any word
  n-gram with a benchmark set: the benchmark side is small by nature
  (eval suites), so its gram set is collected once, ``ray.put`` once
  as an exact string set and read by every task (broadcast semi-join —
  never a shuffle of the corpus side; exact strings, not hashes, so
  the operator equals the SQL string-equality join bit for bit). Word
  splitting is plain ``lower().split(' ')`` so the SQL oracle's
  ``string_split`` builds byte-identical grams.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# RE2-safe (no backreferences/lookaround): these exact strings are also
# interpolated into the DuckDB oracle, so both engines run one source
# of truth. \b and {m,n} are supported by both re and RE2.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_EMAIL_RE = re.compile(EMAIL_PATTERN)
_IPV4_RE = re.compile(IPV4_PATTERN)


def scrub_text(text: str) -> tuple[str, int, int]:
    """One document → (redacted text, n_emails, n_ips). Emails first so
    an address's dotted domain can never be half-eaten by the IP pass."""
    red, n_email = _EMAIL_RE.subn("[EMAIL]", text)
    red, n_ip = _IPV4_RE.subn("[IP]", red)
    return red, n_email, n_ip


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text) → (doc_id, text_redacted, n_emails, n_ips)."""
    texts = batch[text_col].to_pylist()
    reds, ne, ni = [], np.empty(len(texts), np.int64), np.empty(
        len(texts), np.int64)
    for i, t in enumerate(texts):
        r, a, b = scrub_text(t or "")
        reds.append(r)
        ne[i] = a
        ni[i] = b
    return pa.table({
        "doc_id": batch["doc_id"],
        "text_redacted": pa.array(reds, pa.string()),
        "n_emails": pa.array(ne),
        "n_ips": pa.array(ni),
    })


# ---------------------------------------------------------------------------
# benchmark contamination
# ---------------------------------------------------------------------------

def _doc_grams(text: str, n: int) -> list[str]:
    """The document's word n-grams (split on single spaces over
    lowercased text — the SQL-mirrorable tokenization)."""
    words = (text or "").lower().split(" ")
    return [" ".join(words[i: i + n])
            for i in range(len(words) - n + 1)]


def contamination_flags(
    ds: "ray.data.Dataset",
    benchmark_mod: int = 97,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Corpus docs sharing any ``n``-gram with the benchmark slice
    (``doc_id % benchmark_mod == 0`` stands in for a real eval suite).

    Scale shape: the benchmark side is collected ONCE (eval suites are
    MBs, not TBs), ``ray.put`` as an exact frozenset and probed per
    batch — the corpus side streams with no shuffle. Returns (doc_id,
    n_hits) for contaminated non-benchmark docs, n_hits = distinct
    shared grams."""
    import ray

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        grams: set[str] = set()
        for did, t in zip(ids, texts):
            if did % benchmark_mod == 0:
                grams.update(_doc_grams(t, n))
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    # benchmark side: tiny by construction → driver gather is bounded
    bench = ds.map_batches(bench_grams, batch_format="pyarrow")
    gram_set = frozenset(
        g for b in bench.iter_batches(batch_format="pyarrow")
        for g in b["g"].to_pylist())
    gram_ref = ray.put(gram_set)

    def probe(batch: pa.Table) -> pa.Table:
        grams = ray.get(gram_ref)  # object-store read, once per task
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        out_ids, out_hits = [], []
        for did, t in zip(ids, texts):
            if did % benchmark_mod == 0:
                continue
            hits = {g for g in _doc_grams(t, n) if g in grams}
            if hits:
                out_ids.append(did)
                out_hits.append(len(hits))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "n_hits": pa.array(out_hits, pa.int64())})

    return ds.map_batches(probe, batch_format="pyarrow")
