"""Generator ↔ engine round-trip: span-sequence equality
(kind, text, media_ref, order) over the synthetic conformance corpus —
the analogue of the reference's golden-fixture verification
(tests/verify_utils.py:221-346). Pure in-process (no Ray) so failures
localize; the Ray-pipeline version lives in test_pipeline.py."""

from docling_ray.stages.assemble import extract_document
from docling_ray.synth import make_corpus


def _check(inp, exp):
    mismatches = []
    for i in range(inp.num_rows):
        row = inp.slice(i, 1).to_pylist()[0]
        erow = exp.slice(i, 1).to_pylist()[0]
        out = extract_document(row["spans"])
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in out["spans"]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in erow["spans"]]
        if got != want or out["status"] != erow["status"]:
            mismatches.append(row["doc_id"])
    return mismatches


def test_roundtrip_200_docs_seed_42():
    inp, exp = make_corpus(200, seed=42, heavy_tail=False)
    assert _check(inp, exp) == []


def test_roundtrip_alt_seed():
    inp, exp = make_corpus(100, seed=1337, heavy_tail=False)
    assert _check(inp, exp) == []


def test_statuses_present():
    # the corpus must actually exercise partial_success (garbage pages)
    _, exp = make_corpus(300, seed=42, heavy_tail=False)
    statuses = set(exp["status"].to_pylist())
    assert "success" in statuses and "partial_success" in statuses


def test_determinism():
    a, _ = make_corpus(20, seed=9)
    b, _ = make_corpus(20, seed=9)
    assert a.equals(b)
