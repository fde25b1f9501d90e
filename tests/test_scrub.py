"""PII scrub + contamination operator tests (stages/scrub.py)."""

from __future__ import annotations

import pyarrow as pa

from docling_ray.stages.scrub import (
    _doc_grams,
    pii_scrub_batch,
    scrub_text,
)


def test_scrub_text_literals():
    red, ne, ni = scrub_text(
        "mail a.b+c@sub.domain.org or x@y.io, host 192.168.0.1 done")
    assert red == "mail [EMAIL] or [EMAIL], host [IP] done"
    assert ne == 2 and ni == 1


def test_scrub_email_before_ip_ordering():
    # an address's dotted alphabetic domain is consumed whole by the
    # email pass; a numeric quad after @ is NOT an email (the TLD must
    # be alphabetic) and its quad is legitimately an IP
    red, ne, ni = scrub_text("u@mail.example.org plain 1.2.3.4")
    assert ne == 1 and ni == 1
    assert red == "[EMAIL] plain [IP]"
    red2, ne2, ni2 = scrub_text("u@1.2.3.44")
    assert ne2 == 0 and ni2 == 1 and red2 == "u@[IP]"


def test_scrub_no_pii_is_identity():
    red, ne, ni = scrub_text("no personal data here at all")
    assert red == "no personal data here at all" and ne == 0 and ni == 0


def test_pii_scrub_batch_schema():
    out = pii_scrub_batch(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["write me: a@b.co", None],
    }))
    assert out.column_names == ["doc_id", "text_redacted", "n_emails",
                                "n_ips"]
    assert out["text_redacted"][0].as_py() == "write me: [EMAIL]"
    assert out["text_redacted"][1].as_py() == ""


def test_doc_grams_matches_sql_split_semantics():
    # split(' ') keeps empty tokens on double spaces — the exact
    # string_split(' ') behavior the SQL oracle uses
    assert _doc_grams("A b c", 2) == ["a b", "b c"]
    assert _doc_grams("a  b", 2) == ["a ", " b"]
    assert _doc_grams("one two", 3) == []


def test_contamination_flags(ray_session):
    import ray

    from docling_ray.stages.scrub import contamination_flags

    passage = "p q r s t u v w x"  # 9 words → 2 overlapping 8-grams
    rows = pa.table({
        "doc_id": pa.array([0, 1, 13, 26], pa.int64()),  # 0 = benchmark
        "text": [f"bench doc {passage}",
                 "clean document with plenty of distinct words here",
                 f"dirty copy {passage}",
                 "another clean one with no shared grams at all ok"],
    })
    out = contamination_flags(ray.data.from_arrow(rows), benchmark_mod=97) \
        .to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [13]
    assert out["n_hits"].tolist() == [2]
