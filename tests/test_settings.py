"""Settings surface tests: per-format options table + env overrides
(reference §2.9 format_options + settings.py env prefix)."""

import pytest

from docling_ray import settings


@pytest.fixture(autouse=True)
def _reset_settings(monkeypatch):
    settings.reset()
    yield
    settings.reset()


def test_defaults_and_programmatic_override():
    assert settings.options_for("html")["link_density_max"] == 0.65
    settings.configure("html", link_density_max=0.5, min_links=2)
    opts = settings.options_for("html")
    assert opts["link_density_max"] == 0.5 and opts["min_links"] == 2
    settings.reset()
    assert settings.options_for("html")["link_density_max"] == 0.65


def test_env_override_with_coercion(monkeypatch):
    monkeypatch.setenv("DOCLING_RAY_HTML__MIN_LINKS", "7")
    monkeypatch.setenv("DOCLING_RAY_HTML__STRIP_BOILERPLATE", "false")
    monkeypatch.setenv("DOCLING_RAY_EBCDIC__CODEPAGE", "cp500")
    settings.reset()
    html = settings.options_for("html")
    assert html["min_links"] == 7 and html["strip_boilerplate"] is False
    assert settings.options_for("ebcdic")["codepage"] == "cp500"


def test_html_extractor_respects_configuration():
    from docling_ray.stages.html_extract import extract_html

    nav = ('<html><body><nav><a href="/a">a</a><a href="/b">b</a>'
           '<a href="/c">c</a></nav><p>real body text here</p>'
           "</body></html>")
    assert all("a" != s[1] for s in extract_html(nav))  # nav stripped
    settings.configure("html", strip_boilerplate=False)
    spans = extract_html(nav)
    joined = " ".join(s[1] for s in spans)
    assert "abc" in joined  # boilerplate kept when configured off


def test_ebcdic_codepage_option():
    from docling_ray.stages.formats import extract_ebcdic

    text = "HELLO RECORDS"
    raw = text.encode("cp500").decode("latin-1")
    # cp037 and cp500 differ in a few codepoints but share letters — use a
    # record that includes cp500-specific punctuation to tell them apart
    raw2 = "WAIT[BRACKET]".encode("cp500").decode("latin-1")
    settings.configure("ebcdic", codepage="cp500")
    spans = extract_ebcdic(raw2)
    assert spans and "[BRACKET]" in spans[0][1]


def test_auto_sniff_gate():
    from docling_ray.stages.assemble import extract_unit

    spans, _, _, err = extract_unit("", "# Title\n\nbody", "")
    assert any(s[0] == "title" for s in spans)
    settings.configure("detect", auto_sniff=False)
    spans, _, _, err = extract_unit("", "# Title\n\nbody", "")
    assert spans == [] and "unknown input span kind" in (err or "")


def test_configure_reaches_ray_workers(ray_session):
    """Driver-side configure() must affect DISTRIBUTED extraction: the
    pipeline ships settings.snapshot() through the batch-fn closure, so
    worker processes (which never saw the driver's configure call) resolve
    the override. Uses detect.auto_sniff: an unlabeled html payload is
    sniffed+extracted by default, and must fail when sniffing is off."""
    import pyarrow as pa
    import ray

    from docling_ray.pipelines.extract import extract_corpus

    corpus = pa.table({
        "doc_id": ["u1"],
        "spans": [[{"kind": "", "text": "<html><body><h1>T</h1>"
                    "<p>body text</p></body></html>",
                    "media_ref": "", "offset": 0}]],
    })
    by_default = extract_corpus(ray.data.from_arrow(corpus)).to_pandas()
    assert by_default["status"][0] == "success"
    settings.configure("detect", auto_sniff=False)
    sniff_off = extract_corpus(ray.data.from_arrow(corpus)).to_pandas()
    assert sniff_off["status"][0] == "failure"


def test_image_and_chunker_options():
    import base64

    from docling_ray.stages.image_codec import extract_image_unit

    settings.reset()
    # shrink the pixel ceiling: a legal 8x8 PNG must now fail cleanly
    import random

    from docling_ray.synth import build_image_doc

    b64, _exp, _ = build_image_doc(random.Random(3), "opt-img")
    ok_spans, _, _, err = extract_image_unit(b64)
    assert err is None and ok_spans
    settings.configure("image", max_pixels=4)
    spans, _, _, err = extract_image_unit(b64)
    assert spans == [] and ("dimensions" in (err or "")
                           or "max_pixels" in (err or ""))
    settings.reset()

    import pyarrow as pa

    from docling_ray.stages.chunker import chunk_docs_batch

    rows = pa.table({
        "doc_id": ["d"],
        "spans": [[{"kind": "title", "text": "T", "media_ref": "",
                    "offset": 0},
                   {"kind": "text", "text": "one two", "media_ref": "",
                    "offset": 1},
                   {"kind": "text", "text": "three four", "media_ref": "",
                    "offset": 2}]],
    })
    merged = chunk_docs_batch(rows)
    settings.configure("chunker", merge_peers=False)
    unmerged = chunk_docs_batch(rows)
    settings.reset()
    assert merged.num_rows == 1 and unmerged.num_rows == 2


def test_document_timeout_partial_success():
    """A tiny document_timeout lets the first unit through, skips the
    rest as timeout errors, and surfaces the doc as partial_success —
    reference document_timeout parity (standard_pdf_pipeline.py:886-963)."""
    from docling_ray import settings
    from docling_ray.stages.assemble import extract_document

    spans = [{"kind": "text", "text": f"unit {i}", "media_ref": "",
              "offset": i} for i in range(4)]
    try:
        settings.configure("extract", document_timeout=1e-9)
        out = extract_document(spans)
        assert out["status"] == "partial_success"
        assert any("timeout" in e for e in out["errors"])
        assert 1 <= out["n_spans"] < 4
    finally:
        settings.reset()
    out = extract_document(spans)  # timeout off: all units extracted
    assert out["status"] == "success" and out["n_spans"] == 4


def test_document_limits_fail_at_intake(ray_session):
    """DocumentLimits parity (reference settings.py:23-26): over-limit
    docs become one failure row before extraction, on BOTH physical
    plans."""
    import ray

    from docling_ray import settings
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.synth import make_corpus

    inp, exp = make_corpus(40, seed=55)
    try:
        settings.configure("extract", max_num_pages=2)
        for mode in ("fast", "explode"):
            out = extract_corpus(
                ray.data.from_arrow(inp), mode=mode).to_pandas()
            big = {r["doc_id"] for r in inp.to_pylist()
                   if len(r["spans"]) > 2}
            assert big, "corpus should contain multi-unit docs"
            got = out.set_index("doc_id")
            for d in big:
                assert got.loc[d, "status"] == "failure", (mode, d)
                assert any("max_num_pages" in e
                           for e in got.loc[d, "errors"]), (mode, d)
            small_ok = [d for d in got.index if d not in big]
            assert all(got.loc[d, "status"] != "failure" or
                       len(got.loc[d, "errors"]) > 0 for d in small_ok)
        settings.reset()
        settings.configure("extract", max_file_size=1)
        out = extract_corpus(ray.data.from_arrow(inp)).to_pandas()
        assert (out["status"] == "failure").all()
        assert out["errors"].map(
            lambda es: any("max_file_size" in e for e in es)).all()
    finally:
        settings.reset()


def test_profile_emits_timing_column(ray_session):
    """extract.profile=True adds an extract_ms column on both plans
    (TimeRecorder parity, docling/utils/profiling.py); off by default."""
    import ray

    from docling_ray import settings
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.synth import make_corpus

    inp, _ = make_corpus(20, seed=66)
    out = extract_corpus(ray.data.from_arrow(inp)).to_pandas()
    assert "extract_ms" not in out.columns
    try:
        settings.configure("extract", profile=True)
        for mode in ("fast", "explode"):
            out = extract_corpus(
                ray.data.from_arrow(inp), mode=mode).to_pandas()
            assert "extract_ms" in out.columns, mode
            assert (out["extract_ms"] >= 0).all()
            assert out["extract_ms"].sum() > 0
    finally:
        settings.reset()
