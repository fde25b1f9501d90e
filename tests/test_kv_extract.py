"""Key-value / form extraction tests (DocumentExtractor analogue,
document_extractor.py:91 + html_backend.py:3827-4303 form subsystem)."""

import pyarrow as pa

from docling_ray.functions.refs import grid_media_ref
from docling_ray.stages.kv_extract import (
    apply_template,
    extract_with_template,
    kv_pairs_batch,
    mine_pairs,
)


def _spans(items):
    return [{"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(items)]


def test_mine_text_table_checkbox():
    spans = _spans([
        ("text", "Invoice Number: INV-0042", ""),
        ("text", "Total Amount: 1,234.50 USD", ""),
        ("text", "This sentence: has a colon but is way too long to look "
                 "like a form field because the key side has many words "
                 "spread out over the line", ""),
        ("table", "", grid_media_ref([["Customer", "ACME Corp"],
                                      ["Country", "Norway"]])),
        ("checkbox_selected", "", ""),
        ("text", "Express shipping", ""),
        ("checkbox_unselected", "", ""),
        ("text", "Gift wrap", ""),
    ])
    pairs = mine_pairs(spans)
    assert ("Invoice Number", "INV-0042", "text") in pairs
    assert ("Customer", "ACME Corp", "table") in pairs
    assert ("Country", "Norway", "table") in pairs
    assert ("Express shipping", "true", "checkbox") in pairs
    assert ("Gift wrap", "false", "checkbox") in pairs
    assert not any("too long" in k for k, _, _ in pairs)


def test_template_matching_and_casting():
    pairs = [("Invoice Number", "INV-0042", "text"),
             ("Total Amount", "1,234.50 USD", "text"),
             ("Express shipping", "true", "checkbox"),
             ("Item Count", "17 items", "text")]
    res = apply_template(pairs, {
        "invoice_number": "str",
        "total_amount": "float",
        "item_count": "int",
        "express_shipping": "bool",
        "missing_field": "str",
    })
    assert res == {"invoice_number": "INV-0042", "total_amount": 1234.50,
                   "item_count": 17, "express_shipping": True,
                   "missing_field": None}


def test_batch_kernel_and_dataset_api(ray_session):
    import ray

    out_rows = pa.table({
        "doc_id": pa.array(["d1", "d2"]),
        "spans": pa.array([
            _spans([("text", "Status: approved", ""),
                    ("table", "", grid_media_ref([["K", "V"]]))]),
            _spans([("text", "plain prose only", "")]),
        ]),
    })
    pairs = kv_pairs_batch(out_rows).to_pylist()
    assert [(p["doc_id"], p["key"], p["value"]) for p in pairs] == [
        ("d1", "Status", "approved"), ("d1", "K", "V")]
    ds = ray.data.from_arrow(out_rows)
    res = extract_with_template(ds, {"status": "str", "absent": "str"}) \
        .to_pandas().sort_values(["doc_id", "field"]).reset_index(drop=True)
    assert len(res) == 4  # every doc x every template field, nulls kept
    d1 = res[res.doc_id == "d1"].set_index("field")["value"]
    assert d1["status"] == "approved" and d1["absent"] is None
