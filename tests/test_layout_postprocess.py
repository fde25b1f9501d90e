"""Behavioral pins for the layout postprocessor
(reference docling/utils/layout_postprocessor.py:154-701)."""

from docling_ray.stages.layout_postprocess import (
    CONFIDENCE_THRESHOLDS,
    postprocess_clusters,
)


def _cell(i, l, t, r, b, text="x"):
    return {"index": i, "l": l, "t": t, "r": r, "b": b, "text": text}


def _cl(cid, label, conf, bbox):
    return {"id": cid, "label": label, "confidence": conf, "bbox": bbox}


PAGE = (612.0, 792.0)


def test_confidence_thresholds_filter_per_label():
    cells = [_cell(0, 10, 10, 100, 20), _cell(1, 10, 30, 100, 40)]
    clusters = [
        _cl(1, "text", 0.51, (5, 5, 105, 25)),        # above 0.5 → kept
        _cl(2, "text", 0.49, (5, 25, 105, 45)),       # below 0.5 → dropped
        _cl(3, "section_header", 0.46, (5, 50, 105, 60)),  # 0.45 bar → kept
    ]
    out = postprocess_clusters(clusters, cells, PAGE, create_orphans=False,
                               remap_labels=False, keep_empty=True)
    ids = {c["id"] for c in out}
    assert 1 in ids and 3 in ids and 2 not in ids
    assert CONFIDENCE_THRESHOLDS["section_header"] == 0.45


def test_title_remap_and_orphan_recovery():
    cells = [_cell(0, 10, 10, 100, 20, "Heading"),
             _cell(1, 10, 700, 100, 710, "stray line")]
    clusters = [_cl(1, "title", 0.9, (5, 5, 105, 25))]
    out = postprocess_clusters(clusters, cells, PAGE)
    labels = [c["label"] for c in out]
    assert "section_header" in labels          # remapped from title
    assert "title" not in labels
    orphans = [c for c in out if c["cells"] and c["cells"][0]["index"] == 1]
    assert orphans and orphans[0]["label"] == "text"  # orphan cell recovered


def test_overlapping_duplicates_collapse_to_best():
    cells = [_cell(0, 10, 10, 200, 40)]
    # two near-identical text proposals: the more confident one wins and
    # absorbs the other's cells
    clusters = [
        _cl(1, "text", 0.95, (8, 8, 202, 42)),
        _cl(2, "text", 0.60, (10, 10, 200, 40)),
    ]
    out = postprocess_clusters(clusters, cells, PAGE, create_orphans=False)
    assert len(out) == 1
    assert out[0]["id"] == 1
    assert [c["index"] for c in out[0]["cells"]] == [0]


def test_empty_clusters_drop_but_formula_survives():
    clusters = [
        _cl(1, "text", 0.9, (300, 300, 400, 320)),     # no cells → dropped
        _cl(2, "formula", 0.9, (300, 400, 400, 420)),  # empty formula kept
    ]
    out = postprocess_clusters(clusters, [], PAGE, create_orphans=False)
    assert [c["id"] for c in out] == [2]


def test_full_page_picture_filtered():
    clusters = [_cl(1, "picture", 0.9, (0, 0, 612, 770))]  # >90% of page
    out = postprocess_clusters(clusters, [], PAGE, create_orphans=False)
    assert out == []


def test_picture_coinciding_with_table_is_dropped():
    clusters = [
        _cl(1, "table", 0.8, (50, 50, 400, 300)),
        _cl(2, "picture", 0.9, (52, 52, 398, 298)),  # IoU > 0.8 with table
        _cl(3, "picture", 0.9, (450, 50, 550, 150)),  # genuine figure kept
    ]
    out = postprocess_clusters(clusters, [], PAGE, create_orphans=False,
                               keep_empty=True)
    labels = {(c["id"], c["label"]) for c in out}
    assert (1, "table") in labels
    assert (3, "picture") in labels
    assert all(cid != 2 for cid, _ in labels)


def test_wrapper_absorbs_contained_regular_clusters():
    cells = [_cell(0, 60, 60, 200, 80, "k"), _cell(1, 60, 90, 200, 110, "v")]
    clusters = [
        _cl(1, "text", 0.9, (55, 55, 205, 85)),
        _cl(2, "text", 0.9, (55, 85, 205, 115)),
        _cl(3, "key_value_region", 0.9, (50, 50, 210, 120)),
    ]
    out = postprocess_clusters(clusters, cells, PAGE, create_orphans=False)
    wrappers = [c for c in out if c["label"] == "key_value_region"]
    assert len(wrappers) == 1
    assert [ch["id"] for ch in wrappers[0]["children"]] == [1, 2]
    # children leave the regular stream
    assert {c["id"] for c in out} == {3}
    # wrapper bbox tightened to the (cell-tightened) children's envelope
    assert wrappers[0]["bbox"] == (60, 60, 200, 110)
    assert [c["index"] for c in wrappers[0]["cells"]] == [0, 1]


def test_kv_region_suppressed_by_coinciding_regular_table():
    cells = [_cell(0, 60, 60, 200, 80)]
    clusters = [
        _cl(1, "key_value_region", 0.8, (50, 50, 210, 120)),
        # a TABLE is special, so place a regular-bucket competitor via a
        # table cluster: the cross-type rule compares wrapper vs regular
        # tables — build one through the regular stream
    ]
    # regular-side table with near-identical bbox and similar confidence
    clusters.append(_cl(2, "table", 0.75, (50, 50, 210, 120)))
    out = postprocess_clusters(clusters, cells, PAGE, create_orphans=False,
                               keep_empty=True)
    # table is itself special here; the wrapper-vs-wrapper overlap pass
    # resolves the pair to a single survivor
    assert len([c for c in out
                if c["label"] in ("table", "key_value_region")]) == 1


def test_disjoint_items_are_identity():
    """Confidence-1.0 disjoint clusters (the geometric layout path's
    output shape) pass through unchanged, in reading order."""
    cells = [_cell(0, 10, 10, 100, 20, "a"), _cell(1, 10, 50, 100, 60, "b"),
             _cell(2, 10, 90, 100, 100, "c")]
    clusters = [
        _cl(3, "text", 1.0, (10, 90, 100, 100)),
        _cl(1, "text", 1.0, (10, 10, 100, 20)),
        _cl(2, "text", 1.0, (10, 50, 100, 60)),
    ]
    out = postprocess_clusters(clusters, cells, PAGE, create_orphans=False,
                               remap_labels=False)
    assert [c["id"] for c in out] == [1, 2, 3]
    assert [[cell["index"] for cell in c["cells"]] for c in out] == [[0], [1], [2]]
