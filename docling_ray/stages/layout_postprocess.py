"""Layout postprocessing over labeled cluster predictions.

Re-expresses the reference's ``docling/utils/layout_postprocessor.py``
(LayoutPostprocessor, :154-701) for this engine's dict-shaped pages:
per-label confidence thresholds, title remapping, cell→cluster
assignment with orphan recovery, iterative bbox-tightening + union-find
overlap removal, and the special picture/wrapper passes (cross-type
KEY_VALUE_REGION-vs-TABLE and PICTURE-vs-TABLE suppression, child
containment, full-page-picture filtering).

Clusters are plain dicts ``{"id", "label", "confidence", "bbox": (l, t,
r, b), "cells": [cell, ...], "children": [...]}`` and cells are
``{"index", "l", "t", "r", "b", "text"}``. Overlap detection is a
t-sorted sweep with early exit (near-O(n) on the disjoint vertical
flows real pages produce; pages carry tens of clusters — a spatial
index would be overhead, not speedup, at this n; the union-find
grouping matches the reference's SpatialClusterIndex algorithm).

The geometric layout path (stages/pdf_layout.extract_page) produces
disjoint confidence-1.0 items, for which this pass is the identity —
pinned by the generator span-equality suite. Its effect shows on noisy
real-world predictions: duplicate/overlapping proposals collapse to the
best cluster per group and orphaned text lines are recovered.
"""

from __future__ import annotations

import sys

# Reference parameter parity (layout_postprocessor.py:157-192) — these
# constants are the published behavior being matched, not borrowed code.
CONFIDENCE_THRESHOLDS = {
    "caption": 0.5,
    "footnote": 0.5,
    "formula": 0.5,
    "list_item": 0.5,
    "page_footer": 0.5,
    "page_header": 0.5,
    "picture": 0.5,
    "section_header": 0.45,
    "table": 0.5,
    "text": 0.5,
    "title": 0.45,
    "code": 0.45,
    "checkbox_selected": 0.45,
    "checkbox_unselected": 0.45,
    "form": 0.45,
    "key_value_region": 0.45,
    "document_index": 0.45,
}
OVERLAP_PARAMS = {
    "regular": {"area_threshold": 1.3, "conf_threshold": 0.05},
    "picture": {"area_threshold": 2.0, "conf_threshold": 0.3},
    "wrapper": {"area_threshold": 2.0, "conf_threshold": 0.2},
}
WRAPPER_LABELS = {"form", "key_value_region", "table", "document_index"}
SPECIAL_LABELS = WRAPPER_LABELS | {"picture"}
LABEL_REMAP = {"title": "section_header"}


def _area(b) -> float:
    return max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])


def _inter(a, b) -> float:
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    return w * h if w > 0 and h > 0 else 0.0


def _over_self(a, b) -> float:
    """Fraction of a covered by b (intersection_over_self)."""
    aa = _area(a)
    return _inter(a, b) / aa if aa > 0 else 0.0


def _iou(a, b) -> float:
    i = _inter(a, b)
    u = _area(a) + _area(b) - i
    return i / u if u > 0 else 0.0


class _UnionFind:
    def __init__(self, ids):
        self.parent = {i: i for i in ids}

    def find(self, x):
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]  # path halving
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra

    def groups(self) -> list[list]:
        out: dict = {}
        for x in self.parent:
            out.setdefault(self.find(x), []).append(x)
        return list(out.values())


def _linked_pairs(boxes: list[tuple]) -> list[tuple[int, int]]:
    """Index pairs whose IoU exceeds 0.8 or either-way containment
    exceeds 0.8 (SpatialClusterIndex.check_overlap semantics). A sweep
    over t-sorted boxes: once the next box starts below the current
    one's bottom, no later box can intersect it — near-O(n) on the
    disjoint vertical flows real pages produce, so the common identity
    case never pays a full pairwise pass."""
    n = len(boxes)
    order = sorted(range(n), key=lambda i: boxes[i][1])
    pairs = []
    for oi in range(n - 1):
        i = order[oi]
        al, at, ar, ab = boxes[i]
        aa = (ar - al) * (ab - at)
        for oj in range(oi + 1, n):
            j = order[oj]
            bl, bt, br, bb = boxes[j]
            if bt >= ab:
                break  # t-sorted: every later box is fully below i
            iw = (ar if ar < br else br) - (al if al > bl else bl)
            if iw <= 0:
                continue
            ih = (ab if ab < bb else bb) - bt  # bt >= at within the sweep
            if ih <= 0:
                continue
            inter = iw * ih
            ba = (br - bl) * (bb - bt)
            if ((aa > 0 and inter > 0.8 * aa)
                    or (ba > 0 and inter > 0.8 * ba)
                    or (aa + ba > inter and inter > 0.8 * (aa + ba - inter))):
                pairs.append((i, j))
    return pairs


def _overlap_groups(clusters: list[dict]) -> list[list[dict]]:
    """Union-find groups of clusters linked by ``_linked_pairs``."""
    n = len(clusters)
    if n <= 1:
        return [[c] for c in clusters]
    pairs = _linked_pairs([c["bbox"] for c in clusters])
    if not pairs:
        return [[c] for c in clusters]
    uf = _UnionFind(range(n))
    for i, j in pairs:
        uf.union(i, j)
    return [[clusters[i] for i in g] for g in uf.groups()]


def _prefer(candidate: dict, other: dict, params: dict) -> bool:
    """Whether ``candidate`` survives against ``other``
    (_should_prefer_cluster, layout_postprocessor.py:436-470): a
    similar-area LIST_ITEM beats TEXT, CODE absorbs what it contains,
    otherwise a small candidate loses to a clearly-more-confident
    other."""
    oa = _area(other["bbox"])
    if candidate["label"] == "list_item" and other["label"] == "text":
        if oa > 0 and abs(1 - _area(candidate["bbox"]) / oa) < 0.2:
            return True
    if candidate["label"] == "code":
        if _over_self(other["bbox"], candidate["bbox"]) > 0.8:
            return True
    area_ratio = _area(candidate["bbox"]) / oa if oa > 0 else float("inf")
    conf_diff = other["confidence"] - candidate["confidence"]
    return not (area_ratio <= params["area_threshold"]
                and conf_diff > params["conf_threshold"])


def _best_of_group(group: list[dict], params: dict) -> dict:
    best = None
    for cand in group:
        if all(_prefer(cand, o, params) for o in group if o is not cand):
            if best is None or (
                _area(cand["bbox"]) > _area(best["bbox"])
                and best["confidence"] - cand["confidence"]
                <= params["conf_threshold"]
            ):
                best = cand
    return best if best is not None else group[0]


def _dedup_cells(cells: list[dict]) -> list[dict]:
    seen = set()
    out = []
    for c in cells:
        if c["index"] not in seen:
            seen.add(c["index"])
            out.append(c)
    return out


def _remove_overlapping(clusters: list[dict], kind: str) -> list[dict]:
    params = OVERLAP_PARAMS[kind]
    out = []
    for group in _overlap_groups(clusters):
        if len(group) == 1:
            out.append(group[0])
            continue
        best = _best_of_group(group, params)
        for c in group:
            if c is not best:
                best["cells"] = best["cells"] + c["cells"]
        best["cells"] = sorted(_dedup_cells(best["cells"]),
                               key=lambda c: c["index"])
        out.append(best)
    return out


def _assign_cells(clusters: list[dict], cells: list[dict],
                  min_overlap: float = 0.2) -> None:
    """Each non-empty cell goes to the cluster covering the largest
    fraction of it (>= min_overlap), ties to the first cluster."""
    for cl in clusters:
        cl["cells"] = []
    for cell in cells:
        if not (cell.get("text") or "").strip():
            continue
        cb = (cell["l"], cell["t"], cell["r"], cell["b"])
        if _area(cb) <= 0:
            continue
        best, best_cl = min_overlap, None
        for cl in clusters:
            ratio = _over_self(cb, cl["bbox"])
            if ratio > best:
                best, best_cl = ratio, cl
        if best_cl is not None:
            best_cl["cells"].append(cell)
    for cl in clusters:
        cl["cells"] = _dedup_cells(cl["cells"])


def _tighten_bboxes(clusters: list[dict]) -> None:
    """Shrink each cluster to its cells' envelope (tables only grow —
    union with the prediction, _adjust_cluster_bboxes)."""
    for cl in clusters:
        if not cl["cells"]:
            continue
        env = (min(c["l"] for c in cl["cells"]),
               min(c["t"] for c in cl["cells"]),
               max(c["r"] for c in cl["cells"]),
               max(c["b"] for c in cl["cells"]))
        if cl["label"] == "table":
            b = cl["bbox"]
            cl["bbox"] = (min(b[0], env[0]), min(b[1], env[1]),
                          max(b[2], env[2]), max(b[3], env[3]))
        else:
            cl["bbox"] = env


def _sort_clusters(clusters: list[dict]) -> list[dict]:
    return sorted(clusters, key=lambda cl: (
        min((c["index"] for c in cl["cells"]), default=sys.maxsize),
        cl["bbox"][1], cl["bbox"][0]))


def dedupe_overlapping_items(items: list[dict]) -> list[dict]:
    """Collapse near-coincident paragraph items in a column flow (the
    duplicated-text-layer case: a PDF carrying both an original and an
    OCR text layer stamps every line twice). Region items pass through
    untouched. Disjoint layouts — everything the geometric classifier
    produces from well-formed pages — are returned unchanged (identity
    pinned by the generator span-equality suite), so this is the
    overlap-removal subset of the postprocessor wired into the live
    page flow (stages/pdf_layout.extract_page)."""
    paras = [it for it in items if "region" not in it]
    if len(paras) < 2:
        return items
    boxes = [(it["l"], it["top"], it["r"], it["b"]) for it in paras]
    pairs = _linked_pairs(boxes)
    if not pairs:  # disjoint layout — the common case, zero-copy return
        return items
    regions = [it for it in items if "region" in it]
    uf = _UnionFind(range(len(paras)))
    for i, j in pairs:
        uf.union(i, j)
    kept = []
    for g in uf.groups():
        # first in reading order survives (equal-confidence duplicates)
        g.sort(key=lambda i: (boxes[i][1], boxes[i][0], i))
        kept.append(paras[g[0]])
    return kept + regions


def postprocess_clusters(
    clusters: list[dict],
    cells: list[dict],
    page_size: tuple[float, float],
    *,
    remap_labels: bool = True,
    create_orphans: bool = True,
    keep_empty: bool = False,
) -> list[dict]:
    """Full postprocessing pipeline (LayoutPostprocessor.postprocess):
    returns the cleaned clusters in reading order, wrappers carrying
    their contained regular clusters under ``children``."""
    clusters = [dict(c, cells=list(c.get("cells") or []), children=[])
                for c in clusters]
    regular = [c for c in clusters if c["label"] not in SPECIAL_LABELS]
    special = [c for c in clusters if c["label"] in SPECIAL_LABELS]

    # -- regular pass ------------------------------------------------------
    regular = [c for c in regular
               if c["confidence"] >= CONFIDENCE_THRESHOLDS.get(c["label"], 0.5)]
    if remap_labels:
        for c in regular:
            c["label"] = LABEL_REMAP.get(c["label"], c["label"])
    _assign_cells(regular, cells)
    if not keep_empty:
        regular = [c for c in regular if c["cells"] or c["label"] == "formula"]
    if create_orphans:
        assigned = {cell["index"] for c in regular for cell in c["cells"]}
        next_id = max((c["id"] for c in clusters), default=0) + 1
        for cell in cells:
            if cell["index"] in assigned or not (cell.get("text") or "").strip():
                continue
            regular.append({
                "id": next_id, "label": "text",
                "confidence": cell.get("confidence", 1.0),
                "bbox": (cell["l"], cell["t"], cell["r"], cell["b"]),
                "cells": [cell], "children": [],
            })
            next_id += 1
    prev = len(regular) + 1
    for _ in range(3):
        if prev == len(regular):
            break
        prev = len(regular)
        _tighten_bboxes(regular)
        regular = _remove_overlapping(regular, "regular")

    # -- special pass ------------------------------------------------------
    special = [c for c in special
               if c["confidence"] >= CONFIDENCE_THRESHOLDS.get(c["label"], 0.5)]
    # cross-type suppression (layout_postprocessor.py:386-434)
    drop: set = set()
    reg_tables = [c for c in regular if c["label"] == "table"]
    for w in special:
        if w["label"] not in WRAPPER_LABELS:
            continue
        for tbl in reg_tables:
            if (_over_self(w["bbox"], tbl["bbox"]) > 0.9
                    and w["confidence"] - tbl["confidence"] < 0.1):
                drop.add(w["id"])
                break
    sp_tables = [c for c in special if c["label"] == "table"]
    for pic in special:
        if pic["label"] != "picture":
            continue
        if any(_iou(pic["bbox"], t["bbox"]) > 0.8 for t in sp_tables):
            drop.add(pic["id"])
    special = [c for c in special if c["id"] not in drop]
    page_area = page_size[0] * page_size[1]
    if page_area > 0:
        special = [c for c in special
                   if not (c["label"] == "picture"
                           and _area(c["bbox"]) / page_area > 0.90)]
    for sp in special:
        contained = [c for c in regular
                     if _over_self(c["bbox"], sp["bbox"]) > 0.8]
        if contained:
            sp["children"] = _sort_clusters(contained)
            if sp["label"] in ("form", "key_value_region"):
                sp["bbox"] = (min(c["bbox"][0] for c in contained),
                              min(c["bbox"][1] for c in contained),
                              max(c["bbox"][2] for c in contained),
                              max(c["bbox"][3] for c in contained))
            sp["cells"] = sorted(
                _dedup_cells([cell for c in contained for cell in c["cells"]]),
                key=lambda c: c["index"])
    pictures = _remove_overlapping(
        [c for c in special if c["label"] == "picture"], "picture")
    wrappers = _remove_overlapping(
        [c for c in special if c["label"] in WRAPPER_LABELS], "wrapper")
    special = pictures + wrappers

    # wrappers absorb their children out of the regular stream
    contained_ids = {ch["id"] for w in special for ch in w["children"]}
    regular = [c for c in regular if c["id"] not in contained_ids]
    return _sort_clusters(regular + special)
