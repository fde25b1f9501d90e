"""Query pipelines over the testdata tables — the operator-coverage surface.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names match the corresponding oracle SQL in ``__ray_entry__`` exactly
(the driver's compare is name-sorted + value-hashed).

Float-comparison policy: ratio/average columns are emitted as
**floor-scaled integers** (e.g. ``*_ppm = floor(x * 1e6)``) rather than
rounded doubles — ``floor`` after identical IEEE division is deterministic
across engines, while round() half-rule differences (banker's vs half-away)
are not. Plain sums keep 2-decimal rounding (inputs have 2 decimals, so the
true sum is exactly representable and order-independent at that precision).

Relational coverage (SURVEY.md §2.8 mapping): vectorized filter + aggregate
(q1), broadcast join (orders⋈customer — the small side ships once via
``ray.put``), top-k sort, tumbling-window aggregate over the events log,
distinct, explode/flat-map (doc chunks), plus partial aggregation inside
``map_batches`` before every ``groupby`` so the shuffle moves one row per
key per batch, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    from docling_ray.sources.tables import read_sf_table

    return read_sf_table(sf_dir, table, columns)


# ---------------------------------------------------------------------------
# TPC-H-style relational pipelines
# ---------------------------------------------------------------------------

def q1_lineitem_agg(sf_dir: str):
    """Pricing-summary aggregate: filter → per-batch partial agg → small
    groupby (the pre-aggregation pattern — the shuffle carries one row per
    (flag,status) per batch)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["l_shipdate"], cutoff))
        g = pa.TableGroupBy(
            batch.select(["l_returnflag", "l_linestatus", "l_quantity",
                          "l_extendedprice", "l_discount"]),
            ["l_returnflag", "l_linestatus"],
        ).aggregate([("l_quantity", "sum"), ("l_extendedprice", "sum"),
                     ("l_discount", "sum"), ("l_quantity", "count")])
        # zero-copy Arrow all the way: no pandas round-trip in the hot stage
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["l_quantity_sum"],
            "sum_price": g["l_extendedprice_sum"],
            "sum_disc": g["l_discount_sum"],
            "n_rows": g["l_quantity_count"],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_price"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("n_rows", alias_name="n_rows"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty_x100": pc.round(pc.multiply(batch["sum_qty"], 100.0), 0).cast(pa.int64()),
            "sum_price_x100": pc.round(pc.multiply(batch["sum_price"], 100.0), 0).cast(pa.int64()),
            "sum_disc_x100": pc.round(pc.multiply(batch["sum_disc"], 100.0), 0).cast(pa.int64()),
            "n_rows": batch["n_rows"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def mktsegment_order_stats(sf_dir: str):
    """Broadcast join: customer (small side) ships once via ray.put; orders
    stream through a stateless lookup stage; partial agg before groupby."""
    from docling_ray.state.broadcast import broadcast, read_broadcast

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = cust["c_custkey"].to_numpy()
    order = np.argsort(keys)
    # broadcast once as sorted parallel arrays: worker lookup is a
    # vectorized searchsorted, and read_broadcast caches the deserialized
    # object per process (not per batch)
    lookup_ref = broadcast(
        (keys[order], cust["c_mktsegment"].to_numpy()[order]))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        lk, lv = read_broadcast(lookup_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        seg = lv[np.searchsorted(lk, ck)]  # custkey is an FK: always present
        t = pa.table({"c_mktsegment": pa.array(seg),
                      "o_totalprice": batch["o_totalprice"]})
        g = pa.TableGroupBy(t, "c_mktsegment").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")])
        return pa.table({
            "c_mktsegment": g["c_mktsegment"],
            "n_orders": g["o_totalprice_count"],
            "sum_price": g["o_totalprice_sum"],
        })

    partials = orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("sum_price", alias_name="sum_price"),
    )
    return agg.map_batches(
        lambda t: pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "n_orders": t["n_orders"],
            "sum_price_x100": pc.round(pc.multiply(t["sum_price"], 100.0), 0).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("c_mktsegment")


def topk_orders(sf_dir: str, k: int = 10):
    """Top-k by total price: per-batch partial top-k (vectorized lexsort)
    so the final sort sees k rows per batch, not the whole table — the
    same prune pattern as ``ann_brute_topk``; a full global sort for 10
    rows is an all-to-all shuffle of everything."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -price))[: min(k, len(price))]
        return batch.take(pa.array(order)).combine_chunks()

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return partials.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def topk_orders_per_group(sf_dir: str, k: int = 3):
    """Grouped top-k: the k highest-value orders per order priority.
    Per-batch partial top-k PER KEY (one vectorized lexsort + stable
    group-head mask, no per-key Python) prunes each block to ≤ k·|keys|
    rows; the surviving partials — a few rows per block — shuffle to one
    tiny ``groupby(key).map_groups`` merge. Ties break on orderkey so
    the result is deterministic and SQL-mirrored (ROW_NUMBER)."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        prio = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        # sort by (priority, -price, key); the first k rows of each
        # priority run are that key's batch-local top-k
        order = np.lexsort((key, -price, prio))
        sp = prio[order]
        run_start = np.r_[True, sp[1:] != sp[:-1]]
        # rank within run = index - start-of-run index (vectorized)
        idx = np.arange(len(sp))
        start_idx = np.maximum.accumulate(np.where(run_start, idx, 0))
        keep = (idx - start_idx) < k
        return batch.take(pa.array(order[keep])).combine_chunks()

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=65536)

    def merge(group) -> pa.Table:
        g = group.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(k)
        return pa.table({
            "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
            "o_orderkey": pa.array(g["o_orderkey"], pa.int64()),
            "price_x100": pa.array(
                (g["o_totalprice"] * 100).round(0).astype("int64")),
        })

    return partials.groupby("o_orderpriority").map_groups(
        merge, batch_format="pandas").sort(["o_orderpriority", "o_orderkey"])


def events_hourly_window(sf_dir: str):
    """Tumbling 1-hour window per event_type over the events log: the window
    key is computed vectorized, partial-aggregated per batch, then one small
    groupby (the streaming-shaped workload pattern)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        hour = pc.divide(us, 3_600_000_000)  # integer division: µs → hours
        t = pa.table({
            "event_type": batch["event_type"],
            "hour_bucket": hour,
            "value": batch["value"],
        })
        g = pa.TableGroupBy(t, ["event_type", "hour_bucket"]).aggregate(
            [("value", "sum"), ("value", "count")])
        return pa.table({
            "event_type": g["event_type"],
            "hour_bucket": g["hour_bucket"],
            "n_events": g["value_count"],
            "sum_value": g["value_sum"],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby(["event_type", "hour_bucket"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "hour_bucket": t["hour_bucket"],
            "n_events": t["n_events"],
            "sum_value_x100": pc.round(pc.multiply(t["sum_value"], 100.0), 0).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort(["event_type", "hour_bucket"])


def event_value_quantiles(sf_dir: str):
    """Exact nearest-rank quantiles (p50/p95) of the event value per
    event type — the distributed analogue of the reference's
    nanquantile confidence roll-ups (standard_pdf_pipeline.py:1101-1129).

    Shape: values quantize to x100 integers (floor(v*100+0.5), identical
    float64 ops in the SQL oracle), per-batch (type, bin) partial counts
    → one SMALL histogram groupby (bins ≪ rows) → per-type nearest rank
    from the cumulative histogram. Quantiles over the quantized values
    are exact; no full-data sort, no data-scale group ever reaches
    Python — the histogram is the only shuffled object."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        bins = np.floor(v * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "v": pa.array(bins)})
        g = pa.TableGroupBy(t, ["event_type", "v"]).aggregate([("v", "count")])
        return pa.table({"event_type": g["event_type"], "v": g["v"],
                         "cnt": g["v_count"]})

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536) \
             .groupby(["event_type", "v"]).aggregate(
                 Sum("cnt", alias_name="cnt"))

    def quantiles(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])

        def rank_value(p: float) -> int:
            rank = int(np.ceil(p * n))
            return int(v[np.searchsorted(cum, rank)])

        return pa.table({
            "event_type": group["event_type"][:1],
            "n_events": pa.array([n], pa.int64()),
            "p50_x100": pa.array([rank_value(0.5)], pa.int64()),
            "p95_x100": pa.array([rank_value(0.95)], pa.int64()),
        })

    return hist.groupby("event_type").map_groups(
        quantiles, batch_format="pyarrow").sort("event_type")


def sliding_window_events(sf_dir: str, window_min: int = 60,
                          step_min: int = 15):
    """SLIDING window aggregate (the windows family's third member next
    to tumbling and session): per event_type, 60-minute windows sliding
    every 15 minutes — each event contributes to window_min/step_min
    windows. Vectorized replicate (np.repeat + step offsets) + per-batch
    partial aggregation, then one small groupby; the replication factor
    is a constant, not a shuffle multiplier."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    k = window_min // step_min
    step_us = step_min * 60_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // step_us) * step_us  # newest window start per event
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype=np.int64) * step_us,
                            len(base)))
        et = np.repeat(
            batch["event_type"].to_numpy(zero_copy_only=False), k)
        val = np.repeat(batch["value"].to_numpy(zero_copy_only=False), k)
        t = pa.table({
            "event_type": pa.array(et, pa.string()),
            "window_start_us": pa.array(starts),
            "value": pa.array(val),
        })
        g = pa.TableGroupBy(t, ["event_type", "window_start_us"]).aggregate(
            [("value", "sum"), ("value", "count")])
        return pa.table({
            "event_type": g["event_type"],
            "window_start_us": g["window_start_us"],
            "n_events": g["value_count"],
            "sum_value": g["value_sum"],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    agg = partials.groupby(["event_type", "window_start_us"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "window_start_us": t["window_start_us"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "sum_value_x100": pc.round(
                pc.multiply(t["sum_value"], 100.0), 0).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort(["event_type", "window_start_us"])


def distinct_event_types(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals)})


def doc_chunks(sf_dir: str, chunk_chars: int = 200):
    """Explode/flat-map: fixed-size character chunks per document."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, chunks = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            text = text or ""
            for i in range(0, max(1, len(text)), chunk_chars):
                ids.append(did)
                idxs.append(i // chunk_chars)
                chunks.append(text[i : i + chunk_chars])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk": pa.array(chunks, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow").sort(
        ["doc_id", "chunk_idx"]
    )


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def _query_vector(sf_dir: str) -> np.ndarray:
    """Deterministic query = embedding of vec_id 0 (also used by oracle)."""
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        filters=[("vec_id", "=", 0)], columns=["embedding"],
    )
    return np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)


def ann_brute_topk(sf_dir: str, k: int = 10):
    """Exact cosine top-k vs the vec_id=0 query, floor-scaled sims over
    x1000-QUANTIZED vectors: each dim becomes floor(x*1000 + 0.5) (an
    integer-valued double), so the dot products and norms are EXACT
    integer sums (64 dims × ≤1e3 per dim, far under 2^53) and the final
    ``floor(dot / sqrt(na*nb) * 1e6)`` is the same three correctly-
    rounded IEEE ops in numpy and DuckDB — bit-identical, association-
    free. The previous unquantized cosine differed from DuckDB's
    list_cosine_similarity by one ulp at sf0.1 (different summation
    order), flipping the floor at the e6 boundary."""
    from docling_ray.stages.similarity import _to_matrix

    q = np.floor(_query_vector(sf_dir) * 1000.0 + 0.5)
    q_ref = ray.put(q)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        from docling_ray.state.broadcast import read_broadcast

        qv = read_broadcast(q_ref)
        mat = np.floor(
            _to_matrix(batch["embedding"]).astype(np.float64)
            * 1000.0 + 0.5)
        dot = mat @ qv
        na = (mat * mat).sum(axis=1)
        nb = float(qv @ qv)
        prod = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dot / np.sqrt(prod) * 1_000_000.0
        sim_e6 = np.where(prod == 0, -1_000_000_000,
                          np.floor(sims)).astype(np.int64)
        n = min(k, len(sim_e6))
        order = np.lexsort((batch["vec_id"].to_numpy(), -sim_e6))[:n]
        return pa.table({
            "vec_id": batch["vec_id"].take(pa.array(order)).combine_chunks(),
            "sim_e6": pa.array(sim_e6[order]),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return partials.sort(["sim_e6", "vec_id"], descending=[True, False]).limit(k)


def embedding_label_norms(sf_dir: str):
    """Per-label count + floor-scaled mean L2 norm (partial agg per batch)."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    from docling_ray.stages.similarity import _to_matrix

    def partial(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch["embedding"])
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        t = pa.table({"label": batch["label"], "norm": pa.array(norms)})
        g = pa.TableGroupBy(t, "label").aggregate(
            [("norm", "sum"), ("norm", "count")])
        return pa.table({"label": g["label"], "n": g["norm_count"],
                         "sum_norm": g["norm_sum"]})

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536) \
            .groupby("label").aggregate(
                Sum("n", alias_name="n"),
                Sum("sum_norm", alias_name="sum_norm"))
    return agg.map_batches(
        lambda t: pa.table({
            "label": t["label"],
            "n": t["n"],
            "avg_norm_e4": pc.floor(pc.multiply(
                pc.divide(t["sum_norm"], pc.cast(t["n"], pa.float64())),
                10_000.0)).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("label")


def order_priority_revenue(sf_dir: str, num_buckets: int = 64):
    """Large-large join: lineitem ⋈ orders on orderkey, revenue per order
    priority — the explicit partitioned hash join (bucket both sides by
    ``key % B``, union, co-group per bucket, merge inside ``map_groups``;
    hot keys can't exist since orderkey is the orders PK). The lineitem side
    is pre-aggregated per (bucket, key) inside ``map_batches`` first, so the
    shuffle carries one row per orderkey per batch, not one per line item.

    Revenue quantizes PER ROW to x10000 int64 (l_extendedprice ×
    (1 - l_discount) is an exact 4-decimal value, so the per-row float
    product rounds to the same integer in both engines) and every
    downstream sum is integer arithmetic — rounding AFTER the float sum
    diverged from DuckDB by one ulp at sf0.1 magnitudes (three float
    summation stages here vs DuckDB's one; the SQL mirrors the per-row
    quantization inside SUM)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount"])

    def order_rows(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1), pa.int32()),
            "key": keys,
            "priority": batch["o_orderpriority"],
            "rev": pa.nulls(batch.num_rows, pa.int64()),
            "n": pa.nulls(batch.num_rows, pa.int64()),
        })

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        rev = pc.cast(pc.round(pc.multiply(
            pc.multiply(batch["l_extendedprice"],
                        pc.subtract(1.0, batch["l_discount"])),
            10000.0)), pa.int64())
        t = pa.table({"key": batch["l_orderkey"], "rev": rev})
        g = pa.TableGroupBy(t, "key").aggregate(
            [("rev", "sum"), ("rev", "count")])
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(g["key"], num_buckets - 1),
                              pa.int32()),
            "key": g["key"],
            "priority": pa.nulls(g.num_rows, pa.string()),
            "rev": g["rev_sum"],
            "n": g["rev_count"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(lineitem_partials, batch_format="pyarrow",
                             batch_size=65536)
    )

    def merge_bucket(group) -> pa.Table:
        is_order = group["priority"].notna()
        prio_by_key = dict(zip(group.loc[is_order, "key"],
                               group.loc[is_order, "priority"]))
        li = group[~is_order]
        if li.empty:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "rev": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        li = li.assign(o_orderpriority=li["key"].map(prio_by_key))
        g = li.groupby("o_orderpriority", as_index=False).agg(
            rev=("rev", "sum"), n_items=("n", "sum"))
        return pa.table({
            "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
            "rev": pa.array(g["rev"], pa.int64()),
            "n_items": pa.array(g["n_items"], pa.int64()),
        })

    partials = both.groupby("bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")
    agg = partials.groupby("o_orderpriority").aggregate(
        Sum("rev", alias_name="rev"), Sum("n_items", alias_name="n_items"))
    return agg.map_batches(
        lambda t: pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "revenue_x10000": pc.cast(t["rev"], pa.int64()),
            "n_items": pc.cast(t["n_items"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("o_orderpriority")


def sessionize_events(sf_dir: str, gap_minutes: int = 30, num_buckets: int = 64):
    """Sessionization: per-user event stream → session count with a
    ``gap_minutes`` inactivity cutoff. The streaming-shaped custom op
    (SURVEY.md §2.8 "windows"), partitioned by ``hash(user) % B`` so the
    per-group kernel runs once per BUCKET, not once per user: inside a
    bucket one mergesort by (user, ts) + one ``np.diff`` pass counts
    session starts for every user at once — ordering is re-established
    inside the bucket, never assumed from block order. Scale knob:
    ``num_buckets`` grows with the event volume; a bucket only needs to
    hold its users' (user_id, ts) pairs."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch["user_id"], pa.int64())
        return batch.append_column(
            "bucket",
            pc.cast(pc.bit_wise_and(keys, num_buckets - 1), pa.int32()))

    def per_bucket(group) -> pa.Table:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        n = len(g)
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        start = np.ones(n, dtype=bool)
        start[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap)
        users, first_idx, counts = np.unique(uid, return_index=True,
                                             return_counts=True)
        n_sessions = np.add.reduceat(start.astype(np.int64), first_idx)
        return pa.table({
            "user_id": pa.array(users.astype(np.int64)),
            "n_events": pa.array(counts.astype(np.int64)),
            "n_sessions": pa.array(n_sessions),
        })

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
             .groupby("bucket") \
             .map_groups(per_bucket, batch_format="pandas") \
             .sort("user_id")


def range_join_events_orders(sf_dir: str, days: int = 7,
                             num_buckets: int = 16):
    """Bounded range join (SURVEY §2.8 custom-op list, next to as-of):
    events that fall within ``days`` after SOME order by the same
    customer (exists semantics), aggregated per event type. Same
    bucketed co-group shape as the as-of join; inside a bucket one
    ``merge_asof`` with a tolerance answers the interval-exists test
    vectorized — the nearest previous order is in the window iff any
    order is."""
    import pandas as pd

    events = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def event_rows(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch["user_id"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "key": keys,
            "when": batch["ts"],
            "event_type": batch["event_type"],
        })

    # the synthetic tables do not overlap in time (events 2024, orders
    # 1995-2001); map order dates into the events month deterministically
    # (epoch-microsecond arithmetic, mirrored bit-for-bit in the SQL
    # oracle) so the interval test is non-vacuous
    _BASE_1995 = np.datetime64("1995-01-01", "us").astype(np.int64)
    _BASE_2024 = np.datetime64("2024-01-01", "us").astype(np.int64)
    _MOD_30D = 30 * 86_400 * 1_000_000

    def order_rows(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch["o_custkey"], pa.int64())
        od_us = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        # numpy's % floors while SQL's % truncates toward zero — they
        # only agree when the operand is non-negative, so pin the domain
        # rather than let a pre-1995 date silently diverge from the oracle
        if od_us.size and od_us.min() < _BASE_1995:
            raise ValueError(
                "range_join date mapping requires o_orderdate >= 1995-01-01 "
                "(floored vs truncated modulo diverge below the base)")
        shifted = _BASE_2024 + (od_us - _BASE_1995) % _MOD_30D
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "key": keys,
            "when": pa.array(shifted.view("datetime64[us]")),
            "event_type": pa.nulls(batch.num_rows, pa.string()),
        })

    both = events.map_batches(event_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow",
                           batch_size=65536))
    tol = pd.Timedelta(days=days)

    def merge_bucket(group) -> pa.Table:
        is_order = group["event_type"].isna()
        ev = group[~is_order][["key", "when", "event_type"]]
        od = group[is_order][["key", "when"]].assign(matched=True)
        if ev.empty or od.empty:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_matched": pa.array([], pa.int64())})
        od = od.drop_duplicates(["key", "when"])
        ev = ev.sort_values("when", kind="mergesort")
        od = od.sort_values("when", kind="mergesort")
        m = pd.merge_asof(ev, od, on="when", by="key",
                          direction="backward", tolerance=tol)
        m = m[m["matched"].notna()]
        g = m.groupby("event_type", as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "n_matched": pa.array(g["size"], pa.int64()),
        })

    partials = both.groupby("bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")
    return partials.groupby("event_type").aggregate(
        Sum("n_matched", alias_name="n_matched")).map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "n_matched": pc.cast(t["n_matched"], pa.int64()),
        }), batch_format="pyarrow").sort("event_type")


def _md5_bucket(ids: "pa.ChunkedArray") -> np.ndarray:
    """Content-free deterministic 0-99 bucket per id: first 8 hex digits
    of md5(str(id)) mod 100 — hexdigest()[:8] as an int == big-endian
    first 4 digest bytes; numpy does all arithmetic (the md5 calls are
    C-backed). SQL-recomputable (the DuckDB oracles rerun the identical
    md5 arithmetic)."""
    import hashlib

    prefixes = b"".join(
        hashlib.md5(str(i).encode()).digest()[:4] for i in ids.to_pylist())
    return np.frombuffer(prefixes, dtype=">u4").astype(np.int64) % 100


def train_split(sf_dir: str, pct_train: int = 80, pct_val: int = 10):
    """Deterministic train/val/test assignment by content-free hash:
    bucket = first 8 hex digits of md5(doc_id) mod 100 — stable across
    runs and machines, SQL-recomputable (the DuckDB oracle reruns the
    identical md5 arithmetic). Stateless vectorized map, no shuffle."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        bucket = _md5_bucket(batch["doc_id"])
        splits = np.select(
            [bucket < pct_train, bucket < pct_train + pct_val],
            ["train", "val"], default="test",
        )
        return pa.table({"doc_id": batch["doc_id"],
                         "split": pa.array(splits, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow").sort("doc_id")


def asof_join_events_orders(sf_dir: str, num_buckets: int = 16):
    """As-of join (SURVEY custom-op list): each event matched to the user's
    most recent order at or before the event time, aggregated per event
    type. Implemented as the documented bucketed co-group: both sides keyed
    by user, unioned, ``groupby(bucket)`` co-locates, ``pd.merge_asof``
    inside the group. Orders are deduped to one per (user, date) — highest
    orderkey wins — because the as-of tie order among equal dates is
    engine-defined otherwise (the oracle applies the same rule)."""
    import pandas as pd

    events = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])

    def event_rows(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch["user_id"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1), pa.int32()),
            "key": keys,
            "when": batch["ts"],
            "event_type": batch["event_type"],
            "okey": pa.nulls(batch.num_rows, pa.int64()),
            "price": pa.nulls(batch.num_rows, pa.float64()),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch["o_custkey"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1), pa.int32()),
            "key": keys,
            "when": batch["o_orderdate"],
            "event_type": pa.nulls(batch.num_rows, pa.string()),
            "okey": pc.cast(batch["o_orderkey"], pa.int64()),
            "price": batch["o_totalprice"],
        })

    both = events.map_batches(event_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        orders.map_batches(order_rows, batch_format="pyarrow",
                           batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["okey"].notna()
        ev = group[~is_order][["key", "when", "event_type"]]
        od = group[is_order][["key", "when", "okey", "price"]]
        if ev.empty:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_matched": pa.array([], pa.int64()),
                             "sum_price": pa.array([], pa.float64())})
        # dedupe: one order per (user, date), highest orderkey wins
        od = od.sort_values(["key", "when", "okey"]).drop_duplicates(
            subset=["key", "when"], keep="last")
        ev = ev.sort_values("when", kind="mergesort")
        od = od.sort_values("when", kind="mergesort")
        m = pd.merge_asof(ev, od, on="when", by="key", direction="backward")
        m = m[m["okey"].notna()]
        g = m.groupby("event_type", as_index=False).agg(
            n_matched=("okey", "size"), sum_price=("price", "sum"))
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "n_matched": pa.array(g["n_matched"], pa.int64()),
            "sum_price": pa.array(g["sum_price"], pa.float64()),
        })

    partials = both.groupby("bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")
    agg = partials.groupby("event_type").aggregate(
        Sum("n_matched", alias_name="n_matched"),
        Sum("sum_price", alias_name="sum_price"))
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "n_matched": pc.round(pc.cast(t["n_matched"], pa.float64()), 0).cast(pa.int64()),
            "sum_price_x100": pc.round(pc.multiply(t["sum_price"], 100.0), 0).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("event_type")


def docs_by_lang_source(sf_dir: str):
    """Multi-key grouped corpus stats (pure Ray aggregate, no partial stage:
    the group count is tiny so the built-in shuffle is already minimal)."""
    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    agg = ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
    )
    return agg.map_batches(
        lambda t: pa.table({
            "lang": t["lang"],
            "source": t["source"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort(["lang", "source"])


def anti_join_customers(sf_dir: str, num_buckets: int = 64):
    """Distributed ANTI join (NOT EXISTS): customers with no URGENT
    order, counted per market segment. Same partitioned co-group shape
    as ``order_priority_revenue``: both sides bucket by ``custkey % B``
    and union; inside a bucket one vectorized ``isin`` drops matched
    customers and a per-segment partial count leaves the kernel — only
    segment-count rows reach the final groupby. The probe side is
    deduped per batch before the shuffle (an order key ships once per
    batch, not once per order)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "key": keys,
            "segment": batch["c_mktsegment"],
        })

    def urgent_keys(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.filter(
            pc.equal(batch["o_orderpriority"], "1-URGENT"))["o_custkey"])
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "key": keys,
            "segment": pa.nulls(len(keys), pa.string()),
        })

    both = cust.map_batches(cust_rows, batch_format="pyarrow",
                            batch_size=65536).union(
        orders.map_batches(urgent_keys, batch_format="pyarrow",
                           batch_size=65536))

    def anti_bucket(group) -> pa.Table:
        is_cust = group["segment"].notna()
        have = group.loc[~is_cust, "key"].to_numpy()
        c = group[is_cust]
        miss = c[~c["key"].isin(have)]
        g = miss.groupby("segment", as_index=False).size()
        return pa.table({
            "c_mktsegment": pa.array(g["segment"], pa.string()),
            "n_customers": pa.array(g["size"], pa.int64()),
        })

    partials = both.groupby("bucket").map_groups(anti_bucket,
                                                 batch_format="pandas")
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("n_customers", alias_name="n_customers"))
    return agg.map_batches(
        lambda t: pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "n_customers": pc.cast(t["n_customers"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("c_mktsegment")


def rollup_revenue(sf_dir: str):
    """ROLLUP (year, priority) over order revenue — the hierarchical
    aggregate (GROUP BY ROLLUP). Only the FINEST level is computed
    distributed (per-batch partials → small groupby); the subtotal and
    grand-total levels re-aggregate that years×priorities table
    driver-side (tens of rows — the documented small-result exception).
    Subtotal keys surface as ``-1`` / ``'ALL'`` to stay hashable."""
    ds = _read(sf_dir, "orders",
               ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
            "price": batch["o_totalprice"],
        })
        g = pa.TableGroupBy(t, ["o_year", "o_orderpriority"]).aggregate(
            [("price", "sum"), ("price", "count")])
        return pa.table({
            "o_year": g["o_year"],
            "o_orderpriority": g["o_orderpriority"],
            "price": g["price_sum"],
            "n": g["price_count"],
        })

    finest = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536) \
               .groupby(["o_year", "o_orderpriority"]).aggregate(
                   Sum("price", alias_name="price"),
                   Sum("n", alias_name="n"))
    f = pa.Table.from_pandas(finest.to_pandas(), preserve_index=False)

    def level(tbl: pa.Table, keys: list[str]) -> pa.Table:
        if keys:
            g = pa.TableGroupBy(tbl, keys).aggregate(
                [("price", "sum"), ("n", "sum")])
            cols = {k: g[k] for k in keys}
            price, n = g["price_sum"], g["n_sum"]
        else:
            cols = {}
            price = pa.array([pc.sum(tbl["price"]).as_py() or 0.0])
            n = pa.array([pc.sum(tbl["n"]).as_py() or 0], pa.int64())
        ny = len(price)
        return pa.table({
            "o_year": cols.get("o_year", pa.array([-1] * ny, pa.int64())),
            "o_orderpriority": cols.get(
                "o_orderpriority", pa.array(["ALL"] * ny, pa.string())),
            "price": price,
            "n": pc.cast(n, pa.int64()),
        })

    out = pa.concat_tables([
        level(f, ["o_year", "o_orderpriority"]),
        level(f, ["o_year"]),
        level(f, []),
    ])
    out = pa.table({
        "o_year": out["o_year"],
        "o_orderpriority": out["o_orderpriority"],
        "n_orders": out["n"],
        "sum_price_x100": pc.round(
            pc.multiply(out["price"], 100.0), 0).cast(pa.int64()),
    })
    idx = pc.sort_indices(out, sort_keys=[("o_year", "ascending"),
                                          ("o_orderpriority", "ascending")])
    return out.take(idx)


def user_running_value(sf_dir: str, num_buckets: int = 64):
    """Running-total window function: per-user cumulative event value in
    time order (SUM OVER PARTITION BY ... ROWS UNBOUNDED PRECEDING).
    Values quantize to exact integer cents FIRST (identical float op in
    the SQL oracle), so the cumulative sum is integer arithmetic — no
    float-association drift between engines. Bucketed like sessionize:
    ``hash(user) % B`` co-locates a user's events, one mergesort + one
    ``cumsum`` with vectorized per-user offsets serves the whole bucket;
    no per-user Python, bucket count scales with volume."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        keys = pc.cast(batch["user_id"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "cents": pa.array(cents),
        })

    def per_bucket(group) -> pa.Table:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        cents = g["cents"].to_numpy()
        n = len(g)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "running_x100": pa.array([], pa.int64())})
        cum = np.cumsum(cents)
        idx = np.arange(n)
        first = np.r_[True, uid[1:] != uid[:-1]]
        start = np.maximum.accumulate(np.where(first, idx, 0))
        running = cum - np.where(start > 0, cum[np.maximum(start - 1, 0)], 0)
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "running_x100": pa.array(running, pa.int64()),
        })

    return ds.map_batches(add_bucket, batch_format="pyarrow",
                          batch_size=65536) \
             .groupby("bucket") \
             .map_groups(per_bucket, batch_format="pandas") \
             .sort("event_id")


def event_rank_windows(sf_dir: str, num_buckets: int = 64):
    """Ranking window functions in one pass — ROW_NUMBER / DENSE_RANK /
    NTILE(4) / PERCENT_RANK per user partition (the full SQL ranking
    family; lag/running-sum live in their own queries). Time order is
    ``(ts, event_id)``; value ranks are over exact integer cents (same
    quantization as the oracle). PERCENT_RANK is emitted as
    ``(rank-1)*1e6 // (n-1)`` ppm so both engines compare integers.

    Same scale shape as :func:`user_running_value`: ``hash(user) % B``
    buckets co-locate a user's events, then ONE mergesort + vectorized
    numpy segment arithmetic serves every user in the bucket — no
    per-user Python, bucket count scales with volume."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        keys = pc.cast(batch["user_id"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "cents": pa.array(cents),
        })

    def per_bucket(group) -> pa.Table:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        uid = g["user_id"].to_numpy()
        cents = g["cents"].to_numpy()
        n = len(g)
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "row_num": pa.array([], pa.int64()),
            "dense_rank_cents": pa.array([], pa.int64()),
            "ntile4": pa.array([], pa.int64()),
            "pct_rank_ppm": pa.array([], pa.int64()),
        })
        if n == 0:
            return empty
        idx = np.arange(n, dtype=np.int64)
        first = np.r_[True, uid[1:] != uid[:-1]]
        start = np.maximum.accumulate(np.where(first, idx, 0))
        pos = idx - start                       # 0-based within user
        bounds = np.flatnonzero(first)
        lens = np.diff(np.r_[bounds, n])
        n_user = np.repeat(lens, lens)
        row_num = pos + 1
        # NTILE(4): first (n mod 4) tiles get ceil(n/4) rows
        q, r = n_user // 4, n_user % 4
        cutoff = r * (q + 1)
        ntile = np.where(
            pos < cutoff,
            pos // np.maximum(q + 1, 1),
            r + (pos - cutoff) // np.maximum(q, 1)) + 1
        # value ranks: re-sort each user segment by cents (global idx
        # keeps max.accumulate monotone across user boundaries)
        o = np.lexsort((cents, uid))
        uid2, cents2 = uid[o], cents[o]
        first2 = np.r_[True, uid2[1:] != uid2[:-1]]
        newval = first2 | np.r_[False, cents2[1:] != cents2[:-1]]
        idx2 = np.arange(n, dtype=np.int64)
        start2 = np.maximum.accumulate(np.where(first2, idx2, 0))
        cnv = np.cumsum(newval)
        dense2 = cnv - np.maximum.accumulate(
            np.where(first2, cnv - 1, 0))
        first_occ = np.maximum.accumulate(np.where(newval, idx2, 0))
        rank2 = first_occ - start2 + 1
        dense = np.empty(n, dtype=np.int64)
        rank = np.empty(n, dtype=np.int64)
        dense[o] = dense2
        rank[o] = rank2
        pct = np.where(n_user > 1,
                       (rank - 1) * 1_000_000 // np.maximum(n_user - 1, 1),
                       0)
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "row_num": pa.array(row_num, pa.int64()),
            "dense_rank_cents": pa.array(dense, pa.int64()),
            "ntile4": pa.array(ntile, pa.int64()),
            "pct_rank_ppm": pa.array(pct, pa.int64()),
        })

    return ds.map_batches(add_bucket, batch_format="pyarrow",
                          batch_size=65536) \
             .groupby("bucket") \
             .map_groups(per_bucket, batch_format="pandas") \
             .sort("event_id")


def stratified_sample(sf_dir: str, en_pct: int = 20, other_pct: int = 10):
    """Deterministic stratified corpus sample — the training-data mixing
    primitive (per-stratum rates without a shuffle or an RNG): a doc is
    kept iff its content-free md5 bucket falls under its language's
    rate, so the sample is stable across runs, machines and engines
    (the SQL oracle reruns the identical arithmetic). Stateless
    vectorized map; scales as a pure filter."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def keep(batch: pa.Table) -> pa.Table:
        bucket = _md5_bucket(batch["doc_id"])
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        rate = np.where(lang == "en", en_pct, other_pct)
        t = batch.filter(pa.array(bucket < rate))
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"]})

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def customer_urgent_counts(sf_dir: str, num_buckets: int = 64):
    """LEFT OUTER join: every customer with its count of URGENT orders
    (zero-filled — the outer-family member next to the inner/broadcast/
    as-of/range/anti joins). Same partitioned co-group shape as
    ``anti_join_customers``, but the probe side pre-aggregates per
    (bucket, key) inside ``map_batches`` first, so the shuffle carries
    one count row per customer per batch, not one row per order."""
    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def cust_rows(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "key": keys,
            "cnt": pa.nulls(len(keys), pa.int64()),  # null marks cust side
        })

    def urgent_partials(batch: pa.Table) -> pa.Table:
        keys = batch.filter(pc.equal(batch["o_orderpriority"],
                                     "1-URGENT"))["o_custkey"]
        g = pa.TableGroupBy(pa.table({"key": keys}), "key").aggregate(
            [("key", "count")])
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(g["key"], num_buckets - 1),
                              pa.int32()),
            "key": g["key"],
            "cnt": pc.cast(g["key_count"], pa.int64()),
        })

    both = cust.map_batches(cust_rows, batch_format="pyarrow",
                            batch_size=65536).union(
        orders.map_batches(urgent_partials, batch_format="pyarrow",
                           batch_size=65536))

    def left_bucket(group) -> pa.Table:
        is_cust = group["cnt"].isna()
        counts = group[~is_cust].groupby("key")["cnt"].sum()
        keys = group.loc[is_cust, "key"].to_numpy()
        n = counts.reindex(keys, fill_value=0).to_numpy()
        return pa.table({
            "c_custkey": pa.array(keys, pa.int64()),
            "n_urgent": pa.array(n.astype(np.int64)),
        })

    return both.groupby("bucket").map_groups(
        left_bucket, batch_format="pandas").sort("c_custkey")


def q3_top_orders(sf_dir: str, num_buckets: int = 64, k: int = 10):
    """TPC-H Q3 shape: the three-table join customer ⋈ orders ⋈ lineitem
    with per-side filters, grouped revenue per order and a global top-k.
    Composition of the repo's join primitives: the filtered customer key
    set broadcasts once (customer is the smallest dimension — same shape
    as mktsegment_order_stats); orders and pre-aggregated lineitem rows
    meet in a bucketed hash co-group on orderkey (same shape as
    order_priority_revenue); per-bucket partial top-k keeps the final
    sort k-sized. Revenue is the exact 4-decimal x10000 integer.
    Output: (l_orderkey, revenue_x10000, o_orderdate_days)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust.filter(expr="c_mktsegment == 'BUILDING'") \
               .select_columns(["c_custkey"]).to_pandas()["c_custkey"]
    keyset_ref = ray.put(np.sort(keys.to_numpy()))
    cutoff_us = np.datetime64("1996-06-01", "us").astype(np.int64)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        ks = ray.get(keyset_ref)
        od_us = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        keep = (od_us < cutoff_us) & np.isin(ck, ks)
        okeys = batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "bucket": pa.array((okeys % num_buckets).astype(np.int32)),
            "key": pa.array(okeys),
            "odate_days": pa.array(od_us[keep] // 86_400_000_000),
            "rev": pa.nulls(len(okeys), pa.float64()),
        })

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        sd_us = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(sd_us > cutoff_us))
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"]))
        g = pa.TableGroupBy(pa.table({"key": sel["l_orderkey"],
                                      "rev": rev}),
                            "key").aggregate([("rev", "sum")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "odate_days": pa.nulls(g.num_rows, pa.int64()),
            "rev": g["rev_sum"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(lineitem_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_topk(group) -> pa.Table:
        is_order = group["odate_days"].notna()
        odate = dict(zip(group.loc[is_order, "key"],
                         group.loc[is_order, "odate_days"]))
        li = group[~is_order]
        li = li[li["key"].isin(odate.keys())]
        if li.empty:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "revenue_x10000": pa.array([], pa.int64()),
                             "o_orderdate_days": pa.array([], pa.int64())})
        g = li.groupby("key", as_index=False).agg(rev=("rev", "sum"))
        g["revenue_x10000"] = (g["rev"] * 10_000.0).round().astype(
            "int64")
        g = g.sort_values(["revenue_x10000", "key"],
                          ascending=[False, True]).head(k)
        return pa.table({
            "l_orderkey": pa.array(g["key"], pa.int64()),
            "revenue_x10000": pa.array(g["revenue_x10000"], pa.int64()),
            "o_orderdate_days": pa.array(
                [int(odate[x]) for x in g["key"]], pa.int64()),
        })

    partials = both.groupby("bucket").map_groups(merge_topk,
                                                 batch_format="pandas")
    return partials.sort(["revenue_x10000", "l_orderkey"],
                         descending=[True, False]).limit(k)


def funnel_conversions(sf_dir: str, from_type: str = "view",
                       to_type: str = "purchase",
                       window_min: int = 60, num_buckets: int = 64):
    """Event-funnel operator: per user, the number of ``from_type``
    events followed by a ``to_type`` event by the same user within the
    window (strictly after, inclusive end — EXISTS semantics, each
    source event counted once). One shuffle: bucket by user hash, then
    a fully vectorized per-bucket kernel — composite int64 keys
    ``user_id << 44 | ts_rel`` make the same-user-in-window test two
    ``np.searchsorted`` calls over the sorted purchase keys (the 30-day
    synthetic window fits 44 bits; a production deployment re-derives
    the shift from the partition's time span). No per-user Python, no
    driver materialization. Output: (user_id, n_converted), users with
    at least one conversion."""
    events = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    window_us = window_min * 60_000_000

    def add_bucket(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == from_type) | (et == to_type)
        sel = batch.filter(pa.array(keep))
        uid = sel["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((uid % num_buckets).astype(np.int32)),
            "user_id": sel["user_id"],
            "ts_us": sel["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "is_target": pa.array(
                sel["event_type"].to_numpy(zero_copy_only=False)
                == to_type),
        })

    def per_bucket(group) -> pa.Table:
        uid = group["user_id"].to_numpy()
        ts = group["ts_us"].to_numpy()
        tgt = group["is_target"].to_numpy()
        base = ts.min() if len(ts) else 0
        key = (uid.astype(np.int64) << 44) | (ts - base)
        bkeys = np.sort(key[tgt])
        akeys = key[~tgt]
        lo = np.searchsorted(bkeys, akeys, side="right")
        hi = np.searchsorted(bkeys, akeys + window_us, side="right")
        conv = hi > lo
        users, counts = np.unique(uid[~tgt][conv], return_counts=True)
        return pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n_converted": pa.array(counts, pa.int64()),
        })

    return events.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .sort("user_id")


def q5_local_supplier_revenue(sf_dir: str, region: str = "ASIA",
                              num_buckets: int = 64):
    """TPC-H Q5 shape: six-table join — region/nation prune the
    dimension chain on the driver (25 + 5 rows), supplier and customer
    key→nation maps broadcast once (``ray.put``; the two smallest
    dimensions, same precedent as mktsegment_order_stats), and the two
    fact tables meet in ONE bucketed co-group on orderkey with the
    lineitem side pre-aggregated per (orderkey, supplier nation) per
    batch. The local-supplier predicate (customer nation == supplier
    nation) applies inside the bucket kernel. Revenue per nation as the
    exact x10000 integer. Output: (n_name, revenue_x10000) desc."""
    nation = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rkey = int(reg.loc[reg.r_name == region, "r_regionkey"].iloc[0])
    asia = nation[nation.n_regionkey == rkey]
    names = dict(zip(asia.n_nationkey.astype(int), asia.n_name))
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp.s_nationkey.isin(names)]
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust.c_nationkey.isin(names)]
    supp_ref = ray.put(dict(zip(supp.s_suppkey.astype(int),
                                supp.s_nationkey.astype(int))))
    cust_ref = ray.put(dict(zip(cust.c_custkey.astype(int),
                                cust.c_nationkey.astype(int))))
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1997-01-01", "us").astype(np.int64)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])

    def order_rows(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cust_ref)
        od = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (od >= lo_us) & (od < hi_us)
        sel = batch.filter(pa.array(keep))
        ck = sel["o_custkey"].to_numpy(zero_copy_only=False)
        cn = np.array([cmap.get(int(c), -1) for c in ck], np.int64)
        sel = sel.filter(pa.array(cn >= 0))
        ok = sel["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": sel["o_orderkey"],
            "nat": pa.array(cn[cn >= 0]),
            "rev": pa.nulls(len(ok), pa.float64()),
        })

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        smap = ray.get(supp_ref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = np.array([smap.get(int(s), -1) for s in sk], np.int64)
        sel = batch.filter(pa.array(sn >= 0))
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"]))
        t = pa.table({"key": sel["l_orderkey"],
                      "nat": pa.array(sn[sn >= 0]), "rev": rev})
        g = pa.TableGroupBy(t, ["key", "nat"]).aggregate([("rev", "sum")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "nat": g["nat"],
            "rev": g["rev_sum"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(lineitem_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["rev"].isna()
        cnat = dict(zip(group.loc[is_order, "key"],
                        group.loc[is_order, "nat"]))
        li = group[~is_order]
        li = li[[cnat.get(k, -1) == n
                 for k, n in zip(li["key"], li["nat"])]]
        if li.empty:
            return pa.table({"nat": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        g = li.groupby("nat", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"nat": pa.array(g["nat"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.float64())})

    agg = both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby("nat").aggregate(Sum("rev", alias_name="rev"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": pa.array([names[int(n)]
                                for n in t["nat"].to_pylist()],
                               pa.string()),
            "revenue_x10000": pc.round(
                pc.multiply(t["rev"], 10_000.0), 0).cast(pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow") \
        .sort(["revenue_x10000", "n_name"], descending=[True, False])


def q7_nation_volume(sf_dir: str, nation_a: str = "NATION_1",
                     nation_b: str = "NATION_2", num_buckets: int = 64):
    """TPC-H Q7 shape: shipping volume between two nations by year.
    supplier/customer key→nation maps for JUST the two nations broadcast
    once; lineitem pre-aggregates per (orderkey, supp-nation, ship-year)
    per batch; orders rows carry the customer nation; the two fact sides
    meet in one bucketed co-group on orderkey where the cross-nation
    predicate applies. Output: (supp_nation, cust_nation, l_year,
    revenue_x10000) ordered by the three keys."""
    nation = _read(sf_dir, "nation").to_pandas()
    two = nation[nation.n_name.isin([nation_a, nation_b])]
    names = dict(zip(two.n_nationkey.astype(int), two.n_name))
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp.s_nationkey.isin(names)]
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust.c_nationkey.isin(names)]
    supp_ref = ray.put(dict(zip(supp.s_suppkey.astype(int),
                                supp.s_nationkey.astype(int))))
    cust_ref = ray.put(dict(zip(cust.c_custkey.astype(int),
                                cust.c_nationkey.astype(int))))
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1998-01-01", "us").astype(np.int64)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cust_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cn = np.array([cmap.get(int(c), -1) for c in ck], np.int64)
        sel = batch.filter(pa.array(cn >= 0))
        ok = sel["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": sel["o_orderkey"],
            "nat": pa.array(cn[cn >= 0]),
            "year": pa.nulls(len(ok), pa.int64()),
            "rev": pa.nulls(len(ok), pa.float64()),
        })

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        smap = ray.get(supp_ref)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array((sd >= lo_us) & (sd < hi_us)))
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        sn = np.array([smap.get(int(s), -1) for s in sk], np.int64)
        sel = batch.filter(pa.array(sn >= 0))
        year = (sel["l_shipdate"].cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970)
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"]))
        t = pa.table({"key": sel["l_orderkey"],
                      "nat": pa.array(sn[sn >= 0]),
                      "year": pa.array(year), "rev": rev})
        g = pa.TableGroupBy(t, ["key", "nat", "year"]).aggregate(
            [("rev", "sum")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"], "nat": g["nat"], "year": g["year"],
            "rev": g["rev_sum"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(lineitem_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["rev"].isna()
        cnat = dict(zip(group.loc[is_order, "key"],
                        group.loc[is_order, "nat"]))
        li = group[~is_order]
        cn = np.array([cnat.get(k, -1) for k in li["key"]], np.int64)
        mask = (cn >= 0) & (cn != li["nat"].to_numpy())
        li = li[mask]
        if li.empty:
            return pa.table({"snat": pa.array([], pa.int64()),
                             "cnat": pa.array([], pa.int64()),
                             "l_year": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        g = li.assign(cnat=cn[mask]).groupby(
            ["nat", "cnat", "year"], as_index=False).agg(
            rev=("rev", "sum"))
        return pa.table({"snat": pa.array(g["nat"], pa.int64()),
                         "cnat": pa.array(g["cnat"], pa.int64()),
                         "l_year": pa.array(g["year"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.float64())})

    agg = both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby(["snat", "cnat", "l_year"]) \
        .aggregate(Sum("rev", alias_name="rev"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": pa.array(
                [names[int(n)] for n in t["snat"].to_pylist()],
                pa.string()),
            "cust_nation": pa.array(
                [names[int(n)] for n in t["cnat"].to_pylist()],
                pa.string()),
            "l_year": t["l_year"],
            "revenue_x10000": pc.round(
                pc.multiply(t["rev"], 10_000.0), 0).cast(pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow") \
        .sort(["supp_nation", "cust_nation", "l_year"])


def q10_returned_items(sf_dir: str, k: int = 20, num_buckets: int = 64):
    """TPC-H Q10 shape: returned-item revenue per customer, top-k with
    customer attributes. Returned lineitems pre-aggregate per orderkey
    per batch; quarter-filtered orders map orderkey→custkey; both meet
    in a bucketed co-group; a small groupby(custkey) + partial top-k
    follows; the k winners' names/balances/nations attach on the driver
    (k rows — never a shuffle). Output: (c_custkey, c_name,
    revenue_x10000, c_acctbal_x100, n_name)."""
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1996-04-01", "us").astype(np.int64)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_extendedprice", "l_discount",
                      "l_returnflag"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array((od >= lo_us) & (od < hi_us)))
        ok = sel["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": sel["o_orderkey"],
            "cust": sel["o_custkey"],
            "rev": pa.nulls(len(ok), pa.float64()),
        })

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"]))
        g = pa.TableGroupBy(pa.table({"key": sel["l_orderkey"],
                                      "rev": rev}),
                            "key").aggregate([("rev", "sum")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "cust": pa.nulls(g.num_rows, pa.int64()),
            "rev": g["rev_sum"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(lineitem_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["rev"].isna()
        cust = dict(zip(group.loc[is_order, "key"],
                        group.loc[is_order, "cust"]))
        li = group[~is_order]
        ck = np.array([cust.get(kk, -1) for kk in li["key"]], np.int64)
        li = li[ck >= 0]
        if li.empty:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        g = li.assign(c_custkey=ck[ck >= 0]).groupby(
            "c_custkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({"c_custkey": pa.array(g["c_custkey"], pa.int64()),
                         "rev": pa.array(g["rev"], pa.float64())})

    agg = both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby("c_custkey").aggregate(Sum("rev", alias_name="rev"))

    def partial_topk(t: pa.Table) -> pa.Table:
        rev = pc.round(pc.multiply(t["rev"], 10_000.0), 0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -rev))[: min(k, len(rev))]
        return pa.table({"c_custkey": pa.array(ck[order]),
                         "revenue_x10000": pa.array(rev[order])})

    top = agg.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["revenue_x10000", "c_custkey"],
              descending=[True, False]).limit(k).to_pandas()
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey",
                  "c_acctbal"]).to_pandas()
    cust = cust[cust.c_custkey.isin(top.c_custkey)] \
        .set_index("c_custkey")
    nation = _read(sf_dir, "nation").to_pandas() \
        .set_index("n_nationkey")["n_name"]
    return pa.table({
        "c_custkey": pa.array(top.c_custkey, pa.int64()),
        "c_name": pa.array(
            [cust.loc[c, "c_name"] for c in top.c_custkey], pa.string()),
        "revenue_x10000": pa.array(top.revenue_x10000, pa.int64()),
        "c_acctbal_x100": pa.array(
            [int(round(cust.loc[c, "c_acctbal"] * 100.0))
             for c in top.c_custkey], pa.int64()),
        "n_name": pa.array(
            [nation[int(cust.loc[c, "c_nationkey"])]
             for c in top.c_custkey], pa.string()),
    })


def q18_large_orders(sf_dir: str, threshold: float = 200.0,
                     k: int = 100):
    """TPC-H Q18 shape: large-volume orders — a HAVING filter over the
    per-orderkey quantity sum semi-joins back into orders. lineitem
    pre-aggregates per batch, one groupby(orderkey) carries one row per
    key per batch, the HAVING survivors (a tiny set) broadcast into an
    orders scan; names attach on the driver for the k winners. Output:
    (c_custkey, o_orderkey, o_orderdate_days, o_totalprice_x100,
    sum_qty_x100) ordered by totalprice desc."""
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, "l_orderkey").aggregate(
            [("l_quantity", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "qty": g["l_quantity_sum"]})

    sums = lineitem.map_batches(qty_partial, batch_format="pyarrow",
                                batch_size=65536) \
        .groupby("l_orderkey").aggregate(Sum("qty", alias_name="qty"))
    big = sums.filter(expr=f"qty > {threshold}").to_pandas()
    qty_map = dict(zip(big.l_orderkey.astype(int), big.qty))
    keys_ref = ray.put(np.sort(big.l_orderkey.to_numpy()))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])

    def order_rows(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(np.isin(ok, ks)))
        od_days = (sel["o_orderdate"].cast(pa.timestamp("us"))
                   .cast(pa.int64()).to_numpy(zero_copy_only=False)
                   // 86_400_000_000)
        return pa.table({
            "c_custkey": sel["o_custkey"],
            "o_orderkey": sel["o_orderkey"],
            "o_orderdate_days": pa.array(od_days),
            "o_totalprice_x100": pc.round(
                pc.multiply(sel["o_totalprice"], 100.0), 0)
            .cast(pa.int64()),
        })

    top = orders.map_batches(order_rows, batch_format="pyarrow",
                             batch_size=65536) \
        .sort(["o_totalprice_x100", "o_orderkey"],
              descending=[True, False]).limit(k).to_pandas()
    return pa.table({
        "c_custkey": pa.array(top.c_custkey, pa.int64()),
        "o_orderkey": pa.array(top.o_orderkey, pa.int64()),
        "o_orderdate_days": pa.array(top.o_orderdate_days, pa.int64()),
        "o_totalprice_x100": pa.array(top.o_totalprice_x100, pa.int64()),
        "sum_qty_x100": pa.array(
            [int(round(qty_map[int(o)] * 100.0))
             for o in top.o_orderkey], pa.int64()),
    })


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicates over
    lineitem ⋈ part. Each OR-branch reduces the part side to a sorted
    broadcast key array (brand + size window); per lineitem batch the
    branch test is one np.isin + a quantity band; scalar partials sum to
    one row. Output: (revenue_x10000,)."""
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).to_pandas()
    branches = [("Brand#1", 1, 5, 1.0, 11.0),
                ("Brand#2", 1, 10, 10.0, 20.0),
                ("Brand#3", 1, 15, 20.0, 30.0)]
    keys = [np.sort(part.loc[(part.p_brand == b)
                             & (part.p_size >= s0)
                             & (part.p_size <= s1),
                             "p_partkey"].to_numpy())
            for b, s0, s1, _q0, _q1 in branches]
    keys_ref = ray.put(keys)
    qbands = [(q0, q1) for _b, _s0, _s1, q0, q1 in branches]
    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_quantity", "l_extendedprice",
                      "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(pk), bool)
        for branch_keys, (q0, q1) in zip(ks, qbands):
            keep |= np.isin(pk, branch_keys) & (qty >= q0) & (qty <= q1)
        sel = batch.filter(pa.array(keep))
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"]))
        return pa.table({"rev": pa.array(
            [float(pc.sum(rev).as_py() or 0.0)])})

    agg = lineitem.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536).aggregate(Sum("rev"))
    return pa.table({"revenue_x10000": pa.array(
        [int(round((agg["sum(rev)"] or 0.0) * 10_000.0))], pa.int64())})


def event_lag_deltas(sf_dir: str, num_buckets: int = 64):
    """Window-function operator (lag): per user, the count and exact sum
    (microseconds) of gaps between consecutive events ordered by
    (ts, event_id). One shuffle: bucket by user hash; the per-bucket
    kernel is one lexsort + np.diff with a same-user mask — no per-user
    Python, integer-exact output (no float policy needed). Output:
    (user_id, n_gaps, sum_gap_us)."""
    events = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((uid % num_buckets).astype(np.int32)),
            "user_id": batch["user_id"],
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "event_id": batch["event_id"],
        })

    def per_bucket(group) -> pa.Table:
        uid = group["user_id"].to_numpy()
        ts = group["ts_us"].to_numpy()
        eid = group["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        same = uid[1:] == uid[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        u = uid[1:][same]  # already uid-sorted → segment-reduce exactly
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64()),
                             "sum_gap_us": pa.array([], pa.int64())})
        bounds = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        return pa.table({
            "user_id": pa.array(u[bounds], pa.int64()),
            "n_gaps": pa.array(np.diff(np.r_[bounds, len(u)]), pa.int64()),
            "sum_gap_us": pa.array(np.add.reduceat(gaps, bounds),
                                   pa.int64()),
        })

    return events.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .sort("user_id")


def q4_order_priority(sf_dir: str, num_buckets: int = 64):
    """TPC-H Q4 shape: order counts per priority where EXISTS a lineitem
    shipped after the order date (the available-column analogue of Q4's
    commit/receipt predicate). Both sides pre-reduce per batch — orders
    to (key, priority), lineitem to its per-orderkey MAX shipdate — so
    the bucketed co-group sees one row per key per side per batch; the
    EXISTS test is one vectorized compare per bucket. Output:
    (o_orderpriority, n_orders)."""
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1996-04-01", "us").astype(np.int64)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array((od >= lo_us) & (od < hi_us)))
        ok = sel["o_orderkey"].to_numpy(zero_copy_only=False)
        od = sel["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": sel["o_orderkey"],
            "prio": sel["o_orderpriority"],
            "odate_us": od,
            "max_ship_us": pa.nulls(len(ok), pa.int64()),
        })

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
        g = pa.TableGroupBy(pa.table({"key": batch["l_orderkey"],
                                      "sd": sd}),
                            "key").aggregate([("sd", "max")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "prio": pa.nulls(g.num_rows, pa.string()),
            "odate_us": pa.nulls(g.num_rows, pa.int64()),
            "max_ship_us": g["sd_max"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(lineitem_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_li = group["prio"].isna()
        li = group[is_li].groupby("key", as_index=False).agg(
            ms=("max_ship_us", "max"))
        ship = dict(zip(li["key"], li["ms"]))
        od = group[~is_li]
        keep = np.array([ship.get(k, -1) > d
                         for k, d in zip(od["key"], od["odate_us"])])
        if not keep.any():
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64())})
        g = od[keep].groupby("prio", as_index=False).agg(
            n=("key", "count"))
        return pa.table({"o_orderpriority": pa.array(g["prio"]),
                         "n_orders": pa.array(g["n"], pa.int64())})

    return both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("n_orders", alias_name="n_orders")) \
        .sort("o_orderpriority")


def q22_global_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape: customers with above-average positive balance
    and NO urgent orders, counted per nation. The scalar subquery
    (global avg over positive balances) is one streaming aggregate; the
    NOT EXISTS side broadcasts the distinct urgent-order customer keys
    (bounded by |customer|) as a sorted array; the final count is a
    small groupby. Output: (n_name, n_cust, acctbal_sum_x100)."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal[bal > 0.0]
        return pa.table({"s": pa.array([float(pos.sum())]),
                         "n": pa.array([len(pos)])})

    agg = cust.map_batches(bal_partial, batch_format="pyarrow",
                           batch_size=65536).aggregate(Sum("s"), Sum("n"))
    avg_bal = (agg["sum(s)"] or 0.0) / max(int(agg["sum(n)"] or 0), 1)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def cust_partial(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["o_orderpriority"],
                                    "1-URGENT"))
        return pa.table({"o_custkey": pc.unique(sel["o_custkey"])})

    have_orders = orders.map_batches(cust_partial,
                                     batch_format="pyarrow",
                                     batch_size=65536).unique("o_custkey")
    have_ref = ray.put(np.sort(np.array(have_orders, np.int64)))
    nation = _read(sf_dir, "nation").to_pandas()
    names = dict(zip(nation.n_nationkey.astype(int), nation.n_name))

    def pick(batch: pa.Table) -> pa.Table:
        hv = ray.get(have_ref)
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        keep = (bal > avg_bal) & ~np.isin(ck, hv)
        sel = batch.filter(pa.array(keep))
        g = pa.TableGroupBy(pa.table({
            "nat": sel["c_nationkey"],
            "bal": sel["c_acctbal"],
        }), "nat").aggregate([("bal", "sum"), ("bal", "count")])
        return pa.table({"nat": g["nat"], "s": g["bal_sum"],
                         "n": g["bal_count"]})

    out = cust.map_batches(pick, batch_format="pyarrow",
                           batch_size=65536) \
        .groupby("nat").aggregate(Sum("s", alias_name="s"),
                                  Sum("n", alias_name="n"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": pa.array([names[int(x)]
                                for x in t["nat"].to_pylist()]),
            "n_cust": t["n"].cast(pa.int64()),
            "acctbal_sum_x100": pc.round(
                pc.multiply(t["s"], 100.0), 0).cast(pa.int64()),
        })

    return out.map_batches(finalize, batch_format="pyarrow") \
        .sort("n_name")


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: lineitem ⋈ part with the part side reduced to a
    broadcast promo-partkey array (``np.isin`` per batch — the part
    dimension never shuffles), per-batch scalar partials, one-row
    result. The promo ratio divides the two already-exact x10000
    integers (floor ppm — integer arithmetic both sides, see the float
    policy). Output: (promo_x10000, total_x10000, promo_ppm)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(np.sort(
        part.loc[part.p_type == "PROMO", "p_partkey"].to_numpy()))
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1996-02-01", "us").astype(np.int64)
    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        promo = ray.get(promo_ref)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array((sd >= lo_us) & (sd < hi_us)))
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"])) \
            .to_numpy(zero_copy_only=False)
        is_promo = np.isin(sel["l_partkey"].to_numpy(
            zero_copy_only=False), promo)
        return pa.table({
            "promo": pa.array([float(rev[is_promo].sum())]),
            "total": pa.array([float(rev.sum())]),
        })

    agg = lineitem.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536) \
        .aggregate(Sum("promo"), Sum("total"))
    promo_i = int(round(agg["sum(promo)"] * 10_000.0))
    total_i = int(round(agg["sum(total)"] * 10_000.0))
    return pa.table({
        "promo_x10000": pa.array([promo_i], pa.int64()),
        "total_x10000": pa.array([total_i], pa.int64()),
        "promo_ppm": pa.array([promo_i * 1_000_000 // total_i],
                              pa.int64()),
    })


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: pure scan-filter-sum over lineitem — no shuffle,
    no join; each batch reduces to one scalar partial and the global
    ``Sum`` sees one row per batch. The discount band compares on the
    exact x100 integer (discounts have 2 decimals; float BETWEEN on
    0.05..0.07 is representation-dependent, the scaled int is not).
    Output: (revenue_x10000,)."""
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1997-01-01", "us").astype(np.int64)
    lineitem = _read(sf_dir, "lineitem",
                     ["l_shipdate", "l_discount", "l_quantity",
                      "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        d100 = np.rint(disc * 100.0).astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = ((sd >= lo_us) & (sd < hi_us)
                & (d100 >= 5) & (d100 <= 7) & (qty < 24.0))
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"rev": pa.array(
            [float((ep[keep] * disc[keep]).sum())])})

    agg = lineitem.map_batches(partial, batch_format="pyarrow",
                               batch_size=65536).aggregate(Sum("rev"))
    return pa.table({"revenue_x10000": pa.array(
        [int(round((agg["sum(rev)"] or 0.0) * 10_000.0))], pa.int64())})


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape: customer ⟕ orders count distribution — the
    double aggregate. Orders pre-count per custkey per batch, one
    groupby(custkey) carries one row per key per batch, then the
    second groupby over the per-customer counts yields the (tiny)
    distribution. The LEFT-OUTER zero bucket is arithmetic, not a
    join: |customer| − |customers with a qualifying order| (every
    o_custkey is a customer FK), so the customer table contributes a
    single streaming count. The distribution result is bounded by the
    max orders-per-customer (double digits at any scale) — the only
    driver-side materialization. Output: (c_count, custdist) ordered
    by custdist desc, c_count desc."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.not_equal(batch["o_orderpriority"],
                                        "1-URGENT"))
        g = pa.TableGroupBy(sel.select(["o_custkey"]), "o_custkey") \
            .aggregate([([], "count_all")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "n": g["count_all"].cast(pa.int64())})

    per_cust = orders.map_batches(per_cust_partial,
                                  batch_format="pyarrow",
                                  batch_size=65536) \
        .groupby("o_custkey").aggregate(Sum("n", alias_name="n"))

    def dist_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(["n"]), "n") \
            .aggregate([([], "count_all")])
        return pa.table({"c_count": g["n"],
                         "custdist": g["count_all"].cast(pa.int64())})

    dist = per_cust.map_batches(dist_partial, batch_format="pyarrow",
                                batch_size=65536) \
        .groupby("c_count") \
        .aggregate(Sum("custdist", alias_name="custdist")) \
        .to_pandas()
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    zero = int(n_cust - dist.custdist.sum()
               + dist.loc[dist.c_count == 0, "custdist"].sum())
    dist = dist[dist.c_count != 0]
    out = pa.table({
        "c_count": pa.array(list(dist.c_count) + [0], pa.int64()),
        "custdist": pa.array(list(dist.custdist) + [zero], pa.int64()),
    })
    idx = pc.sort_indices(out, sort_keys=[("custdist", "descending"),
                                          ("c_count", "descending")])
    return out.take(idx)


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: max-revenue supplier(s) for a quarter — the
    argmax-with-ties view join. lineitem pre-sums revenue per suppkey
    per batch; one groupby(suppkey) yields the per-supplier table (its
    cardinality is |supplier|, stays distributed); the global max is a
    scalar aggregate over the exact x10000 integers (deterministic tie
    set — no float equality); the winner keys (≥1 row) broadcast into a
    supplier scan for names. Output: (s_suppkey, s_name,
    total_revenue_x10000) ordered by s_suppkey."""
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1996-04-01", "us").astype(np.int64)
    lineitem = _read(sf_dir, "lineitem",
                     ["l_suppkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array((sd >= lo_us) & (sd < hi_us)))
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"]))
        g = pa.TableGroupBy(pa.table({"k": sel["l_suppkey"],
                                      "rev": rev}),
                            "k").aggregate([("rev", "sum")])
        return pa.table({"l_suppkey": g["k"], "rev": g["rev_sum"]})

    per_supp = lineitem.map_batches(rev_partial, batch_format="pyarrow",
                                    batch_size=65536) \
        .groupby("l_suppkey").aggregate(Sum("rev", alias_name="rev")) \
        .map_batches(lambda t: pa.table({
            "l_suppkey": t["l_suppkey"],
            "total_revenue_x10000": pc.round(
                pc.multiply(t["rev"], 10_000.0), 0).cast(pa.int64()),
        }), batch_format="pyarrow")
    best = per_supp.max("total_revenue_x10000")
    winners = per_supp.filter(
        expr=f"total_revenue_x10000 == {int(best)}").to_pandas()
    rev_map = dict(zip(winners.l_suppkey.astype(int),
                       winners.total_revenue_x10000))
    keys_ref = ray.put(np.sort(winners.l_suppkey.to_numpy()))

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        sk = batch["s_suppkey"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(np.isin(sk, ks)))
        return pa.table({
            "s_suppkey": sel["s_suppkey"],
            "s_name": sel["s_name"],
            "total_revenue_x10000": pa.array(
                [rev_map[int(k)] for k in sel["s_suppkey"].to_pylist()],
                pa.int64()),
        })

    return supplier.map_batches(pick, batch_format="pyarrow") \
        .sort("s_suppkey")


def q2_min_cost_part(sf_dir: str):
    """TPC-H Q2 shape (schema-adapted — no partsupp table): the
    argmin-per-group join-back. For every brand, the single cheapest
    part with partkey as the deterministic tie-break, returned as the
    FULL row — the pattern Q2's min-supplycost correlated subquery
    needs. Per batch each group reduces to its local argmin row (sort
    inside the batch, first-per-key), so the groupby shuffles one row
    per brand per batch; the per-group finalize sees a handful of rows.
    2-decimal prices order identically as float64 on both engines; the
    output price is the exact x100 integer. Output: (p_brand,
    p_partkey, p_name, retailprice_x100) ordered by p_brand."""
    part = _read(sf_dir, "part",
                 ["p_brand", "p_partkey", "p_name", "p_retailprice"])

    def local_argmin(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[
            ("p_brand", "ascending"), ("p_retailprice", "ascending"),
            ("p_partkey", "ascending")])
        s = batch.take(idx)
        brands = s["p_brand"].to_numpy(zero_copy_only=False)
        first = np.concatenate([[0], np.nonzero(
            brands[1:] != brands[:-1])[0] + 1]) \
            if len(brands) else np.array([], np.int64)
        return s.take(pa.array(first, pa.int64()))

    def finalize(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[
            ("p_retailprice", "ascending"), ("p_partkey", "ascending")])
        row = group.take(idx[:1])
        return pa.table({
            "p_brand": row["p_brand"],
            "p_partkey": row["p_partkey"],
            "p_name": row["p_name"],
            "retailprice_x100": pc.round(
                pc.multiply(row["p_retailprice"], 100.0), 0)
            .cast(pa.int64()),
        })

    return part.map_batches(local_argmin, batch_format="pyarrow",
                            batch_size=65536) \
        .groupby("p_brand").map_groups(finalize, batch_format="pyarrow") \
        .sort("p_brand")


def q16_part_supplier_counts(sf_dir: str,
                             sizes: tuple = (1, 5, 9, 13),
                             excl_brand: str = "Brand#45"):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, size) with
    a NOT-IN supplier exclusion (negative balance stands in for the
    complaints predicate — the schema has no s_comment). The part side
    is pre-filtered by size/brand BEFORE broadcast, so only qualifying
    partkey→(brand,size) arrays ship (searchsorted lookup per batch);
    the excluded-supplier key set is a second, tiny broadcast. Each
    lineitem batch emits its DISTINCT (brand, size, suppkey) triples —
    the distinct partial — so the triple groupby shuffles one row per
    live triple per batch; a second pre-counted groupby yields the
    (brand, size) counts. Output: (p_brand, p_size, supplier_cnt)
    ordered by supplier_cnt desc, p_brand, p_size."""
    part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(t["p_size"].cast(pa.int64()),
                     value_set=pa.array(sizes, pa.int64())),
            pc.not_equal(t["p_brand"], excl_brand))
        return t.filter(keep)

    sel = part_ds.map_batches(prune, batch_format="pyarrow").to_pandas()
    order = np.argsort(sel.p_partkey.to_numpy())
    pk_ref = ray.put(sel.p_partkey.to_numpy()[order])
    brand_ref = ray.put(sel.p_brand.to_numpy()[order])
    size_ref = ray.put(sel.p_size.to_numpy()[order])
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    bad = supplier.filter(expr="s_acctbal < 0.0") \
        .select_columns(["s_suppkey"]).to_pandas().s_suppkey.to_numpy()
    bad_ref = ray.put(np.sort(bad))

    lineitem = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def triples(batch: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(lp, pk) & ~np.isin(ls, ray.get(bad_ref))
        lp, ls = lp[keep], ls[keep]
        pos = np.searchsorted(pk, lp)
        t = pa.table({
            "p_brand": pa.array(ray.get(brand_ref)[pos]),
            "p_size": pa.array(ray.get(size_ref)[pos], pa.int64()),
            "l_suppkey": pa.array(ls),
        })
        g = pa.TableGroupBy(t, ["p_brand", "p_size", "l_suppkey"]) \
            .aggregate([])
        return g

    distinct = lineitem.map_batches(triples, batch_format="pyarrow",
                                    batch_size=65536) \
        .groupby(["p_brand", "p_size", "l_suppkey"]) \
        .aggregate(Count(alias_name="_n")) \
        .drop_columns(["_n"])

    def count_partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(["p_brand", "p_size"]),
                            ["p_brand", "p_size"]) \
            .aggregate([([], "count_all")])
        return pa.table({"p_brand": g["p_brand"], "p_size": g["p_size"],
                         "supplier_cnt":
                         g["count_all"].cast(pa.int64())})

    return distinct.map_batches(count_partial, batch_format="pyarrow",
                                batch_size=65536) \
        .groupby(["p_brand", "p_size"]) \
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt")) \
        .sort(["supplier_cnt", "p_brand", "p_size"],
              descending=[True, False, False])


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#23"):
    """TPC-H Q17 shape: the correlated per-partkey average — revenue
    from lineitems whose quantity is below 20% of their part's average
    quantity, for one brand. Two passes over the (brand-pruned)
    lineitem scan: pass 1 builds per-partkey (sum_qty_x100, count)
    via per-batch partials + one small groupby (the brand selects
    ~1/|brands| of parts, so the threshold table is tiny and
    broadcasts); pass 2 applies ``5·qty_x100·cnt < sum_qty_x100``
    — the float-free restatement of qty < 0.2·avg — and scalar-sums
    the price. Integer arithmetic on both engines, no float division
    anywhere. Output: (avg_yearly_x100,) = total_x100 // 7."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    pk_ref = ray.put(np.sort(
        part.loc[part.p_brand == brand, "p_partkey"].to_numpy()))
    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(np.isin(lp, pk)))
        q100 = np.rint(sel["l_quantity"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        g = pa.TableGroupBy(pa.table({
            "l_partkey": sel["l_partkey"],
            "q": pa.array(q100),
        }), "l_partkey").aggregate([("q", "sum"), ("q", "count")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "sq": g["q_sum"],
                         "c": g["q_count"].cast(pa.int64())})

    thr = lineitem.map_batches(qty_partial, batch_format="pyarrow",
                               batch_size=65536) \
        .groupby("l_partkey").aggregate(Sum("sq", alias_name="sq"),
                                        Sum("c", alias_name="c")) \
        .to_pandas()
    order = np.argsort(thr.l_partkey.to_numpy())
    tpk_ref = ray.put(thr.l_partkey.to_numpy()[order])
    sq_ref = ray.put(thr.sq.to_numpy()[order].astype(np.int64))
    c_ref = ray.put(thr.c.to_numpy()[order].astype(np.int64))

    def rev_partial(batch: pa.Table) -> pa.Table:
        tpk = ray.get(tpk_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(lp, tpk)
        sel = batch.filter(pa.array(keep))
        lp = lp[keep]
        pos = np.searchsorted(tpk, lp)
        q100 = np.rint(sel["l_quantity"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        small = 5 * q100 * ray.get(c_ref)[pos] < ray.get(sq_ref)[pos]
        ep = sel["l_extendedprice"].to_numpy(
            zero_copy_only=False)[small]
        return pa.table({"rev": pa.array([float(ep.sum())])})

    agg = lineitem.map_batches(rev_partial, batch_format="pyarrow",
                               batch_size=65536).aggregate(Sum("rev"))
    total_x100 = int(round((agg["sum(rev)"] or 0.0) * 100.0))
    return pa.table({"avg_yearly_x100": pa.array(
        [total_x100 // 7], pa.int64())})


def q8_market_share(sf_dir: str, p_type: str = "STANDARD",
                    nation: str = "NATION_1", region: str = "ASIA",
                    num_buckets: int = 64):
    """TPC-H Q8 shape: national market share per order year — the
    many-dimension star join. Three dimension reductions broadcast
    once (type-matching partkeys; suppkey→in-target-nation booleans as
    a sorted key array + parallel flag array; region-resident custkeys
    via nation⋈region on the driver — both driver tables are
    25/5 rows); the two fact tables meet in a bucketed co-group on
    orderkey with BOTH sides pre-reduced per batch — lineitem to
    (key, rev_target, rev_total) partial sums, orders to (key, year).
    Share divides the exact x10000 integers (floor ppm). Output:
    (o_year, nation_x10000, total_x10000, share_ppm)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pk_ref = ray.put(np.sort(
        part.loc[part.p_type == p_type, "p_partkey"].to_numpy()))
    nat = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    target_nk = int(nat.loc[nat.n_name == nation, "n_nationkey"].iloc[0])
    rk = int(reg.loc[reg.r_name == region, "r_regionkey"].iloc[0])
    region_nks = set(nat.loc[nat.n_regionkey == rk, "n_nationkey"])

    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    so = np.argsort(supp.s_suppkey.to_numpy())
    sk_ref = ray.put(supp.s_suppkey.to_numpy()[so])
    target_ref = ray.put(
        (supp.s_nationkey.to_numpy()[so] == target_nk))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_keys(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"].cast(pa.int64()),
                        value_set=pa.array(sorted(region_nks),
                                           pa.int64()))
        return t.filter(keep).select(["c_custkey"])

    ck = cust.map_batches(cust_keys, batch_format="pyarrow") \
        .to_pandas().c_custkey.to_numpy()
    ck_ref = ray.put(np.sort(ck))
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1998-01-01", "us").astype(np.int64)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        oc = batch["o_custkey"].to_numpy(zero_copy_only=False)
        keep = (od >= lo_us) & (od < hi_us) \
            & np.isin(oc, ray.get(ck_ref))
        sel = batch.filter(pa.array(keep))
        years = pc.year(sel["o_orderdate"]).cast(pa.int64())
        ok = sel["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": sel["o_orderkey"],
            "o_year": years,
            "rev_t": pa.nulls(len(ok), pa.float64()),
            "rev_all": pa.nulls(len(ok), pa.float64()),
        })

    def li_partials(batch: pa.Table) -> pa.Table:
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(np.isin(lp, ray.get(pk_ref))))
        sk = ray.get(sk_ref)
        pos = np.searchsorted(sk, sel["l_suppkey"].to_numpy(
            zero_copy_only=False))
        is_t = ray.get(target_ref)[pos]
        rev = pc.multiply(sel["l_extendedprice"],
                          pc.subtract(1.0, sel["l_discount"])) \
            .to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(pa.table({
            "key": sel["l_orderkey"],
            "rt": pa.array(np.where(is_t, rev, 0.0)),
            "ra": pa.array(rev),
        }), "key").aggregate([("rt", "sum"), ("ra", "sum")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "o_year": pa.nulls(g.num_rows, pa.int64()),
            "rev_t": g["rt_sum"],
            "rev_all": g["ra_sum"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(li_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["o_year"].notna()
        years = dict(zip(group.loc[is_order, "key"],
                         group.loc[is_order, "o_year"]))
        li = group[~is_order]
        li = li[li["key"].isin(years.keys())]
        if li.empty:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "rev_t": pa.array([], pa.float64()),
                             "rev_all": pa.array([], pa.float64())})
        yr = li["key"].map(years)
        g = li.assign(o_year=yr).groupby("o_year", as_index=False) \
            .agg(rev_t=("rev_t", "sum"), rev_all=("rev_all", "sum"))
        return pa.table({
            "o_year": pa.array(g.o_year, pa.int64()),
            "rev_t": pa.array(g.rev_t, pa.float64()),
            "rev_all": pa.array(g.rev_all, pa.float64()),
        })

    out = both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby("o_year").aggregate(Sum("rev_t", alias_name="rev_t"),
                                     Sum("rev_all",
                                         alias_name="rev_all"))

    def finalize(t: pa.Table) -> pa.Table:
        nt = pc.round(pc.multiply(t["rev_t"], 10_000.0), 0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        tot = pc.round(pc.multiply(t["rev_all"], 10_000.0), 0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "o_year": t["o_year"],
            "nation_x10000": pa.array(nt),
            "total_x10000": pa.array(tot),
            "share_ppm": pa.array(nt * 1_000_000 // tot),
        })

    return out.map_batches(finalize, batch_format="pyarrow") \
        .sort("o_year")


def q21_waiting_supplier(sf_dir: str, late_days: int = 60,
                         num_buckets: int = 64):
    """TPC-H Q21 shape: suppliers who alone held up a finished
    multi-supplier order — the double-EXISTS anti-join (schema-adapted:
    lateness is shipdate > orderdate + ``late_days``; the schema has no
    commit/receipt dates). lineitem pre-reduces per batch to one
    (orderkey, suppkey, max_shipdate) row — the blamed-pair semantics
    count (supplier, order) PAIRS, so the max is a lossless reduction —
    and meets status-'F' orders in a bucketed co-group; per order the
    kernel is a vectorized unique-argmax test: supplier S is blamed iff
    the order has ≥2 suppliers, S is late, and no OTHER supplier is
    late. Blamed counts groupby per suppkey (tiny), names attach via a
    broadcast winner-key scan of supplier. Output: (s_name, numwait)
    ordered by numwait desc, s_name."""
    late_us = late_days * 86_400_000_000
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_shipdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["o_orderstatus"], "F"))
        od = sel["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        ok = sel["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": sel["o_orderkey"],
            "odate_us": od,
            "suppkey": pa.nulls(len(ok), pa.int64()),
            "max_ship_us": pa.nulls(len(ok), pa.int64()),
        })

    def li_partials(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64())
        g = pa.TableGroupBy(pa.table({
            "key": batch["l_orderkey"],
            "suppkey": batch["l_suppkey"],
            "sd": sd,
        }), ["key", "suppkey"]).aggregate([("sd", "max")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "odate_us": pa.nulls(g.num_rows, pa.int64()),
            "suppkey": g["suppkey"].cast(pa.int64()),
            "max_ship_us": g["sd_max"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(li_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["suppkey"].isna()
        odate = dict(zip(group.loc[is_order, "key"],
                         group.loc[is_order, "odate_us"]))
        li = group[~is_order]
        li = li[li["key"].isin(odate.keys())]
        if li.empty:
            return pa.table({"suppkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # one (key, suppkey, max_ship) row per pair after re-reduction
        li = li.groupby(["key", "suppkey"], as_index=False) \
            .agg(ms=("max_ship_us", "max"))
        li["late"] = li.ms > (li.key.map(odate) + late_us)
        g = li.groupby("key", as_index=False).agg(
            n_supp=("suppkey", "size"), n_late=("late", "sum"))
        meta = dict(zip(g.key, zip(g.n_supp, g.n_late)))
        ns = li.key.map(lambda k: meta[k][0])
        nl = li.key.map(lambda k: meta[k][1])
        blamed = li[li.late & (ns >= 2) & (nl == 1)]
        if blamed.empty:
            return pa.table({"suppkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        c = blamed.groupby("suppkey", as_index=False) \
            .agg(n=("key", "count"))
        return pa.table({"suppkey": pa.array(c.suppkey, pa.int64()),
                         "n": pa.array(c.n, pa.int64())})

    counts = both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby("suppkey").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    n_map = dict(zip(counts.suppkey.astype(int), counts.n))
    keys_ref = ray.put(np.sort(counts.suppkey.to_numpy()))

    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        sk = batch["s_suppkey"].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(np.isin(sk, ks)))
        return pa.table({
            "s_name": sel["s_name"],
            "numwait": pa.array(
                [int(n_map[int(k)])
                 for k in sel["s_suppkey"].to_pylist()], pa.int64()),
        })

    return supplier.map_batches(pick, batch_format="pyarrow") \
        .sort(["numwait", "s_name"], descending=[True, False])


def q12_late_shipments(sf_dir: str, late_days: int = 90,
                       num_buckets: int = 64):
    """TPC-H Q12 shape: two-way conditional counts after a large-large
    join — per lineitem return flag, how many LATE shipments (shipdate
    more than ``late_days`` past the order date) belong to high-priority
    orders vs the rest. Orders pre-reduce per batch to (key, is_high);
    lineitem to its per-(key, flag) max shipdate (lateness is monotone
    in shipdate, so the max is lossless for the per-pair test); the
    bucketed co-group applies one vectorized compare and the final
    groupby is flag-sized. Output: (l_returnflag, high_line_count,
    low_line_count) ordered by l_returnflag."""
    late_us = late_days * 86_400_000_000
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority",
                                      "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_returnflag", "l_shipdate"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64())
        prio = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = np.isin(prio, ["1-URGENT", "2-HIGH"])
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": batch["o_orderkey"],
            "odate_us": od,
            "high": pa.array(high),
            "flag": pa.nulls(len(ok), pa.string()),
            "max_ship_us": pa.nulls(len(ok), pa.int64()),
        })

    def li_partials(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64())
        g = pa.TableGroupBy(pa.table({
            "key": batch["l_orderkey"],
            "flag": batch["l_returnflag"],
            "sd": sd,
        }), ["key", "flag"]).aggregate([("sd", "max")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "odate_us": pa.nulls(g.num_rows, pa.int64()),
            "high": pa.nulls(g.num_rows, pa.bool_()),
            "flag": g["flag"],
            "max_ship_us": g["sd_max"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(li_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["flag"].isna()
        od = group[is_order]
        odate = dict(zip(od["key"], od["odate_us"]))
        ohigh = dict(zip(od["key"], od["high"]))
        li = group[~is_order]
        li = li[li["key"].isin(odate.keys())]
        if li.empty:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "high": pa.array([], pa.int64()),
                             "low": pa.array([], pa.int64())})
        li = li.groupby(["key", "flag"], as_index=False) \
            .agg(ms=("max_ship_us", "max"))
        late = li.ms > (li.key.map(odate) + late_us)
        sel = li[late].assign(is_high=li.key.map(ohigh)[late])
        g = sel.groupby("flag", as_index=False).agg(
            high=("is_high", "sum"), n=("is_high", "count"))
        return pa.table({
            "l_returnflag": pa.array(g.flag),
            "high": pa.array(g.high, pa.int64()),
            "low": pa.array(g.n - g.high, pa.int64()),
        })

    out = both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby("l_returnflag") \
        .aggregate(Sum("high", alias_name="high_line_count"),
                   Sum("low", alias_name="low_line_count")) \
        .sort("l_returnflag")
    return out


def pivot_user_events(sf_dir: str):
    """PIVOT: the long (user, event_type) stream becomes one wide row
    per user with a count column per type — the reshape operator
    (DuckDB PIVOT / pandas crosstab). The type domain is fixed and
    small (the precondition for any pivot); each batch scatters its
    per-(user, type) counts into the wide columns immediately, so the
    groupby shuffles wide partials — one row per user per batch — and
    never the long stream. Output: (user_id, n_click, n_error,
    n_purchase, n_signup, n_view) ordered by user_id."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, ["user_id", "event_type"]) \
            .aggregate([([], "count_all")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        cnt = g["count_all"].to_numpy(zero_copy_only=False)
        users, inv = np.unique(uid, return_inverse=True)
        wide = {f"n_{t}": np.zeros(len(users), np.int64) for t in types}
        for t in types:
            sel = et == t
            np.add.at(wide[f"n_{t}"], inv[sel], cnt[sel])
        cols = {"user_id": pa.array(users)}
        cols.update({k: pa.array(v) for k, v in wide.items()})
        return pa.table(cols)

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in types]
    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("user_id").aggregate(*aggs).sort("user_id")


def unpivot_user_events(sf_dir: str):
    """UNPIVOT (melt): the wide per-user count matrix back to long
    (user_id, event_type, n) rows — the inverse reshape of
    :func:`pivot_user_events`, composed on top of it (reshape operators
    chain without materialization). Each batch melts vectorized
    (np.repeat × np.tile), multiplying rows by the fixed column count —
    a constant fan-out, not a shuffle. Output ordered by user_id,
    event_type."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_user_events(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        counts = np.stack([batch[f"n_{t}"].to_numpy(zero_copy_only=False)
                           for t in types], axis=1)
        return pa.table({
            "user_id": pa.array(np.repeat(uid, len(types))),
            "event_type": pa.array(np.tile(np.array(types), len(uid))),
            "n": pa.array(counts.reshape(-1)),
        })

    return wide.map_batches(melt, batch_format="pyarrow",
                            batch_size=65536) \
        .sort(["user_id", "event_type"])


def json_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer field ``k`` out of
    the JSON ``props`` string and aggregate per event type. The hot
    path is one vectorized Arrow regex kernel (``pc.extract_regex``) —
    no per-row ``json.loads``; rows the fast pattern misses (exotic
    spacing/escapes) fall back to the real JSON parser so semantics
    stay json_extract-exact, and rows without the field drop (matching
    SQL NULL-skipping). Per-batch partials pre-reduce before the one
    tiny groupby. Output: (event_type, n_events, sum_k, avg_k_ppm)
    ordered by event_type."""
    import json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            batch["props"], r'^\{"k": (?P<k>-?\d+)\}$')
        k = pc.struct_field(m, "k")
        if k.null_count:
            # slow path only for rows the fast pattern missed
            vals = []
            for v, props in zip(k.to_pylist(),
                                batch["props"].to_pylist()):
                if v is not None:
                    vals.append(int(v))
                    continue
                try:
                    got = json.loads(props).get("k")
                except (TypeError, ValueError):
                    got = None
                vals.append(int(got) if isinstance(got, int) else None)
            karr = pa.array(vals, pa.int64())
        else:
            karr = k.cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": karr}) \
            .filter(pc.is_valid(karr))
        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("k", "sum"), ("k", "count")])
        return pa.table({
            "event_type": g["event_type"],
            "sum_k": g["k_sum"].cast(pa.int64()),
            "n_events": g["k_count"].cast(pa.int64()),
        })

    out = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("event_type") \
        .aggregate(Sum("sum_k", alias_name="sum_k"),
                   Sum("n_events", alias_name="n_events"))

    def finalize(t: pa.Table) -> pa.Table:
        s = t["sum_k"].to_numpy(zero_copy_only=False)
        n = t["n_events"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "n_events": t["n_events"],
            "sum_k": t["sum_k"],
            "avg_k_ppm": pa.array(s * 1_000_000 // n),
        })

    return out.map_batches(finalize, batch_format="pyarrow") \
        .sort("event_type")


def full_outer_user_activity(sf_dir: str, left_type: str = "click",
                             right_type: str = "purchase",
                             num_buckets: int = 32):
    """FULL OUTER join — the missing member of the repo's join family
    (broadcast, bucketed-inner, left-outer, anti, semi, as-of, range).
    Per-user click stats meet per-user purchase stats; users present on
    only one side survive with the other side's columns zeroed
    (COALESCE semantics, mirrored in the oracle). Both sides pre-reduce
    per batch to (user, n, sum) rows tagged with a side flag and hash
    into the same bucket column, so the shuffle carries partials only;
    the per-bucket kernel is one vectorized pandas outer-merge — no
    per-key Python. Output: (user_id, {left}_n, {left}_value_x100,
    {right}_n, {right}_value_x100) ordered by user_id."""
    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        out = []
        for side, etype in ((0, left_type), (1, right_type)):
            sel = batch.filter(pc.equal(batch["event_type"], etype))
            g = pa.TableGroupBy(
                sel.select(["user_id", "value"]), "user_id") \
                .aggregate([("value", "sum"), ("value", "count")])
            uid = g["user_id"].to_numpy(zero_copy_only=False)
            out.append(pa.table({
                "bucket": pa.array((uid % num_buckets).astype(np.int32)),
                "user_id": g["user_id"],
                "side": pa.array(np.full(len(uid), side, np.int8)),
                "s": g["value_sum"],
                "n": g["value_count"].cast(pa.int64()),
            }))
        return pa.concat_tables(out)

    both = ev.map_batches(partials, batch_format="pyarrow",
                          batch_size=65536)

    def merge_bucket(group) -> pa.Table:
        sides = []
        for side in (0, 1):
            s = group[group["side"] == side] \
                .groupby("user_id", as_index=False) \
                .agg(s=("s", "sum"), n=("n", "sum"))
            sides.append(s)
        m = sides[0].merge(sides[1], on="user_id", how="outer",
                           suffixes=("_l", "_r")).fillna(0.0)
        m = m.sort_values("user_id")
        return pa.table({
            "user_id": pa.array(m.user_id, pa.int64()),
            f"{left_type}_n": pa.array(m.n_l, pa.int64()),
            f"{left_type}_value_x100": pa.array(
                np.rint(m.s_l * 100.0), pa.int64()),
            f"{right_type}_n": pa.array(m.n_r, pa.int64()),
            f"{right_type}_value_x100": pa.array(
                np.rint(m.s_r * 100.0), pa.int64()),
        })

    return both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas").sort("user_id")

def q9_profit_by_nation_year(sf_dir: str, name_prefix: str = "red",
                             num_buckets: int = 64):
    """TPC-H Q9 shape (schema-adapted — no partsupp): product profit by
    supplier nation and order year. Part cost stands in as
    ``p_retailprice * l_quantity`` (the schema's only per-part cost
    column), so profit = extendedprice*(1-discount) - retailprice*qty.
    The two dimension sides prune on the driver and broadcast once:
    the name-filtered part subset (partkey → retailprice, ~1/8 of part)
    and the supplier key → nationkey map — both sorted parallel arrays
    for vectorized searchsorted lookup. The only fact-fact meet
    (lineitem ⋈ orders for the order year) is ONE bucketed co-group on
    orderkey with the lineitem side pre-aggregated per (orderkey,
    nation) per batch — the q5/q7 pattern. Per-row profit is a single
    IEEE subtract of two identically-computed products, so the amounts
    are bitwise equal across engines; the sum is emitted as the exact
    x10000 integer. Output: (nation, o_year, profit_x10000) ordered by
    nation, o_year desc."""
    nation = _read(sf_dir, "nation").to_pandas()
    names = dict(zip(nation.n_nationkey.astype(int), nation.n_name))
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    part = part[part.p_name.str.startswith(name_prefix)]
    pk = part.p_partkey.to_numpy()
    po = np.argsort(pk)
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = supp.s_suppkey.to_numpy()
    so = np.argsort(sk)
    part_ref = ray.put((pk[po], part.p_retailprice.to_numpy()[po]))
    supp_ref = ray.put((sk[so], supp.s_nationkey.to_numpy()[so]))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    lineitem = _read(sf_dir, "lineitem",
                     ["l_orderkey", "l_partkey", "l_suppkey",
                      "l_quantity", "l_extendedprice", "l_discount"])

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False)
        years = od.astype("M8[Y]").astype(np.int64) + 1970
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((ok % num_buckets).astype(np.int32)),
            "key": batch["o_orderkey"],
            "nat": pa.array(np.full(len(ok), -1, np.int64)),
            "amt": pa.array(years.astype(np.float64)),
        })

    def li_partials(batch: pa.Table) -> pa.Table:
        pkeys, pretail = ray.get(part_ref)
        skeys, snat = ray.get(supp_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pkeys, lp)
        pos_c = np.minimum(pos, len(pkeys) - 1)
        keep = pkeys[pos_c] == lp
        sel = batch.filter(pa.array(keep))
        if sel.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int64()),
                             "nat": pa.array([], pa.int64()),
                             "amt": pa.array([], pa.float64())})
        retail = pretail[pos_c[keep]]
        ls = sel["l_suppkey"].to_numpy(zero_copy_only=False)
        nat = snat[np.searchsorted(skeys, ls)]  # FK: always present
        amt = pc.subtract(
            pc.multiply(sel["l_extendedprice"],
                        pc.subtract(1.0, sel["l_discount"])),
            pc.multiply(pa.array(retail), sel["l_quantity"]))
        g = pa.TableGroupBy(
            pa.table({"key": sel["l_orderkey"],
                      "nat": pa.array(nat.astype(np.int64)),
                      "amt": amt}),
            ["key", "nat"]).aggregate([("amt", "sum")])
        kk = g["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array((kk % num_buckets).astype(np.int32)),
            "key": g["key"],
            "nat": g["nat"],
            "amt": g["amt_sum"],
        })

    both = orders.map_batches(order_rows, batch_format="pyarrow",
                              batch_size=65536).union(
        lineitem.map_batches(li_partials, batch_format="pyarrow",
                             batch_size=65536))

    def merge_bucket(group) -> pa.Table:
        is_order = group["nat"] == -1
        ymap = dict(zip(group.loc[is_order, "key"],
                        group.loc[is_order, "amt"]))
        li = group[~is_order]
        if li.empty:
            return pa.table({"nat": pa.array([], pa.int64()),
                             "o_year": pa.array([], pa.int64()),
                             "amt": pa.array([], pa.float64())})
        years = li["key"].map(ymap).astype(np.int64)
        g = li.assign(o_year=years).groupby(
            ["nat", "o_year"], as_index=False).agg(amt=("amt", "sum"))
        return pa.table({"nat": pa.array(g["nat"], pa.int64()),
                         "o_year": pa.array(g["o_year"], pa.int64()),
                         "amt": pa.array(g["amt"], pa.float64())})

    agg = both.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas") \
        .groupby(["nat", "o_year"]).aggregate(Sum("amt", alias_name="amt"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "nation": pa.array([names[int(n)]
                                for n in t["nat"].to_pylist()],
                               pa.string()),
            "o_year": t["o_year"],
            "profit_x10000": pc.round(
                pc.multiply(t["amt"], 10_000.0), 0).cast(pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow") \
        .sort(["nation", "o_year"], descending=[False, True])


def q11_important_parts(sf_dir: str, nation: str = "NATION_1",
                        mult: int = 2):
    """TPC-H Q11 shape (schema-adapted — lineitem value stands in for
    partsupp stock value): per-part shipped value from one nation's
    suppliers, kept only where the part share exceeds a fraction of
    the GLOBAL total — the group-HAVING-against-a-scalar-subquery
    pattern. The nation's supplier keys broadcast once (a sorted
    array); lineitem pre-sums value per partkey per batch; one
    groupby(partkey) yields the per-part table (cardinality |part|,
    stays distributed); the global total AND group count are scalar
    aggregates over the exact x100 integers; the HAVING filter keeps
    parts whose value exceeds ``mult``× the average per-part value —
    a scale-free threshold (TPC-H scales Q11's fraction by 1/SF for
    the same reason: any fixed fraction empties as |part| grows) in
    pure integer arithmetic (value_x100 * count > mult * total_x100).
    Output: (l_partkey, value_x100) ordered by value desc."""
    nat = _read(sf_dir, "nation").to_pandas()
    nkey = int(nat.loc[nat.n_name == nation, "n_nationkey"].iloc[0])
    supp = _read(sf_dir, "supplier",
                 ["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = np.sort(
        supp.loc[supp.s_nationkey == nkey, "s_suppkey"].to_numpy())
    supp_ref = ray.put(skeys)

    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(supp_ref)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ks, ls), len(ks) - 1) \
            if len(ks) else np.zeros(len(ls), np.int64)
        keep = ks[pos] == ls if len(ks) else np.zeros(len(ls), bool)
        sel = batch.filter(pa.array(keep))
        g = pa.TableGroupBy(
            sel.select(["l_partkey", "l_extendedprice"]),
            "l_partkey").aggregate([("l_extendedprice", "sum")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "value": g["l_extendedprice_sum"]})

    per_part = lineitem.map_batches(partial, batch_format="pyarrow",
                                    batch_size=65536) \
        .groupby("l_partkey").aggregate(Sum("value", alias_name="value")) \
        .map_batches(lambda t: pa.table({
            "l_partkey": t["l_partkey"],
            "value_x100": pc.round(
                pc.multiply(t["value"], 100.0), 0).cast(pa.int64()),
        }), batch_format="pyarrow")
    total = int(per_part.sum("value_x100") or 0)
    n_parts = int(per_part.count())
    # value_x100 * n > mult * total  ⟺  value_x100 ≥ cut (exact
    # integer division — no float threshold)
    cut = (mult * total) // max(n_parts, 1) + 1
    return per_part.filter(expr=f"value_x100 >= {cut}") \
        .sort(["value_x100", "l_partkey"], descending=[True, False])


def q20_potential_promotion(sf_dir: str, name_prefix: str = "blue",
                            nation: str = "NATION_1",
                            qty_threshold_x100: int = 3000):
    """TPC-H Q20 shape (schema-adapted — shipped quantity stands in for
    partsupp availqty): the nested-IN semi-join chain. Innermost: the
    name-filtered part keys (driver-pruned, broadcast as a sorted
    array). Middle: lineitems of those parts shipped in 1996,
    pre-summed per (suppkey, partkey) per batch, grouped, kept where
    the exact x100 quantity exceeds the threshold — the grouped-HAVING
    semi-join. Outer: the surviving supplier keys (bounded by
    |supplier|) broadcast into a supplier scan filtered to the target
    nation. Output: (s_suppkey, s_name) ordered by s_name."""
    nat = _read(sf_dir, "nation").to_pandas()
    nkey = int(nat.loc[nat.n_name == nation, "n_nationkey"].iloc[0])
    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    pkeys = np.sort(
        part.loc[part.p_name.str.startswith(name_prefix),
                 "p_partkey"].to_numpy())
    part_ref = ray.put(pkeys)
    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1997-01-01", "us").astype(np.int64)

    lineitem = _read(sf_dir, "lineitem",
                     ["l_partkey", "l_suppkey", "l_quantity",
                      "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(part_ref)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ks, lp), len(ks) - 1)
        keep = (ks[pos] == lp) & (sd >= lo_us) & (sd < hi_us)
        sel = batch.filter(pa.array(keep))
        qty = pc.round(pc.multiply(sel["l_quantity"], 100.0), 0) \
            .cast(pa.int64())
        g = pa.TableGroupBy(
            pa.table({"l_suppkey": sel["l_suppkey"],
                      "l_partkey": sel["l_partkey"], "q": qty}),
            ["l_suppkey", "l_partkey"]).aggregate([("q", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"],
                         "l_partkey": g["l_partkey"], "q": g["q_sum"]})

    winners = lineitem.map_batches(partial, batch_format="pyarrow",
                                   batch_size=65536) \
        .groupby(["l_suppkey", "l_partkey"]) \
        .aggregate(Sum("q", alias_name="q")) \
        .filter(expr=f"q > {qty_threshold_x100}") \
        .groupby("l_suppkey").aggregate(Count(alias_name="n"))
    wk = np.sort(np.asarray(
        [r["l_suppkey"] for r in winners.take_all()], np.int64))
    wk_ref = ray.put(wk)

    supplier = _read(sf_dir, "supplier",
                     ["s_suppkey", "s_name", "s_nationkey"])

    def pick(batch: pa.Table) -> pa.Table:
        ks = ray.get(wk_ref)
        sel = batch.filter(pc.equal(batch["s_nationkey"], nkey))
        sk = sel["s_suppkey"].to_numpy(zero_copy_only=False)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, sk), len(ks) - 1)
            keep = ks[pos] == sk
        else:
            keep = np.zeros(len(sk), bool)
        sel = sel.filter(pa.array(keep))
        return sel.select(["s_suppkey", "s_name"])

    return supplier.map_batches(pick, batch_format="pyarrow") \
        .sort("s_name")

def cube_revenue(sf_dir: str):
    """GROUP BY CUBE (year, priority) over order revenue — ROLLUP's
    sibling with the cross-dimensional (priority-only) level included.
    Same two-phase shape as :func:`rollup_revenue`: only the finest
    (year, priority) level aggregates distributed (per-batch partials →
    small groupby); all four cube levels then re-aggregate that
    years×priorities table driver-side (tens of rows — the documented
    small-result exception). Subtotal keys surface as ``-1`` /
    ``'ALL'``. Output: (o_year, o_orderpriority, n_orders,
    sum_price_x100) ordered by the keys."""
    ds = _read(sf_dir, "orders",
               ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
            "price": batch["o_totalprice"],
        })
        g = pa.TableGroupBy(t, ["o_year", "o_orderpriority"]).aggregate(
            [("price", "sum"), ("price", "count")])
        return pa.table({
            "o_year": g["o_year"],
            "o_orderpriority": g["o_orderpriority"],
            "price": g["price_sum"],
            "n": g["price_count"],
        })

    finest = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536) \
               .groupby(["o_year", "o_orderpriority"]).aggregate(
                   Sum("price", alias_name="price"),
                   Sum("n", alias_name="n"))
    f = pa.Table.from_pandas(finest.to_pandas(), preserve_index=False)

    def level(tbl: pa.Table, keys: list[str]) -> pa.Table:
        if keys:
            g = pa.TableGroupBy(tbl, keys).aggregate(
                [("price", "sum"), ("n", "sum")])
            cols = {k: g[k] for k in keys}
            price, n = g["price_sum"], g["n_sum"]
        else:
            cols = {}
            price = pa.array([pc.sum(tbl["price"]).as_py() or 0.0])
            n = pa.array([pc.sum(tbl["n"]).as_py() or 0], pa.int64())
        ny = len(price)
        return pa.table({
            "o_year": cols.get("o_year", pa.array([-1] * ny, pa.int64())),
            "o_orderpriority": cols.get(
                "o_orderpriority", pa.array(["ALL"] * ny, pa.string())),
            "price": price,
            "n": pc.cast(n, pa.int64()),
        })

    out = pa.concat_tables([
        level(f, ["o_year", "o_orderpriority"]),
        level(f, ["o_year"]),
        level(f, ["o_orderpriority"]),
        level(f, []),
    ])
    out = pa.table({
        "o_year": out["o_year"],
        "o_orderpriority": out["o_orderpriority"],
        "n_orders": out["n"],
        "sum_price_x100": pc.round(
            pc.multiply(out["price"], 100.0), 0).cast(pa.int64()),
    })
    idx = pc.sort_indices(out, sort_keys=[("o_year", "ascending"),
                                          ("o_orderpriority", "ascending")])
    return out.take(idx)


def _user_type_mask(sf_dir: str, type_a: str, type_b: str,
                    b_min_value: float | None = None):
    """Shared kernel for INTERSECT / EXCEPT over event actors: per-batch
    distinct (user, side-bit) partials OR-reduce into per-user side
    flags (a = did ``type_a``, b = did ``type_b`` [optionally above a
    value threshold]) — one groupby over |users| rows, no row-level
    shuffle of the event log."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        is_a = et == type_a
        is_b = et == type_b
        if b_min_value is not None:
            val = batch["value"].to_numpy(zero_copy_only=False)
            is_b = is_b & (val > b_min_value)
        keep = is_a | is_b
        t = pa.table({"user_id": pa.array(uid[keep]),
                      "a": pa.array(is_a[keep].astype(np.int64)),
                      "b": pa.array(is_b[keep].astype(np.int64))})
        g = pa.TableGroupBy(t, "user_id").aggregate(
            [("a", "max"), ("b", "max")])
        return pa.table({"user_id": g["user_id"],
                         "a": g["a_max"], "b": g["b_max"]})

    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby("user_id").aggregate(Max("a", alias_name="a"),
                                      Max("b", alias_name="b"))


def intersect_users(sf_dir: str, type_a: str = "click",
                    type_b: str = "purchase"):
    """INTERSECT: distinct users who performed BOTH event types. Output:
    (user_id) ordered."""
    return _user_type_mask(sf_dir, type_a, type_b) \
        .filter(expr="a == 1 and b == 1") \
        .select_columns(["user_id"]).sort("user_id")


def except_users(sf_dir: str, type_a: str = "click",
                 type_b: str = "purchase",
                 b_min_value: float = 99.0):
    """EXCEPT: distinct users who performed ``type_a`` but never a
    high-value ``type_b`` (the value threshold keeps the difference
    non-empty — with few users every type is eventually hit by
    everyone). Output: (user_id) ordered."""
    return _user_type_mask(sf_dir, type_a, type_b, b_min_value) \
        .filter(expr="a == 1 and b == 0") \
        .select_columns(["user_id"]).sort("user_id")

def pack_sequences(sf_dir: str, budget: int = 2048, num_buckets: int = 64):
    """Sequence packing — the concat-and-chunk layout LLM training uses:
    documents in doc_id order form one global token stream cut into
    fixed-``budget`` context windows; each doc is labeled with the bin
    and offset where it starts. The global prefix sum is the classic
    two-phase distributed scan with NO global sort: docs range-bucket by
    id (contiguous id ranges → ordered buckets), a per-bucket token
    total (B rows) comes to the driver to form exclusive bucket
    offsets, and each bucket then cumsums internally and adds its
    offset. The tokenized stats table (3 ints/doc) is materialized
    between the two phases so the corpus text is read exactly once.
    Token definition matches token_stats ([a-z0-9]+ on lowercased
    text); all arithmetic integer — the oracle mirrors it with one SQL
    window function. Output: (doc_id, n_tokens, bin_id, bin_offset)
    ordered by doc_id."""
    from docling_ray.functions.hashing import tokenize

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_ids = int(docs.max("doc_id")) + 1

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = np.fromiter(
            (len(tokenize(t or "")) for t in batch["text"].to_pylist()),
            np.int64, len(ids))
        return pa.table({
            "bucket": pa.array((ids * num_buckets // n_ids)
                               .astype(np.int32)),
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
        })

    toks = docs.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536).materialize()

    totals = toks.groupby("bucket").aggregate(
        Sum("n_tokens", alias_name="tot")).to_pandas() \
        .sort_values("bucket")
    starts = np.concatenate([[0], np.cumsum(totals.tot.to_numpy())[:-1]])
    off_ref = ray.put(dict(zip(totals.bucket.astype(int), starts)))

    def per_bucket(group) -> pa.Table:
        offs = ray.get(off_ref)
        g = group.sort_values("doc_id", kind="mergesort")
        n_tok = g["n_tokens"].to_numpy()
        start = int(offs[int(g["bucket"].iloc[0])]) \
            + np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "bin_id": pa.array(start // budget, pa.int64()),
            "bin_offset": pa.array(start % budget, pa.int64()),
        })

    return toks.groupby("bucket").map_groups(per_bucket,
                                             batch_format="pandas") \
        .sort("doc_id")


def funnel_counts(sf_dir: str, num_buckets: int = 64):
    """Ordered-funnel analysis: how many users reach view → click →
    purchase, each step the FIRST event of its type strictly after the
    previous step's time (the classic product-analytics funnel; DuckDB
    mirrors it as chained min-ts self-joins). Bucketed like sessionize:
    ``user % B`` co-locates a user's events, each bucket resolves its
    users' step times with three vectorized pandas merges (no per-user
    Python), and only per-bucket step COUNTS shuffle to the final sum."""
    steps = ("view", "click", "purchase")
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"],
                        value_set=pa.array(steps))
        t = batch.filter(mask)
        keys = pc.cast(t["user_id"], pa.int64())
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(keys, num_buckets - 1),
                              pa.int32()),
            "user_id": t["user_id"],
            "ts": t["ts"],
            "event_type": t["event_type"],
        })

    def per_bucket(group) -> pa.Table:
        cur = None  # DataFrame(user_id, t): users alive at this step
        counts = []
        for step in steps:
            ev = group[group["event_type"] == step][["user_id", "ts"]]
            if cur is None:
                nxt = ev.groupby("user_id", as_index=False)["ts"].min()
            else:
                m = ev.merge(cur, on="user_id")
                m = m[m["ts"] > m["t"]]
                nxt = m.groupby("user_id", as_index=False)["ts"].min()
            nxt = nxt.rename(columns={"ts": "t"})
            counts.append(len(nxt))
            cur = nxt
        return pa.table({
            "step": pa.array(range(1, len(steps) + 1), pa.int64()),
            "event_type": pa.array(list(steps), pa.string()),
            "n_users": pa.array(counts, pa.int64()),
        })

    partials = ds.map_batches(add_bucket, batch_format="pyarrow",
                              batch_size=65536) \
                 .groupby("bucket") \
                 .map_groups(per_bucket, batch_format="pandas")
    return partials.groupby(["step", "event_type"]).aggregate(
        Sum("n_users", alias_name="n_users")).sort("step")
