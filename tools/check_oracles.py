"""Driver-mimic: run every queries() entry and compare with oracle_sql()
via DuckDB (row count + column names + order-insensitive value hash),
the way CORRECTNESS_r{N}.json is produced.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def norm_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return pd.util.hash_pandas_object(df, index=False).sum()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    # thread the sf under test into the expected-table oracles so checking
    # any sf compares that sf's output to that sf's expectations
    sqls = entry.oracle_sql(sf_dir)
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            continue
        want = con.sql(sqls[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and norm_hash(got) == norm_hash(want)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            n_fail += 1
            print(f"{status}{name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} hash_ok={ok_hash} ({dt:.1f}s)")
            if ok_cols and ok_rows:
                g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
                w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
                diff = (g != w) & ~(g.isna() & w.isna())
                bad = diff.any(axis=1)
                print(g[bad].head(3))
                print(w[bad].head(3))
            elif not ok_cols:
                print("  got cols:", sorted(got.columns))
                print("  want cols:", sorted(want.columns))
        else:
            print(f"{status}{name}: {len(got)} rows match ({dt:.1f}s)")
    ray.shutdown()
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
