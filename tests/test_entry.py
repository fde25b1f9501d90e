"""Driver-contract tests: entry() / queries() / oracle_sql() shapes."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as E


def test_entry_runs(ray_session):
    out = E.entry()
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) >= 1
    assert {"doc_id", "spans", "status"} <= set(df.columns)


def test_queries_oracle_consistency():
    qs = E.queries()
    sqls = E.oracle_sql()
    assert set(sqls) <= set(qs), "oracle entries must have matching queries"
    # every oracle-checked op exists; rows-only ops are the non-SQL ones
    assert len(sqls) >= 12
    assert len(qs) >= 20


def test_small_queries_run(ray_session):
    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    for name in ["token_stats", "exact_dedup", "distinct_event_types"]:
        res = qs[name](sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        assert len(df) > 0


def test_new_relational_ops_match_duckdb(ray_session):
    """anti join / rollup / running window vs DuckDB at sf0.001 (the
    oracle harness re-runs these at sf0.01 — this pins them in pytest)."""
    import duckdb
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("customer", "orders", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, sqls = E.queries(), E.oracle_sql()
    for name in ("anti_join_customers", "rollup_revenue",
                 "user_running_value"):
        res = qs[name](sf)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        ora = con.sql(sqls[name]).df()
        assert list(sorted(df.columns)) == list(sorted(ora.columns)), name
        cols = sorted(df.columns)
        a = df[cols].reset_index(drop=True)
        b = ora[cols].reset_index(drop=True)
        for c in cols:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind in "fiu" or bv.dtype.kind in "fiu":
                av = av.astype("int64"); bv = bv.astype("int64")
            assert (av == bv).all(), f"{name}.{c}"
