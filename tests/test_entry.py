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
