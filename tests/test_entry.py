"""Replicates the grading driver's correctness harness: every queries()
entry runs at sf0.01 and, where an oracle exists, must match DuckDB on
row count + order-insensitive values with columns sorted by name."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        try:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
        except duckdb.Error:
            pass
    yield c
    c.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


ORACLES = E.oracle_sql()
ALL_QUERIES = E.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con):
    got = _normalize(_to_df(ALL_QUERIES[name](SF)))
    want = _normalize(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True, obj=name)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    out = _to_df(ALL_QUERIES[name](SF))
    assert out is not None
    assert len(out) >= 0


def test_entry_smoke():
    out = _to_df(E.entry())
    assert len(out) > 0
    assert {"qid", "rank", "doc_id"} <= set(out.columns)
