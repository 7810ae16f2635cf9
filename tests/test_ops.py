"""Mirror of the driver's correctness gate: every queries() entry vs its
oracle_sql() DuckDB result at sf0.01 (row count + schema + sorted values)."""

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.reset_index(drop=True)


def pairs():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in qs]


@pytest.mark.parametrize("name,fn,sql", pairs(), ids=[p[0] for p in pairs()])
def test_query_matches_oracle(ray_session, name, fn, sql):
    result = _to_df(fn(SF_DIR))
    assert result is not None
    if sql is None:
        assert len(result) >= 0  # rows-only check (driver's weaker gate)
        return
    oracle = _duck(sql)
    got = _normalize(result)
    want = _normalize(oracle)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    if len(got):
        for col in got.columns:
            a, b = got[col], want[col]
            assert a.dtype.kind == b.dtype.kind, f"{name}:{col} dtype {a.dtype} vs {b.dtype}"
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                pd.testing.assert_series_equal(a.astype(float).round(6),
                                               b.astype(float).round(6),
                                               check_names=False)
            else:
                assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}:{col}"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    result = _to_df(e.entry())
    assert len(result) >= 0
    assert set(result.columns) == {"doc_id", "path", "error"}
