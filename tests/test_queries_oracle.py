"""Every SQL-mirrored query must match its DuckDB oracle at sf0.001 —
same row count, same (sorted) column names, same values."""

import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.full  # long sweep: excluded from the fast tier


import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from blockchainspider_ray.pipelines.queries import ORACLE_SQL, SQL_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_query_matches_oracle(name, con):
    ours = _normalize(_to_df(SQL_QUERIES[name](SF_DIR)))
    oracle = _normalize(con.sql(ORACLE_SQL[name]).df())
    assert list(ours.columns) == list(oracle.columns), (
        f"{name}: columns {list(ours.columns)} != {list(oracle.columns)}"
    )
    assert len(ours) == len(oracle), f"{name}: rows {len(ours)} != {len(oracle)}"
    pd.testing.assert_frame_equal(ours, oracle, check_dtype=False, atol=1e-8, rtol=0)
