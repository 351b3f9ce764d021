"""Drive the driver contract the way the driver does: entry(), every
queries() callable at sf0.001, oracle_sql key alignment."""

import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.full  # long sweep: excluded from the fast tier


import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_runs():
    out = entrymod.entry()
    assert isinstance(out, pd.DataFrame)
    assert len(out) > 0
    assert {"round", "pop_index", "url", "found"} <= set(out.columns)


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_each_query_runs_nonempty(name):
    fn = entrymod.queries()[name]
    out = fn(SF)
    if isinstance(out, pd.DataFrame):
        n = len(out)
    elif isinstance(out, pa.Table):
        n = out.num_rows
    else:
        n = out.count()
    assert n > 0, f"{name} returned empty result"
