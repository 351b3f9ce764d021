"""HyperLogLog sketch: accuracy vs exact distinct, partition independence,
and register-merge determinism (stages/sketch.py)."""

import numpy as np
import pyarrow as pa
import pytest

from blockchainspider_ray.stages.sketch import (
    batch_registers,
    hll_distinct,
    hll_estimate,
)


def test_estimate_accuracy_int_and_string():
    # p=12 -> typical relative error ~1.04/sqrt(4096) = 1.6%
    n = 20_000
    ints = pa.chunked_array([pa.array(np.arange(n, dtype=np.int64))])
    est = hll_estimate(batch_registers(ints))
    assert abs(est - n) / n < 0.05

    strs = pa.chunked_array([pa.array([f"url-{i}" for i in range(3000)])])
    est = hll_estimate(batch_registers(strs))
    assert abs(est - 3000) / 3000 < 0.05


def test_small_range_linear_counting():
    vals = pa.chunked_array([pa.array(np.arange(10, dtype=np.int64))])
    est = hll_estimate(batch_registers(vals))
    assert abs(est - 10) < 1.0


def test_merge_is_partition_independent():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 5_000, size=30_000, dtype=np.int64)
    whole = batch_registers(pa.chunked_array([pa.array(vals)]))
    # any split of the rows must max-merge to the identical registers
    for parts in (2, 7):
        merged = np.zeros_like(whole)
        for chunk in np.array_split(vals, parts):
            np.maximum(
                merged, batch_registers(pa.chunked_array([pa.array(chunk)])), out=merged
            )
        assert np.array_equal(merged, whole)


def test_hll_distinct_dataset_accuracy_and_repartition(ray_session):
    import ray

    vals = np.arange(8_000, dtype=np.int64) % 2_500
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals)}))
    est1 = hll_distinct(ds, "k")
    est2 = hll_distinct(ds.repartition(13), "k")
    assert est1 == pytest.approx(est2)  # partitioning must not change it
    assert abs(est1 - 2_500) / 2_500 < 0.05


def test_duplicates_do_not_inflate():
    a = pa.chunked_array([pa.array(np.zeros(50_000, dtype=np.int64))])
    assert hll_estimate(batch_registers(a)) == pytest.approx(1.0, abs=0.5)
