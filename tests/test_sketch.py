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


def test_bloom_no_false_negatives_and_low_fp():
    from blockchainspider_ray.stages.sketch import BloomFilter

    f = BloomFilter(1 << 18, k=7)
    members = pa.chunked_array([pa.array(np.arange(0, 5_000, dtype=np.int64))])
    probes = pa.chunked_array([pa.array(np.arange(0, 50_000, dtype=np.int64))])
    f.add(members)
    hits = f.contains(probes)
    assert hits[:5_000].all()  # zero false negatives, ever
    assert hits[5_000:].mean() < 0.01  # m/n = 52 bits/key -> fp well under 1%


def test_bloom_build_partition_independent(ray_session):
    import ray

    from blockchainspider_ray.stages.sketch import build_bloom

    vals = np.arange(7_000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals)}))
    b1 = build_bloom(ds, "k", m_bits=1 << 16)
    b2 = build_bloom(ds.repartition(11), "k", m_bits=1 << 16)
    assert np.array_equal(b1.bits, b2.bits)


def test_bloom_strings():
    from blockchainspider_ray.stages.sketch import BloomFilter

    f = BloomFilter(1 << 14, k=5)
    f.add(pa.chunked_array([pa.array([f"http://h{i}.example/p" for i in range(100)])]))
    hits = f.contains(
        pa.chunked_array([pa.array(["http://h3.example/p", "http://nope.example/x"])])
    )
    assert bool(hits[0]) is True


def test_cms_overestimate_only_and_exact_when_sparse():
    from collections import Counter

    from blockchainspider_ray.stages.sketch import CountMinSketch

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 300, size=40_000, dtype=np.int64)
    true = Counter(vals.tolist())
    s = CountMinSketch(w=1 << 14, d=4)
    s.add(pa.chunked_array([pa.array(vals)]))
    keys = np.array(sorted(true), dtype=np.int64)
    est = s.estimate(pa.chunked_array([pa.array(keys)]))
    exact = np.array([true[k] for k in keys.tolist()])
    assert (est >= exact).all()  # CMS never underestimates
    # 300 keys in 16384 counters x4 rows: collisions essentially impossible
    assert (est == exact).all()


def test_cms_build_partition_independent(ray_session):
    import ray

    from blockchainspider_ray.stages.sketch import build_cms

    vals = np.arange(9_000, dtype=np.int64) % 700
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals)}))
    c1 = build_cms(ds, "k", w=1 << 12)
    c2 = build_cms(ds.repartition(9), "k", w=1 << 12)
    assert np.array_equal(c1.table, c2.table)


def test_bloom_fpr_calibration(ray_session):
    """bloom_fpr: zero false negatives (hard guarantee), measured FPR at or
    below ~2x the analytic bound at each size, monotone improvement with m,
    and determinism across runs."""
    from blockchainspider_ray.pipelines.queries import q_bloom_fpr

    df = q_bloom_fpr("/root/testdata/sf0.001")
    assert list(df["m_bits"]) == [1 << 10, 1 << 12, 1 << 14]
    # false-positive rate shrinks as the filter grows
    assert df["fpr"].iloc[0] >= df["fpr"].iloc[1] >= df["fpr"].iloc[2]
    # measured FPR tracks the analytic prediction (generous 2x + absolute slack)
    for _, r in df.iterrows():
        assert r["fpr"] <= max(2.0 * r["fpr_pred"], 0.02), (r["m_bits"], r["fpr"], r["fpr_pred"])
    # members are never reported absent: rebuild and check all evens hit
    import numpy as np
    import pyarrow.parquet as pq

    from blockchainspider_ray.pipelines.queries import _read
    from blockchainspider_ray.stages.sketch import build_bloom

    import pyarrow.compute as pc

    docs = _read("/root/testdata/sf0.001", "documents", columns=["doc_id"])
    members = docs.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), 0)),
        batch_format="pyarrow",
    )
    f = build_bloom(members, "doc_id", m_bits=1 << 10)
    ids = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id"])
    even = ids.filter(__import__("pyarrow").compute.equal(
        __import__("pyarrow").compute.bit_wise_and(ids.column("doc_id"), 1), 0))
    hits = np.asarray(f.contains(even.column("doc_id")))
    assert hits.all()
    df2 = q_bloom_fpr("/root/testdata/sf0.001")
    assert df.equals(df2)
