import numpy as np
import pytest

from blockchainspider_ray.state.cuckoo import CuckooFilter
from blockchainspider_ray.state.seen import SeenSet


def test_cuckoo_insert_contains_delete():
    f = CuckooFilter(1 << 12)
    keys = np.random.default_rng(1).integers(0, 2**63, 1000, dtype=np.uint64)
    for k in keys.tolist():
        assert f.insert(int(k))
    assert f.contains_batch(keys).all()
    assert len(f) == 1000
    assert f.delete(int(keys[0]))
    # fpr check on unseen keys
    other = np.random.default_rng(2).integers(0, 2**63, 5000, dtype=np.uint64)
    fpr = f.contains_batch(other).mean()
    assert fpr < 0.01


def test_cuckoo_contains_and_insert_batch_dups():
    f = CuckooFilter(1 << 10)
    h = np.array([5, 7, 5, 9, 7], dtype=np.uint64)
    mask = f.contains_and_insert(h)
    assert mask.tolist() == [True, True, False, True, False]
    mask2 = f.contains_and_insert(h)
    assert not mask2.any()


def test_cuckoo_serialization_roundtrip_deterministic():
    f = CuckooFilter(1 << 10)
    keys = np.arange(500, dtype=np.uint64) * np.uint64(2654435761)
    f.contains_and_insert(keys)
    blob = f.to_bytes()
    g = CuckooFilter.from_bytes(blob)
    assert g.to_bytes() == blob
    assert g.contains_batch(keys).all()
    # same insert sequence -> identical bytes (determinism for resume)
    f2 = CuckooFilter(1 << 10)
    f2.contains_and_insert(keys)
    assert f2.to_bytes() == blob


@pytest.mark.parametrize("use_ray", [False, True])
def test_seen_set_matches_exact(use_ray):
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 2**63, 2000, dtype=np.uint64)
    hashes = np.concatenate([hashes, hashes[:500]])  # re-visits
    cuckoo = SeenSet(num_shards=4, capacity=1 << 14, backend="cuckoo", use_ray=use_ray)
    exact = SeenSet(num_shards=4, capacity=1 << 14, backend="exact", use_ray=False)
    m1 = cuckoo.filter_new(hashes)
    m2 = exact.filter_new(hashes)
    assert (m1 == m2).all()
    assert cuckoo.size() == exact.size()
    # second pass: nothing is new
    assert not cuckoo.filter_new(hashes).any()


def test_seen_set_snapshot_restore():
    s = SeenSet(num_shards=3, capacity=1 << 12, backend="cuckoo", use_ray=False)
    h = np.arange(100, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    s.filter_new(h)
    blobs = s.snapshot()
    t = SeenSet(num_shards=3, capacity=1 << 12, backend="cuckoo", use_ray=False)
    t.restore(blobs)
    assert t.contains(h).all()
    assert not t.filter_new(h).any()
    assert t.snapshot() == blobs
