"""Distributed cardinality sketch: HyperLogLog over a Dataset column.

At the 10^10-URL frontier scale an exact ``unique()`` is an all-to-all
shuffle of every key; crawl bookkeeping (distinct URLs seen, distinct
hosts contacted) only needs a cardinality *estimate*.  HLL gives it with
ZERO shuffle: each batch reduces to a fixed 2^p-byte register array, the
arrays merge by elementwise max (associative + commutative, so the result
is identical under any partitioning / cluster size), and only
``num_batches`` 4 KB rows ever reach the driver.

The reference has no sketch (its seen set is exact, cf. the filter classes
BlockchainSpider re-exposes); this is a beyond-reference scale operator per
the brief's custom-operator clause.  Hashing is splitmix64 — fixed
constants, version-stable (the same policy as the blake2b MinHash tokens:
no reliance on Python's salted hash()).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _hash_column(arr: pa.ChunkedArray) -> np.ndarray:
    """Column -> uint64 hashes.  Integer columns vectorize straight through
    splitmix64; strings/binary take a per-value blake2b loop (still one
    pass per batch, and the batch collapses to 2^p bytes right after)."""
    typ = arr.type
    if pa.types.is_integer(typ):
        return _splitmix64(arr.cast(pa.uint64()).to_numpy(zero_copy_only=False))
    import hashlib

    vals = arr.to_pylist()
    out = np.empty(len(vals), dtype=_U64)
    for i, v in enumerate(vals):
        b = v if isinstance(v, bytes) else str(v).encode()
        out[i] = int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")
    return out


def batch_registers(arr: pa.ChunkedArray, p: int = 12) -> np.ndarray:
    """One batch's HLL registers: uint8[2^p]."""
    h = _hash_column(arr)
    m = 1 << p
    idx = (h >> _U64(64 - p)).astype(np.int64)
    rest = h << _U64(p)  # remaining 64-p bits, left-aligned
    # rho = leading zeros of the remaining bits + 1 (capped at 64-p+1)
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # MSB position via 32-bit halves: float64 log2 is exact-safe below
        # 2^32 (a whole uint64 -> float64 cast rounds near 2^64)
        r = rest[nz]
        hi = (r >> _U64(32)).astype(np.float64)
        lo = (r & _U64(0xFFFFFFFF)).astype(np.float64)
        pos = np.where(
            hi > 0,
            32 + np.floor(np.log2(np.maximum(hi, 1.0))),
            np.floor(np.log2(np.maximum(lo, 1.0))),
        ).astype(np.int64)
        rho[nz] = (63 - pos + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the small-range linear-counting
    correction (Flajolet et al. 2007)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(e)


def hll_distinct(ds: "object", column: str, p: int = 12) -> float:
    """Estimate the number of distinct values in ``ds[column]``.

    Per-batch registers stream to the driver as one 2^p-byte row each
    (shuffle-free); the driver folds them by elementwise max.  The result
    is deterministic and partition-independent for a fixed ``p``.
    """

    def regs_of(b: pa.Table) -> pa.Table:
        r = batch_registers(b.column(column), p)
        return pa.table({"regs": pa.array([r.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    reg_ds = ds.map_batches(regs_of, batch_format="pyarrow")
    for batch in reg_ds.iter_batches(batch_format="pyarrow"):
        for blob in batch.column("regs").to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


class BloomFilter:
    """Vectorized Bloom filter over uint64-hashable values (double hashing:
    idx_i = (h1 + i*h2) mod m).  Fixed splitmix64 hashing — deterministic
    across processes and cluster sizes, like the HLL above."""

    def __init__(self, m_bits: int, k: int = 7, bits: np.ndarray | None = None):
        assert m_bits % 8 == 0
        self.m = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(m_bits // 8, dtype=np.uint8)

    def _indices(self, arr: pa.ChunkedArray) -> np.ndarray:
        return self._indices_h1(_hash_column(arr))

    def _indices_h1(self, h1: np.ndarray) -> np.ndarray:
        h2 = _splitmix64(h1 ^ _U64(0xA5A5A5A5A5A5A5A5)) | _U64(1)
        with np.errstate(over="ignore"):
            return np.stack(
                [((h1 + _U64(i) * h2) % _U64(self.m)).astype(np.int64) for i in range(self.k)]
            )

    def add(self, arr: pa.ChunkedArray) -> None:
        idx = self._indices(arr).ravel()
        np.bitwise_or.at(self.bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))

    def contains(self, arr: pa.ChunkedArray) -> np.ndarray:
        return self.contains_h1(_hash_column(arr))

    def contains_h1(self, h1: np.ndarray) -> np.ndarray:
        """``contains`` over precomputed splitmix64 h1 hashes — callers
        that also bucket rows by the same hash (stages/joins.py
        bloom_semi_join) hash each batch exactly once."""
        idx = self._indices_h1(h1)
        hit = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(ds: "object", column: str, m_bits: int = 1 << 23, k: int = 7) -> BloomFilter:
    """Distributed Bloom build: each batch reduces to its own m/8-byte
    bitmap (shuffle-free, the HLL pattern), OR-folded on the driver."""

    def bits_of(b: pa.Table) -> pa.Table:
        f = BloomFilter(m_bits, k)
        f.add(b.column(column))
        return pa.table({"bits": pa.array([f.bits.tobytes()], pa.binary())})

    out = BloomFilter(m_bits, k)
    for batch in ds.map_batches(bits_of, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in batch.column("bits").to_pylist():
            np.bitwise_or(out.bits, np.frombuffer(blob, dtype=np.uint8), out=out.bits)
    return out


class CountMinSketch:
    """Count-Min frequency sketch (Cormode & Muthukrishnan): d rows of w
    counters; add = +1 at one counter per row, estimate = min over rows
    (an OVERestimate, never under).  Per-batch sketches sum elementwise —
    associative + commutative like the HLL/Bloom merges above, so the
    estimates are identical under any partitioning.  Same fixed splitmix64
    hashing policy."""

    def __init__(self, w: int = 1 << 14, d: int = 4, table: np.ndarray | None = None):
        self.w = w
        self.d = d
        self.table = table if table is not None else np.zeros((d, w), dtype=np.int64)

    def _indices(self, arr: pa.ChunkedArray) -> np.ndarray:
        h1 = _hash_column(arr)
        h2 = _splitmix64(h1 ^ _U64(0xC3C3C3C3C3C3C3C3)) | _U64(1)
        with np.errstate(over="ignore"):
            return np.stack(
                [((h1 + _U64(i) * h2) % _U64(self.w)).astype(np.int64) for i in range(self.d)]
            )

    def add(self, arr: pa.ChunkedArray) -> None:
        idx = self._indices(arr)
        for r in range(self.d):
            np.add.at(self.table[r], idx[r], 1)

    def estimate(self, arr: pa.ChunkedArray) -> np.ndarray:
        idx = self._indices(arr)
        return np.stack([self.table[r][idx[r]] for r in range(self.d)]).min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self


def build_cms(ds: "object", column: str, w: int = 1 << 14, d: int = 4) -> CountMinSketch:
    """Distributed CMS build: per-batch sketches stream to the driver as
    one (d*w*8)-byte row each and SUM-fold (shuffle-free)."""

    def sketch_of(b: pa.Table) -> pa.Table:
        s = CountMinSketch(w, d)
        s.add(b.column(column))
        return pa.table({"tbl": pa.array([s.table.tobytes()], pa.binary())})

    out = CountMinSketch(w, d)
    for batch in ds.map_batches(sketch_of, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in batch.column("tbl").to_pylist():
            out.table += np.frombuffer(blob, dtype=np.int64).reshape(d, w)
    return out
