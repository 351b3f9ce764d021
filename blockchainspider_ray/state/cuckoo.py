"""Deterministic numpy-backed cuckoo filter.

Replaces Scrapy's request-fingerprint dedup (the reference relies on the
default fingerprinter, see reference BlockchainSpider/settings.py:95 and the
``dont_filter=True`` escapes in spiders/txs/blockscan.py:94) and the bloom
dedups (reference middlewares/trans/metadata.py:21-25,
pipelines/trans.py:31-40).  A cuckoo filter is chosen over bloom because it
supports deletion and serializes compactly.

Determinism matters for resumability: the kick-eviction choice is derived
from the filter's insert counter, not a RNG, so replaying the same insert
sequence always produces the same table bytes — a checkpointed shard
restored on another node makes identical admit/deny decisions.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

_FP_MUL = np.uint64(0x5BD1E995)
_MAX_KICKS = 500
MAGIC = b"CKF1"


class CuckooFilter:
    """Cuckoo filter with 4-slot buckets and 16-bit fingerprints.

    ``capacity`` is rounded up to a power-of-two bucket count; load factors
    up to ~0.95 are fine with b=4.
    """

    SLOTS = 4

    def __init__(self, capacity: int = 1 << 16):
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self._mask = np.uint64(n_buckets - 1)
        # 0 == empty slot; fingerprints are forced nonzero
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0
        self._kick_seq = 0

    # -- key decomposition ------------------------------------------------
    def _fp_index(self, h: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h = h.astype(np.uint64, copy=False)
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (h & self._mask).astype(np.uint64)
        return fp, i1

    def _alt_index(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i.astype(np.uint64) ^ (fp.astype(np.uint64) * _FP_MUL)) & self._mask

    # -- scalar ops -------------------------------------------------------
    def _bucket_has(self, i: int, fp: int) -> bool:
        return bool((self.table[i] == fp).any())

    def _bucket_insert(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empties = np.nonzero(row == 0)[0]
        if len(empties):
            row[empties[0]] = fp
            return True
        return False

    def contains(self, h: int) -> bool:
        fp, i1 = self._fp_index(np.array([h], dtype=np.uint64))
        fp, i1 = int(fp[0]), int(i1[0])
        i2 = int(self._alt_index(np.array([i1], np.uint64), np.array([fp], np.uint64))[0])
        return self._bucket_has(i1, fp) or self._bucket_has(i2, fp)

    def insert(self, h: int) -> bool:
        """Insert; returns False only when the filter is saturated."""
        fp_a, i1_a = self._fp_index(np.array([h], dtype=np.uint64))
        fp, i1 = int(fp_a[0]), int(i1_a[0])
        i2 = int(self._alt_index(np.array([i1], np.uint64), np.array([fp], np.uint64))[0])
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            self.count += 1
            return True
        # deterministic kick loop
        i = i1 if (self._kick_seq & 1) == 0 else i2
        for _ in range(_MAX_KICKS):
            self._kick_seq += 1
            slot = self._kick_seq % self.SLOTS
            victim = int(self.table[i, slot])
            self.table[i, slot] = fp
            fp = victim
            i = int(self._alt_index(np.array([i], np.uint64), np.array([fp], np.uint64))[0])
            if self._bucket_insert(i, fp):
                self.count += 1
                return True
        return False

    def delete(self, h: int) -> bool:
        fp_a, i1_a = self._fp_index(np.array([h], dtype=np.uint64))
        fp, i1 = int(fp_a[0]), int(i1_a[0])
        i2 = int(self._alt_index(np.array([i1], np.uint64), np.array([fp], np.uint64))[0])
        for i in (i1, i2):
            hit = np.nonzero(self.table[i] == fp)[0]
            if len(hit):
                self.table[i, hit[0]] = 0
                self.count -= 1
                return True
        return False

    # -- batch ops (the hot path) ----------------------------------------
    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        fp, i1 = self._fp_index(hashes)
        i2 = self._alt_index(i1, fp)
        t = self.table
        fp16 = fp[:, None]
        return ((t[i1] == fp16).any(axis=1)) | ((t[i2] == fp16).any(axis=1))

    def contains_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        """For each hash: True if it was NEW (inserted now), False if it was
        already present.  Duplicates inside one batch are handled in order:
        only the first occurrence reports new."""
        hashes = hashes.astype(np.uint64, copy=False)
        present = self.contains_batch(hashes)
        new_mask = np.zeros(len(hashes), dtype=bool)
        for j in np.nonzero(~present)[0]:
            h = int(hashes[j])
            if self.contains(h):  # duplicate earlier in this batch
                continue
            if self.insert(h):
                new_mask[j] = True
            # saturated filter -> treat as seen (safe: we may re-fetch never,
            # but the engine's exact-dedup verify mode catches this)
        return new_mask

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        header = MAGIC + struct.pack("<QQQ", self.n_buckets, self.count, self._kick_seq)
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        assert data[:4] == MAGIC, "bad cuckoo snapshot"
        n_buckets, count, kick_seq = struct.unpack("<QQQ", data[4:28])
        f = cls.__new__(cls)
        f.n_buckets = n_buckets
        f._mask = np.uint64(n_buckets - 1)
        f.table = np.frombuffer(data[28:], dtype=np.uint16).reshape(n_buckets, cls.SLOTS).copy()
        f.count = count
        f._kick_seq = kick_seq
        return f

    def __len__(self) -> int:
        return self.count
