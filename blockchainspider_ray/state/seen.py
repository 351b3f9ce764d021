"""Sharded URL-seen service.

The engine-wide replacement for Scrapy's single-process request-fingerprint
dedup (reference: default fingerprinter, BlockchainSpider/settings.py:95) and
the visited sets inside the strategies (reference strategies/txs/bfs.py:11).

Design for 10^10 URLs: K shard actors, each holding a cuckoo filter of
capacity/K keys; a frontier batch is routed by ``url_hash % K`` so every
shard call carries a dense sub-batch.  Shards are independent — no global
lock, no cross-shard traffic — so K scales linearly with the cluster.  Each
shard serializes deterministically for checkpoints.

``SeenSet`` also has a ``backend='exact'`` mode (a python set per shard) used
by tests to verify the cuckoo path produces the same admit decisions at small
scale (cuckoo FPR can only *suppress* re-fetches, never duplicate them).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import ray

from .cuckoo import CuckooFilter


class _ShardCore:
    """Non-Ray shard logic, reused by the actor and by local mode."""

    def __init__(self, capacity: int, backend: str):
        self.backend = backend
        if backend == "cuckoo":
            self.filter = CuckooFilter(capacity)
            self.exact: Optional[set] = None
        elif backend == "exact":
            self.filter = None
            self.exact = set()
        else:
            raise ValueError(f"unknown seen backend: {backend}")

    def contains_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        if self.exact is not None:
            out = np.zeros(len(hashes), dtype=bool)
            for j, h in enumerate(hashes.tolist()):
                if h not in self.exact:
                    self.exact.add(h)
                    out[j] = True
            return out
        return self.filter.contains_and_insert(hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if self.exact is not None:
            return np.array([h in self.exact for h in hashes.tolist()], dtype=bool)
        return self.filter.contains_batch(hashes)

    def snapshot(self) -> bytes:
        if self.exact is not None:
            return b"EXACT" + np.array(sorted(self.exact), dtype=np.uint64).tobytes()
        return self.filter.to_bytes()

    def restore(self, data: bytes) -> None:
        if data[:5] == b"EXACT":
            self.exact = set(np.frombuffer(data[5:], dtype=np.uint64).tolist())
            self.filter = None
            self.backend = "exact"
        else:
            self.filter = CuckooFilter.from_bytes(data)
            self.exact = None
            self.backend = "cuckoo"

    def size(self) -> int:
        return len(self.exact) if self.exact is not None else len(self.filter)


@ray.remote(num_cpus=0)  # memory-bound service actor; zero CPU claim (see fetch.py)
class SeenShard:
    """One shard of the URL-seen set (cheap actor: mostly memory, not CPU)."""

    def __init__(self, capacity: int = 1 << 20, backend: str = "cuckoo"):
        self.core = _ShardCore(capacity, backend)

    def contains_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        return self.core.contains_and_insert(hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.core.contains(hashes)

    def reset(self, capacity: int, backend: str) -> None:
        """Clear to a fresh filter (actor reuse across crawls)."""
        self.core = _ShardCore(capacity, backend)

    def snapshot(self) -> bytes:
        return self.core.snapshot()

    def restore(self, data: bytes) -> None:
        self.core.restore(data)

    def size(self) -> int:
        return self.core.size()


class SeenSet:
    """Facade over K seen shards (Ray actors, or in-process for local mode).

    ``filter_new(hashes)`` returns a boolean "is new" mask aligned with the
    input; routing + scatter/gather is vectorized and all shard calls run
    concurrently.
    """

    _shared_actors: "dict[int, list]" = {}

    def __init__(
        self,
        num_shards: int = 8,
        capacity: int = 1 << 20,
        backend: str = "cuckoo",
        use_ray: bool = True,
        reuse_actors: bool = False,
    ):
        self.num_shards = num_shards
        self.use_ray = use_ray
        per_shard = max(1024, capacity // num_shards)
        if use_ray:
            # Actor processes are infrastructure; the filter CONTENT is crawl
            # state.  With reuse_actors=True (the engine's mode — it owns one
            # live SeenSet at a time) live actors are reset to fresh filters
            # so a new crawl doesn't pay num_shards process spawns.  Callers
            # that hold several SeenSets concurrently must keep the default.
            cached = self._shared_actors.get(num_shards) if reuse_actors else None
            if cached is not None:
                try:
                    ray.get([s.reset.remote(per_shard, backend) for s in cached])
                except Exception:
                    cached = None
            if cached is None:
                cached = [
                    SeenShard.remote(capacity=per_shard, backend=backend)
                    for _ in range(num_shards)
                ]
                if reuse_actors:
                    type(self)._shared_actors.clear()  # one pool at a time
                    type(self)._shared_actors[num_shards] = cached
            self.shards = cached
        else:
            self.shards = [_ShardCore(per_shard, backend) for _ in range(num_shards)]

    def _route(self, hashes: np.ndarray) -> List[np.ndarray]:
        shard_of = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        return [np.nonzero(shard_of == k)[0] for k in range(self.num_shards)]

    def filter_new(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter_new_async(hashes)()

    def filter_new_async(self, hashes: np.ndarray):
        """Submit the sharded contains-and-insert wave WITHOUT waiting;
        returns a zero-arg callable that collects the mask.  The crawl
        engine issues this before the fetch stage and collects after, so
        the seen-gate RPC wave rides inside the fetch wall instead of
        adding driver-serial time to every round.  Safe because the mask's
        only consumers run post-fetch and no other seen-set call happens
        in between (per-actor FIFO keeps shard state consistent)."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        idx_per_shard = self._route(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        if self.use_ray:
            futures = {}
            for k, idx in enumerate(idx_per_shard):
                if len(idx):
                    futures[k] = self.shards[k].contains_and_insert.remote(hashes[idx])

            def collect() -> np.ndarray:
                results = ray.get(list(futures.values()))
                for (k, _), res in zip(futures.items(), results):
                    out[idx_per_shard[k]] = res
                return out

            return collect
        for k, idx in enumerate(idx_per_shard):
            if len(idx):
                out[idx] = self.shards[k].contains_and_insert(hashes[idx])
        return lambda: out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.uint64)
        idx_per_shard = self._route(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        if self.use_ray:
            futures = {
                k: self.shards[k].contains.remote(hashes[idx])
                for k, idx in enumerate(idx_per_shard)
                if len(idx)
            }
            results = ray.get(list(futures.values()))
            for (k, _), res in zip(futures.items(), results):
                out[idx_per_shard[k]] = res
        else:
            for k, idx in enumerate(idx_per_shard):
                if len(idx):
                    out[idx] = self.shards[k].contains(hashes[idx])
        return out

    def snapshot(self) -> Dict[int, bytes]:
        if self.use_ray:
            blobs = ray.get([s.snapshot.remote() for s in self.shards])
        else:
            blobs = [s.snapshot() for s in self.shards]
        return {k: b for k, b in enumerate(blobs)}

    def restore(self, blobs: Dict[int, bytes]) -> None:
        assert len(blobs) == self.num_shards, "shard count mismatch on restore"
        if self.use_ray:
            ray.get([self.shards[k].restore.remote(blobs[k]) for k in blobs])
        else:
            for k, b in blobs.items():
                self.shards[k].restore(b)

    def size(self) -> int:
        if self.use_ray:
            return int(sum(ray.get([s.size.remote() for s in self.shards])))
        return int(sum(s.size() for s in self.shards))
