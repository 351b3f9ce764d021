"""Sharded chip-residual pool — the scale path for the temporal TTR
strategies (TTRTime / TTRAggregate aka reference TTRRedirect).

Unlike RankPool's scalar residuals, TTRTime holds per-node residual as
{timestamp: value} chips and TTRAggregate as {(symbol, timestamp): value}
chips (reference ttr.py:177-214, 422-431).  Chip merges are ADDITIVE and
keyed, so shards merge deltas independently; insertion ORDER is
load-bearing twice —

- node order: the reference pop scans ``r`` in dict insertion order and
  keeps the first strict max; each shard records the node's first-delta
  arrival index and the merged top-candidate orders by (sum desc,
  arrival asc);
- chip order within a node: pushes sort chips by timestamp with ties
  keeping list order, and the reference's post-push merge keeps the
  FIRST-seen chip per key; an insertion-ordered dict with additive
  updates reproduces exactly that list.

``use_ray=False`` runs the shard cores in-process (tests, small runs).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import ray

from ..functions.urls import url_hash64


class _ChipShardCore:
    def __init__(self):
        self.chips: Dict[Any, "OrderedDict[Any, float]"] = {}
        self.arrival: Dict[Any, int] = {}

    def apply(self, nodes: List[Any], keys: List[Any], values: List[float], arrivals: List[int]) -> None:
        for n, k, v, a in zip(nodes, keys, values, arrivals):
            if n not in self.arrival:
                self.arrival[n] = a
            d = self.chips.get(n)
            if d is None:
                d = self.chips[n] = OrderedDict()
            if k is None:  # pure registration (node enters r with no chips)
                continue
            d[k] = d.get(k, 0.0) + v

    def take(self, node: Any) -> Optional[List[Tuple[Any, float]]]:
        d = self.chips.get(node)
        if d is None:
            return None
        self.chips[node] = OrderedDict()
        return list(d.items())

    def take_many(self, nodes: List[Any]) -> Dict[Any, Optional[List[Tuple[Any, float]]]]:
        return {n: self.take(n) for n in nodes}

    def top_candidates(self, k: int, min_sum: float) -> List[Tuple[Any, float, int]]:
        cands = []
        for n, d in self.chips.items():
            s = sum(d.values())
            if s > min_sum:  # strict, as the reference pop requires
                cands.append((n, s, self.arrival.get(n, 0)))
        if len(cands) > k > 0:
            # O(n) selection instead of a full sort (see RankPool): keep
            # everything above the k-th sum, break sum-ties by arrival asc
            sums = np.fromiter((c[1] for c in cands), dtype=np.float64, count=len(cands))
            part = np.argpartition(-sums, k - 1)[:k]
            vk = sums[part].min()
            keep = [c for c in cands if c[1] > vk]
            ties = sorted((c for c in cands if c[1] == vk), key=lambda t: t[2])
            cands = keep + ties[: k - len(keep)]
        cands.sort(key=lambda t: (-t[1], t[2]))
        return cands[:k]

    def snapshot(self) -> dict:
        return {
            "chips": {n: list(d.items()) for n, d in self.chips.items()},
            "arrival": dict(self.arrival),
        }

    def restore(self, state: dict) -> None:
        self.chips = {n: OrderedDict(items) for n, items in state["chips"].items()}
        self.arrival = dict(state["arrival"])


@ray.remote(num_cpus=0)  # memory-bound service actor (see fetch.py)
class ChipShard:
    def __init__(self):
        self.core = _ChipShardCore()

    def apply(self, nodes, keys, values, arrivals):
        return self.core.apply(nodes, keys, values, arrivals)

    def take(self, node):
        return self.core.take(node)

    def take_many(self, nodes):
        return self.core.take_many(nodes)

    def top_candidates(self, k, min_sum):
        return self.core.top_candidates(k, min_sum)

    def snapshot(self):
        return self.core.snapshot()

    def restore(self, state):
        return self.core.restore(state)


class ChipPool:
    """Facade over K chip shards, routed by xxhash64(node) % K."""

    def __init__(self, num_shards: int = 4, use_ray: bool = True):
        self.num_shards = num_shards
        self.use_ray = use_ray
        if use_ray:
            self.shards = [ChipShard.remote() for _ in range(num_shards)]
        else:
            self.shards = [_ChipShardCore() for _ in range(num_shards)]
        # fire-and-forget mutation refs (per-actor FIFO ordering makes a
        # later read observe them; see RankPool._note)
        self._pending: list = []

    def _note(self, refs: list) -> None:
        self._pending.extend(refs)
        if len(self._pending) >= 512:
            ray.get(self._pending)
            self._pending.clear()

    def flush(self) -> None:
        if self.use_ray and self._pending:
            ray.get(self._pending)
            self._pending.clear()

    def __getstate__(self) -> dict:
        """Checkpoint form: shard contents, never actor handles (see
        RankPool.__getstate__)."""
        self.flush()
        return {
            "num_shards": self.num_shards,
            "use_ray": self.use_ray,
            "states": self.snapshot(),
        }

    def __setstate__(self, st: dict) -> None:
        self.num_shards = st["num_shards"]
        self.use_ray = st["use_ray"]
        self._pending = []
        if self.use_ray:
            self.shards = [ChipShard.remote() for _ in range(self.num_shards)]
        else:
            self.shards = [_ChipShardCore() for _ in range(self.num_shards)]
        self.restore(st["states"])

    def _shard_of(self, node: Any) -> int:
        return int(url_hash64([str(node)])[0] % np.uint64(self.num_shards))

    def _shards_of(self, nodes: List[Any]) -> List[int]:
        """Vectorized routing — one hash call per batch (see RankPool)."""
        return (
            (url_hash64([str(n) for n in nodes]) % np.uint64(self.num_shards))
            .astype(np.int64)
            .tolist()
        )

    def apply(self, deltas: List[Tuple[Any, Any, float, int]]) -> None:
        """deltas: [(node, chip_key_or_None, value, arrival)], batched per
        shard and applied concurrently."""
        per_shard: Dict[int, Tuple[list, list, list, list]] = {}
        shards = self._shards_of([node for node, _, _, _ in deltas])
        for (node, k, v, a), sh in zip(deltas, shards):
            b = per_shard.setdefault(sh, ([], [], [], []))
            b[0].append(node)
            b[1].append(k)
            b[2].append(v)
            b[3].append(a)
        if self.use_ray:
            self._note([self.shards[s].apply.remote(*b) for s, b in per_shard.items()])
        else:
            for s, b in per_shard.items():
                self.shards[s].apply(*b)

    def take(self, node: Any) -> Optional[List[Tuple[Any, float]]]:
        s = self._shard_of(node)
        if self.use_ray:
            return ray.get(self.shards[s].take.remote(node))
        return self.shards[s].take(node)

    def take_many(self, nodes: List[Any]) -> Dict[Any, Optional[List[Tuple[Any, float]]]]:
        """Batched destructive read — one call per shard (see RankPool)."""
        per_shard: Dict[int, List[Any]] = {}
        for n, sh in zip(nodes, self._shards_of(nodes)):
            per_shard.setdefault(sh, []).append(n)
        out: Dict[Any, Optional[List[Tuple[Any, float]]]] = {}
        if self.use_ray:
            parts = ray.get(
                [self.shards[s].take_many.remote(ns) for s, ns in per_shard.items()]
            )
        else:
            parts = [self.shards[s].take_many(ns) for s, ns in per_shard.items()]
        for p in parts:
            out.update(p)
        return out

    def top_k(self, k: int, min_sum: float) -> List[Tuple[Any, float, int]]:
        """Global top-k by (chip sum desc, arrival asc), one RPC per shard."""
        if self.use_ray:
            tops = ray.get([s.top_candidates.remote(k, min_sum) for s in self.shards])
        else:
            tops = [s.top_candidates(k, min_sum) for s in self.shards]
        merged = [t for shard_tops in tops for t in shard_tops]
        merged.sort(key=lambda t: (-t[1], t[2]))
        return merged[:k]

    def top_k_submit(self, k: int, min_sum: float):
        """Submit per-shard top-k scans without collecting (see RankPool)."""
        if not self.use_ray:
            return (k, min_sum, None)
        return (k, min_sum, [s.top_candidates.remote(k, min_sum) for s in self.shards])

    def top_k_collect(self, pre, k: int) -> List[Tuple[Any, float, int]]:
        pk, ms, refs = pre
        if refs is None:
            return self.top_k(k, ms)
        assert k <= pk
        merged = [t for shard_tops in ray.get(refs) for t in shard_tops]
        merged.sort(key=lambda t: (-t[1], t[2]))
        return merged[:k]

    def top_candidate(self, min_sum: float) -> Optional[Tuple[Any, float, int]]:
        if self.use_ray:
            tops = ray.get([s.top_candidates.remote(1, min_sum) for s in self.shards])
        else:
            tops = [s.top_candidates(1, min_sum) for s in self.shards]
        merged = [t for shard_tops in tops for t in shard_tops]
        if not merged:
            return None
        merged.sort(key=lambda t: (-t[1], t[2]))
        return merged[0]

    def snapshot(self) -> List[dict]:
        if self.use_ray:
            self.flush()  # surface any deferred mutation error first
            return ray.get([s.snapshot.remote() for s in self.shards])
        return [s.snapshot() for s in self.shards]

    def restore(self, states: List[dict]) -> None:
        assert len(states) == self.num_shards
        if self.use_ray:
            ray.get([s.restore.remote(st) for s, st in zip(self.shards, states)])
        else:
            for s, st in zip(self.shards, states):
                s.restore(st)
