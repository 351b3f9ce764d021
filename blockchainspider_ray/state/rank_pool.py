"""Sharded rank-state actor pool — the scale path for weight strategies.

The reference keeps Haircut/APPR state in one process dict (SURVEY.md §2.4);
at 10^10 nodes that state must shard.  Residual/weight updates are ADDITIVE
(reference appr.py:50-51, haricut.py:41), so each shard can merge deltas
independently; a global pop is a per-shard top-k merged driver-side
(SURVEY.md §2.6 "residual accumulation", §2.7 "pop = top-1 by score").

Reproducing the reference's tie-break ("first strict max in dict insertion
order", haricut.py:35-39) across shards: every node carries the arrival
index of its FIRST weight delta; merged candidates order by
(weight desc, arrival asc), which equals insertion-order-first-max because
the driver issues deltas in the same sequence the reference would.

``use_ray=False`` runs the same shard code in-process (tests, small runs).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import ray

from ..functions.urls import url_hash64

_EMPTY_F64 = np.zeros(0, dtype=np.float64)
_EMPTY_I64 = np.zeros(0, dtype=np.int64)


class _RankShardCore:
    """One shard: node -> (value, arrival, visited, drainable)."""

    def __init__(self):
        self.value: Dict[Any, float] = {}
        self.arrival: Dict[Any, int] = {}
        self.visited: set = set()
        # nodes whose neighbour distribution the strategy has memoized —
        # the shard-side half of APPR's "cached dist" drain predicate
        self.drainable: set = set()

    def reset(self) -> bool:
        """Clear all state (actor-reuse across crawls: spawning 8 shard
        processes costs ~0.5s per crawl, the dominant fixed cost of a
        short weight crawl)."""
        self.value.clear()
        self.arrival.clear()
        self.visited.clear()
        self.drainable.clear()
        return True

    def apply_deltas(self, nodes: List[Any], deltas: List[float], arrivals: List[int]) -> None:
        for n, d, a in zip(nodes, deltas, arrivals):
            self.value[n] = self.value.get(n, 0.0) + d
            if n not in self.arrival:
                self.arrival[n] = a

    def take(self, node: Any) -> float:
        """Return current value and zero it (the push-consumes-mass step)."""
        v = self.value.get(node, 0.0)
        if node in self.value:
            self.value[node] = 0.0
        return v

    def take_many(self, nodes: List[Any]) -> Dict[Any, float]:
        return {n: self.take(n) for n in nodes}

    def claim_many(self, nodes: List[Any]) -> Dict[Any, float]:
        """mark_visited + take fused into one RPC (the batched-pop claim:
        each popped node is marked visited and its mass parked)."""
        self.visited.update(nodes)
        return {n: self.take(n) for n in nodes}

    def unclaim_many(self, nodes: List[Any], values: List[float]) -> None:
        """Reverse a claim: restore the parked value (additive — other
        deltas may have landed meanwhile) and unmark visited.  Arrival is
        untouched (claimed nodes were already registered).  Used when a
        speculative batched claim over-claimed (pop asked for fewer)."""
        for n, v in zip(nodes, values):
            self.value[n] = self.value.get(n, 0.0) + v
            self.visited.discard(n)

    def mark_visited(self, node: Any) -> None:
        self.visited.add(node)

    def mark_visited_many(self, nodes: List[Any]) -> None:
        self.visited.update(nodes)

    def mark_drainable(self, node: Any) -> None:
        self.drainable.add(node)

    def mark_drainable_many(self, nodes: List[Any]) -> None:
        self.drainable.update(nodes)

    def first_drainable(self, min_value: float) -> Optional[Tuple[Any, float, int]]:
        """Earliest-arrival node with value STRICTLY above min_value and a
        memoized distribution — the sharded form of APPR's drain scan
        (reference appr.py:55-68 picks the first such node in dict
        insertion order; arrival == insertion order here)."""
        best = None
        for n in self.drainable:
            v = self.value.get(n, 0.0)
            if v <= min_value:
                continue
            a = self.arrival.get(n, 0)
            if best is None or a < best[2]:
                best = (n, v, a)
        return best

    def _top_select(self, k: int, min_value: float, skip_visited: bool):
        """Shared top-k selection: (nodes, values, arrivals) sorted by
        (value desc, arrival asc) — O(n) numpy selection (a full Python
        sort of every node per pop round is the shard's scale ceiling at
        10^8+ nodes/shard).  Ties at the k-th value break by arrival
        exactly as the full sort would."""
        n = len(self.value)
        if n == 0 or k <= 0:
            return [], _EMPTY_F64, _EMPTY_I64
        nodes = list(self.value.keys())
        vals = np.fromiter(self.value.values(), dtype=np.float64, count=n)
        mask = vals >= min_value
        if skip_visited and self.visited:
            mask &= np.fromiter(
                (nd not in self.visited for nd in nodes), dtype=bool, count=n
            )
        idx = np.flatnonzero(mask)
        if idx.size == 0:
            return [], _EMPTY_F64, _EMPTY_I64
        arr_get = self.arrival.get
        if idx.size > k:
            sub = vals[idx]
            part = np.argpartition(-sub, k - 1)[:k]
            vk = sub[part].min()  # k-th largest value
            gt = idx[sub > vk]
            eq = idx[sub == vk]
            if gt.size + eq.size > k:  # break value-ties by arrival asc
                eq_arr = np.fromiter(
                    (arr_get(nodes[i], 0) for i in eq), dtype=np.int64, count=eq.size
                )
                eq = eq[np.argsort(eq_arr, kind="stable")][: k - gt.size]
            idx = np.concatenate([gt, eq]) if gt.size else eq
        sel_vals = vals[idx]
        sel_arr = np.fromiter(
            (arr_get(nodes[i], 0) for i in idx), dtype=np.int64, count=idx.size
        )
        order = np.lexsort((sel_arr, -sel_vals))
        return [nodes[i] for i in idx[order]], sel_vals[order], sel_arr[order]

    def top_candidates(self, k: int, min_value: float, skip_visited: bool) -> List[Tuple[Any, float, int]]:
        sn, sv, sa = self._top_select(k, min_value, skip_visited)
        return list(zip(sn, sv.tolist(), sa.tolist()))

    def top_candidates_arr(self, k: int, min_value: float, skip_visited: bool):
        """Columnar top-k: (nodes, values, arrivals) — a k=4096 scan as
        tuple lists pickles ~3x slower than list + two arrays, and the
        tuple rebuild/merge on the caller was the fused pop's hot spot."""
        return self._top_select(k, min_value, skip_visited)

    def ranks(self) -> Dict[Any, float]:
        return dict(self.value)

    def snapshot(self) -> dict:
        return {
            "value": dict(self.value),
            "arrival": dict(self.arrival),
            "visited": list(self.visited),
            "drainable": list(self.drainable),
        }

    def restore(self, state: dict) -> None:
        self.value = dict(state["value"])
        self.arrival = dict(state["arrival"])
        self.visited = set(state["visited"])
        self.drainable = set(state.get("drainable", []))


@ray.remote(num_cpus=0)  # memory-bound service actor; zero CPU claim (see fetch.py)
class RankShard:
    def __init__(self):
        self.core = _RankShardCore()

    def apply_deltas(self, nodes, deltas, arrivals):
        return self.core.apply_deltas(nodes, deltas, arrivals)

    def take(self, node):
        return self.core.take(node)

    def take_many(self, nodes):
        return self.core.take_many(nodes)

    def claim_many(self, nodes):
        return self.core.claim_many(nodes)

    def unclaim_many(self, nodes, values):
        return self.core.unclaim_many(nodes, values)

    def reset(self):
        return self.core.reset()

    def mark_visited(self, node):
        return self.core.mark_visited(node)

    def mark_visited_many(self, nodes):
        return self.core.mark_visited_many(nodes)

    def mark_drainable(self, node):
        return self.core.mark_drainable(node)

    def mark_drainable_many(self, nodes):
        return self.core.mark_drainable_many(nodes)

    def first_drainable(self, min_value):
        return self.core.first_drainable(min_value)

    def top_candidates(self, k, min_value, skip_visited):
        return self.core.top_candidates(k, min_value, skip_visited)

    def top_candidates_arr(self, k, min_value, skip_visited):
        return self.core.top_candidates_arr(k, min_value, skip_visited)

    def ranks(self):
        return self.core.ranks()

    def snapshot(self):
        return self.core.snapshot()

    def restore(self, state):
        return self.core.restore(state)


class RankPool:
    """Facade over K rank shards, routing by xxhash64(node) % K."""

    # process-wide reusable shard actors, keyed by shard count (opt-in via
    # reuse_actors=True — the caller owns "one live pool at a time", the
    # SeenSet convention).  Spawning 8 shard processes costs ~0.5s, the
    # dominant fixed cost of a short crawl.
    _shared_shards: "Dict[int, List[Any]]" = {}

    def __init__(self, num_shards: int = 4, use_ray: bool = True, reuse_actors: bool = False):
        self.num_shards = num_shards
        self.use_ray = use_ray
        if use_ray:
            if reuse_actors:
                shards = RankPool._shared_shards.get(num_shards)
                if shards is not None:
                    # retire any previous crawl's push actor first: its
                    # fire-and-forget claims/applies toward these shards
                    # have no ordering vs our reset wave (different
                    # caller) — a stale claim landing post-reset would
                    # corrupt the fresh crawl's state
                    try:
                        from ..strategies.sharded import flush_cached_push_actors

                        flush_cached_push_actors()
                    except Exception:
                        pass
                    try:  # liveness probe + state reset in one wave
                        ray.get([s.reset.remote() for s in shards])
                    except Exception:
                        shards = None
                if shards is None:
                    shards = [RankShard.remote() for _ in range(num_shards)]
                    RankPool._shared_shards[num_shards] = shards
                self.shards = shards
            else:
                self.shards = [RankShard.remote() for _ in range(num_shards)]
        else:
            self.shards = [_RankShardCore() for _ in range(num_shards)]
        # in-flight fire-and-forget mutation refs.  Ray orders actor tasks
        # per (caller, actor) FIFO, so a read RPC submitted after a mutation
        # RPC on the same shard always observes it — the driver never needs
        # to block on pure mutations (apply/mark).  Refs are retained only
        # to surface worker errors at the next barrier (flush/snapshot).
        self._pending: List[Any] = []

    @classmethod
    def attached(cls, shard_handles: List[Any]) -> "RankPool":
        """Facade over ALREADY-LIVE shard actors (no spawn, no ownership).

        Used by the off-driver push actor (strategies/sharded.py
        _HaircutPushActor): driver and push actor address the SAME shard
        actors, each through its own facade.  The attached facade must
        never be pickled into a checkpoint — the owning strategy
        serializes through the driver-side pool instead."""
        pool = cls.__new__(cls)
        pool.num_shards = len(shard_handles)
        pool.use_ray = True
        pool.shards = list(shard_handles)
        pool._pending = []
        return pool

    def _note(self, refs: List[Any]) -> None:
        self._pending.extend(refs)
        if len(self._pending) >= 512:  # bounded in-flight backlog
            ray.get(self._pending)
            self._pending.clear()

    def flush(self) -> None:
        """Barrier: raise any deferred mutation error (called before
        snapshot/ranks reads that feed checkpoints or results)."""
        if self.use_ray and self._pending:
            ray.get(self._pending)
            self._pending.clear()

    def __getstate__(self) -> dict:
        """Checkpoint form: shard CONTENTS, never actor handles — a handle
        pickled into a checkpoint dies with its Ray session, so a fresh
        process could never resume (pre-r3 bug: sharded crawl --resume
        crashed deserializing RankShard handles)."""
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
            self.shards = [RankShard.remote() for _ in range(self.num_shards)]
        else:
            self.shards = [_RankShardCore() for _ in range(self.num_shards)]
        self.restore(st["states"])

    def _shard_of(self, node: Any) -> int:
        return int(url_hash64([str(node)])[0] % np.uint64(self.num_shards))

    def _shards_of(self, nodes: List[Any]) -> List[int]:
        """Vectorized shard routing — ONE hash call for the whole batch
        (per-node url_hash64 costs a polars Series build each, ~100us;
        batched it's ~ns/node)."""
        return (
            (url_hash64([str(n) for n in nodes]) % np.uint64(self.num_shards))
            .astype(np.int64)
            .tolist()
        )

    def _call(self, shard: int, method: str, *args):
        target = self.shards[shard]
        if self.use_ray:
            return ray.get(getattr(target, method).remote(*args))
        return getattr(target, method)(*args)

    def apply_deltas(self, deltas: List[Tuple[Any, float, int]]) -> None:
        """deltas: [(node, delta, arrival)] — scattered to shards, applied
        concurrently (one batched call per shard)."""
        self.apply_deltas_arr(
            [node for node, _, _ in deltas],
            np.fromiter((d for _, d, _ in deltas), dtype=np.float64, count=len(deltas)),
            np.fromiter((a for _, _, a in deltas), dtype=np.int64, count=len(deltas)),
        )

    def apply_deltas_arr(self, nodes: List[Any], vals: np.ndarray, arrs: np.ndarray) -> None:
        """Columnar :meth:`apply_deltas`: one vectorized hash + one stable
        argsort route the whole batch (the per-tuple Python scatter loop
        was ~13ms per 14k-delta cascade round — half the weight crawl's
        off-driver push time)."""
        n = len(nodes)
        if n == 0:
            return
        shards = np.asarray(self._shards_of(nodes), dtype=np.int64)
        order = np.argsort(shards, kind="stable")
        srt = shards[order]
        starts = np.flatnonzero(np.r_[True, srt[1:] != srt[:-1]])
        bounds = np.r_[starts, n]
        calls = []
        for j, st in enumerate(starts):
            en = bounds[j + 1]
            sel = order[st:en]
            sh = int(srt[st])
            b = ([nodes[i] for i in sel], vals[sel], arrs[sel])
            if self.use_ray:
                calls.append(self.shards[sh].apply_deltas.remote(*b))
            else:
                self.shards[sh].apply_deltas(*b)
        if calls:
            # fire-and-forget: per-actor FIFO ordering makes the next read
            # on each shard see these deltas; no driver block needed
            self._note(calls)

    def take(self, node: Any) -> float:
        return self._call(self._shard_of(node), "take", node)

    def take_many(self, nodes: List[Any]) -> Dict[Any, float]:
        """Batched destructive read — ONE call per shard for the whole node
        list (the engine's per-round form; per-candidate ``take`` RPCs don't
        scale past small pop_k)."""
        per_shard: Dict[int, List[Any]] = {}
        for n, sh in zip(nodes, self._shards_of(nodes)):
            per_shard.setdefault(sh, []).append(n)
        out: Dict[Any, float] = {}
        if self.use_ray:
            parts = ray.get(
                [self.shards[s].take_many.remote(ns) for s, ns in per_shard.items()]
            )
        else:
            parts = [self.shards[s].take_many(ns) for s, ns in per_shard.items()]
        for p in parts:
            out.update(p)
        return out

    def claim_many(self, nodes: List[Any]) -> Dict[Any, float]:
        """Batched pop-claim: mark visited AND park mass in ONE RPC wave
        (vs separate mark_visited_many + take_many waves)."""
        per_shard: Dict[int, List[Any]] = {}
        for n, sh in zip(nodes, self._shards_of(nodes)):
            per_shard.setdefault(sh, []).append(n)
        out: Dict[Any, float] = {}
        if self.use_ray:
            parts = ray.get(
                [self.shards[s].claim_many.remote(ns) for s, ns in per_shard.items()]
            )
        else:
            parts = [self.shards[s].claim_many(ns) for s, ns in per_shard.items()]
        for p in parts:
            out.update(p)
        return out

    def unclaim_many(self, pairs: List[Tuple[Any, float]]) -> None:
        """Reverse claims: [(node, parked_value)] — fire-and-forget (the
        next read per shard observes it by actor FIFO)."""
        per_shard: Dict[int, Tuple[list, list]] = {}
        for (n, v), sh in zip(pairs, self._shards_of([n for n, _ in pairs])):
            b = per_shard.setdefault(sh, ([], []))
            b[0].append(n)
            b[1].append(v)
        if self.use_ray:
            self._note(
                [self.shards[s].unclaim_many.remote(*b) for s, b in per_shard.items()]
            )
        else:
            for s, b in per_shard.items():
                self.shards[s].unclaim_many(*b)

    def mark_visited(self, node: Any) -> None:
        if self.use_ray:
            self._note([self.shards[self._shard_of(node)].mark_visited.remote(node)])
        else:
            self.shards[self._shard_of(node)].mark_visited(node)

    def mark_visited_many(self, nodes: List[Any]) -> None:
        per_shard: Dict[int, List[Any]] = {}
        for n, sh in zip(nodes, self._shards_of(nodes)):
            per_shard.setdefault(sh, []).append(n)
        if self.use_ray:
            self._note(
                [self.shards[s].mark_visited_many.remote(ns) for s, ns in per_shard.items()]
            )
        else:
            for s, ns in per_shard.items():
                self.shards[s].mark_visited_many(ns)

    def mark_drainable(self, node: Any) -> None:
        if self.use_ray:
            self._note([self.shards[self._shard_of(node)].mark_drainable.remote(node)])
        else:
            self.shards[self._shard_of(node)].mark_drainable(node)

    def mark_drainable_many(self, nodes: List[Any]) -> None:
        per_shard: Dict[int, List[Any]] = {}
        for n, sh in zip(nodes, self._shards_of(nodes)):
            per_shard.setdefault(sh, []).append(n)
        if self.use_ray:
            self._note(
                [self.shards[s].mark_drainable_many.remote(ns) for s, ns in per_shard.items()]
            )
        else:
            for s, ns in per_shard.items():
                self.shards[s].mark_drainable_many(ns)

    def first_drainable(self, min_value: float) -> Optional[Tuple[Any, float, int]]:
        """Globally-earliest drainable candidate: per-shard min-arrival
        scan (concurrent), merged by arrival asc — equals the reference
        APPR drain's first-in-insertion-order pick."""
        if self.use_ray:
            firsts = ray.get([s.first_drainable.remote(min_value) for s in self.shards])
        else:
            firsts = [s.first_drainable(min_value) for s in self.shards]
        firsts = [f for f in firsts if f is not None]
        if not firsts:
            return None
        return min(firsts, key=lambda t: t[2])

    def top_candidate(
        self, min_value: float, skip_visited: bool
    ) -> Optional[Tuple[Any, float, int]]:
        """Global argmax: per-shard top-1 gathered concurrently, merged by
        (value desc, arrival asc)."""
        if self.use_ray:
            tops = ray.get(
                [s.top_candidates.remote(1, min_value, skip_visited) for s in self.shards]
            )
        else:
            tops = [s.top_candidates(1, min_value, skip_visited) for s in self.shards]
        merged = [t for shard_tops in tops for t in shard_tops]
        if not merged:
            return None
        merged.sort(key=lambda t: (-t[1], t[2]))
        return merged[0]

    def top_k(
        self, k: int, min_value: float, skip_visited: bool
    ) -> List[Tuple[Any, float, int]]:
        """Global top-k by (value desc, arrival asc): per-shard top-k
        gathered concurrently (one RPC per shard), merged driver-side.
        Equals k sequential ``top_candidate`` picks when each pick's node
        is then taken/visited (the engine's batched-pop contract)."""
        if self.use_ray:
            tops = ray.get(
                [s.top_candidates.remote(k, min_value, skip_visited) for s in self.shards]
            )
        else:
            tops = [s.top_candidates(k, min_value, skip_visited) for s in self.shards]
        merged = [t for shard_tops in tops for t in shard_tops]
        merged.sort(key=lambda t: (-t[1], t[2]))
        return merged[:k]

    def top_k_arr(self, k: int, min_value: float, skip_visited: bool):
        """Columnar global top-k: per-shard array scans merged with one
        numpy lexsort — no Python tuples anywhere (the k=4096 fused-pop
        scan spent ~10ms/round building and sorting 8k·tuples).

        Two-phase for large k: phase 1 asks each shard for only
        k/num_shards + slack candidates (hash sharding balances the true
        split, so each shard's share of the global top-k concentrates
        near k/shards); the merge is provably exact for every shard that
        either returned fewer than its cap (exhausted) or whose LAST
        candidate orders after the merged k-th (nothing it withheld can
        beat the cut).  A shard violating that re-scans with full k in
        phase 2 — rare, and never wrong.  At k=16k this ships ~18k
        instead of ~131k node strings per scan."""
        cap = k
        if self.num_shards > 1 and k >= 1024:
            cap = k // self.num_shards + 256
        parts = self._scan_shards(cap, min_value, skip_visited, range(self.num_shards))
        if cap < k:
            merged = self._merge_parts(parts, k)
            if merged is None:
                return [], _EMPTY_F64, _EMPTY_I64
            nodes, vals, arrs, full = merged
            if len(nodes) == k:
                # exactness check: a shard that maxed its cap AND whose
                # last candidate beats the merged k-th may hold withheld
                # candidates above the cut — rescan it with full k
                cut = (-vals[-1], arrs[-1])
                redo = [
                    i
                    for i, p in enumerate(parts)
                    if len(p[0]) == cap and (-p[1][-1], p[2][-1]) < cut
                ]
            else:
                # under-filled merge: every capped shard holds withheld
                # candidates that belong in the result
                redo = [i for i, p in enumerate(parts) if len(p[0]) == cap]
            if redo:
                fresh = self._scan_shards(k, min_value, skip_visited, redo)
                for i, p in zip(redo, fresh):
                    parts[i] = p
                merged = self._merge_parts(parts, k)
                nodes, vals, arrs, full = merged
            return nodes, vals, arrs
        merged = self._merge_parts(parts, k)
        if merged is None:
            return [], _EMPTY_F64, _EMPTY_I64
        return merged[0], merged[1], merged[2]

    def _scan_shards(self, k, min_value, skip_visited, idxs):
        if self.use_ray:
            return ray.get(
                [
                    self.shards[i].top_candidates_arr.remote(k, min_value, skip_visited)
                    for i in idxs
                ]
            )
        return [self.shards[i].top_candidates_arr(k, min_value, skip_visited) for i in idxs]

    @staticmethod
    def _merge_parts(parts, k):
        live = [p for p in parts if len(p[0])]
        if not live:
            return None
        nodes = [n for p in live for n in p[0]]
        vals = np.concatenate([p[1] for p in live])
        arrs = np.concatenate([p[2] for p in live])
        order = np.lexsort((arrs, -vals))[:k]
        return [nodes[i] for i in order], vals[order], arrs[order], len(nodes)

    def top_k_submit(self, k: int, min_value: float, skip_visited: bool):
        """Submit the per-shard top-k scans WITHOUT collecting — lets the
        engine overlap the scan with its write/checkpoint stage.  Valid
        only when no pool mutation happens between submit and collect
        (per-actor FIFO ordering makes the scan observe everything
        submitted before it)."""
        if not self.use_ray:
            return (k, min_value, skip_visited, None)
        return (
            k,
            min_value,
            skip_visited,
            [s.top_candidates.remote(k, min_value, skip_visited) for s in self.shards],
        )

    def top_k_collect(self, pre, k: int) -> List[Tuple[Any, float, int]]:
        pk, mv, sv, refs = pre
        if refs is None:
            return self.top_k(k, mv, sv)
        assert k <= pk  # per-shard lists carry >= k candidates each
        merged = [t for shard_tops in ray.get(refs) for t in shard_tops]
        merged.sort(key=lambda t: (-t[1], t[2]))
        return merged[:k]

    def ranks(self) -> Dict[Any, float]:
        if self.use_ray:
            parts = ray.get([s.ranks.remote() for s in self.shards])
        else:
            parts = [s.ranks() for s in self.shards]
        out: Dict[Any, float] = {}
        for p in parts:
            out.update(p)
        return out

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
