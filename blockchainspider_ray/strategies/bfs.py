"""BFS and Poison (taint) frontier strategies.

Semantics match reference strategies/txs/bfs.py and poison.py exactly:
- visited is marked at POP time, not at discovery;
- BFS enqueues both endpoints of every edge; Poison only follows
  out-edges of the expanded node;
- depth guard: a push at depth d enqueues at d+1 unless d+1 > max_depth
  (BFS additionally re-checks depth at pop, bfs.py:34).

The queue is chunked (one list-pair per push) so the engine's tabular
round path can enqueue a whole round's edges in O(chunks) appends and
drain pops in bulk (``pop_array``) — no per-edge tuple allocation on the
driver.  Scalar ``push``/``pop`` read through the same chunks in exactly
the reference's FIFO order, so conformance mode is unchanged.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from . import FrontierStrategy


class _ChunkQueue:
    """FIFO of ``[urls, depths, offset]`` chunks.

    O(1) bulk enqueue (the chunk is appended as-is, never copied) and
    offset-based consumption: scalar pops advance ``offset`` instead of
    shifting elements.  Pickles with the strategy for checkpoints.
    """

    __slots__ = ("_chunks",)

    def __init__(self) -> None:
        self._chunks: deque = deque()

    def __bool__(self) -> bool:
        return any(c[2] < len(c[0]) for c in self._chunks)

    def __len__(self) -> int:
        return sum(len(c[0]) - c[2] for c in self._chunks)

    def extend_chunk(self, urls: list, depths: list) -> None:
        if urls:
            self._chunks.append([urls, depths, 0])

    def popleft(self):
        """Next (node, depth) or None when empty."""
        chunks = self._chunks
        while chunks:
            c = chunks[0]
            urls, depths, i = c
            if i < len(urls):
                c[2] = i + 1
                return urls[i], depths[i]
            chunks.popleft()
        return None

    # pickle support (deque of lists pickles natively; __slots__ needs these)
    def __getstate__(self):
        return list(self._chunks)

    def __setstate__(self, state):
        self._chunks = deque(state)


def _interleave(a: list, b: list) -> Tuple[list, list]:
    """([a0,b0,a1,b1,...], matching depth duplication helper input)."""
    out = [None] * (2 * len(a))
    out[0::2] = a
    out[1::2] = b
    return out


class _FifoBase(FrontierStrategy):
    """Shared chunk-queue machinery for BFS/Poison."""

    _pop_depth_check = False  # BFS re-checks depth at pop (reference bfs.py:34)

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source)
        self._max_depth = int(depth)
        self._vis = {source}
        self._queue = _ChunkQueue()

    def pop(self) -> Tuple[Any, Dict]:
        vis = self._vis
        md = self._max_depth
        check = self._pop_depth_check
        while True:
            item = self._queue.popleft()
            if item is None:
                return None, {}
            node, depth = item
            if node not in vis and (not check or depth <= md):
                vis.add(node)
                return node, {"depth": depth}

    def pop_array(self, k: int) -> Tuple[List[str], List[int]]:
        """Bulk pop: up to ``k`` unvisited nodes + their depths, marking
        them visited — the engine's tabular round path (one call per
        round instead of k ``pop()`` calls)."""
        vis = self._vis
        md = self._max_depth
        check = self._pop_depth_check
        out_u: List[str] = []
        out_d: List[int] = []
        chunks = self._queue._chunks
        while chunks and len(out_u) < k:
            c = chunks[0]
            urls, depths, i = c
            n = len(urls)
            for j in range(i, n):
                node = urls[j]
                if node not in vis and (not check or depths[j] <= md):
                    vis.add(node)
                    out_u.append(node)
                    out_d.append(depths[j])
                    if len(out_u) == k:
                        c[2] = j + 1
                        return out_u, out_d
            chunks.popleft()
        return out_u, out_d

    @staticmethod
    def _depth_filter(srcs, dsts, depths, md: int):
        """Keep edges whose src depth + 1 <= md; returns (srcs, dsts, d+1
        list) or Nones when nothing survives.  Vectorized over numpy."""
        d = np.asarray(depths, dtype=np.int64) + 1
        if len(d) == 0:
            return None, None, None
        if d.max() > md:
            mask = d <= md
            if not mask.any():
                return None, None, None
            keep = mask.tolist()
            from itertools import compress

            srcs = list(compress(srcs, keep))
            dsts = list(compress(dsts, keep))
            d = d[mask]
        return list(srcs), list(dsts), d.tolist()

    def get_node_rank(self) -> Dict:
        return {}


class BFS(_FifoBase):
    """Breadth-first frontier (reference strategies/txs/bfs.py:7-47)."""

    _pop_depth_check = True

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source, depth=depth, **kwargs)
        self.max_depth = self._max_depth

    def push(self, node, edges: list, **kwargs) -> None:
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.max_depth or not edges:
            return
        urls = _interleave([e.get("from") for e in edges], [e.get("to") for e in edges])
        self._queue.extend_chunk(urls, [d] * len(urls))

    def push_pairs(self, node, dsts, **kwargs) -> None:
        """Engine fast path: push out-links (node -> dst for dst in dsts)
        without materializing per-edge dicts.  Identical to :meth:`push`
        over edges [{'from': node, 'to': d}] — both endpoints enqueue."""
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        n = len(dsts)
        if d > self.max_depth or n == 0:
            return
        urls = _interleave([node] * n, list(dsts))
        self._queue.extend_chunk(urls, [d] * (2 * n))

    def push_edges(self, srcs: Sequence[str], dsts: Sequence[str], depths: Sequence[int]) -> None:
        """Bulk push of a round's edges; ``depths[i]`` is the CURRENT
        depth of ``srcs[i]``.  Enqueue order is (src, dst) interleaved
        per edge — byte-identical to calling :meth:`push_pairs` per src
        in edge order."""
        srcs, dsts, d1 = self._depth_filter(srcs, dsts, depths, self.max_depth)
        if srcs is None:
            return
        urls = _interleave(srcs, dsts)
        self._queue.extend_chunk(urls, _interleave(d1, d1))

    def get_context_snapshot(self) -> Dict:
        return {"source": self.source, "max_depth": self.max_depth, "vis": list(self._vis)}


class Poison(_FifoBase):
    """Taint-forward frontier (reference strategies/txs/poison.py:7-41)."""

    _pop_depth_check = False

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source, depth=depth, **kwargs)
        self.depth = self._max_depth

    def push(self, node, edges: list, **kwargs) -> None:
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.depth:
            return
        dsts = [e.get("to") for e in edges if e.get("from") == node]
        if dsts:
            self._queue.extend_chunk(dsts, [d] * len(dsts))

    def push_pairs(self, node, dsts, **kwargs) -> None:
        """Engine fast path: all pairs are out-edges of ``node`` by
        construction, so every dst enqueues (taint follows out-edges)."""
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.depth or not dsts:
            return
        self._queue.extend_chunk(list(dsts), [d] * len(dsts))

    def push_edges(self, srcs: Sequence[str], dsts: Sequence[str], depths: Sequence[int]) -> None:
        """Bulk push: taint only follows out-edges, so only dsts enqueue
        (in edge order — identical to per-src :meth:`push_pairs`)."""
        _, dsts, d1 = self._depth_filter(srcs, dsts, depths, self.depth)
        if dsts is None:
            return
        self._queue.extend_chunk(dsts, d1)

    def get_context_snapshot(self) -> Dict:
        return {"source": self.source, "depth": self.depth, "vis": list(self._vis)}
