"""BFS and Poison (taint) frontier strategies.

Semantics match reference strategies/txs/bfs.py and poison.py exactly:
- visited is marked at POP time, not at discovery;
- BFS enqueues both endpoints of every edge; Poison only follows
  out-edges of the expanded node;
- depth guard: a push at depth d enqueues at d+1 unless d+1 > max_depth
  (BFS additionally re-checks depth at pop, bfs.py:34).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, Tuple

from . import FrontierStrategy


class BFS(FrontierStrategy):
    """Breadth-first frontier (reference strategies/txs/bfs.py:7-47)."""

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source)
        self.max_depth = int(depth)
        self._vis = {source}
        self._queue: deque = deque()

    def push(self, node, edges: list, **kwargs) -> None:
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        if cur_depth + 1 > self.max_depth:
            return
        for e in edges:
            self._queue.append((e.get("from"), cur_depth + 1))
            self._queue.append((e.get("to"), cur_depth + 1))

    def push_pairs(self, node, dsts, **kwargs) -> None:
        """Engine fast path: push out-links (node -> dst for dst in dsts)
        without materializing per-edge dicts.  Identical to :meth:`push`
        over edges [{'from': node, 'to': d}] — both endpoints enqueue."""
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.max_depth:
            return
        self._queue.extend(p for dst in dsts for p in ((node, d), (dst, d)))

    def pop(self) -> Tuple[Any, Dict]:
        while self._queue:
            node, depth = self._queue.popleft()
            if node not in self._vis and depth <= self.max_depth:
                self._vis.add(node)
                return node, {"depth": depth}
        return None, {}

    def get_context_snapshot(self) -> Dict:
        return {"source": self.source, "max_depth": self.max_depth, "vis": list(self._vis)}

    def get_node_rank(self) -> Dict:
        return {}


class Poison(FrontierStrategy):
    """Taint-forward frontier (reference strategies/txs/poison.py:7-41)."""

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source)
        self.depth = int(depth)
        self._vis = {source}
        self._queue: deque = deque()

    def push(self, node, edges: list, **kwargs) -> None:
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        if cur_depth + 1 > self.depth:
            return
        for e in edges:
            if e.get("from") == node:
                self._queue.append((e.get("to"), cur_depth + 1))

    def push_pairs(self, node, dsts, **kwargs) -> None:
        """Engine fast path: all pairs are out-edges of ``node`` by
        construction, so every dst enqueues (taint follows out-edges)."""
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.depth:
            return
        self._queue.extend((dst, d) for dst in dsts)

    def pop(self) -> Tuple[Any, Dict]:
        while self._queue:
            node, depth = self._queue.popleft()
            if node not in self._vis:
                self._vis.add(node)
                return node, {"depth": depth}
        return None, {}

    def get_context_snapshot(self) -> Dict:
        return {"source": self.source, "depth": self.depth, "vis": list(self._vis)}

    def get_node_rank(self) -> Dict:
        return {}
