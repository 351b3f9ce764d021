"""APPR — push-based approximate personalized PageRank frontier.

Semantics match reference strategies/txs/appr.py:7-89 exactly:
- push on node with residual r: zero residual, credit ``p += alpha*r``,
  then spread ``(1-alpha)*r`` uniformly over the distinct undirected
  neighbour set (self excluded); the neighbour *distribution* is memoized
  in an LRU so later pops can drain residuals without re-expansion;
- pop first drains every node whose residual exceeds epsilon AND whose
  distribution is cached (re-scanning from the start of the dict each
  drain, appr.py:55-68), then returns the argmax residual strictly above
  epsilon (first max wins in insertion order).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Tuple

from . import FrontierStrategy


class LRU:
    """Insertion-ordered LRU with the reference's get/set semantics
    (reference utils/cache.py:4-19: get refreshes recency; set evicts the
    oldest when full)."""

    def __init__(self, max_size: int = 1 << 10):
        self.max_size = max_size
        self._d: OrderedDict = OrderedDict()

    def get(self, key):
        v = self._d.pop(key, None)
        if v is not None:
            self._d[key] = v
        return v

    def set(self, key, value):
        self._d.pop(key, None)
        if len(self._d) >= self.max_size:
            self._d.popitem(last=False)
        self._d[key] = value

    def __len__(self):
        return len(self._d)


class APPR(FrontierStrategy):
    def __init__(self, source: str, alpha: float = 0.15, epsilon: float = 1e-5, **kwargs: Any):
        super().__init__(source)
        self.alpha = float(alpha)
        assert 0 <= self.alpha <= 1
        self.epsilon = float(epsilon)
        assert 0 < self.epsilon < 1
        self.r: Dict[Any, float] = {source: 1}
        self.p: Dict[Any, float] = {}
        self.cache = LRU()

    def push(self, node, edges: list, **kwargs) -> None:
        r_node = self.r.get(node, 0)
        if r_node == 0:
            return
        self.r[node] = 0
        self.p[node] = self.p.get(node, 0) + r_node * self.alpha

        cached = self.cache.get(node)
        if cached is not None:
            for v, d in cached.items():
                self.r[v] = self.r.get(v, 0) + d * r_node
            return

        neighbours = set()
        for e in edges:
            neighbours.add(e.get("from"))
            neighbours.add(e.get("to"))
        neighbours.discard(node)

        n = len(neighbours)
        inc = (1 - self.alpha) * r_node / n if n > 0 else 0
        for nb in neighbours:
            self.r[nb] = self.r.get(nb, 0) + inc
        self.cache.set(node, {nb: (1 - self.alpha) / n for nb in neighbours})

    def pop(self) -> Tuple[Any, Dict]:
        # drain cached-pushable residuals to convergence
        while True:
            node, r_node = None, None
            for cand, res in self.r.items():
                if res <= self.epsilon or not self.cache.get(cand):
                    continue
                node, r_node = cand, res
                break
            if not node:
                break
            self.r[node] = 0
            self.p[node] = self.p.get(node, 0) + r_node * self.alpha
            for v, d in self.cache.get(node).items():
                self.r[v] = self.r.get(v, 0) + d * r_node

        node, r = None, self.epsilon
        for cand, res in self.r.items():
            if res > r:
                node, r = cand, res
        if node is None:
            return None, {}
        return node, {"residual": r}

    def get_context_snapshot(self) -> Dict:
        return {
            "source": self.source,
            "alpha": self.alpha,
            "epsilon": self.epsilon,
            "r": self.r,
            "p": self.p,
        }

    def get_node_rank(self) -> Dict:
        return self.p
