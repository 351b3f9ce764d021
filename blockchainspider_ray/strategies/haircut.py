"""Haircut (proportional taint-dilution) frontier strategy.

Semantics match reference strategies/txs/haricut.py:6-54 exactly, including:
- weight flows only along OUT-edges, split proportional to edge value;
- a node with zero out-value keeps its weight (early return);
- pop scans ``weight_map`` in insertion order, skips weights below
  ``min_weight``, first strict max wins, and the popped value is added to
  the visited set even when it is None (quirk preserved at line 40 of the
  reference).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from . import FrontierStrategy


class Haircut(FrontierStrategy):
    def __init__(self, source: str, min_weight: float = 1e-3, **kwargs: Any):
        super().__init__(source)
        self.min_weight = float(min_weight)
        assert 0 < self.min_weight < 1
        self.weight_map: Dict[Any, float] = {source: 1}
        self._vis = {source}

    def push(self, node, edges: list, **kwargs) -> None:
        out_sum = 0.0
        out_edges = []
        for e in edges:
            if e.get("from") == node:
                out_sum += float(e.get("value", 0))
                out_edges.append(e)
        if out_sum == 0:
            return
        node_weight = self.weight_map.get(node, 0)
        self.weight_map[node] = 0
        for oe in out_edges:
            dst = oe.get("to")
            v = float(oe.get("value"))
            self.weight_map[dst] = self.weight_map.get(dst, 0) + node_weight * (v / out_sum)

    def pop(self) -> Tuple[Any, Dict]:
        node, weight = None, 0.0
        for cand, w in self.weight_map.items():
            if w < self.min_weight:
                continue
            if cand not in self._vis and w > weight:
                node, weight = cand, w
        self._vis.add(node)  # reference quirk: None may enter vis
        if node is None:
            return None, {}
        return node, {"weight": weight}

    def get_context_snapshot(self) -> Dict:
        return {
            "source": self.source,
            "min_weight": self.min_weight,
            "weight_map": self.weight_map,
            "vis": list(self._vis),
        }

    def get_node_rank(self) -> Dict:
        return self.weight_map
