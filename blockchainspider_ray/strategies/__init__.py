"""Frontier ranking strategies (the reference's PushPop models).

Contract identical to reference strategies/txs/push_pop.py:8-37:

- ``push(node, edges, **ctx)``   — absorb the expansion of ``node``;
- ``pop() -> (node, ctx)``       — next node to expand, or (None, {});
- ``get_context_snapshot()``     — checkpointable state dict;
- ``get_node_rank()``            — node -> score.

Implementations preserve the reference's *observable* semantics exactly —
including pop tie-breaking by dict insertion order — because the north rule
requires our engine to reproduce the reference's crawl ordering under the
same seed list.  Each module cites the reference file it matches.

``edges`` are dicts with keys ``from,to,value,timeStamp,symbol,hash`` (the
transfer shape, reference middlewares/txs/push_pop.py:10-41); for web
crawling the engine maps link edges onto this shape (src_url->from,
dst_url->to, value=1.0).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple


class FrontierStrategy:
    """Base class; see module docstring for the contract."""

    def __init__(self, source: str, **kwargs: Any):
        self.source = source

    def push(self, node: str, edges: list, **kwargs: Any) -> None:
        raise NotImplementedError

    def pop(self) -> Tuple[Any, Dict]:
        raise NotImplementedError

    def get_context_snapshot(self) -> Dict:
        raise NotImplementedError

    def get_node_rank(self) -> Dict:
        raise NotImplementedError

    def __getstate__(self) -> dict:
        """Strategies are pickled into checkpoints; drop the transient
        pop-prefetch (in-flight ObjectRefs can't outlive the session)."""
        state = self.__dict__.copy()
        state.pop("_prefetch", None)
        return state


def _registry():
    from .bfs import BFS, Poison
    from .haircut import Haircut
    from .appr import APPR
    from .sharded import (
        ShardedAPPR,
        ShardedHaircut,
        ShardedTTRAggregate,
        ShardedTTRBase,
        ShardedTTRTime,
        ShardedTTRWeight,
    )
    from .ttr import TTRAggregate, TTRBase, TTRTime, TTRWeight

    return {
        "bfs": BFS,
        "poison": Poison,
        "haircut": Haircut,
        "appr": APPR,
        "ttr_base": TTRBase,
        "ttr_weight": TTRWeight,
        "ttr_time": TTRTime,
        "ttr_redirect": TTRAggregate,
        # actor-sharded scale path (state/rank_pool.py)
        "haircut_sharded": ShardedHaircut,
        "appr_sharded": ShardedAPPR,
        "ttr_base_sharded": ShardedTTRBase,
        "ttr_weight_sharded": ShardedTTRWeight,
        "ttr_time_sharded": ShardedTTRTime,
        "ttr_redirect_sharded": ShardedTTRAggregate,
    }


def load_strategy(name: str, source: str, **kwargs: Any) -> FrontierStrategy:
    reg = _registry()
    key = name.lower()
    if key not in reg:
        raise KeyError(f"unknown strategy {name!r}; have {sorted(reg)}")
    return reg[key](source=source, **kwargs)


def extract_mass(strategy: FrontierStrategy, node):
    """Remove and return ``node``'s residual/weight mass from the strategy.

    Used by the engine's batched pop (pop_k>1): the reference interleaves
    pop/push 1:1 and clears mass only inside ``push`` (e.g. appr.py:27-31,
    haricut.py:25-26), so popping k nodes without this would return the same
    argmax k times.  Zeroing at pop + restoring just before push is
    mathematically identical at k=1 and gives distinct top-k argmaxes at
    k>1 (standard batched push-PPR).  Returns None for FIFO strategies."""
    from .appr import APPR
    from .haircut import Haircut
    from .ttr import TTRAggregate, TTRBase, TTRTime, TTRWeight

    if hasattr(strategy, "extract_mass"):  # sharded strategies own the hook
        return strategy.extract_mass(node)
    if isinstance(strategy, Haircut):
        mass = strategy.weight_map.get(node, 0)
        strategy.weight_map[node] = 0
        return ("haircut", mass)
    if isinstance(strategy, (APPR, TTRBase, TTRWeight)):
        mass = strategy.r.get(node, 0)
        strategy.r[node] = 0
        return ("scalar", mass)
    if isinstance(strategy, TTRTime):
        mass = strategy.r.get(node, {})
        strategy.r[node] = {}
        return ("chips_dict", mass)
    if isinstance(strategy, TTRAggregate):
        mass = strategy.r.get(node, [])
        strategy.r[node] = []
        return ("chips_list", mass)
    return None  # BFS / Poison: pop already consumes the queue entry


def restore_mass(strategy: FrontierStrategy, node, mass) -> None:
    """Put back mass extracted by :func:`extract_mass` (immediately before
    the node's push, so push sees the state the reference would)."""
    if mass is None:
        return
    if hasattr(strategy, "restore_mass"):
        strategy.restore_mass(node, mass)
        return
    kind, value = mass
    if kind == "haircut":
        strategy.weight_map[node] = strategy.weight_map.get(node, 0) + value
    elif kind == "scalar":
        strategy.r[node] = strategy.r.get(node, 0) + value
    elif kind == "chips_dict":
        cur = strategy.r.get(node) or {}
        for t, v in value.items():
            cur[t] = cur.get(t, 0) + v
        strategy.r[node] = cur
    elif kind == "chips_list":
        cur = strategy.r.get(node) or []
        strategy.r[node] = cur + list(value)


STRATEGY_NAMES = (
    "bfs",
    "poison",
    "haircut",
    "appr",
    "ttr_base",
    "ttr_weight",
    "ttr_time",
    "ttr_redirect",
    "haircut_sharded",
    "appr_sharded",
    "ttr_time_sharded",
    "ttr_redirect_sharded",
    "ttr_base_sharded",
    "ttr_weight_sharded",
)
