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


def _registry():
    from .bfs import BFS, Poison
    from .haircut import Haircut
    from .appr import APPR
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
    }


def load_strategy(name: str, source: str, **kwargs: Any) -> FrontierStrategy:
    reg = _registry()
    key = name.lower()
    if key not in reg:
        raise KeyError(f"unknown strategy {name!r}; have {sorted(reg)}")
    return reg[key](source=source, **kwargs)


STRATEGY_NAMES = (
    "bfs",
    "poison",
    "haircut",
    "appr",
    "ttr_base",
    "ttr_weight",
    "ttr_time",
    "ttr_redirect",
)
