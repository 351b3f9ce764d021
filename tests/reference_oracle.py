"""Load the reference PushPop strategy classes as a conformance oracle.

The reference strategies (``/root/reference/BlockchainSpider/strategies/txs``)
are pure Python (stdlib + an OrderedDict LRU); adding /root/reference to
sys.path lets us drive them in-process as the golden model — the snapshot
ships no test suite of its own (SURVEY.md §5).  Reference code is NEVER
imported by the engine, only by tests.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Tuple

REFERENCE_ROOT = "/root/reference"


def load_reference_strategies():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from BlockchainSpider.strategies.txs import (  # type: ignore
        APPR,
        BFS,
        Haircut,
        Poison,
        TTRBase,
        TTRRedirect,
        TTRTime,
        TTRWeight,
    )

    return {
        "bfs": BFS,
        "poison": Poison,
        "haircut": Haircut,
        "appr": APPR,
        "ttr_base": TTRBase,
        "ttr_weight": TTRWeight,
        "ttr_time": TTRTime,
        "ttr_redirect": TTRRedirect,
    }


def drive(strategy, graph: Dict[str, List[dict]], max_steps: int = 200) -> Tuple[list, dict]:
    """Run the push/pop loop the way the reference spider does
    (reference spiders/txs/blockscan.py:138-168): seed with the source,
    expand each popped node from the edge table, stop when pop yields None.

    Returns (pop_sequence [(node, ctx), ...], final node rank dict).
    """
    node, ctx = strategy.source, {}
    pops = []
    for _ in range(max_steps):
        edges = graph.get(node, [])
        strategy.push(node, edges, **ctx)
        node, ctx = strategy.pop()
        if node is None:
            break
        pops.append((node, dict(ctx)))
    return pops, dict(strategy.get_node_rank())


def edges_to_adjacency(edges: List[dict]) -> Dict[str, List[dict]]:
    """node -> all incident edges, preserving input order (what the
    reference 'expand' returns for a node)."""
    adj: Dict[str, List[dict]] = {}
    for e in edges:
        for key in ("from", "to"):
            n = e[key]
            lst = adj.setdefault(n, [])
            if not lst or lst[-1] is not e:
                lst.append(e)
    return adj
