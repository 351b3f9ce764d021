"""Strategy conformance: our FrontierStrategy implementations must reproduce
the reference PushPopModel classes' exact pop sequence, contexts, and node
ranks on the F3 fixture graphs (FIXTURES.md), for every strategy family."""

import numpy as np
import pytest

from blockchainspider_ray.strategies import STRATEGY_NAMES, load_strategy

from .reference_oracle import drive, edges_to_adjacency, load_reference_strategies

REF = load_reference_strategies()


def _e(i, src, dst, value, ts, symbol="ETH", hash_=None):
    return {
        "hash": hash_ or f"0x{i:064x}",
        "from": src,
        "to": dst,
        "value": float(value),
        "timeStamp": int(ts),
        "symbol": symbol,
    }


def star_graph():
    return [_e(i, "n0", f"n{i}", 10 * i + 1, 100 + i) for i in range(1, 6)]


def chain_graph():
    return [_e(i, f"n{i}", f"n{i+1}", 5 + i, 100 + 10 * i) for i in range(6)]


def cycle_graph():
    es = [_e(i, f"n{i}", f"n{(i+1) % 4}", 3 + i, 100 + i) for i in range(4)]
    es.append(_e(9, "n2", "n2", 7, 104))  # self loop
    return es


def diamond_graph():
    return [
        _e(0, "n0", "n1", 10, 100),
        _e(1, "n0", "n2", 30, 101),
        _e(2, "n1", "n3", 10, 102),
        _e(3, "n2", "n3", 30, 103),
        _e(4, "n3", "n4", 40, 104),
    ]


def multi_symbol_graph():
    # shared hashes + several symbols: exercises TTRRedirect netting + DFS
    return [
        _e(0, "n0", "n1", 10, 100, "AAA", "0xh1"),
        _e(1, "n1", "n0", 200, 100, "BBB", "0xh1"),  # swap inside one tx
        _e(2, "n1", "n2", 150, 110, "BBB", "0xh2"),
        _e(3, "n2", "n3", 50, 120, "BBB", "0xh3"),
        _e(4, "n0", "n2", 5, 105, "AAA", "0xh4"),
        _e(5, "n3", "n0", 4, 130, "AAA", "0xh5"),
        _e(6, "n2", "n1", 60, 125, "BBB", "0xh6"),
    ]


def random_graph(n=60, m=220, seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    vals = rng.integers(1, 1000, m)
    ts = np.sort(rng.integers(1000, 5000, m))
    syms = ["ETH", "USDT", "DAI"]
    hashes = [f"0xr{int(i) // 3:060x}" for i in range(m)]  # shared hashes
    return [
        _e(i, f"n{int(src[i])}", f"n{int(dst[i])}", int(vals[i]), int(ts[i]),
           syms[i % 3], hashes[i])
        for i in range(m)
    ]


GRAPHS = {
    "star": star_graph(),
    "chain": chain_graph(),
    "cycle": cycle_graph(),
    "diamond": diamond_graph(),
    "multi_symbol": multi_symbol_graph(),
    "random": random_graph(),
}

PARAMS = {
    "bfs": {"depth": 3},
    "poison": {"depth": 3},
    "haircut": {"min_weight": 1e-3},
    "appr": {"alpha": 0.15, "epsilon": 1e-5},
    "ttr_base": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3},
    "ttr_weight": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3},
    "ttr_time": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3},
    "ttr_redirect": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3},
    # actor-sharded strategies must reproduce the REFERENCE classes exactly
    # (in-process shard cores; the Ray-actor path is tests/test_rank_pool.py)
    "haircut_sharded": {"min_weight": 1e-3, "num_shards": 3, "use_ray": False},
    "ttr_base_sharded": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3,
                         "num_shards": 3, "use_ray": False},
    "ttr_weight_sharded": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3,
                           "num_shards": 3, "use_ray": False},
    "ttr_time_sharded": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3,
                         "num_shards": 3, "use_ray": False},
    "ttr_redirect_sharded": {"alpha": 0.15, "beta": 0.8, "epsilon": 1e-3,
                             "num_shards": 3, "use_ray": False},
    "appr_sharded": {"alpha": 0.15, "epsilon": 1e-5,
                     "num_shards": 3, "use_ray": False},
}

# sharded strategy -> the reference class it must match — EVERY sharded
# strategy (incl. appr_sharded since r2 and the chip-pool TTRTime /
# TTRRedirect) reproduces the reference pop sequence exactly
REF_ALIAS = {
    "haircut_sharded": "haircut",
    "ttr_base_sharded": "ttr_base",
    "ttr_weight_sharded": "ttr_weight",
    "ttr_time_sharded": "ttr_time",
    "ttr_redirect_sharded": "ttr_redirect",
    "appr_sharded": "appr",  # exact since r2 (arrival-ordered drains)
}
EXACT_NAMES = tuple(STRATEGY_NAMES)


def _ranks_equal(a, b):
    assert set(a) == set(b), f"rank keysets differ: {set(a) ^ set(b)}"
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12, abs=1e-15), f"rank differs at {k}"


@pytest.mark.parametrize("graph_name", list(GRAPHS))
@pytest.mark.parametrize("strat_name", EXACT_NAMES)
def test_strategy_matches_reference(strat_name, graph_name):
    edges = GRAPHS[graph_name]
    adj = edges_to_adjacency(edges)
    source = "n0"
    kwargs = PARAMS[strat_name]

    ref_name = REF_ALIAS.get(strat_name, strat_name)
    ref = REF[ref_name](source=source, **PARAMS[ref_name])
    ours = load_strategy(strat_name, source=source, **kwargs)

    ref_pops, ref_rank = drive(ref, adj, max_steps=300)
    our_pops, our_rank = drive(ours, adj, max_steps=300)

    assert [p[0] for p in our_pops] == [p[0] for p in ref_pops], "pop order differs"
    for (n1, c1), (n2, c2) in zip(our_pops, ref_pops):
        assert set(c1) == set(c2)
        for k in c1:
            if isinstance(c1[k], float):
                assert c1[k] == pytest.approx(c2[k], rel=1e-12)
            else:
                assert c1[k] == c2[k]
    _ranks_equal(our_rank, ref_rank)


@pytest.mark.parametrize("strat_name", ["bfs", "poison"])
def test_visited_set_matches_reference(strat_name):
    edges = GRAPHS["random"]
    adj = edges_to_adjacency(edges)
    ref = REF[strat_name](source="n0", depth=3)
    ours = load_strategy(strat_name, source="n0", depth=3)
    drive(ref, adj, max_steps=500)
    drive(ours, adj, max_steps=500)
    assert set(ours.get_context_snapshot()["vis"]) == set(ref.get_context_snapshot()["vis"])
