"""Sharded rank pool + distributed strategies vs their local counterparts."""

import pytest

from blockchainspider_ray.strategies import load_strategy
from blockchainspider_ray.strategies.appr import APPR
from blockchainspider_ray.strategies.haircut import Haircut
from blockchainspider_ray.strategies.sharded import ShardedAPPR, ShardedHaircut


def _adjacency(n=40, seed=3):
    """Deterministic weighted digraph as {node: [edge dicts]}."""
    adj = {}
    for i in range(n):
        node = f"n{i}"
        edges = []
        for k in range(1 + (i * 7) % 3):
            j = (i * 13 + k * 5 + seed) % n
            if j == i:
                continue
            edges.append(
                {
                    "from": node,
                    "to": f"n{j}",
                    "value": float(1 + (i + k) % 5),
                    "timeStamp": i,
                    "symbol": "",
                    "hash": f"e{i}_{k}",
                }
            )
        adj[node] = edges
    return adj


def _drive(strategy, adj, max_pops=60):
    order = []
    for _ in range(max_pops):
        node, ctx = strategy.pop()
        if node is None:
            break
        order.append((node, round(list(ctx.values())[0], 12) if ctx else None))
        strategy.push(node, adj.get(node, []))
    return order


def test_sharded_haircut_matches_local_exactly():
    adj = _adjacency()
    local = Haircut(source="n0", min_weight=1e-4)
    sharded = ShardedHaircut(source="n0", min_weight=1e-4, num_shards=3, use_ray=False)
    assert _drive(local, adj) == _drive(sharded, adj)
    lr = local.get_node_rank()
    sr = sharded.get_node_rank()
    for k in set(lr) | set(sr):
        assert abs(lr.get(k, 0) - sr.get(k, 0)) < 1e-12, k


def test_sharded_haircut_matches_local_with_ray_actors(ray_session):
    adj = _adjacency(n=25, seed=9)
    local = Haircut(source="n0", min_weight=1e-4)
    sharded = ShardedHaircut(source="n0", min_weight=1e-4, num_shards=2, use_ray=True)
    assert _drive(local, adj, max_pops=25) == _drive(sharded, adj, max_pops=25)


def test_sharded_appr_matches_local_exactly():
    """r2: drain order is reference-exact (first_drainable by arrival), so
    the sharded pop sequence equals the local one row for row — including
    residual values and credited mass."""
    adj = _adjacency()
    local = APPR(source="n0", alpha=0.15, epsilon=1e-4)
    sharded = ShardedAPPR(source="n0", alpha=0.15, epsilon=1e-4, num_shards=3, use_ray=False)
    lo = _drive(local, adj)
    so = _drive(sharded, adj)
    assert lo == so
    lp, sp = local.get_node_rank(), sharded.get_node_rank()
    for k in set(lp) | set(sp):
        assert abs(lp.get(k, 0) - sp.get(k, 0)) < 1e-12, k


def test_sharded_appr_matches_local_with_ray_actors(ray_session):
    adj = _adjacency(n=25, seed=9)
    local = APPR(source="n0", alpha=0.15, epsilon=1e-4)
    sharded = ShardedAPPR(source="n0", alpha=0.15, epsilon=1e-4, num_shards=2, use_ray=True)
    assert _drive(local, adj, max_pops=25) == _drive(sharded, adj, max_pops=25)


def test_rank_pool_snapshot_restore_roundtrip():
    from blockchainspider_ray.state.rank_pool import RankPool

    pool = RankPool(num_shards=3, use_ray=False)
    pool.apply_deltas([("a", 0.5, 0), ("b", 0.25, 1), ("c", 0.25, 2)])
    pool.mark_visited("a")
    snap = pool.snapshot()
    pool2 = RankPool(num_shards=3, use_ray=False)
    pool2.restore(snap)
    assert pool2.ranks() == pool.ranks()
    assert pool2.top_candidate(0.0, skip_visited=True) == pool.top_candidate(0.0, skip_visited=True)


def test_registry_exposes_sharded_strategies():
    s = load_strategy("haircut_sharded", source="n0", use_ray=False)
    assert isinstance(s, ShardedHaircut)
    s = load_strategy("appr_sharded", source="n0", use_ray=False)
    assert isinstance(s, ShardedAPPR)


def test_engine_crawl_identical_local_vs_sharded(ray_session, pages_store):
    import pyarrow.dataset as pads

    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    seed_url = (
        pads.dataset(f"{pages_store}/part=0", partitioning=None)
        .to_table(columns=["url"])
        .column("url")[0]
        .as_py()
    )

    def crawl(strategy, kwargs):
        eng = CrawlEngine(
            PageStore(pages_store),
            seeds=[seed_url],
            config=CrawlConfig(
                strategy=strategy,
                strategy_kwargs=kwargs,
                pop_k=4,
                host_budget=3,
                max_fetches=60,
                max_rounds=40,
                seen_use_ray=False,
            ),
        )
        res = eng.run()
        return [(r["round"], r["url"]) for r in res.crawl_order]

    local = crawl("haircut", {"min_weight": 1e-4})
    sharded = crawl(
        "haircut_sharded", {"min_weight": 1e-4, "num_shards": 2, "use_ray": False}
    )
    assert local == sharded and len(local) > 5

    local = crawl("appr", {"alpha": 0.15, "epsilon": 1e-5})
    sharded = crawl(
        "appr_sharded", {"alpha": 0.15, "epsilon": 1e-5, "num_shards": 2, "use_ray": False}
    )
    assert local == sharded and len(local) > 5

    # the whole TTR family through the engine's batched pop/push path
    for name, kwargs, min_len in (
        ("ttr_base", {"epsilon": 1e-4}, 4),
        ("ttr_weight", {"epsilon": 1e-4}, 4),
        # temporal strategies barely expand on the synthetic link graph
        # (time-decayed chips fall under epsilon fast) — equality is the
        # load-bearing assertion
        ("ttr_time", {"epsilon": 1e-6}, 1),
        ("ttr_redirect", {"epsilon": 1e-6}, 1),
    ):
        local = crawl(name, dict(kwargs))
        sharded = crawl(
            f"{name}_sharded", {**kwargs, "num_shards": 2, "use_ray": False}
        )
        assert local == sharded and len(local) >= min_len, (name, local, sharded)


def _temporal_adjacency(n=30, seed=5, symbols=("", "TOK")):
    """Weighted digraph with meaningful timestamps/symbols/hashes for the
    temporal TTR strategies."""
    adj = {}
    for i in range(n):
        node = f"n{i}"
        edges = []
        for k in range(1 + (i * 5) % 3):
            j = (i * 11 + k * 7 + seed) % n
            if j == i:
                continue
            edges.append(
                {
                    "from": node,
                    "to": f"n{j}",
                    "value": float(1 + (i + 2 * k) % 4),
                    "timeStamp": 100 + ((i * 13 + k * 29) % 50),
                    "symbol": symbols[(i + k) % len(symbols)],
                    "hash": f"h{i}_{k % 2}",  # shared hashes exercise netting
                }
            )
        adj[node] = edges
    return adj


def _drive_bidir(strategy, adj, max_pops=40):
    """Push with BOTH directions' edges (the engine supplies the node's full
    adjacency: out-edges plus in-edges)."""
    incoming = {}
    for src, edges in adj.items():
        for e in edges:
            incoming.setdefault(e["to"], []).append(e)
    order = []
    for _ in range(max_pops):
        node, ctx = strategy.pop()
        if node is None:
            break
        order.append((node, round(list(ctx.values())[0], 12) if ctx else None))
        strategy.push(node, adj.get(node, []) + incoming.get(node, []))
    return order


def test_sharded_ttr_time_matches_local_exactly():
    from blockchainspider_ray.strategies.sharded import ShardedTTRTime
    from blockchainspider_ray.strategies.ttr import TTRTime

    adj = _temporal_adjacency()
    local = TTRTime(source="n0", alpha=0.15, beta=0.8, epsilon=1e-4)
    sharded = ShardedTTRTime(
        source="n0", alpha=0.15, beta=0.8, epsilon=1e-4, num_shards=3, use_ray=False
    )
    # seed both with the engine's initial push on the source
    local.push("n0", adj["n0"])
    sharded.push("n0", adj["n0"])
    lo = _drive_bidir(local, adj)
    so = _drive_bidir(sharded, adj)
    assert lo == so and len(lo) > 3
    lp, sp = local.get_node_rank(), sharded.get_node_rank()
    for k in set(lp) | set(sp):
        assert abs(lp.get(k, 0) - sp.get(k, 0)) < 1e-12, k


def test_sharded_ttr_aggregate_matches_local_exactly():
    from blockchainspider_ray.strategies.sharded import ShardedTTRAggregate
    from blockchainspider_ray.strategies.ttr import TTRAggregate

    adj = _temporal_adjacency(seed=9)
    local = TTRAggregate(source="n0", alpha=0.15, beta=0.8, epsilon=1e-4)
    sharded = ShardedTTRAggregate(
        source="n0", alpha=0.15, beta=0.8, epsilon=1e-4, num_shards=3, use_ray=False
    )
    local.push("n0", adj["n0"])
    sharded.push("n0", adj["n0"])
    lo = _drive_bidir(local, adj)
    so = _drive_bidir(sharded, adj)
    assert lo == so and len(lo) > 3
    lp, sp = local.get_node_rank(), sharded.get_node_rank()
    for k in set(lp) | set(sp):
        assert abs(lp.get(k, 0) - sp.get(k, 0)) < 1e-12, k


def test_sharded_ttr_time_with_ray_actors(ray_session):
    from blockchainspider_ray.strategies.sharded import ShardedTTRTime
    from blockchainspider_ray.strategies.ttr import TTRTime

    adj = _temporal_adjacency(n=15, seed=2)
    local = TTRTime(source="n0", alpha=0.15, beta=0.8, epsilon=1e-4)
    sharded = ShardedTTRTime(
        source="n0", alpha=0.15, beta=0.8, epsilon=1e-4, num_shards=2, use_ray=True
    )
    local.push("n0", adj["n0"])
    sharded.push("n0", adj["n0"])
    assert _drive_bidir(local, adj, 20) == _drive_bidir(sharded, adj, 20)


def test_registry_exposes_chip_sharded_strategies():
    from blockchainspider_ray.strategies import load_strategy
    from blockchainspider_ray.strategies.sharded import (
        ShardedTTRAggregate,
        ShardedTTRTime,
    )

    s = load_strategy("ttr_time_sharded", source="n0", use_ray=False)
    assert isinstance(s, ShardedTTRTime)
    s = load_strategy("ttr_redirect_sharded", source="n0", use_ray=False)
    assert isinstance(s, ShardedTTRAggregate)


def test_sharded_strategy_pickle_carries_state_not_handles(ray_session):
    """Checkpoint regression (r3): pickling a sharded strategy must embed
    shard CONTENTS, not RankShard/ChipShard actor handles — a handle dies
    with its Ray session, so `crawl --resume` in a fresh process crashed
    deserializing it (pre-r3 bug).  Round-trip must rebuild working actors
    with identical rank state, and any in-flight pop prefetch must be
    dropped, not pickled."""
    import pickle

    from blockchainspider_ray.strategies.sharded import ShardedHaircut

    s = ShardedHaircut(source="a", min_weight=1e-9, num_shards=2, use_ray=True)
    s.push("a", [{"from": "a", "to": "b", "value": 3.0},
                 {"from": "a", "to": "c", "value": 1.0}])
    s.prepare_pop(4)  # leave a prefetch in flight on purpose
    blob = pickle.dumps(s)
    ranks_before = s.pool.ranks()

    s2 = pickle.loads(blob)
    assert not hasattr(s2, "_prefetch") or s2._prefetch is None
    assert s2.pool.use_ray and s2.pool.shards[0] is not s.pool.shards[0]
    assert s2.pool.ranks() == ranks_before
    node, ctx = s2.pop()  # restored pool must actually serve pops
    assert node == "b" and abs(ctx["weight"] - 0.75) < 1e-12


def test_push_round_columnar_matches_generic():
    """push_round_columnar (vectorized web-shape push: value=1.0 edges as
    arrow columns) must reproduce push_round exactly — same ranks, same
    arrival counter, same pop order — across rounds with duplicate
    candidates, in-round cascades (candidate->candidate edges),
    zero-out-degree candidates and parked-mass restores."""
    import random

    import pyarrow as pa

    from blockchainspider_ray.strategies.sharded import ShardedHaircut

    random.seed(3)
    for trial in range(12):
        n_nodes = random.randint(3, 40)
        nodes = [f"n{i}" for i in range(n_nodes)]

        def mk():
            return ShardedHaircut("n0", min_weight=1e-12, num_shards=3, use_ray=False)

        a, b = mk(), mk()
        for rnd in range(3):
            k = random.randint(1, 8)
            cands = [random.choice(nodes) for _ in range(k)]
            if random.random() < 0.5 and rnd:
                cands.append(cands[0])
            items = []
            for c in cands:
                mass = ("haircut", round(random.random(), 3)) if random.random() < 0.6 else None
                items.append((c, mass, {}))
            srcs, dsts = [], []
            for c in cands:
                for _ in range(random.randint(0, 4)):
                    srcs.append(c)
                    dsts.append(random.choice(nodes + [f"x{random.randint(0, 20)}"]))
            adj = {}
            for i, (s, d) in enumerate(zip(srcs, dsts)):
                adj.setdefault(s, []).append(
                    {"from": s, "to": d, "value": 1.0, "timeStamp": 0, "symbol": "", "hash": f"{s}#{i}"}
                )
            a.push_round([(c, m, ctx, adj.get(c, [])) for c, m, ctx in items])
            b.push_round_columnar(items, pa.array(srcs, pa.string()), pa.array(dsts, pa.string()))
            ra, rb = a.get_node_rank(), b.get_node_rank()
            assert a._arrival == b._arrival
            assert set(ra) == set(rb)
            for kk in ra:
                assert abs(ra[kk] - rb[kk]) < 1e-12
            for _ in range(3):
                assert a.pop()[0] == b.pop()[0]


def test_sharded_haircut_ray_checkpoint_resume(pages_store, pages_table, tmp_path):
    """Kill/resume byte-parity for the RAY-actor sharded haircut crawl.

    Regression: the fused push used to claim the NEXT round's pops before
    the round checkpoint was taken, so a resume found those nodes visited
    with their parked mass lost (in an unpersisted object ref) and the
    crawl died early.  Checkpoint mode must defer claims to pop time
    (ShardedHaircut.set_checkpoint_mode)."""
    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    seeds = [pages_table.column("url")[i].as_py() for i in range(6)]

    def run(ckpt, resume=False, max_fetches=None):
        cfg = CrawlConfig(
            strategy="haircut_sharded",
            strategy_kwargs={"min_weight": 1e-9, "num_shards": 2, "use_ray": True},
            pop_k=48,
            host_budget=8,
            max_rounds=200,
            max_fetches=max_fetches,
            seen_use_ray=True,
            seen_shards=2,
            fetch_actors=2,
            checkpoint_dir=ckpt,
        )
        eng = CrawlEngine(PageStore(pages_store), seeds=seeds, config=cfg)
        if resume:
            assert eng.resume()
        return eng.run()

    full = run(str(tmp_path / "full"))
    assert full.fetched > 20
    run(str(tmp_path / "part"), max_fetches=15)
    resumed = run(str(tmp_path / "part"), resume=True)
    assert [r["url"] for r in resumed.crawl_order] == [r["url"] for r in full.crawl_order]
    assert resumed.fetched == full.fetched


def test_top_k_arr_two_phase_exact():
    """The capped two-phase scan (RankPool.top_k_arr) must equal the
    uncapped merge on adversarial splits: (a) one shard holding almost
    the entire top-k (cap violated -> targeted rescan), (b) values below
    min_value shrinking shard returns (under-filled merge -> rescan of
    capped shards), (c) heavy ties broken by arrival."""
    import numpy as np

    from blockchainspider_ray.state.rank_pool import RankPool

    rng = np.random.default_rng(3)
    for case in range(3):
        pool = RankPool(4, use_ray=False)
        n = 6000
        nodes = [f"u{case}_{i}" for i in range(n)]
        if case == 0:
            # skew: nodes hashing to shard 0 carry the big values
            sh = pool._shards_of(nodes)
            vals = [1000.0 + i if s == 0 else rng.random() for i, s in enumerate(sh)]
        elif case == 1:
            vals = rng.random(n).tolist()  # half fall under min_value
        else:
            vals = (rng.integers(0, 5, n) / 4.0).tolist()  # heavy ties
        pool.apply_deltas([(u, v, i) for i, (u, v) in enumerate(zip(nodes, vals))])
        k = 2048  # >= 1024 so the cap path engages
        mv = 0.5 if case == 1 else 1e-9
        got_n, got_v, got_a = pool.top_k_arr(k, mv, skip_visited=True)
        exp = pool.top_k(k, mv, skip_visited=True)
        assert got_n == [t[0] for t in exp], case
        assert np.allclose(got_v, [t[1] for t in exp])
        assert list(got_a) == [t[2] for t in exp]
