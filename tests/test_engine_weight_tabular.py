"""The columnar (tabular) weight-crawl round loop must be row-for-row
identical to the scalar loop: same crawl order, ranks, per-round metrics.
The tabular loop (engine._run_tabular_weight, VERDICT r4 #1) replaces the
per-candidate Python control plane with polars frames and ships edges to
the push actor as object refs — pure mechanics, zero semantic change."""

import pytest


def _crawl(pages_store, pages_table, tabular_threshold, host_budget=8, seeds_n=6):
    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    seeds = [pages_table.column("url")[i].as_py() for i in range(seeds_n)]
    cfg = CrawlConfig(
        strategy="haircut_sharded",
        strategy_kwargs={
            "min_weight": 1e-9, "num_shards": 2, "use_ray": True,
            "reuse_actors": True,
        },
        pop_k=128,
        host_budget=host_budget,
        max_rounds=200,
        seen_use_ray=True,
        seen_shards=2,
        fetch_actors=2,
        tabular_threshold=tabular_threshold,
    )
    eng = CrawlEngine(PageStore(pages_store), seeds=seeds, config=cfg)
    return eng.run()


def test_weight_tabular_equals_scalar(ray_session, pages_store, pages_table):
    tab = _crawl(pages_store, pages_table, tabular_threshold=64)
    scal = _crawl(pages_store, pages_table, tabular_threshold=10**9)
    assert tab.fetched == scal.fetched and tab.fetched > 20
    assert [(r["url"], r["round"], r["pop_index"]) for r in tab.crawl_order] == [
        (r["url"], r["round"], r["pop_index"]) for r in scal.crawl_order
    ]
    rt, rs = tab.ranks, scal.ranks
    assert set(rt) == set(rs)
    assert all(abs(rt[u] - rs[u]) <= 1e-9 for u in rt)
    # per-round composition identical (strict BSP on both sides)
    for mt, ms in zip(tab.metrics, scal.metrics):
        for key in ("candidates", "admitted", "deferred", "fetched", "edges"):
            assert mt.get(key) == ms.get(key), (mt["round"], key, mt, ms)


def test_weight_tabular_budget_deferrals(ray_session, pages_store, pages_table):
    """Tight per-host budget forces deferrals across rounds — the
    deferred frame's mass column must carry parked mass identically to
    the scalar Candidate.mass path."""
    tab = _crawl(pages_store, pages_table, tabular_threshold=64, host_budget=2)
    scal = _crawl(pages_store, pages_table, tabular_threshold=10**9, host_budget=2)
    assert [r["url"] for r in tab.crawl_order] == [r["url"] for r in scal.crawl_order]
    assert tab.fetched == scal.fetched
    assert any(m.get("deferred", 0) > 0 for m in tab.metrics)


def test_weight_tabular_gate_excludes_checkpoint(ray_session, pages_store, pages_table, tmp_path):
    """Checkpointed weight crawls must keep the scalar loop (the tabular
    frame/claim state is not checkpoint-form) — resume parity stays the
    kill/resume suite's guarantee."""
    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    seeds = [pages_table.column("url")[i].as_py() for i in range(6)]
    cfg = CrawlConfig(
        strategy="haircut_sharded",
        strategy_kwargs={"min_weight": 1e-9, "num_shards": 2, "use_ray": True},
        pop_k=128, host_budget=8, max_rounds=20,
        seen_use_ray=True, seen_shards=2, fetch_actors=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    eng = CrawlEngine(PageStore(pages_store), seeds=seeds, config=cfg)
    res = eng.run()
    assert res.fetched > 0  # ran through the scalar loop without error


def test_weight_tabular_incremental_refs_equals_scalar(ray_session, pages_store, pages_table, monkeypatch):
    """Force the refs regime (BCS_FP_BALANCE_MIN=0) so every round takes
    the incremental per-bundle cascade path (_haircut_round_incremental)
    — it must reproduce the scalar loop's crawl order, ranks and
    per-round metrics exactly."""
    monkeypatch.setenv("BCS_FP_BALANCE_MIN", "0")
    tab = _crawl(pages_store, pages_table, tabular_threshold=64)
    monkeypatch.delenv("BCS_FP_BALANCE_MIN")
    scal = _crawl(pages_store, pages_table, tabular_threshold=10**9)
    assert tab.fetched == scal.fetched and tab.fetched > 20
    assert [(r["url"], r["round"]) for r in tab.crawl_order] == [
        (r["url"], r["round"]) for r in scal.crawl_order
    ]
    rt, rs = tab.ranks, scal.ranks
    assert set(rt) == set(rs)
    assert all(abs(rt[u] - rs[u]) <= 1e-9 for u in rt)
    for mt, ms in zip(tab.metrics, scal.metrics):
        for key in ("candidates", "admitted", "fetched", "edges"):
            assert mt.get(key) == ms.get(key), (mt["round"], key)


def test_weight_tabular_seed_mass(ray_session, pages_store, pages_table):
    """Multi-source weight crawl (CrawlConfig.seed_mass): extra seeds get
    starting mass, so their components get crawled; tabular == scalar."""
    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    seeds = [pages_table.column("url")[i].as_py() for i in range(10)]

    def run(threshold):
        cfg = CrawlConfig(
            strategy="haircut_sharded",
            strategy_kwargs={"min_weight": 1e-9, "num_shards": 2, "use_ray": True,
                             "reuse_actors": True},
            pop_k=128, host_budget=8, max_rounds=200,
            seen_use_ray=True, seen_shards=2, fetch_actors=2,
            tabular_threshold=threshold, seed_mass=1.0,
        )
        return CrawlEngine(PageStore(pages_store), seeds=seeds, config=cfg).run()

    tab = run(64)
    scal = run(10**9)
    assert tab.fetched == scal.fetched
    assert [r["url"] for r in tab.crawl_order] == [r["url"] for r in scal.crawl_order]
    rt, rs = tab.ranks, scal.ranks
    assert set(rt) == set(rs) and all(abs(rt[u] - rs[u]) <= 1e-9 for u in rt)
    # seed mass actually spreads: the crawl reaches beyond the 10 seeds
    assert tab.fetched > 10


def test_weight_pipelined_exhaustive_set_equals_strict(ray_session, pages_store, pages_table):
    """pipeline=True on a weight strategy relaxes pop scheduling by ONE
    round (stale scan+claim submitted ahead of the cascade — see
    _HaircutPushActor.scan_claim).  On an exhaustive crawl the fetch SET
    must equal the strict loop's (weights only accumulate until claimed),
    and total credited+residual mass is conserved; per-round composition
    may differ — the same guarantee class as BFS pipeline mode."""
    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    seeds = [pages_table.column("url")[i].as_py() for i in range(8)]

    def run(pipeline):
        cfg = CrawlConfig(
            strategy="haircut_sharded",
            strategy_kwargs={"min_weight": 1e-9, "num_shards": 2, "use_ray": True,
                             "reuse_actors": True},
            pop_k=128, host_budget=16, max_rounds=300,
            seen_use_ray=True, seen_shards=2, fetch_actors=2,
            tabular_threshold=64, seed_mass=1.0, pipeline=pipeline,
        )
        return CrawlEngine(PageStore(pages_store), seeds=seeds, config=cfg).run()

    strict = run(False)
    piped = run(True)
    assert strict.fetched > 20
    assert {r["url"] for r in piped.crawl_order} == {r["url"] for r in strict.crawl_order}
    assert piped.fetched == strict.fetched
    # rank support identical on exhaustive crawls; values may differ only
    # through round composition (cascade order), so compare totals
    rs, rp = strict.ranks, piped.ranks
    assert abs(sum(rs.values()) - sum(rp.values())) <= 1e-6 * max(sum(rs.values()), 1.0)


@pytest.mark.full
def test_weight_tabular_production_shape_equals_scalar(ray_session, tmp_path_factory):
    """Production-shape conformance: a 20k-page store with pop_k=2048
    rounds engages EVERY fast path at once — the vectorized fused cascade
    (duplicate-free big rounds), the two-phase capped scan, the refs
    regime (edge tables to the push actor), positional claim flags, and
    the numpy admit kernel — and must still match the scalar loop row for
    row."""
    import pyarrow.dataset as pads

    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.fixtures import ensure_pages_store
    from blockchainspider_ray.stages.fetch import PageStore

    d = tmp_path_factory.mktemp("wbig")
    store = ensure_pages_store(str(d / "store"), n_pages=20000, seed=9,
                               n_hosts=24, num_partitions=8)
    urls = pads.dataset(f"{store}/part=0", partitioning=None).to_table(
        columns=["url"]
    ).column("url")
    seeds = [urls[i].as_py() for i in range(0, len(urls), max(1, len(urls) // 12))][:12]

    def run(threshold):
        cfg = CrawlConfig(
            strategy="haircut_sharded",
            strategy_kwargs={"min_weight": 1e-9, "num_shards": 4,
                             "use_ray": True, "reuse_actors": True},
            pop_k=2048, host_budget=512, max_fetches=6000, max_rounds=60,
            seen_use_ray=True, seen_shards=4, fetch_actors=4,
            tabular_threshold=threshold, seed_mass=1.0,
        )
        return CrawlEngine(PageStore(store), seeds=seeds, config=cfg).run()

    tab = run(64)
    scal = run(10**9)
    assert tab.fetched == scal.fetched and tab.fetched > 1000
    assert [(r["url"], r["round"]) for r in tab.crawl_order] == [
        (r["url"], r["round"]) for r in scal.crawl_order
    ]
    rt, rs = tab.ranks, scal.ranks
    assert set(rt) == set(rs)
    assert all(abs(rt[u] - rs[u]) <= 1e-9 for u in rt)
