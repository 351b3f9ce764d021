"""Dataset-native BFS vs the round engine: same reachable set, politeness
invariants under budget, deferral never loses urls."""

import pyarrow.dataset as pads
import pytest


def _seed(pages_store):
    return (
        pads.dataset(f"{pages_store}/part=0", partitioning=None)
        .to_table(columns=["url"])
        .column("url")[0]
        .as_py()
    )


def _engine_bfs_set(pages_store, seed, depth):
    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    eng = CrawlEngine(
        PageStore(pages_store),
        seeds=[seed],
        config=CrawlConfig(
            strategy="bfs",
            strategy_kwargs={"depth": depth},
            pop_k=10_000,
            host_budget=0,
            max_rounds=depth + 2,
            seen_use_ray=False,
        ),
    )
    res = eng.run()
    return {r["url"] for r in res.crawl_order}


def test_unbudgeted_dataset_bfs_matches_engine_reachability(ray_session, pages_store):
    from blockchainspider_ray.crawl.dataset_bfs import DatasetBFSCrawl

    seed = _seed(pages_store)
    depth = 3
    fetched, rounds = DatasetBFSCrawl(
        pages_store, [seed], depth=depth, host_budget=0, seen_use_ray=False
    ).run()
    ds_set = set(fetched.column("url").to_pylist())
    eng_set = _engine_bfs_set(pages_store, seed, depth)
    assert ds_set == eng_set
    assert rounds <= depth + 2
    # every url fetched exactly once
    assert len(ds_set) == fetched.num_rows


def test_budgeted_dataset_bfs_politeness_and_carryover(ray_session, pages_store):
    from blockchainspider_ray.crawl.dataset_bfs import DatasetBFSCrawl
    from blockchainspider_ray.functions.urls import host_of

    seed = _seed(pages_store)
    budget = 3
    fetched, rounds = DatasetBFSCrawl(
        pages_store, [seed], depth=2, host_budget=budget,
        max_rounds=50, seen_use_ray=False,
    ).run()
    # budget never exceeded per (host, round)
    counts = {}
    for u, r in zip(fetched.column("url").to_pylist(), fetched.column("round").to_pylist()):
        key = (host_of(u), r)
        counts[key] = counts.get(key, 0) + 1
    assert counts and max(counts.values()) <= budget
    # carry-over: the budgeted crawl eventually fetches the same urls the
    # unbudgeted one does (deferral defers, never drops)
    unbudgeted, _ = DatasetBFSCrawl(
        pages_store, [seed], depth=2, host_budget=0, seen_use_ray=False
    ).run()
    assert set(fetched.column("url").to_pylist()) == set(
        unbudgeted.column("url").to_pylist()
    )
    # and needs strictly more rounds to do it
    assert rounds >= 2
