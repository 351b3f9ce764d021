"""Tabular (array-native) engine round loop vs the scalar loop.

The tabular path (CrawlEngine._run_tabular, engaged for FIFO strategies
above CrawlConfig.tabular_threshold) must reproduce the scalar loop's
observable behavior exactly: crawl order rows, fetched/round counts,
deferred carry-over, checkpoint/resume byte-identity.
"""

import pyarrow.parquet as pq
import pytest

from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
from blockchainspider_ray.stages.fetch import PageStore


def _run(store, seeds, strategy, *, tabular: bool, budget=0, depth=6,
         max_fetches=220, spool_dir=None, checkpoint_dir=None, resume=False):
    cfg = CrawlConfig(
        strategy=strategy,
        strategy_kwargs={"depth": depth},
        pop_k=96,
        host_budget=budget,
        max_fetches=max_fetches,
        max_rounds=40,
        seen_use_ray=False,
        seen_backend="exact",
        fetch_actors=0,
        # force the path under test: the scalar loop only runs when pop_k
        # <= tabular_threshold
        tabular_threshold=0 if tabular else 10**9,
        spool_dir=spool_dir,
        checkpoint_dir=checkpoint_dir,
    )
    engine = CrawlEngine(PageStore(store), seeds=seeds, config=cfg)
    if resume:
        assert engine.resume()
    return engine.run()


@pytest.mark.parametrize("strategy", ["bfs", "poison"])
@pytest.mark.parametrize("budget", [0, 2])
def test_tabular_matches_scalar(pages_store, pages_table, strategy, budget):
    seeds = [
        pages_table.column("url")[0].as_py(),
        pages_table.column("url")[7].as_py(),
    ]
    a = _run(pages_store, seeds, strategy, tabular=False, budget=budget)
    b = _run(pages_store, seeds, strategy, tabular=True, budget=budget)
    assert a.crawl_order == b.crawl_order
    assert a.fetched == b.fetched
    assert a.rounds == b.rounds
    # per-round control-plane metrics line up too (stage timings excluded)
    keys = ("round", "candidates", "admitted", "deferred", "already_seen", "fetched", "missing", "edges")
    ma = [{k: m[k] for k in keys if k in m} for m in a.metrics]
    mb = [{k: m[k] for k in keys if k in m} for m in b.metrics]
    assert ma == mb


def test_tabular_spool_and_outputs(pages_store, pages_table, tmp_path):
    seeds = [pages_table.column("url")[0].as_py()]
    spool_a, spool_b = str(tmp_path / "a"), str(tmp_path / "b")
    out_a, out_b = str(tmp_path / "oa"), str(tmp_path / "ob")
    a = _run(pages_store, seeds, "bfs", tabular=False, budget=3, spool_dir=spool_a)
    b = _run(pages_store, seeds, "bfs", tabular=True, budget=3, spool_dir=spool_b)
    assert a.crawl_order == b.crawl_order
    assert a.order_rows == b.order_rows > 0
    # spooled parquet holds identical rows (schema may be string vs
    # large_string; values must match)
    ta = pq.read_table(a.order_dir).to_pylist()
    tb = pq.read_table(b.order_dir).to_pylist()
    assert ta == tb


def test_tabular_checkpoint_resume(pages_store, pages_table, tmp_path):
    seeds = [pages_table.column("url")[0].as_py()]
    ck_full, ck_part = str(tmp_path / "full"), str(tmp_path / "part")
    full = _run(pages_store, seeds, "bfs", tabular=True, budget=2,
                max_fetches=200, checkpoint_dir=ck_full)
    # run a truncated crawl, then resume it to completion
    _run(pages_store, seeds, "bfs", tabular=True, budget=2,
         max_fetches=60, checkpoint_dir=ck_part)
    resumed = _run(pages_store, seeds, "bfs", tabular=True, budget=2,
                   max_fetches=200, checkpoint_dir=ck_part, resume=True)
    # resume() reloads the full history, so the resumed order must equal
    # the uninterrupted run's byte-for-byte
    assert [r["url"] for r in resumed.crawl_order] == [r["url"] for r in full.crawl_order]
    assert resumed.fetched == full.fetched


def test_hosts_of_array_parity():
    from blockchainspider_ray.functions.urls import host_of, hosts_of_array

    battery = [
        "http://example.com/a",
        "https://Sub.Example.COM:8443/x?b=1",
        "https://example.com:443/default-port",
        "http://user:pw@host.net/secret",
        "http://[::1]:8080/v6",
        "not a url",
        "ftp://files.example.org/pub",
        "http://host",
        "http://host./trailing-dot",
        "http://xn--bcher-kva.example/idn",
    ]
    # pad above the vectorized-path threshold with canonical urls
    urls = battery + [f"http://host{i}.example.com/p/{i}" for i in range(300)]
    assert hosts_of_array(urls) == [host_of(u) for u in urls]


def test_pop_array_vectorized_matches_scalar():
    """The polars fast path in _FifoBase.pop_array (columnar chunks >=512
    entries) must reproduce the scalar loop's outputs exactly: same urls,
    same depths, same order, same consumption offsets across interleaved
    pops — including intra-chunk duplicates, already-visited skips and the
    BFS pop-time depth gate."""
    import random

    import numpy as np
    import pyarrow as pa

    import blockchainspider_ray.strategies.bfs as B
    from blockchainspider_ray.strategies.bfs import BFS, Poison

    random.seed(11)
    for trial in range(25):
        n = random.randint(1, 2000)
        srcs = [f"u{random.randint(0, n // 2)}" for _ in range(n)]
        dsts = [f"v{random.randint(0, n // 2)}" for _ in range(n)]
        depths = [random.randint(0, 5) for _ in range(n)]
        pushes = [("cols", (srcs, dsts, depths))]
        if trial % 3 == 0:  # interleave a scalar push between bulk ones
            pushes.append(("pairs", ("u1", [f"w{i}" for i in range(17)], 1)))
            pushes.append(("cols", (dsts[:50], srcs[:50], depths[:50])))
        pops = [random.randint(1, 700) for _ in range(4)]
        for cls in (BFS, Poison):
            fast = cls("seed", depth=4)
            for kind, data in pushes:
                if kind == "cols":
                    fast.push_edges(pa.array(data[0]), pa.array(data[1]), np.asarray(data[2]))
                else:
                    fast.push_pairs(data[0], data[1], depth=data[2])
            slow = cls("seed", depth=4)
            for kind, data in pushes:
                if kind == "cols":
                    slow.push_edges(list(data[0]), list(data[1]), list(data[2]))
                else:
                    slow.push_pairs(data[0], data[1], depth=data[2])
            for c in slow._queue._chunks:  # force every chunk onto the scalar path
                B._ChunkQueue._touch(c)
            for k in pops:
                assert fast.pop_array(k) == slow.pop_array(k), (cls.__name__, trial, k)


@pytest.mark.parametrize("strategy", ["bfs", "poison"])
def test_refs_regime_matches_inline(pages_store, tmp_path, strategy, monkeypatch):
    """The driver-edge-free refs regime (fetch_parse_refs + off-driver
    push-join task + ObjectRef frontier chunks + ref-writing round
    outputs) must reproduce the inline tabular path exactly: same crawl
    order, same metrics counts, same round-output parquet contents."""
    import pyarrow.dataset as pads

    seeds = [
        pads.dataset(f"{pages_store}/part=0", partitioning=None)
        .to_table(columns=["url"])
        .column("url")[0]
        .as_py()
    ]

    def run(out_dir, refs: bool):
        # refs regime needs a fetch pool + rounds above the balance
        # threshold; force the threshold to 1 url so every round uses it
        monkeypatch.setenv("BCS_FP_BALANCE_MIN", "1" if refs else "1000000000")
        cfg = CrawlConfig(
            strategy=strategy,
            strategy_kwargs={"depth": 6},
            pop_k=96,
            max_fetches=220,
            max_rounds=40,
            seen_use_ray=False,
            seen_backend="exact",
            fetch_actors=2,
            tabular_threshold=0,
            out_dir=str(out_dir),
        )
        return CrawlEngine(PageStore(pages_store), seeds=seeds, config=cfg).run()

    a = run(tmp_path / "inline", refs=False)
    b = run(tmp_path / "refs", refs=True)
    assert [r["url"] for r in a.crawl_order] == [r["url"] for r in b.crawl_order]
    assert a.fetched == b.fetched and a.rounds == b.rounds
    ea = [m.get("edges", 0) for m in a.metrics]
    eb = [m.get("edges", 0) for m in b.metrics]
    assert ea == eb
    for sub in ("text", "edges"):
        ta = pq.read_table(f"{tmp_path}/inline/{sub}").sort_by("url" if sub == "text" else "src_url")
        tb = pq.read_table(f"{tmp_path}/refs/{sub}").sort_by("url" if sub == "text" else "src_url")
        assert ta.equals(tb), sub


def test_pipeline_mode_same_fetch_set(pages_store, pages_table, monkeypatch):
    """pipeline=True (round-pipelining throughput mode) relaxes round
    COMPOSITION, not crawl semantics: on an exhaustive crawl it must fetch
    exactly the same url set as the strict BSP loop, fetch nothing twice,
    and keep every round inside the per-host politeness budget."""
    from collections import Counter

    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    # tiny rounds must still take the refs/fused path pipelining rides on
    monkeypatch.setenv("BCS_FP_BALANCE_MIN", "1")
    seeds = [pages_table.column("url")[0].as_py(), pages_table.column("url")[7].as_py()]

    def run(pipeline):
        cfg = CrawlConfig(
            strategy="bfs",
            strategy_kwargs={"depth": 8},
            pop_k=96,
            host_budget=3,
            max_rounds=400,
            seen_use_ray=True,
            seen_shards=2,
            fetch_actors=2,
            tabular_threshold=0,
            pipeline=pipeline,
            pipeline_min_pop=4,
        )
        return CrawlEngine(PageStore(pages_store), seeds=seeds, config=cfg).run()

    strict = run(False)
    piped = run(True)
    # same fetch set, nothing fetched twice
    su = [r["url"] for r in strict.crawl_order if r["found"]]
    pu = [r["url"] for r in piped.crawl_order if r["found"]]
    assert Counter(pu) == Counter(su)
    assert max(Counter(pu).values()) == 1
    assert piped.fetched == strict.fetched
    # politeness: no round admitted more than host_budget urls of one host
    from blockchainspider_ray.functions.urls import host_of

    for res in (strict, piped):
        per_round_host = Counter()
        for r in res.crawl_order:
            per_round_host[(r["round"], host_of(r["url"]))] += 1
        assert max(per_round_host.values()) <= 3
