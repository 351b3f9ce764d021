"""Crawl-engine tests: ordering conformance vs a driver-side oracle,
politeness carry-over, robots, and kill/resume byte-identity."""

import pyarrow.parquet as pq
import pytest

from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
from blockchainspider_ray.functions.links import decode_html, extract_hrefs, extract_script_srcs
from blockchainspider_ray.functions.urls import canonicalize_url
from blockchainspider_ray.stages.fetch import PageStore
from blockchainspider_ray.strategies import load_strategy


def _oracle_crawl(pages_table, seed, strategy_name="bfs", max_fetches=30, **kw):
    """Sequential reference-loop crawl over the fixture web: pop 1, fetch,
    push out-links — the semantics CrawlEngine must reproduce in k=1 mode."""
    html_by_url = {
        u: decode_html(h)
        for u, h in zip(
            pages_table.column("url").to_pylist(), pages_table.column("html").to_pylist()
        )
    }
    ts_by_url = {
        u: int(t.timestamp())
        for u, t in zip(
            pages_table.column("url").to_pylist(), pages_table.column("warc_ts").to_pylist()
        )
    }
    strat = load_strategy(strategy_name, source=seed, **kw)
    order = []
    node = seed
    while node is not None and len(order) < max_fetches:
        order.append(node)
        html = html_by_url.get(node, "")
        edges = []
        refs = list(extract_hrefs(html)) + list(extract_script_srcs(html))
        for i, href in enumerate(refs):
            dst = canonicalize_url(href, base=node)
            if dst is None:
                continue
            edges.append(
                {"from": node, "to": dst, "value": 1.0,
                 "timeStamp": ts_by_url.get(node, 0), "symbol": "",
                 "hash": f"{node}#{i}"}
            )
        strat.push(node, edges, **ctx if (ctx := {}) else {})
        node, _ctx = strat.pop()
    # weight strategies legitimately re-pop a node whose residual
    # re-accumulated; the engine fetches+pushes those again but records a
    # url once in crawl_order — compare against first occurrences
    return list(dict.fromkeys(order))


@pytest.mark.parametrize("strategy", ["bfs", "poison", "haircut", "appr", "ttr_base"])
def test_engine_k1_matches_oracle_order(pages_store, pages_table, strategy):
    seed = pages_table.column("url")[0].as_py()
    kw = {"depth": 2} if strategy in ("bfs", "poison") else {}
    engine = CrawlEngine(
        PageStore(pages_store),
        seeds=[seed],
        config=CrawlConfig(
            strategy=strategy,
            strategy_kwargs=kw,
            pop_k=1,
            max_fetches=25,
            max_rounds=100,
            seen_use_ray=False,
            seen_backend="exact",
        ),
    )
    res = engine.run()
    got = [r["url"] for r in res.crawl_order]
    want = _oracle_crawl(pages_table, seed, strategy, max_fetches=80, **kw)
    assert got == want[: len(got)]
    assert res.fetched > 0


def test_engine_politeness_budget_respected(pages_store, pages_table):
    seed = pages_table.column("url")[0].as_py()
    budget = 1
    engine = CrawlEngine(
        PageStore(pages_store),
        seeds=[seed],
        config=CrawlConfig(
            strategy="bfs",
            strategy_kwargs={"depth": 2},
            pop_k=8,
            host_budget=budget,
            max_fetches=40,
            max_rounds=50,
            seen_use_ray=False,
        ),
    )
    res = engine.run()
    # no (host, round) exceeds the budget
    from collections import Counter

    per_round_host = Counter()
    for r in res.crawl_order:
        host = r["url"].split("/")[2]
        per_round_host[(r["round"], host)] += 1
    assert max(per_round_host.values()) <= budget
    # deferral happened at least once (the skewed host guarantees pressure)
    assert any(m.get("deferred", 0) > 0 for m in res.metrics)
    # and deferred urls were not lost: all crawl_order urls unique
    urls = [r["url"] for r in res.crawl_order]
    assert len(urls) == len(set(urls))


def test_engine_outputs_and_ranks(pages_store, pages_table, tmp_path):
    seed = pages_table.column("url")[0].as_py()
    out = tmp_path / "out"
    engine = CrawlEngine(
        PageStore(pages_store),
        seeds=[seed],
        config=CrawlConfig(
            strategy="haircut",
            pop_k=4,
            max_fetches=12,
            max_rounds=20,
            seen_use_ray=False,
            out_dir=str(out),
        ),
    )
    engine.run()
    text_files = sorted((out / "text").glob("*.parquet"))
    assert text_files
    t = pq.read_table(text_files[0])
    assert set(t.column_names) == {"url", "text_extracted"}
    # text output matches the golden text column byte-for-byte
    golden = dict(
        zip(pages_table.column("url").to_pylist(), pages_table.column("text").to_pylist())
    )
    for u, txt in zip(t.column("url").to_pylist(), t.column("text_extracted").to_pylist()):
        assert golden[u] == txt
    rank_files = sorted((out / "ranks").glob("*.parquet"))
    assert rank_files
    rt = pq.read_table(rank_files[-1])
    scores = rt.column("score").to_pylist()
    assert scores == sorted(scores, reverse=True)


def test_engine_kill_and_resume_identical(pages_store, pages_table, tmp_path):
    seed = pages_table.column("url")[0].as_py()

    def mk(ckpt, max_fetches):
        return CrawlEngine(
            PageStore(pages_store),
            seeds=[seed],
            config=CrawlConfig(
                strategy="bfs",
                strategy_kwargs={"depth": 2},
                pop_k=4,
                host_budget=2,
                max_fetches=max_fetches,
                max_rounds=60,
                seen_use_ray=False,
                checkpoint_dir=ckpt,
            ),
        )

    # uninterrupted run
    full = mk(str(tmp_path / "ckpt_a"), 30).run()

    # killed run: stop early, then resume from checkpoint in a NEW engine
    mk(str(tmp_path / "ckpt_b"), 12).run()
    resumed_engine = mk(str(tmp_path / "ckpt_b"), 30)
    assert resumed_engine.resume()
    resumed = resumed_engine.run()

    assert [r["url"] for r in resumed.crawl_order] == [r["url"] for r in full.crawl_order]
    assert [r["round"] for r in resumed.crawl_order] == [r["round"] for r in full.crawl_order]
    assert resumed.ranks == full.ranks


def test_engine_spooled_order_matches_and_resumes(pages_store, pages_table, tmp_path):
    """spool_dir mode: the driver accumulates NO crawl order (O(round)
    memory); the spooled parquet equals the in-memory mode's crawl_order,
    including across kill/resume."""
    seed = pages_table.column("url")[0].as_py()

    def mk(max_fetches, spool=None, ckpt=None):
        return CrawlEngine(
            PageStore(pages_store),
            seeds=[seed],
            config=CrawlConfig(
                strategy="bfs",
                strategy_kwargs={"depth": 2},
                pop_k=4,
                host_budget=2,
                max_fetches=max_fetches,
                max_rounds=60,
                seen_use_ray=False,
                spool_dir=spool,
                checkpoint_dir=ckpt,
            ),
        )

    plain = mk(30).run()
    eng = mk(30, spool=str(tmp_path / "spool_a"))
    spooled = eng.run()
    # driver-side list stayed empty; read-back equals the in-memory order
    assert eng.crawl_order == []
    assert spooled.order_dir and spooled.order_rows == len(plain.crawl_order)
    assert [r["url"] for r in spooled.crawl_order] == [r["url"] for r in plain.crawl_order]
    assert [r["round"] for r in spooled.crawl_order] == [r["round"] for r in plain.crawl_order]

    # kill/resume with spooling: spool content identical to uninterrupted
    mk(12, spool=str(tmp_path / "spool_b"), ckpt=str(tmp_path / "ckpt_s")).run()
    resumed_engine = mk(30, spool=str(tmp_path / "spool_b"), ckpt=str(tmp_path / "ckpt_s"))
    assert resumed_engine.resume()
    resumed = resumed_engine.run()
    assert [r["url"] for r in resumed.crawl_order] == [r["url"] for r in plain.crawl_order]

    # over-cap read-back refuses to materialize but keeps the row count
    eng2 = mk(30, spool=str(tmp_path / "spool_c"))
    eng2.config.spool_readback_rows = 3
    res2 = eng2.run()
    assert res2.crawl_order == [] and res2.order_dir


def test_engine_robots(pages_table, tmp_path):
    """A host whose robots.txt disallows /p/ must not be fetched beyond
    robots.txt itself."""
    import pyarrow as pa

    from blockchainspider_ray.fixtures import PAGES_SCHEMA, write_pages_store

    # take the fixture and add a robots.txt for host of the seed
    seed = pages_table.column("url")[0].as_py()
    host = seed.split("/")[2]
    robots_row = pa.table(
        {
            "url": [f"http://{host}/robots.txt"],
            "warc_ts": pa.array([pages_table.column("warc_ts")[0].as_py()], pa.timestamp("ms")),
            "html": [b"User-agent: *\nDisallow: /p/\n"],
            "text": [""],
            "lang": [""],
        },
        schema=PAGES_SCHEMA,
    )
    table = pa.concat_tables([pages_table, robots_row])
    store_dir = write_pages_store(table, str(tmp_path / "robots_store"), num_partitions=4)

    engine = CrawlEngine(
        PageStore(store_dir),
        seeds=[seed],
        config=CrawlConfig(
            strategy="bfs",
            strategy_kwargs={"depth": 2},
            pop_k=4,
            obey_robots=True,
            max_fetches=20,
            max_rounds=20,
            seen_use_ray=False,
        ),
    )
    res = engine.run()
    fetched_on_host = [r for r in res.crawl_order if r["url"].startswith(f"http://{host}/p/")]
    assert not fetched_on_host
    assert any(m.get("robots_dropped", 0) > 0 for m in res.metrics)


def test_fetch_pool_response_lru(ray_session, pages_store):
    """Response LRU (reference blockscan/cache.py): repeated lookups of the
    same urls hit the cache, results stay identical."""
    from blockchainspider_ray.stages.fetch import FetchPool, PageStore

    import pyarrow.dataset as pads

    store = PageStore(pages_store)
    urls = (
        pads.dataset(f"{pages_store}/part=0", partitioning=None)
        .to_table(columns=["url"])
        .column("url")[:5]
        .to_pylist()
    )
    pool = FetchPool(store, k=2)
    first = pool.lookup(urls).sort_by("url")
    s0 = pool.cache_stats()
    assert s0["misses"] >= len(urls) and s0["hits"] == 0
    second = pool.lookup(urls).sort_by("url")
    s1 = pool.cache_stats()
    assert s1["hits"] >= len(urls)  # all served from the LRU
    assert first.equals(second)  # byte-identical rows from cache


def test_crawl_delay_parse_and_admission():
    """Crawl-delay parses from the * group and caps that host's admissions."""
    from blockchainspider_ray.stages.politeness import Candidate, admit_per_host
    from blockchainspider_ray.stages.robots import parse_crawl_delay

    assert parse_crawl_delay("User-agent: *\nCrawl-delay: 2.5\n") == 2.5
    assert parse_crawl_delay("User-agent: bot\nCrawl-delay: 9\n") is None
    assert parse_crawl_delay("Crawl-delay: nope\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: -1\n") is None

    cands = [
        Candidate(url=f"http://slow.example/p{i}", host="slow.example",
                  priority=-float(i), arrival=i)
        for i in range(4)
    ] + [
        Candidate(url=f"http://fast.example/p{i}", host="fast.example",
                  priority=-float(i), arrival=10 + i)
        for i in range(4)
    ]
    # global budget unlimited, but slow.example capped at 1 by its delay
    adm, deferred = admit_per_host(cands, 0, host_budgets={"slow.example": 1})
    assert sum(c.host == "slow.example" for c in adm) == 1
    assert sum(c.host == "fast.example" for c in adm) == 4
    assert all(c.host == "slow.example" for c in deferred)
    # highest-priority slow candidate is the one admitted
    assert [c.url for c in adm if c.host == "slow.example"] == ["http://slow.example/p0"]

    # override below the global budget wins; other hosts keep the global cap
    adm2, _ = admit_per_host(cands, 2, host_budgets={"slow.example": 1})
    assert sum(c.host == "slow.example" for c in adm2) == 1
    assert sum(c.host == "fast.example" for c in adm2) == 2


def test_engine_crawl_delay(pages_table, tmp_path):
    """A host whose robots.txt declares Crawl-delay admits at most
    round_s/delay of its urls per round; the rest defer (not drop)."""
    import pyarrow as pa

    from blockchainspider_ray.fixtures import PAGES_SCHEMA, write_pages_store

    seed = pages_table.column("url")[0].as_py()
    host = seed.split("/")[2]
    robots_row = pa.table(
        {
            "url": [f"http://{host}/robots.txt"],
            "warc_ts": pa.array([pages_table.column("warc_ts")[0].as_py()], pa.timestamp("ms")),
            "html": [b"User-agent: *\nCrawl-delay: 1\n"],
            "text": [""],
            "lang": [""],
        },
        schema=PAGES_SCHEMA,
    )
    table = pa.concat_tables([pages_table, robots_row])
    store_dir = write_pages_store(table, str(tmp_path / "cd_store"), num_partitions=4)

    def run(obey: bool, pop_k: int = 16):
        engine = CrawlEngine(
            PageStore(store_dir),
            seeds=[seed],
            config=CrawlConfig(
                strategy="bfs",
                strategy_kwargs={"depth": 3},
                pop_k=pop_k,
                obey_robots=obey,
                crawl_delay_round_s=1.0,
                max_fetches=40,
                max_rounds=60,
                seen_use_ray=False,
            ),
        )
        return engine.run()

    def max_per_round(res):
        per_round = {}
        for r in res.crawl_order:
            if r["url"].split("/")[2] == host:
                per_round[r["round"]] = per_round.get(r["round"], 0) + 1
        return max(per_round.values()) if per_round else 0

    res = run(True)
    # per round, at most 1 url of the delayed host was newly crawled
    assert max_per_round(res) == 1
    # nothing lost: the unconstrained crawl reaches the same url set
    base = run(False)
    assert {r["url"] for r in res.crawl_order} == {r["url"] for r in base.crawl_order}
    # tabular (array-native) round loop honors the same cap
    res_tab = run(True, pop_k=128)
    assert max_per_round(res_tab) == 1
    assert {r["url"] for r in res_tab.crawl_order} == {r["url"] for r in base.crawl_order}
