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


def _tiny_store(tmp_path, pages):
    """pages: {url: [out_urls]} — all same host, tiny store for budget repros."""
    import datetime

    import pyarrow as pa

    from blockchainspider_ray.fixtures import PAGES_SCHEMA, write_pages_store
    from blockchainspider_ray.functions.text import extract_text

    urls, htmls, texts = [], [], []
    for u, outs in pages.items():
        html = (
            "<html><body>"
            + "".join(f'<a href="{o}">x</a>' for o in outs)
            + "</body></html>"
        )
        urls.append(u)
        htmls.append(html.encode())
        texts.append(extract_text(html))
    ts = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([int(ts.timestamp() * 1000)] * len(urls), pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    return write_pages_store(tbl, str(tmp_path / "tiny_store"), num_partitions=2)


def test_budget_one_seen_cycle_does_not_starve_deferred(ray_session, tmp_path):
    """ADVICE r1 livelock repro: S->A,P; A->C; P->A, host budget 1.

    The cycle edge P->A re-proposes a seen URL; the old code re-admitted the
    stale frontier forever and never fetched C."""
    from blockchainspider_ray.crawl.dataset_bfs import DatasetBFSCrawl

    h = "http://one.example"
    store = _tiny_store(
        tmp_path,
        {
            f"{h}/s": [f"{h}/a", f"{h}/p"],
            f"{h}/a": [f"{h}/c"],
            f"{h}/p": [f"{h}/a"],
            f"{h}/c": [],
        },
    )
    fetched, rounds = DatasetBFSCrawl(
        store, [f"{h}/s"], depth=3, host_budget=1, max_rounds=20, seen_use_ray=False
    ).run()
    got = set(fetched.column("url").to_pylist())
    assert got == {f"{h}/s", f"{h}/a", f"{h}/p", f"{h}/c"}
    assert rounds < 20  # terminated, not spun to max_rounds


def test_budgeted_bfs_with_ray_seen_shards(ray_session, tmp_path):
    """Schema-cast regression (ADVICE r1): polars large_string vs string in
    the deferred/frontier merge; run the budgeted path with Ray seen shards
    (prefilter + driver commit)."""
    from blockchainspider_ray.crawl.dataset_bfs import DatasetBFSCrawl

    h = "http://two.example"
    pages = {f"{h}/p{i}": [f"{h}/p{(i + 1) % 6}", f"{h}/p{(i + 2) % 6}"] for i in range(6)}
    store = _tiny_store(tmp_path, pages)
    fetched, rounds = DatasetBFSCrawl(
        store, [f"{h}/p0"], depth=5, host_budget=1, max_rounds=30, seen_use_ray=True
    ).run()
    assert set(fetched.column("url").to_pylist()) == set(pages)
    assert rounds >= 6  # budget 1 on one host: one fetch per round


def test_robots_aware_dataset_bfs(ray_session, tmp_path):
    """obey_robots drops disallowed paths, matching engine semantics."""
    from blockchainspider_ray.crawl.dataset_bfs import DatasetBFSCrawl

    h = "http://rob.example"
    pages = {
        f"{h}/s": [f"{h}/ok1", f"{h}/private/x", f"{h}/ok2"],
        f"{h}/ok1": [f"{h}/private/y"],
        f"{h}/ok2": [],
        f"{h}/private/x": [f"{h}/ok2"],
        f"{h}/private/y": [],
        f"{h}/robots.txt": [],
    }
    store = _tiny_store(tmp_path, pages)
    # overwrite the robots page body with actual rules
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    from pathlib import Path

    from blockchainspider_ray.fixtures import ROW_GROUP_SIZE

    for part in Path(store).glob("part=*"):
        t = pq.read_table(part / "pages.parquet")
        urls = t.column("url").to_pylist()
        if f"{h}/robots.txt" in urls:
            htmls = t.column("html").to_pylist()
            htmls[urls.index(f"{h}/robots.txt")] = b"User-agent: *\nDisallow: /private/\n"
            t = t.set_column(
                t.column_names.index("html"), "html", pa.array(htmls, pa.binary())
            )
            pq.write_table(t, part / "pages.parquet", row_group_size=ROW_GROUP_SIZE)

    fetched, _ = DatasetBFSCrawl(
        store, [f"{h}/s"], depth=3, host_budget=0, max_rounds=10,
        seen_use_ray=False, obey_robots=True,
    ).run()
    got = set(fetched.column("url").to_pylist())
    assert got == {f"{h}/s", f"{h}/ok1", f"{h}/ok2"}, got

    # without robots, the private pages are crawled
    unfiltered, _ = DatasetBFSCrawl(
        store, [f"{h}/s"], depth=3, host_budget=0, max_rounds=10, seen_use_ray=False
    ).run()
    assert f"{h}/private/x" in set(unfiltered.column("url").to_pylist())
