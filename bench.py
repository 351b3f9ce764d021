#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): URLs fetched+parsed/sec — one big crawl
round streamed through the data plane:

    read page store (hash-partitioned parquet)
      -> canonicalize + url_hash (seen-set keying)
      -> extract_text (byte-identical 3-regex) -> write parquet
      -> extract_links -> count edges

plus a multi-round engine crawl and representative query timings over
$GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "urls_per_sec": ...}

--scaling: runs the headline pipeline in two fresh processes
(num_cpus=8 and num_cpus=32) on the same input and reports both rates and
efficiency = (rate32/rate8)/4 (the sandbox substitute for N vs 4N nodes,
see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("BENCH_PAGES", "200000"))
# Common-Crawl-like page weight: ~8KB html (1KB toy pages measure scheduler
# overhead, not parse throughput — see BASELINE.md scaling protocol)
BENCH_PAGE_BYTES = int(os.environ.get("BENCH_PAGE_BYTES", "8192"))
STORE = f"/tmp/bcs_bench_store_{BENCH_PAGES}_{BENCH_PAGE_BYTES}"


def _warmup() -> None:
    """Spin up the Ray worker pool and pre-import the package in every worker
    before the timed run — otherwise worker fork + import cost (~1s/worker)
    dominates small benches and reads as pipeline time."""
    import ray

    def _touch(batch):
        import blockchainspider_ray.stages.parse  # noqa: F401
        return batch

    (
        ray.data.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 8)
        .map_batches(_touch, batch_format="pyarrow", batch_size=1)
        .materialize()
    )


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _ensure_store() -> str:
    from blockchainspider_ray.fixtures import ensure_pages_store

    t0 = time.perf_counter()
    ensure_pages_store(
        STORE,
        n_pages=BENCH_PAGES,
        seed=42,
        n_hosts=64,
        num_partitions=32,
        pad_to_bytes=BENCH_PAGE_BYTES,
    )
    _log(f"store ready in {time.perf_counter() - t0:.1f}s: {STORE}")
    return STORE


def bulk_fetch_parse(store: str, out_dir: str) -> dict:
    """The headline: full-store fetch+parse round, streaming end to end."""
    import ray

    from blockchainspider_ray.stages.parse import extract_links_stage, parse_page_stage

    t0 = time.perf_counter()
    pages = ray.data.read_parquet(store)
    n_urls = pages.count()

    # ~8KB html rows -> 512-row batches (~4MB); a multi-MB-html store would
    # drop this to 64-256 (SURVEY.md §7.5#5)
    text = pages.map_batches(parse_page_stage, batch_format="pyarrow", batch_size=512)
    text.write_parquet(f"{out_dir}/text")

    edges = pages.map_batches(extract_links_stage, batch_format="pyarrow", batch_size=512)
    n_edges = edges.count()
    wall = time.perf_counter() - t0
    return {
        "wall_s": wall,
        "urls": n_urls,
        "edges": n_edges,
        "urls_per_sec": n_urls / wall,
    }


def engine_crawl(store: str) -> dict:
    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.stages.fetch import PageStore

    import pyarrow.dataset as pads

    seeds = [
        pads.dataset(f"{store}/part={k}").to_table(columns=["url"]).column("url")[0].as_py()
        for k in range(8)
    ]
    t0 = time.perf_counter()
    engine = CrawlEngine(
        PageStore(store),
        seeds=seeds,
        config=CrawlConfig(
            strategy="bfs",
            strategy_kwargs={"depth": 16},
            pop_k=512,
            host_budget=64,
            max_fetches=4000,
            max_rounds=60,
            seen_shards=8,
            seen_use_ray=True,
        ),
    )
    res = engine.run()
    wall = time.perf_counter() - t0
    return {"wall_s": wall, "fetched": res.fetched, "rounds": res.rounds,
            "urls_per_sec": res.fetched / wall if wall else 0.0}


def run_queries() -> dict:
    from blockchainspider_ray.pipelines import queries as q

    sel = {
        "lineitem_agg": q.q_lineitem_agg,
        "join_agg": q.q_join_agg,
        "extract_text": q.q_extract_text,
        "dedup_exact": q.q_dedup_exact,
        "minhash_signatures": q.q_minhash_signatures,
        "simhash": q.q_simhash,
        "ann_bruteforce": q.q_ann_bruteforce,
        "token_count": q.q_token_count,
    }
    import pandas as pd
    import pyarrow as pa

    out = {}
    for name, fn in sel.items():
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if not isinstance(res, (pd.DataFrame, pa.Table)):
            res.count()  # consume the dataset
        out[name] = round(time.perf_counter() - t0, 3)
        _log(f"query {name}: {out[name]}s")
    return out


def single_run(headline_only: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            log_to_driver=False,
        )
    store = _ensure_store()
    _warmup()
    out_dir = f"/tmp/bcs_bench_out_{NUM_CPUS}_{int(time.time())}"
    bulk = bulk_fetch_parse(store, out_dir)
    _log(f"bulk: {bulk}")
    crawl = {} if headline_only else engine_crawl(store)
    _log(f"crawl: {crawl}")
    queries = {} if headline_only else run_queries()
    result = {
        "metric": "urls_fetched_parsed_per_sec",
        "value": round(bulk["wall_s"], 3),
        "unit": "sec",
        "urls_per_sec": round(bulk["urls_per_sec"], 1),
        "bulk": {k: round(v, 3) if isinstance(v, float) else v for k, v in bulk.items()},
        "crawl": {k: round(v, 3) if isinstance(v, float) else v for k, v in crawl.items()},
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_pages": BENCH_PAGES,
    }
    ray.shutdown()
    return result


def scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs (N vs 4N substitute)."""
    rates = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--json-only"],
            capture_output=True,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = p.stdout.strip().splitlines()[-1]
        data = json.loads(line)
        rates[cpus] = data
        _log(f"cpus={cpus}: {data['urls_per_sec']} urls/s")
    eff = (rates[32]["urls_per_sec"] / rates[8]["urls_per_sec"]) / 4
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "rate_8": rates[8]["urls_per_sec"],
        "rate_32": rates[32]["urls_per_sec"],
        "pass": eff >= 0.8,
        "bench_pages": BENCH_PAGES,
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(scaling()))
    else:
        print(json.dumps(single_run(headline_only="--json-only" in sys.argv)))
