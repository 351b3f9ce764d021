"""Command-line entry points — the `scrapy crawl <spider> -a k=v` UX of the
reference (README.md:36-87) mapped onto the Ray-Data engine:

    python -m blockchainspider_ray crawl --store DIR --seeds URL [URL...]
        --strategy bfs --pop-k 64 --host-budget 8 --out OUT --checkpoint CKPT
    python -m blockchainspider_ray bulk-parse --store DIR --out OUT
    python -m blockchainspider_ray gen-store --out DIR --pages 10000
    python -m blockchainspider_ray query <name> --sf-dir DIR [--out PARQUET]

Owns its Ray session (the library never calls ray.init; the driver-facing
``__ray_entry__`` contract stays session-free).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        # Under `ray job submit` RAY_ADDRESS points at the cluster; standalone
        # (and in this sandbox, where RAY_ADDRESS=local is preset) it starts a
        # fresh local instance.  num_cpus only applies to the local case.
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {"address": address, "include_dashboard": False, "log_to_driver": False}
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_crawl(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .crawl.engine import CrawlConfig, CrawlEngine
    from .stages.fetch import PageStore

    kwargs = dict(kv.split("=", 1) for kv in args.strategy_arg or [])
    for k, v in list(kwargs.items()):  # numeric coercion for -a style args
        try:
            kwargs[k] = int(v)
        except ValueError:
            try:
                kwargs[k] = float(v)
            except ValueError:
                pass
    engine = CrawlEngine(
        PageStore(args.store),
        seeds=args.seeds,
        config=CrawlConfig(
            strategy=args.strategy,
            strategy_kwargs=kwargs,
            pop_k=args.pop_k,
            host_budget=args.host_budget,
            obey_robots=args.obey_robots,
            max_rounds=args.max_rounds,
            max_fetches=args.max_fetches,
            seen_shards=args.seen_shards,
            checkpoint_dir=args.checkpoint,
            out_dir=args.out,
            pipeline=args.pipeline,
            seed_mass=args.seed_mass,
        ),
    )
    if args.resume and engine.resume():
        print(f"resumed from round {engine.round_no}", file=sys.stderr)
    res = engine.run()
    print(
        json.dumps(
            {
                "fetched": res.fetched,
                "rounds": res.rounds,
                "crawl_order_len": len(res.crawl_order),
                "top_ranks": sorted(res.ranks.items(), key=lambda kv: -kv[1])[:10],
            }
        )
    )
    return 0


def cmd_bulk_parse(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import ray.data

    from .stages.parse import parse_page_stage

    pages = ray.data.read_parquet(args.store, partitioning=None)
    parsed = pages.map_batches(parse_page_stage, batch_format="pyarrow", batch_size=args.batch_size)
    parsed.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_gen_store(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .fixtures import ensure_pages_store

    path = ensure_pages_store(
        args.out,
        n_pages=args.pages,
        seed=args.seed,
        n_hosts=args.hosts,
        num_partitions=args.partitions,
        pad_to_bytes=args.page_bytes,
    )
    print(json.dumps({"store": path, "pages": args.pages}))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .stages.compact import compact_store

    stats = compact_store(
        args.store,
        args.out,
        row_group_size=args.row_group_size,
        keep_latest=args.keep_latest,
    )
    print(json.dumps(stats))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    import pandas as pd
    import pyarrow as pa

    from .pipelines.queries import NOSQL_QUERIES, SQL_QUERIES

    registry = {**SQL_QUERIES, **NOSQL_QUERIES}
    if args.list or args.name is None:
        for name in sorted(registry):
            print(name)
        return 0
    if args.name not in registry:
        print(f"unknown query {args.name!r}; --list shows all", file=sys.stderr)
        return 2
    res = registry[args.name](args.sf_dir)
    if args.out:
        if isinstance(res, pd.DataFrame):
            res = pa.Table.from_pandas(res, preserve_index=False)
        if isinstance(res, pa.Table):
            import ray.data

            res = ray.data.from_arrow(res)
        # Dataset.write_parquet → one file per block: partitioned output, a
        # failed run re-lists the directory instead of re-running finished
        # partitions
        res.write_parquet(args.out)
        print(json.dumps({"query": args.name, "out": args.out}))
    else:
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        print(res.head(args.head).to_string())
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="blockchainspider_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a frontier crawl against a page store")
    c.add_argument("--store", required=True)
    c.add_argument("--seeds", nargs="+", required=True)
    c.add_argument("--strategy", default="bfs")
    c.add_argument(
        "-a", "--strategy-arg", action="append", metavar="K=V",
        help="strategy kwarg (reference -a style), e.g. -a depth=4",
    )
    c.add_argument("--pop-k", type=int, default=64)
    c.add_argument("--host-budget", type=int, default=8)
    c.add_argument("--obey-robots", action="store_true")
    c.add_argument("--max-rounds", type=int, default=1000)
    c.add_argument("--max-fetches", type=int, default=None)
    c.add_argument("--seen-shards", type=int, default=4)
    c.add_argument("--checkpoint", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--out", default=None)
    c.add_argument(
        "--pipeline", action="store_true",
        help="round-pipelining throughput mode (BFS: overlapping decode "
        "waves; weight strategies: one-round-stale pop scheduling) — see "
        "CrawlConfig.pipeline for the preserved guarantees",
    )
    c.add_argument(
        "--seed-mass", type=float, default=None,
        help="starting mass for seeds beyond the first on weight "
        "strategies (multi-source crawl); default keeps the reference's "
        "single-source semantics",
    )
    c.set_defaults(fn=cmd_crawl)

    b = sub.add_parser("bulk-parse", help="fetch+parse a whole page store")
    b.add_argument("--store", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--batch-size", type=int, default=512)
    b.set_defaults(fn=cmd_bulk_parse)

    g = sub.add_parser("gen-store", help="generate the deterministic synthetic page store")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=10000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--hosts", type=int, default=20)
    g.add_argument("--partitions", type=int, default=16)
    g.add_argument("--page-bytes", type=int, default=0)
    g.set_defaults(fn=cmd_gen_store)

    q = sub.add_parser(
        "query", help="run a registered pipeline over an sf dir (parquet out or preview)"
    )
    q.add_argument("name", nargs="?", default=None, help="query name (omit or --list to enumerate)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None, help="write result as partitioned parquet")
    q.add_argument("--head", type=int, default=20, help="preview rows when no --out")
    q.add_argument("--list", action="store_true")
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser(
        "compact",
        help="rewrite a page store partition-per-partition into single sorted files",
    )
    c.add_argument("--store", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--row-group-size", type=int, default=256)
    c.add_argument("--keep-latest", action="store_true",
                   help="keep only the newest warc_ts version of each url")
    c.set_defaults(fn=cmd_compact)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
