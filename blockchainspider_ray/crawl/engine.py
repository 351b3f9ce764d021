"""The BSP crawl round engine.

One round reproduces the reference crawl cycle Expand→Push→Rank→Pop
(reference docs/docs/advance/transaction_tracing.md:17-24 and the spider
drive loop spiders/txs/blockscan.py:138-168), re-expressed as a streaming
pipeline per SURVEY.md §4.2:

    pops (strategy) + carry-over
      → robots / scope filter
      → per-host politeness admission (budget, carry-over)
      → URL-seen filter (sharded cuckoo actors)
      → fetch: partition-pruned lookup join against the page store
      → parse: extract_text (byte-identical) + extract_links
      → push link edges into the strategy; write text/edges/ranks
      → checkpoint {strategy, seen shards, deferred, metrics}

``pop_k=1`` with no budget reproduces the reference's exact sequential
crawl ordering (conformance mode); ``pop_k>1`` is the documented
throughput mode (BSP batching).  The control plane (popped candidates per
round) is bounded by pop_k + politeness budget — small by design — while
fetch/parse of large rounds run as Ray Data stages; `parse_threshold`
picks the crossover.

Scale notes: strategy state lives driver-side in v1 with the sharded-rank
actor pool as the scale path (additive residual merges, SURVEY.md §2.4);
the seen set and fetch/parse are already distributed.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Set, Tuple

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..functions.links import decode_html
from ..functions.text import extract_text
from ..functions.urls import canonicalize_url, host_of, hosts_of_array, url_hash64
from ..stages.fetch import PageStore
from ..stages.parse import extract_links_stage, extract_text_stage
from ..stages.politeness import Candidate, admit_per_host
from ..stages.robots import RobotsCache
from ..state.checkpoint import CheckpointManager
from ..state.seen import SeenSet
from ..strategies import extract_mass, load_strategy, restore_mass


@ray.remote(num_cpus=1)
def _parse_slice(pages: pa.Table, include_scripts: bool):
    """Parse one slice of a round's pages (text + link edges) as a Ray task."""
    texts = pa.table(
        {
            "url": pages.column("url"),
            "text_extracted": pa.array(
                [extract_text(decode_html(h)) for h in pages.column("html").to_pylist()],
                pa.string(),
            ),
        }
    )
    edges = extract_links_stage(pages, include_scripts=include_scripts)
    return texts, edges


def _concat_blocks(tables: List[pa.Table]) -> pa.Table:
    """Concat Dataset blocks, tolerating the zero-column empty blocks that
    fully-filtered parquet read tasks emit (their schema can't unify)."""
    parts = [t for t in tables if t.num_columns > 0]
    if not parts:
        return pa.table({})
    nonempty = [t for t in parts if t.num_rows > 0]
    return pa.concat_tables(nonempty) if nonempty else parts[0].slice(0, 0)


@ray.remote(num_cpus=1)
def _write_round_refs(
    out_dir: str, round_no: int, keep_urls: Optional[List[str]], sub: str, *parts
) -> None:
    """Write one round-output table (texts filtered to keep_urls, or
    edges) from object-store refs — the tables never visit the driver."""
    t = _concat_blocks(list(parts))
    if sub == "text" and keep_urls is not None:
        t = t.filter(pc.is_in(t.column("url"), value_set=pa.array(keep_urls)))
    d = Path(out_dir) / sub
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, d / f"round={round_no:04d}.parquet")


@ray.remote(num_cpus=0)
def _count_edge_rows(*tabs) -> int:
    """Row tally over the round's edge tables (resolved zero-copy from
    local plasma) — the tabular weight loop's metrics source; the tables
    themselves go to the push actor, never the driver."""
    return sum(t.num_rows for t in tabs)


@dataclass
class CrawlConfig:
    strategy: str = "bfs"
    strategy_kwargs: Dict[str, Any] = field(default_factory=dict)
    pop_k: int = 1  # 1 = reference-ordering conformance; >1 = BSP throughput
    host_budget: int = 0  # max fetches per host per round; <=0 unlimited
    obey_robots: bool = False
    # robots Crawl-delay honoring (only when obey_robots): a host with
    # Crawl-delay d admits at most max(1, crawl_delay_round_s / d) fetches
    # per round — the BSP analogue of a d-second inter-request interval
    crawl_delay_round_s: float = 1.0
    allowed_hosts: Optional[Set[str]] = None
    max_rounds: int = 1000
    max_fetches: Optional[int] = None
    include_scripts: bool = True
    # Initial mass for seeds BEYOND seeds[0] on weight strategies (the
    # strategy's own source always starts at 1.0).  None preserves the
    # reference's single-source semantics: extra seeds fetch once but
    # scatter zero weight.  A production-scale weight crawl starts from a
    # seed LIST (same rationale as the BFS deep-seed scaling job), so the
    # multi-source generalization gives each seed this starting mass.
    # Honored only by strategies that declare SEED_MASS_TAG.
    seed_mass: Optional[float] = None
    seen_shards: int = 4
    seen_capacity: int = 1 << 20
    seen_backend: str = "cuckoo"
    seen_use_ray: bool = True
    fetch_actors: int = 8  # persistent fetch-shard actors; 0 = task-per-round
    checkpoint_dir: Optional[str] = None
    out_dir: Optional[str] = None
    # spool crawl order to <spool_dir>/order/round=NNNN.parquet instead of
    # accumulating driver-side — O(1) driver memory in crawl length (the
    # dataset_bfs spool_dir pattern); CrawlResult reads it back only when
    # small enough (spool_readback_rows)
    spool_dir: Optional[str] = None
    spool_readback_rows: int = 500_000
    batch_size: int = 128  # html-bearing batches stay small (SURVEY §7.5#5)
    parse_threshold: int = 256  # rounds larger than this parse via Ray Data
    stream_threshold: int = 100_000  # rounds larger than this stream from parquet
    # FIFO strategies (BFS/Poison) switch to the array-native round loop
    # (_run_tabular) above this pop_k: candidates/edges stay columnar on
    # the driver, no per-url/per-edge Python objects.  Ordering is
    # identical to the scalar loop (tests/test_engine_tabular.py).
    tabular_threshold: int = 64
    # Round-pipelining throughput mode (off by default).  A BFS web crawl
    # is supply-limited: each round's pops consume ~all of the previous
    # round's discovered links, so the strict BSP loop serializes
    # driver bookkeeping with the fetch waves.  With pipeline=True a round
    # may start with FEWER than pop_k candidates — whatever the frontier
    # already holds (>= pipeline_min_pop) — and overlap the in-flight
    # round's decode wave, like the reference's always-busy Scrapy reactor.
    # Guarantees preserved: every url fetched at most once, politeness
    # budget enforced per round, final fetch SET identical on exhaustive
    # crawls (tests/test_engine_tabular.py); per-round composition and
    # therefore max_fetches cutoffs may differ from the strict loop —
    # when the budget trips, up to pipeline_depth submitted rounds are
    # still in flight, so max_fetches can overshoot by as much as
    # pipeline_depth x pop_k fetches.
    # Ignored when checkpointing (a checkpoint must capture whole rounds).
    # WEIGHT strategies (tabular loop) also honor pipeline=True: the next
    # pop's scan+claim is submitted AHEAD of the round's cascade (actor
    # FIFO), so pops read one-round-STALE weights and the driver never
    # waits on the cascade.  Guarantees: claims stay atomic (no node
    # fetched twice), and on exhaustive crawls the final fetch SET equals
    # the strict loop's (weights only accumulate until claimed) — pinned
    # by tests/test_engine_weight_tabular.py; per-round pop composition
    # and budget cutoffs differ from strict BSP.
    pipeline: bool = False
    pipeline_min_pop: int = 512
    pipeline_depth: int = 2  # rounds in flight; >1 lets small partial
    # rounds stack so the decode pool never drains between waves


class CrawlResult:
    """Crawl outcome.  ``crawl_order`` materializes lazily: the tabular
    round loop hands over per-round Arrow tables and the row-dict form is
    built only when a consumer actually reads it (the bench reads only
    fetched/rounds/metrics, so the conversion cost stays off its wall)."""

    def __init__(
        self,
        crawl_order: List[dict],
        rounds: int,
        fetched: int,
        metrics: List[dict],
        ranks: Dict[str, float],
        # set when the crawl spooled its order to parquet
        # (CrawlConfig.spool_dir); crawl_order is the read-back, or []
        # when over the read-back cap
        order_dir: Optional[str] = None,
        order_rows: int = 0,
        order_tables: Optional[List[pa.Table]] = None,
    ):
        self._crawl_order = crawl_order
        self._order_tables = order_tables or None
        self.rounds = rounds
        self.fetched = fetched
        self.metrics = metrics
        # dict, or a zero-arg thunk for lazy gather (see `ranks` property)
        self._ranks = ranks
        self.order_dir = order_dir
        self.order_rows = order_rows

    @property
    def ranks(self) -> Dict[str, float]:
        """Final node ranks.  Gathered LAZILY when the engine handed over
        a thunk: the full rank gather ships every node's score to the
        driver (~0.3s serial at 10^5 nodes — pure waste for consumers
        that only read fetched/rounds/metrics, like the bench), so it
        runs on first access instead of inside the crawl wall."""
        if callable(self._ranks):
            self._ranks = self._ranks()
        return self._ranks

    @property
    def crawl_order(self) -> List[dict]:
        if self._order_tables:
            rows: List[dict] = []
            for t in self._order_tables:
                rows.extend(t.to_pylist())
            self._crawl_order = list(self._crawl_order) + rows
            self._order_tables = None
        return self._crawl_order


class CrawlEngine:
    def __init__(self, store: "PageStore | str", seeds: List[str], config: CrawlConfig):
        self.store = store if isinstance(store, PageStore) else PageStore(store)
        self.config = config
        self.seeds = [u for u in (canonicalize_url(s) for s in seeds) if u]
        self.strategy = None
        self.seen: Optional[SeenSet] = None
        self.deferred: List[Candidate] = []
        self.crawl_order: List[dict] = []
        self._order_tables: List[pa.Table] = []  # tabular rounds, lazy rows
        self._round_order: List[dict] = []  # this round's new rows only
        self._round_order_tbl: Optional[pa.Table] = None  # tabular-loop form
        self._order_rows = 0  # total spooled+held rows (driver holds O(round))
        self.metrics: List[dict] = []
        self.round_no = 0
        self.fetched = 0
        self._arrival = 0
        self._pending_seeds: List[str] = list(self.seeds)
        self.robots = RobotsCache(self.store, obey=config.obey_robots)
        self.ckpt = CheckpointManager(config.checkpoint_dir) if config.checkpoint_dir else None
        self._fetch_pool = None
        self._staged_supply: List = []  # per-bundle push-chunk refs (pipeline)
        self._writer = None  # lazy single-thread async output writer
        self._write_futs: List = []
        self._pending_edge_counts: List = []  # (metric dict, count ref) pairs

    @property
    def _fifo(self) -> bool:
        """True for strategies with no mass to park (BFS/Poison): they take
        the dict-free ``push_pairs`` edge path."""
        return hasattr(self.strategy, "push_pairs")

    def _get_fetch_pool(self):
        if self._fetch_pool is None and self.config.fetch_actors > 0 and ray.is_initialized():
            from ..stages.fetch import FetchPool

            self._fetch_pool = FetchPool.shared(
                self.store, k=self.config.fetch_actors, prewarm=True
            )
        return self._fetch_pool

    # -- lifecycle --------------------------------------------------------
    def _init_state(self) -> None:
        c = self.config
        self.strategy = load_strategy(c.strategy, source=self.seeds[0], **c.strategy_kwargs)
        if self.ckpt is not None and hasattr(self.strategy, "set_checkpoint_mode"):
            # claims must not precede the round checkpoint (see
            # ShardedHaircut.set_checkpoint_mode)
            self.strategy.set_checkpoint_mode(True)
        self.seen = SeenSet(
            num_shards=c.seen_shards,
            capacity=c.seen_capacity,
            backend=c.seen_backend,
            use_ray=c.seen_use_ray,
            reuse_actors=True,  # engine owns one live SeenSet at a time
        )

    def resume(self) -> bool:
        """Restore from the latest complete checkpoint. True if resumed."""
        if self.ckpt is None:
            return False
        latest = self.ckpt.latest_complete()
        if latest is None:
            return False
        state = self.ckpt.load_round(latest)
        c = self.config
        self.strategy = state["strategy"]
        if hasattr(self.strategy, "set_checkpoint_mode"):
            self.strategy.set_checkpoint_mode(True)
        self.seen = SeenSet(
            num_shards=len(state["seen_blobs"]),
            capacity=c.seen_capacity,
            backend=c.seen_backend,
            use_ray=c.seen_use_ray,
            reuse_actors=True,
        )
        self.seen.restore(state["seen_blobs"])
        self.deferred = list(state["deferred"])
        prog = state["progress"]
        self.round_no = state["manifest"]["round"] + 1
        self.fetched = prog["fetched"]
        self._arrival = prog["arrival"]
        self._pending_seeds = prog["pending_seeds"]
        if "crawl_order" in prog:  # pre-r2 checkpoint layout
            self.crawl_order = prog["crawl_order"]
            self.metrics = prog.get("all_metrics", [])
        elif self.config.spool_dir:
            # spooled order lives on disk already; don't pull it into memory
            hist = self.ckpt.load_history(state["manifest"]["round"])
            self.metrics = hist["all_metrics"]
            self._order_rows = len(hist["crawl_order"])
        else:
            hist = self.ckpt.load_history(state["manifest"]["round"])
            self.crawl_order = hist["crawl_order"]
            self.metrics = hist["all_metrics"]
        return True

    # -- helpers ----------------------------------------------------------
    def _delay_budgets(self, hosts) -> Optional[Dict[str, int]]:
        """Per-host admission caps from robots Crawl-delay (None when not
        obeying robots or no host declares a delay).  Rules are cached per
        host in RobotsCache, so this is O(new hosts) point lookups."""
        if not self.config.obey_robots:
            return None
        out: Dict[str, int] = {}
        for h in set(hosts):
            d = self.robots.crawl_delay(h)
            if d:
                out[h] = max(1, int(self.config.crawl_delay_round_s / d))
        return out or None

    def _priority_of(self, ctx: dict) -> float:
        for key in ("residual", "weight"):
            if key in ctx:
                return float(ctx[key])
        # FIFO strategies (BFS/Poison): earlier pops outrank later ones
        return -float(self._arrival)

    def _seed_mass_of(self, url: str):
        """Candidate mass for a pending seed: CrawlConfig.seed_mass on
        weight strategies that declare SEED_MASS_TAG — except seeds[0],
        whose mass already sits in the strategy's pool (the source's 1.0;
        a candidate mass on top would double-count at restore)."""
        tag = getattr(self.strategy, "SEED_MASS_TAG", None)
        if tag is None or self.config.seed_mass is None or url == self.seeds[0]:
            return None
        return (tag, float(self.config.seed_mass))

    def _pop_candidates(self) -> List[Candidate]:
        cands: List[Candidate] = []
        while self._pending_seeds and len(cands) < self.config.pop_k:
            u = self._pending_seeds.pop(0)
            c2 = Candidate(url=u, host=host_of(u), priority=float("inf"),
                           ctx={}, arrival=self._arrival)
            sm = self._seed_mass_of(u)
            if sm is not None:
                c2.mass = sm
            cands.append(c2)
            self._arrival += 1
        if hasattr(self.strategy, "pop_batch"):
            # sharded strategies: k pops in O(shards) RPCs, mass pre-parked;
            # hosts computed once per batch (vectorized), not per candidate
            while len(cands) < self.config.pop_k:
                want = self.config.pop_k - len(cands)
                batch = self.strategy.pop_batch(want)
                hosts = hosts_of_array([node for node, _, _ in batch])
                for (node, ctx, mass), h in zip(batch, hosts):
                    c = Candidate(url=node, host=h,
                                  priority=self._priority_of(ctx), ctx=dict(ctx),
                                  arrival=self._arrival)
                    c.mass = mass
                    cands.append(c)
                    self._arrival += 1
                if len(batch) < want:
                    break
            return cands
        while len(cands) < self.config.pop_k:
            node, ctx = self.strategy.pop()
            if node is None:
                break
            c = Candidate(url=node, host=host_of(node),
                          priority=self._priority_of(ctx), ctx=dict(ctx),
                          arrival=self._arrival)
            # batched pop: park the node's mass on the candidate so the next
            # pop returns a *different* argmax; restored just before push.
            # FIFO strategies (push_pairs) carry no mass — skip the probe.
            if not self._fifo:
                c.mass = extract_mass(self.strategy, node)
            cands.append(c)
            self._arrival += 1
        return cands

    def _edges_of_pages(self, meta: pa.Table, edges: pa.Table) -> Dict[str, List[dict]]:
        """Per fetched page: its out-link edges mapped onto the strategy edge
        shape (from/to/value/timeStamp/symbol/hash; cf. reference
        middlewares/txs/push_pop.py:10-41).  Built from the html-free
        ``meta`` (url, warc_ts) table plus the already-parsed ``edges``
        table (src order = extraction order) — html never reaches the
        driver.  The per-edge dicts are what ``strategy.push`` consumes;
        the timestamp mapping is a vectorized arrow cast, not a per-row
        ``datetime.timestamp()`` loop."""
        page_urls = meta.column("url").to_pylist()
        out: Dict[str, List[dict]] = {u: [] for u in page_urls}
        if edges.num_rows == 0:
            return out
        ts_of: Dict[str, int] = {}
        if "warc_ts" in meta.column_names:
            secs = pc.fill_null(
                pc.divide(pc.cast(meta.column("warc_ts"), pa.int64()), 1000), 0
            )
            ts_of = dict(zip(page_urls, secs.to_pylist()))
        counter: Dict[str, int] = {}
        for src, dst in zip(edges.column("src_url").to_pylist(), edges.column("dst_url").to_pylist()):
            i = counter.get(src, 0)
            counter[src] = i + 1
            out.setdefault(src, []).append(
                {
                    "from": src,
                    "to": dst,
                    "value": 1.0,
                    "timeStamp": ts_of.get(src, 0),
                    "symbol": "",
                    "hash": f"{src}#{i}",
                }
            )
        return out

    def _lookup(self, urls: List[str]) -> pa.Table:
        if not ray.is_initialized() or len(urls) <= 8:
            return self.store.lookup_table(urls)
        pool = self._get_fetch_pool()
        if pool is not None:
            return pool.lookup(urls)
        return self.store.lookup_parallel(urls)

    @staticmethod
    def _meta_of(pages: pa.Table) -> pa.Table:
        """Project the html-free (url, warc_ts) slice the driver needs."""
        cols = [c for c in ("url", "warc_ts") if c in pages.column_names]
        return pages.select(cols) if cols else pa.table({"url": pa.array([], pa.string())})

    def _fetch_and_parse(self, urls: List[str]) -> Tuple[pa.Table, pa.Table, pa.Table]:
        """Returns (pages_meta, text_table, edges_table) for the admitted
        urls.  ``pages_meta`` is (url, warc_ts) ONLY — the html column stays
        in the workers / object store in every path (round-1 VERDICT: the
        huge-round path used to ``ray.get`` every html block onto the
        driver, a scale-killer at multi-MB pages).

        Small rounds take the direct Arrow path (no task overhead); pool
        rounds run fused fetch+parse inside the shard actors (html never
        leaves the actor); huge rounds stream through Ray Data stages."""
        pool = self._get_fetch_pool() if ray.is_initialized() else None
        if pool is not None and len(urls) <= self.config.stream_threshold:
            # fused path: one RPC per shard; lookup + parse in-actor, the
            # driver receives only html-free (meta, texts, edges)
            return pool.fetch_parse(urls, include_scripts=self.config.include_scripts)
        if len(urls) <= self.config.parse_threshold:
            # small round / no pool: direct lookup, inline parse
            pages = self._lookup(urls)
            texts = pa.table(
                {
                    "url": pages.column("url"),
                    "text_extracted": pa.array(
                        [extract_text(decode_html(h)) for h in pages.column("html").to_pylist()],
                        pa.string(),
                    ),
                }
            )
            edges = extract_links_stage(pages, include_scripts=self.config.include_scripts)
            return self._meta_of(pages), texts, edges
        if len(urls) <= self.config.stream_threshold:
            # mid-size round without a fetch pool: parallel lookup + per-slice
            # parse tasks (plain Ray tasks — a Ray Data job per round would
            # cost more in scheduling than the parse itself at this size)
            pages = self._lookup(urls)
            n = pages.num_rows
            slice_rows = max(self.config.batch_size, 256)
            refs = [
                _parse_slice.remote(pages.slice(o, slice_rows), self.config.include_scripts)
                for o in range(0, n, slice_rows)
            ]
            meta = self._meta_of(pages)
            del pages  # drop html before gathering parse results
            parts = ray.get(refs)
            texts = _concat_blocks([t for t, _ in parts])
            edges = _concat_blocks([e for _, e in parts])
            return meta, texts, edges
        # huge round: stream from the partition-pruned parquet scan; html
        # blocks live in the object store only — the driver pulls just the
        # (url, warc_ts) projection plus the parsed text/edge tables
        ds = self.store.lookup(urls).materialize()
        text_ds = ds.map_batches(
            extract_text_stage, batch_format="pyarrow", batch_size=self.config.batch_size
        )
        edge_ds = ds.map_batches(
            lambda b: extract_links_stage(b, include_scripts=self.config.include_scripts),
            batch_format="pyarrow",
            batch_size=self.config.batch_size,
        )
        meta_cols = [c for c in ("url", "warc_ts") if c in ds.schema().names]
        meta = _concat_blocks(
            [
                pa.table(b)
                for b in ds.select_columns(meta_cols).iter_batches(
                    batch_format="pyarrow", batch_size=8192
                )
            ]
        )
        texts = _concat_blocks(
            [pa.table(b) for b in text_ds.iter_batches(batch_format="pyarrow", batch_size=8192)]
        )
        edges = _concat_blocks(
            [pa.table(b) for b in edge_ds.iter_batches(batch_format="pyarrow", batch_size=8192)]
        )
        return meta, texts, edges

    # -- async round-output writer ----------------------------------------
    # Parquet writes of a finished round are off the critical path: the
    # tables are immutable snapshots, so a single background thread overlaps
    # compression/IO with the next round's driver work (write was ~0.5s of
    # a 6s 60k-url crawl).  Ordering with checkpoints is preserved by
    # draining before every ckpt.save_round, so a resume never sees a
    # checkpoint whose spool/output files are still in flight.

    def _submit_write(self, fn) -> None:
        if self._writer is None:
            import concurrent.futures

            self._writer = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="crawl-writer"
            )
        self._write_futs.append(self._writer.submit(fn))

    def _drain_writes(self) -> None:
        futs, self._write_futs = self._write_futs, []
        for f in futs:
            if hasattr(f, "result"):
                f.result()  # writer-thread future: re-raise on the driver
            else:
                ray.get(f)  # ref-writing task: same error barrier

    def _write_round_outputs_refs(self, text_refs, edge_refs, keep_urls, rn=None) -> None:
        """Round outputs written straight from object-store refs by tasks
        (the refs regime) — text/edge tables never visit the driver; the
        write refs join the same drain barrier as writer-thread futures."""
        if not self.config.out_dir:
            return
        out = str(self.config.out_dir)
        rn = self.round_no if rn is None else rn
        self._write_futs.append(
            _write_round_refs.remote(out, rn, list(keep_urls), "text", *text_refs)
        )
        self._write_futs.append(
            _write_round_refs.remote(out, rn, None, "edges", *edge_refs)
        )
        ranks = self.strategy.get_node_rank()
        if ranks:
            items = sorted(ranks.items(), key=lambda kv: kv[1], reverse=True)
            d = Path(out) / "ranks"

            def job() -> None:
                rt = pa.table(
                    {
                        "node": pa.array([k for k, _ in items], pa.string()),
                        "score": pa.array([float(v) for _, v in items], pa.float64()),
                    }
                )
                d.mkdir(parents=True, exist_ok=True)
                pq.write_table(rt, d / f"round={rn:04d}.parquet")

            self._submit_write(job)

    def _write_round_outputs(self, texts: pa.Table, edges: pa.Table, rn=None) -> None:
        if not self.config.out_dir:
            return
        out = Path(self.config.out_dir)
        round_no = self.round_no if rn is None else rn
        # rank snapshot must be taken NOW (strategy state mutates next
        # round); the parquet build+write happens on the writer thread
        ranks = self.strategy.get_node_rank()
        items = sorted(ranks.items(), key=lambda kv: kv[1], reverse=True) if ranks else None

        def job() -> None:
            for sub, table in (("text", texts), ("edges", edges)):
                d = out / sub
                d.mkdir(parents=True, exist_ok=True)
                pq.write_table(table, d / f"round={round_no:04d}.parquet")
            if items:
                rt = pa.table(
                    {
                        "node": pa.array([k for k, _ in items], pa.string()),
                        "score": pa.array([float(v) for _, v in items], pa.float64()),
                    }
                )
                d = out / "ranks"
                d.mkdir(parents=True, exist_ok=True)
                pq.write_table(rt, d / f"round={round_no:04d}.parquet")

        self._submit_write(job)

    def _end_round(self, round_metrics: dict, rn=None) -> None:
        """Per-round order hand-off (spool or accumulate) + checkpoint.

        The round's new order rows arrive either as ``_round_order``
        (scalar loop, list of dicts) or ``_round_order_tbl`` (tabular
        loop, Arrow table — kept Arrow all the way: spooled as parquet or
        accumulated for CrawlResult's lazy row conversion, so the round
        loop never builds per-row dicts)."""
        rn = self.round_no if rn is None else rn
        tbl = self._round_order_tbl
        rows = tbl.num_rows if tbl is not None else len(self._round_order)
        if self.config.spool_dir and rows:
            d = Path(self.config.spool_dir) / "order"
            d.mkdir(parents=True, exist_ok=True)
            t = tbl if tbl is not None else pa.Table.from_pylist(self._round_order)
            round_no = rn

            def spool_job() -> None:
                tmp = d / f".round={round_no:06d}.parquet.tmp"
                pq.write_table(t, tmp)
                tmp.rename(d / f"round={round_no:06d}.parquet")  # atomic; rerun-idempotent

            self._submit_write(spool_job)
        elif not self.config.spool_dir and rows:
            if tbl is not None:
                self._order_tables.append(tbl)
            else:
                self.crawl_order.extend(self._round_order)
        self._order_rows += rows
        if self.ckpt is not None:
            # a checkpoint must never reference in-flight spool/output files
            self._drain_writes()
            if tbl is not None and not self._round_order and rows:
                self._round_order = tbl.to_pylist()
            # append-only: serialize only THIS round's new crawl-order rows —
            # checkpoint cost stays constant in crawl length (VERDICT r1 #3)
            self.ckpt.save_round(
                rn,
                strategy=self.strategy,
                seen_blobs=self.seen.snapshot(),
                deferred=list(self.deferred),
                progress={
                    "fetched": self.fetched,
                    "arrival": self._arrival,
                    "pending_seeds": self._pending_seeds,
                },
                metrics=round_metrics,
                input_digest=str(self.store.store_dir),
                crawl_order_delta=list(self._round_order),
            )
        self._round_order = []
        self._round_order_tbl = None

    # -- tabular (array-native) round loop --------------------------------
    # FIFO strategies at batch pop_k: the candidate set lives in a polars
    # frame (url, host, priority, arrival, depth) and link edges flow as
    # Arrow columns from the parse actors straight into the strategy's
    # chunk queue.  Observable behavior (crawl order, metrics, checkpoint
    # layout) is identical to the scalar loop — pinned by
    # tests/test_engine_tabular.py — but driver cost per round is
    # O(vector ops), not O(urls x edges) Python objects.  At 256-node
    # scale the driver is the only non-sharded component, so this is the
    # crawl-rate ceiling (VERDICT r2 #1/#7).

    _FRONTIER_SCHEMA = {
        "url": pl.String,
        "host": pl.String,
        "priority": pl.Float64,
        "arrival": pl.Int64,
        "depth": pl.Int64,
    }

    _ORDER_SCHEMA = pa.schema(
        [
            ("round", pa.int64()),
            ("pop_index", pa.int64()),
            ("url", pa.string()),
            ("priority", pa.float64()),
            ("found", pa.bool_()),
        ]
    )

    def _pop_table(self, k: int, nonblocking: bool = False):
        """Seeds + strategy.pop_array as one frontier frame
        (arrival-stamped).  With ``nonblocking`` returns ``(frame,
        blocked)``: the pop stops (blocked=True) if it would have to wait
        on the in-flight round's off-driver push task — the
        round-pipelining probe."""
        if self._staged_supply:
            self._drain_staged(block=False)  # enqueue ready bundle chunks
        seed_urls: List[str] = []
        if self._pending_seeds:
            ns = min(len(self._pending_seeds), k)
            seed_urls = self._pending_seeds[:ns]
            self._pending_seeds = self._pending_seeds[ns:]
        pop_urls: List[str] = []
        pop_depths: List[int] = []
        blocked = False
        if len(seed_urls) < k:
            if nonblocking and hasattr(self.strategy, "pop_array_nb"):
                pop_urls, pop_depths, blocked = self.strategy.pop_array_nb(
                    k - len(seed_urls)
                )
            else:
                pop_urls, pop_depths = self.strategy.pop_array(k - len(seed_urls))
        urls = seed_urls + pop_urls
        n = len(urls)
        arrival = np.arange(self._arrival, self._arrival + n, dtype=np.int64)
        self._arrival += n
        # seeds outrank everything (scalar path: priority=inf); FIFO pops
        # rank by -arrival (earlier pops first)
        priority = (-arrival).astype(np.float64)
        priority[: len(seed_urls)] = np.inf
        df = pl.DataFrame(
            {
                "url": urls,
                "host": hosts_of_array(urls),
                "priority": priority,
                "arrival": arrival,
                "depth": [0] * len(seed_urls) + pop_depths,
            },
            schema=self._FRONTIER_SCHEMA,
        )
        return (df, blocked) if nonblocking else df

    def _deferred_to_df(self) -> "pl.DataFrame":
        """Candidate-list deferred state (from resume / scalar rounds) as a
        frontier frame."""
        cands = self.deferred
        self.deferred = []
        return pl.DataFrame(
            {
                "url": [c2.url for c2 in cands],
                "host": [c2.host for c2 in cands],
                "priority": [c2.priority for c2 in cands],
                "arrival": [c2.arrival for c2 in cands],
                "depth": [int(c2.ctx.get("depth", 0)) for c2 in cands],
            },
            schema=self._FRONTIER_SCHEMA,
        )

    @staticmethod
    def _df_to_candidates(df: "pl.DataFrame") -> List[Candidate]:
        """Frontier frame -> Candidate list (checkpoint compatibility; the
        deferred set is the small over-budget tail, not the frontier)."""
        return [
            Candidate(
                url=u, host=h, priority=p, ctx={"depth": d} if p != float("inf") else {},
                arrival=a,
            )
            for u, h, p, a, d in df.select(
                ["url", "host", "priority", "arrival", "depth"]
            ).iter_rows()
        ]

    # weight-strategy frontier frame: priority IS the pop weight; ``mass``
    # is the parked mass from the claim (NaN = none: seeds / never-claimed);
    # ``claimed`` = True only for rows claimed by THIS round's pop (their
    # pool value is provably 0 — the cascade skips their take wave)
    _W_FRONTIER_SCHEMA = {
        "url": pl.Utf8,
        "host": pl.Utf8,
        "priority": pl.Float64,
        "arrival": pl.Int64,
        "mass": pl.Float64,
        "claimed": pl.Boolean,
    }

    def _pop_table_weight(self, k: int) -> "pl.DataFrame":
        """Seeds + strategy.pop_table as one weight frontier frame —
        the columnar analogue of the weight branch of
        :meth:`_pop_candidates` (no Candidate objects, no ctx dicts)."""
        seed_urls: List[str] = []
        if self._pending_seeds:
            ns = min(len(self._pending_seeds), k)
            seed_urls = self._pending_seeds[:ns]
            self._pending_seeds = self._pending_seeds[ns:]
        pop_urls: List[str] = []
        pop_w = np.zeros(0, dtype=np.float64)
        if len(seed_urls) < k:
            pop_urls, pop_w = self.strategy.pop_table(k - len(seed_urls))
        if not isinstance(pop_urls, list):
            # Arrow wire form from the fused pop: zero-copy into the
            # frame when there are no seeds (every round but the first)
            pop_s = pl.Series("url", pl.from_arrow(pop_urls))
            pop_urls = pop_s.to_list() if seed_urls else None
        else:
            pop_s = None
        if seed_urls or pop_s is None:
            urls = seed_urls + (pop_urls or [])
            url_col: Any = urls
            host_col: Any = hosts_of_array(urls)
        else:
            url_col = pop_s
            host_col = hosts_of_array(pop_s)
        n = len(url_col)
        arrival = np.arange(self._arrival, self._arrival + n, dtype=np.int64)
        self._arrival += n
        ns = len(seed_urls)
        seed_mass = np.full(ns, np.nan)
        if ns:
            for i, u in enumerate(seed_urls):
                sm = self._seed_mass_of(u)
                if sm is not None:
                    seed_mass[i] = sm[1]
        priority = np.concatenate(
            [np.full(ns, np.inf), np.asarray(pop_w, dtype=np.float64)]
        )
        mass = np.concatenate([seed_mass, np.asarray(pop_w, dtype=np.float64)])
        claimed = np.zeros(n, dtype=bool)
        claimed[ns:] = True  # popped rows were claimed by the pop itself
        return pl.DataFrame(
            {
                "url": url_col,
                "host": host_col,
                "priority": priority,
                "arrival": arrival,
                "mass": mass,
                "claimed": claimed,
            },
            schema=self._W_FRONTIER_SCHEMA,
        )

    def _deferred_to_weight_df(self) -> "pl.DataFrame":
        """Candidate-list deferred state as a weight frontier frame."""
        cands = self.deferred
        self.deferred = []
        mass = []
        for c2 in cands:
            mv = getattr(c2, "mass", None)
            mass.append(float(mv[1]) if mv is not None else float("nan"))
        return pl.DataFrame(
            {
                "url": [c2.url for c2 in cands],
                "host": [c2.host for c2 in cands],
                "priority": [c2.priority for c2 in cands],
                "arrival": [c2.arrival for c2 in cands],
                "mass": mass,
                "claimed": [False] * len(cands),
            },
            schema=self._W_FRONTIER_SCHEMA,
        )

    @staticmethod
    def _w_df_to_candidates(df: "pl.DataFrame") -> List[Candidate]:
        """Weight frontier frame -> Candidate list (loop-exit hand-off;
        the deferred set is the small over-budget tail)."""
        out = []
        for u, h, p, a, mv in df.select(
            ["url", "host", "priority", "arrival", "mass"]
        ).iter_rows():
            c2 = Candidate(
                url=u, host=h, priority=p,
                ctx=({} if p == float("inf") else {"weight": p}), arrival=a,
            )
            if mv is not None and mv == mv:
                c2.mass = ("haircut", mv)
            out.append(c2)
        return out

    def _admit_df(
        self, frontier: "pl.DataFrame", budget: int
    ) -> Tuple["pl.DataFrame", "pl.DataFrame"]:
        """Vectorized admit_per_host over a frontier frame: rank within
        host by (priority desc, arrival asc); first ``budget`` (or the
        host's robots Crawl-delay cap) admit; both outputs keep frontier
        order (== arrival order).

        The ranking runs as a numpy kernel: per-round frames are small
        (pop_k rows), where polars' thread-pool fork/join dominates the
        expression chain this replaced (measured 1.7-3.0 ms/round vs
        ~0.2 ms — the dominant driver-serial item of the weight crawl,
        VERDICT r4 #1).  The math is identical: stable
        (priority desc, frontier order) sequence, running count per host
        along it, admit while the count is under the host's cap."""
        host_budgets = (
            self._delay_budgets(frontier["host"].unique().to_list())
            if self.config.obey_robots and frontier.height
            else None
        )
        if (budget <= 0 and not host_budgets) or frontier.height == 0:
            return frontier, frontier.clear()
        n = frontier.height
        pri = frontier["priority"].to_numpy()
        ord_idx = np.lexsort((np.arange(n), -pri))  # priority desc, stable
        no_cap = np.iinfo(np.int64).max
        if host_budgets:
            # robots Crawl-delay caps need the actual host strings
            uh, codes = np.unique(frontier["host"].to_numpy(), return_inverse=True)
            cap_of = np.full(len(uh), budget if budget > 0 else no_cap, dtype=np.int64)
            for i, h in enumerate(uh):
                hb = host_budgets.get(h)
                if hb is not None:
                    cap_of[i] = hb
        else:
            # uniform cap: group hosts by 64-bit hash instead of string
            # compare (np.unique on object strings is the admit stage's
            # hot spot, ~0.5ms/round).  A collision merges two hosts'
            # budget counters — i.e. strictly MORE polite, never less —
            # with ~2^-64 per-pair probability.
            hh = frontier["host"].hash(seed=0).to_numpy()
            uh64, codes = np.unique(hh, return_inverse=True)
            cap_of = np.full(
                len(uh64), budget if budget > 0 else no_cap, dtype=np.int64
            )
        cs = codes[ord_idx]
        sidx = np.argsort(cs, kind="stable")
        srt = cs[sidx]
        starts = np.flatnonzero(np.r_[True, srt[1:] != srt[:-1]])
        counts = np.diff(np.r_[starts, n])
        rank_in_host = np.empty(n, dtype=np.int64)
        rank_in_host[sidx] = np.arange(n) - np.repeat(starts, counts)
        admit_ord = rank_in_host < cap_of[cs]
        mask = np.empty(n, dtype=bool)
        mask[ord_idx] = admit_ord
        s = pl.Series(mask)
        return frontier.filter(s), frontier.filter(~s)

    def _resolve_edge_counts(self, block: bool = True) -> None:
        """Fill deferred per-round edge counts.  ``block=False`` resolves
        only the counts whose push-join task already finished (the round
        loop's cheap opportunistic fill); the final ``_result`` barrier
        resolves the rest."""
        pending, self._pending_edge_counts = self._pending_edge_counts, []
        if not pending:
            return
        if not block:
            refs = [r for _, r in pending]
            ready, _ = ray.wait(refs, num_returns=len(refs), timeout=0, fetch_local=True)
            ready_set = set(ready)
            still = [(m_, r) for m_, r in pending if r not in ready_set]
            pending = [(m_, r) for m_, r in pending if r in ready_set]
            self._pending_edge_counts = still
        if pending:
            for (m_, _), n in zip(pending, ray.get([r for _, r in pending])):
                # a round's count may arrive in several per-bundle parts
                # (staged-supply mode) — accumulate from the -1 sentinel
                m_["edges"] = (m_["edges"] if m_["edges"] >= 0 else 0) + int(n)

    # -- staged frontier supply (pipeline mode) ----------------------------
    # In pipeline mode each decode bundle gets its OWN push join, and the
    # resulting chunk refs are staged; pops move every chunk whose join
    # already finished into the frontier queue.  Supply therefore trickles
    # in continuously instead of waiting for the round's slowest bundle —
    # the per-round straggler barrier the whole-round join imposes.
    # Ordering across bundles is ready-first (the pipeline mode's
    # documented relaxation); the fetch set is unchanged.

    def _drain_staged(self, block: bool) -> None:
        staged = self._staged_supply
        if not staged:
            return
        if block:
            ready = staged
            self._staged_supply = []
        else:
            r, _ = ray.wait(staged, num_returns=len(staged), timeout=0, fetch_local=True)
            rset = set(r)
            ready = [x for x in staged if x in rset]
            self._staged_supply = [x for x in staged if x not in rset]
        for ref in ready:
            self.strategy.push_chunk_ref(ref)

    # -- pipelined tabular round loop --------------------------------------
    # Round pipelining (VERDICT r3 #1): while round N's decode wave runs on
    # the workers, the driver already pops/admits/submits round N+1 — its
    # pops come from queue chunks of rounds <= N-1 (FIFO order: round N's
    # push appends at the TAIL, so the head entries round N+1 consumes are
    # identical to the sequential schedule's).  When the head can't supply
    # pop_k entries without round N's push (``pop_array_nb`` blocked), the
    # engine completes round N first and pops the remainder — falling back
    # to the exact sequential schedule.  Crawl order, metrics and counts
    # are therefore identical to the strict BSP loop (pinned by
    # tests/test_engine_tabular.py); only wall-clock overlap changes.
    # Checkpointed crawls never pipeline: a checkpoint of round N must not
    # contain round N+1's pops half-applied.

    def _prepare_tab_round(
        self, deferred: "pl.DataFrame", rn: int, flush, has_pending=lambda: False
    ):
        """Pop/admit/seen-submit/fetch-submit one round.  Returns
        (state_dict | None, next_deferred); None = frontier exhausted.
        ``flush`` completes the OLDEST in-flight round when the pop needs
        more supply, returning False when nothing is in flight."""
        c = self.config
        t0 = time.perf_counter()
        m: Dict[str, Any] = {"round": rn}
        stage_s: Dict[str, float] = {}
        t_mark = [t0]

        def _lap(stage: str) -> None:
            now = time.perf_counter()
            stage_s[stage] = round(now - t_mark[0], 6)
            t_mark[0] = now

        pipelined = c.pipeline and self.ckpt is None
        wait_s = 0.0  # time spent WAITING for frontier supply (worker-bound
        # decode/join latency, not driver compute) — reported as pop_wait
        popped, blocked = self._pop_table(c.pop_k, nonblocking=True)
        while popped.height < c.pop_k:
            if pipelined and has_pending() and popped.height >= c.pipeline_min_pop:
                # throughput mode: run a PARTIAL round with what the
                # frontier already holds and overlap the in-flight rounds'
                # decode waves (see CrawlConfig.pipeline)
                break
            if blocked:
                # wait for already-submitted push-join tasks (in flight
                # on the workers — short waits)
                tw = time.perf_counter()
                rest = self._pop_table(c.pop_k - popped.height)
                wait_s += time.perf_counter() - tw
                if rest.height:
                    popped = pl.concat([popped, rest]) if popped.height else rest
                blocked = False
                continue
            # the queue truly ran out: land ONE in-flight round's push
            # (oldest first — the younger wave keeps the workers busy)
            # and keep popping; when nothing is in flight, fall back to
            # any staged per-bundle supply before declaring exhaustion
            tw = time.perf_counter()
            if flush():
                wait_s += time.perf_counter() - tw
                rest, blocked = self._pop_table(c.pop_k - popped.height, nonblocking=True)
                if rest.height:
                    popped = pl.concat([popped, rest]) if popped.height else rest
                continue
            if self._staged_supply:
                self._drain_staged(block=True)
                rest = self._pop_table(c.pop_k - popped.height)
                wait_s += time.perf_counter() - tw
                if rest.height:
                    popped = pl.concat([popped, rest]) if popped.height else rest
                continue
            break
        frontier = pl.concat([deferred, popped]) if deferred.height else popped
        m["candidates"] = frontier.height
        _lap("pop")
        if wait_s:
            # keep the driver-serial accounting honest: pop = driver
            # compute only, pop_wait = supply wait that rode on workers
            stage_s["pop"] = round(max(stage_s["pop"] - wait_s, 0.0), 6)
            stage_s["pop_wait"] = round(wait_s, 6)
        if frontier.height == 0:
            return None, deferred

        if c.allowed_hosts is not None:
            frontier = frontier.filter(pl.col("host").is_in(list(c.allowed_hosts)))
        if c.obey_robots:
            before = frontier.height
            ok = [self.robots.allowed(u) for u in frontier["url"].to_list()]
            frontier = frontier.filter(pl.Series(ok))
            m["robots_dropped"] = before - frontier.height

        adm, next_deferred = self._admit_df(frontier, c.host_budget)
        m["admitted"], m["deferred"] = adm.height, next_deferred.height
        _lap("admit")

        # submit the seen wave now, collect at complete: the mask's only
        # consumers (new_found / crawl order) run post-fetch, so the
        # sharded contains-and-insert RPCs ride inside the fetch wall
        seen_wave = (
            self.seen.filter_new_async(url_hash64(adm["url"])) if adm.height else None
        )
        _lap("seen")

        st: Dict[str, Any] = {
            "rn": rn,
            "t0": t0,
            "m": m,
            "stage_s": stage_s,
            "t_mark": t_mark,
            "adm": adm,
            "next_deferred": next_deferred,
            "seen_wave": seen_wave,
            "max_new": adm.height,
            "async": False,
            "handle": None,
            "sync": None,
        }
        if adm.height == 0:
            return st, next_deferred

        urls = adm["url"].to_list()
        # refs regime: big pool rounds keep texts/edges in the object
        # store — the driver gathers ONLY the (url, warc_ts) meta; the
        # push join and round-output writes run as tasks over the refs
        pool = self._get_fetch_pool() if ray.is_initialized() else None
        use_refs = (
            pool is not None
            and hasattr(self.strategy, "columnar_push_spec")
            and len(urls) > pool._balance_threshold()
            and len(urls) <= c.stream_threshold
        )
        if use_refs:
            push_spec = None
            if pipelined:
                # fused supply: each decode bundle computes its own push
                # chunk in-task (stages/fetch._decode_parse_bundle_push)
                mode, md = self.strategy.columnar_push_spec()
                push_spec = (adm.select(["url", "depth"]).to_arrow(), mode, md)
            st["handle"] = pool.fetch_parse_submit(
                urls, include_scripts=c.include_scripts, push_spec=push_spec
            )
            if push_spec is not None and st["handle"].chunk_refs is not None:
                # stage the per-bundle frontier chunks NOW: later pops
                # drain each one the moment its bundle finishes (empty
                # waves return a plain handle and take the join path)
                m["edges"] = -1
                for cr, nr in zip(st["handle"].chunk_refs, st["handle"].count_refs):
                    self._staged_supply.append(cr)
                    self._pending_edge_counts.append((m, nr))
            st["async"] = True
            _lap("fetch_submit")
        else:
            st["sync"] = self._fetch_and_parse(urls)
            _lap("fetch_parse")
        return st, next_deferred

    def _complete_tab_round(self, st: Dict[str, Any]) -> None:
        """Post-fetch half of a round: seen-collect, crawl order, push,
        writes, metrics, round hand-off.  Runs strictly in round order."""
        c = self.config
        m, stage_s, adm, rn = st["m"], st["stage_s"], st["adm"], st["rn"]
        t_mark = st["t_mark"]

        def _lap(stage: str) -> None:
            now = time.perf_counter()
            stage_s[stage] = round(now - t_mark[0], 6)
            t_mark[0] = now

        self._resolve_edge_counts(block=False)  # opportunistic fill only
        if adm.height == 0:
            m["fetched"] = 0
            m["elapsed_s"] = time.perf_counter() - st["t0"]
            self.metrics.append(m)
            if self.ckpt is not None:
                self.deferred = self._df_to_candidates(st["next_deferred"])
            self._end_round(m, rn)
            self.deferred = []
            self.round_no = rn + 1
            return

        if st["async"]:
            meta = st["handle"].collect_meta()
            text_refs, edge_refs = st["handle"].text_refs, st["handle"].edge_refs
            texts = edges = None
            _lap("fetch_parse")  # residual wait not hidden by overlap
        else:
            meta, texts, edges = st["sync"]
            text_refs = edge_refs = None
        new_mask = st["seen_wave"]()
        m["already_seen"] = int((~new_mask).sum())
        # a url is "new" if ANY of its occurrences passed the gate
        # (scalar loop's new_of OR-fold)
        adm = adm.with_columns(pl.Series("new", new_mask)).with_columns(
            pl.col("new").max().over("url")
        )
        found_list = meta.column("url").to_pylist()
        adm = adm.with_columns(pl.col("url").is_in(found_list).alias("found"))
        uniq = adm.unique(subset="url", keep="first", maintain_order=True)
        new_found = uniq.filter(pl.col("new") & pl.col("found"))
        m["fetched"] = new_found.height
        m["missing"] = adm.height - uniq.filter(pl.col("found")).height

        order = uniq.filter(pl.col("new")).select(
            pl.lit(rn, dtype=pl.Int64).alias("round"),
            pl.col("arrival").alias("pop_index"),
            "url",
            "priority",
            "found",
        )
        self._round_order_tbl = order.to_arrow().cast(self._ORDER_SCHEMA)

        # push: admitted x out-edges, in admitted-row then edge order —
        # identical to the scalar per-candidate push_pairs sequence.
        # The join runs on the pool's dedicated warm actor so the supply
        # chunk is never stuck behind the decode backlog (_PushJoinShard).
        if st["async"]:
            if st["handle"].chunk_refs is not None:
                # fused-push wave: per-bundle chunks + counts were staged
                # at prepare time (_decode_parse_bundle_push) — nothing to
                # submit here
                edge_count_ref = None
            else:
                mode, md = self.strategy.columnar_push_spec()
                pool = self._get_fetch_pool()
                adm_arrow = adm.select(["url", "depth"]).to_arrow()
                chunk_ref, edge_count_ref = pool.push_joiner.join.options(
                    num_returns=2
                ).remote(adm_arrow, mode, md, edge_refs)
                self.strategy.push_chunk_ref(chunk_ref)
        elif edges.num_rows:
            e = pl.from_arrow(edges.select(["src_url", "dst_url"])).with_row_index("ei")
            a = adm.select(["url", "depth"]).with_row_index("ai")
            j = a.join(e, left_on="url", right_on="src_url", how="inner").sort(
                ["ai", "ei"]
            )
            # columnar handoff: FIFO strategies enqueue the arrow arrays
            # as-is and only materialize chunks a pop actually reaches
            self.strategy.push_edges(j["url"], j["dst_url"], j["depth"])
        self.fetched += m["fetched"]
        _lap("push")

        if st["async"]:
            self._write_round_outputs_refs(
                text_refs, edge_refs, new_found["url"].to_list(), rn
            )
            # edge count rides on the push-join call; blocking here
            # costs the join's full latency, so resolve one round later
            # (checkpointed crawls resolve in _end_round because the
            # checkpoint persists round metrics).  Staged-supply rounds
            # queued their per-bundle count refs at push time.
            if edge_count_ref is not None:
                m["edges"] = -1
                self._pending_edge_counts.append((m, edge_count_ref))
            if self.ckpt is not None:
                self._resolve_edge_counts()
        else:
            m["edges"] = edges.num_rows
            if new_found.height:
                keep = pc.is_in(
                    texts.column("url"), value_set=pa.array(new_found["url"].to_list())
                )
                self._write_round_outputs(texts.filter(keep), edges, rn)
            else:
                self._write_round_outputs(texts.slice(0, 0), edges, rn)
        _lap("write")
        m["stage_s"] = stage_s
        m["elapsed_s"] = time.perf_counter() - st["t0"]
        self.metrics.append(m)
        if self.ckpt is not None:
            self.deferred = self._df_to_candidates(st["next_deferred"])
        self._end_round(m, rn)
        self.deferred = []
        self.round_no = rn + 1

    def _run_tabular(self) -> CrawlResult:
        c = self.config
        deferred = self._deferred_to_df()
        pending: List[Dict[str, Any]] = []  # in-flight rounds, oldest first

        def flush_one() -> bool:
            if pending:
                self._complete_tab_round(pending.pop(0))
                return True
            return False

        def flush() -> None:
            while pending:
                self._complete_tab_round(pending.pop(0))

        pipelined = c.pipeline and self.ckpt is None
        while True:
            if c.max_fetches is not None:
                if pipelined:
                    # throughput mode: check the exact count only.  Up to
                    # pipeline_depth rounds are already in flight when the
                    # budget trips (their fetches are submitted and cannot
                    # be recalled), so the overshoot bound is
                    # pipeline_depth x pop_k fetches, not one partial
                    # round — documented in CrawlConfig.
                    if self.fetched >= c.max_fetches:
                        flush()
                        break
                else:
                    # conservative bound: assume every admitted url of the
                    # in-flight round is new.  If even that can't reach the
                    # budget, the sequential schedule would run the next
                    # round too — safe to pipeline; otherwise sequentialize
                    # and re-check the exact count.
                    if (
                        self.fetched + (pending[0]["max_new"] if pending else 0)
                        >= c.max_fetches
                    ):
                        flush()
                        if self.fetched >= c.max_fetches:
                            break
                        continue
            if self.round_no + len(pending) >= c.max_rounds:
                flush()
                break
            rn = self.round_no + len(pending)
            st, deferred = self._prepare_tab_round(
                deferred, rn, flush_one, has_pending=lambda: bool(pending)
            )
            if st is None:
                flush()
                break
            if st["async"] and self.ckpt is None:
                pending.append(st)  # overlap: complete after later prepares
                depth = c.pipeline_depth if pipelined else 1
                while len(pending) > max(1, depth):
                    self._complete_tab_round(pending.pop(0))
            else:
                flush()  # sync rounds complete strictly in order
                self._complete_tab_round(st)
        flush()

        self.deferred = self._df_to_candidates(deferred)
        return self._result()

    def _run_tabular_weight(self) -> CrawlResult:
        """Columnar BSP round loop for batched weight strategies (VERDICT
        r4 #1: the scalar loop's per-candidate Python control plane —
        Candidate objects, ctx dicts, (node, mass, ctx) tuple lists — was
        the residual 22% driver-serial share of the weight crawl).

        - The frontier lives in polars frames end-to-end (pop_table /
          _admit_df / columnar order emission) — no per-url Python
          objects on the driver.
        - The round's edge tables stay in the object store: the push
          actor pulls the decode bundles' edge refs itself
          (push_round_refs), so edge rows never touch the driver; the
          engine's metrics tally rides a zero-cpu count task.
        - The fused push+scan+claim actor call is submitted right after
          the fetch wave, BEFORE the driver collects the round's meta —
          cascade replay overlaps the fetch wall and the driver's
          order/write bookkeeping.

        Rounds stay strict BSP (a weight pop depends on the previous
        round's cascade — there is no pipeline relaxation here) and pop
        order is IDENTICAL to the scalar loop (pinned by
        tests/test_engine_weight_tabular.py).  Checkpointed crawls keep
        the scalar loop: the frame/claim state is not checkpoint-form,
        the same posture as BFS pipelining."""
        c = self.config
        pool = self._get_fetch_pool()
        deferred = self._deferred_to_weight_df()
        # pipelined mode: the next pop's scan+claim is submitted BEFORE
        # the round's cascade (strategy.prepare_pop_stale), so pops are
        # one round STALE — zero cascade wait on the driver.  Exhaustive
        # fetch-set equality vs strict is pinned by tests; per-round pop
        # composition differs (the same relaxation class as BFS
        # pipeline=True).  Checkpointed crawls never take this loop.
        pipelined = (
            c.pipeline and hasattr(self.strategy, "prepare_pop_stale")
        )
        while self.round_no < c.max_rounds:
            if c.max_fetches is not None and self.fetched >= c.max_fetches:
                break
            t0 = time.perf_counter()
            m: Dict[str, Any] = {"round": self.round_no}
            stage_s: Dict[str, float] = {}
            t_mark = [t0]

            def _lap(stage: str) -> None:
                now = time.perf_counter()
                stage_s[stage] = round(now - t_mark[0], 6)
                t_mark[0] = now

            if hasattr(self.strategy, "last_pop_wait_s"):
                self.strategy.last_pop_wait_s = 0.0
            popped = self._pop_table_weight(c.pop_k)
            if popped.height == 0 and deferred.height == 0 and pipelined:
                # a stale scan can come up empty while the in-flight
                # cascade is still adding mass: barrier + fresh pop
                # before declaring the frontier exhausted
                popped = self._pop_table_weight(c.pop_k)
            frontier = pl.concat([deferred, popped]) if deferred.height else popped
            m["candidates"] = frontier.height
            _lap("pop")
            pw = getattr(self.strategy, "last_pop_wait_s", 0.0)
            if pw:
                # state-plane wait (fused actor round trip), not driver
                # compute — reported apart, as in the scalar loop
                stage_s["pop"] = round(max(stage_s["pop"] - pw, 0.0), 6)
                stage_s["pop_wait"] = round(pw, 6)
            if frontier.height == 0:
                break

            if c.allowed_hosts is not None:
                frontier = frontier.filter(pl.col("host").is_in(list(c.allowed_hosts)))
            if c.obey_robots:
                before = frontier.height
                ok = [self.robots.allowed(u) for u in frontier["url"].to_list()]
                frontier = frontier.filter(pl.Series(ok))
                m["robots_dropped"] = before - frontier.height

            adm, deferred = self._admit_df(frontier, c.host_budget)
            if deferred.height:
                # a deferred row's NEXT-round take must collect whatever
                # the in-between cascades accumulate on it — clear the
                # claim flag it carried from its pop round
                deferred = deferred.with_columns(pl.lit(False).alias("claimed"))
            m["admitted"], m["deferred"] = adm.height, deferred.height
            _lap("admit")

            seen_wave = (
                self.seen.filter_new_async(url_hash64(adm["url"])) if adm.height else None
            )
            _lap("seen")

            if adm.height == 0:
                m["fetched"] = 0
                m["elapsed_s"] = time.perf_counter() - t0
                self.metrics.append(m)
                self._end_round(m)
                self.round_no += 1
                continue

            urls = adm["url"].to_list()
            # refs regime only above the balanced-fetch crossover — the
            # same size gate the BFS tabular loop applies: small rounds
            # are faster on the fused per-actor fetch (one RPC per
            # shard), where the edge table is small enough to hand to the
            # push actor driver-side
            use_refs = (
                len(urls) > pool._balance_threshold()
                and len(urls) <= c.stream_threshold
            )
            texts = edges = None
            flags = adm["claimed"].to_numpy()
            if use_refs:
                # min_bundle_cost=2: BSP rounds have no overlapping wave
                # to absorb a decode straggler, so the round's wall IS
                # the last bundle — shatter finer than the pipelined-BFS
                # default (see _pack_bundles)
                handle = pool.fetch_parse_submit(
                    urls, include_scripts=c.include_scripts, min_bundle_cost=2.0
                )
                _lap("fetch_submit")
                if pipelined:
                    # next pop FIRST (actor FIFO puts it before the
                    # cascade -> stale by one round, zero driver wait),
                    # then the push without a fused scan
                    self.strategy.prepare_pop_stale(c.pop_k)
                    self.strategy.push_round_refs(
                        urls, adm["mass"].to_numpy(), handle.edge_refs,
                        scan_k=None, claimed_flags=flags,
                    )
                else:
                    # cascade + next pop in one fused fire-and-forget
                    # call (consumed by the next round's pop_table)
                    self.strategy.push_round_refs(
                        urls, adm["mass"].to_numpy(), handle.edge_refs,
                        scan_k=c.pop_k, claimed_flags=flags,
                    )
                m["edges"] = -1
                self._pending_edge_counts.append(
                    (m, _count_edge_rows.remote(*handle.edge_refs))
                )
                _lap("push")
                meta = handle.collect_meta()
                _lap("fetch_parse")
            else:
                meta, texts, edges = self._fetch_and_parse(urls)
                _lap("fetch_parse")
                if pipelined:
                    self.strategy.prepare_pop_stale(c.pop_k)
                self.strategy._last_k = c.pop_k  # fused scan size
                self.strategy.push_round_columnar(
                    (urls, adm["mass"].to_numpy()),
                    edges.column("src_url").combine_chunks(),
                    edges.column("dst_url").combine_chunks(),
                    claimed_flags=flags,
                )
                m["edges"] = edges.num_rows
                _lap("push")
            new_mask = seen_wave()
            # the seen RPCs were submitted before the fetch wall; this
            # collect is state-plane wait, accounted apart from driver
            # compute (the pop/pop_wait convention)
            _lap("seen_wait")
            m["already_seen"] = int((~new_mask).sum())
            if adm["url"].n_unique() == adm.height:
                # no url admitted twice this round (the common case): the
                # OR-fold window and the unique pass are identities, and
                # the whole bookkeeping runs arrow/numpy (polars ops on
                # these small frames pay thread-pool fork/join per op)
                url_arrow = adm["url"].to_arrow()
                found = pc.is_in(
                    url_arrow, value_set=meta.column("url").combine_chunks()
                ).to_numpy(zero_copy_only=False)
                keep = new_mask
                keep_pa = pa.array(keep)
                order_tbl = pa.table(
                    {
                        "round": pa.array(
                            np.full(int(keep.sum()), self.round_no, dtype=np.int64)
                        ),
                        "pop_index": pa.array(adm["arrival"].to_numpy()[keep]),
                        "url": url_arrow.filter(keep_pa).cast(pa.string()),
                        "priority": pa.array(adm["priority"].to_numpy()[keep]),
                        "found": pa.array(found[keep]),
                    },
                    schema=self._ORDER_SCHEMA,
                )
                m["fetched"] = int((new_mask & found).sum())
                m["missing"] = adm.height - int(found.sum())
                nf_mask = new_mask & found
            else:
                found_s = pl.Series(
                    "___f", pl.from_arrow(meta.column("url").combine_chunks())
                )
                uniq = (
                    adm.with_columns(pl.Series("new", new_mask))
                    .with_columns(
                        pl.col("new").max().over("url"),
                        pl.col("url").is_in(found_s).alias("found"),
                    )
                    .unique(subset="url", keep="first", maintain_order=True)
                )
                order = uniq.filter(pl.col("new")).select(
                    pl.lit(self.round_no, dtype=pl.Int64).alias("round"),
                    pl.col("arrival").alias("pop_index"),
                    "url",
                    "priority",
                    "found",
                )
                m["fetched"] = int(order["found"].sum())
                m["missing"] = adm.height - int(uniq["found"].sum())
                order_tbl = order.to_arrow().cast(self._ORDER_SCHEMA)
                nf_mask = None
            self._round_order_tbl = order_tbl
            self.fetched += m["fetched"]
            self._resolve_edge_counts(block=False)
            if c.out_dir:
                if nf_mask is not None:
                    nf = adm["url"].to_arrow().filter(pa.array(nf_mask)).to_pylist()
                else:
                    nf = order.filter(pl.col("found"))["url"].to_list()
                if use_refs:
                    self._write_round_outputs_refs(
                        handle.text_refs, handle.edge_refs, nf
                    )
                elif nf:
                    keep = pc.is_in(texts.column("url"), value_set=pa.array(nf))
                    self._write_round_outputs(texts.filter(keep), edges)
                else:
                    self._write_round_outputs(texts.slice(0, 0), edges)
            _lap("write")
            m["stage_s"] = stage_s
            m["elapsed_s"] = time.perf_counter() - t0
            self.metrics.append(m)
            self._end_round(m)
            self.round_no += 1

        self.deferred = self._w_df_to_candidates(deferred)
        return self._result()

    # -- main loop --------------------------------------------------------
    def run(self) -> CrawlResult:
        if self.strategy is None and not self.resume():
            self._init_state()
        c = self.config
        if ray.is_initialized():
            # start fetch actors + index prewarm NOW so actor startup
            # overlaps the first rounds instead of stalling round 1
            self._get_fetch_pool()
        if (
            self._fifo
            and hasattr(self.strategy, "pop_array")
            and c.pop_k > c.tabular_threshold
        ):
            return self._run_tabular()
        if (
            not self._fifo
            and hasattr(self.strategy, "pop_table")
            and hasattr(self.strategy, "push_round_refs")
            and c.pop_k > c.tabular_threshold
            and self.ckpt is None
            and ray.is_initialized()
            and self._get_fetch_pool() is not None
        ):
            # batched weight strategies get the columnar BSP loop (same
            # pop order as the scalar loop; checkpointed crawls keep the
            # scalar path — see _run_tabular_weight)
            return self._run_tabular_weight()
        while self.round_no < c.max_rounds:
            if c.max_fetches is not None and self.fetched >= c.max_fetches:
                break
            t0 = time.perf_counter()
            m: Dict[str, Any] = {"round": self.round_no}
            stage_s: Dict[str, float] = {}
            t_mark = t0

            def _lap(stage: str) -> None:
                nonlocal t_mark
                now = time.perf_counter()
                stage_s[stage] = round(now - t_mark, 6)
                t_mark = now

            if hasattr(self.strategy, "last_pop_wait_s"):
                self.strategy.last_pop_wait_s = 0.0
            cands = self.deferred + self._pop_candidates()
            self.deferred = []
            m["candidates"] = len(cands)
            _lap("pop")
            # sharded strategies report the state-plane wait inside their
            # batched pop (shard scan/claim RPCs — actor-bound latency,
            # not driver compute); keep the driver-serial account honest
            pw = getattr(self.strategy, "last_pop_wait_s", 0.0)
            if pw:
                stage_s["pop"] = round(max(stage_s["pop"] - pw, 0.0), 6)
                stage_s["pop_wait"] = round(pw, 6)
            if not cands:
                break

            if c.allowed_hosts is not None:
                cands = [x for x in cands if x.host in c.allowed_hosts]
            if c.obey_robots:
                before = len(cands)
                cands = [x for x in cands if self.robots.allowed(x.url)]
                m["robots_dropped"] = before - len(cands)

            admitted, self.deferred = admit_per_host(
                cands, c.host_budget,
                host_budgets=self._delay_budgets(x.host for x in cands),
            )
            m["admitted"], m["deferred"] = len(admitted), len(self.deferred)
            _lap("admit")

            # URL-seen gate.  A re-popped url (weight strategies legitimately
            # re-expand a node when pushes re-accumulate its residual — the
            # reference zeroes r only inside push, strategies/txs/appr.py:27-31)
            # is still fetched+pushed so its residual drains, but it is NOT
            # re-emitted to crawl order / text outputs and doesn't recount.
            new_of: Dict[str, bool] = {}
            # submit now, collect after fetch (mask consumers are post-fetch)
            seen_wave = (
                self.seen.filter_new_async(url_hash64([x.url for x in admitted]))
                if admitted
                else None
            )
            _lap("seen")

            if not admitted:
                m["fetched"] = 0
                m["elapsed_s"] = time.perf_counter() - t0
                self.metrics.append(m)
                self._end_round(m)
                self.round_no += 1
                continue  # next round pops again; loop exits when cands dry up

            urls = [x.url for x in admitted]
            meta, texts, edges = self._fetch_and_parse(urls)
            _lap("fetch_parse")
            new_mask = seen_wave()
            for x, n in zip(admitted, new_mask):
                new_of[x.url] = new_of.get(x.url, False) or bool(n)
            m["already_seen"] = int(sum(1 for n in new_mask if not n))
            found = set(meta.column("url").to_pylist())
            new_found = [u for u in dict.fromkeys(urls) if u in found and new_of.get(u, True)]
            m["fetched"], m["missing"] = len(new_found), len(urls) - len(found)
            m["edges"] = edges.num_rows

            columnar_push = hasattr(self.strategy, "push_round_columnar")
            if self._fifo:
                # dict-free edge flow: FIFO pushes only need (src -> [dst])
                adj: Dict[str, list] = {}
                for src, dst in zip(
                    edges.column("src_url").to_pylist(), edges.column("dst_url").to_pylist()
                ):
                    adj.setdefault(src, []).append(dst)
                adjacency = None
            elif columnar_push:
                adjacency = None  # edge columns pass through untouched below
            else:
                adjacency = self._edges_of_pages(meta, edges)
            emitted = set()
            for cand in admitted:
                if new_of.get(cand.url, True) and cand.url not in emitted:
                    emitted.add(cand.url)
                    self._round_order.append(
                        {
                            "round": self.round_no,
                            "pop_index": cand.arrival,
                            "url": cand.url,
                            "priority": cand.priority,
                            "found": cand.url in found,
                        }
                    )
            # push even when the page is missing (empty expansion), the
            # way a reference errback closes a sync window with no items
            if self._fifo:
                for cand in admitted:
                    self.strategy.push_pairs(cand.url, adj.get(cand.url, ()), **cand.ctx)
            elif columnar_push:
                # web edge shape (value=1.0): the round's edge columns go to
                # the strategy as-is — no per-edge dicts on the driver
                self.strategy.push_round_columnar(
                    [(c2.url, getattr(c2, "mass", None), c2.ctx) for c2 in admitted],
                    edges.column("src_url").combine_chunks(),
                    edges.column("dst_url").combine_chunks(),
                )
            elif hasattr(self.strategy, "push_round"):
                # sharded strategies: whole round in O(shards) RPCs
                self.strategy.push_round(
                    [
                        (c2.url, getattr(c2, "mass", None), c2.ctx,
                         adjacency.get(c2.url, []))
                        for c2 in admitted
                    ]
                )
            else:
                for cand in admitted:
                    restore_mass(self.strategy, cand.url, getattr(cand, "mass", None))
                    self.strategy.push(cand.url, adjacency.get(cand.url, []), **cand.ctx)
            self.fetched += len(new_found)
            if hasattr(self.strategy, "prepare_pop"):
                # all of this round's pool mutations are submitted — start
                # the next pop's shard scans now so they overlap write/ckpt
                self.strategy.prepare_pop(c.pop_k)
            _lap("push")

            if self.config.out_dir:  # don't filter tables nobody writes
                if new_found:
                    keep = pc.is_in(texts.column("url"), value_set=pa.array(new_found))
                    self._write_round_outputs(texts.filter(keep), edges)
                else:
                    self._write_round_outputs(texts.slice(0, 0), edges)
            _lap("write")
            m["stage_s"] = stage_s
            m["elapsed_s"] = time.perf_counter() - t0
            self.metrics.append(m)
            self._end_round(m)
            self.round_no += 1

        return self._result()

    def _result(self) -> CrawlResult:
        self._resolve_edge_counts()  # fill deferred per-round edge counts
        self._drain_writes()  # all round outputs durable before reporting
        # lazy: the gather barriers the strategy's pending push and ships
        # every node's score driver-side — deferred to first .ranks read
        strategy = self.strategy
        ranks = (
            (lambda: dict(strategy.get_node_rank())) if strategy is not None else {}
        )
        order = self.crawl_order
        order_tables = self._order_tables
        order_dir = None
        if self.config.spool_dir:
            order_dir = str(Path(self.config.spool_dir) / "order")
            order = self._read_spooled_order()
            order_tables = []
        n_rows = len(order) + sum(t.num_rows for t in order_tables)
        return CrawlResult(
            crawl_order=order,
            rounds=self.round_no,
            fetched=self.fetched,
            metrics=self.metrics,
            ranks=ranks,
            order_dir=order_dir,
            order_rows=self._order_rows if self.config.spool_dir else n_rows,
            order_tables=list(order_tables),
        )

    def _read_spooled_order(self) -> List[dict]:
        """Read the spooled crawl order back ONLY when small (convenience
        for tests/CLI); big crawls consume the parquet directly."""
        d = Path(self.config.spool_dir) / "order"
        if not d.is_dir():
            return []
        files = sorted(f for f in d.glob("round=*.parquet"))
        total = 0
        tables = []
        for f in files:
            t = pq.read_table(f)
            total += t.num_rows
            if total > self.config.spool_readback_rows:
                return []  # over the cap: caller reads order_dir itself
            tables.append(t)
        self._order_rows = total
        if not tables:
            return []
        return pa.concat_tables(tables).to_pylist()
