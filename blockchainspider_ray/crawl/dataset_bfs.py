"""Dataset-native BFS crawl: the frontier IS a ray.data.Dataset.

The round engine (engine.py) keeps a driver-side candidate list bounded by
pop_k — right for rank strategies whose pop is a global argmax.  BFS needs
no argmax (SURVEY.md §2.4: "BFS distributable: round = groupby(url) min
depth + anti-join vs seen"), so its round can run END-TO-END as Dataset
ops with no per-url driver state:

    frontier_r (Dataset[url, host, depth])
      | groupby(host).map_groups: politeness admission (budget/host/round)
      | map_batches: read-only seen PRE-filter (sharded cuckoo actors)
      | driver: exact seen filter_new + insert (once, retry-safe)
      | map_batches: partition-pruned page lookup + parse + link explode
      | groupby(url): min(depth) dedup  ->  frontier_{r+1}

Politeness deferral carries over as a Dataset (never concatenated onto the
driver), so an over-budget host's URLs defer without being lost — and
without driver memory growing with frontier size.  The seen gate is split
into a read-only membership check inside Ray Data tasks (safe under task
retry — it mutates nothing) plus a driver-side exact ``filter_new`` that
inserts each fetched URL exactly once.  With unlimited budget the fetched
set equals BFS reachability by depth — pinned against the round engine in
tests/test_dataset_bfs.py.

Scale notes: the ADMITTED set per round is bounded by host_budget ×
n_hosts and is the crawl's own output, so materializing it on the driver
(3 narrow columns, no html) is inherent to recording the crawl order; with
``spool_dir`` set, each round's fetched rows and frontier are instead
written to parquet (``fetched/round=N.parquet``) so nothing accumulates in
driver lists.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.urls import canonicalize_url, host_of, url_hash64
from ..stages.fetch import PageStore
from ..stages.parse import extract_links_stage
from ..stages.politeness import admit_per_host_table
from ..state.seen import SeenSet

_FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
    ]
)


def _cast_frontier(tbl: pa.Table) -> pa.Table:
    """Normalize to _FRONTIER_SCHEMA (polars emits large_string — ADVICE r1)."""
    tbl = tbl.select(["url", "host", "depth"])
    if tbl.schema != _FRONTIER_SCHEMA:
        tbl = tbl.cast(_FRONTIER_SCHEMA)
    return tbl


def _frontier_table(urls: List[str], depth: int) -> pa.Table:
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([host_of(u) for u in urls], pa.string()),
            "depth": pa.array([depth] * len(urls), pa.int32()),
        }
    )


def _empty_frontier_ds() -> "ray.data.Dataset":
    return ray.data.from_arrow(_FRONTIER_SCHEMA.empty_table())


class DatasetBFSCrawl:
    """BSP BFS where every round stage is a Dataset transform."""

    def __init__(
        self,
        store: "PageStore | str",
        seeds: List[str],
        depth: int = 2,
        host_budget: int = 0,
        max_rounds: int = 100,
        seen_shards: int = 4,
        seen_use_ray: bool = True,
        batch_size: int = 256,
        spool_dir: Optional[str] = None,
        obey_robots: bool = False,
    ):
        self.store = store if isinstance(store, PageStore) else PageStore(store)
        self.seeds = [u for u in (canonicalize_url(s) for s in seeds) if u]
        self.depth = depth
        self.host_budget = host_budget
        self.max_rounds = max_rounds
        self.batch_size = batch_size
        self.spool_dir = spool_dir
        self.obey_robots = obey_robots
        self.seen = SeenSet(num_shards=seen_shards, use_ray=seen_use_ray)

    def _robots_gate(self, frontier: "ray.data.Dataset") -> "ray.data.Dataset":
        """Per-host robots filter inside the groupby(host) stage: a group
        holds exactly one host's URLs, so its robots rules are fetched from
        the page store and compiled ONCE per group (the co-location
        RobotsCache's docstring prescribes for cluster scale).  Disallowed
        URLs are dropped, not deferred (engine semantics)."""
        if not self.obey_robots:
            return frontier
        store_dir = str(self.store.store_dir)

        def gate(group: pa.Table) -> pa.Table:
            from ..stages.robots import RobotsCache

            cache = RobotsCache(PageStore(store_dir), obey=True)
            keep = [cache.allowed(u) for u in group.column("url").to_pylist()]
            return _cast_frontier(group.filter(pa.array(keep, pa.bool_())))

        return frontier.groupby("host").map_groups(gate, batch_format="pyarrow")

    def _seen_prefilter(self, frontier: "ray.data.Dataset") -> "ray.data.Dataset":
        """READ-ONLY membership pre-filter inside Ray Data tasks.

        Drops URLs the sharded seen set already knows about.  Mutation-free,
        so a Ray Data task retry / block re-execution cannot lose URLs
        (round-1 ADVICE: inserts from inside map_batches are not retry-safe).
        The exact, inserting gate runs driver-side afterwards.
        """
        if not self.seen.use_ray:
            return frontier  # local shards would be shipped per batch; skip
        seen = self.seen

        def gate(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            known = seen.contains(url_hash64(batch.column("url").to_pylist()))
            return batch.filter(pa.array(~known))

        return frontier.map_batches(gate, batch_format="pyarrow", batch_size=8192)

    def _seen_commit(self, admitted: pa.Table) -> pa.Table:
        """Exact filter_new + insert, driver-side (exactly once per URL)."""
        if admitted.num_rows == 0:
            return admitted
        new = self.seen.filter_new(url_hash64(admitted.column("url").to_pylist()))
        return admitted.filter(pa.array(new))

    def _admit(
        self, frontier: "ray.data.Dataset"
    ) -> Tuple["ray.data.Dataset", "ray.data.Dataset"]:
        """groupby(host) politeness -> (admitted, deferred) Datasets.

        Both splits stay Datasets; the marked table is materialized into the
        object store (not the driver) so the two filters don't re-run the
        groupby shuffle.
        """
        budget = self.host_budget
        if budget <= 0:
            return frontier, _empty_frontier_ds()

        def admit(group: pa.Table) -> pa.Table:
            group = _cast_frontier(group).sort_by("url")  # deterministic within host
            # politeness ranks by priority DESC; BFS priority = shallow first
            group = group.append_column(
                "_prio",
                pa.compute.multiply(
                    pa.compute.cast(group.column("depth"), pa.int64()), -1
                ),
            )
            admitted, deferred = admit_per_host_table(group, budget, priority_col="_prio")
            admitted = admitted.drop_columns(["_prio"])
            deferred = deferred.drop_columns(["_prio"])
            admitted = admitted.append_column(
                "admitted", pa.array([True] * admitted.num_rows, pa.bool_())
            )
            deferred = deferred.append_column(
                "admitted", pa.array([False] * deferred.num_rows, pa.bool_())
            )
            return pa.concat_tables([admitted, deferred])

        marked = frontier.groupby("host").map_groups(
            admit, batch_format="pyarrow"
        ).materialize()
        if marked.count() == 0:
            return _empty_frontier_ds(), _empty_frontier_ds()

        def _split(want: bool):
            def f(batch: pa.Table) -> pa.Table:
                if "admitted" not in batch.column_names:
                    return _FRONTIER_SCHEMA.empty_table()
                mask = batch.column("admitted")
                if not want:
                    mask = pa.compute.invert(mask)
                return _cast_frontier(batch.filter(mask))

            return f

        admitted_ds = marked.map_batches(_split(True), batch_format="pyarrow")
        deferred_ds = marked.map_batches(_split(False), batch_format="pyarrow")
        return admitted_ds, deferred_ds

    def _fetch_parse_explode(self, admitted: "ray.data.Dataset") -> "ray.data.Dataset":
        """url batch -> fetched page rows -> out-link rows (url, host, depth)."""
        store = self.store

        def fetch_explode(batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            depths = dict(zip(urls, batch.column("depth").to_pylist()))
            if not urls:
                return _frontier_table([], 0).append_column(
                    "src_url", pa.array([], pa.string())
                )
            pages = store.lookup_table(urls)
            edges = extract_links_stage(pages, include_scripts=True)
            srcs = edges.column("src_url").to_pylist()
            dsts = edges.column("dst_url").to_pylist()
            out_urls, out_depth, out_src = [], [], []
            for s, d in zip(srcs, dsts):
                out_urls.append(d)
                out_depth.append(depths.get(s, 0) + 1)
                out_src.append(s)
            return pa.table(
                {
                    "url": pa.array(out_urls, pa.string()),
                    "host": pa.array([host_of(u) for u in out_urls], pa.string()),
                    "depth": pa.array(out_depth, pa.int32()),
                    "src_url": pa.array(out_src, pa.string()),
                }
            )

        return admitted.map_batches(
            fetch_explode, batch_format="pyarrow", batch_size=self.batch_size
        )

    def run(self):
        """Returns (fetched_table, rounds): fetched = (url, depth, round).

        With ``spool_dir`` set, per-round fetched rows are also written to
        ``spool_dir/fetched/round=N.parquet`` (append-only artifact; the
        in-memory return stays for API compatibility and is the narrow
        3-column crawl order, not pages).
        """
        frontier = ray.data.from_arrow(_frontier_table(self.seeds, 0))
        deferred: "ray.data.Dataset" = _empty_frontier_ds()
        fetched_rows: List[pa.Table] = []
        rounds = 0
        if self.spool_dir:
            os.makedirs(os.path.join(self.spool_dir, "fetched"), exist_ok=True)
        for rnd in range(self.max_rounds):
            n_deferred = deferred.count()
            if n_deferred:
                frontier = frontier.union(deferred)
                deferred = _empty_frontier_ds()
            # robots filter, then admission, then the seen gate: a deferred
            # url must not be marked seen until the round that fetches it
            frontier = self._robots_gate(frontier)
            admitted_ds, deferred = self._admit(frontier)
            admitted_tbl = _concat(self._seen_prefilter(admitted_ds))
            admitted_tbl = self._seen_commit(admitted_tbl)
            n_deferred = deferred.count()
            if admitted_tbl.num_rows == 0 and n_deferred == 0:
                break
            rounds += 1
            if admitted_tbl.num_rows == 0:
                # every admitted URL was already seen: drop them from the
                # frontier (ADVICE r1: re-admitting the stale frontier
                # livelocks and can starve deferred same-host URLs forever)
                frontier = _empty_frontier_ds()
                continue
            round_tbl = pa.table(
                {
                    "url": admitted_tbl.column("url"),
                    "depth": admitted_tbl.column("depth"),
                    "round": pa.array([rnd] * admitted_tbl.num_rows, pa.int32()),
                }
            )
            if self.spool_dir:
                # spool mode: rounds go straight to parquet; nothing
                # accumulates on the driver (run() reads the spool back
                # at the end — at real scale consume the spool directly)
                pq.write_table(
                    round_tbl,
                    os.path.join(self.spool_dir, "fetched", f"round={rnd}.parquet"),
                )
            else:
                fetched_rows.append(round_tbl)
            admitted = ray.data.from_arrow(admitted_tbl)
            links = self._fetch_parse_explode(admitted)
            # next frontier: depth-capped, min depth per url (dedup shuffle)
            capped = links.filter(expr=f"depth <= {self.depth}")
            nxt = capped.groupby("url").map_groups(
                lambda g: _cast_frontier(g.sort_by("depth").slice(0, 1)),
                batch_format="pyarrow",
            )
            # materialize: keeps blocks in the object store (not the driver)
            # and stops the lazy plan growing across rounds
            frontier = nxt.materialize()
        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "depth": pa.array([], pa.int32()),
                "round": pa.array([], pa.int32()),
            }
        )
        if self.spool_dir:
            import glob as _glob

            files = sorted(_glob.glob(os.path.join(self.spool_dir, "fetched", "round=*.parquet")))
            fetched = (
                pa.concat_tables([pq.read_table(f) for f in files]) if files else empty
            )
        else:
            fetched = pa.concat_tables(fetched_rows) if fetched_rows else empty
        return fetched, rounds


def _concat(ds: "ray.data.Dataset") -> pa.Table:
    tables = [
        pa.table(b) for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    tables = [_cast_frontier(t) for t in tables if t.num_columns]
    if not tables:
        return _FRONTIER_SCHEMA.empty_table()
    return pa.concat_tables(tables)
