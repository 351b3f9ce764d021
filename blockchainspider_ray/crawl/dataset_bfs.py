"""Dataset-native BFS crawl: the frontier IS a ray.data.Dataset.

The round engine (engine.py) keeps a driver-side candidate list bounded by
pop_k — right for rank strategies whose pop is a global argmax.  BFS needs
no argmax (SURVEY.md §2.4: "BFS distributable: round = groupby(url) min
depth + anti-join vs seen"), so its round can run END-TO-END as Dataset
ops with no per-url driver state:

    frontier_r (Dataset[url, host, depth])
      | map_batches: url-seen gate (sharded cuckoo actors, batched RPC)
      | groupby(host).map_groups: politeness admission (budget/host/round)
      | map_batches: partition-pruned page lookup + parse + link explode
      | groupby(url): min(depth) dedup  ->  frontier_{r+1}

Politeness deferral carries over as a Dataset union, so an over-budget
host's URLs defer without being lost (same carry-over contract as the
engine).  With unlimited budget the fetched set equals BFS reachability by
depth — pinned against the round engine in tests/test_dataset_bfs.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
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


def _frontier_table(urls: List[str], depth: int) -> pa.Table:
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([host_of(u) for u in urls], pa.string()),
            "depth": pa.array([depth] * len(urls), pa.int32()),
        }
    )


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
    ):
        self.store = store if isinstance(store, PageStore) else PageStore(store)
        self.seeds = [u for u in (canonicalize_url(s) for s in seeds) if u]
        self.depth = depth
        self.host_budget = host_budget
        self.max_rounds = max_rounds
        self.batch_size = batch_size
        self.seen = SeenSet(num_shards=seen_shards, use_ray=seen_use_ray)

    def _seen_gate(self, frontier: "ray.data.Dataset") -> "ray.data.Dataset":
        seen = self.seen
        if not seen.use_ray:
            # in-process shards can't be mutated from Ray tasks (each task
            # would get a read-only COPY) — gate driver-side in local mode
            tbl = _concat(frontier)
            if tbl.num_rows == 0:
                return ray.data.from_arrow(tbl)
            new = seen.filter_new(url_hash64(tbl.column("url").to_pylist()))
            return ray.data.from_arrow(tbl.filter(pa.array(new)))

        def gate(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            # actor-backed shards: handles serialize into the task; inserts
            # land on the shared actors, so parallel gating stays exact
            new = seen.filter_new(url_hash64(batch.column("url").to_pylist()))
            return batch.filter(pa.array(new))

        return frontier.map_batches(gate, batch_format="pyarrow", batch_size=8192)

    def _admit(self, frontier: "ray.data.Dataset") -> Tuple[pa.Table, pa.Table]:
        """groupby(host) politeness -> (admitted, deferred) tables."""
        budget = self.host_budget

        def admit(group: pa.Table) -> pa.Table:
            group = group.sort_by("url")  # deterministic within host
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

        if budget <= 0:
            tbl = _concat(frontier)
            return tbl, tbl.schema.empty_table()
        marked = _concat(
            frontier.groupby("host").map_groups(admit, batch_format="pyarrow")
        )
        if "admitted" not in marked.column_names:  # empty frontier round
            empty = _FRONTIER_SCHEMA.empty_table()
            return empty, empty
        mask = marked.column("admitted")
        keep = marked.drop_columns(["admitted"])
        return keep.filter(mask), keep.filter(pa.compute.invert(mask))

    def _fetch_parse_explode(self, admitted: "ray.data.Dataset") -> "ray.data.Dataset":
        """url batch -> fetched page rows -> out-link rows (url, host, depth)."""
        store = self.store

        def fetch_explode(batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            depths = dict(
                zip(urls, batch.column("depth").to_pylist())
            )
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
        """Returns (fetched_table, rounds): fetched = (url, depth, round)."""
        frontier = ray.data.from_arrow(_frontier_table(self.seeds, 0))
        deferred: Optional[pa.Table] = None
        fetched_rows: List[pa.Table] = []
        rounds = 0
        for rnd in range(self.max_rounds):
            if deferred is not None and deferred.num_rows:
                frontier = ray.data.from_arrow(
                    pa.concat_tables([_concat(frontier), deferred])
                )
                deferred = None
            # admission BEFORE the seen gate: a deferred url must not be
            # marked seen until the round that actually fetches it
            admitted_all, deferred = self._admit(frontier)
            admitted_tbl = _concat(
                self._seen_gate(ray.data.from_arrow(admitted_all))
            ) if admitted_all.num_rows else admitted_all
            if admitted_tbl.num_rows == 0 and (deferred is None or deferred.num_rows == 0):
                break
            rounds += 1
            if admitted_tbl.num_rows == 0:
                continue
            fetched_rows.append(
                pa.table(
                    {
                        "url": admitted_tbl.column("url"),
                        "depth": admitted_tbl.column("depth"),
                        "round": pa.array(
                            [rnd] * admitted_tbl.num_rows, pa.int32()
                        ),
                    }
                )
            )
            admitted = ray.data.from_arrow(admitted_tbl)
            links = self._fetch_parse_explode(admitted)
            # next frontier: depth-capped, min depth per url (dedup shuffle)
            capped = links.filter(expr=f"depth <= {self.depth}")
            nxt = (
                capped.groupby("url")
                .map_groups(
                    lambda g: g.sort_by("depth").slice(0, 1).select(
                        ["url", "host", "depth"]
                    ),
                    batch_format="pyarrow",
                )
            )
            frontier = nxt
        fetched = (
            pa.concat_tables(fetched_rows)
            if fetched_rows
            else pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "depth": pa.array([], pa.int32()),
                    "round": pa.array([], pa.int32()),
                }
            )
        )
        return fetched, rounds


def _concat(ds: "ray.data.Dataset") -> pa.Table:
    tables = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536)]
    tables = [t for t in tables if t.num_columns]
    if not tables:
        return _FRONTIER_SCHEMA.empty_table()
    return pa.concat_tables(tables)
