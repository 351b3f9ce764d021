"""Fetch = partition-pruned lookup join against the Parquet page store.

The reference "fetches" a node's data over HTTP (spiders/labels/web.py:40-44
for pages, middlewares/txs/blockscan/external.py:35-48 for edges).  With the
web as a 10^10-row Parquet table, fetch becomes a key-lookup join: the page
store is hash-partitioned by ``url_hash64(url) % P`` at write time
(fixtures.write_pages_store), so one crawl round only opens the partitions
its frontier URLs hash into and pushes an ``isin`` row filter into the
Parquet scan — never a full-table scan.

At cluster scale P is thousands; a round touching H urls reads at most
min(H, P) partitions in parallel Ray read tasks.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray

from ..functions.urls import url_hash64


@ray.remote(num_cpus=1)
def _lookup_partition(files: List[str], urls: List[str], columns: Optional[List[str]]):
    """One partition's slice of a batched url lookup (runs as a Ray task)."""
    import pyarrow.compute as _pc
    import pyarrow.dataset as _pads

    ds = _pads.dataset(files)
    return ds.to_table(filter=_pc.field("url").isin(urls), columns=columns)


@ray.remote(num_cpus=0)  # service actor: light routing/IO, zero CPU claim so
# pools always schedule and can never deadlock compute tasks on small clusters
class _FetchShard:
    """One shard of the fetch actor pool: owns partitions ``p % k == i`` and
    keeps their ``pyarrow.dataset`` handles (file/row-group metadata) cached
    across rounds — repeated crawl-round lookups skip dataset re-open and
    per-call task setup.  Only metadata is cached; page bytes stream from
    storage per request, so memory stays O(partitions/k), not O(data)."""

    CACHE_MAX = 1024  # reference response-LRU size (cache.py:13)

    def __init__(self):
        from collections import OrderedDict

        self._files = {}  # part -> [pq.ParquetFile]
        self._index = {}  # part -> (sorted url_hash64 array, (file_idx, rg_idx) arrays)
        # response LRU (reference middlewares/txs/blockscan/cache.py:13,34-52:
        # 1024-entry LRU + hit-rate reporting).  Weight-ranked crawls
        # re-expand hot nodes, so repeated point lookups short-circuit the
        # row-group decode entirely.  Rows are stored as plain dicts (a
        # table slice would pin its whole parent row-group buffer).
        self._page_cache: "OrderedDict[str, dict]" = OrderedDict()
        self._cache_schema = None
        self._cache_hits = 0
        self._cache_misses = 0

    def _open(self, part: int, paths: List[str]):
        import pyarrow.parquet as _pq

        entry = self._files.get(part)
        if entry is None:
            entry = self._files[part] = [_pq.ParquetFile(p) for p in paths]
        return entry

    def _rg_index(self, part: int, paths: List[str]):
        """Per-partition hash(url) -> (file, row_group) map, built once from
        the url column only (~8 bytes/url in memory).  Point lookups then
        decode just the row groups their urls live in, not the partition."""
        idx = self._index.get(part)
        if idx is None:
            from ..functions.urls import url_hash64

            hashes, fis, rgs = [], [], []
            for fi, f in enumerate(self._open(part, paths)):
                for rg in range(f.num_row_groups):
                    urls = f.read_row_group(rg, columns=["url"]).column("url").to_pylist()
                    h = url_hash64(urls)
                    hashes.append(h)
                    fis.append(np.full(len(h), fi, dtype=np.int32))
                    rgs.append(np.full(len(h), rg, dtype=np.int32))
            h_all = np.concatenate(hashes) if hashes else np.array([], dtype=np.uint64)
            fi_all = np.concatenate(fis) if fis else np.array([], dtype=np.int32)
            rg_all = np.concatenate(rgs) if rgs else np.array([], dtype=np.int32)
            order = np.argsort(h_all)
            idx = self._index[part] = (h_all[order], fi_all[order], rg_all[order])
        return idx

    def build_indexes(self, part_files: Dict[int, List[str]]) -> int:
        """Eagerly build the hash->row-group indexes for owned partitions
        (the lazy build costs several seconds on the first big round)."""
        for part, paths in part_files.items():
            self._rg_index(part, paths)
        return len(part_files)

    def cache_stats(self) -> Dict[str, int]:
        return {"hits": self._cache_hits, "misses": self._cache_misses}

    def _cache_put(self, table) -> None:
        cache = self._page_cache
        self._cache_schema = table.schema
        for row in table.to_pylist():
            u = row["url"]
            cache.pop(u, None)
            if len(cache) >= self.CACHE_MAX:
                cache.popitem(last=False)
            cache[u] = row

    def _cache_take(self, urls: List[str]):
        """Split urls into (hit_rows, missing_urls); hits refresh recency."""
        cache = self._page_cache
        rows, missing = [], []
        for u in urls:
            row = cache.pop(u, None)
            if row is None:
                missing.append(u)
            else:
                cache[u] = row  # refresh recency
                rows.append(row)
        self._cache_hits += len(rows)
        self._cache_misses += len(missing)
        return rows, missing

    def lookup(self, part_files: Dict[int, List[str]], part_urls: Dict[int, List[str]], columns):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from ..functions.urls import url_hash64

        out = []
        # LRU only in the point-lookup regime: caching a bulk round would
        # cost a full-row to_pylist (html included) for rows BFS-style
        # crawls never re-fetch; re-pops from weight strategies arrive in
        # small batches and DO hit
        n_total = sum(len(u) for u in part_urls.values())
        cacheable = columns is None and n_total <= 128
        for part, urls in part_urls.items():
            if cacheable:
                hit_rows, urls = self._cache_take(urls)
                if hit_rows:
                    out.append(_pa.Table.from_pylist(hit_rows, schema=self._cache_schema))
                if not urls:
                    continue
            paths = part_files[part]
            files = self._open(part, paths)
            h_sorted, fi_sorted, rg_sorted = self._rg_index(part, paths)
            want = url_hash64(urls)
            pos = np.searchsorted(h_sorted, want)
            targets = {}
            n = len(h_sorted)
            for w, p in zip(want, pos):
                while p < n and h_sorted[p] == w:  # all rgs sharing this hash
                    targets[(int(fi_sorted[p]), int(rg_sorted[p]))] = True
                    p += 1
            if not targets:
                continue
            # one read + one filter per FILE (row groups batched), not per
            # row group — fewer decode passes on multi-rg lookups
            by_file: Dict[int, List[int]] = {}
            for fi, rg in sorted(targets):
                by_file.setdefault(fi, []).append(rg)
            want_set = _pa.array(urls)
            for fi, rgs in by_file.items():
                t = files[fi].read_row_groups(rgs, columns=columns)
                t = t.filter(_pc.is_in(t.column("url"), value_set=want_set))
                if t.num_rows:
                    out.append(t)
                    if cacheable:
                        self._cache_put(t)
        if not out:
            return None
        return _pa.concat_tables(out)


class FetchPool:
    """K persistent fetch actors sharded by ``partition % k`` (the stateful
    actor-pool form of :meth:`PageStore.lookup_parallel`; reference fetch =
    per-provider HTTP clients, our fetch = partition-owned parquet scans)."""

    def __init__(self, store: "PageStore", k: int = 8, prewarm: bool = False):
        self.store = store
        self.k = k
        self.actors = [_FetchShard.remote() for _ in range(k)]
        self._prewarm_refs = None
        if prewarm:
            self.prewarm()

    def prewarm(self) -> None:
        """Build every partition's hash->row-group index concurrently
        across the shards (non-blocking; the first lookup that needs a
        shard naturally waits on its actor queue)."""
        per_actor: Dict[int, Dict[int, List[str]]] = {}
        for p in range(self.store.num_partitions):
            per_actor.setdefault(p % self.k, {})[p] = self.store._partition_files([p])
        self._prewarm_refs = [
            self.actors[a].build_indexes.remote(pf) for a, pf in per_actor.items()
        ]

    def lookup(self, urls: Sequence[str], columns: Optional[List[str]] = None):
        import pyarrow as pa

        urls = list(urls)
        if not urls:
            return self.store.lookup_table([])
        parts = self.store.partitions_for(urls)
        by_part: Dict[int, List[str]] = {}
        for u, p in zip(urls, parts.tolist()):
            by_part.setdefault(int(p), []).append(u)
        per_actor: Dict[int, Dict[int, List[str]]] = {}
        for p, us in by_part.items():
            per_actor.setdefault(p % self.k, {})[p] = us
        refs = [
            self.actors[a].lookup.remote(
                {p: self.store._partition_files([p]) for p in pu}, pu, columns
            )
            for a, pu in sorted(per_actor.items())
        ]
        tables = [t for t in ray.get(refs) if t is not None]
        if not tables:
            return self.store.lookup_table([])
        return pa.concat_tables(tables)

    def cache_stats(self) -> Dict[str, int]:
        """Aggregate response-LRU hit/miss counts across shards (the
        reference's periodic hit-rate report, cache.py:34-52)."""
        stats = ray.get([a.cache_stats.remote() for a in self.actors])
        return {
            "hits": sum(s["hits"] for s in stats),
            "misses": sum(s["misses"] for s in stats),
        }


class PageStore:
    """Read side of the hash-partitioned page table."""

    def __init__(self, store_dir: str):
        self.store_dir = Path(store_dir)
        manifest = self.store_dir / "_MANIFEST"
        if manifest.exists():
            kv = dict(
                line.split("=", 1)
                for line in manifest.read_text().splitlines()
                if "=" in line
            )
            self.num_partitions = int(kv["num_partitions"])
        else:  # un-manifested directory: treat as one partition
            self.num_partitions = 0

    def _partition_paths(self, parts: Sequence[int]) -> List[str]:
        if self.num_partitions == 0:
            return [str(self.store_dir)]
        return [str(self.store_dir / f"part={k}") for k in sorted(set(parts))]

    def _partition_files(self, parts: Sequence[int]) -> List[str]:
        files: List[str] = []
        for d in self._partition_paths(parts):
            p = Path(d)
            if p.is_dir():
                files.extend(str(f) for f in sorted(p.glob("*.parquet")))
            else:
                files.append(d)
        return files

    def partitions_for(self, urls: Sequence[str]) -> np.ndarray:
        h = url_hash64(list(urls))
        if self.num_partitions == 0:
            return np.zeros(len(h), dtype=np.int64)
        return (h % np.uint64(self.num_partitions)).astype(np.int64)

    def lookup(
        self,
        urls: Sequence[str],
        columns: Optional[List[str]] = None,
        parallelism: int = -1,
    ) -> "ray.data.Dataset":
        """Dataset of page rows whose url is in ``urls`` — only the matching
        hash partitions are opened, and the isin predicate is pushed into the
        parquet scan (row-group pruning + late materialization)."""
        urls = list(urls)
        if not urls:
            # empty dataset with the store schema
            return ray.data.read_parquet(self._partition_files([0])).limit(0)
        parts = self.partitions_for(urls)
        paths = self._partition_files(parts.tolist())
        flt = pc.field("url").isin(urls)
        # partitioning=None: the part=<k>/ layout is a physical bucketing key,
        # not a logical hive column — inferring it would bolt a `part` column
        # onto some blocks and break schema unification downstream.
        return ray.data.read_parquet(
            paths,
            filter=flt,
            columns=columns,
            partitioning=None,
            override_num_blocks=None if parallelism <= 0 else parallelism,
        )

    def lookup_parallel(self, urls: Sequence[str], columns: Optional[List[str]] = None):
        """Arrow-table lookup fanned out as one Ray task per hash partition.

        Each task opens ONLY its partition's files and filters for ONLY the
        urls that hash into it, so a round touching H urls costs
        min(H, P) parallel partition scans — the distributed form of
        :meth:`lookup_table` (which scans serially on the driver)."""
        urls = list(urls)
        if not urls:
            ds = pads.dataset(self._partition_files([0]))
            return ds.schema.empty_table()
        parts = self.partitions_for(urls)
        by_part = {}
        for u, p in zip(urls, parts.tolist()):
            by_part.setdefault(p, []).append(u)
        refs = [
            _lookup_partition.remote(self._partition_files([p]), us, columns)
            for p, us in sorted(by_part.items())
        ]
        tables = ray.get(refs)
        tables = [t for t in tables if t.num_rows > 0]
        if not tables:
            ds = pads.dataset(self._partition_files([0]))
            return ds.to_table(columns=columns).slice(0, 0)
        import pyarrow as pa

        return pa.concat_tables(tables)

    def lookup_table(self, urls: Sequence[str], columns: Optional[List[str]] = None):
        """Driver-side Arrow table lookup for small control-plane rounds
        (bounded by the politeness budget): avoids Dataset overhead when a
        round admits only a handful of URLs."""
        urls = list(urls)
        if not urls:
            ds = pads.dataset(self._partition_files([0]))
            return ds.schema.empty_table()
        parts = self.partitions_for(urls)
        ds = pads.dataset(self._partition_files(parts.tolist()))
        return ds.to_table(filter=pc.field("url").isin(urls), columns=columns)
