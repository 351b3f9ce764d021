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

import os
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


def _parse_pages(pages, include_scripts: bool = True):
    """(meta, texts, edges) triple from a fetched page table — the fused
    parse half of fetch_parse, shared by the shard actors and the balanced
    stateless decode tasks.  Byte-identical text per url (reference
    spiders/labels/web.py:118-123 regex chain) + canonical link edges."""
    import pyarrow as _pa

    from ..functions.links import decode_html
    from ..functions.text import extract_text
    from ..stages.parse import extract_links_stage

    meta_cols = [c for c in ("url", "warc_ts") if c in pages.column_names]
    meta = pages.select(meta_cols)
    texts = _pa.table(
        {
            "url": pages.column("url"),
            "text_extracted": _pa.array(
                [extract_text(decode_html(h)) for h in pages.column("html").to_pylist()],
                _pa.string(),
            ),
        }
    )
    edges = extract_links_stage(pages, include_scripts=include_scripts)
    return meta, texts, edges


# Per-WORKER-PROCESS caches for the stateless decode tasks: parquet file
# handles (metadata parse once per worker) and decoded row groups (same
# entry-count budget as the shard actors' LRU; a worker that re-decodes a
# row group another worker already has pays the decode once — capacity
# aggregates across the pool instead of pinning to partition owners).
_PF_CACHE: Dict[str, object] = {}
_RG_CACHE: "Dict[tuple, object]" = {}


def _pf_of(path: str):
    import pyarrow.parquet as _pq

    f = _PF_CACHE.get(path)
    if f is None:
        f = _PF_CACHE[path] = _pq.ParquetFile(path)
    return f


def _read_rgs_cached(path: str, rgs: List[int], columns: Optional[List[str]] = None):
    """Decoded tables for row groups of one file, worker-LRU-cached; misses
    are fetched in ONE batched read_row_groups call then sliced per group.
    ``columns`` prunes the decode — fetch_parse never needs the store's
    pre-extracted ``text``/``lang`` columns, which are ~half the bytes."""
    cache_max = int(os.environ.get("BCS_RG_CACHE_MAX", "192"))
    cols_key = tuple(columns) if columns else None
    f = _pf_of(path)
    if cache_max <= 0:
        return [f.read_row_groups(rgs, columns=columns)]
    out, missing = [], []
    for rg in rgs:
        t = _RG_CACHE.get((path, rg, cols_key))
        if t is not None:
            out.append(t)
        else:
            missing.append(rg)
    if missing:
        batch = f.read_row_groups(missing, columns=columns)
        md = f.metadata
        off = 0
        for rg in missing:
            n = md.row_group(rg).num_rows
            t = batch.slice(off, n)
            off += n
            _RG_CACHE[(path, rg, cols_key)] = t
            out.append(t)
        while len(_RG_CACHE) > cache_max:
            _RG_CACHE.pop(next(iter(_RG_CACHE)))
    return out


#: the only columns the fused decode+parse consumes (meta + html source)
_FETCH_PARSE_COLUMNS = ["url", "warc_ts", "html"]


def _empty_triple():
    import pyarrow as _pa

    meta = _pa.table({"url": _pa.array([], _pa.string())})
    texts = _pa.table(
        {"url": _pa.array([], _pa.string()), "text_extracted": _pa.array([], _pa.string())}
    )
    edges = _pa.table(
        {
            "src_url": _pa.array([], _pa.string()),
            "dst_url": _pa.array([], _pa.string()),
            "kind": _pa.array([], _pa.string()),
            "dst_host": _pa.array([], _pa.string()),
            "dst_hash": _pa.array([], _pa.uint64()),
        }
    )
    return meta, texts, edges


@ray.remote(num_cpus=1, num_returns=3)
def _decode_parse_bundle3(bundle: List[tuple], include_scripts: bool = True):
    """:func:`_decode_parse_bundle` with meta/texts/edges as THREE separate
    object refs: the driver gathers only the (url, warc_ts) meta — texts
    and edges stay in the object store for downstream tasks (round-output
    writers, the frontier push join), so page text and the link graph
    never stream through the driver at all."""
    r = _decode_parse_bundle_impl(bundle, include_scripts)
    if r is None:
        return _empty_triple()
    return r


def _decode_parse_bundle_impl(bundle: List[tuple], include_scripts: bool = True):
    """One balanced slice of a crawl round's decode+parse work.

    ``bundle`` = [(path, rgs, urls)] resolved by the partition-owner shard
    actors; runs in STATELESS tasks (any worker, any node with storage
    access) so Ray load-balances the heavy row-group decode + parse across
    the whole cluster instead of pinning it to index owners — the owner
    with the most row groups no longer sets the round's critical path."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    tables = []
    for path, rgs, urls in bundle:
        f = _pf_of(path)
        cols = [c for c in _FETCH_PARSE_COLUMNS if c in f.schema_arrow.names]
        parts_t = _read_rgs_cached(path, list(rgs), columns=cols)
        t = parts_t[0] if len(parts_t) == 1 else _pa.concat_tables(parts_t)
        t = t.filter(_pc.is_in(t.column("url"), value_set=_pa.array(urls)))
        if t.num_rows:
            tables.append(t)
    if not tables:
        return None
    return _parse_pages(_pa.concat_tables(tables), include_scripts)


@ray.remote(num_cpus=1)
def _decode_parse_bundle(bundle: List[tuple], include_scripts: bool = True):
    """Remote form of :func:`_decode_parse_bundle_impl` returning the
    (meta, texts, edges) triple as one object."""
    return _decode_parse_bundle_impl(bundle, include_scripts)


def _push_join_tables(adm_tbl, edges, mode: str, max_depth: int):
    """Frontier push join: admitted (url, depth) rows x the edge table, in
    (admitted-row, edge) order, with the FIFO strategy's depth gate + edge
    shaping applied.  Returns the ready-to-enqueue (urls, depths) chunk or
    None.  Shared by the whole-round joiner actor and the fused per-bundle
    decode tasks."""
    import numpy as np
    import polars as pl

    from ..strategies.bfs import _FifoBase, _interleave_arrow

    if not edges.num_rows or not adm_tbl.num_rows:
        return None
    e = pl.from_arrow(edges.select(["src_url", "dst_url"])).with_row_index("ei")
    a = pl.from_arrow(adm_tbl).with_row_index("ai")
    j = a.join(e, left_on="url", right_on="src_url", how="inner").sort(["ai", "ei"])
    s, t, d1 = _FifoBase._depth_filter_col(j["url"], j["dst_url"], j["depth"], max_depth)
    if s is None:
        return None
    if mode == "interleave":
        return (_interleave_arrow(s, t), np.repeat(d1, 2))
    return (t, d1)


@ray.remote(num_cpus=1, num_returns=5)
def _decode_parse_bundle_push(bundle, include_scripts, adm_tbl, mode, max_depth):
    """:func:`_decode_parse_bundle3` + the bundle's frontier push chunk:
    the push join runs INSIDE the decode task, so frontier supply lands
    the instant each bundle finishes — per-bundle granularity with no
    extra hop and no whole-round straggler barrier (the engine's pipeline
    mode; ordering across bundles is ready-first by design there)."""
    r = _decode_parse_bundle_impl(bundle, include_scripts)
    if r is None:
        m, t, e = _empty_triple()
        return m, t, e, None, 0
    meta, texts, edges = r
    return (
        meta,
        texts,
        edges,
        _push_join_tables(adm_tbl, edges, mode, max_depth),
        edges.num_rows,
    )


@ray.remote(num_cpus=0)  # service actor: light routing/IO, zero CPU claim so
# pools always schedule and can never deadlock compute tasks on small clusters
class _FetchShard:
    """One shard of the fetch actor pool: owns partitions ``p % k == i`` and
    keeps their ``pyarrow.dataset`` handles (file/row-group metadata) cached
    across rounds — repeated crawl-round lookups skip dataset re-open and
    per-call task setup.  Only metadata is cached; page bytes stream from
    storage per request, so memory stays O(partitions/k), not O(data)."""

    CACHE_MAX = 1024  # reference response-LRU size (cache.py:13)
    # Decoded row-group LRU: a crawl round's point lookups decode whole row
    # groups to pluck single rows (256-row groups -> ~256x read
    # amplification), and successive rounds hit the SAME row groups (a 12k-url
    # crawl over 782 groups touches each ~15x).  Caching the decoded Arrow
    # table turns those re-reads into in-memory filters.  Entry-count cap;
    # at production page sizes configure by bytes instead.  BCS_RG_CACHE_MAX
    # overrides (0 disables — the scaling bench uses that so both cluster
    # sizes pay real decode work instead of measuring aggregate cache size).
    RG_CACHE_MAX = int(os.environ.get("BCS_RG_CACHE_MAX", "192"))

    def __init__(self):
        from collections import OrderedDict

        self._files = {}  # part -> [pq.ParquetFile]
        self._index = {}  # part -> (sorted url_hash64 array, (file_idx, rg_idx) arrays)
        self._rg_cache: "OrderedDict[tuple, object]" = OrderedDict()
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

    def _rg_tables(self, part: int, files, fi: int, rgs: List[int], columns):
        """Per-row-group decoded tables for one file, LRU-cached when the
        full schema is requested (point lookups always are).  Misses are
        read in ONE batched ``read_row_groups`` call, then sliced back per
        group (slices share the read buffer; they are cached — and evicted —
        as a cohort, so the shared parent doesn't outlive its slices long)."""
        if columns is not None or self.RG_CACHE_MAX <= 0:
            return [files[fi].read_row_groups(rgs, columns=columns)]
        cache = self._rg_cache
        out, missing = [], []
        for rg in rgs:
            t = cache.get((part, fi, rg))
            if t is not None:
                cache.move_to_end((part, fi, rg))
                out.append(t)
            else:
                missing.append(rg)
        if missing:
            batch = files[fi].read_row_groups(missing)
            md = files[fi].metadata
            off = 0
            for rg in missing:
                n = md.row_group(rg).num_rows
                t = batch.slice(off, n)
                off += n
                cache[(part, fi, rg)] = t
                out.append(t)
            while len(cache) > self.RG_CACHE_MAX:
                cache.popitem(last=False)
        return out

    def resolve(self, part_files: Dict[int, List[str]], part_urls: Dict[int, List[str]]):
        """Index-probe only: map this shard's urls to the (file path, row
        group) sets holding them, WITHOUT decoding anything.  Returns
        [(path, rg, [urls])] work items the driver greedy-packs into
        balanced stateless decode+parse bundles.  The index stays sharded
        (O(rows/k) per actor — the 10^10-url shape); only the elastic
        decode work leaves the owner."""
        from ..functions.urls import url_hash64

        items: Dict[tuple, List[str]] = {}
        paths_of: Dict[int, List[str]] = {}
        for part, urls in part_urls.items():
            paths = part_files[part]
            paths_of[part] = paths
            self._open(part, paths)
            h_sorted, fi_sorted, rg_sorted = self._rg_index(part, paths)
            want = url_hash64(urls)
            pos = np.searchsorted(h_sorted, want)
            n = len(h_sorted)
            for u, w, p in zip(urls, want, pos):
                while p < n and h_sorted[p] == w:
                    items.setdefault((part, int(fi_sorted[p]), int(rg_sorted[p])), []).append(u)
                    p += 1
        return [
            (paths_of[part][fi], rg, sorted(set(us)))
            for (part, fi, rg), us in items.items()
        ]

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
                parts_t = self._rg_tables(part, files, fi, rgs, columns)
                t = parts_t[0] if len(parts_t) == 1 else _pa.concat_tables(parts_t)
                t = t.filter(_pc.is_in(t.column("url"), value_set=want_set))
                if t.num_rows:
                    out.append(t)
                    if cacheable:
                        self._cache_put(t)
        if not out:
            return None
        return _pa.concat_tables(out)

    def fetch_parse(self, part_files, part_urls, include_scripts: bool = True):
        """Fused fetch+parse for the crawl engine: lookup the shard's urls
        and parse (byte-identical text + link edges) INSIDE the actor, so
        raw html never crosses the object store or touches the driver —
        the driver receives only (meta, texts, edges), all html-free.
        Mirrors the bulk-ingest fused design (bench.py fetch_parse_write)
        that the round-1 VERDICT found 25x faster than shipping html."""
        pages = self.lookup(part_files, part_urls, None)
        if pages is None:
            return None
        return _parse_pages(pages, include_scripts)


@ray.remote(num_cpus=0)
class _PushJoinShard:
    """Warm, dedicated lane for the crawl engine's frontier push join.

    The join is the frontier SUPPLY path: as a num_cpus=1 task it queues
    behind the round's decode backlog and delays the next round's pops by
    a whole wave; as a num_cpus=0 task Ray spawns cold worker processes
    (polars + package import per process) whose startup dwarfs the join.
    A single warm actor runs each round's join immediately, in order,
    off the task queues.  ~30ms of CPU per round of oversubscription."""

    def join(self, adm_tbl, mode: str, max_depth: int, edge_refs):
        """See crawl.engine push semantics: join the admitted (url,
        depth) frame onto the round's edge tables (refs — the link graph
        never touches the driver), sort to (admitted-row, edge) push
        order, apply the strategy's depth gate + edge shaping; returns
        (ready-to-enqueue chunk | None, edge count)."""
        import pyarrow as pa

        parts = [t for t in ray.get(list(edge_refs)) if t.num_columns > 0]
        nonempty = [t for t in parts if t.num_rows > 0]
        edges = (
            pa.concat_tables(nonempty)
            if nonempty
            else (parts[0].slice(0, 0) if parts else pa.table({}))
        )
        return _push_join_tables(adm_tbl, edges, mode, max_depth), edges.num_rows

    def warm(self) -> bool:
        import polars  # noqa: F401

        from ..strategies import bfs  # noqa: F401

        return True


class FetchHandle:
    """In-flight fetch+parse wave: text/edge ObjectRef lists (bundle
    order) plus a deferred meta gather.  ``collect_meta()`` blocks until
    the decode tasks finish and returns the concatenated html-free
    (url, warc_ts) meta table; idempotent."""

    __slots__ = ("meta_refs", "text_refs", "edge_refs", "chunk_refs", "count_refs", "_meta")

    def __init__(self, meta_refs, text_refs, edge_refs, meta, chunk_refs=None, count_refs=None):
        self.meta_refs = meta_refs
        self.text_refs = text_refs
        self.edge_refs = edge_refs
        # set on fused-push waves (_decode_parse_bundle_push): per-bundle
        # frontier chunk refs + edge-count refs, in bundle order
        self.chunk_refs = chunk_refs
        self.count_refs = count_refs
        self._meta = meta

    def collect_meta(self):
        import pyarrow as pa

        if self._meta is None:
            metas = ray.get(self.meta_refs)
            self._meta = pa.concat_tables(
                [m for m in metas if m is not None and m.num_rows]
                or [_empty_triple()[0]]
            )
        return self._meta


class FetchPool:
    """K persistent fetch actors sharded by ``partition % k`` (the stateful
    actor-pool form of :meth:`PageStore.lookup_parallel`; reference fetch =
    per-provider HTTP clients, our fetch = partition-owned parquet scans)."""

    _shared: "Dict[tuple, FetchPool]" = {}

    def __init__(self, store: "PageStore", k: int = 8, prewarm: bool = False):
        self.store = store
        self.k = k
        self.actors = [_FetchShard.remote() for _ in range(k)]
        self.push_joiner = _PushJoinShard.remote()  # see _PushJoinShard
        self.push_joiner.warm.remote()
        self._prewarm_refs = None
        if prewarm:
            self.prewarm()

    @classmethod
    def shared(cls, store: "PageStore", k: int = 8, prewarm: bool = False) -> "FetchPool":
        """Process-wide pool reuse, keyed by (store dir, k) — fetch actors
        (and their row-group caches/indexes) are long-lived infrastructure
        like the reference's persistent HTTP sessions + response LRU, so
        back-to-back crawls against one store shouldn't re-pay actor spawn
        and index build.  Dead pools (e.g. after ray.shutdown) are evicted
        and rebuilt."""
        key = (str(store.store_dir), k)
        pool = cls._shared.get(key)
        if pool is not None:
            try:  # liveness probe: a dead/killed actor raises on remote call
                ray.get(pool.actors[0].cache_stats.remote())
            except Exception:
                pool = None
        if pool is None:
            cls._shared.clear()  # hold at most one store's actors
            pool = cls._shared[key] = cls(store, k=k, prewarm=prewarm)
        return pool

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
        per_actor = self._route(urls)
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

    def _route(self, urls: Sequence[str]) -> Dict[int, Dict[int, List[str]]]:
        """actor -> {partition -> urls} routing for a url batch.

        Vectorized: one stable argsort by partition + boundary split, so
        routing a 16k-url round costs numpy kernels, not a per-url Python
        dict append (measured ~6ms/round on the driver serial path)."""
        import numpy as np

        parts = self.store.partitions_for(urls)
        n = len(parts)
        if n == 0:
            return {}
        order = np.argsort(parts, kind="stable")
        sorted_parts = parts[order]
        bounds = np.flatnonzero(np.diff(sorted_parts)) + 1
        urls_arr = np.asarray(list(urls), dtype=object)[order]
        per_actor: Dict[int, Dict[int, List[str]]] = {}
        start = 0
        for end in list(bounds) + [n]:
            p = int(sorted_parts[start])
            per_actor.setdefault(p % self.k, {})[p] = urls_arr[start:end].tolist()
            start = end
        return per_actor

    @staticmethod
    def _balance_threshold() -> int:
        """Round size above which fetch_parse uses the two-wave balanced
        path: the per-actor fused path pins each partition's decode+parse
        to its index owner, and the owner with the most row groups sets
        the round's critical path (measured: >50% of fetch_parse wall was
        straggler gap at 32 cpus).

        The threshold is cache-aware.  With the decoded row-group LRU
        enabled, repeat-heavy crawls (small stores, re-visited row groups)
        are faster on the OWNER actors — the LRU is partition-local, so
        locality beats balance; stateless tasks scatter the same row
        group's decode across many workers and the hit rate collapses.
        With the cache disabled (the scaling protocol, and the honest
        10^10-url regime where nothing repeats) balance wins everywhere,
        so the threshold drops to the latency crossover."""
        env = os.environ.get("BCS_FP_BALANCE_MIN")
        if env is not None:
            return int(env)
        cache_on = int(os.environ.get("BCS_RG_CACHE_MAX", "192")) > 0
        return 4096 if cache_on else 512

    def fetch_parse(self, urls: Sequence[str], include_scripts: bool = True):
        """Fused distributed fetch+parse: the driver gathers only the
        html-free (meta, texts, edges) triple.

        Small rounds: one RPC per shard actor (lookup+parse in-actor).
        Big rounds: wave 1 asks each shard to RESOLVE its urls against the
        sharded hash->row-group index (microseconds, tiny payloads); the
        driver greedy-packs the resolved (file, row group, urls) items into
        cost-balanced bundles; wave 2 runs the heavy decode+parse as
        stateless num_cpus=1 tasks Ray schedules anywhere — work no longer
        skews to whichever owner drew the most row groups this round."""
        import pyarrow as pa

        urls = list(urls)
        metas, texts, edges = [], [], []
        if len(urls) > self._balance_threshold():
            per_actor = self._route(urls)
            item_refs = [
                self.actors[a].resolve.remote(
                    {p: self.store._partition_files([p]) for p in pu}, pu
                )
                for a, pu in sorted(per_actor.items())
            ]
            items = [it for ref in ray.get(item_refs) for it in ref]
            bundles = self._pack_bundles(items)
            for r in ray.get(
                [_decode_parse_bundle.remote(b, include_scripts) for b in bundles]
            ):
                if r is not None:
                    metas.append(r[0])
                    texts.append(r[1])
                    edges.append(r[2])
        elif urls:
            per_actor = self._route(urls)
            refs = [
                self.actors[a].fetch_parse.remote(
                    {p: self.store._partition_files([p]) for p in pu}, pu, include_scripts
                )
                for a, pu in sorted(per_actor.items())
            ]
            for r in ray.get(refs):
                if r is not None:
                    metas.append(r[0])
                    texts.append(r[1])
                    edges.append(r[2])
        if not metas:
            empty_meta = pa.table(
                {"url": pa.array([], pa.string())}
            )
            empty_text = pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "text_extracted": pa.array([], pa.string()),
                }
            )
            empty_edges = pa.table(
                {
                    "src_url": pa.array([], pa.string()),
                    "dst_url": pa.array([], pa.string()),
                    "kind": pa.array([], pa.string()),
                    "dst_host": pa.array([], pa.string()),
                    "dst_hash": pa.array([], pa.uint64()),
                }
            )
            return empty_meta, empty_text, empty_edges
        return (
            pa.concat_tables(metas),
            pa.concat_tables(texts),
            pa.concat_tables(edges),
        )

    def fetch_parse_submit(
        self, urls: Sequence[str], include_scripts: bool = True, push_spec=None,
        min_bundle_cost: float = 8.0,
    ):
        """Asynchronous balanced fetch+parse: resolve the urls against the
        sharded hash->row-group index (one fast RPC wave), pack the decode
        bundles, SUBMIT the decode+parse tasks, and return a
        :class:`FetchHandle` immediately.  The caller gathers the html-free
        meta later via ``handle.collect_meta()`` — so the engine can
        prepare/submit the NEXT crawl round while this round's decode wave
        is still running (the round-pipelining that removes the BSP
        driver-serial floor from the scaling-critical path).

        ``push_spec=(adm_tbl, mode, max_depth)`` fuses the frontier push
        join into each decode task (_decode_parse_bundle_push): the handle
        then carries per-bundle ``chunk_refs``/``count_refs`` and no
        separate join step is needed."""
        urls = list(urls)
        if not urls:
            m, t, e = _empty_triple()
            return FetchHandle(None, [ray.put(t)], [ray.put(e)], m)
        per_actor = self._route(urls)
        item_refs = [
            self.actors[a].resolve.remote(
                {p: self.store._partition_files([p]) for p in pu}, pu
            )
            for a, pu in sorted(per_actor.items())
        ]
        items = [it for ref in ray.get(item_refs) for it in ref]
        bundles = self._pack_bundles(items, min_cost=min_bundle_cost)
        if not bundles:
            m, t, e = _empty_triple()
            return FetchHandle(None, [ray.put(t)], [ray.put(e)], m)
        if push_spec is not None:
            adm_tbl, mode, max_depth = push_spec
            adm_ref = ray.put(adm_tbl)  # shipped once, shared by all bundles
            outs = [
                _decode_parse_bundle_push.remote(
                    b, include_scripts, adm_ref, mode, max_depth
                )
                for b in bundles
            ]
            return FetchHandle(
                [o[0] for o in outs],
                [o[1] for o in outs],
                [o[2] for o in outs],
                None,
                chunk_refs=[o[3] for o in outs],
                count_refs=[o[4] for o in outs],
            )
        triples = [_decode_parse_bundle3.remote(b, include_scripts) for b in bundles]
        return FetchHandle(
            [t[0] for t in triples], [t[1] for t in triples], [t[2] for t in triples], None
        )

    def fetch_parse_refs(self, urls: Sequence[str], include_scripts: bool = True):
        """Balanced fetch+parse that keeps texts and edges IN THE OBJECT
        STORE: returns (meta_table, text_refs, edge_refs) where only the
        html-free (url, warc_ts) meta is gathered to the driver.  Round
        outputs and the frontier push join consume the refs in downstream
        tasks, so page text and the link graph never stream through the
        driver — the O(round-bytes) driver gather the plain fetch_parse
        still pays.  Ref lists are in bundle order (deterministic), so a
        consumer concatenating them reproduces fetch_parse's edge order
        exactly."""
        h = self.fetch_parse_submit(urls, include_scripts=include_scripts)
        return h.collect_meta(), h.text_refs, h.edge_refs

    @staticmethod
    def _pack_bundles(items: List[tuple], min_cost: float = 8.0) -> List[List[tuple]]:
        """Greedy-pack resolved (path, rg, urls) items into cost-balanced
        decode bundles, ~3 per CPU so Ray's scheduler absorbs residual
        imbalance.  Same-file row groups stay together (chunked in rg
        order) so each task issues ONE batched read_row_groups per file;
        chunks then LPT-pack by estimated cost (decode is per-row-group,
        parse is per-url).

        ``min_cost`` floors the per-bundle cost (~1 unit per rg decode ≈
        6.5ms).  The default 8 suits the PIPELINED crawl, whose depth-2+
        waves absorb stragglers and whose rounds otherwise shatter into
        tiny tasks (measured +13% CPU at 16 vs 4 cpus).  Strict-BSP
        callers (the weight crawl) pass a smaller floor: with no
        overlapping wave, the round's wall IS the last bundle, and a
        ~650-url round packed to 8-cost bundles leaves 12 of 16 cores
        idle (measured: 4 bundles -> 52ms decode wall at 16 cpus vs 13ms
        at 2-cost bundles)."""
        import heapq

        if not items:
            return []
        cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
        per_cpu = int(os.environ.get("BCS_BUNDLES_PER_CPU", "2"))
        rough_total = sum(len([rg]) + 0.02 * len(us) for _, rg, us in items)
        n_bundles = max(
            1, min(per_cpu * cpus, len(items), int(rough_total / min_cost) or 1)
        )
        # measured at the bench store shape: ~6.5ms per row-group decode vs
        # ~0.12ms per url parse -> decode dominates ~50:1; weighting urls
        # higher lets rg counts per bundle skew 4x and the decode tail
        # re-appears
        cost = lambda rgs, n_urls: len(rgs) + 0.02 * n_urls  # noqa: E731
        by_file: Dict[str, List[tuple]] = {}
        for path, rg, urls in items:
            by_file.setdefault(path, []).append((rg, urls))
        total = sum(cost([rg], len(us)) for path, rg, us in items)
        target = max(total / n_bundles, 1.0)
        chunks: List[tuple] = []  # (cost, path, rgs, urls)
        for path, rg_items in by_file.items():
            rg_items.sort()
            rgs: List[int] = []
            us: List[str] = []
            c = 0.0
            for rg, urls in rg_items:
                rgs.append(rg)
                us.extend(urls)
                c += cost([rg], len(urls))
                if c >= target:
                    chunks.append((c, path, rgs, us))
                    rgs, us, c = [], [], 0.0
            if rgs:
                chunks.append((c, path, rgs, us))
        chunks.sort(reverse=True)  # LPT: biggest chunk first
        heap = [(0.0, i) for i in range(min(n_bundles, len(chunks)))]
        bundles: List[List[tuple]] = [[] for _ in range(len(heap))]
        for c, path, rgs, us in chunks:
            load, i = heapq.heappop(heap)
            bundles[i].append((path, rgs, us))
            heapq.heappush(heap, (load + c, i))
        return bundles

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
        # memoized per partition-dir: the store is immutable for the life
        # of a crawl and the fetch path asks for the same partitions every
        # round — re-globbing is pure driver-serial overhead
        cache = getattr(self, "_pf_cache", None)
        if cache is None:
            cache = self._pf_cache = {}
        files: List[str] = []
        for d in self._partition_paths(parts):
            got = cache.get(d)
            if got is None:
                p = Path(d)
                if p.is_dir():
                    got = [str(f) for f in sorted(p.glob("*.parquet"))]
                else:
                    got = [d]
                cache[d] = got
            files.extend(got)
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
