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
from typing import List, Optional, Sequence

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray

from ..functions.urls import url_hash64


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
