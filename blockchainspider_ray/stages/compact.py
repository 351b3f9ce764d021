"""Page-store compaction — the small-files maintenance pass.

Incremental crawling appends files per round into each ``part=k/``
directory; at 100 TB the store degrades into millions of KB-sized files
whose open/footer costs dominate every fetch and scan (the classic small-
files problem).  ``compact_store`` rewrites each partition as ONE parquet
file with the store's point-lookup row-group quantum, rows re-sorted by
url (the PageStore invariant the hash->row-group index relies on,
fixtures.py:174-220), optionally keeping only the newest ``warc_ts``
version of each url (recrawl dedup).

Shape: one Ray task per partition — embarrassingly parallel, no shuffle;
a partition is worker-heap-sized by the store's own partitioning contract
(url-hash modulo num_partitions — size num_partitions so corpus/P fits a
worker, same knob as any hash layout).  Writes are atomic per partition
(tmp file + rename) and the destination manifest is written last, so a
killed compaction run can simply be re-run: finished partitions are
detected and skipped (resumable output, one directory per shard).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

import ray

ROW_GROUP_SIZE = 256  # keep the fixtures.py point-lookup quantum


def _compact_partition(
    src_dir: str, dst_dir: str, row_group_size: int, keep_latest: bool
) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(str(p) for p in Path(src_dir).glob("*.parquet"))
    n_files_in = len(files)
    tables = [pq.read_table(f) for f in files]
    if tables:
        # incremental appends may carry drifted-but-castable types
        # (timestamp unit, large_string); unify on the first file's schema
        tables = [tables[0]] + [x.cast(tables[0].schema) for x in tables[1:]]
        t = pa.concat_tables(tables)
    else:
        t = None
    os.makedirs(dst_dir, exist_ok=True)
    out = Path(dst_dir) / "pages.parquet"
    if t is None or t.num_rows == 0:
        pq.write_table(pa.table({}), out)
        return {"rows_in": 0, "rows_out": 0, "files_in": n_files_in}
    rows_in = t.num_rows
    if keep_latest and "warc_ts" in t.column_names:
        # newest warc_ts per url; ties broken by later file order (stable
        # sort keeps the last occurrence when we dedup from the tail)
        order = pc.sort_indices(
            t, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
        )
        t = t.take(order)
        import numpy as np

        u = t.column("url").combine_chunks()
        neq_next = pc.not_equal(u.slice(0, len(u) - 1), u.slice(1))
        keep = np.flatnonzero(
            np.concatenate([neq_next.to_numpy(zero_copy_only=False), [True]])
        )
        t = t.take(pa.array(keep))
    else:
        t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
    tmp = Path(dst_dir) / ".pages.parquet.tmp"
    pq.write_table(t, tmp, row_group_size=row_group_size)
    os.replace(tmp, out)
    return {"rows_in": rows_in, "rows_out": t.num_rows, "files_in": n_files_in}


def compact_store(
    src: str,
    dst: str,
    row_group_size: int = ROW_GROUP_SIZE,
    keep_latest: bool = False,
    partitions: Optional[List[int]] = None,
) -> dict:
    """Compact every ``part=k`` of ``src`` into ``dst`` (may equal a fresh
    directory; compacting in place is not supported — write, verify,
    swap).  Returns aggregate counters.  Already-compacted destination
    partitions (single ``pages.parquet`` present) are skipped, so a
    killed run resumes by re-invocation."""
    src_p, dst_p = Path(src), Path(dst)
    manifest = src_p / "_MANIFEST"
    if not manifest.exists():
        raise ValueError(f"{src} has no _MANIFEST — not a page store")
    kv = dict(
        line.split("=", 1) for line in manifest.read_text().splitlines() if "=" in line
    )
    num_partitions = int(kv["num_partitions"])
    todo = partitions if partitions is not None else list(range(num_partitions))

    task = ray.remote(num_cpus=1)(_compact_partition)
    refs, skipped = [], 0
    for k in todo:
        d_dst = dst_p / f"part={k}"
        if (d_dst / "pages.parquet").exists():
            skipped += 1
            continue
        refs.append(
            task.remote(str(src_p / f"part={k}"), str(d_dst), row_group_size, keep_latest)
        )
    stats = ray.get(refs)
    dst_p.mkdir(parents=True, exist_ok=True)
    (dst_p / "_MANIFEST").write_text(manifest.read_text())
    return {
        "partitions": len(todo),
        "skipped": skipped,
        "rows_in": sum(s["rows_in"] for s in stats),
        "rows_out": sum(s["rows_out"] for s in stats),
        "files_in": sum(s["files_in"] for s in stats),
    }
