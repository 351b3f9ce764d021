"""Distributed WARC writer — the sink half of the WARC source
(functions/warc.py parses; this emits).

Each write task serializes its blocks' (url, warc_date, payload) rows as
WARC/1.0 response records and writes ONE ``part-<task>.warc`` shard —
the Common-Crawl layout where a crawl is many independent ~1 GB files
and the file is the unit of read parallelism.  Shards write to a temp
name and rename atomically, so a retried/rerun task overwrites its own
shard instead of appending (the same rerun-idempotence contract as the
engine's spool files).

Reference analogue: the CSV/JSONL item pipelines (stages/sinks.py maps
those); WARC output is the beyond-reference interchange format a
training-data crawl actually ships.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Iterable

import pyarrow as pa
from ray.data import Datasink

from ..functions.warc import build_warc_record


class WarcDatasink(Datasink):
    def __init__(
        self,
        out_dir: str,
        url_col: str = "url",
        date_col: str = "warc_date",
        payload_col: str = "payload",
    ):
        self.out_dir = out_dir
        self.url_col = url_col
        self.date_col = date_col
        self.payload_col = payload_col

    def on_write_start(self) -> None:
        Path(self.out_dir).mkdir(parents=True, exist_ok=True)

    def write(self, blocks: Iterable, ctx) -> Dict[str, Any]:
        recs = []
        rows = 0
        for block in blocks:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            if block.num_rows == 0:
                continue
            urls = block.column(self.url_col).to_pylist()
            dates = block.column(self.date_col).to_pylist()
            payloads = block.column(self.payload_col).to_pylist()
            for u, d, p in zip(urls, dates, payloads):
                if isinstance(p, str):
                    p = p.encode()
                recs.append(build_warc_record(u, d, p))
            rows += block.num_rows
        if recs:
            path = Path(self.out_dir) / f"part-{ctx.task_idx:05d}.warc"
            tmp = path.with_name(path.name + ".tmp")
            tmp.write_bytes(b"".join(recs))
            tmp.rename(path)  # atomic; rerun-idempotent per task
        return {"rows": rows}

    def on_write_complete(self, write_result) -> None:
        pass

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    def get_name(self) -> str:
        return f"WarcDatasink({self.out_dir})"


def write_warc(ds: "Any", out_dir: str, **cols: str) -> None:
    """Write a Dataset of (url, warc_date, payload) rows as WARC shards."""
    ds.write_datasink(WarcDatasink(out_dir, **cols))
