"""SQL database sink — the DatabasePipeline as a ``ray.data.Datasink``.

The reference exports crawl items to PostgreSQL with batched inserts,
table-per-item-class (``bs_*``), JSON-encoded nested fields, duplicate
tolerance and retry-with-backoff (reference plugins/database/pipelines.py,
adapter.py:176-248, utils.py:34-60).  Re-expressed Ray-Data-first: the
sink is a ``Datasink`` whose write tasks each open their own connection
and upsert their blocks — the same shape a multi-node run uses against a
real server (every worker connects directly; no driver funnel).

This environment has no PostgreSQL server, so the default engine is
stdlib sqlite3, which proves the operator end-to-end (DDL, batched
upsert, JSON nesting, retry on lock contention).  Pointing it at
PostgreSQL is a connection-factory swap: sqlite's ``INSERT OR IGNORE``
becomes ``INSERT ... ON CONFLICT DO NOTHING``, everything else is ANSI.

Distributed-write notes (100 TB): sqlite serializes writers on one file —
fine for the conformance target, wrong for scale; against PostgreSQL each
write task holds one connection and the effective parallelism is bounded
by the server pool (set ``concurrency`` on ``write_datasink``'s upstream
op).  Blocks arrive unordered and possibly re-executed on retry: the
primary-key upsert makes writes idempotent, which is what makes the sink
resumable.
"""

from __future__ import annotations

import json
import sqlite3
import time
from typing import Any, Dict, Iterable, List, Optional

import pyarrow as pa
from ray.data import Datasink


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    return "TEXT"  # strings, timestamps (iso), json-encoded nested


class SQLDatasink(Datasink):
    """Upserting SQL sink: one table per item class, idempotent writes.

    Parameters mirror the reference's DatabaseConfig: ``table`` (e.g.
    ``bs_transactions``), ``primary_keys`` (conflict target; the reference
    relies on unique constraints + ignore_duplicate), ``json_columns``
    (nested list/struct fields stored as JSON text — the JSONB mapping),
    ``retry_times``/``retry_delay`` for operational-error backoff."""

    def __init__(
        self,
        db_path: str,
        table: str,
        primary_keys: List[str],
        json_columns: Optional[List[str]] = None,
        retry_times: int = 5,
        retry_delay: float = 0.05,
    ):
        self.db_path = db_path
        self.table = table
        self.primary_keys = list(primary_keys)
        self.json_columns = set(json_columns or [])
        self.retry_times = retry_times
        self.retry_delay = retry_delay

    # -- connection helpers (each write task runs these worker-side) ------
    def _connect(self) -> sqlite3.Connection:
        conn = sqlite3.connect(self.db_path, timeout=30.0)
        conn.execute("PRAGMA journal_mode=WAL")  # concurrent readers, one writer
        conn.execute("PRAGMA busy_timeout=30000")
        return conn

    def _ensure_table(self, conn: sqlite3.Connection, schema: pa.Schema) -> None:
        cols = []
        for f in schema:
            typ = "TEXT" if f.name in self.json_columns else _sql_type(f.type)
            cols.append(f'"{f.name}" {typ}')
        pk = ", ".join(f'"{c}"' for c in self.primary_keys)
        conn.execute(
            f'CREATE TABLE IF NOT EXISTS "{self.table}" ({", ".join(cols)}, '
            f"PRIMARY KEY ({pk}))"
        )

    def _rows_of(self, block: pa.Table) -> List[tuple]:
        cols: Dict[str, list] = {}
        for name in block.column_names:
            col = block.column(name)
            if name in self.json_columns or pa.types.is_nested(col.type):
                cols[name] = [
                    None if v is None else json.dumps(v, sort_keys=True, default=str)
                    for v in col.to_pylist()
                ]
            elif pa.types.is_timestamp(col.type):
                cols[name] = [None if v is None else v.isoformat() for v in col.to_pylist()]
            else:
                cols[name] = col.to_pylist()
        names = block.column_names
        return [tuple(cols[n][i] for n in names) for i in range(block.num_rows)]

    def write(self, blocks: Iterable, ctx) -> Dict[str, Any]:
        written = 0
        for block in blocks:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            if block.num_rows == 0:
                continue
            placeholders = ", ".join("?" for _ in block.column_names)
            col_list = ", ".join(f'"{c}"' for c in block.column_names)
            # INSERT OR IGNORE == the reference's ignore_duplicate one-by-one
            # fallback, done natively; makes retried blocks idempotent
            sql = f'INSERT OR IGNORE INTO "{self.table}" ({col_list}) VALUES ({placeholders})'
            rows = self._rows_of(block)
            last_err: Optional[Exception] = None
            for attempt in range(self.retry_times + 1):
                try:
                    conn = self._connect()
                    try:
                        self._ensure_table(conn, block.schema)
                        conn.executemany(sql, rows)
                        conn.commit()
                        written += block.num_rows
                        last_err = None
                        break
                    finally:
                        conn.close()
                except sqlite3.OperationalError as e:  # lock contention
                    last_err = e
                    time.sleep(self.retry_delay * (attempt + 1))
            if last_err is not None:
                raise last_err
        return {"rows": written}

    def on_write_complete(self, write_result) -> None:
        pass

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    def get_name(self) -> str:
        return f"SQLDatasink({self.table})"


def write_sql(
    ds,
    db_path: str,
    table: str,
    primary_keys: List[str],
    json_columns: Optional[List[str]] = None,
    concurrency: Optional[int] = None,
) -> None:
    """``ds.write_datasink`` convenience wrapper (the DatabasePipeline
    call-site shape)."""
    ds.write_datasink(
        SQLDatasink(db_path, table, primary_keys, json_columns),
        concurrency=concurrency,
    )
