"""Sinks: CSV with sorted field order, rank CSV, JSONL, partitioned parquet.

Reference semantics:
- per-class CSV with headers derived by sorting item keys at write time and
  'w'/'a' modes (pipelines/subgraph.py:30-81, pipelines/trans.py:72-74);
- rank CSV rewritten sorted desc by score (pipelines/subgraph.py:93-119);
- JSONL append for label reports (pipelines/label.py:7-34);
- our engine's resumable layout: one parquet directory per round/key so a
  restarted job skips finished partitions (north-rule checkpoint shape).

Dataset-level writers delegate to Ray Data's parallel sinks; the table-level
helpers exist for driver-side control-plane tables (ranks, metrics).
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Dict, List, Optional

import pyarrow as pa


def write_csv_sorted_fields(
    table: pa.Table,
    path: str,
    mode: str = "w",
    out_fields: Optional[List[str]] = None,
) -> List[str]:
    """Write a table as CSV with reference header semantics: columns sorted
    by name unless ``out_fields`` projects/pins an order (reference
    pipelines/subgraph.py:37-39,54 and its `out_fields` projection).
    Returns the header actually written."""
    fields = out_fields if out_fields is not None else sorted(table.column_names)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    new_file = mode == "w" or not p.exists()
    with open(p, mode, newline="") as f:
        w = csv.writer(f)
        if new_file:
            w.writerow(fields)
        cols = [table.column(c).to_pylist() for c in fields]
        for row in zip(*cols):
            w.writerow(row)
    return fields


def write_rank_csv(ranks: Dict[str, float], path: str) -> None:
    """Full rewrite, sorted desc by score (reference Rank2csvPipeline,
    pipelines/subgraph.py:108-109)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["node", "rank"])
        for node, score in sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0])):
            w.writerow([node, score])


def append_jsonl(rows: List[dict], path: str) -> None:
    """JSON-lines append (reference LabelReportPipeline, pipelines/label.py)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "a") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")


def write_dataset_csv(ds, out_dir: str) -> None:
    """Parallel CSV sink for a Dataset (column order is the schema order;
    use select_columns(sorted(...)) upstream for reference header order)."""
    ds.write_csv(out_dir)


def write_dataset_jsonl(ds, out_dir: str) -> None:
    ds.write_json(out_dir)


def write_partitioned_parquet(ds, out_dir: str, partition_col: str) -> None:
    """Resumable layout: one directory per partition value.  A rerun lists
    existing partition dirs and skips them (the engine's checkpoint manifest
    records which rounds are complete)."""
    ds.write_parquet(out_dir, partition_cols=[partition_col])
