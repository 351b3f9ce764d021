"""Sink family: sorted-header CSV, rank CSV, JSONL append, partitioned parquet."""

import csv
import json
from pathlib import Path

import pyarrow as pa
import pyarrow.dataset as pads

from blockchainspider_ray.stages.sinks import (
    append_jsonl,
    write_csv_sorted_fields,
    write_partitioned_parquet,
    write_rank_csv,
)


def _table():
    return pa.table({"b_col": [1, 2], "a_col": ["x", "y"], "c_col": [0.5, 1.5]})


def test_csv_sorted_headers_and_append(tmp_path):
    path = tmp_path / "out.csv"
    fields = write_csv_sorted_fields(_table(), str(path), mode="w")
    assert fields == ["a_col", "b_col", "c_col"]  # sorted, reference semantics
    write_csv_sorted_fields(_table(), str(path), mode="a")  # append: no 2nd header
    rows = list(csv.reader(open(path)))
    assert rows[0] == ["a_col", "b_col", "c_col"]
    assert len(rows) == 5  # 1 header + 2 + 2
    assert rows[1] == ["x", "1", "0.5"]


def test_csv_out_fields_projection(tmp_path):
    path = tmp_path / "proj.csv"
    fields = write_csv_sorted_fields(_table(), str(path), out_fields=["c_col", "a_col"])
    assert fields == ["c_col", "a_col"]
    rows = list(csv.reader(open(path)))
    assert rows[0] == ["c_col", "a_col"] and rows[1] == ["0.5", "x"]


def test_rank_csv_desc(tmp_path):
    path = tmp_path / "ranks.csv"
    write_rank_csv({"a": 0.2, "b": 0.9, "c": 0.2}, str(path))
    rows = list(csv.reader(open(path)))
    assert rows[0] == ["node", "rank"]
    assert [r[0] for r in rows[1:]] == ["b", "a", "c"]  # desc, tie by node


def test_jsonl_append(tmp_path):
    path = tmp_path / "labels.jsonl"
    append_jsonl([{"url": "u1", "labels": ["x"]}], str(path))
    append_jsonl([{"url": "u2", "labels": []}], str(path))
    lines = [json.loads(l) for l in open(path)]
    assert [l["url"] for l in lines] == ["u1", "u2"]


def test_partitioned_parquet_roundtrip(tmp_path, ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"round": [0, 0, 1], "url": ["a", "b", "c"], "n": [1, 2, 3]})
    )
    out = tmp_path / "parts"
    write_partitioned_parquet(ds, str(out), "round")
    subdirs = sorted(p.name for p in Path(out).iterdir() if p.is_dir())
    assert subdirs == ["round=0", "round=1"]
    back = pads.dataset(str(out), partitioning="hive").to_table()
    assert back.num_rows == 3
