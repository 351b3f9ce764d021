"""SQLDatasink: table-per-class upsert sink (reference DatabasePipeline
semantics — batched insert, ignore duplicates, JSON nested fields)."""

import json
import sqlite3

import pyarrow as pa
import pytest
import ray
import ray.data


def _edges_ds(n=500):
    tbl = pa.table(
        {
            "transaction_hash": pa.array([f"TX{i}" for i in range(n)], pa.string()),
            "block_number": pa.array([i % 50 for i in range(n)], pa.int64()),
            "value": pa.array([float(i) * 1.5 for i in range(n)], pa.float64()),
            "topics": pa.array([[f"t{i%3}", f"t{i%5}"] for i in range(n)], pa.list_(pa.string())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(8)


def test_write_and_read_back(ray_session, tmp_path):
    from blockchainspider_ray.stages.db_sink import write_sql

    db = str(tmp_path / "out.db")
    write_sql(_edges_ds(), db, "bs_event_logs", primary_keys=["transaction_hash"])
    con = sqlite3.connect(db)
    n, = con.execute("SELECT count(*) FROM bs_event_logs").fetchone()
    assert n == 500
    # nested column JSON-encoded (the JSONB mapping)
    t, = con.execute(
        "SELECT topics FROM bs_event_logs WHERE transaction_hash='TX7'"
    ).fetchone()
    assert json.loads(t) == ["t1", "t2"]
    v, = con.execute(
        "SELECT value FROM bs_event_logs WHERE transaction_hash='TX4'"
    ).fetchone()
    assert v == 6.0
    con.close()


def test_rewrites_are_idempotent(ray_session, tmp_path):
    """Re-running the same write (block retry / resumed job) must not
    duplicate rows — the primary-key upsert contract."""
    from blockchainspider_ray.stages.db_sink import write_sql

    db = str(tmp_path / "out2.db")
    write_sql(_edges_ds(), db, "bs_txs", primary_keys=["transaction_hash"])
    write_sql(_edges_ds(), db, "bs_txs", primary_keys=["transaction_hash"])
    con = sqlite3.connect(db)
    n, = con.execute("SELECT count(*) FROM bs_txs").fetchone()
    assert n == 500
    con.close()


def test_table_per_class(ray_session, tmp_path):
    from blockchainspider_ray.stages.db_sink import write_sql

    db = str(tmp_path / "out3.db")
    write_sql(_edges_ds(100), db, "bs_a", primary_keys=["transaction_hash"])
    write_sql(_edges_ds(200), db, "bs_b", primary_keys=["transaction_hash"])
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM bs_a").fetchone()[0] == 100
    assert con.execute("SELECT count(*) FROM bs_b").fetchone()[0] == 200
    con.close()
