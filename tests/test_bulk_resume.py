"""Resumable bulk fetch+parse: per-unit atomic outputs, reruns skip
finished units and reprocess only missing ones (north-rule resumability)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_bulk_fetch_parse_resumes(ray_session, pages_store, tmp_path):
    from bench import bulk_fetch_parse

    out = str(tmp_path / "bulk_out")
    r1 = bulk_fetch_parse(pages_store, out, ingest=False)
    assert r1["urls"] == 400 and r1["units_skipped"] == 0

    # full rerun: everything skipped, nothing reprocessed
    r2 = bulk_fetch_parse(pages_store, out, ingest=False)
    assert r2["units_skipped"] == r1["units"] and r2["urls"] == 0

    # partial failure: drop one unit file; only that unit reruns
    victims = sorted(Path(out, "text").rglob("rg*.parquet"))[:1]
    n_victim_rows = __import__("pyarrow.parquet", fromlist=["x"]).read_table(victims[0]).num_rows
    victims[0].unlink()
    r3 = bulk_fetch_parse(pages_store, out, ingest=False)
    assert r3["units_skipped"] == r1["units"] - 1
    assert r3["urls"] == n_victim_rows

    # no temp files left behind (atomic rename committed everything)
    assert not list(Path(out).rglob("*.tmp"))
