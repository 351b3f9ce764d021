"""CLI smoke: gen-store -> crawl (with checkpoint+resume) -> bulk-parse.

Runs each command in a subprocess (own Ray session), like a user would."""

import json
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])


def _run(*argv):
    p = subprocess.run(
        [sys.executable, "-m", "blockchainspider_ray", "--num-cpus", "2", *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_cli_end_to_end(tmp_path):
    store = str(tmp_path / "store")
    out = _run("gen-store", "--out", store, "--pages", "600", "--partitions", "4")
    assert out["pages"] == 600

    import pyarrow.dataset as pads

    seed = (
        pads.dataset(f"{store}/part=0", partitioning=None)
        .to_table(columns=["url"])
        .column("url")[0]
        .as_py()
    )
    ckpt = str(tmp_path / "ckpt")
    crawl_out = str(tmp_path / "crawl_out")
    res = _run(
        "crawl", "--store", store, "--seeds", seed, "--strategy", "bfs",
        "-a", "depth=6", "--pop-k", "16", "--host-budget", "8",
        "--max-fetches", "80", "--checkpoint", ckpt, "--out", crawl_out,
    )
    assert res["fetched"] > 5
    assert any(Path(ckpt).glob("round=*")), "no checkpoint written"
    assert any((Path(crawl_out) / "text").glob("*.parquet")), "no text output"

    # resume continues rather than restarting
    res2 = _run(
        "crawl", "--store", store, "--seeds", seed, "--strategy", "bfs",
        "-a", "depth=6", "--pop-k", "16", "--host-budget", "8",
        "--max-fetches", "80", "--checkpoint", ckpt, "--resume",
    )
    assert res2["fetched"] >= res["fetched"]

    parsed = str(tmp_path / "parsed")
    _run("bulk-parse", "--store", store, "--out", parsed)
    t = pads.dataset(parsed).to_table()
    assert t.num_rows == 600 and "text_extracted" in t.column_names


def test_cli_query_parquet_and_preview(tmp_path):
    out_dir = str(tmp_path / "q_out")
    res = _run(
        "query", "token_count", "--sf-dir", "/root/testdata/sf0.001",
        "--out", out_dir,
    )
    assert res == {"query": "token_count", "out": out_dir}
    import pyarrow.dataset as pads

    t = pads.dataset(out_dir).to_table()
    assert t.num_rows == 500 and set(t.column_names) == {"doc_id", "n_tokens"}

    # --list enumerates the registry (plain lines, not JSON)
    p = subprocess.run(
        [sys.executable, "-m", "blockchainspider_ray", "query", "--list"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert p.returncode == 0
    names = p.stdout.split()
    assert "token_count" in names and "pagerank" in names and len(names) >= 70
