"""Multi-node placement smoke (VERDICT r3 #8 stretch): the engine's
actors and spool/checkpoint paths must tolerate remote placement.

Runs tests/two_node_driver.py in a SUBPROCESS (it owns a 2-node mock
cluster via ray.cluster_utils.Cluster, Ray's public multi-node test
harness — it must not share the test session's local Ray) and asserts
the crawl completed on a genuinely 2-node cluster with actors placed on
more than one node."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.full  # spins its own cluster: not in the fast tier


def test_two_node_crawl(tmp_path):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("RAY_ADDRESS", None)  # the driver script owns its cluster
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "two_node_driver.py"),
            str(tmp_path / "store"),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["n_nodes"] == 2
    assert out["fetched"] > 20
    # actors really spread across raylets (fetch shards + seen shards +
    # rank shards + push actor across 2 nodes)
    assert out["actor_nodes"] >= 2
