"""Two-node mock-cluster smoke drive (run as a SUBPROCESS by
tests/test_two_node.py — it owns its own Ray cluster, so it must not
share the test session's Ray).

Uses ray.cluster_utils.Cluster (Ray's public multi-node test harness) to
stand up a head + one worker "node" on this machine, then runs the full
BSP crawl engine — fetch shard actors, sharded cuckoo seen set, sharded
haircut rank pool + push actor — against a page store, proving every
actor/spool path tolerates REMOTE placement (handles cross raylets, no
driver-local assumptions).  Prints one JSON line the test asserts on.
"""

import json
import sys

import ray
from ray.cluster_utils import Cluster


def main() -> None:
    store_dir = sys.argv[1]
    cluster = Cluster()
    cluster.add_node(num_cpus=2)  # head
    cluster.add_node(num_cpus=2)  # second node
    ray.init(address=cluster.address, include_dashboard=False, log_to_driver=False)

    from blockchainspider_ray.crawl.engine import CrawlConfig, CrawlEngine
    from blockchainspider_ray.fixtures import ensure_pages_store
    from blockchainspider_ray.stages.fetch import PageStore

    import pyarrow.dataset as pads

    ensure_pages_store(store_dir, n_pages=1200, seed=5, n_hosts=12, num_partitions=8)
    urls = (
        pads.dataset(f"{store_dir}/part=0", partitioning=None)
        .to_table(columns=["url"])
        .column("url")
    )
    seeds = [urls[i].as_py() for i in range(6)]

    res = CrawlEngine(
        PageStore(store_dir),
        seeds=seeds,
        config=CrawlConfig(
            strategy="haircut_sharded",
            strategy_kwargs={"min_weight": 1e-9, "num_shards": 2, "use_ray": True},
            pop_k=64,
            host_budget=8,
            max_rounds=120,
            seen_use_ray=True,
            seen_shards=2,
            fetch_actors=2,
        ),
    ).run()

    nodes = [n for n in ray.nodes() if n["Alive"]]
    # actor spread: every live actor's node via the GCS actor table
    # (ray.util.state needs the dashboard API server, which is off here)
    table = ray._private.state.actors()
    actor_nodes = {
        a["Address"]["NodeID"]
        for a in table.values()
        if a.get("State") == "ALIVE" and a.get("Address", {}).get("NodeID")
    }
    print(
        json.dumps(
            {
                "n_nodes": len(nodes),
                "fetched": res.fetched,
                "rounds": res.rounds,
                "actor_nodes": len(actor_nodes),
            }
        )
    )
    ray.shutdown()
    cluster.shutdown()


if __name__ == "__main__":
    main()
