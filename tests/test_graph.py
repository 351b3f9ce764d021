import numpy as np
import pyarrow as pa


def _dense_pagerank(edges, nodes, iters=3, damping=0.85):
    """Dense reference: same formulation as stages/graph.py (dangling mass
    redistributed uniformly, fixed iterations)."""
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {i: [] for i in range(n)}
    for a, b in edges:
        out[idx[a]].append(idx[b])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = 0.0
        for i in range(n):
            if out[i]:
                for j in out[i]:
                    nxt[j] += damping * r[i] / len(out[i])
            else:
                dangling += r[i]
        r = nxt + (1.0 - damping) / n + damping * dangling / n
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_dense_reference_with_dangling(ray_session):
    import ray.data as rd

    from blockchainspider_ray.stages.graph import pagerank

    # node 4 is dangling (appears only as dst); 0 has fan-out 3
    edge_list = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 0), (3, 4)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edge_list], pa.int64()),
                "dst": pa.array([b for _, b in edge_list], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).take_all()}
    want = _dense_pagerank(edge_list, sorted({x for e in edge_list for x in e}))
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_hits_normalization_and_direction():
    """Hub and authority vectors are L1-normalized and non-negative, and
    the direction is right: a pure sink (only in-edges) has auth > 0 and
    hub == 0; a pure source has hub > 0 and auth == 0."""
    import pyarrow as pa
    import ray.data as rd

    from blockchainspider_ray.stages.graph import hits

    # star: 0 -> 1, 0 -> 2, 3 -> 1  (0,3 pure sources; 1,2 pure sinks)
    edges = rd.from_arrow(
        pa.table({"src": pa.array([0, 0, 3], pa.int64()),
                  "dst": pa.array([1, 2, 1], pa.int64())})
    )
    out = {r["node"]: (r["hub"], r["auth"]) for r in hits(edges, iters=2).take_all()}
    assert abs(sum(h for h, _ in out.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in out.values()) - 1.0) < 1e-9
    assert all(h >= 0 and a >= 0 for h, a in out.values())
    assert out[0][0] > 0 and out[0][1] == 0
    assert out[1][1] > 0 and out[1][0] == 0
    # node 1 (two in-links) outranks node 2 (one) as an authority
    assert out[1][1] > out[2][1]
