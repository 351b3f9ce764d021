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


def _peel_coreness(edge_list):
    """Reference coreness via the sequential min-degree peel."""
    import heapq

    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    core, removed, k = {}, set(), 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue
        k = max(k, d)
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return core


def test_coreness_matches_sequential_peel(ray_session):
    """H-index iteration == exact min-degree peel on a graph with a real
    core spread: a pendant path (core 1), a cycle (core 2), and a 5-clique
    (core 4), cross-linked."""
    import ray.data as rd

    from blockchainspider_ray.stages.graph import coreness

    edge_list = (
        [(0, 1), (1, 2), (2, 3)]  # path
        + [(3, 4), (4, 5), (5, 6), (6, 3)]  # cycle
        + [(a, b) for a in range(7, 12) for b in range(a + 1, 12)]  # clique
        + [(6, 7)]  # bridge
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "u": pa.array([a for a, _ in edge_list], pa.int64()),
                "v": pa.array([b for _, b in edge_list], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["core"] for r in coreness(edges, iters=8).take_all()}
    want = _peel_coreness(edge_list)
    assert got == want
    assert sorted(set(got.values())) == [1, 2, 4]


def test_coreness_fixture_converges_within_unroll(ray_session):
    """The q_kcore fixture graph must reach its fixpoint strictly inside
    the 6 rounds the SQL oracle unrolls (run 5 == run 6)."""
    import ray.data as rd

    from blockchainspider_ray.stages.graph import coreness

    n = 500
    pairs = set()
    for d in range(n):
        for b in ((d * d + 1) % n, (3 * d + 7) % n):
            if b != d:
                pairs.add((min(d, b), max(d, b)))
    cl = [d for d in range(n) if d % 50 == 0]
    for i, x in enumerate(cl):
        for y in cl[i + 1 :]:
            pairs.add((x, y))
    tbl = pa.table(
        {
            "u": pa.array([a for a, _ in sorted(pairs)], pa.int64()),
            "v": pa.array([b for _, b in sorted(pairs)], pa.int64()),
        }
    )
    r5 = {r["node"]: r["core"] for r in coreness(rd.from_arrow(tbl), iters=5).take_all()}
    r6 = {r["node"]: r["core"] for r in coreness(rd.from_arrow(tbl), iters=6).take_all()}
    assert r5 == r6
    assert r5 == _peel_coreness(sorted(pairs))


def test_sssp_matches_inprocess_bellman_ford():
    import duckdb

    from blockchainspider_ray.pipelines.queries import q_sssp

    sf = "/root/testdata/sf0.001"
    got = q_sssp(sf)
    got = got if not hasattr(got, "to_pandas") or isinstance(got, __import__("pandas").DataFrame) else got.to_pandas()
    edges = duckdb.sql(
        f"""SELECT src, dst, min(w) AS w FROM (
              SELECT user_id % 50 AS src, (user_id*13 + event_id) % 50 AS dst,
                     value AS w
              FROM read_parquet('{sf}/events.parquet')) GROUP BY src, dst"""
    ).df()
    dist = {0: 0.0}
    for _ in range(4):
        upd = dict(dist)
        for s, t, w in edges.itertuples(index=False):
            if s in dist:
                c = dist[s] + w
                if t not in upd or c < upd[t]:
                    upd[int(t)] = c
        dist = upd
    assert dict(zip(got["node"], got["dist"])) == {
        v: round(d, 4) for v, d in dist.items()
    }
    assert got.set_index("node")["dist"][0] == 0.0


def test_hist_quantiles_bracket_exact():
    import duckdb

    from blockchainspider_ray.pipelines.queries import q_hist_quantiles

    sf = "/root/testdata/sf0.001"
    df = q_hist_quantiles(sf)
    # monotone in q, inside the data range
    assert (df["est"].diff().dropna() >= 0).all()
    mn, mx = duckdb.sql(
        f"SELECT min(n_chars), max(n_chars) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()
    assert (df["est"] >= mn).all() and (df["est"] <= mx).all()
    # sketch error is bounded by one bin width
    width = (mx - mn) / 32.0
    for q, est in zip(df["q"], df["est"]):
        exact = duckdb.sql(
            f"SELECT quantile_cont(n_chars, {q}) FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()[0]
        assert abs(est - exact) <= width + 1e-9


def test_pagerank_weighted_matches_dense_reference(ray_session):
    import ray.data as rd

    from blockchainspider_ray.stages.graph import pagerank_weighted

    # weighted digraph with one zero-out-weight (dangling) node 3
    edge_list = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 5.0), (2, 3, 1.0)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _, _ in edge_list], pa.int64()),
                "dst": pa.array([b for _, b, _ in edge_list], pa.int64()),
                "weight": pa.array([w for _, _, w in edge_list], pa.float64()),
            }
        )
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_weighted(edges, iters=4, damping=0.85).take_all()
    }

    nodes = [0, 1, 2, 3]
    wout = {0: 4.0, 1: 2.0, 2: 6.0, 3: 0.0}
    r = {n: 0.25 for n in nodes}
    for _ in range(4):
        nxt = {n: 0.0 for n in nodes}
        dangling = 0.0
        for a, b, w in edge_list:
            nxt[b] += 0.85 * r[a] * w / wout[a]
        dangling = r[3]
        r = {n: nxt[n] + 0.15 / 4 + 0.85 * dangling / 4 for n in nodes}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - r[n]) < 1e-12, (n, got[n], r[n])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_opic_invariants_and_dense_reference(ray_session):
    import ray.data as rd

    from blockchainspider_ray.stages.graph import opic

    # includes a dangling node (3) whose cash redistributes uniformly
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 3)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edge_list], pa.int64()),
                "dst": pa.array([b for _, b in edge_list], pa.int64()),
            }
        )
    )
    iters = 3
    rows = opic(edges, iters=iters).take_all()
    got = {r["node"]: (r["cash"], r["history"]) for r in rows}

    nodes = [0, 1, 2, 3]
    out = {0: [1, 2], 1: [2], 2: [3], 3: []}
    cash = {n: 0.25 for n in nodes}
    hist = {n: 0.0 for n in nodes}
    for _ in range(iters):
        nxt = {n: 0.0 for n in nodes}
        dangling = 0.0
        for a in nodes:
            if out[a]:
                for b in out[a]:
                    nxt[b] += cash[a] / len(out[a])
            else:
                dangling += cash[a]
        hist = {n: hist[n] + cash[n] for n in nodes}
        cash = {n: nxt[n] + dangling / len(nodes) for n in nodes}

    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n][0] - cash[n]) < 1e-12, ("cash", n)
        assert abs(got[n][1] - hist[n]) < 1e-12, ("hist", n)
    # cash stays a unit of flow; history banks exactly 1 per round
    assert abs(sum(v for v, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in got.values()) - float(iters)) < 1e-9
