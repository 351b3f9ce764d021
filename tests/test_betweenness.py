"""Brandes betweenness (q_betweenness): closed-form pins on canonical
graphs + determinism on the events graph.

Directed, unweighted, endpoints excluded — for an UNDIRECTED closed-form
value B_u(v), feeding both edge directions yields 2 * B_u(v) (each
unordered {s,t} pair appears as two ordered pairs)."""

import pandas as pd
import pytest

from blockchainspider_ray.pipelines.queries import (
    betweenness_over_edges,
    q_betweenness,
)

SF_DIR = "/root/testdata/sf0.001"


def _both_dirs(pairs):
    e = pairs + [(b, a) for a, b in pairs]
    return pd.DataFrame(e, columns=["src", "dst"])


def _scores(df):
    return dict(zip(df["node"], df["betweenness"]))


def test_path_graph():
    # undirected path 0-1-2-3-4: B_u(v_k) = k*(n-1-k); doubled when directed
    got = _scores(betweenness_over_edges(_both_dirs([(0, 1), (1, 2), (2, 3), (3, 4)])))
    for k, want in enumerate([0, 3, 4, 3, 0]):
        assert got[k] == pytest.approx(2.0 * want)


def test_star_graph():
    # star center 0 with 4 leaves: B_u(center) = C(4,2) = 6 -> 12 directed
    got = _scores(betweenness_over_edges(_both_dirs([(0, i) for i in (1, 2, 3, 4)])))
    assert got[0] == pytest.approx(12.0)
    assert all(got[i] == 0.0 for i in (1, 2, 3, 4))


def test_cycle_graph():
    # undirected 5-cycle: every node B_u = (n-1)(n-3)/8 * 2 ... for odd n=5:
    # each node lies on exactly 1 shortest path per opposite pair: B_u = 1.
    got = _scores(
        betweenness_over_edges(_both_dirs([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]))
    )
    assert all(got[i] == pytest.approx(2.0) for i in range(5))


def test_split_paths_counted_fractionally():
    # diamond 0->1->3, 0->2->3: nodes 1 and 2 each carry half of the one
    # (0,3) shortest-path pair
    got = _scores(
        betweenness_over_edges(
            pd.DataFrame([(0, 1), (0, 2), (1, 3), (2, 3)], columns=["src", "dst"])
        )
    )
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.5)
    assert got[0] == 0.0 and got[3] == 0.0


def test_events_graph_deterministic():
    a = q_betweenness(SF_DIR)
    b = q_betweenness(SF_DIR)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 50
    assert (a["betweenness"] >= 0).all()
    assert a["betweenness"].sum() > 0


def test_exact_brandes_guard_refuses_large_graphs():
    """The broadcast-adjacency exact operator must refuse corpus-scale
    edge tables with a pointer to the scalable alternatives (VERDICT r3
    #6 — the same refusal convention as q_embedding_knn)."""
    import pandas as pd
    import pytest

    from blockchainspider_ray.pipelines.queries import betweenness_over_edges

    edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    with pytest.raises(ValueError, match="betweenness_sampled"):
        betweenness_over_edges(edges, max_nodes=2)


def test_sampled_betweenness_error_bound():
    """Pivot-sampled Brandes vs exact on a 60-node graph: full pivot set
    reproduces exact; half pivots stay within a bounded error and keep
    the top-score ordering (Bader-style estimator, scale = V/K)."""
    import numpy as np
    import pandas as pd

    from blockchainspider_ray.pipelines.queries import (
        betweenness_over_edges,
        betweenness_sampled_over_edges,
    )

    rng = np.random.default_rng(3)
    n = 60
    src = rng.integers(0, n, size=400)
    dst = rng.integers(0, n, size=400)
    edges = pd.DataFrame({"src": src, "dst": dst})
    edges = edges[edges.src != edges.dst].drop_duplicates()
    exact = betweenness_over_edges(edges)
    # K == V pivots -> the estimator IS exact (scale 1, all sources)
    full = betweenness_sampled_over_edges(edges, n_pivots=10**6, seed=1)
    pd.testing.assert_frame_equal(exact, full)
    # K = V/2 pivots: bounded relative error on the aggregate mass and a
    # correlated ranking (unbiased estimator, finite-sample noise only)
    half = betweenness_sampled_over_edges(edges, n_pivots=n // 2, seed=1)
    m = exact.merge(half, on="node", suffixes=("_e", "_s"))
    tot_e = m["betweenness_e"].sum()
    tot_s = m["betweenness_s"].sum()
    assert tot_e > 0
    assert abs(tot_s - tot_e) / tot_e < 0.5
    corr = np.corrcoef(m["betweenness_e"], m["betweenness_s"])[0, 1]
    assert corr > 0.7
