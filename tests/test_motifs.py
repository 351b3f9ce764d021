"""MoTS 16-dim motif vectors (functions/motifs.py) vs hand-derived graphs
mirroring reference plugins/mots/highorder.py semantics."""

import numpy as np


def _vec(srcs, dsts):
    from blockchainspider_ray.functions.motifs import motif_vector

    return motif_vector(srcs, dsts)


def test_single_edge_shortcut():
    v = _vec(["a"], ["b"])
    assert v[0] == 1.0 and v[1:].sum() == 0


def test_parallel_edges_weighted():
    # 2x the same edge: multigraph has 2 edges -> no shortcut; weighted
    # count1 = multiplicity (reference's max(key)+1 weighting)
    v = _vec(["a", "a"], ["b", "b"])
    assert v[0] == 2.0 and v[1:].sum() == 0


def test_bidirectional_pair():
    v = _vec(["a", "b"], ["b", "a"])
    assert v[0] == 0 and v[1] == 1.0 and v[2:].sum() == 0


def test_directed_cycle_is_m1():
    v = _vec(["a", "b", "c"], ["b", "c", "a"])
    assert v[0] == 3.0  # unidirectional edges
    assert v[2] == 1.0  # M1 = directed 3-cycle
    assert v[1] == 0 and v[3:].sum() == 0


def test_feed_forward_loop_is_m5():
    v = _vec(["a", "a", "b"], ["b", "c", "c"])
    assert v[0] == 3.0 and v[6] == 1.0
    assert v[2] == 0  # not a cycle


def test_bidirectional_triangle_is_m4():
    v = _vec(["a", "b", "b", "c", "c", "a"], ["b", "a", "c", "b", "a", "c"])
    assert v[1] == 3.0 and v[5] == 1.0
    assert v[2] == 0 and v[3] == 0 and v[4] == 0


def test_open_out_wedge_is_m8():
    v = _vec(["a", "a"], ["b", "c"])
    assert v[0] == 2.0 and v[9] == 1.0
    assert v[10] == 0  # not an M9 (in-out) wedge


def test_open_in_wedge_is_m10():
    v = _vec(["b", "c"], ["a", "a"])
    assert v[0] == 2.0 and v[11] == 1.0


def test_bifan():
    v = _vec(["a", "a", "b", "b"], ["c", "d", "c", "d"])
    assert v[15] == 1.0
    assert v[9] == 2.0 and v[11] == 2.0  # constituent out-/in-wedges


def test_node_relabel_invariance():
    a = _vec(["a", "a", "b", "c"], ["b", "c", "c", "a"])
    b = _vec(["x", "x", "y", "z"], ["y", "z", "z", "x"])
    assert np.allclose(a, b)
    # row order invariance too
    c = _vec(["c", "b", "a", "a"], ["a", "c", "c", "b"])
    assert np.allclose(a, c)


def test_motif_vector_query(ray_session):
    from blockchainspider_ray.pipelines.queries import q_motif_vector

    df = q_motif_vector("/root/testdata/sf0.001").to_pandas()
    assert list(df.columns) == ["gid"] + [f"m{i}" for i in range(1, 17)]
    assert len(df) == df["gid"].nunique()
    assert (df[[f"m{i}" for i in range(1, 17)]].to_numpy() >= 0).all()
    # deterministic across reruns (groupby row order must not matter)
    df2 = q_motif_vector("/root/testdata/sf0.001").to_pandas()
    assert df.equals(df2)
