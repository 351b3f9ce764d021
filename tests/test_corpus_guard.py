"""The six whole-corpus embedding diagnostics must refuse corpora above
the broadcast bound (VERDICT r4 #2): each one take_all()s the embeddings
table to the driver and ray.puts the full matrix, which is a driver OOM at
10^10 docs — so they enforce the same _KNN_BRUTE_MAX_CORPUS refusal
q_embedding_knn has, pointing at the IVF/PQ scale path."""

import pytest

SF_DIR = "/root/testdata/sf0.001"

GUARDED = [
    "q_twonn_dimension",
    "q_medoid_per_label",
    "q_dunn_index",
    "q_lof_outliers",
    "q_dbscan_cores",
    "q_label_knn_accuracy",
]


@pytest.mark.parametrize("fn_name", GUARDED)
def test_guard_refuses_above_bound(ray_session, fn_name, monkeypatch):
    from blockchainspider_ray.pipelines import common
    from blockchainspider_ray.pipelines import queries as q

    monkeypatch.setattr(common, "_KNN_BRUTE_MAX_CORPUS", 1)
    with pytest.raises(ValueError, match="ann_ivf"):
        getattr(q, fn_name)(SF_DIR)


def test_guard_passes_below_bound(ray_session):
    """At fixture scale the guard is a no-op: the cheapest guarded query
    still runs (the full six stay pinned by their oracle mirrors)."""
    from blockchainspider_ray.pipelines import queries as q

    out = q.q_twonn_dimension(SF_DIR)
    assert len(out) == 1
