"""Degenerate-corpus + partitioning-independence guards for the
spam-mass / macro-F1 / sequential-pattern session.

Tiny fixture (3 docs / 3 events) mirrors test_degenerate_session3d:
events (user 7, event 0/1) and (user 8, event 2) give link-graph edges
7->41, 7->42, 8->6, no edges out of the trust seeds 0-4, and no ordered
cross-type pair within either user's history.
"""

import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.full  # long sweep: excluded from the fast tier


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_tiny_s3e"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["a b c d e", "a b c d e", "x y"], pa.string()),
                "lang": pa.array(["en", "en", "en"], pa.string()),
                "source": pa.array(["s0", "s0", "s1"], pa.string()),
                "n_chars": pa.array([9, 9, 3], pa.int64()),
            }
        ),
        d + "/documents.parquet",
    )
    ts = pa.array(
        pd.to_datetime(
            ["2024-01-01 00:10", "2024-01-01 05:00", "2024-01-02 00:00"]
        ).astype("datetime64[us]")
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "ts": ts,
                "user_id": pa.array([7, 7, 8], pa.int64()),
                "event_type": pa.array(["view", "view", "buy"], pa.string()),
                "value": pa.array([1.0, 1.0, 2.5], pa.float64()),
                "props": pa.array(["{}", "{}", "{}"], pa.string()),
            }
        ),
        d + "/events.parquet",
    )
    return d


def _df(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_s3e_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    sm = _df(q.q_spam_mass(tiny_sf)).set_index("node")
    # seeds keep pure teleport pr = 0.15/50 = 0.003 but trust 0.15*0.2 = 0.03
    for n in range(5):
        assert sm.loc[n, "pr"] == 0.003
        assert sm.loc[n, "trust"] == 0.03
        assert sm.loc[n, "spam_mass"] == -9.0
    # no trust ever reaches the 7/8 component -> relative spam mass 1.0
    assert sm.loc[41, "trust"] == 0.0
    assert sm.loc[41, "spam_mass"] == 1.0
    assert sm.loc[6, "spam_mass"] == 1.0
    # two-hop pr: 41 gets 0.85 * (p1[7]=0.003)/2 + 0.003
    assert abs(sm.loc[41, "pr"] - 0.004275) < 1e-9
    assert abs(sm.loc[6, "pr"] - 0.00555) < 1e-9

    # same-type repeats and single events produce NO ordered pairs
    op = _df(q.q_event_order_pairs(tiny_sf))
    assert len(op) == 0
    assert list(op.columns) == ["antecedent", "consequent", "n_users", "support"]

    f1 = _df(q.q_langid_macro_f1(tiny_sf))
    assert f1["lang"].iloc[0] == "__macro__"
    assert len(f1) == 2  # one truth class + macro
    for c in ("precision", "recall", "f1"):
        assert ((f1[c] >= 0) & (f1[c] <= 1)).all()

    # days (2, 1): mu=1.5 sigma=0.5 -> z = (+1, -1); closed-form CUSUM
    cu = _df(q.q_cusum_changepoints(tiny_sf))
    assert cu["z"].tolist() == [1.0, -1.0]
    assert cu["s_pos"].tolist() == [0.5, 0.0]
    assert cu["s_neg"].tolist() == [0.0, 0.5]
    assert cu["alarm"].tolist() == [0, 0]

    # Holt: l1=2 b1=-1; l2 = 0.5*1 + 0.5*(2-1) = 1, b2 = 0.3*(1-2) - 0.7 = -1
    hl = _df(q.q_holt_linear(tiny_sf))
    assert hl["level"].tolist() == [2.0, 1.0]
    assert hl["trend"].tolist() == [-1.0, -1.0]
    assert hl["forecast"].tolist() == [1.0, 0.0]

    # triangle-free graph: every edge has support 0 and dies in round 1
    kt = _df(q.q_ktruss_peel(tiny_sf))
    assert kt[["round", "n_edges_before", "n_removed", "n_edges_after"]].values.tolist() == [
        [1, 3, 3, 0],
        [2, 0, 0, 0],
    ]
    assert kt["max_support"].tolist() == [0, 0]

    # 3 busiest hours = all 3 hours (1 event each); each hour overlaps
    # exactly the one single-event session inside it
    ij = _df(q.q_interval_overlap_join(tiny_sf))
    assert len(ij) == 3
    assert ij["n_events"].tolist() == [1, 1, 1]
    assert ij["n_sessions"].tolist() == [1, 1, 1]

    # counts: a-e x2, x,y x1 -> F2 = 5*4 + 2*1 = 22 over 7 distinct tokens
    f2 = _df(q.q_ams_f2(tiny_sf))
    assert int(f2["f2_exact"].iloc[0]) == 22
    assert int(f2["n_tokens"].iloc[0]) == 7
    assert float(f2["f2_est"].iloc[0]) >= 0

    # docs 0/1 identical and rank-adjacent: 1 true pair, caught; 3 candidates
    bq = _df(q.q_blocking_quality(tiny_sf))
    assert bq[["n_docs", "n_candidates", "n_true_pairs", "n_caught"]].values.tolist() == [[3, 3, 1, 1]]
    assert float(bq["reduction_ratio"].iloc[0]) == 0.0
    assert float(bq["completeness"].iloc[0]) == 1.0


def test_s3e_partitioning_independent(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "spam_mass", "langid_macro_f1", "event_order_pairs",
        "cusum_changepoints", "holt_linear", "v_measure",
        "ktruss_peel", "interval_overlap_join",
        "ams_f2", "blocking_quality",
        "cube_agg", "hll_groups", "mojibake_screen",
        "vocab_js_drift", "adjacent_lcp",
    )
    baseline = {n: _df(Q.SQL_QUERIES[n](SF)) for n in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_s3e_cube_hll_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # fine cells (view, Mon=1) and (buy, Tue=2) -> 7 CUBE lattice rows
    cu = _df(q.q_cube_agg(tiny_sf))
    assert cu.values.tolist() == [
        ["__all__", -1, 4.5, 3],
        ["__all__", 1, 2.0, 2],
        ["__all__", 2, 2.5, 1],
        ["buy", -1, 2.5, 1],
        ["buy", 2, 2.5, 1],
        ["view", -1, 2.0, 2],
        ["view", 1, 2.0, 2],
    ]

    hg = _df(q.q_hll_groups(tiny_sf))
    assert hg["event_type"].tolist() == ["buy", "view"]
    assert hg["true_distinct"].tolist() == [1, 1]
    assert (hg["raw_estimate"] > 0).all()


def test_s3e_mojibake_injection(ray_session, tmp_path):
    import pyarrow.parquet as pq2
    from blockchainspider_ray.pipelines import queries as q

    d = str(tmp_path)
    pq2.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "clean ascii text",
                        "bad � replacement",
                        "ctrl\x01byte",
                        "中文全部非 ascii heavy 文文文文",
                    ],
                    pa.string(),
                ),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array(["s0", "s0", "s1", "s1"], pa.string()),
                "n_chars": pa.array([16, 17, 9, 20], pa.int64()),
            }
        ),
        d + "/documents.parquet",
    )
    ms = _df(q.q_mojibake_screen(d)).set_index("source")
    assert int(ms.loc["s0", "n_mojibake"]) == 1
    assert int(ms.loc["s0", "n_flagged"]) == 1
    assert int(ms.loc["s1", "n_control"]) == 1
    assert int(ms.loc["s1", "n_nonascii_heavy"]) == 1
    assert int(ms.loc["s1", "n_flagged"]) == 2
    assert float(ms.loc["s0", "flag_rate"]) == 0.5


def test_s3e_drift_lcp_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # half0 = docs 0,2 (7 tokens), half1 = doc 1 (5 tokens); x,y only-first
    js = _df(q.q_vocab_js_drift(tiny_sf))
    assert int(js["n_tokens_union"].iloc[0]) == 7
    assert int(js["n_only_first"].iloc[0]) == 2
    assert int(js["n_only_second"].iloc[0]) == 0
    expect = 0.5 * (
        5 * ((1 / 7) * np.log(5 / 6) + (1 / 5) * np.log(7 / 6))
        + 2 * (1 / 7) * np.log(2)
    )
    assert abs(float(js["js_divergence"].iloc[0]) - expect) < 1e-6

    # sorted texts: dup pair shares all 9 chars, next pair none
    lcp = _df(q.q_adjacent_lcp(tiny_sf))
    assert lcp.values.tolist() == [[0, 1], [9, 1]]
