"""Degenerate-corpus + partitioning-independence guards for the
soft-404 / perplexity-bucket / Kruskal-Wallis session.

Tiny fixture (3 docs / 3 events): doc1 carries a literal soft-404 body,
doc2 is a 2-token stub; every corpus token is unique so all three docs
tie on unigram logprob and bucket assignment reduces to the doc_id
tiebreak; the events values (1.0, 1.0, 2.5) give closed-form
Kruskal-Wallis H = 1.5 and tie-corrected H = 2.0.
"""

import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.full  # long sweep: excluded from the fast tier


import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_tiny_s3f"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["a b c d e", "page not found", "x y"], pa.string()),
                "lang": pa.array(["en", "en", "en"], pa.string()),
                "source": pa.array(["s0", "s0", "s1"], pa.string()),
                "n_chars": pa.array([9, 14, 3], pa.int64()),
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


def test_s3f_soft404_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    s = _df(q.q_soft404_screen(tiny_sf))
    # s0: doc0 clean, doc1 matches 'page not found' (and is <5 tokens);
    # s1: doc2 is a 2-token stub
    assert s.values.tolist() == [["s0", 2, 1, 0.5], ["s1", 1, 1, 1.0]]


def test_s3f_perplexity_buckets_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    b = _df(q.q_perplexity_buckets(tiny_sf)).set_index("bucket")
    # every token count 1 over 10 total -> all docs score ln(1/10);
    # the tie breaks on doc_id: head=doc0(5 toks), middle=doc1(3), tail=doc2(2)
    assert b.loc["head", "n_tokens"] == 5
    assert b.loc["middle", "n_tokens"] == 3
    assert b.loc["tail", "n_tokens"] == 2
    assert (b["n_docs"] == 1).all()
    assert (b["mean_logprob"] == -2.302585).all()


def test_s3f_kruskal_wallis_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    kw = _df(q.q_kruskal_wallis(tiny_sf))
    # ranks (1.5, 1.5, 3): R_view=3 (n=2), R_buy=3 (n=1)
    # H = 12/(3*4) * (9/2 + 9) - 3*4 = 1.5; tie term 6 -> corr .75 -> 2.0
    assert kw.values.tolist() == [[3, 2, 1.5, 2.0]]


def test_s3f_daily_series_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # days (2, 1): single pair slope -1; intercept = median(3, 3) = 3
    ts = _df(q.q_theil_sen(tiny_sf))
    assert ts.values.tolist() == [[2, 1, -1.0, 3.0]]

    # PH: day1 rm=2, ph=-0.5; day2 rm=1.5, ph=-1.5; never alarms
    ph = _df(q.q_page_hinkley(tiny_sf))
    assert ph["running_mean"].tolist() == [2.0, 1.5]
    assert ph["ph"].tolist() == [-0.5, -1.5]
    assert ph["alarm"].tolist() == [0, 0]

    # 2024-01-01 = Monday (isodow 1); each dow bucket has zero within-var
    dw = _df(q.q_dow_seasonality(tiny_sf))
    assert dw.values.tolist() == [[1, 1, 2.0, 0.0], [2, 1, 1.0, 0.0]]


def test_s3f_partitioning_independent(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "soft404_screen", "perplexity_buckets", "kruskal_wallis",
        "theil_sen", "page_hinkley", "dow_seasonality",
        "mmr_select", "event_dispersion", "sq8_error",
        "psi_drift", "triplet_violation", "mattr",
        "split_leakage", "burrows_delta", "graph_components",
        "misra_gries_heavy", "source_coverage_curve", "session_threshold_sweep",
        "quantile_normalize", "interarrival_burstiness", "wilson_keep_ci",
        "feature_hash_collisions", "srm_check", "source_cross_entropy",
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


@pytest.fixture(scope="module")
def tiny_emb(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_tiny_s3f_emb"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.6, 0.8]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0, 1, 1], pa.int32()),
            }
        ),
        d + "/embeddings.parquet",
    )
    return d


def test_s3f_mmr_exhausts_pool(ray_session, tiny_emb):
    """k=5 over 3 candidates: MMR stops when the pool runs dry and the
    greedy order is relevance-then-diversity (v1 dup of query wins, the
    diverse v3 beats the orthogonal v2 at step 2)."""
    from blockchainspider_ray.pipelines import queries as q

    m = _df(q.q_mmr_select(tiny_emb))
    assert m[["step", "vec_id"]].values.tolist() == [[1, 1], [2, 3], [3, 2]]
    assert m["score"].tolist() == [0.7, 0.24, -0.24]


def test_s3f_event_dispersion_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    d = _df(q.q_event_dispersion(tiny_sf))
    # single observed day per type -> zero variance -> Fano 0
    assert d.values.tolist() == [["buy", 1, 1.0, 0.0], ["view", 1, 2.0, 0.0]]


def test_s3f_sq8_error_bounds(ray_session, tiny_emb):
    from blockchainspider_ray.pipelines import queries as q

    s = _df(q.q_sq8_error(tiny_emb))
    assert s["n_vecs"].iloc[0] == 4 and s["n_dims"].iloc[0] == 2
    # quantization error is bounded by half a grid step = (max-min)/510
    assert 0.0 <= s["max_abs_err"].iloc[0] <= 1.0 / 510 + 1e-12
    assert 0.0 <= s["mse"].iloc[0] <= (1.0 / 510) ** 2 + 1e-12


def test_s3f_sq8_constant_dim(ray_session, tmp_path):
    """A constant dimension has zero range; both sides must report zero
    error instead of dividing by zero."""
    from blockchainspider_ray.pipelines import queries as q

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    [[0.5, 1.0], [0.5, 3.0]], pa.list_(pa.float32())
                ),
                "label": pa.array([0, 1], pa.int32()),
            }
        ),
        d + "/embeddings.parquet",
    )
    s = _df(q.q_sq8_error(d))
    assert s["mse"].iloc[0] == 0.0 and s["max_abs_err"].iloc[0] == 0.0


def test_s3f_psi_drift_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # all 3 docs land in bin 0; Laplace smoothing makes p = q = 1 -> PSI 0
    p = _df(q.q_psi_drift(tiny_sf))
    assert p.values.tolist() == [[1, 2, 1, 0.0]]


def test_s3f_triplet_violation_tiny(ray_session, tiny_emb, tmp_path):
    from blockchainspider_ray.pipelines import queries as q

    # labels (0,0,1,1): no anchor has both a positive successor and a
    # differing-label global successor -> zero triplets, rate 0
    t = _df(q.q_triplet_violation(tiny_emb))
    assert t.values.tolist() == [[0, 0, 0.0]]

    # interleaved labels (0,1,0,1): anchors 0 and 1 form triplets, and the
    # geometry (dup of own class, orthogonal other class) never violates
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.6, 0.8]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1, 0, 1], pa.int32()),
            }
        ),
        d + "/embeddings.parquet",
    )
    t2 = _df(q.q_triplet_violation(d))
    assert t2.values.tolist() == [[2, 0, 0.0]]


def test_s3f_mattr_tiny(ray_session, tmp_path):
    from blockchainspider_ray.pipelines import queries as q

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a b a", "x y"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s0", "s0"], pa.string()),
                "n_chars": pa.array([7, 3], pa.int64()),
            }
        ),
        d + "/documents.parquet",
    )
    m = _df(q.q_mattr(d))
    # short docs fall back to whole-doc TTR: 2/4 and 2/2
    assert m.values.tolist() == [[0, 0.5], [1, 1.0]]


def test_s3f_mase_short_series(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # 2 days: one naive pair |1-2|=1, no 7-lag pairs -> seasonal/mase = 0
    m = _df(q.q_mase_daily(tiny_sf))
    assert m.values.tolist() == [[2, 1.0, 0.0, 0.0]]


def test_s3f_pagerank_convergence_monotone(ray_session):
    from blockchainspider_ray.pipelines import queries as q

    c = _df(q.q_pagerank_convergence(SF))
    assert c["iter"].tolist() == [1, 2, 3]
    # power iteration on a stochastic-ish graph: residuals shrink (the
    # third rung rounds to 0 at 6dp on the sf0.001 graph)
    r = c["l1_residual"].tolist()
    assert r[0] > r[1] >= r[2] >= 0


def test_s3f_depth_quality_decay_consistency(ray_session):
    from blockchainspider_ray.pipelines import queries as q

    d = _df(q.q_depth_quality_decay(SF))
    # depth 0 is exactly the seed doc
    assert d["depth"].iloc[0] == 0 and d["n_docs"].iloc[0] == 1
    # every found page is a real doc: totals equal the BFS-reachable
    # component (a strict subset of the 500-doc corpus on this graph)
    assert 0 < int(d["n_docs"].sum()) <= 500
    assert ((d["n_keep"] <= d["n_docs"]) & (d["n_keep"] >= 0)).all()


def test_s3f_graph_components_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # users 7 (events 0,1) and 8 (event 2): islands {7,41,42} and {6,8}
    g = _df(q.q_graph_components(tiny_sf))
    assert g.values.tolist() == [[6, 2], [7, 3]]


def test_s3f_burrows_delta_two_sources(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # disjoint vocabularies: every top word's z-scores are (+1, -1), so
    # delta = mean(2) = 2.0 for the single source pair
    b = _df(q.q_burrows_delta(tiny_sf))
    assert b.values.tolist() == [["s0", "s1", 2.0]]


def test_s3f_split_leakage_structure(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    s = _df(q.q_split_leakage(tiny_sf))
    # each doc pairs with its +10000 clone at minimum
    assert int(s["n_pairs"].sum()) >= 3
    assert (s["n_pairs"] > 0).all()
    want = (s["split_a"] != s["split_b"]).astype(int)
    assert s["is_leakage"].tolist() == want.tolist()


def test_s3f_misra_gries_flat_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # 10 distinct tokens x1 over N=10: every token clears N/40, and the
    # MG candidate superset must not lose any of them
    m = _df(q.q_misra_gries_heavy(tiny_sf))
    assert len(m) == 10
    assert (m["cnt"] == 1).all() and (m["share"] == 0.1).all()


def test_s3f_source_coverage_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    c = _df(q.q_source_coverage_curve(tiny_sf))
    assert c.values.tolist() == [[1, "s0", 8, 0.8], [2, "s1", 2, 1.0]]


def test_s3f_session_sweep_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # user 7's 4h50m gap splits at every threshold; user 8 is a singleton
    s = _df(q.q_session_threshold_sweep(tiny_sf))
    assert s.values.tolist() == [[300, 3, 1.0], [1800, 3, 1.0], [7200, 3, 1.0]]


def test_s3f_quantile_normalize_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # en token counts (2, 3, 5): midpoint ranks 1/6, 3/6, 5/6
    p = _df(q.q_quantile_normalize(tiny_sf))
    assert p.values.tolist() == [
        ["en", 2, 1, 0.166667],
        ["en", 3, 1, 0.5],
        ["en", 5, 1, 0.833333],
    ]


def test_s3f_burstiness_singleton_stream(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # 'buy' has a single event (no gaps) and must emit NO row (the mirror
    # filters gap IS NULL); 'view' has one constant gap -> sigma 0 -> B=-1
    b = _df(q.q_interarrival_burstiness(tiny_sf))
    assert b["event_type"].tolist() == ["view"]
    assert b["burstiness"].tolist() == [-1.0]
    assert b["n_gaps"].tolist() == [1]


def test_s3f_wilson_ci_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    w = _df(q.q_wilson_keep_ci(tiny_sf)).set_index("source")
    # no doc passes Gopher (all under 30 tokens): rate 0, Wilson lo 0
    assert (w["keep_rate"] == 0.0).all()
    assert (w["ci_lo"] == 0.0).all()
    assert ((w["ci_hi"] > 0) & (w["ci_hi"] < 1)).all()


def test_s3f_feature_hash_no_collisions_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # 10 distinct tokens into 65536 buckets: no collisions
    f = _df(q.q_feature_hash_collisions(tiny_sf))
    assert f.values.tolist() == [[10, 10, 0, 0.0]]


def test_s3f_srm_check_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    s = _df(q.q_srm_check(tiny_sf))
    assert int(s["n_docs"].iloc[0]) == 3
    assert (
        int(s["n_train"].iloc[0]) + int(s["n_val"].iloc[0]) + int(s["n_test"].iloc[0])
        == 3
    )
    assert float(s["chi2"].iloc[0]) >= 0.0


def test_s3f_cross_entropy_diagonal_minimal(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # Gibbs: H(A, A) <= H(A, B) for every B under the same smoothing
    ce = _df(q.q_source_cross_entropy(tiny_sf)).set_index(["source_a", "source_b"])
    for a in ("s0", "s1"):
        others = [b for b in ("s0", "s1") if b != a]
        for b in others:
            assert ce.loc[(a, a), "cross_entropy"] <= ce.loc[(a, b), "cross_entropy"]
