"""Degenerate-corpus robustness: the statistics/mixing/window operators
added late in round 3 must survive a micro corpus (2-3 rows per table,
single lang, constant values) without crashing — the shapes a partition
of real data can legitimately degenerate to (one host, one group, one
event type)."""

import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.full  # long sweep: excluded from the fast tier


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_tiny")
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
        d / "documents.parquet",
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
        d / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1], pa.int64()),
                "l_partkey": pa.array([1, 2], pa.int64()),
                "l_suppkey": pa.array([1, 2], pa.int64()),
                "l_linenumber": pa.array([1, 2], pa.int32()),
                "l_quantity": pa.array([5.0, 5.0], pa.float64()),
                "l_extendedprice": pa.array([100.0, 100.0], pa.float64()),
                "l_discount": pa.array([0.1, 0.1], pa.float64()),
                "l_tax": pa.array([0.0, 0.0], pa.float64()),
                "l_returnflag": pa.array(["N", "N"], pa.string()),
                "l_linestatus": pa.array(["O", "O"], pa.string()),
                "l_shipdate": pa.array(
                    pd.to_datetime(["2024-01-05", "2024-02-05"]).astype(
                        "datetime64[us]"
                    )
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    return str(d)


def _df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def test_stats_ops_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # constant l_tax column: corr against it is 0/0 — must yield NaN rows,
    # not crash (the SQL mirror NULLs the same cells)
    corr = _df(q.q_corr_matrix(tiny_sf))
    assert len(corr) == 6
    tax_rows = corr[(corr.col_x == "l_tax") | (corr.col_y == "l_tax")]
    assert tax_rows["corr"].isna().all()

    roll = _df(q.q_rollup_agg(tiny_sf))
    assert roll["cnt"].iloc[-1] == 2  # grand total row survives

    delta = _df(q.q_monthly_revenue_delta(tiny_sf))
    assert len(delta) == 2 and np.isnan(delta["delta"].iloc[0])

    pmi = _df(q.q_pmi_bigrams(tiny_sf, min_count=2))
    assert (pmi["cnt"] >= 2).all()


def test_group_and_window_ops_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    pct = _df(q.q_group_percentiles(tiny_sf))
    assert len(pct) == 3 and pct["pct"].between(0, 1).all()

    cur = _df(q.q_curriculum_order(tiny_sf))
    assert sorted(cur["doc_id"]) == [0, 1, 2]

    tr = _df(q.q_event_transitions(tiny_sf))
    # user 7: view->view; user 8: single event contributes nothing
    assert tr["cnt"].sum() == 1 and tr["p"].iloc[0] == 1.0

    ra = _df(q.q_window_rolling_avg(tiny_sf))
    assert len(ra) == 3

    qv = _df(q.q_event_value_quantiles(tiny_sf))
    # single-member group: all three quantiles equal the lone value
    buy = qv[qv.event_type == "buy"].iloc[0]
    assert buy.p25 == buy.p50 == buy.p75 == 2.5

    top = _df(q.q_daily_top_users(tiny_sf))
    assert (top["rank"] >= 1).all()


def test_mix_and_dup_ops_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    mix = _df(q.q_mix_temperature(tiny_sf, total=2))
    # quotas floor to >= 0 and never exceed source sizes
    assert len(mix) <= 2

    rare = _df(q.q_rare_category_merge(tiny_sf, min_support=2))
    assert "other" in set(rare["category"])  # s1 cell (1 doc) folds away

    dup = _df(q.q_dup_rate_by_source(tiny_sf))
    s0 = dup[dup.source == "s0"].iloc[0]
    assert s0.dups == 2 and s0.n == 2  # identical lede docs flag each other

    conf = _df(q.q_langid_confusion(tiny_sf))
    assert int(conf["cnt"].sum()) == 3


SF = "/root/testdata/sf0.001"


def test_late_r3_ops_partitioning_independent(ray_session, monkeypatch):
    """The late-r3 combiner / two-pass-rank ops must not depend on input
    blocking: per-batch pre-aggregation, range-bucket rank offsets and
    md5-keyed quota selection all claim partitioning independence — force
    17 skewed partitions and compare against the natural blocking."""
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "pmi_bigrams",
        "corr_matrix",
        "curriculum_order",
        "group_percentiles",
        "event_value_quantiles",
        "daily_top_users",
        "mix_temperature",
    )

    def _df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_closing_session_ops_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    ce = _df(q.q_char_entropy(tiny_sf))
    assert len(ce) == 3 and (ce["entropy"] > 0).all()

    fert = _df(q.q_tokenizer_fertility(tiny_sf))
    s0 = fert[fert.source == "s0"].iloc[0]
    assert s0.tokens == 10 and s0.chars == 18

    ent = _df(q.q_source_host_entropy(tiny_sf))
    # s0 spans hosts 0 and 1 evenly -> ln 2; s1 is single-host -> 0
    assert np.isclose(ent[ent.source == "s0"]["entropy"].iloc[0], np.log(2), atol=1e-6)
    assert ent[ent.source == "s1"]["entropy"].iloc[0] == 0.0

    lev = _df(q.q_levenshtein_verify(tiny_sf))
    # identical docs 0/1 share a lede fingerprint: one exact pair
    assert len(lev) == 1 and lev.dist.iloc[0] == 0 and lev.sim.iloc[0] == 1.0

    mad = _df(q.q_mad_outliers(tiny_sf))
    # constant group and singleton group: MAD 0, nothing flagged
    assert (mad["mad"] == 0).all() and (mad["n_outliers"] == 0).all()

    runs = _df(q.q_event_runs(tiny_sf))
    assert len(runs) == 2
    assert runs[runs.user_id == 7].n_events.iloc[0] == 2

    coh = _df(q.q_retention_cohorts(tiny_sf))
    # two single-user day cohorts, offset 0 each
    assert len(coh) == 2 and (coh["day_offset"] == 0).all()

    oov = _df(q.q_oov_rate(tiny_sf))
    assert (oov["oov_rate"] == 0.0).all()  # 7-term corpus fits any top-100

    prof = _df(q.q_schema_profile(tiny_sf))
    assert (prof["n_rows"] == 3).all()
    assert prof[prof.col_name == "event_id"].n_distinct.iloc[0] == 3

    plan = _df(q.q_recrawl_plan(tiny_sf))
    # only user 7 has >1 capture -> exactly one non-null staleness row
    assert len(plan) == 1 and plan["rank"].iloc[0] == 1

    idf = _df(q.q_df_idf_topk(tiny_sf))
    assert len(idf) == 7  # a-e (df 2) + x,y (df 1)
    assert (idf.sort_values(["df", "term"], ascending=[False, True])["term"]
            .tolist()[:5] == ["a", "b", "c", "d", "e"])

    # <3-token doc: Ray side clamps the shingle width (kk=min(k,n)) and
    # still signs it — documented divergence from the >=3-token SQL mirror
    mhe = _df(q.q_minhash_estimate_error(tiny_sf))
    assert len(mhe) == 2
    first = mhe[mhe.doc_a == 0].iloc[0]
    assert first.est == 1.0 and first.jaccard == 1.0 and first.err == 0.0


def test_closing_session_skew_join_tiny(ray_session, tiny_sf):
    import pyarrow.parquet as _pq

    from blockchainspider_ray.pipelines import queries as q

    _pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(list(range(10)), pa.int64()),
                "c_name": pa.array([f"Customer{i}" for i in range(10)], pa.string()),
                "c_acctbal": pa.array([float(j) for j in range(10)], pa.float64()),
            }
        ),
        tiny_sf + "/customer.parquet",
    )
    out = _df(q.q_skew_join(tiny_sf))
    # events 0 and 2 are even -> key 0; event 1 -> key 7
    assert set(out["k"]) == {0, 7}
    assert out[out.k == 0].n.iloc[0] == 2


def test_closing_session_ops_partitioning_independent(ray_session, monkeypatch):
    """Session's combiner / rank-pluck / pair ops must be blind to input
    blocking: 17 forced partitions == natural blocking."""
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "source_host_entropy",
        "tokenizer_fertility",
        "char_entropy",
        "df_idf_topk",
        "oov_rate",
        "mad_outliers",
        "retention_cohorts",
        "event_runs",
        "recrawl_plan",
        "label_centroid_distance",
    )

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_ops_survive_tiny_corpus(ray_session, tiny_sf):
    import pyarrow.parquet as _pq

    from blockchainspider_ray.pipelines import queries as q

    # constant l_quantity: Sxx = 0 -> slope/intercept/r2 NaN, not a crash
    # (the SQL mirror NULLs the same cells)
    ols = _df(q.q_ols_fit(tiny_sf))
    assert len(ols) == 1 and np.isnan(ols["slope"].iloc[0])

    nu = _df(q.q_new_users_daily(tiny_sf))
    assert nu["new_users"].tolist() == [1, 1]
    assert nu["cum_users"].tolist() == [1, 2]

    wd = _df(q.q_window_distinct_users(tiny_sf))
    assert len(wd) == 3 and (wd["users"] == 1).all() and (wd["events"] == 1).all()

    sd = _df(q.q_softdedup_weights(tiny_sf)).sort_values("doc_id")
    assert sd["fp_count"].tolist() == [2, 2, 1]
    assert sd["weight"].tolist() == [0.5, 0.5, 1.0]

    # single lang -> lang tells you nothing about source: MI exactly 0
    mi = _df(q.q_mi_lang_source(tiny_sf))
    assert mi["mi_nats"].iloc[0] == 0.0 and mi["n_cells"].iloc[0] == 2

    qb = _df(q.q_quality_blend(tiny_sf)).sort_values("doc_id")
    # uniq ratio is 1.0 for all three docs -> p2 = 0; n_chars 9,9,3 ->
    # percent_rank 0.5, 0.5, 0
    assert qb["blend"].tolist() == [0.25, 0.25, 0.0]
    assert (qb["keep"] == 0).all()

    sg = _df(q.q_skipgram_counts(tiny_sf))
    assert len(sg) == 8  # 7 pairs from the duplicated doc + (x, y)
    ab = sg[(sg.w1 == "a") & (sg.w2 == "b")]
    assert ab["cnt"].iloc[0] == 2

    # 4 vectors that ARE the 4 initial centroids: Lloyd is a fixed point
    _pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1, 2, 3], pa.int32()),
            }
        ),
        tiny_sf + "/embeddings.parquet",
    )
    km = _df(q.q_kmeans_lloyd(tiny_sf))
    assert len(km) == 16
    assert km[(km.cluster == 2) & (km.dim == 3)]["c"].iloc[0] == 1.0


def test_r3s10_ops_partitioning_independent(ray_session, monkeypatch):
    """This session's combiner ops (two-pass OLS, first-seen fold, windowed
    distinct, fingerprint weighting, contingency MI, percentile blend,
    skip-gram counts, Lloyd partial sums) must be blind to input blocking."""
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "ols_fit",
        "new_users_daily",
        "window_distinct_users",
        "softdedup_weights",
        "mi_lang_source",
        "quality_blend",
        "skipgram_counts",
        "kmeans_lloyd",
    )

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def _write_tiny_embeddings(tiny_sf):
    import pyarrow.parquet as _pq

    _pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1, 2, 3], pa.int32()),
            }
        ),
        tiny_sf + "/embeddings.parquet",
    )


def test_r3s10_batch2_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # view: only the odd cohort (user 7); buy: only the even (user 8) —
    # one-sided cells must NaN the t/df, not crash
    tt = _df(q.q_welch_ttest(tiny_sf))
    assert len(tt) == 2 and tt["t"].isna().all() and tt["df"].isna().all()

    _write_tiny_embeddings(tiny_sf)
    # 4 orthonormal vectors that ARE the centroids: singleton pure clusters
    tp = _df(q.q_topic_purity(tiny_sf))
    assert len(tp) == 4 and (tp["purity"] == 1.0).all() and (tp["n"] == 1).all()
    assert tp["top_label"].tolist() == [0, 1, 2, 3]

    # a = 0 (own centroid), b = sqrt(2): s = 1 everywhere
    sil = _df(q.q_silhouette_simplified(tiny_sf))
    assert len(sil) == 4 and (sil["mean_silhouette"] == 1.0).all()

    # identical docs 0/1 share all 16 band buckets; doc 2 gets its own 16
    hist = _df(q.q_lsh_bucket_histogram(tiny_sf))
    as_map = dict(zip(hist["bucket_size"], hist["n_buckets"]))
    assert as_map.get(2) == 16 and as_map.get(1) == 16

    # nobody reaches 2 events within one hour: empty, with schema intact
    off = _df(q.q_rate_limit_offenders(tiny_sf))
    assert len(off) == 0


def test_r3s10_batch2_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "welch_ttest",
        "topic_purity",
        "silhouette_simplified",
        "lsh_bucket_histogram",
        "rate_limit_offenders",
    )

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch3_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # endpoint-degree y is constant on the 3-edge tiny graph: Syy = 0 ->
    # NaN correlation, not a crash
    da = _df(q.q_degree_assortativity(tiny_sf))
    assert da["n_edges"].iloc[0] == 3 and np.isnan(da["assortativity"].iloc[0])

    ss = _df(q.q_session_stats(tiny_sf))
    # all three events land in singleton sessions -> duration 0
    assert len(ss) == 1
    assert ss["n_sessions"].iloc[0] == 3 and ss["mean_duration_s"].iloc[0] == 0.0

    rh = _df(q.q_redirect_depth_histogram(tiny_sf))
    assert rh["hops"].tolist() == [0, 1, 2] and (rh["n_urls"] == 1).all()

    qt = _df(q.q_quality_token_tradeoff(tiny_sf)).sort_values("decile")
    assert qt["decile"].tolist() == [0, 2]
    assert qt["total_tokens"].tolist() == [2, 10]


def test_r3s10_batch3_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "degree_assortativity",
        "session_stats",
        "redirect_depth_histogram",
        "quality_token_tradeoff",
    )

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch4_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # every tiny user is single-type: no baskets, empty rule table with
    # schema intact
    ar = _df(q.q_association_rules(tiny_sf))
    assert len(ar) == 0 and "lift" in ar.columns

    tm = _df(q.q_trimmed_mean(tiny_sf)).sort_values("event_type")
    # n=1 and n=2 groups trim nothing: plain means survive
    assert tm["event_type"].tolist() == ["buy", "view"]
    assert tm["trimmed_mean"].tolist() == [2.5, 1.0]
    assert tm["n_kept"].tolist() == [1, 2]

    qg = _df(q.q_quality_grid(tiny_sf))
    # all three docs: len_bin 0, uniq 1.0 capped into bin 9
    assert len(qg) == 1
    assert qg.iloc[0].tolist() == [0, 9, 3]


def test_r3s10_batch4_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("association_rules", "trimmed_mean", "quality_grid")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch5_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # only view->view transitions exist; 'buy' is a transition-less state:
    # mass = 1/n_states stays on 'view', nothing crashes
    st = _df(q.q_stationary_distribution(tiny_sf))
    assert st["event_type"].tolist() == ["view"] and st["v"].iloc[0] == 0.5

    # one lang, two sources (2 docs vs 1): raking equalizes both columns
    ipf = _df(q.q_ipf_raking(tiny_sf))
    assert ipf["weight"].tolist() == [1.5, 1.5]

    # uniq ties broken by doc_id; n_chars 9,9,3 pins r1
    rrf = _df(q.q_rrf_fusion(tiny_sf))
    assert rrf["doc_id"].tolist() == [0, 1, 2]
    assert rrf["r1"].tolist() == [1, 2, 3] and rrf["r2"].tolist() == [1, 2, 3]


def test_r3s10_batch5_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("stationary_distribution", "ipf_raking", "rrf_fusion")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch6_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # single-lang table: expected == observed everywhere -> chi2 0, dof 0
    c2 = _df(q.q_chi2_lang_source(tiny_sf))
    assert c2["chi2"].iloc[0] == 0.0 and c2["dof"].iloc[0] == 0

    # star around node 7, no triangles: one wedge node with cc 0
    cc = _df(q.q_clustering_coefficient(tiny_sf))
    assert cc["node"].tolist() == [7]
    assert cc["wedges"].iloc[0] == 1 and cc["clustering"].iloc[0] == 0.0

    cal = _df(q.q_score_calibration(tiny_sf))
    assert int(cal["n"].sum()) == 3
    assert cal["keep_rate"].between(0, 1).all()


def test_r3s10_batch6_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("chi2_lang_source", "clustering_coefficient", "score_calibration")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch7_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # one lang -> no between-group variance and k-1 = 0: F is NaN, not a crash
    av = _df(q.q_anova_f(tiny_sf))
    assert av["k"].iloc[0] == 1 and av["ssb"].iloc[0] == 0.0
    assert np.isnan(av["f"].iloc[0])

    # sources 0-4 are isolated from the tiny graph: zero reached, NaN mean
    ap = _df(q.q_avg_path_length(tiny_sf))
    assert (ap["n_reached"] == 0).all() and ap["avg_dist"].isna().all()


def test_r3s10_batch7_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("anova_f", "avg_path_length")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch8_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # identical docs 0/1: jaccard 1 -> certain candidate; disjoint pair
    # 1/2: jaccard 0 -> probability exactly 0
    rc = _df(q.q_lsh_recall_curve(tiny_sf)).sort_values("doc_a")
    assert rc["p_candidate"].tolist() == [1.0, 0.0]

    # longest tiny stream has 2 events: no triples anywhere, empty result
    tg = _df(q.q_trigram_transitions(tiny_sf))
    assert len(tg) == 0


def test_r3s10_batch8_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("lsh_recall_curve", "trigram_transitions")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch9_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    ds = _df(q.q_decayed_user_scores(tiny_sf))
    # user 8's only event IS the horizon: weight exactly 1 -> score 2.5
    assert ds["user_id"].tolist() == [8, 7]
    assert ds["score"].iloc[0] == 2.5
    assert 1.5 < ds["score"].iloc[1] < 2.0  # two day-old unit events

    ta = _df(q.q_touch_attribution(tiny_sf))
    # single-type users: first == last credit per type
    assert ta["event_type"].tolist() == ["buy", "view"]
    assert ta["first_touch_value"].tolist() == [2.5, 2.0]
    assert ta["last_touch_value"].tolist() == [2.5, 2.0]


def test_r3s10_batch9_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("decayed_user_scores", "touch_attribution")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch10_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    # pivot 0 is isolated in the tiny graph: its SCC is just itself
    scc = _df(q.q_scc_pivot(tiny_sf))
    assert scc["node"].tolist() == [0] and scc["scc_size"].iloc[0] == 1

    gm = _df(q.q_grouped_mode(tiny_sf)).sort_values("event_type")
    assert gm["mode_value"].tolist() == [2.5, 1.0]
    assert gm["mode_count"].tolist() == [1, 2]

    # three 1-event hours -> constant lagged series: zero variance, NaN r
    ac = _df(q.q_hourly_autocorr(tiny_sf))
    assert ac["n_pairs"].iloc[0] == 2 and np.isnan(ac["lag1_autocorr"].iloc[0])


def test_r3s10_batch10_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("scc_pivot", "grouped_mode", "hourly_autocorr")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch11_survive_tiny_corpus(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    wm = _df(q.q_weighted_median(tiny_sf)).sort_values("event_type")
    # singleton and constant groups: the lone/common value is the median
    assert wm["weighted_median"].tolist() == [2.5, 1.0]

    # 4 tiny vectors: k=8 init clamps to all 4 -> inertia 0 at k >= 4
    import pyarrow.parquet as _pq
    _pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], [0, 0, 0, 1.0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1, 2, 3], pa.int32()),
            }
        ),
        tiny_sf + "/embeddings.parquet",
    )
    ki = _df(q.q_kmeans_inertia(tiny_sf))
    assert ki["k"].tolist() == [2, 4, 8]
    assert ki["inertia"].iloc[1] == 0.0 and ki["inertia"].iloc[2] == 0.0
    assert ki["inertia"].iloc[0] > 0

    zt = _df(q.q_proportion_ztest(tiny_sf))
    # s0 (2 docs) vs s1 (1 doc); all tiny docs fail Gopher -> 0-0 split,
    # zero pooled variance -> NaN z, not a crash
    assert zt["source_a"].iloc[0] == "s0" and zt["source_b"].iloc[0] == "s1"
    assert np.isnan(zt["z"].iloc[0])


def test_r3s10_batch11_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("weighted_median", "kmeans_inertia", "proportion_ztest")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch12_survive_tiny_corpus(ray_session, tiny_sf):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as q

    ps = _df(q.q_pack_stats(tiny_sf))
    # 12 tokens fit one 256-token slot
    assert ps.iloc[0].tolist() == [1, 12, 12, 12, 12.0]

    pc_ = _df(q.q_peak_concurrency(tiny_sf))
    # three disjoint singleton sessions: peak 1, first at the earliest event
    assert pc_["peak"].iloc[0] == 1
    assert pc_["at_ts"].iloc[0] == pd.Timestamp("2024-01-01 00:10:00")


def test_r3s10_batch12_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("pack_stats", "peak_concurrency")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_batch13_survive_tiny_corpus(ray_session, tiny_sf):
    import pyarrow.parquet as _pq

    from blockchainspider_ray.pipelines import queries as q

    _pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0, 0, 0], [0.9, 0.1, 0, 0], [0, 0, 1.0, 0], [0, 0.1, 0.9, 0]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0, 1, 1], pa.int32()),
            }
        ),
        tiny_sf + "/embeddings.parquet",
    )
    # two tight label pairs: every vector's nearest other shares its label
    acc = _df(q.q_label_knn_accuracy(tiny_sf))
    assert acc["accuracy"].iloc[0] == 1.0 and acc["n"].iloc[0] == 4

    # tiny graph: star at 7 + isolated edge (8, 6); LPA labels them, all
    # edges end up inside their community -> positive modularity, 3 edges
    mod = _df(q.q_modularity(tiny_sf))
    assert mod["m_edges"].iloc[0] == 3
    assert -1.0 <= mod["modularity"].iloc[0] <= 1.0


def test_r3s10_batch13_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("label_knn_accuracy", "modularity")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_r3s10_length_gini(ray_session, tiny_sf, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    # tiny corpus 9,9,3: hand-computed rank-sum Gini
    g = Q.q_length_gini(tiny_sf)
    # sorted x = [3,9,9]; S = 1*3 + 2*9 + 3*9 = 48; T = 21; n = 3
    # gini = 2*48/(3*21) - 4/3 = 96/63 - 4/3 = 0.190476
    assert g["gini"].iloc[0] == 0.190476

    # partitioning independence
    want = Q.q_length_gini(SF)
    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    got = Q.q_length_gini(SF)
    pd.testing.assert_frame_equal(got, want)


def test_r3s11_partitioning_independent(ray_session, monkeypatch):
    import pandas as pd

    from blockchainspider_ray.pipelines import queries as Q

    names = ("persistent_items", "sparsify_error")

    def _to_df(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    baseline = {name: _to_df(Q.SQL_QUERIES[name](SF)) for name in names}

    real_read = Q._read

    def skewed_read(sf_dir, table, columns=None):
        return real_read(sf_dir, table, columns).repartition(17)

    monkeypatch.setattr(Q, "_read", skewed_read)
    for name, want in baseline.items():
        got = _to_df(Q.SQL_QUERIES[name](SF))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )
