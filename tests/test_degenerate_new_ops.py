"""Degenerate-corpus + partitioning-independence guards for the
operator-expansion session's additions (zipf/heaps/burstiness/winnowing/
readability, skyline/kappa/bootstrap, mutual-kNN/covisitation/JW/entropy-
rate, full-outer/eccentricity/katz, closeness/kwic/gzip, wasserstein/PR/
hapax, AUC/novelty, ewma/bloom, leaky-bucket/journeys, SNM, backoff/
huffman)."""

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
    d = str(tmp_path_factory.mktemp("sf_tiny_newops"))
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
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([7, 11, 77], pa.int64()),
                "o_custkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3, pa.string()),
                "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
                "o_orderdate": pa.array(
                    pd.to_datetime(["2024-01-01"] * 3).astype("datetime64[us]")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 3, pa.string()),
            }
        ),
        d + "/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0, 1, 1], pa.int32()),
            }
        ),
        d + "/embeddings.parquet",
    )
    return d


def _df(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_newops_survive_tiny_corpus_text(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    sky = _df(q.q_pareto_skyline(tiny_sf))
    # both 5-token all-distinct docs tie on (5, 1.0) and are both kept
    assert sky["doc_id"].tolist() == [0, 1]

    wn = _df(q.q_winnowing(tiny_sf))
    # docs 0,1 have 3 grams (< window) -> one fingerprint each; doc 2 none
    assert len(wn) == 2 and set(wn["doc_id"]) == {0, 1}

    tb = _df(q.q_term_burstiness(tiny_sf))
    # token 'a': per-doc counts (1,1,0), N=3 -> fano = 0.5
    assert tb.loc[tb["token"] == "a", "fano"].iloc[0] == 0.5

    nv = _df(q.q_ngram_novelty(tiny_sf))
    assert nv["doc_id"].tolist() == [0, 1]
    assert nv["novelty"].tolist() == [1.0, 0.0]

    sb = _df(q.q_stupid_backoff_logprob(tiny_sf))
    # doc 2: single bigram 'x y' with c=1, c(x)=1 -> ln 1 = 0
    assert sb.loc[sb["doc_id"] == 2, "sb_logprob"].iloc[0] == 0.0

    snm = _df(q.q_sorted_neighborhood(tiny_sf))
    # 3 docs, window 3 -> all 3 pairs; the identical ledes score 1.0
    assert len(snm) == 3
    assert snm.loc[(snm.doc_a == 0) & (snm.doc_b == 1), "jac"].iloc[0] == 1.0

    hp = _df(q.q_hapax_ratio(tiny_sf))
    assert hp["vocab"].iloc[0] == 7 and hp["hapax"].iloc[0] == 2

    rd = _df(q.q_readability(tiny_sf))
    # 'x y': two words, zero vowel groups
    assert rd.loc[rd["doc_id"] == 2, "n_syllables"].iloc[0] == 0

    zf = _df(q.q_zipf_fit(tiny_sf))
    assert zf["k"].iloc[0] == 7 and np.isfinite(zf["slope"].iloc[0])

    auc = _df(q.q_roc_auc(tiny_sf))
    # every tiny doc fails the Gopher length gate -> no positives, NULL AUC
    assert auc["n_pos"].iloc[0] == 0 and np.isnan(auc["auc"].iloc[0])

    pr = _df(q.q_pr_curve(tiny_sf))
    assert pr["n_sel"].iloc[0] == 3 and pr["rec"].isna().all()

    kp = _df(q.q_langid_kappa(tiny_sf))
    assert kp["n"].iloc[0] == 3

    ws = _df(q.q_wasserstein_drift(tiny_sf))
    # grid {3, 9}: both sources sit fully across the one gap -> W1 = 6
    assert ws["w1"].tolist() == [6.0, 6.0]

    hl = _df(q.q_heaps_law(tiny_sf))
    assert hl["vocab"].iloc[-1] == 7 and hl["n_tokens"].iloc[-1] == 12

    bc = _df(q.q_bootstrap_ci(tiny_sf))
    assert bc["lo"].iloc[0] <= bc["hi"].iloc[0]

    kw = _df(q.q_kwic(tiny_sf))
    # top token 'a' opens both long docs: empty left context, 'b c' right
    assert kw["left_ctx"].tolist() == ["", ""]
    assert kw["right_ctx"].tolist() == ["b c", "b c"]

    cr = _df(q.q_compression_ratio(tiny_sf))
    assert len(cr) == 3 and (cr["gz_ratio"] > 0).all()

    hm = _df(q.q_huffman_code_lengths(tiny_sf))
    assert abs(sum(2.0 ** -l for l in hm["code_len"]) - 1.0) < 1e-9


def test_newops_survive_tiny_corpus_events_graph(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    ew = _df(q.q_ewma_daily(tiny_sf))
    # day1: 2 events -> 2.0; day2: 0.3*1 + 0.7*2 = 1.7
    assert ew["ewma"].tolist() == [2.0, 1.7]

    lb = _df(q.q_leaky_bucket_replay(tiny_sf))
    # user 7's second request arrives 4h50m after the first; the 6h
    # min-gap delays it by 70 minutes = 4.2e9 us
    assert lb.loc[(lb.user_id == 7) & (lb.event_id == 1), "delay_us"].iloc[0] == 4_200_000_000
    assert lb.loc[lb.user_id == 8, "delay_us"].iloc[0] == 0

    ej = _df(q.q_edit_journeys(tiny_sf))
    assert len(ej) == 1 and ej["edit_dist"].iloc[0] == 2  # 'vv' vs 'b'

    cv = _df(q.q_covisitation(tiny_sf))
    assert len(cv) == 0  # no item pair shared by >= 2 users

    ec = _df(q.q_eccentricity(tiny_sf))
    assert len(ec) == 50 and (ec["ecc"] >= 0).all()

    kz = _df(q.q_katz_centrality(tiny_sf))
    assert len(kz) == 50 and (kz["katz"] >= 1.0).all()

    ch = _df(q.q_closeness_harmonic(tiny_sf))
    assert len(ch) == 50 and (ch["harmonic"] >= 0).all()

    mk = _df(q.q_mutual_knn(tiny_sf))
    # 4 vectors, k=3 -> everyone picks everyone -> all 6 pairs mutual
    assert len(mk) == 6

    fj = _df(q.q_full_outer_join(tiny_sf))
    # orderkeys 7 and 77 divide by 7; 11 and 77 by 11 -> custkey 3 in both,
    # custkey 1 left-only, custkey 2 right-only
    assert fj["o_custkey"].tolist() == [1, 2, 3]
    assert np.isnan(fj.loc[fj.o_custkey == 1, "cnt_b"].iloc[0])
    assert np.isnan(fj.loc[fj.o_custkey == 2, "cnt_a"].iloc[0])

    bf = _df(q.q_bloom_fpr(tiny_sf))
    assert (bf["false_pos"] >= 0).all()


def test_newops_partitioning_independent(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "zipf_fit", "heaps_law", "term_burstiness", "winnowing", "readability",
        "pareto_skyline", "langid_kappa", "bootstrap_ci", "mutual_knn",
        "covisitation", "entropy_rate", "eccentricity", "katz_centrality",
        "closeness_harmonic", "kwic", "hapax_ratio", "wasserstein_drift",
        "pr_curve", "roc_auc", "ngram_novelty", "ewma_daily",
        "leaky_bucket_replay", "edit_journeys", "sorted_neighborhood",
        "stupid_backoff_logprob", "full_outer_join",
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
