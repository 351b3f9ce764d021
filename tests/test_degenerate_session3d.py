"""Degenerate-corpus + partitioning-independence guards for the
bowtie/line-dedup/SALSA/co-citation/gap-stats/count-min/SimRank/
Adamic-Adar/WL/ndcg/shard-balance/HLL/CDC/Benford/walk-corpus session.

Tiny fixture (3 docs / 3 events) gives hand-checkable closed forms:
events (user 7, event 0/1) and (user 8, event 2) produce edges
7->41, 7->42, 8->6 in the user_id%50 link graph.
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
    d = str(tmp_path_factory.mktemp("sf_tiny_s3d"))
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


def test_s3d_tiny_corpus_text(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    ld = _df(q.q_line_dedup(tiny_sf))
    # docs 0/1 are one identical 5-token segment; doc 0 wins, doc 1 drops
    assert ld.loc[ld.doc_id == 0, "kept_segs"].iloc[0] == 1
    assert ld.loc[ld.doc_id == 1, "kept_segs"].iloc[0] == 0
    assert ld.loc[ld.doc_id == 2, "kept_frac"].iloc[0] == 1.0

    cc = _df(q.q_cdc_chunks(tiny_sf))
    # every tiny doc is shorter than the 8-token window -> zero cuts
    assert (cc["n_cuts"] == 0).all()
    assert cc["avg_chunk_tokens"].tolist() == [5.0, 5.0, 2.0]

    nd = _df(q.q_ndcg_eval(tiny_sf))
    # all 3 docs relevant -> perfect ordering; 3 hits in a top-10 window
    assert nd["ndcg10"].iloc[0] == 1.0
    assert nd["prec10"].iloc[0] == 0.3
    assert nd["mrr"].iloc[0] == 1.0

    sb = _df(q.q_shard_balance(tiny_sf))
    assert int(sb["n_docs"].sum()) == 3

    bf = _df(q.q_benford_digits(tiny_sf))
    # values 1.0, 1.0, 2.5 -> digits 1,1,2
    assert bf.loc[bf.digit == 1, "n"].iloc[0] == 2
    assert bf.loc[bf.digit == 2, "n"].iloc[0] == 1
    assert np.isfinite(bf["chi2"].iloc[0])

    cm = _df(q.q_count_min(SF))
    # CMS never undercounts
    assert (cm["cms_count"] >= cm["true_count"]).all()

    hl = _df(q.q_hll_audit(SF))
    assert len(hl) == 16 and (hl["register"] >= 0).all()
    assert hl["raw_estimate"].iloc[0] > 0


def test_s3d_tiny_corpus_graph(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    co = _df(q.q_cocitation(tiny_sf))
    # only node 7 cites two pages (41, 42); nothing shares a dst
    assert co[["a", "b", "cocitation", "coupling"]].values.tolist() == [
        [41, 42, 1, 0]
    ]

    aa = _df(q.q_adamic_adar(tiny_sf))
    assert len(aa) == 1
    row = aa.iloc[0]
    assert (row["a"], row["b"], row["common_neighbors"]) == (41, 42, 1)
    assert row["jaccard"] == 1.0
    assert abs(row["adamic_adar"] - 1 / np.log(2)) < 1e-6

    gs = _df(q.q_gap_stats(tiny_sf))
    # src 7 -> sorted dsts (41, 42): gaps (42, 1) -> gamma bits 11 + 1
    assert gs.loc[gs.src == 7, "total_bits"].iloc[0] == 12
    # src 8 -> dst 6: gap 7 -> 2*2+1 = 5 bits
    assert gs.loc[gs.src == 8, "total_bits"].iloc[0] == 5

    sr = _df(q.q_simrank(tiny_sf))
    # 41 and 42 share their single in-neighbor -> C * 1/(1*1) = 0.8
    assert sr.loc[(sr.a == 41) & (sr.b == 42), "simrank"].iloc[0] == 0.8

    wl = _df(q.q_wl_refinement(tiny_sf))
    cmap = wl.set_index("node")["color"].to_dict()
    # 41 and 42 are graph-isomorphic positions; 6's in-neighbor differs
    assert cmap[41] == cmap[42] != cmap[6]

    bt = _df(q.q_bowtie(tiny_sf))
    assert len(bt) == 50
    assert set(bt["part"]) <= {"core", "in", "out", "other"}

    sa = _df(q.q_salsa(tiny_sf))
    assert len(sa) == 50 and (sa["authority"] >= 0).all()

    wc = _df(q.q_walk_corpus(tiny_sf))
    # walks from 7 and 8 take one hop then hit sinks
    assert set(wc["start"]) == {7, 8}
    assert (wc["step"] == 1).all()
    assert int(wc.loc[wc.start == 8, "node"].iloc[0]) == 6


def test_s3d_partitioning_independent(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = (
        "bowtie", "line_dedup", "salsa", "cocitation", "gap_stats",
        "count_min", "simrank", "adamic_adar", "wl_refinement",
        "ndcg_eval", "shard_balance", "hll_audit", "cdc_chunks",
        "benford_digits", "walk_corpus", "late_arrivals", "funnel_conversion",
        "kaplan_meier", "bipartite_check", "cuped", "hitting_time",
        "set_cover_greedy", "knapsack_select", "containment_pairs",
        "rbo_overlap", "info_gain", "triadic_closure", "snapshot_drift",
        "rich_club", "cosine_pairs", "pagerank_delta",
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
