"""Degenerate-corpus + partitioning-independence guards for the
vocabulary-richness / keyness / TPC-H-Q10 session (3h).

Tiny fixtures with closed-form values:
- chao1: 7 all-hapax tokens -> V=N=f1=7, f2=0, chao1 = 7 + 7*6/2 = 28,
  Good-Turing unseen mass = 7/7 = 1.0.
- keyness: s0="a a b", s1="b c" gives hand-computable G^2 per term and
  exercises the over-representation gate (s0's "b" must be dropped).
- Q10: one customer / one in-window order / two R lineitems -> a single
  row whose revenue is the exact two-term sum; an all-'N' lineitem table
  (no returns at all) must yield an empty frame, not a crash.
"""

import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.full  # long sweep: excluded from the fast tier


import math

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _df(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


@pytest.fixture(scope="module")
def tiny_docs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_tiny_s3h"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a b", "b c"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s0", "s1"], pa.string()),
                "n_chars": pa.array([5, 3], pa.int64()),
            }
        ),
        d + "/documents.parquet",
    )
    return d


@pytest.fixture(scope="module")
def tiny_tpch(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_tiny_s3h_tpch"))
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([3], pa.int32()),
                "n_name": pa.array(["FRANCE"], pa.string()),
                "n_regionkey": pa.array([1], pa.int32()),
            }
        ),
        d + "/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([42], pa.int64()),
                "c_name": pa.array(["Customer#42"], pa.string()),
                "c_nationkey": pa.array([3], pa.int32()),
                "c_acctbal": pa.array([10.5], pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"], pa.string()),
            }
        ),
        d + "/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([7, 8], pa.int64()),
                "o_custkey": pa.array([42, 42], pa.int64()),
                "o_orderstatus": pa.array(["F", "F"], pa.string()),
                "o_totalprice": pa.array([100.0, 100.0], pa.float64()),
                "o_orderdate": pa.array(
                    pd.to_datetime(["1997-06-01", "1996-01-01"]).astype(
                        "datetime64[us]"
                    )
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string()),
            }
        ),
        d + "/orders.parquet",
    )
    # order 7 is in-window with two R lines; order 8 is out of window
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([7, 7, 8], pa.int64()),
                "l_partkey": pa.array([1, 2, 3], pa.int64()),
                "l_suppkey": pa.array([1, 1, 1], pa.int64()),
                "l_linenumber": pa.array([1, 2, 1], pa.int32()),
                "l_quantity": pa.array([1.0, 1.0, 1.0], pa.float64()),
                "l_extendedprice": pa.array([100.0, 50.0, 70.0], pa.float64()),
                "l_discount": pa.array([0.1, 0.0, 0.0], pa.float64()),
                "l_tax": pa.array([0.0, 0.0, 0.0], pa.float64()),
                "l_returnflag": pa.array(["R", "R", "R"], pa.string()),
                "l_linestatus": pa.array(["F", "F", "F"], pa.string()),
                "l_shipdate": pa.array(
                    pd.to_datetime(["1997-07-01"] * 3).astype("datetime64[us]")
                ),
            }
        ),
        d + "/lineitem.parquet",
    )
    return d


def test_s3h_chao1_all_hapax(ray_session, tiny_docs):
    from blockchainspider_ray.pipelines import queries as q

    # tokens: a x2, b x2, c x1 -> V=3, N=5, f1=1, f2=2
    got = _df(q.q_chao1_vocab(tiny_docs))
    assert got["lang"].tolist() == ["en"]
    assert got["vocab"].tolist() == [3]
    assert got["n_tokens"].tolist() == [5]
    assert got["f1"].tolist() == [1]
    assert got["f2"].tolist() == [2]
    # bias-corrected chao1 = 3 + 1*0/(2*3) = 3.0; GT unseen = 1/5
    assert got["chao1"].tolist() == [3.0]
    assert got["gt_unseen"].tolist() == [0.2]


def test_s3h_chao1_pure_hapax(ray_session, tmp_path):
    from blockchainspider_ray.pipelines import queries as q

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b c d", "e f g"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s0", "s1"], pa.string()),
                "n_chars": pa.array([7, 5], pa.int64()),
            }
        ),
        d + "/documents.parquet",
    )
    got = _df(q.q_chao1_vocab(d))
    # all 7 tokens hapax, f2=0: chao1 = 7 + 7*6/(2*1) = 28, unseen mass 1.0
    assert got[["vocab", "n_tokens", "f1", "f2"]].values.tolist() == [[7, 7, 7, 0]]
    assert got["chao1"].tolist() == [28.0]
    assert got["gt_unseen"].tolist() == [1.0]


def test_s3h_keyness_closed_form(ray_session, tiny_docs):
    from blockchainspider_ray.pipelines import queries as q

    got = _df(q.q_keyness_llr(tiny_docs)).reset_index(drop=True)
    # s0 (c=3): only "a" survives (its "b" has a/c=1/3 < b/d=1/2)
    # s1 (c=2): "c" (g2=2*ln(2.5)) outranks "b"
    g2_a = round(2 * 2 * math.log(2 / (3 * 2 / 5)), 6)
    g2_c = round(2 * math.log(1 / (2 / 5)), 6)
    g2_b = round(
        2 * (math.log(1 / (2 * 2 / 5)) + math.log(1 / (3 * 2 / 5))), 6
    )
    want = pd.DataFrame(
        {
            "source": ["s0", "s1", "s1"],
            "token": ["a", "c", "b"],
            "cnt_in": [2, 1, 1],
            "cnt_out": [0, 0, 1],
            "g2": [g2_a, g2_c, g2_b],
            "rank": [1, 1, 2],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_s3h_tpch_q10_tiny(ray_session, tiny_tpch):
    from blockchainspider_ray.pipelines import queries as q

    got = _df(q.q_tpch_q10(tiny_tpch)).reset_index(drop=True)
    # only order 7 is in the 1997 window: 100*0.9 + 50*1.0 = 140.0
    assert got["c_custkey"].tolist() == [42]
    assert got["n_name"].tolist() == ["FRANCE"]
    assert got["revenue"].tolist() == [140.0]


def test_s3h_tpch_q10_no_returns(ray_session, tiny_tpch, tmp_path):
    """An all-'N' lineitem table (no returned items) must give an empty
    result, not a crash in the join/sort chain."""
    import shutil

    from blockchainspider_ray.pipelines import queries as q

    d = str(tmp_path)
    for t in ("nation", "customer", "orders"):
        shutil.copy(f"{tiny_tpch}/{t}.parquet", f"{d}/{t}.parquet")
    li = pq.read_table(f"{tiny_tpch}/lineitem.parquet")
    li = li.set_column(
        li.column_names.index("l_returnflag"),
        "l_returnflag",
        pa.array(["N"] * len(li), pa.string()),
    )
    pq.write_table(li, d + "/lineitem.parquet")
    got = _df(q.q_tpch_q10(d))
    assert len(got) == 0


def test_s3h_partitioning_independent(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = ("chao1_vocab", "keyness_llr")
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
def tiny_events(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_tiny_s3h_ev"))
    ts = pa.array(
        pd.to_datetime(
            [
                "2024-01-01 00:10",
                "2024-01-01 05:00",
                "2024-01-02 00:00",
                "2024-01-03 12:00",
            ]
        ).astype("datetime64[us]")
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
                "ts": ts,
                "user_id": pa.array([7, 7, 8, 9], pa.int64()),
                "event_type": pa.array(["view", "view", "buy", "view"], pa.string()),
                "value": pa.array([1.0, 2.0, 1.0, 3.0], pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        ),
        d + "/events.parquet",
    )
    return d


def test_s3h_rfm_tiny(ray_session, tiny_events):
    from blockchainspider_ray.pipelines import queries as q

    got = _df(q.q_rfm_segments(tiny_events)).reset_index(drop=True)
    # 3 users -> ntile(5) degenerates to one user per tile:
    # u9 (most recent, 300c), u8 (1.5d old, 100c), u7 (2.3d old, 2 events, 300c)
    want = pd.DataFrame(
        {
            "r_seg": [1, 2, 3],
            "f_seg": [3, 2, 1],
            "m_seg": [2, 3, 1],
            "n_users": [1, 1, 1],
            "cents": [300, 100, 300],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_s3h_dau_mau_tiny(ray_session, tiny_events):
    from blockchainspider_ray.pipelines import queries as q

    got = _df(q.q_dau_mau(tiny_events)).reset_index(drop=True)
    # 3 active days, one user each; u7's two same-day events dedupe
    assert got["month"].tolist() == ["2024-01"]
    assert got["n_days"].tolist() == [3]
    assert got["avg_dau"].tolist() == [1.0]
    assert got["mau"].tolist() == [3]
    assert got["stickiness"].tolist() == [0.333333]


def test_s3h_friedman_tiny(ray_session, tiny_events):
    from blockchainspider_ray.pipelines import queries as q

    got = _df(q.q_friedman_test(tiny_events)).reset_index(drop=True)
    # counts: d1 (view 2, buy 0), d2 (view 0, buy 1), d3 (view 1, buy 0)
    # ranks all (1,2) -> a2 = 15, R = (5, 4), b2 = 41/3, c2 = 13.5,
    # t1 = (2-1) * (41/3 - 13.5) / (15 - 13.5) = 1/9
    assert got["n_days"].tolist() == [3]
    assert got["n_types"].tolist() == [2]
    assert got["a2"].tolist() == [15.0]
    assert got["b2"].tolist() == [13.666667]
    assert got["t1"].tolist() == [0.111111]


def test_s3h_friedman_all_tied(ray_session, tmp_path):
    """One event per (day, type): every within-day rank ties -> A2 == C2
    and T1 must be NaN/NULL, not a crash."""
    from blockchainspider_ray.pipelines import queries as q

    d = str(tmp_path)
    ts = pa.array(
        pd.to_datetime(
            ["2024-01-01 01:00", "2024-01-01 02:00", "2024-01-02 01:00", "2024-01-02 02:00"]
        ).astype("datetime64[us]")
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
                "ts": ts,
                "user_id": pa.array([1, 2, 3, 4], pa.int64()),
                "event_type": pa.array(["view", "buy", "view", "buy"], pa.string()),
                "value": pa.array([1.0] * 4, pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        ),
        d + "/events.parquet",
    )
    got = _df(q.q_friedman_test(d))
    assert got["n_days"].tolist() == [2]
    assert pd.isna(got["t1"].iloc[0])


def test_s3h_partitioning_independent_events(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = ("rfm_segments", "dau_mau", "friedman_test")
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
