"""Degenerate-corpus + partitioning-independence guards for the
rank-association / trend-test / KMV-sketch session (3g).

Tiny fixture (2 docs / 4 events over 3 days) with closed-form values:
daily series n=(2,1,1), cents=(300,100,300) gives Kendall pairs C=1 D=0
with one tie pair on each margin (tau_b = 1/sqrt(2*2) = 0.5) and
Mann-Kendall S=-2 with tie group t=2 (var = 48/18, z = -1/sqrt(48/18));
the 7-token vocabulary is far below k=16 so KMV degrades to the exact
count with rel_error 0 (k=16).
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
    d = str(tmp_path_factory.mktemp("sf_tiny_s3g"))
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


def _df(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_s3g_kendall_tau_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    kt = _df(q.q_kendall_tau(tiny_sf))
    # x=(2,1,1), y=(300,100,300): pair (d1,d2) concordant, the other two
    # pairs tie on one margin; n1 = n2 = 1 -> tau = 1/sqrt((3-1)*(3-1)) = 0.5
    assert kt.values.tolist() == [[3, 1, 0, 0.5]]


def test_s3g_mann_kendall_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    mk = _df(q.q_mann_kendall(tiny_sf))
    # S = -1 - 1 + 0 = -2; var = (3*2*11 - 2*1*9)/18 = 48/18
    assert mk["n_days"].tolist() == [3]
    assert mk["s_stat"].tolist() == [-2]
    assert mk["var_s"].tolist() == [2.666667]
    assert mk["z"].tolist() == [-0.612372]


def test_s3g_mann_kendall_flat_series(ray_session, tiny_sf, tmp_path, monkeypatch):
    """All-equal daily counts: S=0, every day ties, z must be exactly 0."""
    from blockchainspider_ray.pipelines import queries as q

    d = str(tmp_path)
    ts = pa.array(
        pd.to_datetime(
            ["2024-01-01 01:00", "2024-01-02 01:00", "2024-01-03 01:00"]
        ).astype("datetime64[us]")
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "ts": ts,
                "user_id": pa.array([1, 2, 3], pa.int64()),
                "event_type": pa.array(["view"] * 3, pa.string()),
                "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string()),
            }
        ),
        d + "/events.parquet",
    )
    mk = _df(q.q_mann_kendall(d))
    assert mk["s_stat"].tolist() == [0]
    assert mk["z"].tolist() == [0.0]
    kt = _df(q.q_kendall_tau(d))
    # x all-tied: denominator hits the nullif guard -> NaN tau
    assert pd.isna(kt["tau_b"].iloc[0])


def test_s3g_kmv_small_vocab_exact(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    kmv = _df(q.q_kmv_sketch(tiny_sf))
    # 7 distinct tokens < k=16 -> the sketch IS the exact set
    assert kmv.values.tolist() == [[16, 7, 7.0, 0.0]]


def test_s3g_partitioning_independent(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = ("kendall_tau", "mann_kendall", "kmv_sketch")
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


def test_s3g_yule_k_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    yk = _df(q.q_yule_k(tiny_sf))
    # every token count 1: sum c^2 == N -> K is exactly 0
    assert yk.values.tolist() == [[7, 7, 0.0]]


def test_s3g_brier_empty_eval_window(ray_session, tiny_sf):
    """Fixture events all precede the 2024-01-16 cutoff: eval window is
    empty, so n_eval = 0 and every decomposition term is NULL/NaN."""
    from blockchainspider_ray.pipelines import queries as q

    br = _df(q.q_brier_decomposition(tiny_sf))
    assert br["n_eval"].tolist() == [0]
    assert br[["brier", "reliability", "resolution", "uncertainty"]].isna().all().all()


def test_s3g_partitioning_independent_b(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = ("tpch_q5", "yule_k", "brier_decomposition")
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


def test_s3g_hurst_too_short(ray_session, tiny_sf):
    """3 days < the smallest window (4): every R/S cell and H are NaN."""
    from blockchainspider_ray.pipelines import queries as q

    h = _df(q.q_hurst_exponent(tiny_sf))
    assert h.isna().all().all()


def test_s3g_acf_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    a = _df(q.q_acf_profile(tiny_sf))
    # x=(2,1,1), mu=4/3: acf1 = -1/6, acf2 = -1/3; lags >= 3 drop (no pairs)
    assert a["lag"].tolist() == [1, 2]
    assert a["n_pairs"].tolist() == [2, 1]
    assert a["acf"].tolist() == [-0.166667, -0.333333]


def test_s3g_runs_test_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    r = _df(q.q_runs_test(tiny_sf))
    # median 1: both median days drop, one day above remains -> z undefined
    assert r["n_kept"].tolist() == [1]
    assert r["n_above"].tolist() == [1]
    assert r["n_below"].tolist() == [0]
    assert r["runs"].tolist() == [1.0]
    assert pd.isna(r["z"].iloc[0])


def test_s3g_partitioning_independent_c(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = ("hurst_exponent", "acf_profile", "runs_test")
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


def test_s3g_mann_whitney_absent_sources(ray_session, tiny_sf):
    """Fixture sources are s0/s1, not src0/src1: both samples empty ->
    the NULL-stat row, matching the SQL mirror on the same corpus."""
    from blockchainspider_ray.pipelines import queries as q

    mw = _df(q.q_mann_whitney(tiny_sf))
    assert mw["n_a"].tolist() == [0]
    assert mw["n_b"].tolist() == [0]
    assert pd.isna(mw["u"].iloc[0]) and pd.isna(mw["z"].iloc[0])


def test_s3g_cramers_v_degenerate_margin(ray_session, tiny_sf):
    """One lang x two sources: min dimension 1, V undefined, chi2 = 0."""
    from blockchainspider_ray.pipelines import queries as q

    cv = _df(q.q_cramers_v(tiny_sf))
    assert cv["n"].tolist() == [2]
    assert cv["n_langs"].tolist() == [1]
    assert cv["n_sources"].tolist() == [2]
    assert cv["chi2"].tolist() == [0.0]
    assert pd.isna(cv["cramers_v"].iloc[0])
    assert pd.isna(cv["cramers_v_corrected"].iloc[0])


def test_s3g_lorenz_tiny(ray_session, tiny_sf):
    from blockchainspider_ray.pipelines import queries as q

    lz = _df(q.q_lorenz_curve(tiny_sf))
    # users (8,1),(9,1),(7,2): cum shares .25/.5/1.0 at rank cuts 1/2/3
    assert lz["decile"].tolist() == list(range(1, 11))
    assert lz["cum_share"].tolist() == [
        0.25, 0.25, 0.25, 0.5, 0.5, 0.5, 1.0, 1.0, 1.0, 1.0
    ]


def test_s3g_partitioning_independent_d(ray_session, monkeypatch):
    from blockchainspider_ray.pipelines import queries as Q

    names = ("mann_whitney", "cramers_v", "lorenz_curve")
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
