"""Stats C query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) quintile segmentation — the
    classic user-value grid marketing and abuse teams cut corpora by.
    Per user: days since last event (vs the corpus max), event count, and
    integer-cent spend; each dimension gets an exact ntile(5) segment with
    deterministic (metric, user_id) tie order, and the output is the
    O(125)-row segment summary, not per-user rows.  Shape: one
    groupby(user) aggregate is the only shuffle; like q_lorenz_curve the
    ntile fold runs on the already-aggregated O(users) table."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        cents = _r(b.column("value").to_numpy() * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts_us": us,
                "cents": pa.array(cents, pa.int64()),
                "one": pa.array(np.ones(len(b), dtype=np.int64)),
            }
        )

    agg = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("ts_us"), Sum("cents"), Sum("one"))
        .to_pandas()
        .rename(columns={"max(ts_us)": "last_us", "sum(cents)": "cents", "sum(one)": "freq"})
    )
    corpus_max = int(agg["last_us"].max())
    agg["r_days"] = ((corpus_max - agg["last_us"]) // 86_400_000_000).astype("int64")

    def ntile5(df: pd.DataFrame, by: str, ascending: bool) -> np.ndarray:
        order = df.sort_values([by, "user_id"], ascending=[ascending, True]).index
        n = len(df)
        q, r5 = divmod(n, 5)
        rank0 = np.empty(n, dtype=np.int64)
        rank0[df.index.get_indexer(order)] = np.arange(n)
        cut = r5 * (q + 1)
        return (
            np.where(rank0 < cut, rank0 // (q + 1), r5 + (rank0 - cut) // max(q, 1)) + 1
        ).astype(np.int64)

    agg = agg.reset_index(drop=True)
    agg["r_seg"] = ntile5(agg, "r_days", ascending=True)
    agg["f_seg"] = ntile5(agg, "freq", ascending=False)
    agg["m_seg"] = ntile5(agg, "cents", ascending=False)
    out = (
        agg.groupby(["r_seg", "f_seg", "m_seg"], as_index=False)
        .agg(n_users=("user_id", "size"), cents=("cents", "sum"))
        .sort_values(["r_seg", "f_seg", "m_seg"])
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    return out


def q_friedman_test(sf_dir: str):
    """Friedman rank test (Conover's tie-robust T1 form) for "do the event
    types keep the same daily-volume ordering across days": blocks = days,
    treatments = event types, observations = daily counts with zero cells
    for absent (day, type) pairs, average ranks within each day.
    T1 = (k-1)(B2 - C2)/(A2 - C2) ~ chi^2(k-1) where A2 = sum of squared
    ranks, B2 = (1/n) sum of squared rank sums, C2 = n*k*(k+1)^2/4.
    Shape: the (day, type) count combiner is the only shuffle; the rank
    fold runs on the O(days x types) cell table."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def cnt(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "t": b.column("event_type")})
        )
        return (
            df.with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by(["day", "t"])
            .agg(pl.len().alias("n"))
            .to_arrow()
        )

    cells = (
        ev.map_batches(cnt, batch_format="pyarrow")
        .groupby(["day", "t"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    # complete the grid: zero cells rank too
    grid = (
        pd.MultiIndex.from_product(
            [sorted(cells["day"].unique()), sorted(cells["t"].unique())],
            names=["day", "t"],
        )
        .to_frame(index=False)
        .merge(cells, on=["day", "t"], how="left")
        .fillna({"n": 0})
    )
    grid["rij"] = grid.groupby("day")["n"].rank(method="average")
    n = grid["day"].nunique()
    k = grid["t"].nunique()
    a2 = float((grid["rij"] ** 2).sum())
    rj = grid.groupby("t")["rij"].sum()
    bsum = float((rj**2).sum())
    b2 = bsum / n
    c2 = n * k * (k + 1.0) ** 2 / 4.0
    t1 = float((k - 1) * (b2 - c2) / (a2 - c2)) if a2 - c2 > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_days": pd.array([n], dtype="int64"),
            "n_types": pd.array([k], dtype="int64"),
            "a2": [float(_r(a2, 6))],
            "b2": [float(_r(b2, 6))],
            "t1": [float(_r(t1, 6)) if t1 == t1 else float("nan")],
        }
    )


def q_log_rank_test(sf_dir: str):
    """Log-rank (Mantel-Cox) test comparing time-from-signup-to-purchase
    survival between two user cohorts (g = user_id % 2) — the standard
    companion to q_kaplan_meier when the question is "do the curves
    differ", e.g. A/B retention.  At every distinct event time t with
    d > 0 pooled events: O1 += d1, E1 += d * n1/n, V += d * (n1/n) *
    (1 - n1/n) * (n-d)/(n-1); chi2 = (O1-E1)^2 / V ~ chi^2(1).
    Shape: the same per-user duration fold as q_kaplan_meier (one
    groupby(user_id), one broadcast max-ts scalar), then a per-duration
    groupby; at-risk counts come from searchsorted on the O(users)
    duration arrays driver-side — the event stream itself never leaves
    the cluster un-aggregated."""
    obs = _survival_durations(sf_dir).to_pandas()  # shared convention
    obs["g"] = obs["user_id"].to_numpy(np.int64) % 2
    if obs.empty or int(obs["ev"].sum()) == 0:
        return pd.DataFrame(
            columns=["n_times", "o1", "e1", "v", "chi2"]
        ).astype({"n_times": "int64", "o1": "int64", "e1": "float64", "v": "float64", "chi2": "float64"})
    durs_all = np.sort(obs["dur"].to_numpy(np.int64))
    durs_g1 = np.sort(obs.loc[obs["g"] == 1, "dur"].to_numpy(np.int64))
    evts = obs[obs["ev"] == 1]
    tt = (
        evts.groupby("dur")
        .agg(d=("ev", "size"), d1=("g", "sum"))
        .reset_index()
        .sort_values("dur")
    )
    t = tt["dur"].to_numpy(np.int64)
    n = len(durs_all) - np.searchsorted(durs_all, t, side="left")
    n1 = len(durs_g1) - np.searchsorted(durs_g1, t, side="left")
    d = tt["d"].to_numpy(np.float64)
    d1 = tt["d1"].to_numpy(np.float64)
    frac = n1 / n
    o1 = float(d1.sum())
    e1 = float((d * frac).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        vterm = np.where(n > 1, d * frac * (1.0 - frac) * (n - d) / (n - 1.0), 0.0)
    v = float(vterm.sum())
    chi2 = float((o1 - e1) * (o1 - e1) / v) if v > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_times": pd.array([len(tt)], dtype="int64"),
            "o1": pd.array([int(o1)], dtype="int64"),
            "e1": [float(_r(e1, 6))],
            "v": [float(_r(v, 6))],
            "chi2": [float(_r(chi2, 6)) if chi2 == chi2 else float("nan")],
        }
    )


def q_jarque_bera(sf_dir: str):
    """Jarque-Bera normality test of the event value distribution per
    event type: JB = n/6 * (S^2 + (K-3)^2/4) from sample skewness S and
    kurtosis K — the quick "is this metric Gaussian enough for z-tests"
    gate.  Shape: the corr_matrix two-pass centered-sufficient-stats
    pattern (no cancellation-prone raw moments): pass 1 = per-type
    (sum, n) combiner for the means; pass 2 broadcasts the O(types) mean
    table and folds centered power sums per batch, one tiny groupby."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    means = (
        ev.groupby("event_type")
        .aggregate(Sum("value"), Count())
        .to_pandas()
        .rename(columns={"sum(value)": "s", "count()": "n"})
    )
    means["mu"] = means["s"] / means["n"]
    mu_ref = ray.put(dict(zip(means["event_type"], means["mu"])))

    def centered(b: pa.Table, _m=mu_ref) -> pa.Table:
        mu = ray.get(_m)
        df = b.to_pandas()
        df["mu"] = df["event_type"].map(mu)
        xc = df["value"].to_numpy(np.float64) - df["mu"].to_numpy(np.float64)
        df["p2"] = xc * xc
        df["p3"] = df["p2"] * xc
        df["p4"] = df["p2"] * df["p2"]
        g = df.groupby("event_type", as_index=False)[["p2", "p3", "p4"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = (
        ev.map_batches(centered, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("p2"), Sum("p3"), Sum("p4"))
        .to_pandas()
        .rename(columns={"sum(p2)": "s2", "sum(p3)": "s3", "sum(p4)": "s4"})
        .merge(means[["event_type", "n"]], on="event_type")
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    n = sums["n"].to_numpy(np.float64)
    m2 = sums["s2"].to_numpy(np.float64) / n
    m3 = sums["s3"].to_numpy(np.float64) / n
    m4 = sums["s4"].to_numpy(np.float64) / n
    with np.errstate(divide="ignore", invalid="ignore"):
        skew = m3 / np.power(m2, 1.5)
        kurt = m4 / (m2 * m2)
        jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    return pd.DataFrame(
        {
            "event_type": sums["event_type"],
            "n": sums["n"].astype("int64"),
            "skewness": _r(skew, 6),
            "kurtosis": _r(kurt, 6),
            "jb": _r(jb, 6),
        }
    )


def q_periodogram(sf_dir: str):
    """Discrete-Fourier periodogram of the daily event volume at candidate
    periods 2..14 days — the direct spectral test for "is there a weekly
    cycle" that q_acf_profile's lag correlations only hint at.  Power at
    period p: P(p) = (C^2 + S^2) / m with C = sum(xc * cos(2*pi*t/p)),
    S = sum(xc * sin(2*pi*t/p)) over the mean-centered series indexed by
    day rank t.  Shape: the _daily_counts combiner reduce is the only
    shuffle; the O(days x 13) trig fold runs on the driver series,
    mirrored in SQL as a periods-VALUES cross join."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m == 0:
        return pd.DataFrame(columns=["period", "power"]).astype({"period": "int64", "power": "float64"})
    mu = float(x.sum()) / m
    xc = x - mu
    t = np.arange(m, dtype=np.float64)
    rows = []
    for p in range(2, 15):
        if p > m:
            continue
        w = 2.0 * np.pi * t / p
        c = float((xc * np.cos(w)).sum())
        s = float((xc * np.sin(w)).sum())
        rows.append((p, float(_r((c * c + s * s) / m, 6))))
    return pd.DataFrame(rows, columns=["period", "power"]).astype({"period": "int64"})


def q_mcc_binary(sf_dir: str):
    """Binary detector quality for the "is this document English" gate
    (pred = langid says 'en', truth = the labelled lang column): the full
    2x2 cells plus Matthews correlation, balanced accuracy and Youden's J
    — MCC being the one single-number summary that stays honest under
    class imbalance (mcc = (tp*tn - fp*fn)/sqrt((tp+fp)(tp+fn)(tn+fp)
    (tn+fn))).  Shape: reuses q_langid_confusion's combiner plan, so only
    O(langs^2) cells ever reach the driver; the SQL mirror nests the
    full-value langid oracle."""
    from .q_text import q_langid_confusion  # explicit cross-family dep
    cm = q_langid_confusion(sf_dir).to_pandas()
    tp = int(cm.loc[(cm["lang"] == "en") & (cm["lang_pred"] == "en"), "cnt"].sum())
    fp = int(cm.loc[(cm["lang"] != "en") & (cm["lang_pred"] == "en"), "cnt"].sum())
    fn = int(cm.loc[(cm["lang"] == "en") & (cm["lang_pred"] != "en"), "cnt"].sum())
    tn = int(cm.loc[(cm["lang"] != "en") & (cm["lang_pred"] != "en"), "cnt"].sum())
    den = (
        float(tp + fp) * float(tp + fn) * float(tn + fp) * float(tn + fn)
    )
    mcc = (tp * tn - fp * fn) / np.sqrt(den) if den > 0 else float("nan")
    tpr = tp / (tp + fn) if tp + fn > 0 else float("nan")
    tnr = tn / (tn + fp) if tn + fp > 0 else float("nan")
    return pd.DataFrame(
        {
            "tp": pd.array([tp], dtype="int64"),
            "fp": pd.array([fp], dtype="int64"),
            "fn": pd.array([fn], dtype="int64"),
            "tn": pd.array([tn], dtype="int64"),
            "mcc": [float(_r(mcc, 6)) if mcc == mcc else float("nan")],
            "balanced_acc": [
                float(_r((tpr + tnr) / 2.0, 6))
                if tpr == tpr and tnr == tnr
                else float("nan")
            ],
            "youden_j": [
                float(_r(tpr + tnr - 1.0, 6))
                if tpr == tpr and tnr == tnr
                else float("nan")
            ],
        }
    )


def q_pettitt_test(sf_dir: str):
    """Pettitt changepoint test on the daily event volume (tie-adjusted
    rank form): with average ranks r_i over all m days, U_t = 2 *
    cumsum(r)_t - t*(m+1); the change point is the t maximizing |U_t|
    (earliest day on ties), K = max|U_t|, and the approximate two-sided
    p-value is min(1, 2*exp(-6K^2/(m^3+m^2))) — the standard
    nonparametric "did the level shift and when" monitor that
    complements q_cusum_changepoints' parametric CUSUM.  Shape: the
    _daily_counts combiner reduce is the only shuffle; the rank/cumsum
    fold runs on the O(days) series, mirrored as window functions."""
    d = _daily_counts(sf_dir)
    m = len(d)
    if m < 2:
        return pd.DataFrame(
            columns=["change_day", "m", "k_stat", "p_approx"]
        ).astype({"m": "int64", "change_day": "float64", "k_stat": "float64", "p_approx": "float64"})
    x = d["n"].to_numpy(np.float64)
    # average ranks with ties (1-based)
    r = pd.Series(x).rank(method="average").to_numpy(np.float64)
    u = 2.0 * np.cumsum(r) - (np.arange(1, m + 1, dtype=np.float64)) * (m + 1)
    u = u[:-1]  # t = 1..m-1
    absu = np.abs(u)
    k = float(absu.max())
    t_star = int(np.argmax(absu))  # earliest on ties (argmax returns first)
    p = min(1.0, 2.0 * float(np.exp(-6.0 * k * k / (m**3 + m**2))))
    return pd.DataFrame(
        {
            "change_day": [d["day"].iloc[t_star]],
            "m": pd.array([m], dtype="int64"),
            "k_stat": [float(_r(k, 6))],
            "p_approx": [float(_r(p, 6))],
        }
    )


def q_bartlett_test(sf_dir: str):
    """Bartlett test of variance homogeneity of value across event types
    — the gate before pooling variances in q_anova_f / q_welch_ttest:
    T = ((N-k) ln Sp^2 - sum((n_i-1) ln S_i^2)) / C with the usual
    correction C = 1 + (sum(1/(n_i-1)) - 1/(N-k)) / (3(k-1)), Sp^2 the
    pooled variance and S_i^2 the unbiased group variances.  Shape: the
    jarque_bera two-pass centered-sufficient-stats plan — per-type
    (sum, n) combiner, broadcast means, centered square sums — only
    O(types) rows ever reach the driver."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    means = (
        ev.groupby("event_type")
        .aggregate(Sum("value"), Count())
        .to_pandas()
        .rename(columns={"sum(value)": "s", "count()": "n"})
    )
    means["mu"] = means["s"] / means["n"]
    mu_ref = ray.put(dict(zip(means["event_type"], means["mu"])))

    def centered(b: pa.Table, _m=mu_ref) -> pa.Table:
        mu = ray.get(_m)
        df = b.to_pandas()
        xc = df["value"].to_numpy(np.float64) - df["event_type"].map(mu).to_numpy(
            np.float64
        )
        df["p2"] = xc * xc
        g = df.groupby("event_type", as_index=False)[["p2"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = (
        ev.map_batches(centered, batch_format="pyarrow")
        .groupby("event_type")
        .sum("p2")
        .to_pandas()
        .rename(columns={"sum(p2)": "s2"})
        .merge(means[["event_type", "n"]], on="event_type")
    )
    sums = sums[sums["n"] > 1].sort_values("event_type").reset_index(drop=True)
    k = len(sums)
    n_i = sums["n"].to_numpy(np.float64)
    big_n = float(n_i.sum())
    s2_i = sums["s2"].to_numpy(np.float64) / (n_i - 1.0)
    sp2 = float((sums["s2"].to_numpy(np.float64)).sum()) / (big_n - k)
    if k < 2 or sp2 <= 0 or np.any(s2_i <= 0):
        t_stat = float("nan")
    else:
        num = (big_n - k) * np.log(sp2) - float(((n_i - 1.0) * np.log(s2_i)).sum())
        c = 1.0 + (float((1.0 / (n_i - 1.0)).sum()) - 1.0 / (big_n - k)) / (
            3.0 * (k - 1.0)
        )
        t_stat = float(num / c)
    return pd.DataFrame(
        {
            "k": pd.array([k], dtype="int64"),
            "n": pd.array([int(big_n)], dtype="int64"),
            "df": pd.array([k - 1], dtype="int64"),
            "t_stat": [float(_r(t_stat, 6)) if t_stat == t_stat else float("nan")],
        }
    )


def q_err_eval(sf_dir: str, k: int = 20):
    """Expected Reciprocal Rank (Chapelle et al. cascade model) of the
    deterministic "longest docs first" ranking with graded relevance
    R = 0.75 for lang='en', 0.25 for 'fr', 0 otherwise ((2^g-1)/2^gmax
    with grades 2/1/0): ERR = sum_i (R_i / i) * prod_{j<i} (1 - R_j) —
    the diminishing-returns cousin of q_ndcg_eval that penalizes a
    relevant doc placed below another relevant doc.  Shape: the only
    global materialization is the top-k slice (distributed sort + limit,
    k rows); the cascade fold is O(k) on the driver."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    top = (
        docs.sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    rel = np.where(
        top["lang"] == "en", 0.75, np.where(top["lang"] == "fr", 0.25, 0.0)
    )
    err, look = 0.0, 1.0
    for i, ri in enumerate(rel, start=1):
        err += look * ri / i
        look *= 1.0 - ri
    return pd.DataFrame(
        {
            "k": pd.array([len(top)], dtype="int64"),
            "err": [float(_r(err, 6))],
            "sat_prob": [float(_r(1.0 - look, 6))],
        }
    )


def q_simpson_diversity(sf_dir: str):
    """Simpson diversity of the language mix per source: concentration
    D = sum(p_i^2), Gini-Simpson 1-D, and the inverse-Simpson "effective
    number of languages" 1/D — the ecology-standard diversity triple a
    corpus-mix dashboard shows next to q_dist_divergence's KL drift.
    Shape: one (source, lang) count combiner; the share fold runs on the
    O(sources x langs) cell table driver-side."""
    docs = _read(sf_dir, "documents", columns=["source", "lang"])
    cells = (
        docs.groupby(["source", "lang"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
    )
    tot = cells.groupby("source")["n"].sum()
    rows = []
    for src in sorted(tot.index):
        n = float(tot[src])
        p = cells.loc[cells["source"] == src, "n"].to_numpy(np.float64) / n
        d = float((p * p).sum())
        rows.append(
            (
                src,
                int(n),
                float(_r(d, 6)),
                float(_r(1.0 - d, 6)),
                float(_r(1.0 / d, 6)),
            )
        )
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "simpson_d", "gini_simpson", "inv_simpson"]
    ).astype({"n_docs": "int64"})


def q_dirichlet_lm(sf_dir: str, k: int = 10, mu: float = 2000.0):
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty) for
    the fixed query ('data', 'query', 'join'): score(d) = sum_q ln((tf_qd
    + mu * p(q|C)) / (|d| + mu)) — the LM ranking that complements
    q_bm25_scores' tf-idf family; mu=2000 is the standard prior.  Shape:
    corpus stats for the 3 query terms are one filtered token-count
    combiner (a 3-row broadcast, never the vocabulary); per-doc tf/len
    scoring is a pure map; only the top-k slice materializes (scores
    rounded 6dp BEFORE ranking so the SQL boundary agrees)."""
    qterms = ("data", "query", "join")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        tot = 0
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            tot += len(toks)
            for w in toks:
                if w in qterms:
                    cnt[w] += 1
        return pa.table(
            {
                "token": pa.array(list(qterms), pa.string()),
                "c": pa.array([cnt.get(w, 0) for w in qterms], pa.int64()),
                "tot": pa.array([tot] * len(qterms), pa.int64()),
            }
        )

    stats = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c"), Sum("tot"))
        .to_pandas()
    )
    coll_total = int(stats["sum(tot)"].iloc[0])
    pc = {
        t: c / coll_total for t, c in zip(stats["token"], stats["sum(c)"].astype(int))
    }
    pc_ref = ray.put(pc)

    def score(b: pa.Table, _p=pc_ref) -> pa.Table:
        import math

        p = ray.get(_p)
        ids, sc = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            dl = len(toks)
            s = 0.0
            for qt in qterms:
                tf = sum(1 for w in toks if w == qt)
                s += math.log((tf + mu * p[qt]) / (dl + mu))
            ids.append(d)
            sc.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(_r(sc, 6), pa.float64()),
            }
        )

    out = (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "doc_id", "score"]]


def q_gains_chart(sf_dir: str):
    """Cumulative-gains (lift) chart: rank the corpus by the n_chars
    "score" (DESC, doc_id tie-break), cut into ntile(10) deciles with
    the order-preserving bucket rank, and report per decile the doc
    count, positives (lang='en'), cumulative positive share and
    cumulative lift — the model-quality curve every targeting/selection
    pipeline reads before picking a threshold.  Shape: n_chars IS the
    coarse bucket key (integer, bounded groups), so per-key counts ->
    exclusive offsets -> in-key argsort gives exact global ranks without
    a global sort; only O(10) decile cells reach the driver."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "pos": pa.array(
                    (pc.equal(b.column("lang"), "en")).to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "n_chars": b.column("n_chars"),
                "kb": pa.array(
                    (-b.column("n_chars").to_numpy()).astype(np.int64), pa.int64()
                ),
            }
        )

    scored = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = scored.groupby("kb").count().to_pandas().sort_values("kb")
    n_docs = int(bc["count()"].sum())
    offsets = dict(
        zip(bc["kb"], bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)
    q10, r10 = divmod(n_docs, 10)

    def bucketize(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values("doc_id").reset_index(drop=True)
        rank0 = off[int(df["kb"].iloc[0])] + np.arange(len(df), dtype=np.int64)
        cut = r10 * (q10 + 1)
        di = (
            np.where(rank0 < cut, rank0 // (q10 + 1), r10 + (rank0 - cut) // max(q10, 1))
            + 1
        )
        return pa.table(
            {
                "decile": pa.array(di.astype(np.int64)),
                "pos": pa.array(df["pos"].to_numpy(), pa.int64()),
                "one": pa.array(np.ones(len(df), dtype=np.int64)),
            }
        )

    cells = (
        scored.groupby("kb")
        .map_groups(bucketize, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("one", alias_name="n_docs"), Sum("pos", alias_name="n_pos"))
        .to_pandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    tot_pos = int(cells["n_pos"].sum())
    tot_docs = int(cells["n_docs"].sum())
    cum_pos = cells["n_pos"].cumsum().to_numpy(np.float64)
    cum_docs = cells["n_docs"].cumsum().to_numpy(np.float64)
    base = tot_pos / tot_docs
    cells["cum_pos_share"] = _r(cum_pos / tot_pos, 6)
    cells["lift"] = _r((cum_pos / cum_docs) / base, 6)
    cells["decile"] = cells["decile"].astype("int64")
    cells["n_docs"] = cells["n_docs"].astype("int64")
    cells["n_pos"] = cells["n_pos"].astype("int64")
    return cells[["decile", "n_docs", "n_pos", "cum_pos_share", "lift"]]


def q_tukey_fences(sf_dir: str):
    """Tukey IQR fence outlier screen per event type: exact interpolated
    Q1/Q3 (type-7, via _group_interp_quantiles), inner fences at
    1.5*IQR and outer fences at 3*IQR, with counts beyond each — the
    boxplot rule that complements q_mad_outliers' median-based screen
    and q_winsorize's clipping.  Shape: the quantile two-pass plus ONE
    more streaming pass with the O(types) fence table broadcast; only
    per-type counts reach the driver."""
    vals = _group_interp_quantiles(sf_dir, (0.25, 0.75))
    types = sorted({t for (t, _q) in vals})
    fences = {}
    for t in types:
        q1, q3 = vals[(t, 0.25)], vals[(t, 0.75)]
        iqr = q3 - q1
        fences[t] = (q1 - 1.5 * iqr, q3 + 1.5 * iqr, q1 - 3.0 * iqr, q3 + 3.0 * iqr)
    f_ref = ray.put(fences)

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def count_out(b: pa.Table, _f=f_ref) -> pa.Table:
        f = ray.get(_f)
        df = b.to_pandas()
        rows = []
        for t, g in df.groupby("event_type"):
            lo, hi, flo, fhi = f[t]
            v = g["value"].to_numpy(np.float64)
            rows.append(
                (
                    t,
                    int(((v < lo) | (v > hi)).sum()),
                    int(((v < flo) | (v > fhi)).sum()),
                )
            )
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "n_out": pa.array([r[1] for r in rows], pa.int64()),
                "n_far": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    counts = (
        ev.map_batches(count_out, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_out"), Sum("n_far"))
        .to_pandas()
        .rename(columns={"sum(n_out)": "n_out", "sum(n_far)": "n_far"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    counts["q1"] = [float(_r(vals[(t, 0.25)], 6)) for t in counts["event_type"]]
    counts["q3"] = [float(_r(vals[(t, 0.75)], 6)) for t in counts["event_type"]]
    counts["iqr"] = [
        float(_r(vals[(t, 0.75)] - vals[(t, 0.25)], 6)) for t in counts["event_type"]
    ]
    counts["n_out"] = counts["n_out"].astype("int64")
    counts["n_far"] = counts["n_far"].astype("int64")
    return counts[["event_type", "q1", "q3", "iqr", "n_out", "n_far"]]


def q_odds_ratio_ci(sf_dir: str):
    """2x2 odds ratio with the Woolf log-normal 95% CI for exposure
    "source = 'src0'" vs outcome "lang = 'en'": OR = ad/bc, ln OR +/-
    1.96 * sqrt(1/a + 1/b + 1/c + 1/d), with the Haldane-Anscombe +0.5
    continuity correction applied to ALL cells whenever any cell is
    zero — the epidemiology-standard association readout next to
    q_proportion_ztest's difference-of-rates z.  Shape: one 4-cell
    filtered-count combiner; the fold is O(1) driver-side."""
    docs = _read(sf_dir, "documents", columns=["source", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        src0 = pc.equal(b.column("source"), "src0").to_numpy(zero_copy_only=False)
        en = pc.equal(b.column("lang"), "en").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array([int((src0 & en).sum())], pa.int64()),
                "b": pa.array([int((src0 & ~en).sum())], pa.int64()),
                "c": pa.array([int((~src0 & en).sum())], pa.int64()),
                "d": pa.array([int((~src0 & ~en).sum())], pa.int64()),
            }
        )

    tot = docs.map_batches(cells, batch_format="pyarrow").sum(["a", "b", "c", "d"])
    a, b, c, d = (
        int(tot["sum(a)"]),
        int(tot["sum(b)"]),
        int(tot["sum(c)"]),
        int(tot["sum(d)"]),
    )
    corr = 0.5 if min(a, b, c, d) == 0 else 0.0
    aa, bb, cc, dd = a + corr, b + corr, c + corr, d + corr
    orr = (aa * dd) / (bb * cc)
    se = np.sqrt(1.0 / aa + 1.0 / bb + 1.0 / cc + 1.0 / dd)
    lo = float(np.exp(np.log(orr) - 1.96 * se))
    hi = float(np.exp(np.log(orr) + 1.96 * se))
    return pd.DataFrame(
        {
            "a": pd.array([a], dtype="int64"),
            "b": pd.array([b], dtype="int64"),
            "c": pd.array([c], dtype="int64"),
            "d": pd.array([d], dtype="int64"),
            "odds_ratio": [float(_r(orr, 6))],
            "ci_lo": [float(_r(lo, 6))],
            "ci_hi": [float(_r(hi, 6))],
        }
    )


def q_gumbel_maxima(sf_dir: str):
    """Extreme-value analysis of daily maximum event values: fit a Gumbel
    distribution to the block (daily) maxima by method of moments
    (scale = s * sqrt(6)/pi, loc = mean - gamma*scale with Euler's
    gamma), and report the 30-day and 365-day return levels
    loc - scale*ln(-ln(1 - 1/T)) — the tail-risk readout capacity
    planning reads off peak-load series.  Shape: one (day, max) combiner
    groupby; mean/std fold runs on the O(days) maxima series
    driver-side, mirrored with explicit mean-then-centered-sum CTEs."""
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts"), "v": b.column("value")}))
        return (
            df.with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by("day")
            .agg(pl.col("v").max().alias("mx"))
            .to_arrow()
        )

    d = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .max("mx")
        .to_pandas()
        .rename(columns={"max(mx)": "mx"})
    )
    x = d["mx"].to_numpy(np.float64)
    n = len(x)
    if n < 2:
        return pd.DataFrame(
            columns=["n_days", "loc", "scale", "rl_30", "rl_365"]
        ).astype({"n_days": "int64", "loc": "float64", "scale": "float64", "rl_30": "float64", "rl_365": "float64"})
    mu = float(x.sum()) / n
    var = float(((x - mu) ** 2).sum()) / (n - 1)
    gamma = 0.5772156649015329
    scale = float(np.sqrt(var) * np.sqrt(6.0) / np.pi)
    loc = mu - gamma * scale
    rl = lambda t: loc - scale * np.log(-np.log(1.0 - 1.0 / t))
    return pd.DataFrame(
        {
            "n_days": pd.array([n], dtype="int64"),
            "loc": [float(_r(loc, 6))],
            "scale": [float(_r(scale, 6))],
            "rl_30": [float(_r(rl(30.0), 6))],
            "rl_365": [float(_r(rl(365.0), 6))],
        }
    )


def q_capture_recapture(sf_dir: str):
    """Chapman capture-recapture estimate of the total distinct user
    population from two temporal "captures" (events before vs after the
    midpoint of the corpus time range): N = (n1+1)(n2+1)/(m+1) - 1 with
    m the users seen in both halves — the classic mark-recapture trick
    for "how many users exist that we never logged".  Shape: per-batch
    (user, half) presence-bit dedupe combiner, one groupby; the fold is
    O(users-in-cells) but only 3 integers reach the estimate."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])
    from ray.data.aggregate import Max, Min

    mm = ev.aggregate(Min("ts"), Max("ts"))
    lo = np.datetime64(mm["min(ts)"], "us").astype("int64")
    hi = np.datetime64(mm["max(ts)"], "us").astype("int64")
    mid = (lo + hi) // 2

    def halves(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        h = (us >= mid).astype(np.int64)
        df = pd.DataFrame({"user_id": b.column("user_id").to_numpy(), "h": h})
        u = df.drop_duplicates()
        return pa.Table.from_pandas(u, preserve_index=False)

    pres = (
        ev.map_batches(halves, batch_format="pyarrow")
        .groupby(["user_id", "h"])
        .count()
        .to_pandas()
    )
    per_user = pres.groupby("user_id")["h"].agg(["count", "sum"])
    n1 = int((pres["h"] == 0).sum())
    n2 = int((pres["h"] == 1).sum())
    m = int((per_user["count"] == 2).sum())
    est = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    # Seber variance of the Chapman estimator
    var = (
        (n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    return pd.DataFrame(
        {
            "n1": pd.array([n1], dtype="int64"),
            "n2": pd.array([n2], dtype="int64"),
            "m_both": pd.array([m], dtype="int64"),
            "n_hat": [float(_r(est, 6))],
            "se": [float(_r(np.sqrt(var), 6))],
        }
    )


def q_gof_uniform_hours(sf_dir: str):
    """G-test goodness-of-fit of the hour-of-day event distribution
    against uniform: G = 2 * sum(O_h * ln(O_h / E)) with E = N/24 over
    the observed hours' cells (zero cells contribute 0 by the usual
    O ln O convention), df = 23 — the "is traffic actually flat" gate
    that complements q_chi2_lang_source's independence test and
    q_dow_seasonality's weekday profile.  Shape: one 24-cell hour-count
    combiner; the fold is O(24) driver-side."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def per_hour(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts")}))
        return (
            df.with_columns(pl.col("ts").dt.hour().cast(pl.Int64).alias("hr"))
            .group_by("hr")
            .agg(pl.len().alias("n"))
            .to_arrow()
        )

    cells = (
        ev.map_batches(per_hour, batch_format="pyarrow")
        .groupby("hr")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    n_total = float(cells["n"].sum())
    e = n_total / 24.0
    o = cells["n"].to_numpy(np.float64)
    g = 2.0 * float((o * np.log(o / e)).sum())
    return pd.DataFrame(
        {
            "n_events": pd.array([int(n_total)], dtype="int64"),
            "n_hours": pd.array([len(cells)], dtype="int64"),
            "df": pd.array([23], dtype="int64"),
            "g_stat": [float(_r(g, 6))],
        }
    )


def q_negbin_fit(sf_dir: str):
    """Method-of-moments negative-binomial fit of the per-user event-count
    distribution: mean, population variance, dispersion index var/mean,
    and the NB parameters r = mu^2/(var - mu), p = mu/var (NaN when the
    data is under-dispersed and Poisson already over-fits) — the
    overdispersion readout that decides between Poisson and NB rate
    models for traffic.  Shape: per-user count groupby folds to a
    (count, n_users) HISTOGRAM combiner, so the driver sees O(distinct
    counts) rows, never O(users)."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    per_user = (
        ev.groupby("user_id")
        .count()
        .map_batches(
            lambda b: b.rename_columns(["user_id", "c"]), batch_format="pyarrow"
        )
    )
    hist = (
        per_user.groupby("c")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
        .sort_values("c")
        .reset_index(drop=True)
    )
    n_users = float(hist["n"].sum())
    c = hist["c"].to_numpy(np.float64)
    w = hist["n"].to_numpy(np.float64)
    mu = float((c * w).sum()) / n_users
    var = float(((c - mu) ** 2 * w).sum()) / n_users
    disp = var / mu if mu > 0 else float("nan")
    if var > mu:
        r = mu * mu / (var - mu)
        p = mu / var
    else:
        r, p = float("nan"), float("nan")
    return pd.DataFrame(
        {
            "n_users": pd.array([int(n_users)], dtype="int64"),
            "mean_c": [float(_r(mu, 6))],
            "var_c": [float(_r(var, 6))],
            "dispersion": [float(_r(disp, 6)) if disp == disp else float("nan")],
            "nb_r": [float(_r(r, 6)) if r == r else float("nan")],
            "nb_p": [float(_r(p, 6)) if p == p else float("nan")],
        }
    )


def q_growth_accounting(sf_dir: str):
    """Month-over-month growth accounting of the active-user base: per
    month, actives split into new (first-ever month), retained (active
    in the previous month too) and resurrected (active before but not
    last month), plus churned (active last month, absent now) — the
    standard MAU bridge every growth report opens with.  Shape: one
    (month, user) presence-bit dedupe combiner; transitions come from a
    per-user month-list fold inside groupby(user_id) emitting O(active
    months) tagged cells, then a tiny month groupby — adjacent-month
    state never requires a corpus-wide self-join."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def months(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts"), "user_id": b.column("user_id")}))
        return (
            df.with_columns(
                (pl.col("ts").dt.year() * 12 + pl.col("ts").dt.month() - 1)
                .cast(pl.Int64)
                .alias("mi")
            )
            .select(["mi", "user_id"])
            .unique()
            .to_arrow()
        )

    pres = (
        ev.map_batches(months, batch_format="pyarrow")
        .groupby(["mi", "user_id"])
        .count()
        .select_columns(["mi", "user_id"])
    )

    def classify(g: pa.Table) -> pa.Table:
        mis = sorted(g.column("mi").to_pylist())
        first = mis[0]
        have = set(mis)
        out_mi, out_kind = [], []
        for mi in mis:
            if mi == first:
                k = "new"
            elif (mi - 1) in have:
                k = "retained"
            else:
                k = "resurrected"
            out_mi.append(mi)
            out_kind.append(k)
            if (mi + 1) not in have:
                out_mi.append(mi + 1)
                out_kind.append("churned")
        return pa.table(
            {
                "mi": pa.array(out_mi, pa.int64()),
                "kind": pa.array(out_kind, pa.string()),
                "one": pa.array([1] * len(out_mi), pa.int64()),
            }
        )

    cells = (
        pres.groupby("user_id")
        .map_groups(classify, batch_format="pyarrow")
        .groupby(["mi", "kind"])
        .sum("one")
        .to_pandas()
        .rename(columns={"sum(one)": "n"})
    )
    # the month AFTER the corpus ends carries only churn bookkeeping: drop it
    last_real = int(
        cells.loc[cells["kind"] != "churned", "mi"].max()
    )
    cells = cells[cells["mi"] <= last_real]
    out = (
        cells.pivot_table(index="mi", columns="kind", values="n", fill_value=0)
        .reindex(columns=["new", "retained", "resurrected", "churned"], fill_value=0)
        .reset_index()
    )
    out.columns.name = None
    out["month"] = [f"{mi // 12:04d}-{mi % 12 + 1:02d}" for mi in out["mi"]]
    for c in ("new", "retained", "resurrected", "churned"):
        out[c] = out[c].astype("int64")
    return out.sort_values("mi").reset_index(drop=True)[
        ["month", "new", "retained", "resurrected", "churned"]
    ]


def q_seasonal_strength(sf_dir: str):
    """STL-lite seasonal-strength of the daily event volume: trend = the
    centered 7-day moving average (interior days only), detrended = x -
    trend, seasonal = per-weekday mean of the detrended series,
    remainder = detrended - seasonal, and strength = max(0, 1 -
    var(remainder)/var(detrended)) (population variances) — the
    one-number "how weekly is this series" that q_dow_seasonality's raw
    profile and q_periodogram's spectrum both gesture at.  Shape: the
    _daily_counts combiner reduce is the only shuffle; the O(days)
    decomposition runs driver-side, mirrored with window frames."""
    d = _daily_counts(sf_dir)
    m = len(d)
    if m < 8:
        return pd.DataFrame(
            columns=["n_interior", "var_detrended", "var_remainder", "strength"]
        ).astype({"n_interior": "int64", "var_detrended": "float64", "var_remainder": "float64", "strength": "float64"})
    x = d["n"].to_numpy(np.float64)
    # centered 7-day moving average on the interior t in [3, m-4]
    kernel = np.ones(7) / 7.0
    trend = np.convolve(x, kernel, mode="valid")  # length m-6, aligned to t=3..m-4
    det = x[3 : m - 3] - trend
    dows = pd.to_datetime(d["day"].iloc[3 : m - 3]).dt.dayofweek.to_numpy()
    seas = np.zeros(7)
    for w in range(7):
        sel = dows == w
        if sel.any():
            seas[w] = det[sel].sum() / sel.sum()
    rem = det - seas[dows]
    vd = float((det - det.mean()) @ (det - det.mean())) / len(det)
    vr = float((rem - rem.mean()) @ (rem - rem.mean())) / len(rem)
    strength = max(0.0, 1.0 - vr / vd) if vd > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_interior": pd.array([len(det)], dtype="int64"),
            "var_detrended": [float(_r(vd, 6))],
            "var_remainder": [float(_r(vr, 6))],
            "strength": [
                float(_r(strength, 6)) if strength == strength else float("nan")
            ],
        }
    )


def q_diff_in_diff(sf_dir: str):
    """Difference-in-differences readout on purchase value: cohorts g =
    user_id % 2 (treatment = 1), periods split at the midpoint of the
    corpus time range; DiD = (post_1 - pre_1) - (post_0 - pre_0) over
    cell means, with the pooled standard error from per-cell variances
    sqrt(sum var_i/n_i) — the standard quasi-experimental estimate next
    to q_cuped's variance-reduced A/B.  Shape: one 4-cell (g, period)
    sufficient-stats combiner (n, sum, centered sumsq via broadcast cell
    means on a second pass); only 4 cells reach the driver."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value", "event_type"])
    from ray.data.aggregate import Max, Min

    mm = ev.aggregate(Min("ts"), Max("ts"))
    lo = np.datetime64(mm["min(ts)"], "us").astype("int64")
    hi = np.datetime64(mm["max(ts)"], "us").astype("int64")
    mid = (lo + hi) // 2

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"] == "purchase"]
        us = df["ts"].to_numpy("datetime64[us]").astype("int64")
        return pa.table(
            {
                "g": pa.array((df["user_id"].to_numpy() % 2).astype(np.int64)),
                "post": pa.array((us >= mid).astype(np.int64)),
                "v": pa.array(df["value"].to_numpy(np.float64), pa.float64()),
            }
        )

    keyed_ds = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    sums = (
        keyed_ds.groupby(["g", "post"])
        .aggregate(Sum("v"), Count())
        .to_pandas()
        .rename(columns={"sum(v)": "s", "count()": "n"})
    )
    sums["mu"] = sums["s"] / sums["n"]
    mu_map = {(int(g), int(p)): m for g, p, m in zip(sums["g"], sums["post"], sums["mu"])}
    mu_ref = ray.put(mu_map)

    def centered(b: pa.Table, _m=mu_ref) -> pa.Table:
        mu = ray.get(_m)
        df = b.to_pandas()
        mus = np.array([mu[(int(g), int(p))] for g, p in zip(df["g"], df["post"])])
        xc = df["v"].to_numpy(np.float64) - mus
        df["p2"] = xc * xc
        g = df.groupby(["g", "post"], as_index=False)[["p2"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    var = (
        keyed_ds.map_batches(centered, batch_format="pyarrow")
        .groupby(["g", "post"])
        .sum("p2")
        .to_pandas()
        .rename(columns={"sum(p2)": "ss"})
        .merge(sums[["g", "post", "n", "mu"]], on=["g", "post"])
    )
    cells = {
        (int(r["g"]), int(r["post"])): (float(r["mu"]), float(r["ss"]), int(r["n"]))
        for _, r in var.iterrows()
    }
    did = (cells[(1, 1)][0] - cells[(1, 0)][0]) - (
        cells[(0, 1)][0] - cells[(0, 0)][0]
    )
    se = float(
        np.sqrt(
            sum(
                (ss / (n - 1)) / n if n > 1 else float("nan")
                for (_mu, ss, n) in cells.values()
            )
        )
    )
    out = {
        "pre_0": [float(_r(cells[(0, 0)][0], 6))],
        "post_0": [float(_r(cells[(0, 1)][0], 6))],
        "pre_1": [float(_r(cells[(1, 0)][0], 6))],
        "post_1": [float(_r(cells[(1, 1)][0], 6))],
        "did": [float(_r(did, 6))],
        "se": [float(_r(se, 6)) if se == se else float("nan")],
    }
    return pd.DataFrame(out)


def q_cohort_ltv(sf_dir: str):
    """Cohort LTV triangle: per signup-month cohort, the CUMULATIVE
    purchase revenue per cohort user at each month-of-age — the
    lifetime-value table next to q_retention_cohorts' activity
    triangle.  Revenue in integer cents for exactness.  Shape: first
    month per user is one groupby(min); the (cohort, age) revenue cells
    come from a partitioned hash join of events against that O(users)
    table (both sides sharded, nothing broadcast); the cumulative fold
    runs on the O(cohorts x ages) triangle driver-side."""
    from ..stages.joins import hash_join

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value", "event_type"])

    def months(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table(
                {
                    "ts": b.column("ts"),
                    "user_id": b.column("user_id"),
                    "value": b.column("value"),
                    "event_type": b.column("event_type"),
                }
            )
        )
        return (
            df.with_columns(
                (pl.col("ts").dt.year() * 12 + pl.col("ts").dt.month() - 1)
                .cast(pl.Int64)
                .alias("mi"),
                (pl.col("value") * 100.0).round(0).cast(pl.Int64).alias("cents"),
            )
            .select(["user_id", "mi", "cents", "event_type"])
            .to_arrow()
        )

    tagged = ev.map_batches(months, batch_format="pyarrow").materialize()
    first = (
        tagged.groupby("user_id")
        .min("mi")
        .map_batches(
            lambda b: b.rename_columns(["user_id", "first_mi"]),
            batch_format="pyarrow",
        )
    )
    cohort_sizes = (
        first.groupby("first_mi").count().to_pandas().rename(columns={"count()": "n_users"})
    )
    purchases = tagged.filter(lambda r: r["event_type"] == "purchase")
    joined = hash_join(purchases, first, key="user_id")

    def cells(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["age"] = df["mi"] - df["first_mi"]
        g = df.groupby(["first_mi", "age"], as_index=False)["cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    tri = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby(["first_mi", "age"])
        .sum("cents")
        .to_pandas()
        .rename(columns={"sum(cents)": "cents"})
        .sort_values(["first_mi", "age"])
        .reset_index(drop=True)
    )
    tri = tri.merge(cohort_sizes, on="first_mi")
    tri["cum_cents"] = tri.groupby("first_mi")["cents"].cumsum()
    tri["ltv"] = _r(tri["cum_cents"] / tri["n_users"] / 100.0, 6)
    tri["cohort"] = [f"{mi // 12:04d}-{mi % 12 + 1:02d}" for mi in tri["first_mi"]]
    tri["age"] = tri["age"].astype("int64")
    tri["n_users"] = tri["n_users"].astype("int64")
    tri["cum_cents"] = tri["cum_cents"].astype("int64")
    return tri[["cohort", "age", "n_users", "cum_cents", "ltv"]]


def q_levene_test(sf_dir: str):
    """Brown-Forsythe (median-centered Levene) test of variance
    homogeneity of value across event types — the robust companion to
    q_bartlett_test for non-normal data: one-way ANOVA F on the absolute
    median deviations z = |x - median_group|.  Shape: exact interpolated
    group medians via _group_interp_quantiles, then two more streaming
    passes (z-sums with broadcast medians; centered z-squares with
    broadcast z-means) — only O(types) cells reach the driver."""
    med = _group_interp_quantiles(sf_dir, (0.5,))
    med_map = {t: v for (t, _q), v in med.items()}
    m_ref = ray.put(med_map)
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def zsum(b: pa.Table, _m=m_ref) -> pa.Table:
        mm = ray.get(_m)
        df = b.to_pandas()
        z = np.abs(
            df["value"].to_numpy(np.float64)
            - df["event_type"].map(mm).to_numpy(np.float64)
        )
        df["z"] = z
        g = df.groupby("event_type", as_index=False).agg(
            s=("z", "sum"), n=("z", "size")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    zm = (
        ev.map_batches(zsum, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})
    )
    zm["mu"] = zm["s"] / zm["n"]
    mu_ref = ray.put(dict(zip(zm["event_type"], zm["mu"])))

    def centered(b: pa.Table, _med=m_ref, _mu=mu_ref) -> pa.Table:
        mm, mu = ray.get(_med), ray.get(_mu)
        df = b.to_pandas()
        z = np.abs(
            df["value"].to_numpy(np.float64)
            - df["event_type"].map(mm).to_numpy(np.float64)
        )
        zc = z - df["event_type"].map(mu).to_numpy(np.float64)
        df["p2"] = zc * zc
        g = df.groupby("event_type", as_index=False)[["p2"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    ss = (
        ev.map_batches(centered, batch_format="pyarrow")
        .groupby("event_type")
        .sum("p2")
        .to_pandas()
        .rename(columns={"sum(p2)": "ss"})
        .merge(zm[["event_type", "n", "mu"]], on="event_type")
    )
    k = len(ss)
    n_tot = float(ss["n"].sum())
    grand = float((ss["mu"] * ss["n"]).sum()) / n_tot
    between = float((ss["n"] * (ss["mu"] - grand) ** 2).sum())
    within = float(ss["ss"].sum())
    f = (
        (n_tot - k) / (k - 1.0) * between / within
        if k > 1 and within > 0
        else float("nan")
    )
    return pd.DataFrame(
        {
            "k": pd.array([k], dtype="int64"),
            "n": pd.array([int(n_tot)], dtype="int64"),
            "df1": pd.array([k - 1], dtype="int64"),
            "df2": pd.array([int(n_tot) - k], dtype="int64"),
            "f_stat": [float(_r(f, 6)) if f == f else float("nan")],
        }
    )


def q_cochran_q(sf_dir: str):
    """Cochran's Q test for "do users engage with view / click / purchase
    at the same rate": blocks = users, treatments = the three event
    types, x_uj = 1 if user u ever did type j.  Q = k(k-1) * (sum C_j^2
    - T^2/k) / (k*T - sum R_u^2) ~ chi^2(k-1) with C_j column totals,
    R_u row totals, T the grand total — the repeated-measures cousin of
    q_proportion_ztest.  Shape: one (user, type) presence-bit dedupe
    combiner; column totals are a k-cell groupby and the row-total
    moments fold inside groupby(user) to two scalars."""
    types = ("view", "click", "purchase")
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pres(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"].isin(types)].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    bits = (
        ev.map_batches(pres, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .count()
        .select_columns(["user_id", "event_type"])
        .materialize()
    )
    cj = (
        bits.groupby("event_type")
        .count()
        .to_pandas()
        .rename(columns={"count()": "c"})
    )
    ru = (
        bits.groupby("user_id")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "r": b.column("count()"),
                    "r2": pa.array(
                        (b.column("count()").to_numpy() ** 2).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .sum(["r", "r2"])
    )
    t_tot = float(ru["sum(r)"])
    r2 = float(ru["sum(r2)"])
    k = float(len(types))
    c2 = float((cj["c"].to_numpy(np.float64) ** 2).sum())
    den = k * t_tot - r2
    q = k * (k - 1.0) * (c2 - t_tot * t_tot / k) / den if den > 0 else float("nan")
    n_users = int(bits.groupby("user_id").count().count())
    return pd.DataFrame(
        {
            "n_users": pd.array([n_users], dtype="int64"),
            "k": pd.array([int(k)], dtype="int64"),
            "df": pd.array([int(k) - 1], dtype="int64"),
            "q_stat": [float(_r(q, 6)) if q == q else float("nan")],
        }
    )


def q_lag_xcorr(sf_dir: str):
    """Lead-lag cross-correlation between the daily 'view' and daily
    'purchase' volumes at lags -3..3: for each lag the exact Pearson
    correlation over the overlapping (view_t, purchase_{t+lag}) pairs
    (zero-filled days inside the shared range) — positive-lag peaks mean
    views LEAD purchases, the funnel-latency signal.  Shape: one
    (day, type) count combiner; the grid completion and per-lag O(days)
    folds run on the driver series, mirrored as an index self-join."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "t": b.column("event_type")})
        )
        return (
            df.filter(pl.col("t").is_in(["view", "purchase"]))
            .with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by(["day", "t"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    cells = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby(["day", "t"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    days = sorted(cells["day"].unique())
    idx = {d: i for i, d in enumerate(days)}
    m = len(days)
    x = np.zeros(m)  # view
    y = np.zeros(m)  # purchase
    for _, r_ in cells.iterrows():
        if r_["t"] == "view":
            x[idx[r_["day"]]] = r_["n"]
        else:
            y[idx[r_["day"]]] = r_["n"]
    rows = []
    for lag in range(-3, 4):
        if lag >= 0:
            xs, ys = x[: m - lag], y[lag:]
        else:
            xs, ys = x[-lag:], y[: m + lag]
        n = len(xs)
        if n < 2:
            continue
        mx, my = xs.mean(), ys.mean()
        dx, dy = xs - mx, ys - my
        den = np.sqrt((dx @ dx) * (dy @ dy))
        if den <= 0:
            continue
        rows.append((lag, n, float(_r((dx @ dy) / den, 6))))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "xcorr"]).astype(
        {"lag": "int64", "n_pairs": "int64"}
    )


def q_jackknife_mean(sf_dir: str):
    """Delete-one-DAY block jackknife of the mean event value: theta_i =
    the mean with day i's events removed, var_jack = (m-1)/m *
    sum((theta_i - theta_dot)^2) — the dependence-respecting standard
    error q_bootstrap_ci's iid resample can't give on autocorrelated
    streams.  Shape: one (day, sum, n) combiner groupby; every theta_i
    is algebra on the O(days) sufficient-statistics table driver-side."""
    ev = _read(sf_dir, "events", columns=["ts", "value"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts"), "v": b.column("value")}))
        return (
            df.with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by("day")
            .agg(pl.col("v").sum().alias("s"), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    d = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("s"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    m = len(d)
    if m < 2:
        return pd.DataFrame(
            columns=["m_days", "mean_all", "theta_dot", "se_jack"]
        ).astype({"m_days": "int64", "mean_all": "float64", "theta_dot": "float64", "se_jack": "float64"})
    s_tot = float(d["s"].sum())
    n_tot = float(d["n"].sum())
    theta = (s_tot - d["s"].to_numpy(np.float64)) / (n_tot - d["n"].to_numpy(np.float64))
    tdot = float(theta.sum()) / m
    var = (m - 1.0) / m * float(((theta - tdot) ** 2).sum())
    return pd.DataFrame(
        {
            "m_days": pd.array([m], dtype="int64"),
            "mean_all": [float(_r(s_tot / n_tot, 6))],
            "theta_dot": [float(_r(tdot, 6))],
            "se_jack": [float(_r(np.sqrt(var), 6))],
        }
    )


def q_wilcoxon_signed_rank(sf_dir: str):
    """Wilcoxon signed-rank test on the PAIRED daily (view, click) volume
    differences — the matched-pairs counterpart of q_mann_whitney's
    unpaired U: zero differences drop (Wilcoxon convention), |d| gets
    average ranks, W+ = rank sum of positive differences, and the
    normal approximation uses the tie-corrected variance
    (n(n+1)(2n+1) - sum(t^3 - t)/2) / 24.  Shape: one (day, type) count
    combiner; the rank fold runs on the O(days) paired series,
    mirrored with rank()/count() window ties."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "t": b.column("event_type")})
        )
        return (
            df.filter(pl.col("t").is_in(["view", "click"]))
            .with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by(["day", "t"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    cells = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby(["day", "t"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    wide = cells.pivot_table(
        index="day", columns="t", values="n", fill_value=0
    ).reindex(columns=["view", "click"], fill_value=0)
    d = (wide["view"] - wide["click"]).to_numpy(np.float64)
    d = d[d != 0.0]
    n = len(d)
    if n == 0:
        return pd.DataFrame(columns=["n_pairs", "w_plus", "z"]).astype(
            {"n_pairs": "int64", "w_plus": "float64", "z": "float64"}
        )
    ad = np.abs(d)
    r = pd.Series(ad).rank(method="average").to_numpy(np.float64)
    w_plus = float(r[d > 0].sum())
    mu = n * (n + 1) / 4.0
    _, tie_counts = np.unique(ad, return_counts=True)
    tie_term = float((tie_counts.astype(np.float64) ** 3 - tie_counts).sum())
    var = (n * (n + 1.0) * (2 * n + 1.0) - tie_term / 2.0) / 24.0
    z = (w_plus - mu) / np.sqrt(var) if var > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_pairs": pd.array([n], dtype="int64"),
            "w_plus": [float(_r(w_plus, 6))],
            "z": [float(_r(z, 6)) if z == z else float("nan")],
        }
    )


def q_ljung_box(sf_dir: str):
    """Ljung-Box portmanteau whiteness test of the daily event volume:
    Q = m(m+2) * sum_{k=1..7} r_k^2/(m-k) with r_k the lag-k sample
    autocorrelations — the single-number "is this series white noise"
    that aggregates q_acf_profile's per-lag readout; df = 7.  Shape:
    the _daily_counts combiner reduce is the only shuffle; the O(days)
    trig-free fold mirrors the acf_profile self-join chain."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 9:
        return pd.DataFrame(columns=["m_days", "df", "q_stat"]).astype(
            {"m_days": "int64", "df": "int64", "q_stat": "float64"}
        )
    mu = float(x.sum()) / m
    xc = x - mu
    den = float((xc * xc).sum())
    q = 0.0
    for k in range(1, 8):
        rk = float((xc[:-k] * xc[k:]).sum()) / den
        q += rk * rk / (m - k)
    q *= m * (m + 2.0)
    return pd.DataFrame(
        {
            "m_days": pd.array([m], dtype="int64"),
            "df": pd.array([7], dtype="int64"),
            "q_stat": [float(_r(q, 6))],
        }
    )


def q_xmr_control(sf_dir: str):
    """XmR (individuals / moving-range) control chart on the daily event
    volume: center = series mean, mR-bar = mean |x_t - x_{t-1}|, natural
    process limits center +/- 2.66 * mR-bar, reporting the limits and
    every out-of-limits day — the SPC chart that, unlike
    q_burst_windows' sigma rule, stays valid for autocorrelated short
    series.  Shape: the _daily_counts combiner reduce is the only
    shuffle; the O(days) lag fold runs driver-side (lag() mirror)."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 2:
        return pd.DataFrame(
            columns=["day", "n", "center", "lcl", "ucl", "ooc"]
        ).astype({"n": "int64", "ooc": "int64", "day": "float64", "center": "float64", "lcl": "float64", "ucl": "float64"})
    center = float(x.sum()) / m
    mr = float(np.abs(np.diff(x)).sum()) / (m - 1)
    lcl, ucl = center - 2.66 * mr, center + 2.66 * mr
    ooc = ((x < lcl) | (x > ucl)).astype(np.int64)
    out = pd.DataFrame(
        {
            "day": d["day"].to_numpy(),
            "n": x.astype(np.int64),
            "center": float(_r(center, 6)),
            "lcl": float(_r(lcl, 6)),
            "ucl": float(_r(ucl, 6)),
            "ooc": ooc,
        }
    )
    return out.astype({"n": "int64", "ooc": "int64"}).reset_index(drop=True)


def q_twonn_dimension(sf_dir: str):
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017) of the
    embedding corpus: per point the two nearest-other Euclidean
    distances give mu = d2/d1, and the MLE is d_hat = n_used /
    sum(ln mu); exact-duplicate points (d1 = 0) are dropped and counted
    — the embedding-geometry health check that tells you whether 64
    stored dimensions carry 5 effective ones.  Shape: the corpus matrix
    broadcasts once via ray.put; each batch computes its (batch x
    corpus) distance block and folds to (sum ln mu, used, dropped)
    partials — the same brute-force-as-oracle-baseline shape as
    q_label_knn_accuracy, with the IVF index as the 10^10-vector path."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    _guard_brute_corpus(emb.count(), "twonn_dimension")
    rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], np.float64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    ref = ray.put((X, ids))

    def partial(b: pa.Table) -> pa.Table:
        X_, ids_ = ray.get(ref)
        Q = _emb_matrix(b)
        qid = b.column("vec_id").to_numpy()
        d2 = ((Q[:, None, :] - X_[None, :, :]) ** 2).sum(axis=2)
        d2[qid[:, None] == ids_[None, :]] = np.inf
        two = np.partition(d2, 1, axis=1)[:, :2]
        two.sort(axis=1)
        d1 = np.sqrt(two[:, 0])
        dd2 = np.sqrt(two[:, 1])
        ok = d1 > 0
        lnmu = float(np.log(dd2[ok] / d1[ok]).sum())
        return pa.table(
            {
                "lnmu": pa.array([lnmu], pa.float64()),
                "used": pa.array([int(ok.sum())], pa.int64()),
                "dropped": pa.array([int((~ok).sum())], pa.int64()),
            }
        )

    agg = emb.map_batches(partial, batch_format="pyarrow").sum(
        ["lnmu", "used", "dropped"]
    )
    used = int(agg["sum(used)"])
    lnmu = float(agg["sum(lnmu)"])
    dim = used / lnmu if lnmu > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_used": pd.array([used], dtype="int64"),
            "n_dropped": pd.array([int(agg["sum(dropped)"])], dtype="int64"),
            "sum_ln_mu": [float(_r(lnmu, 6))],
            "dim": [float(_r(dim, 6)) if dim == dim else float("nan")],
        }
    )


def q_medoid_per_label(sf_dir: str):
    """Per-label medoid of the embedding corpus: the member minimizing
    the summed Euclidean distance to its label-mates (smallest vec_id on
    ties) plus that mean distance — the k-medoids seed / per-cluster
    exemplar a curation UI shows as "the representative doc".  Shape:
    the corpus broadcasts once; each batch computes its rows' within-
    label distance ROW SUMS against the broadcast (one (batch x corpus)
    block), so the full n^2 matrix never materializes anywhere; the
    argmin per label runs on the O(n)-row sum table driver-side."""
    emb = _read(
        sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]
    ).materialize()
    _guard_brute_corpus(emb.count(), "medoid_per_label")
    rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], np.float64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    labels = np.array([r["label"] for r in rows], np.int64)
    ref = ray.put((X, ids, labels))

    def rowsums(b: pa.Table) -> pa.Table:
        X_, ids_, labels_ = ray.get(ref)
        Q = _emb_matrix(b)
        qid = b.column("vec_id").to_numpy()
        qlab = b.column("label").to_numpy().astype(np.int64)
        d = np.sqrt(((Q[:, None, :] - X_[None, :, :]) ** 2).sum(axis=2))
        same = qlab[:, None] == labels_[None, :]
        notself = qid[:, None] != ids_[None, :]
        s = (d * (same & notself)).sum(axis=1)
        cnt = (same & notself).sum(axis=1)
        return pa.table(
            {
                "label": pa.array(qlab, pa.int64()),
                "vec_id": pa.array(qid, pa.int64()),
                "s": pa.array(s, pa.float64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    t = emb.map_batches(rowsums, batch_format="pyarrow").to_pandas()
    t = t.sort_values(["label", "s", "vec_id"]).groupby("label", as_index=False).first()
    t["mean_dist"] = _r(np.where(t["cnt"] > 0, t["s"] / t["cnt"], 0.0), 6)
    t["label"] = t["label"].astype("int64")
    t["vec_id"] = t["vec_id"].astype("int64")
    t["n_mates"] = t["cnt"].astype("int64")
    return t[["label", "vec_id", "n_mates", "mean_dist"]]


def q_dunn_index(sf_dir: str):
    """Dunn cluster-validity index of the labelled embedding corpus:
    min inter-label pair distance / max intra-label pair distance —
    higher = tighter, better-separated clusters; the worst-case
    counterpart of q_silhouette_simplified's averaged score.  Shape:
    the corpus broadcasts once; each batch computes one (batch x
    corpus) distance block and folds to (min_inter, max_intra)
    partials; two scalars reach the driver."""
    emb = _read(
        sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]
    ).materialize()
    _guard_brute_corpus(emb.count(), "dunn_index")
    rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], np.float64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    labels = np.array([r["label"] for r in rows], np.int64)
    ref = ray.put((X, ids, labels))

    def extremes(b: pa.Table) -> pa.Table:
        X_, ids_, labels_ = ray.get(ref)
        Q = _emb_matrix(b)
        qid = b.column("vec_id").to_numpy()
        qlab = b.column("label").to_numpy().astype(np.int64)
        d = np.sqrt(((Q[:, None, :] - X_[None, :, :]) ** 2).sum(axis=2))
        same = qlab[:, None] == labels_[None, :]
        notself = qid[:, None] != ids_[None, :]
        inter = d[~same]
        intra = d[same & notself]
        return pa.table(
            {
                "min_inter": pa.array(
                    [float(inter.min()) if inter.size else np.inf], pa.float64()
                ),
                "max_intra": pa.array(
                    [float(intra.max()) if intra.size else 0.0], pa.float64()
                ),
            }
        )

    agg = emb.map_batches(extremes, batch_format="pyarrow").aggregate(
        Min("min_inter"), Max("max_intra")
    )
    mi = float(agg["min(min_inter)"])
    ma = float(agg["max(max_intra)"])
    dunn = mi / ma if ma > 0 and np.isfinite(mi) else float("nan")
    return pd.DataFrame(
        {
            "min_inter": [float(_r(mi, 6))],
            "max_intra": [float(_r(ma, 6))],
            "dunn": [float(_r(dunn, 6)) if dunn == dunn else float("nan")],
        }
    )


def q_haar_energy(sf_dir: str):
    """Haar-wavelet multi-resolution energy of the daily event volume:
    cascade levels 1..3 of pairwise averages a'_i = (a_2i + a_2i+1)/2 and
    details d_i = (a_2i - a_2i+1)/2 (odd tails truncate per level), with
    energy_l = sum d_i^2 — the time-scale fingerprint (day-to-day vs
    2-day vs 4-day variability) feature extractors compute over load
    series.  Shape: the _daily_counts combiner reduce is the only
    shuffle; the O(days) cascade folds driver-side, mirrored by paired
    integer-division grouping CTEs."""
    d = _daily_counts(sf_dir)
    a = d["n"].to_numpy(np.float64)
    rows = []
    for level in (1, 2, 3):
        m = len(a) // 2
        if m == 0:
            break
        pairs = a[: 2 * m].reshape(m, 2)
        det = (pairs[:, 0] - pairs[:, 1]) / 2.0
        a = (pairs[:, 0] + pairs[:, 1]) / 2.0
        rows.append((level, m, float(_r(float((det * det).sum()), 6))))
    return pd.DataFrame(rows, columns=["level", "n_coeffs", "energy"]).astype(
        {"level": "int64", "n_coeffs": "int64"}
    )


def q_boolean_and_query(sf_dir: str, k: int = 10):
    """Boolean AND retrieval for the query {data, query}: documents
    containing BOTH terms, ranked by combined term frequency (tf_data +
    tf_query, doc_id tie-break) — the posting-list-intersection primitive
    under every search engine, here as one streaming pass (the
    10^10-doc path intersects q_postings_build's lists instead).
    Shape: pure map computing both tfs per doc, filter, distributed
    sort + limit; only the top-k slice materializes."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        ids, t1, t2 = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            a = sum(1 for w in toks if w == "data")
            bb = sum(1 for w in toks if w == "query")
            if a > 0 and bb > 0:
                ids.append(d)
                t1.append(a)
                t2.append(bb)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "tf_data": pa.array(t1, pa.int64()),
                "tf_query": pa.array(t2, pa.int64()),
                "score": pa.array([x + y for x, y in zip(t1, t2)], pa.int64()),
            }
        )

    out = (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "doc_id", "tf_data", "tf_query", "score"]]


def q_phrase_search(sf_dir: str, k: int = 10):
    """Exact-phrase search for "data query": per document the count of
    ADJACENT (data, query) token positions, top-k by count then doc_id —
    the positional-index primitive one level above q_boolean_and_query's
    bag-of-words AND.  Shape: pure map over token streams (positions
    never leave the worker), filter, distributed sort + limit."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hits(b: pa.Table) -> pa.Table:
        ids, ns = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            n = sum(
                1
                for i in range(len(toks) - 1)
                if toks[i] == "data" and toks[i + 1] == "query"
            )
            if n > 0:
                ids.append(d)
                ns.append(n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(ns, pa.int64()),
            }
        )

    out = (
        docs.map_batches(hits, batch_format="pyarrow")
        .sort(["n_hits", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "doc_id", "n_hits"]]


def q_proximity_score(sf_dir: str, k: int = 10):
    """Term-proximity ranking for the pair (data, join): per document
    containing both, the MINIMUM absolute token-position gap, ranked
    ascending (closest-together first, doc_id tie-break) — the proximity
    signal rankers blend with tf-idf because "data ... join" two words
    apart beats two mentions a page apart.  Shape: pure map (the
    per-doc two-pointer min-gap scan stays in the worker), filter,
    distributed sort + limit."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gaps(b: pa.Table) -> pa.Table:
        ids, gs = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            pa_ = [i for i, w in enumerate(toks) if w == "data"]
            pb = [i for i, w in enumerate(toks) if w == "join"]
            if pa_ and pb:
                g = min(abs(i - j) for i in pa_ for j in pb)
                ids.append(d)
                gs.append(g)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "min_gap": pa.array(gs, pa.int64()),
            }
        )

    out = (
        docs.map_batches(gaps, batch_format="pyarrow")
        .sort(["min_gap", "doc_id"])
        .limit(k)
        .to_pandas()
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "doc_id", "min_gap"]]


def q_variance_ratio(sf_dir: str):
    """Lo-MacKinlay variance-ratio test of the daily event volume's
    first differences at horizons q = 2 and 4: VR(q) = Var(q-step sums)
    / (q * Var(1-step)) with population variances over overlapping
    windows — VR near 1 = random walk in levels, < 1 = mean reversion,
    > 1 = momentum/trending.  Shape: the _daily_counts combiner reduce
    is the only shuffle; the O(days) difference/window folds run
    driver-side, mirrored with lag()/window-frame sums."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    rows = []
    if m >= 3:
        r1 = np.diff(x)  # 1-step differences
        mu1 = float(r1.mean())
        v1 = float(((r1 - mu1) ** 2).mean())
        for qq in (2, 4):
            if m <= qq or v1 <= 0:  # need >= 1 overlapping q-window
                continue
            rq = x[qq:] - x[:-qq]  # overlapping q-step differences
            muq = float(rq.mean())
            vq = float(((rq - muq) ** 2).mean())
            rows.append(
                (qq, len(rq), float(_r(vq / (qq * v1), 6)))
            )
    return pd.DataFrame(rows, columns=["q", "n_windows", "vr"]).astype(
        {"q": "int64", "n_windows": "int64"}
    )


def q_turning_points(sf_dir: str):
    """Turning-points randomness test on the daily event volume: count
    strict local maxima + minima among interior days; under iid the
    expectation is 2(m-2)/3 with variance (16m-29)/90, z = (T - E)/sd —
    the shape-based iid check that complements q_runs_test's sign-based
    one (flat plateaus produce NO turning point here: strict
    inequalities both sides).  Shape: _daily_counts reduce, O(days)
    driver fold, lag/lead mirror."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 3:
        return pd.DataFrame(
            columns=["m_days", "n_turning", "expected", "z"]
        ).astype({"m_days": "int64", "n_turning": "int64", "expected": "float64", "z": "float64"})
    a, b, c = x[:-2], x[1:-1], x[2:]
    t = int((((b > a) & (b > c)) | ((b < a) & (b < c))).sum())
    e = 2.0 * (m - 2) / 3.0
    var = (16.0 * m - 29.0) / 90.0
    z = (t - e) / np.sqrt(var) if var > 0 else float("nan")
    return pd.DataFrame(
        {
            "m_days": pd.array([m], dtype="int64"),
            "n_turning": pd.array([t], dtype="int64"),
            "expected": [float(_r(e, 6))],
            "z": [float(_r(z, 6)) if z == z else float("nan")],
        }
    )


def q_consistent_hash_migration(sf_dir: str):
    """Consistent-hash ring migration audit: place 8 (then 9) shards on a
    2^64 ring as md5 points ('shard-<i>'), assign every distinct user key
    to the first shard point clockwise from its hash, and report the
    fraction of keys that move when shard 8 joins — the ~1/9 guarantee
    that makes consistent hashing the resize-friendly alternative to
    q_shard_balance's rendezvous scheme.  Shape: one distinct-user
    combiner; the 9-point ring broadcasts; per-batch assignment is
    vectorized modular arithmetic and only (moved, n) partials fold."""
    from ..stages.dedup import _stable_h64

    ring_pts = {i: _stable_h64(f"shard-{i}") for i in range(9)}
    ev = _read(sf_dir, "events", columns=["user_id"])
    users = ev.groupby("user_id").count().select_columns(["user_id"])

    def assign(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        kh = np.array(
            [_stable_h64(str(int(u))) for u in uid], dtype=np.uint64
        )
        best8 = np.full(len(kh), -1, np.int64)
        best9 = np.full(len(kh), -1, np.int64)
        gap8 = np.full(len(kh), np.iinfo(np.uint64).max, np.uint64)
        gap9 = np.full(len(kh), np.iinfo(np.uint64).max, np.uint64)
        for i, ph in ring_pts.items():
            gap = np.uint64(ph) - kh  # mod-2^64 clockwise distance
            if i < 8:
                sel = gap < gap8
                best8[sel], gap8[sel] = i, gap[sel]
            sel = gap < gap9
            best9[sel], gap9[sel] = i, gap[sel]
        return pa.table(
            {
                "moved": pa.array([int((best8 != best9).sum())], pa.int64()),
                "n": pa.array([len(kh)], pa.int64()),
            }
        )

    agg = users.map_batches(assign, batch_format="pyarrow").sum(["moved", "n"])
    moved, n = int(agg["sum(moved)"]), int(agg["sum(n)"])
    return pd.DataFrame(
        {
            "n_keys": pd.array([n], dtype="int64"),
            "moved": pd.array([moved], dtype="int64"),
            "moved_frac": [float(_r(moved / n, 6)) if n else float("nan")],
        }
    )


def q_casing_profile(sf_dir: str):
    """Casing/character-shape profile per source: fractions of tokens
    that are capitalized (upper first letter), ALL-CAPS (len >= 2), or
    contain a digit — the shouting/spam/code-content signal a web-text
    curation dashboard shows next to q_mojibake_screen.  Shape: one
    vectorized tokenize pass folding (source, cap, caps, dig, n)
    partials; O(sources) cells reach the driver."""
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def prof(b: pa.Table) -> pa.Table:
        from collections import defaultdict

        acc = defaultdict(lambda: [0, 0, 0, 0])
        for src, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            a = acc[src]
            for w in _oracle_tokens(t):
                a[3] += 1
                if w[:1].isupper():
                    a[0] += 1
                if len(w) >= 2 and w.isupper():
                    a[1] += 1
                if any(c.isdigit() for c in w):
                    a[2] += 1
        srcs = sorted(acc)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "cap": pa.array([acc[s][0] for s in srcs], pa.int64()),
                "caps": pa.array([acc[s][1] for s in srcs], pa.int64()),
                "dig": pa.array([acc[s][2] for s in srcs], pa.int64()),
                "n": pa.array([acc[s][3] for s in srcs], pa.int64()),
            }
        )

    out = (
        docs.map_batches(prof, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("cap"), Sum("caps"), Sum("dig"), Sum("n"))
        .to_pandas()
        .rename(
            columns={
                "sum(cap)": "cap",
                "sum(caps)": "caps",
                "sum(dig)": "dig",
                "sum(n)": "n",
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["cap_frac"] = _r(out["cap"] / out["n"], 6)
    out["allcaps_frac"] = _r(out["caps"] / out["n"], 6)
    out["digit_frac"] = _r(out["dig"] / out["n"], 6)
    out["n_tokens"] = out["n"].astype("int64")
    return out[["source", "n_tokens", "cap_frac", "allcaps_frac", "digit_frac"]]


def q_cooccurrence_pmi(sf_dir: str, k: int = 5):
    """Doc-level co-occurrence PMI matrix of the k most frequent tokens:
    PMI(a,b) = ln(n * df_ab / (df_a * df_b)) over document presence —
    the word-association matrix (do 'data' and 'query' travel together
    across documents?) that complements q_pmi_bigrams' adjacency
    collocations.  Shape: one vocabulary combiner picks the top-k
    (broadcast); a second pass folds per-batch presence and pair-
    presence counts (O(k + k^2) cells); the PMI fold is O(k^2)
    driver-side."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for t in b.column("text").to_pylist():
            cnt.update(_oracle_tokens(t))
        return pa.table(
            {
                "token": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    vocab = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby("token")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["c", "token"], ascending=[False, True])
        .head(k)
    )
    top = sorted(vocab["token"].tolist())
    t_ref = ray.put(top)

    def pres(b: pa.Table, _t=t_ref) -> pa.Table:
        tp = ray.get(_t)
        kk = len(tp)
        idx = {w: i for i, w in enumerate(tp)}
        single = np.zeros(kk, np.int64)
        pair = np.zeros((kk, kk), np.int64)
        n = 0
        for t in b.column("text").to_pylist():
            n += 1
            here = sorted({idx[w] for w in _oracle_tokens(t) if w in idx})
            for i in here:
                single[i] += 1
            for ai in range(len(here)):
                for bi in range(ai + 1, len(here)):
                    pair[here[ai], here[bi]] += 1
        ii, jj = np.triu_indices(kk, 1)
        ci = np.concatenate([np.arange(kk), ii]).astype(np.int64)
        cj = np.concatenate([np.arange(kk), jj]).astype(np.int64)
        # the doc count rides ONLY on the (0,0) singles row so the global
        # groupby-sum reconstructs it exactly once
        nv = np.where((ci == 0) & (cj == 0), n, 0).astype(np.int64)
        return pa.table(
            {
                "i": pa.array(ci),
                "j": pa.array(cj),
                "c": pa.array(np.concatenate([single, pair[ii, jj]]).astype(np.int64)),
                "n": pa.array(nv),
            }
        )

    cells = (
        docs.map_batches(pres, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("c"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(c)": "c", "sum(n)": "n"})
    )
    n_docs = int(cells["n"].sum())
    df_single = {
        int(r["i"]): int(r["c"]) for _, r in cells.iterrows() if r["i"] == r["j"]
    }
    rows = []
    for _, r_ in cells.iterrows():
        i, j = int(r_["i"]), int(r_["j"])
        if i >= j:
            continue
        dfa, dfb, dfab = df_single[i], df_single[j], int(r_["c"])
        pmi = (
            float(np.log(n_docs * dfab / (dfa * dfb)))
            if dfab > 0
            else float("nan")
        )
        rows.append(
            (
                top[i],
                top[j],
                dfa,
                dfb,
                dfab,
                float(_r(pmi, 6)) if pmi == pmi else float("nan"),
            )
        )
    rows.sort(key=lambda x: (x[0], x[1]))
    return pd.DataFrame(
        rows, columns=["tok_a", "tok_b", "df_a", "df_b", "df_ab", "pmi"]
    ).astype({"df_a": "int64", "df_b": "int64", "df_ab": "int64"})


def q_gmm_estep(sf_dir: str, k: int = 4, sigma2: float = 16.0):
    """One deterministic spherical-GMM E-step over the embedding corpus:
    centroids = embeddings of vec_id 0..k-1 (the kmeans_assign
    convention), responsibilities r_ic = softmax_c(-||x-mu_c||^2 /
    (2*sigma^2)) computed with the max-subtracted stable softmax, and
    the output is the per-cluster SOFT count and mean responsibility —
    the fractional-assignment upgrade of q_kmeans_assign that a full EM
    trainer iterates.  Shape: the k x 64 centroid block broadcasts;
    per-batch (n, k) responsibility matrices fold to k partial sums."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent_rows = sorted(
        emb.filter(lambda r, _k=k: r["vec_id"] < _k).take_all(),
        key=lambda r: r["vec_id"],
    )
    C = np.array([r["embedding"] for r in cent_rows], np.float64)
    c_ref = ray.put(C)

    def estep(b: pa.Table, _c=c_ref) -> pa.Table:
        CC = ray.get(_c)
        X = _emb_matrix(b)
        d2 = ((X[:, None, :] - CC[None, :, :]) ** 2).sum(axis=2)
        logits = -d2 / (2.0 * sigma2)
        logits -= logits.max(axis=1, keepdims=True)
        w = np.exp(logits)
        w /= w.sum(axis=1, keepdims=True)
        return pa.table(
            {
                "cluster": pa.array(np.arange(len(CC), dtype=np.int64)),
                "soft": pa.array(w.sum(axis=0), pa.float64()),
                "n": pa.array([len(X)] + [0] * (len(CC) - 1), pa.int64()),
            }
        )

    out = (
        emb.map_batches(estep, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("soft"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(soft)": "soft", "sum(n)": "n"})
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    n_total = int(out["n"].sum())
    out["soft_count"] = _r(out["soft"], 6)
    out["mean_resp"] = _r(out["soft"] / n_total, 6)
    out["cluster"] = out["cluster"].astype("int64")
    return out[["cluster", "soft_count", "mean_resp"]]


def q_effect_size_power(sf_dir: str):
    """Effect size + power analysis of the purchase-value A/B cohorts
    (g = user_id % 2): Cohen's d from the pooled SD, the small-sample
    Hedges' g correction g = d * (1 - 3/(4*df - 1)), and the minimal
    detectable effect at alpha=.05 / power=.80, MDE = (1.96 + 0.8416) *
    sqrt(s0^2/n0 + s1^2/n1) — the pre-experiment sizing readout next to
    q_welch_ttest's post-hoc verdict.  Shape: the welch two-pass
    sufficient-stats combiner (means, then centered squares); O(2)
    cells reach the driver."""
    ev = _read(sf_dir, "events", columns=["user_id", "value", "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"] == "purchase"]
        return pa.table(
            {
                "g": pa.array((df["user_id"].to_numpy() % 2).astype(np.int64)),
                "v": pa.array(df["value"].to_numpy(np.float64), pa.float64()),
            }
        )

    kd = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    m = (
        kd.groupby("g")
        .aggregate(Sum("v"), Count())
        .to_pandas()
        .rename(columns={"sum(v)": "s", "count()": "n"})
    )
    m["mu"] = m["s"] / m["n"]
    mu_ref = ray.put(dict(zip(m["g"].astype(int), m["mu"])))

    def centered(b: pa.Table, _m=mu_ref) -> pa.Table:
        mm = ray.get(_m)
        df = b.to_pandas()
        xc = df["v"].to_numpy(np.float64) - df["g"].map(mm).to_numpy(np.float64)
        df["p2"] = xc * xc
        g = df.groupby("g", as_index=False)[["p2"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    ss = (
        kd.map_batches(centered, batch_format="pyarrow")
        .groupby("g")
        .sum("p2")
        .to_pandas()
        .rename(columns={"sum(p2)": "ss"})
        .merge(m[["g", "n", "mu"]], on="g")
        .sort_values("g")
        .reset_index(drop=True)
    )
    n0, n1 = float(ss["n"].iloc[0]), float(ss["n"].iloc[1])
    mu0, mu1 = float(ss["mu"].iloc[0]), float(ss["mu"].iloc[1])
    v0 = float(ss["ss"].iloc[0]) / (n0 - 1)
    v1 = float(ss["ss"].iloc[1]) / (n1 - 1)
    sp = np.sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2))
    d = (mu1 - mu0) / sp
    df_ = n0 + n1 - 2
    g_h = d * (1.0 - 3.0 / (4.0 * df_ - 1.0))
    mde = (1.96 + 0.8416) * np.sqrt(v0 / n0 + v1 / n1)
    return pd.DataFrame(
        {
            "n0": pd.array([int(n0)], dtype="int64"),
            "n1": pd.array([int(n1)], dtype="int64"),
            "cohens_d": [float(_r(d, 6))],
            "hedges_g": [float(_r(g_h, 6))],
            "mde": [float(_r(mde, 6))],
        }
    )


def q_sprt_monitor(sf_dir: str, p0: float = 0.15, p1: float = 0.25):
    """Sequential probability-ratio test (Wald SPRT) on the daily
    purchase-per-view conversion rate: per day the binomial LLR
    increment k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0)) accumulates in day
    order; the monitor reports each day's cumulative LLR and the first
    boundary crossing against ln(B)=ln(0.05/0.95) and ln(A)=ln(0.95/
    0.05) — the always-valid sequential A/B stop rule, as a prefix-sum
    fold.  Shape: one (day, views, purchases) combiner; the O(days)
    cumulative fold mirrors a window sum."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "t": b.column("event_type")})
        )
        return (
            df.filter(pl.col("t").is_in(["view", "purchase"]))
            .with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by("day")
            .agg(
                (pl.col("t") == "view").sum().cast(pl.Int64).alias("v"),
                (pl.col("t") == "purchase").sum().cast(pl.Int64).alias("p"),
            )
            .to_arrow()
        )

    d = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("v"), Sum("p"))
        .to_pandas()
        .rename(columns={"sum(v)": "v", "sum(p)": "p"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    d = d[d["v"] + d["p"] > 0].reset_index(drop=True)
    n = (d["v"] + d["p"]).to_numpy(np.float64)  # trials = view+purchase events
    kk = d["p"].to_numpy(np.float64)
    inc = kk * np.log(p1 / p0) + (n - kk) * np.log((1 - p1) / (1 - p0))
    llr = np.cumsum(inc)
    lo, hi = float(np.log(0.05 / 0.95)), float(np.log(0.95 / 0.05))
    decision = np.where(llr <= lo, "accept_p0", np.where(llr >= hi, "accept_p1", ""))
    out = pd.DataFrame(
        {
            "day": d["day"],
            "trials": n.astype(np.int64),
            "conversions": kk.astype(np.int64),
            "llr": _r(llr, 6),
            "decision": decision,
        }
    )
    return out.astype({"trials": "int64", "conversions": "int64"})


def q_avg_neighbor_degree(sf_dir: str):
    """Average-neighbor-degree curve knn(k) of the undirected events link
    graph: for each degree k, the mean over degree-k nodes of their
    neighbors' mean degree — the functional form of assortativity
    (rising knn(k) = hubs prefer hubs) behind q_degree_assortativity's
    single number.  Shape: canonical undirected edge dedupe, a degree
    combiner (O(50) broadcast), one edge pass folding per-node neighbor-
    degree sums, then the O(degrees) curve fold driver-side."""
    edges = _events_edges(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        bb = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"a": a, "b": bb}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    e = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )

    def degp(b: pa.Table) -> pa.Table:
        both = np.concatenate([b.column("a").to_numpy(), b.column("b").to_numpy()])
        vals, cnts = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(vals.astype(np.int64)),
                "d": pa.array(cnts.astype(np.int64)),
            }
        )

    deg = (
        e.map_batches(degp, batch_format="pyarrow")
        .groupby("node")
        .sum("d")
        .to_pandas()
        .rename(columns={"sum(d)": "d"})
    )
    dmap = dict(zip(deg["node"].astype(int), deg["d"].astype(int)))
    d_ref = ray.put(dmap)

    def nbr(b: pa.Table, _d=d_ref) -> pa.Table:
        dm = ray.get(_d)
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        da = np.array([dm[int(x)] for x in a], np.float64)
        db = np.array([dm[int(x)] for x in bb], np.float64)
        # each edge contributes the OTHER endpoint's degree to each side
        nodes = np.concatenate([a, bb]).astype(np.int64)
        nd = np.concatenate([db, da])
        df = pd.DataFrame({"node": nodes, "s": nd})
        g = df.groupby("node", as_index=False)["s"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    pernode = (
        e.map_batches(nbr, batch_format="pyarrow")
        .groupby("node")
        .sum("s")
        .to_pandas()
        .rename(columns={"sum(s)": "s"})
    )
    pernode["d"] = pernode["node"].astype(int).map(dmap)
    pernode["knn_i"] = pernode["s"] / pernode["d"]
    curve = (
        pernode.groupby("d", as_index=False)
        .agg(n_nodes=("node", "size"), knn=("knn_i", "mean"))
        .sort_values("d")
        .reset_index(drop=True)
    )
    curve["knn"] = _r(curve["knn"], 6)
    curve["degree"] = curve["d"].astype("int64")
    curve["n_nodes"] = curve["n_nodes"].astype("int64")
    return curve[["degree", "n_nodes", "knn"]]


def q_edge_embeddedness(sf_dir: str):
    """Edge-embeddedness histogram of the undirected events link graph:
    per edge the number of common neighbors of its endpoints
    (Granovetter: embeddedness 0 = local bridge), reported as
    (embeddedness, n_edges) — the tie-strength structure behind
    q_clustering_coefficient's node-level ratio.  Shape: canonical edge
    dedupe; the O(50)-node adjacency-bitset table broadcasts; one edge
    pass computes intersections vectorized and folds the histogram."""
    edges = _events_edges(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        bb = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"a": a, "b": bb}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    e = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )
    ep = e.to_pandas()
    n_max = int(max(ep["a"].max(), ep["b"].max())) + 1
    adj = np.zeros((n_max, n_max), dtype=bool)
    adj[ep["a"], ep["b"]] = True
    adj[ep["b"], ep["a"]] = True
    a_ref = ray.put(adj)

    def emb(b: pa.Table, _a=a_ref) -> pa.Table:
        A = ray.get(_a)
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        common = (A[a] & A[bb]).sum(axis=1).astype(np.int64)
        vals, cnts = np.unique(common, return_counts=True)
        return pa.table(
            {
                "embeddedness": pa.array(vals, pa.int64()),
                "n_edges": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    return (
        e.map_batches(emb, batch_format="pyarrow")
        .groupby("embeddedness")
        .sum("n_edges")
        .map_batches(
            lambda b: b.rename_columns(["embeddedness", "n_edges"]),
            batch_format="pyarrow",
        )
        .sort("embeddedness")
    )


def q_juilland_dispersion(sf_dir: str, k: int = 10):
    """Juilland's D dispersion of the k most frequent tokens across the
    10 sources: D = 1 - CV / sqrt(parts - 1) where CV is the coefficient
    of variation of the token's RELATIVE frequency across sources — the
    corpus-linguistics evenness measure (D near 1 = used everywhere,
    near 0 = concentrated in one source) that q_term_burstiness's
    within-doc statistic doesn't capture.  Shape: one (source, token)
    count combiner; per-source totals broadcast; the CV fold runs on
    the O(k x sources) cell table driver-side."""
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for src, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            for tok in _oracle_tokens(t):
                cnt[(src, tok)] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "source": pa.array([x[0] for x in keys], pa.string()),
                "token": pa.array([x[1] for x in keys], pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    st = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby(["source", "token"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    stot = st.groupby("source")["c"].sum()
    # deterministic top-k: count desc, token asc
    tt = st.groupby("token", as_index=False)["c"].sum()
    tt = tt.sort_values(["c", "token"], ascending=[False, True]).head(k)
    srcs = sorted(stot.index)
    parts = len(srcs)
    rows = []
    for tok in tt["token"]:
        rel = np.array(
            [
                float(st.loc[(st["source"] == s) & (st["token"] == tok), "c"].sum())
                / float(stot[s])
                for s in srcs
            ]
        )
        mu = rel.mean()
        sd = np.sqrt(((rel - mu) ** 2).mean())
        cv = sd / mu if mu > 0 else float("nan")
        dd = 1.0 - cv / np.sqrt(parts - 1.0)
        rows.append(
            (
                tok,
                int(tt.loc[tt["token"] == tok, "c"].iloc[0]),
                float(_r(cv, 6)),
                float(_r(dd, 6)),
            )
        )
    rows.sort(key=lambda x: x[0])
    return pd.DataFrame(rows, columns=["token", "total", "cv", "juilland_d"]).astype(
        {"total": "int64"}
    )


def q_map_eval(sf_dir: str):
    """Mean Average Precision of the "longest docs first" ranking against
    binary relevance lang='en': AP = (1/R) * sum over relevant docs of
    (i / global_rank_i) with i the 1-based index among relevant docs in
    rank order — the area-under-PR single number that complements
    q_ndcg_eval (top-k graded) and q_pr_curve (threshold sweep).
    Shape: global ranks come from the order-preserving bucket rank
    (per-n_chars counts -> exclusive offsets -> in-key doc_id order),
    so no global sort; only relevant docs' (rank) rows reach the
    driver fold."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "rel": pa.array(
                    pc.equal(b.column("lang"), "en")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "kb": pa.array(
                    (-b.column("n_chars").to_numpy()).astype(np.int64), pa.int64()
                ),
            }
        )

    scored = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = scored.groupby("kb").count().to_pandas().sort_values("kb")
    offsets = dict(
        zip(bc["kb"], bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)

    def ranks(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values("doc_id").reset_index(drop=True)
        rank1 = off[int(df["kb"].iloc[0])] + np.arange(len(df), dtype=np.int64) + 1
        keep = df["rel"].to_numpy() == 1
        return pa.table({"rank": pa.array(rank1[keep], pa.int64())})

    rel_ranks = (
        scored.groupby("kb")
        .map_groups(ranks, batch_format="pyarrow")
        .to_pandas()["rank"]
        .sort_values()
        .to_numpy()
    )
    r = len(rel_ranks)
    ap = float((np.arange(1, r + 1) / rel_ranks).sum() / r) if r else float("nan")
    return pd.DataFrame(
        {
            "n_relevant": pd.array([r], dtype="int64"),
            "map": [float(_r(ap, 6)) if ap == ap else float("nan")],
        }
    )


def q_bradley_terry(sf_dir: str, iters: int = 3):
    """Bradley-Terry strength fit over event types from daily-volume
    "duels" (type a beats type b on a day if it logged more events;
    equal-volume days are no contest): 3 unrolled MM iterations
    p_i <- w_i / sum_j n_ij / (p_i + p_j) from the uniform start,
    L1-normalized each step — the pairwise-preference ranking model
    behind chess Elo and LLM arena leaderboards.  Shape: one (day,
    type) count combiner; duels fold to an O(types^2) win matrix
    driver-side; the MM fold is O(types^2 x iters), SQL-mirrored with
    the identical normalization order."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "t": b.column("event_type")})
        )
        return (
            df.with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by(["day", "t"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    cells = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby(["day", "t"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    types = sorted(cells["t"].unique())
    kk = len(types)
    idx = {t: i for i, t in enumerate(types)}
    wide = cells.pivot_table(index="day", columns="t", values="n", fill_value=0)
    wins = np.zeros((kk, kk))
    for _, row in wide.iterrows():
        for i in range(kk):
            for j in range(kk):
                if i != j and row.get(types[i], 0) > row.get(types[j], 0):
                    wins[i, j] += 1
    w = wins.sum(axis=1)
    nmat = wins + wins.T
    p = np.full(kk, 1.0 / kk)
    for _ in range(iters):
        denom = np.zeros(kk)
        for i in range(kk):
            for j in range(kk):
                if i != j and nmat[i, j] > 0:
                    denom[i] += nmat[i, j] / (p[i] + p[j])
        newp = np.where(denom > 0, w / denom, p)
        s = 0.0
        for i in range(kk):  # type-ascending normalization fold
            s += newp[i]
        p = newp / s
    return pd.DataFrame(
        {
            "event_type": types,
            "wins": w.astype(np.int64),
            "strength": _r(p, 6),
        }
    ).astype({"wins": "int64"})


def q_stratified_diff(sf_dir: str):
    """Post-stratified A/B difference of purchase value (cohorts g =
    user_id % 2, strata = event hour-of-day quartile floor(hour/6)):
    within each stratum the cohort mean difference, combined with
    stratum-size weights, plus the pooled SE sqrt(sum w_s^2 (v0/n0 +
    v1/n1)) — the imbalance-robust estimate that plain q_welch_ttest
    overstates when strata mix differs by arm.  Shape: the two-pass
    centered-stats combiner per (stratum, cohort); O(8) cells reach
    the driver."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value", "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"] == "purchase"]
        hrs = pd.to_datetime(df["ts"]).dt.hour.to_numpy()
        return pa.table(
            {
                "s": pa.array((hrs // 6).astype(np.int64)),
                "g": pa.array((df["user_id"].to_numpy() % 2).astype(np.int64)),
                "v": pa.array(df["value"].to_numpy(np.float64), pa.float64()),
            }
        )

    kd = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    m = (
        kd.groupby(["s", "g"])
        .aggregate(Sum("v"), Count())
        .to_pandas()
        .rename(columns={"sum(v)": "sv", "count()": "n"})
    )
    m["mu"] = m["sv"] / m["n"]
    mu_ref = ray.put({(int(r["s"]), int(r["g"])): r["mu"] for _, r in m.iterrows()})

    def centered(b: pa.Table, _m=mu_ref) -> pa.Table:
        mm = ray.get(_m)
        df = b.to_pandas()
        mus = np.array([mm[(int(s), int(g))] for s, g in zip(df["s"], df["g"])])
        xc = df["v"].to_numpy(np.float64) - mus
        df["p2"] = xc * xc
        g = df.groupby(["s", "g"], as_index=False)[["p2"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    ss = (
        kd.map_batches(centered, batch_format="pyarrow")
        .groupby(["s", "g"])
        .sum("p2")
        .to_pandas()
        .rename(columns={"sum(p2)": "ss"})
        .merge(m[["s", "g", "n", "mu"]], on=["s", "g"])
    )
    strata = sorted(ss["s"].unique())
    n_tot = float(ss["n"].sum())
    diff, var = 0.0, 0.0
    for st in strata:  # stratum-ascending fold
        rows = ss[ss["s"] == st].set_index("g")
        if 0 not in rows.index or 1 not in rows.index:
            continue
        n0, n1 = float(rows.loc[0, "n"]), float(rows.loc[1, "n"])
        w = (n0 + n1) / n_tot
        diff += w * (rows.loc[1, "mu"] - rows.loc[0, "mu"])
        v0 = float(rows.loc[0, "ss"]) / (n0 - 1) if n0 > 1 else float("nan")
        v1 = float(rows.loc[1, "ss"]) / (n1 - 1) if n1 > 1 else float("nan")
        var += w * w * (v0 / n0 + v1 / n1)
    se = float(np.sqrt(var))
    return pd.DataFrame(
        {
            "n_strata": pd.array([len(strata)], dtype="int64"),
            "strat_diff": [float(_r(diff, 6))],
            "se": [float(_r(se, 6)) if se == se else float("nan")],
        }
    )


def q_logistic_newton(sf_dir: str):
    """One exact Newton step of logistic regression (from beta = 0) for
    the Gopher keep verdict on x = ln(token count): at beta = 0 the
    IRLS weights are 1/4, so beta_1 = 4 * (X'X)^-1 X'(y - 1/2) with
    X = [1, x] — the distributed-GLM primitive (sufficient statistics
    are one combiner pass; the 2x2 solve is driver-side algebra).
    Reports the intercept/slope after one step plus the fitted keep
    probability at the median-ish x = ln(100)."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def stats(b: pa.Table) -> pa.Table:
        n = s_x = s_xx = s_y = s_xy = 0.0
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            x = float(np.log(len(toks))) if toks else 0.0
            y = float(_gopher_stats(toks)[4])
            n += 1
            s_x += x
            s_xx += x * x
            s_y += y - 0.5
            s_xy += x * (y - 0.5)
        return pa.table(
            {
                "n": pa.array([n], pa.float64()),
                "sx": pa.array([s_x], pa.float64()),
                "sxx": pa.array([s_xx], pa.float64()),
                "sy": pa.array([s_y], pa.float64()),
                "sxy": pa.array([s_xy], pa.float64()),
            }
        )

    t = docs.map_batches(stats, batch_format="pyarrow").sum(
        ["n", "sx", "sxx", "sy", "sxy"]
    )
    n, sx, sxx = float(t["sum(n)"]), float(t["sum(sx)"]), float(t["sum(sxx)"])
    sy, sxy = float(t["sum(sy)"]), float(t["sum(sxy)"])
    det = n * sxx - sx * sx
    if det <= 0:
        b0 = b1 = float("nan")
    else:
        b0 = 4.0 * (sxx * sy - sx * sxy) / det
        b1 = 4.0 * (n * sxy - sx * sy) / det
    x0 = float(np.log(100.0))
    p100 = 1.0 / (1.0 + np.exp(-(b0 + b1 * x0))) if b0 == b0 else float("nan")
    return pd.DataFrame(
        {
            "n": pd.array([int(n)], dtype="int64"),
            "beta0": [float(_r(b0, 6)) if b0 == b0 else float("nan")],
            "beta1": [float(_r(b1, 6)) if b1 == b1 else float("nan")],
            "p_at_100": [float(_r(p100, 6)) if p100 == p100 else float("nan")],
        }
    )


def q_conformal_interval(sf_dir: str):
    """Split-conformal prediction interval for document token count
    predicted by the per-source mean: calibration = docs whose md5(doc_id)
    is even fit the source means and the (1 - 0.1)-quantile of absolute
    residuals (order statistic ceil((n_cal + 1) * 0.9)); the md5-odd half
    reports
    empirical coverage of mean +/- q — the distribution-free uncertainty
    wrapper modern pipelines bolt onto any point predictor.  Shape:
    per-source (sum, n) combiner on the calibration half; residual
    quantile via one more pass + driver order-stat pluck; coverage is a
    final filtered count."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def lens(b: pa.Table) -> pa.Table:
        out_s, out_d, out_n = [], [], []
        for d, t, src in zip(
            b.column("doc_id").to_pylist(),
            b.column("text").to_pylist(),
            b.column("source").to_pylist(),
        ):
            out_s.append(src)
            out_d.append(int(d))
            out_n.append(len(_oracle_tokens(t)))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "source": pa.array(out_s, pa.string()),
                "ntok": pa.array(out_n, pa.int64()),
            }
        )

    from ..stages.dedup import _stable_h64

    ld = docs.map_batches(lens, batch_format="pyarrow").materialize()
    cal = ld.filter(lambda r: _stable_h64(str(r["doc_id"])) % 2 == 0)
    mu = (
        cal.groupby("source")
        .aggregate(Sum("ntok"), Count())
        .to_pandas()
        .rename(columns={"sum(ntok)": "s", "count()": "n"})
    )
    mu["mu"] = mu["s"] / mu["n"]
    mu_ref = ray.put(dict(zip(mu["source"], mu["mu"])))

    def resid(b: pa.Table, _m=mu_ref) -> pa.Table:
        mm = ray.get(_m)
        df = b.to_pandas()
        r = np.abs(
            df["ntok"].to_numpy(np.float64)
            - df["source"].map(mm).to_numpy(np.float64)
        )
        return pa.table({"r": pa.array(np.sort(r), pa.float64())})

    res = np.sort(
        cal.map_batches(resid, batch_format="pyarrow").to_pandas()["r"].to_numpy()
    )
    n_cal = len(res)
    pos = int(np.ceil((n_cal + 1) * 0.9))
    qhat = float(res[min(pos, n_cal) - 1])

    test = ld.filter(lambda r: _stable_h64(str(r["doc_id"])) % 2 == 1)

    def cover(b: pa.Table, _m=mu_ref, _q=qhat) -> pa.Table:
        mm = ray.get(_m)
        df = b.to_pandas()
        r = np.abs(
            df["ntok"].to_numpy(np.float64)
            - df["source"].map(mm).to_numpy(np.float64)
        )
        return pa.table(
            {
                "c": pa.array([int((r <= _q).sum())], pa.int64()),
                "n": pa.array([len(df)], pa.int64()),
            }
        )

    agg = test.map_batches(cover, batch_format="pyarrow").sum(["c", "n"])
    cov, n_test = int(agg["sum(c)"]), int(agg["sum(n)"])
    return pd.DataFrame(
        {
            "n_cal": pd.array([n_cal], dtype="int64"),
            "n_test": pd.array([n_test], dtype="int64"),
            "q_hat": [float(_r(qhat, 6))],
            "coverage": [float(_r(cov / n_test, 6)) if n_test else float("nan")],
        }
    )


def q_white_test(sf_dir: str):
    """White heteroskedasticity test on the daily-volume linear trend:
    fit n_t ~ a + b*t by OLS, then the auxiliary regression of the
    squared residuals on (t, t^2); the statistic is n * R^2_aux ~
    chi^2(2) — "does variance drift over the crawl", deciding between
    q_ols_fit's plain SE and robust ones.  Shape: _daily_counts reduce;
    both regressions are closed-form sum algebra on the O(days) series,
    mirrored term-for-term."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 4:
        return pd.DataFrame(columns=["m_days", "r2_aux", "white_stat"]).astype(
            {"m_days": "int64", "r2_aux": "float64", "white_stat": "float64"}
        )
    t = np.arange(m, dtype=np.float64)
    # main OLS
    tb, xb = t.mean(), x.mean()
    b1 = float(((t - tb) * (x - xb)).sum() / ((t - tb) ** 2).sum())
    b0 = xb - b1 * tb
    e2 = (x - b0 - b1 * t) ** 2
    # aux OLS of e2 on (1, t, t2) via centered normal equations
    Z = np.column_stack([t, t * t])
    Zc = Z - Z.mean(axis=0)
    yc = e2 - e2.mean()
    g = np.linalg.solve(Zc.T @ Zc, Zc.T @ yc)
    ssr = float(((Zc @ g) ** 2).sum())
    sst = float((yc**2).sum())
    r2 = ssr / sst if sst > 0 else float("nan")
    stat = m * r2 if r2 == r2 else float("nan")
    return pd.DataFrame(
        {
            "m_days": pd.array([m], dtype="int64"),
            "r2_aux": [float(_r(r2, 6)) if r2 == r2 else float("nan")],
            "white_stat": [float(_r(stat, 6)) if stat == stat else float("nan")],
        }
    )


def q_kleinberg_bursts(sf_dir: str, gamma: float = 1.0):
    """Kleinberg-style 2-state burst scoring of the daily event volume:
    Poisson state costs c_t(s) = lambda_s - n_t * ln(lambda_s) with
    lambda_0 = the mean daily count and lambda_1 = 2 * lambda_0, forward
    min-cost recursion V_t(s) = c_t(s) + min(V_{t-1}(0) + gamma*[s=1],
    V_{t-1}(1)) (entering the burst state costs gamma), and per day the
    margin V_t(0) - V_t(1) — positive margin = the burst path is
    cheaper, the streaming burst flag.  Shape: _daily_counts reduce;
    the O(days) forward fold mirrors a recursive CTE."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m == 0:
        return pd.DataFrame(columns=["day", "n", "margin", "burst"]).astype(
            {"n": "int64", "burst": "int64", "day": "float64", "margin": "float64"}
        )
    lam0 = float(x.sum()) / m
    lam1 = 2.0 * lam0
    v0, v1 = 0.0, gamma  # state-1 start pays the entry cost
    margins = []
    for t in range(m):
        c0 = lam0 - x[t] * np.log(lam0)
        c1 = lam1 - x[t] * np.log(lam1)
        nv0 = c0 + min(v0, v1)
        nv1 = c1 + min(v0 + gamma, v1)
        v0, v1 = nv0, nv1
        margins.append(v0 - v1)
    out = pd.DataFrame(
        {
            "day": d["day"],
            "n": x.astype(np.int64),
            "margin": _r(np.array(margins), 6),
            "burst": (np.array(margins) > 0).astype(np.int64),
        }
    )
    return out.astype({"n": "int64", "burst": "int64"})


def q_pacf_profile(sf_dir: str):
    """Partial autocorrelation of the daily event volume at lags 1..3 via
    the Durbin-Levinson closed forms (phi11 = r1, phi22 = (r2 - r1^2) /
    (1 - r1^2), phi33 from the order-2 recursion) — the AR-order
    selector that q_acf_profile's raw correlations can't give (an AR(1)
    has phi22 ~ 0 even though r2 > 0).  Shape: _daily_counts reduce;
    the O(days) lag folds mirror acf's self-join chain."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 5:
        return pd.DataFrame(columns=["lag", "pacf"]).astype({"lag": "int64", "pacf": "float64"})
    mu = float(x.sum()) / m
    xc = x - mu
    den = float((xc * xc).sum())
    r = [1.0] + [float((xc[:-k] * xc[k:]).sum()) / den for k in (1, 2, 3)]
    phi11 = r[1]
    phi22 = (r[2] - r[1] ** 2) / (1.0 - r[1] ** 2)
    phi21 = phi11 - phi22 * phi11  # Durbin-Levinson order-2 first coeff
    num3 = r[3] - phi21 * r[2] - phi22 * r[1]
    den3 = 1.0 - phi21 * r[1] - phi22 * r[2]
    phi33 = num3 / den3 if den3 != 0 else float("nan")
    rows = [(1, float(_r(phi11, 6))), (2, float(_r(phi22, 6)))]
    if phi33 == phi33:
        rows.append((3, float(_r(phi33, 6))))
    return pd.DataFrame(rows, columns=["lag", "pacf"]).astype({"lag": "int64"})


def q_ar1_forecast(sf_dir: str):
    """AR(1) fit of the daily event volume by Yule-Walker (phi = r1,
    c = mu*(1-phi)), with the one-day-ahead forecast c + phi*x_m, the
    innovation variance var*(1-phi^2) and the shock half-life
    ln(2)/(-ln|phi|) — the minimal forecasting baseline q_holt_linear's
    trend smoother is judged against.  Shape: _daily_counts reduce;
    O(days) folds, lag self-join mirror."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 3:
        return pd.DataFrame(
            columns=["m_days", "phi", "c", "forecast", "innovation_var", "half_life"]
        ).astype({"m_days": "int64", "phi": "float64", "c": "float64", "forecast": "float64", "innovation_var": "float64", "half_life": "float64"})
    mu = float(x.sum()) / m
    xc = x - mu
    den = float((xc * xc).sum())
    var = den / m
    phi = float((xc[:-1] * xc[1:]).sum()) / den
    c = mu * (1.0 - phi)
    fc = c + phi * float(x[-1])
    iv = var * (1.0 - phi * phi)
    hl = (
        float(np.log(2.0) / (-np.log(abs(phi))))
        if 0 < abs(phi) < 1
        else float("nan")
    )
    return pd.DataFrame(
        {
            "m_days": pd.array([m], dtype="int64"),
            "phi": [float(_r(phi, 6))],
            "c": [float(_r(c, 6))],
            "forecast": [float(_r(fc, 6))],
            "innovation_var": [float(_r(iv, 6))],
            "half_life": [float(_r(hl, 6)) if hl == hl else float("nan")],
        }
    )


def q_huber_mean(sf_dir: str):
    """One-step Huber M-estimate of the event value's location per event
    type: start at the exact interpolated median, scale = 1.4826 * MAD
    (median absolute deviation, same exact-quantile machinery), clip
    residuals at c = 1.345 * scale and take mean(median + clipped) — the
    outlier-resistant mean the robust-statistics literature recommends
    over trimming.  Shape: two _group_interp_quantiles passes (median,
    then MAD via one residual pass reusing the bucket machinery inline)
    + one final clipped-mean combiner; O(types) cells move."""
    med = _group_interp_quantiles(sf_dir, (0.5,))
    med_map = {t: v for (t, _q), v in med.items()}
    m_ref = ray.put(med_map)
    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    # exact MAD per type: median of |x - med| via the same rank machinery,
    # realized as a keyed quantile pass over the residual column
    def absres(b: pa.Table, _m=m_ref) -> pa.Table:
        mm = ray.get(_m)
        df = b.to_pandas()
        r = np.abs(
            df["value"].to_numpy(np.float64)
            - df["event_type"].map(mm).to_numpy(np.float64)
        )
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], pa.string()),
                "r": pa.array(r, pa.float64()),
            }
        )

    res = ev.map_batches(absres, batch_format="pyarrow").materialize()
    # per-type exact interpolated median of r (types are few: per-group
    # driver pluck over the sorted O(group) arrays would not scale; reuse
    # the groupby-bucket pattern via map_groups + explicit interpolation)
    def med_of(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values("r").reset_index(drop=True)
        n = len(df)
        h = 0.5 * (n - 1)
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        v = df["r"].iloc[lo] + (h - lo) * (df["r"].iloc[hi] - df["r"].iloc[lo])
        return pa.table(
            {
                "event_type": pa.array([df["event_type"].iloc[0]], pa.string()),
                "mad": pa.array([float(v)], pa.float64()),
            }
        )

    mads = res.groupby("event_type").map_groups(med_of, batch_format="pyarrow").to_pandas()
    mad_map = dict(zip(mads["event_type"], mads["mad"]))
    s_ref = ray.put(mad_map)

    def clipped(b: pa.Table, _m=m_ref, _s=s_ref) -> pa.Table:
        mm, sm = ray.get(_m), ray.get(_s)
        df = b.to_pandas()
        med_v = df["event_type"].map(mm).to_numpy(np.float64)
        scale = 1.4826 * df["event_type"].map(sm).to_numpy(np.float64)
        c = 1.345 * scale
        r = df["value"].to_numpy(np.float64) - med_v
        df["cl"] = np.clip(r, -c, c)
        g = df.groupby("event_type", as_index=False).agg(
            s=("cl", "sum"), n=("cl", "size")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ev.map_batches(clipped, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(n)": "n"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["median"] = [float(_r(med_map[t], 6)) for t in out["event_type"]]
    out["mad"] = [float(_r(mad_map[t], 6)) for t in out["event_type"]]
    out["huber_mean"] = [
        float(_r(med_map[t] + s / n, 6))
        for t, s, n in zip(out["event_type"], out["s"], out["n"])
    ]
    return out[["event_type", "median", "mad", "huber_mean"]]


def q_median_polish(sf_dir: str, iters: int = 2):
    """Tukey median polish of the (source x lang) document-count table:
    alternately sweep out row then column medians for 2 iterations,
    reporting the overall effect, row/column effects and the residual
    grand absolute sum — the robust two-way decomposition behind
    exploratory contingency analysis.  Shape: one (source, lang) count
    combiner; the polish runs on the O(10 x 5) grid driver-side,
    mirrored with per-iteration median window CTEs."""
    docs = _read(sf_dir, "documents", columns=["source", "lang"])
    cells = (
        docs.groupby(["source", "lang"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
    )
    grid = cells.pivot_table(
        index="source", columns="lang", values="n", fill_value=0
    ).astype(float)
    srcs = sorted(grid.index)
    langs = sorted(grid.columns)
    grid = grid.loc[srcs, langs]
    overall = 0.0
    row_eff = pd.Series(0.0, index=srcs)
    col_eff = pd.Series(0.0, index=langs)
    resid = grid.copy()
    for _ in range(iters):
        rm = resid.median(axis=1)
        resid = resid.sub(rm, axis=0)
        row_eff += rm
        cm = col_eff.median()
        col_eff -= cm
        overall += cm
        colm = resid.median(axis=0)
        resid = resid.sub(colm, axis=1)
        col_eff += colm
        rm2 = row_eff.median()
        row_eff -= rm2
        overall += rm2
    rows = [("__overall__", "", float(_r(overall, 6)))]
    rows += [("row", s, float(_r(row_eff[s], 6))) for s in srcs]
    rows += [("col", l, float(_r(col_eff[l], 6))) for l in langs]
    rows.append(
        ("__resid_abs__", "", float(_r(float(resid.abs().values.sum()), 6)))
    )
    return pd.DataFrame(rows, columns=["kind", "key", "effect"])


def q_bhattacharyya(sf_dir: str, bins: int = 16):
    """Bhattacharyya distance between the purchase-value distributions of
    the two user cohorts (g = user_id % 2): histogram both on 16 shared
    equal-width bins over the global [min, max], BC = sum sqrt(p_i*q_i)
    (bin-ascending fold), distance = -ln BC — the overlap-based
    distribution distance that complements q_ks_drift (sup-gap) and
    q_wasserstein_drift (transport).  Shape: one global min/max
    aggregate, one (g, bin) count combiner, O(bins) fold driver-side."""
    from ray.data.aggregate import Max, Min

    ev = _read(sf_dir, "events", columns=["user_id", "value", "event_type"])
    pur = ev.filter(lambda r: r["event_type"] == "purchase").materialize()
    mm = pur.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0

    def binned(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        v = df["value"].to_numpy(np.float64)
        bi = np.minimum(((v - lo) / span * bins).astype(np.int64), bins - 1)
        g = (df["user_id"].to_numpy() % 2).astype(np.int64)
        t = pd.DataFrame({"g": g, "bin": bi})
        out = t.groupby(["g", "bin"], as_index=False).size()
        out["n"] = out["size"].astype(np.int64)
        return pa.Table.from_pandas(out[["g", "bin", "n"]], preserve_index=False)

    cells = (
        pur.map_batches(binned, batch_format="pyarrow")
        .groupby(["g", "bin"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    tot = cells.groupby("g")["n"].sum()
    bc = 0.0
    for bi in range(bins):  # bin-ascending fold
        p = float(
            cells.loc[(cells["g"] == 0) & (cells["bin"] == bi), "n"].sum()
        ) / float(tot.get(0, 1))
        qq = float(
            cells.loc[(cells["g"] == 1) & (cells["bin"] == bi), "n"].sum()
        ) / float(tot.get(1, 1))
        bc += float(np.sqrt(p * qq))
    dist = -float(np.log(bc)) if bc > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_bins": pd.array([bins], dtype="int64"),
            "bc_coeff": [float(_r(bc, 6))],
            "bhattacharyya": [float(_r(dist, 6)) if dist == dist else float("nan")],
        }
    )


def q_target_encoding(sf_dir: str, m: float = 10.0):
    """Smoothed target encoding of `source` against the Gopher keep
    verdict: enc = (n_s * mean_s + m * prior) / (n_s + m) with m = 10
    virtual prior rows — the leakage-aware categorical feature every
    tabular pipeline builds (the smoothing keeps rare categories near
    the prior).  Shape: one (source, keeps, n) combiner; prior is the
    global ratio of the same cells; O(sources) rows move."""
    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def cells(b: pa.Table) -> pa.Table:
        from collections import defaultdict

        acc = defaultdict(lambda: [0, 0])
        for src, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            a = acc[src]
            a[0] += _gopher_stats(_oracle_tokens(t))[4]
            a[1] += 1
        srcs = sorted(acc)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "k": pa.array([acc[s][0] for s in srcs], pa.int64()),
                "n": pa.array([acc[s][1] for s in srcs], pa.int64()),
            }
        )

    out = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("k"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(k)": "k", "sum(n)": "n"})
        .sort_values("source")
        .reset_index(drop=True)
    )
    prior = float(out["k"].sum()) / float(out["n"].sum())
    out["keep_rate"] = _r(out["k"] / out["n"], 6)
    out["encoding"] = _r(
        (out["n"] * (out["k"] / out["n"]) + m * prior) / (out["n"] + m), 6
    )
    out["n_docs"] = out["n"].astype("int64")
    return out[["source", "n_docs", "keep_rate", "encoding"]]


def q_boosted_stumps(sf_dir: str, rounds: int = 2, lr: float = 0.5):
    """Two rounds of L2 gradient boosting with depth-1 stumps: predict
    the per-doc token count from n_chars; candidate splits are the 8
    interpolated octile thresholds of n_chars, each round picks the
    split minimizing SSE on the current residuals (threshold-ascending
    tie rule) and adds lr * the leaf means — the distributed-GBM round
    primitive (per-candidate sufficient statistics in ONE combiner pass
    per round).  Reports each round's split, leaf values and the
    training MSE after the round."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def feats(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": pa.array(
                    b.column("n_chars").to_numpy().astype(np.float64), pa.float64()
                ),
                "y": pa.array(
                    [float(len(_oracle_tokens(t))) for t in b.column("text").to_pylist()],
                    pa.float64(),
                ),
            }
        )

    fd = docs.map_batches(feats, batch_format="pyarrow").materialize()
    # octile thresholds of x (global, interpolated on the sorted sample —
    # x is int-valued n_chars so an exact driver quantile over the small
    # distinct-value histogram is partition-stable)
    hist = (
        fd.groupby("x").count().to_pandas().rename(columns={"count()": "n"})
        .sort_values("x").reset_index(drop=True)
    )
    xs = np.repeat(hist["x"].to_numpy(np.float64), hist["n"].to_numpy(np.int64))
    qs = [np.quantile(xs, q / 8.0) for q in range(1, 8)]
    thresholds = sorted(set(float(_r(q, 6)) for q in qs))
    base = float(fd.sum("y")) / fd.count()
    pred_state = {"base": base, "splits": []}
    rows = []
    for rd in range(rounds):
        st_ref = ray.put((pred_state["base"], list(pred_state["splits"]), thresholds))

        def stats(b: pa.Table, _s=st_ref) -> pa.Table:
            base_, splits_, ths = ray.get(_s)
            x = b.column("x").to_numpy()
            y = b.column("y").to_numpy()
            pred = np.full(len(x), base_)
            for thr, lo_v, hi_v in splits_:
                pred += np.where(x <= thr, lo_v, hi_v)
            r = y - pred
            out_t, out_side, out_s, out_ss, out_n = [], [], [], [], []
            for ti, thr in enumerate(ths):
                left = x <= thr
                for side, mask in ((0, left), (1, ~left)):
                    out_t.append(ti)
                    out_side.append(side)
                    out_s.append(float(r[mask].sum()))
                    out_ss.append(float((r[mask] ** 2).sum()))
                    out_n.append(int(mask.sum()))
            return pa.table(
                {
                    "ti": pa.array(out_t, pa.int64()),
                    "side": pa.array(out_side, pa.int64()),
                    "s": pa.array(out_s, pa.float64()),
                    "ss": pa.array(out_ss, pa.float64()),
                    "n": pa.array(out_n, pa.int64()),
                }
            )

        cells = (
            fd.map_batches(stats, batch_format="pyarrow")
            .groupby(["ti", "side"])
            .aggregate(Sum("s"), Sum("ss"), Sum("n"))
            .to_pandas()
            .rename(columns={"sum(s)": "s", "sum(ss)": "ss", "sum(n)": "n"})
        )
        best = None
        for ti in range(len(thresholds)):  # threshold-ascending tie rule
            l = cells[(cells["ti"] == ti) & (cells["side"] == 0)]
            r_ = cells[(cells["ti"] == ti) & (cells["side"] == 1)]
            if l.empty or r_.empty or int(l["n"]) == 0 or int(r_["n"]) == 0:
                continue
            sl, nl = float(l["s"]), float(l["n"])
            sr, nr = float(r_["s"]), float(r_["n"])
            ssl, ssr = float(l["ss"]), float(r_["ss"])
            sse = (ssl - sl * sl / nl) + (ssr - sr * sr / nr)
            if best is None or sse < best[0] - 1e-9:
                best = (sse, ti, sl / nl, sr / nr, ssl + ssr, nl + nr)
        sse, ti, ml, mr, ss_tot, n_tot = best
        lo_v, hi_v = lr * ml, lr * mr
        pred_state["splits"].append((thresholds[ti], lo_v, hi_v))
        # training MSE after this round, computed exactly from the same cells
        # relation: new residual ss = old ss - 2*lr*(s*mean) + lr^2*mean^2*n
        new_ss = (
            ss_tot
            - 2 * lr * (ml * float(cells[(cells["ti"] == ti) & (cells["side"] == 0)]["s"]))
            - 2 * lr * (mr * float(cells[(cells["ti"] == ti) & (cells["side"] == 1)]["s"]))
            + lr * lr * ml * ml * float(cells[(cells["ti"] == ti) & (cells["side"] == 0)]["n"])
            + lr * lr * mr * mr * float(cells[(cells["ti"] == ti) & (cells["side"] == 1)]["n"])
        )
        rows.append(
            (
                rd + 1,
                float(_r(thresholds[ti], 6)),
                float(_r(lo_v, 6)),
                float(_r(hi_v, 6)),
                float(_r(new_ss / n_tot, 6)),
            )
        )
    return pd.DataFrame(
        rows, columns=["round", "threshold", "left_add", "right_add", "train_mse"]
    ).astype({"round": "int64"})


def q_lindley_queue(sf_dir: str, service_s: float = 1800.0):
    """Lindley-recursion queue replay of the purchase stream through one
    server with a fixed 1800 s service time: W_1 = 0, W_{n+1} = max(0,
    W_n + S - A_n) with A_n the interarrival gap (ts order, event_id
    tie-break) — exact FIFO waiting times, reported as n, the busy
    fraction (W > 0), mean and max wait — the capacity-planning replay
    behind q_leaky_bucket_replay's token view.  Shape: one sorted
    O(purchases) arrival series folds driver-side (arrivals are already
    a tiny fraction of the stream), recursive-CTE mirror."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def arr(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"] == "purchase"]
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(np.int64)),
                "us": pa.array(
                    df["ts"].to_numpy("datetime64[us]").astype("int64")
                ),
            }
        )

    a = (
        ev.map_batches(arr, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["us", "event_id"])
        .reset_index(drop=True)
    )
    us = a["us"].to_numpy(np.float64) / 1e6
    n = len(us)
    if n == 0:
        return pd.DataFrame(
            columns=["n_jobs", "busy_frac", "mean_wait_s", "max_wait_s"]
        ).astype({"n_jobs": "int64", "busy_frac": "float64", "mean_wait_s": "float64", "max_wait_s": "float64"})
    w = 0.0
    tot = mx = 0.0
    busy = 0
    for i in range(n):
        if i > 0:
            gap = us[i] - us[i - 1]
            w = max(0.0, w + service_s - gap)
        tot += w
        mx = max(mx, w)
        if w > 0:
            busy += 1
    return pd.DataFrame(
        {
            "n_jobs": pd.array([n], dtype="int64"),
            "busy_frac": [float(_r(busy / n, 6))],
            "mean_wait_s": [float(_r(tot / n, 6))],
            "max_wait_s": [float(_r(mx, 6))],
        }
    )


def q_referential_audit(sf_dir: str):
    """Referential-integrity audit of the orders/lineitem star: orphan
    lineitems (orderkey absent from orders), childless orders (no
    lineitem), customers referenced by orders but missing from customer
    — the ingestion data-quality gate a 100-TB load runs before
    publishing a snapshot.  Shape: key sets reduce to distinct-key
    combiners; the two anti-joins run as broadcast membership filters
    (at web scale: the seen-shard anti-join); only counts move."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    okeys = set(
        orders.groupby("o_orderkey").count().to_pandas()["o_orderkey"].astype(int)
    )
    ckeys = set(
        _read(sf_dir, "customer", columns=["c_custkey"])
        .groupby("c_custkey")
        .count()
        .to_pandas()["c_custkey"]
        .astype(int)
    )
    o_ref = ray.put(okeys)
    c_ref = ray.put(ckeys)
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def orphan(b: pa.Table, _o=o_ref) -> pa.Table:
        ok = ray.get(_o)
        lk = b.column("l_orderkey").to_numpy()
        bad = sum(1 for x in lk if int(x) not in ok)
        u = np.unique(lk)
        return pa.table(
            {
                "orphan_lines": pa.array([bad], pa.int64()),
                "keys": pa.array([u.astype(np.int64)], pa.list_(pa.int64())),
            }
        )

    parts = li.map_batches(orphan, batch_format="pyarrow").to_pandas()
    orphan_lines = int(parts["orphan_lines"].sum())
    li_keys = set()
    for ks in parts["keys"]:
        li_keys.update(int(x) for x in ks)
    childless = len(okeys - li_keys)

    def badcust(b: pa.Table, _c=c_ref) -> pa.Table:
        ck = ray.get(_c)
        cu = b.column("o_custkey").to_numpy()
        bad = sum(1 for x in cu if int(x) not in ck)
        return pa.table({"n": pa.array([bad], pa.int64())})

    missing_cust = int(orders.map_batches(badcust, batch_format="pyarrow").sum("n"))
    return pd.DataFrame(
        {
            "orphan_lineitems": pd.array([orphan_lines], dtype="int64"),
            "childless_orders": pd.array([childless], dtype="int64"),
            "orders_missing_customer": pd.array([missing_cust], dtype="int64"),
        }
    )


def q_pettitt_bh(sf_dir: str, q_fdr: float = 0.1):
    """Per-event-type Pettitt changepoint tests with Benjamini-Hochberg
    FDR control: each type's daily series gets the tie-adjusted rank
    statistic and approximate p (as q_pettitt_test); p-values rank
    ascending (type tie-break) and a type is significant when p <=
    (rank/m) * 0.1 up to the largest such rank — the multiple-testing
    discipline any per-segment drift screen needs.  Shape: one
    (type, day) count combiner; O(types x days) rank folds driver-side."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "t": b.column("event_type")})
        )
        return (
            df.with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by(["t", "day"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    cells = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby(["t", "day"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    rows = []
    for t in sorted(cells["t"].unique()):
        g = cells[cells["t"] == t].sort_values("day").reset_index(drop=True)
        # zero-fill absent days within the type's own observed range? No:
        # use the GLOBAL day grid so types with quiet days rank correctly
        days = sorted(cells["day"].unique())
        x = (
            g.set_index("day")["n"].reindex(days, fill_value=0).to_numpy(np.float64)
        )
        m = len(x)
        if m < 2:
            continue
        r = pd.Series(x).rank(method="average").to_numpy(np.float64)
        u = 2.0 * np.cumsum(r) - np.arange(1, m + 1, dtype=np.float64) * (m + 1)
        u = u[:-1]
        kstat = float(np.abs(u).max())
        t_star = int(np.argmax(np.abs(u)))
        p = min(1.0, 2.0 * float(np.exp(-6.0 * kstat**2 / (m**3 + m**2))))
        rows.append((t, days[t_star], kstat, p))
    rows.sort(key=lambda x: (x[3], x[0]))
    mtests = len(rows)
    # BH step-up: largest k with p_(k) <= k/m * q
    kmax = 0
    for i, (_t, _d, _k, p) in enumerate(rows, start=1):
        if p <= i / mtests * q_fdr:
            kmax = i
    return pd.DataFrame(
        {
            "event_type": [r_[0] for r_ in rows],
            "change_day": [r_[1] for r_ in rows],
            "k_stat": [float(_r(r_[2], 6)) for r_ in rows],
            "p_approx": [float(_r(r_[3], 6)) for r_ in rows],
            "bh_rank": pd.array(range(1, mtests + 1), dtype="int64"),
            "significant": pd.array(
                [1 if i <= kmax else 0 for i in range(1, mtests + 1)], dtype="int64"
            ),
        }
    )


def q_geometric_median(sf_dir: str, iters: int = 2, label: int = 0):
    """Weiszfeld geometric median of the label-0 embedding cluster: two
    iterations c <- sum(x/||x-c||) / sum(1/||x-c||) from the arithmetic
    mean (coincident points excluded per iteration) — the
    outlier-robust centroid whose k-medoid cousin q_medoid_per_label
    restricts to corpus members.  Reports the final per-dimension
    checksum (sum of coordinates), the mean residual distance, and n.
    Shape: each iteration is ONE map_batches pass with the broadcast
    64-dim centre; only (weighted-sum vector, weight) partials fold."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    sub = emb.filter(lambda r, _l=label: r["label"] == _l).materialize()

    def mean_part(b: pa.Table) -> pa.Table:
        X = _emb_matrix(b)
        return pa.table(
            {
                "s": pa.array([X.sum(axis=0)], pa.list_(pa.float64())),
                "n": pa.array([len(X)], pa.int64()),
            }
        )

    parts = sub.map_batches(mean_part, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    c = np.sum(np.stack(parts["s"].to_numpy()), axis=0) / n
    for _ in range(iters):
        c_ref = ray.put(c)

        def wpart(b: pa.Table, _c=c_ref) -> pa.Table:
            cc = ray.get(_c)
            X = _emb_matrix(b)
            d = np.sqrt(((X - cc) ** 2).sum(axis=1))
            keep = d > 0
            w = 1.0 / d[keep]
            return pa.table(
                {
                    "ws": pa.array([(X[keep] * w[:, None]).sum(axis=0)], pa.list_(pa.float64())),
                    "w": pa.array([float(w.sum())], pa.float64()),
                }
            )

        pp = sub.map_batches(wpart, batch_format="pyarrow").to_pandas()
        wtot = float(pp["w"].sum())
        c = np.sum(np.stack(pp["ws"].to_numpy()), axis=0) / wtot
    c_ref = ray.put(c)

    def resid(b: pa.Table, _c=c_ref) -> pa.Table:
        cc = ray.get(_c)
        X = _emb_matrix(b)
        d = np.sqrt(((X - cc) ** 2).sum(axis=1))
        return pa.table(
            {
                "s": pa.array([float(d.sum())], pa.float64()),
                "n": pa.array([len(X)], pa.int64()),
            }
        )

    rr = sub.map_batches(resid, batch_format="pyarrow").sum(["s", "n"])
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype="int64"),
            "coord_sum": [float(_r(float(c.sum()), 6))],
            "mean_dist": [float(_r(float(rr["sum(s)"]) / n, 6))],
        }
    )


def q_otsu_threshold(sf_dir: str, bins: int = 32):
    """Otsu's threshold on the document token-count histogram: the
    32-equal-width-bin cut maximizing between-class variance
    w0*w1*(mu0-mu1)^2 (lowest bin index on ties) — the classic
    parameter-free bimodality splitter, here separating short from long
    docs without hand-picking a length rule.  Shape: one histogram
    combiner over [min, max]; the O(bins) prefix scan runs driver-side,
    mirrored with cumulative window sums."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def lens(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.array(
                    [len(_oracle_tokens(t)) for t in b.column("text").to_pylist()],
                    pa.int64(),
                )
            }
        )

    ld = docs.map_batches(lens, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max, Min

    mm = ld.aggregate(Min("n"), Max("n"))
    lo, hi = float(mm["min(n)"]), float(mm["max(n)"])
    span = (hi - lo) or 1.0

    def binned(b: pa.Table) -> pa.Table:
        v = b.column("n").to_numpy().astype(np.float64)
        bi = np.minimum(np.floor((v - lo) / span * bins).astype(np.int64), bins - 1)
        vals, cnts = np.unique(bi, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(vals, pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
                "vsum": pa.array(
                    [float(v[bi == x].sum()) for x in vals], pa.float64()
                ),
            }
        )

    hist = (
        ld.map_batches(binned, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("cnt"), Sum("vsum"))
        .to_pandas()
        .rename(columns={"sum(cnt)": "cnt", "sum(vsum)": "vsum"})
        .set_index("bin")
        .reindex(range(bins), fill_value=0)
    )
    c = hist["cnt"].to_numpy(np.float64)
    s = hist["vsum"].to_numpy(np.float64)
    n_tot, s_tot = float(c.sum()), float(s.sum())
    best = None
    cum_c = cum_s = 0.0
    for t in range(bins - 1):  # threshold AFTER bin t
        cum_c += c[t]
        cum_s += s[t]
        if cum_c == 0 or cum_c == n_tot:
            continue
        w0 = cum_c / n_tot
        mu0 = cum_s / cum_c
        mu1 = (s_tot - cum_s) / (n_tot - cum_c)
        bc = w0 * (1 - w0) * (mu0 - mu1) ** 2
        if best is None or bc > best[0] + 1e-12:
            best = (bc, t)
    bc, t = best
    thr = lo + (t + 1) * span / bins
    return pd.DataFrame(
        {
            "bin": pd.array([t], dtype="int64"),
            "threshold": [float(_r(thr, 6))],
            "between_var": [float(_r(bc, 6))],
        }
    )


def q_feature_mi(sf_dir: str, bins: int = 8):
    """Mutual-information feature ranking against the Gopher keep label:
    each candidate feature (token count, unique-token ratio, mean word
    length) is octile-binned (equal-width over its own [min, max]) and
    scored I(feature; keep) = sum p(b,y) ln(p(b,y)/(p(b)p(y))) in
    (bin, y)-ascending fold order — the model-free feature-selection
    step before training a quality classifier.  Shape: one tokenize
    pass emits all three features + label; per-feature min/max and
    (feature, bin, y) cells are combiners; the O(3 x 8 x 2) MI fold is
    driver-side."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def feats(b: pa.Table) -> pa.Table:
        rows = []
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            n = len(toks)
            uniq = len(set(toks)) / n if n else 0.0
            mwl = sum(len(w) for w in toks) / n if n else 0.0
            keep = _gopher_stats(toks)[4]
            rows.append((float(n), uniq, mwl, keep))
        return pa.table(
            {
                "ntok": pa.array([r[0] for r in rows], pa.float64()),
                "uniq": pa.array([r[1] for r in rows], pa.float64()),
                "mwl": pa.array([r[2] for r in rows], pa.float64()),
                "keep": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    fd = docs.map_batches(feats, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max, Min

    mm = fd.aggregate(
        Min("ntok"), Max("ntok"), Min("uniq"), Max("uniq"), Min("mwl"), Max("mwl")
    )
    ranges = {
        f: (float(mm[f"min({f})"]), float(mm[f"max({f})"]))
        for f in ("ntok", "uniq", "mwl")
    }
    r_ref = ray.put(ranges)

    def cells(b: pa.Table, _r=r_ref) -> pa.Table:
        rg = ray.get(_r)
        df = b.to_pandas()
        out = []
        for f in ("ntok", "uniq", "mwl"):
            lo, hi = rg[f]
            span = (hi - lo) or 1.0
            bi = np.minimum(
                np.floor((df[f].to_numpy() - lo) / span * bins).astype(np.int64),
                bins - 1,
            )
            t = pd.DataFrame({"feature": f, "bin": bi, "y": df["keep"].to_numpy()})
            out.append(t.groupby(["feature", "bin", "y"], as_index=False).size())
        g = pd.concat(out, ignore_index=True)
        g["n"] = g["size"].astype(np.int64)
        return pa.Table.from_pandas(
            g[["feature", "bin", "y", "n"]], preserve_index=False
        )

    cc = (
        fd.map_batches(cells, batch_format="pyarrow")
        .groupby(["feature", "bin", "y"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    n_tot = float(cc.loc[cc["feature"] == "ntok", "n"].sum())
    rows = []
    for f in ("mwl", "ntok", "uniq"):
        sub = cc[cc["feature"] == f]
        pb = sub.groupby("bin")["n"].sum() / n_tot
        py = sub.groupby("y")["n"].sum() / n_tot
        mi = 0.0
        for (bi, y), nn in (
            sub.set_index(["bin", "y"])["n"].sort_index().items()
        ):  # (bin, y)-ascending fold
            pxy = nn / n_tot
            mi += pxy * np.log(pxy / (pb[bi] * py[y]))
        rows.append((f, float(_r(mi, 6))))
    out = pd.DataFrame(rows, columns=["feature", "mi"]).sort_values("feature")
    return out.reset_index(drop=True)


def q_hash_uniformity(sf_dir: str, buckets: int = 256):
    """Hash-quality audit of md5-low64 over the distinct user-id keys:
    split the 2^64 range into 256 equal buckets and report the boundary
    KS statistic max|F_emp(boundary) - F_unif(boundary)|, the bucket
    count CV, and the chi-squared against uniform — the sanity gate
    before trusting a hash for partitioning (q_shard_balance's skew
    readout, but against the ideal CDF).  Shape: one distinct-key
    combiner, one vectorized bucket pass, O(256) fold driver-side."""
    from ..stages.dedup import _stable_h64

    ev = _read(sf_dir, "events", columns=["user_id"])
    users = ev.groupby("user_id").count().select_columns(["user_id"])

    def bucketize(b: pa.Table) -> pa.Table:
        hs = np.array(
            [_stable_h64(str(int(u))) for u in b.column("user_id").to_pylist()],
            dtype=np.uint64,
        )
        bi = (hs >> np.uint64(56)).astype(np.int64)  # top 8 bits = 256 buckets
        vals, cnts = np.unique(bi, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(vals, pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        users.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .set_index("bucket")
        .reindex(range(buckets), fill_value=0)
    )
    c = hist["n"].to_numpy(np.float64)
    n = float(c.sum())
    emp = np.cumsum(c) / n
    unif = (np.arange(buckets, dtype=np.float64) + 1.0) / buckets
    ks = float(np.abs(emp - unif).max())
    mu = n / buckets
    cv = float(np.sqrt(((c - mu) ** 2).mean()) / mu)
    chi2 = float((((c - mu) ** 2) / mu).sum())
    return pd.DataFrame(
        {
            "n_keys": pd.array([int(n)], dtype="int64"),
            "ks_boundary": [float(_r(ks, 6))],
            "bucket_cv": [float(_r(cv, 6))],
            "chi2": [float(_r(chi2, 6))],
        }
    )


def q_lof_outliers(sf_dir: str, k: int = 3, topn: int = 5):
    """Local Outlier Factor (k=3) over the embedding corpus: reach-dist
    based local density ratios, reporting the topn highest-LOF points —
    the density-aware anomaly score that flags points whose
    neighborhood is sparser than their neighbors' (a global distance
    cutoff can't).  kNN sets break ties by (distance, vec_id).  Shape:
    the corpus broadcasts once; each batch computes its kNN block and
    emits (point, neighbor, dist) triples; k-distances broadcast back
    for the reach-dist pass — three passes, O(n*k) rows ever shuffled."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    _guard_brute_corpus(emb.count(), "lof_outliers")
    rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], np.float64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    ref = ray.put((X, ids))

    def knn(b: pa.Table) -> pa.Table:
        X_, ids_ = ray.get(ref)
        Q = _emb_matrix(b)
        qid = b.column("vec_id").to_numpy()
        d2 = ((Q[:, None, :] - X_[None, :, :]) ** 2).sum(axis=2)
        d2[qid[:, None] == ids_[None, :]] = np.inf
        out_p, out_o, out_d = [], [], []
        for i in range(len(Q)):
            order = np.argsort(d2[i], kind="stable")[:k]  # stable = vec_id ties
            for j in order:
                out_p.append(int(qid[i]))
                out_o.append(int(ids_[j]))
                out_d.append(float(np.sqrt(d2[i, j])))
        return pa.table(
            {
                "p": pa.array(out_p, pa.int64()),
                "o": pa.array(out_o, pa.int64()),
                "d": pa.array(out_d, pa.float64()),
            }
        )

    nn = emb.map_batches(knn, batch_format="pyarrow").to_pandas()
    kdist = nn.groupby("p")["d"].max().to_dict()  # k-distance per point
    nn["reach"] = np.maximum(nn["o"].map(kdist).to_numpy(), nn["d"].to_numpy())
    lrd = (k / nn.groupby("p")["reach"].sum()).to_dict()
    nn["lrd_o"] = nn["o"].map(lrd)
    nn["lrd_p"] = nn["p"].map(lrd)
    lof = (nn.groupby("p")
           .apply(lambda g: float((g["lrd_o"] / g["lrd_p"]).sum() / k), include_groups=False)
           .rename("lof").reset_index())
    lof["lof"] = _r(lof["lof"], 6)
    out = lof.sort_values(["lof", "p"], ascending=[False, True]).head(topn)
    out = out.rename(columns={"p": "vec_id"}).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "vec_id", "lof"]].astype({"vec_id": "int64"})


def q_dbscan_cores(sf_dir: str, eps: float = 4.0, min_pts: int = 4):
    """DBSCAN point census over the embedding corpus at eps = 4,
    minPts = 4: core points (>= minPts neighbors within eps, self
    included), border points (non-core within eps of a core) and noise
    — the density classification that precedes any DBSCAN clustering
    run and is itself the standard "how much of this corpus is
    clusterable" readout.  Shape: corpus broadcast; pass 1 counts eps-
    neighborhoods per batch, the core-id set broadcasts back for the
    border pass; only three counters fold."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    _guard_brute_corpus(emb.count(), "dbscan_cores")
    rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], np.float64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    ref = ray.put((X, ids))

    def nbrs(b: pa.Table) -> pa.Table:
        X_, ids_ = ray.get(ref)
        Q = _emb_matrix(b)
        qid = b.column("vec_id").to_numpy()
        d2 = ((Q[:, None, :] - X_[None, :, :]) ** 2).sum(axis=2)
        cnt = (d2 <= eps * eps).sum(axis=1)  # includes self (d=0)
        return pa.table(
            {
                "vec_id": pa.array(qid.astype(np.int64)),
                "n_nbr": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = emb.map_batches(nbrs, batch_format="pyarrow").to_pandas()
    core_ids = set(
        int(v) for v, n in zip(counts["vec_id"], counts["n_nbr"]) if n >= min_pts
    )
    c_ref = ray.put(core_ids)

    def border(b: pa.Table, _c=c_ref) -> pa.Table:
        cores = ray.get(_c)
        X_, ids_ = ray.get(ref)
        core_mask = np.array([int(x) in cores for x in ids_])
        Q = _emb_matrix(b)
        qid = b.column("vec_id").to_numpy()
        d2 = ((Q[:, None, :] - X_[None, :, :]) ** 2).sum(axis=2)
        near_core = (d2[:, core_mask] <= eps * eps).any(axis=1)
        is_core = np.array([int(x) in cores for x in qid])
        is_border = near_core & ~is_core
        return pa.table(
            {
                "core": pa.array([int(is_core.sum())], pa.int64()),
                "border": pa.array([int(is_border.sum())], pa.int64()),
                "n": pa.array([len(qid)], pa.int64()),
            }
        )

    agg = emb.map_batches(border, batch_format="pyarrow").sum(["core", "border", "n"])
    core, brd, n = int(agg["sum(core)"]), int(agg["sum(border)"]), int(agg["sum(n)"])
    return pd.DataFrame(
        {
            "n_points": pd.array([n], dtype="int64"),
            "core": pd.array([core], dtype="int64"),
            "border": pd.array([brd], dtype="int64"),
            "noise": pd.array([n - core - brd], dtype="int64"),
        }
    )


def q_krippendorff_alpha(sf_dir: str):
    """Krippendorff's alpha (nominal, 2 raters) between the labelled lang
    column and the langid prediction: alpha = 1 - Do/De with observed
    disagreement Do = the fraction of mismatching pairs within units and
    expected De from the pooled value marginals (n_total*(n_total-1)
    pairable values) — the agreement coefficient that, unlike
    q_langid_kappa, generalizes to missing data and many raters.
    Shape: reuses the confusion-matrix combiner; the O(langs^2) fold is
    driver-side; the SQL nests the langid oracle."""
    from .q_text import q_langid_confusion  # explicit cross-family dep
    cm = q_langid_confusion(sf_dir).to_pandas()
    n_units = float(cm["cnt"].sum())
    # each unit contributes 2 values; within-unit pair disagreement is
    # 1 when the two raters differ (2 ordered pairs / 2 values - 1 norm)
    do = float(cm.loc[cm["lang"] != cm["lang_pred"], "cnt"].sum()) / n_units
    # pooled value counts across both raters
    vals = pd.concat(
        [
            cm.groupby("lang")["cnt"].sum(),
            cm.groupby("lang_pred")["cnt"].sum(),
        ],
        axis=1,
    ).fillna(0)
    nc = (vals.iloc[:, 0] + vals.iloc[:, 1]).sort_index()
    n_vals = float(nc.sum())
    de = 0.0
    for c, cnt in nc.items():  # value-ascending fold
        de += float(cnt) * (n_vals - float(cnt))
    de /= n_vals * (n_vals - 1.0)
    alpha = 1.0 - do / de if de > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_units": pd.array([int(n_units)], dtype="int64"),
            "d_observed": [float(_r(do, 6))],
            "d_expected": [float(_r(de, 6))],
            "alpha": [float(_r(alpha, 6)) if alpha == alpha else float("nan")],
        }
    )


def q_quantile_treatment_effect(sf_dir: str):
    """Quantile treatment effects on purchase value between the user
    cohorts (g = user_id % 2): the difference of exact interpolated
    p25/p50/p90 between treatment and control — where the distributional
    shift lives when means (q_diff_in_diff) hide it.  Shape: the
    order-preserving bucket two-pass per cohort (same machinery as
    _group_interp_quantiles, keyed by cohort); O(2 x 3) plucked order
    stats reach the driver."""
    qs = (0.25, 0.5, 0.9)
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value", "event_type"])

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"] == "purchase"]
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(np.int64)),
                "g": pa.array((df["user_id"].to_numpy() % 2).astype(np.int64)),
                "value": pa.array(df["value"].to_numpy(np.float64), pa.float64()),
            }
        )

    kd = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max, Min

    mm = kd.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0

    def bucketed(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        bkt = np.minimum(((v - lo) / span * 64).astype(np.int64), 63)
        return b.append_column("bkt", pa.array(bkt, pa.int64()))

    kb = kd.map_batches(bucketed, batch_format="pyarrow").materialize()
    bc = (
        kb.groupby(["g", "bkt"])
        .count()
        .to_pandas()
        .sort_values(["g", "bkt"])
    )
    bc["offset"] = bc.groupby("g")["count()"].cumsum() - bc["count()"]
    offsets = {
        (int(g), int(b)): int(o)
        for g, b, o in zip(bc["g"], bc["bkt"], bc["offset"])
    }
    totals = bc.groupby("g")["count()"].sum().astype(int).to_dict()
    targets = {}
    for g, n in totals.items():
        want = set()
        for q in qs:
            h = q * (n - 1)
            want.add(int(np.floor(h)))
            want.add(int(np.ceil(h)))
        targets[int(g)] = want
    meta = ray.put((offsets, targets))

    def pluck(g: pa.Table) -> pa.Table:
        offs, tgts = ray.get(meta)
        df = g.to_pandas().sort_values(["value", "event_id"]).reset_index(drop=True)
        gg = int(df["g"].iloc[0])
        base = offs[(gg, int(df["bkt"].iloc[0]))]
        want = tgts[gg]
        keep = [
            (gg, base + i, float(v))
            for i, v in enumerate(df["value"])
            if (base + i) in want
        ]
        return pa.table(
            {
                "g": pa.array([k[0] for k in keep], pa.int64()),
                "rank": pa.array([k[1] for k in keep], pa.int64()),
                "value": pa.array([k[2] for k in keep], pa.float64()),
            }
        )

    hits = (
        kb.groupby(["g", "bkt"])
        .map_groups(pluck, batch_format="pyarrow")
        .to_pandas()
    )
    qv = {}
    for g in (0, 1):
        n = totals[g]
        br = dict(
            zip(
                hits.loc[hits["g"] == g, "rank"],
                hits.loc[hits["g"] == g, "value"],
            )
        )
        for q in qs:
            h = q * (n - 1)
            lo_r, hi_r = int(np.floor(h)), int(np.ceil(h))
            qv[(g, q)] = br[lo_r] + (h - np.floor(h)) * (br[hi_r] - br[lo_r])
    rows = [
        (
            q,
            float(_r(qv[(0, q)], 6)),
            float(_r(qv[(1, q)], 6)),
            float(_r(qv[(1, q)] - qv[(0, q)], 6)),
        )
        for q in qs
    ]
    return pd.DataFrame(rows, columns=["q", "control", "treatment", "qte"])


def q_hub_removal_robustness(sf_dir: str, kmax: int = 5):
    """Network-robustness curve of the undirected events link graph:
    remove the top-k highest-degree hubs (degree desc, node asc) for
    k = 0..5 and report the largest-connected-component fraction of the
    REMAINING nodes — the attack-tolerance profile that says whether
    the crawl graph's connectivity hangs on a few super-hubs.  Shape:
    canonical edge dedupe + degree combiner; each k's components run
    min-label propagation over the broadcast 50-node edge set (at web
    scale: the dedup_clusters shuffle loop); O(6) rows reach the
    driver."""
    edges = _events_edges(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        bb = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"a": a, "b": bb}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    e = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .to_pandas()
    )
    deg = pd.concat([e["a"], e["b"]]).value_counts().sort_index()
    order = deg.sort_values(ascending=False, kind="stable")
    # degree desc, node asc removal order
    order = (
        pd.DataFrame({"node": deg.index, "d": deg.values})
        .sort_values(["d", "node"], ascending=[False, True])["node"]
        .tolist()
    )
    rows = []
    for k in range(kmax + 1):
        removed = set(order[:k])
        keep_e = e[~e["a"].isin(removed) & ~e["b"].isin(removed)]
        nodes = set(deg.index) - removed
        # min-label propagation to fixpoint
        label = {n: n for n in nodes}
        changed = True
        while changed:
            changed = False
            for a, bb in zip(keep_e["a"], keep_e["b"]):
                la, lb = label[a], label[bb]
                if la < lb:
                    label[bb] = la
                    changed = True
                elif lb < la:
                    label[a] = lb
                    changed = True
        if nodes:
            sizes = pd.Series(list(label.values())).value_counts()
            frac = float(sizes.max()) / len(nodes)
        else:
            frac = float("nan")
        rows.append((k, len(nodes), float(_r(frac, 6))))
    return pd.DataFrame(rows, columns=["k_removed", "n_nodes", "lcc_frac"]).astype(
        {"k_removed": "int64", "n_nodes": "int64"}
    )


def q_funnel_wilson(sf_dir: str):
    """Funnel step conversions with Wilson 95% intervals: from
    q_funnel_conversion's cumulative stage counts, each adjacent-step
    conversion rate k/n gets the Wilson score interval — the
    uncertainty-aware funnel readout that keeps product teams from
    chasing noise in the deep steps.  Shape: reuses the per-user funnel
    fold (one groupby(user)); the Wilson algebra runs on 3 rows."""
    from .q_stats_b import q_funnel_conversion  # explicit cross-family dep
    fc = q_funnel_conversion(sf_dir)
    fc = fc if isinstance(fc, pd.DataFrame) else fc.to_pandas()
    fc = fc.reset_index(drop=True)
    z = 1.96
    rows = []
    counts = fc["n_users"].tolist()
    steps = fc["step"].tolist() if "step" in fc.columns else fc.iloc[:, 0].tolist()
    for i in range(1, len(counts)):
        n, k = counts[i - 1], counts[i]
        if n == 0:
            continue
        p = k / n
        denom = 1.0 + z * z / n
        centre = (p + z * z / (2 * n)) / denom
        half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        rows.append(
            (
                f"{steps[i - 1]}->{steps[i]}",
                int(n),
                int(k),
                float(_r(p, 6)),
                float(_r(centre - half, 6)),
                float(_r(centre + half, 6)),
            )
        )
    return pd.DataFrame(
        rows, columns=["step", "n_prev", "n_conv", "rate", "ci_lo", "ci_hi"]
    ).astype({"n_prev": "int64", "n_conv": "int64"})


def q_revenue_hhi_monthly(sf_dir: str):
    """Monthly Herfindahl-Hirschman concentration of purchase revenue
    across users: per month HHI = sum over users of (user cents / month
    cents)^2 plus the effective number of spenders 1/HHI — the whale-
    dependence drift dashboard.  Shape: one (month, user) cents
    combiner; the per-month share fold runs on O(users-in-month) cells
    inside groupby(month), emitting one row per month."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value", "event_type"])

    def cents(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table(
                {
                    "ts": b.column("ts"),
                    "user_id": b.column("user_id"),
                    "value": b.column("value"),
                    "event_type": b.column("event_type"),
                }
            )
        )
        return (
            df.filter(pl.col("event_type") == "purchase")
            .with_columns(
                pl.col("ts").dt.strftime("%Y-%m").alias("month"),
                (pl.col("value") * 100.0).round(0).cast(pl.Int64).alias("c"),
            )
            .group_by(["month", "user_id"])
            .agg(pl.col("c").sum())
            .to_arrow()
        )

    cells = (
        ev.map_batches(cents, batch_format="pyarrow")
        .groupby(["month", "user_id"])
        .sum("c")
        .map_batches(
            lambda b: b.rename_columns(["month", "user_id", "c"]),
            batch_format="pyarrow",
        )
    )

    def hhi(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        tot = float(df["c"].sum())
        sh = df["c"].to_numpy(np.float64) / tot
        h = float((sh * sh).sum())
        return pa.table(
            {
                "month": pa.array([df["month"].iloc[0]], pa.string()),
                "n_spenders": pa.array([len(df)], pa.int64()),
                "hhi": pa.array([float(_r(h, 6))], pa.float64()),
                "effective_n": pa.array([float(_r(1.0 / h, 6))], pa.float64()),
            }
        )

    return (
        cells.groupby("month")
        .map_groups(hhi, batch_format="pyarrow")
        .sort("month")
    )


def q_binseg_proportion(sf_dir: str):
    """One-split binary segmentation of the daily purchase-per-(view +
    purchase) conversion share: the split day maximizing the binomial
    log-likelihood-ratio G2 = 2 * (LL(left) + LL(right) - LL(pooled))
    with x ln x folds (0 ln 0 = 0), earliest day on ties — the
    proportion-domain changepoint next to q_pettitt_test (ranks) and
    q_cusum_changepoints (means).  Shape: one (day, views, purchases)
    combiner; the O(days) prefix-sum scan runs driver-side, window-sum
    mirror."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "t": b.column("event_type")})
        )
        return (
            df.filter(pl.col("t").is_in(["view", "purchase"]))
            .with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by("day")
            .agg(
                (pl.col("t") == "purchase").sum().cast(pl.Int64).alias("k"),
                pl.len().cast(pl.Int64).alias("n"),
            )
            .to_arrow()
        )

    d = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("k"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(k)": "k", "sum(n)": "n"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    m = len(d)
    if m < 2:
        return pd.DataFrame(columns=["split_day", "g2"]).astype({"split_day": "float64", "g2": "float64"})
    k = d["k"].to_numpy(np.float64)
    n = d["n"].to_numpy(np.float64)

    def ll(kk, nn):
        # binomial log-likelihood at the MLE, x ln x convention
        out = 0.0
        if kk > 0:
            out += kk * np.log(kk / nn)
        if nn - kk > 0:
            out += (nn - kk) * np.log((nn - kk) / nn)
        return out

    kt, nt = float(k.sum()), float(n.sum())
    pooled = ll(kt, nt)
    best = None
    ck = cn = 0.0
    for t in range(m - 1):
        ck += k[t]
        cn += n[t]
        g2 = 2.0 * (ll(ck, cn) + ll(kt - ck, nt - cn) - pooled)
        if best is None or g2 > best[0] + 1e-12:
            best = (g2, t)
    g2, t = best
    return pd.DataFrame(
        {"split_day": [d["day"].iloc[t]], "g2": [float(_r(g2, 6))]}
    )


def q_dp_noise_planner(sf_dir: str):
    """Differential-privacy noise calibration for publishing per-source
    document counts: at epsilon = 0.1 / 1 / 10 (sensitivity 1 per
    count), the Laplace scale b = 1/eps, its standard deviation
    sqrt(2)/eps, and the expected relative error sqrt(2)/(eps * median
    source count) — the utility planning table run BEFORE noising, with
    the exact interpolated median source size from the distributed
    count table.  Shape: one per-source count combiner; O(3) closed-
    form rows."""
    docs = _read(sf_dir, "documents", columns=["source"])
    counts = (
        docs.groupby("source")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
        .sort_values("n")
        .reset_index(drop=True)
    )
    c = counts["n"].to_numpy(np.float64)
    m = len(c)
    h = 0.5 * (m - 1)
    lo, hi = int(np.floor(h)), int(np.ceil(h))
    med = c[lo] + (h - lo) * (c[hi] - c[lo])
    rows = []
    for eps in (0.1, 1.0, 10.0):
        b = 1.0 / eps
        sd = float(np.sqrt(2.0)) / eps
        rows.append(
            (
                eps,
                float(_r(b, 6)),
                float(_r(sd, 6)),
                float(_r(sd / med, 6)),
            )
        )
    out = pd.DataFrame(
        rows, columns=["epsilon", "laplace_b", "noise_sd", "rel_err_at_median"]
    )
    out["median_count"] = float(_r(med, 6))
    return out[["epsilon", "median_count", "laplace_b", "noise_sd", "rel_err_at_median"]]

__all__ = [
    "q_rfm_segments",
    "q_friedman_test",
    "q_log_rank_test",
    "q_jarque_bera",
    "q_periodogram",
    "q_mcc_binary",
    "q_pettitt_test",
    "q_bartlett_test",
    "q_err_eval",
    "q_simpson_diversity",
    "q_dirichlet_lm",
    "q_gains_chart",
    "q_tukey_fences",
    "q_odds_ratio_ci",
    "q_gumbel_maxima",
    "q_capture_recapture",
    "q_gof_uniform_hours",
    "q_negbin_fit",
    "q_growth_accounting",
    "q_seasonal_strength",
    "q_diff_in_diff",
    "q_cohort_ltv",
    "q_levene_test",
    "q_cochran_q",
    "q_lag_xcorr",
    "q_jackknife_mean",
    "q_wilcoxon_signed_rank",
    "q_ljung_box",
    "q_xmr_control",
    "q_twonn_dimension",
    "q_medoid_per_label",
    "q_dunn_index",
    "q_haar_energy",
    "q_boolean_and_query",
    "q_phrase_search",
    "q_proximity_score",
    "q_variance_ratio",
    "q_turning_points",
    "q_consistent_hash_migration",
    "q_casing_profile",
    "q_cooccurrence_pmi",
    "q_gmm_estep",
    "q_effect_size_power",
    "q_sprt_monitor",
    "q_avg_neighbor_degree",
    "q_edge_embeddedness",
    "q_juilland_dispersion",
    "q_map_eval",
    "q_bradley_terry",
    "q_stratified_diff",
    "q_logistic_newton",
    "q_conformal_interval",
    "q_white_test",
    "q_kleinberg_bursts",
    "q_pacf_profile",
    "q_ar1_forecast",
    "q_huber_mean",
    "q_median_polish",
    "q_bhattacharyya",
    "q_target_encoding",
    "q_boosted_stumps",
    "q_lindley_queue",
    "q_referential_audit",
    "q_pettitt_bh",
    "q_geometric_median",
    "q_otsu_threshold",
    "q_feature_mi",
    "q_hash_uniformity",
    "q_lof_outliers",
    "q_dbscan_cores",
    "q_krippendorff_alpha",
    "q_quantile_treatment_effect",
    "q_hub_removal_robustness",
    "q_funnel_wilson",
    "q_revenue_hhi_monthly",
    "q_binseg_proportion",
    "q_dp_noise_planner",
]
