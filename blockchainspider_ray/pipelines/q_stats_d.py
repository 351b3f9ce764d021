"""Stats D query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_k_anonymity(sf_dir: str):
    """k-anonymity census over the quasi-identifier (source, lang,
    n_chars-decile): equivalence-class size distribution plus the
    fraction of documents in classes smaller than k for k = 2, 5, 10 —
    the re-identification risk audit a release pipeline runs before
    publishing "anonymized" metadata.  Shape: deciles via the global
    n_chars min/max (one aggregate); one (qid) count combiner; the
    class-size histogram fold is driver-side."""
    docs = _read(sf_dir, "documents", columns=["source", "lang", "n_chars"])
    from ray.data.aggregate import Max, Min

    mm = docs.aggregate(Min("n_chars"), Max("n_chars"))
    lo, hi = float(mm["min(n_chars)"]), float(mm["max(n_chars)"])
    span = (hi - lo) or 1.0

    def qid(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").to_numpy().astype(np.float64)
        dec = np.minimum(np.floor((v - lo) / span * 10).astype(np.int64), 9)
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pylist(),
                "lang": b.column("lang").to_pylist(),
                "dec": dec,
            }
        )
        g = df.groupby(["source", "lang", "dec"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return pa.Table.from_pandas(
            g[["source", "lang", "dec", "n"]], preserve_index=False
        )

    classes = (
        docs.map_batches(qid, batch_format="pyarrow")
        .groupby(["source", "lang", "dec"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    n_docs = float(classes["n"].sum())
    rows = []
    for k in (2, 5, 10):
        at_risk = float(classes.loc[classes["n"] < k, "n"].sum())
        rows.append(
            (
                k,
                int((classes["n"] < k).sum()),
                float(_r(at_risk / n_docs, 6)),
            )
        )
    out = pd.DataFrame(rows, columns=["k", "small_classes", "at_risk_frac"]).astype(
        {"k": "int64", "small_classes": "int64"}
    )
    out["n_classes"] = int(len(classes))
    out["min_class"] = int(classes["n"].min())
    return out.astype({"n_classes": "int64", "min_class": "int64"})[
        ["k", "n_classes", "min_class", "small_classes", "at_risk_frac"]
    ]


def q_l_diversity(sf_dir: str):
    """l-diversity audit: within each (source, n_chars-decile) quasi-
    identifier class, the number of DISTINCT sensitive values (lang);
    reported as the distribution of per-class diversity plus the
    corpus minimum — a k-anonymous class with one language still leaks
    the language, which is exactly what this catches.  Shape: one
    (qid, lang) dedupe combiner then a per-qid distinct count; the
    O(classes) histogram fold is driver-side."""
    docs = _read(sf_dir, "documents", columns=["source", "lang", "n_chars"])
    from ray.data.aggregate import Max, Min

    mm = docs.aggregate(Min("n_chars"), Max("n_chars"))
    lo, hi = float(mm["min(n_chars)"]), float(mm["max(n_chars)"])
    span = (hi - lo) or 1.0

    def pres(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").to_numpy().astype(np.float64)
        dec = np.minimum(np.floor((v - lo) / span * 10).astype(np.int64), 9)
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pylist(),
                "dec": dec,
                "lang": b.column("lang").to_pylist(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    div = (
        docs.map_batches(pres, batch_format="pyarrow")
        .groupby(["source", "dec", "lang"])
        .count()
        .groupby(["source", "dec"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "l"})
    )
    hist = (
        div.groupby("l", as_index=False)
        .size()
        .rename(columns={"size": "n_classes"})
        .sort_values("l")
        .reset_index(drop=True)
    )
    hist["l"] = hist["l"].astype("int64")
    hist["n_classes"] = hist["n_classes"].astype("int64")
    hist["min_l"] = int(div["l"].min())
    return hist.astype({"min_l": "int64"})[["l", "n_classes", "min_l"]]


def q_nelson_aalen(sf_dir: str):
    """Nelson-Aalen cumulative-hazard estimate for the signup-to-purchase
    duration (same duration fold and censoring as q_kaplan_meier):
    H(t) = sum over event times t_i <= t of d_i/n_i, with the variance
    accumulator sum d_i/n_i^2 — the hazard-scale counterpart whose
    exp(-H) is the KM curve's asymptotic twin.  Shape: identical
    groupby(user) duration fold; the O(distinct durations) cumulative
    fold is driver-side, window-sum mirror."""
    obs = (
        _survival_durations(sf_dir)  # shared censoring convention
        .groupby("dur")
        .aggregate(Sum("ev", alias_name="d"), Count("ev", alias_name="c"))
        .to_pandas()
        .sort_values("dur")
        .reset_index(drop=True)
    )
    n_total = int(obs["c"].sum())
    seen = 0
    h = var = 0.0
    rows = []
    for _, r_ in obs.iterrows():
        n = n_total - seen
        d = int(r_["d"])
        if d > 0:
            h += d / n
            var += d / (n * n)
            rows.append(
                (int(r_["dur"]), n, d, float(_r(h, 6)), float(_r(np.sqrt(var), 6)))
            )
        seen += int(r_["c"])
    return pd.DataFrame(
        rows, columns=["t_us", "n_risk", "n_events", "cum_hazard", "se"]
    ).astype({"t_us": "int64", "n_risk": "int64", "n_events": "int64"})


def q_sax_symbols(sf_dir: str, segments: int = 8):
    """SAX symbolization of the daily event volume: z-normalize the
    series (population sd), PAA-average into 8 equal segments (tail
    days fold into the last segment by index arithmetic i*8//m), and
    map each segment mean to the 4-letter alphabet a..d with the
    standard Gaussian breakpoints (-0.6745, 0, 0.6745); also reports
    the PAA reconstruction RMSE — the time-series symbol layer under
    motif mining and sequence indexing.  Shape: _daily_counts reduce;
    the O(days) fold is driver-side, segment-groupby mirror."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < segments:
        return pd.DataFrame(
            columns=["segment", "paa", "symbol"]
        ).astype({"segment": "int64", "paa": "float64", "symbol": "object"})
    mu = float(x.sum()) / m
    sd = float(np.sqrt(((x - mu) ** 2).sum() / m))
    z = (x - mu) / sd if sd > 0 else np.zeros(m)
    seg = (np.arange(m) * segments) // m
    rows = []
    recon = np.empty(m)
    for s in range(segments):
        sel = seg == s
        paa = float(z[sel].sum() / sel.sum())
        recon[sel] = paa
        sym = "abcd"[int(np.searchsorted([-0.6745, 0.0, 0.6745], paa, side="right"))]
        rows.append((s, float(_r(paa, 6)), sym))
    out = pd.DataFrame(rows, columns=["segment", "paa", "symbol"]).astype(
        {"segment": "int64"}
    )
    out["rmse"] = float(_r(float(np.sqrt(((z - recon) ** 2).mean())), 6))
    return out


def q_abc_analysis(sf_dir: str):
    """ABC (80/15/5) inventory classification of parts by lineitem
    revenue: rank parts by integer-cent revenue (desc, partkey asc),
    class A = parts covering the first 80% of cumulative revenue, B =
    next 15%, C = the tail; per class the part count and exact revenue
    share — the Pareto segmentation every supply/catalog curation run
    starts with.  Shape: one per-part cents combiner (parts are
    dim-sized); the cumulative classification folds on the O(parts)
    table driver-side, window-sum mirror."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def cents(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        c = _r(
            df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy()) * 100.0,
            0,
        ).astype(np.int64)
        g = pd.DataFrame({"p": df["l_partkey"].to_numpy(np.int64), "c": c}).groupby(
            "p", as_index=False
        ).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = (
        li.map_batches(cents, batch_format="pyarrow")
        .groupby("p")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["c", "p"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = float(per_part["c"].sum())
    cum = per_part["c"].cumsum() / total
    cls = np.where(cum <= 0.80, "A", np.where(cum <= 0.95, "B", "C"))
    per_part["cls"] = cls
    out = (
        per_part.groupby("cls", as_index=False)
        .agg(n_parts=("p", "size"), cents=("c", "sum"))
        .sort_values("cls")
        .reset_index(drop=True)
    )
    out["rev_share"] = _r(out["cents"] / total, 6)
    out["n_parts"] = out["n_parts"].astype("int64")
    out["cents"] = out["cents"].astype("int64")
    return out[["cls", "n_parts", "cents", "rev_share"]]


def q_harrell_c(sf_dir: str):
    """Harrell's concordance index for "cohort predicts conversion
    speed": over the q_kaplan_meier durations (cohort g = user_id % 2 as
    the risk score), count comparable pairs — an event at time t is
    comparable with anything surviving past t — and score concordant
    when the higher-risk cohort (g = 1) converts first; ties in the
    score count 1/2 — the survival-model AUC.  Shape: the per-user
    duration fold, then the O(n^2) pair count collapses to cohort-level
    prefix sums over the sorted duration table (never a pairs join):
    driver fold on O(distinct durations) cells."""
    obs = (
        _survival_durations(sf_dir)  # shared censoring convention
        .to_pandas()
        .sort_values("dur")
        .reset_index(drop=True)
    )
    obs["g"] = obs["user_id"].to_numpy(np.int64) % 2
    # prefix counts: for each EVENT at dur t, the later set is everyone
    # with dur > t; concordant when the event is in g=1 and the later
    # member in g=0 (higher risk fails first), tied-score pairs count 1/2
    n = len(obs)
    g_arr = obs["g"].to_numpy(np.int64)
    d_arr = obs["dur"].to_numpy(np.int64)
    e_arr = obs["ev"].to_numpy(np.int64)
    total_g1 = int(g_arr.sum())
    conc = 0.0
    comp = 0
    # iterate distinct durations ascending; suffix counts maintained
    seen = 0
    seen_g1 = 0
    i = 0
    while i < n:
        j = i
        while j < n and d_arr[j] == d_arr[i]:
            j += 1
        later = n - j
        later_g1 = total_g1 - seen_g1 - int(g_arr[i:j].sum())
        later_g0 = later - later_g1
        for r_ in range(i, j):
            if e_arr[r_] == 1:
                comp += later
                if g_arr[r_] == 1:
                    # higher-risk event first: concordant vs later g=0,
                    # score ties (later g=1) take half credit
                    conc += later_g0 + 0.5 * later_g1
                else:
                    # lower-risk event first: discordant vs later g=1,
                    # ties (later g=0) take half credit
                    conc += 0.5 * later_g0
        seen += j - i
        seen_g1 += int(g_arr[i:j].sum())
        i = j
    cidx = conc / comp if comp else float("nan")
    return pd.DataFrame(
        {
            "n_users": pd.array([n], dtype="int64"),
            "comparable_pairs": pd.array([comp], dtype="int64"),
            "c_index": [float(_r(cidx, 6)) if cidx == cidx else float("nan")],
        }
    )


def q_als_rank1(sf_dir: str, iters: int = 2):
    """Rank-1 ALS factorization of the user x event-type count matrix:
    from v = 1 (type space), alternate u = M v / ||v||^2 (per-user, a
    local fold) and v = M^T u / ||u||^2 (type space, via a partitioned
    join of cells against the O(users) u table), 2 rounds — the
    implicit-feedback recsys primitive; the leading singular direction
    of engagement.  Reports v per type plus sigma = ||u|| * ||v|| and
    the captured energy share sigma^2 / ||M||_F^2.  Shape: cells =
    (user, type) count combiner; u never concentrates (sharded per
    user); only the 5-entry v and three scalars reach the driver."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cells = (
        ev.groupby(["user_id", "event_type"])
        .count()
        .map_batches(
            lambda b: b.rename_columns(["user_id", "t", "n"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    types = sorted(
        cells.groupby("t").count().to_pandas()["t"]
    )
    v = {t: 1.0 for t in types}
    u_df = None
    for _ in range(iters):
        v_ref = ray.put(v)
        v2 = sum(x * x for x in v.values())

        def usum(b: pa.Table, _v=v_ref, _v2=v2) -> pa.Table:
            vv = ray.get(_v)
            df = b.to_pandas()
            df["x"] = df["n"].to_numpy(np.float64) * df["t"].map(vv).to_numpy(
                np.float64
            ) / _v2
            g = df.groupby("user_id", as_index=False)[["x"]].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        u_ds = (
            cells.map_batches(usum, batch_format="pyarrow")
            .groupby("user_id")
            .sum("x")
            .map_batches(
                lambda b: b.rename_columns(["user_id", "u"]), batch_format="pyarrow"
            )
            .materialize()
        )
        from ..stages.joins import hash_join

        joined = hash_join(cells, u_ds, key="user_id")

        def vsum(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df["x"] = df["n"].to_numpy(np.float64) * df["u"].to_numpy(np.float64)
            g = df.groupby("t", as_index=False)[["x"]].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        vt = (
            joined.map_batches(vsum, batch_format="pyarrow")
            .groupby("t")
            .sum("x")
            .to_pandas()
            .rename(columns={"sum(x)": "x"})
        )

        def u2part(b: pa.Table) -> pa.Table:
            x = b.column("u").to_numpy()
            return pa.table({"s": pa.array([float((x * x).sum())], pa.float64())})

        u2 = float(u_ds.map_batches(u2part, batch_format="pyarrow").sum("s"))
        v = {t: float(x) / u2 for t, x in zip(vt["t"], vt["x"])}
        u_df = u_ds
    # final norms and energy
    def u2part(b: pa.Table) -> pa.Table:
        x = b.column("u").to_numpy()
        return pa.table({"s": pa.array([float((x * x).sum())], pa.float64())})

    unorm = float(np.sqrt(u_df.map_batches(u2part, batch_format="pyarrow").sum("s")))
    vnorm = float(np.sqrt(sum(x * x for x in v.values())))

    def fro(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy().astype(np.float64)
        return pa.table({"s": pa.array([float((n * n).sum())], pa.float64())})

    fro2 = float(cells.map_batches(fro, batch_format="pyarrow").sum("s"))
    sigma = unorm * vnorm
    out = pd.DataFrame(
        {
            "event_type": types,
            "v": [float(_r(v[t] / vnorm, 6)) for t in types],
        }
    )
    out["sigma"] = float(_r(sigma, 4))
    out["energy_share"] = float(_r(sigma * sigma / fro2, 6))
    return out


def q_learned_index_audit(sf_dir: str):
    """Learned-index error audit over the sorted distinct user-id key
    space: fit position ~ key by OLS (the RMI leaf model) and report the
    max absolute position error — the epsilon that bounds the binary-
    search window a learned index needs, small epsilon = nearly-linear
    key space.  Shape: distinct keys via combiner; exact positions from
    the order-preserving bucket rank (key IS the bucket); OLS sufficient
    stats and the max-error pass are two more streaming folds."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    keys = (
        ev.groupby("user_id")
        .count()
        .select_columns(["user_id"])
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    k = keys["user_id"].to_numpy(np.float64)
    n = len(k)
    pos = np.arange(n, dtype=np.float64)
    kb, pb = k.mean(), pos.mean()
    b1 = float(((k - kb) * (pos - pb)).sum() / ((k - kb) ** 2).sum())
    b0 = pb - b1 * kb
    err = np.abs(pos - (b0 + b1 * k))
    return pd.DataFrame(
        {
            "n_keys": pd.array([n], dtype="int64"),
            "slope": [float(_r(b1, 6))],
            "intercept": [float(_r(b0, 6))],
            "max_err": [float(_r(float(err.max()), 6))],
            "mean_err": [float(_r(float(err.mean()), 6))],
        }
    )


def q_zone_map_audit(sf_dir: str, rows_per_block: int = 1000):
    """Zone-map (block-skipping) effectiveness audit: blocks = event_id
    ranges of 1000 rows; per block the min/max ts zone; for a one-day
    point query (the corpus's busiest day) the fraction of blocks whose
    zone excludes the day = the I/O a min/max-pruning reader saves —
    near 1.0 when storage order correlates with time, near 0 when rows
    are shuffled.  Shape: per-block zone combiner (block = event_id //
    1000); the busiest day is a combiner groupby; the O(blocks) prune
    check folds driver-side."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts"])

    def zones(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "blk": (
                    b.column("event_id").to_numpy(zero_copy_only=False)
                    // rows_per_block
                ).astype(np.int64),
                "us": b.column("ts")
                .cast(pa.timestamp("us"))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("blk", as_index=False).agg(lo=("us", "min"), hi=("us", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min

    z = (
        ev.map_batches(zones, batch_format="pyarrow")
        .groupby("blk")
        .aggregate(Min("lo"), Max("hi"))
        .to_pandas()
        .rename(columns={"min(lo)": "lo", "max(hi)": "hi"})
    )

    def per_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts")}))
        return (
            df.with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .group_by("day")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    days = (
        ev.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values(["n", "day"], ascending=[False, True])
        .reset_index(drop=True)
    )
    busiest = days["day"].iloc[0]
    d0 = np.datetime64(busiest, "us").astype("int64")
    d1 = d0 + 86_400_000_000
    overlap = ((z["lo"] < d1) & (z["hi"] >= d0)).sum()
    n_blocks = len(z)
    return pd.DataFrame(
        {
            "busiest_day": [busiest],
            "n_blocks": pd.array([n_blocks], dtype="int64"),
            "blocks_read": pd.array([int(overlap)], dtype="int64"),
            "prune_frac": [float(_r(1.0 - overlap / n_blocks, 6))],
        }
    )


def q_sort_order_benefit(sf_dir: str):
    """Sort-order RLE benefit for the event_type column: run count in the
    natural (ts, event_id) order vs the 5 runs a type-sorted layout
    would give — the runs ratio IS the RLE compression a re-sort buys, 
    the question every layout optimizer asks before clustering a
    column.  Shape: per-day intra-run counts fold inside
    groupby(day) on (ts, event_id) order; day-boundary stitches use the
    O(days) first/last table driver-side (days are contiguous disjoint
    ts ranges, so the global order is day-then-intra-day)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def runs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        t = df["event_type"].tolist()
        r = 1 + sum(1 for i in range(1, len(t)) if t[i] != t[i - 1])
        day = str(df["day"].iloc[0])
        return pa.table(
            {
                "day": pa.array([day], pa.string()),
                "runs": pa.array([r], pa.int64()),
                "n": pa.array([len(t)], pa.int64()),
                "first_t": pa.array([t[0]], pa.string()),
                "last_t": pa.array([t[-1]], pa.string()),
            }
        )

    def tag(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table(
                {
                    "event_id": b.column("event_id"),
                    "ts": b.column("ts"),
                    "event_type": b.column("event_type"),
                }
            )
        )
        return df.with_columns(
            pl.col("ts").dt.strftime("%Y-%m-%d").alias("day")
        ).to_arrow()

    per_day = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("day")
        .map_groups(runs, batch_format="pyarrow")
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    total_runs = int(per_day["runs"].sum())
    # stitch day boundaries: adjacent days whose last/first types match
    # merged one run each
    for i in range(1, len(per_day)):
        if per_day["first_t"].iloc[i] == per_day["last_t"].iloc[i - 1]:
            total_runs -= 1
    n = int(per_day["n"].sum())
    distinct = (
        ev.groupby("event_type").count().count()
    )
    sorted_runs = int(distinct)
    return pd.DataFrame(
        {
            "n_rows": pd.array([n], dtype="int64"),
            "runs_natural": pd.array([total_runs], dtype="int64"),
            "runs_sorted": pd.array([sorted_runs], dtype="int64"),
            "benefit_ratio": [float(_r(total_runs / sorted_runs, 6))],
        }
    )


def q_dag_layers(sf_dir: str):
    """Longest-path layering of the DAG inside the events link graph
    (keep only ascending edges a < b, which is acyclic by construction):
    layer(v) = 1 + max(layer(pred)), sources at layer 0; reported as
    the layer-size histogram plus the DAG depth — the dependency-
    scheduling shape (how many parallel waves a topological executor
    needs).  Shape: ascending-edge dedupe; the layer fixpoint runs over
    the broadcast 50-node edge list (web scale: iterated frontier
    joins); O(depth) rows reach the driver."""
    edges = _events_edges(sf_dir)

    def asc(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        keep = src < dst
        df = pd.DataFrame({"a": src[keep], "b": dst[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    e = (
        edges.map_batches(asc, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .to_pandas()
    )
    nodes = sorted(set(e["a"]) | set(e["b"]))
    layer = {n: 0 for n in nodes}
    # ascending-edge DAG: processing targets in node order converges in
    # one sweep because every edge goes low -> high
    for bnode in sorted(set(e["b"])):
        preds = e.loc[e["b"] == bnode, "a"]
        layer[bnode] = 1 + max(layer[p] for p in preds)
    ls = pd.Series(layer)
    hist = (
        ls.value_counts()
        .sort_index()
        .rename_axis("layer")
        .reset_index(name="n_nodes")
    )
    hist["layer"] = hist["layer"].astype("int64")
    hist["n_nodes"] = hist["n_nodes"].astype("int64")
    hist["depth"] = int(ls.max())
    return hist.astype({"depth": "int64"})


def q_ipw_ate(sf_dir: str):
    """Inverse-propensity-weighted average treatment effect on purchase
    value: strata = hour-of-day quartiles, treatment g = user_id % 2,
    propensity e(s) = the treated share within the stratum, and the
    Horvitz-Thompson means sum(y*g/e)/sum(g/e) vs sum(y*(1-g)/(1-e)) /
    sum((1-g)/(1-e)) — the weighting-based causal estimate next to
    q_stratified_diff's direct standardization.  Shape: per-(stratum,
    arm) sufficient-stats combiner; propensities broadcast; one more
    weighted-sum pass; O(8) cells move."""
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
    cells = (
        kd.groupby(["s", "g"])
        .aggregate(Sum("v"), Count())
        .to_pandas()
        .rename(columns={"sum(v)": "sv", "count()": "n"})
    )
    tot = cells.groupby("s")["n"].sum()
    prop = {}
    for s in tot.index:
        n1 = int(cells.loc[(cells["s"] == s) & (cells["g"] == 1), "n"].sum())
        prop[int(s)] = n1 / float(tot[s])
    # HT weighted sums straight from the (s, g) sufficient stats
    wy1 = w1 = wy0 = w0 = 0.0
    for _, r_ in cells.sort_values(["s", "g"]).iterrows():
        s, g = int(r_["s"]), int(r_["g"])
        e = prop[s]
        if g == 1 and e > 0:
            wy1 += float(r_["sv"]) / e
            w1 += float(r_["n"]) / e
        elif g == 0 and e < 1:
            wy0 += float(r_["sv"]) / (1.0 - e)
            w0 += float(r_["n"]) / (1.0 - e)
    mu1 = wy1 / w1 if w1 > 0 else float("nan")
    mu0 = wy0 / w0 if w0 > 0 else float("nan")
    ate = mu1 - mu0
    return pd.DataFrame(
        {
            "mu_treated": [float(_r(mu1, 6))],
            "mu_control": [float(_r(mu0, 6))],
            "ate_ipw": [float(_r(ate, 6))],
        }
    )


def q_cache_working_set(sf_dir: str):
    """Working-set cache planning over the user-access stream: if an
    edge cache pins the C most-accessed users (C = 8 / 32 / 128, count
    desc then user asc), what share of ALL accesses hit the cache —
    the frequency-cache (LFU-omniscient) upper bound every cache-size
    negotiation starts from.  Shape: one per-user access-count
    combiner; the top-C folds run on the O(users) count table
    driver-side, window-rank mirror."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    counts = (
        ev.groupby("user_id")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
        .sort_values(["n", "user_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = float(counts["n"].sum())
    rows = []
    for c in (8, 32, 128):
        hit = float(counts["n"].head(c).sum())
        rows.append((c, int(min(c, len(counts))), float(_r(hit / total, 6))))
    return pd.DataFrame(rows, columns=["cache_size", "n_pinned", "hit_rate"]).astype(
        {"cache_size": "int64", "n_pinned": "int64"}
    )


def q_coupon_collector(sf_dir: str):
    """Coupon-collector completion of the event-type alphabet: the
    global stream position ((ts, event_id) order) at which all 5 types
    have appeared, vs the uniform-coupon expectation k*H_k — how fast a
    monitoring consumer can expect to observe the full schema.  Shape:
    per-type first-(ts, event_id) pairs via two tiny combiners (min ts,
    then min event_id at that ts); the completion position is one
    lexicographic count filter — no composite key arithmetic, so no
    overflow at any timestamp scale."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def firsts(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "t": b.column("event_type").to_pylist(),
                "us": b.column("ts")
                .cast(pa.timestamp("us"))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False),
                "eid": b.column("event_id").to_numpy(zero_copy_only=False),
            }
        )
        g = (
            df.sort_values(["us", "eid"])
            .groupby("t", as_index=False)
            .first()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    f = (
        ev.map_batches(firsts, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["us", "eid"])
        .groupby("t", as_index=False)
        .first()
    )
    k = len(f)
    last = f.sort_values(["us", "eid"]).iloc[-1]
    last_us, last_eid = int(last["us"]), int(last["eid"])
    l_ref = ray.put((last_us, last_eid))

    def upto(b: pa.Table, _l=l_ref) -> pa.Table:
        lu, le = ray.get(_l)
        us = (
            b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        n = int(((us < lu) | ((us == lu) & (eid <= le))).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    n_draws = int(ev.map_batches(upto, batch_format="pyarrow").sum("n"))
    h_k = sum(1.0 / i for i in range(1, k + 1))
    expected = k * h_k
    return pd.DataFrame(
        {
            "k_types": pd.array([k], dtype="int64"),
            "n_draws": pd.array([n_draws], dtype="int64"),
            "expected_uniform": [float(_r(expected, 6))],
            "ratio": [float(_r(n_draws / expected, 6))],
        }
    )


def q_peak_to_mean(sf_dir: str):
    """Peak-to-mean capacity ratios of the event stream: the busiest
    day vs the mean day and the busiest hour-of-day slot vs the mean
    slot — the headroom factors a fixed-size fetch fleet must absorb
    (provisioning to the mean under a PAR of 2 drops half the peak).
    Shape: two tiny count combiners (per-day, per-hour); O(1) folds."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    day_par = float(x.max() / x.mean())
    ev = _read(sf_dir, "events", columns=["ts"])

    def per_hour(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts")}))
        return (
            df.with_columns(pl.col("ts").dt.hour().cast(pl.Int64).alias("hr"))
            .group_by("hr")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    hh = (
        ev.map_batches(per_hour, batch_format="pyarrow")
        .groupby("hr")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    hx = hh["n"].to_numpy(np.float64)
    hour_par = float(hx.max() / hx.mean())
    return pd.DataFrame(
        {
            "n_days": pd.array([len(x)], dtype="int64"),
            "day_par": [float(_r(day_par, 6))],
            "hour_par": [float(_r(hour_par, 6))],
        }
    )


def q_gompertz_fit(sf_dir: str):
    """Gompertz growth fit of cumulative distinct users over HOURS: with
    N(t) = K * exp(-b * exp(-c * t)), the linearization ln(-ln(N/K))
    = ln(b) - c*t is an OLS on the interior points (K = final distinct
    count, endpoints with N=K excluded) — the saturation-curve model
    behind adoption forecasting, fit distributed-first.  Shape: the
    cumulative-distinct curve comes from per-user first-HOUR-bucket
    minima (q_new_users_daily's combiner plan, hour granularity so the
    onboarding ramp actually resolves); the OLS folds on the O(hours)
    curve driver-side."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def first_day(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "user_id": b.column("user_id")})
        )
        return (
            df.with_columns(
                pl.col("ts").dt.strftime("%Y-%m-%d %H").alias("day")
            )
            .group_by("user_id")
            .agg(pl.col("day").min().alias("day"))
            .to_arrow()
        )

    fd = (
        ev.map_batches(first_day, batch_format="pyarrow")
        .groupby("user_id")
        .min("day")
        .map_batches(
            lambda b: b.rename_columns(["user_id", "day"]), batch_format="pyarrow"
        )
    )
    curve = (
        fd.groupby("day")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_new"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    cum = curve["n_new"].cumsum().to_numpy(np.float64)
    k_cap = float(cum[-1])
    t = np.arange(len(cum), dtype=np.float64)
    frac = cum / k_cap
    keep = frac < 1.0
    if keep.sum() < 2:
        return pd.DataFrame(columns=["n_hours", "k_cap", "b", "c"]).astype(
            {"n_hours": "int64", "k_cap": "int64", "b": "float64", "c": "float64"}
        )
    y = np.log(-np.log(frac[keep]))
    x = t[keep]
    xb, yb = x.mean(), y.mean()
    slope = float(((x - xb) * (y - yb)).sum() / ((x - xb) ** 2).sum())
    inter = yb - slope * xb
    return pd.DataFrame(
        {
            "n_hours": pd.array([len(cum)], dtype="int64"),
            "k_cap": pd.array([int(k_cap)], dtype="int64"),
            "b": [float(_r(float(np.exp(inter)), 6))],
            "c": [float(_r(-slope, 6))],
        }
    )


def q_weibull_hazard(sf_dir: str):
    """Weibull shape diagnosis of the signup-to-purchase durations via
    the median-rank linearization: for the EVENT durations (censored
    drop), plot ln(-ln(1 - (i - 0.3)/(n + 0.4))) against ln(t) and fit
    by OLS — slope = the Weibull shape k (k < 1 infant-mortality
    conversions, k > 1 wear-in) and scale lambda = exp(-intercept/k) —
    the parametric counterpart of q_kaplan_meier.  Shape: the duration
    fold, then ranks over the O(events) sorted durations driver-side."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def fold(b: pa.Table) -> pa.Table:
        df = b.select(["ts", "event_type"]).to_pandas().sort_values("ts")
        sg = df[df["event_type"] == "signup"]
        if sg.empty:
            return pa.table({"dur": pa.array([], pa.int64())})
        t0 = sg["ts"].iloc[0]
        pu = df[(df["event_type"] == "purchase") & (df["ts"] > t0)]
        if pu.empty:
            return pa.table({"dur": pa.array([], pa.int64())})
        t0us = np.datetime64(t0, "us").astype("int64")
        dur = int(np.datetime64(pu["ts"].iloc[0], "us").astype("int64") - t0us)
        return pa.table({"dur": pa.array([dur], pa.int64())})

    durs = (
        ev.groupby("user_id")
        .map_groups(fold, batch_format="pyarrow")
        .to_pandas()["dur"]
        .sort_values()
        .to_numpy(np.float64)
    )
    n = len(durs)
    if n < 3:
        return pd.DataFrame(columns=["n_events", "shape_k", "scale_days"]).astype(
            {"n_events": "int64", "shape_k": "float64", "scale_days": "float64"}
        )
    i = np.arange(1, n + 1, dtype=np.float64)
    y = np.log(-np.log(1.0 - (i - 0.3) / (n + 0.4)))
    x = np.log(durs / 86_400_000_000.0)  # days
    xb, yb = x.mean(), y.mean()
    k = float(((x - xb) * (y - yb)).sum() / ((x - xb) ** 2).sum())
    inter = yb - k * xb
    lam = float(np.exp(-inter / k))
    return pd.DataFrame(
        {
            "n_events": pd.array([n], dtype="int64"),
            "shape_k": [float(_r(k, 6))],
            "scale_days": [float(_r(lam, 6))],
        }
    )


def q_seasonal_chi2(sf_dir: str):
    """Hour-of-day x day-of-week independence chi-square of the event
    stream: does the hourly profile repeat every weekday, or do weekends
    shift it — the temporal-stationarity gate before reusing one
    politeness schedule all week.  Shape: one 24x7 count combiner; the
    expected-cell fold runs on O(168) cells (hour, dow)-ascending."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def cells(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts")}))
        return (
            df.with_columns(
                pl.col("ts").dt.hour().cast(pl.Int64).alias("hr"),
                pl.col("ts").dt.weekday().cast(pl.Int64).alias("dow"),
            )
            .group_by(["hr", "dow"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    cc = (
        ev.map_batches(cells, batch_format="pyarrow")
        .groupby(["hr", "dow"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values(["hr", "dow"])
        .reset_index(drop=True)
    )
    n_tot = float(cc["n"].sum())
    rh = cc.groupby("hr")["n"].sum()
    rd = cc.groupby("dow")["n"].sum()
    chi2 = 0.0
    for _, r_ in cc.iterrows():  # (hr, dow)-ascending fold
        e = rh[r_["hr"]] * rd[r_["dow"]] / n_tot
        chi2 += (r_["n"] - e) ** 2 / e
    df_ = (len(rh) - 1) * (len(rd) - 1)
    return pd.DataFrame(
        {
            "n_events": pd.array([int(n_tot)], dtype="int64"),
            "df": pd.array([df_], dtype="int64"),
            "chi2": [float(_r(chi2, 6))],
        }
    )


def q_inspection_paradox(sf_dir: str):
    """Inspection-paradox audit of per-user event interarrivals: the
    plain mean gap vs the length-biased mean E[g^2] / (2 E[g]) a random
    observer experiences — ratio 1.0 for clockwork traffic, >= 1 for
    bursty (exponential gives exactly 1, heavy tails blow it up); the
    identity capacity planners forget when they average gaps.  Shape:
    per-user consecutive gaps fold inside groupby(user) to (sum g,
    sum g^2, n) partials; three scalars reach the driver."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def gaps(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        us = df["ts"].to_numpy("datetime64[us]").astype("int64") / 1e6
        if len(us) < 2:
            return pa.table(
                {
                    "s": pa.array([0.0], pa.float64()),
                    "s2": pa.array([0.0], pa.float64()),
                    "n": pa.array([0], pa.int64()),
                }
            )
        d = np.diff(us)
        return pa.table(
            {
                "s": pa.array([float(d.sum())], pa.float64()),
                "s2": pa.array([float((d * d).sum())], pa.float64()),
                "n": pa.array([len(d)], pa.int64()),
            }
        )

    agg = (
        ev.groupby("user_id")
        .map_groups(gaps, batch_format="pyarrow")
        .sum(["s", "s2", "n"])
    )
    s, s2, n = float(agg["sum(s)"]), float(agg["sum(s2)"]), float(agg["sum(n)"])
    mean_gap = s / n
    biased = s2 / (2.0 * s)
    return pd.DataFrame(
        {
            "n_gaps": pd.array([int(n)], dtype="int64"),
            "mean_gap_s": [float(_r(mean_gap, 6))],
            "length_biased_s": [float(_r(biased, 6))],
            "paradox_factor": [float(_r(2.0 * biased / mean_gap, 6))],
        }
    )


def q_rmst(sf_dir: str, tau_days: float = 7.0):
    """Restricted mean survival time of signup-to-purchase at tau = 7
    days: the area under the Kaplan-Meier curve up to tau (step-function
    integral over event times, the censoring-honest "average days
    un-converted within a week") — the modern endpoint reported when
    hazards aren't proportional.  Shape: the KM duration fold; the
    O(event times) step integral runs driver-side, window mirror."""
    from .q_stats_b import q_kaplan_meier  # explicit cross-family dep
    km = q_kaplan_meier(sf_dir)
    km = km if isinstance(km, pd.DataFrame) else km.to_pandas()
    tau = tau_days * 86_400_000_000
    t_prev = 0.0
    s_prev = 1.0
    area = 0.0
    for _, r_ in km.sort_values("t_us").iterrows():
        t = float(r_["t_us"])
        if t >= tau:
            break
        area += s_prev * (t - t_prev)
        t_prev, s_prev = t, float(r_["survival"])
    area += s_prev * (tau - t_prev)
    return pd.DataFrame(
        {
            "tau_days": [tau_days],
            "rmst_days": [float(_r(area / 86_400_000_000.0, 6))],
        }
    )


def q_aipw_ate(sf_dir: str):
    """Augmented IPW (doubly robust) treatment effect on purchase value:
    strata = hour quartiles, g = user_id % 2; per arm the AIPW estimate
    combines the stratum outcome means mu_g(s) with the IPW residual
    correction mean(g*(y - mu_1(s))/e(s)) + mean(mu_1(s)) — unbiased if
    EITHER the propensity or the outcome model is right; completes the
    causal trilogy with q_stratified_diff and q_ipw_ate.  Shape: all
    terms come from the same per-(stratum, arm) sufficient-stats
    combiner plus stratum totals; the fold is O(8) driver-side."""
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
    cells = (
        kd.groupby(["s", "g"])
        .aggregate(Sum("v"), Count())
        .to_pandas()
        .rename(columns={"sum(v)": "sv", "count()": "n"})
    )
    cells["mu"] = cells["sv"] / cells["n"]
    stot = cells.groupby("s")["n"].sum()
    n_all = float(cells["n"].sum())
    # AIPW per arm: mean over ALL rows of mu_g(s) + the own-arm residual
    # correction; with mu_g the exact stratum mean the residual term is 0
    # by construction, leaving the direct-standardized mean — the SQL
    # mirrors the FULL expression so the identity is verified, not assumed
    est = {}
    for arm in (0, 1):
        acc = 0.0
        for s in stot.index:
            mu = float(
                cells.loc[(cells["s"] == s) & (cells["g"] == arm), "mu"].sum()
            )
            acc += float(stot[s]) / n_all * mu
        est[arm] = acc
    return pd.DataFrame(
        {
            "mu1_aipw": [float(_r(est[1], 6))],
            "mu0_aipw": [float(_r(est[0], 6))],
            "ate_aipw": [float(_r(est[1] - est[0], 6))],
        }
    )


def q_erlang_blocking(sf_dir: str, service_s: float = 1800.0):
    """Erlang-B blocking curve for the purchase stream: offered load
    E = arrival_rate * service_time (arrivals over the corpus time
    span, 1800 s service), and the blocking probability B(E, m) from
    the numerically stable recursion B_m = E*B_{m-1} / (m + E*B_{m-1})
    for m = 1..8 servers — the sizing table behind every connection /
    worker pool.  Shape: two scalar aggregates (count, span); the O(8)
    recursion is closed-form driver-side, recursive-CTE mirror."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    pur = ev.filter(lambda r: r["event_type"] == "purchase").materialize()
    from ray.data.aggregate import Max, Min

    mm = pur.aggregate(Min("ts"), Max("ts"))
    lo = np.datetime64(mm["min(ts)"], "us").astype("int64") / 1e6
    hi = np.datetime64(mm["max(ts)"], "us").astype("int64") / 1e6
    n = int(pur.count())
    rate = n / (hi - lo)
    e_load = rate * service_s
    rows = []
    b = 1.0
    for m in range(1, 9):
        b = e_load * b / (m + e_load * b)
        rows.append((m, float(_r(b, 6))))
    out = pd.DataFrame(rows, columns=["servers", "blocking"]).astype(
        {"servers": "int64"}
    )
    out["offered_load"] = float(_r(e_load, 6))
    return out[["servers", "offered_load", "blocking"]]


def q_var_cvar(sf_dir: str):
    """Value-at-Risk and CVaR of day-over-day purchase-revenue CHANGES:
    the 5th-percentile delta (exact order statistic, worst expected
    daily drop at 95% confidence) and the expected shortfall (mean of
    deltas at or below the VaR) — the financial tail-risk pair applied
    to revenue operations.  Shape: one (day, cents) combiner; the
    O(days) delta/rank fold is driver-side."""
    ev = _read(sf_dir, "events", columns=["ts", "value", "event_type"])

    def cents(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table(
                {
                    "ts": b.column("ts"),
                    "value": b.column("value"),
                    "event_type": b.column("event_type"),
                }
            )
        )
        return (
            df.filter(pl.col("event_type") == "purchase")
            .with_columns(
                pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"),
                (pl.col("value") * 100.0).round(0).cast(pl.Int64).alias("c"),
            )
            .group_by("day")
            .agg(pl.col("c").sum())
            .to_arrow()
        )

    d = (
        ev.map_batches(cents, batch_format="pyarrow")
        .groupby("day")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    if len(d) < 3:
        return pd.DataFrame(columns=["n_deltas", "var95", "cvar95"]).astype(
            {"n_deltas": "int64", "var95": "float64", "cvar95": "float64"}
        )
    delta = np.diff(d["c"].to_numpy(np.int64)) / 100.0
    srt = np.sort(delta)
    n = len(srt)
    pos = max(int(np.ceil(0.05 * n)), 1)
    var95 = float(srt[pos - 1])
    cvar95 = float(srt[:pos].mean())
    return pd.DataFrame(
        {
            "n_deltas": pd.array([n], dtype="int64"),
            "var95": [float(_r(var95, 6))],
            "cvar95": [float(_r(cvar95, 6))],
        }
    )


def q_s_metric(sf_dir: str):
    """s-metric (Li-Alderson) of the undirected events link graph:
    s(G) = sum over edges of d(u)*d(v), normalized by the s_max of a
    perfectly assortative rewiring approximation (sorted-degree upper
    bound sum d_(i)^2 / 2 restricted to the same edge count) — high S
    means hub-hub wiring, the scale-free-ness number complementary to
    q_degree_assortativity's correlation.  Shape: canonical edge dedupe
    + degree broadcast; one vectorized edge fold; O(1) output."""
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
    deg = pd.concat([e["a"], e["b"]]).value_counts()
    s = float(
        (e["a"].map(deg).to_numpy(np.float64) * e["b"].map(deg).to_numpy(np.float64)).sum()
    )
    # upper bound: pair the largest degrees with themselves (d^2 terms),
    # one term per edge, degree-descending
    d_sorted = np.sort(deg.to_numpy(np.float64))[::-1]
    reps = np.repeat(d_sorted, d_sorted.astype(np.int64))  # endpoint slots
    slots = np.sort(reps)[::-1][: 2 * len(e)]
    smax = float((slots[0::2] * slots[1::2]).sum())
    return pd.DataFrame(
        {
            "n_edges": pd.array([len(e)], dtype="int64"),
            "s_value": [float(_r(s, 6))],
            "s_max_bound": [float(_r(smax, 6))],
            "s_ratio": [float(_r(s / smax, 6))],
        }
    )


def q_theil_decomposition(sf_dir: str):
    """Theil-T inequality decomposition of document length (n_chars)
    across sources: T_total = T_between + sum(share_g * T_within_g)
    EXACTLY — the additive inequality split (is corpus length inequality
    a between-source mix artifact or within every source?) that Gini
    can't decompose.  x ln x folds run group-ascending.  Shape: per-
    source (sum, n) combiner plus one x*ln(x) pass with broadcast
    means; O(sources) cells reach the driver."""
    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])
    m = (
        docs.groupby("source")
        .aggregate(Sum("n_chars"), Count())
        .to_pandas()
        .rename(columns={"sum(n_chars)": "s", "count()": "n"})
    )
    mu_g = dict(zip(m["source"], m["s"] / m["n"]))
    g_ref = ray.put(mu_g)

    def tpass(b: pa.Table, _g=g_ref) -> pa.Table:
        mg = ray.get(_g)
        df = b.to_pandas()
        x = df["n_chars"].to_numpy(np.float64)
        mu = df["source"].map(mg).to_numpy(np.float64)
        r = x / mu
        df["t"] = r * np.log(r)
        g = df.groupby("source", as_index=False)[["t"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    tw = (
        docs.map_batches(tpass, batch_format="pyarrow")
        .groupby("source")
        .sum("t")
        .to_pandas()
        .rename(columns={"sum(t)": "t"})
        .merge(m, on="source")
        .sort_values("source")
        .reset_index(drop=True)
    )
    n_tot = float(tw["n"].sum())
    s_tot = float(tw["s"].sum())
    mu_all = s_tot / n_tot
    t_between = 0.0
    t_within = 0.0
    for _, r_ in tw.iterrows():  # source-ascending fold
        share = float(r_["s"]) / s_tot  # income share of the group
        mug = float(r_["s"]) / float(r_["n"])
        t_between += share * np.log(mug / mu_all)
        t_within += share * float(r_["t"]) / float(r_["n"])
    return pd.DataFrame(
        {
            "t_between": [float(_r(t_between, 6))],
            "t_within": [float(_r(t_within, 6))],
            "t_total": [float(_r(t_between + t_within, 6))],
        }
    )


def q_dup_event_audit(sf_dir: str):
    """Exact duplicate-event audit of the stream: rows identical on
    (user_id, ts, event_type, value) collapse to one logical event; the
    report gives logical events, physical rows, duplicated rows and the
    dup rate — the at-least-once-delivery hygiene check every ingest
    pipeline runs before counting anything.  Shape: one composite-key
    count combiner; the histogram fold to (copies, n_keys) keeps driver
    traffic at O(distinct multiplicities)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["cents"] = _r(df["value"].to_numpy() * 100.0, 0).astype(np.int64)
        df["us"] = df["ts"].to_numpy("datetime64[us]").astype("int64")
        g = df.groupby(
            ["user_id", "us", "event_type", "cents"], as_index=False
        ).size()
        g["n"] = g["size"].astype(np.int64)
        return pa.Table.from_pandas(
            g[["user_id", "us", "event_type", "cents", "n"]], preserve_index=False
        )

    per_key = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["user_id", "us", "event_type", "cents"])
        .sum("n")
        .map_batches(
            lambda b: pa.table({"copies": b.column("sum(n)")}),
            batch_format="pyarrow",
        )
    )
    hist = (
        per_key.groupby("copies")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_keys"})
    )
    logical = int(hist["n_keys"].sum())
    physical = int((hist["copies"] * hist["n_keys"]).sum())
    dup_rows = physical - logical
    return pd.DataFrame(
        {
            "logical_events": pd.array([logical], dtype="int64"),
            "physical_rows": pd.array([physical], dtype="int64"),
            "dup_rows": pd.array([dup_rows], dtype="int64"),
            "dup_rate": [float(_r(dup_rows / physical, 6))],
        }
    )


def q_round_number_bias(sf_dir: str, k: int = 5):
    """Round-number bias in purchase values: the distribution of cents
    residues (value*100 mod 100), the top-k most common residues, and
    the chi-square against residue uniformity — the pricing-psychology
    / synthetic-data fingerprint (.00-heavy data is hand-entered or
    generated, uniform residues look organic).  Shape: one 100-cell
    residue combiner; O(100) folds driver-side."""
    ev = _read(sf_dir, "events", columns=["value", "event_type"])

    def residues(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"] == "purchase"]
        cents = _r(df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        res = cents % 100
        vals, cnts = np.unique(res, return_counts=True)
        return pa.table(
            {
                "residue": pa.array(vals.astype(np.int64)),
                "n": pa.array(cnts.astype(np.int64)),
            }
        )

    hist = (
        ev.map_batches(residues, batch_format="pyarrow")
        .groupby("residue")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    n_tot = float(hist["n"].sum())
    e = n_tot / 100.0
    full = hist.set_index("residue").reindex(range(100), fill_value=0)
    chi2 = float((((full["n"] - e) ** 2) / e).sum())
    top = (
        hist.sort_values(["n", "residue"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["share"] = _r(top["n"] / n_tot, 6)
    top["chi2_uniform"] = float(_r(chi2, 6))
    top["residue"] = top["residue"].astype("int64")
    top["n"] = top["n"].astype("int64")
    return top[["rank", "residue", "n", "share", "chi2_uniform"]]


def q_core_periphery(sf_dir: str, k_core: int = 10):
    """Borgatti-Everett core-periphery fit of the undirected events link
    graph with the top-10 degree nodes as the candidate core: block
    densities core-core / core-periphery / periphery-periphery and the
    fit quality cc_density - pp_density — a proper core has a dense
    core block and sparse periphery block, the structural question
    behind hub-first crawl scheduling.  Shape: canonical edge dedupe +
    degree combiner; block tallies are one vectorized edge pass with
    the broadcast core set; O(3) cells move."""
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
    deg = pd.concat([e["a"], e["b"]]).value_counts()
    order = (
        pd.DataFrame({"node": deg.index, "d": deg.values})
        .sort_values(["d", "node"], ascending=[False, True])["node"]
        .tolist()
    )
    core = set(order[:k_core])
    n_core = len(core)
    n_per = len(deg) - n_core
    in_a = e["a"].isin(core).to_numpy()
    in_b = e["b"].isin(core).to_numpy()
    cc = int((in_a & in_b).sum())
    cp = int((in_a ^ in_b).sum())
    pp = int((~in_a & ~in_b).sum())
    d_cc = cc / (n_core * (n_core - 1) / 2)
    d_cp = cp / (n_core * n_per)
    d_pp = pp / (n_per * (n_per - 1) / 2) if n_per > 1 else float("nan")
    return pd.DataFrame(
        {
            "n_core": pd.array([n_core], dtype="int64"),
            "cc_density": [float(_r(d_cc, 6))],
            "cp_density": [float(_r(d_cp, 6))],
            "pp_density": [float(_r(d_pp, 6)) if d_pp == d_pp else float("nan")],
            "coreness": [
                float(_r(d_cc - d_pp, 6)) if d_pp == d_pp else float("nan")
            ],
        }
    )


def q_periodic_user_screen(sf_dir: str, min_events: int = 5):
    """Periodic-cadence (cron-bot) screen: per user with >= 5 events, the
    modal inter-event gap rounded to the minute and its share of the
    user's gaps; users whose modal gap covers >= 50% are 'periodic' —
    reported as counts per share band (lt25 / 25-50 / ge50) — the
    clockwork fingerprint that complements q_user_hour_entropy's
    marginal-distribution view.  Shape: per-user gap-mode fold inside
    groupby(user); the band histogram is a tiny second groupby."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def mode_share(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        if len(df) < min_events:
            return pa.table(
                {"band": pa.array([], pa.string()), "one": pa.array([], pa.int64())}
            )
        us = df["ts"].to_numpy("datetime64[us]").astype("int64")
        gaps = np.diff(us) // 60_000_000  # minutes
        vals, cnts = np.unique(gaps, return_counts=True)
        share = float(cnts.max()) / len(gaps)
        band = "ge50" if share >= 0.5 else ("b25to50" if share >= 0.25 else "a_lt25")
        return pa.table(
            {"band": pa.array([band], pa.string()), "one": pa.array([1], pa.int64())}
        )

    out = (
        ev.groupby("user_id")
        .map_groups(mode_share, batch_format="pyarrow")
        .groupby("band")
        .sum("one")
        .to_pandas()
        .rename(columns={"sum(one)": "n_users"})
        .sort_values("band")
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out[["band", "n_users"]]


def q_erlang_c_wait(sf_dir: str, service_s: float = 1800.0):
    """Erlang-C delay metrics for the purchase stream at m = 2 / 4 / 8
    servers: P(wait) via C = B*m / (m - E*(1-B)) from the Erlang-B
    recursion, plus the mean queue wait Wq = C / (m*mu - lambda) and
    Little's Lq = lambda*Wq (unstable systems report NaN) — the
    queueing-delay sizing that q_erlang_blocking's loss model can't
    give.  Shape: same two scalar aggregates; closed-form driver fold,
    recursive-CTE mirror for the B chain."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    pur = ev.filter(lambda r: r["event_type"] == "purchase").materialize()
    from ray.data.aggregate import Max, Min

    mm = pur.aggregate(Min("ts"), Max("ts"))
    lo = np.datetime64(mm["min(ts)"], "us").astype("int64") / 1e6
    hi = np.datetime64(mm["max(ts)"], "us").astype("int64") / 1e6
    n = int(pur.count())
    lam = n / (hi - lo)
    e_load = lam * service_s
    rows = []
    b = 1.0
    for m in range(1, 9):
        b = e_load * b / (m + e_load * b)
        if m in (2, 4, 8):
            if m > e_load:
                c = b * m / (m - e_load * (1.0 - b))
                wq = c / (m / service_s - lam)
                lq = lam * wq
                rows.append(
                    (m, float(_r(c, 6)), float(_r(wq, 6)), float(_r(lq, 6)))
                )
            else:
                rows.append((m, float("nan"), float("nan"), float("nan")))
    out = pd.DataFrame(rows, columns=["servers", "p_wait", "wq_s", "lq"]).astype(
        {"servers": "int64"}
    )
    out["offered_load"] = float(_r(e_load, 6))
    return out[["servers", "offered_load", "p_wait", "wq_s", "lq"]]


def q_quantizer_compare(sf_dir: str, bins: int = 8):
    """Quantizer shoot-out on the purchase-value column: 8-level
    equal-WIDTH vs equal-FREQUENCY (octile) scalar quantization,
    each reconstructing values by its bin mean; reports both MSEs and
    the frequency/width ratio — equal-frequency wins on skewed data,
    which is exactly what this measures (the decision behind
    q_sq8_error's production int8 layout).  Shape: global min/max +
    octile cuts (exact interpolated), then ONE pass accumulating both
    reconstruction errors via per-bin sufficient stats; O(16) cells."""
    ev = _read(sf_dir, "events", columns=["event_id", "value", "event_type"])
    pur = ev.filter(lambda r: r["event_type"] == "purchase").materialize()
    from ray.data.aggregate import Max, Min

    mm = pur.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0
    # exact octile cut points via the sorted driver pluck over the value
    # histogram (values repeat: distinct-value histogram is small)
    hist = (
        pur.groupby("value").count().to_pandas().rename(columns={"count()": "n"})
        .sort_values("value").reset_index(drop=True)
    )
    vals = np.repeat(hist["value"].to_numpy(np.float64), hist["n"].to_numpy(np.int64))
    n = len(vals)
    cuts = [vals[min(int(np.ceil(q / bins * n)), n) - 1] for q in range(1, bins)]

    def cells(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"] == "purchase"]
        v = df["value"].to_numpy(np.float64)
        bw = np.minimum(np.floor((v - lo) / span * bins).astype(np.int64), bins - 1)
        bf = np.searchsorted(cuts, v, side="left").astype(np.int64)
        out = []
        for tag, bb in (("w", bw), ("f", bf)):
            t = pd.DataFrame({"b": bb, "v": v, "v2": v * v})
            g = t.groupby("b", as_index=False).agg(
                s=("v", "sum"), s2=("v2", "sum"), n=("v", "size")
            )
            g["scheme"] = tag
            g["n"] = g["n"].astype(np.int64)
            out.append(g)
        return pa.Table.from_pandas(pd.concat(out), preserve_index=False)

    cc = (
        ev.map_batches(cells, batch_format="pyarrow")
        .groupby(["scheme", "b"])
        .aggregate(Sum("s"), Sum("s2"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(s)": "s", "sum(s2)": "s2", "sum(n)": "n"})
    )
    mses = {}
    for scheme in ("f", "w"):
        sub = cc[cc["scheme"] == scheme]
        sse = float((sub["s2"] - sub["s"] ** 2 / sub["n"]).sum())
        mses[scheme] = sse / float(sub["n"].sum())
    return pd.DataFrame(
        {
            "n_values": pd.array([n], dtype="int64"),
            "mse_width": [float(_r(mses["w"], 6))],
            "mse_freq": [float(_r(mses["f"], 6))],
            "freq_vs_width": [float(_r(mses["f"] / mses["w"], 6))],
        }
    )


def q_simpson_paradox(sf_dir: str):
    """Simpson's-paradox detector on the Gopher keep rate: cohorts =
    doc_id parity, strata = language; the aggregate keep-rate difference
    vs each stratum's difference, flagging when the aggregate sign
    disagrees with EVERY stratum's sign — the aggregation pitfall that
    makes per-stratum reporting mandatory.  Shape: one (lang, cohort,
    keeps, n) combiner; the O(langs) fold is driver-side."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        from collections import defaultdict

        acc = defaultdict(lambda: [0, 0])
        for d, t, l in zip(
            b.column("doc_id").to_pylist(),
            b.column("text").to_pylist(),
            b.column("lang").to_pylist(),
        ):
            a = acc[(l, int(d) % 2)]
            a[0] += _gopher_stats(_oracle_tokens(t))[4]
            a[1] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "g": pa.array([k[1] for k in ks], pa.int64()),
                "k": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n": pa.array([acc[k][1] for k in ks], pa.int64()),
            }
        )

    cc = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "g"])
        .aggregate(Sum("k"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(k)": "k", "sum(n)": "n"})
    )
    agg = cc.groupby("g")[["k", "n"]].sum()
    agg_diff = float(agg.loc[1, "k"] / agg.loc[1, "n"] - agg.loc[0, "k"] / agg.loc[0, "n"])
    rows = []
    signs = []
    for lang in sorted(cc["lang"].unique()):
        sub = cc[cc["lang"] == lang].set_index("g")
        if 0 not in sub.index or 1 not in sub.index:
            continue
        d = float(
            sub.loc[1, "k"] / sub.loc[1, "n"] - sub.loc[0, "k"] / sub.loc[0, "n"]
        )
        signs.append(np.sign(d))
        rows.append((lang, float(_r(d, 6))))
    flip = int(
        len(signs) > 0
        and all(s * np.sign(agg_diff) < 0 for s in signs if s != 0)
        and np.sign(agg_diff) != 0
    )
    out = pd.DataFrame(rows, columns=["lang", "stratum_diff"])
    out["aggregate_diff"] = float(_r(agg_diff, 6))
    out["paradox"] = flip
    return out.astype({"paradox": "int64"})


def q_benford_second_digit(sf_dir: str):
    """Benford SECOND-digit screen of lineitem extended prices: observed
    second-digit shares vs the Benford second-digit law P(d) =
    sum_{k=1..9} log10(1 + 1/(10k + d)) with the chi-squared distance —
    the forensic follow-up auditors run when the first-digit test
    passes (fabricated data often fixes digit 1 and botches digit 2).
    Shape: one 10-cell digit combiner via printf-exact string digits;
    the O(10) fold is driver-side."""
    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def digits(b: pa.Table) -> pa.Table:
        out = np.zeros(10, np.int64)
        for v in b.column("l_extendedprice").to_pylist():
            s = f"{float(v):.6f}".lstrip("0.").replace(".", "")
            if len(s) >= 2:
                out[int(s[1])] += 1
        return pa.table(
            {
                "digit": pa.array(np.arange(10, dtype=np.int64)),
                "n": pa.array(out),
            }
        )

    hist = (
        li.map_batches(digits, batch_format="pyarrow")
        .groupby("digit")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .set_index("digit")
        .reindex(range(10), fill_value=0)
    )
    n_tot = float(hist["n"].sum())
    exp = np.array(
        [
            sum(np.log10(1.0 + 1.0 / (10 * k + d)) for k in range(1, 10))
            for d in range(10)
        ]
    )
    obs = hist["n"].to_numpy(np.float64) / n_tot
    chi2 = float((((hist["n"].to_numpy(np.float64) - n_tot * exp) ** 2)
                  / (n_tot * exp)).sum())
    out = pd.DataFrame(
        {
            "digit": pd.array(range(10), dtype="int64"),
            "observed": _r(obs, 6),
            "expected": _r(exp, 6),
        }
    )
    out["chi2"] = float(_r(chi2, 6))
    return out


def q_ttt_statistic(sf_dir: str):
    """Total-time-on-test exponentiality statistic of the purchase
    interarrival gaps: with order statistics g_(1) <= ... <= g_(n),
    the scaled TTT transform at k is H(k) = sum_{i<=k} (n-i+1)(g_(i) -
    g_(i-1)) / sum(g); the statistic is the mean of H(1..n-1) — exactly
    0.5 for exponential gaps, > 0.5 for DFR/bursty, < 0.5 for IFR/
    regular traffic — the reliability-engineering twin of
    q_inspection_paradox.  Shape: gaps fold per user then the O(n)
    sorted TTT fold runs driver-side, window mirror."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def gaps(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df[df["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        if len(df) < 2:
            return pa.table({"g": pa.array([], pa.float64())})
        us = df["ts"].to_numpy("datetime64[us]").astype("int64") / 1e6
        return pa.table({"g": pa.array(np.diff(us), pa.float64())})

    gg = (
        ev.groupby("user_id")
        .map_groups(gaps, batch_format="pyarrow")
        .to_pandas()["g"]
        .sort_values()
        .to_numpy(np.float64)
    )
    n = len(gg)
    if n < 3:
        return pd.DataFrame(columns=["n_gaps", "ttt_stat"]).astype(
            {"n_gaps": "int64", "ttt_stat": "float64"}
        )
    tot = float(gg.sum())
    prev = 0.0
    h = 0.0
    acc = 0.0
    for i in range(1, n):  # H(1..n-1), order-statistic fold
        h += (n - i + 1) * (gg[i - 1] - prev) / tot
        prev = gg[i - 1]
        acc += h
    stat = acc / (n - 1)
    return pd.DataFrame(
        {
            "n_gaps": pd.array([n], dtype="int64"),
            "ttt_stat": [float(_r(stat, 6))],
        }
    )


def q_grubbs_test(sf_dir: str):
    """Grubbs single-outlier statistic on the daily event volume:
    G = max|x - mean| / s (sample sd) plus the flagged day (earliest on
    ties by |dev| desc, day asc) — the one-at-a-time outlier test run
    before trusting a daily aggregate.  Shape: _daily_counts reduce;
    O(days) fold driver-side."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 3:
        return pd.DataFrame(columns=["day", "m_days", "g_stat"]).astype(
            {"m_days": "int64", "day": "float64", "g_stat": "float64"}
        )
    mu = float(x.sum()) / m
    s = float(np.sqrt(((x - mu) ** 2).sum() / (m - 1)))
    dev = np.abs(x - mu)
    i = int(np.argmax(dev))  # earliest day on exact ties
    return pd.DataFrame(
        {
            "day": [d["day"].iloc[i]],
            "m_days": pd.array([m], dtype="int64"),
            "g_stat": [float(_r(dev[i] / s, 6))],
        }
    )


def q_cooks_distance(sf_dir: str, k: int = 3):
    """Cook's distance of each day on the daily-volume linear trend: with
    leverage h_i = 1/m + (t_i - tbar)^2 / Stt and p = 2 parameters,
    D_i = e_i^2 h_i / (p * s^2 * (1 - h_i)^2); reports the top-3 most
    influential days — the which-day-is-bending-my-trend diagnostic
    that residual size alone misses (high-leverage endpoints).  Shape:
    _daily_counts reduce; the OLS + influence folds are O(days)
    driver-side, window mirrors."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < 4:
        return pd.DataFrame(columns=["rank", "day", "cooks_d"]).astype(
            {"rank": "int64", "day": "float64", "cooks_d": "float64"}
        )
    t = np.arange(m, dtype=np.float64)
    tb, xb = t.mean(), x.mean()
    stt = float(((t - tb) ** 2).sum())
    b1 = float(((t - tb) * (x - xb)).sum() / stt)
    b0 = xb - b1 * tb
    e = x - b0 - b1 * t
    s2 = float((e * e).sum()) / (m - 2)
    h = 1.0 / m + (t - tb) ** 2 / stt
    dcook = e * e * h / (2.0 * s2 * (1.0 - h) ** 2)
    dd = pd.DataFrame({"day": d["day"], "cooks_d": _r(dcook, 6)})
    top = (
        dd.sort_values(["cooks_d", "day"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "day", "cooks_d"]]


def q_newey_west_se(sf_dir: str, lags: int = 3):
    """Newey-West (HAC) standard error of the mean daily event volume
    with Bartlett weights at lags 1..3: sqrt((gamma_0 + 2 * sum w_l *
    gamma_l) / m) vs the naive iid SE — the autocorrelation-honest
    uncertainty for any time-averaged metric (positive dependence makes
    naive SEs overconfident by exactly this ratio).  Shape:
    _daily_counts reduce; the O(days x lags) covariance folds mirror
    acf's self-join chain."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    if m < lags + 2:
        return pd.DataFrame(
            columns=["m_days", "se_naive", "se_hac", "inflation"]
        ).astype({"m_days": "int64", "se_naive": "float64", "se_hac": "float64", "inflation": "float64"})
    mu = float(x.sum()) / m
    xc = x - mu
    gamma0 = float((xc * xc).sum()) / m
    acc = gamma0
    for l in range(1, lags + 1):
        gl = float((xc[:-l] * xc[l:]).sum()) / m
        acc += 2.0 * (1.0 - l / (lags + 1.0)) * gl
    se_naive = float(np.sqrt(gamma0 / m))
    se_hac = float(np.sqrt(acc / m)) if acc > 0 else float("nan")
    return pd.DataFrame(
        {
            "m_days": pd.array([m], dtype="int64"),
            "se_naive": [float(_r(se_naive, 6))],
            "se_hac": [float(_r(se_hac, 6)) if se_hac == se_hac else float("nan")],
            "inflation": [
                float(_r(se_hac / se_naive, 6))
                if se_hac == se_hac
                else float("nan")
            ],
        }
    )

__all__ = [
    "q_k_anonymity",
    "q_l_diversity",
    "q_nelson_aalen",
    "q_sax_symbols",
    "q_abc_analysis",
    "q_harrell_c",
    "q_als_rank1",
    "q_learned_index_audit",
    "q_zone_map_audit",
    "q_sort_order_benefit",
    "q_dag_layers",
    "q_ipw_ate",
    "q_cache_working_set",
    "q_coupon_collector",
    "q_peak_to_mean",
    "q_gompertz_fit",
    "q_weibull_hazard",
    "q_seasonal_chi2",
    "q_inspection_paradox",
    "q_rmst",
    "q_aipw_ate",
    "q_erlang_blocking",
    "q_var_cvar",
    "q_s_metric",
    "q_theil_decomposition",
    "q_dup_event_audit",
    "q_round_number_bias",
    "q_core_periphery",
    "q_periodic_user_screen",
    "q_erlang_c_wait",
    "q_quantizer_compare",
    "q_simpson_paradox",
    "q_benford_second_digit",
    "q_ttt_statistic",
    "q_grubbs_test",
    "q_cooks_distance",
    "q_newey_west_se",
]
