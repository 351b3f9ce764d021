"""Stats B query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_pr_curve(sf_dir: str, steps: int = 13):
    """Precision-recall curve of a cheap ranking signal (stopword ratio,
    the quality_score column) against the Gopher keep verdict as ground
    truth — the classifier-eval primitive that tells a curation pipeline
    where to put its quality threshold (calibration tables say HOW WRONG
    the scores are; PR says what a cut COSTS in yield).  One map pass
    computes (score, label) per doc, each batch folds to per-threshold
    (selected, true-positive, positive) integer partials over the fixed
    i*0.05 grid, one tiny groupby sums them — exact integers to the
    driver, identical threshold doubles on both sides."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    thr = [i * 0.05 for i in range(steps)]

    def part(b: pa.Table) -> pa.Table:
        srs, keeps = [], []
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            sr = float(_r(sum(1 for w in toks if w in _STOPWORDS) / len(toks), 4))
            srs.append(sr)
            keeps.append(_gopher_stats(toks)[4])
        sr_a = np.array(srs)
        kp = np.array(keeps)
        return pa.table(
            {
                "i": pa.array(range(steps), pa.int64()),
                "n_sel": pa.array([int((sr_a >= t).sum()) for t in thr], pa.int64()),
                "n_tp": pa.array(
                    [int(((sr_a >= t) & (kp == 1)).sum()) for t in thr], pa.int64()
                ),
                "n_pos": pa.array([int((kp == 1).sum())] * steps, pa.int64()),
            }
        )

    agg = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("i")
        .aggregate(
            Sum("n_sel", alias_name="n_sel"),
            Sum("n_tp", alias_name="n_tp"),
            Sum("n_pos", alias_name="n_pos"),
        )
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "thr": [float(_r(t, 2)) for t in thr],
            "n_sel": agg["n_sel"].astype("int64"),
            "prec": [
                float(_r(tp * 1.0 / s, 6)) if s else np.nan
                for tp, s in zip(agg["n_tp"], agg["n_sel"])
            ],
            "rec": [
                float(_r(tp * 1.0 / p, 6)) if p else np.nan
                for tp, p in zip(agg["n_tp"], agg["n_pos"])
            ],
        }
    )
    return out


def q_hapax_ratio(sf_dir: str):
    """Hapax legomena profile: how much of the vocabulary (and of the
    token stream) is words seen exactly once — the lexical-richness dial
    that pairs with zipf_fit/heaps_law (natural corpora run ~40-60% hapax
    vocab; template spam collapses it).  Vocab counts build with the
    combiner groupby, then each count-table batch folds to 4 integers
    (vocab, hapax, tokens, hapax tokens) summed driver-side — the
    vocabulary itself never reaches the driver."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for t in b.column("text").to_pylist():
            cnt.update(_oracle_tokens(t))
        return pa.table(
            {
                "token": pa.array(list(cnt.keys()), pa.string()),
                "cnt": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    counts = docs.map_batches(vc, batch_format="pyarrow").groupby("token").sum("cnt")

    def fold(b: pa.Table) -> pa.Table:
        c = b.column(1).to_numpy()
        return pa.table(
            {
                "vocab": pa.array([len(c)], pa.int64()),
                "hapax": pa.array([int((c == 1).sum())], pa.int64()),
                "tokens": pa.array([int(c.sum())], pa.int64()),
            }
        )

    f = counts.map_batches(fold, batch_format="pyarrow").to_pandas().sum()
    v, h, tk = int(f["vocab"]), int(f["hapax"]), int(f["tokens"])
    return pd.DataFrame(
        {
            "vocab": [v],
            "hapax": [h],
            "hapax_vocab_frac": [float(_r(h * 1.0 / v, 6))],
            "hapax_token_frac": [float(_r(h * 1.0 / tk, 6))],
        }
    )


def q_roc_auc(sf_dir: str):
    """Exact ROC-AUC of the stopword-ratio signal against the Gopher keep
    verdict — the Mann-Whitney rank-sum form with average ranks for ties,
    computed WITHOUT a global sort exactly like length_gini: one combiner
    groupby reduces the corpus to the distinct-score histogram with
    per-value (positive, negative) counts, and the rank-sum folds per
    value run in EXACT integer arithmetic (2*ranksum = sum p*(2a+p+q+1)),
    so the only float is the final division — both sides divide identical
    integers.  Pairs with pr_curve: PR says what a cut costs, AUC scores
    the signal itself."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        pos: Counter = Counter()
        neg: Counter = Counter()
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            sr = float(_r(sum(1 for w in toks if w in _STOPWORDS) / len(toks), 4))
            if _gopher_stats(toks)[4]:
                pos[sr] += 1
            else:
                neg[sr] += 1
        vals = sorted(set(pos) | set(neg))
        return pa.table(
            {
                "v": pa.array(vals, pa.float64()),
                "p": pa.array([pos.get(v, 0) for v in vals], pa.int64()),
                "q": pa.array([neg.get(v, 0) for v in vals], pa.int64()),
            }
        )

    h = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("p", alias_name="p"), Sum("q", alias_name="q"))
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    a = 0
    r2 = 0
    np_, nq_ = 0, 0
    for _, r in h.iterrows():
        p, q = int(r["p"]), int(r["q"])
        r2 += p * (2 * a + p + q + 1)
        np_ += p
        nq_ += q
        a += p + q
    # single-class corpus: AUC undefined, NULL like the mirror
    auc = (r2 - np_ * (np_ + 1)) * 1.0 / (2 * np_ * nq_) if np_ and nq_ else np.nan
    return pd.DataFrame(
        {"n_pos": [np_], "n_neg": [nq_], "auc": [float(_r(auc, 6))]}
    )


def q_ewma_daily(sf_dir: str, alpha: float = 0.3):
    """Exponentially-weighted moving average of the daily event volume
    (s_t = alpha*x_t + (1-alpha)*s_{t-1}, s_1 = x_1) — the smoothing a
    crawl-ops dashboard lays over raw ingest counts before alerting.  The
    inherently-sequential recurrence runs over the DIM-SIZED daily series
    only: the corpus reduces to per-day counts via the combiner groupby,
    and the O(days) fold happens driver-side in the exact double order
    the recursive-CTE mirror replays (identical doubles before the 4dp
    round)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def per_day(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy().astype("datetime64[D]").astype(str)
        vals, cnts = np.unique(days, return_counts=True)
        return pa.table(
            {
                "day": pa.array(vals, pa.string()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    d = (
        ds.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    s = None
    out = []
    for _, r in d.iterrows():
        x = float(r["n"])
        s = x if s is None else alpha * x + (1 - alpha) * s
        out.append(s)
    return pd.DataFrame(
        {
            "day": d["day"],
            "n_events": d["n"].astype("int64"),
            "ewma": [float(_r(v, 4)) for v in out],
        }
    )


def q_leaky_bucket_replay(sf_dir: str, gap_us: int = 21_600_000_000):
    """Leaky-bucket politeness replay: treat each user's event stream as a
    host's fetch-request log and compute, under a min-gap rate limit
    (grant_i = max(arrival_i, grant_{i-1} + gap)), how long every request
    waits — the deterministic what-if a crawl scheduler runs before
    committing a per-host budget (AsyncItemBucket's admission rule
    unrolled over time; complements politeness_admission's per-round
    quota view).  Exactly the scheduler's parallelism: hosts fold in
    parallel (one groupby(user).map_groups), the recurrence inside a host
    is sequential BY DEFINITION.  All arithmetic is integer microseconds
    — both sides replay identical grants."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def replay(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
        # unit-explicit epoch microseconds (parquet timestamps are us here;
        # an ns-assuming //1000 would silently land on milliseconds)
        a = pd.Series(df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        grants = np.empty(len(df), dtype=np.int64)
        prev = None
        for i, ai in enumerate(a):
            gi = ai if prev is None else max(ai, prev + gap_us)
            grants[i] = gi
            prev = gi
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
                "delay_us": pa.array(grants - a.to_numpy(), pa.int64()),
            }
        )

    return (
        ev.groupby("user_id")
        .map_groups(replay, batch_format="pyarrow")
        .sort(["user_id", "event_id"])
    )


def q_edit_journeys(sf_dir: str):
    """User-journey similarity: Levenshtein distance between consecutive
    users' event-TYPE sequences (each journey rendered as one string of
    per-event type initials, time-ordered) — the session-comparison
    primitive behind behavioral cohorting and bot-pattern detection.
    Journeys build with one groupby(user).map_groups fold; rank-adjacent
    pairing is fully distributed (journeys are corpus-linear, one row per
    user): user_id//64 is an order-preserving bucket, pass 1 gives the
    driver per-bucket counts for exclusive offsets, and pairing re-buckets
    by rank//chunk with a 1-row boundary replica so every adjacent pair
    sits whole in exactly one chunk — the sorted_neighborhood machinery at
    window 1.  Scores use the repo's _levenshtein kernel (pinned
    cell-for-cell against DuckDB's levenshtein in levenshtein_verify)."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def journey(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
        s = "".join(t[0] for t in df["event_type"])
        return pa.table(
            {
                "user_id": pa.array([int(df["user_id"].iloc[0])], pa.int64()),
                "journey": pa.array([s], pa.string()),
            }
        )

    j = ev.groupby("user_id").map_groups(journey, batch_format="pyarrow")

    def bucketed(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        return b.append_column("bkt", pa.array(u // 64, pa.int64()))

    jb_ds = j.map_batches(bucketed, batch_format="pyarrow").materialize()
    bc = jb_ds.groupby("bkt").count().to_pandas().sort_values("bkt")
    offsets = dict(
        zip(bc["bkt"].astype(int),
            bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)
    chunk = 256

    def rank_and_chunk(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values("user_id").reset_index(drop=True)
        rn = off[int(df["bkt"].iloc[0])] + np.arange(len(df), dtype=np.int64)
        df["rn"] = rn
        t = pa.Table.from_pandas(df[["user_id", "journey", "rn"]], preserve_index=False)
        own = rn // chunk
        tables = [t.append_column("chunk", pa.array(own, pa.int64()))]
        repl = (rn % chunk == 0) & (own > 0)
        if repl.any():
            rep = t.filter(pa.array(repl))
            tables.append(
                rep.append_column(
                    "chunk",
                    pa.array(rep.column("rn").to_numpy() // chunk - 1, pa.int64()),
                )
            )
        return pa.concat_tables(tables)

    def adjacent_pairs(g: pa.Table) -> pa.Table:
        c = int(g.column("chunk")[0].as_py())
        df = g.to_pandas().sort_values("rn").reset_index(drop=True)
        rn = df["rn"].to_numpy()
        rows = []
        for i in range(len(df) - 1):
            if rn[i] // chunk != c or rn[i + 1] != rn[i] + 1:
                continue
            ja, jb = df["journey"].iloc[i], df["journey"].iloc[i + 1]
            rows.append(
                (int(df["user_id"].iloc[i]), int(df["user_id"].iloc[i + 1]),
                 len(ja), len(jb), _levenshtein(ja, jb))
            )
        return pa.table(
            {
                "user_a": pa.array([r[0] for r in rows], pa.int64()),
                "user_b": pa.array([r[1] for r in rows], pa.int64()),
                "len_a": pa.array([r[2] for r in rows], pa.int64()),
                "len_b": pa.array([r[3] for r in rows], pa.int64()),
                "edit_dist": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    return (
        jb_ds.groupby("bkt")
        .map_groups(rank_and_chunk, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(adjacent_pairs, batch_format="pyarrow")
        .sort("user_a")
    )


def q_sorted_neighborhood(sf_dir: str, w: int = 3, chunk: int = 256):
    """Sorted-Neighborhood-Method candidate generation + exact verify:
    sort the corpus on a weak blocking key (the 2-token lede, the
    lede-dedup key), slide a w-row window down the sorted order, and
    score every in-window pair with exact distinct-token Jaccard — the
    third blocking family next to LSH (minhash) and fingerprint blocking
    (fuzzy_dedup), and the one that catches prefix-similar records those
    miss.  Fully distributed sort-free rank: the key's 2-char prefix is
    an ORDER-PRESERVING bucket (shuffle_rank's pattern for strings),
    pass 1 gives the driver per-bucket counts for exclusive offsets,
    pass 2 argsorts within buckets; pair generation re-buckets by
    rank//chunk with w-row boundary replication so every window sits
    whole in exactly one chunk, and each pair is emitted only by the
    chunk owning its smaller rank."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        ids, ks, sets = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            ids.append(d)
            ks.append(" ".join(toks[:2]))
            sets.append(sorted(set(toks)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k": pa.array(ks, pa.string()),
                "bkt": pa.array([k[:2] for k in ks], pa.string()),
                "s": pa.array(sets, pa.list_(pa.string())),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = keyed_ds.groupby("bkt").count().to_pandas().sort_values("bkt")
    offsets = dict(
        zip(bc["bkt"], bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)

    def rank(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values(["k", "doc_id"]).reset_index(drop=True)
        base = off[df["bkt"].iloc[0]]
        df["rn"] = base + np.arange(len(df), dtype=np.int64)
        return pa.Table.from_pandas(df[["doc_id", "s", "rn"]], preserve_index=False)

    ranked = keyed_ds.groupby("bkt").map_groups(rank, batch_format="pyarrow")

    def to_chunks(b: pa.Table, _w=w, _c=chunk) -> pa.Table:
        rn = b.column("rn").to_numpy()
        own = rn // _c
        tables = [b.append_column("chunk", pa.array(own, pa.int64()))]
        repl = (rn % _c < _w) & (own > 0)
        if repl.any():
            rep = b.filter(pa.array(repl))
            tables.append(
                rep.append_column(
                    "chunk", pa.array(rep.column("rn").to_numpy() // _c - 1, pa.int64())
                )
            )
        return pa.concat_tables(tables)

    def window_pairs(g: pa.Table, _w=w, _c=chunk) -> pa.Table:
        c = int(g.column("chunk")[0].as_py())
        df = g.to_pandas().sort_values("rn").reset_index(drop=True)
        rn = df["rn"].to_numpy()
        out_a, out_b, out_j = [], [], []
        for i in range(len(df)):
            if rn[i] // _c != c:
                continue  # boundary copy: pairs owned by the other chunk
            sa = set(df["s"].iloc[i])
            for j in range(i + 1, len(df)):
                if rn[j] - rn[i] > _w:
                    break
                sb = set(df["s"].iloc[j])
                inter = len(sa & sb)
                out_a.append(int(df["doc_id"].iloc[i]))
                out_b.append(int(df["doc_id"].iloc[j]))
                out_j.append(
                    float(_r(inter * 1.0 / (len(sa) + len(sb) - inter), 6))
                )
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jac": pa.array(out_j, pa.float64()),
            }
        )

    return (
        ranked.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(window_pairs, batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )


def q_neyman_allocation(sf_dir: str, budget: int = 1000):
    """Neyman optimal stratified-sampling allocation: split an audit
    budget across sources proportionally to N_h * sigma_h (stratum size x
    doc-length std) — the survey-sampling rule that minimizes the
    estimator variance for a fixed labeling budget; the quantitative
    upgrade of proportional stratified_sample.  One combiner pass reduces
    each source to exact integer (n, sum, sumsq); sigma uses the
    computational formula in the mirror's operation order; shares round
    6dp and integer allocations floor identically."""
    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def part(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pandas(),
                "v": b.column("n_chars").to_numpy(),
            }
        )
        g = df.groupby("source").agg(
            n=("v", "size"), s=("v", "sum"), ss=("v", lambda x: int((x.astype(object) ** 2).sum()))
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("ss", alias_name="ss"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    import math

    ws = []
    for _, r in agg.iterrows():
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        var = (ss - s * s * 1.0 / n) / (n - 1) if n > 1 else 0.0
        ws.append(n * math.sqrt(var))
    tot = sum(ws)
    rows = []
    for (_, r), w in zip(agg.iterrows(), ws):
        share = w / tot if tot else np.nan
        rows.append(
            {
                "source": r["source"],
                "n_docs": int(r["n"]),
                "share": float(_r(share, 6)) if tot else np.nan,
                "n_alloc": int(math.floor(budget * share)) if tot else 0,
            }
        )
    return pd.DataFrame(rows)


def q_kcenter_greedy(sf_dir: str, k: int = 5):
    """Gonzalez k-center greedy (farthest-point traversal) over the
    embedding corpus: start from vec_id 0, repeatedly add the vector
    farthest (euclidean) from the chosen set — the 2-approximation
    coverage/diversity sampler behind coreset selection and diverse
    seed picking (the opposite pull of SemDeDup's prune-the-close).
    Each of the k-1 rounds is ONE streaming pass: the chosen matrix
    (k x d, tiny) broadcasts via ray.put, every batch emits only its own
    argmax candidate, and the driver merges O(blocks) rows — the corpus
    is never collected or re-shuffled."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = emb.filter(expr="vec_id == 0").to_pandas()
    chosen_ids = [0]
    chosen_vecs = [np.asarray(first["embedding"].iloc[0], dtype=np.float64)]
    rows = [{"step": 1, "vec_id": 0, "dist": 0.0}]
    for step in range(2, k + 1):
        ref = ray.put(np.stack(chosen_vecs))

        def far(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            ids = b.column("vec_id").to_numpy()
            m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            # min distance to the chosen set, per row
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            dmin = np.sqrt(d2.min(axis=1))
            order = np.lexsort((ids, -dmin))
            i = order[0]
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[i])], pa.int64()),
                    "dist": pa.array([float(dmin[i])], pa.float64()),
                    "emb": pa.array([m[i].tolist()], pa.list_(pa.float64())),
                }
            )

        cands = emb.map_batches(far, batch_format="pyarrow").to_pandas()
        cands = cands.sort_values(["dist", "vec_id"], ascending=[False, True])
        best = cands.iloc[0]
        chosen_ids.append(int(best["vec_id"]))
        chosen_vecs.append(np.asarray(best["emb"], dtype=np.float64))
        rows.append(
            {"step": step, "vec_id": int(best["vec_id"]), "dist": float(_r(best["dist"], 4))}
        )
    return pd.DataFrame(rows)


def q_rank_correlation(sf_dir: str):
    """Rank agreement between two node orderings — out-degree vs Katz
    centrality over the events graph: Kendall tau-b (tie-corrected
    concordance) and Spearman rho (Pearson over average ranks) — the
    'do my cheap and expensive signals order the corpus the same way'
    dial a curation pipeline reads before swapping a costly scorer for a
    proxy.  Degree folds combiner-style; Katz reuses q_katz_centrality's
    6dp values on BOTH sides (the mirror nests the same unrolled CTE);
    the pair/rank arithmetic runs over the dim-sized 50-node table in
    exact integer halves (2x average ranks), floats only at the final
    divisions."""
    deg = (
        _events_edges(sf_dir)
        .groupby("src")
        .count()
        .to_pandas()
        .rename(columns={"src": "node", "count()": "d"})
    )
    from .q_graph import q_katz_centrality  # explicit cross-family dep
    katz = q_katz_centrality(sf_dir)
    df = katz.merge(deg, on="node", how="left").fillna({"d": 0})
    x = df["d"].astype(int).to_numpy()
    y = df["katz"].to_numpy()
    n = len(df)

    C = D = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = int(x[i] > x[j]) - int(x[i] < x[j])
            dy = int(y[i] > y[j]) - int(y[i] < y[j])
            s = dx * dy
            if s > 0:
                C += 1
            elif s < 0:
                D += 1
    import math
    from collections import Counter

    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(x.tolist()).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y.tolist()).values())
    tau = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))

    def avg_ranks2(v) -> np.ndarray:
        # 2x average rank, exact integers: 2*(#less) + (#tied) + 1
        order = sorted(v)
        import bisect

        return np.array(
            [2 * bisect.bisect_left(order, a) + (bisect.bisect_right(order, a) - bisect.bisect_left(order, a)) + 1 for a in v],
            dtype=np.int64,
        )

    rx = avg_ranks2(x.tolist())
    ry = avg_ranks2(y.tolist())
    sx, sy = int(rx.sum()), int(ry.sum())
    sxx = int((rx.astype(object) ** 2).sum())
    syy = int((ry.astype(object) ** 2).sum())
    sxy = int((rx.astype(object) * ry.astype(object)).sum())
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return pd.DataFrame(
        {
            "n": [n],
            "concordant": [C],
            "discordant": [D],
            "tau_b": [float(_r(tau, 6))],
            "spearman": [float(_r(rho, 6))],
        }
    )


def q_mcnemar_gates(sf_dir: str):
    """McNemar's paired test between the Gopher gate and the C4 gate on
    the SAME docs — the significance check behind 'can I swap quality
    filters without changing the kept set' (only the discordant cells
    matter: statistic = (|n10 - n01| - 1)^2 / (n10 + n01), the
    continuity-corrected chi-square).  One map pass computes both
    verdicts per doc; each batch folds to the four 2x2 cells — only four
    integers ever shuffle."""
    v = _gate_verdicts(sf_dir)

    def cells(b: pa.Table) -> pa.Table:
        g = b.column("g").to_numpy()
        c = b.column("c").to_numpy()
        return pa.table(
            {
                "n11": pa.array([int(((g == 1) & (c == 1)).sum())], pa.int64()),
                "n10": pa.array([int(((g == 1) & (c == 0)).sum())], pa.int64()),
                "n01": pa.array([int(((g == 0) & (c == 1)).sum())], pa.int64()),
                "n00": pa.array([int(((g == 0) & (c == 0)).sum())], pa.int64()),
            }
        )

    f = v.map_batches(cells, batch_format="pyarrow").to_pandas().sum()
    n11, n10, n01, n00 = (int(f[k]) for k in ("n11", "n10", "n01", "n00"))
    d = n10 + n01
    stat = (abs(n10 - n01) - 1) ** 2 * 1.0 / d if d else np.nan
    return pd.DataFrame(
        {
            "n11": [n11],
            "n10": [n10],
            "n01": [n01],
            "n00": [n00],
            "mcnemar": [float(_r(stat, 6)) if d else np.nan],
        }
    )


def q_trustrank(sf_dir: str, alpha: float = 0.85, iters: int = 3):
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB'04): PageRank
    with teleport biased to a trusted seed set (nodes 0-4) so trust decays
    with link distance from the seeds — the crawl-frontier spam damper
    that plain PageRank (uniform teleport) can't express.  Three unrolled
    iterations x_{t+1} = alpha * A_norm^T x_t + (1-alpha) * d_seed over
    the out-degree-normalized events graph, dangling mass dropped on both
    sides; each iteration is one streaming message pass (broadcast
    50-float vector, per-batch partial sums, groupby(dst)) exactly like
    katz_centrality."""
    edges = _events_edges(sf_dir).materialize()
    deg = (
        edges.groupby("src")
        .count()
        .to_pandas()
        .rename(columns={"count()": "outdeg"})
        .set_index("src")["outdeg"]
        .to_dict()
    )
    seeds = set(range(5))
    d_seed = {n: (1.0 / 5 if n in seeds else 0.0) for n in range(50)}
    x = dict(d_seed)
    for _ in range(iters):
        ref = ray.put((dict(x), dict(deg)))

        def msg(b: pa.Table, _ref=ref) -> pa.Table:
            xv, dg = ray.get(_ref)
            xs = np.array([xv[n] for n in range(50)], dtype=np.float64)
            ds_ = np.array([dg.get(n, 0) for n in range(50)], dtype=np.float64)
            s = b.column("src").to_numpy()
            d = b.column("dst").to_numpy()
            w = xs[s] / ds_[s]  # every src on an edge has outdeg >= 1
            df = pd.DataFrame({"dst": d, "m": w}).groupby("dst", as_index=False).sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        inc = (
            edges.map_batches(msg, batch_format="pyarrow")
            .groupby("dst")
            .sum("m")
            .to_pandas()
        )
        x = {n: (1 - alpha) * d_seed[n] for n in range(50)}
        for _, r in inc.iterrows():
            n = int(r["dst"])
            x[n] = alpha * float(r["sum(m)"]) + (1 - alpha) * d_seed[n]
    return pd.DataFrame(
        {
            "node": list(range(50)),
            "trust": [float(_r(x[n], 6)) for n in range(50)],
        }
    )


def q_salsa(sf_dir: str, iters: int = 2):
    """SALSA authority scores (Lempel & Moran, WWW'00): the random walk
    that hops backward along an in-link then forward along that hub's
    out-link — HITS' mutual reinforcement with degree-stochastic instead
    of unnormalized updates, so no per-iteration renormalization.  Two
    unrolled iterations over the DISTINCT events edge set: h(j) =
    sum_{j->i} a(i)/indeg(i), then a'(i) = sum_{j->i} h(j)/outdeg(j);
    each half-step is one streaming message pass (broadcast 50-float
    vector + degree table, per-batch partial sums, groupby) exactly like
    trustrank/katz.  Completes the link-analysis family next to pagerank,
    hits, katz, trustrank and opic_priority (stages/graph.py)."""
    de = _distinct_edges(sf_dir)
    degs = de.to_pandas()
    outdeg = degs.groupby("src").size().to_dict()
    indeg = degs.groupby("dst").size().to_dict()

    a = {n: 1.0 / 50 for n in range(50)}
    for _ in range(iters):

        def half(vec: dict, norm: dict, key_col: str, val_col: str) -> dict:
            ref = ray.put((dict(vec), dict(norm)))

            def msg(b: pa.Table, _ref=ref, _k=key_col, _v=val_col) -> pa.Table:
                xv, nv = ray.get(_ref)
                k = b.column(_k).to_numpy()
                v = b.column(_v).to_numpy()
                m = np.array([xv.get(int(n), 0.0) for n in v]) / np.array(
                    [nv[int(n)] for n in v]
                )
                df = (
                    pd.DataFrame({"n": k, "m": m}).groupby("n", as_index=False).sum()
                )
                return pa.Table.from_pandas(df, preserve_index=False)

            out = de.map_batches(msg, batch_format="pyarrow").groupby("n").sum("m")
            return {
                int(r["n"]): float(r["sum(m)"]) for _, r in out.to_pandas().iterrows()
            }

        h = half(a, indeg, "src", "dst")  # hub update: pull authority mass
        a_new = half(h, outdeg, "dst", "src")  # authority: push hub mass
        a = {n: a_new.get(n, 0.0) for n in range(50)}
    return pd.DataFrame(
        {
            "node": list(range(50)),
            "authority": [float(_r(a[n], 6)) for n in range(50)],
        }
    )


def q_cocitation(sf_dir: str):
    """Co-citation and bibliographic coupling (Small 1973 / Kessler 1963)
    over the distinct events link graph: for node pairs a<b, how many
    common IN-neighbors cite both (co-citation) and how many common
    OUT-neighbors both cite (coupling) — the classic related-page signals
    next to SALSA/HITS.  Shape: in-group pair emission per neighborhood
    (groupby src emits dst-pairs; groupby dst emits src-pairs), then one
    pair-keyed groupby count per side; the two sparse pair tables reunite
    with a full outer merge.  The per-neighborhood emission is O(d^2) —
    at web scale cap hub neighborhoods the way emit_bucket_pairs does
    (stages/dedup.py) and log the truncation."""
    de = _distinct_edges(sf_dir)

    def pairs(key: str, other: str):
        def emit(b: pa.Table) -> pa.Table:
            vs = np.sort(np.unique(b.column(other).to_numpy()))
            i, j = np.triu_indices(len(vs), k=1)
            return pa.table(
                {
                    "a": pa.array(vs[i], pa.int64()),
                    "b": pa.array(vs[j], pa.int64()),
                }
            )

        df = (
            de.groupby(key)
            .map_groups(emit, batch_format="pyarrow")
            .groupby(["a", "b"])
            .count()
            .to_pandas()
        )
        if df.empty:  # no neighborhood emitted any pair
            df = pd.DataFrame({"a": [], "b": [], "count()": []})
        return df

    cc = pairs("src", "dst").rename(columns={"count()": "cocitation"})
    bc = pairs("dst", "src").rename(columns={"count()": "coupling"})
    out = cc.merge(bc, on=["a", "b"], how="outer").fillna(0)
    return (
        out.astype(
            {"a": "int64", "b": "int64", "cocitation": "int64", "coupling": "int64"}
        )
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def q_gap_stats(sf_dir: str):
    """WebGraph-style adjacency compressibility (Boldi & Vigna, WWW'04):
    per source node, sort its distinct successors, take the consecutive
    gaps (first gap anchored at dst+1 so every gap is >= 1) and charge
    each gap its Elias-gamma cost 2*floor(log2(gap)) + 1 bits — the
    locality signal that decides whether a 10^10-node link graph fits in
    RAM.  floor(log2) is computed EXACTLY on both sides (frexp exponent
    here, length(bin(gap))-1 in the mirror) so no libm rounding can split
    the oracle.  Shape: groupby(src) with an in-group vectorized kernel;
    one row out per source."""
    de = _distinct_edges(sf_dir)

    def enc(b: pa.Table) -> pa.Table:
        src = int(b.column("src")[0].as_py())
        vs = np.sort(b.column("dst").to_numpy())
        gaps = np.diff(vs, prepend=-1).astype(np.int64)  # first gap = dst + 1
        exp = (np.frexp(gaps.astype(np.float64))[1] - 1).astype(np.int64)
        bits = 2 * exp + 1
        total = int(bits.sum())
        return pa.table(
            {
                "src": pa.array([src], pa.int64()),
                "n_links": pa.array([len(vs)], pa.int64()),
                "total_bits": pa.array([total], pa.int64()),
                "bits_per_link": pa.array([_r(total / len(vs), 4)], pa.float64()),
            }
        )

    return (
        de.groupby("src")
        .map_groups(enc, batch_format="pyarrow")
        .sort("src")
        .to_pandas()
    )


def q_simrank(sf_dir: str, c: float = 0.8, iters: int = 2):
    """SimRank (Jeh & Widom, KDD'02) over the distinct events link graph:
    s(a,b) = C/(|I(a)||I(b)|) * sum over in-neighbor pairs of s(i,j),
    s(a,a)=1 — "two pages are similar if similar pages point to them".
    Two unrolled iterations as message passes over the TENSOR-PRODUCT
    pair graph: each edge batch crosses with the broadcast distinct-edge
    table (small side via ray.put, never reshipped) to form pair-edge
    rows (i,j)->(a,b); the broadcast 50x50 score matrix scores each row
    and partial sums reduce through one (a,b) groupby per iteration.
    All-pairs SimRank is O(n^2) state — at web scale keep this form for
    per-seed slices and switch to Monte-Carlo meeting probabilities for
    the full matrix (the standard scale-out)."""
    de = _distinct_edges(sf_dir)
    edges_df = de.to_pandas()  # small side: <= 2500 distinct pairs
    indeg = edges_df.groupby("dst").size().to_dict()
    eref = ray.put((edges_df["src"].to_numpy(), edges_df["dst"].to_numpy()))

    s = np.eye(50, dtype=np.float64)
    for _ in range(iters):
        sref = ray.put(s)

        def msg(b: pa.Table, _e=eref, _s=sref) -> pa.Table:
            js, bs_ = ray.get(_e)
            sm = ray.get(_s)
            i = np.repeat(b.column("src").to_numpy(), len(js))
            a = np.repeat(b.column("dst").to_numpy(), len(js))
            j = np.tile(js, b.num_rows)
            bb = np.tile(bs_, b.num_rows)
            df = (
                pd.DataFrame({"a": a, "b": bb, "m": sm[i, j]})
                .groupby(["a", "b"], as_index=False)
                .sum()
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        inc = (
            de.map_batches(msg, batch_format="pyarrow")
            .groupby(["a", "b"])
            .sum("m")
            .to_pandas()
        )
        s = np.zeros((50, 50), dtype=np.float64)
        for _, r_ in inc.iterrows():
            a_, b_ = int(r_["a"]), int(r_["b"])
            if a_ != b_:
                s[a_, b_] = c * float(r_["sum(m)"]) / (indeg[a_] * indeg[b_])
        np.fill_diagonal(s, 1.0)
    ii, jj = np.triu_indices(50, k=1)
    return pd.DataFrame(
        {
            "a": ii.astype("int64"),
            "b": jj.astype("int64"),
            "simrank": _r(s[ii, jj], 6),
        }
    )


def q_adamic_adar(sf_dir: str):
    """Link-prediction triad (Liben-Nowell & Kleinberg '03) over the
    undirected view of the events link graph: per candidate pair (a<b)
    with at least one common neighbor, the common-neighbor count, the
    neighborhood Jaccard, and the Adamic-Adar score sum_z 1/ln(deg(z))
    over shared neighbors z — the crawl-frontier "probably related pages"
    signals.  Shape: wedge emission per center (groupby the center node,
    emit its neighbor pairs weighted 1/ln(deg(center))), one (a,b)
    groupby to finish both sums, degrees broadcast as a 50-entry dict
    for the Jaccard denominator.  Per-center emission is O(d^2): cap hub
    neighborhoods at web scale (emit_bucket_pairs pattern)."""
    de = _distinct_edges(sf_dir)

    def undirect(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        n = np.concatenate([s, d])
        nb = np.concatenate([d, s])
        keep = n != nb
        df = pd.DataFrame({"n": n[keep], "nb": nb[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    und = (
        de.map_batches(undirect, batch_format="pyarrow")
        .groupby(["n", "nb"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    deg = und.groupby("n").count().to_pandas()
    degs = deg.set_index("n")["count()"].to_dict()
    dref = ray.put(dict(degs))

    def wedges(b: pa.Table, _d=dref) -> pa.Table:
        dd = ray.get(_d)
        z = int(b.column("n")[0].as_py())
        vs = np.sort(b.column("nb").to_numpy())
        i, j = np.triu_indices(len(vs), k=1)
        w = 1.0 / np.log(dd[z]) if len(vs) >= 2 else 0.0
        return pa.table(
            {
                "a": pa.array(vs[i], pa.int64()),
                "b": pa.array(vs[j], pa.int64()),
                "c": pa.array(np.ones(len(i), np.int64), pa.int64()),
                "w": pa.array(np.full(len(i), w, np.float64), pa.float64()),
            }
        )

    agg = (
        und.groupby("n")
        .map_groups(wedges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("c", alias_name="common_neighbors"), Sum("w", alias_name="aa"))
        .to_pandas()
    )
    da = agg["a"].map(degs).to_numpy(dtype=np.float64)
    db = agg["b"].map(degs).to_numpy(dtype=np.float64)
    common = agg["common_neighbors"].to_numpy(dtype=np.float64)
    agg["jaccard"] = _r(common / (da + db - common), 6)
    agg["adamic_adar"] = _r(agg["aa"], 6)
    return (
        agg[["a", "b", "common_neighbors", "jaccard", "adamic_adar"]]
        .astype({"a": "int64", "b": "int64", "common_neighbors": "int64"})
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def q_wl_refinement(sf_dir: str, rounds: int = 2):
    """Weisfeiler-Lehman color refinement (directed 1-WL, the canonical-
    labeling pass under WL graph kernels / GNN expressivity): start from
    color0 = indeg*64 + outdeg over the distinct edge set, then twice
    re-color every node with a version-stable md5 hash of (own color |
    sorted in-neighbor colors # sorted out-neighbor colors), colors
    compressed mod 1e9+7.  The mirror rebuilds the exact same strings
    with string_agg(... ORDER BY) + md5_number_lower, so colors match
    bit-for-bit.  Shape per round: one streaming pass over the edges maps
    src/dst through the broadcast 50-entry color dict, a groupby(node)
    builds each side's sorted multiset string — driver holds only the
    50-color dict."""
    de = _distinct_edges(sf_dir)
    pairs = de.to_pandas()
    from ..stages.dedup import _hash_strings64

    indeg = pairs.groupby("dst").size().to_dict()
    outdeg = pairs.groupby("src").size().to_dict()
    colors = {
        n: int(indeg.get(n, 0)) * 64 + int(outdeg.get(n, 0)) for n in range(50)
    }

    def side(cref, key: str, other: str) -> dict:
        def emit(b: pa.Table, _c=cref, _k=key, _o=other) -> pa.Table:
            cd = ray.get(_c)
            return pa.table(
                {
                    "n": b.column(_k),
                    "c": pa.array(
                        [cd[int(v)] for v in b.column(_o).to_pylist()], pa.int64()
                    ),
                }
            )

        def join_sorted(b: pa.Table) -> pa.Table:
            n = int(b.column("n")[0].as_py())
            cs = sorted(b.column("c").to_pylist())
            return pa.table(
                {
                    "n": pa.array([n], pa.int64()),
                    "s": pa.array([",".join(str(c) for c in cs)], pa.string()),
                }
            )

        out = (
            de.map_batches(emit, batch_format="pyarrow")
            .groupby("n")
            .map_groups(join_sorted, batch_format="pyarrow")
            .to_pandas()
        )
        return out.set_index("n")["s"].to_dict()

    for _ in range(rounds):
        cref = ray.put(dict(colors))
        ins = side(cref, "dst", "src")
        outs = side(cref, "src", "dst")
        sigs = [
            f"{colors[n]}|{ins.get(n, '')}#{outs.get(n, '')}" for n in range(50)
        ]
        h = _hash_strings64(sigs) % np.uint64(1000000007)
        colors = {n: int(h[n]) for n in range(50)}

    out = pd.DataFrame(
        {"node": list(range(50)), "color": [colors[n] for n in range(50)]}
    )
    sizes = out.groupby("color")["node"].transform("size")
    out["class_size"] = sizes.astype("int64")
    return out.astype({"node": "int64", "color": "int64"})


def q_ndcg_eval(sf_dir: str, k: int = 10):
    """IR ranking evaluation (nDCG@10 / precision@10 / MRR) of the
    deterministic "longest docs first" ranking against binary relevance
    lang='en' — the eval harness shape every retrieval/curation ranker
    needs.  Distributed form: the only global materialization is the
    top-k slice (sort + limit, k rows); the MRR rank of the first
    relevant doc is computed WITHOUT ranking the corpus — take the best
    relevant doc (sort of the relevant slice, 1 row) and count how many
    docs order before it (one filtered count aggregate)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    top = (
        docs.sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    rel_top = (top["lang"] == "en").to_numpy(np.float64)
    kk = len(top)  # corpus may be smaller than k
    dcg = float(np.sum(rel_top / np.log2(np.arange(1, kk + 1) + 1)))
    nrel = docs.filter(lambda r: r["lang"] == "en").count()
    idcg = float(np.sum(1.0 / np.log2(np.arange(1, min(k, nrel) + 1) + 1)))
    first = (
        docs.filter(lambda r: r["lang"] == "en")
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(1)
        .to_pandas()
    )
    fc, fid = int(first["n_chars"][0]), int(first["doc_id"][0])
    before = docs.filter(
        lambda r, _c=fc, _i=fid: r["n_chars"] > _c
        or (r["n_chars"] == _c and r["doc_id"] < _i)
    ).count()
    return pd.DataFrame(
        {
            "ndcg10": [float(_r(dcg / idcg, 6))],
            "prec10": [float(_r(rel_top.sum() / k, 6))],
            "mrr": [float(_r(1.0 / (before + 1), 6))],
        }
    )


def q_shard_balance(sf_dir: str, shards: int = 16):
    """Rendezvous (highest-random-weight) sharding balance report
    (Thaler & Ravishankar '98) — the assignment rule the frontier/seen
    shards would use on a real cluster because it moves only 1/n of keys
    when a node joins: doc -> argmax over shards of md5(doc_id || '@' ||
    shard).  Reports per-shard counts and skew vs the uniform share; md5
    on both sides makes the mirror rebuild the same assignment
    bit-for-bit.  Pure map + one 16-group count — no shuffle of the doc
    ids themselves."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    from ..stages.dedup import _hash_strings64

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        hs = np.stack(
            [_hash_strings64([f"{i}@{s}" for i in ids]) for s in range(shards)]
        )
        return pa.table({"shard": pa.array(np.argmax(hs, axis=0).astype(np.int64))})

    counts = (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_docs"})
    )
    total = int(counts["n_docs"].sum())
    counts["skew"] = _r(counts["n_docs"] * shards / total, 6)
    return (
        counts.astype({"shard": "int64", "n_docs": "int64"})
        .sort_values("shard")
        .reset_index(drop=True)
    )


def q_cdc_chunks(sf_dir: str, window: int = 8, mask: int = 16):
    """Content-defined chunking stats (the gear/Rabin boundary rule under
    LBFS / restic / data-dedup stores): cut a doc's token stream wherever
    the rolling window hash % 16 == 0, so insertions shift chunk
    boundaries only locally — unlike fixed-size segments (line_dedup).
    Reuses the EXACT Mersenne61 rolling-hash recipe rolling_fingerprints
    pins against DuckDB (textstats.rolling_fingerprints), so the mirror
    replays boundaries bit-for-bit.  Pure map per doc (vectorized
    sliding-window dot), no shuffle; output one row per doc with its cut
    count and mean chunk size."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..stages.textstats import _B, _MOD, hash_token

    powers = np.array(
        [pow(int(_B), i, int(_MOD)) for i in range(window)], dtype=np.uint64
    )[::-1]

    def chunks(b: pa.Table) -> pa.Table:
        ids, nt, nc, av = [], [], [], []
        for did, t in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            toks = re.findall(r"\S+", t)
            h = np.array([hash_token(x) for x in toks], dtype=np.uint64)
            if len(toks) >= window:
                sw = np.lib.stride_tricks.sliding_window_view(h, window)
                win = (sw * powers).sum(axis=1, dtype=np.uint64) % _MOD
                cuts = int((win % np.uint64(mask) == 0).sum())
            else:
                cuts = 0
            ids.append(did)
            nt.append(len(toks))
            nc.append(cuts)
            av.append(float(_r(len(toks) / (cuts + 1), 4)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_cuts": pa.array(nc, pa.int64()),
                "avg_chunk_tokens": pa.array(av, pa.float64()),
            }
        )

    return docs.map_batches(chunks, batch_format="pyarrow").sort("doc_id")


def q_benford_digits(sf_dir: str):
    """Benford's-law first-digit audit over positive event values — the
    classic fabricated-data / instrumentation-bug screen for a metrics
    table.  First significant digit comes from the printf('%.6e')
    rendering on BOTH sides (never floor(log10(v)), whose libm rounding
    can misbin exact powers of ten); chi-squared against the log10(1+1/d)
    expectation.  One map + 9-group count."""
    ev = _read(sf_dir, "events", columns=["value"])

    def digits(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        v = v[v > 0]
        d = np.array([int(f"{x:.6e}"[0]) for x in v], dtype=np.int64)
        df = pd.DataFrame({"digit": d}).groupby("digit", as_index=False).size()
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"}), preserve_index=False
        )

    c = (
        ev.map_batches(digits, batch_format="pyarrow")
        .groupby("digit")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    full = pd.DataFrame({"digit": range(1, 10)}).merge(c, on="digit", how="left")
    full["n"] = full["n"].fillna(0).astype("int64")
    t = float(full["n"].sum())
    p = np.log10(1 + 1.0 / full["digit"].to_numpy(np.float64))
    chi2 = float(np.sum((full["n"] - t * p) ** 2 / (t * p)))
    full["obs_frac"] = _r(full["n"] / t, 6)
    full["benford_frac"] = _r(p, 6)
    full["chi2"] = float(_r(chi2, 4))
    return full.astype({"digit": "int64"})


def q_walk_corpus(sf_dir: str, steps: int = 4):
    """Deterministic random-walk corpus over the distinct link graph —
    the DeepWalk/node2vec data-prep stage made reproducible: from every
    node, 4 steps where the next hop is the out-neighbor minimizing
    md5(current || '>' || step || '>' || neighbor) (rendezvous pick — a
    keyed PRNG both sides can replay; walks stop at sinks).  Shape per
    step: the 50-entry position table broadcasts, one streaming pass over
    the edges emits per-batch partial argmins, the driver folds <= 50
    rows; at 10^9 walks the fold becomes a (start)-keyed min groupby."""
    de = _distinct_edges(sf_dir)
    from ..stages.dedup import _hash_strings64

    cur = {n: n for n in range(50)}  # start -> current node
    rows = []
    for t in range(1, steps + 1):
        cref = ray.put(dict(cur))

        def part(b: pa.Table, _c=cref, _t=t) -> pa.Table:
            cd = ray.get(_c)
            inv: dict = {}
            for st, nd in cd.items():
                inv.setdefault(nd, []).append(st)
            s = b.column("src").to_pylist()
            d = b.column("dst").to_pylist()
            starts, dsts, keys = [], [], []
            for sv, dv in zip(s, d):
                for st in inv.get(sv, ()):
                    starts.append(st)
                    dsts.append(dv)
                    keys.append(f"{sv}>{_t}>{dv}")
            if not starts:
                return pa.table(
                    {
                        "start": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "h": pa.array([], pa.uint64()),
                    }
                )
            h = _hash_strings64(keys)
            df = pd.DataFrame({"start": starts, "dst": dsts, "h": h})
            df = df.loc[df.groupby("start")["h"].idxmin()]
            return pa.Table.from_pandas(df, preserve_index=False)

        parts = de.map_batches(part, batch_format="pyarrow").to_pandas()
        nxt = (
            parts.loc[parts.groupby("start")["h"].idxmin()]
            .set_index("start")["dst"]
            .to_dict()
            if len(parts)
            else {}
        )
        cur = {st: int(nd) for st, nd in nxt.items()}  # sinks drop out
        rows.extend((st, t, nd) for st, nd in sorted(cur.items()))
    out = pd.DataFrame(rows, columns=["start", "step", "node"])
    return out.astype({"start": "int64", "step": "int64", "node": "int64"})


def q_late_arrivals(sf_dir: str, delay_us: int = 3_600_000_000):
    """Streaming watermark accounting (the Flink/Beam allowed-lateness
    rule): replay events in arrival order (event_id), hold a watermark =
    running max(ts) - 1h over STRICTLY EARLIER arrivals, and count per
    event type how many events land behind it — the late-data volume a
    windowed aggregate would have to retract.  Distributed as the
    order-preserving two-pass prefix max: pass 1 computes per-bucket
    (event_id // 4096) ts maxima (tiny table), the driver folds the
    running carry, pass 2 finishes the within-bucket running max in-group
    with the broadcast carry — same shape as shuffle_rank/pack_sequences'
    prefix sums, no global sort."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    B = 4096

    def bucketize(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        return b.append_column(
            "bucket", pa.array((eid // B).astype(np.int64), pa.int64())
        )

    bk = ev.map_batches(bucketize, batch_format="pyarrow").materialize()
    bmax = bk.groupby("bucket").max("ts").to_pandas().sort_values("bucket")
    carry: dict = {}
    run = None
    for _, r_ in bmax.iterrows():
        carry[int(r_["bucket"])] = run  # max over strictly earlier buckets
        m = r_["max(ts)"]
        run = m if run is None or m > run else run
    cref = ray.put(
        {k: (np.datetime64(v, "us") if v is not None else None) for k, v in carry.items()}
    )

    def flag(b: pa.Table, _c=cref) -> pa.Table:
        cd = ray.get(_c)
        df = b.select(["bucket", "event_id", "ts", "event_type"]).to_pandas()
        df = df.sort_values("event_id", kind="mergesort")
        ts = df["ts"].to_numpy("datetime64[us]").astype("int64")
        prev = np.empty(len(ts), np.int64)
        prev[0] = np.iinfo(np.int64).min
        np.maximum.accumulate(ts[:-1], out=prev[1:]) if len(ts) > 1 else None
        c0 = cd.get(int(df["bucket"].iloc[0]))
        if c0 is not None:
            prev = np.maximum(prev, np.int64(c0.astype("int64")))
        late = (ts < prev - delay_us) & (prev != np.iinfo(np.int64).min)
        out = (
            pd.DataFrame({"event_type": df["event_type"].to_numpy(), "late": late})
            .groupby("event_type", as_index=False)
            .agg(n_events=("late", "size"), n_late=("late", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        bk.groupby("bucket")
        .map_groups(flag, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("n_late", alias_name="n_late"))
        .to_pandas()
    )
    agg["late_frac"] = _r(agg["n_late"] / agg["n_events"], 6)
    return (
        agg.astype({"n_events": "int64", "n_late": "int64"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def q_funnel_conversion(sf_dir: str):
    """Ordered funnel analysis (the product-analytics staple): how many
    users progress view -> click -> signup -> purchase, where each stage
    must happen STRICTLY after the user's earliest completion of the
    previous stage.  Shape: per-user fold inside groupby(user_id) (sort
    the user's events once, walk the stages), then a max-step histogram
    whose cumulative counts the driver folds over 4 rows — user event
    lists never co-locate beyond their own group."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def fold(b: pa.Table) -> pa.Table:
        df = b.select(["ts", "event_type"]).to_pandas().sort_values("ts")
        t = None
        step = 0
        for stage in _FUNNEL_STAGES:
            sel = df[df["event_type"] == stage]
            if t is not None:
                sel = sel[sel["ts"] > t]
            if sel.empty:
                break
            t = sel["ts"].iloc[0]
            step += 1
        return pa.table({"max_step": pa.array([step], pa.int64())})

    hist = (
        ev.groupby("user_id")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("max_step")
        .count()
        .to_pandas()
    )
    reach = [
        int(hist.loc[hist["max_step"] >= s, "count()"].sum())
        for s in range(1, len(_FUNNEL_STAGES) + 1)
    ]
    base = reach[0] if reach[0] else 1
    return pd.DataFrame(
        {
            "step": pd.Series(range(1, 5), dtype="int64"),
            "stage": list(_FUNNEL_STAGES),
            "n_users": pd.Series(reach, dtype="int64"),
            "conversion": [_r(r / base, 6) for r in reach],
        }
    )


def q_kaplan_meier(sf_dir: str):
    """Kaplan-Meier survival curve for time from first signup to first
    subsequent purchase, users without a purchase right-censored at the
    corpus's last timestamp — the classic churn/time-to-event estimator.
    S(t) = prod over event times t_i <= t of (1 - d_i / n_i), evaluated
    as exp(cumsum(ln ...)) with the IDENTICAL op order to the SQL window
    mirror.  Shape: per-user duration fold inside groupby(user_id) (one
    broadcast scalar: the global max ts), then a per-duration groupby;
    the driver folds only the distinct-duration table (bounded by the
    user count, never the event count)."""
    obs = (
        _survival_durations(sf_dir)  # shared censoring convention
        .groupby("dur")
        .aggregate(Sum("ev", alias_name="d"), Count("ev", alias_name="c"))
        .to_pandas()
        .sort_values("dur")
        .reset_index(drop=True)
    )
    at_risk_total = int(obs["c"].sum())
    seen = 0
    rows = []
    log_s = 0.0
    dead = False  # a time with d == n drives S to exactly 0 thereafter
    for _, r_ in obs.iterrows():
        n = at_risk_total - seen  # users with duration >= this t
        d = int(r_["d"])
        if d > 0:
            if d == n:
                dead = True
            else:
                log_s += float(np.log(1.0 - d / n))
            s = 0.0 if dead else float(_r(np.exp(log_s), 6))
            rows.append((int(r_["dur"]), n, d, s))
        seen += int(r_["c"])
    return pd.DataFrame(
        rows, columns=["t_us", "n_risk", "n_events", "survival"]
    ).astype({"t_us": "int64", "n_risk": "int64", "n_events": "int64"})


def q_bipartite_check(sf_dir: str, pivot: int = 0):
    """Two-coloring / odd-cycle detection on the pivot's weakly-connected
    component: min-depth BFS parity over the undirected view, then count
    edges whose endpoints share a parity — zero conflicts iff the
    component is bipartite (the classic check before any bipartite-graph
    algorithm, e.g. SALSA's hub/authority split).  The BFS is the same
    streaming frontier wave as scc_pivot with depth tracking; the
    conflict count is one filtered pass over the edges with the 50-entry
    parity map broadcast."""
    de = _distinct_edges(sf_dir)

    def undirect(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        n = np.concatenate([s, d])
        nb = np.concatenate([d, s])
        keep = n != nb
        df = pd.DataFrame({"src": n[keep], "dst": nb[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    und = (
        de.map_batches(undirect, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    depth = {pivot: 0}
    frontier = {pivot}
    d_cur = 0
    while frontier:
        fr = pa.array(sorted(frontier), pa.int64())

        def hop(b: pa.Table, _fr=fr) -> pa.Table:
            m = pc.is_in(b.column("src"), value_set=_fr)
            return pa.table({"d": pc.unique(b.filter(m).column("dst"))})

        reached: set = set()
        for blk in und.map_batches(hop, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536
        ):
            reached.update(pa.table(blk).column("d").to_pylist())
        d_cur += 1
        frontier = reached - set(depth)
        for n in frontier:
            depth[n] = d_cur

    pref = ray.put({n: d % 2 for n, d in depth.items()})

    def conflicts(b: pa.Table, _p=pref) -> pa.Table:
        par = ray.get(_p)
        s = b.column("src").to_pylist()
        d = b.column("dst").to_pylist()
        c = sum(
            1
            for a_, b_ in zip(s, d)
            if a_ < b_ and a_ in par and b_ in par and par[a_] == par[b_]
        )
        return pa.table({"c": pa.array([c], pa.int64())})

    n_conf = int(
        und.map_batches(conflicts, batch_format="pyarrow").sum("c")
    )
    out = pd.DataFrame(
        sorted(depth.items()), columns=["node", "depth"]
    ).astype({"node": "int64", "depth": "int64"})
    out["parity"] = (out["depth"] % 2).astype("int64")
    out["n_conflict_edges"] = np.int64(n_conf)
    out["is_bipartite"] = bool(n_conf == 0)
    return out


def q_cuped(sf_dir: str):
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13): each
    user's pre-period spend (first half of their events by time) is the
    covariate X, post-period spend the metric Y, theta = cov(X,Y)/var(X)
    pooled across arms (user_id parity), adjusted metric Y - theta*(X -
    mean X).  Per-event values go through integer cents so the per-user
    sums are exact; the per-user fold runs inside groupby(user_id) and
    only the (arm, x, y) user table leaves the shuffle — at 10^9 users
    swap the driver-side moments for centered sufficient-stat combiners
    (corr_matrix's shape)."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def fold(b: pa.Table) -> pa.Table:
        df = (
            b.select(["user_id", "event_id", "ts", "value"])
            .to_pandas()
            .sort_values(["ts", "event_id"], kind="mergesort")
        )
        uid = int(df["user_id"].iloc[0])
        cents = np.floor(np.abs(df["value"].to_numpy()) * 100 + 0.5).astype(
            np.int64
        ) * np.sign(df["value"].to_numpy()).astype(np.int64)
        k = len(df)
        x = int(cents[: k // 2].sum()) / 100.0
        y = int(cents[k // 2 :].sum()) / 100.0
        return pa.table(
            {
                "arm": pa.array([uid % 2], pa.int64()),
                "x": pa.array([x], pa.float64()),
                "y": pa.array([y], pa.float64()),
            }
        )

    xy = (
        ev.groupby("user_id")
        .map_groups(fold, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["arm", "x", "y"])
        .reset_index(drop=True)
    )
    mx, my = float(xy["x"].mean()), float(xy["y"].mean())
    dx = xy["x"].to_numpy() - mx
    dy = xy["y"].to_numpy() - my
    varx = float(np.sum(dx * dx))
    theta = float(np.sum(dx * dy) / varx) if varx != 0 else 0.0
    xy["y_adj"] = xy["y"] - theta * (xy["x"] - mx)
    out = (
        xy.groupby("arm", as_index=False)
        .agg(n_users=("y", "size"), mean_y=("y", "mean"), mean_y_adj=("y_adj", "mean"))
        .sort_values("arm")
        .reset_index(drop=True)
    )
    out["mean_y"] = _r(out["mean_y"], 6)
    out["mean_y_adj"] = _r(out["mean_y_adj"], 6)
    out["theta"] = float(_r(theta, 6))
    return out.astype({"arm": "int64", "n_users": "int64"})


def q_hitting_time(sf_dir: str, pivot: int = 0, iters: int = 3):
    """Expected random-walk hitting time to the pivot, three unrolled
    Jacobi sweeps of h = 1 + mean over out-neighbors h(nbr), h(pivot)=0,
    h0=0 — the absorbing-walk distance that ranks crawl frontiers by
    "steps until the walk reaches the seed" (truncated, so values are
    lower bounds that tighten per sweep).  Each sweep is one streaming
    message pass over the distinct edges with the 50-float vector
    broadcast, same shape as trustrank/katz; sinks keep h = 1 + 0."""
    de = _distinct_edges(sf_dir)
    degs = de.to_pandas()
    outdeg = degs.groupby("src").size().to_dict()

    h = {n: 0.0 for n in range(50)}
    for _ in range(iters):
        ref = ray.put(dict(h))

        def msg(b: pa.Table, _ref=ref) -> pa.Table:
            hv = ray.get(_ref)
            s = b.column("src").to_numpy()
            d = b.column("dst").to_numpy()
            m = np.array([hv[int(x)] for x in d], dtype=np.float64)
            df = pd.DataFrame({"src": s, "m": m}).groupby("src", as_index=False).sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        inc = (
            de.map_batches(msg, batch_format="pyarrow")
            .groupby("src")
            .sum("m")
            .to_pandas()
        )
        nh = {n: 1.0 for n in range(50)}
        for _, r_ in inc.iterrows():
            n = int(r_["src"])
            nh[n] = 1.0 + float(r_["sum(m)"]) / outdeg[n]
        nh[pivot] = 0.0
        h = nh
    return pd.DataFrame(
        {
            "node": list(range(50)),
            "hitting_time": [float(_r(h[n], 6)) for n in range(50)],
        }
    )


def q_set_cover_greedy(sf_dir: str, k: int = 5):
    """Greedy maximum-coverage corpus selection (the classic (1-1/e)
    approximation): pick 5 docs, each maximizing NEW vocabulary covered,
    ties to the smallest doc_id — the coverage-driven seed/exemplar
    selection used for eval-set and prompt-set construction.  Each of the
    5 rounds is one streaming pass: the covered-token set broadcasts,
    every batch reports its best (gain, doc_id) candidate, the driver
    folds batch winners; the chosen doc's token set (bounded by one doc)
    is the only per-round driver state.  The materialize() pins the
    (doc_id, text) projection for the repeated passes — at 100 TB drop
    it and re-read from parquet per round (or pre-shingle to hashes)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()

    covered: set = set()
    picks = []
    for step in range(1, k + 1):
        cref = ray.put(set(covered))

        def best(b: pa.Table, _c=cref) -> pa.Table:
            cov = ray.get(_c)
            bg, bid = -1, None
            for did, t in zip(
                b.column("doc_id").to_pylist(), b.column("text").to_pylist()
            ):
                g = len(set(re.findall(r"\S+", t)) - cov)
                if g > bg or (g == bg and bid is not None and did < bid):
                    bg, bid = g, did
            return pa.table(
                {
                    "doc_id": pa.array([bid], pa.int64()),
                    "gain": pa.array([bg], pa.int64()),
                }
            )

        cand = (
            docs.map_batches(best, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["gain", "doc_id"], ascending=[False, True])
        )
        did, gain = int(cand["doc_id"].iloc[0]), int(cand["gain"].iloc[0])
        txt = (
            docs.filter(lambda r, _d=did: r["doc_id"] == _d)
            .take(1)[0]["text"]
        )
        covered |= set(re.findall(r"\S+", txt))
        picks.append((step, did, gain, len(covered)))
    return pd.DataFrame(
        picks, columns=["step", "doc_id", "gain", "covered_vocab"]
    ).astype("int64")


def q_knapsack_select(sf_dir: str, budget: int = 5000):
    """Token-budget corpus selection: order docs by quality-per-token
    (Gopher-ish quality proxy = unique-token fraction, ties by doc_id),
    admit greedily while the running token total stays within the 5000-
    token budget — the "best data under a training-token budget" picker.
    The sorted blocks stream to the driver IN ORDER with an early stop
    at the first block whose carry exceeds the budget, so only the
    admitted prefix (narrow columns) ever leaves the cluster — the
    admitted set is budget/avg_tokens docs by construction, not corpus-
    sized.  Output = admitted docs with their cumulative position."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        ids, nt, ratio = [], [], []
        for did, t in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            toks = re.findall(r"\S+", t)
            ids.append(did)
            nt.append(len(toks))
            ratio.append(len(set(toks)) / len(toks) if toks else 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "quality": pa.array(_r(np.array(ratio), 6), pa.float64()),
            }
        )

    scored = (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["quality", "doc_id"], descending=[True, False])
        .materialize()
    )
    # two-pass prefix sum over the sorted blocks: per-block token subtotals
    # fold into a carry, then each block finishes its exact running totals
    sub = []
    for i, blk in enumerate(
        scored.iter_batches(batch_format="pyarrow", batch_size=4096)
    ):
        sub.append(pa.table(blk))
    out_rows = []
    carry = 0
    for blk in sub:
        nt = blk.column("n_tokens").to_numpy()
        run = carry + np.cumsum(nt)
        keep = run <= budget
        if keep.any():
            out_rows.append(
                pa.table(
                    {
                        "doc_id": blk.column("doc_id").filter(pa.array(keep)),
                        "n_tokens": blk.column("n_tokens").filter(pa.array(keep)),
                        "quality": blk.column("quality").filter(pa.array(keep)),
                        "cum_tokens": pa.array(run[keep], pa.int64()),
                    }
                )
            )
        carry += int(nt.sum())
        if carry > budget:
            break
    if not out_rows:
        return pd.DataFrame(
            {"doc_id": [], "n_tokens": [], "quality": [], "cum_tokens": []}
        ).astype({"doc_id": "int64", "n_tokens": "int64", "cum_tokens": "int64"})
    return pa.concat_tables(out_rows).to_pandas()


def q_containment_pairs(sf_dir: str):
    """Broder containment (the asymmetric cousin of resemblance):
    C(A,B) = |A∩B| / |A| over consecutive doc pairs — the quote /
    subsumption detector Jaccard misses when one doc embeds another.
    Same pair-shuffle as jaccard_pairs: each doc emits its distinct-token
    list under pair ids (own, own-1), groupby(pair_id) co-locates exactly
    two docs, both directions computed in-group."""
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def emit_roles(b: pa.Table) -> pa.Table:
        pair_ids, roles, toks = [], [], []
        for i, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            distinct = sorted(set(re.findall(r"\S+", t)))
            if i + 1 < n_docs:
                pair_ids.append(i)
                roles.append("a")
                toks.append(distinct)
            if i - 1 >= 0:
                pair_ids.append(i - 1)
                roles.append("b")
                toks.append(distinct)
        return pa.table(
            {
                "pair_id": pa.array(pair_ids, pa.int64()),
                "role": pa.array(roles, pa.string()),
                "tokens": pa.array(toks, pa.list_(pa.string())),
            }
        )

    def contain(group: pa.Table) -> pa.Table:
        if group.num_rows != 2:
            return pa.table(
                {
                    "pair_id": pa.array([], pa.int64()),
                    "cont_a_in_b": pa.array([], pa.float64()),
                    "cont_b_in_a": pa.array([], pa.float64()),
                }
            )
        df = group.to_pandas().sort_values("role")
        a = set(df["tokens"].iloc[0])
        b_ = set(df["tokens"].iloc[1])
        inter = len(a & b_)
        return pa.table(
            {
                "pair_id": pa.array([int(df["pair_id"].iloc[0])], pa.int64()),
                "cont_a_in_b": pa.array([float(_r(inter / len(a), 6))], pa.float64()),
                "cont_b_in_a": pa.array(
                    [float(_r(inter / len(b_), 6))], pa.float64()
                ),
            }
        )

    return (
        docs.map_batches(emit_roles, batch_format="pyarrow")
        .groupby("pair_id")
        .map_groups(contain, batch_format="pyarrow")
        .sort("pair_id")
    )


def q_rbo_overlap(sf_dir: str, p: float = 0.9, k: int = 10):
    """Rank-biased overlap (Webber et al., TOIS'10), truncated at depth
    10, between two deterministic document rankings — length-first
    (n_chars DESC) vs quality-first (unique-token ratio DESC) — the
    top-weighted ranking-agreement metric for comparing curation
    policies.  RBO@10 = (1-p) * sum_{d<=10} p^(d-1) * |A_d ∩ B_d| / d.
    Distributed cost: two sort+limit(10) slices; the depth fold runs on
    20 driver rows."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    top_a = (
        docs.sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()["doc_id"]
        .tolist()
    )

    def score(b: pa.Table) -> pa.Table:
        ids, q = [], []
        for did, t in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            toks = re.findall(r"\S+", t)
            ids.append(did)
            q.append(float(_r(len(set(toks)) / len(toks) if toks else 0.0, 6)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "quality": pa.array(q, pa.float64()),
            }
        )

    top_b = (
        docs.map_batches(score, batch_format="pyarrow")
        .sort(["quality", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()["doc_id"]
        .tolist()
    )
    rbo = 0.0
    overlap10 = 0
    for d in range(1, k + 1):
        ov = len(set(top_a[:d]) & set(top_b[:d]))
        rbo += (1 - p) * (p ** (d - 1)) * ov / d
        if d == k:
            overlap10 = ov
    return pd.DataFrame(
        {
            "rbo10": [float(_r(rbo, 6))],
            "overlap10": pd.Series([overlap10], dtype="int64"),
        }
    )


def q_info_gain(sf_dir: str):
    """Decision-stump split scoring: information gain of thresholding
    n_chars at k*max/10 (k = 1..9) for predicting lang = 'en' — the
    feature-selection primitive under every tree/GBM and under
    "which signal separates good docs" curation analyses.  One combiner
    pass accumulates per-threshold (n_left, pos_left) sufficient stats
    inside map_batches (9 integers per batch, no shuffle of rows); the
    driver applies the entropy formula; ties on the best flag go to the
    smallest threshold."""
    docs = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    mx = int(docs.max("n_chars"))
    thr = np.array([k * mx // 10 for k in range(1, 10)], dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        nc = b.column("n_chars").to_numpy()
        y = (np.asarray(b.column("lang").to_pylist()) == "en").astype(np.int64)
        left = nc[None, :] <= thr[:, None]
        return pa.table(
            {
                "k": pa.array(np.arange(1, 10), pa.int64()),
                "nl": pa.array(left.sum(axis=1).astype(np.int64), pa.int64()),
                "pl": pa.array((left * y[None, :]).sum(axis=1), pa.int64()),
                "n": pa.array(np.full(9, len(nc), np.int64), pa.int64()),
                "pos": pa.array(np.full(9, int(y.sum()), np.int64), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("nl", alias_name="nl"),
            Sum("pl", alias_name="pl"),
            Sum("n", alias_name="n"),
            Sum("pos", alias_name="pos"),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    def ent(pos: np.ndarray, n: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            pr = np.where(n > 0, pos / np.maximum(n, 1), 0.0)
            h = -(
                np.where(pr > 0, pr * np.log(pr), 0.0)
                + np.where(pr < 1, (1 - pr) * np.log(1 - pr), 0.0)
            )
        return np.where(n > 0, h, 0.0)

    n = agg["n"].to_numpy(np.float64)
    pos = agg["pos"].to_numpy(np.float64)
    nl = agg["nl"].to_numpy(np.float64)
    pl = agg["pl"].to_numpy(np.float64)
    nr, pr_ = n - nl, pos - pl
    ig = ent(pos, n) - (nl / n) * ent(pl, nl) - (nr / n) * ent(pr_, nr)
    out = pd.DataFrame(
        {
            "k": agg["k"].astype("int64"),
            "threshold": pd.Series(thr, dtype="int64"),
            "n_left": agg["nl"].astype("int64"),
            "info_gain": _r(ig, 6),
        }
    )
    out["is_best"] = out["info_gain"] == out["info_gain"].max()
    return out


def q_triadic_closure(sf_dir: str):
    """Temporal triadic closure rate (the wedge-closing eval behind
    link-prediction benchmarks): wedges formed by the EARLY half of the
    event stream (even event_id) — distinct dst pairs sharing an early
    source — checked against the LATE half (odd event_id) for a closing
    edge in either direction.  Wedge pairs emit in-group per early
    neighborhood (cocitation's shape), dedupe through one pair groupby,
    and the verdict is a broadcast membership test against the late edge
    set (dimension-sized; at web scale make it a partitioned semi-join)."""
    e0 = _distinct_edges_parity(sf_dir, 0)
    e1 = _distinct_edges_parity(sf_dir, 1).to_pandas()
    late = set(zip(e1["src"].tolist(), e1["dst"].tolist()))
    lref = ray.put(late)

    def emit(b: pa.Table) -> pa.Table:
        vs = np.sort(np.unique(b.column("dst").to_numpy()))
        i, j = np.triu_indices(len(vs), k=1)
        return pa.table(
            {
                "a": pa.array(vs[i], pa.int64()),
                "b": pa.array(vs[j], pa.int64()),
            }
        )

    def verdict(b: pa.Table, _l=lref) -> pa.Table:
        lt = ray.get(_l)
        a = b.column("a").to_pylist()
        bb = b.column("b").to_pylist()
        closed = sum(
            1 for x, y in zip(a, bb) if (x, y) in lt or (y, x) in lt
        )
        return pa.table(
            {
                "n_pairs": pa.array([len(a)], pa.int64()),
                "n_closed": pa.array([closed], pa.int64()),
            }
        )

    agg = (
        e0.groupby("src")
        .map_groups(emit, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
        .map_batches(verdict, batch_format="pyarrow")
        .to_pandas()  # one partial row per batch — tiny
    )
    np_, nc = int(agg["n_pairs"].sum()), int(agg["n_closed"].sum())
    return pd.DataFrame(
        {
            "n_pairs": pd.Series([np_], dtype="int64"),
            "n_closed": pd.Series([nc], dtype="int64"),
            "closure_rate": [float(_r(nc / np_, 6)) if np_ else 0.0],
        }
    )


def q_rich_club(sf_dir: str):
    """Rich-club coefficient phi(k) (Colizza et al. '06) of the
    undirected link graph at k in {1, 2, 4, 8}: the edge density among
    nodes of degree > k — "do the hubs link to each other", the
    topology signal behind hub-first crawl prioritization.  One pass
    over the undirected edge set with the 50-entry degree dict
    broadcast accumulates the 4 edge counts; node counts come off the
    degree table."""
    de = _distinct_edges(sf_dir)

    def undirect(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        n = np.concatenate([s, d])
        nb = np.concatenate([d, s])
        keep = n != nb
        df = pd.DataFrame({"n": n[keep], "nb": nb[keep]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    und = (
        de.map_batches(undirect, batch_format="pyarrow")
        .groupby(["n", "nb"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    degs = und.groupby("n").count().to_pandas().set_index("n")["count()"].to_dict()
    dref = ray.put(dict(degs))
    ks = [1, 2, 4, 8]

    def count_edges(b: pa.Table, _d=dref) -> pa.Table:
        dd = ray.get(_d)
        n = b.column("n").to_pylist()
        nb = b.column("nb").to_pylist()
        outs = []
        for k in ks:
            outs.append(
                sum(1 for a_, b_ in zip(n, nb) if a_ < b_ and dd[a_] > k and dd[b_] > k)
            )
        return pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "e": pa.array(outs, pa.int64()),
            }
        )

    ec = (
        und.map_batches(count_edges, batch_format="pyarrow")
        .groupby("k")
        .sum("e")
        .to_pandas()
        .set_index("k")["sum(e)"]
        .to_dict()
    )
    rows = []
    for k in ks:
        nn = sum(1 for v in degs.values() if v > k)
        e = int(ec.get(k, 0))
        phi = 2.0 * e / (nn * (nn - 1)) if nn > 1 else 0.0
        rows.append((k, nn, e, float(_r(phi, 6))))
    return pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges", "phi"]).astype(
        {"k": "int64", "n_nodes": "int64", "n_edges": "int64"}
    )


def q_persistent_items(sf_dir: str, frac: float = 0.5):
    """Persistent-item detection (Dai et al.'s streaming notion: present
    in many windows, not merely frequent overall): users active in at
    least half of all hourly windows — the "steady crawler vs burst bot"
    screen a rate limiter can't express.  One (user, hour) dedup
    groupby, one per-user count, one scalar (total distinct hours)
    broadcast into the final map."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def hourly(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[h]")
        df = pd.DataFrame(
            {"user_id": b.column("user_id").to_numpy(), "hour": ts}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    uh = (
        ev.map_batches(hourly, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    total_hours = int(uh.groupby("hour").count().count())
    per_user = (
        uh.groupby("user_id").count().to_pandas().rename(columns={"count()": "n_hours"})
    )
    per_user["hour_frac"] = _r(per_user["n_hours"] / total_hours, 6)
    per_user["is_persistent"] = per_user["n_hours"] >= frac * total_hours
    return (
        per_user.astype({"user_id": "int64", "n_hours": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def q_sparsify_error(sf_dir: str, topk: int = 2, iters: int = 2):
    """Graph-sparsification fidelity: keep each source's top-2 out-edges
    by event multiplicity (ties to the smaller dst), re-run the same
    two-iteration PageRank, and report per-node rank drift plus the
    global L1 error — the "how much graph can we drop before the crawl
    prioritizer degrades" knob for 10^10-edge link graphs.  The top-k
    prune is an in-group head after one (src, dst) multiplicity groupby;
    both rank vectors reuse the streaming message passes."""
    ew = (
        _events_edges(sf_dir)
        .groupby(["src", "dst"])
        .count()
        .materialize()
    )

    def head2(b: pa.Table, _k=topk) -> pa.Table:
        df = (
            b.to_pandas()
            .sort_values(["count()", "dst"], ascending=[False, True])
            .head(_k)
        )
        return pa.Table.from_pandas(
            df[["src", "dst"]], preserve_index=False
        )

    sparse = ew.groupby("src").map_groups(head2, batch_format="pyarrow").materialize()
    full = ew.drop_columns(["count()"]).materialize()

    def pr(edges: "ray.data.Dataset") -> dict:
        deg = (
            edges.groupby("src")
            .count()
            .to_pandas()
            .set_index("src")["count()"]
            .to_dict()
        )
        x = {n: 1.0 / 50 for n in range(50)}
        for _ in range(iters):
            ref = ray.put((dict(x), dict(deg)))

            def msg(b: pa.Table, _ref=ref) -> pa.Table:
                xv, dg = ray.get(_ref)
                s = b.column("src").to_numpy()
                d = b.column("dst").to_numpy()
                w = np.array(
                    [xv[int(n)] / dg[int(n)] for n in s], dtype=np.float64
                )
                df = (
                    pd.DataFrame({"dst": d, "m": w})
                    .groupby("dst", as_index=False)
                    .sum()
                )
                return pa.Table.from_pandas(df, preserve_index=False)

            inc = (
                edges.map_batches(msg, batch_format="pyarrow")
                .groupby("dst")
                .sum("m")
                .to_pandas()
            )
            x = {n: 0.15 / 50 for n in range(50)}
            for _, r_ in inc.iterrows():
                x[int(r_["dst"])] = 0.85 * float(r_["sum(m)"]) + 0.15 / 50
        return x

    pf = pr(full)
    ps = pr(sparse)
    l1 = float(
        _r(sum(abs(float(_r(pf[n], 9)) - float(_r(ps[n], 9))) for n in range(50)), 6)
    )
    return pd.DataFrame(
        {
            "node": list(range(50)),
            "rank_full": [float(_r(float(_r(pf[n], 9)), 6)) for n in range(50)],
            "rank_sparse": [float(_r(float(_r(ps[n], 9)), 6)) for n in range(50)],
            "l1_error": [l1] * 50,
        }
    )


def q_spam_mass(sf_dir: str, alpha: float = 0.85, iters: int = 2):
    """Relative spam mass (Gyongyi, Berkhin, Garcia-Molina & Pedersen,
    VLDB'06): the fraction of a node's PageRank NOT accounted for by
    trust flowing from a known-good seed set, M(n) = (p(n) - t(n)) / p(n)
    where p is uniform-teleport PageRank and t the seed-biased TrustRank
    — the classic link-spam screen a crawl frontier applies before
    spending fetch budget.  Both vectors run the SAME two unrolled
    message-pass iterations over the out-degree-normalized events graph
    (broadcast 50-float state, per-batch partial sums, groupby(dst)); the
    driver folds only the 50-row vector per iteration.  Mirrors the
    reference's rank-then-filter frontier shape (strategies push weights,
    spiders drop low-trust hosts) in one declarative pass."""
    edges = _events_edges(sf_dir).materialize()
    degs = (
        edges.groupby("src").count().to_pandas().set_index("src")["count()"]
    )
    deg = np.zeros(50, np.float64)
    deg[degs.index.to_numpy()] = degs.to_numpy()
    d_seed = np.array([1.0 / 5 if n < 5 else 0.0 for n in range(50)])
    p = np.full(50, 1.0 / 50)
    t = d_seed.copy()
    for _ in range(iters):
        ref = ray.put((p.copy(), t.copy(), deg.copy()))

        def msg(b: pa.Table, _ref=ref) -> pa.Table:
            pv, tv, dg = ray.get(_ref)
            s = b.column("src").to_numpy()
            d = b.column("dst").to_numpy()
            df = (
                pd.DataFrame(
                    {"dst": d, "mp": pv[s] / dg[s], "mt": tv[s] / dg[s]}
                )
                .groupby("dst", as_index=False)
                .sum()
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        inc = (
            edges.map_batches(msg, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("mp", alias_name="mp"), Sum("mt", alias_name="mt"))
            .to_pandas()
        )
        p = (1 - alpha) / 50 * np.ones(50)
        t = (1 - alpha) * d_seed
        idx = inc["dst"].to_numpy()
        p[idx] += alpha * inc["mp"].to_numpy()
        t[idx] += alpha * inc["mt"].to_numpy()
    p9, t9 = _r(p, 9), _r(t, 9)
    return pd.DataFrame(
        {
            "node": pd.Series(range(50), dtype="int64"),
            "pr": _r(p9, 6),
            "trust": _r(t9, 6),
            "spam_mass": _r((p9 - t9) / p9, 6),
        }
    )


def q_event_order_pairs(sf_dir: str):
    """Sequential-pattern support (the length-2, any-gap case of
    GSP/PrefixSpan): for every ordered pair of distinct event types
    (a, b), how many users performed some a strictly before some b —
    i.e. min_ts(a) < max_ts(b) within the user's history — and the
    support as a fraction of all users.  Shape: per-user fold inside
    groupby(user_id) emits at most |types|^2 pair rows plus one user
    marker, one small groupby reduces them; no user's history leaves its
    group and the driver folds only the O(types^2) pair table."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def fold(b: pa.Table) -> pa.Table:
        df = b.select(["ts", "event_type"]).to_pandas()
        g = df.groupby("event_type")["ts"].agg(["min", "max"])
        ants, cons = ["__user__"], ["__user__"]
        for a in g.index:
            for c in g.index:
                if a != c and g.loc[a, "min"] < g.loc[c, "max"]:
                    ants.append(a)
                    cons.append(c)
        return pa.table(
            {
                "antecedent": pa.array(ants, pa.string()),
                "consequent": pa.array(cons, pa.string()),
            }
        )

    agg = (
        ev.groupby("user_id")
        .map_groups(fold, batch_format="pyarrow")
        .groupby(["antecedent", "consequent"])
        .count()
        .to_pandas()
    )
    total = int(
        agg.loc[agg["antecedent"] == "__user__", "count()"].sum()
    )
    out = agg[agg["antecedent"] != "__user__"].copy()
    out["n_users"] = out["count()"].astype("int64")
    out["support"] = _r(out["n_users"] / max(total, 1), 6)
    return (
        out[["antecedent", "consequent", "n_users", "support"]]
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )


def q_cusum_changepoints(sf_dir: str, k: float = 0.5, h: float = 4.0):
    """Two-sided standardized CUSUM drift detector over the daily event
    volume (Page 1954; the ops-alerting staple a crawl dashboard runs on
    ingest counts): z_t = (x_t - mu)/sigma, S+_t = max(0, S+_{t-1} + z_t
    - k), S-_t = max(0, S-_{t-1} - z_t - k), alarm when either side
    crosses h.  The corpus reduces to the dim-sized daily series via a
    combiner groupby; mu/sigma and the inherently-sequential recursion
    fold driver-side over O(days) rows in the exact double order the
    recursive-CTE mirror replays (z pinned at 9dp on both sides before
    the recursion so the stddev algorithm difference can't drift)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def per_day(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy().astype("datetime64[D]").astype(str)
        vals, cnts = np.unique(days, return_counts=True)
        return pa.table(
            {
                "day": pa.array(vals, pa.string()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    d = (
        ds.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = d["n"].to_numpy(np.float64)
    mu = float(x.mean())
    sig = float(np.sqrt(((x - mu) ** 2).mean()))
    z = _r((x - mu) / sig, 9) if sig > 0 else np.zeros(len(x))
    sp = sn = 0.0
    sps, sns, alarms = [], [], []
    for zt in z:
        sp = max(0.0, sp + zt - k)
        sn = max(0.0, sn - zt - k)
        sps.append(sp)
        sns.append(sn)
        alarms.append(1 if (sp > h or sn > h) else 0)
    return pd.DataFrame(
        {
            "day": d["day"],
            "n_events": d["n"].astype("int64"),
            "z": [float(v) for v in z],
            "s_pos": [float(_r(v, 4)) for v in sps],
            "s_neg": [float(_r(v, 4)) for v in sns],
            "alarm": pd.Series(alarms, dtype="int64"),
        }
    )


def q_holt_linear(sf_dir: str, alpha: float = 0.5, beta: float = 0.3):
    """Holt's linear-trend double exponential smoothing over the daily
    event volume (the capacity-forecast step after q_ewma_daily's single
    smoother): l_t = a*x_t + (1-a)(l_{t-1} + b_{t-1}), b_t = B*(l_t -
    l_{t-1}) + (1-B)*b_{t-1}, initialized l_1 = x_1, b_1 = x_2 - x_1 (0
    on a single-day series); the one-step forecast is l_t + b_t.  Same
    shape as the other recursive series: a combiner groupby reduces the
    corpus to O(days), the driver replays the recursion in the mirror's
    exact double order (the b_t update re-derives l_t from the same
    expression the SQL repeats, so both sides run identical ops)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def per_day(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy().astype("datetime64[D]").astype(str)
        vals, cnts = np.unique(days, return_counts=True)
        return pa.table(
            {
                "day": pa.array(vals, pa.string()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    d = (
        ds.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    x = d["n"].to_numpy(np.float64)
    lv = x[0]
    bt = (x[1] - x[0]) if len(x) > 1 else 0.0
    ls, bs = [lv], [bt]
    for t in range(1, len(x)):
        lp = alpha * x[t] + (1 - alpha) * (lv + bt)
        bt = beta * (lp - lv) + (1 - beta) * bt
        lv = lp
        ls.append(lv)
        bs.append(bt)
    return pd.DataFrame(
        {
            "day": d["day"],
            "n_events": d["n"].astype("int64"),
            "level": [float(_r(v, 4)) for v in ls],
            "trend": [float(_r(v, 4)) for v in bs],
            "forecast": [float(_r(a + b, 4)) for a, b in zip(ls, bs)],
        }
    )


def q_v_measure(sf_dir: str, k: int = 8):
    """V-measure cluster-quality readout (Rosenberg & Hirschberg 2007):
    homogeneity h = 1 - H(C|K)/H(C), completeness c = 1 - H(K|C)/H(K),
    V = 2hc/(h+c), of the nearest-centroid clusters (q_kmeans_assign's
    routing) against the embedding labels — the entropy-based companion
    to topic_purity that also punishes splitting one label across many
    clusters.  One streaming pass assigns + reduces to (cluster, label)
    contingency cells via a combiner groupby; all entropies fold
    driver-side over the O(k * labels) cell table in the exact ordered-
    sum sequence the SQL mirror replays."""
    import math

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    cent_rows = sorted(
        emb.filter(lambda r: r["vec_id"] < k).take_all(), key=lambda r: r["vec_id"]
    )
    C = np.array([r["embedding"] for r in cent_rows], np.float64)
    c_ref = ray.put(C)

    def cells(b: pa.Table) -> pa.Table:
        C_ = ray.get(c_ref)
        X = _emb_matrix(b)
        dmat = np.sqrt(((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2))
        j = dmat.argmin(axis=1)
        df = (
            pd.DataFrame({"cluster": j.astype(np.int64), "label": b.column("label").to_numpy()})
            .groupby(["cluster", "label"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cm = (
        emb.map_batches(cells, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["cluster", "label"])
        .reset_index(drop=True)
    )
    n = float(cm["c"].sum())
    nk = cm.groupby("cluster")["c"].sum().to_dict()
    nl = cm.groupby("label")["c"].sum().to_dict()
    h_c = -sum((nl[l] / n) * math.log(nl[l] / n) for l in sorted(nl))
    h_k = -sum((nk[c] / n) * math.log(nk[c] / n) for c in sorted(nk))
    h_ck = 0.0  # H(C|K): fold ordered by (cluster, label)
    h_kc = 0.0  # H(K|C): same cell order
    for _, r in cm.iterrows():
        c = float(r["c"])
        h_ck -= (c / n) * math.log(c / float(nk[r["cluster"]]))
        h_kc -= (c / n) * math.log(c / float(nl[r["label"]]))
    hom = 1.0 if h_c == 0 else 1.0 - h_ck / h_c
    com = 1.0 if h_k == 0 else 1.0 - h_kc / h_k
    v = 0.0 if hom + com == 0 else 2 * hom * com / (hom + com)
    return pd.DataFrame(
        {
            "n_clusters": [int(len(nk))],
            "n_labels": [int(len(nl))],
            "homogeneity": [float(_r(hom, 6))],
            "completeness": [float(_r(com, 6))],
            "v_measure": [float(_r(v, 6))],
        }
    )


def q_ktruss_peel(sf_dir: str, k: int = 4, rounds: int = 2):
    """k-truss peeling rounds (Cohen 2008; the community-core detector a
    web-graph pipeline runs after triangle counting): repeatedly drop
    every undirected edge supported by fewer than k-2 triangles,
    recomputing supports on the surviving graph — here the PINNED first
    ``rounds`` rounds (the SQL mirror unrolls the same two), reporting
    per-round edge/removal counts plus the support range, exactly the
    convergence telemetry a full peel would emit per iteration.  Shape:
    the distributed distinct-edge reduction of _distinct_edges feeds a
    dim-sized (<= 50^2) canonical edge table; supports are vectorized
    bitset intersections against the broadcast 50x50 adjacency — at web
    scale this step is the standard per-edge map over a broadcast
    neighbor sketch, re-sharded per round."""
    pairs = _distinct_edges(sf_dir).to_pandas()
    a = np.minimum(pairs["src"].to_numpy(), pairs["dst"].to_numpy())
    b = np.maximum(pairs["src"].to_numpy(), pairs["dst"].to_numpy())
    keep = a != b
    edges = np.unique(np.stack([a[keep], b[keep]], axis=1), axis=0)
    thr = k - 2
    out = []
    for rnd in range(1, rounds + 1):
        adj = np.zeros((50, 50), dtype=bool)
        adj[edges[:, 0], edges[:, 1]] = True
        adj[edges[:, 1], edges[:, 0]] = True
        sup = (adj[edges[:, 0]] & adj[edges[:, 1]]).sum(axis=1)
        kept = sup >= thr
        out.append(
            (
                rnd,
                int(len(edges)),
                int((~kept).sum()),
                int(kept.sum()),
                int(sup.min()) if len(sup) else 0,
                int(sup.max()) if len(sup) else 0,
            )
        )
        edges = edges[kept]
    return pd.DataFrame(
        out,
        columns=[
            "round",
            "n_edges_before",
            "n_removed",
            "n_edges_after",
            "min_support",
            "max_support",
        ],
    ).astype("int64")


def q_ams_f2(sf_dir: str, reps: int = 8):
    """AMS second-moment (F2) sketch audit (Alon, Matias & Szegedy '96):
    estimate sum_t c_t^2 of the corpus token frequencies with ``reps``
    independent +/-1 sign projections Z_j = sum_t s_j(t) * c_t, taking
    the median of Z_j^2 — the self-join-size estimator a shuffle planner
    consults before materializing a heavy join — next to the exact F2.
    Sign hashes are version-stable md5-low-64 parity (token || '#' || j,
    == DuckDB md5_number_lower bit-for-bit, same family as count_min),
    so the mirror rebuilds every projection exactly.  Shape: the vocab
    builds through the standard per-batch Counter combiner + one
    groupby; each vocab batch emits ``reps`` (j, partial-Z) rows plus an
    (exact-F2, n) partial, so only O(reps x blocks) rows reach the
    driver's median fold."""
    docs = _read(sf_dir, "documents", columns=["text"])
    from ..stages.dedup import _hash_strings64

    def toks(b: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for t in b.column("text").to_pylist():
            c.update(re.findall(r"\S+", t))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    vocab = (
        docs.map_batches(toks, batch_format="pyarrow")
        .groupby("token")
        .sum("c")
        .materialize()
    )

    def partials(b: pa.Table, _r=reps) -> pa.Table:
        tk = b.column("token").to_pylist()
        cnt = b.column("sum(c)").to_numpy().astype(np.int64)
        js, zs = [], []
        for j in range(_r):
            sign = (
                (_hash_strings64([f"{t}#{j}" for t in tk]) % np.uint64(2)).astype(
                    np.int64
                )
                * 2
                - 1
            )
            js.append(j)
            zs.append(int((sign * cnt).sum()))
        js.append(-1)  # exact-F2 partial rides the same reduction
        zs.append(int((cnt * cnt).sum()))
        js.append(-2)  # vocab-size partial
        zs.append(len(tk))
        return pa.table(
            {"j": pa.array(js, pa.int64()), "z": pa.array(zs, pa.int64())}
        )

    agg = (
        vocab.map_batches(partials, batch_format="pyarrow")
        .groupby("j")
        .sum("z")
        .to_pandas()
        .set_index("j")["sum(z)"]
    )
    f2 = int(agg.loc[-1])
    n_tokens = int(agg.loc[-2])
    ests = np.sort(
        np.array([agg.loc[j] for j in range(reps)], np.float64) ** 2
    )
    med = (ests[reps // 2 - 1] + ests[reps // 2]) / 2.0
    return pd.DataFrame(
        {
            "n_tokens": [n_tokens],
            "f2_exact": [f2],
            "f2_est": [float(med)],
            "rel_error": [float(_r(abs(med - f2) / f2, 6))],
        }
    )


def q_mojibake_screen(sf_dir: str):
    """Encoding-quality screen (the CCNet/C4 pre-filter that catches
    charset-decode failures before they poison dedup and LM stats): per
    source, how many docs carry U+FFFD replacement characters, raw C0
    control bytes (beyond tab/newline/CR), or a suspicious (> 30%)
    non-ASCII ratio, and the combined flag rate.  Pure per-batch
    vectorized counting folded through a combiner groupby — only
    O(sources) counter rows move."""
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def screen(b: pa.Table) -> pa.Table:
        srcs = b.column("source").to_pylist()
        rows = []
        for s, t in zip(srcs, b.column("text").to_pylist()):
            t = t or ""
            moji = 1 if "�" in t else 0
            ctrl = 1 if _CTRL_RE.search(t) else 0
            na = len(_NONASCII_RE.findall(t))
            heavy = 1 if len(t) > 0 and na * 1.0 / len(t) > 0.3 else 0
            rows.append((s, moji, ctrl, heavy, 1 if (moji or ctrl or heavy) else 0))
        df = (
            pd.DataFrame(
                rows, columns=["source", "moji", "ctrl", "heavy", "flagged"]
            )
            .groupby("source", as_index=False)
            .agg(
                n_docs=("moji", "size"),
                n_mojibake=("moji", "sum"),
                n_control=("ctrl", "sum"),
                n_nonascii_heavy=("heavy", "sum"),
                n_flagged=("flagged", "sum"),
            )
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        docs.map_batches(screen, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_mojibake", alias_name="n_mojibake"),
            Sum("n_control", alias_name="n_control"),
            Sum("n_nonascii_heavy", alias_name="n_nonascii_heavy"),
            Sum("n_flagged", alias_name="n_flagged"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in agg.columns[1:]:
        agg[c] = agg[c].astype("int64")
    agg["flag_rate"] = _r(agg["n_flagged"] / agg["n_docs"], 6)
    return agg


def q_adjacent_lcp(sf_dir: str, cap: int = 32, chunk: int = 256):
    """Longest-common-prefix histogram between GLOBALLY text-rank-adjacent
    docs (capped at ``cap`` chars) — the prefix-duplication telemetry a
    suffix-array-style exact-substring dedup (Lee et al. 2022) reads
    before committing to the full pass: a heavy tail of high LCPs means
    template boilerplate that minhash shingles under-weight.  Shape: the
    two-pass order-preserving bucket rank (q_blocking_quality's) gives
    global ranks without a global sort; adjacent pairs form inside
    rank-chunk groups with 1-row boundary replication; only the <= cap+1
    histogram rows reach the driver."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        txt = b.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": b.column("text"),
                "bkt": pa.array([(t or "")[:2] for t in txt], pa.string()),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = keyed_ds.groupby("bkt").count().to_pandas().sort_values("bkt")
    offsets = dict(
        zip(bc["bkt"], bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)

    def rank(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values(["text", "doc_id"]).reset_index(drop=True)
        base = off[df["bkt"].iloc[0]]
        df["rn"] = base + np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df[["text", "rn"]], preserve_index=False)

    ranked = keyed_ds.groupby("bkt").map_groups(rank, batch_format="pyarrow")

    def to_chunks(b: pa.Table, _c=chunk) -> pa.Table:
        rn = b.column("rn").to_numpy()
        own = rn // _c
        tables = [b.append_column("chunk", pa.array(own, pa.int64()))]
        repl = (rn % _c < 1) & (own > 0)
        if repl.any():
            rep = b.filter(pa.array(repl))
            tables.append(
                rep.append_column(
                    "chunk", pa.array(rep.column("rn").to_numpy() // _c - 1, pa.int64())
                )
            )
        return pa.concat_tables(tables)

    def lcp_hist(g: pa.Table, _cap=cap, _c=chunk) -> pa.Table:
        df = g.to_pandas().sort_values("rn").reset_index(drop=True)
        c = int(df["chunk"].iloc[0])
        rn = df["rn"].to_numpy()
        from collections import Counter

        h: "Counter[int]" = Counter()
        for i in range(len(df) - 1):
            if rn[i] // _c != c or rn[i + 1] != rn[i] + 1:
                continue
            a = (df["text"].iloc[i] or "")[:_cap]
            b_ = (df["text"].iloc[i + 1] or "")[:_cap]
            j = 0
            while j < min(len(a), len(b_)) and a[j] == b_[j]:
                j += 1
            h[j] += 1
        return pa.table(
            {
                "lcp": pa.array(list(h.keys()), pa.int64()),
                "n_pairs": pa.array(list(h.values()), pa.int64()),
            }
        )

    return (
        ranked.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(lcp_hist, batch_format="pyarrow")
        .groupby("lcp")
        .sum("n_pairs")
        .map_batches(
            lambda b: b.rename_columns(["lcp", "n_pairs"]), batch_format="pyarrow"
        )
        .sort("lcp")
    )


def q_soft404_screen(sf_dir: str):
    """Soft-404 screen per source — the crawl-hygiene filter that catches
    pages which return HTTP 200 but carry an error body (classic
    Common-Crawl post-fetch cleanup; the reference's spiders trust HTTP
    status only, spiders/txs/*).  A doc is flagged when its lowercased
    text matches the canonical error phrases OR it has fewer than 5
    tokens (the stub-body rule).  Pure map + one small groupby(source):
    per-batch partial (n, flagged) counters reduce per source, so only
    ~|sources| rows ever shuffle."""
    docs = _read(sf_dir, "documents", columns=["source", "text"])
    pat = re.compile(_SOFT404_RE)

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        n: Counter = Counter()
        fl: Counter = Counter()
        for s, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            n[s] += 1
            if pat.search(t.lower()) or len(_oracle_tokens(t)) < 5:
                fl[s] += 1
        ks = sorted(n)
        return pa.table(
            {
                "source": pa.array(ks, pa.string()),
                "n_docs": pa.array([n[k] for k in ks], pa.int64()),
                "n_flagged": pa.array([fl.get(k, 0) for k in ks], pa.int64()),
            }
        )

    def rate(b: pa.Table) -> pa.Table:
        nd = b.column("n_docs").to_numpy()
        nf = b.column("n_flagged").to_numpy()
        return pa.table(
            {
                "source": b.column("source"),
                "n_docs": pa.array(nd, pa.int64()),
                "n_flagged": pa.array(nf, pa.int64()),
                "rate": pa.array(_r(nf * 1.0 / nd, 6), pa.float64()),
            }
        )

    return (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_flagged", alias_name="n_flagged"))
        .map_batches(rate, batch_format="pyarrow")
        .sort("source")
    )


def q_kruskal_wallis(sf_dir: str):
    """Kruskal-Wallis rank-sum H test of events.value across the
    event_type groups (the k-sample generalization of the Mann-Whitney
    machinery q_roc_auc uses for 2 classes) with exact average-rank tie
    handling and the standard tie correction — the distribution-free
    "does any segment differ" gate run before per-segment drilldowns.
    Shape: one combiner groupby reduces the table to the distinct-value
    histogram with per-group counts; global rank prefixes come from the
    coarse-slab offsets (floor(v) counts on the driver, in-slab
    cumulative in map_groups), so rank sums are computed in EXACT
    integer arithmetic (2*ranksum folds) and only per-group scalars
    reach the driver."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for g, v in zip(b.column("event_type").to_pylist(), b.column("value").to_pylist()):
            cnt[(float(v), g)] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "v": pa.array([k[0] for k in ks], pa.float64()),
                "g": pa.array([k[1] for k in ks], pa.string()),
                "c": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    hist = (
        ev.map_batches(part, batch_format="pyarrow")
        .groupby(["v", "g"])
        .sum("c")
        .map_batches(
            lambda b: b.rename_columns(["v", "g", "c"]).append_column(
                "kb", pa.array(np.floor(b.column("v").to_numpy()).astype(np.int64))
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    kc = (
        hist.groupby("kb").sum("c").to_pandas().sort_values("kb").reset_index(drop=True)
    )
    offsets = dict(zip(kc["kb"], kc["sum(c)"].cumsum().shift(1, fill_value=0).astype(int)))
    off_ref = ray.put(offsets)

    def fold(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values(["v", "g"]).reset_index(drop=True)
        a = int(off[int(df["kb"].iloc[0])])
        out_g: dict = {}
        out_n: dict = {}
        tie = 0
        for _, grp in df.groupby("v", sort=True):
            m = int(grp["c"].sum())
            tie += m * m * m - m
            for gg, cc in zip(grp["g"], grp["c"]):
                cc = int(cc)
                out_g[gg] = out_g.get(gg, 0) + cc * (2 * a + m + 1)
                out_n[gg] = out_n.get(gg, 0) + cc
            a += m
        ks = sorted(out_g)
        return pa.table(
            {
                "g": pa.array(ks + ["__tie__"], pa.string()),
                "s2": pa.array([out_g[k] for k in ks] + [tie], pa.int64()),
                "n": pa.array([out_n[k] for k in ks] + [0], pa.int64()),
            }
        )

    agg = (
        hist.groupby("kb")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("s2", alias_name="s2"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    tie_t = int(agg.loc[agg["g"] == "__tie__", "s2"].iloc[0])
    grp = agg[agg["g"] != "__tie__"].sort_values("g").reset_index(drop=True)
    n_tot = int(grp["n"].sum())
    acc = sum(
        (int(s) * int(s)) / (4.0 * int(n)) for s, n in zip(grp["s2"], grp["n"])
    )
    h = 12.0 / (n_tot * (n_tot + 1.0)) * acc - 3.0 * (n_tot + 1.0)
    corr = 1.0 - tie_t / (n_tot * n_tot * n_tot * 1.0 - n_tot)
    return pd.DataFrame(
        {
            "n_total": [n_tot],
            "n_groups": [len(grp)],
            "h": [float(_r(h, 6))],
            "h_corrected": [float(_r(h / corr, 6))],
        }
    )


def q_theil_sen(sf_dir: str):
    """Theil-Sen robust trend over the daily event volume: slope = median
    of all pairwise slopes (n_j - n_i)/(j - i), intercept = median of
    (n_i - slope * i) — the outlier-proof alternative to q_ols_fit's
    least squares for ingest-volume drift.  The corpus reduces to the
    O(days) series (calendar-bounded, so the O(days^2) pair median is a
    driver scalar job even at 100 TB); both medians interpolate the two
    middle values exactly like DuckDB's quantile_cont(0.5)."""
    d = _daily_counts(sf_dir)
    x = np.arange(1, len(d) + 1, dtype=np.float64)
    y = d["n"].to_numpy(np.float64)
    i, j = np.triu_indices(len(d), k=1)
    slopes = np.sort((y[j] - y[i]) / (x[j] - x[i]))

    def med(a: np.ndarray) -> float:
        m = len(a) // 2
        return float(a[m]) if len(a) % 2 else float((a[m - 1] + a[m]) / 2.0)

    slope = med(slopes) if len(slopes) else 0.0
    inter = med(np.sort(y - slope * x)) if len(d) else 0.0
    return pd.DataFrame(
        {
            "n_days": [len(d)],
            "n_pairs": [len(slopes)],
            "slope": [float(_r(slope, 6))],
            "intercept": [float(_r(inter, 6))],
        }
    )


def q_page_hinkley(sf_dir: str, delta: float = 0.5, lam: float = 10.0):
    """Page-Hinkley drift test over the daily event volume (the
    sequential mean-shift monitor streaming systems run alongside CUSUM):
    m_t = sum_{i<=t} (x_i - mean(x_1..i) - delta), alarm when m_t -
    min(m_1..t) > lambda.  Unlike CUSUM's recursion this is pure prefix
    algebra — running mean, prefix sum, prefix min — so the mirror is
    plain window functions; the Ray side folds the same prefixes over
    the O(days) series in identical order."""
    d = _daily_counts(sf_dir)
    n = d["n"].to_numpy(np.float64)
    t = np.arange(1, len(d) + 1, dtype=np.float64)
    run_mean = np.cumsum(n) / t
    ph = np.cumsum(n - run_mean - delta)
    ph_min = np.minimum.accumulate(ph)
    return pd.DataFrame(
        {
            "day": d["day"],
            "n_events": d["n"].astype("int64"),
            "running_mean": [float(v) for v in _r(run_mean, 6)],
            "ph": [float(v) for v in _r(ph, 6)],
            "alarm": pd.Series((ph - ph_min > lam).astype(np.int64), dtype="int64"),
        }
    )


def q_dow_seasonality(sf_dir: str):
    """Day-of-week seasonality profile of the event volume: per ISO
    weekday (1=Mon..7=Sun) the day count and mean daily volume, plus
    each weekday's share of the total between-day variance explained
    (ss_within / ss_tot per weekday bucket) — the telemetry a recrawl
    scheduler reads before fitting weekly periodicity.  Same O(days)
    reduction as the other daily detectors; the variance folds are
    driver scalars in mirror-identical expression order."""
    d = _daily_counts(sf_dir)
    dt = pd.to_datetime(d["day"])
    dow = (dt.dt.dayofweek + 1).to_numpy(np.int64)  # ISO: 1=Mon..7=Sun
    n = d["n"].to_numpy(np.float64)
    mu = float(n.sum()) / len(n)
    ss_tot = float(((n - mu) ** 2).sum())
    rows = []
    for w in sorted(set(dow.tolist())):
        m = dow == w
        mw = float(n[m].sum()) / int(m.sum())
        ssw = float(((n[m] - mw) ** 2).sum())
        rows.append(
            {
                "isodow": int(w),
                "n_days": int(m.sum()),
                "mean_n": float(_r(mw, 6)),
                "var_share": float(_r(ssw / ss_tot, 6)) if ss_tot > 0 else 0.0,
            }
        )
    return pd.DataFrame(rows)


def q_mmr_select(sf_dir: str, k: int = 5, lam: float = 0.7):
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998)
    over the embedding corpus: with vec 0 as the query, greedily pick k
    vectors maximizing lam*cos(v, query) - (1-lam)*max_{s in S} cos(v, s)
    — the relevance-vs-redundancy re-ranker used to de-duplicate
    retrieval contexts and diversify few-shot pools.  Same round shape as
    q_kcenter_greedy: each step is ONE streaming pass; the chosen matrix
    (k x d) and query broadcast via ray.put, every batch emits only its
    own argmax row, the driver merges O(blocks) candidates."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q0 = np.asarray(
        emb.filter(expr="vec_id == 0").to_pandas()["embedding"].iloc[0], np.float64
    )
    chosen_ids: list = []
    chosen_vecs: list = []
    rows = []
    for step in range(1, k + 1):
        ref = ray.put(
            (q0, np.stack(chosen_vecs) if chosen_vecs else None, tuple(chosen_ids))
        )

        def cand(b: pa.Table, _ref=ref, _lam=lam) -> pa.Table:
            qv, cm, cids = ray.get(_ref)
            ids = b.column("vec_id").to_numpy()
            m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
            keep = (ids != 0) & ~np.isin(ids, cids)
            if not keep.any():
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                        "emb": pa.array([], pa.list_(pa.float64())),
                    }
                )
            ids, m = ids[keep], m[keep]
            nv = np.linalg.norm(m, axis=1)
            rel = (m @ qv) / (nv * np.linalg.norm(qv))
            if cm is None:
                sc = _lam * rel
            else:
                cn = np.linalg.norm(cm, axis=1)
                sim = (m @ cm.T) / (nv[:, None] * cn[None, :])
                sc = _lam * rel - (1.0 - _lam) * sim.max(axis=1)
            order = np.lexsort((ids, -sc))
            i = order[0]
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[i])], pa.int64()),
                    "score": pa.array([float(sc[i])], pa.float64()),
                    "emb": pa.array([m[i].tolist()], pa.list_(pa.float64())),
                }
            )

        c = emb.map_batches(cand, batch_format="pyarrow").to_pandas()
        if not len(c):  # candidate pool exhausted before k (mirror: empty pN)
            break
        c = c.sort_values(["score", "vec_id"], ascending=[False, True])
        best = c.iloc[0]
        chosen_ids.append(int(best["vec_id"]))
        chosen_vecs.append(np.asarray(best["emb"], np.float64))
        rows.append(
            {
                "step": step,
                "vec_id": int(best["vec_id"]),
                "score": float(_r(best["score"], 4)),
            }
        )
    return pd.DataFrame(rows)


def q_event_dispersion(sf_dir: str):
    """Fano factor (index of dispersion, var/mean of the daily count
    series) per event type — the burstiness dial distinguishing Poisson
    traffic (F~1) from bursty/clumped arrivals (F>1), read before sizing
    politeness budgets per traffic class.  Days with zero events of a
    type are out of that type's series (observed-day convention, like
    the other daily detectors).  Combiner groupby folds the stream to
    O(types x days) rows; per-type moments are distributive sums with
    the variance expanded in mirror-identical order."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def per_day(b: pa.Table) -> pa.Table:
        from collections import Counter

        days = b.column("ts").to_numpy().astype("datetime64[D]").astype(str)
        cnt: Counter = Counter(zip(b.column("event_type").to_pylist(), days))
        ks = sorted(cnt)
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in ks], pa.string()),
                "day": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    d = (
        ds.map_batches(per_day, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    rows = []
    for et, g in d.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.float64)
        nd = len(n)
        mean = float(n.sum()) / nd
        var = float((n * n).sum()) / nd - mean * mean
        rows.append(
            {
                "event_type": et,
                "n_days": nd,
                "mean_n": float(_r(mean, 6)),
                "fano": float(_r(var / mean, 6)),
            }
        )
    return pd.DataFrame(rows)


def q_sq8_error(sf_dir: str):
    """Int8 scalar-quantization audit for the embedding corpus: per-dim
    min/max over the corpus define a 256-level grid, every value
    round-trips through q = round(255*(v-min)/(max-min)), and the audit
    reports reconstruction MSE and worst absolute error — the standard
    go/no-go telemetry before switching an ANN index to SQ8 storage (4x
    smaller than f32).  Two streaming passes: per-dim min/max partials
    reduce to a d-sized broadcast, then per-batch squared-error partials
    reduce to three scalars; the corpus never materializes."""
    emb = _read(sf_dir, "embeddings", columns=["embedding"])

    def mm(b: pa.Table) -> pa.Table:
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        d = m.shape[1]
        return pa.table(
            {
                "i": pa.array(np.arange(d, dtype=np.int64)),
                "mn": pa.array(m.min(axis=0), pa.float64()),
                "mx": pa.array(m.max(axis=0), pa.float64()),
            }
        )

    lim = (
        emb.map_batches(mm, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("i")
    )
    mn = lim["mn"].to_numpy(np.float64)
    scale = (lim["mx"].to_numpy(np.float64) - mn) / 255.0
    ref = ray.put((mn, scale))

    def err(b: pa.Table, _ref=ref) -> pa.Table:
        mn_, s_ = ray.get(_ref)
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        safe = np.where(s_ == 0.0, 1.0, s_)  # constant dims quantize exactly
        q = _r((m - mn_) / safe, 0)
        e = np.where(s_ == 0.0, 0.0, (mn_ + q * s_) - m)
        return pa.table(
            {
                "sse": pa.array([float((e * e).sum())], pa.float64()),
                "mx": pa.array([float(np.abs(e).max())], pa.float64()),
                "n": pa.array([int(m.size)], pa.int64()),
                "nv": pa.array([len(m)], pa.int64()),
            }
        )

    p = emb.map_batches(err, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    return pd.DataFrame(
        {
            "n_vecs": [int(p["nv"].sum())],
            "n_dims": [len(mn)],
            "mse": [float(_r(p["sse"].sum() / n, 9))],
            "max_abs_err": [float(_r(p["mx"].max(), 9))],
        }
    )


def q_psi_drift(sf_dir: str, bin_w: int = 10):
    """Population Stability Index between the even-doc_id and odd-doc_id
    halves of the corpus on the token-count signal — the industry-standard
    "did my score distribution move" gate (PSI < 0.1 stable, > 0.25
    drifted), complementing the KS/Wasserstein/JS drift family with the
    binned-ratio form monitoring teams actually page on.  Fixed-width
    bins (bin_w tokens) with +1 Laplace smoothing on counts so empty
    bins can't produce infinities; a combiner groupby reduces the corpus
    to O(bins) (bin, n_even, n_odd) rows."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def part(b: pa.Table, _w=bin_w) -> pa.Table:
        from collections import Counter

        ev: Counter = Counter()
        od: Counter = Counter()
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            bn = len(_oracle_tokens(t)) // _w
            (ev if d % 2 == 0 else od)[bn] += 1
        ks = sorted(set(ev) | set(od))
        return pa.table(
            {
                "bin": pa.array(ks, pa.int64()),
                "n_even": pa.array([ev.get(k, 0) for k in ks], pa.int64()),
                "n_odd": pa.array([od.get(k, 0) for k in ks], pa.int64()),
            }
        )

    h = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n_even", alias_name="n_even"), Sum("n_odd", alias_name="n_odd"))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    import math

    nb = len(h)
    te = int(h["n_even"].sum()) + nb
    to = int(h["n_odd"].sum()) + nb
    psi = 0.0
    for _, r in h.iterrows():
        p = (int(r["n_even"]) + 1) / te
        q = (int(r["n_odd"]) + 1) / to
        psi += (p - q) * math.log(p / q)
    return pd.DataFrame(
        {
            "n_bins": [nb],
            "n_even": [int(h["n_even"].sum())],
            "n_odd": [int(h["n_odd"].sum())],
            "psi": [float(_r(psi, 6))],
        }
    )


def q_triplet_violation(sf_dir: str, margin: float = 0.05):
    """Triplet-margin violation rate over the embedding corpus: anchors
    pair with the NEXT same-label vector (positive) and the NEXT vector
    overall when its label differs (negative); a triplet violates when
    cos(a, pos) < cos(a, neg) + margin — the metric-learning eval that
    says whether labels are linearly recoverable from the geometry,
    complementing q_label_knn_accuracy's classifier view.  Both pairings
    are the deterministic consecutive-pair shuffle (jaccard_pairs'
    pair_id trick, per-label and global), so no O(n^2) join; vectors
    travel WITH the pair rows and only counters reach the driver."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def pos_pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values("vec_id").reset_index(drop=True)
        if len(df) < 2:
            return pa.table(
                {
                    "anchor": pa.array([], pa.int64()),
                    "pv": pa.array([], pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "anchor": pa.array(df["vec_id"].iloc[:-1].to_numpy(), pa.int64()),
                "pv": pa.array(
                    [list(map(float, v)) for v in df["embedding"].iloc[1:]],
                    pa.list_(pa.float64()),
                ),
            }
        )

    def tag_pos(b: pa.Table) -> pa.Table:
        t = pos_pairs(b)
        return t.append_column("role", pa.array(["p"] * len(t), pa.string()))

    pos = emb.groupby("label").map_groups(tag_pos, batch_format="pyarrow")

    # negatives: consecutive (i, i+1) with differing labels — vec_ids are
    # dense, so each vec emits its own row as 'a' and its predecessor's
    # 'n' row; groupby(anchor) co-locates the pair (jaccard_pairs trick)
    def neg_roles(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_pylist()
        labs = b.column("label").to_pylist()
        vecs = [list(map(float, v)) for v in b.column("embedding").to_pylist()]
        anchor, role, pv, lab = [], [], [], []
        for i, l, v in zip(ids, labs, vecs):
            anchor.append(i)
            role.append("a")
            pv.append(v)
            lab.append(int(l))
            if i > 0:
                anchor.append(i - 1)
                role.append("n")
                pv.append(v)
                lab.append(int(l))
        return pa.table(
            {
                "anchor": pa.array(anchor, pa.int64()),
                "pv": pa.array(pv, pa.list_(pa.float64())),
                "role": pa.array(role, pa.string()),
                "lab": pa.array(lab, pa.int64()),
            }
        )

    neg = emb.map_batches(neg_roles, batch_format="pyarrow")
    pos = pos.map_batches(
        lambda b: b.append_column("lab", pa.array([-1] * len(b), pa.int64())),
        batch_format="pyarrow",
    )

    def judge(g: pa.Table, _m=margin) -> pa.Table:
        df = g.to_pandas()
        roles = dict(zip(df["role"], df.index))
        empty = pa.table(
            {"n": pa.array([], pa.int64()), "viol": pa.array([], pa.int64())}
        )
        if not {"a", "n", "p"} <= roles.keys():
            return empty
        la = int(df["lab"].iloc[roles["a"]])
        ln = int(df["lab"].iloc[roles["n"]])
        if la == ln:  # the global successor shares the label: no negative
            return empty
        av = np.asarray(df["pv"].iloc[roles["a"]], np.float64)
        pvv = np.asarray(df["pv"].iloc[roles["p"]], np.float64)
        ngv = np.asarray(df["pv"].iloc[roles["n"]], np.float64)
        cp = float(av @ pvv / (np.linalg.norm(av) * np.linalg.norm(pvv)))
        cn = float(av @ ngv / (np.linalg.norm(av) * np.linalg.norm(ngv)))
        return pa.table(
            {
                "n": pa.array([1], pa.int64()),
                "viol": pa.array([int(cp < cn + _m)], pa.int64()),
            }
        )

    agg = (
        neg.union(pos)
        .groupby("anchor")
        .map_groups(judge, batch_format="pyarrow")
        .aggregate(Sum("n", alias_name="n"), Sum("viol", alias_name="viol"))
    )
    n_trip = int(agg["n"] or 0)
    n_viol = int(agg["viol"] or 0)
    return pd.DataFrame(
        {
            "n_triplets": [n_trip],
            "n_violations": [n_viol],
            "violation_rate": [float(_r(n_viol / n_trip, 6)) if n_trip else 0.0],
        }
    )


def q_mattr(sf_dir: str, w: int = 50):
    """Moving-Average Type-Token Ratio (Covington & McFall 2010) per doc:
    mean over all length-w windows of (distinct tokens in window)/w —
    the length-independent lexical-diversity signal (plain TTR shrinks
    with doc length; q_heaps_law fits the corpus curve, MATTR scores
    each doc).  Docs shorter than w fall back to whole-doc TTR.  Pure
    map stage with an O(len) sliding Counter per doc; no shuffle."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table, _w=w) -> pa.Table:
        from collections import Counter

        ids, out = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            n = len(toks)
            if n < _w:
                v = len(set(toks)) / n
            else:
                cnt = Counter(toks[:_w])
                acc = len(cnt)
                for i in range(n - _w):
                    cnt[toks[i]] -= 1
                    if not cnt[toks[i]]:
                        del cnt[toks[i]]
                    cnt[toks[i + _w]] += 1
                    acc += len(cnt)
                v = acc / (_w * (n - _w + 1))
            ids.append(d)
            out.append(v)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "mattr": pa.array(_r(out, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_mase_daily(sf_dir: str, m: int = 7):
    """MASE forecast-quality floor on the daily event volume: the mean
    absolute error of the seasonal-naive forecast (x_{t-7}) scaled by the
    one-step naive MAE (x_{t-1}) — MASE < 1 means weekly seasonality is
    real signal a recrawl scheduler should exploit, > 1 means yesterday
    already beats last-week.  Same O(days) reduction as the other daily
    detectors; lag differences fold driver-side in mirror order."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    naive = np.abs(x[1:] - x[:-1])
    seas = np.abs(x[m:] - x[:-m]) if len(x) > m else np.array([])
    mae_n = float(naive.mean()) if len(naive) else 0.0
    mae_s = float(seas.mean()) if len(seas) else 0.0
    mase = mae_s / mae_n if len(seas) and mae_n > 0 else 0.0
    return pd.DataFrame(
        {
            "n_days": [len(x)],
            "mae_naive": [float(_r(mae_n, 6))],
            "mae_seasonal": [float(_r(mae_s, 6))],
            "mase": [float(_r(mase, 6))],
        }
    )


def q_split_leakage(sf_dir: str):
    """Train/val/test near-dup LEAKAGE audit: every MinHash-LSH candidate
    pair (the _minhash_pair_dataset shared by minhash_dedup_pairs /
    dedup_clusters, doubled corpus) classified by the two docs' hash
    splits (split_assign's 80/10/10 md5 rule) — cross-split pairs are
    exactly the contamination an eval suite inherits when dedup runs
    AFTER splitting.  Pure map over the pair stream + one tiny groupby;
    the pair set itself never materializes on the driver."""
    from ..stages.dedup import _stable_h64

    pairs = _minhash_pair_dataset(sf_dir)

    def classify(b: pa.Table) -> pa.Table:
        from collections import Counter

        def split_of(d: int) -> str:
            h = _stable_h64(str(d)) % 100
            return "train" if h < 80 else ("val" if h < 90 else "test")

        cnt: Counter = Counter()
        for a, b_ in zip(b.column("doc_a").to_pylist(), b.column("doc_b").to_pylist()):
            sa, sb = sorted((split_of(int(a)), split_of(int(b_))))
            cnt[(sa, sb)] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "split_a": pa.array([k[0] for k in ks], pa.string()),
                "split_b": pa.array([k[1] for k in ks], pa.string()),
                "n_pairs": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    def leak_flag(b: pa.Table) -> pa.Table:
        sa = b.column("split_a").to_pylist()
        sb = b.column("split_b").to_pylist()
        return pa.table(
            {
                "split_a": b.column("split_a"),
                "split_b": b.column("split_b"),
                "n_pairs": b.column("n_pairs"),
                "is_leakage": pa.array(
                    [int(x != y) for x, y in zip(sa, sb)], pa.int64()
                ),
            }
        )

    return (
        pairs.map_batches(classify, batch_format="pyarrow")
        .groupby(["split_a", "split_b"])
        .sum("n_pairs")
        .map_batches(
            lambda b: b.rename_columns(["split_a", "split_b", "n_pairs"]),
            batch_format="pyarrow",
        )
        .map_batches(leak_flag, batch_format="pyarrow")
        .sort(["split_a", "split_b"])
    )


def q_burrows_delta(sf_dir: str, m: int = 20):
    """Burrows' Delta stylometric distance between every source pair:
    z-score the per-source relative frequencies of the corpus's top-m
    words (across the source population), delta = mean |z_a - z_b| — the
    classic authorship/provenance signal, here the cheap "are two feeds
    the same underlying generator" probe before near-dup spend.  Two
    passes: a combiner groupby finds the global top-m (driver sees m
    rows), then per-(source, top-word) counts + per-source totals reduce
    to an O(sources x m) table; all pair math is driver scalars in
    mirror-identical expression order."""
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for t in b.column("text").to_pylist():
            cnt.update(_oracle_tokens(t))
        return pa.table(
            {
                "token": pa.array(list(cnt.keys()), pa.string()),
                "cnt": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    top = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
        .map_batches(lambda b: b.rename_columns(["token", "cnt"]), batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(m)
        .to_pandas()
    )
    top_set = frozenset(top["token"])
    top_ref = ray.put(top_set)

    def per_source(b: pa.Table) -> pa.Table:
        from collections import Counter

        tw = ray.get(top_ref)
        cnt: Counter = Counter()
        tot: Counter = Counter()
        for s, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            tot[s] += len(toks)
            for w in toks:
                if w in tw:
                    cnt[(s, w)] += 1
        rows = [(s, w, c) for (s, w), c in cnt.items()] + [
            (s, "", c) for s, c in tot.items()
        ]
        rows.sort()
        return pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "token": pa.array([r[1] for r in rows], pa.string()),
                "c": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    tab = (
        docs.map_batches(per_source, batch_format="pyarrow")
        .groupby(["source", "token"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    totals = dict(
        zip(tab.loc[tab["token"] == "", "source"], tab.loc[tab["token"] == "", "c"])
    )
    sources = sorted(totals)
    words = sorted(top["token"])
    cmap = {
        (r["source"], r["token"]): int(r["c"])
        for _, r in tab[tab["token"] != ""].iterrows()
    }
    import math

    ns = len(sources)
    z: dict = {}
    for w in words:
        f = [cmap.get((s, w), 0) * 1.0 / totals[s] for s in sources]
        mu = sum(f) / ns
        sig = math.sqrt(sum(x * x for x in f) / ns - mu * mu)
        for s, x in zip(sources, f):
            z[(s, w)] = (x - mu) / sig if sig > 0 else 0.0
    rows = []
    for i, a in enumerate(sources):
        for b_ in sources[i + 1 :]:
            d = sum(abs(z[(a, w)] - z[(b_, w)]) for w in words) / len(words)
            rows.append(
                {"source_a": a, "source_b": b_, "delta": float(_r(d, 6))}
            )
    return pd.DataFrame(rows)


def q_source_coverage_curve(sf_dir: str):
    """Corpus concentration curve: sources ranked by token volume
    (largest first), with each rank's cumulative share of all tokens —
    the "how many feeds until 90% of the data" dial for ingest
    prioritization (the Lorenz-curve complement of the host_gini
    scalar).  Per-source token counts fold combiner-style; the curve is
    an O(sources) driver fold in mirror-identical order."""
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for s, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            cnt[s] += len(_oracle_tokens(t))
        ks = sorted(cnt)
        return pa.table(
            {
                "source": pa.array(ks, pa.string()),
                "n": pa.array([cnt[x] for x in ks], pa.int64()),
            }
        )

    d = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values(["n", "source"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = int(d["n"].sum())
    cum = d["n"].cumsum().to_numpy()
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(d) + 1, dtype=np.int64),
            "source": d["source"],
            "n_tokens": d["n"].astype("int64"),
            "cum_share": [float(v) for v in _r(cum * 1.0 / total, 6)],
        }
    )


def q_session_threshold_sweep(sf_dir: str):
    """Sessionization sensitivity sweep: the session count and mean
    events-per-session the 30-minute rule (q_sessionize) would become at
    gap thresholds of 5m / 30m / 2h — the calibration table read before
    committing a session definition.  Per-user gap streams fold inside
    groupby(user_id).map_groups (only per-user counters leave), then one
    tiny per-threshold reduce."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    TH = [300, 1800, 7200]  # seconds

    def per_user(g: pa.Table) -> pa.Table:
        ts = np.sort(g.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = (ts[1:] - ts[:-1]) / 1_000_000.0
        return pa.table(
            {
                "th": pa.array(TH, pa.int64()),
                "n_sessions": pa.array(
                    [1 + int((gaps > t).sum()) for t in TH], pa.int64()
                ),
                "n_events": pa.array([len(ts)] * len(TH), pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        ns = b.column("n_sessions").to_numpy()
        ne = b.column("n_events").to_numpy()
        return pa.table(
            {
                "threshold_s": b.column("th"),
                "n_sessions": pa.array(ns, pa.int64()),
                "mean_events": pa.array(_r(ne * 1.0 / ns, 6), pa.float64()),
            }
        )

    return (
        ev.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("th")
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("n_events", alias_name="n_events"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort("threshold_s")
    )


def q_quantile_normalize(sf_dir: str):
    """Within-language percentile normalization of the token-count signal
    — the score-alignment step before mixing quality thresholds across
    languages (a raw length cut that's P40 in English may be P75 in
    Chinese; normalize first, THEN share the threshold).  percentile =
    (2*count_below + count_equal) / (2*n_lang), i.e. the average-rank
    midpoint, computed from the distinct-value histogram per lang in
    EXACT integer arithmetic (the Kruskal-Wallis fold shape keyed by
    lang); output is one row per distinct (lang, n_tokens)."""
    docs = _read(sf_dir, "documents", columns=["lang", "text"])

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for lang, t in zip(b.column("lang").to_pylist(), b.column("text").to_pylist()):
            cnt[(lang, len(_oracle_tokens(t)))] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "nt": pa.array([k[1] for k in ks], pa.int64()),
                "c": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    hist = (
        _read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "nt"])
        .sum("c")
        .map_batches(
            lambda b: b.rename_columns(["lang", "nt", "c"]), batch_format="pyarrow"
        )
    )

    def fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values("nt").reset_index(drop=True)
        n = int(df["c"].sum())
        a = 0
        pct = []
        for c in df["c"]:
            c = int(c)
            pct.append((2 * a + c) / (2.0 * n))
            a += c
        return pa.table(
            {
                "lang": df["lang"],
                "n_tokens": pa.array(df["nt"].to_numpy(), pa.int64()),
                "n_docs": pa.array(df["c"].to_numpy(), pa.int64()),
                "pct": pa.array(_r(pct, 6), pa.float64()),
            }
        )

    return hist.groupby("lang").map_groups(fold, batch_format="pyarrow").sort(
        ["lang", "n_tokens"]
    )


def q_interarrival_burstiness(sf_dir: str):
    """Goh-Barabasi burstiness B = (sigma - mu) / (sigma + mu) of the
    inter-arrival gaps per event type (B = -1 periodic, 0 Poisson, -> 1
    bursty) — the per-stream complement of q_event_dispersion's
    daily-count Fano factor, read before sizing per-class rate limits.
    Per-type gap moments fold inside groupby(event_type).map_groups as
    three scalars (n, sum, sumsq); variance expands in mirror-identical
    order."""
    import math

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])

    def per_type(g: pa.Table) -> pa.Table:
        et = g.column("event_type")[0].as_py()
        ts = np.sort(g.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = (ts[1:] - ts[:-1]) / 1_000_000.0
        n = len(gaps)
        if n == 0:  # singleton stream: no gaps, no row (mirror's WHERE)
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_gaps": pa.array([], pa.int64()),
                    "mean_gap_s": pa.array([], pa.float64()),
                    "burstiness": pa.array([], pa.float64()),
                }
            )
        mu = float(gaps.sum()) / n
        sig = math.sqrt(float((gaps * gaps).sum()) / n - mu * mu)
        b = (sig - mu) / (sig + mu) if sig + mu > 0 else 0.0
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n_gaps": pa.array([n], pa.int64()),
                "mean_gap_s": pa.array([float(_r(mu, 6))], pa.float64()),
                "burstiness": pa.array([float(_r(b, 6))], pa.float64()),
            }
        )

    return (
        ev.groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
        .sort("event_type")
    )


def q_wilson_keep_ci(sf_dir: str, z: float = 1.96):
    """Wilson score 95% confidence interval on the per-source Gopher
    keep rate — the uncertainty band that separates "this feed is bad"
    from "this feed is small" before a per-source budget decision
    (q_host_quality_budget acts on the point estimate; this bounds it).
    Per-source (n, keeps) fold combiner-style; the Wilson algebra is
    driver scalars in mirror-identical expression order."""
    import math

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        n: Counter = Counter()
        k: Counter = Counter()
        for s, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            n[s] += 1
            k[s] += _gopher_stats(_oracle_tokens(t))[4]
        ks = sorted(n)
        return pa.table(
            {
                "source": pa.array(ks, pa.string()),
                "n": pa.array([n[x] for x in ks], pa.int64()),
                "k": pa.array([k.get(x, 0) for x in ks], pa.int64()),
            }
        )

    d = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    rows = []
    for _, r in d.iterrows():
        n, k = int(r["n"]), int(r["k"])
        p = k * 1.0 / n
        z2 = z * z
        den = 1.0 + z2 / n
        ctr = (p + z2 / (2.0 * n)) / den
        hw = (z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) / den
        rows.append(
            {
                "source": r["source"],
                "n_docs": n,
                "keep_rate": float(_r(p, 6)),
                "ci_lo": float(_r(ctr - hw, 6)),
                "ci_hi": float(_r(ctr + hw, 6)),
            }
        )
    return pd.DataFrame(rows)


def q_feature_hash_collisions(sf_dir: str, space: int = 65536):
    """Feature-hashing collision audit: the corpus vocabulary hashed into
    a 2^16 bucket space (md5-low-64 % space — the q_ngram_hash_features
    trick), reporting distinct tokens, occupied buckets, colliding
    buckets and the collision rate — the dimensionality-vs-fidelity dial
    read before committing a hashed-features model.  Distinct vocab is
    one combiner groupby; bucket stats are a second tiny groupby over
    (bucket) rows."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["text"])

    def vocab(b: pa.Table) -> pa.Table:
        toks = set()
        for t in b.column("text").to_pylist():
            toks.update(_oracle_tokens(t))
        return pa.table({"token": pa.array(sorted(toks), pa.string())})

    def bucketize(b: pa.Table, _m=space) -> pa.Table:
        return pa.table(
            {
                "bucket": pa.array(
                    [_stable_h64(t) % _m for t in b.column("token").to_pylist()],
                    pa.int64(),
                ),
                "one": pa.array([1] * b.num_rows, pa.int64()),
            }
        )

    per_bucket = (
        docs.map_batches(vocab, batch_format="pyarrow")
        .groupby("token")
        .count()
        .select_columns(["token"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .sum("one")
        .map_batches(
            lambda b: b.rename_columns(["bucket", "k"]), batch_format="pyarrow"
        )
        .to_pandas()
    )
    n_tokens = int(per_bucket["k"].sum())
    n_buckets = len(per_bucket)
    n_colliding = int((per_bucket["k"] > 1).sum())
    n_collided_tokens = int(per_bucket.loc[per_bucket["k"] > 1, "k"].sum())
    return pd.DataFrame(
        {
            "n_tokens": [n_tokens],
            "n_buckets_used": [n_buckets],
            "n_colliding_buckets": [n_colliding],
            "collision_rate": [float(_r(n_collided_tokens * 1.0 / n_tokens, 6))],
        }
    )


def q_srm_check(sf_dir: str):
    """Sample-Ratio-Mismatch gate on the 80/10/10 hash split: observed
    split sizes vs expected proportions as a 2-dof chi-squared statistic
    — the first thing an experimentation pipeline checks before trusting
    any split-level comparison (a biased assignment invalidates
    everything downstream).  Composes q_split_assign's exact md5 rule;
    one combiner groupby, then driver scalars in mirror order."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for d in b.column("doc_id").to_pylist():
            h = _stable_h64(str(d)) % 100
            cnt["train" if h < 80 else ("val" if h < 90 else "test")] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "split": pa.array(ks, pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    d = (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby("split")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .set_index("split")["n"]
    )
    n = int(d.sum())
    exp = {"train": 0.8, "val": 0.1, "test": 0.1}
    chi2 = sum(
        (int(d.get(s, 0)) - n * p) * (int(d.get(s, 0)) - n * p) / (n * p)
        for s, p in sorted(exp.items())
    )
    return pd.DataFrame(
        {
            "n_docs": [n],
            "n_train": [int(d.get("train", 0))],
            "n_val": [int(d.get("val", 0))],
            "n_test": [int(d.get("test", 0))],
            "chi2": [float(_r(chi2, 6))],
        }
    )


def q_kendall_tau(sf_dir: str):
    """Kendall tau-b rank association between daily event volume and daily
    revenue — the monotone-dependence dial that q_rank_correlation's
    Spearman misses under heavy ties (tau-b carries explicit tie
    corrections n1/n2).  Shape: the corpus reduces combiner-style to the
    O(days) calendar series (integer counts x integer cents, so concordance
    is exact sign arithmetic), and the O(days^2) pair scan is a driver
    scalar job even at 100 TB because days are calendar-bounded."""
    d = _daily_n_cents(sf_dir)
    m = len(d)
    x = d["n"].to_numpy(np.int64)
    y = d["cents"].to_numpy(np.int64)
    i, j = np.triu_indices(m, k=1)
    prod = np.sign(x[j] - x[i]).astype(np.int64) * np.sign(y[j] - y[i]).astype(np.int64)
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    n0 = m * (m - 1) // 2

    def tie_pairs(a: np.ndarray) -> int:
        _, cnt = np.unique(a, return_counts=True)
        return int((cnt * (cnt - 1) // 2).sum())

    n1, n2 = tie_pairs(x), tie_pairs(y)
    denom = math.sqrt(float(n0 - n1) * float(n0 - n2))
    tau = (conc - disc) / denom if denom else np.nan
    return pd.DataFrame(
        {
            "n_days": [m],
            "concordant": [conc],
            "discordant": [disc],
            "tau_b": [float(_r(tau, 6))],
        }
    )


def q_yule_k(sf_dir: str):
    """Yule's characteristic K — the classic repeat-rate lexical-diversity
    constant (K = 10^4 (sum_r r^2 V_r - N) / N^2, length-invariant unlike
    raw TTR) — companion dial to q_mattr and q_hapax_ratio.  Shape: the
    (token, count) combiner groupby is the only shuffle; each downstream
    batch folds its exact integer (sum c, sum c^2, types) partial and the
    driver adds a handful of triples."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def counts(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for t in b.column("text").to_pylist():
            for w in _oracle_tokens(t):
                cnt[w] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "token": pa.array(ks, pa.string()),
                "c": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    grouped = docs.map_batches(counts, batch_format="pyarrow").groupby("token").sum("c")

    def fold(b: pa.Table) -> pa.Table:
        c = b.column(1).to_numpy().astype(np.int64)
        return pa.table(
            {
                "n": pa.array([int(c.sum())], pa.int64()),
                "s2": pa.array([int((c * c).sum())], pa.int64()),
                "v": pa.array([len(c)], pa.int64()),
            }
        )

    parts = grouped.map_batches(fold, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s2 = int(parts["s2"].sum())
    v = int(parts["v"].sum())
    k = 10000.0 * (s2 - n) / (n * n) if n else np.nan
    return pd.DataFrame(
        {"n_tokens": [n], "n_types": [v], "yule_k": [float(_r(k, 6))]}
    )


def q_brier_decomposition(sf_dir: str):
    """Murphy decomposition of the Brier score for a purchase-propensity
    forecast: cohorts (user_id % 10) get their train-window purchase rate
    (ts < 2024-01-16) as the predicted p, scored on the eval window —
    brier = reliability - resolution + uncertainty, each term folded from
    EXACT per-cohort sufficient statistics (n, purchases are integers; the
    per-bin Brier sum collapses to n p^2 - 2 p b + b, so no per-event
    float accumulates in either engine).  Shape: one pass emits per-batch
    (cohort, split, n, b) partials; the combiner groupby moves <= 20 rows;
    everything after is driver arithmetic on the 10-cohort table."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    cutoff = np.datetime64("2024-01-16T00:00:00")

    def parts(b: pa.Table) -> pa.Table:
        coh = (b.column("user_id").to_numpy() % 10).astype(np.int64)
        y = (
            pc.equal(b.column("event_type"), pa.scalar("purchase"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tr = (b.column("ts").to_numpy() < cutoff).astype(np.int64)
        key = coh * 2 + tr
        n = np.bincount(key, minlength=20).astype(np.int64)
        bsum = np.bincount(key, weights=y, minlength=20).astype(np.int64)
        nz = n > 0
        idx = np.arange(20)[nz]
        return pa.table(
            {
                "cohort": pa.array(idx // 2, pa.int64()),
                "is_train": pa.array(idx % 2 == 1, pa.bool_()),
                "n": pa.array(n[nz], pa.int64()),
                "b": pa.array(bsum[nz], pa.int64()),
            }
        )

    cells = (
        ds.map_batches(parts, batch_format="pyarrow")
        .groupby(["cohort", "is_train"])
        .sum(["n", "b"])
        .to_pandas()
        .rename(columns={"sum(n)": "n", "sum(b)": "b"})
    )
    tr = cells[cells["is_train"]].set_index("cohort")
    ev = cells[~cells["is_train"]].set_index("cohort").sort_index()
    g_p = float(tr["b"].sum()) / float(tr["n"].sum()) if len(tr) else np.nan
    nn = int(ev["n"].sum())
    bb = int(ev["b"].sum())
    ybar = bb / nn if nn else np.nan
    brier = rel = res = 0.0
    for coh, row in ev.iterrows():
        n_i, b_i = int(row["n"]), int(row["b"])
        p = (
            float(tr.loc[coh, "b"]) / float(tr.loc[coh, "n"])
            if coh in tr.index
            else g_p
        )
        yb = b_i / n_i
        brier += n_i * p * p - 2.0 * p * b_i + b_i
        rel += n_i * (p - yb) * (p - yb)
        res += n_i * (yb - ybar) * (yb - ybar)
    return pd.DataFrame(
        {
            "n_eval": [nn],
            "brier": [float(_r(brier / nn, 6)) if nn else np.nan],
            "reliability": [float(_r(rel / nn, 6)) if nn else np.nan],
            "resolution": [float(_r(res / nn, 6)) if nn else np.nan],
            "uncertainty": [float(_r(ybar * (1 - ybar), 6)) if nn else np.nan],
        }
    )


def q_hurst_exponent(sf_dir: str):
    """Hurst exponent by classical rescaled-range (R/S) analysis of the
    daily event volume (Hurst 1951; Mandelbrot-Wallis pox-diagram form):
    for window sizes w in {4, 8, 16} the series splits into full
    consecutive segments, each scoring range(cumulative mean deviation) /
    population std; H is the log-log OLS slope of mean R/S on w — the
    long-range-dependence dial (H≈0.5 memoryless, H>0.5 persistent load).
    Shape: the corpus folds to the O(days) combiner series; all R/S
    arithmetic runs driver-side on that calendar-bounded series using
    exact integer cumsums and the closed-form Σ(x-μ)² = Σx² - b²/w, so
    both engines evaluate identical IEEE expressions."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.int64)
    m = len(x)
    out_rs = {}
    pts = []
    for w in (4, 8, 16):
        nseg = m // w
        vals = []
        for s in range(nseg):
            seg = x[s * w : (s + 1) * w]
            b = int(seg.sum())
            sx2 = int((seg * seg).sum())
            var_num = sx2 - b * b / w
            if var_num <= 0:
                continue
            std = math.sqrt(var_num / w)
            cum = np.cumsum(seg).astype(np.float64)
            t = np.arange(1, w + 1, dtype=np.float64)
            z = cum - t * (b / w)
            vals.append((float(z.max()) - float(z.min())) / std)
        if vals:
            rs = float(np.mean(vals))
            out_rs[w] = rs
            if rs > 0:
                pts.append((math.log(w), math.log(rs)))
    if len(pts) >= 2:
        k = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        hurst = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    else:
        hurst = np.nan
    return pd.DataFrame(
        {
            "rs_4": [float(_r(out_rs[4], 6)) if 4 in out_rs else np.nan],
            "rs_8": [float(_r(out_rs[8], 6)) if 8 in out_rs else np.nan],
            "rs_16": [float(_r(out_rs[16], 6)) if 16 in out_rs else np.nan],
            "hurst": [float(_r(hurst, 6)) if hurst == hurst else np.nan],
        }
    )


def q_acf_profile(sf_dir: str):
    """Autocorrelation profile of the daily event volume at lags 1..7 —
    the full weekly-memory fingerprint that q_hourly_autocorr's single
    lag-1 number can't show (a lag-7 spike = weekly seasonality, slow
    decay = trend/persistence).  Shape: one combiner reduce to the
    O(days) series; each lag's centered product sum runs on that series
    (mirrored as rn = rn + lag self-joins), normalized by the full-series
    Σ(x-μ)²."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    m = len(x)
    mu = float(x.sum()) / m if m else np.nan
    xc = x - mu
    den = float((xc * xc).sum())
    rows = []
    for lag in range(1, 8):
        if lag >= m or den <= 0:
            continue
        num = float((xc[:-lag] * xc[lag:]).sum())
        rows.append(
            {"lag": lag, "n_pairs": m - lag, "acf": float(_r(num / den, 6))}
        )
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "acf"])


def q_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test for randomness of the daily event volume:
    days are coded above/below the interpolated median (exact-median days
    dropped, the standard convention), runs counted in day order, and the
    normal z uses the closed-form run-count mean/variance — the cheap
    "is ingest volume serially random or regime-switching" gate that
    complements q_cusum_changepoints.  Same O(days) combiner reduce;
    everything downstream is exact integer/rational driver arithmetic."""
    d = _daily_counts(sf_dir)
    x = d["n"].to_numpy(np.float64)
    srt = np.sort(x)
    mm = len(srt)
    if mm == 0:
        med = np.nan
    elif mm % 2:
        med = float(srt[mm // 2])
    else:
        med = float((srt[mm // 2 - 1] + srt[mm // 2]) / 2.0)
    b = x[x != med] > med
    n_kept = int(len(b))
    n1 = int(b.sum())
    n2 = n_kept - n1
    if n_kept:
        runs = 1.0 + float((b[1:] != b[:-1]).sum())
    else:
        runs = np.nan
    nn = n1 + n2
    if n1 and n2 and nn > 1:
        e = 2.0 * n1 * n2 / nn + 1.0
        var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1.0))
        z = (runs - e) / math.sqrt(var) if var > 0 else np.nan
    else:
        z = np.nan
    return pd.DataFrame(
        {
            "n_kept": [n_kept],
            "n_above": [n1],
            "n_below": [n2],
            "runs": [float(_r(runs, 6)) if runs == runs else np.nan],
            "z": [float(_r(z, 6)) if z == z else np.nan],
        }
    )


def q_cramers_v(sf_dir: str):
    """Cramer's V (plus the Bergsma-Wicher bias-corrected variant) for the
    lang x source contingency table — the BOUNDED [0,1] association
    strength that makes q_chi2_lang_source's raw statistic comparable
    across corpora of different size.  Shape: the contingency cells reduce
    combiner-style ((lang, source, n) rows are the only shuffle); chi2 and
    both V forms fold from the O(langs x sources) cell table."""
    docs = _read(sf_dir, "documents", columns=["lang", "source"])

    def cells(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby(["lang", "source"], as_index=False).size()
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"}), preserve_index=False
        )

    tab = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    piv = tab.pivot_table(index="lang", columns="source", values="n", fill_value=0)
    o = piv.to_numpy(np.float64)
    n = float(o.sum())
    rt = o.sum(axis=1, keepdims=True)
    ct = o.sum(axis=0, keepdims=True)
    e = rt @ ct / n
    chi2 = float(((o - e) ** 2 / e)[e > 0].sum())
    r, k = o.shape
    phi2 = chi2 / n
    v = math.sqrt(phi2 / (min(r, k) - 1)) if min(r, k) > 1 else np.nan
    # Bergsma-Wicher bias correction
    phi2c = max(0.0, phi2 - (r - 1) * (k - 1) / (n - 1)) if n > 1 else np.nan
    rc = r - (r - 1) ** 2 / (n - 1) if n > 1 else np.nan
    kc = k - (k - 1) ** 2 / (n - 1) if n > 1 else np.nan
    vc = (
        math.sqrt(phi2c / (min(rc, kc) - 1))
        if n > 1 and min(rc, kc) > 1
        else np.nan
    )
    return pd.DataFrame(
        {
            "n": [int(n)],
            "n_langs": [r],
            "n_sources": [k],
            "chi2": [float(_r(chi2, 6))],
            "cramers_v": [float(_r(v, 6)) if v == v else np.nan],
            "cramers_v_corrected": [float(_r(vc, 6)) if vc == vc else np.nan],
        }
    )


def q_lorenz_curve(sf_dir: str):
    """User-activity Lorenz curve: users ranked by event count ascending,
    cumulative event share sampled at each user-decile cut — the
    concentration CURVE behind q_host_gini's single number (decile 10 is
    always 1.0; a flat diagonal = uniform load, a hockey stick = a few
    power users own the corpus).  Shape: the per-user combiner groupby is
    the only shuffle; the decile fold runs on the O(users) table."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def cnt(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("user_id").to_numpy(), return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    c = (
        ev.map_batches(cnt, batch_format="pyarrow")
        .groupby("user_id")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values(["n", "user_id"])
        .reset_index(drop=True)
    )
    u = len(c)
    tot = int(c["n"].sum())
    cum = c["n"].cumsum().to_numpy(np.int64)
    rows = []
    for dec in range(1, 11):
        rn = math.ceil(dec * u / 10.0)
        if rn < 1:
            continue
        rows.append(
            {
                "decile": dec,
                "n_users": rn,
                "cum_share": float(_r(cum[rn - 1] / tot, 6)),
            }
        )
    return pd.DataFrame(rows, columns=["decile", "n_users", "cum_share"])


def q_keyness_llr(sf_dir: str, k: int = 5):
    """Dunning log-likelihood (G^2) keyness: for each source, the k most
    OVER-represented tokens vs the rest of the corpus — the classic
    corpus-linguistics "what is this source about" signal
    (complementing q_distinctive_terms' weighted log-odds with the LR-test
    statistic).  Shape: (source, token) count combiner -> one groupby;
    token totals come from a second groupby over those unique rows and
    join back via the partitioned hash_join (both sides vocabulary-sized,
    nothing broadcast); source totals are O(sources) and broadcast.  A
    per-batch partial top-k keeps the final per-source fold at
    O(k x batches) rows."""
    from ..stages.joins import hash_join

    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for src, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            for tok in _oracle_tokens(t):
                cnt[(src, tok)] += 1
        srcs, toks = zip(*cnt.keys()) if cnt else ((), ())
        return pa.table(
            {
                "source": pa.array(list(srcs), pa.string()),
                "token": pa.array(list(toks), pa.string()),
                "a": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    st = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby(["source", "token"])
        .sum("a")
        .map_batches(lambda b: b.rename_columns(["source", "token", "a"]),
                     batch_format="pyarrow")
    )
    tt = (
        st.groupby("token")
        .sum("a")
        .map_batches(lambda b: b.rename_columns(["token", "t"]), batch_format="pyarrow")
    )
    stot = st.groupby("source").sum("a").to_pandas()
    src_tot = dict(zip(stot["source"], stot["sum(a)"]))
    n_total = int(sum(src_tot.values()))

    joined = hash_join(st, tt, key="token")

    def g2_batch(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b)
        a = df["a"].to_numpy().astype(np.float64)
        t = df["t"].to_numpy().astype(np.float64)
        c = np.array([src_tot[s] for s in df["source"].to_list()], dtype=np.float64)
        bb = t - a
        d = n_total - c
        e1 = c * t / n_total
        e2 = d * t / n_total
        with np.errstate(divide="ignore", invalid="ignore"):
            term1 = a * np.log(a / e1)
            term2 = np.where(bb > 0, bb * np.log(np.where(bb > 0, bb, 1.0) / e2), 0.0)
        g2 = _r(2.0 * (term1 + term2), 6)
        keep = a * d > bb * c  # over-represented in this source only
        out = pl.DataFrame(
            {
                "source": df["source"],
                "token": df["token"],
                "cnt_in": df["a"],
                "cnt_out": bb.astype(np.int64),
                "g2": g2,
            }
        ).filter(pl.Series(keep))
        # per-batch partial top-k: only k survivors per source leave the batch
        return (
            out.sort(["source", "g2", "token"], descending=[False, True, False])
            .group_by("source", maintain_order=True)
            .head(k)
            .to_arrow()
        )

    partial = joined.map_batches(g2_batch, batch_format="pyarrow")

    def final_topk(g: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(g)
            .sort(["g2", "token"], descending=[True, False])
            .head(k)
            .with_row_index("rank", offset=1)
        )
        return df.with_columns(pl.col("rank").cast(pl.Int64)).select(
            ["source", "token", "cnt_in", "cnt_out", "g2", "rank"]
        ).to_arrow()

    return (
        partial.groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
        .sort(["source", "rank"])
    )


def q_dau_mau(sf_dir: str):
    """DAU/MAU stickiness per month: average daily active users over the
    month's active days, monthly actives, and their ratio — the standard
    engagement dial.  Shape: two dedupe combiners ((day,user) and
    (month,user) uniques emitted per batch, then one groupby each) so the
    shuffle moves presence bits, never raw events; the month fold is
    O(days + months) on the driver."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def days(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"ts": b.column("ts"), "user_id": b.column("user_id")}))
        return (
            df.with_columns(pl.col("ts").dt.strftime("%Y-%m-%d").alias("day"))
            .select(["day", "user_id"])
            .unique()
            .to_arrow()
        )

    du = (
        ev.map_batches(days, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .count()
        .to_pandas()[["day", "user_id"]]
    )
    dau = du.groupby("day", as_index=False).agg(dau=("user_id", "size"))
    dau["month"] = dau["day"].str.slice(0, 7)
    per_month = dau.groupby("month", as_index=False).agg(
        n_days=("day", "size"), avg_dau=("dau", "mean")
    )
    mau = (
        du.assign(month=du["day"].str.slice(0, 7))
        .groupby("month", as_index=False)
        .agg(mau=("user_id", "nunique"))
    )
    out = per_month.merge(mau, on="month")
    out["avg_dau"] = _r(out["avg_dau"], 4)
    out["stickiness"] = _r(out["avg_dau"] / out["mau"], 6)
    out["n_days"] = out["n_days"].astype("int64")
    out["mau"] = out["mau"].astype("int64")
    return out.sort_values("month").reset_index(drop=True)[
        ["month", "n_days", "avg_dau", "mau", "stickiness"]
    ]

__all__ = [
    "q_pr_curve",
    "q_hapax_ratio",
    "q_roc_auc",
    "q_ewma_daily",
    "q_leaky_bucket_replay",
    "q_edit_journeys",
    "q_sorted_neighborhood",
    "q_neyman_allocation",
    "q_kcenter_greedy",
    "q_rank_correlation",
    "q_mcnemar_gates",
    "q_trustrank",
    "q_salsa",
    "q_cocitation",
    "q_gap_stats",
    "q_simrank",
    "q_adamic_adar",
    "q_wl_refinement",
    "q_ndcg_eval",
    "q_shard_balance",
    "q_cdc_chunks",
    "q_benford_digits",
    "q_walk_corpus",
    "q_late_arrivals",
    "q_funnel_conversion",
    "q_kaplan_meier",
    "q_bipartite_check",
    "q_cuped",
    "q_hitting_time",
    "q_set_cover_greedy",
    "q_knapsack_select",
    "q_containment_pairs",
    "q_rbo_overlap",
    "q_info_gain",
    "q_triadic_closure",
    "q_rich_club",
    "q_persistent_items",
    "q_sparsify_error",
    "q_spam_mass",
    "q_event_order_pairs",
    "q_cusum_changepoints",
    "q_holt_linear",
    "q_v_measure",
    "q_ktruss_peel",
    "q_ams_f2",
    "q_mojibake_screen",
    "q_adjacent_lcp",
    "q_soft404_screen",
    "q_kruskal_wallis",
    "q_theil_sen",
    "q_page_hinkley",
    "q_dow_seasonality",
    "q_mmr_select",
    "q_event_dispersion",
    "q_sq8_error",
    "q_psi_drift",
    "q_triplet_violation",
    "q_mattr",
    "q_mase_daily",
    "q_split_leakage",
    "q_burrows_delta",
    "q_source_coverage_curve",
    "q_session_threshold_sweep",
    "q_quantile_normalize",
    "q_interarrival_burstiness",
    "q_wilson_keep_ci",
    "q_feature_hash_collisions",
    "q_srm_check",
    "q_kendall_tau",
    "q_yule_k",
    "q_brier_decomposition",
    "q_hurst_exponent",
    "q_acf_profile",
    "q_runs_test",
    "q_cramers_v",
    "q_lorenz_curve",
    "q_keyness_llr",
    "q_dau_mau",
]
