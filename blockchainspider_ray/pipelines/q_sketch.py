"""Sketch query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_hll_distinct(sf_dir: str):
    """Shuffle-free distinct-count estimates (HyperLogLog p=12,
    stages/sketch.py): each batch folds to one 4 KB register row, merged by
    elementwise max on the driver — deterministic and identical under any
    partitioning (pinned in tests/test_sketch.py vs exact counts and across
    repartitions).  The 10^10-scale replacement for exact unique() crawl
    bookkeeping."""
    from ..stages.sketch import hll_distinct

    rows = [
        ("lineitem.l_orderkey",
         hll_distinct(_read(sf_dir, "lineitem", columns=["l_orderkey"]), "l_orderkey")),
        ("events.user_id",
         hll_distinct(_read(sf_dir, "events", columns=["user_id"]), "user_id")),
        ("documents.doc_id",
         hll_distinct(_read(sf_dir, "documents", columns=["doc_id"]), "doc_id")),
    ]
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], pa.string()),
            "estimate": pa.array([_r(r[1], 2) for r in rows], pa.float64()),
        }
    )


def q_quantile_sketch_error(sf_dir: str):
    """Sketch-calibration for quantiles: the 64-bucket equi-width
    histogram median ESTIMATE (what a single-pass streaming profiler
    reports) against the EXACT rank-plucked median, with the signed
    error — quantifies what the cheap pass gives up before a pipeline
    decides it needs the two-pass exact machinery.  Histogram counts
    reduce combiner-style (64×types rows); the exact side reuses the
    grouped-median pluck; both bucket formulas are integer-identical
    to the SQL."""
    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    from ray.data.aggregate import Max as _Max, Min as _Min

    mm = ev.aggregate(_Min("value"), _Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0

    def hist(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        bkt = np.minimum(((v - lo) / span * 64).astype(np.int64), 63)
        df = pd.DataFrame({"event_type": b.column("event_type").to_pandas(), "bkt": bkt})
        g = df.groupby(["event_type", "bkt"]).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    hc = (
        ev.map_batches(hist, batch_format="pyarrow")
        .groupby(["event_type", "bkt"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values(["event_type", "bkt"])
    )
    exact = _grouped_median_pluck(ev, "event_type", "event_id", "value")
    rows = []
    for t, g in hc.groupby("event_type", sort=True):
        n = int(g["c"].sum())
        target = (n - 1) // 2
        cum = 0
        est_bkt = int(g["bkt"].iloc[-1])
        for bkt, c in zip(g["bkt"], g["c"]):
            cum += int(c)
            if cum > target:
                est_bkt = int(bkt)
                break
        est = lo + est_bkt * span / 64.0
        ex = exact[t]
        rows.append(
            (t, n, float(_r(est, 6)), float(_r(ex, 6)), float(_r(est - ex, 6)))
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n", "est_p50", "exact_p50", "err"]
    ).astype({"n": "int64"})


def q_bloom_fpr(sf_dir: str):
    """Bloom-filter false-positive-rate calibration (third sketch-
    calibration table after minhash_estimate_error / quantile_sketch_
    error): build the production BloomFilter (stages/sketch.py, the
    10^10-URL seen-set shape) over the EVEN doc_ids at several sizes,
    probe with the disjoint ODD ids, and report measured FPR next to the
    (1 - e^{-kn/m})^k prediction.  Zero false negatives is a hard
    guarantee (asserted in tests/test_sketch.py::test_bloom_fpr_
    calibration); FPR is deterministic given the md5-derived hash family.
    No SQL mirror — DuckDB can't replay the bit array — pinned by pytest
    properties instead."""
    import math

    from ..stages.sketch import BloomFilter, build_bloom

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def _parity(keep_even: bool):
        def f(b: pa.Table) -> pa.Table:
            par = pc.bit_wise_and(b.column("doc_id"), 1)
            return b.filter(pc.equal(par, 0 if keep_even else 1))

        return f

    members = docs.map_batches(_parity(True), batch_format="pyarrow")
    probes_tbl = docs.map_batches(_parity(False), batch_format="pyarrow").to_pandas()
    n_members = members.count()
    rows = []
    for m_bits in (1 << 10, 1 << 12, 1 << 14):
        f = build_bloom(members, "doc_id", m_bits=m_bits)
        hits_ref = ray.put((f.m, f.k, f.bits))

        def probe(b: pa.Table, _r0=hits_ref) -> pa.Table:
            m, k, bits = ray.get(_r0)
            bf = BloomFilter(m, k, bits=bits)
            return pa.table(
                {"hit": pa.array(np.asarray(bf.contains(b.column("doc_id")), dtype=np.int64), pa.int64())}
            )

        probed = (
            docs.map_batches(_parity(False), batch_format="pyarrow")
            .map_batches(probe, batch_format="pyarrow")
            .sum("hit")
        )
        n_probes = len(probes_tbl)
        fp = int(probed)
        pred = (1.0 - math.exp(-f.k * n_members / f.m)) ** f.k
        rows.append(
            {
                "m_bits": int(m_bits),
                "n_members": int(n_members),
                "n_probes": int(n_probes),
                "false_pos": fp,
                "fpr": float(_r(fp * 1.0 / n_probes, 6)),
                "fpr_pred": float(_r(pred, 6)),
            }
        )
    return pd.DataFrame(rows)


def q_count_min(sf_dir: str, depth: int = 4, width: int = 32):
    """Count-Min sketch (Cormode & Muthukrishnan '05) over the corpus
    token stream, audited against exact counts: build a depth=4 x
    width=32 counter grid with version-stable md5 row hashes (token ||
    ':' || row — the same md5-low-64 DuckDB's md5_number_lower computes,
    so the mirror rebuilds the sketch bit-for-bit), then report the CMS
    point estimate next to the true count for the top-20 tokens.  The
    estimate is min over rows and NEVER undercounts — the invariant the
    oracle pins.  Shape: per-batch token Counter combiner -> one vocab
    groupby; cells derive from the vocab Dataset (depth rows per term,
    groupby (r, b) sum) so the full token stream shuffles once; the 128
    finished cells broadcast back for the driver-side min."""
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

    def cells(b: pa.Table) -> pa.Table:
        tk = b.column("token").to_pylist()
        cnt = b.column("sum(c)").to_numpy()
        rs, bs, cs = [], [], []
        for r in range(depth):
            h = _hash_strings64([f"{t}:{r}" for t in tk]) % np.uint64(width)
            rs.append(np.full(len(tk), r, np.int64))
            bs.append(h.astype(np.int64))
            cs.append(cnt)
        return pa.table(
            {
                "r": pa.array(np.concatenate(rs), pa.int64()),
                "b": pa.array(np.concatenate(bs), pa.int64()),
                "c": pa.array(np.concatenate(cs), pa.int64()),
            }
        )

    grid = (
        vocab.map_batches(cells, batch_format="pyarrow")
        .groupby(["r", "b"])
        .sum("c")
        .to_pandas()
    )
    cm = {(int(x["r"]), int(x["b"])): int(x["sum(c)"]) for _, x in grid.iterrows()}
    top = (
        vocab.sort(["sum(c)", "token"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    est = [
        min(
            cm[(r, int(_hash_strings64([f"{t}:{r}"])[0] % np.uint64(width)))]
            for r in range(depth)
        )
        for t in top["token"]
    ]
    return pd.DataFrame(
        {
            "token": top["token"],
            "true_count": top["sum(c)"].astype("int64"),
            "cms_count": pd.Series(est, dtype="int64"),
        }
    ).reset_index(drop=True)


def q_hll_audit(sf_dir: str, m: int = 16):
    """HyperLogLog distinct-count audit (Flajolet et al. '07): build the
    16-register sketch of the corpus vocabulary from version-stable md5
    hashes (bucket = h % 16, rho = trailing-zeros+1 of the next 40 bits
    — exact integer bit math on both sides, no libm), report each
    register next to the raw estimate alpha_16 * m^2 / sum 2^-M_j and
    the exact distinct count.  Small-range bias correction is deliberately
    omitted so the mirror is a pure formula replay; registers build from
    the DISTINCT-token Dataset (sketch state depends only on the value
    set), i.e. one vocab groupby then a 16-group max."""
    docs = _read(sf_dir, "documents", columns=["text"])
    from ..stages.dedup import _hash_strings64

    def toks(b: pa.Table) -> pa.Table:
        vs = set()
        for t in b.column("text").to_pylist():
            vs.update(re.findall(r"\S+", t))
        return pa.table({"token": pa.array(sorted(vs), pa.string())})

    vocab = (
        docs.map_batches(toks, batch_format="pyarrow")
        .groupby("token")
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def regs(b: pa.Table) -> pa.Table:
        h = _hash_strings64(b.column("token").to_pylist())
        bucket = (h % np.uint64(m)).astype(np.int64)
        v = ((h >> np.uint64(4)) % np.uint64(1 << 40)).astype(np.int64)
        low = v & -v  # lowest set bit
        rho = np.where(v == 0, 41, np.frexp(low.astype(np.float64))[1]).astype(
            np.int64
        )
        df = (
            pd.DataFrame({"bucket": bucket, "rho": rho})
            .groupby("bucket", as_index=False)
            .max()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    reg = (
        vocab.map_batches(regs, batch_format="pyarrow")
        .groupby("bucket")
        .max("rho")
        .to_pandas()
        .rename(columns={"max(rho)": "register"})
    )
    full = pd.DataFrame({"bucket": range(m)}).merge(reg, on="bucket", how="left")
    full["register"] = full["register"].fillna(0).astype("int64")
    est = 0.673 * m * m / float(np.sum(np.power(2.0, -full["register"].to_numpy())))
    true_d = vocab.count()
    full["raw_estimate"] = float(_r(est, 4))
    full["true_distinct"] = np.int64(true_d)
    return full.astype({"bucket": "int64"})


def q_hll_groups(sf_dir: str, m: int = 16):
    """Per-group HyperLogLog distinct-user estimate (the GROUP BY
    approx_count_distinct shape — hll_audit's registers sharded by
    event_type, the form a 10^10-row engine actually runs): registers
    build from the distinct (event_type, user_id) pairs with the same
    version-stable md5 bucket/rho bit math as hll_audit, reduce through
    one (type, bucket) groupby-max, and the driver folds only the
    O(types x 16) register table into per-type raw estimates next to
    the exact distincts."""
    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    from ..stages.dedup import _hash_strings64

    def pair_unique(b: pa.Table) -> pa.Table:
        df = b.select(["event_type", "user_id"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        ev.map_batches(pair_unique, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def regs(b: pa.Table, _m=m) -> pa.Table:
        h = _hash_strings64([str(u) for u in b.column("user_id").to_pylist()])
        bucket = (h % np.uint64(_m)).astype(np.int64)
        v = ((h >> np.uint64(4)) % np.uint64(1 << 40)).astype(np.int64)
        low = v & -v
        rho = np.where(v == 0, 41, np.frexp(low.astype(np.float64))[1]).astype(
            np.int64
        )
        df = (
            pd.DataFrame(
                {
                    "event_type": b.column("event_type").to_pylist(),
                    "bucket": bucket,
                    "rho": rho,
                }
            )
            .groupby(["event_type", "bucket"], as_index=False)
            .max()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    reg = (
        pairs.map_batches(regs, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .max("rho")
        .to_pandas()
        .rename(columns={"max(rho)": "register"})
    )
    true_d = (
        pairs.groupby("event_type")
        .count()
        .to_pandas()
        .rename(columns={"count()": "d"})
        .set_index("event_type")["d"]
    )
    out = []
    for t in sorted(true_d.index):
        r = reg[reg["event_type"] == t].set_index("bucket")["register"]
        full = np.zeros(m, np.int64)
        full[r.index.to_numpy()] = r.to_numpy()
        est = 0.673 * m * m / float(np.sum(np.power(2.0, -full)))
        d = int(true_d.loc[t])
        out.append((t, float(_r(est, 4)), d, float(_r(abs(est - d) / d, 4))))
    return pd.DataFrame(
        out, columns=["event_type", "raw_estimate", "true_distinct", "rel_error"]
    )


def q_misra_gries_heavy(sf_dir: str, k: int = 40):
    """Misra-Gries heavy hitters over the token stream, two-pass: pass 1
    keeps a k-counter MG summary PER BATCH and merges them (the merged
    summary provably retains every token with true frequency > N/k, for
    ANY partitioning); pass 2 recounts the surviving candidates exactly
    and keeps only true heavy hitters — so the output is deterministic
    and partitioning-independent even though each worker's summary is
    not.  The deterministic mergeable-sketch alternative to
    q_count_min's probabilistic one.  k=40 targets the >2.5%% share
    tier (this corpus's top tokens sit near 3.5%%)."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def mg_local(b: pa.Table, _k=k) -> pa.Table:
        cnt: dict = {}
        for t in b.column("text").to_pylist():
            for w in _oracle_tokens(t):
                if w in cnt:
                    cnt[w] += 1
                elif len(cnt) < _k - 1:
                    cnt[w] = 1
                else:  # decrement-all step
                    dead = []
                    for key in cnt:
                        cnt[key] -= 1
                        if cnt[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del cnt[key]
        ks = sorted(cnt)
        return pa.table(
            {
                "token": pa.array(ks, pa.string()),
                "c": pa.array([cnt[x] for x in ks], pa.int64()),
            }
        )

    # merge MG summaries: sum weights, then subtract the (k-th largest)
    # weight from all and drop non-positives (Agarwal et al. 2013 merge)
    merged = (
        docs.map_batches(mg_local, batch_format="pyarrow")
        .groupby("token")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["c", "token"], ascending=[False, True])
        .reset_index(drop=True)
    )
    if len(merged) >= k:
        merged["c"] = merged["c"] - int(merged["c"].iloc[k - 1])
    cands = frozenset(merged.loc[merged["c"] > 0, "token"])
    cand_ref = ray.put(cands)

    def recount(b: pa.Table) -> pa.Table:
        from collections import Counter

        cs = ray.get(cand_ref)
        cnt: Counter = Counter()
        n = 0
        for t in b.column("text").to_pylist():
            for w in _oracle_tokens(t):
                n += 1
                if w in cs:
                    cnt[w] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "token": pa.array(ks + ["\x00total"], pa.string()),
                "c": pa.array([cnt[x] for x in ks] + [n], pa.int64()),
            }
        )

    exact = (
        docs.map_batches(recount, batch_format="pyarrow")
        .groupby("token")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    n_total = int(exact.loc[exact["token"] == "\x00total", "c"].iloc[0])
    out = exact[exact["token"] != "\x00total"].copy()
    out = out[out["c"] * k > n_total]  # true heavy hitters: freq > N/k
    out["share"] = _r(out["c"].to_numpy() * 1.0 / n_total, 6)
    out = out.sort_values("token").reset_index(drop=True)
    return pd.DataFrame(
        {
            "token": out["token"],
            "cnt": out["c"].astype("int64"),
            "share": out["share"].astype(float),
        }
    )


def q_kmv_sketch(sf_dir: str, k: int = 16):
    """KMV (k-minimum-values / bottom-k) distinct-token sketch vs the exact
    vocabulary count (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07
    unbiased estimator (k-1)/h_(k)) — the mergeable cardinality sketch
    whose fixed-k union also powers set-intersection estimates, next to
    q_hll_distinct's register-based one.  Shape: one tokenize pass feeds a
    (token) combiner groupby; the exact count is the group count, and each
    downstream batch contributes only its k=16 smallest md5-low64 hashes
    (md5 == DuckDB md5_number_lower bit-for-bit), so the driver merges
    <= k rows per block and takes the global bottom-k."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["text"])

    def tok_part(b: pa.Table) -> pa.Table:
        toks: set = set()
        for t in b.column("text").to_pylist():
            toks.update(_oracle_tokens(t))
        return pa.table({"token": pa.array(sorted(toks), pa.string())})

    vocab = docs.map_batches(tok_part, batch_format="pyarrow").groupby("token").count()
    n_exact = int(vocab.count())

    def bottomk(b: pa.Table) -> pa.Table:
        hs = sorted({_stable_h64(t) for t in b.column("token").to_pylist()})[:k]
        return pa.table({"h": pa.array(hs, pa.uint64())})

    cand = vocab.map_batches(bottomk, batch_format="pyarrow").to_pandas()
    hs = sorted({int(h) for h in cand["h"]})[:k]
    if len(hs) < k:
        est = float(len(hs))
    else:
        est = (k - 1) * 18446744073709551616.0 / float(hs[-1])
    rel = abs(est - n_exact) / n_exact if n_exact else np.nan
    return pd.DataFrame(
        {
            "k": [k],
            "n_distinct": [n_exact],
            "kmv_estimate": [float(_r(est, 6))],
            "rel_error": [float(_r(rel, 6))],
        }
    )


def q_kmv_intersection(sf_dir: str, k: int = 16):
    """KMV set-intersection estimate (Beyer et al. SIGMOD'07) between the
    view-user and purchase-user sets: merge the two bottom-k md5 sketches,
    take the bottom-k of the union, estimate |A u B| from its k-th value,
    Jaccard from the fraction of union-sketch members present in BOTH
    side sketches, and |A n B| = jaccard * union — the sketch algebra
    that answers overlap questions without co-shuffling the sets, audited
    against the exact intersection.  Shape: per-side (user) dedupe
    combiners; only two k-row sketches and one exact distinct count reach
    the driver."""
    from ..stages.dedup import _stable_h64

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def users_of(t: str):
        return (
            ev.filter(lambda r, _t=t: r["event_type"] == _t)
            .groupby("user_id")
            .count()
            .select_columns(["user_id"])
        )

    def bottomk(b: pa.Table) -> pa.Table:
        hs = sorted({_stable_h64(str(int(u))) for u in b.column("user_id").to_pylist()})[:k]
        return pa.table({"h": pa.array(hs, pa.uint64())})

    sk = {}
    for t in ("view", "purchase"):
        cand = (
            users_of(t).map_batches(bottomk, batch_format="pyarrow").to_pandas()
        )
        sk[t] = sorted({int(h) for h in cand["h"]})[:k]
    sa, sb = set(sk["view"]), set(sk["purchase"])
    u = sorted(sa | sb)[:k]
    if len(u) == k:
        union_est = (k - 1) * 18446744073709551616.0 / float(u[-1])
    else:
        union_est = float(len(u))
    inter_k = sum(1 for h in u if h in sa and h in sb)
    jacc = inter_k / len(u) if u else float("nan")
    inter_est = jacc * union_est
    # exact intersection: users present in both types (distributed dedupe)
    def pres(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"].isin(("view", "purchase"))].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    both = (
        ev.map_batches(pres, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .count()
        .groupby("user_id")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "hit": pa.array(
                        (b.column("count()").to_numpy() == 2).astype(np.int64)
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("hit")
    )
    exact = int(both)
    rel = abs(inter_est - exact) / exact if exact else float("nan")
    return pd.DataFrame(
        {
            "k": pd.array([k], dtype="int64"),
            "exact_inter": pd.array([exact], dtype="int64"),
            "jaccard_est": [float(_r(jacc, 6))],
            "inter_est": [float(_r(inter_est, 6))],
            "rel_error": [float(_r(rel, 6)) if rel == rel else float("nan")],
        }
    )


def q_bloom_planner(sf_dir: str):
    """Bloom-filter sizing table for the distinct user-id set at target
    false-positive rates 1%, 0.1%, 0.01%: optimal bits m = -n ln p /
    (ln 2)^2, hash count k = (m/n) ln 2 (both reported raw and as the
    practical ceil), plus bits per element — the planning math behind
    q_bloom_fpr's empirical audit, driven by the EXACT distributed
    distinct count.  Shape: one distinct-key combiner count; the O(3)
    table is closed-form."""
    ev = _read(sf_dir, "events", columns=["user_id"])
    n = int(ev.groupby("user_id").count().count())
    rows = []
    ln2 = float(np.log(2.0))
    for p in (0.01, 0.001, 0.0001):
        m = -n * float(np.log(p)) / (ln2 * ln2)
        kk = m / n * ln2
        rows.append(
            (
                p,
                n,
                int(np.ceil(m)),
                float(_r(m / n, 6)),
                int(np.ceil(kk)),
            )
        )
    return pd.DataFrame(
        rows, columns=["fpr", "n_keys", "m_bits", "bits_per_key", "k_hashes"]
    ).astype({"n_keys": "int64", "m_bits": "int64", "k_hashes": "int64"})

__all__ = [
    "q_hll_distinct",
    "q_quantile_sketch_error",
    "q_bloom_fpr",
    "q_count_min",
    "q_hll_audit",
    "q_hll_groups",
    "q_misra_gries_heavy",
    "q_kmv_sketch",
    "q_kmv_intersection",
    "q_bloom_planner",
]
