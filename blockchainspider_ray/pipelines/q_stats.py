"""Stats query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_outflow_sum(sf_dir: str):
    """sum(value) over out-edges per node — the Haircut weight denominator
    (reference strategies/txs/haricut.py:15-23)."""
    agg = _events_edges(sf_dir).groupby("src").aggregate(Sum("weight", alias_name="out_sum"))
    return agg.map_batches(lambda b: _round_col(b, "out_sum", 2), batch_format="pyarrow").sort("src")


def q_self_repetition(sf_dir: str, n: int = 3):
    """Within-doc self-repetition (the intra-document half of Gopher's
    repetition rules): fraction of a doc's 3-gram positions whose gram
    already occurred earlier in the SAME doc — 1 - distinct/total.  Pure
    per-row map, no shuffle."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rep(b: pa.Table) -> pa.Table:
        ids, fracs, tots = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = re.findall(r"\S+", t)
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if not grams:
                continue
            ids.append(d)
            tots.append(len(grams))
            fracs.append(1.0 - len(set(grams)) / len(grams))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(tots, pa.int64()),
                "rep_frac": pa.array(_r(fracs, 6), pa.float64()),
            }
        )

    return docs.map_batches(rep, batch_format="pyarrow").sort("doc_id")


def q_unigram_logprob(sf_dir: str):
    """In-corpus unigram LM score per doc — the perplexity-bucketing
    stand-in (CCNet-style quality signal) with an honest corpus-fitted LM
    instead of an unavailable pretrained one.  Pass 1 reduces the corpus
    to the token-count table + total (vocab-sized broadcast), pass 2 is a
    pure map: mean over token positions of ln(count(token)/total)."""
    import math

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

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

    tab = docs.map_batches(vc, batch_format="pyarrow").groupby("token").sum("c").to_pandas()
    cnts = dict(zip(tab["token"], tab["sum(c)"].astype(int)))
    total = int(tab["sum(c)"].sum())
    ref = ray.put(cnts)

    def score(b: pa.Table) -> pa.Table:
        cm = ray.get(ref)
        ids, lps = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            lp = sum(math.log(cm[w] / total) for w in toks) / len(toks)
            ids.append(d)
            lps.append(lp)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "logprob": pa.array(_r(lps, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_binary_meta(sf_dir: str):
    """Multimodal plumbing over an opaque binary column: byte length, md5
    digest, 256-byte chunk count — payload dropped as soon as metadata is
    derived (stages/multimodal.py scale rule)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_binary(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "payload": pa.array(
                    [t.encode("utf-8") for t in b.column("text").to_pylist()], pa.binary()
                ),
            }
        )

    def meta(b: pa.Table) -> pa.Table:
        payloads = [bytes(p) for p in b.column("payload").to_pylist()]
        n_bytes = [len(p) for p in payloads]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "digest": pa.array([hashlib.md5(p).hexdigest() for p in payloads], pa.string()),
                "n_chunks": pa.array([(n + 255) // 256 for n in n_bytes], pa.int64()),
            }
        )

    return (
        ds.map_batches(to_binary, batch_format="pyarrow", batch_size=256)
        .map_batches(meta, batch_format="pyarrow", batch_size=256)
        .sort("doc_id")
    )


def q_enrich_3way(sf_dir: str):
    """Dimension-chain broadcast enrichment: lineitem -> supplier -> nation
    -> region, revenue per region (the token-property enrichment pattern,
    reference token.py:322-342: small sides ship once, fact side streams)."""
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    r2name = dict(zip(reg["r_regionkey"], reg["r_name"]))
    # pre-collapse the chain driver-side (dims are tiny) into a dense
    # suppkey -> region-CODE array; the probe + partial aggregation are
    # then two np.bincounts per batch (combiner pattern — the shuffle
    # moves n_batches x n_regions rows, never the lineitem fact rows)
    supp_keys = supp["s_suppkey"].to_numpy().astype(np.int64)
    name_series = pd.Series([r2name[n2r[int(n)]] for n in supp["s_nationkey"]])
    codes_s, labels_s = pd.factorize(name_series, sort=True)
    dense = np.full((int(supp_keys.max()) + 1) if len(supp_keys) else 1, -1, dtype=np.int32)
    dense[supp_keys] = codes_s.astype(np.int32)
    ref = ray.put((dense, np.asarray(list(labels_s), dtype=object)))

    def enrich(b: pa.Table, _ref=ref) -> pa.Table:
        # plain task + plasma-shared lookup (no actor-pool startup cost)
        dense, labels = ray.get(_ref)
        keys = b.column("l_suppkey").to_numpy().astype(np.int64)
        prices = b.column("l_extendedprice").to_numpy()
        safe = np.clip(keys, 0, len(dense) - 1)
        codes = np.where((keys >= 0) & (keys < len(dense)), dense[safe], -1)
        sums = np.bincount(
            np.maximum(codes, 0), weights=np.where(codes >= 0, prices, 0.0),
            minlength=len(labels),
        )
        counts = np.bincount(
            np.maximum(codes, 0), weights=(codes >= 0).astype(np.float64),
            minlength=len(labels),
        )
        present = counts > 0
        return pa.table(
            {
                "region": pa.array(labels[np.flatnonzero(present)], pa.string()),
                "rev_part": pa.array(sums[present], pa.float64()),
                "cnt_part": pa.array(counts[present].astype(np.int64), pa.int64()),
            }
        )

    partials = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice"]).map_batches(
        enrich, batch_format="pyarrow"
    )
    agg = partials.groupby("region").aggregate(
        Sum("rev_part", alias_name="revenue"), Sum("cnt_part", alias_name="n_items")
    )
    return agg.map_batches(lambda b: _round_col(b, "revenue", 2), batch_format="pyarrow").sort(
        "region"
    )


def q_image_decode(sf_dir: str):
    """Multimodal decode plumbing: synthetic FAKEIMG payloads (binary col)
    -> width/height/channels/mean_luma via the actor-pool decode stage
    (stages/multimodal.py, codec='fake'; real codecs stay stubbed)."""
    from ..stages.multimodal import DecodeImageStage, make_fake_image

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "image": pa.array(
                    [make_fake_image(8 + int(d) % 8, 6 + int(d) % 5, 3, seed=int(d)) for d in ids],
                    pa.binary(),
                ),
            }
        )

    return (
        docs.map_batches(synth, batch_format="pyarrow", batch_size=128)
        .map_batches(
            DecodeImageStage,
            batch_format="pyarrow",
            batch_size=128,
            concurrency=2,
            fn_constructor_kwargs={"codec": "fake"},
        )
        .sort("doc_id")
    )


def q_audio_decode(sf_dir: str):
    """Audio decode plumbing: synthetic FAKEAUD PCM payloads (binary col)
    -> sample_rate/n_samples/duration_s via the actor-pool decode stage
    (stages/multimodal.py DecodeAudioStage, codec='fake').  The rng PCM
    body (rms) is pinned in pytest; the header-derived columns are exact
    functions of doc_id, so this query runs under the full SQL oracle."""
    from ..stages.multimodal import DecodeAudioStage, make_fake_audio

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "audio": pa.array(
                    [
                        make_fake_audio(
                            8000 + (int(d) % 3) * 4000, 500 + int(d) % 100, seed=int(d)
                        )
                        for d in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    return (
        docs.map_batches(synth, batch_format="pyarrow", batch_size=128)
        .map_batches(
            DecodeAudioStage,
            batch_format="pyarrow",
            batch_size=128,
            concurrency=2,
            fn_constructor_kwargs={"codec": "fake"},
        )
        .select_columns(["doc_id", "sample_rate", "n_samples", "duration_s"])
        .sort("doc_id")
    )


def q_image_resize(sf_dir: str):
    """Resize step of an image pipeline: FAKEIMG payload -> 4x4
    nearest-neighbor re-encoded payload (ResizeImageStage) -> decode.
    Output dims are pinned; mean_luma of the resized image is pytest
    territory (rng pixels)."""
    from ..stages.multimodal import (
        DecodeImageStage,
        ResizeImageStage,
        make_fake_image,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "image": pa.array(
                    [
                        make_fake_image(8 + int(d) % 8, 6 + int(d) % 5, 3, seed=int(d))
                        for d in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    return (
        docs.map_batches(synth, batch_format="pyarrow", batch_size=128)
        .map_batches(
            ResizeImageStage,
            batch_format="pyarrow",
            batch_size=128,
            concurrency=2,
            fn_constructor_kwargs={"codec": "fake", "out_w": 4, "out_h": 4},
        )
        # decode as stateless tasks: chaining a second actor pool doubles
        # the pool footprint for no state benefit
        .map_batches(
            DecodeImageStage(codec="fake"), batch_format="pyarrow", batch_size=128
        )
        .sort("doc_id")
    )


def q_postings_build(sf_dir: str):
    """Inverted-index build — the search-side batch job over crawled
    text: per term, document frequency, total term frequency, and the K
    lowest doc_ids as a bounded posting sample.  Scale shape mirrors
    anchor_agg: df/tf fold from scalar (term, doc, tf) combiner rows, and
    the posting sample keeps only the local bottom-K per batch before the
    shuffle, so a stopword's merge group holds <= K rows per upstream
    block — never the full corpus-sized posting list.  The full list the
    fixture could afford is deliberately NOT offered (same no-unbounded-
    group rule as the LSH bucket cap)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def emit(b: pa.Table) -> pa.Table:
        from collections import Counter

        ts, ds, cs = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            for term, c in Counter(re.findall(r"\S+", t or "")).items():
                ts.append(term)
                ds.append(d)
                cs.append(c)
        return pa.table(
            {
                "term": pa.array(ts, pa.string()),
                "doc_id": pa.array(ds, pa.int64()),
                "tf": pa.array(cs, pa.int64()),
            }
        )

    p = docs.map_batches(emit, batch_format="pyarrow")
    counts = p.groupby("term").aggregate(
        Count(alias_name="df"), Sum("tf", alias_name="tf_total")
    )

    def local_bottomk(b: pa.Table) -> pa.Table:
        buf: dict = {}
        for t, d in zip(b.column("term").to_pylist(), b.column("doc_id").to_pylist()):
            buf.setdefault(t, []).append(d)
        ts, ds = [], []
        for t, dl in buf.items():
            for d in sorted(dl)[:POSTINGS_SAMPLE_K]:
                ts.append(t)
                ds.append(d)
        return pa.table(
            {"term": pa.array(ts, pa.string()), "doc_id": pa.array(ds, pa.int64())}
        )

    def merge_bottomk(g: pa.Table) -> pa.Table:
        bottom = sorted(g.column("doc_id").to_pylist())[:POSTINGS_SAMPLE_K]
        return pa.table(
            {
                "term": pa.array([g.column("term")[0].as_py()], pa.string()),
                "postings_sample": pa.array(
                    ["|".join(str(d) for d in bottom)], pa.string()
                ),
            }
        )

    sample = (
        p.map_batches(local_bottomk, batch_format="pyarrow")
        .groupby("term")
        .map_groups(merge_bottomk, batch_format="pyarrow")
    )

    def pad_counts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": b.column("term"),
                "df": b.column("df").cast(pa.int64()),
                "tf_total": b.column("tf_total").cast(pa.int64()),
                "postings_sample": pa.array([None] * b.num_rows, pa.string()),
            }
        )

    def pad_sample(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": b.column("term"),
                "df": pa.array([None] * b.num_rows, pa.int64()),
                "tf_total": pa.array([None] * b.num_rows, pa.int64()),
                "postings_sample": b.column("postings_sample"),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "term": pa.array([g.column("term")[0].as_py()], pa.string()),
                "df": pa.array([pc.max(g.column("df")).as_py()], pa.int64()),
                "tf_total": pa.array([pc.max(g.column("tf_total")).as_py()], pa.int64()),
                "postings_sample": pa.array(
                    [pc.max(g.column("postings_sample")).as_py()], pa.string()
                ),
            }
        )

    return (
        counts.map_batches(pad_counts, batch_format="pyarrow")
        .union(sample.map_batches(pad_sample, batch_format="pyarrow"))
        .groupby("term")
        .map_groups(fold, batch_format="pyarrow")
        .sort("term")
    )


def q_latest_event(sf_dir: str):
    """Keep-latest-per-key dedup (the recrawl "newest snapshot wins" rule
    over a multi-capture log): one row per user — the max-(ts, event_id)
    event.  Combiner shape again: per batch reduce to one candidate row per
    user present, then one small ``groupby('user_id')`` finalize; the
    shuffle carries at most users-per-batch rows.  ts is emitted as epoch
    micros so both sides hash identical int64s."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"])

    def _latest(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        kept = df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id").tail(1)
        return pa.Table.from_pandas(kept, preserve_index=False).cast(t.schema)

    out = (
        ev.map_batches(_latest, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(_latest, batch_format="pyarrow")
    )

    def _proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
                "value": pc.round(pc.cast(t.column("value"), pa.float64()), 2),
            }
        )

    return out.map_batches(_proj, batch_format="pyarrow").sort("user_id")


def q_zlib_ratio(sf_dir: str):
    """Compression-ratio quality signal (CCNet/Gopher-adjacent): highly
    repetitive or template text compresses far below organic prose, so
    deflate-ratio is a cheap spam prior.  zlib level 6 is deterministic
    for a given zlib build, but NOT SQL-expressible — rows-only driver
    check; exact values + the repetitive-text-compresses-more invariant
    are pinned in tests/test_curation.py."""
    import zlib

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ratio(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column("text").to_pylist():
            raw = t.encode("utf-8")
            out.append(
                float(_r(len(zlib.compress(raw, 6)) / max(1, len(raw)), 4))
            )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "zlib_ratio": pa.array(out, pa.float64()),
            }
        )

    return docs.map_batches(ratio, batch_format="pyarrow").sort("doc_id")


def q_hist_quantiles(sf_dir: str, bins: int = 32):
    """Mergeable histogram-sketch quantiles over n_chars — the 100-TB-scale
    complement of token_quantiles' exact path: pass 1 reduces to (min, max,
    count), pass 2 to ``bins`` equi-width bin counts (a per-batch
    np.bincount combiner, so the groupby moves O(bins * batches) rows and
    merging partitions is addition — partition-independent by
    construction), then each quantile is linear interpolation inside its
    bin.  Every arithmetic step (width, bucket floor, interpolation) is
    ordered identically in the SQL mirror, so the doubles match exactly."""
    docs = _read(sf_dir, "documents", columns=["n_chars"])

    stats = docs.aggregate(Min("n_chars"), Max("n_chars"), Count())
    mn, mx, n = stats["min(n_chars)"], stats["max(n_chars)"], stats["count()"]
    width = (mx - mn) / float(bins)

    def binc(b: pa.Table) -> pa.Table:
        x = b.column("n_chars").to_numpy()
        idx = np.minimum(np.floor((x - mn) / width).astype(np.int64), bins - 1)
        counts = np.bincount(idx, minlength=bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "c": pa.array(counts[nz], pa.int64()),
            }
        )

    hist = (
        docs.map_batches(binc, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    cum = hist["c"].cumsum()
    out_q, out_est = [], []
    for q in (0.25, 0.5, 0.75, 0.9, 0.99):
        target = q * n
        i = int(np.searchsorted(cum.to_numpy(), target, side="left"))
        cum_prev = float(cum.iloc[i - 1]) if i > 0 else 0.0
        b = float(hist["bin"].iloc[i])
        c = float(hist["c"].iloc[i])
        out_q.append(q)
        out_est.append(_r(mn + width * (b + (target - cum_prev) / c), 4))
    return pd.DataFrame({"q": out_q, "est": out_est})


def q_running_total(sf_dir: str, n_buckets: int = 64):
    """Distributed prefix scan — running total of event value in (ts,
    event_id) order, the SUM() OVER (ORDER BY ...) window Ray Data has no
    operator for.  Two-phase scan: rows bucket by ts range (same-ts rows
    can never split across buckets, so bucket-local order concatenates to
    the global order), pass 1 reduces per-bucket sums so the driver holds
    only n_buckets offsets, pass 2 finishes the cumsum inside each bucket
    group.  Values are scanned as integer CENTS (round-half-away of
    value*100, = the SQL mirror's CAST(round(value*100) AS BIGINT)) so the
    accumulation is associative and exact — a float cumsum's answer would
    depend on partition boundaries."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "value"])

    lohi = ev.aggregate(Min("ts"), Max("ts"))
    lo = int(np.datetime64(lohi["min(ts)"], "us").astype(np.int64))
    hi = int(np.datetime64(lohi["max(ts)"], "us").astype(np.int64))
    w = (hi - lo + 1) // n_buckets + 1

    def prep(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = _r(b.column("value").to_numpy() * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "ts_us": pa.array(ts, pa.int64()),
                "bkt": pa.array((ts - lo) // w, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    rows = ev.map_batches(prep, batch_format="pyarrow").materialize()
    bs = (
        rows.groupby("bkt")
        .sum("cents")
        .to_pandas()
        .sort_values("bkt")
        .reset_index(drop=True)
    )
    offsets = dict(
        zip(
            bs["bkt"].astype("int64"),
            bs["sum(cents)"].cumsum().shift(1, fill_value=0).astype("int64"),
        )
    )
    off_ref = ray.put(offsets)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        run = int(off[int(df["bkt"].iloc[0])]) + df["cents"].cumsum()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "running": _r(run.to_numpy() / 100.0, 2),
            }
        )

    return rows.groupby("bkt").map_groups(scan, batch_format="pandas").sort("event_id")


def q_span_merge(sf_dir: str):
    """Interval coalescing (gaps-and-islands) — merging overlapping or
    touching [start, end) spans per document, the primitive behind
    redaction-span merging, WARC byte-range compaction and dedup-span
    removal.  Spans are synthesized deterministically from doc_id on both
    sides (3-5 per doc, colliding starts); each doc's spans colocate, so
    the merge is a pure per-row map — no shuffle.  The SQL mirror is the
    classic windowed form: island starts where start > max(end) over all
    preceding spans."""
    from ..functions.etl import merge_intervals

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def merge(b: pa.Table) -> pa.Table:
        out_id, out_ns, out_nm, out_cov = [], [], [], []
        for d in b.column("doc_id").to_pylist():
            spans = []
            for j in range(3 + d % 3):
                s = (d * 7 + j * 37) % 120
                spans.append((s, s + 15 + (j * 11) % 20))
            islands = merge_intervals(spans)
            out_id.append(d)
            out_ns.append(len(spans))
            out_nm.append(len(islands))
            out_cov.append(sum(e - s for s, e in islands))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_spans": pa.array(out_ns, pa.int64()),
                "n_merged": pa.array(out_nm, pa.int64()),
                "covered": pa.array(out_cov, pa.int64()),
            }
        )

    return docs.map_batches(merge, batch_format="pyarrow").sort("doc_id")


def q_funnel_steps(sf_dir: str):
    """Ordered multi-step funnel (view -> click -> purchase with strictly
    increasing timestamps per user) — the sequential-pattern aggregate
    sessionize doesn't cover.  Predicate-pushed read of the three step
    types, one groupby(user_id) shuffle, per-group vectorized first-
    completion scan; timestamps surface as epoch micros (-1 = step not
    reached) so the value hash is null-free and tz-stable."""
    steps_set = pa.array(["view", "click", "purchase"])
    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"]).map_batches(
        lambda b: b.filter(pc.is_in(b.column("event_type"), value_set=steps_set)),
        batch_format="pyarrow",
    )

    def fun(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]").astype("int64")
        et = df["event_type"]
        uid = int(df["user_id"].iloc[0])

        def first_after(kind: str, after: int) -> int:
            m = ts[(et == kind) & (ts > after)]
            return int(m.min()) if len(m) else -1

        t1 = first_after("view", -(2**62))
        t2 = first_after("click", t1) if t1 >= 0 else -1
        t3 = first_after("purchase", t2) if t2 >= 0 else -1
        steps = (t1 >= 0) + (t2 >= 0) + (t3 >= 0)
        return pd.DataFrame(
            {
                "user_id": [uid],
                "steps": np.array([steps], dtype="int64"),
                "t_view_us": np.array([t1], dtype="int64"),
                "t_click_us": np.array([t2], dtype="int64"),
                "t_purchase_us": np.array([t3], dtype="int64"),
            }
        )

    return (
        ev.groupby("user_id").map_groups(fun, batch_format="pandas").sort("user_id")
    )


def q_heavy_hitters(sf_dir: str, phi: float = 0.02):
    """Exact heavy hitters via the two-pass candidate/verify scheme
    (Misra-Gries / SpaceSaving candidate generation + exact count pass):
    every token whose corpus frequency is >= phi of all token positions,
    with its EXACT count.  Pass 1 reduces each batch to (a) its local
    candidates — tokens with batch count >= batch_len/k where k = 2/phi,
    a superset of the global heavy hitters by weighted pigeonhole (if
    sum c_i >= phi * sum m_i then some batch has c_i >= phi * m_i >=
    m_i/k) — and (b) one batch-total row; only candidates + totals
    shuffle, never the token stream.  Pass 2 counts ONLY the broadcast
    candidate set exactly (combiner shape) and filters at the exact
    threshold, so the output is deterministic and oracle-checkable
    despite the sketchy first pass.  At 10^10 docs the candidate set is
    <= k per batch and the exact pass is a broadcast semi-join."""
    from collections import Counter

    docs = _read(sf_dir, "documents", columns=["text"])
    k = int(np.ceil(2.0 / phi))

    def candidates(b: pa.Table) -> pa.Table:
        cnt = Counter()
        for t in b.column("text").to_pylist():
            cnt.update(_oracle_tokens(t))
        m = sum(cnt.values())
        toks = [w for w, c in cnt.items() if c * k >= m]
        return pa.table(
            {
                "token": pa.array(toks + [""], pa.string()),
                "n": pa.array([0] * len(toks) + [m], pa.int64()),
                "is_total": pa.array([0] * len(toks) + [1], pa.int64()),
            }
        )

    p1 = docs.map_batches(candidates, batch_format="pyarrow").materialize()
    total = sum(
        r["n"] for r in p1.filter(lambda r: r["is_total"] == 1).take_all()
    )
    cand = set(
        r["token"]
        for r in p1.filter(lambda r: r["is_total"] == 0).select_columns(["token"]).take_all()
    )
    threshold = int(np.ceil(phi * total))
    cand_ref = ray.put(cand)

    def exact(b: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref) if isinstance(cand_ref, ray.ObjectRef) else cand_ref
        cnt = Counter()
        for t in b.column("text").to_pylist():
            cnt.update(w for w in _oracle_tokens(t) if w in cs)
        return pa.table(
            {
                "token": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    agg = docs.map_batches(exact, batch_format="pyarrow").groupby("token").sum("c")

    def finish(b: pa.Table) -> pa.Table:
        b = b.rename_columns(["token", "cnt"])
        return b.filter(pc.greater_equal(b.column("cnt"), threshold))

    return (
        agg.map_batches(finish, batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
    )


def q_nb_classify(sf_dir: str):
    """Multinomial Naive Bayes language classifier, trained and scored
    distributed (the CCNet/fastText-style quality/language filter shape):
    per-(lang, token) counts reduce combiner-style to a dim-sized model
    table, the driver assembles log-prob matrices once (V x C doubles),
    broadcasts them via ray.put, and scoring is one vectorized
    counts @ log P(w|c) matmul per batch.  Laplace(+1) smoothing over the
    corpus vocabulary; prediction ties break on lang name.  The model is
    the only thing that moves twice; the corpus streams once per pass."""
    from collections import Counter

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partials(b: pa.Table) -> pa.Table:
        cnt = Counter()
        for lang, t in zip(b.column("lang").to_pylist(), b.column("text").to_pylist()):
            for w in _oracle_tokens(t):
                cnt[(lang, w)] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "token": pa.array([k[1] for k in keys], pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    tok_counts = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .sum("c")
    ).to_pandas()
    tok_counts.columns = ["lang", "token", "c"]
    # class priors: one tiny count groupby over the lang column only
    dc = _read(sf_dir, "documents", columns=["lang"]).groupby("lang").count().to_pandas()
    doc_counts = dc.set_index("lang").iloc[:, 0].sort_index()
    classes = list(doc_counts.index)
    vocab = sorted(tok_counts["token"].unique())
    v_of = {w: i for i, w in enumerate(vocab)}
    c_of = {c: j for j, c in enumerate(classes)}
    V, C = len(vocab), len(classes)
    cnt_m = np.zeros((V, C), np.float64)
    cnt_m[
        tok_counts["token"].map(v_of).to_numpy(),
        tok_counts["lang"].map(c_of).to_numpy(),
    ] = tok_counts["c"].to_numpy()
    tot_c = cnt_m.sum(axis=0)
    logp = np.log((cnt_m + 1.0) / (tot_c + V))
    prior = np.log(doc_counts.to_numpy() / doc_counts.sum())
    model_ref = ray.put((v_of, classes, logp, prior))

    def score(b: pa.Table) -> pa.Table:
        v_of_, classes_, logp_, prior_ = ray.get(model_ref)
        ids = b.column("doc_id").to_numpy()
        preds, scores = [], []
        for t in b.column("text").to_pylist():
            cnt = Counter(_oracle_tokens(t))
            idx = np.fromiter((v_of_[w] for w in cnt), np.int64, len(cnt))
            n = np.fromiter(cnt.values(), np.float64, len(cnt))
            s = prior_ + n @ logp_[idx]
            # argmax with lang-name tie-break (matches row_number ORDER BY
            # s DESC, lang): classes_ is sorted, argmax takes the first max
            j = int(np.argmax(s))
            preds.append(classes_[j])
            scores.append(s[j])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pred_lang": pa.array(preds, pa.string()),
                "score": pa.array(_r(scores, 4), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_event_interarrival(sf_dir: str):
    """Per-user inter-arrival statistics (lag-window shape): sort each
    user's events by (ts, event_id), diff consecutive timestamps, report
    event count plus max/mean gap.  Gaps are integer microseconds so max
    is exact; the mean rounds at 2dp.  groupby(user).map_groups — a
    user's events co-locate by the shuffle, the window never spans
    groups (at web scale: sessions/users are the natural partition key
    and skewed users salt like q_salted_host_agg)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def gaps_of_user(group: pa.Table) -> pa.Table:
        g = group.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        uid = int(g.column("user_id")[0].as_py())
        ts = g.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(ts)
        if n < 2:
            return pa.table(
                {
                    "user_id": pa.array([uid], pa.int64()),
                    "n_events": pa.array([n], pa.int64()),
                    "max_gap_us": pa.array([None], pa.int64()),
                    "mean_gap_us": pa.array([None], pa.float64()),
                }
            )
        d = np.diff(ts)
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "max_gap_us": pa.array([int(d.max())], pa.int64()),
                "mean_gap_us": pa.array([float(_r(d.sum() / len(d), 2))], pa.float64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(gaps_of_user, batch_format="pyarrow")
        .sort("user_id")
    )


def q_link_reciprocity(sf_dir: str):
    """Per-node link reciprocity over the events-derived directed graph:
    among a node's distinct out-edges, the fraction whose reverse edge
    exists.  Join-free formulation: each distinct edge maps to its
    unordered pair key plus a direction flag; one groupby over the pair
    key decides reciprocation locally inside the group (both directions
    of a pair co-locate by construction), then a per-src rollup.  The
    shuffle moves one row per distinct edge — never the event stream —
    and needs no self-join."""
    edges = _events_edges(sf_dir).groupby(["src", "dst"]).count()

    def pair_rows(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "src": pa.array(s, pa.int64()),
                "fwd": pa.array((s <= d).astype(np.int64), pa.int64()),
            }
        )

    pairs = edges.map_batches(pair_rows, batch_format="pyarrow")

    def judge(group: pa.Table) -> pa.Table:
        src = group.column("src").to_numpy()
        fwd = group.column("fwd").to_numpy()
        lo = int(group.column("lo")[0].as_py())
        hi = int(group.column("hi")[0].as_py())
        # self-loop reciprocates itself; otherwise need both directions
        recip = 1 if (lo == hi or (fwd.min() == 0 and fwd.max() == 1)) else 0
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "recip": pa.array(np.full(len(src), recip, np.int64), pa.int64()),
            }
        )

    per_edge = pairs.groupby(["lo", "hi"]).map_groups(judge, batch_format="pyarrow")
    agg = per_edge.groupby("src").aggregate(
        Count(alias_name="n_out"), Sum("recip", alias_name="n_recip")
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_out").to_numpy()
        r = b.column("n_recip").to_numpy()
        return pa.table(
            {
                "node": b.column("src"),
                "n_out": b.column("n_out"),
                "n_recip": b.column("n_recip"),
                "reciprocity": pa.array(_r(r / n, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("node")


def q_length_zscore(sf_dir: str):
    """Per-group standardization (the per-language length normalization a
    mixing pipeline applies before thresholding): z-score of n_chars
    within each lang.  Two passes: a dim-sized groupby for (mean, sample
    stddev) per lang, broadcast into a vectorized map — the corpus never
    shuffles."""
    from ray.data.aggregate import Std

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    stats = (
        docs.groupby("lang")
        .aggregate(Mean("n_chars", alias_name="mu"), Std("n_chars", ddof=1, alias_name="sd"))
        .to_pandas()
    )
    mu_of = dict(zip(stats["lang"], stats["mu"]))
    sd_of = dict(zip(stats["lang"], stats["sd"]))
    stats_ref = ray.put((mu_of, sd_of))

    def z(b: pa.Table) -> pa.Table:
        mu_, sd_ = ray.get(stats_ref)
        langs = b.column("lang").to_pylist()
        x = b.column("n_chars").to_numpy().astype(np.float64)
        mu = np.fromiter((mu_[l] for l in langs), np.float64, len(langs))
        sd = np.fromiter((sd_[l] for l in langs), np.float64, len(langs))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "z": pa.array(_r((x - mu) / sd, 4), pa.float64()),
            }
        )

    return docs.map_batches(z, batch_format="pyarrow").sort("doc_id")


def q_pca_power(sf_dir: str, iters: int = 3):
    """Distributed power iteration for the corpus embedding matrix's top
    principal direction (uncentered PCA) — the linear-algebra reduce shape
    (X^T X v as a per-batch matvec combiner, 64 partial rows per batch,
    one tiny groupby per iteration; the 10^10-vector matrix never
    re-shuffles).  Start vector fixed at 1/8 per dim; 3 unrolled
    iterations; output the normalized eigenvector plus the final Rayleigh
    norm — both sides round after identical arithmetic on float64-cast
    inputs."""
    emb = _read(sf_dir, "embeddings", columns=["embedding"])
    v = np.full(64, 0.125, np.float64)
    lam = 0.0
    for _ in range(iters):
        v_ref = ray.put(v)

        def matvec(b: pa.Table, v_ref=v_ref) -> pa.Table:
            vv = ray.get(v_ref)
            X = _emb_matrix(b)
            w = X.T @ (X @ vv)
            return pa.table(
                {"j": pa.array(np.arange(1, 65), pa.int64()),
                 "w": pa.array(w, pa.float64())}
            )

        wdf = (
            emb.map_batches(matvec, batch_format="pyarrow")
            .groupby("j").sum("w").to_pandas()
        )
        wdf.columns = ["j", "w"]
        w = wdf.sort_values("j")["w"].to_numpy()
        lam = float(np.sqrt(np.dot(w, w)))
        v = w / lam
    return pd.DataFrame(
        {
            "j": np.arange(1, 65, dtype=np.int64),
            "v": _r(v, 6),
            "lam": np.full(64, _r(lam, 4), np.float64),
        }
    )


def q_winsorize(sf_dir: str):
    """Per-group winsorization (outlier clipping at the exact p05/p95, the
    robust-stats normalization step): thresholds come from the same
    distinct-value histogram scheme as q_token_quantiles (per event_type,
    positional quantile at ceil(q*N)), broadcast; pass 2 clips and
    aggregates.  Only (type, value, count) histogram rows shuffle."""
    import math

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def vc(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby(["event_type", "value"]).size().reset_index(name="cnt")
        return pa.Table.from_pandas(df, preserve_index=False)

    h = (
        ev.map_batches(vc, batch_format="pyarrow")
        .groupby(["event_type", "value"])
        .sum("cnt")
        .to_pandas()
    )
    h.columns = ["event_type", "value", "cnt"]
    lo_of, hi_of = {}, {}
    for et, grp in h.groupby("event_type"):
        grp = grp.sort_values("value")
        cum = grp["cnt"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = grp["value"].to_numpy()
        lo_of[et] = float(vals[int(np.searchsorted(cum, math.ceil(0.05 * total)))])
        hi_of[et] = float(vals[int(np.searchsorted(cum, math.ceil(0.95 * total)))])
    thr_ref = ray.put((lo_of, hi_of))

    def clip(b: pa.Table) -> pa.Table:
        lo_, hi_ = ray.get(thr_ref)
        df = b.to_pandas()
        lo = df["event_type"].map(lo_).to_numpy()
        hi = df["event_type"].map(hi_).to_numpy()
        x = df["value"].to_numpy()
        cx = np.clip(x, lo, hi)
        out = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n": 1,
                "n_lo": (x < lo).astype(np.int64),
                "n_hi": (x > hi).astype(np.int64),
                "s": cx,
            }
        )
        part = out.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    agg = (
        ev.map_batches(clip, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_lo", alias_name="n_clipped_lo"),
            Sum("n_hi", alias_name="n_clipped_hi"),
            Sum("s", alias_name="s"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("s").to_numpy()
        n = b.column("n").to_numpy()
        lo = [lo_of[t] for t in b.column("event_type").to_pylist()]
        hi = [hi_of[t] for t in b.column("event_type").to_pylist()]
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "n": b.column("n"),
                "p05": pa.array(lo, pa.float64()),
                "p95": pa.array(hi, pa.float64()),
                "n_clipped_lo": b.column("n_clipped_lo"),
                "n_clipped_hi": b.column("n_clipped_hi"),
                "clipped_mean": pa.array(_r(s / n, 4), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("event_type")


def q_csv_roundtrip(sf_dir: str):
    """CSV sink + source round-trip (reference sinks are CSV-first —
    AccountTransfer2csv etc., BlockchainSpider/items -> csv pipelines):
    write the documents projection with ``Dataset.write_csv`` (one shard
    per task), read back with ``ray.data.read_csv``, aggregate per
    source.  Proves the CSV codec surface end-to-end; oracle aggregates
    the original parquet."""
    import shutil
    import uuid

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    d = f"/tmp/bsr_csv_{uuid.uuid4().hex[:8]}"
    docs.write_csv(d)
    try:
        back = ray.data.read_csv(d)
        agg = (
            back.groupby("source")
            .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="total_chars"))
            .sort("source")
            .to_pandas()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return agg


def q_pivot_counts(sf_dir: str):
    """Wide pivot (contingency matrix as columns): event counts per
    event_type x quarter-of-day, one column per quarter — the reshape a
    reporting layer wants.  Combiner shape: per-batch crosstab partials,
    one dim-sized groupby, then the pivot itself is a column projection
    (never a shuffle)."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def crosstab(b: pa.Table) -> pa.Table:
        hours = (
            b.column("ts").to_numpy().astype("datetime64[h]").astype(np.int64) % 24
        )
        df = pd.DataFrame(
            {"event_type": b.column("event_type").to_numpy(zero_copy_only=False),
             "q": (hours // 6).astype(np.int64), "n": 1}
        )
        part = df.groupby(["event_type", "q"], as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    long = (
        ev.map_batches(crosstab, batch_format="pyarrow")
        .groupby(["event_type", "q"])
        .sum("n")
        .to_pandas()
    )
    long.columns = ["event_type", "q", "n"]
    wide = (
        long.pivot(index="event_type", columns="q", values="n")
        .fillna(0)
        .astype("int64")
        .reset_index()
    )
    wide.columns = ["event_type"] + [f"q{int(c)}" for c in wide.columns[1:]]
    for c in ("q0", "q1", "q2", "q3"):
        if c not in wide.columns:
            wide[c] = 0
    return wide[["event_type", "q0", "q1", "q2", "q3"]].sort_values(
        "event_type"
    ).reset_index(drop=True)


def q_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation over lineitem's numeric measures
    (feature-diagnostics primitive: spot redundant quality signals before
    training a filter model).  Two-pass sufficient-statistics plan — the
    numerically stable distributed shape: pass 1 reduces each batch to
    (n, sum_x) partials and the driver forms the means (a 4-number
    broadcast); pass 2 reduces each batch to centered cross-products
    sum((x-mx)*(y-my)), so the groupby-less global sum moves one 11-column
    row per batch and no cancellation-prone raw moments (n*sxy - sx*sy)
    are ever formed.  corr = cxy / sqrt(cxx * cyy) in the same operation
    order as the SQL mirror, rounded 6dp."""
    cols = _CORR_COLS
    li = _read(sf_dir, "lineitem", columns=cols)

    def sums(b: pa.Table) -> pa.Table:
        d = {"n": pa.array([b.num_rows], pa.int64())}
        for c in cols:
            d[f"s_{c}"] = pa.array([pc.sum(b.column(c)).as_py()], pa.float64())
        return pa.table(d)

    tot = li.map_batches(sums, batch_format="pyarrow").sum(
        ["n"] + [f"s_{c}" for c in cols]
    )
    n = tot["sum(n)"]
    means = {c: tot[f"sum(s_{c})"] / n for c in cols}

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]

    def centered(b: pa.Table) -> pa.Table:
        arrs = {c: b.column(c).to_numpy() - means[c] for c in cols}
        d = {}
        for c in cols:
            d[f"v_{c}"] = pa.array([float(np.sum(arrs[c] * arrs[c]))], pa.float64())
        for a, b2 in pairs:
            d[f"x_{a}_{b2}"] = pa.array([float(np.sum(arrs[a] * arrs[b2]))], pa.float64())
        return pa.table(d)

    cs = li.map_batches(centered, batch_format="pyarrow").sum(
        [f"v_{c}" for c in cols] + [f"x_{a}_{b2}" for a, b2 in pairs]
    )
    import math

    rows = []
    for a, b2 in pairs:
        cxy = cs[f"sum(x_{a}_{b2})"]
        denom = math.sqrt(cs[f"sum(v_{a})"] * cs[f"sum(v_{b2})"])
        # constant column -> zero variance -> correlation undefined; the
        # SQL mirror's x / 0.0 NULLs the same cell
        corr = round(cxy / denom, 6) if denom else float("nan")
        rows.append({"col_x": a, "col_y": b2, "corr": corr})
    out = pd.DataFrame(rows).sort_values(["col_x", "col_y"]).reset_index(drop=True)
    return out


def q_hard_negatives(sf_dir: str, n_queries: int = 10, k: int = 3):
    """Hard-negative mining for contrastive embedding training: for each
    query vector, the top-k most-similar vectors with a DIFFERENT label
    (the negatives that sit closest to the decision boundary).  Same
    distributed shape as ann_bruteforce — broadcast query matrix via
    ray.put, per-batch numpy matmul with a label-mismatch mask, per-batch
    partial top-k so only k rows per (query, block) reach the driver-side
    tail merge."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    queries = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q_ids = queries["vec_id"].to_numpy()
    q_labels = queries["label"].to_numpy()
    q_mat = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_labels, q_mat))

    def score(b: pa.Table, _ref=q_ref) -> pa.Table:
        q_ids, q_labels, q = ray.get(_ref)
        ids = b.column("vec_id").to_numpy()
        labels = b.column("label").to_numpy()
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q.T
        out_q, out_n, out_l, out_s = [], [], [], []
        for qi, (qid, qlab) in enumerate(zip(q_ids, q_labels)):
            col = sims[:, qi]
            cand = np.flatnonzero(labels != qlab)
            if len(cand) > k:
                order = np.lexsort((ids[cand], -col[cand]))[:k]
                cand = cand[order]
            for ni in cand:
                out_q.append(int(qid))
                out_n.append(int(ids[ni]))
                out_l.append(int(labels[ni]))
                out_s.append(float(col[ni]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "label": pa.array(out_l, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    df = emb.map_batches(score, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    top = df.groupby("query_id").head(k).reset_index(drop=True)
    top["sim"] = top["sim"].round(4)
    return top[["query_id", "neighbor_id", "label", "sim"]]


def q_rare_category_merge(sf_dir: str, min_support: int = 5):
    """Tail-category coalescing (the feature-engineering rule that folds
    long-tail categories into 'other' before training): (source, lang)
    cells below ``min_support`` docs merge into 'other'.  Two tiny
    aggregates: the cell-count table is category-cardinality-sized, so
    the merge verdict and re-aggregation happen on the finished aggregate
    — the correct plan at any corpus size."""
    docs = _read(sf_dir, "documents", columns=["source", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        return b.group_by(["source", "lang"]).aggregate([([], "count_all")])

    agg = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .sum("count_all")
        .to_pandas()
        .rename(columns={"sum(count_all)": "cnt"})
    )
    cat = np.where(
        agg["cnt"] >= min_support, agg["source"] + "/" + agg["lang"], "other"
    )
    out = (
        pd.DataFrame({"category": cat, "cnt": agg["cnt"]})
        .groupby("category", as_index=False)["cnt"]
        .sum()
        .sort_values("category")
        .reset_index(drop=True)
    )
    return out


def q_curriculum_order(sf_dir: str):
    """Curriculum ordering for training: docs ranked easiest-first by a
    quality proxy (n_chars asc), split into 10 deciles, then SHUFFLED
    within each decile by a seeded md5 key — the 'sort by difficulty,
    randomize within stage' curriculum-learning recipe.  The global rank
    is distributed exactly like shuffle_rank: an order-preserving 256-way
    range bucket on n_chars (pass 1 reduces per-bucket counts so the
    driver computes exclusive offsets; pass 2 argsorts inside each
    bucket), and the within-decile position is one more
    groupby(decile).map_groups argsort over md5 keys."""
    from ray.data.aggregate import Max, Min

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    mm = docs.aggregate(Min("n_chars"), Max("n_chars"))
    lo, hi = int(mm["min(n_chars)"]), int(mm["max(n_chars)"])
    span = max(1, hi - lo + 1)
    n = docs.count()

    def keyed(b: pa.Table) -> pa.Table:
        nc = b.column("n_chars").to_numpy()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
                "bkt": pa.array((nc - lo) * 256 // span, pa.int64()),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = keyed_ds.groupby("bkt").count().to_pandas().sort_values("bkt")
    offsets = dict(
        zip(
            bc["bkt"].astype(int),
            bc["count()"].cumsum().shift(1, fill_value=0).astype(int),
        )
    )
    off_ref = ray.put(offsets)

    def rank(b: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = b.to_pandas().sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        base = off[int(df["bkt"].iloc[0])]
        r = base + np.arange(len(df), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "decile": pa.array(r * 10 // n, pa.int64()),
            }
        )

    ranked = keyed_ds.groupby("bkt").map_groups(rank, batch_format="pyarrow")

    def shuffle_key(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        return b.append_column(
            "k", pa.array([hashlib.md5(str(d).encode()).hexdigest() for d in ids])
        )

    def pos_in_decile(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["k", "doc_id"]).reset_index(drop=True)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "decile": pa.array(df["decile"].to_numpy(), pa.int64()),
                "pos": pa.array(np.arange(len(df), dtype=np.int64), pa.int64()),
            }
        )

    return (
        ranked.map_batches(shuffle_key, batch_format="pyarrow")
        .groupby("decile")
        .map_groups(pos_in_decile, batch_format="pyarrow")
        .sort("doc_id")
    )


def q_group_percentiles(sf_dir: str):
    """Per-group percentile rank (quantile normalization within language:
    the per-lang difficulty/quality percentile a curriculum or filter
    compares across languages).  Distributed exactly like
    curriculum_order's global rank, but keyed per (lang, range-bucket):
    pass 1 reduces per-key counts so the driver computes per-lang
    exclusive offsets and totals; pass 2 finishes with an in-bucket
    argsort.  pct = rank / (n_lang - 1) like SQL percent_rank, rounded
    6dp."""
    from ray.data.aggregate import Max, Min

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    mm = docs.aggregate(Min("n_chars"), Max("n_chars"))
    lo, hi = int(mm["min(n_chars)"]), int(mm["max(n_chars)"])
    span = max(1, hi - lo + 1)

    def keyed(b: pa.Table) -> pa.Table:
        nc = b.column("n_chars").to_numpy()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "n_chars": b.column("n_chars"),
                "bkt": pa.array((nc - lo) * 64 // span, pa.int64()),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = (
        keyed_ds.groupby(["lang", "bkt"])
        .count()
        .to_pandas()
        .sort_values(["lang", "bkt"])
    )
    bc["offset"] = bc.groupby("lang")["count()"].cumsum() - bc["count()"]
    offsets = {
        (l, int(b)): int(o) for l, b, o in zip(bc["lang"], bc["bkt"], bc["offset"])
    }
    totals = bc.groupby("lang")["count()"].sum().astype(int).to_dict()
    meta_ref = ray.put((offsets, totals))

    def rank(g: pa.Table) -> pa.Table:
        offs, tots = ray.get(meta_ref)
        df = g.to_pandas().sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        lang = df["lang"].iloc[0]
        base = offs[(lang, int(df["bkt"].iloc[0]))]
        n = tots[lang]
        r = base + np.arange(len(df), dtype=np.int64)
        pct = np.round(r / (n - 1), 6) if n > 1 else np.zeros(len(df))
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "lang": pa.array(df["lang"], pa.string()),
                "pct": pa.array(pct, pa.float64()),
            }
        )

    return (
        keyed_ds.groupby(["lang", "bkt"])
        .map_groups(rank, batch_format="pyarrow")
        .sort("doc_id")
    )


def q_dist_divergence(sf_dir: str):
    """Per-source distribution drift: KL(source's lang mix || corpus lang
    mix) — the mixture-monitoring signal that flags a web source whose
    language balance departed from the corpus (crawl rot, spam floods).
    One combiner groupby builds the (source, lang) cell table; the KL
    fold runs on that category-sized aggregate.  Both sides sum
    p*ln(p/q) over the lang list in lang order, rounded 6dp."""
    docs = _read(sf_dir, "documents", columns=["source", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        return b.group_by(["source", "lang"]).aggregate([([], "count_all")])

    agg = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .sum("count_all")
        .to_pandas()
        .rename(columns={"sum(count_all)": "n"})
    )
    import math

    total = int(agg["n"].sum())
    corpus = agg.groupby("lang")["n"].sum().astype(int).to_dict()
    rows = []
    for source, g in agg.groupby("source"):
        ns = int(g["n"].sum())
        kl = 0.0
        # lang-order fold so the SQL mirror's ordered sum is bit-identical
        for lang in sorted(g["lang"]):
            c = int(g.loc[g["lang"] == lang, "n"].iloc[0])
            p = c / ns
            q = corpus[lang] / total
            kl += p * math.log(p / q)
        rows.append({"source": source, "kl": round(kl, 6)})
    return pd.DataFrame(rows).sort_values("source").reset_index(drop=True)


def q_event_transitions(sf_dir: str):
    """First-order Markov transition matrix over per-user event sequences
    (behavior-sequence modeling prep: P(next event type | current)).
    groupby(user_id).map_groups orders each user's events by (ts,
    event_id) and emits consecutive-pair cells pre-counted per user, so
    the second groupby moves O(types^2) rows per user; probabilities are
    computed on the finished types^2-sized aggregate.  p = cnt /
    from-type total, rounded 6dp — identical division on both sides."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        t = df["event_type"].to_numpy()
        if len(t) < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        sub = pd.DataFrame({"from_type": t[:-1], "to_type": t[1:]})
        cnt = sub.value_counts().reset_index(name="c")
        return pa.table(
            {
                "from_type": pa.array(cnt["from_type"], pa.string()),
                "to_type": pa.array(cnt["to_type"], pa.string()),
                "c": pa.array(cnt["c"].to_numpy(), pa.int64()),
            }
        )

    agg = (
        ev.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "cnt"})
    )
    totals = agg.groupby("from_type")["cnt"].sum().astype(int).to_dict()
    agg["p"] = [
        round(int(c) / totals[f], 6) for f, c in zip(agg["from_type"], agg["cnt"])
    ]
    return (
        agg[["from_type", "to_type", "cnt", "p"]]
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )


def q_link_locality(sf_dir: str):
    """Per-host link locality: the fraction of a host's out-links that
    stay on-host — the signal that decides whether host-hash partitioning
    co-locates most frontier expansion (high locality → cheap local
    pushes) or the crawl is shuffle-bound.  One combiner map over the
    edge Dataset (per-batch host-collapse + same-host flag pre-summed),
    one tiny groupby; the ratio is computed on the finished
    host-cardinality aggregate, rounded 6dp."""
    edges = _link_edges(sf_dir)

    def cells(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy() % 10
        dst = b.column("dst").to_numpy() % 10
        t = pa.table(
            {
                "host": pa.array(src, pa.int64()),
                "local": pa.array((src == dst).astype(np.int64), pa.int64()),
                "n": pa.array(np.ones(len(src), np.int64), pa.int64()),
            }
        )
        return t.group_by("host").aggregate([("local", "sum"), ("n", "sum")])

    agg = (
        edges.map_batches(cells, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("local_sum", alias_name="local"), Sum("n_sum", alias_name="n"))
        .to_pandas()
    )
    agg["local_ratio"] = (agg["local"] / agg["n"]).round(6)
    return (
        agg[["host", "local", "n", "local_ratio"]]
        .astype({"local": "int64", "n": "int64"})
        .sort_values("host")
        .reset_index(drop=True)
    )


def q_dup_rate_by_source(sf_dir: str):
    """Per-source near-duplicate rate: the share of each source's docs
    whose lede-4-token fingerprint (the curation pipeline's dedup key;
    whole-text hashes have ZERO collisions in this corpus) also appears
    elsewhere — the dashboard number that tells a curation run WHERE its
    duplication comes from.  Two shuffles, both fingerprint-partitioned:
    fingerprint groups flag their members, then doc-level dup flags
    re-aggregate by source.  Rate rounded 6dp."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def keyed(b: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(" ".join(_oracle_tokens(t)[:4]).encode("utf-8")).hexdigest()
            for t in b.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "source": b.column("source"),
                "h": pa.array(h, pa.string()),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow")

    def dup_flags(g: pa.Table) -> pa.Table:
        # one content-hash group: every member is a dup iff the group has
        # company (size > 1)
        flag = 1 if g.num_rows > 1 else 0
        return pa.table(
            {
                "source": g.column("source"),
                "dup": pa.array([flag] * g.num_rows, pa.int64()),
                "n": pa.array([1] * g.num_rows, pa.int64()),
            }
        )

    per_source = (
        keyed_ds.groupby("h")
        .map_groups(dup_flags, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("dup", alias_name="dups"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    per_source["dup_rate"] = (per_source["dups"] / per_source["n"]).round(6)
    return (
        per_source[["source", "dups", "n", "dup_rate"]]
        .astype({"dups": "int64", "n": "int64"})
        .sort_values("source")
        .reset_index(drop=True)
    )


def q_event_value_quantiles(sf_dir: str):
    """Per-event-type exact p25/p50/p75 of value — group-wise quantiles at
    corpus scale.  No per-group sort materializes a whole type's events:
    the same order-preserving range-bucket two-pass as group_percentiles
    (per-(type, value-bucket) counts -> driver offsets -> in-bucket
    ranks), then the three target ranks floor(q*(n-1)) are plucked by a
    rank-range filter.  The SQL mirror selects the identical
    row_number()-indexed values, so no interpolation ambiguity exists."""
    from ray.data.aggregate import Max, Min

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    mm = ev.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0

    def keyed(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        bkt = np.minimum(((v - lo) / span * 64).astype(np.int64), 63)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "event_id": b.column("event_id"),
                "value": b.column("value"),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    keyed_ds = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = (
        keyed_ds.groupby(["event_type", "bkt"])
        .count()
        .to_pandas()
        .sort_values(["event_type", "bkt"])
    )
    bc["offset"] = bc.groupby("event_type")["count()"].cumsum() - bc["count()"]
    offsets = {
        (t, int(b)): int(o)
        for t, b, o in zip(bc["event_type"], bc["bkt"], bc["offset"])
    }
    totals = bc.groupby("event_type")["count()"].sum().astype(int).to_dict()
    targets = {
        t: {int(q * (n - 1)) for q in (0.25, 0.5, 0.75)} for t, n in totals.items()
    }
    meta_ref = ray.put((offsets, targets))

    def pluck(g: pa.Table) -> pa.Table:
        offs, tgts = ray.get(meta_ref)
        df = g.to_pandas().sort_values(["value", "event_id"]).reset_index(drop=True)
        t = df["event_type"].iloc[0]
        base = offs[(t, int(df["bkt"].iloc[0]))]
        want = tgts[t]
        keep = [
            (t, base + i, float(v))
            for i, v in enumerate(df["value"])
            if (base + i) in want
        ]
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in keep], pa.string()),
                "rank": pa.array([k[1] for k in keep], pa.int64()),
                "value": pa.array([k[2] for k in keep], pa.float64()),
            }
        )

    hits = (
        keyed_ds.groupby(["event_type", "bkt"])
        .map_groups(pluck, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for t in sorted(totals):
        n = totals[t]
        by_rank = dict(zip(hits.loc[hits["event_type"] == t, "rank"],
                           hits.loc[hits["event_type"] == t, "value"]))
        rows.append(
            {
                "event_type": t,
                "p25": round(by_rank[int(0.25 * (n - 1))], 6),
                "p50": round(by_rank[int(0.5 * (n - 1))], 6),
                "p75": round(by_rank[int(0.75 * (n - 1))], 6),
            }
        )
    return pd.DataFrame(rows)


def q_cross_source_overlap(sf_dir: str):
    """Cross-source duplication matrix: for every source pair, how many
    distinct lede-4 fingerprints appear in BOTH (mirror-site /
    syndication detection — tells a curation run which source pairs to
    co-dedup; whole-text hashes have zero collisions in this corpus).
    Fingerprint groupby; each group emits its distinct source pairs
    pre-deduped, so the pair aggregate moves O(sources^2) rows per
    fingerprint at worst and the matrix fold runs on a category-sized
    table."""
    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def keyed(b: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(" ".join(_oracle_tokens(t)[:4]).encode("utf-8")).hexdigest()
            for t in b.column("text").to_pylist()
        ]
        return pa.table({"h": pa.array(h, pa.string()), "source": b.column("source")})

    def pairs(g: pa.Table) -> pa.Table:
        ss = sorted(set(g.column("source").to_pylist()))
        a, b2 = [], []
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                a.append(ss[i])
                b2.append(ss[j])
        return pa.table(
            {
                "src_a": pa.array(a, pa.string()),
                "src_b": pa.array(b2, pa.string()),
                "c": pa.array([1] * len(a), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(keyed, batch_format="pyarrow")
        .groupby("h")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .sum("c")
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["src_a", "src_b", "shared"]),
        batch_format="pyarrow",
    ).sort(["src_a", "src_b"])


def q_monthly_revenue_delta(sf_dir: str):
    """Month-over-month revenue deltas over lineitem shipments — the
    incremental-reporting shape (current window vs previous).  One
    combiner groupby produces the month-cardinality revenue table; the
    lag diff runs on that finished aggregate.  revenue =
    sum(extendedprice * (1 - discount)) with the product formed per row
    on both sides, rounded 2dp BEFORE the delta so the subtraction is
    exact in cents."""
    li = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice", "l_discount"])

    def cells(b: pa.Table) -> pa.Table:
        us = b.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        dt = pd.to_datetime(us, unit="us")
        month = dt.year * 100 + dt.month
        rev = _r(
            b.column("l_extendedprice").to_numpy()
            * (1.0 - b.column("l_discount").to_numpy()),
            2,
        )
        t = pa.table(
            {
                "month": pa.array(month.astype(np.int64), pa.int64()),
                "rev": pa.array(rev, pa.float64()),
            }
        )
        return t.group_by("month").aggregate([("rev", "sum")])

    agg = (
        li.map_batches(cells, batch_format="pyarrow")
        .groupby("month")
        .sum("rev_sum")
        .to_pandas()
        .rename(columns={"sum(rev_sum)": "revenue"})
        .sort_values("month")
        .reset_index(drop=True)
    )
    agg["revenue"] = _r(agg["revenue"].to_numpy(), 2)
    agg["delta"] = _r((agg["revenue"] - agg["revenue"].shift(1)).to_numpy(), 2)
    agg.loc[0, "delta"] = np.nan
    return agg[["month", "revenue", "delta"]]


def q_daily_top_users(sf_dir: str, k: int = 3):
    """Per-day top-k users by spend — the windowed top-k / trending shape
    (per-window leaderboards over an event stream).  Combiner plan: each
    batch pre-sums its own (day, user) cents — per-row values are rounded
    to cents first (_r == DuckDB ROUND) so every partial sum is an exact
    integer-in-cents and no sum-order boundary exists — then one groupby
    finishes the (day, user) totals and a per-day map_groups keeps the k
    winners with (total desc, user asc) tie-breaks, exactly row_number()
    in the mirror."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def cells(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        day = us // 86_400_000_000
        cents = _r(b.column("value").to_numpy(), 2)
        t = pa.table(
            {
                "day": pa.array(day.astype(np.int64), pa.int64()),
                "user_id": b.column("user_id"),
                "v": pa.array(cents, pa.float64()),
            }
        )
        return t.group_by(["day", "user_id"]).aggregate([("v", "sum")])

    totals = (
        ev.map_batches(cells, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .sum("v_sum")
        .map_batches(
            lambda b: b.rename_columns(["day", "user_id", "total"]),
            batch_format="pyarrow",
        )
    )

    def topk(g: pa.Table) -> pa.Table:
        df = (
            g.to_pandas()
            .sort_values(["total", "user_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )
        df["total"] = _r(df["total"].to_numpy(), 2)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        totals.groupby("day")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["day", "rank"])
    )


def q_cluster_size_histogram(sf_dir: str):
    """Near-dup cluster size distribution — the dedup-run report card
    (how much of the corpus sits in 2-clusters vs pathological
    boilerplate blobs).  Composes dedup_clusters' connected components:
    one groupby for per-cluster sizes, one for the size histogram; both
    aggregates are cluster/size-cardinality-sized."""
    from ..stages.dedup import connected_components

    clusters = connected_components(_minhash_pair_dataset(sf_dir))
    sizes = clusters.groupby("cluster_id").count()
    hist = (
        sizes.map_batches(
            lambda b: b.rename_columns(["cluster_id", "size"]),
            batch_format="pyarrow",
        )
        .groupby("size")
        .count()
    )
    return hist.map_batches(
        lambda b: b.rename_columns(["size", "clusters"]), batch_format="pyarrow"
    ).sort("size")


def q_levenshtein_verify(sf_dir: str, prefix: int = 64, cap: int = 64):
    """Edit-distance verification of near-duplicate candidate pairs — the
    "exact confirm" stage a fuzzy-dedup pipeline runs AFTER cheap candidate
    generation (here the curation pipeline's lede-4-token fingerprint;
    LSH bands at production scale).  Pairs are emitted inside fingerprint
    groups (only candidate keys shuffle, never the corpus), each group
    capped at ``cap`` members so a degenerate boilerplate bucket stays
    O(cap^2); the Levenshtein DP runs on 64-char prefixes so per-pair cost
    is bounded regardless of document length."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        txt = b.column("text").to_pylist()
        h = [
            hashlib.md5(" ".join(_oracle_tokens(t)[:4]).encode("utf-8")).hexdigest()
            for t in txt
        ]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "p": pa.array([t[:prefix] for t in txt], pa.string()),
                "h": pa.array(h, pa.string()),
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        df = g.to_pandas().sort_values("doc_id").reset_index(drop=True)
        if len(df) > cap:  # no silent caps: truncation is logged
            print(f"levenshtein_verify: capping group of {len(df)} at {cap}")
            df = df.iloc[:cap]
        da, db, dd, ss = [], [], [], []
        for i in range(len(df)):
            for j in range(i + 1, len(df)):
                pa_, pb_ = df["p"].iloc[i], df["p"].iloc[j]
                d = _levenshtein(pa_, pb_)
                m = max(len(pa_), len(pb_))
                da.append(int(df["doc_id"].iloc[i]))
                db.append(int(df["doc_id"].iloc[j]))
                dd.append(d)
                ss.append(1.0 if m == 0 else float(_r(1.0 - d / m, 6)))
        return pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "dist": pa.array(dd, pa.int64()),
                "sim": pa.array(ss, pa.float64()),
            }
        )

    return (
        docs.map_batches(keyed, batch_format="pyarrow")
        .groupby("h")
        .map_groups(pairs, batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )


def q_schema_profile(sf_dir: str):
    """Table profiling — the first thing any 100 TB ingest runs against a
    new delivery: per-column row/null counts, exact distinct cardinality,
    and numeric min/max over ``events``.  Counts and min/max reduce in one
    combiner pass (per-batch partials, one tiny groupby); each column's
    exact NDV is its own distributed groupby (value-partitioned shuffle of
    that column only — the honest exact-cardinality cost; swap in
    hll_distinct for the sketched version)."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    numeric = {"event_id", "user_id", "value"}
    ev = _read(sf_dir, "events", columns=cols)

    def partials(b: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            col = b.column(c)
            n = b.num_rows
            nulls = col.null_count
            if c in numeric and n > nulls:
                mn = float(pc.min(col).as_py())
                mx = float(pc.max(col).as_py())
            elif c == "ts" and n > nulls:
                mn = float(pc.min(col).value)  # epoch micros
                mx = float(pc.max(col).value)
            else:
                mn = mx = None
            rows.append((c, n, nulls, mn, mx))
        return pa.table(
            {
                "col_name": pa.array([r[0] for r in rows], pa.string()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "nulls": pa.array([r[2] for r in rows], pa.int64()),
                "mn": pa.array([r[3] for r in rows], pa.float64()),
                "mx": pa.array([r[4] for r in rows], pa.float64()),
            }
        )

    base = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Sum("nulls", alias_name="n_null"),
            Min("mn", alias_name="min_num"),
            Max("mx", alias_name="max_num"),
        )
        .to_pandas()
    )
    ndv = {
        c: ev.select_columns([c]).groupby(c).count().count() for c in cols
    }
    base["n_distinct"] = base["col_name"].map(ndv).astype("int64")
    base["min_num"] = base["min_num"].round(6)
    base["max_num"] = base["max_num"].round(6)
    return (
        base[["col_name", "n_rows", "n_null", "n_distinct", "min_num", "max_num"]]
        .astype({"n_rows": "int64", "n_null": "int64"})
        .sort_values("col_name")
        .reset_index(drop=True)
    )


def q_label_centroid_distance(sf_dir: str):
    """Embedding-cluster quality report: per label, the mean cosine of its
    vectors to their OWN label centroid vs to the GLOBAL centroid — the
    separability diagnostic read before trusting labels for curriculum /
    filtering decisions (own ≈ glob means the label carries no geometric
    signal).  Two passes, both combiner-shaped: (1) per-(label, dim)
    partial sums → dim-sized groupby → centroids (label-count × 64,
    driver-tiny, broadcast back); (2) per-batch vectorized cosines →
    per-label partial sums → label-sized groupby.  The corpus matrix
    never re-shuffles."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    def dim_sums(b: pa.Table) -> pa.Table:
        X = _emb_matrix(b)
        lab = b.column("label").to_numpy().astype(np.int64)
        out_l, out_j, out_s, out_n = [], [], [], []
        for lb in np.unique(lab):
            sel = X[lab == lb]
            s = sel.sum(axis=0)
            out_l.extend([int(lb)] * 64)
            out_j.extend(range(1, 65))
            out_s.extend(s.tolist())
            out_n.extend([sel.shape[0]] * 64)
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "j": pa.array(out_j, pa.int64()),
                "s": pa.array(out_s, pa.float64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    sums = (
        emb.map_batches(dim_sums, batch_format="pyarrow")
        .groupby(["label", "j"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["label", "j"])
    )
    labels = sorted(sums["label"].unique())
    cent = {}
    counts = {}
    for lb in labels:
        g = sums[sums["label"] == lb]
        n = int(g["n"].iloc[0])
        cent[int(lb)] = g["s"].to_numpy() / n
        counts[int(lb)] = n
    total_n = sum(counts.values())
    glob = (
        sums.groupby("j")["s"].sum().sort_index().to_numpy() / total_n
    )
    cnorm = {lb: float(np.sqrt(np.dot(c, c))) for lb, c in cent.items()}
    gnorm = float(np.sqrt(np.dot(glob, glob)))
    bc = ray.put((cent, cnorm, glob, gnorm))

    def cos_partials(b: pa.Table) -> pa.Table:
        cents, cn, g, gn = ray.get(bc)
        X = _emb_matrix(b)
        lab = b.column("label").to_numpy().astype(np.int64)
        vnorm = np.sqrt((X * X).sum(axis=1))
        vg = X @ g
        out_l, out_own, out_glob, out_n = [], [], [], []
        for lb in np.unique(lab):
            m = lab == lb
            vo = X[m] @ cents[int(lb)]
            own = vo / (vnorm[m] * cn[int(lb)])
            gl = vg[m] / (vnorm[m] * gn)
            out_l.append(int(lb))
            out_own.append(float(own.sum()))
            out_glob.append(float(gl.sum()))
            out_n.append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "own": pa.array(out_own, pa.float64()),
                "glob": pa.array(out_glob, pa.float64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    agg = (
        emb.map_batches(cos_partials, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("own", alias_name="own"),
            Sum("glob", alias_name="glob"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
        .sort_values("label")
    )
    agg["cos_own"] = (agg["own"] / agg["n"]).map(lambda x: float(_r(x, 4)))
    agg["cos_glob"] = (agg["glob"] / agg["n"]).map(lambda x: float(_r(x, 4)))
    return (
        agg[["label", "n", "cos_own", "cos_glob"]]
        .astype({"label": "int64", "n": "int64"})
        .reset_index(drop=True)
    )


def q_retention_cohorts(sf_dir: str):
    """Cohort retention matrix — users bucketed by first-event month, and
    distinct active users per (cohort, month-offset): the engagement table
    every event pipeline ultimately feeds.  Scale-honest shape: first-event
    times reduce via groupby Min (user-cardinality output), rejoin to the
    event stream through the partitioned hash_join (users are fact-sized
    at production scale — no broadcast), then two count shuffles for
    exact distinct users per cell."""
    from ..stages.joins import hash_join

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def dayed(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy()
        d = ts.astype("datetime64[D]").astype(np.int64)  # days since epoch
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "d_event": pa.array(d, pa.int64()),
            }
        )

    days = ev.map_batches(dayed, batch_format="pyarrow")
    firsts = (
        days.groupby("user_id")
        .aggregate(Min("d_event", alias_name="d_first"))
    )
    joined = hash_join(days, firsts, key="user_id")

    def cells(b: pa.Table) -> pa.Table:
        df_ = b.column("d_first").to_numpy()
        off = b.column("d_event").to_numpy() - df_
        cohort = [
            str(np.datetime64(int(d), "D")) for d in df_
        ]  # 'YYYY-MM-DD', matches strftime('%Y-%m-%d')
        return pa.table(
            {
                "cohort": pa.array(cohort, pa.string()),
                "day_offset": pa.array(off, pa.int64()),
                "user_id": b.column("user_id"),
            }
        )

    distinct = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby(["cohort", "day_offset", "user_id"])
        .count()
    )
    out = (
        distinct.groupby(["cohort", "day_offset"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_users"})
    )
    return (
        out.astype({"day_offset": "int64", "n_users": "int64"})
        .sort_values(["cohort", "day_offset"])
        .reset_index(drop=True)
    )


def q_event_runs(sf_dir: str):
    """Gaps-and-islands run-length encoding of each user's event stream —
    contiguous same-type runs with start/end timestamps: the sequence
    primitive behind session labeling, bot-burst detection, and
    changelog→interval (SCD) builds.  One user-partitioned shuffle; the
    per-group encode is a vectorized shift-compare cumsum.  Documented
    partitioning assumption: one user's events fit in a worker (same as
    sessionize); ties broken by (ts, event_id) on both sides."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "event_type", "ts"])

    def encode(g: pa.Table) -> pa.Table:
        df = (
            g.to_pandas()
            .sort_values(["ts", "event_id"])
            .reset_index(drop=True)
        )
        new_run = (df["event_type"] != df["event_type"].shift()).cumsum()
        runs = df.groupby(new_run, sort=False).agg(
            event_type=("event_type", "first"),
            n_events=("event_type", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
        )
        runs["user_id"] = int(df["user_id"].iloc[0])
        runs["run_idx"] = np.arange(1, len(runs) + 1, dtype=np.int64)
        runs["start_us"] = runs["start_ts"].astype("datetime64[us]").astype(np.int64)
        runs["end_us"] = runs["end_ts"].astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_pandas(
            runs[["user_id", "run_idx", "event_type", "n_events", "start_us", "end_us"]],
            preserve_index=False,
        )

    return (
        ev.groupby("user_id")
        .map_groups(encode, batch_format="pyarrow")
        .sort(["user_id", "run_idx"])
    )


def q_mad_outliers(sf_dir: str):
    """Robust outlier detection per event type: exact median, exact MAD
    (median absolute deviation), and the count of |v − median| > 3·MAD
    rows — the heavy-tail-safe complement of z-scoring (length_zscore),
    which a spam/anomaly gate actually wants on skewed value columns.
    Three passes, none sorting a whole group: two bucketed rank plucks
    (median, then median of deviations against the broadcast medians)
    and one combiner count.  Medians enter the deviation math UNROUNDED
    (they are exact corpus values) so both sides subtract identical
    doubles; only the report columns round."""
    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    med = _grouped_median_pluck(ev, "event_type", "event_id", "value")
    med_ref = ray.put(med)

    def dev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        v = b.column("value").to_numpy()
        mv = np.array([m[t] for t in b.column("event_type").to_pylist()])
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "event_id": b.column("event_id"),
                "value": pa.array(np.abs(v - mv), pa.float64()),
            }
        )

    devs = ev.map_batches(dev, batch_format="pyarrow")
    mad = _grouped_median_pluck(devs, "event_type", "event_id", "value")
    mad_ref = ray.put(mad)

    def counts(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        md = ray.get(mad_ref)
        v = b.column("value").to_numpy()
        ts = b.column("event_type").to_pylist()
        mv = np.array([m[t] for t in ts])
        dv = np.array([md[t] for t in ts])
        out = (np.abs(v - mv) > 3.0 * dv).astype(np.int64)
        df = pd.DataFrame({"event_type": ts, "n": 1, "n_outliers": out})
        g = df.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ev.map_batches(counts, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("n_outliers", alias_name="n_outliers"))
        .to_pandas()
        .sort_values("event_type")
    )
    agg["median"] = [float(_r(med[t], 6)) for t in agg["event_type"]]
    agg["mad"] = [float(_r(mad[t], 6)) for t in agg["event_type"]]
    return (
        agg[["event_type", "n", "median", "mad", "n_outliers"]]
        .astype({"n": "int64", "n_outliers": "int64"})
        .reset_index(drop=True)
    )


def q_oov_rate(sf_dir: str, vocab_k: int = 100):
    """Out-of-vocabulary rate per (lang, source) against the corpus'
    top-K term vocabulary — the number that drives vocab-size / tokenizer
    decisions (a slice with 40% OOV against the candidate vocab will
    fragment into char-level tokens and blow its sequence budget).
    Vocabulary = top-K terms by (total count desc, term), built with one
    combiner groupby and broadcast as a frozenset; coverage counts reduce
    as exact integers per cell.  Ties at the vocab cut are pinned by the
    (count, term) order on both sides."""
    docs = _read(sf_dir, "documents", columns=["text", "lang", "source"])

    def term_counts(b: pa.Table) -> pa.Table:
        cnt: dict = {}
        for t in b.column("text").to_pylist():
            for w in _oracle_tokens(t):
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    vocab_df = (
        docs.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        # distributed top-k cut: only vocab_k terms ever reach the driver
        .sort(["c", "term"], descending=[True, False])
        .limit(vocab_k)
        .to_pandas()
    )
    vocab_ref = ray.put(frozenset(vocab_df["term"]))

    def coverage(b: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        rows = []
        for lang, src, t in zip(
            b.column("lang").to_pylist(),
            b.column("source").to_pylist(),
            b.column("text").to_pylist(),
        ):
            toks = _oracle_tokens(t)
            oov = sum(1 for w in toks if w not in vocab)
            rows.append((lang, src, len(toks), oov))
        df = pd.DataFrame(rows, columns=["lang", "source", "toks", "oov"])
        g = df.groupby(["lang", "source"], as_index=False)[["toks", "oov"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        docs.map_batches(coverage, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("toks", alias_name="tokens"), Sum("oov", alias_name="oov"))
        .to_pandas()
    )
    agg["oov_rate"] = [
        0.0 if tk == 0 else float(_r(ov / tk, 6))
        for tk, ov in zip(agg["tokens"], agg["oov"])
    ]
    return (
        agg.astype({"tokens": "int64", "oov": "int64"})
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )


def q_max_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the event value series (largest drop
    from a running peak, in (ts, event_id) order) — the running-extrema
    window shape (cummax-minus-current) the rolling-avg/cumsum family
    doesn't cover; flags collapsing engagement / value streams.  One
    user-partitioned shuffle, vectorized cummax inside the group; same
    documented fits-in-worker assumption as sessionize."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def dd(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = df["value"].to_numpy()
        runmax = np.maximum.accumulate(v)
        draw = runmax - v
        return pa.table(
            {
                "user_id": pa.array([int(df["user_id"].iloc[0])], pa.int64()),
                "n": pa.array([len(v)], pa.int64()),
                "peak": pa.array([float(_r(runmax[-1], 6))], pa.float64()),
                "max_drawdown": pa.array([float(_r(draw.max(), 6))], pa.float64()),
            }
        )

    return (
        ev.groupby("user_id")
        .map_groups(dd, batch_format="pyarrow")
        .sort("user_id")
    )


def q_distinctive_terms(sf_dir: str, k: int = 10):
    """Per-source distinctive vocabulary via log-odds with an informative
    Dirichlet prior (Monroe et al.'s weighted-log-odds, the corpus-
    comparison tool that beats raw TF-IDF for 'what makes source X
    different') — top-K terms per source by z-score.  Scale-honest shape:
    (source, term) cells and the global term prior are both Datasets
    joined by the partitioned hash_join (the vocabulary is ~10^9 terms at
    web scale and never sits on the driver); only the source totals
    (source-cardinality) broadcast.  The z math is independent per-cell
    scalar arithmetic computed map-side; each batch pre-cuts to its local
    top-K per source, so the final per-source fold sees K×blocks rows,
    never the vocabulary.  Ranks cut on the ROUNDED z (ties by term) so
    float noise cannot flip the top-K boundary on either side."""
    from ..stages.joins import hash_join

    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def cell_counts(b: pa.Table) -> pa.Table:
        cnt: dict = {}
        for src_, t in zip(
            b.column("source").to_pylist(), b.column("text").to_pylist()
        ):
            for w in _oracle_tokens(t):
                key = (src_, w)
                cnt[key] = cnt.get(key, 0) + 1
        ks = list(cnt.keys())
        return pa.table(
            {
                "source": pa.array([x[0] for x in ks], pa.string()),
                "term": pa.array([x[1] for x in ks], pa.string()),
                "c": pa.array([cnt[x] for x in ks], pa.int64()),
            }
        )

    cells = (
        docs.map_batches(cell_counts, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Sum("c", alias_name="y"))
        .materialize()  # feeds two consumers: the glob groupby + the join
    )
    glob = cells.groupby("term").aggregate(Sum("y", alias_name="yg"))
    per_src = cells.groupby("source").aggregate(Sum("y", alias_name="ns")).to_pandas()
    ns_map = dict(zip(per_src["source"], per_src["ns"].astype(float)))
    ntot = float(per_src["ns"].sum())
    meta_ref = ray.put((ns_map, ntot))
    joined = hash_join(cells, glob, key="term")

    def zscore(b: pa.Table) -> pa.Table:
        ns_m, nt = ray.get(meta_ref)
        ys = b.column("y").to_numpy().astype(np.float64)
        yg = b.column("yg").to_numpy().astype(np.float64)
        ns = np.array([ns_m[s] for s in b.column("source").to_pylist()])
        a0 = 100.0
        ai = a0 * yg / nt
        yr = yg - ys
        nr = nt - ns
        delta = np.log((ys + ai) / (ns + a0 - ys - ai)) - np.log(
            (yr + ai) / (nr + a0 - yr - ai)
        )
        var = 1.0 / (ys + ai) + 1.0 / (yr + ai)
        z = _r(delta / np.sqrt(var), 6)
        # local pre-cut: this batch's top-k per source (superset of the
        # global top-k restricted to rows in this batch)
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pandas(),
                "term": b.column("term").to_pandas(),
                "y": b.column("y").to_pandas(),
                "z": z,
            }
        ).sort_values(["source", "z", "term"], ascending=[True, False, True])
        df = df.groupby("source", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topk(g: pa.Table) -> pa.Table:
        df = (
            g.to_pandas()
            .sort_values(["z", "term"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["source", "term", "y", "z", "rank"]], preserve_index=False
        )

    return (
        joined.map_batches(zscore, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
        .sort(["source", "rank"])
    )


def q_ks_drift(sf_dir: str):
    """Distribution-drift detection: per source, the exact two-sample
    Kolmogorov–Smirnov distance between its doc-length distribution and
    the rest of the corpus — the alarm a continuously-ingesting pipeline
    puts on every new delivery (a source whose length CDF walked away
    from the corpus needs requalification).  Two combiner groupbys
    produce (source, value) and (value) count tables; the CDF scan runs
    on that distinct-value grid (dim-sized here; at web scale swap the
    grid for the range-bucket rank machinery — KS over bucket boundaries
    bounds the exact KS within bucket width).  Both sides compute the
    same count-ratio doubles, so the max pick cannot diverge."""
    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pandas(),
                "v": b.column("n_chars").to_numpy(),
            }
        )
        g = df.groupby(["source", "v"]).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    sv = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    gv = sv.groupby("v", as_index=False)["c"].sum().rename(columns={"c": "cg"})
    gv = gv.sort_values("v").reset_index(drop=True)
    gv["cumg"] = gv["cg"].cumsum()
    ng = int(gv["cg"].sum())
    cumg = dict(zip(gv["v"], gv["cumg"]))
    vals = gv["v"].tolist()
    rows = []
    for src, g in sv.groupby("source", sort=True):
        n = int(g["c"].sum())
        own = dict(zip(g["v"], g["c"]))
        co = 0
        ks = 0.0
        for v in vals:
            co += own.get(v, 0)
            cr = cumg[v] - co
            d = abs(co / n - cr / (ng - n))
            if d > ks:
                ks = d
        rows.append((src, n, float(_r(ks, 6))))
    return pd.DataFrame(rows, columns=["source", "n", "ks"]).astype({"n": "int64"})


def q_ols_fit(sf_dir: str):
    """Per-group ordinary-least-squares fit (price ~ quantity per
    l_returnflag) — the drift/trend primitive behind quality-vs-age
    regressions in corpus dashboards.  Same numerically stable two-pass
    centered-sufficient-statistics plan as q_corr_matrix, per group: pass 1
    reduces each batch to per-group (n, sum_x, sum_y) partials (a tiny
    groupby), the driver forms per-group means (a 3-row broadcast); pass 2
    reduces to centered Sxx/Syy/Sxy per group.  slope = Sxy/Sxx,
    intercept = my - slope*mx, r2 = Sxy^2/(Sxx*Syy), all in the SQL
    mirror's operation order, rounded 6dp.  Only O(groups) rows shuffle."""
    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def sums(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        part = df.groupby("l_returnflag", as_index=False).agg(
            n=("l_quantity", "size"),
            sx=("l_quantity", "sum"),
            sy=("l_extendedprice", "sum"),
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    tot = (
        li.map_batches(sums, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"))
        .to_pandas()
    )
    means = {
        r["l_returnflag"]: (r["sx"] / r["n"], r["sy"] / r["n"]) for _, r in tot.iterrows()
    }
    m_ref = ray.put(means)

    def centered(b: pa.Table) -> pa.Table:
        mns = ray.get(m_ref)
        df = b.to_pandas()
        mx = df["l_returnflag"].map(lambda g: mns[g][0]).to_numpy()
        my = df["l_returnflag"].map(lambda g: mns[g][1]).to_numpy()
        dx = df["l_quantity"].to_numpy() - mx
        dy = df["l_extendedprice"].to_numpy() - my
        part = pd.DataFrame(
            {"l_returnflag": df["l_returnflag"], "sxx": dx * dx, "syy": dy * dy, "sxy": dx * dy}
        ).groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    cs = (
        li.map_batches(centered, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    rows = []
    for _, r in cs.iterrows():
        g = r["l_returnflag"]
        mx, my = means[g]
        n = int(tot.loc[tot["l_returnflag"] == g, "n"].iloc[0])
        # constant-x (or constant-y) group: 0/0 — the SQL mirror NULLs the
        # same cells, so emit NaN instead of raising
        sxx, syy, sxy = (np.float64(r[c]) for c in ("sxx", "syy", "sxy"))
        slope = sxy / sxx if sxx else np.nan
        r2 = sxy * sxy / (sxx * syy) if sxx and syy else np.nan
        rows.append(
            {
                "l_returnflag": g,
                "n": n,
                "slope": float(_r(slope, 6)),
                "intercept": float(_r(my - slope * mx, 6)),
                "r2": float(_r(r2, 6)),
            }
        )
    return pd.DataFrame(rows).sort_values("l_returnflag").reset_index(drop=True)


def q_new_users_daily(sf_dir: str):
    """Cumulative-distinct-users-by-day (the corpus/crawl freshness curve:
    how many NEW urls/users/hosts each day adds).  Running count(distinct)
    is a shuffle trap at scale; the two-combiner plan never moves a row:
    per-batch (user, min-day) partials -> groupby(user).min (the only
    user-cardinality shuffle, combiner-reduced), then per-batch day counts
    -> groupby(day).sum (day-cardinality), then an O(days) driver cumsum.
    Day arithmetic in integer epoch-days; all counts exact."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def first_day_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        d = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        part = pd.DataFrame({"user_id": df["user_id"], "d": d}).groupby(
            "user_id", as_index=False
        ).min()
        return pa.Table.from_pandas(part, preserve_index=False)

    first = (
        ev.map_batches(first_day_partial, batch_format="pyarrow")
        .groupby("user_id")
        .min("d")
    )

    def day_counts(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        part = df.groupby("min(d)", as_index=False).size().rename(
            columns={"min(d)": "d", "size": "nu"}
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    days = (
        first.map_batches(day_counts, batch_format="pyarrow")
        .groupby("d")
        .sum("nu")
        .to_pandas()
        .rename(columns={"sum(nu)": "new_users"})
        .sort_values("d")
        .reset_index(drop=True)
    )
    days["day"] = days["d"].astype("datetime64[D]").astype("datetime64[ns]").dt.strftime(
        "%Y-%m-%d"
    )
    days["cum_users"] = days["new_users"].cumsum().astype("int64")
    return days[["day", "new_users", "cum_users"]].astype({"new_users": "int64"})


def q_mi_lang_source(sf_dir: str):
    """Mutual information between the lang and source columns — the
    mix-design diagnostic that says how redundant two stratification keys
    are (MI ~ 0 -> stratify on both; MI high -> one implies the other).
    Contingency cells reduce through a combiner groupby (only (lang,
    source, count) rows move — cells, not docs); the driver folds the
    O(cells) table in deterministic (lang, source) order so the float sum
    matches the SQL mirror's ordered aggregate exactly."""
    import math

    docs = _read(sf_dir, "documents", columns=["lang", "source"])

    def cnt(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby(["lang", "source"], as_index=False).size().rename(
            columns={"size": "c"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cells = (
        docs.map_batches(cnt, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    n = float(cells["c"].sum())
    row_m = cells.groupby("lang")["c"].sum().to_dict()
    col_m = cells.groupby("source")["c"].sum().to_dict()
    mi = 0.0
    for _, r in cells.iterrows():  # ordered fold == sum(term ORDER BY lang, source)
        c = float(r["c"])
        mi += (c / n) * math.log((c * n) / (float(row_m[r["lang"]]) * float(col_m[r["source"]])))
    return pd.DataFrame(
        {"n_cells": [int(len(cells))], "n_docs": [int(n)], "mi_nats": [float(_r(mi, 9))]}
    )


def q_skipgram_counts(sf_dir: str, top: int = 50):
    """Window-2 skip-gram collocation counts (the word2vec/co-occurrence
    feature primitive; q_pmi_bigrams covers the adjacent-only case).
    Per-batch Counters reduce (w1, w2) pairs locally before the single
    pair-partitioned groupby — the classic combiner — then a deterministic
    (count desc, w1, w2) distributed sort takes the global top-k, so ties
    at the cut are stable on both sides."""
    from collections import Counter

    docs = _read(sf_dir, "documents", columns=["text"])

    def pairs(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            for off in (1, 2):
                c.update(zip(toks[:-off], toks[off:]))
        if not c:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        w1, w2 = zip(*c.keys())
        return pa.table(
            {
                "w1": pa.array(list(w1), pa.string()),
                "w2": pa.array(list(w2), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .sum("cnt")
        .map_batches(
            lambda b: b.rename_columns(["w1", "w2", "cnt"]), batch_format="pyarrow"
        )
        .sort(["cnt", "w1", "w2"], descending=[True, False, False])
        .limit(top)
    )


def q_welch_ttest(sf_dir: str):
    """Per-event-type Welch two-sample t-test between user cohorts
    (user_id parity = the A/B assignment) — the experimentation primitive
    over an event stream.  Same two-pass centered plan as q_ols_fit but
    keyed (event_type, cohort): pass 1 -> per-cell (n, sum), driver forms
    the O(cells) mean broadcast; pass 2 -> centered sum-of-squares.  t and
    the Welch-Satterthwaite df are formed in the SQL mirror's exact
    operation order; a cohort with n<2 (or absent) NULLs/NaNs the row on
    both sides rather than crashing."""
    ev = _read(sf_dir, "events", columns=["event_type", "user_id", "value"])

    def sums(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["g"] = (df["user_id"] % 2).astype(np.int64)
        part = df.groupby(["event_type", "g"], as_index=False).agg(
            n=("value", "size"), s=("value", "sum")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    tot = (
        ev.map_batches(sums, batch_format="pyarrow")
        .groupby(["event_type", "g"])
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
    )
    means = {(r["event_type"], r["g"]): r["s"] / r["n"] for _, r in tot.iterrows()}
    m_ref = ray.put(means)

    def centered(b: pa.Table) -> pa.Table:
        mns = ray.get(m_ref)
        df = b.to_pandas()
        df["g"] = (df["user_id"] % 2).astype(np.int64)
        # vectorized (type, cohort) -> mean lookup; a per-row apply here
        # would be a Python loop over every event
        mu = (
            pd.Series(mns)
            .reindex(pd.MultiIndex.from_arrays([df["event_type"], df["g"]]))
            .to_numpy()
        )
        dv = df["value"].to_numpy() - mu
        part = pd.DataFrame(
            {"event_type": df["event_type"], "g": df["g"], "ss": dv * dv}
        ).groupby(["event_type", "g"], as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    cs = (
        ev.map_batches(centered, batch_format="pyarrow")
        .groupby(["event_type", "g"])
        .aggregate(Sum("ss", alias_name="ss"))
        .to_pandas()
    )
    cells: dict = {}
    for _, r in tot.iterrows():
        cells.setdefault(r["event_type"], {})[int(r["g"])] = {
            "n": int(r["n"]),
            "mu": means[(r["event_type"], r["g"])],
        }
    for _, r in cs.iterrows():
        cells[r["event_type"]][int(r["g"])]["ss"] = float(r["ss"])

    rows = []
    for et in sorted(cells):
        a, b = cells[et].get(0), cells[et].get(1)
        n_a = a["n"] if a else np.nan
        n_b = b["n"] if b else np.nan
        if a and b and a["n"] > 1 and b["n"] > 1:
            va = a["ss"] / (a["n"] - 1)
            vb = b["ss"] / (b["n"] - 1)
            se2 = va / a["n"] + vb / b["n"]
            if se2 > 0:
                t = (a["mu"] - b["mu"]) / np.sqrt(se2)
                df_w = se2 * se2 / (
                    (va / a["n"]) * (va / a["n"]) / (a["n"] - 1)
                    + (vb / b["n"]) * (vb / b["n"]) / (b["n"] - 1)
                )
            else:  # identical constant cohorts: 0/0 -> NULL on both sides
                t = df_w = np.nan
        else:
            t = df_w = np.nan
        rows.append(
            {
                "event_type": et,
                "n_a": n_a,
                "n_b": n_b,
                "t": float(_r(t, 6)),
                "df": float(_r(df_w, 4)),
            }
        )
    return pd.DataFrame(rows)


def q_silhouette_simplified(sf_dir: str, k: int = 8):
    """Per-cluster simplified silhouette (centroid-based: a = distance to
    own centroid, b = distance to nearest other centroid,
    s = (b-a)/max(a,b)) — the cluster-separation score that at corpus
    scale replaces the O(n^2) exact silhouette.  One broadcast (k x d)
    block, one streaming pass emitting per-cluster (sum_s, n) partials;
    nothing shuffles but k rows per batch."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent_rows = sorted(
        emb.filter(expr=f"vec_id < {int(k)}").take_all(), key=lambda r: r["vec_id"]
    )
    C = np.array([r["embedding"] for r in cent_rows], np.float64)
    c_ref = ray.put(C)

    def partial(b: pa.Table) -> pa.Table:
        C_ = ray.get(c_ref)
        X = _emb_matrix(b)
        d = np.sqrt(((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2))
        order = np.argsort(d, axis=1, kind="stable")
        j = order[:, 0]
        a = d[np.arange(len(j)), j]
        bb = d[np.arange(len(j)), order[:, 1]]
        mx = np.maximum(a, bb)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(mx > 0, (bb - a) / mx, np.nan)
        part = pd.DataFrame({"cluster": j.astype(np.int64), "s": s, "n": 1}).groupby(
            "cluster", as_index=False
        ).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    agg = (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg["mean_silhouette"] = _r(agg["s"] / agg["n"], 6)
    out = agg[["cluster", "n", "mean_silhouette"]].astype({"cluster": "int64", "n": "int64"})
    return out.sort_values("cluster").reset_index(drop=True)


def q_rate_limit_offenders(sf_dir: str, threshold: int = 2):
    """Users whose peak hourly event rate reaches the threshold — the
    abuse/bot screen that feeds a crawl's politeness budgets from the
    OTHER side (which clients hammer us).  Two combiners: (user, hour)
    counts, then per-user max + total; only per-user-hour cells and then
    per-user rows move."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        part = pd.DataFrame(
            {"user_id": df["user_id"], "hour": df["ts"].dt.strftime("%Y-%m-%d %H")}
        ).groupby(["user_id", "hour"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    hourly = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .sum("cnt")
    )

    def per_user(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        part = df.groupby("user_id", as_index=False).agg(
            peak_hourly=("sum(cnt)", "max"), total_events=("sum(cnt)", "sum")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    users = (
        hourly.map_batches(per_user, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("peak_hourly", alias_name="peak_hourly"),
            Sum("total_events", alias_name="total_events"),
        )
        .filter(expr=f"peak_hourly >= {int(threshold)}")
        .sort("user_id")
        .to_pandas()
    )
    if "user_id" not in users.columns:  # fully-filtered Dataset drops columns
        users = pd.DataFrame({"user_id": [], "peak_hourly": [], "total_events": []})
    return users.astype({"user_id": "int64", "peak_hourly": "int64", "total_events": "int64"})


def q_session_stats(sf_dir: str):
    """Session-length distribution (how many sessions of each event count,
    and their mean duration) — the reporting layer over q_sessionize,
    consumed as a composition: the session Dataset streams through one
    more combiner, so histogram cells — not sessions — shuffle.  Duration
    summed in exact integer microseconds; the mean divides once at the
    end in the mirror's order."""
    from .q_relational import q_sessionize  # explicit cross-family dep
    sess = q_sessionize(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        dur_us = (
            df["session_end"].to_numpy().astype("datetime64[us]").astype(np.int64)
            - df["session_start"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        part = pd.DataFrame(
            {"n_events": df["n_events"], "n_sessions": 1, "dur_us": dur_us}
        ).groupby("n_events", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    agg = (
        sess.map_batches(partial, batch_format="pyarrow")
        .groupby("n_events")
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"), Sum("dur_us", alias_name="dur_us")
        )
        .to_pandas()
        .sort_values("n_events")
        .reset_index(drop=True)
    )
    agg["mean_duration_s"] = _r(
        (agg["dur_us"].astype(np.float64) / agg["n_sessions"]) / 1_000_000.0, 6
    )
    return agg[["n_events", "n_sessions", "mean_duration_s"]].astype(
        {"n_events": "int64", "n_sessions": "int64"}
    )


def q_association_rules(sf_dir: str):
    """Event-type association rules per user basket (support / confidence
    / lift — the co-occurrence miner behind 'users who X also Y').  The
    basket never materializes: (user, type) dedupes through one combiner
    groupby, each user's <=5-type set emits its ordered pairs inside its
    group, and pair counts reduce again; the driver finishes the O(types^2)
    metric table.  At 10^9-user scale the per-user map_groups becomes the
    256-bucket groupby of q_dup_span_fraction — same contract, fewer group
    calls."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def dedup_part(b: pa.Table) -> pa.Table:
        df = b.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # consumed three times below (pairs, type counts, user count):
    # materialize or the dedupe shuffle re-runs per consumer
    ut = (
        ev.map_batches(dedup_part, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    def pairs_of_user(g: pa.Table) -> pa.Table:
        ts = sorted(g.column("event_type").to_pylist())
        a, b = [], []
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                a.append(ts[i])
                b.append(ts[j])
        return pa.table(
            {
                "t_a": pa.array(a, pa.string()),
                "t_b": pa.array(b, pa.string()),
                "c": pa.array([1] * len(a), pa.int64()),
            }
        )

    pair_counts = (
        ut.groupby("user_id")
        .map_groups(pairs_of_user, batch_format="pyarrow")
        .groupby(["t_a", "t_b"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )

    def type_part(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("event_type", as_index=False).size().rename(
            columns={"size": "c"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    tc = (
        ut.map_batches(type_part, batch_format="pyarrow")
        .groupby("event_type")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    type_users = dict(zip(tc["event_type"], tc["c"].astype(float)))
    n_users = _count_distinct_users(ut)

    rows = []
    if "t_a" in pair_counts.columns:  # single-type baskets -> no pairs at all
        for _, r in pair_counts.iterrows():
            c = float(r["c"])
            ca, cb = type_users[r["t_a"]], type_users[r["t_b"]]
            rows.append(
                {
                    "t_a": r["t_a"],
                    "t_b": r["t_b"],
                    "n_both": int(c),
                    "support": float(_r(c / n_users, 6)),
                    "confidence": float(_r(c / ca, 6)),
                    "lift": float(_r((c * n_users) / (ca * cb), 6)),
                }
            )
    cols = ["t_a", "t_b", "n_both", "support", "confidence", "lift"]
    return (
        pd.DataFrame(rows, columns=cols).sort_values(["t_a", "t_b"]).reset_index(drop=True)
    )


def q_trimmed_mean(sf_dir: str, trim: float = 0.05):
    """Per-group 5%-trimmed mean (the robust location estimate between the
    mean and the median) — exact at corpus scale via the same
    order-preserving (group, value-bucket) two-pass rank as
    q_event_value_quantiles: bucket counts give each bucket its global
    rank offset, so every group row knows its exact rank without a
    per-group sort, and only in-window values fold into (sum, count)
    partials.  The mean divides once, in the mirror's order."""
    import math

    from ray.data.aggregate import Max as _Max, Min as _Min

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    mm = ev.aggregate(_Min("value"), _Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0

    def keyed(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        bkt = np.minimum(((v - lo) / span * 64).astype(np.int64), 63)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "event_id": b.column("event_id"),
                "value": b.column("value"),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    keyed_ds = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = (
        keyed_ds.groupby(["event_type", "bkt"])
        .count()
        .to_pandas()
        .sort_values(["event_type", "bkt"])
    )
    bc["offset"] = bc.groupby("event_type")["count()"].cumsum() - bc["count()"]
    offsets = {
        (t, int(b)): int(o) for t, b, o in zip(bc["event_type"], bc["bkt"], bc["offset"])
    }
    totals = bc.groupby("event_type")["count()"].sum().astype(int).to_dict()
    # keep 0-based ranks in [k_lo, n - k_lo) — identical to the mirror's
    # 1-based r > floor(trim*n) AND r <= n - floor(trim*n)
    windows = {
        t: (math.floor(trim * n), n - math.floor(trim * n)) for t, n in totals.items()
    }
    meta_ref = ray.put((offsets, windows))

    def fold(g: pa.Table) -> pa.Table:
        offs, win = ray.get(meta_ref)
        df = g.to_pandas().sort_values(["value", "event_id"]).reset_index(drop=True)
        t = df["event_type"].iloc[0]
        base = offs[(t, int(df["bkt"].iloc[0]))]
        k_lo, k_hi = win[t]
        r = np.arange(base, base + len(df))
        m = (r >= k_lo) & (r < k_hi)
        return pa.table(
            {
                "event_type": pa.array([t], pa.string()),
                "s": pa.array([float(df["value"].to_numpy()[m].sum())], pa.float64()),
                "c": pa.array([int(m.sum())], pa.int64()),
            }
        )

    agg = (
        keyed_ds.groupby(["event_type", "bkt"])
        .map_groups(fold, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    agg["trimmed_mean"] = _r(agg["s"] / agg["c"], 6)
    agg["n_kept"] = agg["c"].astype("int64")
    return agg[["event_type", "n_kept", "trimmed_mean"]]


def q_stationary_distribution(sf_dir: str, iters: int = 3):
    """Markov stationary distribution of the event-type transition chain
    (where user behavior equilibrates — the steady-state complement of
    q_event_transitions), by power iteration from uniform.  Events reduce
    to O(types^2) transition cells through the same per-user
    consecutive-pair combiner; the iteration itself runs on that tiny
    table, folding each v*P product in from_type order so every float
    matches the mirror's ordered aggregate bit-for-bit (transition probs
    are pinned at 6dp first, like kmeans_lloyd's centroids)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        t = df["event_type"].to_numpy()
        if len(t) < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        sub = pd.DataFrame({"from_type": t[:-1], "to_type": t[1:]})
        cnt = sub.value_counts().reset_index(name="c")
        return pa.table(
            {
                "from_type": pa.array(cnt["from_type"], pa.string()),
                "to_type": pa.array(cnt["to_type"], pa.string()),
                "c": pa.array(cnt["c"].to_numpy(), pa.int64()),
            }
        )

    cells = (
        ev.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "cnt"})
    )
    totals = cells.groupby("from_type")["cnt"].sum().astype(int).to_dict()
    cells["p"] = [
        float(_r(int(c) / totals[f], 6)) for f, c in zip(cells["from_type"], cells["cnt"])
    ]
    cells = cells.sort_values(["to_type", "from_type"]).reset_index(drop=True)

    def states_part(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["event_type"]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    n_states = int(
        _read(sf_dir, "events", columns=["event_type"])
        .map_batches(states_part, batch_format="pyarrow")
        .groupby("event_type")
        .count()
        .count()
    )
    states = sorted(set(cells["from_type"]) | set(cells["to_type"]))
    v = {s: 1.0 / n_states for s in states}
    for _ in range(iters):
        nv: dict = {}
        for to_t, grp in cells.groupby("to_type", sort=True):
            acc = 0.0
            for _, r in grp.iterrows():  # already from_type-ordered
                if r["from_type"] in v:
                    acc += v[r["from_type"]] * r["p"]
            nv[to_t] = acc
        v = nv
    return pd.DataFrame(
        {"event_type": sorted(v), "v": [float(_r(v[s], 9)) for s in sorted(v)]}
    )


def q_ipf_raking(sf_dir: str, iters: int = 2):
    """Iterative proportional fitting (raking) of the lang x source doc
    counts to uniform margins — the survey-weighting / mix-rebalancing
    primitive: what per-cell sampling weights make every lang AND every
    source contribute equally?  Documents reduce once to O(cells); each
    IPF sweep rescales rows then columns of that tiny table, with every
    margin sum folded in the mirror's pinned key order so the float
    trajectory is identical on both sides."""
    docs = _read(sf_dir, "documents", columns=["lang", "source"])

    def cnt(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby(["lang", "source"], as_index=False).size().rename(
            columns={"size": "c"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cells = (
        docs.map_batches(cnt, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    n = float(cells["c"].sum())
    langs = sorted(cells["lang"].unique())
    sources = sorted(cells["source"].unique())
    rt = n / float(len(langs))
    ct = n / float(len(sources))

    w = {(r["lang"], r["source"]): float(r["c"]) for _, r in cells.iterrows()}
    keys = sorted(w)
    for _ in range(iters):
        # row sweep: margin folded in source order per lang
        rs = {}
        for l, s in keys:
            rs[l] = rs.get(l, 0.0) + w[(l, s)]
        for l, s in keys:
            w[(l, s)] = w[(l, s)] * (rt / rs[l])
        # column sweep: margin folded in lang order per source
        cs: dict = {}
        for l in langs:
            for s in sources:
                if (l, s) in w:
                    cs[s] = cs.get(s, 0.0) + w[(l, s)]
        for l, s in keys:
            w[(l, s)] = w[(l, s)] * (ct / cs[s])
    return pd.DataFrame(
        {
            "lang": [k[0] for k in keys],
            "source": [k[1] for k in keys],
            "weight": [float(_r(w[k], 6)) for k in keys],
        }
    )


def q_rrf_fusion(sf_dir: str, k: int = 60, top: int = 100):
    """Reciprocal-rank fusion of two quality rankings (doc length and
    unique-token ratio) — the standard way to merge retrieval/scoring
    lists without calibrating scores.  Each global rank comes from the
    order-preserving (value -> offset) two-pass: distinct-value counts
    give every value its exact rank offset, each value group orders its
    members by doc_id, so no corpus-wide sort happens; the two rank
    tables meet in the partitioned hash_join and only the fused top-k
    sorts."""
    from ..stages.joins import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def sig(b: pa.Table) -> pa.Table:
        toks = [_oracle_tokens(t) for t in b.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
                "uniq": pa.array([len(set(ts)) / len(ts) for ts in toks], pa.float64()),
            }
        )

    sigs = docs.map_batches(sig, batch_format="pyarrow").materialize()

    def ranks_for(col: str, out: str):
        def hist(b: pa.Table) -> pa.Table:
            df = b.to_pandas().groupby(col, as_index=False).size().rename(
                columns={"size": "cnt"}
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        h = (
            sigs.map_batches(hist, batch_format="pyarrow")
            .groupby(col)
            .sum("cnt")
            .to_pandas()
            .sort_values(col, ascending=False)  # rank 1 = largest value
            .reset_index(drop=True)
        )
        cum = h["sum(cnt)"].cumsum().to_numpy()
        offs = dict(zip(h[col], np.concatenate([[0], cum[:-1]]).astype(np.int64)))
        o_ref = ray.put(offs)

        def assign(g: pa.Table) -> pa.Table:
            om = ray.get(o_ref)
            df = g.to_pandas().sort_values("doc_id").reset_index(drop=True)
            base = int(om[df[col].iloc[0]])
            return pa.table(
                {
                    "doc_id": pa.array(df["doc_id"], pa.int64()),
                    out: pa.array(base + 1 + np.arange(len(df)), pa.int64()),
                }
            )

        return sigs.select_columns(["doc_id", col]).groupby(col).map_groups(
            assign, batch_format="pyarrow"
        )

    r1 = ranks_for("n_chars", "r1")
    r2 = ranks_for("uniq", "r2")
    joined = hash_join(r1, r2, key="doc_id")

    def score(b: pa.Table) -> pa.Table:
        rr1 = b.column("r1").to_numpy().astype(np.float64)
        rr2 = b.column("r2").to_numpy().astype(np.float64)
        rrf = _r(1.0 / (k + rr1) + 1.0 / (k + rr2), 9)
        return b.append_column("rrf", pa.array(rrf, pa.float64()))

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .sort(["rrf", "doc_id"], descending=[True, False])
        .limit(top)
    )


def q_chi2_lang_source(sf_dir: str):
    """Chi-squared independence test on the lang x source contingency
    table (the hypothesis-test companion of q_mi_lang_source: is the
    delivery mix independent of language?).  One cell combiner; the
    O(cells) statistic folds in (lang, source) order so the float sum
    matches the mirror's ordered aggregate."""
    docs = _read(sf_dir, "documents", columns=["lang", "source"])

    def cnt(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby(["lang", "source"], as_index=False).size().rename(
            columns={"size": "c"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cells = (
        docs.map_batches(cnt, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    n = float(cells["c"].sum())
    rl = cells.groupby("lang")["c"].sum().to_dict()
    cs = cells.groupby("source")["c"].sum().to_dict()
    chi2 = 0.0
    for _, r in cells.iterrows():  # ordered fold == sum(term ORDER BY lang, source)
        e = float(rl[r["lang"]]) * float(cs[r["source"]]) / n
        o = float(r["c"])
        chi2 += (o - e) * (o - e) / e
    dof = (len(rl) - 1) * (len(cs) - 1)
    return pd.DataFrame(
        {
            "n_cells": [int(len(cells))],
            "dof": [int(dof)],
            "chi2": [float(_r(chi2, 6))],
        }
    )


def q_clustering_coefficient(sf_dir: str):
    """Per-node local clustering coefficient (triangles / wedges — how
    clique-ish each node's neighborhood is; the transitivity dashboard
    over the same events graph as the motif family).  Composes the
    distributed triangle counter with the wedge table through the
    partitioned hash_join (left join: triangle-less nodes keep cc = 0);
    nothing new materializes driver-side."""
    from ..stages.joins import hash_join

    from .q_graph import q_triangle_count, q_wedge_count  # explicit cross-family dep
    wedges = q_wedge_count(sf_dir)
    tris = q_triangle_count(sf_dir)
    if tris.schema() is None:  # triangle-free graph: the empty Dataset has
        # no schema, which hash_join can't left-join against — cc is 0
        joined = wedges.map_batches(
            lambda b: b.append_column(
                "triangles", pa.array([0] * b.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = hash_join(wedges, tris, key="node", how="left")

    def finish(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        tri = df["triangles"].fillna(0).astype(np.int64)
        w = df["wedges"].astype(np.int64)
        keep = w > 0
        return pa.table(
            {
                "node": pa.array(df["node"][keep], pa.int64()),
                "wedges": pa.array(w[keep], pa.int64()),
                "triangles": pa.array(tri[keep], pa.int64()),
                "clustering": pa.array(
                    _r(tri[keep].to_numpy() / w[keep].to_numpy(), 6), pa.float64()
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("node")


def q_score_calibration(sf_dir: str):
    """Classifier-style calibration table: blended-quality deciles
    (q_quality_blend's score) vs the Gopher keep rate — does the cheap
    blended score actually track the rule-based verdict?  One tokenizing
    pass computes both signals and the verdict per doc; the percentile
    maps broadcast as in quality_blend; only (decile, keeps, n) cells
    shuffle."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def sig(b: pa.Table) -> pa.Table:
        toks = [_oracle_tokens(t) for t in b.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
                "uniq": pa.array([len(set(ts)) / len(ts) for ts in toks], pa.float64()),
                "keep": pa.array([_gopher_stats(ts)[4] for ts in toks], pa.int64()),
            }
        )

    sigs = docs.map_batches(sig, batch_format="pyarrow").materialize()

    def hist(col):
        def f(b: pa.Table) -> pa.Table:
            df = b.to_pandas().groupby(col, as_index=False).size().rename(
                columns={"size": "cnt"}
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        return f

    def less_map(col):
        h = (
            sigs.map_batches(hist(col), batch_format="pyarrow")
            .groupby(col)
            .sum("cnt")
            .to_pandas()
            .sort_values(col)
            .reset_index(drop=True)
        )
        cum = h["sum(cnt)"].cumsum().to_numpy()
        return dict(zip(h[col], np.concatenate([[0], cum[:-1]]).astype(np.int64))), int(
            cum[-1]
        )

    m1, n_total = less_map("n_chars")
    m2, _ = less_map("uniq")
    denom = float(n_total - 1) if n_total > 1 else 1.0
    maps_ref = ray.put((m1, m2, denom))

    def cells(b: pa.Table) -> pa.Table:
        mm1, mm2, dn = ray.get(maps_ref)
        df = b.to_pandas()
        p1 = df["n_chars"].map(mm1).to_numpy(dtype=np.float64) / dn
        p2 = df["uniq"].map(mm2).to_numpy(dtype=np.float64) / dn
        blend = _r(0.5 * p1 + 0.5 * p2, 6)
        dec = np.minimum(np.floor(blend * 10).astype(np.int64), 9)
        part = pd.DataFrame(
            {"decile": dec, "keeps": df["keep"].to_numpy(), "n": 1}
        ).groupby("decile", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        sigs.map_batches(cells, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("keeps", alias_name="keeps"), Sum("n", alias_name="n"))
        .sort("decile")
        .to_pandas()
    )
    out["keep_rate"] = _r(out["keeps"] / out["n"], 6)
    return out.astype({"decile": "int64", "keeps": "int64", "n": "int64"})


def q_anova_f(sf_dir: str):
    """One-way ANOVA F over doc lengths by language (the >2-group
    companion to q_welch_ttest: does lang explain length variance?).
    Pass 1: per-lang (n, sum) combiner -> grand + group means broadcast;
    pass 2: within-group centered squares fold distributed, while the
    O(groups) between-group term folds in lang order on the driver.
    F = (SSB/(k-1)) / (SSW/(n-k)) in the mirror's operation order."""
    docs = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def sums(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        part = df.groupby("lang", as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    tot = (
        docs.map_batches(sums, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    n = float(tot["n"].sum())
    k = len(tot)
    grand = float(tot["s"].sum()) / n
    gm = {r["lang"]: r["s"] / r["n"] for _, r in tot.iterrows()}
    gm_ref = ray.put(gm)

    def within(b: pa.Table) -> pa.Table:
        m = ray.get(gm_ref)
        df = b.to_pandas()
        mu = df["lang"].map(m).to_numpy()
        d = df["n_chars"].to_numpy() - mu
        return pa.table({"ssw": pa.array([float((d * d).sum())], pa.float64())})

    ssw = docs.map_batches(within, batch_format="pyarrow").sum("ssw")
    ssb = 0.0
    for _, r in tot.iterrows():  # lang-ordered fold == sum(term ORDER BY lang)
        d = gm[r["lang"]] - grand
        ssb += float(r["n"]) * d * d
    f = (ssb / (k - 1)) / (ssw / (n - k)) if k > 1 and n > k and ssw > 0 else np.nan
    return pd.DataFrame(
        {
            "k": [int(k)],
            "n": [int(n)],
            "ssb": [float(_r(ssb, 4))],
            "ssw": [float(_r(ssw, 4))],
            "f": [float(_r(f, 6))],
        }
    )


def q_trigram_transitions(sf_dir: str, top: int = 25):
    """Top consecutive event-type TRIPLES per user stream (second-order
    behavior patterns — the sequence-mining step past q_event_transitions'
    first-order matrix).  Same shape: per-user groups emit pre-counted
    triple cells, one types^3-sized groupby, then a deterministic
    (count desc, triple) distributed sort cuts the top-k stably."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def triples(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        t = df["event_type"].to_numpy()
        if len(t) < 3:
            return pa.table(
                {
                    "t1": pa.array([], pa.string()),
                    "t2": pa.array([], pa.string()),
                    "t3": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        sub = pd.DataFrame({"t1": t[:-2], "t2": t[1:-1], "t3": t[2:]})
        cnt = sub.value_counts().reset_index(name="c")
        return pa.table(
            {
                "t1": pa.array(cnt["t1"], pa.string()),
                "t2": pa.array(cnt["t2"], pa.string()),
                "t3": pa.array(cnt["t3"], pa.string()),
                "c": pa.array(cnt["c"].to_numpy(), pa.int64()),
            }
        )

    return (
        ev.groupby("user_id")
        .map_groups(triples, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .sum("c")
        .map_batches(
            lambda b: b.rename_columns(["t1", "t2", "t3", "cnt"]),
            batch_format="pyarrow",
        )
        .sort(["cnt", "t1", "t2", "t3"], descending=[True, False, False, False])
        .limit(top)
    )


def q_decayed_user_scores(sf_dir: str, half_life_days: float = 7.0, top: int = 100):
    """Exponentially time-decayed engagement score per user (the recency-
    weighted feature every ranking/churn model starts from): score =
    sum(value * 2^(-age_days / half_life)) against the corpus horizon.
    One Max(ts) scalar aggregate fixes the horizon, one vectorized pass
    decays and pre-sums per user, one user-keyed groupby reduces; the
    decay is written as exp(ln(2) * x) on both sides so the libm call
    sequence matches.  Top-k by (score desc, user) cuts stably."""
    from ray.data.aggregate import Max as _Max

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    horizon_us = int(
        pd.Timestamp(ev.aggregate(_Max("ts"))["max(ts)"]).to_datetime64().astype(
            "datetime64[us]"
        ).astype(np.int64)
    )

    def decay(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        age_days = (
            horizon_us - df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ) / 86_400_000_000.0
        w = np.exp(np.log(2.0) * (-age_days / half_life_days))
        part = pd.DataFrame(
            {"user_id": df["user_id"], "s": df["value"].to_numpy() * w}
        ).groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        ev.map_batches(decay, batch_format="pyarrow")
        .groupby("user_id")
        .sum("s")
        .map_batches(
            lambda b: pa.table(
                {
                    "user_id": b.column("user_id"),
                    "score": pa.array(
                        _r(b.column("sum(s)").to_numpy(zero_copy_only=False), 6),
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["score", "user_id"], descending=[True, False])
        .limit(top)
    )
    return out


def q_touch_attribution(sf_dir: str):
    """First/last-touch value attribution (the marketing-analytics window
    shape): each user's total event value is credited once to the event
    type of their FIRST event and once to their LAST; per-type sums of
    both.  groupby(user).map_groups reduces each user to a 1-row
    (first_type, last_type, total) record — users co-locate by
    construction — then one types-sized combiner finishes.  Totals are
    per-row cent-rounded before summing (the money-parity rule), so the
    sums are exact integers in cents."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"])

    def per_user(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        total_cents = int(np.round(_r(df["value"].to_numpy(), 2) * 100).sum())
        return pa.table(
            {
                "first_type": pa.array([df["event_type"].iloc[0]], pa.string()),
                "last_type": pa.array([df["event_type"].iloc[-1]], pa.string()),
                "cents": pa.array([total_cents], pa.int64()),
            }
        )

    users = ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")

    def cells(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        f = df.groupby("first_type", as_index=False)["cents"].sum().rename(
            columns={"first_type": "event_type", "cents": "first_cents"}
        )
        l = df.groupby("last_type", as_index=False)["cents"].sum().rename(
            columns={"last_type": "event_type", "cents": "last_cents"}
        )
        m = f.merge(l, on="event_type", how="outer").fillna(0)
        return pa.Table.from_pandas(m, preserve_index=False)

    out = (
        users.map_batches(cells, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("first_cents", alias_name="first_cents"),
            Sum("last_cents", alias_name="last_cents"),
        )
        .sort("event_type")
        .to_pandas()
    )
    out["first_touch_value"] = _r(out["first_cents"].astype(np.float64) / 100.0, 2)
    out["last_touch_value"] = _r(out["last_cents"].astype(np.float64) / 100.0, 2)
    return out[["event_type", "first_touch_value", "last_touch_value"]]


def q_scc_pivot(sf_dir: str, pivot: int = 0):
    """Strongly connected component of a pivot node over the DIRECTED
    events graph — the forward-BFS ∩ backward-BFS step at the core of the
    FW-BW distributed SCC algorithm (the directed complement of the
    undirected connected components in dedup_clusters).  Both closures
    run to fixpoint as streaming frontier-filter passes (q_bfs_reachable's
    wave, one per direction per hop)."""
    edges = _events_edges(sf_dir).materialize()
    fwd = _directed_closure(edges, pivot, True)
    bwd = _directed_closure(edges, pivot, False)
    scc = sorted(fwd & bwd)
    return pd.DataFrame({"node": scc, "scc_size": [len(scc)] * len(scc)}).astype(
        {"node": "int64", "scc_size": "int64"}
    )


def q_bowtie(sf_dir: str, pivot: int = 0):
    """Bow-tie decomposition of the directed events link graph (Broder et
    al., "Graph structure in the Web", WWW'00) anchored at the pivot's SCC:
    CORE = fwd(pivot) ∩ bwd(pivot), IN = bwd \\ CORE (reaches the core),
    OUT = fwd \\ CORE (reachable from it), OTHER = tendrils/tubes/
    disconnected.  The two closures are the same streaming frontier waves
    FW-BW SCC uses (one filter pass over the edge Dataset per hop); the
    classification itself is a driver-side set partition over node ids —
    at web scale it becomes one map_batches CASE over a broadcast pair of
    membership filters.  Crawl relevance: seeds inside IN∪CORE cover
    CORE∪OUT; seeds in OUT waste budget (reference's seed-selection
    concern, strategies/txs/*)."""
    edges = _events_edges(sf_dir).materialize()
    fwd = _directed_closure(edges, pivot, True)
    bwd = _directed_closure(edges, pivot, False)
    core = fwd & bwd
    parts = {
        n: (
            "core"
            if n in core
            else "in" if n in bwd else "out" if n in fwd else "other"
        )
        for n in range(50)
    }
    sizes: dict = {}
    for p in parts.values():
        sizes[p] = sizes.get(p, 0) + 1
    return pd.DataFrame(
        {
            "node": list(range(50)),
            "part": [parts[n] for n in range(50)],
            "part_size": [sizes[parts[n]] for n in range(50)],
        }
    ).astype({"node": "int64", "part_size": "int64"})


def q_grouped_mode(sf_dir: str):
    """Per-group mode (most frequent 1dp value bucket per event type, tie
    -> smallest value) — the modal aggregate Ray Data and most engines
    lack.  Distinct-value counts reduce through a combiner; each group's
    argmax is plucked inside its group with the mirror's (count desc,
    value) tie rule."""
    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["v"] = _r(df["value"].to_numpy(), 1)
        part = df.groupby(["event_type", "v"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    def pick(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["cnt", "v"], ascending=[False, True])
        top = df.iloc[0]
        return pa.table(
            {
                "event_type": pa.array([top["event_type"]], pa.string()),
                "mode_value": pa.array([float(top["v"])], pa.float64()),
                "mode_count": pa.array([int(top["cnt"])], pa.int64()),
            }
        )

    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["event_type", "v"])
        .sum("cnt")
        .map_batches(
            lambda b: b.rename_columns(["event_type", "v", "cnt"]),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .map_groups(pick, batch_format="pyarrow")
        .sort("event_type")
    )


def q_weighted_median(sf_dir: str):
    """Per-group WEIGHTED median of event values (weight = the value's own
    cent amount — 'the value level where half the money sits', the revenue
    analogue of the median).  Weights are cent integers (money-parity
    rule), so cumulative weights are exact and the crossing row is
    unambiguous on both sides: the same (group, value-bucket) two-pass as
    trimmed_mean accumulates integer weight offsets, and each group plucks
    the first (value, event_id)-ordered row whose running weight reaches
    half the group total."""
    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def keyed(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        cents = np.round(_r(v, 2) * 100).astype(np.int64)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "event_id": b.column("event_id"),
                "value": b.column("value"),
                "w": pa.array(cents, pa.int64()),
            }
        )

    keyed_ds = ev.map_batches(keyed, batch_format="pyarrow").materialize()
    mm = keyed_ds.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi - lo) or 1.0

    def bucketed(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        bkt = np.minimum(((v - lo) / span * 64).astype(np.int64), 63)
        return b.append_column("bkt", pa.array(bkt, pa.int64()))

    bk = keyed_ds.map_batches(bucketed, batch_format="pyarrow").materialize()
    bw = (
        bk.groupby(["event_type", "bkt"])
        .sum("w")
        .to_pandas()
        .rename(columns={"sum(w)": "bw"})
        .sort_values(["event_type", "bkt"])
    )
    bw["offset"] = bw.groupby("event_type")["bw"].cumsum() - bw["bw"]
    offsets = {
        (t, int(b)): int(o) for t, b, o in zip(bw["event_type"], bw["bkt"], bw["offset"])
    }
    totals = bw.groupby("event_type")["bw"].sum().astype(int).to_dict()
    # first row whose RUNNING cent weight >= ceil(W/2); integer math, no
    # float crossing ambiguity
    targets = {t: (w + 1) // 2 for t, w in totals.items()}
    meta_ref = ray.put((offsets, targets))

    def pluck(g: pa.Table) -> pa.Table:
        offs, tgts = ray.get(meta_ref)
        df = g.to_pandas().sort_values(["value", "event_id"]).reset_index(drop=True)
        t = df["event_type"].iloc[0]
        base = offs[(t, int(df["bkt"].iloc[0]))]
        tgt = tgts[t]
        run = base + df["w"].cumsum().to_numpy()
        # the crossing row lives in THIS bucket iff the running weight
        # passes the target strictly inside it
        if base >= tgt or run[-1] < tgt:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "weighted_median": pa.array([], pa.float64())}
            )
        i = int(np.nonzero(run >= tgt)[0][0])
        return pa.table(
            {
                "event_type": pa.array([t], pa.string()),
                "weighted_median": pa.array([float(df["value"].iloc[i])], pa.float64()),
            }
        )

    return (
        bk.groupby(["event_type", "bkt"])
        .map_groups(pluck, batch_format="pyarrow")
        .sort("event_type")
    )


def q_proportion_ztest(sf_dir: str):
    """Two-sample proportion z-test on Gopher keep rates between the two
    largest sources — 'did delivery B really regress quality vs A, or is
    it noise?'.  One tokenizing pass computes verdicts, one combiner
    reduces (source, keeps, n) cells; the pooled-variance z forms on the
    driver in the mirror's operation order."""
    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def cells(b: pa.Table) -> pa.Table:
        keeps = [
            _gopher_stats(_oracle_tokens(t))[4] for t in b.column("text").to_pylist()
        ]
        part = pd.DataFrame(
            {"source": b.column("source").to_pylist(), "keeps": keeps, "n": 1}
        ).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    agg = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("keeps", alias_name="keeps"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "source"], ascending=[False, True])
        .reset_index(drop=True)
    )
    if len(agg) < 2:
        return pd.DataFrame(
            {"source_a": [None], "source_b": [None], "p_a": [np.nan],
             "p_b": [np.nan], "z": [np.nan]}
        )
    a, b = agg.iloc[0], agg.iloc[1]
    p_a = float(a["keeps"]) / float(a["n"])
    p_b = float(b["keeps"]) / float(b["n"])
    pool = (float(a["keeps"]) + float(b["keeps"])) / (float(a["n"]) + float(b["n"]))
    se2 = pool * (1.0 - pool) * (1.0 / a["n"] + 1.0 / b["n"])
    z = (p_a - p_b) / np.sqrt(se2) if se2 > 0 else np.nan
    return pd.DataFrame(
        {
            "source_a": [a["source"]],
            "source_b": [b["source"]],
            "p_a": [float(_r(p_a, 6))],
            "p_b": [float(_r(p_b, 6))],
            "z": [float(_r(z, 6))],
        }
    )


def q_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions (and when it first happens) — the
    capacity-planning sweep-line: +1 at every session start, -1 at its
    end, maximum of the running sum.  A global running sum is the
    anti-pattern; this is the distributed max-prefix-sum: session deltas
    bucket by time range, each bucket sorts locally and reports (total,
    local peak, first peak ts), and the driver combines 64 bucket
    summaries with exact integer offsets — the same order-preserving
    two-pass as shuffle_rank, specialized to running extrema."""
    from .q_relational import q_sessionize  # explicit cross-family dep
    sess = q_sessionize(sf_dir)

    def deltas(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        s = df["session_start"].to_numpy().astype("datetime64[us]").astype(np.int64)
        e = df["session_end"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "ts": pa.array(np.concatenate([s, e]), pa.int64()),
                "delta": pa.array(
                    np.concatenate([np.ones(len(s), np.int64), -np.ones(len(e), np.int64)])
                ),
                "user_id": pa.array(
                    np.concatenate([df["user_id"], df["user_id"]]), pa.int64()
                ),
                "session_id": pa.array(
                    np.concatenate([df["session_id"], df["session_id"]]), pa.int64()
                ),
            }
        )

    dd = sess.map_batches(deltas, batch_format="pyarrow").materialize()
    mm = dd.aggregate(Min("ts"), Max("ts"))
    lo, hi = int(mm["min(ts)"]), int(mm["max(ts)"])
    span = (hi - lo) or 1

    def bucketed(b: pa.Table) -> pa.Table:
        t = b.column("ts").to_numpy()
        bkt = np.minimum(((t - lo) * 64) // span, 63).astype(np.int64)
        return b.append_column("bkt", pa.array(bkt, pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(
            ["ts", "delta", "user_id", "session_id"],
            ascending=[True, False, True, True],
        )
        run = df["delta"].cumsum().to_numpy()
        peak = int(run.max())
        first = int(df["ts"].to_numpy()[int(np.argmax(run >= peak))])
        return pa.table(
            {
                "bkt": pa.array([int(df["bkt"].iloc[0])], pa.int64()),
                "total": pa.array([int(run[-1])], pa.int64()),
                "peak": pa.array([peak], pa.int64()),
                "peak_ts": pa.array([first], pa.int64()),
            }
        )

    summaries = (
        dd.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(local, batch_format="pyarrow")
        .to_pandas()
        .sort_values("bkt")
        .reset_index(drop=True)
    )
    offset = 0
    best, best_ts = -1, None
    for _, r in summaries.iterrows():
        cand = offset + int(r["peak"])
        if cand > best:  # strictly greater keeps the EARLIEST occurrence
            best, best_ts = cand, int(r["peak_ts"])
        offset += int(r["total"])
    at = pd.Timestamp(np.int64(best_ts).astype("datetime64[us]"))
    return pd.DataFrame({"peak": [int(best)], "at_ts": [at]})


def q_length_gini(sf_dir: str):
    """Gini coefficient of the doc-length distribution (corpus-level
    inequality: is the token budget concentrated in a few giant docs?) —
    complements host_gini's per-host counts.  Exact with ties and without
    a global sort: the distinct-value histogram reduces through one
    combiner, and the rank-sum form's S = sum_i i * x_(i) folds per value
    run as v * (c*a + c*(c+1)/2) in EXACT integer arithmetic (python
    bigints), so only the final two divisions are floats — identical on
    both sides."""
    docs = _read(sf_dir, "documents", columns=["n_chars"])

    def hist(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("n_chars", as_index=False).size().rename(
            columns={"size": "c"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    h = (
        docs.map_batches(hist, batch_format="pyarrow")
        .groupby("n_chars")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values("n_chars")
        .reset_index(drop=True)
    )
    a = 0  # rank offset before each value run
    S = 0
    T = 0
    n = 0
    for _, r in h.iterrows():
        v, c = int(r["n_chars"]), int(r["c"])
        S += v * (c * a + c * (c + 1) // 2)
        T += v * c
        n += c
        a += c
    gini = 2.0 * S / (n * T) - (n + 1.0) / n
    return pd.DataFrame({"n": [int(n)], "gini": [float(_r(gini, 6))]})


def q_heaps_law(sf_dir: str):
    """Heaps-law vocabulary-growth checkpoints: cumulative distinct-token
    count V(N) at 8 doc-id prefixes of the corpus — the dial that predicts
    tokenizer vocab size at 100 TB from a small prefix.  The sequential
    "scan in order, count new words" definition is re-expressed as two
    independent combiners so nothing is sequential: (1) per-token FIRST
    OCCURRENCE doc_id (per-batch min partials -> groupby(token).min), after
    which V(p) = |{tokens: first <= p}| folds to 8 counters per batch;
    (2) cumulative token totals per checkpoint fold the same way directly
    from documents.  Only (token, min) pairs and 8-row partials ever move;
    checkpoint thresholds are exact integer (max_doc * i) // 8 on both
    sides."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    max_doc = int(
        _read(sf_dir, "documents", columns=["doc_id"]).max("doc_id")
    )
    thr = [(max_doc * i) // 8 for i in range(1, 9)]

    def first_part(b: pa.Table) -> pa.Table:
        firsts: dict = {}
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            for tok in _oracle_tokens(t):
                p = firsts.get(tok)
                if p is None or d < p:
                    firsts[tok] = d
        return pa.table(
            {
                "token": pa.array(list(firsts.keys()), pa.string()),
                "fd": pa.array(list(firsts.values()), pa.int64()),
            }
        )

    firsts = (
        docs.map_batches(first_part, batch_format="pyarrow")
        .groupby("token")
        .min("fd")
    )

    def vocab_part(b: pa.Table) -> pa.Table:
        fd = b.column(1).to_numpy()
        return pa.table(
            {
                "ckpt": pa.array(range(1, 9), pa.int64()),
                "v": pa.array([int((fd <= p).sum()) for p in thr], pa.int64()),
            }
        )

    vtab = (
        firsts.map_batches(vocab_part, batch_format="pyarrow")
        .groupby("ckpt")
        .sum("v")
        .to_pandas()
        .set_index("ckpt")["sum(v)"]
    )

    def tok_part(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        nt = np.array(
            [len(_oracle_tokens(t)) for t in b.column("text").to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "ckpt": pa.array(range(1, 9), pa.int64()),
                "c": pa.array([int(nt[d <= p].sum()) for p in thr], pa.int64()),
            }
        )

    ttab = (
        docs.map_batches(tok_part, batch_format="pyarrow")
        .groupby("ckpt")
        .sum("c")
        .to_pandas()
        .set_index("ckpt")["sum(c)"]
    )
    return pd.DataFrame(
        {
            "ckpt": list(range(1, 9)),
            "max_doc": [int(p) for p in thr],
            "n_tokens": [int(ttab.get(i, 0)) for i in range(1, 9)],
            "vocab": [int(vtab.get(i, 0)) for i in range(1, 9)],
        }
    )


def q_term_burstiness(sf_dir: str, k: int = 30):
    """Fano factor (variance-to-mean ratio of per-doc occurrence counts,
    zeros included) for the top-k vocabulary — Church & Gale's burstiness:
    function words sit near 1 (Poisson), topical terms are overdispersed.
    Two combiner passes: the vocab top-k (sort+limit, only k rows to the
    driver) broadcasts as a frozenset via ray.put; pass 2 folds each batch
    to per-token (sum c, sum c^2) integer partials over WHOLE docs (rows =
    docs, so per-doc counts never cross a batch) -> groupby(token).sum.
    N and the sums stay exact integers; both sides evaluate the identical
    float expression, rounded 6dp."""
    from .q_text import q_vocab_topk  # explicit cross-family dep
    topk = q_vocab_topk(sf_dir, k=k).to_pandas()["token"].tolist()
    top_ref = ray.put(frozenset(topk))
    docs = _read(sf_dir, "documents", columns=["text"])
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        keep = ray.get(top_ref)
        s1: dict = {}
        s2: dict = {}
        for t in b.column("text").to_pylist():
            c = Counter(tok for tok in _oracle_tokens(t) if tok in keep)
            for tok, v in c.items():
                s1[tok] = s1.get(tok, 0) + v
                s2[tok] = s2.get(tok, 0) + v * v
        toks = list(s1.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "s1": pa.array([s1[t] for t in toks], pa.int64()),
                "s2": pa.array([s2[t] for t in toks], pa.int64()),
            }
        )

    agg = (
        docs.map_batches(part, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"))
        .to_pandas()
    )
    N = int(n_docs)
    rows = []
    for _, r in agg.iterrows():
        s1, s2 = int(r["s1"]), int(r["s2"])
        fano = ((s2 - s1 * s1 * 1.0 / N) / (N - 1)) / (s1 * 1.0 / N)
        rows.append({"token": r["token"], "total": s1, "fano": float(_r(fano, 6))})
    return (
        pd.DataFrame(rows).sort_values("token").reset_index(drop=True)
    )


def q_winnowing(sf_dir: str, k: int = 3, w: int = 4):
    """MOSS winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003):
    per doc, hash every k-token gram (md5 low-64, the repo-wide
    DuckDB-equal _stable_h64) and keep, for each window of w consecutive
    gram hashes, the minimum — rightmost on ties — then dedup selected
    positions.  Guarantees every shared substring of >= w+k-1 tokens
    yields a shared fingerprint, with density ~2/(w+1) — the local, scale-
    free alternative to corpus-global MinHash.  Embarrassingly parallel:
    one map_batches, per-doc numpy sliding-window argmin (reversed-window
    argmin gives the rightmost tie), no shuffle; output rows are the
    selected (doc_id, pos, fp) fingerprints."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        out_d, out_p, out_f = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            m = len(toks) - (k - 1)
            if m <= 0:
                continue
            h = np.array(
                [_stable_h64(" ".join(toks[i : i + k])) for i in range(m)],
                dtype=np.uint64,
            )
            if m <= w:
                pos = np.array([m - 1 - int(h[::-1].argmin())], dtype=np.int64)
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, w)
                j = (w - 1) - sw[:, ::-1].argmin(axis=1)
                pos = np.unique(np.arange(m - w + 1, dtype=np.int64) + j)
            out_d.extend([d] * len(pos))
            out_p.extend((pos + 1).tolist())
            out_f.extend((h[pos] % np.uint64(1000000007)).astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "fp": pa.array(out_f, pa.int64()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow").sort(["doc_id", "pos"])


def q_pareto_skyline(sf_dir: str):
    """2-D Pareto skyline (Borzsonyi et al., ICDE'01) of documents on
    (n_tokens max, distinct-token ratio max) — "longest AND least
    repetitive" corpus exemplars; the classic multi-criteria selection
    operator the relational family lacked.  Combiner shape: dominance is
    transitive, so the global skyline is a subset of every batch's local
    skyline — each batch reduces to its own skyline via one descending
    sort-scan (keep a point iff its y tops its x-group AND beats the best
    y among strictly-greater x), and the driver replays the identical scan
    over the union of the tiny partials.  Ties on BOTH dims are all kept
    (neither strictly dominates), matching the NOT EXISTS mirror; uq is
    rounded 6dp on both sides BEFORE dominance so float noise cannot flip
    an edge."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _skyline(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_tokens", "uq"], ascending=False)
        keep_idx = []
        best_above = -1.0
        for _, grp in df.groupby("n_tokens", sort=False):
            gmax = grp["uq"].iloc[0]
            if gmax > best_above:
                keep_idx.extend(grp.index[grp["uq"] == gmax].tolist())
                best_above = gmax
        return df.loc[keep_idx]

    def feats(b: pa.Table) -> pa.Table:
        rows = []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            rows.append((d, len(toks), float(_r(len(set(toks)) * 1.0 / len(toks), 6))))
        df = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "uq"])
        return pa.Table.from_pandas(_skyline(df), preserve_index=False)

    parts = docs.map_batches(feats, batch_format="pyarrow").to_pandas()
    return (
        _skyline(parts).sort_values("doc_id").reset_index(drop=True)
    )


def q_bootstrap_ci(sf_dir: str, B: int = 200):
    """Seeded deterministic bootstrap 95% CI for the mean doc length — the
    experimentation primitive behind 'is corpus A longer than corpus B'
    claims, with md5-keyed draws so both sides replay the identical
    resamples (no RNG state, partitioning-independent).  Resample b's i-th
    draw picks the value at doc-id-rank md5_low64(f'{b}:{i}') % n; resample
    means sort by (mean, b) and the CI is the exact order statistics at
    ceil(.025*B) / ceil(.975*B).  The value table pulled to the driver is
    the (doc_id, n_chars) projection — at 100 TB bound it first with the
    deterministic hash_sample pipeline and bootstrap the sample; the
    resampling itself is O(B*n) integer hashing, embarrassingly parallel
    over b if ever needed."""
    from ..stages.dedup import _stable_h64

    v = (
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
        .sort("doc_id")
        .to_pandas()
    )
    vals = v["n_chars"].to_numpy(dtype=np.int64)
    n = len(vals)
    means = []
    for b in range(B):
        s = sum(int(vals[_stable_h64(f"{b}:{i}") % n]) for i in range(n))
        means.append((s * 1.0 / n, b))
    means.sort()
    import math

    lo = means[math.ceil(0.025 * B) - 1][0]
    hi = means[math.ceil(0.975 * B) - 1][0]
    mean = float(vals.sum()) / n
    return pd.DataFrame(
        {
            "mean": [float(_r(mean, 6))],
            "lo": [float(_r(lo, 6))],
            "hi": [float(_r(hi, 6))],
        }
    )


def q_covisitation(sf_dir: str, cap: int = 20, min_users: int = 2):
    """Bipartite co-visitation projection: project the user x item graph
    (items = the events edge-list dst nodes) onto item-item edges weighted
    by shared-user count — the 'users who touched A also touched B'
    primitive behind related-page mining and crawl-seed expansion.  Skew-
    safe by construction: each user's DISTINCT item set is capped at the
    ``cap`` smallest item ids (deterministic, logged semantics documented
    here) so one power-user emits at most C(cap,2) pairs; shape is one
    groupby(user).map_groups pair-emission followed by one pair-key
    groupby-sum — no driver-side state."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id"])

    def items(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        e = b.column("event_id").to_numpy()
        t = pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "item": pa.array((u * 13 + e) % 50, pa.int64()),
            }
        )
        # per-batch distinct pre-shrink before the user shuffle
        return t.group_by(["user_id", "item"]).aggregate([])

    def pairs(g: pa.Table) -> pa.Table:
        it = np.unique(g.column("item").to_numpy())[:cap]
        iu, ju = np.triu_indices(len(it), k=1)
        return pa.table(
            {
                "item_a": pa.array(it[iu], pa.int64()),
                "item_b": pa.array(it[ju], pa.int64()),
                "one": pa.array(np.ones(len(iu), dtype=np.int64), pa.int64()),
            }
        )

    out = (
        ev.map_batches(items, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["item_a", "item_b"])
        .sum("one")
        .map_batches(
            lambda b: b.rename_columns(["item_a", "item_b", "co_users"]),
            batch_format="pyarrow",
        )
        .filter(expr=f"co_users >= {min_users}")
        .sort(["item_a", "item_b"])
    )
    return out


def q_jaro_winkler_verify(sf_dir: str):
    """Jaro-Winkler verify kernel parity (the record-linkage sibling of
    levenshtein_verify): score rank-consecutive pairs of the top-100
    vocabulary plus each top-20 token against its reverse, with the pure-
    Python jaro_winkler above, pinned cell-for-cell against DuckDB's
    RapidFuzz-backed jaro_winkler_similarity.  The pair table here is
    dim-sized by construction (it verifies the KERNEL); at scale the same
    function runs inside fingerprint-blocked map_groups exactly like the
    levenshtein verify stage."""
    from .q_text import q_vocab_topk  # explicit cross-family dep
    top = q_vocab_topk(sf_dir, k=100).to_pandas()["token"].tolist()
    pairs = list(zip(top, top[1:])) + [(t, t[::-1]) for t in top[:20]]
    ds = ray.data.from_items([{"tok_a": a, "tok_b": b} for a, b in pairs])

    def score(b: pa.Table) -> pa.Table:
        al = b.column("tok_a").to_pylist()
        bl = b.column("tok_b").to_pylist()
        return pa.table(
            {
                "tok_a": b.column("tok_a"),
                "tok_b": b.column("tok_b"),
                "jw": pa.array(
                    [float(_r(jaro_winkler(x, y), 6)) for x, y in zip(al, bl)],
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort(["tok_a", "tok_b"])


def q_closeness_harmonic(sf_dir: str):
    """Closeness and harmonic centrality per node from the same
    synchronized all-source BFS as q_eccentricity (one shared wave
    machinery, three centralities) — closeness = n_reachable / sum(d)
    (0 when isolated), harmonic = sum(1/d) which stays well-defined on
    disconnected graphs.  Completes the standard centrality set next to
    degree / PageRank / HITS / Katz / betweenness / eccentricity.
    Rounded 6dp; the SQL mirror folds the identical expressions from the
    same recursive-CTE distance table."""
    dist_of = _all_pairs_bfs(sf_dir)
    rows = []
    for s in range(50):
        ds = [v for k, v in dist_of[s].items() if k != s]
        sum_d = sum(ds)
        rows.append(
            {
                "node": s,
                "closeness": float(_r(len(ds) * 1.0 / sum_d, 6)) if sum_d else 0.0,
                "harmonic": float(_r(sum(1.0 / v for v in sorted(ds)), 6)),
            }
        )
    return pd.DataFrame(rows).sort_values("node").reset_index(drop=True)


def q_compression_ratio(sf_dir: str):
    """Per-doc zlib compression ratio (compressed/raw bytes, level 6) —
    the cheap information-density quality signal web-text pipelines cut
    on (boilerplate and generated spam compress far below natural text;
    cf. the gzip filters in CCNet-style curation).  One embarrassingly-
    parallel map_batches; deterministic given the pinned zlib level, and
    pinned in tests/test_textstats_multimodal.py (no SQL mirror — DuckDB
    exposes no zlib)."""
    import zlib

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ratio(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        texts = b.column("text").to_pylist()
        nb, rt = [], []
        for t in texts:
            raw = t.encode("utf-8")
            nb.append(len(raw))
            rt.append(
                float(_r(len(zlib.compress(raw, 6)) * 1.0 / max(1, len(raw)), 6))
            )
        return pa.table(
            {
                "doc_id": ids,
                "n_bytes": pa.array(nb, pa.int64()),
                "gz_ratio": pa.array(rt, pa.float64()),
            }
        )

    return docs.map_batches(ratio, batch_format="pyarrow").sort("doc_id")


def q_wasserstein_drift(sf_dir: str):
    """Per-source 1-Wasserstein (earth-mover) distance between the
    source's doc-length distribution and the rest of the corpus — the
    integral companion to ks_drift's max statistic (KS flags ANY CDF gap;
    W1 weights gaps by how much length-mass actually has to move, so it
    ranks drifts by cost).  Same machinery as ks_drift: two combiner
    groupbys produce the distinct-value count grid, then W1 = sum over
    consecutive grid values of |F_src - F_rest| * gap — identical
    count-ratio doubles on both sides, rounded 4dp."""
    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def cells(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pandas(),
                "v": b.column("n_chars").to_numpy(),
            }
        )
        g = df.groupby(["source", "v"]).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    sv = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    gv = sv.groupby("v", as_index=False)["c"].sum().rename(columns={"c": "cg"})
    gv = gv.sort_values("v").reset_index(drop=True)
    gv["cumg"] = gv["cg"].cumsum()
    ng = int(gv["cg"].sum())
    cumg = dict(zip(gv["v"], gv["cumg"]))
    vals = gv["v"].tolist()
    rows = []
    for src, g in sv.groupby("source", sort=True):
        n = int(g["c"].sum())
        own = dict(zip(g["v"], g["c"]))
        co = 0
        w1 = 0.0
        for v, nxt in zip(vals, vals[1:]):
            co += own.get(v, 0)
            cr = cumg[v] - co
            w1 += abs(co / n - cr / (ng - n)) * (nxt - v)
        rows.append((src, n, float(_r(w1, 4))))
    return pd.DataFrame(rows, columns=["source", "n", "w1"]).astype({"n": "int64"})


def q_percentile_interp(sf_dir: str):
    """Per-event-type INTERPOLATED p50/p90/p99 of value (type-7 /
    quantile_cont semantics) — the tail-latency-style percentile every
    dashboard quotes, where q_event_value_quantiles' exact-rank pluck
    deliberately avoids interpolation.  Shape: see
    _group_interp_quantiles; the O(types x 3) table is driver-side."""
    qs = (0.5, 0.9, 0.99)
    vals = _group_interp_quantiles(sf_dir, qs)
    rows = [
        (t, q, float(_r(v, 6))) for (t, q), v in sorted(vals.items())
    ]
    return pd.DataFrame(rows, columns=["event_type", "q", "p"])

__all__ = [
    "q_outflow_sum",
    "q_self_repetition",
    "q_unigram_logprob",
    "q_binary_meta",
    "q_enrich_3way",
    "q_image_decode",
    "q_audio_decode",
    "q_image_resize",
    "q_postings_build",
    "q_latest_event",
    "q_zlib_ratio",
    "q_hist_quantiles",
    "q_running_total",
    "q_span_merge",
    "q_funnel_steps",
    "q_heavy_hitters",
    "q_nb_classify",
    "q_event_interarrival",
    "q_link_reciprocity",
    "q_length_zscore",
    "q_pca_power",
    "q_winsorize",
    "q_csv_roundtrip",
    "q_pivot_counts",
    "q_corr_matrix",
    "q_hard_negatives",
    "q_rare_category_merge",
    "q_curriculum_order",
    "q_group_percentiles",
    "q_dist_divergence",
    "q_event_transitions",
    "q_link_locality",
    "q_dup_rate_by_source",
    "q_event_value_quantiles",
    "q_cross_source_overlap",
    "q_monthly_revenue_delta",
    "q_daily_top_users",
    "q_cluster_size_histogram",
    "q_levenshtein_verify",
    "q_schema_profile",
    "q_label_centroid_distance",
    "q_retention_cohorts",
    "q_event_runs",
    "q_mad_outliers",
    "q_oov_rate",
    "q_max_drawdown",
    "q_distinctive_terms",
    "q_ks_drift",
    "q_ols_fit",
    "q_new_users_daily",
    "q_mi_lang_source",
    "q_skipgram_counts",
    "q_welch_ttest",
    "q_silhouette_simplified",
    "q_rate_limit_offenders",
    "q_session_stats",
    "q_association_rules",
    "q_trimmed_mean",
    "q_stationary_distribution",
    "q_ipf_raking",
    "q_rrf_fusion",
    "q_chi2_lang_source",
    "q_clustering_coefficient",
    "q_score_calibration",
    "q_anova_f",
    "q_trigram_transitions",
    "q_decayed_user_scores",
    "q_touch_attribution",
    "q_scc_pivot",
    "q_bowtie",
    "q_grouped_mode",
    "q_weighted_median",
    "q_proportion_ztest",
    "q_peak_concurrency",
    "q_length_gini",
    "q_heaps_law",
    "q_term_burstiness",
    "q_winnowing",
    "q_pareto_skyline",
    "q_bootstrap_ci",
    "q_covisitation",
    "q_jaro_winkler_verify",
    "q_closeness_harmonic",
    "q_compression_ratio",
    "q_wasserstein_drift",
    "q_percentile_interp",
]
