"""Curation query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_filter_project(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"],
        filter=(pc.field("l_quantity") > 45) & (pc.field("l_discount") < 0.05),
    )

    def _proj(b: pa.Table) -> pa.Table:
        b = b.select(["l_orderkey", "l_linenumber", "l_extendedprice"])
        return _round_col(b, "l_extendedprice", 2)

    return ds.map_batches(_proj, batch_format="pyarrow").sort(["l_orderkey", "l_linenumber"])


def q_hash_sample(sf_dir: str, pct: int = 10):
    """Deterministic hash-based sampling (eval-split / subsample primitive):
    keep doc iff md5_low64(doc_id) % 100 < pct.  Reproducible across runs,
    cluster sizes and partitionings (pure per-row filter, no shuffle, no
    RNG state), unlike ``Dataset.random_sample``."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        mask = pa.array([_stable_h64(str(i)) % 100 < pct for i in ids], pa.bool_())
        return b.filter(mask)

    return docs.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def q_pii_redact(sf_dir: str):
    """PII redaction over text — the scrub stage every web-text training
    pipeline runs before tokenization.  Because the synthetic corpus
    contains no organic PII, both the query and its SQL mirror append the
    same deterministic contact line (email + ipv4 + phone derived from
    doc_id) so the oracle exercises real replacements, not a no-op.  Fully
    vectorized: the three regex passes run as pyarrow RE2 kernels over the
    whole column; no Python-level per-row regex."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        texts = b.column("text").to_pylist()
        full = pa.array(
            [
                f"{t} contact user{d}@mail.example ip 10.0.{d % 256}.{d // 256 % 256}"
                f" tel 555-{d % 1000:03d}-0199"
                for t, d in zip(texts, ids)
            ],
            pa.string(),
        )
        n_pii = np.zeros(len(texts), dtype=np.int64)
        for pat, rep in _PII_PATTERNS:
            n_pii += pc.count_substring_regex(full, pat).to_numpy(zero_copy_only=False)
            full = pc.replace_substring_regex(full, pat, rep)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "clean": full,
                "n_pii": pa.array(n_pii, pa.int64()),
            }
        )

    return docs.map_batches(scrub, batch_format="pyarrow").sort("doc_id")


def q_gopher_quality(sf_dir: str):
    """Gopher-style repetition/quality filter rules (Rae et al. 2021,
    §A1.1): per-doc word count, mean word length, distinct-word fraction
    and top-bigram fraction, plus the combined keep/drop verdict.  All
    metrics are per-row token statistics — a pure map stage, no shuffle;
    thresholds are evaluated on the raw doubles (identical to the SQL
    mirror) and only the OUTPUT columns are rounded."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rules(b: pa.Table) -> pa.Table:
        n_l, mwl_l, uq_l, top_l, keep_l = [], [], [], [], []
        for t in b.column("text").to_pylist():
            n, mwl, uq, top, keep = _gopher_stats(_oracle_tokens(t))
            n_l.append(n)
            mwl_l.append(mwl)
            uq_l.append(uq)
            top_l.append(top)
            keep_l.append(keep)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_words": pa.array(n_l, pa.int64()),
                "mean_word_len": pa.array(_r(mwl_l, 6), pa.float64()),
                "uniq_frac": pa.array(_r(uq_l, 6), pa.float64()),
                "top_bigram_frac": pa.array(_r(top_l, 6), pa.float64()),
                "keep": pa.array(keep_l, pa.int64()),
            }
        )

    return docs.map_batches(rules, batch_format="pyarrow").sort("doc_id")


def q_decontaminate(sf_dir: str, n: int = 4, mod: int = 97):
    """Benchmark decontamination: the held-out split (md5(doc_id) % 97 == 0,
    the eval-set stand-in) contributes a distinct-4-gram blocklist; every
    training doc reports how many of its 4-gram positions hit the blocklist
    and whether it is contaminated at all.  Shape: pass 1 reduces the test
    split to a gram set (bounded by the EVAL set's size — decontamination
    lists are benchmark-scale, not corpus-scale) broadcast once via
    ray.put; pass 2 is a pure map over the training split.  If the eval
    side ever outgrew a broadcast, the fallback is the dup-span shuffle
    shape (q_dup_span_fraction): emit (gram, doc) rows and groupby(gram)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..stages.dedup import _stable_h64

    ref = _eval_blocklist(docs, n, mod)

    def flag(b: pa.Table) -> pa.Table:
        bl = _bcast_get(ref)  # one object-store read per worker
        ids, hits = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                continue
            toks = re.findall(r"\S+", t)
            ids.append(d)
            hits.append(int(_gram_hits(toks, n, bl).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array([int(h > 0) for h in hits], pa.int64()),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow").sort("doc_id")


def q_pack_sequences(sf_dir: str, budget: int = 256, bucket: int = 64):
    """Sequence packing for training: concatenate docs in doc_id order and
    chunk the token stream into fixed ``budget``-token sequences; each doc
    is assigned the sequence where its first token lands (concat-then-chunk
    packing).  The global prefix sum is distributed: bucket docs by
    doc_id // bucket, pass 1 reduces per-bucket token totals (tiny — one
    row per bucket) so the driver computes exclusive bucket offsets, pass 2
    finishes the cumsum inside groupby(bucket).map_groups.  At 10^10 docs
    raise ``bucket`` so the offset table stays driver-sized; no stage ever
    holds more than one bucket of rows."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tk(b: pa.Table) -> pa.Table:
        n = np.array(
            [len(_oracle_tokens(t)) for t in b.column("text").to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {"doc_id": b.column("doc_id"), "n_tokens": pa.array(n, pa.int64())}
        )

    return _assign_seq_ids(
        docs.map_batches(tk, batch_format="pyarrow"), budget=budget, bucket=bucket
    )


def q_curation_pipeline(sf_dir: str, budget: int = 256, bucket: int = 64):
    """The end-to-end training-data curation flagship, composed from the
    individual operators' semantics in pipeline order:

      1. Gopher quality rules (q_gopher_quality thresholds) — drop
         low-quality docs;
      2. held-out split removal + 4-gram decontamination
         (q_decontaminate's blocklist) — drop eval docs and anything
         sharing a 4-gram with them;
      3. exact lede dedup — among the docs that reached this stage, keep
         the lowest doc_id per first-4-token fingerprint (boilerplate
         lede collisions are the realistic exact-dup mode in web text);
      4. sequence packing (q_pack_sequences) over the survivors.

    Everything is one tokenize pass per doc plus the blocklist reduction;
    dedup groups by the lede string (tiny groups); packing reuses the
    distributed prefix-sum helper.  The SQL mirror replays the exact same
    four stages, so the oracle pins the STAGE ORDER, not just each stage."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_gram, mod = 4, 97
    bl_ref = _eval_blocklist(docs, n_gram, mod)

    def gate(b: pa.Table) -> pa.Table:
        bl = _bcast_get(bl_ref)  # one object-store read per worker
        ids, ns, fps = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                continue  # held-out split never trains
            toks = _oracle_tokens(t)
            n = len(toks)
            if not _gopher_stats(toks)[4]:
                continue
            if _gram_hits(toks, n_gram, bl).any():  # hashed-gram probe
                continue
            ids.append(d)
            ns.append(n)
            fps.append(" ".join(toks[:4]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
                "fp": pa.array(fps, pa.string()),
            }
        )

    def first_of_lede(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values("doc_id")
        keep = df.iloc[:1]
        return pa.table(
            {
                "doc_id": pa.array(keep["doc_id"].to_numpy(), pa.int64()),
                "n_tokens": pa.array(keep["n_tokens"].to_numpy(), pa.int64()),
            }
        )

    survivors = (
        docs.map_batches(gate, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(first_of_lede, batch_format="pyarrow")
    )
    return _assign_seq_ids(survivors, budget=budget, bucket=bucket)


def q_pretrain_mix(sf_dir: str, budget: int = 256, bucket: int = 64, n_buckets: int = 64):
    """The second composed flagship: the SAMPLING half of pretraining-data
    assembly (the curation_pipeline covers the scrub/dedup half):

      1. held-out split removal (md5(doc_id) % 97 == 0 never trains);
      2. Gopher quality rules (q_gopher_quality thresholds);
      3. 4-gram eval-set decontamination (q_decontaminate's blocklist);
      4. DSIR selection — keep docs whose importance weight (rounded 6dp,
         exactly q_dsir_weights) is positive, i.e. more target-like than
         the raw corpus;
      5. sequence packing (q_pack_sequences) over the selected docs.

    One tokenize pass per doc; the DSIR table and blocklist are two small
    broadcast reductions; packing reuses the distributed prefix-sum
    helper.  The SQL mirror replays all five stages, so the oracle pins
    the composition order."""
    from ..stages.dedup import _stable_h64

    full = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    n_gram, mod = 4, 97
    bl_ref = _eval_blocklist(full, n_gram, mod)
    lnr_ref = _dsir_lnr_ref(full, n_buckets)
    tok_buckets = _dsir_tok_buckets(n_buckets)

    def gate(b: pa.Table) -> pa.Table:
        bl = _bcast_get(bl_ref)
        lnr = _bcast_get(lnr_ref)
        ids, ns = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                continue  # held-out split never trains
            toks = _oracle_tokens(t)
            if not _gopher_stats(toks)[4]:
                continue
            if _gram_hits(toks, n_gram, bl).any():  # hashed-gram probe
                continue
            bk = tok_buckets(toks)
            if _r([float(lnr[bk].sum() / len(bk))], 6)[0] <= 0:
                continue
            ids.append(d)
            ns.append(len(toks))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
            }
        )

    selected = full.map_batches(gate, batch_format="pyarrow")
    return _assign_seq_ids(selected, budget=budget, bucket=bucket)


def q_split_assign(sf_dir: str):
    """Stratified corpus splitting: every doc hashes into train/val/test
    (80/10/10, md5-mod — reproducible across runs and partitionings); the
    output is the per-(lang, split) contingency table that a pipeline
    checks stratification with.  Combiner shape: batches reduce to partial
    (lang, split, n) counts before the tiny groupby."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def assign(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for d, lang in zip(b.column("doc_id").to_pylist(), b.column("lang").to_pylist()):
            h = _stable_h64(str(d)) % 100
            split = "train" if h < 80 else ("val" if h < 90 else "test")
            cnt[(lang, split)] += 1
        langs, splits, ns = [], [], []
        for (lang, split), c in cnt.items():
            langs.append(lang)
            splits.append(split)
            ns.append(c)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "split": pa.array(splits, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    out = (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby(["lang", "split"])
        .sum("n")
    )

    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(["lang", "split", "n"])

    return out.map_batches(rn, batch_format="pyarrow").sort(["lang", "split"])


def q_shuffle_rank(sf_dir: str):
    """Deterministic global training-data shuffle: every doc's position in
    the md5-keyed permutation (seeded, partitioning-independent — unlike
    ``Dataset.random_shuffle``).  The global rank is distributed the same
    way pack_sequences distributes its prefix sum: the key's top byte is
    an ORDER-PRESERVING 256-way bucket, pass 1 reduces per-bucket counts
    so the driver computes exclusive offsets, pass 2 finishes with an
    in-bucket argsort.  At 10^10 docs widen to the top two bytes."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        keys = np.array(
            [_stable_h64(f"{d}:shuffle") for d in ids], dtype=np.uint64
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "key": pa.array(keys, pa.uint64()),
                "bkt": pa.array((keys >> np.uint64(56)).astype(np.int64), pa.int64()),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = keyed_ds.groupby("bkt").count().to_pandas().sort_values("bkt")
    offsets = dict(
        zip(bc["bkt"].astype(int), bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)

    def rank(b: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = b.to_pandas().sort_values(["key", "doc_id"]).reset_index(drop=True)
        base = off[int(df["bkt"].iloc[0])]
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "pos": pa.array(base + np.arange(len(df), dtype=np.int64), pa.int64()),
            }
        )

    return (
        keyed_ds.groupby("bkt").map_groups(rank, batch_format="pyarrow").sort("doc_id")
    )


def q_quality_score(sf_dir: str):
    """Quality heuristics: token count, mean token length, stopword ratio."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        toks_all = [re.findall(r"\S+", t) for t in b.column("text").to_pylist()]
        n_tokens = [len(ts) for ts in toks_all]
        mean_len = [
            float(_r(sum(len(w) for w in ts) / len(ts), 4)) if ts else 0.0 for ts in toks_all
        ]
        stop_ratio = [
            float(_r(sum(1 for w in ts if w in _STOPWORDS) / len(ts), 4)) if ts else 0.0
            for ts in toks_all
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "mean_token_len": pa.array(mean_len, pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_decontaminate_fuzzy(sf_dir: str):
    """NEAR-duplicate eval-set decontamination — the fuzzy complement of
    the exact n-gram `decontaminate` op: a training doc is contaminated if
    it shares ANY MinHash-LSH band bucket with an eval doc (eval set =
    doc_id % 17 == 0).  One band shuffle marks contaminated ids inside
    each (band, bucket) group; survivors come from a distributed LEFT
    hash_join against the contaminated set (match → dropped), so neither
    the corpus nor the contaminated set is ever driver-side."""
    from ..stages.dedup import MinHashBands, MinHasher
    from ..stages.joins import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bands = docs.map_batches(_cached_stage(MinHasher), batch_format="pyarrow").map_batches(
        _cached_stage(MinHashBands), batch_format="pyarrow"
    )

    def contaminated_of(g: pa.Table) -> pa.Table:
        ids = np.asarray(g.column("doc_id").to_pylist(), dtype=np.int64)
        is_eval = ids % 17 == 0
        out = np.unique(ids[~is_eval]) if is_eval.any() else np.array([], dtype=np.int64)
        return pa.table({"bad_id": pa.array(out, pa.int64())})

    contaminated = (
        bands.groupby(["band_id", "bucket"])
        .map_groups(contaminated_of, batch_format="pyarrow")
        .groupby("bad_id")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column("hit", pa.array([1] * b.num_rows, pa.int64())),
            batch_format="pyarrow",
        )
    )

    # training candidates = non-eval docs
    def non_eval(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.select(["doc_id"]).filter(pa.array(ids % 17 != 0))

    train = docs.map_batches(non_eval, batch_format="pyarrow")
    marked = hash_join(train, contaminated, key="doc_id", right_key="bad_id", how="left")
    survivors = marked.map_batches(
        lambda b: b.select(["doc_id"]).filter(pc.is_null(b.column("hit"))),
        batch_format="pyarrow",
    )
    return survivors.sort("doc_id")


def q_dsir_weights(sf_dir: str, n_buckets: int = 64):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-doc mean
    log-likelihood ratio between a hashed-unigram target distribution
    (here: the ``lang='en'`` slice) and the raw corpus distribution, with
    Laplace smoothing.  Pass 1 reduces the corpus to two B-bucket count
    vectors (B=64 — KBs, broadcast via ray.put); pass 2 is a pure
    vectorized map.  Token -> bucket uses the md5-low-64 hash so the SQL
    mirror (md5_number_lower(token) % B) is bit-identical."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ref = _dsir_lnr_ref(docs, n_buckets)
    tok_buckets = _dsir_tok_buckets(n_buckets)

    def score(b: pa.Table) -> pa.Table:
        table = _bcast_get(ref)
        ids, ws = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            bk = tok_buckets(_oracle_tokens(t))
            ws.append(float(table[bk].sum() / len(bk)))
            ids.append(d)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dsir_weight": pa.array(_r(ws, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_dsir_resample(sf_dir: str, k: int = 100):
    """The resampling half of DSIR: weighted sampling WITHOUT replacement
    of k docs proportional to the importance ratio exp(dsir_weight), via
    Efraimidis-Spirakis A-Res keys (key = ln(u)/w, u deterministic from
    md5(doc_id)) — one map to key every doc, one distributed top-k; no
    driver-side corpus.  Rounding the weight to 6dp BEFORE exp and the key
    to 6dp BEFORE ranking makes Ray and the SQL mirror order identically."""
    import math

    from ..stages.dedup import _stable_h64

    weights = q_dsir_weights(sf_dir)

    def key(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        ws = b.column("dsir_weight").to_pylist()
        keys = []
        for d, w in zip(ids, ws):
            u = (_stable_h64(f"{d}:es") % 9007199254740992) / 9007199254740992.0
            keys.append(math.log(u) / math.exp(w))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "es_key": pa.array(_r(keys, 6), pa.float64()),
            }
        )

    keyed = weights.map_batches(key, batch_format="pyarrow")
    # distributed top-k; the k survivors are a small result, so ranking
    # happens on the collected table (k rows, not the corpus)
    top = keyed.sort(["es_key", "doc_id"], descending=[True, False]).limit(k)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    order = pc.sort_indices(
        t, sort_keys=[("es_key", "descending"), ("doc_id", "ascending")]
    )
    t = t.take(order)
    return t.append_column("rank", pa.array(np.arange(1, t.num_rows + 1), pa.int64()))


def q_frame_sample(sf_dir: str):
    """Video frame sampling plumbing: concatenated fake frames -> one row
    per sampled frame (1->N explosion, stages/multimodal.py)."""
    from ..stages.multimodal import FrameSampleStage, make_fake_image

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        vids = []
        for d in ids:
            n_frames = 2 + int(d) % 4
            vids.append(b"".join(make_fake_image(4, 4, 3, seed=int(d) * 10 + f) for f in range(n_frames)))
        return pa.table(
            {
                "video_id": pa.array(ids, pa.int64()),
                "video": pa.array(vids, pa.binary()),
            }
        )

    return (
        docs.map_batches(synth, batch_format="pyarrow", batch_size=64)
        .map_batches(
            FrameSampleStage,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
            fn_constructor_kwargs={"codec": "fake", "every": 2},
        )
        .sort(["video_id", "frame_index"])
    )


def q_stratified_sample(sf_dir: str):
    """Language-stratified subsampling (corpus-mix reweighting): each doc is
    kept iff md5_low64(doc_id) % 100 < rate[lang] — per-stratum rates, one
    shared deterministic hash coin.  Pure per-row filter: no shuffle, no RNG
    state, identical output under any partitioning / cluster size, and the
    realized per-language proportions converge to the rate table at scale."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        langs = b.column("lang").to_pylist()
        mask = pa.array(
            [
                _stable_h64(str(i)) % 100 < _STRATA_RATES.get(lg, 10)
                for i, lg in zip(ids, langs)
            ],
            pa.bool_(),
        )
        return b.filter(mask)

    return docs.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def q_c4_filter(sf_dir: str):
    """C4-style line-level cleaning (Raffel et al. 2020): per line keep
    only >=5-word sentences with terminal punctuation and without the
    javascript / curly-brace / lorem-ipsum markers; per doc report line
    counts, surviving word count, the cleaned text, and the >=2-kept-lines
    doc verdict.  Pure per-row map — no shuffle; the line loop is over the
    ~6 synthesized lines per doc, not the corpus."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def clean(b: pa.Table) -> pa.Table:
        n_lines, n_kept, kept_words, cleans, keeps = [], [], [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            lines = _c4_lines(d, t)
            kept = [l for l in lines if _c4_line_kept(l)]
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            kept_words.append(sum(len(re.findall(r"\S+", l)) for l in kept))
            cleans.append("\n".join(kept))
            keeps.append(int(len(kept) >= 2))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "kept_words": pa.array(kept_words, pa.int64()),
                "clean": pa.array(cleans, pa.string()),
                "keep": pa.array(keeps, pa.int64()),
            }
        )

    return docs.map_batches(clean, batch_format="pyarrow").sort("doc_id")


def q_boilerplate_lines(sf_dir: str, min_docs: int = 10):
    """CCNet-style corpus-wide boilerplate removal: a line is boilerplate
    when its exact text occurs in >= min_docs documents; drop those lines,
    keep the rest in order.  Distributed shape: flat-map to (doc_id, line,
    ord) rows, per-batch partial line counts, one small groupby to total
    them, then the frequent-line set (bounded by total_lines/min_docs and
    in practice tiny — nav/footer vocab) is broadcast via ray.put and the
    drop is a per-row map.  At a scale where the frequent set itself is
    huge, swap the broadcast for stages.joins.hash_join on line — same
    downstream; the broadcast is the documented fast path."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_lines(b: pa.Table) -> pa.Table:
        ids, lns, ords = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            for j, l in enumerate(_c4_lines(d, t)):
                ids.append(d)
                lns.append(l)
                ords.append(j)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "line": pa.array(lns, pa.string()),
                "ord": pa.array(ords, pa.int64()),
            }
        )

    lines = docs.map_batches(to_lines, batch_format="pyarrow")

    # partial per-batch counts -> one small groupby (combiner pattern)
    def partial_counts(b: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter(b.column("line").to_pylist())
        return pa.table(
            {
                "line": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        lines.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("line")
        .aggregate(Sum("c", alias_name="n"))
    )
    frequent = set(
        counts.filter(lambda r: r["n"] >= min_docs).to_pandas()["line"]
    )
    freq_ref = ray.put(frequent)

    def strip(b: pa.Table) -> pa.Table:
        boiler = ray.get(freq_ref)
        out_id, out_nb, out_clean = [], [], []
        # rows arrive grouped per doc from to_lines; re-group defensively
        import collections

        per_doc: dict = collections.defaultdict(list)
        for d, l, o in zip(
            b.column("doc_id").to_pylist(),
            b.column("line").to_pylist(),
            b.column("ord").to_pylist(),
        ):
            per_doc[d].append((o, l))
        for d, ls in per_doc.items():
            ls.sort()
            kept = [l for _, l in ls if l not in boiler]
            out_id.append(d)
            out_nb.append(len(ls) - len(kept))
            out_clean.append("\n".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_boiler": pa.array(out_nb, pa.int64()),
                "clean": pa.array(out_clean, pa.string()),
            }
        )

    return lines.map_batches(strip, batch_format="pyarrow").sort("doc_id")


def q_mix_proportions(sf_dir: str):
    """Corpus mixing to target source weights (the "20% wiki / 80% web"
    pretraining-mix step): given per-source target fractions, compute the
    LARGEST feasible corpus C = min_s(count_s / frac_s) with no source
    oversampled, then admit each doc by deterministic hash coin at rate
    frac_s * C / count_s.  Two tiny all-to-alls (per-batch partial counts
    -> small groupby; rates broadcast back via ray.put); the admit itself
    is a pure per-row filter, so the corpus never re-shuffles.  Targets:
    even-numbered sources 3x the weight of odd (renormalized)."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def partial(b: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter(b.column("source").to_pylist())
        return pa.table(
            {
                "source": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
    )

    def _weight(src: str) -> float:
        return 3.0 if int(src[3:]) % 2 == 0 else 1.0

    w = counts["source"].map(_weight)
    frac = w / w.sum()
    cap = float((counts["n"] / frac).min())
    rates = {
        s: min(1.0, f * cap / n)
        for s, f, n in zip(counts["source"], frac, counts["n"])
    }
    rates_ref = ray.put(rates)

    def admit(b: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        keep = [
            (_stable_h64(str(d)) % 10_000) / 10_000.0 < r[s]
            for d, s in zip(b.column("doc_id").to_pylist(), b.column("source").to_pylist())
        ]
        t = b.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
            }
        )

    return docs.map_batches(admit, batch_format="pyarrow").sort("doc_id")


def q_badwords_filter(sf_dir: str):
    """Multi-pattern substring blocklist filter (the bad-words /
    fineweb-style curation gate): for every doc, how many blocklist
    patterns occur as raw substrings, plus the lexicographically first
    match.  One vectorized ``pc.match_substring`` kernel pass per pattern
    over the Arrow column — O(P) passes, zero Python per row; at P in the
    thousands the same stage swaps to an Aho-Corasick automaton built once
    per actor (__init__), the plumbing is identical."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pats = sorted(BADWORDS)

    def scan(b: pa.Table) -> pa.Table:
        text = b.column("text")
        hit = np.zeros((b.num_rows, len(pats)), dtype=bool)
        for j, p in enumerate(pats):
            hit[:, j] = pc.match_substring(text, p).to_numpy(zero_copy_only=False)
        n = hit.sum(axis=1).astype(np.int64)
        first_idx = np.where(n > 0, hit.argmax(axis=1), -1)
        first = [pats[i] if i >= 0 else None for i in first_idx]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_matched": pa.array(n, pa.int64()),
                "first_pat": pa.array(first, pa.string()),
                "flagged": pa.array((n > 0).astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow").sort("doc_id")


def q_mix_temperature(sf_dir: str, alpha: float = 0.5, total: int = 200):
    """Temperature-scaled source mixing (the multilingual-pretraining
    sampling rule: p_s proportional to n_s^alpha flattens the source
    distribution): each source's quota is floor(total * p_s), filled with
    the quota docs holding the smallest (md5(doc_id), doc_id) keys —
    deterministic, seedless, partitioning-independent.  The source-count
    table is category-sized (driver math for the quotas); the selection
    itself is the host_cap combiner shape: every batch pre-reduces to at
    most quota rows per source it contains, so the groupby moves
    O(quota x sources) rows."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def cells(b: pa.Table) -> pa.Table:
        return b.group_by("source").aggregate([([], "count_all")])

    counts = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .sum("count_all")
        .to_pandas()
        .rename(columns={"sum(count_all)": "n"})
        .sort_values("source")
    )
    # integer-exact quota math (identical on both sides, no float-sum
    # order sensitivity at the floor boundary): w_s = floor(n_s^alpha *
    # 1e6) as an int, z = sum(w), quota_s = (total * w_s) // z
    import math

    w = {
        s: int(math.floor(float(nv) ** alpha * 1_000_000))
        for s, nv in zip(counts["source"], counts["n"])
    }
    z = sum(w.values())
    quota = {s: (total * wv) // z for s, wv in w.items()}
    quota_ref = ray.put(quota)

    def pick(df: pd.DataFrame, q: dict) -> pd.DataFrame:
        df = df.copy()
        df["k"] = [hashlib.md5(str(d).encode()).hexdigest() for d in df["doc_id"]]
        df = df.sort_values(["k", "doc_id"])
        rn = df.groupby("source").cumcount()
        lim = df["source"].map(lambda s: q.get(s, 0)).to_numpy()
        return df[rn.to_numpy() < lim]

    def cap_batch(b: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        kept = pick(b.to_pandas(), q)
        return pa.table(
            {
                "doc_id": pa.array(kept["doc_id"].to_numpy(), pa.int64()),
                "source": pa.array(kept["source"], pa.string()),
            }
        )

    def finalize(g: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        kept = pick(g.to_pandas(), q)
        return pa.table(
            {
                "doc_id": pa.array(kept["doc_id"].to_numpy(), pa.int64()),
                "source": pa.array(kept["source"], pa.string()),
            }
        )

    return (
        docs.map_batches(cap_batch, batch_format="pyarrow")
        .groupby("source")
        .map_groups(finalize, batch_format="pyarrow")
        .sort("doc_id")
    )


def q_nonedge_sample(sf_dir: str, probes: int = 8, k: int = 4):
    """Negative sampling for link prediction: per page, up to ``k``
    deterministic pseudo-random NON-neighbors (candidates that are real
    out-edges are anti-joined away) — the negative-pair generator a
    graph-embedding trainer needs.  Probe ``j`` of node ``d`` is
    md5_low64('d:j') % n (seedless, partitioning-independent).  The
    anti-join is one tagged-union groupby over (src, dst): candidate rows
    and edge rows co-group, and a group survives only if no edge row is
    present — no broadcast of the edge set, both sides shuffle once by
    the same key.  Survivors keep the smallest probe indices per node
    via the host_cap combiner shape."""
    from ..stages.dedup import _stable_h64

    edges = _link_edges(sf_dir)
    n = _read(sf_dir, "documents", columns=["doc_id"]).count()

    def candidates(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        src, probe, dst = [], [], []
        for d in ids:
            for j in range(probes):
                c = _stable_h64(f"{d}:{j}") % n
                if c != d:
                    src.append(d)
                    probe.append(j)
                    dst.append(c)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "probe": pa.array(probe, pa.int64()),
                "is_edge": pa.array([0] * len(src), pa.int64()),
            }
        )

    cand = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        candidates, batch_format="pyarrow"
    )
    edge_rows = edges.map_batches(
        lambda b: pa.table(
            {
                "src": b.column("src"),
                "dst": b.column("dst"),
                "probe": pa.array([-1] * b.num_rows, pa.int64()),
                "is_edge": pa.array([1] * b.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def survivors(g: pa.Table) -> pa.Table:
        # one (src, dst) group: candidates survive only edge-free groups
        if pc.sum(g.column("is_edge")).as_py():
            return g.slice(0, 0).select(["src", "dst", "probe"])
        return g.filter(pc.equal(g.column("is_edge"), 0)).select(
            ["src", "dst", "probe"]
        )

    surv = cand.union(edge_rows).groupby(["src", "dst"]).map_groups(
        survivors, batch_format="pyarrow"
    )

    def cap(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["probe", "dst"])
        rn = df.groupby("src").cumcount()
        return pa.Table.from_pandas(
            df[rn.to_numpy() < k], preserve_index=False
        ).select(["src", "dst", "probe"])

    return (
        surv.map_batches(cap, batch_format="pyarrow")
        .groupby("src")
        .map_groups(cap, batch_format="pyarrow")
        .sort(["src", "probe"])
    )


def q_quality_blend(sf_dir: str):
    """FineWeb-style blended quality score: percentile-normalize two
    signals (doc length, unique-token ratio) across the corpus and take
    their equal-weight mix, keep iff blend >= 0.5.  Percentile
    normalization is the part that doesn't trivially distribute — here
    each signal reduces to a distinct-value histogram (value, count) via a
    combiner groupby, the driver turns cumulative counts into
    strictly-less ranks (percent_rank = less/(N-1), the min-rank tie rule)
    and broadcasts the two O(distinct) maps; pass 2 scores docs in place.
    At unbounded value cardinality the order-preserving bucketed two-pass
    rank of q_group_percentiles replaces the histogram; the shape is
    otherwise identical."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def sig(b: pa.Table) -> pa.Table:
        toks = [_oracle_tokens(t) for t in b.column("text").to_pylist()]
        uniq = [len(set(ts)) / len(ts) for ts in toks]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
                "uniq": pa.array(uniq, pa.float64()),
            }
        )

    sigs = docs.map_batches(sig, batch_format="pyarrow")

    def hist(col):
        def f(b: pa.Table) -> pa.Table:
            df = b.to_pandas().groupby(col, as_index=False).size().rename(
                columns={"size": "cnt"}
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        return f

    def less_map(col) -> dict:
        h = (
            sigs.map_batches(hist(col), batch_format="pyarrow")
            .groupby(col)
            .sum("cnt")
            .to_pandas()
            .sort_values(col)
            .reset_index(drop=True)
        )
        cum = h["sum(cnt)"].cumsum().to_numpy()
        less = np.concatenate([[0], cum[:-1]])
        return dict(zip(h[col], less.astype(np.int64))), int(cum[-1])

    m1, n_total = less_map("n_chars")
    m2, _ = less_map("uniq")
    denom = float(n_total - 1) if n_total > 1 else 1.0
    maps_ref = ray.put((m1, m2, denom))

    def score(b: pa.Table) -> pa.Table:
        mm1, mm2, dn = ray.get(maps_ref)
        df = b.to_pandas()
        p1 = df["n_chars"].map(mm1).to_numpy(dtype=np.float64) / dn
        p2 = df["uniq"].map(mm2).to_numpy(dtype=np.float64) / dn
        blend = _r(0.5 * p1 + 0.5 * p2, 6)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"], pa.int64()),
                "blend": pa.array(blend, pa.float64()),
                "keep": pa.array((blend >= 0.5).astype(np.int64), pa.int64()),
            }
        )

    return sigs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_quality_token_tradeoff(sf_dir: str):
    """Quality-cutoff yield curve: bucket docs by blended-quality decile
    (q_quality_blend's score) and report docs + tokens per decile — the
    table that says how much training data each quality threshold costs.
    One extra column rides the same two passes as quality_blend (the
    tokenizer already ran for the uniq signal, so token counts are free);
    only decile cells shuffle at the end."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def sig(b: pa.Table) -> pa.Table:
        toks = [_oracle_tokens(t) for t in b.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": b.column("n_chars"),
                "uniq": pa.array([len(set(ts)) / len(ts) for ts in toks], pa.float64()),
                "n_tok": pa.array([len(ts) for ts in toks], pa.int64()),
            }
        )

    sigs = docs.map_batches(sig, batch_format="pyarrow")

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
        less = np.concatenate([[0], cum[:-1]])
        return dict(zip(h[col], less.astype(np.int64))), int(cum[-1])

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
            {"decile": dec, "n_docs": 1, "total_tokens": df["n_tok"]}
        ).groupby("decile", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        sigs.map_batches(cells, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"), Sum("total_tokens", alias_name="total_tokens")
        )
        .sort("decile")
        .to_pandas()
    )
    return out.astype({"decile": "int64", "n_docs": "int64", "total_tokens": "int64"})


def q_quality_grid(sf_dir: str):
    """2-D quality scatter grid (length-bucket x unique-token-ratio bucket
    doc counts) — the heatmap behind quality-filter threshold picking.
    Pure map + cell combiner: nothing but (cell, count) rows move."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def cells(b: pa.Table) -> pa.Table:
        toks = [_oracle_tokens(t) for t in b.column("text").to_pylist()]
        uniq = np.array([len(set(ts)) / len(ts) for ts in toks])
        nc = b.column("n_chars").to_numpy()
        part = pd.DataFrame(
            {
                "len_bin": np.minimum(nc // 100, 9).astype(np.int64),
                "uniq_bin": np.minimum(np.floor(uniq * 10).astype(np.int64), 9),
                "n_docs": 1,
            }
        ).groupby(["len_bin", "uniq_bin"], as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["len_bin", "uniq_bin"])
        .sum("n_docs")
        .sort(["len_bin", "uniq_bin"])
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs"})
    )
    return out.astype({"len_bin": "int64", "uniq_bin": "int64", "n_docs": "int64"})


def q_pack_stats(sf_dir: str):
    """Packing-efficiency report over q_pack_sequences' output: sequence
    count, total tokens, and the min/mean/max tokens actually landing in
    each 256-token packing slot — the fill-rate dashboard that says how
    much padding a training run will burn.  Composition: the packed
    Dataset reduces per seq_id, then to one summary row; both aggregates
    are seq-cardinality or O(1)."""
    packed = q_pack_sequences(sf_dir)

    def per_seq(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("seq_id", as_index=False)["n_tokens"].sum().rename(
            columns={"n_tokens": "tok"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    seqs = (
        packed.map_batches(per_seq, batch_format="pyarrow")
        .groupby("seq_id")
        .sum("tok")
        .map_batches(
            lambda b: b.rename_columns(["seq_id", "tok"]), batch_format="pyarrow"
        )
    )
    agg = seqs.aggregate(
        Count(alias_name="n_seqs"),
        Sum("tok", alias_name="total_tokens"),
        Min("tok", alias_name="min_fill"),
        Max("tok", alias_name="max_fill"),
    )
    n = int(agg["n_seqs"])
    total = int(agg["total_tokens"])
    return pd.DataFrame(
        {
            "n_seqs": [n],
            "total_tokens": [total],
            "min_fill": [int(agg["min_fill"])],
            "max_fill": [int(agg["max_fill"])],
            "mean_fill": [float(_r(total / n, 6))],
        }
    )


def q_filter_ablation(sf_dir: str, n: int = 4, mod: int = 97):
    """Curation-filter ablation: the 2^4 overlap histogram of (Gopher
    keep, C4 keep, decontamination drop, exact-dup) verdicts per doc —
    the table that says which filters do unique work and which only
    re-drop what another already caught (the first question a pipeline
    owner asks before paying for a new gate).  One map pass computes
    gopher/c4/eval/fingerprint per doc with the decontamination
    blocklist broadcast; the dup flag joins the per-fingerprint min
    doc_id back via the partitioned hash_join; the final groupby folds
    to <= 16 rows."""
    from ..stages.dedup import _stable_h64
    from ..stages.joins import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bl_ref = _eval_blocklist(docs, n, mod)

    def flags(b: pa.Table) -> pa.Table:
        bl = _bcast_get(bl_ref)
        out = {"doc_id": [], "g": [], "c": [], "x": [], "fp": []}
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            out["doc_id"].append(d)
            out["g"].append(_gopher_stats(_oracle_tokens(t))[4])
            kept = [l for l in _c4_lines(d, t) if _c4_line_kept(l)]
            out["c"].append(int(len(kept) >= 2))
            if _stable_h64(str(d)) % mod == 0:
                out["x"].append(1)  # held-out doc: always dropped
            else:
                toks = re.findall(r"\S+", t)
                out["x"].append(int(_gram_hits(toks, n, bl).any()))
            out["fp"].append(hashlib.md5(t.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "g": pa.array(out["g"], pa.int64()),
                "c": pa.array(out["c"], pa.int64()),
                "x": pa.array(out["x"], pa.int64()),
                "fp": pa.array(out["fp"], pa.string()),
            }
        )

    flagged = docs.map_batches(flags, batch_format="pyarrow")
    keepers = (
        flagged.groupby("fp")
        .min("doc_id")
        .map_batches(
            lambda b: b.rename_columns(["fp", "keep_id"]), batch_format="pyarrow"
        )
    )
    joined = hash_join(flagged, keepers, key="fp", how="inner")

    def pattern(b: pa.Table) -> pa.Table:
        dup = (
            b.column("doc_id").to_numpy() != b.column("keep_id").to_numpy()
        ).astype(np.int64)
        t = pa.table(
            {
                "gopher_keep": b.column("g"),
                "c4_keep": b.column("c"),
                "decon_drop": b.column("x"),
                "is_dup": pa.array(dup, pa.int64()),
            }
        )
        return t.group_by(["gopher_keep", "c4_keep", "decon_drop", "is_dup"]).aggregate(
            [([], "count_all")]
        ).rename_columns(["gopher_keep", "c4_keep", "decon_drop", "is_dup", "n"])

    return (
        joined.map_batches(pattern, batch_format="pyarrow")
        .groupby(["gopher_keep", "c4_keep", "decon_drop", "is_dup"])
        .sum("n")
        .map_batches(
            lambda b: b.rename_columns(
                ["gopher_keep", "c4_keep", "decon_drop", "is_dup", "n"]
            ),
            batch_format="pyarrow",
        )
        .sort(["gopher_keep", "c4_keep", "decon_drop", "is_dup"])
    )


def q_blocking_quality(sf_dir: str, w: int = 3, chunk: int = 256):
    """Blocking-quality audit for the sorted-neighborhood candidate
    generator (Christen 2012's two standard metrics): REDUCTION RATIO =
    1 - candidates/allpairs (how much comparison work blocking saves)
    and PAIRS COMPLETENESS = caught/true (how many genuinely-duplicate
    pairs the window still covers), with exact-text equality as ground
    truth.  Shape: the same two-pass order-preserving rank as
    q_sorted_neighborhood (per-bucket counts -> exclusive offsets ->
    in-bucket argsort) gives every doc its global (lede-key, doc_id)
    rank without a global sort; caught pairs come from rank-chunk
    re-bucketing with w-row boundary replication comparing 64-bit text
    hashes in-window; true pairs reduce through a text-hash groupby.
    Only counters leave the cluster."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..stages.dedup import _hash_strings64

    def keyed(b: pa.Table) -> pa.Table:
        ids, ks, hs = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            ids.append(d)
            ks.append(" ".join(toks[:2]))
            hs.append(t)
        th = _hash_strings64(hs).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k": pa.array(ks, pa.string()),
                "bkt": pa.array([x[:2] for x in ks], pa.string()),
                "th": pa.array(th, pa.int64()),
            }
        )

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = keyed_ds.groupby("bkt").count().to_pandas().sort_values("bkt")
    n_docs = int(bc["count()"].sum())
    offsets = dict(
        zip(bc["bkt"], bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)

    def rank(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values(["k", "doc_id"]).reset_index(drop=True)
        base = off[df["bkt"].iloc[0]]
        df["rn"] = base + np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df[["doc_id", "th", "rn"]], preserve_index=False)

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

    def caught_in_chunk(g: pa.Table, _w=w, _c=chunk) -> pa.Table:
        c = int(g.column("chunk")[0].as_py())
        df = g.to_pandas().sort_values("rn").reset_index(drop=True)
        rn = df["rn"].to_numpy()
        th = df["th"].to_numpy()
        caught = 0
        for i in range(len(df)):
            if rn[i] // _c != c:
                continue
            for j in range(i + 1, len(df)):
                if rn[j] - rn[i] > _w:
                    break
                if th[j] == th[i]:
                    caught += 1
        return pa.table({"caught": pa.array([caught], pa.int64())})

    caught = int(
        ranked.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(caught_in_chunk, batch_format="pyarrow")
        .sum("caught")
    )
    sizes = keyed_ds.groupby("th").count().to_pandas()["count()"].to_numpy(np.int64)
    true_pairs = int((sizes * (sizes - 1) // 2).sum())
    ranks = np.arange(1, n_docs + 1, dtype=np.int64)
    candidates = int(np.minimum(w, n_docs - ranks).sum())
    allpairs = n_docs * (n_docs - 1) // 2
    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_candidates": [candidates],
            "n_true_pairs": [true_pairs],
            "n_caught": [caught],
            "reduction_ratio": [float(_r(1.0 - candidates / allpairs, 6))],
            "completeness": [
                float(_r(caught / true_pairs, 6)) if true_pairs else 1.0
            ],
        }
    )


def q_perplexity_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    doc with the in-corpus unigram LM (q_unigram_logprob's exact chain),
    rank the corpus by logprob DESC (head = least surprising) and split
    into ntile(3) head/middle/tail buckets, reporting docs/tokens/mean
    score per bucket — the standard corpus-mix telemetry before choosing
    which quality slice to train on.  Shape: the LM is a vocab-sized
    broadcast (two passes); the global rank is the two-pass
    order-preserving bucket rank (per-coarse-key counts -> exclusive
    offsets -> in-key argsort), so no global sort and only 3 rows reach
    the driver."""
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
        cm = _bcast_get(ref)
        ids, sc, nt = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            sc.append(sum(math.log(cm[w] / total) for w in toks) / len(toks))
            ids.append(d)
            nt.append(len(toks))
        s6 = _r(sc, 6)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(s6, pa.float64()),
                "nt": pa.array(nt, pa.int64()),
                # coarse rank key: DESC order -> negate so ascending key sort
                # matches (score DESC); 0.01-wide slabs keep groups bounded
                "kb": pa.array(np.floor(-np.asarray(s6) * 100.0).astype(np.int64)),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow").materialize()
    bc = scored.groupby("kb").count().to_pandas().sort_values("kb")
    n_docs = int(bc["count()"].sum())
    offsets = dict(
        zip(bc["kb"], bc["count()"].cumsum().shift(1, fill_value=0).astype(int))
    )
    off_ref = ray.put(offsets)
    q3, r3 = divmod(n_docs, 3)

    def bucketize(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        df = g.to_pandas().sort_values(["score", "doc_id"], ascending=[False, True])
        rank0 = off[int(df["kb"].iloc[0])] + np.arange(len(df), dtype=np.int64)
        # ntile(3) semantics: first (n mod 3) buckets take q+1 rows
        cut = r3 * (q3 + 1)
        bi = np.where(rank0 < cut, rank0 // (q3 + 1), r3 + (rank0 - cut) // max(q3, 1)) + 1
        return pa.table(
            {
                "bi": pa.array(bi.astype(np.int64)),
                "nt": pa.array(df["nt"].to_numpy(), pa.int64()),
                "score": pa.array(df["score"].to_numpy(), pa.float64()),
                "one": pa.array(np.ones(len(df), dtype=np.int64)),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        names = {1: "head", 2: "middle", 3: "tail"}
        bi = b.column("bi").to_pylist()
        nd = b.column("n_docs").to_numpy()
        return pa.table(
            {
                "bucket": pa.array([names[int(x)] for x in bi], pa.string()),
                "n_docs": pa.array(nd, pa.int64()),
                "n_tokens": pa.array(b.column("n_tokens").to_numpy(), pa.int64()),
                "mean_logprob": pa.array(
                    _r(b.column("s").to_numpy() / nd, 6), pa.float64()
                ),
            }
        )

    return (
        scored.groupby("kb")
        .map_groups(bucketize, batch_format="pyarrow")
        .groupby("bi")
        .aggregate(
            Sum("one", alias_name="n_docs"),
            Sum("nt", alias_name="n_tokens"),
            Sum("score", alias_name="s"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort("bucket")
    )


def q_depth_quality_decay(sf_dir: str):
    """Does page quality decay with crawl depth?  The BFS layer number of
    every FOUND page (the budget-free engine run of q_crawl_bfs_depths)
    joined against the per-doc Gopher keep verdict and token count, then
    folded per depth into (n_docs, n_keep, keep_rate, mean_tokens) — the
    frontier-scheduling telemetry (crawl deeper vs re-seed) Common-Crawl
    curation reads before spending fetch budget.  The join is the
    tagged-union groupby (no broadcast side: depth rows and quality rows
    co-locate per doc_id), so a reachable set as large as the corpus
    still streams."""
    t = _run_crawl(
        sf_dir,
        "bfs",
        _cfg=dict(pop_k=1_000_000, host_budget=0, max_fetches=None, max_rounds=32),
        depth=32,
    )
    found = t.to_pandas()
    found = found[found["found"]]
    depth_rows = pa.table(
        {
            "doc_id": pa.array(
                [int(u.rsplit("/", 1)[1]) for u in found["url"]], pa.int64()
            ),
            "role": pa.array(["d"] * len(found), pa.string()),
            "depth": pa.array(found["round"].astype("int64").to_numpy(), pa.int64()),
            "keep": pa.array([0] * len(found), pa.int64()),
            "nt": pa.array([0] * len(found), pa.int64()),
        }
    )
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def quality(b: pa.Table) -> pa.Table:
        ids, keeps, nts = [], [], []
        for d, t_ in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            st = _gopher_stats(_oracle_tokens(t_))
            ids.append(d)
            keeps.append(st[4])
            nts.append(st[0])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "role": pa.array(["q"] * len(ids), pa.string()),
                "depth": pa.array([-1] * len(ids), pa.int64()),
                "keep": pa.array(keeps, pa.int64()),
                "nt": pa.array(nts, pa.int64()),
            }
        )

    def join_doc(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        d_rows = df[df["role"] == "d"]
        q_rows = df[df["role"] == "q"]
        if not len(d_rows) or not len(q_rows):
            return pa.table(
                {
                    "depth": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                    "nt": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "depth": pa.array([int(d_rows["depth"].iloc[0])], pa.int64()),
                "keep": pa.array([int(q_rows["keep"].iloc[0])], pa.int64()),
                "nt": pa.array([int(q_rows["nt"].iloc[0])], pa.int64()),
                "one": pa.array([1], pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        nd = b.column("n_docs").to_numpy()
        nk = b.column("n_keep").to_numpy()
        nt = b.column("snt").to_numpy()
        return pa.table(
            {
                "depth": b.column("depth"),
                "n_docs": pa.array(nd, pa.int64()),
                "n_keep": pa.array(nk, pa.int64()),
                "keep_rate": pa.array(_r(nk * 1.0 / nd, 6), pa.float64()),
                "mean_tokens": pa.array(_r(nt * 1.0 / nd, 6), pa.float64()),
            }
        )

    return (
        ray.data.from_arrow(depth_rows)
        .union(docs.map_batches(quality, batch_format="pyarrow"))
        .groupby("doc_id")
        .map_groups(join_doc, batch_format="pyarrow")
        .groupby("depth")
        .aggregate(
            Sum("one", alias_name="n_docs"),
            Sum("keep", alias_name="n_keep"),
            Sum("nt", alias_name="snt"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort("depth")
    )


def q_heldout_perplexity(sf_dir: str):
    """Held-out unigram perplexity: fit an add-one-smoothed unigram LM on
    the md5-even half of the corpus, evaluate exp(mean NLL per token) on
    the md5-odd half (unseen tokens take the smoothing floor 1/(N+V+1))
    — the train/test LM evaluation that q_unigram_logprob's in-corpus
    scoring (and q_perplexity_buckets) deliberately avoids.  Shape: one
    train-half vocabulary combiner (broadcast), one test-half scoring
    pass folding (nll_sum, n_tokens)."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    train = docs.filter(lambda r: _stable_h64(str(r["doc_id"])) % 2 == 0)
    test = docs.filter(lambda r: _stable_h64(str(r["doc_id"])) % 2 == 1)

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

    tab = (
        train.map_batches(vc, batch_format="pyarrow")
        .groupby("token")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    counts = dict(zip(tab["token"], tab["c"].astype(int)))
    n_train = int(tab["c"].sum())
    v = len(counts)
    ref = ray.put(counts)

    def score(b: pa.Table, _c=ref) -> pa.Table:
        import math

        cm = ray.get(_c)
        nll = 0.0
        nt = 0
        for t in b.column("text").to_pylist():
            for w in _oracle_tokens(t):
                p = (cm.get(w, 0) + 1.0) / (n_train + v + 1.0)
                nll -= math.log(p)
                nt += 1
        return pa.table(
            {
                "nll": pa.array([nll], pa.float64()),
                "nt": pa.array([nt], pa.int64()),
            }
        )

    agg = test.map_batches(score, batch_format="pyarrow").sum(["nll", "nt"])
    nll, nt = float(agg["sum(nll)"]), int(agg["sum(nt)"])
    ppl = float(np.exp(nll / nt)) if nt else float("nan")
    return pd.DataFrame(
        {
            "n_train_tokens": pd.array([n_train], dtype="int64"),
            "vocab": pd.array([v], dtype="int64"),
            "n_test_tokens": pd.array([nt], dtype="int64"),
            "perplexity": [float(_r(ppl, 6)) if ppl == ppl else float("nan")],
        }
    )


def q_markov_mixing(sf_dir: str, steps: int = 5):
    """Mixing profile of the per-user event-type Markov chain: from the
    transition matrix P (consecutive event pairs within users, ts then
    event_id order) and the start distribution concentrated on 'view',
    the total-variation distance 0.5 * sum|P^k(x0,.) - pi| for k = 1..5
    against the empirical stationary pi = row-visit shares — how many
    steps until the chain forgets where it started.  Shape: transition
    cells come from the q_event_transitions combiner plan; the O(types^2
    x 5) matrix powers fold driver-side, unrolled-SQL mirror."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"])
        t = df["event_type"].tolist()
        if len(t) < 2:
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        from collections import Counter

        cnt = Counter(zip(t[:-1], t[1:]))
        ks = sorted(cnt)
        return pa.table(
            {
                "a": pa.array([k[0] for k in ks], pa.string()),
                "b": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    cells = (
        ev.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    types = sorted(set(cells["a"]) | set(cells["b"]))
    k = len(types)
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((k, k))
    for _, r_ in cells.iterrows():
        P[idx[r_["a"]], idx[r_["b"]]] = r_["n"]
    row = P.sum(axis=1)
    pi = row / row.sum()  # empirical visit shares of the FROM states
    P = P / row[:, None]
    v = np.zeros(k)
    v[idx["view"]] = 1.0
    rows = []
    for s in range(1, steps + 1):
        v = v @ P
        tv = 0.5 * float(np.abs(v - pi).sum())
        rows.append((s, float(_r(tv, 6))))
    return pd.DataFrame(rows, columns=["step", "tv_distance"]).astype(
        {"step": "int64"}
    )


def q_price_band_mix(sf_dir: str):
    """Order price-band mix over time: classify orders into fixed price
    bands (<1k / 1-5k / 5-20k / >=20k) and report each band's order
    share per order YEAR with the year-over-year share delta — the
    product-mix drift readout finance dashboards lead with.  Shape:
    one (year, band) count combiner; the share + lag fold runs on the
    O(years x 4) cell table driver-side, window-lag mirror."""
    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def cells(b: pa.Table) -> pa.Table:
        od = b.column("o_orderdate").to_numpy()
        yr = (od.astype("datetime64[Y]").astype(int) + 1970).astype(np.int64)
        p = b.column("o_totalprice").to_numpy()
        band = np.where(
            p < 1000.0, "a_lt1k",
            np.where(p < 5000.0, "b_1to5k", np.where(p < 20000.0, "c_5to20k", "d_ge20k")),
        )
        df = pd.DataFrame({"yr": yr, "band": band})
        g = df.groupby(["yr", "band"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return pa.Table.from_pandas(g[["yr", "band", "n"]], preserve_index=False)

    cc = (
        orders.map_batches(cells, batch_format="pyarrow")
        .groupby(["yr", "band"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    tot = cc.groupby("yr")["n"].sum()
    cc["share"] = [
        float(_r(n / tot[y], 6)) for y, n in zip(cc["yr"], cc["n"])
    ]
    cc = cc.sort_values(["band", "yr"]).reset_index(drop=True)
    cc["yoy_delta"] = cc.groupby("band")["share"].diff()
    cc["yoy_delta"] = [
        float(_r(x, 6)) if x == x else float("nan") for x in cc["yoy_delta"]
    ]
    cc["yr"] = cc["yr"].astype("int64")
    cc["n"] = cc["n"].astype("int64")
    return cc[["band", "yr", "n", "share", "yoy_delta"]]


def q_disparity_filter(sf_dir: str, alpha: float = 0.05):
    """Serrano-Boguna disparity filter backbone of the weighted events
    link graph: an edge survives at endpoint u when (1 - w/s_u)^(k_u-1)
    < alpha (k_u = degree, s_u = strength; either endpoint suffices;
    k = 1 edges auto-keep) — the multiscale backbone extraction that
    keeps locally-significant edges where a global weight threshold
    keeps only hubs.  Shape: canonical undirected weight dedupe; the
    O(50)-node degree/strength table broadcasts; one vectorized edge
    pass folds (kept, weight share)."""
    edges = _events_edges(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        w = b.column("weight").to_numpy()
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        bb = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"a": a, "b": bb, "w": w[keep]})
        g = df.groupby(["a", "b"], as_index=False)["w"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    e = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum("w")
        .to_pandas()
        .rename(columns={"sum(w)": "w"})
    )
    half = pd.concat(
        [
            e.rename(columns={"a": "node", "b": "nbr"})[["node", "w"]],
            e.rename(columns={"b": "node", "a": "nbr"})[["node", "w"]],
        ]
    )
    st = half.groupby("node").agg(k=("w", "size"), s=("w", "sum"))
    kmap = st["k"].to_dict()
    smap = st["s"].to_dict()
    ka = e["a"].map(kmap).to_numpy(np.float64)
    sa = e["a"].map(smap).to_numpy(np.float64)
    kb = e["b"].map(kmap).to_numpy(np.float64)
    sb = e["b"].map(smap).to_numpy(np.float64)
    w = e["w"].to_numpy(np.float64)
    pa_ = np.where(ka > 1, (1.0 - w / sa) ** (ka - 1.0), 0.0)
    pb = np.where(kb > 1, (1.0 - w / sb) ** (kb - 1.0), 0.0)
    kept = (pa_ < alpha) | (pb < alpha)
    return pd.DataFrame(
        {
            "n_edges": pd.array([len(e)], dtype="int64"),
            "kept": pd.array([int(kept.sum())], dtype="int64"),
            "kept_frac": [float(_r(kept.mean(), 6))],
            "weight_share": [float(_r(w[kept].sum() / w.sum(), 6))],
        }
    )

__all__ = [
    "q_filter_project",
    "q_hash_sample",
    "q_pii_redact",
    "q_gopher_quality",
    "q_decontaminate",
    "q_pack_sequences",
    "q_curation_pipeline",
    "q_pretrain_mix",
    "q_split_assign",
    "q_shuffle_rank",
    "q_quality_score",
    "q_decontaminate_fuzzy",
    "q_dsir_weights",
    "q_dsir_resample",
    "q_frame_sample",
    "q_stratified_sample",
    "q_c4_filter",
    "q_boilerplate_lines",
    "q_mix_proportions",
    "q_badwords_filter",
    "q_mix_temperature",
    "q_nonedge_sample",
    "q_quality_blend",
    "q_quality_token_tradeoff",
    "q_quality_grid",
    "q_pack_stats",
    "q_filter_ablation",
    "q_blocking_quality",
    "q_perplexity_buckets",
    "q_depth_quality_decay",
    "q_heldout_perplexity",
    "q_markov_mixing",
    "q_price_band_mix",
    "q_disparity_filter",
]
