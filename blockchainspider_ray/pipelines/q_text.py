"""Text query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_extract_text(sf_dir: str):
    """The byte-identical 3-regex extraction (reference web.py:47-50)."""

    def ext(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text_out": pa.array(
                    [extract_text(h) for h in b.column("html").to_pylist()], pa.string()
                ),
            }
        )

    return _docs_html_ds(sf_dir).map_batches(ext, batch_format="pyarrow").sort("doc_id")


def q_token_count(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cnt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(
                    [len(re.findall(r"\S+", t)) for t in b.column("text").to_pylist()],
                    pa.int64(),
                ),
            }
        )

    return docs.map_batches(cnt, batch_format="pyarrow").sort("doc_id")


def q_token_quantiles(sf_dir: str):
    """Exact distributed quantiles of the per-doc token-count distribution
    — the length-filter thresholds a training-data pipeline tunes.  Shape:
    per-batch value-count combiner -> groupby(value).sum -> the DISTINCT-
    VALUE histogram (O(distinct token counts), never O(docs)) sorts and
    cumsums driver-side; quantile q = the value at 1-indexed sorted
    position ceil(q * N).  Exact at any scale without a full sort of the
    data — the histogram stays tiny because token counts are small ints."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def vc(b: pa.Table) -> pa.Table:
        counts = np.array(
            [len(re.findall(r"\S+", t)) for t in b.column("text").to_pylist()],
            dtype=np.int64,
        )
        vals, cnts = np.unique(counts, return_counts=True)
        return pa.table(
            {
                "n_tokens": pa.array(vals, pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    import math

    import pandas as pd

    h = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby("n_tokens")
        .sum("cnt")
        .to_pandas()
        .rename(columns={"sum(cnt)": "cnt"})
        .sort_values("n_tokens")
        .reset_index(drop=True)
    )
    total = int(h["cnt"].sum())
    cum = h["cnt"].cumsum().to_numpy()
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    vals = [
        int(h["n_tokens"][int(np.searchsorted(cum, math.ceil(q * total)))])
        for q in qs
    ]
    return pd.DataFrame({"q": pd.array(qs, dtype="float64"), "n_tokens": pd.array(vals, dtype="int64")})


def q_bm25_scores(sf_dir: str):
    """BM25 relevance of every document against a fixed term set — the
    retrieval-quality scoring primitive (quality-classifier feature /
    targeted-corpus mining).  Two-pass combiner shape: pass 1 reduces
    per-batch partial (df per term, total len, N) to a driver-side scalar
    triple (tiny — one row per term), pass 2 scores each doc inside
    map_batches with the broadcast idf/avg_len constants.  No shuffle ever
    carries documents; per-term math mirrors the SQL oracle term-for-term
    (Lucene idf: ln((N - df + 0.5) / (df + 0.5) + 1))."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = _BM25_TERMS

    def partial_stats(b: pa.Table) -> pa.Table:
        toks_all = [re.findall(r"\S+", t) for t in b.column("text").to_pylist()]
        df = {t: 0 for t in terms}
        for ts in toks_all:
            s = set(ts)
            for t in terms:
                if t in s:
                    df[t] += 1
        return pa.table(
            {
                "term": pa.array(list(terms) + ["__len__", "__n__"], pa.string()),
                "val": pa.array(
                    [df[t] for t in terms]
                    + [sum(len(ts) for ts in toks_all), len(toks_all)],
                    pa.int64(),
                ),
            }
        )

    stats = {
        r["term"]: r["sum(val)"]
        for r in docs.map_batches(partial_stats, batch_format="pyarrow")
        .groupby("term")
        .sum("val")
        .take_all()
    }
    n_docs = stats["__n__"]
    avg_len = stats["__len__"] / n_docs
    idf = {
        t: float(np.log((n_docs - stats[t] + 0.5) / (stats[t] + 0.5) + 1.0))
        for t in terms
    }

    def score(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        out = []
        for t_text in b.column("text").to_pylist():
            ts = re.findall(r"\S+", t_text)
            dl = len(ts)
            s = 0.0
            for t in terms:
                tf = ts.count(t)
                s += (
                    idf[t]
                    * tf
                    * (_BM25_K1 + 1)
                    / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avg_len))
                )
            out.append(float(_r(s, 4)))
        return pa.table({"doc_id": ids, "bm25": pa.array(out, pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_vocab_topk(sf_dir: str, k: int = 50):
    """Corpus-wide vocabulary: top-k tokens by total occurrence count
    (tokenizer/vocab-building primitive).  Classic combiner shape — each
    batch reduces to its own Counter rows, the groupby only ever moves
    (token, partial count) pairs, and only the k winners reach the driver.
    Ties at the cut are broken by token text so the result is deterministic
    under any partitioning."""
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

    agg = docs.map_batches(vc, batch_format="pyarrow").groupby("token").sum("cnt")

    def rn(b: pa.Table) -> pa.Table:
        return b.rename_columns(["token", "cnt"])

    return (
        agg.map_batches(rn, batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def q_bigram_topk(sf_dir: str, k: int = 50):
    """Corpus-wide top-k bigrams (n-gram LM / contamination-fingerprint
    primitive).  Same combiner shape as vocab_topk: each batch collapses to
    its own (bigram, partial count) rows — consecutive-token pairs never
    leave the batch un-aggregated — and the groupby moves only partials.
    Deterministic under any partitioning (ties broken by bigram text)."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            cnt.update(f"{a} {b2}" for a, b2 in zip(toks, toks[1:]))
        return pa.table(
            {
                "bigram": pa.array(list(cnt.keys()), pa.string()),
                "cnt": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    agg = docs.map_batches(vc, batch_format="pyarrow").groupby("bigram").sum("cnt")
    return (
        agg.map_batches(lambda b: b.rename_columns(["bigram", "cnt"]), batch_format="pyarrow")
        .sort(["cnt", "bigram"], descending=[True, False])
        .limit(k)
    )


def q_tfidf_topterms(sf_dir: str, topn: int = 3):
    """Per-doc top-3 TF-IDF terms (keyword/quality-feature primitive).
    Two-pass: pass 1 reduces to the document-frequency table + corpus size
    (vocab-sized — broadcast via ray.put), pass 2 scores inside map_batches
    and keeps each doc's top-3 with (tfidf desc, term asc) tie-breaks so
    the ranking is exactly row_number() in the SQL mirror.  tfidf =
    (tf / doc_len) * ln(N / df) evaluated in the same operation order on
    both sides — identical doubles, identical ranks."""
    import math

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial_df(b: pa.Table) -> pa.Table:
        from collections import Counter

        df_c = Counter()
        for t in b.column("text").to_pylist():
            df_c.update(set(_oracle_tokens(t)))
        return pa.table(
            {
                "term": pa.array(list(df_c.keys()), pa.string()),
                "c": pa.array(list(df_c.values()), pa.int64()),
            }
        )

    # corpus size from parquet metadata (no data read, no in-band sentinel
    # term that real web-text junk tokens could collide with)
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    dfs = (
        docs.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .sum("c")
        .to_pandas()
    )
    df_map = dict(zip(dfs["term"], dfs["sum(c)"].astype(int)))
    ref = ray.put(df_map)

    def score(b: pa.Table) -> pa.Table:
        from collections import Counter

        dfm = ray.get(ref)
        ids, terms, vals, ranks = [], [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            n = len(toks)
            scored = [
                ((c / n) * math.log(n_docs / dfm[w]), w)
                for w, c in Counter(toks).items()
            ]
            scored.sort(key=lambda p: (-p[0], p[1]))
            for rk, (v, w) in enumerate(scored[:topn], 1):
                ids.append(d)
                terms.append(w)
                vals.append(v)
                ranks.append(rk)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tfidf": pa.array(_r(vals, 6), pa.float64()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort(["doc_id", "rank"])


def q_keywords_summary(sf_dir: str):
    """Keyworder/summarizer with the reference's REAL semantics: TextRank
    keywords (words=16) + TextRank extractive summary (words=256), the
    summa calls in reference spiders/labels/web.py:125,132, reimplemented
    from the published algorithm (functions/textrank.py).  Graph build +
    PageRank per doc run vectorized inside map_batches; no SQL mirror
    exists, so correctness is pinned by deterministic fixtures in
    tests/test_text.py."""
    from ..functions.textrank import textrank_keywords, textrank_summarize

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def kw(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        summaries, keywords = [], []
        for t in b.column("text").to_pylist():
            ks = textrank_keywords(t, words=16)
            keywords.append(",".join(ks))
            summaries.append(textrank_summarize(t, words=256))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "summary": pa.array(summaries, pa.string()),
                "keywords": pa.array(keywords, pa.string()),
            }
        )

    return docs.map_batches(kw, batch_format="pyarrow").sort("doc_id")


def q_keywords_freq(sf_dir: str):
    """Frequency-baseline keyworder (SQL-mirrorable control for
    keywords_summary): top frequent token >= 4 chars, first-20-token
    summary."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def kw(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        summaries, keywords = [], []
        for t in b.column("text").to_pylist():
            toks = re.findall(r"\S+", t)
            summaries.append(" ".join(toks[:20]))
            freq: Dict[str, int] = {}
            for w in toks:
                if len(w) >= 4:
                    freq[w] = freq.get(w, 0) + 1
            keywords.append(min(freq, key=lambda w: (-freq[w], w)) if freq else None)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "summary": pa.array(summaries, pa.string()),
                "top_keyword": pa.array(keywords, pa.string()),
            }
        )

    return docs.map_batches(kw, batch_format="pyarrow").sort("doc_id")


def q_langid(sf_dir: str):
    from ..stages.textstats import LangIdStage

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(LangIdStage), batch_format="pyarrow")
        .sort("doc_id")
    )


def q_bpe_pair_counts(sf_dir: str):
    """First BPE iteration, SQL-pinned: adjacent character-pair counts
    over whitespace words weighted by corpus word frequency — the
    corpus-scale half of tokenizer training (stages/bpe.py).  The corpus
    reduces to a (word, f) vocab in one combiner+groupby pass; the pair
    table is alphabet-bounded.  Top 50 by (count desc, pair asc)."""
    from ..stages.bpe import pair_counts, vocab_from_docs

    docs = _read(sf_dir, "documents", columns=["text"])
    vocab = vocab_from_docs(docs).map_batches(
        lambda b: pa.table(
            {
                "syms": pa.array(
                    [list(w) for w in b.column("word").to_pylist()],
                    pa.list_(pa.string()),
                ),
                "f": b.column("f"),
            }
        ),
        batch_format="pyarrow",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pair": pc.binary_join_element_wise(
                    b.column("left").cast(pa.string()),
                    b.column("right").cast(pa.string()),
                    "",
                ),
                "n": b.column("n"),
            }
        )

    return (
        pair_counts(vocab)
        .map_batches(finish, batch_format="pyarrow")
        .sort(["n", "pair"], descending=[True, False])
        .limit(50)
    )


def q_bpe_train(sf_dir: str, k: int = 12):
    """Learned BPE merge table over the corpus: k merge rounds on the
    vocabulary Dataset, each one alphabet-bounded pair groupby + one
    vocab rewrite (stages/bpe.py train_bpe).  Deterministic tie-break
    (count desc, left asc, right asc); pinned in pytest against a
    pure-Python reference BPE (no SQL mirror — the merge loop re-tokenizes
    the vocab every round, which SQL cannot express un-unrolled)."""
    from ..stages.bpe import train_bpe

    docs = _read(sf_dir, "documents", columns=["text"])
    merges = train_bpe(docs, k=k)
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "n": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def q_bpe_encode(sf_dir: str, k: int = 12):
    """Apply the learned merge table corpus-wide: BPEEncodeStage actor
    pool (rank dict built once per actor, word->tokens cache) emitting
    per-doc BPE token counts — the tokenize-and-count pass a pretraining
    pipeline runs before packing.  Pinned in pytest against encoding
    every doc with the pure-Python reference."""
    from ..stages.bpe import BPEEncodeStage, train_bpe

    docs = _read(sf_dir, "documents", columns=["text"])
    merges = train_bpe(docs, k=k)
    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(
            BPEEncodeStage,
            fn_constructor_kwargs={"merges": merges},
            batch_format="pyarrow",
            concurrency=2,
        )
        .sort("doc_id")
    )


def q_cms_token_counts(sf_dir: str):
    """Count-Min frequency estimates for the corpus's exact top-20 tokens
    (stages/sketch.py CountMinSketch).  The sketch builds shuffle-free —
    per-batch tables SUM-fold on the driver, partition-independent — and
    the probe set comes from the exact vocab_topk pipeline, so the output
    pairs every heavy hitter with its (over-)estimate.  Estimates are
    >= truth by construction (pinned in tests/test_sketch.py); at this
    width (2^16 counters vs ~10^4 vocab) collisions are absent and the
    estimates equal the exact counts."""
    from ..stages.sketch import build_cms

    docs = _read(sf_dir, "documents", columns=["text"])

    def toks(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column("text").to_pylist():
            out.extend(_oracle_tokens(t))
        return pa.table({"token": pa.array(out, pa.string())})

    cms = build_cms(docs.map_batches(toks, batch_format="pyarrow"), "token", w=1 << 16)
    top = q_vocab_topk(sf_dir, k=20).to_pandas()
    probe = pa.chunked_array([pa.array(top["token"].tolist(), pa.string())])
    est = cms.estimate(probe)
    return pa.table(
        {
            "token": pa.array(top["token"].tolist(), pa.string()),
            "est_cnt": pa.array(est, pa.int64()),
        }
    ).sort_by([("est_cnt", "descending"), ("token", "ascending")])


def q_token_entropy(sf_dir: str):
    """Per-document token-distribution entropy (the Shannon-entropy quality
    feature next to gopher_quality's ratio rules: near-zero entropy = spam /
    keyword-stuffed boilerplate, which length or stopword ratios miss).
    Embarrassingly parallel map_batches — one Counter + vectorized
    p*log2(p) fold per doc, no shuffle; rounded 4dp on both sides so the
    hash survives summation-order noise."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ent(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column("text").to_pylist():
            toks = re.findall(r"\S+", t)
            if not toks:
                out.append(0.0)
                continue
            _, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            p = counts / counts.sum()
            out.append(float(-(p * np.log2(p)).sum()))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "entropy": pc.round(pa.array(out, pa.float64()), 4),
            }
        )

    return docs.map_batches(ent, batch_format="pyarrow").sort("doc_id")


def q_text_normalize(sf_dir: str):
    """Unicode NFC normalization + whitespace collapse + lowercasing — the
    canonical pre-tokenization cleanup.  The ASCII corpus would make NFC a
    no-op, so both sides append the same deterministic decomposed-form
    suffix (combining acute/diaeresis/grave, NFC-composes to 3 precomposed
    chars) exactly as q_pii_redact synthesizes PII.  Whitespace class is
    the explicit ASCII [ \\t\\n\\r\\f] on both engines (python re and RE2
    disagree on unicode \\s); char counts are code points, which DuckDB's
    length() and python len() agree on (verified: 'cafe'+U+0301 -> NFC 4)."""
    import unicodedata

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ws = re.compile(r"[ \t\n\r\f]+")

    def norm(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        raw_n, clean_s, clean_n = [], [], []
        for d, t in zip(ids, b.column("text").to_pylist()):
            s = f"{t} café {d % 7}\tnaïve  nò "
            raw_n.append(len(s))
            c = ws.sub(" ", unicodedata.normalize("NFC", s)).strip(" ").lower()
            clean_s.append(c)
            clean_n.append(len(c))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "clean": pa.array(clean_s, pa.string()),
                "n_raw": pa.array(raw_n, pa.int64()),
                "n_clean": pa.array(clean_n, pa.int64()),
            }
        )

    return docs.map_batches(norm, batch_format="pyarrow").sort("doc_id")


def q_bigram_logprob(sf_dir: str):
    """Corpus-fitted bigram LM score with add-1 smoothing — the next rung
    above q_unigram_logprob toward CCNet's KenLM perplexity filter:
    mean over positions i>=2 of ln((c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)).
    Pass 1 reduces the corpus to the bigram + unigram count tables (vocab-
    sized broadcasts, same contract as q_unigram_logprob); pass 2 is a pure
    map.  Docs with fewer than two tokens score 0.0 on both sides."""
    import math
    from collections import Counter

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def vc(b: pa.Table) -> pa.Table:
        uni, bi = Counter(), Counter()
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            uni.update(toks)
            bi.update(
                toks[i] + "\x01" + toks[i + 1] for i in range(len(toks) - 1)
            )
        keys = list(uni.keys()) + list(bi.keys())
        kinds = [0] * len(uni) + [1] * len(bi)
        vals = list(uni.values()) + list(bi.values())
        return pa.table(
            {
                "k": pa.array(keys, pa.string()),
                "kind": pa.array(kinds, pa.int64()),
                "c": pa.array(vals, pa.int64()),
            }
        )

    tab = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby(["k", "kind"])
        .sum("c")
        .to_pandas()
    )
    uni = dict(
        zip(tab.loc[tab["kind"] == 0, "k"], tab.loc[tab["kind"] == 0, "sum(c)"].astype(int))
    )
    bi = dict(
        zip(tab.loc[tab["kind"] == 1, "k"], tab.loc[tab["kind"] == 1, "sum(c)"].astype(int))
    )
    V = len(uni)
    uref, bref = ray.put(uni), ray.put(bi)

    def score(b: pa.Table) -> pa.Table:
        cu, cb = ray.get(uref), ray.get(bref)
        ids, lps = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            if len(toks) < 2:
                ids.append(d)
                lps.append(0.0)
                continue
            s = sum(
                math.log(
                    (cb.get(toks[i] + "\x01" + toks[i + 1], 0) + 1.0)
                    / (cu[toks[i]] + V)
                )
                for i in range(len(toks) - 1)
            )
            ids.append(d)
            lps.append(s / (len(toks) - 1))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "logprob": pa.array(_r(lps, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_chunk_texts(sf_dir: str, size: int = 32, stride: int = 24):
    """Fixed-token chunking with overlap (the RAG / context-window prep
    op): each doc's token stream splits into windows of ``size`` tokens
    every ``stride`` (overlap = size - stride), the final short remainder
    kept.  Pure per-row flat-map — no shuffle; output one row per chunk
    with its bounds and a content fingerprint (first/last token), the
    columns a chunk store indexes."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(b: pa.Table) -> pa.Table:
        ids, cix, starts, ns, firsts, lasts = [], [], [], [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            i, c = 0, 0
            while True:
                w = toks[i : i + size]
                if not w:
                    break
                ids.append(d)
                cix.append(c)
                starts.append(i)
                ns.append(len(w))
                firsts.append(w[0])
                lasts.append(w[-1])
                if i + size >= len(toks):
                    break
                i += stride
                c += 1
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_id": pa.array(cix, pa.int64()),
                "start_tok": pa.array(starts, pa.int64()),
                "n_tokens": pa.array(ns, pa.int64()),
                "first_tok": pa.array(firsts, pa.string()),
                "last_tok": pa.array(lasts, pa.string()),
            }
        )

    return docs.map_batches(chunk, batch_format="pyarrow").sort(["doc_id", "chunk_id"])


def q_pmi_bigrams(sf_dir: str, k: int = 50, min_count: int = 5):
    """Top-k word pairs by pointwise mutual information (collocation
    mining — the phrase-detection primitive behind tokenizer phrase
    merges and word2vec-style phrase corpora).  Two combiner
    aggregations: unigram counts and (bigram, w1, w2) counts each reduce
    inside every batch before their groupby moves (token, partial)
    rows.  The finished unigram table is vocab-sized, so it broadcasts
    via ray.put and PMI is scored inside map_batches over the bigram
    aggregate — no join shuffle.  pmi = ln((cxy/nb) / ((cx/nu)*(cy/nu)))
    evaluated in that exact operation order on both sides (identical
    doubles), rounded 6dp, ties at the cut broken by bigram text."""
    import math
    from collections import Counter

    docs = _read(sf_dir, "documents", columns=["text"])

    def ucount(b: pa.Table) -> pa.Table:
        cnt = Counter()
        n = 0
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            n += len(toks)
            cnt.update(toks)
        return pa.table(
            {
                "w": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    uni = (
        docs.map_batches(ucount, batch_format="pyarrow")
        .groupby("w")
        .sum("c")
        .to_pandas()
    )
    ucnt = dict(zip(uni["w"], uni["sum(c)"]))
    nu = int(uni["sum(c)"].sum())
    ucnt_ref = ray.put(ucnt)

    def bcount(b: pa.Table) -> pa.Table:
        cnt = Counter()
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            cnt.update(zip(toks, toks[1:]))
        w1, w2, c = [], [], []
        for (a, b2), v in cnt.items():
            w1.append(a)
            w2.append(b2)
            c.append(v)
        return pa.table(
            {
                "bigram": pa.array([f"{a} {b2}" for a, b2 in zip(w1, w2)], pa.string()),
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "c": pa.array(c, pa.int64()),
            }
        )

    bi = (
        docs.map_batches(bcount, batch_format="pyarrow")
        .groupby(["bigram", "w1", "w2"])
        .sum("c")
    )
    # total bigram occurrences = total tokens - one per doc (every doc has
    # >= 1 token under _oracle_tokens, so each contributes len-1 pairs)
    ndocs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    nb = nu - ndocs

    class Score:
        def __init__(self):
            self.ucnt = ray.get(ucnt_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keep_bg, keep_c, keep_p = [], [], []
            for bg, a, b2, c in zip(
                b.column("bigram").to_pylist(),
                b.column("w1").to_pylist(),
                b.column("w2").to_pylist(),
                b.column("sum(c)").to_pylist(),
            ):
                if c < min_count:
                    continue
                p = math.log((c / nb) / ((self.ucnt[a] / nu) * (self.ucnt[b2] / nu)))
                keep_bg.append(bg)
                keep_c.append(c)
                keep_p.append(round(p, 6))
            return pa.table(
                {
                    "bigram": pa.array(keep_bg, pa.string()),
                    "cnt": pa.array(keep_c, pa.int64()),
                    "pmi": pa.array(keep_p, pa.float64()),
                }
            )

    return (
        bi.map_batches(Score, batch_format="pyarrow", concurrency=2)
        .sort(["pmi", "bigram"], descending=[True, False])
        .limit(k)
    )


def q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix — the classifier-evaluation shape
    (predicted lang vs labelled lang, cell counts).  Pure combiner plan:
    each batch predicts with the same n-gram heuristic the ``langid``
    query pins and reduces to its own (lang, lang_pred, n) cells, so the
    groupby moves O(langs^2) rows per batch, never documents.  The SQL
    mirror nests the full-value langid oracle as a CTE — both sides'
    predictions come from independently-implemented identical rules."""
    from ..stages.textstats import predict_lang

    docs = _read(sf_dir, "documents", columns=["text", "lang"])

    def cells(b: pa.Table) -> pa.Table:
        preds = pa.array(
            [predict_lang(t) for t in b.column("text").to_pylist()], pa.string()
        )
        t = pa.table({"lang": b.column("lang"), "lang_pred": preds})
        return t.group_by(["lang", "lang_pred"]).aggregate([([], "count_all")])

    agg = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .sum("count_all")
    )
    return agg.map_batches(
        lambda b: b.rename_columns(["lang", "lang_pred", "cnt"]),
        batch_format="pyarrow",
    ).sort(["lang", "lang_pred"])


def q_ngram_hash_features(sf_dir: str, dim: int = 64):
    """fastText-style hashed unigram featurization: every doc becomes a
    ``dim``-bucket sparse count vector (bucket = md5_low64(token) % dim),
    emitted long-form (doc_id, bucket, cnt) — the input shape for training
    linear quality/lang classifiers over web text.  Embarrassingly
    parallel: each row is a whole doc, so per-doc counts finish inside the
    batch and NO shuffle happens at any corpus size; the token hash is the
    version-stable md5 low half, recomputable in SQL as
    md5_number_lower."""
    from collections import Counter

    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(b: pa.Table) -> pa.Table:
        ids, buckets, cnts = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            cnt = Counter(_stable_h64(w) % dim for w in _oracle_tokens(t))
            for bk in sorted(cnt):
                ids.append(d)
                buckets.append(bk)
                cnts.append(cnt[bk])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow").sort(["doc_id", "bucket"])


def q_tokenizer_fertility(sf_dir: str):
    """Tokens-per-100-chars by (lang, source) — the tokenizer-fertility
    table a pretrain-mix designer reads before setting sampling weights
    (a high-fertility slice costs more sequence budget per byte).
    Whitespace tokenization matches the corpus' SQL-mirrorable tokenizer
    (_oracle_tokens == regexp_split_to_array(trim(text), '\\s+')).
    Integer token/char sums reduce via one combiner groupby; the ratio is
    computed once per (lang, source) cell from exact integers."""
    docs = _read(sf_dir, "documents", columns=["text", "lang", "source", "n_chars"])

    def partials(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": b.column("lang").to_pandas(),
                "source": b.column("source").to_pandas(),
                "toks": [len(_oracle_tokens(t)) for t in b.column("text").to_pylist()],
                "chars": b.column("n_chars").to_numpy(),
            }
        )
        g = df.groupby(["lang", "source"], as_index=False)[["toks", "chars"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("toks", alias_name="tokens"), Sum("chars", alias_name="chars"))
        .to_pandas()
    )
    agg["fertility"] = [
        0.0 if ch == 0 else float(_r(100.0 * tk / ch, 6))
        for tk, ch in zip(agg["tokens"], agg["chars"])
    ]
    return (
        agg.astype({"tokens": "int64", "chars": "int64"})
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )


def q_char_entropy(sf_dir: str):
    """Per-document character-level Shannon entropy (nats) — the cheap
    garbage detector that flags base64 blobs / repeated-char padding /
    encoding mojibake before tokenization spends money on them.  Pure
    map-side (no shuffle; per-doc numpy bincount over the byte histogram);
    the entropy fold accumulates in character order on both sides so the
    float hash is exact.  Empty docs are skipped (no characters → no
    distribution), matching the SQL unnest."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ent(b: pa.Table) -> pa.Table:
        ids, ns, nu, es = [], [], [], []
        for did, t in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            if not t:
                continue
            arr = np.frombuffer(t.encode("utf-8"), np.uint8)  # ASCII corpus
            cnt = np.bincount(arr, minlength=256)
            nz = cnt[cnt > 0]  # bincount index order == code-point order
            n = float(len(arr))
            e = 0.0
            for c in nz:  # char order — matches sum(... ORDER BY ch)
                p = c / n
                e += -p * np.log(p)
            ids.append(did)
            ns.append(int(n))
            nu.append(int(len(nz)))
            es.append(float(_r(e, 6)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(ns, pa.int64()),
                "n_unique": pa.array(nu, pa.int64()),
                "entropy": pa.array(es, pa.float64()),
            }
        )

    return docs.map_batches(ent, batch_format="pyarrow").sort("doc_id")


def q_sentence_split(sf_dir: str):
    """Sentence segmentation with stable ordinals — the unit the packing /
    chunking / span-dedup stages downstream consume.  Split pattern is
    RE2-compatible (`[.!?]\\s+`, separator consumed) so the Ray side and
    the SQL mirror share semantics exactly; pure map-side (no shuffle),
    one output row per sentence with its per-doc ordinal and token count."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    splitter = re.compile(r"[.!?]\s+")

    def split(b: pa.Table) -> pa.Table:
        ids, idxs, sents, toks = [], [], [], []
        for did, t in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            for i, s in enumerate(splitter.split(t), 1):
                ids.append(did)
                idxs.append(i)
                sents.append(s)
                toks.append(len(_oracle_tokens(s)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sent_idx": pa.array(idxs, pa.int64()),
                "sentence": pa.array(sents, pa.string()),
                "n_tokens": pa.array(toks, pa.int64()),
            }
        )

    return docs.map_batches(split, batch_format="pyarrow").sort(
        ["doc_id", "sent_idx"]
    )


def q_zipf_fit(sf_dir: str, k: int = 100):
    """Zipf-law fit over the top-k vocabulary: OLS of ln(count) on ln(rank)
    — the corpus-health dial (natural text sits near slope -1; template- or
    spam-dominated corpora flatten or steepen it).  Shape: the combiner
    vocab build (per-batch Counter partials, groupby-sum moves only
    (token, partial) rows) feeds a distributed sort + limit(k), so only k
    rows ever reach the driver; the fit itself is O(k) arithmetic.  Rank is
    row_number over (cnt DESC, token ASC) — deterministic under ties — and
    both sides evaluate the identical closed-form normal equations, rounded
    6dp."""
    top = q_vocab_topk(sf_dir, k=k).to_pandas()
    n = len(top)
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(top["cnt"].to_numpy(dtype=np.float64))
    sx, sy = float(x.sum()), float(y.sum())
    sxx, syy, sxy = float((x * x).sum()), float((y * y).sum()), float((x * y).sum())
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    # degenerate vocab (single token / all-equal counts): NULL like the mirror
    slope = (n * sxy - sx * sy) / dx if dx else np.nan
    intercept = (sy - slope * sx) / n if dx else np.nan
    r2 = (n * sxy - sx * sy) ** 2 / (dx * dy) if dx and dy else np.nan
    return pd.DataFrame(
        {
            "k": [int(n)],
            "slope": [float(_r(slope, 6))],
            "intercept": [float(_r(intercept, 6))],
            "r2": [float(_r(r2, 6))],
        }
    )


def q_langid_kappa(sf_dir: str):
    """Cohen's kappa between the heuristic language-ID prediction and the
    labeled ``lang`` column — chance-corrected agreement, the number an
    annotation-quality dashboard reports next to raw accuracy.  Reuses the
    langid_confusion pipeline (stopword-vote predictor, groupby to the
    dim-sized confusion matrix); kappa folds from the matrix's exact
    integer marginals in one driver expression, mirrored operation-for-
    operation: kappa = (N*tr - sum_k row_k*col_k) / (N*N - sum_k
    row_k*col_k)."""
    from .registry_p01 import SQL_QUERIES  # explicit cross-family dep
    cm = _to_pandas_any(SQL_QUERIES["langid_confusion"](sf_dir))
    N = int(cm["cnt"].sum())
    tr = int(cm.loc[cm["lang"] == cm["lang_pred"], "cnt"].sum())
    rows = cm.groupby("lang")["cnt"].sum()
    cols = cm.groupby("lang_pred")["cnt"].sum()
    rc = int(sum(int(rows[k]) * int(cols[k]) for k in rows.index if k in cols.index))
    # degenerate agreement (both marginals concentrated): NULL like the mirror
    kappa = (N * tr - rc) * 1.0 / (N * N - rc) if N * N != rc else np.nan
    return pd.DataFrame({"n": [N], "kappa": [float(_r(kappa, 6))]})


def q_entropy_rate(sf_dir: str):
    """Bigram entropy rate of the token stream: H(Y|X) = -sum p(x,y) ln
    p(y|x) over within-doc bigrams, next to the unigram entropy H(Y) —
    the pair quantifies corpus predictability (templated/boilerplate text
    collapses H(Y|X) far below H(Y); their gap is the mutual information
    between adjacent tokens).  Bigram and unigram counts build with the
    standard per-batch Counter combiner (only partials shuffle); the
    final folds run over the dim-sized count tables from EXACT integer
    counts, one float expression per term, mirrored operation-for-
    operation and rounded 6dp."""
    bg = q_bigram_topk(sf_dir, k=10**9).to_pandas()  # full bigram table, combiner-built
    parts = bg["bigram"].str.split(" ", n=1, expand=True)
    bg["x"] = parts[0]
    T = int(bg["cnt"].sum())
    cx = bg.groupby("x")["cnt"].sum()
    c = bg["cnt"].to_numpy(dtype=np.float64)
    cxv = bg["x"].map(cx).to_numpy(dtype=np.float64)
    h_rate = float(-np.sum(c / T * np.log(c / cxv)))

    uni = q_vocab_topk(sf_dir, k=10**9).to_pandas()
    U = int(uni["cnt"].sum())
    u = uni["cnt"].to_numpy(dtype=np.float64)
    h_uni = float(-np.sum(u / U * np.log(u / U)))
    return pd.DataFrame(
        {
            "n_bigrams": [T],
            "entropy_rate": [float(_r(h_rate, 6))],
            "unigram_entropy": [float(_r(h_uni, 6))],
        }
    )


def q_kwic(sf_dir: str, width: int = 2):
    """Keyword-in-context concordance for the corpus's top token — the
    inspection primitive behind 'show me how this term is used' audits
    (and the positional-postings consumer postings_build feeds).  The
    focus term is the deterministic vocab top-1 (combiner build, one row
    to the driver, broadcast by closure); occurrence scan + context
    slicing is a single embarrassingly-parallel map_batches, rows =
    occurrences, contexts clamped at doc edges identically to the SQL
    list-slice mirror."""
    term = q_vocab_topk(sf_dir, k=1).to_pandas()["token"].iloc[0]
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(b: pa.Table, _term=term) -> pa.Table:
        out_d, out_p, out_l, out_r = [], [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            for j, tok in enumerate(toks):
                if tok == _term:
                    out_d.append(d)
                    out_p.append(j + 1)
                    out_l.append(" ".join(toks[max(0, j - width) : j]))
                    out_r.append(" ".join(toks[j + 1 : j + 1 + width]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "left_ctx": pa.array(out_l, pa.string()),
                "right_ctx": pa.array(out_r, pa.string()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow").sort(["doc_id", "pos"])


def q_ngram_novelty(sf_dir: str, n: int = 3):
    """Per-doc n-gram novelty: the fraction of a doc's distinct 3-grams
    whose FIRST corpus occurrence (by doc_id order) is this doc — the
    marginal-content curve dedup planning reads (Lee et al.'s
    'deduplicating training data' measures exactly this decay; a doc
    adding no new grams is a near-pure duplicate).  Same first-occurrence
    trick as heaps_law at gram granularity: per-batch distinct (gram,
    min doc) partials -> groupby(gram).min -> counts per owning doc —
    only gram partials shuffle, and the per-doc join of owned vs total
    distinct counts is two corpus-linear tables."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_firsts(b: pa.Table) -> pa.Table:
        firsts: dict = {}
        totals_d, totals_c = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            gs = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            totals_d.append(d)
            totals_c.append(len(gs))
            for g in gs:
                p = firsts.get(g)
                if p is None or d < p:
                    firsts[g] = d
        return pa.table(
            {
                "gram": pa.array(list(firsts.keys()), pa.string()),
                "fd": pa.array(list(firsts.values()), pa.int64()),
            }
        )

    firsts = (
        docs.map_batches(gram_firsts, batch_format="pyarrow")
        .groupby("gram")
        .min("fd")
    )

    def own_part(b: pa.Table) -> pa.Table:
        fd = b.column(1).to_numpy()
        vals, cnts = np.unique(fd, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(vals, pa.int64()),
                "n_novel": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    own = (
        firsts.map_batches(own_part, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("n_novel")
        .map_batches(
            lambda b: b.rename_columns(["doc_id", "n_novel"]), batch_format="pyarrow"
        )
    )

    def totals(b: pa.Table) -> pa.Table:
        ids, cs = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            c = len({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
            if c:
                ids.append(d)
                cs.append(c)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_grams": pa.array(cs, pa.int64()),
            }
        )

    # per-doc tables are corpus-linear: join them with the partitioned
    # hash_join, never a driver-side merge
    from ..stages.joins import hash_join

    tot = docs.map_batches(totals, batch_format="pyarrow")
    joined = hash_join(tot, own, key="doc_id", how="left")

    def finish(b: pa.Table) -> pa.Table:
        ng = b.column("n_grams").to_numpy()
        nv = b.column("n_novel").to_numpy(zero_copy_only=False)
        nv = np.where(np.isnan(nv.astype(np.float64)), 0, nv).astype(np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_grams": b.column("n_grams"),
                "n_novel": pa.array(nv, pa.int64()),
                "novelty": pa.array(_r(nv * 1.0 / ng, 6), pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def q_stupid_backoff_logprob(sf_dir: str, alpha: float = 0.4):
    """Per-doc stupid-backoff bigram LM score (Brants et al., EMNLP'07 —
    the web-scale LM smoothing that needs no discounting pass): position
    i >= 2 scores ln(c(w_{i-1} w_i) / c(w_{i-1})) when the bigram exists,
    else ln(alpha * c(w_i) / T).  Upgrades unigram_logprob/bigram_logprob
    with the seen/backoff split real quality-scorers use.  Count tables
    build with the standard combiner groupbys, broadcast once via
    ray.put (vocab-sized), and scoring is a pure map — no per-doc
    shuffle.  Mean per doc, rounded 6dp."""
    bg = q_bigram_topk(sf_dir, k=10**9).to_pandas()
    bgc = dict(zip(bg["bigram"], bg["cnt"].astype(int)))
    uni = q_vocab_topk(sf_dir, k=10**9).to_pandas()
    uc = dict(zip(uni["token"], uni["cnt"].astype(int)))
    T = int(uni["cnt"].sum())
    refs = ray.put((bgc, uc, T))

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table, _r0=refs, _a=alpha) -> pa.Table:
        import math

        bgc_l, uc_l, T_l = ray.get(_r0)
        ids, means, npos = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(t)
            s = 0.0
            n = 0
            for x, y in zip(toks, toks[1:]):
                c = bgc_l.get(f"{x} {y}")
                if c:
                    s += math.log(c * 1.0 / uc_l[x])
                else:
                    s += math.log(_a * uc_l[y] / T_l)
                n += 1
            if n:
                ids.append(d)
                means.append(s / n)
                npos.append(n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(npos, pa.int64()),
                "sb_logprob": pa.array(_r(means, 6), pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def q_huffman_code_lengths(sf_dir: str, k: int = 50):
    """Optimal prefix-code lengths (Huffman) for the top-k vocabulary with
    the remaining mass folded into one ESCAPE symbol — the 'what would an
    optimal token encoding cost' dial next to entropy_rate (expected code
    length is within 1 bit of the unigram entropy by Shannon's bound,
    asserted in tests/test_huffman.py).  Vocabulary reduces through the
    combiner groupby; the greedy merge runs driver-side over the k+1
    leaves only.  No SQL mirror (the pairing greedy isn't expressible) —
    pinned by closed-form examples + Kraft equality + the entropy
    sandwich in pytest."""
    uni = q_vocab_topk(sf_dir, k=10**9).to_pandas()
    T = int(uni["cnt"].sum())
    top = uni.head(k)
    rest = T - int(top["cnt"].sum())
    counts = dict(zip(top["token"], top["cnt"].astype(int)))
    if rest > 0:
        counts["\x00ESC"] = rest
    lengths = huffman_code_lengths(counts)
    rows = [
        {"token": t if t != "\x00ESC" else "<ESC>", "cnt": c, "code_len": lengths[t]}
        for t, c in counts.items()
    ]
    df = pd.DataFrame(rows).sort_values(["cnt", "token"], ascending=[False, True])
    return df.reset_index(drop=True)


def q_langid_macro_f1(sf_dir: str):
    """Per-class precision/recall/F1 of the pinned n-gram language-ID
    heuristic against the labelled ``lang`` column, plus the
    macro-averaged row (``lang='__macro__'``) — the standard
    classifier-quality readout a corpus-curation run reports next to the
    confusion matrix.  Reuses the confusion-matrix combiner plan
    (O(langs^2) cells cross the wire, never documents); the driver folds
    only the tiny cell table.  Macro averages the UNROUNDED per-class
    values over the truth classes, as the SQL mirror does."""
    cm = q_langid_confusion(sf_dir).to_pandas()
    classes = sorted(cm["lang"].unique())
    rows = []
    prs, rcs, f1s = [], [], []
    for c in classes:
        tp = int(cm.loc[(cm["lang"] == c) & (cm["lang_pred"] == c), "cnt"].sum())
        fp = int(cm.loc[(cm["lang"] != c) & (cm["lang_pred"] == c), "cnt"].sum())
        fn = int(cm.loc[(cm["lang"] == c) & (cm["lang_pred"] != c), "cnt"].sum())
        prec = tp / (tp + fp) if tp + fp > 0 else 0.0
        rec = tp / (tp + fn) if tp + fn > 0 else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        prs.append(prec)
        rcs.append(rec)
        f1s.append(f1)
        rows.append((c, _r(prec, 6), _r(rec, 6), _r(f1, 6)))
    rows.insert(
        0,
        (
            "__macro__",
            _r(float(np.mean(prs)), 6),
            _r(float(np.mean(rcs)), 6),
            _r(float(np.mean(f1s)), 6),
        ),
    )
    return pd.DataFrame(rows, columns=["lang", "precision", "recall", "f1"])


def q_vocab_js_drift(sf_dir: str):
    """Jensen-Shannon divergence between the token distributions of the
    two doc_id-parity halves of the corpus — the vocabulary-drift monitor
    a continuously-crawled corpus runs between snapshots (complementing
    the length-based ks_drift/wasserstein_drift with a CONTENT drift
    signal).  Shape: one combiner pass counts each half's tokens into a
    (token, c0, c1) vocab (per-batch Counters, one groupby); totals and
    the per-token JS terms then reduce DISTRIBUTIVELY (per-batch partial
    sums over the vocab Dataset, one tiny groupby) — the driver sees six
    counters, never the vocabulary.  6dp rounding absorbs the
    summation-order difference vs the mirror."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(b: pa.Table) -> pa.Table:
        from collections import Counter

        cs = [Counter(), Counter()]
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            cs[int(d) % 2].update(re.findall(r"\S+", t))
        keys = sorted(set(cs[0]) | set(cs[1]))
        return pa.table(
            {
                "token": pa.array(keys, pa.string()),
                "c0": pa.array([cs[0].get(k, 0) for k in keys], pa.int64()),
                "c1": pa.array([cs[1].get(k, 0) for k in keys], pa.int64()),
            }
        )

    vocab = (
        docs.map_batches(toks, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c0", alias_name="c0"), Sum("c1", alias_name="c1"))
        .materialize()
    )

    def totals(b: pa.Table) -> pa.Table:
        c0 = b.column("c0").to_numpy()
        c1 = b.column("c1").to_numpy()
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "t0": pa.array([int(c0.sum())], pa.int64()),
                "t1": pa.array([int(c1.sum())], pa.int64()),
                "nv": pa.array([len(b)], pa.int64()),
                "o0": pa.array([int(((c0 > 0) & (c1 == 0)).sum())], pa.int64()),
                "o1": pa.array([int(((c1 > 0) & (c0 == 0)).sum())], pa.int64()),
            }
        )

    tot = (
        vocab.map_batches(totals, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("t0", alias_name="t0"),
            Sum("t1", alias_name="t1"),
            Sum("nv", alias_name="nv"),
            Sum("o0", alias_name="o0"),
            Sum("o1", alias_name="o1"),
        )
        .to_pandas()
        .iloc[0]
    )
    t0, t1 = float(tot["t0"]), float(tot["t1"])
    ref = ray.put((t0, t1))

    def js_part(b: pa.Table, _ref=ref) -> pa.Table:
        t0_, t1_ = ray.get(_ref)
        p = b.column("c0").to_numpy() / t0_
        q = b.column("c1").to_numpy() / t1_
        m = (p + q) / 2
        with np.errstate(divide="ignore", invalid="ignore"):
            tp = np.where(p > 0, p * np.log(p / m), 0.0)
            tq = np.where(q > 0, q * np.log(q / m), 0.0)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "s": pa.array([float(tp.sum() + tq.sum())], pa.float64()),
            }
        )

    s = float(
        vocab.map_batches(js_part, batch_format="pyarrow").groupby("k").sum("s")
        .to_pandas()["sum(s)"].iloc[0]
    )
    return pd.DataFrame(
        {
            "n_tokens_union": [int(tot["nv"])],
            "n_only_first": [int(tot["o0"])],
            "n_only_second": [int(tot["o1"])],
            "js_divergence": [float(_r(0.5 * s, 6))],
        }
    )


def q_source_cross_entropy(sf_dir: str):
    """Pairwise domain-affinity matrix: cross-entropy H(A, B) = -sum_w
    p_A(w) ln q_B(w) between per-source add-1-smoothed unigram LMs over
    the shared corpus vocabulary — the data-selection signal (DSIR/
    Moore-Lewis style) that says which feeds are interchangeable and
    which bring novel text.  Per-(source, token) counts reduce
    combiner-style (the only shuffle); the sources x sources fold runs
    over the O(|V| x sources) table per token, emitting only the matrix."""
    import math

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def counts(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for s, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            for w in _oracle_tokens(t):
                cnt[(s, w)] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks], pa.string()),
                "token": pa.array([k[1] for k in ks], pa.string()),
                "c": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    tab = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby(["source", "token"])
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
    )
    vocab = sorted(tab["token"].unique())
    v = len(vocab)
    sources = sorted(tab["source"].unique())
    totals = tab.groupby("source")["c"].sum().to_dict()
    cmap = {(r["source"], r["token"]): int(r["c"]) for _, r in tab.iterrows()}
    rows = []
    for a in sources:
        na = int(totals[a])
        for b_ in sources:
            nb = int(totals[b_])
            h = 0.0
            for w in vocab:
                ca = cmap.get((a, w), 0)
                if ca == 0:
                    continue
                h += (ca * 1.0 / na) * math.log(
                    (cmap.get((b_, w), 0) + 1.0) / (nb + v)
                )
            rows.append(
                {"source_a": a, "source_b": b_, "cross_entropy": float(_r(-h, 6))}
            )
    return pd.DataFrame(rows)


def q_chao1_vocab(sf_dir: str):
    """Per-language vocabulary-richness panel: observed vocabulary, token
    mass, hapax/dis-legomena counts, the bias-corrected Chao1 richness
    estimate V + f1*(f1-1)/(2*(f2+1)) and the Good-Turing unseen-probability
    mass f1/N — the "how much vocabulary has this crawl NOT seen yet"
    dial for corpus-growth planning.  Shape: per-batch (lang, token)
    Counter combiner -> groupby sum (the only vocabulary-sized shuffle),
    then the frequency spectrum folds with a second per-batch combiner into
    O(langs) rows; each (lang, token) pair is globally unique after the
    first groupby so the spectrum partials are partitioning-independent."""
    docs = _read(sf_dir, "documents", columns=["text", "lang"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for lang, t in zip(b.column("lang").to_pylist(), b.column("text").to_pylist()):
            for tok in _oracle_tokens(t):
                cnt[(lang, tok)] += 1
        langs, toks = zip(*cnt.keys()) if cnt else ((), ())
        return pa.table(
            {
                "lang": pa.array(list(langs), pa.string()),
                "token": pa.array(list(toks), pa.string()),
                "cnt": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    tok = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .sum("cnt")
    )

    def spectrum(b: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(b)
            .rename({"sum(cnt)": "cnt"})
            .group_by("lang")
            .agg(
                pl.len().alias("vocab"),
                pl.col("cnt").sum().alias("n_tokens"),
                (pl.col("cnt") == 1).sum().alias("f1"),
                (pl.col("cnt") == 2).sum().alias("f2"),
            )
            .to_arrow()
        )

    sp = (
        tok.map_batches(spectrum, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("vocab"), Sum("n_tokens"), Sum("f1"), Sum("f2"))
        .to_pandas()
        .rename(
            columns={
                "sum(vocab)": "vocab",
                "sum(n_tokens)": "n_tokens",
                "sum(f1)": "f1",
                "sum(f2)": "f2",
            }
        )
    )
    sp["chao1"] = _r(
        sp["vocab"] + sp["f1"] * (sp["f1"] - 1.0) / (2.0 * (sp["f2"] + 1.0)), 4
    )
    sp["gt_unseen"] = _r(sp["f1"] / sp["n_tokens"], 6)
    for c in ("vocab", "n_tokens", "f1", "f2"):
        sp[c] = sp[c].astype("int64")
    return sp.sort_values("lang").reset_index(drop=True)[
        ["lang", "vocab", "n_tokens", "f1", "f2", "chao1", "gt_unseen"]
    ]


def q_fightin_words(sf_dir: str, k: int = 10, a0: float = 10.0):
    """Monroe/Colaresi/Quinn "Fightin' Words" weighted log-odds with an
    informative Dirichlet prior between src0 and src1: the standard
    what-distinguishes-these-two-corpora readout whose variance-stabilized
    z-scores don't over-rank rare tokens the way raw log-odds (or
    q_keyness_llr's G^2) do.  Prior mass per token a_w = a0 * (y1+y2)/N;
    delta = ln((y1+a_w)/(n1+a0-y1-a_w)) - ln((y2+a_w)/(n2+a0-y2-a_w));
    z = delta / sqrt(1/(y1+a_w) + 1/(y2+a_w)).  Output: the k most
    src0-leaning and k most src1-leaning tokens.  Shape: (token, y1, y2)
    count combiner -> one vocabulary groupby; totals are two scalar
    aggregates; z is scored per batch with broadcast totals and a partial
    top-k per direction keeps the driver fold at O(k x batches)."""
    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        c1, c2 = Counter(), Counter()
        for src, t in zip(b.column("source").to_pylist(), b.column("text").to_pylist()):
            if src == "src0":
                for tok in _oracle_tokens(t):
                    c1[tok] += 1
            elif src == "src1":
                for tok in _oracle_tokens(t):
                    c2[tok] += 1
        vocab = sorted(set(c1) | set(c2))
        return pa.table(
            {
                "token": pa.array(vocab, pa.string()),
                "y1": pa.array([c1.get(w, 0) for w in vocab], pa.int64()),
                "y2": pa.array([c2.get(w, 0) for w in vocab], pa.int64()),
            }
        )

    counts = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("y1"), Sum("y2"))
        .map_batches(
            lambda b: b.rename_columns(["token", "y1", "y2"]), batch_format="pyarrow"
        )
        .materialize()
    )
    tot = counts.aggregate(Sum("y1"), Sum("y2"))
    n1, n2 = float(tot["sum(y1)"]), float(tot["sum(y2)"])
    nt = n1 + n2

    def score(b: pa.Table) -> pa.Table:
        import polars as pl

        y1 = b.column("y1").to_numpy().astype(np.float64)
        y2 = b.column("y2").to_numpy().astype(np.float64)
        aw = a0 * (y1 + y2) / nt
        delta = np.log((y1 + aw) / (n1 + a0 - y1 - aw)) - np.log(
            (y2 + aw) / (n2 + a0 - y2 - aw)
        )
        z = _r(delta / np.sqrt(1.0 / (y1 + aw) + 1.0 / (y2 + aw)), 6)
        df = pl.DataFrame(
            {
                "token": pl.from_arrow(b.column("token")),
                "y1": y1.astype(np.int64),
                "y2": y2.astype(np.int64),
                "z": z,
            }
        )
        top = df.sort(["z", "token"], descending=[True, False]).head(k)
        bot = df.sort(["z", "token"], descending=[False, False]).head(k)
        return pl.concat([top, bot]).unique(subset="token").to_arrow()

    cand = counts.map_batches(score, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["z", "token"], ascending=[False, True]).reset_index(drop=True)
    top = cand.head(k).copy()
    top["side"] = "src0"
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    bot = cand.sort_values(["z", "token"], ascending=[True, True]).head(k).copy()
    bot["side"] = "src1"
    bot["rank"] = np.arange(1, len(bot) + 1, dtype=np.int64)
    out = pd.concat([top, bot], ignore_index=True)
    out["y1"] = out["y1"].astype("int64")
    out["y2"] = out["y2"].astype("int64")
    return out[["side", "rank", "token", "y1", "y2", "z"]]


def q_user_hour_entropy(sf_dir: str):
    """Temporal-regularity profile: per user with >= 10 events, the
    normalized Shannon entropy of their hour-of-day histogram (0 = a
    single-hour bot-like pattern, 1 = uniform over the hours they
    could use), summarized as count/mean/min/max per activity tier
    (10-99 vs >= 100 events) — the bot-vs-human temporal fingerprint a
    crawl-abuse screen reads.  Shape: one (user, hour) count combiner;
    the per-user entropy fold happens inside groupby(user_id) emitting
    one row each; the tier summary is a second tiny groupby.  Entropy
    folds in (hour-ascending) order on both sides."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def per_hour(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(
            pa.table({"ts": b.column("ts"), "user_id": b.column("user_id")})
        )
        return (
            df.with_columns(pl.col("ts").dt.hour().cast(pl.Int64).alias("hr"))
            .group_by(["user_id", "hr"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    cells = (
        ev.map_batches(per_hour, batch_format="pyarrow")
        .groupby(["user_id", "hr"])
        .sum("n")
    )

    def entropy(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values("hr")
        n = float(df["sum(n)"].sum())
        if n < 10:
            return pa.table(
                {"tier": pa.array([], pa.string()), "h": pa.array([], pa.float64())}
            )
        p = df["sum(n)"].to_numpy(np.float64) / n
        h = -float((p * np.log(p)).sum())
        hn = h / np.log(24.0)
        tier = "heavy" if n >= 100 else "light"
        return pa.table(
            {"tier": pa.array([tier], pa.string()), "h": pa.array([hn], pa.float64())}
        )

    per_user = (
        cells.groupby("user_id")
        .map_groups(entropy, batch_format="pyarrow")
        .groupby("tier")
        .aggregate(Count(), Sum("h"), Min("h"), Max("h"))
        .to_pandas()
        .rename(
            columns={
                "count()": "n_users",
                "sum(h)": "sh",
                "min(h)": "min_h",
                "max(h)": "max_h",
            }
        )
        .sort_values("tier")
        .reset_index(drop=True)
    )
    per_user["mean_h"] = _r(per_user["sh"] / per_user["n_users"], 6)
    per_user["min_h"] = _r(per_user["min_h"], 6)
    per_user["max_h"] = _r(per_user["max_h"], 6)
    per_user["n_users"] = per_user["n_users"].astype("int64")
    return per_user[["tier", "n_users", "mean_h", "min_h", "max_h"]]


def q_spectral_entropy(sf_dir: str):
    """Spectral entropy of the daily event volume: normalize
    q_periodogram's powers at periods 2..14 into a distribution and
    report H = -sum p ln p (period-ascending fold) and H / ln(n_periods)
    — near 1 = white-noise-flat spectrum, near 0 = one dominant cycle.
    Shape: identical reduce as periodogram (the O(days) driver series);
    the SQL mirror nests the same trig chain."""
    from .q_stats_c import q_periodogram  # explicit cross-family dep
    p = q_periodogram(sf_dir)
    if len(p) == 0 or float(p["power"].sum()) <= 0:
        return pd.DataFrame(
            columns=["n_periods", "entropy", "entropy_norm"]
        ).astype({"n_periods": "int64", "entropy": "float64", "entropy_norm": "float64"})
    pw = p.sort_values("period")["power"].to_numpy(np.float64)
    tot = float(pw.sum())
    h = 0.0
    for v in pw:  # period-ascending fold, zero powers contribute 0
        if v > 0:
            pr = v / tot
            h -= pr * np.log(pr)
    return pd.DataFrame(
        {
            "n_periods": pd.array([len(pw)], dtype="int64"),
            "entropy": [float(_r(h, 6))],
            "entropy_norm": [float(_r(h / np.log(len(pw)), 6))],
        }
    )


def q_token_movers(sf_dir: str, k: int = 10):
    """Top token-frequency MOVERS between the first and second half of the
    corpus (split by doc_id median rank = doc_id < max/2 boundary — here
    the deterministic doc_id parity-free split doc_id % 2): the k tokens
    with the largest absolute difference in relative frequency, signed —
    item-level change detection that names the drifting tokens
    q_vocab_js_drift only scores in aggregate.  Shape: one (token, half)
    count combiner -> vocabulary groupby; scoring is per batch with two
    broadcast totals and a per-batch partial top-k by |delta|."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def vc(b: pa.Table) -> pa.Table:
        from collections import Counter

        c1, c2 = Counter(), Counter()
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            tgt = c1 if int(d) % 2 == 0 else c2
            for tok in _oracle_tokens(t):
                tgt[tok] += 1
        vocab = sorted(set(c1) | set(c2))
        return pa.table(
            {
                "token": pa.array(vocab, pa.string()),
                "a": pa.array([c1.get(w, 0) for w in vocab], pa.int64()),
                "b": pa.array([c2.get(w, 0) for w in vocab], pa.int64()),
            }
        )

    counts = (
        docs.map_batches(vc, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("a"), Sum("b"))
        .map_batches(
            lambda t: t.rename_columns(["token", "a", "b"]), batch_format="pyarrow"
        )
        .materialize()
    )
    tot = counts.aggregate(Sum("a"), Sum("b"))
    na, nb = float(tot["sum(a)"]), float(tot["sum(b)"])

    def score(b: pa.Table) -> pa.Table:
        import polars as pl

        a = b.column("a").to_numpy().astype(np.float64)
        bb = b.column("b").to_numpy().astype(np.float64)
        delta = _r(bb / nb - a / na, 6)
        df = pl.DataFrame(
            {
                "token": pl.from_arrow(b.column("token")),
                "a": a.astype(np.int64),
                "b": bb.astype(np.int64),
                "delta": delta,
                "absd": np.abs(delta),
            }
        )
        return (
            df.sort(["absd", "token"], descending=[True, False]).head(k).to_arrow()
        )

    cand = counts.map_batches(score, batch_format="pyarrow").to_pandas()
    cand = (
        cand.sort_values(["absd", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    cand["a"] = cand["a"].astype("int64")
    cand["b"] = cand["b"].astype("int64")
    return cand[["rank", "token", "a", "b", "delta"]]


def q_max_repeat_ngram(sf_dir: str, max_n: int = 8):
    """Longest repeated n-gram per document (largest n in 1..8 such that
    some n-gram occurs twice), reported as a corpus histogram
    (max_rep_n, n_docs; 0 = no repeated token at all) — the
    templated-boilerplate depth signal that q_self_repetition's fixed
    3-gram fraction can't resolve.  Shape: pure per-doc map (the n-gram
    sets never leave the worker) + one tiny histogram groupby."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mrep(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            best = 0
            for n in range(min(max_n, len(toks)), 0, -1):
                grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                if len(grams) != len(set(grams)):
                    best = n
                    break
            out.append(best)
        vals, cnts = np.unique(np.array(out, np.int64), return_counts=True)
        return pa.table(
            {
                "max_rep_n": pa.array(vals, pa.int64()),
                "n_docs": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    return (
        docs.map_batches(mrep, batch_format="pyarrow")
        .groupby("max_rep_n")
        .sum("n_docs")
        .map_batches(
            lambda b: b.rename_columns(["max_rep_n", "n_docs"]),
            batch_format="pyarrow",
        )
        .sort("max_rep_n")
    )


def q_chao_shen_entropy(sf_dir: str):
    """Chao-Shen coverage-adjusted Shannon entropy of the corpus token
    distribution: Good-Turing coverage C = 1 - f1/N reweights the plug-
    in probabilities and the Horvitz-Thompson correction divides by the
    inclusion probability 1 - (1-C*p)^N — the estimator that stays
    honest when the vocabulary is under-sampled, next to q_chao1_vocab's
    richness bound.  Shape: the vocabulary combiner reduces to (count,
    n_types) cells (f1 and N are tiny aggregates of that table); the
    entropy folds over the O(distinct counts) histogram count-ascending."""
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
        .map_batches(
            lambda b: b.rename_columns(["token", "c"]), batch_format="pyarrow"
        )
    )
    hist = (
        vocab.groupby("c")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_types"})
        .sort_values("c")
        .reset_index(drop=True)
    )
    n = float((hist["c"] * hist["n_types"]).sum())
    f1 = float(hist.loc[hist["c"] == 1, "n_types"].sum())
    cov = 1.0 - f1 / n
    h_plug = 0.0
    h_cs = 0.0
    for _, r_ in hist.iterrows():  # count-ascending fold
        cc, nt = float(r_["c"]), float(r_["n_types"])
        p = cc / n
        h_plug -= nt * p * np.log(p)
        cp = cov * p
        if cp > 0:
            incl = 1.0 - np.exp(n * np.log(1.0 - cp)) if cp < 1 else 1.0
            h_cs -= nt * cp * np.log(cp) / incl
    return pd.DataFrame(
        {
            "n_tokens": pd.array([int(n)], dtype="int64"),
            "coverage": [float(_r(cov, 6))],
            "h_plugin": [float(_r(h_plug, 6))],
            "h_chao_shen": [float(_r(h_cs, 6))],
        }
    )


def q_vocab_half_life(sf_dir: str):
    """Vocabulary half-life: the smallest doc_id prefix of the corpus
    containing 50% (and 90%) of the final vocabulary — per-token first
    doc_ids fold to a first-seen histogram whose cumulative crossing
    points are the answer; early-saturating corpora (low half-life
    share) add little lexical novelty per marginal document.  Shape:
    (token, min doc_id) combiner; the O(distinct first-docs) cumulative
    fold is driver-side."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def firsts(b: pa.Table) -> pa.Table:
        best = {}
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            for w in _oracle_tokens(t):
                if w not in best or d < best[w]:
                    best[w] = int(d)
        ks = sorted(best)
        return pa.table(
            {
                "token": pa.array(ks, pa.string()),
                "fd": pa.array([best[k] for k in ks], pa.int64()),
            }
        )

    fd = (
        docs.map_batches(firsts, batch_format="pyarrow")
        .groupby("token")
        .min("fd")
        .map_batches(
            lambda b: b.rename_columns(["token", "fd"]), batch_format="pyarrow"
        )
    )
    hist = (
        fd.groupby("fd")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_new"})
        .sort_values("fd")
        .reset_index(drop=True)
    )
    v = float(hist["n_new"].sum())
    cum = hist["n_new"].cumsum()
    half = int(hist.loc[cum >= 0.5 * v, "fd"].iloc[0])
    p90 = int(hist.loc[cum >= 0.9 * v, "fd"].iloc[0])
    n_docs = int(docs.count())
    return pd.DataFrame(
        {
            "vocab": pd.array([int(v)], dtype="int64"),
            "half_life_doc": pd.array([half], dtype="int64"),
            "p90_doc": pd.array([p90], dtype="int64"),
            "half_life_frac": [float(_r((half + 1) / n_docs, 6))],
        }
    )

__all__ = [
    "q_extract_text",
    "q_token_count",
    "q_token_quantiles",
    "q_bm25_scores",
    "q_vocab_topk",
    "q_bigram_topk",
    "q_tfidf_topterms",
    "q_keywords_summary",
    "q_keywords_freq",
    "q_langid",
    "q_bpe_pair_counts",
    "q_bpe_train",
    "q_bpe_encode",
    "q_cms_token_counts",
    "q_token_entropy",
    "q_text_normalize",
    "q_bigram_logprob",
    "q_chunk_texts",
    "q_pmi_bigrams",
    "q_langid_confusion",
    "q_ngram_hash_features",
    "q_tokenizer_fertility",
    "q_char_entropy",
    "q_sentence_split",
    "q_zipf_fit",
    "q_langid_kappa",
    "q_entropy_rate",
    "q_kwic",
    "q_ngram_novelty",
    "q_stupid_backoff_logprob",
    "q_huffman_code_lengths",
    "q_langid_macro_f1",
    "q_vocab_js_drift",
    "q_source_cross_entropy",
    "q_chao1_vocab",
    "q_fightin_words",
    "q_user_hour_entropy",
    "q_spectral_entropy",
    "q_token_movers",
    "q_max_repeat_ngram",
    "q_chao_shen_entropy",
    "q_vocab_half_life",
]
