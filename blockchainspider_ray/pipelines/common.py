"""Shared imports, helper functions and constants for the query
family modules (split from the former queries.py monolith)."""

from __future__ import annotations


import os

import os
import hashlib

import hashlib
import math

import math
import re

import re
from typing import Dict, List


import numpy as np

import numpy as np
import pandas as pd

import pandas as pd
import pyarrow as pa

import pyarrow as pa
import pyarrow.compute as pc

import pyarrow.compute as pc
import ray

import ray
import ray.data

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


from ..fixtures import doc_html

from ..fixtures import doc_html
from ..functions.text import extract_text

from ..functions.text import extract_text
from ..functions.urls import canonicalize_url, host_of


def _read(sf_dir: str, table: str, columns: List[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# SQL expression producing EXACTLY fixtures.doc_html(doc_id, text)
DOC_HTML_SQL = (
    "'<html><head><title>Doc ' || doc_id || '</title>"
    "<style>p{margin:0}</style></head><body><p>' || text || "
    "'</p><a href=\"http://site' || (doc_id % 10) || '.example/d/' || "
    "((doc_id * 7) % 500) || '?b=2&a=1#frag\">next ' || doc_id || "
    "'</a><script src=\"http://cdn' || (doc_id % 3) || "
    "'.example/app.js\"></script><script>var addr=\"0x' || "
    "md5(cast(doc_id as varchar)) || substr(md5(cast(doc_id as varchar)), 1, 8) || "
    "'\";</script></body></html>'"
)


# the events-derived edge list shared by the graph queries:
#   src = user_id % 50, dst = (user_id*13 + event_id) % 50, weight = value
EDGES_SQL = (
    "select user_id % 50 as src, (user_id * 13 + event_id) % 50 as dst, "
    "value as weight from events"
)


def _edges_batch(batch: pa.Table) -> pa.Table:
    uid_np = batch.column("user_id").to_numpy()
    eid_np = batch.column("event_id").to_numpy()
    return pa.table(
        {
            "src": pa.array(uid_np % 50, pa.int64()),
            "dst": pa.array((uid_np * 13 + eid_np) % 50, pa.int64()),
            "weight": batch.column("value"),
        }
    )


def _events_edges(sf_dir: str) -> ray.data.Dataset:
    return _read(sf_dir, "events", columns=["user_id", "event_id", "value"]).map_batches(
        _edges_batch, batch_format="pyarrow"
    )


def _r(x, nd: int):
    """Round half-away-from-zero (DuckDB's ROUND semantics; Python/numpy
    round are half-even and diverge at exact .5 boundaries)."""
    arr = np.asarray(x, dtype=np.float64)
    p = 10.0 ** nd
    return np.sign(arr) * np.floor(np.abs(arr) * p + 0.5) / p


def _round_col(batch: pa.Table, col: str, ndigits: int) -> pa.Table:
    i = batch.column_names.index(col)
    vals = _r(batch.column(col).to_numpy(zero_copy_only=False), ndigits)
    return batch.set_column(i, col, pa.array(vals, pa.float64()))


def _docs_html_ds(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "html": pa.array([doc_html(i, t) for i, t in zip(ids, texts)], pa.string()),
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow")


_RE_HREF_Q = re.compile(r'<a [^>]*href="([^"]*)"')


_RE_ETH_Q = re.compile(r'\W(0x[0-9a-f]{40})', re.IGNORECASE | re.ASCII)


_LC_CATS = ["exchange", "phish-hack", "gambling", "defi"]


def _md5s(texts: List[str]) -> List[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


_BM25_TERMS = ("join", "scan", "spark")

_BM25_TERMS = ("join", "scan", "spark")
_BM25_K1, _BM25_B = 1.2, 0.75


# PII scrub patterns, applied IN ORDER (email first so its digit runs are
# gone before the ip/phone passes).  Both sides of the oracle run the same
# RE2 engine: pyarrow.compute's replace_substring_regex / count_-
# substring_regex here, DuckDB's regexp_replace/regexp_extract_all in SQL —
# identical non-overlapping left-to-right match semantics by construction.
_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def _oracle_tokens(t: str) -> list:
    """Tokenize EXACTLY like the SQL mirrors' regexp_split_to_array(trim(
    text), '\\s+'), including the degenerate inputs an unguarded findall
    diverges (and crashes the ratio math) on: DuckDB's trim strips SPACES
    only, and splitting at a leading/trailing separator or an empty string
    emits '' tokens — '' -> [''], '\\t\\n' -> ['', ''].  Blank docs are the
    normal case for failed web-text extraction, so the Ray side must
    reproduce this rather than drop to zero tokens."""
    return re.split(r"\s+", t.strip(" "))


# the Gopher keep rule, shared verbatim by q_gopher_quality and the
# curation_pipeline gate so the composed pipeline can't drift from the
# per-op thresholds
def _gopher_stats(toks: list):
    from collections import Counter

    n = len(toks)
    mwl = sum(map(len, toks)) / n
    uq = len(set(toks)) / n
    top = max(Counter(zip(toks, toks[1:])).values()) / (n - 1) if n >= 2 else 0.0
    keep = int(30 <= n <= 100000 and 3.0 <= mwl <= 10.0 and uq >= 0.45 and top <= 0.10)
    return n, mwl, uq, top, keep


_GRAM_C = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier (golden-ratio)


def _gram_h64(toks, n: int) -> np.ndarray:
    """uint64 hashes of a token list's n-grams: per-token md5 hashes
    (stages.dedup._hash_strings64, the version-stable kernel) combined
    positionally (H = H*C + h_tok, wrapping uint64) — no gram STRINGS are
    ever built, so the decontamination probe is numpy end to end
    (VERDICT r3 #5: the per-doc Python ' '.join scan).  Only within-job
    consistency is needed; a 64-bit collision can only ADD a false
    blocklist hit with probability ~|grams|^2/2^64."""
    from ..stages.dedup import _hash_strings64

    th = _hash_strings64(toks)
    if th.size < n:
        return np.empty(0, dtype=np.uint64)
    m = th.size - n + 1
    g = th[:m].copy()
    for j in range(1, n):
        g = g * _GRAM_C + th[j : m + j]
    return g


def _gram_hits(toks, n: int, bl: np.ndarray) -> np.ndarray:
    """Boolean mask over a doc's n-gram positions: gram ∈ blocklist
    (``bl`` = sorted uint64 array from :func:`_eval_blocklist`)."""
    g = _gram_h64(toks, n)
    if g.size == 0 or bl.size == 0:
        return np.zeros(g.size, dtype=bool)
    idx = np.searchsorted(bl, g)
    idx[idx == bl.size] = bl.size - 1
    return bl[idx] == g


def _eval_blocklist(docs, n: int, mod: int):
    """Distinct n-gram blocklist of the held-out split (md5(doc_id) % mod
    == 0) as a SORTED uint64 hash array (see :func:`_gram_h64`), reduced
    batch-wise and broadcast once via ray.put (read per worker through
    _bcast_get).  Shared by q_decontaminate and the composed pipelines so
    the held-out definition cannot drift between them."""
    from ..stages.dedup import _stable_h64

    def test_grams(b: pa.Table) -> pa.Table:
        out = set()
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                toks = re.findall(r"\S+", t)
                out.update(_gram_h64(toks, n).tolist())
        return pa.table({"g": pa.array(list(out), pa.uint64())})

    col = (
        docs.map_batches(test_grams, batch_format="pyarrow")
        .to_pandas()["g"]
        .to_numpy(dtype=np.uint64)
    )
    return ray.put(np.unique(col))  # sorted + deduped


def _assign_seq_ids(counts, budget: int, bucket: int):
    """(doc_id, n_tokens) -> (doc_id, n_tokens, seq_id) by distributed
    exclusive prefix sum over doc_id order: pass 1 reduces per-bucket token
    totals (one tiny row per doc_id // bucket range) so the driver computes
    exclusive offsets; pass 2 finishes the cumsum inside
    groupby(bucket).map_groups.  Shared by q_pack_sequences and the
    composite curation pipeline."""

    def add_bkt(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.append_column("bkt", pa.array(ids // bucket, pa.int64()))

    counts = counts.map_batches(add_bkt, batch_format="pyarrow").materialize()
    bs = (
        counts.groupby("bkt")
        .sum("n_tokens")
        .to_pandas()
        .sort_values("bkt")
        .reset_index(drop=True)
    )
    cum = bs["sum(n_tokens)"].cumsum().shift(1, fill_value=0).astype("int64")
    offsets = dict(zip(bs["bkt"].astype("int64"), cum))
    off_ref = ray.put(offsets)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        df = df.sort_values("doc_id").reset_index(drop=True)
        start = int(off[int(df["bkt"].iloc[0])]) + (
            df["n_tokens"].cumsum() - df["n_tokens"]
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": df["n_tokens"].astype("int64"),
                "seq_id": (start // budget).astype("int64"),
            }
        )

    return counts.groupby("bkt").map_groups(assign, batch_format="pandas").sort("doc_id")


_STOPWORDS = ("the", "a", "and", "of", "to")


_KNN_BRUTE_MAX_CORPUS = 1_000_000  # ~0.5 GB at d=64 float64 — broadcast bound


def _guard_brute_corpus(n: int, name: str) -> None:
    """Refuse the exact take_all-the-corpus-to-the-driver + broadcast
    diagnostics above _KNN_BRUTE_MAX_CORPUS rows.  The embeddings table
    is corpus-sized (one row per document): at 10^10 docs the driver
    materialization is an OOM, so every brute-force embedding diagnostic
    must enforce the same bound embedding_knn does and point at the
    bucket-partitioned IVF/PQ index (stages/similarity.py), which never
    holds the whole corpus in one heap."""
    if n > _KNN_BRUTE_MAX_CORPUS:
        raise ValueError(
            f"{name} is an exact driver-materialized diagnostic (corpus "
            f"{n} rows > {_KNN_BRUTE_MAX_CORPUS}); route large corpora "
            f"through the IVF/PQ scale path (ann_ivf, stages/similarity.py)"
        )


def _minhash_sig_cte(num_perm: int = 64, k: int = 3) -> str:
    """Shared CTE chain computing the full-value MinHash mirror, ending in
    ``sig(doc_id, perm_id, minhash)``.  The permutation coefficients come
    from the same seeded generator the MinHasher uses; they are rendered
    into the SQL as a VALUES table, so the emitted string is plain
    standalone SQL.  The perm step reproduces numpy's wraparound uint64
    multiply (((a*h) mod 2^64 + b) mod 2^64) before the Mersenne mod —
    HUGEINT arithmetic makes that exact."""
    from ..stages.dedup import _perm_coeffs

    assert k == 3, "oracle mirrors the default 3-shingle combine"
    M = (1 << 61) - 1
    W = 1 << 64
    a, b = _perm_coeffs(num_perm)
    coeffs = ", ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)" for i in range(num_perm)
    )
    return rf"""toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
        tok AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
        th AS (SELECT doc_id, i, md5_number_lower(w[i]) AS h FROM tok),
        sh AS (
            SELECT doc_id, h AS h0,
                   lead(h, 1) OVER (PARTITION BY doc_id ORDER BY i) AS h1,
                   lead(h, 2) OVER (PARTITION BY doc_id ORDER BY i) AS h2
            FROM th
        ),
        -- rotate-xor 3-shingle combine: h0 ^ rot(h1,21) ^ rot(h2,42), % Mersenne61
        shingle AS (
            SELECT doc_id,
                   xor(xor(h0,
                           (h1 % 8796093022208::UBIGINT) * 2097152::UBIGINT + (h1 >> 43)),
                       (h2 % 4194304::UBIGINT) * 4398046511104::UBIGINT + (h2 >> 22)
                   ) % {M}::UBIGINT AS s
            FROM sh WHERE h2 IS NOT NULL
        ),
        perms(perm_id, pa, pb) AS (VALUES {coeffs}),
        vals AS (
            SELECT s.doc_id, p.perm_id,
                   CAST((((p.pa * s.s) % {W}::HUGEINT + p.pb) % {W}::HUGEINT)
                        % {M}::HUGEINT AS BIGINT) AS v
            FROM shingle s CROSS JOIN perms p
        ),
        sig AS (
            SELECT doc_id, perm_id, MIN(v) AS minhash FROM vals
            GROUP BY doc_id, perm_id
        )"""


def _pagerank_oracle_sql(iters: int = 3) -> str:
    """3 unrolled power iterations over the arithmetic crawl link graph.
    Per-term math mirrors stages/graph.py pagerank exactly ((0.85 * rank) /
    outdeg, base 0.15/n, no dangling nodes: every doc has the t1 edge);
    in-degree on this graph is <= 2, so the fold sum is order-exact and the
    6-decimal rounding compare is noise-free."""
    it = "\n".join(
        f"""        r{k + 1} AS (
            SELECT nodes.d AS node, 0.15 / nn.n + coalesce(c.s, 0) AS rank
            FROM nodes CROSS JOIN nn LEFT JOIN (
                SELECT e.dst, sum(0.85 * p.rank / dg.outdeg) AS s
                FROM edges e JOIN r{k} p ON p.node = e.src
                JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst) c ON c.dst = nodes.d
        ),"""
        for k in range(iters)
    )
    return f"""
        WITH nodes AS (SELECT doc_id AS d FROM documents),
        nn AS (SELECT count(*) AS n FROM documents),
        edges AS (
            SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM nodes, nn
            UNION
            SELECT d AS src, (d + 10) % nn.n AS dst FROM nodes, nn
            WHERE ((d + 10) % nn.n) % 10 = d % 10
        ),
        deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        r0 AS (SELECT d AS node, 1.0 / nn.n AS rank FROM nodes, nn),
{it}
        fin AS (SELECT * FROM r{iters})
        SELECT node AS doc_id, round(rank, 6) AS pagerank
        FROM fin ORDER BY node
    """


# CJK-ratio + stopword-vote language guess (textstats.predict_lang): 'zh'
# when >5% of chars are CJK, else the sorted-first language with the
# strictly-highest distinct-stopword hit count, '' when nothing matches.
def _langid_stopword_values() -> str:
    from ..stages.textstats import _LANG_STOPWORDS

    return ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_LANG_STOPWORDS)
        for w in sorted(_LANG_STOPWORDS[lang])
    )


def _rolling_fp_oracle_sql(window: int = 8, keep: int = 4) -> str:
    """Full-value mirror of textstats.rolling_fingerprints in long form
    (doc_id, fp_rank, fingerprint): token hash = md5_number_lower % M61,
    window hash = dot(window, [B^(w-1)..B^0]) with products+sum wrapping
    mod 2^64 (numpy uint64 semantics) then % M61, fingerprint = the
    ``keep`` smallest window hashes; docs shorter than the window emit
    their single min token hash, empty docs emit nothing."""
    M = (1 << 61) - 1
    W = 1 << 64
    B = 1000003
    powers = []
    p = 1
    for _ in range(window):
        powers.append(p)
        p = (p * B) % M
    powers = powers[::-1]  # position j in the window multiplies B^(w-1-j)
    leads = ",\n                   ".join(
        f"lead(h, {j}) OVER (PARTITION BY doc_id ORDER BY i) AS h{j}" for j in range(1, window)
    )
    dot = " + ".join(f"h{j}::HUGEINT * {powers[j]}::HUGEINT" for j in range(window))
    return rf"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
        tok AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
        th AS (SELECT doc_id, i, md5_number_lower(w[i]) % {M}::UBIGINT AS h FROM tok),
        nt AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
        sh AS (
            SELECT doc_id, h AS h0,
                   {leads}
            FROM th
        ),
        win AS (
            SELECT doc_id,
                   CAST((({dot}) % {W}::HUGEINT) % {M}::HUGEINT AS BIGINT) AS wh
            FROM sh WHERE h{window - 1} IS NOT NULL
        ),
        long_docs AS (
            SELECT doc_id, wh,
                   row_number() OVER (PARTITION BY doc_id ORDER BY wh) - 1 AS fp_rank
            FROM win QUALIFY fp_rank < {keep}
        ),
        short_docs AS (
            SELECT th.doc_id, CAST(MIN(th.h) AS BIGINT) AS wh, 0 AS fp_rank
            FROM th JOIN nt USING (doc_id)
            WHERE nt.n < {window} GROUP BY th.doc_id
        )
        SELECT doc_id, fp_rank, wh AS fingerprint FROM long_docs
        UNION ALL
        SELECT doc_id, fp_rank, wh AS fingerprint FROM short_docs
        ORDER BY doc_id, fp_rank
    """


# DSIR importance weights: hashed-unigram (md5-low-64 % 64) log-likelihood
# ratio of the lang='en' target slice vs the raw corpus, Laplace-smoothed,
# mean over token positions — identical smoothing/op order to the Ray side.
_DSIR_W_CTE = r"""w AS (
        SELECT doc_id, lang,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    b AS (SELECT doc_id, lang,
                 CAST(md5_number_lower(token) % 64 AS INT) AS bucket FROM w),
    raw AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS c FROM b WHERE lang = 'en' GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM b) AS rtot,
                   (SELECT count(*) FROM b WHERE lang = 'en') AS ttot),
    lr AS (
        SELECT raw.bucket,
               ln((coalesce(tgt.c, 0) + 1.0) / (tot.ttot + 64)) -
               ln((raw.c + 1.0) / (tot.rtot + 64)) AS lnr
        FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
    ),
    wts AS (
        SELECT b.doc_id, round(sum(lr.lnr) / count(*), 6) AS dsir_weight
        FROM b JOIN lr USING (bucket) GROUP BY b.doc_id
    )"""


# per-worker cached stage instances: task-based map_batches (no actor-pool
# CPU reservation) with construct-once-per-worker-process state
_STAGE_CACHE: dict = {}

# per-worker broadcast cache: ray.put once on the driver, ray.get once per
# WORKER PROCESS (not per batch) — the broadcast-small-side idiom for
# map_batches task functions (VERDICT r3 #3)
_BCAST_CACHE: dict = {}


def _bcast_get(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    val = _BCAST_CACHE.get(key)
    if val is None:
        val = ray.get(ref)
        if len(_BCAST_CACHE) >= 4:  # a pipeline may broadcast a few sides
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = val
    return val


def _cached_stage(cls):
    def run(batch: pa.Table) -> pa.Table:
        inst = _STAGE_CACHE.get(cls)
        if inst is None:
            inst = cls()
            _STAGE_CACHE[cls] = inst
        return inst(batch)

    run.__name__ = f"stage_{cls.__name__}"
    return run


def _minhash_pair_dataset(sf_dir: str):
    """Distinct MinHash-LSH candidate-pair Dataset over the doubled corpus
    (shared by ``minhash_dedup_pairs`` and ``dedup_clusters``): shingle ->
    minhash -> band buckets -> groupby -> segment-capped pair emission ->
    distinct.  Stays a lazy Dataset — nothing driver-materialized."""
    from ..stages.dedup import MinHashBands, MinHasher

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def clone(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        t = b.column("text")
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([ids, ids + 10000]), pa.int64()),
                "text": pa.concat_arrays([t.combine_chunks(), t.combine_chunks()]),
            }
        )

    bands = (
        docs.map_batches(clone, batch_format="pyarrow")
        .map_batches(_cached_stage(MinHasher), batch_format="pyarrow")
        .map_batches(_cached_stage(MinHashBands), batch_format="pyarrow")
    )

    # LSH grouping: only (doc_id, band, bucket) rows shuffle; each bucket's
    # pairs are emitted inside its group (segment-capped: stages/dedup.py
    # emit_bucket_pairs), distinct-ed by a second groupby — fully
    # distributed, no driver-side corpus materialization
    from ..stages.dedup import LSH_BUCKET_CAP, emit_bucket_pairs

    cap = int(os.environ.get("MINHASH_BUCKET_CAP", LSH_BUCKET_CAP))

    def pairs_of_group(group: pa.Table) -> pa.Table:
        pairs = emit_bucket_pairs(group.column("doc_id").to_pylist(), cap=cap)
        return pa.table(
            {
                "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
                "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )

    return (
        bands.groupby(["band_id", "bucket"])
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )


def _dsir_tok_buckets(n_buckets: int):
    """Per-worker cached token -> md5-low-64 % B bucketing kernel."""
    from ..stages.dedup import _stable_h64

    bucket_cache: dict = {}

    def tok_buckets(toks):
        out = np.empty(len(toks), dtype=np.int64)
        for i, w in enumerate(toks):
            b = bucket_cache.get(w)
            if b is None:
                b = _stable_h64(w) % n_buckets
                bucket_cache[w] = b
            out[i] = b
        return out

    return tok_buckets


def _dsir_lnr_ref(docs, n_buckets: int):
    """Corpus -> broadcast ln-likelihood-ratio table (np.float64[B]):
    pass 1 of DSIR, shared by q_dsir_weights and the pretrain_mix
    composite so the target/raw definition cannot drift."""
    import math

    tok_buckets = _dsir_tok_buckets(n_buckets)

    def partial_counts(b: pa.Table) -> pa.Table:
        raw = np.zeros(n_buckets, dtype=np.int64)
        tgt = np.zeros(n_buckets, dtype=np.int64)
        for t, lang in zip(b.column("text").to_pylist(), b.column("lang").to_pylist()):
            bk = tok_buckets(_oracle_tokens(t))
            np.add.at(raw, bk, 1)
            if lang == "en":
                np.add.at(tgt, bk, 1)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets), pa.int64()),
                "raw_c": pa.array(raw, pa.int64()),
                "tgt_c": pa.array(tgt, pa.int64()),
            }
        )

    tab = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["raw_c", "tgt_c"])
        .to_pandas()
    )
    raw_c = np.zeros(n_buckets, dtype=np.int64)
    tgt_c = np.zeros(n_buckets, dtype=np.int64)
    raw_c[tab["bucket"].to_numpy()] = tab["sum(raw_c)"].to_numpy()
    tgt_c[tab["bucket"].to_numpy()] = tab["sum(tgt_c)"].to_numpy()
    rtot, ttot = int(raw_c.sum()), int(tgt_c.sum())
    # same operation order as the SQL: ln((t+1.0)/(ttot+B)) - ln((r+1.0)/(rtot+B))
    lnr = np.array(
        [
            math.log((int(t) + 1.0) / (ttot + n_buckets))
            - math.log((int(r) + 1.0) / (rtot + n_buckets))
            for t, r in zip(tgt_c, raw_c)
        ],
        dtype=np.float64,
    )
    return ray.put(lnr)


def _crawl_store_for(sf_dir: str) -> str:
    """Idempotently materialize the documents-derived page store under /tmp
    (hash-partitioned), keyed by sf_dir."""
    import hashlib as _hl
    from pathlib import Path

    from ..fixtures import pages_from_documents, write_pages_store
    import pyarrow.parquet as _pq

    key = _hl.md5(f"{sf_dir}|v3".encode()).hexdigest()[:10]  # v-tag busts stale /tmp caches
    store = f"/tmp/bcs_ray_pages_{key}"
    if not (Path(store) / "_MANIFEST").exists():
        docs = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
        write_pages_store(pages_from_documents(docs), store, num_partitions=16)
    return store


def _distinct_rows(ds, cols):
    """Distinct rows of an all-int64 column subset via bucketed vectorized
    dedup: hash-bucket on the first column, ONE polars ``unique`` per
    bucket (64 Python calls total) — the per-distinct-key
    ``groupby(cols).map_groups(slice)`` form costs one Python call per
    distinct key and dominated the graph queries' wall time."""
    first = cols[0]

    def tag(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column(first).combine_chunks(), pa.int64())
        bkt = pc.bit_wise_and(key, pa.scalar(63, pa.int64()))
        return b.select(cols).append_column("__b", bkt)

    def uniq(g: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(g.select(cols))
            .unique(maintain_order=False)
            .to_arrow()
            .cast(pa.schema([(c, pa.int64()) for c in cols]))
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(uniq, batch_format="pyarrow")
    )


_LINK_EDGES_MEMO: Dict[tuple, "ray.data.Dataset"] = {}


def _link_edges(sf_dir: str) -> "ray.data.Dataset":
    """The crawl store's canonical found-page link graph as a materialized
    deduped int64 ``(src, dst)`` Dataset — shared (memoized per Ray job)
    by pagerank / HITS / any other whole-graph query so the parse +
    extract + dedup pipeline runs once per session, not once per query."""
    import ray.data as rd

    from ..stages.parse import extract_links_stage

    # session NAME, not job id: in local mode every ray.init() restarts
    # job numbering at 01000000, so a shutdown+init in one process (the
    # test suite's periodic Ray recycle) would collide the memo key and
    # serve object refs whose owner died with the old session
    sess = None
    if ray.is_initialized():
        try:
            sess = ray._private.worker.global_worker.node.session_name
        except Exception:
            sess = ray.get_runtime_context().get_job_id()
    key = (sf_dir, sess)
    cached = _LINK_EDGES_MEMO.get(key)
    if cached is not None:
        return cached

    store = _crawl_store_for(sf_dir)
    # partitioning=None + columns= together trip a ray 2.49 parquet-reader
    # bug (UnboundLocalError in _infer_data_and_partition_columns);
    # select_columns gets projection-pushed by the optimizer instead
    pages = rd.read_parquet(store, partitioning=None).select_columns(["url", "html"])
    pat = re.compile(r"^http://site\d+\.example/d/(\d+)$")

    def to_edges(b: pa.Table) -> pa.Table:
        links = extract_links_stage(b, include_scripts=False)
        es, ed = [], []
        for s, d in zip(
            links.column("src_url").to_pylist(), links.column("dst_url").to_pylist()
        ):
            ms, md = pat.match(s), pat.match(d)
            if ms and md:
                es.append(int(ms.group(1)))
                ed.append(int(md.group(1)))
        return pa.table(
            {"src": pa.array(es, pa.int64()), "dst": pa.array(ed, pa.int64())}
        )

    edges = _distinct_rows(
        pages.map_batches(to_edges, batch_format="pyarrow"), ["src", "dst"]
    ).materialize()
    _LINK_EDGES_MEMO[key] = edges
    return edges


def _run_crawl(sf_dir: str, strategy: str, _cfg: dict | None = None, **strategy_kwargs):
    from ..crawl.engine import CrawlConfig, CrawlEngine
    from ..stages.fetch import PageStore

    store = _crawl_store_for(sf_dir)
    cfg = dict(
        strategy=strategy,
        strategy_kwargs=strategy_kwargs,
        pop_k=8,
        host_budget=4,
        max_fetches=200,
        max_rounds=100,
        seen_use_ray=True,
        seen_shards=4,
    )
    cfg.update(_cfg or {})
    engine = CrawlEngine(
        PageStore(store),
        seeds=["http://site0.example/d/0"],
        config=CrawlConfig(**cfg),
    )
    res = engine.run()
    return pa.table(
        {
            "round": pa.array([r["round"] for r in res.crawl_order], pa.int32()),
            "pop_index": pa.array([r["pop_index"] for r in res.crawl_order], pa.int64()),
            "url": pa.array([r["url"] for r in res.crawl_order], pa.string()),
            "found": pa.array([r["found"] for r in res.crawl_order], pa.bool_()),
        }
    )


_RE_ANCHOR = re.compile(r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>')


ANCHOR_SAMPLE_K = 32


POSTINGS_SAMPLE_K = 16


def _hits_oracle_sql(iters: int = 2) -> str:
    """Unrolled HITS half-steps over the arithmetic crawl link graph —
    a(v) = sum of h(u) over in-edges, h(u) = sum of a(v) over out-edges,
    each L1-normalized; per-term math mirrors stages/graph.py hits."""
    steps = []
    prev_h = "h0"
    for k in range(iters):
        steps.append(f"""        a{k + 1}r AS (
            SELECT nodes.d AS node, coalesce(c.s, 0) AS r
            FROM nodes LEFT JOIN (
                SELECT e.dst, sum(p.r) AS s
                FROM edges e JOIN {prev_h} p ON p.node = e.src
                GROUP BY e.dst) c ON c.dst = nodes.d
        ),
        a{k + 1}t AS (SELECT sum(r) AS t FROM a{k + 1}r),
        a{k + 1} AS (SELECT node, r / t AS r FROM a{k + 1}r, a{k + 1}t),
        h{k + 1}r AS (
            SELECT nodes.d AS node, coalesce(c.s, 0) AS r
            FROM nodes LEFT JOIN (
                SELECT e.src, sum(p.r) AS s
                FROM edges e JOIN a{k + 1} p ON p.node = e.dst
                GROUP BY e.src) c ON c.src = nodes.d
        ),
        h{k + 1}t AS (SELECT sum(r) AS t FROM h{k + 1}r),
        h{k + 1} AS (SELECT node, r / t AS r FROM h{k + 1}r, h{k + 1}t),""")
        prev_h = f"h{k + 1}"
    body = "\n".join(steps)
    return f"""
        WITH nodes AS (SELECT doc_id AS d FROM documents),
        nn AS (SELECT count(*) AS n FROM documents),
        edges AS (
            SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM nodes, nn
            UNION
            SELECT d AS src, (d + 10) % nn.n AS dst FROM nodes, nn
            WHERE ((d + 10) % nn.n) % 10 = d % 10
        ),
        h0 AS (SELECT d AS node, 1.0 / nn.n AS r FROM nodes, nn),
{body}
        fin AS (SELECT 1)
        SELECT h.node AS doc_id, round(h.r, 6) AS hub, round(a.r, 6) AS auth
        FROM h{iters} h JOIN a{iters} a ON a.node = h.node ORDER BY doc_id
    """


def _kcore_oracle_sql(iters: int = 6) -> str:
    """Unrolled H-index rounds: c0 = degree; c_{k+1}(v) = max rank r over
    v's neighbours sorted by c_k desc with c_k >= r — per-round math
    mirrors stages/graph.py coreness."""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""        nb{k} AS (
            SELECT e.u AS node, p.c AS c FROM edges e JOIN c{k - 1} p ON p.node = e.v
            UNION ALL
            SELECT e.v AS node, p.c AS c FROM edges e JOIN c{k - 1} p ON p.node = e.u
        ),
        r{k} AS (
            SELECT node, c,
                   row_number() OVER (PARTITION BY node ORDER BY c DESC) AS r
            FROM nb{k}
        ),
        c{k} AS (
            SELECT node, coalesce(max(CASE WHEN c >= r THEN r END), 0) AS c
            FROM r{k} GROUP BY node
        ),""")
    body = "\n".join(steps)
    return f"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        raw AS (
            SELECT doc_id AS a, (doc_id * doc_id + 1) % nn.n AS b
            FROM documents, nn
            UNION ALL
            SELECT doc_id, (3 * doc_id + 7) % nn.n FROM documents, nn
            UNION ALL
            SELECT x.doc_id, y.doc_id FROM documents x, documents y
            WHERE x.doc_id % 50 = 0 AND y.doc_id % 50 = 0
              AND x.doc_id < y.doc_id
        ),
        edges AS (
            SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
            FROM raw WHERE a <> b
        ),
        c0 AS (
            SELECT node, count(*) AS c FROM (
                SELECT u AS node FROM edges
                UNION ALL SELECT v AS node FROM edges
            ) GROUP BY node
        ),
{body}
        fin AS (SELECT 1)
        SELECT node AS doc_id, CAST(c AS BIGINT) AS core
        FROM c{iters} ORDER BY doc_id
    """


def _warc_store_for(sf_dir: str) -> str:
    """Idempotently materialize the documents-derived WARC shard set under
    /tmp, keyed by sf_dir."""
    import hashlib as _hl
    from pathlib import Path

    import pyarrow.parquet as _pq

    from ..fixtures import write_warc_store

    key = _hl.md5(f"{sf_dir}|warc-v1".encode()).hexdigest()[:10]
    store = f"/tmp/bcs_ray_warc_{key}"
    if not (Path(store) / "part-0.warc").exists():
        docs = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        write_warc_store(docs, store, num_files=8)
    return store


_STRATA_RATES = {"en": 60, "de": 40, "fr": 40, "es": 40, "zh": 20}


def _c4_lines(d: int, text: str) -> list:
    lines = [
        text + ".",
        "please enable javascript to view this page.",
        "menu",
        f"copyright {2000 + d % 24} example corp all rights reserved.",
        "function() { return 0; }",
    ]
    if d % 3 == 0:
        lines.append("terms of use")
    return lines


_C4_LINES_SQL = """
    base AS (
        SELECT doc_id,
               text || '.' || chr(10)
                 || 'please enable javascript to view this page.' || chr(10)
                 || 'menu' || chr(10)
                 || 'copyright ' || (2000 + doc_id % 24)
                 || ' example corp all rights reserved.' || chr(10)
                 || 'function() {{ return 0; }}'
                 || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'terms of use'
                         ELSE '' END AS s
        FROM documents
    ),
    ls AS (SELECT doc_id, string_split(s, chr(10)) AS l FROM base),
    lines AS (
        SELECT doc_id, unnest(l) AS line,
               unnest(generate_series(1, len(l))) AS ord
        FROM ls
    )
"""


def _c4_line_kept(line: str) -> bool:
    """The C4 keep rule per line (Raffel et al. 2020 §2.2): >=5 words,
    terminal punctuation, and none of the js-notice / curly-brace /
    lorem-ipsum markers."""
    return bool(
        len(re.findall(r"\S+", line)) >= 5
        and line
        and line[-1] in '.!?"'
        and "javascript" not in line
        and "{" not in line
        and "lorem ipsum" not in line
    )


def _sssp_round_sql(prev: str, cur: str) -> str:
    return f"""
    {cur} AS (
        SELECT node, min(d) AS d FROM (
            SELECT node, d FROM {prev}
            UNION ALL
            SELECT e2.dst AS node, {prev}.d + e2.w AS d
            FROM {prev} JOIN e2 ON e2.src = {prev}.node
        ) GROUP BY node
    )"""


#: Static substring blocklist for q_badwords_filter (multi-pattern filter).
#: Mirrored verbatim in ORACLE_SQL["badwords_filter"]'s VALUES list.
BADWORDS = (
    "slow join",
    "error",
    "dup",
    "spark window",
    "big hash",
    "customer line",
    "stream stream",
    "query row",
)


def _emb_matrix(b: pa.Table, col: str = "embedding") -> np.ndarray:
    """Zero-copy-ish fixed-width list -> (n, 64) float64 matrix."""
    lst = b.column(col).combine_chunks()
    flat = pc.list_flatten(lst).to_numpy(zero_copy_only=False)
    return flat.reshape(b.num_rows, -1).astype(np.float64)


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _host_pagerank_oracle_sql(iters: int = 3) -> str:
    """Unrolled weighted power iteration over the host-collapsed
    arithmetic link graph (same page-edge definition as the pagerank
    oracle, grouped by endpoint % 10 with multiplicity weights)."""
    it = "\n".join(
        f"""        r{k + 1} AS (
            SELECT hosts.h AS node, 0.15 / hn.n + coalesce(c.s, 0) AS rank
            FROM hosts CROSS JOIN hn LEFT JOIN (
                SELECT e.dst, sum(0.85 * p.rank * e.w / dg.wout) AS s
                FROM edges e JOIN r{k} p ON p.node = e.src
                JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst) c ON c.dst = hosts.h
        ),"""
        for k in range(iters)
    )
    return f"""
        WITH docs AS (SELECT doc_id AS d FROM documents),
        nn AS (SELECT count(*) AS n FROM documents),
        pedges AS (
            SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM docs, nn
            UNION
            SELECT d AS src, (d + 10) % nn.n AS dst FROM docs, nn
            WHERE ((d + 10) % nn.n) % 10 = d % 10
        ),
        edges AS (
            SELECT src % 10 AS src, dst % 10 AS dst, count(*) AS w
            FROM pedges GROUP BY src % 10, dst % 10
        ),
        hosts AS (
            SELECT DISTINCT h FROM (
                SELECT src AS h FROM edges UNION ALL SELECT dst FROM edges
            )
        ),
        hn AS (SELECT count(*) AS n FROM hosts),
        deg AS (SELECT src, sum(w) AS wout FROM edges GROUP BY src),
        r0 AS (SELECT h AS node, 1.0 / hn.n AS rank FROM hosts, hn),
{it}
        fin AS (SELECT * FROM r{iters})
        SELECT node AS host, round(rank, 6) AS pagerank
        FROM fin ORDER BY node
    """


def _opic_oracle_sql(iters: int = 3) -> str:
    """Unrolled synchronous OPIC over the arithmetic link graph: cash
    spread c{k+1} = sum_in(c{k}/outdeg), history h{k+1} = h{k} + c{k}."""
    it = "\n".join(
        f"""        c{k + 1} AS (
            SELECT docs.d AS node, coalesce(s.s, 0) AS cash
            FROM docs LEFT JOIN (
                SELECT e.dst, sum(p.cash / dg.outdeg) AS s
                FROM edges e JOIN c{k} p ON p.node = e.src
                JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst) s ON s.dst = docs.d
        ),
        h{k + 1} AS (
            SELECT h{k}.node, h{k}.h + c{k}.cash AS h
            FROM h{k} JOIN c{k} ON c{k}.node = h{k}.node
        ),"""
        for k in range(iters)
    )
    return f"""
        WITH docs AS (SELECT doc_id AS d FROM documents),
        nn AS (SELECT count(*) AS n FROM documents),
        edges AS (
            SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM docs, nn
            UNION
            SELECT d AS src, (d + 10) % nn.n AS dst FROM docs, nn
            WHERE ((d + 10) % nn.n) % 10 = d % 10
        ),
        deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        c0 AS (SELECT d AS node, 1.0 / nn.n AS cash FROM docs, nn),
        h0 AS (SELECT d AS node, 0.0 AS h FROM docs),
{it}
        fin AS (
            SELECT c{iters}.node, c{iters}.cash, h{iters}.h
            FROM c{iters} JOIN h{iters} ON h{iters}.node = c{iters}.node
        )
        SELECT node AS doc_id, round(cash, 6) AS cash, round(h, 6) AS history
        FROM fin ORDER BY node
    """


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, matching DuckDB's ``levenshtein()`` on the
    short (<=64 char) prefixes this query feeds it.  Two-row DP; numpy
    vectorizes the inner minimum so a 64x64 table is ~64 tiny ops."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), np.uint32)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ch in enumerate(np.frombuffer(a.encode("utf-32-le"), np.uint32), 1):
        cur[0] = i
        sub = prev[:-1] + (bv != ch)
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # insertion term is a left-to-right scan; scalar pass over <=64 cells
        for j in range(1, len(cur)):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev, cur = cur, prev
    return int(prev[-1])


def _grouped_median_pluck(ds, key_col: str, id_col: str, value_col: str) -> dict:
    """Exact per-group median (lower middle element, rank floor((n-1)/2),
    ties by (value, id)) without ever sorting a whole group: the same
    order-preserving range-bucket two-pass as group_percentiles /
    event_value_quantiles — per-(group, value-bucket) counts give driver
    offsets (bucket-cardinality-sized), then each bucket group plucks its
    globally-ranked row locally.  Returns {group: median_value}."""
    from ray.data.aggregate import Max as _Max, Min as _Min

    mm = ds.aggregate(_Min(value_col), _Max(value_col))
    lo, hi = float(mm[f"min({value_col})"]), float(mm[f"max({value_col})"])
    span = (hi - lo) or 1.0

    def keyed(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy()
        bkt = np.minimum(((v - lo) / span * 64).astype(np.int64), 63)
        return pa.table(
            {
                key_col: b.column(key_col),
                id_col: b.column(id_col),
                value_col: b.column(value_col),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    bc = (
        keyed_ds.groupby([key_col, "bkt"])
        .count()
        .to_pandas()
        .sort_values([key_col, "bkt"])
    )
    bc["offset"] = bc.groupby(key_col)["count()"].cumsum() - bc["count()"]
    offsets = {
        (k, int(b)): int(o) for k, b, o in zip(bc[key_col], bc["bkt"], bc["offset"])
    }
    totals = bc.groupby(key_col)["count()"].sum().astype(int).to_dict()
    targets = {k: int((n - 1) // 2) for k, n in totals.items()}
    meta_ref = ray.put((offsets, targets))

    def pluck(g: pa.Table) -> pa.Table:
        offs, tgts = ray.get(meta_ref)
        df = g.to_pandas().sort_values([value_col, id_col]).reset_index(drop=True)
        k = df[key_col].iloc[0]
        base = offs[(k, int(df["bkt"].iloc[0]))]
        want = tgts[k]
        if not (base <= want < base + len(df)):
            return pa.table(
                {key_col: pa.array([], g.schema.field(key_col).type),
                 "med": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                key_col: pa.array([k], g.schema.field(key_col).type),
                "med": pa.array([float(df[value_col].iloc[want - base])], pa.float64()),
            }
        )

    hits = (
        keyed_ds.groupby([key_col, "bkt"])
        .map_groups(pluck, batch_format="pyarrow")
        .to_pandas()
    )
    return dict(zip(hits[key_col], hits["med"]))


def _count_distinct_users(ut) -> float:
    """Distinct users from the deduped (user, type) Dataset: one user-keyed
    count groupby, then a row count — no user list ever reaches the
    driver."""
    return float(ut.groupby("user_id").count().count())


def _directed_closure(edges: "ray.data.Dataset", pivot: int, forward: bool) -> set:
    """Transitive closure of ``pivot`` over a materialized (src, dst) edge
    Dataset, one streaming frontier-filter pass per hop; only node-id
    frontier sets touch the driver (at web scale the frontier would live
    in the sharded seen-set actors instead — state/seen.py)."""
    a, b = ("src", "dst") if forward else ("dst", "src")
    seen = {pivot}
    frontier = {pivot}
    while frontier:
        fr = pa.array(sorted(frontier), pa.int64())

        def hop(batch: pa.Table, _fr=fr, _a=a, _b=b) -> pa.Table:
            m = pc.is_in(batch.column(_a), value_set=_fr)
            return pa.table({"d": pc.unique(batch.filter(m).column(_b))})

        reached: set = set()
        for blk in edges.map_batches(hop, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=65536
        ):
            reached.update(pa.table(blk).column("d").to_pylist())
        frontier = reached - seen
        seen |= frontier
    return seen


def _to_pandas_any(r):
    if isinstance(r, pd.DataFrame):
        return r
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r.to_pandas()


BETWEENNESS_MAX_NODES = 100_000  # broadcast-adjacency bound (see guard)


def betweenness_over_edges(
    edges: pd.DataFrame, sources=None, scale: float = 1.0,
    max_nodes: int = BETWEENNESS_MAX_NODES,
) -> pd.DataFrame:
    """Core of q_betweenness over an explicit (src, dst) edge frame —
    factored out so tests can pin closed-form graphs.

    GUARD: this is an EXACT Brandes, which broadcasts the whole adjacency
    to every worker and runs one BFS per source — O(V*E) total.  It is
    dimension-scoped by design (the 50-node events graph); corpus-scale
    edge tables are refused with a pointer to the scalable alternatives:
    pivot-sampled Brandes (:func:`betweenness_sampled_over_edges` /
    q_betweenness_sampled) for centrality estimates, and the
    message-passing family in stages/graph.py (pagerank / hits / kcore)
    for scalar-row importance at any scale.  Same refusal convention as
    q_embedding_knn's corpus bound.

    ``sources``/``scale`` drive the sampled variant: accumulate from the
    given pivots only and multiply the partials by ``scale``."""
    adj: dict = {}
    nodes = sorted(set(edges["src"]).union(edges["dst"]))
    if max_nodes is not None and len(nodes) > max_nodes:
        raise ValueError(
            f"exact Brandes betweenness is broadcast-adjacency bound: "
            f"{len(nodes)} nodes > max_nodes={max_nodes}. Use "
            "q_betweenness_sampled (pivot-sampled, Bader-style) or the "
            "message-passing centralities in stages/graph.py at this scale."
        )
    for s, d in edges.itertuples(index=False):
        adj.setdefault(int(s), []).append(int(d))
    for k in adj:
        adj[k].sort()
    adj_ref = ray.put((nodes, adj))

    src_list = nodes if sources is None else list(sources)
    src_ds = ray.data.from_items([{"s": int(s)} for s in src_list])

    def brandes_part(b: pa.Table) -> pa.Table:
        from collections import deque

        nodes_l, adj_l = ray.get(adj_ref)
        acc: dict = {}
        for s in b.column("s").to_pylist():
            # single-source shortest-path DAG: BFS orders, path counts
            dist = {s: 0}
            sigma = {s: 1.0}
            preds: dict = {}
            order = []
            dq = deque([s])
            while dq:
                u = dq.popleft()
                order.append(u)
                for w in adj_l.get(u, ()):
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        dq.append(w)
                    if dist[w] == dist[u] + 1:
                        sigma[w] = sigma.get(w, 0.0) + sigma[u]
                        preds.setdefault(w, []).append(u)
            delta = {u: 0.0 for u in order}
            for w in reversed(order):
                for u in preds.get(w, ()):
                    delta[u] += sigma[u] / sigma[w] * (1.0 + delta[w])
                if w != s:
                    acc[w] = acc.get(w, 0.0) + delta[w]
        items = sorted(acc.items())
        return pa.table(
            {
                "node": pa.array([k for k, _ in items], pa.int64()),
                "part": pa.array([v for _, v in items], pa.float64()),
            }
        )

    agg = (
        src_ds.map_batches(brandes_part, batch_format="pyarrow")
        .groupby("node")
        .sum("part")
        .to_pandas()
        .rename(columns={"sum(part)": "betweenness"})
    )
    full = pd.DataFrame({"node": nodes}).merge(agg, on="node", how="left").fillna(0.0)
    full["betweenness"] = _r(full["betweenness"].to_numpy() * scale, 4)
    return full.sort_values("node").reset_index(drop=True)


def betweenness_sampled_over_edges(
    edges: pd.DataFrame, n_pivots: int = 64, seed: int = 7
) -> pd.DataFrame:
    """Pivot-sampled Brandes (Bader et al. 2007 style): run the
    single-source dependency accumulation from ``n_pivots`` uniformly
    sampled sources and scale partials by V/K — an unbiased estimator of
    exact betweenness whose error shrinks as K grows.  The scalable path
    for graphs past betweenness_over_edges' broadcast-adjacency bound:
    work is O(K*E) instead of O(V*E); the adjacency broadcast remains, so
    at true web scale pair this with a subgraph cut or switch to the
    message-passing centralities in stages/graph.py."""
    nodes = sorted(set(edges["src"]).union(edges["dst"]))
    k = min(int(n_pivots), len(nodes))
    if k == 0:
        return pd.DataFrame({"node": [], "betweenness": []})
    rng = np.random.default_rng(seed)
    pivots = [nodes[i] for i in rng.choice(len(nodes), size=k, replace=False)]
    return betweenness_over_edges(
        edges, sources=pivots, scale=len(nodes) / k, max_nodes=None
    )


def _jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    w = max(max(len(a), len(b)) // 2 - 1, 0)
    ma = [False] * len(a)
    mb = [False] * len(b)
    m = 0
    for i, ca in enumerate(a):
        for j in range(max(0, i - w), min(len(b), i + w + 1)):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    kk = 0
    for i, ca in enumerate(a):
        if ma[i]:
            while not mb[kk]:
                kk += 1
            if ca != b[kk]:
                t += 1
            kk += 1
    t //= 2
    return (m / len(a) + m / len(b) + (m - t) / m) / 3


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity matching DuckDB's jaro_winkler_similarity
    (RapidFuzz semantics: prefix weight 0.1, prefix capped at 4, Winkler
    boost gated at jaro > 0.7) — pinned against DuckDB on every pair in
    ORACLE_SQL['jaro_winkler_verify']."""
    j = _jaro(a, b)
    if j <= 0.7:
        return j
    p = 0
    for ca, cb in zip(a, b):
        if ca == cb and p < 4:
            p += 1
        else:
            break
    return j + 0.1 * p * (1 - j)


def _all_pairs_bfs(sf_dir: str) -> dict:
    """Synchronized all-source BFS over the undirected events graph (the
    q_eccentricity wave); returns {source: {node: dist}} including self=0."""
    edges = _events_edges(sf_dir)

    def both(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        return pa.table(
            {
                "a": pa.array(np.concatenate([s[keep], d[keep]]), pa.int64()),
                "b": pa.array(np.concatenate([d[keep], s[keep]]), pa.int64()),
            }
        )

    adj = edges.map_batches(both, batch_format="pyarrow").materialize()
    sources = list(range(50))
    dist_of = {s: {s: 0} for s in sources}
    frontier = {s: {s} for s in sources}
    depth = 0
    while any(frontier.values()):
        depth += 1
        fr = {s: pa.array(sorted(f), pa.int64()) for s, f in frontier.items() if f}

        def hop(b: pa.Table, _fr=fr) -> pa.Table:
            outs, outd = [], []
            for s, arr in _fr.items():
                m = pc.is_in(b.column("a"), value_set=arr)
                dsts = pc.unique(b.filter(m).column("b")).to_numpy()
                outs.append(np.full(len(dsts), s, np.int64))
                outd.append(dsts)
            return pa.table(
                {
                    "s": pa.array(np.concatenate(outs) if outs else [], pa.int64()),
                    "d": pa.array(np.concatenate(outd) if outd else [], pa.int64()),
                }
            )

        reached = (
            adj.map_batches(hop, batch_format="pyarrow")
            .groupby(["s", "d"])
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
            .to_pandas()
        )
        frontier = {s: set() for s in sources}
        for _, r in reached.iterrows():
            s, d = int(r["s"]), int(r["d"])
            if d not in dist_of[s]:
                dist_of[s][d] = depth
                frontier[s].add(d)

    return dist_of


def huffman_code_lengths(counts: dict) -> dict:
    """Deterministic Huffman code lengths over a token->count table: ties
    in the merge heap break on (weight, min token in subtree), so the
    tree — and every length — is unique under any partitioning.  Returns
    token -> code length (single-symbol corpus: length 1 by convention)."""
    import heapq

    if not counts:
        return {}
    if len(counts) == 1:
        return {next(iter(counts)): 1}
    heap = [(c, tok, {tok: 0}) for tok, c in counts.items()]
    heap.sort()
    heapq.heapify(heap)
    while len(heap) > 1:
        c1, t1, m1 = heapq.heappop(heap)
        c2, t2, m2 = heapq.heappop(heap)
        for k in m1:
            m1[k] += 1
        for k in m2:
            m2[k] += 1
        m1.update(m2)
        heapq.heappush(heap, (c1 + c2, min(t1, t2), m1))
    return heap[0][2]


def _gate_verdicts(sf_dir: str):
    """Per-doc (gopher keep, c4 keep) verdicts in one map pass — shared by
    q_mcnemar_gates and q_filter_ablation so the two gates' definitions
    cannot drift from q_gopher_quality / q_c4_filter."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def verdicts(b: pa.Table) -> pa.Table:
        gs, cs = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            gs.append(_gopher_stats(_oracle_tokens(t))[4])
            kept = [l for l in _c4_lines(d, t) if _c4_line_kept(l)]
            cs.append(int(len(kept) >= 2))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "g": pa.array(gs, pa.int64()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    return docs.map_batches(verdicts, batch_format="pyarrow")


_GATES_SQL = r"""
    toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    bgr AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bgr GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM bgc GROUP BY doc_id),
    gk AS (
        SELECT ws.doc_id,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS g
        FROM ws LEFT JOIN tp USING (doc_id)
    ),
    judged AS (
        SELECT doc_id, line,
               (len(regexp_extract_all(line, '\S+')) >= 5
                AND regexp_matches(line, '[.!?"]$')
                AND NOT contains(line, 'javascript')
                AND NOT contains(line, '{')
                AND NOT contains(line, 'lorem ipsum')) AS kept
        FROM lines
    ),
    c4k AS (
        SELECT doc_id,
               CAST(count(*) FILTER (kept) >= 2 AS BIGINT) AS c
        FROM judged GROUP BY doc_id
    )
"""


def _distinct_edges(sf_dir: str) -> "ray.data.Dataset":
    """DISTINCT (src, dst) of the events link graph — per-batch dedup
    combiner first so only unique pairs per block reach the groupby
    shuffle, then a (src, dst) groupby as the global dedup."""

    def pair_unique(b: pa.Table) -> pa.Table:
        df = b.select(["src", "dst"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        _events_edges(sf_dir)
        .map_batches(pair_unique, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )


def _cdc_oracle_sql(window: int = 8, mask: int = 16) -> str:
    M = (1 << 61) - 1
    W = 1 << 64
    B = 1000003
    powers = []
    p = 1
    for _ in range(window):
        powers.append(p)
        p = (p * B) % M
    powers = powers[::-1]
    leads = ",\n                   ".join(
        f"lead(h, {j}) OVER (PARTITION BY doc_id ORDER BY i) AS h{j}"
        for j in range(1, window)
    )
    dot = " + ".join(f"h{j}::HUGEINT * {powers[j]}::HUGEINT" for j in range(window))
    return rf"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
        tok AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i, w FROM toks),
        th AS (SELECT doc_id, i, md5_number_lower(w[i]) % {M}::UBIGINT AS h FROM tok),
        nt AS (SELECT doc_id, count(*) AS n FROM th GROUP BY doc_id),
        sh AS (
            SELECT doc_id, h AS h0,
                   {leads}
            FROM th
        ),
        win AS (
            SELECT doc_id,
                   CAST((({dot}) % {W}::HUGEINT) % {M}::HUGEINT AS BIGINT) AS wh
            FROM sh WHERE h{window - 1} IS NOT NULL
        ),
        cuts AS (
            SELECT doc_id, sum(CASE WHEN wh % {mask} = 0 THEN 1 ELSE 0 END) AS c
            FROM win GROUP BY doc_id
        )
        SELECT nt.doc_id,
               CAST(nt.n AS BIGINT) AS n_tokens,
               CAST(coalesce(cuts.c, 0) AS BIGINT) AS n_cuts,
               round(nt.n * 1.0 / (coalesce(cuts.c, 0) + 1), 4) AS avg_chunk_tokens
        FROM nt LEFT JOIN cuts ON cuts.doc_id = nt.doc_id
        ORDER BY nt.doc_id
    """


_FUNNEL_STAGES = ("view", "click", "signup", "purchase")


def _distinct_edges_parity(sf_dir: str, parity: int) -> "ray.data.Dataset":
    """DISTINCT (src, dst) restricted to events with event_id % 2 ==
    parity — the two temporal half-snapshots of the link graph."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_id", "value"])

    def half(b: pa.Table, _p=parity) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(b.column("event_id"), 1), _p)
        sub = b.filter(keep)
        t = _edges_batch(sub)
        df = t.select(["src", "dst"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ev.map_batches(half, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )


def _pr_unrolled(edge_cte: str, prefix: str) -> str:
    """Two unrolled uniform-teleport PageRank iterations over ``edge_cte``
    (a CTE name holding (src, dst)); emits CTEs ``{prefix}d``, ``{prefix}0``,
    ``{prefix}1``, ``{prefix}2`` and leaves the final vector in ``{prefix}2``."""
    p = prefix
    e = edge_cte
    return f"""
    {p}d AS (SELECT src, count(*) AS od FROM {e} GROUP BY src),
    {p}0 AS (SELECT n, 1.0 / 50 AS x FROM nodes),
    {p}1 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum({p}0.x / {p}d.od), 0) + 0.15 / 50 AS x
        FROM nodes
        LEFT JOIN {e} ON {e}.dst = nodes.n
        LEFT JOIN {p}0 ON {p}0.n = {e}.src
        LEFT JOIN {p}d ON {p}d.src = {e}.src
        GROUP BY nodes.n
    ),
    {p}2 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum({p}1.x / {p}d.od), 0) + 0.15 / 50 AS x
        FROM nodes
        LEFT JOIN {e} ON {e}.dst = nodes.n
        LEFT JOIN {p}1 ON {p}1.n = {e}.src
        LEFT JOIN {p}d ON {p}d.src = {e}.src
        GROUP BY nodes.n
    )"""


def _seed_pr_unrolled(edge_cte: str, deg_cte: str, prefix: str, iters: int = 2) -> str:
    """Unrolled seed-biased PageRank (TrustRank) iterations over
    ``edge_cte``; teleport vector is the ``sd`` CTE (must exist).  Leaves
    the final vector in ``{prefix}{iters}``."""
    p, e = prefix, edge_cte
    its = "\n".join(
        f"""    {p}{k + 1} AS (
        SELECT nodes.n,
               0.85 * coalesce(sum({p}{k}.x / {deg_cte}.od), 0)
               + 0.15 * any_value(sd.d) AS x
        FROM nodes JOIN sd ON sd.n = nodes.n
        LEFT JOIN {e} ON {e}.dst = nodes.n
        LEFT JOIN {p}{k} ON {p}{k}.n = {e}.src
        LEFT JOIN {deg_cte} ON {deg_cte}.src = {e}.src
        GROUP BY nodes.n
    ),"""
        for k in range(iters)
    )
    return f"""    {p}0 AS (SELECT n, d AS x FROM sd),
{its}"""


_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")

_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")
_NONASCII_RE = re.compile("[^\x00-\x7f]")


_SOFT404_RE = (
    "page not found|error 404|no longer (exists|available)|"
    "does not exist|page unavailable"
)


def _daily_counts(sf_dir: str) -> pd.DataFrame:
    """Shared reduction for the daily-series detectors (cusum/holt shape):
    combiner groupby folds the event stream to O(days) (day, n) rows —
    the only thing that ever reaches the driver."""
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

    return (
        ds.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("day")
        .reset_index(drop=True)
    )


def _pagerank_conv_oracle_sql(iters: int = 3) -> str:
    """Unrolled power-iteration chain (pagerank-mirror CTEs over the
    even-docs-only t3 variant) with per-rung L1 residuals as the final
    select."""
    it = "\n".join(
        f"""        r{k + 1} AS (
            SELECT nodes.d AS node, 0.15 / nn.n + coalesce(c.s, 0) AS rank
            FROM nodes CROSS JOIN nn LEFT JOIN (
                SELECT e.dst, sum(0.85 * p.rank / dg.outdeg) AS s
                FROM edges e JOIN r{k} p ON p.node = e.src
                JOIN deg dg ON dg.src = e.src
                GROUP BY e.dst) c ON c.dst = nodes.d
        ),"""
        for k in range(iters)
    )
    finals = "\n    UNION ALL ".join(
        f"SELECT {k} AS iter, round(sum(abs(a.rank - b.rank)), 6) AS l1_residual "
        f"FROM r{k} a JOIN r{k - 1} b USING (node)"
        for k in range(1, iters + 1)
    )
    return f"""
        WITH nodes AS (SELECT doc_id AS d FROM documents),
        nn AS (SELECT count(*) AS n FROM documents),
        edges AS (
            SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM nodes, nn
            UNION
            SELECT d AS src, (d + 10) % nn.n AS dst FROM nodes, nn
            WHERE d % 2 = 0
        ),
        deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        r0 AS (SELECT d AS node, 1.0 / nn.n AS rank FROM nodes, nn),
{it}
        fin AS (SELECT 1 AS one)
    {finals}
    ORDER BY iter
    """


def _daily_n_cents(sf_dir: str) -> pd.DataFrame:
    """Shared reduce for the rank-association pair: the event stream folds
    to O(days) rows of (day, n_events, revenue-in-integer-cents).  Per-row
    values are rounded to cents BEFORE summation (_r == DuckDB ROUND) so
    every partial is an exact integer and no float sum-order boundary
    exists; the combiner groupby moves only (day, n, cents) partials."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def per_day(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy().astype("datetime64[D]").astype(str)
        cents = _r(b.column("value").to_numpy() * 100.0, 0).astype(np.int64)
        uniq, inv = np.unique(days, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        c = np.bincount(inv, weights=cents, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(uniq, pa.string()),
                "n": pa.array(n, pa.int64()),
                "cents": pa.array(c, pa.int64()),
            }
        )

    return (
        ds.map_batches(per_day, batch_format="pyarrow")
        .groupby("day")
        .sum(["n", "cents"])
        .to_pandas()
        .rename(columns={"sum(n)": "n", "sum(cents)": "cents"})
        .sort_values("day")
        .reset_index(drop=True)
    )


def _group_interp_quantiles(sf_dir: str, qs: tuple) -> dict:
    """Shared exact interpolated per-event-type quantile machinery
    (type-7: h = q*(n-1), v = v_lo + frac(h)*(v_hi-v_lo)) — the
    order-preserving range-bucket two-pass (per-(type,bucket) counts ->
    driver offsets -> in-bucket ranks), both bracketing order statistics
    plucked by rank.  Returns {(event_type, q): value} with UNROUNDED
    doubles; used by q_percentile_interp and q_tukey_fences."""
    from ray.data.aggregate import Max, Min

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    mm = ev.aggregate(Min("value"), Max("value"))
    lo_v, hi_v = float(mm["min(value)"]), float(mm["max(value)"])
    span = (hi_v - lo_v) or 1.0

    def keyed(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy()
        bkt = np.minimum(((v - lo_v) / span * 64).astype(np.int64), 63)
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
    targets = {}
    for t, n in totals.items():
        want = set()
        for q in qs:
            h = q * (n - 1)
            want.add(int(np.floor(h)))
            want.add(int(np.ceil(h)))
        targets[t] = want
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
                "event_type": pa.array([r[0] for r in keep], pa.string()),
                "rank": pa.array([r[1] for r in keep], pa.int64()),
                "value": pa.array([r[2] for r in keep], pa.float64()),
            }
        )

    hits = (
        keyed_ds.groupby(["event_type", "bkt"])
        .map_groups(pluck, batch_format="pyarrow")
        .to_pandas()
    )
    out = {}
    for t in sorted(totals):
        n = totals[t]
        by_rank = dict(
            zip(
                hits.loc[hits["event_type"] == t, "rank"],
                hits.loc[hits["event_type"] == t, "value"],
            )
        )
        for q in qs:
            h = q * (n - 1)
            lo_r, hi_r = int(np.floor(h)), int(np.ceil(h))
            vl, vh = by_rank[lo_r], by_rank[hi_r]
            out[(t, q)] = float(vl + (h - np.floor(h)) * (vh - vl))
    return out


def _eigenvector_oracle_sql(iters: int = 3) -> str:
    it = "\n".join(
        f"""        r{k + 1}raw AS (
            SELECT e.dst AS node, sum(p.v) AS c
            FROM e JOIN r{k} p ON p.node = e.src
            GROUP BY e.dst
        ),
        r{k + 1} AS (
            SELECT nodes.x AS node,
                   coalesce(raw.c, 0) / (SELECT sum(coalesce(r2.c, 0))
                                         FROM nodes n2
                                         LEFT JOIN r{k + 1}raw r2 ON r2.node = n2.x)
                       AS v
            FROM nodes LEFT JOIN r{k + 1}raw raw ON raw.node = nodes.x
        ),"""
        for k in range(iters)
    )
    return f"""
        WITH ed AS ({EDGES_SQL}),
        e AS (SELECT DISTINCT src, dst FROM ed WHERE src <> dst),
        nodes AS (
            SELECT DISTINCT x FROM (
                SELECT src AS x FROM e UNION SELECT dst AS x FROM e
            )
        ),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT x AS node, 1.0 / nn.n AS v FROM nodes, nn),
{it}
        fin AS (SELECT * FROM r{iters})
        SELECT CAST(node AS BIGINT) AS node, round(v, 6) AS centrality
        FROM fin ORDER BY node
    """


def _bradley_terry_oracle_sql(iters: int = 3) -> str:
    it = "\n".join(
        f"""        d{k + 1} AS (
            SELECT ty.t AS tt,
                   (SELECT coalesce(sum(n.n / (pi.p + pj.p)), 0)
                    FROM nmat n
                    JOIN p{k} pi ON pi.t = ty.t
                    JOIN p{k} pj ON pj.t = n.b
                    WHERE n.a = ty.t AND n.n > 0) AS denom
            FROM types ty
        ),
        raw{k + 1} AS (
            SELECT t.t,
                   CASE WHEN d.denom > 0 THEN w.w / d.denom ELSE p.p END AS q
            FROM types t
            JOIN d{k + 1} d ON d.tt = t.t
            JOIN wsum w ON w.t = t.t
            JOIN p{k} p ON p.t = t.t
        ),
        p{k + 1} AS (
            SELECT t, q / (SELECT sum(q) FROM raw{k + 1}) AS p FROM raw{k + 1}
        ),"""
        for k in range(iters)
    )
    return f"""
    WITH c AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS t, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT t FROM c),
    days AS (SELECT DISTINCT day FROM c),
    grid AS (
        SELECT days.day, types.t, coalesce(c.n, 0) AS n
        FROM days CROSS JOIN types
        LEFT JOIN c ON c.day = days.day AND c.t = types.t
    ),
    duel AS (
        SELECT a.t AS a, b.t AS b,
               sum(CASE WHEN a.n > b.n THEN 1 ELSE 0 END) AS wins
        FROM grid a JOIN grid b ON b.day = a.day AND b.t <> a.t
        GROUP BY a.t, b.t
    ),
    nmat AS (
        SELECT d1.a, d1.b, d1.wins + d2.wins AS n
        FROM duel d1 JOIN duel d2 ON d2.a = d1.b AND d2.b = d1.a
    ),
    wsum AS (SELECT a AS t, sum(wins) * 1.0 AS w FROM duel GROUP BY a),
    p0 AS (
        SELECT t, 1.0 / (SELECT count(*) FROM types) AS p FROM types
    ),
{it}
    fin AS (SELECT * FROM p{iters})
    SELECT fin.t AS event_type,
           CAST(wsum.w AS BIGINT) AS wins,
           round(fin.p, 6) AS strength
    FROM fin JOIN wsum ON wsum.t = fin.t
    ORDER BY fin.t
    """


def _markov_mixing_oracle_sql(steps: int = 5) -> str:
    it = "\n".join(
        f"""        v{s} AS (
            SELECT p.b AS t, sum(v{s - 1}.p * p.pr) AS p
            FROM v{s - 1} JOIN p ON p.a = v{s - 1}.t
            GROUP BY p.b
        ),
        d{s} AS (
            SELECT {s} AS step,
                   round(0.5 * sum(abs(coalesce(v{s}.p, 0) - pi.pi)), 6) AS tv
            FROM pi LEFT JOIN v{s} ON v{s}.t = pi.t
        ),"""
        for s in range(1, steps + 1)
    )
    sel = "\n        UNION ALL\n".join(
        f"        SELECT step, tv FROM d{s}" for s in range(1, steps + 1)
    )
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    cells AS (
        SELECT event_type AS a, nxt AS b, count(*) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    rs AS (SELECT a, sum(n) AS rn FROM cells GROUP BY a),
    p AS (
        SELECT cells.a, cells.b, cells.n * 1.0 / rs.rn AS pr
        FROM cells JOIN rs ON rs.a = cells.a
    ),
    pi AS (
        SELECT rs.a AS t, rs.rn * 1.0 / (SELECT sum(rn) FROM rs) AS pi FROM rs
    ),
    v0 AS (SELECT 'view' AS t, 1.0 AS p),
{it}
    fin AS (
{sel}
    )
    SELECT CAST(step AS BIGINT) AS step, tv AS tv_distance
    FROM fin ORDER BY step
    """

def _survival_durations(sf_dir: str):
    """Per-user signup-to-first-purchase duration fold shared by the
    survival pipelines (q_kaplan_meier, q_log_rank_test, q_nelson_aalen,
    q_harrell_c; q_rmst integrates the KM curve) — ADVICE r3: one home
    for the censoring convention so it cannot silently diverge.

    Convention: t0 = the user's FIRST signup (ts order); event = first
    purchase STRICTLY after t0 (ev=1, dur = purchase - t0 in us); users
    without one are right-censored at the corpus max ts (ev=0).  Returns
    a Dataset of (user_id, dur, ev) rows."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    mx = ev.max("ts")
    mref = ray.put(np.datetime64(mx, "us"))

    def fold(b: pa.Table, _m=mref) -> pa.Table:
        m = _bcast_get(_m).astype("int64")
        df = b.select(["user_id", "ts", "event_type"]).to_pandas().sort_values("ts")
        sg = df[df["event_type"] == "signup"]
        if sg.empty:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "dur": pa.array([], pa.int64()),
                    "ev": pa.array([], pa.int64()),
                }
            )
        t0 = sg["ts"].iloc[0]
        pu = df[(df["event_type"] == "purchase") & (df["ts"] > t0)]
        t0us = np.datetime64(t0, "us").astype("int64")
        if pu.empty:
            dur, evt = int(m - t0us), 0
        else:
            dur = int(np.datetime64(pu["ts"].iloc[0], "us").astype("int64") - t0us)
            evt = 1
        return pa.table(
            {
                "user_id": pa.array([int(df["user_id"].iloc[0])], pa.int64()),
                "dur": pa.array([dur], pa.int64()),
                "ev": pa.array([evt], pa.int64()),
            }
        )

    return ev.groupby("user_id").map_groups(fold, batch_format="pyarrow")


__all__ = [  # explicit so underscore helpers star-export too
    "_BCAST_CACHE",
    "_bcast_get",
    "_GRAM_C",
    "_gram_h64",
    "_gram_hits",
    "_guard_brute_corpus",
    "_survival_durations",
    "BETWEENNESS_MAX_NODES",
    "betweenness_sampled_over_edges",
    "ANCHOR_SAMPLE_K",
    "BADWORDS",
    "Count",
    "DOC_HTML_SQL",
    "Dict",
    "EDGES_SQL",
    "List",
    "Max",
    "Mean",
    "Min",
    "POSTINGS_SAMPLE_K",
    "Sum",
    "_BM25_B",
    "_BM25_K1",
    "_BM25_TERMS",
    "_C4_LINES_SQL",
    "_CORR_COLS",
    "_CTRL_RE",
    "_DSIR_W_CTE",
    "_FUNNEL_STAGES",
    "_GATES_SQL",
    "_KNN_BRUTE_MAX_CORPUS",
    "_LC_CATS",
    "_LINK_EDGES_MEMO",
    "_NONASCII_RE",
    "_PII_PATTERNS",
    "_RE_ANCHOR",
    "_RE_ETH_Q",
    "_RE_HREF_Q",
    "_SOFT404_RE",
    "_STAGE_CACHE",
    "_STOPWORDS",
    "_STRATA_RATES",
    "_all_pairs_bfs",
    "_assign_seq_ids",
    "_bradley_terry_oracle_sql",
    "_c4_line_kept",
    "_c4_lines",
    "_cached_stage",
    "_cdc_oracle_sql",
    "_count_distinct_users",
    "_crawl_store_for",
    "_daily_counts",
    "_daily_n_cents",
    "_directed_closure",
    "_distinct_edges",
    "_distinct_edges_parity",
    "_distinct_rows",
    "_docs_html_ds",
    "_dsir_lnr_ref",
    "_dsir_tok_buckets",
    "_edges_batch",
    "_eigenvector_oracle_sql",
    "_emb_matrix",
    "_eval_blocklist",
    "_events_edges",
    "_gate_verdicts",
    "_gopher_stats",
    "_group_interp_quantiles",
    "_grouped_median_pluck",
    "_hits_oracle_sql",
    "_host_pagerank_oracle_sql",
    "_jaro",
    "_kcore_oracle_sql",
    "_langid_stopword_values",
    "_levenshtein",
    "_link_edges",
    "_markov_mixing_oracle_sql",
    "_md5s",
    "_minhash_pair_dataset",
    "_minhash_sig_cte",
    "_opic_oracle_sql",
    "_oracle_tokens",
    "_pagerank_conv_oracle_sql",
    "_pagerank_oracle_sql",
    "_pr_unrolled",
    "_r",
    "_read",
    "_rolling_fp_oracle_sql",
    "_round_col",
    "_run_crawl",
    "_seed_pr_unrolled",
    "_sssp_round_sql",
    "_to_pandas_any",
    "_warc_store_for",
    "betweenness_over_edges",
    "canonicalize_url",
    "doc_html",
    "extract_text",
    "hashlib",
    "host_of",
    "huffman_code_lengths",
    "jaro_winkler",
    "math",
    "np",
    "os",
    "pa",
    "pc",
    "pd",
    "ray",
    "re",
]
