"""Driver-facing query suite with DuckDB-oracle mirrors.

Each ``q_*`` callable takes ``sf_dir`` and returns a Dataset / pandas
DataFrame / pyarrow Table; ``ORACLE_SQL`` holds the ANSI-SQL mirror DuckDB
runs on the same parquet views.  Column names (including aggregates) match
between the two on purpose — the driver's comparator sorts columns by name
and value-hashes.

Floats are rounded identically on both sides (sums 2dp, ratios/sims 4-6dp)
so value hashes are stable across summation orders.

Queries marked "rows-only" in ``__ray_entry__`` (minhash/simhash/langid/
crawl) have no SQL mirror; their correctness is covered by pytest instead
(tests/test_queries_oracle.py, tests/test_dedup.py, ...).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..fixtures import doc_html
from ..functions.text import extract_text
from ..functions.urls import canonicalize_url, host_of

# ---------------------------------------------------------------------------
# shared bits
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# TPC-H-ish relational core (proves groupby/filter/sort/join/limit operators)
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style pricing summary (reference analogue: per-class CSV agg
    sinks, pipelines/trans.py; groupby semantics SURVEY.md §2.6)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="cnt"),
    )

    def _post(b: pa.Table) -> pa.Table:
        b = _round_col(b, "sum_qty", 2)
        b = _round_col(b, "sum_price", 2)
        b = _round_col(b, "avg_disc", 6)
        return b

    return agg.map_batches(_post, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


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


def q_sort_limit(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)
    return out.map_batches(lambda b: _round_col(b, "o_totalprice", 2), batch_format="pyarrow")


def q_join_agg(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → revenue per market segment.

    The small side ships once via ray.put and each batch does a vectorized
    take — the broadcast-join pattern SURVEY.md §2.5 prescribes for
    dimension enrichment (reference token-property join, token.py:322-342)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_codes, seg_labels = pd.factorize(cust["c_mktsegment"], sort=True)
    lookup = dict(zip(cust["c_custkey"].to_numpy(), seg_codes))
    lookup_ref = ray.put((lookup, list(seg_labels)))

    class JoinSeg:
        def __init__(self):
            self.lookup, self.labels = ray.get(lookup_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            keys = b.column("o_custkey").to_numpy()
            codes = np.array([self.lookup.get(int(k), -1) for k in keys])
            seg = pa.array(
                [self.labels[c] if c >= 0 else None for c in codes], pa.string()
            )
            return b.append_column("c_mktsegment", seg)

    joined = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        JoinSeg, batch_format="pyarrow", concurrency=1
    )
    agg = joined.groupby("c_mktsegment").aggregate(
        Sum("o_totalprice", alias_name="revenue"),
        Count(alias_name="n_orders"),
    )
    return agg.map_batches(lambda b: _round_col(b, "revenue", 2), batch_format="pyarrow").sort(
        "c_mktsegment"
    )


def q_events_agg(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "value", "user_id"])
    base = ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )
    distinct = (
        ds.groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )
    b = base.to_pandas().merge(distinct.to_pandas(), on="event_type")
    for col, nd in (("sum_value", 2), ("min_value", 2), ("max_value", 2)):
        b[col] = _r(b[col].astype(float).to_numpy(), nd)
    return b.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# crawl/parse operator family over documents-derived HTML
# ---------------------------------------------------------------------------

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


_RE_HREF_Q = re.compile(r'<a [^>]*href="([^"]*)"')


def q_extract_links(sf_dir: str):
    """href extraction (reference //a/@href, web.py:68-79)."""

    def ext(b: pa.Table) -> pa.Table:
        ids, hrefs = [], []
        for i, h in zip(b.column("doc_id").to_pylist(), b.column("html").to_pylist()):
            for m in _RE_HREF_Q.findall(h):
                ids.append(i)
                hrefs.append(m)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "href": pa.array(hrefs, pa.string())})

    return _docs_html_ds(sf_dir).map_batches(ext, batch_format="pyarrow").sort("doc_id")


def q_canonicalize_urls(sf_dir: str):
    """href -> canonical url + host (sorted query params, stripped fragment)."""

    def ext(b: pa.Table) -> pa.Table:
        ids, canon, hosts = [], [], []
        for i, h in zip(b.column("doc_id").to_pylist(), b.column("html").to_pylist()):
            for m in _RE_HREF_Q.findall(h):
                c = canonicalize_url(m)
                ids.append(i)
                canon.append(c)
                hosts.append(host_of(c) if c else "")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "canonical_url": pa.array(canon, pa.string()),
                "host": pa.array(hosts, pa.string()),
            }
        )

    return _docs_html_ds(sf_dir).map_batches(ext, batch_format="pyarrow").sort("doc_id")


_RE_ETH_Q = re.compile(r'\W(0x[0-9a-f]{40})', re.IGNORECASE | re.ASCII)


def q_extract_entities(sf_dir: str):
    """ETH-address entity regex over the synth html (reference web.py:105-109)."""

    def ext(b: pa.Table) -> pa.Table:
        ids, ents = [], []
        for i, h in zip(b.column("doc_id").to_pylist(), b.column("html").to_pylist()):
            for m in _RE_ETH_Q.findall(h):
                ids.append(i)
                ents.append(m)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "entity": pa.array(ents, pa.string())})

    return _docs_html_ds(sf_dir).map_batches(ext, batch_format="pyarrow").sort("doc_id")


def q_host_histogram(sf_dir: str):
    """Frontier host histogram — the groupby(host) politeness shuffle key."""
    links = q_canonicalize_urls(sf_dir)
    return links.groupby("host").aggregate(Count(alias_name="n_links")).sort("host")


# ---------------------------------------------------------------------------
# graph family over events-derived edges (strategy building blocks)
# ---------------------------------------------------------------------------

def q_outflow_sum(sf_dir: str):
    """sum(value) over out-edges per node — the Haircut weight denominator
    (reference strategies/txs/haricut.py:15-23)."""
    agg = _events_edges(sf_dir).groupby("src").aggregate(Sum("weight", alias_name="out_sum"))
    return agg.map_batches(lambda b: _round_col(b, "out_sum", 2), batch_format="pyarrow").sort("src")


def q_node_degree(sf_dir: str):
    """Distinct undirected neighbour count — the APPR split denominator
    (reference strategies/txs/appr.py:41-49)."""
    edges = _events_edges(sf_dir)

    def both_dirs(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        node = np.concatenate([src, dst])
        nb = np.concatenate([dst, src])
        keep = node != nb  # self excluded, as the reference does
        return pa.table(
            {"node": pa.array(node[keep], pa.int64()), "neighbor": pa.array(nb[keep], pa.int64())}
        )

    return (
        edges.map_batches(both_dirs, batch_format="pyarrow")
        .groupby(["node", "neighbor"])
        .aggregate(Count(alias_name="_c"))
        .groupby("node")
        .aggregate(Count(alias_name="degree"))
        .sort("node")
    )


def q_topk_frontier(sf_dir: str):
    """Frontier drain: top-10 nodes by score, deterministic tie-break —
    the distributed pop (reference argmax pops, SURVEY.md §2.7)."""
    agg = _events_edges(sf_dir).groupby("dst").aggregate(Sum("weight", alias_name="score"))
    out = agg.map_batches(lambda b: _round_col(b, "score", 2), batch_format="pyarrow")
    return out.sort(["score", "dst"], descending=[True, False]).limit(10)


def q_bfs_reachable(sf_dir: str):
    """BFS reachable set (depth<=2, min depth per node) from node 0 over the
    events edge list — the dataflow form of the BFS strategy (reference
    strategies/txs/bfs.py) vs a recursive-CTE oracle."""
    edges = _events_edges(sf_dir)
    frontier = {0}
    depth_of = {0: 0}
    for d in (1, 2):
        if not frontier:
            break
        fr = pa.array(sorted(frontier), pa.int64())

        def hop_batch(b: pa.Table, _fr=fr) -> pa.Table:
            return b.filter(pc.is_in(b.column("src"), value_set=_fr))

        hop = edges.map_batches(hop_batch, batch_format="pyarrow")
        dsts = set(hop.unique("dst"))
        frontier = {n for n in dsts if n not in depth_of}
        for n in frontier:
            depth_of[n] = d
    return pa.table(
        {
            "node": pa.array(sorted(depth_of), pa.int64()),
            "depth": pa.array([depth_of[n] for n in sorted(depth_of)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# dedup / text-analysis family over documents
# ---------------------------------------------------------------------------

def _md5s(texts: List[str]) -> List[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def q_dedup_exact(sf_dir: str):
    """Exact dedup by content hash: hash-partition + keep min(doc_id) per
    group (reference TransferDeduplicatePipeline semantics,
    pipelines/subgraph.py:9-27).  Input doubled (doc_id+10000 clones) so
    every group really has duplicates to collapse."""
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

    def hash_stage(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "dup_hash": pa.array(_md5s(b.column("text").to_pylist()), pa.string()),
            }
        )

    return (
        docs.map_batches(clone, batch_format="pyarrow")
        .map_batches(hash_stage, batch_format="pyarrow")
        .groupby("dup_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups"))
        .sort("keep_id")
    )


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


_STOPWORDS = ("the", "a", "and", "of", "to")


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


def q_doc_fingerprint(sf_dir: str):
    """Normalized-content fingerprint (whitespace-collapsed, lowercased,
    md5) — exact-dup detection key for near-identical formatting."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        norm = [
            re.sub(r"\s+", " ", t).strip().lower() for t in b.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "fingerprint": pa.array(_md5s(norm), pa.string()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow").sort("doc_id")


def q_jaccard_pairs(sf_dir: str):
    """Token-set Jaccard for consecutive doc pairs (doc_id, doc_id+1) —
    the n-gram-Jaccard near-dup primitive."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    token_sets = {int(r.doc_id): set(re.findall(r"\S+", r.text)) for r in docs.itertuples()}
    ref = ray.put(token_sets)

    class Jac:
        def __init__(self):
            self.sets = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = [int(i) for i in b.column("doc_id").to_pylist()]
            a_id, b_id, sims = [], [], []
            for i in ids:
                j = i + 1
                if j not in self.sets:
                    continue
                s1, s2 = self.sets[i], self.sets[j]
                u = len(s1 | s2)
                sims.append(float(_r(len(s1 & s2) / u, 4)) if u else 0.0)
                a_id.append(i)
                b_id.append(j)
            return pa.table(
                {
                    "doc_a": pa.array(a_id, pa.int64()),
                    "doc_b": pa.array(b_id, pa.int64()),
                    "jaccard": pa.array(sims, pa.float64()),
                }
            )

    return (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(Jac, batch_format="pyarrow", concurrency=1)
        .sort("doc_a")
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def q_ann_bruteforce(sf_dir: str):
    """Brute-force cosine top-5 for query vectors vec_id<3: numpy matmul per
    batch against a broadcast query matrix (the baseline ANN path)."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 3").to_pandas()
    q_ids = queries["vec_id"].to_numpy()
    q_mat = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_mat))

    class Score:
        def __init__(self):
            self.q_ids, self.q = ray.get(q_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column("vec_id").to_numpy()
            m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ self.q.T  # (batch, n_queries)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                for ni, nid in enumerate(ids):
                    if int(nid) == int(qid):
                        continue
                    out_q.append(int(qid))
                    out_n.append(int(nid))
                    out_s.append(float(sims[ni, qi]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    scored = emb.map_batches(Score, batch_format="pyarrow", concurrency=1)
    # per-query top-5: small k × small q — groupby in pandas at the tail
    df = scored.to_pandas()
    df = df.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    top = df.groupby("query_id").head(5).reset_index(drop=True)
    top["sim"] = _r(top["sim"].to_numpy(), 4)
    return top


def q_embedding_norms(sf_dir: str):
    """Per-label mean L2 norm of embeddings (vector column aggregate)."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def norms(b: pa.Table) -> pa.Table:
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table(
            {
                "label": b.column("label"),
                "l2": pa.array(np.linalg.norm(m, axis=1), pa.float64()),
            }
        )

    agg = (
        emb.map_batches(norms, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Mean("l2", alias_name="mean_l2"), Count(alias_name="n_vecs"))
    )
    return agg.map_batches(lambda b: _round_col(b, "mean_l2", 4), batch_format="pyarrow").sort(
        "label"
    )


# ---------------------------------------------------------------------------
# oracle SQL mirrors
# ---------------------------------------------------------------------------

ORACLE_SQL: Dict[str, str] = {
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_discount), 6)      AS avg_disc,
               count(*)                       AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "filter_project": """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
        FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        ORDER BY l_orderkey, l_linenumber
    """,
    "sort_limit": """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "join_agg": """
        SELECT c.c_mktsegment,
               round(sum(o.o_totalprice), 2) AS revenue,
               count(*)                      AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "events_agg": """
        SELECT event_type,
               count(*)                    AS n_events,
               round(sum(value), 2)        AS sum_value,
               round(min(value), 2)        AS min_value,
               round(max(value), 2)        AS max_value,
               count(DISTINCT user_id)     AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "extract_text": f"""
        WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html, '<style[\\s\\S]*?</style>', ' ', 'g'),
                   '<script[\\s\\S]*?</script>', ' ', 'g'),
                 '<(.*?)>', ' ', 'g') AS text_out
        FROM h ORDER BY doc_id
    """,
    "extract_links": f"""
        WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
        SELECT doc_id, unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"', 1)) AS href
        FROM h ORDER BY doc_id
    """,
    "canonicalize_urls": """
        SELECT doc_id,
               'http://site' || (doc_id % 10) || '.example/d/' || ((doc_id * 7) % 500)
                 || '?a=1&b=2'                           AS canonical_url,
               'site' || (doc_id % 10) || '.example'     AS host
        FROM documents ORDER BY doc_id
    """,
    "extract_entities": f"""
        WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
        SELECT doc_id,
               unnest(regexp_extract_all(html, '\\W(0x[0-9a-f]{{40}})', 1)) AS entity
        FROM h ORDER BY doc_id
    """,
    "host_histogram": """
        SELECT 'site' || (doc_id % 10) || '.example' AS host, count(*) AS n_links
        FROM documents GROUP BY 1 ORDER BY host
    """,
    "outflow_sum": f"""
        WITH e AS ({EDGES_SQL})
        SELECT src, round(sum(weight), 2) AS out_sum FROM e GROUP BY src ORDER BY src
    """,
    "node_degree": f"""
        WITH e AS ({EDGES_SQL}),
        und AS (
            SELECT src AS node, dst AS neighbor FROM e WHERE src <> dst
            UNION ALL
            SELECT dst AS node, src AS neighbor FROM e WHERE src <> dst
        )
        SELECT node, count(DISTINCT neighbor) AS degree FROM und GROUP BY node ORDER BY node
    """,
    "topk_frontier": f"""
        WITH e AS ({EDGES_SQL})
        SELECT dst, round(sum(weight), 2) AS score FROM e
        GROUP BY dst ORDER BY score DESC, dst LIMIT 10
    """,
    "bfs_reachable": f"""
        WITH RECURSIVE e AS ({EDGES_SQL}),
        r AS (
            SELECT 0 AS node, 0 AS depth
            UNION ALL
            SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.node WHERE r.depth < 2
        )
        SELECT node, min(depth) AS depth FROM r GROUP BY node ORDER BY node
    """,
    "dedup_exact": """
        WITH doubled AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, text FROM documents
        )
        SELECT md5(text) AS dup_hash, min(doc_id) AS keep_id, count(*) AS n_dups
        FROM doubled GROUP BY md5(text) ORDER BY keep_id
    """,
    "token_count": """
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents ORDER BY doc_id
    """,
    "quality_score": """
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(list_sum(list_transform(toks, w -> len(w))) * 1.0 / len(toks), 4)
                 AS mean_token_len,
               round(len(list_filter(toks, w -> w IN ('the','a','and','of','to'))) * 1.0
                     / len(toks), 4) AS stopword_ratio
        FROM t ORDER BY doc_id
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
        FROM documents ORDER BY doc_id
    """,
    "jaccard_pairs": """
        WITH t AS (
            SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                     len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
        FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
        ORDER BY doc_a
    """,
    "ann_bruteforce": """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 3),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
            FROM q CROSS JOIN embeddings e
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, round(sim, 4) AS sim
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) <= 5
        ORDER BY query_id, sim DESC, neighbor_id
    """,
    "embedding_norms": """
        SELECT label,
               round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                      x -> x * x)))), 4) AS mean_l2,
               count(*) AS n_vecs
        FROM embeddings GROUP BY label ORDER BY label
    """,
}


SQL_QUERIES = {
    "lineitem_agg": q_lineitem_agg,
    "filter_project": q_filter_project,
    "sort_limit": q_sort_limit,
    "join_agg": q_join_agg,
    "events_agg": q_events_agg,
    "extract_text": q_extract_text,
    "extract_links": q_extract_links,
    "canonicalize_urls": q_canonicalize_urls,
    "extract_entities": q_extract_entities,
    "host_histogram": q_host_histogram,
    "outflow_sum": q_outflow_sum,
    "node_degree": q_node_degree,
    "topk_frontier": q_topk_frontier,
    "bfs_reachable": q_bfs_reachable,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_doc_fingerprint,
    "jaccard_pairs": q_jaccard_pairs,
    "ann_bruteforce": q_ann_bruteforce,
    "embedding_norms": q_embedding_norms,
}


# ---------------------------------------------------------------------------
# rows-only queries (no SQL mirror; verified by pytest instead)
# ---------------------------------------------------------------------------


# per-worker cached stage instances: task-based map_batches (no actor-pool
# CPU reservation) with construct-once-per-worker-process state
_STAGE_CACHE: dict = {}


def _cached_stage(cls):
    def run(batch: pa.Table) -> pa.Table:
        inst = _STAGE_CACHE.get(cls)
        if inst is None:
            inst = cls()
            _STAGE_CACHE[cls] = inst
        return inst(batch)

    run.__name__ = f"stage_{cls.__name__}"
    return run


def q_minhash_signatures(sf_dir: str):
    """64-perm MinHash signatures over 3-shingles (near-dup primitive)."""
    from ..stages.dedup import MinHasher

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(MinHasher), batch_format="pyarrow")
        .sort("doc_id")
    )


def q_minhash_dedup_pairs(sf_dir: str):
    """LSH candidate pairs: doubled corpus (exact dups) -> shingle -> minhash
    -> band buckets -> groupby -> pairs.  Every injected duplicate pair must
    surface (tested in tests/test_dedup.py)."""
    from ..stages.dedup import MinHashBands, MinHasher, candidate_pairs_from_bands

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
    # LSH grouping: only (doc_id, band, bucket) rows shuffle
    table = pa.concat_tables(
        [pa.table(b) for b in bands.iter_batches(batch_format="pyarrow", batch_size=65536)]
    )
    return candidate_pairs_from_bands(table)


def q_simhash(sf_dir: str):
    from ..stages.dedup import SimHasher

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(SimHasher), batch_format="pyarrow")
        .sort("doc_id")
    )


def q_langid(sf_dir: str):
    from ..stages.textstats import LangIdStage

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(LangIdStage), batch_format="pyarrow")
        .sort("doc_id")
    )


def q_rolling_fingerprints(sf_dir: str):
    from ..stages.textstats import FingerprintStage

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(FingerprintStage), batch_format="pyarrow")
        .sort("doc_id")
    )


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed ANN (scale path of ann_bruteforce): recall vs the exact
    result is asserted in tests/test_similarity.py."""
    from ..stages.similarity import IVFIndex

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 3").to_pandas()
    idx = IVFIndex(n_clusters=8, nprobe=3).build(emb)
    out = idx.search(
        queries["vec_id"].to_numpy(), np.stack(queries["embedding"].to_numpy()), k=5
    ).to_pandas()
    out["sim"] = _r(out["sim"].to_numpy(), 4)
    return out


def _crawl_store_for(sf_dir: str) -> str:
    """Idempotently materialize the documents-derived page store under /tmp
    (hash-partitioned), keyed by sf_dir."""
    import hashlib as _hl
    from pathlib import Path

    from ..fixtures import pages_from_documents, write_pages_store
    import pyarrow.parquet as _pq

    key = _hl.md5(sf_dir.encode()).hexdigest()[:10]
    store = f"/tmp/bcs_ray_pages_{key}"
    if not (Path(store) / "_MANIFEST").exists():
        docs = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
        write_pages_store(pages_from_documents(docs), store, num_partitions=16)
    return store


def _run_crawl(sf_dir: str, strategy: str, **strategy_kwargs):
    from ..crawl.engine import CrawlConfig, CrawlEngine
    from ..stages.fetch import PageStore

    store = _crawl_store_for(sf_dir)
    engine = CrawlEngine(
        PageStore(store),
        seeds=["http://site0.example/d/0"],
        config=CrawlConfig(
            strategy=strategy,
            strategy_kwargs=strategy_kwargs,
            pop_k=8,
            host_budget=4,
            max_fetches=200,
            max_rounds=100,
            seen_use_ray=True,
            seen_shards=4,
        ),
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


def q_crawl_bfs(sf_dir: str):
    """Flagship: BFS web crawl over the documents-derived page store with
    politeness budget 4/host/round and a sharded cuckoo seen set."""
    return _run_crawl(sf_dir, "bfs", depth=3)


def q_crawl_haircut(sf_dir: str):
    return _run_crawl(sf_dir, "haircut", min_weight=1e-4)


NOSQL_QUERIES = {
    "minhash_signatures": q_minhash_signatures,
    "minhash_dedup_pairs": q_minhash_dedup_pairs,
    "simhash": q_simhash,
    "langid": q_langid,
    "rolling_fingerprints": q_rolling_fingerprints,
    "ann_ivf": q_ann_ivf,
    "crawl_bfs": q_crawl_bfs,
    "crawl_haircut": q_crawl_haircut,
}
