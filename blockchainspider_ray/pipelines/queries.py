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

import os
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
    # dense custkey -> segment-code array: the probe is one np.take per
    # batch, not a per-row dict.get loop (round-1 VERDICT #5)
    keys_np = cust["c_custkey"].to_numpy().astype(np.int64)
    dense = np.full((int(keys_np.max()) + 1) if len(keys_np) else 1, -1, dtype=np.int32)
    dense[keys_np] = seg_codes.astype(np.int32)
    lookup_ref = ray.put((dense, np.asarray(list(seg_labels), dtype=object)))

    def join_seg(b: pa.Table, _ref=lookup_ref) -> pa.Table:
        # plain TASK (no actor pool: pool startup cost ~2s/query — measured
        # r2) + plasma-shared lookup (ray.get of a local object is a
        # zero-copy shared-memory read).  Broadcast join AND partial
        # aggregation in one pass: the groupby shuffle moves
        # n_batches x n_segments rows, never the order rows (combiner
        # pattern the 100-TB guidance demands).
        dense, labels = ray.get(_ref)
        keys = b.column("o_custkey").to_numpy().astype(np.int64)
        prices = b.column("o_totalprice").to_numpy()
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
                "c_mktsegment": pa.array(labels[np.flatnonzero(present)], pa.string()),
                "rev_part": pa.array(sums[present], pa.float64()),
                "cnt_part": pa.array(counts[present].astype(np.int64), pa.int64()),
            }
        )

    partials = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        join_seg, batch_format="pyarrow"
    )
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("rev_part", alias_name="revenue"),
        Sum("cnt_part", alias_name="n_orders"),
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


def q_validated_entities(sf_dir: str):
    """Checksum-VALIDATED entity extraction (reference web.py:94-109: BTC
    candidates pass base58check via ``bitcoin.is_address``, ETH candidates
    pass ``Web3.isAddress`` incl. EIP-55).  Per doc, four deterministic
    candidates enter validation: the extracted ETH address in EIP-55 form
    (valid), a case-corrupted EIP-55 form (invalid), a constructed
    base58check BTC address (valid), and its last-char corruption
    (invalid) — the survivors are exactly the valid half.  Rows-only: no
    SQL mirror (keccak/base58 aren't DuckDB-expressible); pinned in
    tests/test_text.py."""
    import hashlib as _hl

    from ..functions.checksums import (
        btc_address_from_hash160,
        eth_checksum_address,
        is_btc_address,
        is_eth_address,
    )

    def ext(b: pa.Table) -> pa.Table:
        ids, nets, addrs = [], [], []
        for i, h in zip(b.column("doc_id").to_pylist(), b.column("html").to_pylist()):
            cands = []
            for m in _RE_ETH_Q.findall(h):
                good = eth_checksum_address(m.lower())
                cands.append(("ETH", good))
                # flip the case of the first letter -> EIP-55 invalid
                body = list(good[2:])
                for j, ch in enumerate(body):
                    if ch.isalpha():
                        body[j] = ch.lower() if ch.isupper() else ch.upper()
                        cands.append(("ETH", "0x" + "".join(body)))
                        break
            btc_good = btc_address_from_hash160(_hl.md5(f"btc-{i}".encode()).digest()[:4] * 5)
            btc_bad = btc_good[:-1] + ("2" if btc_good[-1] != "2" else "3")
            cands += [("BTC", btc_good), ("BTC", btc_bad)]
            for net, a in cands:
                ok = is_btc_address(a) if net == "BTC" else is_eth_address(a)
                if ok:
                    ids.append(i)
                    nets.append(net)
                    addrs.append(a)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "net": pa.array(nets, pa.string()),
                "address": pa.array(addrs, pa.string()),
            }
        )

    return (
        _docs_html_ds(sf_dir)
        .map_batches(ext, batch_format="pyarrow")
        .sort(["doc_id", "net", "address"])
    )


_LC_CATS = ["exchange", "phish-hack", "gambling", "defi"]


def q_labelcloud_parse(sf_dir: str):
    """Etherscan labelcloud reader (reference spiders/labels/
    labelcloud.py:73-135): parse dropdown anchors with the reference's
    regexes (tag-strip ``<.*?>``, category substring match against the
    allow-list, first-digits size extraction), drop non-matching
    categories, then fan out the tabbed pagination plan (subcatid tabs
    with totals -> start offsets at page_size=100) — one row per would-be
    page request.  The labelcloud HTML synthesizes deterministically from
    distinct ``doc_id % 20`` labels; the SQL oracle mirrors the
    arithmetic."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def pages_of(b: pa.Table) -> pa.Table:
        ks = sorted({int(i) % 20 for i in b.column("doc_id").to_pylist()})
        # one labelcloud page per batch's label set (idempotent: dedup later)
        anchors = []
        for k in ks:
            word = _LC_CATS[k % 4] if k % 5 != 4 else "misc"
            size = 10 + (k * 37) % 190
            anchors.append(
                f'<a href="/accounts/label/label{k}"><span>{word.title()} label{k}</span> ({size})</a>'
            )
        html = '<div class="dropdown-menu">' + "".join(anchors) + "</div>"
        out_label, out_cat, out_sub, out_start = [], [], [], []
        for m in re.finditer(r"<a\b[^>]*href=\"([^\"]+)\"[^>]*>(.*?)</a>", html):
            href, body = m.group(1), m.group(2)
            text = re.sub("<.*?>", "", body)  # reference tag-strip
            category = next((c for c in _LC_CATS if text.lower().find(c) >= 0), None)
            if not category:
                continue  # reference skips unmatched categories
            msize = re.search(r"(\d+)\s*\)?\s*$", text)
            size = int(msize.group(1)) if msize else 100
            label = href.rsplit("/", 1)[-1]
            for subcatid, total in ((1, size), (2, size // 2)):
                for start in range(0, total, 100):
                    out_label.append(label)
                    out_cat.append(category)
                    out_sub.append(subcatid)
                    out_start.append(start)
        return pa.table(
            {
                "label": pa.array(out_label, pa.string()),
                "category": pa.array(out_cat, pa.string()),
                "subcatid": pa.array(out_sub, pa.int64()),
                "start": pa.array(out_start, pa.int64()),
            }
        )

    out = docs.map_batches(pages_of, batch_format="pyarrow")
    # batches can repeat labels -> distinct page-request plan
    return (
        out.groupby(["label", "category", "subcatid", "start"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort(["label", "subcatid", "start"])
    )


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


_BM25_TERMS = ("join", "scan", "spark")
_BM25_K1, _BM25_B = 1.2, 0.75


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


def _eval_blocklist(docs, n: int, mod: int):
    """Distinct n-gram blocklist of the held-out split (md5(doc_id) % mod
    == 0), reduced batch-wise and broadcast once via ray.put.  Shared by
    q_decontaminate and q_curation_pipeline so the held-out definition
    cannot drift between the single op and the composed pipeline."""
    from ..stages.dedup import _stable_h64

    def test_grams(b: pa.Table) -> pa.Table:
        out = set()
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                toks = re.findall(r"\S+", t)
                out.update(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
        return pa.table({"g": pa.array(list(out), pa.string())})

    blocklist = set(
        docs.map_batches(test_grams, batch_format="pyarrow").to_pandas()["g"]
    )
    return ray.put(blocklist)


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
        bl = ray.get(ref)
        ids, hits = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                continue
            toks = re.findall(r"\S+", t)
            ids.append(d)
            hits.append(
                sum(
                    " ".join(toks[i : i + n]) in bl
                    for i in range(len(toks) - n + 1)
                )
            )
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
        bl = ray.get(bl_ref)
        ids, ns, fps = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                continue  # held-out split never trains
            toks = _oracle_tokens(t)
            n = len(toks)
            if not _gopher_stats(toks)[4]:
                continue
            if any(
                " ".join(toks[i : i + n_gram]) in bl
                for i in range(len(toks) - n_gram + 1)
            ):
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
        bl = ray.get(bl_ref)
        lnr = ray.get(lnr_ref)
        ids, ns = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if _stable_h64(str(d)) % mod == 0:
                continue  # held-out split never trains
            toks = _oracle_tokens(t)
            if not _gopher_stats(toks)[4]:
                continue
            if any(
                " ".join(toks[i : i + n_gram]) in bl
                for i in range(len(toks) - n_gram + 1)
            ):
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


def q_dup_span_fraction(sf_dir: str, n: int = 5):
    """Exact duplicate-span signal (the n-gram-granular cousin of Lee et
    al. 2022's exact substring dedup): for every doc, the fraction of its
    5-gram token positions whose gram occurs in >= 2 distinct documents
    corpus-wide.  Shape: docs emit (gram, doc_id, positional count) rows
    pre-aggregated per doc; groupby(gram) decides duplication inside each
    group (a gram's group holds one row per doc, never the corpus); the
    per-doc dup counts and gram totals reunite through one more groupby —
    no join, no driver-side state.  The shuffle key is a 256-way hash
    bucket OVER the gram (all rows of one gram co-locate, but each group
    holds many grams) so the verdict stage is a handful of vectorized
    pandas groupbys, not one Python call per distinct gram.  Gram keys
    stay strings for exactness; at 10^10 docs swap in _hash_strings64 keys
    (128-bit if birthday-bound matters) to cut shuffle bytes and raise the
    bucket count with the corpus."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..stages.dedup import _hash_strings64

    def emit(b: pa.Table) -> pa.Table:
        from collections import Counter

        gs, ds, cs = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = re.findall(r"\S+", t)
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            for g, c in Counter(grams).items():
                gs.append(g)
                ds.append(d)
                cs.append(c)
        gb = (_hash_strings64(gs) % np.uint64(256)).astype(np.int64)
        return pa.table(
            {
                "gb": pa.array(gb, pa.int64()),
                "g": pa.array(gs, pa.string()),
                "doc_id": pa.array(ds, pa.int64()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    # consumed twice (dup verdict + per-doc totals): pin the gram table
    # once instead of re-tokenizing the corpus
    pairs = docs.map_batches(emit, batch_format="pyarrow").materialize()

    def judge(b: pa.Table) -> pa.Table:
        # rows are unique per (gram, doc): group size == distinct docs
        df = b.select(["g", "doc_id", "c"]).to_pandas()
        keep = df[df.groupby("g")["doc_id"].transform("size") >= 2]
        return pa.table(
            {
                "doc_id": pa.array(keep["doc_id"].to_numpy(), pa.int64()),
                "dup": pa.array(keep["c"].to_numpy(), pa.int64()),
                "tot": pa.array(np.zeros(len(keep), np.int64), pa.int64()),
            }
        )

    dup_rows = pairs.groupby("gb").map_groups(judge, batch_format="pyarrow")

    def tot_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "dup": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "tot": b.column("sum(c)"),
            }
        )

    totals = (
        pairs.groupby("doc_id").sum("c").map_batches(tot_rows, batch_format="pyarrow")
    )
    per_doc = dup_rows.union(totals).groupby("doc_id").aggregate(Sum("dup"), Sum("tot"))

    def finish(b: pa.Table) -> pa.Table:
        dup = b.column("sum(dup)").to_numpy()
        tot = b.column("sum(tot)").to_numpy()
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_grams": pa.array(tot, pa.int64()),
                "n_dup": pa.array(dup, pa.int64()),
                "dup_frac": pa.array(_r(dup / tot, 6), pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow").sort("doc_id")


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


def q_snapshot_delta(sf_dir: str):
    """Two-snapshot presence diff (the recrawl delta shape: which keys
    appeared, vanished, or persisted between two crawl windows).  The
    events range splits at its midpoint; per user the early/late presence
    bits reduce inside each batch (0/1 max combiner) so the shuffle moves
    one row per (batch, user), and the status is a post-agg case map."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])
    mm = ev.aggregate(Min("ts"), Max("ts"))
    to_us = lambda v: int(pd.Timestamp(v).value // 1000)  # noqa: E731
    mn, mx = to_us(mm["min(ts)"]), to_us(mm["max(ts)"])
    mid_us = mn + (mx - mn) // 2

    def flags(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        early = pc.cast(pc.less(us, pa.scalar(mid_us, pa.int64())), pa.int64())
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "early": early,
                "late": pc.subtract(pa.scalar(1, pa.int64()), early),
            }
        )
        # per-batch combiner: one row per user before the shuffle
        return t.group_by("user_id").aggregate([("early", "max"), ("late", "max")])

    agg = (
        ev.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("early_max", alias_name="early"), Max("late_max", alias_name="late"))
    )

    def status(b: pa.Table) -> pa.Table:
        e = b.column("early").to_numpy()
        l = b.column("late").to_numpy()
        s = np.where(e & l, "retained", np.where(l.astype(bool), "added", "removed"))
        return pa.table(
            {"user_id": b.column("user_id"), "status": pa.array(s.tolist(), pa.string())}
        )

    return agg.map_batches(status, batch_format="pyarrow").sort("user_id")


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
    """Token-set Jaccard for consecutive doc pairs (doc_id, doc_id+1) — the
    n-gram-Jaccard near-dup primitive, as a distributed pair-shuffle: each
    doc emits (pair_id=own, role=a) and (pair_id=own-1, role=b) rows of
    distinct tokens; groupby(pair_id) co-locates exactly the two docs of a
    pair, so no worker ever holds the corpus."""
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()

    def emit_roles(b: pa.Table) -> pa.Table:
        pair_ids, roles, toks = [], [], []
        for i, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            distinct = sorted(set(re.findall(r"\S+", t)))
            if i + 1 < n_docs:  # pair (i, i+1)
                pair_ids.append(i)
                roles.append("a")
                toks.append(distinct)
            if i - 1 >= 0:  # pair (i-1, i)
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

    def jaccard_of_pair(group: pa.Table) -> pa.Table:
        if group.num_rows != 2:  # corpus edge: only one side present
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        pid = int(group.column("pair_id")[0].as_py())
        by_role = dict(zip(group.column("role").to_pylist(), group.column("tokens").to_pylist()))
        s1, s2 = set(by_role["a"]), set(by_role["b"])
        u = len(s1 | s2)
        sim = float(_r(len(s1 & s2) / u, 4)) if u else 0.0
        return pa.table(
            {
                "doc_a": pa.array([pid], pa.int64()),
                "doc_b": pa.array([pid + 1], pa.int64()),
                "jaccard": pa.array([sim], pa.float64()),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(emit_roles, batch_format="pyarrow")
        .groupby("pair_id")
        .map_groups(jaccard_of_pair, batch_format="pyarrow")
        .sort("doc_a")
    )


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def q_ann_pq(sf_dir: str):
    """Product-quantization ANN (stages/similarity.py PQCodebook): 8
    subspaces x 256 centroids fit on the unbiased hash sample, vectors
    encoded to 8-byte codes, queries scored by ADC table lookups — the
    memory-scale path where 10^10 raw vectors can't be held but their
    codes can.  Same query set as ann_bruteforce (vec_id < 3, top-5);
    rows-only in the driver gate (approximation), recall-vs-brute-force
    pinned in tests/test_similarity.py."""
    from ..stages.similarity import pq_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 3").to_pandas()
    q_ids = queries["vec_id"].to_numpy()
    q_mat = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
    out = pq_topk(emb, q_ids, q_mat, k=5, m=8)
    return out.set_column(
        out.column_names.index("sim"),
        "sim",
        pa.array(_r(out.column("sim").to_numpy(), 4), pa.float64()),
    )


def q_ann_bruteforce(sf_dir: str):
    """Brute-force cosine top-5 for query vectors vec_id<3: numpy matmul per
    batch against a broadcast query matrix (the baseline ANN path)."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 3").to_pandas()
    q_ids = queries["vec_id"].to_numpy()
    q_mat = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_mat))

    def score(b: pa.Table, _ref=q_ref) -> pa.Table:
        # plain task + plasma-shared query matrix (zero-copy local read;
        # no actor-pool startup cost per query invocation)
        q_ids, q = ray.get(_ref)
        ids = b.column("vec_id").to_numpy()
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q.T  # (batch, n_queries)
        out_q, out_n, out_s = [], [], []
        k = 5
        for qi, qid in enumerate(q_ids):
            col = sims[:, qi]
            mask = ids != qid
            cand = np.flatnonzero(mask)
            # per-batch partial top-k: only k rows per query leave the
            # task, so the tail merge is O(k * n_blocks), not O(corpus)
            if len(cand) > k:
                order = np.lexsort((ids[cand], -col[cand]))[:k]
                cand = cand[order]
            for ni in cand:
                out_q.append(int(qid))
                out_n.append(int(ids[ni]))
                out_s.append(float(col[ni]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    scored = emb.map_batches(score, batch_format="pyarrow")
    # merge of per-block top-5s: k x n_blocks rows — tiny by construction
    df = scored.to_pandas()
    df = df.sort_values(["query_id", "sim", "neighbor_id"], ascending=[True, False, True])
    top = df.groupby("query_id").head(5).reset_index(drop=True)
    top["sim"] = _r(top["sim"].to_numpy(), 4)
    return top


def q_embedding_neardup_pairs(sf_dir: str, tau: float = 0.4, grid: int = 4):
    """Embedding-cosine near-duplicate pairs: all (vec_a < vec_b) with
    cosine(a, b) >= tau — the exact all-pairs similarity join, distributed
    via grid partitioning (1-bucket-theta style): each vector is replicated
    to the ``grid`` unordered block cells containing its block (block =
    vec_id % grid), a plain ``groupby('cell')`` co-locates every candidate
    pair exactly once, and each cell computes its slice of the similarity
    matrix with one float64 matmul.  Shuffle volume is O(N*grid) rows and
    per-cell memory is O((2N/grid)^2) — grid scales as sqrt(N^2/mem), no
    side is ever broadcast or driver-materialized.  Same-block pairs are
    emitted only by the diagonal cell, cross-block pairs only by their one
    off-diagonal cell, so no dedup pass is needed."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def to_cells(b: pa.Table) -> pa.Table:
        n = b.num_rows
        blk = (b.column("vec_id").to_numpy() % grid).astype(np.int64)
        cells = np.concatenate(
            [np.minimum(blk, o) * grid + np.maximum(blk, o) for o in range(grid)]
        )
        rep = b.take(pa.array(np.tile(np.arange(n), grid)))
        return rep.append_column("cell", pa.array(cells, pa.int64()))

    def cell_pairs(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        g1, g2 = cell // grid, cell % grid
        ids = g.column("vec_id").to_numpy()
        blk = (ids % grid).astype(np.int64)
        m = np.stack(g.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        if g1 == g2:
            full = m @ m.T
            iu, ju = np.triu_indices(len(ids), k=1)
            sims = full[iu, ju]
        else:
            li, ri = np.flatnonzero(blk == g1), np.flatnonzero(blk == g2)
            cross = m[li] @ m[ri].T
            iu = li[np.repeat(np.arange(len(li)), len(ri))]
            ju = ri[np.tile(np.arange(len(ri)), len(li))]
            sims = cross.ravel()
        keep = sims >= tau
        a, b_, s = ids[iu[keep]], ids[ju[keep]], sims[keep]
        lo, hi = np.minimum(a, b_), np.maximum(a, b_)
        return pa.table(
            {
                "vec_a": pa.array(lo, pa.int64()),
                "vec_b": pa.array(hi, pa.int64()),
                "sim": pa.array(_r(s, 4), pa.float64()),
            }
        )

    return (
        emb.map_batches(to_cells, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_pairs, batch_format="pyarrow")
        .sort(["vec_a", "vec_b"])
    )


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
# scheduler / window / join operator family
# ---------------------------------------------------------------------------

def q_politeness_admission(sf_dir: str):
    """Per-host politeness admission (budget 5/host): the groupby(host)
    shuffle + within-host rank that gates every crawl round (reference rate
    limiter semantics utils/bucket.py:122-152, generalized per SURVEY.md
    §4.1).  Distributed as groupby(host).map_groups — a host's decisions
    need only that host's rows."""
    from ..stages.politeness import admit_per_host_table

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def frontier(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "host": pa.array([f"site{i % 10}.example" for i in ids], pa.string()),
                "priority": pa.array((ids * 37) % 997, pa.int64()),
            }
        )

    def admit(group: pa.Table) -> pa.Table:
        group = group.sort_by("doc_id")  # arrival order: stable tie-break
        admitted, _ = admit_per_host_table(group, budget=5)
        return admitted

    out = (
        docs.map_batches(frontier, batch_format="pyarrow")
        .groupby("host")
        .map_groups(admit, batch_format="pyarrow")
    )
    return out.sort(["host", "priority", "doc_id"], descending=[False, True, False]).select_columns(
        ["host", "doc_id", "priority"]
    )


def q_events_window(sf_dir: str):
    """Tumbling 1-day window aggregate per event_type (streaming-window
    operator; the reference's per-key sync windows SURVEY.md §2.10 become
    time buckets + groupby in BSP form)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy().astype("datetime64[D]").astype(str)
        return pa.table(
            {
                "day": pa.array(days, pa.string()),
                "event_type": b.column("event_type"),
                "value": b.column("value"),
            }
        )

    agg = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(lambda b: _round_col(b, "sum_value", 2), batch_format="pyarrow").sort(
        ["day", "event_type"]
    )


def q_asof_join(sf_dir: str):
    """Backward as-of join: each event picks the latest order of its user
    with o_orderdate <= ts (broadcast right side + per-key searchsorted;
    operator Ray Data lacks, stages/joins.py)."""
    from ..stages.joins import asof_join_broadcast

    orders = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .to_pandas()
    )
    right = pa.table(
        {
            "o_custkey": pa.array(orders["o_custkey"].to_numpy(), pa.int64()),
            "o_orderdate": pa.array(orders["o_orderdate"], pa.timestamp("us")),
        }
    )
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    joined = asof_join_broadcast(
        events,
        right,
        left_key="user_id",
        left_time="ts",
        right_key="o_custkey",
        right_time="o_orderdate",
        right_value_cols=[],
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "last_order_date": b.column("o_orderdate"),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("event_id")


def q_asof_join_partitioned(sf_dir: str):
    """Same as-of semantics as q_asof_join but with BOTH sides as
    Datasets: co-partitioned by key via union + groupby (stages/joins.py
    asof_join_partitioned) — the two-large-sides scale path where no side
    is broadcast.  Shares asof_join's oracle SQL (identical result)."""
    from ..stages.joins import asof_join_partitioned

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    joined = asof_join_partitioned(
        events,
        orders,
        left_key="user_id",
        left_time="ts",
        right_key="o_custkey",
        right_time="o_orderdate",
        right_value_cols=[],
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "last_order_date": b.column("o_orderdate"),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("event_id")


def q_range_join(sf_dir: str):
    """Equi-key + time-range join: per order, count its lineitems shipped
    within [o_orderdate, o_orderdate + 60d) (stages/joins.py broadcast
    kernel; the reference's closest op is the timestamp-window predicate,
    trx_trc10.py:134-136)."""
    from ..stages.joins import range_join_count

    line = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).to_pandas()
    right = pa.table(
        {
            "l_orderkey": pa.array(line["l_orderkey"].to_numpy(), pa.int64()),
            "l_shipdate": pa.array(line["l_shipdate"], pa.timestamp("us")),
        }
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    out = range_join_count(
        orders,
        right,
        key="o_orderkey",
        right_key="l_orderkey",
        left_time="o_orderdate",
        right_time="l_shipdate",
        window_days=60,
    )
    return out.select_columns(["o_orderkey", "n_in_range"]).sort("o_orderkey")


def q_range_join_partitioned(sf_dir: str):
    """Same range-count semantics as q_range_join but with BOTH sides as
    Datasets (orders fact x lineitem fact): co-partitioned by orderkey via
    union + groupby (stages/joins.py range_join_count_partitioned) — the
    two-large-sides scale path where neither side is broadcast or
    materialized driver-side.  Shares range_join's oracle semantics."""
    from ..stages.joins import range_join_count_partitioned

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    out = range_join_count_partitioned(
        orders,
        line,
        key="o_orderkey",
        right_key="l_orderkey",
        left_time="o_orderdate",
        right_time="l_shipdate",
        window_days=60,
    )
    return out.select_columns(["o_orderkey", "n_in_range"]).sort("o_orderkey")


def q_hash_join(sf_dir: str):
    """General partitioned equi-join with BOTH sides as Datasets (orders
    fact x customer fact) — the join primitive Ray Data lacks, via one
    hash shuffle (union + groupby + in-group polars join,
    stages/joins.py hash_join).  Reference analogue: the driver-side dict
    label joins (spiders/labels/solscan.py), re-expressed distributed."""
    from ..stages.joins import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    out = hash_join(orders, cust, key="o_custkey", right_key="c_custkey", how="inner")

    def _post(b: pa.Table) -> pa.Table:
        b = _round_col(b, "o_totalprice", 2)
        return _round_col(b, "c_acctbal", 2)

    return out.map_batches(_post, batch_format="pyarrow").sort("o_orderkey")


def q_tpch_q3(sf_dir: str):
    """Composed two-join analytics pipeline (TPC-H Q3 shape, adapted to the
    synthetic columns): segment-filtered customers ⋈ pre-cutoff orders ⋈
    post-cutoff lineitems → revenue per order → top 10.  Both joins run as
    the partitioned hash_join (no broadcast side); the filters are pushed
    into the parquet reads so only surviving rows enter the shuffles."""
    from ..stages.joins import hash_join

    cutoff = pc.scalar(pd.Timestamp("1998-06-01").to_datetime64())
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == "BUILDING"),
    ).select_columns(["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") < cutoff),
    )
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") > cutoff),
    )

    def _rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(
            b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount"))
        )
        return pa.table(
            {"l_orderkey": b.column("l_orderkey"), "rev": rev}
        )

    line = line.map_batches(_rev, batch_format="pyarrow")
    co = hash_join(orders, cust, key="o_custkey", right_key="c_custkey", how="inner")
    col = hash_join(
        co.select_columns(["o_orderkey", "o_orderdate"]),
        line,
        key="o_orderkey",
        right_key="l_orderkey",
        how="inner",
    )
    # the revenue sum needs NO third shuffle: hash_join's output blocks are
    # bucket-complete (every row of an o_orderkey lands in one block), so a
    # per-block groupby-sum is already the exact global aggregate.
    # batch_size=None keeps whole blocks as batches (no key splitting).
    def _local_agg(b: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(b)
            .group_by(["o_orderkey", "o_orderdate"])
            .agg(pl.col("rev").sum().alias("revenue"))
            .to_arrow()
        )

    agg = col.map_batches(_local_agg, batch_format="pyarrow", batch_size=None)
    # round BEFORE the top-k sort so near-tie float noise can't reorder the
    # cut vs the SQL oracle (both sides rank by the 2-dp value)
    agg = agg.map_batches(lambda b: _round_col(b, "revenue", 2), batch_format="pyarrow")
    top = agg.sort(["revenue", "o_orderkey"], descending=[True, False]).limit(10)
    return top.select_columns(["o_orderkey", "o_orderdate", "revenue"])


# ---------------------------------------------------------------------------
# blockchain-ETL normalizer family over synthetic records
# ---------------------------------------------------------------------------

def q_transfer_normalize(sf_dir: str):
    """The etherscan-transfer normalizer (reference external.py:121-148):
    lowercase parties, zero-address fill, md5 identity id."""
    from ..functions.etl import normalize_transfers

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def raw(b: pa.Table) -> pa.Table:
        eids = b.column("event_id").to_numpy()
        uids = b.column("user_id").to_numpy()
        vals = b.column("value").to_numpy()
        return pa.table(
            {
                "from": pa.array(
                    [None if u % 7 == 0 else f"0xUSER{u}" for u in uids], pa.string()
                ),
                "to": pa.array([f"0xPeer{(u * 13 + e) % 50}" for u, e in zip(uids, eids)], pa.string()),
                "value": pa.array([f"{v:.2f}" for v in vals], pa.string()),
                "hash": pa.array([f"TX{e}" for e in eids], pa.string()),
            }
        )

    return ds.map_batches(raw, batch_format="pyarrow").map_batches(
        normalize_transfers, batch_format="pyarrow"
    ).sort("id")


def q_receipt_join(sf_dir: str):
    """Receipt->transaction enrichment join (reference
    middlewares/trans/receipt.py:80-137: per-block dict join on
    transaction_hash, hex fields decoded, is_error = status != '0x1',
    receipts without a known transaction dropped).  Both sides synthesize
    deterministically from events; the join runs co-located per block via
    groupby(block_number).map_groups — the reference's per-block
    txhash2transaction dict, distributed."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def synth(b: pa.Table) -> pa.Table:
        eids = b.column("event_id").to_numpy()
        secs = (
            b.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        kinds, hashes, blocks, tss, tidx, ttype, gas, price, status, contract = (
            [], [], [], [], [], [], [], [], [], []
        )
        for e, t in zip(eids.tolist(), secs.tolist()):
            kinds.append("tx")
            hashes.append(f"TX{e}")
            blocks.append(e % 97)
            tss.append(t)
            tidx.append(None)
            ttype.append(None)
            gas.append(None)
            price.append(None)
            status.append(None)
            contract.append(None)
            if e % 5 != 4:  # ~20% of txs lack receipts -> inner-join drop
                kinds.append("receipt")
                hashes.append(f"TX{e}")
                blocks.append(e % 97)
                tss.append(None)
                tidx.append(hex(e % 200))
                ttype.append(hex(e % 3))
                gas.append(hex(21000 + e % 1000))
                price.append(hex(10**9 + e))
                status.append("0x1" if e % 11 else "0x0")
                contract.append(f"0xcon{e}" if e % 13 == 0 else None)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "transaction_hash": pa.array(hashes, pa.string()),
                "block_number": pa.array(blocks, pa.int64()),
                "timestamp": pa.array(tss, pa.int64()),
                "transaction_index": pa.array(tidx, pa.string()),
                "transaction_type": pa.array(ttype, pa.string()),
                "gas_used": pa.array(gas, pa.string()),
                "effective_gas_price": pa.array(price, pa.string()),
                "status": pa.array(status, pa.string()),
                "contract_address": pa.array(contract, pa.string()),
            }
        )

    def join_block(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        hashes = g.column("transaction_hash").to_pylist()
        ts_col = g.column("timestamp").to_pylist()
        # the reference's txhash2transaction dict, per block
        tx_ts = {h: t for k, h, t in zip(kinds, hashes, ts_col) if k == "tx"}
        out = {
            "transaction_hash": [], "block_number": [], "timestamp": [],
            "transaction_index": [], "transaction_type": [], "gas_used": [],
            "effective_gas_price": [], "is_error": [], "created_contract": [],
        }
        block = g.column("block_number")[0].as_py()
        for i, k in enumerate(kinds):
            if k != "receipt":
                continue
            t = tx_ts.get(hashes[i])
            if t is None:
                continue
            out["transaction_hash"].append(hashes[i])
            out["block_number"].append(block)
            out["timestamp"].append(t)
            out["transaction_index"].append(int(g.column("transaction_index")[i].as_py(), 16))
            out["transaction_type"].append(int(g.column("transaction_type")[i].as_py(), 16))
            out["gas_used"].append(int(g.column("gas_used")[i].as_py(), 16))
            out["effective_gas_price"].append(int(g.column("effective_gas_price")[i].as_py(), 16))
            out["is_error"].append(g.column("status")[i].as_py() != "0x1")
            cc = g.column("contract_address")[i].as_py()
            out["created_contract"].append(cc if cc else "")
        return pa.table(
            {
                "transaction_hash": pa.array(out["transaction_hash"], pa.string()),
                "block_number": pa.array(out["block_number"], pa.int64()),
                "timestamp": pa.array(out["timestamp"], pa.int64()),
                "transaction_index": pa.array(out["transaction_index"], pa.int64()),
                "transaction_type": pa.array(out["transaction_type"], pa.int64()),
                "gas_used": pa.array(out["gas_used"], pa.int64()),
                "effective_gas_price": pa.array(out["effective_gas_price"], pa.int64()),
                "is_error": pa.array(out["is_error"], pa.bool_()),
                "created_contract": pa.array(out["created_contract"], pa.string()),
            }
        )

    return (
        ds.map_batches(synth, batch_format="pyarrow")
        .groupby("block_number")
        .map_groups(join_block, batch_format="pyarrow")
        .sort("transaction_hash")
    )


def q_solana_block_parse(sf_dir: str, key_mod: "int | None" = None):
    """Solana getBlock 8-type fan-out (reference spiders/trans/solana/
    blocks.py:167-402): block header, transactions (fee / err-key /
    compute truthiness quirks), token + native balance diffs, logs, and
    the four parsed-instruction classes incl. inner instructions with
    multilevel trace ids.  One deterministic getBlock payload per event
    row; parse runs vectorized over payload batches
    (functions/solana.py).  Rows-only: multilevel ids and JSON fan-out
    have no SQL mirror; hand-derived pins live in tests/test_solana.py.

    ``key_mod`` selects the tx-by-signature regime (q_solana_tx_lookup):
    the signature key-list predicate is applied BEFORE payload synthesis
    and parse — the batch analogue of per-signature getTransaction."""
    import json as _json

    from ..functions.solana import solana_blocks_stage

    ds = _read(sf_dir, "events", columns=["event_id"])
    if key_mod is not None:
        from ..stages.dedup import _stable_h64

        def keep(b: pa.Table) -> pa.Table:
            ids = b.column("event_id").to_pylist()
            mask = pa.array(
                [_stable_h64(f"SIG{e}") % key_mod == 0 for e in ids], pa.bool_()
            )
            return b.filter(mask)

        ds = ds.map_batches(keep, batch_format="pyarrow")

    def synth(b: pa.Table) -> pa.Table:
        heights, payloads = [], []
        for e in b.column("event_id").to_pylist():
            tx = {
                "transaction": {
                    "signatures": [f"SIG{e}"],
                    "message": {
                        "accountKeys": [
                            {"pubkey": f"ACC{e}_0"},
                            {"pubkey": f"ACC{e}_1"},
                            {"pubkey": f"ACC{e}_2"},
                        ],
                        "recentBlockhash": f"RBH{e}",
                        "instructions": [
                            {
                                "programId": "TOKENPROG",
                                "program": "spl-token",
                                "parsed": {"type": "transfer", "info": {"amount": str(e)}},
                            },
                            (
                                {
                                    "programId": "VOTEPROG",
                                    "program": "vote",
                                    "parsed": {"type": "vote", "info": {"slot": e}},
                                }
                                if e % 2
                                else {"programId": "RAWPROG", "data": f"D{e}", "accounts": [0, 1]}
                            ),
                            {
                                "programId": "MEMOPROG",
                                "program": "spl-memo",
                                "parsed": f"memo {e}",
                            },
                        ],
                    },
                },
                "version": "legacy" if e % 2 else 0,
                "meta": {
                    "err": {"InstructionError": []} if e % 7 == 0 else None,
                    "fee": 5000 + e % 100,
                    "computeUnitsConsumed": e % 1000,
                    "preBalances": [100, 50, 0],
                    "postBalances": [100 - (e % 3), 50, e % 3],
                    "preTokenBalances": [
                        {
                            "accountIndex": 1,
                            "mint": f"MINT{e % 5}",
                            "owner": f"OWN{e}",
                            "programId": "TOKENPROG",
                            "uiTokenAmount": {"amount": str(10 + e % 4), "decimals": 6},
                        }
                    ],
                    "postTokenBalances": [
                        {
                            "accountIndex": 1,
                            "mint": f"MINT{e % 5}",
                            "owner": f"OWN{e}",
                            "programId": "TOKENPROG",
                            "uiTokenAmount": {"amount": "10", "decimals": 6},
                        }
                    ],
                    "logMessages": [f"log {e} a", f"log {e} b"],
                    "innerInstructions": [
                        {
                            "index": 1,
                            "instructions": [
                                {
                                    "programId": "P1",
                                    "stackHeight": 2,
                                    "program": "spl-token",
                                    "parsed": {"type": "transferChecked", "info": {"n": e}},
                                },
                                {"programId": "P2", "stackHeight": 3, "data": "zz"},
                                {
                                    "programId": "P3",
                                    "stackHeight": 3,
                                    "program": "system",
                                    "parsed": {"type": "createAccount", "info": {}},
                                },
                                {
                                    "programId": "P4",
                                    "stackHeight": 2,
                                    "program": "vote",
                                    "parsed": {"type": "compactupdatevotestate", "info": {}},
                                },
                            ],
                        }
                    ],
                },
            }
            result = {
                "blockTime": 1_700_000_000 + e,
                "blockhash": f"BH{e}",
                "parentSlot": e - 1,
                "previousBlockhash": f"BH{e - 1}",
                "transactions": [tx],
            }
            heights.append(e)
            payloads.append(_json.dumps({"result": result}))
        return pa.table(
            {
                "block_height": pa.array(heights, pa.int64()),
                "payload": pa.array(payloads, pa.string()),
            }
        )

    return (
        ds.map_batches(synth, batch_format="pyarrow")
        .map_batches(solana_blocks_stage, batch_format="pyarrow")
        .sort(["block_height", "item_type", "trace_id", "signature"])
    )


def q_solana_tx_lookup(sf_dir: str):
    """Solana tx-by-signature reader (reference spiders/trans/solana/
    trans.py:16-84, SolanaTransactionSpider: user-supplied signature list
    -> per-signature getTransaction -> the same item fan-out as the block
    spider).  The deterministic key-list stand-in is md5(signature) % 37
    == 0; the predicate is pushed in front of payload synthesis/parse so
    only requested transactions are ever fetched — rows are a strict
    subset of q_solana_block_parse, pinned in tests/test_solana.py."""
    return q_solana_block_parse(sf_dir, key_mod=37)


def q_tron_block_parse(sf_dir: str):
    """Tron walletsolidity/getblock + eth_getLogs parse (reference
    spiders/trans/tron/blocks.py:52-135): per block one TronTransactionItem
    per tx (txID, index, header version/timestamp) and one EventLogItem per
    log (hex-decoded index/number, lowercased address, the block's
    timestamp attached) — flattened to a discriminated union."""
    import json as _json

    ds = _read(sf_dir, "events", columns=["event_id"])

    def synth_and_parse(b: pa.Table) -> pa.Table:
        kinds, hashes, idxs, blocks, vers, tss, addrs, bhashes = (
            [], [], [], [], [], [], [], []
        )
        for e in b.column("event_id").to_pylist():
            block_payload = {
                "blockID": f"BID{e}",
                "block_header": {
                    "raw_data": {"version": e % 5, "timestamp": 1_600_000_000 + e}
                },
                "transactions": [
                    {"txID": f"TTX{e}_{j}", "raw_data": {"contract_type": j}}
                    for j in range(1 + e % 3)
                ],
            }
            logs_payload = {
                "result": [
                    {
                        "transactionHash": f"TTX{e}_0",
                        "logIndex": hex(e % 7),
                        "blockNumber": hex(e),
                        "address": f"0xTADDR{e % 9}",
                        "topics": [],
                        "data": "0x",
                        "removed": False,
                    }
                ]
            }
            # parse exactly as the reference callbacks do
            result = _json.loads(_json.dumps(block_payload))
            block_hash = result.get("blockID", "")
            header = result.get("block_header", {}).get("raw_data", {})
            version = header.get("version", -1)
            ts = header.get("timestamp", -1)
            for i, tx in enumerate(result.get("transactions", [])):
                kinds.append("tx")
                hashes.append(tx.get("txID", ""))
                idxs.append(i)
                blocks.append(e)
                vers.append(version)
                tss.append(ts)
                addrs.append("")
                bhashes.append(block_hash)
            for log in _json.loads(_json.dumps(logs_payload)).get("result") or []:
                kinds.append("log")
                hashes.append(log.get("transactionHash", ""))
                idxs.append(int(log.get("logIndex"), 16))
                blocks.append(int(log.get("blockNumber"), 16))
                vers.append(-1)
                tss.append(ts)
                addrs.append(log.get("address", "").lower())
                bhashes.append("")
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "transaction_hash": pa.array(hashes, pa.string()),
                "idx": pa.array(idxs, pa.int64()),
                "block_number": pa.array(blocks, pa.int64()),
                "block_version": pa.array(vers, pa.int64()),
                "timestamp": pa.array(tss, pa.int64()),
                "address": pa.array(addrs, pa.string()),
                "block_hash": pa.array(bhashes, pa.string()),
            }
        )

    return ds.map_batches(synth_and_parse, batch_format="pyarrow").sort(
        ["transaction_hash", "kind", "idx"]
    )


def q_sign_pages(sf_dir: str):
    """4byte signature reader (reference spiders/contracts/sign.py:20-53):
    two paginated JSON streams (Function + Event signatures), cursor-
    followed page by page via the ``next`` field, each page's ``results``
    parsed into (text_signature, hex_signature, type) rows.  The cursor
    walk is the driver loop (crawl/tail.py follow_cursor — inherently
    sequential, like the reference's chained requests); page parsing runs
    distributed over the accumulated payloads."""
    import json as _json

    from ..crawl.tail import follow_cursor

    ids = sorted(
        _read(sf_dir, "documents", columns=["doc_id"]).to_pandas()["doc_id"].tolist()
    )
    page_size = 100

    def synth_stream(prefix: str, suffix: str, sign_type: str):
        def fetch_page(cursor):
            start = int(cursor.split("=")[1]) if cursor else 0
            chunk = ids[start : start + page_size]
            if not chunk:
                return None
            nxt = f"start={start + page_size}" if start + page_size < len(ids) else None
            return {
                "next": nxt,
                "results": [
                    {
                        "text_signature": f"{prefix}{i}{suffix}",
                        "hex_signature": "0x"
                        + hashlib.md5(f"{prefix}{i}{suffix}".encode()).hexdigest()[:8],
                    }
                    for i in chunk
                ],
                "type": sign_type,
            }

        return follow_cursor(fetch_page)

    pages = synth_stream("fn_", "(uint256)", "Function") + synth_stream(
        "Ev_", "(address)", "Event"
    )
    payloads = [(_json.dumps(p), p["type"]) for p in pages]

    def parse(b: pa.Table) -> pa.Table:
        texts, hexes, types = [], [], []
        for payload, t in zip(b.column("payload").to_pylist(), b.column("type").to_pylist()):
            data = _json.loads(payload)
            for item in data.get("results") or []:  # reference skips empty
                texts.append(item["text_signature"])
                hexes.append(item["hex_signature"])
                types.append(t)
        return pa.table(
            {
                "text_signature": pa.array(texts, pa.string()),
                "hex_signature": pa.array(hexes, pa.string()),
                "type": pa.array(types, pa.string()),
            }
        )

    ds = ray.data.from_items(
        [{"payload": p, "type": t} for p, t in payloads]
    )
    return ds.map_batches(parse, batch_format="pyarrow").sort(
        ["type", "text_signature"]
    )


def q_dcfg_parse(sf_dir: str):
    """DCFG trace shaping (reference middlewares/trans/dcfg.py:189-222):
    tracer JSON -> block items (opcode mnemonics, unknown nums dropped) +
    edge items (block-index resolution, flow_type mnemonic, value/gas
    defaults).  One deterministic trace per event; rows-only (pinned in
    tests/test_dcfg.py — the JS tracer half is server-side and out of
    scope)."""
    import json as _json

    from ..functions.dcfg import dcfg_stage

    ds = _read(sf_dir, "events", columns=["event_id"])

    def synth(b: pa.Table) -> pa.Table:
        txs, payloads = [], []
        for e in b.column("event_id").to_pylist():
            blocks = [
                {
                    "contract_address": f"0xc{e % 7}",
                    "start_pc": 0,
                    # JUMPDEST, PUSH1, MSTORE, unknown 0x0c (dropped), CALL
                    "operations": [0x5B, 0x60, 0x52, 0x0C, 0xF1],
                },
                {
                    "contract_address": f"0xc{(e + 1) % 7}",
                    "start_pc": 64 + e % 32,
                    "operations": [0x5B, 0x54, 0xF3],
                },
            ]
            edges = [
                {"from": 0, "to": 1, "type": 0xF1, "value": e % 100, "gas": 21000 + e % 50,
                 "selector": f"0x{(e * 2654435761) % (1 << 32):08x}", "index": 0},
                {"from": 1, "to": 0, "type": 0xF3},
            ]
            txs.append(f"TX{e}")
            payloads.append(_json.dumps({"result": {"blocks": blocks, "edges": edges}}))
        return pa.table(
            {
                "transaction_hash": pa.array(txs, pa.string()),
                "payload": pa.array(payloads, pa.string()),
            }
        )

    return (
        ds.map_batches(synth, batch_format="pyarrow")
        .map_batches(dcfg_stage, batch_format="pyarrow")
        .sort(["transaction_hash", "kind", "start_pc"])
    )


def q_token_decode(sf_dir: str):
    """Token-event decoding: dispatch on topics[0], word->address, hex->dec
    (reference middlewares/trans/token.py:35-236, utils/web3.py:74-102)."""
    from ..functions.etl import (
        TOPIC_APPROVAL,
        TOPIC_TRANSFER,
        decode_token_events,
    )

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def synth_logs(b: pa.Table) -> pa.Table:
        eids = b.column("event_id").to_numpy()
        uids = b.column("user_id").to_numpy()
        topics, datas, hashes, lis = [], [], [], []
        for e, u in zip(eids, uids):
            a_from = hashlib.md5(str(u).encode()).hexdigest()
            a_to = hashlib.md5(str((u * 13 + e) % 50).encode()).hexdigest()
            t0 = (
                TOPIC_TRANSFER
                if e % 3 == 0
                else TOPIC_APPROVAL
                if e % 3 == 1
                else "0x" + "de" * 32
            )
            topics.append(
                [
                    t0,
                    "0x" + "0" * 24 + a_from + a_from[:8],
                    "0x" + "0" * 24 + a_to + a_to[:8],
                ]
            )
            datas.append(f"0x{e * 3 + 5:x}")
            hashes.append(f"TX{e}")
            lis.append(int(e))
        return pa.table(
            {
                "hash": pa.array(hashes, pa.string()),
                "log_index": pa.array(lis, pa.int64()),
                "topics": pa.array(topics, pa.list_(pa.string())),
                "data": pa.array(datas, pa.string()),
            }
        )

    return (
        ds.map_batches(synth_logs, batch_format="pyarrow")
        .map_batches(decode_token_events, batch_format="pyarrow")
        .sort("log_index")
    )


def q_trace_flatten(sf_dir: str):
    """Trace-tree flattening: recursive callTracer JSON -> rows with
    trace_id='depth_order' (reference middlewares/trans/trace.py:62-125)."""
    import json as _json

    from ..functions.etl import flatten_traces_batch

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def synth_traces(b: pa.Table) -> pa.Table:
        keys = b.column("o_orderkey").to_numpy()
        hashes, jsons = [], []
        for k in keys:
            k = int(k)
            trace = {
                "type": "CALL",
                "from": f"0xfrom{k}",
                "to": f"0xto{k}",
                "value": f"0x{k * 2:x}",
                "calls": [
                    {
                        "type": "STATICCALL",
                        "from": f"0xto{k}",
                        "to": f"0xc1{k}",
                        "value": f"0x{k * 3:x}",
                        "calls": [
                            {
                                "type": "DELEGATECALL",
                                "from": f"0xc1{k}",
                                "to": f"0xg{k}",
                                "value": f"0x{k * 5:x}",
                            }
                        ],
                    },
                    {
                        "type": "CALL",
                        "from": f"0xto{k}",
                        "to": f"0xc2{k}",
                        "value": f"0x{k * 7:x}",
                    },
                ],
            }
            hashes.append(f"T{k}")
            jsons.append(_json.dumps(trace))
        return pa.table(
            {"hash": pa.array(hashes, pa.string()), "trace_json": pa.array(jsons, pa.string())}
        )

    return (
        ds.map_batches(synth_traces, batch_format="pyarrow")
        .map_batches(flatten_traces_batch, batch_format="pyarrow")
        .sort(["transaction_hash", "trace_id"])
    )


def q_parse_props(sf_dir: str):
    """JSON side-band parse + aggregate (reference json payload parsing,
    external.py:115; nested JSON columns SURVEY.md §1.2)."""
    from ..functions.etl import parse_json_props

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    agg = (
        ds.map_batches(parse_json_props, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Mean("props_k", alias_name="mean_k"), Count(alias_name="n"))
    )
    return agg.map_batches(lambda b: _round_col(b, "mean_k", 4), batch_format="pyarrow").sort(
        "event_type"
    )


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


_KNN_BRUTE_MAX_CORPUS = 1_000_000  # ~0.5 GB at d=64 float64 — broadcast bound


def q_embedding_knn(sf_dir: str):
    """Embedding-cosine nearest neighbour (top-1) for vec_id < 100.

    EXACT-BASELINE primitive: broadcast normalized corpus, per-batch
    matmul + argmax.  Deliberately bounded — the broadcast corpus must fit
    in one worker heap, so corpora beyond _KNN_BRUTE_MAX_CORPUS are
    refused with a pointer to the bucketed scale path (``ann_ivf``), which
    never materializes the whole corpus per worker."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_corpus = emb.count()
    if n_corpus > _KNN_BRUTE_MAX_CORPUS:
        raise ValueError(
            f"embedding_knn is the exact broadcast baseline (corpus {n_corpus} > "
            f"{_KNN_BRUTE_MAX_CORPUS}); use ann_ivf for large corpora"
        )
    corpus = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    c_ids = corpus["vec_id"].to_numpy()
    c_mat = np.stack(corpus["embedding"].to_numpy()).astype(np.float64)
    c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
    ref = ray.put((c_ids, c_mat))

    def nn(b: pa.Table, _ref=ref) -> pa.Table:
        # plain task + plasma-shared corpus (zero-copy local read)
        c_ids, c = ray.get(_ref)
        ids = b.column("vec_id").to_numpy()
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ c.T  # (batch, corpus)
        # mask self-matches (vectorized), then first-max = smallest
        # nn_id tie-break
        pos = np.searchsorted(c_ids, ids)
        safe = np.minimum(pos, len(c_ids) - 1)
        hit = c_ids[safe] == ids
        sims[np.flatnonzero(hit), safe[hit]] = -np.inf
        best = sims.argmax(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "nn_id": pa.array(c_ids[best], pa.int64()),
                "sim": pa.array(sims[np.arange(len(ids)), best], pa.float64()),
            }
        )

    out = emb.filter(expr="vec_id < 100").map_batches(nn, batch_format="pyarrow")
    return out.map_batches(lambda b: _round_col(b, "sim", 4), batch_format="pyarrow").sort("vec_id")


def q_sessionize(sf_dir: str):
    """Session windows: per user, events sorted by ts split at gaps > 30
    minutes; one row per session with its event count and bounds.  The
    stateful-streaming window operator beyond tumbling (q_events_window),
    expressed as groupby(user).map_groups with an in-group sort — a
    session's events co-locate by construction."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions_of_user(group: pa.Table) -> pa.Table:
        g = group.sort_by("ts")
        uid = int(g.column("user_id")[0].as_py())
        ts = g.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        gap_us = 30 * 60 * 1_000_000
        # new session where the gap from the previous event exceeds 30min
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess_id = np.cumsum(new_sess)
        out_uid, out_sid, out_n, out_start, out_end = [], [], [], [], []
        for sid in range(1, int(sess_id[-1]) + 1):
            mask = sess_id == sid
            out_uid.append(uid)
            out_sid.append(sid)
            out_n.append(int(mask.sum()))
            out_start.append(ts[mask][0])
            out_end.append(ts[mask][-1])
        return pa.table(
            {
                "user_id": pa.array(out_uid, pa.int64()),
                "session_id": pa.array(out_sid, pa.int64()),
                "n_events": pa.array(out_n, pa.int64()),
                "session_start": pa.array(
                    np.array(out_start, dtype=np.int64).astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "session_end": pa.array(
                    np.array(out_end, dtype=np.int64).astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(sessions_of_user, batch_format="pyarrow")
        .sort(["user_id", "session_id"])
    )


def q_robots_filter(sf_dir: str):
    """robots.txt gate over a synthetic frontier: host site{h} disallows
    path prefix '/d/{h}' for User-agent: * — the engine's robots parser
    (stages/robots.py; reference ships ROBOTSTXT_OBEY=False,
    settings.py:20, our obey path implements RFC-9309 prefix rules)."""
    from ..stages.robots import is_allowed, parse_robots

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def gate(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        out_id, out_url = [], []
        rules_of = {
            h: parse_robots(f"User-agent: *\nDisallow: /d/{h}\n") for h in range(10)
        }
        for d in ids:
            h = int(d) % 10
            path = f"/d/{int(d)}"
            if is_allowed(path, rules_of[h]):
                out_id.append(int(d))
                out_url.append(f"http://site{h}.example{path}")
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()), "url": pa.array(out_url, pa.string())}
        )

    return docs.map_batches(gate, batch_format="pyarrow").sort("doc_id")


def q_wedge_count(sf_dir: str):
    """Per-node wedge (2-path) motif count — the simplest of the MoTS
    higher-order motif aggregations (reference plugins/mots/highorder.py
    counts 16-dim motif vectors per group; here wedges_v = d_v*(d_v-1)/2
    over the distinct undirected neighbour set)."""
    deg = q_node_degree(sf_dir)

    def wedges(b: pa.Table) -> pa.Table:
        d = b.column("degree").to_numpy()
        return pa.table(
            {
                "node": b.column("node"),
                "wedges": pa.array(d * (d - 1) // 2, pa.int64()),
            }
        )

    return deg.map_batches(wedges, batch_format="pyarrow").sort("node")


def q_triangle_count(sf_dir: str):
    """Per-node triangle count over the events graph — the 3-clique step
    up from wedge_count in the MoTS motif family (reference
    plugins/mots/highorder.py counts triangle-containing 4-motifs).

    Distributed shape (the GraphFrames/MCE standard): distinct undirected
    edges u<v → per-node neighbor lists (groupby) → attach N(u) and N(v)
    to every edge via two partitioned hash_joins (list-typed payloads) →
    per-edge |N(u)∩N(v)| vectorized in-batch → each common neighbor forms
    one triangle counted at both endpoints; per-node sum halves to the
    triangle count.  Every stage is a batch op; nothing driver-side."""
    from ..stages.joins import hash_join

    edges = _events_edges(sf_dir)

    def und(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d), pa.int64()),
                "v": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    e = (
        edges.map_batches(und, batch_format="pyarrow")
        .groupby(["u", "v"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )

    # adjacency: emit both directions, one groupby co-locates each node's
    # neighbor rows, the group folds to a single list row
    def emit_dirs(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy()
        v = b.column("v").to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), pa.int64()),
                "nb": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    adj = (
        e.map_batches(emit_dirs, batch_format="pyarrow")
        .groupby("node")
        .map_groups(
            lambda g: pa.table(
                {
                    "node": pa.array([g.column("node")[0].as_py()], pa.int64()),
                    "nbrs": pa.array(
                        [sorted(g.column("nb").to_pylist())], pa.list_(pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    ue = hash_join(e, adj, key="u", right_key="node", how="inner").map_batches(
        lambda b: b.rename_columns(["u", "v", "nbrs_u"]),  # output order is fixed
        batch_format="pyarrow",
    )
    uv = hash_join(ue, adj, key="v", right_key="node", how="inner")

    def common(b: pa.Table) -> pa.Table:
        us = b.column("u").to_numpy()
        vs = b.column("v").to_numpy()
        nu = b.column("nbrs_u").to_pylist()
        nv = b.column("nbrs").to_pylist()
        m = np.fromiter(
            (len(set(a) & set(bb)) for a, bb in zip(nu, nv)), dtype=np.int64, count=len(nu)
        )
        return pa.table(
            {
                "node": pa.array(np.concatenate([us, vs]), pa.int64()),
                "m": pa.array(np.concatenate([m, m]), pa.int64()),
            }
        )

    per_node = (
        uv.map_batches(common, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("m", alias_name="m2"))
    )

    def halve(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "node": b.column("node"),
                "triangles": pa.array(b.column("m2").to_numpy() // 2, pa.int64()),
            }
        )
        # nodes on edges but in no triangle: the SQL mirror (a closed-
        # triple enumeration) never emits them — drop the zeros here too
        return t.filter(pc.greater(t.column("triangles"), 0))

    return per_node.map_batches(halve, batch_format="pyarrow").sort("node")


def q_motif_vector(sf_dir: str):
    """16-dim MoTS higher-order motif vector per edge group (reference
    plugins/mots/highorder.py:27-224 with motif_size=4, driven per tx-group
    as in plugins/mots/pipelines.py:60).  Groups co-locate via
    groupby(gid).map_groups; the per-group dense-numpy counter is
    functions/motifs.py (hand-graph conformance pinned in
    tests/test_motifs.py).  Rows-only: motif adjacency algebra has no SQL
    mirror (wedge_count is the oracle-green base case)."""
    from ..functions.motifs import N_MOTIFS, motif_vector

    ds = _read(sf_dir, "events", columns=["user_id", "event_id"])

    def ed(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        eid = b.column("event_id").to_numpy()
        return pa.table(
            {
                "gid": pa.array(eid % 32, pa.int64()),
                "src": pa.array(uid % 50, pa.int64()),
                "dst": pa.array((uid * 13 + eid) % 50, pa.int64()),
            }
        )

    def vec(g: pa.Table) -> pa.Table:
        v = motif_vector(g.column("src").to_pylist(), g.column("dst").to_pylist())
        cols = {"gid": pa.array([g.column("gid")[0].as_py()], pa.int64())}
        for i in range(N_MOTIFS):
            cols[f"m{i + 1}"] = pa.array([float(v[i])], pa.float64())
        return pa.table(cols)

    return (
        ds.map_batches(ed, batch_format="pyarrow")
        .groupby("gid")
        .map_groups(vec, batch_format="pyarrow")
        .sort("gid")
    )


def q_salted_host_agg(sf_dir: str):
    """Hot-key-safe aggregation: count per host via salted two-phase groupby
    (stages/skew.py; the explicit skew handling the north rule demands —
    host0 in the fixture store holds ~30% of pages).  Result must equal the
    plain groupby, which the SQL oracle computes directly."""
    from ..stages.skew import salted_count

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def hosts(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        # skewed: doc_id % 3 == 0 (a third of rows) all land on host0
        return pa.table(
            {
                "host": pa.array(
                    ["host0.example" if i % 3 == 0 else f"host{i % 7 + 1}.example" for i in ids],
                    pa.string(),
                )
            }
        )

    return salted_count(
        docs.map_batches(hosts, batch_format="pyarrow"), "host", n_salts=8, out_col="n_pages"
    ).sort("host")


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


def q_xml_labels(sf_dir: str):
    """OFAC-style XML entry parse: xml payload -> one row per (uid, name,
    program) (reference spiders/labels/ofac.py:22-78 xpath walk; here
    ElementTree over a synthesized sdnEntry payload)."""
    import xml.etree.ElementTree as ET

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth_xml(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        xmls = [
            (
                f"<sdnEntry><uid>{d}</uid><firstName>F{d}</firstName>"
                f"<lastName>L{d}</lastName><programList>"
                f"<program>P{d % 4}</program><program>Q{d % 3}</program>"
                "</programList></sdnEntry>"
            )
            for d in ids
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "xml": pa.array(xmls, pa.string())}
        )

    def parse_xml(b: pa.Table) -> pa.Table:
        uids, names, progs = [], [], []
        for x in b.column("xml").to_pylist():
            root = ET.fromstring(x)
            uid = int(root.findtext("uid"))
            name = f"{root.findtext('firstName')} {root.findtext('lastName')}"
            for p in root.find("programList").findall("program"):
                uids.append(uid)
                names.append(name)
                progs.append(p.text)
        return pa.table(
            {
                "uid": pa.array(uids, pa.int64()),
                "name": pa.array(names, pa.string()),
                "program": pa.array(progs, pa.string()),
            }
        )

    return (
        docs.map_batches(synth_xml, batch_format="pyarrow")
        .map_batches(parse_xml, batch_format="pyarrow")
        .sort(["uid", "program"])
    )


def q_block_parse(sf_dir: str):
    """EVM-style block ETL: nested block JSON -> one row per transaction
    (reference spiders/trans/evm/blocks.py:200-241 parse).  Blocks are
    synthesized from orders (one block per 10 orderkeys)."""
    import json as _json

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def synth_blocks(b: pa.Table) -> pa.Table:
        rows = {}
        for k, c, p in zip(
            b.column("o_orderkey").to_pylist(),
            b.column("o_custkey").to_pylist(),
            b.column("o_totalprice").to_pylist(),
        ):
            blk = int(k) // 10
            rows.setdefault(blk, []).append(
                {
                    "hash": f"0xtx{k}",
                    "from": f"0xa{c}",
                    "to": f"0xb{(c * 7) % 1500}",
                    "value": hex(int(p * 100)),
                    "index": int(k) % 10,
                }
            )
        blks = sorted(rows)
        return pa.table(
            {
                "block_number": pa.array(blks, pa.int64()),
                "block_json": pa.array(
                    [
                        _json.dumps({"number": hex(blk), "transactions": rows[blk]})
                        for blk in blks
                    ],
                    pa.string(),
                ),
            }
        )

    def parse_block(b: pa.Table) -> pa.Table:
        from ..functions.etl import hex_to_dec

        out = {k: [] for k in ("block_number", "tx_hash", "tx_index", "from_addr", "to_addr", "value")}
        for bj in b.column("block_json").to_pylist():
            blk = _json.loads(bj)
            num = hex_to_dec(blk["number"])
            for tx in blk["transactions"]:
                out["block_number"].append(num)
                out["tx_hash"].append(tx["hash"])
                out["tx_index"].append(tx["index"])
                out["from_addr"].append(tx["from"].lower())
                out["to_addr"].append(tx["to"].lower())
                out["value"].append(hex_to_dec(tx["value"]))
        return pa.table(
            {
                "block_number": pa.array(out["block_number"], pa.int64()),
                "tx_hash": pa.array(out["tx_hash"], pa.string()),
                "tx_index": pa.array(out["tx_index"], pa.int64()),
                "from_addr": pa.array(out["from_addr"], pa.string()),
                "to_addr": pa.array(out["to_addr"], pa.string()),
                "value": pa.array(out["value"], pa.int64()),
            }
        )

    return (
        ds.map_batches(synth_blocks, batch_format="pyarrow")
        .map_batches(parse_block, batch_format="pyarrow")
        .sort(["block_number", "tx_index"])
    )


def q_utxo_edges(sf_dir: str):
    """UTXO input/output edge fan-out: one synthetic tx per event, inputs
    and outputs emitted as signed edge rows (reference blockchaininfo
    TransactionMiddleware.parse_transaction, transaction.py:69-112)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def fan_out(b: pa.Table) -> pa.Table:
        tx, addr, direction, val = [], [], [], []
        for e, u, v in zip(
            b.column("event_id").to_pylist(),
            b.column("user_id").to_pylist(),
            b.column("value").to_pylist(),
        ):
            t = f"utx{e}"
            # one input from the user, two outputs (payee + change);
            # _r = DuckDB ROUND semantics (half away from zero)
            tx.append(t); addr.append(f"addr{u}"); direction.append("in"); val.append(float(_r(v, 2)))
            tx.append(t); addr.append(f"addr{(u * 13 + e) % 50}"); direction.append("out"); val.append(float(_r(v * 0.6, 2)))
            tx.append(t); addr.append(f"addr{u}"); direction.append("out"); val.append(float(_r(v * 0.4, 2)))
        return pa.table(
            {
                "tx": pa.array(tx, pa.string()),
                "addr": pa.array(addr, pa.string()),
                "direction": pa.array(direction, pa.string()),
                "value": pa.array(val, pa.float64()),
            }
        )

    return ds.map_batches(fan_out, batch_format="pyarrow").sort(["tx", "direction", "addr", "value"])



# ---------------------------------------------------------------------------
# oracle SQL mirrors
# ---------------------------------------------------------------------------

ORACLE_SQL: Dict[str, str] = {
    # engine BFS with layer-per-round config: round == BFS depth over the
    # arithmetic crawl_doc_html link graph (fixtures.py) — found pages via
    # t1=7d+1 / same-host t3=d+10, dead-end misses (query-string variant,
    # dangling host, cdn script) one layer below their earliest parent
    "crawl_bfs_depths": """
        WITH RECURSIVE r AS (
            SELECT CAST(0 AS BIGINT) AS doc, CAST(0 AS BIGINT) AS depth
            UNION
            SELECT s.nxt, s.depth + 1 FROM (
                SELECT (doc * 7 + 1) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r WHERE depth < 31
                UNION ALL
                SELECT (doc + 10) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r
                WHERE depth < 31
                  AND ((doc + 10) % (SELECT count(*) FROM documents)) % 10 = doc % 10
            ) s
        ),
        f AS (SELECT doc, MIN(depth) AS depth FROM r GROUP BY doc),
        nn AS (SELECT count(*) AS n FROM documents),
        misses AS (
            SELECT 'http://site' || (((f.doc * 13 + 3) % nn.n) % 10) || '.example/d/'
                   || ((f.doc * 13 + 3) % nn.n) || '?a=1&b=2' AS url,
                   f.depth + 1 AS d
            FROM f, nn WHERE f.depth < 31
            UNION ALL
            SELECT 'http://dangling' || (f.doc % 5) || '.example/x/' || f.doc,
                   f.depth + 1 FROM f WHERE f.depth < 31
            UNION ALL
            SELECT 'http://cdn' || (f.doc % 3) || '.example/app.js',
                   f.depth + 1 FROM f WHERE f.depth < 31
        )
        SELECT round, url, found FROM (
            SELECT depth AS round,
                   'http://site' || (doc % 10) || '.example/d/' || doc AS url,
                   TRUE AS found
            FROM f
            UNION ALL
            SELECT MIN(d) AS round, url, FALSE AS found FROM misses GROUP BY url
        ) ORDER BY round, url
    """,
    # Dataset-native BFS, budget-free: same arithmetic graph as
    # crawl_bfs_depths, depth-capped at 6, output = every admitted-new url
    # (found docs AND dead-end misses) with round == BFS depth
    "crawl_bfs_dataset": """
        WITH RECURSIVE r AS (
            SELECT CAST(0 AS BIGINT) AS doc, CAST(0 AS BIGINT) AS depth
            UNION
            SELECT s.nxt, s.depth + 1 FROM (
                SELECT (doc * 7 + 1) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r WHERE depth < 6
                UNION ALL
                SELECT (doc + 10) % (SELECT count(*) FROM documents) AS nxt, depth
                FROM r
                WHERE depth < 6
                  AND ((doc + 10) % (SELECT count(*) FROM documents)) % 10 = doc % 10
            ) s
        ),
        f AS (SELECT doc, MIN(depth) AS depth FROM r GROUP BY doc),
        nn AS (SELECT count(*) AS n FROM documents),
        misses AS (
            SELECT 'http://site' || (((f.doc * 13 + 3) % nn.n) % 10) || '.example/d/'
                   || ((f.doc * 13 + 3) % nn.n) || '?a=1&b=2' AS url,
                   f.depth + 1 AS d
            FROM f, nn WHERE f.depth < 6
            UNION ALL
            SELECT 'http://dangling' || (f.doc % 5) || '.example/x/' || f.doc,
                   f.depth + 1 FROM f WHERE f.depth < 6
            UNION ALL
            SELECT 'http://cdn' || (f.doc % 3) || '.example/app.js',
                   f.depth + 1 FROM f WHERE f.depth < 6
        )
        SELECT url, depth, round FROM (
            SELECT 'http://site' || (doc % 10) || '.example/d/' || doc AS url,
                   depth, depth AS round
            FROM f
            UNION ALL
            SELECT url, MIN(d) AS depth, MIN(d) AS round FROM misses GROUP BY url
        ) ORDER BY round, url
    """,
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
    # quantile q = value at 1-indexed sorted position ceil(q * N); 0.9/0.99
    # deliberately go through the same double multiply + ceil on both sides
    # (0.9 * 500 = 450.0000...6 -> rank 451 in BOTH engines)
    "token_quantiles": """
        WITH c AS (
            SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents
        ),
        n AS (SELECT count(*) AS total FROM c),
        r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) AS rn FROM c),
        qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99))
        SELECT qs.q, r.n_tokens
        FROM qs CROSS JOIN n
        JOIN r ON r.rn = CAST(ceil(qs.q * n.total) AS BIGINT)
        ORDER BY qs.q
    """,
    "hash_sample": """
        SELECT doc_id, lang FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 10
        ORDER BY doc_id
    """,
    # Lucene-variant BM25; constants written as (1.2 + 1) etc. so the SQL
    # evaluates the SAME doubles as the Python (the literal 2.2 is a
    # different double than 1.2 + 1)
    "bm25_scores": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents
        ),
        stats AS (
            SELECT count(*) AS n, sum(len(toks)) * 1.0 / count(*) AS avg_len FROM toks
        ),
        terms(term) AS (VALUES ('join'), ('scan'), ('spark')),
        df AS (
            SELECT term,
                   sum(CASE WHEN list_contains(t.toks, term) THEN 1 ELSE 0 END) AS df
            FROM toks t CROSS JOIN terms GROUP BY term
        ),
        tf AS (
            SELECT t.doc_id, term,
                   len(list_filter(t.toks, w -> w = term)) AS tf,
                   len(t.toks) AS dl
            FROM toks t CROSS JOIN terms
        )
        SELECT tf.doc_id,
               round(sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
                         * tf.tf * (1.2 + 1)
                         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avg_len))),
                     4) AS bm25
        FROM tf JOIN df USING (term) CROSS JOIN stats s
        GROUP BY tf.doc_id ORDER BY tf.doc_id
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
    # exact all-pairs cosine near-dup join (threshold compared on the
    # unrounded float64 sim; the closest pair to tau sits 1e-5 away at
    # every sf, far beyond cross-implementation float noise)
    "embedding_neardup_pairs": """
        WITH s AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, round(sim, 4) AS sim FROM s
        WHERE sim >= 0.4 ORDER BY vec_a, vec_b
    """,
    "embedding_norms": """
        SELECT label,
               round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                      x -> x * x)))), 4) AS mean_l2,
               count(*) AS n_vecs
        FROM embeddings GROUP BY label ORDER BY label
    """,
    "politeness_admission": """
        WITH f AS (
            SELECT doc_id,
                   'site' || (doc_id % 10) || '.example' AS host,
                   (doc_id * 37) % 997                   AS priority
            FROM documents
        )
        SELECT host, doc_id, priority FROM f
        QUALIFY row_number() OVER (PARTITION BY host
                                   ORDER BY priority DESC, doc_id) <= 5
        ORDER BY host, priority DESC, doc_id
    """,
    "events_window": """
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               event_type,
               count(*)             AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,
    "asof_join": """
        SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    "asof_join_partitioned": """
        SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
        FROM events e
        ASOF LEFT JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    "range_join": """
        SELECT o.o_orderkey, count(l.l_orderkey) AS n_in_range
        FROM orders o
        LEFT JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    "range_join_partitioned": """
        SELECT o.o_orderkey, count(l.l_orderkey) AS n_in_range
        FROM orders o
        LEFT JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 60 DAY
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
    "hash_join": """
        SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS o_totalprice,
               c.c_name, round(c.c_acctbal, 2) AS c_acctbal
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_orderkey
    """,
    "triangle_count": """
        WITH d AS (
            SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
            FROM events
        ),
        und AS (
            SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
            FROM d WHERE src <> dst
        ),
        tri AS (
            SELECT a.u AS x, a.v AS y, b.v AS z
            FROM und a
            JOIN und b ON b.u = a.v
            JOIN und c ON c.u = a.u AND c.v = b.v
        ),
        pernode AS (
            SELECT unnest([x, y, z]) AS node FROM tri
        )
        SELECT node, count(*) AS triangles
        FROM pernode GROUP BY node ORDER BY node
    """,
    "bloom_semijoin": """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        ORDER BY l_orderkey, l_linenumber
    """,
    "tpch_q3": """
        SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "transfer_normalize": """
        WITH raw AS (
            SELECT CASE WHEN user_id % 7 = 0 THEN NULL
                        ELSE '0xUSER' || user_id END          AS from_raw,
                   '0xPeer' || ((user_id * 13 + event_id) % 50) AS to_raw,
                   printf('%.2f', value)                       AS value_s,
                   'TX' || event_id                            AS hash
            FROM events
        ), norm AS (
            SELECT lower(coalesce(from_raw,
                     '0x0000000000000000000000000000000000000000')) AS from_addr,
                   lower(to_raw)                                    AS to_addr,
                   value_s, hash
            FROM raw
        )
        SELECT md5(concat_ws('_', from_addr, to_addr, value_s, hash)) AS id,
               from_addr, to_addr,
               CAST(value_s AS DOUBLE) AS value, hash
        FROM norm ORDER BY id
    """,
    "tron_block_parse": """
        WITH tx AS (
            SELECT 'tx' AS kind,
                   'TTX' || event_id || '_' || j.i AS transaction_hash,
                   j.i                              AS idx,
                   event_id                         AS block_number,
                   event_id % 5                     AS block_version,
                   1600000000 + event_id            AS timestamp,
                   ''                               AS address,
                   'BID' || event_id                AS block_hash
            FROM events, LATERAL (
                SELECT unnest(generate_series(0, event_id % 3)) AS i
            ) AS j
        ),
        lg AS (
            SELECT 'log' AS kind,
                   'TTX' || event_id || '_0' AS transaction_hash,
                   event_id % 7              AS idx,
                   event_id                  AS block_number,
                   -1                        AS block_version,
                   1600000000 + event_id     AS timestamp,
                   lower('0xTADDR' || (event_id % 9)) AS address,
                   ''                        AS block_hash
            FROM events
        )
        SELECT * FROM (SELECT * FROM tx UNION ALL SELECT * FROM lg)
        ORDER BY transaction_hash, kind, idx
    """,
    "sign_pages": """
        WITH s AS (
            SELECT 'fn_' || doc_id || '(uint256)' AS text_signature,
                   'Function' AS type FROM documents
            UNION ALL
            SELECT 'Ev_' || doc_id || '(address)' AS text_signature,
                   'Event' AS type FROM documents
        )
        SELECT text_signature,
               '0x' || substr(md5(text_signature), 1, 8) AS hex_signature,
               type
        FROM s ORDER BY type, text_signature
    """,
    "labelcloud_parse": """
        WITH ks AS (SELECT DISTINCT doc_id % 20 AS k FROM documents),
        kept AS (
            SELECT k,
                   CASE k % 4 WHEN 0 THEN 'exchange' WHEN 1 THEN 'phish-hack'
                              WHEN 2 THEN 'gambling' ELSE 'defi' END AS category,
                   10 + (k * 37) % 190 AS size
            FROM ks WHERE k % 5 != 4
        ),
        tabs AS (
            SELECT k, category, 1 AS subcatid, size AS total FROM kept
            UNION ALL
            SELECT k, category, 2 AS subcatid, size // 2 AS total FROM kept
        )
        SELECT 'label' || k AS label, category, subcatid,
               unnest(generate_series(0, CAST((total - 1) // 100 AS BIGINT))) * 100 AS start
        FROM tabs
        ORDER BY label, subcatid, start
    """,
    "receipt_join": """
        WITH tx AS (
            SELECT 'TX' || event_id                      AS transaction_hash,
                   event_id % 97                          AS block_number,
                   CAST(floor(epoch(ts)) AS BIGINT)       AS timestamp
            FROM events
        ), rc AS (
            SELECT 'TX' || event_id                      AS transaction_hash,
                   event_id % 200                         AS transaction_index,
                   event_id % 3                           AS transaction_type,
                   21000 + event_id % 1000                AS gas_used,
                   1000000000 + event_id                  AS effective_gas_price,
                   (event_id % 11 = 0)                    AS is_error,
                   CASE WHEN event_id % 13 = 0
                        THEN '0xcon' || event_id ELSE '' END AS created_contract
            FROM events WHERE event_id % 5 != 4
        )
        SELECT rc.transaction_hash, tx.block_number, tx.timestamp,
               rc.transaction_index, rc.transaction_type, rc.gas_used,
               rc.effective_gas_price, rc.is_error, rc.created_contract
        FROM rc JOIN tx USING (transaction_hash)
        ORDER BY rc.transaction_hash
    """,
    "token_decode": """
        WITH a AS (
            SELECT event_id, user_id,
                   md5(CAST(user_id AS VARCHAR))                        AS h_from,
                   md5(CAST((user_id * 13 + event_id) % 50 AS VARCHAR)) AS h_to
            FROM events WHERE event_id % 3 < 2
        )
        SELECT 'TX' || event_id AS hash,
               event_id         AS log_index,
               CASE WHEN event_id % 3 = 0 THEN 'transfer' ELSE 'approval' END AS action,
               '0x' || h_from || substr(h_from, 1, 8) AS from_addr,
               '0x' || h_to   || substr(h_to, 1, 8)   AS to_addr,
               event_id * 3 + 5 AS value
        FROM a ORDER BY log_index
    """,
    "trace_flatten": """
        WITH t AS (
            SELECT 'T' || o_orderkey AS transaction_hash, '0_0' AS trace_id,
                   'CALL' AS trace_type, '0xfrom' || o_orderkey AS from_addr,
                   '0xto' || o_orderkey AS to_addr, o_orderkey * 2 AS value,
                   0 AS depth
            FROM orders
            UNION ALL
            SELECT 'T' || o_orderkey, '1_1', 'STATICCALL', '0xto' || o_orderkey,
                   '0xc1' || o_orderkey, o_orderkey * 3, 1 FROM orders
            UNION ALL
            SELECT 'T' || o_orderkey, '2_2', 'DELEGATECALL', '0xc1' || o_orderkey,
                   '0xg' || o_orderkey, o_orderkey * 5, 2 FROM orders
            UNION ALL
            SELECT 'T' || o_orderkey, '1_3', 'CALL', '0xto' || o_orderkey,
                   '0xc2' || o_orderkey, o_orderkey * 7, 1 FROM orders
        )
        SELECT * FROM t ORDER BY transaction_hash, trace_id
    """,
    "parse_props": """
        SELECT event_type,
               round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS mean_k,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "binary_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text)                  AS digest,
               CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
        FROM documents ORDER BY doc_id
    """,
    "salted_host_agg": """
        WITH h AS (
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'host0.example'
                        ELSE 'host' || (doc_id % 7 + 1) || '.example' END AS host
            FROM documents
        )
        SELECT host, count(*) AS n_pages FROM h GROUP BY host ORDER BY host
    """,
    "enrich_3way": """
        SELECT r.r_name AS region,
               round(sum(l.l_extendedprice), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY region
    """,
    "keywords_freq": """
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents
        ),
        u AS (SELECT doc_id, unnest(toks) AS w FROM t),
        f AS (
            SELECT doc_id, w, count(*) AS c FROM u WHERE len(w) >= 4
            GROUP BY doc_id, w
        ),
        k AS (
            SELECT doc_id, w AS top_keyword FROM f
            QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, w) = 1
        )
        SELECT t.doc_id,
               array_to_string(t.toks[1:20], ' ') AS summary,
               k.top_keyword
        FROM t LEFT JOIN k USING (doc_id) ORDER BY t.doc_id
    """,
    "xml_labels": """
        WITH p AS (
            SELECT doc_id, 'P' || (doc_id % 4) AS program FROM documents
            UNION ALL
            SELECT doc_id, 'Q' || (doc_id % 3) AS program FROM documents
        )
        SELECT doc_id AS uid,
               'F' || doc_id || ' ' || 'L' || doc_id AS name,
               program
        FROM p ORDER BY uid, program
    """,
    "sessionize": """
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                            ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM o
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "robots_filter": """
        SELECT doc_id,
               'http://site' || (doc_id % 10) || '.example/d/' || doc_id AS url
        FROM documents
        WHERE NOT starts_with(CAST(doc_id AS VARCHAR),
                              CAST(doc_id % 10 AS VARCHAR))
        ORDER BY doc_id
    """,
    "wedge_count": """
        WITH e AS (
            SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
            FROM events
        ),
        und AS (
            SELECT src AS node, dst AS neighbor FROM e WHERE src <> dst
            UNION ALL
            SELECT dst AS node, src AS neighbor FROM e WHERE src <> dst
        ),
        deg AS (
            SELECT node, count(DISTINCT neighbor) AS d FROM und GROUP BY node
        )
        SELECT node, d * (d - 1) // 2 AS wedges FROM deg ORDER BY node
    """,
    "block_parse": """
        SELECT o_orderkey // 10                            AS block_number,
               '0xtx' || o_orderkey                        AS tx_hash,
               o_orderkey % 10                             AS tx_index,
               lower('0xa' || o_custkey)                   AS from_addr,
               lower('0xb' || ((o_custkey * 7) % 1500))    AS to_addr,
               CAST(floor(o_totalprice * 100) AS BIGINT)   AS value
        FROM orders ORDER BY block_number, tx_index
    """,
    "utxo_edges": """
        WITH u AS (
            SELECT 'utx' || event_id AS tx, 'addr' || user_id AS addr,
                   'in' AS direction, round(value, 2) AS value FROM events
            UNION ALL
            SELECT 'utx' || event_id, 'addr' || ((user_id * 13 + event_id) % 50),
                   'out', round(value * 0.6, 2) FROM events
            UNION ALL
            SELECT 'utx' || event_id, 'addr' || user_id,
                   'out', round(value * 0.4, 2) FROM events
        )
        SELECT * FROM u ORDER BY tx, direction, addr, value
    """,
    "embedding_knn": """
        WITH q AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < 100
        ),
        scored AS (
            SELECT q.vec_id AS vec_id, e.vec_id AS nn_id,
                   list_cosine_similarity(q.v, CAST(e.embedding AS DOUBLE[])) AS sim
            FROM q CROSS JOIN embeddings e
            WHERE e.vec_id <> q.vec_id
        )
        SELECT vec_id, nn_id, round(sim, 4) AS sim FROM scored
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) = 1
        ORDER BY vec_id
    """,
    # 64-bit SimHash, full-value mirror: md5_number_lower token hashes
    # (== stages/dedup._hash_strings64 bit-for-bit), per-bit +1/-1 vote over
    # token multiset, fingerprint rendered as the same 16-hex string
    "simhash": r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
        th AS (SELECT doc_id, md5_number_lower(unnest(w)) AS h FROM toks),
        bits AS (SELECT unnest(generate_series(0, 63)) AS bit),
        acc AS (
            SELECT th.doc_id, bits.bit,
                   SUM(CASE WHEN (th.h >> bits.bit) & 1::UBIGINT = 1::UBIGINT
                       THEN 1 ELSE -1 END) AS s
            FROM th CROSS JOIN bits GROUP BY th.doc_id, bits.bit
        ),
        fp AS (
            SELECT doc_id,
                   SUM(CASE WHEN s > 0 THEN (CAST(1 AS HUGEINT) << bit) ELSE 0 END) AS v
            FROM acc GROUP BY doc_id
        )
        SELECT doc_id, lpad(lower(to_hex(CAST(v AS UBIGINT))), 16, '0') AS simhash
        FROM fp ORDER BY doc_id
    """,
}


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


ORACLE_SQL["minhash_signatures"] = (
    f"WITH {_minhash_sig_cte()}\n"
    "        SELECT doc_id, perm_id, minhash FROM sig ORDER BY doc_id, perm_id"
)

# LSH candidate pairs over the doubled corpus (q_minhash_dedup_pairs clones
# every doc at doc_id+10000): band bucket = md5_number_lower of the band's
# pipe-joined decimal minhash values (== dedup.MinHashBands `_stable_h64`
# of "|".join(str(x))), pair = two docs sharing any (band, bucket).  The
# clone has identical text, hence identical signature — mirrored by reusing
# each doc's band rows at doc_id+10000 rather than recomputing.  The
# segment cap (LSH_BUCKET_CAP=512) never triggers at oracle scale: buckets
# hold a doc and its clone, so the emitted pair set is the exact closure.
ORACLE_SQL["minhash_dedup_pairs"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        doubled AS (
            SELECT doc_id, band_id, bucket FROM band
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, band_id, bucket FROM band
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM doubled a JOIN doubled b
          ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ORDER BY doc_a, doc_b"""
)

# fuzzy decontamination: survivors = non-eval docs sharing NO band bucket
# with an eval (doc_id % 17 == 0) doc — same band CTE, anti-join form
ORACLE_SQL["decontaminate_fuzzy"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        contaminated AS (
            SELECT DISTINCT t.doc_id
            FROM band t JOIN band e
              ON t.band_id = e.band_id AND t.bucket = e.bucket
             AND e.doc_id % 17 = 0 AND t.doc_id % 17 <> 0
        )
        SELECT doc_id FROM documents
        WHERE doc_id % 17 <> 0 AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY doc_id"""
)

# incremental variant: odd (new) docs probed against even (base) docs only —
# identical band construction, cross-half join instead of the doubled self-join
ORACLE_SQL["minhash_incremental"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        )
        SELECT DISTINCT n.doc_id AS doc_new, b.doc_id AS doc_base
        FROM band n JOIN band b
          ON n.band_id = b.band_id AND n.bucket = b.bucket
         AND n.doc_id % 2 = 1 AND b.doc_id % 2 = 0
        ORDER BY doc_new, doc_base"""
)

# connected components over the same LSH pair set: transitive closure via
# recursive CTE (UNION-distinct terminates it), cluster = min reachable
# node.  Closure volume is sum(|component|^2) — bounded at oracle scale
# because LSH components are doc+clone pairs plus small injected dup
# groups; the Ray side uses iterative label propagation instead.
ORACLE_SQL["dedup_clusters"] = (
    f"WITH RECURSIVE {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        doubled AS (
            SELECT doc_id, band_id, bucket FROM band
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, band_id, bucket FROM band
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM doubled a JOIN doubled b
              ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
        )
        SELECT node AS doc_id, min(r) AS cluster_id
        FROM reach GROUP BY node ORDER BY doc_id"""
)

# dedup_survivors: the same transitive closure, then keep representatives
# (cluster_id == doc_id) and never-paired docs; represents = cluster size.
ORACLE_SQL["dedup_survivors"] = (
    f"WITH RECURSIVE {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        doubled AS (
            SELECT doc_id, band_id, bucket FROM band
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, band_id, bucket FROM band
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM doubled a JOIN doubled b
              ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
        ),
        cl AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
        sz AS (SELECT cluster_id, count(*) AS n FROM cl GROUP BY cluster_id),
        universe AS (
            SELECT doc_id FROM documents
            UNION ALL
            SELECT doc_id + 10000 AS doc_id FROM documents
        )
        SELECT u.doc_id, CAST(coalesce(sz.n, 1) AS BIGINT) AS represents
        FROM universe u
        LEFT JOIN cl ON cl.doc_id = u.doc_id
        LEFT JOIN sz ON sz.cluster_id = u.doc_id
        WHERE cl.cluster_id IS NULL OR cl.cluster_id = u.doc_id
        ORDER BY u.doc_id"""
)

# SimHash banded Hamming pairs over the doubled corpus: fingerprints via
# the same full-value chain as ORACLE_SQL['simhash'], 4 x 16-bit bands,
# candidate = shared (band_id, band_val), verified bit_count(xor) <= 3
ORACLE_SQL["simhash_pairs"] = r"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
    th AS (SELECT doc_id, md5_number_lower(unnest(w)) AS h FROM toks),
    bits AS (SELECT unnest(generate_series(0, 63)) AS bit),
    acc AS (
        SELECT th.doc_id, bits.bit,
               SUM(CASE WHEN (th.h >> bits.bit) & 1::UBIGINT = 1::UBIGINT
                   THEN 1 ELSE -1 END) AS s
        FROM th CROSS JOIN bits GROUP BY th.doc_id, bits.bit
    ),
    fp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS HUGEINT) << bit) ELSE 0 END)
                    AS UBIGINT) AS v
        FROM acc GROUP BY doc_id
    ),
    doubled AS (
        SELECT doc_id, v FROM fp
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, v FROM fp
    ),
    bands AS (
        SELECT doc_id, v, b.band_id,
               (v >> CAST(16 * b.band_id AS UBIGINT)) & 65535::UBIGINT AS band_val
        FROM doubled CROSS JOIN
             (SELECT unnest(generate_series(0, 3)) AS band_id) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.v AS va, c.doc_id AS doc_b, c.v AS vb
        FROM bands a JOIN bands c
          ON a.band_id = c.band_id AND a.band_val = c.band_val
         AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(va, vb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(va, vb)) <= 3
    ORDER BY doc_a, doc_b
"""


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


ORACLE_SQL["pagerank"] = _pagerank_oracle_sql()

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


ORACLE_SQL["langid"] = (
    f"WITH stop(lang, word) AS (VALUES {_langid_stopword_values()}"
    + r"""),
        tok AS (
            SELECT DISTINCT doc_id, w FROM (
                SELECT doc_id, lower(unnest(regexp_extract_all(text, '\S+'))) AS w
                FROM documents
            )
        ),
        hits AS (
            SELECT t.doc_id, s.lang, count(*) AS n
            FROM tok t JOIN stop s ON t.w = s.word
            GROUP BY t.doc_id, s.lang
        ),
        best AS (
            SELECT doc_id, lang FROM hits WHERE n > 0
            QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) = 1
        )
        SELECT d.doc_id,
               CASE
                   WHEN coalesce(length(d.text), 0) > 0
                        AND len(regexp_extract_all(d.text, '[一-鿿]'))::DOUBLE
                            / greatest(1, length(d.text)) > 0.05 THEN 'zh'
                   ELSE coalesce(b.lang, '')
               END AS lang_pred
        FROM documents d LEFT JOIN best b USING (doc_id)
        ORDER BY d.doc_id"""
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


ORACLE_SQL["rolling_fingerprints"] = _rolling_fp_oracle_sql()

# With nprobe == n_clusters the IVF probe pass covers every bucket, so the
# bucketed index must reproduce exact brute-force top-5 — same SQL mirror.
ORACLE_SQL["ann_ivf_exact"] = ORACLE_SQL["ann_bruteforce"]

# Same RE2 engine on both sides (pyarrow kernels / DuckDB regexp_*), same
# pattern order, counts taken BEFORE each replacement pass.
ORACLE_SQL["pii_redact"] = r"""
    WITH base AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@mail.example ip 10.0.'
                    || (doc_id % 256) || '.' || ((doc_id // 256) % 256)
                    || ' tel 555-' || printf('%03d', doc_id % 1000) || '-0199' AS s
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
               regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s
        FROM base
    ),
    s2 AS (
        SELECT doc_id, c1,
               len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
               regexp_replace(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS s
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, c1, c2,
               len(regexp_extract_all(s, '\b\d{3}-\d{3}-\d{4}\b')) AS c3,
               regexp_replace(s, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS s
        FROM s2
    )
    SELECT doc_id, s AS clean, CAST(c1 + c2 + c3 AS BIGINT) AS n_pii
    FROM s3 ORDER BY doc_id
"""

# keep-rule thresholds compare the RAW doubles (same division on both
# sides); only output columns are rounded.
ORACLE_SQL["gopher_quality"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM gc GROUP BY doc_id),
    j AS (
        SELECT ws.doc_id, ws.n, ws.mwl, ws.uq, coalesce(tp.topf, 0.0) AS topf
        FROM ws LEFT JOIN tp USING (doc_id)
    )
    SELECT doc_id, n AS n_words,
           round(mwl, 6) AS mean_word_len,
           round(uq, 6) AS uniq_frac,
           round(topf, 6) AS top_bigram_frac,
           CAST(CASE WHEN n BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
                      AND uq >= 0.45 AND topf <= 0.10 THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM j ORDER BY doc_id
"""

ORACLE_SQL["decontaminate"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' '))) AS g
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g FROM grams
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    train AS (
        SELECT doc_id FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 <> 0
    ),
    hits AS (
        SELECT gr.doc_id, count(*) AS n_hits
        FROM grams gr JOIN test USING (g)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
        GROUP BY gr.doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS contaminated
    FROM train t LEFT JOIN hits h USING (doc_id) ORDER BY doc_id
"""

ORACLE_SQL["pack_sequences"] = r"""
    WITH c AS (
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST((sum(n_tokens) OVER (ORDER BY doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // 256 AS BIGINT) AS seq_id
    FROM c ORDER BY doc_id
"""

# Replays the composite's four stages IN ORDER: quality gate -> held-out
# removal + 4-gram decontamination -> lede dedup among remaining
# candidates (row_number==1 <=> min doc_id) -> prefix-sum packing over
# survivors.
ORACLE_SQL["curation_pipeline"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' '))) AS g
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g FROM grams
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    contam AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN test USING (g)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
    ),
    w AS (SELECT doc_id, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM bgc GROUP BY doc_id),
    q AS (
        SELECT ws.doc_id, ws.n FROM ws LEFT JOIN tp USING (doc_id)
        WHERE ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
          AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
    ),
    fp AS (SELECT doc_id, list_aggregate(t[1:4], 'string_agg', ' ') AS f FROM toks),
    cand AS (
        SELECT q.doc_id, q.n, fp.f FROM q JOIN fp USING (doc_id)
        WHERE md5_number_lower(CAST(q.doc_id AS VARCHAR)) % 97 <> 0
          AND q.doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    surv AS (
        SELECT doc_id, n FROM (
            SELECT doc_id, n, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
            FROM cand
        ) s WHERE rn = 1
    )
    SELECT doc_id, n AS n_tokens,
           CAST((sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n) // 256 AS BIGINT) AS seq_id
    FROM surv ORDER BY doc_id
"""

ORACLE_SQL["self_repetition"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> list_aggregate(t[i:i+2], 'string_agg', ' '))) AS g
        FROM toks
    )
    SELECT doc_id, count(*) AS n_grams,
           round(1.0 - count(DISTINCT g) * 1.0 / count(*), 6) AS rep_frac
    FROM grams GROUP BY doc_id ORDER BY doc_id
"""

ORACLE_SQL["split_assign"] = r"""
    SELECT lang,
           CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 80 THEN 'train'
                WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n
    FROM documents GROUP BY lang, split ORDER BY lang, split
"""

ORACLE_SQL["vocab_topk"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks)
    SELECT token, count(*) AS cnt
    FROM w GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 50
"""

# tfidf = (tf / doc_len) * ln(N / df), same operation order as the Ray
# side; ranks are row_number() with (tfidf DESC, term) — the Python sort
# key (-tfidf, term) produces the identical permutation.
ORACLE_SQL["bigram_topk"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    pairs AS (
        SELECT t[i] || ' ' || t[i + 1] AS bigram
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    )
    SELECT bigram, count(*) AS cnt
    FROM pairs GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 50
"""

ORACLE_SQL["snapshot_delta"] = r"""
    WITH b AS (
        SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
    ),
    f AS (
        SELECT user_id,
               max(CASE WHEN epoch_us(ts) < mn + (mx - mn) // 2 THEN 1 ELSE 0 END) AS early,
               max(CASE WHEN epoch_us(ts) >= mn + (mx - mn) // 2 THEN 1 ELSE 0 END) AS late
        FROM events, b GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN early = 1 AND late = 1 THEN 'retained'
                WHEN late = 1 THEN 'added'
                ELSE 'removed' END AS status
    FROM f ORDER BY user_id
"""

ORACLE_SQL["tfidf_topterms"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS c FROM w GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term),
    nd AS (SELECT count(*) AS nd FROM documents),
    s AS (
        SELECT tf.doc_id, tf.term,
               (tf.c * 1.0 / dl.n) * ln(nd.nd * 1.0 / df.df) AS tfidf
        FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN nd
    ),
    r AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        FROM s
    )
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3 ORDER BY doc_id, rank
"""

ORACLE_SQL["shuffle_rank"] = r"""
    SELECT doc_id,
           CAST(row_number() OVER (
                ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || ':shuffle'),
                         doc_id) - 1 AS BIGINT) AS pos
    FROM documents ORDER BY doc_id
"""

ORACLE_SQL["unigram_logprob"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    cnt AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    tot AS (SELECT count(*) AS s FROM w)
    SELECT w.doc_id,
           round(sum(ln(cnt.c * 1.0 / tot.s)) / count(*), 6) AS logprob
    FROM w JOIN cnt USING (token) CROSS JOIN tot
    GROUP BY w.doc_id ORDER BY w.doc_id
"""

ORACLE_SQL["dup_span_fraction"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 3),
                                     i -> list_aggregate(t[i:i+4], 'string_agg', ' '))) AS g
        FROM toks
    ),
    pg AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    dg AS (SELECT g FROM pg GROUP BY g HAVING count(*) >= 2),
    tot AS (SELECT doc_id, sum(c) AS tot FROM pg GROUP BY doc_id),
    dup AS (
        SELECT pg.doc_id, sum(pg.c) AS dup
        FROM pg JOIN dg USING (g) GROUP BY pg.doc_id
    )
    SELECT t.doc_id,
           CAST(t.tot AS BIGINT) AS n_grams,
           CAST(coalesce(d.dup, 0) AS BIGINT) AS n_dup,
           round(coalesce(d.dup, 0) * 1.0 / t.tot, 6) AS dup_frac
    FROM tot t LEFT JOIN dup d USING (doc_id) ORDER BY doc_id
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

ORACLE_SQL["dsir_weights"] = f"""
    WITH {_DSIR_W_CTE}
    SELECT doc_id, dsir_weight FROM wts ORDER BY doc_id
"""

# Efraimidis-Spirakis A-Res sampling keys over exp(dsir_weight):
# u from md5(doc_id || ':es') scaled to (0,1) by 2^53 — identical doubles
# on both sides; weight rounded to 6dp before exp, key before ranking.
ORACLE_SQL["dsir_resample"] = f"""
    WITH {_DSIR_W_CTE},
    keys AS (
        SELECT doc_id,
               round(ln((md5_number_lower(CAST(doc_id AS VARCHAR) || ':es')
                         % 9007199254740992) / 9007199254740992.0)
                     / exp(dsir_weight), 6) AS es_key
        FROM wts
    ),
    r AS (
        SELECT doc_id, es_key,
               CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT) AS rank
        FROM keys
    )
    SELECT doc_id, es_key, rank FROM r WHERE rank <= 100 ORDER BY rank
"""

# pretrain_mix: held-out removal -> Gopher gate -> 4-gram decontamination
# -> DSIR weight > 0 -> sequence packing, replayed stage for stage.
ORACLE_SQL["pretrain_mix"] = r"""
    WITH toks AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' '))) AS g
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g FROM grams
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    contam AS (
        SELECT DISTINCT gr.doc_id FROM grams gr JOIN test USING (g)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
    ),
    w AS (SELECT doc_id, lang, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM bgc GROUP BY doc_id),
    q AS (
        SELECT ws.doc_id, ws.n FROM ws LEFT JOIN tp USING (doc_id)
        WHERE ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
          AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
    ),
    bkt AS (SELECT doc_id, lang,
                   CAST(md5_number_lower(w) % 64 AS INT) AS bucket FROM w),
    raw AS (SELECT bucket, count(*) AS c FROM bkt GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS c FROM bkt WHERE lang = 'en' GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM bkt) AS rtot,
                   (SELECT count(*) FROM bkt WHERE lang = 'en') AS ttot),
    lr AS (
        SELECT raw.bucket,
               ln((coalesce(tgt.c, 0) + 1.0) / (tot.ttot + 64)) -
               ln((raw.c + 1.0) / (tot.rtot + 64)) AS lnr
        FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot
    ),
    wts AS (
        SELECT bkt.doc_id, round(sum(lr.lnr) / count(*), 6) AS dw
        FROM bkt JOIN lr USING (bucket) GROUP BY bkt.doc_id
    ),
    cand AS (
        SELECT q.doc_id, q.n FROM q JOIN wts USING (doc_id)
        WHERE md5_number_lower(CAST(q.doc_id AS VARCHAR)) % 97 <> 0
          AND q.doc_id NOT IN (SELECT doc_id FROM contam)
          AND wts.dw > 0
    )
    SELECT doc_id, n AS n_tokens,
           CAST((sum(n) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n) // 256 AS BIGINT) AS seq_id
    FROM cand ORDER BY doc_id
"""

# anchor_agg: the fixture's one link per doc carries anchor 'next <id>';
# the canonical target equals the canonicalize_urls synthesis string.
ORACLE_SQL["anchor_agg"] = f"""
    WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents),
    a AS (
        SELECT 'site' || (doc_id % 10) || '.example' AS host,
               'http://site' || (doc_id % 10) || '.example/d/'
                 || ((doc_id * 7) % 500) || '?a=1&b=2' AS target,
               regexp_extract(html, '<a [^>]*href="[^"]*"[^>]*>([^<]*)</a>', 1) AS anchor
        FROM h
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(count(DISTINCT target) AS BIGINT) AS n_targets,
           array_to_string((list_sort(list(anchor)))[1:32], '|') AS anchors_sample
    FROM a GROUP BY host ORDER BY host
"""

# audio_decode: the FAKEAUD header fields are exact functions of doc_id;
# duration computed as n * 1.0 / rate on both sides (identical doubles).
ORACLE_SQL["audio_decode"] = r"""
    SELECT doc_id,
           CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
           CAST(500 + doc_id % 100 AS BIGINT) AS n_samples,
           (500 + doc_id % 100) * 1.0 / (8000 + (doc_id % 3) * 4000) AS duration_s
    FROM documents ORDER BY doc_id
"""

# browser_render: DOC_HTML_SQL is ascii, so length() == the stage's char
# budget; the WHERE mirrors the body-wait timeout drop (IgnoreRequest).
ORACLE_SQL["browser_render"] = f"""
    WITH h AS (SELECT doc_id, {DOC_HTML_SQL} AS html FROM documents)
    SELECT doc_id,
           html || '<!-- rendered -->' AS page_source,
           CAST(200 AS INTEGER) AS status
    FROM h WHERE length(html) <= 600 ORDER BY doc_id
"""




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
    """64-perm MinHash signatures over 3-shingles (near-dup primitive),
    exploded to (doc_id, perm_id, minhash) long form so every signature
    value sits under the driver's value-hash compare.  The DuckDB oracle
    recomputes the signatures bit-for-bit: md5_number_lower token hashes,
    rotate-xor shingle combine, and the wraparound (mod 2^64) universal-
    hash perm step, all in integer SQL (stages/dedup.py keeps the math
    SQL-expressible by construction)."""
    from ..stages.dedup import MinHasher

    sig = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _cached_stage(MinHasher), batch_format="pyarrow"
    )

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        sigs = b.column("signature")
        flat = pc.list_flatten(sigs.combine_chunks()).to_numpy().astype(np.int64)
        counts = pc.list_value_length(sigs).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "perm_id": pa.array(
                    np.concatenate([np.arange(c) for c in counts]) if len(counts) else [],
                    pa.int64(),
                ),
                "minhash": pa.array(flat, pa.int64()),
            }
        )

    return sig.map_batches(explode, batch_format="pyarrow").sort(["doc_id", "perm_id"])


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


def q_minhash_dedup_pairs(sf_dir: str):
    """LSH candidate pairs: doubled corpus (exact dups) -> shingle -> minhash
    -> band buckets -> groupby -> pairs.  Every injected duplicate pair must
    surface (tested in tests/test_dedup.py)."""
    distinct = _minhash_pair_dataset(sf_dir)
    out_dir = os.environ.get("MINHASH_PAIRS_OUT")
    if out_dir:
        # production sink: pairs stream straight to partitioned parquet —
        # the driver-side concat below exists only for the query-return
        # contract (r1 VERDICT note)
        distinct.write_parquet(out_dir)
        import ray.data as _rd

        return pa.concat_tables(
            [
                pa.table(b)
                for b in _rd.read_parquet(out_dir).iter_batches(
                    batch_format="pyarrow", batch_size=65536
                )
            ]
        ).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])
    return pa.concat_tables(
        [pa.table(b) for b in distinct.iter_batches(batch_format="pyarrow", batch_size=65536)]
    )


def q_bloom_semijoin(sf_dir: str):
    """Bloom-prefiltered semi-join: keep lineitems of high-value orders.
    The build side reduces to per-batch bitmaps OR-folded into one 128 KB
    Bloom filter (stages/sketch.py build_bloom — shuffle-free, the
    broadcast-seen-set shape: at 10^10 keys the filter, not the key set,
    is what every node can hold).  The probe side drops ~80% of rows
    BEFORE any shuffle; the few survivors then exact-confirm through the
    partitioned hash_join, so Bloom false positives never reach the
    output — the result is exact and the oracle is a plain IN-subquery."""
    from ..stages.joins import hash_join
    from ..stages.sketch import BloomFilter, build_bloom

    keys = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
        filter=(pc.field("o_totalprice") > 400000.0),
    ).select_columns(["o_orderkey"])
    bloom = build_bloom(keys, "o_orderkey", m_bits=1 << 20)
    bloom_ref = ray.put((bloom.m, bloom.k, bloom.bits))

    class Probe:
        def __init__(self):
            m, k, bits = ray.get(bloom_ref)
            self.f = BloomFilter(m, k, bits=bits)

        def __call__(self, b: pa.Table) -> pa.Table:
            return b.filter(pa.array(self.f.contains(b.column("l_orderkey"))))

    line = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    survivors = line.map_batches(Probe, batch_format="pyarrow", concurrency=(1, 8))
    out = hash_join(survivors, keys, key="l_orderkey", right_key="o_orderkey", how="inner")
    return (
        out.map_batches(lambda b: _round_col(b, "l_extendedprice", 2), batch_format="pyarrow")
        .sort(["l_orderkey", "l_linenumber"])
    )


def q_minhash_incremental(sf_dir: str):
    """INCREMENTAL near-dup: the streaming complement of minhash_dedup_pairs.
    Even doc_ids play the already-crawled base corpus — their band rows
    insert into a sharded LSH index actor pool (stages/dedup.LSHIndexShard,
    O(rows/shards) memory per actor).  Odd doc_ids play the new crawl
    round — probed against the index, emitting cross-half candidate pairs
    WITHOUT re-shuffling the base corpus (the continuous-crawl shape: each
    round costs O(new docs), not O(corpus)).  The phase barrier is the
    materialization of the insert pipeline."""
    from ..stages.dedup import (
        LSHIndexProber,
        LSHIndexShard,
        LSHIndexWriter,
        MinHashBands,
        MinHasher,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def half(parity: int):
        return docs.map_batches(
            lambda b, p=parity: b.filter(
                pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), p)
            ),
            batch_format="pyarrow",
        )

    def bands_of(ds):
        return ds.map_batches(_cached_stage(MinHasher), batch_format="pyarrow").map_batches(
            _cached_stage(MinHashBands), batch_format="pyarrow"
        )

    shards = [LSHIndexShard.remote() for _ in range(4)]
    try:
        # phase 1: index the base half; count() is the insert barrier
        bands_of(half(0)).map_batches(
            LSHIndexWriter(shards), batch_format="pyarrow"
        ).count()
        # phase 2: probe the new half, distinct the candidate pairs
        pairs = (
            bands_of(half(1))
            .map_batches(LSHIndexProber(shards), batch_format="pyarrow")
            .groupby(["doc_new", "doc_base"])
            .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
            .sort(["doc_new", "doc_base"])
        )
        out = pa.concat_tables(
            [pa.table(b) for b in pairs.iter_batches(batch_format="pyarrow", batch_size=65536)]
        )
        stats = ray.get([s.stats.remote() for s in shards])
        dropped = sum(s["dropped"] for s in stats)
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "incremental LSH index dropped %d over-cap bucket members", dropped
            )
    finally:
        for s in shards:
            ray.kill(s)
    return out


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


def q_pagerank(sf_dir: str):
    """Batch PageRank over the crawl store's REAL extracted link graph —
    the offline whole-graph complement of the push-based APPR/TTR crawl
    strategies (page importance as a quality prior / frontier seed score).
    Pages -> extract_links_stage -> canonical found-page edges -> 3
    power iterations via stages/graph.py pagerank (tagged-union groupby
    message pass; only scalar-pair rows shuffle).  Oracle: the same
    arithmetic link graph (t1 = 7d+1, same-host t3 = d+10 — the
    query-string/dangling/cdn links canonicalize to non-store URLs and are
    filtered) with 3 unrolled iterations in SQL."""
    from ..stages.graph import pagerank

    ranks = pagerank(_link_edges(sf_dir), iters=3, damping=0.85).sort("node").to_pandas()
    ranks = ranks.rename(columns={"node": "doc_id", "rank": "pagerank"})
    ranks["pagerank"] = _r(ranks["pagerank"].to_numpy(), 6)
    return ranks


def q_dedup_clusters(sf_dir: str):
    """Pairs -> clusters: the standard final step of near-dup dedup at
    scale.  Connected components over the MinHash-LSH candidate-pair graph
    (same pair set as ``minhash_dedup_pairs``), labelling every paired doc
    with the minimum doc_id of its component — downstream "keep one
    representative per cluster" is then a trivial filter
    (doc_id == cluster_id).  Distributed iterative min-label propagation
    (stages/dedup.py connected_components): each round shuffles only
    (int64, int64) rows, convergence detected via a monotone label-sum
    checksum.  Oracle: recursive-CTE transitive closure over the identical
    DuckDB-recomputed pair set, cluster_id = min reachable node."""
    from ..stages.dedup import connected_components

    return connected_components(_minhash_pair_dataset(sf_dir)).sort("doc_id")


def q_dedup_survivors(sf_dir: str):
    """Clusters -> the deduplicated corpus: the keep-one-representative
    step that turns near-dup clusters into the surviving document set,
    with ``represents`` = how many originals each survivor stands for
    (the weight downstream sampling needs).  Fully distributed anti-join:
    the universe, the per-cluster size rows and the non-representative
    drop rows are unioned as (doc_id, rep, drop) triples and folded by one
    groupby — no side is materialized or broadcast, so a 10^10-doc corpus
    with a 10^9-doc duplicate set streams through.  Same doubled corpus as
    ``dedup_clusters`` (clone at doc_id+10000 guarantees every doc has a
    near-dup)."""
    from ..stages.dedup import connected_components

    cc = connected_components(_minhash_pair_dataset(sf_dir))

    def size_rows(b: pa.Table) -> pa.Table:
        # one row per representative: rep = cluster size
        return pa.table(
            {
                "doc_id": b.column("cluster_id"),
                "rep": b.column("count()").cast(pa.int64()),
                "drop": pa.array([0] * b.num_rows, pa.int64()),
            }
        )

    sizes = (
        cc.groupby("cluster_id")
        .count()
        .map_batches(size_rows, batch_format="pyarrow")
    )

    def drop_rows(b: pa.Table) -> pa.Table:
        mask = pc.not_equal(b.column("doc_id"), b.column("cluster_id"))
        kept = b.filter(mask)
        n = kept.num_rows
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "rep": pa.array([0] * n, pa.int64()),
                "drop": pa.array([1] * n, pa.int64()),
            }
        )

    drops = cc.map_batches(drop_rows, batch_format="pyarrow")

    def universe_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        both = np.concatenate([ids, ids + 10000])
        n = len(both)
        return pa.table(
            {
                "doc_id": pa.array(both, pa.int64()),
                "rep": pa.array([1] * n, pa.int64()),
                "drop": pa.array([0] * n, pa.int64()),
            }
        )

    universe = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        universe_rows, batch_format="pyarrow"
    )

    def finish(b: pa.Table) -> pa.Table:
        kept = b.filter(pc.equal(b.column("max(drop)"), 0))
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "represents": kept.column("max(rep)").cast(pa.int64()),
            }
        )

    return (
        universe.union(sizes, drops)
        .groupby("doc_id")
        .max(["rep", "drop"])
        .map_batches(finish, batch_format="pyarrow")
        .sort("doc_id")
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
        table = ray.get(ref)
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


def q_simhash(sf_dir: str):
    from ..stages.dedup import SimHasher

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(SimHasher), batch_format="pyarrow")
        .sort("doc_id")
    )


def q_simhash_pairs(sf_dir: str, t: int = 3):
    """SimHash near-dup PAIRS (Manku et al. banded Hamming join): 64-bit
    fingerprint -> 4 x 16-bit bands (pigeonhole: any pair with hamming <= 3
    shares at least one exact band) -> groupby(band_id, band_val) -> pairs
    within bucket verified hamming <= t.  The fingerprint rides along in
    the band rows, so verification happens inside the group with no
    fingerprint join; shuffle rows are 4 scalars.  Doubled corpus (clones
    at doc_id+10000) guarantees exact-dup pairs like minhash_dedup_pairs.
    Oracle recomputes fingerprints via the simhash full-value SQL mirror
    and the identical band join + bit_count filter."""
    from ..stages.dedup import LSH_BUCKET_CAP, SimHasher, emit_bucket_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def clone(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        txt = b.column("text")
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([ids, ids + 10000]), pa.int64()),
                "text": pa.concat_arrays([txt.combine_chunks(), txt.combine_chunks()]),
            }
        )

    fps = docs.map_batches(clone, batch_format="pyarrow").map_batches(
        _cached_stage(SimHasher), batch_format="pyarrow"
    )

    def to_bands(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        v = np.array(
            [int(h, 16) for h in b.column("simhash").to_pylist()], dtype=np.uint64
        )
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
                "fp": pa.array(np.tile(v, 4), pa.uint64()),
                "band_id": pa.array(np.repeat(np.arange(4, dtype=np.int64), n), pa.int64()),
                "band_val": pa.array(
                    np.concatenate(
                        [(v >> np.uint64(16 * k)) & np.uint64(0xFFFF) for k in range(4)]
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def pairs_of_group(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_pylist()
        fp = dict(zip(ids, (int(x) for x in g.column("fp").to_pylist())))
        out_a, out_b, out_h = [], [], []
        for a, b_ in emit_bucket_pairs(ids, cap=LSH_BUCKET_CAP):
            h = (fp[a] ^ fp[b_]).bit_count()
            if h <= t:
                out_a.append(a)
                out_b.append(b_)
                out_h.append(h)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    return (
        fps.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )


def q_langid(sf_dir: str):
    from ..stages.textstats import LangIdStage

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(LangIdStage), batch_format="pyarrow")
        .sort("doc_id")
    )


def q_rolling_fingerprints(sf_dir: str):
    """Winnowing-lite document fingerprints (rolling Rabin-Karp window
    hashes, keep-4 smallest), exploded to (doc_id, fp_rank, fingerprint)
    long form so every value sits under the driver's hash compare; the
    DuckDB oracle replays the identical integer recipe
    (ORACLE_SQL['rolling_fingerprints'])."""
    from ..stages.textstats import FingerprintStage

    fps = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        _cached_stage(FingerprintStage), batch_format="pyarrow"
    )

    def explode(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        lists = b.column("fingerprints")
        flat = pc.list_flatten(lists.combine_chunks()).to_numpy().astype(np.int64)
        counts = pc.list_value_length(lists).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "fp_rank": pa.array(
                    np.concatenate([np.arange(c) for c in counts]) if len(counts) else [],
                    pa.int64(),
                ),
                "fingerprint": pa.array(flat, pa.int64()),
            }
        )

    return fps.map_batches(explode, batch_format="pyarrow").sort(["doc_id", "fp_rank"])


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


def q_ann_ivf_exact(sf_dir: str):
    """IVF machinery under the DuckDB oracle: with ``nprobe == n_clusters``
    every bucket is probed, so the bucketed index (unbiased hash-bottom-k
    centroid sample + distributed Lloyd refinement + streaming per-bucket
    probe pass) must reproduce the exact brute-force top-5 — same oracle
    SQL as ``ann_bruteforce``.  The approximate path (``ann_ivf``,
    nprobe < n_clusters) stays recall-tested in tests/test_similarity.py;
    this entry pins the index build/assign/search plumbing itself."""
    from ..stages.similarity import IVFIndex

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = emb.filter(expr="vec_id < 3").to_pandas()
    idx = IVFIndex(n_clusters=8, nprobe=8).build(emb)
    out = idx.search(
        queries["vec_id"].to_numpy(), np.stack(queries["embedding"].to_numpy()), k=5
    ).to_pandas()
    out["sim"] = _r(out["sim"].to_numpy(), 4)
    return out


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

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    key = (sf_dir, job)
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


def q_crawl_bfs(sf_dir: str):
    """Flagship: BFS web crawl over the documents-derived page store with
    politeness budget 4/host/round and a sharded cuckoo seen set."""
    return _run_crawl(sf_dir, "bfs", depth=8)


def q_crawl_bfs_depths(sf_dir: str):
    """The crawl ENGINE under the driver's SQL gate: unlimited politeness
    budget + whole-queue pops make each engine round exactly one BFS layer,
    so (round, url, found) is mirrorable as a DuckDB recursive CTE over the
    arithmetic link graph of crawl_doc_html (fixtures.py) — t1 = 7d+1 and
    the same-host successor t3 = d+10 expand (found pages); the query-string,
    dangling, and cdn-script links are admitted-but-missed dead ends one
    layer below their parent.  Exercises admission, the sharded seen gate,
    miss handling, and round accounting end-to-end."""
    t = _run_crawl(
        sf_dir,
        "bfs",
        _cfg=dict(pop_k=1_000_000, host_budget=0, max_fetches=None, max_rounds=32),
        depth=32,
    )
    import pandas as pd

    df = t.select(["round", "url", "found"]).to_pandas()
    df["round"] = df["round"].astype("int64")
    return df.sort_values(["round", "url"]).reset_index(drop=True)


def q_crawl_haircut(sf_dir: str):
    return _run_crawl(sf_dir, "haircut", min_weight=1e-4)


def q_crawl_appr(sf_dir: str):
    """Push-based personalized-PageRank frontier (reference appr.py)."""
    return _run_crawl(sf_dir, "appr", alpha=0.15, epsilon=1e-5)


def q_crawl_ttr_weight(sf_dir: str):
    """TTR weight-ranked frontier (reference ttr.py:102-161)."""
    return _run_crawl(sf_dir, "ttr_weight", alpha=0.15, beta=0.8, epsilon=1e-4)


def q_crawl_poison(sf_dir: str):
    """Poison (taint, out-edges-only BFS) frontier (reference poison.py)."""
    return _run_crawl(sf_dir, "poison", depth=8)


def q_crawl_ttr_time(sf_dir: str):
    """TTR temporal-chip frontier (reference ttr.py:164-331)."""
    return _run_crawl(sf_dir, "ttr_time", alpha=0.15, beta=0.8, epsilon=1e-4)


def q_crawl_ttr_redirect(sf_dir: str):
    """TTRRedirect cross-token netting frontier (reference ttr.py:334-825)."""
    return _run_crawl(sf_dir, "ttr_redirect", alpha=0.15, beta=0.8, epsilon=1e-4)


def q_crawl_bfs_dataset(sf_dir: str):
    """Dataset-native BFS: the frontier is a ray.data.Dataset end-to-end
    (seen gate inside map_batches against sharded actors, groupby-host
    admission, partition-pruned fetch+explode, groupby-url min-depth
    dedup) — no driver-side candidate lists (crawl/dataset_bfs.py;
    set-equality with the round engine pinned in tests/test_dataset_bfs.py).

    Budget-free config so round == BFS depth and the result mirrors as a
    DuckDB recursive CTE (the driver's gate); the budgeted politeness path
    is pinned in tests/test_dataset_bfs.py + the politeness_admission
    oracle."""
    from ..crawl.dataset_bfs import DatasetBFSCrawl

    store = _crawl_store_for(sf_dir)
    fetched, rounds = DatasetBFSCrawl(
        store,
        seeds=["http://site0.example/d/0"],
        depth=6,
        host_budget=0,
        seen_shards=4,
        seen_use_ray=True,
    ).run()
    import pandas as pd

    df = fetched.sort_by([("round", "ascending"), ("url", "ascending")]).to_pandas()
    for c in ("depth", "round"):
        df[c] = df[c].astype("int64")
    return df


def q_crawl_haircut_sharded(sf_dir: str):
    """Haircut over the actor-sharded rank pool (scale path) — must match
    q_crawl_haircut row-for-row (asserted in tests/test_rank_pool.py)."""
    return _run_crawl(sf_dir, "haircut_sharded", min_weight=1e-4, num_shards=4, use_ray=True)


def q_crawl_appr_sharded(sf_dir: str):
    """APPR over the actor-sharded rank pool — pop-order exact vs
    q_crawl_appr since r2 (first_drainable arrival-ordered drain;
    row-for-row equality pinned in tests/test_rank_pool.py)."""
    return _run_crawl(sf_dir, "appr_sharded", alpha=0.15, epsilon=1e-5, num_shards=4, use_ray=True)


def q_crawl_ttr_time_sharded(sf_dir: str):
    """TTRTime over the actor-sharded CHIP pool (state/chip_pool.py) —
    pop-order exact vs q_crawl_ttr_time (tests/test_rank_pool.py)."""
    return _run_crawl(
        sf_dir, "ttr_time_sharded", alpha=0.15, beta=0.8, epsilon=1e-4,
        num_shards=4, use_ray=True,
    )


_RE_ANCHOR = re.compile(r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>')


ANCHOR_SAMPLE_K = 32


def q_anchor_agg(sf_dir: str):
    """Per-host anchor-text profile over the extracted link graph — the
    web-native aggregation search/training pipelines build (anchor text is
    the classic off-page document description): in-link count, distinct
    target count, and the K codepoint-smallest anchor texts as a bounded
    sample.  Scale shape: a popular host has 10^8+ in-links, so nothing
    ever groups raw anchor rows by host alone.  Counts pre-aggregate per
    (host, target) inside each batch, shuffle as scalar rows, and fold to
    per-host sums; the anchor sample keeps only the local top-K per batch
    before the shuffle, so the merge group holds <= K rows per upstream
    block, never the in-link set.  The full sorted concat the fixture
    could afford is deliberately NOT offered — the capped sample is the
    only output shape that survives a degenerate host (same rule as the
    LSH bucket cap in stages/dedup.py)."""
    ds = _docs_html_ds(sf_dir)

    def pairs(b: pa.Table) -> pa.Table:
        hosts, targets, anchors = [], [], []
        for h in b.column("html").to_pylist():
            for href, anchor in _RE_ANCHOR.findall(h):
                cu = canonicalize_url(href)
                hosts.append(host_of(cu))
                targets.append(cu)
                anchors.append(anchor)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "target": pa.array(targets, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )

    p = ds.map_batches(pairs, batch_format="pyarrow")

    # counts: (host, target) partial counts per batch -> per-target sums
    # -> per-host (n_targets, n_anchors); every shuffled row is scalars
    def local_tc(b: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter(zip(b.column("host").to_pylist(), b.column("target").to_pylist()))
        return pa.table(
            {
                "host": pa.array([k[0] for k in c], pa.string()),
                "target": pa.array([k[1] for k in c], pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    def host_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": b.column("host"),
                "t_one": pa.array([1] * b.num_rows, pa.int64()),
                "a_cnt": b.column("sum(c)").cast(pa.int64()),
            }
        )

    counts = (
        p.map_batches(local_tc, batch_format="pyarrow")
        .groupby(["host", "target"])
        .sum("c")
        .map_batches(host_rows, batch_format="pyarrow")
        .groupby("host")
        .sum(["t_one", "a_cnt"])
    )

    # sample: local top-K smallest anchors per (host, batch) -> bounded
    # per-host merge (<= K rows per upstream block in a group)
    def local_topk(b: pa.Table) -> pa.Table:
        buf: dict = {}
        for h, a in zip(b.column("host").to_pylist(), b.column("anchor").to_pylist()):
            buf.setdefault(h, []).append(a)
        hosts, anchors = [], []
        for h, al in buf.items():
            for a in sorted(al)[:ANCHOR_SAMPLE_K]:
                hosts.append(h)
                anchors.append(a)
        return pa.table(
            {"host": pa.array(hosts, pa.string()), "anchor": pa.array(anchors, pa.string())}
        )

    def merge_topk(g: pa.Table) -> pa.Table:
        top = sorted(g.column("anchor").to_pylist())[:ANCHOR_SAMPLE_K]
        return pa.table(
            {
                "host": pa.array([g.column("host")[0].as_py()], pa.string()),
                "anchors_sample": pa.array(["|".join(top)], pa.string()),
            }
        )

    sample = (
        p.map_batches(local_topk, batch_format="pyarrow")
        .groupby("host")
        .map_groups(merge_topk, batch_format="pyarrow")
    )

    # zip the two per-host tables (one row per host each) without a
    # driver-side join: union with null-padding + one bounded groupby fold
    def pad_counts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": b.column("host"),
                "n_targets": b.column("sum(t_one)").cast(pa.int64()),
                "n_anchors": b.column("sum(a_cnt)").cast(pa.int64()),
                "anchors_sample": pa.array([None] * b.num_rows, pa.string()),
            }
        )

    def pad_sample(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": b.column("host"),
                "n_targets": pa.array([None] * b.num_rows, pa.int64()),
                "n_anchors": pa.array([None] * b.num_rows, pa.int64()),
                "anchors_sample": b.column("anchors_sample"),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": pa.array([g.column("host")[0].as_py()], pa.string()),
                "n_anchors": pa.array(
                    [pc.max(g.column("n_anchors")).as_py()], pa.int64()
                ),
                "n_targets": pa.array(
                    [pc.max(g.column("n_targets")).as_py()], pa.int64()
                ),
                "anchors_sample": pa.array(
                    [pc.max(g.column("anchors_sample")).as_py()], pa.string()
                ),
            }
        )

    return (
        counts.map_batches(pad_counts, batch_format="pyarrow")
        .union(sample.map_batches(pad_sample, batch_format="pyarrow"))
        .groupby("host")
        .map_groups(fold, batch_format="pyarrow")
        .sort("host")
    )


def q_browser_render(sf_dir: str):
    """Browser-rendered fetch (reference middlewares/selenium.py:14-46) via
    the deterministic fake renderer: pages whose <body> appears within the
    render budget come back as page_source + RENDER_MARKER with status 200;
    slower pages are dropped, the IgnoreRequest analogue.  timeout=600 at
    render_rate=1 char/s drops roughly the slower half of the corpus."""
    from ..stages.browser import BrowserFetchStage

    stage = BrowserFetchStage(renderer="fake", timeout=600.0, render_rate=1.0)
    return (
        _docs_html_ds(sf_dir)
        .map_batches(stage, batch_format="pyarrow")
        .sort("doc_id")
    )


def q_sitemap_parse(sf_dir: str):
    """Sitemap-XML seed discovery — the crawl-side reader every production
    frontier bootstraps from (the web analogue of the reference's seed-list
    CSV reader, spiders/txs/__init__.py seed loading): parse
    <urlset><url><loc/><lastmod/><priority/></url>... payloads into one
    row per discovered url.  Payloads are synthesized deterministically
    per doc_id (same convention as q_xml_labels); parsing is ElementTree
    inside map_batches — stateless, embarrassingly parallel, no shuffle
    until the output sort."""
    import xml.etree.ElementTree as ET

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        xmls = []
        for d in ids:
            entries = "".join(
                f"<url><loc>https://host{d % 50}.example/sitemap/{d}/{j}</loc>"
                f"<lastmod>2024-{d % 12 + 1:02d}-01</lastmod>"
                f"<priority>0.{j + 1}</priority></url>"
                for j in range(d % 3 + 1)
            )
            xmls.append(f"<urlset>{entries}</urlset>")
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "xml": pa.array(xmls, pa.string())}
        )

    def parse(b: pa.Table) -> pa.Table:
        ds, locs, mods, prios = [], [], [], []
        for d, x in zip(b.column("doc_id").to_pylist(), b.column("xml").to_pylist()):
            for u in ET.fromstring(x).findall("url"):
                ds.append(d)
                locs.append(u.findtext("loc"))
                mods.append(u.findtext("lastmod"))
                prios.append(float(u.findtext("priority")))
        return pa.table(
            {
                "doc_id": pa.array(ds, pa.int64()),
                "loc": pa.array(locs, pa.string()),
                "lastmod": pa.array(mods, pa.string()),
                "priority": pa.array(prios, pa.float64()),
            }
        )

    return (
        docs.map_batches(synth, batch_format="pyarrow")
        .map_batches(parse, batch_format="pyarrow")
        .sort(["doc_id", "loc"])
    )


ORACLE_SQL["sitemap_parse"] = """
    WITH j AS (
        SELECT doc_id, CAST(unnest(range(0, doc_id % 3 + 1)) AS BIGINT) AS j
        FROM documents
    )
    SELECT doc_id,
           'https://host' || (doc_id % 50) || '.example/sitemap/' || doc_id
               || '/' || j AS loc,
           '2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-01'
               AS lastmod,
           CAST('0.' || (j + 1) AS DOUBLE) AS priority
    FROM j ORDER BY doc_id, loc
"""


def q_dedup_spans_remove(sf_dir: str, n: int = 5):
    """Exact duplicate-SPAN REMOVAL (Lee et al. 2022's exact substring
    dedup, applied rather than just measured — the curation complement of
    q_dup_span_fraction): every token position covered by an n-gram that
    occurs in >= 2 distinct documents corpus-wide is dropped; the doc's
    surviving tokens re-join into text_clean.

    Shape: stage 1 is the dup-verdict shuffle from dup_span_fraction
    ((gram, doc) rows unique per pair, 256-way gram-hash buckets, verdict
    = group size inside the bucket group) emitting only the DUP (doc,
    gram) pairs; stage 2 reunites those pairs with the doc text via a
    null-padded union + per-doc map_groups — each group holds ONE doc's
    text plus its dup grams (bounded by the doc's own gram count), never
    a corpus-wide structure, and re-derives covered positions locally.
    No join, no driver-side state; gram keys stay strings for exactness
    (swap in _hash_strings64 at 10^10 docs)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..stages.dedup import _hash_strings64

    def emit(b: pa.Table) -> pa.Table:
        gs, ds = [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = re.findall(r"\S+", t or "")
            seen_g = set()
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                if g not in seen_g:
                    seen_g.add(g)
                    gs.append(g)
                    ds.append(d)
        gb = (_hash_strings64(gs) % np.uint64(256)).astype(np.int64)
        return pa.table(
            {
                "gb": pa.array(gb, pa.int64()),
                "g": pa.array(gs, pa.string()),
                "doc_id": pa.array(ds, pa.int64()),
            }
        )

    def judge(b: pa.Table) -> pa.Table:
        # rows unique per (gram, doc): group size == distinct docs
        df = b.select(["g", "doc_id"]).to_pandas()
        keep = df[df.groupby("g")["doc_id"].transform("size") >= 2]
        return pa.table(
            {
                "doc_id": pa.array(keep["doc_id"].to_numpy(), pa.int64()),
                "g": pa.array(keep["g"].to_numpy(), pa.string()),
                "text": pa.array([None] * len(keep), pa.string()),
            }
        )

    dup_rows = (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(judge, batch_format="pyarrow")
    )

    def pad_doc(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "g": pa.array([None] * b.num_rows, pa.string()),
                "text": b.column("text"),
            }
        )

    def clean(gtbl: pa.Table) -> pa.Table:
        doc_id = gtbl.column("doc_id")[0].as_py()
        text = ""
        dup = set()
        for g, t in zip(gtbl.column("g").to_pylist(), gtbl.column("text").to_pylist()):
            if g is not None:
                dup.add(g)
            elif t is not None:
                text = t
        toks = re.findall(r"\S+", text)
        covered = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            if " ".join(toks[i : i + n]) in dup:
                for p in range(i, i + n):
                    covered[p] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        return pa.table(
            {
                "doc_id": pa.array([doc_id], pa.int64()),
                "n_tokens": pa.array([len(toks)], pa.int64()),
                "n_removed": pa.array([sum(covered)], pa.int64()),
                "text_clean": pa.array([" ".join(kept)], pa.string()),
            }
        )

    return (
        dup_rows.select_columns(["doc_id", "g", "text"])
        .union(docs.map_batches(pad_doc, batch_format="pyarrow"))
        .groupby("doc_id")
        .map_groups(clean, batch_format="pyarrow")
        .sort("doc_id")
    )


ORACLE_SQL["dedup_spans_remove"] = r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\s+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id, t,
               CAST(unnest(range(1, greatest(len(t) - 3, 1))) AS INT) AS i
        FROM toks
    ),
    grams AS (
        SELECT doc_id, i,
               list_aggregate(t[i:i+4], 'string_agg', ' ') AS g
        FROM pos
    ),
    dg AS (
        SELECT g FROM (SELECT g, doc_id FROM grams GROUP BY g, doc_id)
        GROUP BY g HAVING count(*) >= 2
    ),
    occ AS (SELECT DISTINCT doc_id, i FROM grams JOIN dg USING (g)),
    allpos0 AS (
        SELECT doc_id, t,
               CAST(unnest(range(1, len(t) + 1)) AS INT) AS p
        FROM toks
    ),
    allpos AS (SELECT doc_id, t[p] AS token, p FROM allpos0),
    cov AS (
        SELECT DISTINCT a.doc_id, a.p
        FROM allpos a JOIN occ o
          ON a.doc_id = o.doc_id AND a.p >= o.i AND a.p <= o.i + 4
    ),
    agg AS (
        SELECT a.doc_id,
               count(*) AS n_tokens,
               count(c.p) AS n_removed,
               coalesce(string_agg(a.token, ' ' ORDER BY a.p)
                            FILTER (WHERE c.p IS NULL), '') AS text_clean
        FROM allpos a LEFT JOIN cov c ON a.doc_id = c.doc_id AND a.p = c.p
        GROUP BY a.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(agg.n_removed, 0) AS BIGINT) AS n_removed,
           coalesce(agg.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id
"""


def q_redirect_resolve(sf_dir: str):
    """Redirect-chain resolution by POINTER JUMPING — the web-graph op a
    crawler needs before canonical-url dedup (301 chains must collapse to
    their terminal before urls are compared).  Every url points at its
    redirect target (terminal urls point nowhere); log2(max-chain)
    doubling rounds replace each pointer with its pointer's pointer,
    accumulating hop counts, so a length-L chain resolves in ceil(log2 L)
    shuffles instead of L sequential lookups — the only shape that works
    when chains live across 10^10 rows.

    Each round is ONE hash-shuffle: the current (u -> ptr, hops) state is
    re-keyed by ptr and unioned with itself keyed by u, so each group
    holds one node's own state plus everyone currently pointing at it —
    a join expressed as groupby().map_groups over null-padded rows, the
    same trick as anchor_agg/dedup_spans_remove.  Redirect graph is
    synthesized deterministically (doc d redirects to d-1 unless
    d % 7 == 0, giving chains of length 0..6); the oracle states the
    closed-form fixpoint."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    rounds = 3  # ceil(log2(6 + 1)) — chains of length <= 6

    def init(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        term = d % 7 == 0
        ptr = np.where(term, d, d - 1)
        return pa.table(
            {
                "u": pa.array(d, pa.int64()),
                "ptr": pa.array(ptr, pa.int64()),
                "hops": pa.array((~term).astype(np.int64), pa.int64()),
                "done": pa.array(term, pa.bool_()),
            }
        )

    # state is consumed TWICE per round (query + answer side of the
    # union) and re-unioned every round: pin it per round or the lazy DAG
    # doubles per doubling — 2^rounds replays of everything upstream
    state = docs.map_batches(init, batch_format="pyarrow").materialize()

    def _bkt(arr) -> pa.Array:
        return pc.bit_wise_and(
            pc.cast(arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr, pa.int64()),
            pa.scalar(63, pa.int64()),
        )

    def pad_query(b: pa.Table) -> pa.Table:
        # rows asking "what does my ptr point at" — keyed by ptr
        return pa.table(
            {
                "b": _bkt(b.column("ptr")),
                "key": b.column("ptr"),
                "u": b.column("u"),
                "ptr": b.column("ptr"),
                "hops": b.column("hops"),
                "done": b.column("done"),
                "is_self": pa.array([False] * b.num_rows, pa.bool_()),
            }
        )

    def pad_self(b: pa.Table) -> pa.Table:
        # each node's own state — keyed by u, answers the queries
        return pa.table(
            {
                "b": _bkt(b.column("u")),
                "key": b.column("u"),
                "u": b.column("u"),
                "ptr": b.column("ptr"),
                "hops": b.column("hops"),
                "done": b.column("done"),
                "is_self": pa.array([True] * b.num_rows, pa.bool_()),
            }
        )

    def jump_bucket(g: pa.Table) -> pa.Table:
        """One bucket's queries joined onto its answer rows — vectorized
        polars join per bucket instead of one Python call per node."""
        import polars as pl

        df = pl.from_arrow(g.select(["key", "u", "ptr", "hops", "done", "is_self"]))
        own = df.filter(pl.col("is_self")).select(
            pl.col("key"),
            pl.col("ptr").alias("t_ptr"),
            pl.col("hops").alias("t_hops"),
            pl.col("done").alias("t_done"),
        )
        q = df.filter(~pl.col("is_self"))
        j = q.join(own, on="key", how="inner").select(
            pl.col("u"),
            pl.when(pl.col("done")).then(pl.col("ptr")).otherwise(pl.col("t_ptr")).alias("ptr"),
            pl.when(pl.col("done"))
            .then(pl.col("hops"))
            .otherwise(pl.col("hops") + pl.col("t_hops"))
            .alias("hops"),
            (pl.col("done") | pl.col("t_done")).alias("done"),
        )
        return j.to_arrow().cast(
            pa.schema(
                [
                    ("u", pa.int64()),
                    ("ptr", pa.int64()),
                    ("hops", pa.int64()),
                    ("done", pa.bool_()),
                ]
            )
        )

    for _ in range(rounds):
        state = (
            state.map_batches(pad_query, batch_format="pyarrow")
            .union(state.map_batches(pad_self, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(jump_bucket, batch_format="pyarrow")
            .repartition(32)
            .materialize()
        )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url_id": b.column("u"),
                "terminal": b.column("ptr"),
                "hops": b.column("hops"),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow").sort("url_id")


ORACLE_SQL["redirect_resolve"] = """
    SELECT doc_id AS url_id,
           doc_id - doc_id % 7 AS terminal,
           doc_id % 7 AS hops
    FROM documents ORDER BY url_id
"""


def q_recrawl_schedule(sf_dir: str):
    """Freshness-driven recrawl prioritization (Cho & Garcia-Molina
    style): each key's capture history estimates its change rate as the
    mean inter-capture interval — computable from (min, max, count)
    alone, so the whole history never co-locates — and staleness is the
    age of the newest capture in units of that interval.  Stale-er pages
    get recrawled first.  Shape: one combiner groupby (Min/Max/Count per
    key), one scalar global-horizon aggregate (max ts), one vectorized
    finishing map — no history lists, no window shuffle."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "page_id": b.column("user_id"),
                "ts_us": pc.cast(b.column("ts"), pa.int64()),
            }
        )

    t = ds.map_batches(to_us, batch_format="pyarrow")
    agg = t.groupby("page_id").aggregate(
        Count(alias_name="n_captures"),
        Min("ts_us", alias_name="first_us"),
        Max("ts_us", alias_name="last_us"),
    )
    horizon = t.max("ts_us")  # one scalar to the driver

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_captures").to_numpy().astype(np.int64)
        first = b.column("first_us").to_numpy().astype(np.int64)
        last = b.column("last_us").to_numpy().astype(np.int64)
        span_ok = (n > 1) & (last > first)
        interval_s = np.where(span_ok, (last - first) / np.maximum(n - 1, 1) / 1e6, np.nan)
        staleness = np.where(span_ok, (horizon - last) / 1e6 / interval_s, np.nan)
        return pa.table(
            {
                "page_id": b.column("page_id"),
                "n_captures": pa.array(n, pa.int64()),
                "last_us": pa.array(last, pa.int64()),
                "interval_s": pa.array(_r(interval_s, 6), pa.float64()),
                "staleness": pa.array(_r(staleness, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("page_id")


ORACLE_SQL["recrawl_schedule"] = """
    WITH h AS (SELECT max(epoch_us(ts)) AS horizon FROM events),
    a AS (
        SELECT user_id AS page_id,
               CAST(count(*) AS BIGINT) AS n_captures,
               min(epoch_us(ts)) AS first_us,
               max(epoch_us(ts)) AS last_us
        FROM events GROUP BY user_id
    )
    SELECT page_id, n_captures, last_us,
           CASE WHEN n_captures > 1 AND last_us > first_us
                THEN round((last_us - first_us) * 1.0
                           / (n_captures - 1) / 1e6, 6)
                ELSE NULL END AS interval_s,
           CASE WHEN n_captures > 1 AND last_us > first_us
                THEN round((h.horizon - last_us) / 1e6
                           / ((last_us - first_us) * 1.0
                              / (n_captures - 1) / 1e6), 6)
                ELSE NULL END AS staleness
    FROM a CROSS JOIN h ORDER BY page_id
"""


POSTINGS_SAMPLE_K = 16


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


ORACLE_SQL["postings_build"] = r"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
    ),
    pg AS (
        SELECT term, doc_id, count(*) AS tf
        FROM w WHERE term <> '' GROUP BY term, doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS tf_total,
           array_to_string((list_sort(list(doc_id)))[1:16], '|')
               AS postings_sample
    FROM pg GROUP BY term ORDER BY term
"""


def q_hits(sf_dir: str):
    """HITS hubs & authorities over the crawl store's REAL extracted link
    graph (Kleinberg 1999) — the query-independent hub/authority prior
    next to q_pagerank's importance prior.  Same edge derivation as
    q_pagerank (canonical found-page links), 2 alternating half-steps via
    stages/graph.py hits (tagged-union message passes, L1 normalization
    as one scalar aggregate); oracle unrolls the identical arithmetic in
    SQL over the same closed-form link graph."""
    from ..stages.graph import hits

    out = hits(_link_edges(sf_dir), iters=2)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("node"),
                "hub": pa.array(_r(b.column("hub").to_numpy(zero_copy_only=False), 6), pa.float64()),
                "auth": pa.array(_r(b.column("auth").to_numpy(zero_copy_only=False), 6), pa.float64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


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


ORACLE_SQL["hits"] = _hits_oracle_sql()


def q_kcore(sf_dir: str):
    """k-core decomposition — the classic dense-subgraph peel a web
    pipeline runs over its link graph to locate densely interlinked cores
    (link farms / boilerplate nav rings as spam priors, and conversely
    well-embedded pages as quality priors).  Graph: a deterministic skewed
    fixture over doc_ids — two arithmetic edges per node (quadratic
    ``(d*d+1) % n`` hashes in-degree unevenly, affine ``(3d+7) % n`` keeps
    it connected) plus a planted clique on ``d % 50 == 0`` so the core
    numbers actually spread (2 / 3 / clique).  Edge generation is pure
    per-batch arithmetic (the clique rows are emitted from each member's
    batch — no cross-join, no driver set), dedup is one groupby, and
    coreness runs the H-index iteration in stages/graph.py: per round one
    estimate-onto-edges spread + one per-node H-index fold, all
    (int64, int64) scalar rows.  6 fixed rounds (fixture converges in 3-4;
    extra rounds are idempotent); the oracle unrolls the identical rounds
    with window-function H-indexes."""
    from ..stages.graph import coreness

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()

    def to_edges(b: pa.Table, _n=n) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        a = np.concatenate([d, d])
        bb = np.concatenate([(d * d + 1) % _n, (3 * d + 7) % _n])
        # planted clique: each member emits its edges to HIGHER members —
        # O(m^2/2) rows total, generated where the member's batch runs
        cl_a, cl_b = [], []
        for m in d[d % 50 == 0]:
            ys = np.arange(m + 50, _n, 50)
            cl_a.append(np.full(len(ys), m))
            cl_b.append(ys)
        if cl_a:
            a = np.concatenate([a] + cl_a)
            bb = np.concatenate([bb] + cl_b)
        keep = a != bb
        a, bb = a[keep], bb[keep]
        return pa.table(
            {
                "u": pa.array(np.minimum(a, bb), pa.int64()),
                "v": pa.array(np.maximum(a, bb), pa.int64()),
            }
        )

    edges = _distinct_rows(
        docs.map_batches(to_edges, batch_format="pyarrow"), ["u", "v"]
    )
    out = coreness(edges, iters=6)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b.column("node"), "core": b.column("core")}),
        batch_format="pyarrow",
    ).sort("doc_id")


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


ORACLE_SQL["kcore"] = _kcore_oracle_sql()


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


def q_warc_parse(sf_dir: str):
    """WARC source reader — the Common-Crawl interchange format as an
    ingest path next to the parquet page store: 8 deterministic .warc
    shards (one response record per document, payload = the exact
    doc_html bytes) are split by length-prefixed record framing, the
    stored HTTP response unwrapped, and (url, warc_date, status,
    content_length, title) surfaced per page.  One read task per file
    group (`read_binary_files`), framing never scans payload bytes (a
    body may legally contain "WARC/1.0"), and the title comes from the
    decoded body so the oracle checks the payload octets round-trip, not
    just the headers.  Oracle recomputes every field from `documents`."""
    import ray.data as rd

    from ..functions.warc import parse_warc_batch

    store = _warc_store_for(sf_dir)
    return (
        rd.read_binary_files(store, include_paths=True)
        .map_batches(parse_warc_batch, batch_format="pyarrow")
        .sort("url")
    )


ORACLE_SQL["warc_parse"] = f"""
    SELECT 'http://site' || (doc_id % 10) || '.example/d/' || doc_id AS url,
           strftime(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id),
                    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
           CAST(200 AS BIGINT) AS status,
           CAST(strlen({DOC_HTML_SQL}) AS BIGINT) AS content_length,
           'Doc ' || doc_id AS title
    FROM documents ORDER BY url
"""


def q_warc_roundtrip(sf_dir: str):
    """WARC write→read round-trip: documents render to (url, warc_date,
    payload) rows, a DISTRIBUTED WarcDatasink (stages/warc_sink.py — one
    atomic .warc shard per write task, the Common-Crawl layout) writes
    them, and the length-prefixed reader ingests the shards back.  The
    oracle recomputes every surfaced field from `documents`, so a single
    corrupted octet anywhere in the writer's framing breaks the
    content_length/title parity."""
    import hashlib as _hl
    import shutil

    import ray.data as rd

    from ..functions.warc import parse_warc_batch
    from ..stages.warc_sink import write_warc

    key = _hl.md5(f"{sf_dir}|warc-rt-v1".encode()).hexdigest()[:10]
    out = f"/tmp/bcs_ray_warc_rt_{key}"
    shutil.rmtree(out, ignore_errors=True)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        texts = b.column("text").to_pylist()
        dates = (
            pd.Timestamp("2026-01-01") + pd.to_timedelta(ids, unit="s")
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        return pa.table(
            {
                "url": pa.array(
                    [f"http://site{d % 10}.example/d/{d}" for d in ids.tolist()],
                    pa.string(),
                ),
                "warc_date": pa.array(list(dates), pa.string()),
                "payload": pa.array(
                    [doc_html(int(d), t).encode() for d, t in zip(ids.tolist(), texts)],
                    pa.binary(),
                ),
            }
        )

    write_warc(docs.map_batches(to_rows, batch_format="pyarrow"), out)
    return (
        rd.read_binary_files(out, include_paths=True)
        .map_batches(parse_warc_batch, batch_format="pyarrow")
        .sort("url")
    )


ORACLE_SQL["warc_roundtrip"] = ORACLE_SQL["warc_parse"]


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


ORACLE_SQL["bpe_pair_counts"] = """
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w),
    pairs AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, f
        FROM (SELECT w, f, unnest(range(1, strlen(w))) AS i FROM wf)
    )
    SELECT pair, CAST(sum(f) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 50
"""


def q_ann_lsh(sf_dir: str, n_bits: int = 4, k: int = 5):
    """LSH-bucketed ANN — the third scale path next to brute force and
    IVF: hash every vector to a sign-bit bucket (coordinate hyperplanes
    over the first ``n_bits`` dims), co-locate each bucket with ONE
    ``groupby('bucket')`` shuffle, and compute exact cosine top-k inside
    the bucket.  Queries (vec_id < 3) are corpus rows, so they arrive in
    their own bucket's group — no broadcast, no driver-side candidate
    set; per-group work is one float64 matmul over ~N/2^n_bits vectors.
    Single-probe semantics on purpose (recall = P(neighbor shares the
    bucket); multi-probe would union Hamming-1 buckets) — the oracle
    mirrors exactly that, so the pruning itself is value-pinned."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def bucketize(b: pa.Table, _nb=n_bits) -> pa.Table:
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        bits = (m[:, :_nb] >= 0.0).astype(np.int64)
        bucket = bits @ (1 << np.arange(_nb, dtype=np.int64))
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "embedding": b.column("embedding"),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def score_group(g: pa.Table, _k=k) -> pa.Table:
        ids = g.column("vec_id").to_numpy()
        qmask = ids < 3
        if not qmask.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        m = np.stack(g.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        q = m[qmask]
        q_ids = ids[qmask]
        sims = m @ q.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            col = sims[:, qi]
            cand = np.flatnonzero(ids != qid)
            order = np.lexsort((ids[cand], -col[cand]))[:_k]
            for ni in cand[order]:
                out_q.append(int(qid))
                out_n.append(int(ids[ni]))
                out_s.append(float(col[ni]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    df = (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score_group, batch_format="pyarrow")
        .to_pandas()
    )
    df = df.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    df["sim"] = _r(df["sim"].to_numpy(), 4)
    return df


ORACLE_SQL["ann_lsh"] = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
        SELECT vec_id, v,
               (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
             + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
             + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
             + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bucket
        FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 3),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, c.v) AS sim
        FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 5
    ORDER BY query_id, sim DESC, neighbor_id
"""


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
    "crawl_bfs_depths": q_crawl_bfs_depths,
    "crawl_bfs_dataset": q_crawl_bfs_dataset,
    "minhash_signatures": q_minhash_signatures,
    "minhash_dedup_pairs": q_minhash_dedup_pairs,
    "simhash": q_simhash,
    "langid": q_langid,
    "rolling_fingerprints": q_rolling_fingerprints,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "doc_fingerprint": q_doc_fingerprint,
    "jaccard_pairs": q_jaccard_pairs,
    "ann_bruteforce": q_ann_bruteforce,
    "embedding_neardup_pairs": q_embedding_neardup_pairs,
    "embedding_norms": q_embedding_norms,
    "politeness_admission": q_politeness_admission,
    "events_window": q_events_window,
    "asof_join": q_asof_join,
    "asof_join_partitioned": q_asof_join_partitioned,
    "range_join": q_range_join,
    "range_join_partitioned": q_range_join_partitioned,
    "hash_join": q_hash_join,
    "tpch_q3": q_tpch_q3,
    "bigram_topk": q_bigram_topk,
    "snapshot_delta": q_snapshot_delta,
    "minhash_incremental": q_minhash_incremental,
    "bloom_semijoin": q_bloom_semijoin,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    "triangle_count": q_triangle_count,
    "transfer_normalize": q_transfer_normalize,
    "labelcloud_parse": q_labelcloud_parse,
    "sign_pages": q_sign_pages,
    "tron_block_parse": q_tron_block_parse,
    "receipt_join": q_receipt_join,
    "token_decode": q_token_decode,
    "trace_flatten": q_trace_flatten,
    "parse_props": q_parse_props,
    "binary_meta": q_binary_meta,
    "embedding_knn": q_embedding_knn,
    "salted_host_agg": q_salted_host_agg,
    "enrich_3way": q_enrich_3way,
    "keywords_freq": q_keywords_freq,
    "xml_labels": q_xml_labels,
    "block_parse": q_block_parse,
    "utxo_edges": q_utxo_edges,
    "wedge_count": q_wedge_count,
    "sessionize": q_sessionize,
    "robots_filter": q_robots_filter,
    "ann_ivf_exact": q_ann_ivf_exact,
    "dedup_clusters": q_dedup_clusters,
    "pagerank": q_pagerank,
    "token_quantiles": q_token_quantiles,
    "hash_sample": q_hash_sample,
    "bm25_scores": q_bm25_scores,
    "simhash_pairs": q_simhash_pairs,
    "pii_redact": q_pii_redact,
    "gopher_quality": q_gopher_quality,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "dup_span_fraction": q_dup_span_fraction,
    "dedup_spans_remove": q_dedup_spans_remove,
    "sitemap_parse": q_sitemap_parse,
    "redirect_resolve": q_redirect_resolve,
    "recrawl_schedule": q_recrawl_schedule,
    "postings_build": q_postings_build,
    "hits": q_hits,
    "kcore": q_kcore,
    "warc_parse": q_warc_parse,
    "warc_roundtrip": q_warc_roundtrip,
    "bpe_pair_counts": q_bpe_pair_counts,
    "ann_lsh": q_ann_lsh,
    "vocab_topk": q_vocab_topk,
    "tfidf_topterms": q_tfidf_topterms,
    "shuffle_rank": q_shuffle_rank,
    "unigram_logprob": q_unigram_logprob,
    "curation_pipeline": q_curation_pipeline,
    "self_repetition": q_self_repetition,
    "split_assign": q_split_assign,
    "browser_render": q_browser_render,
    "dedup_survivors": q_dedup_survivors,
    "dsir_weights": q_dsir_weights,
    "dsir_resample": q_dsir_resample,
    "audio_decode": q_audio_decode,
    "anchor_agg": q_anchor_agg,
    "pretrain_mix": q_pretrain_mix,
}


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


NOSQL_QUERIES = {
    "hll_distinct": q_hll_distinct,  # sketch estimate — pinned in tests/test_sketch.py
    "cms_token_counts": q_cms_token_counts,  # overestimate-only — tests/test_sketch.py
    "keywords_summary": q_keywords_summary,  # TextRank — pinned in pytest
    "validated_entities": q_validated_entities,  # keccak/base58check — pinned in pytest
    "motif_vector": q_motif_vector,  # MoTS 16-dim — pinned in tests/test_motifs.py
    "solana_block_parse": q_solana_block_parse,  # 8-type fan-out — tests/test_solana.py
    "solana_tx_lookup": q_solana_tx_lookup,  # tx-by-signature subset — tests/test_solana.py
    "dcfg_parse": q_dcfg_parse,  # tracer JSON shaping — tests/test_dcfg.py
    "ann_ivf": q_ann_ivf,
    "ann_pq": q_ann_pq,  # PQ/ADC approximation — recall pinned in tests/test_similarity.py
    "bpe_train": q_bpe_train,  # merge loop — pinned vs pure-Python BPE in tests/test_bpe.py
    "bpe_encode": q_bpe_encode,  # rank-ordered apply — pinned in tests/test_bpe.py
    "crawl_bfs": q_crawl_bfs,
    "crawl_haircut": q_crawl_haircut,
    "crawl_appr": q_crawl_appr,
    "crawl_ttr_weight": q_crawl_ttr_weight,
    "crawl_poison": q_crawl_poison,
    "crawl_ttr_time": q_crawl_ttr_time,
    "crawl_ttr_redirect": q_crawl_ttr_redirect,
    "crawl_haircut_sharded": q_crawl_haircut_sharded,
    "crawl_appr_sharded": q_crawl_appr_sharded,
    "crawl_ttr_time_sharded": q_crawl_ttr_time_sharded,
    "image_decode": q_image_decode,
    "frame_sample": q_frame_sample,
    "image_resize": q_image_resize,
}


# ---------------------------------------------------------------------------
# round-3 additions: corpus-mix / recency / semantic-dedup primitives
# ---------------------------------------------------------------------------

def q_host_cap(sf_dir: str, cap: int = 20):
    """Per-host page-quota cap (the Common-Crawl "max N pages per host"
    corpus-balance rule; the distributed analogue of the reference's
    per-domain scope limits, settings.py DOWNLOAD-scope knobs): keep the
    ``cap`` docs per source with the smallest (md5_low64(doc_id), doc_id)
    key — deterministic, seedless, partitioning-independent.  Combiner
    shape: every batch first reduces to <= cap rows per source it contains,
    so the ``groupby('source')`` shuffle moves O(cap * sources) rows, never
    the corpus; the per-group finalize repeats the identical top-k rule."""
    from ..stages.dedup import _stable_h64

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def _cap_tbl(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": t.column("doc_id").to_numpy(),
                "source": t.column("source").to_pylist(),
            }
        )
        df["h"] = [_stable_h64(str(i)) for i in df["doc_id"]]
        kept = (
            df.sort_values(["source", "h", "doc_id"]).groupby("source").head(cap)
        )
        return pa.table(
            {
                "doc_id": pa.array(kept["doc_id"].to_numpy(), pa.int64()),
                "source": pa.array(kept["source"].tolist(), pa.string()),
            }
        )

    return (
        docs.map_batches(_cap_tbl, batch_format="pyarrow")  # partial per batch
        .groupby("source")
        .map_groups(_cap_tbl, batch_format="pyarrow")  # exact per host
        .sort(["source", "doc_id"])
    )


_STRATA_RATES = {"en": 60, "de": 40, "fr": 40, "es": 40, "zh": 20}


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


def q_semdedup(sf_dir: str, tau: float = 0.4, n_bits: int = 4):
    """SemDeDup-style semantic pruning over the embedding column: vectors
    land in sign-bit LSH buckets (coordinate hyperplanes, same geometry as
    ``ann_lsh``), and inside each bucket a vector is DROPPED iff some
    lower-vec_id bucketmate has cosine >= tau to it.  Deterministic
    drop-against-all-earlier rule (not greedy keep-set chaining) on purpose:
    it is order-free, partitioning-independent and SQL-expressible, while
    preserving the SemDeDup shape — cluster cheaply, prune pairwise only
    within clusters, O(sum b_i^2) instead of O(N^2).  One groupby shuffle;
    per-bucket work is a single float64 matmul.  Scale contract: n_bits
    must grow with the corpus so E[bucket] stays matmul-sized
    (n_bits ~ log2(N / 1e4) keeps buckets ~10^4 at any N); a degenerate
    bucket (mass-duplicated embeddings) needs the same segment-cap
    treatment as the LSH pair emitter in stages/dedup.py."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def bucketize(b: pa.Table, _nb=n_bits) -> pa.Table:
        m = np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        bits = (m[:, :_nb] >= 0.0).astype(np.int64)
        bucket = bits @ (1 << np.arange(_nb, dtype=np.int64))
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "embedding": b.column("embedding"),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def prune(g: pa.Table, _tau=tau) -> pa.Table:
        ids = g.column("vec_id").to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(g.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )[order]
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        dropped = np.any(np.tril(sims >= _tau, k=-1), axis=1)
        keep = ~dropped
        bucket = g.column("bucket").to_numpy()[order][keep]
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    return (
        emb.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(prune, batch_format="pyarrow")
        .sort("vec_id")
    )


SQL_QUERIES["host_cap"] = q_host_cap
SQL_QUERIES["stratified_sample"] = q_stratified_sample
SQL_QUERIES["latest_event"] = q_latest_event
SQL_QUERIES["semdedup"] = q_semdedup

ORACLE_SQL["host_cap"] = """
    SELECT source, doc_id FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20
    ORDER BY source, doc_id
"""

ORACLE_SQL["stratified_sample"] = """
    SELECT doc_id, lang FROM documents
    WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 <
          CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 40 WHEN 'fr' THEN 40
                    WHEN 'es' THEN 40 WHEN 'zh' THEN 20 ELSE 10 END
    ORDER BY doc_id
"""

ORACLE_SQL["latest_event"] = """
    SELECT user_id, epoch_us(ts) AS ts_us, event_type,
           round(CAST(value AS DOUBLE), 2) AS value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
"""

ORACLE_SQL["semdedup"] = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (
        SELECT vec_id, v,
               (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
             + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
             + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
             + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bucket
        FROM e
    )
    SELECT x.vec_id, x.bucket FROM b x
    WHERE NOT EXISTS (
        SELECT 1 FROM b y
        WHERE y.bucket = x.bucket AND y.vec_id < x.vec_id
          AND list_cosine_similarity(y.v, x.v) >= 0.4
    )
    ORDER BY x.vec_id
"""


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


SQL_QUERIES["token_entropy"] = q_token_entropy

ORACLE_SQL["token_entropy"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents
    ),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id,
           round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)), 4) AS entropy
    FROM cnt JOIN tot USING (doc_id)
    GROUP BY cnt.doc_id
    ORDER BY cnt.doc_id
"""


# ---------------------------------------------------------------------------
# C4-style line-level cleaning + corpus-wide boilerplate removal
# ---------------------------------------------------------------------------
# The synthetic corpus is one line of words per doc, so (exactly like
# q_pii_redact's contact line) both sides synthesize the SAME deterministic
# line structure from doc_id: the doc text terminated with '.', plus the
# noise lines C4's line filters exist to kill (a javascript notice, a bare
# nav word, a copyright footer, a code fragment, and for every third doc a
# punctuation-less legal line).

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


SQL_QUERIES["c4_filter"] = q_c4_filter

ORACLE_SQL["c4_filter"] = (
    "WITH " + _C4_LINES_SQL.format() + r""",
    judged AS (
        SELECT doc_id, line, ord,
               len(regexp_extract_all(line, '\S+')) AS wc,
               (len(regexp_extract_all(line, '\S+')) >= 5
                AND regexp_matches(line, '[.!?"]$')
                AND NOT contains(line, 'javascript')
                AND NOT contains(line, '{')
                AND NOT contains(line, 'lorem ipsum')) AS kept
        FROM lines
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                                  AS n_lines,
           CAST(coalesce(count(*) FILTER (kept), 0) AS BIGINT)       AS n_kept,
           CAST(coalesce(sum(wc) FILTER (kept), 0) AS BIGINT)        AS kept_words,
           coalesce(string_agg(line, chr(10) ORDER BY ord) FILTER (kept), '')
                                                                     AS clean,
           CAST(count(*) FILTER (kept) >= 2 AS BIGINT)               AS keep
    FROM judged GROUP BY doc_id ORDER BY doc_id
"""
)


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


SQL_QUERIES["boilerplate_lines"] = q_boilerplate_lines

ORACLE_SQL["boilerplate_lines"] = (
    "WITH " + _C4_LINES_SQL.format() + """,
    freq AS (SELECT line, count(*) AS n FROM lines GROUP BY line)
    SELECT lines.doc_id,
           CAST(coalesce(count(*) FILTER (n >= 10), 0) AS BIGINT) AS n_boiler,
           coalesce(string_agg(line, chr(10) ORDER BY ord) FILTER (n < 10), '')
                                                                  AS clean
    FROM lines JOIN freq USING (line)
    GROUP BY lines.doc_id ORDER BY lines.doc_id
"""
)


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


SQL_QUERIES["text_normalize"] = q_text_normalize

ORACLE_SQL["text_normalize"] = r"""
    WITH base AS (
        SELECT doc_id,
               text || ' cafe' || chr(769) || ' ' || (doc_id % 7) || chr(9)
                    || 'nai' || chr(776) || 've  no' || chr(768) || ' ' AS s
        FROM documents
    )
    SELECT doc_id,
           lower(trim(regexp_replace(nfc_normalize(s), '[ \t\n\r\f]+', ' ', 'g')))
                                        AS clean,
           CAST(length(s) AS BIGINT)    AS n_raw,
           CAST(length(lower(trim(regexp_replace(nfc_normalize(s),
                '[ \t\n\r\f]+', ' ', 'g')))) AS BIGINT) AS n_clean
    FROM base ORDER BY doc_id
"""


def q_url_features(sf_dir: str):
    """URL structural features for crawl prioritization (path depth, query
    param count, fragment flag, length, host) — the priors frontier
    schedulers rank by (short shallow URLs first).  The Ray side PARSES a
    deterministically synthesized per-doc URL with urllib.parse (the same
    splitter functions/urls.py canonicalization uses); the SQL mirror
    derives each feature from the doc_id formula, so the check is parse
    vs construction, not string-op vs string-op."""
    from urllib.parse import parse_qsl, urlsplit

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def feats(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        hosts, depths, npar, frag, ulen = [], [], [], [], []
        for d in ids:
            url = (
                f"http://site{d % 10}.example"
                + "".join(f"/s{j}" for j in range(d % 4))
                + f"/page{d}"
                + ("?b=2&a=1" if d % 3 == 0 else "")
                + ("#frag" if d % 5 == 0 else "")
            )
            sp = urlsplit(url)
            hosts.append(sp.hostname or "")
            depths.append(len([p for p in sp.path.split("/") if p]))
            npar.append(len(parse_qsl(sp.query)))
            frag.append(int(bool(sp.fragment)))
            ulen.append(len(url))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "host": pa.array(hosts, pa.string()),
                "path_depth": pa.array(depths, pa.int64()),
                "n_params": pa.array(npar, pa.int64()),
                "has_fragment": pa.array(frag, pa.int64()),
                "url_len": pa.array(ulen, pa.int64()),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow").sort("doc_id")


SQL_QUERIES["url_features"] = q_url_features

ORACLE_SQL["url_features"] = """
    WITH u AS (
        SELECT doc_id,
               'http://site' || (doc_id % 10) || '.example'
                 || CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/s0'
                        WHEN 2 THEN '/s0/s1' ELSE '/s0/s1/s2' END
                 || '/page' || doc_id
                 || CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
        FROM documents
    )
    SELECT doc_id,
           'site' || (doc_id % 10) || '.example'             AS host,
           CAST((doc_id % 4) + 1 AS BIGINT)                  AS path_depth,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 0 END AS BIGINT)
                                                             AS n_params,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
                                                             AS has_fragment,
           CAST(length(url) AS BIGINT)                       AS url_len
    FROM u ORDER BY doc_id
"""


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


NOSQL_QUERIES["zlib_ratio"] = q_zlib_ratio


def q_host_topk(sf_dir: str, k: int = 3):
    """Grouped top-k with in-group rank — the ROW_NUMBER() OVER (PARTITION
    BY source ORDER BY n_chars DESC, doc_id) window shape Ray Data has no
    native operator for.  Combiner pattern: every batch first reduces to
    <= k rows per source it contains (argsort on the composite order), so
    the groupby shuffle moves O(k * sources) rows; the per-group finalize
    re-applies the identical rule and emits rank 1..k.  Deterministic under
    any partitioning because the order (n_chars DESC, doc_id ASC) is a
    total order."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def _top(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["source", "n_chars", "doc_id"], ascending=[True, False, True])
            .groupby("source", sort=False)
            .head(k)
        )

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_top(t.to_pandas()), preserve_index=False)

    def finalize(t: pa.Table) -> pa.Table:
        df = _top(t.to_pandas()).reset_index(drop=True)
        df["rk"] = df.groupby("source").cumcount() + 1
        return pa.table(
            {
                "source": pa.array(df["source"].tolist(), pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
                "rk": pa.array(df["rk"].to_numpy(), pa.int64()),
            }
        )

    return (
        docs.map_batches(combine, batch_format="pyarrow")
        .groupby("source")
        .map_groups(finalize, batch_format="pyarrow")
        .sort(["source", "rk"])
    )


SQL_QUERIES["host_topk"] = q_host_topk

ORACLE_SQL["host_topk"] = """
    SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ) WHERE rk <= 3 ORDER BY source, rk
"""


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


SQL_QUERIES["mix_proportions"] = q_mix_proportions

ORACLE_SQL["mix_proportions"] = """
    WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    wts AS (
        SELECT source, n,
               CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
                    THEN 3.0 ELSE 1.0 END AS w
        FROM cnt
    ),
    norm AS (SELECT source, n, w / (SELECT sum(w) FROM wts) AS frac FROM wts),
    feas AS (SELECT min(n / frac) AS cap FROM norm),
    rates AS (
        SELECT source, least(1.0, frac * (SELECT cap FROM feas) / n) AS rate
        FROM norm
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE (md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 10000) / 10000.0 < r.rate
    ORDER BY d.doc_id
"""


def q_sssp(sf_dir: str, hops: int = 4):
    """Bounded-hop weighted single-source shortest paths (Bellman-Ford,
    ``hops`` relaxation rounds) over the events-derived edge graph from
    node 0 — the weighted generalization of bfs_reachable, and the
    iterative-relaxation shape (frontier broadcast -> edge map -> min
    groupby per round) that delta-stepping engines distribute.  Parallel
    edges are min-reduced first (min is monotone under the later +d, so
    results are float-identical to relaxing every edge).  The vertex set
    here is dimension-sized (50 nodes), so the per-round distance table is
    broadcast via ray.put; on a 10^10-node graph the broadcast becomes a
    per-round stages.joins.hash_join of (node, dist) against edges — same
    rounds, one extra shuffle each.  Path sums accumulate left-associated
    on both sides, so doubles (and therefore mins) match bit-exactly."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def to_edges(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        e = b.column("event_id").to_numpy()
        return pa.table(
            {
                "src": pa.array(u % 50, pa.int64()),
                "dst": pa.array((u * 13 + e) % 50, pa.int64()),
                "weight": b.column("value"),
            }
        )

    edges = (
        ds.map_batches(to_edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Min("weight", alias_name="w"))
        .materialize()
    )

    dist: dict = {0: 0.0}
    for _ in range(hops):
        dist_ref = ray.put(dict(dist))

        def relax(b: pa.Table, _ref=dist_ref) -> pa.Table:
            d = ray.get(_ref)
            best: dict = {}
            for s, t, w in zip(
                b.column("src").to_pylist(),
                b.column("dst").to_pylist(),
                b.column("w").to_pylist(),
            ):
                ds_ = d.get(s)
                if ds_ is None:
                    continue
                cand = ds_ + w
                if t not in best or cand < best[t]:
                    best[t] = cand
            return pa.table(
                {
                    "node": pa.array(list(best.keys()), pa.int64()),
                    "d": pa.array(list(best.values()), pa.float64()),
                }
            )

        cand = (
            edges.map_batches(relax, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("d", alias_name="d"))
            .to_pandas()
        )
        for v, dv in zip(cand["node"], cand["d"]):
            if v not in dist or dv < dist[v]:
                dist[int(v)] = float(dv)

    out = pd.DataFrame(
        {"node": sorted(dist), "dist": [_r(dist[v], 4) for v in sorted(dist)]}
    )
    out["node"] = out["node"].astype("int64")
    return out


SQL_QUERIES["sssp"] = q_sssp


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


ORACLE_SQL["sssp"] = (
    f"WITH e AS ({EDGES_SQL}),\n"
    "    e2 AS (SELECT src, dst, min(weight) AS w FROM e GROUP BY src, dst),\n"
    "    d0(node, d) AS (SELECT 0, CAST(0 AS DOUBLE)),"
    + ",".join(_sssp_round_sql(f"d{i}", f"d{i+1}") for i in range(4))
    + "\n    SELECT node, round(d, 4) AS dist FROM d4 ORDER BY node"
)


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


SQL_QUERIES["hist_quantiles"] = q_hist_quantiles

ORACLE_SQL["hist_quantiles"] = """
    WITH s AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx,
                      count(*) AS n FROM documents),
    b AS (
        SELECT least(CAST(floor((n_chars - s.mn) / ((s.mx - s.mn) / 32.0))
                     AS BIGINT), 31) AS bin
        FROM documents, s
    ),
    c AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
    cum AS (SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum,
                   sum(c) OVER (ORDER BY bin) - c AS cum_prev
            FROM c),
    q(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)),
    pick AS (
        SELECT q.q, min(cum.bin) AS bin
        FROM q JOIN cum ON cum.cum >= q.q * (SELECT n FROM s)
        GROUP BY q.q
    )
    SELECT pick.q AS q,
           round(s.mn + ((s.mx - s.mn) / 32.0)
                 * (pick.bin + (pick.q * s.n - cum.cum_prev) / cum.c), 4) AS est
    FROM pick JOIN cum USING (bin), s
    ORDER BY q
"""


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


SQL_QUERIES["running_total"] = q_running_total

ORACLE_SQL["running_total"] = """
    SELECT event_id,
           round(sum(CAST(round(value * 100) AS BIGINT))
                     OVER (ORDER BY ts, event_id) / 100.0, 2) AS running
    FROM events ORDER BY event_id
"""


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


SQL_QUERIES["span_merge"] = q_span_merge

ORACLE_SQL["span_merge"] = """
    WITH spans AS (
        SELECT doc_id,
               (doc_id * 7 + j * 37) % 120 AS s,
               (doc_id * 7 + j * 37) % 120 + 15 + (j * 11) % 20 AS e
        FROM documents, unnest(generate_series(0, 2 + doc_id % 3)) AS t(j)
    ),
    marked AS (
        SELECT doc_id, s, e,
               CASE WHEN s <= max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS new_island
        FROM spans
    ),
    islands AS (
        SELECT doc_id, s, e,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
        FROM marked
    ),
    merged AS (
        SELECT doc_id, isl, min(s) AS ms, max(e) AS me
        FROM islands GROUP BY doc_id, isl
    )
    SELECT doc_id,
           CAST(3 + doc_id % 3 AS BIGINT)   AS n_spans,
           CAST(count(*) AS BIGINT)         AS n_merged,
           CAST(sum(me - ms) AS BIGINT)     AS covered
    FROM merged GROUP BY doc_id ORDER BY doc_id
"""


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


SQL_QUERIES["funnel_steps"] = q_funnel_steps

ORACLE_SQL["funnel_steps"] = """
    WITH f AS (
        SELECT user_id, event_type, ts FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    u AS (SELECT DISTINCT user_id FROM f),
    v AS (SELECT user_id, min(ts) AS t1 FROM f WHERE event_type = 'view'
          GROUP BY user_id),
    c AS (SELECT f.user_id, min(f.ts) AS t2 FROM f JOIN v USING (user_id)
          WHERE f.event_type = 'click' AND f.ts > v.t1 GROUP BY f.user_id),
    p AS (SELECT f.user_id, min(f.ts) AS t3 FROM f JOIN c USING (user_id)
          WHERE f.event_type = 'purchase' AND f.ts > c.t2 GROUP BY f.user_id)
    SELECT u.user_id,
           CAST((v.t1 IS NOT NULL)::INT + (c.t2 IS NOT NULL)::INT
                + (p.t3 IS NOT NULL)::INT AS BIGINT)     AS steps,
           coalesce(epoch_us(v.t1), -1)                  AS t_view_us,
           coalesce(epoch_us(c.t2), -1)                  AS t_click_us,
           coalesce(epoch_us(p.t3), -1)                  AS t_purchase_us
    FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
           LEFT JOIN p USING (user_id)
    ORDER BY u.user_id
"""


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


SQL_QUERIES["bigram_logprob"] = q_bigram_logprob

ORACLE_SQL["bigram_logprob"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    cnt AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    v AS (SELECT count(DISTINCT token) AS v FROM w),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || chr(1) || t[i+1])) AS big,
               unnest(list_transform(range(1, len(t)), i -> t[i])) AS prev
        FROM toks WHERE len(t) >= 2
    ),
    bcnt AS (SELECT big, count(*) AS cb FROM bg GROUP BY big),
    scored AS (
        SELECT bg.doc_id,
               sum(ln((bcnt.cb + 1.0) / (cnt.c + v.v))) / count(*) AS lp
        FROM bg JOIN bcnt USING (big) JOIN cnt ON cnt.token = bg.prev
             CROSS JOIN v
        GROUP BY bg.doc_id
    )
    SELECT d.doc_id, round(coalesce(s.lp, 0.0), 6) AS logprob
    FROM documents d LEFT JOIN scored s USING (doc_id) ORDER BY d.doc_id
"""


def q_url_templates(sf_dir: str, trap_threshold: int = 12):
    """URL-template mining for crawler-trap / infinite-space detection:
    collapse every digit run in the path to '{n}', count urls per (host,
    template), and flag templates whose population explodes (calendar
    pages, session-id echoes, faceted search).  Uses the same synthesized
    per-doc URL as q_url_features.  Combiner shape: per-batch partial
    (host, template) counts, one tiny groupby — the corpus never
    re-shuffles; the RE2 digit collapse runs as a pyarrow kernel over the
    whole column."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def tmpl(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        hosts, paths = [], []
        for d in ids:
            hosts.append(f"site{d % 10}.example")
            paths.append(
                "".join(f"/s{j}" for j in range(d % 4)) + f"/page{d}"
                + ("?b=2&a=1" if d % 3 == 0 else "")
            )
        t = pc.replace_substring_regex(pa.array(paths, pa.string()), r"[0-9]+", "{n}")
        import collections

        c = collections.Counter(zip(hosts, t.to_pylist()))
        return pa.table(
            {
                "host": pa.array([k[0] for k in c], pa.string()),
                "template": pa.array([k[1] for k in c], pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    agg = (
        docs.map_batches(tmpl, batch_format="pyarrow")
        .groupby(["host", "template"])
        .aggregate(Sum("c", alias_name="n_urls"))
    )

    def flag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "trap",
            pc.cast(pc.greater_equal(b.column("n_urls"), trap_threshold), pa.int64()),
        )

    return agg.map_batches(flag, batch_format="pyarrow").sort(["host", "template"])


SQL_QUERIES["url_templates"] = q_url_templates

ORACLE_SQL["url_templates"] = """
    WITH u AS (
        SELECT doc_id,
               'site' || (doc_id % 10) || '.example' AS host,
               regexp_replace(
                   CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN '/s0'
                        WHEN 2 THEN '/s0/s1' ELSE '/s0/s1/s2' END
                   || '/page' || doc_id
                   || CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' ELSE '' END,
                   '[0-9]+', '{n}', 'g') AS template
        FROM documents
    )
    SELECT host, template, count(*) AS n_urls,
           CAST(count(*) >= 12 AS BIGINT) AS trap
    FROM u GROUP BY host, template ORDER BY host, template
"""


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


SQL_QUERIES["heavy_hitters"] = q_heavy_hitters

ORACLE_SQL["heavy_hitters"] = r"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    tc AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT sum(cnt) AS n FROM tc)
    SELECT token, cnt FROM tc, tot
    WHERE cnt >= ceil(0.02 * tot.n)
    ORDER BY cnt DESC, token
"""


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


SQL_QUERIES["nb_classify"] = q_nb_classify

ORACLE_SQL["nb_classify"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    tc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w),
    langs AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    cls_tok AS (
        SELECT d.lang, t.w, sum(t.c) AS cnt
        FROM tc t JOIN documents d USING (doc_id) GROUP BY d.lang, t.w
    ),
    cls_tot AS (SELECT lang, sum(cnt) AS tot FROM cls_tok GROUP BY lang),
    vocab AS (SELECT count(DISTINCT w) AS v FROM toks),
    scores AS (
        SELECT t.doc_id, l.lang,
               ln(l.n_docs * 1.0 / (SELECT sum(n_docs) FROM langs))
               + sum(t.c * ln((coalesce(ct.cnt, 0) + 1.0) / (ctot.tot + v.v))) AS s
        FROM tc t
        CROSS JOIN langs l
        JOIN cls_tot ctot ON ctot.lang = l.lang
        CROSS JOIN vocab v
        LEFT JOIN cls_tok ct ON ct.lang = l.lang AND ct.w = t.w
        GROUP BY t.doc_id, l.lang, l.n_docs, ctot.tot, v.v
    )
    SELECT doc_id, lang AS pred_lang, round(s, 4) AS score
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang) AS rn
          FROM scores)
    WHERE rn = 1 ORDER BY doc_id
"""


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


SQL_QUERIES["event_interarrival"] = q_event_interarrival

ORACLE_SQL["event_interarrival"] = """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    )
    SELECT user_id, count(*) AS n_events,
           max(gap) AS max_gap_us, round(avg(gap), 2) AS mean_gap_us
    FROM g GROUP BY user_id ORDER BY user_id
"""


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


SQL_QUERIES["link_reciprocity"] = q_link_reciprocity

ORACLE_SQL["link_reciprocity"] = f"""
    WITH e AS (SELECT DISTINCT src, dst FROM ({EDGES_SQL})),
    r AS (
        SELECT e.src, CASE WHEN ex.src IS NOT NULL THEN 1 ELSE 0 END AS recip
        FROM e LEFT JOIN e ex ON ex.src = e.dst AND ex.dst = e.src
    )
    SELECT src AS node, count(*) AS n_out, sum(recip) AS n_recip,
           round(sum(recip) * 1.0 / count(*), 6) AS reciprocity
    FROM r GROUP BY src ORDER BY node
"""


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


SQL_QUERIES["badwords_filter"] = q_badwords_filter

ORACLE_SQL["badwords_filter"] = """
    WITH pats AS (
        SELECT * FROM (VALUES ('slow join'), ('error'), ('dup'),
                              ('spark window'), ('big hash'), ('customer line'),
                              ('stream stream'), ('query row')) AS t(pat)
    ),
    hits AS (
        SELECT d.doc_id, p.pat
        FROM documents d JOIN pats p ON position(p.pat IN d.text) > 0
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_matched, min(pat) AS first_pat
        FROM hits GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_matched, 0) AS n_matched,
           a.first_pat,
           CAST(a.n_matched IS NOT NULL AS BIGINT) AS flagged
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
"""


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


SQL_QUERIES["length_zscore"] = q_length_zscore

ORACLE_SQL["length_zscore"] = """
    SELECT doc_id, lang,
           round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                 / stddev_samp(n_chars) OVER (PARTITION BY lang), 4) AS z
    FROM documents ORDER BY doc_id
"""


def q_host_gini(sf_dir: str):
    """Host-concentration Gini coefficient — the frontier-skew diagnostic
    a crawl scheduler watches (a Gini near 1 means one host dominates the
    queue and politeness will serialize the crawl), measured over per-host
    total BYTES (url counts are uniform-by-construction in this corpus, so
    bytes is the non-degenerate load measure).  The corpus reduces to
    per-host sums (tiny) via one combiner groupby; the Gini closed form
    over the sorted loads runs on the dim-sized result."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def host_rows(b: pa.Table) -> pa.Table:
        hosts = b.column("doc_id").to_numpy() % 10
        nc = b.column("n_chars").to_numpy()
        agg = np.zeros(10, np.int64)
        np.add.at(agg, hosts, nc)
        present = np.nonzero(agg)[0]
        return pa.table(
            {
                "host": pa.array([f"site{h}.example" for h in present], pa.string()),
                "c": pa.array(agg[present], pa.int64()),
            }
        )

    counts = (
        docs.map_batches(host_rows, batch_format="pyarrow").groupby("host").sum("c")
    ).to_pandas()
    c = np.sort(counts.iloc[:, 1].to_numpy().astype(np.float64))
    n, s = len(c), c.sum()
    gini = (2.0 * np.dot(np.arange(1, n + 1), c)) / (n * s) - (n + 1.0) / n
    return pd.DataFrame(
        {"n_hosts": [int(n)], "total_bytes": [int(s)], "gini": [float(_r(gini, 6))]}
    )


SQL_QUERIES["host_gini"] = q_host_gini

ORACLE_SQL["host_gini"] = """
    WITH hc AS (
        SELECT doc_id % 10 AS host, sum(n_chars) AS c FROM documents GROUP BY host
    ),
    ranked AS (SELECT c, row_number() OVER (ORDER BY c, host) AS i FROM hc)
    SELECT count(*) AS n_hosts, sum(c) AS total_bytes,
           round(2.0 * sum(i * c) / (count(*) * sum(c))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
"""


def _emb_matrix(b: pa.Table, col: str = "embedding") -> np.ndarray:
    """Zero-copy-ish fixed-width list -> (n, 64) float64 matrix."""
    lst = b.column(col).combine_chunks()
    flat = pc.list_flatten(lst).to_numpy(zero_copy_only=False)
    return flat.reshape(b.num_rows, -1).astype(np.float64)


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


SQL_QUERIES["pca_power"] = q_pca_power

ORACLE_SQL["pca_power"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    dims AS (SELECT unnest(range(1, 65)) AS j),
    d1 AS (SELECT vec_id, sum(x[CAST(j AS INT)] * 0.125) AS d FROM e, dims GROUP BY vec_id),
    w1 AS (SELECT j, sum(d * x[CAST(j AS INT)]) AS w
           FROM e JOIN d1 USING (vec_id), dims GROUP BY j),
    n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
    v1 AS (SELECT j, w / nrm AS v FROM w1, n1),
    d2 AS (SELECT vec_id, sum(x[CAST(v1.j AS INT)] * v1.v) AS d FROM e, v1 GROUP BY vec_id),
    w2 AS (SELECT j, sum(d * x[CAST(j AS INT)]) AS w
           FROM e JOIN d2 USING (vec_id), dims GROUP BY j),
    n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
    v2 AS (SELECT j, w / nrm AS v FROM w2, n2),
    d3 AS (SELECT vec_id, sum(x[CAST(v2.j AS INT)] * v2.v) AS d FROM e, v2 GROUP BY vec_id),
    w3 AS (SELECT j, sum(d * x[CAST(j AS INT)]) AS w
           FROM e JOIN d3 USING (vec_id), dims GROUP BY j),
    n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3)
    SELECT j, round(w / nrm, 6) AS v, round(nrm, 4) AS lam
    FROM w3, n3 ORDER BY j
"""


def q_kmeans_assign(sf_dir: str, k: int = 8):
    """Nearest-centroid assignment (the k-means / IVF routing step as a
    standalone oracle-checked op): centroids are the embeddings of
    vec_id 0..k-1, broadcast once; each batch computes a vectorized
    (n, k) distance matrix and argmins with centroid-id tie-break.  The
    corpus streams once; only the k x 64 centroid block moves."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent_rows = sorted(
        emb.filter(lambda r: r["vec_id"] < k).take_all(), key=lambda r: r["vec_id"]
    )
    C = np.array([r["embedding"] for r in cent_rows], np.float64)
    c_ref = ray.put(C)

    def assign(b: pa.Table) -> pa.Table:
        C_ = ray.get(c_ref)
        X = _emb_matrix(b)
        # (n, k) euclidean distances; argmin takes the FIRST min = smallest
        # centroid id (matches ORDER BY d, cid in the oracle)
        d = np.sqrt(((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2))
        j = d.argmin(axis=1)
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "cluster": pa.array(j.astype(np.int64), pa.int64()),
                "d": pa.array(_r(d[np.arange(len(j)), j], 4), pa.float64()),
            }
        )

    return emb.map_batches(assign, batch_format="pyarrow").sort("vec_id")


SQL_QUERIES["kmeans_assign"] = q_kmeans_assign

ORACLE_SQL["kmeans_assign"] = """
    WITH c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx FROM embeddings WHERE vec_id < 8
    ),
    d AS (
        SELECT e.vec_id, c.cid,
               list_distance(e.embedding::DOUBLE[], c.cx) AS d,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.embedding::DOUBLE[], c.cx), c.cid) AS rn
        FROM embeddings e CROSS JOIN c
    )
    SELECT vec_id, cid AS cluster, round(d, 4) AS d
    FROM d WHERE rn = 1 ORDER BY vec_id
"""


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


SQL_QUERIES["winsorize"] = q_winsorize

ORACLE_SQL["winsorize"] = """
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS total
        FROM events
    ),
    thr AS (
        SELECT event_type,
               max(CASE WHEN rn = CAST(ceil(0.05 * total) AS BIGINT) THEN value END) AS p05,
               max(CASE WHEN rn = CAST(ceil(0.95 * total) AS BIGINT) THEN value END) AS p95
        FROM r GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n, t.p05, t.p95,
           sum(CASE WHEN e.value < t.p05 THEN 1 ELSE 0 END) AS n_clipped_lo,
           sum(CASE WHEN e.value > t.p95 THEN 1 ELSE 0 END) AS n_clipped_hi,
           round(avg(greatest(t.p05, least(t.p95, e.value))), 4) AS clipped_mean
    FROM events e JOIN thr t USING (event_type)
    GROUP BY e.event_type, t.p05, t.p95 ORDER BY e.event_type
"""


def q_lpa_communities(sf_dir: str, iters: int = 3):
    """Frequency-based label propagation communities (synchronous LPA,
    ties to the smallest label) over the undirected events-derived graph
    — the community-detection complement of min-label connected
    components (q_dedup_clusters).  Each of the 3 synchronous rounds is
    a hash_join (labels onto edge sources) + a (node, label) vote count
    + a per-node argmax; only (int64, int64) rows ever shuffle, the
    label table is a Dataset (NOT broadcast — at web scale it is
    node-sized), and iteration count is fixed so the oracle unrolls."""
    from ..stages.joins import hash_join

    e0 = _events_edges(sf_dir).map_batches(
        lambda b: pa.table(
            {"src": b.column("src"), "dst": b.column("dst")}
        ).filter(pc.not_equal(b.column("src"), b.column("dst"))),
        batch_format="pyarrow",
    )

    def both_dirs(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([s, d]), pa.int64()),
                "nbr": pa.array(np.concatenate([d, s]), pa.int64()),
            }
        )

    # distinct undirected adjacency, materialized once (re-used per round)
    edges = _distinct_rows(
        e0.map_batches(both_dirs, batch_format="pyarrow"), ["node", "nbr"]
    ).materialize()
    labels = (
        edges.select_columns(["node"])
        .groupby("node")
        .count()
        .map_batches(
            lambda b: pa.table({"node": b.column("node"), "label": b.column("node")}),
            batch_format="pyarrow",
        )
        .repartition(8)
        .materialize()  # each round starts from pinned state, not a replay
    )

    def tag_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__b",
            pc.bit_wise_and(
                pc.cast(b.column("node").combine_chunks(), pa.int64()),
                pa.scalar(63, pa.int64()),
            ),
        )

    def argmax_bucket(g: pa.Table) -> pa.Table:
        """Per-node mode-with-min-tie-break, vectorized over one bucket."""
        import polars as pl

        df = pl.from_arrow(g.select(["node", "label", "count()"]))
        out = (
            df.sort(["node", "count()", "label"], descending=[False, True, False])
            .unique(subset="node", keep="first", maintain_order=True)
            .select("node", "label")
        )
        return out.to_arrow().cast(
            pa.schema([("node", pa.int64()), ("label", pa.int64())])
        )

    for _ in range(iters):
        # neighbor votes: label(nbr) arrives at node; mode with min tie-break
        msgs = hash_join(edges, labels, key="nbr", right_key="node")
        votes = msgs.groupby(["node", "label"]).count()
        labels = (
            votes.map_batches(tag_bucket, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(argmax_bucket, batch_format="pyarrow")
            .repartition(8)
            .materialize()
        )
    out = labels.sort("node").to_pandas()
    out.columns = ["node", "community"]
    return out


SQL_QUERIES["lpa_communities"] = q_lpa_communities

ORACLE_SQL["lpa_communities"] = f"""
    WITH e0 AS (SELECT DISTINCT src, dst FROM ({EDGES_SQL}) WHERE src != dst),
    e AS (SELECT src AS node, dst AS nbr FROM e0
          UNION SELECT dst, src FROM e0),
    l0 AS (SELECT DISTINCT node, node AS label FROM e),
    v1 AS (SELECT node, label FROM (
        SELECT e.node, l.label,
               row_number() OVER (PARTITION BY e.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e JOIN l0 l ON l.node = e.nbr GROUP BY e.node, l.label) WHERE rn = 1),
    v2 AS (SELECT node, label FROM (
        SELECT e.node, l.label,
               row_number() OVER (PARTITION BY e.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e JOIN v1 l ON l.node = e.nbr GROUP BY e.node, l.label) WHERE rn = 1),
    v3 AS (SELECT node, label FROM (
        SELECT e.node, l.label,
               row_number() OVER (PARTITION BY e.node
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM e JOIN v2 l ON l.node = e.nbr GROUP BY e.node, l.label) WHERE rn = 1)
    SELECT node, label AS community FROM v3 ORDER BY node
"""


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source round-trip (the lingua franca format of LLM
    data pipelines): write the documents projection to line-delimited
    JSON with ``Dataset.write_json`` (one shard per task — resumable,
    never one giant file), read it back with ``ray.data.read_json``, and
    aggregate per lang — proving values survive the codec.  The oracle
    aggregates the original parquet directly."""
    import shutil
    import uuid

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    d = f"/tmp/bsr_jsonl_{uuid.uuid4().hex[:8]}"
    docs.write_json(d)
    try:
        back = ray.data.read_json(d)
        agg = (
            back.groupby("lang")
            .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="total_chars"))
            .sort("lang")
            .to_pandas()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return agg


SQL_QUERIES["jsonl_roundtrip"] = q_jsonl_roundtrip

ORACLE_SQL["jsonl_roundtrip"] = """
    SELECT lang, count(*) AS n, sum(n_chars) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
"""


def q_similarity_join(sf_dir: str, t: float = 0.2, n: int = 5):
    """EXACT set-similarity self-join with prefix filtering (the
    Vernica/PPJoin MapReduce shape; the exact complement of MinHash-LSH):
    all doc pairs whose distinct-5-gram-shingle Jaccard >= t, with the
    exact similarity.  Stage 1: global shingle document frequencies
    (combiner groupby) define one global rarity order; each doc keeps
    only its first L = n_grams - ceil(t*n_grams) + 1 prefix shingles
    under that order — any pair with J >= t provably shares a prefix
    shingle, so candidates come from a groupby over PREFIX shingles only
    (rare ones, by construction), never the full posting lists.  Stage 2
    verifies candidates exactly against the full shingle sets attached
    via two partitioned hash_joins — no doc-set broadcast.  The rarity
    dictionary is the only broadcast (df >= 2 entries only; shingles
    unique to one doc can't create pairs and rank after all shared ones
    by convention)."""
    from ..stages.joins import hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_rows(b: pa.Table) -> pa.Table:
        gs, ds = [], []
        for d, txt in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(txt)
            if len(toks) < n:
                continue
            for g in set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)):
                gs.append(g)
                ds.append(d)
        return pa.table(
            {"g": pa.array(gs, pa.string()), "doc_id": pa.array(ds, pa.int64())}
        )

    grams = docs.map_batches(gram_rows, batch_format="pyarrow").materialize()
    # global rarity order over SHARED shingles only (df >= 2): the
    # candidate stage can't pair on a df=1 shingle, and keeping the
    # broadcast dict to shared shingles bounds it by the collision space
    df_tbl = grams.groupby("g").count().filter(lambda r: r["count()"] >= 2).to_pandas()
    df_tbl.columns = ["g", "df"]
    order = df_tbl.sort_values(["df", "g"]).reset_index(drop=True)
    rank_of = {g: i for i, g in enumerate(order["g"])}
    rank_ref = ray.put(rank_of)

    def prefix_rows(b: pa.Table) -> pa.Table:
        import math

        rk = ray.get(rank_ref)
        gs, ds, ns = [], [], []
        for d, txt in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = _oracle_tokens(txt)
            if len(toks) < n:
                continue
            gset = set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
            L = len(gset) - math.ceil(t * len(gset)) + 1
            # order: shared shingles by global rarity first; df=1 shingles
            # (absent from the dict) sort last and can't seed a pair anyway
            ordered = sorted(gset, key=lambda g: (rk.get(g, 1 << 60), g))[:L]
            for g in ordered:
                if g in rk:  # only shared shingles can generate candidates
                    gs.append(g)
                    ds.append(d)
                    ns.append(len(gset))
        return pa.table(
            {
                "g": pa.array(gs, pa.string()),
                "doc_id": pa.array(ds, pa.int64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    prefixes = docs.map_batches(prefix_rows, batch_format="pyarrow")

    def pairs_of_group(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        o = np.argsort(ids)
        ids = ids[o]
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "da": pa.array(ids[a], pa.int64()),
                "db": pa.array(ids[b], pa.int64()),
            }
        )

    cand = (
        prefixes.groupby("g")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby(["da", "db"])
        .map_groups(lambda gg: gg.slice(0, 1), batch_format="pyarrow")
    )

    # verify: attach both docs' full shingle lists via partitioned joins.
    # List-building is bucketed (64 vectorized polars calls), not one
    # Python call per doc.
    def tag_doc_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__b",
            pc.bit_wise_and(
                pc.cast(b.column("doc_id").combine_chunks(), pa.int64()),
                pa.scalar(63, pa.int64()),
            ),
        )

    def lists_of_bucket(g: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            pl.from_arrow(g.select(["doc_id", "g"]))
            .group_by("doc_id")
            .agg(pl.col("g").alias("grams"))
        )
        return out.to_arrow().cast(
            pa.schema([("doc_id", pa.int64()), ("grams", pa.list_(pa.string()))])
        )

    doclists = (
        grams.map_batches(tag_doc_bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lists_of_bucket, batch_format="pyarrow")
    )
    j1 = hash_join(cand, doclists, key="da", right_key="doc_id").map_batches(
        lambda b: b.rename_columns(["da", "db", "grams_a"]), batch_format="pyarrow"
    )
    j2 = hash_join(j1, doclists, key="db", right_key="doc_id").map_batches(
        lambda b: b.rename_columns(["da", "db", "grams_a", "grams_b"]),
        batch_format="pyarrow",
    )

    def verify(b: pa.Table) -> pa.Table:
        das, dbs, sims = [], [], []
        for da, db_, ga, gb in zip(
            b.column("da").to_pylist(),
            b.column("db").to_pylist(),
            b.column("grams_a").to_pylist(),
            b.column("grams_b").to_pylist(),
        ):
            sa, sb = set(ga), set(gb)
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
            if j >= t:
                das.append(da)
                dbs.append(db_)
                sims.append(j)
        return pa.table(
            {
                "da": pa.array(das, pa.int64()),
                "db": pa.array(dbs, pa.int64()),
                "jaccard": pa.array(_r(sims, 6), pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow").sort(["da", "db"])


SQL_QUERIES["similarity_join"] = q_similarity_join

ORACLE_SQL["similarity_join"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(a[i:i+4], ' ')
                                     FOR i IN range(1, len(a) - 3)])) AS w
        FROM toks WHERE len(a) >= 5
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        FROM g a JOIN g b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT da, db,
           round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = da
    JOIN sz sb ON sb.doc_id = db
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.2
    ORDER BY da, db
"""


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


SQL_QUERIES["csv_roundtrip"] = q_csv_roundtrip

ORACLE_SQL["csv_roundtrip"] = """
    SELECT source, count(*) AS n, sum(n_chars) AS total_chars
    FROM documents GROUP BY source ORDER BY source
"""


def q_window_hopping(sf_dir: str):
    """Hopping (sliding) windows — size 2h, hop 1h — over the event
    stream: each event lands in exactly two windows; per (window_start,
    event_type) report count and value sum.  The tumbling complement is
    q_events_window; here the combiner emits BOTH window assignments per
    batch pre-aggregated, so the shuffle moves (window, type, partials)
    rows only."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    HOP = 3_600_000_000  # 1h in us

    def assign(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        w1 = (ts // HOP) * HOP
        df = pd.DataFrame(
            {
                "window_start": np.concatenate([w1, w1 - HOP]),
                "event_type": np.tile(b.column("event_type").to_numpy(zero_copy_only=False), 2),
                "n": 1,
                "s": np.tile(b.column("value").to_numpy(), 2),
            }
        )
        part = df.groupby(["window_start", "event_type"], as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    agg = (
        ev.map_batches(assign, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pa.array(
                    b.column("window_start").to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "event_type": b.column("event_type"),
                "n": b.column("n"),
                "sum_value": pa.array(_r(b.column("s").to_numpy(), 2), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["window_start", "event_type"]
    )


SQL_QUERIES["window_hopping"] = q_window_hopping

ORACLE_SQL["window_hopping"] = """
    WITH w AS (
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
               event_type, value FROM events
        UNION ALL
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 - 3600000000),
               event_type, value FROM events
    )
    SELECT window_start, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM w GROUP BY window_start, event_type ORDER BY window_start, event_type
"""


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


SQL_QUERIES["pivot_counts"] = q_pivot_counts

ORACLE_SQL["pivot_counts"] = """
    SELECT event_type,
           sum(CASE WHEN hour(ts) // 6 = 0 THEN 1 ELSE 0 END) AS q0,
           sum(CASE WHEN hour(ts) // 6 = 1 THEN 1 ELSE 0 END) AS q1,
           sum(CASE WHEN hour(ts) // 6 = 2 THEN 1 ELSE 0 END) AS q2,
           sum(CASE WHEN hour(ts) // 6 = 3 THEN 1 ELSE 0 END) AS q3
    FROM events GROUP BY event_type ORDER BY event_type
"""


def q_graph_features(sf_dir: str):
    """Composed per-page graph-feature table — the whole-graph scoring
    pass a training-data pipeline materializes once and joins everywhere
    (quality priors, crawl seeds, spam demotion): PageRank, HITS hub +
    authority, out-/in-degree per doc over the SAME shared link graph
    (_link_edges, derived once per session).  The five feature sources
    fold through ONE tagged-union groupby (each node appears at most once
    per source, zero-filled elsewhere, so a native Sum reconstructs every
    column) — no join chain, one shuffle."""
    from ..stages.graph import hits, pagerank

    edges = _link_edges(sf_dir)
    pr = pagerank(edges, iters=3, damping=0.85)
    ht = hits(edges, iters=2)
    outdeg = edges.groupby("src").count()
    indeg = edges.groupby("dst").count()

    Z = ("pagerank", "hub", "auth", "outdeg", "indeg")

    def tagged(cols_of):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            data = {"node": pc.cast(b.column(cols_of["node"]).combine_chunks(), pa.int64())}
            for z in Z:
                if z in cols_of:
                    data[z] = pc.cast(b.column(cols_of[z]), pa.float64())
                else:
                    data[z] = pa.array(np.zeros(n), pa.float64())
            return pa.table(data)

        return f

    parts = [
        pr.map_batches(tagged({"node": "node", "pagerank": "rank"}), batch_format="pyarrow"),
        ht.map_batches(
            tagged({"node": "node", "hub": "hub", "auth": "auth"}), batch_format="pyarrow"
        ),
        outdeg.map_batches(
            tagged({"node": "src", "outdeg": "count()"}), batch_format="pyarrow"
        ),
        indeg.map_batches(
            tagged({"node": "dst", "indeg": "count()"}), batch_format="pyarrow"
        ),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    agg = u.groupby("node").aggregate(
        *[Sum(z, alias_name=z) for z in Z]
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("node"),
                "pagerank": pa.array(
                    _r(b.column("pagerank").to_numpy(), 6), pa.float64()
                ),
                "hub": pa.array(_r(b.column("hub").to_numpy(), 6), pa.float64()),
                "auth": pa.array(_r(b.column("auth").to_numpy(), 6), pa.float64()),
                "outdeg": pc.cast(pc.round(b.column("outdeg")), pa.int64()),
                "indeg": pc.cast(pc.round(b.column("indeg")), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("doc_id")


SQL_QUERIES["graph_features"] = q_graph_features

ORACLE_SQL["graph_features"] = f"""
    WITH p AS ({_pagerank_oracle_sql()}),
    h AS ({_hits_oracle_sql()}),
    nodes2 AS (SELECT doc_id AS d FROM documents),
    nn2 AS (SELECT count(*) AS n FROM documents),
    edges2 AS (
        SELECT d AS src, (7 * d + 1) % nn2.n AS dst FROM nodes2, nn2
        UNION
        SELECT d AS src, (d + 10) % nn2.n AS dst FROM nodes2, nn2
        WHERE ((d + 10) % nn2.n) % 10 = d % 10
    ),
    od AS (SELECT src, count(*) AS outdeg FROM edges2 GROUP BY src),
    idg AS (SELECT dst, count(*) AS indeg FROM edges2 GROUP BY dst)
    SELECT p.doc_id, p.pagerank, h.hub, h.auth,
           coalesce(od.outdeg, 0) AS outdeg,
           coalesce(idg.indeg, 0) AS indeg
    FROM p
    JOIN h USING (doc_id)
    LEFT JOIN od ON od.src = p.doc_id
    LEFT JOIN idg ON idg.dst = p.doc_id
    ORDER BY p.doc_id
"""


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


SQL_QUERIES["chunk_texts"] = q_chunk_texts

ORACLE_SQL["chunk_texts"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
    ),
    starts AS (
        -- chunk c starts at token c*24 (0-based); the last chunk is the
        -- first one whose window reaches the end of the doc
        SELECT doc_id, a, c.c AS chunk_id, c.c * 24 AS start_tok
        FROM toks, LATERAL (SELECT unnest(range(0, len(a))) AS c) c
        WHERE c.c * 24 < len(a)
          AND (c.c = 0 OR (c.c - 1) * 24 + 32 < len(a))
    )
    SELECT doc_id, chunk_id, start_tok,
           least(32, len(a) - start_tok) AS n_tokens,
           a[start_tok + 1] AS first_tok,
           a[least(start_tok + 32, len(a))] AS last_tok
    FROM starts ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# statistics / collocation / multi-level-aggregate primitives
# ---------------------------------------------------------------------------

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


SQL_QUERIES["pmi_bigrams"] = q_pmi_bigrams

ORACLE_SQL["pmi_bigrams"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS a FROM documents
    ),
    uni AS (SELECT unnest(a) AS w FROM toks),
    ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    nu AS (SELECT count(*) AS n FROM uni),
    bi AS (
        SELECT a[i] AS w1, a[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(a))) AS i) g
    ),
    bcnt AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
    nb AS (SELECT count(*) AS n FROM bi)
    SELECT bcnt.w1 || ' ' || bcnt.w2 AS bigram, bcnt.c AS cnt,
           round(ln((bcnt.c / nb.n) / ((u1.c / nu.n) * (u2.c / nu.n))), 6) AS pmi
    FROM bcnt, nb, nu
    JOIN ucnt u1 ON u1.w = bcnt.w1
    JOIN ucnt u2 ON u2.w = bcnt.w2
    WHERE bcnt.c >= 5
    ORDER BY pmi DESC, bigram
    LIMIT 50
"""


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


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


SQL_QUERIES["corr_matrix"] = q_corr_matrix

ORACLE_SQL["corr_matrix"] = r"""
    WITH m AS (
        SELECT sum(l_quantity) / count(*) AS mq,
               sum(l_extendedprice) / count(*) AS me,
               sum(l_discount) / count(*) AS md,
               sum(l_tax) / count(*) AS mt
        FROM lineitem
    ),
    c AS (
        SELECT
            sum((l_quantity - mq) * (l_quantity - mq)) AS vq,
            sum((l_extendedprice - me) * (l_extendedprice - me)) AS ve,
            sum((l_discount - md) * (l_discount - md)) AS vd,
            sum((l_tax - mt) * (l_tax - mt)) AS vt,
            sum((l_quantity - mq) * (l_extendedprice - me)) AS xqe,
            sum((l_quantity - mq) * (l_discount - md)) AS xqd,
            sum((l_quantity - mq) * (l_tax - mt)) AS xqt,
            sum((l_extendedprice - me) * (l_discount - md)) AS xed,
            sum((l_extendedprice - me) * (l_tax - mt)) AS xet,
            sum((l_discount - md) * (l_tax - mt)) AS xdt
        FROM lineitem, m
    )
    SELECT * FROM (
        SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
               round(xqe / sqrt(vq * ve), 6) AS corr FROM c
        UNION ALL
        SELECT 'l_quantity', 'l_discount', round(xqd / sqrt(vq * vd), 6) FROM c
        UNION ALL
        SELECT 'l_quantity', 'l_tax', round(xqt / sqrt(vq * vt), 6) FROM c
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount', round(xed / sqrt(ve * vd), 6) FROM c
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax', round(xet / sqrt(ve * vt), 6) FROM c
        UNION ALL
        SELECT 'l_discount', 'l_tax', round(xdt / sqrt(vd * vt), 6) FROM c
    ) ORDER BY col_x, col_y
"""


def q_rollup_agg(sf_dir: str):
    """Multi-level subtotal aggregate — GROUP BY ROLLUP(l_returnflag,
    l_linestatus) — the reporting shape behind per-host / per-lang /
    grand-total corpus dashboards.  Distributed plan: ONE shuffle computes
    the finest (flag, status) aggregate (a handful of rows); the coarser
    rollup levels are derived from that finished aggregate driver-side,
    which is the correct plan at any scale because the finest level is
    already group-cardinality-sized.  l_quantity is integer-valued so the
    re-summed subtotals are float-exact; sums rounded 2dp."""
    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    fine = (
        li.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(), Sum("l_quantity"))
        .to_pandas()
        .rename(columns={"count()": "cnt", "sum(l_quantity)": "qty"})
    )
    rows = [
        {
            "returnflag": r.l_returnflag,
            "linestatus": r.l_linestatus,
            "cnt": int(r.cnt),
            "sum_qty": round(r.qty, 2),
        }
        for r in fine.itertuples()
    ]
    by_flag = fine.groupby("l_returnflag", as_index=False).agg(
        cnt=("cnt", "sum"), qty=("qty", "sum")
    )
    rows += [
        {
            "returnflag": r.l_returnflag,
            "linestatus": "ALL",
            "cnt": int(r.cnt),
            "sum_qty": round(r.qty, 2),
        }
        for r in by_flag.itertuples()
    ]
    rows.append(
        {
            "returnflag": "ALL",
            "linestatus": "ALL",
            "cnt": int(fine["cnt"].sum()),
            "sum_qty": round(fine["qty"].sum(), 2),
        }
    )
    return (
        pd.DataFrame(rows)
        .sort_values(["returnflag", "linestatus"])
        .reset_index(drop=True)
    )


SQL_QUERIES["rollup_agg"] = q_rollup_agg

ORACLE_SQL["rollup_agg"] = r"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
"""


# ---------------------------------------------------------------------------
# collapsed-graph / crawl-prioritization analytics
# ---------------------------------------------------------------------------

def q_host_pagerank(sf_dir: str):
    """Host-level PageRank: collapse the crawl store's page link graph to
    its host graph (parallel page edges become one weighted edge) and run
    weighted power iteration — the domain-authority prior a crawler uses
    for frontier seeding and per-host quality weighting.  The collapse is
    one distributed groupby over (src_host, dst_host) pairs; the rank pass
    is stages/graph.py pagerank_weighted (tagged-union bucket message
    pass, contribution = 0.85 * rank * w / wout in SQL-mirrorable
    operation order).  Store pages live on hosts site{d % 10}.example, so
    host ids are page_id % 10 on both sides."""
    from ..stages.graph import pagerank_weighted

    def collapse(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(b.column("src").to_numpy() % 10, pa.int64()),
                "dst": pa.array(b.column("dst").to_numpy() % 10, pa.int64()),
            }
        )

    hedges = (
        _link_edges(sf_dir)
        .map_batches(collapse, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .map_batches(
            lambda b: b.rename_columns(["src", "dst", "weight"]),
            batch_format="pyarrow",
        )
    )
    ranks = pagerank_weighted(hedges, iters=3, damping=0.85).sort("node").to_pandas()
    ranks = ranks.rename(columns={"node": "host", "rank": "pagerank"})
    ranks["pagerank"] = _r(ranks["pagerank"].to_numpy(), 6)
    return ranks


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


SQL_QUERIES["host_pagerank"] = q_host_pagerank
ORACLE_SQL["host_pagerank"] = _host_pagerank_oracle_sql()


def q_opic_priority(sf_dir: str):
    """OPIC crawl prioritization (Abiteboul et al., WWW 2003 — "Adaptive
    On-Line Page Importance Computation"): the frontier-ordering signal a
    crawler can maintain INCREMENTALLY while crawling, unlike full
    PageRank.  Each page carries cash (recent flow) and history
    (accumulated importance); per synchronous round every page banks its
    cash and spreads it uniformly over its out-links.  3 batch rounds via
    stages/graph.py opic (bucketed message pass + one tagged-union state
    fold per round; only scalar rows shuffle).  The store graph is
    dangling-free (every page links to 7d+1), in-degree <= 2, so the fold
    sums are order-exact against the unrolled SQL mirror."""
    from ..stages.graph import opic

    st = opic(_link_edges(sf_dir), iters=3).sort("node").to_pandas()
    st = st.rename(columns={"node": "doc_id"})
    st["cash"] = _r(st["cash"].to_numpy(), 6)
    st["history"] = _r(st["history"].to_numpy(), 6)
    return st[["doc_id", "cash", "history"]]


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


SQL_QUERIES["opic_priority"] = q_opic_priority
ORACLE_SQL["opic_priority"] = _opic_oracle_sql()


# ---------------------------------------------------------------------------
# model-eval / data-mixing / curriculum primitives
# ---------------------------------------------------------------------------

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


SQL_QUERIES["langid_confusion"] = q_langid_confusion


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


SQL_QUERIES["hard_negatives"] = q_hard_negatives

ORACLE_SQL["hard_negatives"] = """
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
               list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
        FROM q CROSS JOIN embeddings e
        WHERE e.label <> q.qlabel
    )
    SELECT query_id, neighbor_id, CAST(label AS BIGINT) AS label,
           round(sim, 4) AS sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) <= 3
    ORDER BY query_id, sim DESC, neighbor_id
"""


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


SQL_QUERIES["rare_category_merge"] = q_rare_category_merge

ORACLE_SQL["rare_category_merge"] = """
    WITH cells AS (
        SELECT source, lang, count(*) AS cnt
        FROM documents GROUP BY source, lang
    )
    SELECT CASE WHEN cnt >= 5 THEN source || '/' || lang ELSE 'other' END
               AS category,
           CAST(sum(cnt) AS BIGINT) AS cnt
    FROM cells GROUP BY 1 ORDER BY category
"""


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


SQL_QUERIES["curriculum_order"] = q_curriculum_order

ORACLE_SQL["curriculum_order"] = """
    WITH ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS r
        FROM documents
    ),
    nn AS (SELECT count(*) AS n FROM documents),
    dec AS (SELECT doc_id, (r * 10) // nn.n AS decile FROM ranked, nn),
    keyed AS (
        SELECT doc_id, decile, md5(CAST(doc_id AS VARCHAR)) AS k FROM dec
    )
    SELECT doc_id, decile,
           row_number() OVER (PARTITION BY decile ORDER BY k, doc_id) - 1 AS pos
    FROM keyed ORDER BY doc_id
"""


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


SQL_QUERIES["mix_temperature"] = q_mix_temperature

ORACLE_SQL["mix_temperature"] = """
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    w AS (
        SELECT source,
               CAST(floor(power(n, 0.5) * 1000000) AS BIGINT) AS wv
        FROM counts
    ),
    tot AS (SELECT sum(wv) AS z FROM w),
    quota AS (
        SELECT source, (200 * wv) // tot.z AS q FROM w, tot
    ),
    keyed AS (
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents
    ),
    ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY k, doc_id) AS rn
        FROM keyed
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quota USING (source)
    WHERE r.rn <= quota.q
    ORDER BY r.doc_id
"""


# the confusion mirror nests the full-value langid oracle as a CTE so both
# sides' predictions come from the complete (independently implemented)
# rule set
ORACLE_SQL["langid_confusion"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """)
    SELECT d.lang, p.lang_pred, count(*) AS cnt
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY d.lang, p.lang_pred
    ORDER BY d.lang, p.lang_pred
"""
)


def q_tpch_q18(sf_dir: str, threshold: float = 200.0, k: int = 100):
    """TPC-H Q18 (large-volume customers): orders whose line quantities sum
    past a threshold, joined back to customer, top-k by order value.  The
    scale-correct plan: pass 1 is a combiner groupby (each batch pre-sums
    its own l_orderkey quantities, the shuffle moves partials); the HAVING
    survivors are threshold-rare by construction, so they broadcast via
    ray.put as an isin filter over orders (semi-join, no shuffle), and the
    customer side is filtered to the survivors' custkeys before a
    driver-side merge of two already-tiny tables."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def pre(b: pa.Table) -> pa.Table:
        return b.group_by("l_orderkey").aggregate([("l_quantity", "sum")])

    hot = (
        li.map_batches(pre, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("l_quantity_sum")
        .map_batches(
            lambda b: b.rename_columns(["l_orderkey", "sum_qty"]),
            batch_format="pyarrow",
        )
        .filter(expr=f"sum_qty > {threshold}")
        .to_pandas()
    )
    qty = dict(zip(hot["l_orderkey"].astype(int), hot["sum_qty"]))
    qty_ref = ray.put(qty)

    def pick_orders(b: pa.Table) -> pa.Table:
        q = ray.get(qty_ref)
        mask = pc.is_in(
            b.column("o_orderkey"), pa.array(list(q.keys()), pa.int64())
        )
        return b.filter(mask)

    ords = (
        _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(pick_orders, batch_format="pyarrow")
        .to_pandas()
    )
    custkeys = set(ords["o_custkey"].astype(int))
    ck_arr = pa.array(sorted(custkeys), pa.int64())

    def pick_cust(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("c_custkey"), ck_arr))

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(pick_cust, batch_format="pyarrow")
        .to_pandas()
    )
    out = ords.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = out["o_orderkey"].map(qty).round(2)
    out = out.sort_values(
        ["o_totalprice", "o_orderdate", "o_orderkey"],
        ascending=[False, True, True],
    ).head(k)
    return out[
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
    ].reset_index(drop=True)


SQL_QUERIES["tpch_q18"] = q_tpch_q18

ORACLE_SQL["tpch_q18"] = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
"""


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


SQL_QUERIES["ngram_hash_features"] = q_ngram_hash_features

ORACLE_SQL["ngram_hash_features"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    )
    SELECT doc_id, CAST(md5_number_lower(w) % 64 AS BIGINT) AS bucket,
           count(*) AS cnt
    FROM toks GROUP BY doc_id, bucket
    ORDER BY doc_id, bucket
"""


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


SQL_QUERIES["group_percentiles"] = q_group_percentiles

ORACLE_SQL["group_percentiles"] = """
    SELECT doc_id, lang,
           round(percent_rank() OVER (PARTITION BY lang
                                      ORDER BY n_chars, doc_id), 6) AS pct
    FROM documents ORDER BY doc_id
"""


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


SQL_QUERIES["dist_divergence"] = q_dist_divergence

ORACLE_SQL["dist_divergence"] = """
    WITH cells AS (
        SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang
    ),
    src AS (SELECT source, sum(c) AS ns FROM cells GROUP BY source),
    corpus AS (SELECT lang, sum(c) AS cq FROM cells GROUP BY lang),
    tot AS (SELECT count(*) AS n FROM documents),
    terms AS (
        SELECT cells.source, cells.lang,
               (cells.c / src.ns) * ln((cells.c / src.ns) / (corpus.cq / tot.n))
                   AS term
        FROM cells
        JOIN src USING (source)
        JOIN corpus USING (lang)
        CROSS JOIN tot
    )
    SELECT source, round(sum(term ORDER BY lang), 6) AS kl
    FROM terms GROUP BY source ORDER BY source
"""


def q_burst_windows(sf_dir: str):
    """Burst detection over the event stream: hourly buckets whose count
    exceeds mean + 2*stddev for that event_type (rate-anomaly flagging —
    crawler-trap spikes, abuse bursts).  Two passes over the tiny hourly
    aggregate: the bucket-count table reduces via combiner groupby; means
    come from (sum, n) and the variance from centered squares — the same
    cancellation-free plan as corr_matrix — then the flag filter runs on
    the finished aggregate.  Population stddev on both sides."""
    import math

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def buckets(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        t = pa.table({"event_type": b.column("event_type"), "hour": hour})
        return t.group_by(["event_type", "hour"]).aggregate([([], "count_all")])

    hourly = (
        ev.map_batches(buckets, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .sum("count_all")
        .to_pandas()
        .rename(columns={"sum(count_all)": "cnt"})
    )
    stats = hourly.groupby("event_type")["cnt"].agg(["sum", "count"]).reset_index()
    stats["mean"] = stats["sum"] / stats["count"]
    mean = dict(zip(stats["event_type"], stats["mean"]))
    hourly["dev2"] = (hourly["cnt"] - hourly["event_type"].map(mean)) ** 2
    var = hourly.groupby("event_type")["dev2"].sum() / stats.set_index("event_type")[
        "count"
    ]
    thresh = {
        t: mean[t] + 2.0 * math.sqrt(v) for t, v in var.items()
    }
    out = hourly[hourly["cnt"] > hourly["event_type"].map(thresh)]
    return (
        out[["event_type", "hour", "cnt"]]
        .astype({"hour": "int64", "cnt": "int64"})
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )


SQL_QUERIES["burst_windows"] = q_burst_windows

ORACLE_SQL["burst_windows"] = """
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
               count(*) AS cnt
        FROM events GROUP BY event_type, hour
    ),
    m AS (
        SELECT event_type, sum(cnt) / count(*) AS mean, count(*) AS n
        FROM hourly GROUP BY event_type
    ),
    v AS (
        SELECT h.event_type,
               sum((h.cnt - m.mean) * (h.cnt - m.mean)) / m.n AS var
        FROM hourly h JOIN m USING (event_type)
        GROUP BY h.event_type, m.n
    )
    SELECT h.event_type, h.hour, h.cnt
    FROM hourly h JOIN m USING (event_type) JOIN v USING (event_type)
    WHERE h.cnt > m.mean + 2.0 * sqrt(v.var)
    ORDER BY h.event_type, h.hour
"""


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


SQL_QUERIES["event_transitions"] = q_event_transitions

ORACLE_SQL["event_transitions"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    cells AS (
        SELECT event_type AS from_type, nxt AS to_type, count(*) AS cnt
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY event_type, nxt
    ),
    tot AS (SELECT from_type, sum(cnt) AS n FROM cells GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.cnt, round(c.cnt / t.n, 6) AS p
    FROM cells c JOIN tot t USING (from_type)
    ORDER BY c.from_type, c.to_type
"""


def q_window_rolling_avg(sf_dir: str, window: int = 3):
    """Per-user rolling mean of the last ``window`` event values ordered
    by (ts, event_id) — the classic ROWS BETWEEN n PRECEDING sliding
    aggregate.  Users are independent, so groupby(user_id).map_groups
    computes each user's rolling sums vectorized (cumsum difference); at
    10^10 events the partition key keeps every window inside one group
    task.  avg = window_sum / window_len with the sum accumulated in ts
    order on both sides, rounded 6dp."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def roll(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = df["value"].to_numpy()
        # ordered prefix sums == SQL's ordered-frame accumulation
        cs = np.concatenate([[0.0], np.cumsum(v)])
        n = len(v)
        lo = np.maximum(0, np.arange(n) - (window - 1))
        sums = cs[np.arange(n) + 1] - cs[lo]
        lens = np.arange(n) + 1 - lo
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
                "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
                "roll_avg": pa.array(np.round(sums / lens, 6), pa.float64()),
            }
        )

    return (
        ev.groupby("user_id")
        .map_groups(roll, batch_format="pyarrow")
        .sort(["user_id", "event_id"])
    )


SQL_QUERIES["window_rolling_avg"] = q_window_rolling_avg

ORACLE_SQL["window_rolling_avg"] = """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 6) AS roll_avg
    FROM events
    ORDER BY user_id, event_id
"""


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


SQL_QUERIES["nonedge_sample"] = q_nonedge_sample

ORACLE_SQL["nonedge_sample"] = """
    WITH docs AS (SELECT doc_id AS d FROM documents),
    nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
        SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM docs, nn
        UNION
        SELECT d AS src, (d + 10) % nn.n AS dst FROM docs, nn
        WHERE ((d + 10) % nn.n) % 10 = d % 10
    ),
    cand AS (
        SELECT d AS src, j.j AS probe,
               CAST(md5_number_lower(d || ':' || j.j) % nn.n AS BIGINT) AS dst
        FROM docs, nn, LATERAL (SELECT unnest(range(0, 8)) AS j) j
    ),
    noneedge AS (
        SELECT c.src, c.dst, c.probe
        FROM cand c ANTI JOIN edges e ON e.src = c.src AND e.dst = c.dst
        WHERE c.dst <> c.src
    )
    SELECT src, dst, probe FROM noneedge
    QUALIFY row_number() OVER (PARTITION BY src ORDER BY probe, dst) <= 4
    ORDER BY src, probe
"""


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


SQL_QUERIES["link_locality"] = q_link_locality

ORACLE_SQL["link_locality"] = """
    WITH docs AS (SELECT doc_id AS d FROM documents),
    nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
        SELECT d AS src, (7 * d + 1) % nn.n AS dst FROM docs, nn
        UNION
        SELECT d AS src, (d + 10) % nn.n AS dst FROM docs, nn
        WHERE ((d + 10) % nn.n) % 10 = d % 10
    )
    SELECT src % 10 AS host,
           CAST(sum(CASE WHEN src % 10 = dst % 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS local,
           count(*) AS n,
           round(sum(CASE WHEN src % 10 = dst % 10 THEN 1 ELSE 0 END)
                 / count(*), 6) AS local_ratio
    FROM edges GROUP BY src % 10 ORDER BY host
"""


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


SQL_QUERIES["dup_rate_by_source"] = q_dup_rate_by_source

ORACLE_SQL["dup_rate_by_source"] = r"""
    WITH fp AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\s+'))[1:4], ' ')) AS h
        FROM documents
    ),
    sizes AS (SELECT h, count(*) AS sz FROM fp GROUP BY h)
    SELECT f.source,
           CAST(sum(CASE WHEN s.sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dups,
           count(*) AS n,
           round(sum(CASE WHEN s.sz > 1 THEN 1 ELSE 0 END) / count(*), 6)
               AS dup_rate
    FROM fp f JOIN sizes s USING (h)
    GROUP BY f.source ORDER BY f.source
"""


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


SQL_QUERIES["event_value_quantiles"] = q_event_value_quantiles

ORACLE_SQL["event_value_quantiles"] = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) - 1 AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           round(max(CASE WHEN r = CAST(floor(0.25 * (n - 1)) AS BIGINT)
                          THEN value END), 6) AS p25,
           round(max(CASE WHEN r = CAST(floor(0.5 * (n - 1)) AS BIGINT)
                          THEN value END), 6) AS p50,
           round(max(CASE WHEN r = CAST(floor(0.75 * (n - 1)) AS BIGINT)
                          THEN value END), 6) AS p75
    FROM ranked GROUP BY event_type ORDER BY event_type
"""


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


SQL_QUERIES["cross_source_overlap"] = q_cross_source_overlap

ORACLE_SQL["cross_source_overlap"] = r"""
    WITH cells AS (
        SELECT DISTINCT
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\s+'))[1:4], ' ')) AS h,
               source
        FROM documents
    )
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
    FROM cells a JOIN cells b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY src_a, src_b
"""


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


SQL_QUERIES["monthly_revenue_delta"] = q_monthly_revenue_delta

ORACLE_SQL["monthly_revenue_delta"] = """
    WITH m AS (
        SELECT year(l_shipdate) * 100 + month(l_shipdate) AS month,
               round(sum(round(l_extendedprice * (1 - l_discount), 2)), 2)
                   AS revenue
        FROM lineitem GROUP BY 1
    )
    SELECT month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS delta
    FROM m ORDER BY month
"""


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


SQL_QUERIES["daily_top_users"] = q_daily_top_users

ORACLE_SQL["daily_top_users"] = """
    WITH cells AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               user_id,
               round(sum(round(value, 2)), 2) AS total
        FROM events GROUP BY day, user_id
    )
    SELECT day, user_id, total,
           CAST(row_number() OVER (PARTITION BY day
                                   ORDER BY total DESC, user_id) AS BIGINT)
               AS rank
    FROM cells
    QUALIFY rank <= 3
    ORDER BY day, rank
"""


def q_host_quality_budget(sf_dir: str, total_budget: int = 1000):
    """Quality-aware crawl budget allocation — the crawl↔curation
    feedback loop: each source's share of the next crawl round's fetch
    budget is proportional to how many of its pages pass the Gopher keep
    rule (spam-heavy hosts starve, clean hosts grow).  One combiner map
    evaluates the shared _gopher_stats rule per batch and pre-sums
    (source, keeps, n); the groupby moves O(sources) rows and the
    integer-exact allocation budget_s = (B * keeps_s) // total_keeps runs
    on the finished category-sized aggregate (same no-float-boundary
    quota math as mix_temperature)."""
    docs = _read(sf_dir, "documents", columns=["text", "source"])

    def cells(b: pa.Table) -> pa.Table:
        src = b.column("source").to_pylist()
        keeps = [
            _gopher_stats(_oracle_tokens(t))[4] for t in b.column("text").to_pylist()
        ]
        t = pa.table(
            {
                "source": pa.array(src, pa.string()),
                "keeps": pa.array(keeps, pa.int64()),
                "n": pa.array([1] * len(src), pa.int64()),
            }
        )
        return t.group_by("source").aggregate([("keeps", "sum"), ("n", "sum")])

    agg = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("keeps_sum", alias_name="keeps"), Sum("n_sum", alias_name="n"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    total_keeps = int(agg["keeps"].sum())
    agg["keep_rate"] = _r((agg["keeps"] / agg["n"]).to_numpy(), 6)
    agg["budget"] = [
        (total_budget * int(k)) // total_keeps if total_keeps else 0
        for k in agg["keeps"]
    ]
    return agg[["source", "keeps", "n", "keep_rate", "budget"]].astype(
        {"keeps": "int64", "n": "int64", "budget": "int64"}
    )


SQL_QUERIES["host_quality_budget"] = q_host_quality_budget

# nests the full gopher_quality oracle so the keep rule cannot drift
ORACLE_SQL["host_quality_budget"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"] + """),
    cells AS (
        SELECT d.source, CAST(sum(gq.keep) AS BIGINT) AS keeps, count(*) AS n
        FROM documents d JOIN gq USING (doc_id)
        GROUP BY d.source
    ),
    tot AS (SELECT sum(keeps) AS tk FROM cells)
    SELECT source, keeps, n,
           round(keeps / n, 6) AS keep_rate,
           CASE WHEN tot.tk > 0 THEN (1000 * keeps) // tot.tk ELSE 0 END
               AS budget
    FROM cells, tot ORDER BY source
"""
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


SQL_QUERIES["cluster_size_histogram"] = q_cluster_size_histogram

ORACLE_SQL["cluster_size_histogram"] = (
    "WITH cl AS (" + ORACLE_SQL["dedup_clusters"] + """),
    sizes AS (SELECT cluster_id, count(*) AS size FROM cl GROUP BY cluster_id)
    SELECT size, count(*) AS clusters FROM sizes GROUP BY size ORDER BY size
"""
)


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


SQL_QUERIES["levenshtein_verify"] = q_levenshtein_verify

ORACLE_SQL["levenshtein_verify"] = """
    WITH fp AS (
        SELECT doc_id, substr(text, 1, 64) AS p,
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\\s+'))[1:4], ' ')) AS h
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.p, b.p) AS dist,
           CASE WHEN greatest(len(a.p), len(b.p)) = 0 THEN 1.0
                ELSE round(1.0 - levenshtein(a.p, b.p)
                           / greatest(len(a.p), len(b.p)), 6) END AS sim
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
"""


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


SQL_QUERIES["schema_profile"] = q_schema_profile

ORACLE_SQL["schema_profile"] = """
    SELECT 'event_id' AS col_name, count(*) AS n_rows,
           count(*) - count(event_id) AS n_null,
           count(DISTINCT event_id) AS n_distinct,
           round(CAST(min(event_id) AS DOUBLE), 6) AS min_num,
           round(CAST(max(event_id) AS DOUBLE), 6) AS max_num
    FROM events
    UNION ALL
    SELECT 'ts', count(*), count(*) - count(ts), count(DISTINCT ts),
           round(CAST(epoch_us(min(ts)) AS DOUBLE), 6),
           round(CAST(epoch_us(max(ts)) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           count(DISTINCT user_id),
           round(CAST(min(user_id) AS DOUBLE), 6),
           round(CAST(max(user_id) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT 'event_type', count(*), count(*) - count(event_type),
           count(DISTINCT event_type), NULL, NULL
    FROM events
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value), count(DISTINCT value),
           round(CAST(min(value) AS DOUBLE), 6),
           round(CAST(max(value) AS DOUBLE), 6)
    FROM events
    UNION ALL
    SELECT 'props', count(*), count(*) - count(props), count(DISTINCT props),
           NULL, NULL
    FROM events
    ORDER BY col_name
"""


def q_source_host_entropy(sf_dir: str):
    """Per-source Shannon entropy (nats) of the host distribution — the
    crawl-diversity dial: entropy near ln(n_hosts) means the source spreads
    over hosts, near 0 means one host dominates and politeness serializes
    it.  Host mapping matches host_gini (doc_id % 10 in this synthetic
    corpus).  One combiner groupby to (source, host) counts; the entropy
    fold runs on the dim-sized result, summed in host order on both sides
    so the float hash is stable.  At web scale (10^8+ hosts) use the
    algebraic form entropy = ln(n) - (sum c*ln c)/n, whose inner term is
    a plain distributed Sum aggregate — the ordered driver fold here buys
    bit-exact SQL parity on the fixture's dim-sized host space."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def cells(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pandas(),
                "host": b.column("doc_id").to_numpy() % 10,
            }
        )
        g = df.groupby(["source", "host"]).size().reset_index(name="c")
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "host": pa.array(g["host"], pa.int64()),
                "c": pa.array(g["c"], pa.int64()),
            }
        )

    cnt = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby(["source", "host"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values(["source", "host"])
    )
    out = []
    for src, g in cnt.groupby("source", sort=True):
        n = float(g["c"].sum())
        ent = 0.0
        for c in g["c"]:  # host order — matches sum(... ORDER BY host)
            p = c / n
            ent += -p * np.log(p)
        out.append((src, int(n), len(g), float(_r(ent, 6))))
    return pd.DataFrame(
        out, columns=["source", "n_docs", "n_hosts", "entropy"]
    ).astype({"n_docs": "int64", "n_hosts": "int64"})


SQL_QUERIES["source_host_entropy"] = q_source_host_entropy

ORACLE_SQL["source_host_entropy"] = """
    WITH hc AS (
        SELECT source, doc_id % 10 AS host, count(*) AS c
        FROM documents GROUP BY source, host
    ),
    tot AS (SELECT source, sum(c) AS n FROM hc GROUP BY source)
    SELECT hc.source, CAST(any_value(tot.n) AS BIGINT) AS n_docs,
           count(*) AS n_hosts,
           round(sum(-(c / tot.n) * ln(c / tot.n) ORDER BY host), 6)
               AS entropy
    FROM hc JOIN tot USING (source)
    GROUP BY hc.source ORDER BY hc.source
"""


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


SQL_QUERIES["tokenizer_fertility"] = q_tokenizer_fertility

ORACLE_SQL["tokenizer_fertility"] = """
    WITH t AS (
        SELECT lang, source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS toks,
               n_chars
        FROM documents
    )
    SELECT lang, source, CAST(sum(toks) AS BIGINT) AS tokens,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           CASE WHEN sum(n_chars) = 0 THEN 0.0
                ELSE round(100.0 * sum(toks) / sum(n_chars), 6) END AS fertility
    FROM t GROUP BY lang, source ORDER BY lang, source
"""


def q_skew_join(sf_dir: str):
    """Hot-key-salted equi-join (stages/joins.py skew_join) — the skewed
    fact⋈dim shape a plain hash join dies on at 100 TB: here a synthetic
    hot key (every even event collapses onto key 0 → 50% of the probe
    side) is detected by an exact combiner count, spread over 8 salts, and
    only the hot build rows replicate.  The result is aggregated per
    (key, customer) with integer-cent sums so the float hash is exact.
    Join output == unsalted join by construction; the oracle is the plain
    SQL join."""
    from ..stages.joins import skew_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def keyed(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        uid = b.column("user_id").to_numpy()
        k = np.where(eid % 2 == 0, 0, uid).astype(np.int64)
        cents = _r(b.column("value").to_numpy() * 100.0, 0).astype(np.int64)
        return pa.table(
            {"k": pa.array(k, pa.int64()), "cents": pa.array(cents, pa.int64())}
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    out = skew_join(
        ev.map_batches(keyed, batch_format="pyarrow"),
        cust,
        key="k",
        right_key="c_custkey",
        hot_share=0.05,
        num_salts=8,
    )
    agg = (
        out.groupby(["k", "c_name"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    agg["value_sum"] = (agg["cents"] / 100.0).round(2)
    return (
        agg[["k", "c_name", "n", "value_sum"]]
        .astype({"k": "int64", "n": "int64"})
        .sort_values("k")
        .reset_index(drop=True)
    )


SQL_QUERIES["skew_join"] = q_skew_join

ORACLE_SQL["skew_join"] = """
    WITH e AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS k,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT k, c_name, count(*) AS n, round(sum(cents) / 100.0, 2) AS value_sum
    FROM e JOIN customer ON k = c_custkey
    GROUP BY k, c_name ORDER BY k
"""


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


SQL_QUERIES["char_entropy"] = q_char_entropy

ORACLE_SQL["char_entropy"] = """
    WITH pos AS (
        SELECT doc_id, unnest(range(1, len(text) + 1)) AS i, text
        FROM documents
    ),
    chars AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch FROM pos),
    freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id, CAST(any_value(t.n) AS BIGINT) AS n_chars,
           count(*) AS n_unique,
           round(sum(-(c / t.n) * ln(c / t.n) ORDER BY ch), 6) AS entropy
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id ORDER BY f.doc_id
"""


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


SQL_QUERIES["sentence_split"] = q_sentence_split

ORACLE_SQL["sentence_split"] = """
    WITH arrs AS (
        SELECT doc_id, string_split_regex(text, '[.!?]\\s+') AS arr
        FROM documents
    ),
    sents AS (
        SELECT doc_id,
               unnest(range(1, len(arr) + 1)) AS sent_idx,
               unnest(arr) AS sentence
        FROM arrs
    )
    SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, sentence,
           len(regexp_split_to_array(trim(sentence), '\\s+')) AS n_tokens
    FROM sents ORDER BY doc_id, sent_idx
"""


def q_df_idf_topk(sf_dir: str, k: int = 100):
    """Document-frequency / IDF table for the corpus vocabulary — the
    broadcastable scoring artifact (BM25 / TF-IDF stages ship THIS, not
    the corpus).  Per-batch distinct (term, doc) pairs pre-shrink the
    shuffle (a term repeated 50x in a doc ships once); one groupby counts
    df; top-k by (df desc, term) for determinism; idf = ln(N/df) computed
    from exact integers on both sides."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    def term_doc(b: pa.Table) -> pa.Table:
        terms, seen = [], set()
        for did, t in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            for w in set(_oracle_tokens(t)):
                if (w, did) not in seen:
                    seen.add((w, did))
                    terms.append(w)
        # per-batch the doc ids are distinct, so (term, doc) distinct ==
        # per-doc set(); only unique pairs leave the task
        return pa.table({"term": pa.array(terms, pa.string()),
                         "c": pa.array([1] * len(terms), pa.int64())})

    df_tbl = (
        docs.map_batches(term_doc, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="df"))
        # top-k cut runs DISTRIBUTED (sort+limit) — the vocabulary is
        # ~10^9 distinct tokens at web scale and never fits the driver
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    df_tbl["idf"] = [float(_r(np.log(n_docs / d), 6)) for d in df_tbl["df"]]
    return df_tbl.astype({"df": "int64"}).reset_index(drop=True)


SQL_QUERIES["df_idf_topk"] = q_df_idf_topk

ORACLE_SQL["df_idf_topk"] = """
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ),
    df AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term, df, round(ln(n_docs / df), 6) AS idf
    FROM df, n
    ORDER BY df DESC, term LIMIT 100
"""


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


SQL_QUERIES["label_centroid_distance"] = q_label_centroid_distance

ORACLE_SQL["label_centroid_distance"] = """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
    dims AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS j),
    comp AS (SELECT vec_id, label, j, x[j] AS v FROM e, dims),
    cent AS (SELECT label, j, avg(v) AS c FROM comp GROUP BY label, j),
    gcent AS (SELECT j, avg(v) AS g FROM comp GROUP BY j),
    cn AS (SELECT label, sqrt(sum(c * c)) AS cnv FROM cent GROUP BY label),
    gn AS (SELECT sqrt(sum(g * g)) AS gnv FROM gcent),
    dots AS (
        SELECT comp.vec_id, comp.label,
               sum(v * c) AS vc, sum(v * g) AS vg, sum(v * v) AS vv
        FROM comp
        JOIN cent ON comp.label = cent.label AND comp.j = cent.j
        JOIN gcent ON comp.j = gcent.j
        GROUP BY comp.vec_id, comp.label
    )
    SELECT d.label, count(*) AS n,
           round(avg(vc / (sqrt(vv) * cn.cnv)), 4) AS cos_own,
           round(avg(vg / (sqrt(vv) * gn.gnv)), 4) AS cos_glob
    FROM dots d JOIN cn ON d.label = cn.label CROSS JOIN gn
    GROUP BY d.label ORDER BY d.label
"""


def q_minhash_estimate_error(sf_dir: str):
    """Sketch-accuracy evaluation: per consecutive doc pair, the MinHash
    similarity ESTIMATE (fraction of agreeing signature positions, 64
    perms) against the EXACT token-set Jaccard, plus the signed error —
    the calibration table that justifies (or indicts) the LSH thresholds
    used by the dedup family.  One pair-shuffle does everything: each doc
    ships its signature + distinct-token set to its two pairs, and the
    per-pair group computes both numbers — the corpus itself never
    re-shuffles and no side is broadcast.  Assumes ≥3-token docs (the
    MinHash shingle domain; holds corpus-wide, pinned by the
    minhash_signatures oracle)."""
    from ..stages.dedup import MinHasher

    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    class EmitPair:
        def __init__(self):
            self.mh = MinHasher()

        def __call__(self, b: pa.Table) -> pa.Table:
            pair_ids, roles, sigs, toks = [], [], [], []
            for i, t in zip(
                b.column("doc_id").to_pylist(), b.column("text").to_pylist()
            ):
                sig = self.mh.signature(t).astype(np.int64)
                distinct = sorted(set(re.findall(r"\S+", t)))
                for pid, role in ((i, "a"), (i - 1, "b")):
                    if 0 <= pid < n_docs - 1:
                        pair_ids.append(pid)
                        roles.append(role)
                        sigs.append(sig.tolist())
                        toks.append(distinct)
            return pa.table(
                {
                    "pair_id": pa.array(pair_ids, pa.int64()),
                    "role": pa.array(roles, pa.string()),
                    "signature": pa.array(sigs, pa.list_(pa.int64())),
                    "tokens": pa.array(toks, pa.list_(pa.string())),
                }
            )

    def pair_stats(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "est": pa.array([], pa.float64()),
                "jaccard": pa.array([], pa.float64()),
                "err": pa.array([], pa.float64()),
            }
        )
        if g.num_rows != 2:
            return empty
        df = g.to_pandas().sort_values("role")
        sa = np.asarray(df["signature"].iloc[0], np.int64)
        sb = np.asarray(df["signature"].iloc[1], np.int64)
        est = float(_r((sa == sb).sum() / 64.0, 4))
        ta, tb = set(df["tokens"].iloc[0]), set(df["tokens"].iloc[1])
        jac = float(_r(len(ta & tb) / len(ta | tb), 4)) if (ta | tb) else 1.0
        pid = int(df["pair_id"].iloc[0])
        return pa.table(
            {
                "doc_a": pa.array([pid], pa.int64()),
                "doc_b": pa.array([pid + 1], pa.int64()),
                "est": pa.array([est], pa.float64()),
                "jaccard": pa.array([jac], pa.float64()),
                "err": pa.array([float(_r(est - jac, 4))], pa.float64()),
            }
        )

    return (
        docs.map_batches(EmitPair, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("pair_id")
        .map_groups(pair_stats, batch_format="pyarrow")
        .sort("doc_a")
    )


SQL_QUERIES["minhash_estimate_error"] = q_minhash_estimate_error


ORACLE_SQL["minhash_estimate_error"] = (
    "WITH sig AS (" + ORACLE_SQL["minhash_signatures"] + """),
    t AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
        FROM documents
    ),
    ex AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                     len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
        FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    ),
    est AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(sum(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END)
                     / 64.0, 4) AS est
        FROM sig a JOIN sig b
          ON b.doc_id = a.doc_id + 1 AND a.perm_id = b.perm_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, est, jaccard, round(est - jaccard, 4) AS err
    FROM est JOIN ex USING (doc_a, doc_b) ORDER BY doc_a
"""
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


SQL_QUERIES["retention_cohorts"] = q_retention_cohorts

ORACLE_SQL["retention_cohorts"] = """
    WITH f AS (SELECT user_id, min(ts) AS fts FROM events GROUP BY user_id),
    e AS (
        SELECT e.user_id,
               datediff('day', CAST(f.fts AS DATE), CAST(e.ts AS DATE))
                   AS day_offset,
               strftime(f.fts, '%Y-%m-%d') AS cohort
        FROM events e JOIN f USING (user_id)
    )
    SELECT cohort, CAST(day_offset AS BIGINT) AS day_offset,
           count(DISTINCT user_id) AS n_users
    FROM e GROUP BY cohort, day_offset ORDER BY cohort, day_offset
"""


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


SQL_QUERIES["event_runs"] = q_event_runs

ORACLE_SQL["event_runs"] = """
    WITH o AS (
        SELECT user_id, event_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rt
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, rn - rt AS grp, count(*) AS n_events,
               min(ts) AS start_ts, max(ts) AS end_ts, min(rn) AS first_rn
        FROM o GROUP BY user_id, event_type, rn - rt
    )
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY first_rn)
               AS run_idx,
           event_type, n_events,
           epoch_us(start_ts) AS start_us, epoch_us(end_ts) AS end_us
    FROM runs ORDER BY user_id, run_idx
"""


def q_recrawl_plan(sf_dir: str, per_host: int = 8):
    """Composed crawl-scheduler round plan: staleness-driven recrawl
    priorities (the recrawl_schedule estimator) cut to a per-host
    politeness budget — the table the frontier actually drains next
    round.  Hosts partition the ranked shuffle (one groupby); the
    per-host top-k runs inside the group with (staleness desc, page_id)
    ties pinned.  Assumption (documented, same as sessionize): one host's
    candidate set fits in a worker — at production scale swap in the
    bucketed two-pass rank pluck used by group_percentiles.  The SQL
    mirror nests the full recrawl_schedule oracle so the estimator
    cannot drift."""
    sched = q_recrawl_schedule(sf_dir)

    def hosted(b: pa.Table) -> pa.Table:
        pid = b.column("page_id").to_numpy()
        return pa.table(
            {
                "host": pa.array(
                    [f"site{int(p) % 10}.example" for p in pid], pa.string()
                ),
                "page_id": b.column("page_id"),
                "staleness": b.column("staleness"),
            }
        )

    ranked = sched.map_batches(hosted, batch_format="pyarrow")

    def topk(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df[df["staleness"].notna()]
        df = df.sort_values(
            ["staleness", "page_id"], ascending=[False, True]
        ).head(per_host)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["host", "page_id", "staleness", "rank"]], preserve_index=False
        )

    return (
        ranked.groupby("host")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["host", "rank"])
    )


SQL_QUERIES["recrawl_plan"] = q_recrawl_plan


ORACLE_SQL["recrawl_plan"] = (
    "WITH sched AS (" + ORACLE_SQL["recrawl_schedule"].replace("ORDER BY page_id", "") + """),
    hosted AS (
        SELECT 'site' || (page_id % 10) || '.example' AS host, page_id, staleness
        FROM sched WHERE staleness IS NOT NULL
    ),
    ranked AS (
        SELECT host, page_id, staleness,
               row_number() OVER (PARTITION BY host
                                  ORDER BY staleness DESC, page_id) AS rank
        FROM hosted
    )
    SELECT host, page_id, staleness, rank
    FROM ranked WHERE rank <= 8 ORDER BY host, rank
"""
)


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


SQL_QUERIES["mad_outliers"] = q_mad_outliers

ORACLE_SQL["mad_outliers"] = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) - 1 AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type,
               max(CASE WHEN r = CAST((n - 1) // 2 AS BIGINT)
                        THEN value END) AS med
        FROM ranked GROUP BY event_type
    ),
    devr AS (
        SELECT e.event_type, abs(e.value - m.med) AS d,
               row_number() OVER (PARTITION BY e.event_type
                                  ORDER BY abs(e.value - m.med), e.event_id)
                   - 1 AS r,
               count(*) OVER (PARTITION BY e.event_type) AS n
        FROM events e JOIN med m USING (event_type)
    ),
    madt AS (
        SELECT event_type,
               max(CASE WHEN r = CAST((n - 1) // 2 AS BIGINT)
                        THEN d END) AS mad
        FROM devr GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           round(any_value(m.med), 6) AS median,
           round(any_value(t.mad), 6) AS mad,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * t.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN med m USING (event_type) JOIN madt t USING (event_type)
    GROUP BY e.event_type ORDER BY event_type
"""


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


SQL_QUERIES["oov_rate"] = q_oov_rate

ORACLE_SQL["oov_rate"] = """
    WITH tok AS (
        SELECT lang, source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ),
    vocab AS (
        SELECT term FROM (
            SELECT term, count(*) AS c FROM tok GROUP BY term
        ) ORDER BY c DESC, term LIMIT 100
    )
    SELECT t.lang, t.source, count(*) AS tokens,
           CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS oov,
           round(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (term)
    GROUP BY t.lang, t.source ORDER BY t.lang, t.source
"""


def q_fuzzy_dedup_clusters(sf_dir: str, sim_threshold: float = 0.8):
    """End-to-end FUZZY dedup: fingerprint blocking → bounded edit-distance
    verification (levenshtein_verify) → similarity cut → distributed
    connected components → cluster labels.  The entity-resolution shape:
    cheap blocking proposes, exact verification confirms, transitive
    closure groups — three stages that each move only candidate-pair-sized
    data, never the corpus.  The SQL mirror nests the verification oracle
    verbatim and runs the same min-label closure as a recursive CTE."""
    from ..stages.dedup import connected_components

    pairs = q_levenshtein_verify(sf_dir)

    def cut(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column("sim"), pa.scalar(sim_threshold))
        return b.filter(keep).select(["doc_a", "doc_b"])

    edges = pairs.map_batches(cut, batch_format="pyarrow")
    return connected_components(edges).sort("doc_id")


SQL_QUERIES["fuzzy_dedup_clusters"] = q_fuzzy_dedup_clusters


ORACLE_SQL["fuzzy_dedup_clusters"] = (
    "WITH RECURSIVE lev AS (" + ORACLE_SQL["levenshtein_verify"].replace("ORDER BY doc_a, doc_b", "") + """),
    cut AS (SELECT doc_a, doc_b FROM lev WHERE sim >= 0.8),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM cut
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM cut
    ),
    reach(node, r) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
    )
    SELECT node AS doc_id, min(r) AS cluster_id
    FROM reach GROUP BY node ORDER BY doc_id
"""
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


SQL_QUERIES["quantile_sketch_error"] = q_quantile_sketch_error

ORACLE_SQL["quantile_sketch_error"] = """
    WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    b AS (
        SELECT e.event_type,
               least(CAST(floor((e.value - mm.lo)
                                / (CASE WHEN mm.hi > mm.lo
                                        THEN mm.hi - mm.lo ELSE 1 END)
                                * 64) AS BIGINT), 63) AS bkt
        FROM events e CROSS JOIN mm
    ),
    hc AS (SELECT event_type, bkt, count(*) AS c FROM b GROUP BY event_type, bkt),
    cum AS (
        SELECT event_type, bkt, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY bkt) AS cc,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM hc
    ),
    est AS (
        SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
               min(bkt) FILTER (cc > (n - 1) // 2) AS est_bkt
        FROM cum GROUP BY event_type
    ),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) - 1 AS r,
               count(*) OVER (PARTITION BY event_type) AS nn
        FROM events
    ),
    ex AS (
        SELECT event_type,
               max(CASE WHEN r = CAST((nn - 1) // 2 AS BIGINT)
                        THEN value END) AS exact_p50
        FROM ranked GROUP BY event_type
    )
    SELECT e.event_type, e.n,
           round(mm.lo + e.est_bkt * (CASE WHEN mm.hi > mm.lo
                                           THEN mm.hi - mm.lo ELSE 1 END)
                         / 64.0, 6) AS est_p50,
           round(x.exact_p50, 6) AS exact_p50,
           round((mm.lo + e.est_bkt * (CASE WHEN mm.hi > mm.lo
                                            THEN mm.hi - mm.lo ELSE 1 END)
                          / 64.0) - x.exact_p50, 6) AS err
    FROM est e JOIN ex x USING (event_type) CROSS JOIN mm
    ORDER BY e.event_type
"""


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


SQL_QUERIES["max_drawdown"] = q_max_drawdown

ORACLE_SQL["max_drawdown"] = """
    WITH w AS (
        SELECT user_id, value,
               max(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS runmax
        FROM events
    )
    SELECT user_id, count(*) AS n,
           round(max(runmax), 6) AS peak,
           round(max(runmax - value), 6) AS max_drawdown
    FROM w GROUP BY user_id ORDER BY user_id
"""


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


SQL_QUERIES["distinctive_terms"] = q_distinctive_terms

ORACLE_SQL["distinctive_terms"] = """
    WITH tok AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ),
    cells AS (SELECT source, term, count(*) AS y FROM tok GROUP BY source, term),
    gl AS (SELECT term, sum(y) AS yg FROM cells GROUP BY term),
    tot AS (SELECT sum(yg) AS ntot FROM gl),
    ps AS (SELECT source, sum(y) AS ns FROM cells GROUP BY source),
    z AS (
        SELECT c.source, c.term, c.y,
               round(
                 (ln((c.y + 100.0 * g.yg / t.ntot)
                     / (p.ns + 100.0 - c.y - 100.0 * g.yg / t.ntot))
                  - ln((g.yg - c.y + 100.0 * g.yg / t.ntot)
                       / (t.ntot - p.ns + 100.0 - (g.yg - c.y)
                          - 100.0 * g.yg / t.ntot)))
                 / sqrt(1.0 / (c.y + 100.0 * g.yg / t.ntot)
                        + 1.0 / (g.yg - c.y + 100.0 * g.yg / t.ntot)), 6)
                   AS z
        FROM cells c JOIN gl g USING (term) CROSS JOIN tot t
        JOIN ps p ON c.source = p.source
    ),
    ranked AS (
        SELECT source, term, y, z,
               row_number() OVER (PARTITION BY source
                                  ORDER BY z DESC, term) AS rank
        FROM z
    )
    SELECT source, term, CAST(y AS BIGINT) AS y, z, rank
    FROM ranked WHERE rank <= 10 ORDER BY source, rank
"""


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


SQL_QUERIES["ks_drift"] = q_ks_drift

ORACLE_SQL["ks_drift"] = """
    WITH sv AS (
        SELECT source, n_chars AS v, count(*) AS c
        FROM documents GROUP BY source, n_chars
    ),
    tot AS (SELECT source, sum(c) AS n FROM sv GROUP BY source),
    gv AS (SELECT v, sum(c) AS cg FROM sv GROUP BY v),
    gn AS (SELECT sum(cg) AS ng FROM gv),
    grid AS (
        SELECT t.source, g.v FROM (SELECT DISTINCT source FROM sv) t
        CROSS JOIN gv g
    ),
    own AS (
        SELECT gr.source, gr.v, coalesce(sv.c, 0) AS c
        FROM grid gr LEFT JOIN sv ON sv.source = gr.source AND sv.v = gr.v
    ),
    cum AS (
        SELECT o.source, o.v,
               sum(o.c) OVER (PARTITION BY o.source ORDER BY o.v) AS co,
               sum(g.cg) OVER (PARTITION BY o.source ORDER BY o.v) AS cumg
        FROM own o JOIN gv g USING (v)
    )
    SELECT c.source, CAST(any_value(t.n) AS BIGINT) AS n,
           round(max(abs(c.co * 1.0 / t.n
                         - (c.cumg - c.co) * 1.0 / (gn.ng - t.n))), 6) AS ks
    FROM cum c JOIN tot t USING (source) CROSS JOIN gn
    GROUP BY c.source ORDER BY c.source
"""


def q_tail_exponent(sf_dir: str, k: int = 100):
    """Hill estimator of the doc-length tail exponent — the heavy-tail
    diagnostic that decides whether mean-based capacity planning is even
    meaningful for a corpus (alpha <= 2: infinite variance, plan on
    quantiles).  Only the top-(k+1) order statistics are needed, cut by a
    DISTRIBUTED sort+limit (the corpus never sorts driver-side); the
    log-ratio fold runs over those k rows in rank order on both sides.
    alpha_hat = k / sum_{i<=k} ln(x_i / x_{k+1}), ties broken by doc_id."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    top = (
        docs.sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(k + 1)
        .to_pandas()
    )
    x = top["n_chars"].to_numpy().astype(np.float64)
    xk1 = x[k]
    s = 0.0
    for xi in x[:k]:  # rank order — matches sum(... ORDER BY rank)
        s += np.log(xi / xk1)
    alpha = k / s if s > 0 else float("nan")
    return pd.DataFrame(
        {
            "k": [k],
            "x_k1": [float(xk1)],
            "alpha": [float(_r(alpha, 6))],
        }
    ).astype({"k": "int64"})


SQL_QUERIES["tail_exponent"] = q_tail_exponent

ORACLE_SQL["tail_exponent"] = """
    WITH top AS (
        SELECT n_chars,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        FROM documents ORDER BY n_chars DESC, doc_id LIMIT 101
    ),
    xk AS (SELECT n_chars AS x_k1 FROM top WHERE r = 101),
    s AS (
        SELECT sum(ln(t.n_chars * 1.0 / xk.x_k1) ORDER BY t.r) AS lsum
        FROM top t CROSS JOIN xk WHERE t.r <= 100
    )
    SELECT CAST(100 AS BIGINT) AS k, CAST(xk.x_k1 AS DOUBLE) AS x_k1,
           round(CASE WHEN s.lsum > 0 THEN 100 / s.lsum ELSE NULL END, 6)
               AS alpha
    FROM s CROSS JOIN xk
"""


# ---------------------------------------------------------------------------
# r3 closing additions: regression / freshness / windows / soft-dedup /
# information-theoretic mix diagnostics / quality blending / collocations /
# full Lloyd k-means — each with an exact DuckDB mirror
# ---------------------------------------------------------------------------


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


SQL_QUERIES["ols_fit"] = q_ols_fit

ORACLE_SQL["ols_fit"] = """
    WITH m AS (
        SELECT l_returnflag AS g,
               sum(l_quantity) / count(*) AS mx,
               sum(l_extendedprice) / count(*) AS my
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT l.l_returnflag AS g, m.mx, m.my, count(*) AS n,
               sum((l_quantity - mx) * (l_quantity - mx)) AS sxx,
               sum((l_extendedprice - my) * (l_extendedprice - my)) AS syy,
               sum((l_quantity - mx) * (l_extendedprice - my)) AS sxy
        FROM lineitem l JOIN m ON l.l_returnflag = m.g
        GROUP BY 1, m.mx, m.my
    )
    SELECT g AS l_returnflag, n,
           round(sxy / sxx, 6) AS slope,
           round(my - (sxy / sxx) * mx, 6) AS intercept,
           round(sxy * sxy / (sxx * syy), 6) AS r2
    FROM c ORDER BY l_returnflag
"""


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


SQL_QUERIES["new_users_daily"] = q_new_users_daily

ORACLE_SQL["new_users_daily"] = """
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1),
    g AS (SELECT d, count(*) AS new_users FROM f GROUP BY d)
    SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users
    FROM g ORDER BY day
"""


def q_window_distinct_users(sf_dir: str):
    """Distinct users + event volume per tumbling hour (the rate-limiter /
    abuse-detection window shape: COUNT(DISTINCT) inside a time window).
    Distinct is exact without per-window sets: dedupe on (hour, user) with
    a combiner groupby, then a second combiner collapses each hour to
    (users=#rows, events=sum).  Only (hour, user) pairs shuffle — bounded
    by active users per hour, not events."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def keyed(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        hour = df["ts"].dt.strftime("%Y-%m-%d %H:00:00")
        part = pd.DataFrame({"hour": hour, "user_id": df["user_id"]}).groupby(
            ["hour", "user_id"], as_index=False
        ).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(part, preserve_index=False)

    pairs = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["hour", "user_id"])
        .sum("cnt")
    )

    def per_hour(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        part = df.groupby("hour", as_index=False).agg(
            users=("user_id", "size"), events=("sum(cnt)", "sum")
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    out = (
        pairs.map_batches(per_hour, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("users", alias_name="users"), Sum("events", alias_name="events"))
        .sort("hour")
        .to_pandas()
    )
    return out.astype({"users": "int64", "events": "int64"})


SQL_QUERIES["window_distinct_users"] = q_window_distinct_users

ORACLE_SQL["window_distinct_users"] = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           count(DISTINCT user_id) AS users,
           count(*) AS events
    FROM events GROUP BY 1 ORDER BY hour
"""


def q_softdedup_weights(sf_dir: str):
    """SoftDeDup-style duplicate down-weighting: instead of REMOVING
    near-duplicates, each doc gets sampling weight 1/|its fingerprint
    group| so duplicated content contributes once in expectation (the
    gentler alternative the remove-based dedup family can't express).
    One fingerprint-partitioned shuffle; groups emit their size back onto
    members.  Uses the curation pipeline's lede-4-token md5 fingerprint
    (whole-text hashes have zero collisions in this corpus)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(" ".join(_oracle_tokens(t)[:4]).encode("utf-8")).hexdigest()
            for t in b.column("text").to_pylist()
        ]
        return pa.table({"doc_id": b.column("doc_id"), "h": pa.array(h, pa.string())})

    def weights(g: pa.Table) -> pa.Table:
        sz = g.num_rows
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "fp_count": pa.array([sz] * sz, pa.int64()),
                "weight": pa.array([float(_r(1.0 / sz, 6))] * sz, pa.float64()),
            }
        )

    return (
        docs.map_batches(keyed, batch_format="pyarrow")
        .groupby("h")
        .map_groups(weights, batch_format="pyarrow")
        .sort("doc_id")
    )


SQL_QUERIES["softdedup_weights"] = q_softdedup_weights

ORACLE_SQL["softdedup_weights"] = r"""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(
                   (regexp_split_to_array(trim(text), '\s+'))[1:4], ' ')) AS h
        FROM documents
    ),
    sizes AS (SELECT h, count(*) AS sz FROM fp GROUP BY h)
    SELECT f.doc_id, s.sz AS fp_count, round(1.0 / s.sz, 6) AS weight
    FROM fp f JOIN sizes s USING (h) ORDER BY f.doc_id
"""


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


SQL_QUERIES["mi_lang_source"] = q_mi_lang_source

ORACLE_SQL["mi_lang_source"] = """
    WITH cells AS (
        SELECT lang, source, count(*)::DOUBLE AS c FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM cells),
    rl AS (SELECT lang, sum(c) AS cl FROM cells GROUP BY lang),
    cm AS (SELECT source, sum(c) AS cs FROM cells GROUP BY source),
    terms AS (
        SELECT cells.lang, cells.source,
               (c / n) * ln((c * n) / (cl * cs)) AS term
        FROM cells CROSS JOIN tot
        JOIN rl USING (lang) JOIN cm USING (source)
    )
    SELECT (SELECT count(*) FROM cells) AS n_cells,
           (SELECT CAST(n AS BIGINT) FROM tot) AS n_docs,
           round(sum(term ORDER BY lang, source), 9) AS mi_nats
    FROM terms
"""


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


SQL_QUERIES["quality_blend"] = q_quality_blend

ORACLE_SQL["quality_blend"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    ),
    b AS (
        SELECT d.doc_id,
               percent_rank() OVER (ORDER BY d.n_chars) AS p1,
               percent_rank() OVER (ORDER BY u.uniq) AS p2
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT doc_id, round(0.5 * p1 + 0.5 * p2, 6) AS blend,
           CASE WHEN round(0.5 * p1 + 0.5 * p2, 6) >= 0.5 THEN 1 ELSE 0 END AS keep
    FROM b ORDER BY doc_id
"""


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


SQL_QUERIES["skipgram_counts"] = q_skipgram_counts

ORACLE_SQL["skipgram_counts"] = r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(range(1, len(regexp_split_to_array(trim(text), '\s+')) + 1))
                   AS pos,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    )
    SELECT a.w AS w1, b.w AS w2, count(*) AS cnt
    FROM tok a JOIN tok b
      ON a.doc_id = b.doc_id AND (b.pos - a.pos) IN (1, 2)
    GROUP BY 1, 2
    ORDER BY cnt DESC, w1, w2 LIMIT 50
"""


def q_kmeans_lloyd(sf_dir: str, k: int = 4, iters: int = 2):
    """Full Lloyd k-means over the embedding corpus (q_kmeans_assign is the
    routing step; this is the iterative trainer, SQL-pinned like pagerank's
    unrolled mirror).  Per iteration: centroids broadcast once via
    ray.put, each batch computes its (n, k) distance argmin (first-min =
    smallest centroid id, the mirror's ORDER BY d, cid tie rule) and emits
    one k x (d+2) partial-sum row block, so a corpus pass moves O(k*d)
    per batch and nothing shuffles.  Centroid means are rounded 6dp each
    update — that makes the next iteration's assignment boundaries
    identical on both sides instead of 1-ulp-sensitive.  Embeddings are
    materialized once (pagerank's lesson: an un-materialized input re-runs
    the upstream read every iteration).  Returns the final (cluster, dim,
    c) centroid table; empty clusters drop, as in the mirror."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    init = sorted(
        emb.filter(expr=f"vec_id < {int(k)}").take_all(), key=lambda r: r["vec_id"]
    )
    C = np.array([r["embedding"] for r in init], np.float64)
    cids = list(range(len(init)))

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(b: pa.Table, _ref=c_ref) -> pa.Table:
            C_ = ray.get(_ref)
            X = _emb_matrix(b)
            d2 = ((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)
            j = d2.argmin(axis=1)  # first min = smallest centroid index/id
            rows = []
            for ci in range(C_.shape[0]):
                m = j == ci
                if m.any():
                    s = X[m].sum(axis=0)
                    rows.append(
                        {"ci": ci, "n": int(m.sum()), **{f"s{d}": float(s[d]) for d in range(X.shape[1])}}
                    )
            return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

        parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
        agg = parts.groupby("ci", as_index=False).sum().sort_values("ci")
        dim = C.shape[1]
        new_cids, new_C = [], []
        for _, r in agg.iterrows():
            mean = np.array([r[f"s{d}"] for d in range(dim)]) / r["n"]
            new_cids.append(cids[int(r["ci"])])
            new_C.append(_r(mean, 6))
        cids, C = new_cids, np.array(new_C, np.float64)

    rows = []
    for i, cid in enumerate(cids):
        for d in range(C.shape[1]):
            rows.append({"cluster": int(cid), "dim": d + 1, "c": float(C[i, d])})
    return pd.DataFrame(rows)


SQL_QUERIES["kmeans_lloyd"] = q_kmeans_lloyd

ORACLE_SQL["kmeans_lloyd"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    c0 AS (SELECT vec_id AS cid, x AS cx FROM e WHERE vec_id < 4),
    d AS (
        SELECT vec_id,
               unnest(range(1, len(x) + 1)) AS dim,
               unnest(x) AS v
        FROM e
    ),
    a1 AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_distance(e.x, c.cx), c.cid) AS rn
            FROM e CROSS JOIN c0 c
        ) WHERE rn = 1
    ),
    u1 AS (
        SELECT a1.cid, d.dim, round(sum(d.v) / count(*), 6) AS cv
        FROM d JOIN a1 USING (vec_id) GROUP BY 1, 2
    ),
    c1 AS (SELECT cid, list(cv ORDER BY dim) AS cx FROM u1 GROUP BY cid),
    a2 AS (
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_distance(e.x, c.cx), c.cid) AS rn
            FROM e CROSS JOIN c1 c
        ) WHERE rn = 1
    ),
    u2 AS (
        SELECT a2.cid, d.dim, round(sum(d.v) / count(*), 6) AS cv
        FROM d JOIN a2 USING (vec_id) GROUP BY 1, 2
    )
    SELECT cid AS cluster, dim, cv AS c FROM u2 ORDER BY cluster, dim
"""


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


SQL_QUERIES["welch_ttest"] = q_welch_ttest

ORACLE_SQL["welch_ttest"] = """
    WITH m AS (
        SELECT event_type, user_id % 2 AS g,
               count(*) AS n, sum(value) / count(*) AS mu
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT e.event_type, e.user_id % 2 AS g,
               sum((e.value - m.mu) * (e.value - m.mu)) AS ss
        FROM events e JOIN m ON e.event_type = m.event_type AND e.user_id % 2 = m.g
        GROUP BY 1, 2
    ),
    p AS (
        SELECT m.event_type,
               max(CASE WHEN m.g = 0 THEN m.n END) AS n_a,
               max(CASE WHEN m.g = 1 THEN m.n END) AS n_b,
               max(CASE WHEN m.g = 0 THEN m.mu END) AS mu_a,
               max(CASE WHEN m.g = 1 THEN m.mu END) AS mu_b,
               max(CASE WHEN m.g = 0 THEN c.ss END) AS ss_a,
               max(CASE WHEN m.g = 1 THEN c.ss END) AS ss_b
        FROM m JOIN c ON m.event_type = c.event_type AND m.g = c.g
        GROUP BY m.event_type
    ),
    v AS (
        SELECT event_type, n_a, n_b, mu_a, mu_b,
               CASE WHEN n_a > 1 THEN ss_a / (n_a - 1) END AS va,
               CASE WHEN n_b > 1 THEN ss_b / (n_b - 1) END AS vb
        FROM p
    ),
    w AS (
        SELECT event_type, n_a, n_b,
               (mu_a - mu_b) / sqrt(va / n_a + vb / n_b) AS t,
               (va / n_a + vb / n_b) * (va / n_a + vb / n_b)
                   / ((va / n_a) * (va / n_a) / (n_a - 1)
                      + (vb / n_b) * (vb / n_b) / (n_b - 1)) AS df
        FROM v
    )
    SELECT event_type, n_a, n_b, round(t, 6) AS t, round(df, 4) AS df
    FROM w ORDER BY event_type
"""


def q_topic_purity(sf_dir: str, k: int = 8):
    """Cluster-vs-label purity (clustering-quality dashboard): route every
    embedding to its nearest of the first k vectors (q_kmeans_assign's
    broadcast argmin), then per cluster report size and majority-label
    share.  Only (cluster, label, count) cells shuffle — the contingency
    combiner again; the majority pick (count desc, label asc) is the same
    deterministic tie rule as the mirror's row_number."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    cent_rows = sorted(
        emb.filter(expr=f"vec_id < {int(k)}").take_all(), key=lambda r: r["vec_id"]
    )
    C = np.array([r["embedding"] for r in cent_rows], np.float64)
    c_ref = ray.put(C)

    def cells(b: pa.Table) -> pa.Table:
        C_ = ray.get(c_ref)
        X = _emb_matrix(b)
        d2 = ((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)
        j = d2.argmin(axis=1)
        part = pd.DataFrame(
            {"cluster": j.astype(np.int64), "label": b.column("label").to_numpy()}
        ).groupby(["cluster", "label"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    cc = (
        emb.map_batches(cells, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .sum("cnt")
        .to_pandas()
        .rename(columns={"sum(cnt)": "cnt"})
    )
    rows = []
    for cl, grp in cc.groupby("cluster"):
        n = int(grp["cnt"].sum())
        top = grp.sort_values(["cnt", "label"], ascending=[False, True]).iloc[0]
        rows.append(
            {
                "cluster": int(cl),
                "n": n,
                "top_label": int(top["label"]),
                "purity": float(_r(int(top["cnt"]) / n, 6)),
            }
        )
    return pd.DataFrame(rows).sort_values("cluster").reset_index(drop=True)


SQL_QUERIES["topic_purity"] = q_topic_purity

ORACLE_SQL["topic_purity"] = """
    WITH c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx FROM embeddings WHERE vec_id < 8
    ),
    a AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_distance(e.embedding::DOUBLE[], c.cx),
                                               c.cid) AS rn
            FROM embeddings e CROSS JOIN c
        ) WHERE rn = 1
    ),
    cells AS (
        SELECT a.cluster, emb.label, count(*) AS cnt
        FROM a JOIN embeddings emb USING (vec_id) GROUP BY 1, 2
    ),
    tot AS (SELECT cluster, sum(cnt) AS n FROM cells GROUP BY cluster),
    top AS (
        SELECT cluster, label, cnt,
               row_number() OVER (PARTITION BY cluster ORDER BY cnt DESC, label) AS rn
        FROM cells
    )
    SELECT t.cluster, CAST(tot.n AS BIGINT) AS n, t.label AS top_label,
           round(t.cnt / tot.n, 6) AS purity
    FROM top t JOIN tot USING (cluster) WHERE t.rn = 1 ORDER BY t.cluster
"""


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


SQL_QUERIES["silhouette_simplified"] = q_silhouette_simplified

ORACLE_SQL["silhouette_simplified"] = """
    WITH c AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx FROM embeddings WHERE vec_id < 8
    ),
    d AS (
        SELECT e.vec_id, c.cid,
               list_distance(e.embedding::DOUBLE[], c.cx) AS d,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.embedding::DOUBLE[], c.cx),
                                           c.cid) AS rn
        FROM embeddings e CROSS JOIN c
    ),
    ab AS (
        SELECT vec_id,
               max(CASE WHEN rn = 1 THEN cid END) AS cluster,
               max(CASE WHEN rn = 1 THEN d END) AS a,
               max(CASE WHEN rn = 2 THEN d END) AS b
        FROM d GROUP BY vec_id
    ),
    s AS (
        SELECT cluster,
               CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b) END AS s
        FROM ab
    )
    SELECT cluster, count(*) AS n, round(sum(s) / count(*), 6) AS mean_silhouette
    FROM s GROUP BY cluster ORDER BY cluster
"""


def q_lsh_bucket_histogram(sf_dir: str):
    """MinHash-LSH bucket-size histogram — the load-balance diagnostic for
    the dedup family's known scale edge (a degenerate bucket is what the
    segment cap in stages/dedup.py exists for; this query is how you SEE
    one coming).  Bands/buckets are the exact production construction
    (MinHasher -> MinHashBands); only (band, bucket) group sizes then
    (size, count) cells shuffle."""
    from ..stages.dedup import MinHashBands, MinHasher

    bands = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(_cached_stage(MinHasher), batch_format="pyarrow")
        .map_batches(_cached_stage(MinHashBands), batch_format="pyarrow")
    )

    def size_of_group(g: pa.Table) -> pa.Table:
        return pa.table({"sz": pa.array([g.num_rows], pa.int64())})

    def cnt(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("sz", as_index=False).size().rename(
            columns={"size": "n_buckets"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        bands.groupby(["band_id", "bucket"])
        .map_groups(size_of_group, batch_format="pyarrow")
        .map_batches(cnt, batch_format="pyarrow")
        .groupby("sz")
        .sum("n_buckets")
        .sort("sz")
        .to_pandas()
        .rename(columns={"sz": "bucket_size", "sum(n_buckets)": "n_buckets"})
    )
    return out.astype({"bucket_size": "int64", "n_buckets": "int64"})


SQL_QUERIES["lsh_bucket_histogram"] = q_lsh_bucket_histogram


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


SQL_QUERIES["rate_limit_offenders"] = q_rate_limit_offenders

ORACLE_SQL["rate_limit_offenders"] = """
    WITH h AS (
        SELECT user_id, date_trunc('hour', ts) AS hh, count(*) AS cnt
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, max(cnt) AS peak_hourly, CAST(sum(cnt) AS BIGINT) AS total_events
    FROM h GROUP BY user_id HAVING max(cnt) >= 2 ORDER BY user_id
"""


ORACLE_SQL["lsh_bucket_histogram"] = (
    f"WITH {_minhash_sig_cte()},\n"
    r"""        band AS (
            SELECT doc_id, CAST(perm_id // 4 AS INT) AS band_id,
                   md5_number_lower(string_agg(minhash::VARCHAR, '|' ORDER BY perm_id)) AS bucket
            FROM sig GROUP BY doc_id, CAST(perm_id // 4 AS INT)
        ),
        sizes AS (
            SELECT band_id, bucket, count(*) AS sz FROM band GROUP BY 1, 2
        )
        SELECT sz AS bucket_size, count(*) AS n_buckets
        FROM sizes GROUP BY sz ORDER BY bucket_size"""
)


def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the events link graph — Pearson correlation
    of endpoint degrees across edges, the one-number summary of whether
    hubs link to hubs (assortative webs shard very differently from
    disassortative ones).  Degrees come from q_node_degree's distinct-
    neighbour reduction (a 50-row broadcast here; a hash-partitioned
    degree table at web scale); edges then stream twice through the same
    centered two-pass as q_corr_matrix.  Self-loops drop, as in the
    degree definition."""
    deg_map = {
        r["node"]: float(r["degree"]) for r in q_node_degree(sf_dir).take_all()
    }
    d_ref = ray.put(deg_map)
    edges = _events_edges(sf_dir)

    def xy(b: pa.Table):
        dm = ray.get(d_ref)
        # dense id->degree vector: endpoint lookups stay vectorized
        lut = np.zeros(max(dm) + 1, np.float64)
        for node, d in dm.items():
            lut[node] = d
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        keep = src != dst
        return lut[src[keep]], lut[dst[keep]]

    def sums(b: pa.Table) -> pa.Table:
        x, y = xy(b)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "sy": pa.array([float(y.sum())], pa.float64()),
            }
        )

    tot = edges.map_batches(sums, batch_format="pyarrow").sum(["n", "sx", "sy"])
    n = tot["sum(n)"]
    mx, my = tot["sum(sx)"] / n, tot["sum(sy)"] / n

    def centered(b: pa.Table) -> pa.Table:
        x, y = xy(b)
        dx, dy = x - mx, y - my
        return pa.table(
            {
                "sxx": pa.array([float((dx * dx).sum())], pa.float64()),
                "syy": pa.array([float((dy * dy).sum())], pa.float64()),
                "sxy": pa.array([float((dx * dy).sum())], pa.float64()),
            }
        )

    cs = edges.map_batches(centered, batch_format="pyarrow").sum(["sxx", "syy", "sxy"])
    denom = np.sqrt(cs["sum(sxx)"] * cs["sum(syy)"])
    r = cs["sum(sxy)"] / denom if denom else np.nan
    return pd.DataFrame({"n_edges": [int(n)], "assortativity": [float(_r(r, 6))]})


SQL_QUERIES["degree_assortativity"] = q_degree_assortativity

ORACLE_SQL["degree_assortativity"] = f"""
    WITH edges AS ({EDGES_SQL}),
    deg AS (
        SELECT node, count(*) AS degree FROM (
            SELECT DISTINCT node, neighbor FROM (
                SELECT src AS node, dst AS neighbor FROM edges WHERE src <> dst
                UNION ALL
                SELECT dst AS node, src AS neighbor FROM edges WHERE src <> dst
            )
        ) GROUP BY node
    ),
    pairs AS (
        SELECT da.degree::DOUBLE AS x, db.degree::DOUBLE AS y
        FROM edges e
        JOIN deg da ON e.src = da.node
        JOIN deg db ON e.dst = db.node
        WHERE e.src <> e.dst
    ),
    m AS (
        SELECT count(*) AS n, sum(x) / count(*) AS mx, sum(y) / count(*) AS my
        FROM pairs
    ),
    c AS (
        SELECT sum((x - mx) * (x - mx)) AS sxx,
               sum((y - my) * (y - my)) AS syy,
               sum((x - mx) * (y - my)) AS sxy
        FROM pairs CROSS JOIN m
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_edges,
           round(sxy / sqrt(sxx * syy), 6) AS assortativity
    FROM c
"""


def q_session_stats(sf_dir: str):
    """Session-length distribution (how many sessions of each event count,
    and their mean duration) — the reporting layer over q_sessionize,
    consumed as a composition: the session Dataset streams through one
    more combiner, so histogram cells — not sessions — shuffle.  Duration
    summed in exact integer microseconds; the mean divides once at the
    end in the mirror's order."""
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


SQL_QUERIES["session_stats"] = q_session_stats


def q_redirect_depth_histogram(sf_dir: str):
    """Redirect-chain depth distribution — the crawl-health dashboard over
    q_redirect_resolve's pointer-jumped output (composition: the resolved
    Dataset streams through a count combiner; the mirror states the
    closed-form chain construction, so the histogram checks the WHOLE
    log-step resolution end to end)."""
    res = q_redirect_resolve(sf_dir)

    def cnt(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("hops", as_index=False).size().rename(
            columns={"size": "n_urls"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        res.map_batches(cnt, batch_format="pyarrow")
        .groupby("hops")
        .sum("n_urls")
        .sort("hops")
        .to_pandas()
        .rename(columns={"sum(n_urls)": "n_urls"})
    )
    return out.astype({"hops": "int64", "n_urls": "int64"})


SQL_QUERIES["redirect_depth_histogram"] = q_redirect_depth_histogram

ORACLE_SQL["redirect_depth_histogram"] = """
    SELECT doc_id % 7 AS hops, count(*) AS n_urls
    FROM documents GROUP BY 1 ORDER BY hops
"""


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


SQL_QUERIES["quality_token_tradeoff"] = q_quality_token_tradeoff

ORACLE_SQL["quality_token_tradeoff"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq,
               count(*) AS n_tok
        FROM t GROUP BY doc_id
    ),
    b AS (
        SELECT d.doc_id, u.n_tok,
               round(0.5 * percent_rank() OVER (ORDER BY d.n_chars)
                     + 0.5 * percent_rank() OVER (ORDER BY u.uniq), 6) AS blend
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT least(CAST(floor(blend * 10) AS BIGINT), 9) AS decile,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM b GROUP BY 1 ORDER BY decile
"""


ORACLE_SQL["session_stats"] = """
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM o
    ),
    sess AS (
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id
    )
    SELECT n_events, count(*) AS n_sessions,
           round((CAST(sum(date_diff('microsecond', session_start, session_end))
                       AS DOUBLE) / count(*)) / 1000000.0, 6) AS mean_duration_s
    FROM sess GROUP BY n_events ORDER BY n_events
"""


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


def _count_distinct_users(ut) -> float:
    """Distinct users from the deduped (user, type) Dataset: one user-keyed
    count groupby, then a row count — no user list ever reaches the
    driver."""
    return float(ut.groupby("user_id").count().count())


SQL_QUERIES["association_rules"] = q_association_rules

ORACLE_SQL["association_rules"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id)::DOUBLE AS nu FROM events),
    tc AS (SELECT event_type, count(*)::DOUBLE AS c FROM ut GROUP BY 1),
    p AS (
        SELECT a.event_type AS t_a, b.event_type AS t_b, count(*)::DOUBLE AS c
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT t_a, t_b, CAST(p.c AS BIGINT) AS n_both,
           round(p.c / nu, 6) AS support,
           round(p.c / ca.c, 6) AS confidence,
           round((p.c * nu) / (ca.c * cb.c), 6) AS lift
    FROM p CROSS JOIN n
    JOIN tc ca ON ca.event_type = p.t_a
    JOIN tc cb ON cb.event_type = p.t_b
    ORDER BY t_a, t_b
"""


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


SQL_QUERIES["trimmed_mean"] = q_trimmed_mean

ORACLE_SQL["trimmed_mean"] = """
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(sum(value) / count(*), 6) AS trimmed_mean
    FROM ranked
    WHERE r > floor(0.05 * n) AND r <= n - floor(0.05 * n)
    GROUP BY event_type ORDER BY event_type
"""


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


SQL_QUERIES["quality_grid"] = q_quality_grid

ORACLE_SQL["quality_grid"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    )
    SELECT least(d.n_chars // 100, 9) AS len_bin,
           least(CAST(floor(u.uniq * 10) AS BIGINT), 9) AS uniq_bin,
           count(*) AS n_docs
    FROM documents d JOIN u USING (doc_id)
    GROUP BY 1, 2 ORDER BY len_bin, uniq_bin
"""


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


SQL_QUERIES["stationary_distribution"] = q_stationary_distribution

ORACLE_SQL["stationary_distribution"] = """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    cells AS (
        SELECT event_type AS from_type, nxt AS to_type, count(*) AS cnt
        FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    ),
    tot AS (SELECT from_type, sum(cnt) AS n FROM cells GROUP BY from_type),
    p AS (
        SELECT c.from_type, c.to_type, round(c.cnt / t.n, 6) AS p
        FROM cells c JOIN tot t USING (from_type)
    ),
    k AS (SELECT count(DISTINCT event_type)::DOUBLE AS k FROM events),
    v0 AS (
        SELECT event_type, 1.0 / k.k AS v
        FROM (SELECT DISTINCT from_type AS event_type FROM p
              UNION SELECT DISTINCT to_type FROM p) CROSS JOIN k
    ),
    v1 AS (
        SELECT p.to_type AS event_type, sum(v0.v * p.p ORDER BY p.from_type) AS v
        FROM v0 JOIN p ON v0.event_type = p.from_type GROUP BY p.to_type
    ),
    v2 AS (
        SELECT p.to_type AS event_type, sum(v1.v * p.p ORDER BY p.from_type) AS v
        FROM v1 JOIN p ON v1.event_type = p.from_type GROUP BY p.to_type
    ),
    v3 AS (
        SELECT p.to_type AS event_type, sum(v2.v * p.p ORDER BY p.from_type) AS v
        FROM v2 JOIN p ON v2.event_type = p.from_type GROUP BY p.to_type
    )
    SELECT event_type, round(v, 9) AS v FROM v3 ORDER BY event_type
"""


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


SQL_QUERIES["ipf_raking"] = q_ipf_raking

ORACLE_SQL["ipf_raking"] = """
    WITH cells AS (
        SELECT lang, source, count(*)::DOUBLE AS w FROM documents GROUP BY 1, 2
    ),
    tgt AS (
        SELECT (SELECT count(*)::DOUBLE FROM documents)
                   / (SELECT count(DISTINCT lang)::DOUBLE FROM documents) AS rt,
               (SELECT count(*)::DOUBLE FROM documents)
                   / (SELECT count(DISTINCT source)::DOUBLE FROM documents) AS ct
    ),
    rs1 AS (SELECT lang, sum(w ORDER BY source) AS s FROM cells GROUP BY lang),
    r1 AS (
        SELECT c.lang, c.source, c.w * (tgt.rt / rs1.s) AS w
        FROM cells c JOIN rs1 USING (lang) CROSS JOIN tgt
    ),
    cs1 AS (SELECT source, sum(w ORDER BY lang) AS s FROM r1 GROUP BY source),
    c1 AS (
        SELECT r.lang, r.source, r.w * (tgt.ct / cs1.s) AS w
        FROM r1 r JOIN cs1 USING (source) CROSS JOIN tgt
    ),
    rs2 AS (SELECT lang, sum(w ORDER BY source) AS s FROM c1 GROUP BY lang),
    r2 AS (
        SELECT c.lang, c.source, c.w * (tgt.rt / rs2.s) AS w
        FROM c1 c JOIN rs2 USING (lang) CROSS JOIN tgt
    ),
    cs2 AS (SELECT source, sum(w ORDER BY lang) AS s FROM r2 GROUP BY source),
    c2 AS (
        SELECT r.lang, r.source, r.w * (tgt.ct / cs2.s) AS w
        FROM r2 r JOIN cs2 USING (source) CROSS JOIN tgt
    )
    SELECT lang, source, round(w, 6) AS weight FROM c2 ORDER BY lang, source
"""


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


SQL_QUERIES["rrf_fusion"] = q_rrf_fusion

ORACLE_SQL["rrf_fusion"] = r"""
    WITH t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    ),
    r AS (
        SELECT d.doc_id,
               row_number() OVER (ORDER BY d.n_chars DESC, d.doc_id) AS r1,
               row_number() OVER (ORDER BY u.uniq DESC, d.doc_id) AS r2
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT doc_id, r1, r2,
           round(1.0 / (60 + r1) + 1.0 / (60 + r2), 9) AS rrf
    FROM r ORDER BY rrf DESC, doc_id LIMIT 100
"""


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


SQL_QUERIES["chi2_lang_source"] = q_chi2_lang_source

ORACLE_SQL["chi2_lang_source"] = """
    WITH cells AS (
        SELECT lang, source, count(*)::DOUBLE AS c FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM cells),
    rl AS (SELECT lang, sum(c) AS cl FROM cells GROUP BY lang),
    cm AS (SELECT source, sum(c) AS cs FROM cells GROUP BY source),
    terms AS (
        SELECT cells.lang, cells.source,
               (c - cl * cs / n) * (c - cl * cs / n) / (cl * cs / n) AS term
        FROM cells CROSS JOIN tot
        JOIN rl USING (lang) JOIN cm USING (source)
    )
    SELECT (SELECT count(*) FROM cells) AS n_cells,
           (SELECT CAST((count(DISTINCT lang) - 1)
                        * (count(DISTINCT source) - 1) AS BIGINT)
            FROM documents) AS dof,
           round(sum(term ORDER BY lang, source), 6) AS chi2
    FROM terms
"""


def q_clustering_coefficient(sf_dir: str):
    """Per-node local clustering coefficient (triangles / wedges — how
    clique-ish each node's neighborhood is; the transitivity dashboard
    over the same events graph as the motif family).  Composes the
    distributed triangle counter with the wedge table through the
    partitioned hash_join (left join: triangle-less nodes keep cc = 0);
    nothing new materializes driver-side."""
    from ..stages.joins import hash_join

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


SQL_QUERIES["clustering_coefficient"] = q_clustering_coefficient

ORACLE_SQL["clustering_coefficient"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT src AS node, dst AS neighbor FROM e WHERE src <> dst
        UNION ALL
        SELECT dst AS node, src AS neighbor FROM e WHERE src <> dst
    ),
    deg AS (SELECT node, count(DISTINCT neighbor) AS d FROM und GROUP BY node),
    w AS (SELECT node, d * (d - 1) // 2 AS wedges FROM deg),
    ue AS (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM e WHERE src <> dst
    ),
    tri AS (
        SELECT a.u AS x, a.v AS y, b.v AS z
        FROM ue a
        JOIN ue b ON b.u = a.v
        JOIN ue c ON c.u = a.u AND c.v = b.v
    ),
    t AS (
        SELECT node, count(*) AS triangles
        FROM (SELECT unnest([x, y, z]) AS node FROM tri) GROUP BY node
    )
    SELECT w.node, w.wedges, coalesce(t.triangles, 0) AS triangles,
           round(coalesce(t.triangles, 0) / w.wedges, 6) AS clustering
    FROM w LEFT JOIN t USING (node)
    WHERE w.wedges > 0 ORDER BY w.node
"""


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


SQL_QUERIES["score_calibration"] = q_score_calibration

ORACLE_SQL["score_calibration"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"] + r"""),
    t AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
    ),
    u AS (
        SELECT doc_id, count(DISTINCT w) / count(*)::DOUBLE AS uniq
        FROM t GROUP BY doc_id
    ),
    b AS (
        SELECT d.doc_id,
               round(0.5 * percent_rank() OVER (ORDER BY d.n_chars)
                     + 0.5 * percent_rank() OVER (ORDER BY u.uniq), 6) AS blend
        FROM documents d JOIN u USING (doc_id)
    )
    SELECT least(CAST(floor(b.blend * 10) AS BIGINT), 9) AS decile,
           CAST(sum(gq.keep) AS BIGINT) AS keeps,
           count(*) AS n,
           round(sum(gq.keep) / count(*), 6) AS keep_rate
    FROM b JOIN gq USING (doc_id)
    GROUP BY 1 ORDER BY decile
"""
)


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


SQL_QUERIES["anova_f"] = q_anova_f

ORACLE_SQL["anova_f"] = """
    WITH g AS (
        SELECT lang, count(*) AS n, sum(n_chars) / count(*) AS mu
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT sum(n)::DOUBLE AS n, count(*) AS k,
               (SELECT sum(n_chars)::DOUBLE FROM documents) / sum(n)::DOUBLE
                   AS grand
        FROM g
    ),
    w AS (
        SELECT sum((d.n_chars - g.mu) * (d.n_chars - g.mu)) AS ssw
        FROM documents d JOIN g USING (lang)
    ),
    b AS (
        SELECT sum(g.n * (g.mu - tot.grand) * (g.mu - tot.grand)
                   ORDER BY g.lang) AS ssb
        FROM g CROSS JOIN tot
    )
    SELECT tot.k, CAST(tot.n AS BIGINT) AS n,
           round(b.ssb, 4) AS ssb, round(w.ssw, 4) AS ssw,
           round((b.ssb / (tot.k - 1)) / (w.ssw / (tot.n - tot.k)), 6) AS f
    FROM tot CROSS JOIN w CROSS JOIN b
"""


def q_avg_path_length(sf_dir: str, max_depth: int = 3):
    """Average shortest-path length from 5 sample sources (nodes 0-4) over
    the events graph, BFS-bounded at depth 3 — the small-world /
    reachability probe a crawler uses to size its frontier horizon.  All
    sources advance together: each hop is ONE streaming pass that filters
    edges against the broadcast per-source frontiers (the q_bfs_reachable
    wave, widened); only frontier node-id sets live on the driver, one
    per source."""
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
    sources = [0, 1, 2, 3, 4]
    dist_of = {s: {s: 0} for s in sources}
    frontier = {s: {s} for s in sources}
    for depth in range(1, max_depth + 1):
        fr = {s: pa.array(sorted(f), pa.int64()) for s, f in frontier.items() if f}
        if not fr:
            break

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

    rows = []
    for s in sources:
        d = {k: v for k, v in dist_of[s].items() if k != s}
        rows.append(
            {
                "src": s,
                "n_reached": len(d),
                "avg_dist": float(_r(sum(d.values()) / len(d), 6)) if d else np.nan,
            }
        )
    return pd.DataFrame(rows)


SQL_QUERIES["avg_path_length"] = q_avg_path_length

ORACLE_SQL["avg_path_length"] = """
    WITH RECURSIVE e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    adj AS (
        SELECT src AS a, dst AS b FROM e WHERE src <> dst
        UNION
        SELECT dst, src FROM e WHERE src <> dst
    ),
    bfs AS (
        SELECT s AS src, s AS node, 0 AS dist
        FROM (SELECT unnest([0, 1, 2, 3, 4]) AS s)
        UNION
        SELECT bfs.src, adj.b, bfs.dist + 1
        FROM bfs JOIN adj ON adj.a = bfs.node
        WHERE bfs.dist < 3
    ),
    md AS (SELECT src, node, min(dist) AS dist FROM bfs GROUP BY src, node)
    SELECT src, count(*) AS n_reached,
           round(sum(dist)::DOUBLE / count(*), 6) AS avg_dist
    FROM md WHERE node <> src GROUP BY src ORDER BY src
"""


def q_lsh_recall_curve(sf_dir: str):
    """Expected LSH candidate probability per document pair under the
    production banding (16 bands x 4 rows): p = 1 - (1 - j^4)^16 over the
    exact consecutive-pair Jaccards — the parameter-planning table that
    says which true similarity levels the dedup pass will actually
    surface.  Composes q_jaccard_pairs; the S-curve is evaluated with the
    same explicit multiply/squaring chain as the mirror (no pow()), so
    both sides walk identical float ops off the 4dp-pinned jaccard."""
    pairs = q_jaccard_pairs(sf_dir)

    def curve(b: pa.Table) -> pa.Table:
        j = b.column("jaccard").to_numpy()
        t = j * j * j * j  # j^4
        q = 1.0 - t
        q2 = q * q
        q4 = q2 * q2
        q8 = q4 * q4
        q16 = q8 * q8
        p = _r(1.0 - q16, 6)
        return b.append_column("p_candidate", pa.array(p, pa.float64()))

    return pairs.map_batches(curve, batch_format="pyarrow")


SQL_QUERIES["lsh_recall_curve"] = q_lsh_recall_curve

ORACLE_SQL["lsh_recall_curve"] = (
    "WITH jp AS (" + ORACLE_SQL["jaccard_pairs"] + """),
    c AS (
        SELECT doc_a, doc_b, jaccard,
               1.0 - (jaccard * jaccard * jaccard * jaccard) AS q
        FROM jp
    ),
    c2 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c),
    c4 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c2),
    c8 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c4),
    c16 AS (SELECT doc_a, doc_b, jaccard, q * q AS q FROM c8)
    SELECT doc_a, doc_b, jaccard, round(1.0 - q, 6) AS p_candidate
    FROM c16 ORDER BY doc_a
"""
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


SQL_QUERIES["trigram_transitions"] = q_trigram_transitions

ORACLE_SQL["trigram_transitions"] = """
    WITH seq AS (
        SELECT user_id, event_type AS t1,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, count(*) AS cnt
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY cnt DESC, t1, t2, t3 LIMIT 25
"""


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


SQL_QUERIES["decayed_user_scores"] = q_decayed_user_scores

ORACLE_SQL["decayed_user_scores"] = """
    WITH h AS (SELECT max(ts) AS horizon FROM events),
    d AS (
        SELECT user_id,
               value * exp(ln(2.0) * (-(date_diff('microsecond', ts, h.horizon)
                                        / 86400000000.0) / 7.0)) AS s
        FROM events CROSS JOIN h
    )
    SELECT user_id, round(sum(s), 6) AS score
    FROM d GROUP BY user_id
    ORDER BY score DESC, user_id LIMIT 100
"""


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


SQL_QUERIES["touch_attribution"] = q_touch_attribution

ORACLE_SQL["touch_attribution"] = """
    WITH u AS (
        SELECT user_id,
               first(event_type ORDER BY ts, event_id) AS first_type,
               last(event_type ORDER BY ts, event_id) AS last_type,
               sum(CAST(round(value, 2) * 100 AS BIGINT)) AS cents
        FROM events GROUP BY user_id
    ),
    f AS (SELECT first_type AS event_type, sum(cents) AS fc FROM u GROUP BY 1),
    l AS (SELECT last_type AS event_type, sum(cents) AS lc FROM u GROUP BY 1)
    SELECT coalesce(f.event_type, l.event_type) AS event_type,
           round(coalesce(f.fc, 0) / 100.0, 2) AS first_touch_value,
           round(coalesce(l.lc, 0) / 100.0, 2) AS last_touch_value
    FROM f FULL OUTER JOIN l ON f.event_type = l.event_type
    ORDER BY event_type
"""


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


SQL_QUERIES["scc_pivot"] = q_scc_pivot

ORACLE_SQL["scc_pivot"] = """
    WITH RECURSIVE e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    fwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.dst FROM fwd JOIN e ON e.src = fwd.node
    ),
    bwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.src FROM bwd JOIN e ON e.dst = bwd.node
    ),
    scc AS (SELECT fwd.node FROM fwd JOIN bwd USING (node))
    SELECT node, (SELECT count(*) FROM scc) AS scc_size
    FROM scc ORDER BY node
"""


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


SQL_QUERIES["bowtie"] = q_bowtie

ORACLE_SQL["bowtie"] = """
    WITH RECURSIVE e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS node FROM range(0, 50) t(i)),
    fwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.dst FROM fwd JOIN e ON e.src = fwd.node
    ),
    bwd AS (
        SELECT 0 AS node
        UNION
        SELECT e.src FROM bwd JOIN e ON e.dst = bwd.node
    ),
    lab AS (
        SELECT n.node,
               CASE
                   WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'core'
                   WHEN b.node IS NOT NULL THEN 'in'
                   WHEN f.node IS NOT NULL THEN 'out'
                   ELSE 'other'
               END AS part
        FROM nodes n
        LEFT JOIN fwd f ON f.node = n.node
        LEFT JOIN bwd b ON b.node = n.node
    )
    SELECT node, part, count(*) OVER (PARTITION BY part) AS part_size
    FROM lab ORDER BY node
"""


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


SQL_QUERIES["grouped_mode"] = q_grouped_mode

ORACLE_SQL["grouped_mode"] = """
    WITH c AS (
        SELECT event_type, round(value, 1) AS v, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, v, cnt,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, v) AS rn
        FROM c
    )
    SELECT event_type, v AS mode_value, cnt AS mode_count
    FROM r WHERE rn = 1 ORDER BY event_type
"""


def q_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series — the
    time-series seasonality probe (is this hour's load predicted by the
    last?).  Events reduce to an O(hours) count series via one combiner;
    the lag-join and Pearson fold run on that small series in hour order,
    matching the mirror's centered computation exactly."""
    ev = _read(sf_dir, "events", columns=["ts"])

    def cnt(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        part = (
            pd.DataFrame({"hour": df["ts"].dt.strftime("%Y-%m-%d %H")})
            .groupby("hour", as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    h = (
        ev.map_batches(cnt, batch_format="pyarrow")
        .groupby("hour")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "c"})
        .sort_values("hour")
        .reset_index(drop=True)
    )
    x = h["c"].to_numpy(dtype=np.float64)[:-1]
    y = h["c"].to_numpy(dtype=np.float64)[1:]
    n = len(x)
    if n < 2:
        r = np.nan
    else:
        mx, my = x.sum() / n, y.sum() / n
        dx, dy = x - mx, y - my
        denom = np.sqrt((dx * dx).sum() * (dy * dy).sum())
        r = (dx * dy).sum() / denom if denom else np.nan
    return pd.DataFrame({"n_pairs": [int(n)], "lag1_autocorr": [float(_r(r, 6))]})


SQL_QUERIES["hourly_autocorr"] = q_hourly_autocorr

ORACLE_SQL["hourly_autocorr"] = """
    WITH h AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
               count(*)::DOUBLE AS c
        FROM events GROUP BY 1
    ),
    l AS (
        SELECT c AS y, lag(c) OVER (ORDER BY hour) AS x FROM h
    ),
    p AS (SELECT x, y FROM l WHERE x IS NOT NULL),
    m AS (SELECT count(*) AS n, sum(x) / count(*) AS mx, sum(y) / count(*) AS my
          FROM p),
    c AS (
        SELECT sum((x - mx) * (x - mx)) AS sxx,
               sum((y - my) * (y - my)) AS syy,
               sum((x - mx) * (y - my)) AS sxy
        FROM p CROSS JOIN m
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_pairs,
           round(sxy / sqrt(sxx * syy), 6) AS lag1_autocorr
    FROM c
"""


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


SQL_QUERIES["weighted_median"] = q_weighted_median

ORACLE_SQL["weighted_median"] = """
    WITH w AS (
        SELECT event_type, event_id, value,
               CAST(round(value, 2) * 100 AS BIGINT) AS cw
        FROM events
    ),
    r AS (
        SELECT event_type, value,
               sum(cw) OVER (PARTITION BY event_type
                             ORDER BY value, event_id
                             ROWS UNBOUNDED PRECEDING) AS run,
               (sum(cw) OVER (PARTITION BY event_type) + 1) // 2 AS tgt
        FROM w
    ),
    hit AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY run) AS rn
        FROM r WHERE run >= tgt
    )
    SELECT event_type, value AS weighted_median
    FROM hit WHERE rn = 1 ORDER BY event_type
"""


def q_kmeans_inertia(sf_dir: str):
    """K-means elbow curve: total within-cluster squared distance (inertia)
    at k = 2, 4, 8 with the deterministic first-k-vectors init — the
    model-selection table for the clustering family.  Each k is one
    broadcast + one streaming pass emitting a scalar partial per batch;
    the corpus never re-shuffles."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    rows = []
    for k in (2, 4, 8):
        init = sorted(
            emb.filter(expr=f"vec_id < {k}").take_all(), key=lambda r: r["vec_id"]
        )
        C = np.array([r["embedding"] for r in init], np.float64)
        c_ref = ray.put(C)

        def partial(b: pa.Table, _ref=c_ref) -> pa.Table:
            C_ = ray.get(_ref)
            X = _emb_matrix(b)
            d2 = ((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)
            return pa.table(
                {"s": pa.array([float(d2.min(axis=1).sum())], pa.float64())}
            )

        inertia = emb.map_batches(partial, batch_format="pyarrow").sum("s")
        rows.append({"k": k, "inertia": float(_r(inertia, 4))})
    return pd.DataFrame(rows)


SQL_QUERIES["kmeans_inertia"] = q_kmeans_inertia

ORACLE_SQL["kmeans_inertia"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    d AS (
        SELECT e.vec_id, c.vec_id AS cid,
               list_distance(e.x, c.x) * list_distance(e.x, c.x) AS d2
        FROM e CROSS JOIN e c WHERE c.vec_id < 8
    ),
    best AS (
        SELECT k.k, d.vec_id, min(d.d2) AS d2
        FROM (SELECT unnest([2, 4, 8]) AS k) k
        JOIN d ON d.cid < k.k
        GROUP BY k.k, d.vec_id
    )
    SELECT k, round(sum(d2), 4) AS inertia
    FROM best GROUP BY k ORDER BY k
"""


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


SQL_QUERIES["proportion_ztest"] = q_proportion_ztest

ORACLE_SQL["proportion_ztest"] = (
    "WITH gq AS (" + ORACLE_SQL["gopher_quality"] + """),
    cells AS (
        SELECT d.source, sum(gq.keep)::DOUBLE AS keeps, count(*)::DOUBLE AS n
        FROM documents d JOIN gq USING (doc_id) GROUP BY d.source
    ),
    ranked AS (
        SELECT source, keeps, n,
               row_number() OVER (ORDER BY n DESC, source) AS rn
        FROM cells
    ),
    ab AS (
        SELECT max(CASE WHEN rn = 1 THEN source END) AS source_a,
               max(CASE WHEN rn = 2 THEN source END) AS source_b,
               max(CASE WHEN rn = 1 THEN keeps END) AS ka,
               max(CASE WHEN rn = 2 THEN keeps END) AS kb,
               max(CASE WHEN rn = 1 THEN n END) AS na,
               max(CASE WHEN rn = 2 THEN n END) AS nb
        FROM ranked WHERE rn <= 2
    )
    SELECT source_a, source_b,
           round(ka / na, 6) AS p_a,
           round(kb / nb, 6) AS p_b,
           round((ka / na - kb / nb)
                 / sqrt(((ka + kb) / (na + nb)) * (1.0 - (ka + kb) / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 6) AS z
    FROM ab
"""
)


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


SQL_QUERIES["pack_stats"] = q_pack_stats

ORACLE_SQL["pack_stats"] = (
    "WITH pk AS (" + ORACLE_SQL["pack_sequences"] + """),
    seqs AS (SELECT seq_id, sum(n_tokens) AS tok FROM pk GROUP BY seq_id)
    SELECT count(*) AS n_seqs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST(min(tok) AS BIGINT) AS min_fill,
           CAST(max(tok) AS BIGINT) AS max_fill,
           round(sum(tok) / count(*), 6) AS mean_fill
    FROM seqs
"""
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


SQL_QUERIES["peak_concurrency"] = q_peak_concurrency

ORACLE_SQL["peak_concurrency"] = """
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM o
    ),
    sess AS (
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id
    ),
    ev2 AS (
        SELECT session_start AS ts, 1 AS delta, user_id, session_id FROM sess
        UNION ALL
        SELECT session_end, -1, user_id, session_id FROM sess
    ),
    r AS (
        SELECT ts,
               CAST(sum(delta) OVER (ORDER BY ts, delta DESC, user_id, session_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        FROM ev2
    ),
    p AS (SELECT max(run) AS peak FROM r)
    SELECT p.peak, (SELECT min(ts) FROM r WHERE run = p.peak) AS at_ts
    FROM p
"""


def q_label_knn_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the embedding corpus — the
    standard embedding-quality probe (do nearest neighbours share
    labels?).  The corpus block broadcasts once via ray.put and each
    batch computes its (batch x corpus) distance matrix, masks self by
    vec_id, takes the nearest-other with the smallest-vec_id tie rule,
    and folds to a (correct, n) partial — brute force is the oracle-able
    baseline; at 10^10 vectors the probe side routes through the IVF
    index (stages/similarity.py) instead."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]).materialize()
    rows = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], np.float64)
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    labels = np.array([r["label"] for r in rows], np.int64)
    ref = ray.put((X, ids, labels))

    def partial(b: pa.Table) -> pa.Table:
        X_, ids_, labels_ = ray.get(ref)
        Q = _emb_matrix(b)
        qid = b.column("vec_id").to_numpy()
        own = b.column("label").to_numpy()
        d2 = ((Q[:, None, :] - X_[None, :, :]) ** 2).sum(axis=2)
        d2[qid[:, None] == ids_[None, :]] = np.inf  # mask self
        # argmin ties resolve to the first (= smallest vec_id: X_ is
        # vec_id-ordered), matching ORDER BY distance, vec_id
        j = d2.argmin(axis=1)
        correct = int((labels_[j] == own).sum())
        return pa.table(
            {
                "correct": pa.array([correct], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    agg = emb.map_batches(partial, batch_format="pyarrow").sum(["correct", "n"])
    n, correct = int(agg["sum(n)"]), int(agg["sum(correct)"])
    return pd.DataFrame(
        {
            "n": [n],
            "correct": [correct],
            "accuracy": [float(_r(correct / n, 6))],
        }
    )


SQL_QUERIES["label_knn_accuracy"] = q_label_knn_accuracy

ORACLE_SQL["label_knn_accuracy"] = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x, label FROM embeddings),
    d AS (
        SELECT a.vec_id, a.label AS own, b.label AS nb,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY list_distance(a.x, b.x), b.vec_id) AS rn
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT count(*) AS n,
           CAST(sum(CASE WHEN own = nb THEN 1 ELSE 0 END) AS BIGINT) AS correct,
           round(sum(CASE WHEN own = nb THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6)
               AS accuracy
    FROM d WHERE rn = 1
"""


def q_modularity(sf_dir: str):
    """Newman modularity of the LPA community assignment over the events
    graph — the one-number answer to 'did community detection find real
    structure?'.  Composes q_lpa_communities (50-node label table,
    broadcast) with the distinct undirected edge set: inside-edge counts
    and community degree sums reduce through combiners, and the O(
    communities) Q terms fold in community order to match the mirror's
    ordered aggregate."""
    lpa = q_lpa_communities(sf_dir)
    lpa = lpa if isinstance(lpa, pd.DataFrame) else lpa.to_pandas()
    comm = dict(zip(lpa["node"].astype(int), lpa["community"].astype(int)))
    c_ref = ray.put(comm)
    edges = _events_edges(sf_dir)

    def und(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        return pa.table(
            {
                "u": pa.array(np.minimum(s[keep], d[keep]), pa.int64()),
                "v": pa.array(np.maximum(s[keep], d[keep]), pa.int64()),
            }
        )

    ue = (
        edges.map_batches(und, batch_format="pyarrow")
        .groupby(["u", "v"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )
    m = float(ue.count())

    def cells(b: pa.Table) -> pa.Table:
        cm = ray.get(c_ref)
        u = b.column("u").to_numpy()
        v = b.column("v").to_numpy()
        lut = np.full(max(cm) + 1, -1, np.int64)
        for node, c in cm.items():
            lut[node] = c
        cu, cv = lut[u], lut[v]
        # inside-community edge counts + per-community degree contributions
        # (each undirected edge adds 1 degree to each endpoint's community)
        inside = pd.DataFrame({"community": cu[cu == cv], "ec": 1}).groupby(
            "community", as_index=False
        ).sum()
        degs = pd.DataFrame(
            {"community": np.concatenate([cu, cv]), "dc": 1}
        ).groupby("community", as_index=False).sum()
        out = degs.merge(inside, on="community", how="left").fillna(0)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        ue.map_batches(cells, batch_format="pyarrow")
        .groupby("community")
        .aggregate(Sum("ec", alias_name="ec"), Sum("dc", alias_name="dc"))
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    q = 0.0
    for _, r in agg.iterrows():  # community-ordered fold == the SQL mirror
        q += float(r["ec"]) / m - (float(r["dc"]) / (2.0 * m)) * (
            float(r["dc"]) / (2.0 * m)
        )
    return pd.DataFrame(
        {
            "n_communities": [int(len(agg))],
            "m_edges": [int(m)],
            "modularity": [float(_r(q, 6))],
        }
    )


SQL_QUERIES["modularity"] = q_modularity

ORACLE_SQL["modularity"] = (
    "WITH lpa AS (" + ORACLE_SQL["lpa_communities"] + """),
    e0 AS (
        SELECT DISTINCT least(user_id % 50, (user_id * 13 + event_id) % 50) AS u,
                        greatest(user_id % 50, (user_id * 13 + event_id) % 50) AS v
        FROM events
        WHERE user_id % 50 <> (user_id * 13 + event_id) % 50
    ),
    m AS (SELECT count(*)::DOUBLE AS m FROM e0),
    lab AS (
        SELECT e0.u, e0.v, a.community AS cu, b.community AS cv
        FROM e0 JOIN lpa a ON a.node = e0.u JOIN lpa b ON b.node = e0.v
    ),
    inside AS (
        SELECT cu AS community, count(*)::DOUBLE AS ec
        FROM lab WHERE cu = cv GROUP BY cu
    ),
    degc AS (
        SELECT community, sum(dc)::DOUBLE AS dc FROM (
            SELECT cu AS community, count(*) AS dc FROM lab GROUP BY cu
            UNION ALL
            SELECT cv, count(*) FROM lab GROUP BY cv
        ) GROUP BY community
    ),
    terms AS (
        SELECT degc.community,
               coalesce(inside.ec, 0) / m.m
                   - (degc.dc / (2.0 * m.m)) * (degc.dc / (2.0 * m.m)) AS term
        FROM degc CROSS JOIN m LEFT JOIN inside USING (community)
    )
    SELECT (SELECT count(*) FROM terms) AS n_communities,
           (SELECT CAST(m AS BIGINT) FROM m) AS m_edges,
           round(sum(term ORDER BY community), 6) AS modularity
    FROM terms
"""
)


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


SQL_QUERIES["length_gini"] = q_length_gini

ORACLE_SQL["length_gini"] = """
    WITH h AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
    o AS (
        SELECT v, c,
               sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS a
        FROM h
    ),
    s AS (
        SELECT sum(v * (c * a + c * (c + 1) // 2)) AS S,
               sum(v * c) AS T, sum(c) AS n
        FROM o
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(2.0 * S / (n * T) - (n + 1.0) / n, 6) AS gini
    FROM s
"""


# ---------------------------------------------------------------------------
# corpus-law diagnostics + local fingerprinting (Zipf / Heaps / Fano /
# Flesch-Kincaid / MOSS winnowing — Schleimer, Wilkerson & Aiken, SIGMOD'03)
# ---------------------------------------------------------------------------

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


SQL_QUERIES["zipf_fit"] = q_zipf_fit

ORACLE_SQL["zipf_fit"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    v AS (
        SELECT token, count(*) AS cnt FROM w GROUP BY token
        ORDER BY cnt DESC, token LIMIT 100
    ),
    rk AS (
        SELECT ln(row_number() OVER (ORDER BY cnt DESC, token)) AS x,
               ln(cnt) AS y
        FROM v
    ),
    s AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        FROM rk
    )
    SELECT CAST(n AS BIGINT) AS k,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0) * sx) / n, 6)
               AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2
    FROM s
"""


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


SQL_QUERIES["heaps_law"] = q_heaps_law

ORACLE_SQL["heaps_law"] = r"""
    WITH m AS (SELECT max(doc_id) AS md FROM documents),
    ck AS (SELECT i AS ckpt, (md * i) // 8 AS thr FROM m, range(1, 9) t(i)),
    toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    firsts AS (
        SELECT token, min(doc_id) AS fd
        FROM (SELECT doc_id, unnest(t) AS token FROM toks) w
        GROUP BY token
    ),
    ntok AS (SELECT doc_id, len(t) AS n FROM toks)
    SELECT CAST(ckpt AS BIGINT) AS ckpt,
           CAST(thr AS BIGINT) AS max_doc,
           (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM ntok
            WHERE doc_id <= thr) AS n_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM firsts
            WHERE fd <= thr) AS vocab
    FROM ck ORDER BY ckpt
"""


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


SQL_QUERIES["term_burstiness"] = q_term_burstiness

ORACLE_SQL["term_burstiness"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    top AS (
        SELECT token FROM w GROUP BY token
        ORDER BY count(*) DESC, token LIMIT 30
    ),
    pc AS (
        SELECT token, doc_id, count(*) AS c FROM w
        WHERE token IN (SELECT token FROM top)
        GROUP BY token, doc_id
    ),
    s AS (SELECT token, sum(c) AS s1, sum(c * c) AS s2 FROM pc GROUP BY token),
    n AS (SELECT count(*) AS N FROM documents)
    SELECT token, CAST(s1 AS BIGINT) AS total,
           round(((s2 - s1 * s1 * 1.0 / N) / (N - 1)) / (s1 * 1.0 / N), 6)
               AS fano
    FROM s, n ORDER BY token
"""


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


SQL_QUERIES["winnowing"] = q_winnowing

ORACLE_SQL["winnowing"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS pos,
               md5_number_lower(list_aggregate(t[i:i+2], 'string_agg', ' ')) AS h
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
    ),
    gm AS (SELECT doc_id, count(*) AS m FROM grams GROUP BY doc_id),
    wins AS (
        SELECT doc_id, unnest(generate_series(1, greatest(m - 3, 1))) AS s
        FROM gm
    ),
    sel AS (
        SELECT w.doc_id, g.pos, g.h,
               row_number() OVER (PARTITION BY w.doc_id, w.s
                                  ORDER BY g.h ASC, g.pos DESC) AS rn
        FROM wins w JOIN grams g
          ON g.doc_id = w.doc_id AND g.pos BETWEEN w.s AND w.s + 3
    )
    SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST(h % 1000000007 AS BIGINT) AS fp
    FROM sel WHERE rn = 1 ORDER BY doc_id, pos
"""


def q_readability(sf_dir: str):
    """Flesch-Kincaid-style readability features per doc: word count,
    vowel-group syllable estimate, syllables-per-word, and the FK grade
    formula (sentence count := 1 — the synthetic corpus has no terminal
    punctuation; docstring-honest, and the [aeiou]+ vowel-group heuristic
    is the classic cheap syllable counter).  Because tokens are space-
    separated and spaces contain no vowels, the per-word vowel-group sum
    equals ONE vectorized regex count over the whole text — both counts
    are single pyarrow count_substring_regex kernels, no Python loop, no
    shuffle."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(b: pa.Table) -> pa.Table:
        nw = pc.count_substring_regex(b.column("text"), r"\S+").to_numpy().astype(np.int64)
        ns = pc.count_substring_regex(b.column("text"), "[aeiou]+").to_numpy().astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            spw = np.where(nw > 0, ns * 1.0 / np.maximum(nw, 1), np.nan)
            fk = np.where(
                nw > 0, 0.39 * nw + 11.8 * (ns * 1.0 / np.maximum(nw, 1)) - 15.59, np.nan
            )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_words": pa.array(nw, pa.int64()),
                "n_syllables": pa.array(ns, pa.int64()),
                "syll_per_word": pa.array(_r(spw, 6), pa.float64()),
                "fk_grade": pa.array(_r(fk, 6), pa.float64()),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow").sort("doc_id")


SQL_QUERIES["readability"] = q_readability

ORACLE_SQL["readability"] = r"""
    WITH f AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '\S+')) AS nw,
               len(regexp_extract_all(text, '[aeiou]+')) AS ns
        FROM documents
    )
    SELECT doc_id, CAST(nw AS BIGINT) AS n_words, CAST(ns AS BIGINT) AS n_syllables,
           CASE WHEN nw > 0 THEN round(ns * 1.0 / nw, 6) END AS syll_per_word,
           CASE WHEN nw > 0
                THEN round(0.39 * nw + 11.8 * (ns * 1.0 / nw) - 15.59, 6)
           END AS fk_grade
    FROM f ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# skyline / agreement / resampling / centrality
# ---------------------------------------------------------------------------

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


SQL_QUERIES["pareto_skyline"] = q_pareto_skyline

ORACLE_SQL["pareto_skyline"] = r"""
    WITH f AS (
        SELECT doc_id, len(t) AS n_tokens,
               round(len(list_distinct(t)) * 1.0 / len(t), 6) AS uq
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents)
    )
    SELECT a.doc_id, CAST(a.n_tokens AS BIGINT) AS n_tokens, a.uq
    FROM f a
    WHERE NOT EXISTS (
        SELECT 1 FROM f b
        WHERE b.n_tokens >= a.n_tokens AND b.uq >= a.uq
          AND (b.n_tokens > a.n_tokens OR b.uq > a.uq)
    )
    ORDER BY a.doc_id
"""


def q_langid_kappa(sf_dir: str):
    """Cohen's kappa between the heuristic language-ID prediction and the
    labeled ``lang`` column — chance-corrected agreement, the number an
    annotation-quality dashboard reports next to raw accuracy.  Reuses the
    langid_confusion pipeline (stopword-vote predictor, groupby to the
    dim-sized confusion matrix); kappa folds from the matrix's exact
    integer marginals in one driver expression, mirrored operation-for-
    operation: kappa = (N*tr - sum_k row_k*col_k) / (N*N - sum_k
    row_k*col_k)."""
    cm = _to_pandas_any(SQL_QUERIES["langid_confusion"](sf_dir))
    N = int(cm["cnt"].sum())
    tr = int(cm.loc[cm["lang"] == cm["lang_pred"], "cnt"].sum())
    rows = cm.groupby("lang")["cnt"].sum()
    cols = cm.groupby("lang_pred")["cnt"].sum()
    rc = int(sum(int(rows[k]) * int(cols[k]) for k in rows.index if k in cols.index))
    # degenerate agreement (both marginals concentrated): NULL like the mirror
    kappa = (N * tr - rc) * 1.0 / (N * N - rc) if N * N != rc else np.nan
    return pd.DataFrame({"n": [N], "kappa": [float(_r(kappa, 6))]})


def _to_pandas_any(r):
    if isinstance(r, pd.DataFrame):
        return r
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r.to_pandas()


SQL_QUERIES["langid_kappa"] = q_langid_kappa

ORACLE_SQL["langid_kappa"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """),
    cm AS (
        SELECT d.lang AS a, p.lang_pred AS b, count(*) AS c
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.lang_pred
    ),
    tot AS (SELECT sum(c) AS N FROM cm),
    diag AS (SELECT coalesce(sum(c) FILTER (a = b), 0) AS tr FROM cm),
    marg AS (
        SELECT coalesce(sum(r.s * col.s), 0) AS rc
        FROM (SELECT a AS k, sum(c) AS s FROM cm GROUP BY a) r
        JOIN (SELECT b AS k, sum(c) AS s FROM cm GROUP BY b) col USING (k)
    )
    SELECT CAST(N AS BIGINT) AS n,
           round((N * tr - rc) * 1.0 / nullif(N * N - rc, 0), 6) AS kappa
    FROM tot, diag, marg
"""
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


SQL_QUERIES["bootstrap_ci"] = q_bootstrap_ci

ORACLE_SQL["bootstrap_ci"] = r"""
    WITH v AS (
        SELECT n_chars, row_number() OVER (ORDER BY doc_id) - 1 AS r
        FROM documents
    ),
    nn AS (SELECT count(*) AS n FROM v),
    draws AS (
        SELECT b.i AS b,
               md5_number_lower(b.i || ':' || v.r) % nn.n AS r
        FROM range(0, 200) b(i), v, nn
    ),
    means AS (
        SELECT d.b, sum(v.n_chars) * 1.0 / count(*) AS m
        FROM draws d JOIN v USING (r) GROUP BY d.b
    ),
    ord AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means)
    SELECT (SELECT round(sum(n_chars) * 1.0 / count(*), 6) FROM documents) AS mean,
           (SELECT round(m, 6) FROM ord WHERE rn = 5) AS lo,
           (SELECT round(m, 6) FROM ord WHERE rn = 195) AS hi
"""


def q_betweenness(sf_dir: str):
    """Brandes betweenness centrality (Brandes 2001) over the events link
    graph — the bridge-detector centrality (which hub URLs sit on the most
    shortest paths) complementing pagerank/HITS/k-core.  Distributed in
    the standard way: the dim-sized adjacency broadcasts once via ray.put,
    a Dataset of source nodes fans out over the actor pool, each task runs
    the single-source BFS + dependency accumulation for its sources and
    emits (node, partial score) rows, and one groupby-sum folds the
    partials — per-source work never leaves its task, only O(V) rows
    shuffle.  Directed, unweighted, endpoints excluded.  No SQL mirror
    (the dependency accumulation is not expressible without recursive
    state); pinned in tests/test_betweenness.py on closed-form graphs
    (path / star / cycle) and for partition-independence on this graph."""
    edges = _events_edges(sf_dir).to_pandas()[["src", "dst"]].drop_duplicates()
    return betweenness_over_edges(edges)


def betweenness_over_edges(edges: pd.DataFrame) -> pd.DataFrame:
    """Core of q_betweenness over an explicit (src, dst) edge frame —
    factored out so tests can pin closed-form graphs."""
    adj: dict = {}
    nodes = sorted(set(edges["src"]).union(edges["dst"]))
    for s, d in edges.itertuples(index=False):
        adj.setdefault(int(s), []).append(int(d))
    for k in adj:
        adj[k].sort()
    adj_ref = ray.put((nodes, adj))

    src_ds = ray.data.from_items([{"s": int(s)} for s in nodes])

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
    full["betweenness"] = _r(full["betweenness"].to_numpy(), 4)
    return full.sort_values("node").reset_index(drop=True)


NOSQL_QUERIES["betweenness"] = q_betweenness


# ---------------------------------------------------------------------------
# mutual-kNN graph / co-visitation projection / Jaro-Winkler verify /
# bigram entropy rate
# ---------------------------------------------------------------------------

def q_mutual_knn(sf_dir: str, k: int = 3, grid: int = 4):
    """Mutual k-nearest-neighbor graph over the embedding corpus — the
    edge set SSL-curation and SemDeDup-style clustering build on (an edge
    survives only if BOTH endpoints pick each other, killing hub
    false-positives).  Exact and fully distributed: the 1-bucket-theta
    grid from embedding_neardup_pairs replicates each vector to its
    ``grid`` unordered block cells so every pair meets in exactly ONE
    cell; each cell emits per-vector PARTIAL top-k rows (safe cut: the
    global top-k is a subset of the union of per-cell top-ks), a
    groupby(va).map_groups merges to the global kNN with (sim DESC, vb)
    tie order, and mutuality is one more groupby on the unordered pair
    key (cnt == 2) — no all-pairs matrix, no broadcast side, shuffle
    volume O(N*grid + N*k*grid)."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def to_cells(b: pa.Table) -> pa.Table:
        n = b.num_rows
        blk = (b.column("vec_id").to_numpy() % grid).astype(np.int64)
        cells = np.concatenate(
            [np.minimum(blk, o) * grid + np.maximum(blk, o) for o in range(grid)]
        )
        rep = b.take(pa.array(np.tile(np.arange(n), grid)))
        return rep.append_column("cell", pa.array(cells, pa.int64()))

    def cell_topk(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        g1, g2 = cell // grid, cell % grid
        ids = g.column("vec_id").to_numpy()
        blk = (ids % grid).astype(np.int64)
        m = np.stack(g.column("embedding").to_numpy(zero_copy_only=False)).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        out_a, out_b, out_s = [], [], []

        def emit_topk(src_idx, dst_idx, sims):
            # sims: (len(src_idx), len(dst_idx))
            for r, i in enumerate(src_idx):
                col = sims[r]
                cand = np.arange(len(dst_idx))
                if g1 == g2:
                    cand = cand[dst_idx[cand] != i]
                if len(cand) > k:
                    order = np.lexsort((ids[dst_idx[cand]], -col[cand]))[:k]
                    cand = cand[order]
                for c in cand:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[dst_idx[c]]))
                    out_s.append(float(col[c]))

        if g1 == g2:
            idx = np.arange(len(ids))
            emit_topk(idx, idx, m @ m.T)
        else:
            ia, ib = np.flatnonzero(blk == g1), np.flatnonzero(blk == g2)
            s = m[ia] @ m[ib].T
            emit_topk(ia, ib, s)
            emit_topk(ib, ia, s.T)
        return pa.table(
            {
                "va": pa.array(out_a, pa.int64()),
                "vb": pa.array(out_b, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        emb.map_batches(to_cells, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_topk, batch_format="pyarrow")
    )

    def merge_topk(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values(["sim", "vb"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    knn = partials.groupby("va").map_groups(merge_topk, batch_format="pyarrow")

    def keyed(b: pa.Table) -> pa.Table:
        a = b.column("va").to_numpy()
        c = b.column("vb").to_numpy()
        return pa.table(
            {
                "vec_a": pa.array(np.minimum(a, c), pa.int64()),
                "vec_b": pa.array(np.maximum(a, c), pa.int64()),
                "sim": b.column("sim"),
                "one": pa.array(np.ones(len(a), dtype=np.int64), pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b.column("cnt"), 2))
        return pa.table(
            {
                "vec_a": keep.column("vec_a"),
                "vec_b": keep.column("vec_b"),
                "sim": pa.array(
                    _r(keep.column("sim").to_numpy(zero_copy_only=False), 4),
                    pa.float64(),
                ),
            }
        )

    return (
        knn.map_batches(keyed, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .aggregate(Sum("one", alias_name="cnt"), Max("sim", alias_name="sim"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["vec_a", "vec_b"])
    )


SQL_QUERIES["mutual_knn"] = q_mutual_knn

ORACLE_SQL["mutual_knn"] = """
    WITH s AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    knn AS (
        SELECT va, vb, sim FROM s
        QUALIFY row_number() OVER (PARTITION BY va
                                   ORDER BY sim DESC, vb) <= 3
    )
    SELECT k1.va AS vec_a, k1.vb AS vec_b, round(k1.sim, 4) AS sim
    FROM knn k1 JOIN knn k2 ON k1.va = k2.vb AND k1.vb = k2.va
    WHERE k1.va < k1.vb ORDER BY vec_a, vec_b
"""


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


SQL_QUERIES["covisitation"] = q_covisitation

ORACLE_SQL["covisitation"] = """
    WITH ui AS (
        SELECT DISTINCT user_id, (user_id * 13 + event_id) % 50 AS item
        FROM events
    ),
    capped AS (
        SELECT user_id, item FROM ui
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY item) <= 20
    )
    SELECT a.item AS item_a, b.item AS item_b, count(*) AS co_users
    FROM capped a JOIN capped b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY a.item, b.item HAVING count(*) >= 2
    ORDER BY item_a, item_b
"""


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


def q_jaro_winkler_verify(sf_dir: str):
    """Jaro-Winkler verify kernel parity (the record-linkage sibling of
    levenshtein_verify): score rank-consecutive pairs of the top-100
    vocabulary plus each top-20 token against its reverse, with the pure-
    Python jaro_winkler above, pinned cell-for-cell against DuckDB's
    RapidFuzz-backed jaro_winkler_similarity.  The pair table here is
    dim-sized by construction (it verifies the KERNEL); at scale the same
    function runs inside fingerprint-blocked map_groups exactly like the
    levenshtein verify stage."""
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


SQL_QUERIES["jaro_winkler_verify"] = q_jaro_winkler_verify

ORACLE_SQL["jaro_winkler_verify"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    v AS (
        SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS rk
        FROM w GROUP BY token
        ORDER BY count(*) DESC, token LIMIT 100
    ),
    pairs AS (
        SELECT a.token AS tok_a, b.token AS tok_b
        FROM v a JOIN v b ON b.rk = a.rk + 1
        UNION ALL
        SELECT token, reverse(token) FROM v WHERE rk <= 20
    )
    SELECT tok_a, tok_b,
           round(jaro_winkler_similarity(tok_a, tok_b), 6) AS jw
    FROM pairs ORDER BY tok_a, tok_b
"""


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


SQL_QUERIES["entropy_rate"] = q_entropy_rate

ORACLE_SQL["entropy_rate"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    bg AS (
        SELECT t[i] AS x, t[i] || ' ' || t[i + 1] AS g
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ),
    bc AS (SELECT x, g, count(*) AS c FROM bg GROUP BY x, g),
    cx AS (SELECT x, sum(c) AS cx FROM bc GROUP BY x),
    tt AS (SELECT sum(c) AS T FROM bc),
    hr AS (
        SELECT -sum(bc.c * 1.0 / tt.T * ln(bc.c * 1.0 / cx.cx)) AS h
        FROM bc JOIN cx USING (x), tt
    ),
    un AS (
        SELECT token, count(*) AS c
        FROM (SELECT unnest(t) AS token FROM toks) GROUP BY token
    ),
    uu AS (SELECT sum(c) AS U FROM un),
    hu AS (SELECT -sum(un.c * 1.0 / uu.U * ln(un.c * 1.0 / uu.U)) AS h FROM un, uu)
    SELECT CAST(tt.T AS BIGINT) AS n_bigrams,
           round(hr.h, 6) AS entropy_rate,
           round(hu.h, 6) AS unigram_entropy
    FROM tt, hr, hu
"""


# ---------------------------------------------------------------------------
# full outer join / eccentricity + diameter / Katz centrality
# ---------------------------------------------------------------------------

def q_full_outer_join(sf_dir: str):
    """Distributed FULL OUTER equi-join — the last relational join type
    the engine lacked (inner/left/semi/anti/asof/range/skew all exist):
    reconcile two sparse per-customer order profiles (orderkeys divisible
    by 7 vs by 11) so customers present in only one side surface with
    nulls on the other — the reconciliation/diff shape of ledger and
    delivery audits.  Both sides build combiner-style (per-batch partial
    counts, groupby-sum moves partials), then ONE bucket-partitioned
    stages.joins.hash_join(how='full') shuffle joins them — neither side
    broadcasts, right-only rows keep their coalesced key."""
    from ..stages.joins import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def side(mod: int, cname: str):
        def part(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df = df[df["o_orderkey"] % mod == 0]
            out = df.groupby("o_custkey", as_index=False).size().rename(
                columns={"size": cname}
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        return (
            orders.map_batches(part, batch_format="pyarrow")
            .groupby("o_custkey")
            .sum(cname)
            .map_batches(
                lambda b: b.rename_columns(["o_custkey", cname]),
                batch_format="pyarrow",
            )
        )

    j = hash_join(
        side(7, "cnt_a"), side(11, "cnt_b"), key="o_custkey", how="full"
    ).to_pandas()
    return j.sort_values("o_custkey").reset_index(drop=True)


SQL_QUERIES["full_outer_join"] = q_full_outer_join

ORACLE_SQL["full_outer_join"] = """
    WITH a AS (
        SELECT o_custkey, count(*) AS cnt_a FROM orders
        WHERE o_orderkey % 7 = 0 GROUP BY o_custkey
    ),
    b AS (
        SELECT o_custkey, count(*) AS cnt_b FROM orders
        WHERE o_orderkey % 11 = 0 GROUP BY o_custkey
    )
    SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey, a.cnt_a, b.cnt_b
    FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
    ORDER BY o_custkey
"""


def q_eccentricity(sf_dir: str):
    """Per-node eccentricity (max shortest-path distance to any reachable
    node) + reachable-set size over the UNDIRECTED events graph — the
    diameter probe (graph diameter = max eccentricity) a crawler uses to
    bound frontier horizons.  All 50 sources advance together in
    synchronized BFS waves: each hop is ONE streaming pass over the edge
    dataset filtering against broadcast per-source frontier id-sets (the
    q_avg_path_length wave, run to exhaustion instead of a fixed depth);
    only node-id sets ever sit on the driver — O(V) per source, dim-sized
    here, sharded actors at web scale."""
    dist_of = _all_pairs_bfs(sf_dir)
    rows = []
    for s in range(50):
        others = [v for k, v in dist_of[s].items() if k != s]
        rows.append(
            {
                "node": s,
                "ecc": max(others) if others else 0,
                "n_reachable": len(others),
            }
        )
    return pd.DataFrame(rows).sort_values("node").reset_index(drop=True)


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


SQL_QUERIES["eccentricity"] = q_eccentricity

ORACLE_SQL["eccentricity"] = """
    WITH RECURSIVE e AS (
        SELECT DISTINCT a, b FROM (
            SELECT user_id % 50 AS a, (user_id * 13 + event_id) % 50 AS b
            FROM events
            UNION
            SELECT (user_id * 13 + event_id) % 50 AS a, user_id % 50 AS b
            FROM events
        ) WHERE a <> b
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    d(s, n, dist) AS (
        SELECT n AS s, n, 0 FROM nodes
        UNION
        SELECT d.s, e.b, d.dist + 1
        FROM d JOIN e ON e.a = d.n
        WHERE d.dist < 50
    ),
    md AS (SELECT s, n, min(dist) AS dist FROM d GROUP BY s, n)
    SELECT s AS node,
           CAST(coalesce(max(dist) FILTER (n <> s), 0) AS BIGINT) AS ecc,
           CAST(count(*) FILTER (n <> s) AS BIGINT) AS n_reachable
    FROM md GROUP BY s ORDER BY node
"""


def q_katz_centrality(sf_dir: str, alpha: float = 0.05, iters: int = 3):
    """Katz centrality (3 unrolled iterations, beta = 1) over the DIRECTED
    events graph: x_{t+1}(v) = 1 + alpha * sum_{u->v} x_t(u) from x_0 = 1
    — the damped-walk-count centrality that, unlike PageRank, rewards
    being reachable rather than being exclusively linked.  Each iteration
    is one streaming pass: edges score against the broadcast 50-float
    rank vector, per-batch partial sums reduce through groupby(dst), the
    driver folds the O(V) delta — the same bucketed message-pass shape as
    host_pagerank, with multi-edges counted per-edge on both sides."""
    edges = _events_edges(sf_dir).materialize()
    x = {n: 1.0 for n in range(50)}
    for _ in range(iters):
        x_ref = ray.put(dict(x))

        def msg(b: pa.Table, _xr=x_ref) -> pa.Table:
            xv = ray.get(_xr)
            xs = np.array([xv[n] for n in range(50)], dtype=np.float64)
            s = b.column("src").to_numpy()
            d = b.column("dst").to_numpy()
            # node ids are 0..49 by construction — one vectorized gather
            df = pd.DataFrame({"dst": d, "m": xs[s]}).groupby("dst", as_index=False).sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        inc = (
            edges.map_batches(msg, batch_format="pyarrow")
            .groupby("dst")
            .sum("m")
            .to_pandas()
        )
        x = {n: 1.0 for n in range(50)}
        for _, r in inc.iterrows():
            x[int(r["dst"])] = 1.0 + alpha * float(r["sum(m)"])
    return pd.DataFrame(
        {
            "node": list(range(50)),
            "katz": [float(_r(x[n], 6)) for n in range(50)],
        }
    )


SQL_QUERIES["katz_centrality"] = q_katz_centrality

ORACLE_SQL["katz_centrality"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    r0 AS (SELECT n, 1.0 AS x FROM nodes),
    r1 AS (
        SELECT nodes.n,
               1.0 + 0.05 * coalesce(sum(r0.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r0 ON r0.n = e.src
        GROUP BY nodes.n
    ),
    r2 AS (
        SELECT nodes.n,
               1.0 + 0.05 * coalesce(sum(r1.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r1 ON r1.n = e.src
        GROUP BY nodes.n
    ),
    r3 AS (
        SELECT nodes.n,
               1.0 + 0.05 * coalesce(sum(r2.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r2 ON r2.n = e.src
        GROUP BY nodes.n
    )
    SELECT n AS node, round(x, 6) AS katz FROM r3 ORDER BY node
"""


# ---------------------------------------------------------------------------
# closeness/harmonic centrality / KWIC concordance / gzip-ratio signal
# ---------------------------------------------------------------------------

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


SQL_QUERIES["closeness_harmonic"] = q_closeness_harmonic

ORACLE_SQL["closeness_harmonic"] = """
    WITH RECURSIVE e AS (
        SELECT DISTINCT a, b FROM (
            SELECT user_id % 50 AS a, (user_id * 13 + event_id) % 50 AS b
            FROM events
            UNION
            SELECT (user_id * 13 + event_id) % 50 AS a, user_id % 50 AS b
            FROM events
        ) WHERE a <> b
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    d(s, n, dist) AS (
        SELECT n AS s, n, 0 FROM nodes
        UNION
        SELECT d.s, e.b, d.dist + 1
        FROM d JOIN e ON e.a = d.n
        WHERE d.dist < 50
    ),
    md AS (SELECT s, n, min(dist) AS dist FROM d GROUP BY s, n)
    SELECT s AS node,
           coalesce(round(count(*) FILTER (n <> s) * 1.0
                          / nullif(sum(dist) FILTER (n <> s), 0), 6), 0.0)
               AS closeness,
           coalesce(round(sum(1.0 / dist) FILTER (n <> s), 6), 0.0) AS harmonic
    FROM md GROUP BY s ORDER BY node
"""


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


SQL_QUERIES["kwic"] = q_kwic

ORACLE_SQL["kwic"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    term AS (
        SELECT token FROM w GROUP BY token
        ORDER BY count(*) DESC, token LIMIT 1
    ),
    hits AS (
        SELECT doc_id, i AS pos, t
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i), term
        WHERE t[i] = term.token
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           coalesce(list_aggregate(t[greatest(1, pos - 2):pos - 1],
                                   'string_agg', ' '), '') AS left_ctx,
           coalesce(list_aggregate(t[pos + 1:pos + 2],
                                   'string_agg', ' '), '') AS right_ctx
    FROM hits ORDER BY doc_id, pos
"""


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


NOSQL_QUERIES["compression_ratio"] = q_compression_ratio


# ---------------------------------------------------------------------------
# Wasserstein drift / precision-recall curve / hapax legomena
# ---------------------------------------------------------------------------

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


SQL_QUERIES["wasserstein_drift"] = q_wasserstein_drift

ORACLE_SQL["wasserstein_drift"] = """
    WITH sv AS (
        SELECT source, n_chars AS v, count(*) AS c
        FROM documents GROUP BY source, n_chars
    ),
    tot AS (SELECT source, sum(c) AS n FROM sv GROUP BY source),
    gv AS (SELECT v, sum(c) AS cg FROM sv GROUP BY v),
    gn AS (SELECT sum(cg) AS ng FROM gv),
    grid AS (
        SELECT t.source, g.v FROM (SELECT DISTINCT source FROM sv) t
        CROSS JOIN gv g
    ),
    own AS (
        SELECT gr.source, gr.v, coalesce(sv.c, 0) AS c
        FROM grid gr LEFT JOIN sv ON sv.source = gr.source AND sv.v = gr.v
    ),
    cum AS (
        SELECT o.source, o.v,
               lead(o.v) OVER (PARTITION BY o.source ORDER BY o.v) AS nxt,
               sum(o.c) OVER (PARTITION BY o.source ORDER BY o.v) AS co,
               sum(g.cg) OVER (PARTITION BY o.source ORDER BY o.v) AS cumg
        FROM own o JOIN gv g USING (v)
    )
    SELECT c.source, CAST(any_value(t.n) AS BIGINT) AS n,
           round(sum(abs(c.co * 1.0 / t.n
                         - (c.cumg - c.co) * 1.0 / (gn.ng - t.n))
                     * (c.nxt - c.v)) FILTER (c.nxt IS NOT NULL), 4) AS w1
    FROM cum c JOIN tot t USING (source), gn
    GROUP BY c.source ORDER BY c.source
"""


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


SQL_QUERIES["pr_curve"] = q_pr_curve

ORACLE_SQL["pr_curve"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               round(len(list_filter(toks, w -> w IN ('the','a','and','of','to')))
                     * 1.0 / len(toks), 4) AS sr
        FROM t
    ),
    w AS (SELECT doc_id, unnest(toks) AS w FROM t),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1])) AS g
        FROM t
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM gc GROUP BY doc_id),
    lab AS (
        SELECT ws.doc_id,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS keep
        FROM ws LEFT JOIN tp USING (doc_id)
    ),
    j AS (SELECT s.sr, lab.keep FROM s JOIN lab USING (doc_id)),
    thr AS (SELECT i, i * 0.05 AS t FROM range(0, 13) r(i)),
    agg AS (
        SELECT thr.t,
               count(*) FILTER (j.sr >= thr.t)                  AS n_sel,
               count(*) FILTER (j.sr >= thr.t AND j.keep = 1)   AS n_tp,
               count(*) FILTER (j.keep = 1)                     AS n_pos
        FROM thr CROSS JOIN j GROUP BY thr.t
    )
    SELECT round(t, 2) AS thr,
           CAST(n_sel AS BIGINT) AS n_sel,
           round(n_tp * 1.0 / nullif(n_sel, 0), 6) AS prec,
           round(n_tp * 1.0 / nullif(n_pos, 0), 6) AS rec
    FROM agg ORDER BY thr
"""


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


SQL_QUERIES["hapax_ratio"] = q_hapax_ratio

ORACLE_SQL["hapax_ratio"] = r"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    vc AS (
        SELECT token, count(*) AS c
        FROM (SELECT unnest(t) AS token FROM toks) GROUP BY token
    ),
    s AS (
        SELECT count(*) AS v,
               count(*) FILTER (c = 1) AS h,
               sum(c) AS tk
        FROM vc
    )
    SELECT CAST(v AS BIGINT) AS vocab, CAST(h AS BIGINT) AS hapax,
           round(h * 1.0 / v, 6) AS hapax_vocab_frac,
           round(h * 1.0 / tk, 6) AS hapax_token_frac
    FROM s
"""


# ---------------------------------------------------------------------------
# exact ROC-AUC / per-doc n-gram novelty
# ---------------------------------------------------------------------------

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


SQL_QUERIES["roc_auc"] = q_roc_auc

ORACLE_SQL["roc_auc"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               round(len(list_filter(toks, w -> w IN ('the','a','and','of','to')))
                     * 1.0 / len(toks), 4) AS sr
        FROM t
    ),
    w AS (SELECT doc_id, unnest(toks) AS w FROM t),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i+1])) AS g
        FROM t
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM gc GROUP BY doc_id),
    lab AS (
        SELECT ws.doc_id,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS keep
        FROM ws LEFT JOIN tp USING (doc_id)
    ),
    j AS (SELECT s.sr, lab.keep FROM s JOIN lab USING (doc_id)),
    h AS (
        SELECT sr AS v,
               count(*) FILTER (keep = 1) AS p,
               count(*) FILTER (keep = 0) AS q
        FROM j GROUP BY sr
    ),
    o AS (
        SELECT v, p, q,
               sum(p + q) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - (p + q) AS a
        FROM h
    ),
    f AS (
        SELECT sum(p * (2 * a + p + q + 1)) AS r2,
               sum(p) AS np, sum(q) AS nq
        FROM o
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nq AS BIGINT) AS n_neg,
           round((r2 - np * (np + 1)) * 1.0 / nullif(2 * np * nq, 0), 6) AS auc
    FROM f
"""


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


SQL_QUERIES["ngram_novelty"] = q_ngram_novelty

ORACLE_SQL["ngram_novelty"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id,
               list_aggregate(t[i:i+2], 'string_agg', ' ') AS gram
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i)
    ),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
    fo AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram),
    own AS (SELECT fd AS doc_id, count(*) AS n_novel FROM fo GROUP BY fd)
    SELECT t.doc_id, t.n_grams,
           CAST(coalesce(o.n_novel, 0) AS BIGINT) AS n_novel,
           round(coalesce(o.n_novel, 0) * 1.0 / t.n_grams, 6) AS novelty
    FROM tot t LEFT JOIN own o USING (doc_id)
    ORDER BY t.doc_id
"""


# ---------------------------------------------------------------------------
# EWMA daily smoothing / rolling z-score anomalies / Bloom FPR calibration
# ---------------------------------------------------------------------------

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


SQL_QUERIES["ewma_daily"] = q_ewma_daily

ORACLE_SQL["ewma_daily"] = """
    WITH RECURSIVE d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    r AS (SELECT day, n, row_number() OVER (ORDER BY day) AS rk FROM d),
    e(rk, s) AS (
        SELECT rk, CAST(n AS DOUBLE) FROM r WHERE rk = 1
        UNION ALL
        SELECT r.rk, 0.3 * r.n + 0.7 * e.s
        FROM e JOIN r ON r.rk = e.rk + 1
    )
    SELECT r.day, CAST(r.n AS BIGINT) AS n_events, round(e.s, 4) AS ewma
    FROM r JOIN e USING (rk) ORDER BY r.day
"""


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


NOSQL_QUERIES["bloom_fpr"] = q_bloom_fpr


# ---------------------------------------------------------------------------
# leaky-bucket politeness replay / user-journey edit distance
# ---------------------------------------------------------------------------

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


SQL_QUERIES["leaky_bucket_replay"] = q_leaky_bucket_replay

ORACLE_SQL["leaky_bucket_replay"] = """
    WITH RECURSIVE ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS a,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk
        FROM events
    ),
    g(user_id, rk, event_id, a, gr) AS (
        SELECT user_id, rk, event_id, a, a FROM ev WHERE rk = 1
        UNION ALL
        SELECT ev.user_id, ev.rk, ev.event_id, ev.a,
               greatest(ev.a, g.gr + 21600000000)
        FROM g JOIN ev ON ev.user_id = g.user_id AND ev.rk = g.rk + 1
    )
    SELECT user_id, event_id, CAST(gr - a AS BIGINT) AS delay_us
    FROM g ORDER BY user_id, event_id
"""


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


SQL_QUERIES["edit_journeys"] = q_edit_journeys

ORACLE_SQL["edit_journeys"] = """
    WITH j AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS journey
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT user_id, journey,
               row_number() OVER (ORDER BY user_id) AS rk
        FROM j
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(len(a.journey) AS BIGINT) AS len_a,
           CAST(len(b.journey) AS BIGINT) AS len_b,
           CAST(levenshtein(a.journey, b.journey) AS BIGINT) AS edit_dist
    FROM r a JOIN r b ON b.rk = a.rk + 1
    ORDER BY user_a
"""


# ---------------------------------------------------------------------------
# sorted-neighborhood dedup blocking (Hernandez & Stolfo, SIGMOD'95)
# ---------------------------------------------------------------------------

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


SQL_QUERIES["sorted_neighborhood"] = q_sorted_neighborhood

ORACLE_SQL["sorted_neighborhood"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               list_aggregate(t[1:2], 'string_agg', ' ') AS k,
               list_distinct(t) AS s
        FROM toks
    ),
    r AS (
        SELECT doc_id, s, row_number() OVER (ORDER BY k, doc_id) AS rn
        FROM f
    ),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.s, b.s)) AS inter,
               len(a.s) AS na, len(b.s) AS nb
        FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
    )
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (na + nb - inter), 6) AS jac
    FROM p ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# stupid-backoff LM scoring / deterministic Huffman code lengths
# ---------------------------------------------------------------------------

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


SQL_QUERIES["stupid_backoff_logprob"] = q_stupid_backoff_logprob

ORACLE_SQL["stupid_backoff_logprob"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    w AS (SELECT unnest(t) AS token FROM toks),
    uc AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    tt AS (SELECT sum(c) AS T FROM uc),
    bg AS (
        SELECT t[i] AS x, t[i + 1] AS y
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ),
    bc AS (SELECT x, y, count(*) AS c FROM bg GROUP BY x, y),
    pos AS (
        SELECT doc_id, t[i] AS x, t[i + 1] AS y
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
    ),
    scored AS (
        SELECT pos.doc_id,
               CASE WHEN bc.c IS NOT NULL
                    THEN ln(bc.c * 1.0 / ux.c)
                    ELSE ln(0.4 * uy.c / tt.T)
               END AS s
        FROM pos
        LEFT JOIN bc ON bc.x = pos.x AND bc.y = pos.y
        JOIN uc ux ON ux.token = pos.x
        JOIN uc uy ON uy.token = pos.y, tt
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(s) / count(*), 6) AS sb_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


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


NOSQL_QUERIES["huffman_code_lengths"] = q_huffman_code_lengths


# ---------------------------------------------------------------------------
# Neyman allocation / Gonzalez k-center greedy
# ---------------------------------------------------------------------------

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


SQL_QUERIES["neyman_allocation"] = q_neyman_allocation

ORACLE_SQL["neyman_allocation"] = """
    WITH s AS (
        SELECT source, count(*) AS n, sum(n_chars) AS sm,
               sum(n_chars * n_chars) AS ss
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n,
               n * sqrt(CASE WHEN n > 1
                             THEN (ss - sm * sm * 1.0 / n) / (n - 1)
                             ELSE 0.0 END) AS w
        FROM s
    ),
    t AS (SELECT sum(w) AS tot FROM w)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(w / nullif(tot, 0), 6) AS share,
           CAST(coalesce(floor(1000 * (w / nullif(tot, 0))), 0) AS BIGINT)
               AS n_alloc
    FROM w, t ORDER BY source
"""


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


SQL_QUERIES["kcenter_greedy"] = q_kcenter_greedy

ORACLE_SQL["kcenter_greedy"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c1 AS (SELECT vec_id, v FROM e WHERE vec_id = 0),
    d2 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c1 c GROUP BY e.vec_id, e.v
    ),
    p2 AS (SELECT vec_id, v, d FROM d2 ORDER BY d DESC, vec_id LIMIT 1),
    c2 AS (SELECT vec_id, v FROM c1 UNION ALL SELECT vec_id, v FROM p2),
    d3 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c2 c GROUP BY e.vec_id, e.v
    ),
    p3 AS (SELECT vec_id, v, d FROM d3 ORDER BY d DESC, vec_id LIMIT 1),
    c3 AS (SELECT vec_id, v FROM c2 UNION ALL SELECT vec_id, v FROM p3),
    d4 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c3 c GROUP BY e.vec_id, e.v
    ),
    p4 AS (SELECT vec_id, v, d FROM d4 ORDER BY d DESC, vec_id LIMIT 1),
    c4 AS (SELECT vec_id, v FROM c3 UNION ALL SELECT vec_id, v FROM p4),
    d5 AS (
        SELECT e.vec_id, e.v, min(list_distance(e.v, c.v)) AS d
        FROM e, c4 c GROUP BY e.vec_id, e.v
    ),
    p5 AS (SELECT vec_id, v, d FROM d5 ORDER BY d DESC, vec_id LIMIT 1)
    SELECT 1 AS step, 0 AS vec_id, 0.0 AS dist
    UNION ALL SELECT 2, vec_id, round(d, 4) FROM p2
    UNION ALL SELECT 3, vec_id, round(d, 4) FROM p3
    UNION ALL SELECT 4, vec_id, round(d, 4) FROM p4
    UNION ALL SELECT 5, vec_id, round(d, 4) FROM p5
    ORDER BY step
"""


# ---------------------------------------------------------------------------
# rank correlation between centralities (Kendall tau-b + Spearman rho)
# ---------------------------------------------------------------------------

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


SQL_QUERIES["rank_correlation"] = q_rank_correlation

ORACLE_SQL["rank_correlation"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    deg AS (
        SELECT nodes.n, count(e.src) AS d
        FROM nodes LEFT JOIN e ON e.src = nodes.n GROUP BY nodes.n
    ),
    r0 AS (SELECT n, 1.0 AS x FROM nodes),
    r1 AS (
        SELECT nodes.n, 1.0 + 0.05 * coalesce(sum(r0.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r0 ON r0.n = e.src
        GROUP BY nodes.n
    ),
    r2 AS (
        SELECT nodes.n, 1.0 + 0.05 * coalesce(sum(r1.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r1 ON r1.n = e.src
        GROUP BY nodes.n
    ),
    r3 AS (
        SELECT nodes.n, 1.0 + 0.05 * coalesce(sum(r2.x), 0) AS x
        FROM nodes LEFT JOIN e ON e.dst = nodes.n LEFT JOIN r2 ON r2.n = e.src
        GROUP BY nodes.n
    ),
    v AS (
        SELECT deg.n, deg.d AS x, round(r3.x, 6) AS y
        FROM deg JOIN r3 ON r3.n = deg.n
    ),
    pairs AS (
        SELECT sign(a.x - b.x) * sign(a.y - b.y) AS s
        FROM v a JOIN v b ON a.n < b.n
    ),
    cd AS (
        SELECT count(*) FILTER (s > 0) AS C, count(*) FILTER (s < 0) AS D
        FROM pairs
    ),
    nn AS (SELECT count(*) AS n FROM v),
    tx AS (
        SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n1
        FROM (SELECT count(*) AS t FROM v GROUP BY x)
    ),
    ty AS (
        SELECT coalesce(sum(t * (t - 1) // 2), 0) AS n2
        FROM (SELECT count(*) AS t FROM v GROUP BY y)
    ),
    rk AS (
        SELECT n,
               2 * (count(*) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                    - count(*) OVER (PARTITION BY x)) +
               count(*) OVER (PARTITION BY x) + 1 AS rx,
               2 * (count(*) OVER (ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
                    - count(*) OVER (PARTITION BY y)) +
               count(*) OVER (PARTITION BY y) + 1 AS ry
        FROM v
    ),
    sp AS (
        SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
        FROM rk
    )
    SELECT CAST(nn.n AS BIGINT) AS n,
           CAST(cd.C AS BIGINT) AS concordant,
           CAST(cd.D AS BIGINT) AS discordant,
           round((cd.C - cd.D)
                 / sqrt((nn.n * (nn.n - 1) // 2 - tx.n1)
                        * 1.0 * (nn.n * (nn.n - 1) // 2 - ty.n2)), 6) AS tau_b,
           round((sp.n * sp.sxy - sp.sx * sp.sy)
                 / sqrt((sp.n * sp.sxx - sp.sx * sp.sx)
                        * 1.0 * (sp.n * sp.syy - sp.sy * sp.sy)), 6) AS spearman
    FROM cd, nn, tx, ty, sp
"""


# ---------------------------------------------------------------------------
# paired gate comparison (McNemar) / 4-filter ablation table
# ---------------------------------------------------------------------------

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


SQL_QUERIES["mcnemar_gates"] = q_mcnemar_gates


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
        bl = ray.get(bl_ref)
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
                hit = any(
                    " ".join(toks[i : i + n]) in bl
                    for i in range(len(toks) - n + 1)
                )
                out["x"].append(int(hit))
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


SQL_QUERIES["filter_ablation"] = q_filter_ablation

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

ORACLE_SQL["mcnemar_gates"] = (
    "WITH " + _C4_LINES_SQL.format() + "," + _GATES_SQL + """,
    j AS (SELECT gk.g, c4k.c FROM gk JOIN c4k USING (doc_id)),
    cells AS (
        SELECT count(*) FILTER (g = 1 AND c = 1) AS n11,
               count(*) FILTER (g = 1 AND c = 0) AS n10,
               count(*) FILTER (g = 0 AND c = 1) AS n01,
               count(*) FILTER (g = 0 AND c = 0) AS n00
        FROM j
    )
    SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           round((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) * 1.0
                 / nullif(n10 + n01, 0), 6) AS mcnemar
    FROM cells
"""
)

ORACLE_SQL["filter_ablation"] = (
    "WITH " + _C4_LINES_SQL.format() + "," + _GATES_SQL + r""",
    grams4 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 2),
                                     i -> list_aggregate(t[i:i+3], 'string_agg', ' ')))
                   AS g4
        FROM toks
    ),
    test AS (
        SELECT DISTINCT g4 FROM grams4
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 97 = 0
    ),
    hits AS (
        SELECT gr.doc_id, count(*) AS nh
        FROM grams4 gr JOIN test USING (g4)
        WHERE md5_number_lower(CAST(gr.doc_id AS VARCHAR)) % 97 <> 0
        GROUP BY gr.doc_id
    ),
    decon AS (
        SELECT d.doc_id,
               CASE WHEN md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 97 = 0 THEN 1
                    WHEN coalesce(h.nh, 0) > 0 THEN 1 ELSE 0 END AS x
        FROM documents d LEFT JOIN hits h USING (doc_id)
    ),
    dup AS (
        SELECT doc_id,
               CAST(doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS BIGINT)
                   AS dp
        FROM documents
    )
    SELECT gk.g AS gopher_keep, c4k.c AS c4_keep,
           CAST(decon.x AS BIGINT) AS decon_drop, dup.dp AS is_dup,
           CAST(count(*) AS BIGINT) AS n
    FROM gk JOIN c4k USING (doc_id) JOIN decon USING (doc_id)
            JOIN dup USING (doc_id)
    GROUP BY gk.g, c4k.c, decon.x, dup.dp
    ORDER BY gopher_keep, c4_keep, decon_drop, is_dup
"""
)


# ---------------------------------------------------------------------------
# TrustRank (seeded anti-spam PageRank)
# ---------------------------------------------------------------------------

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


SQL_QUERIES["trustrank"] = q_trustrank

ORACLE_SQL["trustrank"] = """
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    sd AS (
        SELECT n, CASE WHEN n < 5 THEN 1.0 / 5 ELSE 0.0 END AS d FROM nodes
    ),
    r0 AS (SELECT n, d AS x FROM sd),
    r1 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum(r0.x / deg.outdeg), 0)
               + 0.15 * any_value(sd.d) AS x
        FROM nodes JOIN sd ON sd.n = nodes.n
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN r0 ON r0.n = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY nodes.n
    ),
    r2 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum(r1.x / deg.outdeg), 0)
               + 0.15 * any_value(sd.d) AS x
        FROM nodes JOIN sd ON sd.n = nodes.n
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN r1 ON r1.n = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY nodes.n
    ),
    r3 AS (
        SELECT nodes.n,
               0.85 * coalesce(sum(r2.x / deg.outdeg), 0)
               + 0.15 * any_value(sd.d) AS x
        FROM nodes JOIN sd ON sd.n = nodes.n
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN r2 ON r2.n = e.src
        LEFT JOIN deg ON deg.src = e.src
        GROUP BY nodes.n
    )
    SELECT n AS node, round(x, 6) AS trust FROM r3 ORDER BY node
"""


def q_line_dedup(sf_dir: str, seg: int = 8):
    """CCNet-style segment-level exact dedup (Wenzek et al. 2020 dedupe
    paragraph hashes corpus-wide; C4 drops repeated three-sentence spans):
    split each doc into non-overlapping ``seg``-token segments, keep only
    the globally FIRST occurrence (smallest (doc_id, seg_idx)) of each
    distinct segment, report per-doc survival.  Shape: one row per segment,
    pre-bucketed by a 64-bit md5 hash of the segment text (256-way); the
    keeper decision is a vectorized first-occurrence mask inside each
    bucket group (a bucket co-locates all copies of a segment but holds
    many segments, never the corpus); per-doc counts reunite through one
    groupby — no join, no driver-side state.  At 10^10 docs the only
    all-to-all is the segment-row shuffle; swap the segment strings for
    128-bit hashes to cut shuffle bytes (same trick as dup_span_fraction)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from ..stages.dedup import _hash_strings64

    def emit(b: pa.Table) -> pa.Table:
        ds_, is_, gs = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            toks = re.findall(r"\S+", t)
            for k in range(0, len(toks), seg):
                ds_.append(d)
                is_.append(k // seg + 1)
                gs.append(" ".join(toks[k : k + seg]))
        gb = (_hash_strings64(gs) % np.uint64(256)).astype(np.int64)
        return pa.table(
            {
                "gb": pa.array(gb, pa.int64()),
                "g": pa.array(gs, pa.string()),
                "doc_id": pa.array(ds_, pa.int64()),
                "seg_idx": pa.array(is_, pa.int64()),
            }
        )

    rows = docs.map_batches(emit, batch_format="pyarrow")

    def keep(b: pa.Table) -> pa.Table:
        df = (
            b.select(["g", "doc_id", "seg_idx"])
            .to_pandas()
            .sort_values(["g", "doc_id", "seg_idx"], kind="mergesort")
        )
        kept = (~df.duplicated("g")).to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "kept": pa.array(kept, pa.int64()),
                "one": pa.array(np.ones(len(df), np.int64), pa.int64()),
            }
        )

    agg = (
        rows.groupby("gb")
        .map_groups(keep, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("kept", alias_name="kept_segs"), Sum("one", alias_name="n_segs")
        )
        .to_pandas()
    )
    agg["dropped_segs"] = agg["n_segs"] - agg["kept_segs"]
    agg["kept_frac"] = _r(agg["kept_segs"] / agg["n_segs"], 6)
    return (
        agg[["doc_id", "n_segs", "kept_segs", "dropped_segs", "kept_frac"]]
        .astype(
            {
                "doc_id": "int64",
                "n_segs": "int64",
                "kept_segs": "int64",
                "dropped_segs": "int64",
            }
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SQL_QUERIES["line_dedup"] = q_line_dedup

ORACLE_SQL["line_dedup"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    segs AS (
        SELECT doc_id,
               unnest(range(1, CAST(ceil(len(t) / 8.0) AS BIGINT) + 1)) AS seg_idx,
               unnest(list_transform(
                   range(1, CAST(ceil(len(t) / 8.0) AS BIGINT) + 1),
                   k -> list_aggregate(t[(k-1)*8+1:k*8], 'string_agg', ' '))) AS g
        FROM toks
    ),
    rk AS (
        SELECT doc_id, seg_idx,
               row_number() OVER (PARTITION BY g ORDER BY doc_id, seg_idx) AS rn
        FROM segs
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_segs,
           round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS kept_frac
    FROM rk GROUP BY doc_id ORDER BY doc_id
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


SQL_QUERIES["salsa"] = q_salsa

ORACLE_SQL["salsa"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
    ind AS (SELECT dst, count(*) AS idg FROM e GROUP BY dst),
    a0 AS (SELECT n, 1.0 / 50 AS a FROM nodes),
    h1 AS (
        SELECT e.src AS n, sum(a0.a / ind.idg) AS h
        FROM e JOIN a0 ON a0.n = e.dst JOIN ind ON ind.dst = e.dst
        GROUP BY e.src
    ),
    a1 AS (
        SELECT nodes.n, coalesce(sum(h1.h / outd.od), 0) AS a
        FROM nodes
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN h1 ON h1.n = e.src
        LEFT JOIN outd ON outd.src = e.src
        GROUP BY nodes.n
    ),
    h2 AS (
        SELECT e.src AS n, sum(a1.a / ind.idg) AS h
        FROM e JOIN a1 ON a1.n = e.dst JOIN ind ON ind.dst = e.dst
        GROUP BY e.src
    ),
    a2 AS (
        SELECT nodes.n, coalesce(sum(h2.h / outd.od), 0) AS a
        FROM nodes
        LEFT JOIN e ON e.dst = nodes.n
        LEFT JOIN h2 ON h2.n = e.src
        LEFT JOIN outd ON outd.src = e.src
        GROUP BY nodes.n
    )
    SELECT n AS node, round(a, 6) AS authority FROM a2 ORDER BY node
"""


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


SQL_QUERIES["cocitation"] = q_cocitation

ORACLE_SQL["cocitation"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    cc AS (
        SELECT e1.dst AS a, e2.dst AS b, count(*) AS cocitation
        FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
        GROUP BY 1, 2
    ),
    bc AS (
        SELECT e1.src AS a, e2.src AS b, count(*) AS coupling
        FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
        GROUP BY 1, 2
    )
    SELECT coalesce(cc.a, bc.a) AS a,
           coalesce(cc.b, bc.b) AS b,
           CAST(coalesce(cc.cocitation, 0) AS BIGINT) AS cocitation,
           CAST(coalesce(bc.coupling, 0) AS BIGINT) AS coupling
    FROM cc FULL OUTER JOIN bc ON cc.a = bc.a AND cc.b = bc.b
    ORDER BY a, b
"""


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


SQL_QUERIES["gap_stats"] = q_gap_stats

ORACLE_SQL["gap_stats"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    g AS (
        SELECT src,
               coalesce(dst - lag(dst) OVER (PARTITION BY src ORDER BY dst),
                        dst + 1) AS gap
        FROM e
    ),
    b AS (SELECT src, 2 * (length(bin(gap)) - 1) + 1 AS bits FROM g)
    SELECT src,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(sum(bits) AS BIGINT) AS total_bits,
           round(sum(bits) * 1.0 / count(*), 4) AS bits_per_link
    FROM b GROUP BY src ORDER BY src
"""


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


SQL_QUERIES["count_min"] = q_count_min

ORACLE_SQL["count_min"] = r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    hashed AS (
        SELECT token, c, r,
               CAST(md5_number_lower(token || ':' || r) % 32 AS BIGINT) AS b
        FROM cnt, unnest([0, 1, 2, 3]) AS t(r)
    ),
    grid AS (SELECT r, b, sum(c) AS cell FROM hashed GROUP BY r, b),
    top AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 20),
    est AS (
        SELECT top.token, top.c, min(grid.cell) AS cms
        FROM top
        JOIN hashed ON hashed.token = top.token
        JOIN grid ON grid.r = hashed.r AND grid.b = hashed.b
        GROUP BY top.token, top.c
    )
    SELECT token,
           CAST(c AS BIGINT) AS true_count,
           CAST(cms AS BIGINT) AS cms_count
    FROM est ORDER BY true_count DESC, token
"""


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


SQL_QUERIES["simrank"] = q_simrank

ORACLE_SQL["simrank"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    ind AS (SELECT dst, count(*) AS idg FROM e GROUP BY dst),
    s1o AS (
        SELECT ea.dst AS a, eb.dst AS b,
               0.8 * sum(CASE WHEN ea.src = eb.src THEN 1 ELSE 0 END)
                   / (any_value(ia.idg) * any_value(ib.idg)) AS s
        FROM e ea
        JOIN e eb ON ea.dst <> eb.dst
        JOIN ind ia ON ia.dst = ea.dst
        JOIN ind ib ON ib.dst = eb.dst
        GROUP BY ea.dst, eb.dst
    ),
    t1 AS (
        SELECT a, b, s FROM s1o
        UNION ALL
        SELECT n, n, 1.0 FROM nodes
    ),
    s2o AS (
        SELECT ea.dst AS a, eb.dst AS b,
               0.8 * coalesce(sum(t1.s), 0)
                   / (any_value(ia.idg) * any_value(ib.idg)) AS s
        FROM e ea
        JOIN e eb ON ea.dst <> eb.dst
        LEFT JOIN t1 ON t1.a = ea.src AND t1.b = eb.src
        JOIN ind ia ON ia.dst = ea.dst
        JOIN ind ib ON ib.dst = eb.dst
        GROUP BY ea.dst, eb.dst
    )
    SELECT na.n AS a, nb.n AS b, round(coalesce(s2o.s, 0), 6) AS simrank
    FROM nodes na
    JOIN nodes nb ON na.n < nb.n
    LEFT JOIN s2o ON s2o.a = na.n AND s2o.b = nb.n
    ORDER BY a, b
"""


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


SQL_QUERIES["adamic_adar"] = q_adamic_adar

ORACLE_SQL["adamic_adar"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT DISTINCT n, nb FROM (
            SELECT src AS n, dst AS nb FROM e
            UNION ALL
            SELECT dst AS n, src AS nb FROM e
        ) WHERE n <> nb
    ),
    deg AS (SELECT n, count(*) AS d FROM und GROUP BY n),
    wedge AS (
        SELECT w1.nb AS a, w2.nb AS b, w1.n AS z
        FROM und w1 JOIN und w2 ON w1.n = w2.n AND w1.nb < w2.nb
    ),
    sc AS (
        SELECT wedge.a, wedge.b,
               count(*) AS common_neighbors,
               sum(1.0 / ln(dz.d)) AS aa
        FROM wedge JOIN deg dz ON dz.n = wedge.z
        GROUP BY wedge.a, wedge.b
    )
    SELECT sc.a, sc.b,
           CAST(sc.common_neighbors AS BIGINT) AS common_neighbors,
           round(sc.common_neighbors * 1.0
                 / (da.d + db.d - sc.common_neighbors), 6) AS jaccard,
           round(sc.aa, 6) AS adamic_adar
    FROM sc
    JOIN deg da ON da.n = sc.a
    JOIN deg db ON db.n = sc.b
    ORDER BY a, b
"""


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


SQL_QUERIES["wl_refinement"] = q_wl_refinement

ORACLE_SQL["wl_refinement"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    ind AS (SELECT dst AS n, count(*) AS d FROM e GROUP BY dst),
    outd AS (SELECT src AS n, count(*) AS d FROM e GROUP BY src),
    c0 AS (
        SELECT nodes.n,
               CAST(coalesce(ind.d, 0) * 64 + coalesce(outd.d, 0) AS BIGINT) AS c
        FROM nodes LEFT JOIN ind ON ind.n = nodes.n
        LEFT JOIN outd ON outd.n = nodes.n
    ),
    i1 AS (
        SELECT e.dst AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c0 cp ON cp.n = e.src GROUP BY e.dst
    ),
    o1 AS (
        SELECT e.src AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c0 cp ON cp.n = e.dst GROUP BY e.src
    ),
    c1 AS (
        SELECT c0.n,
               CAST(md5_number_lower(CAST(c0.c AS VARCHAR) || '|' ||
                    coalesce(i1.s, '') || '#' || coalesce(o1.s, ''))
                    % 1000000007 AS BIGINT) AS c
        FROM c0 LEFT JOIN i1 ON i1.n = c0.n LEFT JOIN o1 ON o1.n = c0.n
    ),
    i2 AS (
        SELECT e.dst AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c1 cp ON cp.n = e.src GROUP BY e.dst
    ),
    o2 AS (
        SELECT e.src AS n, string_agg(CAST(cp.c AS VARCHAR), ',' ORDER BY cp.c) AS s
        FROM e JOIN c1 cp ON cp.n = e.dst GROUP BY e.src
    ),
    c2 AS (
        SELECT c1.n,
               CAST(md5_number_lower(CAST(c1.c AS VARCHAR) || '|' ||
                    coalesce(i2.s, '') || '#' || coalesce(o2.s, ''))
                    % 1000000007 AS BIGINT) AS c
        FROM c1 LEFT JOIN i2 ON i2.n = c1.n LEFT JOIN o2 ON o2.n = c1.n
    )
    SELECT n AS node, c AS color,
           count(*) OVER (PARTITION BY c) AS class_size
    FROM c2 ORDER BY node
"""


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


SQL_QUERIES["ndcg_eval"] = q_ndcg_eval

ORACLE_SQL["ndcg_eval"] = """
    WITH r AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ),
    d AS (
        SELECT sum(rel / log2(rk + 1)) AS dcg, sum(rel) AS hits
        FROM r WHERE rk <= 10
    ),
    tot AS (SELECT count(*) AS nrel FROM r WHERE rel = 1),
    idcg AS (
        SELECT sum(1.0 / log2(i + 1)) AS v
        FROM tot, unnest(range(1, least(10, nrel) + 1)) t(i)
    ),
    mr AS (SELECT min(rk) AS frk FROM r WHERE rel = 1)
    SELECT round(d.dcg / idcg.v, 6) AS ndcg10,
           round(d.hits / 10.0, 6) AS prec10,
           round(1.0 / mr.frk, 6) AS mrr
    FROM d, idcg, mr
"""


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


SQL_QUERIES["shard_balance"] = q_shard_balance

ORACLE_SQL["shard_balance"] = """
    WITH hashed AS (
        SELECT doc_id, s, md5_number_lower(doc_id || '@' || s) AS h
        FROM documents, unnest(range(0, 16)) t(s)
    ),
    pick AS (SELECT doc_id, arg_max(s, h) AS shard FROM hashed GROUP BY doc_id),
    c AS (SELECT shard, count(*) AS n_docs FROM pick GROUP BY shard),
    tot AS (SELECT sum(n_docs) AS t FROM c)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 16.0 / tot.t, 6) AS skew
    FROM c, tot ORDER BY shard
"""


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


SQL_QUERIES["hll_audit"] = q_hll_audit

ORACLE_SQL["hll_audit"] = r"""
    WITH tok AS (
        SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    h AS (SELECT md5_number_lower(token) AS hv FROM tok),
    b AS (
        SELECT CAST(hv % 16 AS BIGINT) AS bucket,
               CAST((hv // 16) % 1099511627776 AS BIGINT) AS v
        FROM h
    ),
    r AS (
        SELECT bucket,
               CASE WHEN v = 0 THEN 41 ELSE length(bin(v & -v)) END AS rho
        FROM b
    ),
    buckets AS (SELECT i AS bucket FROM range(0, 16) t(i)),
    reg AS (
        SELECT buckets.bucket, CAST(coalesce(max(r.rho), 0) AS BIGINT) AS register
        FROM buckets LEFT JOIN r ON r.bucket = buckets.bucket
        GROUP BY buckets.bucket
    ),
    est AS (SELECT 0.673 * 256.0 / sum(power(2.0, -register)) AS e FROM reg),
    td AS (SELECT count(*) AS d FROM tok)
    SELECT reg.bucket, reg.register,
           round(est.e, 4) AS raw_estimate,
           CAST(td.d AS BIGINT) AS true_distinct
    FROM reg, est, td ORDER BY reg.bucket
"""


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


SQL_QUERIES["cdc_chunks"] = q_cdc_chunks


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


ORACLE_SQL["cdc_chunks"] = _cdc_oracle_sql()


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


SQL_QUERIES["benford_digits"] = q_benford_digits

ORACLE_SQL["benford_digits"] = """
    WITH d AS (
        SELECT CAST(substr(printf('%.6e', value), 1, 1) AS BIGINT) AS digit
        FROM events WHERE value > 0
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    digits AS (SELECT i AS digit FROM range(1, 10) t(i)),
    f AS (
        SELECT digits.digit, coalesce(c.n, 0) AS n,
               log10(1 + 1.0 / digits.digit) AS p
        FROM digits LEFT JOIN c ON c.digit = digits.digit
    ),
    tot AS (SELECT sum(n) AS t FROM f),
    chi AS (
        SELECT sum((n - t * p) * (n - t * p) / (t * p)) AS x FROM f, tot
    )
    SELECT f.digit,
           CAST(f.n AS BIGINT) AS n,
           round(f.n * 1.0 / tot.t, 6) AS obs_frac,
           round(f.p, 6) AS benford_frac,
           round(chi.x, 4) AS chi2
    FROM f, tot, chi ORDER BY f.digit
"""


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


SQL_QUERIES["walk_corpus"] = q_walk_corpus

ORACLE_SQL["walk_corpus"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    w1 AS (
        SELECT nodes.n AS start,
               arg_min(e.dst, md5_number_lower(nodes.n || '>' || 1 || '>' || e.dst))
                   AS node
        FROM nodes JOIN e ON e.src = nodes.n GROUP BY nodes.n
    ),
    w2 AS (
        SELECT w1.start,
               arg_min(e.dst, md5_number_lower(w1.node || '>' || 2 || '>' || e.dst))
                   AS node
        FROM w1 JOIN e ON e.src = w1.node GROUP BY w1.start
    ),
    w3 AS (
        SELECT w2.start,
               arg_min(e.dst, md5_number_lower(w2.node || '>' || 3 || '>' || e.dst))
                   AS node
        FROM w2 JOIN e ON e.src = w2.node GROUP BY w2.start
    ),
    w4 AS (
        SELECT w3.start,
               arg_min(e.dst, md5_number_lower(w3.node || '>' || 4 || '>' || e.dst))
                   AS node
        FROM w3 JOIN e ON e.src = w3.node GROUP BY w3.start
    )
    SELECT start, 1 AS step, node FROM w1
    UNION ALL SELECT start, 2, node FROM w2
    UNION ALL SELECT start, 3, node FROM w3
    UNION ALL SELECT start, 4, node FROM w4
    ORDER BY step, start
"""


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


SQL_QUERIES["late_arrivals"] = q_late_arrivals

ORACLE_SQL["late_arrivals"] = """
    WITH w AS (
        SELECT event_type, ts,
               max(ts) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS seen
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ts < seen - INTERVAL 1 HOUR THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           round(sum(CASE WHEN ts < seen - INTERVAL 1 HOUR THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS late_frac
    FROM w GROUP BY event_type ORDER BY event_type
"""


_FUNNEL_STAGES = ("view", "click", "signup", "purchase")


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


SQL_QUERIES["funnel_conversion"] = q_funnel_conversion

ORACLE_SQL["funnel_conversion"] = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
        WHERE e.event_type = 'signup' GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN s3 ON s3.user_id = e.user_id AND e.ts > s3.t
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    f AS (
        SELECT 1 AS step, 'view' AS stage, count(*) AS n_users FROM s1
        UNION ALL SELECT 2, 'click', count(*) FROM s2
        UNION ALL SELECT 3, 'signup', count(*) FROM s3
        UNION ALL SELECT 4, 'purchase', count(*) FROM s4
    ),
    b AS (SELECT greatest(max(CASE WHEN step = 1 THEN n_users END), 1) AS base FROM f)
    SELECT CAST(f.step AS BIGINT) AS step, f.stage,
           CAST(f.n_users AS BIGINT) AS n_users,
           round(f.n_users * 1.0 / b.base, 6) AS conversion
    FROM f, b ORDER BY f.step
"""


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
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    mx = ev.max("ts")
    mref = ray.put(np.datetime64(mx, "us"))

    def fold(b: pa.Table, _m=mref) -> pa.Table:
        m = ray.get(_m).astype("int64")
        df = b.select(["ts", "event_type"]).to_pandas().sort_values("ts")
        sg = df[df["event_type"] == "signup"]
        if sg.empty:
            return pa.table(
                {"dur": pa.array([], pa.int64()), "ev": pa.array([], pa.int64())}
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
            {"dur": pa.array([dur], pa.int64()), "ev": pa.array([evt], pa.int64())}
        )

    obs = (
        ev.groupby("user_id")
        .map_groups(fold, batch_format="pyarrow")
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


SQL_QUERIES["kaplan_meier"] = q_kaplan_meier

ORACLE_SQL["kaplan_meier"] = """
    WITH su AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    pu AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN su ON su.user_id = e.user_id AND e.ts > su.t0
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    mx AS (SELECT max(ts) AS m FROM events),
    obs AS (
        SELECT su.user_id,
               CASE WHEN pu.t1 IS NOT NULL
                    THEN epoch_us(pu.t1) - epoch_us(su.t0)
                    ELSE epoch_us(mx.m) - epoch_us(su.t0) END AS dur,
               CASE WHEN pu.t1 IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM su LEFT JOIN pu ON pu.user_id = su.user_id CROSS JOIN mx
    ),
    tt AS (SELECT dur AS t, count(*) AS d FROM obs WHERE ev = 1 GROUP BY dur),
    rk AS (
        SELECT tt.t, tt.d,
               (SELECT count(*) FROM obs WHERE obs.dur >= tt.t) AS n
        FROM tt
    )
    SELECT CAST(t AS BIGINT) AS t_us,
           CAST(n AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CASE WHEN max(CASE WHEN d = n THEN 1 ELSE 0 END)
                     OVER (ORDER BY t) = 1 THEN 0.0
                ELSE round(exp(sum(CASE WHEN d < n THEN ln(1 - d * 1.0 / n)
                                        ELSE 0 END) OVER (ORDER BY t)), 6)
           END AS survival
    FROM rk ORDER BY t
"""


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


SQL_QUERIES["bipartite_check"] = q_bipartite_check

ORACLE_SQL["bipartite_check"] = """
    WITH RECURSIVE e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
        ) WHERE src <> dst
    ),
    b AS (
        SELECT 0 AS node, 0 AS d
        UNION
        SELECT und.dst, b.d + 1 FROM b JOIN und ON und.src = b.node
        WHERE b.d < 50
    ),
    md AS (SELECT node, min(d) AS depth FROM b GROUP BY node),
    conf AS (
        SELECT count(*) AS c
        FROM und JOIN md ma ON ma.node = und.src JOIN md mb ON mb.node = und.dst
        WHERE und.src < und.dst AND ma.depth % 2 = mb.depth % 2
    )
    SELECT md.node, md.depth, md.depth % 2 AS parity,
           CAST(conf.c AS BIGINT) AS n_conflict_edges,
           conf.c = 0 AS is_bipartite
    FROM md, conf ORDER BY md.node
"""


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


SQL_QUERIES["cuped"] = q_cuped

ORACLE_SQL["cuped"] = """
    WITH r AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS k
        FROM events
    ),
    xy AS (
        SELECT user_id, user_id % 2 AS arm,
               sum(CASE WHEN rn <= k // 2 THEN cents ELSE 0 END) / 100.0 AS x,
               sum(CASE WHEN rn > k // 2 THEN cents ELSE 0 END) / 100.0 AS y
        FROM r GROUP BY user_id
    ),
    g AS (SELECT avg(x) AS mx, avg(y) AS my FROM xy),
    th AS (
        SELECT CASE WHEN sum((x - mx) * (x - mx)) = 0 THEN 0
               ELSE sum((x - mx) * (y - my)) / sum((x - mx) * (x - mx)) END AS theta
        FROM xy, g
    )
    SELECT CAST(xy.arm AS BIGINT) AS arm,
           CAST(count(*) AS BIGINT) AS n_users,
           round(avg(xy.y), 6) AS mean_y,
           round(avg(xy.y - th.theta * (xy.x - g.mx)), 6) AS mean_y_adj,
           round(th.theta, 6) AS theta
    FROM xy, g, th GROUP BY xy.arm, th.theta, g.mx ORDER BY arm
"""


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


SQL_QUERIES["hitting_time"] = q_hitting_time

ORACLE_SQL["hitting_time"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    outd AS (SELECT src, count(*) AS od FROM e GROUP BY src),
    h0 AS (SELECT n, 0.0 AS h FROM nodes),
    h1 AS (
        SELECT nodes.n,
               CASE WHEN nodes.n = 0 THEN 0.0
                    ELSE 1.0 + coalesce(sum(h0.h) / any_value(outd.od), 0) END AS h
        FROM nodes
        LEFT JOIN e ON e.src = nodes.n
        LEFT JOIN h0 ON h0.n = e.dst
        LEFT JOIN outd ON outd.src = nodes.n
        GROUP BY nodes.n
    ),
    h2 AS (
        SELECT nodes.n,
               CASE WHEN nodes.n = 0 THEN 0.0
                    ELSE 1.0 + coalesce(sum(h1.h) / any_value(outd.od), 0) END AS h
        FROM nodes
        LEFT JOIN e ON e.src = nodes.n
        LEFT JOIN h1 ON h1.n = e.dst
        LEFT JOIN outd ON outd.src = nodes.n
        GROUP BY nodes.n
    ),
    h3 AS (
        SELECT nodes.n,
               CASE WHEN nodes.n = 0 THEN 0.0
                    ELSE 1.0 + coalesce(sum(h2.h) / any_value(outd.od), 0) END AS h
        FROM nodes
        LEFT JOIN e ON e.src = nodes.n
        LEFT JOIN h2 ON h2.n = e.dst
        LEFT JOIN outd ON outd.src = nodes.n
        GROUP BY nodes.n
    )
    SELECT n AS node, round(h, 6) AS hitting_time FROM h3 ORDER BY node
"""


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


SQL_QUERIES["set_cover_greedy"] = q_set_cover_greedy

# 5 unrolled greedy rounds; per round pick the doc with the largest count
# of tokens not yet covered (ties -> min doc_id), then fold its tokens in.
ORACLE_SQL["set_cover_greedy"] = r"""
    WITH sets AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(text), '\s+')) AS s
        FROM documents
    ),
    p1 AS (
        SELECT doc_id, len(s) AS gain FROM sets
        ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c1 AS (SELECT sets.s AS cov FROM sets JOIN p1 USING (doc_id)),
    p2 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c1.cov, x))) AS gain
        FROM sets, c1 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c2 AS (
        SELECT list_distinct(list_concat(c1.cov, sets.s)) AS cov
        FROM sets, c1 WHERE sets.doc_id = (SELECT doc_id FROM p2)
    ),
    p3 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c2.cov, x))) AS gain
        FROM sets, c2 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c3 AS (
        SELECT list_distinct(list_concat(c2.cov, sets.s)) AS cov
        FROM sets, c2 WHERE sets.doc_id = (SELECT doc_id FROM p3)
    ),
    p4 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c3.cov, x))) AS gain
        FROM sets, c3 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c4 AS (
        SELECT list_distinct(list_concat(c3.cov, sets.s)) AS cov
        FROM sets, c3 WHERE sets.doc_id = (SELECT doc_id FROM p4)
    ),
    p5 AS (
        SELECT sets.doc_id,
               len(list_filter(sets.s, x -> NOT list_contains(c4.cov, x))) AS gain
        FROM sets, c4 ORDER BY gain DESC, doc_id LIMIT 1
    ),
    c5 AS (
        SELECT list_distinct(list_concat(c4.cov, sets.s)) AS cov
        FROM sets, c4 WHERE sets.doc_id = (SELECT doc_id FROM p5)
    )
    SELECT 1 AS step, p1.doc_id, p1.gain, len(c1.cov) AS covered_vocab FROM p1, c1
    UNION ALL SELECT 2, p2.doc_id, p2.gain, len(c2.cov) FROM p2, c2
    UNION ALL SELECT 3, p3.doc_id, p3.gain, len(c3.cov) FROM p3, c3
    UNION ALL SELECT 4, p4.doc_id, p4.gain, len(c4.cov) FROM p4, c4
    UNION ALL SELECT 5, p5.doc_id, p5.gain, len(c5.cov) FROM p5, c5
    ORDER BY step
"""


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


SQL_QUERIES["knapsack_select"] = q_knapsack_select

ORACLE_SQL["knapsack_select"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ),
    q AS (
        SELECT doc_id, len(w) AS n_tokens,
               round(len(list_distinct(w)) * 1.0 / len(w), 6) AS quality
        FROM t
    ),
    r AS (
        SELECT doc_id, n_tokens, quality,
               sum(n_tokens) OVER (
                   ORDER BY quality DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM q
    )
    SELECT doc_id, n_tokens, quality, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= 5000
    ORDER BY quality DESC, doc_id
"""


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


SQL_QUERIES["containment_pairs"] = q_containment_pairs

ORACLE_SQL["containment_pairs"] = r"""
    WITH sets AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(trim(text), '\s+')) AS s
        FROM documents
    )
    SELECT a.doc_id AS pair_id,
           round(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6)
               AS cont_a_in_b,
           round(len(list_intersect(a.s, b.s)) * 1.0 / len(b.s), 6)
               AS cont_b_in_a
    FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1
    ORDER BY pair_id
"""


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


SQL_QUERIES["rbo_overlap"] = q_rbo_overlap

ORACLE_SQL["rbo_overlap"] = r"""
    WITH q AS (
        SELECT doc_id, n_chars,
               round(len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
                     * 1.0 / len(regexp_split_to_array(trim(text), '\s+')), 6)
                   AS quality
        FROM documents
    ),
    ra AS (
        SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        FROM q
    ),
    rb AS (
        SELECT doc_id, row_number() OVER (ORDER BY quality DESC, doc_id) AS r
        FROM q
    ),
    d AS (SELECT i AS depth FROM range(1, 11) t(i)),
    ov AS (
        SELECT d.depth,
               (SELECT count(*) FROM ra JOIN rb USING (doc_id)
                WHERE ra.r <= d.depth AND rb.r <= d.depth) AS a
        FROM d
    )
    SELECT round(sum(0.1 * power(0.9, depth - 1) * a / depth), 6) AS rbo10,
           CAST(max(CASE WHEN depth = 10 THEN a END) AS BIGINT) AS overlap10
    FROM ov
"""


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


SQL_QUERIES["info_gain"] = q_info_gain

ORACLE_SQL["info_gain"] = """
    WITH mx AS (SELECT max(n_chars) AS m FROM documents),
    th AS (
        SELECT i AS k, CAST(i * m // 10 AS BIGINT) AS threshold
        FROM mx, unnest(range(1, 10)) t(i)
    ),
    s AS (
        SELECT th.k, th.threshold,
               count(*) AS n,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
               sum(CASE WHEN n_chars <= th.threshold THEN 1 ELSE 0 END) AS nl,
               sum(CASE WHEN n_chars <= th.threshold AND lang = 'en'
                        THEN 1 ELSE 0 END) AS pl
        FROM documents, th GROUP BY th.k, th.threshold
    ),
    e AS (
        SELECT k, threshold, n, pos, nl, pl,
               n - nl AS nr, pos - pl AS prr FROM s
    ),
    ig AS (
        SELECT k, threshold, nl,
               (CASE WHEN pos IN (0, n) THEN 0
                     ELSE -(pos * 1.0 / n) * ln(pos * 1.0 / n)
                          - (1 - pos * 1.0 / n) * ln(1 - pos * 1.0 / n) END)
               - (nl * 1.0 / n) *
                 (CASE WHEN nl = 0 OR pl IN (0, nl) THEN 0
                       ELSE -(pl * 1.0 / nl) * ln(pl * 1.0 / nl)
                            - (1 - pl * 1.0 / nl) * ln(1 - pl * 1.0 / nl) END)
               - (nr * 1.0 / n) *
                 (CASE WHEN nr = 0 OR prr IN (0, nr) THEN 0
                       ELSE -(prr * 1.0 / nr) * ln(prr * 1.0 / nr)
                            - (1 - prr * 1.0 / nr) * ln(1 - prr * 1.0 / nr) END)
                   AS g
        FROM e
    )
    SELECT k, threshold, CAST(e.nl AS BIGINT) AS n_left,
           round(ig.g, 6) AS info_gain,
           round(ig.g, 6) = (SELECT max(round(g, 6)) FROM ig) AS is_best
    FROM ig JOIN e USING (k, threshold) ORDER BY k
"""


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


SQL_QUERIES["triadic_closure"] = q_triadic_closure

ORACLE_SQL["triadic_closure"] = """
    WITH e0 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 0
    ),
    e1 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 1
    ),
    w AS (
        SELECT DISTINCT a1.dst AS a, a2.dst AS b
        FROM e0 a1 JOIN e0 a2 ON a1.src = a2.src AND a1.dst < a2.dst
    ),
    c AS (
        SELECT w.a, w.b,
               CASE WHEN EXISTS (
                   SELECT 1 FROM e1
                   WHERE (e1.src = w.a AND e1.dst = w.b)
                      OR (e1.src = w.b AND e1.dst = w.a)
               ) THEN 1 ELSE 0 END AS closed
        FROM w
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(closed) AS BIGINT) AS n_closed,
           round(sum(closed) * 1.0 / count(*), 6) AS closure_rate
    FROM c
"""


def q_snapshot_drift(sf_dir: str):
    """Structural drift between the two temporal half-snapshots of the
    link graph (even vs odd event_id): out-degree distributions of the
    distinct edge sets, compared per degree value with the total-
    variation distance 0.5 * sum |p0 - p1| — the cheap "did the graph's
    shape change" monitor that triggers recrawls / model refreshes.
    Two degree groupbys (tiny), one driver fold over the degree-value
    union."""
    d0 = (
        _distinct_edges_parity(sf_dir, 0)
        .groupby("src")
        .count()
        .to_pandas()
        .groupby("count()")
        .size()
    )
    d1 = (
        _distinct_edges_parity(sf_dir, 1)
        .groupby("src")
        .count()
        .to_pandas()
        .groupby("count()")
        .size()
    )
    degs = sorted(set(d0.index) | set(d1.index))
    n0, n1 = float(d0.sum()), float(d1.sum())
    rows = []
    tv = 0.0
    for dg in degs:
        p0 = int(d0.get(dg, 0)) / n0
        p1 = int(d1.get(dg, 0)) / n1
        tv += abs(p0 - p1)
    tv *= 0.5
    for dg in degs:
        rows.append(
            (
                int(dg),
                int(d0.get(dg, 0)),
                int(d1.get(dg, 0)),
                float(_r(int(d0.get(dg, 0)) / n0, 6)),
                float(_r(int(d1.get(dg, 0)) / n1, 6)),
                float(_r(tv, 6)),
            )
        )
    return pd.DataFrame(
        rows, columns=["outdeg", "n_early", "n_late", "p_early", "p_late", "tv_dist"]
    ).astype({"outdeg": "int64", "n_early": "int64", "n_late": "int64"})


SQL_QUERIES["snapshot_drift"] = q_snapshot_drift

ORACLE_SQL["snapshot_drift"] = """
    WITH e0 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 0
    ),
    e1 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 1
    ),
    g0 AS (SELECT src, count(*) AS d FROM e0 GROUP BY src),
    g1 AS (SELECT src, count(*) AS d FROM e1 GROUP BY src),
    h0 AS (SELECT d AS outdeg, count(*) AS n FROM g0 GROUP BY d),
    h1 AS (SELECT d AS outdeg, count(*) AS n FROM g1 GROUP BY d),
    u AS (
        SELECT coalesce(h0.outdeg, h1.outdeg) AS outdeg,
               coalesce(h0.n, 0) AS n_early,
               coalesce(h1.n, 0) AS n_late
        FROM h0 FULL OUTER JOIN h1 ON h0.outdeg = h1.outdeg
    ),
    t AS (SELECT sum(n_early) AS t0, sum(n_late) AS t1 FROM u),
    tv AS (
        SELECT 0.5 * sum(abs(n_early * 1.0 / t.t0 - n_late * 1.0 / t.t1)) AS v
        FROM u, t
    )
    SELECT u.outdeg, u.n_early, u.n_late,
           round(u.n_early * 1.0 / t.t0, 6) AS p_early,
           round(u.n_late * 1.0 / t.t1, 6) AS p_late,
           round(tv.v, 6) AS tv_dist
    FROM u, t, tv ORDER BY u.outdeg
"""


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


SQL_QUERIES["rich_club"] = q_rich_club

ORACLE_SQL["rich_club"] = """
    WITH e AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    und AS (
        SELECT DISTINCT n, nb FROM (
            SELECT src AS n, dst AS nb FROM e
            UNION ALL SELECT dst, src FROM e
        ) WHERE n <> nb
    ),
    deg AS (SELECT n, count(*) AS d FROM und GROUP BY n),
    ks AS (SELECT unnest([1, 2, 4, 8]) AS k),
    nn AS (
        SELECT ks.k, count(*) AS n_nodes
        FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY ks.k
    ),
    ee AS (
        SELECT ks.k, count(*) AS n_edges
        FROM ks
        LEFT JOIN und ON und.n < und.nb
        JOIN deg da ON da.n = und.n AND da.d > ks.k
        JOIN deg db ON db.n = und.nb AND db.d > ks.k
        GROUP BY ks.k
    )
    SELECT nn.k,
           CAST(nn.n_nodes AS BIGINT) AS n_nodes,
           CAST(coalesce(ee.n_edges, 0) AS BIGINT) AS n_edges,
           CASE WHEN nn.n_nodes > 1
                THEN round(2.0 * coalesce(ee.n_edges, 0)
                           / (nn.n_nodes * (nn.n_nodes - 1)), 6)
                ELSE 0.0 END AS phi
    FROM nn LEFT JOIN ee ON ee.k = nn.k ORDER BY nn.k
"""


def q_cosine_pairs(sf_dir: str):
    """TF-IDF-weighted cosine similarity for consecutive doc pairs — the
    weighted counterpart of jaccard_pairs/containment_pairs (rare shared
    terms count more, boilerplate counts less).  idf = ln(N/df) from one
    vocab groupby, broadcast (31 terms here; bucket-hash it at web
    scale); pairs co-locate through the same (pair_id, role) shuffle and
    the cosine happens in-group on the two tf vectors."""
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def dfs(b: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for t in b.column("text").to_pylist():
            c.update(set(re.findall(r"\S+", t)))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    df_tab = (
        docs.map_batches(dfs, batch_format="pyarrow").groupby("token").sum("c").to_pandas()
    )
    idf = {
        t: float(np.log(n_docs / c))
        for t, c in zip(df_tab["token"], df_tab["sum(c)"])
    }
    iref = ray.put(idf)

    def emit_roles(b: pa.Table) -> pa.Table:
        pair_ids, roles, toks = [], [], []
        for i, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            tl = re.findall(r"\S+", t)
            if i + 1 < n_docs:
                pair_ids.append(i)
                roles.append("a")
                toks.append(tl)
            if i - 1 >= 0:
                pair_ids.append(i - 1)
                roles.append("b")
                toks.append(tl)
        return pa.table(
            {
                "pair_id": pa.array(pair_ids, pa.int64()),
                "role": pa.array(roles, pa.string()),
                "tokens": pa.array(toks, pa.list_(pa.string())),
            }
        )

    def cosine(group: pa.Table, _i=iref) -> pa.Table:
        if group.num_rows != 2:
            return pa.table(
                {
                    "pair_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        idf_ = ray.get(_i)
        from collections import Counter

        df = group.to_pandas().sort_values("role")
        wa = {t: c * idf_[t] for t, c in Counter(df["tokens"].iloc[0]).items()}
        wb = {t: c * idf_[t] for t, c in Counter(df["tokens"].iloc[1]).items()}
        dot = sum(wa[t] * wb[t] for t in sorted(set(wa) & set(wb)))
        na = np.sqrt(sum(v * v for v in wa.values()))
        nb_ = np.sqrt(sum(v * v for v in wb.values()))
        sim = dot / (na * nb_) if na > 0 and nb_ > 0 else 0.0
        return pa.table(
            {
                "pair_id": pa.array([int(df["pair_id"].iloc[0])], pa.int64()),
                "cosine": pa.array([float(_r(sim, 6))], pa.float64()),
            }
        )

    return (
        docs.map_batches(emit_roles, batch_format="pyarrow")
        .groupby("pair_id")
        .map_groups(cosine, batch_format="pyarrow")
        .sort("pair_id")
    )


SQL_QUERIES["cosine_pairs"] = q_cosine_pairs

ORACLE_SQL["cosine_pairs"] = r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY doc_id, token),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    nd AS (SELECT count(*) AS n FROM documents),
    w AS (
        SELECT tf.doc_id, tf.token, tf.c * ln(nd.n * 1.0 / dfreq.df) AS w
        FROM tf JOIN dfreq USING (token) CROSS JOIN nd
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nv FROM w GROUP BY doc_id),
    dots AS (
        SELECT a.doc_id AS pair_id, sum(a.w * b.w) AS dot
        FROM w a JOIN w b ON b.doc_id = a.doc_id + 1 AND b.token = a.token
        GROUP BY a.doc_id
    ),
    pairs AS (
        SELECT na.doc_id AS pair_id,
               coalesce(dots.dot, 0) / (na.nv * nb.nv) AS sim
        FROM nrm na JOIN nrm nb ON nb.doc_id = na.doc_id + 1
        LEFT JOIN dots ON dots.pair_id = na.doc_id
        WHERE na.nv > 0 AND nb.nv > 0
    )
    SELECT pair_id, round(sim, 6) AS cosine FROM pairs ORDER BY pair_id
"""


def q_pagerank_delta(sf_dir: str, iters: int = 2, alpha: float = 0.85):
    """Incremental-maintenance readout: PageRank over the EARLY half of
    the event stream (even event_id) vs over the full graph, per-node
    delta — what a batch of new edges does to the rank vector, the
    signal an incremental crawler uses to decide which frontiers to
    re-score.  Both vectors run the same two unrolled uniform-teleport
    message passes as trustrank (broadcast 50-float vector, per-batch
    partial sums, one groupby per iteration); only the edge Dataset
    differs."""
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
            x = {n: (1 - alpha) / 50 for n in range(50)}
            for _, r_ in inc.iterrows():
                x[int(r_["dst"])] = alpha * float(r_["sum(m)"]) + (1 - alpha) / 50
        return x

    base = pr(_distinct_edges_parity(sf_dir, 0))
    full = pr(_distinct_edges(sf_dir))
    return pd.DataFrame(
        {
            "node": list(range(50)),
            "rank_base": [float(_r(base[n], 6)) for n in range(50)],
            "rank_full": [float(_r(full[n], 6)) for n in range(50)],
            "delta": [float(_r(full[n] - base[n], 6)) for n in range(50)],
        }
    )


SQL_QUERIES["pagerank_delta"] = q_pagerank_delta


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


ORACLE_SQL["pagerank_delta"] = f"""
    WITH e0 AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events WHERE event_id % 2 = 0
    ),
    ef AS (
        SELECT DISTINCT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    {_pr_unrolled("e0", "a")},
    {_pr_unrolled("ef", "b")}
    SELECT nodes.n AS node,
           round(a2.x, 6) AS rank_base,
           round(b2.x, 6) AS rank_full,
           round(b2.x - a2.x, 6) AS delta
    FROM nodes JOIN a2 ON a2.n = nodes.n JOIN b2 ON b2.n = nodes.n
    ORDER BY node
"""


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


SQL_QUERIES["persistent_items"] = q_persistent_items

ORACLE_SQL["persistent_items"] = """
    WITH uh AS (
        SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour FROM events
    ),
    th AS (SELECT count(DISTINCT hour) AS t FROM uh),
    pu AS (SELECT user_id, count(*) AS n_hours FROM uh GROUP BY user_id)
    SELECT pu.user_id,
           CAST(pu.n_hours AS BIGINT) AS n_hours,
           round(pu.n_hours * 1.0 / th.t, 6) AS hour_frac,
           pu.n_hours >= 0.5 * th.t AS is_persistent
    FROM pu, th ORDER BY pu.user_id
"""


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


SQL_QUERIES["sparsify_error"] = q_sparsify_error

ORACLE_SQL["sparsify_error"] = f"""
    WITH ew AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    ef AS (SELECT src, dst FROM ew),
    es AS (
        SELECT src, dst FROM ew
        QUALIFY row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) <= 2
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    {_pr_unrolled("ef", "f")},
    {_pr_unrolled("es", "s")},
    l1 AS (
        SELECT sum(abs(round(f2.x, 9) - round(s2.x, 9))) AS v
        FROM f2 JOIN s2 ON s2.n = f2.n
    )
    SELECT nodes.n AS node,
           round(round(f2.x, 9), 6) AS rank_full,
           round(round(s2.x, 9), 6) AS rank_sparse,
           round(l1.v, 6) AS l1_error
    FROM nodes JOIN f2 ON f2.n = nodes.n JOIN s2 ON s2.n = nodes.n, l1
    ORDER BY node
"""


# ---------------------------------------------------------------------------
# link-spam mass, classifier macro-F1, sequential-pattern support
# (continuing the web-curation/eval family)
# ---------------------------------------------------------------------------

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


SQL_QUERIES["spam_mass"] = q_spam_mass


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


ORACLE_SQL["spam_mass"] = f"""
    WITH e AS (
        SELECT user_id % 50 AS src, (user_id * 13 + event_id) % 50 AS dst
        FROM events
    ),
    nodes AS (SELECT i AS n FROM range(0, 50) t(i)),
    sd AS (SELECT n, CASE WHEN n < 5 THEN 1.0 / 5 ELSE 0.0 END AS d FROM nodes),
    {_pr_unrolled("e", "g")},
{_seed_pr_unrolled("e", "gd", "t")}
    fin AS (
        SELECT nodes.n, round(g2.x, 9) AS p, round(t2.x, 9) AS t
        FROM nodes JOIN g2 ON g2.n = nodes.n JOIN t2 ON t2.n = nodes.n
    )
    SELECT n AS node, round(p, 6) AS pr, round(t, 6) AS trust,
           round((p - t) / p, 6) AS spam_mass
    FROM fin ORDER BY node
"""


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


SQL_QUERIES["langid_macro_f1"] = q_langid_macro_f1

ORACLE_SQL["langid_macro_f1"] = (
    "WITH pred AS (" + ORACLE_SQL["langid"] + """),
    cm AS (
        SELECT d.lang AS lang, p.lang_pred
        FROM documents d JOIN pred p USING (doc_id)
    ),
    cls AS (SELECT DISTINCT lang FROM cm),
    st AS (
        SELECT c.lang,
               sum(CASE WHEN cm.lang = c.lang AND cm.lang_pred = c.lang
                        THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN cm.lang <> c.lang AND cm.lang_pred = c.lang
                        THEN 1 ELSE 0 END) AS fp,
               sum(CASE WHEN cm.lang = c.lang AND cm.lang_pred <> c.lang
                        THEN 1 ELSE 0 END) AS fn
        FROM cls c, cm GROUP BY c.lang
    ),
    f AS (
        SELECT lang,
               CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0.0 END AS prec,
               CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0.0 END AS rec
        FROM st
    ),
    g AS (
        SELECT lang, prec, rec,
               CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec)
                    ELSE 0.0 END AS f1
        FROM f
    )
    SELECT lang, round(prec, 6) AS precision, round(rec, 6) AS recall,
           round(f1, 6) AS f1
    FROM g
    UNION ALL
    SELECT '__macro__', round(avg(prec), 6), round(avg(rec), 6),
           round(avg(f1), 6)
    FROM g
    ORDER BY lang
"""
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


SQL_QUERIES["event_order_pairs"] = q_event_order_pairs

ORACLE_SQL["event_order_pairs"] = """
    WITH mm AS (
        SELECT user_id, event_type, min(ts) AS mn, max(ts) AS mx
        FROM events GROUP BY user_id, event_type
    ),
    pairs AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               count(*) AS n_users
        FROM mm a JOIN mm b
          ON a.user_id = b.user_id
         AND a.event_type <> b.event_type
         AND a.mn < b.mx
        GROUP BY 1, 2
    ),
    tot AS (SELECT greatest(count(DISTINCT user_id), 1) AS n FROM events)
    SELECT antecedent, consequent, CAST(n_users AS BIGINT) AS n_users,
           round(n_users * 1.0 / tot.n, 6) AS support
    FROM pairs, tot ORDER BY antecedent, consequent
"""


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


SQL_QUERIES["cusum_changepoints"] = q_cusum_changepoints

ORACLE_SQL["cusum_changepoints"] = """
    WITH RECURSIVE d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    st AS (SELECT avg(n) AS mu, stddev_pop(n) AS sig FROM d),
    r AS (
        SELECT day, n,
               CASE WHEN st.sig > 0
                    THEN round((n - st.mu) / st.sig, 9) ELSE 0.0 END AS z,
               row_number() OVER (ORDER BY day) AS rk
        FROM d, st
    ),
    c(rk, sp, sn) AS (
        SELECT rk, greatest(0.0, z - 0.5), greatest(0.0, -z - 0.5)
        FROM r WHERE rk = 1
        UNION ALL
        SELECT r.rk,
               greatest(0.0, c.sp + r.z - 0.5),
               greatest(0.0, c.sn - r.z - 0.5)
        FROM c JOIN r ON r.rk = c.rk + 1
    )
    SELECT r.day, CAST(r.n AS BIGINT) AS n_events, r.z,
           round(c.sp, 4) AS s_pos, round(c.sn, 4) AS s_neg,
           CAST(CASE WHEN c.sp > 4.0 OR c.sn > 4.0 THEN 1 ELSE 0 END AS BIGINT)
               AS alarm
    FROM r JOIN c USING (rk) ORDER BY r.day
"""


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


SQL_QUERIES["holt_linear"] = q_holt_linear

ORACLE_SQL["holt_linear"] = """
    WITH RECURSIVE d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    r AS (
        SELECT day, n,
               coalesce(lead(n) OVER (ORDER BY day), n) AS n2,
               row_number() OVER (ORDER BY day) AS rk
        FROM d
    ),
    e(rk, l, b) AS (
        SELECT rk, CAST(n AS DOUBLE), CAST(n2 - n AS DOUBLE)
        FROM r WHERE rk = 1
        UNION ALL
        SELECT r.rk,
               0.5 * r.n + 0.5 * (e.l + e.b),
               0.3 * ((0.5 * r.n + 0.5 * (e.l + e.b)) - e.l) + 0.7 * e.b
        FROM e JOIN r ON r.rk = e.rk + 1
    )
    SELECT r.day, CAST(r.n AS BIGINT) AS n_events,
           round(e.l, 4) AS level, round(e.b, 4) AS trend,
           round(e.l + e.b, 4) AS forecast
    FROM r JOIN e USING (rk) ORDER BY r.day
"""


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


SQL_QUERIES["v_measure"] = q_v_measure

ORACLE_SQL["v_measure"] = """
    WITH cdef AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS cx
        FROM embeddings WHERE vec_id < 8
    ),
    assign AS (
        SELECT e.vec_id, e.label, c.cid AS cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_distance(e.embedding::DOUBLE[], c.cx),
                                           c.cid) AS rn
        FROM embeddings e CROSS JOIN cdef c
    ),
    cm AS (
        SELECT cluster, label, count(*)::DOUBLE AS c
        FROM assign WHERE rn = 1 GROUP BY 1, 2
    ),
    tot AS (SELECT sum(c) AS n FROM cm),
    mk AS (SELECT cluster, sum(c) AS nk FROM cm GROUP BY cluster),
    ml AS (SELECT label, sum(c) AS nl FROM cm GROUP BY label),
    hc AS (
        SELECT -sum((nl / n) * ln(nl / n) ORDER BY label) AS v
        FROM ml, tot
    ),
    hk AS (
        SELECT -sum((nk / n) * ln(nk / n) ORDER BY cluster) AS v
        FROM mk, tot
    ),
    hck AS (
        SELECT -sum((c / n) * ln(c / nk) ORDER BY cluster, label) AS v
        FROM cm JOIN mk USING (cluster), tot
    ),
    hkc AS (
        SELECT -sum((c / n) * ln(c / nl) ORDER BY cluster, label) AS v
        FROM cm JOIN ml USING (label), tot
    ),
    f AS (
        SELECT CASE WHEN hc.v = 0 THEN 1.0 ELSE 1.0 - hck.v / hc.v END AS hom,
               CASE WHEN hk.v = 0 THEN 1.0 ELSE 1.0 - hkc.v / hk.v END AS com
        FROM hc, hk, hck, hkc
    )
    SELECT (SELECT count(*) FROM mk) AS n_clusters,
           (SELECT count(*) FROM ml) AS n_labels,
           round(hom, 6) AS homogeneity,
           round(com, 6) AS completeness,
           round(CASE WHEN hom + com = 0 THEN 0.0
                      ELSE 2 * hom * com / (hom + com) END, 6) AS v_measure
    FROM f
"""


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


SQL_QUERIES["ktruss_peel"] = q_ktruss_peel

ORACLE_SQL["ktruss_peel"] = """
    WITH base AS (
        SELECT DISTINCT least(user_id % 50, (user_id * 13 + event_id) % 50) AS a,
               greatest(user_id % 50, (user_id * 13 + event_id) % 50) AS b
        FROM events
        WHERE user_id % 50 <> (user_id * 13 + event_id) % 50
    ),
    adj0 AS (SELECT a AS u, b AS v FROM base UNION ALL SELECT b, a FROM base),
    sup0 AS (
        SELECT e.a, e.b, count(n2.v) AS s
        FROM base e
        LEFT JOIN adj0 n1 ON n1.u = e.a
        LEFT JOIN adj0 n2 ON n2.u = e.b AND n2.v = n1.v
        GROUP BY e.a, e.b
    ),
    e1 AS (SELECT a, b FROM sup0 WHERE s >= 2),
    adj1 AS (SELECT a AS u, b AS v FROM e1 UNION ALL SELECT b, a FROM e1),
    sup1 AS (
        SELECT e.a, e.b, count(n2.v) AS s
        FROM e1 e
        LEFT JOIN adj1 n1 ON n1.u = e.a
        LEFT JOIN adj1 n2 ON n2.u = e.b AND n2.v = n1.v
        GROUP BY e.a, e.b
    ),
    e2 AS (SELECT a, b FROM sup1 WHERE s >= 2)
    SELECT CAST(1 AS BIGINT) AS round,
           (SELECT count(*) FROM base) AS n_edges_before,
           (SELECT count(*) FROM base) - (SELECT count(*) FROM e1) AS n_removed,
           (SELECT count(*) FROM e1) AS n_edges_after,
           coalesce((SELECT min(s) FROM sup0), 0) AS min_support,
           coalesce((SELECT max(s) FROM sup0), 0) AS max_support
    UNION ALL
    SELECT 2,
           (SELECT count(*) FROM e1),
           (SELECT count(*) FROM e1) - (SELECT count(*) FROM e2),
           (SELECT count(*) FROM e2),
           coalesce((SELECT min(s) FROM sup1), 0),
           coalesce((SELECT max(s) FROM sup1), 0)
    ORDER BY round
"""


def q_interval_overlap_join(sf_dir: str, topn: int = 5):
    """Interval-overlap join between the per-user session intervals (the
    30-minute-gap sessions of q_sessionize) and the ``topn`` busiest
    clock hours — "how many user sessions touched each traffic spike",
    the interval x interval workload behind incident forensics and
    politeness post-mortems.  Shape: sessions come from the same
    groupby(user).map_groups fold as sessionize; the hour table reduces
    to dim size through a combiner groupby and only the topn window
    bounds broadcast back; each session batch counts overlaps against
    the tiny window matrix vectorized and ships (window, partial-count)
    rows — neither side ever shuffles against the other (the classic
    broadcast interval join; the two-large-sides form would bucket both
    by hour exactly like asof_join_partitioned)."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def hour_cnt(b: pa.Table) -> pa.Table:
        hrs = b.column("ts").to_numpy().astype("datetime64[h]")
        vals, cnts = np.unique(hrs, return_counts=True)
        return pa.table(
            {
                "w": pa.array(vals.astype("datetime64[us]"), pa.timestamp("us")),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    hours = (
        ev.map_batches(hour_cnt, batch_format="pyarrow")
        .groupby("w")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values(["n", "w"], ascending=[False, True], kind="mergesort")
        .head(topn)
        .reset_index(drop=True)
    )
    w_us = hours["w"].to_numpy().astype("datetime64[us]").astype(np.int64)
    w_ref = ray.put(w_us)

    def bounds(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64))
        gap_us = 30 * 60 * 1_000_000
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = ts[new_sess]
        ends = ts[np.roll(new_sess, -1)]
        return pa.table(
            {
                "st": pa.array(starts, pa.int64()),
                "en": pa.array(ends, pa.int64()),
            }
        )

    sessions = ev.groupby("user_id").map_groups(bounds, batch_format="pyarrow")
    hour_us = 3_600_000_000

    def overlap(b: pa.Table, _w=w_ref) -> pa.Table:
        w = ray.get(_w)
        st = b.column("st").to_numpy()[:, None]
        en = b.column("en").to_numpy()[:, None]
        hit = (st < w[None, :] + hour_us) & (en >= w[None, :])
        return pa.table(
            {
                "w_us": pa.array(w, pa.int64()),
                "c": pa.array(hit.sum(axis=0).astype(np.int64), pa.int64()),
            }
        )

    cnt = (
        sessions.map_batches(overlap, batch_format="pyarrow")
        .groupby("w_us")
        .sum("c")
        .to_pandas()
        .rename(columns={"sum(c)": "n_sessions"})
    )
    out = hours.copy()
    out["w_us"] = w_us
    out = out.merge(cnt, on="w_us", how="left").fillna({"n_sessions": 0})
    return pd.DataFrame(
        {
            "window_start": out["w"],
            "n_events": out["n"].astype("int64"),
            "n_sessions": out["n_sessions"].astype("int64"),
        }
    ).sort_values("window_start").reset_index(drop=True)


SQL_QUERIES["interval_overlap_join"] = q_interval_overlap_join

ORACLE_SQL["interval_overlap_join"] = """
    WITH hours AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w, count(*) AS n
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT w, n FROM hours
        QUALIFY row_number() OVER (ORDER BY n DESC, w) <= 5
    ),
    es AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                            > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    sid AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS s
        FROM es
    ),
    sess AS (
        SELECT user_id, s, min(ts) AS st, max(ts) AS en
        FROM sid GROUP BY 1, 2
    )
    SELECT win.w AS window_start, CAST(win.n AS BIGINT) AS n_events,
           CAST(count(sess.user_id) AS BIGINT) AS n_sessions
    FROM win LEFT JOIN sess
      ON sess.st < win.w + INTERVAL 1 HOUR AND sess.en >= win.w
    GROUP BY win.w, win.n ORDER BY window_start
"""


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


SQL_QUERIES["ams_f2"] = q_ams_f2

ORACLE_SQL["ams_f2"] = r"""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(text, '\S+')) AS t FROM documents
    ),
    vocab AS (SELECT t, count(*)::BIGINT AS c FROM tok GROUP BY t),
    signs AS (
        SELECT v.t, v.c, r.j,
               CASE WHEN md5_number_lower(v.t || '#' || r.j) % 2 = 1
                    THEN 1 ELSE -1 END AS s
        FROM vocab v, range(0, 8) r(j)
    ),
    z AS (SELECT j, sum(s * c) AS z FROM signs GROUP BY j),
    est AS (SELECT list_sort(list(CAST(z AS DOUBLE) * z)) AS arr FROM z),
    ex AS (SELECT sum(c * c) AS f2, count(*) AS n FROM vocab)
    SELECT CAST(ex.n AS BIGINT) AS n_tokens,
           CAST(ex.f2 AS BIGINT) AS f2_exact,
           (est.arr[4] + est.arr[5]) / 2.0 AS f2_est,
           round(abs((est.arr[4] + est.arr[5]) / 2.0 - ex.f2) / ex.f2, 6)
               AS rel_error
    FROM ex, est
"""


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


SQL_QUERIES["blocking_quality"] = q_blocking_quality

ORACLE_SQL["blocking_quality"] = r"""
    WITH toks AS (
        SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    f AS (
        SELECT doc_id, text,
               list_aggregate(t[1:2], 'string_agg', ' ') AS k
        FROM toks
    ),
    r AS (
        SELECT doc_id, text, row_number() OVER (ORDER BY k, doc_id) AS rn
        FROM f
    ),
    nn AS (SELECT count(*) AS n FROM r),
    cand AS (SELECT sum(least(3, nn.n - rn)) AS c FROM r, nn),
    tp AS (
        SELECT coalesce(sum(g * (g - 1) // 2), 0) AS c
        FROM (SELECT count(*) AS g FROM documents GROUP BY text)
    ),
    cg AS (
        SELECT count(*) AS c
        FROM r a JOIN r b
          ON b.rn BETWEEN a.rn + 1 AND a.rn + 3 AND a.text = b.text
    )
    SELECT CAST(nn.n AS BIGINT) AS n_docs,
           CAST(cand.c AS BIGINT) AS n_candidates,
           CAST(tp.c AS BIGINT) AS n_true_pairs,
           CAST(cg.c AS BIGINT) AS n_caught,
           round(1.0 - cand.c / (nn.n * (nn.n - 1) / 2.0), 6) AS reduction_ratio,
           CASE WHEN tp.c > 0 THEN round(cg.c * 1.0 / tp.c, 6) ELSE 1.0 END
               AS completeness
    FROM nn, cand, tp, cg
"""


def q_cube_agg(sf_dir: str):
    """CUBE grouping-sets rollup of event value by (event_type, day-of-
    week) — all four lattice levels [(type,dow), (type), (dow), ()] from
    ONE pass, the OLAP companion to q_rollup_agg's single hierarchy.
    Shape: the corpus reduces once to the fine (type, dow) cells via a
    per-batch combiner + one groupby; every coarser level is a
    driver-side fold over the O(types x 7) cell table (never a second
    corpus scan), summed in deterministic (type, dow) cell order so the
    2dp-rounded sums match the mirror's direct CUBE.  NULL lattice
    markers are pinned to '__all__' / -1 on both sides."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def cells(b: pa.Table) -> pa.Table:
        days = b.column("ts").to_numpy().astype("datetime64[D]").astype(np.int64)
        dow = ((days + 4) % 7).astype(np.int64)  # 1970-01-01 = Thursday; 0 = Sunday
        df = (
            pd.DataFrame(
                {
                    "event_type": b.column("event_type").to_pylist(),
                    "dow": dow,
                    "v": b.column("value").to_numpy(),
                }
            )
            .groupby(["event_type", "dow"], as_index=False)
            .agg(v=("v", "sum"), n=("v", "size"))
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    fine = (
        ev.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("v", alias_name="v"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "dow"])
        .reset_index(drop=True)
    )
    rows = []
    for _, r in fine.iterrows():
        rows.append((r["event_type"], int(r["dow"]), float(r["v"]), int(r["n"])))
    by_type = fine.groupby("event_type", sort=True)
    for t, g in by_type:
        rows.append((t, -1, float(g["v"].sum()), int(g["n"].sum())))
    by_dow = fine.groupby("dow", sort=True)
    for d, g in by_dow:
        rows.append(("__all__", int(d), float(g["v"].sum()), int(g["n"].sum())))
    rows.append(("__all__", -1, float(fine["v"].sum()), int(fine["n"].sum())))
    out = pd.DataFrame(rows, columns=["event_type", "dow", "sum_value", "n_events"])
    out["sum_value"] = _r(out["sum_value"], 2)
    out["dow"] = out["dow"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


SQL_QUERIES["cube_agg"] = q_cube_agg

ORACLE_SQL["cube_agg"] = """
    SELECT coalesce(event_type, '__all__') AS event_type,
           CAST(coalesce(dayofweek(ts), -1) AS BIGINT) AS dow,
           round(sum(value), 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY CUBE (event_type, dayofweek(ts))
    ORDER BY event_type, dow
"""


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


SQL_QUERIES["hll_groups"] = q_hll_groups

ORACLE_SQL["hll_groups"] = """
    WITH pairs AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    h AS (
        SELECT event_type,
               md5_number_lower(CAST(user_id AS VARCHAR)) AS hv
        FROM pairs
    ),
    b AS (
        SELECT event_type, CAST(hv % 16 AS BIGINT) AS bucket,
               CAST((hv // 16) % 1099511627776 AS BIGINT) AS v
        FROM h
    ),
    r AS (
        SELECT event_type, bucket,
               CASE WHEN v = 0 THEN 41 ELSE length(bin(v & -v)) END AS rho
        FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM pairs),
    grid AS (
        SELECT types.event_type, t.i AS bucket
        FROM types, range(0, 16) t(i)
    ),
    reg AS (
        SELECT grid.event_type, grid.bucket,
               coalesce(max(r.rho), 0) AS register
        FROM grid LEFT JOIN r
          ON r.event_type = grid.event_type AND r.bucket = grid.bucket
        GROUP BY grid.event_type, grid.bucket
    ),
    est AS (
        SELECT event_type,
               0.673 * 256.0 / sum(power(2.0, -register)) AS e
        FROM reg GROUP BY event_type
    ),
    td AS (SELECT event_type, count(*) AS d FROM pairs GROUP BY event_type)
    SELECT est.event_type, round(est.e, 4) AS raw_estimate,
           CAST(td.d AS BIGINT) AS true_distinct,
           round(abs(est.e - td.d) / td.d, 4) AS rel_error
    FROM est JOIN td USING (event_type)
    ORDER BY est.event_type
"""


_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")
_NONASCII_RE = re.compile("[^\x00-\x7f]")


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


SQL_QUERIES["mojibake_screen"] = q_mojibake_screen

ORACLE_SQL["mojibake_screen"] = r"""
    WITH per AS (
        SELECT source,
               CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS moji,
               CASE WHEN regexp_matches(text,
                    '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS ctrl,
               CASE WHEN length(text) > 0
                         AND len(regexp_extract_all(text, '[^\x00-\x7F]'))
                             * 1.0 / length(text) > 0.3
                    THEN 1 ELSE 0 END AS heavy
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(moji) AS BIGINT) AS n_mojibake,
           CAST(sum(ctrl) AS BIGINT) AS n_control,
           CAST(sum(heavy) AS BIGINT) AS n_nonascii_heavy,
           CAST(sum(greatest(moji, ctrl, heavy)) AS BIGINT) AS n_flagged,
           round(sum(greatest(moji, ctrl, heavy)) * 1.0 / count(*), 6)
               AS flag_rate
    FROM per GROUP BY source ORDER BY source
"""


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


SQL_QUERIES["vocab_js_drift"] = q_vocab_js_drift

ORACLE_SQL["vocab_js_drift"] = r"""
    WITH tok AS (
        SELECT doc_id % 2 AS half,
               unnest(regexp_extract_all(text, '\S+')) AS t
        FROM documents
    ),
    c AS (
        SELECT t,
               sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::DOUBLE AS c0,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::DOUBLE AS c1
        FROM tok GROUP BY t
    ),
    tt AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM c),
    terms AS (
        SELECT
            CASE WHEN c0 > 0 THEN (c0 / t0)
                 * ln((c0 / t0) / ((c0 / t0 + c1 / t1) / 2)) ELSE 0 END
          + CASE WHEN c1 > 0 THEN (c1 / t1)
                 * ln((c1 / t1) / ((c0 / t0 + c1 / t1) / 2)) ELSE 0 END AS term,
            c0, c1
        FROM c, tt
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tokens_union,
           CAST(sum(CASE WHEN c0 > 0 AND c1 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_first,
           CAST(sum(CASE WHEN c1 > 0 AND c0 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_second,
           round(0.5 * sum(term), 6) AS js_divergence
    FROM terms
"""


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


SQL_QUERIES["adjacent_lcp"] = q_adjacent_lcp

ORACLE_SQL["adjacent_lcp"] = """
    WITH r AS (
        SELECT text, row_number() OVER (ORDER BY text, doc_id) AS rn
        FROM documents
    ),
    p AS (
        SELECT substr(a.text, 1, 32) AS ta, substr(b.text, 1, 32) AS tb
        FROM r a JOIN r b ON b.rn = a.rn + 1
    ),
    l AS (
        SELECT (SELECT max(j.i) FROM range(0, 33) j(i)
                WHERE substr(ta, 1, CAST(j.i AS INT))
                      = substr(tb, 1, CAST(j.i AS INT))) AS lcp
        FROM p
    )
    SELECT CAST(lcp AS BIGINT) AS lcp, CAST(count(*) AS BIGINT) AS n_pairs
    FROM l GROUP BY lcp ORDER BY lcp
"""


# ---------------------------------------------------------------------------
# continuation session 3f: crawl-hygiene screens + CCNet perplexity buckets
# + rank-based k-sample test
# ---------------------------------------------------------------------------

_SOFT404_RE = (
    "page not found|error 404|no longer (exists|available)|"
    "does not exist|page unavailable"
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


SQL_QUERIES["soft404_screen"] = q_soft404_screen

ORACLE_SQL["soft404_screen"] = r"""
    WITH f AS (
        SELECT source,
               CASE WHEN regexp_matches(lower(text),
                        'page not found|error 404|no longer (exists|available)|does not exist|page unavailable')
                    OR len(regexp_split_to_array(trim(text), '\s+')) < 5
                    THEN 1 ELSE 0 END AS fl
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(fl) AS BIGINT) AS n_flagged,
           round(sum(fl) * 1.0 / count(*), 6) AS rate
    FROM f GROUP BY source ORDER BY source
"""


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
        cm = ray.get(ref)
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


SQL_QUERIES["perplexity_buckets"] = q_perplexity_buckets

ORACLE_SQL["perplexity_buckets"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS token FROM toks),
    cnt AS (SELECT token, count(*) AS c FROM w GROUP BY token),
    tot AS (SELECT count(*) AS s FROM w),
    sc AS (
        SELECT w.doc_id,
               round(sum(ln(cnt.c * 1.0 / tot.s)) / count(*), 6) AS score,
               count(*) AS nt
        FROM w JOIN cnt USING (token) CROSS JOIN tot
        GROUP BY w.doc_id
    ),
    b AS (
        SELECT ntile(3) OVER (ORDER BY score DESC, doc_id) AS bi, nt, score
        FROM sc
    )
    SELECT CASE bi WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           round(sum(score) / count(*), 6) AS mean_logprob
    FROM b GROUP BY bi ORDER BY 1
"""


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


SQL_QUERIES["kruskal_wallis"] = q_kruskal_wallis

ORACLE_SQL["kruskal_wallis"] = r"""
    WITH h AS (
        SELECT value AS v, event_type AS g, count(*) AS c
        FROM events GROUP BY v, g
    ),
    m AS (SELECT v, sum(c) AS m FROM h GROUP BY v),
    a AS (
        SELECT v, m,
               coalesce(sum(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a
        FROM m
    ),
    s AS (
        SELECT h.g, sum(h.c * (2 * a.a + a.m + 1)) AS s2, sum(h.c) AS n
        FROM h JOIN a USING (v) GROUP BY h.g
    ),
    tot AS (SELECT sum(n) AS nt, count(*) AS k FROM s),
    tie AS (SELECT sum(m * m * m - m) AS t FROM m),
    stat AS (
        SELECT 12.0 / (tot.nt * (tot.nt + 1.0))
                   * (SELECT sum(s2 * s2 / (4.0 * n)) FROM s)
               - 3.0 * (tot.nt + 1.0) AS h_raw,
               1.0 - tie.t / (tot.nt * tot.nt * tot.nt * 1.0 - tot.nt) AS corr,
               tot.nt AS nt, tot.k AS k
        FROM tot, tie
    )
    SELECT CAST(nt AS BIGINT) AS n_total,
           CAST(k AS BIGINT) AS n_groups,
           round(h_raw, 6) AS h,
           round(h_raw / corr, 6) AS h_corrected
    FROM stat
"""


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


SQL_QUERIES["theil_sen"] = q_theil_sen

ORACLE_SQL["theil_sen"] = """
    WITH d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    r AS (SELECT n, row_number() OVER (ORDER BY day) AS rk FROM d),
    p AS (
        SELECT (b.n - a.n) * 1.0 / (b.rk - a.rk) AS s
        FROM r a JOIN r b ON b.rk > a.rk
    ),
    sl AS (SELECT median(s) AS slope FROM p),
    ic AS (
        SELECT median(r.n - sl.slope * r.rk) AS intercept
        FROM r, sl
    )
    SELECT CAST((SELECT count(*) FROM r) AS BIGINT) AS n_days,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pairs,
           round(sl.slope, 6) AS slope,
           round(ic.intercept, 6) AS intercept
    FROM sl, ic
"""


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


SQL_QUERIES["page_hinkley"] = q_page_hinkley

ORACLE_SQL["page_hinkley"] = """
    WITH d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    m AS (
        SELECT day, n,
               sum(n) OVER w * 1.0 / count(*) OVER w AS rm
        FROM d
        WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    p AS (
        SELECT day, n, rm,
               sum(n - rm - 0.5) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS ph
        FROM m
    ),
    q AS (
        SELECT day, n, rm, ph,
               min(ph) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS phm
        FROM p
    )
    SELECT day, CAST(n AS BIGINT) AS n_events,
           round(rm, 6) AS running_mean,
           round(ph, 6) AS ph,
           CAST(CASE WHEN ph - phm > 10.0 THEN 1 ELSE 0 END AS BIGINT) AS alarm
    FROM q ORDER BY day
"""


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


SQL_QUERIES["dow_seasonality"] = q_dow_seasonality

ORACLE_SQL["dow_seasonality"] = """
    WITH d AS (
        SELECT time_bucket(INTERVAL 1 DAY, ts) AS day, count(*) AS n
        FROM events GROUP BY day
    ),
    st AS (SELECT sum(n) * 1.0 / count(*) AS mu FROM d),
    tot AS (SELECT sum((n - st.mu) * (n - st.mu)) AS ss FROM d, st),
    g AS (
        SELECT isodow(day) AS isodow, count(*) AS n_days,
               sum(n) * 1.0 / count(*) AS mw
        FROM d GROUP BY isodow
    )
    SELECT g.isodow, CAST(g.n_days AS BIGINT) AS n_days,
           round(g.mw, 6) AS mean_n,
           CASE WHEN tot.ss > 0 THEN
               round((SELECT sum((d2.n - g.mw) * (d2.n - g.mw)) FROM d d2
                      WHERE isodow(d2.day) = g.isodow) / tot.ss, 6)
           ELSE 0.0 END AS var_share
    FROM g, tot ORDER BY g.isodow
"""


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


SQL_QUERIES["mmr_select"] = q_mmr_select

ORACLE_SQL["mmr_select"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT v FROM e WHERE vec_id = 0),
    r AS (
        SELECT e.vec_id, e.v, list_cosine_similarity(e.v, q.v) AS rel
        FROM e, q WHERE e.vec_id != 0
    ),
    p1 AS (SELECT vec_id, v, 0.7 * rel AS sc FROM r
           ORDER BY sc DESC, vec_id LIMIT 1),
    s2 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, p1 c WHERE r.vec_id NOT IN (SELECT vec_id FROM p1)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p2 AS (SELECT vec_id, v, sc FROM s2 ORDER BY sc DESC, vec_id LIMIT 1),
    c2 AS (SELECT vec_id, v FROM p1 UNION ALL SELECT vec_id, v FROM p2),
    s3 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, c2 c WHERE r.vec_id NOT IN (SELECT vec_id FROM c2)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p3 AS (SELECT vec_id, v, sc FROM s3 ORDER BY sc DESC, vec_id LIMIT 1),
    c3 AS (SELECT vec_id, v FROM c2 UNION ALL SELECT vec_id, v FROM p3),
    s4 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, c3 c WHERE r.vec_id NOT IN (SELECT vec_id FROM c3)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p4 AS (SELECT vec_id, v, sc FROM s4 ORDER BY sc DESC, vec_id LIMIT 1),
    c4 AS (SELECT vec_id, v FROM c3 UNION ALL SELECT vec_id, v FROM p4),
    s5 AS (
        SELECT r.vec_id, r.v,
               0.7 * r.rel - 0.3 * max(list_cosine_similarity(r.v, c.v)) AS sc
        FROM r, c4 c WHERE r.vec_id NOT IN (SELECT vec_id FROM c4)
        GROUP BY r.vec_id, r.v, r.rel
    ),
    p5 AS (SELECT vec_id, v, sc FROM s5 ORDER BY sc DESC, vec_id LIMIT 1)
    SELECT 1 AS step, vec_id, round(sc, 4) AS score FROM p1
    UNION ALL SELECT 2, vec_id, round(sc, 4) FROM p2
    UNION ALL SELECT 3, vec_id, round(sc, 4) FROM p3
    UNION ALL SELECT 4, vec_id, round(sc, 4) FROM p4
    UNION ALL SELECT 5, vec_id, round(sc, 4) FROM p5
    ORDER BY step
"""


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


SQL_QUERIES["event_dispersion"] = q_event_dispersion

ORACLE_SQL["event_dispersion"] = """
    WITH d AS (
        SELECT event_type,
               strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY event_type, day
    ),
    g AS (
        SELECT event_type, count(*) AS nd,
               sum(n) * 1.0 / count(*) AS mean_n,
               sum(n * n) * 1.0 / count(*)
                   - (sum(n) * 1.0 / count(*)) * (sum(n) * 1.0 / count(*)) AS v
        FROM d GROUP BY event_type
    )
    SELECT event_type, CAST(nd AS BIGINT) AS n_days,
           round(mean_n, 6) AS mean_n,
           round(v / mean_n, 6) AS fano
    FROM g ORDER BY event_type
"""


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


SQL_QUERIES["sq8_error"] = q_sq8_error

ORACLE_SQL["sq8_error"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    u AS (
        SELECT e.vec_id, ge.i, e.v[ge.i] AS val
        FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) ge
    ),
    lim AS (SELECT i, min(val) AS mn, (max(val) - min(val)) / 255.0 AS s
            FROM u GROUP BY i),
    q AS (
        SELECT u.vec_id,
               CASE WHEN lim.s = 0 THEN 0.0
                    ELSE (lim.mn + round((u.val - lim.mn) / lim.s, 0) * lim.s)
                         - u.val END AS err
        FROM u JOIN lim USING (i)
    )
    SELECT CAST((SELECT count(DISTINCT vec_id) FROM e) AS BIGINT) AS n_vecs,
           CAST((SELECT count(*) FROM lim) AS BIGINT) AS n_dims,
           round(sum(err * err) / count(*), 9) AS mse,
           round(max(abs(err)), 9) AS max_abs_err
    FROM q
"""


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


SQL_QUERIES["psi_drift"] = q_psi_drift

ORACLE_SQL["psi_drift"] = r"""
    WITH b AS (
        SELECT len(regexp_split_to_array(trim(text), '\s+')) // 10 AS bin,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS ev
        FROM documents
    ),
    h AS (
        SELECT bin, sum(ev) AS n_even, sum(1 - ev) AS n_odd
        FROM b GROUP BY bin
    ),
    t AS (
        SELECT sum(n_even) + count(*) AS te, sum(n_odd) + count(*) AS t_o,
               sum(n_even) AS se, sum(n_odd) AS so, count(*) AS nb
        FROM h
    )
    SELECT CAST(t.nb AS BIGINT) AS n_bins,
           CAST(t.se AS BIGINT) AS n_even,
           CAST(t.so AS BIGINT) AS n_odd,
           round((SELECT sum(((n_even + 1.0) / t.te - (n_odd + 1.0) / t.t_o)
                             * ln(((n_even + 1.0) / t.te)
                                  / ((n_odd + 1.0) / t.t_o))) FROM h), 6) AS psi
    FROM t
"""


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


SQL_QUERIES["triplet_violation"] = q_triplet_violation

ORACLE_SQL["triplet_violation"] = """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pos AS (
        SELECT vec_id AS anchor,
               lead(v) OVER (PARTITION BY label ORDER BY vec_id) AS pv
        FROM e
    ),
    neg AS (
        SELECT vec_id AS anchor, v AS av,
               lead(v) OVER (ORDER BY vec_id) AS ngv,
               label, lead(label) OVER (ORDER BY vec_id) AS nl
        FROM e
    ),
    t AS (
        SELECT list_cosine_similarity(n.av, p.pv) AS cp,
               list_cosine_similarity(n.av, n.ngv) AS cn
        FROM neg n JOIN pos p USING (anchor)
        WHERE n.nl IS NOT NULL AND n.label != n.nl AND p.pv IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triplets,
           CAST(sum(CASE WHEN cp < cn + 0.05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
           CASE WHEN count(*) > 0 THEN
               round(sum(CASE WHEN cp < cn + 0.05 THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6)
           ELSE 0.0 END AS violation_rate
    FROM t
"""


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


SQL_QUERIES["mattr"] = q_mattr

ORACLE_SQL["mattr"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(t) < 50 THEN
               round(len(list_distinct(t)) * 1.0 / len(t), 6)
           ELSE
               round(list_sum(list_transform(range(1, len(t) - 48),
                                             i -> len(list_distinct(t[i:i+49]))))
                     * 1.0 / (50 * (len(t) - 49)), 6)
           END AS mattr
    FROM toks ORDER BY doc_id
"""


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


SQL_QUERIES["depth_quality_decay"] = q_depth_quality_decay

ORACLE_SQL["depth_quality_decay"] = r"""
    WITH RECURSIVE r AS (
        SELECT CAST(0 AS BIGINT) AS doc, CAST(0 AS BIGINT) AS depth
        UNION
        SELECT s.nxt, s.depth + 1 FROM (
            SELECT (doc * 7 + 1) % (SELECT count(*) FROM documents) AS nxt, depth
            FROM r WHERE depth < 31
            UNION ALL
            SELECT (doc + 10) % (SELECT count(*) FROM documents) AS nxt, depth
            FROM r
            WHERE depth < 31
              AND ((doc + 10) % (SELECT count(*) FROM documents)) % 10 = doc % 10
        ) s
    ),
    f AS (SELECT doc, MIN(depth) AS depth FROM r GROUP BY doc),
    toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    w AS (SELECT doc_id, unnest(t) AS w FROM toks),
    ws AS (
        SELECT doc_id, count(*) AS n,
               sum(len(w)) * 1.0 / count(*) AS mwl,
               count(DISTINCT w) * 1.0 / count(*) AS uq
        FROM w GROUP BY doc_id
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
    tp AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS topf FROM gc GROUP BY doc_id),
    q AS (
        SELECT ws.doc_id, ws.n,
               CASE WHEN ws.n BETWEEN 30 AND 100000 AND ws.mwl BETWEEN 3.0 AND 10.0
                     AND ws.uq >= 0.45 AND coalesce(tp.topf, 0.0) <= 0.10
                    THEN 1 ELSE 0 END AS keep
        FROM ws LEFT JOIN tp USING (doc_id)
    )
    SELECT f.depth, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(q.keep) AS BIGINT) AS n_keep,
           round(sum(q.keep) * 1.0 / count(*), 6) AS keep_rate,
           round(sum(q.n) * 1.0 / count(*), 6) AS mean_tokens
    FROM f JOIN q ON q.doc_id = f.doc
    GROUP BY f.depth ORDER BY f.depth
"""


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


SQL_QUERIES["mase_daily"] = q_mase_daily

ORACLE_SQL["mase_daily"] = """
    WITH d AS (
        SELECT strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d') AS day,
               count(*) AS n
        FROM events GROUP BY day
    ),
    l AS (
        SELECT n, lag(n, 1) OVER (ORDER BY day) AS n1,
               lag(n, 7) OVER (ORDER BY day) AS n7
        FROM d
    ),
    s AS (
        SELECT avg(abs(n - n1)) FILTER (n1 IS NOT NULL) AS mae_n,
               avg(abs(n - n7)) FILTER (n7 IS NOT NULL) AS mae_s,
               count(*) FILTER (n7 IS NOT NULL) AS k7
        FROM l
    )
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           round(coalesce(mae_n, 0.0), 6) AS mae_naive,
           round(coalesce(mae_s, 0.0), 6) AS mae_seasonal,
           CASE WHEN k7 > 0 AND mae_n > 0
                THEN round(mae_s / mae_n, 6) ELSE 0.0 END AS mase
    FROM s
"""


def q_pagerank_convergence(sf_dir: str, iters: int = 3):
    """PageRank convergence diagnostics: the L1 residual ||r_k -
    r_{k-1}||_1 after each power iteration — the stop-early dial for
    whole-graph scoring (q_pagerank pins values; this pins how fast they
    settle).  The crawl store's own link graph is 2-in/2-out REGULAR
    (uniform is already stationary; every residual would be 0), so this
    runs on the irregular variant that keeps the t1 = 7d+1 edge for all
    docs but the same-host t3 = d+10 edge only for EVEN docs (in-degree
    1 or 2, no dangling).  The iteration ladder goes through the public
    stages/graph.py pagerank (scalar-pair shuffles only); every residual
    is a distributed signed union + groupby(node) fold, so no rank
    vector reaches the driver."""
    from ..stages.graph import pagerank

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()

    def to_edges(b: pa.Table, _n=n_docs) -> pa.Table:
        d = b.column("doc_id").to_numpy()
        src = [d, d[d % 2 == 0]]
        dst = [(7 * d + 1) % _n, (d[d % 2 == 0] + 10) % _n]
        return pa.table(
            {
                "src": pa.array(np.concatenate(src), pa.int64()),
                "dst": pa.array(np.concatenate(dst), pa.int64()),
            }
        )

    edges = docs.map_batches(to_edges, batch_format="pyarrow")
    r1 = pagerank(edges, iters=1).materialize()
    n = r1.count()

    def signed(ds, sign: float):
        def f(b: pa.Table, _s=sign) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "v": pc.multiply(b.column("rank"), pa.scalar(_s, pa.float64())),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def uniform_neg(ds, _n=n):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "v": pa.array([-1.0 / _n] * b.num_rows, pa.float64()),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def l1(a, b_) -> float:
        diff = (
            a.union(b_)
            .groupby("node")
            .sum("v")
            .map_batches(
                lambda t: pa.table(
                    {"a": pc.abs(t.column("sum(v)"))}
                ),
                batch_format="pyarrow",
            )
            .sum("a")
        )
        return float(diff)

    prev = r1
    rows = [{"iter": 1, "l1_residual": float(_r(l1(signed(r1, 1.0), uniform_neg(r1)), 6))}]
    for k in range(2, iters + 1):
        cur = pagerank(edges, iters=k).materialize()
        rows.append(
            {
                "iter": k,
                "l1_residual": float(_r(l1(signed(cur, 1.0), signed(prev, -1.0)), 6)),
            }
        )
        prev = cur
    return pd.DataFrame(rows)


SQL_QUERIES["pagerank_convergence"] = q_pagerank_convergence


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


ORACLE_SQL["pagerank_convergence"] = _pagerank_conv_oracle_sql()
