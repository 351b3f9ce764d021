"""Parse stages: text extraction, link extraction, entity extraction.

All operate on zero-copy Arrow batches (``batch_format='pyarrow'``).  The
hot work (regex) runs in C via precompiled module-level patterns; the
Python-level loop is one iteration per *document*, not per token.

Reference semantics:
- text extraction: spiders/labels/web.py:47-50 (byte-identical),
- link extraction + urljoin + scheme filter: spiders/labels/web.py:68-92,
- entity regexes: spiders/labels/web.py:94-114.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from ..functions.links import decode_html, extract_hrefs, extract_script_srcs
from ..functions.text import (
    extract_text,
    find_eth_addresses,
    find_eth_tx_hashes,
)
from ..functions.urls import canonicalize_url, host_of, url_hash64


def extract_text_stage(batch: pa.Table) -> pa.Table:
    """html(binary) -> + text_extracted(string). Drops the heavy html column
    so multi-MB payloads never travel past this stage."""
    htmls = batch.column("html")
    texts = [extract_text(decode_html(h)) for h in htmls.to_pylist()]
    out = batch.drop_columns(["html"])
    return out.append_column("text_extracted", pa.array(texts, pa.string()))


def extract_links_stage(batch: pa.Table, include_scripts: bool = True) -> pa.Table:
    """Pages -> link edges (src_url, dst_url, kind, dst_host, dst_hash).

    Emits one output row per extracted, canonicalized, http(s) link —
    a flat_map expressed as a batch-to-batch transform (cheaper than
    Dataset.flat_map's per-row path).
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    src_out: List[str] = []
    dst_out: List[str] = []
    kind_out: List[str] = []
    for u, h in zip(urls, htmls):
        html = decode_html(h)
        for href in extract_hrefs(html):
            c = canonicalize_url(href, base=u)
            if c is not None:
                src_out.append(u)
                dst_out.append(c)
                kind_out.append("a")
        if include_scripts:
            for src in extract_script_srcs(html):
                c = canonicalize_url(src, base=u)
                if c is not None:
                    src_out.append(u)
                    dst_out.append(c)
                    kind_out.append("script")
    dst_hash = url_hash64(dst_out)
    return pa.table(
        {
            "src_url": pa.array(src_out, pa.string()),
            "dst_url": pa.array(dst_out, pa.string()),
            "kind": pa.array(kind_out, pa.string()),
            "dst_host": pa.array([host_of(d) for d in dst_out], pa.string()),
            "dst_hash": pa.array(dst_hash, pa.uint64()),
        }
    )


def extract_entities_stage(batch: pa.Table) -> pa.Table:
    """text -> one row per (url, entity, net) found by the reference entity
    regexes (ETH-like addresses and 64-hex tx hashes)."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("text_extracted" if "text_extracted" in batch.column_names else "text").to_pylist()
    u_out: List[str] = []
    e_out: List[str] = []
    n_out: List[str] = []
    for u, t in zip(urls, texts):
        t = t or ""
        for a in find_eth_addresses(t):
            u_out.append(u)
            e_out.append(a)
            n_out.append("ETH-Like")
        for h in find_eth_tx_hashes(t):
            u_out.append(u)
            e_out.append(h)
            n_out.append("ETH-Tx")
    return pa.table(
        {
            "url": pa.array(u_out, pa.string()),
            "entity": pa.array(e_out, pa.string()),
            "net": pa.array(n_out, pa.string()),
        }
    )


_RE_WS_TOKEN = __import__("re").compile(r"\S+")


def parse_page_stage(batch: pa.Table) -> pa.Table:
    """The full per-page parse of a crawl round in ONE pass (reference
    labels.web parse, spiders/labels/web.py:46-114: text strip + entity
    regexes + link follow + token stats): html -> canonical_url/host/
    url_hash + byte-identical text + canonical out-links (nested list) +
    entity/token counts.  Drops html on output; one html decode serves
    text, entities, and links (two separate passes would double both the
    decode CPU and the Ray task count)."""
    import pyarrow.compute as pc

    urls = batch.column("url").to_pylist()
    canon = [canonicalize_url(u) for u in urls]
    hashes = url_hash64(canon)
    hosts = [host_of(c) if c else "" for c in canon]
    texts, links_col = [], []
    for u, h in zip(urls, batch.column("html").to_pylist()):
        html = decode_html(h)
        texts.append(extract_text(html))
        links = []
        for href in extract_hrefs(html):
            c = canonicalize_url(href, base=u)
            if c is not None:
                links.append(c)
        for src in extract_script_srcs(html):
            c = canonicalize_url(src, base=u)
            if c is not None:
                links.append(c)
        links_col.append(links)
    text_arr = pa.array(texts, pa.string())
    # entity/token stats as RE2 kernels (C, GIL-free; parity with the
    # Python regexes pinned in tests/test_text.py)
    n_ents = pc.add(
        pc.count_substring_regex(text_arr, pattern=r"(?i)\W0x[0-9a-f]{40}"),
        pc.count_substring_regex(text_arr, pattern=r"(?i)\W0x[0-9a-f]{64}"),
    )
    n_toks = pc.count_substring_regex(text_arr, pattern=r"\S+")
    keep = [c for c in batch.column_names if c != "html"]
    out = batch.select(keep)
    return (
        out.append_column("canonical_url", pa.array(canon, pa.string()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("url_hash", pa.array(hashes, pa.uint64()))
        .append_column("text_extracted", text_arr)
        .append_column("links", pa.array(links_col, pa.list_(pa.string())))
        .append_column("n_links", pa.array([len(l) for l in links_col], pa.int64()))
        .append_column("n_entities", pc.cast(n_ents, pa.int64()))
        .append_column("n_tokens", pc.cast(n_toks, pa.int64()))
    )


def canonicalize_stage(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """+canonical_url, +host, +url_hash columns for a url-bearing batch."""
    urls = batch.column(url_col).to_pylist()
    canon = [canonicalize_url(u) for u in urls]
    hashes = url_hash64(canon)
    hosts = [host_of(c) if c else "" for c in canon]
    return (
        batch.append_column("canonical_url", pa.array(canon, pa.string()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("url_hash", pa.array(hashes, pa.uint64()))
    )
