"""Deterministic synthetic web fixtures (FIXTURES.md F1/F2).

Generates the Parquet page table demanded by the driver's ``input_hint``:

    url: string, warc_ts: timestamp[ms], html: binary, text: string, lang: string

- ``text`` is the *golden* extraction: the reference 3-regex pipeline
  (reference spiders/labels/web.py:47-50) applied to ``html``, so tests can
  assert our map_batches extractor is byte-identical per url.
- The embedded ``<a href>`` links realize a seeded graph with one
  deliberately skewed host (~30% of link targets) to exercise
  groupby-host salting, plus cycles, duplicate edges, relative links, and
  canonicalization edge cases (uppercase host, :80 port, #fragment,
  shuffled query params).
- ``html`` embeds <style>/<script> blocks and ETH-style entities so the
  text-extraction and entity-regex stages have nontrivial work.

Everything is a pure function of (n_pages, seed) — no wall clock, no global
RNG.
"""

from __future__ import annotations

import datetime
import hashlib
from pathlib import Path
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.text import extract_text
from .functions.urls import url_hash64

LANGS = ["en", "zh", "de", ""]
EPOCH = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("ms")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

_ZH = "区块链蜘蛛网络爬虫测试页面数据"


def page_url(i: int, n_hosts: int, skew_host_share: float = 0.3) -> str:
    """Canonical url of page i. Host 0 holds ~skew_host_share of pages."""
    if (i * 2654435761 % 1000) < int(skew_host_share * 1000):
        h = 0
    else:
        h = 1 + (i * 40503 % (n_hosts - 1)) if n_hosts > 1 else 0
    return f"http://host{h}.example/p/{i}"


def _eth_addr(i: int) -> str:
    d = hashlib.md5(str(i).encode()).hexdigest()
    return "0x" + d + d[:8]


def _href_variant(target_url: str, variant: int) -> str:
    """Non-canonical spellings of a canonical target (canonicalizer work)."""
    if variant == 0:
        return target_url
    if variant == 1:  # uppercase host
        return target_url.replace("http://host", "http://HOST", 1)
    if variant == 2:  # explicit default port
        return target_url.replace(".example/", ".example:80/", 1)
    if variant == 3:  # fragment
        return target_url + "#frag"
    if variant == 4:  # query params in non-sorted order
        return target_url + "?z=1&a=2"
    return target_url


def _out_degree(i: int, max_deg: int = 8) -> int:
    # deterministic power-law-ish: many 1-2, few up to max_deg
    x = (i * 11400714819323198485) % 100
    if x < 50:
        return 1
    if x < 80:
        return 2
    if x < 95:
        return 4
    return max_deg


def generate_pages(
    n_pages: int = 1000,
    seed: int = 42,
    n_hosts: int = 20,
    skew_host_share: float = 0.3,
    pad_to_bytes: int = 0,
    start: int = 0,
    end: Optional[int] = None,
) -> pa.Table:
    """Build (a slice of) the deterministic synthetic web as an Arrow table.

    Every page is a pure function of (i, n_pages, seed) — link targets come
    from a per-page hash, not a shared RNG stream — so ``[start, end)``
    slices generated in parallel Ray tasks concatenate to exactly the
    serial output.

    ``pad_to_bytes`` > 0 pads each page's body with deterministic filler
    sentences to roughly that html size — Common-Crawl pages are tens of
    KB, and benchmarks on 1 KB toy pages measure scheduler overhead, not
    parse throughput."""
    if end is None:
        end = n_pages
    ts_ms = (int(EPOCH.timestamp() * 1000) + np.arange(start, end, dtype=np.int64) * 1000)

    htmls: List[bytes] = []
    texts: List[str] = []
    urls: List[str] = []
    for i in range(start, end):
        urls.append(page_url(i, n_hosts, skew_host_share))
        deg = _out_degree(i)
        # per-page deterministic targets (no shared RNG stream)
        targets = [
            (i * 2654435761 + k * 40503 + seed * 97) % n_pages for k in range(deg)
        ]
        anchors = []
        for k, t in enumerate(targets):
            href = _href_variant(page_url(int(t), n_hosts, skew_host_share), (i + k) % 5)
            anchors.append(f'<a href="{href}">link {int(t)} from {i}</a>')
        # a relative link and a cycle link back to a neighbour page
        anchors.append(f'<a href="/p/{(i + 1) % n_pages}">rel next</a>')
        # a non-http link the follower must drop (web.py:78-79 semantics)
        anchors.append('<a href="mailto:x@example.com">mail</a>')
        script_src = f'<script src="http://host{i % n_hosts}.example/static/app{i % 7}.js"></script>'
        filler = ""
        if pad_to_bytes > 0:
            unit = (
                f"<p>Filler paragraph {i} sentence with tokens alpha beta gamma "
                f"delta {_ZH[i % len(_ZH)]} and value {(i * 131) % 9973} plus "
                f"marker 0x{hashlib.md5(f'{i}-pad'.encode()).hexdigest()} end.</p>"
            )
            filler = unit * max(1, pad_to_bytes // len(unit))
        html = (
            "<!DOCTYPE html><html><head>"
            f"<title>Page {i}</title>"
            "<style>body { color: #333; } .x>span { display:none; }</style>"
            "</head><body>"
            f"<h1>Page {i} on host</h1>"
            f"<p>Deterministic page body {i} with unicode {_ZH[i % len(_ZH)]} text "
            f"and an address {_eth_addr(i)} plus hash "
            f"0x{hashlib.sha256(str(i).encode()).hexdigest()} inline.</p>"
            + filler
            + "".join(anchors)
            + script_src
            + f'<script type="text/javascript">var seed={seed}; var addr="{_eth_addr(i + 7)}";</script>'
            "</body></html>"
        )
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_ms, pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(start, end)], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


ROW_GROUP_SIZE = 256  # the point-lookup quantum: a crawl fetch reads only
# the row groups its urls fall in (FetchShard's hash->rowgroup index), so
# cost/url ~= ROW_GROUP_SIZE x row_bytes; bulk scans group several row
# groups per task (bench._parse_units) so sequential throughput is unhurt


def write_pages_store(
    table: pa.Table,
    store_dir: str,
    num_partitions: int = 16,
    rows_per_file_hint: Optional[int] = None,
) -> str:
    """Write a page table hash-partitioned by url_hash64 % num_partitions.

    Layout: <store_dir>/part=<k>/pages.parquet.  At 100 TB this is the layout
    that lets a frontier round read only the partitions its URLs hash into
    (partition-pruned lookup join) instead of scanning the web.
    """
    store = Path(store_dir)
    store.mkdir(parents=True, exist_ok=True)
    h = url_hash64(table.column("url").to_pylist())
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    import ray

    if ray.is_initialized() and table.num_rows >= 100_000:
        tref = ray.put(table)
        pref = ray.put(part)

        @ray.remote(num_cpus=1)
        def _write_part(t, p, k, d):
            sub = t.filter(pa.array(p == k)).sort_by("url")
            Path(d).mkdir(parents=True, exist_ok=True)
            pq.write_table(sub, Path(d) / "pages.parquet", row_group_size=ROW_GROUP_SIZE)

        ray.get(
            [
                _write_part.remote(tref, pref, k, str(store / f"part={k}"))
                for k in range(num_partitions)
            ]
        )
    else:
        for k in range(num_partitions):
            sub = table.filter(pa.array(part == k)).sort_by("url")
            d = store / f"part={k}"
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(sub, d / "pages.parquet", row_group_size=ROW_GROUP_SIZE)
    (store / "_MANIFEST").write_text(
        f"num_partitions={num_partitions}\nrows={table.num_rows}\nkey=url_hash64%%{num_partitions}\n"
    )
    return str(store)


def doc_html(doc_id: int, text: str) -> str:
    """Deterministic HTML page for a `documents` row.

    Used by the correctness-gate queries: the SAME template is mirrored as a
    DuckDB SQL expression (pipelines/queries.py DOC_HTML_SQL) so Ray and the
    SQL oracle compute from identical inputs.  Keep the two in lockstep."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        "<style>p{margin:0}</style></head><body>"
        f"<p>{text}</p>"
        f'<a href="http://site{doc_id % 10}.example/d/{(doc_id * 7) % 500}?b=2&a=1#frag">next {doc_id}</a>'
        f'<script src="http://cdn{doc_id % 3}.example/app.js"></script>'
        f'<script>var addr="0x{h}{h[:8]}";</script>'
        "</body></html>"
    )


def crawl_doc_url(d: int) -> str:
    """Canonical crawl-store url of document d."""
    return f"http://site{d % 10}.example/d/{d}"


def crawl_doc_html(d: int, n_docs: int, text: str) -> str:
    """Deterministic crawl-store page for document d: every in-corpus link
    resolves to the target's canonical host (unlike :func:`doc_html`, whose
    SQL-mirrored template is pinned by DOC_HTML_SQL), giving the crawl
    engine a connected graph: multiplicative + same-host-successor links
    cover the corpus from any seed.

    The rel link targets t3 = d+10: hosts are assigned d%10, so the
    source-relative resolution lands on t3's CANONICAL url (a found page)
    whenever n_docs % 10 == 0 — a second found out-edge that gives the BFS
    real branching.  The whole link set is arithmetic over (d, n_docs), so
    the crawl's BFS depth structure is mirrorable as a DuckDB recursive
    CTE (ORACLE_SQL['crawl_bfs_depths'])."""
    h = hashlib.md5(str(d).encode()).hexdigest()
    t1, t2, t3 = (d * 7 + 1) % n_docs, (d * 13 + 3) % n_docs, (d + 10) % n_docs
    return (
        f"<html><head><title>Doc {d}</title>"
        "<style>p{margin:0}</style></head><body>"
        f"<p>{text}</p>"
        f'<a href="{crawl_doc_url(t1)}">n1</a>'
        f'<a href="{crawl_doc_url(t2)}?b=2&a=1#frag">n2</a>'
        f'<a href="/d/{t3}">rel</a>'
        f'<a href="http://dangling{d % 5}.example/x/{d}">off-corpus</a>'
        f'<script src="http://cdn{d % 3}.example/app.js"></script>'
        f'<script>var addr="0x{h}{h[:8]}";</script>'
        "</body></html>"
    )


def pages_from_documents(documents: pa.Table) -> pa.Table:
    """Derive a deterministic page table (input_hint schema) from the driver's
    `documents` table — html via :func:`crawl_doc_html`, url keyed by doc_id."""
    doc_ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    langs = documents.column("lang").to_pylist()
    n_docs = len(doc_ids)
    urls = [crawl_doc_url(d) for d in doc_ids]
    htmls = [crawl_doc_html(d, n_docs, t).encode("utf-8") for d, t in zip(doc_ids, texts)]
    ts_ms = [int(EPOCH.timestamp() * 1000) + int(d) * 1000 for d in doc_ids]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_ms, pa.timestamp("ms")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([extract_text(h.decode()) for h in htmls], pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


_GEN_CHUNK = 25_000  # fixed so parallel chunking is deterministic


def ensure_pages_store(
    store_dir: str,
    n_pages: int = 1000,
    seed: int = 42,
    n_hosts: int = 20,
    num_partitions: int = 16,
    pad_to_bytes: int = 0,
) -> str:
    """Idempotently generate + write the fixture store (used by tests/bench).

    Large stores generate in parallel Ray tasks (one per _GEN_CHUNK slice;
    pages are per-index deterministic so the parallel result is identical
    to the serial one) and write partitions in parallel."""
    store = Path(store_dir)
    manifest = store / "_MANIFEST"
    if manifest.exists():
        return str(store)
    import ray

    if ray.is_initialized() and n_pages >= 2 * _GEN_CHUNK:
        gen = ray.remote(num_cpus=1)(generate_pages)
        refs = [
            gen.remote(
                n_pages=n_pages,
                seed=seed,
                n_hosts=n_hosts,
                pad_to_bytes=pad_to_bytes,
                start=s,
                end=min(s + _GEN_CHUNK, n_pages),
            )
            for s in range(0, n_pages, _GEN_CHUNK)
        ]
        t = pa.concat_tables(ray.get(refs))
    else:
        t = generate_pages(n_pages=n_pages, seed=seed, n_hosts=n_hosts, pad_to_bytes=pad_to_bytes)
    return write_pages_store(t, store_dir, num_partitions=num_partitions)


def write_warc_store(documents: pa.Table, out_dir: str, num_files: int = 8) -> str:
    """Deterministic WARC fixture derived from a ``documents`` table:
    document ``d`` becomes one WARC/1.0 response record (payload =
    :func:`doc_html`) in file ``part-(d % num_files).warc``, records
    within a file ordered by doc_id, WARC-Date = 2026-01-01T00:00:00Z +
    doc_id seconds.  The layout mirrors how Common Crawl shards a crawl
    into many independent .warc files — the unit of read parallelism."""
    import datetime as _dt
    from pathlib import Path

    from .functions.warc import build_warc_record

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    base = _dt.datetime(2026, 1, 1)
    buckets: dict[int, list[bytes]] = {k: [] for k in range(num_files)}
    ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    for d, text in sorted(zip(ids, texts)):
        date = (base + _dt.timedelta(seconds=int(d))).strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = build_warc_record(
            f"http://site{d % 10}.example/d/{d}", date, doc_html(d, text).encode()
        )
        buckets[d % num_files].append(rec)
    for k, recs in buckets.items():
        (out / f"part-{k}.warc").write_bytes(b"".join(recs))
    return str(out)
