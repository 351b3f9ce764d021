"""Crawl query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



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


def q_politeness_makespan(sf_dir: str, budget: int = 20):
    """Politeness-schedule makespan over the extracted link corpus: per
    host the outstanding URL count, rounds needed at a budget of 20
    fetches/host/round, the crawl makespan (max rounds) and the fleet
    utilization total/(hosts * budget * makespan) — the scheduling
    telemetry that says whether one hot host serializes the whole crawl
    (the AsyncItemBucket sizing question).  Shape: the real link
    extractor runs per batch (fixtures.doc_html -> href regex ->
    canonical host); one (host, n) combiner; the O(hosts) schedule fold
    is driver-side."""
    from ..functions.links import extract_hrefs
    from ..functions.urls import host_of

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hosts(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt = Counter()
        for d, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            html = doc_html(int(d), t)
            for href in extract_hrefs(html):
                cnt[host_of(href)] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "host": pa.array(ks, pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    per_host = (
        docs.map_batches(hosts, batch_format="pyarrow")
        .groupby("host")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("host")
        .reset_index(drop=True)
    )
    per_host["rounds"] = np.ceil(per_host["n"] / budget).astype(np.int64)
    makespan = int(per_host["rounds"].max())
    total = int(per_host["n"].sum())
    util = total / (len(per_host) * budget * makespan)
    per_host["n"] = per_host["n"].astype("int64")
    out = per_host[["host", "n", "rounds"]].copy()
    out["makespan"] = makespan
    out["utilization"] = float(_r(util, 6))
    return out.astype({"makespan": "int64"})

__all__ = [
    "q_extract_links",
    "q_canonicalize_urls",
    "q_labelcloud_parse",
    "q_host_histogram",
    "q_topk_frontier",
    "q_bfs_reachable",
    "q_politeness_admission",
    "q_sign_pages",
    "q_robots_filter",
    "q_salted_host_agg",
    "q_crawl_bfs",
    "q_crawl_bfs_depths",
    "q_crawl_haircut",
    "q_crawl_appr",
    "q_crawl_ttr_weight",
    "q_crawl_poison",
    "q_crawl_ttr_time",
    "q_crawl_ttr_redirect",
    "q_crawl_bfs_dataset",
    "q_crawl_haircut_sharded",
    "q_crawl_appr_sharded",
    "q_crawl_ttr_time_sharded",
    "q_browser_render",
    "q_sitemap_parse",
    "q_redirect_resolve",
    "q_recrawl_schedule",
    "q_warc_parse",
    "q_warc_roundtrip",
    "q_host_cap",
    "q_url_features",
    "q_host_topk",
    "q_url_templates",
    "q_host_gini",
    "q_host_pagerank",
    "q_host_quality_budget",
    "q_source_host_entropy",
    "q_recrawl_plan",
    "q_tail_exponent",
    "q_redirect_depth_histogram",
    "q_hourly_autocorr",
    "q_politeness_makespan",
]
