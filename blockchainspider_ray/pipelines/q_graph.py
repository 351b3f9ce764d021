"""Graph query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



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


def q_betweenness_sampled(sf_dir: str, n_pivots: int = 16, seed: int = 7):
    """Pivot-sampled Brandes betweenness (Bader-style): the scalable
    estimate for graphs past the exact operator's broadcast-adjacency
    bound (betweenness_over_edges refuses > BETWEENNESS_MAX_NODES nodes).
    Unbiased: partial dependencies from K uniform pivots scale by V/K;
    the error bound is pinned in tests/test_betweenness.py (rank
    correlation + absolute error vs exact on the same graph)."""
    edges = _events_edges(sf_dir).to_pandas()[["src", "dst"]].drop_duplicates()
    return betweenness_sampled_over_edges(edges, n_pivots=n_pivots, seed=seed)


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


def q_graph_components(sf_dir: str):
    """Weakly-connected components of the events interaction graph
    (undirected view), labelled with the minimum node id and sized — the
    web-graph fragmentation telemetry (how many islands does the frontier
    have to be seeded into) through the SAME distributed min-label
    propagation the near-dup cluster step uses (stages/dedup.py
    connected_components: O(E) scalar-pair shuffles per round, O(1)
    driver checksum)."""
    from ..stages.dedup import connected_components

    def as_pairs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": pc.cast(b.column("src").combine_chunks(), pa.int64()),
                "doc_b": pc.cast(b.column("dst").combine_chunks(), pa.int64()),
            }
        )

    edges = (
        _events_edges(sf_dir)
        .map_batches(as_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
        .select_columns(["doc_a", "doc_b"])
    )
    return (
        connected_components(edges)
        .groupby("cluster_id")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "cluster_id": b.column("cluster_id"),
                    "n_members": b.column("count()").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("cluster_id")
    )


def q_attr_assortativity(sf_dir: str):
    """Newman NOMINAL assortativity of the events link graph by node
    community label c(v) = v % 5: r = (sum_i e_ii - sum_i a_i*b_i) /
    (1 - sum_i a_i*b_i) over the directed mixing matrix e_ij (edge
    fraction from group i to group j, a = row sums, b = col sums),
    self-loop EDGES dropped as in q_degree_assortativity — the
    do-communities-link-inward companion to degree assortativity.
    Shape: one (gi, gj) count combiner; the O(25)-cell mixing-matrix
    fold runs driver-side."""
    edges = _events_edges(sf_dir)

    def cells(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        keep = src != dst
        gi = (src[keep] % 5).astype(np.int64)
        gj = (dst[keep] % 5).astype(np.int64)
        key = gi * 5 + gj
        vals, cnts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "gi": pa.array((vals // 5).astype(np.int64)),
                "gj": pa.array((vals % 5).astype(np.int64)),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    cm = (
        edges.map_batches(cells, batch_format="pyarrow")
        .groupby(["gi", "gj"])
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    if cm.empty:  # self-loop-only / empty graph: mirror the SQL's empty result
        return pd.DataFrame(
            columns=["n_edges", "trace", "ab_sum", "assortativity"]
        ).astype({"n_edges": "int64", "trace": "float64", "ab_sum": "float64", "assortativity": "float64"})
    m = float(cm["n"].sum())
    e = cm.copy()
    e["p"] = e["n"] / m
    tr = float(e.loc[e["gi"] == e["gj"], "p"].sum())
    a = e.groupby("gi")["p"].sum()
    b = e.groupby("gj")["p"].sum()
    ab = float(sum(a.get(i, 0.0) * b.get(i, 0.0) for i in range(5)))
    r = (tr - ab) / (1.0 - ab) if ab < 1.0 else float("nan")
    return pd.DataFrame(
        {
            "n_edges": pd.array([int(m)], dtype="int64"),
            "trace": [float(_r(tr, 6))],
            "ab_sum": [float(_r(ab, 6))],
            "assortativity": [float(_r(r, 6)) if r == r else float("nan")],
        }
    )


def q_eigenvector_centrality(sf_dir: str, iters: int = 3):
    """Eigenvector centrality of the events link graph: 3 power
    iterations of v <- A^T v (influence flows along in-edges) from the
    uniform vector, L1-normalized each step — the prestige measure that,
    unlike q_katz_centrality, has no attenuation parameter and unlike
    q_pagerank no teleport.  Distinct edges, self-loops dropped.  Shape:
    the O(50)-entry vector broadcasts per iteration; per-batch partial
    (dst, contribution) sums -> one small groupby per iteration — the
    corpus-scale pattern where only the frontier vector moves."""
    edges = _events_edges(sf_dir)

    def dedup(b: pa.Table) -> pa.Table:
        df = b.select(["src", "dst"]).to_pandas().drop_duplicates()
        df = df[df["src"] != df["dst"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    e = (
        edges.map_batches(dedup, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .materialize()
    )
    nodes = sorted(
        set(e.groupby("src").count().to_pandas()["src"])
        | set(e.groupby("dst").count().to_pandas()["dst"])
    )
    n = len(nodes)
    v = {int(x): 1.0 / n for x in nodes}
    for _ in range(iters):
        v_ref = ray.put(v)

        def push(b: pa.Table, _v=v_ref) -> pa.Table:
            vv = ray.get(_v)
            src = b.column("src").to_numpy()
            dst = b.column("dst").to_numpy()
            contrib = np.array([vv[int(s)] for s in src])
            df = pd.DataFrame({"dst": dst, "c": contrib})
            g = df.groupby("dst", as_index=False)["c"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        nxt = (
            e.map_batches(push, batch_format="pyarrow")
            .groupby("dst")
            .sum("c")
            .to_pandas()
            .rename(columns={"sum(c)": "c"})
        )
        raw = {int(x): 0.0 for x in nodes}
        for d_, c_ in zip(nxt["dst"], nxt["c"]):
            raw[int(d_)] = float(c_)
        s = sum(raw[x] for x in sorted(raw))  # node-ascending fold: mirror-exact
        v = {x: raw[x] / s for x in raw} if s > 0 else raw
    out = pd.DataFrame(
        {
            "node": pd.array(sorted(v), dtype="int64"),
            "centrality": [float(_r(v[x], 6)) for x in sorted(v)],
        }
    )
    return out


def q_graph_conductance(sf_dir: str):
    """Conductance of the node-parity bipartition (S = even nodes) of the
    undirected events link graph: phi = cut(S, S') / min(vol(S),
    vol(S')) — the partition-quality number a graph-sharding layout is
    judged by (low conductance = a good 2-way shard cut).  Distinct
    undirected edges (canonical min/max endpoints), self-loops dropped.
    Shape: one canonical-edge dedupe groupby, then one streaming
    (cut, volume) tally combiner; O(1) reaches the driver."""
    edges = _events_edges(sf_dir)

    def canon(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy()
        dst = b.column("dst").to_numpy()
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        bb = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"a": a, "b": bb}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    e = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )

    def tally(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy()
        bb = b.column("b").to_numpy()
        pa_, pb = a % 2 == 0, bb % 2 == 0
        cut = int((pa_ != pb).sum())
        vol_s = int(pa_.sum()) + int(pb.sum())  # endpoints in S
        vol_t = int((~pa_).sum()) + int((~pb).sum())
        return pa.table(
            {
                "cut": pa.array([cut], pa.int64()),
                "vol_s": pa.array([vol_s], pa.int64()),
                "vol_t": pa.array([vol_t], pa.int64()),
                "m": pa.array([len(a)], pa.int64()),
            }
        )

    t = e.map_batches(tally, batch_format="pyarrow").sum(
        ["cut", "vol_s", "vol_t", "m"]
    )
    cut, vs, vt, m = (
        int(t["sum(cut)"]),
        int(t["sum(vol_s)"]),
        int(t["sum(vol_t)"]),
        int(t["sum(m)"]),
    )
    phi = cut / min(vs, vt) if min(vs, vt) > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_edges": pd.array([m], dtype="int64"),
            "cut": pd.array([cut], dtype="int64"),
            "vol_s": pd.array([vs], dtype="int64"),
            "vol_t": pd.array([vt], dtype="int64"),
            "conductance": [float(_r(phi, 6)) if phi == phi else float("nan")],
        }
    )

__all__ = [
    "q_node_degree",
    "q_wedge_count",
    "q_triangle_count",
    "q_motif_vector",
    "q_pagerank",
    "q_hits",
    "q_kcore",
    "q_sssp",
    "q_lpa_communities",
    "q_graph_features",
    "q_opic_priority",
    "q_topic_purity",
    "q_degree_assortativity",
    "q_avg_path_length",
    "q_modularity",
    "q_betweenness",
    "q_betweenness_sampled",
    "q_eccentricity",
    "q_katz_centrality",
    "q_pagerank_delta",
    "q_pagerank_convergence",
    "q_graph_components",
    "q_attr_assortativity",
    "q_eigenvector_centrality",
    "q_graph_conductance",
]
