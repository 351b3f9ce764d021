"""Batch graph analytics over link-edge Datasets.

The crawl strategies (strategies/appr.py, ttr.py) are PUSH-based: they
rank the frontier incrementally while the crawl runs, one residual push
per fetched page — the right shape for steering a live crawl.  This
module is the complementary BATCH shape: whole-graph power iteration over
an already-extracted edge Dataset, the form a training-data pipeline uses
to score an entire 10^10-URL link graph offline (page importance as a
quality prior, crawl-frontier seeding, spam demotion).

Dataflow per iteration (``pagerank``): one tagged-union ``groupby(src)``
that joins each node's current rank onto its out-edges and emits
``damping * rank / outdeg`` per edge, then one ``groupby(node).sum()``
that folds incoming contributions — every shuffled row is a pair of
int64/float64 scalars, never adjacency lists, so skewed in-degree (the
web's power law) costs one hot reducer key at worst, and out-degree skew
is bounded by the per-group edge fan-out of a single src.  Dangling-node
mass is folded via a sentinel key + O(1) driver-side scalar, matching the
standard PageRank formulation.  Iteration count is a fixed parameter (the
SQL oracle unrolls the same count); convergence-driven stopping would
just compare successive rank sums the way connected_components does.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_DANGLING_KEY = -1


def pagerank(edges, iters: int = 3, damping: float = 0.85):
    """Power-iteration PageRank over an int64 ``(src, dst)`` edge Dataset.

    Returns a Dataset ``(node, rank)`` covering every node that appears as
    a src or dst.  Parallel edges should be pre-deduplicated by the caller
    (outdeg counts edge rows).  Ranks sum to 1 over the node set.
    """
    from ray.data.aggregate import Sum

    def endpoints(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("src").combine_chunks(), pa.int64())
        d = pc.cast(b.column("dst").combine_chunks(), pa.int64())
        return pa.table({"node": pa.concat_arrays([s, d])})

    def dedup_first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    # pin the edge list once: it is consumed by nodes, the dangling probe
    # and every iteration's union — left lazy, each consumer would re-run
    # the caller's whole upstream pipeline (parse, link extraction, ...).
    # Edges are two int64 columns; the object store spills them if needed.
    edges = edges.materialize()

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .map_groups(dedup_first, batch_format="pyarrow")
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: b.append_column("rank", pa.array([], pa.float64())),
            batch_format="pyarrow",
        )

    ranks = nodes.map_batches(
        lambda b, _n=n: pa.table(
            {
                "node": b.column("node"),
                "rank": pa.array([1.0 / _n] * b.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # dangling-free graphs (every node has an out-edge) skip the
    # per-iteration sentinel aggregate + filter — one Dataset execution per
    # iteration instead of three (the common web-graph case after link
    # filtering; fixed per-execution overhead dominates small inputs)
    n_srcs = (
        edges.map_batches(
            lambda b: pa.table(
                {"node": pc.cast(b.column("src").combine_chunks(), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .map_groups(dedup_first, batch_format="pyarrow")
        .count()
    )
    has_dangling = n_srcs < n

    def as_rank_msgs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("node"),
                "dst": pa.nulls(b.num_rows, pa.int64()),
                "rank": b.column("rank"),
            }
        )

    def as_edge_msgs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pc.cast(b.column("src").combine_chunks(), pa.int64()),
                "dst": pc.cast(b.column("dst").combine_chunks(), pa.int64()),
                "rank": pa.nulls(b.num_rows, pa.float64()),
            }
        )

    def spread(g: pa.Table, _damping=damping) -> pa.Table:
        rank = pc.min(g.column("rank")).as_py()  # exactly one non-null rank row
        outs = pc.drop_null(g.column("dst").combine_chunks())
        node = g.column("key")[0].as_py()
        k = len(outs)
        if k == 0:
            # dangling: whole rank routed to the sentinel collector key
            return pa.table(
                {
                    "node": pa.array([node, _DANGLING_KEY], pa.int64()),
                    "val": pa.array([0.0, rank], pa.float64()),
                }
            )
        # zero self-row keeps zero-in-degree nodes in the next rank set
        out_nodes = pa.concat_arrays([outs, pa.array([node], pa.int64())])
        contrib = _damping * rank / k
        return pa.table(
            {
                "node": out_nodes,
                "val": pa.array([contrib] * k + [0.0], pa.float64()),
            }
        )

    for _ in range(iters):
        sums = (
            ranks.map_batches(as_rank_msgs, batch_format="pyarrow")
            .union(edges.map_batches(as_edge_msgs, batch_format="pyarrow"))
            .groupby("key")
            .map_groups(spread, batch_format="pyarrow")
            .groupby("node")
            .sum("val")
            .map_batches(
                lambda b: b.rename_columns(["node", "val"]), batch_format="pyarrow"
            )
            .materialize()
        )
        if has_dangling:
            dangling = (
                sums.filter(expr=f"node == {_DANGLING_KEY}").aggregate(Sum("val"))[
                    "sum(val)"
                ]
                or 0.0
            )
            base = (1.0 - damping) / n + damping * dangling / n
            folded = sums.filter(expr=f"node != {_DANGLING_KEY}")
        else:
            base = (1.0 - damping) / n
            folded = sums  # no sentinel rows exist

        def fold(b: pa.Table, _base=base) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "rank": pc.add(b.column("val"), _base),
                }
            )

        ranks = folded.map_batches(fold, batch_format="pyarrow")
    return ranks


def hits(edges, iters: int = 2):
    """HITS hubs-and-authorities over an int64 ``(src, dst)`` edge Dataset
    (Kleinberg 1999) — the second classic whole-web-graph score next to
    :func:`pagerank`: authorities collect hub mass over IN-edges, hubs
    collect authority mass over OUT-edges, L1-normalized each half-step.

    Same dataflow discipline as pagerank: each half-step is ONE
    tagged-union ``groupby`` that joins the current score onto the edge
    endpoint that owns it and emits one scalar pair per edge, then one
    ``groupby(node).sum()`` fold — no adjacency lists ever shuffle, and
    the normalizer is a single driver-side scalar aggregate.  Returns a
    Dataset ``(node, hub, auth)``.
    """
    from ray.data.aggregate import Sum

    def endpoints(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("src").combine_chunks(), pa.int64())
        d = pc.cast(b.column("dst").combine_chunks(), pa.int64())
        return pa.table({"node": pa.concat_arrays([s, d])})

    def dedup_first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    edges = edges.materialize()
    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .map_groups(dedup_first, batch_format="pyarrow")
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node"),
                    "hub": pa.array([], pa.float64()),
                    "auth": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )

    def _const(v):
        def init(b: pa.Table, _v=v) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "rank": pa.array([_v] * b.num_rows, pa.float64()),
                }
            )

        return init

    def _pass(ranks, key_col: str, emit_col: str):
        """One half-step: spread each key-node's score along its edges to
        the emit endpoint; zero self-rows keep scoreless nodes present."""

        def rank_msgs(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": b.column("node"),
                    "other": pa.nulls(b.num_rows, pa.int64()),
                    "rank": b.column("rank"),
                }
            )

        def edge_msgs(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": pc.cast(b.column(key_col).combine_chunks(), pa.int64()),
                    "other": pc.cast(b.column(emit_col).combine_chunks(), pa.int64()),
                    "rank": pa.nulls(b.num_rows, pa.float64()),
                }
            )

        def spread(g: pa.Table) -> pa.Table:
            rank = pc.min(g.column("rank")).as_py()  # exactly one rank row
            outs = pc.drop_null(g.column("other").combine_chunks())
            node = g.column("key")[0].as_py()
            k = len(outs)
            out_nodes = pa.concat_arrays([outs, pa.array([node], pa.int64())])
            return pa.table(
                {
                    "node": out_nodes,
                    "val": pa.array([rank] * k + [0.0], pa.float64()),
                }
            )

        raw = (
            ranks.map_batches(rank_msgs, batch_format="pyarrow")
            .union(edges.map_batches(edge_msgs, batch_format="pyarrow"))
            .groupby("key")
            .map_groups(spread, batch_format="pyarrow")
            .groupby("node")
            .sum("val")
            .map_batches(
                lambda b: b.rename_columns(["node", "val"]), batch_format="pyarrow"
            )
            .materialize()
        )
        total = raw.aggregate(Sum("val"))["sum(val)"] or 0.0

        def norm(b: pa.Table, _t=total) -> pa.Table:
            v = b.column("val")
            return pa.table(
                {
                    "node": b.column("node"),
                    "rank": pc.divide(v, _t) if _t else v,
                }
            )

        return raw.map_batches(norm, batch_format="pyarrow").materialize()

    hubs = nodes.map_batches(_const(1.0 / n), batch_format="pyarrow").materialize()
    auths = None
    for _ in range(iters):
        auths = _pass(hubs, "src", "dst")  # a(v) = sum of h(u) over u->v
        hubs = _pass(auths, "dst", "src")  # h(u) = sum of a(v) over u->v

    def tag(name):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "hub": b.column("rank") if name == "hub" else pa.nulls(b.num_rows, pa.float64()),
                    "auth": b.column("rank") if name == "auth" else pa.nulls(b.num_rows, pa.float64()),
                }
            )

        return f

    def fold(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array([g.column("node")[0].as_py()], pa.int64()),
                "hub": pa.array([pc.max(g.column("hub")).as_py() or 0.0], pa.float64()),
                "auth": pa.array([pc.max(g.column("auth")).as_py() or 0.0], pa.float64()),
            }
        )

    return (
        hubs.map_batches(tag("hub"), batch_format="pyarrow")
        .union(auths.map_batches(tag("auth"), batch_format="pyarrow"))
        .groupby("node")
        .map_groups(fold, batch_format="pyarrow")
    )


def coreness(edges, iters: int = 6):
    """k-core decomposition of an undirected int64 ``(u, v)`` edge Dataset
    via the H-index iteration (Lu et al. 2016, "The H-index of a network
    node"): start every node at its degree, then repeatedly replace each
    node's estimate with the H-index of its neighbours' estimates — the
    largest h such that at least h neighbours currently score >= h.  The
    sequence is per-node non-increasing and converges to the exact core
    number, giving coreness as a fixed number of bulk rounds instead of
    the inherently sequential min-degree peel.

    Same shuffle discipline as :func:`pagerank` / ``connected_components``:
    each round is one ``groupby(key)`` that joins the current estimate onto
    the node's incident edges and emits it to each neighbour, then one
    ``groupby(node).map_groups`` H-index fold — only (int64, int64) scalar
    rows ever move, never adjacency lists, so power-law degree skew costs a
    hot reducer key at worst.  ``iters`` is fixed so a SQL oracle can unroll
    the identical rounds; real graphs settle in O(log-ish) rounds (the
    fixture converges in 3-4) and the estimates simply stop changing once
    converged, so extra rounds are idempotent.

    Returns a Dataset ``(node, core)`` over every node incident to an edge.
    Callers pass SIMPLE edges (deduplicated, no self-loops) — degree counts
    edge rows.
    """
    import numpy as np

    def symmetric(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column("u").combine_chunks(), pa.int64())
        v = pc.cast(b.column("v").combine_chunks(), pa.int64())
        return pa.table(
            {
                "key": pa.concat_arrays([u, v]),
                "other": pa.concat_arrays([v, u]),
            }
        )

    sym = edges.map_batches(symmetric, batch_format="pyarrow").materialize()

    # c0 = degree
    def one(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b.column("key"), "c": pa.array([1] * b.num_rows, pa.int64())}
        )

    est = (
        sym.map_batches(one, batch_format="pyarrow")
        .groupby("node")
        .sum("c")
        .map_batches(lambda b: b.rename_columns(["node", "c"]), batch_format="pyarrow")
        .materialize()
    )

    def est_msgs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("node"),
                "other": pa.nulls(b.num_rows, pa.int64()),
                "c": b.column("c"),
            }
        )

    def edge_msgs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("key"),
                "other": b.column("other"),
                "c": pa.nulls(b.num_rows, pa.int64()),
            }
        )

    def spread(g: pa.Table) -> pa.Table:
        c = pc.min(g.column("c")).as_py()  # exactly one non-null estimate row
        outs = pc.drop_null(g.column("other").combine_chunks())
        return pa.table(
            {
                "node": outs,
                "c": pa.array([c] * len(outs), pa.int64()),
            }
        )

    def hindex(g: pa.Table) -> pa.Table:
        vals = np.sort(g.column("c").to_numpy(zero_copy_only=False))[::-1]
        ranks = np.arange(1, len(vals) + 1)
        sat = ranks[vals >= ranks]
        h = int(sat[-1]) if len(sat) else 0
        return pa.table(
            {
                "node": pa.array([g.column("node")[0].as_py()], pa.int64()),
                "c": pa.array([h], pa.int64()),
            }
        )

    for _ in range(iters):
        est = (
            est.map_batches(est_msgs, batch_format="pyarrow")
            .union(sym.map_batches(edge_msgs, batch_format="pyarrow"))
            .groupby("key")
            .map_groups(spread, batch_format="pyarrow")
            .groupby("node")
            .map_groups(hindex, batch_format="pyarrow")
            .materialize()
        )

    return est.map_batches(
        lambda b: pa.table({"node": b.column("node"), "core": b.column("c")}),
        batch_format="pyarrow",
    )
