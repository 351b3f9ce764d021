"""Batch graph analytics over link-edge Datasets.

The crawl strategies (strategies/appr.py, ttr.py) are PUSH-based: they
rank the frontier incrementally while the crawl runs, one residual push
per fetched page — the right shape for steering a live crawl.  This
module is the complementary BATCH shape: whole-graph power iteration over
an already-extracted edge Dataset, the form a training-data pipeline uses
to score an entire 10^10-URL link graph offline (page importance as a
quality prior, crawl-frontier seeding, spam demotion).

Dataflow per iteration (``pagerank``): one tagged-union ``groupby`` keyed
on a HASH BUCKET of the score-owning endpoint — each group holds one
bucket's ranks AND incident edges, so the rank→edge join runs as one
vectorized polars join per bucket (64 Python calls per pass, NOT one per
node; the per-distinct-key ``map_groups`` form was 10-40× slower from
per-group call overhead alone) — followed by one native ``groupby(node)
.sum()`` fold.  Every shuffled row is a pair of int64/float64 scalars,
never adjacency lists, so skewed in-degree (the web's power law) costs a
hot reducer key at worst.  Dangling-node mass is folded via a sentinel
key + O(1) driver-side scalar, matching the standard PageRank
formulation.  Iteration count is a fixed parameter (the SQL oracle
unrolls the same count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DANGLING_KEY = -1
_NUM_BUCKETS = 64
# node-state tables (ranks / estimates) are re-unioned with the edge set
# every iteration; without a cap their block count grows by the edge
# block count per pass (groupby preserves input blocks), and hundreds of
# tiny-block tasks dominate wall time.  Coalesce state to a fixed block
# count each iteration — a no-shuffle merge pass.
_STATE_BLOCKS = 32


def _distinct_nodes(edges):
    """(node) Dataset over every endpoint — native count aggregate, no
    per-node Python."""

    def endpoints(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(b.column_names[0]).combine_chunks(), pa.int64())
        d = pc.cast(b.column(b.column_names[1]).combine_chunks(), pa.int64())
        return pa.table({"node": pa.concat_arrays([s, d])})

    return (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .count()
        .select_columns(["node"])
        .repartition(_STATE_BLOCKS)
        .materialize()
    )


def _bucket_col(arr: pa.ChunkedArray) -> pa.Array:
    # NUM_BUCKETS is a power of two and keys are non-negative, so the
    # modulus is a bitmask (pyarrow.compute ships no mod kernel)
    return pc.bit_wise_and(
        pc.cast(arr, pa.int64()), pa.scalar(_NUM_BUCKETS - 1, pa.int64())
    )


def pagerank(edges, iters: int = 3, damping: float = 0.85):
    """Power-iteration PageRank over an int64 ``(src, dst)`` edge Dataset.

    Returns a Dataset ``(node, rank)`` covering every node that appears as
    a src or dst.  Parallel edges should be pre-deduplicated by the caller
    (outdeg counts edge rows).  Ranks sum to 1 over the node set.
    """
    from ray.data.aggregate import Sum

    # pin the edge list once: it is consumed by nodes, the dangling probe
    # and every iteration's union — left lazy, each consumer would re-run
    # the caller's whole upstream pipeline (parse, link extraction, ...).
    # Edges are two int64 columns; the object store spills them if needed.
    edges = edges.materialize()
    nodes = _distinct_nodes(edges)
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
        edges.select_columns(["src"])
        .map_batches(
            lambda b: pa.table(
                {"node": pc.cast(b.column("src").combine_chunks(), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .count()
        .count()
    )
    has_dangling = n_srcs < n

    def as_rank_msgs(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("node").combine_chunks(), pa.int64())
        return pa.table(
            {
                "b": _bucket_col(key),
                "key": key,
                "dst": pa.nulls(b.num_rows, pa.int64()),
                "rank": b.column("rank"),
            }
        )

    def as_edge_msgs(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("src").combine_chunks(), pa.int64())
        return pa.table(
            {
                "b": _bucket_col(key),
                "key": key,
                "dst": pc.cast(b.column("dst").combine_chunks(), pa.int64()),
                "rank": pa.nulls(b.num_rows, pa.float64()),
            }
        )

    def spread_bucket(g: pa.Table, _damping=damping) -> pa.Table:
        """One bucket's ranks + out-edges → per-edge contributions, a zero
        self-row per rank key, and sentinel rows for dangling keys — all
        vectorized polars, pre-summed by target node within the bucket."""
        import polars as pl

        df = pl.from_arrow(g.select(["key", "dst", "rank"]))
        ranks_b = df.filter(pl.col("rank").is_not_null()).select(
            "key", "rank"
        )
        edges_b = df.filter(pl.col("rank").is_null()).select("key", "dst")
        deg = edges_b.group_by("key").agg(pl.len().alias("k"))
        r = ranks_b.join(deg, on="key", how="left").with_columns(
            pl.col("k").fill_null(0)
        )
        j = edges_b.join(
            r.filter(pl.col("k") > 0), on="key", how="inner"
        ).select(
            pl.col("dst").alias("node"),
            (pl.lit(_damping) * pl.col("rank") / pl.col("k")).alias("val"),
        )
        zero = ranks_b.select(
            pl.col("key").alias("node"), pl.lit(0.0, dtype=pl.Float64).alias("val")
        )
        dang = r.filter(pl.col("k") == 0).select(
            pl.lit(_DANGLING_KEY, dtype=pl.Int64).alias("node"),
            pl.col("rank").alias("val"),
        )
        out = (
            pl.concat([j, zero, dang])
            .group_by("node")
            .agg(pl.col("val").sum())
        )
        return out.to_arrow().cast(
            pa.schema([("node", pa.int64()), ("val", pa.float64())])
        )

    for _ in range(iters):
        sums = (
            ranks.map_batches(as_rank_msgs, batch_format="pyarrow")
            .union(edges.map_batches(as_edge_msgs, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(spread_bucket, batch_format="pyarrow")
            .groupby("node")
            .sum("val")
            .map_batches(
                lambda b: b.rename_columns(["node", "val"]), batch_format="pyarrow"
            )
            .repartition(_STATE_BLOCKS)
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

    Same dataflow discipline as pagerank: each half-step is one bucketed
    tagged-union ``groupby`` (vectorized polars join per bucket) that
    spreads the current score along edges, then one native
    ``groupby(node).sum()`` fold; the normalizer is a single driver-side
    scalar aggregate.  Returns a Dataset ``(node, hub, auth)``.
    """
    from ray.data.aggregate import Sum

    edges = edges.materialize()
    nodes = _distinct_nodes(edges)
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
            key = pc.cast(b.column("node").combine_chunks(), pa.int64())
            return pa.table(
                {
                    "b": _bucket_col(key),
                    "key": key,
                    "other": pa.nulls(b.num_rows, pa.int64()),
                    "rank": b.column("rank"),
                }
            )

        def edge_msgs(b: pa.Table) -> pa.Table:
            key = pc.cast(b.column(key_col).combine_chunks(), pa.int64())
            return pa.table(
                {
                    "b": _bucket_col(key),
                    "key": key,
                    "other": pc.cast(b.column(emit_col).combine_chunks(), pa.int64()),
                    "rank": pa.nulls(b.num_rows, pa.float64()),
                }
            )

        def spread_bucket(g: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.from_arrow(g.select(["key", "other", "rank"]))
            ranks_b = df.filter(pl.col("rank").is_not_null()).select("key", "rank")
            edges_b = df.filter(pl.col("rank").is_null()).select("key", "other")
            j = edges_b.join(ranks_b, on="key", how="inner").select(
                pl.col("other").alias("node"), pl.col("rank").alias("val")
            )
            zero = ranks_b.select(
                pl.col("key").alias("node"),
                pl.lit(0.0, dtype=pl.Float64).alias("val"),
            )
            out = pl.concat([j, zero]).group_by("node").agg(pl.col("val").sum())
            return out.to_arrow().cast(
                pa.schema([("node", pa.int64()), ("val", pa.float64())])
            )

        raw = (
            ranks.map_batches(rank_msgs, batch_format="pyarrow")
            .union(edges.map_batches(edge_msgs, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(spread_bucket, batch_format="pyarrow")
            .groupby("node")
            .sum("val")
            .map_batches(
                lambda b: b.rename_columns(["node", "val"]), batch_format="pyarrow"
            )
            .repartition(_STATE_BLOCKS)
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

        # raw is pinned; norm is a cheap lazy map re-run by consumers
        return raw.map_batches(norm, batch_format="pyarrow")

    hubs = nodes.map_batches(_const(1.0 / n), batch_format="pyarrow").materialize()
    auths = None
    for _ in range(iters):
        auths = _pass(hubs, "src", "dst")  # a(v) = sum of h(u) over u->v
        hubs = _pass(auths, "dst", "src")  # h(u) = sum of a(v) over u->v

    def tag(name):
        def f(b: pa.Table) -> pa.Table:
            zeros = pa.array(np.zeros(b.num_rows), pa.float64())
            return pa.table(
                {
                    "node": b.column("node"),
                    "hub": b.column("rank") if name == "hub" else zeros,
                    "auth": b.column("rank") if name == "auth" else zeros,
                }
            )

        return f

    # each node appears exactly once per side, zero-filled on the other —
    # a native Sum fold replaces the per-node Python max fold
    from ray.data.aggregate import Sum as _Sum

    folded = (
        hubs.map_batches(tag("hub"), batch_format="pyarrow")
        .union(auths.map_batches(tag("auth"), batch_format="pyarrow"))
        .groupby("node")
        .aggregate(_Sum("hub", alias_name="hub"), _Sum("auth", alias_name="auth"))
    )
    return folded


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
    each round is one bucketed ``groupby`` that joins the current estimate
    onto the node's incident edges (vectorized polars per bucket) and one
    bucketed H-index fold — for sorted-desc estimates the H-index is just
    ``count(c_r >= r)``, a prefix property, so the fold is a vectorized
    cumcount comparison per bucket, not a Python call per node.  Only
    (int64, int64) scalar rows ever move, never adjacency lists.
    ``iters`` is fixed so a SQL oracle can unroll the identical rounds;
    real graphs settle in O(log-ish) rounds (the fixture converges in 3-4)
    and converged estimates are idempotent under extra rounds.

    Returns a Dataset ``(node, core)`` over every node incident to an edge.
    Callers pass SIMPLE edges (deduplicated, no self-loops) — degree counts
    edge rows.
    """

    def symmetric(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column("u").combine_chunks(), pa.int64())
        v = pc.cast(b.column("v").combine_chunks(), pa.int64())
        key = pa.concat_arrays([u, v])
        return pa.table(
            {
                "b": _bucket_col(pa.chunked_array([key])),
                "key": key,
                "other": pa.concat_arrays([v, u]),
            }
        )

    sym = edges.map_batches(symmetric, batch_format="pyarrow").materialize()

    # c0 = degree (native count aggregate)
    est = (
        sym.select_columns(["key"])
        .groupby("key")
        .count()
        .map_batches(lambda b: b.rename_columns(["node", "c"]), batch_format="pyarrow")
        .materialize()
    )

    def est_msgs(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("node").combine_chunks(), pa.int64())
        return pa.table(
            {
                "b": _bucket_col(key),
                "key": key,
                "other": pa.nulls(b.num_rows, pa.int64()),
                "c": pc.cast(b.column("c"), pa.int64()),
            }
        )

    def edge_msgs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "b": b.column("b"),
                "key": b.column("key"),
                "other": b.column("other"),
                "c": pa.nulls(b.num_rows, pa.int64()),
            }
        )

    def spread_bucket(g: pa.Table) -> pa.Table:
        """Send each key's estimate to its neighbours, re-bucketed by the
        RECEIVER so the fold groups on the same column."""
        import polars as pl

        df = pl.from_arrow(g.select(["key", "other", "c"]))
        ests = df.filter(pl.col("c").is_not_null()).select("key", "c")
        edges_b = df.filter(pl.col("c").is_null()).select("key", "other")
        j = edges_b.join(ests, on="key", how="inner").select(
            pl.col("other").alias("node"), pl.col("c")
        )
        out = j.to_arrow().cast(pa.schema([("node", pa.int64()), ("c", pa.int64())]))
        return pa.table(
            {
                "b": _bucket_col(out.column("node")),
                "node": out.column("node"),
                "c": out.column("c"),
            }
        )

    def hindex_bucket(g: pa.Table) -> pa.Table:
        """Vectorized per-node H-index over one bucket: with estimates
        sorted desc within node, c_r >= r is a prefix property, so
        h = count(c_r >= r)."""
        import polars as pl

        df = pl.from_arrow(g.select(["node", "c"]))
        out = (
            df.sort(["node", "c"], descending=[False, True])
            .with_columns((pl.int_range(pl.len()).over("node") + 1).alias("r"))
            .with_columns((pl.col("c") >= pl.col("r")).alias("ok"))
            .group_by("node")
            .agg(pl.col("ok").sum().alias("c"))
        )
        return out.to_arrow().cast(
            pa.schema([("node", pa.int64()), ("c", pa.int64())])
        )

    for _ in range(iters):
        est = (
            est.map_batches(est_msgs, batch_format="pyarrow")
            .union(sym.map_batches(edge_msgs, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(spread_bucket, batch_format="pyarrow")
            .groupby("b")
            .map_groups(hindex_bucket, batch_format="pyarrow")
            .repartition(_STATE_BLOCKS)
            .materialize()
        )

    return est.map_batches(
        lambda b: pa.table({"node": b.column("node"), "core": b.column("c")}),
        batch_format="pyarrow",
    )


def pagerank_weighted(edges, iters: int = 3, damping: float = 0.85):
    """Power-iteration PageRank over a weighted ``(src, dst, weight)``
    edge Dataset — the collapsed-graph form (host graph, domain graph):
    after a groupby collapse, parallel page edges become one edge with a
    multiplicity weight, and each node spreads rank proportionally to
    edge weight instead of uniformly.

    Same dataflow as :func:`pagerank` (tagged-union bucket groupby, one
    vectorized polars join per bucket, scalar-pair shuffle rows); the
    per-edge contribution is ``damping * rank * w / wout`` evaluated
    left-associatively so an SQL mirror computes identical doubles.
    Nodes with zero outgoing weight fold through the dangling sentinel
    exactly as in the unweighted form.  Ranks sum to 1.
    """
    from ray.data.aggregate import Sum

    edges = edges.materialize()
    nodes = _distinct_nodes(edges)
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

    def as_rank_msgs(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("node").combine_chunks(), pa.int64())
        return pa.table(
            {
                "b": _bucket_col(key),
                "key": key,
                "dst": pa.nulls(b.num_rows, pa.int64()),
                "w": pa.nulls(b.num_rows, pa.float64()),
                "rank": b.column("rank"),
            }
        )

    def as_edge_msgs(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("src").combine_chunks(), pa.int64())
        return pa.table(
            {
                "b": _bucket_col(key),
                "key": key,
                "dst": pc.cast(b.column("dst").combine_chunks(), pa.int64()),
                "w": pc.cast(b.column("weight").combine_chunks(), pa.float64()),
                "rank": pa.nulls(b.num_rows, pa.float64()),
            }
        )

    def spread_bucket(g: pa.Table, _damping=damping) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(g.select(["key", "dst", "w", "rank"]))
        ranks_b = df.filter(pl.col("rank").is_not_null()).select("key", "rank")
        edges_b = df.filter(pl.col("rank").is_null()).select("key", "dst", "w")
        deg = edges_b.group_by("key").agg(pl.col("w").sum().alias("wout"))
        r = ranks_b.join(deg, on="key", how="left").with_columns(
            pl.col("wout").fill_null(0.0)
        )
        j = edges_b.join(r.filter(pl.col("wout") > 0), on="key", how="inner").select(
            pl.col("dst").alias("node"),
            (pl.lit(_damping) * pl.col("rank") * pl.col("w") / pl.col("wout")).alias(
                "val"
            ),
        )
        zero = ranks_b.select(
            pl.col("key").alias("node"), pl.lit(0.0, dtype=pl.Float64).alias("val")
        )
        dang = r.filter(pl.col("wout") == 0).select(
            pl.lit(_DANGLING_KEY, dtype=pl.Int64).alias("node"),
            pl.col("rank").alias("val"),
        )
        out = pl.concat([j, zero, dang]).group_by("node").agg(pl.col("val").sum())
        return out.to_arrow().cast(
            pa.schema([("node", pa.int64()), ("val", pa.float64())])
        )

    for _ in range(iters):
        sums = (
            ranks.map_batches(as_rank_msgs, batch_format="pyarrow")
            .union(edges.map_batches(as_edge_msgs, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(spread_bucket, batch_format="pyarrow")
            .groupby("node")
            .sum("val")
            .map_batches(
                lambda b: b.rename_columns(["node", "val"]), batch_format="pyarrow"
            )
            .repartition(_STATE_BLOCKS)
            .materialize()
        )
        dangling = (
            sums.filter(expr=f"node == {_DANGLING_KEY}").aggregate(Sum("val"))["sum(val)"]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        folded = sums.filter(expr=f"node != {_DANGLING_KEY}")

        def fold(b: pa.Table, _base=base) -> pa.Table:
            return pa.table(
                {"node": b.column("node"), "rank": pc.add(b.column("val"), _base)}
            )

        ranks = folded.map_batches(fold, batch_format="pyarrow")
    return ranks


def opic(edges, iters: int = 3):
    """On-line Page Importance Computation (Abiteboul/Preda/Cobena, WWW
    2003) — the crawl-frontier prioritizer that estimates page importance
    WHILE crawling, without waiting for a full PageRank convergence: each
    node carries ``cash`` (recent importance flow) and ``history``
    (accumulated importance).  Synchronous batch rounds: every node banks
    its cash into history and spreads it equally over its out-edges;
    dangling cash is redistributed uniformly (the virtual-root edge of the
    paper).

    Two tagged-union groupbys per round over scalar-pair rows: the cash
    spread reuses :func:`pagerank`'s bucket message pass (damping 1.0, no
    base term), and the state fold merges (cash_in, hist_carry) rows by
    node.  Returns ``(node, cash, history)``; cash sums to 1 every round
    and history grows by 1 per round.
    """
    from ray.data.aggregate import Sum

    edges = edges.materialize()
    nodes = _distinct_nodes(edges)
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "cash": pa.array([], pa.float64()),
                    "history": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )

    state = nodes.map_batches(
        lambda b, _n=n: pa.table(
            {
                "node": b.column("node"),
                "cash": pa.array([1.0 / _n] * b.num_rows, pa.float64()),
                "history": pa.array([0.0] * b.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def as_cash_msgs(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("node").combine_chunks(), pa.int64())
        return pa.table(
            {
                "b": _bucket_col(key),
                "key": key,
                "dst": pa.nulls(b.num_rows, pa.int64()),
                "rank": b.column("cash"),
            }
        )

    def as_edge_msgs(b: pa.Table) -> pa.Table:
        key = pc.cast(b.column("src").combine_chunks(), pa.int64())
        return pa.table(
            {
                "b": _bucket_col(key),
                "key": key,
                "dst": pc.cast(b.column("dst").combine_chunks(), pa.int64()),
                "rank": pa.nulls(b.num_rows, pa.float64()),
            }
        )

    def spread_bucket(g: pa.Table) -> pa.Table:
        """Identical to pagerank's spread with damping 1.0: cash/outdeg per
        out-edge, zero self-rows, dangling cash to the sentinel."""
        import polars as pl

        df = pl.from_arrow(g.select(["key", "dst", "rank"]))
        cash_b = df.filter(pl.col("rank").is_not_null()).select("key", "rank")
        edges_b = df.filter(pl.col("rank").is_null()).select("key", "dst")
        deg = edges_b.group_by("key").agg(pl.len().alias("k"))
        r = cash_b.join(deg, on="key", how="left").with_columns(pl.col("k").fill_null(0))
        j = edges_b.join(r.filter(pl.col("k") > 0), on="key", how="inner").select(
            pl.col("dst").alias("node"),
            (pl.col("rank") / pl.col("k")).alias("val"),
        )
        zero = cash_b.select(
            pl.col("key").alias("node"), pl.lit(0.0, dtype=pl.Float64).alias("val")
        )
        dang = r.filter(pl.col("k") == 0).select(
            pl.lit(_DANGLING_KEY, dtype=pl.Int64).alias("node"),
            pl.col("rank").alias("val"),
        )
        out = pl.concat([j, zero, dang]).group_by("node").agg(pl.col("val").sum())
        return out.to_arrow().cast(
            pa.schema([("node", pa.int64()), ("val", pa.float64())])
        )

    for _ in range(iters):
        sums = (
            state.select_columns(["node", "cash"])
            .map_batches(as_cash_msgs, batch_format="pyarrow")
            .union(edges.map_batches(as_edge_msgs, batch_format="pyarrow"))
            .groupby("b")
            .map_groups(spread_bucket, batch_format="pyarrow")
            .groupby("node")
            .sum("val")
            .map_batches(
                lambda b: b.rename_columns(["node", "val"]), batch_format="pyarrow"
            )
            .repartition(_STATE_BLOCKS)
            .materialize()
        )
        dangling = (
            sums.filter(expr=f"node == {_DANGLING_KEY}").aggregate(Sum("val"))["sum(val)"]
            or 0.0
        )
        share = dangling / n
        incoming = sums.filter(expr=f"node != {_DANGLING_KEY}")

        # state fold: new cash = incoming (+ uniform dangling share),
        # history = old history + old cash — a tagged union so both merge
        # in one native groupby over (node, cash_in, hist_carry) rows
        def cash_rows(b: pa.Table, _share=share) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "cash": pc.add(b.column("val"), _share),
                    "history": pa.array([0.0] * b.num_rows, pa.float64()),
                }
            )

        def hist_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("node"),
                    "cash": pa.array([0.0] * b.num_rows, pa.float64()),
                    "history": pc.add(b.column("history"), b.column("cash")),
                }
            )

        state = (
            incoming.map_batches(cash_rows, batch_format="pyarrow")
            .union(state.map_batches(hist_rows, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Sum("cash", alias_name="cash"), Sum("history", alias_name="history"))
            .repartition(_STATE_BLOCKS)
            .materialize()
        )
    return state
