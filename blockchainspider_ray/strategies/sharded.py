"""Distributed (actor-sharded) weight strategies — the 10^10-node scale
path for the reference's Haircut and APPR frontiers.

- ``ShardedHaircut`` reproduces the reference pop sequence EXACTLY
  (tests pin sharded == local on crawls): weight flow is a linear scatter
  of additive deltas, and the insertion-order tie-break is carried by
  per-node arrival indices (state/rank_pool.py).
- ``ShardedAPPR`` also reproduces the reference pop sequence exactly: the
  cached-distribution drain loop picks the globally-earliest drainable
  node per iteration (``RankPool.first_drainable`` — per-shard min-arrival
  merge), which equals the reference's rescan-from-the-start-of-the-dict
  discipline (appr.py:55-68).  Only LRU eviction of memoized
  distributions is not replicated (unbounded memo here).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

from . import FrontierStrategy
from ..state.rank_pool import RankPool


def _haircut_round_columnar(
    pool: RankPool, arrival0: int, items, src_urls, dst_urls, skip_take=None
) -> int:
    """One round of reference-haircut weight flow over a RankPool, for the
    web link shape (every edge value 1.0, so out-sum = out-degree), with
    the per-edge Python loop replaced by polars/numpy.  ``items`` is
    [(node, parked_mass, ctx)] in admitted order.  Returns the advanced
    arrival counter.  Shared verbatim by the driver path
    (ShardedHaircut.push_round_columnar) and the off-driver push actor
    (_HaircutPushActor), so both replay the cascade identically.

    Equivalence argument vs the sequential push loop: the only sequential
    dependency is in-round cascade — candidate i's scatter changing a
    later candidate j's taken weight — which flows exclusively through
    edges whose dst IS a candidate.  Those (rare on web graphs: dsts are
    overwhelmingly unfetched urls) replay in a small scalar pass with
    exact event indices; every edge to a non-candidate only ever
    accumulates into ``net``, so its deltas group-by-sum and its
    tie-break is the MIN event index — both vectorized.  Event numbering
    mirrors the generic loop's one ``_next_arrival()`` per restore/edge
    exactly.  Pinned by the engine sharded-vs-local conformance suite."""
    import polars as pl

    def _series(name, x):
        if isinstance(x, pl.Series):
            return x.rename(name)
        if hasattr(x, "type") or hasattr(x, "chunks"):  # arrow array
            return pl.Series(name, pl.from_arrow(x))
        return pl.Series(name, list(x))

    import numpy as _np

    if isinstance(items, tuple):
        # columnar control plane (engine tabular weight loop): items is
        # (nodes, mass_values) — a list + float64 array instead of
        # per-candidate Python tuples; NaN = no parked mass (seed /
        # never-claimed)
        nodes0, mass_np = items
        nodes0 = list(nodes0)
        mass_np = _np.asarray(mass_np, dtype=_np.float64)
    else:
        nodes0 = [n for n, _, _ in items]
        mass_np = _np.fromiter(
            (float("nan") if m is None else float(m[1]) for _, m, _ in items),
            dtype=_np.float64,
            count=len(nodes0),
        )
    uniq = list(dict.fromkeys(nodes0))
    if isinstance(skip_take, tuple) and len(skip_take) == 2 and skip_take[0] == "flags":
        # positional claim flags (engine tabular loop): True = this
        # position was claimed by the round's own pop (pool value
        # provably 0), False = deferred/seed rows whose accumulated value
        # must be taken.  Saves shipping the claimed node set back over
        # the wire (it IS the nodes list).
        flags = _np.asarray(skip_take[1], dtype=bool)
        to_take = [n for n, f in zip(nodes0, flags) if not f]
        local = dict.fromkeys(uniq, 0.0)
        if to_take:
            local.update(pool.take_many(to_take))
    elif skip_take:
        # nodes the CALLER just claimed this round: their pool value is
        # provably 0 (claim parked it; nothing mutates between pop and
        # push), so the take wave only covers deferred/seed candidates —
        # often nobody, dropping a whole RPC wave per round
        to_take = [n for n in uniq if n not in skip_take]
        local = {n: 0.0 for n in uniq}
        if to_take:
            local.update(pool.take_many(to_take))
    else:
        local = pool.take_many(uniq)
    e = pl.DataFrame(
        {"src": _series("src", src_urls), "dst": _series("dst", dst_urls)}
    ).with_columns(pl.col("src").cum_count().over("src").alias("ord") - 1)
    deg_of = dict(zip(*e.group_by("src").len().to_dict(as_series=False).values()))
    # per-position event layout (a node admitted twice scatters its
    # full edge set twice, exactly like adjacency.get(url) did)
    nodes = nodes0
    n_pos = len(nodes)
    cand_set = set(local)
    # candidate-candidate cascade edges, in global edge order
    cc = e.filter(pl.col("dst").is_in(list(cand_set)))

    vec = None
    if len(local) == n_pos:
        # no node admitted twice (the steady-state round): the whole
        # candidate replay vectorizes — see _cascade_fused_vectorized
        vec = _cascade_fused_vectorized(
            nodes, mass_np, local, deg_of, cc
        )
    if vec is not None:
        (sc_src, sc_wod, sc_ev0, ev,
         c_nodes, c_vals, c_arrs, tail_nodes, tail_vals) = vec
    else:
        # scalar replay (duplicate candidates, or vectorized-path bailout)
        masses = [None if m != m else ("haircut", float(m)) for m in mass_np]
        degs = [deg_of.get(n, 0) or 0 for n in nodes]
        first_arr: Dict[Any, int] = {}
        order: List[Any] = []

        def _first(n, ev_):
            if n not in first_arr:
                first_arr[n] = ev_
                order.append(n)

        cc_of: Dict[Any, List[tuple]] = {}
        for s_, d_, o_ in zip(cc["src"].to_list(), cc["dst"].to_list(), cc["ord"].to_list()):
            cc_of.setdefault(s_, []).append((o_, d_))
        ev = 0
        w_pos = [0.0] * n_pos
        ev_start = [0] * n_pos
        scatter = [False] * n_pos
        for p, (node, mass, deg) in enumerate(zip(nodes, masses, degs)):
            if mass is not None:
                local[node] += mass[1]
                _first(node, ev)
                ev += 1
            if deg == 0:
                continue
            scatter[p] = True
            w = local[node]
            local[node] = 0.0
            w_pos[p] = w
            ev_start[p] = ev
            for o_, d_ in cc_of.get(node, ()):
                local[d_] += w / deg
                _first(d_, ev + o_)
            ev += deg
        sc_src = [n for p, n in enumerate(nodes) if scatter[p]]
        sc_wod = [w_pos[p] / degs[p] for p in range(n_pos) if scatter[p]]
        sc_ev0 = [ev_start[p] for p in range(n_pos) if scatter[p]]
        c_nodes = order
        c_vals = _np.fromiter(
            (local[n] for n in order), dtype=_np.float64, count=len(order)
        )
        c_arrs = _np.fromiter(
            (first_arr[n] for n in order), dtype=_np.int64, count=len(order)
        )
        tail_nodes = [n for n in uniq if n not in first_arr and local[n]]
        tail_vals = _np.fromiter(
            (local[n] for n in tail_nodes), dtype=_np.float64, count=len(tail_nodes)
        )
    base = arrival0  # one _next_arrival() per event, reserved in bulk
    # vectorized: per-(position, edge) weights to NON-candidate dsts
    pos_df = pl.DataFrame(
        {"src": sc_src, "w_over_deg": sc_wod, "ev0": sc_ev0}
    )
    # columnar delta assembly: nodes stay a Python list, weights/arrivals
    # ride numpy, and the first-touch ordering is one argsort
    d_nodes: List[Any] = []
    parts_v: List[_np.ndarray] = []
    parts_a: List[_np.ndarray] = []
    if pos_df.height and e.height:
        flat = pos_df.join(e, on="src", how="inner").filter(
            ~pl.col("dst").is_in(pl.Series(list(cand_set)))
        )
        if flat.height:
            agg = (
                flat.with_columns((pl.col("ev0") + pl.col("ord")).alias("ev"))
                .group_by("dst")
                .agg(pl.col("w_over_deg").sum().alias("delta"), pl.col("ev").min())
            )
            d_nodes.extend(agg["dst"].to_list())
            parts_v.append(agg["delta"].to_numpy())
            parts_a.append(base + agg["ev"].to_numpy().astype(_np.int64))
    if len(c_nodes):
        d_nodes.extend(c_nodes)
        parts_v.append(c_vals)
        parts_a.append(base + c_arrs)
    if d_nodes:
        vals = _np.concatenate(parts_v) if len(parts_v) > 1 else parts_v[0]
        arrs = _np.concatenate(parts_a) if len(parts_a) > 1 else parts_a[0]
        srt = _np.argsort(arrs, kind="stable")  # first-touch order, generic parity
        d_nodes = [d_nodes[i] for i in srt]
        vals, arrs = vals[srt], arrs[srt]
    else:
        vals = _np.zeros(0, dtype=_np.float64)
        arrs = _np.zeros(0, dtype=_np.int64)
    # candidates taken but never touched again keep their weight
    # (arrival 0 = keep existing arrival; appended last as in the
    # generic tail)
    if len(tail_nodes):
        d_nodes.extend(tail_nodes)
        vals = _np.concatenate([vals, tail_vals])
        arrs = _np.concatenate([arrs, _np.zeros(len(tail_nodes), dtype=_np.int64)])
    if d_nodes:
        pool.apply_deltas_arr(d_nodes, vals, arrs)
    return base + ev


def _cascade_fused_vectorized(nodes, mass_np, local, deg_of, cc):
    """Fully-vectorized candidate replay for duplicate-free rounds.

    The per-candidate scalar loop is ~8us/candidate of pure Python — the
    weight crawl's largest CPU-count-invariant cost once everything else
    is columnar.  The replay decomposes exactly:

    - event layout: each position consumes (has_mass + deg) events, so
      restore/scatter event indices are one cumsum;
    - take values: w_p = ((t_p + early-cc-in) + m_p) where early-cc-in
      sums contributions from positions q < p — a strictly-triangular
      linear system solved by Jacobi sweeps (exact in <= cc-chain-depth
      iterations, detected by fixpoint; bails out to the scalar loop if
      64 sweeps don't converge);
    - candidate residues: positions with deg>0 keep only late (q >= p)
      contributions; deg==0 positions keep everything.

    Floating-point EXACTNESS vs the scalar loop: contributions accumulate
    via np.add.at — which applies additions in operand order — over cc
    arrays pre-sorted by (source position, edge order) = the scalar
    loop's chronological order, the base starts from t (then adds early
    contributions, then m) exactly as local[] evolves, and late
    contributions accumulate onto 0.0 post-take.  Same adds, same order,
    same rounding — pinned by the sharded-vs-local and tabular-vs-scalar
    conformance suites.

    Returns (sc_src, sc_wod, sc_ev0, ev_total, cand_nodes, cand_vals,
    cand_arrs, tail_nodes, tail_vals) or None to bail out."""
    import numpy as np

    n = len(nodes)
    pos_of = {u: p for p, u in enumerate(nodes)}
    t = np.fromiter((local[u] for u in nodes), dtype=np.float64, count=n)
    hm = ~np.isnan(mass_np)
    m = np.where(hm, mass_np, 0.0)
    deg = np.fromiter((deg_of.get(u, 0) or 0 for u in nodes), dtype=np.int64, count=n)
    units = hm.astype(np.int64) + np.where(deg > 0, deg, 0)
    cum = np.concatenate([[0], np.cumsum(units)[:-1]])
    ev_restore = cum  # valid where hm
    ev_sc0 = cum + hm  # scatter block start (valid where deg > 0)
    ev_total = int(units.sum())

    if cc.height:
        qi = np.fromiter((pos_of[s] for s in cc["src"].to_list()), np.int64, cc.height)
        pi = np.fromiter((pos_of[d] for d in cc["dst"].to_list()), np.int64, cc.height)
        ordv = cc["ord"].to_numpy().astype(np.int64)
        # chronological order = (source position, edge order): the exact
        # sequence the scalar loop applies contributions in
        srt = np.lexsort((ordv, qi))
        qi, pi, ordv = qi[srt], pi[srt], ordv[srt]
        coef = 1.0 / deg[qi]
        eev = ev_sc0[qi] + ordv
        early = qi < pi
        qe, pe, ce = qi[early], pi[early], coef[early]
        ql, pl_, cl = qi[~early], pi[~early], coef[~early]
    else:
        qe = pe = ce = ql = pl_ = cl = np.zeros(0, dtype=np.int64)
        pi = eev = np.zeros(0, dtype=np.int64)

    # solve take values: w = ((t + early_in) + m), early_in from final w
    w = np.where(hm, t + m, t)  # zeroth sweep (no early contributions)
    if len(qe):
        converged = False
        for _ in range(64):
            acc = t.copy()
            np.add.at(acc, pe, w[qe] * ce)
            w_new = np.where(hm, acc + m, acc)
            if np.array_equal(w_new, w):
                converged = True
                break
            w = w_new
        if not converged:
            return None  # pathological cc depth: scalar loop handles it
    # candidate residues after their own take
    late_in = np.zeros(n, dtype=np.float64)
    if len(ql):
        np.add.at(late_in, pl_, w[ql] * cl)
    final_local = np.where(deg > 0, late_in, w + late_in)
    # first-touch event per position: restore event, or earliest cc-in
    BIG = np.int64(1 << 62)
    fe = np.full(n, BIG, dtype=np.int64)
    if len(pi):
        np.minimum.at(fe, pi, eev)
    fe = np.where(hm, np.minimum(fe, ev_restore), fe)
    touched = fe < BIG
    t_idx = np.flatnonzero(touched)
    c_nodes = [nodes[i] for i in t_idx]
    c_vals = final_local[t_idx]
    c_arrs = fe[t_idx]
    # untouched candidates keep their weight only when never taken
    tail_mask = (~touched) & (deg == 0) & (t != 0.0)
    tl_idx = np.flatnonzero(tail_mask)
    tail_nodes = [nodes[i] for i in tl_idx]
    tail_vals = t[tl_idx]
    sc_mask = deg > 0
    s_idx = np.flatnonzero(sc_mask)
    sc_src = [nodes[i] for i in s_idx]
    sc_wod = w[s_idx] / deg[s_idx]
    sc_ev0 = ev_sc0[s_idx]
    return (
        sc_src, sc_wod, sc_ev0, ev_total,
        c_nodes, c_vals, c_arrs, tail_nodes, tail_vals,
    )


import ray as _ray


_PUSH_ACTOR_CACHE: Dict[Any, Any] = {}  # shard-identity -> live push actor


def flush_cached_push_actors() -> None:
    """Barrier every cached push actor's fire-and-forget shard mutations.

    Called by RankPool.__init__'s reuse path BEFORE it resets shared shard
    actors for a fresh crawl: the previous crawl's push actor may still
    have unordered claim_many/apply_deltas submissions in flight toward
    those same shards, and the driver's reset wave is a different caller
    (no Ray ordering) — an unflushed stale claim landing after reset would
    mark nodes visited / zero values in the new crawl's state.  arrival()
    flushes the actor's attached pool."""
    for actor in list(_PUSH_ACTOR_CACHE.values()):
        try:
            _ray.get(actor.arrival.remote())
        except Exception:
            pass  # dead actor: reuse probe will respawn shards anyway


@_ray.remote(num_cpus=0)
class _HaircutPushActor:
    """Off-driver home of ShardedHaircut's per-round cascade replay
    (VERDICT r3 #1: the weight-strategy push was ~67% of crawl wall as
    driver-serial work).  The actor owns the arrival counter and talks to
    the SAME rank-shard actors through an attached facade; the driver
    fire-and-forgets one ``push_round`` per crawl round and prefetches
    the next pop's top-k scans with ``submit_scans`` — actor-FIFO
    ordering guarantees the scans observe the pushes."""

    def __init__(self, shard_handles, arrival0: int):
        import os as _os

        # must precede the first polars import in this worker process: a
        # multi-thread polars pool costs 4-7x fork/join overhead on the
        # small per-round frames the cascade builds (see bench.py header)
        _os.environ["POLARS_MAX_THREADS"] = "1"
        self.pool = RankPool.attached(shard_handles)
        self._arrival = int(arrival0)

    def reset_state(self, shard_handles, arrival0: int) -> bool:
        """Re-arm a REUSED actor for a fresh crawl (same process, new or
        reset shard set) — spawning this actor costs a polars import.
        Flush the OLD pool first: its fire-and-forget submissions from the
        previous crawl must land before the new crawl reads/reset state
        (same race class as flush_cached_push_actors)."""
        old = getattr(self, "pool", None)
        if old is not None:
            old.flush()
        self.pool = RankPool.attached(shard_handles)
        self._arrival = int(arrival0)
        return True

    def push_round(
        self, items, src_urls, dst_urls, skip_take=None, scan_k=None, min_weight=None,
        edge_refs=None,
    ):
        """Replay one round's cascade; with ``scan_k`` also run the ENTIRE
        next pop — per-shard top-k scans (FIFO-ordered behind this push's
        applies), global (weight desc, arrival asc) merge, and the claim
        wave — so the driver's whole push+pop round trip is ONE actor
        call.  Returns (arrival, tops[, n_edges]) where tops is the
        claimed global top-k — each node's parked mass equals its scan
        weight; (arrival, None) without scan_k.  With ``edge_refs`` the
        round's edge TABLES are pulled from the object store HERE (the
        decode bundles' refs, concatenated in bundle order == the driver
        sync path's concat order) — edge rows never touch the driver, and
        the return carries n_edges for the engine's metrics."""
        n_edges = None
        if edge_refs is not None:
            import pyarrow as _pa

            tabs = [
                t for t in _ray.get(list(edge_refs))
                if t.num_columns and t.num_rows
            ]
            if tabs:
                et = _pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]
                src_urls = et.column("src_url").combine_chunks()
                dst_urls = et.column("dst_url").combine_chunks()
                n_edges = et.num_rows
            else:
                src_urls, dst_urls, n_edges = [], [], 0
        st = skip_take
        if st is not None and not (
            isinstance(st, tuple) and len(st) == 2 and st[0] == "flags"
        ):
            st = set(st)
        self._arrival = _haircut_round_columnar(
            self.pool, self._arrival, items, src_urls, dst_urls, skip_take=st
        )
        # NO flush needed: the applies are fire-and-forget, and the scans
        # below are ordered behind them by actor FIFO per shard; the claim
        # fires only after the scan results are back (causal).  Barrier
        # paths that need a hard guarantee call arrival(), which flushes.
        if scan_k is None:
            return (
                (self._arrival, None)
                if n_edges is None
                else (self._arrival, None, n_edges)
            )
        fused = self._scan_and_claim(scan_k, min_weight)
        return (
            (self._arrival, fused)
            if n_edges is None
            else (self._arrival, fused, n_edges)
        )

    def _scan_and_claim(self, scan_k: int, min_weight: float):
        """Columnar global top-k scan + atomic claim wave — the fused
        pop's state-plane half.  Per-shard array scans + one lexsort
        merge (the tuple-list form built and sorted 8k·k Python tuples
        per round); the claim is fire-and-forget (nothing mutates between
        the scan and the claim — the actor is single-threaded and later
        readers are FIFO/causally ordered), so each claimed node's parked
        mass provably equals its scan weight.  The nodes ship back as an
        Arrow array — a k-string Python list pickles ~3x slower."""
        import numpy as _np
        import pyarrow as _pa

        nodes, weights, _arrs = self.pool.top_k_arr(
            scan_k, min_weight, skip_visited=True
        )
        if not nodes:
            return [], None
        # claim split: one vectorized hash + one stable argsort (the
        # per-node dict-append loop cost ~3ms at 5k claims)
        shards = _np.asarray(self.pool._shards_of(nodes), dtype=_np.int64)
        order = _np.argsort(shards, kind="stable")
        srt = shards[order]
        starts = _np.flatnonzero(_np.r_[True, srt[1:] != srt[:-1]])
        bounds = _np.r_[starts, len(nodes)]
        self.pool._note(
            [
                self.pool.shards[int(srt[st])].claim_many.remote(
                    [nodes[i] for i in order[st:bounds[j + 1]]]
                )
                for j, st in enumerate(starts)
            ]
        )
        return _pa.array(nodes, _pa.string()), weights

    def scan_claim(self, scan_k: int, min_weight: float):
        """Standalone scan+claim for the PIPELINED weight round loop: the
        driver submits this BEFORE the round's push, so by actor FIFO it
        reads the PRE-cascade state — the pop it feeds is one round
        STALE.  Guarantees preserved (CrawlConfig.pipeline docs): every
        claim is still atomic (visited + mass parked in one wave), no
        node is ever claimed twice, and on exhaustive crawls the final
        fetch SET equals the strict loop's (weights only accumulate until
        claimed, so everything above min_weight is eventually popped);
        per-round pop COMPOSITION differs from strict BSP.  Returns
        (arrival, fused) in push_round's fused shape."""
        return self._arrival, self._scan_and_claim(scan_k, min_weight)

    def submit_scans(self, k: int, min_value: float, skip_visited: bool):
        """Per-shard top-k scan refs, submitted AFTER any queued pushes
        (actor FIFO) — the driver collects them at the next pop."""
        return [
            s.top_candidates.remote(k, min_value, skip_visited)
            for s in self.pool.shards
        ]

    def arrival(self) -> int:
        self.pool.flush()
        return self._arrival


class ShardedHaircut(FrontierStrategy):
    """Reference haircut semantics (strategies/haircut.py here;
    reference strategies/txs/haricut.py:6-54) over a RankPool."""

    # engine hook: extra seeds may carry CrawlConfig.seed_mass as parked
    # mass with this tag (the multi-source weight-crawl generalization)
    SEED_MASS_TAG = "haircut"

    def __init__(
        self,
        source: str,
        min_weight: float = 1e-3,
        num_shards: int = 4,
        use_ray: bool = True,
        **kwargs: Any,
    ):
        super().__init__(source)
        self.min_weight = float(min_weight)
        assert 0 < self.min_weight < 1
        self.pool = RankPool(
            num_shards, use_ray=use_ray,
            reuse_actors=bool(kwargs.get("reuse_actors", False)),
        )
        self._arrival = 0
        self._push_actor = None  # lazy off-driver cascade home (use_ray)
        self._pending_push = None  # in-flight push_round ref (actor mode)
        # True while the push actor may hold UN-FLUSHED fire-and-forget
        # shard mutations (its push_round applies/claims) whose push_round
        # ref the driver already consumed — _barrier_push must still
        # flush the actor (arrival()) before any driver-side shard read
        self._actor_dirty = False
        self._prefetch = None
        self._last_k = None  # engine pop_k, remembered for fused push+scan
        self._just_claimed = None  # nodes parked by the latest pop_batch
        self.last_pop_wait_s = 0.0  # state-plane wait inside pop_batch
        self.pool.apply_deltas([(source, 1.0, self._next_arrival())])
        self.pool.mark_visited(source)

    def _next_arrival(self) -> int:
        a = self._arrival
        self._arrival += 1
        return a

    def _get_push_actor(self):
        """Spawn (once) the off-driver cascade actor.  From that point the
        arrival counter lives in the actor — every later push MUST route
        through it (push_round_columnar does).  BCS_HAIRCUT_PUSH_ACTOR=0
        keeps the cascade on the driver (A/B hook)."""
        import os as _os

        if _os.environ.get("BCS_HAIRCUT_PUSH_ACTOR", "1") != "1":
            return None
        if self._push_actor is None and self.pool.use_ray:
            key = getattr(self.pool.shards[0], "_actor_id", None)
            cached = _PUSH_ACTOR_CACHE.get(key)
            if cached is not None:
                try:
                    _ray.get(
                        cached.reset_state.remote(list(self.pool.shards), self._arrival)
                    )
                    self._push_actor = cached
                    return cached
                except Exception:
                    pass
            _PUSH_ACTOR_CACHE.clear()  # at most one live push actor
            self._push_actor = _HaircutPushActor.remote(
                list(self.pool.shards), self._arrival
            )
            _PUSH_ACTOR_CACHE[key] = self._push_actor
        return self._push_actor

    def set_checkpoint_mode(self, on: bool) -> None:
        """Engine hook for checkpointed crawls: the fused push must NOT
        claim the next round's pops (the claims would be captured by the
        per-round checkpoint while the popped mass lives only in an
        unpersisted object ref — a resume would find the nodes visited
        with their mass lost).  Checkpoint mode falls back to scan-only
        prefetch + claim-at-pop, which happens after the round's
        checkpoint.  Caught by the weight kill/resume drive."""
        self._ckpt_mode = bool(on)

    def _barrier_push(self) -> None:
        """Wait for the in-flight off-driver push (if any), adopt its
        arrival counter, and hard-barrier the actor's fire-and-forget
        applies (arrival() flushes) — after this, driver-side pool reads
        observe every applied delta.  Also barriers when a fused
        push_round's ref was already consumed by pop_batch but the
        actor's own fire-and-forget shard submissions (applies + claims)
        were never flushed (_actor_dirty): a driver->shard read is a
        different caller than the actor, so without the flush it has no
        ordering guarantee vs those in-flight mutations."""
        if self._pending_push is not None:
            res = _ray.get(self._pending_push)
            self._arrival = res[0] if isinstance(res, tuple) else res
            self._pending_push = None
            if self._push_actor is not None:
                self._arrival = _ray.get(self._push_actor.arrival.remote())
            self._actor_dirty = False
        elif getattr(self, "_actor_dirty", False) and self._push_actor is not None:
            self._arrival = _ray.get(self._push_actor.arrival.remote())
            self._actor_dirty = False

    def _detach_actor(self) -> None:
        """Fold the actor's state back into the driver (mixed
        scalar/columnar API usage, or checkpoint pickling): barrier the
        pending push, adopt the authoritative arrival counter, drop the
        actor.  The next columnar push re-creates it."""
        self._barrier_push()
        self._just_claimed = None  # only valid between one pop and its push
        if self._push_actor is not None:
            self._arrival = _ray.get(self._push_actor.arrival.remote())
            self._push_actor = None

    def __getstate__(self) -> dict:
        # checkpoints must never carry actor handles / object refs
        # (session-bound — the r3 resume-bug class); fold the actor state
        # into the driver first
        self._detach_actor()
        st = dict(self.__dict__)
        st["_push_actor"] = None
        st["_pending_push"] = None
        st["_actor_dirty"] = False
        st["_prefetch"] = None
        st["_just_claimed"] = None
        return st

    def push(self, node, edges: list, **kwargs: Any) -> None:
        self._detach_actor()  # scalar path owns arrival driver-side
        out_sum = 0.0
        out_edges = []
        for e in edges:
            if e.get("from") == node:
                out_sum += float(e.get("value", 0))
                out_edges.append(e)
        if out_sum == 0:
            return  # zero out-value keeps its weight (reference early return)
        node_weight = self.pool.take(node)
        deltas = []
        for oe in out_edges:
            deltas.append(
                (oe.get("to"), node_weight * float(oe.get("value")) / out_sum, self._next_arrival())
            )
        self.pool.apply_deltas(deltas)

    def pop(self) -> Tuple[Any, Dict]:
        self._barrier_push()
        top = self.pool.top_candidate(self.min_weight, skip_visited=True)
        if top is None:
            return None, {}
        node, weight, _ = top
        self.pool.mark_visited(node)
        return node, {"weight": weight}

    def prepare_pop(self, k: int) -> None:
        """Engine hook: submit the next pop's per-shard top-k scans right
        after this round's pushes — the scan then overlaps the engine's
        write/checkpoint stage instead of blocking the next pop.  In actor
        mode the scans usually already ride the fused push call
        (push_round_columnar); otherwise they're submitted BY the push
        actor, so actor-FIFO ordering guarantees they observe the queued
        push.  Driver mode relies on per-shard FIFO the same way.  Safe
        here because Haircut's pop performs no pre-pop mutation."""
        self._last_k = k
        pre = self._prefetch
        if isinstance(pre, tuple) and pre and pre[0] == "actor_fused" and pre[1] >= k:
            return  # scans already riding the in-flight fused push
        if self._push_actor is not None:
            self._prefetch = (
                "actor",
                k,
                self._push_actor.submit_scans.remote(k, self.min_weight, True),
            )
        else:
            self._prefetch = self.pool.top_k_submit(k, self.min_weight, True)

    def pop_batch(self, k: int) -> List[Tuple[Any, Dict, Any]]:
        """k pops in O(shards) RPCs: each sequential pop only zeroes the
        popped node (engine extract_mass) and marks it visited, so k pops
        equal the top-k of the starting snapshot.  Returns
        [(node, ctx, parked_mass)] in pop order."""
        import time as _time

        pre = getattr(self, "_prefetch", None)
        self._prefetch = None
        t0 = _time.perf_counter()
        if isinstance(pre, tuple) and len(pre) == 3 and pre[0] == "actor_fused":
            # the in-flight fused push already scanned, merged AND claimed
            # the next top-k — one driver round trip for the whole pop
            _, pk, ref = pre
            got = _ray.get(ref)  # (arrival, tops[, n_edges])
            self._arrival, fused = got[0], got[1]
            self._pending_push = None  # the fused call WAS the push
            # the fused call's shard applies + claims are fire-and-forget
            # INSIDE the actor and not yet flushed — later driver-side
            # shard reads must barrier through the actor (arrival())
            self._actor_dirty = True
            nodes, weights = (fused if fused is not None else (None, None))
            if nodes is not None and not isinstance(nodes, list):
                nodes = nodes.to_pylist()  # Arrow wire form (scalar path)
            if nodes is None or pk < k:
                # prepared k too small (or scanless push): hard-barrier
                # the actor (its claims are fire-and-forget — an unclaim
                # racing ahead of a claim would lose mass), hand back any
                # claims, rescan fresh
                if self._push_actor is not None:
                    self._arrival = _ray.get(self._push_actor.arrival.remote())
                    self._actor_dirty = False
                if nodes:
                    self.pool.unclaim_many(list(zip(nodes, weights.tolist())))
                tops = self.pool.top_k(k, self.min_weight, skip_visited=True)
                taken = None
            else:
                if len(nodes) > k:
                    # over-claimed (engine asked for fewer than prepared):
                    # keep the top k, hand the rest back (barrier first —
                    # the actor's claims are fire-and-forget)
                    if self._push_actor is not None:
                        self._arrival = _ray.get(self._push_actor.arrival.remote())
                        self._actor_dirty = False
                    self.pool.unclaim_many(
                        list(zip(nodes[k:], weights[k:].tolist()))
                    )
                    nodes, weights = nodes[:k], weights[:k]
                if not nodes:
                    self.last_pop_wait_s = _time.perf_counter() - t0
                    return []
                # parked mass == scan weight (claimed, nothing in between)
                self._just_claimed = set(nodes)
                self.last_pop_wait_s = _time.perf_counter() - t0
                wl = weights.tolist()
                return [
                    (n, {"weight": w}, ("haircut", w)) for n, w in zip(nodes, wl)
                ]
        elif isinstance(pre, tuple) and len(pre) == 3 and pre[0] == "actor":
            _, pk, scans_ref = pre
            if pk >= k:
                merged = [t for tops_ in _ray.get(_ray.get(scans_ref)) for t in tops_]
                merged.sort(key=lambda t: (-t[1], t[2]))
                tops = merged[:k]
            else:
                self._barrier_push()
                tops = self.pool.top_k(k, self.min_weight, skip_visited=True)
            taken = None
        elif pre is not None and not isinstance(pre[0], str) and pre[0] >= k:
            tops = self.pool.top_k_collect(pre, k)
            taken = None
        else:
            self._barrier_push()
            tops = self.pool.top_k(k, self.min_weight, skip_visited=True)
            taken = None
        if not tops:
            self.last_pop_wait_s = _time.perf_counter() - t0
            return []
        nodes = [n for n, _, _ in tops]
        if taken is None:
            # claim AFTER the scans returned: causally ordered behind the
            # actor's applies even though it's a driver->shard wave
            taken = self.pool.claim_many(nodes)  # visited + park, one wave
        self._just_claimed = set(nodes)  # push may skip re-taking these
        # state-plane wait (shard scans/claims riding on actors), reported
        # apart from driver compute by the engine (pop vs pop_wait)
        self.last_pop_wait_s = _time.perf_counter() - t0
        return [(n, {"weight": w}, ("haircut", taken[n])) for n, w, _ in tops]

    # -- columnar control plane (engine tabular weight loop) ---------------
    # VERDICT r4 #1: the scalar round loop moved the 2048-candidate pop and
    # push through per-candidate Python objects (Candidate instances, ctx
    # dicts, (node, mass, ctx) tuples) — the residual 22% driver-serial
    # share.  pop_table/push_round_refs keep the control plane as
    # (list, float64 array) pairs end-to-end and leave the round's edge
    # tables in the object store (the push actor ray.gets the decode
    # bundles' refs itself).

    def pop_table(self, k: int):
        """Columnar batched pop: ``(urls, weights)`` — weights double as
        pop priority AND parked mass (the claim parks exactly the scan
        weight; both the fused and the barriered fallback path guarantee
        nothing mutates in between).  Also stashes ``last_edge_count``
        when the consumed fused push carried the round's edge tally."""
        import time as _time

        self.last_edge_count = None
        pre = getattr(self, "_prefetch", None)
        if (
            isinstance(pre, tuple)
            and len(pre) == 3
            and pre[0] in ("actor_fused", "actor_scan")
            and pre[1] >= k
        ):
            stale = pre[0] == "actor_scan"
            self._prefetch = None
            t0 = _time.perf_counter()
            got = _ray.get(pre[2])  # (arrival, tops[, n_edges])
            fused = got[1]
            if not stale:
                self._arrival = got[0]
                if len(got) > 2:
                    self.last_edge_count = got[2]
                self._pending_push = None  # the fused call WAS the push
            # either way the actor holds un-flushed fire-and-forget
            # applies/claims — barrier paths must flush through it
            self._actor_dirty = True
            nodes, weights = (fused if fused is not None else (None, None))
            if nodes is not None:
                arrow = not isinstance(nodes, list)
                if len(nodes) > k:
                    if self._push_actor is not None:
                        self._arrival = _ray.get(self._push_actor.arrival.remote())
                        self._actor_dirty = False
                    surplus = nodes.slice(k).to_pylist() if arrow else nodes[k:]
                    self.pool.unclaim_many(list(zip(surplus, weights[k:].tolist())))
                    nodes = nodes.slice(0, k) if arrow else nodes[:k]
                    weights = weights[:k]
                # NOTE: no claimed-set build — tabular-loop callers hand
                # the claim information back positionally (claimed_flags)
                self._just_claimed = None
                self.last_pop_wait_s = _time.perf_counter() - t0
                if weights is None:
                    import numpy as _np

                    weights = _np.zeros(0, dtype=_np.float64)
                # nodes may be an Arrow array (compact wire form) — the
                # engine's frame build consumes it zero-copy
                return nodes, weights
            # scanless fused push: fall through to the generic pop (its
            # no-prefetch branch barriers the dirty actor first)
        batch = self.pop_batch(k)  # handles every other prefetch shape
        import numpy as _np

        urls = [n for n, _, _ in batch]
        w = _np.fromiter(
            (m[1] for _, _, m in batch), dtype=_np.float64, count=len(batch)
        )
        return urls, w

    def prepare_pop_stale(self, k: int) -> None:
        """Pipelined-mode pop prefetch (CrawlConfig.pipeline on weight
        strategies): submit the actor's scan+claim BEFORE the round's
        push — actor FIFO places it ahead of the cascade, so the next pop
        reads the PRE-cascade state (one round stale) and costs the
        driver zero cascade wait.  Exhaustive-crawl fetch-set equality vs
        the strict loop is pinned by tests (see
        _HaircutPushActor.scan_claim)."""
        actor = self._get_push_actor()
        if actor is None:
            return  # thread-local pools: pop_table's fallback scans fresh
        self._actor_dirty = True  # claims in flight until flushed
        self._prefetch = (
            "actor_scan", k, actor.scan_claim.remote(k, self.min_weight)
        )

    def push_round_refs(
        self, nodes, mass_vals, edge_refs, scan_k=None, claimed_flags=None
    ) -> None:
        """Fused columnar push: the admitted candidates go out as
        ``(list, float64 array)`` (NaN mass = seed / never-claimed) and
        the round's edge tables stay in the object store — the push actor
        pulls ``edge_refs`` itself, so edge rows never touch the driver,
        and with ``scan_k`` the same call runs the next pop's
        scan+merge+claim (consumed by :meth:`pop_table`).  Falls back to
        the driver cascade (edges fetched here) when the push actor is
        disabled."""
        import numpy as _np

        if claimed_flags is not None:
            # positional claim flags: no claimed-node SET ships back to
            # the actor (it IS the nodes list + one bool per row)
            skip = ("flags", _np.asarray(claimed_flags, dtype=bool))
            self._just_claimed = None
        else:
            claimed = self._just_claimed
            self._just_claimed = None
            skip = set(claimed) if claimed else None
        items = (list(nodes), _np.asarray(mass_vals, dtype=_np.float64))
        actor = self._get_push_actor()
        if actor is not None:
            k = None if getattr(self, "_ckpt_mode", False) else scan_k
            self._pending_push = actor.push_round.remote(
                items,
                None,
                None,
                skip,
                k,
                self.min_weight if k is not None else None,
                list(edge_refs),
            )
            if k is not None:
                self._prefetch = ("actor_fused", k, self._pending_push)
            return
        import pyarrow as _pa

        tabs = [t for t in _ray.get(list(edge_refs)) if t.num_columns and t.num_rows]
        if tabs:
            et = _pa.concat_tables(tabs) if len(tabs) > 1 else tabs[0]
            src = et.column("src_url").combine_chunks()
            dst = et.column("dst_url").combine_chunks()
            self.last_edge_count = et.num_rows
        else:
            src, dst = [], []
            self.last_edge_count = 0
        self._arrival = _haircut_round_columnar(
            self.pool, self._arrival, items, src, dst, skip_take=skip
        )

    def push_round(self, items: List[Tuple[Any, Any, Dict, list]]) -> None:
        """One round's pushes in O(shards) RPCs (vs O(candidates x shards)
        for the sequential restore_mass+push loop).  ``items`` is
        [(node, parked_mass, ctx, edges)] in admitted order.  In-round
        weight flow (candidate i scattering onto candidate j>i) is tracked
        in a driver-local dict exactly as the pool would see it
        sequentially; the net per-node deltas — with each node's FIRST
        in-round arrival index for the insertion-order tie-break — apply in
        ONE batched call.  Pop-order equivalence vs the sequential loop is
        pinned in tests (engine sharded-vs-local conformance)."""
        self._detach_actor()  # dict-edge path owns arrival driver-side
        uniq = list(dict.fromkeys(n for n, _, _, _ in items))
        local = self.pool.take_many(uniq)  # pool values for candidate nodes
        net: Dict[Any, float] = {}  # in-round deltas to non-candidates
        first_arr: Dict[Any, int] = {}
        order: List[Any] = []

        def _add(n, d, a):
            if n in local:
                local[n] += d
            else:
                net[n] = net.get(n, 0.0) + d
            if n not in first_arr:
                first_arr[n] = a
                order.append(n)

        for node, mass, _ctx, edges in items:
            if mass is not None:  # restore_mass
                _add(node, mass[1], self._next_arrival())
            out_sum = 0.0
            out_edges = []
            for e in edges:
                if e.get("from") == node:
                    out_sum += float(e.get("value", 0))
                    out_edges.append(e)
            if out_sum == 0:
                continue  # zero out-value keeps its weight (reference early return)
            w = local.get(node, 0.0)  # take
            local[node] = 0.0
            for oe in out_edges:
                _add(oe.get("to"), w * float(oe.get("value")) / out_sum, self._next_arrival())
        deltas = [
            (n, local[n] if n in local else net[n], first_arr[n]) for n in order
        ]
        # candidates whose weight was taken but never pushed out (no mass
        # restored, zero out-value) keep their weight: write it back.  A
        # node with pool value already has a recorded arrival, so arrival 0
        # is ignored — and the sequential path consumed no counter here.
        for n in uniq:
            if n not in first_arr and local[n]:
                deltas.append((n, local[n], 0))
        if deltas:
            self.pool.apply_deltas(deltas)

    def push_round_columnar(self, items, src_urls, dst_urls, claimed_flags=None) -> None:
        """:meth:`push_round` for the web link shape (every edge value is
        1.0, so out-sum = out-degree): the engine passes the round's edge
        table columns straight through, never building per-edge dicts.
        The cascade math lives in :func:`_haircut_round_columnar`.

        With Ray shards the whole cascade replay runs OFF-DRIVER on the
        dedicated push actor (fire-and-forget — the driver's push stage
        is one actor-call submission; VERDICT r3 #1); thread-local pools
        run the identical shared function inline.  Pop ordering stays
        exact: the next pop's scans are submitted through the same actor
        (prepare_pop), so they observe every queued push (actor FIFO).
        Pinned by the engine sharded-vs-local conformance suite."""
        import numpy as _np

        if claimed_flags is not None:
            skip = ("flags", _np.asarray(claimed_flags, dtype=bool))
            self._just_claimed = None
        else:
            claimed = self._just_claimed
            self._just_claimed = None
            skip = set(claimed) if claimed else None
        actor = self._get_push_actor()
        if actor is not None:
            def _arr(x):
                return x.to_arrow() if hasattr(x, "to_arrow") else x

            # checkpoint mode: scan/claim must wait for the next pop (see
            # set_checkpoint_mode) — push only.  An "actor_scan" prefetch
            # (pipelined mode) already carries the next pop: don't fuse a
            # second scan onto this push.
            pre = self._prefetch
            stale_pending = isinstance(pre, tuple) and pre and pre[0] == "actor_scan"
            k = (
                None
                if (getattr(self, "_ckpt_mode", False) or stale_pending)
                else self._last_k
            )
            self._pending_push = actor.push_round.remote(
                # tuple = columnar (nodes, mass) form — ship as-is
                items if isinstance(items, tuple) else list(items),
                _arr(src_urls),
                _arr(dst_urls),
                skip if not isinstance(skip, set) else list(skip),
                k,
                self.min_weight if k is not None else None,
            )
            if k is not None:
                # the fused call carries the next pop's scan refs too
                self._prefetch = ("actor_fused", k, self._pending_push)
            return
        self._arrival = _haircut_round_columnar(
            self.pool, self._arrival, items, src_urls, dst_urls, skip_take=skip
        )


    def extract_mass(self, node):
        self._barrier_push()
        return ("haircut", self.pool.take(node))

    def restore_mass(self, node, mass) -> None:
        if mass is None:
            return
        self._detach_actor()  # consumes a driver-side arrival
        _, value = mass
        self.pool.apply_deltas([(node, value, self._next_arrival())])

    def get_context_snapshot(self) -> Dict:
        self._detach_actor()  # authoritative arrival + applied shards
        return {
            "source": self.source,
            "min_weight": self.min_weight,
            "shards": self.pool.snapshot(),
            "arrival": self._arrival,
        }

    def get_node_rank(self) -> Dict:
        self._barrier_push()
        return self.pool.ranks()


class ShardedTTRBase(FrontierStrategy):
    """TTR forward/backward residual push over a RankPool — exact semantics
    of TTRBase (reference ttr.py:39-99): degree-uniform splits, beta
    forward / (1-beta) backward, pop = argmax residual > epsilon with
    insertion-order tie-break (arrival indices)."""

    WEIGHTED = False

    def __init__(
        self,
        source: str,
        alpha: float = 0.15,
        beta: float = 0.8,
        epsilon: float = 1e-3,
        num_shards: int = 4,
        use_ray: bool = True,
        **kwargs: Any,
    ):
        super().__init__(source)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self.pool = RankPool(
            num_shards, use_ray=use_ray,
            reuse_actors=bool(kwargs.get("reuse_actors", False)),
        )
        self.p: Dict[Any, float] = {}
        self._arrival = 0
        self.pool.apply_deltas([(source, 1.0, self._next_arrival())])

    def _next_arrival(self) -> int:
        a = self._arrival
        self._arrival += 1
        return a

    def _splits(self, node, edges: list):
        """[(dst_node, fraction-of-(1-alpha)·r)] per reference semantics."""
        out = [e for e in edges if e["from"] == node]
        inn = [e for e in edges if e["to"] == node]
        splits = []
        if self.WEIGHTED:
            out_sum = sum(e["value"] for e in out)
            in_sum = sum(e["value"] for e in inn)
            for e in out:
                if out_sum > 0:
                    splits.append((e["to"], self.beta * e["value"] / out_sum))
            for e in inn:
                if in_sum > 0:
                    splits.append((e["from"], (1 - self.beta) * e["value"] / in_sum))
        else:
            for e in out:
                splits.append((e["to"], self.beta / len(out)))
            for e in inn:
                splits.append((e["from"], (1 - self.beta) / len(inn)))
        return splits

    def push(self, node, edges: list, **kwargs: Any) -> None:
        # reference registers the pushed node in r even when absent
        # (ttr.py:64-65) — keeps insertion order identical for tie-breaks
        self.pool.apply_deltas([(node, 0.0, self._next_arrival())])
        r = self.pool.take(node)
        self.p[node] = self.p.get(node, 0.0) + self.alpha * r
        deltas = [
            (dst, (1 - self.alpha) * frac * r, self._next_arrival())
            for dst, frac in self._splits(node, edges)
        ]
        if deltas:
            self.pool.apply_deltas(deltas)

    def pop(self) -> Tuple[Any, Dict]:
        top = self.pool.top_candidate(self.epsilon, skip_visited=False)
        if top is None:
            return None, {}
        node, r, _ = top
        if r <= self.epsilon:
            return None, {}
        return node, {"residual": r}

    def prepare_pop(self, k: int) -> None:
        """See ShardedHaircut.prepare_pop (TTR pop = plain top-k, no
        pre-pop mutation, so the scan can be prefetched)."""
        self._prefetch = self.pool.top_k_submit(k, self.epsilon, False)

    def pop_batch(self, k: int) -> List[Tuple[Any, Dict, Any]]:
        """k pops in O(shards) RPCs (see ShardedHaircut.pop_batch)."""
        pre = getattr(self, "_prefetch", None)
        self._prefetch = None
        if pre is not None and pre[0] >= k:
            raw = self.pool.top_k_collect(pre, k)
        else:
            raw = self.pool.top_k(k, self.epsilon, skip_visited=False)
        tops = [
            t for t in raw
            if t[1] > self.epsilon  # pop's strict threshold
        ]
        if not tops:
            return []
        taken = self.pool.take_many([n for n, _, _ in tops])
        return [(n, {"residual": r}, ("scalar", taken[n])) for n, r, _ in tops]

    def push_round(self, items: List[Tuple[Any, Any, Dict, list]]) -> None:
        """One round's pushes in O(shards) RPCs; exact sequential semantics
        (see ShardedHaircut.push_round for the local/net bookkeeping)."""
        uniq = list(dict.fromkeys(n for n, _, _, _ in items))
        local = self.pool.take_many(uniq)
        net: Dict[Any, float] = {}
        first_arr: Dict[Any, int] = {}
        order: List[Any] = []

        def _add(n, d, a):
            if n in local:
                local[n] += d
            else:
                net[n] = net.get(n, 0.0) + d
            if n not in first_arr:
                first_arr[n] = a
                order.append(n)

        for node, mass, _ctx, edges in items:
            if mass is not None:  # restore_mass
                _add(node, mass[1], self._next_arrival())
            # reference registers the pushed node in r even when absent
            # (ttr.py:64-65) — 0.0 delta carries the insertion-order slot
            _add(node, 0.0, self._next_arrival())
            r = local[node]  # take
            local[node] = 0.0
            self.p[node] = self.p.get(node, 0.0) + self.alpha * r
            for dst, frac in self._splits(node, edges):
                _add(dst, (1 - self.alpha) * frac * r, self._next_arrival())
        deltas = [(n, local[n] if n in local else net[n], first_arr[n]) for n in order]
        if deltas:
            self.pool.apply_deltas(deltas)

    def extract_mass(self, node):
        return ("scalar", self.pool.take(node))

    def restore_mass(self, node, mass) -> None:
        if mass is None:
            return
        _, value = mass
        self.pool.apply_deltas([(node, value, self._next_arrival())])

    def get_context_snapshot(self) -> Dict:
        return {
            "source": self.source,
            "alpha": self.alpha,
            "beta": self.beta,
            "epsilon": self.epsilon,
            "p": dict(self.p),
            "shards": self.pool.snapshot(),
            "arrival": self._arrival,
        }

    def get_node_rank(self) -> Dict:
        return dict(self.p)


class ShardedTTRWeight(ShardedTTRBase):
    """Value-proportional TTR splits (reference ttr.py:102-161)."""

    WEIGHTED = True


class ShardedAPPR(FrontierStrategy):
    """Push-based PPR over a RankPool — pop-order EXACT vs the reference.

    The drain loop replicates reference appr.py:55-68 one pick at a time:
    each iteration asks every shard for its earliest-arrival node with
    residual > epsilon and a memoized distribution (``first_drainable``),
    merges by arrival (== r-dict insertion order), drains that single node,
    and repeats — so credits, cascades and the final argmax tie-break all
    happen in the reference's sequence.  Divergence from the reference is
    limited to LRU eviction: the reference caps memoized distributions at
    an LRU (utils/cache.py), this scale path memoizes unboundedly
    (documented trade — eviction would silence ``first_drainable`` for
    evicted nodes)."""

    def __init__(
        self,
        source: str,
        alpha: float = 0.15,
        epsilon: float = 1e-5,
        num_shards: int = 4,
        use_ray: bool = True,
        **kwargs: Any,
    ):
        super().__init__(source)
        self.alpha = float(alpha)
        self.epsilon = float(epsilon)
        self.pool = RankPool(
            num_shards, use_ray=use_ray,
            reuse_actors=bool(kwargs.get("reuse_actors", False)),
        )  # residuals
        self.p: Dict[Any, float] = {}  # credited mass (pop-count-bounded)
        self.dists: Dict[Any, Dict[Any, float]] = {}  # node -> neighbour distribution
        self._arrival = 0
        self.pool.apply_deltas([(source, 1.0, self._next_arrival())])

    def _next_arrival(self) -> int:
        a = self._arrival
        self._arrival += 1
        return a

    def _credit_and_spread(self, node, r_node: float, dist: Dict[Any, float]) -> None:
        self.p[node] = self.p.get(node, 0.0) + r_node * self.alpha
        self.pool.apply_deltas(
            [(v, d * r_node, self._next_arrival()) for v, d in dist.items()]
        )

    def push(self, node, edges: list, **kwargs: Any) -> None:
        r_node = self.pool.take(node)
        if r_node == 0:
            return
        dist = self.dists.get(node)
        if dist is None:
            neighbours = set()
            for e in edges:
                neighbours.add(e.get("from"))
                neighbours.add(e.get("to"))
            neighbours.discard(node)
            n = len(neighbours)
            dist = {nb: (1 - self.alpha) / n for nb in neighbours} if n else {}
            self.dists[node] = dist
            if dist:  # reference treats an EMPTY cached dist as non-drainable
                self.pool.mark_drainable(node)
        self._credit_and_spread(node, r_node, dist)

    def _drain(self) -> None:
        """Reference-exact drain (appr.py:55-68): repeatedly pick THE
        earliest-arrival node with residual > epsilon and a memoized
        distribution, drain it, rescan.  One first_drainable round per
        drain — K tiny shard RPCs, never the full residual vector."""
        while True:
            cand = self.pool.first_drainable(self.epsilon)
            if cand is None:
                return
            node = cand[0]
            r_node = self.pool.take(node)
            if r_node > self.epsilon:
                self._credit_and_spread(node, r_node, self.dists[node])

    def pop(self) -> Tuple[Any, Dict]:
        self._drain()
        top = self.pool.top_candidate(self.epsilon, skip_visited=False)
        if top is None:
            return None, {}
        node, r, _ = top
        if r <= self.epsilon:
            return None, {}
        return node, {"residual": r}

    def pop_batch(self, k: int) -> List[Tuple[Any, Dict, Any]]:
        """k pops in O(shards + drains) RPCs: the drain loop runs ONCE —
        after it, no node is drainable above epsilon, and subsequent
        sequential pops' drains are no-ops (takes add no cached dists) —
        then top-k of the drained snapshot equals k sequential pops."""
        self._drain()
        tops = [
            t for t in self.pool.top_k(k, self.epsilon, skip_visited=False)
            if t[1] > self.epsilon
        ]
        if not tops:
            return []
        taken = self.pool.take_many([n for n, _, _ in tops])
        return [(n, {"residual": r}, ("scalar", taken[n])) for n, r, _ in tops]

    def push_round(self, items: List[Tuple[Any, Any, Dict, list]]) -> None:
        """One round's pushes in O(shards) RPCs; sequential semantics via
        driver-local in-round accumulation (see ShardedHaircut.push_round).
        Newly memoized distributions mark drainable in one batch — the
        flags are only read by the NEXT pop's drain, after this returns."""
        uniq = list(dict.fromkeys(n for n, _, _, _ in items))
        local = self.pool.take_many(uniq)
        net: Dict[Any, float] = {}
        first_arr: Dict[Any, int] = {}
        order: List[Any] = []
        new_drainable: List[Any] = []

        def _add(n, d, a):
            if n in local:
                local[n] += d
            else:
                net[n] = net.get(n, 0.0) + d
            if n not in first_arr:
                first_arr[n] = a
                order.append(n)

        for node, mass, _ctx, edges in items:
            if mass is not None:  # restore_mass
                _add(node, mass[1], self._next_arrival())
            r_node = local.get(node, 0.0)  # take
            if node in local:
                local[node] = 0.0
            if r_node == 0:
                continue  # reference early return BEFORE dist memoization
            dist = self.dists.get(node)
            if dist is None:
                neighbours = set()
                for e in edges:
                    neighbours.add(e.get("from"))
                    neighbours.add(e.get("to"))
                neighbours.discard(node)
                n_nb = len(neighbours)
                dist = {nb: (1 - self.alpha) / n_nb for nb in neighbours} if n_nb else {}
                self.dists[node] = dist
                if dist:  # reference treats an EMPTY cached dist as non-drainable
                    new_drainable.append(node)
            self.p[node] = self.p.get(node, 0.0) + r_node * self.alpha
            for v, d in dist.items():
                _add(v, d * r_node, self._next_arrival())
        deltas = [(n, local[n] if n in local else net[n], first_arr[n]) for n in order]
        # taken-but-untouched candidates keep any residue (arrival ignored
        # for already-registered nodes; sequential consumed no counter)
        for n in uniq:
            if n not in first_arr and local[n]:
                deltas.append((n, local[n], 0))
        if deltas:
            self.pool.apply_deltas(deltas)
        if new_drainable:
            self.pool.mark_drainable_many(new_drainable)

    def extract_mass(self, node):
        return ("scalar", self.pool.take(node))

    def restore_mass(self, node, mass) -> None:
        if mass is None:
            return
        _, value = mass
        self.pool.apply_deltas([(node, value, self._next_arrival())])

    def get_context_snapshot(self) -> Dict:
        return {
            "source": self.source,
            "alpha": self.alpha,
            "epsilon": self.epsilon,
            "p": dict(self.p),
            "dists": {k: dict(v) for k, v in self.dists.items()},
            "shards": self.pool.snapshot(),
            "arrival": self._arrival,
        }

    def get_node_rank(self) -> Dict:
        return dict(self.p)


class _ShardedChipTTR(FrontierStrategy):
    """Shared machinery for ShardedTTRTime / ShardedTTRAggregate.

    Push runs the LOCAL strategy's exact math on a scratch instance whose
    residual map is preloaded with just the pushed node's chips taken from
    the pool; the scratch residual afterwards IS the delta set, applied
    back to the shards keyed chips.  Because chip merges are keyed and
    additive, merged-on-insert pool state equals the reference's
    merge-after-every-push list form, and arrival indices assigned in
    scratch-iteration order equal the reference's r-dict insertion order —
    so pops are row-for-row identical to the local strategy (pinned in
    tests/test_rank_pool.py)."""

    LOCAL_CLS: type = None  # set by subclasses
    EMPTY_RESIDUAL: type = dict  # dict for TTRTime, list for TTRAggregate

    def __init__(
        self,
        source: str,
        alpha: float = 0.15,
        beta: float = 0.8,
        epsilon: float = 1e-3,
        num_shards: int = 4,
        use_ray: bool = True,
        **kwargs: Any,
    ):
        from ..state.chip_pool import ChipPool

        super().__init__(source)
        self.alpha, self.beta, self.epsilon = float(alpha), float(beta), float(epsilon)
        self.pool = ChipPool(num_shards, use_ray=use_ray)
        self.p: Dict[Any, float] = {}
        self._vis: set = set()
        self._arrival = 0

    def _next_arrival(self) -> int:
        a = self._arrival
        self._arrival += 1
        return a

    # chips <-> pool key/value codecs, per subclass
    def _chips_to_residual(self, taken):
        raise NotImplementedError

    def _residual_to_deltas(self, node, residual):
        raise NotImplementedError

    def push(self, node, edges: list, **kwargs: Any) -> None:
        scratch = self.LOCAL_CLS(
            self.source, alpha=self.alpha, beta=self.beta, epsilon=self.epsilon
        )
        scratch._vis = set(self._vis)
        taken = self.pool.take(node)
        scratch.r = {node: self._chips_to_residual(taken)}
        scratch.p = {}
        scratch.push(node, edges)
        self._vis |= scratch._vis
        for n, credit in scratch.p.items():
            self.p[n] = self.p.get(n, 0.0) + credit
        deltas = []
        for dst, residual in scratch.r.items():
            chunk = self._residual_to_deltas(dst, residual)
            if not chunk:  # registration only — node entered r empty
                deltas.append((dst, None, 0.0, self._next_arrival()))
            else:
                for key, value in chunk:
                    deltas.append((dst, key, value, self._next_arrival()))
        if deltas:
            self.pool.apply(deltas)

    def pop(self) -> Tuple[Any, Dict]:
        top = self.pool.top_candidate(self.epsilon)
        if top is None:
            return None, {}
        node, s, _ = top
        return node, self._pop_context(s)

    def prepare_pop(self, k: int) -> None:
        """See ShardedHaircut.prepare_pop (chip-TTR pop = plain top-k)."""
        self._prefetch = self.pool.top_k_submit(k, self.epsilon)

    def pop_batch(self, k: int) -> List[Tuple[Any, Dict, Any]]:
        """k pops in O(shards) RPCs (see ShardedHaircut.pop_batch)."""
        pre = getattr(self, "_prefetch", None)
        self._prefetch = None
        if pre is not None and pre[0] >= k:
            tops = self.pool.top_k_collect(pre, k)
        else:
            tops = self.pool.top_k(k, self.epsilon)
        if not tops:
            return []
        taken = self.pool.take_many([n for n, _, _ in tops])
        return [(n, self._pop_context(s), ("chips", taken[n])) for n, s, _ in tops]

    def push_round(self, items: List[Tuple[Any, Any, Dict, list]]) -> None:
        """One round's scratch-instance pushes with keyed-chip flow tracked
        driver-locally; ONE batched pool.apply at the end.  Chip insertion
        order per node (load-bearing, see state/chip_pool.py) is preserved:
        the local OrderedDicts accumulate in the exact delta sequence the
        sequential per-push applies would."""
        from collections import OrderedDict

        uniq = list(dict.fromkeys(n for n, _, _, _ in items))
        taken0 = self.pool.take_many(uniq)
        # local mirrors the pool's chip state for candidate nodes; None vs
        # empty distinguishes never-present from emptied (take() contract)
        local: Dict[Any, Any] = {
            n: (None if v is None else OrderedDict(v)) for n, v in taken0.items()
        }
        net: Dict[Any, "OrderedDict"] = {}
        first_arr: Dict[Any, int] = {}
        order: List[Any] = []

        def _touch(n, a):
            if n not in first_arr:
                first_arr[n] = a
                order.append(n)

        def _add_chip(n, key, val, a):
            if n in local:
                d = local[n]
                if d is None:
                    d = local[n] = OrderedDict()
                d[key] = d.get(key, 0.0) + val
            else:
                d = net.setdefault(n, OrderedDict())
                d[key] = d.get(key, 0.0) + val
            _touch(n, a)

        def _take_local(n):
            d = local.get(n)
            if d is None:
                return None
            local[n] = OrderedDict()
            return list(d.items())

        for node, mass, _ctx, edges in items:
            if mass is not None and mass[1] is not None:  # restore_mass
                chips = mass[1]
                if chips:
                    for key, val in chips:
                        _add_chip(node, key, val, self._next_arrival())
                else:
                    _touch(node, self._next_arrival())
            scratch = self.LOCAL_CLS(
                self.source, alpha=self.alpha, beta=self.beta, epsilon=self.epsilon
            )
            scratch._vis = set(self._vis)
            scratch.r = {node: self._chips_to_residual(_take_local(node))}
            scratch.p = {}
            scratch.push(node, edges)
            self._vis |= scratch._vis
            for n, credit in scratch.p.items():
                self.p[n] = self.p.get(n, 0.0) + credit
            for dst, residual in scratch.r.items():
                chunk = self._residual_to_deltas(dst, residual)
                if not chunk:  # registration only — node entered r empty
                    _touch(dst, self._next_arrival())
                    if dst in local:
                        if local[dst] is None:
                            local[dst] = OrderedDict()
                    else:
                        net.setdefault(dst, OrderedDict())
                else:
                    for key, value in chunk:
                        _add_chip(dst, key, value, self._next_arrival())
        deltas: List[tuple] = []
        for n in order:
            d = local.get(n) if n in local else net.get(n)
            if not d:
                deltas.append((n, None, 0.0, first_arr[n]))
            else:
                for key, val in d.items():
                    deltas.append((n, key, val, first_arr[n]))
        # taken-but-untouched candidates keep any leftover chips (arrival 0
        # is ignored for already-registered nodes; sequential consumed no
        # counter here)
        for n in uniq:
            if n not in first_arr and local.get(n):
                for key, val in local[n].items():
                    deltas.append((n, key, val, 0))
        if deltas:
            self.pool.apply(deltas)

    def _pop_context(self, s: float) -> Dict:
        return {"residual": s}

    # engine batched-pop mass parking
    def extract_mass(self, node):
        return ("chips", self.pool.take(node))

    def restore_mass(self, node, mass) -> None:
        if mass is None or mass[1] is None:
            return
        deltas = [(node, k, v, self._next_arrival()) for k, v in mass[1]]
        if not deltas:
            deltas = [(node, None, 0.0, self._next_arrival())]
        self.pool.apply(deltas)

    def get_context_snapshot(self) -> Dict:
        return {
            "source": self.source,
            "alpha": self.alpha,
            "beta": self.beta,
            "epsilon": self.epsilon,
            "p": dict(self.p),
            "vis": sorted(self._vis),
            "shards": self.pool.snapshot(),
            "arrival": self._arrival,
        }

    def get_node_rank(self) -> Dict:
        return dict(self.p)


class ShardedTTRTime(_ShardedChipTTR):
    """TTRTime (reference ttr.py:164-331) over sharded {ts: value} chips."""

    EMPTY_RESIDUAL = dict

    def __init__(self, *args, **kwargs):
        from .ttr import TTRTime

        type(self).LOCAL_CLS = TTRTime
        super().__init__(*args, **kwargs)

    def _chips_to_residual(self, taken):
        return dict(taken) if taken else {}

    def _residual_to_deltas(self, node, residual: dict):
        return list(residual.items())  # key = timestamp


class ShardedTTRAggregate(_ShardedChipTTR):
    """TTRAggregate / reference TTRRedirect (ttr.py:334-825) over sharded
    {(symbol, timestamp): value} chips."""

    EMPTY_RESIDUAL = list

    def __init__(self, *args, **kwargs):
        from .ttr import TTRAggregate

        type(self).LOCAL_CLS = TTRAggregate
        super().__init__(*args, **kwargs)

    def _chips_to_residual(self, taken):
        if not taken:
            return []
        return [
            dict(value=v, symbol=k[0], timestamp=k[1]) for k, v in taken
        ]

    def _residual_to_deltas(self, node, residual: list):
        return [
            ((c.get("symbol"), c.get("timestamp")), c.get("value", 0.0))
            for c in residual
        ]

    def _pop_context(self, s: float) -> Dict:
        return {"residual": s, "allow_all_tokens": True}
