"""BFS and Poison (taint) frontier strategies.

Semantics match reference strategies/txs/bfs.py and poison.py exactly:
- visited is marked at POP time, not at discovery;
- BFS enqueues both endpoints of every edge; Poison only follows
  out-edges of the expanded node;
- depth guard: a push at depth d enqueues at d+1 unless d+1 > max_depth
  (BFS additionally re-checks depth at pop, bfs.py:34).

The queue is chunked (one list-pair per push) so the engine's tabular
round path can enqueue a whole round's edges in O(chunks) appends and
drain pops in bulk (``pop_array``) — no per-edge tuple allocation on the
driver.  Scalar ``push``/``pop`` read through the same chunks in exactly
the reference's FIFO order, so conformance mode is unchanged.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from . import FrontierStrategy


class _ChunkQueue:
    """FIFO of ``[urls, depths, offset]`` chunks.

    O(1) bulk enqueue (the chunk is appended as-is, never copied) and
    offset-based consumption: scalar pops advance ``offset`` instead of
    shifting elements.  Pickles with the strategy for checkpoints.

    Chunks may arrive COLUMNAR (Arrow string array + numpy depths from the
    engine's bulk push) and are converted to Python lists lazily on first
    pop touch: a crawl pushes ~13x more frontier entries than it ever pops
    (bench store: 820k edges pushed, 62k urls fetched), so paying the
    string materialization per-entry at push time is mostly wasted work.
    """

    __slots__ = ("_chunks",)

    def __init__(self) -> None:
        self._chunks: deque = deque()

    def _sized(self, c):
        if type(c[0]).__name__ == "ObjectRef":
            self._touch(c)  # length unknown until resolved (rare path)
        return c

    def __bool__(self) -> bool:
        """Non-blocking truthiness: an unresolved ObjectRef chunk counts
        as non-empty WITHOUT waiting for its producing push task (it may
        resolve to an empty payload — acceptable false-positive: the next
        pop drains it as a no-op).  Keeps frontier truthiness probes safe
        while a pipelined round's push is still in flight."""
        return any(
            type(c[0]).__name__ == "ObjectRef" or c[2] < len(c[0])
            for c in self._chunks
        )

    def __len__(self) -> int:
        """Exact remaining entries.  BLOCKS on any unresolved ObjectRef
        chunk (the size is unknowable until the producing push task
        finishes) — use ``bool()`` for a non-blocking emptiness probe."""
        return sum(len(self._sized(c)[0]) - c[2] for c in self._chunks)

    def extend_chunk(self, urls, depths) -> None:
        if len(urls):
            self._chunks.append([urls, depths, 0])

    def extend_chunk_ref(self, ref) -> None:
        """Enqueue a chunk whose payload is still being computed in a Ray
        task ((urls, depths) or None); resolved lazily at pop touch."""
        self._chunks.append([ref, None, 0])

    @staticmethod
    def _touch(c) -> None:
        """Materialize a columnar chunk to Python lists in place.  A chunk
        may also be a Ray ObjectRef produced by the engine's off-driver
        push-join task (payload: (urls_arrow, depths_numpy) or None) —
        resolved only when a pop actually reaches it, by which point the
        task finished rounds ago."""
        if isinstance(c[0], list):
            return
        if type(c[0]).__name__ == "ObjectRef":
            import ray as _ray

            payload = _ray.get(c[0])
            if payload is None:
                c[0], c[1] = [], []
                return
            c[0], c[1] = payload
        c[0] = c[0].to_pylist() if hasattr(c[0], "to_pylist") else list(c[0])
        c[1] = c[1].tolist() if hasattr(c[1], "tolist") else list(c[1])

    # pushes outnumber pops ~13x on web link graphs, so materializing a
    # whole columnar chunk at first touch wastes most of the Python-string
    # conversions; pop_array touches windows of this size instead and the
    # zero-copy arrow remainder re-queues behind them
    TOUCH_WINDOW = 16384

    def touch_head(self, window: int = None, nonblocking: bool = False) -> bool:
        """Materialize the head chunk — or just its first ``window``
        entries, splitting the untouched remainder off as the next chunk
        (zero-copy arrow/numpy slices).  With ``nonblocking``, an
        ObjectRef head whose producing task hasn't finished returns False
        instead of blocking in ``ray.get`` (the engine's round-pipelining
        probe: 'can I pop round N+1 without waiting for round N's push?')."""
        c = self._chunks[0]
        if type(c[0]).__name__ == "ObjectRef":
            import ray as _ray

            if nonblocking:
                ready, _ = _ray.wait([c[0]], timeout=0, fetch_local=False)
                if not ready:
                    return False
            payload = _ray.get(c[0])
            if payload is None:
                c[0], c[1] = [], []
                return True
            c[0], c[1] = payload
        if isinstance(c[0], list):
            return True
        n = len(c[0])
        if window is not None and n > window and c[2] == 0:
            rest_u = c[0].slice(window) if hasattr(c[0], "slice") else c[0][window:]
            rest_d = c[1][window:]
            self._chunks.insert(1, [rest_u, rest_d, 0])
            c[0] = c[0].slice(0, window) if hasattr(c[0], "slice") else c[0][:window]
            c[1] = c[1][:window]
        c[0] = c[0].to_pylist() if hasattr(c[0], "to_pylist") else list(c[0])
        c[1] = c[1].tolist() if hasattr(c[1], "tolist") else list(c[1])
        return True

    def popleft(self):
        """Next (node, depth) or None when empty."""
        chunks = self._chunks
        while chunks:
            c = chunks[0]
            self._touch(c)
            if c[2] < len(c[0]):
                urls, depths, i = c
                c[2] = i + 1
                return urls[i], depths[i]
            chunks.popleft()
        return None

    # pickle support (deque of lists pickles natively; __slots__ needs
    # these).  Columnar chunks are materialized so the checkpoint format
    # stays plain lists regardless of how entries were pushed.
    def __getstate__(self):
        for c in self._chunks:
            self._touch(c)
        return list(self._chunks)

    def __setstate__(self, state):
        self._chunks = deque(state)


def _interleave(a: list, b: list) -> Tuple[list, list]:
    """([a0,b0,a1,b1,...], matching depth duplication helper input)."""
    out = [None] * (2 * len(a))
    out[0::2] = a
    out[1::2] = b
    return out


def _to_arrow_array(x):
    """Plain pyarrow.Array from a polars Series / arrow array / list."""
    import pyarrow as pa

    if hasattr(x, "to_arrow"):  # polars Series
        x = x.to_arrow()
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    if isinstance(x, pa.Array):
        return x
    return pa.array(list(x), pa.string())


def _interleave_arrow(a, b):
    """Arrow-level [a0,b0,a1,b1,...] — one concat + one take, no Python
    objects (the bulk-push analogue of :func:`_interleave`)."""
    import pyarrow as pa

    n = len(a)
    if a.type != b.type:
        b = b.cast(a.type)
    comb = pa.concat_arrays([a, b])
    idx = np.empty(2 * n, dtype=np.int64)
    idx[0::2] = np.arange(n)
    idx[1::2] = np.arange(n, 2 * n)
    return comb.take(pa.array(idx))


class _FifoBase(FrontierStrategy):
    """Shared chunk-queue machinery for BFS/Poison."""

    _pop_depth_check = False  # BFS re-checks depth at pop (reference bfs.py:34)

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source)
        self._max_depth = int(depth)
        self._vis = {source}
        self._queue = _ChunkQueue()

    def pop(self) -> Tuple[Any, Dict]:
        vis = self._vis
        md = self._max_depth
        check = self._pop_depth_check
        while True:
            item = self._queue.popleft()
            if item is None:
                return None, {}
            node, depth = item
            if node not in vis and (not check or depth <= md):
                vis.add(node)
                return node, {"depth": depth}

    def pop_array(self, k: int) -> Tuple[List[str], List[int]]:
        """Bulk pop: up to ``k`` unvisited nodes + their depths, marking
        them visited — the engine's tabular round path (one call per
        round instead of k ``pop()`` calls)."""
        u, d, _ = self._pop_array_impl(k, nonblocking=False)
        return u, d

    def pop_array_nb(self, k: int) -> Tuple[List[str], List[int], bool]:
        """Non-blocking bulk pop for the engine's round pipelining:
        returns (urls, depths, blocked).  ``blocked=True`` means the scan
        reached a queue chunk whose off-driver push task hasn't finished
        (i.e. the in-flight round's edges) before collecting ``k`` —
        the caller completes that round first and pops the remainder with
        :meth:`pop_array`.  Entries already popped stay popped (vis
        marked), exactly as a sequential pop prefix would."""
        return self._pop_array_impl(k, nonblocking=True)

    def _pop_array_impl(self, k: int, nonblocking: bool):
        """Shared scan.  Stays a scalar loop deliberately: the scan
        early-exits at the k-th take and fresh-url density at the queue
        head is high, so the loop touches only ~2-3x the taken entries.
        A vectorized (polars-mask) variant was measured SLOWER — it pays
        visited-set conversion + full-window masks for entries the scalar
        loop never reaches.  Columnar chunks materialize lazily in
        TOUCH_WINDOW slices (push is 13x more voluminous than pop on web
        link graphs, so most pushed strings never materialize at all)."""
        vis = self._vis
        md = self._max_depth
        check = self._pop_depth_check
        out_u: List[str] = []
        out_d: List[int] = []
        q = self._queue
        chunks = q._chunks
        while chunks and len(out_u) < k:
            if not q.touch_head(window=_ChunkQueue.TOUCH_WINDOW, nonblocking=nonblocking):
                return out_u, out_d, True
            c = chunks[0]
            urls, depths, i = c
            n = len(urls)
            for j in range(i, n):
                node = urls[j]
                if node not in vis and (not check or depths[j] <= md):
                    vis.add(node)
                    out_u.append(node)
                    out_d.append(depths[j])
                    if len(out_u) == k:
                        c[2] = j + 1
                        return out_u, out_d, False
            chunks.popleft()
        return out_u, out_d, False

    @staticmethod
    def _depth_filter_col(srcs, dsts, depths, md: int):
        """Columnar depth gate: (arrow srcs, arrow dsts, numpy d+1) with
        edges past ``md`` dropped, or Nones when nothing survives.  No
        Python string objects are created — enqueue stays Arrow and the
        queue materializes only chunks a pop actually reaches."""
        import pyarrow as pa

        d = (
            depths.to_numpy().astype(np.int64)
            if hasattr(depths, "to_numpy")
            else np.asarray(depths, dtype=np.int64)
        ) + 1
        if len(d) == 0:
            return None, None, None
        s, t = _to_arrow_array(srcs), _to_arrow_array(dsts)
        if d.max() > md:
            mask = d <= md
            if not mask.any():
                return None, None, None
            pm = pa.array(mask)
            s, t, d = s.filter(pm), t.filter(pm), d[mask]
        return s, t, d

    def push_chunk_ref(self, ref) -> None:
        """Enqueue an off-driver push-join result (ObjectRef of
        (urls, depths) or None) — the engine's driver-edge-free round
        path.  The producing task already applied this strategy's depth
        gate and edge shaping (see :meth:`columnar_push_spec`)."""
        self._queue.extend_chunk_ref(ref)

    def columnar_push_spec(self) -> Tuple[str, int]:
        """(edge shaping mode, max depth) the off-driver push task must
        apply to reproduce push_edges: 'interleave' enqueues both
        endpoints of every edge (BFS), 'dsts' only the targets (Poison)."""
        raise NotImplementedError

    def get_node_rank(self) -> Dict:
        return {}


class BFS(_FifoBase):
    """Breadth-first frontier (reference strategies/txs/bfs.py:7-47)."""

    _pop_depth_check = True

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source, depth=depth, **kwargs)
        self.max_depth = self._max_depth

    def push(self, node, edges: list, **kwargs) -> None:
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.max_depth or not edges:
            return
        urls = _interleave([e.get("from") for e in edges], [e.get("to") for e in edges])
        self._queue.extend_chunk(urls, [d] * len(urls))

    def push_pairs(self, node, dsts, **kwargs) -> None:
        """Engine fast path: push out-links (node -> dst for dst in dsts)
        without materializing per-edge dicts.  Identical to :meth:`push`
        over edges [{'from': node, 'to': d}] — both endpoints enqueue."""
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        n = len(dsts)
        if d > self.max_depth or n == 0:
            return
        urls = _interleave([node] * n, list(dsts))
        self._queue.extend_chunk(urls, [d] * (2 * n))

    def push_edges(self, srcs, dsts, depths) -> None:
        """Bulk push of a round's edges; ``depths[i]`` is the CURRENT
        depth of ``srcs[i]``.  Enqueue order is (src, dst) interleaved
        per edge — byte-identical to calling :meth:`push_pairs` per src
        in edge order.  Accepts polars Series / arrow arrays / lists and
        enqueues COLUMNAR (no per-string Python objects until a pop
        actually reaches the chunk)."""
        s, t, d1 = self._depth_filter_col(srcs, dsts, depths, self.max_depth)
        if s is None:
            return
        self._queue.extend_chunk(_interleave_arrow(s, t), np.repeat(d1, 2))

    def columnar_push_spec(self):
        return ("interleave", self.max_depth)

    def get_context_snapshot(self) -> Dict:
        return {"source": self.source, "max_depth": self.max_depth, "vis": list(self._vis)}


class Poison(_FifoBase):
    """Taint-forward frontier (reference strategies/txs/poison.py:7-41)."""

    _pop_depth_check = False

    def __init__(self, source: str, depth: int = 2, **kwargs: Any):
        super().__init__(source, depth=depth, **kwargs)
        self.depth = self._max_depth

    def push(self, node, edges: list, **kwargs) -> None:
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.depth:
            return
        dsts = [e.get("to") for e in edges if e.get("from") == node]
        if dsts:
            self._queue.extend_chunk(dsts, [d] * len(dsts))

    def push_pairs(self, node, dsts, **kwargs) -> None:
        """Engine fast path: all pairs are out-edges of ``node`` by
        construction, so every dst enqueues (taint follows out-edges)."""
        cur_depth = kwargs.get("depth", 0)
        assert cur_depth >= 0
        d = cur_depth + 1
        if d > self.depth or not dsts:
            return
        self._queue.extend_chunk(list(dsts), [d] * len(dsts))

    def push_edges(self, srcs, dsts, depths) -> None:
        """Bulk push: taint only follows out-edges, so only dsts enqueue
        (in edge order — identical to per-src :meth:`push_pairs`)."""
        _, t, d1 = self._depth_filter_col(srcs, dsts, depths, self.depth)
        if t is None:
            return
        self._queue.extend_chunk(t, d1)

    def columnar_push_spec(self):
        return ("dsts", self.depth)

    def get_context_snapshot(self) -> Dict:
        return {"source": self.source, "depth": self.depth, "vis": list(self._vis)}
