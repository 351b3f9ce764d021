"""Similarity query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



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
    _guard_brute_corpus(emb.count(), "label_knn_accuracy")
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


def q_mann_kendall(sf_dir: str):
    """Mann-Kendall trend test over daily event volume: S = sum of
    sign(n_j - n_i) for day i < day j, tie-corrected variance
    (m(m-1)(2m+5) - sum t(t-1)(2t+5)) / 18 and the continuity-corrected
    normal z — the non-parametric companion to q_theil_sen (that query
    gives the slope magnitude, this one its significance).  Same O(days)
    combiner reduce; the pair scan is driver-scalar on the calendar-
    bounded series."""
    d = _daily_counts(sf_dir)
    m = len(d)
    y = d["n"].to_numpy(np.int64)
    i, j = np.triu_indices(m, k=1)
    s = int(np.sign(y[j] - y[i]).astype(np.int64).sum())
    _, cnt = np.unique(y, return_counts=True)
    var = (m * (m - 1) * (2 * m + 5) - int((cnt * (cnt - 1) * (2 * cnt + 5)).sum())) / 18.0
    if s > 0 and var > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0 and var > 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return pd.DataFrame(
        {
            "n_days": [m],
            "s_stat": [s],
            "var_s": [float(_r(var, 6))],
            "z": [float(_r(z, 6))],
        }
    )


def q_mann_whitney(sf_dir: str):
    """Mann-Whitney U between src0's and src1's doc lengths (n_chars), the
    two-sample rank test (Wilcoxon rank-sum) that q_kruskal_wallis
    generalizes — with exact midranks, the tie-corrected normal sigma and
    continuity correction.  Shape: lengths are integers, so ranks come
    from a (value, count, count_in_A) histogram built by one combiner
    groupby — the full rank sum folds from O(distinct values) rows and no
    global sort ever runs."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "n_chars"],
        filter=pc.field("source").isin(["src0", "src1"]),
    )

    def hist(b: pa.Table) -> pa.Table:
        v = b.column("n_chars").to_numpy()
        ga = (
            pc.equal(b.column("source"), pa.scalar("src0"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        uniq, inv = np.unique(v, return_inverse=True)
        c = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        ca = np.bincount(inv, weights=ga, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "v": pa.array(uniq, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "ca": pa.array(ca, pa.int64()),
            }
        )

    h = (
        docs.map_batches(hist, batch_format="pyarrow")
        .groupby("v")
        .sum(["c", "ca"])
        .to_pandas()
        .rename(columns={"sum(c)": "c", "sum(ca)": "ca"})
    )
    if h.empty:  # neither source present: the mirror's NULL-stat row
        return pd.DataFrame({"n_a": [0], "n_b": [0], "u": [np.nan], "z": [np.nan]})
    h = h.sort_values("v").reset_index(drop=True)
    c = h["c"].to_numpy(np.int64)
    ca = h["ca"].to_numpy(np.int64)
    below = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int64)
    r1 = float((ca * (below + (c + 1) / 2.0)).sum())
    n1 = int(ca.sum())
    n2 = int(c.sum()) - n1
    nn = n1 + n2
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    tie = int((c.astype(object) ** 3 - c).sum())
    if n1 and n2 and nn > 1:
        var = (n1 * n2 / 12.0) * (nn + 1.0 - tie / (nn * (nn - 1.0)))
        if var > 0:
            cc = -0.5 if u1 > mu else (0.5 if u1 < mu else 0.0)
            z = (u1 - mu + cc) / math.sqrt(var)
        else:
            z = np.nan
    else:
        z = np.nan
    return pd.DataFrame(
        {
            "n_a": [n1],
            "n_b": [n2],
            "u": [float(_r(u1, 6))],
            "z": [float(_r(z, 6)) if z == z else np.nan],
        }
    )


def q_embedding_two_sample(sf_dir: str, sigma: float = 4.0):
    """Kernel two-sample tests between the label-0 and label-1 embedding
    clusters: RBF-kernel MMD^2 (sigma = 4, biased V-statistic with all
    pairs incl. self) and the energy distance 2*E|X-Y| - E|X-X'| -
    E|Y-Y'| — the distribution-level "did the embedding space drift
    between cohorts" tests that mean-difference checks miss.  Shape:
    both groups broadcast once; each batch computes its pair-distance
    blocks against both and folds six scalar partials."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    sub = emb.filter(lambda r: r["label"] in (0, 1)).materialize()
    rows = sorted(sub.take_all(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows if r["label"] == 0], np.float64)
    Y = np.array([r["embedding"] for r in rows if r["label"] == 1], np.float64)
    ref = ray.put((X, Y))

    def parts(b: pa.Table, _r=ref) -> pa.Table:
        X_, Y_ = ray.get(_r)
        Q = _emb_matrix(b)
        lab = b.column("label").to_numpy().astype(np.int64)
        out = {
            "kxx": 0.0, "kyy": 0.0, "kxy": 0.0,
            "dxx": 0.0, "dyy": 0.0, "dxy": 0.0,
            "nx": 0, "ny": 0,
        }
        for i, (q, l) in enumerate(zip(Q, lab)):
            d2x = ((X_ - q) ** 2).sum(axis=1)
            d2y = ((Y_ - q) ** 2).sum(axis=1)
            kx = float(np.exp(-d2x / (2 * sigma * sigma)).sum())
            ky = float(np.exp(-d2y / (2 * sigma * sigma)).sum())
            dx = float(np.sqrt(d2x).sum())
            dy = float(np.sqrt(d2y).sum())
            if l == 0:
                out["kxx"] += kx
                out["kxy"] += ky
                out["dxx"] += dx
                out["dxy"] += dy
                out["nx"] += 1
            else:
                out["kyy"] += ky
                out["kxy"] += kx
                out["dyy"] += dy
                out["dxy"] += dx
                out["ny"] += 1
        return pa.table({k: pa.array([v], pa.float64() if isinstance(v, float) else pa.int64()) for k, v in out.items()})

    agg = sub.map_batches(parts, batch_format="pyarrow").sum(
        ["kxx", "kyy", "kxy", "dxx", "dyy", "dxy", "nx", "ny"]
    )
    nx, ny = float(agg["sum(nx)"]), float(agg["sum(ny)"])
    mmd2 = (
        float(agg["sum(kxx)"]) / (nx * nx)
        + float(agg["sum(kyy)"]) / (ny * ny)
        - float(agg["sum(kxy)"]) / (nx * ny)  # kxy accumulated from BOTH sides
    )
    energy = (
        float(agg["sum(dxy)"]) / (nx * ny)  # both sides -> 2*E|X-Y| built in
        - float(agg["sum(dxx)"]) / (nx * nx)
        - float(agg["sum(dyy)"]) / (ny * ny)
    )
    return pd.DataFrame(
        {
            "n_x": pd.array([int(nx)], dtype="int64"),
            "n_y": pd.array([int(ny)], dtype="int64"),
            "mmd2": [float(_r(mmd2, 6))],
            "energy_dist": [float(_r(energy, 6))],
        }
    )

__all__ = [
    "q_ann_pq",
    "q_ann_bruteforce",
    "q_embedding_neardup_pairs",
    "q_embedding_norms",
    "q_embedding_knn",
    "q_ann_ivf",
    "q_ann_ivf_exact",
    "q_ann_lsh",
    "q_kmeans_assign",
    "q_kmeans_lloyd",
    "q_kmeans_inertia",
    "q_label_knn_accuracy",
    "q_mutual_knn",
    "q_cosine_pairs",
    "q_mann_kendall",
    "q_mann_whitney",
    "q_embedding_two_sample",
]
