"""Dedup query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



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


def q_fuzzy_dedup_clusters(sf_dir: str, sim_threshold: float = 0.8):
    """End-to-end FUZZY dedup: fingerprint blocking → bounded edit-distance
    verification (levenshtein_verify) → similarity cut → distributed
    connected components → cluster labels.  The entity-resolution shape:
    cheap blocking proposes, exact verification confirms, transitive
    closure groups — three stages that each move only candidate-pair-sized
    data, never the corpus.  The SQL mirror nests the verification oracle
    verbatim and runs the same min-label closure as a recursive CTE."""
    from ..stages.dedup import connected_components

    from .q_stats import q_levenshtein_verify  # explicit cross-family dep
    pairs = q_levenshtein_verify(sf_dir)

    def cut(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column("sim"), pa.scalar(sim_threshold))
        return b.filter(keep).select(["doc_a", "doc_b"])

    edges = pairs.map_batches(cut, batch_format="pyarrow")
    return connected_components(edges).sort("doc_id")


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

__all__ = [
    "q_dedup_exact",
    "q_dup_span_fraction",
    "q_doc_fingerprint",
    "q_jaccard_pairs",
    "q_minhash_signatures",
    "q_minhash_dedup_pairs",
    "q_minhash_incremental",
    "q_dedup_clusters",
    "q_dedup_survivors",
    "q_simhash",
    "q_simhash_pairs",
    "q_rolling_fingerprints",
    "q_dedup_spans_remove",
    "q_semdedup",
    "q_minhash_estimate_error",
    "q_fuzzy_dedup_clusters",
    "q_softdedup_weights",
    "q_lsh_bucket_histogram",
    "q_lsh_recall_curve",
    "q_line_dedup",
]
