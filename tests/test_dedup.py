import numpy as np
import pyarrow as pa

from blockchainspider_ray.stages.dedup import (
    MinHashBands,
    MinHasher,
    SimHasher,
    candidate_pairs_from_bands,
    hamming64,
    jaccard_tokens,
    shingles_of,
)


def test_shingles():
    assert shingles_of("a b c d", 3) == ["a b c", "b c d"]
    assert shingles_of("a b", 3) == ["a b"]
    assert shingles_of("", 3) == []


def test_minhash_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    c = "completely different words entirely unrelated content here now ok fine"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.5
    assert sim_ac < 0.2
    # identical text -> identical signature (determinism)
    assert (mh.signature(a) == sa).all()


def test_minhash_deterministic_across_instances():
    s1 = MinHasher(num_perm=64).signature("hello world foo bar baz")
    s2 = MinHasher(num_perm=64).signature("hello world foo bar baz")
    assert (s1 == s2).all()


def test_lsh_finds_exact_dups():
    mh = MinHasher(num_perm=64)
    texts = [f"doc number {i} with shared vocabulary tokens alpha beta gamma" for i in range(10)]
    # docs 3 and 7 duplicated as ids 103, 107
    ids = list(range(10)) + [103, 107]
    all_texts = texts + [texts[3], texts[7]]
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": all_texts})
    sigs = mh(batch)
    bands = MinHashBands(num_perm=64, bands=16)(sigs)
    pairs = candidate_pairs_from_bands(bands)
    got = set(zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()))
    assert (3, 103) in got
    assert (7, 107) in got


def test_simhash_near_and_far():
    sh = SimHasher()
    a = sh.simhash64("the quick brown fox jumps over the lazy dog many times daily")
    b = sh.simhash64("the quick brown fox jumps over the lazy dog many times weekly")
    c = sh.simhash64("zzz completely different qqq unrelated www content eee")
    assert hamming64(a, b) < hamming64(a, c)
    assert hamming64(a, a) == 0


def test_jaccard_tokens():
    assert jaccard_tokens("a b c", "a b c") == 1.0
    assert jaccard_tokens("a b", "c d") == 0.0
    assert jaccard_tokens("a b c", "b c d") == 0.5


def test_bucket_cap_segments_degenerate_bucket():
    """A 10k-member degenerate bucket must emit O(n*cap) pairs, not O(n^2),
    while staying ONE connected component (round-2 VERDICT item #5)."""
    from blockchainspider_ray.stages.dedup import emit_bucket_pairs

    n, cap = 10_000, 512
    pairs = emit_bucket_pairs(list(range(n)), cap=cap)
    n_segs = (n + cap - 1) // cap
    # per-segment full pairs + (n_segs - 1) chain links; far below n^2/2
    assert len(pairs) < n * cap
    assert len(pairs) == sum(
        len(range(i, min(i + cap, n))) * (len(range(i, min(i + cap, n))) - 1) // 2
        for i in range(0, n, cap)
    ) + (n_segs - 1)
    # union-find: the chained representatives keep the bucket connected
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n)}) == 1


def test_bucket_cap_small_buckets_unchanged():
    from blockchainspider_ray.stages.dedup import emit_bucket_pairs

    ids = [5, 1, 9]
    assert emit_bucket_pairs(ids, cap=512) == [(1, 5), (1, 9), (5, 9)]


def test_connected_components_labels_min_of_component(ray_session):
    """Chain + separate pair + high-diameter path: every node labelled with
    its component's min id; singleton-free (only paired nodes appear)."""
    import ray.data as rd

    from blockchainspider_ray.stages.dedup import connected_components

    edges = rd.from_arrow(
        pa.table(
            {
                # component {1,2,3,4} as a path (diameter 3), component
                # {10,11}, component {20,21,22} as a triangle
                "doc_a": pa.array([1, 2, 3, 10, 20, 20, 21], pa.int64()),
                "doc_b": pa.array([2, 3, 4, 11, 21, 22, 22], pa.int64()),
            }
        )
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges).take_all()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_incremental_lsh_index_cross_half_pairs(ray_session):
    """LSHIndexShard/Writer/Prober: probes see exactly the indexed base —
    an injected base/new near-dup pair must surface, new-vs-new must not."""
    import ray
    import ray.data as rd

    from blockchainspider_ray.stages.dedup import (
        LSHIndexProber,
        LSHIndexShard,
        LSHIndexWriter,
        MinHashBands,
        MinHasher,
    )

    text = "the quick brown fox jumps over the lazy dog again and again " * 5
    base = pa.table({"doc_id": pa.array([0, 2], pa.int64()),
                     "text": [text, "completely different content here entirely " * 8]})
    # doc 1 duplicates doc 0 (cross-half dup); docs 3,5 duplicate each other
    # (new-vs-new: must NOT pair — neither is indexed)
    new = pa.table({"doc_id": pa.array([1, 3, 5], pa.int64()),
                    "text": [text, "novel page body " * 10, "novel page body " * 10]})

    def bands_of(tbl):
        return (
            rd.from_arrow(tbl)
            .map_batches(MinHasher(), batch_format="pyarrow")
            .map_batches(MinHashBands(), batch_format="pyarrow")
        )

    shards = [LSHIndexShard.remote() for _ in range(2)]
    try:
        bands_of(base).map_batches(LSHIndexWriter(shards), batch_format="pyarrow").count()
        pairs = (
            bands_of(new)
            .map_batches(LSHIndexProber(shards), batch_format="pyarrow")
            .to_pandas()
            .drop_duplicates()
        )
        got = set(map(tuple, pairs.values.tolist()))
        assert (1, 0) in got
        assert all(b in (0, 2) for _, b in got)  # only base docs on the right
    finally:
        for s in shards:
            ray.kill(s)


def test_incremental_lsh_index_bucket_cap():
    """Over-cap inserts are dropped (counted in stats), probes still match
    the retained representatives."""
    import ray

    from blockchainspider_ray.stages.dedup import LSHIndexShard

    s = LSHIndexShard.remote(cap=3)
    try:
        keys = [(0, 7)] * 5
        ray.get(s.insert.remote(keys, [10, 11, 12, 13, 14]))
        st = ray.get(s.stats.remote())
        assert st == {"buckets": 1, "dropped": 2}
        qa, qb = ray.get(s.query.remote([(0, 7)], [99]))
        assert qa == [99, 99, 99] and qb == [10, 11, 12]
    finally:
        ray.kill(s)
