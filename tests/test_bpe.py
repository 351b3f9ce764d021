from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _ref_bpe(texts, k):
    """Pure-Python reference: classic BPE merge learning (Sennrich et al.
    2016, no end-of-word marker), tie-break (count desc, left, right)."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    vocab = {tuple(w): f for w, f in vocab.items()}
    merges = []
    for _ in range(k):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, n))
        new = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges


def _ref_encode(word, merges):
    ranks = {(l, r): i for i, (l, r, _n) in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        cand = [(ranks[(a, b)], i) for i, (a, b) in enumerate(zip(syms, syms[1:])) if (a, b) in ranks]
        if not cand:
            break
        _, i = min(cand)
        l, r = syms[i], syms[i + 1]
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                out.append(l + r)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def _texts():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_train_bpe_matches_reference(ray_session):
    import ray.data as rd

    from blockchainspider_ray.stages.bpe import train_bpe

    tbl = _texts()
    got = train_bpe(rd.from_arrow(tbl), k=12)
    want = _ref_bpe(tbl.column("text").to_pylist(), 12)
    assert got == want
    # merges must be non-trivial on this corpus and counts non-increasing
    assert len(got) == 12
    # multi-char symbols appear once early merges compose
    assert any(len(l) > 1 or len(r) > 1 for l, r, _ in got)


def test_encode_stage_matches_reference_encoding(ray_session):
    from blockchainspider_ray.pipelines.queries import q_bpe_encode

    tbl = _texts()
    merges = _ref_bpe(tbl.column("text").to_pylist(), 12)
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in q_bpe_encode(SF, k=12).take_all()}
    for d, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        want = sum(len(_ref_encode(w, merges)) for w in t.split(" ") if w)
        assert got[d] == want, d
    # BPE must compress: fewer tokens than characters
    total_chars = sum(len(t.replace(" ", "")) for t in tbl.column("text").to_pylist())
    assert sum(got.values()) < total_chars


def test_pair_counts_first_iteration_equals_reference(ray_session):
    from blockchainspider_ray.pipelines.queries import q_bpe_pair_counts

    tbl = _texts()
    want = Counter()
    for t in tbl.column("text").to_pylist():
        for w in t.split(" "):
            for a, b in zip(w, w[1:]):
                want[a + b] += 1
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [(r["pair"], r["n"]) for r in q_bpe_pair_counts(SF).take_all()]
    assert got == top
