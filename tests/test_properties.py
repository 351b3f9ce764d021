"""Property-based tests (SURVEY.md §5#4): rank-mass conservation, dedup
idempotence, politeness budget invariants, canonicalizer idempotence,
cuckoo no-false-negatives — over generated inputs, not fixtures."""

import string

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# -- url canonicalizer -------------------------------------------------------

_url_path = st.text(
    alphabet=string.ascii_letters + string.digits + "/._-~%", max_size=30
)
_host = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9\-]{0,10}(\.[a-zA-Z0-9]{1,8}){1,2}", fullmatch=True)
_query = st.lists(
    st.tuples(st.text(string.ascii_lowercase, min_size=1, max_size=4),
              st.text(string.ascii_lowercase + string.digits, max_size=4)),
    max_size=4,
)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=_host,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_url_path,
    query=_query,
    frag=st.text(string.ascii_lowercase, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(scheme, host, port, path, query, frag):
    from blockchainspider_ray.functions.urls import canonicalize_url

    q = "&".join(f"{k}={v}" for k, v in query)
    url = f"{scheme}://{host}{port}/{path}"
    if q:
        url += f"?{q}"
    if frag:
        url += f"#{frag}"
    c = canonicalize_url(url)
    if c is None:
        return
    # canonical form is a fixed point and never carries a fragment
    assert canonicalize_url(c) == c
    assert "#" not in c


# -- politeness admission ----------------------------------------------------

@given(
    items=st.lists(
        st.tuples(st.integers(0, 5), st.floats(0, 100, allow_nan=False)), max_size=60
    ),
    budget=st.integers(1, 5),
)
@settings(max_examples=100, deadline=None)
def test_politeness_budget_invariants(items, budget):
    from blockchainspider_ray.stages.politeness import Candidate, admit_per_host

    cands = [
        Candidate(url=f"http://h{h}.example/{i}", host=f"h{h}", priority=p, arrival=i)
        for i, (h, p) in enumerate(items)
    ]
    admitted, deferred = admit_per_host(cands, budget)
    # partition: nothing lost, nothing duplicated
    assert len(admitted) + len(deferred) == len(cands)
    assert {c.url for c in admitted} | {c.url for c in deferred} == {c.url for c in cands}
    # budget never exceeded per host
    per_host = {}
    for c in admitted:
        per_host[c.host] = per_host.get(c.host, 0) + 1
    assert all(n <= budget for n in per_host.values())
    # no deferred candidate outranks an admitted one of the same host
    for d in deferred:
        same = [a for a in admitted if a.host == d.host]
        assert len(same) == budget  # host was full
        assert all(
            (a.priority, -a.arrival) >= (d.priority, -d.arrival) for a in same
        )


# -- cuckoo filter -----------------------------------------------------------

@given(keys=st.lists(st.integers(0, 2**63 - 1), max_size=300, unique=True))
@settings(max_examples=50, deadline=None)
def test_cuckoo_no_false_negatives_and_stable_snapshot(keys):
    from blockchainspider_ray.state.cuckoo import CuckooFilter

    f = CuckooFilter(capacity=4096)
    arr = np.array(keys, dtype=np.uint64)
    f.contains_and_insert(arr)
    if len(arr):
        # membership: an inserted key is never reported absent
        assert f.contains_batch(arr).all()
    # deterministic, restorable snapshot
    blob = f.to_bytes()
    g = CuckooFilter.from_bytes(blob)
    assert g.to_bytes() == blob
    if len(arr):
        assert g.contains_batch(arr).all()


# -- APPR mass conservation --------------------------------------------------

@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=40
    ),
    pops=st.integers(1, 25),
)
@settings(max_examples=60, deadline=None)
def test_appr_mass_conservation(edges, pops):
    from blockchainspider_ray.strategies.appr import APPR

    adj = {}
    for s, d in edges:
        adj.setdefault(f"n{s}", []).append(
            {"from": f"n{s}", "to": f"n{d}", "value": 1.0, "timeStamp": 0,
             "symbol": "", "hash": f"{s}-{d}"}
        )
    strat = APPR(source="n0", alpha=0.15, epsilon=1e-6)
    for _ in range(pops):
        node, _ctx = strat.pop()
        if node is None:
            break
        strat.push(node, adj.get(node, []))
    total = sum(strat.p.values()) + sum(strat.r.values())
    # p + r never exceeds the unit source mass (push only moves/credits it;
    # dead-end pushes may destroy mass, never create it)
    assert total <= 1.0 + 1e-9


# -- dedup idempotence -------------------------------------------------------

@given(text=st.text(max_size=300))
@settings(max_examples=60, deadline=None)
def test_minhash_simhash_deterministic(text):
    from blockchainspider_ray.stages.dedup import MinHasher, SimHasher

    mh = MinHasher(num_perm=32)
    assert (mh.signature(text) == MinHasher(num_perm=32).signature(text)).all()
    assert SimHasher().simhash64(text) == SimHasher().simhash64(text)


@given(
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(1, 40)).map(
            lambda p: (p[0], p[0] + p[1])
        ),
        min_size=1,
        max_size=30,
    )
)
def test_merge_intervals_properties(spans):
    from blockchainspider_ray.functions.etl import merge_intervals

    merged = merge_intervals(spans)
    # sorted, disjoint with real gaps, each interval non-empty
    for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
        assert e1 < s2
    assert all(s < e for s, e in merged)
    # coverage is exactly the union of the inputs (brute-force point set)
    pts = set()
    for s, e in spans:
        pts.update(range(s, e))
    mpts = set()
    for s, e in merged:
        mpts.update(range(s, e))
    assert mpts == pts
