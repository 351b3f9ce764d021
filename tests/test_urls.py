import numpy as np

from blockchainspider_ray.functions.urls import (
    canonicalize_url,
    host_of,
    url_hash64,
)


def test_canonicalize_basics():
    assert canonicalize_url("HTTP://Host0.Example/p/1") == "http://host0.example/p/1"
    assert canonicalize_url("http://host0.example:80/p/1") == "http://host0.example/p/1"
    assert canonicalize_url("https://host0.example:443/x") == "https://host0.example/x"
    assert canonicalize_url("http://host0.example:8080/x") == "http://host0.example:8080/x"
    assert canonicalize_url("http://host0.example/p/1#frag") == "http://host0.example/p/1"
    assert canonicalize_url("http://h.example") == "http://h.example/"
    assert canonicalize_url("http://h.example/p?z=1&a=2") == "http://h.example/p?a=2&z=1"


def test_canonicalize_relative_and_schemes():
    base = "http://host0.example/p/1"
    assert canonicalize_url("/p/2", base=base) == "http://host0.example/p/2"
    assert canonicalize_url("q/3", base=base) == "http://host0.example/p/q/3"
    assert canonicalize_url("mailto:x@y.z", base=base) is None
    assert canonicalize_url("ftp://h/x") is None
    assert canonicalize_url(None) is None


def test_equivalent_urls_same_hash():
    variants = [
        "http://HOST0.example/p/5",
        "http://host0.example:80/p/5",
        "http://host0.example/p/5#frag",
    ]
    canon = [canonicalize_url(v) for v in variants]
    assert len(set(canon)) == 1
    h = url_hash64(canon)
    assert h.dtype == np.uint64
    assert len(set(h.tolist())) == 1


def test_hash_deterministic_across_calls():
    a = url_hash64(["http://a.example/", "http://b.example/"])
    b = url_hash64(["http://a.example/", "http://b.example/"])
    assert (a == b).all()
    assert a[0] != a[1]


def test_host_of():
    assert host_of("http://Host3.Example:8080/p?x=1") == "host3.example"
    assert host_of("not a url") == ""


def test_fast_path_matches_slow_path():
    """The already-canonical fast path must agree with the full urlsplit
    path for every spelling (absolute/relative/ports/fragments/userinfo)."""
    import re

    from blockchainspider_ray.functions import urls as U

    cases = [
        "http://a.example/x", "https://b.example", "http://a.example/x?b=2&a=1",
        "HTTP://A.example/x", "http://a.example:80/x", "http://a.example/x#f",
        "/rel/x", "mailto:x@y", "http://a-b.example/p/q%20r", "http://a.example/",
        "http://user:pw@h.example/x", "ftp://a/b", "http://a.example//double//slash",
        "http://a.example:8080/x", "https://a.example:443/x", "  http://a.example/x ",
    ]

    def slow(u, base=None):
        save = U._RE_ALREADY_CANONICAL
        U._RE_ALREADY_CANONICAL = re.compile(r"$^")  # disable fast path
        try:
            return U.canonicalize_url(u, base)
        finally:
            U._RE_ALREADY_CANONICAL = save

    for u in cases:
        assert U.canonicalize_url(u) == slow(u), u
        assert U.canonicalize_url(u, base="http://base.example/d/") == slow(
            u, "http://base.example/d/"
        ), u
