"""URL canonicalization, host extraction, and 64-bit URL keying.

The reference's only URL normalizer is the ipfs:// gateway rewrite + regex
validation (reference middlewares/trans/metadata.py:87-92) and its link
follower does ``urljoin`` + an http-scheme filter (reference
spiders/labels/web.py:76-79).  Our engine needs a full canonicalizer so the
URL-seen set treats equivalent URLs as one; the rules below are the usual
crawl-engine set (lowercase scheme/host, strip fragment, drop default port,
empty path -> '/', stable query-param sort).

``url_hash64`` is the engine-wide routing key: it shards the cuckoo seen
filter, partitions the page store, and salts hot hosts.  It is computed
vectorized via polars' xxhash-based ``Series.hash`` (seed pinned to 0 so a
checkpointed run resumes with identical routing on the same library
version); a pure-python blake2b fallback keeps the key deterministic when
polars is unavailable.
"""

from __future__ import annotations

import hashlib
import re
import urllib.parse
from typing import Iterable, List, Optional, Sequence

import numpy as np

try:  # vectorized path
    import polars as pl
except ImportError:  # pragma: no cover
    pl = None

_DEFAULT_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443}
_RE_HTTP_SCHEME = re.compile(r"^https?$", re.IGNORECASE)

HASH_SEED = 0


# Fast path: absolute http(s) url, lowercase host, no port/query/fragment/
# userinfo, non-empty path -> already canonical (16us urlsplit round-trip
# skipped; parity with the slow path pinned in tests/test_urls.py)
_RE_ALREADY_CANONICAL = re.compile(r"^https?://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?(/[^?#\s]*)?$")


def canonicalize_url(url: str, base: Optional[str] = None) -> Optional[str]:
    """Return the canonical form of ``url`` (resolved against ``base`` when
    relative), or None when the result is not an http(s) URL.

    Rules: resolve relative refs; lowercase scheme + host; strip fragment;
    drop default port; empty path -> '/'; sort query parameters
    (stable sort, duplicates preserved in order).
    """
    if url is None:
        return None
    url = url.strip()
    # urljoin(base, absolute-url) is the identity, so the fast path applies
    # with or without a base
    m = _RE_ALREADY_CANONICAL.match(url)
    if m:
        return url if m.group(1) else url + "/"
    if base:
        url = urllib.parse.urljoin(base, url)
    try:
        parts = urllib.parse.urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not _RE_HTTP_SCHEME.match(scheme):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = parts.query
    if query:
        pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
        pairs.sort(key=lambda kv: kv[0])
        query = urllib.parse.urlencode(pairs)
    return urllib.parse.urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_batch(urls: Iterable[Optional[str]], base: Optional[str] = None) -> List[Optional[str]]:
    return [canonicalize_url(u, base) for u in urls]


def host_of(url: str) -> str:
    """Lowercased host of a (canonical) URL; '' when unparseable."""
    try:
        return (urllib.parse.urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def hosts_of_batch(urls: Sequence[str]) -> List[str]:
    return hosts_of_array(urls)


# scheme://host[:port] with a plain (non-IPv6, userinfo-free) host — the
# shape every canonical URL in the engine hot path has
_HOST_FAST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([A-Za-z0-9.\-_]+)(?::\d+)?(?:[/?#]|$)"


def hosts_of_array(urls: Sequence[str]) -> List[str]:
    """Vectorized :func:`host_of` for the engine's tabular round path.

    polars regex extraction covers canonical URLs (the hot path); rows it
    can't parse (userinfo, IPv6 literal, relative) fall back to the
    urlsplit-based scalar, so the result is element-wise identical to
    ``[host_of(u) for u in urls]`` (pinned by tests/test_urls.py).
    """
    if pl is not None and isinstance(urls, pl.Series):
        s = urls
    elif pl is None or len(urls) < 256:
        return [host_of(u) for u in urls]
    else:
        s = pl.Series("u", list(urls), dtype=pl.String)
    out = s.str.extract(_HOST_FAST_RE, 1).str.to_lowercase()
    if out.null_count():
        vals = out.to_list()
        for i, v in enumerate(vals):
            if v is None:
                vals[i] = host_of(urls[i])
        return vals
    return out.to_list()


def _blake2b64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def url_hash64(urls: Sequence[Optional[str]]) -> np.ndarray:
    """Vectorized 64-bit key for a batch of canonical URLs -> uint64 array.

    Accepts a polars Series directly (no list round-trip — the engine's
    round loop holds its frontier as polars columns)."""
    if pl is not None:
        s = (
            urls
            if isinstance(urls, pl.Series)
            else pl.Series("u", list(urls), dtype=pl.String)
        )
        return s.fill_null("").hash(seed=HASH_SEED).to_numpy().astype(np.uint64)
    return np.array([_blake2b64(u or "") for u in urls], dtype=np.uint64)
