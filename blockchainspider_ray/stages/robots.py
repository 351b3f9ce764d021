"""robots.txt handling, resolved from the page store itself.

The reference ships with ``ROBOTSTXT_OBEY = False`` (reference
BlockchainSpider/settings.py:20); our engine mirrors that default but
implements the obey path: a host's rules come from the page-store row for
``http://<host>/robots.txt`` (the snapshot *is* the web), are compiled once
per host, and cached for the whole crawl.

Only ``User-agent: *`` groups with Disallow/Allow prefix rules are honored
(longest-prefix-wins, Allow beats Disallow on equal length — the common
subset of the RFC 9309 semantics).  ``Crawl-delay`` in the ``*`` group is
parsed too and feeds the per-host politeness budget (the BSP analogue of
the reference's ``1/(n*qps)`` AsyncItemBucket interval, utils/bucket.py).
"""

from __future__ import annotations

import urllib.parse
from typing import Dict, List, Optional, Tuple


def parse_robots(text: str) -> List[Tuple[str, bool]]:
    """robots.txt -> [(path_prefix, allow?)] for the ``*`` user-agent."""
    rules: List[Tuple[str, bool]] = []
    applies = False
    seen_any_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
            seen_any_ua = True
        elif key in ("disallow", "allow") and (applies or not seen_any_ua):
            if val == "" and key == "disallow":
                continue  # empty Disallow == allow all
            rules.append((val, key == "allow"))
    return rules


def is_allowed(path: str, rules: List[Tuple[str, bool]]) -> bool:
    best_len, allowed = -1, True
    for prefix, allow in rules:
        if path.startswith(prefix):
            n = len(prefix)
            if n > best_len or (n == best_len and allow):
                best_len, allowed = n, allow
    return allowed


def parse_crawl_delay(text: str) -> Optional[float]:
    """``Crawl-delay`` seconds for the ``*`` user-agent, or None."""
    applies = False
    seen_any_ua = False
    delay: Optional[float] = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
            seen_any_ua = True
        elif key == "crawl-delay" and (applies or not seen_any_ua):
            try:
                d = float(val)
            except ValueError:
                continue
            if d > 0:
                delay = d
    return delay


class RobotsCache:
    """Per-host compiled robots rules, backed by the page store.

    At cluster scale this lives inside each politeness actor (the groupby-
    host shuffle guarantees a host's URLs meet the same actor, so each
    host's rules are fetched and compiled exactly once per actor)."""

    def __init__(self, page_store=None, obey: bool = False):
        self.page_store = page_store
        self.obey = obey
        self._rules: Dict[str, List[Tuple[str, bool]]] = {}
        self._delays: Dict[str, Optional[float]] = {}

    def _load(self, host: str) -> List[Tuple[str, bool]]:
        if host in self._rules:
            return self._rules[host]
        rules: List[Tuple[str, bool]] = []
        delay: Optional[float] = None
        if self.page_store is not None:
            robots_url = f"http://{host}/robots.txt"
            t = self.page_store.lookup_table([robots_url], columns=["url", "html"])
            if t.num_rows:
                body = t.column("html")[0].as_py()
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", errors="replace")
                rules = parse_robots(body or "")
                delay = parse_crawl_delay(body or "")
        self._rules[host] = rules
        self._delays[host] = delay
        return rules

    def crawl_delay(self, host: str) -> Optional[float]:
        """Crawl-delay seconds for ``host`` (None when unset / not obeying)."""
        if not self.obey:
            return None
        self._load(host)
        return self._delays.get(host)

    def allowed(self, url: str) -> bool:
        if not self.obey:
            return True
        parts = urllib.parse.urlsplit(url)
        host = (parts.hostname or "").lower()
        path = parts.path or "/"
        if path == "/robots.txt":
            return True
        return is_allowed(path, self._load(host))
