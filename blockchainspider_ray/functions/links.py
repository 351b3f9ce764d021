"""Link extraction from HTML.

Mirrors the reference link follower (reference spiders/labels/web.py:68-92):
it collects ``//a/@href`` and ``//script/@src``, resolves each against the
page URL with ``urljoin``, and keeps only http(s) schemes.  lxml is not
available in this environment, so extraction is compiled-regex based; the
patterns are RE2-compatible so the DuckDB oracle (regexp_extract_all) can
reproduce them exactly.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .urls import canonicalize_url

# RE2-compatible (no lookaround/backrefs) — also used in oracle SQL.
HREF_PATTERN = r'<a\s[^>]*?href="([^"]*)"'
SRC_PATTERN = r'<script\s[^>]*?src="([^"]*)"'
ANCHOR_PATTERN = r'<a\s[^>]*?href="[^"]*"[^>]*>([^<]*)</a>'

_RE_HREF = re.compile(HREF_PATTERN, re.IGNORECASE)
_RE_SRC = re.compile(SRC_PATTERN, re.IGNORECASE)
_RE_ANCHOR = re.compile(ANCHOR_PATTERN, re.IGNORECASE)


def extract_hrefs(html: str) -> List[str]:
    """All raw ``<a href>`` values, in document order."""
    return _RE_HREF.findall(html)


def extract_script_srcs(html: str) -> List[str]:
    return _RE_SRC.findall(html)


def extract_links(
    html: str,
    page_url: str,
    include_scripts: bool = True,
) -> List[Tuple[str, str]]:
    """(canonical_dst_url, kind) pairs for a page, resolved + scheme-filtered
    the way the reference does (urljoin + http* filter, web.py:76-92).
    Non-http(s) results are dropped. Duplicates preserved (dedup is the
    URL-seen stage's job)."""
    out: List[Tuple[str, str]] = []
    for href in extract_hrefs(html):
        c = canonicalize_url(href, base=page_url)
        if c is not None:
            out.append((c, "a"))
    if include_scripts:
        for src in extract_script_srcs(html):
            c = canonicalize_url(src, base=page_url)
            if c is not None:
                out.append((c, "script"))
    return out


def decode_html(h) -> str:
    if h is None:
        return ""
    if isinstance(h, (bytes, bytearray, memoryview)):
        return bytes(h).decode("utf-8", errors="replace")
    return h
