"""HTML → text extraction and entity extraction.

The text extractor reproduces, byte-for-byte, the reference's 3-regex
pipeline (reference spiders/labels/web.py:47-50):

    content = re.sub(r'<style[\\s\\S]*?</style>', ' ', response.text)
    content = re.sub(r'<script[\\s\\S]*?</script>', ' ', content)
    content = re.sub('<(.*?)>', ' ', content)

This byte-identity is the per-row invariant demanded by the driver's
``input_hint``.  Entity extractors mirror reference
spiders/labels/web.py:94-114 (BTC/ETH address + tx-hash regexes) minus the
external checksum libraries (``bitcoin``/``web3`` are not available here;
the regex-level semantics are kept and checksum hooks are pluggable).
"""

from __future__ import annotations

import re
from typing import List

# Compiled once at import; reused by every batch on every worker.
_RE_STYLE = re.compile(r"<style[\s\S]*?</style>")
_RE_SCRIPT = re.compile(r"<script[\s\S]*?</script>")
_RE_TAG = re.compile("<(.*?)>")

# Entity regexes (reference spiders/labels/web.py:95,101,106,112).
RE_BTC_ADDRESS = re.compile(r"\W([13][a-km-zA-HJ-NP-Z1-9]{25,34})")
RE_TX_HASH_64HEX = re.compile(r"\W([0-9a-f]{64})", re.IGNORECASE | re.ASCII)
RE_ETH_ADDRESS = re.compile(r"\W(0x[0-9a-f]{40})", re.IGNORECASE | re.ASCII)
RE_ETH_TX_HASH = re.compile(r"\W(0x[0-9a-f]{64})", re.IGNORECASE | re.ASCII)


def extract_text(html: str) -> str:
    """Strip <style>, <script>, then every remaining tag; each replaced by
    one space.  Byte-identical to reference spiders/labels/web.py:47-50."""
    content = _RE_STYLE.sub(" ", html)
    content = _RE_SCRIPT.sub(" ", content)
    content = _RE_TAG.sub(" ", content)
    return content


def extract_text_arrow(htmls):
    """Vectorized form of :func:`extract_text` over an Arrow string array —
    the same 3 regex passes as RE2 kernels (C, GIL-free).  Byte-parity with
    the Python path is pinned by tests/test_text.py."""
    import pyarrow.compute as pc

    out = pc.replace_substring_regex(htmls, pattern=r"<style[\s\S]*?</style>", replacement=" ")
    out = pc.replace_substring_regex(out, pattern=r"<script[\s\S]*?</script>", replacement=" ")
    return pc.replace_substring_regex(out, pattern="<(.*?)>", replacement=" ")


def count_pattern_arrow(texts, pattern: str):
    """Vectorized per-row regex match count (RE2) -> int64 array."""
    import pyarrow.compute as pc

    return pc.count_substring_regex(texts, pattern=pattern)


def extract_text_batch(htmls) -> List[str]:
    """Apply :func:`extract_text` to a sequence of html strings/bytes."""
    out = []
    for h in htmls:
        if h is None:
            out.append("")
            continue
        if isinstance(h, (bytes, bytearray, memoryview)):
            h = bytes(h).decode("utf-8", errors="replace")
        out.append(extract_text(h))
    return out


def find_eth_addresses(text: str) -> List[str]:
    return RE_ETH_ADDRESS.findall(text)


def find_eth_tx_hashes(text: str) -> List[str]:
    return RE_ETH_TX_HASH.findall(text)


def find_btc_addresses(text: str) -> List[str]:
    """Regex-level BTC address candidates (checksum validation pluggable)."""
    return RE_BTC_ADDRESS.findall(text)


def find_tx_hashes(text: str) -> List[str]:
    return RE_TX_HASH_64HEX.findall(text)
