"""WARC (Web ARChive, ISO 28500) record framing and parsing.

The reference's web spiders consume live HTTP responses
(BlockchainSpider/spiders/labels/web.py drives scrapy Responses); at
training-data scale the same pages arrive as WARC files — the
Common-Crawl interchange format — so the engine needs a WARC *source*:
split raw file bytes into records, parse the WARC header block, unwrap
the stored HTTP response and surface (url, date, status, payload) rows.

Framing is length-prefixed: each record's ``Content-Length`` header
gives the exact octet count of its block, so payloads may legally
contain the ``WARC/1.0`` magic — a split-on-magic parser is wrong and
this one never scans payload bytes.  Records are sequential WITHIN a
file by construction; parallelism comes from mapping many files per
batch: ``ray.data.read_binary_files -> map_batches(parse_warc_batch)``,
one task per group of files, which is exactly how Common Crawl shards
(thousands of ~1 GB .warc files) distribute.
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, List, Tuple

import pyarrow as pa

CRLF = b"\r\n"
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)


def build_warc_record(
    url: str,
    date_iso: str,
    payload: bytes,
    status: int = 200,
    content_type: bytes = b"text/html",
) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 response.

    The WARC ``Content-Length`` covers the whole stored HTTP block
    (status line + headers + body), per the spec; the record ends with
    the standard blank-line-twice separator."""
    http_block = (
        b"HTTP/1.1 " + str(status).encode() + b" OK" + CRLF
        + b"Content-Type: " + content_type + CRLF
        + b"Content-Length: " + str(len(payload)).encode() + CRLF
        + CRLF
        + payload
    )
    warc_headers = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Target-URI: " + url.encode() + CRLF
        + b"WARC-Date: " + date_iso.encode() + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + b"Content-Length: " + str(len(http_block)).encode() + CRLF
        + CRLF
    )
    return warc_headers + http_block + CRLF + CRLF


def _parse_headers(block: bytes) -> Dict[str, str]:
    headers: Dict[str, str] = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes) -> Iterator[Tuple[Dict[str, str], bytes]]:
    """Yield ``(warc_headers, http_block)`` per record.  Length-prefix
    framing only; a truncated trailing record is dropped rather than
    raised (the standard salvage behaviour for interrupted captures)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return  # garbage tail
        hdr_end = data.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            return
        headers = _parse_headers(data[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + 4
        if body_start + clen > n:
            return  # truncated trailing record
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def parse_http_response(block: bytes) -> Tuple[int, Dict[str, str], bytes]:
    """Split a stored HTTP/1.1 response block into (status, headers, body)."""
    hdr_end = block.find(CRLF + CRLF)
    if hdr_end < 0:
        return 0, {}, b""
    head = block[:hdr_end]
    status_line = head.split(CRLF, 1)[0]
    parts = status_line.split(b" ")
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    return status, _parse_headers(head), block[hdr_end + 4 :]


def parse_warc_batch(batch: pa.Table) -> pa.Table:
    """``read_binary_files(include_paths=True)`` batch -> one row per
    stored HTTP response: url, warc_date, status, content_length (body
    octets), title (from the HTML payload — proves the body bytes
    round-trip, not just the headers)."""
    urls: List[str] = []
    dates: List[str] = []
    statuses: List[int] = []
    lens: List[int] = []
    titles: List[str] = []
    for data in batch.column("bytes").to_pylist():
        for headers, block in iter_warc_records(data):
            if headers.get("warc-type") != "response":
                continue
            status, _http_headers, body = parse_http_response(block)
            m = _TITLE_RE.search(body)
            urls.append(headers.get("warc-target-uri", ""))
            dates.append(headers.get("warc-date", ""))
            statuses.append(status)
            lens.append(len(body))
            titles.append(m.group(1).decode("utf-8", "replace") if m else "")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_date": pa.array(dates, pa.string()),
            "status": pa.array(statuses, pa.int64()),
            "content_length": pa.array(lens, pa.int64()),
            "title": pa.array(titles, pa.string()),
        }
    )
