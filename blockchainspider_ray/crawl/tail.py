"""Unbounded tail ("listen") mode — cursor-follow of a growing chain head.

The reference's EVM block spider, given no ``end_block``, polls
eth_blockNumber forever and fetches every block between its cursor and the
current head, then re-arms the poll (reference spiders/trans/evm/
blocks.py:140-189).  Semantics replicated:

- ``start_block=-1`` starts at the CURRENT head (the reference's "query
  the latest block" patch, blocks.py:160-163);
- each poll advances the cursor to ``head + 1`` and fetches exactly the
  gap ``[cursor, head]`` — every block processed exactly once, in order;
- a ``None`` head (provider unavailable) skips the round and re-polls
  (the reference's error log + retry).

Ray-Data-first: the per-gap fetch is whatever Dataset pipeline the caller
supplies (``fetch_fn(start, end) -> Dataset | Table``) — typically
``ray.data.range(...)`` -> synthesize/read payloads -> ``map_batches``
parse — so a large catch-up gap streams with backpressure instead of
driver-looping block by block.  The follower itself only holds the
cursor, which is also what makes it checkpointable: persist ``cursor``
and a killed listener resumes from the exact next block.

The reference loop is endless; ``run(max_polls=..., stop_when_idle=...)``
bounds it for tests and batch catch-up jobs — pass neither to listen
forever.
"""

from __future__ import annotations

import time
from typing import Any, Callable, List, Optional

import pyarrow as pa


class BlockTailFollower:
    def __init__(
        self,
        head_fn: Callable[[], Optional[int]],
        fetch_fn: Callable[[int, int], Any],
        start_block: int = -1,
        poll_interval: float = 0.0,
        on_round: Optional[Callable[[int, int, Any], None]] = None,
    ):
        self.head_fn = head_fn
        self.fetch_fn = fetch_fn
        self.start_block = start_block
        self.cursor = start_block
        self.poll_interval = poll_interval
        self.on_round = on_round
        self.rounds: List[dict] = []

    def run(
        self, max_polls: Optional[int] = None, stop_when_idle: Optional[int] = None
    ) -> dict:
        polls = 0
        idle = 0
        blocks_fetched = 0
        while max_polls is None or polls < max_polls:
            head = self.head_fn()
            if head is not None:
                if self.start_block == -1 and self.cursor == -1:
                    # latest-block patch: first poll pins the cursor to head
                    self.start_block = head
                    self.cursor = head
                end = head + 1
                start, self.cursor = self.cursor, max(self.cursor, end)
                if end - start > 0:
                    result = self.fetch_fn(start, end)
                    blocks_fetched += end - start
                    self.rounds.append({"start": start, "end": end})
                    if self.on_round is not None:
                        self.on_round(start, end, result)
                    idle = 0
                else:
                    idle += 1
            else:
                idle += 1  # provider unavailable: re-poll (reference retry)
            polls += 1
            if stop_when_idle is not None and idle >= stop_when_idle:
                break
            if self.poll_interval:
                time.sleep(self.poll_interval)
        return {
            "polls": polls,
            "blocks_fetched": blocks_fetched,
            "cursor": self.cursor,
            "rounds": list(self.rounds),
        }


def follow_blocks_dataset(
    payload_of_block: Callable[[int], str],
    parse_stage: Callable[[pa.Table], pa.Table],
) -> Callable[[int, int], "Any"]:
    """Build a fetch_fn that streams a block gap through Ray Data:
    range -> payload synth/read -> parse map_batches.  Large catch-up gaps
    (a listener down for hours) stream with backpressure instead of
    accumulating on the driver."""
    import ray.data

    def fetch(start: int, end: int):
        ds = ray.data.range(end - start)

        def to_payload(batch: pa.Table) -> pa.Table:
            ids = [start + int(i) for i in batch.column("id").to_pylist()]
            return pa.table(
                {
                    "block_height": pa.array(ids, pa.int64()),
                    "payload": pa.array([payload_of_block(i) for i in ids], pa.string()),
                }
            )

        return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
            parse_stage, batch_format="pyarrow"
        )

    return fetch


def follow_cursor(
    fetch_page: Callable[[Optional[str]], dict],
    start: Optional[str] = None,
    max_pages: Optional[int] = None,
) -> List[dict]:
    """Next-cursor pagination driver (reference Sign4btyesSpider.parse,
    spiders/contracts/sign.py:32-43: each JSON page carries ``next`` — the
    follow-up request — and ``results``).  Returns the raw page payloads in
    fetch order; parsing the accumulated pages is a Ray Data map_batches
    stage so only the (inherently sequential) cursor walk stays on the
    driver.  ``max_pages=None`` follows until ``next`` is null."""
    pages: List[dict] = []
    cursor = start
    while max_pages is None or len(pages) < max_pages:
        page = fetch_page(cursor)
        if page is None:
            break
        pages.append(page)
        cursor = page.get("next")
        if not cursor:
            break
    return pages
