"""Tail ('listen') mode: cursor-follow of a growing head (reference
spiders/trans/evm/blocks.py:140-189 semantics)."""

import json


def test_every_block_fetched_exactly_once_in_order():
    from blockchainspider_ray.crawl.tail import BlockTailFollower

    heads = iter([10, 10, 13, 13, 15])
    seen = []

    f = BlockTailFollower(
        head_fn=lambda: next(heads, 15),
        fetch_fn=lambda s, e: seen.extend(range(s, e)),
        start_block=8,
    )
    out = f.run(max_polls=6)
    assert seen == list(range(8, 16))  # 8..15, no gaps, no dups
    assert out["cursor"] == 16
    assert out["blocks_fetched"] == 8


def test_latest_block_patch_starts_at_head():
    from blockchainspider_ray.crawl.tail import BlockTailFollower

    heads = iter([100, 102])
    seen = []
    f = BlockTailFollower(
        head_fn=lambda: next(heads, 102),
        fetch_fn=lambda s, e: seen.extend(range(s, e)),
        start_block=-1,
    )
    f.run(max_polls=3)
    # reference patch: first poll pins cursor to head -> fetch 100..102
    assert seen == [100, 101, 102]


def test_none_head_repolls_and_idle_stop():
    from blockchainspider_ray.crawl.tail import BlockTailFollower

    heads = iter([None, 5, None, 5, 5])
    seen = []
    f = BlockTailFollower(
        head_fn=lambda: next(heads, 5),
        fetch_fn=lambda s, e: seen.extend(range(s, e)),
        start_block=4,
    )
    out = f.run(stop_when_idle=3)
    assert seen == [4, 5]
    assert out["polls"] <= 6  # terminated by idle, not max_polls


def test_dataset_gap_fetch(ray_session):
    """Catch-up gap streams through Ray Data and parses per block."""
    from blockchainspider_ray.crawl.tail import BlockTailFollower, follow_blocks_dataset
    from blockchainspider_ray.functions.solana import solana_blocks_stage

    def payload_of(block: int) -> str:
        return json.dumps(
            {
                "result": {
                    "blockTime": 1700000000 + block,
                    "blockhash": f"BH{block}",
                    "parentSlot": block - 1,
                    "previousBlockhash": f"BH{block-1}",
                    "transactions": [],
                }
            }
        )

    fetch = follow_blocks_dataset(payload_of, solana_blocks_stage)
    parsed_rows = []
    heads = iter([4, 9])
    f = BlockTailFollower(
        head_fn=lambda: next(heads, 9),
        fetch_fn=fetch,
        start_block=0,
        on_round=lambda s, e, ds: parsed_rows.extend(
            ds.to_pandas().to_dict("records")
        ),
    )
    out = f.run(max_polls=2)
    assert out["blocks_fetched"] == 10
    got = sorted(r["block_height"] for r in parsed_rows)
    assert got == list(range(10))
    assert all(r["item_type"] == "SolanaBlockItem" for r in parsed_rows)
