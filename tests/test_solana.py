"""Solana block parser (functions/solana.py) vs hand-derived expectations
mirroring reference spiders/trans/solana/blocks.py:167-402."""

import json

import pytest


def test_multilevel_sequence_reference_shape():
    from blockchainspider_ray.functions.solana import multilevel_sequence

    # heights [2,3,3,2] with start=2: the reference numbers the outer
    # level from start-1 (blocks.py:388 stack=[start-1]) — a quirk kept
    assert multilevel_sequence([2, 3, 3, 2], 2) == ["1.1", "1.1.1", "1.1.2", "1.2"]
    # deeper nesting resets lower levels
    assert multilevel_sequence([2, 3, 4, 2, 3], 1) == [
        "0.1",
        "0.1.1",
        "0.1.1.1",
        "0.2",
        "0.2.1",
    ]
    assert multilevel_sequence([], 3) == []


def _block():
    return {
        "blockTime": 1700000000,
        "blockhash": "BH1",
        "parentSlot": 41,
        "previousBlockhash": "BH0",
        "transactions": [
            {
                "version": 0,
                "transaction": {
                    "signatures": ["SIGA"],
                    "message": {
                        "accountKeys": [
                            {"pubkey": "ALICE"},
                            {"pubkey": "TOKACC"},
                            {"pubkey": "BOB"},
                        ],
                        "recentBlockhash": "RBH",
                        "instructions": [
                            {
                                "programId": "TOK",
                                "program": "spl-token",
                                "parsed": {"type": "transfer", "info": {"amount": "5"}},
                            },
                            {"programId": "RAW", "data": "xyz", "accounts": [0, 2]},
                            {
                                "programId": "MEMO",
                                "program": "spl-memo",
                                "parsed": "hello memo",
                            },
                        ],
                    },
                },
                "meta": {
                    "err": {"InstructionError": [0, {}]},
                    "fee": 5000,
                    "computeUnitsConsumed": 0,  # falsy -> -1 (reference quirk)
                    "preBalances": [100, 50, 0],
                    "postBalances": [90, 50, 10],
                    "preTokenBalances": [
                        {
                            "accountIndex": 1,
                            "mint": "MINT",
                            "owner": "ALICE",
                            "programId": "TOK",
                            "uiTokenAmount": {"amount": "12", "decimals": 6},
                        }
                    ],
                    "postTokenBalances": [
                        {
                            "accountIndex": 1,
                            "mint": "MINT",
                            "owner": "ALICE",
                            "programId": "TOK",
                            "uiTokenAmount": {"amount": "7", "decimals": 6},
                        }
                    ],
                    "logMessages": ["log one", "log two"],
                    "innerInstructions": [
                        {
                            "index": 1,
                            "instructions": [
                                {
                                    "programId": "P1",
                                    "stackHeight": 2,
                                    "program": "system",
                                    "parsed": {"type": "transfer", "info": {"lamports": 1}},
                                },
                                {"programId": "P2", "stackHeight": 3, "data": "d"},
                                {"programId": "P3", "stackHeight": 2, "data": "e"},
                            ],
                        }
                    ],
                },
            }
        ],
    }


def test_parse_block_item_fanout():
    from blockchainspider_ray.functions.solana import parse_solana_block

    pairs = list(parse_solana_block(_block(), 42))
    by_type = {}
    for cls, item in pairs:
        by_type.setdefault(cls, []).append(item)

    assert by_type["SolanaBlockItem"][0] == {
        "block_height": 42,
        "block_time": 1700000000,
        "block_hash": "BH1",
        "parent_slot": 41,
        "previous_blockhash": "BH0",
    }
    tx = by_type["SolanaTransactionItem"][0]
    assert tx["signer"] == "ALICE"
    assert tx["err"] == "InstructionError"  # first err dict key
    assert tx["compute_consumed"] == -1  # falsy 0 -> -1 (reference truthiness)
    assert tx["fee"] == 5000 and tx["version"] == 0

    # balance diffs: 1 token (12 -> 7) + 2 native (ALICE 100->90, BOB 0->10)
    bals = by_type["SolanaBalanceChangesItem"]
    assert len(bals) == 3
    token = [b for b in bals if b["mint"] == "MINT"][0]
    assert token["pre_amount"] == "12" and token["post_amount"] == "7"
    native = {b["account"]: b for b in bals if b["mint"] == ""}
    assert set(native) == {"ALICE", "BOB"}
    assert native["ALICE"]["decimals"] == 9
    assert native["BOB"]["program_id"] == "11111111111111111111111111111111"

    assert [x["log"] for x in by_type["SolanaLogItem"]] == ["log one", "log two"]

    # top-level: spl-token at trace 0, unparsed at 1, memo at 2
    assert by_type["SPLTokenActionItem"][0]["trace_id"] == "0"
    unparsed = by_type["SolanaInstructionItem"]
    assert unparsed[0]["trace_id"] == "1" and unparsed[0]["data"] == "xyz"
    assert by_type["SPLMemoItem"][0]["memo"] == "hello memo"

    # inner: heights [2,3,2] at index 1 (start=2, outer numbered start-1)
    # -> ids 1.1, 1.1.1, 1.2
    system_items = by_type["SystemItem"]
    assert system_items[0]["trace_id"] == "1.1"
    inner_unparsed = [i for i in unparsed if i["trace_id"] in ("1.1.1", "1.2")]
    assert {i["trace_id"] for i in inner_unparsed} == {"1.1.1", "1.2"}


def test_solana_stage_and_query(ray_session):
    from blockchainspider_ray.functions.solana import solana_blocks_stage
    from blockchainspider_ray.pipelines.queries import q_solana_block_parse

    import pyarrow as pa

    batch = pa.table(
        {
            "block_height": pa.array([42], pa.int64()),
            "payload": pa.array([json.dumps({"result": _block()})], pa.string()),
        }
    )
    out = solana_blocks_stage(batch)
    assert set(out.column("item_type").to_pylist()) == {
        "SolanaBlockItem",
        "SolanaTransactionItem",
        "SolanaBalanceChangesItem",
        "SolanaLogItem",
        "SPLTokenActionItem",
        "SolanaInstructionItem",
        "SPLMemoItem",
        "SystemItem",
    }
    # null result payloads are skipped (reference returns None)
    empty = solana_blocks_stage(
        pa.table(
            {
                "block_height": pa.array([1], pa.int64()),
                "payload": pa.array([json.dumps({"result": None})], pa.string()),
            }
        )
    )
    assert empty.num_rows == 0

    df = q_solana_block_parse("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    # every block emits one header and one tx
    n_blocks = (df["item_type"] == "SolanaBlockItem").sum()
    assert (df["item_type"] == "SolanaTransactionItem").sum() == n_blocks
    # deterministic
    df2 = q_solana_block_parse("/root/testdata/sf0.001").to_pandas()
    assert df.equals(df2)


def test_solana_tx_lookup_is_keyed_subset(ray_session):
    """tx-by-signature regime: exactly the requested signatures' items,
    byte-identical to the block parse restricted to the key list."""
    from blockchainspider_ray.pipelines.queries import (
        q_solana_block_parse,
        q_solana_tx_lookup,
    )
    from blockchainspider_ray.stages.dedup import _stable_h64

    full = q_solana_block_parse("/root/testdata/sf0.001").to_pandas()
    sub = q_solana_tx_lookup("/root/testdata/sf0.001").to_pandas()
    assert 0 < len(sub) < len(full)
    wanted = {s for s in full["signature"] if s and _stable_h64(s) % 37 == 0}
    assert set(sub["signature"]) - {""} == wanted
    # the per-signature rows are identical to the full parse's (headers
    # carry signature "" and are block-scoped, so compare the keyed rows)
    key = ["block_height", "item_type", "trace_id", "signature"]
    full_sub = (
        full[full["signature"].isin(wanted)].sort_values(key).reset_index(drop=True)
    )
    sub_rows = (
        sub[sub["signature"].isin(wanted)].sort_values(key).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(sub_rows, full_sub)


def test_parse_solana_transaction_matches_block_path():
    """The by-signature reader (getTransaction result: blockTime/slot on
    the envelope) must yield byte-identical item payloads to the block
    reader's per-transaction half for the same transaction."""
    import json

    from blockchainspider_ray.functions.solana import (
        parse_solana_block,
        parse_solana_transaction,
        solana_transactions_stage,
    )

    block = _block()
    block_pairs = [
        p for p in parse_solana_block(block, 42) if p[0] != "SolanaBlockItem"
    ]
    tx_pairs = []
    for tx in block["transactions"]:
        env = dict(tx)  # getTransaction envelope: slot/blockTime top-level
        env["slot"] = 42
        env["blockTime"] = block.get("blockTime", -1)
        tx_pairs.extend(parse_solana_transaction(env))
    assert tx_pairs == block_pairs

    import pyarrow as pa

    batch = pa.table(
        {
            "signature": pa.array(
                [t["transaction"]["signatures"][0] for t in block["transactions"]]
            ),
            "payload": pa.array(
                [
                    json.dumps({**t, "slot": 42, "blockTime": block.get("blockTime", -1)})
                    for t in block["transactions"]
                ]
            ),
        }
    )
    out = solana_transactions_stage(batch)
    assert out.num_rows == len(block_pairs)
    assert set(out.column("item_type").to_pylist()) == {c for c, _ in block_pairs}
