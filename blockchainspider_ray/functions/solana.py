"""Solana block parsing — the 8-item-type fan-out of the reference's
SolanaBlockTransactionSpider (reference spiders/trans/solana/blocks.py:
167-402), re-expressed as pure functions usable inside ``map_batches``.

Per getBlock JSON result the parser emits:

- ``SolanaBlockItem``             block header
- ``SolanaTransactionItem``       one per tx (signer, fee, err key, ...)
- ``SolanaBalanceChangesItem``    token balance diffs (pre/post token
                                  balances joined per account) AND native
                                  lamport diffs (program_id = system,
                                  decimals 9, owner = account)
- ``SolanaLogItem``               one per log message
- ``SolanaInstructionItem``       unparsed instructions
- ``SPLTokenActionItem`` / ``ValidateVotingItem`` / ``SystemItem`` /
  ``SPLMemoItem``                 parsed instructions by program
- inner instructions carry multilevel trace ids ("2.1", "2.1.1", ...)
  from the stackHeight sequence (``multilevel_sequence`` replicates
  reference blocks.py:387-402).

The reference streams these through scrapy items; here the per-class rows
are plain dicts, and ``solana_items_table`` flattens them into one
discriminated-union Arrow table (``item_type`` + common columns + JSON
payload for class-specific fields) — the shape a file-per-class sink
splits on.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterator, List, Tuple

import pyarrow as pa

SYSTEM_PROGRAM = "11111111111111111111111111111111"


def multilevel_sequence(levels: List[int], start: int) -> List[str]:
    """Inner-instruction trace ids from stack heights (reference
    blocks.py:387-402): a depth-first counter per level, e.g. heights
    [2, 3, 3, 2] at index start=2 -> ['2.1', '2.1.1', '2.1.2', '2.2']."""
    stack = [start - 1]
    result: List[str] = []
    for level in levels:
        if level > len(stack):
            stack.append(1)
        else:
            stack[level - 1] += 1
            for i in range(level, len(stack)):
                stack[i] = 0
        result.append(".".join(str(num) for num in stack[:level]))
    return result


def _instruction_items(
    signature: str, trace_id: "int | str", instruction: dict
) -> Iterator[Tuple[str, dict]]:
    program_id = instruction.get("programId", "")
    if not instruction.get("parsed"):
        yield (
            "SolanaInstructionItem",
            {
                "signature": signature,
                "trace_id": str(trace_id),
                "data": instruction.get("data", ""),
                "program_id": program_id,
                "accounts": instruction.get("accounts", []),
            },
        )
        return
    parsed = instruction["parsed"]
    program = instruction.get("program", "")
    base = {
        "signature": signature,
        "trace_id": str(trace_id),
        "program_id": program_id,
        "program": program,
    }
    if program == "spl-token":
        yield ("SPLTokenActionItem", {**base, "dtype": parsed["type"], "info": parsed["info"]})
    elif program == "vote":
        yield ("ValidateVotingItem", {**base, "dtype": parsed["type"], "info": parsed["info"]})
    elif program == "system":
        yield ("SystemItem", {**base, "dtype": parsed["type"], "info": parsed["info"]})
    elif program == "spl-memo":
        yield ("SPLMemoItem", {**base, "memo": parsed})


def parse_solana_block(result: dict, block_height: int) -> Iterator[Tuple[str, dict]]:
    """Yield (item_class_name, item_dict) pairs for one getBlock result —
    the reference's ``_parsing_block`` generator, dict-shaped."""
    block_time = result.get("blockTime", -1)
    yield (
        "SolanaBlockItem",
        {
            "block_height": block_height,
            "block_time": block_time,
            "block_hash": result.get("blockhash", ""),
            "parent_slot": result.get("parentSlot", -1),
            "previous_blockhash": result.get("previousBlockhash", ""),
        },
    )
    for item in result.get("transactions", []):
        yield from _transaction_items_of(item, block_time, block_height)


def _transaction_items_of(
    item: dict, block_time: int, block_height: int
) -> Iterator[Tuple[str, dict]]:
    """Per-transaction item family (SolanaTransactionItem, balance diffs,
    logs, instruction trace) — the reference's parse_transaction body
    (spiders/trans/solana/trans.py:73-264), shared verbatim between the
    block reader (one getBlock result: many transactions) and the
    BY-SIGNATURE reader (one getTransaction result per signature —
    parse_solana_transaction)."""
    if True:
        meta = item.get("meta")
        message = item["transaction"]["message"]
        signature = item["transaction"]["signatures"][0]
        err = (
            list(meta["err"].keys())[0]
            if isinstance(meta, dict) and isinstance(meta.get("err"), dict)
            else ""
        )
        yield (
            "SolanaTransactionItem",
            {
                "signature": signature,
                "signer": message["accountKeys"][0]["pubkey"],
                "block_time": block_time,
                "block_height": block_height,
                "version": item.get("version", "legacy"),
                "fee": meta["fee"] if meta is not None else -1,
                "compute_consumed": meta["computeUnitsConsumed"]
                if meta is not None and meta.get("computeUnitsConsumed")
                else -1,
                "err": err,
                "recent_blockhash": message["recentBlockhash"],
            },
        )

        accounts = [ak["pubkey"] for ak in message["accountKeys"]]
        # token balance diffs
        if (
            isinstance(meta, dict)
            and isinstance(meta.get("preTokenBalances"), list)
            and isinstance(meta.get("postTokenBalances"), list)
        ):
            pre_of = {accounts[b["accountIndex"]]: b for b in meta["preTokenBalances"]}
            post_of = {accounts[b["accountIndex"]]: b for b in meta["postTokenBalances"]}
            for account in sorted(set(pre_of) | set(post_of)):
                pre, post = pre_of.get(account), post_of.get(account)
                pre_amount = pre["uiTokenAmount"]["amount"] if pre is not None else 0
                post_amount = post["uiTokenAmount"]["amount"] if post is not None else 0
                if pre_amount == post_amount:
                    continue
                info = pre if pre is not None else post
                yield (
                    "SolanaBalanceChangesItem",
                    {
                        "signature": signature,
                        "account": account,
                        "mint": info.get("mint", ""),
                        "owner": info.get("owner", ""),
                        "program_id": info.get("programId", ""),
                        "pre_amount": pre_amount,
                        "post_amount": post_amount,
                        "decimals": info["uiTokenAmount"]["decimals"],
                    },
                )
        # native lamport diffs
        if (
            isinstance(meta, dict)
            and isinstance(meta.get("preBalances"), list)
            and isinstance(meta.get("postBalances"), list)
        ):
            for i, account in enumerate(accounts):
                pre_b, post_b = meta["preBalances"][i], meta["postBalances"][i]
                if post_b == pre_b:
                    continue
                yield (
                    "SolanaBalanceChangesItem",
                    {
                        "signature": signature,
                        "account": account,
                        "mint": "",
                        "owner": account,
                        "program_id": SYSTEM_PROGRAM,
                        "pre_amount": pre_b,
                        "post_amount": post_b,
                        "decimals": 9,
                    },
                )
        # logs
        if isinstance(meta, dict) and meta.get("logMessages"):
            for index, log in enumerate(meta["logMessages"]):
                yield ("SolanaLogItem", {"signature": signature, "index": index, "log": log})
        # top-level instructions (trace_id = position)
        for index, instruction in enumerate(message.get("instructions", [])):
            yield from _instruction_items(signature, index, instruction)
        # inner instructions (multilevel trace ids)
        if isinstance(meta, dict) and meta.get("innerInstructions"):
            for inner in meta["innerInstructions"]:
                start = inner["index"] + 1
                heights = [ins["stackHeight"] for ins in inner["instructions"]]
                ids = multilevel_sequence(heights, start)
                for tid, instruction in zip(ids, inner["instructions"]):
                    yield from _instruction_items(signature, tid, instruction)


def parse_solana_transaction(result: dict) -> Iterator[Tuple[str, dict]]:
    """Item pairs for ONE getTransaction-by-signature result — the
    reference's key-list regime (spiders/trans/solana/trans.py:73-79:
    blockTime/slot live on the transaction envelope itself, not a block
    wrapper).  Same item families as the per-transaction half of
    :func:`parse_solana_block`, byte-identical payloads."""
    block_time = result.get("blockTime", -1)
    block_height = result.get("slot", -1)
    yield from _transaction_items_of(result, block_time, block_height)


_UNION_FIELDS = ["item_type", "block_height", "signature", "trace_id", "program", "dtype"]


def solana_items_table(pairs: List[Tuple[str, dict]], block_height: int) -> pa.Table:
    """Flatten (class, item) pairs into the discriminated-union table."""
    cols: Dict[str, list] = {f: [] for f in _UNION_FIELDS}
    payloads: List[str] = []
    for cls, item in pairs:
        cols["item_type"].append(cls)
        cols["block_height"].append(block_height)
        cols["signature"].append(item.get("signature", ""))
        cols["trace_id"].append(str(item.get("trace_id", "")))
        cols["program"].append(item.get("program", ""))
        cols["dtype"].append(item.get("dtype", ""))
        payloads.append(json.dumps(item, sort_keys=True, default=str))
    return pa.table(
        {
            "item_type": pa.array(cols["item_type"], pa.string()),
            "block_height": pa.array(cols["block_height"], pa.int64()),
            "signature": pa.array(cols["signature"], pa.string()),
            "trace_id": pa.array(cols["trace_id"], pa.string()),
            "program": pa.array(cols["program"], pa.string()),
            "dtype": pa.array(cols["dtype"], pa.string()),
            "payload": pa.array(payloads, pa.string()),
        }
    )


def solana_blocks_stage(batch: pa.Table) -> pa.Table:
    """map_batches stage: (block_height, payload_json) rows -> union items
    table.  The reference receives one JSON-RPC response per block; here
    the payload column carries the same getBlock result JSON."""
    tables = []
    for h, payload in zip(
        batch.column("block_height").to_pylist(), batch.column("payload").to_pylist()
    ):
        data = json.loads(payload)
        result = data.get("result") if "result" in data else data
        if result is None:
            continue
        pairs = list(parse_solana_block(result, h))
        tables.append(solana_items_table(pairs, h))
    if not tables:
        return solana_items_table([], 0).slice(0, 0)
    return pa.concat_tables(tables)


def solana_transactions_stage(batch: pa.Table) -> pa.Table:
    """map_batches stage for the BY-SIGNATURE reader: (signature,
    payload_json) rows -> union items table, one getTransaction result
    per row (the reference SolanaTransactionSpider's key-list regime —
    it fans one request per signature instead of walking blocks)."""
    tables = []
    for payload in batch.column("payload").to_pylist():
        data = json.loads(payload)
        result = data.get("result") if "result" in data else data
        if result is None:
            continue
        pairs = list(parse_solana_transaction(result))
        tables.append(solana_items_table(pairs, result.get("slot", -1)))
    if not tables:
        return solana_items_table([], 0).slice(0, 0)
    return pa.concat_tables(tables)
