"""ETL normalizers and scalar converters (the `trans.*` operator family).

Re-expresses, over Arrow batches, the reference's record normalizers:

- transfer normalizer — lowercase addresses, zero-address fill for missing
  parties, synthesized stable row id from the joined identity fields
  (reference middlewares/txs/blockscan/external.py:121-148: ``id =
  sha1(join(from,to,value,hash,...))``, zero-fill external.py:137-139);
- hex→dec / word→address / calldata word splitting (reference
  utils/web3.py:74-102,83-89);
- token-event decoding — dispatch on ``topics[0]`` into typed transfer rows
  (reference middlewares/trans/token.py:35-236, topic constants
  utils/token.py:9-14);
- trace-tree flattening — recursive ``callTracer`` JSON walk emitting rows
  with ``trace_id = 'depth_order'`` (reference middlewares/trans/trace.py:
  62-125,163-172);
- JSON side-band parsing (``props`` columns; reference json.loads use
  throughout, e.g. external.py:115).

All are stateless batch kernels for ``map_batches(batch_format='pyarrow')``;
hashes synthesize ids with md5 (DuckDB-mirrorable; the reference's sha1
choice is an arbitrary stable-id function, not a semantic).
"""

from __future__ import annotations

import hashlib
import json
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

ZERO_ADDRESS = "0x0000000000000000000000000000000000000000"

# Keccak topic constants (reference utils/token.py:9-14).  Values themselves
# are public Ethereum event signatures.
TOPIC_TRANSFER = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
TOPIC_APPROVAL = "0x8c5be1e5ebec7d5bd14f71427d1e84f3dd0314c0f7b2291e5b200ac8c7c3b925"


def hex_to_dec(hex_str: Optional[str]) -> int:
    """'0x1a' | '1a' -> 26; None/'' -> 0 (reference utils/web3.py:74-80)."""
    if not hex_str:
        return 0
    return int(hex_str, 16)


def word_to_address(word: Optional[str]) -> str:
    """32-byte ABI word -> '0x'+last-20-bytes, lowercased (reference
    utils/web3.py:83-89)."""
    if not word:
        return ZERO_ADDRESS
    w = word[2:] if word.startswith("0x") else word
    w = w.rjust(64, "0")
    return ("0x" + w[24:]).lower()


def split_to_words(data: Optional[str]) -> List[str]:
    """Calldata hex -> 32-byte words (reference utils/web3.py:92-102)."""
    if not data:
        return []
    d = data[2:] if data.startswith("0x") else data
    return ["0x" + d[i : i + 64] for i in range(0, len(d), 64)]


def synth_transfer_id(*fields) -> str:
    """Stable row id = md5('_'.join(fields)) — the reference synthesizes
    sha1-of-joined-fields ids (external.py:131); md5 keeps the same identity
    semantics and has a DuckDB mirror."""
    return hashlib.md5("_".join("" if f is None else str(f) for f in fields).encode()).hexdigest()


def normalize_transfers(batch: pa.Table) -> pa.Table:
    """(from/to/value/hash) -> normalized transfer rows.

    Lowercases both parties, fills missing parties with the zero address,
    and synthesizes ``id = md5(from_to_value_hash)`` — the normalizer
    contract of reference external.py:121-148.
    """
    froms = [
        (f or ZERO_ADDRESS).lower() for f in batch.column("from").to_pylist()
    ]
    tos = [(t or ZERO_ADDRESS).lower() for t in batch.column("to").to_pylist()]
    values = batch.column("value").to_pylist()
    hashes = batch.column("hash").to_pylist()
    ids = [
        synth_transfer_id(f, t, v, h) for f, t, v, h in zip(froms, tos, values, hashes)
    ]
    return pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "from_addr": pa.array(froms, pa.string()),
            "to_addr": pa.array(tos, pa.string()),
            "value": pa.array([float(v or 0) for v in values], pa.float64()),
            "hash": pa.array([h or "" for h in hashes], pa.string()),
        }
    )


def decode_token_events(batch: pa.Table) -> pa.Table:
    """Event-log rows (topics: list<string>, data: string, log_index, hash)
    -> typed token actions; dispatch on topics[0] (reference
    middlewares/trans/token.py:35-236).

    ERC20 Transfer: topics=[TOPIC_TRANSFER, from_word, to_word], data=value.
    Approval analogous.  Unknown topics are dropped.
    """
    out: Dict[str, list] = {k: [] for k in ("hash", "log_index", "action", "from_addr", "to_addr", "value")}
    topics_col = batch.column("topics").to_pylist()
    data_col = batch.column("data").to_pylist()
    for h, li, topics, data in zip(
        batch.column("hash").to_pylist(),
        batch.column("log_index").to_pylist(),
        topics_col,
        data_col,
    ):
        if not topics:
            continue
        t0 = topics[0]
        if t0 == TOPIC_TRANSFER and len(topics) >= 3:
            action = "transfer"
        elif t0 == TOPIC_APPROVAL and len(topics) >= 3:
            action = "approval"
        else:
            continue
        out["hash"].append(h)
        out["log_index"].append(li)
        out["action"].append(action)
        out["from_addr"].append(word_to_address(topics[1]))
        out["to_addr"].append(word_to_address(topics[2]))
        out["value"].append(hex_to_dec(data))
    return pa.table(
        {
            "hash": pa.array(out["hash"], pa.string()),
            "log_index": pa.array(out["log_index"], pa.int64()),
            "action": pa.array(out["action"], pa.string()),
            "from_addr": pa.array(out["from_addr"], pa.string()),
            "to_addr": pa.array(out["to_addr"], pa.string()),
            "value": pa.array(out["value"], pa.int64()),
        }
    )


def flatten_trace_tree(tx_hash: str, trace: dict) -> List[dict]:
    """callTracer JSON -> rows with trace_id='depth_order' (reference
    middlewares/trans/trace.py:62-125; id scheme trace.py:163-172)."""
    rows: List[dict] = []

    def walk(node: dict, depth: int, order: int) -> int:
        rows.append(
            {
                "transaction_hash": tx_hash,
                "trace_id": f"{depth}_{order}",
                "trace_type": node.get("type", ""),
                "from_addr": (node.get("from") or ZERO_ADDRESS).lower(),
                "to_addr": (node.get("to") or ZERO_ADDRESS).lower(),
                "value": hex_to_dec(node.get("value")),
                "depth": depth,
            }
        )
        nxt = order
        for child in node.get("calls") or []:
            nxt += 1
            nxt = walk(child, depth + 1, nxt)
        return nxt

    walk(trace, 0, 0)
    return rows


def flatten_traces_batch(batch: pa.Table) -> pa.Table:
    """(hash, trace_json) -> one row per call frame (a flat_map expressed as
    a batch transform)."""
    rows: List[dict] = []
    for h, tj in zip(batch.column("hash").to_pylist(), batch.column("trace_json").to_pylist()):
        if not tj:
            continue
        rows.extend(flatten_trace_tree(h, json.loads(tj)))
    if not rows:
        return pa.table(
            {
                "transaction_hash": pa.array([], pa.string()),
                "trace_id": pa.array([], pa.string()),
                "trace_type": pa.array([], pa.string()),
                "from_addr": pa.array([], pa.string()),
                "to_addr": pa.array([], pa.string()),
                "value": pa.array([], pa.int64()),
                "depth": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "transaction_hash": pa.array([r["transaction_hash"] for r in rows], pa.string()),
            "trace_id": pa.array([r["trace_id"] for r in rows], pa.string()),
            "trace_type": pa.array([r["trace_type"] for r in rows], pa.string()),
            "from_addr": pa.array([r["from_addr"] for r in rows], pa.string()),
            "to_addr": pa.array([r["to_addr"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.int64()),
            "depth": pa.array([r["depth"] for r in rows], pa.int64()),
        }
    )


def parse_json_props(batch: pa.Table, col: str = "props", key: str = "k") -> pa.Table:
    """JSON side-band column -> typed value column (reference json.loads of
    API payloads, external.py:115; nested-JSON items SURVEY.md §1.2)."""
    vals = []
    for s in batch.column(col).to_pylist():
        try:
            vals.append(int(json.loads(s)[key]) if s else None)
        except (ValueError, KeyError, TypeError):
            vals.append(None)
    return batch.append_column(f"{col}_{key}", pa.array(vals, pa.int64()))


def function_selector(signature: str) -> str:
    """4-byte ABI function selector: '0x' + keccak256(signature)[:4] hex —
    the reference builds eth_call data as Web3.keccak(text='name()')
    .hex()[:2+8] (reference utils/token.py:110,143,176,206).  Uses the
    pure-python keccak from functions/checksums.py."""
    from .checksums import keccak256

    return "0x" + keccak256(signature.encode("ascii")).hex()[:8]


def event_topic(signature: str) -> str:
    """Full 32-byte event topic hash ('0x' + keccak256(signature)) — the
    dispatch keys of the token-event decoder (TOPIC_TRANSFER / _APPROVAL
    above are keccak256 of the canonical event signatures)."""
    from .checksums import keccak256

    return "0x" + keccak256(signature.encode("ascii")).hex()


def merge_intervals(spans: List[tuple]) -> List[List[int]]:
    """Coalesce overlapping-or-touching [start, end) intervals (sorted-scan
    gaps-and-islands; the kernel behind q_span_merge and any redaction-span
    / byte-range compaction).  Touching intervals (next.start == cur.end)
    merge; the result is sorted and pairwise disjoint with gaps > 0."""
    islands: List[List[int]] = []
    for s, e in sorted(spans):
        if islands and s <= islands[-1][1]:
            if e > islands[-1][1]:
                islands[-1][1] = e
        else:
            islands.append([s, e])
    return islands
