"""DCFG (dynamic control-flow graph) trace parsing.

The reference's DCFGMiddleware ships a JS tracer to the node
(debug_traceTransaction / debug_traceBlockByNumber) and shapes the
returned ``{'blocks': [...], 'edges': [...]}`` JSON into DCFGBlockItem /
DCFGEdgeItem rows (reference middlewares/trans/dcfg.py:189-222).  The JS
tracer runs server-side and is out of scope here (no network, no node);
THIS module is the client half: the same item shaping over trace JSON.

The reference builds its opcode-number -> mnemonic map from pyevmasm's
instruction tables (dcfg.py:138-144); pyevmasm is unavailable, so the
standard EVM opcode table (yellow paper + later fork additions — public
knowledge) is embedded below.  Unknown opcode numbers are dropped from
block operation lists exactly as the reference does ("may become
outdated" filter, dcfg.py:193-196).
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, List, Tuple

import pyarrow as pa

_BASE_OPS = {
    0x00: "STOP", 0x01: "ADD", 0x02: "MUL", 0x03: "SUB", 0x04: "DIV",
    0x05: "SDIV", 0x06: "MOD", 0x07: "SMOD", 0x08: "ADDMOD", 0x09: "MULMOD",
    0x0A: "EXP", 0x0B: "SIGNEXTEND",
    0x10: "LT", 0x11: "GT", 0x12: "SLT", 0x13: "SGT", 0x14: "EQ",
    0x15: "ISZERO", 0x16: "AND", 0x17: "OR", 0x18: "XOR", 0x19: "NOT",
    0x1A: "BYTE", 0x1B: "SHL", 0x1C: "SHR", 0x1D: "SAR",
    0x20: "SHA3",
    0x30: "ADDRESS", 0x31: "BALANCE", 0x32: "ORIGIN", 0x33: "CALLER",
    0x34: "CALLVALUE", 0x35: "CALLDATALOAD", 0x36: "CALLDATASIZE",
    0x37: "CALLDATACOPY", 0x38: "CODESIZE", 0x39: "CODECOPY",
    0x3A: "GASPRICE", 0x3B: "EXTCODESIZE", 0x3C: "EXTCODECOPY",
    0x3D: "RETURNDATASIZE", 0x3E: "RETURNDATACOPY", 0x3F: "EXTCODEHASH",
    0x40: "BLOCKHASH", 0x41: "COINBASE", 0x42: "TIMESTAMP", 0x43: "NUMBER",
    0x44: "DIFFICULTY", 0x45: "GASLIMIT", 0x46: "CHAINID",
    0x47: "SELFBALANCE", 0x48: "BASEFEE",
    0x50: "POP", 0x51: "MLOAD", 0x52: "MSTORE", 0x53: "MSTORE8",
    0x54: "SLOAD", 0x55: "SSTORE", 0x56: "JUMP", 0x57: "JUMPI",
    0x58: "PC", 0x59: "MSIZE", 0x5A: "GAS", 0x5B: "JUMPDEST",
    0xF0: "CREATE", 0xF1: "CALL", 0xF2: "CALLCODE", 0xF3: "RETURN",
    0xF4: "DELEGATECALL", 0xF5: "CREATE2", 0xFA: "STATICCALL",
    0xFD: "REVERT", 0xFE: "INVALID", 0xFF: "SELFDESTRUCT",
}
NUM2OP_NAME: Dict[int, str] = dict(_BASE_OPS)
for _i in range(32):
    NUM2OP_NAME[0x60 + _i] = f"PUSH{_i + 1}"
for _i in range(16):
    NUM2OP_NAME[0x80 + _i] = f"DUP{_i + 1}"
    NUM2OP_NAME[0x90 + _i] = f"SWAP{_i + 1}"
for _i in range(5):
    NUM2OP_NAME[0xA0 + _i] = f"LOG{_i}"


def parse_dcfg_blocks(result: dict, transaction_hash: str) -> List[dict]:
    """DCFGBlockItem rows (reference parse_dcfg_block_items)."""
    items = []
    for block in result["blocks"]:
        operations = [
            NUM2OP_NAME[num]
            for num in block["operations"]
            if NUM2OP_NAME.get(num)  # unknown opcodes dropped (reference note)
        ]
        items.append(
            {
                "transaction_hash": transaction_hash,
                "contract_address": block["contract_address"],
                "start_pc": block["start_pc"],
                "operations": operations,
            }
        )
    return items


def parse_dcfg_edges(result: dict, transaction_hash: str) -> List[dict]:
    """DCFGEdgeItem rows (reference parse_dcfg_edge_items): edges index
    into the block list; flow_type is the opcode mnemonic of the
    transfer-of-control instruction."""
    blocks = result["blocks"]
    items = []
    for edge in result["edges"]:
        items.append(
            {
                "transaction_hash": transaction_hash,
                "address_from": blocks[edge["from"]]["contract_address"],
                "start_pc_from": blocks[edge["from"]]["start_pc"],
                "address_to": blocks[edge["to"]]["contract_address"],
                "start_pc_to": blocks[edge["to"]]["start_pc"],
                "flow_type": NUM2OP_NAME[edge["type"]],
                "value": int(edge.get("value", -1)),
                "gas": int(edge.get("gas", -1)),
                "selector": edge.get("selector", "0x"),
                "index": edge.get("index", 0),
            }
        )
    return items


def dcfg_stage(batch: pa.Table) -> pa.Table:
    """map_batches stage: (transaction_hash, payload) rows -> flattened
    block+edge union rows.  ``payload`` carries the tracer JSON (the
    reference receives it as the RPC response body)."""
    rows: List[dict] = []
    for txh, payload in zip(
        batch.column("transaction_hash").to_pylist(), batch.column("payload").to_pylist()
    ):
        data = json.loads(payload)
        result = data.get("result") if "result" in data else data
        if result is None:
            continue
        for b in parse_dcfg_blocks(result, txh):
            rows.append(
                {
                    "kind": "block",
                    "transaction_hash": txh,
                    "contract_address": b["contract_address"],
                    "start_pc": b["start_pc"],
                    "detail": json.dumps(b["operations"]),
                    "flow_type": "",
                    "value": -1,
                    "gas": -1,
                }
            )
        for e2 in parse_dcfg_edges(result, txh):
            rows.append(
                {
                    "kind": "edge",
                    "transaction_hash": txh,
                    "contract_address": e2["address_from"],
                    "start_pc": e2["start_pc_from"],
                    "detail": json.dumps(
                        {
                            "to": e2["address_to"],
                            "start_pc_to": e2["start_pc_to"],
                            "selector": e2["selector"],
                            "index": e2["index"],
                        },
                        sort_keys=True,
                    ),
                    "flow_type": e2["flow_type"],
                    "value": e2["value"],
                    "gas": e2["gas"],
                }
            )
    schema = pa.schema(
        [
            ("kind", pa.string()),
            ("transaction_hash", pa.string()),
            ("contract_address", pa.string()),
            ("start_pc", pa.int64()),
            ("detail", pa.string()),
            ("flow_type", pa.string()),
            ("value", pa.int64()),
            ("gas", pa.int64()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)
