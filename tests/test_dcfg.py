"""DCFG trace shaping (functions/dcfg.py) vs reference
middlewares/trans/dcfg.py:189-222 semantics."""

import json


def _trace():
    return {
        "blocks": [
            {"contract_address": "0xaaa", "start_pc": 0,
             "operations": [0x5B, 0x60, 0x0C, 0xF1]},   # 0x0c is not an opcode
            {"contract_address": "0xbbb", "start_pc": 77,
             "operations": [0x5B, 0xF3]},
        ],
        "edges": [
            {"from": 0, "to": 1, "type": 0xF1, "value": 5, "gas": 100,
             "selector": "0xdeadbeef", "index": 2},
            {"from": 1, "to": 0, "type": 0xF3},  # defaults: value/gas -1, selector 0x
        ],
    }


def test_block_items_drop_unknown_opcodes():
    from blockchainspider_ray.functions.dcfg import parse_dcfg_blocks

    items = parse_dcfg_blocks(_trace(), "TXX")
    assert items[0]["operations"] == ["JUMPDEST", "PUSH1", "CALL"]
    assert items[1] == {
        "transaction_hash": "TXX",
        "contract_address": "0xbbb",
        "start_pc": 77,
        "operations": ["JUMPDEST", "RETURN"],
    }


def test_edge_items_resolve_block_indices_and_defaults():
    from blockchainspider_ray.functions.dcfg import parse_dcfg_edges

    items = parse_dcfg_edges(_trace(), "TXX")
    e0, e1 = items
    assert e0["address_from"] == "0xaaa" and e0["address_to"] == "0xbbb"
    assert e0["start_pc_from"] == 0 and e0["start_pc_to"] == 77
    assert e0["flow_type"] == "CALL" and e0["value"] == 5 and e0["gas"] == 100
    assert e0["selector"] == "0xdeadbeef" and e0["index"] == 2
    assert e1["flow_type"] == "RETURN"
    assert e1["value"] == -1 and e1["gas"] == -1 and e1["selector"] == "0x" and e1["index"] == 0


def test_opcode_table_spotchecks():
    from blockchainspider_ray.functions.dcfg import NUM2OP_NAME

    assert NUM2OP_NAME[0x60] == "PUSH1" and NUM2OP_NAME[0x7F] == "PUSH32"
    assert NUM2OP_NAME[0x80] == "DUP1" and NUM2OP_NAME[0x9F] == "SWAP16"
    assert NUM2OP_NAME[0xA0] == "LOG0" and NUM2OP_NAME[0xA4] == "LOG4"
    assert NUM2OP_NAME[0xF5] == "CREATE2" and NUM2OP_NAME[0xFA] == "STATICCALL"
    assert 0x0C not in NUM2OP_NAME


def test_dcfg_stage_and_query(ray_session):
    import pyarrow as pa

    from blockchainspider_ray.functions.dcfg import dcfg_stage
    from blockchainspider_ray.pipelines.queries import q_dcfg_parse

    batch = pa.table(
        {
            "transaction_hash": pa.array(["TXX"], pa.string()),
            "payload": pa.array([json.dumps({"result": _trace()})], pa.string()),
        }
    )
    out = dcfg_stage(batch)
    assert out.num_rows == 4  # 2 blocks + 2 edges
    kinds = out.column("kind").to_pylist()
    assert kinds.count("block") == 2 and kinds.count("edge") == 2
    # null result skipped
    empty = dcfg_stage(
        pa.table(
            {
                "transaction_hash": pa.array(["T"], pa.string()),
                "payload": pa.array([json.dumps({"result": None})], pa.string()),
            }
        )
    )
    assert empty.num_rows == 0

    df = q_dcfg_parse("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert (df.groupby("transaction_hash")["kind"].count() == 4).all()
    df2 = q_dcfg_parse("/root/testdata/sf0.001").to_pandas()
    assert df.equals(df2)
