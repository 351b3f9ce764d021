"""Etl query pipelines (split from queries.py).


Cross-family dependencies are explicit function-local imports at their
use sites (no import cycles, no post-load name injection).
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403



def q_extract_entities(sf_dir: str):
    """ETH-address entity regex over the synth html (reference web.py:105-109)."""

    def ext(b: pa.Table) -> pa.Table:
        ids, ents = [], []
        for i, h in zip(b.column("doc_id").to_pylist(), b.column("html").to_pylist()):
            for m in _RE_ETH_Q.findall(h):
                ids.append(i)
                ents.append(m)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "entity": pa.array(ents, pa.string())})

    return _docs_html_ds(sf_dir).map_batches(ext, batch_format="pyarrow").sort("doc_id")


def q_validated_entities(sf_dir: str):
    """Checksum-VALIDATED entity extraction (reference web.py:94-109: BTC
    candidates pass base58check via ``bitcoin.is_address``, ETH candidates
    pass ``Web3.isAddress`` incl. EIP-55).  Per doc, four deterministic
    candidates enter validation: the extracted ETH address in EIP-55 form
    (valid), a case-corrupted EIP-55 form (invalid), a constructed
    base58check BTC address (valid), and its last-char corruption
    (invalid) — the survivors are exactly the valid half.  Rows-only: no
    SQL mirror (keccak/base58 aren't DuckDB-expressible); pinned in
    tests/test_text.py."""
    import hashlib as _hl

    from ..functions.checksums import (
        btc_address_from_hash160,
        eth_checksum_address,
        is_btc_address,
        is_eth_address,
    )

    def ext(b: pa.Table) -> pa.Table:
        ids, nets, addrs = [], [], []
        for i, h in zip(b.column("doc_id").to_pylist(), b.column("html").to_pylist()):
            cands = []
            for m in _RE_ETH_Q.findall(h):
                good = eth_checksum_address(m.lower())
                cands.append(("ETH", good))
                # flip the case of the first letter -> EIP-55 invalid
                body = list(good[2:])
                for j, ch in enumerate(body):
                    if ch.isalpha():
                        body[j] = ch.lower() if ch.isupper() else ch.upper()
                        cands.append(("ETH", "0x" + "".join(body)))
                        break
            btc_good = btc_address_from_hash160(_hl.md5(f"btc-{i}".encode()).digest()[:4] * 5)
            btc_bad = btc_good[:-1] + ("2" if btc_good[-1] != "2" else "3")
            cands += [("BTC", btc_good), ("BTC", btc_bad)]
            for net, a in cands:
                ok = is_btc_address(a) if net == "BTC" else is_eth_address(a)
                if ok:
                    ids.append(i)
                    nets.append(net)
                    addrs.append(a)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "net": pa.array(nets, pa.string()),
                "address": pa.array(addrs, pa.string()),
            }
        )

    return (
        _docs_html_ds(sf_dir)
        .map_batches(ext, batch_format="pyarrow")
        .sort(["doc_id", "net", "address"])
    )


def q_transfer_normalize(sf_dir: str):
    """The etherscan-transfer normalizer (reference external.py:121-148):
    lowercase parties, zero-address fill, md5 identity id."""
    from ..functions.etl import normalize_transfers

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def raw(b: pa.Table) -> pa.Table:
        eids = b.column("event_id").to_numpy()
        uids = b.column("user_id").to_numpy()
        vals = b.column("value").to_numpy()
        return pa.table(
            {
                "from": pa.array(
                    [None if u % 7 == 0 else f"0xUSER{u}" for u in uids], pa.string()
                ),
                "to": pa.array([f"0xPeer{(u * 13 + e) % 50}" for u, e in zip(uids, eids)], pa.string()),
                "value": pa.array([f"{v:.2f}" for v in vals], pa.string()),
                "hash": pa.array([f"TX{e}" for e in eids], pa.string()),
            }
        )

    return ds.map_batches(raw, batch_format="pyarrow").map_batches(
        normalize_transfers, batch_format="pyarrow"
    ).sort("id")


def q_receipt_join(sf_dir: str):
    """Receipt->transaction enrichment join (reference
    middlewares/trans/receipt.py:80-137: per-block dict join on
    transaction_hash, hex fields decoded, is_error = status != '0x1',
    receipts without a known transaction dropped).  Both sides synthesize
    deterministically from events; the join runs co-located per block via
    groupby(block_number).map_groups — the reference's per-block
    txhash2transaction dict, distributed."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def synth(b: pa.Table) -> pa.Table:
        eids = b.column("event_id").to_numpy()
        secs = (
            b.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
            // 1_000_000
        )
        kinds, hashes, blocks, tss, tidx, ttype, gas, price, status, contract = (
            [], [], [], [], [], [], [], [], [], []
        )
        for e, t in zip(eids.tolist(), secs.tolist()):
            kinds.append("tx")
            hashes.append(f"TX{e}")
            blocks.append(e % 97)
            tss.append(t)
            tidx.append(None)
            ttype.append(None)
            gas.append(None)
            price.append(None)
            status.append(None)
            contract.append(None)
            if e % 5 != 4:  # ~20% of txs lack receipts -> inner-join drop
                kinds.append("receipt")
                hashes.append(f"TX{e}")
                blocks.append(e % 97)
                tss.append(None)
                tidx.append(hex(e % 200))
                ttype.append(hex(e % 3))
                gas.append(hex(21000 + e % 1000))
                price.append(hex(10**9 + e))
                status.append("0x1" if e % 11 else "0x0")
                contract.append(f"0xcon{e}" if e % 13 == 0 else None)
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "transaction_hash": pa.array(hashes, pa.string()),
                "block_number": pa.array(blocks, pa.int64()),
                "timestamp": pa.array(tss, pa.int64()),
                "transaction_index": pa.array(tidx, pa.string()),
                "transaction_type": pa.array(ttype, pa.string()),
                "gas_used": pa.array(gas, pa.string()),
                "effective_gas_price": pa.array(price, pa.string()),
                "status": pa.array(status, pa.string()),
                "contract_address": pa.array(contract, pa.string()),
            }
        )

    def join_block(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        hashes = g.column("transaction_hash").to_pylist()
        ts_col = g.column("timestamp").to_pylist()
        # the reference's txhash2transaction dict, per block
        tx_ts = {h: t for k, h, t in zip(kinds, hashes, ts_col) if k == "tx"}
        out = {
            "transaction_hash": [], "block_number": [], "timestamp": [],
            "transaction_index": [], "transaction_type": [], "gas_used": [],
            "effective_gas_price": [], "is_error": [], "created_contract": [],
        }
        block = g.column("block_number")[0].as_py()
        for i, k in enumerate(kinds):
            if k != "receipt":
                continue
            t = tx_ts.get(hashes[i])
            if t is None:
                continue
            out["transaction_hash"].append(hashes[i])
            out["block_number"].append(block)
            out["timestamp"].append(t)
            out["transaction_index"].append(int(g.column("transaction_index")[i].as_py(), 16))
            out["transaction_type"].append(int(g.column("transaction_type")[i].as_py(), 16))
            out["gas_used"].append(int(g.column("gas_used")[i].as_py(), 16))
            out["effective_gas_price"].append(int(g.column("effective_gas_price")[i].as_py(), 16))
            out["is_error"].append(g.column("status")[i].as_py() != "0x1")
            cc = g.column("contract_address")[i].as_py()
            out["created_contract"].append(cc if cc else "")
        return pa.table(
            {
                "transaction_hash": pa.array(out["transaction_hash"], pa.string()),
                "block_number": pa.array(out["block_number"], pa.int64()),
                "timestamp": pa.array(out["timestamp"], pa.int64()),
                "transaction_index": pa.array(out["transaction_index"], pa.int64()),
                "transaction_type": pa.array(out["transaction_type"], pa.int64()),
                "gas_used": pa.array(out["gas_used"], pa.int64()),
                "effective_gas_price": pa.array(out["effective_gas_price"], pa.int64()),
                "is_error": pa.array(out["is_error"], pa.bool_()),
                "created_contract": pa.array(out["created_contract"], pa.string()),
            }
        )

    return (
        ds.map_batches(synth, batch_format="pyarrow")
        .groupby("block_number")
        .map_groups(join_block, batch_format="pyarrow")
        .sort("transaction_hash")
    )


def q_solana_block_parse(sf_dir: str, key_mod: "int | None" = None):
    """Solana getBlock 8-type fan-out (reference spiders/trans/solana/
    blocks.py:167-402): block header, transactions (fee / err-key /
    compute truthiness quirks), token + native balance diffs, logs, and
    the four parsed-instruction classes incl. inner instructions with
    multilevel trace ids.  One deterministic getBlock payload per event
    row; parse runs vectorized over payload batches
    (functions/solana.py).  Rows-only: multilevel ids and JSON fan-out
    have no SQL mirror; hand-derived pins live in tests/test_solana.py.

    ``key_mod`` applies a signature key-list predicate BEFORE payload
    synthesis and parse (q_solana_tx_lookup now drives the dedicated
    getTransaction-envelope reader instead; the parameter stays for the
    filtered-block form)."""
    import json as _json

    from ..functions.solana import solana_blocks_stage

    ds = _read(sf_dir, "events", columns=["event_id"])
    if key_mod is not None:
        from ..stages.dedup import _stable_h64

        def keep(b: pa.Table) -> pa.Table:
            ids = b.column("event_id").to_pylist()
            mask = pa.array(
                [_stable_h64(f"SIG{e}") % key_mod == 0 for e in ids], pa.bool_()
            )
            return b.filter(mask)

        ds = ds.map_batches(keep, batch_format="pyarrow")

    def synth(b: pa.Table) -> pa.Table:
        heights, payloads = [], []
        for e in b.column("event_id").to_pylist():
            tx = _synth_solana_tx(e)
            result = {
                "blockTime": 1_700_000_000 + e,
                "blockhash": f"BH{e}",
                "parentSlot": e - 1,
                "previousBlockhash": f"BH{e - 1}",
                "transactions": [tx],
            }
            heights.append(e)
            payloads.append(_json.dumps({"result": result}))
        return pa.table(
            {
                "block_height": pa.array(heights, pa.int64()),
                "payload": pa.array(payloads, pa.string()),
            }
        )

    return (
        ds.map_batches(synth, batch_format="pyarrow")
        .map_batches(solana_blocks_stage, batch_format="pyarrow")
        .sort(["block_height", "item_type", "trace_id", "signature"])
    )


def _synth_solana_tx(e: int) -> dict:
    """Deterministic per-event getBlock/getTransaction transaction dict —
    shared by the block reader (q_solana_block_parse wraps it in a block
    result) and the by-signature reader (q_solana_tx_lookup puts
    slot/blockTime on the envelope, the getTransaction shape)."""
    if True:
            tx = {
                "transaction": {
                    "signatures": [f"SIG{e}"],
                    "message": {
                        "accountKeys": [
                            {"pubkey": f"ACC{e}_0"},
                            {"pubkey": f"ACC{e}_1"},
                            {"pubkey": f"ACC{e}_2"},
                        ],
                        "recentBlockhash": f"RBH{e}",
                        "instructions": [
                            {
                                "programId": "TOKENPROG",
                                "program": "spl-token",
                                "parsed": {"type": "transfer", "info": {"amount": str(e)}},
                            },
                            (
                                {
                                    "programId": "VOTEPROG",
                                    "program": "vote",
                                    "parsed": {"type": "vote", "info": {"slot": e}},
                                }
                                if e % 2
                                else {"programId": "RAWPROG", "data": f"D{e}", "accounts": [0, 1]}
                            ),
                            {
                                "programId": "MEMOPROG",
                                "program": "spl-memo",
                                "parsed": f"memo {e}",
                            },
                        ],
                    },
                },
                "version": "legacy" if e % 2 else 0,
                "meta": {
                    "err": {"InstructionError": []} if e % 7 == 0 else None,
                    "fee": 5000 + e % 100,
                    "computeUnitsConsumed": e % 1000,
                    "preBalances": [100, 50, 0],
                    "postBalances": [100 - (e % 3), 50, e % 3],
                    "preTokenBalances": [
                        {
                            "accountIndex": 1,
                            "mint": f"MINT{e % 5}",
                            "owner": f"OWN{e}",
                            "programId": "TOKENPROG",
                            "uiTokenAmount": {"amount": str(10 + e % 4), "decimals": 6},
                        }
                    ],
                    "postTokenBalances": [
                        {
                            "accountIndex": 1,
                            "mint": f"MINT{e % 5}",
                            "owner": f"OWN{e}",
                            "programId": "TOKENPROG",
                            "uiTokenAmount": {"amount": "10", "decimals": 6},
                        }
                    ],
                    "logMessages": [f"log {e} a", f"log {e} b"],
                    "innerInstructions": [
                        {
                            "index": 1,
                            "instructions": [
                                {
                                    "programId": "P1",
                                    "stackHeight": 2,
                                    "program": "spl-token",
                                    "parsed": {"type": "transferChecked", "info": {"n": e}},
                                },
                                {"programId": "P2", "stackHeight": 3, "data": "zz"},
                                {
                                    "programId": "P3",
                                    "stackHeight": 3,
                                    "program": "system",
                                    "parsed": {"type": "createAccount", "info": {}},
                                },
                                {
                                    "programId": "P4",
                                    "stackHeight": 2,
                                    "program": "vote",
                                    "parsed": {"type": "compactupdatevotestate", "info": {}},
                                },
                            ],
                        }
                    ],
                },
            }
            return tx


def q_solana_tx_lookup(sf_dir: str):
    """Solana tx-by-signature reader (reference spiders/trans/solana/
    trans.py:16-84, SolanaTransactionSpider: user-supplied signature list
    -> per-signature getTransaction -> the same item fan-out as the block
    spider).  The deterministic key-list stand-in is md5(signature) % 37
    == 0, applied BEFORE payload synthesis (only requested transactions
    are ever fetched); each selected signature becomes ONE getTransaction
    envelope (blockTime/slot on the envelope, trans.py:76-80) parsed by
    functions/solana.parse_solana_transaction — the true key-list regime,
    no block wrapper anywhere.  Rows are byte-identical to
    q_solana_block_parse's per-transaction subset (tests/test_solana.py)."""
    import json as _json

    from ..functions.solana import solana_transactions_stage
    from ..stages.dedup import _stable_h64

    ds = _read(sf_dir, "events", columns=["event_id"])

    def keep(b: pa.Table) -> pa.Table:
        ids = b.column("event_id").to_pylist()
        mask = pa.array(
            [_stable_h64(f"SIG{e}") % 37 == 0 for e in ids], pa.bool_()
        )
        return b.filter(mask)

    def synth_tx(b: pa.Table) -> pa.Table:
        sigs, payloads = [], []
        for e in b.column("event_id").to_pylist():
            env = dict(_synth_solana_tx(e))
            env["slot"] = e
            env["blockTime"] = 1_700_000_000 + e
            sigs.append(f"SIG{e}")
            payloads.append(_json.dumps({"result": env}))
        return pa.table(
            {
                "signature": pa.array(sigs, pa.string()),
                "payload": pa.array(payloads, pa.string()),
            }
        )

    return (
        ds.map_batches(keep, batch_format="pyarrow")
        .map_batches(synth_tx, batch_format="pyarrow")
        .map_batches(solana_transactions_stage, batch_format="pyarrow")
        .sort(["block_height", "item_type", "trace_id", "signature"])
    )


def q_tron_block_parse(sf_dir: str):
    """Tron walletsolidity/getblock + eth_getLogs parse (reference
    spiders/trans/tron/blocks.py:52-135): per block one TronTransactionItem
    per tx (txID, index, header version/timestamp) and one EventLogItem per
    log (hex-decoded index/number, lowercased address, the block's
    timestamp attached) — flattened to a discriminated union."""
    import json as _json

    ds = _read(sf_dir, "events", columns=["event_id"])

    def synth_and_parse(b: pa.Table) -> pa.Table:
        kinds, hashes, idxs, blocks, vers, tss, addrs, bhashes = (
            [], [], [], [], [], [], [], []
        )
        for e in b.column("event_id").to_pylist():
            block_payload = {
                "blockID": f"BID{e}",
                "block_header": {
                    "raw_data": {"version": e % 5, "timestamp": 1_600_000_000 + e}
                },
                "transactions": [
                    {"txID": f"TTX{e}_{j}", "raw_data": {"contract_type": j}}
                    for j in range(1 + e % 3)
                ],
            }
            logs_payload = {
                "result": [
                    {
                        "transactionHash": f"TTX{e}_0",
                        "logIndex": hex(e % 7),
                        "blockNumber": hex(e),
                        "address": f"0xTADDR{e % 9}",
                        "topics": [],
                        "data": "0x",
                        "removed": False,
                    }
                ]
            }
            # parse exactly as the reference callbacks do
            result = _json.loads(_json.dumps(block_payload))
            block_hash = result.get("blockID", "")
            header = result.get("block_header", {}).get("raw_data", {})
            version = header.get("version", -1)
            ts = header.get("timestamp", -1)
            for i, tx in enumerate(result.get("transactions", [])):
                kinds.append("tx")
                hashes.append(tx.get("txID", ""))
                idxs.append(i)
                blocks.append(e)
                vers.append(version)
                tss.append(ts)
                addrs.append("")
                bhashes.append(block_hash)
            for log in _json.loads(_json.dumps(logs_payload)).get("result") or []:
                kinds.append("log")
                hashes.append(log.get("transactionHash", ""))
                idxs.append(int(log.get("logIndex"), 16))
                blocks.append(int(log.get("blockNumber"), 16))
                vers.append(-1)
                tss.append(ts)
                addrs.append(log.get("address", "").lower())
                bhashes.append("")
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "transaction_hash": pa.array(hashes, pa.string()),
                "idx": pa.array(idxs, pa.int64()),
                "block_number": pa.array(blocks, pa.int64()),
                "block_version": pa.array(vers, pa.int64()),
                "timestamp": pa.array(tss, pa.int64()),
                "address": pa.array(addrs, pa.string()),
                "block_hash": pa.array(bhashes, pa.string()),
            }
        )

    return ds.map_batches(synth_and_parse, batch_format="pyarrow").sort(
        ["transaction_hash", "kind", "idx"]
    )


def q_dcfg_parse(sf_dir: str):
    """DCFG trace shaping (reference middlewares/trans/dcfg.py:189-222):
    tracer JSON -> block items (opcode mnemonics, unknown nums dropped) +
    edge items (block-index resolution, flow_type mnemonic, value/gas
    defaults).  One deterministic trace per event; rows-only (pinned in
    tests/test_dcfg.py — the JS tracer half is server-side and out of
    scope)."""
    import json as _json

    from ..functions.dcfg import dcfg_stage

    ds = _read(sf_dir, "events", columns=["event_id"])

    def synth(b: pa.Table) -> pa.Table:
        txs, payloads = [], []
        for e in b.column("event_id").to_pylist():
            blocks = [
                {
                    "contract_address": f"0xc{e % 7}",
                    "start_pc": 0,
                    # JUMPDEST, PUSH1, MSTORE, unknown 0x0c (dropped), CALL
                    "operations": [0x5B, 0x60, 0x52, 0x0C, 0xF1],
                },
                {
                    "contract_address": f"0xc{(e + 1) % 7}",
                    "start_pc": 64 + e % 32,
                    "operations": [0x5B, 0x54, 0xF3],
                },
            ]
            edges = [
                {"from": 0, "to": 1, "type": 0xF1, "value": e % 100, "gas": 21000 + e % 50,
                 "selector": f"0x{(e * 2654435761) % (1 << 32):08x}", "index": 0},
                {"from": 1, "to": 0, "type": 0xF3},
            ]
            txs.append(f"TX{e}")
            payloads.append(_json.dumps({"result": {"blocks": blocks, "edges": edges}}))
        return pa.table(
            {
                "transaction_hash": pa.array(txs, pa.string()),
                "payload": pa.array(payloads, pa.string()),
            }
        )

    return (
        ds.map_batches(synth, batch_format="pyarrow")
        .map_batches(dcfg_stage, batch_format="pyarrow")
        .sort(["transaction_hash", "kind", "start_pc"])
    )


def q_token_decode(sf_dir: str):
    """Token-event decoding: dispatch on topics[0], word->address, hex->dec
    (reference middlewares/trans/token.py:35-236, utils/web3.py:74-102)."""
    from ..functions.etl import (
        TOPIC_APPROVAL,
        TOPIC_TRANSFER,
        decode_token_events,
    )

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def synth_logs(b: pa.Table) -> pa.Table:
        eids = b.column("event_id").to_numpy()
        uids = b.column("user_id").to_numpy()
        topics, datas, hashes, lis = [], [], [], []
        for e, u in zip(eids, uids):
            a_from = hashlib.md5(str(u).encode()).hexdigest()
            a_to = hashlib.md5(str((u * 13 + e) % 50).encode()).hexdigest()
            t0 = (
                TOPIC_TRANSFER
                if e % 3 == 0
                else TOPIC_APPROVAL
                if e % 3 == 1
                else "0x" + "de" * 32
            )
            topics.append(
                [
                    t0,
                    "0x" + "0" * 24 + a_from + a_from[:8],
                    "0x" + "0" * 24 + a_to + a_to[:8],
                ]
            )
            datas.append(f"0x{e * 3 + 5:x}")
            hashes.append(f"TX{e}")
            lis.append(int(e))
        return pa.table(
            {
                "hash": pa.array(hashes, pa.string()),
                "log_index": pa.array(lis, pa.int64()),
                "topics": pa.array(topics, pa.list_(pa.string())),
                "data": pa.array(datas, pa.string()),
            }
        )

    return (
        ds.map_batches(synth_logs, batch_format="pyarrow")
        .map_batches(decode_token_events, batch_format="pyarrow")
        .sort("log_index")
    )


def q_trace_flatten(sf_dir: str):
    """Trace-tree flattening: recursive callTracer JSON -> rows with
    trace_id='depth_order' (reference middlewares/trans/trace.py:62-125)."""
    import json as _json

    from ..functions.etl import flatten_traces_batch

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def synth_traces(b: pa.Table) -> pa.Table:
        keys = b.column("o_orderkey").to_numpy()
        hashes, jsons = [], []
        for k in keys:
            k = int(k)
            trace = {
                "type": "CALL",
                "from": f"0xfrom{k}",
                "to": f"0xto{k}",
                "value": f"0x{k * 2:x}",
                "calls": [
                    {
                        "type": "STATICCALL",
                        "from": f"0xto{k}",
                        "to": f"0xc1{k}",
                        "value": f"0x{k * 3:x}",
                        "calls": [
                            {
                                "type": "DELEGATECALL",
                                "from": f"0xc1{k}",
                                "to": f"0xg{k}",
                                "value": f"0x{k * 5:x}",
                            }
                        ],
                    },
                    {
                        "type": "CALL",
                        "from": f"0xto{k}",
                        "to": f"0xc2{k}",
                        "value": f"0x{k * 7:x}",
                    },
                ],
            }
            hashes.append(f"T{k}")
            jsons.append(_json.dumps(trace))
        return pa.table(
            {"hash": pa.array(hashes, pa.string()), "trace_json": pa.array(jsons, pa.string())}
        )

    return (
        ds.map_batches(synth_traces, batch_format="pyarrow")
        .map_batches(flatten_traces_batch, batch_format="pyarrow")
        .sort(["transaction_hash", "trace_id"])
    )


def q_parse_props(sf_dir: str):
    """JSON side-band parse + aggregate (reference json payload parsing,
    external.py:115; nested JSON columns SURVEY.md §1.2)."""
    from ..functions.etl import parse_json_props

    ds = _read(sf_dir, "events", columns=["event_type", "props"])
    agg = (
        ds.map_batches(parse_json_props, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Mean("props_k", alias_name="mean_k"), Count(alias_name="n"))
    )
    return agg.map_batches(lambda b: _round_col(b, "mean_k", 4), batch_format="pyarrow").sort(
        "event_type"
    )


def q_xml_labels(sf_dir: str):
    """OFAC-style XML entry parse: xml payload -> one row per (uid, name,
    program) (reference spiders/labels/ofac.py:22-78 xpath walk; here
    ElementTree over a synthesized sdnEntry payload)."""
    import xml.etree.ElementTree as ET

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth_xml(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        xmls = [
            (
                f"<sdnEntry><uid>{d}</uid><firstName>F{d}</firstName>"
                f"<lastName>L{d}</lastName><programList>"
                f"<program>P{d % 4}</program><program>Q{d % 3}</program>"
                "</programList></sdnEntry>"
            )
            for d in ids
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "xml": pa.array(xmls, pa.string())}
        )

    def parse_xml(b: pa.Table) -> pa.Table:
        uids, names, progs = [], [], []
        for x in b.column("xml").to_pylist():
            root = ET.fromstring(x)
            uid = int(root.findtext("uid"))
            name = f"{root.findtext('firstName')} {root.findtext('lastName')}"
            for p in root.find("programList").findall("program"):
                uids.append(uid)
                names.append(name)
                progs.append(p.text)
        return pa.table(
            {
                "uid": pa.array(uids, pa.int64()),
                "name": pa.array(names, pa.string()),
                "program": pa.array(progs, pa.string()),
            }
        )

    return (
        docs.map_batches(synth_xml, batch_format="pyarrow")
        .map_batches(parse_xml, batch_format="pyarrow")
        .sort(["uid", "program"])
    )


def q_block_parse(sf_dir: str):
    """EVM-style block ETL: nested block JSON -> one row per transaction
    (reference spiders/trans/evm/blocks.py:200-241 parse).  Blocks are
    synthesized from orders (one block per 10 orderkeys)."""
    import json as _json

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def synth_blocks(b: pa.Table) -> pa.Table:
        rows = {}
        for k, c, p in zip(
            b.column("o_orderkey").to_pylist(),
            b.column("o_custkey").to_pylist(),
            b.column("o_totalprice").to_pylist(),
        ):
            blk = int(k) // 10
            rows.setdefault(blk, []).append(
                {
                    "hash": f"0xtx{k}",
                    "from": f"0xa{c}",
                    "to": f"0xb{(c * 7) % 1500}",
                    "value": hex(int(p * 100)),
                    "index": int(k) % 10,
                }
            )
        blks = sorted(rows)
        return pa.table(
            {
                "block_number": pa.array(blks, pa.int64()),
                "block_json": pa.array(
                    [
                        _json.dumps({"number": hex(blk), "transactions": rows[blk]})
                        for blk in blks
                    ],
                    pa.string(),
                ),
            }
        )

    def parse_block(b: pa.Table) -> pa.Table:
        from ..functions.etl import hex_to_dec

        out = {k: [] for k in ("block_number", "tx_hash", "tx_index", "from_addr", "to_addr", "value")}
        for bj in b.column("block_json").to_pylist():
            blk = _json.loads(bj)
            num = hex_to_dec(blk["number"])
            for tx in blk["transactions"]:
                out["block_number"].append(num)
                out["tx_hash"].append(tx["hash"])
                out["tx_index"].append(tx["index"])
                out["from_addr"].append(tx["from"].lower())
                out["to_addr"].append(tx["to"].lower())
                out["value"].append(hex_to_dec(tx["value"]))
        return pa.table(
            {
                "block_number": pa.array(out["block_number"], pa.int64()),
                "tx_hash": pa.array(out["tx_hash"], pa.string()),
                "tx_index": pa.array(out["tx_index"], pa.int64()),
                "from_addr": pa.array(out["from_addr"], pa.string()),
                "to_addr": pa.array(out["to_addr"], pa.string()),
                "value": pa.array(out["value"], pa.int64()),
            }
        )

    return (
        ds.map_batches(synth_blocks, batch_format="pyarrow")
        .map_batches(parse_block, batch_format="pyarrow")
        .sort(["block_number", "tx_index"])
    )


def q_utxo_edges(sf_dir: str):
    """UTXO input/output edge fan-out: one synthetic tx per event, inputs
    and outputs emitted as signed edge rows (reference blockchaininfo
    TransactionMiddleware.parse_transaction, transaction.py:69-112)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def fan_out(b: pa.Table) -> pa.Table:
        tx, addr, direction, val = [], [], [], []
        for e, u, v in zip(
            b.column("event_id").to_pylist(),
            b.column("user_id").to_pylist(),
            b.column("value").to_pylist(),
        ):
            t = f"utx{e}"
            # one input from the user, two outputs (payee + change);
            # _r = DuckDB ROUND semantics (half away from zero)
            tx.append(t); addr.append(f"addr{u}"); direction.append("in"); val.append(float(_r(v, 2)))
            tx.append(t); addr.append(f"addr{(u * 13 + e) % 50}"); direction.append("out"); val.append(float(_r(v * 0.6, 2)))
            tx.append(t); addr.append(f"addr{u}"); direction.append("out"); val.append(float(_r(v * 0.4, 2)))
        return pa.table(
            {
                "tx": pa.array(tx, pa.string()),
                "addr": pa.array(addr, pa.string()),
                "direction": pa.array(direction, pa.string()),
                "value": pa.array(val, pa.float64()),
            }
        )

    return ds.map_batches(fan_out, batch_format="pyarrow").sort(["tx", "direction", "addr", "value"])


def q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source round-trip (the lingua franca format of LLM
    data pipelines): write the documents projection to line-delimited
    JSON with ``Dataset.write_json`` (one shard per task — resumable,
    never one giant file), read it back with ``ray.data.read_json``, and
    aggregate per lang — proving values survive the codec.  The oracle
    aggregates the original parquet directly."""
    import shutil
    import uuid

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    d = f"/tmp/bsr_jsonl_{uuid.uuid4().hex[:8]}"
    docs.write_json(d)
    try:
        back = ray.data.read_json(d)
        agg = (
            back.groupby("lang")
            .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="total_chars"))
            .sort("lang")
            .to_pandas()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return agg


def q_readability(sf_dir: str):
    """Flesch-Kincaid-style readability features per doc: word count,
    vowel-group syllable estimate, syllables-per-word, and the FK grade
    formula (sentence count := 1 — the synthetic corpus has no terminal
    punctuation; docstring-honest, and the [aeiou]+ vowel-group heuristic
    is the classic cheap syllable counter).  Because tokens are space-
    separated and spaces contain no vowels, the per-word vowel-group sum
    equals ONE vectorized regex count over the whole text — both counts
    are single pyarrow count_substring_regex kernels, no Python loop, no
    shuffle."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(b: pa.Table) -> pa.Table:
        nw = pc.count_substring_regex(b.column("text"), r"\S+").to_numpy().astype(np.int64)
        ns = pc.count_substring_regex(b.column("text"), "[aeiou]+").to_numpy().astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            spw = np.where(nw > 0, ns * 1.0 / np.maximum(nw, 1), np.nan)
            fk = np.where(
                nw > 0, 0.39 * nw + 11.8 * (ns * 1.0 / np.maximum(nw, 1)) - 15.59, np.nan
            )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_words": pa.array(nw, pa.int64()),
                "n_syllables": pa.array(ns, pa.int64()),
                "syll_per_word": pa.array(_r(spw, 6), pa.float64()),
                "fk_grade": pa.array(_r(fk, 6), pa.float64()),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow").sort("doc_id")


def q_table_checksum(sf_dir: str):
    """Order-independent per-bucket table fingerprints of the events
    stream: rows hash as md5-low64 of 'event_id|user_id|event_type',
    buckets = event_id % 8, per-bucket checksum = the SUM of row hashes
    mod 2^64 plus the row count — the merge-safe partition checksum a
    resumable 100-TB ingest stores next to each output shard so a
    re-run can verify (or skip) finished partitions without re-reading
    order-sensitively.  Shape: pure map + one 8-cell groupby; checksums
    combine associatively so any partitioning gives identical digests."""
    from ..stages.dedup import _stable_h64

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def rowhash(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        uid = b.column("user_id").to_numpy()
        et = b.column("event_type").to_pylist()
        hs = np.array(
            [
                _stable_h64(f"{int(e)}|{int(u)}|{t}")
                for e, u, t in zip(eid, uid, et)
            ],
            dtype=np.uint64,
        )
        # split into 32-bit halves so partial sums stay inside int64
        df = pd.DataFrame(
            {
                "bucket": (eid % 8).astype(np.int64),
                "lo": (hs & np.uint64(0xFFFFFFFF)).astype(np.int64),
                "hi": (hs >> np.uint64(32)).astype(np.int64),
            }
        )
        g = df.groupby("bucket", as_index=False).agg(
            slo=("lo", "sum"), shi=("hi", "sum"), n=("lo", "size")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ev.map_batches(rowhash, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("slo"), Sum("shi"), Sum("n"))
        .to_pandas()
        .rename(columns={"sum(slo)": "slo", "sum(shi)": "shi", "sum(n)": "n_rows"})
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # recombine halves with python bigints, then wrap mod 2^64
    out["checksum"] = [
        (int(lo) + (int(hi) << 32)) % (1 << 64)
        for lo, hi in zip(out["slo"], out["shi"])
    ]
    out["bucket"] = out["bucket"].astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    # emit as decimal string: the driver hash-compare is type-stable on text
    out["checksum"] = out["checksum"].astype(str)
    return out[["bucket", "n_rows", "checksum"]]


def q_split_half_reliability(sf_dir: str):
    """Split-half reliability of the unique-token-ratio quality signal:
    score each doc's odd-indexed and even-indexed token halves
    separately, Pearson-correlate the halves across docs (centered
    two-pass), and apply the Spearman-Brown step-up 2r/(1+r) — the
    measurement-theory check that says whether a noisy per-doc signal
    is stable enough to threshold on.  Shape: one tokenize pass emits
    (a, b) per doc; the correlation is the corr_matrix sufficient-stats
    combiner; O(1) cells reach the driver."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def halves(b: pa.Table) -> pa.Table:
        av, bv = [], []
        for t in b.column("text").to_pylist():
            toks = _oracle_tokens(t)
            ev, od = toks[0::2], toks[1::2]
            av.append(len(set(ev)) / len(ev) if ev else 0.0)
            bv.append(len(set(od)) / len(od) if od else 0.0)
        return pa.table(
            {
                "a": pa.array(av, pa.float64()),
                "b": pa.array(bv, pa.float64()),
            }
        )

    hd = docs.map_batches(halves, batch_format="pyarrow").materialize()
    t = hd.aggregate(Sum("a"), Sum("b"), Count())
    n = float(t["count()"])
    ma, mb = float(t["sum(a)"]) / n, float(t["sum(b)"]) / n

    def centered(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy() - ma
        bb = b.column("b").to_numpy() - mb
        return pa.table(
            {
                "saa": pa.array([float((a * a).sum())], pa.float64()),
                "sbb": pa.array([float((bb * bb).sum())], pa.float64()),
                "sab": pa.array([float((a * bb).sum())], pa.float64()),
            }
        )

    s = hd.map_batches(centered, batch_format="pyarrow").sum(["saa", "sbb", "sab"])
    den = float(np.sqrt(s["sum(saa)"] * s["sum(sbb)"]))
    r = float(s["sum(sab)"]) / den if den > 0 else float("nan")
    sb = 2.0 * r / (1.0 + r) if r == r and r > -1 else float("nan")
    return pd.DataFrame(
        {
            "n_docs": pd.array([int(n)], dtype="int64"),
            "half_corr": [float(_r(r, 6)) if r == r else float("nan")],
            "spearman_brown": [float(_r(sb, 6)) if sb == sb else float("nan")],
        }
    )


def q_return_probability(sf_dir: str, steps: int = 4):
    """Mean random-walk return probability of the events link graph at
    k = 2..4 steps: average over nodes of (P^k)_ii with P the row-
    normalized distinct-edge transition matrix — high return mass =
    strong local clustering (the signal node2vec-style walks exploit).
    Shape: the distinct-edge matrix is a 50-node broadcast; the matrix
    powers fold driver-side; mirrored as unrolled path self-joins."""
    edges = _events_edges(sf_dir)

    def dedup(b: pa.Table) -> pa.Table:
        df = b.select(["src", "dst"]).to_pandas().drop_duplicates()
        df = df[df["src"] != df["dst"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    e = (
        edges.map_batches(dedup, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .to_pandas()
    )
    nodes = sorted(set(e["src"]) | set(e["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    k = len(nodes)
    P = np.zeros((k, k))
    for s, d in zip(e["src"], e["dst"]):
        P[idx[s], idx[d]] = 1.0
    rs = P.sum(axis=1)
    P = np.divide(P, rs[:, None], out=np.zeros_like(P), where=rs[:, None] > 0)
    rows = []
    Pk = P.copy()
    for s in range(2, steps + 1):
        Pk = Pk @ P
        rows.append((s, float(_r(float(np.trace(Pk)) / k, 6))))
    return pd.DataFrame(rows, columns=["steps", "mean_return_prob"]).astype(
        {"steps": "int64"}
    )

__all__ = [
    "q_extract_entities",
    "q_validated_entities",
    "q_transfer_normalize",
    "q_receipt_join",
    "q_solana_block_parse",
    "q_solana_tx_lookup",
    "q_tron_block_parse",
    "q_dcfg_parse",
    "q_token_decode",
    "q_trace_flatten",
    "q_parse_props",
    "q_xml_labels",
    "q_block_parse",
    "q_utxo_edges",
    "q_jsonl_roundtrip",
    "q_readability",
    "q_table_checksum",
    "q_split_half_reliability",
    "q_return_probability",
]
