"""Unit tests for the ETL normalizer family and broadcast as-of/range joins."""

import numpy as np
import pyarrow as pa

from blockchainspider_ray.functions.etl import (
    TOPIC_TRANSFER,
    ZERO_ADDRESS,
    decode_token_events,
    flatten_trace_tree,
    hex_to_dec,
    normalize_transfers,
    parse_json_props,
    split_to_words,
    synth_transfer_id,
    word_to_address,
)


def test_scalar_converters():
    assert hex_to_dec("0x1a") == 26
    assert hex_to_dec("1a") == 26
    assert hex_to_dec(None) == 0 and hex_to_dec("") == 0
    word = "0x" + "0" * 24 + "AB" * 20
    assert word_to_address(word) == "0x" + "ab" * 20
    assert word_to_address(None) == ZERO_ADDRESS
    assert split_to_words("0x" + "11" * 32 + "22" * 32) == [
        "0x" + "11" * 32,
        "0x" + "22" * 32,
    ]
    assert split_to_words(None) == []


def test_normalize_transfers_zero_fill_and_id():
    batch = pa.table(
        {
            "from": pa.array([None, "0xABC"], pa.string()),
            "to": pa.array(["0xDeF", "0xghi"], pa.string()),
            "value": pa.array(["1.50", "2.25"], pa.string()),
            "hash": pa.array(["h1", "h2"], pa.string()),
        }
    )
    out = normalize_transfers(batch)
    assert out.column("from_addr").to_pylist() == [ZERO_ADDRESS, "0xabc"]
    assert out.column("to_addr").to_pylist() == ["0xdef", "0xghi"]
    # id synthesized from the NORMALIZED fields, deterministic
    assert out.column("id")[0].as_py() == synth_transfer_id(ZERO_ADDRESS, "0xdef", "1.50", "h1")
    assert out.column("value").to_pylist() == [1.5, 2.25]


def test_decode_token_events_dispatch():
    addr_word = "0x" + "0" * 24 + "aa" * 20
    batch = pa.table(
        {
            "hash": pa.array(["t1", "t2"], pa.string()),
            "log_index": pa.array([0, 1], pa.int64()),
            "topics": pa.array(
                [[TOPIC_TRANSFER, addr_word, addr_word], ["0x" + "de" * 32, addr_word, addr_word]],
                pa.list_(pa.string()),
            ),
            "data": pa.array(["0xff", "0x01"], pa.string()),
        }
    )
    out = decode_token_events(batch)
    # unknown topic dropped, transfer decoded
    assert out.num_rows == 1
    assert out.column("action")[0].as_py() == "transfer"
    assert out.column("value")[0].as_py() == 255
    assert out.column("from_addr")[0].as_py() == "0x" + "aa" * 20


def test_flatten_trace_tree_depth_order_ids():
    trace = {
        "type": "CALL",
        "from": "0xA",
        "to": "0xB",
        "value": "0x2",
        "calls": [
            {"type": "STATICCALL", "value": "0x3", "calls": [{"type": "DELEGATECALL", "value": "0x5"}]},
            {"type": "CALL", "value": "0x7"},
        ],
    }
    rows = flatten_trace_tree("tx", trace)
    assert [(r["trace_id"], r["trace_type"], r["value"]) for r in rows] == [
        ("0_0", "CALL", 2),
        ("1_1", "STATICCALL", 3),
        ("2_2", "DELEGATECALL", 5),
        ("1_3", "CALL", 7),
    ]
    assert rows[0]["from_addr"] == "0xa"  # lowercased
    assert rows[1]["from_addr"] == ZERO_ADDRESS  # missing party zero-filled


def test_parse_json_props_malformed_is_null():
    batch = pa.table({"props": pa.array(['{"k": 7}', "not json", None], pa.string())})
    out = parse_json_props(batch)
    assert out.column("props_k").to_pylist() == [7, None, None]


def test_asof_join_index_backward_semantics():
    from blockchainspider_ray.stages.joins import AsofJoinIndex

    keys = np.array([1, 1, 2], dtype=np.int64)
    times = np.array([10, 20, 15], dtype=np.int64)
    idx = AsofJoinIndex(keys, times, {"v": np.array([100, 200, 300])})
    pos = idx.lookup(
        np.array([1, 1, 1, 2, 3], dtype=np.int64),
        np.array([9, 10, 25, 14, 99], dtype=np.int64),
    )
    got = [int(idx.payload["v"][p]) if p >= 0 else None for p in pos]
    # t=9: before everything -> None; t=10: inclusive match -> 100;
    # t=25: latest is 20 -> 200; key 2 t=14: before 15 -> None; key 3: absent
    assert got == [None, 100, 200, None, None]


def test_range_join_count_dataset(ray_session):
    import ray.data

    from blockchainspider_ray.stages.joins import range_join_count

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "t": pa.array(
                    [np.datetime64("2024-01-01", "us"), np.datetime64("2024-01-01", "us")],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "t": pa.array(
                [
                    np.datetime64("2024-01-01", "us"),  # in [t, t+2d)
                    np.datetime64("2024-01-02", "us"),  # in
                    np.datetime64("2024-01-03", "us"),  # out (exclusive end)
                ],
                pa.timestamp("us"),
            ),
        }
    )
    out = range_join_count(
        left, right, key="k", right_key="k", left_time="t", right_time="t", window_days=2
    ).to_pandas()
    assert out.sort_values("k")["n_in_range"].tolist() == [2, 0]


def test_function_selector_and_event_topics():
    """ABI selectors/topics from the pure-python keccak vs public values."""
    from blockchainspider_ray.functions.etl import (
        TOPIC_APPROVAL,
        TOPIC_TRANSFER,
        event_topic,
        function_selector,
    )

    assert function_selector("transfer(address,uint256)") == "0xa9059cbb"
    assert function_selector("name()") == "0x06fdde03"
    assert function_selector("totalSupply()") == "0x18160ddd"
    assert function_selector("balanceOf(address)") == "0x70a08231"
    # the decoder's hardcoded dispatch topics ARE keccak of the signatures
    assert event_topic("Transfer(address,address,uint256)") == TOPIC_TRANSFER
    assert event_topic("Approval(address,address,uint256)") == TOPIC_APPROVAL


def test_hash_join_left_and_collision(ray_session):
    import pyarrow as pa
    import ray

    from blockchainspider_ray.stages.joins import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()),
                  "lv": pa.array(["a", "b", "c", "d"])})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 2, 4], pa.int64()),
                  "rv": pa.array([10.0, 20.0, 30.0])})
    )
    inner = hash_join(left, right, key="k", right_key="rk", how="inner").to_pandas()
    # many-to-many: k=2 has 2 left x 2 right = 4 rows
    assert len(inner) == 4 and set(inner["k"]) == {2}
    assert sorted(inner["rv"]) == [10.0, 10.0, 20.0, 20.0]

    lj = hash_join(left, right, key="k", right_key="rk", how="left").to_pandas()
    assert len(lj) == 6  # 1,3 survive unmatched; 2x2 expands
    assert lj[lj["k"] == 1]["rv"].isna().all()

    import pytest

    bad = ray.data.from_arrow(pa.table({"rk": pa.array([1], pa.int64()),
                                        "lv": pa.array(["x"])}))
    with pytest.raises(ValueError, match="collide"):
        hash_join(left, bad, key="k", right_key="rk")


def test_skew_join_matches_plain_hash_join(ray_session):
    """skew_join's salting must be invisible in the RESULT: same rows as
    the unsalted hash_join on a probe side where one key holds 90% of the
    rows (the shape that motivates the operator)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from blockchainspider_ray.stages.joins import hash_join, skew_join

    rng = np.random.default_rng(3)
    n = 5000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n)).astype(np.int64)
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "row": pa.array(np.arange(n), pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(np.arange(50), pa.int64()),
                "name": pa.array([f"u{i}" for i in range(50)]),
            }
        )
    )
    got = (
        skew_join(left, right, key="k", right_key="rk", hot_share=0.05, num_salts=8)
        .to_pandas()
        .sort_values(["k", "row"])
        .reset_index(drop=True)
    )
    want = (
        hash_join(left, right, key="k", right_key="rk")
        .to_pandas()
        .sort_values(["k", "row"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)
    # the hot key must actually have been detected (exercises the salt path)
    assert (keys == 7).sum() > 0.05 * n


def test_skew_join_no_hot_keys_degenerates(ray_session):
    """Uniform keys: the hot set is empty and skew_join == hash_join."""
    import numpy as np
    import pyarrow as pa
    import ray

    from blockchainspider_ray.stages.joins import hash_join, skew_join

    keys = np.arange(200, dtype=np.int64) % 40
    left = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(np.arange(40), pa.int64()),
                  "v": pa.array(np.arange(40.0))})
    )
    got = skew_join(left, right, key="k", right_key="rk", hot_share=0.2).to_pandas()
    want = hash_join(left, right, key="k", right_key="rk").to_pandas()
    assert sorted(got["v"]) == sorted(want["v"])


def test_hash_join_full_outer(ray_session):
    import pyarrow as pa
    import ray

    from blockchainspider_ray.stages.joins import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()),
                  "lv": pa.array(["a", "b", "c", "d"])})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 2, 4], pa.int64()),
                  "rv": pa.array([10.0, 20.0, 30.0])})
    )
    fj = hash_join(left, right, key="k", right_key="rk", how="full").to_pandas()
    # 2x2 expands (4 rows) + left-only 1,3 + right-only 4
    assert len(fj) == 7
    assert fj[fj["k"] == 1]["rv"].isna().all()
    assert fj[fj["k"] == 3]["rv"].isna().all()
    # right-only row keeps its coalesced key with null left payload
    r4 = fj[fj["k"] == 4]
    assert len(r4) == 1 and r4["lv"].isna().all() and r4["rv"].iloc[0] == 30.0


def test_bloom_semi_join_exact_int_and_string(ray_session):
    """bloom_semi_join is an EXACT semi filter: duplicate build keys do
    not duplicate probe rows, false positives are confirmed away, and
    string keys route through the np.isin bucket path."""
    import numpy as np
    import pyarrow as pa
    import ray

    from blockchainspider_ray.stages.joins import bloom_semi_join

    rng = np.random.default_rng(7)
    probe_keys = rng.integers(0, 10_000, size=5_000)
    probe = ray.data.from_arrow(
        pa.table({"k": pa.array(probe_keys, pa.int64()),
                  "v": pa.array(np.arange(5_000), pa.int64())})
    ).repartition(7)
    build_keys = np.concatenate([rng.integers(0, 10_000, size=800)] * 2)  # dups
    build = ray.data.from_arrow(pa.table({"bk": pa.array(build_keys, pa.int64())}))
    out = bloom_semi_join(
        probe, build, probe_key="k", build_key="bk",
        m_bits=1 << 12, num_buckets=8, cache_buckets=3,  # tiny bloom -> many FPs to confirm away
    ).to_pandas()
    keep = set(build_keys.tolist())
    exp = sorted(v for k, v in zip(probe_keys, range(5_000)) if k in keep)
    assert sorted(out["v"]) == exp  # exact, no dup expansion

    sprobe = ray.data.from_arrow(
        pa.table({"s": pa.array([f"u{i%50}" for i in range(400)]),
                  "v": pa.array(list(range(400)), pa.int64())})
    ).repartition(3)
    sbuild = ray.data.from_arrow(pa.table({"s": pa.array([f"u{i}" for i in range(0, 50, 5)])}))
    sout = bloom_semi_join(sprobe, sbuild, probe_key="s", m_bits=1 << 12, num_buckets=4).to_pandas()
    assert sorted(sout["v"]) == sorted(v for v in range(400) if (v % 50) % 5 == 0)


def test_bloom_semi_join_build_cap_refuses(ray_session):
    import pyarrow as pa
    import pytest
    import ray

    from blockchainspider_ray.stages.joins import bloom_semi_join

    probe = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    build = ray.data.from_arrow(pa.table({"k": pa.array(list(range(100)), pa.int64())}))
    with pytest.raises(ValueError, match="hash_join"):
        bloom_semi_join(probe, build, probe_key="k", build_max_rows=10)
