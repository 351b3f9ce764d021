"""Huffman code lengths: closed-form examples, Kraft equality, Shannon
entropy sandwich, determinism."""

import math

from blockchainspider_ray.pipelines.queries import (
    huffman_code_lengths,
    q_huffman_code_lengths,
)

SF_DIR = "/root/testdata/sf0.001"


def test_closed_form_example():
    # classic: {a:5, b:2, c:1, d:1} -> a=1, b=2, c=3, d=3
    got = huffman_code_lengths({"a": 5, "b": 2, "c": 1, "d": 1})
    assert got == {"a": 1, "b": 2, "c": 3, "d": 3}


def test_uniform_powers_of_two():
    # 4 equal weights -> a full binary tree, every length 2
    got = huffman_code_lengths({c: 3 for c in "wxyz"})
    assert set(got.values()) == {2}


def test_degenerate_single_symbol():
    assert huffman_code_lengths({"only": 9}) == {"only": 1}
    assert huffman_code_lengths({}) == {}


def test_kraft_equality_and_entropy_bound(ray_session):
    df = q_huffman_code_lengths(SF_DIR)
    # Kraft equality: a Huffman code is complete
    kraft = sum(2.0 ** -l for l in df["code_len"])
    assert abs(kraft - 1.0) < 1e-9
    # Shannon sandwich: H <= E[len] < H + 1 (bits)
    total = df["cnt"].sum()
    p = df["cnt"] / total
    h = -(p * p.map(lambda x: math.log2(x))).sum()
    elen = (p * df["code_len"]).sum()
    assert h - 1e-9 <= elen < h + 1.0
    # determinism
    assert df.equals(q_huffman_code_lengths(SF_DIR))
