"""The Levenshtein DP used by levenshtein_verify must agree with DuckDB's
levenshtein() — it is the oracle-parity contract for the fuzzy-verify stage."""

import random

import duckdb
import pytest

from blockchainspider_ray.pipelines.queries import _levenshtein


@pytest.mark.parametrize(
    "a,b,want",
    [
        ("kitten", "sitting", 3),
        ("", "", 0),
        ("", "abc", 3),
        ("abc", "", 3),
        ("same", "same", 0),
        ("a" * 64, "a" * 63 + "b", 1),
    ],
)
def test_levenshtein_known(a, b, want):
    assert _levenshtein(a, b) == want


def test_levenshtein_matches_duckdb_randomized():
    rng = random.Random(7)
    con = duckdb.connect()
    alphabet = "abcx \t"
    for _ in range(200):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert _levenshtein(a, b) == want, (a, b)
