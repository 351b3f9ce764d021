"""Checksum validation for extracted blockchain entities.

The reference validates regex-extracted addresses before emitting labels:
BTC via ``bitcoin.is_address`` (base58check decode + double-SHA256
checksum) and ETH via ``Web3.isAddress`` (hex shape + EIP-55 mixed-case
checksum) — reference spiders/labels/web.py:94-109.  Neither library is
available here, so both checks are implemented from their public specs:

- ``is_btc_address``: base58 decode to 25 bytes, version byte 0x00/0x05
  (the reference regex already restricts to leading '1'/'3'), last 4 bytes
  == first 4 of sha256(sha256(payload)).
- ``is_eth_address``: all-lowercase / all-uppercase hex is accepted
  (shape-only, as Web3.isAddress does); mixed case must match the EIP-55
  checksum, which needs keccak-256 — included below as a compact pure
  Python Keccak-f[1600] sponge (hashlib's sha3 is the NIST variant with
  different padding, so it cannot be used).
"""

from __future__ import annotations

import hashlib
from typing import List

_MASK = (1 << 64) - 1

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets indexed [x][y]
_ROTATIONS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rol(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f(a: List[List[int]]) -> None:
    for rc in _ROUND_CONSTANTS:
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            ax, dx = a[x], d[x]
            for y in range(5):
                ax[y] ^= dx
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _ROTATIONS[x][y])
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        a[0][0] ^= rc


def keccak256(data: bytes) -> bytes:
    """Original Keccak-256 (pre-NIST padding 0x01), rate 136 bytes."""
    rate = 136
    state = [[0] * 5 for _ in range(5)]
    # multi-rate padding
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8 : i * 8 + 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        _keccak_f(state)
    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)


def eth_checksum_address(addr: str) -> str:
    """EIP-55 mixed-case form of a 0x-prefixed hex address."""
    body = addr[2:].lower()
    digest = keccak256(body.encode("ascii")).hex()
    out = []
    for ch, h in zip(body, digest):
        out.append(ch.upper() if ch.isalpha() and int(h, 16) >= 8 else ch)
    return "0x" + "".join(out)


def is_eth_address(addr: str) -> bool:
    """Web3.isAddress semantics on a hex candidate: shape 0x + 40 hex;
    single-case accepted, mixed case must satisfy EIP-55."""
    if len(addr) != 42 or not addr.startswith("0x"):
        return False
    body = addr[2:]
    try:
        int(body, 16)
    except ValueError:
        return False
    if body == body.lower() or body == body.upper():
        return True
    return eth_checksum_address(addr) == addr


_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def _b58decode(s: str) -> bytes:
    num = 0
    for ch in s:
        v = _B58_INDEX.get(ch)
        if v is None:
            raise ValueError(f"invalid base58 char: {ch!r}")
        num = num * 58 + v
    # leading '1's encode leading zero bytes
    n_zeros = len(s) - len(s.lstrip("1"))
    body = num.to_bytes((num.bit_length() + 7) // 8, "big") if num else b""
    return b"\x00" * n_zeros + body


def _b58encode(raw: bytes) -> str:
    num = int.from_bytes(raw, "big")
    out = []
    while num:
        num, rem = divmod(num, 58)
        out.append(_B58_ALPHABET[rem])
    n_zeros = len(raw) - len(raw.lstrip(b"\x00"))
    return "1" * n_zeros + "".join(reversed(out))


def btc_address_from_hash160(h160: bytes, version: int = 0x00) -> str:
    """Construct a valid base58check address from a 20-byte hash (used by
    fixtures/tests to mint known-good candidates)."""
    payload = bytes([version]) + h160
    checksum = hashlib.sha256(hashlib.sha256(payload).digest()).digest()[:4]
    return _b58encode(payload + checksum)


def is_btc_address(addr: str) -> bool:
    """base58check: 25 decoded bytes, double-SHA256 checksum, P2PKH/P2SH
    version byte (0x00 / 0x05 — matching the reference's [13]-prefix
    candidate regex)."""
    try:
        raw = _b58decode(addr)
    except ValueError:
        return False
    if len(raw) != 25 or raw[0] not in (0x00, 0x05):
        return False
    payload, checksum = raw[:21], raw[21:]
    return hashlib.sha256(hashlib.sha256(payload).digest()).digest()[:4] == checksum


def validate_entities(
    btc_candidates: List[str], eth_candidates: List[str]
) -> tuple[List[str], List[str]]:
    """Filter regex candidates to checksum-valid addresses (reference
    web.py:94-109 behaviour)."""
    return (
        [a for a in btc_candidates if is_btc_address(a)],
        [a for a in eth_candidates if is_eth_address(a)],
    )
