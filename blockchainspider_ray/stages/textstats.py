"""Text analysis stages: language ID, quality scoring, token counting,
rolling-hash fingerprinting.

All deterministic heuristics (no models in this container); each is a
callable for ``map_batches(batch_format='pyarrow')`` with setup (compiled
regexes, stopword tables) done once per actor.
"""

from __future__ import annotations

import re
from typing import List

import numpy as np
import pyarrow as pa

_RE_TOKEN = re.compile(r"\S+")
_RE_CJK = re.compile(r"[一-鿿]")

# tiny per-language stopword tables for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en", "que"},
}


def predict_lang(text: str) -> str:
    """CJK-ratio + stopword-vote language guess; '' when nothing matches."""
    if not text:
        return ""
    if len(_RE_CJK.findall(text)) / max(1, len(text)) > 0.05:
        return "zh"
    toks = set(t.lower() for t in _RE_TOKEN.findall(text))
    best, best_hits = "", 0
    for lang in sorted(_LANG_STOPWORDS):  # sorted: deterministic tie-break
        hits = len(toks & _LANG_STOPWORDS[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


class LangIdStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(
                    [predict_lang(t) for t in batch.column("text").to_pylist()], pa.string()
                ),
            }
        )


_B, _MOD = np.uint64(1000003), np.uint64((1 << 61) - 1)


def rolling_fingerprints(text: str, window: int = 8, keep: int = 4) -> List[int]:
    """Rabin-Karp rolling hashes over token windows; the ``keep`` smallest
    form the document fingerprint (winnowing-lite)."""
    toks = _RE_TOKEN.findall(text or "")
    if not toks:
        return []
    h = np.array(
        [hash_token(t) for t in toks], dtype=np.uint64
    )
    if len(toks) < window:
        return [int(h.min())]
    # rolling polynomial hash: window dot (B^(w-1)..B^0), products and sum
    # in wraparound uint64 (mod 2^64), then mod Mersenne61 — the same
    # integer recipe ORACLE_SQL['rolling_fingerprints'] replays in HUGEINT
    # powers built in Python ints: numpy uint64 would wrap p*B at 2^64
    # before the Mersenne mod and silently corrupt B^i for i >= 4
    powers = np.array(
        [pow(int(_B), i, int(_MOD)) for i in range(window)], dtype=np.uint64
    )
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    win = (sw * powers[::-1]).sum(axis=1, dtype=np.uint64) % _MOD
    return sorted(int(x) for x in np.sort(win)[:keep])


def hash_token(t: str) -> int:
    import hashlib

    # low half of md5, little-endian (== DuckDB md5_number_lower), mod
    # Mersenne61 — version-stable AND SQL-recomputable for the full oracle
    return int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little") % int(_MOD)


class FingerprintStage:
    def __init__(self, window: int = 8, keep: int = 4):
        self.window = window
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            rolling_fingerprints(t, self.window, self.keep)
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprints": pa.array(fps, pa.list_(pa.uint64())),
            }
        )
