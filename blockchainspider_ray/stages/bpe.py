"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding merge learning (Sennrich et al. 2016) has exactly one
corpus-scale step: reducing the raw corpus to a ``(word, frequency)``
vocabulary — at 100 TB that is a full map_batches + groupby pass.  The
merge loop itself then iterates over the VOCABULARY (10^7-ish rows even
for web corpora, bounded by distinct words, not corpus bytes): count
adjacent symbol pairs weighted by word frequency, take the global
argmax, rewrite the pair into one symbol, repeat.  Each round here is
one Dataset execution — per-batch partial pair counts (combiner) folded
by a ``groupby(left, right).sum`` whose key space is bounded by the
symbol alphabet, plus a batch rewrite of the vocab — so no round ever
shuffles more than the (tiny) pair table and the vocab rows.

Divergence from the classic recipe, on purpose: no ``</w>`` end-of-word
marker — symbols are plain character substrings — so the first
iteration's pair table is exactly the SQL-expressible adjacent-bigram
count that the ``bpe_pair_counts`` oracle pins.

Encoding applies learned merges by rank (lowest rank first) per word,
with a per-actor word->tokens cache: web text repeats words heavily, so
an actor pool amortizes both the rank-table build and the per-word
dynamic programming across batches.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import pyarrow as pa


def vocab_from_docs(docs, text_col: str = "text"):
    """Corpus -> (word, f) vocabulary Dataset: the only corpus-scale pass.

    Splits on single spaces (the fixture corpus' separator; swap in a
    regex tokenizer stage upstream for real text), counts per batch
    first so only distinct-word partials reach the shuffle."""

    def partials(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column(text_col).to_pylist():
            if t:
                for w in t.split(" "):
                    if w:
                        c[w] += 1
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "f": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("word")
        .sum("f")
        .map_batches(lambda b: b.rename_columns(["word", "f"]), batch_format="pyarrow")
    )


def _pair_partials(b: pa.Table) -> pa.Table:
    c: Counter = Counter()
    for syms, f in zip(b.column("syms").to_pylist(), b.column("f").to_pylist()):
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += f
    lefts, rights, ns = [], [], []
    for (l, r), n in c.items():
        lefts.append(l)
        rights.append(r)
        ns.append(n)
    return pa.table(
        {
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def pair_counts(vocab):
    """Aggregate adjacent-symbol pair counts over a symbolized vocab
    Dataset ``(syms: list<string>, f: int64)`` — per-batch combiner, then
    a groupby whose key space is bounded by the live symbol alphabet."""
    return (
        vocab.map_batches(_pair_partials, batch_format="pyarrow")
        .groupby(["left", "right"])
        .sum("n")
        .map_batches(
            lambda b: b.rename_columns(["left", "right", "n"]), batch_format="pyarrow"
        )
    )


def _merge_batch(b: pa.Table, left: str, right: str) -> pa.Table:
    out = []
    for syms in b.column("syms").to_pylist():
        merged, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out.append(merged)
    return pa.table(
        {
            "syms": pa.array(out, pa.list_(pa.string())),
            "f": b.column("f"),
        }
    )


def train_bpe(docs, k: int, text_col: str = "text") -> List[Tuple[str, str, int]]:
    """Learn ``k`` BPE merges over a document Dataset.

    Returns ``[(left, right, pair_count_at_merge_time), ...]`` in merge
    order.  Argmax tie-break is (count desc, left asc, right asc) so the
    merge table is fully deterministic.  Stops early if no pair is left.
    """
    vocab = vocab_from_docs(docs, text_col).map_batches(
        lambda b: pa.table(
            {
                "syms": pa.array(
                    [list(w) for w in b.column("word").to_pylist()],
                    pa.list_(pa.string()),
                ),
                "f": b.column("f"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    merges: List[Tuple[str, str, int]] = []
    for _ in range(k):
        # the aggregated pair table is alphabet-bounded (small by nature);
        # the argmax is a driver-side scan of that small table
        pairs = pair_counts(vocab).take_all()
        if not pairs:
            break
        best = min(pairs, key=lambda r: (-r["n"], r["left"], r["right"]))
        merges.append((best["left"], best["right"], best["n"]))
        vocab = vocab.map_batches(
            _merge_batch,
            batch_format="pyarrow",
            fn_kwargs={"left": best["left"], "right": best["right"]},
        ).materialize()
    return merges


def encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Apply merges to one word in learned-rank order (classic BPE
    encode: repeatedly merge the present pair with the lowest rank)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge ALL occurrences of the chosen pair left-to-right, matching
        # the training rewrite
        left, right = syms[best_i], syms[best_i + 1]
        merged, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


class BPEEncodeStage:
    """Actor-pool map_batches stage: tokenize ``text`` with a learned
    merge table, emitting per-doc BPE token counts.  The rank dict is
    built once per actor; a word->tokens cache amortizes repeated words
    (web text is extremely repetitive at the word level)."""

    def __init__(self, merges: List[Tuple[str, str, int]]):
        self.ranks = {(l, r): i for i, (l, r, _n) in enumerate(merges)}
        self._cache: Dict[str, List[str]] = {}

    def _encode(self, word: str) -> List[str]:
        toks = self._cache.get(word)
        if toks is None:
            toks = encode_word(word, self.ranks)
            self._cache[word] = toks
        return toks

    def __call__(self, b: pa.Table) -> pa.Table:
        counts = []
        for t in b.column("text").to_pylist():
            n = 0
            if t:
                for w in t.split(" "):
                    if w:
                        n += len(self._encode(w))
            counts.append(n)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_bpe_tokens": pa.array(counts, pa.int64()),
            }
        )
