"""TextRank keywords + extractive summary (Mihalcea & Tarau, 2004).

The reference's label-web spider runs ``summa.keywords.keywords(text,
split=True, words=16)`` and ``summa.summarizer.summarize(text, words=256)``
per crawled page (reference spiders/labels/web.py:7-8,125,132).  ``summa``
is not available in this environment, so this is a from-scratch
implementation of the same published algorithm:

- **keywords**: candidate tokens (lowercased, alphabetic-leading, >= 3
  chars, stopword-filtered — summa's POS filter approximated by the
  stopword list), co-occurrence graph with window 2 over the filtered
  token sequence, PageRank (damping 0.85), top-N by (score desc, word
  asc).
- **summarize**: sentence graph with the paper's similarity
  ``|overlap| / (log|s1| + log|s2|)``, PageRank, pick sentences by score
  until the word budget, emit in original document order.

Everything is deterministic: sorted vocabularies index the graphs, the
power iteration is fixed-order numpy, ties break lexicographically.
"""

from __future__ import annotations

import re
from typing import List

import numpy as np

# compact english stopword list (summa's POS filter stand-in)
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by can did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more
    most my myself no nor not now of off on once only or other our ours
    ourselves out over own same she should so some such than that the their
    theirs them themselves then there these they this those through to too
    under until up very was we were what when where which while who whom why
    will with you your yours yourself yourselves""".split()
)

_WORD_RE = re.compile(r"[A-Za-z][A-Za-z0-9'-]*")
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")

_DAMPING = 0.85
_TOL = 1e-8
_MAX_ITER = 100


def _pagerank(weights: np.ndarray) -> np.ndarray:
    """Power iteration over a weighted undirected graph (dense, per-doc
    graphs are small).  ``weights`` is symmetric with zero diagonal."""
    n = weights.shape[0]
    if n == 0:
        return np.empty(0)
    colsum = weights.sum(axis=0)
    safe = np.where(colsum > 0, colsum, 1.0)
    m = weights / safe  # column-normalized transition matrix
    rank = np.full(n, 1.0 / n)
    base = (1.0 - _DAMPING) / n
    for _ in range(_MAX_ITER):
        nxt = base + _DAMPING * (m @ rank)
        if np.abs(nxt - rank).sum() < _TOL:
            rank = nxt
            break
        rank = nxt
    return rank


def _candidates(text: str) -> List[str]:
    return [
        t
        for t in (w.lower() for w in _WORD_RE.findall(text or ""))
        if len(t) >= 3 and t not in STOPWORDS
    ]


def textrank_keywords(text: str, words: int = 16) -> List[str]:
    """Top-``words`` keywords by TextRank score (score desc, word asc)."""
    cand = _candidates(text)
    if not cand:
        return []
    vocab = sorted(set(cand))
    index = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    w = np.zeros((n, n))
    # co-occurrence window of 2 over the filtered token sequence
    for a, b in zip(cand, cand[1:]):
        if a != b:
            i, j = index[a], index[b]
            w[i, j] += 1.0
            w[j, i] += 1.0
    scores = _pagerank(w)
    order = sorted(range(n), key=lambda i: (-scores[i], vocab[i]))
    return [vocab[i] for i in order[:words]]


def textrank_summarize(text: str, words: int = 256) -> str:
    """Extractive summary: highest-TextRank sentences (document order)
    until the word budget is reached (at least one sentence)."""
    sentences = [s for s in _SENT_SPLIT.split((text or "").strip()) if s.strip()]
    if not sentences:
        return ""
    token_sets = []
    lens = []
    for s in sentences:
        toks = {t.lower() for t in _WORD_RE.findall(s)}
        token_sets.append(toks)
        lens.append(max(len(toks), 1))
    n = len(sentences)
    w = np.zeros((n, n))
    log_lens = np.log(np.maximum(lens, 2))  # log(1)=0 would blow the ratio up
    for i in range(n):
        for j in range(i + 1, n):
            ov = len(token_sets[i] & token_sets[j])
            if ov:
                w_ij = ov / (log_lens[i] + log_lens[j])
                w[i, j] = w_ij
                w[j, i] = w_ij
    scores = _pagerank(w)
    order = sorted(range(n), key=lambda i: (-scores[i], i))
    chosen = []
    budget = 0
    for i in order:
        n_words = len(_WORD_RE.findall(sentences[i]))
        if chosen and budget + n_words > words:
            continue
        chosen.append(i)
        budget += n_words
        if budget >= words:
            break
    return " ".join(sentences[i] for i in sorted(chosen))
