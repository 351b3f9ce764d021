"""MoTS higher-order motif vectors (reference plugins/mots/highorder.py:27-224).

Per edge group (the reference groups a transaction's transfer edges,
plugins/mots/pipelines.py:60 with ``motif_size=4``), compute the 16-dim
motif count vector:

    index  1-2   : unidirectional / bidirectional edge counts
    index  3-15  : the 13 three-node motif classes M1..M13 (Benson-style
                   motif adjacency matrices; formulas replicated from the
                   reference, which builds them with scipy.sparse)
    index  16    : the 4-node bi-fan

Each count_i = (W_adj .* M_i).sum() / edges_in_motif_i, where W_adj is the
multiplicity-weighted adjacency — exactly the reference's final reduction.
scipy/networkx aren't needed: per-group graphs are tiny, so the matrices
are dense numpy; the element loops (M8/M9/M11/M13/bifan) mirror the
reference's lil_matrix loops literally so quirks (e.g. pair direction
conventions) carry over.  Reference semantics replicated:

- node graph built from (src, dst) pairs; parallel edges collapse to a
  weight = multiplicity (the reference's ``max(key)+1``);
- a group with exactly ONE edge (multiplicity 1) short-circuits to
  {1: 1.0, rest: 0.0} (highorder.py:38-39).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# edges per motif, in reference order (highorder.py:10-24, motif_size=4)
MOTIF_EDGE_COUNTS = [1, 2, 3, 4, 5, 6, 3, 4, 4, 2, 2, 2, 3, 3, 4, 4]
N_MOTIFS = len(MOTIF_EDGE_COUNTS)


def _bu(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    b = a * a.T
    return b, a - b


def _wedge_accumulate(a: np.ndarray, rows: np.ndarray, cols: np.ndarray, ordered: bool) -> np.ndarray:
    """The reference's W-matrix loop: for center i with arms J1 (rows
    matrix) and J2 (cols matrix), count non-adjacent arm pairs.  ``ordered``
    False = unordered pairs within one arm set (M8/M13 pattern, j1<j2);
    True = all (J1 x J2) pairs (M9/M11 pattern)."""
    n = a.shape[0]
    na = (a == 0) & (a.T == 0)  # no edge either way
    w = np.zeros((n, n))
    for i in range(n):
        j1 = np.flatnonzero(rows[i, :])
        j2 = np.flatnonzero(cols[i, :]) if ordered else j1
        if not len(j1) or not len(j2):
            continue
        if ordered:
            for k1 in j1:
                for k2 in j2:
                    if na[k1, k2]:
                        w[i, k1] += 1
                        w[i, k2] += 1
                        w[k1, k2] += 1
        else:
            for x in range(len(j1)):
                for y in range(x + 1, len(j1)):
                    k1, k2 = j1[x], j1[y]
                    if na[k1, k2]:
                        w[i, k1] += 1
                        w[i, k2] += 1
                        w[k1, k2] += 1
    return w + w.T


def _m8(a: np.ndarray) -> np.ndarray:
    _, u = _bu(a)
    return _wedge_accumulate(a, u, u, ordered=False)


def _m9(a: np.ndarray) -> np.ndarray:
    _, u = _bu(a)
    return _wedge_accumulate(a, u, u.T, ordered=True)


def _m11(a: np.ndarray) -> np.ndarray:
    b, u = _bu(a)
    return _wedge_accumulate(a, b, u, ordered=True)


def _m13(a: np.ndarray) -> np.ndarray:
    b, _ = _bu(a)
    return _wedge_accumulate(a, b, b, ordered=False)


def _bifan(a: np.ndarray) -> np.ndarray:
    n = a.shape[0]
    _, u = _bu(a)
    na = (a == 0) & (a.T == 0)
    np.fill_diagonal(na, False)
    w = np.zeros((n, n))
    xi, yi = np.nonzero(np.triu(na, 1))
    for x, y in zip(xi, yi):
        common = np.flatnonzero(u[x, :] * u[y, :])
        for i in range(len(common)):
            for j in range(i + 1, len(common)):
                cw, cv = common[i], common[j]
                if na[cw, cv]:
                    w[x, y] += 1
                    w[x, cw] += 1
                    w[x, cv] += 1
                    w[y, cw] += 1
                    w[y, cv] += 1
                    w[cw, cv] += 1
    return w + w.T


def motif_vector(srcs: Sequence, dsts: Sequence) -> np.ndarray:
    """16-dim motif count vector of one edge group (reference count())."""
    out = np.zeros(N_MOTIFS)
    m = len(srcs)
    if m == 0:
        return out
    # collapse parallel edges to multiplicity weights, first-seen node ids
    index: Dict = {}
    for v in list(srcs) + list(dsts):
        if v not in index:
            index[v] = len(index)
    if m == 1:
        out[0] = 1.0
        return out
    n = len(index)
    wadj = np.zeros((n, n))
    for s, d in zip(srcs, dsts):
        wadj[index[s], index[d]] += 1.0
    a = (wadj != 0).astype(np.float64)
    b, u = _bu(a)

    mats: List[np.ndarray] = [u, b]
    c = (u @ u) * u.T
    mats.append(c + c.T)  # M1
    c = (b @ u) * u.T + (u @ b) * u.T + (u @ u) * b
    mats.append(c + c.T)  # M2
    c = (b @ b) * u + (b @ u) * b + (u @ b) * b
    mats.append(c + c.T)  # M3
    mats.append((b @ b) * b)  # M4
    c = (u @ u) * u + (u @ u.T) * u + (u.T @ u) * u
    mats.append(c + c.T)  # M5
    mats.append((u @ b) * u + (b @ u.T) * u.T + (u.T @ u) * b)  # M6
    mats.append((u.T @ b) * u.T + (b @ u) * u + (u @ u.T) * b)  # M7
    mats.append(_m8(a))  # M8
    mats.append(_m9(a))  # M9
    mats.append(_m8(a.T))  # M10
    mats.append(_m11(a))  # M11
    mats.append(_m11(a.T))  # M12
    mats.append(_m13(a))  # M13
    mats.append(_bifan(a))  # bifan

    for i, mat in enumerate(mats):
        out[i] = (wadj * mat).sum() / MOTIF_EDGE_COUNTS[i]
    return out
