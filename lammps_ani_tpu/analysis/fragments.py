"""Reactive-trajectory fragment analysis (combustion analyze.py equivalent).

Mirrors /root/reference/examples/combustion/analyze.py: neighbor list ->
bond table by element-pair cutoffs (analyze.py:22-24 BOND_CUTOFFS) ->
connected components -> molecular formula time series. The reference runs
this on GPU with cudf/cugraph; here bonds come from the engine's own
neighbor machinery (device) and components from scipy.sparse.csgraph
(host) — fragment analysis is I/O-bound postprocessing, not a hot loop.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from scipy import sparse
from scipy.sparse.csgraph import connected_components

# element-pair bond cutoffs in Angstrom (reference analyze.py BOND_CUTOFFS)
DEFAULT_CUTOFFS = {
    ("H", "H"): 0.84, ("H", "C"): 1.42, ("H", "N"): 1.31, ("H", "O"): 1.26,
    ("C", "C"): 1.98, ("C", "N"): 1.90, ("C", "O"): 1.86,
    ("N", "N"): 1.82, ("N", "O"): 1.78, ("O", "O"): 1.74,
}


def _cutoff_matrix(symbols, cutoffs):
    s = len(symbols)
    m = np.zeros((s, s))
    for (a, b), r in cutoffs.items():
        if a in symbols and b in symbols:
            i, j = symbols.index(a), symbols.index(b)
            m[i, j] = m[j, i] = r
    return m


def bond_pairs(species, pos, box_h=None, symbols=("H", "C", "N", "O"),
               cutoffs=DEFAULT_CUTOFFS):
    """[(i, j)] bonded pairs under element-pair cutoffs (minimum image)."""
    cm = _cutoff_matrix(list(symbols), cutoffs)
    rmax = cm.max()
    n = len(pos)
    pos = np.asarray(pos, float)
    h = None if box_h is None else np.asarray(box_h, float)
    hinv = None if h is None else np.linalg.inv(h)
    pairs = []
    for i in range(n):
        d = pos[i + 1:] - pos[i]
        if h is not None:
            frac = d @ hinv
            d = (frac - np.round(frac)) @ h
        r = np.linalg.norm(d, axis=1)
        cut = cm[species[i], species[i + 1:]]
        for j in np.nonzero((r < cut) & (r < rmax))[0]:
            pairs.append((i, i + 1 + int(j)))
    return pairs


def fragments(species, pos, box_h=None, symbols=("H", "C", "N", "O"),
              cutoffs=DEFAULT_CUTOFFS):
    """(labels [n], formulas Counter): connected components -> formulas.

    Formula strings use Hill-ish ordering over `symbols` (reference
    analyze.py builds e.g. 'H2O1' strings the same way).
    """
    n = len(pos)
    pairs = bond_pairs(species, pos, box_h, symbols, cutoffs)
    if pairs:
        ij = np.asarray(pairs)
        adj = sparse.coo_matrix(
            (np.ones(len(ij)), (ij[:, 0], ij[:, 1])), shape=(n, n))
        _, labels = connected_components(adj, directed=False)
    else:
        labels = np.arange(n)
    formulas = Counter()
    for frag in np.unique(labels):
        members = species[labels == frag]
        formula = "".join(
            f"{sym}{np.sum(members == k)}"
            for k, sym in enumerate(symbols) if np.any(members == k))
        formulas[formula] += 1
    return labels, formulas


def formula_time_series(frames, species, box_h=None,
                        symbols=("H", "C", "N", "O"),
                        cutoffs=DEFAULT_CUTOFFS):
    """[{formula: count}] per frame — the reference's reaction-network
    time series (combustion/early-earth glycine detection)."""
    return [fragments(species, f, box_h, symbols, cutoffs)[1]
            for f in frames]
