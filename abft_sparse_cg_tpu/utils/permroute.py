"""Static-permutation routing for TPU lane grids (round-5 groundwork).

TPU has no fast dynamic gather (XLA's 1-D gather serializes at ~7
ns/element on this device), but a permutation KNOWN AT BUILD TIME can
be routed through lane-shuffle primitives Mosaic does lower fast
(static take_along_axis: ~0.014 ns/element, the wideband scan's
measured primitive).  This module computes the routing tables.

Theory (rearrangeable 3-stage Clos / Hall's theorem): any permutation
of an (R, C) grid decomposes into

    stage 1: a within-row scatter to lanes   (sigma1 — lane shuffle)
    stage 2: C independent per-lane row permutations (rowp)
    stage 3: a within-row gather from lanes  (sigma2 — lane shuffle)

because the bipartite multigraph "source row -> dest row" (one edge per
element) is C-regular, so it edge-colors into C perfect matchings
(recursive Euler splitting for C a power of two); color = the lane an
element transits in.  Stage 2 is itself R-sized permutations, handled
on TPU by a transpose + recursion (each level reduces the row count by
128x), bottoming out in a few sublane-select bodies.

This is the enabling primitive for the unstructured/expander SpMV tier
(BENCH_NOTES "Unstructured SpMV — design sketch"): products computed in
source-sorted order route to row-sorted order with ONE static
permutation instead of a scatter.  The decomposition here is verified
exhaustively by tests/test_permroute.py; the TPU kernel pipeline lands
in round 5.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decompose_grid_permutation", "apply_grid_permutation_np"]


def _euler_split(src_rows, dst_rows):
    """Split a 2k-regular bipartite multigraph into two k-regular
    halves by 2-coloring each Euler circuit's edges alternately.
    Returns the boolean half assignment per edge."""
    from collections import defaultdict

    M = len(src_rows)
    inc_s = defaultdict(list)
    inc_d = defaultdict(list)
    for e in range(M):
        inc_s[src_rows[e]].append(e)
        inc_d[dst_rows[e]].append(e)
    used = np.zeros(M, bool)
    half = np.zeros(M, bool)
    ps = defaultdict(int)
    pd = defaultdict(int)
    for e0 in range(M):
        if used[e0]:
            continue
        e, side_src, flag = e0, True, True
        while True:
            used[e] = True
            half[e] = flag
            flag = not flag
            if side_src:
                key, edges, ptr = dst_rows[e], inc_d[dst_rows[e]], pd
            else:
                key, edges, ptr = src_rows[e], inc_s[src_rows[e]], ps
            nxt = None
            while ptr[key] < len(edges):
                cand = edges[ptr[key]]
                ptr[key] += 1
                if not used[cand]:
                    nxt = cand
                    break
            if nxt is None:
                break
            e = nxt
            side_src = not side_src
    return half


def _edge_color(src_rows, dst_rows, C):
    """C perfect matchings of a C-regular bipartite multigraph
    (C = power of two) via recursive Euler splitting."""
    M = len(src_rows)
    if C == 1:
        return np.zeros(M, dtype=np.int64)
    half = _euler_split(src_rows, dst_rows)
    colors = np.empty(M, dtype=np.int64)
    for hv, off in ((True, 0), (False, C // 2)):
        idx = np.flatnonzero(half == hv)
        colors[idx] = _edge_color(src_rows[idx], dst_rows[idx],
                                  C // 2) + off
    return colors


def decompose_grid_permutation(perm: np.ndarray, R: int, C: int):
    """perm[src_flat] = dst_flat on an (R, C) grid (C a power of two).

    Returns ``(sigma1, rowp, sigma2)``:
      - sigma1 (R, C): stage-1 DESTINATION lane of the element at
        (r, c) — a within-row scatter (its inverse is the shuffle's
        gather index);
      - rowp (C, R): stage-2 destination row per (lane, source row);
      - sigma2 (R, C): stage-3 SOURCE lane for final position (r, c) —
        directly a take_along_axis gather index.
    """
    assert C & (C - 1) == 0, "C must be a power of two"
    src = np.arange(R * C)
    sr, sc = src // C, src % C
    dr, dc = perm // C, perm % C
    colors = _edge_color(sr, dr, C)
    sigma1 = np.full((R, C), -1, np.int64)
    rowp = np.full((C, R), -1, np.int64)
    sigma2 = np.full((R, C), -1, np.int64)
    sigma1[sr, sc] = colors
    rowp[colors, sr] = dr
    sigma2[dr, dc] = colors
    assert (sigma1 >= 0).all() and (rowp >= 0).all() and (sigma2 >= 0).all()
    return sigma1, rowp, sigma2


def apply_grid_permutation_np(x, sigma1, rowp, sigma2):
    """Numpy reference of the 3-stage application (the TPU pipeline's
    oracle): scatter-to-lane, per-lane row permute, gather-from-lane."""
    R, C = x.shape
    y = np.empty_like(x)
    rows = np.repeat(np.arange(R), C)
    y[rows, sigma1.ravel()] = x.ravel()
    z = np.empty_like(x)
    for lane in range(C):
        z[rowp[lane], lane] = y[:, lane]
    return np.take_along_axis(z, sigma2, axis=1)
