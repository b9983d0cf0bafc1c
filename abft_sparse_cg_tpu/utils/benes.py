"""Benes-network routing for arbitrary STATIC permutations on TPU.

The round-4 probes (scripts/perm_probe.py, BENCH_NOTES "Unstructured
SpMV") priced the arbitrary-table lane shuffle at 0.69 ns/elem —
Mosaic lowers it as ~a hundred roll/select bodies — which puts the
3-stage Clos permutation route at ~4.7 ns/elem, barely 4x under the
XLA gather it replaces.  A Benes network takes 2*log2(M)-1 exchange
stages instead, but every stage is a SHARED-DISTANCE exchange:

    out[i] = ctrl[i] ? in[i XOR d] : in[i]

and ``in[i XOR d]`` is two static rolls + a select (the same cheap
VPU pattern the DIA stencil kernel rides), nothing like a full
shuffle.  scripts/benes_probe.py measures the full 37-stage network
at M=2^19 on hardware; utils.permroute documents the Clos alternative
this supersedes.

This module is the BUILD-TIME half: given a permutation, compute the
per-stage control bits (the classic looping algorithm, vectorized
with numpy pointer-doubling so a 2^19-element route costs seconds,
not minutes).  Control bits pack 32 stages per int32 plane; the
kernel unpacks bit ``s`` of plane ``s // 32``.

Semantics: ``dst[i]`` is the position the element starting at ``i``
must reach; applying the stages moves it there
(``out[dst[i]] = in[i]``, verified by tests/test_benes.py).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["benes_stages", "benes_route", "pack_ctrl",
           "apply_benes_np"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_NATIVE_SO = os.path.join(_NATIVE_DIR, "libbenes_route.so")
_native_lib = None  # None = not tried, False = unavailable


def _load_native():
    """native/benes_route.cpp — the sequential looping algorithm is
    pointer chasing a vectorized numpy can't match (~30x at 2^19; the
    8-block bench-scale build paid ~80 s of numpy routing).  Same
    build-on-demand + env-gate contract as formats.mmio's parser."""
    global _native_lib
    if os.environ.get("ABFT_NO_NATIVE_BENES"):
        return None   # checked before the cache: tests flip per-case
    if _native_lib is not None:
        return _native_lib or None
    try:
        import ctypes as ct
        import subprocess

        src = os.path.join(_NATIVE_DIR, "benes_route.cpp")
        if not os.path.exists(_NATIVE_SO) or (
                os.path.getmtime(_NATIVE_SO) < os.path.getmtime(src)):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s", "libbenes_route.so"],
                check=True, capture_output=True, timeout=120)
        lib = ct.CDLL(_NATIVE_SO)
        lib.benes_route.restype = ct.c_int
        lib.benes_route.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ct.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        _native_lib = lib
    except Exception:   # noqa: BLE001 — any failure means fallback
        _native_lib = False
    return _native_lib or None


def benes_stages(M: int) -> list:
    """Exchange distances, outer-first: M/2, ..., 2, 1, 2, ..., M/2."""
    assert M >= 2 and M & (M - 1) == 0, "M must be a power of two >= 2"
    down = []
    d = M >> 1
    while d >= 1:
        down.append(d)
        d >>= 1
    return down + down[-2::-1]


def _color_level(in_sw: np.ndarray, out_sw: np.ndarray,
                 max_orbit: int = None) -> np.ndarray:
    """2-color M elements such that the two elements sharing an input
    switch get different colors, and likewise per output switch — the
    Benes looping algorithm, vectorized.

    Every switch has exactly two incident elements; the constraint
    graph is a disjoint union of even cycles alternating input/output
    switches.  ``succ(e) = in_mate(out_mate(e))`` preserves color, and
    each cycle splits into exactly two succ-orbits of opposite color;
    orbit identity comes from pointer-doubling minimum, and the orbit
    pair is ordered by comparing orbit minima through ``in_mate``.
    """
    M = len(in_sw)
    # mate[e] = the other element on e's input (resp. output) switch.
    order = np.argsort(in_sw, kind="stable")
    in_mate = np.empty(M, np.int64)
    in_mate[order[0::2]] = order[1::2]
    in_mate[order[1::2]] = order[0::2]
    order = np.argsort(out_sw, kind="stable")
    out_mate = np.empty(M, np.int64)
    out_mate[order[0::2]] = order[1::2]
    out_mate[order[1::2]] = order[0::2]
    succ = in_mate[out_mate]
    # Orbit minimum via pointer doubling.  Early exit: once a round
    # leaves rep unchanged, rep[i] <= rep[succ^(2^k)(i)] chains around
    # every orbit, so rep is already the orbit minimum — most switch
    # cycles are short, making this the common case (the full
    # log2(M)-round loop dominated build profiles).
    rep = np.arange(M)
    hop = succ
    # Orbits never cross the caller's blocks, so their length is
    # bounded by the block size — lower recursion levels need far
    # fewer doubling rounds than log2(M).
    steps = max(1, int(max_orbit or M).bit_length())
    for _ in range(steps):
        new = np.minimum(rep, rep[hop])
        if np.array_equal(new, rep):
            break
        rep = new
        hop = hop[hop]
    return (rep > rep[in_mate]).astype(np.uint8)


def benes_route(dst: np.ndarray) -> np.ndarray:
    """Control bits for routing element i -> position dst[i].

    Returns a (2*log2(M)-1, M) uint8 array aligned with
    ``benes_stages(M)``; ctrl is symmetric within each exchange pair
    (ctrl[s, i] == ctrl[s, i ^ d]).
    """
    dst = np.ascontiguousarray(dst, np.int64)
    M = len(dst)
    stages = benes_stages(M)
    m = int(M).bit_length() - 1
    lib = _load_native()
    if lib is not None:
        ctrl = np.zeros((len(stages), M), np.uint8)
        if lib.benes_route(dst, M, ctrl) == 0:
            return ctrl
    ctrl = np.zeros((len(stages), M), np.uint8)
    pos = np.arange(M)
    rd = dst.copy()          # dest relative to the current block
    for level in range(m - 1):
        n = M >> level       # block size at this level
        h = n >> 1           # exchange distance
        li = pos & (n - 1)   # block-local index
        # Global switch ids: one per (block, local pair).
        base = (pos // n) * h
        in_sw = base + (li & (h - 1))
        out_sw = base + (rd & (h - 1))
        color = _color_level(in_sw, out_sw, max_orbit=n)
        # First stage (outer, index `level`): element at the TOP pair
        # position goes to the bottom subnet iff color == 1; swap moves
        # it there.  ctrl is pair-symmetric by the coloring property.
        ctrl[level] = color ^ ((li & h) != 0)
        # Mirror stage (index 2m-2-level): the color-0 element of output
        # switch q arrives at top input q; swap iff its dest is q + h.
        last = np.zeros(M, np.uint8)
        q = (pos // n) * n + (rd & (h - 1))
        swap_bit = ((rd & h) != 0).astype(np.uint8)
        top = color == 0
        last[q[top]] = swap_bit[top]
        last[q[top] + h] = swap_bit[top]
        ctrl[2 * m - 2 - level] = last
        # Apply the first stage: positions i and i^h exchange where
        # ctrl says swap; track rd by position, then reduce to the
        # subnet-relative dest.
        sw = ctrl[level].astype(bool)
        partner = pos ^ np.where(sw, h, 0)   # involution: rd'[i] = rd[partner[i]]
        rd = rd[partner] & (h - 1)
    # Middle stage (distance 1): swap iff the element's last dest bit
    # differs from its position bit.
    mid = ((rd & 1) != (pos & 1)).astype(np.uint8)
    # Pair-symmetry check is implied; make it explicit for safety.
    assert (mid == mid[pos ^ 1]).all()
    ctrl[m - 1] = mid
    return ctrl


def apply_benes_np(x: np.ndarray, ctrl: np.ndarray) -> np.ndarray:
    """Numpy oracle of the kernel's stage application."""
    M = len(x)
    v = x.copy()
    pos = np.arange(M)
    for s, d in enumerate(benes_stages(M)):
        sw = ctrl[s].astype(bool)
        v = np.where(sw, v[pos ^ d], v)
    return v


def pack_ctrl(ctrl: np.ndarray) -> np.ndarray:
    """(S, M) uint8 -> (ceil(S/32), M) uint32, bit s in plane s//32."""
    S, M = ctrl.shape
    npl = -(-S // 32)
    out = np.zeros((npl, M), np.uint32)
    for s in range(S):
        out[s // 32] |= ctrl[s].astype(np.uint32) << np.uint32(s % 32)
    return out
