"""Protected matrix containers: flat canonical planes + ELL execution layout.

Two logical formats mirror the reference's two executables:

  - ``csr`` — codeword CSR96 ``[value_lo, value_hi, col]`` plus a row
    pointer; canonical element order is the loader's (row, col) sort
    (reference CSR/CPUContext.h:5-18).
  - ``coo`` — codeword COO128 ``[col, row, value_lo, value_hi]``; canonical
    element order is again the (row, col) sort (reference
    COO/ecc.h:11-16).

The *canonical flat planes* are the ground truth: ECC is encoded into
them at build time, fault injection flips their bits by (element index,
global bit) exactly like the reference injector, and the native C++
backend consumes them directly.

For the TPU compute path they are re-tiled into an *ELL execution
layout*: 2-D ``(R, K)`` planes grouped by output index (matrix row for
CSR; matrix column for COO — valid because the loader symmetrizes), with
``K`` = max group size, groups padded with validly-encoded zero elements
and rows padded to a multiple of 8 (f32 sublane tile).  A slot map
records where each canonical element landed so injected faults propagate.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict

import numpy as np

from ..ecc import COO128, CSR96, CodewordLayout, ECC_COL_MASK, codec
from ..ecc.values import f64_to_planes
from .loader import AssembledMatrix

__all__ = ["ProtectedMatrix", "build_protected", "FORMATS"]

FORMATS = ("csr", "coo")

_SUBLANE = 8  # float32 sublane tile; ELL row count padded to a multiple


@dataclass(frozen=True)
class ProtectedMatrix:
    """An ABFT-protected sparse matrix (host-side planes)."""

    fmt: str                      # "csr" | "coo"
    mode: str                     # ABFT mode
    N: int
    nnz: int
    layout: CodewordLayout
    planes: Dict[str, np.ndarray]   # canonical flat planes, word order
    row_ptr: np.ndarray             # (N+1,) int64 — CSR only (None for coo)
    # ELL execution layout (derived; rebuilt after injection):
    ell: Dict[str, np.ndarray]      # word name -> (R, K) uint32
    ell_len: np.ndarray             # (R,) int32 valid slots per ELL row
    ell_slot: np.ndarray            # (nnz,) int64 canonical idx -> r*K + k
    ell_gather_word: str            # which word holds the gather index
    block_size: int = 0
    num_blocks: int = 1

    @property
    def K(self) -> int:
        return self.ell[self.ell_gather_word].shape[1]

    @property
    def R(self) -> int:
        return self.ell[self.ell_gather_word].shape[0]

    def words_list(self):
        """Flat planes as a list in codeword-word order."""
        return [self.planes[n] for n in self.layout.word_names]

    def with_planes(self, planes: Dict[str, np.ndarray]) -> "ProtectedMatrix":
        """Return a copy with new flat planes and a re-derived ELL layout."""
        ell = _scatter_ell(planes, self.layout, self.ell_slot, self.R, self.K)
        return replace(self, planes=planes, ell=ell)


def _encode_planes(fmt, assembled: AssembledMatrix, mode: str):
    """Build the canonical flat planes, ECC bits included."""
    layout = CSR96 if fmt == "csr" else COO128
    if mode not in codec.MODES:
        raise ValueError(f"unknown ABFT mode: {mode!r}")
    if mode in codec.ECC_MODES and assembled.N > (1 << 24):
        raise ValueError(
            f"N={assembled.N} exceeds 2**24; ECC modes store parity bits in "
            "the high byte of the 32-bit column index"
        )
    vlo, vhi = f64_to_planes(assembled.values)
    col = assembled.cols.astype(np.uint32)
    row = assembled.rows.astype(np.uint32)
    if fmt == "csr":
        words = [vlo, vhi, col]
    else:
        words = [col, row, vlo, vhi]
    words = codec.encode(mode, words, layout)
    planes = dict(zip(layout.word_names, words))
    return layout, planes


def _scatter_ell(planes, layout, ell_slot, R, K):
    """Scatter flat planes into (R, K) ELL planes (padding pre-encoded)."""
    ell = {}
    for name in layout.word_names:
        flat = np.zeros(R * K, dtype=np.uint32)
        flat[ell_slot] = planes[name]
        ell[name] = flat.reshape(R, K)
    return ell


def build_protected(fmt: str, assembled: AssembledMatrix, mode: str) -> ProtectedMatrix:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format: {fmt!r}")
    layout, planes = _encode_planes(fmt, assembled, mode)

    rows = assembled.rows.astype(np.int64)
    cols = assembled.cols.astype(np.int64)
    N, nnz = assembled.N, assembled.nnz

    # CSR row pointer over the canonical (row, col) order.
    counts = np.bincount(rows, minlength=N)
    row_ptr = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])

    if fmt == "csr":
        # Group by matrix row; canonical order is already grouped.
        group = rows
        within = np.arange(nnz, dtype=np.int64) - row_ptr[rows]
        glen = counts
        gather_word = "col"  # low 24 bits = column index
    else:
        # Group by matrix column (the COO kernel scatters into `col`,
        # reference COO/CPUContext.cpp:119); gather index is the row word.
        group = cols
        order = np.lexsort((rows, cols))
        within = np.empty(nnz, dtype=np.int64)
        ccounts = np.bincount(cols, minlength=N)
        cptr = np.zeros(N + 1, dtype=np.int64)
        np.cumsum(ccounts, out=cptr[1:])
        within[order] = np.arange(nnz, dtype=np.int64) - cptr[cols[order]]
        glen = ccounts
        gather_word = "row"

    K = max(1, int(glen.max()) if nnz else 1)
    R = -(-N // _SUBLANE) * _SUBLANE
    ell_slot = group * K + within
    ell = _scatter_ell(planes, layout, ell_slot, R, K)
    ell_len = np.zeros(R, dtype=np.int32)
    ell_len[:N] = glen

    return ProtectedMatrix(
        fmt=fmt,
        mode=mode,
        N=N,
        nnz=nnz,
        layout=layout,
        planes=planes,
        row_ptr=row_ptr if fmt == "csr" else None,
        ell=ell,
        ell_len=ell_len,
        ell_slot=ell_slot,
        ell_gather_word=gather_word,
        block_size=assembled.block_size,
        num_blocks=assembled.num_blocks,
    )
