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

For the TPU compute path they are re-tiled into an *execution layout*:

  - **ELL** (general): 2-D ``(R, K)`` planes grouped by output index
    (matrix row for CSR; matrix column for COO — valid because the
    loader symmetrizes), ``K`` = max group size.  SpMV is gather +
    multiply + row-reduce.
  - **DIA** (banded fast path, chosen automatically): 2-D ``(D, R)``
    planes, one row per nonzero diagonal (offset = gather index − output
    index).  SpMV becomes a *stencil* — shifted multiply-adds with zero
    gathers, the shape XLA/TPU executes at HBM speed-of-light, and the
    shape whose sharded form needs only halo exchanges instead of an
    all-gather.  Selected when the matrix has few distinct diagonals and
    they fill reasonably (mesh/CFD matrices like the reference's
    shallow_water1 and its block replicas qualify).

Both layouts pad with all-zero codewords (self-consistent under every
ECC mode) and keep a slot map from canonical element index to execution
slot so injected faults propagate and error slots map back to the
canonical indices the reference prints.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict

import numpy as np

from ..ecc import COO128, CSR96, CodewordLayout, codec
from ..ecc.values import f64_to_planes
from .loader import AssembledMatrix

__all__ = ["ProtectedMatrix", "build_protected", "FORMATS"]

FORMATS = ("csr", "coo")

_SUBLANE = 8  # float32 sublane tile; ELL row count padded to a multiple

# DIA is selected when distinct diagonals <= _DIA_MAX_D and the dense
# (D, R) layout wastes at most _DIA_MAX_EXPAND x the nnz footprint.
_DIA_MAX_D = 128
_DIA_MAX_EXPAND = 4.0


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
    # Execution layout (derived; rebuilt after injection):
    exec_kind: str                  # "ell" | "dia"
    ell: Dict[str, np.ndarray]      # word name -> (R, K) or (D, R) uint32
    ell_len: np.ndarray             # (R,) int32 valid slots per output row
    ell_slot: np.ndarray            # (nnz,) int64 canonical idx -> flat slot
    ell_gather_word: str            # which word holds the gather index
    # Build-time (clean-matrix) XOR checksums of the exec planes at 8-row
    # block granularity: (num_words, R/8) uint32.  Captured at encode
    # time — fault injection must NOT refresh them (they play the role of
    # stored ECC metadata for the lazy-verification fast path).
    ell_cksum: np.ndarray = None
    # Same idea over the canonical FLAT planes, 8-element blocks —
    # consumed by the native backend's fast-scan path: (W, ceil(nnz/8)).
    flat_cksum: np.ndarray = None
    dia_offsets: tuple = ()         # DIA only: diagonal offsets, sorted
    block_size: int = 0
    num_blocks: int = 1

    @property
    def K(self) -> int:
        """ELL slots per row, or number of diagonals for DIA."""
        shp = self.ell[self.ell_gather_word].shape
        return shp[1] if self.exec_kind == "ell" else shp[0]

    @property
    def R(self) -> int:
        """Padded output-row count of the execution layout."""
        shp = self.ell[self.ell_gather_word].shape
        return shp[0] if self.exec_kind == "ell" else shp[1]

    @property
    def exec_row_axis(self) -> int:
        """Which axis of the execution planes is the output-row axis."""
        return 0 if self.exec_kind == "ell" else 1

    @property
    def exec_size(self) -> int:
        return self.ell[self.ell_gather_word].size

    def words_list(self):
        """Flat planes as a list in codeword-word order."""
        return [self.planes[n] for n in self.layout.word_names]

    def diagonal(self) -> np.ndarray:
        """(N,) main-diagonal values from the canonical planes (for the
        Jacobi preconditioner — a capability beyond the reference).

        ECC correction is applied first so a corrupted-but-correctable
        diagonal yields the same preconditioner the (corrected) matrix
        multiplication actually uses."""
        from ..ecc import ECC_COL_MASK
        from ..ecc.values import planes_to_f64_np

        words, _ = codec.check_and_correct(self.mode, self.words_list(),
                                           self.layout)
        planes = dict(zip(self.layout.word_names, words))
        cols = planes["col"]
        if self.mode in codec.ECC_MODES:
            cols = cols & ECC_COL_MASK
        cols = cols.astype(np.int64)
        if self.fmt == "csr":
            rows = np.repeat(np.arange(self.N), np.diff(self.row_ptr))
        else:
            rows = planes["row"].astype(np.int64)
        vals = planes_to_f64_np(planes["value_lo"], planes["value_hi"])
        d = np.zeros(self.N)
        sel = rows == cols
        d[rows[sel]] = vals[sel]
        return d

    def with_planes(self, planes: Dict[str, np.ndarray]) -> "ProtectedMatrix":
        """Return a copy with new flat planes and a re-derived exec layout.

        Deliberately does NOT refresh ``ell_cksum``: new planes model
        *corruption* of stored data, and the checksums are reference
        metadata captured at encode time.
        """
        shape = self.ell[self.layout.word_names[0]].shape
        ell = _scatter_exec(planes, self.layout, self.ell_slot, shape)
        return replace(self, planes=planes, ell=ell)

    def with_scrubbed_planes(self, planes: Dict[str, np.ndarray]
                             ) -> "ProtectedMatrix":
        """Like ``with_planes``, but the new planes are *repaired* data:
        the stored checksums are refreshed so the matrix is fully
        self-consistent again (what the reference's in-place write-back
        leaves behind, CSR/CPUContext.cpp:275-277)."""
        out = self.with_planes(planes)
        ell_cksum = compute_exec_checksums(out.ell, out.layout.word_names,
                                           out.exec_row_axis)
        flat_cksum = out.flat_cksum
        if flat_cksum is not None:
            nb = flat_cksum.shape[1]
            flat_cksum = np.empty_like(flat_cksum)
            for wi, name in enumerate(out.layout.word_names):
                p = np.zeros(nb * CKSUM_BLOCK, dtype=np.uint32)
                p[: out.nnz] = planes[name]
                flat_cksum[wi] = np.bitwise_xor.reduce(
                    p.reshape(nb, CKSUM_BLOCK), axis=1)
        return replace(out, ell_cksum=ell_cksum, flat_cksum=flat_cksum)


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


CKSUM_BLOCK = 8  # rows per checksum block; 8 divides every padded R and
#                  every mesh shard (shards are multiples of 8 rows)


def compute_exec_checksums(ell: Dict[str, np.ndarray], word_names,
                           row_axis: int) -> np.ndarray:
    """XOR checksums of exec planes per 8-row block -> (W, R/8) uint32."""
    out = []
    for n in word_names:
        p = ell[n]
        folded = p if p.ndim == 1 else np.bitwise_xor.reduce(
            p, axis=1 - row_axis
        )
        out.append(
            np.bitwise_xor.reduce(
                folded.reshape(-1, CKSUM_BLOCK), axis=1
            )
        )
    return np.stack(out).astype(np.uint32)


def _scatter_exec(planes, layout, slot, shape):
    """Scatter flat planes into execution planes (all-zero padding)."""
    out = {}
    for name in layout.word_names:
        flat = np.zeros(shape[0] * shape[1], dtype=np.uint32)
        flat[slot] = planes[name]
        out[name] = flat.reshape(shape)
    return out


def build_protected(fmt: str, assembled: AssembledMatrix, mode: str,
                    force_exec: str = None) -> ProtectedMatrix:
    """Encode + lay out a protected matrix.

    ``force_exec``: None = auto-select execution layout; "ell"/"dia"
    forces one (tests, benchmarking layout comparisons).
    """
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
    ell_len = np.zeros(R, dtype=np.int32)
    ell_len[:N] = glen

    # DIA detection: offset = gather index - output index.  Banded
    # matrices with few distinct diagonals get the stencil layout.
    gidx = rows if fmt == "coo" else cols
    offs = gidx - group
    uoffs, inv = np.unique(offs, return_inverse=True)
    D = len(uoffs)
    dia_ok = (
        nnz > 0
        and D <= _DIA_MAX_D
        and D * R <= _DIA_MAX_EXPAND * max(nnz, 1)
    )
    if force_exec == "ell":
        dia_ok = False
    elif force_exec == "dia" and not dia_ok:
        raise ValueError("matrix is not representable as DIA")
    if dia_ok:
        slot = inv * R + group
        # A (group, offset) collision (duplicate entries) cannot be
        # represented densely; fall back to ELL.
        dia_ok = np.unique(slot).size == nnz

    if dia_ok:
        exec_kind = "dia"
        ell_slot = slot
        ell = _scatter_exec(planes, layout, ell_slot, (D, R))
        dia_offsets = tuple(int(o) for o in uoffs)
    else:
        exec_kind = "ell"
        ell_slot = group * K + within
        ell = _scatter_exec(planes, layout, ell_slot, (R, K))
        dia_offsets = ()

    ell_cksum = compute_exec_checksums(ell, layout.word_names,
                                       0 if exec_kind == "ell" else 1)
    flat_cksum = None
    if mode in codec.ECC_MODES:  # only the native lazy paths consume it
        nb = -(-max(nnz, 1) // CKSUM_BLOCK)
        flat_cksum = np.zeros((layout.num_words, nb), dtype=np.uint32)
        for wi, name in enumerate(layout.word_names):
            p = np.zeros(nb * CKSUM_BLOCK, dtype=np.uint32)
            p[:nnz] = planes[name]
            flat_cksum[wi] = np.bitwise_xor.reduce(
                p.reshape(nb, CKSUM_BLOCK), axis=1)

    return ProtectedMatrix(
        fmt=fmt,
        mode=mode,
        N=N,
        nnz=nnz,
        layout=layout,
        planes=planes,
        row_ptr=row_ptr if fmt == "csr" else None,
        exec_kind=exec_kind,
        ell=ell,
        ell_len=ell_len,
        ell_slot=ell_slot,
        ell_gather_word=gather_word,
        ell_cksum=ell_cksum,
        flat_cksum=flat_cksum,
        dia_offsets=dia_offsets,
        block_size=assembled.block_size,
        num_blocks=assembled.num_blocks,
    )
