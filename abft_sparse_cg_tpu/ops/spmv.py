"""SpMV with fused ABFT check/correct — the framework's hot path.

TPU-first formulation: the matrix lives in an ELL execution layout
(2-D ``(R, K)`` uint32 planes grouped by output index), so the kernel is

    check/correct planes (VPU int ops)  ->  gather x  ->  multiply
    ->  masked row-sum                                    (no scatter)

This replaces the reference's two inner loops (serial COO scatter,
reference COO/CPUContext.cpp:104-121; OpenMP CSR row-gather,
CSR/CPUContext.cpp:115-133) with one dense, statically-shaped pipeline
that XLA fuses end-to-end.  Correction is value-level (correct-on-read):
the corrected element feeds the product, the stored planes are untouched
— functionally identical output to the reference's in-place write-back,
without carrying a mutable matrix through `lax.while_loop`.

Error semantics: the reference calls ``exit(1)`` from inside the kernel
(e.g. CSR/CPUContext.cpp:233); here every SpMV also returns an
``SpmvStats`` carrying an error code + flat ELL slot of the first
offending element, and the solver's while-loop condition halts on a
nonzero code.  The CLI maps slots back to canonical element indices and
reproduces the reference's exact stdout strings.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ecc import ECC_COL_MASK, OVERALL_PARITY_BIT, codec
from ..ecc.values import planes_to_value

__all__ = ["SpmvStats", "ERRCODES", "make_spmv", "spmv_dense_oracle"]

# Error codes (0 = clean). Order also defines precedence when several
# violation kinds coexist in one SpMV.
ERR_NONE = 0
ERR_SED = 1          # sed: parity failure              -> "[ECC] error detected at index %d"
ERR_DOUBLE = 2       # secded: double-bit signature     -> "[ECC] double-bit error detected"
ERR_COL_SIZE = 3     # constraints: col out of range
ERR_COL_ORDER = 4    # constraints: cols not strictly increasing in row
ERR_ROW_SIZE = 5     # constraints (coo): row out of range
ERR_ROW_ORDER = 6    # constraints (coo): rows not increasing within group

ERRCODES = {
    ERR_NONE: None,
    ERR_SED: "[ECC] error detected at index {index}",
    ERR_DOUBLE: "[ECC] double-bit error detected",
    ERR_COL_SIZE: "column size constraint violated at index {index}",
    ERR_COL_ORDER: "column order constraint violated at index {index}",
    ERR_ROW_SIZE: "row size constraint violated for index {index}",
    ERR_ROW_ORDER: "row index order violated at index {index}",
}


class SpmvStats(NamedTuple):
    """Per-SpMV ABFT outcome (all int32 scalars; -1 slots mean 'none')."""

    errcode: jnp.ndarray
    err_slot: jnp.ndarray          # flat ELL slot (r*K + k) of first error
    corrected_count: jnp.ndarray   # elements corrected this SpMV
    first_cor_slot: jnp.ndarray
    first_cor_bit: jnp.ndarray     # global codeword bit that was fixed

    @staticmethod
    def clean():
        z = jnp.int32(0)
        m = jnp.int32(-1)
        return SpmvStats(z, m, z, m, m)

    def merge_first(self, new: "SpmvStats") -> "SpmvStats":
        """Accumulate across iterations, keeping first-seen events."""
        had_err = self.errcode != 0
        had_cor = self.first_cor_slot >= 0
        return SpmvStats(
            errcode=jnp.where(had_err, self.errcode, new.errcode),
            err_slot=jnp.where(had_err, self.err_slot, new.err_slot),
            corrected_count=self.corrected_count + new.corrected_count,
            first_cor_slot=jnp.where(had_cor, self.first_cor_slot, new.first_cor_slot),
            first_cor_bit=jnp.where(had_cor, self.first_cor_bit, new.first_cor_bit),
        )


def _first_slot(flags2d):
    """(any, flat slot of first True) over a (R, K) bool plane."""
    flat = flags2d.reshape(-1)
    any_ = jnp.any(flat)
    slot = jnp.argmax(flat).astype(jnp.int32)
    return any_, jnp.where(any_, slot, jnp.int32(-1))


def make_spmv(mat, dtype=jnp.float32, mode: str = None):
    """Build ``spmv(words, ell_len, x) -> (w, SpmvStats)`` for a matrix.

    Dispatches on the matrix's execution layout: gather-based ELL for
    general sparsity, stencil DIA for banded matrices (no gathers; the
    sharded form needs only halo exchanges).

    ``words``: tuple of execution planes in codeword-word order.
    ``ell_len``: (R,) int32 valid slots per output row (ELL only).
    ``x``: (R,) vector in ``dtype`` (R >= N, zero-padded).
    """
    mode = mat.mode if mode is None else mode
    if mat.exec_kind == "dia":
        return _make_dia_spmv(mat.fmt, mode, mat.layout, mat.N,
                              mat.dia_offsets, dtype)
    return _make_ell_spmv(mat.fmt, mode, mat.layout, mat.N, dtype)


def _make_ell_spmv(fmt: str, mode: str, layout, N: int, dtype=jnp.float32):
    if mode not in codec.MODES:
        raise ValueError(f"unknown mode {mode!r}")
    names = layout.word_names
    gather_w = names.index("row" if fmt == "coo" else "col")
    col_w = names.index("col")
    vlo_w = names.index("value_lo")
    vhi_w = names.index("value_hi")
    ecc_mode = mode in codec.ECC_MODES

    def spmv(words, ell_len, x):
        R, K = words[0].shape
        kio = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
        valid = kio < ell_len[:, None]

        checked, flags = codec.check_and_correct(mode, list(words), layout)

        # Gather index: ECC bits masked out of the column word for ECC
        # modes (reference `col &= 0x00FFFFFF`); raw otherwise.  The row
        # word (COO gather) never carries ECC.
        gidx = checked[gather_w]
        if ecc_mode and gather_w == col_w:
            gidx = gidx & ECC_COL_MASK
        gidx = gidx.astype(jnp.int32)

        vals = planes_to_value(checked[vlo_w], checked[vhi_w], dtype)
        xg = x[gidx]  # XLA gather; out-of-range indices clamp
        contrib = jnp.where(valid, vals * xg, jnp.zeros((), dtype))
        w = jnp.sum(contrib, axis=1)

        # ---- stats -------------------------------------------------
        errcode = jnp.int32(ERR_NONE)
        err_slot = jnp.int32(-1)

        def raise_err(code, flags2d, errcode, err_slot):
            any_, slot = _first_slot(flags2d)
            new = jnp.logical_and(any_, errcode == ERR_NONE)
            errcode = jnp.where(new, jnp.int32(code), errcode)
            err_slot = jnp.where(new, slot, err_slot)
            return errcode, err_slot

        if mode == "sed":
            errcode, err_slot = raise_err(ERR_SED, flags["detected"], errcode, err_slot)
        elif mode == "secded":
            errcode, err_slot = raise_err(ERR_DOUBLE, flags["double"], errcode, err_slot)
        elif mode == "constraints":
            col = words[col_w]
            errcode, err_slot = raise_err(
                ERR_COL_SIZE, valid & (col >= np.uint32(N)), errcode, err_slot
            )
            if fmt == "coo":
                row = words[gather_w]
                errcode, err_slot = raise_err(
                    ERR_ROW_SIZE, valid & (row >= np.uint32(N)), errcode, err_slot
                )
                # Within a column group, rows must strictly increase
                # (equivalent to the reference's (row, col) sort checks,
                # COO/CPUContext.cpp:167-188, on our col-grouped layout).
                pair_valid = (kio[:, :-1] + 1) < ell_len[:, None]
                bad = pair_valid & (row[:, 1:] <= row[:, :-1])
                bad = jnp.pad(bad, ((0, 0), (0, 1)))
                errcode, err_slot = raise_err(ERR_ROW_ORDER, bad, errcode, err_slot)
                # The stored column must equal its group index.
                grp = jax.lax.broadcasted_iota(jnp.uint32, (R, K), 0)
                errcode, err_slot = raise_err(
                    ERR_COL_ORDER, valid & (col != grp), errcode, err_slot
                )
            else:
                # Strictly increasing columns within each row
                # (reference CSR/CPUContext.cpp:192-199).
                pair_valid = (kio[:, :-1] + 1) < ell_len[:, None]
                bad = pair_valid & (col[:, 1:] <= col[:, :-1])
                bad = jnp.pad(bad, ((0, 0), (0, 1)))
                errcode, err_slot = raise_err(ERR_COL_ORDER, bad, errcode, err_slot)

        cor_any, cor_slot = _first_slot(flags["corrected"])
        cor_count = jnp.sum(flags["corrected"], dtype=jnp.int32)
        cor_bit = jnp.where(
            cor_any,
            flags["corrected_bit"].reshape(-1)[
                jnp.maximum(cor_slot, 0)
            ].astype(jnp.int32),
            jnp.int32(-1),
        )

        stats = SpmvStats(
            errcode=errcode,
            err_slot=err_slot,
            corrected_count=cor_count,
            first_cor_slot=cor_slot,
            first_cor_bit=cor_bit,
        )
        return w, stats

    return spmv


def _shift_read(x, off):
    """y[r] = x[r + off], zero outside — a static pad+slice (no gather)."""
    R = x.shape[0]
    if off == 0:
        return x
    if off > 0:
        return jnp.pad(x[off:], (0, off))
    return jnp.pad(x[:off], (-off, 0))


def _make_dia_spmv(fmt: str, mode: str, layout, N: int, offsets, dtype):
    """Stencil SpMV over (D, R) diagonal planes.

    w[r] = sum_d value[d, r] * x[r + offset_d] — zero gathers, pure
    shifted multiply-adds; ECC check/correct stays elementwise over the
    planes.  The gather *index* is structural here: for ECC modes the
    stored index word is still fully verified/corrected (it is part of
    the codeword), it just is not needed to route the product.
    """
    if mode not in codec.MODES:
        raise ValueError(f"unknown mode {mode!r}")
    names = layout.word_names
    gather_w = names.index("row" if fmt == "coo" else "col")
    col_w = names.index("col")
    vlo_w = names.index("value_lo")
    vhi_w = names.index("value_hi")

    def spmv(words, ell_len, x):
        del ell_len  # DIA occupancy is structural (zero codewords)
        D, R = words[0].shape

        checked, flags = codec.check_and_correct(mode, list(words), layout)
        vals = planes_to_value(checked[vlo_w], checked[vhi_w], dtype)

        w = jnp.zeros((R,), dtype)
        for d, off in enumerate(offsets):
            w = w + vals[d] * _shift_read(x, off)

        errcode = jnp.int32(ERR_NONE)
        err_slot = jnp.int32(-1)

        def raise_err(code, flags2d, errcode, err_slot):
            any_, slot = _first_slot(flags2d)
            new = jnp.logical_and(any_, errcode == ERR_NONE)
            errcode = jnp.where(new, jnp.int32(code), errcode)
            err_slot = jnp.where(new, slot, err_slot)
            return errcode, err_slot

        if mode == "sed":
            errcode, err_slot = raise_err(ERR_SED, flags["detected"], errcode, err_slot)
        elif mode == "secded":
            errcode, err_slot = raise_err(ERR_DOUBLE, flags["double"], errcode, err_slot)
        elif mode == "constraints":
            # Structural invariant: an occupied slot's index words must
            # match its (diagonal, row) position exactly — a *stronger*
            # check than the reference's bounds/ordering tests, with the
            # same reporting categories.
            occupied = words[0] != 0
            for wd in words[1:]:
                occupied = occupied | (wd != 0)
            ridx = jax.lax.broadcasted_iota(jnp.int32, (D, R), 1)
            off_col = jnp.asarray(np.array(offsets, np.int32)[:, None])
            expect = ridx + off_col  # expected gather index per slot
            g = words[gather_w].astype(jnp.int32)
            bad = occupied & (g != expect)
            size_code = ERR_ROW_SIZE if fmt == "coo" else ERR_COL_SIZE
            order_code = ERR_ROW_ORDER if fmt == "coo" else ERR_COL_ORDER
            errcode, err_slot = raise_err(
                size_code, bad & (words[gather_w] >= np.uint32(N)), errcode, err_slot
            )
            errcode, err_slot = raise_err(
                order_code, bad & (words[gather_w] < np.uint32(N)), errcode, err_slot
            )
            if fmt == "coo":
                c = words[col_w].astype(jnp.int32)
                badc = occupied & (c != ridx)
                errcode, err_slot = raise_err(
                    ERR_COL_SIZE, badc & (words[col_w] >= np.uint32(N)),
                    errcode, err_slot)
                errcode, err_slot = raise_err(
                    ERR_COL_ORDER, badc & (words[col_w] < np.uint32(N)),
                    errcode, err_slot)

        cor_any, cor_slot = _first_slot(flags["corrected"])
        cor_count = jnp.sum(flags["corrected"], dtype=jnp.int32)
        cor_bit = jnp.where(
            cor_any,
            flags["corrected_bit"].reshape(-1)[
                jnp.maximum(cor_slot, 0)
            ].astype(jnp.int32),
            jnp.int32(-1),
        )

        stats = SpmvStats(
            errcode=errcode,
            err_slot=err_slot,
            corrected_count=cor_count,
            first_cor_slot=cor_slot,
            first_cor_bit=cor_bit,
        )
        return w, stats

    return spmv


def spmv_dense_oracle(mat, x: np.ndarray) -> np.ndarray:
    """NumPy dense oracle: A @ x from the canonical triplets (tests)."""
    from ..ecc.values import planes_to_f64_np

    vals = planes_to_f64_np(mat.planes["value_lo"], mat.planes["value_hi"])
    cols = (mat.planes["col"] & ECC_COL_MASK).astype(np.int64)
    if mat.fmt == "csr":
        rows = np.repeat(np.arange(mat.N), np.diff(mat.row_ptr))
        out_idx, in_idx = rows, cols
    else:
        rows = mat.planes["row"].astype(np.int64)
        out_idx, in_idx = cols, rows
    w = np.zeros(mat.N, dtype=np.float64)
    np.add.at(w, out_idx, vals * x[in_idx])
    return w
