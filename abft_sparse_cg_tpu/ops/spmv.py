"""SpMV with fused ABFT check/correct — the framework's hot path.

TPU-first formulation, two execution layouts (see formats.protected):

  - **DIA** (banded): planes ``(D, R)``; SpMV is a stencil of shifted
    multiply-adds — zero gathers.
  - **ELL** (general): transposed planes ``(K, R)`` (rows on the lane
    axis); gather + multiply + slot-axis sum — scatter-free.

Correction is value-level (correct-on-read): corrected elements feed the
product, stored planes are untouched.  Errors become codes in
``SpmvStats`` (the reference calls ``exit(1)`` from inside the kernel,
e.g. CSR/CPUContext.cpp:233); the solver's while-loop halts on a nonzero
code and the CLI renders the reference's exact strings.

Performance design — the *detect-fast / repair-rarely* schedule for the
ECC modes (sed/sec7/sec8/secded).  The reference's sec8 checks overall
parity per element and computes the 7-mask syndrome only on failure
(CSR/CPUContext.cpp:297-345), which is why sec8 costs ~1.2x while
sec7/secded cost ~4.3x (BASELINE.md).  Here the same idea is lifted to
whole-solve granularity, and extended so even secded keeps it:

  - ``fast(md, x)``: the per-iteration kernel.  Computes w from the raw
    values plus two detection signals fused into the same HBM read —
      (a) per-element overall parity (any odd-weight fault fires it);
      (b) per-8-row-block XOR checksums of every uint32 plane vs their
          build-time values (any 1- or 2-bit flip changes some block
          checksum, including double flips *within one element*, which
          cancel in (a)).
    Returns ``(w, trigger)`` — a single boolean, no stats reductions.
  - ``classify(md)``: runs only when a trigger fired (the solver exits
    its fast loop, classifies ONCE, and resumes).  Full 7-mask syndrome
    locate/correct/double-bit classify; returns stats, *scrubbed* planes
    (the reference's write-back semantics, functionally) and refreshed
    checksums, so the resumed fast loop is clean again.

Soundness: every <=2-bit fault *within one element* (the reference's
injection model) fires (a) or (b), as does any odd-weight fault and any
even-weight fault whose flips do not pairwise cancel per bit position
within an 8-row checksum block; the one blind spot is sec7 (no stored
parity bit) with the same bit flipped in two elements of one block,
which the eagerly-checking reference would correct.  >2-bit faults per
element are undefined in the reference as well (and
a miscorrection re-checksums to a self-consistent state, exactly like
the reference's in-place write-back of an aliased "correction").  The
fault-free iteration costs within a few VPU ops/element of mode "none".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ecc import ECC_COL_MASK, codec
from ..ecc.values import planes_to_value

__all__ = [
    "SpmvStats",
    "MatrixDevice",
    "SpmvImpl",
    "ERRCODES",
    "make_spmv",
    "make_constraints_check",
    "make_matrix_device",
    "spmv_dense_oracle",
]

# Error codes (0 = clean). Order defines precedence when several
# violation kinds coexist in one SpMV.
ERR_NONE = 0
ERR_SED = 1          # sed: parity failure          -> "[ECC] error detected at index %d"
ERR_DOUBLE = 2       # secded: double-bit signature -> "[ECC] double-bit error detected"
ERR_COL_SIZE = 3     # constraints: col out of range
ERR_COL_ORDER = 4    # constraints: col order violated
ERR_ROW_SIZE = 5     # constraints (coo): row out of range
ERR_ROW_ORDER = 6    # constraints (coo): row order violated
ERR_BREAKDOWN = 7    # solver: p.A.p <= 0 or non-finite residual (CG
#                      breakdown — matrix not SPD, or corrupted beyond
#                      what the active ABFT mode can see).  The reference
#                      silently NaNs here (cg.cpp:102 divides by pw
#                      unguarded); the framework fails loudly instead.
ERR_PHANTOM = 8      # detection signal fired twice in a row while
#                      classify found nothing to repair (and the scrub's
#                      checksum refresh didn't clear it): the signal
#                      itself is wrong — a kernel miscompute or hardware
#                      fault outside the codeword model.  Fail-stop
#                      instead of retrying forever; the reference has no
#                      analogous state (it has no separate signal path).

# Constraint-violation strings differ between the reference's two
# executables (CSR/CPUContext.cpp:175-198 vs COO/CPUContext.cpp:158-185);
# ERRCODES is keyed by format to reproduce each verbatim.
_COMMON = {
    ERR_NONE: None,
    ERR_SED: "[ECC] error detected at index {index}",
    ERR_DOUBLE: "[ECC] double-bit error detected",
    ERR_BREAKDOWN: "[CG] breakdown detected: p.A.p is not positive "
                   "(matrix is not SPD, or corrupted beyond detection)",
    ERR_PHANTOM: "[ECC] persistent error signal with no locatable fault "
                 "(kernel or hardware miscompute suspected)",
}
ERRCODES = {
    "csr": {
        **_COMMON,
        ERR_COL_SIZE: "column size constraint violated at index {index}",
        ERR_COL_ORDER: "column order constraint violated at index {index}",
        ERR_ROW_SIZE: "row size constraint violated for row {index}",
        ERR_ROW_ORDER: "row order constraint violated for row{index}",
    },
    "coo": {
        **_COMMON,
        ERR_COL_SIZE: "column size constraint violated for index {index}",
        ERR_COL_ORDER: "column index order violated at index {index}",
        ERR_ROW_SIZE: "row size constraint violated for index {index}",
        ERR_ROW_ORDER: "row index order violated at index {index}",
    },
}


class SpmvStats(NamedTuple):
    """Per-SpMV ABFT outcome (all int32 scalars; -1 slots mean 'none')."""

    errcode: jnp.ndarray
    err_slot: jnp.ndarray          # flat exec slot of first error
    corrected_count: jnp.ndarray
    first_cor_slot: jnp.ndarray
    first_cor_bit: jnp.ndarray

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


class MatrixDevice(NamedTuple):
    """Device-resident matrix: exec planes + metadata the kernels need."""

    words: tuple                  # exec planes, codeword-word order
    ell_len: jnp.ndarray          # (R,) int32 — ELL only (zeros for DIA)
    cksum: jnp.ndarray            # (num_words, R/8) uint32 block checksums
    #                               (build-time values; see
    #                                formats.protected.compute_exec_checksums)
    values: jnp.ndarray = None    # compute-dtype value plane, derived ONCE
    #                               from the binary64 bit-planes (the f64->
    #                               f32 reconstruction costs more VPU time
    #                               than the whole stencil; doing it per
    #                               iteration halves SpMV throughput).
    #                               Re-derived by classify() after a scrub.
    flat_group: jnp.ndarray = None  # flat layout only: (nnz_pad,) int32
    #                               output index per exec slot (sorted —
    #                               the segment ids of the row reduce)
    gidx: jnp.ndarray = None      # (K, R) int32 exec-space gather indices —
    #                               only when an RCM reordering is active
    #                               (formats.reorder): the stored codeword
    #                               holds the *canonical* index, and mapping
    #                               it through the permutation per iteration
    #                               would be a gather of its own.  Derived
    #                               once at upload; re-derived on scrub.
    perm_pos: jnp.ndarray = None  # (R,) int32 canonical row -> exec row
    #                               (classify()'s re-derivation needs it)
    dense_td: jnp.ndarray = None   # bordered-split flat tails only:
    #                               (T, S) span-densified outlier ROWS —
    #                               the fast path's gather-free matvec
    #                               replacement for the dense rows.
    #                               Re-derived by classify() on scrub.
    dense_tb: jnp.ndarray = None   # (T, S) span-densified transpose
    #                               images (entries whose gather SOURCE
    #                               is outlier t, windowed by their
    #                               output row) — the fast path becomes
    #                               T windowed AXPYs, no scatter.
    fold: jnp.ndarray = None       # ECC modes: the rotated XOR fold of
    #                               the word planes (ecc.fold), derived
    #                               at upload like `values` — the ONE
    #                               plane the kernel tiers stream for
    #                               live detection instead of all W
    #                               words.  Carries any plane
    #                               corruption (derived from the same
    #                               source as `values`); re-derived by
    #                               classify() after a scrub.
    fold_ck: jnp.ndarray = None    # (1, R/8) uint32 — the fold of the
    #                               stored encode-time checksums (valid
    #                               by XOR-linearity; ecc.fold
    #                               docstring): the fold plane's
    #                               trigger baseline.
    unstr: tuple = None            # flat unstructured matrices on the
    #                               Benes-route kernel tier only
    #                               (ops.spmv_unstructured.derive_unstr):
    #                               (vals_cs, idx, ctrl1, ctrl2) —
    #                               col-sorted value + packed gather
    #                               index planes + packed exchange
    #                               controls.  Derived at upload,
    #                               re-derived on scrub.


class SpmvImpl(NamedTuple):
    """A (target, mode) SpMV implementation, in solver-consumable form.

    ``full(md, x) -> (w, SpmvStats)`` — single-call check+compute (used
    by the simple solver loop, the driver's verification pass, and as
    the semantic oracle).
    ``fast(md, x) -> (w, trigger)`` — detection-only hot-loop kernel
    (None when the mode has no lazy schedule).
    ``classify(md) -> (SpmvStats, MatrixDevice)`` — one-shot locate /
    correct / fail-stop classify; returns scrubbed+re-checksummed planes
    (None when the mode has no lazy schedule).
    ``fast_pw(md, x) -> (w, trigger, pw)`` — like ``fast`` but also
    returns the fused reduction ``pw = dot(x, w)``, saving the hot loop
    a separate kernel pass that would re-read both vectors from HBM
    (the CG iteration consumes exactly this dot, cg.cpp:100).  None
    when the implementation has no fused form.
    """

    full: object
    fast: object = None
    classify: object = None
    fast_pw: object = None


def _first_slot(flags2d):
    flat = flags2d.reshape(-1)
    any_ = jnp.any(flat)
    slot = jnp.argmax(flat).astype(jnp.int32)
    return any_, jnp.where(any_, slot, jnp.int32(-1))


def exec_gather_host(mat) -> np.ndarray:
    """Host-side exec-space gather-index plane for a permuted ELL matrix:
    the stored codeword index mapped through the RCM permutation (clipped
    — a corrupted index still poisons the product, and detection happens
    on the raw planes)."""
    from ..formats.reorder import inverse_permutation

    pos = inverse_permutation(mat.perm)
    g = mat.ell[mat.ell_gather_word]
    if mat.mode in codec.ECC_MODES and mat.ell_gather_word == "col":
        g = g & np.uint32(ECC_COL_MASK)
    return pos[np.clip(g.astype(np.int64), 0, mat.N - 1)].astype(np.int32)


_DENSE_MAX_T = 64       # outlier count cap (the T-way select unroll)
_DENSE_MAX_PLANES = 4   # td bytes cap, in value-plane (R*4) equivalents


def dense_tail_plan(mat, outliers_canonical):
    """Build-time (CLEAN structure) plan for a bordered tail's
    gather-free fast path; None when it doesn't apply.  Called by
    formats.split on the freshly built tail — the plan's statics must
    come from the clean planes, never the fault-exposed ones (a corrupt
    span-defining entry would otherwise shrink the span and silently
    drop the healed entry after a scrub).

    ``rows_exec``: (T,) exec rows of the outliers.  Each outlier row is
    densified over its column SPAN only — after block replication a
    dense row touches just its own block, so spans stay ~block-sized:
    window ``starts[t] .. starts[t]+S`` with one shared padded width S.
    """
    if mat.exec_kind != "flat" or len(outliers_canonical) > _DENSE_MAX_T:
        return None
    if mat.perm is not None:
        from ..formats.reorder import inverse_permutation

        pos = inverse_permutation(mat.perm)
        rows = pos[np.asarray(outliers_canonical)]
    else:
        pos = None
        rows = np.asarray(outliers_canonical)
    rows = rows.astype(np.int32)
    T = len(rows)
    # Per-entry dst / src in exec space, from the (clean) host planes.
    dst = np.asarray(mat.ell["__flat_group__"])[: mat.nnz]
    g = np.asarray(mat.ell[mat.ell_gather_word])[: mat.nnz]
    if mat.ell_gather_word == "col" and mat.mode in codec.ECC_MODES:
        g = g & np.uint32(ECC_COL_MASK)
    src = g.astype(np.int64)
    if pos is not None:
        src = pos[np.clip(src, 0, mat.N - 1)]
    tbl = np.full(mat.R, -1, np.int32)
    tbl[rows] = np.arange(T, dtype=np.int32)
    tdst = tbl[np.clip(dst, 0, mat.R - 1)]
    a_mask = tdst >= 0
    # 128-aligned windows: starts round down, S covers the rounded
    # span — so a (rows, 128)-tiled kernel can address the windows with
    # static row slices.
    starts = np.zeros(T, np.int64)
    spans = np.ones(T, np.int64)
    for t in range(T):
        s = src[a_mask & (tdst == t)]
        if len(s):
            starts[t] = (s.min() // 128) * 128
            spans[t] = s.max() - starts[t] + 1
    S = int(-(-spans.max() // 128) * 128)
    if mat.R % 128 or S > mat.R or T * S > _DENSE_MAX_PLANES * mat.R:
        return None
    starts = np.minimum(starts, mat.R - S)  # stays 128-aligned (R is)
    # Coverage proof: the device-side densify drops any entry whose
    # destination falls outside its outlier's window (mode="drop"), so
    # the plan is only sound if EVERY tail entry lands inside one.  Row
    # entries (output row = outlier t) index the window by their gather
    # source; the remaining entries must be transpose images (gather
    # source = outlier t) indexed by their output row — guaranteed by
    # the loader's symmetrization, but a structurally non-symmetric
    # assembly would silently compute a wrong fast product with no
    # detection signal.  Verify on the host and fall back to the gather
    # path (None) instead.
    tsrc = tbl[np.clip(src, 0, mat.R - 1)]
    in_win = lambda t, idx: (  # noqa: E731
        (idx >= starts[t]) & (idx < starts[t] + S))
    covered = np.where(
        a_mask, in_win(np.maximum(tdst, 0), src),
        (tsrc >= 0) & in_win(np.maximum(tsrc, 0), dst))
    if not covered.all():
        return None
    return (tuple(int(r) for r in rows),
            tuple(int(s) for s in starts), S)


def make_matrix_device(mat, dtype=jnp.float32):
    """Upload a ProtectedMatrix's execution layout to the default device.

    The value plane is derived on device with the same truncating
    conversion classify() uses after a scrub, so fast-path values are
    bit-identical before and after a repair cycle.

    Composite (bordered-split) matrices upload as a (main, tail) pair.
    """
    if mat.exec_kind == "split":
        return (make_matrix_device(mat.main, dtype),
                make_matrix_device(mat.tail, dtype))
    words = tuple(jnp.asarray(mat.ell[n]) for n in mat.layout.word_names)
    vlo = mat.layout.word_names.index("value_lo")
    vhi = mat.layout.word_names.index("value_hi")
    gidx = perm_pos = flat_group = None
    if mat.perm is not None and mat.exec_kind in ("ell", "flat"):
        from ..formats.reorder import inverse_permutation

        gidx = jnp.asarray(exec_gather_host(mat))
        pp = np.zeros(mat.R, dtype=np.int32)
        pp[: mat.N] = inverse_permutation(mat.perm)
        perm_pos = jnp.asarray(pp)
    if mat.exec_kind == "flat":
        flat_group = jnp.asarray(mat.ell["__flat_group__"])
    values = planes_to_value(words[vlo], words[vhi], dtype)
    dense_td = dense_tb = None
    if mat.exec_kind == "flat" and getattr(mat, "dense_plan",
                                           None) is not None:
        cfg = _FlatConfig(mat.fmt, mat.layout, mat.N, mat.nnz, mat.R,
                          ecc_mode=mat.mode in codec.ECC_MODES,
                          dense_plan=mat.dense_plan)
        dense_td, dense_tb = cfg.dense_arrays(
            words, values, flat_group, perm_pos)
    fold = fold_ck = None
    if mat.mode in codec.ECC_MODES:
        # All exec kinds: dia/ell kernels stream it live; flat split
        # tails stream it inside the megakernel's tail pass.
        from ..ecc.fold import fold_words

        fold = fold_words(words)
        fold_ck = fold_words(list(jnp.asarray(mat.ell_cksum)))[None, :]
    unstr = None
    if mat.exec_kind == "flat":
        # Benes-route tier arrays (pallas target; see
        # ops.spmv_unstructured).  Built here so the device build stays
        # the single source of derived planes; plan construction is
        # content-cached, so repeated uploads of the same matrix pay
        # the routing once.
        from .spmv_unstructured import (
            derive_unstr,
            unstructured_plan,
            wants_unstructured,
        )

        if wants_unstructured(mat):
            plan = unstructured_plan(mat)
            if plan is not None:
                unstr = derive_unstr(mat, plan, list(words), values)
    return MatrixDevice(
        words=words,
        ell_len=jnp.asarray(mat.ell_len),
        cksum=jnp.asarray(mat.ell_cksum),
        values=values,
        flat_group=flat_group,
        gidx=gidx,
        perm_pos=perm_pos,
        dense_td=dense_td,
        dense_tb=dense_tb,
        fold=fold,
        fold_ck=fold_ck,
        unstr=unstr,
    )


def _fold_blocks(plane, row_axis):
    """XOR-fold one plane to its (R/8,) block checksums.

    Folds run along unsharded axes or within 8-row blocks that never
    straddle a shard, so under GSPMD no cross-device XOR reduction is
    ever needed (xor all-reduce is not universally supported).
    """
    folded = plane if plane.ndim == 1 else jnp.bitwise_xor.reduce(
        plane, axis=1 - row_axis
    )
    return jnp.bitwise_xor.reduce(folded.reshape(-1, 8), axis=1)


def _device_checksums(words, row_axis):
    return jnp.stack([_fold_blocks(p, row_axis) for p in words])


def _cksum_mismatch(md, row_axis, words_idx=None):
    """Any 8-row-block XOR differing from its build-time value?

    ``words_idx``: restrict the scan to these word planes (the lazy
    constraints schedule checks only the index words its structural
    invariants read — the reference never validates values in
    constraints mode, CSR/CPUContext.cpp:162-207)."""
    bad = None
    for w, plane in enumerate(md.words):
        if words_idx is not None and w not in words_idx:
            continue
        m = _fold_blocks(plane, row_axis) != md.cksum[w]
        bad = m if bad is None else (bad | m)
    return jnp.any(bad)


def _parity_any(words):
    """Does any element fail overall parity? One cheap fused pass."""
    acc = words[0]
    for w in words[1:]:
        acc = acc ^ w
    return jnp.any(jax.lax.population_count(acc) & np.uint32(1))


def _corrected_stats(flags, errcode, err_slot):
    cor_any, cor_slot = _first_slot(flags["corrected"])
    cor_count = jnp.sum(flags["corrected"], dtype=jnp.int32)
    cor_bit = jnp.where(
        cor_any,
        flags["corrected_bit"].reshape(-1)[jnp.maximum(cor_slot, 0)].astype(jnp.int32),
        jnp.int32(-1),
    )
    return SpmvStats(
        errcode=errcode,
        err_slot=err_slot,
        corrected_count=cor_count,
        first_cor_slot=cor_slot,
        first_cor_bit=cor_bit,
    )


def _raise_err(code, flags2d, errcode, err_slot):
    any_, slot = _first_slot(flags2d)
    new = jnp.logical_and(any_, errcode == ERR_NONE)
    errcode = jnp.where(new, jnp.int32(code), errcode)
    err_slot = jnp.where(new, slot, err_slot)
    return errcode, err_slot


def make_constraints_check(mat):
    """``check(md) -> SpmvStats`` running only the constraints-mode
    structural checks (no product, no gather) — lets a kernel backend
    pair its own compute with the reference checks."""
    if mat.exec_kind == "dia":
        cfg = _DiaConfig(mat.fmt, mat.layout, mat.N, mat.dia_offsets)
    elif mat.exec_kind == "flat":
        cfg = _FlatConfig(mat.fmt, mat.layout, mat.N, mat.nnz, mat.R,
                          ecc_mode=False)
    else:
        cfg = _EllConfig(mat.fmt, mat.layout, mat.N, ecc_mode=False)

    def check(md: MatrixDevice) -> SpmvStats:
        errcode, err_slot = cfg.constraints(md, jnp.int32(ERR_NONE),
                                            jnp.int32(-1))
        return SpmvStats(errcode, err_slot, jnp.int32(0), jnp.int32(-1),
                         jnp.int32(-1))

    return check


def combine_impls(impl_a: SpmvImpl, impl_b: SpmvImpl,
                  slot_offset: int) -> SpmvImpl:
    """Compose two part implementations into one (bordered split):
    w = w_a + w_b, triggers OR, stats merged with part-b exec slots
    offset past part a's exec size so the host can route them back."""

    def shift(st: SpmvStats) -> SpmvStats:
        off = jnp.int32(slot_offset)
        return st._replace(
            err_slot=jnp.where(st.err_slot >= 0, st.err_slot + off,
                               st.err_slot),
            first_cor_slot=jnp.where(st.first_cor_slot >= 0,
                                     st.first_cor_slot + off,
                                     st.first_cor_slot),
        )

    full = fast = fast_pw = classify = None
    if impl_a.full is not None and impl_b.full is not None:
        def full(md, x):
            wa, sa = impl_a.full(md[0], x)
            wb, sb = impl_b.full(md[1], x)
            return wa + wb, sa.merge_first(shift(sb))

    if impl_a.fast is not None and impl_b.fast is not None:
        def fast(md, x):
            wa, ta = impl_a.fast(md[0], x)
            wb, tb = impl_b.fast(md[1], x)
            return wa + wb, ta | tb
    if impl_a.fast_pw is not None and impl_b.fast_pw is not None:
        def fast_pw(md, x):
            wa, ta, pa = impl_a.fast_pw(md[0], x)
            wb, tb, pb = impl_b.fast_pw(md[1], x)
            return wa + wb, ta | tb, pa + pb
    if impl_a.classify is not None and impl_b.classify is not None:
        def classify(md):
            sa, mda = impl_a.classify(md[0])
            sb, mdb = impl_b.classify(md[1])
            return sa.merge_first(shift(sb)), (mda, mdb)

    return SpmvImpl(full=full, fast=fast, classify=classify,
                    fast_pw=fast_pw)


def make_spmv(mat, dtype=jnp.float32, mode: str = None) -> SpmvImpl:
    """Build the SpmvImpl (full / fast / classify) for a matrix config.

    ``x`` is an (R,) vector in ``dtype`` (R >= N, zero-padded).
    """
    mode = mat.mode if mode is None else mode
    if mode not in codec.MODES:
        raise ValueError(f"unknown mode {mode!r}")
    if mat.exec_kind == "split":
        return combine_impls(make_spmv(mat.main, dtype, mode),
                             make_spmv(mat.tail, dtype, mode),
                             mat.main.exec_size)
    if mat.exec_kind == "dia":
        cfg = _DiaConfig(mat.fmt, mat.layout, mat.N, mat.dia_offsets)
    elif mat.exec_kind == "flat":
        cfg = _FlatConfig(mat.fmt, mat.layout, mat.N, mat.nnz, mat.R,
                          ecc_mode=mode in codec.ECC_MODES,
                          dense_plan=getattr(mat, "dense_plan", None))
    else:
        # The reference masks the ECC byte out of the column only in ECC
        # modes (`col &= 0x00FFFFFF`, CSR/CPUContext.cpp:237); none/
        # constraints use the raw column.
        cfg = _EllConfig(mat.fmt, mat.layout, mat.N,
                         ecc_mode=mode in codec.ECC_MODES)
    row_axis = 1  # rows on the lane axis for 2-D layouts; flat is 1-D

    # ---- full: single-call check+compute (semantic oracle) -----------

    def full(md: MatrixDevice, x):
        if mode == "none":
            w = cfg.compute_w(md, list(md.words), x, dtype, values=md.values,
                              stored=True)
            return w, SpmvStats.clean()

        if mode == "constraints":
            errcode, err_slot = cfg.constraints(md, jnp.int32(ERR_NONE),
                                                jnp.int32(-1))
            w = cfg.compute_w(md, list(md.words), x, dtype, values=md.values,
                              stored=True)
            return w, SpmvStats(errcode, err_slot, jnp.int32(0),
                                jnp.int32(-1), jnp.int32(-1))

        checked, flags = codec.check_and_correct(mode, list(md.words),
                                                 cfg.layout)
        errcode = jnp.int32(ERR_NONE)
        err_slot = jnp.int32(-1)
        if mode == "sed":
            errcode, err_slot = _raise_err(ERR_SED, flags["detected"],
                                           errcode, err_slot)
        elif mode == "secded":
            errcode, err_slot = _raise_err(ERR_DOUBLE, flags["double"],
                                           errcode, err_slot)
        w = cfg.compute_w(md, checked, x, dtype)
        return w, _corrected_stats(flags, errcode, err_slot)

    if mode in ("none", "constraints"):
        if mode == "none":
            def fast_pw_none(md, x):
                w = cfg.compute_w(md, list(md.words), x, dtype,
                                  values=md.values, stored=True)
                return w, jnp.bool_(False), jnp.sum(x * w)

            return SpmvImpl(full=full, fast_pw=fast_pw_none)

        # Constraints lazy schedule (detect-fast / check-rarely): the
        # structural invariants are over STATIC index data protected by
        # the same build-time block checksums, so the hot loop only
        # scans the index-word checksums (the reference re-checks every
        # element every SpMV, CSR/CPUContext.cpp:162-207 — +8% there,
        # but a full structural pass per iteration here).  On a trigger
        # the solver classifies ONCE: a violation fail-stops with the
        # reference's exact strings; an index change that violates no
        # constraint (which the reference would consume silently) is
        # adopted — checksums refresh so the loop stays fast.  Value
        # flips never trigger (the reference never validates values in
        # this mode); see PARITY.md for the padding-slot scope note.
        check_words = tuple(sorted({cfg.gather_w, cfg.col_w}))

        def fast_cons(md: MatrixDevice, x):
            w = cfg.compute_w(md, list(md.words), x, dtype,
                              values=md.values, stored=True)
            return w, _cksum_mismatch(md, row_axis, check_words)

        def fast_pw_cons(md: MatrixDevice, x):
            w, trigger = fast_cons(md, x)
            return w, trigger, jnp.sum(x * w)

        def classify_cons(md: MatrixDevice):
            errcode, err_slot = cfg.constraints(md, jnp.int32(ERR_NONE),
                                                jnp.int32(-1))
            stats = SpmvStats(errcode, err_slot, jnp.int32(0),
                              jnp.int32(-1), jnp.int32(-1))
            md2 = md._replace(
                cksum=_device_checksums(md.words, row_axis))
            return stats, md2

        return SpmvImpl(full=full, fast=fast_cons,
                        classify=classify_cons, fast_pw=fast_pw_cons)

    # ---- fast: hot-loop kernel, detection signals only ---------------

    def fast(md: MatrixDevice, x):
        if md.values is None:
            raise ValueError(
                "MatrixDevice.values is required — build with make_matrix_device"
            )
        w = cfg.compute_w(md, list(md.words), x, dtype, values=md.values,
                          stored=True)
        if mode == "sec7":
            trigger = _cksum_mismatch(md, row_axis)  # no parity bit stored
        elif mode in ("sed", "sec8"):
            trigger = _parity_any(md.words)
        else:  # secded: parity for odd-weight, checksum for even-weight
            trigger = _parity_any(md.words) | _cksum_mismatch(md, row_axis)
        return w, trigger

    def fast_pw(md: MatrixDevice, x):
        w, trigger = fast(md, x)
        return w, trigger, jnp.sum(x * w)

    # ---- classify: one-shot locate/correct/fail-stop + scrub ---------

    def classify(md: MatrixDevice):
        checked, flags = codec.check_and_correct(mode, list(md.words),
                                                 cfg.layout)
        errcode = jnp.int32(ERR_NONE)
        err_slot = jnp.int32(-1)
        if mode == "sed":
            errcode, err_slot = _raise_err(ERR_SED, flags["detected"],
                                           errcode, err_slot)
        elif mode == "secded":
            errcode, err_slot = _raise_err(ERR_DOUBLE, flags["double"],
                                           errcode, err_slot)
        stats = _corrected_stats(flags, errcode, err_slot)
        # Scrub: adopt the corrected planes and re-derive their checksums
        # (the functional analogue of the reference's in-place write-back,
        # CSR/CPUContext.cpp:275-277 — after repair, stored data is
        # self-consistent again, so the fast loop stays fast).
        gidx2 = md.gidx
        if gidx2 is not None:
            gidx2 = cfg.gather_indices(md, checked, stored=False)
        values2 = planes_to_value(checked[cfg.vlo_w], checked[cfg.vhi_w],
                                  dtype)
        dense_td2, dense_tb2 = md.dense_td, md.dense_tb
        if md.dense_td is not None:
            # Re-derive the densified-tail arrays from the scrubbed
            # words: a corrupted index plane mis-routes its entry
            # until the repair lands.
            dense_td2, dense_tb2 = cfg.dense_arrays(
                checked, values2, md.flat_group, md.perm_pos)
        unstr2 = None
        if md.unstr is not None:
            # Benes-route tier: re-derive the col-sorted value/index
            # planes from the adopted words (controls are clean
            # structure, pass through) — the kernel heals with the
            # scrub and the loop-carry pytree keeps its structure.
            from .spmv_unstructured import derive_unstr, unstructured_plan

            fresh = derive_unstr(mat, unstructured_plan(mat), checked,
                                 values2)
            unstr2 = tuple(f[:2] + tuple(o[2:])
                           for f, o in zip(fresh, md.unstr))
        fold2 = fold_ck2 = None
        cksum2 = _device_checksums(checked, row_axis)
        if md.fold is not None:
            # The fold plane and its baseline follow the scrub exactly
            # like `values`: derived from the adopted planes / refreshed
            # checksums, so the fast loop's one-plane stream stays
            # consistent after a repair cycle.
            from ..ecc.fold import fold_words

            fold2 = fold_words(list(checked))
            fold_ck2 = fold_words(list(cksum2))[None, :]
        md2 = MatrixDevice(
            words=tuple(checked),
            ell_len=md.ell_len,
            cksum=cksum2,
            values=values2,
            flat_group=md.flat_group,
            gidx=gidx2,
            perm_pos=md.perm_pos,
            dense_td=dense_td2,
            dense_tb=dense_tb2,
            fold=fold2,
            fold_ck=fold_ck2,
            unstr=unstr2,
        )
        return stats, md2

    return SpmvImpl(full=full, fast=fast, classify=classify,
                    fast_pw=fast_pw)


# --------------------------------------------------------------------------
# DIA: stencil over (D, R) planes
# --------------------------------------------------------------------------

def _shift_read(x, off):
    """y[r] = x[r + off], zero outside — a static pad+slice (no gather)."""
    if off == 0:
        return x
    if off > 0:
        return jnp.pad(x[off:], (0, off))
    return jnp.pad(x[:off], (-off, 0))


class _DiaConfig:
    def __init__(self, fmt, layout, N, offsets):
        self.fmt = fmt
        self.layout = layout
        self.N = N
        self.offsets = offsets
        names = layout.word_names
        self.gather_w = names.index("row" if fmt == "coo" else "col")
        self.col_w = names.index("col")
        self.vlo_w = names.index("value_lo")
        self.vhi_w = names.index("value_hi")

    def compute_w(self, md, words, x, dtype, values=None, stored=False):
        vals = values if values is not None else planes_to_value(
            words[self.vlo_w], words[self.vhi_w], dtype
        )
        # Pad x once; per-diagonal reads are then static slices of the
        # padded buffer, which XLA fuses as offset reads (padding per
        # diagonal would materialize D shifted copies).
        R = x.shape[0]
        pad_lo = max(0, -min(self.offsets))
        pad_hi = max(0, max(self.offsets))
        xp = jnp.pad(x, (pad_lo, pad_hi)) if (pad_lo or pad_hi) else x
        w = jnp.zeros_like(x)
        for d, off in enumerate(self.offsets):
            s = pad_lo + off
            w = w + vals[d] * jax.lax.slice(xp, (s,), (s + R,))
        return w

    def constraints(self, md, errcode, err_slot):
        """Structural invariant: an occupied slot's index words must match
        its (diagonal, row) position — a stronger form of the reference's
        bounds/ordering checks, same reporting categories."""
        words = md.words
        D, R = words[0].shape
        occupied = words[0] != 0
        for wd in words[1:]:
            occupied = occupied | (wd != 0)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (D, R), 1)
        off_col = jnp.asarray(np.array(self.offsets, np.int32)[:, None])
        expect = ridx + off_col
        g = words[self.gather_w].astype(jnp.int32)
        bad = occupied & (g != expect)
        size_code = ERR_ROW_SIZE if self.fmt == "coo" else ERR_COL_SIZE
        order_code = ERR_ROW_ORDER if self.fmt == "coo" else ERR_COL_ORDER
        errcode, err_slot = _raise_err(
            size_code, bad & (words[self.gather_w] >= np.uint32(self.N)),
            errcode, err_slot)
        errcode, err_slot = _raise_err(
            order_code, bad & (words[self.gather_w] < np.uint32(self.N)),
            errcode, err_slot)
        if self.fmt == "coo":
            badc = occupied & (words[self.col_w].astype(jnp.int32) != ridx)
            errcode, err_slot = _raise_err(
                ERR_COL_SIZE, badc & (words[self.col_w] >= np.uint32(self.N)),
                errcode, err_slot)
            errcode, err_slot = _raise_err(
                ERR_COL_ORDER, badc & (words[self.col_w] < np.uint32(self.N)),
                errcode, err_slot)
        return errcode, err_slot


# --------------------------------------------------------------------------
# ELL: gather over transposed (K, R) planes — slots on sublanes, rows on
# the 128-wide lane axis (an (R, K) layout with small K pads its minor
# dim to 128 on TPU and wastes the HBM traffic).
# --------------------------------------------------------------------------

class _EllConfig:
    def __init__(self, fmt, layout, N, ecc_mode=True):
        self.fmt = fmt
        self.layout = layout
        self.N = N
        names = layout.word_names
        self.gather_w = names.index("row" if fmt == "coo" else "col")
        self.col_w = names.index("col")
        self.vlo_w = names.index("value_lo")
        self.vhi_w = names.index("value_hi")
        self.ecc_gather_mask = ecc_mode and self.gather_w == self.col_w

    def _valid(self, md):
        K, R = md.words[0].shape
        kio = jax.lax.broadcasted_iota(jnp.int32, (K, R), 0)
        return kio < md.ell_len[None, :], kio

    def gather_indices(self, md, words, stored=False):
        """Exec-space gather indices.  ``stored=True`` means ``words``
        are the resident planes, so the pre-derived ``md.gidx`` (RCM
        case) applies; otherwise (scrubbed/corrected words) the index is
        re-mapped through the permutation — a device gather, acceptable
        on the rare classify path only."""
        if stored and md.gidx is not None:
            return md.gidx
        gidx = words[self.gather_w]
        if self.ecc_gather_mask:
            gidx = gidx & ECC_COL_MASK
        gidx = gidx.astype(jnp.int32)
        if md.perm_pos is not None:
            gidx = md.perm_pos[gidx]  # out-of-range clamps
        return gidx

    def compute_w(self, md, words, x, dtype, values=None, stored=False):
        valid, _ = self._valid(md)
        gidx = self.gather_indices(md, words, stored)
        vals = values if values is not None else planes_to_value(
            words[self.vlo_w], words[self.vhi_w], dtype
        )
        xg = x[gidx]  # XLA gather; out-of-range clamps
        contrib = jnp.where(valid, vals * xg, jnp.zeros((), dtype))
        return jnp.sum(contrib, axis=0)

    def constraints(self, md, errcode, err_slot):
        words = md.words
        valid, kio = self._valid(md)
        col = words[self.col_w]
        errcode, err_slot = _raise_err(
            ERR_COL_SIZE, valid & (col >= np.uint32(self.N)), errcode, err_slot)
        pair_valid = (kio[:-1, :] + 1) < md.ell_len[None, :]
        if self.fmt == "coo":
            row = words[self.gather_w]
            errcode, err_slot = _raise_err(
                ERR_ROW_SIZE, valid & (row >= np.uint32(self.N)), errcode, err_slot)
            bad = pair_valid & (row[1:, :] <= row[:-1, :])
            bad = jnp.pad(bad, ((0, 1), (0, 0)))
            errcode, err_slot = _raise_err(ERR_ROW_ORDER, bad, errcode, err_slot)
            K, R = words[0].shape
            grp = jax.lax.broadcasted_iota(jnp.uint32, (K, R), 1)
            errcode, err_slot = _raise_err(
                ERR_COL_ORDER, valid & (col != grp), errcode, err_slot)
        else:
            bad = pair_valid & (col[1:, :] <= col[:-1, :])
            bad = jnp.pad(bad, ((0, 1), (0, 0)))
            errcode, err_slot = _raise_err(ERR_COL_ORDER, bad, errcode, err_slot)
        return errcode, err_slot


# --------------------------------------------------------------------------
# FLAT: 1-D exec-sorted canonical planes — the memory-safe fallback for
# matrices whose ELL padding would explode (a few dense rows).  Storage
# is proportional to nnz like the reference's CSR; SpMV is gather +
# sorted segment-sum (the slow-but-correct general path).
# --------------------------------------------------------------------------

class _FlatConfig:
    def __init__(self, fmt, layout, N, nnz, R, ecc_mode=True,
                 dense_plan=None):
        self.fmt = fmt
        self.layout = layout
        self.N = N
        self.nnz = nnz
        self.R = R
        names = layout.word_names
        self.gather_w = names.index("row" if fmt == "coo" else "col")
        self.col_w = names.index("col")
        self.vlo_w = names.index("value_lo")
        self.vhi_w = names.index("value_hi")
        self.ecc_gather_mask = ecc_mode and self.gather_w == self.col_w
        # Bordered-split tails: (outlier exec rows, span starts, S) —
        # clean build-time structural data (dense_tail_plan), enables
        # the gather-free fast path below.
        self.dense_plan = dense_plan

    def _valid(self, md):
        E = md.words[0].shape[0]
        return jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)[:, 0] < self.nnz

    def gather_indices(self, md, words, stored=False):
        if stored and md.gidx is not None:
            return md.gidx
        gidx = words[self.gather_w]
        if self.ecc_gather_mask:
            gidx = gidx & ECC_COL_MASK
        gidx = gidx.astype(jnp.int32)
        if md.perm_pos is not None:
            gidx = md.perm_pos[gidx]
        return gidx

    def dense_arrays(self, words, values, flat_group, perm_pos):
        """(dense_td, dense_tb) for a bordered tail — see MatrixDevice.

        Every tail entry is incident to an outlier index: its OUTPUT row
        is an outlier (a dense row — densified into its span window of
        ``td``) or its gather SOURCE is one (a transpose image —
        densified into ``tb``, windowed by its output row, which by the
        loader's symmetrization lies in the same span as its mirror).
        The fast product then needs no gather and no scatter.  Derived
        once per device build and re-derived by classify() from the
        scrubbed words, so a corrupted index plane (which drops its
        entry and triggers detection via the checksums) heals with the
        scrub; the span statics come from the clean plan, so healed
        entries always land back inside."""
        rows, starts, S = self.dense_plan
        T = len(rows)
        O = jnp.asarray(np.asarray(rows, np.int32))
        st = jnp.asarray(np.asarray(starts, np.int32))
        tbl = jnp.full((self.R,), -1, jnp.int32).at[O].set(
            jnp.arange(T, dtype=jnp.int32))
        gidx = words[self.gather_w]
        if self.ecc_gather_mask:
            gidx = gidx & ECC_COL_MASK
        gidx = jnp.clip(gidx.astype(jnp.int32), 0, self.R - 1)
        if perm_pos is not None:
            gidx = perm_pos[gidx]
        E = words[0].shape[0]
        valid = jax.lax.broadcasted_iota(
            jnp.int32, (E, 1), 0)[:, 0] < self.nnz
        dst = jnp.clip(flat_group, 0, self.R - 1)
        tdst = jnp.where(valid, tbl[dst], jnp.int32(-1))
        tsrc = jnp.where(valid, tbl[gidx], jnp.int32(-1))
        zero = jnp.zeros((), values.dtype)

        def densify(t_of, win_idx):
            """Scatter entries into (T, S) span windows; out-of-window
            or unclassified entries drop (detection covers them)."""
            off = win_idx - st[jnp.clip(t_of, 0, T - 1)]
            inb = (t_of >= 0) & (off >= 0) & (off < S)
            pos = jnp.where(inb, t_of * S + off, T * S)
            contrib = jnp.where(inb, values, zero)
            return jnp.zeros((T * S,), values.dtype).at[pos].add(
                contrib, mode="drop").reshape(T, S)

        td = densify(tdst, gidx)                    # dense rows
        tb = densify(jnp.where(tdst >= 0, jnp.int32(-1), tsrc),
                     dst)                           # transpose images
        return td, tb

    def compute_w(self, md, words, x, dtype, values=None, stored=False):
        if stored and values is not None and md.dense_td is not None:
            return self._compute_w_dense(md, x, values)
        gidx = self.gather_indices(md, words, stored)
        vals = values if values is not None else planes_to_value(
            words[self.vlo_w], words[self.vhi_w], dtype
        )
        contrib = jnp.where(self._valid(md), vals * x[gidx],
                            jnp.zeros((), dtype))
        # Segment count follows x (== self.R single-device; the mesh-padded
        # row count under parallel.sharded) so w always matches x's shape.
        return jax.ops.segment_sum(contrib, md.flat_group,
                                   num_segments=x.shape[0],
                                   indices_are_sorted=True)

    def _compute_w_dense(self, md, x, values):
        """Gather- and scatter-free fast product for a bordered tail:
        XLA's 1-D gather AND scatter serialize (~7 ns/element on this
        TPU), so the tail runs entirely on span windows with static
        slices: dense rows as (T, S) matvecs over x windows, transpose
        images as T windowed AXPYs w[start_t:start_t+S] += x[o_t] *
        tb[t]."""
        rows, starts, S = self.dense_plan
        T = len(rows)
        O = jnp.asarray(np.asarray(rows, np.int32))
        xs = jnp.stack([jax.lax.slice(x, (s,), (s + S,))
                        for s in starts])               # (T, S) static
        wa = jnp.sum(md.dense_td * xs, axis=1)          # dense rows
        xO = x[O]
        w = jnp.zeros_like(x)
        for t in range(T):
            w = jax.lax.dynamic_update_slice(
                w, jax.lax.dynamic_slice(w, (starts[t],), (S,))
                + xO[t] * md.dense_tb[t], (starts[t],))
        return w.at[O].add(wa)

    def constraints(self, md, errcode, err_slot):
        words = md.words
        valid = self._valid(md)
        col = words[self.col_w]
        grp = md.flat_group
        errcode, err_slot = _raise_err(
            ERR_COL_SIZE, valid & (col >= np.uint32(self.N)), errcode,
            err_slot)
        # Pair violations flag the FIRST element, like the reference
        # ("cols[i+1] <= cols[i]" reported at i, CSR/CPUContext.cpp:196).
        same = (grp[1:] == grp[:-1]) & valid[1:]
        if self.fmt == "coo":
            row = words[self.gather_w]
            errcode, err_slot = _raise_err(
                ERR_ROW_SIZE, valid & (row >= np.uint32(self.N)), errcode,
                err_slot)
            bad = same & (row[1:] <= row[:-1])
            errcode, err_slot = _raise_err(
                ERR_ROW_ORDER, jnp.pad(bad, (0, 1)), errcode, err_slot)
            errcode, err_slot = _raise_err(
                ERR_COL_ORDER, valid & (col != grp.astype(jnp.uint32)),
                errcode, err_slot)
        else:
            bad = same & (col[1:] <= col[:-1])
            errcode, err_slot = _raise_err(
                ERR_COL_ORDER, jnp.pad(bad, (0, 1)), errcode, err_slot)
        return errcode, err_slot


# --------------------------------------------------------------------------
# Oracle
# --------------------------------------------------------------------------

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
