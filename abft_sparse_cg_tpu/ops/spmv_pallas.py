"""Pallas TPU kernels: fused ABFT fast paths for both execution layouts.

One kernel pass per row-chunk does everything the fault-free iteration
needs — guaranteed single read of the protected planes from HBM:

  - the SpMV product itself,
  - per-element overall parity (detects any odd-weight fault),
  - per-plane XOR checksums vs their build-time values (detects
    even-weight faults, including double flips within one element).

Every signal (pw, parity mask, checksum XOR) accumulates as VMEM lane
vectors across the sequential grid steps; the scalar folds and the
checksum compare run in XLA after the call — per-chunk cross-lane
reductions are VPU pipeline stalls (solver/fused.py finding), and the
expected whole-plane checksum fold is loop-invariant so the solver's
while-loop hoists it.

Two kernels, selected by the matrix's execution layout:

  **DIA stencil** (banded, dense diagonals): multiply-add of the
  pre-derived value plane against in-kernel shifted reads of an x
  window — zero gathers.  The shifts are static lane rolls of
  overlapping (LG, 128) window blocks (each diagonal's offset
  decomposes into a static row shift + lane roll), NOT an XLA-side
  ``stack([shift(x, off)])``: a pallas input must be a materialized
  array, so the pre-shifted stack wrote and re-read a D-plane copy of
  x every iteration (~196 MB/iter at 8M rows — the dominant term in
  the kernel-vs-jnp gap at scale).

  **Banded-ELL windowed gather** (banded after RCM, diagonals too sparse
  for DIA): TPU has no fast dynamic gather (`tpu.dynamic_gather` crashes
  the remote Mosaic compiler, and XLA's 1-D gather runs ~7 ns/element
  serialized on this device), so the gather is *computed*: each grid
  step owns CR consecutive output rows whose sources all live in a
  static window of x (rows ± band); per 128-lane row group the window is
  a handful of 128-lane rows of the pre-tiled x, and the gather resolves
  with the hardware lane shuffle (tpu.dynamic_gather — the one gather
  form Mosaic lowers, same-shape (rows, 128) operands):

      for s in window rows:   # ~2*band/128 + 1 rounds, unrolled
          cand = take_along_axis(bcast(xw[s]), idx % 128, axis=1)
          xg   = where(idx // 128 == s, cand, xg)

  — cost ~4 VPU ops per entry per window row (a one-hot MXU contraction
  at these shapes measured 14x slower: nnz*window MACs through 10/128-
  utilized systolic passes).  This
  is the TPU-native replacement for the reference's general-case OpenMP
  row-gather kernel (/root/reference/CSR/CPUContext.cpp:115-133).
  Caveat vs a true gather: a non-finite x value inside the window
  poisons the whole 32-lane group through the 0*inf products — only
  observable after the solve is already consuming corrupted data.

The rare fault path (locate via 7-mask syndrome, correct, classify
double-bit) stays in the jnp implementation — it runs once per fault,
not once per iteration, so kernel-level speed is irrelevant there.

Used by the ``pallas`` backend target; also exercised on CPU via the
Pallas interpreter in tests.  Falls back to the jnp path when the
layout/window does not fit the kernels' envelopes (see ``supports``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ecc import ECC_COL_MASK
from .spmv import MatrixDevice, SpmvImpl, SpmvStats

__all__ = ["supports", "make_pallas_spmv", "make_pallas_product"]

_CHUNK = 8 * 1024    # DIA: rows per grid step
_ELL_CHUNK = 4096    # banded ELL: output rows per grid step (amortizes
#                      per-chunk cost ~25-30% over 1024; the stored
#                      checksum block is CR//8 lanes — Mosaic requires
#                      lane-dim blocks be 128-divisible or whole-array)


_ELL_CHUNK_ENTRIES = 512 * 1024  # K*CR cap per streamed plane chunk
#                      (2 MiB f32): keeps the double-buffered stream
#                      inside the raised VMEM limit at high K while
#                      leaving CR = 4096 untouched for K <= 128


def _ell_chunk(R, K=1):
    """Rows per grid step: whole-array for small R, else the largest
    Mosaic-legal divisor (checksum block = CR//8 lanes needs CR to be a
    1024-multiple when blocked) whose (K, CR) plane chunk stays within
    the VMEM streaming budget.  0 = no legal chunking."""
    if R <= _ELL_CHUNK:
        return R
    for c in (_ELL_CHUNK, 2048, 1024):
        if R % c == 0 and (c == 1024 or K * c <= _ELL_CHUNK_ENTRIES):
            return c
    return 0
_ELL_MAX_K = 512     # ELL slots: the lane-shuffle gathers act on whole
#                      (K, 128) tiles, so K costs sublane work + VMEM
#                      linearly (the reference's row gather handles any
#                      degree uniformly, CSR/CPUContext.cpp:115-133 —
#                      this cap is the TPU equivalent's envelope).  The
#                      cap sits where the (K, 1024) minimum chunk
#                      planes (2 MiB each) exhaust the raised VMEM
#                      limit; matrices beyond it (>512 nnz/row) are
#                      effectively dense and ride the flat/jnp paths.
_ELL_MAX_WROWS = 31  # unrolled-shuffle cap (band <= 1920); past it the
#                      kernel rides the wideband absolute-row scan
_ELL_WIDE_MAX_WROWS = 255  # wideband-tier cap (band <= 16256, matching
#                            the fused megakernel's _FUSED_MAX_WROWS)


def _ell_window(mat):
    """(side pad, window rows per 128-lane group)."""
    side = -(-max(mat.band, 0) // 128) * 128
    return side, 2 * (side // 128) + 1


def _dia_side(mat) -> int:
    """128-rounded max |offset| — the DIA kernel's x window halo."""
    m = max((abs(o) for o in mat.dia_offsets), default=0)
    return -(-m // 128) * 128


def _ellb_ok(mat) -> bool:
    if mat.exec_kind != "ell" or not 2 <= mat.K <= _ELL_MAX_K:
        # K=1 would emit (1, 128) take_along_axis shuffles, which Mosaic
        # cannot lower (memory quirks list); such a matrix (one entry
        # per row yet >128 distinct offsets) is degenerate — the jnp
        # path carries it.
        return False
    if mat.R % 128 or not _ell_chunk(mat.R, mat.K):
        return False
    _, wrows = _ell_window(mat)
    return wrows <= _ELL_WIDE_MAX_WROWS


def supports(mat, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if mat.exec_kind == "flat":
        # Benes-route unstructured tier (ops.spmv_unstructured): the
        # plan is attached at build time from clean planes; without it
        # the flat path rides the XLA gather fallback.
        from .spmv_unstructured import wants_unstructured

        return (wants_unstructured(mat)
                and getattr(mat, "unstr_plan", None) is not None)
    return mat.exec_kind == "dia" or _ellb_ok(mat)


def make_pallas_spmv(mat, dtype=jnp.float32, mode: str = None,
                     interpret: bool = None):
    """Fused fast-path kernel + jnp slow path, same contract as make_spmv.

    ``interpret``: None = auto (compiled kernel on TPU; plain jnp impl on
    CPU, where the Pallas interpreter would be orders of magnitude too
    slow for real matrices); True = force the interpreter (kernel unit
    tests).
    """
    import jax as _jax

    from .spmv import make_spmv as make_jnp_spmv

    mode = mat.mode if mode is None else mode
    on_cpu = _jax.devices()[0].platform == "cpu"
    if interpret is None and on_cpu:
        return make_jnp_spmv(mat, dtype, mode)
    if mat.exec_kind == "split":
        # Bordered split: main rides the kernels, the flat tail falls
        # through to jnp inside the recursive call.
        from .spmv import combine_impls

        return combine_impls(
            make_pallas_spmv(mat.main, dtype, mode, interpret),
            make_pallas_spmv(mat.tail, dtype, mode, interpret),
            mat.main.exec_size,
        )
    interpret = bool(interpret) if interpret is not None else False
    if mat.exec_kind == "flat":
        # Unstructured/expander matrices (and band-split tails): the
        # Benes permutation-route kernel replaces the XLA gather +
        # segment scatter when the matrix fits its resident envelope
        # (ops.spmv_unstructured); the jnp flat path carries the rest.
        from .spmv_unstructured import make_unstructured_spmv

        impl = make_unstructured_spmv(mat, dtype, mode, interpret)
        if impl is not None:
            return impl
        return make_jnp_spmv(mat, dtype, mode)
    if not supports(mat, dtype):
        return make_jnp_spmv(mat, dtype, mode)

    if mat.exec_kind == "dia":
        fast, fast_pw = _make_dia_fast(mat, mode, interpret)
    else:
        fast, fast_pw = _make_ellb_fast(mat, mode, interpret)
    return _wrap_mode(mat, dtype, mode, fast, fast_pw)


def make_pallas_product(mat, dtype=jnp.float32, mode: str = None,
                        interpret: bool = False):
    """Detection-free kernel product for the lazy ``--check-interval``
    schedule's UNCHECKED iterations: identical arithmetic to the checked
    kernels — including the ECC masking the true ``mode`` implies on the
    gather index — but no word-plane streaming; ``trig`` is constantly
    False.  Split composites keep the tail's checked jnp impl (its
    signals are loop-invariant XLA folds over tiny planes, so stripping
    them buys nothing, and a live tail trigger is just early detection).
    Returns None when the matrix is outside the kernel envelope — the
    caller keeps the live schedule then."""
    mode = mat.mode if mode is None else mode
    if mat.exec_kind == "split":
        from .spmv import combine_impls, make_spmv

        mp = make_pallas_product(mat.main, dtype, mode, interpret)
        if mp is None:
            return None
        return combine_impls(mp, make_spmv(mat.tail, dtype, mode),
                             mat.main.exec_size)
    if mat.exec_kind == "flat":
        from .spmv_unstructured import make_unstructured_spmv

        return make_unstructured_spmv(mat, dtype, mode, bool(interpret),
                                      detect=False)
    if not supports(mat, dtype):
        return None
    if mat.exec_kind == "dia":
        fast, fast_pw = _make_dia_fast(mat, mode, bool(interpret),
                                       detect=False)
    else:
        fast, fast_pw = _make_ellb_fast(mat, mode, bool(interpret),
                                        detect=False)
    return SpmvImpl(full=None, fast=fast, classify=None, fast_pw=fast_pw)


def _wrap_mode(mat, dtype, mode, fast, fast_pw):
    """Assemble the SpmvImpl around a kernel-tier (fast, fast_pw) pair:
    jnp oracle/classify for the rare paths, mode-specific full()."""
    from .spmv import make_spmv as make_jnp_spmv

    if mode == "constraints":
        # Lazy schedule (mirrors ops.spmv): the kernel's fast path scans
        # only the index-word checksums fused into the product stream;
        # the structural checks run ONCE per trigger in the jnp classify
        # (which refreshes the checksum baseline when no constraint is
        # violated, adopting changes the reference would consume
        # silently).  The full oracle pairs the kernel's product with
        # the structural check so forced-ELL constraints spmv_once does
        # not fall back to XLA's serialized gather.
        from .spmv import make_constraints_check

        check = make_constraints_check(mat)

        def full_cons(md, x):
            w, _ = fast(md, x)
            return w, check(md)

        jnp_impl = make_jnp_spmv(mat, dtype, mode)
        return SpmvImpl(full=full_cons, fast=fast,
                        classify=jnp_impl.classify, fast_pw=fast_pw)

    jnp_impl = make_jnp_spmv(mat, dtype, mode)

    if mode == "none":
        def full_none(md, x):
            w, _ = fast(md, x)
            return w, SpmvStats.clean()

        return SpmvImpl(full=full_none, fast_pw=fast_pw)

    # ECC modes: Pallas fast kernel in the hot loop; the jnp paths do the
    # (rare) one-shot classification/scrub and serve as the full oracle.
    return SpmvImpl(full=jnp_impl.full, fast=fast,
                    classify=jnp_impl.classify, fast_pw=fast_pw)


# --------------------------------------------------------------------------
# DIA stencil kernel
# --------------------------------------------------------------------------

def stream_words(mode, layout, fmt) -> tuple:
    """Word-plane indices the fast kernels stream for detection.

    ECC modes read every codeword word (parity/checksums span the whole
    element).  The constraints lazy schedule scans only the INDEX words
    its structural invariants read — the reference never validates
    values in constraints mode (CSR/CPUContext.cpp:162-207), so value
    planes stay un-streamed and the fast loop costs ~mode-none + one
    (CSR) or two (COO) uint32 planes.  Mode none streams nothing."""
    names = layout.word_names
    if mode in ("sed", "sec7", "sec8", "secded"):
        return tuple(range(len(names)))
    if mode == "constraints":
        idx = {"col"} | ({"row"} if fmt == "coo" else set())
        return tuple(i for i, n in enumerate(names) if n in idx)
    return ()


def use_fold(mode, detect=True) -> bool:
    """Whether live detection streams the ONE rotated-fold plane
    (ecc.fold) instead of every codeword word plane.  Default for the
    ECC modes on the kernel tiers (it cuts live detection's HBM traffic
    from W planes to one at contract-equivalent <= 2-bit scope);
    ABFT_LIVE_FOLD=0 restores the per-word streams (A/B benching, and
    the exact >= 4-bit adversarial-pattern scope of the word scheme).
    Constraints mode never folds — its scan covers index words only."""
    return (detect and mode in ("sed", "sec7", "sec8", "secded")
            and os.environ.get("ABFT_LIVE_FOLD", "1") != "0")


def _mode_signals(mode, mat, detect=True):
    # Trigger signals by mode: sec7 has no stored parity bit; sed has no
    # checksum need (parity is the whole check) but uses the same fast
    # kernel with parity-only trigger.  Constraints rides the checksum
    # scan over its index words (lazy schedule; classify re-runs the
    # structural checks).  Mode none reads no codeword planes at all.
    # ``detect=False`` strips every signal (no word streaming) while the
    # product arithmetic — incl. the ECC masking the true mode implies —
    # stays identical: the lazy --check-interval schedule's unchecked-
    # iteration kernel.
    if not detect:
        return False, False, ()
    use_parity = mode in ("sed", "sec8", "secded")
    use_cksum = mode in ("sec7", "secded", "constraints")
    sw = stream_words(mode, mat.layout, mat.fmt)
    return use_parity, use_cksum, sw


def _make_dia_fast(mat, mode, interpret, halo=0, detect=True):
    """``halo`` > 0: the returned callables expect an x of length
    R + 2*halo (halo == the 128-rounded band, ``_dia_side``) whose ends
    hold neighbor-shard rows (parallel.sharded_kernel's exchange)
    instead of padding with zeros — the per-shard form of the kernel.

    The stencil's shifted-x reads happen IN-KERNEL (static lane rolls
    of overlapping x window blocks, the ELL kernel's XCOPIES trick):
    a pallas input must be a materialized array, so the former XLA-side
    ``stack([shift(x, off)])`` wrote and re-read a D-plane copy of x
    every iteration — ~196 MB/iter of pure overhead at 8M rows, the
    dominant term in the kernel-vs-jnp gap at scale.  Compute runs in
    (sublane, lane) = (row block, row%128) space; the (D, R) planes
    enter as free contiguous (D, RR, 128) reshapes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    layout = mat.layout
    offsets = mat.dia_offsets
    D = len(offsets)
    R = mat.R
    use_parity, use_cksum, SW = _mode_signals(mode, mat, detect)
    folded = use_fold(mode, detect) and (use_parity or use_cksum)
    if folded:
        SW = (0,)  # ONE detection stream: the rotated fold plane
    NW = len(SW)
    W = NW  # streamed detection planes (the fold, or all words)
    d0 = offsets.index(0) if 0 in offsets else None

    C = min(_CHUNK, R)
    while R % C:
        C //= 2
    G = R // C
    LG = C // 128              # row blocks per chunk
    RR = R // 128
    SIDE = _dia_side(mat)
    S0 = SIDE // 128
    assert halo in (0, SIDE)
    # Per-diagonal static decomposition: source row r+off lives at
    # window row a+l (lanes s..) and a+l+1 (lanes ..s-1).
    dshift = [(S0 + (off >> 7), off & 127) for off in offsets]
    XCOPIES = -(-(LG + 2 * S0 + 1) // LG)

    def kernel(*refs):
        # refs: NW word chunks (D, C) [2-D row-on-lanes blocks — the
        #       detection path; streaming these as (D, LG, 128) blocks
        #       measured ~2.5x the marginal cost on v5e], vals
        #       (D, LG, 128) f32, XCOPIES x window blocks (LG, 128),
        #       outputs: w (LG, 128), pw_vec (1, 128) f32, par acc
        #       (D, C) u32, ck acc (W, C) u32.  Signals accumulate as
        #       VMEM lane vectors across the sequential grid steps;
        #       scalar folds happen in XLA after the call (a cross-lane
        #       reduction per chunk is a VPU pipeline stall —
        #       solver/fused.py finding).
        word_refs = refs[:NW]
        k = NW
        vals_ref = refs[k]
        xparts = refs[k + 1:k + 1 + XCOPIES]
        k += 1 + XCOPIES
        w_ref = refs[k]
        pw_ref = refs[k + 1]
        k += 2
        if use_parity:
            par_ref = refs[k]
            k += 1
        if use_cksum:
            ckv_ref = refs[k]

        i = pl.program_id(0)
        first = i == 0

        def xw(a):
            """Window rows a..a+LG -> (LG, 128) (static slices)."""
            c0, r0 = divmod(a, LG)
            if r0 == 0:
                return xparts[c0][...]
            return jnp.concatenate(
                [xparts[c0][r0:], xparts[c0 + 1][:r0]], axis=0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (LG, 128), 1)
        vals = vals_ref[...]
        w = None
        xcache = {}
        for d, (a, s) in enumerate(dshift):
            if s == 0:
                xg = xw(a)
            else:
                # y[l, j] = x[(a+l)*128 + j + s]: lane-roll the two
                # straddled window rows (jnp.roll semantics: shift
                # 128 - s rotates lane j+s into j), select at the
                # boundary.
                if (a, s) not in xcache:
                    lo = pltpu.roll(xw(a), 128 - s, 1)
                    hi = pltpu.roll(xw(a + 1), 128 - s, 1)
                    xcache[(a, s)] = jnp.where(lane < 128 - s, lo, hi)
                xg = xcache[(a, s)]
            prod = vals[d] * xg
            w = prod if w is None else w + prod
        w_ref[...] = w
        if d0 is not None:
            pwc = jnp.sum(w * xw(S0), axis=0, keepdims=True)

            @pl.when(first)
            def _():
                pw_ref[...] = pwc

            @pl.when(~first)
            def _():
                pw_ref[...] = pw_ref[...] + pwc
        else:
            @pl.when(first)
            def _():
                pw_ref[...] = jnp.zeros((1, 128), jnp.float32)

        if use_parity:
            acc_x = word_refs[0][...]
            for wr in word_refs[1:]:
                acc_x = acc_x ^ wr[...]
            mask = jax.lax.population_count(acc_x) & np.uint32(1)

            @pl.when(first)
            def _():
                par_ref[...] = mask

            @pl.when(~first)
            def _():
                par_ref[...] = par_ref[...] | mask

        if use_cksum:
            for wi in range(W):
                red = word_refs[wi][0]
                for d in range(1, D):
                    red = red ^ word_refs[wi][d]
                red = red[None, :]

                @pl.when(first)
                def _(red=red, wi=wi):
                    ckv_ref[wi:wi + 1, :] = red

                @pl.when(~first)
                def _(red=red, wi=wi):
                    ckv_ref[wi:wi + 1, :] = ckv_ref[wi:wi + 1, :] ^ red

    def call(md: MatrixDevice, x):
        if halo:
            # x carries SIDE neighbor-halo rows on each side (zero at
            # the global boundary, filled by the ppermute exchange).
            back = (G - 1 + XCOPIES) * LG * 128 - (R + SIDE)
            xpad = jnp.pad(x, (0, back - SIDE))
        else:
            back = (G - 1 + XCOPIES) * LG * 128 - (R + SIDE)
            xpad = jnp.pad(x, (SIDE, back))
        x2 = xpad.reshape(-1, 128)
        plane2 = pl.BlockSpec((D, C), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        in_specs = [plane2] * NW
        args = ([md.fold] if folded else [md.words[i] for i in SW])
        in_specs.append(pl.BlockSpec((D, LG, 128), lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(md.values.reshape(D, RR, 128))
        in_specs += [
            pl.BlockSpec((LG, 128), lambda i, c=c: (i + c, 0),
                         memory_space=pltpu.VMEM)
            for c in range(XCOPIES)
        ]
        args += [x2] * XCOPIES

        acc = lambda rows: pl.BlockSpec(  # noqa: E731 — resident block
            (rows, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((LG, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((RR, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ]
        if use_parity:
            out_specs.append(acc(D))
            out_shape.append(jax.ShapeDtypeStruct((D, C), jnp.uint32))
        if use_cksum:
            out_specs.append(acc(W))
            out_shape.append(jax.ShapeDtypeStruct((W, C), jnp.uint32))

        grid_spec = pl.GridSpec(grid=(G,), in_specs=in_specs,
                                out_specs=out_specs)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
        w, pw_vec = outs[0].reshape(R), outs[1]
        pw = jnp.sum(pw_vec)
        trig = jnp.bool_(False)
        k = 2
        if use_parity:
            trig = trig | (jnp.sum(outs[k].astype(jnp.int32)) > 0)
            k += 1
        if use_cksum:
            # Compare at interleaved block-class granularity: the
            # accumulator already holds per-chunk-position XORs, so
            # folding to 8-lane blocks (for free, in XLA) yields one
            # class per position-in-chunk block — a multi-element fault
            # escapes only if its flips cancel per bit position within
            # the SAME class (rows congruent mod the chunk), vs the
            # whole-plane fold's anywhere-in-plane scope (PARITY.md).
            ck = outs[k]
            got8 = jnp.bitwise_xor.reduce(
                ck.reshape(W, -1, 8), axis=2)
            base = md.fold_ck if folded else md.cksum[np.array(SW)]
            want8 = jnp.bitwise_xor.reduce(
                base.reshape(W, -1, ck.shape[1] // 8), axis=1)
            trig = trig | jnp.any(got8 != want8)
        return w, trig, pw

    def fast(md: MatrixDevice, x):
        w, trig, _ = call(md, x)
        return w, trig

    fast_pw = None
    if d0 is not None:
        def fast_pw(md: MatrixDevice, x):
            return call(md, x)

    return fast, fast_pw


# --------------------------------------------------------------------------
# Banded-ELL windowed-gather kernel
# --------------------------------------------------------------------------

def _make_ellb_fast(mat, mode, interpret, halo=False, with_base=False,
                    detect=True):
    """``halo``: the returned callables expect an x of length
    R + 2*SIDE whose ends hold neighbor-shard rows (zero-filled at the
    global boundary) instead of the call padding with zeros itself.
    ``with_base``: the callables take an extra ``base`` scalar — the
    shard's global row offset, subtracted from the (global) gather
    indices in-kernel via an SMEM scalar so the stored planes stay
    untouched.  Both serve parallel.sharded_kernel's per-shard form."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    layout = mat.layout
    K = mat.K
    R = mat.R
    use_parity, use_cksum, SW = _mode_signals(mode, mat, detect)
    folded = use_fold(mode, detect) and (use_parity or use_cksum)
    if folded:
        SW = (0,)  # ONE detection stream: the rotated fold plane
    NW = len(SW)
    W = NW  # streamed detection planes (the fold, or all words)

    CR = _ell_chunk(R, K)
    G = R // CR
    LG = CR // 128            # 128-lane row groups per chunk
    SIDE, WROWS = _ell_window(mat)
    S0 = SIDE // 128
    # Past the unrolled cap the kernel switches to the WIDEBAND tier:
    # group-major vals/gather chunk planes + the absolute-row static
    # window scan (the design of solver.fused._absolute_window_scan) —
    # one static pass over the chunk's LG + WROWS - 1 window rows,
    # each row selected into just the lane groups whose windows
    # contain it.  Same select work as the unrolled shuffle, far fewer
    # static bodies (LG + WROWS - 1 vs LG * WROWS).  The group-major
    # repack + index localization run in XLA once per call — they are
    # loop-invariant, so solver while-loops hoist them out.
    wide = WROWS > _ELL_MAX_WROWS

    # Gather-index source: the pre-derived exec plane when an RCM
    # permutation is active, else the stored codeword word (masked
    # in-kernel for ECC modes — reference CSR/CPUContext.cpp:237).
    # When the detection signals already bring every word plane into
    # VMEM (NW > 0), the gather word is reused from there instead of
    # being passed (and read from HBM) a second time (lane-major tier
    # only: the wideband tier's gather plane is group-major).
    gather_w = layout.word_names.index(mat.ell_gather_word)
    mask_ecc = (mat.ell_gather_word == "col"
                and mode in ("sed", "sec7", "sec8", "secded"))
    has_gidx = mat.perm is not None
    gsrc_in_words = (not wide) and (not has_gidx) and (not folded) \
        and gather_w in SW

    # The per-chunk x windows overlap (each lane group reads WROWS rows
    # around itself), which plain BlockSpecs cannot express.  Instead x
    # is passed XCOPIES times with shifted index maps: copy c serves the
    # chunk's window rows [c*LG, (c+1)*LG) — every in-kernel window read
    # becomes a static (copy, row) pair, fully prefetch-pipelined, with
    # no resident-x VMEM cap.
    XCOPIES = -(-(LG + WROWS - 1) // LG)

    def kernel(*refs):
        # refs: NW word chunks (K, CR), vals (K, CR) f32, gsrc (K, CR)
        #       [unless reused from the word chunks], XCOPIES x-window
        #       blocks (LG, 128), outputs: w (CR,), pw_vec (1, 128) f32,
        #       par_vec (K, CR) u32, ck_vec (W, CR) u32 — all signals
        #       accumulate as VMEM lane vectors across the sequential
        #       grid steps; scalar folds happen in XLA after the call
        #       (a cross-lane reduction per chunk is a VPU stall).
        if with_base and not wide:
            base_ref = refs[0]  # (1,) int32 in SMEM: shard row offset
            refs = refs[1:]
        word_refs = refs[:NW]
        k = NW
        vals_ref = refs[k]
        k += 1
        if gsrc_in_words:
            gsrc_ref = word_refs[SW.index(gather_w)]
        else:
            gsrc_ref = refs[k]
            k += 1
        xparts = refs[k:k + XCOPIES]
        k += XCOPIES
        w_ref = refs[k]
        pw_ref = refs[k + 1]
        k += 2
        if use_parity:
            par_ref = refs[k]
            k += 1
        if use_cksum:
            ckv_ref = refs[k]

        i = pl.program_id(0)
        first = i == 0

        def window_row(t):
            """Static window row t of this chunk -> (1, 128)."""
            return xparts[t // LG][t % LG:t % LG + 1, :]

        if wide:
            # Wideband tier: indices arrive pre-localized to chunk
            # window-row coordinates (hi == window row e such that
            # group j's window is e in [j, j + WROWS)), group-major.
            xacc = refs[-1]       # (LG*K, 128) f32 VMEM scratch
            loc = gsrc_ref[...]
            hi = loc >> 7
            lo = loc & 127
            xacc[...] = jnp.zeros((LG * K, 128), jnp.float32)
            for e in range(LG + WROWS - 1):
                g0 = max(0, e - (WROWS - 1))
                g1 = min(LG, e + 1)
                sl = slice(g0 * K, g1 * K)
                tbl = jnp.broadcast_to(window_row(e),
                                       ((g1 - g0) * K, 128))
                cand = jnp.take_along_axis(tbl, lo[sl], axis=1)
                xacc[sl, :] = jnp.where(hi[sl] == e, cand, xacc[sl, :])
            prod = vals_ref[...] * xacc[...]
            pw_acc = jnp.zeros((1, 128), jnp.float32)
            for j in range(LG):
                wj = jnp.sum(prod[j * K:(j + 1) * K], axis=0,
                             keepdims=True)
                w_ref[j:j + 1, :] = wj
                pw_acc = pw_acc + wj * window_row(j + S0)
        else:
            g = gsrc_ref[...]
            if not has_gidx:
                if mask_ecc:
                    g = g & np.uint32(ECC_COL_MASK)
                g = jax.lax.bitcast_convert_type(g, jnp.int32)
            if with_base:
                g = g - base_ref[0]  # global -> shard-local source rows
            vals = vals_ref[...]

            # In-window position of each entry's source row; the window
            # for a lane group is WROWS consecutive 128-lane rows of the
            # pre-tiled x.  Valid entries land inside by the band bound;
            # corrupted indices are clamped (they still poison the
            # product — detection happens on the raw planes).  The index
            # math runs chunk-wide (full (K, CR) tiles keep the VPU
            # lanes busy; per 128-lane group measured ~35% slower).
            iota = jax.lax.broadcasted_iota(jnp.int32, (K, CR), 1)
            local = g - (i * CR + ((iota >> 7) << 7)) + SIDE
            local = jnp.where(local < 0, 0, local)
            local = jnp.where(local >= WROWS * 128, WROWS * 128 - 1,
                              local)
            hi_all = local >> 7
            lo_all = local & 127

            # pw accumulates as a 128-lane vector, reduced ONCE per
            # chunk (a cross-lane reduction per group is a stall).
            pw_acc = jnp.zeros((1, 128), jnp.float32)
            for j in range(LG):
                cols = slice(j * 128, (j + 1) * 128)
                hi = hi_all[:, cols]
                lo = lo_all[:, cols]
                xg = jnp.zeros((K, 128), jnp.float32)
                for s in range(WROWS):
                    tbl = jnp.broadcast_to(window_row(j + s), (K, 128))
                    cand = jnp.take_along_axis(tbl, lo, axis=1)
                    xg = jnp.where(hi == s, cand, xg)
                wj = jnp.sum(vals[:, cols] * xg, axis=0)     # (128,)
                w_ref[cols] = wj
                # Fused pw = dot(x, w): this group's aligned x is the
                # window's center row — already in the window blocks.
                pw_acc = pw_acc + wj[None, :] * window_row(j + S0)

        @pl.when(first)
        def _():
            pw_ref[...] = pw_acc

        @pl.when(~first)
        def _():
            pw_ref[...] = pw_ref[...] + pw_acc

        if use_parity:
            acc_x = word_refs[0][...]
            for wr in word_refs[1:]:
                acc_x = acc_x ^ wr[...]
            mask = jax.lax.population_count(acc_x) & np.uint32(1)

            @pl.when(first)
            def _():
                par_ref[...] = mask

            @pl.when(~first)
            def _():
                par_ref[...] = par_ref[...] | mask

        if use_cksum:
            for wi in range(W):
                red = word_refs[wi][0]
                for d in range(1, K):
                    red = red ^ word_refs[wi][d]
                red = red[None, :]

                @pl.when(first)
                def _(red=red, wi=wi):
                    ckv_ref[wi:wi + 1, :] = red

                @pl.when(~first)
                def _(red=red, wi=wi):
                    ckv_ref[wi:wi + 1, :] = ckv_ref[wi:wi + 1, :] ^ red

    def call(md: MatrixDevice, x, base=None):
        # Pad so every chunk's window blocks exist: SIDE rows in front,
        # and enough at the back for the last chunk's XCOPIES blocks.
        # (back >= SIDE always: XCOPIES covers LG + WROWS - 1 rows.)
        back = (G - 1 + XCOPIES) * LG * 128 - (R + SIDE)
        if halo:
            # x arrives with SIDE exchanged rows on each side.
            xpad = jnp.pad(x, (0, back - SIDE))
        else:
            xpad = jnp.pad(x, (SIDE, back))
        x2 = xpad.reshape(-1, 128)  # native (8,128) tiling
        plane_spec = pl.BlockSpec((K, CR), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        acc = lambda rows, cols: pl.BlockSpec(  # noqa: E731 — resident
            (rows, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)
        in_specs = []
        args = []
        if with_base and not wide:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            args.append(jnp.asarray(base, jnp.int32).reshape(1))
        in_specs += [plane_spec] * NW
        args += ([md.fold] if folded else [md.words[i] for i in SW])
        if wide:
            # Group-major repack + window-row localization, in XLA once
            # per call (loop-invariant => hoisted out of solver loops).
            g = md.gidx if has_gidx else md.words[gather_w]
            if not has_gidx:
                if mask_ecc:
                    g = g & np.uint32(ECC_COL_MASK)
                g = jax.lax.bitcast_convert_type(g, jnp.int32)
            else:
                g = g.astype(jnp.int32)
            if with_base:
                g = g - jnp.asarray(base, jnp.int32)
            row = jnp.arange(R, dtype=jnp.int32)
            local = g + (SIDE - ((row >> 7) << 7))[None, :]
            local = jnp.clip(local, 0, WROWS * 128 - 1)
            loc = local + (((row >> 7) % LG) * 128)[None, :]
            RRg = R // 128

            def gm(a):
                return (a.reshape(K, RRg, 128).transpose(1, 0, 2)
                        .reshape(RRg * K, 128))

            gm_spec = pl.BlockSpec((LG * K, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
            in_specs += [gm_spec, gm_spec]
            args += [gm(md.values), gm(loc)]
        else:
            in_specs.append(plane_spec)
            args.append(md.values)
            if not gsrc_in_words:
                in_specs.append(plane_spec)
                args.append(md.gidx if has_gidx else md.words[gather_w])
        in_specs += [
            pl.BlockSpec((LG, 128), lambda i, c=c: (i + c, 0),
                         memory_space=pltpu.VMEM)
            for c in range(XCOPIES)
        ]
        args += [x2] * XCOPIES

        out_specs = [
            pl.BlockSpec((LG, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) if wide else
            pl.BlockSpec((CR,), lambda i: (i,), memory_space=pltpu.VMEM),
            acc(1, 128),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((R // 128, 128), jnp.float32) if wide
            else jax.ShapeDtypeStruct((R,), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ]
        if use_parity:
            out_specs.append(acc(K, CR))
            out_shape.append(jax.ShapeDtypeStruct((K, CR), jnp.uint32))
        if use_cksum:
            out_specs.append(acc(W, CR))
            out_shape.append(jax.ShapeDtypeStruct((W, CR), jnp.uint32))

        outs = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=([pltpu.VMEM((LG * K, 128), jnp.float32)]
                            if wide else []),
            # High-K plane chunks (K up to _ELL_MAX_K at CR = 1024) plus
            # the resident parity accumulator exceed Mosaic's 16 MiB
            # default — request the same scoped limit as the megakernel.
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 2 ** 20),
            interpret=interpret,
        )(*args)
        w = outs[0].reshape(R) if wide else outs[0]
        pw = jnp.sum(outs[1])
        # Scalar folds + checksum compare in XLA (the expected fold is
        # loop-invariant and hoisted by the solver's while-loop);
        # granularity is whole-plane per iteration (PARITY.md).
        trig = jnp.bool_(False)
        k = 2
        if use_parity:
            trig = trig | (jnp.sum(outs[k].astype(jnp.int32)) > 0)
            k += 1
        if use_cksum:
            # Compare at interleaved block-class granularity: the
            # accumulator already holds per-chunk-position XORs, so
            # folding to 8-lane blocks (for free, in XLA) yields one
            # class per position-in-chunk block — a multi-element fault
            # escapes only if its flips cancel per bit position within
            # the SAME class (rows congruent mod the chunk), vs the
            # whole-plane fold's anywhere-in-plane scope (PARITY.md).
            ck = outs[k]
            got8 = jnp.bitwise_xor.reduce(
                ck.reshape(W, -1, 8), axis=2)
            base = md.fold_ck if folded else md.cksum[np.array(SW)]
            want8 = jnp.bitwise_xor.reduce(
                base.reshape(W, -1, ck.shape[1] // 8), axis=1)
            trig = trig | jnp.any(got8 != want8)
        return w, trig, pw

    if with_base:
        def fast(md: MatrixDevice, x, base):
            w, trig, _ = call(md, x, base)
            return w, trig

        def fast_pw(md: MatrixDevice, x, base):
            return call(md, x, base)
    else:
        def fast(md: MatrixDevice, x):
            w, trig, _ = call(md, x)
            return w, trig

        def fast_pw(md: MatrixDevice, x):
            return call(md, x)

    return fast, fast_pw
