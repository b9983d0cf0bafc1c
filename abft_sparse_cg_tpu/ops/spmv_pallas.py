"""Pallas TPU kernels: fused ABFT fast paths for both execution layouts.

One kernel pass per row-chunk does everything the fault-free iteration
needs — guaranteed single read of the protected planes from HBM:

  - the SpMV product itself,
  - per-element overall parity (detects any odd-weight fault),
  - per-plane XOR checksums vs their build-time values (detects
    even-weight faults, including double flips within one element),
  - per-chunk trigger flag.

Two kernels, selected by the matrix's execution layout:

  **DIA stencil** (banded, dense diagonals): multiply-add of the
  pre-derived value plane against pre-shifted x planes — zero gathers.

  **Banded-ELL windowed gather** (banded after RCM, diagonals too sparse
  for DIA): TPU has no fast dynamic gather (`tpu.dynamic_gather` crashes
  the remote Mosaic compiler, and XLA's 1-D gather runs ~7 ns/element
  serialized on this device), so the gather is *computed*: each grid
  step owns CR consecutive output rows whose sources all live in a
  static window of x (rows ± band); the in-window index is split
  radix-128 (the lane width, so x keeps its native tiling) and resolved

      xg = onehot(idx / 128) @ x_window2d    # MXU contraction
      xg = sum(onehot(idx % 128) * xg, -1)   # VPU lane select

  — a two-level one-hot gather: the row pick rides the MXU (the one-hot
  never leaves VMEM), the lane pick is a 128-wide select.  This
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

import jax
import jax.numpy as jnp
import numpy as np

from ..ecc import ECC_COL_MASK
from .spmv import MatrixDevice, SpmvImpl, SpmvStats

__all__ = ["supports", "make_pallas_spmv"]

_CHUNK = 8 * 1024    # DIA: rows per grid step
_ELL_CHUNK = 1024    # banded ELL: output rows per grid step (the stored
#                      checksum block is CR//8 lanes — Mosaic requires
#                      lane-dim blocks be 128-divisible or whole-array)
_ELL_MAX_K = 16      # slots unrolled in the kernel
_ELL_MAX_WD = 4096   # x-window lanes (CR + 2*rounded band)
_ELL_MAX_RES = 2_000_000  # rows for the resident-x strategy (~8 MB VMEM)
_LO = 128            # radix of the select stage = the lane width, so the
#                      x window needs no in-kernel reshape (Mosaic has no
#                      1-D -> 2-D lane shape cast)


def _ell_window(mat, CR):
    """(left pad, window lanes): window = chunk rows + band on each side,
    rounded up to a whole number of radix-_LO groups."""
    side = -(-max(mat.band, 0) // _LO) * _LO
    wd = -(-(CR + 2 * side) // _LO) * _LO
    return side, wd


def _ellb_ok(mat) -> bool:
    if mat.exec_kind != "ell" or mat.K > _ELL_MAX_K:
        return False
    if mat.R > _ELL_MAX_RES:
        return False
    # Either one whole-array chunk or 128-divisible checksum blocks.
    if mat.R > _ELL_CHUNK and mat.R % _ELL_CHUNK:
        return False
    _, wd = _ell_window(mat, min(_ELL_CHUNK, mat.R))
    return wd <= _ELL_MAX_WD


def supports(mat, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return mat.exec_kind == "dia" or _ellb_ok(mat)


def _xor_fold_to_scalar(v):
    """XOR-fold a (L,) vector to one uint32 with contiguous halvings
    (Mosaic has no reduce_xor primitive).  Zero-pads to a power of
    two first — zero is the XOR identity."""
    L = v.shape[0]
    P = 1
    while P < L:
        P *= 2
    if P != L:
        v = jnp.pad(v, (0, P - L))
        L = P
    while L > 1:
        L //= 2
        v = v[:L] ^ v[L : 2 * L]
    return v[0]


def _detect_trigger(words, ck_ref, use_parity, use_cksum):
    """Shared detection signals over a chunk's codeword planes.

    ``words`` are the W plane chunks, each (slots, C) uint32; checksum
    comparison is at chunk granularity — one XOR fold of the chunk's
    rows vs the XOR of its stored 8-row block checksums.  Coarser than
    the stored granularity but equally sound for faults within a single
    element (the reference's injection model): any 1-2 flips in one
    codeword change the chunk XOR of some plane."""
    trig = jnp.int32(0)
    if use_parity:
        x0 = words[0]
        for wd in words[1:]:
            x0 = x0 ^ wd
        par_cnt = jnp.sum(
            (jax.lax.population_count(x0) & np.uint32(1)).astype(jnp.int32)
        )
        trig = trig | (par_cnt > 0).astype(jnp.int32)
    if use_cksum:
        for wi, w in enumerate(words):
            red = w[0]
            for d in range(1, w.shape[0]):
                red = red ^ w[d]
            data_x = _xor_fold_to_scalar(red)
            ck_x = _xor_fold_to_scalar(ck_ref[wi, :])
            trig = trig | (data_x != ck_x).astype(jnp.int32)
    return trig


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
    interpret = bool(interpret) if interpret is not None else False
    if not supports(mat, dtype):
        return make_jnp_spmv(mat, dtype, mode)

    if mat.exec_kind == "dia":
        fast = _make_dia_fast(mat, mode, interpret)
    else:
        fast = _make_ellb_fast(mat, mode, interpret)

    jnp_impl = make_jnp_spmv(mat, dtype, mode)

    if mode in ("none", "constraints"):
        if mode == "constraints":
            return jnp_impl  # the checks are the point; no lazy schedule

        def full_none(md, x):
            w, _ = fast(md, x)
            return w, SpmvStats.clean()

        return SpmvImpl(full=full_none)

    # ECC modes: Pallas fast kernel in the hot loop; the jnp paths do the
    # (rare) one-shot classification/scrub and serve as the full oracle.
    return SpmvImpl(full=jnp_impl.full, fast=fast, classify=jnp_impl.classify)


# --------------------------------------------------------------------------
# DIA stencil kernel
# --------------------------------------------------------------------------

def _mode_signals(mode, num_words):
    # Trigger signals by mode: sec7 has no stored parity bit; sed has no
    # checksum need (parity is the whole check) but uses the same fast
    # kernel with parity-only trigger.  Mode none reads no codeword
    # planes at all.
    use_parity = mode in ("sed", "sec8", "secded")
    use_cksum = mode in ("sec7", "secded")
    nw = num_words if (use_parity or use_cksum) else 0
    return use_parity, use_cksum, nw


def _make_dia_fast(mat, mode, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    layout = mat.layout
    W = layout.num_words
    offsets = mat.dia_offsets
    D = len(offsets)
    R = mat.R
    use_parity, use_cksum, NW = _mode_signals(mode, W)

    C = min(_CHUNK, R)
    while R % C:
        C //= 2
    G = R // C

    def kernel(*refs):
        # refs: NW plane chunks (D, C), cksum chunk (W, C//8) [if NW],
        #       vals chunk (D, C) f32, xs chunk (D, C) [pre-shifted x],
        #       outputs: w (C,), trig (1,1)
        word_refs = refs[:NW]
        k = NW
        if NW:
            ck_ref = refs[k]
            k += 1
        vals_ref = refs[k]
        xs_ref = refs[k + 1]
        w_ref = refs[k + 2]
        trig_ref = refs[k + 3]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            trig_ref[0, 0] = 0

        w_ref[...] = jnp.sum(vals_ref[...] * xs_ref[...], axis=0)

        if NW:
            words = [r[...] for r in word_refs]
            trig = _detect_trigger(words, ck_ref, use_parity, use_cksum)
            # TPU grid steps run sequentially on the core: OR-accumulate
            # into the single resident SMEM cell (standard reduction-
            # output pattern).
            trig_ref[0, 0] = trig_ref[0, 0] | trig

    def fast(md: MatrixDevice, x):
        # Pre-shift x once per call (cheap fused pads/slices in XLA) so
        # the kernel reads aligned (D, C) blocks — no dynamic slicing.
        from .spmv import _shift_read

        xs = jnp.stack([_shift_read(x, off) for off in offsets])
        plane_spec = pl.BlockSpec((D, C), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        in_specs = [plane_spec] * NW
        args = list(md.words[:NW])
        if NW:
            in_specs.append(
                pl.BlockSpec((W, C // 8), lambda i: (0, i),
                             memory_space=pltpu.VMEM))
            args.append(md.cksum)
        in_specs += [plane_spec, plane_spec]
        args += [md.values, xs]

        grid_spec = pl.GridSpec(
            grid=(G,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((C,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
        )
        w, trig = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((R,), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            interpret=interpret,
        )(*args)
        return w, trig[0, 0] != 0

    return fast


# --------------------------------------------------------------------------
# Banded-ELL windowed-gather kernel
# --------------------------------------------------------------------------

def _make_ellb_fast(mat, mode, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    layout = mat.layout
    W = layout.num_words
    K = mat.K
    R = mat.R
    use_parity, use_cksum, NW = _mode_signals(mode, W)

    CR = min(_ELL_CHUNK, R)
    while R % CR:
        CR //= 2
    G = R // CR
    SIDE, WD = _ell_window(mat, CR)
    HI = WD // _LO

    # Gather-index source: the pre-derived exec plane when an RCM
    # permutation is active, else the stored codeword word (masked
    # in-kernel for ECC modes — reference CSR/CPUContext.cpp:237).
    gather_w = layout.word_names.index(mat.ell_gather_word)
    mask_ecc = (mat.ell_gather_word == "col"
                and mode in ("sed", "sec7", "sec8", "secded"))
    has_gidx = mat.perm is not None

    def kernel(*refs):
        # refs: NW word chunks (K, CR), cksum (W, CR//8) [if NW],
        #       vals (K, CR) f32, gsrc (K, CR), x2 (Lx/128, 128) resident,
        #       outputs: w (CR,), trig (1,1)
        word_refs = refs[:NW]
        k = NW
        if NW:
            ck_ref = refs[k]
            k += 1
        vals_ref = refs[k]
        gsrc_ref = refs[k + 1]
        x_ref = refs[k + 2]
        w_ref = refs[k + 3]
        trig_ref = refs[k + 4]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            trig_ref[0, 0] = 0

        g = gsrc_ref[...]
        if not has_gidx:
            if mask_ecc:
                g = g & np.uint32(ECC_COL_MASK)
            g = jax.lax.bitcast_convert_type(g, jnp.int32)
        # In-window position of each entry's source row.  Valid entries
        # land in [0, WD) by the band bound; corrupted indices are
        # clamped (they still poison the product — detection happens on
        # the raw planes, not here).
        local = g - i * CR + SIDE
        local = jnp.where(local < 0, 0, local)
        local = jnp.where(local >= WD, WD - 1, local)
        hi = local >> 7   # _LO == 128
        lo = local & (_LO - 1)

        # The window is HI whole 128-lane rows of the pre-tiled x.
        xw = x_ref[pl.ds(i * (CR // _LO) if G > 1 else 0, HI), :]
        vals = vals_ref[...]

        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (CR, HI), 1)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (CR, _LO), 1)
        wacc = jnp.zeros((CR,), jnp.float32)
        for kk in range(K):
            # Stage 1 (MXU): pick each entry's 128-lane row of the window.
            onehot = (hi[kk][:, None] == hi_iota).astype(jnp.float32)
            # HIGHEST: the MXU's default f32 path rounds operands to
            # bf16; the gathered values must be the exact f32 x entries.
            xg128 = jax.lax.dot_general(
                onehot, xw,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # Stage 2 (VPU): select the lane.
            sel = (lo[kk][:, None] == lo_iota).astype(jnp.float32)
            xg = jnp.sum(xg128 * sel, axis=1)
            wacc = wacc + vals[kk] * xg
        w_ref[...] = wacc

        if NW:
            words = [r[...] for r in word_refs]
            trig = _detect_trigger(words, ck_ref, use_parity, use_cksum)
            trig_ref[0, 0] = trig_ref[0, 0] | trig

    def fast(md: MatrixDevice, x):
        # Pad so every chunk's window is whole 128-lane rows: left SIDE,
        # right up to (G-1)*CR + WD total, rounded to 128.
        Lx = -(-((G - 1) * CR + WD) // _LO) * _LO
        xpad = jnp.pad(x, (SIDE, Lx - R - SIDE))
        x2 = xpad.reshape(Lx // _LO, _LO)  # free: native (8,128) tiling
        plane_spec = pl.BlockSpec((K, CR), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        in_specs = [plane_spec] * NW
        args = list(md.words[:NW])
        if NW:
            in_specs.append(
                pl.BlockSpec((W, CR // 8), lambda i: (0, i),
                             memory_space=pltpu.VMEM))
            args.append(md.cksum)
        in_specs += [
            plane_spec,
            plane_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2, fully resident
        ]
        gsrc = md.gidx if has_gidx else md.words[gather_w]
        args += [md.values, gsrc, x2]

        grid_spec = pl.GridSpec(
            grid=(G,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((CR,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
        )
        w, trig = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((R,), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            interpret=interpret,
        )(*args)
        return w, trig[0, 0] != 0

    return fast
