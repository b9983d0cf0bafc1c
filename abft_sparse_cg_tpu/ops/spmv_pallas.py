"""Pallas TPU kernels: fused ABFT fast path for the DIA stencil SpMV.

One kernel pass per row-chunk does everything the fault-free iteration
needs — guaranteed single read of the protected planes from HBM:

  - stencil multiply-add of the pre-derived value plane against
    pre-shifted x planes (values are converted from the binary64
    bit-planes once per solve, not per iteration — the conversion costs
    more VPU time than the stencil itself),
  - per-element overall parity (detects any odd-weight fault),
  - per-8-row-block XOR checksums vs their build-time values (detects
    even-weight faults, including double flips within one element),
  - per-chunk trigger flag.

The rare fault path (locate via 7-mask syndrome, correct, classify
double-bit) stays in the jnp implementation — it runs once per fault,
not once per iteration, so kernel-level speed is irrelevant there.

Used by the ``pallas`` backend target; also exercised on CPU via the
Pallas interpreter in tests.  Falls back to the jnp path when x would
not fit in VMEM (N too large for the resident-x strategy) or the matrix
is not DIA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .spmv import MatrixDevice, SpmvImpl, SpmvStats

__all__ = ["supports", "make_pallas_spmv"]

_CHUNK = 8 * 1024  # rows per grid step


def supports(mat, dtype) -> bool:
    return mat.exec_kind == "dia" and jnp.dtype(dtype) == jnp.float32


def make_pallas_spmv(mat, dtype=jnp.float32, mode: str = None,
                     interpret: bool = None):
    """Fused fast-path kernel + jnp slow path, same contract as make_spmv.

    ``interpret``: None = auto (compiled kernel on TPU; plain jnp impl on
    CPU, where the Pallas interpreter would be orders of magnitude too
    slow for real matrices); True = force the interpreter (kernel unit
    tests).
    """
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .spmv import make_spmv as make_jnp_spmv

    mode = mat.mode if mode is None else mode
    on_cpu = _jax.devices()[0].platform == "cpu"
    if interpret is None and on_cpu:
        return make_jnp_spmv(mat, dtype, mode)
    interpret = bool(interpret) if interpret is not None else False
    if not supports(mat, dtype):
        return make_jnp_spmv(mat, dtype, mode)

    layout = mat.layout
    names = layout.word_names
    W = layout.num_words
    vlo_w = names.index("value_lo")
    vhi_w = names.index("value_hi")
    offsets = mat.dia_offsets
    D = len(offsets)
    R = mat.R
    # Trigger signals by mode: sec7 has no stored parity bit; sed has no
    # checksum need (parity is the whole check) but uses the same fast
    # kernel with parity-only trigger.
    use_parity = mode in ("sed", "sec8", "secded")
    use_cksum = mode in ("sec7", "secded")
    # Mode none needs no detection signals: the kernel then takes only
    # the value plane + shifted x, never touching the codeword planes.
    NW = W if (use_parity or use_cksum) else 0

    C = min(_CHUNK, R)
    while R % C:
        C //= 2
    G = R // C

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

        words = [r[...] for r in word_refs]

        w_ref[...] = jnp.sum(vals_ref[...] * xs_ref[...], axis=0)

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
            # Chunk-granularity comparison: XOR of the whole chunk's rows
            # vs XOR of its stored 8-row block checksums.  Coarser than
            # the stored granularity but equally sound for faults within
            # a single element (the reference's injection model): any 1-2
            # flips in one codeword change the chunk XOR of some plane.
            for wi in range(W):
                red = words[wi][0]
                for d in range(1, D):
                    red = red ^ words[wi][d]
                data_x = _xor_fold_to_scalar(red)
                ck_x = _xor_fold_to_scalar(ck_ref[wi, :])
                trig = trig | (data_x != ck_x).astype(jnp.int32)
        # TPU grid steps run sequentially on the core: OR-accumulate into
        # the single resident SMEM cell (standard reduction-output pattern).
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
