"""Fences around the documented detection-scope deviations (PARITY.md).

The fast paths detect even-weight multi-element faults through XOR
checksums at tier-specific granularity:

  - jnp fast path: stored 8-row blocks — cancellation escapes only
    within one block;
  - per-iteration Pallas kernels: position-in-chunk classes (rows
    congruent mod the chunk size, 8-wide);
  - whole-solve megakernel: (row mod 1024, 8-wide) interleaved classes.

secded keeps the per-element parity mask, so multi-element single-bit
faults are detected at full granularity in every tier.  These tests
execute the exact boundary so a regression cannot silently widen a
blind spot (or silently lose the upgraded kernel granularity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abft_sparse_cg_tpu.formats import assemble, build_protected
from abft_sparse_cg_tpu.ops.spmv import make_matrix_device, make_spmv
from abft_sparse_cg_tpu.ops.spmv_pallas import make_pallas_spmv
from abft_sparse_cg_tpu.utils.matgen import spd_tridiagonal

N = 16384  # two 8192-row chunks for the per-iteration kernel


def dia_mat(mode):
    rows, cols, vals, n = spd_tridiagonal(N)
    m = build_protected("csr", assemble(cols, rows, vals, n, 1), mode)
    assert m.exec_kind == "dia" and m.R == N
    return m


def flip_rows(m, r1, r2, bit=5):
    """Flip the same value_lo bit in the diagonal elements of two rows."""
    from abft_sparse_cg_tpu.ecc import ECC_COL_MASK

    rp = np.asarray(m.row_ptr)
    cols = np.asarray(m.planes["col"]) & np.uint32(ECC_COL_MASK)
    planes = {k: v.copy() for k, v in m.planes.items()}
    for r in (r1, r2):
        lo, hi = rp[r], rp[r + 1]
        idx = lo + int(np.nonzero(cols[lo:hi] == r)[0][0])
        planes["value_lo"][idx] ^= np.uint32(1 << bit)
    return m.with_planes(planes)


def fast_trigger(impl, m2, dtype):
    md = make_matrix_device(m2, dtype)
    x = jnp.zeros(m2.R, dtype)
    _, trig = impl.fast(md, x)
    return bool(trig)


# (row delta, jnp detects, per-iter kernel detects, megakernel detects)
SCOPE = [
    (2, False, False, False),      # same 8-row block: all blind (doc'd)
    (8, True, True, True),         # adjacent blocks: all detect
    (1024, True, True, False),     # same megakernel class
    (8192, True, False, False),    # same per-iter chunk class too
]


@pytest.mark.parametrize("delta,jnp_det,kern_det,fused_det", SCOPE)
def test_sec7_multi_element_scope(delta, jnp_det, kern_det, fused_det):
    """sec7 has no parity bit — the checksum classes ARE the scope."""
    m = dia_mat("sec7")
    m2 = flip_rows(m, 4000, 4000 + delta)
    assert fast_trigger(make_spmv(m, jnp.float64, "sec7"), m2,
                        jnp.float64) == jnp_det
    assert fast_trigger(
        make_pallas_spmv(m, jnp.float32, "sec7", interpret=True), m2,
        jnp.float32) == kern_det


@pytest.mark.parametrize("streaming", [False, True],
                         ids=["resident", "streaming"])
@pytest.mark.parametrize("delta,jnp_det,kern_det,fused_det", SCOPE)
def test_sec7_megakernel_scope(delta, jnp_det, kern_det, fused_det,
                               streaming):
    """Both megakernel tiers (VMEM-resident and HBM-streaming) fold the
    plane checksums into the same interleaved class structure — the
    detect/miss boundary must not drift between them."""
    from abft_sparse_cg_tpu.solver.fused import make_fused_solver

    m = dia_mat("sec7")
    m2 = flip_rows(m, 4000, 4000 + delta)
    md = make_matrix_device(m2, jnp.float32)
    b = np.zeros(m.R)
    b[: m.N] = np.random.default_rng(1).random(m.N)
    fus = jax.jit(make_fused_solver(m, "sec7", 50, 1e-6, interpret=True,
                                    force_streaming=streaming))
    r = fus(md, jnp.asarray(b, jnp.float32))
    # Detection => classify corrects both single-bit elements.
    assert int(r.stats.corrected_count) == (2 if fused_det else 0)
    assert int(r.stats.errcode) == 0


@pytest.mark.parametrize("delta,fused_det", [(2, False), (8, True),
                                             (1024, False)])
def test_sec7_rolled_megakernel_scope(delta, fused_det):
    """The rolled wide-band tier (batched dynamic window gather) folds
    its streamed word planes into the same (row mod 1024, 8-wide)
    classes as the banded tiers — the boundary must not drift."""
    from abft_sparse_cg_tpu.formats import assemble  # noqa: F401
    from abft_sparse_cg_tpu.solver.fused import _plan, make_fused_solver
    from tests.test_fused import wideband_matrix

    m = wideband_matrix("sec7")
    plan = _plan(m, "sec7")
    assert plan is not None and plan["rolled"]
    m2 = flip_rows(m, 1000, 1000 + delta)
    md = make_matrix_device(m2, jnp.float32)
    b = np.zeros(m.R)
    b[: m.N] = np.random.default_rng(1).random(m.N)
    fus = jax.jit(make_fused_solver(m, "sec7", 50, 1e-6, interpret=True))
    r = fus(md, jnp.asarray(b, jnp.float32))
    assert int(r.stats.corrected_count) == (2 if fused_det else 0)
    assert int(r.stats.errcode) == 0


@pytest.mark.parametrize("delta,kern_det", [(2, False), (8, True),
                                            (4096, False)])
def test_sec7_periter_wideband_scope(delta, kern_det):
    """The per-iteration wideband (absolute-scan) kernel keeps the
    lane-major word planes and the position-in-chunk class compare of
    the banded kernel — the detect/miss boundary must not drift."""
    from abft_sparse_cg_tpu.ops.spmv_pallas import (
        _ELL_MAX_WROWS,
        _ell_chunk,
        _ell_window,
    )
    from tests.test_fused import wideband_matrix

    m = wideband_matrix("sec7", n=16384)
    assert _ell_window(m)[1] > _ELL_MAX_WROWS
    assert _ell_chunk(m.R, m.K) == 4096  # delta=4096 -> same chunk class
    m2 = flip_rows(m, 1000, 1000 + delta)
    assert fast_trigger(
        make_pallas_spmv(m, jnp.float32, "sec7", interpret=True), m2,
        jnp.float32) == kern_det


@pytest.mark.parametrize("delta", [d for d, *_ in SCOPE])
def test_secded_parity_covers_multi_element(delta):
    """The per-element parity mask detects two odd-weight elements at
    full granularity in EVERY tier — no class cancellation."""
    m = dia_mat("secded")
    m2 = flip_rows(m, 4000, 4000 + delta)
    assert fast_trigger(make_spmv(m, jnp.float64, "secded"), m2,
                        jnp.float64)
    assert fast_trigger(
        make_pallas_spmv(m, jnp.float32, "secded", interpret=True), m2,
        jnp.float32)
