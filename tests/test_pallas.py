"""Pallas kernels vs the jnp oracle (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abft_sparse_cg_tpu.backends import create
from abft_sparse_cg_tpu.formats import assemble, build_protected
from abft_sparse_cg_tpu.inject import inject_bitflips
from abft_sparse_cg_tpu.ops.spmv import make_matrix_device, make_spmv
from abft_sparse_cg_tpu.ops.spmv_pallas import make_pallas_spmv, supports
from abft_sparse_cg_tpu.utils.matgen import spd_tridiagonal

RNG = np.random.default_rng(5)


def protected(mode, fmt="csr", n=200, blocks=2):
    rows, cols, vals, n = spd_tridiagonal(n)
    a = assemble(cols, rows, vals, n, blocks)
    return build_protected(fmt, a, mode)


def device_matrix(m):
    return make_matrix_device(m, jnp.float32)


def test_supports_policy():
    m = protected("secded")
    assert supports(m, jnp.float32)
    assert not supports(m, jnp.float64)  # kernels are f32-only


@pytest.mark.parametrize("fmt", ["csr", "coo"])
@pytest.mark.parametrize("mode", ["none", "sed", "sec7", "sec8", "secded"])
def test_fast_kernel_matches_jnp(fmt, mode):
    """The Pallas fast kernel: same w, no trigger on a clean matrix."""
    m = protected(mode, fmt)
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_p = make_pallas_spmv(m, jnp.float32, mode, interpret=True)
    impl_j = make_spmv(m, jnp.float32, mode)
    if mode == "none":
        wp, _ = jax.jit(impl_p.full)(md, x)
        wj, _ = jax.jit(impl_j.full)(md, x)
    else:
        wp, trig_p = jax.jit(impl_p.fast)(md, x)
        wj, trig_j = jax.jit(impl_j.fast)(md, x)
        assert not bool(trig_p) and not bool(trig_j)
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wj), rtol=1e-6)


@pytest.mark.parametrize("mode", ["sed", "sec7", "sec8", "secded"])
def test_fast_kernel_triggers_on_fault(mode):
    m = protected(mode)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl = make_pallas_spmv(m, jnp.float32, mode, interpret=True)
    for seed in range(3):
        m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(seed),
                             echo=lambda s: None)
        _, trig = jax.jit(impl.fast)(device_matrix(m2), x)
        assert bool(trig), f"seed {seed}: single-bit fault missed by {mode}"


def test_secded_double_fault_triggers():
    m = protected("secded")
    impl = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    for seed in range(10):
        m2 = inject_bitflips(m, "ANY", 2, np.random.default_rng(seed),
                             echo=lambda s: None)
        if any((m2.planes[n] != m.planes[n]).any() for n in m.layout.word_names):
            _, trig = jax.jit(impl.fast)(device_matrix(m2), x)
            assert bool(trig)
            return
    pytest.fail("no corrupting double flip found")


@pytest.mark.parametrize("mode", ["sec7", "sec8", "secded"])
def test_backend_solve_corrects(mode):
    """Full pallas-target solve: fast loop -> classify -> scrubbed resume."""
    m = protected(mode, n=128, blocks=2)
    b = RNG.random(m.N)
    backend = create("pallas", mode)
    clean = backend.solve(m, b, 500, 1e-6, verbose=False, dtype="f32")
    assert not clean.failed and clean.corrected_count == 0

    m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(7), echo=lambda s: None)
    res = backend.solve(m2, b, 500, 1e-6, verbose=False, dtype="f32")
    assert not res.failed
    assert res.corrected_count == 1
    assert res.iterations == clean.iterations
    np.testing.assert_allclose(res.x, clean.x, rtol=1e-5)


def test_backend_solve_sed_halts():
    m = protected("sed", n=128, blocks=2)
    b = RNG.random(m.N)
    m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(1), echo=lambda s: None)
    res = create("pallas", "sed").solve(m2, b, 500, 1e-6, verbose=False, dtype="f32")
    assert res.failed and res.errcode == 1
    assert any("error detected at index" in s for s in res.messages)


def protected_ell(mode, fmt="csr", n=200, blocks=2, shuffle=False):
    """Forced-ELL matrix for the banded windowed-gather kernel; with
    ``shuffle`` the band only exists after the RCM permutation."""
    from abft_sparse_cg_tpu.utils.matgen import shuffle_labels

    tri = spd_tridiagonal(n)
    if shuffle:
        tri = shuffle_labels(*tri, seed=3)
    a = assemble(tri[1], tri[0], tri[2], tri[3], blocks)
    return build_protected(fmt, a, mode, force_exec="ell")


@pytest.mark.parametrize("shuffle", [False, True])
@pytest.mark.parametrize("mode", ["none", "sed", "sec7", "sec8", "secded"])
def test_ellb_kernel_matches_jnp(mode, shuffle):
    """Banded-ELL windowed gather: bit-identical product, no trigger."""
    m = protected_ell(mode, shuffle=shuffle)
    assert supports(m, jnp.float32) and m.exec_kind == "ell"
    assert (m.perm is not None) == shuffle
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_p = make_pallas_spmv(m, jnp.float32, mode, interpret=True)
    impl_j = make_spmv(m, jnp.float32, mode)
    if mode == "none":
        wp, _ = jax.jit(impl_p.full)(md, x)
        wj, _ = jax.jit(impl_j.full)(md, x)
    else:
        wp, trig_p = jax.jit(impl_p.fast)(md, x)
        wj, trig_j = jax.jit(impl_j.fast)(md, x)
        assert not bool(trig_p) and not bool(trig_j)
    np.testing.assert_array_equal(np.asarray(wp), np.asarray(wj))


@pytest.mark.parametrize("mode", ["sed", "sec7", "sec8", "secded"])
def test_ellb_kernel_triggers_on_fault(mode):
    m = protected_ell(mode, shuffle=True)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl = make_pallas_spmv(m, jnp.float32, mode, interpret=True)
    for seed in range(3):
        m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(seed),
                             echo=lambda s: None)
        _, trig = jax.jit(impl.fast)(device_matrix(m2), x)
        assert bool(trig), f"seed {seed}: single-bit fault missed by {mode}"


def test_constraints_pairs_kernel_with_checks():
    """Constraints mode: the kernel computes w, the jnp structural checks
    run alongside — violations still fail exactly like the jnp target."""
    m = protected_ell("constraints")
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_p = make_pallas_spmv(m, jnp.float32, "constraints", interpret=True)
    impl_j = make_spmv(m, jnp.float32, "constraints")
    wp, sp_ = jax.jit(impl_p.full)(md, x)
    wj, sj = jax.jit(impl_j.full)(md, x)
    assert int(sp_.errcode) == int(sj.errcode) == 0
    np.testing.assert_array_equal(np.asarray(wp), np.asarray(wj))
    # Corrupt a column index out of range: both implementations flag it.
    planes = {k: v.copy() for k, v in m.planes.items()}
    planes["col"][7] |= np.uint32(1 << 23)
    m2 = m.with_planes(planes)
    md2 = device_matrix(m2)
    _, s2 = jax.jit(impl_p.full)(md2, x)
    _, s2j = jax.jit(impl_j.full)(md2, x)
    assert int(s2.errcode) == int(s2j.errcode) != 0
    assert int(s2.err_slot) == int(s2j.err_slot)


def test_ellb_high_k_matrix():
    """K up to 64 stays on the kernel: a banded matrix with ~24 entries
    per row (penta-diagonal block bands) matches jnp bit-for-bit."""
    n, half = 512, 12
    rows, cols, vals = [], [], []
    rng = np.random.default_rng(8)
    for off in range(0, half):
        idx = np.arange(n - off)
        rows.append(idx + off)
        cols.append(idx)
        vals.append(-rng.random(n - off) * 0.05)
    rows, cols = np.concatenate(rows), np.concatenate(cols)
    vals = np.concatenate(vals)
    diag = rows == cols
    vals[diag] = 2.0 * half  # diagonally dominant -> SPD
    a = assemble(cols, rows, vals, n, 1)
    m = build_protected("csr", a, "secded", force_exec="ell")
    assert m.K > 16 and supports(m, jnp.float32)
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_p = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    impl_j = make_spmv(m, jnp.float32, "secded")
    wp, tp = jax.jit(impl_p.fast)(md, x)
    wj, tj = jax.jit(impl_j.fast)(md, x)
    assert not bool(tp) and not bool(tj)
    # At this K the kernel's sequential slot accumulation and XLA's tree
    # reduce reassociate differently (1-ulp); small-K cases stay exact.
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wj), rtol=1e-6)


def protected_wideband(mode, n=4096, b=2500, k=3, seed=2):
    """Uniformly wide band (random in-band neighbors) past the unrolled
    shuffle cap — the per-iteration wideband (absolute-scan) tier."""
    rng = np.random.default_rng(seed)
    rows, cols = [np.arange(n)], [np.arange(n)]
    for _ in range(k):
        d = rng.integers(1, b, n)
        i = np.arange(n)
        keep = i + d < n
        rows.append((i + d)[keep])
        cols.append(i[keep])
    rows, cols = np.concatenate(rows), np.concatenate(cols)
    vals = np.where(rows == cols, 30.0, -1.0)
    a = assemble(cols, rows, vals, n, 1)
    # force_exec pins ELL: these tests exercise the absolute-scan
    # kernel; the natural route for wide uniform bands is the
    # flat/Benes tier since round 5.
    m = build_protected("csr", a, mode, reorder="none",
                        force_exec="ell")
    assert m.exec_kind == "ell" and m.band > 1920
    return m


@pytest.mark.parametrize("mode", ["none", "sed", "secded"])
def test_ellb_wideband_kernel_matches_jnp(mode):
    """Band > 1920: the per-iteration kernel rides the absolute-row
    window scan (group-major planes), matching jnp."""
    from abft_sparse_cg_tpu.ops.spmv_pallas import (
        _ELL_MAX_WROWS,
        _ell_window,
    )

    m = protected_wideband(mode)
    assert supports(m, jnp.float32)
    assert _ell_window(m)[1] > _ELL_MAX_WROWS
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_p = make_pallas_spmv(m, jnp.float32, mode, interpret=True)
    impl_j = make_spmv(m, jnp.float32, mode)
    if mode == "none":
        wp, _ = jax.jit(impl_p.full)(md, x)
        wj, _ = jax.jit(impl_j.full)(md, x)
    else:
        wp, trig_p = jax.jit(impl_p.fast)(md, x)
        wj, trig_j = jax.jit(impl_j.fast)(md, x)
        assert not bool(trig_p) and not bool(trig_j)
    # The scan's per-group slot sums and XLA's tree reduce reassociate
    # differently (1-2 ulp; small-magnitude entries need the atol), as
    # in the high-K case above.
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wj),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["sed", "secded"])
def test_ellb_wideband_triggers_on_fault(mode):
    m = protected_wideband(mode)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl = make_pallas_spmv(m, jnp.float32, mode, interpret=True)
    for seed in range(3):
        m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(seed),
                             echo=lambda s: None)
        _, trig = jax.jit(impl.fast)(device_matrix(m2), x)
        assert bool(trig), f"seed {seed}: single-bit fault missed"


def test_k1_ell_falls_back_to_jnp():
    """K=1 ELL (one entry per row, too many distinct offsets for DIA) is
    outside every kernel tier: a (1, 128)-table lane shuffle cannot
    lower in Mosaic.  The jnp path carries it correctly."""
    from abft_sparse_cg_tpu.solver.fused import supports_fused

    n = 2048
    rng = np.random.default_rng(4)
    # Value-only entries: one off-diagonal per row at a random offset
    # would not be SPD; a diagonal matrix with shuffled row labels keeps
    # K=1 while defeating DIA adoption via force_exec.
    rows = cols = np.arange(n)
    vals = rng.random(n) + 1.0
    a = assemble(cols, rows, vals, n, 1)
    m = build_protected("csr", a, "secded", force_exec="ell")
    assert m.exec_kind == "ell" and m.K == 1
    assert not supports(m, jnp.float32)
    assert not supports_fused(m, jnp.float32, "secded", 100)
    impl = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    w, s = jax.jit(impl.full)(md, x)
    assert int(s.errcode) == 0
    np.testing.assert_allclose(np.asarray(w)[: m.N],
                               vals * np.asarray(x)[: m.N], rtol=1e-6)


def test_wide_band_past_split_rides_benes():
    """Matrices outside the windowed kernel's envelope (band past even
    the wideband tier's 16256 cap — a label shuffle with reordering
    disabled) band-split by default (fat tail, kernel main;
    tests/test_routing.py).  With the split ALSO disabled, an ELL
    layout would have NO compiled kernel at any tier, so routing
    rebuilds on the flat/Benes-route tier instead (round 5) — which
    still carries a compiled kernel."""
    from abft_sparse_cg_tpu.utils.matgen import shuffle_labels

    tri = shuffle_labels(*spd_tridiagonal(32768), seed=1)
    a = assemble(tri[1], tri[0], tri[2], tri[3], 1)
    m_split = build_protected("csr", a, "secded", reorder="none")
    assert m_split.exec_kind == "split"

    m_flat = build_protected("csr", a, "secded", reorder="none",
                             split="none")
    assert m_flat.exec_kind == "flat"
    assert m_flat.unstr_plan is not None
    assert supports(m_flat, jnp.float32)
    impl = make_pallas_spmv(m_flat, jnp.float32, "secded",
                            interpret=True)
    md = device_matrix(m_flat)
    x = jnp.asarray(RNG.random(m_flat.R), jnp.float32)
    w, s = jax.jit(impl.full)(md, x)
    assert int(s.errcode) == 0


@pytest.mark.parametrize("half", [32, 64, 127])
def test_ellb_slot_count_past_64(half):
    """Round-4 slot-cap lift: K in {65, 129, 255} ELL slots stays on
    the shuffle-gather kernel (the reference's row gather handles any
    degree uniformly, CSR/CPUContext.cpp:115-133 — this is the TPU
    envelope's equivalent).  Dense band forced to ELL; K = 2*half+1."""
    from abft_sparse_cg_tpu.utils.matgen import spd_denseband

    r, c, v, n = spd_denseband(512, half)
    a = assemble(c, r, v, n, 1)
    m = build_protected("csr", a, "secded", force_exec="ell")
    assert m.K == 2 * half + 1 and m.exec_kind == "ell"
    assert supports(m, jnp.float32)
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_p = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    impl_j = make_spmv(m, jnp.float32, "secded")
    wp, tp = jax.jit(impl_p.fast)(md, x)
    wj, tj = jax.jit(impl_j.fast)(md, x)
    assert not bool(tp) and not bool(tj)
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wj), rtol=2e-6)
    # Detection still triggers at this K: flip a stored codeword bit.
    m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(3),
                         echo=lambda s: None)
    md2 = device_matrix(m2)
    _, t2 = jax.jit(impl_p.fast)(md2, x)
    assert bool(t2)


def test_ell_slot_count_past_cap_falls_back():
    """K > _ELL_MAX_K (512) is outside the kernel envelope (the
    (K, 1024) minimum chunk planes would exhaust VMEM): supports()
    must say no and the jnp path must carry it."""
    from abft_sparse_cg_tpu.ops.spmv_pallas import _ELL_MAX_K
    from abft_sparse_cg_tpu.solver.fused import supports_fused
    from abft_sparse_cg_tpu.utils.matgen import spd_denseband

    r, c, v, n = spd_denseband(2048, 300)   # K = 601 > 512
    a = assemble(c, r, v, n, 1)
    m = build_protected("csr", a, "secded", force_exec="ell")
    assert m.K == 601 > _ELL_MAX_K
    assert not supports(m, jnp.float32)
    assert not supports_fused(m, jnp.float32, "secded", 100)
    impl = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    w, s = jax.jit(impl.full)(md, x)
    assert int(s.errcode) == 0


def test_ellb_slot_count_past_64_coo():
    """COO format (4-word codewords) through the same lifted slot
    envelope: K=129 stays on the kernel with the fold-plane signals."""
    from abft_sparse_cg_tpu.utils.matgen import spd_denseband

    r, c, v, n = spd_denseband(512, 64)
    a = assemble(c, r, v, n, 1)
    m = build_protected("coo", a, "secded", force_exec="ell")
    assert m.K == 129 and supports(m, jnp.float32)
    md = device_matrix(m)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_p = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    impl_j = make_spmv(m, jnp.float32, "secded")
    wp, tp = jax.jit(impl_p.fast)(md, x)
    wj, tj = jax.jit(impl_j.fast)(md, x)
    assert not bool(tp) and not bool(tj)
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wj), rtol=2e-6)
