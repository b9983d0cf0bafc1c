"""Multi-device tests on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import pytest

import jax

from abft_sparse_cg_tpu.backends import create
from abft_sparse_cg_tpu.formats import assemble, build_protected
from abft_sparse_cg_tpu.inject import inject_bitflips
from abft_sparse_cg_tpu.parallel.sharded import default_mesh, solve_sharded
from abft_sparse_cg_tpu.utils.matgen import spd_tridiagonal

RNG = np.random.default_rng(99)


def protected(fmt="csr", mode="secded", n=64, blocks=4):
    rows, cols, vals, n = spd_tridiagonal(n)
    a = assemble(cols, rows, vals, n, blocks)
    return build_protected(fmt, a, mode)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("fmt", ["csr", "coo"])
@pytest.mark.parametrize("mode", ["none", "secded"])
def test_sharded_matches_single_device(fmt, mode):
    import jax.numpy as jnp

    m = protected(fmt, mode)
    b = RNG.random(m.N)
    mesh = default_mesh(8)
    res = solve_sharded(m, b, 500, 1e-10, mesh=mesh, dtype=jnp.float64)

    ref = create("jnp", mode).solve(m, b, 500, 1e-10, verbose=False, dtype="f64")
    assert int(res.stats.errcode) == 0
    assert int(res.iterations) == ref.iterations
    np.testing.assert_allclose(np.asarray(res.x)[: m.N], ref.x, rtol=1e-12)
    np.testing.assert_allclose(float(res.rr), ref.rr, rtol=1e-10)


def test_sharded_correction_and_detection():
    import jax.numpy as jnp

    mesh = default_mesh(8)
    # Correction under sec8 with an injected flip.
    m = protected("csr", "sec8")
    b = RNG.random(m.N)
    m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(5), echo=lambda s: None)
    res = solve_sharded(m2, b, 500, 1e-10, mesh=mesh, dtype=jnp.float64)
    assert int(res.stats.errcode) == 0
    assert int(res.stats.corrected_count) > 0

    # Detection under sed halts the sharded loop too.
    msed = protected("csr", "sed")
    m3 = inject_bitflips(msed, "ANY", 1, np.random.default_rng(6), echo=lambda s: None)
    res = solve_sharded(m3, b, 500, 1e-10, mesh=mesh, dtype=jnp.float64)
    assert int(res.stats.errcode) == 1  # ERR_SED
    assert int(res.stats.err_slot) >= 0


def test_sharded_uneven_rows_padding():
    """N not divisible by 8*ndev: padding keeps results exact."""
    import jax.numpy as jnp

    rows, cols, vals, n = spd_tridiagonal(37)
    a = assemble(cols, rows, vals, n, 3)  # N = 111
    m = build_protected("csr", a, "none")
    b = RNG.random(m.N)
    res = solve_sharded(m, b, 500, 1e-12, mesh=default_mesh(8), dtype=jnp.float64)
    ref = create("jnp", "none").solve(m, b, 500, 1e-12, verbose=False, dtype="f64")
    np.testing.assert_allclose(np.asarray(res.x)[: m.N], ref.x, rtol=1e-12)
