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


@pytest.mark.parametrize("mode", ["sed", "sec7", "sec8", "secded"])
def test_devices_ell_fault_events_match_single(mode):
    """ELL layout on the 8-device mesh: injected faults produce the same
    canonical events as the single-device solve — exercises the sharded
    gather (all-gather of p) and the err_slot mapping under mesh padding
    (N=148 rows pad to 192 on 8 devices)."""
    rows, cols, vals, n = spd_tridiagonal(37)
    a = assemble(cols, rows, vals, n, 4)  # N = 148
    m = build_protected("csr", a, mode, force_exec="ell")
    assert m.exec_kind == "ell"
    b = RNG.random(m.N)
    backend = create("jnp", mode)
    for seed in range(3):
        m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(seed),
                             echo=lambda s: None)
        single = backend.solve(m2, b, 300, 1e-10, verbose=False, dtype="f64")
        shard = backend.solve(m2, b, 300, 1e-10, verbose=False, dtype="f64",
                              devices=8)
        assert shard.errcode == single.errcode, f"seed {seed}"
        assert shard.err_index == single.err_index, f"seed {seed}"
        assert shard.corrected_count == single.corrected_count
        assert shard.messages == single.messages, f"seed {seed}"
        if not single.failed:
            np.testing.assert_allclose(shard.x, single.x, rtol=1e-12)


def test_devices_flag_permuted_matrix():
    """RCM-permuted matrix through the sharded backend path."""
    from abft_sparse_cg_tpu.utils.matgen import shuffle_labels

    tri = shuffle_labels(*spd_tridiagonal(64), seed=5)
    a = assemble(tri[1], tri[0], tri[2], tri[3], 4)
    m = build_protected("csr", a, "secded")
    assert m.perm is not None
    b = RNG.random(m.N)
    backend = create("jnp", "secded")
    single = backend.solve(m, b, 300, 1e-10, verbose=False, dtype="f64")
    shard = backend.solve(m, b, 300, 1e-10, verbose=False, dtype="f64",
                          devices=8)
    assert not shard.failed
    assert shard.iterations == single.iterations
    np.testing.assert_allclose(shard.x, single.x, rtol=1e-12)


def test_devices_flag_cli():
    """`--devices 8` drives the GSPMD path black-box through the CLI."""
    import subprocess
    import sys

    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mtx = os.path.join(repo, "matrices", "shallow_water1",
                       "shallow_water1.mtx")
    if not os.path.exists(mtx):
        pytest.skip("bundled matrix not generated")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bin", "cg-csr"), "-b", "2",
         "-m", "secded", "--devices", "8", "--seed", "11", "--quiet"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "time taken" in proc.stdout


def _bordered(n=2048, dense_rows=(17, 900), spread=300):
    """Tridiagonal core + dense rows — selects the bordered split."""
    rows, cols, vals, n = spd_tridiagonal(n)
    rows, cols, vals = list(rows), list(cols), list(vals)
    rng = np.random.default_rng(3)
    for r in dense_rows:
        targets = np.setdiff1d(rng.choice(n, size=spread, replace=False),
                               [r - 1, r, r + 1])
        for c in targets:
            hi, lo = max(r, int(c)), min(r, int(c))
            rows.append(hi)
            cols.append(lo)
            vals.append(-0.01)
    rows, cols = np.array(rows), np.array(cols)
    vals = np.array(vals, dtype=float)
    deg = np.bincount(rows, minlength=n) + np.bincount(cols, minlength=n)
    diag = rows == cols
    vals[diag] = deg.astype(float)[rows[diag]] + 4.0
    return assemble(cols, rows, vals, n, 1)


@pytest.mark.parametrize("mode", ["sed", "sec7", "sec8", "secded"])
def test_sharded_split_fault_events_match_single(mode):
    """Bordered composite on the 8-device mesh: main part row-sharded,
    flat tail entry-sharded; injected faults (which can land in either
    part) produce the single-device canonical events."""
    a = _bordered()
    m = build_protected("csr", a, mode)
    assert m.exec_kind == "split"
    b = RNG.random(m.N)
    backend = create("jnp", mode)
    for seed in range(3):
        m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(seed),
                             echo=lambda s: None)
        single = backend.solve(m2, b, 2000, 1e-10, verbose=False,
                               dtype="f64")
        shard = backend.solve(m2, b, 2000, 1e-10, verbose=False,
                              dtype="f64", devices=8)
        assert shard.errcode == single.errcode, f"seed {seed}"
        assert shard.err_index == single.err_index, f"seed {seed}"
        assert shard.corrected_count == single.corrected_count
        assert shard.messages == single.messages, f"seed {seed}"
        if not single.failed:
            # Shard-local partial sums reduce in a different order; both
            # solves converged to rr <= 1e-10, so solutions agree to the
            # convergence-implied slack, not to ulps.
            np.testing.assert_allclose(shard.x, single.x, rtol=1e-4,
                                       atol=1e-7)


def test_sharded_split_scrub_retrieval():
    """A corrected sharded composite solve yields repaired planes."""
    a = _bordered()
    m = build_protected("csr", a, "sec8")
    assert m.exec_kind == "split"
    b = RNG.random(m.N)
    m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(11),
                         echo=lambda s: None)
    res = create("jnp", "sec8").solve(m2, b, 2000, 1e-10, verbose=False,
                                      dtype="f64", devices=8)
    assert not res.failed and res.corrected_count == 1
    for n in m.layout.word_names:
        assert (res.scrubbed.planes[n] == m.planes[n]).all()


def test_devices_flag_rejected_for_native_target():
    m = protected("csr", "none", n=32, blocks=1)
    b = RNG.random(m.N)
    try:
        backend = create("cpu", "none")
    except Exception:
        pytest.skip("native backend unavailable")
    with pytest.raises(ValueError):
        backend.solve(m, b, 100, 1e-8, verbose=False, devices=8)
