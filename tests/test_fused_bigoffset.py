"""Big-offset DIA megakernel tier (solver.fused, ABFT_FUSED_BIG_OFFSET).

DIA offsets reaching past one chunk of halo — periodic wrap couplings,
n^2-stride 3-D stencils at scale — cannot use the per-chunk extended
block (it would materialize 2*offset rows of p per chunk); the
big-offset mode reads each stencil shift straight from the
VMEM-resident haloed p with 8-sublane-aligned dynamic slices
(shifted_big).  Gated by ABFT_FUSED_BIG_OFFSET until the pattern is
Mosaic-validated on hardware; these interpret-mode tests pin its
semantics against the jnp solver meanwhile.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abft_sparse_cg_tpu.formats import assemble, build_protected
from abft_sparse_cg_tpu.inject import inject_bitflips
from abft_sparse_cg_tpu.ops.spmv import make_matrix_device, make_spmv
from abft_sparse_cg_tpu.solver.cg import make_cg_solver
from abft_sparse_cg_tpu.solver.fused import (
    _plan,
    make_fused_solver,
    supports_fused,
)

RNG = np.random.default_rng(31)

N = 131072        # R = N (1024-divisible); chunk C = 65536 -> ROWS = 512
FAR = 100000      # halo rows 100000/128 ~ 782 > ROWS -> big-offset mode


def bigoff_matrix(mode="secded"):
    """Chain + sparse long-range couplings at +-FAR: DIA with offsets
    (0, +-1, +-FAR) whose halo exceeds one chunk."""
    n = N
    rows = list(range(n)) + list(range(1, n))
    cols = list(range(n)) + list(range(n - 1))
    vals = [6.0] * n + [-1.0] * (n - 1)
    for i in range(0, n - FAR, 16):
        rows.append(i + FAR)
        cols.append(i)
        vals.append(-0.5)
    a = assemble(np.array(cols), np.array(rows),
                 np.array(vals, float), n, 1)
    m = build_protected("csr", a, mode)
    assert m.exec_kind == "dia" and max(m.dia_offsets) == FAR
    assert m.R == n
    return m


def bvec(m):
    b = np.zeros(m.R)
    b[: m.N] = RNG.random(m.N)
    return jnp.asarray(b, jnp.float32)


def test_big_offset_gated_by_env(monkeypatch):
    """Hardware-validated at the current pattern version: ON by
    default, ABFT_FUSED_BIG_OFFSET=0 forces it off, =1 forces it on."""
    m = bigoff_matrix()
    monkeypatch.delenv("ABFT_FUSED_BIG_OFFSET", raising=False)
    assert supports_fused(m, jnp.float32, "secded", 300)
    monkeypatch.setenv("ABFT_FUSED_BIG_OFFSET", "0")
    assert not supports_fused(m, jnp.float32, "secded", 300)
    monkeypatch.setenv("ABFT_FUSED_BIG_OFFSET", "1")
    assert supports_fused(m, jnp.float32, "secded", 300)
    mp = _plan(m, "secded")
    assert mp["big"] and not mp["streaming"]
    assert max(mp["Hlo"], mp["Hhi"]) > mp["ROWS"]


@pytest.mark.parametrize("mode", ["none", "secded"])
def test_big_offset_matches_jnp_clean(monkeypatch, mode):
    monkeypatch.setenv("ABFT_FUSED_BIG_OFFSET", "1")
    m = bigoff_matrix(mode)
    md = make_matrix_device(m, jnp.float32)
    b = bvec(m)
    r0 = jax.jit(make_cg_solver(make_spmv(m, jnp.float32, mode),
                                300, 1e-8))(md, b)
    r1 = jax.jit(make_fused_solver(m, mode, 300, 1e-8,
                                   interpret=True))(md, b)
    assert int(r1.stats.errcode) == 0
    assert int(r1.iterations) == int(r0.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               rtol=2e-5, atol=2e-6)


def test_big_offset_corrects_fault(monkeypatch):
    monkeypatch.setenv("ABFT_FUSED_BIG_OFFSET", "1")
    m = bigoff_matrix("secded")
    b = bvec(m)
    fus = jax.jit(make_fused_solver(m, "secded", 300, 1e-8,
                                    interpret=True))
    clean = fus(make_matrix_device(m, jnp.float32), b)
    assert int(clean.stats.errcode) == 0
    m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(5),
                         echo=lambda s: None)
    r = fus(make_matrix_device(m2, jnp.float32), b)
    assert int(r.stats.errcode) == 0
    assert int(r.stats.corrected_count) == 1
    assert int(r.iterations) == int(clean.iterations)
    np.testing.assert_array_equal(np.asarray(r.x), np.asarray(clean.x))


def test_big_offset_streaming_tier(monkeypatch):
    """The streaming kernel has the same big-offset read path."""
    monkeypatch.setenv("ABFT_FUSED_BIG_OFFSET", "1")
    m = bigoff_matrix("secded")
    mp = _plan(m, "secded", force_streaming=True)
    assert mp["big"] and mp["streaming"]
    md = make_matrix_device(m, jnp.float32)
    b = bvec(m)
    r0 = jax.jit(make_cg_solver(make_spmv(m, jnp.float32, "secded"),
                                300, 1e-8))(md, b)
    r1 = jax.jit(make_fused_solver(m, "secded", 300, 1e-8,
                                   interpret=True,
                                   force_streaming=True))(md, b)
    assert int(r1.stats.errcode) == 0
    assert int(r1.iterations) == int(r0.iterations)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               rtol=2e-5, atol=2e-6)


def test_big_offset_marker_enables(monkeypatch, tmp_path):
    """After a pattern-version bump (version != highest validated), the
    mode re-gates behind the smoke's marker: a matching marker
    auto-enables it without the env knob; a stale-version marker does
    not."""
    from abft_sparse_cg_tpu.solver import fused
    from abft_sparse_cg_tpu.solver.fused import (
        bigoffset_validated,
        mark_bigoffset_validated,
    )

    monkeypatch.setenv("ABFT_CG_COMPILE_CACHE", str(tmp_path))
    monkeypatch.delenv("ABFT_FUSED_BIG_OFFSET", raising=False)
    monkeypatch.setattr(fused, "_BIGOFF_VERSION", "2-unvalidated")
    m = bigoff_matrix()
    assert not bigoffset_validated()
    assert not supports_fused(m, jnp.float32, "secded", 300)
    mark_bigoffset_validated()
    assert bigoffset_validated()
    assert supports_fused(m, jnp.float32, "secded", 300)
    assert _plan(m, "secded")["big"]
    (tmp_path / "bigoffset_validated").write_text("0-stale")
    assert not bigoffset_validated()
    assert not supports_fused(m, jnp.float32, "secded", 300)
