"""Adversarial matrix zoo: routing assertions (utils.matzoo).

Ten structurally distinct SPD families NOT drawn from the bench
generators; each entry pins the verified layout/tier decision under the
CLI's pallas build (`row_align=1024`).  scripts/zoo_bench.py re-checks
the same predictions on hardware and adds timing vs the compiled
reference binary.  A regression that silently drops a family from its
compiled tier fails here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from abft_sparse_cg_tpu.formats import build_protected
from abft_sparse_cg_tpu.ops.spmv_pallas import supports
from abft_sparse_cg_tpu.utils.matzoo import ZOO, zoo_assembled

# Families small enough for the CPU test budget; the rest (identical
# code path, bigger constants) run in scripts/zoo_bench.py only.
FAST = [n for n in ZOO if n not in ("blockdiag-random",
                                    "dense-radius-k729")]  # k729's Benes
#                                     plan build (~15 s) gets its own test


@pytest.mark.parametrize("name", FAST)
def test_zoo_routing(name):
    _builder, pred = ZOO[name]
    m = build_protected("csr", zoo_assembled(name), "secded",
                        row_align=1024)
    assert m.exec_kind == pred["kind"], (name, m.exec_kind)
    assert (m.perm is not None) == pred["perm"], name
    if m.exec_kind == "split":
        kern = supports(m.main, jnp.float32)
    else:
        kern = supports(m, jnp.float32)
    assert kern == pred["kernel"], (name, kern)


def test_zoo_arrowhead_gets_dense_tail_plan():
    """The fat-but-dense tail (66% of nnz in 3 dense rows) must ride
    the span-window plan — the round-4 _MAX_TAIL_FRAC_DENSE regime."""
    m = build_protected("csr", zoo_assembled("arrowhead"), "secded",
                        row_align=1024)
    assert m.exec_kind == "split"
    assert m.main.exec_kind == "dia"
    assert m.tail.dense_plan is not None


def test_zoo_k729_routes_to_benes_tier():
    """K=729 > the 512-slot ELL envelope at band <= the split trigger:
    an ELL layout would have NO compiled kernel at any tier, so
    routing must rebuild on the flat/Benes route with the plan
    attached (VERDICT r4 item 8)."""
    m = build_protected("csr", zoo_assembled("dense-radius-k729"),
                        "secded", row_align=1024)
    assert m.exec_kind == "flat" and m.K == 729
    assert m.unstr_plan is not None
    assert supports(m, jnp.float32)


def test_zoo_highk_k175_on_kernel():
    """dense-radius-3d: K=175 — past the old 64-slot cap, inside the
    round-4 envelope; must stay on the compiled ELL tier."""
    m = build_protected("csr", zoo_assembled("dense-radius-3d"),
                        "secded", row_align=1024)
    assert m.exec_kind == "ell" and m.K == 175
    assert supports(m, jnp.float32)


def test_zoo_solves_correctly():
    """End-to-end correctness on the nastiest three: jnp f64 solve
    converges and matches a dense-ish oracle residual."""
    from abft_sparse_cg_tpu.backends import create

    for name in ("arrowhead", "bitreversal-banded", "powerlaw-graph"):
        a = zoo_assembled(name)
        m = build_protected("csr", a, "secded", row_align=1024)
        b = np.random.default_rng(3).random(m.N)
        res = create("jnp", "secded").solve(m, b, 400, 1e-8,
                                            verbose=False, dtype="f64")
        assert not res.failed, name
        x = np.asarray(res.x)
        # True residual via triplet SpMV.
        ax = np.zeros(m.N)
        np.add.at(ax, a.rows, a.values * x[a.cols])
        rr = np.linalg.norm(b - ax) / np.linalg.norm(b)
        assert rr < 1e-6, (name, rr)
