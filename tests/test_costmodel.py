"""Cost-model scope fence (VERDICT r4 item 5): the solve-level model
in scripts/zoo_bench.py predicts only the validated regimes and
REFUSES out-of-scope queries (returns None) — routing never depends
on it blind (the split-cut decision uses formats.split's own fitted
constants directly)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from abft_sparse_cg_tpu.formats import assemble, build_protected
from abft_sparse_cg_tpu.utils.matgen import spd_tridiagonal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def model():
    spec = importlib.util.spec_from_file_location(
        "zoo_bench", os.path.join(REPO, "scripts", "zoo_bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["zoo_bench"] = mod
    spec.loader.exec_module(mod)
    return mod.model_solve_ms


def test_dia_in_scope(model):
    r, c, v, n = spd_tridiagonal(512)
    m = build_protected("csr", assemble(c, r, v, n, 2), "none")
    assert m.exec_kind == "dia"
    ms = model(m, 100)
    # Floor plus a tiny per-iteration term; grows with iterations.
    assert ms is not None and 1.0 < ms < 10.0
    assert model(m, 1000) > ms


def test_flat_unstructured_in_scope(model):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_unstructured import random_graph

    m = random_graph()
    assert m.exec_kind == "flat" and m.unstr_plan is not None
    ms = model(m, 25)
    assert ms is not None and ms > 1.0


def test_high_k_beyond_envelope_refused(model):
    """K past the validated 512-slot cap: the model must refuse, not
    extrapolate (the r4 dense-radius-3d +2563% class of error)."""
    n = 1024
    rng = np.random.default_rng(0)
    rows, cols, vals = [np.arange(n)], [np.arange(n)], [np.ones(n) * 700.0]
    for d in range(1, 600):
        rows.append(np.arange(d, n))
        cols.append(np.arange(n - d))
        vals.append(-np.full(n - d, 1e-3))
    a = assemble(np.concatenate(cols), np.concatenate(rows),
                 np.concatenate(vals), n, 1)
    m = build_protected("csr", a, "none", force_exec="ell")
    assert m.exec_kind == "ell" and m.K > 512
    assert model(m, 10) is None


def test_flat_without_plan_uses_tail_constant(model, monkeypatch):
    """A flat matrix outside the Benes envelope rides the XLA-gather
    constant (the _TAIL_NS regime the split cut is fitted on)."""
    monkeypatch.setenv("ABFT_NO_UNSTR", "1")
    r, c, v, n = spd_tridiagonal(256)
    m = build_protected("csr", assemble(c, r, v, n, 1), "none",
                        force_exec="flat")
    assert getattr(m, "unstr_plan", None) is None
    assert model(m, 10) is not None
