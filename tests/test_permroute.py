"""Static-permutation routing tables (utils.permroute) — the round-5
unstructured-SpMV groundwork.  Verifies the Hall/Clos 3-stage
decomposition end-to-end against direct application, across sizes and
degenerate cases."""

import numpy as np
import pytest

from abft_sparse_cg_tpu.utils.permroute import (
    apply_grid_permutation_np,
    decompose_grid_permutation,
)


@pytest.mark.parametrize("R,C,seed", [(2, 2, 0), (8, 8, 1), (16, 128, 2),
                                      (64, 128, 3), (256, 128, 4)])
def test_decomposition_roundtrip(R, C, seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(R * C)
    x = rng.random((R, C)).astype(np.float32)
    s1, rowp, s2 = decompose_grid_permutation(perm, R, C)
    got = apply_grid_permutation_np(x, s1, rowp, s2)
    want = np.empty(R * C, np.float32)
    want[perm] = x.ravel()
    assert np.array_equal(got.ravel(), want)


def test_identity_and_reverse():
    R, C = 32, 128
    for perm in (np.arange(R * C), np.arange(R * C)[::-1].copy()):
        s1, rowp, s2 = decompose_grid_permutation(perm, R, C)
        x = np.arange(R * C, dtype=np.float32).reshape(R, C)
        got = apply_grid_permutation_np(x, s1, rowp, s2)
        want = np.empty(R * C, np.float32)
        want[perm] = x.ravel()
        assert np.array_equal(got.ravel(), want)


def test_stage_tables_are_valid_shuffles():
    """sigma1 rows are permutations of lanes (the stage-1 scatter is a
    legal lane shuffle); rowp lanes are permutations of rows."""
    rng = np.random.default_rng(9)
    R, C = 16, 16
    perm = rng.permutation(R * C)
    s1, rowp, s2 = decompose_grid_permutation(perm, R, C)
    for r in range(R):
        assert sorted(s1[r]) == list(range(C))
        assert sorted(s2[r]) == list(range(C))
    for lane in range(C):
        assert sorted(rowp[lane]) == list(range(R))
