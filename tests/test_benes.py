"""Benes-network routing (utils.benes) — the static-permutation
primitive behind the unstructured/expander SpMV tier.

The TPU kernel applies 2*log2(M)-1 shared-distance exchange stages
(out[i] = ctrl ? in[i^d] : in[i]); these tests pin the build-time
routing (looping algorithm) against that exact semantics via the
numpy oracle, exhaustively at small sizes and randomized at kernel
sizes."""

import numpy as np
import pytest

from abft_sparse_cg_tpu.utils.benes import (
    apply_benes_np,
    benes_route,
    benes_stages,
    pack_ctrl,
)

RNG = np.random.default_rng(7)


def test_stage_list_shape():
    assert benes_stages(2) == [1]
    assert benes_stages(8) == [4, 2, 1, 2, 4]
    s = benes_stages(1 << 19)
    assert len(s) == 2 * 19 - 1 and s[19 - 1] == 1


@pytest.mark.parametrize("M", [2, 4, 8, 16, 32, 128, 1024])
def test_routes_random_permutations(M):
    for _ in range(8):
        dst = RNG.permutation(M)
        ctrl = benes_route(dst)
        assert ctrl.shape == (len(benes_stages(M)), M)
        # Pair symmetry: both positions of an exchange share the bit.
        for s, d in enumerate(benes_stages(M)):
            assert (ctrl[s] == ctrl[s][np.arange(M) ^ d]).all()
        out = apply_benes_np(np.arange(M), ctrl)
        assert (out[dst] == np.arange(M)).all()


def test_identity_and_reverse():
    M = 256
    for dst in (np.arange(M), np.arange(M)[::-1].copy()):
        out = apply_benes_np(np.arange(M), benes_route(dst))
        assert (out[dst] == np.arange(M)).all()


def test_exhaustive_size_4():
    from itertools import permutations

    for p in permutations(range(4)):
        dst = np.array(p)
        out = apply_benes_np(np.arange(4), benes_route(dst))
        assert (out[dst] == np.arange(4)).all()


def test_pack_ctrl_roundtrip():
    M = 64
    dst = RNG.permutation(M)
    ctrl = benes_route(dst)
    packed = pack_ctrl(ctrl)
    assert packed.dtype == np.uint32
    for s in range(ctrl.shape[0]):
        bit = (packed[s // 32] >> np.uint32(s % 32)) & np.uint32(1)
        assert (bit == ctrl[s]).all()


def test_rejects_non_power_of_two():
    with pytest.raises(AssertionError):
        benes_stages(12)


def test_native_matches_python(monkeypatch):
    """The C++ router (native/benes_route.cpp) must emit bit-identical
    control planes to the numpy looping algorithm... up to the freedom
    in cycle traversal order — both must ROUTE correctly, which is the
    semantic contract (apply -> dst)."""
    from abft_sparse_cg_tpu.utils import benes as B

    if B._load_native() is None:
        pytest.skip("native router unavailable")
    for M in (8, 64, 1024, 8192):
        dst = RNG.permutation(M)
        ctrl_native = benes_route(dst)
        monkeypatch.setenv("ABFT_NO_NATIVE_BENES", "1")
        ctrl_py = benes_route(dst)
        monkeypatch.delenv("ABFT_NO_NATIVE_BENES")
        for ctrl in (ctrl_native, ctrl_py):
            out = apply_benes_np(np.arange(M), ctrl)
            assert (out[dst] == np.arange(M)).all()
        # The two algorithms pick colors in different cycle orders, so
        # bits may differ; both being valid routings is what matters.
