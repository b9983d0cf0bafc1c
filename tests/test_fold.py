"""Rotated-fold live detection (ecc.fold; PARITY.md "fold" section).

The kernel tiers stream ONE derived plane for live detection instead of
every codeword word; these tests pin (a) the algebraic properties the
scope argument rests on, (b) the detect/miss boundary at the fault
classes the reference contract names (1-bit correct, 2-bit detect), and
(c) the one engineered blind spot (a >= 4-bit fold-cancelling pattern)
so a change to the shift schedule cannot silently move it.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from abft_sparse_cg_tpu.ecc.fold import FOLD_SHIFTS, fold_cksum_np, fold_words
from abft_sparse_cg_tpu.formats import assemble, build_protected
from abft_sparse_cg_tpu.ops.spmv import make_matrix_device
from abft_sparse_cg_tpu.ops.spmv_pallas import make_pallas_spmv
from abft_sparse_cg_tpu.utils.matgen import spd_tridiagonal

RNG = np.random.default_rng(11)


def _columns():
    """(word, bit) -> fold-delta as an int bitmask."""
    cols = {}
    for j, sh in enumerate(FOLD_SHIFTS):
        for b in range(32):
            v = 0
            for s in sh:
                v ^= 1 << ((b + s) % 32)
            cols[(j, b)] = v
    return cols


def test_columns_distinct_nonzero_odd():
    cols = _columns()
    assert len(set(cols.values())) == len(cols)  # injective on 1-bit
    for v in cols.values():
        assert v != 0
        assert bin(v).count("1") % 2 == 1  # odd weight -> parity exact


def test_two_bit_deltas_nonzero():
    """Any 2 flipped bits within one element change the fold — the
    double-bit-detect contract's foundation."""
    cols = list(_columns().values())
    for a, b in itertools.combinations(cols, 2):
        assert a ^ b != 0


def test_parity_preserved():
    """parity(fold) == parity of the whole codeword, per element."""
    ws = [RNG.integers(0, 2 ** 32, size=257, dtype=np.uint64)
          .astype(np.uint32) for _ in range(4)]
    F = fold_words(ws)

    def par(x):
        return np.bitwise_count(x.astype(np.uint32)).astype(np.uint32) & 1

    for w in (2, 3, 4):
        want = par(ws[0])
        for i in range(1, w):
            want = want ^ par(ws[i])
        assert np.array_equal(par(fold_words(ws[:w])), want)
    assert np.array_equal(par(F), par(ws[0]) ^ par(ws[1]) ^ par(ws[2])
                          ^ par(ws[3]))


def test_cksum_linearity():
    """cksum(fold(words)) == fold(cksum(words)) — why no new persisted
    baseline is needed."""
    ws = [RNG.integers(0, 2 ** 32, size=(5, 64), dtype=np.uint64)
          .astype(np.uint32) for _ in range(3)]

    def cks(p):
        f = np.bitwise_xor.reduce(p, axis=0)
        return np.bitwise_xor.reduce(f.reshape(-1, 8), axis=1)

    got = cks(fold_words(ws))
    want = fold_cksum_np(np.stack([cks(w) for w in ws]))[0]
    assert np.array_equal(got, want)


def _mat(mode="secded", n=512):
    tri = spd_tridiagonal(n)
    a = assemble(tri[1], tri[0], tri[2], tri[3], 1)
    return build_protected("csr", a, mode)


def _flip_exec_bits(m, flips):
    """Flip (word_index, exec_flat_slot, bit) triples in the exec planes
    via with_planes (canonical round-trip keeps checksums stale)."""
    planes = {n: p.copy() for n, p in m.planes.items()}
    names = m.layout.word_names
    for wi, can_idx, bit in flips:
        planes[names[wi]][can_idx] ^= np.uint32(1 << bit)
    return m.with_planes(planes)


def _trigger(m, m2):
    md2 = make_matrix_device(m2, jnp.float32)
    impl = make_pallas_spmv(m, jnp.float32, m.mode, interpret=True)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    _, trig = jax.jit(impl.fast)(md2, x)
    return bool(trig)


def test_single_bit_always_triggers():
    m = _mat()
    for wi in range(3):
        for bit in (0, 13, 31):
            assert _trigger(m, _flip_exec_bits(m, [(wi, 100, bit)])), (
                wi, bit)


def test_double_bit_same_element_triggers():
    """Incl. the same-bit-different-word pairs a plain (unrotated) fold
    would cancel — the engineered distinct-column property."""
    m = _mat()
    for (w1, b1), (w2, b2) in [((0, 5), (1, 5)), ((1, 9), (2, 9)),
                               ((0, 0), (2, 0)), ((0, 3), (0, 17)),
                               ((1, 31), (2, 2))]:
        m2 = _flip_exec_bits(m, [(w1, 200, b1), (w2, 200, b2)])
        assert _trigger(m, m2), ((w1, b1), (w2, b2))


def test_fold_cancelling_quad_is_the_documented_blind_spot():
    """The PARITY.md-documented >= 4-bit delta: bits {0,1,2} of w1 fold
    to the same delta as bit 0 of... construct a true cancelling set
    from the column table and pin that (a) the folded live path misses
    it, (b) the per-word live path (ABFT_LIVE_FOLD=0) catches it, and
    (c) the classify oracle still sees it — the blind spot is confined
    to the live trigger, not to correctness reporting."""
    cols = _columns()
    # Find a 4-subset of columns XORing to zero, all in one element.
    keys = list(cols)
    found = None
    for quad in itertools.combinations(keys[:40], 4):
        if cols[quad[0]] ^ cols[quad[1]] ^ cols[quad[2]] ^ cols[quad[3]] == 0:
            found = quad
            break
    assert found is not None
    m = _mat()
    m2 = _flip_exec_bits(m, [(wi, 300, b) for wi, b in found])
    assert not _trigger(m, m2)          # folded live misses (documented)

    import os

    os.environ["ABFT_LIVE_FOLD"] = "0"
    try:
        assert _trigger(m, m2)          # per-word live catches
    finally:
        del os.environ["ABFT_LIVE_FOLD"]

    # The full oracle (classify path reads true words) still reports it.
    from abft_sparse_cg_tpu.ops.spmv import make_spmv

    impl_j = make_spmv(m, jnp.float64, "secded")
    x = jnp.asarray(RNG.random(m.R), jnp.float64)
    _, trig_j = jax.jit(impl_j.fast)(make_matrix_device(m2, jnp.float64), x)
    assert bool(trig_j)


@pytest.mark.parametrize("mode", ["sed", "sec7", "sec8", "secded"])
def test_device_fold_attached_per_mode(mode):
    m = _mat(mode)
    md = make_matrix_device(m, jnp.float32)
    assert md.fold is not None and md.fold_ck is not None
    assert md.fold.shape == md.words[0].shape
    assert md.fold_ck.shape == (1, m.R // 8)
    # Baseline consistency: fold of the device words checksums to the
    # fold of the stored checksums (clean matrix).
    f = np.asarray(md.fold)
    got = np.bitwise_xor.reduce(
        np.bitwise_xor.reduce(f, axis=0).reshape(-1, 8), axis=1)
    assert np.array_equal(got, np.asarray(md.fold_ck)[0])


def test_mode_none_has_no_fold():
    m = _mat("none")
    md = make_matrix_device(m, jnp.float32)
    assert md.fold is None and md.fold_ck is None


@pytest.mark.parametrize("weight", [1, 2])
def test_fuzz_contract_weights_always_detected(weight):
    """The reference contract domain (1-bit correct / 2-bit detect):
    EVERY random same-element fault of weight 1 or 2 triggers the
    folded live path, across words and bit positions (100 patterns)."""
    m = _mat()
    impl = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    fast = jax.jit(impl.fast)
    rng = np.random.default_rng(42)
    for _ in range(100):
        el = int(rng.integers(0, m.nnz))
        picks = rng.choice(96, size=weight, replace=False)
        flips = [(int(b) // 32, el, int(b) % 32) for b in picks]
        m2 = _flip_exec_bits(m, flips)
        _, trig = fast(make_matrix_device(m2, jnp.float32), x)
        assert bool(trig), (el, picks)


def test_fuzz_higher_weights_scope_vs_per_word():
    """Beyond the contract domain (>= 3-bit same-element faults), the
    folded and per-word live schedules may differ only in the
    documented >= 4-bit cancellation class; measure the divergence rate
    over 150 random patterns and pin that (a) weight-3 is always
    caught by BOTH (odd weight -> exact parity arm), (b) weight-4
    divergences stay rare (< 10%) and one-sided (fold misses where
    words catch, never a fold-only false trigger on clean data)."""
    import os

    m = _mat()
    x = jnp.asarray(RNG.random(m.R), jnp.float32)
    impl_f = make_pallas_spmv(m, jnp.float32, "secded", interpret=True)
    os.environ["ABFT_LIVE_FOLD"] = "0"
    try:
        impl_w = make_pallas_spmv(m, jnp.float32, "secded",
                                  interpret=True)
    finally:
        del os.environ["ABFT_LIVE_FOLD"]
    fast_f, fast_w = jax.jit(impl_f.fast), jax.jit(impl_w.fast)
    rng = np.random.default_rng(7)
    diverge = 0
    for weight in (3, 4):
        for _ in range(75):
            el = int(rng.integers(0, m.nnz))
            picks = rng.choice(96, size=weight, replace=False)
            flips = [(int(b) // 32, el, int(b) % 32) for b in picks]
            md2 = make_matrix_device(_flip_exec_bits(m, flips),
                                     jnp.float32)
            tf = bool(fast_f(md2, x)[1])
            tw = bool(fast_w(md2, x)[1])
            if weight == 3:
                assert tf and tw, (el, picks)  # odd -> parity, both
            else:
                assert tf or not tw or True
                if tf != tw:
                    diverge += 1
                    assert tw and not tf, "fold-only trigger impossible"
    assert diverge < 8, diverge  # < ~10% of weight-4 patterns


def test_per_word_fallback_full_solve(monkeypatch):
    """ABFT_LIVE_FOLD=0 (the per-word A/B escape) must keep the full
    fused solve green: clean converges, injected single-bit corrects
    bit-exactly — the fallback path cannot rot."""
    from abft_sparse_cg_tpu.inject import inject_bitflips
    from abft_sparse_cg_tpu.solver.fused import _plan, make_fused_solver

    monkeypatch.setenv("ABFT_LIVE_FOLD", "0")
    tri = spd_tridiagonal(1024)
    a = assemble(tri[1], tri[0], tri[2], tri[3], 1)
    m = build_protected("csr", a, "secded", row_align=1024)
    assert not _plan(m, "secded")["folded"]
    fus = jax.jit(make_fused_solver(m, "secded", 100, 1e-7,
                                    interpret=True))
    md = make_matrix_device(m, jnp.float32)
    b = jnp.asarray(RNG.random(m.R), jnp.float32)
    res = fus(md, b, None)
    assert int(res.stats.errcode) == 0 and float(res.rr) <= 1e-7
    m1 = inject_bitflips(m, "ANY", 1, np.random.default_rng(5),
                         echo=lambda s: None)
    r1 = fus(make_matrix_device(m1, jnp.float32), b, None)
    assert int(r1.stats.errcode) == 0
    assert int(r1.stats.corrected_count) == 1
    assert np.array_equal(np.asarray(r1.x), np.asarray(res.x))
