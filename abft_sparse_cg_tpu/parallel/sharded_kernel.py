"""Mesh-sharded *kernel* tier: the per-iteration Pallas kernels under
``jax.shard_map`` with an explicit halo exchange.

The GSPMD path (``parallel.sharded``) runs the jnp program sharded —
correct on any layout, but ``--devices N`` used to drop the pallas
target to it wholesale because a Pallas custom call has no SPMD
partitioning rule: a sharded operand would be all-gathered instead of
running the kernel per shard.  Here the kernel IS the per-shard program:

  - every exec plane is row-sharded exactly as the GSPMD path lays it
    out (``_device_put_sharded``: rows on the lane axis, dim 1 of the
    1-D ``("shard",)`` mesh), so upload/solve/classify interop needs no
    re-sharding;
  - a banded SpMV's only off-shard reads are the ±band rows of p around
    each shard boundary, so the exchange is two ``lax.ppermute`` edge
    copies (zero-filled at the global boundary — identical semantics to
    the single-device kernels' zero padding), riding ICI, not an
    all-gather of p;
  - the per-shard kernel is the *same* code as the single-chip tier
    (``ops.spmv_pallas``) built at the local row count: DIA reads its
    shifted-x planes from the halo'd p (``halo=``), banded-ELL
    localizes its (global) gather indices by subtracting the shard's
    row offset via one SMEM scalar (``with_base=``; the wideband tier
    subtracts it in its XLA index prep instead);
  - detection signals stay shard-local (checksum blocks never straddle
    a shard: local rows are a multiple of 8) and fold with one psum of
    the trigger bit; the fused pw = dot(p, w) psums the same way.
    Classification/scrub (rare) stays the GSPMD jnp path on the very
    same sharded arrays.

The reference has no distributed story at all (strictly single-node,
SURVEY §2) — this is the TPU scaling axis BASELINE.md's v5e-8 target
assumes, with the kernel tier's per-chip numbers intact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.spmv import MatrixDevice, SpmvImpl  # noqa: F401 (re-export)

__all__ = ["supports_shardmap", "make_shardmap_spmv"]


class _LocalView:
    """Static per-shard view of a ProtectedMatrix: same layout metadata,
    local row count.  Only the attributes the kernel factories read."""

    def __init__(self, mat, R_loc):
        self.fmt = mat.fmt
        self.mode = mat.mode
        self.layout = mat.layout
        self.exec_kind = mat.exec_kind
        self.dia_offsets = mat.dia_offsets
        self.R = R_loc
        self.K = mat.K
        self.band = mat.band
        self.perm = mat.perm
        self.ell_gather_word = getattr(mat, "ell_gather_word", None)


def _halo(mat):
    # Both kernels take their 128-rounded x window as the halo (the
    # DIA stencil reads shifted rows out of the same tiled window the
    # ELL gather uses).
    if mat.exec_kind == "dia":
        from ..ops.spmv_pallas import _dia_side

        return _dia_side(mat)
    from ..ops.spmv_pallas import _ell_window

    side, _ = _ell_window(mat)
    return side


def supports_shardmap(mat, dtype, ndev: int) -> bool:
    """Envelope: banded layout, f32, shards sublane/lane-aligned at the
    kernels' chunk granularity (local rows a multiple of 1024), and the
    window/offsets within one neighbor's rows (a two-edge exchange).
    Bordered/band-split composites qualify through their banded main
    part (the flat tail rides the entry-sharded GSPMD program)."""
    from ..ops.spmv_pallas import _ellb_ok

    if ndev < 2 or jnp.dtype(dtype) != jnp.float32:
        return False
    if mat.exec_kind == "split":
        return (getattr(mat.tail, "exec_kind", None) == "flat"
                and supports_shardmap(mat.main, dtype, ndev))
    if mat.exec_kind not in ("dia", "ell"):
        return False
    if mat.R % (1024 * ndev):
        return False
    R_loc = mat.R // ndev
    if mat.exec_kind == "ell" and not _ellb_ok(_LocalView(mat, R_loc)):
        return False
    return _halo(mat) <= R_loc


def make_shardmap_spmv(mat, mesh, dtype=jnp.float32, mode: str = None,
                       interpret: bool = None,
                       detect: bool = True) -> SpmvImpl:
    """Same contract as ``make_pallas_spmv``, for row-sharded operands
    laid out by ``parallel.sharded._device_put_sharded`` on ``mesh``.

    ``interpret``: None = auto (compiled on TPU, interpreter elsewhere —
    the virtual-device CPU mesh the tests and the multichip dryrun use).
    ``detect=False``: the per-shard kernels skip every detection signal
    (no word-plane streaming) while keeping the product arithmetic —
    the lazy --check-interval schedule's unchecked-iteration impl
    (solver.cg.make_lazy_ci_continue); split tails keep their checked
    jnp impl either way.
    """
    from jax import lax

    from ..ops.spmv_pallas import (
        _make_dia_fast,
        _make_ellb_fast,
        _wrap_mode,
    )

    mode = mat.mode if mode is None else mode
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]
    if not supports_shardmap(mat, dtype, ndev):
        raise ValueError("matrix outside the shard_map kernel envelope")
    if mat.exec_kind == "split":
        # Composite: the banded main part runs the per-shard kernels;
        # the flat tail keeps the entry-sharded GSPMD jnp program (XLA
        # inserts its scatter-add reduce) — the same pairing
        # make_pallas_spmv uses single-device, on the sharded operands
        # parallel.sharded._device_put_sharded lays out.
        from ..ops.spmv import combine_impls, make_spmv

        return combine_impls(
            make_shardmap_spmv(mat.main, mesh, dtype, mode, interpret,
                               detect),
            make_spmv(mat.tail, dtype, mode),
            mat.main.exec_size,
        )
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    R_loc = mat.R // ndev
    H = _halo(mat)
    local = _LocalView(mat, R_loc)
    is_dia = mat.exec_kind == "dia"
    if is_dia:
        fast_loc, fast_pw_loc = _make_dia_fast(local, mode, interpret,
                                               halo=H, detect=detect)
    else:
        fast_loc, fast_pw_loc = _make_ellb_fast(local, mode, interpret,
                                                halo=True, with_base=True,
                                                detect=detect)
    has_gidx = mat.perm is not None and not is_dia

    fwd = [(i, i + 1) for i in range(ndev - 1)]
    bwd = [(i + 1, i) for i in range(ndev - 1)]

    # Fold-plane live detection (ops.spmv_pallas.use_fold): the inner
    # kernels stream md.fold instead of the word planes; both the fold
    # and its checksum baseline shard row-wise exactly like the planes
    # they derive from (8-row checksum blocks never straddle a shard).
    from ..ops.spmv_pallas import _mode_signals, use_fold

    up, uc, _sw = _mode_signals(mode, mat, detect)
    has_fold = use_fold(mode, detect) and (up or uc)

    def body(words, values, cksum, fold, fold_ck, gidx, x):
        # Two-edge halo exchange: each shard sends its boundary rows to
        # its neighbors; un-sourced edges (the global ends) arrive zero
        # — the same semantics as the single-device kernels' zero pads.
        lo = lax.ppermute(x[R_loc - H:], axis, fwd)  # left nbr's tail
        hi = lax.ppermute(x[:H], axis, bwd)          # right nbr's head
        x_ext = jnp.concatenate([lo, x, hi])
        md_loc = MatrixDevice(words=words, ell_len=None, cksum=cksum,
                              values=values, gidx=gidx,
                              fold=fold if has_fold else None,
                              fold_ck=fold_ck if has_fold else None)
        if not is_dia:
            base = lax.axis_index(axis) * R_loc
            w, trig, pw = fast_pw_loc(md_loc, x_ext, base)
        elif fast_pw_loc is not None:
            w, trig, pw = fast_pw_loc(md_loc, x_ext)
        else:
            # No main diagonal to fuse the dot against (d0 is None):
            # partial dot per shard, psum'd with the rest below.
            w, trig = fast_loc(md_loc, x_ext)
            pw = jnp.sum(x * w)
        trig = lax.psum(trig.astype(jnp.int32), axis) > 0
        pw = lax.psum(pw, axis)
        return w, trig, pw

    from jax.sharding import PartitionSpec as P

    row2d = P(None, axis)
    in_specs = (tuple(row2d for _ in mat.layout.word_names), row2d,
                row2d, row2d if has_fold else P(),
                row2d if has_fold else P(),
                row2d if has_gidx else P(), P(axis))
    sm = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(axis), P(), P()), check_vma=False)

    def sm_fast_pw(md, x):
        gidx = md.gidx if has_gidx else jnp.zeros((), jnp.int32)
        fold = md.fold if has_fold else jnp.zeros((), jnp.uint32)
        fold_ck = md.fold_ck if has_fold else jnp.zeros((), jnp.uint32)
        return sm(md.words, md.values, md.cksum, fold, fold_ck, gidx, x)

    def sm_fast(md, x):
        w, trig, _ = sm_fast_pw(md, x)
        return w, trig

    return _wrap_mode(mat, dtype, mode, sm_fast, sm_fast_pw)
