"""Unstructured/expander SpMV: the Benes permutation-route kernel tier.

The one matrix family where the round-4 framework lost to the
reference was unstructured graphs (power-law / expanders — no banded
structure under ANY ordering, /root/reference/CSR/CPUContext.cpp:115-133
handles them at cache speed): the flat exec layout pays XLA's
serialized 1-D gather (~19.7 ns/element measured) for x and a
serialized scatter for the row reduce.  This module replaces BOTH with
TPU-native data movement (VERDICT r4 item 1):

  1. entries sorted by SOURCE column at build — the x gather becomes a
     monotone absolute-row window scan (broadcast + select bodies, the
     wideband-scan primitive, ~0.014 ns/elem);
  2. products route from col-sorted order to a row-grouped slot grid
     with ONE static Benes exchange network (utils.benes): 2*log2(M)-1
     shared-distance stages, each two lane/sublane rolls + selects —
     nothing like the 0.69 ns/elem arbitrary-table shuffle the Clos
     pipeline (utils.permroute) would pay;
  3. the row reduce becomes DENSE: each output row owns a power-aligned
     run of slots in one lane, summed with a (groups, slots, 128)
     reshape-sum — no segment scatter;
  4. a second, R-sized Benes unpermutes the per-virtual-row sums from
     class order back to exec row order (split hub rows recombine with
     a tiny static scatter-add outside the kernel).

Everything VMEM-resident, one pallas_call per product.  Detection
signals stay the jnp hoisted checksum/parity folds (the flat layout's
word planes are loop-invariant; XLA hoists the folds out of the CG
while_loop), so every ABFT mode rides the same kernel.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..ecc import ECC_COL_MASK, codec
from ..utils.benes import benes_route, benes_stages, pack_ctrl

__all__ = ["wants_unstructured", "unstructured_plan", "derive_unstr",
           "make_unstructured_spmv"]

_MAX_M = 1 << 20          # Validated envelope cap.  VMEM would allow
#                           ~2^22 (vals + packed index + product
#                           scratch + 2 control planes ~= 85 MB), but
#                           the remote Mosaic compile helper crashes
#                           (HTTP 500) on the ~85-stage program at
#                           RRs >= 16384 and its compile time grows
#                           superlinearly past RRs = 8192 — M = 2^20
#                           (RRs = 8192) is the largest size that
#                           compiles reliably; beyond it the flat XLA
#                           path carries capability.  Revisit if the
#                           compiler toolchain improves.
_S_CAP = 512              # max slots per virtual row (hub rows split)
_ALLOWED = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128,
            192, 256, 384, 512)
_CB = 16                  # source chunk rows for the gather scan

_PLAN_CACHE: dict = {}


def _pow2_at_least(v: int) -> int:
    return 1 << max(7, int(v - 1).bit_length())   # >= 128


def wants_unstructured(mat) -> bool:
    """Flat exec layouts without a dense-tail plan (plain unstructured
    matrices and band-split tails) within the resident envelope."""
    if os.environ.get("ABFT_NO_UNSTR"):
        return False
    if mat.exec_kind != "flat" or getattr(mat, "dense_plan", None) is not None:
        return False
    if mat.nnz < 1:
        return False
    # Necessary-condition gate only (padded slots >= nnz + one per
    # empty row): unstructured_plan computes the EXACT padded total
    # up front (cheap vectorized arithmetic, before any routing) and
    # returns None past _MAX_TOTAL_M — a 2x-nnz estimate here wrongly
    # refused low-degree matrices whose real padding is ~1.15x.
    return mat.nnz + mat.R <= _MAX_TOTAL_M


def attach_plan(mat):
    """Return ``mat`` with the Benes-route plan attached (a no-op when
    out of envelope) — the build-time chokepoint formats.protected and
    formats.split share, so candidate layouts that get DISCARDED never
    pay the routing computation."""
    if wants_unstructured(mat) and getattr(mat, "unstr_plan",
                                           None) is None:
        plan = unstructured_plan(mat)
        if plan is not None:
            from dataclasses import replace

            return replace(mat, unstr_plan=plan)
    return mat


def _gidx_clean(mat) -> np.ndarray:
    """Decoded exec-space source index per flat entry (clean planes)."""
    g = np.asarray(mat.ell[mat.layout.word_names[
        mat.layout.word_names.index("row" if mat.fmt == "coo" else "col")
    ]][: mat.nnz])
    if mat.mode in codec.ECC_MODES and mat.fmt != "coo":
        g = g & np.uint32(ECC_COL_MASK)
    g = np.clip(g.astype(np.int64), 0, mat.N - 1)
    if mat.perm is not None:
        from ..formats.reorder import inverse_permutation

        g = inverse_permutation(mat.perm).astype(np.int64)[g]
    return g


def _block_plan(grp, gidx, R, RX):
    """Statics for ONE row block: source order, scan windows, Benes
    controls, class-zone geometry.  ``grp`` is block-local (0-based),
    ``gidx`` global (x spans the full matrix); returns None past the
    validated single-kernel envelope (_MAX_M)."""
    nnz = len(grp)
    cs_order = np.argsort(gidx, kind="stable")

    # ---- virtual rows & slot classes --------------------------------
    deg = np.bincount(grp, minlength=R)
    full_k = deg // _S_CAP
    rem = deg - full_k * _S_CAP
    has_rem = (rem > 0) | (deg == 0)      # empty rows still get 1 slot
    vr_count = full_k + has_rem
    vr_start = np.concatenate([[0], np.cumsum(vr_count)])
    V_real = int(vr_start[-1])
    allowed = np.asarray(_ALLOWED)
    # slots per virtual row: _S_CAP for full ones, next allowed >= rem
    # (>= 1) for the remainder row.
    vr_real = np.repeat(np.arange(R), vr_count)
    vr_slots = np.full(V_real, _S_CAP, np.int64)
    rem_pos = vr_start[1:] - 1              # last vr of each row
    rem_rows = np.flatnonzero(has_rem)
    need = np.maximum(rem[rem_rows], 1)
    vr_slots[rem_pos[rem_rows]] = allowed[
        np.searchsorted(allowed, need)]

    # Class order: stable sort by slot count; per class pad the virtual
    # count to a multiple of 128 (dummy virtual rows).
    order = np.argsort(vr_slots, kind="stable")
    s_sorted = vr_slots[order]
    classes = []                       # (slots, first, count, padded)
    i = 0
    while i < V_real:
        j = int(np.searchsorted(s_sorted, s_sorted[i], side="right"))
        classes.append((int(s_sorted[i]), i, j - i,
                        -(-(j - i) // 128) * 128))
        i = j
    # Class-order index of each real virtual row, with per-class pads.
    class_off = np.concatenate(
        [[0], np.cumsum([c[3] for c in classes])])
    vr_class_idx = np.empty(V_real, np.int64)
    pos_sorted = np.empty(V_real, np.int64)
    for c, (s, first, cnt, _pad) in enumerate(classes):
        pos_sorted[first:first + cnt] = class_off[c] + np.arange(cnt)
    vr_class_idx[order] = pos_sorted
    V = int(class_off[-1])
    # Zone geometry: class c occupies (padded/128)*slots grid rows.
    zrows = np.asarray([(c[3] // 128) * c[0] for c in classes])
    zbase = np.concatenate([[0], np.cumsum(zrows)])
    grid_rows = int(zbase[-1])

    # ---- entry destinations -----------------------------------------
    row_start = np.concatenate([[0], np.cumsum(deg)])
    e_rank = np.arange(nnz) - row_start[grp]
    e_vr = vr_start[grp] + e_rank // _S_CAP
    e_slot = e_rank % _S_CAP
    cls_of_vr = np.empty(V_real, np.int64)
    slots_of_cls = np.empty(len(classes), np.int64)
    for c, (s, first, cnt, _pad) in enumerate(classes):
        cls_of_vr[order[first:first + cnt]] = c
        slots_of_cls[c] = s
    e_cls = cls_of_vr[e_vr]
    jc = vr_class_idx[e_vr] - class_off[e_cls]   # index within class
    e_grid_row = (zbase[e_cls] + (jc // 128) * slots_of_cls[e_cls]
                  + e_slot)
    e_dst = e_grid_row * 128 + (jc % 128)

    # ---- Benes 1: col-sorted products -> slot grid ------------------
    M = _pow2_at_least(grid_rows * 128)
    if M > _MAX_M:
        return None
    dst = np.empty(M, np.int64)
    dst[:nnz] = e_dst[cs_order]
    used = np.zeros(M, bool)
    used[e_dst] = True
    dst[nnz:] = np.flatnonzero(~used)
    ctrl1 = pack_ctrl(benes_route(dst))

    # ---- scan windows (clean structure; static) ---------------------
    RRs = M // 128
    # Adaptive chunk: the scan unrolls one body per (chunk, x-row in
    # window) pair, so big grids cap the CHUNK COUNT (~256) rather
    # than the chunk size — at M=2^22 a fixed cb=16 meant ~2000
    # unrolled bodies and minutes of Mosaic compile.  All sizes are
    # powers of two, so cb always divides RRs.
    cb = min(max(_CB, RRs // 256), 128, RRs)
    hiw_cs = gidx[cs_order] >> 7
    nch = RRs // cb
    windows = []
    per_chunk = cb * 128
    for c in range(nch):
        a, b = c * per_chunk, min((c + 1) * per_chunk, nnz)
        if a >= nnz:
            windows.append((0, -1))
        else:
            windows.append((int(hiw_cs[a]), int(hiw_cs[b - 1])))

    # ---- Benes 2: class-order virtual sums -> exec rows -------------
    primary = np.zeros(V_real, bool)
    primary[vr_start[:-1][vr_count > 0]] = True
    extras = np.flatnonzero(~primary)            # split-row partials
    V2 = _pow2_at_least(max(V, R + len(extras)))
    if V2 > _MAX_M:
        return None
    dst2 = np.empty(V2, np.int64)
    used2 = np.zeros(V2, bool)
    pv = vr_class_idx[primary]
    dst2[pv] = vr_real[primary]
    used2[vr_real[primary]] = True
    dst2[vr_class_idx[extras]] = R + np.arange(len(extras))
    used2[R + np.arange(len(extras))] = True
    rest = np.ones(V2, bool)
    rest[vr_class_idx] = False
    dst2[np.flatnonzero(rest)] = np.flatnonzero(~used2)
    ctrl2 = pack_ctrl(benes_route(dst2))

    return dict(
        M=M, RRs=RRs, cb=cb, windows=tuple(windows),
        R=R, RX=RX, nnz=nnz,
        cs_order=cs_order.astype(np.int64),
        ctrl1=ctrl1, ctrl2=ctrl2,
        stages1=tuple(benes_stages(M)), stages2=tuple(benes_stages(V2)),
        V=V, V2=V2, RV=V // 128, RV2=V2 // 128,
        classes=tuple((int(c[0]), int(zbase[i]), int(c[3] // 128))
                      for i, c in enumerate(classes)),
        # (slots, zone base grid row, groups of 128 virtual rows)
        wv_off=tuple(int(class_off[i] // 128) for i in range(len(classes))),
        extras_rows=tuple(int(r) for r in vr_real[extras]),
    )


# Per-block target: the proven single-kernel size (compile ~30-40 s,
# cached across runs).  Blocks cut at 128-row boundaries; a single
# 128-row group of very dense rows may push one block up to _MAX_M.
_BLOCK_TARGET = 1 << 19
_MAX_TOTAL_M = 1 << 23     # across blocks (~16 kernels at the target)


def unstructured_plan(mat):
    """Build-time statics (numpy): contiguous 128-aligned ROW BLOCKS,
    each with its own _block_plan (source order, windows, Benes
    controls, class zones).  One kernel per block; w is the
    concatenation of block outputs — flat entries are row-sorted, so
    blocks are contiguous entry ranges and need no scatter.  Blocking
    carries the tier past the single-kernel compile envelope
    (M = 2^20) to _MAX_TOTAL_M padded slots.

    The plan attached at BUILD time (ProtectedMatrix.unstr_plan — clean
    planes, carried through with_planes) always wins: a plan recomputed
    from fault-exposed planes would bake the corruption into the
    routing.  The content-cached computation below serves fresh builds
    and direct test construction."""
    pre = getattr(mat, "unstr_plan", None)
    if pre is not None:
        return pre
    nnz, R = mat.nnz, mat.R
    grp = np.asarray(mat.ell["__flat_group__"][:nnz]).astype(np.int64)
    gidx = _gidx_clean(mat)
    key = (mat.fmt, nnz, R, mat.N,
           hash(grp.tobytes()), hash(gidx.tobytes()))
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit

    # Virtual-row slot sizes per row (mirrors _block_plan's slot
    # assignment), then greedy 128-row-aligned cuts at the block
    # target — using the EXACT padded size, including the per-class
    # round-to-128 virtual-row padding (which can reach
    # 127 * sum(_ALLOWED) ~ 227k slots per block and blew a
    # row-cost-only estimate past the compile envelope).
    deg = np.bincount(grp, minlength=R)
    allowed = np.asarray(_ALLOWED)
    nA = len(allowed)
    remn = deg - (deg // _S_CAP) * _S_CAP
    has_rem = (remn > 0) | (deg == 0)
    # Per 128-row group: how many full-_S_CAP virtual rows, and how
    # many remainder virtual rows of each allowed size.
    full_k = (deg // _S_CAP).reshape(-1, 128).sum(axis=1)
    rem_cls = np.where(has_rem,
                       np.searchsorted(allowed, np.maximum(remn, 1)),
                       nA)             # nA = "no remainder vr"
    ngrp = R // 128
    grp_cls = np.zeros((ngrp, nA), np.int64)
    gidx128 = np.repeat(np.arange(ngrp), 128)
    sel = rem_cls < nA
    np.add.at(grp_cls, (gidx128[sel], rem_cls[sel]), 1)
    grp_cls[:, nA - 1] += full_k       # _S_CAP == allowed[-1]

    def padded(cnts):
        return int((-(-cnts // 128) * 128 * allowed).sum())

    if padded(grp_cls.sum(axis=0)) > _MAX_TOTAL_M:
        return None
    cuts = [0]
    acc = np.zeros(nA, np.int64)
    for g in range(ngrp):
        if acc.any() and padded(acc + grp_cls[g]) > _BLOCK_TARGET:
            cuts.append(g * 128)
            acc[:] = 0
        acc += grp_cls[g]
    cuts.append(R)

    row_start = np.concatenate([[0], np.cumsum(deg)])
    blocks = []
    spans = []
    for r0, r1 in zip(cuts[:-1], cuts[1:]):
        e0, e1 = int(row_start[r0]), int(row_start[r1])
        bp = _block_plan(grp[e0:e1] - r0, gidx[e0:e1], r1 - r0,
                         R // 128)
        if bp is None:
            return None
        blocks.append(bp)
        spans.append((int(r0), int(r1), e0, e1))

    plan = dict(
        blocks=tuple(blocks), spans=tuple(spans),
        R=R, RX=R // 128, nnz=nnz,
        M=sum(b["M"] for b in blocks),
        V2=sum(b["V2"] for b in blocks),
    )
    _PLAN_CACHE[key] = plan
    return plan


def derive_unstr(mat, plan, words, values):
    """Device arrays for the kernel, re-derived from the (possibly
    scrubbed) word planes so a repair heals the fast path — the same
    contract as MatrixDevice.values/dense_td.

    Returns one (vals_cs, idx, ctrl1, ctrl2) tuple PER ROW BLOCK: the
    value plane and the PACKED gather index (x row * 128 + lane; -1
    for pad slots — the kernel unpacks with a shift/mask in-register,
    saving a whole resident plane) in the block's col-sorted grid
    order, plus its packed Benes controls (structure; pass-through on
    scrub)."""
    gw = mat.layout.word_names.index(
        "row" if mat.fmt == "coo" else "col")
    g = words[gw][: mat.nnz]
    if mat.mode in codec.ECC_MODES and mat.fmt != "coo":
        g = g & np.uint32(ECC_COL_MASK)
    g = jnp.clip(g.astype(jnp.int32), 0, mat.N - 1)
    if mat.perm is not None:
        from ..formats.reorder import inverse_permutation

        g = jnp.asarray(
            inverse_permutation(mat.perm).astype(np.int32))[g]
    out = []
    for bp, (_r0, _r1, e0, e1) in zip(plan["blocks"], plan["spans"]):
        M, nnz = bp["M"], bp["nnz"]
        cs = jnp.asarray(bp["cs_order"], jnp.int32)
        pad = M - nnz
        vals_cs = jnp.pad(values[e0:e1][cs], (0, pad))
        idx = jnp.pad(g[e0:e1][cs], (0, pad), constant_values=-1)
        shp = (bp["RRs"], 128)
        out.append((vals_cs.reshape(shp), idx.reshape(shp),
                    jnp.asarray(bp["ctrl1"].reshape(-1, 128)),
                    jnp.asarray(bp["ctrl2"].reshape(-1, 128))))
    return tuple(out)


def _benes_body(v, ctrl_ref, stages, RR):
    """Apply the exchange stages to the resident (RR, 128) grid.
    ctrl_ref: (nplanes*RR, 128) uint32, bit s of plane s//32."""
    from jax.experimental.pallas import tpu as pltpu

    li = jax.lax.broadcasted_iota(jnp.int32, (RR, 128), 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (RR, 128), 0)
    for s, d in enumerate(stages):
        if d < 128:
            p = jnp.where((li & d) != 0,
                          pltpu.roll(v, d, 1),
                          pltpu.roll(v, 128 - d, 1))
        else:
            rd = d // 128
            p = jnp.where((ri & rd) != 0,
                          pltpu.roll(v, rd, 0),
                          pltpu.roll(v, RR - rd, 0))
        c = ctrl_ref[(s // 32) * RR:(s // 32 + 1) * RR, :]
        cb = (c >> np.uint32(s % 32)) & np.uint32(1)
        v = jnp.where(cb != 0, p, v)
    return v


def _make_kernel(bp, interpret):
    """One pallas_call per ROW BLOCK: scan-gather + product, Benes
    route, class reductions, Benes unpermute.  Output: (RV2, 128)
    routed sums whose first block-row positions are the block's w rows
    in exec order (split-row extras follow)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RRs, cb, M = bp["RRs"], bp["cb"], bp["M"]
    RX, RV, RV2 = bp["RX"], bp["RV"], bp["RV2"]
    nch = RRs // cb
    windows = bp["windows"]
    stages1, stages2 = bp["stages1"], bp["stages2"]
    plan = bp    # the class/wv_off loops below read the block plan

    def kernel(vals_ref, idx_ref, c1_ref, c2_ref, x_ref,
               o_ref, prod_ref, wv_ref):
        # ---- 1. monotone scan-gather + product ----------------------
        for c in range(nch):
            h0, h1 = windows[c]
            sl = slice(c * cb, (c + 1) * cb)
            if h1 < h0:
                prod_ref[sl, :] = jnp.zeros((cb, 128), jnp.float32)
                continue
            idx = idx_ref[sl, :]
            lo = idx & 127        # pad slots: idx = -1 -> hiw = -1,
            hiw = idx >> 7        # never matches a window body
            gx = jnp.zeros((cb, 128), jnp.float32)
            for h in range(h0, h1 + 1):
                tbl = jnp.broadcast_to(x_ref[h:h + 1, :], (cb, 128))
                cand = jnp.take_along_axis(tbl, lo, axis=1)
                gx = jnp.where(hiw == h, cand, gx)
            prod_ref[sl, :] = gx * vals_ref[sl, :]
        # ---- 2. route products to the slot grid ---------------------
        v = _benes_body(prod_ref[...], c1_ref, stages1, RRs)
        # ---- 3. dense per-class reductions --------------------------
        for (s, zb, groups), wo in zip(plan["classes"], plan["wv_off"]):
            zone = v[zb:zb + groups * s, :]
            wv_ref[wo:wo + groups, :] = (
                zone.reshape(groups, s, 128).sum(axis=1)
                if s > 1 else zone)
        if RV2 > RV:
            wv_ref[RV:, :] = jnp.zeros((RV2 - RV, 128), jnp.float32)
        # ---- 4. unpermute to exec row order -------------------------
        o_ref[...] = _benes_body(wv_ref[...], c2_ref, stages2, RV2)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RV2, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((RRs, 128), jnp.float32),
                        pltpu.VMEM((RV2, 128), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def make_unstructured_spmv(mat, dtype, mode, interpret=False,
                           detect=True):
    """SpmvImpl for a flat unstructured matrix on the Benes route, or
    None outside the envelope.  ``detect=False`` builds the
    detection-free product pair for the lazy schedule."""
    if jnp.dtype(dtype) != jnp.float32 or not wants_unstructured(mat):
        return None
    plan = unstructured_plan(mat)
    if plan is None:
        return None
    calls = [_make_kernel(bp, interpret) for bp in plan["blocks"]]
    RX = plan["RX"]
    spans = plan["spans"]

    def product(md, x):
        if md.unstr is None:
            raise ValueError(
                "MatrixDevice.unstr missing — build the device arrays "
                "with make_matrix_device after the unstructured plan")
        xg = x.astype(jnp.float32).reshape(RX, 128)
        parts = []
        fixups = []       # (exec rows, partials) for split hub rows
        for call, bp, arrs, (r0, r1, _e0, _e1) in zip(
                calls, plan["blocks"], md.unstr, spans):
            vals_cs, idx, c1, c2 = arrs
            out = call(vals_cs, idx, c1, c2, xg)
            parts.append(out[:(r1 - r0) // 128])
            ex = bp["extras_rows"]
            if ex:
                flat = out.reshape(-1)
                fixups.append((
                    jnp.asarray([r0 + r for r in ex], jnp.int32),
                    jax.lax.dynamic_slice(flat, (r1 - r0,),
                                          (len(ex),))))
        w = jnp.concatenate(parts).reshape(-1)
        for rows, vals in fixups:
            w = w.at[rows].add(vals)
        return w.astype(dtype)

    from .spmv import SpmvImpl, _cksum_mismatch, _parity_any

    if not detect:
        def fast_nd(md, x):
            return product(md, x), jnp.bool_(False)

        def fast_pw_nd(md, x):
            w = product(md, x)
            return w, jnp.bool_(False), jnp.sum(x * w)

        return SpmvImpl(full=None, fast=fast_nd, classify=None,
                        fast_pw=fast_pw_nd)

    # Detection signals: identical to the jnp flat fast path — XLA
    # hoists these loop-invariant folds out of the CG while_loop, so
    # they cost one pass per scrub epoch, not per iteration.
    if mode == "constraints":
        check_words = tuple(sorted({
            mat.layout.word_names.index(
                "row" if mat.fmt == "coo" else "col"),
            mat.layout.word_names.index("col")}))

        def trig(md):
            return _cksum_mismatch(md, 1, check_words)
    elif mode == "none":
        def trig(md):
            return jnp.bool_(False)
    elif mode == "sec7":
        def trig(md):
            return _cksum_mismatch(md, 1)
    elif mode in ("sed", "sec8"):
        def trig(md):
            return _parity_any(md.words)
    else:    # secded
        def trig(md):
            return _parity_any(md.words) | _cksum_mismatch(md, 1)

    def fast(md, x):
        return product(md, x), trig(md)

    def fast_pw(md, x):
        w = product(md, x)
        return w, trig(md), jnp.sum(x * w)

    from .spmv_pallas import _wrap_mode

    # The jnp classify re-derives md.unstr from the scrubbed planes
    # itself (ops.spmv classify), so the wrapped impl heals the kernel
    # arrays on repair with no extra plumbing here.
    return _wrap_mode(mat, dtype, mode, fast, fast_pw)
