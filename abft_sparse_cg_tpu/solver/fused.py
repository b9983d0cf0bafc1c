"""Whole-solve fused CG megakernel: the entire fast loop in ONE kernel.

The per-iteration tiers dispatch one program per SpMV and carry the CG
vectors through HBM between kernels (Pallas custom-call operands force
them there even when XLA would keep loop state in VMEM — BENCH_NOTES.md
finding 1).  This kernel runs the *whole* detect-fast loop inside a
single ``pallas_call``:

  - x, r, p, w stay resident in VMEM scratch for the entire solve —
    zero HBM traffic for the CG vectors;
  - the protected planes stream HBM -> VMEM through a double-buffered
    async-copy pipeline, once per iteration (the irreducible traffic);
  - the ABFT detection signals (per-element overall parity, OR-
    accumulated at full granularity, and the whole-plane XOR-checksum
    comparison — see PARITY.md for the granularity scope) are fused
    into the same streamed read — *live* detection every iteration,
    like the reference's per-element checks (CSR/CPUContext.cpp:
    353-406), at less than the check-on-entry jnp tier's
    per-iteration cost.  All per-chunk signals accumulate as lane
    vectors and reduce to scalars once per iteration;
  - convergence / trigger / breakdown end a ``lax.while_loop`` inside
    the kernel; the rare classify/repair stays in the jnp slow path of
    the surrounding solver loop (solver.cg semantics, unchanged).

TPU shape rules the kernel is built around (memory/tpu-env-quirks):
vectors live as (rows, 128) 2-D tiles because 1-D dynamic slices must
be 1024-aligned; the DIA stencil's +-off shifted reads are composed
from an 8-row-aligned extended block via ``pltpu.roll`` lane rotations
plus a boundary-row select (no gather, no unaligned access).

Both execution layouts ride the same kernel skeleton: **DIA** computes
w with the stencil rotations above; **banded ELL** (general matrices,
banded after RCM) uses the windowed lane-shuffle gather of
ops.spmv_pallas, with the x windows read directly from the
VMEM-resident p (static halo slices — the per-iteration kernel's
shifted-block-input machinery becomes unnecessary) and the gather
indices pre-localized/pre-clamped once per solve in XLA.

Envelope (``supports_fused``): DIA or banded-ELL layout (K <= 64;
band <= 1920 unrolled, <= 16256 via the absolute-row window scan —
one static pass over the chunk's extended p rows, selecting each row
into the groups whose windows contain it (_absolute_window_scan)),
float32, R % 1024 == 0, every mode incl. the constraints lazy
schedule (index-word checksum scan in-kernel), standard CG —
unpreconditioned or Jacobi (``precond=True`` keeps M^-1 as a fifth
resident vector and runs the PCG recurrences in-kernel) — and the
resident vectors + stream buffers within the VMEM budget (~3.8M rows
against the v5e's 128 MiB VMEM) — the bench headline configurations
sit inside it.  Past that, DIA/ELL matrices ride the STREAMING tier
(_make_streaming_kernel): only p + r stay resident while x and w move
through HBM chunk-wise, stretching the envelope to ~11M rows with live
detection still fused into the plane streams.  Everything else falls
back to the per-iteration kernels.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spmv import ERR_BREAKDOWN, SpmvStats
from .cg import (CGResult, CGState, init_state, _MAX_TRACE,
                 _baseline_changed, _lazy_exit_resolve, _phantom_guard)

__all__ = ["supports_fused", "make_fused_continue", "make_fused_solver"]

# The v5e core has 128 MiB of VMEM; Mosaic's default scoped limit is
# 16 MiB, so the kernel raises it (vmem_limit_bytes below).  The plan
# keeps a margin for compiler temporaries: the update phase's
# full-vector expressions (r1, the rr1 reduction tree) measure ~2.3 MiB
# of stack at RR=6400, so _plan charges two extra full vectors.
_VMEM_LIMIT = 110 * 2 ** 20   # scoped limit requested from Mosaic
_VMEM_BUDGET = 88 * 2 ** 20   # bytes of VMEM the plan may allocate
_MAX_TRACE_SMEM = 4096        # rr trace lives in SMEM; cap its length

# The big-offset DIA mode (shifted_big: 8-aligned dynamic slices of the
# resident p) uses a Mosaic pattern not exercised by the other kernels;
# it was hardware-validated 2026-08-19 (scripts/tpu_smoke.py bigoffset:
# clean + corrected + detected, f32 trajectory within 4.7e-07 of the
# f64 oracle) and is ON by default at that version.  If the slice
# pattern changes, bump _BIGOFF_VERSION past _BIGOFF_VALIDATED to gate
# it again behind the smoke's version-keyed marker (a re-validation
# re-enables it machine-locally; bump _BIGOFF_VALIDATED once confirmed).
# ABFT_FUSED_BIG_OFFSET=1 forces it on regardless; =0 forces it off.
_BIGOFF_VERSION = "1"
_BIGOFF_VALIDATED = "1"       # highest hardware-validated version


def _bigoffset_marker_path():
    cache = os.environ.get(
        "ABFT_CG_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "abft_cg_jax"),
    )
    return os.path.join(cache, "bigoffset_validated")


def bigoffset_validated() -> bool:
    if _BIGOFF_VERSION == _BIGOFF_VALIDATED:
        return True
    try:
        with open(_bigoffset_marker_path()) as f:
            return f.read().strip() == _BIGOFF_VERSION
    except OSError:
        return False


def mark_bigoffset_validated():
    """Record a successful on-hardware big-offset validation (called by
    scripts/tpu_smoke.py after the bigoffset config passes)."""
    path = _bigoffset_marker_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(_BIGOFF_VERSION)
_FUSED_MAX_WROWS = 255        # rolled window scan cap (band <= 16256,
#                               aligned with the RCM adoption bound
#                               formats.protected._BAND_KERNEL_MAX)


def _plan(mat, mode, precond=False, force_streaming=False,
          check_interval=1):
    """Static kernel plan: chunking, halos, buffer sizes; None if the
    matrix falls outside the envelope.

    ``check_interval`` > 1 selects the LAZY detection schedule: the
    protected word planes stream (and the signals arm) only every
    CI-th iteration, with an in-kernel snapshot of the last verified
    state to roll back to on a trigger — ABFT traffic drops ~CI-fold
    while end-to-end guarantees hold (faults are persistent plane
    corruptions; the solver re-executes from verified state, and the
    outer loop closes the unverified tail with one jnp detection pass
    per clean exit).  The resident tier snapshots in VMEM (3 extra
    resident vectors); the streaming tier snapshots to HBM with
    whole-vector DMAs on checked iterations.  Needs detection signals
    (NW > 0) to mean anything.

    Two layouts, one kernel skeleton: ``kind='dia'`` computes w with
    stencil lane-rotations; ``kind='ell'`` with the banded windowed
    shuffle-gather (ops.spmv_pallas design), reading its x windows from
    the VMEM-resident p instead of shifted block inputs.  ``D`` is the
    per-plane row count streamed each chunk (diagonals resp. ELL slots).

    When the four resident vectors exceed the VMEM budget the plan
    falls back to the STREAMING tier (``streaming=True``): only p
    (haloed — the SpMV reads it everywhere) and r stay resident; x and
    w live in HBM and move chunk-wise through double-buffered DMAs
    (_make_streaming_kernel).  That stretches the megakernel envelope
    from ~3.8M to ~11M rows at the cost of ~1.6 vector streams per
    iteration — still far below the per-iteration tier's full BLAS-1
    HBM traffic.  ``force_streaming`` pins the tier for tests.
    """
    if mat.exec_kind == "split":
        return _plan_split(mat, mode, precond, check_interval)
    R = mat.R
    if R % 1024:
        return None
    from ..ops.spmv_pallas import stream_words, use_fold

    SW = stream_words(mode, mat.layout, mat.fmt)
    folded = use_fold(mode) and len(SW) > 0
    if folded:
        SW = (0,)  # ONE detection stream: the rotated fold plane
    NW = len(SW)
    W = NW  # streamed detection planes (the fold, or all words)
    RR = R // 128
    if mat.exec_kind == "dia":
        offsets = mat.dia_offsets
        if not offsets:
            return None
        # Halo rows: lane/row decomposition of each offset reads base
        # row q = off // 128 and (when off % 128 != 0) row q + 1.
        qlo = min(off // 128 for off in offsets)
        qhi = max(off // 128 + (1 if off % 128 else 0) for off in offsets)
        Hlo = -(-max(0, -qlo) // 8) * 8
        Hhi = -(-max(0, qhi) // 8) * 8
        D = len(offsets)
        S0 = WROWS = 0
        PACK = 1
        rolled = False
        nstreams = 1 + NW  # vals + the streamed word planes
    elif mat.exec_kind == "ell":
        from ..ops.spmv_pallas import _ELL_MAX_K, _ELL_MAX_WROWS, _ell_window

        if mat.K > _ELL_MAX_K:
            return None
        side, WROWS = _ell_window(mat)
        # Windows past the unrolled cap switch to the absolute-row
        # static window scan (_absolute_window_scan) — the wide-band
        # tier, up to _FUSED_MAX_WROWS (band <= 16256).  Unrolling
        # 100+ shuffle rounds per lane group would explode Mosaic
        # compile time.  ABFT_FUSED_ABS_SCAN=1 forces the scan for
        # narrow bands too (A/B benching vs the unrolled shuffle).
        rolled = (WROWS > _ELL_MAX_WROWS
                  or bool(os.environ.get("ABFT_FUSED_ABS_SCAN")))
        if WROWS > _FUSED_MAX_WROWS:
            return None
        if mat.K < 2:
            # The absolute scan's edge bodies (and a (1, 128)-table
            # shuffle in general) cannot lower in Mosaic (memory quirks
            # list); such a matrix (one entry per row) is degenerate —
            # jnp carries it.  Matches ops.spmv_pallas._ellb_ok.
            return None
        S0 = side // 128
        Hlo = Hhi = -(-S0 // 8) * 8
        D = mat.K
        offsets = None
        # vals + gather indices (always streamed) + streamed words.
        nstreams = 2 + NW
        # Sublane packing: a (K, 128) shuffle op uses K of the VPU's 8
        # sublanes; process PACK row groups per op so small-K matrices
        # fill them (tridiagonal K=3 -> (6, 128) ops).  The rolled
        # (absolute-scan) tier operates on whole-chunk (ROWS*D, 128)
        # tiles, so packing is moot there; it keeps PACK = 1.
        PACK = 1 if rolled else max(1, 8 // D)
    else:
        return None
    # Chunk candidates, largest-fitting first: every chunk body pays a
    # fixed ~0.25 us of DMA/loop overhead, so fewer/bigger chunks win.
    # The ELL kernel's row-group loop UNROLLS per chunk row (ROWS
    # shuffle bodies), so its chunk is capped at 8192 (64 groups) to
    # bound Mosaic code size / compile time; the DIA stencil computes
    # whole chunks in D vector ops, so its code size is C-independent.
    cands = ((65536, 32768, 16384, 8192, 4096, 2048, 1024)
             if mat.exec_kind == "dia" else (8192, 4096, 2048, 1024))
    C = None
    for c in cands:
        if R % c == 0:
            C = c
            break
    if C is None:
        return None
    ROWS = C // 128
    # DIA offsets reaching past one chunk of halo (periodic wrap,
    # n^2-stride 3-D stencils at scale) switch the stencil reads to
    # per-offset aligned dynamic slices of the resident p
    # (shifted_big) instead of the per-chunk extended block.  Enabled
    # once the on-hardware validation marker exists (or forced via
    # ABFT_FUSED_BIG_OFFSET); the per-iteration DIA kernel carries
    # such matrices meanwhile.
    bigoff_env = os.environ.get("ABFT_FUSED_BIG_OFFSET")
    big_ok = (mat.exec_kind == "dia"
              and bigoff_env != "0"
              and (bool(bigoff_env) or bigoffset_validated()))
    if max(Hlo, Hhi) > ROWS and not (rolled or big_ok):
        return None  # window/offsets reach beyond one chunk of halo
        # (the rolled scan and the big-offset mode read the resident p
        # directly, so their windows may exceed the chunk height)

    # 4 resident vectors + halo, plus 2 full-vector equivalents for the
    # update phase's compiler temporaries (_VMEM_LIMIT note); Jacobi
    # adds the resident M^-1 diagonal and the z = M^-1 r temporary; the
    # lazy schedule adds the 3-vector verified-state snapshot.
    use_parity = mode in ("sed", "sec8", "secded")
    use_cksum = mode in ("sec7", "secded", "constraints")
    ci = check_interval if (use_parity or use_cksum) else 1
    NV = (8 if precond else 6) + (3 if ci > 1 else 0)

    # The rolled absolute scan adds a gathered-x chunk accumulator in
    # scratch plus two chunk-sized hi/lo index values the compiler
    # spills to VMEM across the scan bodies — charge 3 extra chunk
    # planes in both tiers.

    def fits(C):
        vecs = (NV * RR + Hlo + Hhi) * 128 * 4
        bufs = 2 * nstreams * D * C * 4
        if rolled:
            bufs += 3 * D * C * 4
        return vecs + bufs <= _VMEM_BUDGET

    def fits_streaming(C):
        # p (haloed) + r resident; chunk buffers for the plane streams
        # plus the w-compute / w-read / x read-modify-write pipelines
        # (2 slots each) and the minv chunks of the Jacobi variant.
        vecs = (2 * RR + Hlo + Hhi) * 128 * 4
        bufs = 2 * (nstreams + 3 + (1 if precond else 0)) * max(D, 1) * C * 4
        if rolled:
            bufs += 3 * D * C * 4
        return vecs + bufs <= _VMEM_BUDGET

    streaming = bool(force_streaming)
    if not streaming:
        while C > 1024 and not fits(C):
            C //= 2
            ROWS = C // 128
        if not fits(C) or (max(Hlo, Hhi) > ROWS
                           and not (rolled or big_ok)):
            streaming = True
            C, ROWS = None, None
    if streaming:
        # Same largest-chunk-first rule (the overhead bite is worst
        # here: at C=8192 an 8.19M-row solve ran ~3000 chunk bodies per
        # iteration across the phases and the overhead exceeded the
        # stream time — 1069 us/iter for mode none vs a ~320 us traffic
        # bound).  fits_streaming() downsizes C for big-D (ELL)
        # matrices where the plane buffers would blow the VMEM budget;
        # the ELL code-size cap applies as above.
        for c in cands:
            if R % c == 0:
                C = c
                break
        if C is None:
            return None
        ROWS = C // 128
        while C > 1024 and not fits_streaming(C):
            C //= 2
            ROWS = C // 128
        if not fits_streaming(C) or (max(Hlo, Hhi) > ROWS
                                     and not (rolled or big_ok)):
            return None
    # (The streaming tier keeps its snapshots in HBM — whole-vector
    # DMAs on checked iterations — so ci needs no VMEM there.)
    big = mat.exec_kind == "dia" and max(Hlo, Hhi) > ROWS
    return dict(R=R, RR=RR, C=C, ROWS=ROWS, G=R // C, D=D, W=W, NW=NW,
                SW=SW, folded=folded, kind=mat.exec_kind, offsets=offsets,
                Hlo=Hlo, Hhi=Hhi, S0=S0, WROWS=WROWS, PACK=PACK,
                rolled=rolled, big=big, precond=precond,
                streaming=streaming, ci=ci,
                use_parity=use_parity, use_cksum=use_cksum)


def streamed_bytes_per_iter(mat, mode, check_interval=1):
    """HBM bytes the megakernel tiers stream per CG iteration — the
    numerator of the per-tier bandwidth/%SoL fields bench.py and
    scripts/tpu_bench.py emit (BASELINE's '>= 80% of HBM
    speed-of-light' target, tracked per kernel tier instead of
    anecdotally; VERDICT r4 item 7).

    Resident tier: only the plane streams touch HBM (vals + the
    gather-index plane on ELL + NW detection planes — ONE fold plane
    in ECC modes).  Streaming tier adds the x read-modify-write and
    the w write+read (~3 vector planes; p and r stay resident).
    Split composites add the tail's resident-free re-streams (the NTW
    detection planes).  Returns None outside the megakernel envelope
    (the per-iteration tiers share the plane-stream arithmetic but
    also re-read the BLAS-1 vectors; their figure would not be
    comparable)."""
    p = _plan(mat, mode, check_interval=check_interval)
    if p is None:
        return None
    nstreams = (1 if p["kind"] == "dia" else 2) + p["NW"]
    b = nstreams * p["D"] * p["R"] * 4
    if p["streaming"]:
        b += 3 * p["R"] * 4
    t = p.get("tail")
    if t:
        b += t["NTW"] * t["ER"] * 128 * 4
    return int(b)


def _absolute_window_scan(loc, xacc, ext, Hlo, S0, ROWS, WROWS, D):
    """Wide-band window gather as ONE static pass over the chunk's
    extended p rows (the rolled tier's gather).

    Indices arrive pre-localized to chunk-extended row coordinates
    (``hi`` == ext row, derive()), so every 128-lane row group's window
    scan collapses into EXT = ROWS + WROWS - 1 static bodies: body e
    broadcasts ext row e once and selects it into exactly the groups
    whose windows contain e — a static slice [g0*D, g1*D) of the
    (ROWS*D, 128) gather accumulator.  Total select work equals the
    unrolled tier's (each (group, window-row) pair touched once), with
    no fori rounds and no dynamic reads: the prior batched rolled scan
    paid ~8x its VPU work in loop issue + dynamic-slice overhead
    (6.5 ms/iter at band=2499 / N=819k vs ~0.5 ms of select work).
    """
    hi = loc >> 7                           # loc: (ROWS*D, 128) int32
    lo = loc & 127
    e0 = Hlo - S0
    xacc[...] = jnp.zeros((ROWS * D, 128), jnp.float32)
    for e in range(e0, e0 + ROWS + WROWS - 1):
        g0 = max(0, e - e0 - (WROWS - 1))
        g1 = min(ROWS, e - e0 + 1)
        sl = slice(g0 * D, g1 * D)
        tbl = jnp.broadcast_to(ext[e:e + 1, :], ((g1 - g0) * D, 128))
        cand = jnp.take_along_axis(tbl, lo[sl], axis=1)
        xacc[sl, :] = jnp.where(hi[sl] == e, cand, xacc[sl, :])
    return xacc[...]


def _plan_split(mat, mode, precond, check_interval=1):
    """Split (bordered) plan: the main part's plan + tail statics.

    The tail rides the span-window formulation (ops.spmv.dense_tail_plan
    — clean build-time structure): td/tb stay VMEM-resident for the
    whole solve, the tail's word planes re-stream each iteration for
    live detection, and the outlier updates are masked (1, 128) ops at
    host-static positions — no gather, no scatter, no dynamic scalars.
    """
    tp = getattr(mat.tail, "dense_plan", None)
    if tp is None or mat.tail.exec_kind != "flat":
        return None
    mp = _plan(mat.main, mode, precond, check_interval=check_interval)
    if mp is None or mp["kind"] == "split" or mp["streaming"]:
        # The tail's span windows update the resident w_ref directly;
        # a streamed w has no resident target, so bordered matrices
        # past the resident envelope ride the per-iteration kernels.
        return None
    rows, starts, S = tp
    if S % 128 or any(s % 128 for s in starts):
        return None
    from ..ops.spmv_pallas import stream_words, use_fold

    TSW = stream_words(mode, mat.tail.layout, mat.tail.fmt)
    tfolded = use_fold(mode) and len(TSW) > 0
    if tfolded:
        TSW = (0,)  # tail detection rides its fold plane too
    TW = NTW = len(TSW)
    E = int(mat.tail.ell[mat.tail.layout.word_names[0]].shape[0])
    EP = -(-E // 128) * 128
    T = len(rows)
    tail_bytes = 2 * T * S * 4 + NTW * EP * 4
    # Re-check VMEM with the tail residents + word buffer on top of the
    # main plan's allocation, shrinking the stream chunk if needed.
    NV = (8 if precond else 6) + (3 if mp.get("ci", 1) > 1 else 0)
    RR, Hlo, Hhi, D, NW = (mp[k] for k in ("RR", "Hlo", "Hhi", "D", "NW"))
    nstreams = (2 if mp["kind"] == "ell" else 1) + NW
    C = mp["C"]
    while True:
        vecs = (NV * RR + Hlo + Hhi) * 128 * 4
        bufs = 2 * nstreams * D * C * 4
        if mp.get("rolled"):
            bufs += 3 * D * C * 4   # xacc scratch + hi/lo spill
        if vecs + bufs + tail_bytes <= _VMEM_BUDGET:
            break
        if C <= 1024:
            return None
        C //= 2
    mp = dict(mp)
    mp.update(C=C, ROWS=C // 128, G=mp["R"] // C)
    if max(Hlo, Hhi) > mp["ROWS"] and not mp.get("rolled"):
        return None
    mp["tail"] = dict(rows=tuple(rows), starts=tuple(starts), S=S,
                      SR=S // 128, E=E, EP=EP, ER=EP // 128, T=T,
                      TW=TW, NTW=NTW, TSW=TSW, folded=tfolded)
    return mp


def supports_fused(mat, dtype, mode, max_itrs, trace_rr=True,
                   precond=False, check_interval=1) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if trace_rr and min(max_itrs, _MAX_TRACE) > _MAX_TRACE_SMEM:
        return False
    return _plan(mat, mode, precond,
                 check_interval=check_interval) is not None


def _xor_fold_rows(v, to=1):
    """XOR-fold a (rows, 128) uint32 value down to ``to`` rows (halving
    folds, so row s of the result accumulates rows congruent to s)."""
    L = v.shape[0]
    P = 1
    while P < L:
        P *= 2
    if P != L:
        v = jnp.concatenate(
            [v, jnp.zeros((P - L, 128), jnp.uint32)], axis=0)
        L = P
    while L > to:
        L //= 2
        v = v[:L] ^ v[L: 2 * L]
    return v


def _or_fold_rows(v, to=1):
    """OR-fold a (rows, 128) uint32 value down to ``to`` rows — the
    vectorized 'any nonzero element' reduction (halving folds like
    _xor_fold_rows; a jnp.any/jnp.sum over a big plane lowers to a
    serialized scalar reduce, the measured VPU stall the signal
    accumulators exist to avoid)."""
    L = v.shape[0]
    P = 1
    while P < L:
        P *= 2
    if P != L:
        v = jnp.concatenate(
            [v, jnp.zeros((P - L, 128), jnp.uint32)], axis=0)
        L = P
    while L > to:
        L //= 2
        v = v[:L] | v[L: 2 * L]
    return v


def _make_kernel(plan, mode, conv, trace_len, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, RR, C, ROWS, G = (plan[k] for k in ("R", "RR", "C", "ROWS", "G"))
    D, W, NW = plan["D"], plan["W"], plan["NW"]
    offsets, Hlo, Hhi = plan["offsets"], plan["Hlo"], plan["Hhi"]
    use_parity, use_cksum = plan["use_parity"], plan["use_cksum"]
    is_ell = plan["kind"] == "ell"
    S0, WROWS, PACK = plan["S0"], plan["WROWS"], plan["PACK"]
    rolled = plan.get("rolled", False)
    big = plan.get("big", False)
    precond = plan["precond"]
    tail = plan.get("tail")
    PR = Hlo + RR + Hhi   # haloed p rows
    conv = float(conv)
    CI = plan.get("ci", 1)
    lazy = CI > 1 and NW > 0   # lazy detection schedule (plan docstring)
    # Diagnostic tap (ABFT_FUSED_DEBUG_CKSUM=1): two extra outputs — the
    # raw per-class cksum accumulator and one chunk's streamed word
    # buffer — so a host diff against the canonical planes can localize
    # a false-trigger to the DMA vs the accumulation.  Debug-only; off
    # in production and incompatible with the lazy output unpacking.
    dbg = (bool(os.environ.get("ABFT_FUSED_DEBUG_CKSUM"))
           and NW > 0 and use_cksum and not lazy)
    DBG_CI = int(os.environ.get("ABFT_FUSED_DEBUG_CHUNK", G - 1))

    def shifted(ext, off):
        """(ROWS, 128) block holding element index +off relative to the
        chunk's rows, from the (Hlo + ROWS + Hhi, 128) extended block."""
        q, s = divmod(off, 128)
        base = ext[Hlo + q: Hlo + q + ROWS]
        if s == 0:
            return base
        nxt = ext[Hlo + q + 1: Hlo + q + 1 + ROWS]
        a = pltpu.roll(base, 128 - s, 1)
        b = pltpu.roll(nxt, 128 - s, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        return jnp.where(lane < 128 - s, a, b)

    def shifted_big(p_ref, row0, off):
        """``shifted`` for offsets past one chunk of halo (periodic
        wrap, huge stencil strides): an 8-sublane-aligned dynamic slice
        of the resident haloed p, statically sub-sliced like the
        extended block.  Exact (ROWS, 128) when the offset row is
        8-aligned with no lane shift; else an aligned (ROWS + 8, 128)
        block — in bounds because Hlo/Hhi are 8-rounded (q - qr + 8 =
        roundup(q, 8) <= Hhi for qr > 0, and the qr == 0 && s > 0 case
        needs q + 8 = roundup(q + 1, 8) <= Hhi)."""
        q, s = divmod(off, 128)
        q8, qr = divmod(q, 8)
        if s == 0 and qr == 0:
            return p_ref[pl.ds(row0 + Hlo + q, ROWS), :]
        blk = p_ref[pl.ds(row0 + Hlo + 8 * q8, ROWS + 8), :]
        base = blk[qr: qr + ROWS]
        if s == 0:
            return base
        nxt = blk[qr + 1: qr + 1 + ROWS]
        a = pltpu.roll(base, 128 - s, 1)
        b = pltpu.roll(nxt, 128 - s, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        return jnp.where(lane < 128 - s, a, b)

    def kernel(*refs):
        (x_in, r_in, p_in, vals_hbm) = refs[:4]
        k = 4
        if precond:
            minv_in = refs[k]
            k += 1
        if is_ell:
            gsrc_hbm = refs[k]            # precomputed window-local idx
            k += 1
        if NW:
            # W SEPARATE (D, RR, 128) plane operands, each a pure
            # bitcast of the carried (D, R) word plane.  A single
            # stacked (W, D, RR, 128) operand required a concat copy of
            # every word plane inside the outer loop body; XLA
            # miscompiles that copy at some shapes when the source is a
            # while-loop carry (G=100/D=17, G=10/D>=51 measured) — the
            # bytes land parity-clean but chunk-misplaced, so sed/sec8
            # can't see it and sec7/secded false-trigger (or the worker
            # crashes).  Bitcast operands have no copy to miscompile —
            # and drop ~2 x nnz x 12 bytes of HBM traffic per solve.
            words_hbm = refs[k: k + W]
            ckall = refs[k + W]           # (W,) whole-plane cksum folds
            k += W + 1
        if tail:
            td_hbm, tb_hbm = refs[k], refs[k + 1]
            k += 2
            if tail["NTW"]:
                twords_hbm = refs[k]
                tckall = refs[k + 1]      # (TW,) tail cksum folds SMEM
                k += 2
        scal_in = refs[k]                 # (2,) f32 SMEM: rr, rz
        itr_in = refs[k + 1]              # (1,) int32 SMEM
        upto = refs[k + 2]                # (1,) int32 SMEM
        k += 3
        (x_out, r_out, p_out, trace_out, itr_out, rr_out, rz_out,
         trig_out, err_out) = refs[k: k + 9]
        k += 9
        if lazy:
            # Last-verified-state snapshot (vectors + scalars).
            xs_out, rs_out, ps_out = refs[k: k + 3]
            its_out, rrs_out, rzs_out = refs[k + 3: k + 6]
            k += 6
        dbg_ck = dbg_wb = None
        if dbg:
            dbg_ck, dbg_wb = refs[k: k + 2]
            k += 2
        p_ref, r_ref, x_ref, w_ref, vbuf = refs[k: k + 5]
        k += 5
        m_ref = None
        if precond:
            m_ref = refs[k]
            k += 1
        gbuf = wtmp = xacc = None
        if is_ell:
            gbuf, wtmp = refs[k], refs[k + 1]
            k += 2
            if rolled:
                xacc = refs[k]
                k += 1
        if NW:
            wbuf = refs[k]
            k += 1
            ck_acc = None
            if use_cksum:
                # Cksum accumulator lives in SCRATCH, not the fori
                # carry: Mosaic's handling of stacked uint32 loop
                # carries is fragile at scale (G=100/D=17 and
                # G=10/D>=51 crashed the TPU worker or fail-stopped
                # with corrupted state; 4+ separate carries crashed at
                # G >= 60 before that).  Per-plane 2-D ref XOR stores
                # lower robustly.
                ck_acc = refs[k]
                k += 1
            pacc = None
            if use_parity and lazy:
                # Lazy schedule: the parity accumulator ALSO moves to
                # scratch so the whole signal block can sit under
                # pl.when(chk) — a fori-carry can't be written from a
                # predicated region, and computing it unconditionally
                # on stale buffers was the measured cost that made
                # lazy slower than live detection (headline lazy8
                # 2.55 ms vs live 1.99 at -b 10).
                pacc = refs[k]
                k += 1
            wsems = refs[k]               # (2, W) word-plane DMA sems
            k += 1
        if tail:
            td_ref, tb_ref = refs[k], refs[k + 1]
            k += 2
            if tail["NTW"]:
                twbuf = refs[k]
                k += 1
        if lazy:
            xs_ref, rs_ref, ps_ref = refs[k: k + 3]
            pw_smem = refs[k + 3]    # per-arm pw handoff (SMEM scalar)
            trig_smem = refs[k + 4]  # per-arm trigger handoff (SMEM)
            k += 5
        sems = refs[k]

        # ---- load state into VMEM ------------------------------------
        in_dmas = [
            pltpu.make_async_copy(x_in, x_ref, sems.at[0]),
            pltpu.make_async_copy(r_in, r_ref, sems.at[1]),
            pltpu.make_async_copy(p_in, p_ref.at[pl.ds(Hlo, RR), :],
                                  sems.at[2]),
        ]
        if precond:
            in_dmas.append(
                pltpu.make_async_copy(minv_in, m_ref, sems.at[9]))
        if tail:
            # td/tb stay VMEM-resident for the whole solve.
            in_dmas.append(
                pltpu.make_async_copy(td_hbm, td_ref, sems.at[10]))
            in_dmas.append(
                pltpu.make_async_copy(tb_hbm, tb_ref, sems.at[11]))
        if Hlo:
            p_ref[pl.ds(0, Hlo), :] = jnp.zeros((Hlo, 128), jnp.float32)
        if Hhi:
            p_ref[pl.ds(Hlo + RR, Hhi), :] = jnp.zeros((Hhi, 128),
                                                       jnp.float32)
        for d in in_dmas:
            d.start()
        for d in in_dmas:
            d.wait()
        if lazy:
            # The entry state is verified (initial, or a post-repair
            # snapshot resume) — it seeds the rollback snapshot.
            xs_ref[...] = x_ref[...]
            rs_ref[...] = r_ref[...]
            ps_ref[...] = p_ref[pl.ds(Hlo, RR), :]
        # trace_out is only consumed on the slots this call writes
        # ([itr_in, itr)); the caller window-merges, so no init needed.
        upto_v = upto[0]

        def get_dmas(slot, ci):
            if is_ell:
                # Row-major streams: chunk row groups lead, so each
                # PACK-group is a static (PACK*D, 128) slice in-kernel.
                # The rolled tier streams flat (ROWS*D, 128) chunk
                # planes instead (same bytes, 2-D blocks for the
                # absolute window scan).
                RP = ROWS * D if rolled else ROWS // PACK
                dmas = [pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(ci * RP, RP)],
                    vbuf.at[slot], sems.at[3 + slot]),
                    pltpu.make_async_copy(
                        gsrc_hbm.at[pl.ds(ci * RP, RP)],
                        gbuf.at[slot], sems.at[7 + slot])]
            else:
                dmas = [pltpu.make_async_copy(
                    vals_hbm.at[:, pl.ds(ci * ROWS, ROWS), :],
                    vbuf.at[slot], sems.at[3 + slot])]
            if NW and not lazy:
                dmas.extend(word_dmas(slot, ci))
            return dmas

        def word_dmas(slot, ci):
            return [pltpu.make_async_copy(
                words_hbm[wi].at[:, pl.ds(ci * ROWS, ROWS), :],
                wbuf.at[slot, wi], wsems.at[slot, wi])
                for wi in range(W)]

        def sig_trigger(par_src):
            """Scalar trigger from the signal accumulators — ONE
            cross-lane reduction per call (per-chunk reduces are a VPU
            pipeline stall)."""
            t = jnp.int32(0)
            if use_parity:
                cnt = jnp.sum(par_src.astype(jnp.int32))
                t = t | (cnt > 0).astype(jnp.int32)
            if use_cksum:
                lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                for wi in range(W):
                    f8 = _xor_fold_rows(ck_acc[wi], to=8)  # (8, 128)
                    # Aligned 8-lane-block XOR via rotate-halvings
                    # (Mosaic has no cross-lane reduce_xor): after
                    # rolls 4/2/1, lanes == 7 (mod 8) hold each aligned
                    # block's fold.  Compared per (row mod 8, lane
                    # block) class against the loop-invariant expected
                    # classes (derive() folds the stored checksums) —
                    # 128 classes per plane instead of one whole-plane
                    # value (PARITY.md granularity note).
                    for r in (4, 2, 1):
                        f8 = f8 ^ pltpu.roll(f8, r, 1)
                    bad = (f8 != ckall[wi]) & (lane8 % 8 == 7)
                    t = t | jnp.any(bad).astype(jnp.int32)
            return t

        def tail_trigger():
            """Tail word-plane trigger; assumes twbuf holds a fresh
            stream."""
            t = jnp.int32(0)
            twords = [twbuf[wi] for wi in range(tail["TW"])]
            if use_parity:
                accx = twords[0]
                for wd in twords[1:]:
                    accx = accx ^ wd
                # Vectorized any-odd-parity: OR-fold the parity bits to
                # one row, rotate-halve across lanes, ONE scalar read.
                # The previous jnp.sum over the whole (ER, 128) plane
                # serialized (~765 us/iter on the arrowhead tail,
                # E~650k — the entire split-secded regression vs jnp,
                # ZOO_BENCH r4).
                pb = _or_fold_rows(jax.lax.population_count(accx)
                                   & np.uint32(1))
                for rsh in (64, 32, 16, 8, 4, 2, 1):
                    pb = pb | pltpu.roll(pb, rsh, 1)
                t = t | (pb[0, 0] != 0).astype(jnp.int32)
            if use_cksum:
                for wi in range(tail["TW"]):
                    red = _xor_fold_rows(twords[wi])
                    for rsh in (64, 32, 16, 8, 4, 2, 1):
                        red = red ^ pltpu.roll(red, rsh, 1)
                    t = t | (red[0, 0] != tckall[wi]).astype(jnp.int32)
            return t

        def run_chunks(words_on):
            # The full A·p chunk loop; ``words_on`` statically includes
            # or excludes the word streams + detection signals (the
            # lazy schedule compiles BOTH variants and dispatches per
            # iteration — see the body's pl.when(chk) note).
            # All per-chunk signals accumulate in VMEM-shaped lane
            # vectors (FMA / XOR / OR per chunk) and reduce to scalars
            # ONCE per iteration: a cross-lane reduction per chunk is a
            # VPU pipeline stall, and G can be ~100 chunks.
            # The cksum accumulators for all W word planes live in ONE
            # stacked (W, ROWS, 128) scratch ref, not W separate
            # arrays: with the rolled gather's nested fori_loop inside
            # the chunk loop, >=4 separate loop carries crashed the TPU
            # worker at G >= 60 (a Mosaic lowering fault; sed's single
            # big parity carry at G=100 was always fine).
            acc0 = [jnp.zeros((ROWS, 128), jnp.float32)]       # pw
            if NW and use_parity and not lazy:
                acc0.append(jnp.zeros((D, ROWS, 128), jnp.uint32))
            if NW and words_on:
                if use_parity and lazy:
                    # Lazy parity accumulator in scratch (pacc note at
                    # the refs parse).
                    pacc[...] = jnp.zeros((D, ROWS, 128), jnp.uint32)
                if use_cksum:
                    # Scratch-ref accumulator, NOT a fori carry (see
                    # the ck_acc note at the refs parse).
                    ck_acc[...] = jnp.zeros((W, ROWS, 128), jnp.uint32)

            def chunk(ci, acc):
                acc = list(acc)
                slot = ci % 2

                @pl.when(ci + 1 < G)
                def _():
                    for d in get_dmas((ci + 1) % 2, ci + 1):
                        d.start()
                    if words_on and lazy:
                        # (live word DMAs ride inside get_dmas)
                        for d in word_dmas((ci + 1) % 2, ci + 1):
                            d.start()

                for d in get_dmas(slot, ci):
                    d.wait()
                if words_on and lazy:
                    for d in word_dmas(slot, ci):
                        d.wait()
                row0 = pl.multiple_of(ci * ROWS, ROWS)
                if big:
                    # Big-offset mode: no materialized extended block —
                    # every stencil read slices the resident p directly.
                    xc = p_ref[pl.ds(row0 + Hlo, ROWS), :]
                else:
                    ext = p_ref[pl.ds(row0, ROWS + Hlo + Hhi), :]
                    xc = None
                if is_ell:
                    # Windowed shuffle-gather (ops.spmv_pallas design),
                    # windows read straight from the VMEM-resident p.
                    # Indices arrive pre-localized (hi*128+lo vs the
                    # row group's window) and pre-clamped from derive().
                    # PACK row groups share each (PACK*D, 128) op: the
                    # lane shuffle acts per sublane row, so pack slot p
                    # just needs ITS window row in its tbl rows.
                    # Past the unrolled cap (``rolled``) indices are
                    # chunk-absolute and the scan runs as ONE static
                    # ext-row pass over the whole chunk — the wide-band
                    # tier (band <= 16256), same select work as here in
                    # EXT static bodies (_absolute_window_scan).
                    if rolled:
                        xg = _absolute_window_scan(
                            gbuf[slot], xacc, ext, Hlo, S0, ROWS,
                            WROWS, D)
                        prod = vbuf[slot][...] * xg
                        for j in range(ROWS):
                            wtmp[j:j + 1, :] = jnp.sum(
                                prod[j * D:(j + 1) * D], axis=0,
                                keepdims=True)
                        w = wtmp[...]
                    else:
                        for j in range(ROWS // PACK):
                            loc = gbuf[slot][j]   # (PACK*D, 128) int32
                            hi = loc >> 7
                            lo = loc & 127
                            xg = jnp.zeros((PACK * D, 128), jnp.float32)
                            for s in range(WROWS):
                                t0 = Hlo - S0 + j * PACK + s
                                if PACK == 1:
                                    tbl = jnp.broadcast_to(
                                        ext[t0:t0 + 1, :], (D, 128))
                                else:
                                    tbl = jnp.concatenate(
                                        [jnp.broadcast_to(
                                            ext[t0 + p:t0 + p + 1, :],
                                            (D, 128))
                                         for p in range(PACK)], axis=0)
                                cand = jnp.take_along_axis(tbl, lo,
                                                           axis=1)
                                xg = jnp.where(hi == s, cand, xg)
                            prod = vbuf[slot][j] * xg
                            for p in range(PACK):
                                wtmp[j * PACK + p:j * PACK + p + 1, :] = (
                                    jnp.sum(prod[p * D:(p + 1) * D],
                                            axis=0, keepdims=True))
                        w = wtmp[...]
                else:
                    w = jnp.zeros((ROWS, 128), jnp.float32)
                    for d, off in enumerate(offsets):
                        w = w + vbuf[slot][d] * (
                            shifted_big(p_ref, row0, off) if big
                            else shifted(ext, off))
                w_ref[pl.ds(row0, ROWS), :] = w
                if not tail:
                    # split computes pw over the complete product later
                    acc[0] = acc[0] + w * (
                        xc if big else ext[Hlo: Hlo + ROWS])

                # ---- live detection signals: per-element parity mask
                # (OR-accumulated) + per-plane checksum XOR.  Checksum
                # granularity is whole-plane (vs per-chunk before):
                # equally sound for faults within a single element —
                # any 1-2 flips in one codeword change some plane's
                # XOR (see PARITY.md for the pair-cancellation scope).
                if NW and words_on:
                    words = [wbuf[slot][wi] for wi in range(W)]
                    if use_parity:
                        acc_x = words[0]
                        for wd in words[1:]:
                            acc_x = acc_x ^ wd
                        par = (jax.lax.population_count(acc_x)
                               & np.uint32(1))
                        if lazy:
                            pacc[...] = pacc[...] | par
                        else:
                            acc[1] = acc[1] | par
                    if use_cksum:
                        for wi in range(W):
                            red = words[wi][0]        # (ROWS, 128)
                            for d in range(1, D):
                                red = red ^ words[wi][d]
                            ck_acc[wi] = ck_acc[wi] ^ red
                if dbg:
                    @pl.when(ci == DBG_CI)
                    def _():
                        dbg_wb[...] = wbuf[slot]
                return tuple(acc)

            return jax.lax.fori_loop(0, G, chunk, tuple(acc0))

        def body(carry):
            if lazy:
                itr, rr, rz, _, _, its, rrs, rzs = carry
            else:
                itr, rr, rz, _, _ = carry
            # Lazy schedule: the word streams (and the armed signals)
            # run only on checked iterations — every CI-th, keyed on the
            # absolute iteration count so resumes stay consistent.
            chk = ((itr % CI) == (CI - 1)) if lazy else None
            for d in get_dmas(0, 0):
                d.start()
            tw_dma = None
            if tail and tail["NTW"]:
                # Tail word planes re-stream each checked iteration
                # (live detection); overlaps the main chunk pipeline.
                tw_dma = pltpu.make_async_copy(twords_hbm, twbuf,
                                               sems.at[12])
                if not lazy:
                    tw_dma.start()

            # The lazy schedule dispatches to ONE of two compiled chunk
            # loops per iteration: words_on=True under pl.when(chk)
            # (word streams + armed signals), words_on=False under
            # pl.when(~chk) — so unchecked iterations run EXACTLY the
            # mode-none loop.  Predicating per chunk instead (pl.when
            # inside the chunk body) measured ~0.65 ms/iter of branch
            # overhead at G=125 — the hoist is what makes unchecked
            # iterations actually free.  The trigger reduction
            # (sig_trigger: a whole-accumulator popcount sum + the
            # cksum class folds) ALSO lives in the checked arm, handed
            # off through SMEM — computed unconditionally on the stale
            # accumulators it was a fixed per-iteration VPU cost on
            # every unchecked iteration.
            if lazy:
                @pl.when(chk)
                def _():
                    if tw_dma is not None:
                        tw_dma.start()
                    for d in word_dmas(0, 0):
                        d.start()
                    accs = run_chunks(True)
                    pw_smem[0, 0] = jnp.sum(accs[0])
                    t = (sig_trigger(pacc[...] if use_parity else None)
                         if NW else jnp.int32(0))
                    if tail and tail["NTW"]:
                        tw_dma.wait()
                        t = t | tail_trigger()
                    trig_smem[0, 0] = t

                @pl.when(jnp.logical_not(chk))
                def _():
                    accs = run_chunks(False)
                    pw_smem[0, 0] = jnp.sum(accs[0])
                    trig_smem[0, 0] = jnp.int32(0)
                accs = None
            else:
                accs = run_chunks(True)
            if dbg:
                dbg_ck[...] = ck_acc[...]
            if lazy:
                trig_i = trig_smem[0, 0]
            else:
                par_src = accs[1] if NW and use_parity else None
                trig_i = sig_trigger(par_src) if NW else jnp.int32(0)

            if tail:
                # ---- bordered tail: span-window dense rows + mirrored
                # AXPYs, everything at host-static positions -----------
                T, SR = tail["T"], tail["SR"]
                rows_t, starts_t = tail["rows"], tail["starts"]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                zrow = jnp.zeros((1, 128), jnp.float32)

                def all_lanes(v):
                    # (1, 128) -> every lane holds the row total
                    for rsh in (64, 32, 16, 8, 4, 2, 1):
                        v = v + pltpu.roll(v, rsh, 1)
                    return v

                for t in range(T):
                    orow, olane = divmod(rows_t[t], 128)
                    srow = starts_t[t] // 128
                    pwin = p_ref[pl.ds(Hlo + srow, SR), :]
                    # dense row t: w[o_t] += td[t] . p_window
                    wa = all_lanes(jnp.sum(td_ref[t] * pwin, axis=0,
                                           keepdims=True))
                    w_ref[orow:orow + 1, :] = (
                        w_ref[orow:orow + 1, :]
                        + jnp.where(lane == olane, wa, zrow))
                    # mirrored AXPY: w_window += p[o_t] * tb[t]
                    # (p[o_t] broadcast by masking its lane + add-fold
                    # — Mosaic has no (1, 128) dynamic_gather and a
                    # scalar extract would stall the VPU)
                    prow = p_ref[Hlo + orow:Hlo + orow + 1, :]
                    pb = all_lanes(jnp.where(lane == olane, prow, zrow))
                    w_ref[pl.ds(srow, SR), :] = (
                        w_ref[pl.ds(srow, SR), :] + pb * tb_ref[t])
                if tail["NTW"] and not lazy:
                    # (lazy: waited + OR'd inside the checked arm)
                    tw_dma.wait()
                    trig_i = trig_i | tail_trigger()
                # pw over the complete (main + tail) product
                pw = jnp.sum(w_ref[...] * p_ref[pl.ds(Hlo, RR), :])
            elif lazy:
                pw = pw_smem[0, 0]
            else:
                pw = jnp.sum(accs[0])
            alpha = rz / pw
            r1 = r_ref[...] - alpha * w_ref[...]
            rr1 = jnp.sum(r1 * r1)
            if precond:
                z1 = m_ref[...] * r1
                rz1 = jnp.sum(r1 * z1)
            else:
                z1, rz1 = r1, rr1
            bad = jnp.logical_or(pw <= 0.0, ~jnp.isfinite(rr1))
            ok = jnp.logical_and(trig_i == 0, ~bad)

            # A triggered iteration is re-executed on the scrubbed
            # matrix; a breakdown fail-stops — either way the update is
            # discarded (solver.cg semantics).
            @pl.when(ok)
            def _():
                x_ref[...] = x_ref[...] + alpha * p_ref[pl.ds(Hlo, RR), :]
                r_ref[...] = r1
                beta = rz1 / rz
                p_ref[pl.ds(Hlo, RR), :] = (
                    z1 + beta * p_ref[pl.ds(Hlo, RR), :])
                if trace_len:
                    trace_out[itr] = rr1
                if lazy:
                    # A checked iteration that stood is verified state:
                    # refresh the rollback snapshot (VMEM copies, every
                    # CI-th iteration only).
                    @pl.when(chk)
                    def _():
                        xs_ref[...] = x_ref[...]
                        rs_ref[...] = r_ref[...]
                        ps_ref[...] = p_ref[pl.ds(Hlo, RR), :]

            itr1 = jnp.where(ok, itr + 1, itr)
            rrn = jnp.where(ok, rr1, rr)
            rzn = jnp.where(ok, rz1, rz)
            err = jnp.where(bad & (trig_i == 0),
                            jnp.int32(ERR_BREAKDOWN), jnp.int32(0))
            if lazy:
                snapped = ok & chk
                its1 = jnp.where(snapped, itr + 1, its)
                rrs1 = jnp.where(snapped, rr1, rrs)
                rzs1 = jnp.where(snapped, rz1, rzs)
                return itr1, rrn, rzn, trig_i, err, its1, rrs1, rzs1
            return itr1, rrn, rzn, trig_i, err

        def cond(carry):
            itr, rr, _, trig, err = carry[:5]
            return ((itr < upto_v) & (rr > conv) & (trig == 0)
                    & (err == 0))

        carry0 = (itr_in[0], scal_in[0], scal_in[1], jnp.int32(0),
                  jnp.int32(0))
        if lazy:
            carry0 = carry0 + (itr_in[0], scal_in[0], scal_in[1])
        out = jax.lax.while_loop(cond, body, carry0)
        itr, rr, rz, trig, err = out[:5]

        itr_out[0, 0] = itr
        rr_out[0, 0] = rr
        rz_out[0, 0] = rz
        trig_out[0, 0] = trig
        err_out[0, 0] = err

        # ---- state back to HBM ----------------------------------------
        out_dmas = [
            pltpu.make_async_copy(x_ref, x_out, sems.at[0]),
            pltpu.make_async_copy(r_ref, r_out, sems.at[1]),
            pltpu.make_async_copy(p_ref.at[pl.ds(Hlo, RR), :], p_out,
                                  sems.at[2]),
        ]
        if lazy:
            its, rrs, rzs = out[5:]
            its_out[0, 0] = its
            rrs_out[0, 0] = rrs
            rzs_out[0, 0] = rzs
            out_dmas += [
                pltpu.make_async_copy(xs_ref, xs_out, sems.at[3]),
                pltpu.make_async_copy(rs_ref, rs_out, sems.at[4]),
                pltpu.make_async_copy(ps_ref, ps_out, sems.at[5]),
            ]

            # ---- exit-window close, in-kernel: a clean exit mid-window
            # leaves up to CI-1 tail iterations unverified.  One
            # signals-only pass over the word planes closes it at HBM
            # speed; the jnp verify this replaces measured ~6.3 ms at
            # -b 100 (vs ~0.4 ms here) — the single largest
            # lazy-schedule cost.  A trigger here rolls the outer loop
            # back to the snapshot exactly like a mid-solve one.
            unver = jnp.logical_and(its != itr,
                                    jnp.logical_and(trig == 0, err == 0))

            @pl.when(unver)
            def _():
                if use_parity:
                    pacc[...] = jnp.zeros((D, ROWS, 128), jnp.uint32)
                if use_cksum:
                    ck_acc[...] = jnp.zeros((W, ROWS, 128), jnp.uint32)
                for d in word_dmas(0, 0):
                    d.start()
                tw2 = None
                if tail and tail["NTW"]:
                    tw2 = pltpu.make_async_copy(twords_hbm, twbuf,
                                                sems.at[12])
                    tw2.start()

                def wchunk(ci, _):
                    slot = ci % 2

                    @pl.when(ci + 1 < G)
                    def _():
                        for d in word_dmas((ci + 1) % 2, ci + 1):
                            d.start()
                    for d in word_dmas(slot, ci):
                        d.wait()
                    words = [wbuf[slot][wi] for wi in range(W)]
                    if use_parity:
                        acc_x = words[0]
                        for wd in words[1:]:
                            acc_x = acc_x ^ wd
                        pacc[...] = pacc[...] | (
                            jax.lax.population_count(acc_x)
                            & np.uint32(1))
                    if use_cksum:
                        for wi in range(W):
                            red = words[wi][0]
                            for d in range(1, D):
                                red = red ^ words[wi][d]
                            ck_acc[wi] = ck_acc[wi] ^ red
                    return 0

                jax.lax.fori_loop(0, G, wchunk, 0)
                t = sig_trigger(pacc[...] if use_parity else None)
                if tail and tail["NTW"]:
                    tw2.wait()
                    t = t | tail_trigger()
                trig_out[0, 0] = t
        for d in out_dmas:
            d.start()
        for d in out_dmas:
            d.wait()

    def call(x2, r2, p2, minv2, vals3, gsrc, wstack, ckall, tail_args,
             rr, rz, itr, upto):
        vec = jax.ShapeDtypeStruct((RR, 128), jnp.float32)
        s11f = jax.ShapeDtypeStruct((1, 1), jnp.float32)
        s11i = jax.ShapeDtypeStruct((1, 1), jnp.int32)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
        in_specs = [any_spec, any_spec, any_spec, any_spec]
        args = [x2, r2, p2, vals3]
        if precond:
            in_specs.append(any_spec)
            args.append(minv2)
        if is_ell:
            in_specs.append(any_spec)
            args.append(gsrc)
        if NW:
            in_specs += [any_spec] * W + [
                pl.BlockSpec(memory_space=pltpu.VMEM)]
            args += list(wstack) + [ckall]
        if tail:
            td3, tb3, tw3, tck = tail_args
            in_specs += [any_spec, any_spec]
            args += [td3, tb3]
            if tail["NTW"]:
                in_specs += [any_spec, smem()]
                args += [tw3, tck]
        in_specs += [smem(), smem(), smem()]
        args += [jnp.stack([rr, rz]).astype(jnp.float32),
                 jnp.reshape(itr, (1,)).astype(jnp.int32),
                 jnp.reshape(upto, (1,)).astype(jnp.int32)]
        ebuf = ((2, ROWS * D, 128) if rolled
                else (2, ROWS // PACK, PACK * D, 128))
        scratch = [
            pltpu.VMEM((PR, 128), jnp.float32),        # p (haloed)
            pltpu.VMEM((RR, 128), jnp.float32),        # r
            pltpu.VMEM((RR, 128), jnp.float32),        # x
            pltpu.VMEM((RR, 128), jnp.float32),        # w
            pltpu.VMEM(ebuf if is_ell else (2, D, ROWS, 128),
                       jnp.float32),
        ]
        if precond:
            scratch.append(pltpu.VMEM((RR, 128), jnp.float32))  # M^-1
        if is_ell:
            scratch.append(pltpu.VMEM(ebuf, jnp.int32))
            scratch.append(pltpu.VMEM((ROWS, 128), jnp.float32))
            if rolled:
                scratch.append(pltpu.VMEM((ROWS * D, 128), jnp.float32))
        if NW:
            scratch.append(pltpu.VMEM((2, W, D, ROWS, 128), jnp.uint32))
            if use_cksum:
                scratch.append(pltpu.VMEM((W, ROWS, 128), jnp.uint32))
            if use_parity and plan.get("ci", 1) > 1:
                # Lazy parity accumulator (see the pacc refs-parse note)
                scratch.append(pltpu.VMEM((D, ROWS, 128), jnp.uint32))
            scratch.append(pltpu.SemaphoreType.DMA((2, W)))
        if tail:
            tsh = (tail["T"], tail["SR"], 128)
            scratch.append(pltpu.VMEM(tsh, jnp.float32))   # td
            scratch.append(pltpu.VMEM(tsh, jnp.float32))   # tb
            if tail["NTW"]:
                scratch.append(pltpu.VMEM(
                    (tail["TW"], tail["ER"], 128), jnp.uint32))
        lazy = plan.get("ci", 1) > 1 and NW > 0
        if lazy:
            for _ in range(3):   # x/r/p verified-state snapshot
                scratch.append(pltpu.VMEM((RR, 128), jnp.float32))
            scratch.append(pltpu.SMEM((1, 1), jnp.float32))  # pw handoff
            scratch.append(pltpu.SMEM((1, 1), jnp.int32))  # trig handoff
        scratch.append(pltpu.SemaphoreType.DMA((13,)))
        from jax.experimental import pallas as _pl

        out_specs = [any_spec, any_spec, any_spec, smem(), smem(),
                     smem(), smem(), smem(), smem()]
        out_shape = [vec, vec, vec,
                     jax.ShapeDtypeStruct((max(trace_len, 1),),
                                          jnp.float32),
                     s11i, s11f, s11f, s11i, s11i]
        if lazy:
            out_specs += [any_spec, any_spec, any_spec,
                          smem(), smem(), smem()]
            out_shape += [vec, vec, vec, s11i, s11f, s11f]
        if dbg:
            vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
            out_specs += [vmem, vmem]
            out_shape += [
                jax.ShapeDtypeStruct((W, ROWS, 128), jnp.uint32),
                jax.ShapeDtypeStruct((W, D, ROWS, 128), jnp.uint32)]
        outs = _pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(*args)
        return outs

    return call


def _make_streaming_kernel(plan, mode, conv, trace_len, interpret):
    """The streaming megakernel tier: p (haloed) + r VMEM-resident, x
    and w in HBM, moved chunk-wise through double-buffered DMAs.

    Per fast-loop iteration:

      phase 1   stream the protected planes (live detection fused, as
                in the resident kernel), compute each w chunk from the
                resident p and DMA it out to an HBM scratch output;
                pw and the detection signals accumulate as lane
                vectors.
      phase 2a  re-read the w chunks and compute rr1 (+ rz1 for
                Jacobi, streaming M^-1 chunks) WITHOUT mutating any
                state — a triggered or broken-down iteration is
                discarded bit-exactly, same as the resident kernel's
                pl.when(ok) update.
      phase 2b  (only when the iteration stands) re-read w plus the
                HBM x chunks, apply x += alpha p / r -= alpha w.
      phase 3   (only when the iteration stands) chunked in-VMEM
                p = z + beta p (Jacobi re-streams M^-1 — beta is not
                known until rr1/rz1 are).

    Everything else (trace, scalar carries, breakdown/trigger
    semantics, classify-outside) matches _make_kernel.  x is copied
    x_in -> x_out once per kernel call and read-modify-written in
    place thereafter, so a zero-iteration call still returns x intact.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, RR, C, ROWS, G = (plan[k] for k in ("R", "RR", "C", "ROWS", "G"))
    D, W, NW = plan["D"], plan["W"], plan["NW"]
    offsets, Hlo, Hhi = plan["offsets"], plan["Hlo"], plan["Hhi"]
    use_parity, use_cksum = plan["use_parity"], plan["use_cksum"]
    is_ell = plan["kind"] == "ell"
    S0, WROWS, PACK = plan["S0"], plan["WROWS"], plan["PACK"]
    rolled = plan.get("rolled", False)
    big = plan.get("big", False)
    precond = plan["precond"]
    PR = Hlo + RR + Hhi   # haloed p rows
    conv = float(conv)
    CI = plan.get("ci", 1)
    lazy = CI > 1 and NW > 0   # lazy schedule; snapshots live in HBM

    def shifted(ext, off):
        q, s = divmod(off, 128)
        base = ext[Hlo + q: Hlo + q + ROWS]
        if s == 0:
            return base
        nxt = ext[Hlo + q + 1: Hlo + q + 1 + ROWS]
        a = pltpu.roll(base, 128 - s, 1)
        b = pltpu.roll(nxt, 128 - s, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        return jnp.where(lane < 128 - s, a, b)

    def shifted_big(p_ref, row0, off):
        # Big-offset stencil read from the resident haloed p (see the
        # resident kernel's shifted_big for the alignment proof).
        q, s = divmod(off, 128)
        q8, qr = divmod(q, 8)
        if s == 0 and qr == 0:
            return p_ref[pl.ds(row0 + Hlo + q, ROWS), :]
        blk = p_ref[pl.ds(row0 + Hlo + 8 * q8, ROWS + 8), :]
        base = blk[qr: qr + ROWS]
        if s == 0:
            return base
        nxt = blk[qr + 1: qr + 1 + ROWS]
        a = pltpu.roll(base, 128 - s, 1)
        b = pltpu.roll(nxt, 128 - s, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        return jnp.where(lane < 128 - s, a, b)

    def kernel(*refs):
        (x_in, r_in, p_in, vals_hbm) = refs[:4]
        k = 4
        if precond:
            minv_in = refs[k]
            k += 1
        if is_ell:
            gsrc_hbm = refs[k]
            k += 1
        if NW:
            # W separate bitcast plane operands — see the resident
            # kernel's while-carry concat-miscompile note.
            words_hbm = refs[k: k + W]
            ckall = refs[k + W]
            k += W + 1
        scal_in = refs[k]
        itr_in = refs[k + 1]
        upto = refs[k + 2]
        k += 3
        (x_out, r_out, p_out, trace_out, itr_out, rr_out, rz_out,
         trig_out, err_out, w_hbm) = refs[k: k + 10]
        k += 10
        if lazy:
            # Last-verified-state snapshot, HBM-resident.
            xs_out, rs_out, ps_out = refs[k: k + 3]
            its_out, rrs_out, rzs_out = refs[k + 3: k + 6]
            k += 6
        p_ref, r_ref = refs[k], refs[k + 1]
        vbuf = refs[k + 2]
        k += 3
        gbuf = xacc = None
        if is_ell:
            gbuf = refs[k]
            k += 1
            if rolled:
                xacc = refs[k]
                k += 1
        if NW:
            wbuf = refs[k]
            k += 1
            ck_acc = None
            if use_cksum:
                # Scratch-ref cksum accumulator — same Mosaic
                # carry-fragility workaround as the resident kernel.
                ck_acc = refs[k]
                k += 1
            pacc = None
            if use_parity and lazy:
                # Lazy parity accumulator in scratch (see the resident
                # kernel's pacc note: the signal block must be fully
                # predicated on checked iterations to skip its VPU
                # cost, and a fori carry can't be).
                pacc = refs[k]
                k += 1
            wsems = refs[k]               # (2, W) word-plane DMA sems
            k += 1
        wcb, wrb, xb = refs[k], refs[k + 1], refs[k + 2]
        k += 3
        mb = None
        if precond:
            mb = refs[k]
            k += 1
        if lazy:
            pw_smem = refs[k]    # per-arm pw handoff (SMEM scalar)
            trig_smem = refs[k + 1]  # per-arm trigger handoff (SMEM)
            k += 2
        sems = refs[k]

        # ---- load resident state; x goes HBM -> HBM into its working
        # buffer (x_out) so phase 2b can read-modify-write it ----------
        in_dmas = [
            pltpu.make_async_copy(x_in, x_out, sems.at[0]),
            pltpu.make_async_copy(r_in, r_ref, sems.at[1]),
            pltpu.make_async_copy(p_in, p_ref.at[pl.ds(Hlo, RR), :],
                                  sems.at[2]),
        ]
        if lazy:
            # The entry state is verified — it seeds the snapshot.
            in_dmas += [
                pltpu.make_async_copy(x_in, xs_out, sems.at[19]),
                pltpu.make_async_copy(r_in, rs_out, sems.at[20]),
                pltpu.make_async_copy(p_in, ps_out, sems.at[21]),
            ]
        if Hlo:
            p_ref[pl.ds(0, Hlo), :] = jnp.zeros((Hlo, 128), jnp.float32)
        if Hhi:
            p_ref[pl.ds(Hlo + RR, Hhi), :] = jnp.zeros((Hhi, 128),
                                                       jnp.float32)
        for d in in_dmas:
            d.start()
        for d in in_dmas:
            d.wait()
        upto_v = upto[0]

        def get_dmas(slot, ci):
            if is_ell:
                RP = ROWS * D if rolled else ROWS // PACK
                dmas = [pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(ci * RP, RP)],
                    vbuf.at[slot], sems.at[3 + slot]),
                    pltpu.make_async_copy(
                        gsrc_hbm.at[pl.ds(ci * RP, RP)],
                        gbuf.at[slot], sems.at[7 + slot])]
            else:
                dmas = [pltpu.make_async_copy(
                    vals_hbm.at[:, pl.ds(ci * ROWS, ROWS), :],
                    vbuf.at[slot], sems.at[3 + slot])]
            if NW and not lazy:
                dmas.extend(word_dmas(slot, ci))
            return dmas

        def word_dmas(slot, ci):
            return [pltpu.make_async_copy(
                words_hbm[wi].at[:, pl.ds(ci * ROWS, ROWS), :],
                wbuf.at[slot, wi], wsems.at[slot, wi])
                for wi in range(W)]

        def w_out_dma(slot, ci):
            return pltpu.make_async_copy(
                wcb.at[slot], w_hbm.at[pl.ds(ci * ROWS, ROWS), :],
                sems.at[9 + slot])

        def w_in_dma(slot, ci):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(ci * ROWS, ROWS), :], wrb.at[slot],
                sems.at[11 + slot])

        def x_in_dma(slot, ci):
            return pltpu.make_async_copy(
                x_out.at[pl.ds(ci * ROWS, ROWS), :], xb.at[slot],
                sems.at[13 + slot])

        def x_out_dma(slot, ci):
            return pltpu.make_async_copy(
                xb.at[slot], x_out.at[pl.ds(ci * ROWS, ROWS), :],
                sems.at[15 + slot])

        def m_in_dma(slot, ci):
            return pltpu.make_async_copy(
                minv_in.at[pl.ds(ci * ROWS, ROWS), :], mb.at[slot],
                sems.at[17 + slot])

        def sig_trigger(par_src):
            # Scalar trigger from the signal accumulators — see the
            # resident kernel's sig_trigger (rotate-halving class
            # compare; one cross-lane reduction per call).
            t = jnp.int32(0)
            if use_parity:
                cnt = jnp.sum(par_src.astype(jnp.int32))
                t = t | (cnt > 0).astype(jnp.int32)
            if use_cksum:
                lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                for wi in range(W):
                    f8 = _xor_fold_rows(ck_acc[wi], to=8)
                    for r in (4, 2, 1):
                        f8 = f8 ^ pltpu.roll(f8, r, 1)
                    bad = (f8 != ckall[wi]) & (lane8 % 8 == 7)
                    t = t | jnp.any(bad).astype(jnp.int32)
            return t

        def run_chunks1(words_on):
            # Phase-1 chunk loop; ``words_on`` statically includes or
            # excludes the word streams + signals — the lazy schedule
            # compiles BOTH variants and dispatches once per iteration
            # (resident kernel's run_chunks note: per-chunk pl.when
            # predication measured ~0.65 ms/iter of branch overhead at
            # G=125).
            # One stacked cksum scratch ref — see the resident kernel's
            # note (>=4 separate carries + the rolled inner loop
            # crashed the TPU worker at G >= 60).
            acc0 = [jnp.zeros((ROWS, 128), jnp.float32)]       # pw
            if NW and use_parity and not lazy:
                acc0.append(jnp.zeros((D, ROWS, 128), jnp.uint32))
            if NW and words_on:
                if use_parity and lazy:
                    # Lazy parity accumulator in scratch (pacc note at
                    # the refs parse).
                    pacc[...] = jnp.zeros((D, ROWS, 128), jnp.uint32)
                if use_cksum:
                    # Scratch-ref accumulator, NOT a fori carry (see
                    # the ck_acc note at the refs parse).
                    ck_acc[...] = jnp.zeros((W, ROWS, 128), jnp.uint32)

            def chunk1(ci, acc):
                acc = list(acc)
                slot = ci % 2

                @pl.when(ci + 1 < G)
                def _():
                    for d in get_dmas((ci + 1) % 2, ci + 1):
                        d.start()
                    if words_on and lazy:
                        # (live word DMAs ride inside get_dmas)
                        for d in word_dmas((ci + 1) % 2, ci + 1):
                            d.start()

                for d in get_dmas(slot, ci):
                    d.wait()
                if words_on and lazy:
                    for d in word_dmas(slot, ci):
                        d.wait()

                # wcb[slot] was last DMA'd out at chunk ci-2; drain
                # that copy before overwriting the buffer.
                @pl.when(ci >= 2)
                def _():
                    w_out_dma(slot, ci - 2).wait()

                row0 = pl.multiple_of(ci * ROWS, ROWS)
                if big:
                    # Big-offset mode: no materialized extended block —
                    # every stencil read slices the resident p directly.
                    xc = p_ref[pl.ds(row0 + Hlo, ROWS), :]
                else:
                    ext = p_ref[pl.ds(row0, ROWS + Hlo + Hhi), :]
                    xc = None
                if is_ell:
                    if rolled:
                        xg = _absolute_window_scan(
                            gbuf[slot], xacc, ext, Hlo, S0, ROWS,
                            WROWS, D)
                        prod = vbuf[slot][...] * xg
                        for j in range(ROWS):
                            wcb[slot, j:j + 1, :] = jnp.sum(
                                prod[j * D:(j + 1) * D], axis=0,
                                keepdims=True)
                    else:
                        for j in range(ROWS // PACK):
                            loc = gbuf[slot][j]
                            hi = loc >> 7
                            lo = loc & 127
                            xg = jnp.zeros((PACK * D, 128), jnp.float32)
                            for s in range(WROWS):
                                t0 = Hlo - S0 + j * PACK + s
                                if PACK == 1:
                                    tbl = jnp.broadcast_to(
                                        ext[t0:t0 + 1, :], (D, 128))
                                else:
                                    tbl = jnp.concatenate(
                                        [jnp.broadcast_to(
                                            ext[t0 + p:t0 + p + 1, :],
                                            (D, 128))
                                         for p in range(PACK)], axis=0)
                                cand = jnp.take_along_axis(tbl, lo,
                                                           axis=1)
                                xg = jnp.where(hi == s, cand, xg)
                            prod = vbuf[slot][j] * xg
                            for p in range(PACK):
                                wcb[slot,
                                    j * PACK + p:j * PACK + p + 1, :] = (
                                    jnp.sum(prod[p * D:(p + 1) * D],
                                            axis=0, keepdims=True))
                    w = wcb[slot]
                else:
                    w = jnp.zeros((ROWS, 128), jnp.float32)
                    for d, off in enumerate(offsets):
                        w = w + vbuf[slot][d] * (
                            shifted_big(p_ref, row0, off) if big
                            else shifted(ext, off))
                    wcb[slot] = w
                w_out_dma(slot, ci).start()
                acc[0] = acc[0] + w * (xc if big else ext[Hlo: Hlo + ROWS])

                if NW and words_on:
                    words = [wbuf[slot][wi] for wi in range(W)]
                    if use_parity:
                        acc_x = words[0]
                        for wd in words[1:]:
                            acc_x = acc_x ^ wd
                        par = (jax.lax.population_count(acc_x)
                               & np.uint32(1))
                        if lazy:
                            pacc[...] = pacc[...] | par
                        else:
                            acc[1] = acc[1] | par
                    if use_cksum:
                        for wi in range(W):
                            red = words[wi][0]
                            for d in range(1, D):
                                red = red ^ words[wi][d]
                            ck_acc[wi] = ck_acc[wi] ^ red
                return tuple(acc)

            return jax.lax.fori_loop(0, G, chunk1, tuple(acc0))

        def body(carry):
            if lazy:
                itr, rr, rz, _, _, its, rrs, rzs = carry
            else:
                itr, rr, rz, _, _ = carry
            chk = ((itr % CI) == (CI - 1)) if lazy else None

            # ---- phase 1: w = A p, live detection, w -> HBM ----------
            for d in get_dmas(0, 0):
                d.start()
            if lazy:
                # Two-arm dispatch: unchecked iterations run EXACTLY
                # the mode-none phase-1 loop (resident kernel's note).
                # The trigger reduction is ALSO per-arm (SMEM handoff)
                # — see the resident kernel's note.
                @pl.when(chk)
                def _():
                    for d in word_dmas(0, 0):
                        d.start()
                    accs = run_chunks1(True)
                    pw_smem[0, 0] = jnp.sum(accs[0])
                    trig_smem[0, 0] = (
                        sig_trigger(pacc[...] if use_parity else None)
                        if NW else jnp.int32(0))

                @pl.when(jnp.logical_not(chk))
                def _():
                    accs = run_chunks1(False)
                    pw_smem[0, 0] = jnp.sum(accs[0])
                    trig_smem[0, 0] = jnp.int32(0)
                accs = None
            else:
                accs = run_chunks1(True)
            for cl in range(max(G - 2, 0), G):
                w_out_dma(cl % 2, cl).wait()

            if lazy:
                trig_i = trig_smem[0, 0]
            else:
                par_src = accs[1] if NW and use_parity else None
                trig_i = sig_trigger(par_src) if NW else jnp.int32(0)
            pw = pw_smem[0, 0] if lazy else jnp.sum(accs[0])
            alpha = rz / pw

            # ---- phase 2a: rr1 (+ rz1), no mutation ------------------
            w_in_dma(0, 0).start()
            if precond:
                m_in_dma(0, 0).start()
            acc2 = (jnp.zeros((ROWS, 128), jnp.float32),
                    jnp.zeros((ROWS, 128), jnp.float32))

            def chunk2a(ci, acc):
                rracc, rzacc = acc
                slot = ci % 2

                @pl.when(ci + 1 < G)
                def _():
                    w_in_dma((ci + 1) % 2, ci + 1).start()
                    if precond:
                        m_in_dma((ci + 1) % 2, ci + 1).start()

                w_in_dma(slot, ci).wait()
                row0 = pl.multiple_of(ci * ROWS, ROWS)
                r1 = (r_ref[pl.ds(row0, ROWS), :]
                      - alpha * wrb[slot])
                rracc = rracc + r1 * r1
                if precond:
                    m_in_dma(slot, ci).wait()
                    rzacc = rzacc + mb[slot] * r1 * r1
                return (rracc, rzacc)

            rracc, rzacc = jax.lax.fori_loop(0, G, chunk2a, acc2)
            rr1 = jnp.sum(rracc)
            rz1 = jnp.sum(rzacc) if precond else rr1

            bad = jnp.logical_or(pw <= 0.0, ~jnp.isfinite(rr1))
            ok = jnp.logical_and(trig_i == 0, ~bad)
            beta = rz1 / rz

            # ---- phase 2b: apply x/r updates (iteration stands) ------
            @pl.when(ok)
            def _():
                w_in_dma(0, 0).start()
                x_in_dma(0, 0).start()

                def chunk2b(ci, _):
                    slot = ci % 2

                    @pl.when(ci + 1 < G)
                    def _():
                        # xb[(ci+1)%2] was DMA'd out at chunk ci-1;
                        # drain before reloading the buffer.
                        @pl.when(ci >= 1)
                        def _():
                            x_out_dma((ci + 1) % 2, ci - 1).wait()
                        w_in_dma((ci + 1) % 2, ci + 1).start()
                        x_in_dma((ci + 1) % 2, ci + 1).start()

                    w_in_dma(slot, ci).wait()
                    x_in_dma(slot, ci).wait()
                    row0 = pl.multiple_of(ci * ROWS, ROWS)
                    r_ref[pl.ds(row0, ROWS), :] = (
                        r_ref[pl.ds(row0, ROWS), :]
                        - alpha * wrb[slot])
                    xb[slot] = (xb[slot]
                                + alpha * p_ref[pl.ds(Hlo + row0, ROWS), :])
                    x_out_dma(slot, ci).start()
                    return 0

                jax.lax.fori_loop(0, G, chunk2b, 0)
                for cl in range(max(G - 2, 0), G):
                    x_out_dma(cl % 2, cl).wait()

            # ---- phase 3: p = z + beta p, in VMEM --------------------
            @pl.when(ok)
            def _():
                if precond:
                    m_in_dma(0, 0).start()

                def chunk3(ci, _):
                    slot = ci % 2
                    if precond:
                        @pl.when(ci + 1 < G)
                        def _():
                            m_in_dma((ci + 1) % 2, ci + 1).start()
                        m_in_dma(slot, ci).wait()
                    row0 = pl.multiple_of(ci * ROWS, ROWS)
                    rblk = r_ref[pl.ds(row0, ROWS), :]
                    z = mb[slot] * rblk if precond else rblk
                    p_ref[pl.ds(Hlo + row0, ROWS), :] = (
                        z + beta * p_ref[pl.ds(Hlo + row0, ROWS), :])
                    return 0

                jax.lax.fori_loop(0, G, chunk3, 0)
                if trace_len:
                    trace_out[itr] = rr1
                if lazy:
                    # A checked iteration that stood is verified state:
                    # refresh the HBM snapshot (3 whole-vector DMAs,
                    # every CI-th iteration only).
                    @pl.when(chk)
                    def _():
                        snap_dmas = [
                            pltpu.make_async_copy(x_out, xs_out,
                                                  sems.at[19]),
                            pltpu.make_async_copy(r_ref, rs_out,
                                                  sems.at[20]),
                            pltpu.make_async_copy(
                                p_ref.at[pl.ds(Hlo, RR), :], ps_out,
                                sems.at[21]),
                        ]
                        for d in snap_dmas:
                            d.start()
                        for d in snap_dmas:
                            d.wait()

            itr1 = jnp.where(ok, itr + 1, itr)
            rrn = jnp.where(ok, rr1, rr)
            rzn = jnp.where(ok, rz1, rz)
            err = jnp.where(bad & (trig_i == 0),
                            jnp.int32(ERR_BREAKDOWN), jnp.int32(0))
            if lazy:
                snapped = ok & chk
                its1 = jnp.where(snapped, itr + 1, its)
                rrs1 = jnp.where(snapped, rr1, rrs)
                rzs1 = jnp.where(snapped, rz1, rzs)
                return itr1, rrn, rzn, trig_i, err, its1, rrs1, rzs1
            return itr1, rrn, rzn, trig_i, err

        def cond(carry):
            itr, rr, _, trig, err = carry[:5]
            return ((itr < upto_v) & (rr > conv) & (trig == 0)
                    & (err == 0))

        carry0 = (itr_in[0], scal_in[0], scal_in[1], jnp.int32(0),
                  jnp.int32(0))
        if lazy:
            carry0 = carry0 + (itr_in[0], scal_in[0], scal_in[1])
        out = jax.lax.while_loop(cond, body, carry0)
        itr, rr, rz, trig, err = out[:5]

        itr_out[0, 0] = itr
        rr_out[0, 0] = rr
        rz_out[0, 0] = rz
        trig_out[0, 0] = trig
        err_out[0, 0] = err
        if lazy:
            its, rrs, rzs = out[5:]
            its_out[0, 0] = its
            rrs_out[0, 0] = rrs
            rzs_out[0, 0] = rzs

            # ---- exit-window close, in-kernel (resident kernel's
            # note: replaces a ~6.3 ms jnp verify with a ~0.4 ms
            # HBM-speed word-plane pass) -------------------------------
            unver = jnp.logical_and(its != itr,
                                    jnp.logical_and(trig == 0, err == 0))

            @pl.when(unver)
            def _():
                if use_parity:
                    pacc[...] = jnp.zeros((D, ROWS, 128), jnp.uint32)
                if use_cksum:
                    ck_acc[...] = jnp.zeros((W, ROWS, 128), jnp.uint32)
                for d in word_dmas(0, 0):
                    d.start()

                def wchunk(ci, _):
                    slot = ci % 2

                    @pl.when(ci + 1 < G)
                    def _():
                        for d in word_dmas((ci + 1) % 2, ci + 1):
                            d.start()
                    for d in word_dmas(slot, ci):
                        d.wait()
                    words = [wbuf[slot][wi] for wi in range(W)]
                    if use_parity:
                        acc_x = words[0]
                        for wd in words[1:]:
                            acc_x = acc_x ^ wd
                        pacc[...] = pacc[...] | (
                            jax.lax.population_count(acc_x)
                            & np.uint32(1))
                    if use_cksum:
                        for wi in range(W):
                            red = words[wi][0]
                            for d in range(1, D):
                                red = red ^ words[wi][d]
                            ck_acc[wi] = ck_acc[wi] ^ red
                    return 0

                jax.lax.fori_loop(0, G, wchunk, 0)
                trig_out[0, 0] = sig_trigger(
                    pacc[...] if use_parity else None)

        out_dmas = [
            pltpu.make_async_copy(r_ref, r_out, sems.at[1]),
            pltpu.make_async_copy(p_ref.at[pl.ds(Hlo, RR), :], p_out,
                                  sems.at[2]),
        ]
        for d in out_dmas:
            d.start()
        for d in out_dmas:
            d.wait()

    def call(x2, r2, p2, minv2, vals3, gsrc, wstack, ckall, tail_args,
             rr, rz, itr, upto):
        vec = jax.ShapeDtypeStruct((RR, 128), jnp.float32)
        s11f = jax.ShapeDtypeStruct((1, 1), jnp.float32)
        s11i = jax.ShapeDtypeStruct((1, 1), jnp.int32)
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
        in_specs = [any_spec, any_spec, any_spec, any_spec]
        args = [x2, r2, p2, vals3]
        if precond:
            in_specs.append(any_spec)
            args.append(minv2)
        if is_ell:
            in_specs.append(any_spec)
            args.append(gsrc)
        if NW:
            in_specs += [any_spec] * W + [
                pl.BlockSpec(memory_space=pltpu.VMEM)]
            args += list(wstack) + [ckall]
        in_specs += [smem(), smem(), smem()]
        args += [jnp.stack([rr, rz]).astype(jnp.float32),
                 jnp.reshape(itr, (1,)).astype(jnp.int32),
                 jnp.reshape(upto, (1,)).astype(jnp.int32)]
        ebuf = ((2, ROWS * D, 128) if rolled
                else (2, ROWS // PACK, PACK * D, 128))
        scratch = [
            pltpu.VMEM((PR, 128), jnp.float32),        # p (haloed)
            pltpu.VMEM((RR, 128), jnp.float32),        # r
            pltpu.VMEM(ebuf if is_ell else (2, D, ROWS, 128),
                       jnp.float32),
        ]
        if is_ell:
            scratch.append(pltpu.VMEM(ebuf, jnp.int32))
            if rolled:
                scratch.append(pltpu.VMEM((ROWS * D, 128), jnp.float32))
        if NW:
            scratch.append(pltpu.VMEM((2, W, D, ROWS, 128), jnp.uint32))
            if use_cksum:
                scratch.append(pltpu.VMEM((W, ROWS, 128), jnp.uint32))
            if use_parity and plan.get("ci", 1) > 1:
                # Lazy parity accumulator (see the pacc refs-parse note)
                scratch.append(pltpu.VMEM((D, ROWS, 128), jnp.uint32))
            scratch.append(pltpu.SemaphoreType.DMA((2, W)))
        scratch.append(pltpu.VMEM((2, ROWS, 128), jnp.float32))  # wcb
        scratch.append(pltpu.VMEM((2, ROWS, 128), jnp.float32))  # wrb
        scratch.append(pltpu.VMEM((2, ROWS, 128), jnp.float32))  # xb
        if precond:
            scratch.append(pltpu.VMEM((2, ROWS, 128), jnp.float32))
        lazy = plan.get("ci", 1) > 1 and NW > 0
        if lazy:
            scratch.append(pltpu.SMEM((1, 1), jnp.float32))  # pw handoff
            scratch.append(pltpu.SMEM((1, 1), jnp.int32))  # trig handoff
        scratch.append(pltpu.SemaphoreType.DMA((22,)))
        from jax.experimental import pallas as _pl
        out_specs = [any_spec, any_spec, any_spec, smem(), smem(),
                     smem(), smem(), smem(), smem(), any_spec]
        out_shape = [vec, vec, vec,
                     jax.ShapeDtypeStruct((max(trace_len, 1),),
                                          jnp.float32),
                     s11i, s11f, s11f, s11i, s11i,
                     vec]                          # w HBM scratch
        if lazy:
            out_specs += [any_spec, any_spec, any_spec,
                          smem(), smem(), smem()]
            out_shape += [vec, vec, vec, s11i, s11f, s11f]
        outs = _pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(*args)
        return tuple(outs[:9]) + tuple(outs[10:])  # drop the w scratch

    return call


def make_fused_continue(mat, mode, conv_threshold, trace_rr=True,
                        interpret=False, precond=False,
                        force_streaming=False, check_interval=1):
    """``continue_(md, state, upto, minv=None)`` with solver.cg's
    contract, running the fast loop in the megakernel.  The classify /
    repair slow path (once per fault) is the jnp implementation, wrapped
    in the same outer while-loop as solver.cg._make_lazy_continue.
    ``precond=True`` builds the Jacobi variant: ``minv`` becomes a fifth
    VMEM-resident vector and the update phase runs the PCG recurrences
    (z = M^-1 r, rz = r.z) in-kernel.  Past the resident-vector VMEM
    envelope the plan switches to the streaming tier
    (_make_streaming_kernel); ``force_streaming`` pins that tier for
    tests."""
    from ..ops.spmv import make_spmv

    plan = _plan(mat, mode, precond, force_streaming, check_interval)
    if plan is None:
        raise ValueError("matrix outside the fused-kernel envelope")
    lazy = plan.get("ci", 1) > 1 and plan["NW"] > 0
    RR, G, C, W, NW = (plan[k] for k in ("RR", "G", "C", "W", "NW"))
    SW = plan["SW"]
    D, is_ell, S0, WROWS = (plan[k] for k in ("D", "kind", "S0", "WROWS"))
    PACK, Hlo, ROWS = plan["PACK"], plan["Hlo"], plan["ROWS"]
    rolled = plan.get("rolled", False)
    is_ell = is_ell == "ell"
    tail = plan.get("tail")
    # The main-layout machinery reads the split's main part; md arrives
    # as a (md_main, md_tail) pair for split matrices.
    base = mat.main if tail else mat
    if is_ell:
        from ..ecc import ECC_COL_MASK

        gather_w = base.layout.word_names.index(base.ell_gather_word)
        has_gidx = base.perm is not None
        mask_ecc = (base.ell_gather_word == "col"
                    and mode in ("sed", "sec7", "sec8", "secded"))
    jnp_impl = make_spmv(mat, jnp.float32, mode)

    def derive_tail(mdt):
        t = tail
        td3 = mdt.dense_td.reshape(t["T"], t["SR"], 128)
        tb3 = mdt.dense_tb.reshape(t["T"], t["SR"], 128)
        tw3 = tck = None
        if t["NTW"]:
            if t.get("folded"):
                stacked = mdt.fold[None, :]             # (1, E)
                ckb = mdt.fold_ck
            else:
                stacked = jnp.stack([mdt.words[i]
                                     for i in t["TSW"]])    # (TW, E)
                ckb = mdt.cksum[np.array(t["TSW"])]
            pad = t["EP"] - t["E"]
            if pad:
                # zero-padding is parity/XOR-neutral
                stacked = jnp.pad(stacked, ((0, 0), (0, pad)))
            tw3 = stacked.reshape(t["TW"], t["ER"], 128)
            tck = jnp.bitwise_xor.reduce(
                ckb.reshape(t["TW"], -1), axis=1)
        return (td3, tb3, tw3, tck)

    def derive(md):
        """Kernel-ready views of the device planes (re-derived after a
        repair, so the resumed loop streams the scrubbed data)."""
        tail_args = None
        if tail:
            md, mdt = md
            tail_args = derive_tail(mdt)
        gsrc = None
        if is_ell:
            # Row-major (RR//PACK, PACK*D, 128) streams (PACK row
            # groups per sublane-packed kernel op); gather indices
            # arrive pre-localized to each 128-lane row group's window
            # and pre-clamped — XLA does this once per solve, not the
            # kernel once per iteration.
            def pack(a):
                return (a.reshape(D, RR, 128).transpose(1, 0, 2)
                        .reshape(RR // PACK, PACK * D, 128))

            vals3 = pack(md.values)
            g = md.gidx if has_gidx else md.words[gather_w]
            if not has_gidx and mask_ecc:
                g = g & np.uint32(ECC_COL_MASK)
            rowblk = (jnp.arange(plan["R"], dtype=jnp.int32) >> 7) << 7
            local = g.astype(jnp.int32) + (S0 * 128 - rowblk)[None, :]
            local = jnp.clip(local, 0, WROWS * 128 - 1)
            if rolled:
                # Absolute-scan tier: re-base each group's window-local
                # index onto its chunk-extended row coordinate e =
                # Hlo - S0 + (group within chunk) + window row, and
                # stream flat (ROWS*D, 128) chunk planes (same bytes,
                # 2-D blocks for _absolute_window_scan).
                grp = (jnp.arange(plan["R"], dtype=jnp.int32) >> 7) % ROWS
                local = local + ((Hlo - S0 + grp) * 128)[None, :]
                gsrc = pack(local).reshape(RR * D, 128)
                vals3 = vals3.reshape(RR * D, 128)
            else:
                gsrc = pack(local)
        else:
            vals3 = md.values.reshape(D, RR, 128)
        if not NW:
            return vals3, gsrc, None, None, tail_args
        # Per-plane BITCAST views, not one stacked array: the stack's
        # concat copy miscompiles under XLA at some shapes when md.words
        # are while-loop carries (see the kernel's words_hbm note), and
        # the copy itself is ~nnz x 12 bytes of pure overhead per
        # derive.
        wstack = ((md.fold.reshape(D, RR, 128),) if plan["folded"]
                  else tuple(md.words[i].reshape(D, RR, 128) for i in SW))
        # Expected checksum classes for the in-kernel compare: stored
        # 8-row blocks fold to index (block mod 128), laid out as the
        # (row mod 8, lane block) classes the kernel accumulates, each
        # class value replicated across its 8 lanes.  Loop-invariant
        # (fresh after a scrub via the re-derive).
        base = md.fold_ck if plan["folded"] else md.cksum[np.array(SW)]
        cls = jnp.bitwise_xor.reduce(base.reshape(W, -1, 128), axis=1)
        ckall = jnp.repeat(cls.reshape(W, 8, 16), 8, axis=2)
        return vals3, gsrc, wstack, ckall, tail_args

    def continue_(md, state: CGState, upto, minv=None):
        if precond != (minv is not None):
            raise ValueError(
                "preconditioned fused solver needs minv" if precond
                else "fused solver built unpreconditioned")
        tl = state.trace.shape[0] if trace_rr else 0
        if tl > _MAX_TRACE_SMEM:
            # supports_fused() enforces this for the backend routing; a
            # caller wiring continue_fn directly (CheckpointedSolve) would
            # otherwise hit an obscure Mosaic SMEM failure at compile.
            raise ValueError(
                f"rr trace of {tl} entries exceeds the kernel's SMEM cap "
                f"({_MAX_TRACE_SMEM}); lower max_itrs or pass "
                "trace_rr=False")
        maker = (_make_streaming_kernel if plan["streaming"]
                 else _make_kernel)
        kern = maker(plan, mode, conv_threshold, tl, interpret)
        minv2 = minv.reshape(RR, 128) if precond else None

        def run_fast(md, s: CGState):
            vals3, gsrc, wstack, ckall, tail_args = derive(md)
            x2 = s.x.reshape(RR, 128)
            r2 = s.r.reshape(RR, 128)
            p2 = s.p.reshape(RR, 128)
            outs = kern(
                x2, r2, p2, minv2, vals3, gsrc, wstack, ckall,
                tail_args, s.rr, s.rz, s.itr, upto)
            (x2, r2, p2, ktrace, itr, rr, rz, trig, err) = outs[:9]
            itr = itr[0, 0]
            trace = s.trace
            if trace_rr:
                # Merge the kernel's nan-initialized trace into the
                # carried one (it only wrote slots [s.itr, itr)).
                tio = jnp.arange(tl, dtype=jnp.int32)
                win = (tio >= s.itr) & (tio < itr)
                trace = jnp.where(win, ktrace, s.trace)
            s1 = CGState(itr=itr, x=x2.reshape(-1), r=r2.reshape(-1),
                         p=p2.reshape(-1), rr=rr[0, 0], rz=rz[0, 0],
                         stats=s.stats, trace=trace)
            snap = None
            if lazy:
                xs2, rs2, ps2, its, rrs, rzs = outs[9:]
                snap = CGState(itr=its[0, 0], x=xs2.reshape(-1),
                               r=rs2.reshape(-1), p=ps2.reshape(-1),
                               rr=rrs[0, 0], rz=rzs[0, 0],
                               stats=s.stats, trace=trace)
            return s1, snap, trig[0, 0] != 0, err[0, 0]

        if NW == 0:
            # Mode none: no detection, no repair — one kernel call runs
            # the loop to convergence/limit/breakdown.
            s, _snap, _trig, err = run_fast(md, state)
            st = s.stats.merge_first(SpmvStats.clean()._replace(
                errcode=err))
            return s._replace(stats=st), md

        def outer_cond(c):
            done, *_ = c
            return ~done

        def outer_body(c):
            _, md, s, stuck = c
            s, _snap, trig, err = run_fast(md, s)

            def repair(md):
                return jnp_impl.classify(md)

            def keep(md):
                return SpmvStats.clean(), md

            md_in = md
            st1, md = jax.lax.cond(trig, repair, keep, md)
            # Livelock guard (cg._phantom_guard — the predicate lives
            # in ONE place): a trigger classify can't attribute gets
            # ONE retry; a second consecutive one fail-stops with
            # ERR_PHANTOM.  A repair that changed the checksum
            # baseline (correction scrub OR a benign constraints
            # adoption) counts as consumed, not unproductive.
            st1, stuck = _phantom_guard(
                trig, st1, _baseline_changed(md_in, md), stuck)
            st = s.stats.merge_first(SpmvStats.clean()._replace(
                errcode=err)).merge_first(st1)
            s = s._replace(stats=st)
            done = (~trig) | (st.errcode != 0)
            return (done, md, s, stuck)

        def outer_body_lazy(c):
            # Trigger/rollback resolution shared with the solver-level
            # lazy tier (cg._lazy_exit_resolve — the predicate lives in
            # ONE place).  The megakernel closes the exit window ITSELF
            # (an in-kernel signals-only word-plane pass folds any
            # unverified-tail trigger into ``trig``), so the resolve's
            # verify is a no-op here — the jnp verify it replaces
            # measured ~6.3 ms per solve at -b 100.
            _, md, s, stuck = c
            s1, snap, trig, err = run_fast(md, s)
            done, md, s2, stuck = _lazy_exit_resolve(
                md, s1, snap, trig, err,
                lambda md, p: jnp.bool_(False),
                jnp_impl.classify, stuck)
            return (done, md, s2, stuck)

        _, md_out, s, _ = jax.lax.while_loop(
            outer_cond, outer_body_lazy if lazy else outer_body,
            (jnp.bool_(False), md, state, jnp.int32(0)))
        return s, md_out

    return continue_


def make_fused_solver(mat, mode, max_itrs: int, conv_threshold: float,
                      trace_rr: bool = True, interpret: bool = False,
                      precond: bool = False, force_streaming: bool = False,
                      check_interval: int = 1):
    """``solve(md, b, minv=None) -> CGResult`` on the megakernel.
    ``minv`` must match ``precond`` (None unless the Jacobi variant was
    requested).  ``check_interval`` > 1 selects the lazy detection
    schedule (see _plan)."""
    cont = make_fused_continue(mat, mode, conv_threshold, trace_rr,
                               interpret, precond, force_streaming,
                               check_interval)

    def solve(md, b, minv=None):
        s, md_out = cont(md, init_state(b, max_itrs, trace_rr, minv),
                         jnp.int32(max_itrs), minv)
        return CGResult(x=s.x, iterations=s.itr, rr=s.rr, stats=s.stats,
                        rr_trace=s.trace, md=md_out)

    return solve
