"""The CG iteration as one jitted program — detect fast, repair rarely.

The reference's loop (reference cg.cpp:93-118) round-trips four scalars
through the host every iteration and runs the full per-element ECC check
inside every SpMV; here the whole solve is a single device program with a
two-level structure for the ECC modes:

  outer while (not done):
    inner while (itr < max && rr > conv && no trigger):
        w, trigger = fast_spmv(md, p)       # raw values + cheap signals
        ... CG update (gated on !trigger) ...
    if trigger:   # rare: a fault was detected somewhere in the matrix
        classify(md) -> stats (+ fail-stop code), scrubbed planes
        resume the fast loop on the scrubbed matrix (the reference's
        write-back semantics, done functionally, once per fault)

The iteration that saw the trigger is *re-executed* after the repair, so
the iterates never consume corrupted values — the exact behaviour of the
reference, which corrects mid-SpMV before using the element.  Fail-stop
conditions (sed detection, secded double-bit) become a nonzero error code
that ends the outer loop; the caller maps it to the reference's stdout
strings and exit(1).

Modes without a lazy schedule (none, constraints) use a single plain
loop around the full-check SpMV.

Per-iteration residual printing (reference cg.cpp:117) is reproduced by
carrying an rr trace and printing post-hoc — the axon TPU runtime has no
host callbacks, and one callback per iteration through a remote-device
tunnel would dominate the solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.blas1 import calc_p, calc_xr, dot
from ..ops.spmv import SpmvImpl, SpmvStats

__all__ = ["CGResult", "make_cg_solver"]

_MAX_TRACE = 100_000


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray   # completed iterations
    rr: jnp.ndarray           # final squared residual norm
    stats: SpmvStats          # accumulated ABFT stats (first events kept)
    rr_trace: jnp.ndarray     # (max_itrs,) rr after each iteration (nan-padded)


def _iterate(x, r, p, rr, w):
    pw = dot(p, w)
    alpha = rr / pw
    x1, r1, rr_new = calc_xr(x, r, p, w, alpha)
    beta = rr_new / rr
    p1 = calc_p(p, r1, beta)
    return x1, r1, p1, rr_new


def make_cg_solver(impl: SpmvImpl, max_itrs: int, conv_threshold: float,
                   trace_rr: bool = True):
    """Build ``solve(md, b) -> CGResult`` around a SpmvImpl."""
    if impl.classify is None:
        return _make_simple_solver(impl.full, max_itrs, conv_threshold, trace_rr)
    return _make_lazy_solver(impl, max_itrs, conv_threshold, trace_rr)


def _init(b, max_itrs, trace_rr):
    dtype = b.dtype
    x0 = jnp.zeros_like(b)
    # x0 = 0  =>  r = b - A@x0 = b ; p = r  (reference cg.cpp:85-88).
    rr0 = dot(b, b)
    trace_len = min(max_itrs, _MAX_TRACE) if trace_rr else 1
    trace0 = jnp.full((trace_len,), jnp.nan, dtype)
    return x0, b, b, rr0, trace0


def _make_simple_solver(spmv_full, max_itrs, conv_threshold, trace_rr):
    def solve(md, b):
        conv = jnp.asarray(conv_threshold, b.dtype)
        x0, r0, p0, rr0, trace0 = _init(b, max_itrs, trace_rr)
        state0 = (jnp.int32(0), x0, r0, p0, rr0, SpmvStats.clean(), trace0)

        def cond(s):
            itr, _, _, _, rr, st, _ = s
            return (itr < max_itrs) & (rr > conv) & (st.errcode == 0)

        def body(s):
            itr, x, r, p, rr, st, trace = s
            w, st1 = spmv_full(md, p)
            st = st.merge_first(st1)
            ok = st1.errcode == 0
            x1, r1, p1, rr1 = _iterate(x, r, p, rr, w)
            # On fail-stop the reference dies mid-SpMV; discard the update.
            x = jnp.where(ok, x1, x)
            r = jnp.where(ok, r1, r)
            p = jnp.where(ok, p1, p)
            rr = jnp.where(ok, rr1, rr)
            if trace_rr:
                trace = trace.at[itr].set(jnp.where(ok, rr, trace[itr]))
            itr = jnp.where(ok, itr + 1, itr)
            return (itr, x, r, p, rr, st, trace)

        itr, x, r, p, rr, st, trace = jax.lax.while_loop(cond, body, state0)
        return CGResult(x=x, iterations=itr, rr=rr, stats=st, rr_trace=trace)

    return solve


def _make_lazy_solver(impl, max_itrs, conv_threshold, trace_rr):
    def solve(md, b):
        conv = jnp.asarray(conv_threshold, b.dtype)
        x0, r0, p0, rr0, trace0 = _init(b, max_itrs, trace_rr)

        def inner(md, state):
            (itr, x, r, p, rr, trace) = state
            s0 = (itr, x, r, p, rr, trace, jnp.bool_(False))

            def cond(s):
                itr, _, _, _, rr, _, trig = s
                return (itr < max_itrs) & (rr > conv) & (~trig)

            def body(s):
                itr, x, r, p, rr, trace, _ = s
                w, trig = impl.fast(md, p)
                ok = ~trig
                x1, r1, p1, rr1 = _iterate(x, r, p, rr, w)
                # A triggered iteration is re-executed after the repair,
                # so its (corrupt-value) update is discarded.
                x = jnp.where(ok, x1, x)
                r = jnp.where(ok, r1, r)
                p = jnp.where(ok, p1, p)
                rr = jnp.where(ok, rr1, rr)
                if trace_rr:
                    trace = trace.at[itr].set(jnp.where(ok, rr, trace[itr]))
                itr = jnp.where(ok, itr + 1, itr)
                return (itr, x, r, p, rr, trace, trig)

            *state, trig = jax.lax.while_loop(cond, body, s0)
            return tuple(state), trig

        def outer_cond(s):
            done, *_ = s
            return ~done

        def outer_body(s):
            _, md, st, state = s
            state, trig = inner(md, state)

            def repair(md, st):
                st1, md2 = impl.classify(md)
                return md2, st.merge_first(st1)

            def keep(md, st):
                return md, st

            md, st = jax.lax.cond(trig, repair, keep, md, st)
            done = (~trig) | (st.errcode != 0)
            return (done, md, st, state)

        state0 = (jnp.int32(0), x0, r0, p0, rr0, trace0)
        s = (jnp.bool_(False), md, SpmvStats.clean(), state0)
        _, md_out, st, (itr, x, r, p, rr, trace) = jax.lax.while_loop(
            outer_cond, outer_body, s
        )
        return CGResult(x=x, iterations=itr, rr=rr, stats=st, rr_trace=trace)

    return solve
