"""Pipelined CG (Ghysels & Vanroose) — one reduction point per iteration.

Standard CG (solver/cg.py, the reference algorithm cg.cpp:93-118) has two
*sequential* reduction points per iteration: alpha needs dot(p, w) before
the vector updates, and beta needs the updated dot(r, r).  On a device
mesh each reduction is a psum riding ICI, so the two latencies serialize.
This variant restructures the recurrences so BOTH scalars of an iteration
come from one fused reduction pass over the *current* state:

    gamma = (r, r);  delta = (w, r)          # one pass, one (tuple) psum
    n = A w                                   # the only SpMV
    beta  = gamma / gamma_old                 (0 on the first iteration)
    alpha = gamma / (delta - beta * gamma / alpha_old)
    s = w + beta s ; z = n + beta z ; p = r + beta p
    x += alpha p ; r -= alpha s ; w -= alpha z

with the invariants s = A p, z = A s, w = A r.  In exact arithmetic the
iterates equal standard CG's; in floating point the recurred A-products
drift slowly (the classical pipelined-CG trade-off), so this solver is
an opt-in (`--solver pipelined`) for latency-bound / multi-chip runs.

ABFT integration mirrors the standard lazy loop: the SpMV is the fast
detection kernel; a trigger discards the iteration, classifies/scrubs
once, then **restarts the recurrences** (w recomputed from the scrubbed
matrix, s/z/p reset) — recurred products derived from corrupt data must
not survive the repair.  Fail-stop modes end the loop through the same
errcode channel; ERR_BREAKDOWN guards the alpha denominator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.blas1 import dot
from ..ops.spmv import ERR_BREAKDOWN, SpmvImpl, SpmvStats
from .cg import CGResult, _MAX_TRACE

__all__ = ["make_pipelined_solver"]


def make_pipelined_solver(impl: SpmvImpl, max_itrs: int,
                          conv_threshold: float, trace_rr: bool = True):
    """Build ``solve(md, b, minv=None) -> CGResult`` (minv unsupported)."""
    lazy = impl.classify is not None

    def spmv(md, w_in):
        if lazy:
            n, trig = impl.fast(md, w_in)
            return n, trig, SpmvStats.clean()
        n, st = impl.full(md, w_in)
        return n, st.errcode != 0, st

    def solve(md, b, minv=None):
        if minv is not None:
            raise ValueError(
                "the pipelined solver is unpreconditioned; use the "
                "standard solver for -p jacobi"
            )
        conv = jnp.asarray(conv_threshold, b.dtype)
        trace_len = min(max_itrs, _MAX_TRACE) if trace_rr else 1

        one = jnp.asarray(1.0, b.dtype)

        def init(md, itr, x, r, stats):
            """(Re)start the recurrences at the current iterate."""
            w, trig, st = spmv(md, r)
            z = jnp.zeros_like(r)
            return {
                "itr": itr, "x": x, "r": r, "w": w,
                "s": z, "z": z, "p": z,
                "g_old": one, "a_old": one,
                "restart": jnp.bool_(True),
                "halt": jnp.bool_(False),
                "stats": stats.merge_first(st),
                "trig": trig,
            }

        def body(carry):
            md, st_, trace = carry
            s_ = dict(st_)
            gamma = dot(s_["r"], s_["r"])
            delta = dot(s_["w"], s_["r"])
            n, trig, st1 = spmv(md, s_["w"])
            stats = s_["stats"].merge_first(st1)

            beta = jnp.where(s_["restart"], jnp.zeros_like(gamma),
                             gamma / s_["g_old"])
            denom = delta - beta * gamma / s_["a_old"]
            alpha = gamma / denom

            converged = gamma <= conv
            live = ~converged & ~trig & (stats.errcode == 0)
            bad = live & ((denom <= 0) | ~jnp.isfinite(gamma))
            stats = stats.merge_first(SpmvStats.clean()._replace(
                errcode=jnp.where(bad, jnp.int32(ERR_BREAKDOWN),
                                  jnp.int32(0))))
            ok = live & ~bad

            s1 = s_["w"] + beta * s_["s"]
            z1 = n + beta * s_["z"]
            p1 = s_["r"] + beta * s_["p"]
            x1 = s_["x"] + alpha * p1
            r1 = s_["r"] - alpha * s1
            w1 = s_["w"] - alpha * z1

            if trace_rr:
                # gamma is the PREVIOUS update's ||r||^2 — record it.
                prev = jnp.maximum(s_["itr"] - 1, 0)
                trace = trace.at[prev].set(
                    jnp.where(s_["itr"] > 0, gamma, trace[prev]))

            def sel(a, b_):
                return jnp.where(ok, a, b_)

            s_.update(
                itr=jnp.where(ok, s_["itr"] + 1, s_["itr"]),
                x=sel(x1, s_["x"]), r=sel(r1, s_["r"]), w=sel(w1, s_["w"]),
                s=sel(s1, s_["s"]), z=sel(z1, s_["z"]), p=sel(p1, s_["p"]),
                g_old=jnp.where(ok, gamma, s_["g_old"]),
                a_old=jnp.where(ok, alpha, s_["a_old"]),
                restart=s_["restart"] & ~ok,
                halt=converged,
                stats=stats,
                trig=trig,
            )
            return md, s_, trace

        def cond(carry):
            _, s_, _ = carry
            return ((s_["itr"] < max_itrs) & ~s_["halt"]
                    & (s_["stats"].errcode == 0) & ~s_["trig"])

        def inner(md, state, trace):
            _, state, trace = jax.lax.while_loop(cond, body,
                                                 (md, state, trace))
            return state, trace

        x0 = jnp.zeros_like(b)
        state = init(md, jnp.int32(0), x0, b, SpmvStats.clean())
        trace = jnp.full((trace_len,), jnp.nan, b.dtype)

        if lazy:
            def outer_cond(c):
                done, *_ = c
                return ~done

            def outer_body(c):
                _, md, state, trace = c
                state, trace = inner(md, state, trace)
                trig = state["trig"]

                def repair(args):
                    md, st = args
                    st1, md2 = impl.classify(md)
                    return md2, st.merge_first(st1)

                def keep(args):
                    return args

                md2, stats = jax.lax.cond(trig, repair, keep,
                                          (md, state["stats"]))

                # Restart the recurrences on the scrubbed matrix:
                # recurred products derived from corrupt data must not
                # survive the repair.
                def restarted(_):
                    return init(md2, state["itr"], state["x"], state["r"],
                                stats)

                def kept(_):
                    return dict(state, stats=stats, trig=jnp.bool_(False))

                state2 = jax.lax.cond(trig & (stats.errcode == 0),
                                      restarted, kept, None)
                done = (~trig) | (stats.errcode != 0)
                return done, md2, state2, trace

            _, md, state, trace = jax.lax.while_loop(
                outer_cond, outer_body,
                (jnp.bool_(False), md, state, trace))
        else:
            state, trace = inner(md, state, trace)

        itr, x, r = state["itr"], state["x"], state["r"]
        rr = dot(r, r)
        if trace_rr:
            prev = jnp.maximum(itr - 1, 0)
            trace = trace.at[prev].set(jnp.where(itr > 0, rr, trace[prev]))
        return CGResult(x=x, iterations=itr, rr=rr, stats=state["stats"],
                        rr_trace=trace, md=md)

    return solve
