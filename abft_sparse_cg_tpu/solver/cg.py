"""The CG iteration as one jitted ``lax.while_loop``.

The reference's loop (reference cg.cpp:93-118) round-trips four scalars
(rr, pw, alpha, beta) through the host every iteration; here the whole
solve — SpMV with fused ABFT, both reductions, the AXPYs, convergence
*and* fail-stop tests — is a single device program.  The reference's
``exit(1)``-from-inside-SpMV becomes an error code in the loop carry that
flips the loop condition; the caller (CLI) maps it to the reference's
exact stdout strings and exit status.

Per-iteration residual printing (reference cg.cpp:117) is NOT done with
host callbacks — the axon TPU runtime does not support them, and a
callback per iteration through a remote-device tunnel would dominate the
solve anyway.  Instead the loop carries an ``rr_trace`` array and the
caller prints the identical lines post-hoc (same text, same count).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.blas1 import calc_p, calc_xr, dot
from ..ops.spmv import SpmvStats

__all__ = ["CGResult", "make_cg_solver"]


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray   # completed iterations
    rr: jnp.ndarray           # final squared residual norm
    stats: SpmvStats          # accumulated ABFT stats (first events kept)
    rr_trace: jnp.ndarray     # (max_itrs,) rr after each iteration (nan-padded)


def make_cg_solver(spmv, max_itrs: int, conv_threshold: float,
                   trace_rr: bool = True):
    """Build ``solve(words, ell_len, b) -> CGResult`` around a spmv fn.

    ``spmv(words, ell_len, v) -> (A@v, SpmvStats)`` is any implementation
    built by ``ops.spmv.make_spmv`` (jnp), the Pallas kernels, or a
    sharded wrapper — the solver is target-agnostic.
    """

    def solve(words, ell_len, b):
        dtype = b.dtype
        conv = jnp.asarray(conv_threshold, dtype)
        x0 = jnp.zeros_like(b)
        # x0 = 0  =>  r = b - A@x0 = b ; p = r  (reference cg.cpp:85-88).
        r0 = b
        p0 = b
        rr0 = dot(r0, r0)
        trace_len = min(max_itrs, 100_000) if trace_rr else 1
        trace0 = jnp.full((trace_len,), jnp.nan, dtype)

        state0 = (jnp.int32(0), x0, r0, p0, rr0, SpmvStats.clean(), trace0)

        def cond(s):
            itr, _, _, _, rr, st, _ = s
            return (itr < max_itrs) & (rr > conv) & (st.errcode == 0)

        def body(s):
            itr, x, r, p, rr, st, trace = s
            w, st1 = spmv(words, ell_len, p)
            st = st.merge_first(st1)
            ok = st1.errcode == 0

            pw = dot(p, w)
            alpha = rr / pw
            x1, r1, rr_new = calc_xr(x, r, p, w, alpha)
            beta = rr_new / rr
            p1 = calc_p(p, r1, beta)

            # On an ABFT fail-stop the reference dies mid-SpMV; the state
            # update below is discarded to match (cosmetic — the caller
            # aborts anyway).
            x = jnp.where(ok, x1, x)
            r = jnp.where(ok, r1, r)
            p = jnp.where(ok, p1, p)
            rr = jnp.where(ok, rr_new, rr)
            if trace_rr:
                trace = trace.at[itr].set(jnp.where(ok, rr, trace[itr]))

            itr = jnp.where(ok, itr + 1, itr)
            return (itr, x, r, p, rr, st, trace)

        itr, x, r, p, rr, st, trace = jax.lax.while_loop(cond, body, state0)
        return CGResult(x=x, iterations=itr, rr=rr, stats=st, rr_trace=trace)

    return solve
