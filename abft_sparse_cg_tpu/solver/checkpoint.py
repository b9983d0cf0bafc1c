"""Checkpoint / resume for long solves.

The reference has no checkpointing (solves run in seconds; SURVEY §5),
but a production framework needs it: the solver core is already
segmented (`make_cg_continue` advances to a runtime iteration bound), so
a checkpoint is just the ``CGState`` snapshot — (x, r, p, rr, itr), the
accumulated ABFT stats and the residual trace — written with NumPy
(``.npz``; no new dependencies, readable anywhere).

Usage:

    runner = CheckpointedSolve(impl, conv=1e-3, every=100, path="ckpt.npz")
    result = runner.run(md, b, max_itrs=10_000)      # saves every 100 its
    result = runner.run(md, b, max_itrs=10_000, resume=True)
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.spmv import SpmvStats
from .cg import CGResult, CGState, init_state, make_cg_continue

__all__ = ["save_state", "load_state", "CheckpointedSolve"]

_FIELDS = ("itr", "x", "r", "p", "rr", "rz", "trace")
_STAT_FIELDS = SpmvStats._fields


def save_state(path: str, state: CGState):
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    for f in _STAT_FIELDS:
        arrays[f"stats_{f}"] = np.asarray(getattr(state.stats, f))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_state(path: str, dtype=None) -> CGState:
    import jax.numpy as jnp

    with np.load(path) as z:
        stats = SpmvStats(**{
            f: jnp.asarray(z[f"stats_{f}"]) for f in _STAT_FIELDS
        })
        cast = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
        return CGState(
            itr=jnp.asarray(z["itr"]),
            x=cast(z["x"]),
            r=cast(z["r"]),
            p=cast(z["p"]),
            rr=cast(z["rr"]),
            rz=cast(z["rz"]),
            stats=stats,
            trace=cast(z["trace"]),
        )


class CheckpointedSolve:
    """Drive a solve in segments, snapshotting state between them."""

    def __init__(self, impl, conv_threshold: float, every: int,
                 path: str, trace_rr: bool = True, continue_fn=None):
        """``continue_fn`` overrides the solver loop: any callable with
        the ``make_cg_continue`` contract ``(md, state, upto, minv) ->
        (state, md)`` — e.g. ``solver.fused.make_fused_continue`` to
        checkpoint the whole-solve megakernel (``impl`` may be None
        then)."""
        import jax

        self.every = int(every)
        self.path = path
        self.trace_rr = trace_rr
        if continue_fn is None:
            continue_fn = make_cg_continue(impl, conv_threshold, trace_rr)
        self._cont = jax.jit(continue_fn)

    def run(self, md, b, max_itrs: int, resume: bool = False,
            minv=None) -> CGResult:
        import jax.numpy as jnp

        if resume and os.path.exists(self.path):
            state = load_state(self.path, dtype=b.dtype)
        else:
            state = init_state(b, max_itrs, self.trace_rr, minv)

        while True:
            itr = int(state.itr)
            if itr >= max_itrs or int(state.stats.errcode) != 0:
                break
            upto = min(itr + self.every, max_itrs)
            # The returned md carries any scrub forward, so a persistent
            # fault classifies exactly once per solve (not per segment)
            # and corrected_count stays exact.
            state, md = self._cont(md, state, jnp.int32(upto), minv)
            new_itr = int(state.itr)  # forces sync; segment finished
            save_state(self.path, state)
            if new_itr < upto or int(state.stats.errcode) != 0:
                break  # converged or fail-stopped mid-segment

        return CGResult(x=state.x, iterations=state.itr, rr=state.rr,
                        stats=state.stats, rr_trace=state.trace, md=md)
