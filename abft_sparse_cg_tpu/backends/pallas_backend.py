"""The `pallas` target: hand-written TPU kernels for the hot path.

Same Backend contract as the jnp target; the SpMV comes from
ops.spmv_pallas (fused fast path) with the jnp implementation as the
rare-fault slow path.  On non-TPU platforms the kernels run through the
Pallas interpreter (slow — used by tests only).
"""

from __future__ import annotations

from ..ops.spmv_pallas import make_pallas_spmv
from ..solver.cg import make_cg_solver
from . import registry
from .jnp_backend import JnpBackend, _SOLVER_CACHE

__all__ = ["PallasBackend"]


def _check_interval(variant="standard", mat=None, mode=None,
                    auto_default=1):
    """The lazy detection schedule's interval from ABFT_CHECK_INTERVAL
    (the CLI's --check-interval sets it for the invocation), validated.
    The pipelined solver has no lazy variant — its recurrences carry
    extra vectors a rollback would have to re-seed — so it warns and
    runs the live schedule.

    ``auto`` resolves to the measured per-tier winner (fold-era tables,
    BENCH_NOTES.md): LIVE (1) on the VMEM-resident megakernel tier —
    where the fold plane already puts live secded inside the <10%
    overhead bar and lazy8 measured WORSE (+19.4% vs +8.7% at -b 10) —
    and ci32 everywhere the word/fold streams ride HBM per iteration
    (streaming megakernel: live +30.6% vs ci32 +3.4% at -b 100;
    per-iteration and shard_map tiers share that traffic shape).
    Needs ``mat``/``mode`` to probe the tier; without them (or off the
    pallas kernel tiers entirely) auto falls back to live."""
    import os
    import sys

    raw = os.environ.get("ABFT_CHECK_INTERVAL", "1") or "1"
    if raw == "auto":
        if variant != "standard":
            return 1
        if mat is None or mode is None:
            return auto_default
        from ..solver.fused import _plan

        p = _plan(mat, mode, check_interval=1)
        if p is not None and not p["streaming"]:
            return 1
        return 32
    try:
        ci = max(1, int(raw))
    except ValueError:
        raise ValueError(
            f"ABFT_CHECK_INTERVAL must be an integer or 'auto', "
            f"got {raw!r}")
    if ci > 1 and variant == "pipelined":
        print("warning: --check-interval has no pipelined-solver "
              "variant; running the live detection schedule",
              file=sys.stderr)
        return 1
    return ci


class PallasBackend(JnpBackend):
    target = "pallas"
    # The pallas target DOES have lazy --check-interval tiers; the
    # live-schedule warning only fires when a layout falls back through
    # super()._get_solver to the GSPMD jnp route, so name that route.
    live_route_label = "pallas (GSPMD jnp fallback route)"

    def _get_solver(self, mat, dtype, max_itrs, conv, r_dev=None,
                    variant="standard", mesh=None):
        import jax

        if r_dev is not None:
            # Mesh-sharded solve (--devices N): a Pallas custom call has
            # no SPMD partitioning rule, so the kernels run per shard
            # under shard_map with an explicit ±band halo exchange
            # (parallel.sharded_kernel) when the layout fits that
            # envelope — incl. split composites (kernel main part +
            # GSPMD flat tail); anything else (flat layouts, unaligned
            # shards) rides the GSPMD jnp program, which XLA shards
            # properly.
            from ..parallel.sharded_kernel import (
                make_shardmap_spmv,
                supports_shardmap,
            )

            import os

            # Same platform policy as the single-device tier: compiled
            # kernels on TPU; on CPU the interpreter is orders of
            # magnitude too slow for real solves, so fall back to GSPMD
            # jnp unless the env knob forces interpret mode (tests /
            # the multichip dryrun on the virtual mesh).
            on_tpu = jax.devices()[0].platform != "cpu"
            want_sm = on_tpu or bool(os.environ.get("ABFT_SM_INTERPRET"))
            ndev = mesh.devices.size if mesh is not None else 0
            if (want_sm and variant == "standard" and mesh is not None
                    and r_dev == mat.R
                    and supports_shardmap(mat, dtype, ndev)):
                ci = _check_interval(variant, auto_default=32)
                sm_tail_plan = (getattr(mat.tail, "dense_plan", None)
                                if mat.exec_kind == "split" else None)
                key = ("smsolve", mat.fmt, self.mode, mat.exec_kind,
                       mat.dia_offsets, mat.R, mat.K, mat.N, mat.nnz,
                       mat.band, mat.perm is not None, sm_tail_plan,
                       str(dtype), max_itrs, float(conv), ndev, ci)
                if key not in _SOLVER_CACHE:
                    spmv = make_shardmap_spmv(mat, mesh, dtype, self.mode)
                    if ci > 1 and spmv.classify is not None:
                        # Lazy --check-interval on the shard_map tier:
                        # unchecked iterations run the detection-free
                        # per-shard kernels (solver.cg lazy loop with
                        # snapshot rollback).
                        from ..solver.cg import make_lazy_ci_solver

                        product = make_shardmap_spmv(mat, mesh, dtype,
                                                     self.mode,
                                                     detect=False)
                        solver = make_lazy_ci_solver(spmv, product, ci,
                                                     max_itrs, conv)
                    else:
                        solver = make_cg_solver(spmv, max_itrs, conv)
                    _SOLVER_CACHE[key] = jax.jit(solver)
                return _SOLVER_CACHE[key]
            return super()._get_solver(mat, dtype, max_itrs, conv, r_dev,
                                       variant)
        # band + permutation presence shape the ELL kernel (window size,
        # gather-index source), and a bordered tail's dense_plan statics
        # are baked into the megakernel — same-shaped matrices must not
        # collide.
        import os

        tail_plan = (getattr(mat.tail, "dense_plan", None)
                     if mat.exec_kind == "split" else None)
        # Lazy detection schedule (solver.fused plan docstring): stream
        # the word planes every CI-th iteration, snapshot-rollback on a
        # trigger.  CLI --check-interval sets the env var.
        ci = _check_interval(variant, mat, self.mode)
        # The A/B + interpret knobs change which kernel _plan builds, so
        # they are part of the key — flipping them in-process must not
        # return a solver compiled under the old setting.  The
        # big-offset gate (env override + validation marker) routes
        # between the shifted_big megakernel and the per-iteration
        # tier, so its effective state is a knob too.
        from ..solver.fused import bigoffset_validated

        knobs = (bool(os.environ.get("ABFT_FUSED_ABS_SCAN")),
                 bool(os.environ.get("ABFT_FUSED_INTERPRET")),
                 os.environ.get("ABFT_FUSED_BIG_OFFSET"),
                 # fold-vs-per-word live detection (ecc.fold A/B knob)
                 os.environ.get("ABFT_LIVE_FOLD", "1") != "0",
                 bigoffset_validated())
        key = ("psolve", variant, mat.fmt, self.mode, mat.exec_kind,
               mat.dia_offsets, mat.R, mat.K, mat.N, mat.nnz, mat.band,
               mat.perm is not None, tail_plan, str(dtype), max_itrs,
               float(conv), ci, knobs)
        if key not in _SOLVER_CACHE:
            spmv = make_pallas_spmv(mat, dtype, self.mode)
            if variant == "pipelined":
                from ..solver.pipelined import make_pipelined_solver

                solver = make_pipelined_solver(spmv, max_itrs, conv)
            else:
                solver = make_cg_solver(spmv, max_itrs, conv)
                from ..solver.fused import make_fused_solver, supports_fused

                on_tpu = jax.devices()[0].platform != "cpu"
                # ABFT_FUSED_INTERPRET=1 routes the megakernel through
                # the Pallas interpreter off-TPU — far too slow for real
                # solves, but it lets tests drive the full CLI/backend
                # wiring (incl. --check-interval) without hardware.
                want_fused = on_tpu or bool(
                    os.environ.get("ABFT_FUSED_INTERPRET"))
                if want_fused and supports_fused(mat, dtype, self.mode,
                                                 max_itrs,
                                                 check_interval=ci):
                    # Whole-solve megakernel (solver.fused): VMEM-resident
                    # CG vectors + live per-iteration detection.  Jacobi
                    # solves get the precond kernel variant when it fits
                    # (M^-1 is a fifth resident vector); anything else
                    # keeps the per-iteration tier.
                    fused = make_fused_solver(mat, self.mode, max_itrs,
                                              conv, check_interval=ci,
                                              interpret=not on_tpu)
                    fused_p = None
                    if supports_fused(mat, dtype, self.mode, max_itrs,
                                      precond=True, check_interval=ci):
                        fused_p = make_fused_solver(
                            mat, self.mode, max_itrs, conv, precond=True,
                            check_interval=ci, interpret=not on_tpu)
                    periter = solver

                    def solver(md, b, minv=None, _f=fused, _fp=fused_p,
                               _p=periter):
                        if minv is None:
                            return _f(md, b)
                        if _fp is not None:
                            return _fp(md, b, minv)
                        return _p(md, b, minv)
                elif (want_fused and ci > 1
                        and spmv.classify is not None):
                    # Outside the megakernel envelope, the lazy
                    # --check-interval schedule still applies at the
                    # solver level: unchecked iterations run the
                    # detection-free per-iteration kernel
                    # (make_pallas_product), with snapshot rollback on
                    # trigger (solver.cg.make_lazy_ci_continue).
                    from ..ops.spmv_pallas import make_pallas_product
                    from ..solver.cg import make_lazy_ci_solver

                    product = make_pallas_product(
                        mat, dtype, self.mode, interpret=not on_tpu)
                    if product is not None:
                        solver = make_lazy_ci_solver(spmv, product, ci,
                                                     max_itrs, conv)
            _SOLVER_CACHE[key] = jax.jit(solver)
        return _SOLVER_CACHE[key]

    def _checkpoint_continue(self, mat, dtype, max_itrs, conv, variant,
                             mesh, precond=False):
        """Segment function for ``--checkpoint`` on the pallas target —
        the same tier routing as _get_solver: megakernel continue when
        the matrix fits its envelope, the lazy --check-interval loop
        when K > 1, per-iteration kernels otherwise; per-shard shard_map
        kernels on a mesh (GSPMD jnp past that envelope)."""
        import os

        import jax

        if variant != "standard":
            return super()._checkpoint_continue(mat, dtype, max_itrs,
                                                conv, variant, mesh,
                                                precond)
        from ..solver.cg import make_cg_continue, make_lazy_ci_continue

        on_tpu = jax.devices()[0].platform != "cpu"
        ci = _check_interval(variant, auto_default=32)
        if mesh is None:
            ci = _check_interval(variant, mat, self.mode)
        if mesh is not None:
            from ..parallel.sharded_kernel import (
                make_shardmap_spmv,
                supports_shardmap,
            )

            want_sm = on_tpu or bool(os.environ.get("ABFT_SM_INTERPRET"))
            ndev = mesh.devices.size
            if want_sm and supports_shardmap(mat, dtype, ndev):
                spmv = make_shardmap_spmv(mat, mesh, dtype, self.mode)
                if ci > 1 and spmv.classify is not None:
                    product = make_shardmap_spmv(mat, mesh, dtype,
                                                 self.mode, detect=False)
                    return make_lazy_ci_continue(spmv, product, ci, conv)
                return make_cg_continue(spmv, conv)
            return super()._checkpoint_continue(mat, dtype, max_itrs,
                                                conv, variant, mesh,
                                                precond)
        from ..solver.fused import make_fused_continue, supports_fused

        want_fused = on_tpu or bool(os.environ.get("ABFT_FUSED_INTERPRET"))
        if want_fused and supports_fused(mat, dtype, self.mode, max_itrs,
                                         precond=precond,
                                         check_interval=ci):
            return make_fused_continue(mat, self.mode, conv,
                                       precond=precond, check_interval=ci,
                                       interpret=not on_tpu)
        spmv = make_pallas_spmv(mat, dtype, self.mode)
        if want_fused and ci > 1 and spmv.classify is not None:
            from ..ops.spmv_pallas import make_pallas_product

            product = make_pallas_product(mat, dtype, self.mode,
                                          interpret=not on_tpu)
            if product is not None:
                return make_lazy_ci_continue(spmv, product, ci, conv)
        return make_cg_continue(spmv, conv)

    def _get_spmv(self, mat, dtype):
        import jax

        tail_plan = (getattr(mat.tail, "dense_plan", None)
                     if mat.exec_kind == "split" else None)
        key = ("pspmv", mat.fmt, self.mode, mat.exec_kind, mat.dia_offsets,
               mat.R, mat.K, mat.N, mat.nnz, mat.band, mat.perm is not None,
               tail_plan, str(dtype))
        if key not in _SOLVER_CACHE:
            impl = make_pallas_spmv(mat, dtype, self.mode)
            _SOLVER_CACHE[key] = jax.jit(impl.full)
        return _SOLVER_CACHE[key]


def _register():
    from ..ecc.codec import MODES

    for mode in MODES:
        registry.register("pallas", mode, lambda m=mode: PallasBackend(m))


_register()
