"""TPU smoke test body: compiled Pallas kernels, clean + injected solves.

Run directly on a TPU host (`python scripts/tpu_smoke.py`), or via
`ABFT_TPU_SMOKE=1 pytest tests/test_tpu.py` / `make test-tpu`.
Exercises, per execution layout (DIA stencil, banded ELL, RCM-permuted
banded ELL):

  - a clean pallas-target solve (no trigger, converges),
  - an injected single-bit fault (sec modes correct it; the solution
    matches the clean solve exactly),
  - an injected fault under sed (detects, fail-stops),
  - the f32 hardware residual trajectory against a float64 host oracle
    CG: same iteration count to the convergence threshold and
    per-iteration rr agreement (the BASELINE.md trajectory target,
    proven on the TPU itself rather than only at f64 on CPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from abft_sparse_cg_tpu.backends import create
    from abft_sparse_cg_tpu.formats import assemble, build_protected
    from abft_sparse_cg_tpu.inject import inject_bitflips
    from abft_sparse_cg_tpu.ops.spmv_pallas import supports
    from abft_sparse_cg_tpu.utils.matgen import (
        shuffle_labels,
        spd_tridiagonal,
    )
    from abft_sparse_cg_tpu.utils.platform import warm_device

    platform = jax.devices()[0].platform
    assert platform != "cpu", f"not a TPU host (platform={platform})"
    print(f"device: {jax.devices()[0]}", flush=True)
    warm_device()

    import jax.numpy as jnp

    def bordered_assembled():
        rows, cols, vals, n = spd_tridiagonal(4096)
        rows, cols, vals = list(rows), list(cols), list(vals)
        rng = np.random.default_rng(3)
        for r in (100, 2222):
            for c in rng.choice(n, size=400, replace=False):
                hi, lo = max(r, int(c)), min(r, int(c))
                if hi != lo:
                    rows.append(hi)
                    cols.append(lo)
                    vals.append(-0.01)
        rows, cols = np.array(rows), np.array(cols)
        vals = np.array(vals, dtype=float)
        deg = np.bincount(rows, minlength=n) + np.bincount(cols, minlength=n)
        diag = rows == cols
        vals[diag] = deg.astype(float)[rows[diag]] + 4.0
        return assemble(cols, rows, vals, n, 2)

    def wideband_assembled(n=8192, b=2500, k=3):
        """Uniformly wide band -> the wideband absolute-scan kernels.
        utils.matgen.spd_wideband is the one generator (tests, bench,
        dryrun) so hardware smoke == tested configuration."""
        from abft_sparse_cg_tpu.utils.matgen import spd_wideband

        rows, cols, vals, n = spd_wideband(n, b, k)
        return assemble(cols, rows, vals, n, 1)

    def poisson3d_assembled(n=32):
        """7-point 3-D stencil: offsets +-1, +-n, +-n^2 — tiny D, huge
        band; the DIA tier has no offset-magnitude cap.  n^3 = 32768 is
        1024-divisible, so the megakernel plan applies as-is."""
        rows, cols, vals = [], [], []

        def idx(i, j, k):
            return (i * n + j) * n + k

        for i in range(n):
            for j in range(n):
                for k in range(n):
                    r = idx(i, j, k)
                    rows.append(r), cols.append(r), vals.append(6.5)
                    for di, dj, dk in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
                        if i + di < n and j + dj < n and k + dk < n:
                            rows.append(idx(i + di, j + dj, k + dk))
                            cols.append(r)
                            vals.append(-1.0)
        return assemble(np.array(cols), np.array(rows),
                        np.array(vals, float), n ** 3, 1)

    def fatsplit_assembled(n=65536, band=20000):
        """Uniform couplings within +-20000: band > 16256 in any
        ordering, no thin cut — the FAT-tail band split (banded kernel
        main + a ~50%-of-entries flat tail), the routing that replaced
        the whole-matrix XLA-gather fallback."""
        from abft_sparse_cg_tpu.utils.matgen import spd_wideband

        rows, cols, vals, n = spd_wideband(n, band, k=2)
        r2 = list(rows) + list(range(1, n))
        c2 = list(cols) + list(range(n - 1))
        v2 = list(vals) + [-0.5] * (n - 1)
        return assemble(np.array(c2), np.array(r2),
                        np.array(v2, float), n, 1)

    def bigoffset_assembled(n=131072, far=100000):
        """Chain + sparse +-far couplings: DIA whose halo (~782 rows)
        exceeds one chunk (ROWS=512) — the big-offset megakernel mode
        (periodic-wrap shape).  Run with ABFT_FUSED_BIG_OFFSET=1; the
        per-iteration DIA kernel carries it otherwise."""
        rows = list(range(n)) + list(range(1, n))
        cols = list(range(n)) + list(range(n - 1))
        vals = [6.0] * n + [-1.0] * (n - 1)
        for i in range(0, n - far, 16):
            rows.append(i + far)
            cols.append(i)
            vals.append(-0.5)
        return assemble(np.array(cols), np.array(rows),
                        np.array(vals, float), n, 1)

    def bandsplit_assembled(n=32768, every=8):
        """Banded core + random matching -> band-split composite.
        Built with reorder="none" (below): RCM recovers band ~3.2k for
        this matrix, which the calibrated cost model correctly keeps
        WHOLE on the scan-tier kernel — the natural ordering's band ~n
        is what forces the split this config exists to exercise."""
        rows = list(range(n)) + list(range(1, n))
        cols = list(range(n)) + list(range(n - 1))
        vals = [8.0] * n + [-1.0] * (n - 1)
        rng = np.random.default_rng(5)
        for i in range(0, n, every):
            j = int(rng.integers(0, n))
            if abs(j - i) > 3:
                rows.append(max(i, j))
                cols.append(min(i, j))
                vals.append(-0.5)
        return assemble(np.array(cols), np.array(rows),
                        np.array(vals, float), n, 1)

    def oracle_cg(a, b, max_itrs, conv):
        """Float64 host CG (the reference's exact recurrences,
        cg.cpp:85-118) — the trajectory oracle the f32 hardware solve
        is bounded against."""
        rows, cols, vals = a.rows, a.cols, a.values
        x = np.zeros(a.N)
        r = b.astype(np.float64).copy()
        p = r.copy()
        rr = r @ r
        trace = []
        it = 0
        while it < max_itrs and rr > conv:
            w = np.zeros(a.N)
            np.add.at(w, rows, vals * p[cols])
            alpha = rr / (p @ w)
            x += alpha * p
            r -= alpha * w
            rr1 = r @ r
            p = r + (rr1 / rr) * p
            rr = rr1
            trace.append(rr)
            it += 1
        return it, np.array(trace)

    configs = [
        ("dia", False, "dia"),
        ("unstr", None, None),
        ("ellb", False, "ell"),
        ("ellb-perm", True, "ell"),
        ("split", None, None),
        ("wideband", None, "ell"),   # round 5: natural
        #   routing sends wide uniform bands to the Benes
        #   tier; force ELL to rot-check the scan kernel
        ("bandsplit", None, None),
        ("poisson3d", None, None),
        ("fatsplit", None, None),
        ("bigoffset", None, None),
    ]
    only = set(sys.argv[1:])  # optional config-name filter
    for name, shuffle, force in configs:
        if only and name not in only:
            continue
        if name == "unstr":
            # Uniform random graph: no band at any ordering and no hub
            # outliers (a small powerlaw routes to the bordered split
            # instead) -> the flat/Benes-route tier (round 5).
            g = np.random.default_rng(11)
            un = 32768            # band ~ un at every ordering: past
            ur = g.integers(1, un, 131072)   # the 16256 scan cap, and
            uc = (g.random(131072) * ur).astype(np.int64)  # the 50%
            # band-split tail cap fails -> flat/Benes is the kernel
            ij = np.unique(np.stack([ur, uc]), axis=1)
            ur, uc = ij[0], ij[1]
            uv = -g.random(len(ur))
            dv = np.zeros(un)
            np.add.at(dv, ur, np.abs(uv))
            np.add.at(dv, uc, np.abs(uv))
            a = assemble(np.concatenate([uc, np.arange(un)]),
                         np.concatenate([ur, np.arange(un)]),
                         np.concatenate([uv, dv + 1.0]), un, 1)
        elif name == "split":
            a = bordered_assembled()
        elif name == "wideband":
            a = wideband_assembled()
        elif name == "bandsplit":
            a = bandsplit_assembled()
        elif name == "poisson3d":
            a = poisson3d_assembled()
        elif name == "fatsplit":
            a = fatsplit_assembled()
        elif name == "bigoffset":
            a = bigoffset_assembled()
        else:
            tri = spd_tridiagonal(4096)
            if shuffle:
                tri = shuffle_labels(*tri, seed=3)
            a = assemble(tri[1], tri[0], tri[2], tri[3], 2)

        kw = (dict(reorder="none")
              if name in ("wideband", "fatsplit", "bandsplit") else {})
        if name == "unstr":
            # A uniform random graph CAN band-split (75% of |i-j| at
            # the 16256 cut); with the split off, the kernel-less ELL
            # rebuild routes it to the Benes tier — the path under
            # test.
            kw = dict(split="none")
        m = build_protected("csr", a, "secded", force_exec=force, **kw)
        if name in ("split", "bandsplit"):
            assert m.exec_kind == "split", m.exec_kind
        elif name == "fatsplit":
            # Band > 16256 in any ordering: the calibrated cost model
            # cuts at the scan cap (wide scan-tier main + ~8% flat
            # tail) — the routing that replaced the whole-matrix
            # XLA-gather fallback.  (Pre-calibration this cut thin and
            # left a ~50% tail; scan selects are ~17x cheaper per
            # entry-window-row, so the main now soaks up everything.)
            assert m.exec_kind == "split", m.exec_kind
            assert m.main.band > 1920, m.main.band   # scan-tier main
            assert m.tail.nnz > 0, m.tail.nnz
        elif name == "wideband":
            assert m.exec_kind == "ell" and m.band > 1920, \
                (m.exec_kind, m.band)
        elif name == "poisson3d":
            # 3-D stencil: DIA with offsets +-1, +-32, +-1024 — the
            # no-offset-cap stencil tier, megakernel-eligible.
            assert m.exec_kind == "dia" and max(m.dia_offsets) == 1024, \
                (m.exec_kind, m.dia_offsets)
        elif name == "unstr":
            assert m.exec_kind == "flat", m.exec_kind
            assert m.unstr_plan is not None, "Benes plan missing"
        elif name == "bigoffset":
            assert m.exec_kind == "dia" and max(m.dia_offsets) == 100000
            if os.environ.get("ABFT_FUSED_BIG_OFFSET"):
                from abft_sparse_cg_tpu.solver.fused import (
                    _plan,
                    supports_fused,
                )

                assert supports_fused(m, jnp.float32, "secded", 500)
                assert _plan(m, "secded")["big"], "big-offset plan"
        assert m.exec_kind == "split" or name == "wideband" \
            or supports(m, jnp.float32), name
        if name in ("dia", "ellb", "ellb-perm", "wideband", "poisson3d"):
            # These configs ride the whole-solve fused megakernel
            # (solver.fused) on hardware — this smoke is its rot check.
            from abft_sparse_cg_tpu.solver.fused import supports_fused

            assert supports_fused(m, jnp.float32, "secded", 500), name
            if name == "wideband":
                from abft_sparse_cg_tpu.solver.fused import _plan

                assert _plan(m, "secded")["rolled"], "rolled tier"
        b = np.random.default_rng(7).random(m.N)
        backend = create("pallas", "secded")

        clean = backend.solve(m, b, 500, 1e-6, verbose=False, dtype="f32")
        assert not clean.failed and clean.corrected_count == 0, name

        # f32-on-hardware trajectory vs the f64 host oracle: identical
        # iteration count to the threshold, small per-iteration rr
        # deviation (measured <= 2e-3 relative across all configs; the
        # bound leaves ~10x headroom).
        oit, otrace = oracle_cg(a, b, 500, 1e-6)
        # One extra/missing iteration is admissible as an f32 rounding
        # effect near the threshold (observed: the bordered split
        # config, 9 vs 8 — its f32 trajectory takes a small transient
        # excursion once rr has dropped ~9 decades, then reconverges).
        assert abs(clean.iterations - oit) <= 1, \
            (name, clean.iterations, oit)
        nc = min(clean.iterations, oit)
        got = clean.rr_trace[:nc]
        # Per-iteration agreement while rr is above the f32 tracking
        # floor (rr0 * 1e-8); below it low-precision CG may wander a
        # few iterations before reconverging — the threshold + count
        # asserts above bound that tail.
        track = otrace[:nc] >= otrace[0] * 1e-8
        dev = float(np.max(np.abs(got[track] - otrace[:nc][track])
                           / otrace[:nc][track]))
        assert dev <= 2e-2, (name, dev)
        assert clean.rr <= 1e-6, name
        print(f"{name}: f32 trajectory within {dev:.1e} of the f64 "
              f"oracle over {int(track.sum())}/{oit} iterations",
              flush=True)

        m2 = inject_bitflips(m, "ANY", 1, np.random.default_rng(5),
                             echo=lambda s: None)
        res = backend.solve(m2, b, 500, 1e-6, verbose=False, dtype="f32")
        assert not res.failed and res.corrected_count == 1, name
        assert res.iterations == clean.iterations, name
        np.testing.assert_array_equal(res.x, clean.x, err_msg=name)

        msed = build_protected("csr", a, "sed", force_exec=force, **kw)
        m3 = inject_bitflips(msed, "ANY", 1, np.random.default_rng(6),
                             echo=lambda s: None)
        res = create("pallas", "sed").solve(m3, b, 500, 1e-6,
                                            verbose=False, dtype="f32")
        assert res.failed and res.errcode == 1, name
        assert any("error detected at index" in s for s in res.messages)

        print(f"{name}: clean + corrected + detected OK "
              f"(solve {clean.solve_seconds * 1e3:.2f} ms)", flush=True)

        if name == "bigoffset" and os.environ.get("ABFT_FUSED_BIG_OFFSET"):
            # The big-offset megakernel compiled and solved correctly on
            # this hardware: write the version-keyed marker so the plan
            # auto-enables the mode from now on (solver.fused._plan).
            from abft_sparse_cg_tpu.solver.fused import (
                mark_bigoffset_validated,
            )

            mark_bigoffset_validated()
            print("bigoffset: big-offset megakernel validated on "
                  "hardware — marker written, mode auto-enables",
                  flush=True)

        if name == "dia":
            # Jacobi rides the preconditioned megakernel variant.
            rj = backend.solve(m2, b, 500, 1e-6, verbose=False,
                               dtype="f32", precond="jacobi")
            assert not rj.failed and rj.corrected_count == 1, "jacobi"
            print(f"dia+jacobi: corrected OK "
                  f"(solve {rj.solve_seconds * 1e3:.2f} ms)", flush=True)

            # Lazy detection schedule (--check-interval 8): clean solve
            # bit-exact vs live, fault corrected via snapshot rollback.
            os.environ["ABFT_CHECK_INTERVAL"] = "8"
            try:
                bl = create("pallas", "secded")
                rl = bl.solve(m, b, 500, 1e-6, verbose=False,
                              dtype="f32")
                assert not rl.failed, "lazy clean"
                assert rl.iterations == clean.iterations, "lazy iters"
                np.testing.assert_array_equal(rl.x, clean.x,
                                              err_msg="lazy clean x")
                rlf = bl.solve(m2, b, 500, 1e-6, verbose=False,
                               dtype="f32")
                assert not rlf.failed and rlf.corrected_count == 1, \
                    "lazy corrected"
                np.testing.assert_array_equal(rlf.x, clean.x,
                                              err_msg="lazy rollback x")
            finally:
                os.environ.pop("ABFT_CHECK_INTERVAL", None)
            print(f"dia+lazy8: clean bit-exact + rollback-corrected OK "
                  f"(solve {rl.solve_seconds * 1e3:.2f} ms vs live "
                  f"{clean.solve_seconds * 1e3:.2f})", flush=True)

            # Segmented --checkpoint on the megakernel continue: a
            # truncated run snapshots, resume (with a regrown trace)
            # lands on the straight solve bit-exactly, on hardware.
            import tempfile

            ckpath = os.path.join(tempfile.mkdtemp(), "ck.npz")
            rc1 = backend.solve(m, b, 4, 1e-6, verbose=False,
                                dtype="f32", checkpoint=ckpath,
                                checkpoint_every=2)
            assert rc1.iterations == 4, "ckpt partial"
            rc2 = backend.solve(m, b, 500, 1e-6, verbose=False,
                                dtype="f32", checkpoint=ckpath,
                                resume=True)
            assert not rc2.failed, "ckpt resume"
            assert rc2.iterations == clean.iterations, \
                ("ckpt iters", rc2.iterations, clean.iterations)
            np.testing.assert_array_equal(rc2.x, clean.x,
                                          err_msg="ckpt x")
            print("dia+checkpoint: truncated + resumed bit-exact OK",
                  flush=True)

    # ---- ill-conditioned: f32 stall + f64 cost + --refine recovery ----
    # cond ~ side^2/eps ~ 2e5: plain f32's recursive residual reports
    # convergence while the TRUE residual stalls ~ eps_f32 * cond; the
    # f64 solve (emulated on TPU — measure its cost factor) and the
    # mixed-precision refinement both recover it (README "Precision
    # guidance"; tests/test_refine.py is the CPU fence).
    from abft_sparse_cg_tpu.utils.matzoo import aniso_laplace_2d

    ir, ic, iv, inn = aniso_laplace_2d(side=48, eps=1e-2)
    ia = assemble(np.asarray(ic), np.asarray(ir), np.asarray(iv, float),
                  inn, 1)
    im = build_protected("csr", ia, "secded", row_align=1024)

    def true_rr(x):
        ax = np.zeros(inn)
        np.add.at(ax, ia.rows,
                  ia.values * np.asarray(x, np.float64)[ia.cols])
        r64 = ib - ax
        return float(r64 @ r64)

    ib = np.random.default_rng(3).random(inn)
    bp = create("pallas", "secded")
    r32 = bp.solve(im, ib, 2500, 1e-10, verbose=False, dtype="f32")
    rref = bp.solve_refined(im, ib, 2500, 1e-10, refine=5,
                            verbose=False, dtype="f32")
    t32, trf = true_rr(r32.x), true_rr(rref.x)
    # --dtype f64 is rejected by this TPU generation (axon refuses
    # 64-bit types; backends.base.default_dtype fails early with the
    # remedy) — assert the guard so the error stays clean.
    try:
        bp.solve(im, ib, 10, 1e-10, verbose=False, dtype="f64")
        raise AssertionError("f64 on TPU should have been rejected")
    except ValueError as e:
        assert "--refine" in str(e)
    print(f"illcond(cond~2e5): f32 TRUE rr {t32:.1e} (reported "
          f"{r32.rr:.1e} — recursive drift), refine5 {trf:.1e} "
          f"({rref.iterations} inner iters, f32 kernels + host f64 "
          "restarts); --dtype f64 rejected cleanly on TPU", flush=True)
    assert t32 > 1e-4, t32          # the stall is real at this cond
    assert trf < t32 * 1e-6, (trf, t32)   # refinement recovers

    print("TPU SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
