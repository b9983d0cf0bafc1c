"""TPU benchmark sweep: every (target, mode, layout) solve configuration.

Produces one JSON line per configuration (appended to BENCH_TPU.jsonl and
echoed to stdout) with the same timing protocol as the CLI's `time taken`
(compile once, warm once, dispatch 20 solves, sync once — see
BENCH_NOTES.md for why through the axon tunnel).

Usage: python scripts/tpu_bench.py [--blocks 10] [--targets jnp,pallas]
       [--modes none,...] [--layouts dia,ell,rcm-ell] [--formats csr,coo]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALL_MODES = ("none", "constraints", "sed", "sec7", "sec8", "secded")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(fmt, mode, layout, blocks):
    import numpy as np

    from abft_sparse_cg_tpu.formats import assemble, build_protected
    from abft_sparse_cg_tpu.utils.matgen import shuffle_labels, spd_tridiagonal

    tri = spd_tridiagonal(81920)
    if layout == "rcm-ell":
        tri = shuffle_labels(*tri, seed=9)
    if layout == "split":
        # Bordered: tridiagonal core + 3 dense rows of ~8k entries each
        # (replicated per block) — the outlier-split's target shape.
        rows, cols, vals, n = tri
        rows, cols, vals = list(rows), list(cols), list(vals)
        rng = np.random.default_rng(3)
        for r in (100, 40000, 70007):
            for c in rng.choice(n, size=8000, replace=False):
                hi, lo = max(r, int(c)), min(r, int(c))
                if hi != lo:
                    rows.append(hi)
                    cols.append(lo)
                    vals.append(-0.001)
        rows, cols = np.array(rows), np.array(cols)
        vals = np.array(vals, dtype=float)
        deg = (np.bincount(rows, minlength=n)
               + np.bincount(cols, minlength=n))
        diag = rows == cols
        vals[diag] = deg.astype(float)[rows[diag]] + 4.0
        a = assemble(cols, rows, vals, n, blocks)
        m = build_protected(fmt, a, mode)
        assert m.exec_kind == "split", m.exec_kind
        return m
    if layout.startswith("wideband"):
        # Uniformly wide band (post-RCM band > the banded kernels' 1920
        # cap) -> the wideband absolute-scan kernel tiers.  Same
        # generator as the tests / smoke / multichip dryrun so rows
        # stay comparable.  "wideband:<band>" parametrizes the width
        # (calibration sweeps for the split cut model use several).
        from abft_sparse_cg_tpu.utils.matgen import spd_wideband

        band = int(layout.split(":")[1]) if ":" in layout else 2500
        rows, cols, vals, n = spd_wideband(81920, band)
        a = assemble(cols, rows, vals, n, blocks)
        m = build_protected(fmt, a, mode, reorder="none")
        assert m.exec_kind == "ell" and m.band > 1920, (m.exec_kind, m.band)
        return m
    if layout == "bandsplit":
        # Banded core + sparse random matching: no narrow band exists,
        # so the band-split composite (banded core + flat out-of-band
        # tail) is the only compiled-tier route.
        n = 81920
        rows = list(range(n)) + list(range(1, n))
        cols = list(range(n)) + list(range(n - 1))
        vals = [8.0] * n + [-1.0] * (n - 1)
        rng = np.random.default_rng(5)
        for i in range(0, n, 8):
            j = int(rng.integers(0, n))
            if abs(j - i) > 3:
                rows.append(max(i, j))
                cols.append(min(i, j))
                vals.append(-0.5)
        a = assemble(np.array(cols), np.array(rows),
                     np.array(vals, float), n, blocks)
        m = build_protected(fmt, a, mode)
        assert m.exec_kind == "split", m.exec_kind
        return m
    if layout == "poisson3d":
        # 7-point 3-D stencil: DIA with offsets +-1, +-44, +-1936 —
        # the no-offset-cap stencil tier; row_align=1024 (what the CLI
        # passes for pallas) keeps it megakernel-eligible.
        gn = 44
        rows, cols, vals = [], [], []

        def idx(i, j, k):
            return (i * gn + j) * gn + k

        for i in range(gn):
            for j in range(gn):
                for k in range(gn):
                    r = idx(i, j, k)
                    rows.append(r), cols.append(r), vals.append(6.5)
                    for di, dj, dk in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
                        if i + di < gn and j + dj < gn and k + dk < gn:
                            rows.append(idx(i + di, j + dj, k + dk))
                            cols.append(r)
                            vals.append(-1.0)
        a = assemble(np.array(cols), np.array(rows),
                     np.array(vals, float), gn ** 3, blocks)
        m = build_protected(fmt, a, mode, row_align=1024)
        assert m.exec_kind == "dia", m.exec_kind
        return m
    if layout.startswith("denseband"):
        # Dense band: K = 2*half + 1 slots at bandwidth only `half` —
        # the high-degree family (higher-order 3-D FEM, ~100+ nnz/row)
        # that exercises the ELL slot-count envelope.  "denseband:<half>"
        # parametrizes; N is scaled down so nnz stays bench-comparable.
        from abft_sparse_cg_tpu.utils.matgen import spd_denseband

        half = int(layout.split(":")[1]) if ":" in layout else 64
        # n=8192 keeps nnz = N*K bench-scale at -b 10 (K=255 -> 20.9M).
        # Natural routing: half <= 63 -> DIA (D = 2*half+1 <= 128
        # distinct offsets); beyond -> high-K ELL (the slot-count
        # envelope this family exists to measure).
        rows, cols, vals, n = spd_denseband(8192, half)
        a = assemble(cols, rows, vals, n, blocks)
        m = build_protected(fmt, a, mode, reorder="none", row_align=1024)
        assert m.K == 2 * half + 1, (m.exec_kind, m.K)
        assert m.exec_kind == ("dia" if half <= 63 else "ell")
        return m
    if layout == "fatsplit":
        # Uniform couplings within +-20000: band > 16256 in every
        # ordering, no thin cut -> the fat-tail band split (kernel
        # main + flat tail) that replaced the XLA-gather fallback.
        from abft_sparse_cg_tpu.utils.matgen import spd_wideband

        rows, cols, vals, n = spd_wideband(81920, 20000, k=2)
        r2 = np.concatenate([rows, np.arange(1, n)])
        c2 = np.concatenate([cols, np.arange(n - 1)])
        v2 = np.concatenate([vals, np.full(n - 1, -0.5)])
        a = assemble(c2, r2, v2, n, blocks)
        m = build_protected(fmt, a, mode, reorder="none")
        assert m.exec_kind == "split", m.exec_kind
        return m
    a = assemble(tri[1], tri[0], tri[2], tri[3], blocks)
    force = "dia" if layout == "dia" else "ell"
    return build_protected(fmt, a, mode, force_exec=force)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=10)
    ap.add_argument("--targets", default="jnp,pallas")
    ap.add_argument("--modes", default=",".join(ALL_MODES))
    ap.add_argument("--layouts", default="dia,ell,rcm-ell")
    ap.add_argument("--formats", default="csr")
    ap.add_argument("--check-interval", type=int, default=0,
                    help="lazy ABFT schedule for the pallas megakernel "
                         "(rows gain a 'ci' field)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_TPU.jsonl"))
    args = ap.parse_args()

    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from abft_sparse_cg_tpu.backends import create

    log(f"device: {jax.devices()[0]}")
    if args.check_interval > 1:
        bad = [t for t in (s.strip() for s in args.targets.split(","))
               if t != "pallas"]
        if bad:
            # only the pallas kernel tiers have a lazy schedule — a ci
            # label on a live jnp/cpu row would misstate what ran
            raise SystemExit(
                f"--check-interval only exists on the pallas target "
                f"(got --targets {','.join(bad)})")
        os.environ["ABFT_CHECK_INTERVAL"] = str(args.check_interval)
    out = open(args.out, "a")

    def _csv(v):
        return [t for t in (s.strip() for s in v.split(",")) if t]

    for fmt in _csv(args.formats):
        for layout in _csv(args.layouts):
            for mode in _csv(args.modes):
                if mode == "constraints" and layout == "rcm-ell":
                    continue  # constraints never reorders
                mat = None
                for target in _csv(args.targets):
                    try:
                        if mat is None:
                            mat = build(fmt, mode, layout, args.blocks)
                        b = np.random.default_rng(12345).random(mat.N)
                        backend = create(target, mode)
                        t0 = time.time()
                        res = backend.solve(mat, b, 1000, 0.001,
                                            verbose=False, dtype="f32")
                        rec = {
                            "fmt": fmt, "layout": layout, "mode": mode,
                            "target": target,
                            "exec_kind": mat.exec_kind,
                            "perm": mat.perm is not None,
                            "band": mat.band, "K": mat.K,
                            "N": mat.N, "nnz": mat.nnz,
                            # composites: the calibration script fits the
                            # cut model from main/tail shares
                            **({"main_nnz": mat.main.nnz,
                                "main_band": mat.main.band,
                                "tail_nnz": mat.tail.nnz}
                               if mat.exec_kind == "split" else {}),
                            "solve_ms": round(res.solve_seconds * 1e3, 3),
                            "compile_s": round(res.compile_seconds, 1),
                            "iters": res.iterations,
                            "rr": res.rr,
                            "failed": res.failed,
                            "wall_s": round(time.time() - t0, 1),
                        }
                        if args.check_interval > 1:
                            rec["ci"] = args.check_interval
                        # Per-tier streamed bandwidth vs HBM SoL
                        # (approximate at solve level — includes the
                        # dispatch floor; the slope protocol in
                        # bench.py is the precise variant).
                        if target == "pallas" and res.iterations:
                            from abft_sparse_cg_tpu.solver.fused import (
                                streamed_bytes_per_iter,
                            )

                            by = streamed_bytes_per_iter(
                                mat, mode,
                                check_interval=args.check_interval)
                            if by:
                                us = (res.solve_seconds * 1e6
                                      / res.iterations)
                                g = by / (us * 1e-6) / 1e9
                                rec["bytes_per_iter"] = by
                                rec["gbps"] = round(g, 1)
                                rec["sol_pct"] = round(g / 8.19, 1)
                    except Exception as e:  # noqa: BLE001 — record and move on
                        rec = {
                            "fmt": fmt, "layout": layout, "mode": mode,
                            "target": target,
                            "error": f"{type(e).__name__}: {e}"[:300],
                        }
                    line = json.dumps(rec)
                    print(line, flush=True)
                    out.write(line + "\n")
                    out.flush()
    out.close()


if __name__ == "__main__":
    main()
