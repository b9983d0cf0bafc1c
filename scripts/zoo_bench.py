"""Adversarial matrix zoo on hardware: routing + perf vs the compiled
reference binary, per family (round-4 verdict item 2).

For every utils.matzoo family this script:
  1. writes the matrix to a MM file and builds the protected form with
     the CLI's pallas row_align, asserting the PREDICTED routing;
  2. builds and runs the reference cg-csr (from /root/reference source,
     -t cpu) on the same file, capturing its `time taken` (the
     per-matrix reference baseline — BASELINE.md's numbers cover only
     the bench tridiagonal);
  3. runs this framework's pallas and jnp targets on the TPU;
  4. emits one JSON row per family into ZOO_BENCH.jsonl with the
     routing fields, all three times, the speedup, and — for
     kernel-tier families — the calibrated cost-model prediction
     (formats.split cost constants) next to the measured per-iteration
     cost, with the relative model error.

Usage: python scripts/zoo_bench.py [--modes secded,none] [--names a,b]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = os.environ.get("ABFT_REFERENCE_DIR", "/root/reference")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_reference(workdir):
    if not (os.path.isdir(REF) and shutil.which("g++")):
        return None
    mmio_o = os.path.join(workdir, "mmio.o")
    subprocess.run(["gcc", "-O2", "-c", f"{REF}/mmio.c", "-o", mmio_o,
                    f"-I{REF}"], check=True, capture_output=True)
    exe = os.path.join(workdir, "cg-csr-ref")
    subprocess.run(
        ["g++", "-O3", "-fopenmp", f"-I{REF}", f"{REF}/cg.cpp",
         f"{REF}/CGContext.cpp", f"{REF}/CSR/CPUContext.cpp", mmio_o,
         "-o", exe], check=True, capture_output=True)
    return exe


def run_reference(exe, mtx, mode, timeout=1800):
    p = subprocess.run([exe, "-f", mtx, "-b", "1", "-t", "cpu",
                        "-m", mode], capture_output=True, text=True,
                       timeout=timeout)
    if p.returncode != 0:
        return None, None
    t = re.search(r"time taken =\s+([\d.]+) ms", p.stdout)
    iters = re.search(r"ran for (\d+) iterations", p.stdout)
    return (float(t.group(1)) if t else None,
            int(iters.group(1)) if iters else None)


def model_us_per_iter(m):
    """Calibrated per-iteration cost prediction (formats.split cost
    constants, fitted on BENCH_TPU rows by scripts/calibrate_cut.py)
    for mode-none kernel-tier solves; None when no model applies."""
    from abft_sparse_cg_tpu.formats.split import (
        _MAIN_NS_PER_WROW,
        _MAIN_NS_SCAN,
        _TAIL_NS,
    )

    # DIA stencil: ~0.008 ns/entry resident-tier (BENCH_NOTES: none
    # 19.9 us/iter at 2.46M nnz) — shifted reads, no per-window work.
    DIA_NS = 0.008
    FLOOR_US = 3.0  # BLAS-1/dispatch floor per iteration at small N

    def ns_for(part):
        if part.exec_kind == "dia":
            return part.nnz * DIA_NS
        if part.exec_kind == "ell":
            wrows = 2 * (-(-max(part.band, 0) // 128)) + 1
            ns = (_MAIN_NS_PER_WROW if part.band <= 1920 else _MAIN_NS_SCAN)
            return part.nnz * wrows * ns
        return part.nnz * _TAIL_NS

    if m.exec_kind == "split":
        if m.tail.dense_plan is not None:
            # Span-window tail: streams T*S dense words, not gathers.
            t = m.tail.dense_plan
            S = t[2] if isinstance(t, tuple) else 0
            tail_ns = len(t[0]) * S * 0.06 if S else ns_for(m.tail)
        else:
            tail_ns = ns_for(m.tail)
        return (ns_for(m.main) + tail_ns) / 1e3 + FLOOR_US
    if m.exec_kind in ("dia", "ell"):
        return ns_for(m) / 1e3 + FLOOR_US
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="none,secded")
    ap.add_argument("--names", default="")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ZOO_BENCH.jsonl"))
    args = ap.parse_args()

    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from abft_sparse_cg_tpu.backends import create
    from abft_sparse_cg_tpu.formats import build_protected, load_matrix
    from abft_sparse_cg_tpu.ops.spmv_pallas import supports
    from abft_sparse_cg_tpu.utils.matgen import write_mm_triangle
    from abft_sparse_cg_tpu.utils.matzoo import ZOO

    log(f"device: {jax.devices()[0]}")
    names = [s for s in args.names.split(",") if s] or list(ZOO)
    workdir = tempfile.mkdtemp(prefix="zoo")
    ref_exe = None if args.skip_reference else build_reference(workdir)
    if ref_exe:
        log(f"reference binary: {ref_exe}")
    out = open(args.out, "a")

    for name in names:
        builder, pred = ZOO[name]
        t0 = time.time()
        rows, cols, vals, n = builder()
        mtx = os.path.join(workdir, f"{name}.mtx")
        write_mm_triangle(mtx, rows, cols, vals, n)
        rec = {"name": name, "N": int(n)}
        try:
            b = np.random.default_rng(12345).random(n)
            for mode in args.modes.split(","):
                m = build_protected("csr", load_matrix(mtx, 1), mode,
                                    row_align=1024)
                if mode == "secded":
                    kern = (supports(m.main, jnp.float32)
                            if m.exec_kind == "split"
                            else supports(m, jnp.float32))
                    rec.update(exec_kind=m.exec_kind, K=int(m.K),
                               band=int(m.band), nnz=int(m.nnz),
                               perm=m.perm is not None, kernel=kern,
                               routing_ok=(m.exec_kind == pred["kind"]
                                           and kern == pred["kernel"]
                                           and (m.perm is not None)
                                           == pred["perm"]))
                for target in ("pallas", "jnp"):
                    try:
                        res = create(target, mode).solve(
                            m, b, 1000, 0.001, verbose=False, dtype="f32")
                        rec[f"{target}_{mode}_ms"] = round(
                            res.solve_seconds * 1e3, 3)
                        # keyed per target: jnp must not overwrite the
                        # pallas count the model comparison below uses
                        rec[f"iters_{target}_{mode}"] = res.iterations
                        if target == "pallas":
                            rec[f"iters_{mode}"] = res.iterations
                        if (target == "pallas" and mode == "none"
                                and res.iterations):
                            mu = model_us_per_iter(m)
                            if mu:
                                meas = (res.solve_seconds * 1e6
                                        / res.iterations)
                                rec["model_us_per_iter"] = round(mu, 2)
                                rec["meas_us_per_iter"] = round(meas, 2)
                                rec["model_err_pct"] = round(
                                    (mu - meas) / meas * 100, 1)
                    except Exception as e:  # noqa: BLE001
                        rec[f"{target}_{mode}_error"] = (
                            f"{type(e).__name__}: {e}"[:200])
                if ref_exe:
                    ms, it = run_reference(ref_exe, mtx, mode)
                    if ms is not None:
                        rec[f"ref_{mode}_ms"] = ms
                        rec[f"ref_iters_{mode}"] = it
                        ours = rec.get(f"pallas_{mode}_ms") or rec.get(
                            f"jnp_{mode}_ms")
                        if ours:
                            rec[f"speedup_{mode}"] = round(ms / ours, 1)
        except Exception as e:  # noqa: BLE001
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        rec["wall_s"] = round(time.time() - t0, 1)
        line = json.dumps(rec)
        print(line, flush=True)
        out.write(line + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
