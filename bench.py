"""Headline benchmark — prints ONE JSON line on stdout.

Metric: full CG solve wall time, cg-csr / secded, `-b 10` scale
(N=819,200, nnz=2,457,580 — the exact configuration measured for the
reference in BASELINE.md: 239.6 ms on the host CPU).  ``vs_baseline`` is
the speedup factor (baseline_ms / ours_ms, higher is better).

Timing protocol: the whole solve is one device program (AOT-compiled
first); K executions are dispatched back-to-back and synced once, because
through the axon tunnel only host transfers actually synchronize and each
sync costs ~28 ms RTT.  Diagnostics (per-mode table, ABFT overhead) go to
stderr; stdout carries exactly the one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SECDED_MS = 239.6   # reference cg-csr cpu-secded, BASELINE.md
BASELINE_NONE_MS = 56.3      # reference cg-csr cpu-none,   BASELINE.md
BLOCKS = 10
REPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_matrix():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "matrices", "shallow_water1", "shallow_water1.mtx")
    if not os.path.exists(path):
        from abft_sparse_cg_tpu.utils.matgen import (
            spd_tridiagonal, write_mm_triangle)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rows, cols, vals, n = spd_tridiagonal(81920)
        write_mm_triangle(path, rows, cols, vals, n)
        log(f"generated {path}")
    return path


def bench_mode(mat, b, mode, reps=REPS):
    import jax
    import jax.numpy as jnp

    from abft_sparse_cg_tpu.ops.spmv import make_matrix_device, make_spmv
    from abft_sparse_cg_tpu.solver.cg import make_cg_solver

    dtype = jnp.float32 if jax.devices()[0].platform != "cpu" else jnp.float64
    spmv = make_spmv(mat, dtype, mode)
    solver = jax.jit(make_cg_solver(spmv, 1000, 0.001, trace_rr=False))

    md = make_matrix_device(mat, dtype)
    bpad = np.zeros(mat.R)
    bpad[: mat.N] = b
    bdev = jnp.asarray(bpad, dtype)

    t0 = time.perf_counter()
    compiled = solver.lower(md, bdev).compile()
    tc = time.perf_counter() - t0

    # Warmup + correctness sniff (forces a real sync through the tunnel).
    res = compiled(md, bdev)
    iters = int(res.iterations)
    rr = float(res.rr)

    t0 = time.perf_counter()
    last = None
    for _ in range(reps):
        last = compiled(md, bdev)
    _ = float(last.rr)  # host transfer = true sync
    dt = (time.perf_counter() - t0) / reps

    log(f"  {mode:12s}: {dt * 1e3:8.2f} ms/solve  ({iters} iters, "
        f"rr={rr:.4f}, compile {tc:.1f}s)")
    return dt * 1e3


def main():
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import jax

    from abft_sparse_cg_tpu.formats import build_protected, load_matrix

    log(f"device: {jax.devices()[0]}")
    path = ensure_matrix()
    a = load_matrix(path, BLOCKS)
    log(f"matrix: N={a.N:,} nnz={a.nnz:,} (-b {BLOCKS})")

    b = np.random.default_rng(12345).random(a.N)

    times = {}
    for mode in ("none", "secded"):
        mat = build_protected("csr", a, mode)
        times[mode] = bench_mode(mat, b, mode)

    overhead = (times["secded"] - times["none"]) / times["none"] * 100
    log(f"ABFT secded overhead vs none: {overhead:+.1f}% "
        f"(reference: +326%)")

    print(json.dumps({
        "metric": "cg_csr_secded_solve_ms_b10",
        "value": round(times["secded"], 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_SECDED_MS / times["secded"], 2),
    }))


if __name__ == "__main__":
    main()
