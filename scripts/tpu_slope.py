"""Per-iteration device time by the slope protocol (BENCH_NOTES.md).

Compiles the same solve at max_itrs = LO and HI with conv < 0 (the loop
runs exactly max_itrs), dispatches each a few times with one sync, and
reports (t_HI - t_LO) / (HI - LO) — cancelling the dispatch floor and
the sync RTT.  Usage:

    python scripts/tpu_slope.py [-b BLOCKS] [target:mode ...]

Defaults: -b 100 (N=8.19M — beyond the VMEM-resident megakernel
envelope, so the pallas target rides the STREAMING megakernel tier:
x/w in HBM, p+r resident), jnp:secded jnp:none pallas:secded
pallas:none.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LO, HI = 8, 108


def main():
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from abft_sparse_cg_tpu.backends import create
    from abft_sparse_cg_tpu.formats import build_protected, load_matrix

    args = sys.argv[1:]
    blocks = 100
    if args and args[0] == "-b":
        blocks = int(args[1])
        args = args[2:]
    configs = args or ["jnp:secded", "jnp:none", "pallas:secded",
                       "pallas:none"]

    print(f"device: {jax.devices()[0]}", flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "matrices", "shallow_water1",
        "shallow_water1.mtx")
    a = load_matrix(path, blocks)
    print(f"matrix: N={a.N:,} nnz={a.nnz:,} (-b {blocks})", flush=True)
    b = np.random.default_rng(12345).random(a.N)

    for cfg in configs:
        target, mode = cfg.split(":")
        mat = build_protected("csr", a, mode)
        times = {}
        for itrs in (LO, HI):
            res = create(target, mode).solve(
                mat, b, itrs, -1.0, verbose=False, dtype="f32", reps=10)
            assert res.iterations == itrs, (cfg, res.iterations)
            times[itrs] = res.solve_seconds
        slope = (times[HI] - times[LO]) / (HI - LO) * 1e6
        print(f"{target:6s} {mode:8s}: {slope:8.1f} us/iter  "
              f"(t{LO}={times[LO]*1e3:.2f} ms, t{HI}={times[HI]*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
