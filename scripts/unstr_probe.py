"""Hardware probe: the Benes-route unstructured SpMV tier on the zoo
powerlaw graph (the one family where round 4 lost to the reference —
ZOO_BENCH powerlaw row: pallas none 131 ms vs reference 48.6).

Runs the pallas backend (now routing flat matrices through
ops.spmv_unstructured) and the jnp flat path on the same matrix,
prints solve times, and appends rows to BENCH_TPU.jsonl (probe=unstr).
ABFT_NO_UNSTR=1 re-runs the old flat path for the A/B.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from abft_sparse_cg_tpu.backends import create
    from abft_sparse_cg_tpu.formats import assemble, build_protected
    from abft_sparse_cg_tpu.utils import matzoo
    from abft_sparse_cg_tpu.utils.platform import warm_device

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    warm_device()
    n = int(os.environ.get("UNSTR_N", 65536))
    blocks = int(os.environ.get("UNSTR_BLOCKS", 1))
    rows, cols, vals, n = matzoo.powerlaw_graph(n)
    a = assemble(cols, rows, vals, n, blocks)
    n = a.N
    b = np.random.default_rng(12345).random(n)
    out = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TPU.jsonl"), "a")
    for mode in ("none", "secded"):
        t0 = time.perf_counter()
        m = build_protected("csr", a, mode, row_align=1024)
        t_build = time.perf_counter() - t0
        rec = {"probe": "unstr", "matrix": "powerlaw-graph", "N": n,
               "nnz": int(m.nnz), "mode": mode,
               "exec_kind": m.exec_kind,
               "unstr": getattr(m, "unstr_plan", None) is not None,
               "build_s": round(t_build, 2)}
        if m.unstr_plan is not None:
            rec["M"] = int(m.unstr_plan["M"])
            rec["V2"] = int(m.unstr_plan["V2"])
            rec["blocks"] = len(m.unstr_plan["blocks"])
        for target in ("pallas", "jnp"):
            try:
                t0 = time.perf_counter()
                res = create(target, mode).solve(
                    m, b, 1000, 0.001, verbose=False, dtype="f32")
                rec[f"{target}_ms"] = round(res.solve_seconds * 1e3, 3)
                rec[f"{target}_compile_s"] = round(
                    res.compile_seconds, 1)
                rec[f"iters_{target}"] = int(res.iterations)
            except Exception as e:
                rec[f"{target}_error"] = str(e)[:300]
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
    out.close()


if __name__ == "__main__":
    main()
