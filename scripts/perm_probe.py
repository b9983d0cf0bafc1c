"""Hardware micro-bench for the static-permutation primitives
(utils.permroute; the round-5 unstructured-SpMV groundwork).

Measures, on the real TPU, per-element costs of the three building
blocks the 3-stage routing pipeline uses, against the XLA 1-D gather
they would replace:

  1. in-Pallas static lane shuffle (take_along_axis on a (R,128) tile)
  2. XLA transpose/relayout of the same array
  3. XLA 1-D gather (the serialized baseline the flat tier pays today)

Protocol: one jitted program per case applying the op CH times
back-to-back (dependency-chained so XLA cannot elide), timed over the
batch — the in-program chain beats the ~3 ms dispatch floor
(BENCH_NOTES timing notes).  Appends one JSON row per case to
BENCH_TPU.jsonl (probe=perm).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R, C, CH, REPS = 2048, 128, 64, 10


def main():
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from abft_sparse_cg_tpu.utils.platform import warm_device

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    warm_device()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((R, C)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.permutation(C) for _ in range(R)]), jnp.int32)

    def shuffle_kernel(idx_ref, x_ref, o_ref):
        v = x_ref[...]
        ix = idx_ref[...]
        for _ in range(CH):
            v = jnp.take_along_axis(v, ix, axis=1) + 1.0
        o_ref[...] = v

    shuf = jax.jit(lambda i, a: pl.pallas_call(
        shuffle_kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, a))

    def transp(a):
        for _ in range(CH):
            a = a.T.reshape(R, C) + 1.0
        return a

    trans = jax.jit(transp)

    g_idx = jnp.asarray(rng.permutation(R * C), jnp.int32)

    def gathr(a):
        v = a.reshape(-1)
        for _ in range(4):         # 4 chained gathers is already slow
            v = v[g_idx] + 1.0
        return v

    gat = jax.jit(gathr)

    out = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TPU.jsonl"), "a")

    def bench(name, fn, args, chain):
        r = fn(*args)
        jax.block_until_ready(r)
        _ = np.asarray(r)[:1]          # true sync
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = fn(*args)
        _ = np.asarray(r)[:1]
        dt = (time.perf_counter() - t0) / REPS
        ns = dt / (R * C * chain) * 1e9
        rec = {"probe": "perm", "case": name, "R": R, "C": C,
               "chain": chain, "ms": round(dt * 1e3, 3),
               "ns_per_elem": round(ns, 4), "ts": time.time()}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        return ns

    s = bench("pallas-lane-shuffle", shuf, (idx, x), CH)
    t = bench("xla-transpose", trans, (x,), CH)
    g = bench("xla-1d-gather", gat, (x,), 4)
    est = 4 * s + 2 * t + 16 * 0.014   # pipeline: 4 shuffles, 2 transposes,
    #                                    ~16 sublane-select bodies
    rec = {"probe": "perm", "case": "pipeline-estimate",
           "ns_per_elem": round(est, 3),
           "vs_gather": round(g / est, 1), "ts": time.time()}
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n")
    out.close()


if __name__ == "__main__":
    main()
