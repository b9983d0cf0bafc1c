"""Hardware micro-bench: static Benes exchange network as lane/sublane
rolls + selects (the round-5 unstructured-SpMV routing candidate).

The round-4 probes priced the ARBITRARY-TABLE lane shuffle at 0.69
ns/elem (scripts/perm_probe.py) — Mosaic lowers it as ~a hundred
roll/select bodies — making the 3-stage Clos route ~4.7 ns/elem.  A
Benes network needs 2*log2(M)-1 exchange stages, but each stage is a
SHARED-DISTANCE exchange: partner(i) = i XOR d, which is two static
rolls + selects (~7 VPU ops), nothing like a full shuffle.  If a
stage costs what plain VPU arithmetic costs (~0.004 ns/elem), the
whole 37-stage network lands at ~0.2-0.5 ns/elem — 10-20x under the
Clos pipeline and ~40x under the XLA gather.

Cases (per-element costs over the full (RR,128) f32 grid):
  benes-full    : all 2*log2(M)-1 stages (lane distances 1..64 via
                  pltpu.roll axis=1, row distances via axis=0),
                  control bits unpacked from resident int32 planes
  benes-lane    : the 13 lane-only stages (distance < 128)
  benes-row     : the row-distance stages only
Chained CH passes per program so the measurement rides above the
dispatch floor (BENCH_NOTES timing rules).  Appends JSON rows to
BENCH_TPU.jsonl (probe=benes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RR, C = 4096, 128          # M = 524288 ~ the zoo powerlaw padded size
CH, REPS = 4, 10           # marginal protocol: (ch4 - ch1)/3 strips the
#                            ~10 ms dispatch/tunnel floor (ch8 programs
#                            crashed the remote compile helper)


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
    M = RR * C
    m = int(np.log2(M))
    assert 1 << m == M
    lane_ds = [1 << s for s in range(7)]            # 1..64
    row_ds = [1 << s for s in range(m - 7)]         # rows: 1..RR/2
    asc = [("l", d) for d in lane_ds] + [("r", d) for d in row_ds]
    full = asc + asc[-2::-1]                        # 2m-1 stages
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((RR, C)), jnp.float32)
    # Random control bits, bit s of plane s//32 (a real routing is
    # build-time work; cost is ctrl-independent).
    nst = len(full)
    npl = -(-nst // 32)
    ctrl = jnp.asarray(
        rng.integers(0, 1 << 31, size=(npl, RR, C), dtype=np.int64)
        .astype(np.uint32))

    def make_kernel(stages, ch):
        def kernel(ctrl_ref, x_ref, o_ref):
            v = x_ref[...]
            li = jax.lax.broadcasted_iota(jnp.int32, (RR, C), 1)
            ri = jax.lax.broadcasted_iota(jnp.int32, (RR, C), 0)
            cs = [ctrl_ref[p] for p in range(npl)]
            for _ in range(ch):
                for s, (ax, d) in enumerate(stages):
                    if ax == "l":
                        p = jnp.where((li & d) != 0,
                                      pltpu.roll(v, d, 1),
                                      pltpu.roll(v, C - d, 1))
                    else:
                        p = jnp.where((ri & d) != 0,
                                      pltpu.roll(v, d, 0),
                                      pltpu.roll(v, RR - d, 0))
                    cb = (cs[s // 32] >> (s % 32)) & np.uint32(1)
                    v = jnp.where(cb != 0, p, v)
                v = v + 1.0   # keep the chain dependent
            o_ref[...] = v

        return jax.jit(lambda c, a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((RR, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(c, a))

    out = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TPU.jsonl"), "a")

    def timed(fn):
        r = fn(ctrl, x)
        _ = np.asarray(r)[:1]
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = fn(ctrl, x)
        _ = np.asarray(r)[:1]
        return (time.perf_counter() - t0) / REPS

    def bench(name, stages):
        try:
            d1 = timed(make_kernel(stages, 1))
            d4 = timed(make_kernel(stages, CH))
        except Exception as e:
            rec = {"probe": "benes", "case": name,
                   "error": str(e)[:300], "ts": time.time()}
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            return
        ns = (d4 - d1) / (CH - 1) / M * 1e9
        rec = {"probe": "benes", "case": name, "M": M,
               "stages": len(stages),
               "ms_ch1": round(d1 * 1e3, 3), "ms_ch4": round(d4 * 1e3, 3),
               "ns_per_elem_pass": round(ns, 4),
               "ns_per_elem_stage": round(ns / len(stages), 5),
               "ts": time.time()}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")

    bench("benes-full", full)
    out.close()


if __name__ == "__main__":
    main()
