"""Per-iteration device time by the INTERLEAVED slope protocol
(BENCH_NOTES.md "Noise note").

For every config, compiles the same solve at max_itrs = LO and HI with
conv < 0 (the loop runs exactly max_itrs), then alternates timing
batches over ALL prepared configs round-robin and takes per-config
minima — minutes-scale environment drift (co-tenant bursts, tunnel
stalls) hits every config equally, so the slopes
(t_HI - t_LO) / (HI - LO) and their ratios are stable.  The 500-
iteration default span keeps the sync-floor-dominated t_LO anchor's
batch variance 30-50x below the delta.

Usage:

    python scripts/tpu_slope.py [-b BLOCKS] [--span HI] [--record]
                                [target:mode[.ci] ...]

``.ci`` selects the lazy detection schedule for that config (e.g.
``pallas:secded.32`` = ``--check-interval 32``).  ``--record`` appends
one JSONL row per config to BENCH_TPU.jsonl (protocol="slope").

Defaults: -b 10, span 508, jnp:secded jnp:none pallas:secded
pallas:none.  At -b 100 (N=8.19M, beyond the VMEM-resident megakernel
envelope) the pallas target rides the STREAMING megakernel tier.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LO = 8
ROUNDS = 4


def main():
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from abft_sparse_cg_tpu.backends import create
    from abft_sparse_cg_tpu.formats import build_protected, load_matrix

    args = sys.argv[1:]
    blocks, hi, record = 10, 508, False
    rest = []
    i = 0
    while i < len(args):
        if args[i] == "-b":
            blocks = int(args[i + 1])
            i += 2
        elif args[i] == "--span":
            hi = int(args[i + 1])
            i += 2
        elif args[i] == "--record":
            record = True
            i += 1
        else:
            rest.append(args[i])
            i += 1
    configs = rest or ["jnp:secded", "jnp:none", "pallas:secded",
                       "pallas:none"]

    print(f"device: {jax.devices()[0]}", flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "matrices", "shallow_water1",
                        "shallow_water1.mtx")
    a = load_matrix(path, blocks)
    print(f"matrix: N={a.N:,} nnz={a.nnz:,} (-b {blocks})", flush=True)
    b = np.random.default_rng(12345).random(a.N)

    mats = {}
    reps = max(2, min(10, 4000 // hi))

    def prep(target, mode, itrs, ci):
        if mode not in mats:
            mats[mode] = build_protected("csr", a, mode)
        if ci:
            os.environ["ABFT_CHECK_INTERVAL"] = str(ci)
        try:
            batch, got = create(target, mode).prepare_timed_solve(
                mats[mode], b, itrs, -1.0, dtype="f32", reps=reps)
            assert got == itrs, (target, mode, itrs, got)
            return batch
        finally:
            os.environ.pop("ABFT_CHECK_INTERVAL", None)

    batches = {}
    for cfg in configs:
        target, modeci = cfg.split(":")
        mode, _, ci = modeci.partition(".")
        if ci and target != "pallas":
            # Only the pallas kernel tiers implement the lazy schedule;
            # recording a live jnp/cpu measurement with a ci label would
            # contaminate BENCH_TPU.jsonl (backends warn, we refuse).
            raise SystemExit(
                f"{cfg}: --check-interval (.{ci}) only exists on the "
                f"pallas target; drop the suffix for a live {target} row")
        for itrs in (LO, hi):
            batches[(cfg, itrs)] = prep(target, mode, itrs,
                                        int(ci) if ci else None)
        print(f"prepared {cfg}", flush=True)

    best = {k: float("inf") for k in batches}
    for _r in range(ROUNDS):
        for k, fn in batches.items():
            best[k] = min(best[k], fn())

    rows = []
    for cfg in configs:
        tlo, thi = best[(cfg, LO)], best[(cfg, hi)]
        slope = (thi - tlo) / (hi - LO) * 1e6
        print(f"{cfg:22s}: {slope:8.1f} us/iter  "
              f"(t{LO}={tlo*1e3:.2f} ms, t{hi}={thi*1e3:.2f} ms)",
              flush=True)
        target, modeci = cfg.split(":")
        mode, _, ci = modeci.partition(".")
        rows.append({"protocol": "slope", "ts": time.time(),
                     "fmt": "csr", "mode": mode, "target": target,
                     "ci": int(ci) if ci else 1, "N": int(a.N),
                     "nnz": int(a.nnz), "blocks": blocks,
                     "span": [LO, hi], "reps": reps, "rounds": ROUNDS,
                     "us_per_iter": round(slope, 2),
                     "t_lo_ms": round(tlo * 1e3, 3),
                     "t_hi_ms": round(thi * 1e3, 3)})
    if record:
        out = os.path.join(root, "BENCH_TPU.jsonl")
        with open(out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print(f"recorded {len(rows)} rows to {out}", flush=True)


if __name__ == "__main__":
    main()
