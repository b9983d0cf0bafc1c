"""Headline benchmark — prints ONE JSON line on stdout.

Metric: full CG solve wall time, cg-csr / secded, `-b 10` scale
(N=819,200, nnz=2,457,580 — the exact configuration measured for the
reference in BASELINE.md: 239.6 ms on the host CPU).  ``vs_baseline`` is
the speedup factor (baseline_ms / ours_ms, higher is better).

Tier selection is measured, not assumed: both the jnp (XLA stencil) and
pallas (hand-written fused kernel) targets run for the headline modes
and the faster one is reported (named in the JSON's ``tier`` field).
Diagnostics on stderr: the full per-mode table on the winning tier, the
worst (slowest) mode, and the ABFT overhead vs mode none.

Timing protocol: the whole solve is one device program (AOT-compiled
first); K executions are dispatched back-to-back and synced once, because
through the axon tunnel only host transfers actually synchronize and each
sync costs ~28 ms RTT.  See BENCH_NOTES.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Reference cg-csr measurements from BASELINE.md (`run_benchmark`, -b 10).
BASELINE_MS = {
    "none": 56.3,
    "constraints": 61.0,
    "sed": 63.8,
    "sec7": 235.6,
    "sec8": 66.1,
    "secded": 239.6,
}
BLOCKS = 10
REPS = 20
ALL_MODES = ("none", "constraints", "sed", "sec7", "sec8", "secded")


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


def bench_mode(mat, b, mode, target, reps=REPS):
    import jax

    from abft_sparse_cg_tpu.backends import create

    dtype = "f32" if jax.devices()[0].platform != "cpu" else "f64"
    res = create(target, mode).solve(mat, b, 1000, 0.001, verbose=False,
                                     dtype=dtype)
    assert not res.failed, (mode, target, res.messages)
    ms = res.solve_seconds * 1e3
    log(f"  {target:6s} {mode:12s}: {ms:8.2f} ms/solve  "
        f"({res.iterations} iters, rr={res.rr:.6f}, "
        f"compile {res.compile_seconds:.1f}s)")
    return ms


def main():
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    # Device init goes through the axon tunnel; when the tunnel is down
    # jax.devices() blocks forever — fail with a parseable JSON line
    # instead of hanging the caller (watchdog, not a timeout on work).
    import threading

    ready = threading.Event()

    def _watchdog():
        if not ready.wait(600):
            print(json.dumps({
                "metric": "cg_csr_secded_solve_ms", "value": None,
                "unit": "ms", "vs_baseline": None,
                "error": "device init timed out (axon tunnel down?)"}),
                flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    from abft_sparse_cg_tpu.formats import build_protected, load_matrix

    log(f"device: {jax.devices()[0]}")
    ready.set()
    path = ensure_matrix()
    a = load_matrix(path, BLOCKS)
    log(f"matrix: N={a.N:,} nnz={a.nnz:,} (-b {BLOCKS})")

    b = np.random.default_rng(12345).random(a.N)
    mats = {m: build_protected("csr", a, m) for m in ALL_MODES}

    # Tier pick: measure the headline mode on both targets.  A target
    # that crashes (kernel-compiler regression) must not take the
    # headline artifact down with it — the surviving tier reports.
    tier_ms = {}
    for t in ("jnp", "pallas"):
        try:
            tier_ms[t] = bench_mode(mats["secded"], b, "secded", t)
        except Exception as e:  # noqa: BLE001 — diagnose, keep going
            log(f"target {t} FAILED on secded: {type(e).__name__}: "
                f"{str(e)[:300]}")
    if not tier_ms:
        print(json.dumps({
            "metric": "cg_csr_secded_solve_ms", "value": None,
            "unit": "ms", "vs_baseline": None,
            "error": "both targets failed on secded"}), flush=True)
        sys.exit(4)
    tier = min(tier_ms, key=tier_ms.get)
    log(f"tier: {tier} (secded {tier_ms[tier]:.2f} ms vs "
        f"{max(tier_ms.values()):.2f} ms)")

    times = {"secded": tier_ms[tier]}
    for mode in ALL_MODES:
        if mode not in times:
            try:
                times[mode] = bench_mode(mats[mode], b, mode, tier)
            except Exception as e:  # noqa: BLE001
                log(f"mode {mode} FAILED on {tier}: {type(e).__name__}: "
                    f"{str(e)[:300]}")
    if "none" not in times:   # overhead needs the unprotected anchor
        times["none"] = bench_mode(mats["none"], b, "none", "jnp")
        log("mode none re-measured on jnp (pallas failed)")

    overhead = (times["secded"] - times["none"]) / times["none"] * 100
    worst = max(times, key=times.get)
    log(f"ABFT secded overhead vs none: {overhead:+.1f}% (reference: +326%)")
    log(f"worst mode: {worst} at {times[worst]:.2f} ms "
        f"(reference {BASELINE_MS[worst]:.1f} ms, "
        f"{BASELINE_MS[worst] / times[worst]:.0f}x)")

    out = {
        "metric": f"cg_csr_secded_solve_ms_b10_{tier}",
        "value": round(times["secded"], 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS["secded"] / times["secded"], 2),
        "abft_overhead_pct": round(overhead, 1),
    }

    # ---- interleaved ratio protocol ----------------------------------
    # The environment drifts on a minutes scale (co-tenant bursts,
    # tunnel stalls) by MORE than the ABFT overheads being measured, so
    # configs timed sequentially give unstable ratios (mode none has
    # measured anywhere from 1.57 to 2.55 ms across identical runs).
    # Prepare every config up front, alternate timing batches
    # round-robin, take per-config minima — drift hits all configs
    # equally.  Overhead fields below come from THIS protocol:
    #   - live / lazy8 solve-level overheads (reference `time taken`
    #     protocol, 8-iteration solves)
    #   - per-iteration slope (t8/t508, conv < 0) — the BASELINE
    #     '<10% SEC-DED overhead' criterion at steady state; secded
    #     word planes are 2/CI of value-plane traffic, so
    #     --check-interval 32 sits at ~+6% with detection latency
    #     bounded at 32 iterations (measured at the 500-iteration
    #     span: none 19.8, live 43.6, ci32 21.0 us/iter = +6.1%).
    if tier == "pallas" and jax.devices()[0].platform != "cpu":
        from abft_sparse_cg_tpu.backends import create

        def prep(mode, itrs, conv, reps, ci=None):
            if ci:
                os.environ["ABFT_CHECK_INTERVAL"] = str(ci)
            try:
                batch, got = create(tier, mode).prepare_timed_solve(
                    mats[mode], b, itrs, conv, dtype="f32", reps=reps)
                if conv < 0:
                    assert got == itrs, (mode, itrs, got)
                return batch
            finally:
                os.environ.pop("ABFT_CHECK_INTERVAL", None)

        try:
            log("preparing interleaved configs ...")
            cfgs = {
                "none": prep("none", 1000, 0.001, REPS),
                "secded": prep("secded", 1000, 0.001, REPS),
                "lazy8": prep("secded", 1000, 0.001, REPS, ci=8),
                # Round 4: the OTHER four modes ride the same
                # round-robin — sequential per-mode rows drift 30-60%
                # between runs (the round-3 verdict's recurring noise
                # class), so every overhead quoted anywhere now comes
                # from one interleaved batch set.
                "constraints": prep("constraints", 1000, 0.001, REPS),
                "sed": prep("sed", 1000, 0.001, REPS),
                "sec7": prep("sec7", 1000, 0.001, REPS),
                "sec8": prep("sec8", 1000, 0.001, REPS),
                # 500-iteration span: the t8 anchor is sync-floor
                # dominated (~28 ms RTT / reps) and its batch variance
                # exceeds a 100-iteration delta — 500 iterations put
                # the delta 30-50x above it (BENCH_NOTES noise note).
                "none@8": prep("none", 8, -1.0, 5),
                "none@508": prep("none", 508, -1.0, 5),
                "secded@8": prep("secded", 8, -1.0, 5),
                "secded@508": prep("secded", 508, -1.0, 5),
                "lazy32@8": prep("secded", 8, -1.0, 5, ci=32),
                "lazy32@508": prep("secded", 508, -1.0, 5, ci=32),
            }
            best = {k: float("inf") for k in cfgs}
            for _round in range(3):
                for k, fn in cfgs.items():
                    best[k] = min(best[k], fn())

            sec_ms = best["secded"] * 1e3
            none_ms = best["none"] * 1e3
            lazy8_ms = best["lazy8"] * 1e3
            out["value"] = round(sec_ms, 3)
            out["vs_baseline"] = round(BASELINE_MS["secded"] / sec_ms, 2)
            out["abft_overhead_pct"] = round(
                (sec_ms - none_ms) / none_ms * 100, 1)
            out["lazy8_ms"] = round(lazy8_ms, 3)
            out["lazy8_overhead_pct"] = round(
                (lazy8_ms - none_ms) / none_ms * 100, 1)
            log(f"interleaved: none {none_ms:.2f} ms, secded {sec_ms:.2f} "
                f"({out['abft_overhead_pct']:+.1f}%), lazy8 {lazy8_ms:.2f} "
                f"({out['lazy8_overhead_pct']:+.1f}%)")
            out["modes_interleaved_ms"] = {}
            for mode in ALL_MODES:
                ms = best[mode] * 1e3
                ov = (ms - none_ms) / none_ms * 100
                out["modes_interleaved_ms"][mode] = round(ms, 3)
                log(f"  interleaved {mode:12s}: {ms:8.3f} ms "
                    f"({ov:+.1f}% vs none, reference "
                    f"{BASELINE_MS[mode] / ms:.0f}x)")

            def slope(a):
                return (best[f"{a}@508"] - best[f"{a}@8"]) / 500 * 1e6

            pit_none, pit_live, pit_l32 = (slope("none"), slope("secded"),
                                           slope("lazy32"))
            out["periter_none_us"] = round(pit_none, 1)
            out["periter_secded_live_us"] = round(pit_live, 1)
            out["periter_secded_lazy32_us"] = round(pit_l32, 1)
            out["periter_lazy32_overhead_pct"] = round(
                (pit_l32 - pit_none) / pit_none * 100, 1)
            log(f"per-iteration (slope): none {pit_none:.1f} us, secded "
                f"live {pit_live:.1f} us, secded ci32 {pit_l32:.1f} us "
                f"({(pit_l32 - pit_none) / pit_none * 100:+.1f}%)")
            # Streamed bandwidth / % of HBM speed-of-light per tier
            # (BASELINE '>= 80% of SoL' target, tracked as data —
            # VERDICT r4 item 7).  Bytes from the kernel plan; time
            # from the interleaved slope above.
            from abft_sparse_cg_tpu.solver.fused import (
                streamed_bytes_per_iter,
            )

            SOL_GBPS = 819.0
            for label, mode_mat, mode, pit in (
                    ("none", mats["none"], "none", pit_none),
                    ("secded_live", mats["secded"], "secded", pit_live)):
                by = streamed_bytes_per_iter(mode_mat, mode)
                if by and pit > 0:
                    g = by / (pit * 1e-6) / 1e9
                    out[f"gbps_{label}"] = round(g, 1)
                    out[f"sol_pct_{label}"] = round(g / SOL_GBPS * 100, 1)
                    log(f"  streamed {label}: {by / 1e6:.1f} MB/iter = "
                        f"{g:.0f} GB/s ({g / SOL_GBPS * 100:.0f}% SoL)")
        except Exception as e:  # noqa: BLE001 — keep sequential numbers
            log(f"interleaved protocol failed: {type(e).__name__}: "
                f"{str(e)[:300]}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
