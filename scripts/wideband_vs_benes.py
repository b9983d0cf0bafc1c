"""Hardware A/B: wideband banded-ELL scan kernel vs the Benes-route
flat tier on the SAME matrix (band 2499 at bench scale — the r4
wideband configuration that measured ~16 ms/solve).

The scan pays ~wrows * 0.0139 ns per entry (wrows = 2*ceil(band/128)+1
~ 41 at band 2499); the Benes route pays ~0.15-0.25 ns per padded slot
regardless of band — the crossover sits near band ~1-2k, so everything
the WIDEBAND tier serves may be cheaper on the Benes route.  This
probe decides the routing (appends probe=wb-vs-benes rows).
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
    from abft_sparse_cg_tpu.utils.platform import warm_device

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    warm_device()
    # The canonical wideband shape (spd_wideband: per-row jittered
    # offsets defeat the DIA stencil), bench scale via blocks.
    from abft_sparse_cg_tpu.utils.matgen import spd_wideband

    n = int(os.environ.get("WB_N", 81920))
    blocks = int(os.environ.get("WB_B", 10))
    band = int(os.environ.get("WB_BAND", 2499))
    rows, cols, vals, n = spd_wideband(n, band, 3)
    a = assemble(cols, rows, vals, n, blocks)
    b = np.random.default_rng(12345).random(a.N)
    out = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_TPU.jsonl"), "a")
    rec = {"probe": "wb-vs-benes", "N": int(a.N), "band": band}
    for label, force in (("wideband", None), ("benes", "flat")):
        try:
            t0 = time.time()
            kw = dict(reorder="none") if force is None else dict(
                reorder="none", force_exec=force, split="none")
            m = build_protected("csr", a, "secded", row_align=1024, **kw)
            rec[f"{label}_build_s"] = round(time.time() - t0, 1)
            rec[f"{label}_kind"] = m.exec_kind
            if m.exec_kind == "flat":
                rec[f"{label}_blocks"] = (
                    len(m.unstr_plan["blocks"])
                    if m.unstr_plan else None)
            for mode in ("none", "secded"):
                mm = (m if mode == "secded" else
                      build_protected("csr", a, mode, row_align=1024,
                                      **kw))
                res = create("pallas", mode).solve(
                    mm, b, 1000, 0.001, verbose=False, dtype="f32")
                rec[f"{label}_{mode}_ms"] = round(
                    res.solve_seconds * 1e3, 3)
                rec[f"iters_{label}_{mode}"] = int(res.iterations)
        except Exception as e:  # noqa: BLE001
            rec[f"{label}_error"] = str(e)[:300]
    print(json.dumps(rec), flush=True)
    out.write(json.dumps(rec) + "\n")
    out.close()


if __name__ == "__main__":
    main()
