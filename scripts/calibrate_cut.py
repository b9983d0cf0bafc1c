"""Fit the band-split cut model from measured BENCH_TPU.jsonl rows.

The cut chooser (formats/split.py) prices a candidate split as

    cost = main_nnz * wrows * _MAIN_NS_PER_WROW + tail_nnz * _TAIL_NS
    wrows = 2 * (cut // 128) + 1

with constants measured on the round-2 UNROLLED shuffle tier.  The
round-3 absolute-row scan changes the per-window-row cost, so after the
hardware batch lands wideband/bandsplit rows (hw_batch steps 5/10), run

    python scripts/calibrate_cut.py [BENCH_TPU.jsonl ...]

to refit.  Fits per-iteration solve cost (solve_ms / iters) on
non-failed pallas rows by least squares:

    us/iter = base + n_coef * N + main_ns * nnz_main * wrows
              [+ tail_ns * nnz_tail]

separately for the unrolled tier (band <= 1920: ell + the bandsplit
mains) and the wideband scan tier (band > 1920), and prints suggested
constants next to the current ones with residual diagnostics.  It never
edits source: apply by updating _MAIN_NS_PER_WROW/_TAIL_NS (or a
per-tier pair) in formats/split.py by hand, with the fit quoted in the
commit message.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from abft_sparse_cg_tpu.formats import split as fsplit  # noqa: E402

UNROLLED_MAX = fsplit._BAND_CUT_MAX  # 1920


def wrows(band):
    return 2 * (band // 128) + 1


def load_rows(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    return rows


def usable(r):
    # DIA rows are excluded: the stencil kernel's cost is per-diagonal
    # (K), not per-window-row, and would contaminate the ELL fit.
    return (r.get("target") == "pallas" and not r.get("failed", True)
            and not r.get("error") and r.get("iters") and r.get("nnz")
            and r.get("mode") == "none" and r.get("ci", 1) == 1
            and r.get("exec_kind") in ("ell", "split"))


def fit(rows, with_tail):
    """rows -> (coeffs, pred, names). Columns: 1, N, main term[, tail]."""
    A, y = [], []
    for r in rows:
        m_nnz = r.get("main_nnz", r["nnz"])
        m_band = r.get("main_band", r["band"])
        t_nnz = r.get("tail_nnz", 0)
        cols = [1.0, r["N"], m_nnz * wrows(m_band)]
        if with_tail:
            cols.append(t_nnz)
        A.append(cols)
        y.append(r["solve_ms"] * 1e3 / r["iters"])  # us/iter
    A = np.array(A)
    y = np.array(y)
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ coef
    names = ["base_us", "n_coef_us", "main_ns"] + (
        ["tail_ns"] if with_tail else [])
    return coef, pred, y, names


def main():
    import os

    paths = sys.argv[1:] or [p for p in
                             ("BENCH_TPU.jsonl", "BENCH_CALIB.jsonl")
                             if os.path.exists(p)]
    rows = [r for r in load_rows(paths) if usable(r)]
    if not rows:
        print("no usable pallas mode-none rows with nnz fields "
              "(need post-calibration-patch bench runs)")
        return 1

    def band_of(r):
        return r.get("main_band", r["band"])

    tiers = {
        "unrolled (band<=1920)": [r for r in rows
                                  if band_of(r) <= UNROLLED_MAX],
        "wideband scan (band>1920)": [r for r in rows
                                      if band_of(r) > UNROLLED_MAX],
    }
    print(f"current model: _MAIN_NS_PER_WROW={fsplit._MAIN_NS_PER_WROW} "
          f"_MAIN_NS_SCAN={fsplit._MAIN_NS_SCAN} "
          f"_TAIL_NS={fsplit._TAIL_NS}\n")
    for name, trs in tiers.items():
        if len(trs) < 3:
            print(f"{name}: only {len(trs)} rows — skipped")
            continue
        with_tail = any(r.get("tail_nnz") for r in trs)
        coef, pred, y, names = fit(trs, with_tail)
        print(f"{name}: {len(trs)} rows")
        for n, c in zip(names, coef):
            # main term is us per (entry*wrow) -> ns needs *1e3
            scale = 1e3 if n.endswith("_ns") else 1.0
            print(f"  {n:>10} = {c * scale:.4f}")
        err = np.abs(pred - y) / np.maximum(y, 1e-9)
        print(f"  rel residual: median {np.median(err):.1%} "
              f"max {err.max():.1%}")
        for r, p, t in zip(trs, pred, y):
            print(f"    {r['layout']:>10} band={band_of(r):>5} "
                  f"meas={t:8.1f} us/it pred={p:8.1f}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
