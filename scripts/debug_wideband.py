"""Localize the wideband (rolled) megakernel cksum false-trigger.

Builds a wideband ELL matrix at a parameterized (n, k) shape, runs ONE
megakernel iteration with the ABFT_FUSED_DEBUG_CKSUM tap enabled, and
diffs the kernel's raw cksum accumulator and one chunk's streamed word
buffer against host-computed ground truth.  Splits the failure between
(a) word-DMA misaddressing and (b) accumulation/fold miscompiles.

Usage: python scripts/debug_wideband.py [--n 81920] [--k 25]
       [--mode sec7] [--cpu] [--chunk -1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=81920)
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--band", type=int, default=2500)
    ap.add_argument("--mode", default="sec7")
    ap.add_argument("--blocks", type=int, default=1)
    ap.add_argument("--iters", type=int, default=1,
                    help="kernel iterations to run (upto)")
    ap.add_argument("--cpu", action="store_true",
                    help="interpret mode on CPU instead of the TPU kernel")
    ap.add_argument("--chunk", type=int, default=-1,
                    help="which chunk's word buffer to dump (default G-1)")
    ap.add_argument("--trace", type=int, default=0,
                    help="rr trace length (solve path uses max_itrs)")
    ap.add_argument("--no-dbg", action="store_true",
                    help="production kernel (no debug tap outputs)")
    args = ap.parse_args()

    if not args.no_dbg:
        os.environ["ABFT_FUSED_DEBUG_CKSUM"] = "1"
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    from abft_sparse_cg_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from abft_sparse_cg_tpu.ecc import ECC_COL_MASK
    from abft_sparse_cg_tpu.formats import assemble, build_protected
    from abft_sparse_cg_tpu.ops.spmv import make_matrix_device
    from abft_sparse_cg_tpu.solver import fused as F
    from abft_sparse_cg_tpu.utils.matgen import spd_wideband

    print("device:", jax.devices()[0], flush=True)

    rows, cols, vals, n = spd_wideband(args.n, args.band, k=args.k)
    m = build_protected("csr", assemble(cols, rows, vals, n, args.blocks),
                        args.mode)
    n *= args.blocks
    assert m.exec_kind == "ell", m.exec_kind
    plan = F._plan(m, args.mode)
    assert plan is not None and plan.get("rolled"), plan
    G, D, W, ROWS, RR = (plan[k] for k in ("G", "D", "W", "ROWS", "RR"))
    S0, Hlo, WROWS, PACK = (plan[k] for k in ("S0", "Hlo", "WROWS", "PACK"))
    SW = plan["SW"]
    R = plan["R"]
    print(f"plan: G={G} D={D} W={W} ROWS={ROWS} S0={S0} Hlo={Hlo} "
          f"WROWS={WROWS} streaming={plan['streaming']} band={m.band}",
          flush=True)
    dbg_ci = args.chunk if args.chunk >= 0 else G - 1
    os.environ["ABFT_FUSED_DEBUG_CHUNK"] = str(dbg_ci)

    md = make_matrix_device(m, jnp.float32)

    # ---- replicate derive() for the rolled ELL tier -------------------
    def pack(a):
        return (a.reshape(D, RR, 128).transpose(1, 0, 2)
                .reshape(RR // PACK, PACK * D, 128))

    gather_w = m.layout.word_names.index(m.ell_gather_word)
    has_gidx = m.perm is not None
    mask_ecc = (m.ell_gather_word == "col"
                and args.mode in ("sed", "sec7", "sec8", "secded"))
    vals3 = pack(md.values)
    g = md.gidx if has_gidx else md.words[gather_w]
    if not has_gidx and mask_ecc:
        g = g & np.uint32(ECC_COL_MASK)
    rowblk = (jnp.arange(R, dtype=jnp.int32) >> 7) << 7
    local = g.astype(jnp.int32) + (S0 * 128 - rowblk)[None, :]
    local = jnp.clip(local, 0, WROWS * 128 - 1)
    grp = (jnp.arange(R, dtype=jnp.int32) >> 7) % ROWS
    local = local + ((Hlo - S0 + grp) * 128)[None, :]
    gsrc = pack(local).reshape(RR * D, 128)
    vals3 = vals3.reshape(RR * D, 128)
    wstack = jnp.stack([md.words[i] for i in SW]).reshape(W, D, RR, 128)
    cls = jnp.bitwise_xor.reduce(
        md.cksum[np.array(SW)].reshape(W, -1, 128), axis=1)
    ckall = jnp.repeat(cls.reshape(W, 8, 16), 8, axis=2)

    kern = F._make_kernel(plan, args.mode, 1e-8, args.trace, args.cpu)
    rng = np.random.default_rng(12345)
    b = np.zeros(R, np.float32)
    b[:n] = rng.random(n)
    b2 = jnp.asarray(b).reshape(RR, 128)
    x2 = jnp.zeros((RR, 128), jnp.float32)
    rr0 = jnp.float32(float((b * b).sum()))
    outs = kern(x2, b2, b2, None, vals3, gsrc, wstack, ckall, None,
                rr0, rr0, jnp.int32(0), jnp.int32(args.iters))
    (x2o, r2o, p2o, _tr, itr, rr, rz, trig, err) = outs[:9]
    print(f"itr={int(itr[0,0])} rr={float(rr[0,0]):.4g} "
          f"trig={int(trig[0,0])} err={int(err[0,0])}", flush=True)
    if args.no_dbg:
        dbg_ck = dbg_wb = None
    else:
        dbg_ck, dbg_wb = np.asarray(outs[-2]), np.asarray(outs[-1])

    # ---- trajectory check vs the jnp CG recurrence ---------------------
    from abft_sparse_cg_tpu.ops.spmv import make_spmv

    impl = make_spmv(m, jnp.float32, "none")
    xv = np.zeros(R, np.float32)
    rv = b.copy()
    pv = b.copy()
    rrv = float((rv * rv).sum())
    for it in range(int(itr[0, 0])):
        w = np.asarray(impl.fast(md, jnp.asarray(pv))).reshape(-1)
        pw = float((pv * w).sum())
        alpha = rrv / pw
        xv += alpha * pv
        rv -= alpha * w
        rr1 = float((rv * rv).sum())
        pv = rv + (rr1 / rrv) * pv
        rrv = rr1
        print(f"  ref iter {it}: rr={rrv:.6g} pw={pw:.6g}")
    for name, k2, ref in (("x", x2o, xv), ("r", r2o, rv), ("p", p2o, pv)):
        kv = np.asarray(k2).reshape(-1)
        d = np.abs(kv - ref)
        rel = d.max() / (np.abs(ref).max() + 1e-30)
        print(f"  {name}: max|diff|={d.max():.4g} rel={rel:.4g} "
              f"argmax={int(d.argmax())}")

    # ---- ground truth --------------------------------------------------
    if dbg_ck is None:
        return
    ws = np.asarray(wstack)                       # (W, D, RR, 128)
    exp_acc = np.bitwise_xor.reduce(
        np.bitwise_xor.reduce(
            ws.reshape(W, D, G, ROWS, 128), axis=1), axis=1)
    mis = dbg_ck != exp_acc
    print(f"acc mismatches: {mis.sum()} / {mis.size}")
    if mis.any():
        wi, rr_i, l_i = np.nonzero(mis)
        print("  planes hit:", np.unique(wi),
              "rows:", np.unique(rr_i)[:16],
              "lanes:", np.unique(l_i)[:16])
        i = (wi[0], rr_i[0], l_i[0])
        print(f"  first: {i} kernel={dbg_ck[i]:#010x} "
              f"expect={exp_acc[i]:#010x} "
              f"xor={dbg_ck[i] ^ exp_acc[i]:#010x}")

    exp_wb = ws[:, :, dbg_ci * ROWS:(dbg_ci + 1) * ROWS, :]
    wmis = dbg_wb != exp_wb
    print(f"wbuf (chunk {dbg_ci}) mismatches: {wmis.sum()} / {wmis.size}")
    if wmis.any():
        wi, d_i, rr_i, l_i = np.nonzero(wmis)
        print("  planes:", np.unique(wi), "slots:", np.unique(d_i)[:16],
              "rows:", np.unique(rr_i)[:16])
        i = (wi[0], d_i[0], rr_i[0], l_i[0])
        print(f"  first: {i} kernel={dbg_wb[i]:#010x} "
              f"expect={exp_wb[i]:#010x}")

    # ---- class-level view (what the in-kernel compare sees) -----------
    f8 = np.bitwise_xor.reduce(
        dbg_ck.reshape(W, ROWS // 8, 8, 128), axis=1)  # (W, 8, 128)
    blk = np.bitwise_xor.reduce(
        f8.reshape(W, 8, 16, 8), axis=3)               # (W, 8, 16)
    exp_blk = np.asarray(cls).reshape(W, 8, 16)
    bmis = blk != exp_blk
    print(f"class mismatches: {bmis.sum()} / {bmis.size}",
          np.argwhere(bmis)[:8].tolist())


if __name__ == "__main__":
    main()
