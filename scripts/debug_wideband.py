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
    ap.add_argument("--solve", action="store_true",
                    help="run the real make_fused_solver instead of a "
                         "bare kernel call")
    ap.add_argument("--jit", action="store_true",
                    help="jax.jit the solve (the backend's context)")
    ap.add_argument("--jit-derive", action="store_true",
                    help="with --jit (bare kernel): trace the derive() "
                         "input materialization into the same program")
    ap.add_argument("--carry-vec-only", action="store_true",
                    help="with --carry-md: keep the word planes loop-"
                         "invariant (only the CG vectors carry)")
    ap.add_argument("--carry-md", action="store_true",
                    help="with --jit: outer lax.while_loop whose carry "
                         "includes the word planes (the real solve's "
                         "structure — derive() re-runs per trip)")
    ap.add_argument("--reps", type=int, default=1,
                    help="re-dispatch the solve N times (timing protocol)")
    ap.add_argument("--wrap-while", action="store_true",
                    help="wrap the bare kernel call in a lax.while_loop "
                         "(the solve's execution context)")
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
    wstack = tuple(md.words[i].reshape(D, RR, 128) for i in SW)
    cls = jnp.bitwise_xor.reduce(
        md.cksum[np.array(SW)].reshape(W, -1, 128), axis=1)
    ckall = jnp.repeat(cls.reshape(W, 8, 16), 8, axis=2)

    rng = np.random.default_rng(12345)
    b = np.zeros(R, np.float32)
    b[:n] = rng.random(n)

    if args.solve:
        fus = F.make_fused_solver(m, args.mode, 1000, 1e-3,
                                  trace_rr=args.trace > 0,
                                  interpret=args.cpu)
        if args.jit:
            import jax as _jax

            fus = _jax.jit(fus)
        res = fus(md, jnp.asarray(b))
        for _ in range(args.reps - 1):
            res = fus(md, jnp.asarray(b))
        print(f"SOLVE iters={int(res.iterations)} rr={float(res.rr):.4g} "
              f"errcode={int(res.stats.errcode)} "
              f"corrected={int(res.stats.corrected_count)}", flush=True)
        return

    kern = F._make_kernel(plan, args.mode, 1e-8, args.trace, args.cpu)
    b2 = jnp.asarray(b).reshape(RR, 128)
    x2 = jnp.zeros((RR, 128), jnp.float32)
    rr0 = jnp.float32(float((b * b).sum()))
    if args.jit:
        import jax as _jax

        if args.jit_derive:
            # The solve's context: derive() traced together with the
            # kernel call — wstack/ckall/vals3/gsrc materialize inside
            # the jitted program.
            def run(words, gidx, cksum, values, x2, b2, rr0, it, upto):
                barrier = os.environ.get("ABFT_BARRIER", "")
                if "words" in barrier:
                    import jax as _j

                    words = _j.lax.optimization_barrier(words)
                v3 = pack(values).reshape(RR * D, 128)
                g_ = gidx if has_gidx else words[gather_w]
                if not has_gidx and mask_ecc:
                    g_ = g_ & np.uint32(ECC_COL_MASK)
                loc = g_.astype(jnp.int32) + (S0 * 128 - rowblk)[None, :]
                loc = jnp.clip(loc, 0, WROWS * 128 - 1)
                loc = loc + ((Hlo - S0 + grp) * 128)[None, :]
                gs = pack(loc).reshape(RR * D, 128)
                wst = tuple(words[i].reshape(D, RR, 128) for i in SW)
                cl = jnp.bitwise_xor.reduce(
                    cksum[np.array(SW)].reshape(W, -1, 128), axis=1)
                cka = jnp.repeat(cl.reshape(W, 8, 16), 8, axis=2)
                if "ckall" in os.environ.get("ABFT_BARRIER", ""):
                    import jax as _j

                    cka = _j.lax.optimization_barrier(cka)
                return kern(x2, b2, b2, None, v3, gs, wst, cka, None,
                            rr0, rr0, it, upto)

            if args.carry_md:
                def outer(words0, gidx, cksum, values, x2, b2, rr0):
                    def body(c):
                        done, words, x2, r2, p2, rr, rz, it, ntrig = c
                        if args.carry_vec_only:
                            words = words0   # words invariant
                        outs = run(words, gidx, cksum, values, x2, b2,
                                   rr0, it, jnp.int32(args.iters))
                        (x2o, r2o, p2o, _t, itr, rr_, rz_, trig,
                         err) = outs[:9]
                        trig = trig[0, 0] != 0
                        # "classify": touch the carried words (identity
                        # add of 0) so they are genuine carries, like
                        # the scrubbed planes the real loop feeds back.
                        words = tuple(w ^ jnp.uint32(0) for w in words)
                        done = (~trig) | (ntrig >= 3)
                        return (done, words, x2o, r2o, p2o, rr_[0, 0],
                                rz_[0, 0], itr[0, 0],
                                ntrig + trig.astype(jnp.int32))
                    c0 = (jnp.bool_(False), words0, x2, b2, b2, rr0, rr0,
                          jnp.int32(0), jnp.int32(0))
                    c = _jax.lax.while_loop(lambda c: ~c[0], body, c0)
                    return c[7], c[5], c[8]   # itr, rr, ntrig

                itr_, rr_, ntrig = _jax.jit(outer)(
                    md.words, md.gidx, md.cksum, md.values, x2, b2, rr0)
                print(f"CARRY itr={int(itr_)} rr={float(rr_):.4g} "
                      f"ntrig={int(ntrig)}", flush=True)
                return
            outs = _jax.jit(run)(md.words, md.gidx, md.cksum, md.values,
                                 x2, b2, rr0, jnp.int32(0),
                                 jnp.int32(args.iters))
        else:
            outs = _jax.jit(kern)(x2, b2, b2, None, vals3, gsrc, wstack,
                                  ckall, None, rr0, rr0, jnp.int32(0),
                                  jnp.int32(args.iters))
        (x2o, r2o, p2o, _tr, itr, rr, rz, trig, err) = outs[:9]
        print(f"JIT itr={int(itr[0,0])} rr={float(rr[0,0]):.4g} "
              f"trig={int(trig[0,0])} err={int(err[0,0])}", flush=True)
        if not args.no_dbg:
            dbg_ck, dbg_wb = np.asarray(outs[-2]), np.asarray(outs[-1])
            ws = np.stack([np.asarray(w) for w in wstack])
            exp_acc = np.bitwise_xor.reduce(np.bitwise_xor.reduce(
                ws.reshape(W, D, G, ROWS, 128), axis=1), axis=1)
            mis = dbg_ck != exp_acc
            print(f"acc mismatches: {mis.sum()} / {mis.size}")
            if mis.any():
                wi, rr_i, l_i = np.nonzero(mis)
                print("  planes:", np.unique(wi), "rows:",
                      np.unique(rr_i)[:16], "lanes:", np.unique(l_i)[:16])
            dbg_ci2 = args.chunk if args.chunk >= 0 else G - 1
            exp_wb = ws[:, :, dbg_ci2 * ROWS:(dbg_ci2 + 1) * ROWS, :]
            wmis = dbg_wb != exp_wb
            print(f"wbuf (chunk {dbg_ci2}) mismatches: "
                  f"{wmis.sum()} / {wmis.size}")
            if wmis.any():
                wi, d_i, rr_i, l_i = np.nonzero(wmis)
                print("  planes:", np.unique(wi), "slots:",
                      np.unique(d_i)[:16], "rows:", np.unique(rr_i)[:16])
        return
    if args.wrap_while:
        import jax as _jax

        def body(c):
            x2, r2, p2, rr, rz, it, _done = c
            outs = kern(x2, r2, p2, None, vals3, gsrc, wstack, ckall,
                        None, rr, rz, it, jnp.int32(args.iters))
            (x2o, r2o, p2o, _tr, itr, rr_, rz_, trig, err) = outs[:9]
            done = ((trig[0, 0] != 0) | (err[0, 0] != 0)
                    | (itr[0, 0] >= args.iters) | (rr_[0, 0] <= 1e-8))
            return (x2o, r2o, p2o, rr_[0, 0], rz_[0, 0], itr[0, 0], done)

        c = _jax.lax.while_loop(
            lambda c: ~c[-1], body,
            (x2, b2, b2, rr0, rr0, jnp.int32(0), jnp.bool_(False)))
        print(f"WHILE itr={int(c[5])} rr={float(c[3]):.4g} done", flush=True)
        return
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
    spmv = (impl.fast if impl.fast is not None
            else (lambda md, p: impl.full(md, p)[0]))
    if impl.fast_pw is not None:
        spmv = lambda md, p: impl.fast_pw(md, p)[0]  # noqa: E731
    xv = np.zeros(R, np.float32)
    rv = b.copy()
    pv = b.copy()
    rrv = float((rv * rv).sum())
    for it in range(int(itr[0, 0])):
        w = np.asarray(spmv(md, jnp.asarray(pv))).reshape(-1)
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
    # What the NEXT iteration's pw should be, from the kernel's own p —
    # if this is positive, the kernel's internal pw is the wrong one.
    pk = np.asarray(p2o).reshape(-1)
    wk = np.asarray(spmv(md, jnp.asarray(pk))).reshape(-1)
    print(f"  host pw(next) from kernel p: {float((pk * wk).sum()):.6g}")

    # ---- ground truth --------------------------------------------------
    if dbg_ck is None:
        return
    ws = np.stack([np.asarray(w) for w in wstack])   # (W, D, RR, 128)
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
