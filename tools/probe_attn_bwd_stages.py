"""Stage-level decomposition of the fused attention backwards (r4).

The r4 cost budget (BASELINE.md) showed both attention backwards at ~2x
their byte-and-slot model; this probe times each constituent pass as its
own jitted function at Reddit scale to locate the excess:

GAT attention_aggregate_linear backward
  da_pre          _lin_da_pre_pass over the fwd slabs (gather + 2 einsums)
  fwd_layout_full the whole fwd-layout section (da/pre -> a/inner/dpre/ds_dst)
  bwd_pass        _lin_bwd_pass over the bwd slabs (F-lane g gather + 4-lane
                  stats gather + in-block recompute)
  bwd_gather_x1   the F-lane g gather alone on the same slabs (floor)
  stats_gather    the 4-lane stats4 gather alone over the bwd slabs
  grad_total      jax.grad cross-check (= BASELINE.md bwd number + fwd)

GGCN gated_aggregate_linear backward (chunked pipeline)
  blk_inner       pass C (dst-major: x gather + MXU gate + 3 stat sums)
  blk_src         pass E (src-major: 4F stats gather + recompute)
  blk_src_gather  the 4F gather alone on the bwd slabs (floor for pass E)

Usage: python tools/probe_attn_bwd_stages.py [F] [dtype]    (TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=6):
    import jax.numpy as jnp
    r = fn(*args)                                       # warmup once
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        s = float(jnp.sum(r[0] if isinstance(r, tuple) else r))  # noqa: F841
    return (time.perf_counter() - t0) / iters


def main():
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    v = int(os.environ.get("NSL_BENCH_V", 232965))
    deg = int(os.environ.get("NSL_BENCH_DEG", 50))

    import jax
    import jax.numpy as jnp
    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.ops import ell

    g = make_powerlaw_graph(v, deg)
    eg = ell.build_ell_graph(g, agg_dtype=dtype)
    fwd_slots = int(eg.f_idx.size + eg.f_tail_idx.size)
    bwd_slots = int(eg.b_idx.size + eg.b_tail_idx.size)
    print(json.dumps({"stage": "shapes", "fwd_slots": fwd_slots,
                      "bwd_slots": bwd_slots,
                      "f_idx": list(eg.f_idx.shape),
                      "b_idx": list(eg.b_idx.shape),
                      "f_tail": list(eg.f_tail_idx.shape),
                      "b_tail": list(eg.b_tail_idx.shape)}), flush=True)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
    a_l = jnp.asarray(r.standard_normal(f).astype(np.float32))
    s_dst = jnp.asarray(r.standard_normal(v).astype(np.float32))
    gl = jnp.asarray((r.standard_normal((f, f)) * 0.2).astype(np.float32))
    g_dst = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
    gcot = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))

    def rep(stage, t, note=""):
        print(json.dumps({"stage": stage, "ms": round(t * 1e3, 2),
                          "note": note}), flush=True)

    # ---------------- GAT linear backward stages ----------------
    vd_pad = eg.f_idx.shape[0]
    vs_pad = eg.b_idx.shape[0]

    @jax.jit
    def da_pre(e, xx, al, sd, gg):
        xc = e.cast_in(xx)
        av = al.astype(xc.dtype)
        sdp = jnp.pad(sd.astype(jnp.float32), (0, vd_pad - sd.shape[0]))
        gp = e.cast_in(jnp.pad(gg, ((0, vd_pad - e.num_dst), (0, 0))))
        da, pre = ell._lin_da_pre_pass(e.f_idx, xc, av, sdp, gp)
        return jnp.sum(da) + jnp.sum(pre)

    rep("gat.da_pre_base", timeit(da_pre, eg, x, a_l, s_dst, gcot),
        "fwd-layout gather pass, base slab only")

    # fwd-layout full: run _attn_lin_bwd but stop before the bwd-layout
    # pass by monkey-patching?  Instead: reproduce the section inline.
    @jax.jit
    def fwd_layout_full(e, xx, al, sd, gg, bm, bs):
        xc = e.cast_in(xx)
        av = al.astype(xc.dtype)
        sdp = jnp.pad(sd.astype(jnp.float32), (0, vd_pad - sd.shape[0]))
        gp = e.cast_in(jnp.pad(gg, ((0, vd_pad - e.num_dst), (0, 0))))
        f_valid = e.f_w != 0
        da, pre = ell._lin_da_pre_pass(e.f_idx, xc, av, sdp, gp)
        m = jnp.where(f_valid, jax.nn.leaky_relu(pre, 0.2), ell._NEG)
        a = jnp.exp(m - bm[:, None]) / bs[:, None]
        inner = jnp.sum(a * da, axis=1)
        dpre = jnp.where(f_valid, a * (da - inner[:, None])
                         * jnp.where(pre > 0, 1.0, 0.2), 0.0)
        return jnp.sum(dpre) + jnp.sum(inner)

    big_m = jnp.zeros((vd_pad,), jnp.float32)
    big_s = jnp.ones((vd_pad,), jnp.float32)
    rep("gat.fwd_layout_full",
        timeit(fwd_layout_full, eg, x, a_l, s_dst, gcot, big_m, big_s),
        "da_pre + slab-wide a/inner/dpre elementwise")

    stats4 = jnp.stack([jnp.zeros((vd_pad,), jnp.float32), big_m, big_s,
                        jnp.zeros((vd_pad,), jnp.float32)], axis=1)

    @jax.jit
    def bwd_pass(e, xx, gg, st):
        xc = e.cast_in(xx)
        gp = e.cast_in(jnp.pad(gg, ((0, vd_pad - e.num_dst), (0, 0))))
        xp = jnp.pad(xc, ((0, vs_pad - xc.shape[0]), (0, 0)))
        ssrc = jnp.zeros((vs_pad,), jnp.float32)
        dx, dspre = ell._lin_bwd_pass(e.b_idx, e.b_w, gp, st, xp, ssrc,
                                      f, 0.2)
        return jnp.sum(dx) + jnp.sum(dspre)

    rep("gat.bwd_pass_base", timeit(bwd_pass, eg, x, gcot, stats4),
        "bwd-layout pass, base slab only (g gather + stats gather + math)")

    @jax.jit
    def bwd_gather_x1(e, gg):
        gp = e.cast_in(jnp.pad(gg, ((0, vd_pad - e.num_dst), (0, 0))))
        return jnp.sum(ell.slab_matvec(e.b_idx, e.b_w, gp))

    rep("gat.bwd_gather_x1", timeit(bwd_gather_x1, eg, gcot),
        "plain F-lane gather+reduce on the bwd base slab (floor)")

    @jax.jit
    def stats_gather(e, st):
        rows, k = e.b_idx.shape
        bv = ell._slab_gated_blocks(rows, k, 4)

        def block(args):
            (ib,) = args
            s = jnp.take(st, ib, axis=0)
            return jnp.sum(s, axis=(1, 2))

        return jnp.sum(ell._map_row_blocks(block, (e.b_idx,), rows, bv))

    rep("gat.stats_gather_4lane", timeit(stats_gather, eg, stats4),
        "4-lane stats4 gather alone over the bwd base slab")

    op_f = jax.jit(lambda e, xx, al, sd: ell.attention_aggregate_linear(
        e, xx, al, sd, 0.2))
    t_f = timeit(op_f, eg, x, a_l, s_dst)
    rep("gat.fwd", t_f, "attention_aggregate_linear forward")
    opg = jax.jit(lambda e, xx, al, sd: jax.grad(
        lambda a, b, c: jnp.sum(
            ell.attention_aggregate_linear(e, a, b, c, 0.2) ** 2),
        argnums=(0, 1, 2))(xx, al, sd)[0])
    t_fb = timeit(opg, eg, x, a_l, s_dst)
    rep("gat.grad_total", t_fb, "fwd+bwd via jax.grad (cross-check)")
    rep("gat.bwd_derived", t_fb - t_f, "grad_total - fwd")

    # ---------------- GGCN gated backward stages ----------------
    @jax.jit
    def gfwd(e, xx, gld, gd):
        out, (rmax, ssum, _) = ell._gated_chunked_fwd(e, xx, None, gd, 0.2,
                                                      gl=gld)
        return out, rmax, ssum

    out, rmax, ssum = gfwd(eg, x, gl, g_dst)
    rmax = jax.block_until_ready(rmax)
    t_gf = timeit(lambda e, xx, gld, gd: gfwd(e, xx, gld, gd)[0],
                  eg, x, gl, g_dst)
    rep("ggcn.fwd", t_gf, "gated chunked fwd (linear-gate)")

    @jax.jit
    def g_inner(e, xx, gld, gd, rm, ss, gg):
        xc = e.cast_in(xx)
        glc = gld.astype(xc.dtype)
        gdp = jnp.pad(gd, ((0, vd_pad - gd.shape[0]), (0, 0)))
        gp = jnp.pad(gg, ((0, vd_pad - e.num_dst), (0, 0)))
        bv2 = ell._slab_gated_blocks(vd_pad, e.f_idx.shape[1], 2 * f)

        def blk_inner(args):
            ib, wb, gdr, rmr, ssr, grr = args
            xg = jnp.take(xc, ib, axis=0)
            gs = jnp.einsum("vkf,fo->vko", xg, glc,
                            preferred_element_type=jnp.float32
                            ).astype(xg.dtype)
            pre = gs + gdr[:, None, :]
            valid = (wb != 0)[:, :, None]
            a = jnp.where(valid, jnp.exp(jax.nn.leaky_relu(pre, 0.2)
                                         - rmr[:, None, :])
                          / ssr[:, None, :], 0.0)
            da = xg * grr[:, None, :]
            dl = jnp.where(pre > 0, 1.0, 0.2)
            return (jnp.sum(a * da, axis=1), jnp.sum(a * dl * da, axis=1),
                    jnp.sum(a * dl, axis=1))

        i1, s1, s2 = ell._map_row_blocks(
            blk_inner, (e.f_idx, e.f_w, gdp, rm, ss, gp), vd_pad, bv2)
        return jnp.sum(i1) + jnp.sum(s1) + jnp.sum(s2)

    rep("ggcn.blk_inner_base",
        timeit(g_inner, eg, x, gl, g_dst, rmax, ssum, gcot),
        "pass C base: x gather + MXU gate + 3 stat sums")

    stats4f = eg.cast_in(jnp.concatenate(
        [jnp.pad(g_dst, ((0, vd_pad - g_dst.shape[0]), (0, 0))),
         jnp.pad(gcot, ((0, vd_pad - eg.num_dst), (0, 0))) / ssum,
         rmax, jnp.zeros((vd_pad, f), jnp.float32)], axis=-1))

    @jax.jit
    def g_src_pass(e, st, xx):
        xc = e.cast_in(xx)
        gsp = jnp.zeros((vs_pad, f), jnp.float32)
        xp = jnp.pad(xc.astype(jnp.float32),
                     ((0, vs_pad - xc.shape[0]), (0, 0)))
        kb = e.b_idx.shape[1]
        bv4 = ell._slab_gated_blocks(vs_pad, kb, 4 * f)

        def blk_src(args):
            ib, wb, gs, xs = args
            t = jnp.take(st, ib, axis=0)
            gd, gr2 = t[..., :f], t[..., f:2 * f]
            rm, inn2 = t[..., 2 * f:3 * f], t[..., 3 * f:]
            pre = gs[:, None, :] + gd
            valid = (wb != 0)[:, :, None]
            e2 = jnp.where(valid,
                           jnp.exp(jax.nn.leaky_relu(pre, 0.2) - rm), 0.0)
            dl = jnp.where(pre > 0, 1.0, 0.2)
            return (jnp.sum(e2 * dl * (xs[:, None, :] * gr2 - inn2), axis=1),
                    jnp.sum(e2 * gr2, axis=1))

        a, b = ell._map_row_blocks(blk_src, (e.b_idx, e.b_w, gsp, xp),
                                   vs_pad, bv4)
        return jnp.sum(a) + jnp.sum(b)

    rep("ggcn.blk_src_base", timeit(g_src_pass, eg, stats4f, x),
        "pass E base: 4F stats gather + recompute")

    @jax.jit
    def g_src_gather(e, st):
        kb = e.b_idx.shape[1]
        bv4 = ell._slab_gated_blocks(vs_pad, kb, 4 * f)

        def blk(args):
            (ib,) = args
            t = jnp.take(st, ib, axis=0)
            return jnp.sum(t.astype(jnp.float32), axis=(1, 2))

        return jnp.sum(ell._map_row_blocks(blk, (e.b_idx,), vs_pad, bv4))

    rep("ggcn.blk_src_gather", timeit(g_src_gather, eg, stats4f),
        "4F-lane gather alone on the bwd base slab (floor for pass E)")

    og = jax.jit(lambda e, xx, gg, gd: jax.grad(
        lambda a, b, c: jnp.sum(
            ell.gated_aggregate_linear(e, a, b, c, 0.2) ** 2),
        argnums=(0, 1, 2))(xx, gg, gd)[0])
    t_gfb = timeit(og, eg, x, gl, g_dst)
    rep("ggcn.grad_total", t_gfb, "fwd+bwd via jax.grad (cross-check)")
    rep("ggcn.bwd_derived", t_gfb - t_gf, "grad_total - fwd")


if __name__ == "__main__":
    main()
