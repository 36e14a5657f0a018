"""Probe v4: single-tile packed-gather attention backward, math in packed
[.., P, 2] space (no slot-level lane interleave).

probe_lin_bwd_variants.py showed the bwd block runs at the gather floor
(4.85 ns/slot) when the per-dst stats come from anywhere but a second
gather; every second-gather/multi-tile transport costs 8-13 ns/slot.
probe_packed_gather.py's packed attempt lost because it RESHAPED the
unpacked [bv,K,66,2] to [bv,K,132] per slot (lane interleave).  Here the
block math stays in packed space: g lanes as [bv,K,64,2] bf16, einsums
contract over (f,p) jointly, and only row-level [bv,F] outputs reshape.

  gat_packed4d    u32[Vd,66] single gather; da/dx einsums in packed space
  gat_split2pass  standalone narrow stats gather pass + const-stats block
  ggcn_packed4d   pass E with u32[Vd,2F] (2 tiles instead of 4)
  + numeric equivalence vs the unpacked math on sane stats

Usage: python tools/probe_packed4d.py   (TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=6):
    import jax.numpy as jnp
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(jnp.sum(fn(*args)))  # noqa: F841
    return (time.perf_counter() - t0) / iters


def main():
    f = 128
    v = int(os.environ.get("NSL_BENCH_V", 232965))
    deg = int(os.environ.get("NSL_BENCH_DEG", 50))

    import jax
    import jax.numpy as jnp
    from jax import lax
    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.ops import ell

    g = make_powerlaw_graph(v, deg)
    eg = ell.build_ell_graph(g, agg_dtype="bfloat16")
    rows, k = eg.b_idx.shape
    slots = rows * k
    vd_pad = eg.f_idx.shape[0]

    r = np.random.default_rng(0)
    gc = eg.cast_in(jnp.asarray(
        r.standard_normal((vd_pad, f)).astype(np.float32)))
    # sane stats so exp() stays finite: sdk~N(0,1), M=2, S=8, inner~N(0,1)
    stats4 = jnp.stack([
        jnp.asarray(r.standard_normal(vd_pad).astype(np.float32)),
        jnp.full((vd_pad,), 2.0, jnp.float32),
        jnp.full((vd_pad,), 8.0, jnp.float32),
        jnp.asarray(r.standard_normal(vd_pad).astype(np.float32))], axis=1)
    xp = jnp.asarray(r.standard_normal((rows, f)).astype(np.float32))
    ssrc = jnp.asarray(r.standard_normal((rows,)).astype(np.float32))

    def rep(name, t, note=""):
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 2),
                          "ns_per_slot": round(t * 1e9 / slots, 2),
                          "note": note}), flush=True)

    # ---------------- GAT packed4d ----------------
    half = f // 2

    def pack_u32(tbl):
        L = tbl.shape[-1]
        return lax.bitcast_convert_type(
            tbl.reshape(tbl.shape[0], L // 2, 2), jnp.uint32)

    g_aug132 = jnp.concatenate([gc, stats4.astype(gc.dtype)], axis=1)
    packed66 = pack_u32(g_aug132)

    @jax.jit
    def gat_packed4d(ptbl, xrb_all, ss_all):
        bv = ell._slab_gated_blocks(rows, k, half + 2, itemsize=4)

        def block(args):
            ib, wb, xrb, ssb = args
            ga = jnp.take(ptbl, ib, axis=0)                # [bv,K,66] u32
            g4 = lax.bitcast_convert_type(ga[..., :half],
                                          jnp.bfloat16)    # [bv,K,64,2]
            st = lax.bitcast_convert_type(ga[..., half:],
                                          jnp.bfloat16
                                          ).astype(jnp.float32)  # [bv,K,2,2]
            sdk, mk = st[..., 0, 0], st[..., 0, 1]
            sk = jnp.maximum(st[..., 1, 0], 1e-30)
            ink = st[..., 1, 1]
            x4 = xrb.reshape(xrb.shape[0], half, 2)
            valid = wb != 0
            da = jnp.einsum("vkfp,vfp->vk", g4, x4,
                            preferred_element_type=jnp.float32)
            pre = ssb[:, None] + sdk
            m = jnp.where(valid, jax.nn.leaky_relu(pre, 0.2), ell._NEG)
            a = jnp.exp(m - mk) / sk
            dpre = a * (da - ink) * jnp.where(pre > 0, 1.0, 0.2)
            dx4 = jnp.einsum("vk,vkfp->vfp", a, g4,
                             preferred_element_type=jnp.float32)
            return dx4.reshape(dx4.shape[0], f), jnp.sum(dpre, axis=1)

        dx, ds = ell._map_row_blocks(block, (eg.b_idx, eg.b_w, xp, ssrc),
                                     rows, bv)
        return jnp.sum(dx) + jnp.sum(ds)

    rep("gat_packed4d", timeit(gat_packed4d, packed66, xp, ssrc),
        "ONE u32 66-lane gather, packed-space einsums")

    # reference: same math, unpacked table + separate stats gather (status quo)
    @jax.jit
    def gat_statusquo(gtbl, st, xrb_all, ss_all):
        bv = ell._slab_gated_blocks(rows, k, f, itemsize=gtbl.dtype.itemsize)

        def block(args):
            ib, wb, xrb, ssb = args
            ga = jnp.take(gtbl, ib, axis=0)
            stg = jnp.take(st, ib, axis=0)
            sdk, mk, ink = stg[..., 0], stg[..., 1], stg[..., 3]
            sk = jnp.maximum(stg[..., 2], 1e-30)
            valid = wb != 0
            da = jnp.einsum("vkf,vf->vk", ga, xrb,
                            preferred_element_type=jnp.float32)
            pre = ssb[:, None] + sdk
            m = jnp.where(valid, jax.nn.leaky_relu(pre, 0.2), ell._NEG)
            a = jnp.exp(m - mk) / sk
            dpre = a * (da - ink) * jnp.where(pre > 0, 1.0, 0.2)
            dx = jnp.einsum("vk,vkf->vf", a, ga,
                            preferred_element_type=jnp.float32)
            return dx, jnp.sum(dpre, axis=1)

        dx, ds = ell._map_row_blocks(block, (eg.b_idx, eg.b_w, xp, ssrc),
                                     rows, bv)
        return jnp.sum(dx) + jnp.sum(ds)

    t_sq = timeit(gat_statusquo, gc, stats4, xp, ssrc)
    rep("gat_statusquo", t_sq, "separate narrow stats gather (current)")

    # numeric equivalence: packed vs status quo with bf16 stats payloads
    sq = gat_statusquo(gc, eg.cast_in(stats4).astype(jnp.float32), xp, ssrc)
    pk = gat_packed4d(packed66, xp, ssrc)
    print(json.dumps({"probe": "gat_equiv_reldiff",
                      "val": float(abs(pk - sq) / (abs(sq) + 1e-9))}),
          flush=True)

    # ---------------- GAT split 2-pass ----------------
    @jax.jit
    def gat_split2pass(gtbl, st, xrb_all, ss_all):
        stg_full = jnp.take(st, eg.b_idx.reshape(-1), axis=0
                            ).reshape(rows, k, 4)           # standalone pass
        bv = ell._slab_gated_blocks(rows, k, f, itemsize=gtbl.dtype.itemsize)

        def block(args):
            ib, wb, stg, xrb, ssb = args
            ga = jnp.take(gtbl, ib, axis=0)
            sdk, mk, ink = stg[..., 0], stg[..., 1], stg[..., 3]
            sk = jnp.maximum(stg[..., 2], 1e-30)
            valid = wb != 0
            da = jnp.einsum("vkf,vf->vk", ga, xrb,
                            preferred_element_type=jnp.float32)
            pre = ssb[:, None] + sdk
            m = jnp.where(valid, jax.nn.leaky_relu(pre, 0.2), ell._NEG)
            a = jnp.exp(m - mk) / sk
            dpre = a * (da - ink) * jnp.where(pre > 0, 1.0, 0.2)
            dx = jnp.einsum("vk,vkf->vf", a, ga,
                            preferred_element_type=jnp.float32)
            return dx, jnp.sum(dpre, axis=1)

        dx, ds = ell._map_row_blocks(
            block, (eg.b_idx, eg.b_w, stg_full, xp, ssrc), rows, bv)
        return jnp.sum(dx) + jnp.sum(ds)

    rep("gat_split2pass", timeit(gat_split2pass, gc, stats4, xp, ssrc),
        "standalone narrow stats gather + const-stats-style block")

    # ---------------- GGCN packed4d pass E ----------------
    stats4f_bf = eg.cast_in(jnp.asarray(
        r.standard_normal((vd_pad, 4 * f)).astype(np.float32) * 0.1))
    packed2f = pack_u32(stats4f_bf)                        # [Vd, 2F] u32
    gsp = jnp.asarray(r.standard_normal((rows, f)).astype(np.float32))

    @jax.jit
    def ggcn_packed4d(ptbl, gs_all, xs_all):
        bv4 = ell._slab_gated_blocks(rows, k, 2 * f, itemsize=4)

        def blk_src(args):
            ib, wb, gs, xs = args
            t = jnp.take(ptbl, ib, axis=0)                 # [bv,K,2F] u32
            t4 = lax.bitcast_convert_type(t, jnp.bfloat16)  # [bv,K,2F,2]
            gd, gr2 = t4[..., :half, :], t4[..., half:f, :]
            rm = t4[..., f:f + half, :]
            inn2 = t4[..., f + half:, :]
            gs4 = gs.reshape(gs.shape[0], half, 2)
            xs4 = xs.reshape(xs.shape[0], half, 2)
            pre = gs4[:, None] + gd.astype(jnp.float32)
            valid = (wb != 0)[:, :, None, None]
            e = jnp.where(valid,
                          jnp.exp(jax.nn.leaky_relu(pre, 0.2)
                                  - rm.astype(jnp.float32)), 0.0)
            dl = jnp.where(pre > 0, 1.0, 0.2)
            dgs = jnp.sum(e * dl * (xs4[:, None] * gr2.astype(jnp.float32)
                                    - inn2.astype(jnp.float32)), axis=1)
            dx = jnp.sum(e * gr2.astype(jnp.float32), axis=1)
            return (dgs.reshape(dgs.shape[0], f),
                    dx.reshape(dx.shape[0], f))

        a, b = ell._map_row_blocks(blk_src, (eg.b_idx, eg.b_w, gsp, xp),
                                   rows, bv4)
        return jnp.sum(a) + jnp.sum(b)

    rep("ggcn_packed4d", timeit(ggcn_packed4d, packed2f, gsp, xp),
        "pass E via 2-tile packed gather (vs 4-tile, known ~256 ms)")


if __name__ == "__main__":
    main()
