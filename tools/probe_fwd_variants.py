"""Probe the FORWARD excesses of the fused attention/gated ops (r5).

The r4 budget (bench_attention_budget.py) leaves both forwards above the
per-tile slot floor — attention_aggregate_linear 1.25x, gated_aggregate
_linear 1.61x — with the excess ASSERTED to be in-block math (the r4
closing table) but never probed, unlike the backwards (whose "2x over
model" turned out to be a model error + transport artifact,
probe_lin_bwd_variants.py). Same method here: surgical variants of the
real forward block bodies on the real Reddit-scale fwd slabs, each
removing ONE ingredient:

  GAT  _lin_stats_pass (one F-lane gather; SDDMM lane-reduce -> leaky ->
       exp -> weighted-sum einsum; outputs m,s [rows] + u [rows,F]):
    attn_full        status quo
    attn_no_sddmm    pre from a row arg (skip the x·a lane reduce)
    attn_no_exp      z = valid mask (skip leaky/exp/max chain)
    attn_no_u        m,s only (skip the z-weighted feature einsum)
    attn_u_only      u with z = w (gather + ONE einsum ~ matvec floor)

  GGCN _gated_chunked_fwd block (F-lane gather; MXU gate einsum -> per-
       LANE leaky/exp/max -> three outputs m,s [rows,F] + o [rows,F]):
    gated_full       status quo (gl mode)
    gated_no_gate    gs from a broadcast constant (skip the MXU matmul)
    gated_no_exp     z = valid (skip the per-lane softmax chain)
    gated_no_mso     o only with z = w broadcast (~ matvec floor)
    gated_blocks_f   status quo but blocks sized for F (not 2F) — the gl
                     mode gathers only F lanes yet still sizes blocks for
                     the 2F table of the non-linear mode

spmm_floor (slab_matvec on the same slabs) anchors everything.

Usage: python tools/probe_fwd_variants.py [F] [dtype]   (TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=6):
    import jax.numpy as jnp
    r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        s = float(jnp.sum(r[0] if isinstance(r, tuple) else r))  # noqa
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
    from neutronstarlite_tpu.ops.ell import (_NEG, _map_row_blocks,
                                             _slab_gated_blocks)

    g = make_powerlaw_graph(v, deg)
    eg = ell.build_ell_graph(g, agg_dtype=dtype)
    vd_pad, k = eg.f_idx.shape
    slots = vd_pad * k
    slope = 0.2

    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
    xc = eg.cast_in(x)
    a_vec = jnp.asarray(r.standard_normal(f).astype(np.float32))
    s_dst = jnp.asarray(r.standard_normal(vd_pad).astype(np.float32))
    gl = jnp.asarray((r.standard_normal((f, f)) * 0.2).astype(np.float32))
    g_dst = jnp.asarray(r.standard_normal((vd_pad, f)).astype(np.float32))

    out = {"F": f, "dtype": dtype, "fwd_base_slots": slots,
           "fwd_tail_slots": int(eg.f_tail_idx.size)}

    # ---- floor ----
    t = timeit(jax.jit(lambda e, xx: ell.slab_matvec(e.f_idx, e.f_w,
                                                     e.cast_in(xx))),
               eg, x)
    out["spmm_floor_ms"] = round(t * 1e3, 1)
    t_floor = t / slots

    # ---- GAT variants (base slabs only — tails excluded everywhere so
    # every variant covers the identical slot set) ----
    def attn_variant(mode):
        bv = _slab_gated_blocks(vd_pad, k, f, itemsize=xc.dtype.itemsize)

        def block(args):
            ib, wb, sdb = args
            xg = jnp.take(xc, ib, axis=0)
            valid = wb != 0
            if mode == "no_sddmm":
                pre = sdb[:, None] + jnp.zeros((1, k), jnp.float32)
            else:
                pre = jnp.einsum("vkf,f->vk", xg, a_vec,
                                 preferred_element_type=jnp.float32
                                 ) + sdb[:, None]
            if mode == "no_exp":
                z = jnp.where(valid, pre, 0.0)
                m_loc = jnp.max(z, axis=1)
            else:
                m = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
                m_loc = jnp.maximum(jnp.max(m, axis=1), _NEG / 2)
                z = jnp.where(valid, jnp.exp(m - m_loc[:, None]), 0.0)
            if mode == "u_only":
                z = wb.astype(jnp.float32)
            if mode == "no_u":
                u = jnp.zeros((z.shape[0], 1), jnp.float32)
            else:
                u = jnp.einsum("vk,vkf->vf", z, xg,
                               preferred_element_type=jnp.float32)
            return m_loc, jnp.sum(z, axis=1), u

        fn = jax.jit(lambda idx, w, sd: _map_row_blocks(
            block, (idx, w, sd), vd_pad, bv))
        return timeit(fn, eg.f_idx, eg.f_w, s_dst)

    for mode in ("full", "no_sddmm", "no_exp", "no_u", "u_only"):
        out[f"attn_{mode}_ms"] = round(attn_variant(mode) * 1e3, 1)

    # ---- GGCN variants ----
    def gated_variant(mode):
        glc = gl.astype(xc.dtype)
        width = f if mode == "blocks_f" else 2 * f
        bv = _slab_gated_blocks(vd_pad, k, width)

        def block(args):
            ib, wb, gd = args
            xg = jnp.take(xc, ib, axis=0)
            valid = (wb != 0)[:, :, None]
            if mode == "no_gate":
                gs = jnp.zeros((1, 1, f), xc.dtype)
            else:
                gs = jnp.einsum("vkf,fo->vko", xg, glc,
                                preferred_element_type=jnp.float32
                                ).astype(xg.dtype)
            pre = gs + gd[:, None, :]
            if mode == "no_exp":
                z = jnp.where(valid, pre.astype(jnp.float32), 0.0)
                m = jnp.max(z, axis=1)
            elif mode == "no_mso":
                z = jnp.broadcast_to(
                    wb.astype(jnp.float32)[:, :, None],
                    (wb.shape[0], k, f))
                m = jnp.zeros((wb.shape[0], f), jnp.float32)
            else:
                lk = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
                m = jnp.max(lk, axis=1)
                z = jnp.where(valid, jnp.exp(lk - m[:, None, :]), 0.0)
            o = jnp.sum(z * xg, axis=1)
            if mode == "no_mso":
                return o, o, o
            return m, jnp.sum(z, axis=1), o

        fn = jax.jit(lambda idx, w, gd: _map_row_blocks(
            block, (idx, w, gd), vd_pad, bv))
        return timeit(fn, eg.f_idx, eg.f_w, g_dst)

    for mode in ("full", "no_gate", "no_exp", "no_mso", "blocks_f"):
        out[f"gated_{mode}_ms"] = round(gated_variant(mode) * 1e3, 1)

    out["ns_per_slot_floor"] = round(t_floor * 1e9, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
