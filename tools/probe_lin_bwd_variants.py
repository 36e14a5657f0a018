"""Probe v3: attribute the GAT _lin_bwd_pass body cost (r4).

probe_packed_gather.py established gather cost is per 128-lane TILE
(~4.3 ns/slot/tile) and that fusing/packing the stats transport does not
help (fused132_math 265 ms ~= status quo 245 ms).  The bwd block body
(~9 ns/slot) dominates.  This probe times surgical variants of the real
pass on the real Reddit-scale bwd slabs to find which body op pays:

  full            status-quo _lin_bwd_pass              (expect ~245)
  const_stats     stats from row args, no narrow gather
  no_da           da replaced by a constant (skip the lane-reduce SDDMM)
  no_exp          a = da (skip exp/div chain)
  no_dspre        return dx only (skip the [bv] cross-lane output)
  dx_only         gather + einsum only, a as a row arg (floor + broadcast)
  perm_transport  _perm_bwd_scalar on fake fwd-layout a/dpre (the
                  alternative architecture: no recompute in bwd layout)

Usage: python tools/probe_lin_bwd_variants.py    (TPU)
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
    stats4 = jnp.asarray(r.standard_normal((vd_pad, 4)).astype(np.float32))
    xp = jnp.asarray(r.standard_normal((rows, f)).astype(np.float32))
    ssrc = jnp.asarray(r.standard_normal((rows,)).astype(np.float32))

    def rep(name, t, note=""):
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 2),
                          "ns_per_slot": round(t * 1e9 / slots, 2),
                          "note": note}), flush=True)

    def variant(mode):
        def run(gtbl, st, xrb_all, ss_all):
            bv = ell._slab_gated_blocks(rows, k, f, itemsize=gtbl.dtype.itemsize)

            def block(args):
                ib, wb, xrb, ssb = args
                ga = jnp.take(gtbl, ib, axis=0)            # [bv, K, F]
                if mode == "const_stats":
                    sdk = ssb[:, None] * 0.01
                    mk = ssb[:, None] * 0.02
                    sk = 1.0 + ssb[:, None] * 0.0
                    ink = ssb[:, None] * 0.03
                else:
                    stg = jnp.take(st, ib, axis=0)         # [bv, K, 4]
                    sdk, mk, ink = stg[..., 0], stg[..., 1], stg[..., 3]
                    sk = jnp.maximum(stg[..., 2], 1e-30)
                valid = wb != 0
                if mode == "no_da":
                    da = ssb[:, None] + jnp.zeros((1, k), jnp.float32)
                else:
                    da = jnp.einsum("vkf,vf->vk", ga, xrb,
                                    preferred_element_type=jnp.float32)
                pre = ssb[:, None] + sdk
                if mode == "no_exp":
                    a = da * 0.125
                else:
                    m = jnp.where(valid, jax.nn.leaky_relu(pre, 0.2),
                                  ell._NEG)
                    a = jnp.exp(m - mk) / sk
                dpre = a * (da - ink) * jnp.where(pre > 0, 1.0, 0.2)
                dx = jnp.einsum("vk,vkf->vf", a, ga,
                                preferred_element_type=jnp.float32)
                if mode == "no_dspre":
                    return dx
                return dx, jnp.sum(dpre, axis=1)

            out = ell._map_row_blocks(block, (eg.b_idx, eg.b_w, xrb_all,
                                              ss_all), rows, bv)
            if isinstance(out, tuple):
                return jnp.sum(out[0]) + jnp.sum(out[1])
            return jnp.sum(out)

        return jax.jit(run)

    for mode in ("full", "const_stats", "no_da", "no_exp", "no_dspre"):
        rep(mode, timeit(variant(mode), gc, stats4, xp, ssrc))

    @jax.jit
    def dx_only(gtbl, a_rows):
        # floor probe: gather + sublane einsum with a PER-ROW weight arg
        bv = ell._slab_gated_blocks(rows, k, f, itemsize=gtbl.dtype.itemsize)

        def block(args):
            ib, ab = args
            ga = jnp.take(gtbl, ib, axis=0)
            return jnp.einsum("vk,vkf->vf", ab, ga,
                              preferred_element_type=jnp.float32)

        return jnp.sum(ell._map_row_blocks(
            block, (eg.b_idx, jnp.broadcast_to(a_rows[:, None], (rows, k))),
            rows, bv))

    rep("dx_only", timeit(dx_only, gc, ssrc), "gather + einsum, a from args")

    # ---- perm-transport architecture ----
    kf = eg.f_idx.shape[1]
    a_f = jnp.asarray(r.random((vd_pad, kf)).astype(np.float32))
    dpre_f = jnp.asarray(r.random((vd_pad, kf)).astype(np.float32))
    a_t = jnp.asarray(r.random(eg.f_tail_idx.shape).astype(np.float32))
    dpre_t = jnp.asarray(r.random(eg.f_tail_idx.shape).astype(np.float32))

    @jax.jit
    def perm_transport(dp, dpt, aa, aat, gtbl):
        ds, dx = ell._perm_bwd_scalar(eg, dp, dpt, aa, aat, gtbl)
        return jnp.sum(ds) + jnp.sum(dx)

    rep("perm_transport",
        timeit(perm_transport, dpre_f, dpre_t, a_f, a_t, gc),
        "2-lane flat perm gather + slab_matvec (no recompute)")


if __name__ == "__main__":
    main()
