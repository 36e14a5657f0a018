"""A/B probe: tile-packed gathers (2 bf16 lanes per u32) vs the status quo.

probe_attn_bwd_stages.py showed gather cost on this chip is per 128-lane
TILE (4F bf16 = 512 lanes = 4 tiles = 17-18 ns/slot) with an extra
pathology for NARROW tables ([Vd, 4] f32 = 15.3 ns/slot vs 4.3 for a full
tile).  Since bf16 values are 16-bit and TPU lanes are 32-bit, a bf16
table with L lanes can be bitcast to a u32 table with L/2 lanes — halving
the tile count per gathered row, losslessly.  This probe times:

  g128_bf16        [Vd, 128] bf16 gather (1 tile)            — floor ref
  narrow4_f32      [Vd, 4]   f32 stats gather                — known bad
  pad128_f32       [Vd, 128] f32 stats gather (padded)       — f32-mode fix
  fused132_bf16    [Vd, 132] bf16 single gather (2 tiles)    — naive fuse
  packed66_u32     [Vd, 66]  u32 packed g+stats (1 tile)     — bf16 fix
  packed66_math    packed66 + full _lin_bwd_pass block math  — end cost
  ggcn512_bf16     [Vd, 512] bf16 stats gather (4 tiles)     — known bad
  ggcn256_u32      [Vd, 256] u32 packed stats (2 tiles)      — bf16 fix

plus a numeric equivalence check (packed vs unpacked block outputs).

Usage: python tools/probe_packed_gather.py     (TPU)
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
    gt = jnp.asarray(r.standard_normal((vd_pad, f)).astype(np.float32))
    st4 = jnp.asarray(r.standard_normal((vd_pad, 4)).astype(np.float32))
    st512 = jnp.asarray(
        r.standard_normal((vd_pad, 4 * f)).astype(np.float32))

    def rep(name, t, note=""):
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 2),
                          "ns_per_slot": round(t * 1e9 / slots, 2),
                          "note": note}), flush=True)

    def pack_u32(tbl_bf16):
        L = tbl_bf16.shape[-1]
        return lax.bitcast_convert_type(
            tbl_bf16.reshape(tbl_bf16.shape[0], L // 2, 2), jnp.uint32)

    def unpack_bf16(t_u32):
        b = lax.bitcast_convert_type(t_u32, jnp.bfloat16)
        return b.reshape(b.shape[:-2] + (b.shape[-2] * 2,))

    # correctness: pack/unpack round trip on device
    tb = gt.astype(jnp.bfloat16)
    rt = unpack_bf16(pack_u32(tb))
    assert bool(jnp.all(rt == tb)), "bitcast round-trip mismatch"
    print(json.dumps({"probe": "roundtrip", "ok": True}), flush=True)

    def gather_sum(tbl, lanes_f32_sum=True):
        bv = ell._slab_gated_blocks(rows, k, tbl.shape[-1],
                                    itemsize=tbl.dtype.itemsize)

        def block(args):
            (ib,) = args
            t = jnp.take(tbl, ib, axis=0)
            if t.dtype == jnp.uint32:
                t = unpack_bf16(t)
            return jnp.sum(t.astype(jnp.float32), axis=(1, 2))

        return jnp.sum(ell._map_row_blocks(block, (eg.b_idx,), rows, bv))

    jit_g = jax.jit(gather_sum)

    tb128 = gt.astype(jnp.bfloat16)
    rep("g128_bf16", timeit(jit_g, tb128), "1 tile, 256 B/slot")
    rep("narrow4_f32", timeit(jit_g, st4), "narrow stats table")
    pad128 = jnp.pad(st4, ((0, 0), (0, 124)))
    rep("pad128_f32", timeit(jit_g, pad128), "stats padded to one full tile")
    fused132 = jnp.concatenate([tb128, st4.astype(jnp.bfloat16)], axis=1)
    rep("fused132_bf16", timeit(jit_g, fused132), "2 tiles, 4 stray lanes")
    packed66 = pack_u32(jnp.pad(fused132, ((0, 0), (0, 0))))
    rep("packed66_u32", timeit(jit_g, packed66), "g+stats in ONE tile")

    st512b = st512.astype(jnp.bfloat16)
    rep("ggcn512_bf16", timeit(jit_g, st512b), "4 tiles (current pass E)")
    packed256 = pack_u32(st512b)
    rep("ggcn256_u32", timeit(jit_g, packed256), "2 tiles (packed pass E)")

    # ---- packed66 with the full _lin_bwd_pass math in-block ----
    xp = jnp.asarray(r.standard_normal((rows, f)).astype(np.float32))
    ssrc = jnp.asarray(r.standard_normal((rows,)).astype(np.float32))

    def bwd_math(tbl, packed):
        bv = ell._slab_gated_blocks(rows, k, tbl.shape[-1],
                                    itemsize=tbl.dtype.itemsize)

        def block(args):
            ib, wb, xrb, ssb = args
            ga = jnp.take(tbl, ib, axis=0)
            if packed:
                ga = unpack_bf16(ga)
            gslot = ga[..., :f]
            st = ga[..., f:f + 4].astype(jnp.float32)
            sdk, mk, ink = st[..., 0], st[..., 1], st[..., 3]
            sk = jnp.maximum(st[..., 2], 1e-30)
            valid = wb != 0
            da = jnp.einsum("vkf,vf->vk", gslot, xrb,
                            preferred_element_type=jnp.float32)
            pre = ssb[:, None] + sdk
            m = jnp.where(valid, jax.nn.leaky_relu(pre, 0.2), ell._NEG)
            a = jnp.exp(m - mk) / sk
            dpre = a * (da - ink) * jnp.where(pre > 0, 1.0, 0.2)
            dx = jnp.einsum("vk,vkf->vf", a, gslot,
                            preferred_element_type=jnp.float32)
            return dx, jnp.sum(dpre, axis=1)

        dx, ds = ell._map_row_blocks(block, (eg.b_idx, eg.b_w, xp, ssrc),
                                     rows, bv)
        return jnp.sum(dx) + jnp.sum(ds)

    jit_pm = jax.jit(lambda t: bwd_math(t, True))
    jit_um = jax.jit(lambda t: bwd_math(t, False))
    rep("packed66_math", timeit(jit_pm, packed66),
        "packed gather + full bwd block math")
    rep("fused132_math", timeit(jit_um, fused132),
        "2-tile gather + full bwd block math")
    # numeric equivalence packed vs fused (identical bf16 payloads)
    d = abs(float(jit_pm(packed66)) - float(jit_um(fused132)))
    print(json.dumps({"probe": "math_equiv_absdiff", "val": d}), flush=True)


if __name__ == "__main__":
    main()
