"""A/B round 2: three extremal-route transports, one process, F=128/602.

probe_ext_ab found packed-f32 beats a two-stream variant whose g stream
was f32 — but the ORIGINAL shipped two-stream gathered g at the agg
dtype (bf16), and floor-normalized numbers suggest g's BYTE width
matters here even though the per-tile law discounts bytes for ≥1-tile
rows.  Decisive three-way, alternating in one process:

  two_bf16   — original: win i32 stream + g bf16 stream
  packed_f32 — one [V, 2F] i32 stream (win ∥ f32-bitcast g)
  pair_bf16  — one [V, 1.5F] i32 stream (win ∥ PAIR-packed bf16 g:
               two bf16 lanes per i32 lane) — two-stream bytes, one
               stream

Usage: python tools/probe_ext_ab2.py   (TPU)
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
    import jax
    import jax.numpy as jnp
    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.ops import ell
    from neutronstarlite_tpu.ops.ell import _block_rows, _map_row_blocks

    v, deg = 232965, 50
    g = make_powerlaw_graph(v, deg)
    eg = ell.build_ell_graph(g, agg_dtype="bfloat16")
    idx, valid, perm = eg.b_idx, eg.b_w != 0, eg.b_perm
    rows, k = idx.shape
    vd_pad = eg.f_idx.shape[0]
    r = np.random.default_rng(0)
    n_pos = vd_pad * eg.f_idx.shape[1] + eg.f_tail_idx.size + 1

    # spmm floor for cross-run normalization
    for f in (128, 602):
        x = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
        t_floor = timeit(jax.jit(lambda e, xx: ell.spmm(e, xx)), eg, x)
        win = jnp.asarray(r.integers(0, n_pos, (vd_pad, f)).astype(np.int32))
        gf = r.standard_normal((vd_pad, f)).astype(np.float32)
        g32 = jnp.asarray(gf)
        g16 = jnp.asarray(gf.astype(jnp.bfloat16))
        bv = _block_rows(rows, 3 * k * f * 4)

        def run_blocks(block):
            return _map_row_blocks(block, (idx, valid, perm), rows, bv)

        def two_bf16(win, g16):
            def block(args):
                ib, vb, pb = args
                wg = jnp.take(win, ib, axis=0)
                gg = jnp.take(g16, ib, axis=0).astype(jnp.float32)
                mask = vb[:, :, None] & (wg == pb[:, :, None])
                return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
            return run_blocks(block)

        pk32 = jnp.concatenate(
            [win, jax.lax.bitcast_convert_type(g32, jnp.int32)], axis=1)

        def packed_f32(pk32, _):
            def block(args):
                ib, vb, pb = args
                both = jnp.take(pk32, ib, axis=0)
                wg = both[:, :, :f]
                gg = jax.lax.bitcast_convert_type(both[:, :, f:],
                                                  jnp.float32)
                mask = vb[:, :, None] & (wg == pb[:, :, None])
                return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
            return run_blocks(block)

        half = f // 2
        pk16 = jnp.concatenate(
            [win, jax.lax.bitcast_convert_type(
                g16.reshape(vd_pad, half, 2), jnp.int32)], axis=1)

        def pair_bf16(pk16, _):
            def block(args):
                ib, vb, pb = args
                both = jnp.take(pk16, ib, axis=0)       # [bv, K, 1.5F] i32
                wg = both[:, :, :f]
                gg = jax.lax.bitcast_convert_type(
                    both[:, :, f:], jnp.bfloat16).reshape(
                        both.shape[0], both.shape[1], f).astype(jnp.float32)
                mask = vb[:, :, None] & (wg == pb[:, :, None])
                return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
            return run_blocks(block)

        res = {"F": f, "floor_ms": round(t_floor * 1e3, 1)}
        for _ in range(2):
            for name, fn, a, b in (("two_bf16", two_bf16, win, g16),
                                   ("packed_f32", packed_f32, pk32, None),
                                   ("pair_bf16", pair_bf16, pk16, None)):
                t = timeit(jax.jit(fn), a, b)
                res.setdefault(name, []).append(round(t * 1e3, 1))
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
