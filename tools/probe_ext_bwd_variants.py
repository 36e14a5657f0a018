"""Surgical variants of the extremal backward's winner-route pass (r5).

`_slab_route_win` (ops/ell.py) gathers TWO [V, F] tables per block from
the same row indices — the recorded winners (int32) and the dst
cotangents — i.e. two gather streams in one block.  The budget table
measures it at 1.68× the clean two-pass model at F=128 (210.9 vs 125.7
ms), and BASELINE.md parks "a fused [win‖g] single-table transport" as
the candidate.  The per-tile gather law cuts both ways here: one packed
[V, 2F] table is ONE stream but >128-lane rows (~4.15×), two separate
F-lane streams are ≤1-tile but pay the second-stream penalty.  This
probe measures the actual contenders on the Reddit-scale backward slabs:

  win_only / g_only — one F-lane stream + the mask/select math (floor
                      check: what does ONE stream of this pass cost?)
  two_stream        — the shipped `_slab_route_win` (win take + g take)
  packed_i32        — ONE [V, 2F] int32 gather (g bitcast to i32, split
                      + bitcast back in-block; exact, fully general)
  packed_f32        — ONE [V, 2F] f32 gather (win cast to f32 — exact
                      only while positions < 2^24, probe-only)

Usage: python tools/probe_ext_bwd_variants.py [F] [dtype]   (TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=8):
    import jax.numpy as jnp
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(jnp.sum(fn(*args)))  # noqa: F841
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
    from neutronstarlite_tpu.ops.ell import _block_rows, _map_row_blocks

    g = make_powerlaw_graph(v, deg)
    eg = ell.build_ell_graph(g, agg_dtype=dtype)
    idx, valid, perm = eg.b_idx, eg.b_w != 0, eg.b_perm
    rows, k = idx.shape
    vd_pad = eg.f_idx.shape[0]

    r = np.random.default_rng(0)
    n_pos = vd_pad * eg.f_idx.shape[1] + eg.f_tail_idx.size + 1
    win = jnp.asarray(r.integers(0, n_pos, (vd_pad, f)).astype(np.int32))
    gtab = jnp.asarray(r.standard_normal((vd_pad, f)).astype(np.float32))
    gc = eg.cast_in(gtab)

    bv = _block_rows(rows, 3 * k * f * 4)
    print(json.dumps({"probe": "ext_bwd", "F": f, "dtype": dtype,
                      "bwd_base_slots": int(idx.size), "bv": int(bv)}),
          flush=True)

    def run_blocks(block):
        return _map_row_blocks(block, (idx, valid, perm), rows, bv)

    def v_two_stream(win, gc):
        def block(args):
            ib, vb, pb = args
            wg = jnp.take(win, ib, axis=0)
            gg = jnp.take(gc, ib, axis=0).astype(jnp.float32)
            mask = vb[:, :, None] & (wg == pb[:, :, None])
            return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
        return run_blocks(block)

    def v_win_only(win, gc):
        def block(args):
            ib, vb, pb = args
            wg = jnp.take(win, ib, axis=0)
            mask = vb[:, :, None] & (wg == pb[:, :, None])
            return jnp.sum(jnp.where(mask, 1.0, 0.0), axis=1)
        return run_blocks(block)

    def v_g_only(win, gc):
        def block(args):
            ib, vb, pb = args
            gg = jnp.take(gc, ib, axis=0).astype(jnp.float32)
            mask = vb[:, :, None] & (pb[:, :, None] > 0)
            return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
        return run_blocks(block)

    packed_i32 = jnp.concatenate(
        [win, jax.lax.bitcast_convert_type(gtab, jnp.int32)], axis=1)

    def v_packed_i32(packed, _):
        def block(args):
            ib, vb, pb = args
            both = jnp.take(packed, ib, axis=0)            # [bv, K, 2F] i32
            wg = both[:, :, :f]
            gg = jax.lax.bitcast_convert_type(both[:, :, f:], jnp.float32)
            mask = vb[:, :, None] & (wg == pb[:, :, None])
            return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
        return run_blocks(block)

    packed_f32 = jnp.concatenate([win.astype(jnp.float32), gtab], axis=1)

    def v_packed_f32(packed, _):
        def block(args):
            ib, vb, pb = args
            both = jnp.take(packed, ib, axis=0)            # [bv, K, 2F] f32
            wg = both[:, :, :f]
            gg = both[:, :, f:]
            mask = vb[:, :, None] & (wg == pb[:, :, None].astype(jnp.float32))
            return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
        return run_blocks(block)

    variants = [
        ("two_stream", v_two_stream, win, gc),
        ("win_only", v_win_only, win, gc),
        ("g_only", v_g_only, win, gc),
        ("packed_i32", v_packed_i32, packed_i32, gc),
        ("packed_f32", v_packed_f32, packed_f32, gc),
    ]
    for name, fn, a, b in variants:
        t = timeit(jax.jit(fn), a, b)
        print(json.dumps({name + "_ms": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
