"""Per-op cost budget for the fused attention ops (VERDICT r3 weak-item 6;
model corrected r4-late to the measured PER-TILE gather law).

For attention_aggregate_linear (GAT) and gated_aggregate_linear (GGCN) at
Reddit scale, compare each op's MEASURED forward / backward time against
the per-tile slot model (BASELINE.md "r4-late per-tile gather law",
probe_lin_bwd_variants.py / probe_packed4d.py):

    t_pass = slots × t_floor × tile_factor
    tile_factor: 1.0  for rows ≤ 128 lanes (any block body rides free)
                 4.15 for rows > 128 lanes (measured flat for 2-4 tiles)
    standalone narrow stat gathers: ~1.3 × t_floor per slot

with t_floor the measured per-slot floor of this run's plain spmm pass on
the same slabs (~4.3 ns/slot; DMA-descriptor-bound, NOT bytes — the old
lane_bytes/230 GB/s byte model under-predicted every >1-tile pass ~4×).

Pass inventory:
  GAT linear  fwd : fwd_slots (x gather, ≤1 tile, stats in-reg)
              bwd : fwd_slots (da+pre pass) + bwd_slots (g rows)
                  + bwd_slots × 1.3 (standalone stats4 pre-gather when
                    F+4 > 128; rides the g gather lanes otherwise)
  GGCN linear fwd : fwd_slots (x gather, gate on the MXU)
              bwd : fwd_slots (pass C) + bwd_slots × 4.15 (pass E's
                    4F-lane = 4-tile stats gather — at ITS floor)

A pass whose measured time tracks its model is AT the floor; one that
exceeds it is the next fusion target.

Usage: python tools/bench_attention_budget.py [F] [dtype]   (TPU)
Env: NSL_BUDGET_OPS — comma-separated subset of {attn, gated, extremal}
     (spmm_floor always runs; e.g. NSL_BUDGET_OPS=extremal for the F=602
     SAGE-width run, where the attention/gated sections would dominate
     the wall for nothing)
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

    g = make_powerlaw_graph(v, deg)
    eg = ell.build_ell_graph(g, agg_dtype=dtype)
    fwd_slots = int(eg.f_idx.size + eg.f_tail_idx.size)
    bwd_slots = int(eg.b_idx.size + eg.b_tail_idx.size)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
    a_l = jnp.asarray(r.standard_normal(f).astype(np.float32))
    s_dst = jnp.asarray(r.standard_normal(v).astype(np.float32))
    gl = jnp.asarray((r.standard_normal((f, f)) * 0.2).astype(np.float32))
    g_dst = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))

    # measured per-slot floor: the plain spmm pass on the same fwd slabs
    spmm = jax.jit(lambda e, xx: ell.spmm(e, xx))
    t_spmm = timeit(spmm, eg, x)
    t_over = t_spmm / fwd_slots
    print(json.dumps({"op": "spmm_floor", "F": f, "dtype": dtype,
                      "fwd_slots": fwd_slots, "bwd_slots": bwd_slots,
                      "ms": round(t_spmm * 1e3, 2),
                      "ns_per_slot_floor": round(t_over * 1e9, 3)}),
          flush=True)

    def t_pass(slots, lanes):
        return slots * t_over * (1.0 if lanes <= 128 else 4.15)

    ops = set((os.environ.get("NSL_BUDGET_OPS") or "attn,gated,extremal")
              .split(","))

    # ---- GAT linear ----
    if "attn" in ops:
        op = jax.jit(lambda e, xx, al, sd: ell.attention_aggregate_linear(
            e, xx, al, sd, 0.2))
        opg = jax.jit(lambda e, xx, al, sd: jax.grad(
            lambda a, b, c: jnp.sum(
                ell.attention_aggregate_linear(e, a, b, c, 0.2) ** 2),
            argnums=(0, 1, 2))(xx, al, sd)[0])
        t_f = timeit(op, eg, x, a_l, s_dst)
        t_fb = timeit(opg, eg, x, a_l, s_dst)
        pred_f = t_pass(fwd_slots, f)
        # F+4 > 128: g gather (1 tile) + standalone stats pre-gather (1.3×)
        stats_term = 0.0 if f + 4 <= 128 else bwd_slots * t_over * 1.3
        pred_b = t_pass(fwd_slots, f) + t_pass(bwd_slots, min(f + 4, 128)) \
            + stats_term
        print(json.dumps({
            "op": "attention_aggregate_linear", "F": f, "dtype": dtype,
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd_pred_ms": round(pred_f * 1e3, 2),
            "bwd_ms": round((t_fb - t_f) * 1e3, 2),
            "bwd_pred_ms": round(pred_b * 1e3, 2),
            "fwdbwd_ms": round(t_fb * 1e3, 2),
        }), flush=True)

    # ---- SAGE extremal (aggregate_max) ----
    # fwd (train) = one x gather over the fwd slabs (+ winner recording
    # from the same gather); bwd = _slab_route_win over the bwd slabs:
    # TWO gather streams per slot (win rows + g rows) — the law prices a
    # second in-block stream like a multi-tile row (~4x the floor)
    if "extremal" in ops:
        op3 = jax.jit(lambda e, xx: ell.aggregate_max(e, xx))
        opg3 = jax.jit(lambda e, xx: jax.grad(
            lambda a: jnp.sum(ell.aggregate_max(e, a) ** 2))(xx))
        t_f3 = timeit(op3, eg, x)
        t_fb3 = timeit(opg3, eg, x)
        tiles = max(1, -(-f // 128))              # ceil(F / 128)
        pred_f3 = fwd_slots * t_over * (1.0 if tiles == 1 else 4.15)
        # bwd does NOT redo the fwd pass (winners are residuals); the
        # route pass gathers two F-lane tables per slot
        pred_b3 = bwd_slots * t_over * 2 * (1.0 if tiles == 1 else 4.15)
        print(json.dumps({
            "op": "aggregate_max", "F": f, "dtype": dtype,
            "fwd_ms": round(t_f3 * 1e3, 2),
            "fwd_pred_ms": round(pred_f3 * 1e3, 2),
            "bwd_ms": round((t_fb3 - t_f3) * 1e3, 2),
            "bwd_pred_ms": round(pred_b3 * 1e3, 2),
            "fwdbwd_ms": round(t_fb3 * 1e3, 2),
        }), flush=True)

    # ---- GGCN linear (chunked at this scale) ----
    if "gated" in ops:
        op2 = jax.jit(lambda e, xx, gg, gd: ell.gated_aggregate_linear(
            e, xx, gg, gd, 0.2))
        opg2 = jax.jit(lambda e, xx, gg, gd: jax.grad(
            lambda a, b, c: jnp.sum(
                ell.gated_aggregate_linear(e, a, b, c, 0.2) ** 2),
            argnums=(0, 1, 2))(xx, gg, gd)[0])
        t_f2 = timeit(op2, eg, x, gl, g_dst)
        t_fb2 = timeit(opg2, eg, x, gl, g_dst)
        pred_f2 = t_pass(fwd_slots, f)
        # pass C gathers x rows (F lanes, 1 tile; per-row args ~free);
        # pass E gathers the 4F-lane stats table (4 tiles)
        pred_b2 = t_pass(fwd_slots, f) + t_pass(bwd_slots, 4 * f)
        print(json.dumps({
            "op": "gated_aggregate_linear", "F": f, "dtype": dtype,
            "fwd_ms": round(t_f2 * 1e3, 2),
            "fwd_pred_ms": round(pred_f2 * 1e3, 2),
            "bwd_ms": round((t_fb2 - t_f2) * 1e3, 2),
            "bwd_pred_ms": round(pred_b2 * 1e3, 2),
            "fwdbwd_ms": round(t_fb2 * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
