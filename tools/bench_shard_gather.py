"""Ground the small-shard gather assumption (VERDICT r3 weak-item 5).

The multi-chip projection divides the per-chip compute term by P
(0.0965/P), assuming the per-slot gather cost stays flat when each device
holds 1/P of the slots. This probe measures it single-chip: the headline
graph's forward slab pass restricted to the dst rows a P-way shard would
own (dst < V/P keeps E/P of the edges and V/P slab rows; sources still
span the full table, like a device's [local ∪ mirror] view), timed at
P = 1, 2, 4, 8.

Reports ms/pass and ns/slot per shard size — flat ns/slot validates the
projection's compute term; a rising curve quantifies the small-shard
penalty to fold in.

Usage: python tools/bench_shard_gather.py [F] [dtype]   (TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=8):
    import jax.numpy as jnp
    float(jnp.sum(fn(*args)))          # compile + sync (axon: forced xfer)
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
    src = np.empty(g.num_edges, np.int32)
    dst = np.empty(g.num_edges, np.int32)
    w = np.empty(g.num_edges, np.float32)
    fwd_eid = np.asarray(g.fwd_eid)
    src[fwd_eid] = g.fwd_src
    dst[fwd_eid] = g.fwd_dst
    w[fwd_eid] = g.fwd_weight

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (v, f)).astype(np.float32))
    spmm = jax.jit(lambda eg, xx: ell.spmm(eg, xx))

    for p in (1, 2, 4, 8):
        vd = v // p
        sel = dst < vd
        d = ell.build_ell_rect_np(src[sel], dst[sel], w[sel], vd, v)
        eg = ell.ell_from_np(d, vd, v, agg_dtype=dtype)
        slots = int(eg.f_idx.size + eg.f_tail_idx.size)
        t = timeit(spmm, eg, x)
        print(json.dumps({
            "p": p, "dst_rows": vd, "edges": int(sel.sum()),
            "fwd_slots": slots, "F": f, "dtype": dtype,
            "ms_per_pass": round(t * 1e3, 2),
            "ns_per_slot": round(t / slots * 1e9, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
