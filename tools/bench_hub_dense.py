"""Probe for the hub-dense decomposition (hot-dst rows via a dense MXU
matmul, remaining edges via the ELL slabs).

Measures, on the headline bench graph:
  1. edge coverage of the top-H in-degree vertices (how many real slots the
     filtered slab saves);
  2. gather cost all-real vs hot-edges-redirected-to-row-0 (the slab's
     padding behaviour: coalesced row-0 slots are ~free, so this simulates
     the filtered slab without rebuilding it);
  3. the dense A_hot[H,V] @ x[V,F] matmul + H-row scatter-add cost that
     replaces them.

Usage: python tools/bench_hub_dense.py [H ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=8):
    import jax.numpy as jnp
    s = float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    hs = [int(a) for a in sys.argv[1:]] or [1024, 4096]
    v, deg, f = 232_965, 50, 128

    import jax
    import jax.numpy as jnp
    from bench import make_powerlaw_graph

    g = make_powerlaw_graph(v, deg)
    # in-degree from the CSC offsets
    indeg = np.diff(np.asarray(g.fwd_offsets))
    order = np.argsort(-indeg)
    e = int(g.num_edges)
    src = np.asarray(g.fwd_src)          # gather ids of the fwd slab source
    dst = np.repeat(np.arange(v), indeg)  # CSC: row i owns indeg[i] edges

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((v, f)).astype(np.float32)
    x = jnp.asarray(x_np.astype("bfloat16"))

    gather = jax.jit(lambda tbl, ids: jnp.sum(
        jnp.take(tbl, ids, axis=0), axis=0))
    ids_all = jnp.asarray(src.astype(np.int32))
    t_all = timeit(gather, x, ids_all)
    print(json.dumps({"probe": "gather_all", "E": e,
                      "ms": round(t_all * 1e3, 2)}), flush=True)

    for h in hs:
        hot = order[:h]
        hot_mask = np.zeros(v, bool)
        hot_mask[hot] = True
        covered = hot_mask[dst]            # edges whose dst is hot
        frac = covered.mean()
        # simulate the filtered slab: redirect covered slots to row 0
        ids_f = np.where(covered, 0, src).astype(np.int32)
        t_f = timeit(gather, x, jnp.asarray(ids_f))
        # dense replacement: A_hot [H, V] bf16 @ x [V, F] + scatter-add.
        # Values don't matter for timing; build on device (a host [H,V]
        # float64 temp would be ~8 GB)
        a_hot = jnp.ones((h, v), "bfloat16") * 0.01
        hot_j = jnp.asarray(hot.astype(np.int32))

        def dense_part(a_hot, x, out, hot_j):
            y = a_hot @ x
            return out.at[hot_j].add(y)

        out0 = jnp.zeros((v, f), "bfloat16")
        t_d = timeit(jax.jit(dense_part), a_hot, x, out0, hot_j)
        print(json.dumps({
            "probe": "hub", "H": h, "edge_coverage": round(float(frac), 4),
            "gather_filtered_ms": round(t_f * 1e3, 2),
            "dense_ms": round(t_d * 1e3, 2),
            "combined_ms": round((t_f + t_d) * 1e3, 2),
            "vs_all_ms": round(t_all * 1e3, 2),
            "a_hot_MB": round(h * v * 2 / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
