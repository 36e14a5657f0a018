"""Microbenchmark of the SpMM backends on the current jax backend.

Usage: python tools/bench_kernels.py [V] [avg_deg] [F]
Times forward and forward+backward for:
  - xla: take + sorted segment_sum (segment.spmm)
  - ell: chunked gather+einsum ELL path (ops/ell.py)
Prints one JSON line per variant.
"""

import json
import sys
import time

import numpy as np


def timeit(fn, *args, iters=10):
    # force a device→host transfer per iteration: on the axon platform
    # block_until_ready does not reliably block (see CLAUDE.md)
    import jax.numpy as jnp
    s = float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax
    import jax.numpy as jnp
    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.ops import segment
    from neutronstarlite_tpu.ops.graph_ops import GraphTensors

    g = make_powerlaw_graph(v, deg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (v, f)).astype(np.float32))

    results = {}
    # pass gt as a jit ARGUMENT: closing over it would bake the slabs in as
    # HLO constants, which the remote compiler uploads (multi-minute stalls)
    fwd = jax.jit(lambda gt, x: gt.aggregate_neighbors(x))
    fwdbwd = jax.jit(lambda gt, x: jax.grad(
        lambda x_: jnp.sum(gt.aggregate_neighbors(x_) ** 2))(x))
    for backend in ("xla", "pallas"):
        gt = GraphTensors.from_graph(g, backend=backend)
        t_f = timeit(fwd, gt, x)
        t_fb = timeit(fwdbwd, gt, x)
        results[backend] = {"fwd_ms": round(t_f * 1e3, 3),
                            "fwdbwd_ms": round(t_fb * 1e3, 3),
                            "fwd_gedges_s": round(g.num_edges / t_f / 1e9, 3)}
        print(json.dumps({"backend": backend, "V": v, "E": int(g.num_edges),
                          "F": f, **results[backend],
                          "jax_backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
