"""In-process A/B: packed vs two-stream extremal route, REAL op, both F.

probe_ext_bwd_variants measured the standalone route pass 31% faster
with one packed [V,2F] gather, but the first post-wire SAGE epochs came
out WORSE in a slow-tunnel window.  This probe times the actual
aggregate_max fwd+bwd with BOTH route implementations in ONE process
(same tunnel, alternating order), at F=128 and F=602.

Usage: python tools/probe_ext_ab.py   (TPU)
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

    packed_route = ell._slab_route_win          # current (packed)

    def two_stream_route(idx, valid, perm, packed, k):
        """The pre-r5 two-stream form, reading the packed halves as the
        two separate tables (same signature so _route_ext_bwd works)."""
        rows = idx.shape[0]
        f = packed.shape[-1] // 2
        if rows == 0:
            return jnp.zeros((0, f), jnp.float32)
        win = packed[:, :f]
        gtab = jax.lax.bitcast_convert_type(packed[:, f:], jnp.float32)
        bv = _block_rows(rows, 3 * k * f * 4)

        def block(args):
            ib, vb, pb = args
            wg = jnp.take(win, ib, axis=0)
            gg = jnp.take(gtab, ib, axis=0)
            mask = vb[:, :, None] & (wg == pb[:, :, None])
            return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)

        return _map_row_blocks(block, (idx, valid, perm), rows, bv)

    r = np.random.default_rng(0)
    for f in (128, 602):
        x = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
        results = {}
        for _ in range(2):                       # alternate twice: A B A B
            for name, impl in (("packed", packed_route),
                               ("two_stream", two_stream_route)):
                ell._slab_route_win = impl
                op_f = jax.jit(lambda e, xx: ell.aggregate_max(e, xx))
                op_g = jax.jit(lambda e, xx: jax.grad(
                    lambda a: jnp.sum(ell.aggregate_max(e, a) ** 2))(xx))
                tf = timeit(op_f, eg, x)
                tg = timeit(op_g, eg, x)
                results.setdefault(name, []).append(
                    (round(tf * 1e3, 1), round((tg - tf) * 1e3, 1)))
        ell._slab_route_win = packed_route
        print(json.dumps({"F": f, "fwd/bwd_ms": results}), flush=True)


if __name__ == "__main__":
    main()
