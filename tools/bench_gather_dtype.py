"""Micro-A/B: slab row-gather cost vs storage dtype on the current backend.

The single-chip speed limit of the ELL engine is the random row gather
(BASELINE.md "r2 slab micro-A/Bs": 256 B rows run at ~55-70 GB/s effective,
>=1 KB rows at ~230 GB/s).  f32->bf16 storage bought 1.58x end-to-end, so
bytes matter at this row width.  This probes the next step: float8_e4m3fn /
int8 storage for the gathered feature table, casting to bf16 AFTER the
gather (the cast fuses into the gather consumer).

Usage: python tools/bench_gather_dtype.py [V] [slots] [F]
Prints one JSON line per dtype with ms/pass and effective GB/s over the
real gathered bytes.
"""

import json
import sys
import time


def timeit(fn, *args, iters=8):
    import jax.numpy as jnp
    s = float(jnp.sum(fn(*args)))  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(jnp.sum(fn(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 233_000
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 16_800_000
    f = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # zipf-ish slot ids like the bench graph's slabs (hot rows dominate)
    ids_np = (rng.zipf(1.3, size=slots) - 1) % v
    ids = jnp.asarray(ids_np.astype(np.int32))
    x_np = rng.standard_normal((v, f)).astype(np.float32)

    # gather + cast to bf16 + reduce (reduce models the einsum consumer and
    # keeps the gather from being DCE'd; cast fuses into the consumer)
    def make(dtype):
        tbl = jnp.asarray(x_np.astype(dtype)) if dtype != "int8" else \
            jnp.asarray((x_np * 16).clip(-127, 127).astype(np.int8))

        def run(tbl, ids):
            g = jnp.take(tbl, ids, axis=0).astype(jnp.bfloat16)
            return jnp.sum(g, axis=0)

        return jax.jit(run), tbl

    for name, dtype in (("float32", np.float32), ("bfloat16", "bfloat16"),
                        ("float8_e4m3fn", "float8_e4m3fn"), ("int8", "int8")):
        try:
            fn, tbl = make(dtype)
            t = timeit(fn, tbl, ids)
        except Exception as e:  # dtype unsupported on this stack
            print(json.dumps({"dtype": name, "error": str(e)[:200]}))
            continue
        bytes_per_row = f * tbl.dtype.itemsize
        gbs = slots * bytes_per_row / t / 1e9
        print(json.dumps({
            "dtype": name, "V": v, "slots": slots, "F": f,
            "ms_per_pass": round(t * 1e3, 2),
            "row_bytes": bytes_per_row,
            "eff_GBs": round(gbs, 1),
            "ns_per_slot": round(t / slots * 1e9, 3),
            "jax_backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
