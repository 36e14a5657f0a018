"""Ladder 3: why does ONE [7680,10]-row take cost 9.6 ms in the sampled
step? (probe_sampled_fwd2: take1 = 9.6 ms of the 11.0 ms forward; the
law floor for 76.8K one-tile slots is ~0.33 ms.)

x = _gather_table(features, tables[-1]) is a COMPUTED operand (itself a
gather + where), produced in the same scan body.  take(features, idx)
with computed indices measured ~free, so the suspects are (a) the
gather-of-gather producer fusion, (b) lax.scan, (c) dtype/layout of x.

  base          — take(x, idx1) consumed (the 9.6 ms reproduction)
  barrier       — optimization_barrier between _gather_table and take
  direct        — take(features, idx1 % V): same shape gather straight
                  from the invariant table (no producer)
  nowhere       — x built WITHOUT the padding where-mask (pure take)
  f32           — x cast to f32 before the take
  noscan        — the base body as a single jitted step (no lax.scan)

Usage: python tools/probe_sampled_fwd3.py   (TPU; digits21k on disk)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    import jax.numpy as jnp
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import load_dataset
    from neutronstarlite_tpu.training.minibatch import (
        MinibatchTrainer, _gather_table)
    from neutronstarlite_tpu.sampling.device_sampler import sample_block

    datum = load_dataset(InputInfo(
        vertices=22017, layer_string="64-64-10",
        edge_file="data/digits21k.edge.self",
        feature_file="data/digits21k.featuretable",
        label_file="data/digits21k.labeltable",
        mask_file="data/digits21k.mask"))

    cfg = InputInfo(vertices=datum.num_vertices, layer_string="64-64-10",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.3,
                    seed=7, dtype="bfloat16", epochs=1)
    cfg.fanout_string = "10-15"
    cfg.batch_size = 512
    cfg.sampler_backend = "device"
    tr = MinibatchTrainer(datum, cfg, model="gcn")
    tr.run(epochs=1)

    n_steps = 32
    batch = 512
    ds = tr.dev_sampler
    samp = (ds.offsets, ds.nbr, ds.out_degree, ds.in_degree)
    nids = tr.nids["train"]
    seeds = jnp.asarray(np.resize(nids, n_steps * batch).astype(
        np.int32).reshape(n_steps, batch))
    key = jax.random.PRNGKey(0)
    nv = datum.num_vertices
    print(json.dumps({"features_dtype": str(tr.features.dtype),
                      "features_shape": list(tr.features.shape)}),
          flush=True)

    samp_fn = partial(sample_block, fanout=tuple(ds.fanout),
                      num_vertices=ds.num_vertices, caps=tuple(ds.caps),
                      scaps=tuple(ds.scaps), replace=ds.replace,
                      include_dst=ds.include_dst)

    def scan_of(tail):
        @jax.jit
        def run(features, samp, seeds_2d, key):
            keys = jax.random.split(key, n_steps)

            def body(c, inp):
                s, k = inp
                block = samp_fn(k, *samp, s)
                dst0, tables, idxs, ws = block[:4]
                return c, tail(features, tables, idxs)
            _, acc = jax.lax.scan(body, 0.0, (seeds_2d, keys))
            return acc
        return run

    def base(f, tables, idxs):
        x = _gather_table(f, tables[-1])
        return jnp.sum(jnp.take(x, idxs[1], axis=0))

    def barrier(f, tables, idxs):
        x = jax.lax.optimization_barrier(_gather_table(f, tables[-1]))
        return jnp.sum(jnp.take(x, idxs[1], axis=0))

    def direct(f, tables, idxs):
        gi = jnp.take(tables[-1], idxs[1].reshape(-1) %
                      tables[-1].shape[0], axis=0)
        return jnp.sum(jnp.take(f, jnp.clip(gi, 0, nv - 1), axis=0))

    def nowhere(f, tables, idxs):
        x = jnp.take(f, jnp.clip(tables[-1], 0, nv - 1), axis=0)
        return jnp.sum(jnp.take(x, idxs[1], axis=0))

    def f32(f, tables, idxs):
        x = _gather_table(f, tables[-1]).astype(jnp.float32)
        return jnp.sum(jnp.take(x, idxs[1], axis=0))

    out = {}
    for name, tail in [("base", base), ("barrier", barrier),
                       ("direct", direct), ("nowhere", nowhere),
                       ("f32", f32)]:
        t = timeit(scan_of(tail), tr.features, samp, seeds, key)
        out[name] = round(t / n_steps * 1e3, 3)
        print(json.dumps({name: out[name]}), flush=True)

    # single-step (no scan) version of base, timed over 32 sequential calls
    @jax.jit
    def one(features, samp, seed, key):
        block = samp_fn(key, *samp, seed)
        dst0, tables, idxs, ws = block[:4]
        return base(features, tables, idxs)

    seed0 = seeds[0]
    one(tr.features, samp, seed0, key)
    t0 = time.perf_counter()
    for i in range(32):
        r = one(tr.features, samp, seed0, key)
    float(r)
    out["noscan"] = round((time.perf_counter() - t0) / 32 * 1e3, 3)
    print(json.dumps({"noscan": out["noscan"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
