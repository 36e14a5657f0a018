"""Ladder 2: inside the sampled forward's agg+dense chain (r5).

probe_sampled_fwd.py isolated the sampled step's ~10 ms to the two
_ell_agg hops + denses (sampling 1.12 ms, table gather ~0.05, dropout
~0.04).  The law floor for those hops is ~0.4 ms (76.8K + 7.7K gather
slots, one-tile rows), so something in take/einsum/dense lowers badly.
This ladder times each link (32-step scan incl. sampling, like probe 1):

  take1     — jnp.take(x, idxs[1]) consumed      ([7680,10,64] from 22K)
  agg1      — take1 + einsum                      (hop 1 _ell_agg)
  dense1    — agg1 + relu(y@w)
  agg0      — dense1 + hop 0 _ell_agg             ([512,15,64])
  fwd       — + final dense (== fwd_nodrop from probe 1)
  agg1_mr   — agg1 with the einsum replaced by explicit mult+reduce
  take1_1d  — take with FLAT indices ([76800] then reshape)

Usage: python tools/probe_sampled_fwd2.py   (TPU; digits21k on disk)
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

    samp_fn = partial(sample_block, fanout=tuple(ds.fanout),
                      num_vertices=ds.num_vertices, caps=tuple(ds.caps),
                      scaps=tuple(ds.scaps), replace=ds.replace,
                      include_dst=ds.include_dst)

    w1 = tr.params[0]["w"]
    w2 = tr.params[1]["w"]

    def scan_of(tail):
        @jax.jit
        def run(params, features, samp, seeds_2d, key):
            keys = jax.random.split(key, n_steps)

            def body(c, inp):
                s, k = inp
                block = samp_fn(k, *samp, s)
                dst0, tables, idxs, ws = block[:4]
                x = _gather_table(features, tables[-1])
                return c, tail(x, idxs, ws)
            _, acc = jax.lax.scan(body, 0.0, (seeds_2d, keys))
            return acc
        return run

    def agg(idx, w, x):
        g = jnp.take(x, idx, axis=0)
        return jnp.einsum("rk,rkf->rf", w, g,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    def agg_mr(idx, w, x):
        g = jnp.take(x, idx, axis=0)
        return jnp.sum(w[:, :, None] * g.astype(jnp.float32),
                       axis=1).astype(x.dtype)

    variants = {
        "take1": lambda x, idxs, ws: jnp.sum(jnp.take(x, idxs[1], axis=0)),
        "take1_1d": lambda x, idxs, ws: jnp.sum(
            jnp.take(x, idxs[1].reshape(-1), axis=0)),
        "agg1": lambda x, idxs, ws: jnp.sum(agg(idxs[1], ws[1], x)),
        "agg1_mr": lambda x, idxs, ws: jnp.sum(agg_mr(idxs[1], ws[1], x)),
        "dense1": lambda x, idxs, ws: jnp.sum(
            jax.nn.relu(agg(idxs[1], ws[1], x) @ w1)),
        "agg0": lambda x, idxs, ws: jnp.sum(
            agg(idxs[0], ws[0],
                jax.nn.relu(agg(idxs[1], ws[1], x) @ w1))),
        "fwd": lambda x, idxs, ws: jnp.sum(
            agg(idxs[0], ws[0],
                jax.nn.relu(agg(idxs[1], ws[1], x) @ w1)) @ w2),
    }
    out = {}
    for name, tail in variants.items():
        t = timeit(scan_of(tail), tr.params, tr.features, samp, seeds, key)
        out[name] = round(t / n_steps * 1e3, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
