"""Surgical decomposition of the sampled FORWARD (r5 follow-up).

profile_sampled.py attributed the sampled step cost as sample 1.12 ms /
forward 9.94 ms / backward+update 0.09 ms (digits21k, batch 512, fanout
10-15, device sampler).  A backward that costs 1% of its forward is only
possible if the forward's cost sits in ops whose backward is free — the
prime suspect is the per-layer dropout RNG (two jax.random.bernoulli
draws over [scap, F] activations per step; bernoulli's VJP is a cheap
mask multiply, and the scan reuses nothing across steps).  The gather-law
floor for this shape is well under 1 ms/step (the deepest table is
[76.8K, 64] — one-tile rows, ~0.3 ms/pass), so ~10 ms has an excess to
attribute.

Ladder of 32-step-scan variants (each its own jit; same seeds; sampling
always included so differences isolate forward ingredients):

  sample            — device sampler only (the profile_sampled baseline)
  +gather           — + the deepest feature-table gather, consumed
  +gather+drop      — + ONE dropout over that [scap, F] table (isolates
                      the big bernoulli)
  fwd_nodrop        — full forward, drop_rate=0 (gathers + aggs + denses,
                      no RNG)
  fwd_full          — full forward, drop_rate=0.3 (the measured 9.94)

Usage: python tools/probe_sampled_fwd.py   (TPU; digits21k on disk)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x if not isinstance(x, (tuple, list)) else x[0]))


def timeit(fn, *args, iters=5):
    fn(*args)
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import load_dataset
    from neutronstarlite_tpu.training.minibatch import (
        MinibatchTrainer, _gather_table, run_sampled_forward)
    from neutronstarlite_tpu.nn import layers
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
    n_layers = len(cfg.layer_sizes) - 1

    samp_fn = partial(sample_block, fanout=tuple(ds.fanout),
                      num_vertices=ds.num_vertices, caps=tuple(ds.caps),
                      scaps=tuple(ds.scaps), replace=ds.replace,
                      include_dst=ds.include_dst)

    def scan_of(body_tail):
        """32-step scan: sample a block, then run body_tail(block, key)."""
        @jax.jit
        def run(params, features, samp, seeds_2d, key):
            keys = jax.random.split(key, n_steps)

            def body(c, inp):
                s, k = inp
                ks, kd = jax.random.split(k)
                block = samp_fn(ks, *samp, s)
                return c, body_tail(params, features, block, kd)
            _, acc = jax.lax.scan(body, 0.0, (seeds_2d, keys))
            return acc
        return run

    variants = {
        "sample": scan_of(
            lambda p, f, b, k: jnp.sum(b[1][-1])),
        "+gather": scan_of(
            lambda p, f, b, k: jnp.sum(_gather_table(f, b[1][-1]))),
        "+gather+drop": scan_of(
            lambda p, f, b, k: jnp.sum(layers.dropout(
                k, _gather_table(f, b[1][-1]), 0.3, True))),
        "fwd_nodrop": scan_of(
            lambda p, f, b, k: jnp.sum(run_sampled_forward(
                "gcn", p, f, b, k, training=True, drop_rate=0.0,
                n_layers=n_layers))),
        "fwd_full": scan_of(
            lambda p, f, b, k: jnp.sum(run_sampled_forward(
                "gcn", p, f, b, k, training=True, drop_rate=0.3,
                n_layers=n_layers))),
    }

    out = {"shape": "digits21k b512 f10-15",
           "caps": list(ds.caps), "scaps": list(ds.scaps)}
    for name, fn in variants.items():
        t = timeit(fn, tr.params, tr.features, samp, seeds, key)
        out[name + "_ms_per_step"] = round(t / n_steps * 1e3, 3)
        print(json.dumps({name: round(t / n_steps * 1e3, 3)}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
