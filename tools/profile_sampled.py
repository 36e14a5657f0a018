"""Attribute the sampled path's seconds-per-pass (VERDICT r4 weak-item 4).

The r4 TTA table has sampled_device at 1.519 s per full digits21k train
pass (batch 512, fanout 10-15) while the r2 sampler record says 405
batches/s (digits, batch 256, fanout 5-10) — an order-of-magnitude gap
attributed nowhere. This tool decomposes one sampled "epoch" at the TTA
shape into its actual components:

  * per-SPLIT wall: an epoch is THREE passes (train + val + test —
    MinibatchTrainer.run), each quantized to whole lax.scan dispatches of
    DEVICE_STEPS_PER_CALL=32 sample+step units;
  * scan-step quantization: real batches vs executed scan steps (a split
    with 26 real batches still executes 32 full-compute steps — padding
    steps sample and forward, they only skip the weight update);
  * in-step cost: sample-only vs sample+forward vs full train step,
    timed as separate jits over one 32-step scan (same seeds);
  * the r2 reconciliation leg: the same decomposition at the r2 record's
    shape (batch 256, fanout 5-10) in the same process.

Usage: python tools/profile_sampled.py   (TPU; digits21k must exist —
       python tools/generate_dataset.py --real digits21k --out data/digits21k)
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
    sync(r if not isinstance(r, tuple) else r[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r if not isinstance(r, tuple) else r[0])
    return (time.perf_counter() - t0) / iters


def decompose(datum, batch, fanout_s, label):
    import jax
    import jax.numpy as jnp
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.training.minibatch import MinibatchTrainer

    cfg = InputInfo(vertices=datum.num_vertices,
                    layer_string=f"64-64-{datum.num_classes}",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.3,
                    seed=7, dtype="bfloat16", epochs=1)
    cfg.fanout_string = fanout_s
    cfg.batch_size = batch
    cfg.sampler_backend = "device"
    tr = MinibatchTrainer(datum, cfg, model="gcn")
    tr.run(epochs=1)                                 # compile everything

    # ---- per-split wall + quantization ----
    n_steps = tr.DEVICE_STEPS_PER_CALL
    splits = {}
    for split in ("train", "val", "test"):
        nids = tr.nids[split]
        real = -(-nids.size // batch)                 # ceil
        # replay the greedy DEVICE_SCAN_SIZES decomposition for the record
        calls, executed, rem = 0, 0, nids.size
        while rem > 0:
            s = next((z for z in tr.DEVICE_SCAN_SIZES if z * batch <= rem),
                     tr.DEVICE_SCAN_SIZES[-1])
            calls += 1
            executed += s
            rem -= min(rem, s * batch)
        t0 = time.perf_counter()
        tr.run_epoch(split)                           # includes final sync
        wall = time.perf_counter() - t0
        splits[split] = {"nids": int(nids.size), "real_batches": real,
                         "scan_calls": calls,
                         "executed_steps": executed,
                         "wall_s": round(wall, 3)}

    # ---- in-step decomposition over one 32-step scan ----
    ds = tr.dev_sampler
    samp = (ds.offsets, ds.nbr, ds.out_degree, ds.in_degree)
    nids = tr.nids["train"]
    seeds = jnp.asarray(
        np.resize(nids, n_steps * batch).astype(np.int32).reshape(
            n_steps, batch))
    key = jax.random.PRNGKey(0)

    from neutronstarlite_tpu.sampling.device_sampler import sample_block
    from neutronstarlite_tpu.training.minibatch import run_sampled_forward

    samp_fn = partial(sample_block, fanout=tuple(ds.fanout),
                      num_vertices=ds.num_vertices, caps=tuple(ds.caps),
                      scaps=tuple(ds.scaps), replace=ds.replace,
                      include_dst=ds.include_dst)

    @jax.jit
    def scan_sample(samp, seeds_2d, key):
        keys = jax.random.split(key, n_steps)

        def body(c, inp):
            s, k = inp
            block = samp_fn(k, *samp, s)
            # consume EVERY output — r5 found that consuming only the
            # tables lets XLA dead-code-eliminate the local-index relabel
            # (probe_sampled_fwd3/4), which silently moved ~9 ms/step of
            # sampler cost into the "forward" attribution
            tot = jnp.sum(block[0])
            for part in block[1:]:
                for a in part:
                    tot = tot + jnp.sum(a)
            return c, tot
        _, acc = jax.lax.scan(body, 0.0, (seeds_2d, keys))
        return acc

    @jax.jit
    def scan_fwd(params, features, labels_all, samp, seeds_2d, key):
        keys = jax.random.split(key, n_steps)
        n_layers = len(cfg.layer_sizes) - 1

        def body(c, inp):
            s, k = inp
            ks, kd = jax.random.split(k)
            block = samp_fn(ks, *samp, s)
            logits = run_sampled_forward("gcn", params, features, block,
                                         kd, training=True,
                                         drop_rate=cfg.drop_rate,
                                         n_layers=n_layers)
            return c, jnp.sum(logits)
        _, acc = jax.lax.scan(body, 0.0, (seeds_2d, keys))
        return acc

    full = tr._make_device_epoch(True, n_steps)

    t_samp = timeit(scan_sample, samp, seeds, key)
    t_fwd = timeit(scan_fwd, tr.params, tr.features, tr.labels_dev, samp,
                   seeds, key)
    t_full = timeit(lambda: full(tr.params, tr.opt_state, tr.features,
                                 tr.labels_dev, samp, seeds, key)[2])

    rec = {
        "shape": label, "batch": batch, "fanout": fanout_s,
        "splits": splits,
        "scan32_sample_only_ms": round(t_samp * 1e3, 1),
        "scan32_sample_fwd_ms": round(t_fwd * 1e3, 1),
        "scan32_full_step_ms": round(t_full * 1e3, 1),
        "per_step_ms": {
            "sample": round(t_samp / n_steps * 1e3, 2),
            "fwd_minus_sample": round((t_fwd - t_samp) / n_steps * 1e3, 2),
            "bwd_update_minus_fwd": round((t_full - t_fwd) / n_steps * 1e3,
                                          2),
        },
        "batches_per_s_trainsplit": round(
            splits["train"]["real_batches"] / splits["train"]["wall_s"], 1),
        "steps_per_s_executed": round(
            splits["train"]["executed_steps"] / splits["train"]["wall_s"],
            1),
    }
    print(json.dumps(rec), flush=True)
    del tr
    return rec


def main():
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import load_dataset

    d21 = load_dataset(InputInfo(
        vertices=22017, layer_string="64-64-10",
        edge_file="data/digits21k.edge.self",
        feature_file="data/digits21k.featuretable",
        label_file="data/digits21k.labeltable",
        mask_file="data/digits21k.mask"))
    decompose(d21, 512, "10-15", "tta_digits21k")

    dig = load_dataset(InputInfo(
        vertices=1797, layer_string="64-64-10",
        edge_file="data/digits.edge.self",
        feature_file="data/digits.featuretable",
        label_file="data/digits.labeltable",
        mask_file="data/digits.mask"))
    decompose(dig, 256, "5-10", "r2_digits")


if __name__ == "__main__":
    main()
