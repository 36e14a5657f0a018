"""Sampled-minibatch throughput at Reddit scale (GCNSAMPLESINGLE path).

Measures end-to-end batches/s and sampled-edges/s with the host sampler
(C++/OpenMP) feeding the device through the prefetch pipeline.

Usage: NSL_BENCH_V=... python tools/bench_sampled.py
Env:   NSL_BENCH_SAMPLED_MODEL=gcn|gat|sage|gin|commnet|ggcn
       NSL_BENCH_SAMPLER=host|device
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    v = int(os.environ.get("NSL_BENCH_V", 232965))
    deg = int(os.environ.get("NSL_BENCH_DEG", 50))
    batch = int(os.environ.get("NSL_BENCH_BATCH", 256))

    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import GNNDatum
    from neutronstarlite_tpu.training.minibatch import MinibatchTrainer

    t0 = time.time()
    g = make_powerlaw_graph(v, deg)
    rng = np.random.default_rng(1)
    feats = rng.random((v, 602), np.float32)
    labels = rng.integers(0, 41, v).astype(np.int32)
    masks = np.zeros(v, np.int32)
    datum = GNNDatum(graph=g, features=feats, labels=labels, masks=masks,
                     num_classes=41)
    model = os.environ.get("NSL_BENCH_SAMPLED_MODEL", "gcn")
    sampler = os.environ.get("NSL_BENCH_SAMPLER", "host")
    cfg = InputInfo(vertices=v, epochs=1, layer_string="602-128-41",
                    fanout_string="5-10", batch_size=batch,
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.5,
                    seed=0)
    cfg.sampler_backend = sampler
    tr = MinibatchTrainer(datum, cfg, model=model)
    print(f"[sampled] setup {time.time()-t0:.1f}s "
          f"caps={tr.caps} scaps={tr.scaps}", file=sys.stderr, flush=True)

    include_dst = tr.include_dst  # the trainer's own mode, not a copy
    import neutronstarlite_tpu.sampling.sampler as S
    n_seeds = min(v, batch * 100)
    if tr.device_mode:
        # device path reads seed lists from tr.nids
        tr.nids["warm"] = np.arange(batch * 2, dtype=np.int32)
        tr.nids["timed"] = np.arange(n_seeds, dtype=np.int32)
    else:
        tr.samplers["warm"] = S.Sampler(
            g, np.arange(batch * 2, dtype=np.int32), batch, tr.fanout,
            seed=1, include_dst=include_dst)
        tr.samplers["timed"] = S.Sampler(
            g, np.arange(n_seeds, dtype=np.int32), batch, tr.fanout,
            seed=2, include_dst=include_dst)
    # warm up (compile) on a few batches by limiting the seed list
    t0 = time.time()
    tr.run_epoch("warm")
    print(f"[sampled] warmup (compile + 2 batches) {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # timed: one pass over 100 batches of train seeds
    t0 = time.time()
    loss, acc = tr.run_epoch("timed")
    wall = time.time() - t0
    n_batches = -(-n_seeds // batch)
    edges_per_batch = sum(c * f for c, f in
                          zip(tr.caps, [tr.fanout[-1 - h]
                                        for h in range(len(tr.caps))]))
    print(json.dumps({
        "metric": "sampled_batches_per_sec", "batches": n_batches,
        "wall_s": round(wall, 2),
        "batches_per_sec": round(n_batches / wall, 2),
        "max_sampled_edges_per_sec": round(n_batches * edges_per_batch / wall),
        "batch_size": batch, "fanout": tr.fanout,
    }))


if __name__ == "__main__":
    main()
