"""Sampled-vs-full-graph time-to-accuracy (VERDICT r3 item 8).

digits21k showed sampled GCN BEATS full-graph accuracy (0.9435 vs ~0.936);
this records the practical trade a GCNSAMPLESINGLE user cares about:
wall-clock to a fixed test accuracy, sampled vs full-graph, on

  * digits21k — the hard real dataset (generate data/digits21k first:
    python tools/generate_dataset.py --real digits21k --out data/digits21k);
  * a Reddit-scale learnable synthetic (SBM, homophily 0.9) — accuracy is
    meaningless on the random-label throughput graph, so the scale leg
    uses planted structure instead.

Per trainer: wall_to_target = epoch_s × (first epoch reaching the target);
setup (graph build + compile) is reported separately — it is per-job, the
same accounting as every other number in BASELINE.md.

Usage: python tools/bench_tta.py [digits21k|synth] [target]   (TPU)
Env: NSL_TTA_V (synth vertices, default 100000), NSL_TTA_EPOCHS_FULL/_SAMP
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_full(datum, cfg_kw, epochs):
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.models import gcn
    from neutronstarlite_tpu.training.trainer import FullGraphTrainer
    cfg = InputInfo(**cfg_kw)
    t0 = time.time()
    tr = FullGraphTrainer(datum, cfg, model=gcn, eager=True)
    tr.run(epochs=1)                     # compile
    setup = time.time() - t0
    t0 = time.time()
    hist = tr.run(epochs=epochs)
    wall = time.time() - t0
    return hist, wall / epochs, setup


def run_sampled(datum, cfg_kw, epochs, fanout, batch):
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.training.minibatch import MinibatchTrainer
    cfg = InputInfo(**cfg_kw)
    cfg.fanout_string = fanout
    cfg.batch_size = batch
    cfg.sampler_backend = "device"
    cfg.hoist_l0 = False
    t0 = time.time()
    tr = MinibatchTrainer(datum, cfg, model="gcn")
    tr.run(epochs=1)                     # compile
    setup = time.time() - t0
    t0 = time.time()
    hist = tr.run(epochs=epochs)
    wall = time.time() - t0
    return hist, wall / epochs, setup


def report(name, hist, epoch_s, setup_s, target):
    accs = [h["test"] for h in hist]
    hit = next((i + 1 for i, a in enumerate(accs) if a >= target), None)
    print(json.dumps({
        "trainer": name, "target": target,
        "epoch_s": round(epoch_s, 4),
        "epochs_to_target": hit,
        "wall_to_target_s": round(hit * epoch_s, 2) if hit else None,
        "setup_s": round(setup_s, 1),
        "best_test": round(max(accs), 4),
        "final_test": round(accs[-1], 4),
        "epochs_run": len(accs),
    }), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "digits21k"
    ef = int(os.environ.get("NSL_TTA_EPOCHS_FULL", 300))
    es = int(os.environ.get("NSL_TTA_EPOCHS_SAMP", 40))

    if which == "digits21k":
        target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.90
        from neutronstarlite_tpu.config import InputInfo
        from neutronstarlite_tpu.graph.dataset import load_dataset
        base = dict(vertices=22017, layer_string="64-64-10",
                    edge_file="data/digits21k.edge.self",
                    feature_file="data/digits21k.featuretable",
                    label_file="data/digits21k.labeltable",
                    mask_file="data/digits21k.mask",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.3,
                    seed=7, dtype="bfloat16")
        datum = load_dataset(InputInfo(**base))
        full_kw = dict(base, epochs=ef, decay_rate=0.97, decay_epoch=100,
                       hoist_l0=True)
        samp_kw = dict(base, epochs=es, decay_rate=0.97, decay_epoch=100)
        fanout, batch = "10-15", 512
    else:
        target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.90
        v = int(os.environ.get("NSL_TTA_V", 100000))
        from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
        # noise high enough that features alone are weak and the graph
        # must be aggregated over several hops' worth of epochs —
        # feature_noise=1.0 was saturating (both trainers hit 1.0 test in
        # one epoch, no discrimination)
        datum = synthetic_sbm_dataset(num_vertices=v, feat_dim=64,
                                      num_classes=16, avg_degree=25,
                                      homophily=0.7, seed=3,
                                      feature_noise=6.0)
        base = dict(vertices=v, layer_string="64-64-16", learn_rate=0.01,
                    weight_decay=1e-4, drop_rate=0.3, seed=7,
                    dtype="bfloat16")
        full_kw = dict(base, epochs=ef, hoist_l0=True)
        samp_kw = dict(base, epochs=es)
        fanout, batch = "10-15", 512

    hist, eps, setup = run_full(datum, full_kw, ef)
    report("full_graph", hist, eps, setup, target)
    hist, eps, setup = run_sampled(datum, samp_kw, es, fanout, batch)
    report("sampled_device", hist, eps, setup, target)


if __name__ == "__main__":
    main()
