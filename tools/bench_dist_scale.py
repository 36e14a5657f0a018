"""Execute the DISTRIBUTED engine end-to-end at headline (Reddit) scale.

VERDICT r3 missing-item #1: everything dist had trained only at V<=20K while
all Reddit-scale numbers were preprocessing- or projection-derived. This tool
runs DistTrainer on the headline graph (V=232,965, E=11.9M, 602-128-41 — the
reference's gcn_reddit_full.cfg shape, /root/reference/gcn_reddit_full.cfg +
core/graph.hpp:2644-3300) on the virtual 8-device CPU mesh, for real:
full epochs through the DepComm exchange, gradient psum, optimizer — the
exact executable a TPU pod would run, just on host devices.

Two flag sets per P, matching the verdict's prescription:
  * bench: the headline single-chip flag set (DTYPE:bfloat16 + EAGER +
    HOIST_L0) on the dist engine;
  * combo: the heavy feature stack (PROC_OVERLAP + EXCHANGE:ring +
    SHUFFLE_VERTICES + DepCache rep_threshold + CACHE_REFRESH:2).

Reports per run: epoch wall time (median of the timed window), loss
trajectory (asserted finite and decreasing), peak host RSS, and the dist
graph's exact exchange/slot geometry. Prints one JSON line per run.

Usage: python tools/bench_dist_scale.py [--p 4,8] [--modes bench,combo]
       [--v 232965] [--deg 50] [--epochs 3]
"""

import argparse
import json
import os
import resource
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def make_cfg(mode: str, v: int):
    from neutronstarlite_tpu.config import InputInfo
    cfg = InputInfo(vertices=v, epochs=3, layer_string="602-128-41",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.5,
                    seed=0, dtype="bfloat16")
    if mode == "bench":
        cfg.hoist_l0 = True                 # the headline flag set
    elif mode == "combo":
        cfg.overlap = True                  # PROC_OVERLAP split slabs
        cfg.exchange = "ring"               # exact per-step ppermutes
        cfg.shuffle_vertices = True         # the skewed-graph recipe
        cfg.cache_refresh = 2               # stale DepCache epochs
    else:
        raise ValueError(mode)
    return cfg


def run_one(datum, mode: str, p: int, epochs: int, model_name: str = "gcn",
            heads: int = 1):
    from neutronstarlite_tpu.models import gat, gcn
    from neutronstarlite_tpu.training.dist_trainer import DistTrainer
    cfg = make_cfg(mode, datum.num_vertices)
    model = {"gcn": gcn, "gat": gat}[model_name]
    # GAT has no eager/hoist form; heads exercise the fused multi-head
    # chain (attention_stats_linear_heads under PROC_OVERLAP)
    kw = {"eager": True} if (mode == "bench" and model_name == "gcn") else {}
    if model_name != "gcn":
        cfg.hoist_l0 = False
        cfg.drop_rate = 0.0
        cfg.num_heads = heads
        # attention on random labels overshoots at the GCN lr; 1e-3 gives
        # the monotone descent the convergence-class assert checks
        cfg.learn_rate = 1e-3
    rep = 64 if mode == "combo" else None   # DepCache hot set (degree mode)
    t0 = time.time()
    tr = DistTrainer(datum, cfg, model=model, num_partitions=p,
                     rep_threshold=rep, **kw)
    build_s = time.time() - t0
    t0 = time.time()
    warm = tr.run(epochs=2)                 # compile + warm
    warm_s = time.time() - t0
    t0 = time.time()
    hist = tr.run(epochs=epochs)
    wall = time.time() - t0
    losses = [r["loss"] for r in warm] + [r["loss"] for r in hist]
    assert all(np.isfinite(losses)), f"non-finite loss: {losses}"
    # convergence-class: after the first optimizer step (which can
    # overshoot from the cold init on random labels) the loss descends
    assert losses[-1] < losses[1], f"loss not decreasing: {losses}"
    info = tr.debuginfo()
    rec = {
        "mode": mode, "p": p, "epochs": epochs,
        "epoch_s": round(wall / epochs, 3),
        "build_s": round(build_s, 1), "warmup_s": round(warm_s, 1),
        "losses": [round(x, 4) for x in losses],
        "peak_rss_gb": round(peak_rss_gb(), 2),
        "m_pad": info["m_pad"], "h_pad": info["h_pad"],
        "exchange_rows_per_device_per_layer":
            info["exchange_rows_per_device_per_layer"],
        "slots_per_device": info.get("slots_per_device"),
    }
    del tr
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", default="4,8")
    ap.add_argument("--modes", default="bench,combo")
    ap.add_argument("--v", type=int, default=232965)
    ap.add_argument("--deg", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--model", default="gcn", choices=("gcn", "gat"))
    ap.add_argument("--heads", type=int, default=1)
    args = ap.parse_args()
    if args.model == "gcn" and args.heads != 1:
        ap.error("--heads applies to gat only (gcn ignores NUM_HEADS; "
                 "the record label would misstate the config run)")

    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.graph.dataset import GNNDatum
    t0 = time.time()
    g = make_powerlaw_graph(args.v, args.deg)
    feats = np.random.default_rng(1).random((args.v, 602), np.float32)
    labels = np.random.default_rng(2).integers(0, 41, args.v).astype(np.int32)
    masks = (np.arange(args.v) % 10 >= 2).astype(np.int32) * 0  # all train
    masks[args.v // 2:] = 2                                      # half test
    datum = GNNDatum(graph=g, features=feats, labels=labels, masks=masks,
                     num_classes=41)
    print(f"[dist-scale] graph built V={args.v} E={g.num_edges} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr, flush=True)

    for p in [int(x) for x in args.p.split(",")]:
        for mode in args.modes.split(","):
            rec = run_one(datum, mode, p, args.epochs, args.model,
                          args.heads)
            rec["model"] = (args.model if args.heads == 1
                            else f"{args.model}_h{args.heads}")
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
