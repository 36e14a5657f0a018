"""All-model throughput at Reddit scale on one chip, in one process.

Times the full train epoch (fwd+bwd+NtsAdam) for GCN (+eager) / GAT / GIN /
CommNet / GGCN / SAGE on the same power-law graph. One JSON line per model,
median of 3 timed windows (axon dispatch jitter).

Usage: python tools/bench_models.py
Env: NSL_BENCH_V / NSL_BENCH_DEG / NSL_BENCH_EPOCHS / NSL_BENCH_DTYPE /
     NSL_BENCH_MODELS (comma-separated subset, e.g. NSL_BENCH_MODELS=sage)
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
    epochs = int(os.environ.get("NSL_BENCH_EPOCHS", 5))
    dtype = os.environ.get("NSL_BENCH_DTYPE", "bfloat16")

    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import GNNDatum
    from neutronstarlite_tpu.models import commnet, gat, gcn, ggcn, gin, sage
    from neutronstarlite_tpu.training.trainer import FullGraphTrainer

    g = make_powerlaw_graph(v, deg)
    rng = np.random.default_rng(1)
    feats = rng.random((v, 602), np.float32)
    labels = rng.integers(0, 41, v).astype(np.int32)
    masks = np.zeros(v, np.int32)
    datum = GNNDatum(graph=g, features=feats, labels=labels, masks=masks,
                     num_classes=41)

    runs = (("gcn", gcn, {}), ("gcn_eager", gcn, {"eager": True}),
            ("gcn_eager_hoist", gcn, {"eager": True, "_hoist": True}),
            ("gin", gin, {}), ("gin_eager", gin, {"eager": True}),
            ("gin_eager_hoist", gin, {"eager": True, "_hoist": True}),
            ("commnet", commnet, {}),
            ("commnet_eager", commnet, {"eager": True}),
            ("commnet_eager_hoist", commnet,
             {"eager": True, "_hoist": True}),
            ("gat", gat, {}), ("gat_h2", gat, {"_heads": 2}),
            ("gat_h4", gat, {"_heads": 4}),
            ("ggcn", ggcn, {}), ("sage", sage, {}),
            # SAGE_POOL_DIM:128 — the pooled gathers drop from 5 tiles
            # (F_in=602 square pool) to 1 tile on layer 0
            ("sage_p128", sage, {"_pool": 128}))
    only = os.environ.get("NSL_BENCH_MODELS")  # comma-separated name filter
    if only:
        wanted = {s.strip() for s in only.split(",")}
        runs = tuple(r for r in runs if r[0] in wanted)
    for name, model, kwargs in runs:
        kwargs = dict(kwargs)
        hoist = kwargs.pop("_hoist", False)
        heads = kwargs.pop("_heads", 1)
        pool = kwargs.pop("_pool", 0)
        cfg = InputInfo(vertices=v, epochs=epochs,
                        layer_string="602-128-41", learn_rate=0.01,
                        weight_decay=1e-4,
                        drop_rate=0.5 if name.startswith("gcn") else 0.0,
                        seed=0, dtype=dtype, hoist_l0=hoist)
        cfg.num_heads = heads
        cfg.sage_pool_dim = pool
        try:
            t0 = time.time()
            tr = FullGraphTrainer(datum, cfg, model=model, backend="pallas",
                                  **kwargs)
            tr.run(epochs=2)  # compile + warm
            setup = time.time() - t0
            ws = []
            for _ in range(3):
                t0 = time.time()
                hist = tr.run(epochs=epochs)
                ws.append(time.time() - t0)
            wall = sorted(ws)[1]
            ok = all(np.isfinite(h["loss"]) for h in hist)
            print(json.dumps({
                "model": name, "dtype": dtype,
                "epoch_s": round(wall / epochs, 4),
                "edges_per_sec": round(g.num_edges * epochs / wall),
                "setup_s": round(setup, 1), "finite": ok,
            }), flush=True)
            del tr
        except Exception as e:  # keep going: one OOM shouldn't kill the table
            print(json.dumps({"model": name, "dtype": dtype,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
