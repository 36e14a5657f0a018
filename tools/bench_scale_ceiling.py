"""Single-chip scale ceiling probe (VERDICT r3 weak-item 7 / item 7).

Finds how far one v5e chip carries full-graph GCN training (bench flags:
bf16 + EAGER + HOIST_L0) as the edge count grows past the headline 11.9M —
the point where the dist engine becomes NECESSARY rather than faster, the
reference's raison d'être (/root/reference/core/graph.hpp:275-280 stages
slabs through CPU memory for exactly this reason).

Sweeps avg_degree at the headline V (E ≈ V·deg), records edges/s per step
and the failure mode at the wall (Python exception text — compiler OOM vs
HBM allocation failure), and stops at the first failure.

Usage: python tools/bench_scale_ceiling.py [degrees, default 50,125,250,400]
Env: NSL_BENCH_V (default 232965), NSL_CEILING_EPOCHS (default 3)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    v = int(os.environ.get("NSL_BENCH_V", 232965))
    epochs = int(os.environ.get("NSL_CEILING_EPOCHS", 3))
    degrees = ([int(d) for d in sys.argv[1].split(",")]
               if len(sys.argv) > 1 else [50, 125, 250, 400])

    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import GNNDatum
    from neutronstarlite_tpu.models import gcn
    from neutronstarlite_tpu.training.trainer import FullGraphTrainer

    rng = np.random.default_rng(1)
    feats = rng.random((v, 602), np.float32)
    labels = rng.integers(0, 41, v).astype(np.int32)
    masks = np.zeros(v, np.int32)

    for deg in degrees:
        t0 = time.time()
        g = make_powerlaw_graph(v, deg)
        datum = GNNDatum(graph=g, features=feats, labels=labels,
                         masks=masks, num_classes=41)
        build_s = time.time() - t0
        cfg = InputInfo(vertices=v, epochs=epochs,
                        layer_string="602-128-41", learn_rate=0.01,
                        weight_decay=1e-4, drop_rate=0.5, seed=0,
                        dtype="bfloat16", hoist_l0=True)
        rec = {"V": v, "deg": deg, "E": int(g.num_edges),
               "build_s": round(build_s, 1)}
        try:
            t0 = time.time()
            tr = FullGraphTrainer(datum, cfg, model=gcn, eager=True)
            tr.run(epochs=2)
            rec["warmup_s"] = round(time.time() - t0, 1)
            ws = []
            for _ in range(3):
                t0 = time.time()
                hist = tr.run(epochs=epochs)
                ws.append(time.time() - t0)
            wall = sorted(ws)[1]
            rec.update({
                "epoch_s": round(wall / epochs, 3),
                "edges_per_sec": round(g.num_edges * epochs / wall),
                "finite": bool(np.isfinite([h["loss"] for h in hist]).all()),
            })
            del tr
        except Exception as e:
            rec["error"] = str(e)[:400]
            print(json.dumps(rec), flush=True)
            break
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
