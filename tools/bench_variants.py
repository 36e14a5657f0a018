"""Variant benchmark: standard vs eager GCN order, and vertex-reorder
locality effects, all in one process (amortizes the remote-compile tax).

Prints one JSON line per variant.
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
    epochs = int(os.environ.get("NSL_BENCH_EPOCHS", 10))

    import jax
    from bench import make_powerlaw_graph
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import GNNDatum
    from neutronstarlite_tpu.graph.structure import build_graph
    from neutronstarlite_tpu.models import gcn
    from neutronstarlite_tpu.training.trainer import FullGraphTrainer

    g = make_powerlaw_graph(v, deg)
    rng = np.random.default_rng(1)
    feats = rng.random((v, 602), np.float32)
    labels = rng.integers(0, 41, v).astype(np.int32)
    masks = np.zeros(v, np.int32)

    def run_variant(name, graph, **kw):
        datum = GNNDatum(graph=graph, features=feats, labels=labels,
                         masks=masks, num_classes=41)
        cfg = InputInfo(vertices=v, epochs=epochs,
                        layer_string="602-128-41", learn_rate=0.01,
                        weight_decay=1e-4, drop_rate=0.5, seed=0)
        tr = FullGraphTrainer(datum, cfg, model=gcn, backend="pallas", **kw)
        tr.run(epochs=2)
        t0 = time.time()
        tr.run(epochs=epochs)
        wall = time.time() - t0
        print(json.dumps({"variant": name,
                          "epoch_s": round(wall / epochs, 4),
                          "edges_per_sec": round(graph.num_edges * epochs
                                                 / wall)}), flush=True)

    run_variant("standard", g)
    run_variant("eager", g, eager=True)

    # degree-sorted reorder (hubs first → gather locality for hot rows)
    order = np.argsort(-(np.asarray(g.out_degree)))
    inv = np.empty_like(order)
    inv[order] = np.arange(v)
    # remap edges through the original ordering
    src = np.empty(g.num_edges, np.int32)
    dst = np.empty(g.num_edges, np.int32)
    src[g.fwd_eid] = inv[g.fwd_src].astype(np.int32)
    dst[g.fwd_eid] = inv[g.fwd_dst].astype(np.int32)
    g2 = build_graph(src, dst, v)
    run_variant("degree_sorted", g2)


if __name__ == "__main__":
    main()
