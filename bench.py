"""Benchmark: full-graph GCN training throughput in edges/s per chip.

Prints ONE JSON line:
    {"metric": "edges_per_sec_per_chip", "value": N, "unit": "edges/s",
     "vs_baseline": R}

Workload follows the reference's headline config (gcn_reddit_full.cfg:
Reddit-scale 232,965 vertices, layers 602-128-41, full-graph GCN). The graph
is a synthetic power-law graph at that scale (the Reddit binary itself is not
shipped with the reference). edges/s = E * epochs / wall_time, the metric
defined in BASELINE.md.

``vs_baseline`` compares against the reference implementation's measured CPU
throughput on this host (reference_baseline.json, measured by building and
running the reference via tools/refbaseline/ — see its Makefile); absent
that file, vs_baseline is null.
"""

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_powerlaw_graph(v, avg_deg, seed=0):
    """Power-law in-degree graph (degree skew like Reddit)."""
    rng = np.random.default_rng(seed)
    e = v * avg_deg
    # preferential-attachment-ish: dst ~ zipf-weighted choice
    w = (np.arange(1, v + 1) ** -0.8)
    w /= w.sum()
    dst = rng.choice(v, size=e, p=w).astype(np.int32)
    src = rng.integers(0, v, size=e).astype(np.int32)
    from neutronstarlite_tpu.graph.structure import add_self_loops, build_graph
    src, dst = add_self_loops(src, dst, v)
    return build_graph(src, dst, v)


def main():
    v = int(os.environ.get("NSL_BENCH_V", 232965))
    avg_deg = int(os.environ.get("NSL_BENCH_DEG", 50))
    epochs = int(os.environ.get("NSL_BENCH_EPOCHS", 10))
    backend = os.environ.get("NSL_BENCH_BACKEND", "auto")
    # bfloat16 aggregate gathers are the default fast path (27.8M edges/s
    # vs 17.6-20M f32, r2-measured; accuracy parity asserted in
    # tests/test_real_dataset.py); NSL_BENCH_DTYPE=float32 for the fallback
    dtype = os.environ.get("NSL_BENCH_DTYPE", "bfloat16")
    # scan-fuse all epochs of a window into ONE device dispatch
    # (FUSE_EPOCHS): with HOIST_L0 the epoch is ~0.1 s, so even pipelined
    # per-epoch dispatch leaves measurable gaps (r3: fused 0.0965 vs
    # async-dispatch 0.0989 s/epoch). NSL_BENCH_FUSE=1 for per-epoch
    # dispatch.
    fuse = int(os.environ.get("NSL_BENCH_FUSE", str(epochs)))

    import jax
    import jax.numpy as jnp
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import GNNDatum
    from neutronstarlite_tpu.models import gcn
    from neutronstarlite_tpu.training.trainer import FullGraphTrainer

    t0 = time.time()
    g = make_powerlaw_graph(v, avg_deg)
    feats = np.random.default_rng(1).random((v, 602), np.float32)
    labels = np.random.default_rng(2).integers(0, 41, v).astype(np.int32)
    masks = np.zeros(v, np.int32)  # all train, like a throughput run
    datum = GNNDatum(graph=g, features=feats, labels=labels, masks=masks,
                     num_classes=41)
    # HOIST_L0 (default): layer 0's aggregate of the constant features is
    # computed once at trainer build (A·X is epoch-invariant; linearity
    # makes (A·X)W == A·(XW) exact) — the F=128 layer-0 gathers leave the
    # epoch loop entirely. NSL_BENCH_HOIST=0 for the per-epoch form.
    hoist = os.environ.get("NSL_BENCH_HOIST", "1") == "1"
    cfg = InputInfo(vertices=v, epochs=epochs, layer_string="602-128-41",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.5,
                    seed=0, dtype=dtype, fuse_epochs=fuse, hoist_l0=hoist)
    build_s = time.time() - t0
    _log(f"graph+data built in {build_s:.1f}s (V={v} E={g.num_edges})")

    # eager op order (the reference's GCNCPUEAGER variant,
    # toolkits/GCN_CPU_EAGER.hpp): transform THEN aggregate — layer 1
    # aggregates at F=128 instead of F=602, cutting the dominant gather
    # traffic ~4.7×. NSL_BENCH_EAGER=0 for the aggregate-first order.
    eager = os.environ.get("NSL_BENCH_EAGER", "1") == "1"
    # Watchdog: the axon tunnel can go DEAD (observed 2026-08-18: even a
    # 256x256 matmul produced nothing for hours; device puts in trainer
    # construction hang too). Rather than hang the driver, emit an
    # explanatory JSON line and exit. Zero cost when healthy;
    # NSL_BENCH_WATCHDOG_S=0 disables.
    import threading
    wd_s = float(os.environ.get("NSL_BENCH_WATCHDOG_S", "1500"))
    done = threading.Event()

    def _watchdog():
        if not done.wait(wd_s):
            print(json.dumps({
                "metric": "edges_per_sec_per_chip", "value": 0,
                "unit": "edges/s", "vs_baseline": None,
                "detail": {"error": "TPU unresponsive: device setup + "
                           f"warmup did not complete within {wd_s:.0f}s "
                           "(tunnel outage — see BASELINE.md / memory "
                           "notes); this is an environment failure, not a "
                           "framework number"},
            }), flush=True)
            os._exit(3)

    if wd_s > 0:
        threading.Thread(target=_watchdog, daemon=True).start()
    t0 = time.time()
    tr = FullGraphTrainer(datum, cfg, model=gcn, backend=backend,
                          eager=eager)
    _log(f"trainer built in {time.time()-t0:.1f}s (eager={eager})")
    t0 = time.time()
    # warmup must compile the path the windows use: with fuse>1 that is
    # the scan-fused executable (epochs=fuse → one fused call, no
    # unfused remainder), else the single-step executable
    tr.run(epochs=max(2, fuse) if fuse > 1 else 2)  # warmup + compile
    done.set()
    warmup_s = time.time() - t0
    _log(f"warmup (compile + 2 epochs) {warmup_s:.1f}s")
    # three timed windows, report the MEDIAN (the axon tunnel adds
    # per-dispatch jitter; a single window under-reports by up to ~15%)
    windows = []
    for w in range(3):
        t0 = time.time()
        tr.run(epochs=epochs)
        windows.append(time.time() - t0)
        _log(f"window {w}: {epochs} epochs {windows[-1]:.2f}s")
    wall = sorted(windows)[1]
    edges_per_sec = g.num_edges * epochs / wall

    # baseline comparison
    baseline_eps = None
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "reference_baseline.json")
    if os.path.exists(base_file):
        with open(base_file) as f:
            baseline_eps = json.load(f).get("edges_per_sec")
    vs = (edges_per_sec / baseline_eps) if baseline_eps else None

    print(json.dumps({
        "metric": "edges_per_sec_per_chip",
        "value": round(edges_per_sec),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "detail": {
            "num_vertices": v, "num_edges": int(g.num_edges),
            "epochs": epochs, "wall_s": round(wall, 3),
            "epoch_s": round(wall / epochs, 4),
            "windows_s": [round(w, 3) for w in windows],
            "build_s": round(build_s, 2),
            "warmup_s": round(warmup_s, 1), "eager": eager, "hoist": hoist,
            "fuse_epochs": fuse,
            "backend": jax.default_backend(), "dtype": dtype,
        },
    }))


if __name__ == "__main__":
    main()
