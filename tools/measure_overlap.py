"""Measure how much of the boundary-exchange time XLA actually hides under
local compute (VERDICT r2 item 4 — replace the '~100% with PROC_OVERLAP'
assumption with a measurement).

Runs the dist GCN trainer on the virtual 8-device CPU mesh at a comm-heavy
shape, PROC_OVERLAP off/on, and reports:

1. median epoch wall time (3 windows) for each mode;
2. trace-derived exchange exposure: from a jax.profiler trace of the timed
   epochs, the union of collective-op intervals (all-to-all /
   collective-permute) is intersected with the union of every OTHER XLA op
   interval across the executor threads. hidden = |exchange ∩ compute| /
   |exchange|. This is CPU-mesh-relative (collectives here are memcpys
   sharing the same 4 cores with compute — there is no separate ICI/DMA
   engine), so
   it LOWER-BOUNDS what a real TPU's DMA-driven collectives overlap; the
   schedule freedom it demonstrates (the local slab pass has no data
   dependency on the exchange) is the quantity that transfers.

Usage: python tools/measure_overlap.py [V] [F] [avg_deg]
Prints one JSON line per mode.
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# trace event names that are NOT XLA ops (runtime/python/meta events)
_META = re.compile(
    r"^(ThunkExecutor|Rendezvous|PjitFunction|PjRt|Wait:|\$|program_sh|"
    r"ExecuteThunks|copy-start|copy-done|infeed|outfeed|TSL|Xla|region|"
    r"EventCount|thread_pool)", re.I)
_COLLECTIVE = re.compile(r"^(all-to-all|collective-permute)(\.\d+)?$")
_ALLREDUCE = re.compile(r"^(all-reduce|reduce-scatter|all-gather)(\.\d+)?$")


def _union(intervals):
    """Total length of the union of [start, end) intervals."""
    if not intervals:
        return 0.0
    intervals.sort()
    tot, cs, ce = 0.0, intervals[0][0], intervals[0][1]
    for s, e in intervals[1:]:
        if s > ce:
            tot += ce - cs
            cs, ce = s, e
        else:
            ce = max(ce, e)
    return tot + (ce - cs)


def _intersect_len(a, b):
    """Length of union(a) ∩ union(b)."""
    if not a or not b:
        return 0.0
    a.sort(), b.sort()

    def merged(iv):
        out = []
        cs, ce = iv[0]
        for s, e in iv[1:]:
            if s > ce:
                out.append((cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        out.append((cs, ce))
        return out

    ma, mb = merged(a), merged(b)
    i = j = 0
    tot = 0.0
    while i < len(ma) and j < len(mb):
        s = max(ma[i][0], mb[j][0])
        e = min(ma[i][1], mb[j][1])
        if e > s:
            tot += e - s
        if ma[i][1] < mb[j][1]:
            i += 1
        else:
            j += 1
    return tot


def analyze_trace(trace_dir):
    files = sorted(glob.glob(os.path.join(trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True))
    ev = json.loads(gzip.open(files[-1]).read())["traceEvents"]
    coll, allred, comp = [], [], []
    coll_by_tid, comp_by_tid = {}, {}
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        iv = (e["ts"], e["ts"] + e["dur"])
        tid = (e.get("pid"), e.get("tid"))
        if _COLLECTIVE.match(name):
            coll.append(iv)
            coll_by_tid.setdefault(tid, []).append(iv)
        elif _ALLREDUCE.match(name):
            allred.append(iv)
        elif not _META.match(name):
            comp.append(iv)
            comp_by_tid.setdefault(tid, []).append(iv)
    ex = _union(list(coll))
    hid = _intersect_len(list(coll), list(comp))
    # per-device attribution (r4, VERDICT r3 weak-item 6): intersect each
    # executor thread's OWN collectives with its OWN compute only — on the
    # CPU mesh a device thread executes its program serially, so this is
    # ~0 by construction and LOWER-bounds a real TPU (whose DMA engines
    # run the exchange beside compute); the cross-thread union above is
    # the UPPER bound. The schedule freedom (local pass independent of the
    # exchange) is what transfers; the wall-clock delta is the honest
    # middle measurement.
    ex_own = hid_own = 0.0
    for tid, ivs in coll_by_tid.items():
        ex_own += _union(list(ivs))
        hid_own += _intersect_len(list(ivs), list(comp_by_tid.get(tid, [])))
    return {
        "exchange_ms": round(ex / 1e3, 1),
        "exchange_hidden_ms": round(hid / 1e3, 1),
        "hidden_frac": round(hid / ex, 3) if ex else None,
        "hidden_frac_same_thread": round(hid_own / ex_own, 3) if ex_own
        else None,
        "grad_allreduce_ms": round(_union(list(allred)) / 1e3, 1),
        "compute_busy_ms": round(_union(list(comp)) / 1e3, 1),
    }


def run_mode(sbm, overlap: bool, epochs: int = 6):
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.models import gcn
    from neutronstarlite_tpu.training.dist_trainer import DistTrainer
    cfg = InputInfo(vertices=sbm.num_vertices, epochs=epochs,
                    layer_string=f"{sbm.features.shape[1]}-64-8",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                    seed=0)
    cfg.overlap = overlap
    # NSL_OVERLAP_P=2 collapses most of the cross-device-parallelism
    # ambiguity in the single-host trace (VERDICT r3 weak-item 6); the
    # device count must divide the virtual device pool (XLA_FLAGS above)
    p = int(os.environ.get("NSL_OVERLAP_P", "8"))
    tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=p)
    tr.run(epochs=2)                     # compile + warm
    windows = []
    for _ in range(3):
        t0 = time.time()
        tr.run(epochs=epochs)
        windows.append((time.time() - t0) / epochs)
    td = tempfile.mkdtemp(prefix=f"ovtrace_{overlap}_")
    with jax.profiler.trace(td):
        tr.run(epochs=epochs)
    stats = analyze_trace(td)
    stats.update({
        "mode": "overlap" if overlap else "no_overlap",
        "epoch_s_median": round(sorted(windows)[1], 3),
        "epochs_traced": epochs,
    })
    return stats


def main():
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 20011
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    deg = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
    sbm = synthetic_sbm_dataset(num_vertices=v, feat_dim=f, num_classes=8,
                                avg_degree=deg, seed=3)
    for overlap in (False, True):
        print(json.dumps(run_mode(sbm, overlap)), flush=True)


if __name__ == "__main__":
    main()
