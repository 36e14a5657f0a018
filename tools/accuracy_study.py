"""bf16-vs-f32 end-to-end accuracy study on REAL data (TODO item, r2).

Trains every full-graph model family on the UCI digits kNN graph (real
features, the repo's real-dataset pipeline — see tests/test_real_dataset.py)
twice: DTYPE:float32 and DTYPE:bfloat16 (bf16 aggregate gathers on the ELL
backend, the bench default fast path). Prints one JSON line per run and a
final summary of test-accuracy deltas.

Runs on CPU (the study is about numerics, not speed):
    python tools/accuracy_study.py
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neutronstarlite_tpu.config import InputInfo                 # noqa: E402
from neutronstarlite_tpu.graph.dataset import load_dataset       # noqa: E402
from neutronstarlite_tpu.models import gcn, gat, gin, commnet, ggcn, sage  # noqa: E402
from neutronstarlite_tpu.training.trainer import FullGraphTrainer    # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    cfg = InputInfo.from_cfg_file(os.path.join(REPO, "configs",
                                               "gcn_digits.cfg"))
    for attr in ("edge_file", "feature_file", "label_file", "mask_file"):
        setattr(cfg, attr, os.path.join(REPO, getattr(cfg, attr)))
    if not os.path.exists(cfg.feature_file):
        sys.exit("digits dataset not generated "
                 "(tools/generate_dataset.py --real digits)")
    cfg.epochs = 60
    cfg.kernel_backend = "pallas"        # ELL backend, where agg_dtype acts
    datum = load_dataset(cfg)

    # attention/gated models need a lower lr on this dataset: digits
    # features are raw 0-16 pixel counts (no BN in GAT/GGCN to rescale),
    # so lr 0.01 saturates the edge softmax and plateaus (measured:
    # ggcn lr 0.01 -> 0.34 test, lr 0.001 -> 0.58+). The study compares
    # dtypes at EQUAL (epochs, lr) per model.
    models = (("gcn", gcn, {}, 60, 0.01),
              ("gcn_eager", gcn, {"eager": True}, 60, 0.01),
              ("gat", gat, {}, 300, 0.001), ("gin", gin, {}, 60, 0.01),
              ("gin_eager", gin, {"eager": True}, 60, 0.01),
              ("commnet", commnet, {}, 60, 0.01),
              ("commnet_eager", commnet, {"eager": True}, 60, 0.01),
              ("ggcn", ggcn, {}, 300, 0.001),
              ("sage", sage, {}, 60, 0.01))
    only = os.environ.get("NSL_STUDY_MODELS")  # comma-separated name filter
    if only:
        wanted = {s.strip() for s in only.split(",")}
        models = tuple(m for m in models if m[0] in wanted)
    deltas = {}
    for name, model, kwargs, epochs, lr in models:
        accs = {}
        for dtype in ("float32", "bfloat16"):
            cfg.dtype = dtype
            cfg.epochs = epochs
            cfg.learn_rate = lr
            tr = FullGraphTrainer(datum, cfg, model=model, backend="pallas",
                                  **kwargs)
            hist = tr.run(log_every=0)
            accs[dtype] = hist[-1]["test"]
            print(json.dumps({"model": name, "dtype": dtype,
                              "test_acc": round(float(accs[dtype]), 4),
                              "loss": round(float(hist[-1]["loss"]), 4)}),
                  flush=True)
        deltas[name] = float(accs["bfloat16"] - accs["float32"])
    print(json.dumps({"summary_bf16_minus_f32": {
        k: round(v, 4) for k, v in deltas.items()}}), flush=True)
    worst = max(abs(v) for v in deltas.values())
    print(f"worst |delta| = {worst:.4f} "
          f"({'PASS' if worst < 0.01 else 'REVIEW'} at 1pt threshold)")


if __name__ == "__main__":
    main()
