"""The HARDER real-feature dataset (VERDICT r2 item 8): 22,017-vertex
augmented + σ4-noised UCI digits through the FULL file pipeline (binary
edge file + text tables → cfg → CLI dispatch → trainer), with a
NON-TRIVIAL accuracy bar.

Why this bar means something (measured at generation time, seed 7,
tools/generate_dataset.py --real digits21k):

    graph-free logistic regression     0.770 test
    k=8 kNN majority vote              0.919 test
    GCN (this framework, 80 epochs)    ~0.936 test

So clearing 0.90 requires the GRAPH to contribute ~13+ points over the
feature-only baseline — unlike the tiny digits set where 0.99 was
near-unavoidable. The suggested 20newsgroups/covtype need network access
(offline env, TODO.md); every transform here (pixel shifts, noise) is a
real image operation on the real UCI data, and the originals are split
train/val/test BEFORE augmenting only the train originals (no leakage).
"""

import os

import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.main import run_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "gcn_digits21k.cfg")
DATA = os.path.join(REPO, "data", "digits21k")


@pytest.fixture(scope="module")
def digits21k_cfg():
    if not os.path.exists(DATA + ".featuretable"):
        # generate on demand (deterministic, ~5 s); files are gitignored
        import sys
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from generate_dataset import build_digits21k, write_nts
        d = build_digits21k(7)
        write_nts(DATA, d["src"], d["dst"], d["feats"], d["labels"],
                  d["masks"], fmt="g")
    cfg = InputInfo.from_cfg_file(CFG)
    for attr in ("edge_file", "feature_file", "label_file", "mask_file"):
        setattr(cfg, attr, os.path.join(REPO, getattr(cfg, attr)))
    return cfg


def test_digits21k_beats_graph_free_baseline(digits21k_cfg):
    cfg = digits21k_cfg
    cfg.num_partitions = 1
    tr, hist = run_from_config(cfg, log_every=0)
    # 0.90 = logistic-regression baseline (0.770) + 13 pts: the graph must
    # carry real signal for this to pass
    assert hist[-1]["test"] > 0.90, hist[-1]
    import numpy as np
    assert float(np.max(tr.datum.features)) == 16.0  # real pixel scale


def test_digits21k_bf16_parity(digits21k_cfg):
    cfg = digits21k_cfg
    cfg.num_partitions = 1
    cfg.dtype = "bfloat16"
    cfg.kernel_backend = "pallas"   # ELL backend (where agg_dtype acts)
    tr, hist = run_from_config(cfg, log_every=0)
    assert hist[-1]["test"] > 0.90, hist[-1]


def test_digits21k_dist_engine(digits21k_cfg):
    cfg = digits21k_cfg
    cfg.num_partitions = 4
    cfg.dtype = "float32"
    cfg.kernel_backend = "auto"
    tr, hist = run_from_config(cfg, log_every=0)
    assert hist[-1]["test"] > 0.90, hist[-1]


def test_digits21k_ggcn_feature_norm(digits21k_cfg):
    """GGCN clears the LR floor (and the 0.90 bar) WITH FEATURE_NORM:1.

    The r3 sweep measured raw-feature GGCN at 0.725 — below the 0.770
    graph-free floor: GGCN has no batchnorm (reference parity,
    toolkits/GGCN_CPU.hpp), so its gate pre-activations see the raw
    0-16 + σ4-noise feature scale and saturate. Per-feature
    standardization at load (FEATURE_NORM) is the recipe: the r4 TPU
    sweep measured 0.9247 test by epoch 99 (BASELINE.md "r4 GGCN
    digits21k recipe"). This pins the fix at a CI-sized budget."""
    cfg = digits21k_cfg
    cfg.num_partitions = 1
    cfg.dtype = "float32"
    cfg.kernel_backend = "auto"
    cfg.algorithm = "GGCNCPU"
    cfg.feature_norm = True
    cfg.epochs = 100
    try:
        tr, hist = run_from_config(cfg, log_every=0)
    finally:
        cfg.algorithm = "GCNCPU"
        cfg.feature_norm = False
        cfg.epochs = 80
    assert hist[-1]["test"] > 0.90, hist[-1]
