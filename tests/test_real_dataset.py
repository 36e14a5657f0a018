"""End-to-end run on a REAL public dataset with REAL features
(VERDICT r1 item 6): UCI handwritten digits (bundled with scikit-learn,
no network), kNN graph, trained through the complete file-based pipeline —
binary edge file + text feature/label/mask tables (the formats of
core/ntsDataloador.hpp:29-305) → cfg → CLI dispatch → trainer.

This replaces the r1 caveat that only FEATURE_FILE:random had ever gone
through the full pipeline. The convergence-as-test strategy follows the
reference (SURVEY.md §4.4) with a known achievable accuracy.
"""

import os

import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.main import run_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "gcn_digits.cfg")


@pytest.fixture(scope="module")
def digits_cfg():
    if not os.path.exists(os.path.join(REPO, "data", "digits.featuretable")):
        pytest.skip("digits dataset not generated "
                    "(tools/generate_dataset.py --real digits)")
    cfg = InputInfo.from_cfg_file(CFG)
    cfg.epochs = 60
    # cfg paths are repo-relative
    for attr in ("edge_file", "feature_file", "label_file", "mask_file"):
        setattr(cfg, attr, os.path.join(REPO, getattr(cfg, attr)))
    return cfg


def test_real_features_known_accuracy(digits_cfg):
    tr, hist = run_from_config(digits_cfg, log_every=0)
    assert hist[-1]["test"] > 0.95, hist[-1]
    # sanity: the features really came from disk, not the random generator
    import numpy as np
    f = tr.datum.features if hasattr(tr, "datum") else None
    assert f is not None and float(np.max(f)) == 16.0  # 4-bit pixel scale


def test_real_features_dist_engine(digits_cfg):
    """Same dataset through the DepComm engine on a 4-device mesh."""
    digits_cfg.num_partitions = 4
    digits_cfg.epochs = 60
    tr, hist = run_from_config(digits_cfg, log_every=0)
    assert hist[-1]["test"] > 0.95, hist[-1]


def test_real_features_bf16_accuracy_parity(digits_cfg):
    """DTYPE:bfloat16 (the bench default fast path: bf16 aggregate
    gathers, f32 accumulation) must not cost accuracy on real data."""
    digits_cfg.num_partitions = 1
    digits_cfg.dtype = "bfloat16"
    digits_cfg.kernel_backend = "pallas"   # ELL backend (where agg_dtype acts)
    tr, hist = run_from_config(digits_cfg, log_every=0)
    assert hist[-1]["test"] > 0.95, hist[-1]
