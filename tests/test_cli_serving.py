"""CLI crash-recovery + serving surface: RESUME:1 (restore CHECKPOINT_PATH,
continue from the saved GLOBAL epoch — stable across repeated crash/resume
cycles) and PREDICT_OUT (write eval-mode logits as .npy; with RESUME:1 +
EPOCHS:0 this is a pure-inference launch). The reference has no training
persistence at all (SURVEY.md §5 — dump/restore_vertex_array is unused);
both keys are beyond-reference capabilities."""

import os
import sys

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.main import run_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_files(tmp_path_factory):
    sbm = synthetic_sbm_dataset(num_vertices=257, feat_dim=16, num_classes=3,
                                avg_degree=7, homophily=0.9, seed=4,
                                feature_noise=0.3)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from generate_dataset import write_nts
    out = str(tmp_path_factory.mktemp("serving") / "sbm")
    g = sbm.graph
    write_nts(out, g.fwd_src, g.fwd_dst, sbm.features, sbm.labels, sbm.masks)
    return sbm, out


def _cfg(out, **kw):
    cfg = InputInfo(algorithm="GCNCPU", vertices=257, epochs=8,
                    layer_string="16-8-3", learn_rate=0.01,
                    weight_decay=1e-4, drop_rate=0.0, seed=7)
    cfg.edge_file = out + ".edge.self"
    cfg.feature_file = out + ".featuretable"
    cfg.label_file = out + ".labeltable"
    cfg.mask_file = out + ".mask"
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_resume_requires_checkpoint_path(data_files):
    _, out = data_files
    with pytest.raises(ValueError, match="RESUME"):
        run_from_config(_cfg(out, resume=True), log_every=0)


def test_resume_fresh_start_when_absent(data_files, tmp_path):
    _, out = data_files
    cfg = _cfg(out, resume=True, checkpoint_path=str(tmp_path / "none"))
    tr, hist = run_from_config(cfg, log_every=0)
    assert len(hist) == 8  # full run — nothing to resume


def test_resume_continues_and_matches_straight_run(data_files, tmp_path):
    _, out = data_files
    ck = str(tmp_path / "ck")
    # straight 8-epoch run (same seed)
    _, h_all = run_from_config(_cfg(out), log_every=0)
    # phase 1: 4 epochs, checkpointed
    run_from_config(_cfg(out, epochs=4, checkpoint_path=ck), log_every=0)
    # phase 2: resume to EPOCHS:8 → exactly 4 remaining epochs
    _, h_tail = run_from_config(
        _cfg(out, epochs=8, checkpoint_path=ck, resume=True), log_every=0)
    assert len(h_tail) == 4
    assert abs(h_tail[-1]["loss"] - h_all[-1]["loss"]) < 2e-4, (
        h_tail[-1], h_all[-1])
    # global epoch accounting survives a SECOND resume: the checkpoint now
    # says epoch 8, so resuming at EPOCHS:8 trains 0 further epochs
    tr3, h3 = run_from_config(
        _cfg(out, epochs=8, checkpoint_path=ck, resume=True), log_every=0)
    assert h3 == []
    # and the checkpoint epoch did not regress
    assert tr3.resume(ck) == 8


def test_predict_out_writes_logits(data_files, tmp_path):
    sbm, out = data_files
    dst = str(tmp_path / "logits.npy")
    cfg = _cfg(out, predict_out=dst)
    tr, hist = run_from_config(cfg, log_every=0)
    y = np.load(dst)
    assert y.shape == (257, 3)
    # the file holds the SAME eval-mode logits predict() returns
    np.testing.assert_allclose(y, np.asarray(tr.predict()), rtol=1e-5,
                               atol=1e-6)
    # and they classify: trained-model accuracy beats chance
    sel = sbm.masks == 2
    acc = float((y.argmax(-1)[sel] == sbm.labels[sel]).mean())
    assert acc > 0.5


def test_pure_inference_launch(data_files, tmp_path):
    """RESUME:1 + EPOCHS:<=saved + PREDICT_OUT = serve from a checkpoint
    without training a step."""
    _, out = data_files
    ck = str(tmp_path / "ck")
    run_from_config(_cfg(out, epochs=6, checkpoint_path=ck), log_every=0)
    dst = str(tmp_path / "serve.npy")
    tr, hist = run_from_config(
        _cfg(out, epochs=6, checkpoint_path=ck, resume=True,
             predict_out=dst), log_every=0)
    assert hist == []   # zero training epochs
    assert np.load(dst).shape == (257, 3)


def test_resume_dist_and_minibatch_surfaces(data_files, tmp_path):
    """RESUME flows through the other two trainers' resume() too."""
    _, out = data_files
    ck = str(tmp_path / "dck")
    run_from_config(_cfg(out, epochs=3, checkpoint_path=ck,
                         num_partitions=2), log_every=0)
    _, h = run_from_config(_cfg(out, epochs=5, checkpoint_path=ck,
                                num_partitions=2, resume=True), log_every=0)
    assert len(h) == 2
    ck2 = str(tmp_path / "mck")
    mb = _cfg(out, epochs=3, checkpoint_path=ck2, algorithm="GCNSAMPLESINGLE",
              fanout_string="4-4", batch_size=64)
    run_from_config(mb, log_every=0)
    mb2 = _cfg(out, epochs=5, checkpoint_path=ck2,
               algorithm="GCNSAMPLESINGLE", fanout_string="4-4",
               batch_size=64, resume=True)
    _, h2 = run_from_config(mb2, log_every=0)
    assert len(h2) == 2
