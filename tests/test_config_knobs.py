"""Config hygiene (VERDICT r2 item 9): the engine tunables flow through the
cfg system like every other switch (the reference routes ALL engine flags
through InputInfo, core/GraphSegment.cpp:222-292), and EVAL_MODE:1 gives
per-epoch accuracies from a proper inference forward."""

import os

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import gcn
from neutronstarlite_tpu.ops import ell as ell_mod
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=211, feat_dim=12,
                                 num_classes=3, avg_degree=6, homophily=0.9,
                                 seed=11, feature_noise=0.3)


@pytest.fixture
def restore_tunables():
    budget, chunk = ell_mod._BLOCK_GATHER_BUDGET, ell_mod._GATED_CHUNK_BYTES
    yield
    ell_mod._BLOCK_GATHER_BUDGET = budget
    ell_mod._GATED_CHUNK_BYTES = chunk


def _cfg(sbm, **kw):
    cfg = InputInfo(vertices=sbm.num_vertices, epochs=4,
                    layer_string=f"12-8-{sbm.num_classes}", learn_rate=0.01,
                    weight_decay=1e-4, drop_rate=0.3, seed=7)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_cfg_keys_parse(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text("EVAL_MODE:1\nGATHER_BUDGET_MB:7\nGATED_CHUNK_MB:3\n")
    cfg = InputInfo.from_cfg_file(str(p))
    assert cfg.eval_mode is True
    assert cfg.gather_budget_mb == 7
    assert cfg.gated_chunk_mb == 3


def test_tunables_flow_from_cfg(sbm, restore_tunables, monkeypatch):
    monkeypatch.delenv("NSL_GATHER_BUDGET_MB", raising=False)
    monkeypatch.delenv("NSL_GATED_CHUNK_MB", raising=False)
    FullGraphTrainer(sbm, _cfg(sbm, gather_budget_mb=7, gated_chunk_mb=3),
                     model=gcn, backend="xla")
    assert ell_mod._BLOCK_GATHER_BUDGET == 7 * 2**20
    assert ell_mod._GATED_CHUNK_BYTES == 3 * 2**20


def test_env_overrides_cfg(sbm, restore_tunables, monkeypatch):
    """NSL_* env vars keep precedence (measurement overrides)."""
    monkeypatch.setenv("NSL_GATHER_BUDGET_MB", "11")
    before = ell_mod._BLOCK_GATHER_BUDGET
    FullGraphTrainer(sbm, _cfg(sbm, gather_budget_mb=7), model=gcn,
                     backend="xla")
    assert ell_mod._BLOCK_GATHER_BUDGET == before  # cfg did not clobber env


def test_tiny_gather_budget_identical_results(sbm, restore_tunables,
                                              monkeypatch):
    """The block budget only re-chunks the same math: a pathologically
    small budget must reproduce the default run exactly."""
    monkeypatch.delenv("NSL_GATHER_BUDGET_MB", raising=False)
    h1 = FullGraphTrainer(sbm, _cfg(sbm), model=gcn,
                          backend="pallas").run()
    ell_mod._BLOCK_GATHER_BUDGET = 128 * 1024  # 128 KB → many blocks
    h2 = FullGraphTrainer(sbm, _cfg(sbm), model=gcn,
                          backend="pallas").run()
    for a, b in zip(h1, h2):
        assert abs(a["loss"] - b["loss"]) < 1e-5, (a, b)


def test_eval_mode_accuracies_match_predict(sbm):
    """EVAL_MODE:1 — the last epoch's accuracies must equal accuracies
    computed from predict() on the final state (same params/bn, same
    inference forward), unlike the reference's Test()-on-training-outputs
    quirk where dropout perturbs the reported numbers."""
    tr = FullGraphTrainer(sbm, _cfg(sbm, eval_mode=True), model=gcn,
                          backend="xla")
    hist = tr.run()
    logits = np.asarray(tr.predict())
    pred = logits.argmax(-1)
    for name, which in (("train", 0), ("val", 1), ("test", 2)):
        sel = sbm.masks == which
        acc = (pred[sel] == sbm.labels[sel]).mean()
        assert abs(hist[-1][name] - acc) < 1e-6, (name, hist[-1], acc)


def test_eval_mode_dist_matches_predict(sbm):
    from neutronstarlite_tpu.training.dist_trainer import DistTrainer
    tr = DistTrainer(sbm, _cfg(sbm, eval_mode=True), model=gcn,
                     num_partitions=4)
    hist = tr.run()
    logits = tr.predict()
    pred = logits.argmax(-1)
    for name, which in (("train", 0), ("val", 1), ("test", 2)):
        sel = sbm.masks == which
        acc = (pred[sel] == sbm.labels[sel]).mean()
        assert abs(hist[-1][name] - acc) < 1e-6, (name, hist[-1], acc)
