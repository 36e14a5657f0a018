"""Auxiliary subsystems: checkpoint/resume, validation toolkits, timers."""

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import gcn
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=200, feat_dim=16, num_classes=3,
                                 avg_degree=6, seed=9)


def make_config(sbm, tmp=None, every=0):
    cfg = InputInfo(vertices=sbm.num_vertices, epochs=6,
                    layer_string="16-8-3", learn_rate=0.01,
                    weight_decay=1e-4, drop_rate=0.0, seed=11)
    if tmp:
        cfg.checkpoint_path = str(tmp / "ck")
        cfg.checkpoint_every = every
    return cfg


class TestCheckpoint:
    def test_save_restore_bitexact(self, sbm, tmp_path):
        cfg = make_config(sbm, tmp_path, every=0)
        tr = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
        h1 = tr.run()  # saves at end
        # fresh trainer, resume, continue: must equal continuous training
        cfg2 = make_config(sbm, tmp_path, every=0)
        cfg2.checkpoint_path = ""
        tr2 = FullGraphTrainer(sbm, cfg2, model=gcn, backend="xla")
        ep = tr2.resume(str(tmp_path / "ck"))
        assert ep == 6
        for a, b in zip(tr.state.params, tr2.state.params):
            np.testing.assert_array_equal(np.asarray(a["w"]),
                                          np.asarray(b["w"]))
        # continued training from restore == continued training in-place
        h_cont_a = tr.run(epochs=3)
        h_cont_b = tr2.run(epochs=3)
        for a, b in zip(h_cont_a, h_cont_b):
            assert abs(a["loss"] - b["loss"]) < 1e-6

    def test_periodic_save(self, sbm, tmp_path):
        cfg = make_config(sbm, tmp_path, every=2)
        tr = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
        tr.run(epochs=4)
        import os
        base = str(tmp_path / "ck")
        assert os.path.exists(base) or os.path.exists(base + ".npz")


class TestValidationToolkits:
    def test_validate_single(self, sbm):
        from neutronstarlite_tpu.toolkits import validate_single
        out = validate_single(sbm, backend="xla")
        assert out["in_degree_ok"] and out["backward_ok"]

    def test_validate_single_ell(self, sbm):
        from neutronstarlite_tpu.toolkits import validate_single
        validate_single(sbm, backend="pallas")

    def test_validate_dist(self, sbm):
        from neutronstarlite_tpu.toolkits import validate_dist
        validate_dist(sbm, 4)
        validate_dist(sbm, 4, rep_threshold=8)


class TestPhaseTimer:
    def test_timer_accumulates(self):
        from neutronstarlite_tpu.utils.timing import PhaseTimer
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        r = t.report()
        assert r["a"]["count"] == 2
