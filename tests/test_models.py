"""End-to-end model tests: convergence on the SBM synthetic dataset replaces
the reference's "known Cora accuracy" convergence check (SURVEY.md §4.4) —
the Cora feature table is not shipped with the reference; structure-only
files (edge/label/mask) are covered in test_data.py."""

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import gcn, gat, gin, commnet
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=400, feat_dim=32, num_classes=4,
                                 avg_degree=8, homophily=0.9, seed=1)


def make_config(sbm, epochs=30, lr=0.01):
    return InputInfo(vertices=sbm.num_vertices, epochs=epochs,
                     layer_string=f"32-16-{sbm.num_classes}",
                     learn_rate=lr, weight_decay=1e-4, drop_rate=0.3,
                     decay_rate=0.97, decay_epoch=100, seed=3)


class TestGCN:
    def test_gcn_converges(self, sbm):
        tr = FullGraphTrainer(sbm, make_config(sbm), model=gcn, backend="xla")
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["test"] > 0.75, f"GCN failed to learn: {hist[-1]}"

    def test_gcn_eager_matches_shape(self, sbm):
        tr = FullGraphTrainer(sbm, make_config(sbm, epochs=3), model=gcn,
                              backend="xla", eager=True)
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])

    def test_gcn_eager_converges(self, sbm):
        """Eager op order (GCNCPUEAGER, now the bench default) must reach
        the same accuracy class as aggregate-first."""
        tr = FullGraphTrainer(sbm, make_config(sbm), model=gcn,
                              backend="xla", eager=True)
        hist = tr.run()
        assert hist[-1]["test"] > 0.75, hist[-1]

    def test_gcn_ell_backend(self, sbm):
        tr = FullGraphTrainer(sbm, make_config(sbm, epochs=20), model=gcn,
                              backend="pallas")
        hist = tr.run()
        assert hist[-1]["test"] > 0.7


class TestGAT:
    def test_gat_converges(self):
        # GAT per the reference relu-caps every layer's output (GAT_CPU.hpp
        # vertexForward = relu), which needs a cleaner signal to separate
        # classes than the noisy default SBM.
        data = synthetic_sbm_dataset(num_vertices=400, feat_dim=32,
                                     num_classes=4, avg_degree=8,
                                     homophily=0.9, seed=1, feature_noise=0.3)
        cfg = make_config(data, epochs=40)
        cfg.drop_rate = 0.0
        tr = FullGraphTrainer(data, cfg, model=gat, backend="xla")
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["test"] > 0.7, f"GAT failed to learn: {hist[-1]}"


class TestGIN:
    def test_gin_converges(self, sbm):
        tr = FullGraphTrainer(sbm, make_config(sbm), model=gin, backend="xla")
        hist = tr.run()
        assert hist[-1]["test"] > 0.6, f"GIN failed to learn: {hist[-1]}"


class TestGIN_Eager:
    def test_gin_eager_equals_plain(self, sbm):
        """(agg(x) + (1+eps)x)@W1 == agg(x@W1) + (1+eps)(x@W1): the eager
        reorder must produce identical logits (inference, fixed params)."""
        import jax
        from neutronstarlite_tpu.ops.graph_ops import GraphTensors
        st = gin.init(jax.random.PRNGKey(0), [32, 16, 4])
        gt = GraphTensors.from_graph(sbm.graph, backend="pallas")
        x = sbm.features
        lo, _ = gin.forward(st, gt, x, None, training=False)
        le, _ = gin.forward(st, gt, x, None, training=False, eager=True)
        np.testing.assert_allclose(np.asarray(le), np.asarray(lo),
                                   rtol=2e-4, atol=2e-5)

    def test_gin_eager_converges(self, sbm):
        tr = FullGraphTrainer(sbm, make_config(sbm), model=gin,
                              backend="xla", eager=True)
        hist = tr.run()
        assert hist[-1]["test"] > 0.75, hist[-1]


class TestCommNet:
    def test_commnet_converges(self, sbm):
        tr = FullGraphTrainer(sbm, make_config(sbm), model=commnet,
                              backend="xla")
        hist = tr.run()
        assert hist[-1]["test"] > 0.6, f"CommNet failed to learn: {hist[-1]}"


class TestCommNetEager:
    def test_commnet_eager_equals_plain(self, sbm):
        """agg(x)@W0 == agg(x@W0): identical logits under the reorder."""
        import jax
        from neutronstarlite_tpu.ops.graph_ops import GraphTensors
        st = commnet.init(jax.random.PRNGKey(0), [32, 16, 4])
        gt = GraphTensors.from_graph(sbm.graph, backend="pallas")
        x = sbm.features
        lo, _ = commnet.forward(st, gt, x, None, training=False)
        le, _ = commnet.forward(st, gt, x, None, training=False, eager=True)
        np.testing.assert_allclose(np.asarray(le), np.asarray(lo),
                                   rtol=2e-4, atol=2e-5)


class TestGGCN:
    def test_ggcn_converges(self):
        from neutronstarlite_tpu.models import ggcn
        data = synthetic_sbm_dataset(num_vertices=400, feat_dim=32,
                                     num_classes=4, avg_degree=8,
                                     homophily=0.9, seed=1, feature_noise=0.3)
        cfg = make_config(data, epochs=40)
        cfg.drop_rate = 0.0
        tr = FullGraphTrainer(data, cfg, model=ggcn, backend="xla")
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        # the reference never compiled GGCN (main.cpp:102-108 commented out);
        # the faithful formula plateaus around 0.5 on this SBM — assert it
        # clearly beats chance (0.25) and keeps improving
        assert hist[-1]["test"] > 0.4, f"GGCN failed to learn: {hist[-1]}"

    def test_ggcn_dist_runs(self):
        from neutronstarlite_tpu.models import ggcn
        from neutronstarlite_tpu.training.dist_trainer import DistTrainer
        data = synthetic_sbm_dataset(num_vertices=257, feat_dim=16,
                                     num_classes=3, avg_degree=7,
                                     homophily=0.9, seed=4, feature_noise=0.3)
        cfg = InputInfo(vertices=data.num_vertices, epochs=8,
                        layer_string="16-8-3", learn_rate=0.01,
                        weight_decay=1e-4, drop_rate=0.0, seed=7)
        tr = DistTrainer(data, cfg, model=ggcn, num_partitions=4)
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]


class TestSgdOptimizer:
    """OPTIMIZER:sgd — the reference Parameter class's SGD variant
    (learnC2C_with_decay_SGD, core/NtsScheduler.hpp:750-755), reachable
    from the same cfg surface as Adam."""

    def test_sgd_trains_single_chip(self, sbm):
        from neutronstarlite_tpu.config import InputInfo
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=25,
                        layer_string=f"32-8-{sbm.num_classes}",
                        learn_rate=0.05, weight_decay=1e-5,
                        drop_rate=0.0, seed=3)
        cfg._set_key("OPTIMIZER", "sgd")
        assert cfg.optimizer == "sgd"
        from neutronstarlite_tpu.training.trainer import FullGraphTrainer
        from neutronstarlite_tpu.models import gcn
        tr = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["test"] > 0.5, hist[-1]

    def test_sgd_trains_dist(self, sbm):
        from neutronstarlite_tpu.config import InputInfo
        from neutronstarlite_tpu.models import gcn
        from neutronstarlite_tpu.training.dist_trainer import DistTrainer
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=15,
                        layer_string=f"32-8-{sbm.num_classes}",
                        learn_rate=0.05, weight_decay=1e-5,
                        drop_rate=0.0, seed=3)
        cfg.optimizer = "sgd"
        hist = DistTrainer(sbm, cfg, model=gcn, num_partitions=2).run()
        assert hist[-1]["loss"] < hist[0]["loss"]

    def test_unknown_optimizer_rejected(self, sbm):
        import pytest as _pytest
        from neutronstarlite_tpu.config import InputInfo
        from neutronstarlite_tpu.training.trainer import FullGraphTrainer
        from neutronstarlite_tpu.models import gcn
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=1,
                        layer_string=f"32-8-{sbm.num_classes}",
                        learn_rate=0.01, weight_decay=0.0, drop_rate=0.0,
                        seed=3)
        cfg.optimizer = "adamw"
        with _pytest.raises(ValueError, match="OPTIMIZER"):
            FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
