"""Edge cases: deep layer stacks, isolated vertices, near-empty partitions,
all models on the ELL backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import GNNDatum, synthetic_sbm_dataset
from neutronstarlite_tpu.graph.structure import add_self_loops, build_graph
from neutronstarlite_tpu.models import commnet, gat, gcn, gin
from neutronstarlite_tpu.ops.graph_ops import GraphTensors
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=300, feat_dim=16, num_classes=3,
                                 avg_degree=6, homophily=0.9, seed=21,
                                 feature_noise=0.3)


class TestDeepStacks:
    def test_three_layer_gcn(self, sbm):
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=25,
                        layer_string="16-16-8-3", learn_rate=0.01,
                        weight_decay=1e-4, drop_rate=0.1, seed=3)
        tr = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
        hist = tr.run()
        assert hist[-1]["test"] > 0.6, hist[-1]

    def test_four_layer_gin(self, sbm):
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=15,
                        layer_string="16-16-16-8-3", learn_rate=0.005,
                        weight_decay=1e-4, drop_rate=0.0, seed=3)
        tr = FullGraphTrainer(sbm, cfg, model=gin, backend="xla")
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]


class TestIsolatedVertices:
    def test_graph_with_isolated_vertices(self):
        """Vertices with no in-edges must get zero aggregates, not NaN,
        through both backends (incl. the attention softmax guard)."""
        src = np.array([0, 1, 2], np.int32)
        dst = np.array([1, 2, 0], np.int32)
        g = build_graph(src, dst, 10)  # vertices 3..9 fully isolated
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (10, 4)).astype(np.float32))
        for backend in ("xla", "pallas"):
            gt = GraphTensors.from_graph(g, backend=backend)
            y = np.asarray(gt.aggregate_neighbors(x))
            assert np.isfinite(y).all()
            np.testing.assert_allclose(y[3:], 0.0)
            a = np.asarray(gt.attention_aggregate(
                x, jnp.zeros(10), jnp.zeros(10)))
            assert np.isfinite(a).all()
            np.testing.assert_allclose(a[3:], 0.0, atol=1e-6)

    def test_self_loop_only_graph(self):
        v = 8
        vids = np.arange(v, dtype=np.int32)
        g = build_graph(vids, vids, v)
        gt = GraphTensors.from_graph(g, backend="pallas")
        x = jnp.asarray(np.eye(v, dtype=np.float32))
        y = np.asarray(gt.aggregate_neighbors(x))
        # self loops only: Â = I (norm 1/sqrt(1*1))
        np.testing.assert_allclose(y, np.eye(v), atol=1e-6)


class TestSkewedPartitions:
    def test_near_empty_partition(self):
        """All edges land in one partition's dst range; others are almost
        edge-free — the dist build and training must still work."""
        from neutronstarlite_tpu.training.dist_trainer import DistTrainer
        r = np.random.default_rng(9)
        v = 120
        # all real edges point into vertices [0, 30)
        src = r.integers(0, v, 600).astype(np.int32)
        dst = r.integers(0, 30, 600).astype(np.int32)
        src, dst = add_self_loops(src, dst, v)
        g = build_graph(src, dst, v)
        feats = r.standard_normal((v, 8)).astype(np.float32)
        labels = r.integers(0, 3, v).astype(np.int32)
        masks = np.zeros(v, np.int32)
        datum = GNNDatum(graph=g, features=feats, labels=labels, masks=masks,
                         num_classes=3)
        cfg = InputInfo(vertices=v, epochs=3, layer_string="8-4-3",
                        learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                        seed=1)
        tr = DistTrainer(datum, cfg, model=gcn, num_partitions=4)
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])


class TestEllAllModels:
    @pytest.mark.parametrize("model", [gin, commnet, gat])
    def test_model_ell_matches_xla(self, sbm, model):
        st = model.init(jax.random.PRNGKey(2), [16, 8])
        x = jnp.asarray(sbm.features)
        gt_x = GraphTensors.from_graph(sbm.graph, backend="xla")
        gt_p = GraphTensors.from_graph(sbm.graph, backend="pallas")
        ox, _ = model.forward(st, gt_x, x, None, training=False)
        op, _ = model.forward(st, gt_p, x, None, training=False)
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   rtol=1e-3, atol=1e-4)
