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


class TestStructuralFuzz:
    """Seeded random-graph sweep: structural oddities (isolated vertices,
    multi-edges, self-loops, hub rows, near-empty partitions) through the
    DIST engine must reproduce the single-chip oracle for both the linear
    aggregate and the fused attention chain."""

    def _random_graph(self, seed):
        r = np.random.default_rng(seed)
        v = int(r.integers(40, 200))
        e = int(r.integers(v // 2, v * 8))      # sparse → denseish
        src = r.integers(0, v, e).astype(np.int32)
        # zipf-ish dst skew (high-id vertices get few or no real edges;
        # add_self_loops then gives every row its self edge, as the pipeline does)
        w = (np.arange(1, v + 1) ** -float(r.uniform(0.3, 1.2)))
        w /= w.sum()
        dst = r.choice(v, size=e, p=w).astype(np.int32)
        # multi-edges: duplicate a random slice
        k = int(r.integers(0, e // 4 + 1))
        src = np.concatenate([src, src[:k]])
        dst = np.concatenate([dst, dst[:k]])
        src, dst = add_self_loops(src, dst, v)
        return build_graph(src, dst, v), v

    @pytest.mark.parametrize("seed", [11, 22, 33, 44])
    def test_dist_matches_single_on_random_graphs(self, seed):
        from jax.sharding import PartitionSpec as P
        from neutronstarlite_tpu.ops import segment
        from neutronstarlite_tpu.parallel.depcomm import (build_dist_graph,
                                                          device_view,
                                                          make_tensors)
        from neutronstarlite_tpu.parallel.mesh import make_mesh
        from neutronstarlite_tpu.training.dist_trainer import _shard_map
        g, v = self._random_graph(seed)
        r = np.random.default_rng(seed + 1)
        x_np = r.standard_normal((v, 12)).astype(np.float32)
        s_src = r.standard_normal(v).astype(np.float32)
        s_dst = r.standard_normal(v).astype(np.float32)

        gt = GraphTensors.from_graph(g, backend="xla")
        x = jnp.asarray(x_np)
        want_sum = np.asarray(gt.aggregate_neighbors(x))
        want_att = np.asarray(gt.attention_aggregate(
            x, jnp.asarray(s_src), jnp.asarray(s_dst), 0.2))

        mesh = make_mesh(4)
        dg = build_dist_graph(g, 4)
        arrs = jax.tree.map(jnp.asarray, device_view(dg))
        xs = jnp.asarray(dg.shard_features(x_np))
        ss = jnp.asarray(dg.shard_features(s_src[:, None]))
        sd = jnp.asarray(dg.shard_features(s_dst[:, None]))

        def f(arrs, xs, ss, sd):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            gt_d = make_tensors(sq(arrs), dg)
            xl, ssl, sdl = sq(xs), sq(ss)[:, 0], sq(sd)[:, 0]
            agg = gt_d.aggregate_neighbors(xl)
            tab = gt_d.get_dep_nbr(xl)
            stab = gt_d.get_dep_nbr(ssl[:, None])[:, 0]
            att = gt_d.attention_aggregate(tab, stab, sdl, 0.2)
            return agg[None], att[None]

        spec = jax.tree.map(lambda _: P("p"), arrs)
        agg, att = jax.jit(_shard_map(
            f, mesh, in_specs=(spec, P("p"), P("p"), P("p")),
            out_specs=(P("p"), P("p"))))(arrs, xs, ss, sd)
        agg, att = np.asarray(agg), np.asarray(att)
        off = dg.partition.offsets
        for i in range(4):
            n = off[i + 1] - off[i]
            np.testing.assert_allclose(agg[i, :n],
                                       want_sum[off[i]:off[i + 1]],
                                       rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(att[i, :n],
                                       want_att[off[i]:off[i + 1]],
                                       rtol=2e-4, atol=2e-5)


class TestDeepAttentionStacks:
    """3-layer attention stacks through the fused slab ops (the deep-stack
    tests above cover GCN/GIN only)."""

    def test_three_layer_gat(self, sbm):
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=20,
                        layer_string="16-16-8-3", learn_rate=0.005,
                        weight_decay=1e-4, drop_rate=0.0, seed=5)
        tr = FullGraphTrainer(sbm, cfg, model=gat, backend="pallas")
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]

    def test_three_layer_ggcn_dist(self, sbm):
        from neutronstarlite_tpu.models import ggcn
        from neutronstarlite_tpu.training.dist_trainer import DistTrainer
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=15,
                        layer_string="16-16-8-3", learn_rate=0.005,
                        weight_decay=1e-4, drop_rate=0.0, seed=5)
        tr = DistTrainer(sbm, cfg, model=ggcn, num_partitions=2)
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]
