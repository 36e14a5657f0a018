"""Distributed op-zoo parity: every DistGraphTensors op must reproduce the
single-chip math (values AND gradients), closing the r1 gap where
DistAggregateDstMin/Max, DistScatterSrc/Dst and the dist SDDMM
(ref: core/ntsDistCPUGraphOp.hpp:127-440,566-585) had no mesh counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import sage
from neutronstarlite_tpu.ops.graph_ops import GraphTensors
from neutronstarlite_tpu.parallel.depcomm import (build_dist_graph,
                                                  device_view, make_tensors)
from neutronstarlite_tpu.parallel.mesh import make_mesh
from neutronstarlite_tpu.training.dist_trainer import DistTrainer, _shard_map
from neutronstarlite_tpu.training.trainer import FullGraphTrainer
from jax.sharding import PartitionSpec as P

N_DEV = 4


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=211, feat_dim=12, num_classes=3,
                                 avg_degree=6, homophily=0.9, seed=11,
                                 feature_noise=0.3)


def _dist_run(sbm, fn, with_grad=False, overlap=False):
    """Run ``fn(gt, x_local) -> [v_pad, F]`` on the mesh; gather values (and
    the gradient of sum(out * coef) wrt x) back to global order."""
    mesh = make_mesh(N_DEV)
    dg = build_dist_graph(sbm.graph, N_DEV, overlap=overlap)
    arrs = jax.tree.map(jnp.asarray, device_view(dg))
    x = jnp.asarray(dg.shard_features(sbm.features))
    rng = np.random.default_rng(3)
    coef_g = rng.standard_normal(
        (sbm.num_vertices,)).astype(np.float32)
    coef = jnp.asarray(dg.shard_vertex_array(coef_g))

    def f(arrs, x, coef):
        sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        arrs_l, x_l, coef_l = sq(arrs), sq(x), sq(coef)
        gt = make_tensors(arrs_l, dg)

        def loss(xl):
            # LOCAL loss only: the all_to_all transpose in shard_map AD
            # already routes other devices' cotangents back into xl
            # (psum-ing the loss first would seed P unit cotangents)
            out = fn(gt, xl)
            return jnp.sum(out * coef_l[:, None]), out

        if with_grad:
            (_, out), g = jax.value_and_grad(loss, has_aux=True)(x_l)
            return out[None], g[None]
        return fn(gt, x_l)[None], x_l[None] * 0

    spec = jax.tree.map(lambda _: P("p"), arrs)
    y, g = jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p"), P("p")),
                              out_specs=(P("p"), P("p"))))(arrs, x, coef)

    def gather(a):
        out = np.zeros((sbm.num_vertices, a.shape[-1]), np.float32)
        off = dg.partition.offsets
        a = np.asarray(a)
        for i in range(N_DEV):
            n = off[i + 1] - off[i]
            out[off[i]:off[i + 1]] = a[i, :n]
        return out

    return gather(y), gather(g), coef_g


def _single_oracle(sbm, fn, with_grad=False):
    gt = GraphTensors.from_graph(sbm.graph, backend="xla")
    x = jnp.asarray(sbm.features)
    rng = np.random.default_rng(3)
    coef = jnp.asarray(rng.standard_normal(
        (sbm.num_vertices,)).astype(np.float32))

    def loss(xl):
        out = fn(gt, xl)
        return jnp.sum(out * coef[:, None]), out

    (_, out), g = jax.value_and_grad(loss, has_aux=True)(x)
    return np.asarray(out), np.asarray(g)


def _max_chain(gt, x):
    table = gt.get_dep_nbr(x)
    return gt.aggregate_dst_max(gt.scatter_src(table))


def _min_chain(gt, x):
    table = gt.get_dep_nbr(x)
    return gt.aggregate_dst_min(gt.scatter_src(table))


def _scatter_dst_chain(gt, x):
    # scatter_dst → aggregate_dst_sum == indegree-weighted identity
    table = gt.get_dep_nbr(x)
    e = gt.scatter_dst(table[:gt.num_vertices] if hasattr(gt, "m_pad")
                       else x)
    return gt.aggregate_dst_sum(e)


def _srcdst_chain(gt, x):
    table = gt.get_dep_nbr(x)
    e = gt.scatter_src_dst(table)
    return gt.aggregate_dst_sum(e[:, :x.shape[1]] + 2.0 * e[:, x.shape[1]:])


class TestDistOpZoo:
    def test_aggregate_dst_max_matches_single(self, sbm):
        y, g, _ = _dist_run(sbm, _max_chain, with_grad=True)
        y0, g0 = _single_oracle(sbm, _max_chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    def test_aggregate_dst_min_matches_single(self, sbm):
        y, g, _ = _dist_run(sbm, _min_chain, with_grad=True)
        y0, g0 = _single_oracle(sbm, _min_chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    def test_scatter_dst_matches_single(self, sbm):
        y, g, _ = _dist_run(sbm, _scatter_dst_chain, with_grad=True)
        y0, g0 = _single_oracle(sbm, _scatter_dst_chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    def test_scatter_src_dst_matches_single(self, sbm):
        y, g, _ = _dist_run(sbm, _srcdst_chain, with_grad=True)
        y0, g0 = _single_oracle(sbm, _srcdst_chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    def test_sddmm_matches_single(self, sbm):
        """Per-edge dots aggregated per dst (edge orders differ between the
        engines, so compare the per-vertex reduction)."""
        def chain(gt, x):
            table = gt.get_dep_nbr(x)
            d = gt.sddmm_dot(table, table[:gt.num_vertices]
                             if hasattr(gt, "m_pad") else x)
            return gt.aggregate_dst_sum(d[:, None])

        y, _, _ = _dist_run(sbm, chain)
        y0, _ = _single_oracle(sbm, chain)
        np.testing.assert_allclose(y, y0, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("overlap", [False, True])
    def test_fused_neighbor_max_matches_single(self, sbm, overlap):
        """The FUSED slab extremal (aggregate_neighbor_max) must match the
        single-chip segment oracle — values and first-extremal grads —
        including relu-style tie inputs (SAGE's actual pooling input).
        overlap=True exercises the cross-slab-set winner merge
        (ell.aggregate_max_pair over the PROC_OVERLAP local/remote split)."""
        def chain(gt, x):
            return gt.aggregate_neighbor_max(gt.get_dep_nbr(x))

        y, g, _ = _dist_run(sbm, chain, with_grad=True, overlap=overlap)
        y0, g0 = _single_oracle(sbm, chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)
        relu = type(sbm)(graph=sbm.graph,
                         features=np.maximum(sbm.features, 0),
                         labels=sbm.labels, masks=sbm.masks,
                         num_classes=sbm.num_classes)
        y, g, _ = _dist_run(relu, chain, with_grad=True, overlap=overlap)
        y0, g0 = _single_oracle(relu, chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("overlap", [False, True])
    def test_fused_neighbor_min_matches_single(self, sbm, overlap):
        def chain(gt, x):
            return gt.aggregate_neighbor_min(gt.get_dep_nbr(x))

        y, g, _ = _dist_run(sbm, chain, with_grad=True, overlap=overlap)
        y0, g0 = _single_oracle(sbm, chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    def test_overlap_max_all_tie_routes_to_global_first_edge(self, sbm):
        """All-tie stress ACROSS the local/remote boundary: constant
        features make every edge extremal, so the merged winner must be
        the FIRST edge per (dst, lane) in the ORIGINAL interleaved edge
        order — local and remote edges interleave within a dst row, and a
        per-set-only tie-break would route some rows' gradient to a later
        (remote) edge when an earlier local one exists (or vice versa).
        Equality with the single-chip segment oracle pins the exact
        reference record[] semantics through the split."""
        const = sbm.features * 0 + 1.0
        sbm2 = type(sbm)(graph=sbm.graph, features=const,
                         labels=sbm.labels, masks=sbm.masks,
                         num_classes=sbm.num_classes)

        def chain(gt, x):
            return gt.aggregate_neighbor_max(gt.get_dep_nbr(x))

        y, g, _ = _dist_run(sbm2, chain, with_grad=True, overlap=True)
        y0, g0 = _single_oracle(sbm2, chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("width", [96, 160])
    def test_overlap_max_wide_lanes_matches_single(self, sbm, width):
        """The r5 width-adaptive winner-route THROUGH the cross-set merge:
        aggregate_max_pair's backward routes against the gpos slabs with
        the same packed (F <= 128) / two-stream (F > 128) split as the
        single-set op, and the fixture's 12-lane features never reach the
        wide branch — widen the table in-chain (distinct per-lane scales
        so winners differ across lanes) and pin both branches to the
        segment oracle through the PROC_OVERLAP local/remote split."""
        reps = -(-width // sbm.features.shape[1])
        scale = jnp.arange(1, width + 1, dtype=jnp.float32) / width

        def chain(gt, x):
            xw = jnp.tile(x, (1, reps))[:, :width] * scale
            return gt.aggregate_neighbor_max(gt.get_dep_nbr(xw))

        y, g, _ = _dist_run(sbm, chain, with_grad=True, overlap=True)
        y0, g0 = _single_oracle(sbm, chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)

    def test_max_grad_routes_to_first_extremal(self, sbm):
        """Tie: duplicate edges share the extremal value; gradient must go
        to exactly ONE edge per (dst, lane) on both engines → grads equal."""
        # constant features make every edge extremal (all-tie stress)
        const = sbm.features * 0 + 1.0
        sbm2 = type(sbm)(graph=sbm.graph, features=const,
                         labels=sbm.labels, masks=sbm.masks,
                         num_classes=sbm.num_classes)
        y, g, _ = _dist_run(sbm2, _max_chain, with_grad=True)
        y0, g0 = _single_oracle(sbm2, _max_chain, with_grad=True)
        np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(g, g0, rtol=1e-4, atol=1e-5)


class TestSageModel:
    def test_sage_single_converges(self, sbm):
        from neutronstarlite_tpu.config import InputInfo
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=30,
                        layer_string=f"12-8-{sbm.num_classes}",
                        learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                        seed=7)
        tr = FullGraphTrainer(sbm, cfg, model=sage, backend="xla")
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["test"] > 0.5, hist[-1]

    def test_sage_overlap_matches_no_overlap(self, sbm):
        """SAGE + PROC_OVERLAP runs the fused cross-set extremal merge (no
        [E, F] fallback — the r2 composition hole) and must reproduce the
        no-overlap run exactly epoch by epoch: same math, different slab
        decomposition and comm schedule."""
        from neutronstarlite_tpu.config import InputInfo

        def run(overlap):
            cfg = InputInfo(vertices=sbm.num_vertices, epochs=6,
                            layer_string=f"12-8-{sbm.num_classes}",
                            learn_rate=0.01, weight_decay=1e-4,
                            drop_rate=0.0, seed=7)
            cfg.overlap = overlap
            return DistTrainer(sbm, cfg, model=sage,
                               num_partitions=N_DEV).run()

        h_ov, h_plain = run(True), run(False)
        for a, b in zip(h_ov, h_plain):
            assert abs(a["loss"] - b["loss"]) < 1e-4, (a, b)
            assert abs(a["test"] - b["test"]) < 1e-6, (a, b)

    def test_sage_dist_tracks_single(self, sbm):
        """The min/max model family must run under DistTrainer and track the
        single-chip run (VERDICT r1 item 5 done-criterion)."""
        from neutronstarlite_tpu.config import InputInfo
        cfg = InputInfo(vertices=sbm.num_vertices, epochs=8,
                        layer_string=f"12-8-{sbm.num_classes}",
                        learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                        seed=7)
        h1 = FullGraphTrainer(sbm, cfg, model=sage, backend="xla").run()
        h2 = DistTrainer(sbm, cfg, model=sage, num_partitions=N_DEV).run()
        for a, b in zip(h1, h2):
            assert abs(a["loss"] - b["loss"]) < 0.08, (a, b)


def test_aggregate_weighted_masks_padding_edges(sbm):
    """aggregate_weighted must zero padding edges ITSELF: callers may pass
    arbitrary weights (e.g. softmax outputs give padding-only dst segments
    uniform nonzero weight, and plain ones hit it unconditionally) — the
    padding edges' (src=0, dst=last-row) contribution must not leak."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from neutronstarlite_tpu.ops import segment
    from neutronstarlite_tpu.ops.graph_ops import GraphTensors
    from neutronstarlite_tpu.parallel.depcomm import (build_dist_graph,
                                                      device_view,
                                                      make_tensors)
    from neutronstarlite_tpu.parallel.mesh import make_mesh
    from neutronstarlite_tpu.training.dist_trainer import _shard_map

    g = sbm.graph
    x_np = np.random.default_rng(3).standard_normal(
        (g.num_vertices, 6)).astype(np.float32)
    gt = GraphTensors.from_graph(g, backend="xla")
    want = np.asarray(segment.spmm(
        jnp.ones(g.num_edges), jnp.asarray(x_np),
        jnp.asarray(g.fwd_src), jnp.asarray(g.fwd_dst), g.num_vertices))

    mesh = make_mesh(4)
    dg = build_dist_graph(g, 4)
    assert (dg.e_w == 0).any(), "fixture must have padding edges"
    arrs = jax.tree.map(jnp.asarray, device_view(dg))
    x = jnp.asarray(dg.shard_features(x_np))

    def f(arrs, x):
        sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        gt_d = make_tensors(sq(arrs), dg)
        table = gt_d.get_dep_nbr(sq(x))
        # ONES for every edge INCLUDING padding — the op must mask
        return gt_d.aggregate_weighted(jnp.ones_like(gt_d.e_w), table)[None]

    spec = jax.tree.map(lambda _: P("p"), arrs)
    y = np.asarray(jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p")),
                                      out_specs=P("p")))(arrs, x))
    off = dg.partition.offsets
    for i in range(4):
        n = off[i + 1] - off[i]
        np.testing.assert_allclose(y[i, :n], want[off[i]:off[i + 1]],
                                   rtol=1e-4, atol=1e-5)
