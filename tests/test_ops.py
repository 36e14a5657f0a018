"""Unit tests for the graph operator zoo.

Strategy (SURVEY.md §4 implication): (a) each op vs a dense-matrix oracle,
(b) the reference's degree oracle — features of all-ones aggregated with unit
weights must equal in-degree (toolkits/test_getdepneighbor_cpu.hpp), (c) VJPs
vs numerical/dense-autodiff gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutronstarlite_tpu.ops import segment
from neutronstarlite_tpu.ops.graph_ops import GraphTensors


def dense_adj(g, weighted=True):
    """Dense [V,V] adjacency oracle: A[d,s] = Σ w over edges (s→d)."""
    a = np.zeros((g.num_vertices, g.num_vertices), dtype=np.float64)
    w = g.fwd_weight if weighted else np.ones_like(g.fwd_weight)
    np.add.at(a, (g.fwd_dst, g.fwd_src), w)
    return a


@pytest.fixture(scope="module")
def gt(small_graph):
    return GraphTensors.from_graph(small_graph, backend="xla")


@pytest.fixture(scope="module")
def feats(small_graph):
    r = np.random.default_rng(3)
    return jnp.asarray(r.standard_normal(
        (small_graph.num_vertices, 16)).astype(np.float32))


class TestScatterAggregate:
    def test_scatter_src(self, gt, feats, small_graph):
        out = gt.scatter_src(feats)
        np.testing.assert_allclose(out, np.asarray(feats)[small_graph.fwd_src])

    def test_scatter_dst(self, gt, feats, small_graph):
        out = gt.scatter_dst(feats)
        np.testing.assert_allclose(out, np.asarray(feats)[small_graph.fwd_dst])

    def test_scatter_src_dst_concat(self, gt, feats):
        out = gt.scatter_src_dst(feats)
        assert out.shape == (gt.num_edges, 2 * feats.shape[1])
        np.testing.assert_allclose(out[:, :16], gt.scatter_src(feats))
        np.testing.assert_allclose(out[:, 16:], gt.scatter_dst(feats))

    def test_aggregate_sum_degree_oracle(self, gt, small_graph):
        """ones aggregated unweighted == in_degree (reference's
        test_getdepneighbor oracle)."""
        ones = jnp.ones((gt.num_edges, 1), jnp.float32)
        out = gt.aggregate_dst_sum(ones)
        np.testing.assert_allclose(
            out[:, 0], small_graph.in_degree.astype(np.float32))

    def test_aggregate_sum_vs_dense(self, gt, feats, small_graph):
        ev = gt.scatter_src(feats)
        out = gt.aggregate_dst_sum(ev)
        oracle = dense_adj(small_graph, weighted=False) @ np.asarray(
            feats, np.float64)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)

    def test_aggregate_min_max(self, gt, feats, small_graph):
        ev = np.asarray(gt.scatter_src(feats))
        vmin = np.asarray(segment.aggregate_dst_min(
            jnp.asarray(ev), gt.fwd_dst, gt.num_vertices))
        vmax = np.asarray(segment.aggregate_dst_max(
            jnp.asarray(ev), gt.fwd_dst, gt.num_vertices))
        for v in range(small_graph.num_vertices):
            sel = small_graph.fwd_dst == v
            if sel.any():
                np.testing.assert_allclose(vmin[v], ev[sel].min(0), rtol=1e-6)
                np.testing.assert_allclose(vmax[v], ev[sel].max(0), rtol=1e-6)
            else:
                np.testing.assert_allclose(vmin[v], 0)

    def test_min_grad_routes_to_first_argmin(self, gt):
        """Gradient flows only to the first extremal edge per segment
        (reference record[] semantics, ntsBaseOp.hpp nts_min)."""
        r = np.random.default_rng(5)
        ev = jnp.asarray(r.standard_normal((gt.num_edges, 4)).astype(np.float32))

        def f(e):
            return jnp.sum(segment.aggregate_dst_min(e, gt.fwd_dst,
                                                     gt.num_vertices))
        g = np.asarray(jax.grad(f)(ev))
        # each column of each non-empty segment must have exactly one 1
        dst = np.asarray(gt.fwd_dst)
        for v in np.unique(dst):
            seg = g[dst == v]
            np.testing.assert_allclose(seg.sum(0), np.ones(4))
            assert ((seg == 0) | (seg == 1)).all()


class TestEdgeSoftmax:
    def test_sums_to_one(self, gt):
        r = np.random.default_rng(11)
        m = jnp.asarray(r.standard_normal((gt.num_edges, 1)).astype(np.float32))
        a = gt.edge_softmax(m)
        sums = gt.aggregate_dst_sum(a)
        dst_has_edges = np.asarray(gt.in_degree) > 0
        np.testing.assert_allclose(np.asarray(sums)[dst_has_edges, 0], 1.0,
                                   rtol=1e-5)

    def test_matches_per_segment_softmax(self, gt, small_graph):
        r = np.random.default_rng(13)
        m = r.standard_normal(gt.num_edges).astype(np.float32)
        a = np.asarray(gt.edge_softmax(jnp.asarray(m[:, None])))[:, 0]
        dst = small_graph.fwd_dst
        for v in np.unique(dst):
            sel = dst == v
            ref = np.exp(m[sel] - m[sel].max())
            ref = ref / ref.sum()
            np.testing.assert_allclose(a[sel], ref, rtol=1e-5, atol=1e-6)

    def test_softmax_vjp_matches_dense(self, gt):
        """edge_softmax grad == per-segment dense softmax jacobian product."""
        r = np.random.default_rng(17)
        m = jnp.asarray(r.standard_normal((gt.num_edges, 1)).astype(np.float32))
        co = jnp.asarray(r.standard_normal((gt.num_edges, 1)).astype(np.float32))

        def f(mm):
            return jnp.sum(gt.edge_softmax(mm) * co)
        g = np.asarray(jax.grad(f)(m))[:, 0]
        # oracle per segment: J^T v with J = diag(s) - s s^T
        a = np.asarray(gt.edge_softmax(m))[:, 0]
        cot = np.asarray(co)[:, 0]
        dst = np.asarray(gt.fwd_dst)
        for v in np.unique(dst):
            sel = dst == v
            s, gv = a[sel], cot[sel]
            oracle = s * gv - s * np.dot(s, gv)
            np.testing.assert_allclose(g[sel], oracle, rtol=1e-4, atol=1e-5)


class TestSpmm:
    def test_spmm_vs_dense(self, gt, feats, small_graph):
        out = gt.aggregate_neighbors(feats)
        oracle = dense_adj(small_graph) @ np.asarray(feats, np.float64)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)

    def test_spmm_grad_is_transpose(self, gt, feats, small_graph):
        """d/dX (1ᵀ(A X) c) == Aᵀ (1 cᵀ) — transpose aggregation."""
        co = np.random.default_rng(19).standard_normal(
            (gt.num_vertices, 16)).astype(np.float32)

        def f(x):
            return jnp.sum(gt.aggregate_neighbors(x) * co)
        g = np.asarray(jax.grad(f)(feats))
        oracle = dense_adj(small_graph).T @ co.astype(np.float64)
        np.testing.assert_allclose(g, oracle, rtol=1e-4, atol=1e-4)

    def test_spmm_transpose_explicit(self, gt, feats, small_graph):
        out = segment.spmm_transpose(gt.bwd_weight, feats, gt.bwd_src,
                                     gt.bwd_dst, gt.num_vertices)
        oracle = dense_adj(small_graph).T @ np.asarray(feats, np.float64)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-4)

    def test_weighted_aggregate_weight_grad_is_sddmm(self, gt, feats,
                                                     small_graph):
        """d/dw Σ (agg(w,X) ∘ C) == dot(X[src], C[dst]) per edge — the SDDMM
        the reference computes in DistAggregateDstFuseWeight::backward."""
        co = jnp.asarray(np.random.default_rng(23).standard_normal(
            (gt.num_vertices, 16)).astype(np.float32))
        w0 = jnp.asarray(np.random.default_rng(29).random(
            gt.num_edges).astype(np.float32))

        def f(w):
            return jnp.sum(gt.aggregate_weighted(w, feats) * co)
        g = np.asarray(jax.grad(f)(w0))
        oracle = np.asarray(gt.sddmm_dot(feats, co))
        np.testing.assert_allclose(g, oracle, rtol=1e-4, atol=1e-4)


class TestEllBackend:
    def test_ell_spmm_matches_segment(self, small_graph, feats):
        gt_p = GraphTensors.from_graph(small_graph, backend="pallas")
        gt_x = GraphTensors.from_graph(small_graph, backend="xla")
        np.testing.assert_allclose(gt_p.aggregate_neighbors(feats),
                                   gt_x.aggregate_neighbors(feats),
                                   rtol=1e-4, atol=1e-4)

    def test_ell_grad_matches_segment(self, small_graph, feats):
        gt_p = GraphTensors.from_graph(small_graph, backend="pallas")
        gt_x = GraphTensors.from_graph(small_graph, backend="xla")

        def make_f(gt):
            def f(x):
                return jnp.sum(jnp.sin(gt.aggregate_neighbors(x)))
            return f
        gp = jax.grad(make_f(gt_p))(feats)
        gx = jax.grad(make_f(gt_x))(feats)
        np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-4)

    def test_ell_tail_spill(self, small_graph, feats):
        """Tiny ell_cap forces the COO tail path; result must not change."""
        gt_p = GraphTensors.from_graph(small_graph, backend="pallas", ell_cap=2)
        gt_x = GraphTensors.from_graph(small_graph, backend="xla")
        np.testing.assert_allclose(gt_p.aggregate_neighbors(feats),
                                   gt_x.aggregate_neighbors(feats),
                                   rtol=1e-4, atol=1e-4)


class TestEllExtremal:
    """Fused slab max/min (ell.aggregate_max/min) vs the segment path:
    values AND first-extremal-edge gradient routing must match exactly —
    including under ties, where both must pick the same single winner."""

    def _grad_pair(self, gt_p, gt_x, x, op):
        co = jnp.asarray(np.random.default_rng(7).standard_normal(
            x.shape).astype(np.float32))

        def make_f(gt):
            def f(xx):
                return jnp.sum(getattr(gt, op)(xx) * co)
            return f
        return (jax.value_and_grad(make_f(gt_p))(x),
                jax.value_and_grad(make_f(gt_x))(x))

    @pytest.mark.parametrize("op", ["aggregate_neighbor_max",
                                    "aggregate_neighbor_min"])
    def test_fused_matches_segment(self, small_graph, feats, op):
        gt_p = GraphTensors.from_graph(small_graph, backend="pallas")
        gt_x = GraphTensors.from_graph(small_graph, backend="xla")
        np.testing.assert_allclose(getattr(gt_p, op)(feats),
                                   getattr(gt_x, op)(feats),
                                   rtol=1e-5, atol=1e-6)
        (vp, gp), (vx, gx) = self._grad_pair(gt_p, gt_x, feats, op)
        np.testing.assert_allclose(vp, vx, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("ell_cap", [8, 256])
    def test_tie_routing_matches_segment(self, small_graph, ell_cap):
        """relu-style inputs (many exact zeros) make extremal TIES common —
        exactly SAGE's pooling input. Both engines must route the gradient
        to the SAME single first edge per (dst, lane); ell_cap=8 (choose_k's
        floor) forces winners to live in (and tie across) base vs tail
        slabs — asserted below so a fixture change can't silently drop the
        cross-slab coverage."""
        r = np.random.default_rng(11)
        x = jnp.asarray(np.maximum(r.standard_normal(
            (small_graph.num_vertices, 16)), 0).astype(np.float32))
        gt_p = GraphTensors.from_graph(small_graph, backend="pallas",
                                       ell_cap=ell_cap)
        gt_x = GraphTensors.from_graph(small_graph, backend="xla")
        if ell_cap == 8:
            assert gt_p.ell.f_tail_idx.shape[0] > 0, \
                "fixture no longer spills into tail slabs at K=8"
        (vp, gp), (vx, gx) = self._grad_pair(
            gt_p, gt_x, x, "aggregate_neighbor_max")
        np.testing.assert_allclose(vp, vx, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-6)
        # all-constant: EVERY edge ties; still exactly one winner each
        ones = jnp.ones_like(x)
        (vp, gp), (vx, gx) = self._grad_pair(
            gt_p, gt_x, ones, "aggregate_neighbor_max")
        np.testing.assert_allclose(vp, vx, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-6)

    def test_empty_rows_zero_and_no_grad(self):
        """Vertices with no in-edges: output 0, no gradient contribution
        (matching the segment path's empty-segment convention)."""
        from neutronstarlite_tpu.graph.structure import build_graph
        # vertex 3 has no in-edges; vertex 4 no edges at all
        src = np.array([0, 1, 2, 0, 1], np.int32)
        dst = np.array([1, 0, 0, 2, 2], np.int32)
        g = build_graph(src, dst, 5, weight="ones")
        gt_p = GraphTensors.from_graph(g, backend="pallas")
        gt_x = GraphTensors.from_graph(g, backend="xla")
        x = jnp.asarray(np.random.default_rng(5).standard_normal(
            (5, 4)).astype(np.float32))
        out = np.asarray(gt_p.aggregate_neighbor_max(x))
        np.testing.assert_allclose(out[3:], 0.0)

        co = jnp.asarray(np.random.default_rng(9).standard_normal(
            (5, 4)).astype(np.float32))

        def make_f(gt):
            return lambda xx: jnp.sum(gt.aggregate_neighbor_max(xx) * co)
        gp = jax.grad(make_f(gt_p))(x)
        gx = jax.grad(make_f(gt_x))(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("width", [96, 160])
    def test_winner_route_width_branches(self, small_graph, width):
        """The r5 width-adaptive winner-route backward
        (ell._slab_route_win): F <= 128 ships ONE packed [V, 2F]
        winners ∥ f32-bitcast-cotangent gather stream, F > 128 keeps two
        separate F-lane streams. Every other extremal test runs at
        F <= 16, so without this the F > 128 branch has no unit
        coverage — pin BOTH branches (one width each side of the
        threshold) to the segment oracle, values and first-extremal tie
        routing, on relu-style tie-heavy inputs."""
        r = np.random.default_rng(5)
        x = jnp.asarray(np.maximum(r.standard_normal(
            (small_graph.num_vertices, width)), 0).astype(np.float32))
        gt_p = GraphTensors.from_graph(small_graph, backend="pallas")
        gt_x = GraphTensors.from_graph(small_graph, backend="xla")
        (vp, gp), (vx, gx) = self._grad_pair(
            gt_p, gt_x, x, "aggregate_neighbor_max")
        np.testing.assert_allclose(vp, vx, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gp, gx, rtol=1e-5, atol=1e-6)
