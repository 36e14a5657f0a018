"""ELL engine tests: slot permutation, fused attention vs segment oracle,
row-split tail correctness on hub-heavy (power-law) graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutronstarlite_tpu.graph.structure import add_self_loops, build_graph
from neutronstarlite_tpu.ops import ell, segment
from neutronstarlite_tpu.ops.graph_ops import GraphTensors


def hub_graph(v=120, e=1500, seed=3):
    """Zipf-ish graph guaranteed to have hub rows beyond any small K."""
    r = np.random.default_rng(seed)
    w = (np.arange(1, v + 1) ** -1.0)
    w /= w.sum()
    dst = r.choice(v, size=e, p=w).astype(np.int32)
    src = r.integers(0, v, e).astype(np.int32)
    src, dst = add_self_loops(src, dst, v)
    return build_graph(src, dst, v)


@pytest.fixture(scope="module")
def g():
    return hub_graph()


@pytest.fixture(scope="module")
def eg(g):
    return ell.build_ell_graph(g, ell_cap=16)  # small cap → real tail


@pytest.fixture(scope="module")
def feats(g):
    r = np.random.default_rng(7)
    return jnp.asarray(r.standard_normal((g.num_vertices, 24))
                       .astype(np.float32))


class TestSlabStructure:
    def test_tail_exists(self, eg):
        assert eg.f_tail_idx.shape[0] > 0, "test graph must exercise the tail"

    def test_slab_edge_conservation(self, g, eg):
        """Every edge appears exactly once across base+tail (weight sum)."""
        total = float(np.asarray(eg.f_w).sum() + np.asarray(eg.f_tail_w).sum())
        np.testing.assert_allclose(total, g.fwd_weight.sum(), rtol=1e-5)
        total_b = float(np.asarray(eg.b_w).sum()
                        + np.asarray(eg.b_tail_w).sum())
        np.testing.assert_allclose(total_b, g.bwd_weight.sum(), rtol=1e-5)

    def test_perm_roundtrip(self, g, eg):
        """b_perm maps each backward slot to the forward slot of the SAME
        edge: gathering fwd weights through it must reproduce bwd weights."""
        f_flat = np.concatenate([np.asarray(eg.f_w).ravel(),
                                 np.asarray(eg.f_tail_w).ravel(), [0.0]])
        b_valid = np.asarray(eg.b_w) != 0
        got = f_flat[np.asarray(eg.b_perm)]
        np.testing.assert_allclose(got[b_valid],
                                   np.asarray(eg.b_w)[b_valid], rtol=1e-6)
        if eg.b_tail_idx.shape[0]:
            bt_valid = np.asarray(eg.b_tail_w) != 0
            got_t = f_flat[np.asarray(eg.b_tail_perm)]
            np.testing.assert_allclose(got_t[bt_valid],
                                       np.asarray(eg.b_tail_w)[bt_valid],
                                       rtol=1e-6)


class TestEllSpmm:
    def test_fwd_matches_segment(self, g, eg, feats):
        out = ell.spmm(eg, feats)
        oracle = segment.spmm(jnp.asarray(g.fwd_weight), feats,
                              jnp.asarray(g.fwd_src), jnp.asarray(g.fwd_dst),
                              g.num_vertices)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)

    def test_grad_matches_segment(self, g, eg, feats):
        def f_ell(x):
            return jnp.sum(jnp.sin(ell.spmm(eg, x)))

        def f_seg(x):
            y = segment.spmm(jnp.asarray(g.fwd_weight), x,
                             jnp.asarray(g.fwd_src), jnp.asarray(g.fwd_dst),
                             g.num_vertices)
            return jnp.sum(jnp.sin(y))
        np.testing.assert_allclose(jax.grad(f_ell)(feats),
                                   jax.grad(f_seg)(feats),
                                   rtol=1e-4, atol=1e-5)


class TestAttentionAggregate:
    def segment_oracle(self, g, feats, s_src, s_dst, slope=0.2):
        m = jax.nn.leaky_relu(
            jnp.take(s_src, jnp.asarray(g.fwd_src))
            + jnp.take(s_dst, jnp.asarray(g.fwd_dst)), negative_slope=slope)
        a = segment.edge_softmax(m[:, None], jnp.asarray(g.fwd_dst),
                                 g.num_vertices)[:, 0]
        return segment.spmm(a, feats, jnp.asarray(g.fwd_src),
                            jnp.asarray(g.fwd_dst), g.num_vertices)

    @pytest.fixture()
    def scores(self, g):
        r = np.random.default_rng(11)
        return (jnp.asarray(r.standard_normal(g.num_vertices)
                            .astype(np.float32)),
                jnp.asarray(r.standard_normal(g.num_vertices)
                            .astype(np.float32)))

    def test_fwd_matches_segment(self, g, eg, feats, scores):
        s_src, s_dst = scores
        out = ell.attention_aggregate(eg, feats, s_src, s_dst, 0.2)
        oracle = self.segment_oracle(g, feats, s_src, s_dst)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)

    def test_all_grads_match_segment(self, g, eg, feats, scores):
        s_src, s_dst = scores
        co = jnp.asarray(np.random.default_rng(13).standard_normal(
            (g.num_vertices, 24)).astype(np.float32))

        def f_ell(x, ss, sd):
            return jnp.sum(ell.attention_aggregate(eg, x, ss, sd, 0.2) * co)

        def f_seg(x, ss, sd):
            return jnp.sum(self.segment_oracle(g, x, ss, sd) * co)

        g_ell = jax.grad(f_ell, argnums=(0, 1, 2))(feats, s_src, s_dst)
        g_seg = jax.grad(f_seg, argnums=(0, 1, 2))(feats, s_src, s_dst)
        for a, b, name in zip(g_ell, g_seg, ("dx", "ds_src", "ds_dst")):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4,
                                       err_msg=f"grad mismatch: {name}")

    def test_gat_model_ell_backend_matches_xla(self, g, feats):
        from neutronstarlite_tpu.models import gat
        st = gat.init(jax.random.PRNGKey(5), [24, 8])
        gt_x = GraphTensors.from_graph(g, backend="xla")
        gt_p = GraphTensors.from_graph(g, backend="pallas")
        out_x, _ = gat.forward(st, gt_x, feats, None, training=False)
        out_p, _ = gat.forward(st, gt_p, feats, None, training=False)
        np.testing.assert_allclose(out_p, out_x, rtol=1e-3, atol=1e-4)


class TestAttentionAggregateLinear:
    """attention_aggregate_linear (scores recomputed in-block from the
    gathered rows) must match the segment oracle with s_src = x·a_l, in
    forward and in ALL grads (dx incl. the linearization term, da_l,
    ds_dst)."""

    def oracle(self, g, x, a_l, s_dst, slope=0.2):
        s_src = x @ a_l
        m = jax.nn.leaky_relu(
            jnp.take(s_src, jnp.asarray(g.fwd_src))
            + jnp.take(s_dst, jnp.asarray(g.fwd_dst)), negative_slope=slope)
        a = segment.edge_softmax(m[:, None], jnp.asarray(g.fwd_dst),
                                 g.num_vertices)[:, 0]
        return segment.spmm(a, x, jnp.asarray(g.fwd_src),
                            jnp.asarray(g.fwd_dst), g.num_vertices)

    @pytest.fixture()
    def vecs(self, g, feats):
        r = np.random.default_rng(17)
        return (jnp.asarray(r.standard_normal(feats.shape[1])
                            .astype(np.float32)),
                jnp.asarray(r.standard_normal(g.num_vertices)
                            .astype(np.float32)))

    def test_fwd_matches_oracle(self, g, eg, feats, vecs):
        a_l, s_dst = vecs
        out = ell.attention_aggregate_linear(eg, feats, a_l, s_dst, 0.2)
        np.testing.assert_allclose(out, self.oracle(g, feats, a_l, s_dst),
                                   rtol=1e-4, atol=1e-5)

    def test_all_grads_match_oracle(self, g, eg, feats, vecs):
        a_l, s_dst = vecs
        co = jnp.asarray(np.random.default_rng(19).standard_normal(
            (g.num_vertices, feats.shape[1])).astype(np.float32))

        def f_ell(x, al, sd):
            return jnp.sum(
                ell.attention_aggregate_linear(eg, x, al, sd, 0.2) * co)

        def f_seg(x, al, sd):
            return jnp.sum(self.oracle(g, x, al, sd) * co)

        g_ell = jax.grad(f_ell, argnums=(0, 1, 2))(feats, a_l, s_dst)
        g_seg = jax.grad(f_seg, argnums=(0, 1, 2))(feats, a_l, s_dst)
        for a, b, name in zip(g_ell, g_seg, ("dx", "da_l", "ds_dst")):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4,
                                       err_msg=f"grad mismatch: {name}")

    def test_matches_nonlinear_op(self, g, eg, feats, vecs):
        """Same result as the generic op fed the materialized s_src."""
        a_l, s_dst = vecs
        out_lin = ell.attention_aggregate_linear(eg, feats, a_l, s_dst, 0.2)
        out_gen = ell.attention_aggregate(eg, feats, feats @ a_l, s_dst, 0.2)
        np.testing.assert_allclose(out_lin, out_gen, rtol=1e-4, atol=1e-5)

    def test_wide_feature_split_stats_branch(self, g, eg):
        """F + 4 > 128 lanes routes the backward stats through the
        separate small-table gather (tile-aware transport); fwd and all
        grads must still match the oracle."""
        r = np.random.default_rng(29)
        f = 126   # 126 + 4 = 130 > 128 → split-stats branch
        x = jnp.asarray(r.standard_normal((g.num_vertices, f))
                        .astype(np.float32))
        a_l = jnp.asarray(r.standard_normal(f).astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal(g.num_vertices)
                            .astype(np.float32))
        out = ell.attention_aggregate_linear(eg, x, a_l, s_dst, 0.2)
        np.testing.assert_allclose(out, self.oracle(g, x, a_l, s_dst),
                                   rtol=1e-4, atol=1e-5)
        co = jnp.asarray(r.standard_normal((g.num_vertices, f))
                         .astype(np.float32))
        g_ell = jax.grad(lambda xx, al, sd: jnp.sum(
            ell.attention_aggregate_linear(eg, xx, al, sd, 0.2) * co),
            argnums=(0, 1, 2))(x, a_l, s_dst)
        g_seg = jax.grad(lambda xx, al, sd: jnp.sum(
            self.oracle(g, xx, al, sd) * co), argnums=(0, 1, 2))(x, a_l,
                                                                 s_dst)
        for a, b, name in zip(g_ell, g_seg, ("dx", "da_l", "ds_dst")):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4,
                                       err_msg=f"grad mismatch: {name}")

    def test_no_tail_graph(self):
        """Base-only slabs (no row-split tails) take the has_tail=False
        branches in fwd AND bwd."""
        r = np.random.default_rng(23)
        v = 48
        src = r.integers(0, v, 300).astype(np.int32)
        dst = r.integers(0, v, 300).astype(np.int32)
        src, dst = add_self_loops(src, dst, v)
        g2 = build_graph(src, dst, v)
        eg2 = ell.build_ell_graph(g2, ell_cap=256)
        assert eg2.f_tail_idx.shape[0] == 0
        x = jnp.asarray(r.standard_normal((v, 12)).astype(np.float32))
        a_l = jnp.asarray(r.standard_normal(12).astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal(v).astype(np.float32))
        out = ell.attention_aggregate_linear(eg2, x, a_l, s_dst, 0.2)
        np.testing.assert_allclose(out, self.oracle(g2, x, a_l, s_dst),
                                   rtol=1e-4, atol=1e-5)
        grads = jax.grad(lambda xx: jnp.sum(
            ell.attention_aggregate_linear(eg2, xx, a_l, s_dst, 0.2) ** 2)
        )(x)
        oracle_g = jax.grad(lambda xx: jnp.sum(
            self.oracle(g2, xx, a_l, s_dst) ** 2))(x)
        np.testing.assert_allclose(grads, oracle_g, rtol=2e-3, atol=1e-4)


class TestAttentionHeadsFused:
    """attention_aggregate_linear_heads (ONE shared gather for all heads)
    vs the per-head loop of the oracle-pinned single-head op."""

    def per_head(self, eg, x, a_l, s_dst, slope=0.2):
        fh, h = a_l.shape
        outs = [ell.attention_aggregate_linear(
            eg, x[:, i * fh:(i + 1) * fh], a_l[:, i], s_dst[:, i], slope)
            for i in range(h)]
        return jnp.concatenate(outs, axis=-1)

    def _check(self, g_, eg_, f, h, seed, rtol=2e-3, atol=1e-4):
        r = np.random.default_rng(seed)
        v = g_.num_vertices
        x = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
        a_l = jnp.asarray(r.standard_normal((f // h, h))
                          .astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal((v, h)).astype(np.float32))
        co = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
        out = ell.attention_aggregate_linear_heads(eg_, x, a_l, s_dst, 0.2)
        ref = self.per_head(eg_, x, a_l, s_dst, 0.2)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
        g_fused = jax.grad(lambda xx, al, sd: jnp.sum(
            ell.attention_aggregate_linear_heads(eg_, xx, al, sd, 0.2)
            * co), argnums=(0, 1, 2))(x, a_l, s_dst)
        g_loop = jax.grad(lambda xx, al, sd: jnp.sum(
            self.per_head(eg_, xx, al, sd, 0.2) * co),
            argnums=(0, 1, 2))(x, a_l, s_dst)
        for a, b, name in zip(g_fused, g_loop, ("dx", "da_l", "ds_dst")):
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                       err_msg=f"grad mismatch: {name}")

    def test_heads_match_per_head_loop(self, g, eg):
        """H=3 over a tailed hub graph (fuse-lanes stat transport)."""
        self._check(g, eg, f=24, h=3, seed=11)

    def test_heads_wide_split_branch(self, g, eg):
        """F + 4H > 128 routes the per-dst stats through the standalone
        pre-gather (split2pass transport); grads must still match."""
        self._check(g, eg, f=120, h=4, seed=13)

    def test_heads_no_tail_and_isolated(self):
        """Base-only slabs + isolated vertices (empty dst rows)."""
        r = np.random.default_rng(31)
        v = 50
        src = r.integers(0, v - 6, 260).astype(np.int32)
        dst = r.integers(0, v - 6, 260).astype(np.int32)
        src, dst = add_self_loops(src, dst, v - 6)
        g2 = build_graph(src, dst, v)  # last 6 vertices isolated
        eg2 = ell.build_ell_graph(g2, ell_cap=256)
        assert eg2.f_tail_idx.shape[0] == 0
        self._check(g2, eg2, f=16, h=2, seed=17)

    def test_graphtensors_dispatch_backends_agree(self, g, feats):
        """GraphTensors.attention_aggregate_linear_heads: the xla backend
        (per-head chain) and the ELL backend (fused all-heads) must
        agree."""
        r = np.random.default_rng(37)
        f, h = feats.shape[1], 2
        a_l = jnp.asarray(r.standard_normal((f // h, h))
                          .astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal((g.num_vertices, h))
                            .astype(np.float32))
        gt_x = GraphTensors.from_graph(g, backend="xla")
        gt_p = GraphTensors.from_graph(g, backend="pallas")
        out_x = gt_x.attention_aggregate_linear_heads(feats, a_l, s_dst)
        out_p = gt_p.attention_aggregate_linear_heads(feats, a_l, s_dst)
        np.testing.assert_allclose(out_p, out_x, rtol=1e-3, atol=1e-4)

    def test_single_head_degenerates_to_linear(self, g, eg, feats):
        """H=1 must equal attention_aggregate_linear exactly."""
        r = np.random.default_rng(19)
        f = feats.shape[1]
        a_l = jnp.asarray(r.standard_normal((f, 1)).astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal((g.num_vertices, 1))
                            .astype(np.float32))
        out_h = ell.attention_aggregate_linear_heads(eg, feats, a_l,
                                                     s_dst, 0.2)
        out_1 = ell.attention_aggregate_linear(eg, feats, a_l[:, 0],
                                               s_dst[:, 0], 0.2)
        np.testing.assert_allclose(out_h, out_1, rtol=1e-5, atol=1e-6)


class TestBf16Aggregation:
    def test_bf16_spmm_close_to_f32(self, g, feats):
        eg32 = ell.build_ell_graph(g)
        eg16 = ell.build_ell_graph(g, agg_dtype="bfloat16")
        y32 = np.asarray(ell.spmm(eg32, feats))
        y16 = np.asarray(ell.spmm(eg16, feats))
        assert y16.dtype == np.float32  # output restored to input dtype
        np.testing.assert_allclose(y16, y32, rtol=2e-2, atol=2e-2)

    def test_bf16_grad_dtype_and_value(self, g, feats):
        eg16 = ell.build_ell_graph(g, agg_dtype="bfloat16")
        eg32 = ell.build_ell_graph(g)

        def f(eg):
            return jax.grad(lambda x: jnp.sum(jnp.sin(ell.spmm(eg, x))))(feats)
        g16, g32 = np.asarray(f(eg16)), np.asarray(f(eg32))
        assert g16.dtype == np.float32
        np.testing.assert_allclose(g16, g32, rtol=3e-2, atol=3e-2)


class TestGatedAggregate:
    def segment_oracle(self, g, x, g_src, g_dst, slope=0.2):
        m = jax.nn.leaky_relu(
            jnp.take(g_src, jnp.asarray(g.fwd_src), axis=0)
            + jnp.take(g_dst, jnp.asarray(g.fwd_dst), axis=0),
            negative_slope=slope)
        a = segment.edge_softmax(m, jnp.asarray(g.fwd_dst), g.num_vertices)
        msg = jnp.take(x, jnp.asarray(g.fwd_src), axis=0) * a
        return segment.aggregate_dst_sum(msg, jnp.asarray(g.fwd_dst),
                                         g.num_vertices)

    @pytest.fixture()
    def gates(self, g):
        r = np.random.default_rng(19)
        return (jnp.asarray(r.standard_normal((g.num_vertices, 24))
                            .astype(np.float32)),
                jnp.asarray(r.standard_normal((g.num_vertices, 24))
                            .astype(np.float32)))

    def test_fwd_matches_segment(self, g, eg, feats, gates):
        gs, gd = gates
        out = ell.gated_aggregate(eg, feats, gs, gd, 0.2)
        oracle = self.segment_oracle(g, feats, gs, gd)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)

    def test_all_grads_match_segment(self, g, eg, feats, gates):
        gs, gd = gates
        co = jnp.asarray(np.random.default_rng(23).standard_normal(
            (g.num_vertices, 24)).astype(np.float32))

        def f_ell(x, a, b):
            return jnp.sum(ell.gated_aggregate(eg, x, a, b, 0.2) * co)

        def f_seg(x, a, b):
            return jnp.sum(self.segment_oracle(g, x, a, b) * co)

        ge = jax.grad(f_ell, argnums=(0, 1, 2))(feats, gs, gd)
        gx = jax.grad(f_seg, argnums=(0, 1, 2))(feats, gs, gd)
        for a, b, name in zip(ge, gx, ("dx", "dg_src", "dg_dst")):
            np.testing.assert_allclose(a, b, rtol=3e-3, atol=2e-4,
                                       err_msg=f"gated grad mismatch: {name}")

    def test_ggcn_model_backends_match(self, g, feats):
        from neutronstarlite_tpu.models import ggcn
        st = ggcn.init(jax.random.PRNGKey(8), [24, 8])
        gt_x = GraphTensors.from_graph(g, backend="xla")
        gt_p = GraphTensors.from_graph(g, backend="pallas")
        ox, _ = ggcn.forward(st, gt_x, feats, None, training=False)
        op, _ = ggcn.forward(st, gt_p, feats, None, training=False)
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   rtol=1e-3, atol=1e-4)


class TestGatedChunked:
    """The chunked gated pipeline (forced via _GATED_CHUNK_BYTES=0) must
    match the dense slot-tensor path bit-for-tolerance on out and all
    three gradients — it is the Reddit-scale GGCN enabler."""

    @pytest.fixture()
    def gates(self, g):
        r = np.random.default_rng(19)
        return (jnp.asarray(r.standard_normal((g.num_vertices, 24))
                            .astype(np.float32)),
                jnp.asarray(r.standard_normal((g.num_vertices, 24))
                            .astype(np.float32)))

    def _both(self, monkeypatch, fn):
        dense = fn()
        monkeypatch.setattr(ell, "_GATED_CHUNK_BYTES", 0)
        chunked = fn()
        return dense, chunked

    def test_fwd_matches_dense(self, monkeypatch, g, eg, feats, gates):
        gs, gd = gates
        dense, chunked = self._both(
            monkeypatch, lambda: ell.gated_aggregate(eg, feats, gs, gd, 0.2))
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                                   rtol=1e-4, atol=1e-5)

    def test_grads_match_dense(self, monkeypatch, g, eg, feats, gates):
        gs, gd = gates
        co = jnp.asarray(np.random.default_rng(23).standard_normal(
            (g.num_vertices, 24)).astype(np.float32))

        def grads():
            def f(x, a, b):
                return jnp.sum(ell.gated_aggregate(eg, x, a, b, 0.2) * co)
            return jax.grad(f, argnums=(0, 1, 2))(feats, gs, gd)

        dense, chunked = self._both(monkeypatch, grads)
        for d, c, name in zip(dense, chunked, ("dx", "dg_src", "dg_dst")):
            np.testing.assert_allclose(np.asarray(c), np.asarray(d),
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"chunked grad mismatch: {name}")

    def test_no_tail_graph(self, monkeypatch):
        """Low-degree graph with no tail slab through the chunked path."""
        r = np.random.default_rng(5)
        v = 60
        src = np.arange(v, dtype=np.int32)          # ring: max degree 2
        dst = ((np.arange(v) + 1) % v).astype(np.int32)
        s2, d2 = add_self_loops(src, dst, v)
        g2 = build_graph(s2, d2, v)
        eg2 = ell.build_ell_graph(g2, ell_cap=256)
        assert eg2.f_tail_idx.shape[0] == 0
        feats = jnp.asarray(r.standard_normal((v, 8)).astype(np.float32))
        gs = jnp.asarray(r.standard_normal((v, 8)).astype(np.float32))
        gd = jnp.asarray(r.standard_normal((v, 8)).astype(np.float32))

        def run():
            def f(x, a, b):
                return jnp.sum(ell.gated_aggregate(eg2, x, a, b, 0.2) ** 2)
            return (ell.gated_aggregate(eg2, feats, gs, gd, 0.2),
                    jax.grad(f, argnums=(0, 1, 2))(feats, gs, gd))

        (od, gdense) = run()
        monkeypatch.setattr(ell, "_GATED_CHUNK_BYTES", 0)
        (oc, gchunk) = run()
        np.testing.assert_allclose(np.asarray(oc), np.asarray(od),
                                   rtol=1e-4, atol=1e-5)
        for d, c in zip(gdense, gchunk):
            np.testing.assert_allclose(np.asarray(c), np.asarray(d),
                                       rtol=2e-4, atol=2e-5)


class TestGatedLinear:
    """gated_aggregate_linear(eg, x, gl, gd) ≡ gated_aggregate(eg, x,
    x @ gl, gd) on BOTH paths: dense (small graph) and forced-chunked
    (where the fused version gathers only x and recomputes g_src = x·gl
    in-block on the MXU)."""

    @pytest.fixture()
    def lin_inputs(self, g):
        r = np.random.default_rng(31)
        x = jnp.asarray(r.standard_normal((g.num_vertices, 24))
                        .astype(np.float32))
        gl = jnp.asarray(r.standard_normal((24, 24)).astype(np.float32) / 5)
        gd = jnp.asarray(r.standard_normal((g.num_vertices, 24))
                         .astype(np.float32))
        return x, gl, gd

    def _check(self, eg, x, gl, gd, g):
        co = jnp.asarray(np.random.default_rng(37).standard_normal(
            (g.num_vertices, 24)).astype(np.float32))
        out_lin = ell.gated_aggregate_linear(eg, x, gl, gd, 0.2)
        out_ref = ell.gated_aggregate(eg, x, x @ gl, gd, 0.2)
        np.testing.assert_allclose(np.asarray(out_lin), np.asarray(out_ref),
                                   rtol=2e-4, atol=2e-5)

        def f_lin(xx, ggl, ggd):
            return jnp.sum(ell.gated_aggregate_linear(eg, xx, ggl, ggd, 0.2)
                           * co)

        def f_ref(xx, ggl, ggd):
            return jnp.sum(ell.gated_aggregate(eg, xx, xx @ ggl, ggd, 0.2)
                           * co)

        gl_grads = jax.grad(f_lin, argnums=(0, 1, 2))(x, gl, gd)
        gr_grads = jax.grad(f_ref, argnums=(0, 1, 2))(x, gl, gd)
        for a, b, name in zip(gl_grads, gr_grads, ("dx", "dgl", "dg_dst")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-3, atol=3e-4,
                                       err_msg=f"linear-gate grad: {name}")

    def test_dense_path(self, g, eg, lin_inputs):
        self._check(eg, *lin_inputs, g)

    def test_chunked_path(self, monkeypatch, g, eg, lin_inputs):
        monkeypatch.setattr(ell, "_GATED_CHUNK_BYTES", 0)
        self._check(eg, *lin_inputs, g)

    def test_ggcn_model_backends_match(self, g):
        """The model now routes through gated_aggregate_linear; ELL and
        XLA backends must still agree."""
        from neutronstarlite_tpu.models import ggcn
        r = np.random.default_rng(41)
        feats = jnp.asarray(r.standard_normal((g.num_vertices, 24))
                            .astype(np.float32))
        st = ggcn.init(jax.random.PRNGKey(8), [24, 8])
        gt_x = GraphTensors.from_graph(g, backend="xla")
        gt_p = GraphTensors.from_graph(g, backend="pallas")
        ox, _ = ggcn.forward(st, gt_x, feats, None, training=False)
        op, _ = ggcn.forward(st, gt_p, feats, None, training=False)
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   rtol=1e-3, atol=1e-4)

    def test_rejects_nonsquare_gl(self, g, eg, lin_inputs):
        x, gl, gd = lin_inputs
        with pytest.raises(ValueError, match="square gl"):
            ell.gated_aggregate_linear(eg, x, gl[:, :8], gd, 0.2)

    def test_bf16_chunked_close_to_f32(self, monkeypatch, g, lin_inputs):
        """agg_dtype=bfloat16 (the bench fast path) through the chunked
        linear-gate pipeline stays close to the f32 result."""
        monkeypatch.setattr(ell, "_GATED_CHUNK_BYTES", 0)
        x, gl, gd = lin_inputs
        eg32 = ell.build_ell_graph(g, ell_cap=256, agg_dtype="float32")
        eg16 = ell.build_ell_graph(g, ell_cap=256, agg_dtype="bfloat16")
        o32 = ell.gated_aggregate_linear(eg32, x, gl, gd, 0.2)
        o16 = ell.gated_aggregate_linear(eg16, x, gl, gd, 0.2)
        err = float(jnp.max(jnp.abs(o16 - o32)))
        scale = float(jnp.max(jnp.abs(o32))) + 1e-9
        assert err / scale < 0.05, (err, scale)

    def test_bf16_chunked_grads_close_to_f32(self, monkeypatch, g,
                                             lin_inputs):
        """The chunked backward ships its 4F stats table at the aggregate
        dtype (the r3 stats-table diet): bf16 gradients must stay within
        bf16-quantization distance of the f32 chunked gradients."""
        monkeypatch.setattr(ell, "_GATED_CHUNK_BYTES", 0)
        x, gl, gd = lin_inputs
        co = jnp.asarray(np.random.default_rng(39).standard_normal(
            (g.num_vertices, 24)).astype(np.float32))

        def grads(eg):
            def f(xx, ggl, ggd):
                return jnp.sum(
                    ell.gated_aggregate_linear(eg, xx, ggl, ggd, 0.2) * co)
            return jax.grad(f, argnums=(0, 1, 2))(x, gl, gd)

        g32 = grads(ell.build_ell_graph(g, ell_cap=256,
                                        agg_dtype="float32"))
        g16 = grads(ell.build_ell_graph(g, ell_cap=256,
                                        agg_dtype="bfloat16"))
        for a, b, name in zip(g16, g32, ("dx", "dgl", "dg_dst")):
            # relative L2: single-element max-norm is dominated by bf16
            # cancellation noise in the s1 − inner·s2 closed form
            err = float(jnp.linalg.norm(a - b))
            scale = float(jnp.linalg.norm(b)) + 1e-9
            assert err / scale < 0.03, (name, err, scale)


class TestSplitStats:
    """attention_stats / gated_stats + merge_softmax_parts over an edge
    split must reproduce the single-slab fused op EXACTLY in values and
    gradients — the PROC_OVERLAP fused path (local/remote slab sets merged
    by online-softmax rescaling; ref semantics: graph.hpp:3490-3535)."""

    @pytest.fixture(scope="class")
    def split(self, g):
        e = g.num_edges
        src = np.empty(e, np.int32)
        dst = np.empty(e, np.int32)
        w = np.empty(e, np.float32)
        fwd_eid = np.asarray(g.fwd_eid)
        src[fwd_eid] = g.fwd_src
        dst[fwd_eid] = g.fwd_dst
        w[fwd_eid] = g.fwd_weight
        r = np.random.default_rng(11)
        sel = r.random(e) < 0.6                 # arbitrary "local" set
        v = g.num_vertices
        ega = ell.ell_from_np(ell.build_ell_rect_np(
            src[sel], dst[sel], w[sel], v, v, ell_cap=16), v, v)
        egb = ell.ell_from_np(ell.build_ell_rect_np(
            src[~sel], dst[~sel], w[~sel], v, v, ell_cap=16), v, v)
        return ega, egb

    @pytest.fixture(scope="class")
    def scal_inputs(self, g, feats):
        r = np.random.default_rng(21)
        s_src = jnp.asarray(r.standard_normal(g.num_vertices)
                            .astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal(g.num_vertices)
                            .astype(np.float32))
        return feats, s_src, s_dst

    def test_attention_merge_matches_full(self, eg, split, scal_inputs):
        x, s_src, s_dst = scal_inputs
        ega, egb = split
        full = ell.attention_aggregate(eg, x, s_src, s_dst, 0.2)
        merged = ell.merge_softmax_parts([
            ell.attention_stats(ega, x, s_src, s_dst, 0.2),
            ell.attention_stats(egb, x, s_src, s_dst, 0.2)])
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)

    def test_attention_merge_grads_match(self, eg, split, scal_inputs):
        x, s_src, s_dst = scal_inputs
        ega, egb = split

        def loss_full(x_, ss, sd):
            return jnp.sum(ell.attention_aggregate(eg, x_, ss, sd, 0.2) ** 2)

        def loss_merged(x_, ss, sd):
            m = ell.merge_softmax_parts([
                ell.attention_stats(ega, x_, ss, sd, 0.2),
                ell.attention_stats(egb, x_, ss, sd, 0.2)])
            return jnp.sum(m ** 2)

        gf = jax.grad(loss_full, argnums=(0, 1, 2))(x, s_src, s_dst)
        gm = jax.grad(loss_merged, argnums=(0, 1, 2))(x, s_src, s_dst)
        for a, b in zip(gm, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_gated_merge_matches_full(self, g, eg, split, feats):
        r = np.random.default_rng(31)
        gs = jnp.asarray(r.standard_normal((g.num_vertices, 24))
                         .astype(np.float32))
        gd = jnp.asarray(r.standard_normal((g.num_vertices, 24))
                         .astype(np.float32))
        ega, egb = split
        full = ell.gated_aggregate(eg, feats, gs, gd, 0.2)
        merged = ell.merge_softmax_parts([
            ell.gated_stats(ega, feats, gs, gd, 0.2),
            ell.gated_stats(egb, feats, gs, gd, 0.2)])
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)

    def test_gated_merge_grads_match(self, g, eg, split, feats):
        r = np.random.default_rng(32)
        gs = jnp.asarray(r.standard_normal((g.num_vertices, 24))
                         .astype(np.float32))
        gd = jnp.asarray(r.standard_normal((g.num_vertices, 24))
                         .astype(np.float32))
        ega, egb = split

        def loss_full(x_, a_, b_):
            return jnp.sum(ell.gated_aggregate(eg, x_, a_, b_, 0.2) ** 2)

        def loss_merged(x_, a_, b_):
            m = ell.merge_softmax_parts([
                ell.gated_stats(ega, x_, a_, b_, 0.2),
                ell.gated_stats(egb, x_, a_, b_, 0.2)])
            return jnp.sum(m ** 2)

        gf = jax.grad(loss_full, argnums=(0, 1, 2))(feats, gs, gd)
        gm = jax.grad(loss_merged, argnums=(0, 1, 2))(feats, gs, gd)
        for a, b in zip(gm, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_empty_part_rows_are_exact(self, g, eg, feats, scal_inputs):
        """A split where one part owns ALL edges of some rows (the other
        part's rows are empty) must still merge exactly — empty-row parts
        contribute 0 through the stabilizer scaling."""
        x, s_src, s_dst = scal_inputs
        e = g.num_edges
        src = np.empty(e, np.int32)
        dst = np.empty(e, np.int32)
        w = np.empty(e, np.float32)
        fwd_eid = np.asarray(g.fwd_eid)
        src[fwd_eid] = g.fwd_src
        dst[fwd_eid] = g.fwd_dst
        w[fwd_eid] = g.fwd_weight
        sel = dst < g.num_vertices // 2          # rows 0..V/2 entirely in A
        v = g.num_vertices
        ega = ell.ell_from_np(ell.build_ell_rect_np(
            src[sel], dst[sel], w[sel], v, v, ell_cap=16), v, v)
        egb = ell.ell_from_np(ell.build_ell_rect_np(
            src[~sel], dst[~sel], w[~sel], v, v, ell_cap=16), v, v)
        full = ell.attention_aggregate(eg, x, s_src, s_dst, 0.2)
        merged = ell.merge_softmax_parts([
            ell.attention_stats(ega, x, s_src, s_dst, 0.2),
            ell.attention_stats(egb, x, s_src, s_dst, 0.2)])
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)

    # ---- linear-score / linear-gate split stats (PROC_OVERLAP keeps the
    # in-block recompute fast path; VERDICT r3 weak-item 3) ----

    def test_attention_linear_merge_matches_full(self, eg, split,
                                                 scal_inputs):
        x, _, s_dst = scal_inputs
        r = np.random.default_rng(41)
        a_l = jnp.asarray(r.standard_normal(x.shape[-1]).astype(np.float32))
        ega, egb = split
        full = ell.attention_aggregate_linear(eg, x, a_l, s_dst, 0.2)
        merged = ell.merge_softmax_parts([
            ell.attention_stats_linear(ega, x, a_l, s_dst, 0.2),
            ell.attention_stats_linear(egb, x, a_l, s_dst, 0.2)])
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)

    def test_attention_linear_merge_grads_match(self, eg, split,
                                                scal_inputs):
        x, _, s_dst = scal_inputs
        r = np.random.default_rng(42)
        a_l = jnp.asarray(r.standard_normal(x.shape[-1]).astype(np.float32))
        ega, egb = split

        def loss_full(x_, al, sd):
            return jnp.sum(
                ell.attention_aggregate_linear(eg, x_, al, sd, 0.2) ** 2)

        def loss_merged(x_, al, sd):
            m = ell.merge_softmax_parts([
                ell.attention_stats_linear(ega, x_, al, sd, 0.2),
                ell.attention_stats_linear(egb, x_, al, sd, 0.2)])
            return jnp.sum(m ** 2)

        gf = jax.grad(loss_full, argnums=(0, 1, 2))(x, a_l, s_dst)
        gm = jax.grad(loss_merged, argnums=(0, 1, 2))(x, a_l, s_dst)
        for a, b in zip(gm, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_attention_linear_wide_lanes(self, g, split, scal_inputs):
        """F+3 > 128 exercises the separate-small-table stat transport in
        the stats backward (fuse_lanes=False branch)."""
        _, _, s_dst = scal_inputs
        r = np.random.default_rng(43)
        v = g.num_vertices
        x = jnp.asarray(r.standard_normal((v, 130)).astype(np.float32))
        a_l = jnp.asarray(r.standard_normal(130).astype(np.float32))
        ega, egb = split
        eg_full = ell.build_ell_graph(g, ell_cap=16)
        full = ell.attention_aggregate_linear(eg_full, x, a_l, s_dst, 0.2)
        merged = ell.merge_softmax_parts([
            ell.attention_stats_linear(ega, x, a_l, s_dst, 0.2),
            ell.attention_stats_linear(egb, x, a_l, s_dst, 0.2)])
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)

        def loss_merged(x_):
            m = ell.merge_softmax_parts([
                ell.attention_stats_linear(ega, x_, a_l, s_dst, 0.2),
                ell.attention_stats_linear(egb, x_, a_l, s_dst, 0.2)])
            return jnp.sum(m ** 2)

        def loss_full(x_):
            return jnp.sum(
                ell.attention_aggregate_linear(eg_full, x_, a_l, s_dst,
                                               0.2) ** 2)

        # slightly looser than the narrow-lane test: at F=130 the two
        # implementations accumulate in different reduction orders
        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_merged)(x)),
            np.asarray(jax.grad(loss_full)(x)), rtol=1e-3, atol=2e-4)

    def test_gated_linear_merge_matches_full(self, g, eg, split, feats):
        r = np.random.default_rng(44)
        f = feats.shape[-1]
        gl = jnp.asarray(r.standard_normal((f, f)).astype(np.float32) * 0.3)
        gd = jnp.asarray(r.standard_normal((g.num_vertices, f))
                         .astype(np.float32))
        ega, egb = split
        full = ell.gated_aggregate_linear(eg, feats, gl, gd, 0.2)
        merged = ell.merge_softmax_parts([
            ell.gated_stats_linear(ega, feats, gl, gd, 0.2),
            ell.gated_stats_linear(egb, feats, gl, gd, 0.2)])
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)

    def test_gated_linear_merge_grads_match(self, g, eg, split, feats):
        r = np.random.default_rng(45)
        f = feats.shape[-1]
        gl = jnp.asarray(r.standard_normal((f, f)).astype(np.float32) * 0.3)
        gd = jnp.asarray(r.standard_normal((g.num_vertices, f))
                         .astype(np.float32))
        ega, egb = split

        def loss_full(x_, gl_, gd_):
            return jnp.sum(
                ell.gated_aggregate_linear(eg, x_, gl_, gd_, 0.2) ** 2)

        def loss_merged(x_, gl_, gd_):
            m = ell.merge_softmax_parts([
                ell.gated_stats_linear(ega, x_, gl_, gd_, 0.2),
                ell.gated_stats_linear(egb, x_, gl_, gd_, 0.2)])
            return jnp.sum(m ** 2)

        gf = jax.grad(loss_full, argnums=(0, 1, 2))(feats, gl, gd)
        gm = jax.grad(loss_merged, argnums=(0, 1, 2))(feats, gl, gd)
        for a, b in zip(gm, gf):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_gated_linear_merge_chunked(self, monkeypatch, g, eg, split,
                                        feats):
        """The chunked (big-graph) pipeline of gated_stats_linear must
        match its own dense form in values AND grads — the path Reddit-
        scale dist GGCN + PROC_OVERLAP actually runs."""
        r = np.random.default_rng(46)
        f = feats.shape[-1]
        gl = jnp.asarray(r.standard_normal((f, f)).astype(np.float32) * 0.3)
        gd = jnp.asarray(r.standard_normal((g.num_vertices, f))
                         .astype(np.float32))
        ega, egb = split

        def run():
            def loss(x_, gl_, gd_):
                m = ell.merge_softmax_parts([
                    ell.gated_stats_linear(ega, x_, gl_, gd_, 0.2),
                    ell.gated_stats_linear(egb, x_, gl_, gd_, 0.2)])
                return jnp.sum(m ** 2)
            val = ell.merge_softmax_parts([
                ell.gated_stats_linear(ega, feats, gl, gd, 0.2),
                ell.gated_stats_linear(egb, feats, gl, gd, 0.2)])
            return (val,) + jax.grad(loss, argnums=(0, 1, 2))(feats, gl, gd)

        dense = run()
        monkeypatch.setattr(ell, "_GATED_CHUNK_BYTES", 0)
        chunked = run()
        for a, b in zip(chunked, dense):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    # ---- fused multi-head split stats (PROC_OVERLAP × NUM_HEADS keeps
    # the all-heads-one-gather path; r4-late) ----

    def _heads_merge(self, ega, egb, x, a_l, s_dst):
        fh, h = a_l.shape
        parts = []
        for e_ in (ega, egb):
            n, d, c = ell.attention_stats_linear_heads(e_, x, a_l, s_dst,
                                                       0.2)
            parts.append((n.reshape(n.shape[0], h, fh), d, c))
        m = ell.merge_softmax_parts(parts)
        return m.reshape(m.shape[0], h * fh)

    def test_attention_heads_merge_matches_full(self, g, eg, split,
                                                scal_inputs):
        x, _, _ = scal_inputs
        r = np.random.default_rng(47)
        f, h = x.shape[-1], 3
        a_l = jnp.asarray(r.standard_normal((f // h, h))
                          .astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal((g.num_vertices, h))
                            .astype(np.float32))
        ega, egb = split
        full = ell.attention_aggregate_linear_heads(eg, x, a_l, s_dst, 0.2)
        merged = self._heads_merge(ega, egb, x, a_l, s_dst)
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)

        gf = jax.grad(lambda *a: jnp.sum(
            ell.attention_aggregate_linear_heads(eg, *a, 0.2) ** 2),
            argnums=(0, 1, 2))(x, a_l, s_dst)
        gm = jax.grad(lambda *a: jnp.sum(
            self._heads_merge(ega, egb, *a) ** 2),
            argnums=(0, 1, 2))(x, a_l, s_dst)
        for a, b, name in zip(gm, gf, ("dx", "da_l", "ds_dst")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5,
                                       err_msg=f"grad mismatch: {name}")

    def test_attention_heads_merge_wide_lanes(self, g, split):
        """F + 3H > 128 exercises the standalone stats pre-gather in the
        heads stats backward."""
        r = np.random.default_rng(48)
        v = g.num_vertices
        f, h = 120, 4
        x = jnp.asarray(r.standard_normal((v, f)).astype(np.float32))
        a_l = jnp.asarray(r.standard_normal((f // h, h))
                          .astype(np.float32))
        s_dst = jnp.asarray(r.standard_normal((v, h)).astype(np.float32))
        ega, egb = split
        eg_full = ell.build_ell_graph(g, ell_cap=16)
        full = ell.attention_aggregate_linear_heads(eg_full, x, a_l,
                                                    s_dst, 0.2)
        merged = self._heads_merge(ega, egb, x, a_l, s_dst)
        np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)
        gm = jax.grad(lambda xx: jnp.sum(
            self._heads_merge(ega, egb, xx, a_l, s_dst) ** 2))(x)
        gf = jax.grad(lambda xx: jnp.sum(
            ell.attention_aggregate_linear_heads(eg_full, xx, a_l, s_dst,
                                                 0.2) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gf),
                                   rtol=1e-3, atol=2e-4)
