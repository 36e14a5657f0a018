"""Model-math oracle tests: each model's forward vs a straight numpy
re-computation of the reference formula (per-layer activation parity,
SURVEY.md §4 implication (c))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutronstarlite_tpu.models import commnet, gat, gcn, gin
from neutronstarlite_tpu.nn import layers
from neutronstarlite_tpu.ops.graph_ops import GraphTensors


@pytest.fixture(scope="module")
def gt(small_graph):
    return GraphTensors.from_graph(small_graph, backend="xla")


@pytest.fixture(scope="module")
def feats(small_graph):
    r = np.random.default_rng(31)
    return r.standard_normal((small_graph.num_vertices, 8)).astype(np.float32)


def np_adj(g):
    a = np.zeros((g.num_vertices, g.num_vertices), np.float64)
    np.add.at(a, (g.fwd_dst, g.fwd_src), g.fwd_weight.astype(np.float64))
    return a


def test_gcn_layer_oracle(small_graph, gt, feats):
    key = jax.random.PRNGKey(0)
    st = gcn.init(key, [8, 5, 3])
    logits, _ = gcn.forward(st, gt, jnp.asarray(feats), None, training=False)
    # numpy re-computation
    a = np_adj(small_graph)
    x = feats.astype(np.float64)
    w0 = np.asarray(st.params[0]["w"], np.float64)
    w1 = np.asarray(st.params[1]["w"], np.float64)
    y = a @ x
    # eval-mode batchnorm with fresh stats: mean 0 var 1 → identity-ish
    bn = st.bn[0]
    y = (y - np.asarray(bn["mean"])) / np.sqrt(np.asarray(bn["var"]) + 1e-5) \
        * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
    h = np.maximum(y @ w0, 0)
    out = (a @ h) @ w1
    np.testing.assert_allclose(np.asarray(logits), out, rtol=1e-3, atol=1e-3)


def test_gat_layer_oracle(small_graph, gt, feats):
    """One GAT layer vs numpy: leaky_relu attention, per-dst softmax,
    weighted sum, relu (ref: GAT_CPU.hpp:185-226)."""
    key = jax.random.PRNGKey(1)
    st = gat.init(key, [8, 4])
    out, _ = gat.forward(st, gt, jnp.asarray(feats), None, training=False)

    g = small_graph
    w = np.asarray(st.params[0]["w"], np.float64)
    attn = np.asarray(st.params[0]["attn"], np.float64)
    xt = feats.astype(np.float64) @ w
    e = np.concatenate([xt[g.fwd_src], xt[g.fwd_dst]], axis=1) @ attn  # [E,1]
    m = np.where(e > 0, e, 0.2 * e)[:, 0]
    a = np.zeros_like(m)
    for v in np.unique(g.fwd_dst):
        sel = g.fwd_dst == v
        z = np.exp(m[sel] - m[sel].max())
        a[sel] = z / z.sum()
    nbr = np.zeros((g.num_vertices, 4))
    np.add.at(nbr, g.fwd_dst, a[:, None] * xt[g.fwd_src])
    oracle = np.maximum(nbr, 0)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-3, atol=1e-4)


def test_gin_layer_oracle(small_graph, gt, feats):
    key = jax.random.PRNGKey(2)
    st = gin.init(key, [8, 3])
    out, _ = gin.forward(st, gt, jnp.asarray(feats), None, training=False)
    a = np_adj(small_graph)
    h = a @ feats.astype(np.float64) + feats
    w1 = np.asarray(st.params[0]["w1"], np.float64)
    w2 = np.asarray(st.params[0]["w2"], np.float64)
    y = np.maximum(h @ w1, 0) @ w2
    bn = st.bn[0]
    y = (y - np.asarray(bn["mean"])) / np.sqrt(np.asarray(bn["var"]) + 1e-5) \
        * np.asarray(bn["scale"]) + np.asarray(bn["bias"])
    np.testing.assert_allclose(np.asarray(out), y, rtol=1e-3, atol=1e-3)


def test_commnet_layer_oracle(small_graph, gt, feats):
    key = jax.random.PRNGKey(3)
    st = commnet.init(key, [8, 3])
    out, _ = commnet.forward(st, gt, jnp.asarray(feats), None, training=False)
    a = np_adj(small_graph)
    wa = np.asarray(st.params[0]["w_agg"], np.float64)
    ws = np.asarray(st.params[0]["w_self"], np.float64)
    oracle = np.maximum((a @ feats.astype(np.float64)) @ wa
                        + feats.astype(np.float64) @ ws, 0)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-3, atol=1e-3)


def test_batchnorm_matches_torch_semantics():
    """Train-mode batch stats + running-stat update, eval-mode running stats."""
    r = np.random.default_rng(41)
    x = r.standard_normal((32, 6)).astype(np.float32) * 3 + 1
    bn = layers.batch_norm_init(6)
    y, bn2 = layers.batch_norm_apply(bn, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(y).mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std(0), 1, atol=1e-2)
    np.testing.assert_allclose(np.asarray(bn2["mean"]), 0.1 * x.mean(0),
                               rtol=1e-4, atol=1e-5)
    unbiased = x.var(0) * 32 / 31
    np.testing.assert_allclose(np.asarray(bn2["var"]),
                               0.9 * 1.0 + 0.1 * unbiased, rtol=1e-4)
    # eval mode uses stored stats
    y2, _ = layers.batch_norm_apply(bn2, jnp.asarray(x), training=False)
    oracle = (x - np.asarray(bn2["mean"])) / np.sqrt(
        np.asarray(bn2["var"]) + 1e-5)
    np.testing.assert_allclose(np.asarray(y2), oracle, rtol=1e-4, atol=1e-5)


def test_nts_adam_matches_reference_math():
    """Replay the reference's learnC2C_with_decay_Adam + next() in numpy."""
    from neutronstarlite_tpu.nn.optim import nts_adam

    r = np.random.default_rng(43)
    w = r.standard_normal((4, 3)).astype(np.float32)
    params = [{"w": jnp.asarray(w)}]
    init, update = nts_adam(learn_rate=0.01, weight_decay=0.001,
                            decay_rate=0.5, decay_epoch=2)
    state = init(params)

    # numpy replica of the reference state machine
    W = w.astype(np.float64).copy()
    M = np.zeros_like(W)
    V = np.zeros_like(W)
    alpha, alpha_t = 0.01, 0.01
    beta1, beta2 = 0.9, 0.999
    b1t, b2t = 0.9, 0.999
    eps = 1e-9
    for epoch in range(5):
        g = r.standard_normal(W.shape).astype(np.float32)
        params, state = update([{"w": jnp.asarray(g)}], state, params)
        # reference math
        wg = g + 0.001 * W
        M = beta1 * M + (1 - beta1) * wg
        V = beta2 * V + (1 - beta2) * wg * wg
        W = W - alpha * M / (np.sqrt(V) + eps)
        # next()
        if epoch != 0 and epoch % 2 == 0:
            alpha_t *= 0.5
        alpha = alpha_t * np.sqrt(1 - beta2) / (1 - beta1)
        beta1 *= b1t
        beta2 *= b2t
        np.testing.assert_allclose(np.asarray(params[0]["w"]), W,
                                   rtol=1e-4, atol=1e-5)


def test_nts_sgd_matches_reference_math():
    from neutronstarlite_tpu.nn.optim import nts_sgd
    r = np.random.default_rng(51)
    w = r.standard_normal((3, 2)).astype(np.float32)
    g = r.standard_normal((3, 2)).astype(np.float32)
    init, update = nts_sgd(learn_rate=0.1, weight_decay=0.01)
    params, _ = update([{"w": jnp.asarray(g)}], init(None),
                       [{"w": jnp.asarray(w)}])
    oracle = (w - 0.1 * g) * (1 - 0.01)
    np.testing.assert_allclose(np.asarray(params[0]["w"]), oracle, rtol=1e-6)
