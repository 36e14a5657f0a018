"""Multi-head GAT (cfg NUM_HEADS — our extension; the reference GAT is
single-head, toolkits/GAT_CPU.hpp:194-226): hidden layers split F_out into
H heads over ONE shared dep-exchange table, run the fused attention chain
per head, and concatenate; the last layer stays single-head.

Oracle: the fused multi-head forward must equal the explicit per-head
edge chain (scatter_src/dst → leaky_relu score → per-dst edge_softmax →
weighted aggregate_dst_sum) built from the separately-validated segment
ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import gat, gcn
from neutronstarlite_tpu.ops.graph_ops import GraphTensors
from neutronstarlite_tpu.training.dist_trainer import DistTrainer
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=257, feat_dim=16, num_classes=3,
                                 avg_degree=7, homophily=0.9, seed=4,
                                 feature_noise=0.3)


def _cfg(sbm, **kw):
    cfg = InputInfo(vertices=sbm.num_vertices, epochs=8,
                    layer_string=f"16-8-{sbm.num_classes}",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                    seed=7)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def manual_forward(state, gt, x):
    """Explicit per-head edge chain via the segment ops."""
    h = x
    for p in state.params:
        x_t = h @ p["w"]
        H = p["attn"].shape[1]
        fh = x_t.shape[1] // H
        outs = []
        for k in range(H):
            xth = x_t[:, k * fh:(k + 1) * fh]
            es = gt.scatter_src(xth)                       # [E, fh]
            s = (es @ p["attn"][:fh, k]
                 + gt.scatter_dst(xth) @ p["attn"][fh:, k])
            m = jax.nn.leaky_relu(s, 0.2)
            a = gt.edge_softmax(m[:, None])                # [E, 1]
            outs.append(gt.aggregate_dst_sum(es * a))
        h = jax.nn.relu(jnp.concatenate(outs, axis=-1))
    return h


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_multihead_matches_manual_chain(sbm, backend):
    gt = GraphTensors.from_graph(sbm.graph, backend=backend)
    oracle_gt = GraphTensors.from_graph(sbm.graph, backend="xla")
    state = gat.init(jax.random.PRNGKey(0), [16, 8, 3], heads=2)
    assert state.params[0]["attn"].shape == (8, 2)   # 2*(8/2) x H
    assert state.params[1]["attn"].shape == (6, 1)   # last layer single-head
    x = jnp.asarray(sbm.features)
    fused, _ = gat.forward(state, gt, x, None, training=False)
    manual = manual_forward(state, oracle_gt, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(manual),
                               rtol=2e-4, atol=2e-5)


def test_heads_must_divide(sbm):
    with pytest.raises(ValueError, match="NUM_HEADS"):
        gat.init(jax.random.PRNGKey(0), [16, 9, 3], heads=2)


def test_multihead_converges(sbm):
    tr = FullGraphTrainer(sbm, _cfg(sbm, epochs=30, num_heads=4,
                                    layer_string="16-16-3"), model=gat,
                          backend="xla")
    h = tr.run()
    assert h[-1]["loss"] < h[0]["loss"]
    assert h[-1]["train"] > 0.8, h[-1]


def test_multihead_dist_matches_single(sbm):
    """GAT has no batchnorm → dist must equal single-chip exactly; the
    shared dep table crosses the mesh once per layer for ALL heads."""
    h1 = FullGraphTrainer(sbm, _cfg(sbm, num_heads=2), model=gat,
                          backend="xla").run()
    h2 = DistTrainer(sbm, _cfg(sbm, num_heads=2), model=gat,
                     num_partitions=4).run()
    # float drift compounds over epochs (psum order differs); logic bugs
    # produce O(0.1)+ divergence, so 5e-3 still discriminates
    for a, b in zip(h1, h2):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=5e-3,
                                   atol=1e-5)
        np.testing.assert_allclose(a["test"], b["test"], atol=0.02)


def test_multihead_dist_overlap_matches(sbm):
    """PROC_OVERLAP split slabs: per-set softmax stats merge per head."""
    base = DistTrainer(sbm, _cfg(sbm, num_heads=2), model=gat,
                       num_partitions=4).run()
    ov = DistTrainer(sbm, _cfg(sbm, num_heads=2, overlap=True), model=gat,
                     num_partitions=4).run()
    for a, b in zip(base, ov):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-4,
                                   atol=1e-5)


def test_num_heads_rejected_elsewhere(sbm):
    """Non-attention models still reject NUM_HEADS (the sampled GAT path
    accepts it as of r4 — tests/test_sampled_gat.py covers it)."""
    with pytest.raises(ValueError, match="NUM_HEADS"):
        FullGraphTrainer(sbm, _cfg(sbm, num_heads=2), model=gcn,
                         backend="xla")
    from neutronstarlite_tpu.training.minibatch import MinibatchTrainer
    cfg = _cfg(sbm, num_heads=2)
    cfg.fanout_string = "4-4"
    with pytest.raises(ValueError, match="GAT only"):
        MinibatchTrainer(sbm, cfg, model="gin")


def test_num_heads_tp_requires_divisibility(sbm):
    """NUM_HEADS x TP_DIM composes when TP_DIM divides NUM_HEADS
    (tests/test_tp.py pins the numerics); a non-dividing TP_DIM is
    rejected up front with an actionable message."""
    cfg = _cfg(sbm, num_heads=2, layer_string="16-8-4")
    with pytest.raises(ValueError, match="divide NUM_HEADS"):
        DistTrainer(sbm, cfg, model=gat, num_partitions=2, tp=4)


def test_cfg_key(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text("NUM_HEADS:4\n")
    assert InputInfo.from_cfg_file(str(p)).num_heads == 4
