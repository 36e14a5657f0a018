"""SAGE_POOL_DIM: the pooled-representation width lever (VERDICT r4 item 3).

The pooled table is what SAGE's extremal slab gathers traverse; at
F_in=602 the square pool pays 5 tiles per slot by the r4-late per-tile
law, so exposing the width (w_pool: [F_in, P]) drops layer 0's pooled
gathers to one tile at P <= 128. Default (0 / unset) keeps the original
square semantics bit-for-bit. Ours — the reference has no SAGE family
(the closest ops are its extremal aggregates,
core/ntsSingleCPUGraphOp.hpp:206-340)."""

import jax
import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import gcn, sage
from neutronstarlite_tpu.training.dist_trainer import DistTrainer
from neutronstarlite_tpu.training.minibatch import MinibatchTrainer
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=200, feat_dim=18,
                                 num_classes=4, avg_degree=6, homophily=0.9,
                                 seed=3, feature_noise=0.3)


def _cfg(sbm, **kw):
    cfg = InputInfo(vertices=sbm.num_vertices, epochs=8,
                    layer_string=f"18-8-{sbm.num_classes}",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                    seed=0)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_pool_dim_shapes():
    st = sage.init(jax.random.PRNGKey(0), [18, 8, 4], pool_dim=6)
    assert st.params[0]["w_pool"].shape == (18, 6)
    assert st.params[0]["w"].shape == (18 + 6, 8)
    assert st.params[1]["w_pool"].shape == (8, 6)
    assert st.params[1]["w"].shape == (8 + 6, 4)
    # default = square pool (the original semantics)
    st0 = sage.init(jax.random.PRNGKey(0), [18, 8, 4])
    assert st0.params[0]["w_pool"].shape == (18, 18)
    assert st0.params[0]["w"].shape == (36, 8)


def test_pool_dim_full_graph_converges(sbm):
    tr = FullGraphTrainer(sbm, _cfg(sbm, sage_pool_dim=6), model=sage)
    hist = tr.run()
    assert hist[-1]["loss"] < hist[0]["loss"], hist
    assert hist[-1]["test"] > 0.7, hist[-1]


def test_pool_dim_dist_matches_single(sbm):
    """P=2 dist trajectory == the single-chip run with the same pool width
    (the extremal cross-slab-set merge is width-agnostic)."""
    cfg = _cfg(sbm, sage_pool_dim=6)
    h1 = FullGraphTrainer(sbm, cfg, model=sage).run(epochs=5)
    h2 = DistTrainer(sbm, cfg, model=sage, num_partitions=2).run(epochs=5)
    # cross-ENGINE comparison: partitioned reduction order differs, so
    # rounding drifts a little more than the dist-vs-dist TP tests
    np.testing.assert_allclose([r["loss"] for r in h1],
                               [r["loss"] for r in h2],
                               rtol=3e-3, atol=5e-5)


def test_pool_dim_tp_matches_1d(sbm):
    """p=2,f=2 == p=2 with a sharded pool width (6 % 2 == 0: the pooled
    activations and w_pool columns shard over 'f')."""
    cfg = _cfg(sbm, sage_pool_dim=6)
    h1 = DistTrainer(sbm, cfg, model=sage, num_partitions=2).run(epochs=5)
    h2 = DistTrainer(sbm, cfg, model=sage, num_partitions=2,
                     tp=2).run(epochs=5)
    np.testing.assert_allclose([r["loss"] for r in h1],
                               [r["loss"] for r in h2],
                               rtol=5e-4, atol=5e-5)


def test_pool_dim_sampled(sbm):
    cfg = _cfg(sbm, sage_pool_dim=6, fanout_string="4-4", batch_size=64)
    tr = MinibatchTrainer(sbm, cfg, model="sage")
    hist = tr.run()
    assert hist[-1]["loss"] < hist[0]["loss"], hist
    assert np.isfinite([r["loss"] for r in hist]).all()


def test_pool_dim_rejected_on_non_sage(sbm):
    with pytest.raises(ValueError, match="SAGE_POOL_DIM"):
        FullGraphTrainer(sbm, _cfg(sbm, sage_pool_dim=6), model=gcn)


def test_pool_dim_cfg_key(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text("ALGORITHM:SAGECPU\nSAGE_POOL_DIM:128\n")
    assert InputInfo.from_cfg_file(str(p)).sage_pool_dim == 128
