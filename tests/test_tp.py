"""2-D vertex x feature parallelism (TP_DIM) tests.

The reference is strictly 1-D vertex-partitioned (MPI world over vertex
chunks, core/PartitionedGraph.hpp); the 'f' mesh axis is our TPU-native
second dimension: activations/bn/weight-output-columns feature-sharded,
the DepComm aggregate+exchange run on the narrow feature shard (they are
feature-wise independent), one all_gather over 'f' per dense
(nn/layers.dense). These tests pin 2-D == 1-D numerics at equal vertex
partitioning (BN stats are per-p-partition, so p must match).
"""

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import commnet, gat, gcn, ggcn, gin, sage
from neutronstarlite_tpu.training.dist_trainer import DistTrainer


def _datum():
    return synthetic_sbm_dataset(num_vertices=64, feat_dim=16, num_classes=4,
                                 avg_degree=6, seed=0)


def _cfg(**kw):
    base = dict(vertices=64, epochs=5, layer_string="16-8-4",
                learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0, seed=0)
    base.update(kw)
    return InputInfo(**base)


def _losses(trainer, epochs=5):
    hist = trainer.run(epochs=epochs)
    return (np.array([r["loss"] for r in hist]),
            np.array([r["test"] for r in hist]))


@pytest.mark.parametrize("model,kwargs", [
    (gcn, {}),
    (gcn, {"eager": True}),
    (gin, {}),
    (commnet, {"eager": True}),
    (gat, {}),
    (ggcn, {}),
    (sage, {}),
])
def test_tp_matches_1d_dist(model, kwargs):
    """p=2,f=2 mesh reproduces the p=2 run (same vertex partition, same BN
    stats) to float tolerance, for every TP-capable model family.

    For GAT the TP path switches from the in-block linear-score recompute
    to the scalar-score table path (s_src psum'd per vertex and shipped as
    an exchange lane) — numerically the same function, different rounding,
    hence the float tolerance."""
    datum = _datum()
    l1, a1 = _losses(DistTrainer(datum, _cfg(), model=model,
                                 num_partitions=2, **kwargs))
    l2, a2 = _losses(DistTrainer(datum, _cfg(), model=model,
                                 num_partitions=2, tp=2, **kwargs))
    np.testing.assert_allclose(l1, l2, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_pure_tp_matches_single_partition():
    """p=1,f=4: a pure feature-parallel mesh tracks the unsharded p=1 run."""
    datum = _datum()
    l1, _ = _losses(DistTrainer(datum, _cfg(), model=gcn, num_partitions=1))
    l2, _ = _losses(DistTrainer(datum, _cfg(), model=gcn, num_partitions=1,
                                tp=4))
    np.testing.assert_allclose(l1, l2, rtol=2e-4, atol=2e-5)


def test_tp_predict_matches():
    datum = _datum()
    t1 = DistTrainer(datum, _cfg(), model=gcn, num_partitions=2)
    t2 = DistTrainer(datum, _cfg(), model=gcn, num_partitions=2, tp=2)
    t1.run(epochs=3)
    t2.run(epochs=3)
    np.testing.assert_allclose(t1.predict(), t2.predict(),
                               rtol=1e-3, atol=1e-4)


def test_tp_with_dropout_and_ring_trains():
    """TP composes with dropout (independent per-shard masks) and the ring
    exchange; losses stay finite and decrease."""
    datum = _datum()
    cfg = _cfg(drop_rate=0.3)
    cfg.exchange = "ring"
    hist = DistTrainer(datum, cfg, model=gcn, num_partitions=2,
                       tp=2).run(epochs=6)
    losses = [r["loss"] for r in hist]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_tp_requires_divisible_layers():
    datum = _datum()
    with pytest.raises(ValueError, match="divisible"):
        DistTrainer(datum, _cfg(layer_string="16-7-4"), model=gcn,
                    num_partitions=2, tp=2)


def test_tp_rejects_unsupported_model():
    """Every shipped model supports tp_axis now; the guard still protects
    user-supplied model modules that don't."""
    class _NoTp:
        __name__ = "_NoTp"

        @staticmethod
        def forward(state, gt, x, key, training):
            return x, []

    datum = _datum()
    with pytest.raises(ValueError, match="tp_axis"):
        DistTrainer(datum, _cfg(), model=_NoTp, num_partitions=2, tp=2)


def test_tp_dim_cfg_key(tmp_path):
    """TP_DIM flows from a cfg file through main.run_config."""
    cfg = InputInfo()
    cfg._set_key("TP_DIM", "2")
    assert cfg.tp_dim == 2


@pytest.mark.parametrize("model,flags", [
    (gat, dict(overlap=True)),
    (ggcn, dict(overlap=True)),
    (gcn, dict(exchange="ring", overlap=True)),
])
def test_tp_composes_with_comm_flags(model, flags):
    """TP_DIM x PROC_OVERLAP/EXCHANGE: the 2-D mesh with split slabs (and
    the merged-stats attention path) must track the plain 1-D dist run."""
    datum = _datum()
    l1, _ = _losses(DistTrainer(datum, _cfg(), model=model,
                                num_partitions=2))
    cfg = _cfg()
    cfg.overlap = flags.get("overlap", False)
    cfg.exchange = flags.get("exchange", "uniform")
    tr = DistTrainer(datum, cfg, model=model, num_partitions=2, tp=2)
    if cfg.overlap:
        assert tr.dg.ell_mode == "split"
    l2, _ = _losses(tr)
    np.testing.assert_allclose(l2, l1, rtol=5e-4, atol=5e-5)


def test_tp_checkpoint_resume(tmp_path):
    """Checkpoint/resume under the 2-D mesh: sharded params/opt-state save
    as global arrays and restore onto the same shardings bit-exactly."""
    datum = _datum()
    cfg = _cfg()
    cfg.checkpoint_path = str(tmp_path / "ck")
    t1 = DistTrainer(datum, cfg, model=gcn, num_partitions=2, tp=2)
    t1.run(epochs=4)
    ref = t1.predict()

    cfg2 = _cfg()
    t2 = DistTrainer(datum, cfg2, model=gcn, num_partitions=2, tp=2)
    start = t2.resume(str(tmp_path / "ck"))
    assert start == 4
    np.testing.assert_allclose(t2.predict(), ref, rtol=1e-5, atol=1e-6)


def test_tp_multihead_gat_matches_1d():
    """NUM_HEADS x TP_DIM joint layout (head-major columns): TP_DIM divides
    NUM_HEADS, each feature shard owns whole heads and the fused chain runs
    in-shard — p=2,f=2 with H=4 must track the 1-D p=2 H=4 run."""
    datum = _datum()
    cfg1 = _cfg()
    cfg1.num_heads = 4
    cfg2 = _cfg()
    cfg2.num_heads = 4
    l1, a1 = _losses(DistTrainer(datum, cfg1, model=gat, num_partitions=2))
    l2, a2 = _losses(DistTrainer(datum, cfg2, model=gat, num_partitions=2,
                                 tp=2))
    np.testing.assert_allclose(l1, l2, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(a1, a2, atol=1e-6)


def test_tp_multihead_gat_f_equals_h():
    """f == H: every shard owns exactly one head (the H/f == 1 local-shape
    corner the explicit ``heads`` kwarg exists for)."""
    datum = _datum()
    cfg1 = _cfg()
    cfg1.num_heads = 2
    cfg2 = _cfg()
    cfg2.num_heads = 2
    l1, _ = _losses(DistTrainer(datum, cfg1, model=gat, num_partitions=2))
    l2, _ = _losses(DistTrainer(datum, cfg2, model=gat, num_partitions=2,
                                tp=2))
    np.testing.assert_allclose(l1, l2, rtol=5e-4, atol=5e-5)


def test_tp_multihead_requires_divisibility():
    datum = _datum()
    cfg = _cfg()
    cfg.num_heads = 3          # 3 % 2 != 0
    with pytest.raises(ValueError, match="divide NUM_HEADS"):
        DistTrainer(datum, cfg, model=gat, num_partitions=2, tp=2)
