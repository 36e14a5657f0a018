"""HOIST_L0: layer 0's neighbor aggregate runs over the CONSTANT feature
table, so A·X is epoch-invariant ((A·X)W == A·(XW) by linearity) and is
precomputed once per run — removing the widest gather AND the layer-0
boundary exchange from every epoch. Exactness oracle: with the same seed,
the hoisted run must reproduce the unhoisted run's entire history.

No reference counterpart (the reference recomputes every layer every epoch,
toolkits/GCN_CPU.hpp:232-273); this is a beyond-reference optimization that
is exact for param-free layer-0 aggregates (GCN/GIN/COMMNET families)."""

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import commnet, gat, gcn, gin
from neutronstarlite_tpu.training.dist_trainer import DistTrainer
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=257, feat_dim=16, num_classes=3,
                                 avg_degree=7, homophily=0.9, seed=4,
                                 feature_noise=0.3)


def make_config(sbm, epochs=8, **kw):
    cfg = InputInfo(vertices=sbm.num_vertices, epochs=epochs,
                    layer_string=f"16-8-{sbm.num_classes}",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                    seed=7)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def hist_close(a, b, rtol=1e-4, atol=1e-5):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for k in ("loss", "train", "val", "test"):
            np.testing.assert_allclose(ra[k], rb[k], rtol=rtol, atol=atol,
                                       err_msg=f"epoch {ra['epoch']} {k}")


def test_cfg_key(tmp_path):
    p = tmp_path / "t.cfg"
    p.write_text("HOIST_L0:1\n")
    assert InputInfo.from_cfg_file(str(p)).hoist_l0 is True


@pytest.mark.parametrize("model", [gcn, gin, commnet],
                         ids=["gcn", "gin", "commnet"])
def test_single_hoist_exact(sbm, model):
    """Same seed, hoist on vs off → identical training trajectory."""
    base = FullGraphTrainer(sbm, make_config(sbm), model=model,
                            backend="xla")
    h0 = base.run()
    hoisted = FullGraphTrainer(sbm, make_config(sbm, hoist_l0=True),
                               model=model, backend="xla")
    assert hoisted.l0_ax is not None
    h1 = hoisted.run()
    hist_close(h0, h1)
    np.testing.assert_allclose(np.asarray(hoisted.predict()),
                               np.asarray(base.predict()),
                               rtol=1e-4, atol=1e-5)


def test_single_hoist_eager_layers(sbm):
    """eager=True + hoist: layer 0 pins to aggregate-first, layers >= 1 keep
    the eager order — for GIN the two orders are mathematically equal, so
    hoist+eager must match hoist+non-eager."""
    a = FullGraphTrainer(sbm, make_config(sbm, hoist_l0=True), model=gin,
                         backend="xla", eager=True).run()
    b = FullGraphTrainer(sbm, make_config(sbm, hoist_l0=True), model=gin,
                         backend="xla", eager=False).run()
    hist_close(a, b, rtol=5e-4, atol=5e-5)


def test_gcn_eager_hoist_converges(sbm):
    """GCN eager + hoist is a (valid) mixed-order model — assert it trains."""
    t = FullGraphTrainer(sbm, make_config(sbm, epochs=30, hoist_l0=True),
                         model=gcn, backend="xla", eager=True)
    h = t.run()
    assert np.isfinite(h[-1]["loss"])
    assert h[-1]["loss"] < h[0]["loss"]
    assert h[-1]["train"] > 0.8


def test_hoist_with_eval_mode_and_fuse(sbm):
    """Composes with EVAL_MODE:1 and FUSE_EPOCHS (scan body takes l0)."""
    a = FullGraphTrainer(sbm, make_config(sbm, hoist_l0=True, eval_mode=True,
                                          fuse_epochs=3),
                         model=gcn, backend="xla").run()
    b = FullGraphTrainer(sbm, make_config(sbm, eval_mode=True, fuse_epochs=3),
                         model=gcn, backend="xla").run()
    hist_close(a, b)


def test_three_layer_hoist_exact(sbm):
    """Deeper stacks: only layer 0 hoists; layers 1..n aggregate normally."""
    cfg0 = make_config(sbm, layer_string="16-12-8-3")
    cfg1 = make_config(sbm, layer_string="16-12-8-3", hoist_l0=True)
    h0 = FullGraphTrainer(sbm, cfg0, model=gcn, backend="xla").run()
    h1 = FullGraphTrainer(sbm, cfg1, model=gcn, backend="xla").run()
    hist_close(h0, h1)


def test_hoist_isolated_vertices():
    """Zero-degree rows: the precomputed aggregate has zero rows there,
    exactly like the per-epoch form."""
    import numpy as np
    from neutronstarlite_tpu.graph.dataset import GNNDatum
    from neutronstarlite_tpu.graph.structure import build_graph
    rng = np.random.default_rng(3)
    v = 120
    src = rng.integers(0, 80, 400).astype(np.int32)   # vertices 80+ isolated
    dst = rng.integers(0, 80, 400).astype(np.int32)
    d = GNNDatum(graph=build_graph(src, dst, v),
                 features=rng.random((v, 8), np.float32),
                 labels=rng.integers(0, 3, v).astype(np.int32),
                 masks=(np.arange(v) % 3).astype(np.int32), num_classes=3)
    cfg = make_config(d, layer_string="8-8-3", epochs=5)
    h0 = FullGraphTrainer(d, cfg, model=gcn, backend="xla").run()
    cfg1 = make_config(d, layer_string="8-8-3", epochs=5, hoist_l0=True)
    h1 = FullGraphTrainer(d, cfg1, model=gcn, backend="xla").run()
    hist_close(h0, h1)


class TestDistHoist:
    def test_dist_hoist_matches_unhoisted(self, sbm):
        base = DistTrainer(sbm, make_config(sbm), model=gcn,
                           num_partitions=4).run()
        hoisted = DistTrainer(sbm, make_config(sbm, hoist_l0=True), model=gcn,
                              num_partitions=4).run()
        hist_close(base, hoisted)

    def test_dist_hoist_overlap_ring_depcache(self, sbm):
        """Composes with the comm-engine flags (split slabs, ring exchange,
        DepCache replication + stale refresh). Stale-cache epochs change
        the math BY DESIGN (CACHE_REFRESH>1 reads stale hot tables), so the
        oracle is hoist-on vs hoist-off under the SAME flags."""
        flags = dict(overlap=True, exchange="ring", repthreshold=8,
                     cache_refresh=3)
        base = DistTrainer(sbm, make_config(sbm, **flags), model=gcn,
                           num_partitions=4).run()
        t = DistTrainer(sbm, make_config(sbm, hoist_l0=True, **flags),
                        model=gcn, num_partitions=4)
        hist_close(base, t.run())

    def test_dist_hoist_tp(self, sbm):
        """2-D (vertex x feature) mesh: l0 is feature-sharded like x.
        Same p (bn stats are per-partition), hoist on vs off; TP needs
        divisible hidden/output sizes."""
        cfg = make_config(sbm, layer_string="16-8-4")
        base = DistTrainer(sbm, cfg, model=gcn,
                           num_partitions=2, tp=2).run()
        t = DistTrainer(sbm, make_config(sbm, layer_string="16-8-4",
                                         hoist_l0=True),
                        model=gcn, num_partitions=2, tp=2)
        hist_close(base, t.run())

    def test_dist_predict_hoist(self, sbm):
        a = DistTrainer(sbm, make_config(sbm, hoist_l0=True), model=gcn,
                        num_partitions=4)
        a.run()
        b = DistTrainer(sbm, make_config(sbm), model=gcn, num_partitions=4)
        b.run()
        np.testing.assert_allclose(a.predict(), b.predict(),
                                   rtol=1e-4, atol=1e-5)


class TestHoistRejection:
    def test_attention_model_rejected(self, sbm):
        with pytest.raises(ValueError, match="HOIST_L0"):
            FullGraphTrainer(sbm, make_config(sbm, hoist_l0=True), model=gat,
                             backend="xla")

    def test_minibatch_rejected(self, sbm):
        from neutronstarlite_tpu.training.minibatch import MinibatchTrainer
        cfg = make_config(sbm, hoist_l0=True)
        cfg.fanout_string = "5"
        cfg.batch_size = 32
        with pytest.raises(ValueError, match="HOIST_L0"):
            MinibatchTrainer(sbm, cfg)
