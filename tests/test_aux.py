"""Auxiliary subsystems: checkpoint/resume, validation toolkits, timers."""

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import gcn
from neutronstarlite_tpu.training.trainer import FullGraphTrainer


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=200, feat_dim=16, num_classes=3,
                                 avg_degree=6, seed=9)


def make_config(sbm, tmp=None, every=0):
    cfg = InputInfo(vertices=sbm.num_vertices, epochs=6,
                    layer_string="16-8-3", learn_rate=0.01,
                    weight_decay=1e-4, drop_rate=0.0, seed=11)
    if tmp:
        cfg.checkpoint_path = str(tmp / "ck")
        cfg.checkpoint_every = every
    return cfg


class TestCheckpoint:
    def test_save_restore_bitexact(self, sbm, tmp_path):
        cfg = make_config(sbm, tmp_path, every=0)
        tr = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
        h1 = tr.run()  # saves at end
        # fresh trainer, resume, continue: must equal continuous training
        cfg2 = make_config(sbm, tmp_path, every=0)
        cfg2.checkpoint_path = ""
        tr2 = FullGraphTrainer(sbm, cfg2, model=gcn, backend="xla")
        ep = tr2.resume(str(tmp_path / "ck"))
        assert ep == 6
        for a, b in zip(tr.state.params, tr2.state.params):
            np.testing.assert_array_equal(np.asarray(a["w"]),
                                          np.asarray(b["w"]))
        # continued training from restore == continued training in-place
        h_cont_a = tr.run(epochs=3)
        h_cont_b = tr2.run(epochs=3)
        for a, b in zip(h_cont_a, h_cont_b):
            assert abs(a["loss"] - b["loss"]) < 1e-6

    def test_periodic_save(self, sbm, tmp_path):
        cfg = make_config(sbm, tmp_path, every=2)
        tr = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
        tr.run(epochs=4)
        import os
        base = str(tmp_path / "ck")
        assert os.path.exists(base) or os.path.exists(base + ".npz")


class TestValidationToolkits:
    def test_validate_single(self, sbm):
        from neutronstarlite_tpu.toolkits import validate_single
        out = validate_single(sbm, backend="xla")
        assert out["in_degree_ok"] and out["backward_ok"]

    def test_validate_single_ell(self, sbm):
        from neutronstarlite_tpu.toolkits import validate_single
        validate_single(sbm, backend="pallas")

    def test_validate_dist(self, sbm):
        from neutronstarlite_tpu.toolkits import validate_dist
        validate_dist(sbm, 4)
        validate_dist(sbm, 4, rep_threshold=8)


class TestPhaseTimer:
    def test_timer_accumulates(self):
        from neutronstarlite_tpu.utils.timing import PhaseTimer
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        r = t.report()
        assert r["a"]["count"] == 2


class TestRemat:
    def test_remat_matches_plain(self, sbm):
        import jax
        import jax.numpy as jnp
        from neutronstarlite_tpu.ops.graph_ops import GraphTensors
        gt = GraphTensors.from_graph(sbm.graph, backend="xla")
        st = gcn.init(jax.random.PRNGKey(1), [16, 8, 3])
        x = jnp.asarray(sbm.features)

        def loss(params, remat):
            s2 = gcn.GCNState(params=params, bn=st.bn)
            logits, _ = gcn.forward(s2, gt, x, None, training=False,
                                    remat=remat)
            return jnp.sum(logits ** 2)
        g_plain = jax.grad(lambda p: loss(p, False))(st.params)
        g_remat = jax.grad(lambda p: loss(p, True))(st.params)
        for a, b in zip(g_plain, g_remat):
            np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                       rtol=1e-5, atol=1e-6)


class TestOgbReaders:
    def test_ogb_roundtrip(self, tmp_path):
        from neutronstarlite_tpu.graph import io
        v, f = 10, 4
        feats = np.random.default_rng(0).random((v, f)).astype(np.float32)
        np.savetxt(tmp_path / "feat.csv", feats, delimiter=",")
        labels = np.arange(v) % 3
        np.savetxt(tmp_path / "lab.csv", labels, delimiter=",", fmt="%d")
        (tmp_path / "split").mkdir()
        np.savetxt(tmp_path / "split" / "train.csv", [0, 1, 2], fmt="%d")
        np.savetxt(tmp_path / "split" / "valid.csv", [3, 4], fmt="%d")
        np.savetxt(tmp_path / "split" / "test.csv", [5, 6, 7, 8, 9], fmt="%d")
        f2 = io.read_features_csv(str(tmp_path / "feat.csv"), v, f)
        np.testing.assert_allclose(f2, feats, rtol=1e-5)
        l2 = io.read_labels_csv(str(tmp_path / "lab.csv"), v)
        np.testing.assert_array_equal(l2, labels)
        m = io.read_masks_ogb(str(tmp_path / "split"), v)
        assert (m[:3] == 0).all() and (m[3:5] == 1).all() and (m[5:] == 2).all()


class TestDistCheckpoint:
    def test_dist_save_resume(self, sbm, tmp_path):
        from neutronstarlite_tpu.training.dist_trainer import DistTrainer
        cfg = make_config(sbm, tmp_path, every=0)
        tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=4)
        h1 = tr.run()
        cfg2 = make_config(sbm)
        tr2 = DistTrainer(sbm, cfg2, model=gcn, num_partitions=4)
        ep = tr2.resume(str(tmp_path / "ck"))
        assert ep == 6
        h_a = tr.run(epochs=3)
        h_b = tr2.run(epochs=3)
        for a, b in zip(h_a, h_b):
            assert abs(a["loss"] - b["loss"]) < 1e-6


class TestFusedEpochs:
    def test_fused_matches_unfused(self, sbm):
        cfg = make_config(sbm)
        a = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla").run(epochs=6)
        cfg2 = make_config(sbm)
        cfg2.fuse_epochs = 3
        b = FullGraphTrainer(sbm, cfg2, model=gcn, backend="xla").run(epochs=6)
        assert len(b) == 6
        for ra, rb in zip(a, b):
            assert abs(ra["loss"] - rb["loss"]) < 1e-6, (ra, rb)
            assert abs(ra["test"] - rb["test"]) < 1e-6

    def test_fused_partial_tail_matches(self, sbm):
        """epochs not a multiple of fuse: remainder runs unfused — final
        state must equal fully-unfused training (no over-training)."""
        cfg = make_config(sbm)
        a = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
        ha = a.run(epochs=6)
        cfg2 = make_config(sbm)
        cfg2.fuse_epochs = 4
        b = FullGraphTrainer(sbm, cfg2, model=gcn, backend="xla")
        hb = b.run(epochs=6)
        assert len(hb) == 6
        assert abs(ha[-1]["loss"] - hb[-1]["loss"]) < 1e-6
        for pa, pb in zip(a.state.params, b.state.params):
            np.testing.assert_allclose(np.asarray(pa["w"]),
                                       np.asarray(pb["w"]), atol=1e-7)


class TestProfilerTrace:
    def test_run_profile_dir_writes_trace(self, sbm, tmp_path):
        """trainer.run(profile_dir=...) wraps the run in jax.profiler.trace
        (the on-device DEBUGINFO analogue, toolkits/GCN.hpp:308-353) and
        produces a trace dump."""
        tr = FullGraphTrainer(sbm, make_config(sbm), model=gcn,
                              backend="xla")
        hist = tr.run(epochs=2, profile_dir=str(tmp_path / "trace"))
        assert len(hist) == 2 and np.isfinite(hist[-1]["loss"])
        dumped = list((tmp_path / "trace").rglob("*"))
        assert dumped, "profiler trace directory is empty"


class TestDebuginfo:
    """DEBUGINFO parity surface (the reference's end-of-run phase table,
    toolkits/GCN.hpp:308-353): structured breakdowns on every trainer +
    the DEBUGINFO:1 cfg key through the CLI."""

    def test_fullgraph_debuginfo(self, sbm):
        tr = FullGraphTrainer(sbm, make_config(sbm), model=gcn,
                              backend="pallas")
        tr.run(epochs=2)
        info = tr.debuginfo()
        assert info["engine"] == "single-chip"
        assert info["num_edges"] == sbm.graph.num_edges
        assert info["exec_time_s"] > 0
        assert info["ell"]["fwd_slots"] >= sbm.graph.num_edges

    def test_dist_debuginfo_exchange_rows(self, sbm):
        from neutronstarlite_tpu.training.dist_trainer import DistTrainer
        cfg = make_config(sbm)
        tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=4)
        tr.run(epochs=1)
        info = tr.debuginfo()
        assert info["engine"] == "dist"
        assert info["partitions"] == 4
        assert info["exchange"] == "uniform"
        # only rows that cross a link count (the q->q self-chunk doesn't)
        assert info["exchange_rows_per_device_per_layer"] == 3 * info["m_pad"]
        # ring reports the exact-max schedule's (smaller or equal) volume
        cfg2 = make_config(sbm)
        cfg2.exchange = "ring"
        tr2 = DistTrainer(sbm, cfg2, model=gcn, num_partitions=4)
        info2 = tr2.debuginfo()
        assert info2["exchange"] == "ring"
        assert (info2["exchange_rows_per_device_per_layer"]
                <= info["exchange_rows_per_device_per_layer"])

    def test_minibatch_debuginfo_phases(self, sbm):
        from neutronstarlite_tpu.training.minibatch import MinibatchTrainer
        cfg = make_config(sbm)
        cfg.fanout_string = "4-4"
        cfg.layer_string = "16-8-3"
        cfg.batch_size = 32
        tr = MinibatchTrainer(sbm, cfg)
        tr.run(epochs=1)
        info = tr.debuginfo()
        assert info["engine"] == "minibatch"
        assert info["fanout"] == [4, 4]
        assert any(k.startswith("train") for k in info["phases"])

    def test_debuginfo_cfg_key_parses(self):
        c = InputInfo()
        c._set_key("DEBUGINFO", "1")
        assert c.debuginfo is True

    def test_debuginfo_json_serializable(self, sbm):
        """main.py prints '#DEBUGINFO ' + json.dumps(trainer.debuginfo());
        every trainer's dict must survive json.dumps (an np.int64 or jax
        array leaking in would crash every DEBUGINFO:1 CLI run)."""
        import json
        from neutronstarlite_tpu.training.dist_trainer import DistTrainer
        from neutronstarlite_tpu.training.minibatch import MinibatchTrainer
        t1 = FullGraphTrainer(sbm, make_config(sbm), model=gcn,
                              backend="pallas")
        t1.run(epochs=1)
        t2 = DistTrainer(sbm, make_config(sbm), model=gcn, num_partitions=2)
        t2.run(epochs=1)
        cfg = make_config(sbm)
        cfg.fanout_string = "4-4"
        cfg.batch_size = 32
        t3 = MinibatchTrainer(sbm, cfg)
        t3.run(epochs=1)
        for tr in (t1, t2, t3):
            json.dumps(tr.debuginfo())


def test_resume_equals_uninterrupted_run(sbm, tmp_path):
    """Fault-recovery contract: train 4 epochs, checkpoint, restore in a
    FRESH trainer and train 4 more — the final params/history must equal
    the uninterrupted 8-epoch run bit-near (run_key travels through the
    checkpoint, drop_rate=0 makes epochs deterministic). The reference has
    no training persistence at all (SURVEY.md §5)."""
    cfg = make_config(sbm)
    cfg.epochs = 8
    straight = FullGraphTrainer(sbm, cfg, model=gcn, backend="xla")
    h_all = straight.run()

    cfg1 = make_config(sbm, tmp=tmp_path)
    t1 = FullGraphTrainer(sbm, cfg1, model=gcn, backend="xla")
    t1.run(epochs=4)   # saves at end (checkpoint_path set)

    cfg2 = make_config(sbm, tmp=tmp_path)
    t2 = FullGraphTrainer(sbm, cfg2, model=gcn, backend="xla")
    start = t2.resume(str(tmp_path / "ck"))
    assert start == 4
    h_tail = t2.run(epochs=4)
    assert abs(h_tail[-1]["loss"] - h_all[-1]["loss"]) < 2e-4, (
        h_tail[-1], h_all[-1])
    assert abs(h_tail[-1]["test"] - h_all[-1]["test"]) < 1e-6


def test_npz_checkpoint_roundtrips_bf16(tmp_path):
    """The npz fallback must round-trip bfloat16 leaves: np.load returns
    void '|V2' arrays for ml_dtypes, so the writer widens to f32 (lossless)
    and restore casts back to the template dtype."""
    import jax
    import jax.numpy as jnp
    from neutronstarlite_tpu.utils import checkpoint as ckpt
    orig = ckpt._orbax
    ckpt._orbax = lambda: None        # force the npz path
    try:
        st = ckpt.make_state(
            params=[{"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3)}],
            bn=[], opt_state=(), run_key=jax.random.PRNGKey(0), epoch=4)
        ckpt.save_checkpoint(str(tmp_path / "ck"), st)
        r = ckpt.restore_checkpoint(str(tmp_path / "ck"), st)
        assert r["params"][0]["w"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(r["params"][0]["w"], np.float32),
            np.asarray(st["params"][0]["w"], np.float32))
        assert int(r["epoch"]) == 4
    finally:
        ckpt._orbax = orig
