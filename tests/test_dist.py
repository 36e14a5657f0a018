"""Distributed DepComm/DepCache tests on the 8-device virtual CPU mesh
(the reference's localhost-multi-rank strategy, SURVEY.md §4.5).

Key oracle: the distributed engine must produce the SAME math as the
single-chip engine — dist logits/accuracy == single-chip (for models without
local batchnorm), and DepCache routing must not change results at all (the
cache is refreshed within the step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
from neutronstarlite_tpu.models import commnet, gat, gcn
from neutronstarlite_tpu.parallel.depcomm import (build_dist_graph,
                                                  device_view, make_tensors)
from neutronstarlite_tpu.parallel.mesh import make_mesh
from neutronstarlite_tpu.training.dist_trainer import DistTrainer, _shard_map
from neutronstarlite_tpu.training.trainer import FullGraphTrainer
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def sbm():
    return synthetic_sbm_dataset(num_vertices=257, feat_dim=16, num_classes=3,
                                 avg_degree=7, homophily=0.9, seed=4,
                                 feature_noise=0.3)


def make_config(sbm, epochs=20):
    return InputInfo(vertices=sbm.num_vertices, epochs=epochs,
                     layer_string=f"16-8-{sbm.num_classes}",
                     learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                     seed=7)


def dist_aggregate(sbm, rep_threshold=0, n_dev=4):
    """Run one distributed aggregate_neighbors and gather back to global."""
    mesh = make_mesh(n_dev)
    dg = build_dist_graph(sbm.graph, n_dev, rep_threshold=rep_threshold)
    arrs = jax.tree.map(jnp.asarray, device_view(dg))
    x = jnp.asarray(dg.shard_features(sbm.features))

    def f(arrs, x):
        sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        gt = make_tensors(sq(arrs), dg)
        y = gt.aggregate_neighbors(sq(x))
        return y[None]

    spec = jax.tree.map(lambda _: P("p"), arrs)
    y = jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p")),
                           out_specs=P("p")))(arrs, x)
    # gather valid rows back into global order
    out = np.zeros((sbm.num_vertices, sbm.features.shape[1]), np.float32)
    off = dg.partition.offsets
    y = np.asarray(y)
    for i in range(n_dev):
        n = off[i + 1] - off[i]
        out[off[i]:off[i + 1]] = y[i, :n]
    return out


class TestDepComm:
    def test_dist_aggregate_matches_single(self, sbm):
        from neutronstarlite_tpu.ops.graph_ops import GraphTensors
        gt = GraphTensors.from_graph(sbm.graph, backend="xla")
        oracle = np.asarray(gt.aggregate_neighbors(jnp.asarray(sbm.features)))
        out = dist_aggregate(sbm, rep_threshold=0)
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)

    def test_depcache_routing_identical(self, sbm):
        """Hot-vertex replication changes the comm pattern, not the math."""
        base = dist_aggregate(sbm, rep_threshold=0)
        cached = dist_aggregate(sbm, rep_threshold=10)
        np.testing.assert_allclose(cached, base, rtol=1e-4, atol=1e-5)
        # and the threshold actually fired
        dg = build_dist_graph(sbm.graph, 4, rep_threshold=10)
        assert dg.h_pad > 0

    def test_depcache_shrinks_exchange(self, sbm):
        dg0 = build_dist_graph(sbm.graph, 4, rep_threshold=0)
        dg1 = build_dist_graph(sbm.graph, 4, rep_threshold=8)
        assert dg1.m_pad <= dg0.m_pad

    def test_mirror_counts_exact(self, sbm):
        """DetermineMirror oracle: mirror sets == remote distinct srcs."""
        g = sbm.graph
        n_dev = 4
        dg = build_dist_graph(g, n_dev)
        owner = dg.partition.owner
        off = dg.partition.offsets
        for i in range(n_dev):
            lo, hi = int(g.fwd_offsets[off[i]]), int(g.fwd_offsets[off[i + 1]])
            esrc = g.fwd_src[lo:hi]
            remote = np.unique(esrc[owner[esrc] != i])
            # every remote src must be reachable: count must fit m_pad per peer
            for q in range(n_dev):
                cnt = np.unique(remote[owner[remote] == q]).size
                assert cnt <= dg.m_pad


class TestDistTrainer:
    def test_dist_gcn_converges(self, sbm):
        tr = DistTrainer(sbm, make_config(sbm, epochs=25), model=gcn,
                         num_partitions=4)
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["test"] > 0.7, f"dist GCN failed: {hist[-1]}"

    def test_dist_p1_matches_single_chip_exactly(self, sbm):
        """With one partition the dist objective equals the single-chip one
        (partition mean == global mean) → losses must match to fp noise."""
        cfg = make_config(sbm, epochs=6)
        single = FullGraphTrainer(sbm, cfg, model=commnet, backend="xla")
        h1 = single.run()
        dist = DistTrainer(sbm, cfg, model=commnet, num_partitions=1)
        h2 = dist.run()
        for a, b in zip(h1, h2):
            assert abs(a["loss"] - b["loss"]) < 2e-4, (a, b)
            assert abs(a["train"] - b["train"]) < 1e-6

    def test_dist_fused_epochs_match_unfused(self, sbm):
        """FUSE_EPOCHS on the dist engine (scan of shard_map steps, one
        dispatch per window) must reproduce the per-epoch dispatch loop
        exactly when training is deterministic (drop_rate=0)."""
        cfg = make_config(sbm, epochs=7)
        plain = DistTrainer(sbm, cfg, model=gcn, num_partitions=4)
        h1 = plain.run()
        cfg2 = make_config(sbm, epochs=7)
        cfg2.fuse_epochs = 3  # 2 fused windows + 1 unfused remainder epoch
        fused = DistTrainer(sbm, cfg2, model=gcn, num_partitions=4)
        h2 = fused.run()
        assert len(h1) == len(h2) == 7
        for a, b in zip(h1, h2):
            assert abs(a["loss"] - b["loss"]) < 2e-5, (a, b)
            assert abs(a["test"] - b["test"]) < 1e-6, (a, b)

    def test_dist_commnet_tracks_single_chip(self, sbm):
        """P=4: the objective is Σ_p mean_p (the reference's per-rank mean
        loss + summed grads, GCN_CPU.hpp:187-206) — slightly different from
        the global mean, so allow a loose tolerance."""
        cfg = make_config(sbm, epochs=8)
        single = FullGraphTrainer(sbm, cfg, model=commnet, backend="xla")
        h1 = single.run()
        dist = DistTrainer(sbm, cfg, model=commnet, num_partitions=4)
        h2 = dist.run()
        for a, b in zip(h1, h2):
            assert abs(a["loss"] - b["loss"]) < 0.08, (a, b)
        assert abs(h1[-1]["test"] - h2[-1]["test"]) < 0.08

    def test_dist_ggcn_tracks_single_chip(self, sbm):
        """GGCN (linear-gate fused path on the comb slabs) under DepComm:
        same Σ_p mean_p objective caveat as CommNet above."""
        from neutronstarlite_tpu.models import ggcn
        cfg = make_config(sbm, epochs=8)
        cfg.drop_rate = 0.0
        single = FullGraphTrainer(sbm, cfg, model=ggcn, backend="pallas")
        h1 = single.run()
        dist = DistTrainer(sbm, cfg, model=ggcn, num_partitions=4)
        h2 = dist.run()
        for a, b in zip(h1, h2):
            assert abs(a["loss"] - b["loss"]) < 0.08, (a, b)
        assert abs(h1[-1]["test"] - h2[-1]["test"]) < 0.08

    def test_dist_gat_runs(self, sbm):
        tr = DistTrainer(sbm, make_config(sbm, epochs=10), model=gat,
                         num_partitions=4)
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]

    def test_dist_gcn_with_depcache(self, sbm):
        tr = DistTrainer(sbm, make_config(sbm, epochs=15), model=gcn,
                         num_partitions=4, rep_threshold=10)
        hist = tr.run()
        assert hist[-1]["test"] > 0.6


class TestOverlap:
    def test_overlap_aggregate_identical(self, sbm):
        """PROC_OVERLAP split-slab routing must not change the math."""
        from neutronstarlite_tpu.ops.graph_ops import GraphTensors
        import jax.numpy as jnp
        gt = GraphTensors.from_graph(sbm.graph, backend="xla")
        oracle = np.asarray(gt.aggregate_neighbors(jnp.asarray(sbm.features)))

        mesh = make_mesh(4)
        dg = build_dist_graph(sbm.graph, 4, overlap=True)
        assert dg.ell_mode == "split"
        arrs = jax.tree.map(jnp.asarray, device_view(dg))
        x = jnp.asarray(dg.shard_features(sbm.features))

        def f(arrs, x):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            gt_d = make_tensors(sq(arrs), dg)
            return gt_d.aggregate_neighbors(sq(x))[None]

        spec = jax.tree.map(lambda _: P("p"), arrs)
        y = jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p")),
                               out_specs=P("p")))(arrs, x)
        y = np.asarray(y)
        off = dg.partition.offsets
        for i in range(4):
            n = off[i + 1] - off[i]
            np.testing.assert_allclose(y[i, :n], oracle[off[i]:off[i + 1]],
                                       rtol=1e-4, atol=1e-5)

    def test_overlap_trainer_converges(self, sbm):
        cfg = make_config(sbm, epochs=15)
        cfg.overlap = True
        tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=4)
        hist = tr.run()
        assert hist[-1]["test"] > 0.6, hist[-1]


class TestStaleDepCache:
    def test_stale_cache_trains(self, sbm):
        """CACHE_REFRESH>1: non-refresh epochs skip the hot all_gather and
        use stale tables; training must still converge."""
        cfg = make_config(sbm, epochs=20)
        cfg.cache_refresh = 4
        tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=4,
                         rep_threshold=8)
        assert tr.use_stale_cache
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["test"] > 0.55, hist[-1]
        # cache object materialized with one table per GCN layer
        assert len(tr.hot_cache) == 2

    def test_refresh_1_matches_plain(self, sbm):
        """CACHE_REFRESH=1 must behave exactly like the always-fresh path."""
        cfg = make_config(sbm, epochs=5)
        cfg.cache_refresh = 1
        a = DistTrainer(sbm, cfg, model=gcn, num_partitions=4,
                        rep_threshold=8).run()
        cfg2 = make_config(sbm, epochs=5)
        b = DistTrainer(sbm, cfg2, model=gcn, num_partitions=4,
                        rep_threshold=8).run()
        for ra, rb in zip(a, b):
            assert abs(ra["loss"] - rb["loss"]) < 1e-6


class TestShuffleVertices:
    def test_shuffle_converges_same(self, sbm):
        """Random relabeling is math-preserving: training converges to the
        same accuracy ballpark, and the exchange shrinks on skewed graphs."""
        cfg = make_config(sbm, epochs=20)
        base = DistTrainer(sbm, cfg, model=gcn, num_partitions=4).run()
        cfg2 = make_config(sbm, epochs=20)
        cfg2.shuffle_vertices = True
        shuf = DistTrainer(sbm, cfg2, model=gcn, num_partitions=4).run()
        assert shuf[-1]["test"] > 0.65
        assert abs(base[-1]["test"] - shuf[-1]["test"]) < 0.12


class TestRepModes:
    def test_multiplicity_mode_identical_math(self, sbm):
        base = dist_aggregate(sbm, rep_threshold=0)
        dg = build_dist_graph(sbm.graph, 4, rep_threshold=2,
                              rep_mode="multiplicity")
        assert dg.h_pad > 0
        # route through the generic dist_aggregate with a custom dg
        import jax.numpy as jnp
        mesh = make_mesh(4)
        arrs = jax.tree.map(jnp.asarray, device_view(dg))
        x = jnp.asarray(dg.shard_features(sbm.features))

        def f(arrs, x):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            return make_tensors(sq(arrs), dg).aggregate_neighbors(sq(x))[None]

        spec = jax.tree.map(lambda _: P("p"), arrs)
        y = np.asarray(jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p")),
                                          out_specs=P("p")))(arrs, x))
        off = dg.partition.offsets
        for i in range(4):
            n = off[i + 1] - off[i]
            np.testing.assert_allclose(y[i, :n], base[off[i]:off[i + 1]],
                                       rtol=1e-4, atol=1e-5)

    def test_auto_mode_never_worse(self, sbm):
        d0 = build_dist_graph(sbm.graph, 4)
        da = build_dist_graph(sbm.graph, 4, rep_mode="auto")
        assert 4 * da.m_pad + da.h_pad <= 4 * d0.m_pad + max(8, 0) + 8

    def test_auto_mode_trains(self, sbm):
        cfg = make_config(sbm, epochs=10)
        cfg.rep_mode = "auto"
        tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=4)
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]


class TestDistBatchNorm:
    def test_masked_bn_ignores_padding(self):
        """Masked batch stats must equal stats over only the real rows."""
        import jax.numpy as jnp
        from neutronstarlite_tpu.nn import layers
        r = np.random.default_rng(3)
        real = r.standard_normal((20, 6)).astype(np.float32) * 2 + 1
        x = np.concatenate([real, np.zeros((12, 6), np.float32)])
        mask = jnp.asarray(np.arange(32) < 20)
        bn = layers.batch_norm_init(6)
        y, bn2 = layers.batch_norm_apply(bn, jnp.asarray(x), training=True,
                                         row_mask=mask)
        np.testing.assert_allclose(np.asarray(y)[:20].mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bn2["mean"]),
                                   0.1 * real.mean(0), rtol=1e-4, atol=1e-5)

    def test_dist_gin_converges(self, sbm):
        """GIN distributed: batchnorm over padded blocks uses row_mask."""
        from neutronstarlite_tpu.models import gin
        tr = DistTrainer(sbm, make_config(sbm, epochs=20), model=gin,
                         num_partitions=4)
        hist = tr.run()
        assert hist[-1]["loss"] < hist[0]["loss"]
        assert hist[-1]["test"] > 0.6, f"dist GIN failed: {hist[-1]}"


class TestSlabPadding:
    def test_tail_rows_padding_stays_sorted(self, sbm):
        """ADVICE r1 (medium): cross-device tail padding must keep
        *_tail_rows non-decreasing AND out-of-range, because _tail_combine
        consumes them with indices_are_sorted=True (violating the sorted
        hint is implementation-defined on TPU)."""
        # skewed partition counts -> devices have unequal tail row counts
        dg = build_dist_graph(sbm.graph, 4)
        for key, num_rows_key in (("f_tail_rows", "num_dst"),
                                  ("b_tail_rows", "num_src")):
            slabs = dg.ell_np["comb"]
            arr = slabs[key]          # [P, Rv_pad]
            for d in range(arr.shape[0]):
                row = arr[d]
                assert np.all(np.diff(row.astype(np.int64)) >= 0), (
                    f"{key} device {d} not sorted: {row}")


class TestCfgWiring:
    """Cfg-surface wiring added in r2 (VERDICT r1 item 7)."""

    def _sbm_cfg(self, sbm, tmp_path, extra=""):
        import numpy as np
        from neutronstarlite_tpu.graph import io as gio
        edge = tmp_path / "g.edge"
        pairs = np.stack([sbm.graph.fwd_src, sbm.graph.fwd_dst], 1)
        pairs.astype("<u4").tofile(edge)
        cfg = tmp_path / "t.cfg"
        cfg.write_text(
            "ALGORITHM:GCNSAMPLESINGLE\n"
            f"VERTICES:{sbm.num_vertices}\n"
            "EPOCHS:1\nLAYERS:16-8-3\nFANOUT:3-3\nBATCH_SIZE:64\n"
            f"EDGE_FILE:{edge}\nFEATURE_FILE:random\n"
            "LEARN_RATE:0.01\nWEIGHT_DECAY:0.0001\nDROP_RATE:0.0\n"
            + extra)
        return str(cfg)

    def test_sampled_dist_dispatch(self, sbm, tmp_path):
        """GCNSAMPLESINGLE + NUM_PARTITIONS>1 must reach the dist sampled
        trainer (was: silently single-device)."""
        from neutronstarlite_tpu.main import run_from_config
        from neutronstarlite_tpu.training.minibatch import \
            DistMinibatchTrainer
        cfg = InputInfo.from_cfg_file(
            self._sbm_cfg(sbm, tmp_path, "NUM_PARTITIONS:2\n"))
        tr, hist = run_from_config(cfg, log_every=0)
        assert isinstance(tr, DistMinibatchTrainer)
        assert np.isfinite(hist[-1]["loss"])

    def test_proc_local_maps_to_split_slabs(self, sbm):
        """PROC_LOCAL is the local/remote overlap split, not a no-op."""
        cfg = make_config(sbm, epochs=1)
        cfg.process_local = True
        tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=2)
        assert tr.dg.ell_mode == "split"

    @pytest.mark.parametrize("model", ["gat", "ggcn"])
    def test_overlap_attention_keeps_fused_math(self, sbm, model):
        """GAT/GGCN under PROC_OVERLAP run the split-slab fused path
        (attention_stats/gated_stats + merge_softmax_parts) and must track
        the non-overlap run's losses — the softmax over local∪remote edges
        is recomposed exactly from per-set online-softmax parts."""
        from neutronstarlite_tpu.models import ggcn
        mod = {"gat": gat, "ggcn": ggcn}[model]
        cfg = make_config(sbm, epochs=6)
        cfg.drop_rate = 0.0
        h1 = DistTrainer(sbm, cfg, model=mod, num_partitions=2).run()
        cfg2 = make_config(sbm, epochs=6)
        cfg2.drop_rate = 0.0
        cfg2.overlap = True
        tr = DistTrainer(sbm, cfg2, model=mod, num_partitions=2)
        assert tr.dg.ell_mode == "split"
        h2 = tr.run()
        l1 = np.array([r["loss"] for r in h1])
        l2 = np.array([r["loss"] for r in h2])
        np.testing.assert_allclose(l2, l1, rtol=5e-4, atol=5e-5)


class TestRingExchange:
    """EXCHANGE:ring — P-1 exact-max-sized ppermutes (VERDICT r1 item 3).
    Must be bit-identical math to the uniform all_to_all."""

    def _agg(self, sbm, exchange, rep=0, n_dev=4):
        mesh = make_mesh(n_dev)
        dg = build_dist_graph(sbm.graph, n_dev, rep_threshold=rep,
                              exchange=exchange)
        arrs = jax.tree.map(jnp.asarray, device_view(dg))
        x = jnp.asarray(dg.shard_features(sbm.features))

        def f(arrs, x):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            gt = make_tensors(sq(arrs), dg)
            return gt.aggregate_neighbors(sq(x))[None]

        spec = jax.tree.map(lambda _: P("p"), arrs)
        y = jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p")),
                               out_specs=P("p")))(arrs, x)
        out = np.zeros((sbm.num_vertices, sbm.features.shape[1]), np.float32)
        off = dg.partition.offsets
        y = np.asarray(y)
        for i in range(n_dev):
            n = off[i + 1] - off[i]
            out[off[i]:off[i + 1]] = y[i, :n]
        return out

    def test_ring_matches_uniform(self, sbm):
        a = self._agg(sbm, "uniform")
        b = self._agg(sbm, "ring")
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)

    def test_ring_with_depcache(self, sbm):
        a = self._agg(sbm, "uniform", rep=10)
        b = self._agg(sbm, "ring", rep=10)
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)

    def test_ring_trainer_matches_uniform(self, sbm):
        cfg = make_config(sbm, epochs=6)
        h1 = DistTrainer(sbm, cfg, model=commnet, num_partitions=4).run()
        cfg2 = make_config(sbm, epochs=6)
        cfg2.exchange = "ring"
        h2 = DistTrainer(sbm, cfg2, model=commnet, num_partitions=4).run()
        for a, b in zip(h1, h2):
            assert abs(a["loss"] - b["loss"]) < 2e-5, (a, b)
            assert a["test"] == b["test"], (a, b)

    def test_ring_gat_runs(self, sbm):
        cfg = make_config(sbm, epochs=6)
        cfg.exchange = "ring"
        tr = DistTrainer(sbm, cfg, model=gat, num_partitions=4)
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]

    def test_ring_volume_not_worse(self, sbm):
        """Ring volume ≤ uniform padded volume; both cover every mirror."""
        dg_u = build_dist_graph(sbm.graph, 4)
        dg_r = build_dist_graph(sbm.graph, 4, partition=dg_u.partition,
                                exchange="ring")
        assert sum(dg_r.ring_sizes) <= 4 * dg_u.m_pad

    def test_shuffle_ring_within_1p3_of_exact(self):
        """VERDICT r1 item 3 done-criterion: on a zipf-skewed graph the
        SHUFFLE_VERTICES + EXCHANGE:ring recipe moves ≤1.3× the exact
        dependency volume (uniform all_to_all moved 2-3×)."""
        from neutronstarlite_tpu.graph.structure import (add_self_loops,
                                                         build_graph)
        v, deg = 8000, 20
        rng = np.random.default_rng(0)
        e = v * deg
        wgt = (np.arange(1, v + 1) ** -0.8)
        wgt /= wgt.sum()
        dst = rng.choice(v, size=e, p=wgt).astype(np.int32)
        src = rng.choice(v, size=e, p=wgt).astype(np.int32)
        src, dst = add_self_loops(src, dst, v)
        perm = np.random.default_rng(7).permutation(v).astype(np.int32)
        g = build_graph(perm[src], perm[dst], v)
        for p in (4, 8):
            base = build_dist_graph(g, p)
            ring = build_dist_graph(g, p, partition=base.partition,
                                    exchange="ring")
            owner, off = base.partition.owner, base.partition.offsets
            real = 0
            for i in range(p):
                lo = int(g.fwd_offsets[off[i]])
                hi = int(g.fwd_offsets[off[i + 1]])
                esrc = g.fwd_src[lo:hi]
                real += np.unique(esrc[owner[esrc] != i]).size
            exact = real / p
            assert sum(ring.ring_sizes) <= 1.3 * exact, (
                p, sum(ring.ring_sizes), exact)


class TestDistPredict:
    def test_predict_matches_single_chip(self, sbm):
        """DistTrainer.predict(): eval-mode logits in global order must
        match FullGraphTrainer.predict() when both train identically
        (P=1 ⇒ same objective, same updates)."""
        cfg = make_config(sbm, epochs=5)
        single = FullGraphTrainer(sbm, cfg, model=commnet, backend="xla")
        single.run()
        dist = DistTrainer(sbm, make_config(sbm, epochs=5), model=commnet,
                           num_partitions=1)
        dist.run()
        a = np.asarray(single.predict())
        b = dist.predict()
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)

    def test_predict_runs_p4(self, sbm):
        tr = DistTrainer(sbm, make_config(sbm, epochs=3), model=gcn,
                         num_partitions=4)
        tr.run()
        logits = tr.predict()
        assert logits.shape == (sbm.num_vertices, sbm.num_classes)
        assert np.isfinite(logits).all()


class TestFlagMatrix:
    """Interaction coverage: the comm-schedule / slab-layout flags
    (EXCHANGE:ring, PROC_OVERLAP split, PROC_REP DepCache) change HOW data
    moves, never the math — every combination must reproduce the plain
    dist run's losses to fp noise (drop_rate=0, same partitioning)."""

    @pytest.mark.parametrize("model_name,flags", [
        ("gcn", dict(exchange="ring", rep=8)),
        ("gcn", dict(exchange="ring", overlap=True)),
        ("gcn", dict(overlap=True, rep=8)),
        ("gcn", dict(exchange="ring", overlap=True, rep=8)),
        ("gat", dict(overlap=True, rep=8)),
        ("gat", dict(exchange="ring", overlap=True)),
        ("ggcn", dict(overlap=True, rep=8)),
    ])
    def test_flag_combo_matches_plain_dist(self, sbm, model_name, flags):
        from neutronstarlite_tpu.models import ggcn
        mod = {"gcn": gcn, "gat": gat, "ggcn": ggcn}[model_name]
        cfg = make_config(sbm, epochs=5)
        cfg.drop_rate = 0.0
        plain = DistTrainer(sbm, cfg, model=mod, num_partitions=2)
        h1 = plain.run()

        cfg2 = make_config(sbm, epochs=5)
        cfg2.drop_rate = 0.0
        cfg2.exchange = flags.get("exchange", "uniform")
        cfg2.overlap = flags.get("overlap", False)
        tr = DistTrainer(sbm, cfg2, model=mod, num_partitions=2,
                         rep_threshold=flags.get("rep", 0))
        if "rep" in flags:
            assert tr.dg.h_pad > 0, "combo must exercise DepCache"
        if flags.get("overlap"):
            assert tr.dg.ell_mode == "split"
        h2 = tr.run()
        l1 = np.array([r["loss"] for r in h1])
        l2 = np.array([r["loss"] for r in h2])
        np.testing.assert_allclose(l2, l1, rtol=5e-4, atol=5e-5)
        np.testing.assert_allclose([r["test"] for r in h2],
                                   [r["test"] for r in h1], atol=1e-6)


class TestBf16Exchange:
    """DTYPE:bfloat16 ships the collective payload in bf16 (the tables
    feed bf16 slab gathers regardless), halving ICI volume both ways (the
    all_to_all transpose carries bf16 grads too)."""

    def test_payload_bf16_table_stays_f32(self, sbm):
        """The COLLECTIVE payload travels bf16, but the combined table
        returns in x's dtype — dense/score/BN/loss math stays f32 like the
        single-chip bf16 contract (only slab gathers cast down)."""
        mesh = make_mesh(2)
        dg = build_dist_graph(sbm.graph, 2)
        arrs = jax.tree.map(jnp.asarray, device_view(dg))
        x = jnp.asarray(dg.shard_features(sbm.features))

        def f(arrs, x):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            gt = make_tensors(sq(arrs), dg, agg_dtype="bfloat16")
            xl = sq(x)
            remote = gt.exchange_remote(xl)
            table = gt.get_dep_nbr(xl)
            return remote[None], table[None]

        spec = jax.tree.map(lambda _: P("p"), arrs)
        remote, table = jax.jit(_shard_map(
            f, mesh, in_specs=(spec, P("p")),
            out_specs=(P("p"), P("p"))))(arrs, x)
        assert remote.dtype == jnp.bfloat16     # what crossed the ICI
        assert table.dtype == jnp.float32       # what the model consumes
        # upcast-after-exchange: the table's remote rows equal the bf16
        # round trip of the f32 originals
        v = dg.v_pad
        np.testing.assert_array_equal(
            np.asarray(table[:, v:], np.float32),
            np.asarray(remote, np.float32))

    def test_bf16_exchange_tracks_f32(self, sbm):
        cfg = make_config(sbm, epochs=6)
        h32 = DistTrainer(sbm, cfg, model=gcn, num_partitions=2).run()
        cfg16 = make_config(sbm, epochs=6)
        cfg16.dtype = "bfloat16"
        h16 = DistTrainer(sbm, cfg16, model=gcn, num_partitions=2).run()
        l32 = np.array([r["loss"] for r in h32])
        l16 = np.array([r["loss"] for r in h16])
        assert np.all(np.isfinite(l16))
        # bf16 payload: same trajectory class, small numeric drift
        np.testing.assert_allclose(l16, l32, rtol=0.05, atol=0.02)
        assert abs(h16[-1]["test"] - h32[-1]["test"]) < 0.05


def test_overlap_gated_lane_chunked_matches(sbm, monkeypatch):
    """Force the big-graph branch of the gated overlap path: the per-lane
    softmax is chunked over FEATURE lanes (exact); losses must still equal
    the non-overlap run."""
    from neutronstarlite_tpu.models import ggcn
    from neutronstarlite_tpu.ops import ell as ell_mod
    cfg = make_config(sbm, epochs=4)
    h1 = DistTrainer(sbm, cfg, model=ggcn, num_partitions=2).run()
    monkeypatch.setattr(ell_mod, "_GATED_CHUNK_BYTES", 20000)
    cfg2 = make_config(sbm, epochs=4)
    cfg2.overlap = True
    tr = DistTrainer(sbm, cfg2, model=ggcn, num_partitions=2)
    assert tr.dg.ell_mode == "split"
    h2 = tr.run()
    np.testing.assert_allclose([r["loss"] for r in h2],
                               [r["loss"] for r in h1],
                               rtol=5e-4, atol=5e-5)


class TestFennelPartition:
    """PARTITION:fennel — streaming edge-locality partitioner (beyond-
    reference; the reference only has the contiguous range split). The
    partition changes WHERE vertices live, never the math."""

    @pytest.fixture(scope="class")
    def clustered(self):
        return synthetic_sbm_dataset(num_vertices=2000, feat_dim=8,
                                     num_classes=8, avg_degree=12,
                                     homophily=0.9, seed=5)

    def test_fennel_aggregate_matches_single(self, clustered):
        from neutronstarlite_tpu.graph.reorder import fennel_partition
        from neutronstarlite_tpu.ops.graph_ops import GraphTensors
        fd, fp = fennel_partition(clustered, 4)
        gt = GraphTensors.from_graph(fd.graph, backend="xla")
        oracle = np.asarray(gt.aggregate_neighbors(jnp.asarray(fd.features)))
        mesh = make_mesh(4)
        dg = build_dist_graph(fd.graph, 4, partition=fp)
        arrs = jax.tree.map(jnp.asarray, device_view(dg))
        x = jnp.asarray(dg.shard_features(fd.features))

        def f(arrs, x):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            gt_d = make_tensors(sq(arrs), dg)
            return gt_d.aggregate_neighbors(sq(x))[None]

        spec = jax.tree.map(lambda _: P("p"), arrs)
        y = np.asarray(jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p")),
                                          out_specs=P("p")))(arrs, x))
        off = dg.partition.offsets
        for i in range(4):
            n = off[i + 1] - off[i]
            np.testing.assert_allclose(y[i, :n], oracle[off[i]:off[i + 1]],
                                       rtol=1e-4, atol=1e-5)

    def test_fennel_cuts_edges_on_clustered_graph(self, clustered):
        """Edge-cut is the robust quality metric at test scale (mirror
        counts saturate on tiny dense graphs — nearly every vertex is
        SOME partition's mirror regardless of locality; the mirror-volume
        effect at scale is measured in tools/analyze_comm.py: −74% ring
        volume at V=20K p=8, −73% mirrors on the homophily-0.9 SBM)."""
        from neutronstarlite_tpu.graph.partition import (
            locality_aware_partition)
        from neutronstarlite_tpu.graph.reorder import fennel_partition
        g = clustered.graph
        base = locality_aware_partition(g.in_degree, 4)
        cut0 = float(np.mean(base.owner[g.fwd_src]
                             != base.owner[g.fwd_dst]))
        fd, fp = fennel_partition(clustered, 4)
        gf = fd.graph
        cut1 = float(np.mean(fp.owner[gf.fwd_src]
                             != fp.owner[gf.fwd_dst]))
        assert cut1 < 0.5 * cut0, (cut1, cut0)
        # balance: no partition above the slack cap
        assert fp.local_counts.max() <= 1.1 * (-(-clustered.num_vertices
                                                 // 4)) + 1

    def test_fennel_native_matches_numpy_fallback(self, clustered):
        from neutronstarlite_tpu import native
        from neutronstarlite_tpu.graph.reorder import _fennel_owner_np
        if not native.available():
            pytest.skip("native lib absent")
        g = clustered.graph
        order = np.random.default_rng(1).permutation(
            g.num_vertices).astype(np.int32)
        got = native.fennel(g.fwd_offsets, g.fwd_src, g.bwd_offsets,
                            g.bwd_dst, g.num_vertices, 4, 1.5, 1.1, 2,
                            order)
        want = _fennel_owner_np(g, 4, 1.5, 1.1, 2, order)
        np.testing.assert_array_equal(got, want)

    def test_fennel_trainer_cfg(self, clustered):
        cfg = InputInfo(vertices=clustered.num_vertices, epochs=10,
                        layer_string="8-8-8", learn_rate=0.01,
                        weight_decay=1e-4, drop_rate=0.0, seed=7)
        cfg._set_key("PARTITION", "fennel")
        assert cfg.partition_mode == "fennel"
        tr = DistTrainer(clustered, cfg, model=gcn, num_partitions=4)
        hist = tr.run()
        assert np.isfinite(hist[-1]["loss"])
        assert hist[-1]["loss"] < hist[0]["loss"]


@pytest.mark.parametrize("mode", ["shuffle", "fennel"])
def test_predict_returns_original_vertex_order(sbm, mode):
    """SHUFFLE_VERTICES / PARTITION:fennel relabel vertices internally;
    predict() must return logits in the USER's original order. With equal
    (seeded) init params and no training, the forward is deterministic and
    permutation-invariant, so per-original-vertex logits must be identical
    to the unrelabeled run."""
    cfg = make_config(sbm, epochs=1)
    base = DistTrainer(sbm, cfg, model=gcn, num_partitions=2)
    want = base.predict()
    cfg2 = make_config(sbm, epochs=1)
    if mode == "shuffle":
        cfg2.shuffle_vertices = True
    else:
        cfg2.partition_mode = "fennel"
    tr = DistTrainer(sbm, cfg2, model=gcn, num_partitions=2)
    assert tr.vertex_perm is not None
    got = tr.predict()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
