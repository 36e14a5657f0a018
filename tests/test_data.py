"""Data layer tests: cfg parsing, edge file IO, structure build, partition.

Includes the reference's own cross-structure degree check
(test/testcsr.cpp:40-45: backward in_degree == csc column_offset diff)."""

import os

import numpy as np
import pytest

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph import io
from neutronstarlite_tpu.graph.partition import locality_aware_partition
from neutronstarlite_tpu.graph.structure import add_self_loops, build_graph

REF_CFG = "/root/reference/gcn_cora.cfg"
REF_EDGE = "/root/reference/data/cora.2708.edge.self"
REF_LABEL = "/root/reference/data/cora.labeltable"
REF_MASK = "/root/reference/data/cora.mask"


class TestConfig:
    @pytest.mark.skipif(not os.path.exists(REF_CFG), reason="no reference cfg")
    def test_parse_reference_cfg(self):
        cfg = InputInfo.from_cfg_file(REF_CFG)
        assert cfg.algorithm == "GCNCPU"
        assert cfg.vertices == 2708
        assert cfg.layer_sizes == [1433, 128, 7]
        assert cfg.epochs == 200
        assert cfg.learn_rate == pytest.approx(0.01)
        assert cfg.weight_decay == pytest.approx(1e-4)
        assert cfg.drop_rate == pytest.approx(0.5)
        assert not cfg.with_cuda

    def test_roundtrip_keys(self, tmp_path):
        p = tmp_path / "t.cfg"
        p.write_text("ALGORITHM:GATCPU\nVERTICES:10\nLAYERS:4-2\n"
                     "FANOUT:5-10\nBATCH_SIZE:32\nPROC_REP:7\n")
        cfg = InputInfo.from_cfg_file(str(p))
        assert cfg.algorithm == "GATCPU"
        assert cfg.fanout == [5, 10]
        assert cfg.batch_size == 32
        assert cfg.repthreshold == 7


class TestEdgeIO:
    def test_roundtrip(self, tmp_path):
        r = np.random.default_rng(0)
        src = r.integers(0, 100, 500).astype(np.int32)
        dst = r.integers(0, 100, 500).astype(np.int32)
        p = str(tmp_path / "e.bin")
        io.write_edge_file(p, src, dst)
        s2, d2 = io.read_edge_file(p, 100)
        np.testing.assert_array_equal(src, s2)
        np.testing.assert_array_equal(dst, d2)

    @pytest.mark.skipif(not os.path.exists(REF_EDGE), reason="no cora data")
    def test_load_cora_edges(self):
        src, dst = io.read_edge_file(REF_EDGE, 2708)
        assert src.shape == dst.shape
        # .self file contains one self loop per vertex
        assert (src == dst).sum() == 2708
        g = build_graph(src, dst, 2708)
        assert g.num_edges == src.size
        assert (g.in_degree >= 1).all()

    @pytest.mark.skipif(not os.path.exists(REF_LABEL), reason="no cora data")
    def test_load_cora_labels_masks(self):
        labels = io.read_labels(REF_LABEL, 2708)
        masks = io.read_masks(REF_MASK, 2708)
        assert labels.min() >= 0 and labels.max() <= 6
        assert set(np.unique(masks)) <= {0, 1, 2}


class TestStructure:
    def test_csc_csr_consistency(self, small_graph):
        g = small_graph
        # testcsr oracle: in_degree == csc offset diffs; out_degree == csr diffs
        np.testing.assert_array_equal(np.diff(g.fwd_offsets), g.in_degree)
        np.testing.assert_array_equal(np.diff(g.bwd_offsets), g.out_degree)
        # both orderings contain the same multiset of edges with same weights
        f = sorted(zip(g.fwd_src, g.fwd_dst, np.round(g.fwd_weight, 6)))
        b = sorted(zip(g.bwd_src, g.bwd_dst, np.round(g.bwd_weight, 6)))
        assert f == b

    def test_norm_degree_weight(self, small_graph):
        g = small_graph
        w = 1.0 / np.sqrt(g.out_degree[g.fwd_src].astype(np.float64)
                          * g.in_degree[g.fwd_dst].astype(np.float64))
        np.testing.assert_allclose(g.fwd_weight, w, rtol=1e-6)

    def test_sorted_orders(self, small_graph):
        assert (np.diff(small_graph.fwd_dst) >= 0).all()
        assert (np.diff(small_graph.bwd_src) >= 0).all()

    def test_add_self_loops(self):
        src = np.array([0, 1, 1], dtype=np.int32)
        dst = np.array([1, 1, 2], dtype=np.int32)
        s, d = add_self_loops(src, dst, 3)
        assert ((s == d).sum()) == 3  # 1 had one; 0,2 added


class TestPartition:
    def test_partition_covers(self):
        deg = np.random.default_rng(1).integers(0, 50, 1000).astype(np.int32)
        part = locality_aware_partition(deg, 4)
        assert part.offsets[0] == 0 and part.offsets[-1] == 1000
        assert (np.diff(part.offsets) >= 0).all()
        assert part.local_counts.sum() == 1000
        # balance: each partition's score within 2x of mean
        scores = [part.owner[part.owner == p].size + deg[part.owner == p].sum()
                  for p in range(4)]
        assert max(scores) < 2.2 * (sum(scores) / 4)

    def test_local_id(self):
        deg = np.ones(100, dtype=np.int32)
        part = locality_aware_partition(deg, 4)
        vids = np.arange(100)
        lids = part.local_id(vids)
        for p in range(4):
            sel = part.owner == p
            np.testing.assert_array_equal(
                lids[sel], np.arange(part.local_counts[p]))


class TestReorder:
    def test_permutation_equivariance(self, small_graph):
        """aggregate(permuted graph, permuted x) == permute(aggregate(x))."""
        import jax.numpy as jnp
        from neutronstarlite_tpu.graph.dataset import GNNDatum
        from neutronstarlite_tpu.graph.reorder import permute_dataset
        from neutronstarlite_tpu.ops.graph_ops import GraphTensors
        v = small_graph.num_vertices
        r = np.random.default_rng(5)
        feats = r.standard_normal((v, 8)).astype(np.float32)
        datum = GNNDatum(graph=small_graph, features=feats,
                         labels=np.zeros(v, np.int32),
                         masks=np.zeros(v, np.int32), num_classes=2)
        perm = r.permutation(v).astype(np.int32)
        pd = permute_dataset(datum, perm)
        gt = GraphTensors.from_graph(small_graph, backend="xla")
        gt2 = GraphTensors.from_graph(pd.graph, backend="xla")
        y = np.asarray(gt.aggregate_neighbors(jnp.asarray(feats)))
        y2 = np.asarray(gt2.aggregate_neighbors(jnp.asarray(pd.features)))
        # row perm[v] of y2 must equal row v of y
        np.testing.assert_allclose(y2[perm], y, rtol=1e-4, atol=1e-5)

    def test_degree_sort(self, small_graph):
        from neutronstarlite_tpu.graph.dataset import GNNDatum
        from neutronstarlite_tpu.graph.reorder import degree_sort
        v = small_graph.num_vertices
        datum = GNNDatum(graph=small_graph,
                         features=np.zeros((v, 4), np.float32),
                         labels=np.zeros(v, np.int32),
                         masks=np.zeros(v, np.int32), num_classes=2)
        ds = degree_sort(datum)
        assert (np.diff(ds.graph.out_degree) <= 0).all()


def test_feature_norm_key(tmp_path):
    """FEATURE_NORM:1 standardizes the loaded table per feature (ours; the
    reference trains on raw features — bn-less models are fragile on
    unnormalized real data, BASELINE.md digits21k sweep)."""
    import os
    import sys

    import numpy as np

    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import (load_dataset,
                                                   synthetic_sbm_dataset)
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from generate_dataset import write_nts
    sbm = synthetic_sbm_dataset(num_vertices=97, feat_dim=6, num_classes=3,
                                avg_degree=5, seed=1)
    out = str(tmp_path / "nrm")
    g = sbm.graph
    feats = (sbm.features * 7.5 + 3.0).astype(np.float32)  # unnormalized
    write_nts(out, g.fwd_src, g.fwd_dst, feats, sbm.labels, sbm.masks)
    cfg = InputInfo(vertices=97, layer_string="6-4-3",
                    edge_file=out + ".edge.self",
                    feature_file=out + ".featuretable",
                    label_file=out + ".labeltable",
                    mask_file=out + ".mask", feature_norm=True)
    d = load_dataset(cfg)
    np.testing.assert_allclose(d.features.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(d.features.std(0), 1.0, atol=1e-3)
    # and the key parses from a cfg file
    p = tmp_path / "t.cfg"
    p.write_text("FEATURE_NORM:1\n")
    assert InputInfo.from_cfg_file(str(p)).feature_norm is True
