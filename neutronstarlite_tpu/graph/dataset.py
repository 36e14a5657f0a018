"""GNNDatum equivalent: bundles graph + features/labels/masks from a cfg.

Ref: core/ntsDataloador.hpp:29-305 (GNNDatum) + the model init_nn sequence
(toolkits/GCN_CPU.hpp:80-140): read edge file, read or randomly generate
features/labels/masks, register them as tensors.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph import io
from neutronstarlite_tpu.graph.structure import Graph, build_graph


@dataclasses.dataclass
class GNNDatum:
    graph: Graph
    features: np.ndarray   # [V, F] float32
    labels: np.ndarray     # [V] int32
    masks: np.ndarray      # [V] int32 (0 train / 1 val / 2 test)
    num_classes: int

    @property
    def num_vertices(self) -> int:
        return self.graph.num_vertices


def load_dataset(config: InputInfo, weight: str = "norm_degree") -> GNNDatum:
    """Load everything a model needs from a reference-format cfg."""
    sizes = config.layer_sizes
    if len(sizes) < 2:
        raise ValueError(f"LAYERS must have >=2 entries, got {config.layer_string!r}")
    feat_dim, num_classes = sizes[0], sizes[-1]
    v = config.vertices

    src, dst = io.read_edge_file(config.edge_file, v)
    graph = build_graph(src, dst, v, weight=weight)

    if config.feature_file == "random":
        feats, labels, masks = io.random_generate(v, feat_dim, num_classes,
                                                  seed=config.seed)
        # prefer real labels/masks when present even if features are random
        if config.label_file and os.path.exists(config.label_file):
            labels = io.read_labels(config.label_file, v)
        if config.mask_file and os.path.exists(config.mask_file):
            masks = io.read_masks(config.mask_file, v)
    else:
        # A typo'd path must NOT silently train on random data (ADVICE.md r1):
        # only the literal FEATURE_FILE:random opts into generated data.
        if not os.path.exists(config.feature_file):
            raise FileNotFoundError(
                f"FEATURE_FILE {config.feature_file!r} does not exist "
                "(use FEATURE_FILE:random for generated features)")
        feats = io.read_features(config.feature_file, v, feat_dim)
        labels = io.read_labels(config.label_file, v)
        masks = io.read_masks(config.mask_file, v)

    if getattr(config, "feature_norm", False):
        # FEATURE_NORM:1 — per-feature standardization at load (ours; the
        # reference trains on raw tables). Models without batchnorm
        # (CommNet/GAT/SAGE/GGCN, matching the reference toolkits) are
        # fragile on unnormalized real features: measured on digits21k,
        # raw 0-16 features kill CommNet outright (relu death at lr 0.01)
        # while the standardized table trains normally.
        mu = feats.mean(axis=0, keepdims=True)
        sd = feats.std(axis=0, keepdims=True)
        feats = ((feats - mu) / np.maximum(sd, 1e-6)).astype(np.float32)

    return GNNDatum(graph=graph, features=feats, labels=labels, masks=masks,
                    num_classes=num_classes)


def synthetic_sbm_dataset(num_vertices: int, feat_dim: int, num_classes: int,
                          avg_degree: int = 10, homophily: float = 0.9,
                          seed: int = 0, feature_noise: float = 1.0
                          ) -> GNNDatum:
    """Stochastic-block-model synthetic dataset for convergence tests.

    Labels define communities; edges prefer same-community endpoints with
    probability ``homophily``; features = noisy one-hot(label) lift. A correct
    GCN reaches high accuracy quickly — this replaces the reference's
    "convergence as test" strategy (SURVEY.md §4.4) without needing the Cora
    feature table.
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=num_vertices).astype(np.int32)
    e = num_vertices * avg_degree
    src = rng.integers(0, num_vertices, size=e).astype(np.int32)
    same = rng.random(e) < homophily
    # same-community partner: random vertex of same label (approx via resample)
    by_label = [np.nonzero(labels == c)[0] for c in range(num_classes)]
    dst = rng.integers(0, num_vertices, size=e).astype(np.int32)
    for c in range(num_classes):
        sel = same & (labels[src] == c)
        pool = by_label[c]
        if pool.size:
            dst[sel] = pool[rng.integers(0, pool.size, size=int(sel.sum()))]
    # add self loops like the reference's .self edge files
    from neutronstarlite_tpu.graph.structure import add_self_loops
    src, dst = add_self_loops(src, dst, num_vertices)
    graph = build_graph(src, dst, num_vertices, weight="norm_degree")

    onehot = np.eye(num_classes, dtype=np.float32)[labels]
    lift = rng.standard_normal((num_classes, feat_dim)).astype(np.float32)
    feats = onehot @ lift + feature_noise * rng.standard_normal(
        (num_vertices, feat_dim)).astype(np.float32)

    u = rng.random(num_vertices)
    masks = np.full(num_vertices, io.MASK_TEST, dtype=np.int32)
    masks[u < 0.6] = io.MASK_TRAIN
    masks[(u >= 0.6) & (u < 0.8)] = io.MASK_VAL
    return GNNDatum(graph=graph, features=feats, labels=labels, masks=masks,
                    num_classes=num_classes)
