"""Vertex reordering / relabeling.

Two uses:

* **Mirror balancing for DepComm** (``random_shuffle``): the reference's
  contiguous locality-aware partition (graph.hpp:1185-1213) concentrates
  power-law hubs in few partitions; with the TPU's statically-padded
  all_to_all that skews per-pair mirror counts and inflates ``m_pad`` (the
  uniform pad). A random relabeling spreads hubs evenly — measured 32-40%
  less padded exchange on zipf graphs (tools/analyze_comm.py). Enabled via
  the ``SHUFFLE_VERTICES:1`` cfg key for distributed runs.
* **Locality for gathers** (``degree_sort``): hubs first — marginal effect
  measured on v5e (tools/bench_variants.py), provided for experimentation.

Relabeling permutes vertex ids consistently across the graph and all vertex
data; all metrics are permutation-invariant.
"""

from __future__ import annotations

import numpy as np

from neutronstarlite_tpu.graph.dataset import GNNDatum
from neutronstarlite_tpu.graph.structure import Graph, build_graph


def permute_graph(g: Graph, perm: np.ndarray) -> Graph:
    """Relabel vertices: new id of vertex v is perm[v]."""
    e = g.num_edges
    src = np.empty(e, np.int32)
    dst = np.empty(e, np.int32)
    w = np.empty(e, np.float32)
    # recover original edge order, then relabel
    src[g.fwd_eid] = perm[g.fwd_src].astype(np.int32)
    dst[g.fwd_eid] = perm[g.fwd_dst].astype(np.int32)
    w[g.fwd_eid] = g.fwd_weight
    return build_graph(src, dst, g.num_vertices, weight=w)


def permute_dataset(datum: GNNDatum, perm: np.ndarray) -> GNNDatum:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return GNNDatum(
        graph=permute_graph(datum.graph, perm),
        features=datum.features[inv],
        labels=datum.labels[inv],
        masks=datum.masks[inv],
        num_classes=datum.num_classes)


def random_shuffle(datum: GNNDatum, seed: int = 0) -> GNNDatum:
    perm = np.random.default_rng(seed).permutation(
        datum.num_vertices).astype(np.int32)
    return permute_dataset(datum, perm)


def degree_sort(datum: GNNDatum) -> GNNDatum:
    """Hubs (by out-degree) get the lowest ids."""
    order = np.argsort(-datum.graph.out_degree, kind="stable")
    perm = np.empty(datum.num_vertices, np.int32)
    perm[order] = np.arange(datum.num_vertices, dtype=np.int32)
    return permute_dataset(datum, perm)
