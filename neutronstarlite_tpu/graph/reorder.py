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


def random_shuffle(datum: GNNDatum, seed: int = 0, return_perm: bool = False):
    perm = np.random.default_rng(seed).permutation(
        datum.num_vertices).astype(np.int32)
    out = permute_dataset(datum, perm)
    return (out, perm) if return_perm else out


def degree_sort(datum: GNNDatum) -> GNNDatum:
    """Hubs (by out-degree) get the lowest ids."""
    order = np.argsort(-datum.graph.out_degree, kind="stable")
    perm = np.empty(datum.num_vertices, np.int32)
    perm[order] = np.arange(datum.num_vertices, dtype=np.int32)
    return permute_dataset(datum, perm)


def _fennel_owner_np(g: Graph, p: int, gamma: float, slack: float,
                     passes: int, order: np.ndarray) -> np.ndarray:
    """Pure-numpy Fennel fallback (per-vertex loop; fine for test-sized
    graphs — the native nsl_fennel covers production scales)."""
    v = g.num_vertices
    alpha = (p ** (gamma - 1.0)) * g.num_edges / (v ** gamma)
    cap = int(slack * (-(-v // p))) + 1
    load = np.zeros(p, np.int64)
    owner = np.full(v, -1, np.int32)
    in_off, in_nbr = g.fwd_offsets, g.fwd_src
    out_off, out_nbr = g.bwd_offsets, g.bwd_dst
    for u in np.tile(order, passes):
        if owner[u] >= 0:
            load[owner[u]] -= 1  # re-evaluate on later passes
            owner[u] = -1        # self-loops must not count the stale owner
        nbrs = np.concatenate([
            in_nbr[in_off[u]:in_off[u + 1]],
            out_nbr[out_off[u]:out_off[u + 1]]])
        own = owner[nbrs]
        cnt = np.bincount(own[own >= 0], minlength=p).astype(np.float64)
        score = cnt - alpha * gamma * np.power(load.astype(np.float64),
                                               gamma - 1.0)
        score[load >= cap] = -np.inf
        # tie-break toward the lighter load (matches nsl_fennel)
        best = np.lexsort((load, -score))[0]
        if load[best] >= cap:   # every partition at cap: least-loaded
            best = int(np.argmin(load))
        owner[u] = best
        load[best] += 1
    return owner


def fennel_partition(datum: GNNDatum, num_partitions: int,
                     gamma: float = 1.5, slack: float = 1.1,
                     passes: int = 4, seed: int = 0,
                     return_perm: bool = False):
    """Fennel streaming partition (Tsourakakis et al., WSDM'14) adapted to
    the contiguous-range engine: compute an owner per vertex over the
    UNDIRECTED neighborhood, then relabel so each partition's vertices are
    consecutive. Beyond-reference capability — the reference only has the
    contiguous locality-aware range split (core/graph.hpp:1185-1213), which
    ignores edge locality entirely; on clustered graphs Fennel cuts the
    mirror sets (and therefore every boundary exchange) substantially.

    Returns (relabeled datum, Partition). Enabled via ``PARTITION:fennel``.
    """
    from neutronstarlite_tpu import native
    from neutronstarlite_tpu.graph.partition import Partition

    if slack < 1.0:
        raise ValueError(
            f"fennel slack must be >= 1 (capacity p*slack*ceil(V/p) must "
            f"cover all V vertices); got {slack}")
    g = datum.graph
    v = g.num_vertices
    p = num_partitions
    # random stream order (degree-ordered streams admit adversarial tails;
    # random is the paper's robust default)
    order = np.random.default_rng(seed).permutation(v).astype(np.int32)
    owner = native.fennel(g.fwd_offsets, g.fwd_src, g.bwd_offsets,
                          g.bwd_dst, v, p, gamma, slack, passes, order)
    if owner is None:
        owner = _fennel_owner_np(g, p, gamma, slack, passes, order)

    # group by owner → contiguous ranges (stable within a partition)
    perm_order = np.argsort(owner, kind="stable")  # new order of old ids
    perm = np.empty(v, np.int32)
    perm[perm_order] = np.arange(v, dtype=np.int32)
    counts = np.bincount(owner, minlength=p).astype(np.int64)
    offsets = np.zeros(p + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    new_owner = np.zeros(v, np.int32)
    for i in range(p):
        new_owner[offsets[i]:offsets[i + 1]] = i
    pad_multiple = 8
    v_pad = -(-max(int(counts.max()), 1) // pad_multiple) * pad_multiple
    part = Partition(num_partitions=p, offsets=offsets, owner=new_owner,
                     local_counts=counts, v_pad=v_pad)
    out = permute_dataset(datum, perm)
    return (out, part, perm) if return_perm else (out, part)
