"""Graph structure: degrees, dual CSC/CSR orderings, normalized edge weights.

Re-creates (TPU-first) what the reference builds in ``Graph<E>::load_directed``
+ ``generate_backward_structure`` (ref: core/graph.hpp:1127-1826, 4203-4404)
and ``PartitionedGraph::PartitionToChunks`` (ref: core/PartitionedGraph.hpp:324-420):

* forward ordering = edges sorted by dst (CSC) with per-edge weights — feeds
  the aggregation "sparse_slot" loop / forward SpMM;
* backward ordering = the same edges sorted by src (CSR) with separately
  stored weights — feeds the transposed gradient SpMM.

Both orderings are materialized because the Pallas/XLA kernels want
memory-contiguous segments per output row in *their own* direction, exactly
the reason the reference stores both (SURVEY.md §7.1.4).

Everything here is host-side numpy producing static-shape arrays; the arrays
move to device untouched.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Graph:
    """An immutable, preprocessed graph ready for device ops.

    All index arrays are int32 (TPU-native integer width; the reference uses
    uint32 ``VertexId``, dep/gemini/type.hpp:28).
    """

    num_vertices: int
    num_edges: int

    # degrees over the *whole* graph (ref: graph.hpp:1144-1181 allreduce)
    in_degree: np.ndarray    # [V] int32, == #edges with dst=v
    out_degree: np.ndarray   # [V] int32, == #edges with src=v

    # forward (CSC, dst-major) ordering
    fwd_src: np.ndarray      # [E] int32, src of edge e (sorted by dst)
    fwd_dst: np.ndarray      # [E] int32, dst of edge e (non-decreasing)
    fwd_offsets: np.ndarray  # [V+1] int64 column_offset: edges of dst v are [off[v], off[v+1])
    fwd_weight: np.ndarray   # [E] float32 norm weight in forward order

    # backward (CSR, src-major) ordering of the SAME edges
    bwd_src: np.ndarray      # [E] int32 (non-decreasing)
    bwd_dst: np.ndarray      # [E] int32
    bwd_offsets: np.ndarray  # [V+1] int64 row_offset
    bwd_weight: np.ndarray   # [E] float32 norm weight in backward order

    # original-edge ids per ordering (fwd edge j == input edge fwd_eid[j]);
    # aligns the two orderings for the ELL slot permutation (ops/ell.py)
    fwd_eid: np.ndarray = None
    bwd_eid: np.ndarray = None

    def edge_segments_fwd(self) -> np.ndarray:
        """Per-edge dst segment ids in forward order (== fwd_dst)."""
        return self.fwd_dst


def norm_degree_weight(src: np.ndarray, dst: np.ndarray,
                       out_degree: np.ndarray, in_degree: np.ndarray
                       ) -> np.ndarray:
    """Symmetric GCN normalization w(s,d) = 1/sqrt(outdeg(s) * indeg(d)).

    Ref: ``nts_norm_degree`` core/ntsBaseOp.hpp:194-197 (the weight_compute
    callback passed to PartitionedGraph::GenerateAll in every model).
    Degrees of 0 are guarded to 1 (cannot occur on self-loop datasets).
    """
    od = np.maximum(out_degree[src], 1).astype(np.float32)
    idg = np.maximum(in_degree[dst], 1).astype(np.float32)
    return 1.0 / np.sqrt(od * idg)


def build_graph(src: np.ndarray, dst: np.ndarray, num_vertices: int,
                weight: str | np.ndarray = "norm_degree") -> Graph:
    """Build dual-ordered graph structure from an edge list.

    ``weight``: "norm_degree" (GCN symmetric norm), "ones", or an explicit
    per-edge float array aligned with the input edge order.
    """
    from neutronstarlite_tpu import native

    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    num_edges = src.size
    v = num_vertices

    if native.available():
        out_degree = native.degree(src, v)
        in_degree = native.degree(dst, v)
    else:
        out_degree = np.bincount(src, minlength=v).astype(np.int32)
        in_degree = np.bincount(dst, minlength=v).astype(np.int32)

    if isinstance(weight, str):
        if weight == "norm_degree":
            w = norm_degree_weight(src, dst, out_degree, in_degree)
        elif weight == "ones":
            w = np.ones(num_edges, dtype=np.float32)
        else:
            raise ValueError(f"unknown weight scheme {weight!r}")
    else:
        w = np.ascontiguousarray(weight, dtype=np.float32)

    # forward: stable sort by dst (keeps file order within a segment,
    # matching the reference's per-dst edge order from CSC construction)
    if native.available():
        fwd_offsets, fwd_perm = native.sort_edges(dst, v)
        bwd_offsets, bwd_perm = native.sort_edges(src, v)
    else:
        fwd_perm = np.argsort(dst, kind="stable")
        fwd_offsets = np.zeros(v + 1, dtype=np.int64)
        np.cumsum(np.bincount(dst, minlength=v), out=fwd_offsets[1:])
        bwd_perm = np.argsort(src, kind="stable")
        bwd_offsets = np.zeros(v + 1, dtype=np.int64)
        np.cumsum(np.bincount(src, minlength=v), out=bwd_offsets[1:])
    fwd_src, fwd_dst, fwd_w = src[fwd_perm], dst[fwd_perm], w[fwd_perm]
    bwd_src, bwd_dst, bwd_w = src[bwd_perm], dst[bwd_perm], w[bwd_perm]

    return Graph(
        num_vertices=v, num_edges=num_edges,
        in_degree=in_degree, out_degree=out_degree,
        fwd_src=fwd_src, fwd_dst=fwd_dst, fwd_offsets=fwd_offsets,
        fwd_weight=fwd_w,
        bwd_src=bwd_src, bwd_dst=bwd_dst, bwd_offsets=bwd_offsets,
        bwd_weight=bwd_w,
        fwd_eid=np.ascontiguousarray(fwd_perm, dtype=np.int64),
        bwd_eid=np.ascontiguousarray(bwd_perm, dtype=np.int64),
    )


def add_self_loops(src: np.ndarray, dst: np.ndarray, num_vertices: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Append (v, v) for every vertex missing a self loop (the reference
    ships ``*.edge.self`` files pre-augmented by data/generate_nts_dataset.py)."""
    has_self = np.zeros(num_vertices, dtype=bool)
    has_self[src[src == dst]] = True
    missing = np.nonzero(~has_self)[0].astype(np.int32)
    return (np.concatenate([src, missing]), np.concatenate([dst, missing]))
