"""XLA segment-op backend for the graph operator zoo.

Each function maps to a reference op pair (forward/backward); JAX autodiff
supplies the backward, which coincides with the reference's hand-written
transposed op:

* ``scatter_src``        ↔ SingleCPUSrcScatterOp / DistScatterSrc
                           (ref: core/ntsSingleCPUGraphOp.hpp:94-147)
* ``scatter_dst``        ↔ DistScatterDst (ref: core/ntsDistCPUGraphOp.hpp:186-242)
* ``scatter_src_dst``    ↔ SingleCPUSrcDstScatterOp
                           (ref: core/ntsSingleCPUGraphOp.hpp:34-92)
* ``aggregate_dst_sum``  ↔ SingleCPUDstAggregateOp / DistAggregateDst
                           (ref: core/ntsSingleCPUGraphOp.hpp:149-204)
* ``aggregate_dst_min/max`` ↔ SingleCPUDstAggregateOpMin/Max — gradient routed
                           to the *first* extremal edge, matching the
                           reference's ``record[]`` + ``nts_assign`` semantics
                           (ref: core/ntsSingleCPUGraphOp.hpp:206-340)
* ``edge_softmax``       ↔ SingleEdgeSoftMax / DistEdgeSoftMax
                           (ref: core/ntsSingleCPUGraphOp.hpp:343-407)
* ``spmm``               ↔ ForwardCPUfuseOp / aggregate_kernel_from_src_with_weight
                           (ref: core/ntsCPUFusedGraphOp.hpp:34-109,
                            cuda/ntsCUDAFuseKernel.cuh:147-208); with a
                           per-edge weight *input* it is DistAggregateDstFuseWeight
                           whose weight-gradient is the SDDMM
                           (ref: core/ntsDistCPUGraphOp.hpp:499-594)

Conventions: edge arrays are in **forward (dst-sorted) order**; ``dst_ids`` is
non-decreasing so segment reductions run with ``indices_are_sorted=True``.
``num_vertices`` must be static (Python int) for XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def scatter_src(x: jax.Array, src_ids: jax.Array) -> jax.Array:
    """V→E: per-edge source features. [V,F] → [E,F]."""
    return jnp.take(x, src_ids, axis=0)


def scatter_dst(x: jax.Array, dst_ids: jax.Array) -> jax.Array:
    """V→E: per-edge destination features. [V,F] → [E,F]."""
    return jnp.take(x, dst_ids, axis=0)


def scatter_src_dst(x: jax.Array, src_ids: jax.Array, dst_ids: jax.Array
                    ) -> jax.Array:
    """V→E: per-edge concat [h_src ∥ h_dst]. [V,F] → [E,2F]."""
    return jnp.concatenate(
        [jnp.take(x, src_ids, axis=0), jnp.take(x, dst_ids, axis=0)], axis=-1)


def aggregate_dst_sum(edge_val: jax.Array, dst_ids: jax.Array,
                      num_vertices: int) -> jax.Array:
    """E→V: sum per-edge values into dst rows. [E,...] → [V,...]."""
    return jax.ops.segment_sum(edge_val, dst_ids, num_segments=num_vertices,
                               indices_are_sorted=True)


def aggregate_dst_mean(edge_val: jax.Array, dst_ids: jax.Array,
                       num_vertices: int) -> jax.Array:
    """E→V mean (sum / indegree, 0-degree guarded)."""
    s = aggregate_dst_sum(edge_val, dst_ids, num_vertices)
    # count in f32 regardless of edge_val dtype: a bf16 running count
    # saturates at 256 (1000 ones sum to 256 in bf16), corrupting the
    # mean for high-degree vertices
    cnt = jax.ops.segment_sum(jnp.ones_like(dst_ids, dtype=jnp.float32),
                              dst_ids, num_segments=num_vertices,
                              indices_are_sorted=True)
    cnt = jnp.maximum(cnt, 1).astype(s.dtype)
    return s / cnt.reshape((-1,) + (1,) * (s.ndim - 1))


def _first_extremal_mask(edge_val, dst_ids, extremal, num_edges):
    """Boolean [E,...]: edge is the FIRST one attaining its segment's
    extremal value (ties broken by lowest edge index, matching the
    reference's strict-< replacement in nts_min, core/ntsBaseOp.hpp:135-145)."""
    is_ext = edge_val == jnp.take(extremal, dst_ids, axis=0)
    eidx = jnp.arange(num_edges, dtype=jnp.int32)
    eidx = eidx.reshape((-1,) + (1,) * (edge_val.ndim - 1))
    cand = jnp.where(is_ext, eidx, num_edges)
    winner = jax.ops.segment_min(cand, dst_ids, num_segments=extremal.shape[0],
                                 indices_are_sorted=True)
    return eidx == jnp.take(winner, dst_ids, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def aggregate_dst_min(edge_val, dst_ids, num_vertices):
    """E→V elementwise min per feature lane; empty segments give 0
    (the reference never aggregates isolated vertices; we zero them)."""
    m = jax.ops.segment_min(edge_val, dst_ids, num_segments=num_vertices,
                            indices_are_sorted=True)
    cnt = jax.ops.segment_sum(jnp.ones_like(dst_ids), dst_ids,
                              num_segments=num_vertices, indices_are_sorted=True)
    return jnp.where((cnt > 0).reshape((-1,) + (1,) * (m.ndim - 1)), m, 0)


def _agg_min_fwd(edge_val, dst_ids, num_vertices):
    out = aggregate_dst_min(edge_val, dst_ids, num_vertices)
    return out, (edge_val, dst_ids, out)


def _agg_min_bwd(num_vertices, res, g):
    edge_val, dst_ids, out = res
    mask = _first_extremal_mask(edge_val, dst_ids, out, edge_val.shape[0])
    ge = jnp.take(g, dst_ids, axis=0)
    return (jnp.where(mask, ge, 0).astype(edge_val.dtype), None)


aggregate_dst_min.defvjp(_agg_min_fwd, _agg_min_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def aggregate_dst_max(edge_val, dst_ids, num_vertices):
    """E→V elementwise max per feature lane; empty segments give 0."""
    m = jax.ops.segment_max(edge_val, dst_ids, num_segments=num_vertices,
                            indices_are_sorted=True)
    cnt = jax.ops.segment_sum(jnp.ones_like(dst_ids), dst_ids,
                              num_segments=num_vertices, indices_are_sorted=True)
    return jnp.where((cnt > 0).reshape((-1,) + (1,) * (m.ndim - 1)), m, 0)


def _agg_max_fwd(edge_val, dst_ids, num_vertices):
    out = aggregate_dst_max(edge_val, dst_ids, num_vertices)
    return out, (edge_val, dst_ids, out)


def _agg_max_bwd(num_vertices, res, g):
    edge_val, dst_ids, out = res
    mask = _first_extremal_mask(edge_val, dst_ids, out, edge_val.shape[0])
    ge = jnp.take(g, dst_ids, axis=0)
    return (jnp.where(mask, ge, 0).astype(edge_val.dtype), None)


aggregate_dst_max.defvjp(_agg_max_fwd, _agg_max_bwd)


def _masked_extremal(edge_val, dst_ids, valid, num_vertices, op):
    """Shared forward for the masked min/max: invalid edges are pushed to
    the losing extreme and rows with NO valid edge give 0."""
    big = jnp.asarray(jnp.finfo(edge_val.dtype).max
                      if op == "min" else -jnp.finfo(edge_val.dtype).max,
                      edge_val.dtype)
    vmask = valid.reshape((-1,) + (1,) * (edge_val.ndim - 1))
    mv = jnp.where(vmask, edge_val, big)
    seg = jax.ops.segment_min if op == "min" else jax.ops.segment_max
    m = seg(mv, dst_ids, num_segments=num_vertices, indices_are_sorted=True)
    cnt = jax.ops.segment_sum(valid.astype(jnp.int32), dst_ids,
                              num_segments=num_vertices,
                              indices_are_sorted=True)
    return jnp.where((cnt > 0).reshape((-1,) + (1,) * (m.ndim - 1)), m, 0)


def _masked_extremal_bwd(edge_val, dst_ids, valid, out, g):
    """Grad routed to the FIRST valid extremal edge per segment/lane
    (the reference's record[] + nts_assign semantics)."""
    num_edges = edge_val.shape[0]
    vmask = valid.reshape((-1,) + (1,) * (edge_val.ndim - 1))
    is_ext = vmask & (edge_val == jnp.take(out, dst_ids, axis=0))
    eidx = jnp.arange(num_edges, dtype=jnp.int32)
    eidx = eidx.reshape((-1,) + (1,) * (edge_val.ndim - 1))
    cand = jnp.where(is_ext, eidx, num_edges)
    winner = jax.ops.segment_min(cand, dst_ids, num_segments=out.shape[0],
                                 indices_are_sorted=True)
    mask = eidx == jnp.take(winner, dst_ids, axis=0)
    ge = jnp.take(g, dst_ids, axis=0)
    return jnp.where(mask, ge, 0).astype(edge_val.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def aggregate_dst_min_masked(edge_val, dst_ids, valid, num_vertices):
    """Masked E→V min for engines with padding edges (the distributed ELL
    edge arrays): ``valid`` [E] bool excludes padding from both the value
    and the empty-segment count. Matches DistAggregateDstMin semantics
    (ref: core/ntsDistCPUGraphOp.hpp:306-372)."""
    return _masked_extremal(edge_val, dst_ids, valid, num_vertices, "min")


def _agg_minm_fwd(edge_val, dst_ids, valid, num_vertices):
    out = aggregate_dst_min_masked(edge_val, dst_ids, valid, num_vertices)
    return out, (edge_val, dst_ids, valid, out)


def _agg_minm_bwd(num_vertices, res, g):
    edge_val, dst_ids, valid, out = res
    return (_masked_extremal_bwd(edge_val, dst_ids, valid, out, g),
            None, None)


aggregate_dst_min_masked.defvjp(_agg_minm_fwd, _agg_minm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def aggregate_dst_max_masked(edge_val, dst_ids, valid, num_vertices):
    """Masked E→V max (DistAggregateDstMax,
    ref: core/ntsDistCPUGraphOp.hpp:374-440); see aggregate_dst_min_masked."""
    return _masked_extremal(edge_val, dst_ids, valid, num_vertices, "max")


def _agg_maxm_fwd(edge_val, dst_ids, valid, num_vertices):
    out = aggregate_dst_max_masked(edge_val, dst_ids, valid, num_vertices)
    return out, (edge_val, dst_ids, valid, out)


def _agg_maxm_bwd(num_vertices, res, g):
    edge_val, dst_ids, valid, out = res
    return (_masked_extremal_bwd(edge_val, dst_ids, valid, out, g),
            None, None)


aggregate_dst_max_masked.defvjp(_agg_maxm_fwd, _agg_maxm_bwd)


def edge_softmax(edge_val: jax.Array, dst_ids: jax.Array, num_vertices: int
                 ) -> jax.Array:
    """Per-dst-segment softmax over incoming edges (numerically stabilized by
    segment max). Autodiff yields the segment softmax VJP
    ``(s∘g) − s·(gᵀs)`` the reference hand-writes
    (ref: core/ntsSingleCPUGraphOp.hpp:381-406)."""
    m = jax.ops.segment_max(edge_val, dst_ids, num_segments=num_vertices,
                            indices_are_sorted=True)
    # empty segments produce -inf maxima; out-of-range (padding) edge ids
    # clip in the take below and would hit them → exp(+inf). Zero them.
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    m = jax.lax.stop_gradient(m)
    z = jnp.exp(edge_val - jnp.take(m, dst_ids, axis=0))
    denom = jax.ops.segment_sum(z, dst_ids, num_segments=num_vertices,
                                indices_are_sorted=True)
    denom = jnp.maximum(denom, jnp.finfo(edge_val.dtype).tiny)
    return z / jnp.take(denom, dst_ids, axis=0)


def spmm(edge_weight: jax.Array, x: jax.Array, src_ids: jax.Array,
         dst_ids: jax.Array, num_dst: int) -> jax.Array:
    """Edge-weighted aggregate Y[d] = Σ_{e: dst(e)=d} w_e · X[src(e)].

    [E] or [E,1] weights × [V,F] features → [num_dst, F]. The fused GCN
    aggregation (ForwardCPUfuseOp) when w = norm_degree; the GAT attention
    aggregation (DistAggregateDstFuseWeight) when w = softmax scores.
    Gradients: d/dX = transposed SpMM, d/dw = SDDMM dot(h_src, g_dst) — both
    derived by autodiff here, hand-written in the reference
    (core/ntsDistCPUGraphOp.hpp:553-591).
    """
    w = edge_weight.reshape((-1,) + (1,) * (x.ndim - 1))
    msg = w * jnp.take(x, src_ids, axis=0)
    return jax.ops.segment_sum(msg, dst_ids, num_segments=num_dst,
                               indices_are_sorted=True)


def spmm_transpose(edge_weight: jax.Array, y_grad: jax.Array,
                   src_ids: jax.Array, dst_ids: jax.Array, num_src: int
                   ) -> jax.Array:
    """Explicit transposed SpMM: G[s] = Σ_{e: src(e)=s} w_e · dY[dst(e)].

    Exposed for tests and for the Pallas backward which prefers the CSR
    (src-sorted) ordering (pass src-sorted arrays + indices sorted)."""
    w = edge_weight.reshape((-1,) + (1,) * (y_grad.ndim - 1))
    msg = w * jnp.take(y_grad, dst_ids, axis=0)
    return jax.ops.segment_sum(msg, src_ids, num_segments=num_src)


def sddmm_dot(a: jax.Array, b: jax.Array, src_ids: jax.Array,
              dst_ids: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul: per-edge dot(a[src(e)], b[dst(e)]) → [E].

    The reference computes this inside DistAggregateDstFuseWeight::backward
    for edge-weight gradients (core/ntsDistCPUGraphOp.hpp:566-585)."""
    return jnp.sum(jnp.take(a, src_ids, axis=0) * jnp.take(b, dst_ids, axis=0),
                   axis=-1)
