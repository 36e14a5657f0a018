"""ELL graph representation: the TPU-native sparse format for all graph ops.

Everything on a TPU wants dense, statically-shaped, scatter-free compute.
This module re-casts the reference's CSC/CSR chunks (core/GraphSegment.h:52-139)
into a dual ELLPACK layout where *every* graph operator — SpMM forward, its
transposed gradient, and the whole fused GAT attention layer — becomes
gathers + dense [rows, K] vector ops, with scatters only over the tiny set
of row-split virtual rows:

* **Base slab** ``idx/w [V_pad, K]``: row r's first K edges; K minimizes
  padded work over the degree histogram (see ``choose_k``).
* **Row-split tail** ``tail_idx/tail_w [Rv, K]`` + ``tail_rows [Rv]``: hub
  rows' extra edges as virtual rows, combined by per-virtual-row
  ``segment_sum`` (Rv ≪ E, so the scatter is tiny — critical because TPU
  scatter cost scales with update count).
* **Backward slabs** over the src-major (CSR) ordering, the reference's
  separately-materialized backward structure (core/graph.hpp:4203-4404).
* **Slot permutation** ``b_perm``: for each backward slot, the flat position
  of the same edge in the forward slabs. Gradients that the reference
  computes with hand-written transposed ops — and that naive autodiff would
  turn into E-sized scatters — become *gathers through the permutation*.

The fused attention op (``attention_aggregate``) is the TPU answer to the
reference's GAT chain (scatter → edge NN → edge softmax → mask → aggregate,
toolkits/GAT_CPU_DIST.hpp:181-215, cuda/ntsCUDADistKernel.cuh edge_softmax
kernels): one custom-VJP op, no [E]-shaped HBM intermediates, softmax as a
dense masked row softmax with logsumexp combine across row splits.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# K selection
# ---------------------------------------------------------------------------

def choose_k(deg: np.ndarray, ell_cap: int = 256, beta: float = 32.0) -> int:
    """Slot width minimizing (V + tail_rows)·K + β·tail_rows, computed
    exactly from the degree histogram; β models per-virtual-row scatter +
    launch overhead (slot-equivalents, measured on v5e)."""
    if deg.size == 0:
        return 8
    cap = max(8, (ell_cap // 8) * 8)
    best_k, best_cost = 8, None
    v = deg.size
    for k in range(8, cap + 1, 8):
        over = deg - k
        over = over[over > 0]
        tail_rows = float(np.ceil(over / k).sum()) if over.size else 0.0
        cost = (v + tail_rows) * k + beta * tail_rows
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
        if over.size == 0:
            break
    return best_k


# ---------------------------------------------------------------------------
# Vectorized slab packing
# ---------------------------------------------------------------------------

def pack_slab(offsets: np.ndarray, nbr: np.ndarray, w: np.ndarray,
              num_rows: int, k: int, pad_rows_to: int = 8):
    """Pack a row-sorted edge list into base + row-split tail slabs.

    Returns (idx, wgt, tail_idx, tail_w, tail_rows, pos) where ``pos[j]`` is
    the flat slab position of input edge j (base slab first, then tail;
    flat length = V_pad*K + Rv_pad*K).
    """
    e = nbr.size
    deg = np.diff(offsets[:num_rows + 1]).astype(np.int64)
    v_pad = -(-max(num_rows, 1) // pad_rows_to) * pad_rows_to

    row = np.repeat(np.arange(num_rows, dtype=np.int64), deg)
    rank = np.arange(e, dtype=np.int64) - np.repeat(offsets[:num_rows], deg)

    over = np.maximum(deg - k, 0)
    vrows = -(-over // k)                       # tail slices per row
    rv = int(vrows.sum())
    rv_pad = -(-rv // pad_rows_to) * pad_rows_to if rv else 0
    vstart = np.zeros(num_rows, np.int64)       # exclusive cumsum of vrows
    if num_rows > 1:
        np.cumsum(vrows[:-1], out=vstart[1:])

    idx = np.zeros((v_pad, k), np.int32)
    wgt = np.zeros((v_pad, k), np.float32)
    base_sel = rank < k
    idx[row[base_sel], rank[base_sel]] = nbr[base_sel]
    wgt[row[base_sel], rank[base_sel]] = w[base_sel]

    tail_idx = np.zeros((rv_pad, k), np.int32)
    tail_w = np.zeros((rv_pad, k), np.float32)
    # padding virtual rows get segment id num_rows: keeps the id array
    # sorted (segment ops run with indices_are_sorted=True) and out-of-range
    # ids are dropped by segment_sum/max rather than polluting row 0
    tail_rows = np.full(rv_pad, num_rows, np.int32)
    pos = np.empty(e, np.int64)
    base_size = v_pad * k
    pos[base_sel] = row[base_sel] * k + rank[base_sel]
    if rv:
        tsel = ~base_sel
        trank = rank[tsel] - k
        vrow = vstart[row[tsel]] + trank // k
        slot = trank % k
        tail_idx[vrow, slot] = nbr[tsel]
        tail_w[vrow, slot] = w[tsel]
        # tail_rows[vr] = real row of virtual row vr (sorted by construction)
        tail_rows[:rv] = np.repeat(np.arange(num_rows, dtype=np.int32), vrows)
        pos[tsel] = base_size + vrow * k + slot
    return idx, wgt, tail_idx, tail_w, tail_rows, pos


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllGraph:
    """Device-side dual-ELL graph (pytree; static metadata in aux)."""

    # forward (dst-major): aggregates INTO dst rows FROM src tables
    f_idx: jax.Array       # [Vd_pad, K] src ids
    f_w: jax.Array         # [Vd_pad, K]
    f_tail_idx: jax.Array  # [Rvf_pad, K]
    f_tail_w: jax.Array
    f_tail_rows: jax.Array  # [Rvf_pad] sorted dst rows
    # backward (src-major): aggregates INTO src rows FROM dst-grad tables
    b_idx: jax.Array       # [Vs_pad, Kb] dst ids
    b_w: jax.Array
    b_tail_idx: jax.Array
    b_tail_w: jax.Array
    b_tail_rows: jax.Array
    # permutation: flat fwd-slab position of each bwd slot's edge
    # (padding slots point at the trailing dummy position)
    b_perm: jax.Array      # [Vs_pad, Kb] int32
    b_tail_perm: jax.Array  # [Rvb_pad, Kb] int32
    # OPTIONAL global edge positions (the edge's index in the ORIGINAL,
    # pre-split edge list; padding slots = _WIN_NONE). Built for the
    # PROC_OVERLAP local/remote slab sets so extremal winners carry a
    # position comparable ACROSS sets — the first-extremal tie-break then
    # matches the unsplit engine exactly (the reference's record[] routing,
    # core/ntsDistCPUGraphOp.hpp:306-440, composes with its overlap
    # pipeline the same way). None on single-set graphs (flat slab
    # positions suffice there).
    f_gpos: Any = None       # [Vd_pad, K] int32
    f_tail_gpos: Any = None  # [Rvf_pad, K] int32
    b_gpos: Any = None       # [Vs_pad, Kb] int32
    b_tail_gpos: Any = None  # [Rvb_pad, Kb] int32
    num_dst: int = 0       # true dst rows (<= Vd_pad)
    num_src: int = 0       # true src rows
    # compute dtype for the gathered feature rows ("bfloat16" halves the
    # HBM gather traffic — the dominant SpMM cost; accumulation stays f32)
    agg_dtype: str = "float32"

    def tree_flatten(self):
        ch = (self.f_idx, self.f_w, self.f_tail_idx, self.f_tail_w,
              self.f_tail_rows, self.b_idx, self.b_w, self.b_tail_idx,
              self.b_tail_w, self.b_tail_rows, self.b_perm, self.b_tail_perm,
              self.f_gpos, self.f_tail_gpos, self.b_gpos, self.b_tail_gpos)
        return ch, (self.num_dst, self.num_src, self.agg_dtype)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, num_dst=aux[0], num_src=aux[1], agg_dtype=aux[2])

    def cast_in(self, x: jax.Array) -> jax.Array:
        if self.agg_dtype == "bfloat16":
            return x.astype(jnp.bfloat16)
        return x

    @property
    def flat_fwd_size(self) -> int:
        return (self.f_idx.shape[0] * self.f_idx.shape[1]
                + self.f_tail_idx.shape[0] * self.f_tail_idx.shape[1])


def build_ell_rect_np(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                      num_dst_rows: int, num_src_rows: int,
                      ell_cap: int = 256, kf: int | None = None,
                      kb: int | None = None,
                      gpos: np.ndarray | None = None) -> dict:
    """Build the dual-ELL slabs for a (possibly rectangular) edge set as
    host numpy arrays — the general form used per-device by the distributed
    engine (dst rows = local vertices, src rows = combined
    local∪mirror∪hot table).

    ``kf``/``kb`` override slot widths (the SPMD engine needs identical
    shapes on every device). ``gpos`` (optional, [E] int): each edge's
    GLOBAL position in the original pre-split edge list — packed into
    slot-aligned ``*_gpos`` slabs (padding = _WIN_NONE) so extremal
    winners merge across split slab sets with exact first-edge ties."""
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    w = np.ascontiguousarray(w, np.float32)
    e = src.size

    f_deg = np.bincount(dst, minlength=num_dst_rows)
    b_deg = np.bincount(src, minlength=num_src_rows)
    if kf is None:
        kf = choose_k(f_deg, ell_cap)
    if kb is None:
        kb = choose_k(b_deg, ell_cap)

    # both packs return positions in ORIGINAL edge order, so the backward
    # slot permutation is one scatter: b_perm_flat[b_pos] = f_pos
    f_idx, f_w, f_tidx, f_tw, f_trows, f_pos = _pack_slab_any(
        dst, src, w, f_deg, num_dst_rows, kf)
    b_idx, b_w, b_tidx, b_tw, b_trows, b_pos = _pack_slab_any(
        src, dst, w, b_deg, num_src_rows, kb)

    dummy = f_idx.size + f_tidx.size  # trailing dummy position
    b_perm_flat = np.full(b_idx.size + b_tidx.size, dummy, np.int64)
    b_perm_flat[b_pos] = f_pos

    out = {
        "f_idx": f_idx, "f_w": f_w, "f_tail_idx": f_tidx, "f_tail_w": f_tw,
        "f_tail_rows": f_trows,
        "b_idx": b_idx, "b_w": b_w, "b_tail_idx": b_tidx, "b_tail_w": b_tw,
        "b_tail_rows": b_trows,
        "b_perm": b_perm_flat[:b_idx.size].reshape(
            b_idx.shape).astype(np.int32),
        "b_tail_perm": b_perm_flat[b_idx.size:].reshape(
            b_tidx.shape if b_tidx.size else (0, b_idx.shape[1])
        ).astype(np.int32),
    }
    if gpos is not None:
        gpos = np.ascontiguousarray(gpos, np.int64)
        f_g = np.full(f_idx.size + f_tidx.size, _WIN_NONE, np.int64)
        f_g[f_pos] = gpos
        out["f_gpos"] = f_g[:f_idx.size].reshape(f_idx.shape).astype(np.int32)
        out["f_tail_gpos"] = f_g[f_idx.size:].reshape(
            f_tidx.shape if f_tidx.size else (0, f_idx.shape[1])
        ).astype(np.int32)
        b_g = np.full(b_idx.size + b_tidx.size, _WIN_NONE, np.int64)
        b_g[b_pos] = gpos
        out["b_gpos"] = b_g[:b_idx.size].reshape(b_idx.shape).astype(np.int32)
        out["b_tail_gpos"] = b_g[b_idx.size:].reshape(
            b_tidx.shape if b_tidx.size else (0, b_idx.shape[1])
        ).astype(np.int32)
    return out


def _pack_slab_any(key: np.ndarray, other: np.ndarray, w: np.ndarray,
                   deg: np.ndarray, num_rows: int, k: int):
    """Pack an UNSORTED edge list into base + tail slabs. Dispatches to the
    native single-pass packer (nsl_pack_slab — one sweep with per-row
    cursors, GIL-released so build_slab_set thread-pools it across
    devices) with the numpy stable-sort + pack_slab path as fallback; both
    produce identical slabs (within a row, slots follow original edge
    order). Returns (idx, wgt, tail_idx, tail_w, tail_rows, pos) with
    ``pos[j]`` = flat slab position of input edge j (ORIGINAL order)."""
    from neutronstarlite_tpu import native
    e = key.size
    v_pad = -(-max(num_rows, 1) // 8) * 8
    over = np.maximum(deg.astype(np.int64) - k, 0)
    rv = int((-(-over // k)).sum())
    rv_pad = -(-rv // 8) * 8 if rv else 0
    if native.available():
        idx = np.zeros((v_pad, k), np.int32)
        wgt = np.zeros((v_pad, k), np.float32)
        tail_idx = np.zeros((rv_pad, k), np.int32)
        tail_w = np.zeros((rv_pad, k), np.float32)
        tail_rows = np.full(rv_pad, num_rows, np.int32)
        pos = np.empty(max(e, 1), np.int64)
        if native.pack_slab(key, other, w, num_rows, k, v_pad, idx, wgt,
                            tail_idx, tail_w, tail_rows, pos):
            return idx, wgt, tail_idx, tail_w, tail_rows, pos[:e]
    perm = np.argsort(key, kind="stable")
    off = np.zeros(num_rows + 1, np.int64)
    np.cumsum(deg, out=off[1:])
    idx, wgt, ti, tw, trows, pos_sorted = pack_slab(
        off, other[perm], w[perm], num_rows, k)
    pos = np.empty(e, np.int64)
    pos[perm] = pos_sorted
    return idx, wgt, ti, tw, trows, pos


def ell_from_np(d: dict, num_dst: int, num_src: int,
                agg_dtype: str = "float32") -> EllGraph:
    dev = jnp.asarray
    return EllGraph(
        f_idx=dev(d["f_idx"]), f_w=dev(d["f_w"]),
        f_tail_idx=dev(d["f_tail_idx"]), f_tail_w=dev(d["f_tail_w"]),
        f_tail_rows=dev(d["f_tail_rows"]),
        b_idx=dev(d["b_idx"]), b_w=dev(d["b_w"]),
        b_tail_idx=dev(d["b_tail_idx"]), b_tail_w=dev(d["b_tail_w"]),
        b_tail_rows=dev(d["b_tail_rows"]),
        b_perm=dev(d["b_perm"]), b_tail_perm=dev(d["b_tail_perm"]),
        num_dst=num_dst, num_src=num_src, agg_dtype=agg_dtype)


def build_ell_graph(g, ell_cap: int = 256,
                    agg_dtype: str = "float32") -> EllGraph:
    """Build the dual-ELL representation from a structure.Graph."""
    fwd_eid = getattr(g, "fwd_eid", None)
    if fwd_eid is None:
        raise ValueError("Graph lacks fwd_eid (rebuild with current "
                         "build_graph)")
    # reconstruct the original edge order so both slab orderings align
    e = g.num_edges
    src = np.empty(e, np.int32)
    dst = np.empty(e, np.int32)
    w = np.empty(e, np.float32)
    src[fwd_eid] = g.fwd_src
    dst[fwd_eid] = g.fwd_dst
    w[fwd_eid] = g.fwd_weight
    v = g.num_vertices
    d = build_ell_rect_np(src, dst, w, v, v, ell_cap=ell_cap)
    return ell_from_np(d, v, v, agg_dtype)


# ---------------------------------------------------------------------------
# Dense slab compute primitives
# ---------------------------------------------------------------------------

import os

# 128 MB measured best on v5e (vs 32: −15% gather time; 512: flat) —
# r2 slab A/B, BASELINE.md
_BLOCK_GATHER_BUDGET = int(os.environ.get("NSL_GATHER_BUDGET_MB", "128"))    * 1024 * 1024


def configure(gather_budget_mb: int | None = None,
              gated_chunk_mb: int | None = None) -> None:
    """Engine tunables from the cfg system (GATHER_BUDGET_MB /
    GATED_CHUNK_MB keys — the reference routes ALL engine flags through
    InputInfo, core/GraphSegment.cpp:222-292). The NSL_* env vars keep
    precedence as measurement overrides; 0/None leaves the default.
    Called by the trainers before any tracing, so the values are baked
    into the compiled programs like any other static config."""
    global _BLOCK_GATHER_BUDGET, _GATED_CHUNK_BYTES
    if gather_budget_mb and "NSL_GATHER_BUDGET_MB" not in os.environ:
        _BLOCK_GATHER_BUDGET = int(gather_budget_mb) * 1024 * 1024
    if gated_chunk_mb and "NSL_GATED_CHUNK_MB" not in os.environ:
        _GATED_CHUNK_BYTES = int(gated_chunk_mb) * 2**20


def slab_matvec(idx: jax.Array, w: jax.Array, x: jax.Array) -> jax.Array:
    """out[r] = Σ_k w[r,k]·x[idx[r,k]], chunked so the gathered temp stays
    within a fixed byte budget.

    Block sizing is dtype-aware (bf16 temps are half the bytes → twice the
    rows per block); the 128 MB default budget is the measured sweet spot
    on v5e (32 MB costs ~15% gather time, 512 MB is flat — see BASELINE.md
    r2 slab A/B). einsum vs explicit multiply-reduce measured identical."""
    rows, k = idx.shape
    if rows == 0:
        return jnp.zeros((0, x.shape[-1]), x.dtype)
    f = x.shape[-1]
    bv = max(8, min(rows,
                    _BLOCK_GATHER_BUDGET // max(k * f * x.dtype.itemsize, 1)))
    bv = max(8, (bv // 8) * 8)

    def block(args):
        ib, wb = args
        g = jnp.take(x, ib, axis=0)                       # [bv, K, F]
        return jnp.einsum("vk,vkf->vf", wb, g,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    return _map_row_blocks(block, (idx, w), rows, bv)


def slab_sddmm(idx: jax.Array, valid: jax.Array, x: jax.Array,
               g_rows: jax.Array) -> jax.Array:
    """dm[r,k] = dot(x[idx[r,k]], g_rows[r]) for valid slots — the SDDMM in
    slab layout, chunked like slab_matvec."""
    rows, k = idx.shape
    if rows == 0:
        return jnp.zeros((0, k), g_rows.dtype)
    f = x.shape[-1]
    bv = max(8, min(rows,
                    _BLOCK_GATHER_BUDGET // max(k * f * x.dtype.itemsize, 1)))
    bv = max(8, (bv // 8) * 8)

    def dense(args):
        ib, vb, gb = args
        xt = jnp.take(x, ib, axis=0)                  # [bv, K, F]
        out = jnp.einsum("vkf,vf->vk", xt, gb,
                         preferred_element_type=jnp.float32)
        return jnp.where(vb, out, 0.0).astype(g_rows.dtype)

    return _map_row_blocks(dense, (idx, valid, g_rows), rows, bv)


def _tail_combine(base_rows: jax.Array, tail_vals: jax.Array,
                  tail_rows: jax.Array, num_rows: int, op: str = "sum"
                  ) -> jax.Array:
    """Combine per-virtual-row reductions into real rows (tiny scatter)."""
    if tail_vals.shape[0] == 0:
        return base_rows
    if op == "sum":
        t = jax.ops.segment_sum(tail_vals, tail_rows, num_segments=num_rows,
                                indices_are_sorted=True)
        return base_rows + t
    if op == "max":
        t = jax.ops.segment_max(tail_vals, tail_rows, num_segments=num_rows,
                                indices_are_sorted=True)
        return jnp.maximum(base_rows, t)
    raise ValueError(op)


# ---------------------------------------------------------------------------
# SpMM with static weights (GCN/GIN/CommNet aggregate)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def spmm(ell: EllGraph, x: jax.Array) -> jax.Array:
    """Y = Â·X over the forward slabs; VJP = same kernel over the backward
    slabs (the reference's dual-structure design, SURVEY.md §7.1.4)."""
    xc = ell.cast_in(x)
    out = slab_matvec(ell.f_idx, ell.f_w, xc)[:ell.num_dst]
    tail = slab_matvec(ell.f_tail_idx, ell.f_tail_w, xc)
    return _tail_combine(out, tail, ell.f_tail_rows,
                         ell.num_dst).astype(x.dtype)


def _spmm_fwd(ell, x):
    # zero-length residual carries x's dtype through the VJP
    return spmm(ell, x), (ell, jnp.zeros((0,), x.dtype))


def _spmm_bwd(res, g):
    ell, dtype_probe = res
    gc = ell.cast_in(g)
    dx = slab_matvec(ell.b_idx, ell.b_w, gc)[:ell.num_src]
    tail = slab_matvec(ell.b_tail_idx, ell.b_tail_w, gc)
    dx = _tail_combine(dx, tail, ell.b_tail_rows, ell.num_src)
    return None, dx.astype(dtype_probe.dtype)


spmm.defvjp(_spmm_fwd, _spmm_bwd)


# ---------------------------------------------------------------------------
# Fused extremal aggregation (SAGE max/min pooling)
# ---------------------------------------------------------------------------
#
# The slab answer to SingleCPUDstAggregateOpMin/Max + DistAggregateDstMin/Max
# (ref: core/ntsSingleCPUGraphOp.hpp:206-340, core/ntsDistCPUGraphOp.hpp:
# 306-440): Y[d] = max_k X[idx[d,k]] with the gradient routed to the FIRST
# extremal edge per (dst, lane) — the reference's record[] + nts_assign
# semantics.  The segment-op form materializes [E, F] edge tensors (14 GB at
# Reddit scale, F=602 — kills the compiler); here the forward is ONE
# blockwise F-lane slot gather per slab computing (running max, winning flat
# slab position) together, and the backward routes dst grads through the
# BACKWARD slabs by comparing each slot's b_perm position against the
# recorded winner — no [E, F] tensors, scatters only in the tiny virtual-row
# combine.  Within a dst row, flat forward-slab position is monotone in the
# dst-sorted edge rank (pack_slab: base pos = row·K+rank, tail pos follows
# after base_size), so min-position tie-breaking == the segment path's
# first-edge-index rule exactly.

_WIN_NONE = 2**31 - 1  # argwin sentinel: no candidate in this part


def _block_rows(rows: int, bytes_per_row: int) -> int:
    """Rows per block under the gather budget, floored to 8s."""
    bv = max(8, min(rows, _BLOCK_GATHER_BUDGET // max(bytes_per_row, 1)))
    return max(8, (bv // 8) * 8)


def _slab_rowext(idx, valid, row_id, x, pos_offset, k, want_win, gpos=None):
    """Blockwise masked per-lane max over slots (+ winning position).

    Returns (m [rows,F] f32 with empty rows at _NEG, win [rows,F] int32
    position, or _WIN_NONE where the row/lane is empty). Positions are
    flat forward-slab positions row_id·K + slot + pos_offset by default
    (``row_id`` carries each row's global slab row index through the block
    map — lax.map gives no block offset); with ``gpos`` (a [rows, K] slab
    of GLOBAL edge positions) they are read from the slab instead, making
    winners comparable across split slab sets. ``want_win=False`` (the
    primal/inference forward, which needs no gradient routing) skips the
    int32 candidate build + min reduction entirely and returns win=None."""
    rows = idx.shape[0]
    f = x.shape[-1]
    if rows == 0:
        return (jnp.full((0, f), _NEG, jnp.float32),
                jnp.full((0, f), _WIN_NONE, jnp.int32) if want_win else None)
    # up to three [bv, K, F] block temps (gathered, f32 widened, int32 cand)
    bv = _block_rows(rows, (3 if want_win else 2) * k * f * 4)
    karange = jnp.arange(k, dtype=jnp.int32)
    use_gpos = gpos is not None

    def block(args):
        ib, vb, rb = args
        g = jnp.take(x, ib, axis=0).astype(jnp.float32)       # [bv, K, F]
        g = jnp.where(vb[:, :, None], g, _NEG)
        m = jnp.max(g, axis=1)                                # [bv, F]
        if not want_win:
            return m
        if use_gpos:
            pos = rb                                           # [bv, K]
        else:
            pos = rb[:, None] * k + karange[None, :] + pos_offset
        cand = jnp.where(vb[:, :, None] & (g == m[:, None, :]),
                         pos[:, :, None], _WIN_NONE)
        win = jnp.min(cand, axis=1).astype(jnp.int32)         # [bv, F]
        return m, win

    third = gpos if use_gpos else row_id
    out = _map_row_blocks(block, (idx, valid, third), rows, bv)
    return out if want_win else (out, None)


def _ext_fwd_impl(ell: EllGraph, x, want_win, use_gpos=False, raw=False):
    """Per-set extremal forward. ``use_gpos``: record winners as GLOBAL
    edge positions (ell.*_gpos slabs) instead of flat slab positions —
    within a dst row both orderings agree (pack_slab keeps the stable
    dst-sorted edge order, so rank order == original order), but only
    global positions compare across split slab sets. ``raw``: return m
    with empty lanes at _NEG (for the cross-set merge) instead of 0."""
    vd_pad, k = ell.f_idx.shape
    xc = ell.cast_in(x)
    rows_base = jnp.arange(vd_pad, dtype=jnp.int32)
    m, win = _slab_rowext(ell.f_idx, ell.f_w != 0, rows_base, xc, 0, k,
                          want_win, gpos=ell.f_gpos if use_gpos else None)
    m = m[:ell.num_dst]
    win = win[:ell.num_dst] if want_win else None
    if ell.f_tail_idx.shape[0] > 0:
        rows_t = jnp.arange(ell.f_tail_idx.shape[0], dtype=jnp.int32)
        m_t, win_t = _slab_rowext(
            ell.f_tail_idx, ell.f_tail_w != 0, rows_t, xc, vd_pad * k, k,
            want_win, gpos=ell.f_tail_gpos if use_gpos else None)
        # per-real-row tail max + the min position attaining it
        t_max = jax.ops.segment_max(m_t, ell.f_tail_rows,
                                    num_segments=ell.num_dst,
                                    indices_are_sorted=True)
        # tail wins only on STRICTLY greater value: every base position
        # precedes every tail position of the same row (true in BOTH the
        # flat and global orderings — rank order == original order within
        # a row), so ties keep base
        take_t = t_max > m
        if want_win:
            cand = jnp.where(
                m_t == jnp.take(t_max, ell.f_tail_rows, axis=0), win_t,
                _WIN_NONE)
            t_win = jax.ops.segment_min(cand, ell.f_tail_rows,
                                        num_segments=ell.num_dst,
                                        indices_are_sorted=True)
            win = jnp.where(take_t, t_win, win)
        m = jnp.where(take_t, t_max, m)
    if raw:
        return m, win
    # empty (row, lane)s sit at exactly _NEG — zero them like the segment
    # path's empty-segment convention (no winner dependence: the primal
    # forward never builds winners at all)
    out = jnp.where(m > _NEG / 2, m, 0.0).astype(x.dtype)
    return out, win


def _pack_win_g(win, gtab):
    """[V, 2F] int32: recorded winners ∥ f32-bitcast dst cotangents —
    ONE gather stream for the route pass (exact: the bitcast roundtrips;
    gtab is cast to f32 first, which is exact from bf16)."""
    return jnp.concatenate(
        [win, jax.lax.bitcast_convert_type(gtab.astype(jnp.float32),
                                           jnp.int32)], axis=1)


def _slab_route_win(idx, valid, perm, packed, k):
    """dx rows over a backward slab: dx[s,f] = Σ_k [perm[s,k] == win[dst,f]]
    · g[dst,f].  r5, WIDTH-ADAPTIVE: for F ≤ 128 gather the ONE packed
    [V, 2F] winners∥cotangents table per block (−31% measured: bwd 221
    vs 322 ms at Reddit scale/F=128 — a 2nd in-block gather stream costs
    +81% over one stream, the extra TILE of a ≤2-tile row only +25%);
    for F > 128 keep the two separate F-lane streams (at F=602 the
    packed 10-tile row measured +22% WORSE than 2 × 5-tile streams —
    the tile charge overtakes the stream charge). In-process A/B:
    tools/probe_ext_ab.py; both forms read the same packed table."""
    rows = idx.shape[0]
    if isinstance(packed, tuple):                 # F > 128: two streams
        win, gtab = packed
        f = win.shape[-1]
        if rows == 0:
            return jnp.zeros((0, f), jnp.float32)
        bv = _block_rows(rows, 3 * k * f * 4)

        def block(args):
            ib, vb, pb = args
            wg = jnp.take(win, ib, axis=0)                    # [bv, K, F]
            gg = jnp.take(gtab, ib, axis=0).astype(jnp.float32)
            mask = vb[:, :, None] & (wg == pb[:, :, None])
            return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)
    else:                                         # F ≤ 128: packed stream
        f = packed.shape[-1] // 2
        if rows == 0:
            return jnp.zeros((0, f), jnp.float32)
        bv = _block_rows(rows, 3 * k * f * 4)

        def block(args):
            ib, vb, pb = args
            both = jnp.take(packed, ib, axis=0)               # [bv, K, 2F]
            wg = both[:, :, :f]
            gg = jax.lax.bitcast_convert_type(both[:, :, f:], jnp.float32)
            mask = vb[:, :, None] & (wg == pb[:, :, None])
            return jnp.sum(jnp.where(mask, gg, 0.0), axis=1)

    return _map_row_blocks(block, (idx, valid, perm), rows, bv)


@jax.custom_vjp
def aggregate_max(ell: EllGraph, x: jax.Array) -> jax.Array:
    """Y[d] = max over in-edges of X[src]; empty rows give 0; gradient to
    the first extremal edge per (dst, lane). [num_src, F] → [num_dst, F].
    The primal (inference) forward skips winner recording entirely."""
    out, _ = _ext_fwd_impl(ell, x, want_win=False)
    return out


def _ext_fwd(ell, x):
    out, win = _ext_fwd_impl(ell, x, want_win=True)
    return out, (ell, win, jnp.zeros((0,), x.dtype))


def _route_ext_bwd(ell: EllGraph, win, g, use_gpos=False):
    """Route dst cotangents to recorded winners through the backward slabs
    (dx[s,f] = Σ over s's out-edges e of [pos(e) == win[dst(e),f]]·g[dst,f]).
    ``use_gpos`` compares against the global-position slabs instead of
    b_perm (the cross-set merge records global winners)."""
    vd_pad, _ = ell.f_idx.shape
    kb = ell.b_idx.shape[1]
    win_pad = jnp.pad(win, ((0, vd_pad - win.shape[0]), (0, 0)),
                      constant_values=_WIN_NONE)
    gc = ell.cast_in(jnp.pad(g, ((0, vd_pad - g.shape[0]), (0, 0))))
    # one table for both slab calls; tuple = two-stream form for wide rows
    packed = _pack_win_g(win_pad, gc) if win.shape[-1] <= 128 \
        else (win_pad, gc)
    perm = ell.b_gpos if use_gpos else ell.b_perm
    tperm = ell.b_tail_gpos if use_gpos else ell.b_tail_perm
    # b_perm's padding slots point at the trailing dummy position, which is
    # strictly greater than any recorded winner and != _WIN_NONE only by
    # construction (gpos padding IS _WIN_NONE) — mask on b_w anyway
    dx = _slab_route_win(ell.b_idx, ell.b_w != 0, perm, packed,
                         kb)[:ell.num_src]
    if ell.b_tail_idx.shape[0]:
        t = _slab_route_win(ell.b_tail_idx, ell.b_tail_w != 0,
                            tperm, packed, kb)
        dx = _tail_combine(dx, t, ell.b_tail_rows, ell.num_src)
    return dx


def _ext_bwd(res, g):
    ell, win, probe = res
    dx = _route_ext_bwd(ell, win, g)
    return None, dx.astype(probe.dtype)


aggregate_max.defvjp(_ext_fwd, _ext_bwd)


def aggregate_min(ell: EllGraph, x: jax.Array) -> jax.Array:
    """Y[d] = min over in-edges of X[src] (empty rows 0, first-extremal
    grads): max(−x) negated — the winner of max(−x) under min-position
    tie-breaking IS the first edge attaining min(x)."""
    return -aggregate_max(ell, -x)


# ---------------------------------------------------------------------------
# Cross-slab-set extremal merge (PROC_OVERLAP local/remote split)
# ---------------------------------------------------------------------------
#
# Under PROC_OVERLAP the edge set is split into local/remote slab sets; the
# extremal aggregate couples them only through the per-(dst, lane) winner.
# Each set computes (raw max, first GLOBAL-position winner) over ITS edges —
# the positions come from the *_gpos slabs, indices into the ORIGINAL
# interleaved edge list — and the union is the elementwise merge: value by
# max, tie by min global position. Gradients route per-set through each
# set's backward slabs against the MERGED winner, so exactly one edge per
# (dst, lane) receives gradient — identical to the unsplit engine and to the
# reference's record[] semantics composing with its overlap pipeline
# (core/ntsDistCPUGraphOp.hpp:306-440 + core/graph.hpp:3490-3535). The local
# set's pass has no data dependency on the boundary exchange, so XLA
# overlaps the exchange with it — closing the r2 hole where SAGE +
# PROC_OVERLAP fell back to the [E, F] segment form.


def _ext_pair_impl(ell_a: EllGraph, x_a, ell_b: EllGraph, x_b, want_win):
    if want_win and (ell_a.f_gpos is None or ell_b.f_gpos is None):
        raise ValueError(
            "aggregate_max_pair needs global-position (gpos) slabs on both "
            "slab sets — build them with build_ell_rect_np(..., gpos=...)")
    m_a, win_a = _ext_fwd_impl(ell_a, x_a, want_win, use_gpos=True, raw=True)
    m_b, win_b = _ext_fwd_impl(ell_b, x_b, want_win, use_gpos=True, raw=True)
    m = jnp.maximum(m_a, m_b)
    win = None
    if want_win:
        cand_a = jnp.where(m_a == m, win_a, _WIN_NONE)
        cand_b = jnp.where(m_b == m, win_b, _WIN_NONE)
        win = jnp.minimum(cand_a, cand_b)
    out = jnp.where(m > _NEG / 2, m, 0.0).astype(x_a.dtype)
    return out, win


@jax.custom_vjp
def aggregate_max_pair(ell_a: EllGraph, x_a: jax.Array,
                       ell_b: EllGraph, x_b: jax.Array) -> jax.Array:
    """Per-lane max over the UNION of two slab sets' edges (set a reads
    x_a rows, set b reads x_b rows; both aggregate into the same num_dst
    rows). Empty rows give 0; the gradient goes to the FIRST extremal edge
    per (dst, lane) in the original interleaved edge order — exact
    first-edge ties across the set boundary via the gpos slabs."""
    out, _ = _ext_pair_impl(ell_a, x_a, ell_b, x_b, want_win=False)
    return out


def _ext_pair_fwd(ell_a, x_a, ell_b, x_b):
    out, win = _ext_pair_impl(ell_a, x_a, ell_b, x_b, want_win=True)
    return out, (ell_a, ell_b, win, jnp.zeros((0,), x_a.dtype),
                 jnp.zeros((0,), x_b.dtype))


def _ext_pair_bwd(res, g):
    ell_a, ell_b, win, pa, pb = res
    dx_a = _route_ext_bwd(ell_a, win, g, use_gpos=True)
    dx_b = _route_ext_bwd(ell_b, win, g, use_gpos=True)
    return None, dx_a.astype(pa.dtype), None, dx_b.astype(pb.dtype)


aggregate_max_pair.defvjp(_ext_pair_fwd, _ext_pair_bwd)


def aggregate_min_pair(ell_a: EllGraph, x_a: jax.Array,
                       ell_b: EllGraph, x_b: jax.Array) -> jax.Array:
    """Union min with first-extremal grads (see aggregate_min)."""
    return -aggregate_max_pair(ell_a, -x_a, ell_b, -x_b)


# ---------------------------------------------------------------------------
# Fused GAT attention layer
# ---------------------------------------------------------------------------

_NEG = -1e30


def _perm_bwd_scalar(ell: EllGraph, dpre, dpre_t, w, w_t, gtab):
    """Shared slot-permutation backward (scalar lanes): ONE 2-lane gather
    through b_perm/b_tail_perm yields BOTH the per-src sum of ``dpre`` and
    the transposed aggregate of ``gtab`` weighted by ``w`` (the two lanes
    share the permutation — one 16M-element gather instead of two; gathers
    of this shape are per-element-overhead-bound on TPU).
    Returns (dsrc [num_src], dx [num_src, F])."""
    flat2 = jnp.stack(
        [jnp.concatenate([dpre.reshape(-1), dpre_t.reshape(-1),
                          jnp.zeros(1, dpre.dtype)]),
         jnp.concatenate([w.reshape(-1), w_t.reshape(-1),
                          jnp.zeros(1, w.dtype)])], axis=-1)
    b_valid = ell.b_w != 0
    g2 = jnp.take(flat2, ell.b_perm, axis=0)        # [Vs_pad, Kb, 2]
    dsrc = jnp.sum(jnp.where(b_valid, g2[..., 0], 0.0), axis=1)
    wb = jnp.where(b_valid, g2[..., 1], 0.0)
    dx = slab_matvec(ell.b_idx, wb, gtab)[:ell.num_src]
    if ell.b_tail_idx.shape[0]:
        bt_valid = ell.b_tail_w != 0
        g2t = jnp.take(flat2, ell.b_tail_perm, axis=0)
        dsrc = _tail_combine(
            dsrc[:ell.num_src],
            jnp.sum(jnp.where(bt_valid, g2t[..., 0], 0.0), axis=1),
            ell.b_tail_rows, ell.num_src)
        wbt = jnp.where(bt_valid, g2t[..., 1], 0.0)
        dx = _tail_combine(dx, slab_matvec(ell.b_tail_idx, wbt, gtab),
                           ell.b_tail_rows, ell.num_src)
    else:
        dsrc = dsrc[:ell.num_src]
    return dsrc, dx


def _perm_bwd_lanes(ell: EllGraph, dpre, dpre_t, w, w_t, gtab):
    """Shared slot-permutation backward, per-FEATURE-lane variant (gated):
    one [slots, 2F] gather yields the per-src lane sums of ``dpre`` and the
    ``w``-weighted transposed aggregate of ``gtab``.
    Returns (dsrc [num_src, F], dx [num_src, F])."""
    f = dpre.shape[-1]
    flat2 = jnp.concatenate(
        [jnp.concatenate([dpre.reshape(-1, f), dpre_t.reshape(-1, f),
                          jnp.zeros((1, f), dpre.dtype)], axis=0),
         jnp.concatenate([w.reshape(-1, f), w_t.reshape(-1, f),
                          jnp.zeros((1, f), w.dtype)], axis=0)], axis=-1)
    b_valid = (ell.b_w != 0)[:, :, None]
    g2 = jnp.take(flat2, ell.b_perm, axis=0)        # [Vs_pad, Kb, 2F]
    dsrc = jnp.sum(jnp.where(b_valid, g2[..., :f], 0.0), axis=1)
    wb = jnp.where(b_valid, g2[..., f:], 0.0)
    dx = slab_gated_matvec(ell.b_idx, wb, gtab)[:ell.num_src]
    if ell.b_tail_idx.shape[0]:
        bt_valid = (ell.b_tail_w != 0)[:, :, None]
        g2t = jnp.take(flat2, ell.b_tail_perm, axis=0)
        dsrc = _tail_combine(
            dsrc[:ell.num_src],
            jnp.sum(jnp.where(bt_valid, g2t[..., :f], 0.0), axis=1),
            ell.b_tail_rows, ell.num_src)
        wbt = jnp.where(bt_valid, g2t[..., f:], 0.0)
        dx = _tail_combine(dx, slab_gated_matvec(ell.b_tail_idx, wbt, gtab),
                           ell.b_tail_rows, ell.num_src)
    else:
        dsrc = dsrc[:ell.num_src]
    return dsrc, dx


def _attention_scores(ell: EllGraph, s_src, s_dst, slope, stats=False):
    """Masked pre-activations + softmax over each dst row (base ∥ tail).

    ``s_src``: [Vs] source-table scalars; ``s_dst``: [num_dst] scalars.
    Returns (a, a_t, (pre, pre_t), row_max, ssum) in slab layout; invalid
    slots get a=0. With ``stats=True`` the slot weights come back
    UN-normalized (z = e^{m−c}, skipping the divide — the stats ops
    multiply den back in otherwise).
    """
    vd_pad = ell.f_idx.shape[0]
    s_dst_p = jnp.pad(s_dst, (0, vd_pad - s_dst.shape[0]))
    f_valid = ell.f_w != 0
    has_tail = ell.f_tail_idx.shape[0] > 0

    pre = jnp.take(s_src, ell.f_idx) + s_dst_p[:, None]
    m = jnp.where(f_valid, jax.nn.leaky_relu(pre, slope), _NEG)
    if has_tail:
        t_valid = ell.f_tail_w != 0
        pre_t = (jnp.take(s_src, ell.f_tail_idx)
                 + jnp.take(s_dst_p, ell.f_tail_rows)[:, None])
        m_t = jnp.where(t_valid, jax.nn.leaky_relu(pre_t, slope), _NEG)
    else:
        pre_t = None
        m_t = jnp.zeros((0, ell.f_idx.shape[1]), m.dtype)

    # segment max / sum across base ∥ tail slices of each dst row
    row_max = jnp.max(m, axis=1)                                  # [Vd_pad]
    if has_tail:
        combined = _tail_combine(row_max[:ell.num_dst], jnp.max(m_t, axis=1),
                                 ell.f_tail_rows, ell.num_dst, op="max")
        row_max = jnp.concatenate([combined, row_max[ell.num_dst:]])
    row_max = jnp.maximum(row_max, _NEG / 2)  # isolated rows: avoid -inf−-inf
    z = jnp.where(f_valid, jnp.exp(m - row_max[:, None]), 0.0)
    ssum = jnp.sum(z, axis=1)
    if has_tail:
        z_t = jnp.where(
            t_valid,
            jnp.exp(m_t - jnp.take(row_max, ell.f_tail_rows)[:, None]), 0.0)
        combined = _tail_combine(ssum[:ell.num_dst], jnp.sum(z_t, axis=1),
                                 ell.f_tail_rows, ell.num_dst)
        ssum = jnp.concatenate([combined, ssum[ell.num_dst:]])
    else:
        z_t = m_t
    ssum = jnp.maximum(ssum, 1e-30)
    if stats:
        return z, z_t, (pre, pre_t), row_max, ssum
    a = z / ssum[:, None]
    a_t = (z_t / jnp.take(ssum, ell.f_tail_rows)[:, None] if has_tail
           else z_t)
    return a, a_t, (pre, pre_t), row_max, ssum


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_aggregate(ell: EllGraph, x: jax.Array, s_src: jax.Array,
                        s_dst: jax.Array, slope: float = 0.2) -> jax.Array:
    """out[d] = Σ_k softmax_d(leaky_relu(s_src[src]+s_dst[d]))·x[src].

    The whole reference GAT edge chain as ONE op in slab layout:
    no [E]-shaped intermediates, no scatters beyond the virtual-row combine;
    gradients flow to x, s_src, s_dst through the slot permutation.
    """
    out, _ = _attn_fwd_impl(ell, x, s_src, s_dst, slope)
    return out


def _attn_fwd_impl(ell, x, s_src, s_dst, slope):
    a, a_t, (pre, pre_t), _, _ = _attention_scores(ell, s_src, s_dst, slope)
    # bf16 feature gathers (agg_dtype): the [rows,K,F] gather is the
    # dominant HBM cost; scores/softmax stay f32 for numerics
    xc = ell.cast_in(x)
    out = slab_matvec(ell.f_idx, a, xc)[:ell.num_dst]
    tail = slab_matvec(ell.f_tail_idx, a_t, xc)
    out = _tail_combine(out, tail, ell.f_tail_rows,
                        ell.num_dst).astype(x.dtype)
    return out, (a, a_t, pre, pre_t)


def _attn_fwd(ell, x, s_src, s_dst, slope):
    out, (a, a_t, pre, pre_t) = _attn_fwd_impl(ell, x, s_src, s_dst, slope)
    return out, (ell, x, s_src, s_dst, a, a_t, pre, pre_t)


def _attn_bwd(slope, res, g):
    ell, x, s_src, s_dst, a, a_t, pre_b, pre_t = res
    has_tail = ell.f_tail_idx.shape[0] > 0
    f_valid = ell.f_w != 0
    t_valid = ell.f_tail_w != 0
    g_pad = jnp.pad(g, ((0, ell.f_idx.shape[0] - ell.num_dst), (0, 0)))
    # the two [rows,K,F] feature gathers (SDDMM over x, transposed matvec
    # over g) dominate the backward's HBM traffic — bf16 them (agg_dtype);
    # score math stays f32
    xc = ell.cast_in(x)
    gc = ell.cast_in(g_pad)

    # da[r,k] = dot(x[idx], g[r])
    da = slab_sddmm(ell.f_idx, f_valid, xc, g_pad)
    if has_tail:
        g_tail = jnp.take(g_pad, ell.f_tail_rows, axis=0)
        da_t = slab_sddmm(ell.f_tail_idx, t_valid, xc, g_tail)
    else:
        da_t = jnp.zeros_like(a_t)

    # softmax VJP across base∥tail per dst row
    inner = jnp.sum(a * da, axis=1)
    if has_tail:
        inner = jnp.pad(
            _tail_combine(inner[:ell.num_dst],
                          jnp.sum(a_t * da_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            (0, ell.f_idx.shape[0] - ell.num_dst))
    dm = a * (da - inner[:, None])
    dleaky = jnp.where(pre_b > 0, 1.0, slope)
    dpre = jnp.where(f_valid, dm * dleaky, 0.0)
    if has_tail:
        inner_t = jnp.take(inner, ell.f_tail_rows)
        dm_t = a_t * (da_t - inner_t[:, None])
        dpre_t = jnp.where(t_valid, dm_t * jnp.where(pre_t > 0, 1.0, slope),
                           0.0)
    else:
        dpre_t = jnp.zeros_like(a_t)

    # d s_dst[d] = Σ_k dpre
    ds_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        ds_dst = jnp.pad(
            _tail_combine(ds_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            (0, ell.f_idx.shape[0] - ell.num_dst))
    ds_dst = ds_dst[:s_dst.shape[0]]

    # ds_src + dX share the slot permutation — one 2-lane gather
    # (_perm_bwd_scalar); dX is the transposed aggregate with permuted
    # attention weights
    ds_src, dx = _perm_bwd_scalar(ell, dpre, dpre_t, a, a_t, gc)
    ds_src = ds_src[:s_src.shape[0]]
    dx = dx[:x.shape[0]].astype(x.dtype)

    return None, dx, ds_src, ds_dst


attention_aggregate.defvjp(_attn_fwd, _attn_bwd)


# ---------------------------------------------------------------------------
# Cross-slab softmax stats (PROC_OVERLAP local/remote split)
# ---------------------------------------------------------------------------
#
# With PROC_OVERLAP the edge set is split into local/remote slab sets so the
# local pass has no data dependency on the boundary exchange (the reference's
# P6 overlap, core/graph.hpp:3490-3535).  Attention softmaxes couple the two
# sets mathematically, but the coupling is only through three per-dst-row
# reductions — so each slab set computes UN-normalized online-softmax parts
#     num[d] = Σ_k e^{m_k - c_d}·x_k,  den[d] = Σ_k e^{m_k - c_d},
# with its own stabilizer c (= row max, stop-grad: softmax is invariant to
# it), and the exact union softmax is the elementwise merge
#     out = Σ_p num_p·e^{c_p-M} / Σ_p den_p·e^{c_p-M},  M = max_p c_p
# (merge_softmax_parts — plain AD).  XLA then overlaps the local stats pass
# with the exchange.  Gradients: since c is constant, dz_k = x_k·dnum + dden
# and dpre_k = z_k·dz_k·leaky' — NO softmax-VJP inner term (that appears
# only through the merge, where AD produces it).


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_stats(ell: EllGraph, x: jax.Array, s_src: jax.Array,
                    s_dst: jax.Array, slope: float = 0.2):
    """Returns (num [Vd,F], den [Vd], c [Vd]) — the unnormalized scalar-
    attention aggregate parts of THIS slab set (see merge_softmax_parts).
    ``c`` carries no gradient (stabilizer)."""
    num, den, c, _ = _attn_stats_fwd_impl(ell, x, s_src, s_dst, slope)
    return num, den, c


def _attn_stats_fwd_impl(ell, x, s_src, s_dst, slope):
    z, z_t, (pre, pre_t), row_max, ssum = _attention_scores(
        ell, s_src, s_dst, slope, stats=True)
    xc = ell.cast_in(x)
    num = slab_matvec(ell.f_idx, z, xc)[:ell.num_dst]
    tail = slab_matvec(ell.f_tail_idx, z_t, xc)
    num = _tail_combine(num, tail, ell.f_tail_rows,
                        ell.num_dst).astype(x.dtype)
    den = ssum[:ell.num_dst]
    c = row_max[:ell.num_dst]
    return num, den, c, (z, z_t, pre, pre_t)


def _attn_stats_fwd(ell, x, s_src, s_dst, slope):
    num, den, c, (z, z_t, pre, pre_t) = _attn_stats_fwd_impl(
        ell, x, s_src, s_dst, slope)
    return (num, den, c), (ell, x, s_src, s_dst, z, z_t, pre, pre_t)


def _attn_stats_bwd(slope, res, g):
    dnum, dden, _dc = g        # c is a stop-grad stabilizer by construction
    ell, x, s_src, s_dst, z, z_t, pre_b, pre_t = res
    has_tail = ell.f_tail_idx.shape[0] > 0
    f_valid = ell.f_w != 0
    vd_pad = ell.f_idx.shape[0]
    dnum_pad = jnp.pad(dnum, ((0, vd_pad - ell.num_dst), (0, 0)))
    dden_pad = jnp.pad(dden, (0, vd_pad - ell.num_dst))
    xc = ell.cast_in(x)
    dnc = ell.cast_in(dnum_pad)

    # c is constant → dz_k = x_k·dnum_d + dden_d, dpre_k = z_k·dz_k·leaky'
    # (NO softmax inner term — that appears only through the merge)
    dz = slab_sddmm(ell.f_idx, f_valid, xc, dnum_pad) + dden_pad[:, None]
    dpre = jnp.where(f_valid, z * dz * jnp.where(pre_b > 0, 1.0, slope), 0.0)
    if has_tail:
        t_valid = ell.f_tail_w != 0
        dz_t = (slab_sddmm(ell.f_tail_idx, t_valid, xc,
                           jnp.take(dnum_pad, ell.f_tail_rows, axis=0))
                + jnp.take(dden_pad, ell.f_tail_rows)[:, None])
        dpre_t = jnp.where(
            t_valid, z_t * dz_t * jnp.where(pre_t > 0, 1.0, slope), 0.0)
    else:
        dpre_t = jnp.zeros_like(z_t)

    ds_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        ds_dst = jnp.pad(
            _tail_combine(ds_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            (0, vd_pad - ell.num_dst))
    ds_dst = ds_dst[:s_dst.shape[0]]

    ds_src, dx = _perm_bwd_scalar(ell, dpre, dpre_t, z, z_t, dnc)
    ds_src = ds_src[:s_src.shape[0]]
    dx = dx[:x.shape[0]].astype(x.dtype)
    return None, dx, ds_src, ds_dst


attention_stats.defvjp(_attn_stats_fwd, _attn_stats_bwd)


def merge_softmax_parts(parts):
    """Exact softmax-aggregate over the UNION of disjoint slab-set edge
    sets from their (num, den, c) parts (attention_stats / gated_stats):

        out = Σ_p num_p·e^{c_p-M} / Σ_p den_p·e^{c_p-M},  M = max_p c_p.

    Plain-AD differentiable (the c's are stabilizers, stop-grad). Rows with
    no edges in ANY part come out 0 (every den ~1e-30-clamped)."""
    cs = [jax.lax.stop_gradient(c) for (_, _, c) in parts]
    m = cs[0]
    for c in cs[1:]:
        m = jnp.maximum(m, c)
    num = None
    den = None
    for (n, d, _), c in zip(parts, cs):
        s = jnp.exp(c - m)
        sn = s[..., None] if s.ndim < n.ndim else s
        num = n * sn if num is None else num + n * sn
        den = d * s if den is None else den + d * s
    den = jnp.maximum(den, 1e-30)
    return num / (den[..., None] if den.ndim < num.ndim else den)


# ---------------------------------------------------------------------------
# Fused LINEAR-score attention (GAT fast path)
# ---------------------------------------------------------------------------
#
# GAT's per-edge scores are linear in the gathered features
# (s_src[v] = x[v]·a_l — the GAT_CPU_DIST_OPTM decomposition,
# ref: toolkits/GAT_CPU_DIST_OPTM.hpp:210-235), so the per-slot score can be
# RECOMPUTED from the [bv, K, F] feature block the aggregate already gathers
# — a VPU einsum — instead of a separate per-slot scalar gather.  Profiling
# (BASELINE.md "GAT linear-score rework") showed those scalar gathers run at
# ~7 ns/slot (1.7 GB/s): ~244 ms/epoch forward + ~200 ms backward at Reddit
# scale, the dominant GAT cost.  This path eliminates them:
#
# * forward: ONE gather per slab, flash-style (blockwise local max/sum/
#   weighted-sum, rescaled when base∥tail slices combine);
# * backward fwd-layout pass: ONE gather per slab yields BOTH the SDDMM
#   (da) and the recomputed pre-activations;
# * backward bwd-layout pass: the per-dst softmax stats ride as 4 extra
#   LANES of the g-row gather (one [Kb, F+4] gather per row instead of a
#   feature gather PLUS a 2-lane slot-permutation gather).


def _lin_stats_pass(idx, w, xc, a_vec, s_dst_rows, slope):
    """One streaming pass over a slab: per row, masked-leaky-score local
    max ``m``, exp-sum ``s`` and exp-weighted feature sum ``u`` — computed
    from a single [bv, K, F] gather."""
    rows, k = idx.shape
    f = xc.shape[-1]
    if rows == 0:
        z = jnp.zeros((0,), jnp.float32)
        return z, z, jnp.zeros((0, f), jnp.float32)
    bv = _slab_gated_blocks(rows, k, f,
                            itemsize=xc.dtype.itemsize)

    def block(args):
        ib, wb, sdb = args
        xg = jnp.take(xc, ib, axis=0)                         # [bv, K, F]
        pre = jnp.einsum("vkf,f->vk", xg, a_vec,
                         preferred_element_type=jnp.float32) + sdb[:, None]
        valid = wb != 0
        m = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
        m_loc = jnp.maximum(jnp.max(m, axis=1), _NEG / 2)
        z = jnp.where(valid, jnp.exp(m - m_loc[:, None]), 0.0)
        u = jnp.einsum("vk,vkf->vf", z, xg,
                       preferred_element_type=jnp.float32)
        return m_loc, jnp.sum(z, axis=1), u

    return _map_row_blocks(block, (idx, w, s_dst_rows), rows, bv)


def _lin_da_pre_pass(idx, xc, a_vec, s_dst_rows, g_rows):
    """Backward fwd-layout pass: one gather per slab returns BOTH
    da[r,k] = x[idx]·g[r] (the SDDMM) and the recomputed pre-activation."""
    rows, k = idx.shape
    f = xc.shape[-1]
    if rows == 0:
        z = jnp.zeros((0, k), jnp.float32)
        return z, z
    bv = _slab_gated_blocks(rows, k, f,
                            itemsize=xc.dtype.itemsize)

    def block(args):
        ib, sdb, gb = args
        xg = jnp.take(xc, ib, axis=0)                         # [bv, K, F]
        da = jnp.einsum("vkf,vf->vk", xg, gb,
                        preferred_element_type=jnp.float32)
        pre = jnp.einsum("vkf,f->vk", xg, a_vec,
                         preferred_element_type=jnp.float32) + sdb[:, None]
        return da, pre

    return _map_row_blocks(block, (idx, s_dst_rows, g_rows), rows, bv)


def _lin_bwd_pass(idx, w, gc, stats4, x_rows, s_src_rows, f, slope):
    """Backward bwd-layout pass: per block, gather the dst-grad rows and
    the 4 per-dst softmax stats (s_dst, M, S, inner); attention weights
    and dpre are recomputed in-register.

    Stat transport is tile-aware (measured — BASELINE.md "GAT linear-score
    rework" + "r4-late per-tile gather law"): when F+4 fits one 128-lane
    tile the stats ride as extra LANES of the g-row gather (one DMA per
    slot, the 4.3 ns/slot floor).  When it would NOT fit (F=128): any
    second gather stream INSIDE the block stalls the main gather's
    pipeline (+12 ns/slot, probe_lin_bwd_variants.py), and a >128-lane
    fused row pays the multi-tile charge (~18 ns/slot) — so the stats are
    gathered in their OWN standalone pass first ([rows, K, 4], ~5.6
    ns/slot from the small table) and enter the block as a row-aligned
    slot ARG, keeping the main pass at the floor (measured 243→157 ms at
    Reddit scale, probe_packed4d.py gat_split2pass; bit-packing the bf16
    table to one u32 tile measured SLOWER — the in-block bitcast costs
    more than the saved tile).
    Returns (dx_rows [rows, F] f32, dspre_rows [rows] = Σ_k dpre)."""
    rows, k = idx.shape
    if rows == 0:
        return (jnp.zeros((0, f), jnp.float32), jnp.zeros((0,), jnp.float32))
    fuse_lanes = f + 4 <= 128
    if fuse_lanes:
        g_aug = jnp.concatenate([gc, stats4.astype(gc.dtype)], axis=1)
        arrays = (idx, w, x_rows, s_src_rows)
    else:
        g_aug = gc
        # mode="clip" keeps this a pure gather (see _lin_bwd_pass_heads:
        # the fill-mode select materializes the result tile-padded 32×)
        st_full = jnp.take(stats4, idx.reshape(-1), axis=0, mode="clip"
                           ).reshape(rows, k, 4)
        arrays = (idx, w, x_rows, s_src_rows, st_full)
    bv = _slab_gated_blocks(rows, k, g_aug.shape[-1],
                            itemsize=g_aug.dtype.itemsize)

    def block(args):
        ib, wb, xrb, ssb = args[:4]
        ga = jnp.take(g_aug, ib, axis=0)           # [bv, Kb, F(+4)]
        gslot = ga[..., :f]
        if fuse_lanes:
            st = ga[..., f:].astype(jnp.float32)   # [bv, Kb, 4]
        else:
            st = args[4]                           # pre-gathered slot arg
        sdk, mk, ink = st[..., 0], st[..., 1], st[..., 3]
        sk = jnp.maximum(st[..., 2], 1e-30)
        valid = wb != 0
        da = jnp.einsum("vkf,vf->vk", gslot, xrb,
                        preferred_element_type=jnp.float32)
        pre = ssb[:, None] + sdk
        # mask BEFORE exp: padding slots may reference padded stat rows
        # (mk = -NEG/2) where exp(m - mk) would overflow
        m = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
        a = jnp.exp(m - mk) / sk
        dpre = a * (da - ink) * jnp.where(pre > 0, 1.0, slope)
        dx = jnp.einsum("vk,vkf->vf", a, gslot,
                        preferred_element_type=jnp.float32)
        return dx, jnp.sum(dpre, axis=1)

    return _map_row_blocks(block, arrays, rows, bv)


def _attn_lin_fwd_impl(ell, x, a_l, s_dst, slope):
    vd_pad = ell.f_idx.shape[0]
    xc = ell.cast_in(x)
    a_vec = a_l.astype(xc.dtype)
    s_dst_p = jnp.pad(s_dst.astype(jnp.float32),
                      (0, vd_pad - s_dst.shape[0]))
    mb, sb, ub = _lin_stats_pass(ell.f_idx, ell.f_w, xc, a_vec, s_dst_p,
                                 slope)
    if ell.f_tail_idx.shape[0] > 0:
        s_dst_t = jnp.take(s_dst_p, ell.f_tail_rows)
        mt, st, ut = _lin_stats_pass(ell.f_tail_idx, ell.f_tail_w, xc,
                                     a_vec, s_dst_t, slope)
        # flash combine of (max, sum, weighted-sum) across base ∥ tail
        m_comb = _tail_combine(mb[:ell.num_dst], mt, ell.f_tail_rows,
                               ell.num_dst, op="max")
        big_m = jnp.concatenate([m_comb, mb[ell.num_dst:]])
        scale_b = jnp.exp(mb - big_m)
        scale_t = jnp.exp(mt - jnp.take(big_m, ell.f_tail_rows))
        big_s = jnp.concatenate([
            _tail_combine((sb * scale_b)[:ell.num_dst], st * scale_t,
                          ell.f_tail_rows, ell.num_dst),
            (sb * scale_b)[ell.num_dst:]])
        u = _tail_combine((ub * scale_b[:, None])[:ell.num_dst],
                          ut * scale_t[:, None], ell.f_tail_rows,
                          ell.num_dst)
    else:
        big_m, big_s, u = mb, sb, ub[:ell.num_dst]
    big_s = jnp.maximum(big_s, 1e-30)
    out = (u / big_s[:ell.num_dst, None])[:ell.num_dst].astype(x.dtype)
    return out, (big_m, big_s, u)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_aggregate_linear(ell: EllGraph, x: jax.Array, a_l: jax.Array,
                               s_dst: jax.Array, slope: float = 0.2
                               ) -> jax.Array:
    """``attention_aggregate`` with s_src = x·a_l recomputed in-block.

    out[d] = Σ_k softmax_d(leaky_relu(x[src]·a_l + s_dst[d])) · x[src],
    with no per-slot scalar gathers in forward OR backward (see the
    section comment above).  ``a_l``: [F] attention vector."""
    out, _ = _attn_lin_fwd_impl(ell, x, a_l, s_dst, slope)
    return out


def _attn_lin_fwd(ell, x, a_l, s_dst, slope):
    out, (big_m, big_s, _) = _attn_lin_fwd_impl(ell, x, a_l, s_dst, slope)
    return out, (ell, x, a_l, s_dst, big_m, big_s)


def _attn_lin_bwd(slope, res, g):
    ell, x, a_l, s_dst, big_m, big_s = res
    vd_pad, kf = ell.f_idx.shape
    f = x.shape[-1]
    has_tail = ell.f_tail_idx.shape[0] > 0
    xc = ell.cast_in(x)
    a_vec = a_l.astype(xc.dtype)
    g_pad = jnp.pad(g, ((0, vd_pad - ell.num_dst), (0, 0)))
    gc = ell.cast_in(g_pad)
    s_dst_p = jnp.pad(s_dst.astype(jnp.float32),
                      (0, vd_pad - s_dst.shape[0]))

    # ---- fwd-layout: da + pre from one gather per slab ----
    f_valid = ell.f_w != 0
    da, pre = _lin_da_pre_pass(ell.f_idx, xc, a_vec, s_dst_p, gc)
    m = jnp.where(f_valid, jax.nn.leaky_relu(pre, slope), _NEG)
    a = jnp.exp(m - big_m[:, None]) / big_s[:, None]
    inner = jnp.sum(a * da, axis=1)
    if has_tail:
        t_valid = ell.f_tail_w != 0
        s_dst_t = jnp.take(s_dst_p, ell.f_tail_rows)
        g_tail = jnp.take(gc, ell.f_tail_rows, axis=0)
        da_t, pre_t = _lin_da_pre_pass(ell.f_tail_idx, xc, a_vec, s_dst_t,
                                       g_tail)
        m_t = jnp.where(t_valid, jax.nn.leaky_relu(pre_t, slope), _NEG)
        mt_row = jnp.take(big_m, ell.f_tail_rows)
        st_row = jnp.take(big_s, ell.f_tail_rows)
        a_t = jnp.exp(m_t - mt_row[:, None]) / st_row[:, None]
        inner = jnp.pad(
            _tail_combine(inner[:ell.num_dst], jnp.sum(a_t * da_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            (0, vd_pad - ell.num_dst))
    dpre = jnp.where(f_valid,
                     a * (da - inner[:, None])
                     * jnp.where(pre > 0, 1.0, slope), 0.0)
    ds_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        inner_t = jnp.take(inner, ell.f_tail_rows)
        dpre_t = jnp.where(
            t_valid, a_t * (da_t - inner_t[:, None])
            * jnp.where(pre_t > 0, 1.0, slope), 0.0)
        ds_dst = jnp.pad(
            _tail_combine(ds_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            (0, vd_pad - ell.num_dst))
    ds_dst = ds_dst[:s_dst.shape[0]]

    # ---- bwd-layout: softmax stats travel with the g-row gather ----
    stats4 = jnp.stack([s_dst_p, big_m, big_s, inner], axis=1)
    vs_pad = ell.b_idx.shape[0]
    xc_pad = jnp.pad(xc, ((0, vs_pad - xc.shape[0]), (0, 0)))
    s_src = jnp.einsum("vf,f->v", xc_pad, a_vec,
                       preferred_element_type=jnp.float32)
    dx, dspre = _lin_bwd_pass(ell.b_idx, ell.b_w, gc, stats4, xc_pad,
                              s_src, f, slope)
    if ell.b_tail_idx.shape[0]:
        xr_t = jnp.take(xc_pad, jnp.clip(ell.b_tail_rows, 0, vs_pad - 1),
                        axis=0)
        ss_t = jnp.take(s_src, jnp.clip(ell.b_tail_rows, 0, vs_pad - 1))
        dx_t, dspre_t = _lin_bwd_pass(ell.b_tail_idx, ell.b_tail_w, gc,
                                      stats4, xr_t, ss_t, f, slope)
        dx = _tail_combine(dx[:ell.num_src], dx_t, ell.b_tail_rows,
                           ell.num_src)
        dspre = _tail_combine(dspre[:ell.num_src], dspre_t,
                              ell.b_tail_rows, ell.num_src)
    dx = dx[:x.shape[0]]
    dspre = dspre[:x.shape[0]]
    # score linearization: dx += dpre_rowsum·a_l ; da_l = Σ_v dpre_rowsum·x
    dx = (dx + dspre[:, None] * a_l[None, :].astype(dx.dtype)
          ).astype(x.dtype)
    da_l = jnp.einsum("vf,v->f", x.astype(jnp.float32), dspre,
                      preferred_element_type=jnp.float32
                      ).astype(a_l.dtype)
    return None, dx, da_l, ds_dst


attention_aggregate_linear.defvjp(_attn_lin_fwd, _attn_lin_bwd)


# ---------------------------------------------------------------------------
# Linear-score softmax stats (PROC_OVERLAP split × GAT fast path)
# ---------------------------------------------------------------------------
#
# attention_stats with the linear-score in-block recompute: under the
# PROC_OVERLAP local/remote slab split each set contributes unnormalized
# parts (num, den, c) for merge_softmax_parts — but unlike attention_stats
# the per-slot score s_src = x·a_l is RECOMPUTED from the feature block the
# aggregate already gathers (a VPU einsum), so the split path keeps the
# exact optimization that bought 0.775→0.551 s/epoch single-chip
# (BASELINE.md "GAT linear-score rework") instead of falling back to
# materialized s_src + per-slot scalar gathers.  Gradients: c is a
# stop-grad stabilizer, so dz_k = x_k·dnum + dden and
# dpre_k = z_k·dz_k·leaky' — no softmax inner term (that appears only
# through the merge, where AD produces it).


def _lin_stats_bwd_pass(idx, w, dnc, stats3, x_rows, s_src_rows, f, slope):
    """Backward bwd-layout pass of the linear STATS op: per block, gather
    the dnum rows and the 3 per-dst stats (s_dst, c, dden); z and dpre are
    recomputed in-register (same tile-aware stat transport as
    _lin_bwd_pass — the stats ride as extra lanes while F+3 fits a tile,
    else they are pre-gathered in a standalone pass and enter as a slot
    arg; see _lin_bwd_pass for the measured law).
    Returns (dx_rows [rows, F] f32 = Σ_k z·dnum, dspre_rows [rows] =
    Σ_k dpre)."""
    rows, k = idx.shape
    if rows == 0:
        return (jnp.zeros((0, f), jnp.float32), jnp.zeros((0,), jnp.float32))
    fuse_lanes = f + 3 <= 128
    if fuse_lanes:
        g_aug = jnp.concatenate([dnc, stats3.astype(dnc.dtype)], axis=1)
        arrays = (idx, w, x_rows, s_src_rows)
    else:
        g_aug = dnc
        # mode="clip": pure gather, no padded select materialization (see
        # _lin_bwd_pass_heads)
        st_full = jnp.take(stats3, idx.reshape(-1), axis=0, mode="clip"
                           ).reshape(rows, k, 3)
        arrays = (idx, w, x_rows, s_src_rows, st_full)
    bv = _slab_gated_blocks(rows, k, g_aug.shape[-1],
                            itemsize=g_aug.dtype.itemsize)

    def block(args):
        ib, wb, xrb, ssb = args[:4]
        ga = jnp.take(g_aug, ib, axis=0)           # [bv, Kb, F(+3)]
        dnk = ga[..., :f]
        if fuse_lanes:
            st = ga[..., f:].astype(jnp.float32)   # [bv, Kb, 3]
        else:
            st = args[4]                           # pre-gathered slot arg
        sdk, ck, ddk = st[..., 0], st[..., 1], st[..., 2]
        valid = wb != 0
        da = jnp.einsum("vkf,vf->vk", dnk, xrb,
                        preferred_element_type=jnp.float32)
        pre = ssb[:, None] + sdk
        # mask BEFORE exp: padding slots may reference padded stat rows
        m = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
        z = jnp.exp(m - ck)
        # explicit where-mask (not just z==0): rows empty in EVERY part
        # get NaN dden cotangents from merge's clamped-den division VJP
        # (den² underflows f32), and 0·NaN = NaN — same convention as
        # _attn_stats_bwd / _gated_stats_bwd
        dpre = jnp.where(valid,
                         z * (da + ddk) * jnp.where(pre > 0, 1.0, slope),
                         0.0)
        dx = jnp.einsum("vk,vkf->vf", z, dnk,
                        preferred_element_type=jnp.float32)
        return dx, jnp.sum(dpre, axis=1)

    return _map_row_blocks(block, arrays, rows, bv)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_stats_linear(ell: EllGraph, x: jax.Array, a_l: jax.Array,
                           s_dst: jax.Array, slope: float = 0.2):
    """Returns (num [Vd,F], den [Vd], c [Vd]) — ``attention_stats`` with
    s_src = x·a_l recomputed in-block (see the section comment above); the
    PROC_OVERLAP split analogue of ``attention_aggregate_linear``."""
    _, (big_m, big_s, u) = _attn_lin_fwd_impl(ell, x, a_l, s_dst, slope)
    return (u.astype(x.dtype), big_s[:ell.num_dst], big_m[:ell.num_dst])


def _attn_stats_lin_fwd(ell, x, a_l, s_dst, slope):
    _, (big_m, big_s, u) = _attn_lin_fwd_impl(ell, x, a_l, s_dst, slope)
    out = (u.astype(x.dtype), big_s[:ell.num_dst], big_m[:ell.num_dst])
    return out, (ell, x, a_l, s_dst, big_m)


def _attn_stats_lin_bwd(slope, res, g):
    dnum, dden, _dc = g        # c is a stop-grad stabilizer by construction
    ell, x, a_l, s_dst, big_m = res
    vd_pad, _ = ell.f_idx.shape
    f = x.shape[-1]
    has_tail = ell.f_tail_idx.shape[0] > 0
    xc = ell.cast_in(x)
    a_vec = a_l.astype(xc.dtype)
    dnum_pad = jnp.pad(dnum, ((0, vd_pad - ell.num_dst), (0, 0)))
    dnc = ell.cast_in(dnum_pad)
    dden_pad = jnp.pad(dden, (0, vd_pad - ell.num_dst))
    s_dst_p = jnp.pad(s_dst.astype(jnp.float32),
                      (0, vd_pad - s_dst.shape[0]))

    # ---- fwd-layout: da + pre from one gather per slab → ds_dst ----
    f_valid = ell.f_w != 0
    da, pre = _lin_da_pre_pass(ell.f_idx, xc, a_vec, s_dst_p, dnc)
    m = jnp.where(f_valid, jax.nn.leaky_relu(pre, slope), _NEG)
    z = jnp.exp(m - big_m[:, None])
    # where-mask, not just z==0: empty-everywhere rows carry NaN dden
    # cotangents (merge's clamped-den division VJP; den² underflows f32)
    dpre = jnp.where(f_valid,
                     z * (da + dden_pad[:, None])
                     * jnp.where(pre > 0, 1.0, slope), 0.0)
    ds_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        t_valid = ell.f_tail_w != 0
        s_dst_t = jnp.take(s_dst_p, ell.f_tail_rows)
        dn_t = jnp.take(dnc, ell.f_tail_rows, axis=0)
        da_t, pre_t = _lin_da_pre_pass(ell.f_tail_idx, xc, a_vec, s_dst_t,
                                       dn_t)
        m_t = jnp.where(t_valid, jax.nn.leaky_relu(pre_t, slope), _NEG)
        z_t = jnp.exp(m_t - jnp.take(big_m, ell.f_tail_rows)[:, None])
        dpre_t = jnp.where(
            t_valid,
            z_t * (da_t + jnp.take(dden_pad, ell.f_tail_rows)[:, None])
            * jnp.where(pre_t > 0, 1.0, slope), 0.0)
        ds_dst = jnp.pad(
            _tail_combine(ds_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            (0, vd_pad - ell.num_dst))
    ds_dst = ds_dst[:s_dst.shape[0]]

    # ---- bwd-layout: per-dst stats travel with the dnum-row gather ----
    stats3 = jnp.stack([s_dst_p, big_m, dden_pad], axis=1)
    vs_pad = ell.b_idx.shape[0]
    xc_pad = jnp.pad(xc, ((0, vs_pad - xc.shape[0]), (0, 0)))
    s_src = jnp.einsum("vf,f->v", xc_pad, a_vec,
                       preferred_element_type=jnp.float32)
    dx, dspre = _lin_stats_bwd_pass(ell.b_idx, ell.b_w, dnc, stats3, xc_pad,
                                    s_src, f, slope)
    if ell.b_tail_idx.shape[0]:
        xr_t = jnp.take(xc_pad, jnp.clip(ell.b_tail_rows, 0, vs_pad - 1),
                        axis=0)
        ss_t = jnp.take(s_src, jnp.clip(ell.b_tail_rows, 0, vs_pad - 1))
        dx_t, dspre_t = _lin_stats_bwd_pass(ell.b_tail_idx, ell.b_tail_w,
                                            dnc, stats3, xr_t, ss_t, f,
                                            slope)
        dx = _tail_combine(dx[:ell.num_src], dx_t, ell.b_tail_rows,
                           ell.num_src)
        dspre = _tail_combine(dspre[:ell.num_src], dspre_t,
                              ell.b_tail_rows, ell.num_src)
    dx = dx[:x.shape[0]]
    dspre = dspre[:x.shape[0]]
    # score linearization: dx += dspre·a_l ; da_l = Σ_v dspre·x
    dx = (dx + dspre[:, None] * a_l[None, :].astype(dx.dtype)
          ).astype(x.dtype)
    da_l = jnp.einsum("vf,v->f", x.astype(jnp.float32), dspre,
                      preferred_element_type=jnp.float32
                      ).astype(a_l.dtype)
    return None, dx, da_l, ds_dst


attention_stats_linear.defvjp(_attn_stats_lin_fwd, _attn_stats_lin_bwd)


# ---------------------------------------------------------------------------
# Fused multi-head linear-score attention (ONE gather for ALL heads)
# ---------------------------------------------------------------------------
#
# Multi-head GAT (NUM_HEADS, models/gat.py) used to run the single-head
# fused chain once per head on F/H-lane slices of the SAME dep table — H
# full per-slot DMA bills for data one gather already delivers (the
# per-tile gather law: a slab pass costs per slot × 128-lane tile, so a
# [bv, K, F] block is the same bill whether one head or all H consume
# it).  Measured penalty at Reddit scale: gat_h4 +72% over single-head
# (BASELINE.md "r4 multi-head GAT").  This op runs every head inside the
# single-head pass structure:
#   * per-head scores come from ONE matmul of the gathered block against
#     the block-diagonal expansion A[f, h] = a_l[f − h·fh, h] for f in
#     head h's lane slice (zero blocks kill cross-head terms — exactly
#     the per-head slice dot, on the MXU);
#   * softmax stats stay per-(row, head) at [rows, H];
#   * per-(slot, head) weights map back onto feature lanes through the
#     head→lane indicator matmul H_map[h, f] = 1 iff lane f ∈ head h.
# Nothing slot-shaped ever reshapes to [.., H, F/H] — trailing
# sub-128-lane dims force Mosaic relayouts (measured on the packed-
# gather probes, BASELINE.md "r4-late per-tile gather law").  Heads own
# CONTIGUOUS lane slices, matching the concat-of-heads output layout
# (ref: GAT_CPU_DIST.hpp:181-215 runs one explicit edge chain per head;
# the head-major lane order equals docs/PARITY.md's NUM_HEADS×TP_DIM
# joint layout).


def _head_maps(a_l, dtype):
    """Block-diagonal expansion A_full [F, H] of the per-head attention
    vectors a_l [F/H, H] (head-major lane order), plus the head→lane
    indicator H_map [H, F] (f32)."""
    fh, h = a_l.shape
    eye = jnp.eye(h, dtype=jnp.float32)
    a_full = (eye[:, None, :] * a_l.astype(jnp.float32)[None, :, :]
              ).reshape(fh * h, h)
    hmap = jnp.repeat(eye, fh, axis=1)
    return a_full.astype(dtype), hmap


def _lin_stats_pass_heads(idx, w, xc, a_full, hmap, s_dst_rows, slope):
    """Multi-head ``_lin_stats_pass``: per row AND head, masked-leaky
    local max m [rows, H], exp-sum s [rows, H] and exp-weighted feature
    sum u [rows, F] (head h's weights apply to its own lane slice) — all
    from a single [bv, K, F] gather shared by every head."""
    rows, k = idx.shape
    f = xc.shape[-1]
    h = a_full.shape[-1]
    if rows == 0:
        z = jnp.zeros((0, h), jnp.float32)
        return z, z, jnp.zeros((0, f), jnp.float32)
    bv = _slab_gated_blocks(rows, k, f, itemsize=xc.dtype.itemsize)

    def block(args):
        ib, wb, sdb = args
        xg = jnp.take(xc, ib, axis=0)                     # [bv, K, F]
        pre = jnp.einsum("vkf,fh->vkh", xg, a_full,
                         preferred_element_type=jnp.float32
                         ) + sdb[:, None, :]
        valid = (wb != 0)[:, :, None]
        m = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
        m_loc = jnp.maximum(jnp.max(m, axis=1), _NEG / 2)  # [bv, H]
        z = jnp.where(valid, jnp.exp(m - m_loc[:, None, :]), 0.0)
        u = jnp.einsum("vkh,hf,vkf->vf", z, hmap, xg,
                       preferred_element_type=jnp.float32)
        return m_loc, jnp.sum(z, axis=1), u

    return _map_row_blocks(block, (idx, w, s_dst_rows), rows, bv)


def _attn_lin_heads_fwd_impl(ell, x, a_l, s_dst, slope):
    vd_pad = ell.f_idx.shape[0]
    xc = ell.cast_in(x)
    a_full, hmap = _head_maps(a_l, xc.dtype)
    s_dst_p = jnp.pad(s_dst.astype(jnp.float32),
                      ((0, vd_pad - s_dst.shape[0]), (0, 0)))
    mb, sb, ub = _lin_stats_pass_heads(ell.f_idx, ell.f_w, xc, a_full,
                                       hmap, s_dst_p, slope)
    if ell.f_tail_idx.shape[0] > 0:
        s_dst_t = jnp.take(s_dst_p, ell.f_tail_rows, axis=0)
        mt, st, ut = _lin_stats_pass_heads(ell.f_tail_idx, ell.f_tail_w,
                                           xc, a_full, hmap, s_dst_t,
                                           slope)
        m_comb = _tail_combine(mb[:ell.num_dst], mt, ell.f_tail_rows,
                               ell.num_dst, op="max")
        big_m = jnp.concatenate([m_comb, mb[ell.num_dst:]])
        scale_b = jnp.exp(mb - big_m)                      # [vd_pad, H]
        scale_t = jnp.exp(mt - jnp.take(big_m, ell.f_tail_rows, axis=0))
        big_s = jnp.concatenate([
            _tail_combine((sb * scale_b)[:ell.num_dst], st * scale_t,
                          ell.f_tail_rows, ell.num_dst),
            (sb * scale_b)[ell.num_dst:]])
        scale_bf = jnp.einsum("vh,hf->vf", scale_b[:ell.num_dst], hmap)
        scale_tf = jnp.einsum("vh,hf->vf", scale_t, hmap)
        u = _tail_combine(ub[:ell.num_dst] * scale_bf, ut * scale_tf,
                          ell.f_tail_rows, ell.num_dst)
    else:
        big_m, big_s, u = mb, sb, ub[:ell.num_dst]
    big_s = jnp.maximum(big_s, 1e-30)
    s_f = jnp.einsum("vh,hf->vf", big_s[:ell.num_dst], hmap)
    out = (u[:ell.num_dst] / s_f).astype(x.dtype)
    return out, (big_m, big_s, u)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_aggregate_linear_heads(ell: EllGraph, x: jax.Array,
                                     a_l: jax.Array, s_dst: jax.Array,
                                     slope: float = 0.2) -> jax.Array:
    """Multi-head ``attention_aggregate_linear``: head h softmax-
    aggregates its OWN lane slice [h·fh, (h+1)·fh) of ``x`` under
    softmax_d(leaky(x[src]_h·a_l[:, h] + s_dst[d, h])), every head
    sharing every slab gather.  ``a_l``: [F/H, H]; ``s_dst``:
    [num_dst, H]; out: [num_dst, F] in head-major lane order (== the
    per-head concat the model builds)."""
    out, _ = _attn_lin_heads_fwd_impl(ell, x, a_l, s_dst, slope)
    return out


def _attn_lin_heads_fwd(ell, x, a_l, s_dst, slope):
    out, (big_m, big_s, _) = _attn_lin_heads_fwd_impl(ell, x, a_l, s_dst,
                                                      slope)
    return out, (ell, x, a_l, s_dst, big_m, big_s)


def _lin_da_pre_pass_heads(idx, xc, a_full, hmap, s_dst_rows, g_rows):
    """Multi-head ``_lin_da_pre_pass``: one gather per slab returns BOTH
    the per-head SDDMM da[r, k, h] = Σ_{f∈h} x[idx]·g[r] and the
    recomputed per-head pre-activations."""
    rows, k = idx.shape
    h = a_full.shape[-1]
    if rows == 0:
        z = jnp.zeros((0, k, h), jnp.float32)
        return z, z
    bv = _slab_gated_blocks(rows, k, xc.shape[-1],
                            itemsize=xc.dtype.itemsize)

    def block(args):
        ib, sdb, gb = args
        xg = jnp.take(xc, ib, axis=0)                     # [bv, K, F]
        da = jnp.einsum("vkf,vf,hf->vkh", xg, gb, hmap,
                        preferred_element_type=jnp.float32)
        pre = jnp.einsum("vkf,fh->vkh", xg, a_full,
                         preferred_element_type=jnp.float32
                         ) + sdb[:, None, :]
        return da, pre

    return _map_row_blocks(block, (idx, s_dst_rows, g_rows), rows, bv)


def _lin_bwd_pass_heads(idx, w, gc, stats4h, x_rows, s_src_rows, f, h,
                        slope, hmap):
    """Multi-head ``_lin_bwd_pass``: per-dst stats are [Vd, 4H] (4 per
    head); same tile-aware transport (ride the g-row gather while
    F + 4H fits one tile, else a standalone pre-gather feeding the block
    as a slot arg).  Returns (dx [rows, F] f32, dspre [rows, H])."""
    rows, k = idx.shape
    if rows == 0:
        return (jnp.zeros((0, f), jnp.float32),
                jnp.zeros((0, h), jnp.float32))
    fuse_lanes = f + 4 * h <= 128
    if fuse_lanes:
        g_aug = jnp.concatenate([gc, stats4h.astype(gc.dtype)], axis=1)
        arrays = (idx, w, x_rows, s_src_rows)
    else:
        g_aug = gc
        # mode="clip": indices are in-range by construction (padding slots
        # carry valid row ids); the default fill mode wraps the gather in
        # a select_n whose broadcast fusion materializes the [rows, K, 4H]
        # result TILE-PADDED (4H lanes → 128, 16× at H=2: 7.1 GB at Reddit
        # scale — compiler OOM in the h2 trainer)
        st_full = jnp.take(stats4h, idx.reshape(-1), axis=0, mode="clip"
                           ).reshape(rows, k, 4 * h)
        arrays = (idx, w, x_rows, s_src_rows, st_full)
    bv = _slab_gated_blocks(rows, k, g_aug.shape[-1],
                            itemsize=g_aug.dtype.itemsize)

    def block(args):
        ib, wb, xrb, ssb = args[:4]
        ga = jnp.take(g_aug, ib, axis=0)
        gslot = ga[..., :f]
        st = (ga[..., f:].astype(jnp.float32) if fuse_lanes else args[4])
        sdk, mk = st[..., :h], st[..., h:2 * h]
        sk = jnp.maximum(st[..., 2 * h:3 * h], 1e-30)
        ink = st[..., 3 * h:]
        valid = (wb != 0)[:, :, None]
        da = jnp.einsum("vkf,vf,hf->vkh", gslot, xrb, hmap,
                        preferred_element_type=jnp.float32)
        pre = ssb[:, None, :] + sdk
        m = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
        a = jnp.exp(m - mk) / sk
        dpre = a * (da - ink) * jnp.where(pre > 0, 1.0, slope)
        dx = jnp.einsum("vkh,hf,vkf->vf", a, hmap, gslot,
                        preferred_element_type=jnp.float32)
        return dx, jnp.sum(dpre, axis=1)

    return _map_row_blocks(block, arrays, rows, bv)


def _attn_lin_heads_bwd(slope, res, g):
    ell, x, a_l, s_dst, big_m, big_s = res
    vd_pad = ell.f_idx.shape[0]
    f = x.shape[-1]
    fh, h = a_l.shape
    has_tail = ell.f_tail_idx.shape[0] > 0
    xc = ell.cast_in(x)
    # f32 expansion of the UNCAST a_l for the score-linearization terms
    # (matches single-head precision); a_full at agg dtype for gathers
    a_full32, hmap = _head_maps(a_l, jnp.float32)
    a_full = a_full32.astype(xc.dtype)
    g_pad = jnp.pad(g, ((0, vd_pad - ell.num_dst), (0, 0)))
    gc = ell.cast_in(g_pad)
    s_dst_p = jnp.pad(s_dst.astype(jnp.float32),
                      ((0, vd_pad - s_dst.shape[0]), (0, 0)))

    # ---- fwd-layout: per-head da + pre from one gather per slab ----
    f_valid = (ell.f_w != 0)[:, :, None]
    da, pre = _lin_da_pre_pass_heads(ell.f_idx, xc, a_full, hmap,
                                     s_dst_p, gc)
    m = jnp.where(f_valid, jax.nn.leaky_relu(pre, slope), _NEG)
    a = jnp.exp(m - big_m[:, None, :]) / big_s[:, None, :]
    inner = jnp.sum(a * da, axis=1)                        # [vd_pad, H]
    if has_tail:
        t_valid = (ell.f_tail_w != 0)[:, :, None]
        s_dst_t = jnp.take(s_dst_p, ell.f_tail_rows, axis=0)
        g_tail = jnp.take(gc, ell.f_tail_rows, axis=0)
        da_t, pre_t = _lin_da_pre_pass_heads(ell.f_tail_idx, xc, a_full,
                                             hmap, s_dst_t, g_tail)
        m_t = jnp.where(t_valid, jax.nn.leaky_relu(pre_t, slope), _NEG)
        mt_row = jnp.take(big_m, ell.f_tail_rows, axis=0)
        st_row = jnp.take(big_s, ell.f_tail_rows, axis=0)
        a_t = jnp.exp(m_t - mt_row[:, None, :]) / st_row[:, None, :]
        inner = jnp.pad(
            _tail_combine(inner[:ell.num_dst],
                          jnp.sum(a_t * da_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            ((0, vd_pad - ell.num_dst), (0, 0)))
    dpre = jnp.where(f_valid,
                     a * (da - inner[:, None, :])
                     * jnp.where(pre > 0, 1.0, slope), 0.0)
    ds_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        inner_t = jnp.take(inner, ell.f_tail_rows, axis=0)
        dpre_t = jnp.where(
            t_valid, a_t * (da_t - inner_t[:, None, :])
            * jnp.where(pre_t > 0, 1.0, slope), 0.0)
        ds_dst = jnp.pad(
            _tail_combine(ds_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            ((0, vd_pad - ell.num_dst), (0, 0)))
    ds_dst = ds_dst[:s_dst.shape[0]]

    # ---- bwd-layout: 4H per-dst stats + g rows ----
    stats4h = jnp.concatenate([s_dst_p, big_m, big_s, inner], axis=1)
    vs_pad = ell.b_idx.shape[0]
    xc_pad = jnp.pad(xc, ((0, vs_pad - xc.shape[0]), (0, 0)))
    s_src = jnp.einsum("vf,fh->vh", xc_pad, a_full,
                       preferred_element_type=jnp.float32)
    dx, dspre = _lin_bwd_pass_heads(ell.b_idx, ell.b_w, gc, stats4h,
                                    xc_pad, s_src, f, h, slope, hmap)
    if ell.b_tail_idx.shape[0]:
        btr = jnp.clip(ell.b_tail_rows, 0, vs_pad - 1)
        xr_t = jnp.take(xc_pad, btr, axis=0)
        ss_t = jnp.take(s_src, btr, axis=0)
        dx_t, dspre_t = _lin_bwd_pass_heads(ell.b_tail_idx, ell.b_tail_w,
                                            gc, stats4h, xr_t, ss_t, f,
                                            h, slope, hmap)
        dx = _tail_combine(dx[:ell.num_src], dx_t, ell.b_tail_rows,
                           ell.num_src)
        dspre = _tail_combine(dspre[:ell.num_src], dspre_t,
                              ell.b_tail_rows, ell.num_src)
    dx = dx[:x.shape[0]]
    dspre = dspre[:x.shape[0]]
    # per-head score linearization: dx += dspre_h·a_l over head h's lanes
    # (A_full is zero off-head); da_l = the block-diagonal of Σ_v x⊗dspre
    dx = (dx + jnp.einsum("vh,fh->vf", dspre, a_full32)).astype(x.dtype)
    gmat = jnp.einsum("vf,vh->fh", x.astype(jnp.float32), dspre,
                      preferred_element_type=jnp.float32)
    da_l = jnp.einsum("gfh,gh->fh", gmat.reshape(h, fh, h),
                      jnp.eye(h, dtype=jnp.float32)).astype(a_l.dtype)
    return None, dx, da_l, ds_dst


attention_aggregate_linear_heads.defvjp(_attn_lin_heads_fwd,
                                        _attn_lin_heads_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention_stats_linear_heads(ell: EllGraph, x: jax.Array,
                                 a_l: jax.Array, s_dst: jax.Array,
                                 slope: float = 0.2):
    """Multi-head ``attention_stats_linear``: returns (num [Vd, F],
    den [Vd, H], c [Vd, H]) unnormalized per-head softmax parts for
    merge_softmax_parts (reshape num to [Vd, H, F/H] so den/c broadcast
    per head, merge, reshape back) — the PROC_OVERLAP split analogue of
    ``attention_aggregate_linear_heads``, ONE shared gather per slab for
    all heads."""
    _, (big_m, big_s, u) = _attn_lin_heads_fwd_impl(ell, x, a_l, s_dst,
                                                    slope)
    return (u[:ell.num_dst].astype(x.dtype), big_s[:ell.num_dst],
            big_m[:ell.num_dst])


def _attn_stats_lin_heads_fwd(ell, x, a_l, s_dst, slope):
    _, (big_m, big_s, u) = _attn_lin_heads_fwd_impl(ell, x, a_l, s_dst,
                                                    slope)
    out = (u[:ell.num_dst].astype(x.dtype), big_s[:ell.num_dst],
           big_m[:ell.num_dst])
    return out, (ell, x, a_l, s_dst, big_m)


def _attn_stats_lin_heads_bwd(slope, res, g):
    """Heads version of _attn_stats_lin_bwd: z = e^{m−c} per (slot, head),
    dpre = z·(x_h·dnum_h + dden_h)·leaky′ — c is a stop-grad stabilizer,
    so no softmax inner term (it appears only through the merge's AD)."""
    dnum, dden, _dc = g
    ell, x, a_l, s_dst, big_m = res
    vd_pad = ell.f_idx.shape[0]
    f = x.shape[-1]
    fh, h = a_l.shape
    has_tail = ell.f_tail_idx.shape[0] > 0
    xc = ell.cast_in(x)
    a_full32, hmap = _head_maps(a_l, jnp.float32)   # f32 linearization
    a_full = a_full32.astype(xc.dtype)
    dnum_pad = jnp.pad(dnum, ((0, vd_pad - ell.num_dst), (0, 0)))
    dnc = ell.cast_in(dnum_pad)
    dden_pad = jnp.pad(dden, ((0, vd_pad - ell.num_dst), (0, 0)))
    s_dst_p = jnp.pad(s_dst.astype(jnp.float32),
                      ((0, vd_pad - s_dst.shape[0]), (0, 0)))

    # ---- fwd-layout: per-head da + pre → ds_dst ----
    f_valid = (ell.f_w != 0)[:, :, None]
    da, pre = _lin_da_pre_pass_heads(ell.f_idx, xc, a_full, hmap,
                                     s_dst_p, dnc)
    m = jnp.where(f_valid, jax.nn.leaky_relu(pre, slope), _NEG)
    z = jnp.exp(m - big_m[:, None, :])
    # where-mask, not just z==0: empty-everywhere rows carry NaN dden
    # cotangents (merge's clamped-den division VJP; den² underflows f32)
    dpre = jnp.where(f_valid,
                     z * (da + dden_pad[:, None, :])
                     * jnp.where(pre > 0, 1.0, slope), 0.0)
    ds_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        t_valid = (ell.f_tail_w != 0)[:, :, None]
        s_dst_t = jnp.take(s_dst_p, ell.f_tail_rows, axis=0)
        dn_t = jnp.take(dnc, ell.f_tail_rows, axis=0)
        da_t, pre_t = _lin_da_pre_pass_heads(ell.f_tail_idx, xc, a_full,
                                             hmap, s_dst_t, dn_t)
        m_t = jnp.where(t_valid, jax.nn.leaky_relu(pre_t, slope), _NEG)
        z_t = jnp.exp(m_t - jnp.take(big_m, ell.f_tail_rows,
                                     axis=0)[:, None, :])
        dpre_t = jnp.where(
            t_valid,
            z_t * (da_t + jnp.take(dden_pad, ell.f_tail_rows,
                                   axis=0)[:, None, :])
            * jnp.where(pre_t > 0, 1.0, slope), 0.0)
        ds_dst = jnp.pad(
            _tail_combine(ds_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                          ell.f_tail_rows, ell.num_dst),
            ((0, vd_pad - ell.num_dst), (0, 0)))
    ds_dst = ds_dst[:s_dst.shape[0]]

    # ---- bwd-layout: 3H per-dst stats travel with the dnum gather ----
    stats3h = jnp.concatenate([s_dst_p, big_m, dden_pad], axis=1)
    vs_pad = ell.b_idx.shape[0]
    xc_pad = jnp.pad(xc, ((0, vs_pad - xc.shape[0]), (0, 0)))
    s_src = jnp.einsum("vf,fh->vh", xc_pad, a_full,
                       preferred_element_type=jnp.float32)
    dx, dspre = _lin_stats_bwd_pass_heads(ell.b_idx, ell.b_w, dnc,
                                          stats3h, xc_pad, s_src, f, h,
                                          slope, hmap)
    if ell.b_tail_idx.shape[0]:
        btr = jnp.clip(ell.b_tail_rows, 0, vs_pad - 1)
        xr_t = jnp.take(xc_pad, btr, axis=0)
        ss_t = jnp.take(s_src, btr, axis=0)
        dx_t, dspre_t = _lin_stats_bwd_pass_heads(
            ell.b_tail_idx, ell.b_tail_w, dnc, stats3h, xr_t, ss_t, f, h,
            slope, hmap)
        dx = _tail_combine(dx[:ell.num_src], dx_t, ell.b_tail_rows,
                           ell.num_src)
        dspre = _tail_combine(dspre[:ell.num_src], dspre_t,
                              ell.b_tail_rows, ell.num_src)
    dx = dx[:x.shape[0]]
    dspre = dspre[:x.shape[0]]
    dx = (dx + jnp.einsum("vh,fh->vf", dspre, a_full32)).astype(x.dtype)
    gmat = jnp.einsum("vf,vh->fh", x.astype(jnp.float32), dspre,
                      preferred_element_type=jnp.float32)
    da_l = jnp.einsum("gfh,gh->fh", gmat.reshape(h, fh, h),
                      jnp.eye(h, dtype=jnp.float32)).astype(a_l.dtype)
    return None, dx, da_l, ds_dst


def _lin_stats_bwd_pass_heads(idx, w, dnc, stats3h, x_rows, s_src_rows,
                              f, h, slope, hmap):
    """Heads version of _lin_stats_bwd_pass (3H per-dst stats; same
    tile-aware transport as _lin_bwd_pass_heads).
    Returns (dx [rows, F] f32 = Σ_k z_h·dnum over head lanes,
    dspre [rows, H])."""
    rows, k = idx.shape
    if rows == 0:
        return (jnp.zeros((0, f), jnp.float32),
                jnp.zeros((0, h), jnp.float32))
    fuse_lanes = f + 3 * h <= 128
    if fuse_lanes:
        g_aug = jnp.concatenate([dnc, stats3h.astype(dnc.dtype)], axis=1)
        arrays = (idx, w, x_rows, s_src_rows)
    else:
        g_aug = dnc
        st_full = jnp.take(stats3h, idx.reshape(-1), axis=0, mode="clip"
                           ).reshape(rows, k, 3 * h)
        arrays = (idx, w, x_rows, s_src_rows, st_full)
    bv = _slab_gated_blocks(rows, k, g_aug.shape[-1],
                            itemsize=g_aug.dtype.itemsize)

    def block(args):
        ib, wb, xrb, ssb = args[:4]
        ga = jnp.take(g_aug, ib, axis=0)
        dnk = ga[..., :f]
        st = (ga[..., f:].astype(jnp.float32) if fuse_lanes else args[4])
        sdk, ck, ddk = st[..., :h], st[..., h:2 * h], st[..., 2 * h:]
        valid = (wb != 0)[:, :, None]
        da = jnp.einsum("vkf,vf,hf->vkh", dnk, xrb, hmap,
                        preferred_element_type=jnp.float32)
        pre = ssb[:, None, :] + sdk
        m = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
        z = jnp.exp(m - ck)
        dpre = jnp.where(valid,
                         z * (da + ddk) * jnp.where(pre > 0, 1.0, slope),
                         0.0)
        dx = jnp.einsum("vkh,hf,vkf->vf", z, hmap, dnk,
                        preferred_element_type=jnp.float32)
        return dx, jnp.sum(dpre, axis=1)

    return _map_row_blocks(block, arrays, rows, bv)


attention_stats_linear_heads.defvjp(_attn_stats_lin_heads_fwd,
                                    _attn_stats_lin_heads_bwd)


# ---------------------------------------------------------------------------
# Fused multi-lane gated aggregation (GGCN)
# ---------------------------------------------------------------------------

def _slab_gated_blocks(rows, k, f, budget=None, itemsize=4):
    """Helper: iterate row blocks with [bv, K, F] temps under the budget."""
    budget = budget or _BLOCK_GATHER_BUDGET
    bv = max(8, min(rows, budget // max(k * f * itemsize, 1)))
    return max(8, (bv // 8) * 8)


def _gated_scores(ell: EllGraph, g_src, g_dst, slope, stats=False):
    """Per-lane masked softmax over each dst row's slots (base ∥ tail).

    g_src: [Vs, F] source gate terms; g_dst: [num_dst, F].
    Returns (a [Vd_pad,K,F], a_t [Rv,K,F], pre, pre_t, row_max, ssum);
    with ``stats=True`` the slot weights are UN-normalized z.
    """
    vd_pad, k = ell.f_idx.shape
    f = g_src.shape[-1]
    g_dst_p = jnp.pad(g_dst, ((0, vd_pad - g_dst.shape[0]), (0, 0)))
    f_valid = (ell.f_w != 0)[:, :, None]
    has_tail = ell.f_tail_idx.shape[0] > 0

    pre = jnp.take(g_src, ell.f_idx, axis=0) + g_dst_p[:, None, :]
    m = jnp.where(f_valid, jax.nn.leaky_relu(pre, slope), _NEG)
    if has_tail:
        t_valid = (ell.f_tail_w != 0)[:, :, None]
        pre_t = (jnp.take(g_src, ell.f_tail_idx, axis=0)
                 + jnp.take(g_dst_p, jnp.clip(ell.f_tail_rows, 0, vd_pad - 1),
                            axis=0)[:, None, :])
        m_t = jnp.where(t_valid, jax.nn.leaky_relu(pre_t, slope), _NEG)
    else:
        pre_t = None
        m_t = jnp.zeros((0, k, f), m.dtype)

    row_max = jnp.max(m, axis=1)                                # [Vd_pad, F]
    if has_tail:
        comb = _tail_combine(row_max[:ell.num_dst], jnp.max(m_t, axis=1),
                             ell.f_tail_rows, ell.num_dst, op="max")
        row_max = jnp.concatenate([comb, row_max[ell.num_dst:]])
    row_max = jnp.maximum(row_max, _NEG / 2)
    z = jnp.where(f_valid, jnp.exp(m - row_max[:, None, :]), 0.0)
    ssum = jnp.sum(z, axis=1)
    if has_tail:
        z_t = jnp.where(
            t_valid,
            jnp.exp(m_t - jnp.take(row_max,
                                   jnp.clip(ell.f_tail_rows, 0, vd_pad - 1),
                                   axis=0)[:, None, :]), 0.0)
        comb = _tail_combine(ssum[:ell.num_dst], jnp.sum(z_t, axis=1),
                             ell.f_tail_rows, ell.num_dst)
        ssum = jnp.concatenate([comb, ssum[ell.num_dst:]])
    else:
        z_t = m_t
    ssum = jnp.maximum(ssum, 1e-30)
    if stats:
        return z, z_t, pre, pre_t, row_max, ssum
    a = z / ssum[:, None, :]
    a_t = (z_t / jnp.take(ssum, jnp.clip(ell.f_tail_rows, 0, vd_pad - 1),
                          axis=0)[:, None, :] if has_tail else z_t)
    return a, a_t, pre, pre_t, row_max, ssum


def slab_gated_matvec(idx: jax.Array, w3: jax.Array, x: jax.Array
                      ) -> jax.Array:
    """out[r,f] = Σ_k w3[r,k,f] · x[idx[r,k], f] — slab aggregate with
    per-slot per-lane weights, chunked like slab_matvec."""
    rows, k = idx.shape
    f = x.shape[-1]
    if rows == 0:
        return jnp.zeros((0, f), x.dtype)
    bv = _slab_gated_blocks(rows, k, f, itemsize=x.dtype.itemsize)

    def block(args):
        ib, wb = args
        g = jnp.take(x, ib, axis=0)                   # [bv, K, F]
        return jnp.sum(wb * g, axis=1).astype(x.dtype)

    return _map_row_blocks(block, (idx, w3), rows, bv)


# Above this many bytes of [slots, F] score tensors the gated op switches
# to the CHUNKED pipeline (blockwise stat passes + layout-native backward,
# nothing slot-shaped ever materialized) — the dense form crashes the
# compiler at Reddit scale (16.8M slots × F ≥ 64).
_GATED_CHUNK_BYTES = int(os.environ.get("NSL_GATED_CHUNK_MB", "1024")) * 2**20


def _gated_big(ell: EllGraph, f: int) -> bool:
    slots = (ell.f_idx.size + ell.f_tail_idx.size
             + ell.b_idx.size + ell.b_tail_idx.size)
    return slots * f * 4 > _GATED_CHUNK_BYTES


def _map_row_blocks(fn, arrays, rows, bv):
    """Apply ``fn`` over row blocks of equally-row-counted arrays, concat
    results ([rows, ...] outputs). Single-block case skips lax.map."""
    if rows <= bv:
        return fn(tuple(arrays))
    n_blocks = -(-rows // bv)
    pad = n_blocks * bv - rows
    padded = [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
              for a in arrays]
    shaped = tuple(a.reshape((n_blocks, bv) + a.shape[1:]) for a in padded)
    outs = jax.lax.map(fn, shaped)
    if isinstance(outs, tuple):
        return tuple(o.reshape((n_blocks * bv,) + o.shape[2:])[:rows]
                     for o in outs)
    return outs.reshape((n_blocks * bv,) + outs.shape[2:])[:rows]


def _gated_chunked_fwd(ell: EllGraph, x, g_src, g_dst, slope, gl=None):
    """Chunked gated forward: ONE blockwise dst-major slot pass computing
    per-slab-row online-softmax triples (row-max m, exp-sum s, weighted
    out o) — each block sees its rows' full K slots, so m is exact per
    slab row; base/tail merging rescales the cheap [rows, F] stats by
    exp(m − M) instead of re-gathering slots for a separate max pass
    (which is what the pre-r2c two-pass version paid). Peak temp is one
    [bv, K, 2F] block, never a [slots, F] tensor.

    With ``gl`` (the linear-gate mode, `gated_aggregate_linear`): the
    source gate term g_src = x·gl is recomputed IN-BLOCK on the MXU from
    the already-gathered feature rows, so the slot gather is F lanes, not
    2F — gather traffic halves and the matmul rides the otherwise-idle
    MXU (~[bv·K, F]×[F, F] per block). ``g_src`` is ignored then.

    Returns (out, (row_max, ssum)) with the merged per-row softmax stats
    saved for the layout-native backward."""
    vd_pad, k = ell.f_idx.shape
    f = x.shape[-1]
    xc = ell.cast_in(x)
    g_dst_p = jnp.pad(g_dst, ((0, vd_pad - g_dst.shape[0]), (0, 0)))
    has_tail = ell.f_tail_idx.shape[0] > 0
    trows = jnp.clip(ell.f_tail_rows, 0, vd_pad - 1) if has_tail else None

    if gl is None:
        # [g_src ‖ x] as ONE 2F table: one wide gather per slot, not two
        table2 = jnp.concatenate([g_src, xc.astype(g_src.dtype)], axis=-1)
        glc = None
    else:
        table2 = xc
        glc = gl.astype(xc.dtype)

    def blk_mso(args):
        ib, wb, gd = args
        t = jnp.take(table2, ib, axis=0)              # [bv, K, 2F | F]
        if glc is None:
            gs, xg = t[..., :f], t[..., f:]
        else:
            xg = t
            gs = jnp.einsum("vkf,fo->vko", xg, glc,
                            preferred_element_type=jnp.float32
                            ).astype(xg.dtype)
        pre = gs + gd[:, None, :]
        valid = (wb != 0)[:, :, None]
        lk = jnp.where(valid, jax.nn.leaky_relu(pre, slope), _NEG)
        m = jnp.max(lk, axis=1)                       # exact per slab row
        z = jnp.where(valid, jnp.exp(lk - m[:, None, :]), 0.0)
        return m, jnp.sum(z, axis=1), jnp.sum(z * xg, axis=1)

    bv2 = _slab_gated_blocks(vd_pad, k, 2 * f)
    m_b, s_b, o_b = _map_row_blocks(
        blk_mso, (ell.f_idx, ell.f_w, g_dst_p), vd_pad, bv2)
    if has_tail:
        gd_t = jnp.take(g_dst_p, trows, axis=0)
        m_t, s_t, o_t = _map_row_blocks(
            blk_mso, (ell.f_tail_idx, ell.f_tail_w, gd_t),
            ell.f_tail_idx.shape[0], bv2)
        comb = _tail_combine(m_b[:ell.num_dst], m_t, ell.f_tail_rows,
                             ell.num_dst, op="max")
        rmax = jnp.maximum(jnp.concatenate([comb, m_b[ell.num_dst:]]),
                           _NEG / 2)
        sc_b = jnp.exp(m_b - rmax)
        sc_t = jnp.exp(m_t - jnp.take(rmax, trows, axis=0))
        ssum = jnp.concatenate([
            _tail_combine((s_b * sc_b)[:ell.num_dst], s_t * sc_t,
                          ell.f_tail_rows, ell.num_dst),
            (s_b * sc_b)[ell.num_dst:]])
        outz = jnp.concatenate([
            _tail_combine((o_b * sc_b)[:ell.num_dst], o_t * sc_t,
                          ell.f_tail_rows, ell.num_dst),
            (o_b * sc_b)[ell.num_dst:]])
    else:
        rmax = jnp.maximum(m_b, _NEG / 2)
        sc_b = jnp.exp(m_b - rmax)
        ssum, outz = s_b * sc_b, o_b * sc_b
    ssum = jnp.maximum(ssum, 1e-30)
    out = (outz[:ell.num_dst] / ssum[:ell.num_dst]).astype(x.dtype)
    return out, (rmax, ssum, outz)


def _gated_chunked_bwd(ell: EllGraph, x, g_src, g_dst, slope, g, rmax, ssum,
                       gl=None):
    """Chunked gated backward. Pass C (dst-major, blockwise) accumulates
    inner = Σ a·da plus S1 = Σ a·dleaky·da and S2 = Σ a·dleaky, giving
    dg_dst = S1 − inner·S2 in closed form. Passes E/F (src-major base/tail)
    RECOMPUTE a and dpre per slot from a single 4F-wide gather of the
    per-dst stats table [g_dst ‖ g/ssum ‖ row_max ‖ inner/ssum] — the
    1/ssum normalization is folded into the g and inner lanes per dst row
    BEFORE the gather (a·gr = e·(gr/ss), a·dl·(da−inn) = e·dl·(xs·gr/ss −
    inn/ss)), so ssum needs no lanes of its own. No slot permutation, no
    [slots, F] flat table (contrast the dense `_gated_bwd`, whose b_perm
    gather is faster but needs the full table resident)."""
    vd_pad, k = ell.f_idx.shape
    f = x.shape[-1]
    xc = ell.cast_in(x)
    g_dst_p = jnp.pad(g_dst, ((0, vd_pad - g_dst.shape[0]), (0, 0)))
    g_pad = jnp.pad(g, ((0, vd_pad - ell.num_dst), (0, 0))
                    ).astype(g_src.dtype)
    has_tail = ell.f_tail_idx.shape[0] > 0
    trows = jnp.clip(ell.f_tail_rows, 0, vd_pad - 1) if has_tail else None
    if gl is None:
        table2 = jnp.concatenate([g_src, xc.astype(g_src.dtype)], axis=-1)
        glc = None
    else:
        # linear-gate mode: gather x only, recompute g_src in-block (MXU)
        table2 = xc
        glc = gl.astype(xc.dtype)

    def blk_inner(args):
        ib, wb, gd, rm, ss, gr = args
        t = jnp.take(table2, ib, axis=0)
        if glc is None:
            gs, xg = t[..., :f], t[..., f:]
        else:
            xg = t
            gs = jnp.einsum("vkf,fo->vko", xg, glc,
                            preferred_element_type=jnp.float32
                            ).astype(xg.dtype)
        pre = gs + gd[:, None, :]
        valid = (wb != 0)[:, :, None]
        a = jnp.where(valid, jnp.exp(jax.nn.leaky_relu(pre, slope)
                                     - rm[:, None, :]) / ss[:, None, :], 0.0)
        da = xg * gr[:, None, :]
        dl = jnp.where(pre > 0, 1.0, slope)
        return (jnp.sum(a * da, axis=1), jnp.sum(a * dl * da, axis=1),
                jnp.sum(a * dl, axis=1))

    bv2 = _slab_gated_blocks(vd_pad, k, 2 * f)
    inner, s1, s2 = _map_row_blocks(
        blk_inner, (ell.f_idx, ell.f_w, g_dst_p, rmax, ssum, g_pad),
        vd_pad, bv2)
    if has_tail:
        gd_t = jnp.take(g_dst_p, trows, axis=0)
        rm_t = jnp.take(rmax, trows, axis=0)
        ss_t = jnp.take(ssum, trows, axis=0)
        gr_t = jnp.take(g_pad, trows, axis=0)
        inner_t, s1_t, s2_t = _map_row_blocks(
            blk_inner,
            (ell.f_tail_idx, ell.f_tail_w, gd_t, rm_t, ss_t, gr_t),
            ell.f_tail_idx.shape[0], bv2)
        inner = jnp.concatenate([
            _tail_combine(inner[:ell.num_dst], inner_t, ell.f_tail_rows,
                          ell.num_dst), inner[ell.num_dst:]])
        s1 = jnp.concatenate([
            _tail_combine(s1[:ell.num_dst], s1_t, ell.f_tail_rows,
                          ell.num_dst), s1[ell.num_dst:]])
        s2 = jnp.concatenate([
            _tail_combine(s2[:ell.num_dst], s2_t, ell.f_tail_rows,
                          ell.num_dst), s2[ell.num_dst:]])
    dg_dst = (s1 - inner * s2)[:g_dst.shape[0]]

    # per-dst stats table for the src-major passes (1/ssum pre-folded).
    # Shipped at the aggregate dtype: under agg_dtype=bfloat16 this halves
    # the dominant backward gather (the 4F stats lanes dwarf the F-lane
    # feature gathers — 16F bytes/slot f32 vs 2F for bf16 x). The in-block
    # math promotes back to f32 against the f32 row args; rmax is an
    # upper bound of the in-block scores, so exp(lk − rm_bf16) incurs a
    # per-(dst,lane) gradient scale wobble ≤ exp(|rmax|·2⁻⁹) — magnitude-
    # dependent (≈0.2% at |rmax|=1, ~4% at |rmax|=20), not an overflow
    # risk; bounded in practice by the 3% rel-L2 tolerance pinned in
    # test_bf16_chunked_grads_close_to_f32 on realistic score ranges.
    stats = ell.cast_in(
        jnp.concatenate([g_dst_p, g_pad / ssum, rmax, inner / ssum],
                        axis=-1))

    vs_pad, kb = ell.b_idx.shape
    g_src_p = jnp.pad(g_src, ((0, vs_pad - g_src.shape[0]), (0, 0)))
    x_p = jnp.pad(xc.astype(g_src.dtype),
                  ((0, vs_pad - x.shape[0]), (0, 0)))

    def blk_src(args):
        ib, wb, gs, xs = args
        t = jnp.take(stats, ib, axis=0)               # [bv, Kb, 4F]
        gd, gr2 = t[..., :f], t[..., f:2 * f]
        rm, inn2 = t[..., 2 * f:3 * f], t[..., 3 * f:]
        pre = gs[:, None, :] + gd
        valid = (wb != 0)[:, :, None]
        e = jnp.where(valid,
                      jnp.exp(jax.nn.leaky_relu(pre, slope) - rm), 0.0)
        dl = jnp.where(pre > 0, 1.0, slope)
        return (jnp.sum(e * dl * (xs[:, None, :] * gr2 - inn2), axis=1),
                jnp.sum(e * gr2, axis=1))             # dg_src rows, dx rows

    # block sizing stays at f32 itemsize even when stats are bf16: the
    # in-block f32 temps (pre/e/dl) scale with rows too, and 2× rows
    # measured SLOWER (0.787 vs 0.685 s/epoch at Reddit scale, r3)
    bv4 = _slab_gated_blocks(vs_pad, kb, 4 * f)
    dg_src, dx = _map_row_blocks(
        blk_src, (ell.b_idx, ell.b_w, g_src_p, x_p), vs_pad, bv4)
    if ell.b_tail_idx.shape[0]:
        btr = jnp.clip(ell.b_tail_rows, 0, vs_pad - 1)
        gs_t = jnp.take(g_src_p, btr, axis=0)
        xs_t = jnp.take(x_p, btr, axis=0)
        dg_src_t, dx_t = _map_row_blocks(
            blk_src, (ell.b_tail_idx, ell.b_tail_w, gs_t, xs_t),
            ell.b_tail_idx.shape[0], bv4)
        dg_src = _tail_combine(dg_src[:ell.num_src], dg_src_t,
                               ell.b_tail_rows, ell.num_src)
        dx = _tail_combine(dx[:ell.num_src], dx_t, ell.b_tail_rows,
                           ell.num_src)
    else:
        dg_src = dg_src[:ell.num_src]
        dx = dx[:ell.num_src]
    return (dx[:x.shape[0]].astype(x.dtype), dg_src[:g_src.shape[0]],
            dg_dst)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gated_aggregate(ell: EllGraph, x: jax.Array, g_src: jax.Array,
                    g_dst: jax.Array, slope: float = 0.2) -> jax.Array:
    """out[d,f] = Σ_k softmax_{d,f}(leaky(g_src[src,f]+g_dst[d,f]))·x[src,f].

    GGCN's per-FEATURE gated edge chain (toolkits/GGCN_CPU.hpp:184-220) as
    one scatter-free slab op — the multi-lane generalization of
    ``attention_aggregate`` (lane-wise softmax over incoming slots).
    Above _GATED_CHUNK_BYTES of score tensors it switches to the chunked
    pipeline (static-shape decision), enabling Reddit-scale GGCN.
    """
    if _gated_big(ell, x.shape[-1]):
        out, _ = _gated_chunked_fwd(ell, x, g_src, g_dst, slope)
        return out
    out, _ = _gated_fwd_impl(ell, x, g_src, g_dst, slope)
    return out


def _gated_fwd_impl(ell, x, g_src, g_dst, slope):
    a, a_t, pre, pre_t, _, _ = _gated_scores(ell, g_src, g_dst, slope)
    xc = ell.cast_in(x)
    out = slab_gated_matvec(ell.f_idx, a, xc)[:ell.num_dst]
    tail = slab_gated_matvec(ell.f_tail_idx, a_t, xc)
    out = _tail_combine(out, tail, ell.f_tail_rows,
                        ell.num_dst).astype(x.dtype)
    return out, (a, a_t, pre, pre_t)


def _gated_fwd(ell, x, g_src, g_dst, slope):
    if _gated_big(ell, x.shape[-1]):
        out, (rmax, ssum, _) = _gated_chunked_fwd(ell, x, g_src, g_dst,
                                                  slope)
        # row stats ([Vd_pad, F], small) spare the backward one full
        # stat-recompute pass; everything slot-shaped is rematerialized
        return out, (ell, x, g_src, g_dst, rmax, ssum)
    out, _ = _gated_fwd_impl(ell, x, g_src, g_dst, slope)
    # save only the inputs: the [V,K,F] score tensors are recomputed in the
    # backward (rematerialization — they dominate HBM otherwise)
    return out, (ell, x, g_src, g_dst, None, None)


def _gated_bwd(slope, resid, g):
    ell, x, g_src, g_dst, rmax, ssum = resid
    if rmax is not None:
        return (None,) + _gated_chunked_bwd(ell, x, g_src, g_dst, slope, g,
                                            rmax, ssum)
    a, a_t, pre_b, pre_t, _, _ = _gated_scores(ell, g_src, g_dst, slope)
    vd_pad = ell.f_idx.shape[0]
    has_tail = ell.f_tail_idx.shape[0] > 0
    f_valid = (ell.f_w != 0)[:, :, None]
    g_pad = jnp.pad(g, ((0, vd_pad - ell.num_dst), (0, 0)))
    trows = jnp.clip(ell.f_tail_rows, 0, vd_pad - 1)
    xc = ell.cast_in(x)          # bf16 feature gathers (see _attn_bwd)
    gc = ell.cast_in(g_pad)

    # da[r,k,f] = x[idx][f] · g[r,f]
    da = jnp.take(xc, ell.f_idx, axis=0) * g_pad[:, None, :]
    if has_tail:
        t_valid = (ell.f_tail_w != 0)[:, :, None]
        da_t = (jnp.take(xc, ell.f_tail_idx, axis=0)
                * jnp.take(g_pad, trows, axis=0)[:, None, :])
    else:
        da_t = jnp.zeros_like(a_t)

    inner = jnp.sum(a * da, axis=1)                     # [Vd_pad, F]
    if has_tail:
        comb = _tail_combine(inner[:ell.num_dst],
                             jnp.sum(a_t * da_t, axis=1),
                             ell.f_tail_rows, ell.num_dst)
        inner = jnp.concatenate([comb, inner[ell.num_dst:]])
    dm = a * (da - inner[:, None, :])
    dpre = jnp.where(f_valid, dm * jnp.where(pre_b > 0, 1.0, slope), 0.0)
    if has_tail:
        dm_t = a_t * (da_t - jnp.take(inner, trows, axis=0)[:, None, :])
        dpre_t = jnp.where(t_valid,
                           dm_t * jnp.where(pre_t > 0, 1.0, slope), 0.0)
    else:
        dpre_t = jnp.zeros_like(a_t)

    dg_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        comb = _tail_combine(dg_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                             ell.f_tail_rows, ell.num_dst)
        dg_dst = jnp.concatenate([comb, dg_dst[ell.num_dst:]])
    dg_dst = dg_dst[:g_dst.shape[0]]

    # dpre and a share the slot permutation — one [slots, 2F] gather
    # (_perm_bwd_lanes); dX is the a-weighted transposed aggregate
    dg_src, dx = _perm_bwd_lanes(ell, dpre, dpre_t, a, a_t, gc)
    dg_src = dg_src[:g_src.shape[0]]
    dx = dx[:x.shape[0]].astype(x.dtype)
    return None, dx, dg_src, dg_dst


gated_aggregate.defvjp(_gated_fwd, _gated_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gated_stats(ell: EllGraph, x: jax.Array, g_src: jax.Array,
                g_dst: jax.Array, slope: float = 0.2):
    """Per-FEATURE-lane unnormalized softmax-aggregate parts of this slab
    set: (num [Vd,F], den [Vd,F], c [Vd,F]) — the gated (GGCN) analogue of
    ``attention_stats`` for merge_softmax_parts. Dense form only (the
    chunked big-graph pipeline is not needed per-device at dist scales)."""
    num, den, c, _ = _gated_stats_fwd_impl(ell, x, g_src, g_dst, slope)
    return num, den, c


def _gated_stats_fwd_impl(ell, x, g_src, g_dst, slope):
    z, z_t, pre, pre_t, row_max, ssum = _gated_scores(ell, g_src, g_dst,
                                                      slope, stats=True)
    xc = ell.cast_in(x)
    num = slab_gated_matvec(ell.f_idx, z, xc)[:ell.num_dst]
    tail = slab_gated_matvec(ell.f_tail_idx, z_t, xc)
    num = _tail_combine(num, tail, ell.f_tail_rows,
                        ell.num_dst).astype(x.dtype)
    return num, ssum[:ell.num_dst], row_max[:ell.num_dst], None


def _gated_stats_fwd(ell, x, g_src, g_dst, slope):
    num, den, c, _ = _gated_stats_fwd_impl(ell, x, g_src, g_dst, slope)
    # inputs-only residuals: [V,K,F] score tensors are recomputed in the
    # backward (rematerialization, same policy as _gated_fwd)
    return (num, den, c), (ell, x, g_src, g_dst)


def _gated_stats_bwd(slope, res, g):
    dnum, dden, _dc = g        # c is a stop-grad stabilizer by construction
    ell, x, g_src, g_dst = res
    z, z_t, pre_b, pre_t, _, _ = _gated_scores(ell, g_src, g_dst, slope,
                                               stats=True)
    vd_pad = ell.f_idx.shape[0]
    has_tail = ell.f_tail_idx.shape[0] > 0
    f_valid = (ell.f_w != 0)[:, :, None]
    trows = jnp.clip(ell.f_tail_rows, 0, vd_pad - 1)
    dnum_pad = jnp.pad(dnum, ((0, vd_pad - ell.num_dst), (0, 0)))
    dden_pad = jnp.pad(dden, ((0, vd_pad - ell.num_dst), (0, 0)))
    xc = ell.cast_in(x)
    dnc = ell.cast_in(dnum_pad)

    dz = (jnp.take(xc, ell.f_idx, axis=0) * dnum_pad[:, None, :]
          + dden_pad[:, None, :])
    dpre = jnp.where(f_valid, z * dz * jnp.where(pre_b > 0, 1.0, slope), 0.0)
    if has_tail:
        t_valid = (ell.f_tail_w != 0)[:, :, None]
        dz_t = (jnp.take(xc, ell.f_tail_idx, axis=0)
                * jnp.take(dnum_pad, trows, axis=0)[:, None, :]
                + jnp.take(dden_pad, trows, axis=0)[:, None, :])
        dpre_t = jnp.where(
            t_valid, z_t * dz_t * jnp.where(pre_t > 0, 1.0, slope), 0.0)
    else:
        dpre_t = jnp.zeros_like(z_t)

    dg_dst = jnp.sum(dpre, axis=1)
    if has_tail:
        comb = _tail_combine(dg_dst[:ell.num_dst], jnp.sum(dpre_t, axis=1),
                             ell.f_tail_rows, ell.num_dst)
        dg_dst = jnp.concatenate([comb, dg_dst[ell.num_dst:]])
    dg_dst = dg_dst[:g_dst.shape[0]]

    dg_src, dx = _perm_bwd_lanes(ell, dpre, dpre_t, z, z_t, dnc)
    dg_src = dg_src[:g_src.shape[0]]
    dx = dx[:x.shape[0]].astype(x.dtype)
    return None, dx, dg_src, dg_dst


gated_stats.defvjp(_gated_stats_fwd, _gated_stats_bwd)


# ---------------------------------------------------------------------------
# Linear-gate fused aggregation (GGCN, g_src = x·gl recomputed in-block)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gated_aggregate_linear(ell: EllGraph, x: jax.Array, gl: jax.Array,
                           g_dst: jax.Array, slope: float = 0.2
                           ) -> jax.Array:
    """``gated_aggregate(ell, x, x @ gl, g_dst)`` with the source gate term
    recomputed in-block: on the chunked (big-graph) path the slot passes
    gather ONLY the x rows (F lanes, not 2F) and form g_src = x·gl on the
    MXU inside each block — the multi-lane analogue of
    ``attention_aggregate_linear``'s score recomputation. GGCN's gate is
    exactly this shape (toolkits/GGCN_CPU.hpp:184-220: per-vertex gate
    terms are linear in the transformed features). ``gl`` must be square
    [F, F] (gate lanes == aggregated lanes)."""
    if gl.shape[0] != gl.shape[1] or gl.shape[0] != x.shape[-1]:
        raise ValueError(
            f"gated_aggregate_linear needs square gl matching x's lane "
            f"count (gate lanes == aggregated lanes); got gl {gl.shape} "
            f"for x [..., {x.shape[-1]}]")
    if _gated_big(ell, x.shape[-1]):
        out, _ = _gated_chunked_fwd(ell, x, None, g_dst, slope, gl=gl)
        return out
    out, _ = _gated_fwd_impl(ell, x, x @ gl, g_dst, slope)
    return out


def _gated_lin_fwd(ell, x, gl, g_dst, slope):
    if _gated_big(ell, x.shape[-1]):
        out, (rmax, ssum, _) = _gated_chunked_fwd(ell, x, None, g_dst,
                                                  slope, gl=gl)
        return out, (ell, x, gl, g_dst, rmax, ssum)
    out, _ = _gated_fwd_impl(ell, x, x @ gl, g_dst, slope)
    return out, (ell, x, gl, g_dst, None, None)


def _gated_lin_bwd(slope, resid, g):
    ell, x, gl, g_dst, rmax, ssum = resid
    g_src = x @ gl                       # one MXU matmul, for the src pass
    if rmax is not None:
        dx_agg, dg_src, dg_dst = _gated_chunked_bwd(
            ell, x, g_src, g_dst, slope, g, rmax, ssum, gl=gl)
    else:
        _, dx_agg, dg_src, dg_dst = _gated_bwd(
            slope, (ell, x, g_src, g_dst, None, None), g)
    # chain rule through g_src = x·gl
    dgl = jnp.einsum("vf,vo->fo", x.astype(jnp.float32),
                     dg_src.astype(jnp.float32),
                     preferred_element_type=jnp.float32).astype(gl.dtype)
    dx = (dx_agg.astype(jnp.float32)
          + dg_src.astype(jnp.float32) @ gl.astype(jnp.float32).T
          ).astype(x.dtype)
    return None, dx, dgl, dg_dst


gated_aggregate_linear.defvjp(_gated_lin_fwd, _gated_lin_bwd)


# ---------------------------------------------------------------------------
# Linear-gate softmax stats (PROC_OVERLAP split × GGCN fast path)
# ---------------------------------------------------------------------------
#
# gated_stats with the linear-gate in-block recompute: each PROC_OVERLAP
# slab set contributes per-lane unnormalized parts (num, den, c) for
# merge_softmax_parts while the slot passes gather ONLY the feature rows
# (F lanes, not 2F) and form g_src = x·gl on the MXU inside each block —
# the split path keeps the optimization that bought 1.449→0.923 s/epoch
# single-chip (BASELINE.md "GGCN linear-gate fused op").  Above
# _GATED_CHUNK_BYTES the blockwise pipeline runs (nothing slot-shaped
# materialized), so the caller needs no lane chunking.


def _gated_stats_chunked_bwd(ell: EllGraph, x, gl, g_dst, slope, dnum,
                             dden, rmax):
    """Chunked backward of the linear-gate STATS op.  c (=rmax) is a
    constant stabilizer, so per slot dz = x·dnum + dden and
    dpre = z·dz·leaky' — no inner term.  Pass layout mirrors
    _gated_chunked_bwd: a dst-major blockwise pass sums dpre into dg_dst;
    the src-major passes gather a 4F per-dst stats table
    [g_dst ‖ dnum ‖ dden ‖ rmax] (agg dtype) and recompute z in-block.
    Returns (dx_direct [V,F] — the Σ z·dnum term only, dg_src [Vs,F],
    dg_dst [Vd,F]); the caller adds the gl chain-rule terms."""
    vd_pad, k = ell.f_idx.shape
    f = x.shape[-1]
    xc = ell.cast_in(x)
    glc = gl.astype(xc.dtype)
    g_dst_p = jnp.pad(g_dst, ((0, vd_pad - g_dst.shape[0]), (0, 0)))
    dnum_pad = jnp.pad(dnum, ((0, vd_pad - ell.num_dst), (0, 0))
                       ).astype(jnp.float32)
    dden_pad = jnp.pad(dden, ((0, vd_pad - ell.num_dst), (0, 0))
                       ).astype(jnp.float32)
    has_tail = ell.f_tail_idx.shape[0] > 0
    trows = jnp.clip(ell.f_tail_rows, 0, vd_pad - 1) if has_tail else None

    def blk_dst(args):
        ib, wb, gd, rm, dn, dd = args
        xg = jnp.take(xc, ib, axis=0)                 # [bv, K, F]
        gs = jnp.einsum("vkf,fo->vko", xg, glc,
                        preferred_element_type=jnp.float32).astype(xg.dtype)
        pre = gs + gd[:, None, :]
        valid = (wb != 0)[:, :, None]
        z = jnp.where(valid, jnp.exp(jax.nn.leaky_relu(pre, slope)
                                     - rm[:, None, :]), 0.0)
        dz = xg * dn[:, None, :] + dd[:, None, :]
        # where-mask (see _lin_stats_bwd_pass): empty-everywhere rows get
        # NaN dden from merge's clamped-den VJP, and 0·NaN = NaN
        dpre = jnp.where(valid, z * dz * jnp.where(pre > 0, 1.0, slope),
                         0.0)
        return (jnp.sum(dpre, axis=1),)

    bv2 = _slab_gated_blocks(vd_pad, k, 2 * f)
    (dg_dst,) = _map_row_blocks(
        blk_dst, (ell.f_idx, ell.f_w, g_dst_p, rmax, dnum_pad, dden_pad),
        vd_pad, bv2)
    if has_tail:
        gd_t = jnp.take(g_dst_p, trows, axis=0)
        rm_t = jnp.take(rmax, trows, axis=0)
        dn_t = jnp.take(dnum_pad, trows, axis=0)
        dd_t = jnp.take(dden_pad, trows, axis=0)
        (dg_dst_t,) = _map_row_blocks(
            blk_dst, (ell.f_tail_idx, ell.f_tail_w, gd_t, rm_t, dn_t, dd_t),
            ell.f_tail_idx.shape[0], bv2)
        dg_dst = jnp.concatenate([
            _tail_combine(dg_dst[:ell.num_dst], dg_dst_t, ell.f_tail_rows,
                          ell.num_dst), dg_dst[ell.num_dst:]])
    dg_dst = dg_dst[:g_dst.shape[0]]

    # per-dst stats table for the src-major passes (agg dtype — same
    # bf16 wobble bound as _gated_chunked_bwd's table)
    stats = ell.cast_in(
        jnp.concatenate([g_dst_p, dnum_pad, dden_pad, rmax], axis=-1))

    vs_pad, kb = ell.b_idx.shape
    g_src = (x @ gl).astype(jnp.float32)
    g_src_p = jnp.pad(g_src, ((0, vs_pad - g_src.shape[0]), (0, 0)))
    x_p = jnp.pad(xc.astype(jnp.float32),
                  ((0, vs_pad - x.shape[0]), (0, 0)))

    def blk_src(args):
        ib, wb, gs, xs = args
        t = jnp.take(stats, ib, axis=0)               # [bv, Kb, 4F]
        gd, dn = t[..., :f], t[..., f:2 * f]
        dd, rm = t[..., 2 * f:3 * f], t[..., 3 * f:]
        pre = gs[:, None, :] + gd
        valid = (wb != 0)[:, :, None]
        z = jnp.where(valid,
                      jnp.exp(jax.nn.leaky_relu(pre, slope) - rm), 0.0)
        dz = xs[:, None, :] * dn + dd
        # where-mask (see blk_dst above): gathered dd may be NaN for
        # empty-everywhere stat rows referenced by padding slots
        dpre = jnp.where(valid, z * dz * jnp.where(pre > 0, 1.0, slope),
                         0.0)
        return (jnp.sum(dpre, axis=1),                # dg_src rows
                jnp.sum(z * dn, axis=1))              # dx rows (direct)

    bv4 = _slab_gated_blocks(vs_pad, kb, 4 * f)
    dg_src, dx = _map_row_blocks(
        blk_src, (ell.b_idx, ell.b_w, g_src_p, x_p), vs_pad, bv4)
    if ell.b_tail_idx.shape[0]:
        btr = jnp.clip(ell.b_tail_rows, 0, vs_pad - 1)
        gs_t = jnp.take(g_src_p, btr, axis=0)
        xs_t = jnp.take(x_p, btr, axis=0)
        dg_src_t, dx_t = _map_row_blocks(
            blk_src, (ell.b_tail_idx, ell.b_tail_w, gs_t, xs_t),
            ell.b_tail_idx.shape[0], bv4)
        dg_src = _tail_combine(dg_src[:ell.num_src], dg_src_t,
                               ell.b_tail_rows, ell.num_src)
        dx = _tail_combine(dx[:ell.num_src], dx_t, ell.b_tail_rows,
                           ell.num_src)
    else:
        dg_src = dg_src[:ell.num_src]
        dx = dx[:ell.num_src]
    return dx[:x.shape[0]], dg_src[:x.shape[0]], dg_dst


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gated_stats_linear(ell: EllGraph, x: jax.Array, gl: jax.Array,
                       g_dst: jax.Array, slope: float = 0.2):
    """Returns (num [Vd,F], den [Vd,F], c [Vd,F]) — ``gated_stats`` with
    g_src = x·gl recomputed in-block (see the section comment above); the
    PROC_OVERLAP split analogue of ``gated_aggregate_linear``.  ``gl``
    must be square [F, F] (gate lanes == aggregated lanes)."""
    if gl.shape[0] != gl.shape[1] or gl.shape[0] != x.shape[-1]:
        raise ValueError(
            f"gated_stats_linear needs square gl matching x's lane count; "
            f"got gl {gl.shape} for x [..., {x.shape[-1]}]")
    out, _ = _gated_stats_lin_fwd(ell, x, gl, g_dst, slope)
    return out


def _gated_stats_lin_fwd(ell, x, gl, g_dst, slope):
    if _gated_big(ell, x.shape[-1]):
        _, (rmax, ssum, outz) = _gated_chunked_fwd(ell, x, None, g_dst,
                                                   slope, gl=gl)
        out = (outz[:ell.num_dst].astype(x.dtype), ssum[:ell.num_dst],
               rmax[:ell.num_dst])
        return out, (ell, x, gl, g_dst, rmax)
    num, den, c, _ = _gated_stats_fwd_impl(ell, x, x @ gl, g_dst, slope)
    return (num, den, c), (ell, x, gl, g_dst, None)


def _gated_stats_lin_bwd(slope, resid, g):
    dnum, dden, _dc = g        # c is a stop-grad stabilizer by construction
    ell, x, gl, g_dst, rmax = resid
    if rmax is not None:
        dx_agg, dg_src, dg_dst = _gated_stats_chunked_bwd(
            ell, x, gl, g_dst, slope, dnum, dden, rmax)
    else:
        _, dx_agg, dg_src, dg_dst = _gated_stats_bwd(
            slope, (ell, x, x @ gl, g_dst), (dnum, dden, None))
    # chain rule through g_src = x·gl
    dgl = jnp.einsum("vf,vo->fo", x.astype(jnp.float32),
                     dg_src.astype(jnp.float32),
                     preferred_element_type=jnp.float32).astype(gl.dtype)
    dx = (dx_agg.astype(jnp.float32)
          + dg_src.astype(jnp.float32) @ gl.astype(jnp.float32).T
          ).astype(x.dtype)
    return None, dx, dgl, dg_dst


gated_stats_linear.defvjp(_gated_stats_lin_fwd, _gated_stats_lin_bwd)
