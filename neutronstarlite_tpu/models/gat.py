"""GAT: per-edge attention via SDDMM-style edge NN + segment softmax.

Ref: toolkits/GAT_CPU.hpp:194-226, GAT_CPU_DIST.hpp:181-215. Per layer i
(weights P[2i] vertex transform [F→F'], P[2i+1] attention [2F'→1]):

    x_t   = x @ W_{2i}
    e_src = scatter_src(x_t); e_dst = scatter_dst(x_t)
    m     = leaky_relu(cat(e_src, e_dst) @ W_{2i+1}, 0.2)
    a     = edge_softmax(m)                 # per-dst segments
    nbr   = aggregate_dst_sum(e_src * a)
    x'    = relu(nbr)                       # every layer, incl. the last

Loss applies log_softmax afterwards, exactly like GCN.

TPU note: the concat [e_src ∥ e_dst] @ W is algebraically split as
e_src @ Wl + e_dst @ Wr with Wl/Wr the two halves of W_{2i+1}; the per-vertex
terms (x_t @ Wl, x_t @ Wr) are computed once per *vertex* and scattered as
scalars — the comm/compute optimization the reference documents in
GAT_CPU_DIST_OPTM.hpp:210-235 (uncompiled there; first-class here). This
turns an [E,2F'] intermediate into two [E] vectors.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from neutronstarlite_tpu.nn import layers, param


class GATState(NamedTuple):
    params: list   # per layer: {"w": [F,F'], "attn": [2F'/H, H]}
    bn: list       # unused (GAT reference has no batchnorm); kept for trainer parity


def init(key: jax.Array, layer_sizes: Sequence[int], dtype=jnp.float32,
         heads: int = 1) -> GATState:
    n_layers = len(layer_sizes) - 1
    keys = jax.random.split(key, 2 * n_layers)
    params = []
    for i in range(n_layers):
        f_in, f_out = layer_sizes[i], layer_sizes[i + 1]
        h = heads if i < n_layers - 1 else 1   # last layer stays single-head
        if f_out % h:
            raise ValueError(f"NUM_HEADS:{heads} must divide hidden layer "
                             f"size {f_out}")
        params.append({
            "w": param.glorot_uniform(keys[2 * i], f_in, f_out, dtype),
            "attn": param.glorot_uniform(keys[2 * i + 1], 2 * (f_out // h),
                                         h, dtype),
        })
    return GATState(params=params, bn=[])


def forward(state: GATState, gt, x: jax.Array, key: jax.Array | None,
            training: bool, drop_rate: float = 0.0,
            tp_axis: str | None = None, heads: int = 1):
    """``heads`` is only needed under TP (tp_axis set): inside shard_map
    the attn leaf is the LOCAL [2F'/H, H/f] shard, so its column count no
    longer distinguishes a multi-head layer from a single-head one (H/f
    can be 1) — the trainer passes the global NUM_HEADS instead. Without
    TP the param shape is authoritative and ``heads`` is ignored."""
    del key, drop_rate  # reference GAT applies no dropout in this path
    n_layers = len(state.params)
    for i, p in enumerate(state.params):
        if tp_axis is None:
            multi = p["attn"].shape[1] > 1
        else:
            multi = heads > 1 and i < n_layers - 1
        if multi:
            # multi-head: ONE exchange table for all heads, the fused
            # attention chain per head over column slices, concat.
            # Under TP (tp_axis set) the joint layout is head-major:
            # TP_DIM must divide NUM_HEADS (DistTrainer validates), so
            # each feature shard owns H/f COMPLETE heads — its contiguous
            # F'/f weight columns are exactly those heads' slices, and the
            # [2F'/H, H] attn param column-shards over the same heads.
            # Every head's softmax then lives entirely within one shard:
            # no score psum, no extra exchange lanes — the fused
            # linear-score chain runs unchanged on the narrow shard, and
            # the global concat order equals the 1-D layout's.
            if tp_axis is not None:
                x_t = layers.dense(x, p["w"], tp_axis)  # [V_p, F'/f]
            else:
                x_t = x @ p["w"]
            local_heads = p["attn"].shape[1]  # H, or H/f per TP shard
            mirror = gt.get_dep_nbr(x_t)
            fh = p["attn"].shape[0] // 2
            a_l2 = p["attn"][:fh, :]             # [F'/H, H]
            a_r2 = p["attn"][fh:, :]
            # per-head dst scores from the head-sliced dots (row-level
            # reshape, free); the fused all-heads op shares every slab
            # gather across heads on the ELL backend — the backends
            # without comb slabs run the identical per-head chain
            s_dst = jnp.einsum(
                "vhf,fh->vh",
                x_t.reshape(x_t.shape[0], local_heads, fh), a_r2)
            x = jax.nn.relu(gt.attention_aggregate_linear_heads(
                mirror, a_l2, s_dst, slope=0.2))
            continue
        if tp_axis is None:
            x_t = x @ p["w"]
            # the one communicating op per layer (DistGetDepNbrOp,
            # ref: core/ntsDistCPUGraphOp.hpp:34-126): single-chip =
            # identity, dist = all_to_all producing the [local ∪ mirror]
            # feature table
            mirror = gt.get_dep_nbr(x_t)
            f_out = p["w"].shape[1]
            # split attention into per-src and per-dst scalar terms
            # (GAT_CPU_DIST_OPTM decomposition)
            a_l = p["attn"][:f_out, :]       # [F',1]
            a_r = p["attn"][f_out:, :]       # [F',1]
            s_dst = (x_t @ a_r)[:, 0]        # per local dst row
            # fused edge chain: leaky_relu attention → per-dst softmax →
            # weighted aggregate (scatter-free slab math on the ELL
            # backend). The per-src term s_src = mirror·a_l is LINEAR in
            # the gathered rows, so the slab engine recomputes it in-block
            # instead of paying a per-slot scalar gather
            nbr = gt.attention_aggregate_linear(mirror, a_l[:, 0], s_dst,
                                                slope=0.2)
        else:
            # 2-D vertex x feature parallelism: x/x_t are feature-sharded
            # over the 'f' mesh axis (column-parallel dense); the attention
            # vector [2F',1] is REPLICATED (its output dim is 1, not
            # shardable) — each shard dots its own feature slice and the
            # scalar score terms psum over 'f'. s_src then rides as ONE
            # extra exchange lane so the scalar-score fused path runs on
            # the narrow shard, feature-wise independent.
            x_t = layers.dense(x, p["w"], tp_axis)   # [V_p, F'/f]
            c = x_t.shape[1]
            f_out = p["attn"].shape[0] // 2          # global F'
            k = jax.lax.axis_index(tp_axis)
            a = p["attn"][:, 0]
            a_l = jax.lax.dynamic_slice_in_dim(a, k * c, c)
            a_r = jax.lax.dynamic_slice_in_dim(a, f_out + k * c, c)
            s_src = jax.lax.psum(x_t @ a_l, tp_axis)  # [V_p], replicated
            s_dst = jax.lax.psum(x_t @ a_r, tp_axis)
            aug = jnp.concatenate(
                [x_t, s_src[:, None].astype(x_t.dtype)], axis=1)
            m = gt.get_dep_nbr(aug)
            nbr = gt.attention_aggregate(m[:, :c], m[:, c], s_dst,
                                         slope=0.2)
        x = jax.nn.relu(nbr)
    return x, []
