"""GGCN / GGNN: gated GCN — per-FEATURE edge gates instead of GAT's scalar
attention.

Ref: toolkits/GGCN_CPU.hpp:184-220 (present in the reference tree but
commented out of main.cpp:102-108; implemented here as a first-class model).
Per layer l (P[2l] vertex transform [F→F'], P[2l+1] gate [2F'→F']):

    x_t  = x @ W_{2l}
    msg  = [x_t[src] ∥ x_t[dst]]            # [E, 2F']
    m    = leaky_relu(msg @ W_{2l+1}, 0.2)   # [E, F'] per-feature gate
    a    = edge_softmax(m)                   # per-dst softmax, per feature lane
    out  = x_t[src] * a                      # gated messages
    x'   = relu(Σ_dst out)

Loss = log_softmax + masked NLL (identical to GCN/GAT).

Uses the segment backend's multi-lane edge softmax (the ELL fused attention
is scalar-lane; multi-lane slab gating is a future kernel).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from neutronstarlite_tpu.nn import layers, param


class GGCNState(NamedTuple):
    params: list   # per layer: {"w": [F,F'], "gate": [2F',F']}
    bn: list       # unused


def init(key: jax.Array, layer_sizes: Sequence[int], dtype=jnp.float32
         ) -> GGCNState:
    n_layers = len(layer_sizes) - 1
    keys = jax.random.split(key, 2 * n_layers)
    params = []
    for i in range(n_layers):
        f_in, f_out = layer_sizes[i], layer_sizes[i + 1]
        params.append({
            "w": param.glorot_uniform(keys[2 * i], f_in, f_out, dtype),
            "gate": param.glorot_uniform(keys[2 * i + 1], 2 * f_out, f_out,
                                         dtype),
        })
    return GGCNState(params=params, bn=[])


def forward(state: GGCNState, gt, x: jax.Array, key: jax.Array | None,
            training: bool, drop_rate: float = 0.0,
            tp_axis: str | None = None):
    del key, drop_rate
    for p in state.params:
        # split gate weight: [e_src ∥ e_dst] @ G == e_src@Gl + e_dst@Gr
        f_out = p["gate"].shape[0] // 2                   # global F'
        g_l, g_r = p["gate"][:f_out], p["gate"][f_out:]
        if tp_axis is None:
            x_t = x @ p["w"]
            mirror = gt.get_dep_nbr(x_t)
            # the dst term is one per-vertex matmul; the SRC term is linear
            # in the mirror rows, so the fused op recomputes it in-block
            # from the gathered features (gated_aggregate_linear) instead
            # of gathering a materialized g_src table (no [E, 2F']
            # intermediate either way)
            g_dst = x_t @ g_r                             # per local dst row
            x = jax.nn.relu(gt.gated_aggregate_linear(mirror, g_l, g_dst,
                                                      slope=0.2))
        else:
            # 2-D vertex x feature parallelism: the gate's output columns
            # are sharded over 'f' like every dense, so g_src/g_dst are
            # per-VERTEX column-parallel matmuls; the per-feature softmax
            # lanes are independent across shards. g_src ships as F'/f
            # extra exchange lanes (the in-block recompute needs full-F'
            # rows, which the narrow shard doesn't hold).
            x_t = layers.dense(x, p["w"], tp_axis)        # [V_p, F'/f]
            # ONE 'f' all_gather feeds both gate matmuls (dense's width
            # test skips its own gather on the pre-gathered rows); two
            # separate dense calls would also emit two un-CSE-able
            # reduce_scatters in backward
            xg = jax.lax.all_gather(x_t, tp_axis, axis=1, tiled=True)
            g_src = layers.dense(xg, g_l, tp_axis)
            g_dst = layers.dense(xg, g_r, tp_axis)
            c = x_t.shape[1]
            aug = jnp.concatenate([x_t, g_src.astype(x_t.dtype)], axis=1)
            m = gt.get_dep_nbr(aug)
            x = jax.nn.relu(gt.gated_aggregate(m[:, :c], m[:, c:], g_dst,
                                               slope=0.2))
    return x, []
