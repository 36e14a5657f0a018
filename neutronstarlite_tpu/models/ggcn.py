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

from neutronstarlite_tpu.nn import param


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
            training: bool, drop_rate: float = 0.0):
    del key, drop_rate
    for p in state.params:
        x_t = x @ p["w"]
        mirror = gt.get_dep_nbr(x_t)
        f_out = p["w"].shape[1]
        # split gate weight: [e_src ∥ e_dst] @ G == e_src@Gl + e_dst@Gr —
        # the dst term is one per-vertex matmul; the SRC term is linear in
        # the mirror rows, so the fused op recomputes it in-block from the
        # gathered features (gated_aggregate_linear) instead of gathering a
        # materialized g_src table (no [E, 2F'] intermediate either way)
        g_l, g_r = p["gate"][:f_out], p["gate"][f_out:]
        g_dst = x_t @ g_r                                 # per local dst row
        x = jax.nn.relu(gt.gated_aggregate_linear(mirror, g_l, g_dst,
                                                  slope=0.2))
    return x, []
