"""CommNet-style model: y = relu(W0·agg + W1·x) per layer.

Ref: toolkits/COMMNET_GPU.hpp:181-199 vertexForward — each layer has two
weights P[2l] (applied to the aggregated neighborhood) and P[2l+1] (applied
to the vertex's own features); hidden layers take relu, the reference applies
log_softmax inside the last layer's forward (our trainer applies it in the
loss — identical math, and argmax-invariant for accuracy).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from neutronstarlite_tpu.nn import layers, param


class CommNetState(NamedTuple):
    params: list   # per layer: {"w_agg": [F_in,F_out], "w_self": [F_in,F_out]}
    bn: list       # unused


def init(key: jax.Array, layer_sizes: Sequence[int], dtype=jnp.float32
         ) -> CommNetState:
    n_layers = len(layer_sizes) - 1
    keys = jax.random.split(key, 2 * n_layers)
    params = []
    for i in range(n_layers):
        f_in, f_out = layer_sizes[i], layer_sizes[i + 1]
        params.append({
            "w_agg": param.glorot_uniform(keys[2 * i], f_in, f_out, dtype),
            "w_self": param.glorot_uniform(keys[2 * i + 1], f_in, f_out, dtype),
        })
    return CommNetState(params=params, bn=[])


def forward(state: CommNetState, gt, x: jax.Array, key: jax.Array | None,
            training: bool, drop_rate: float = 0.0, eager: bool = False,
            tp_axis: str | None = None, l0_ax: jax.Array | None = None):
    """``eager=True`` transforms before aggregating: agg(x)·W0 == agg(x·W0)
    because the fused aggregate is linear over vertex rows — the
    GCN_CPU_EAGER op reorder (ref: toolkits/GCN_CPU_EAGER.hpp) applied to
    CommNet, so each layer aggregates at F_out instead of F_in lanes.

    ``tp_axis`` enables 2-D vertex x feature parallelism (layers.dense)."""
    del key, drop_rate
    n_layers = len(state.params)
    for i, p in enumerate(state.params):
        if i == 0 and l0_ax is not None:
            # HOIST_L0: agg(x)·W0 with agg(x) precomputed (x constant,
            # aggregate linear) — equals both op orders exactly
            h = (layers.dense(l0_ax, p["w_agg"], tp_axis)
                 + layers.dense(x, p["w_self"], tp_axis))
        elif eager:
            h = (gt.aggregate_neighbors(layers.dense(x, p["w_agg"], tp_axis))
                 + layers.dense(x, p["w_self"], tp_axis))
        else:
            agg = gt.aggregate_neighbors(x)
            h = (layers.dense(agg, p["w_agg"], tp_axis)
                 + layers.dense(x, p["w_self"], tp_axis))
        x = jax.nn.relu(h)
    return x, []
