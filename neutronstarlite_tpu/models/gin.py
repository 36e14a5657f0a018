"""GIN: sum aggregation + (1+ε)·x with a 2-layer MLP per GNN layer.

Ref: toolkits/GIN_CPU.hpp:175-190 vertexForward — with ε fixed to 1...
actually ``a + (1)*x`` i.e. ε=0 in GIN terms (h = agg + x):

    hidden layers: y = bn(relu(W2·relu(W1·(agg + x))))
    last layer:    y = bn(W2·relu(W1·(agg + x)))

where agg is the degree-normalized fused aggregation (ForwardCPUfuseOp — the
reference GIN reuses the GCN aggregate, GIN_CPU.hpp engine composition) and
P[2l], P[2l+1] are the MLP weights sized [F_in→F_out], [F_out→F_out]; the
batchnorm is BatchNorm1d(F_out). Loss = log_softmax + masked NLL.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from neutronstarlite_tpu.nn import layers, param


class GINState(NamedTuple):
    params: list   # per layer: {"w1": [F_in,F_out], "w2": [F_out,F_out]}
    bn: list       # per layer batchnorm over F_out


def init(key: jax.Array, layer_sizes: Sequence[int], dtype=jnp.float32
         ) -> GINState:
    n_layers = len(layer_sizes) - 1
    keys = jax.random.split(key, 2 * n_layers)
    params, bn = [], []
    for i in range(n_layers):
        f_in, f_out = layer_sizes[i], layer_sizes[i + 1]
        params.append({
            "w1": param.glorot_uniform(keys[2 * i], f_in, f_out, dtype),
            "w2": param.glorot_uniform(keys[2 * i + 1], f_out, f_out, dtype),
        })
        bn.append(layers.batch_norm_init(f_out, dtype))
    return GINState(params=params, bn=bn)


def forward(state: GINState, gt, x: jax.Array, key: jax.Array | None,
            training: bool, drop_rate: float = 0.0, eps: float = 0.0,
            eager: bool = False, row_mask: jax.Array | None = None,
            tp_axis: str | None = None, l0_ax: jax.Array | None = None):
    """``eager=True`` transforms before aggregating: the pre-activation
    (agg(x) + (1+ε)x)·W1 == agg(x·W1) + (1+ε)(x·W1) because the fused
    aggregate is linear over vertex rows — the GCN_CPU_EAGER op reorder
    (ref: toolkits/GCN_CPU_EAGER.hpp) applied to GIN, so layer 1
    aggregates at F_out instead of F_in lanes.

    ``tp_axis`` enables 2-D vertex x feature parallelism (layers.dense)."""
    del key, drop_rate
    n_layers = len(state.params)
    new_bn = []
    for i in range(n_layers):
        p = state.params[i]
        if i == 0 and l0_ax is not None:
            # HOIST_L0: layer 0's sum-aggregate over the constant features
            # arrives precomputed; (agg + (1+eps)x)·W1 == agg(x·W1)+(1+eps)x·W1
            # so this equals BOTH op orders exactly (pre-activation linearity)
            h = l0_ax + (1.0 + eps) * x
            h = layers.dense(jax.nn.relu(layers.dense(h, p["w1"], tp_axis)),
                             p["w2"], tp_axis)
        elif eager:
            t = layers.dense(x, p["w1"], tp_axis)
            h = gt.aggregate_neighbors(t) + (1.0 + eps) * t
            h = layers.dense(jax.nn.relu(h), p["w2"], tp_axis)
        else:
            agg = gt.aggregate_neighbors(x)
            h = agg + (1.0 + eps) * x
            h = layers.dense(jax.nn.relu(layers.dense(h, p["w1"], tp_axis)),
                             p["w2"], tp_axis)
        if i < n_layers - 1:
            h = jax.nn.relu(h)
        h, nb = layers.batch_norm_apply(state.bn[i], h, training,
                                        row_mask=row_mask)
        new_bn.append(nb)
        x = h
    return x, new_bn
