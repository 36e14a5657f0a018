"""GCN: degree-normalized neighbor aggregation + per-layer dense transform.

Ref: toolkits/GCN_CPU.hpp (dist CPU), GCN.hpp (dist GPU), GCN_EAGER*.hpp.
Layer i: Y = Â·X (fused SpMM, ForwardCPUfuseOp); hidden layers then apply
batchnorm → relu(Y·W) → dropout; the last layer is a bare linear
(GCN_CPU.hpp:216-228). The loss applies log_softmax + masked NLL
(GCN_CPU.hpp:187-196).

"EAGER" variants of the reference apply W before aggregation (W then Â) —
mathematically Â(XW) = (ÂX)W; we expose ``eager=True`` for the op order, which
is the cheaper order when F_out < F_in (the usual case).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from neutronstarlite_tpu.nn import layers, param


class GCNState(NamedTuple):
    params: list          # [{"w": [F_in, F_out]}] per layer
    bn: list              # batchnorm state per hidden layer


def init(key: jax.Array, layer_sizes: Sequence[int], dtype=jnp.float32
         ) -> GCNState:
    n_layers = len(layer_sizes) - 1
    keys = jax.random.split(key, n_layers)
    params = [param.init_linear(keys[i], layer_sizes[i], layer_sizes[i + 1],
                                dtype)
              for i in range(n_layers)]
    bn = [layers.batch_norm_init(layer_sizes[i], dtype)
          for i in range(n_layers - 1)]
    return GCNState(params=params, bn=bn)


def forward(state: GCNState, gt, x: jax.Array, key: jax.Array | None,
            training: bool, drop_rate: float = 0.0, eager: bool = False,
            remat: bool = False, row_mask: jax.Array | None = None,
            tp_axis: str | None = None, l0_ax: jax.Array | None = None):
    """Returns (logits [V, C], new_bn list). ``gt`` is anything exposing
    ``aggregate_neighbors`` (GraphTensors or DistGraphTensors).

    ``remat=True`` rematerializes each hidden layer in backward
    (jax.checkpoint) — sublinear activation memory for deep stacks; the
    realization of the reference's SubLinearMemCostNNOP stub
    (core/ntsSubLinearNNOP.hpp:32-52, unused there).

    ``tp_axis`` enables 2-D vertex x feature parallelism: activations, bn
    state, and weight OUTPUT columns are sharded over that mesh axis; the
    aggregate/exchange run on the narrow feature shard (feature-wise
    independent) and each dense gathers to full F_in (layers.dense)."""
    n_layers = len(state.params)
    new_bn = []
    if training and key is not None:
        drop_keys = jax.random.split(key, n_layers)
    for i in range(n_layers):
        w = state.params[i]["w"]
        if i < n_layers - 1:
            def hidden(x, w, bn_st, dkey, agg=None):
                if agg is not None:
                    # HOIST_L0: layer 0's aggregate A·x is epoch-invariant
                    # (x constant, aggregate linear) and arrives precomputed;
                    # layer 0 runs the standard aggregate-first order.
                    y, nb = layers.batch_norm_apply(bn_st, agg, training,
                                                    row_mask=row_mask)
                    h = jax.nn.relu(layers.dense(y, w, tp_axis))
                elif eager:
                    # eager order (GCN_CPU_EAGER): transform then aggregate;
                    # batchnorm stays on the F_in side as in the reference.
                    y, nb = layers.batch_norm_apply(bn_st, x, training,
                                                    row_mask=row_mask)
                    h = jax.nn.relu(gt.aggregate_neighbors(
                        layers.dense(y, w, tp_axis)))
                else:
                    y = gt.aggregate_neighbors(x)
                    y, nb = layers.batch_norm_apply(bn_st, y, training,
                                                    row_mask=row_mask)
                    h = jax.nn.relu(layers.dense(y, w, tp_axis))
                if training and drop_rate > 0.0 and dkey is not None:
                    h = layers.dropout(dkey, h, drop_rate, training)
                return h, nb
            fn = jax.checkpoint(hidden, static_argnums=()) if remat else hidden
            dk = drop_keys[i] if (training and key is not None) else None
            x, nb = fn(x, w, state.bn[i], dk,
                       l0_ax if i == 0 else None)
            new_bn.append(nb)
        else:
            if i == 0 and l0_ax is not None:
                x = layers.dense(l0_ax, w, tp_axis)
            elif eager:
                x = gt.aggregate_neighbors(layers.dense(x, w, tp_axis))
            else:
                x = layers.dense(gt.aggregate_neighbors(x), w, tp_axis)
    return x, new_bn


def loss_fn(logits: jax.Array, labels: jax.Array, train_mask: jax.Array
            ) -> jax.Array:
    return layers.nll_loss_masked(layers.log_softmax(logits), labels,
                                  train_mask)
