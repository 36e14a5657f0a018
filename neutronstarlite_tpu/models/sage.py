"""GraphSAGE-style pooling model (max/min neighbor aggregator).

An extension beyond the reference's model zoo, added to exercise the
extremal-aggregation operators end-to-end on BOTH engines: the single-chip
ops (SingleCPUDstAggregateOpMin/Max, ref: core/ntsSingleCPUGraphOp.hpp:206-340)
and their distributed counterparts (DistAggregateDstMin/Max,
ref: core/ntsDistCPUGraphOp.hpp:306-440) now both have a model family that
trains through them.

Layer i: pool = max_e(relu(h_src(e) · W_pool)) per dst;
         h'   = relu([h ∥ pool] · W)   (last layer: no relu)

The gradient routes to the first extremal edge per lane — the reference's
``record[]`` + ``nts_assign`` semantics — on both engines.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from neutronstarlite_tpu.nn import layers, param


class SageState(NamedTuple):
    params: list   # per layer: {"w_pool": [F_in, P], "w": [F_in+P, F_out]}
    bn: list       # unused (kept for trainer-interface parity)


def init(key: jax.Array, layer_sizes: Sequence[int], dtype=jnp.float32,
         pool_dim: int | None = None) -> SageState:
    """``pool_dim`` (cfg SAGE_POOL_DIM): width P of the pooled
    representation per layer; None/0 = P = F_in (square pool, the
    original semantics). The pooled table is what the extremal slab
    gathers traverse — P <= 128 keeps those passes at one 128-lane tile
    (BASELINE.md "r4-late per-tile gather law"), where the square pool at
    F_in=602 pays 5 tiles per slot."""
    n_layers = len(layer_sizes) - 1
    keys = jax.random.split(key, 2 * n_layers)
    params = []
    for i in range(n_layers):
        f_in, f_out = layer_sizes[i], layer_sizes[i + 1]
        p = pool_dim or f_in
        params.append({
            "w_pool": param.init_linear(keys[2 * i], f_in, p,
                                        dtype)["w"],
            "w": param.init_linear(keys[2 * i + 1], f_in + p, f_out,
                                   dtype)["w"],
        })
    return SageState(params=params, bn=[])


def forward(state: SageState, gt, x: jax.Array, key: jax.Array | None,
            training: bool, drop_rate: float = 0.0, aggregator: str = "max",
            tp_axis: str | None = None, pool_dim: int | None = None):
    """Engine-agnostic: ``gt`` is GraphTensors or DistGraphTensors —
    get_dep_nbr is the identity single-chip and the boundary all_to_all
    distributed (DistGetDepNbrOp, ref: core/ntsDistCPUGraphOp.hpp:34-126).

    ``tp_axis`` (2-D vertex x feature parallelism): activations and weight
    output columns are feature-sharded; the extremal aggregation is
    lane-wise independent so it runs on the narrow shard. The concat-dense
    is algebraically split as x@W_top + pool@W_bot — concatenating two
    per-shard chunks would interleave the global feature order, so the
    split form keeps each dense's row indexing consistent instead."""
    n_layers = len(state.params)
    if training and key is not None:
        drop_keys = jax.random.split(key, n_layers)
    for i, p in enumerate(state.params):
        table = gt.get_dep_nbr(x)
        if tp_axis is None:
            t = jax.nn.relu(table @ p["w_pool"])
        else:
            t = jax.nn.relu(layers.dense(table, p["w_pool"], tp_axis))
        # fused slab extremal on the ELL backend: no [E, F] edge tensor
        # (the scatter+segment form is ~14 GB at Reddit scale, F=602);
        # lane-wise independent, so it runs on the TP feature shard as-is
        if aggregator == "max":
            pool = gt.aggregate_neighbor_max(t)
        elif aggregator == "min":
            pool = gt.aggregate_neighbor_min(t)
        else:
            raise ValueError(aggregator)
        if tp_axis is None and not pool_dim:
            x = jnp.concatenate([x, pool], axis=-1) @ p["w"]
        elif tp_axis is None:
            # non-square pool (SAGE_POOL_DIM): algebraically identical
            # split form x·W_top + pool·W_bot. NOT a style choice — the
            # concat form's backward (split of the [V, F_in+P] cotangent
            # fused with the winner-route pass) crashes libtpu's register
            # allocator at Reddit scale (RET_CHECK live_range_finder.cc:29,
            # ~75K-instruction fusion; bisected r5, BASELINE.md "r5 SAGE
            # per-tile treatment"); the split form compiles and trains.
            f_in = p["w"].shape[0] - pool_dim
            x = x @ p["w"][:f_in] + pool @ p["w"][f_in:]
        else:
            # global F_in = w rows minus the GLOBAL pool width. w rows
            # are full even under TP (only output columns shard), but
            # w_pool's columns ARE sharded inside shard_map, so the
            # width must come from the pool_dim kwarg (None = square
            # pool, rows split evenly — the original semantics)
            f_in = p["w"].shape[0] - (pool_dim or p["w"].shape[0] // 2)
            x = (layers.dense(x, p["w"][:f_in], tp_axis)
                 + layers.dense(pool, p["w"][f_in:], tp_axis))
        if i < n_layers - 1:
            x = jax.nn.relu(x)
            if training and drop_rate > 0.0 and key is not None:
                x = layers.dropout(drop_keys[i], x, drop_rate, training)
    return x, []


def loss_fn(logits, labels, train_mask):
    return layers.nll_loss_masked(layers.log_softmax(logits), labels,
                                  train_mask)
