"""Dense NN layers with torch-matching numerics.

The reference leans on libtorch for batchnorm/dropout/relu/mm
(toolkits/GCN_CPU.hpp:216-228 vertexForward). We reproduce
``torch::nn::BatchNorm1d`` semantics (eps=1e-5, momentum=0.1, affine, biased
variance for normalization, unbiased for the running stats) and
``torch::nn::Dropout`` (inverted dropout, scale 1/(1-p) in train mode) so
per-layer activations can be compared allclose against the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(params: dict, x: jax.Array) -> jax.Array:
    """y = x @ W (bias-free, as the reference's Parameter::forward,
    NtsScheduler.hpp:738-741)."""
    return x @ params["w"]


def dense(x: jax.Array, w: jax.Array, tp_axis: str | None = None
          ) -> jax.Array:
    """Column-parallel dense ``x @ w`` for 2-D vertex x feature parallelism.

    With ``tp_axis`` set (inside shard_map over a ('p', 'f') mesh), ``x``'s
    feature dim is sharded over that mesh axis and ``w`` holds the local
    OUTPUT-column shard [F_in, F_out/f]: gather x to full F_in over the axis
    and multiply, producing a feature-sharded output. Autodiff transposes
    the all_gather into a reduce_scatter, so dx routes back to the owning
    feature shard automatically. With ``tp_axis=None`` this is a plain
    matmul. (No reference counterpart — the reference is strictly 1-D
    vertex-partitioned; this is the TPU-native Megatron-style second mesh
    dimension.)

    The gather is skipped when ``x`` already carries full F_in rows
    (x.shape[1] == w.shape[0]) — that's the layer-0 case when the INPUT
    feature dim is not divisible by the mesh axis and therefore stays
    replicated (shapes are static inside shard_map, so the width test is
    exact)."""
    if tp_axis is not None and x.shape[1] != w.shape[0]:
        x = jax.lax.all_gather(x, tp_axis, axis=1, tiled=True)
    return x @ w


def batch_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones(dim, dtype),
        "bias": jnp.zeros(dim, dtype),
        "mean": jnp.zeros(dim, dtype),     # running mean (state, not learned)
        "var": jnp.ones(dim, dtype),       # running var  (state, not learned)
    }


def batch_norm_apply(bn: dict, x: jax.Array, training: bool,
                     momentum: float = 0.1, eps: float = 1e-5,
                     row_mask: jax.Array | None = None
                     ) -> tuple[jax.Array, dict]:
    """Returns (y, updated_bn). In eval mode the running stats are used and
    returned unchanged.

    ``row_mask`` (bool [N]) restricts the batch statistics to real rows —
    required on SPMD-padded vertex blocks so zero padding doesn't pollute
    mean/var (the reference's per-rank BatchNorm1d sees only real local
    vertices). Normalization is still applied to every row; padded rows'
    outputs are never consumed."""
    if training:
        if row_mask is not None:
            m = row_mask.astype(x.dtype)[:, None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=0) / n
            var = jnp.sum(((x - mean) ** 2) * m, axis=0) / n
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        else:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)                 # biased, for normalization
            n = x.shape[0]
            unbiased = var * (n / max(n - 1, 1))     # for the running stats
        new_bn = dict(bn)
        new_bn["mean"] = (1 - momentum) * bn["mean"] + momentum * mean
        new_bn["var"] = (1 - momentum) * bn["var"] + momentum * unbiased
    else:
        mean, var = bn["mean"], bn["var"]
        new_bn = bn
    y = (x - mean) * jax.lax.rsqrt(var + eps) * bn["scale"] + bn["bias"]
    return y, new_bn


def dropout(key: jax.Array, x: jax.Array, rate: float, training: bool
            ) -> jax.Array:
    """Inverted dropout matching torch::nn::Dropout."""
    if not training or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def log_softmax(x: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(x, axis=-1)


def nll_loss_masked(log_probs: jax.Array, labels: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """Mean NLL over masked rows (ref Loss(): nll_loss on
    masked_select(mask==train), toolkits/GCN_CPU.hpp:187-196). ``mask`` is
    boolean [V]; empty masks give 0."""
    per_row = -jnp.take_along_axis(
        log_probs, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    cnt = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_row, 0.0)) / cnt
