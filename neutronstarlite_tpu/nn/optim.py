"""NtsAdam: the reference's idiosyncratic Adam-with-decay, as a pure optax-style
transform.

Ref: core/NtsScheduler.hpp:719-755 (``learnC2C_with_decay_Adam`` + ``next``).
The reference's variant differs from textbook Adam:

* the moment coefficients themselves decay geometrically each epoch
  (``beta1 *= beta1_t`` in ``next()``), rather than staying fixed;
* the bias correction is folded into the step size once per epoch:
  ``alpha = alpha_t * sqrt(1 - beta2_cur) / (1 - beta1_cur)`` computed with
  the *pre-update* betas;
* weight decay is added to the raw gradient (AdamW-style decoupled-into-grad);
* optional staircase lr decay: ``alpha_t *= decay_rate`` every
  ``decay_epoch`` epochs (epoch != 0).
* defaults beta1=0.9, beta2=0.999, **epsilon=1e-9** (toolkits/GCN_CPU.hpp:88-90).

We reproduce this exactly (SURVEY.md §7.1.5: keep the math for accuracy
parity) as a pure ``(grads, state, params) -> (new_params, new_state)``
update, jit- and pjit-friendly. Under data parallelism, grads should already
be summed across partitions (psum), mirroring ``all_reduce_to_gradient``
(NtsScheduler.hpp:719-722).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class NtsAdamState(NamedTuple):
    m: dict          # first moments, same pytree as params
    v: dict          # second moments
    beta1_cur: jax.Array  # scalar f32: beta1 * beta1_t^epoch
    beta2_cur: jax.Array
    alpha_t: jax.Array    # decayed base lr
    alpha: jax.Array      # effective step size for this epoch
    epoch: jax.Array      # int32


def nts_adam_init(params, learn_rate: float) -> NtsAdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return NtsAdamState(
        m=zeros, v=jax.tree.map(jnp.zeros_like, params),
        beta1_cur=jnp.float32(0.9), beta2_cur=jnp.float32(0.999),
        alpha_t=jnp.float32(learn_rate), alpha=jnp.float32(learn_rate),
        epoch=jnp.int32(0))


def nts_adam_update(grads, state: NtsAdamState, params, *,
                    weight_decay: float, beta1: float = 0.9,
                    beta2: float = 0.999, epsilon: float = 1e-9,
                    decay_rate: float = 0.97, decay_epoch: float = -1):
    """One epoch step: learnC2C_with_decay_Adam followed by next().

    Returns (new_params, new_state).
    """
    b1, b2 = state.beta1_cur, state.beta2_cur

    def upd(p, g, m, v):
        wg = g + weight_decay * p
        m2 = b1 * m + (1 - b1) * wg
        v2 = b2 * v + (1 - b2) * wg * wg
        p2 = p - state.alpha * m2 / (jnp.sqrt(v2) + epsilon)
        return p2, m2, v2

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])

    # --- next() (ref: NtsScheduler.hpp:727-736) ---
    epoch = state.epoch
    do_decay = jnp.logical_and(
        decay_epoch > 0,
        jnp.logical_and(epoch != 0, epoch % jnp.int32(max(decay_epoch, 1)) == 0))
    alpha_t = jnp.where(do_decay, state.alpha_t * decay_rate, state.alpha_t)
    alpha = alpha_t * jnp.sqrt(1 - b2) / (1 - b1)
    new_state = NtsAdamState(
        m=new_m, v=new_v,
        beta1_cur=b1 * beta1, beta2_cur=b2 * beta2,
        alpha_t=alpha_t, alpha=alpha, epoch=epoch + 1)
    return new_params, new_state


def nts_adam(learn_rate: float, weight_decay: float,
             decay_rate: float = 0.97, decay_epoch: float = -1):
    """Convenience factory returning (init_fn, update_fn) closures."""
    def init_fn(params):
        return nts_adam_init(params, learn_rate)

    def update_fn(grads, state, params):
        return nts_adam_update(grads, state, params,
                               weight_decay=weight_decay,
                               decay_rate=decay_rate,
                               decay_epoch=decay_epoch)
    return init_fn, update_fn


def nts_sgd(learn_rate: float, weight_decay: float):
    """The reference's SGD variant: W ← (W − lr·g)·(1 − wd)
    (learnC2C_with_decay_SGD, core/NtsScheduler.hpp:750-755).
    Returns (init_fn, update_fn) with the same signature as nts_adam."""
    def init_fn(params):
        del params
        return ()

    def update_fn(grads, state, params):
        new_params = jax.tree.map(
            lambda p, g: (p - learn_rate * g) * (1.0 - weight_decay),
            params, grads)
        return new_params, state
    return init_fn, update_fn


def make_optimizer(config):
    """Optimizer factory from the cfg (OPTIMIZER: adam | sgd).

    adam = the reference's default training path
    (learnC2C_with_decay_Adam, core/NtsScheduler.hpp:694-748); sgd = its
    SGD variant (learnC2C_with_decay_SGD, core/NtsScheduler.hpp:750-755),
    now reachable from the same cfg surface."""
    kind = getattr(config, "optimizer", "adam").lower()
    if kind == "sgd":
        return nts_sgd(config.learn_rate, config.weight_decay)
    if kind != "adam":
        raise ValueError(f"not supported OPTIMIZER: {kind} (adam|sgd)")
    return nts_adam(config.learn_rate, config.weight_decay,
                    decay_rate=config.decay_rate,
                    decay_epoch=config.decay_epoch)
