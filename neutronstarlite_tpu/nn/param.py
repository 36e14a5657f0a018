"""Parameter initialization matching the reference's Parameter ctor.

Ref: core/NtsScheduler.hpp:665-712 — W ~ U(-s, s) with s = sqrt(6/(rows+cols))
(Glorot/Xavier uniform). Under pjit with replicated param sharding, the
reference's rank-0 MPI broadcast (init_parameter, NtsScheduler.hpp:716-718)
is unnecessary: every host computes the same init from the same seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def glorot_uniform(key: jax.Array, rows: int, cols: int,
                   dtype=jnp.float32) -> jax.Array:
    scale = jnp.sqrt(6.0 / (rows + cols)).astype(dtype)
    return jax.random.uniform(key, (rows, cols), dtype=dtype,
                              minval=-scale, maxval=scale)


def init_linear(key: jax.Array, rows: int, cols: int, dtype=jnp.float32):
    """A bias-free linear layer, as the reference's Parameter (weight only)."""
    return {"w": glorot_uniform(key, rows, cols, dtype)}
