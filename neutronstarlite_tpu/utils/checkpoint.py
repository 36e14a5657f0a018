"""Training checkpoint/resume.

The reference has NO training checkpointing (SURVEY.md §5: only unused
Gemini dump/restore_vertex_array, core/graph.hpp:527-582). This module adds
it as a deliberate improvement: params, batchnorm state, NtsAdam state, RNG
key, and epoch counter are saved and restored bit-exact. Uses
orbax-checkpoint when importable, else a flat .npz fallback.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except ImportError:
        return None


def _to_host(tree: Any) -> Any:
    return jax.tree.map(np.asarray, tree)


def make_state(*, params: Any, bn: Any, opt_state: Any, run_key: Any,
               epoch: int) -> dict:
    return {"params": params, "bn": bn, "opt_state": opt_state,
            "run_key": run_key, "epoch": jnp.int32(epoch)}


def save_checkpoint(path: str, state: dict) -> None:
    path = os.path.abspath(path)
    ocp = _orbax()
    if ocp is not None:
        ocp.PyTreeCheckpointer().save(path, _to_host(state), force=True)
        return
    flat, _ = jax.tree.flatten(_to_host(state))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # np.load returns unreadable void ('|V2') arrays for ml_dtypes like
    # bfloat16 — widen them to float32 for storage (lossless: f32 ⊃ bf16);
    # restore casts back to the template leaf's dtype
    def widen(a):
        a = np.asarray(a)
        return a.astype(np.float32) if a.dtype.kind == "V" or \
            a.dtype.name == "bfloat16" else a
    np.savez(path + ".npz",
             **{f"leaf_{i}": widen(lf) for i, lf in enumerate(flat)})


def restore_checkpoint(path: str, template: dict) -> dict:
    """Restore into the structure of ``template`` (same pytree as saved).

    Probes BOTH on-disk formats so a checkpoint written by either writer
    restores in either environment (ADVICE.md r1: orbax-written checkpoints
    must not require orbax at restore time and vice versa): an orbax
    checkpoint is a directory at ``path``; the npz fallback is ``path.npz``.
    """
    path = os.path.abspath(path)
    ocp = _orbax()
    if os.path.isdir(path):
        if ocp is None:
            raise RuntimeError(
                f"checkpoint {path} is an orbax directory but orbax is not "
                "importable here")
        restored = ocp.PyTreeCheckpointer().restore(path,
                                                    item=_to_host(template))
    elif os.path.exists(path + ".npz"):
        data = np.load(path + ".npz", allow_pickle=False)
        flat, treedef = jax.tree.flatten(template)
        restored = treedef.unflatten(
            [data[f"leaf_{i}"] for i in range(len(flat))])
    else:
        raise FileNotFoundError(f"no checkpoint at {path} (or {path}.npz)")
    # cast to the TEMPLATE leaf's dtype: the npz writer widens bf16 to f32
    # for storage, and restored dtypes must not silently drift anyway
    return jax.tree.map(
        lambda t, r: jnp.asarray(r, dtype=getattr(t, "dtype", None)),
        template, restored)
