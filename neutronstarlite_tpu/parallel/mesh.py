"""Mesh construction helpers.

The partition axis ``'p'`` plays the role of the reference's MPI world
(one partition per device instead of per process). On real hardware the mesh
should be built so ring neighbors on 'p' are ICI neighbors
(`jax.experimental.mesh_utils.create_device_mesh` does this).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_partitions: int | None = None, axis_name: str = "p") -> Mesh:
    devices = jax.devices()
    n = num_partitions or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} partitions but only "
                         f"{len(devices)} devices are visible")
    try:
        from jax.experimental import mesh_utils
        devs = mesh_utils.create_device_mesh((n,), devices=devices[:n])
    except Exception:
        devs = np.asarray(devices[:n])
    return Mesh(devs, (axis_name,))


def make_mesh2d(num_partitions: int, tp: int,
                axis_names=("p", "f")) -> Mesh:
    """2-D mesh for vertex ('p') x feature ('f') parallelism. The 'f' axis
    should be the innermost (fastest-varying) so its all_gathers ride the
    shortest ICI hops; create_device_mesh orders axes that way."""
    devices = jax.devices()
    need = num_partitions * tp
    if need > len(devices):
        raise ValueError(f"requested {num_partitions}x{tp} mesh but only "
                         f"{len(devices)} devices are visible")
    try:
        from jax.experimental import mesh_utils
        devs = mesh_utils.create_device_mesh((num_partitions, tp),
                                             devices=devices[:need])
    except Exception:
        devs = np.asarray(devices[:need]).reshape(num_partitions, tp)
    return Mesh(devs, axis_names)
