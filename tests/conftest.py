"""Test config: force a virtual 8-device CPU platform BEFORE jax import.

This re-creates the reference's "multi-node without a real cluster" strategy
(run_nts.sh N cfg on localhost, SURVEY.md §4.5) — distributed code paths run
over 8 host-platform devices in one process.
"""

import os
import sys

# force (not setdefault: the driver environment presets JAX_PLATFORMS=axon,
# the real-TPU tunnel; tests must run on the virtual CPU mesh)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon PJRT plugin (sitecustomize) overrides JAX_PLATFORMS; pin the
# platform through jax.config, which wins over the plugin registration.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(scope="session")
def small_graph():
    """A small random graph with self loops, deterministic."""
    from neutronstarlite_tpu.graph.structure import add_self_loops, build_graph
    r = np.random.default_rng(7)
    v, e = 97, 600
    src = r.integers(0, v, e).astype(np.int32)
    dst = r.integers(0, v, e).astype(np.int32)
    src, dst = add_self_loops(src, dst, v)
    return build_graph(src, dst, v)
