"""Numerical-validation toolkits: the reference's test_getdep path.

Ref: toolkits/test_getdepneighbor_cpu.hpp / _gpu.hpp (355/357 LoC), selected
via ALGORITHM:test_getdep1 / test_getdep — set features[:,0]=1, run the
decoupled op chain (GetDepNbr → ScatterSrc → AggregateDst), and check the
aggregate-of-ones-equals-degree invariants; plus single-op backward probes.

Here the oracles ASSERT (the reference printed and left comparison
commented out) and run on both the single-chip and distributed engines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neutronstarlite_tpu.graph.dataset import GNNDatum
from neutronstarlite_tpu.ops.graph_ops import GraphTensors


def validate_single(datum: GNNDatum, backend: str = "auto") -> dict:
    """Degree oracles on one chip. Returns the checked values; raises on
    mismatch."""
    g = datum.graph
    gt = GraphTensors.from_graph(g, backend=backend)
    v = g.num_vertices
    ones = jnp.ones((v, 8), jnp.float32)

    # (1) unweighted aggregate of ones == in_degree
    agg = np.asarray(gt.aggregate_weighted(jnp.ones(g.num_edges), ones))
    np.testing.assert_allclose(agg[:, 0], g.in_degree, rtol=1e-5,
                               err_msg="aggregate(1) != in_degree")

    # (2) scatter-then-aggregate roundtrip == in_degree (SrcScatter +
    # DstAggregate chain of test_getdepneighbor)
    e = gt.scatter_src(ones)
    agg2 = np.asarray(gt.aggregate_dst_sum(e))
    np.testing.assert_allclose(agg2[:, 0], g.in_degree, rtol=1e-5)

    # (3) backward probe: grad of sum(aggregate(x)) routes out_degree to
    # every source row (the transposed op oracle)
    def f(x):
        return jnp.sum(gt.aggregate_weighted(jnp.ones(g.num_edges), x))
    grad = np.asarray(jax.grad(f)(ones))
    np.testing.assert_allclose(grad[:, 0], g.out_degree, rtol=1e-5,
                               err_msg="backward != out_degree")

    # (4) norm-degree fused aggregate equals dense oracle on a sample
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (v, 8)).astype(np.float32))
    y = np.asarray(gt.aggregate_neighbors(x))
    sample = np.random.default_rng(1).choice(v, size=min(v, 64), replace=False)
    xs = np.asarray(x)
    for d in sample:
        lo, hi = g.fwd_offsets[d], g.fwd_offsets[d + 1]
        oracle = (g.fwd_weight[lo:hi, None] * xs[g.fwd_src[lo:hi]]).sum(0)
        np.testing.assert_allclose(y[d], oracle, rtol=1e-3, atol=1e-4)

    print("validate_single: all degree/backward oracles passed "
          f"(V={v}, E={g.num_edges})")
    return {"in_degree_ok": True, "backward_ok": True}


def validate_dist(datum: GNNDatum, num_partitions: int,
                  rep_threshold: int = 0) -> dict:
    """Degree oracles through the DepComm engine on a mesh."""
    from jax.sharding import PartitionSpec as P

    from neutronstarlite_tpu.parallel.depcomm import (build_dist_graph,
                                                      device_view,
                                                      make_tensors)
    from neutronstarlite_tpu.parallel.mesh import make_mesh
    from neutronstarlite_tpu.training.dist_trainer import _shard_map

    g = datum.graph
    mesh = make_mesh(num_partitions)
    dg = build_dist_graph(g, num_partitions, rep_threshold=rep_threshold)
    arrs = jax.tree.map(jnp.asarray, device_view(dg))
    ones = jnp.asarray(dg.shard_features(
        np.ones((g.num_vertices, 8), np.float32)))

    def f(arrs, x):
        sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
        gt = make_tensors(sq(arrs), dg)
        # plain ones: aggregate_weighted masks padding edges itself
        y = gt.aggregate_weighted(jnp.ones_like(gt.e_w),
                                  gt.get_dep_nbr(sq(x)))
        return y[None]

    spec = jax.tree.map(lambda _: P("p"), arrs)
    y = jax.jit(_shard_map(f, mesh, in_specs=(spec, P("p")),
                           out_specs=P("p")))(arrs, ones)
    y = np.asarray(y)
    off = dg.partition.offsets
    for i in range(num_partitions):
        n = off[i + 1] - off[i]
        np.testing.assert_allclose(
            y[i, :n, 0], g.in_degree[off[i]:off[i + 1]], rtol=1e-5,
            err_msg=f"dist aggregate(1) != in_degree on partition {i}")
    print(f"validate_dist: degree oracle passed on {num_partitions} "
          f"partitions (rep_threshold={rep_threshold})")
    return {"in_degree_ok": True}
