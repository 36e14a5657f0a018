"""Distribution: mesh setup, DepComm boundary exchange, DepCache replication.

The reference's distributed backend is MPI master→mirror push (forward) and
mirror→master gradient push (backward) with ring scheduling and dynamic
message sizing (comm/network.cpp, core/graph.hpp:2644-3801). The TPU-native
re-design (SURVEY.md §2.3): statically-shaped per-peer boundary index maps
computed at preprocessing time feed a `jax.lax.all_to_all` over a mesh axis;
the gradient path is the transposed all_to_all derived by JAX autodiff; param
sync = replication + psum. XLA's latency-hiding scheduler overlaps the
collective with local chunk aggregation (the reference's PROC_OVERLAP).
"""

from neutronstarlite_tpu.parallel.mesh import make_mesh  # noqa: F401
from neutronstarlite_tpu.parallel.depcomm import (  # noqa: F401
    DistGraph,
    DistGraphTensors,
    build_dist_graph,
)
