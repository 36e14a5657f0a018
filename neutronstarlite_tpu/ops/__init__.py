"""Graph operators: pure, differentiable functions over edge-ordered arrays.

The reference implements ~20 forward/backward op pairs in C++/OpenMP/CUDA
(core/nts*GraphOp.hpp, cuda/ntsCUDAFuseKernel.cuh) spliced together by a
hand-rolled autodiff chain. Here each op is a pure JAX function:

* the XLA backend (`segment.py`) uses gather + segment reductions — JAX
  autodiff derives every backward pass (which provably matches the
  reference's hand-written transposed ops; tests assert this against the
  degree oracles);
* the ELL backend (`ell.py`) re-casts the hot SpMM / edge-softmax /
  attention paths as scatter-free dense-slab compute with transposed-slab
  custom VJPs — the TPU-native layout for the reference's CUDA kernels.
"""

from neutronstarlite_tpu.ops.segment import (  # noqa: F401
    scatter_src,
    scatter_dst,
    scatter_src_dst,
    aggregate_dst_sum,
    aggregate_dst_mean,
    aggregate_dst_min,
    aggregate_dst_max,
    edge_softmax,
    spmm,
    spmm_transpose,
    sddmm_dot,
)
from neutronstarlite_tpu.ops.graph_ops import GraphTensors  # noqa: F401
