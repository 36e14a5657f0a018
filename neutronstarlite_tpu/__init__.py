"""NeutronStarLite-TPU: a TPU-native distributed GNN training framework.

A from-scratch re-design of the capabilities of NeutronStar
(iDC-NEU/NeutronStarLite) for TPU hardware: JAX/XLA/Pallas compute, pjit/shard_map
distribution over a `jax.sharding.Mesh`, host-side (numpy + optional C++) graph
preprocessing and sampling.

Layer map (mirrors SURVEY.md's reference layer map, re-designed TPU-first):

    graph/      graph loading, partitioning, CSC/CSR chunk building   (ref: core/graph.hpp, core/PartitionedGraph.hpp)
    ops/        graph operators: scatter / aggregate / edge-softmax / SpMM
                as pure differentiable functions (XLA segment backend +
                Pallas TPU kernels)                                    (ref: core/nts*GraphOp.hpp, cuda/)
    nn/         parameters, NtsAdam optimizer, batchnorm/dropout       (ref: core/NtsScheduler.hpp Parameter)
    models/     GCN / GAT / GIN / CommNet model families               (ref: toolkits/*.hpp)
    parallel/   mesh setup, DepComm boundary exchange, DepCache        (ref: comm/, core/graph.hpp process_edges_*)
    sampling/   reservoir sampler + padded minibatch blocks            (ref: core/ntsSampler.hpp, core/coocsc.hpp)
    training/   epoch-loop trainers (full-graph, minibatch, dist)      (ref: toolkits/*_impl run())
    utils/      timing, logging, checkpointing
"""

__version__ = "0.1.0"

from neutronstarlite_tpu.config import InputInfo  # noqa: F401
