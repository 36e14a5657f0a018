"""Graph substrate: loading, partitioning, CSC/CSR structure building.

Host-side (numpy, optionally accelerated by the C++ native library in
``native/``); produces static-shape, device-ready arrays.
"""

from neutronstarlite_tpu.graph.io import (  # noqa: F401
    read_edge_file,
    read_features,
    read_labels,
    read_masks,
    random_generate,
)
from neutronstarlite_tpu.graph.structure import Graph, build_graph  # noqa: F401
from neutronstarlite_tpu.graph.partition import (  # noqa: F401
    locality_aware_partition,
    Partition,
)
from neutronstarlite_tpu.graph.dataset import GNNDatum, load_dataset  # noqa: F401
