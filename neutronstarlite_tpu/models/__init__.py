"""Model families: GCN / GAT / GIN / CommNet (ref: toolkits/*.hpp).

Each model module provides pure functions:

* ``init(key, layer_sizes, ...) -> ModelState`` (params + batchnorm state)
* ``forward(state, gt, x, key, training) -> (logits, new_bn_state)``

The aggregation is injected via the ``GraphTensors`` op API so the same model
code runs single-chip (local GraphTensors) and distributed (DepComm
DistGraphTensors) — the analogue of the reference's op-chain reuse across
GCN_CPU / GCN_CPU_DIST / GCN (toolkits dispatch, main.cpp:53-188).
"""

from neutronstarlite_tpu.models import (gcn, gat, gin, commnet, ggcn,  # noqa: F401
                                         sage)

ALGORITHMS = {
    # reference algorithm strings (toolkits/main.cpp:53-188) → model module.
    # CPU/GPU/EAGER variants of the reference collapse onto one TPU
    # implementation each; dist variants use the same module over a mesh.
    "GCNCPU": gcn, "GCNCPUEAGER": gcn, "GCN": gcn, "GCNEAGER": gcn,
    "GCNEAGERSINGLE": gcn, "GCNSAMPLESINGLE": gcn,
    "GATCPU": gat, "GATCPUDIST": gat, "GATGPUDIST": gat,
    "GINCPU": gin, "GINGPU": gin, "GINCPUEAGER": gin,
    "COMMNETGPU": commnet, "COMMNETGPUEAGER": commnet,
    "GGCN_CPU": ggcn, "GGNN_CPU": ggcn, "GGCN": ggcn, "GGCNCPU": ggcn,
    "GGNNCPU": ggcn,
    # extension beyond the reference zoo (max/min-pool aggregator)
    "SAGE": sage, "SAGECPU": sage,
}
