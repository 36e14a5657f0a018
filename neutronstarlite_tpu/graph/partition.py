"""1-D locality-aware vertex partitioning (Gemini-style chunking).

Re-creates the reference's contiguous vertex-range partition where each
partition's load is balanced by ``remained_amount = vertices + alpha * edges``
with ``alpha = 8 * (partitions - 1)`` spirit (ref: core/graph.hpp:1185-1213
``partition_offset`` construction; alpha at graph.hpp:408). Edges are owned by
their *dst* partition, as in the reference (edge shuffled to dst owner,
graph.hpp:1329+).

On TPU the partitions become shards of a mesh axis; because SPMD needs equal
per-device shapes, every partition is padded to the max local vertex count
(``v_pad``). Padded rows are zero and never addressed by real edges.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Partition:
    num_partitions: int
    offsets: np.ndarray       # [P+1] int64 partition_offset: partition p owns [off[p], off[p+1])
    owner: np.ndarray         # [V] int32: owning partition of each vertex
    local_counts: np.ndarray  # [P] int64 owned vertex count
    v_pad: int                # max local count, padded for SPMD uniformity

    def local_id(self, vid: np.ndarray) -> np.ndarray:
        """Global vertex id → local row index within its owner's shard."""
        return vid - self.offsets[self.owner[vid]]


def locality_aware_partition(in_degree: np.ndarray, num_partitions: int,
                             alpha: float | None = None,
                             pad_multiple: int = 8) -> Partition:
    """Contiguous split of [0, V) into ``num_partitions`` ranges balancing
    ``score(v) = alpha + in_degree(v)`` (vertex + its owned edges).

    Ref: core/graph.hpp:1185-1213. The reference walks vertices accumulating
    ``amount`` until a partition's share of ``total_amount`` is reached; we do
    the same with a cumulative-sum search.

    ``v_pad`` is rounded up to ``pad_multiple`` (TPU sublane alignment).
    """
    v = int(in_degree.shape[0])
    p = num_partitions
    if alpha is None:
        alpha = 8.0 * (p - 1) + 1.0
    score = alpha + in_degree.astype(np.float64)
    cumsum = np.concatenate([[0.0], np.cumsum(score)])
    total = cumsum[-1]

    offsets = np.zeros(p + 1, dtype=np.int64)
    offsets[p] = v
    for i in range(1, p):
        target = total * i / p
        offsets[i] = np.searchsorted(cumsum, target)
    # monotone guard for degenerate tiny graphs
    for i in range(1, p + 1):
        offsets[i] = max(offsets[i], offsets[i - 1])

    owner = np.zeros(v, dtype=np.int32)
    for i in range(p):
        owner[offsets[i]:offsets[i + 1]] = i
    local_counts = np.diff(offsets)
    v_max = int(local_counts.max()) if p > 0 else 0
    v_pad = -(-max(v_max, 1) // pad_multiple) * pad_multiple
    return Partition(num_partitions=p, offsets=offsets, owner=owner,
                     local_counts=local_counts, v_pad=v_pad)
