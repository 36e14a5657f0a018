"""Neighbor sampling: reservoir-sampled multi-hop minibatch blocks.

Re-creates the reference sampling subsystem TPU-first:

* ``Sampler`` ↔ core/ntsSampler.hpp:23-173 — seeded by train/val/test nid
  lists, batches them in order, reservoir-samples up to ``fanout[hop]``
  in-neighbors per destination per hop (ntsSampler.hpp:113-172).
* ``SampledBlock`` ↔ ``SampledSubgraph`` + per-hop ``sampCSC``
  (core/FullyRepGraph.hpp:28-147, core/coocsc.hpp:26-163) — with one crucial
  TPU redesign: instead of ragged CSC per hop, every hop is a **fixed-shape
  ELL block** ``nbr_idx[cap_h, fanout_h]`` of indices into the next hop's
  deduped source table (+ matching weights, 0-padded). Shapes depend only on
  (batch_size, fanout), so every batch hits the same jit executable.
* source dedup + local relabel ↔ ``sampCSC::postprocessing``
  (coocsc.hpp:62-89), done with np.unique.

The full graph is replicated on every host exactly as the reference's
``FullyRepGraph`` (core/FullyRepGraph.hpp:148-265); hop edges carry the
GLOBAL-degree norm weights like MiniBatchFuseOp
(core/ntsMiniBatchGraphOp.hpp:61-131).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Sequence

import numpy as np

from neutronstarlite_tpu.graph.structure import Graph


@dataclasses.dataclass
class SampledBlock:
    """One minibatch: H hops of fixed-shape ELL adjacency.

    hop h computes values for ``dst_ids[h]`` from the table of
    ``src_tables[h]`` (which equals ``dst_ids[h+1]`` for h < H-1's chain;
    ``src_tables[H-1]`` is the deepest source set whose raw features seed the
    computation). Padded dst slots have id -1 and all-zero weights.
    """

    dst_ids: List[np.ndarray]     # per hop: [cap_h] int32 global ids (-1 pad)
    src_tables: List[np.ndarray]  # per hop: [scap_h] int32 global ids (-1 pad)
    nbr_idx: List[np.ndarray]     # per hop: [cap_h, fanout_h] int32 into src table
    nbr_w: List[np.ndarray]       # per hop: [cap_h, fanout_h] float32
    batch_real: int               # un-padded seed count
    # attention models (include_dst=True): position of each dst in its
    # hop's src table ([cap_h] int32, -1 pad) — the dst's own transformed
    # features score against each sampled neighbor's (GAT's s_dst term)
    dst_local: List[np.ndarray] | None = None

    @property
    def num_hops(self) -> int:
        return len(self.dst_ids)


def split_nids_by_mask(masks: np.ndarray) -> dict:
    """Train/val/test nid lists (ref: GCN_CPU_SAMPLE.hpp:251-265)."""
    return {"train": np.nonzero(masks == 0)[0].astype(np.int32),
            "val": np.nonzero(masks == 1)[0].astype(np.int32),
            "test": np.nonzero(masks == 2)[0].astype(np.int32)}


class Sampler:
    """Work-queue sampler over a fully-replicated graph.

    API mirrors the reference (ntsSampler.hpp): iterate batches via
    ``sample()``; ``restart()`` resets the cursor (and reshuffles when
    ``shuffle=True``).
    """

    def __init__(self, graph: Graph, nids: np.ndarray, batch_size: int,
                 fanout: Sequence[int], seed: int = 0, shuffle: bool = True,
                 include_dst: bool = False, rescale: bool = False):
        self.graph = graph
        self.nids = np.asarray(nids, dtype=np.int32)
        self.batch_size = int(batch_size)
        # reference fanout strings are listed input-side first
        # (e.g. "4-4" for a 2-layer model); hop 0 (batch dsts) uses the last
        self.fanout = [int(f) for f in fanout]
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle
        # include_dst: append each hop's dst vertices to its src table when
        # the reservoir didn't reach them, and record dst_local positions —
        # attention models need the dst's own transformed features. The
        # extras become next-hop dsts too (the chain src_tables[h] ==
        # dst_ids[h+1] must stay intact so their features exist).
        self.include_dst = include_dst
        # SAMPLE_RESCALE: deg_in/k_sampled correction (see device_sampler)
        self.rescale = rescale
        self._dedup = None
        self._order = self.nids.copy()
        self.restart()

    def restart(self) -> None:
        if self.shuffle:
            self.rng.shuffle(self._order)
        self.cursor = 0

    def has_rest(self) -> bool:
        return self.cursor < self._order.size

    @property
    def num_batches(self) -> int:
        return -(-self._order.size // self.batch_size)

    def sample(self) -> Iterator[SampledBlock]:
        """Yield blocks until the seed list is exhausted (one epoch)."""
        self.restart()
        while self.has_rest():
            yield self.sample_one()

    def sample_one(self) -> SampledBlock:
        g = self.graph
        seeds = self._order[self.cursor:self.cursor + self.batch_size]
        self.cursor += seeds.size
        batch_real = seeds.size
        # pad the final partial batch to keep shapes static
        if seeds.size < self.batch_size:
            pad = np.full(self.batch_size - seeds.size, -1, np.int32)
            seeds = np.concatenate([seeds, pad])

        from neutronstarlite_tpu import native

        hops = len(self.fanout)
        dst_ids, src_tables, nbr_idx_l, nbr_w_l = [], [], [], []
        dst_local_l = []
        cur = seeds
        for h in range(hops):
            fo = self.fanout[hops - 1 - h]  # deepest fanout listed first
            cap = cur.size
            if native.available():
                # C++/OpenMP hop sampling (native/nsl_native.cpp
                # nsl_sample_hop — the reference's reservoir loop)
                idx_global = native.sample_hop(
                    g.fwd_offsets, g.fwd_src, cur, fo,
                    int(self.rng.integers(1, 2**62))).astype(np.int64)
            else:
                idx_global = np.full((cap, fo), -1, np.int64)
                for r in range(cap):
                    v = cur[r]
                    if v < 0:
                        continue
                    lo, hi = int(g.fwd_offsets[v]), int(g.fwd_offsets[v + 1])
                    deg = hi - lo
                    if deg == 0:
                        continue
                    if deg <= fo:
                        picked = np.arange(lo, hi)
                    else:
                        # reservoir equivalent: uniform without replacement
                        # (ntsSampler.hpp:138-158)
                        picked = lo + self.rng.choice(deg, size=fo,
                                                      replace=False)
                    idx_global[r, :picked.size] = g.fwd_src[picked]
            # dedup sources → local relabel (sampCSC::postprocessing)
            flat = idx_global.ravel()
            valid = flat >= 0
            if native.available():
                if self._dedup is None:
                    self._dedup = native.DedupWorkspace(g.num_vertices)
                table, local_flat = self._dedup(flat.astype(np.int32))
                local = local_flat.reshape(cap, fo)
            else:
                uniq = np.unique(flat[valid]).astype(np.int32)
                table = uniq  # [S]
                lookup = np.full(g.num_vertices, -1, np.int32)
                lookup[uniq] = np.arange(uniq.size, dtype=np.int32)
                local = np.zeros((cap, fo), np.int32)
                local[valid.reshape(cap, fo)] = lookup[flat[valid]]
            # weights: global-degree norm, 0 for padding
            w = np.zeros((cap, fo), np.float32)
            vsrc = flat[valid]
            vdst = np.repeat(cur, fo)[valid]
            w_vals = 1.0 / np.sqrt(
                np.maximum(g.out_degree[vsrc], 1).astype(np.float64)
                * np.maximum(g.in_degree[vdst], 1).astype(np.float64))
            w[valid.reshape(cap, fo)] = w_vals.astype(np.float32)
            if self.rescale:
                # SAMPLE_RESCALE: deg_in/k_sampled unbiased correction
                vm = valid.reshape(cap, fo)
                k_eff = np.maximum(vm.sum(axis=1, keepdims=True), 1)
                idg = np.maximum(
                    g.in_degree[np.clip(cur, 0, None)], 1)[:, None]
                w *= (idg / k_eff).astype(np.float32)

            dst_ids.append(cur.astype(np.int32))
            if self.include_dst:
                # table is sorted unique → locate each dst; append missing
                # dsts (they become next-hop dsts, keeping the feature chain
                # intact). nbr_idx local ids stay valid (appended at end).
                d = cur.astype(np.int32)
                dv = d >= 0
                pos = np.searchsorted(table, np.clip(d, 0, None))
                safe = np.minimum(pos, max(table.size - 1, 0))
                found = dv & (pos < table.size) & (
                    table[safe] == d if table.size else False)
                miss = np.unique(d[dv & ~found])
                loc = np.full(d.size, -1, np.int32)
                loc[found] = pos[found].astype(np.int32)
                if miss.size:
                    sel = dv & ~found
                    loc[sel] = (table.size
                                + np.searchsorted(miss, d[sel])).astype(
                                    np.int32)
                    table = np.concatenate([table, miss])
                dst_local_l.append(loc)
            src_tables.append(table)
            nbr_idx_l.append(local)
            nbr_w_l.append(w)
            cur = table  # next hop samples neighbors of these sources
        return SampledBlock(dst_ids=dst_ids, src_tables=src_tables,
                            nbr_idx=nbr_idx_l, nbr_w=nbr_w_l,
                            batch_real=batch_real,
                            dst_local=(dst_local_l if self.include_dst
                                       else None))


def pad_block(block: SampledBlock, caps: Sequence[int], scaps: Sequence[int]
              ) -> SampledBlock:
    """Pad a block's per-hop arrays to fixed caps so all batches share one
    compiled executable. ``caps[h]`` ≥ dst rows, ``scaps[h]`` ≥ source table."""
    dst_ids, src_tables, nbr_idx, nbr_w = [], [], [], []
    dst_local = [] if block.dst_local is not None else None
    for h in range(block.num_hops):
        cap, scap = caps[h], scaps[h]
        d = block.dst_ids[h]
        if d.size < cap:
            d = np.concatenate([d, np.full(cap - d.size, -1, np.int32)])
        t = block.src_tables[h]
        if t.size < scap:
            t = np.concatenate([t, np.full(scap - t.size, -1, np.int32)])
        ni = block.nbr_idx[h]
        nw = block.nbr_w[h]
        if ni.shape[0] < cap:
            ni = np.pad(ni, ((0, cap - ni.shape[0]), (0, 0)))
            nw = np.pad(nw, ((0, cap - nw.shape[0]), (0, 0)))
        if dst_local is not None:
            dl = block.dst_local[h]
            if dl.size < cap:
                dl = np.concatenate(
                    [dl, np.full(cap - dl.size, -1, np.int32)])
            dst_local.append(dl)
        dst_ids.append(d)
        src_tables.append(t)
        nbr_idx.append(ni)
        nbr_w.append(nw)
    return SampledBlock(dst_ids=dst_ids, src_tables=src_tables,
                        nbr_idx=nbr_idx, nbr_w=nbr_w,
                        batch_real=block.batch_real, dst_local=dst_local)


def static_caps(batch_size: int, fanout: Sequence[int],
                num_vertices: int | None = None,
                include_dst: bool = False) -> tuple[list, list]:
    """Worst-case per-hop caps: cap_0 = B; scap_h = cap_h * fanout_h (dedup
    can only shrink); cap_{h+1} = scap_h.

    With ``num_vertices`` given, caps clamp at V: dedup can never produce
    more than V unique ids, so deep hops stop growing exponentially —
    B·Πfanout tables on a graph with V ≪ that are pure padding (HBM +
    gather work on rows that are always -1).

    ``include_dst`` (attention models): each hop's table may additionally
    hold its cap_h dst vertices, so scap_h = cap_h·(fanout_h + 1) — all
    appended ids are distinct vertices, so the V clamp still holds."""
    hops = len(fanout)
    caps, scaps = [], []
    cap = batch_size
    for h in range(hops):
        fo = fanout[hops - 1 - h]
        if num_vertices is not None:
            cap = min(cap, num_vertices)
        caps.append(cap)
        sc = cap * (fo + 1) if include_dst else cap * fo
        if num_vertices is not None:
            sc = min(sc, num_vertices)
        scaps.append(sc)
        cap = sc
    return caps, scaps
