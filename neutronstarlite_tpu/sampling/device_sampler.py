"""Device-side neighbor sampling: the whole minibatch pipeline in one jit.

The reference samples on the host with all cores (ntsSampler.hpp) and so do
we by default (sampling/sampler.py + the prefetch pipeline). At 11.6
batches/s measured, the HOST is the bottleneck on a fast chip. This module
moves the hop sampling onto the device:

* the fully-replicated CSC (fwd_offsets/fwd_src — FullyRepGraph's role)
  lives in HBM;
* per seed, ``fanout`` neighbor slots are drawn with the TPU PRNG — rows
  with degree ≤ fanout take all neighbors exactly (matching the reference);
  higher-degree rows sample uniformly WITHOUT replacement by default
  (Floyd's algorithm — same distribution as the reference's reservoir,
  ntsSampler.hpp:113-172); ``replace=True`` (cfg SAMPLER:device_wr) is a
  cheaper with-replacement mode whose estimator bias vanishes as degree
  grows (measured <1pt accuracy delta in tests/test_sampler.py);
* source dedup + local relabel (sampCSC::postprocessing) is a kv-sort /
  adjacent-unique / rank-cumsum / un-permute-sort sequence — all static
  shapes (searchsorted is avoided: it lowers to log2(scap) rounds of
  one-lane gathers, ~10 ms/step at TTA shapes on this stack);
* the sampled block feeds the same ELL hop compute as the host path.

Everything is jit-compatible: one compiled function per (batch, fanout)
configuration performs sample → dedup → gather → forward → backward →
update with zero host round trips.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def _floyd_distinct(u: jax.Array, deg: jax.Array, fanout: int) -> jax.Array:
    """Uniform WITHOUT-replacement positions: Floyd's algorithm, unrolled
    over the (small, static) fanout. For each row with degree d > fanout,
    step j draws t ~ U[0, d-f+j]; if t was already chosen, take d-f+j
    instead (fresh by construction) — yielding a uniform f-subset of
    [0, d). This matches the reference reservoir's distribution
    (ntsSampler.hpp:138-158) with O(f²) vectorized compares and no
    dynamic shapes."""
    cap = u.shape[0]
    chosen = jnp.full((cap, fanout), -1, jnp.int32)
    for j in range(fanout):
        hi = jnp.maximum(deg - fanout + j + 1, 1)       # [cap]
        t = u[:, j] % hi
        dup = jnp.any(chosen == t[:, None], axis=1)
        pick = jnp.where(dup, deg - fanout + j, t)
        chosen = chosen.at[:, j].set(pick.astype(jnp.int32))
    return chosen


def sample_hop(key: jax.Array, offsets: jax.Array, nbr: jax.Array,
               seeds: jax.Array, fanout: int, num_vertices: int,
               replace: bool = False):
    """One hop: [cap] seeds → ([cap, fanout] global ids, valid mask).

    Invalid (padding) seeds (< 0) and empty slots yield id ``num_vertices``
    (the sentinel every consumer treats as padding).

    ``replace=False`` (default) samples WITHOUT replacement via Floyd's
    algorithm — same distribution as the reference's reservoir
    (ntsSampler.hpp:113-172); ``replace=True`` is the cheaper
    with-replacement mode (duplicates are legal multi-edges to the
    estimator, bias vanishing as degree grows).
    """
    cap = seeds.shape[0]
    safe = jnp.clip(seeds, 0, num_vertices - 1)
    lo = jnp.take(offsets, safe)
    deg = jnp.take(offsets, safe + 1) - lo
    # uniform slot draws; slot j of row r picks edge (lo + u_rj mod deg)
    u = jax.random.randint(key, (cap, fanout), 0, jnp.iinfo(jnp.int32).max)
    take_all = deg[:, None] <= fanout
    idx_all = jnp.minimum(jnp.arange(fanout)[None, :], deg[:, None] - 1)
    if replace:
        idx_rand = u % jnp.maximum(deg, 1)[:, None]
    else:
        idx_rand = _floyd_distinct(u, deg.astype(jnp.int32), fanout)
    pick = lo[:, None] + jnp.where(take_all, idx_all, idx_rand)
    ids = jnp.take(nbr, jnp.clip(pick, 0, nbr.shape[0] - 1))
    valid = (seeds >= 0)[:, None] & (deg > 0)[:, None] & (
        jnp.arange(fanout)[None, :] < jnp.maximum(deg, 1)[:, None])
    return jnp.where(valid, ids, num_vertices).astype(jnp.int32), valid


def dedup_relabel(flat_ids: jax.Array, num_vertices: int, table_cap: int):
    """[N] global ids (sentinel V = padding) → (table [table_cap] int32
    (-1 padded), local [N] indices into the table).

    sampCSC::postprocessing with static shapes: key-value sort →
    adjacent-unique → rank by cumsum → un-permute sort.  r5: the relabel
    carries the rank back through a second kv-sort instead of
    jnp.searchsorted — on this stack searchsorted lowers to
    ceil(log2(scap)) rounds of one-lane gathers and cost ~10 ms/step at
    the TTA shape (76.8K flat ids) while the three bitonic sorts
    together cost ~0.3 ms (tools/probe_sampled_fwd4.py); outputs are
    identical except the local index assigned to PADDING slots
    (in-range either way, and every consumer multiplies those lanes by
    weight 0).
    """
    n = flat_ids.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    s, p = jax.lax.sort((flat_ids, pos), num_keys=1)
    first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    first = first & (s < num_vertices)
    uniq = jnp.where(first, s, num_vertices)
    uniq = jnp.sort(uniq)[:table_cap]                 # unique ids first
    table = jnp.where(uniq < num_vertices, uniq, -1).astype(jnp.int32)
    # rank[i] = index of s[i]'s unique id in ``uniq`` (padding rows
    # inherit the last real rank — weight-masked downstream); sorting
    # (original position, rank) un-permutes the ranks to input order
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    _, local = jax.lax.sort((p, rank), num_keys=1)
    local = jnp.clip(local, 0, table_cap - 1).astype(jnp.int32)
    return table, local


def sample_block(key: jax.Array, offsets: jax.Array, nbr: jax.Array,
                 out_degree: jax.Array, in_degree: jax.Array,
                 seeds: jax.Array, fanout: Sequence[int], num_vertices: int,
                 caps: Sequence[int], scaps: Sequence[int],
                 replace: bool = False, include_dst: bool = False,
                 rescale: bool = False):
    """Full multi-hop block (device analogue of Sampler.sample_one).

    Returns (dst0, tables, idxs, ws) with the same layout the minibatch
    trainers consume; with ``include_dst`` (attention/pool models) a fifth
    element — per-hop dst_local tables — is appended, and each hop's dst
    ids are folded into the dedup so the dst's own row is guaranteed
    present in its hop table (the host sampler's include_dst contract;
    static_caps sizes scap for the appends)."""
    hops = len(fanout)
    dst0 = seeds
    cur = seeds
    tables, idxs, ws, dls = [], [], [], []
    keys = jax.random.split(key, hops)
    for h in range(hops):
        fo = fanout[hops - 1 - h]
        cap, scap = caps[h], scaps[h]
        cur_p = jnp.concatenate(
            [cur, jnp.full(cap - cur.shape[0], -1, jnp.int32)]) \
            if cur.shape[0] < cap else cur
        ids, valid = sample_hop(keys[h], offsets, nbr, cur_p, fo,
                                num_vertices, replace=replace)
        flat = ids.reshape(-1)
        if include_dst:
            dst_ids = jnp.where(cur_p >= 0, cur_p,
                                num_vertices).astype(jnp.int32)
            table, local_all = dedup_relabel(
                jnp.concatenate([flat, dst_ids]), num_vertices, scap)
            nbr_idx = local_all[:flat.shape[0]].reshape(cap, fo)
            dls.append(jnp.where(cur_p >= 0, local_all[flat.shape[0]:],
                                 -1).astype(jnp.int32))
        else:
            table, local = dedup_relabel(flat, num_vertices, scap)
            nbr_idx = local.reshape(cap, fo)
        # global-degree norm weights (MiniBatchFuseOp), 0 for padding
        od = jnp.take(out_degree,
                      jnp.clip(flat, 0, num_vertices - 1)).reshape(cap, fo)
        idg = jnp.take(in_degree,
                       jnp.clip(cur_p, 0, num_vertices - 1))[:, None]
        w = jnp.where(
            valid & (ids < num_vertices),
            1.0 / jnp.sqrt(jnp.maximum(od, 1) * jnp.maximum(idg, 1)), 0.0
        ).astype(jnp.float32)
        if rescale:
            # SAMPLE_RESCALE: deg_in/k_sampled makes the fanout-capped sum
            # an unbiased estimate of the full-graph aggregate (without
            # replacement k == min(fo, deg), so deg <= fo scales by 1)
            k_eff = jnp.sum((w != 0).astype(jnp.float32), axis=1,
                            keepdims=True)
            w = w * (jnp.maximum(idg, 1.0) / jnp.maximum(k_eff, 1.0))
        tables.append(table)
        idxs.append(nbr_idx)
        ws.append(w)
        cur = table
    if include_dst:
        return dst0, tuple(tables), tuple(idxs), tuple(ws), tuple(dls)
    return dst0, tuple(tables), tuple(idxs), tuple(ws)


class DeviceSampler:
    """Drop-in block producer backed by the on-device sampler."""

    def __init__(self, graph, fanout: Sequence[int], batch_size: int,
                 caps: Sequence[int], scaps: Sequence[int],
                 replace: bool = False, include_dst: bool = False,
                 rescale: bool = False):
        # int32 offsets halve HBM traffic but overflow at 2^31 edges
        # (ADVICE.md r1); keep int64 for graphs that big.
        off_dtype = "int32" if graph.num_edges < 2 ** 31 else "int64"
        self.offsets = jnp.asarray(graph.fwd_offsets.astype(off_dtype))
        self.nbr = jnp.asarray(graph.fwd_src)
        self.out_degree = jnp.asarray(graph.out_degree.astype("float32"))
        self.in_degree = jnp.asarray(graph.in_degree.astype("float32"))
        self.num_vertices = graph.num_vertices
        self.fanout = [int(f) for f in fanout]
        self.batch_size = batch_size
        self.caps = list(caps)
        self.scaps = list(scaps)
        self.replace = replace
        self.include_dst = include_dst
        self.rescale = rescale
        self._fn = jax.jit(partial(
            sample_block, fanout=tuple(self.fanout),
            num_vertices=self.num_vertices, caps=tuple(self.caps),
            scaps=tuple(self.scaps), replace=replace,
            include_dst=include_dst, rescale=rescale))

    def __call__(self, key: jax.Array, seeds: jax.Array):
        """seeds: [batch_size] int32 (pad with -1)."""
        return self._fn(key, self.offsets, self.nbr, self.out_degree,
                        self.in_degree, seeds)
