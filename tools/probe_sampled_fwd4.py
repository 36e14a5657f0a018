"""Ladder 4: decompose the device sampler's dedup_relabel (r5).

Probe 3 showed EVERY forward variant that consumes idxs costs ~9.6 ms
while consuming only tables costs ~0.05: XLA dead-code-eliminates the
unused `local` relabel, so profile_sampled's "sample 1.12 ms" never paid
for dedup_relabel's local-index construction.  The real cost sits in
sort → compaction-sort → searchsorted over the deepest hop's 76.8K flat
ids (searchsorted = ceil(log2(scap)) rounds of 1-lane gathers; sorts are
bitonic).  Ladder (32-step scans, block built with include_dst=False):

  ids_only       — sample_hop only (both hops), no dedup at all
  +sort1         — + jnp.sort(flat) per hop
  +uniq          — + the masked compaction sort (tables, no local)
  +local         — + searchsorted (== the full shipped sample_block)
  kv3sort        — relabel via 3 lax.sort's (kv-sort + rank cumsum +
                   un-permute sort), no searchsorted
  nodedup_fwd    — NO dedup: tables = raw ids, idxs = arange — plus the
                   full GCN forward (the end-to-end contender)
  dedup_fwd      — shipped sample_block + full GCN forward (reference)

Usage: python tools/probe_sampled_fwd4.py   (TPU; digits21k on disk)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    import jax.numpy as jnp
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import load_dataset
    from neutronstarlite_tpu.training.minibatch import (
        MinibatchTrainer, _gather_table, run_sampled_forward)
    from neutronstarlite_tpu.sampling.device_sampler import (
        sample_block, sample_hop)

    datum = load_dataset(InputInfo(
        vertices=22017, layer_string="64-64-10",
        edge_file="data/digits21k.edge.self",
        feature_file="data/digits21k.featuretable",
        label_file="data/digits21k.labeltable",
        mask_file="data/digits21k.mask"))

    cfg = InputInfo(vertices=datum.num_vertices, layer_string="64-64-10",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.3,
                    seed=7, dtype="bfloat16", epochs=1)
    cfg.fanout_string = "10-15"
    cfg.batch_size = 512
    cfg.sampler_backend = "device"
    tr = MinibatchTrainer(datum, cfg, model="gcn")
    tr.run(epochs=1)

    n_steps = 32
    batch = 512
    ds = tr.dev_sampler
    samp = (ds.offsets, ds.nbr, ds.out_degree, ds.in_degree)
    nids = tr.nids["train"]
    seeds = jnp.asarray(np.resize(nids, n_steps * batch).astype(
        np.int32).reshape(n_steps, batch))
    key = jax.random.PRNGKey(0)
    nv = datum.num_vertices
    fanout = tuple(ds.fanout)
    caps, scaps = tuple(ds.caps), tuple(ds.scaps)
    hops = len(fanout)
    n_layers = len(cfg.layer_sizes) - 1
    w1, w2 = tr.params[0]["w"], tr.params[1]["w"]

    def scan_of(body_fn):
        @jax.jit
        def run(features, samp, seeds_2d, key):
            keys = jax.random.split(key, n_steps)

            def body(c, inp):
                s, k = inp
                return c, body_fn(features, samp, s, k)
            _, acc = jax.lax.scan(body, 0.0, (seeds_2d, keys))
            return acc
        return run

    def hops_ids(samp_t, seed, key, per_hop):
        """Run both hops like sample_block (no dedup recursion: next hop's
        seeds are the RAW sampled ids, duplicates legal), applying per_hop
        to each hop's flat ids and summing the results."""
        offsets, nbr, _, _ = samp_t
        keys = jax.random.split(key, hops)
        cur = seed
        acc = 0.0
        for h in range(hops):
            fo = fanout[hops - 1 - h]
            cap = caps[h]
            cur_p = jnp.concatenate(
                [cur, jnp.full(cap - cur.shape[0], -1, jnp.int32)]) \
                if cur.shape[0] < cap else cur
            ids, valid = sample_hop(keys[h], offsets, nbr, cur_p, fo, nv)
            flat = ids.reshape(-1)
            acc = acc + per_hop(flat)
            cur = flat                                     # raw, no dedup
        return acc

    def v_ids(f, samp_t, seed, key):
        return hops_ids(samp_t, seed, key, lambda flat: jnp.sum(flat))

    def v_sort1(f, samp_t, seed, key):
        return hops_ids(samp_t, seed, key,
                        lambda flat: jnp.sum(jnp.sort(flat)))

    def v_uniq(f, samp_t, seed, key):
        def per_hop(flat):
            s = jnp.sort(flat)
            first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
            first = first & (s < nv)
            uniq = jnp.sort(jnp.where(first, s, nv))
            return jnp.sum(uniq)
        return hops_ids(samp_t, seed, key, per_hop)

    def v_local(f, samp_t, seed, key):
        def per_hop(flat):
            s = jnp.sort(flat)
            first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
            first = first & (s < nv)
            uniq = jnp.sort(jnp.where(first, s, nv))
            local = jnp.searchsorted(uniq, jnp.clip(flat, 0, nv - 1))
            return jnp.sum(uniq) + jnp.sum(local)
        return hops_ids(samp_t, seed, key, per_hop)

    def v_kv3(f, samp_t, seed, key):
        def per_hop(flat):
            n = flat.shape[0]
            pos = jnp.arange(n, dtype=jnp.int32)
            s, p = jax.lax.sort((flat, pos), num_keys=1)
            first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
            first = first & (s < nv)
            rank = jnp.cumsum(first.astype(jnp.int32)) - 1
            uniq = jnp.sort(jnp.where(first, s, nv))
            _, local = jax.lax.sort((p, rank), num_keys=1)
            return jnp.sum(uniq) + jnp.sum(local)
        return hops_ids(samp_t, seed, key, per_hop)

    def fwd_gcn(f, tables, idxs, ws):
        x = _gather_table(f, tables[-1])
        y = jnp.einsum("rk,rkf->rf", ws[1], jnp.take(x, idxs[1], axis=0),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        x1 = jax.nn.relu(y @ w1)
        y0 = jnp.einsum("rk,rkf->rf", ws[0], jnp.take(x1, idxs[0], axis=0),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        return jnp.sum(y0 @ w2)

    def v_nodedup_fwd(f, samp_t, seed, key):
        offsets, nbr, out_degree, in_degree = samp_t
        keys = jax.random.split(key, hops)
        cur = seed
        tables, idxs, ws = [], [], []
        for h in range(hops):
            fo = fanout[hops - 1 - h]
            cap = caps[h]
            cur_p = jnp.concatenate(
                [cur, jnp.full(cap - cur.shape[0], -1, jnp.int32)]) \
                if cur.shape[0] < cap else cur
            ids, valid = sample_hop(keys[h], offsets, nbr, cur_p, fo, nv)
            flat = ids.reshape(-1)
            table = jnp.where(flat < nv, flat, -1).astype(jnp.int32)
            nbr_idx = jnp.arange(cap * fo,
                                 dtype=jnp.int32).reshape(cap, fo)
            od = jnp.take(out_degree,
                          jnp.clip(flat, 0, nv - 1)).reshape(cap, fo)
            idg = jnp.take(in_degree, jnp.clip(cur_p, 0, nv - 1))[:, None]
            w = jnp.where(valid & (ids < nv),
                          1.0 / jnp.sqrt(jnp.maximum(od, 1) *
                                         jnp.maximum(idg, 1)),
                          0.0).astype(jnp.float32)
            tables.append(table)
            idxs.append(nbr_idx)
            ws.append(w)
            cur = table
        return fwd_gcn(f, tables, idxs, ws)

    def v_dedup_fwd(f, samp_t, seed, key):
        block = sample_block(key, *samp_t, seed, fanout=fanout,
                             num_vertices=nv, caps=caps, scaps=scaps,
                             replace=ds.replace, include_dst=False)
        _, tables, idxs, ws = block
        return fwd_gcn(f, tables, idxs, ws)

    out = {}
    for name, fn in [("ids_only", v_ids), ("+sort1", v_sort1),
                     ("+uniq", v_uniq), ("+local", v_local),
                     ("kv3sort", v_kv3),
                     ("nodedup_fwd", v_nodedup_fwd),
                     ("dedup_fwd", v_dedup_fwd)]:
        t = timeit(scan_of(fn), tr.features, samp, seeds, key)
        out[name] = round(t / n_steps * 1e3, 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
