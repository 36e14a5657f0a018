"""Sampled-minibatch trainer: the GCNSAMPLESINGLE path.

Ref: toolkits/GCN_CPU_SAMPLE.hpp:188-289 — per epoch, iterate reservoir-
sampled blocks; per batch: dropout → MiniBatchFuseOp aggregation per layer →
relu(P·n) (hidden) / P·n (last) → per-batch masked NLL → backward → per-BATCH
NtsAdam update. Eval/test run the same forward over their own samplers.

TPU redesign: each hop is a fixed-shape ELL block (see sampling/sampler.py),
so the whole per-batch step is ONE jitted function reused across batches and
epochs; the host sampler runs ahead on CPU while the device computes.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import GNNDatum
from neutronstarlite_tpu.nn import layers, optim, param
from neutronstarlite_tpu.sampling.sampler import (Sampler, pad_block,
                                                  split_nids_by_mask,
                                                  static_caps)


def _gather_table(features: jax.Array, table: jax.Array) -> jax.Array:
    """features[table] with -1 (padding) rows zeroed."""
    safe = jnp.clip(table, 0, features.shape[0] - 1)
    rows = jnp.take(features, safe, axis=0)
    return jnp.where((table >= 0)[:, None], rows, 0.0)


def _ell_agg(idx: jax.Array, w: jax.Array, x: jax.Array) -> jax.Array:
    """out[r] = Σ_k w[r,k]·x[idx[r,k]] — the MiniBatchFuseOp aggregation
    (ref: core/ntsMiniBatchGraphOp.hpp:61-131) over one ELL hop."""
    gathered = jnp.take(x, idx, axis=0)            # [cap, fo, F]
    return jnp.einsum("rk,rkf->rf", w, gathered,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def sampled_forward(params, features, block_arrays, key, *, training: bool,
                    drop_rate: float, n_layers: int) -> jax.Array:
    """The GCNSAMPLESINGLE per-batch forward (dropout → MiniBatchFuseOp →
    relu(P·n) | P·n), shared by the single-chip and data-parallel steps."""
    dst0, tables, idxs, ws = block_arrays[:4]
    x = _gather_table(features, tables[-1])
    if training and drop_rate > 0:
        dkeys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        h = n_layers - 1 - l
        if training and drop_rate > 0:
            x = layers.dropout(dkeys[l], x, drop_rate, True)
        y = _ell_agg(idxs[h], ws[h], x)
        w = params[l]["w"]
        x = jax.nn.relu(y @ w) if l < n_layers - 1 else y @ w
    return x  # [batch, C] values for dst0


def _dst_rows(x: jax.Array, dl: jax.Array) -> jax.Array:
    """x[dst_local] with -1 (padding) rows zeroed — the dst's own features
    for models whose layer combines the aggregate with the vertex itself."""
    safe = jnp.clip(dl, 0, x.shape[0] - 1)
    return jnp.where((dl >= 0)[:, None], jnp.take(x, safe, axis=0), 0.0)


def sampled_forward_gat(params, features, block_arrays, key, *,
                        training: bool, drop_rate: float, n_layers: int,
                        slope: float = 0.2) -> jax.Array:
    """Sampled GAT: per-hop attention over the fixed-shape ELL blocks
    (our extension — the reference's only sampled model is GCN,
    toolkits/GCN_CPU_SAMPLE.hpp:188-289; its full-graph GAT edge chain,
    toolkits/GAT_CPU.hpp:194-226, is applied per hop here). Each hop
    scores leaky_relu(s_src[nbr] + s_dst[dst]) over the ≤fanout sampled
    slots, softmaxes within the row (invalid slots masked), and
    aggregates the transformed neighbor rows — the [cap, fanout] tensors
    are minibatch-small, so plain AD suffices (no custom VJP needed).
    Requires blocks sampled with include_dst=True (dst_local arrays).

    Multi-head layers (a_l/a_r stored [F'/H, H], NUM_HEADS semantics of
    models/gat.py: hidden layers multi-head, last single-head) vectorize
    the per-head softmax over a heads axis — one shared neighbor gather
    for all heads, head-sliced scores, concat in head order."""
    dst0, tables, idxs, ws, dls = block_arrays
    x = _gather_table(features, tables[-1])
    if training and drop_rate > 0:
        dkeys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        h = n_layers - 1 - l
        if training and drop_rate > 0:
            x = layers.dropout(dkeys[l], x, drop_rate, True)
        hsrc = x @ params[l]["w"]                       # [scap, F']
        a_l, a_r = params[l]["a_l"], params[l]["a_r"]
        valid = ws[h] != 0
        if a_l.ndim == 2:                               # multi-head [fh, H]
            fh, heads = a_l.shape
            hh = hsrc.reshape(hsrc.shape[0], heads, fh)  # [scap, H, fh]
            s_src = jnp.einsum("shf,fh->sh", hh, a_l,
                               preferred_element_type=jnp.float32)
            hd = _dst_rows(hsrc, dls[h]).reshape(-1, heads, fh)
            s_dst = jnp.einsum("rhf,fh->rh", hd, a_r,
                               preferred_element_type=jnp.float32)
            m = jax.nn.leaky_relu(
                jnp.take(s_src, idxs[h], axis=0) + s_dst[:, None, :], slope)
            m = jnp.where(valid[:, :, None], m, -1e30)   # [cap, fo, H]
            mrow = jnp.maximum(jnp.max(m, axis=1), -1e30 / 2)
            z = jnp.where(valid[:, :, None],
                          jnp.exp(m - mrow[:, None, :]), 0.0)
            a = z / jnp.maximum(jnp.sum(z, axis=1, keepdims=True), 1e-30)
            gsl = jnp.take(hh, idxs[h], axis=0)          # [cap, fo, H, fh]
            y = jnp.einsum("rkh,rkhf->rhf", a, gsl,
                           preferred_element_type=jnp.float32)
            y = y.reshape(y.shape[0], heads * fh).astype(x.dtype)
        else:
            s_src = hsrc @ a_l                           # [scap]
            s_dst = _dst_rows(hsrc, dls[h]) @ a_r        # [cap]
            m = jax.nn.leaky_relu(
                jnp.take(s_src, idxs[h]) + s_dst[:, None], slope)
            m = jnp.where(valid, m, -1e30)
            mrow = jnp.maximum(jnp.max(m, axis=1), -1e30 / 2)
            z = jnp.where(valid, jnp.exp(m - mrow[:, None]), 0.0)
            a = z / jnp.maximum(jnp.sum(z, axis=1, keepdims=True), 1e-30)
            y = jnp.einsum("rk,rkf->rf", a, jnp.take(hsrc, idxs[h], axis=0),
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)
        # the reference GAT relu's EVERY layer incl. the last (models/gat)
        x = jax.nn.relu(y)
    return x


def sampled_forward_sage(params, features, block_arrays, key, *,
                         training: bool, drop_rate: float, n_layers: int
                         ) -> jax.Array:
    """Sampled GraphSAGE max-pool: per hop, pool = max_k relu(x_nbr·W_pool)
    over the ≤fanout sampled slots, then relu([x_dst ∥ pool]·W) — the
    per-hop form of models/sage.py (our extension; the reference's only
    sampled model is GCN, toolkits/GCN_CPU_SAMPLE.hpp:188-289). Gradient
    routes to the FIRST extremal slot per lane (argmax + take_along_axis),
    matching the full-graph ops' record[] semantics
    (core/ntsSingleCPUGraphOp.hpp:206-340). Requires include_dst blocks
    (the concat needs the dst's own row)."""
    dst0, tables, idxs, ws, dls = block_arrays
    x = _gather_table(features, tables[-1])
    if training and drop_rate > 0:
        dkeys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        h = n_layers - 1 - l
        if training and drop_rate > 0:
            x = layers.dropout(dkeys[l], x, drop_rate, True)
        t = jax.nn.relu(x @ params[l]["w_pool"])        # [scap, F]
        valid = (ws[h] != 0)[:, :, None]
        gth = jnp.where(valid, jnp.take(t, idxs[h], axis=0), -1e30)
        am = jnp.argmax(gth, axis=1)                    # first max per lane
        pool = jnp.take_along_axis(gth, am[:, None, :], axis=1)[:, 0]
        pool = jnp.where(jnp.any(valid, axis=1), pool, 0.0)
        xd = _dst_rows(x, dls[h])
        y = jnp.concatenate([xd, pool], axis=-1) @ params[l]["w"]
        x = jax.nn.relu(y) if l < n_layers - 1 else y
    return x


def sampled_forward_gin(params, features, block_arrays, key, *,
                        training: bool, drop_rate: float, n_layers: int,
                        eps: float = 0.0) -> jax.Array:
    """Sampled GIN: per hop, relu((agg + (1+ε)x_dst)·W1)·W2 — the per-hop
    form of models/gin.py (our extension; the reference's only sampled
    model is GCN, toolkits/GCN_CPU_SAMPLE.hpp:188-289; its full-graph GIN
    vertexForward is toolkits/GIN_CPU.hpp:175-190). Following the
    reference's sampled-model style there is no batchnorm here (the
    full-graph GIN's BN sees the whole vertex set; per-minibatch stats
    would be a different model). Requires include_dst blocks."""
    dst0, tables, idxs, ws, dls = block_arrays
    x = _gather_table(features, tables[-1])
    if training and drop_rate > 0:
        dkeys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        h = n_layers - 1 - l
        if training and drop_rate > 0:
            x = layers.dropout(dkeys[l], x, drop_rate, True)
        agg = _ell_agg(idxs[h], ws[h], x)
        hpre = agg + (1.0 + eps) * _dst_rows(x, dls[h])
        y = jax.nn.relu(hpre @ params[l]["w1"]) @ params[l]["w2"]
        x = jax.nn.relu(y) if l < n_layers - 1 else y
    return x


def sampled_forward_commnet(params, features, block_arrays, key, *,
                            training: bool, drop_rate: float, n_layers: int
                            ) -> jax.Array:
    """Sampled CommNet: per hop, relu(agg·W_agg + x_dst·W_self) — the
    per-hop form of models/commnet.py (our extension; full-graph
    vertexForward: toolkits/COMMNET_GPU.hpp:181-199, relu on every layer
    like the full-graph model). Requires include_dst blocks."""
    dst0, tables, idxs, ws, dls = block_arrays
    x = _gather_table(features, tables[-1])
    if training and drop_rate > 0:
        dkeys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        h = n_layers - 1 - l
        if training and drop_rate > 0:
            x = layers.dropout(dkeys[l], x, drop_rate, True)
        agg = _ell_agg(idxs[h], ws[h], x)
        x = jax.nn.relu(agg @ params[l]["w_agg"]
                        + _dst_rows(x, dls[h]) @ params[l]["w_self"])
    return x


def sampled_forward_ggcn(params, features, block_arrays, key, *,
                         training: bool, drop_rate: float, n_layers: int,
                         slope: float = 0.2) -> jax.Array:
    """Sampled GGCN: per hop, per-FEATURE edge gates over the ≤fanout
    sampled slots — m = leaky_relu(x_t[nbr]·Gl + x_t[dst]·Gr), per-lane
    softmax within the row (invalid slots masked), gated sum, relu.
    The per-hop form of models/ggcn.py (ref: toolkits/GGCN_CPU.hpp:184-220
    for the full-graph edge chain; sampled GGCN is our extension). The
    [cap, fanout, F'] tensors are minibatch-small, so plain AD suffices.
    Requires include_dst blocks."""
    dst0, tables, idxs, ws, dls = block_arrays
    x = _gather_table(features, tables[-1])
    if training and drop_rate > 0:
        dkeys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        h = n_layers - 1 - l
        if training and drop_rate > 0:
            x = layers.dropout(dkeys[l], x, drop_rate, True)
        p = params[l]
        f_out = p["gate"].shape[0] // 2
        g_l, g_r = p["gate"][:f_out], p["gate"][f_out:]
        x_t = x @ p["w"]                                  # [scap, F']
        gs = x_t @ g_l                                    # [scap, F']
        gd = _dst_rows(x_t, dls[h]) @ g_r                 # [cap, F']
        valid = (ws[h] != 0)[:, :, None]                  # [cap, fo, 1]
        m = jax.nn.leaky_relu(
            jnp.take(gs, idxs[h], axis=0) + gd[:, None, :], slope)
        m = jnp.where(valid, m, -1e30)
        mrow = jnp.maximum(jnp.max(m, axis=1), -1e30 / 2)  # [cap, F']
        z = jnp.where(valid, jnp.exp(m - mrow[:, None, :]), 0.0)
        a = z / jnp.maximum(jnp.sum(z, axis=1, keepdims=True), 1e-30)
        y = jnp.einsum("rkf,rkf->rf", a, jnp.take(x_t, idxs[h], axis=0),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        x = jax.nn.relu(y)
    return x


def run_sampled_forward(model_name, params, features, block_arrays, key, *,
                        training: bool, drop_rate: float, n_layers: int):
    if model_name == "gin":
        return sampled_forward_gin(params, features, block_arrays, key,
                                   training=training, drop_rate=drop_rate,
                                   n_layers=n_layers)
    if model_name == "commnet":
        return sampled_forward_commnet(params, features, block_arrays, key,
                                       training=training,
                                       drop_rate=drop_rate,
                                       n_layers=n_layers)
    if model_name == "ggcn":
        return sampled_forward_ggcn(params, features, block_arrays, key,
                                    training=training, drop_rate=drop_rate,
                                    n_layers=n_layers)
    if model_name == "gat":
        return sampled_forward_gat(params, features, block_arrays, key,
                                   training=training, drop_rate=drop_rate,
                                   n_layers=n_layers)
    if model_name == "sage":
        return sampled_forward_sage(params, features, block_arrays, key,
                                    training=training, drop_rate=drop_rate,
                                    n_layers=n_layers)
    return sampled_forward(params, features, block_arrays, key,
                           training=training, drop_rate=drop_rate,
                           n_layers=n_layers)


class MinibatchTrainer:
    """Single-chip sampled GCN training (GCNSAMPLESINGLE)."""

    def __init__(self, datum: GNNDatum, config: InputInfo,
                 fanout: Sequence[int] | None = None, shuffle: bool = True,
                 model: str = "gcn"):
        self.datum = datum
        self.config = config
        self.model_name = model
        self.fanout = [int(f) for f in (fanout or config.fanout)]
        if not self.fanout:
            raise ValueError("minibatch training requires FANOUT")
        n_heads = int(getattr(config, "num_heads", 1) or 1)
        if n_heads > 1 and model != "gat":
            raise ValueError("NUM_HEADS>1 applies to GAT only")
        if getattr(config, "hoist_l0", False):
            raise ValueError(
                "HOIST_L0 applies to full-graph training only: sampled "
                "blocks change every batch, so no layer-0 aggregate is "
                "epoch-invariant")
        sizes = config.layer_sizes
        if len(self.fanout) != len(sizes) - 1:
            raise ValueError(f"FANOUT length {len(self.fanout)} must equal "
                             f"model layers {len(sizes) - 1}")
        # attention/gate scores, the SAGE concat, and the GIN/CommNet
        # self-terms need the dst row in-table
        include_dst = model in ("gat", "sage", "gin", "commnet", "ggcn")
        self.include_dst = include_dst
        self.caps, self.scaps = static_caps(config.batch_size, self.fanout,
                                            datum.graph.num_vertices,
                                            include_dst=include_dst)

        key = jax.random.PRNGKey(config.seed)
        self.init_key, self.run_key = jax.random.split(key)
        n_layers = len(sizes) - 1
        if model == "gat":
            keys = jax.random.split(self.init_key, 3 * n_layers)
            # NUM_HEADS semantics of models/gat.py: hidden layers split
            # F' into H heads (a_l/a_r stored [F'/H, H]); last layer
            # single-head ([F'] vectors, the original layout)
            def _attn(k, f_out, heads):
                if heads > 1:
                    if f_out % heads:
                        raise ValueError(
                            f"NUM_HEADS:{heads} must divide hidden layer "
                            f"size {f_out}")
                    return param.glorot_uniform(k, f_out // heads, heads)
                return param.glorot_uniform(k, f_out, 1)[:, 0]
            self.params = [{
                "w": param.glorot_uniform(keys[3 * i], sizes[i],
                                          sizes[i + 1]),
                "a_l": _attn(keys[3 * i + 1], sizes[i + 1],
                             n_heads if i < n_layers - 1 else 1),
                "a_r": _attn(keys[3 * i + 2], sizes[i + 1],
                             n_heads if i < n_layers - 1 else 1),
            } for i in range(n_layers)]
        elif model == "sage":
            keys = jax.random.split(self.init_key, 2 * n_layers)
            # SAGE_POOL_DIM: pooled-representation width (0 = square,
            # the original semantics) — same contract as models/sage.init
            pd = int(getattr(config, "sage_pool_dim", 0) or 0)
            self.params = [{
                "w_pool": param.init_linear(keys[2 * i], sizes[i],
                                            pd or sizes[i])["w"],
                "w": param.init_linear(keys[2 * i + 1],
                                       sizes[i] + (pd or sizes[i]),
                                       sizes[i + 1])["w"],
            } for i in range(n_layers)]
        elif model == "gin":
            keys = jax.random.split(self.init_key, 2 * n_layers)
            self.params = [{
                "w1": param.glorot_uniform(keys[2 * i], sizes[i],
                                           sizes[i + 1]),
                "w2": param.glorot_uniform(keys[2 * i + 1], sizes[i + 1],
                                           sizes[i + 1]),
            } for i in range(n_layers)]
        elif model == "commnet":
            keys = jax.random.split(self.init_key, 2 * n_layers)
            self.params = [{
                "w_agg": param.glorot_uniform(keys[2 * i], sizes[i],
                                              sizes[i + 1]),
                "w_self": param.glorot_uniform(keys[2 * i + 1], sizes[i],
                                               sizes[i + 1]),
            } for i in range(n_layers)]
        elif model == "ggcn":
            keys = jax.random.split(self.init_key, 2 * n_layers)
            self.params = [{
                "w": param.glorot_uniform(keys[2 * i], sizes[i],
                                          sizes[i + 1]),
                "gate": param.glorot_uniform(keys[2 * i + 1],
                                             2 * sizes[i + 1],
                                             sizes[i + 1]),
            } for i in range(n_layers)]
        else:
            keys = jax.random.split(self.init_key, n_layers)
            self.params = [param.init_linear(keys[i], sizes[i], sizes[i + 1])
                           for i in range(n_layers)]
        self.opt_init, self.opt_update = optim.make_optimizer(config)
        self.opt_state = self.opt_init(self.params)

        self.features = jnp.asarray(datum.features)
        self.labels_np = datum.labels
        nids = split_nids_by_mask(datum.masks)
        g = datum.graph
        bs = config.batch_size
        rescale = bool(getattr(config, "sample_rescale", False))
        self.samplers = {
            "train": Sampler(g, nids["train"], bs, self.fanout,
                             seed=config.seed, shuffle=shuffle,
                             include_dst=include_dst, rescale=rescale),
            "val": Sampler(g, nids["val"], bs, self.fanout,
                           seed=config.seed + 1, shuffle=False,
                           include_dst=include_dst, rescale=rescale),
            "test": Sampler(g, nids["test"], bs, self.fanout,
                            seed=config.seed + 2, shuffle=False,
                            include_dst=include_dst, rescale=rescale),
        }
        self._train_step = jax.jit(self._make_step(training=True))
        self._eval_step = jax.jit(self._make_step(training=False))
        from neutronstarlite_tpu.utils.timing import PhaseTimer
        self.timer = PhaseTimer()   # DEBUGINFO-style phase breakdown

        # device-side sampling: the whole sample→train pipeline in one jit
        # (SAMPLER:device = without-replacement Floyd, the reference
        # reservoir's distribution; SAMPLER:device_wr = cheaper
        # with-replacement mode; see sampling/device_sampler.py)
        sb = getattr(config, "sampler_backend", "host")
        self.device_mode = sb in ("device", "device_wr")
        if self.device_mode:
            from neutronstarlite_tpu.sampling.device_sampler import (
                DeviceSampler)
            self.dev_sampler = DeviceSampler(g, self.fanout, bs, self.caps,
                                             self.scaps,
                                             replace=(sb == "device_wr"),
                                             include_dst=include_dst,
                                             rescale=rescale)
            self.labels_dev = jnp.asarray(datum.labels.astype(np.int32))
            self.nids = nids

    # ---- the per-batch jitted step ----
    def _make_step(self, training: bool):
        drop_rate = self.config.drop_rate
        n_layers = len(self.config.layer_sizes) - 1
        model_name = self.model_name

        def step(params, opt_state, features, block_arrays, labels, key):
            dst0 = block_arrays[0]
            valid = dst0 >= 0

            def loss_fn(p):
                logits = run_sampled_forward(
                    model_name, p, features, block_arrays, key,
                    training=training, drop_rate=drop_rate,
                    n_layers=n_layers)
                return layers.nll_loss_masked(
                    layers.log_softmax(logits), labels, valid), logits

            if training:
                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params, opt_state = self.opt_update(grads, opt_state, params)
            else:
                loss, logits = loss_fn(params)
            pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
            correct = jnp.sum(jnp.where(valid, (pred == labels).astype(
                jnp.int32), 0))
            count = jnp.sum(valid.astype(jnp.int32))
            return params, opt_state, loss, correct, count
        return step

    def _block_to_device(self, block):
        b = pad_block(block, self.caps, self.scaps)
        dst0 = jnp.asarray(b.dst_ids[0])
        tables = tuple(jnp.asarray(t) for t in b.src_tables)
        idxs = tuple(jnp.asarray(i) for i in b.nbr_idx)
        ws = tuple(jnp.asarray(w) for w in b.nbr_w)
        labels = jnp.asarray(
            np.where(b.dst_ids[0] >= 0,
                     self.labels_np[np.clip(b.dst_ids[0], 0, None)], 0)
            .astype(np.int32))
        arrays = (dst0, tables, idxs, ws)
        if b.dst_local is not None:
            arrays = arrays + (tuple(jnp.asarray(d) for d in b.dst_local),)
        return arrays, labels

    def _make_device_step(self, training: bool):
        drop_rate = self.config.drop_rate
        n_layers = len(self.config.layer_sizes) - 1
        ds = self.dev_sampler
        model_name = self.model_name

        def step(params, opt_state, features, labels_all, samp, seeds, key):
            ks, kd = jax.random.split(key)
            from neutronstarlite_tpu.sampling.device_sampler import (
                sample_block)
            # graph arrays arrive as ARGUMENTS (samp), not closures —
            # closed-over device arrays become HLO constants the remote
            # compiler must ingest (CLAUDE.md; the dist variant already
            # passed them explicitly)
            offsets, nbr, out_deg, in_deg = samp
            block = sample_block(
                ks, offsets, nbr, out_deg, in_deg, seeds,
                fanout=tuple(ds.fanout), num_vertices=ds.num_vertices,
                caps=tuple(ds.caps), scaps=tuple(ds.scaps),
                replace=ds.replace, include_dst=ds.include_dst,
                rescale=ds.rescale)
            dst0 = block[0]
            labels = jnp.where(
                dst0 >= 0,
                jnp.take(labels_all, jnp.clip(dst0, 0, None)), 0)
            valid = dst0 >= 0

            def loss_fn(p):
                logits = run_sampled_forward(model_name, p, features,
                                             block, kd,
                                             training=training,
                                             drop_rate=drop_rate,
                                             n_layers=n_layers)
                return layers.nll_loss_masked(
                    layers.log_softmax(logits), labels, valid), logits

            if training:
                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                new_params, new_opt = self.opt_update(grads, opt_state,
                                                      params)
                # all-padding scan steps (seed tail shorter than
                # bs*DEVICE_STEPS_PER_CALL) must be true no-ops: an
                # unconditional NtsAdam call would still decay weights and
                # advance the lr/beta schedule on zero grads, drifting off
                # the host-sampler trajectory
                live = jnp.any(valid)
                pick = lambda new, old: jax.tree.map(  # noqa: E731
                    lambda a, b: jnp.where(live, a, b), new, old)
                params = pick(new_params, params)
                opt_state = pick(new_opt, opt_state)
            else:
                loss, logits = loss_fn(params)
            pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
            correct = jnp.sum(jnp.where(
                valid, (pred == labels).astype(jnp.int32), 0))
            count = jnp.sum(valid.astype(jnp.int32))
            return params, opt_state, loss, correct, count
        return step

    # steps fused per device call: amortizes the per-dispatch host↔device
    # round trip (~30 ms on the tunnel) over many batches via lax.scan
    DEVICE_STEPS_PER_CALL = 32
    # adaptive call lengths (descending; last = the padded-tail fallback).
    # A FIXED 32-step scan quantizes every split up to 32 executed
    # sample+forward units: digits21k's val split (1 real batch) paid a
    # full 0.38 s scan, and a whole TTA pass ran 140 padded steps for 45
    # real batches — 50% of the 1.52 s/pass was padding (measured r5,
    # tools/profile_sampled.py). Greedy decomposition over these sizes
    # executes ~real_batches steps instead, at ≤3 extra jit programs.
    DEVICE_SCAN_SIZES = (32, 8, 1)

    def _make_device_epoch(self, training: bool,
                           n_steps: int | None = None):
        step = self._make_device_step(training)
        n_steps = n_steps or self.DEVICE_STEPS_PER_CALL

        def epoch_fn(params, opt_state, features, labels_all, samp, seeds_2d,
                     key):
            keys = jax.random.split(key, n_steps)

            def body(carry, inp):
                p, o = carry
                seeds, k = inp
                p, o, loss, c, n = step(p, o, features, labels_all, samp,
                                        seeds, k)
                return (p, o), (loss, c, n)

            (params, opt_state), (losses, cs, ns) = jax.lax.scan(
                body, (params, opt_state), (seeds_2d, keys))
            live = (ns > 0).astype(jnp.float32)
            loss_sum = jnp.sum(losses * live)
            return (params, opt_state, loss_sum, jnp.sum(live),
                    jnp.sum(cs), jnp.sum(ns))
        return jax.jit(epoch_fn)

    def run_epoch_device(self, split: str = "train"):
        """Device-sampled epoch: lax.scan runs up to DEVICE_STEPS_PER_CALL
        batches (sample→train) per dispatch; only seed arrays leave the
        host. Calls are sized greedily from DEVICE_SCAN_SIZES so a split
        executes ~its real batch count instead of the next multiple of
        32 (padded steps run the full sample+forward compute)."""
        training = split == "train"
        if not hasattr(self, "_epoch_dev"):
            self._epoch_dev = {}   # (training, scan_len) -> jitted epoch
        ds = self.dev_sampler
        samp = (ds.offsets, ds.nbr, ds.out_degree, ds.in_degree)
        nids = self.nids[split]
        # consume a FRESH subkey for the shuffle order (reusing run_key and
        # then splitting it would correlate batch order with step keys)
        self.run_key, ko = jax.random.split(self.run_key)
        order = np.random.default_rng(
            int(jax.random.randint(ko, (), 0, 2**31 - 1))
        ).permutation(nids) if training else nids
        bs = self.config.batch_size
        rows = []   # [loss_sum, live, correct, count] per device call —
        # materialized with ONE transfer after the loop (each float()/int()
        # here would pay a device→host round trip per call; see trainer.py
        # _pack_stats)
        pos = 0
        while pos < order.size:
            rem = order.size - pos
            s = next((z for z in self.DEVICE_SCAN_SIZES if z * bs <= rem),
                     self.DEVICE_SCAN_SIZES[-1])
            epoch_fn = self._epoch_dev.get((training, s))
            if epoch_fn is None:
                epoch_fn = self._make_device_epoch(training, s)
                self._epoch_dev[(training, s)] = epoch_fn
            chunk = order[pos:pos + s * bs].astype(np.int32)
            pos += chunk.size
            if chunk.size < s * bs:
                chunk = np.concatenate(
                    [chunk, np.full(s * bs - chunk.size, -1, np.int32)])
            seeds_2d = jnp.asarray(chunk.reshape(s, bs))
            self.run_key, k = jax.random.split(self.run_key)
            with self.timer.phase(f"{split}_dev_scan"):
                (self.params, self.opt_state, loss_sum, live, c, n) =                     epoch_fn(self.params, self.opt_state, self.features,
                             self.labels_dev, samp, seeds_2d, k)
                rows.append(jnp.stack([loss_sum, live,
                                       c.astype(jnp.float32),
                                       n.astype(jnp.float32)]))
        if not rows:
            return 0.0, 0.0
        tot = np.asarray(jnp.stack(rows)).sum(axis=0)  # one transfer
        return (float(tot[0]) / max(float(tot[1]), 1),
                float(tot[2]) / max(float(tot[3]), 1))

    def _prefetch(self, split: str, depth: int = 4):
        """Host-side sampling pipeline: a producer thread runs the sampler
        (C++/OpenMP hot loop) while the device computes the previous batch —
        the TPU version of the reference's sampler work-queue with dedicated
        producer threads (ntsSampler.hpp:23-104)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = object()
        cancel = threading.Event()   # consumer gone: unblock + exit

        def _put(item):
            """Bounded put that gives up if the consumer cancelled —
            otherwise an abandoned generator (exception in the train step,
            GeneratorExit) leaves the producer blocked on a full queue
            forever, leaking the thread and its block arrays."""
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for block in self.samplers[split].sample():
                    if not _put(self._block_to_device(block)):
                        return
                _put(stop)
            except BaseException as e:  # propagate to the consumer
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    t.join()
                    raise item
                yield item
            t.join()
        finally:
            cancel.set()
            try:                       # release a producer blocked on put
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def run_epoch(self, split: str = "train"):
        """One pass over a split; returns (mean_loss, accuracy)."""
        if getattr(self, "device_mode", False):
            return self.run_epoch_device(split)
        training = split == "train"
        step = self._train_step if training else self._eval_step
        rows = []   # [loss, correct, count] per batch; one transfer at end
        for arrays, labels in self._prefetch(split):
            self.run_key, k = jax.random.split(self.run_key)
            with self.timer.phase(f"{split}_step"):
                self.params, self.opt_state, loss, c, n = step(
                    self.params, self.opt_state, self.features, arrays,
                    labels, k)
                rows.append(jnp.stack([loss, c.astype(jnp.float32),
                                       n.astype(jnp.float32)]))
        if not rows:
            return 0.0, 0.0
        tot = np.asarray(jnp.stack(rows)).sum(axis=0)  # one transfer
        return (float(tot[0]) / len(rows),
                float(tot[1]) / max(float(tot[2]), 1))

    def _stage_infer(self, arrays):
        """Hook: make per-batch inference inputs jit-compatible with the
        trainer's params (identity single-process; DistMinibatchTrainer
        stages them as global replicated arrays under jax.distributed)."""
        return arrays

    def predict(self, nids=None):
        """Sampled inference (the surface the other two trainers' predict()
        already had — VERDICT r2 item 7): eval-mode forward over
        neighbor-sampled blocks for ``nids`` (default: every vertex).
        Returns [V, C] logits with rows outside ``nids`` zero. Sampled
        inference is stochastic by construction (like the reference's
        eval/test samplers, GCN_CPU_SAMPLE.hpp:251-289); a fixed seed makes
        it reproducible."""
        g = self.datum.graph
        if nids is None:
            nids = np.arange(g.num_vertices, dtype=np.int32)
        nids = np.asarray(nids, dtype=np.int32)
        sampler = Sampler(g, nids, self.config.batch_size, self.fanout,
                          seed=self.config.seed + 3, shuffle=False,
                          include_dst=self.include_dst)
        if not hasattr(self, "_infer_step"):
            drop_rate = self.config.drop_rate
            n_layers = len(self.config.layer_sizes) - 1
            model_name = self.model_name

            def infer(params, features, block_arrays):
                return run_sampled_forward(
                    model_name, params, features, block_arrays, None,
                    training=False, drop_rate=drop_rate, n_layers=n_layers)
            self._infer_step = jax.jit(infer)
        n_classes = self.config.layer_sizes[-1]
        out = np.zeros((g.num_vertices, n_classes), np.float32)
        for block in sampler.sample():
            arrays, _ = self._block_to_device(block)
            arrays = self._stage_infer(arrays)
            logits = np.asarray(self._infer_step(self.params, self.features,
                                                 arrays))
            d = np.asarray(arrays[0])
            sel = d >= 0
            out[d[sel]] = logits[sel]
        return out

    def debug_info(self):
        """Phase breakdown (the reference's DEBUGINFO(), GCN.hpp:308-353)."""
        self.timer.print_report()

    def debuginfo(self) -> dict:
        """Structured breakdown (the CLI's DEBUGINFO:1 surface; host phase
        timers ARE meaningful here — sampling runs on host or as separate
        device dispatches, unlike the single fused full-graph step)."""
        return {
            "engine": "minibatch",
            "sampler": self.config.sampler_backend,
            "batch_size": self.config.batch_size,
            "fanout": list(self.config.fanout),
            "phases": self.timer.report(),
            "exec_time_s": getattr(self, "exec_time", None),
        }

    # ---- checkpoint/resume (same format as the other trainers; the
    # minibatch state has no batchnorm, bn slot stores an empty list) ----
    def _save(self, path, epoch):
        from neutronstarlite_tpu.utils import checkpoint as ckpt
        ckpt.save_checkpoint(path, ckpt.make_state(
            params=self.params, bn=[], opt_state=self.opt_state,
            run_key=self.run_key,
            epoch=getattr(self, "_epoch0", 0) + epoch))

    def resume(self, path: str) -> int:
        from neutronstarlite_tpu.utils import checkpoint as ckpt
        template = ckpt.make_state(params=self.params, bn=[],
                                   opt_state=self.opt_state,
                                   run_key=self.run_key, epoch=0)
        st = ckpt.restore_checkpoint(path, template)
        self.params = st["params"]
        self.opt_state = st["opt_state"]
        self.run_key = st["run_key"]
        self._epoch0 = int(st["epoch"])
        return self._epoch0

    def run(self, epochs: int | None = None, log_every: int = 0,
            profile_dir: str = ""):
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                return self.run(epochs, log_every)
        epochs = epochs if epochs is not None else self.config.epochs
        history = []
        t0 = time.time()
        for ep in range(epochs):
            train_loss, train_acc = self.run_epoch("train")
            val_loss, val_acc = self.run_epoch("val")
            test_loss, test_acc = self.run_epoch("test")
            rec = {"epoch": ep, "loss": train_loss, "train": train_acc,
                   "val": val_acc, "test": test_acc}
            history.append(rec)
            if log_every and (ep % log_every == 0 or ep == epochs - 1):
                print(f"epoch {ep:4d} loss {train_loss:.4f} "
                      f"train {train_acc:.4f} val {val_acc:.4f} "
                      f"test {test_acc:.4f}")
            # checkpoint cadence counts GLOBAL epochs (stable across RESUME)
            if self.config.checkpoint_path and self.config.checkpoint_every \
                    and (getattr(self, "_epoch0", 0) + ep + 1) \
                    % self.config.checkpoint_every == 0:
                self._save(self.config.checkpoint_path, ep + 1)
        self.exec_time = time.time() - t0
        if self.config.checkpoint_path:
            self._save(self.config.checkpoint_path, epochs)
        return history


class DistMinibatchTrainer(MinibatchTrainer):
    """Data-parallel sampled training over a mesh: P blocks per step, one
    per device, per-batch gradient psum.

    This is the multi-process form of the reference's sampled path — each
    rank trains on its own batches and Update() allreduces gradients every
    batch (GCN_CPU_SAMPLE.hpp:206-230 with all_reduce_to_gradient). The
    graph and features are fully replicated, exactly like FullyRepGraph.
    """

    def __init__(self, datum, config, num_partitions=None, **kw):
        import jax
        from neutronstarlite_tpu.parallel.mesh import make_mesh
        p = num_partitions or config.num_partitions or len(jax.devices())
        self.mesh = make_mesh(p)
        self.p = self.mesh.devices.size
        super().__init__(datum, config, **kw)
        self._train_step_dist = jax.jit(self._make_dist_step(training=True))
        self._eval_step_dist = jax.jit(self._make_dist_step(training=False))
        if self.device_mode:
            self._train_step_dev_dist = jax.jit(
                self._make_dist_device_step(training=True))
            self._eval_step_dev_dist = jax.jit(
                self._make_dist_device_step(training=False))
        if jax.process_count() > 1:
            # locally-committed arrays are not valid inputs to a jit over a
            # multi-process mesh: re-stage the replicated state as GLOBAL
            # arrays (the reference's per-rank replicated graph/params,
            # FullyRepGraph + Parameter broadcast)
            from jax.sharding import PartitionSpec as P
            self.params = self._stage(self.params, P())
            self.opt_state = self._stage(self.opt_state, P())
            self.features = self._stage(self.features, P())
            if self.device_mode:
                self.labels_dev = self._stage(self.labels_dev, P())
                ds = self.dev_sampler
                (ds.offsets, ds.nbr, ds.out_degree, ds.in_degree) = \
                    self._stage((ds.offsets, ds.nbr, ds.out_degree,
                                 ds.in_degree), P())

    def resume(self, path: str) -> int:
        ep = super().resume(path)
        if jax.process_count() > 1:
            # restore_checkpoint returns locally-committed arrays — not
            # valid inputs to the multi-process jit; re-stage as GLOBAL
            # replicated arrays like __init__ does (RESUME:1 under
            # jax.distributed)
            from jax.sharding import PartitionSpec as P
            self.params = self._stage(self.params, P())
            self.opt_state = self._stage(self.opt_state, P())
        return ep

    def _stage_infer(self, arrays):
        if jax.process_count() > 1:
            from jax.sharding import PartitionSpec as P
            return self._stage(jax.tree.map(np.asarray, arrays), P())
        return arrays

    def _stage(self, tree, spec):
        """Host/local arrays → global mesh arrays (each process contributes
        its addressable shards); plain device_put single-process."""
        import jax
        import numpy as np
        from jax.sharding import NamedSharding

        def put(a):
            a = np.asarray(a)
            sh = NamedSharding(self.mesh, spec)
            if jax.process_count() > 1:
                return jax.make_array_from_callback(a.shape, sh,
                                                    lambda idx: a[idx])
            return jax.device_put(a, sh)
        return jax.tree.map(put, tree)

    def _make_dist_step(self, training: bool):
        from jax.sharding import PartitionSpec as P
        from neutronstarlite_tpu.training.dist_trainer import _shard_map
        mesh = self.mesh
        p = self.p
        pspec, rspec = P("p"), P()

        def per_device(params, opt_state, features, block_arrays, labels,
                       key):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            block_arrays, labels = sq(block_arrays), sq(labels)
            key = jax.random.fold_in(key, jax.lax.axis_index("p"))
            dst0 = block_arrays[0]
            valid = dst0 >= 0

            drop_rate = self.config.drop_rate
            n_layers = len(self.config.layer_sizes) - 1

            def lf(prm):
                logits = run_sampled_forward(
                    self.model_name, prm, features, block_arrays, key,
                    training=training, drop_rate=drop_rate,
                    n_layers=n_layers)
                return layers.nll_loss_masked(
                    layers.log_softmax(logits), labels, valid), logits

            if training:
                (loss, logits), grads = jax.value_and_grad(
                    lf, has_aux=True)(params)
                grads = jax.lax.psum(grads, "p")  # reference Update allreduce
                params, opt_state = self.opt_update(grads, opt_state, params)
            else:
                loss, logits = lf(params)
            pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
            c = jax.lax.psum(jnp.sum(jnp.where(
                valid, (pred == labels).astype(jnp.int32), 0)), "p")
            n = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), "p")
            # average the loss over LIVE devices only (a padded final group
            # fills dead all-invalid blocks whose masked loss is 0)
            live = jax.lax.psum(
                (jnp.sum(valid.astype(jnp.int32)) > 0).astype(jnp.float32),
                "p")
            loss = jax.lax.psum(loss, "p") / jnp.maximum(live, 1.0)
            return params, opt_state, loss, c, n

        def jit_step(params, opt_state, features, blocks, labels, key):
            f = _shard_map(
                per_device, mesh,
                in_specs=(rspec, rspec, rspec, pspec, pspec, rspec),
                out_specs=(rspec, rspec, rspec, rspec, rspec))
            return f(params, opt_state, features, blocks, labels, key)
        return jit_step

    def _make_dist_device_step(self, training: bool):
        """Per-device sample→train fused step over the mesh: each device
        samples ITS seed block with the on-device sampler and the per-batch
        gradient allreduce follows (SAMPLER:device × NUM_PARTITIONS>1)."""
        from jax.sharding import PartitionSpec as P
        from neutronstarlite_tpu.training.dist_trainer import _shard_map
        mesh = self.mesh
        ds = self.dev_sampler
        drop_rate = self.config.drop_rate
        n_layers = len(self.config.layer_sizes) - 1
        pspec, rspec = P("p"), P()

        model_name = self.model_name

        def per_device(params, opt_state, features, labels_all, samp, seeds,
                       key):
            from neutronstarlite_tpu.sampling.device_sampler import (
                sample_block)
            seeds = seeds[0]
            key = jax.random.fold_in(key, jax.lax.axis_index("p"))
            ks, kd = jax.random.split(key)
            offsets, nbr, out_deg, in_deg = samp
            block = sample_block(
                ks, offsets, nbr, out_deg, in_deg, seeds,
                fanout=tuple(ds.fanout), num_vertices=ds.num_vertices,
                caps=tuple(ds.caps), scaps=tuple(ds.scaps),
                replace=ds.replace, include_dst=ds.include_dst,
                rescale=ds.rescale)
            dst0 = block[0]
            labels = jnp.where(dst0 >= 0,
                               jnp.take(labels_all, jnp.clip(dst0, 0)), 0)
            valid = dst0 >= 0

            def lf(prm):
                logits = run_sampled_forward(model_name, prm, features,
                                             block, kd,
                                             training=training,
                                             drop_rate=drop_rate,
                                             n_layers=n_layers)
                return layers.nll_loss_masked(
                    layers.log_softmax(logits), labels, valid), logits

            if training:
                (loss, logits), grads = jax.value_and_grad(
                    lf, has_aux=True)(params)
                grads = jax.lax.psum(grads, "p")
                params, opt_state = self.opt_update(grads, opt_state, params)
            else:
                loss, logits = lf(params)
            pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
            c = jax.lax.psum(jnp.sum(jnp.where(
                valid, (pred == labels).astype(jnp.int32), 0)), "p")
            n = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), "p")
            live = jax.lax.psum(
                (jnp.sum(valid.astype(jnp.int32)) > 0).astype(jnp.float32),
                "p")
            loss = jax.lax.psum(loss, "p") / jnp.maximum(live, 1.0)
            return params, opt_state, loss, c, n

        def jit_step(params, opt_state, features, labels_all, samp, seeds,
                     key):
            f = _shard_map(per_device, mesh,
                           in_specs=(rspec, rspec, rspec, rspec, rspec,
                                     pspec, rspec),
                           out_specs=(rspec, rspec, rspec, rspec, rspec))
            return f(params, opt_state, features, labels_all, samp, seeds,
                     key)
        return jit_step

    def _run_epoch_device_dist(self, split: str):
        training = split == "train"
        step = (self._train_step_dev_dist if training
                else self._eval_step_dev_dist)
        ds = self.dev_sampler
        samp = (ds.offsets, ds.nbr, ds.out_degree, ds.in_degree)
        nids = self.nids[split]
        self.run_key, ko = jax.random.split(self.run_key)  # fresh subkey
        order = np.random.default_rng(
            int(jax.random.randint(ko, (), 0, 2 ** 31 - 1))
        ).permutation(nids) if training else nids
        bs = self.config.batch_size
        gs = bs * self.p
        rows = []   # [loss, correct, count] per step; one transfer at end
        for i in range(0, max(order.size, 1), gs):
            chunk = order[i:i + gs].astype(np.int32)
            if chunk.size == 0:
                break
            if chunk.size < gs:
                chunk = np.concatenate(
                    [chunk, np.full(gs - chunk.size, -1, np.int32)])
            seeds = chunk.reshape(self.p, bs)
            self.run_key, k = jax.random.split(self.run_key)
            if jax.process_count() > 1:
                from jax.sharding import PartitionSpec as P
                seeds = self._stage(seeds, P("p"))
                k = self._stage(k, P())
            else:
                seeds = jnp.asarray(seeds)
            self.params, self.opt_state, loss, c, n = step(
                self.params, self.opt_state, self.features, self.labels_dev,
                samp, seeds, k)
            rows.append(jnp.stack([loss, c.astype(jnp.float32),
                                   n.astype(jnp.float32)]))
        if not rows:
            return 0.0, 0.0
        tot = np.asarray(jnp.stack(rows)).sum(axis=0)  # one transfer
        return (float(tot[0]) / len(rows),
                float(tot[1]) / max(float(tot[2]), 1))

    def run_epoch(self, split: str = "train"):
        if getattr(self, "device_mode", False):
            return self._run_epoch_device_dist(split)
        training = split == "train"
        step = self._train_step_dist if training else self._eval_step_dist
        rows = []   # [loss, correct, count] per group; one transfer at end
        group = []
        for item in self._prefetch(split):
            group.append(item)
            if len(group) < self.p:
                continue
            rows.append(self._run_group(step, group))
            group = []
        if group:
            # pad the final group by repeating the last block with all-invalid
            # labels (dst0 = -1 contributes nothing)
            arrays, labels = group[-1]
            dead = (jnp.full_like(arrays[0], -1),) + arrays[1:]
            while len(group) < self.p:
                group.append((dead, labels))
            rows.append(self._run_group(step, group))
        if not rows:
            return 0.0, 0.0
        tot = np.asarray(jnp.stack(rows)).sum(axis=0)  # one transfer
        return (float(tot[0]) / len(rows),
                float(tot[1]) / max(float(tot[2]), 1))

    def _run_group(self, step, group):
        """Returns a [loss, correct, count] device row (kept async; callers
        materialize all rows with one transfer per epoch)."""
        from jax.sharding import PartitionSpec as P
        self.run_key, k = jax.random.split(self.run_key)
        if jax.process_count() > 1:
            blocks = jax.tree.map(
                lambda *a: self._stage(np.stack([np.asarray(x) for x in a]),
                                       P("p")), *[g[0] for g in group])
            labels = self._stage(np.stack([np.asarray(g[1]) for g in group]),
                                 P("p"))
            k = self._stage(k, P())
        else:
            blocks = jax.tree.map(lambda *a: jnp.stack(a),
                                  *[g[0] for g in group])
            labels = jnp.stack([g[1] for g in group])
        self.params, self.opt_state, loss, c, n = step(
            self.params, self.opt_state, self.features, blocks, labels, k)
        return jnp.stack([loss, c.astype(jnp.float32),
                          n.astype(jnp.float32)])
