"""Full-graph single-chip trainer: the reference's ``*_impl::run()`` loop.

Ref: toolkits/GCN_CPU.hpp:232-273 — per epoch: Forward (train mode) →
Test(0/1/2) on those outputs → Loss (masked NLL) → backward → Update
(allreduce + NtsAdam + next()). One fused jitted ``train_step`` does all of
it on device; only scalars (loss, accuracies) come back to host.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import GNNDatum
from neutronstarlite_tpu.models import gcn
from neutronstarlite_tpu.nn import layers, optim
from neutronstarlite_tpu.ops.graph_ops import GraphTensors


def init_model_state(model, key, config):
    """model.init with optional capability kwargs: NUM_HEADS flows to
    models whose init accepts ``heads`` (multi-head GAT), SAGE_POOL_DIM
    to models whose init accepts ``pool_dim`` (SAGE); others reject the
    flag loudly instead of silently training a different model."""
    import inspect
    kwargs = {}
    h = int(getattr(config, "num_heads", 1) or 1)
    if h > 1:
        if "heads" not in inspect.signature(model.init).parameters:
            raise ValueError(
                f"NUM_HEADS:{h} is not supported by model "
                f"{getattr(model, '__name__', model)} (only GAT has "
                "multi-head attention)")
        kwargs["heads"] = h
    pd = int(getattr(config, "sage_pool_dim", 0) or 0)
    if pd:
        if "pool_dim" not in inspect.signature(model.init).parameters:
            raise ValueError(
                f"SAGE_POOL_DIM:{pd} is not supported by model "
                f"{getattr(model, '__name__', model)} (only SAGE has a "
                "pooled representation)")
        kwargs["pool_dim"] = pd
    return model.init(key, config.layer_sizes, **kwargs)


def config_forward_kwargs(model, config) -> dict:
    """Forward-time capability kwargs derived from cfg keys: the TP
    branch of SAGE's forward needs the global pool width (inside
    shard_map the per-shard ``w_pool`` column count is already divided
    by the 'f' axis, so it cannot be inferred from shapes)."""
    import inspect
    pd = int(getattr(config, "sage_pool_dim", 0) or 0)
    if not pd:
        return {}
    if "pool_dim" not in inspect.signature(model.forward).parameters:
        raise ValueError(
            f"SAGE_POOL_DIM:{pd} is not supported by model "
            f"{getattr(model, '__name__', model)}")
    return {"pool_dim": pd}


def check_hoist_support(model) -> None:
    """HOIST_L0 applicability gate, shared by both full-graph trainers.
    A model opts in by accepting ``l0_ax`` — the contract that its layer-0
    aggregate is param-free (constant across epochs). Attention/gated/
    pooling models don't implement it, so the flag fails loudly there."""
    import inspect
    if "l0_ax" not in inspect.signature(model.forward).parameters:
        raise ValueError(
            f"HOIST_L0 is not applicable to model "
            f"{getattr(model, '__name__', model)}: its layer-0 aggregate "
            "depends on parameters (attention/gates/pooling) and cannot "
            "be precomputed")


def masked_accuracy(logits, labels, masks, which: int):
    """Accuracy over mask==which (Test(), ref: GCN_CPU.hpp:142-171).
    Returns (correct, count) so dist callers can psum before dividing."""
    sel = masks == which
    pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
    correct = jnp.sum(jnp.where(sel, (pred == labels).astype(jnp.int32), 0))
    return correct, jnp.sum(sel.astype(jnp.int32))


def _pack_stats(loss, accs):
    """Bundle an epoch's scalars into ONE [4] device array. Retrieving
    loss + 3 accuracies as separate ``float()`` calls costs 4 device→host
    round trips per epoch — on the axon tunnel that was ~0.1 s/epoch of
    pure RTT (measured: 0.303 → 0.205 s/epoch at Reddit scale). History is
    materialized with a single transfer after the epoch loop instead."""
    return jnp.stack([loss, accs["train"], accs["val"], accs["test"]])


def _unpack_history(rows, n=None):
    """rows: list of [4] or [k, 4] device arrays → list of history dicts."""
    if not rows:
        return []
    arr = np.asarray(jnp.concatenate(
        [r[None] if r.ndim == 1 else r for r in rows], axis=0))
    if n is not None:
        arr = arr[:n]
    return [{"epoch": i, "loss": float(r[0]), "train": float(r[1]),
             "val": float(r[2]), "test": float(r[3])}
            for i, r in enumerate(arr)]


class FullGraphTrainer:
    """Single-chip full-graph training for any model module (gcn/gat/gin/commnet)."""

    def __init__(self, datum: GNNDatum, config: InputInfo, model=gcn,
                 backend: str = "auto", **model_kwargs: Any):
        self.datum = datum
        self.config = config
        self.model = model
        self.model_kwargs = dict(model_kwargs,
                                 **config_forward_kwargs(model, config))
        from neutronstarlite_tpu.ops import ell as ell_mod
        ell_mod.configure(gather_budget_mb=config.gather_budget_mb,
                          gated_chunk_mb=config.gated_chunk_mb)
        self.gt = GraphTensors.from_graph(datum.graph, backend=backend,
                                          dtype=config.dtype)
        self._warn_if_over_hbm(datum)

        key = jax.random.PRNGKey(config.seed)
        self.init_key, self.run_key = jax.random.split(key)
        self.state = init_model_state(model, self.init_key, config)
        self.opt_init, self.opt_update = optim.make_optimizer(config)
        self.opt_state = self.opt_init(self.state.params)

        self.x = jnp.asarray(datum.features)
        self.labels = jnp.asarray(datum.labels)
        self.masks = jnp.asarray(datum.masks)
        self.l0_ax = None
        if config.hoist_l0:
            # HOIST_L0: layer 0 aggregates the CONSTANT feature table, so
            # A·X is epoch-invariant ((A·X)W == A·(XW) by linearity) —
            # compute it ONCE here and the widest gather leaves the epoch.
            check_hoist_support(model)
            # gt/x passed as ARGUMENTS (closures become HLO constants)
            self.l0_ax = jax.jit(
                lambda gt, x: gt.aggregate_neighbors(x))(self.gt, self.x)
        self._step = jax.jit(partial(self._train_step, drop_rate=config.drop_rate))
        self._fused = None   # built lazily when config.fuse_epochs > 1

    def _warn_if_over_hbm(self, datum):
        """Loud, actionable guidance at the single-chip scale limit
        (measured: E=186.6M trains on one 16 GB v5e; E=373M dies in the
        runtime with a bare RESOURCE_EXHAUSTED — BASELINE.md "r4
        single-chip scale ceiling"; HBM cost model in docs/DESIGN.md).
        The reference answers the same wall with CPU staging
        (core/graph.hpp:275-280); here the answer is the dist engine."""
        import os
        import sys
        eg = getattr(self.gt, "ell", None)
        if eg is None:
            return
        slots = int(eg.f_idx.size + eg.f_tail_idx.size
                    + eg.b_idx.size + eg.b_tail_idx.size)
        wbytes = 2 if self.config.dtype == "bfloat16" else 4
        fdim = datum.features.shape[1] if datum.features.ndim > 1 else 1
        est = (slots * (4 + wbytes)                 # slab idx + weights
               + datum.num_vertices * fdim * 4     # feature table
               + 2 * 128 * 2**20)                  # gather temps (2 blocks)
        limit = float(os.environ.get("NSL_HBM_GB", "16")) * 2**30
        if est > 0.75 * limit:
            print(f"[nsl] WARNING: graph tensors estimate "
                  f"{est / 2**30:.1f} GB of device HBM "
                  f"({slots / 1e6:.0f}M slots) against a "
                  f"{limit / 2**30:.0f} GB chip — single-chip training "
                  f"dies with RESOURCE_EXHAUSTED past ~2x the headline "
                  f"Reddit density (measured wall between E=187M and "
                  f"E=373M at F=602). Shard over chips with "
                  f"NUM_PARTITIONS:N (the dist engine), or reduce DTYPE/"
                  f"feature width. NSL_HBM_GB overrides the assumed chip "
                  f"size.", file=sys.stderr, flush=True)

    # one full epoch on device
    def _train_step(self, gt, params, bn, opt_state, key, x, labels, masks,
                    drop_rate, l0_ax=None):
        state_cls = type(self.state)
        hoist = {"l0_ax": l0_ax} if l0_ax is not None else {}

        def loss_and_aux(p):
            st = state_cls(params=p, bn=bn)
            logits, new_bn = self.model.forward(
                st, gt, x, key, training=True, drop_rate=drop_rate,
                **self.model_kwargs, **hoist)
            loss = layers.nll_loss_masked(
                layers.log_softmax(logits), labels, masks == 0)
            return loss, (logits, new_bn)

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(params)
        new_params, new_opt = self.opt_update(grads, opt_state, params)
        if self.config.eval_mode:
            # EVAL_MODE:1 — accuracies from a proper inference forward on
            # the UPDATED state (no dropout, running BN stats) instead of
            # the reference's Test()-on-training-outputs quirk
            # (GCN_CPU.hpp:142-171); the train-mode loss stays as reported
            st2 = state_cls(params=new_params, bn=new_bn)
            logits, _ = self.model.forward(st2, gt, x, None, training=False,
                                           **self.model_kwargs, **hoist)
        accs = {}
        for name, which in (("train", 0), ("val", 1), ("test", 2)):
            c, n = masked_accuracy(logits, labels, masks, which)
            accs[name] = c / jnp.maximum(n, 1)
        return new_params, new_bn, new_opt, loss, accs

    def _make_fused(self, n: int):
        """Scan ``n`` epochs per device dispatch (FUSE_EPOCHS): amortizes
        the per-call host↔device round trip — the dominant cost on small
        graphs (e.g. Cora epochs are sub-ms of compute)."""
        step = partial(self._train_step, drop_rate=self.config.drop_rate)

        def fused(gt, params, bn, opt_state, key, x, labels, masks,
                  l0_ax=None):
            keys = jax.random.split(key, n)

            def body(carry, k):
                params, bn, opt_state = carry
                params, bn, opt_state, loss, accs = step(
                    gt, params, bn, opt_state, k, x, labels, masks,
                    l0_ax=l0_ax)
                return (params, bn, opt_state), (loss, accs)

            (params, bn, opt_state), (losses, accs) = jax.lax.scan(
                body, (params, bn, opt_state), keys)
            return params, bn, opt_state, losses, accs
        return jax.jit(fused)

    def run(self, epochs: int | None = None, log_every: int = 0,
            profile_dir: str = ""):
        """Train; returns history list of per-epoch dicts.

        With config.checkpoint_path set, saves every ``checkpoint_every``
        epochs (and at the end); an improvement over the reference, which
        has no training persistence (SURVEY.md §5).

        ``profile_dir`` wraps the run in a ``jax.profiler.trace`` — the
        on-device view of the reference's DEBUGINFO phase breakdown
        (toolkits/GCN.hpp:308-353). The CLI maps cfg PROFILE_DIR here."""
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                return self.run(epochs, log_every)
        epochs = epochs if epochs is not None else self.config.epochs
        fuse = max(1, int(getattr(self.config, "fuse_epochs", 1)))
        if fuse > 1:
            return self._run_fused(epochs, fuse, log_every)
        ckpt_path = self.config.checkpoint_path
        ckpt_every = self.config.checkpoint_every
        rows = []
        params, bn, opt_state = self.state.params, self.state.bn, self.opt_state
        t0 = time.time()
        for ep in range(epochs):
            self.run_key, k = jax.random.split(self.run_key)
            params, bn, opt_state, loss, accs = self._step(
                self.gt, params, bn, opt_state, k, self.x, self.labels,
                self.masks, l0_ax=self.l0_ax)
            rows.append(_pack_stats(loss, accs))
            if log_every and (ep % log_every == 0 or ep == epochs - 1):
                r = np.asarray(rows[-1])  # one transfer for all 4 scalars
                print(f"epoch {ep:4d} loss {r[0]:.4f} train {r[1]:.4f} "
                      f"val {r[2]:.4f} test {r[3]:.4f}")
            # checkpoint cadence counts GLOBAL epochs (stable across RESUME)
            if (ckpt_path and ckpt_every
                    and (getattr(self, "_epoch0", 0) + ep + 1)
                    % ckpt_every == 0):
                self._save(ckpt_path, params, bn, opt_state, ep + 1)
        # ONE transfer materializes the whole history (and, by data
        # dependency on every epoch's outputs, synchronizes the run —
        # jax.block_until_ready does not reliably block on axon)
        history = _unpack_history(rows)
        self.exec_time = time.time() - t0
        self.state = type(self.state)(params=params, bn=bn)
        self.opt_state = opt_state
        if ckpt_path:
            self._save(ckpt_path, params, bn, opt_state, epochs)
        return history

    def _run_fused(self, epochs: int, fuse: int, log_every: int):
        if self._fused is None or self._fused[0] != fuse:
            self._fused = (fuse, self._make_fused(fuse))
        fused = self._fused[1]
        rows = []
        params, bn, opt_state = (self.state.params, self.state.bn,
                                 self.opt_state)
        t0 = time.time()
        done = 0
        while done + fuse <= epochs:
            self.run_key, k = jax.random.split(self.run_key)
            params, bn, opt_state, losses, accs = fused(
                self.gt, params, bn, opt_state, k, self.x, self.labels,
                self.masks, l0_ax=self.l0_ax)
            window = jnp.stack([losses, accs["train"], accs["val"],
                                accs["test"]], axis=1)  # [fuse, 4]
            rows.append(window)
            if log_every:
                w = np.asarray(window)  # one transfer per logged window
                for j in range(fuse):
                    if (done + j) % log_every == 0:
                        print(f"epoch {done + j:4d} loss {w[j, 0]:.4f} "
                              f"train {w[j, 1]:.4f} val {w[j, 2]:.4f} "
                              f"test {w[j, 3]:.4f}")
            done += fuse
            # periodic checkpoints still fire under epoch fusion (at the
            # window granularity): a crash must not lose the whole run
            g0 = getattr(self, "_epoch0", 0)  # checkpoint cadence counts GLOBAL epochs (stable across RESUME)
            if (self.config.checkpoint_path and self.config.checkpoint_every
                    and ((g0 + done) // self.config.checkpoint_every)
                    > ((g0 + done - fuse) // self.config.checkpoint_every)):
                self._save(self.config.checkpoint_path, params, bn,
                           opt_state, done)
        # remainder epochs run unfused (must not over-train past ``epochs``)
        for ep in range(done, epochs):
            self.run_key, k = jax.random.split(self.run_key)
            params, bn, opt_state, loss, accs = self._step(
                self.gt, params, bn, opt_state, k, self.x, self.labels,
                self.masks, l0_ax=self.l0_ax)
            rows.append(_pack_stats(loss, accs))
            if (self.config.checkpoint_path and self.config.checkpoint_every
                    and (getattr(self, "_epoch0", 0) + ep + 1)
                    % self.config.checkpoint_every == 0):
                self._save(self.config.checkpoint_path, params, bn,
                           opt_state, ep + 1)
        history = _unpack_history(rows)
        self.exec_time = time.time() - t0
        self.state = type(self.state)(params=params, bn=bn)
        self.opt_state = opt_state
        if self.config.checkpoint_path:
            self._save(self.config.checkpoint_path, params, bn, opt_state,
                       epochs)
        return history

    # ---- checkpoint/resume ----
    def _save(self, path, params, bn, opt_state, epoch):
        from neutronstarlite_tpu.utils import checkpoint as ckpt
        # epochs are GLOBAL across resumes: run(epochs=k) after resume()
        # continues the saved counter, so a second crash/resume cycle
        # neither regresses nor overtrains
        ckpt.save_checkpoint(path, ckpt.make_state(
            params=params, bn=bn, opt_state=opt_state, run_key=self.run_key,
            epoch=getattr(self, "_epoch0", 0) + epoch))

    def resume(self, path: str) -> int:
        """Restore trainer state; returns the epoch to continue from."""
        from neutronstarlite_tpu.utils import checkpoint as ckpt
        template = ckpt.make_state(params=self.state.params,
                                   bn=self.state.bn,
                                   opt_state=self.opt_state,
                                   run_key=self.run_key, epoch=0)
        st = ckpt.restore_checkpoint(path, template)
        self.state = type(self.state)(params=st["params"], bn=st["bn"])
        self.opt_state = st["opt_state"]
        self.run_key = st["run_key"]
        self._epoch0 = int(st["epoch"])
        return self._epoch0

    def predict(self):
        """Eval-mode forward (no dropout, running BN stats)."""
        hoist = {"l0_ax": self.l0_ax} if self.l0_ax is not None else {}
        logits, _ = self.model.forward(self.state, self.gt, self.x, None,
                                       training=False, **self.model_kwargs,
                                       **hoist)
        return logits

    def debuginfo(self) -> dict:
        """Structured end-of-run breakdown — the reference's DEBUGINFO()
        (toolkits/GCN.hpp:308-353 prints per-phase comm/kernel/movein/
        moveout/wait wall-clock). One jitted step is opaque to host timers,
        so the TPU-native equivalent reports the quantities that DEFINE
        those phases: slab slot counts (the kernel cost driver — gathers
        are per-slot-bound, BASELINE.md), engine mode, and measured wall
        times. PROFILE_DIR gives the true on-device view."""
        gt = self.gt
        info = {
            "engine": "single-chip",
            "backend": gt.backend,
            "num_vertices": gt.num_vertices,
            "num_edges": gt.num_edges,
            "agg_dtype": self.config.dtype,
            "hoist_l0": bool(self.config.hoist_l0),
            "exec_time_s": getattr(self, "exec_time", None),
        }
        if gt.ell is not None:
            e = gt.ell
            info["ell"] = {
                "K_fwd": int(e.f_idx.shape[1]),
                "K_bwd": int(e.b_idx.shape[1]),
                "fwd_slots": int(e.f_idx.size + e.f_tail_idx.size),
                "bwd_slots": int(e.b_idx.size + e.b_tail_idx.size),
                "fwd_tail_rows": int(e.f_tail_idx.shape[0]),
                "bwd_tail_rows": int(e.b_tail_idx.shape[0]),
            }
        return info
