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

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import GNNDatum
from neutronstarlite_tpu.models import gcn
from neutronstarlite_tpu.nn import layers, optim
from neutronstarlite_tpu.ops.graph_ops import GraphTensors


def masked_accuracy(logits, labels, masks, which: int):
    """Accuracy over mask==which (Test(), ref: GCN_CPU.hpp:142-171).
    Returns (correct, count) so dist callers can psum before dividing."""
    sel = masks == which
    pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
    correct = jnp.sum(jnp.where(sel, (pred == labels).astype(jnp.int32), 0))
    return correct, jnp.sum(sel.astype(jnp.int32))


class FullGraphTrainer:
    """Single-chip full-graph training for any model module (gcn/gat/gin/commnet)."""

    def __init__(self, datum: GNNDatum, config: InputInfo, model=gcn,
                 backend: str = "auto", **model_kwargs: Any):
        self.datum = datum
        self.config = config
        self.model = model
        self.model_kwargs = model_kwargs
        self.gt = GraphTensors.from_graph(datum.graph, backend=backend,
                                          dtype=config.dtype)

        key = jax.random.PRNGKey(config.seed)
        self.init_key, self.run_key = jax.random.split(key)
        self.state = model.init(self.init_key, config.layer_sizes)
        self.opt_init, self.opt_update = optim.nts_adam(
            config.learn_rate, config.weight_decay,
            decay_rate=config.decay_rate, decay_epoch=config.decay_epoch)
        self.opt_state = self.opt_init(self.state.params)

        self.x = jnp.asarray(datum.features)
        self.labels = jnp.asarray(datum.labels)
        self.masks = jnp.asarray(datum.masks)
        self._step = jax.jit(partial(self._train_step, drop_rate=config.drop_rate))

    # one full epoch on device
    def _train_step(self, gt, params, bn, opt_state, key, x, labels, masks,
                    drop_rate):
        state_cls = type(self.state)

        def loss_and_aux(p):
            st = state_cls(params=p, bn=bn)
            logits, new_bn = self.model.forward(
                st, gt, x, key, training=True, drop_rate=drop_rate,
                **self.model_kwargs)
            loss = layers.nll_loss_masked(
                layers.log_softmax(logits), labels, masks == 0)
            return loss, (logits, new_bn)

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(params)
        new_params, new_opt = self.opt_update(grads, opt_state, params)
        accs = {}
        for name, which in (("train", 0), ("val", 1), ("test", 2)):
            c, n = masked_accuracy(logits, labels, masks, which)
            accs[name] = c / jnp.maximum(n, 1)
        return new_params, new_bn, new_opt, loss, accs

    def run(self, epochs: int | None = None, log_every: int = 0):
        """Train; returns history list of per-epoch dicts.

        With config.checkpoint_path set, saves every ``checkpoint_every``
        epochs (and at the end); an improvement over the reference, which
        has no training persistence (SURVEY.md §5)."""
        epochs = epochs if epochs is not None else self.config.epochs
        ckpt_path = self.config.checkpoint_path
        ckpt_every = self.config.checkpoint_every
        history = []
        params, bn, opt_state = self.state.params, self.state.bn, self.opt_state
        t0 = time.time()
        for ep in range(epochs):
            self.run_key, k = jax.random.split(self.run_key)
            params, bn, opt_state, loss, accs = self._step(
                self.gt, params, bn, opt_state, k, self.x, self.labels,
                self.masks)
            if log_every and (ep % log_every == 0 or ep == epochs - 1):
                print(f"epoch {ep:4d} loss {float(loss):.4f} "
                      f"train {float(accs['train']):.4f} "
                      f"val {float(accs['val']):.4f} "
                      f"test {float(accs['test']):.4f}")
            history.append({"epoch": ep, "loss": float(loss),
                            **{k2: float(v) for k2, v in accs.items()}})
            if ckpt_path and ckpt_every and (ep + 1) % ckpt_every == 0:
                self._save(ckpt_path, params, bn, opt_state, ep + 1)
        jax.block_until_ready(params)
        self.exec_time = time.time() - t0
        self.state = type(self.state)(params=params, bn=bn)
        self.opt_state = opt_state
        if ckpt_path:
            self._save(ckpt_path, params, bn, opt_state, epochs)
        return history

    # ---- checkpoint/resume ----
    def _save(self, path, params, bn, opt_state, epoch):
        from neutronstarlite_tpu.utils import checkpoint as ckpt
        ckpt.save_checkpoint(path, ckpt.make_state(
            params=params, bn=bn, opt_state=opt_state, run_key=self.run_key,
            epoch=epoch))

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
        return int(st["epoch"])

    def predict(self):
        """Eval-mode forward (no dropout, running BN stats)."""
        logits, _ = self.model.forward(self.state, self.gt, self.x, None,
                                       training=False, **self.model_kwargs)
        return logits
