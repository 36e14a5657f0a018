"""Distributed full-graph trainer over a device mesh (DepComm engine).

Re-creates the reference's distributed run loop (toolkits/GCN_CPU.hpp:232-273
across MPI ranks) as ONE shard_map-jitted train step over the mesh axis 'p':

* vertex-sharded activations/features/labels/masks (P1);
* replicated params, gradient psum (P2 — `all_reduce_to_gradient`,
  core/NtsScheduler.hpp:719-722);
* per-layer boundary all_to_all inside the model's aggregate (P3 DepComm);
* optional hot-vertex replication skipping the exchange (P4 DepCache);
* comm/compute overlap is XLA's latency-hiding scheduler (P6) — the chunked
  manual pipeline of graph.hpp:3490-3535 is unnecessary;
* batchnorm stats are LOCAL per device, exactly like the reference's
  per-rank torch BatchNorm1d (GCN_CPU.hpp:115) — so bn state is sharded.

Test/accuracy follows Test() (GCN_CPU.hpp:142-171): local correct/count then
cross-partition allreduce (psum).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.6 style
    _SHARD_MAP_NEW = True
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
    _SHARD_MAP_NEW = False

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import GNNDatum
from neutronstarlite_tpu.models import gcn
from neutronstarlite_tpu.nn import layers, optim
from neutronstarlite_tpu.parallel.depcomm import (build_dist_graph,
                                                  device_view, make_tensors)
from neutronstarlite_tpu.parallel.mesh import make_mesh, make_mesh2d
from neutronstarlite_tpu.training.trainer import (_pack_stats,
                                                   _unpack_history,
                                                   config_forward_kwargs,
                                                   init_model_state)


def _shard_map(f, mesh, in_specs, out_specs):
    if _SHARD_MAP_NEW:
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)
    return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)


class DistTrainer:
    """Mesh-parallel full-graph training; same model modules as single-chip."""

    def __init__(self, datum: GNNDatum, config: InputInfo, model=gcn,
                 mesh=None, num_partitions: int | None = None,
                 rep_threshold: int | None = None, tp: int | None = None,
                 **model_kwargs):
        self.datum = datum
        self.config = config
        self.model = model
        model_kwargs = dict(model_kwargs,
                            **config_forward_kwargs(model, config))
        self.model_kwargs = model_kwargs
        from neutronstarlite_tpu.ops import ell as ell_mod
        ell_mod.configure(gather_budget_mb=config.gather_budget_mb,
                          gated_chunk_mb=config.gated_chunk_mb)
        f = int(tp if tp is not None else getattr(config, "tp_dim", 1) or 1)
        p = (num_partitions or config.num_partitions
             or len(jax.devices()) // max(f, 1))
        if mesh is not None:
            self.mesh = mesh
            shape = dict(self.mesh.shape)
            f = int(shape.get("f", 1))
            self.p = int(shape.get("p", self.mesh.devices.size // f))
        elif f > 1:
            self.mesh = make_mesh2d(p, f)
            self.p = p
        else:
            self.mesh = make_mesh(p)
            self.p = self.mesh.devices.size
        self.f = f
        if self.f > 1:
            # 2-D vertex x feature parallelism (TP). No reference
            # counterpart (the reference is 1-D vertex-partitioned MPI);
            # this is the TPU-native second mesh dimension: activations/bn/
            # weight-output-columns feature-sharded, aggregate+exchange run
            # on the narrow shard, one 'f' all_gather per dense.
            import inspect
            if "tp_axis" not in inspect.signature(model.forward).parameters:
                raise ValueError(
                    f"model {getattr(model, '__name__', model)} does not "
                    "support tp_axis (2-D feature parallelism)")
            # the INPUT dim may be non-divisible (features then stay
            # replicated over 'f' and layer 0's dense skips its gather —
            # layers.dense width test); hidden/output dims must divide
            n_heads = int(getattr(config, "num_heads", 1) or 1)
            if n_heads > 1:
                # joint layout: head-major columns. TP_DIM must divide
                # NUM_HEADS so each feature shard owns whole heads — its
                # contiguous F'/f weight columns are exactly those heads'
                # slices and the [2F'/H, H] attn param column-shards over
                # the same heads; every head's softmax stays in-shard.
                if n_heads % self.f:
                    raise ValueError(
                        f"NUM_HEADS:{n_heads} under TP_DIM:{self.f} "
                        "requires TP_DIM to divide NUM_HEADS (each "
                        "feature shard owns whole heads)")
                self.model_kwargs = dict(model_kwargs, heads=n_heads)
                model_kwargs = self.model_kwargs
            bad = [s for s in config.layer_sizes[1:] if s % self.f]
            if bad:
                raise ValueError(
                    f"TP_DIM:{self.f} requires every hidden/output layer "
                    f"size to be divisible by it; offending sizes {bad} in "
                    f"{config.layer_sizes}")
            self.model_kwargs = dict(model_kwargs, tp_axis="f")
        rep = rep_threshold if rep_threshold is not None else config.repthreshold

        partition = None
        # vertex_perm: old→new id map of any relabeling (SHUFFLE_VERTICES /
        # PARTITION:fennel) so predict() can return logits in the USER's
        # original vertex order
        self.vertex_perm = None
        if getattr(config, "partition_mode", "range") == "fennel":
            # edge-locality streaming partition (beyond-reference; the
            # reference only has the contiguous range split) — relabels
            # vertices so each Fennel part is a contiguous range
            from neutronstarlite_tpu.graph.reorder import fennel_partition
            datum, partition, self.vertex_perm = fennel_partition(
                datum, self.p, seed=config.seed, return_perm=True)
            self.datum = datum
        elif config.shuffle_vertices:
            # balance per-pair mirror counts (see graph/reorder.py)
            from neutronstarlite_tpu.graph.reorder import random_shuffle
            datum, self.vertex_perm = random_shuffle(
                datum, seed=config.seed, return_perm=True)
            self.datum = datum
        # PROC_LOCAL (hybrid local processing, ref: core/graph.hpp:3464,3645
        # — process local edges while communication is in flight) maps to the
        # local/remote slab split: the local-edge aggregate has no data
        # dependency on the exchange, so XLA overlaps them. Same mechanism
        # as PROC_OVERLAP here, by design.
        # attention models keep the fused ELL path under the overlap split:
        # each slab set computes unnormalized softmax stats and the union
        # merges by online-softmax rescaling (ops/ell.py merge_softmax_parts)
        overlap = bool(config.overlap or config.process_local)
        self.dg = build_dist_graph(datum.graph, self.p, rep_threshold=rep,
                                   partition=partition,
                                   overlap=overlap,
                                   rep_mode=config.rep_mode,
                                   exchange=config.exchange)
        self.arrs = device_view(self.dg)

        # sharded data
        self.x = self.dg.shard_features(datum.features)
        self.labels = self.dg.shard_vertex_array(datum.labels.astype(np.int32))
        self.masks = self.dg.shard_vertex_array(
            datum.masks.astype(np.int32), fill=-1)
        self.row_valid = self.dg.row_valid

        key = jax.random.PRNGKey(config.seed)
        self.init_key, self.run_key = jax.random.split(key)
        self.state = init_model_state(model, self.init_key, config)
        self.opt_init, self.opt_update = optim.make_optimizer(config)
        self.opt_state = self.opt_init(self.state.params)
        # bn state is per-device (local stats) → stacked leading dim P
        self.bn = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (self.p,) + a.shape), self.state.bn)

        # DepCache staleness: with CACHE_REFRESH>1 and a non-empty hot set,
        # non-refresh epochs read per-layer hot tables from cache (zero
        # all_gather) — re-creating FeatureCache/CachedData + 
        # sync_compute_decoupled_from_cached (NtsScheduler.hpp:556-637,
        # graph.hpp:3723-3801). Stale tables are constants wrt params.
        self.cache_refresh = max(1, int(config.cache_refresh))
        self.use_stale_cache = self.cache_refresh > 1 and self.dg.h_pad > 0
        self.hot_cache = None
        # HOIST_L0: layer 0 aggregates the CONSTANT features, so A·X — and
        # with it the layer-0 boundary EXCHANGE (the widest one, F_in
        # lanes) — is computed once up front instead of every epoch. Only
        # exact for param-free layer-0 aggregates (GCN/GIN/COMMNET).
        if config.hoist_l0:
            from neutronstarlite_tpu.training.trainer import (
                check_hoist_support)
            check_hoist_support(model)
        self._l0_fn = None
        self._step = self._build_step(mode="plain")
        self._fused = None  # built lazily when config.fuse_epochs > 1
        if self.use_stale_cache:
            self._step_fresh = self._build_step(mode="fresh")
            self._step_cached = self._build_step(mode="cached")

    def _build_step(self, mode: str = "plain"):
        return jax.jit(self._shard_step(mode))

    # ---- 2-D (TP) sharding rules ----
    def _param_leaf_spec(self, leaf):
        """Column-parallel rule: rank-2 [F_in, F_out] -> P(None, 'f')
        (output-column shards), rank-1 [F] -> P('f'), scalars replicated.
        Leaves whose shardable dim is not divisible by f stay REPLICATED
        (e.g. GAT's attention vector [2F', 1]: each feature shard consumes
        its own row slice and the grads psum over 'f').
        Identity when the mesh has no 'f' axis."""
        if self.f <= 1:
            return P()
        nd = getattr(leaf, "ndim", 0)
        shape = getattr(leaf, "shape", ())
        if nd == 2 and shape[1] % self.f == 0:
            return P(None, "f")
        if nd == 1 and shape[0] % self.f == 0:
            return P("f")
        return P()

    def _bn_spec(self, leaf=None):
        # bn leaves are [P, F_l]: vertex-stacked, feature-sharded under TP
        # (replicated when F_l doesn't divide — the layer-0 bn of a
        # non-divisible input dim, whose activations are also replicated)
        if self.f <= 1:
            return P("p")
        if leaf is not None and leaf.shape[-1] % self.f != 0:
            return P("p")
        return P("p", "f")

    def _x_spec(self):
        # features are [P, V_p, F]: vertex-sharded, feature-sharded under TP
        # (feature-replicated when F_in doesn't divide; layer 0's dense
        # then skips its all_gather — see layers.dense)
        if self.f > 1 and self.x.shape[-1] % self.f == 0:
            return P("p", None, "f")
        return P("p")

    def _build_fused(self, n: int):
        """Scan ``n`` dist epochs per dispatch (FUSE_EPOCHS, same semantics
        as FullGraphTrainer._make_fused): one host round trip per window —
        N all_to_all layers stay on ICI back-to-back. Only the plain mode
        is fused; the stale-DepCache schedule needs per-epoch host control
        of the refresh cadence."""
        f = self._shard_step("plain")

        def fused(arrs, x, labels, masks, row_valid, params, bn, opt_state,
                  key, l0=()):
            keys = jax.random.split(key, n)

            def body(carry, k):
                params, bn, opt_state = carry
                params, bn, opt_state, loss, accs, _ = f(
                    arrs, x, labels, masks, row_valid, params, bn,
                    opt_state, k, (), l0)
                return (params, bn, opt_state), (loss, accs)

            (params, bn, opt_state), (losses, accs) = jax.lax.scan(
                body, (params, bn, opt_state), keys)
            return params, bn, opt_state, losses, accs
        return jax.jit(fused)

    def _shard_step(self, mode: str = "plain"):
        mesh = self.mesh
        model = self.model
        model_kwargs = self.model_kwargs
        dg = self.dg
        opt_update = self.opt_update
        drop_rate = self.config.drop_rate
        state_cls = type(self.state)
        pspec = P("p")
        rspec = P()
        # which param leaves stay replicated under TP — decided from the
        # GLOBAL shapes (inside shard_map the leaves are local shards, whose
        # shapes would misclassify)
        rep_leaf = jax.tree.map(lambda l: self._param_leaf_spec(l) == P(),
                                self.state.params)

        def step(arrs, x, labels, masks, row_valid, params, bn, opt_state,
                 key, cache, l0):
            # squeeze the per-device leading dim of sharded blocks
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            hoist = {} if isinstance(l0, tuple) else {"l0_ax": sq(l0)}
            arrs, x = sq(arrs), sq(x)
            labels, masks, row_valid = sq(labels), sq(masks), sq(row_valid)
            bn = sq(bn)
            gt = make_tensors(arrs, dg, agg_dtype=self.config.dtype)
            my = jax.lax.axis_index("p")
            key = jax.random.fold_in(key, my)
            if self.f > 1:
                # independent dropout masks per feature shard are still iid
                key = jax.random.fold_in(key, jax.lax.axis_index("f"))
            # models with batchnorm restrict stats to real local rows
            # (padding would pollute mean/var; the reference's per-rank BN
            # sees only real vertices)
            import inspect
            extra = {}
            if "row_mask" in inspect.signature(model.forward).parameters:
                extra["row_mask"] = row_valid

            def loss_fn(prm):
                st = state_cls(params=prm, bn=bn)
                if mode == "fresh":
                    gt.hot_cache_out = []
                elif mode == "cached":
                    gt.hot_cache_in = list(cache)
                logits, new_bn = model.forward(st, gt, x, key, training=True,
                                               drop_rate=drop_rate,
                                               **model_kwargs, **extra,
                                               **hoist)
                new_cache = (tuple(gt.hot_cache_out)
                             if mode == "fresh" else cache)
                gt.hot_cache_out = None
                gt.hot_cache_in = None
                if self.f > 1:
                    # logits are class-sharded over 'f'; gather to full C
                    # (the transpose routes dlogits back to the owning shard)
                    logits = jax.lax.all_gather(logits, "f", axis=1,
                                                tiled=True)
                train_sel = jnp.logical_and(masks == 0, row_valid)
                loss = layers.nll_loss_masked(
                    layers.log_softmax(logits), labels, train_sel)
                return loss, (logits, new_bn, new_cache)

            (loss, (logits, new_bn, new_cache)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # reference all_reduce_to_gradient: SUM of per-partition grads
            grads = jax.lax.psum(grads, "p")
            if self.f > 1:
                # replicated leaves (non-shardable, e.g. GAT attn): each
                # feature shard contributed only its slice's grad → sum
                grads = jax.tree.map(
                    lambda g, rep: jax.lax.psum(g, "f") if rep else g,
                    grads, rep_leaf)
            new_params, new_opt = opt_update(grads, opt_state, params)

            if self.config.eval_mode:
                # EVAL_MODE:1 — accuracies from an inference forward on the
                # updated state (see FullGraphTrainer._train_step); the
                # stale-cache plumbing is off here (a fresh all_gather)
                st2 = state_cls(params=new_params, bn=new_bn)
                logits, _ = model.forward(st2, gt, x, None, training=False,
                                          **model_kwargs, **extra, **hoist)
                if self.f > 1:
                    logits = jax.lax.all_gather(logits, "f", axis=1,
                                                tiled=True)

            pred = jnp.argmax(logits, axis=-1).astype(labels.dtype)
            accs = {}
            for name, which in (("train", 0), ("val", 1), ("test", 2)):
                sel = jnp.logical_and(masks == which, row_valid)
                c = jax.lax.psum(jnp.sum(jnp.where(
                    sel, (pred == labels).astype(jnp.int32), 0)), "p")
                n = jax.lax.psum(jnp.sum(sel.astype(jnp.int32)), "p")
                accs[name] = c / jnp.maximum(n, 1)
            loss_avg = jax.lax.psum(loss, "p") / dg.num_partitions

            # re-add the leading device dim on sharded outputs
            ex = lambda t: jax.tree.map(lambda a: a[None], t)  # noqa: E731
            return new_params, ex(new_bn), new_opt, loss_avg, accs, new_cache

        sharded_tree = lambda t: jax.tree.map(lambda _: pspec, t)  # noqa: E731
        rep_tree = lambda t: jax.tree.map(lambda _: rspec, t)  # noqa: E731
        tp_tree = lambda t: jax.tree.map(self._param_leaf_spec, t)  # noqa: E731
        bn_tree = lambda t: jax.tree.map(self._bn_spec, t)  # noqa: E731
        xspec = self._x_spec()

        def jit_step(arrs, x, labels, masks, row_valid, params, bn,
                     opt_state, key, cache, l0=()):
            # prefix specs: a bare P() covers the whole cache subtree
            # (unknown structure before trace in "fresh" mode); l0 shares
            # x's sharding rule (same [P, V_p, F_in] layout) or is ()
            f = _shard_map(
                step, mesh,
                in_specs=(sharded_tree(arrs), xspec, pspec, pspec, pspec,
                          tp_tree(params), bn_tree(bn),
                          tp_tree(opt_state), rspec, rspec,
                          jax.tree.map(lambda _: xspec, l0)),
                out_specs=(tp_tree(params), bn_tree(bn),
                           tp_tree(opt_state), rspec,
                           {"train": rspec, "val": rspec, "test": rspec},
                           rspec))
            return f(arrs, x, labels, masks, row_valid, params, bn, opt_state,
                     key, cache, l0)

        return jit_step

    def _stage(self, tree, spec):
        """Host arrays → global device arrays with an explicit mesh
        sharding. With one process this is a plain transfer; with several
        (jax.distributed — the reference's MPI world, dep/gemini/mpi.hpp)
        each process materializes only its addressable shards from the
        replicated host copy, so the same trainer runs N real processes.

        ``spec`` is either one PartitionSpec for every leaf or a callable
        leaf -> PartitionSpec (used by the TP rank rule)."""
        from jax.sharding import NamedSharding
        get = spec if callable(spec) else (lambda a: spec)

        def put(a):
            a = np.asarray(a)
            sh = NamedSharding(self.mesh, get(a))
            if jax.process_count() > 1:
                return jax.make_array_from_callback(
                    a.shape, sh, lambda idx: a[idx])
            return jax.device_put(a, sh)
        return jax.tree.map(put, tree)

    def _l0_precompute(self, arrs, x):
        """HOIST_L0: ONE sharded aggregate of the constant features —
        the layer-0 exchange + widest gather run here once instead of in
        every epoch. Output shares x's layout/sharding ([P, V_p, F_in])."""
        if self._l0_fn is None:
            mesh, dg = self.mesh, self.dg
            xspec = self._x_spec()
            agg_dtype = self.config.dtype

            def l0(arrs, x):
                sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
                gt = make_tensors(sq(arrs), dg, agg_dtype=agg_dtype)
                return gt.aggregate_neighbors(sq(x))[None]

            self._l0_fn = jax.jit(_shard_map(
                l0, mesh,
                in_specs=(jax.tree.map(lambda _: P("p"), self.arrs), xspec),
                out_specs=xspec))
        return self._l0_fn(arrs, x)

    def run(self, epochs: int | None = None, log_every: int = 0,
            profile_dir: str = ""):
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                return self.run(epochs, log_every)
        epochs = epochs if epochs is not None else self.config.epochs
        rows = []
        params = self._stage(self.state.params, self._param_leaf_spec)
        bn = self._stage(self.bn, self._bn_spec)
        opt_state = self._stage(self.opt_state, self._param_leaf_spec)
        arrs = self._stage(self.arrs, P("p"))
        x = self._stage(self.x, self._x_spec())
        labels = self._stage(self.labels, P("p"))
        masks = self._stage(self.masks, P("p"))
        row_valid = self._stage(self.row_valid, P("p"))
        l0 = self._l0_precompute(arrs, x) if self.config.hoist_l0 else ()
        fuse = max(1, int(getattr(self.config, "fuse_epochs", 1)))
        if fuse > 1 and not self.use_stale_cache:
            return self._run_fused(epochs, fuse, log_every, arrs, x, labels,
                                   masks, row_valid, params, bn, opt_state,
                                   l0)
        t0 = time.time()
        ep_global = 0
        for ep in range(epochs):
            self.run_key, k = jax.random.split(self.run_key)
            if jax.process_count() > 1:
                k = self._stage(k, P())
            if not self.use_stale_cache:
                params, bn, opt_state, loss, accs, _ = self._step(
                    arrs, x, labels, masks, row_valid, params, bn, opt_state,
                    k, (), l0)
            elif (self.hot_cache is None
                  or ep_global % self.cache_refresh == 0):
                params, bn, opt_state, loss, accs, self.hot_cache = \
                    self._step_fresh(arrs, x, labels, masks, row_valid,
                                     params, bn, opt_state, k, (), l0)
            else:
                params, bn, opt_state, loss, accs, self.hot_cache = \
                    self._step_cached(arrs, x, labels, masks, row_valid,
                                      params, bn, opt_state, k,
                                      self.hot_cache, l0)
            ep_global += 1
            rows.append(_pack_stats(loss, accs))
            if log_every and (ep % log_every == 0 or ep == epochs - 1):
                r = np.asarray(rows[-1])  # one transfer for all 4 scalars
                print(f"epoch {ep:4d} loss {r[0]:.4f} train {r[1]:.4f} "
                      f"val {r[2]:.4f} test {r[3]:.4f}")
            ckpt_path = self.config.checkpoint_path
            # checkpoint cadence counts GLOBAL epochs (stable across RESUME)
            if ckpt_path and self.config.checkpoint_every and \
                    (getattr(self, "_epoch0", 0) + ep + 1) \
                    % self.config.checkpoint_every == 0:
                self._save(ckpt_path, params, bn, opt_state, ep + 1)
        # ONE transfer materializes history + synchronizes (see trainer.py)
        history = _unpack_history(rows)
        self.exec_time = time.time() - t0
        self.state = type(self.state)(params=params, bn=self.state.bn)
        self.bn = bn
        self.opt_state = opt_state
        if self.config.checkpoint_path:
            self._save(self.config.checkpoint_path, params, bn, opt_state,
                       epochs)
        return history

    def _run_fused(self, epochs, fuse, log_every, arrs, x, labels, masks,
                   row_valid, params, bn, opt_state, l0=()):
        if self._fused is None or self._fused[0] != fuse:
            self._fused = (fuse, self._build_fused(fuse))
        fused = self._fused[1]
        rows = []
        t0 = time.time()
        done = 0
        while done + fuse <= epochs:
            self.run_key, k = jax.random.split(self.run_key)
            if jax.process_count() > 1:
                k = self._stage(k, P())
            params, bn, opt_state, losses, accs = fused(
                arrs, x, labels, masks, row_valid, params, bn, opt_state, k,
                l0)
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
            # periodic checkpoints still fire under epoch fusion
            g0 = getattr(self, "_epoch0", 0)  # checkpoint cadence counts GLOBAL epochs (stable across RESUME)
            if (self.config.checkpoint_path and self.config.checkpoint_every
                    and ((g0 + done) // self.config.checkpoint_every)
                    > ((g0 + done - fuse) // self.config.checkpoint_every)):
                self._save(self.config.checkpoint_path, params, bn,
                           opt_state, done)
        # remainder epochs run unfused (must not over-train past ``epochs``)
        for ep in range(done, epochs):
            self.run_key, k = jax.random.split(self.run_key)
            if jax.process_count() > 1:
                k = self._stage(k, P())
            params, bn, opt_state, loss, accs, _ = self._step(
                arrs, x, labels, masks, row_valid, params, bn, opt_state,
                k, (), l0)
            rows.append(_pack_stats(loss, accs))
        history = _unpack_history(rows)
        self.exec_time = time.time() - t0
        self.state = type(self.state)(params=params, bn=self.state.bn)
        self.bn = bn
        self.opt_state = opt_state
        if self.config.checkpoint_path:
            self._save(self.config.checkpoint_path, params, bn, opt_state,
                       epochs)
        return history

    def predict(self):
        """Eval-mode forward over the mesh (no dropout, running BN stats);
        returns logits gathered to host in GLOBAL vertex order.

        The reference computes Test() from training-mode outputs
        (GCN_CPU.hpp:142-171) — we match that in run(); this is the proper
        inference path FullGraphTrainer.predict() already had."""
        mesh = self.mesh
        model, model_kwargs, dg = self.model, self.model_kwargs, self.dg
        state_cls = type(self.state)
        pspec = P("p")

        def fwd(arrs, x, row_valid, params, bn, l0):
            sq = lambda t: jax.tree.map(lambda a: a[0], t)  # noqa: E731
            hoist = {} if isinstance(l0, tuple) else {"l0_ax": sq(l0)}
            arrs, x, row_valid, bn = sq(arrs), sq(x), sq(row_valid), sq(bn)
            gt = make_tensors(arrs, dg, agg_dtype=self.config.dtype)
            import inspect
            extra = {}
            if "row_mask" in inspect.signature(model.forward).parameters:
                extra["row_mask"] = row_valid
            st = state_cls(params=params, bn=bn)
            logits, _ = model.forward(st, gt, x, None, training=False,
                                      **model_kwargs, **extra, **hoist)
            if self.f > 1:
                logits = jax.lax.all_gather(logits, "f", axis=1, tiled=True)
            return logits[None]

        sharded = lambda t: jax.tree.map(lambda _: pspec, t)  # noqa: E731
        tp_tree = lambda t: jax.tree.map(self._param_leaf_spec, t)  # noqa: E731
        bn_tree = lambda t: jax.tree.map(self._bn_spec, t)  # noqa: E731
        arrs = self._stage(self.arrs, P("p"))
        x = self._stage(self.x, self._x_spec())
        row_valid = self._stage(self.row_valid, P("p"))
        params = self._stage(self.state.params, self._param_leaf_spec)
        bn = self.bn
        l0 = self._l0_precompute(arrs, x) if self.config.hoist_l0 else ()
        xspec = self._x_spec()
        f = jax.jit(_shard_map(
            fwd, mesh,
            in_specs=(sharded(arrs), xspec, pspec, tp_tree(params),
                      bn_tree(bn), jax.tree.map(lambda _: xspec, l0)),
            out_specs=pspec))
        y = f(arrs, x, row_valid, params, bn, l0)
        if jax.process_count() > 1:
            # 'p'-sharded output is not process-addressable: gather it
            from jax.experimental import multihost_utils
            y = multihost_utils.process_allgather(y, tiled=True)
        y = np.asarray(y)
        out = np.zeros((self.datum.num_vertices, y.shape[-1]), y.dtype)
        off = self.dg.partition.offsets
        for i in range(self.p):
            n = off[i + 1] - off[i]
            out[off[i]:off[i + 1]] = y[i, :n]
        if self.vertex_perm is not None:
            # undo the SHUFFLE_VERTICES / PARTITION:fennel relabeling:
            # row v of the result is the logits of the USER's vertex v
            out = out[self.vertex_perm]
        return out

    def debuginfo(self) -> dict:
        """Structured end-of-run breakdown — the reference's DEBUGINFO()
        (toolkits/GCN.hpp:308-353: per-phase comm/kernel/... wall-clock,
        allreduce-averaged across ranks). The SPMD step is opaque to host
        timers, so this reports what DEFINES those phases: exact per-layer
        exchange volumes per device (comm — the quantity that rides ICI,
        fixed at preprocessing exactly like the reference's
        DetermineMirror message sizes, PartitionedGraph.hpp:210-285), slab
        slot counts (kernel), DepCache state, and measured wall time."""
        dg = self.dg
        p = self.p
        if dg.ring_sizes is not None:
            rows = int(sum(dg.ring_sizes))
        else:
            # rows that actually cross a link: the all_to_all's own q->q
            # self-chunk stays on device, so only (p-1) pairs count
            rows = (p - 1) * dg.m_pad
        from neutronstarlite_tpu.parallel.depcomm import mirror_rows_total
        info = {
            "engine": "dist",
            "partitions": p,
            "tp_dim": self.f,
            "exchange": "ring" if dg.ring_sizes is not None else "uniform",
            "v_pad": dg.v_pad,
            "m_pad": dg.m_pad,
            "h_pad": dg.h_pad,
            "exchange_rows_per_device_per_layer": rows,
            "mirror_rows_exact_total": int(mirror_rows_total(dg)),
            "allgather_rows_per_device_per_layer": dg.h_pad,
            "ell_mode": dg.ell_mode,
            "cache_refresh": self.cache_refresh,
            "agg_dtype": self.config.dtype,
            # HOIST_L0: layer 0's exchange happens ONCE per run (in the
            # precompute), not per epoch — per-epoch exchange covers only
            # layers >= 1
            "hoist_l0": bool(self.config.hoist_l0),
            "exec_time_s": getattr(self, "exec_time", None),
        }
        if dg.ell_np:
            info["slots_per_device"] = {
                k: int(d["f_idx"][0].size + d["f_tail_idx"][0].size
                       + d["b_idx"][0].size + d["b_tail_idx"][0].size)
                for k, d in dg.ell_np.items()}
        return info

    # ---- checkpoint/resume (same format as FullGraphTrainer) ----
    def _save(self, path, params, bn, opt_state, epoch):
        from neutronstarlite_tpu.utils import checkpoint as ckpt
        if jax.process_count() > 1:
            # sharded leaves are not process-addressable: gather first.
            # bn is always 'p'-sharded; under TP (f>1) params/opt_state are
            # 'f'-column-sharded too (the r2 NotImplementedError — closed)
            from jax.experimental import multihost_utils
            bn = multihost_utils.process_allgather(bn, tiled=True)
            if self.f > 1:
                params = multihost_utils.process_allgather(params,
                                                           tiled=True)
                opt_state = multihost_utils.process_allgather(opt_state,
                                                              tiled=True)
            if jax.process_index() != 0:
                return
        ckpt.save_checkpoint(path, ckpt.make_state(
            params=params, bn=bn, opt_state=opt_state, run_key=self.run_key,
            epoch=getattr(self, "_epoch0", 0) + epoch))

    def resume(self, path: str) -> int:
        from neutronstarlite_tpu.utils import checkpoint as ckpt
        template = ckpt.make_state(params=self.state.params, bn=self.bn,
                                   opt_state=self.opt_state,
                                   run_key=self.run_key, epoch=0)
        st = ckpt.restore_checkpoint(path, template)
        self.state = type(self.state)(params=st["params"],
                                      bn=self.state.bn)
        self.bn = st["bn"]
        self.opt_state = st["opt_state"]
        self.run_key = st["run_key"]
        self._epoch0 = int(st["epoch"])
        return self._epoch0
