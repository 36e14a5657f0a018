"""CLI entry point: ``python -m neutronstarlite_tpu.main <cfg>``.

Re-creates toolkits/main.cpp:34-199 — parse the cfg, dispatch on the
ALGORITHM string, run, print exec_time. The reference's CPU/GPU/EAGER/DIST
algorithm variants collapse onto TPU trainers:

* full-graph single chip: GCNCPU / GCN / GCNEAGER(SINGLE) / GATCPU /
  GATCPUDIST / GATGPUDIST / GINCPU / GINGPU / COMMNETGPU
* sampled minibatch: GCNSAMPLESINGLE (+ GAT/SAGE/GIN/COMMNET/
  GGCNSAMPLESINGLE extensions — every model family trains sampled)
* distributed full-graph over a mesh (NUM_PARTITIONS>1): any of the above
  full-graph algorithms via the DepComm engine (parallel/).
"""

from __future__ import annotations

import sys
import time

from neutronstarlite_tpu.config import InputInfo
from neutronstarlite_tpu.graph.dataset import load_dataset
from neutronstarlite_tpu.models import ALGORITHMS, gcn
from neutronstarlite_tpu.models import gin as gin_mod
from neutronstarlite_tpu.models import commnet as commnet_mod
from neutronstarlite_tpu.training.trainer import FullGraphTrainer
from neutronstarlite_tpu.training.minibatch import MinibatchTrainer


def run_from_config(config: InputInfo, log_every: int = 1):
    datum = load_dataset(config)
    algo = config.algorithm.upper()
    t0 = time.time()
    if algo in ("TEST_GETDEP1", "TEST_GETDEP"):
        # numerical-validation toolkits (ref: toolkits/test_getdepneighbor_*)
        from neutronstarlite_tpu import toolkits
        if config.num_partitions > 1:
            toolkits.validate_dist(datum, config.num_partitions,
                                   rep_threshold=config.repthreshold)
        else:
            toolkits.validate_single(datum, backend=config.kernel_backend)
        print(f"#run_time={time.time() - t0:.3f}(s)")
        return None, []
    _sampled = {"GCNSAMPLESINGLE": "gcn", "GATSAMPLESINGLE": "gat",
                "SAGESAMPLESINGLE": "sage", "GINSAMPLESINGLE": "gin",
                "COMMNETSAMPLESINGLE": "commnet",
                "GGCNSAMPLESINGLE": "ggcn"}
    if algo in _sampled:
        # every non-GCN entry is our extension: the reference's only
        # sampled model is GCN (GCN_CPU_SAMPLE.hpp); the sampled op zoo
        # (attention / max-pool / gates / self-terms) covers the rest
        sampled_model = _sampled[algo]
        if config.num_partitions > 1:
            # data-parallel sampled training over the mesh (our extension of
            # the reference's single-node sampled mode; the per-batch grad
            # allreduce mirrors GCN_CPU_SAMPLE.hpp Update +
            # all_reduce_to_gradient)
            from neutronstarlite_tpu.training.minibatch import \
                DistMinibatchTrainer
            trainer = DistMinibatchTrainer(datum, config,
                                           model=sampled_model)
        else:
            trainer = MinibatchTrainer(datum, config, model=sampled_model)
    else:
        if algo not in ALGORITHMS:
            # a typo must not silently train the default model (the
            # reference's else-if chain silently does NOTHING for unknown
            # strings, main.cpp:53-188 — also bad; fail loudly instead)
            raise ValueError(
                f"not supported algorithm: {config.algorithm!r} — known: "
                + ", ".join(sorted(ALGORITHMS)))
        model = ALGORITHMS[algo]
        eager = "EAGER" in algo
        backend = config.kernel_backend
        if not config.optim_kernel_enable and backend == "auto":
            backend = "xla"
        # the EAGER op reorder generalizes beyond the reference's
        # GCNCPUEAGER: GIN's and CommNet's first linear layers also commute
        # with the (linear) aggregate, so GINCPUEAGER / COMMNETGPUEAGER are
        # accepted as extension algorithm strings
        kwargs = ({"eager": True}
                  if eager and model in (gcn, gin_mod, commnet_mod) else {})
        if config.process_local and config.num_partitions <= 1:
            print("PROC_LOCAL:1 has no effect with NUM_PARTITIONS:1 "
                  "(everything is local); ignoring")
        if config.num_partitions > 1 or config.tp_dim > 1:
            from neutronstarlite_tpu.training.dist_trainer import DistTrainer
            trainer = DistTrainer(datum, config, model=model, **kwargs)
        else:
            trainer = FullGraphTrainer(datum, config, model=model,
                                       backend=backend, **kwargs)
    # RESUME:1 — crash-recovery surface: restore CHECKPOINT_PATH and
    # continue from the saved epoch; a missing checkpoint is a fresh start
    # (the first launch of an auto-restarting job). The reference has no
    # training persistence at all (SURVEY.md §5).
    epochs = config.epochs
    if config.resume:
        if not config.checkpoint_path:
            raise ValueError("RESUME:1 requires CHECKPOINT_PATH")
        ck = config.checkpoint_path
        try:
            # checkpoint.py owns the on-disk format knowledge — only a
            # MISSING checkpoint is a fresh start (the first launch of an
            # auto-restarting job); any other restore failure must be loud,
            # not a silent retrain that overwrites the checkpoint
            start = trainer.resume(ck)
            epochs = max(0, config.epochs - start)
            print(f"#resumed epoch={start} remaining={epochs}")
        except FileNotFoundError:
            print(f"RESUME:1 with no checkpoint at {ck} — fresh start")
    # on-device tracing (the reference's hand-rolled phase timers +
    # DEBUGINFO, SURVEY.md §5, replaced by a real profiler)
    history = trainer.run(epochs=epochs, log_every=log_every,
                          profile_dir=config.profile_dir)
    exec_time = time.time() - t0
    if config.debuginfo and hasattr(trainer, "debuginfo"):
        # the reference's end-of-run DEBUGINFO() table (GCN.hpp:308-353)
        import json
        print("#DEBUGINFO " + json.dumps(trainer.debuginfo()))
    if config.predict_out:
        # PREDICT_OUT — serving surface: eval-mode logits for every vertex
        # in the USER's vertex order, written as .npy (with RESUME:1 +
        # EPOCHS:0 this is a pure-inference launch from a checkpoint)
        import numpy as _np
        logits = _np.asarray(trainer.predict())
        import jax as _jax
        if _jax.process_index() == 0:
            _np.save(config.predict_out, logits)
        print(f"#predict_out={config.predict_out} shape={logits.shape}")
    print(f"#run_time={exec_time:.3f}(s)")  # main.cpp:189-192 format
    return trainer, history


def _maybe_init_distributed():
    """Multi-host wiring (the reference's MPI_Instance, dep/gemini/mpi.hpp:44):
    when the launcher provides coordinator env vars, join the pod slice."""
    import os
    if os.environ.get("JAX_NUM_PROCESSES"):
        import jax
        jax.distributed.initialize(
            coordinator_address=os.environ.get("JAX_COORDINATOR",
                                               "localhost:12345"),
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m neutronstarlite_tpu.main <config.cfg>")
        return 1
    import os
    if os.environ.get("NSL_PLATFORM"):
        # explicit platform pin: some PJRT plugins (axon) ignore the
        # JAX_PLATFORMS env var, so the CLI offers a config-level override
        # (e.g. NSL_PLATFORM=cpu ./run_nsl_dist.sh 2 cfg for a CPU world)
        import jax
        jax.config.update("jax_platforms", os.environ["NSL_PLATFORM"])
    _maybe_init_distributed()
    config = InputInfo.from_cfg_file(argv[0])
    config.print()
    run_from_config(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
