"""Worker for the REAL multi-process distributed tests.

The reference validates its distributed engine by launching N MPI ranks on
localhost (`run_nts.sh N cfg`, /root/reference/README.md:89-93 — "MPI itself
is the simulator"). This script is our equivalent rank body: it joins a
`jax.distributed` world (the MPI_Instance analogue, dep/gemini/mpi.hpp:44-77),
sees ``ndev`` local CPU devices, and runs the ordinary trainers over the
global mesh — exercising coordinator wiring, per-process device visibility,
and cross-process all_to_all/ppermute/all_gather/psum for real.

Modes:
  python tools/multiproc_worker.py dist  <scenario> <num_procs> <ndev_per_proc> <proc_id> <port>
  python tools/multiproc_worker.py local <scenario> <num_devices>

Scenarios (world = num_procs*ndev_per_proc devices either way, so the dist
and local runs execute the IDENTICAL SPMD program on different process
topologies):

  gcn        GCN, uniform all_to_all exchange (NSL_MP_EXCHANGE=ring for the
             P-1 chained-ppermute schedule)
  combo      GAT + PROC_OVERLAP split slabs (per-set softmax stats merged) +
             EXCHANGE:ring + DepCache (rep_threshold, CACHE_REFRESH:2 stale
             hot-block reads) — the flag matrix across a process boundary
  sage_ov    SAGE + PROC_OVERLAP: the cross-slab-set extremal winner merge
             (ell.aggregate_max_pair) with its exchange crossing processes
  tp         GCN over a 2-D p×f mesh (TP_DIM:2): the column-parallel dense
             all_gathers over 'f' ride the cross-process transport
  minibatch  DistMinibatchTrainer (host sampler): per-batch gradient psum
             across processes, replicated graph/features
  hoist      GCN + HOIST_L0: the one-time layer-0 aggregate precompute
             (its boundary exchange included) runs over the cross-process
             mesh; epochs then carry no layer-0 exchange

Both modes print ``RESULT {json}`` (epoch history) from process 0; the tests
assert dist == local. NSL_MP_EPOCHS overrides the epoch count.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scenario(name: str, world: int):
    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
    from neutronstarlite_tpu.training.dist_trainer import DistTrainer

    sbm = synthetic_sbm_dataset(num_vertices=257, feat_dim=16, num_classes=3,
                                avg_degree=7, homophily=0.9, seed=4,
                                feature_noise=0.3)
    epochs = int(os.environ.get("NSL_MP_EPOCHS", "8"))
    cfg = InputInfo(vertices=257, epochs=epochs, layer_string="16-8-3",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                    seed=7)
    # NSL_MP_EXCHANGE=ring: cross-process ppermute schedule instead of the
    # all_to_all (EXCHANGE:ring over a real jax.distributed world)
    cfg.exchange = os.environ.get("NSL_MP_EXCHANGE", "uniform")

    if name == "gcn":
        from neutronstarlite_tpu.models import gcn
        return DistTrainer(sbm, cfg, model=gcn, num_partitions=world).run()
    if name == "gat_heads":
        # NUM_HEADS multi-head GAT: the shared per-layer dep exchange
        # carries every head's slice across the process boundary
        from neutronstarlite_tpu.models import gat
        cfg.num_heads = 2
        cfg.layer_string = "16-8-3"
        return DistTrainer(sbm, cfg, model=gat, num_partitions=world).run()
    if name == "hoist":
        from neutronstarlite_tpu.models import gcn
        cfg.hoist_l0 = True
        return DistTrainer(sbm, cfg, model=gcn, num_partitions=world).run()
    if name == "combo":
        from neutronstarlite_tpu.models import gat
        cfg.overlap = True
        cfg.exchange = "ring"
        cfg.cache_refresh = 2
        return DistTrainer(sbm, cfg, model=gat, num_partitions=world,
                           rep_threshold=10).run()
    if name == "sage_ov":
        from neutronstarlite_tpu.models import sage
        cfg.overlap = True
        return DistTrainer(sbm, cfg, model=sage, num_partitions=world).run()
    if name == "tp":
        from neutronstarlite_tpu.models import gcn
        assert world % 2 == 0, world
        cfg.layer_string = "16-8-4"   # hidden/output must divide TP_DIM
        return DistTrainer(sbm, cfg, model=gcn, num_partitions=world // 2,
                           tp=2).run()
    if name in ("minibatch", "minibatch_dev"):
        from neutronstarlite_tpu.training.minibatch import (
            DistMinibatchTrainer)
        cfg.fanout_string = "4-4"
        cfg.batch_size = 32
        cfg.epochs = min(epochs, 3)
        if name == "minibatch_dev":
            # on-device Floyd sampler fused into the sharded step
            # (SAMPLER:device × NUM_PARTITIONS × real processes)
            cfg.sampler_backend = "device"
        return DistMinibatchTrainer(sbm, cfg, num_partitions=world).run()
    if name == "minibatch_resume":
        # checkpoint -> resume -> predict across real processes: resume()
        # must RE-STAGE the restored leaves as global arrays, and predict()
        # must stage its per-batch blocks (NSL_MP_CKPT = save location)
        from neutronstarlite_tpu.training.minibatch import (
            DistMinibatchTrainer)
        cfg.fanout_string = "4-4"
        cfg.batch_size = 32
        cfg.epochs = 2
        cfg.checkpoint_path = os.environ["NSL_MP_CKPT"]
        DistMinibatchTrainer(sbm, cfg, num_partitions=world,
                             shuffle=False).run()
        tr = DistMinibatchTrainer(sbm, cfg, num_partitions=world,
                                  shuffle=False)
        assert tr.resume(cfg.checkpoint_path) == 2
        hist = tr.run(epochs=1)
        logits = tr.predict(nids=list(range(64)))
        assert logits.shape[0] == 257 and float(abs(logits).sum()) > 0
        return hist
    raise ValueError(f"unknown scenario {name!r}")


def main():
    mode = sys.argv[1]
    if mode == "dist":
        scen, num, ndev, pid, port = (sys.argv[2], int(sys.argv[3]),
                                      int(sys.argv[4]), int(sys.argv[5]),
                                      sys.argv[6])
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}")
    else:
        scen, num, ndev, pid = sys.argv[2], 1, int(sys.argv[3]), 0
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}")

    import jax
    # the axon plugin ignores env platform overrides; pin after import
    jax.config.update("jax_platforms", "cpu")
    if mode == "dist":
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=num, process_id=pid)
        assert jax.process_count() == num, jax.process_count()
        assert len(jax.local_devices()) == ndev
    world = num * ndev
    assert jax.device_count() == world, jax.device_count()

    hist = run_scenario(scen, world)
    if pid == 0:
        print("RESULT " + json.dumps(hist))
    if mode == "dist":
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
