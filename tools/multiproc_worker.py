"""Worker for the REAL multi-process distributed test.

The reference validates its distributed engine by launching N MPI ranks on
localhost (`run_nts.sh N cfg`, /root/reference/README.md:89-93 — "MPI itself
is the simulator"). This script is our equivalent rank body: it joins a
`jax.distributed` world (the MPI_Instance analogue, dep/gemini/mpi.hpp:44-77),
sees ONE local CPU device, and runs the ordinary DistTrainer over the global
mesh — exercising coordinator wiring, per-process device visibility, and
cross-process all_to_all/psum for real.

Modes:
  python tools/multiproc_worker.py dist  <num_procs> <proc_id> <port>
  python tools/multiproc_worker.py local <num_devices>

Both print ``RESULT {json}`` (final-epoch record) from process 0; the test
asserts the two modes agree.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode = sys.argv[1]
    if mode == "dist":
        num, pid, port = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=1")
    else:
        num, pid = int(sys.argv[2]), 0
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={num}")

    import jax
    # the axon plugin ignores env platform overrides; pin after import
    jax.config.update("jax_platforms", "cpu")
    if mode == "dist":
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=num, process_id=pid)
        assert jax.process_count() == num, jax.process_count()
        assert len(jax.local_devices()) == 1
    assert jax.device_count() == num, jax.device_count()

    from neutronstarlite_tpu.config import InputInfo
    from neutronstarlite_tpu.graph.dataset import synthetic_sbm_dataset
    from neutronstarlite_tpu.models import gcn
    from neutronstarlite_tpu.training.dist_trainer import DistTrainer

    sbm = synthetic_sbm_dataset(num_vertices=257, feat_dim=16, num_classes=3,
                                avg_degree=7, homophily=0.9, seed=4,
                                feature_noise=0.3)
    cfg = InputInfo(vertices=257, epochs=8, layer_string="16-8-3",
                    learn_rate=0.01, weight_decay=1e-4, drop_rate=0.0,
                    seed=7)
    # NSL_MP_EXCHANGE=ring: cross-process ppermute schedule instead of the
    # all_to_all (EXCHANGE:ring over a real jax.distributed world)
    cfg.exchange = os.environ.get("NSL_MP_EXCHANGE", "uniform")
    tr = DistTrainer(sbm, cfg, model=gcn, num_partitions=num)
    hist = tr.run()
    if pid == 0:
        print("RESULT " + json.dumps(hist))
    if mode == "dist":
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
