#!/bin/bash
# Multi-host launch (the reference's run_nts_dist.sh equivalent).
# Usage: ./run_nsl_dist.sh <num_processes> <config.cfg> [coordinator:port]
# Each host runs this with JAX_PROCESS_ID set (or use your cluster launcher);
# jax.distributed.initialize wires the pod slice together.
NPROC=${1:?num processes}
CFG=${2:?config}
COORD=${3:-localhost:12345}
for ((i=0; i<NPROC; i++)); do
  JAX_COORDINATOR=$COORD JAX_NUM_PROCESSES=$NPROC JAX_PROCESS_ID=$i \
    python -m neutronstarlite_tpu.main "$CFG" &
done
wait
