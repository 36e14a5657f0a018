#!/bin/bash
# Launch a training run (the reference's run_nts.sh equivalent).
# Usage: ./run_nsl.sh <config.cfg>
# Multi-chip parallelism comes from the NUM_PARTITIONS cfg key over the
# visible jax devices (no mpiexec needed: jax.distributed/pjit handles
# multi-host when launched once per host).
python -m neutronstarlite_tpu.main "$1"
