#!/bin/bash
# GGCN digits21k recipe search (VERDICT r3 weak-item 1 / item 2): the r3
# sweep measured 0.725 @ lr 0.01 and 0.674 @ lr 0.02 (500 ep, raw
# features) — below the 0.770 logistic-regression floor. GGCN has no
# batchnorm (reference parity, toolkits/GGCN_CPU.hpp), so the gate
# pre-activations see the raw 0-16 + sigma-4-noise feature scale; the
# sweep probes FEATURE_NORM (per-feature standardization at load), decay
# schedule, and budget.
# Usage: bash tools/sweep_ggcn_digits21k.sh   (TPU; ~30-60 min)
set -u
cd "$(dirname "$0")/.."
mk() {  # mk name epochs lr feature_norm decay_epoch decay_rate
  local f=/tmp/ggcn_$1.cfg
  sed -e 's/^ALGORITHM:.*/ALGORITHM:GGCNCPU/' \
      -e "s/^EPOCHS:.*/EPOCHS:$2/" \
      -e "s/^LEARN_RATE:.*/LEARN_RATE:$3/" \
      -e "s/^DECAY_EPOCH:.*/DECAY_EPOCH:$5/" \
      -e "s/^DECAY_RATE:.*/DECAY_RATE:$6/" \
      configs/gcn_digits21k.cfg > $f
  echo "FEATURE_NORM:$4" >> $f
  echo $f
}
run() {
  local name=$1; shift
  local cfg=$(mk "$name" "$@")
  echo "=== $name ($cfg)"
  timeout 2400 python -m neutronstarlite_tpu.main $cfg 2>&1 \
    | grep -E "^epoch +(0|99|199|299|399|499|599|799) |#run_time" \
    | tail -10
}
run fnorm_lr01      500 0.01 1 100 0.97
run fnorm_lr02      500 0.02 1 100 0.97
run fnorm_lr01_step 800 0.01 1 150 0.90
run raw_lr01_long  1000 0.01 0 100 0.97
