#!/usr/bin/env bash
# 4-seed ZINC sweep over one or more configs (reference:
# GraphPrediction/scripts/ZINC/**/*.sh — one script per config there; one
# parameterized script here).
#   usage: scripts/zinc_sweep.sh [config_name ...]   (default: all configs)
set -e
cd "$(dirname "$0")/.."
configs=("$@")
if [ ${#configs[@]} -eq 0 ]; then
  configs=($(ls configs/*_zinc_*.json | xargs -n1 basename | sed 's/\.json//'))
fi
for cfg in "${configs[@]}"; do
  for seed in 41 95 12 35; do
    python -m signnet_basisnet_tpu.train_zinc --config "configs/${cfg}.json" \
      train.seed "$seed" name "${cfg}_seed${seed}"
  done
done
