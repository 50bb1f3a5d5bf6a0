#!/usr/bin/env bash
# 4-seed ZINC GIN+SignNet sweep (reference: scripts/ZINC/gin/script_ZINC_gin_signinv.sh)
set -e
cd "$(dirname "$0")/.."
for seed in 41 95 12 35; do
  python -m signnet_basisnet_tpu.train_zinc --config configs/gin_zinc_signinv_gin.json \
    train.seed $seed name "gin_signinv_seed$seed"
done
