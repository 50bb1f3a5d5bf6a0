#!/usr/bin/env bash
# sign_flip / abs_val ablations (reference: LearningFilters/scripts/eig_baselines.sh)
set -e
cd "$(dirname "$0")/.."
for m in none abs_val sign_flip; do
  python -m signnet_basisnet_tpu.train_filters --filter_type band --net DS --use_eig --lap_method $m --img_num 50
done
