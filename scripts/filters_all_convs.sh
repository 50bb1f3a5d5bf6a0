#!/usr/bin/env bash
# baseline sweep over nets x width x depth (reference: LearningFilters/scripts/all_convs.sh)
set -e
cd "$(dirname "$0")/.."
for net in GcnNet GatNet ChebNet BernNet ARMANet GPRNet MLP DS Transformer; do
  for h in 32 64; do for l in 2 4; do
    python -m signnet_basisnet_tpu.train_filters --filter_type band --net $net \
      --hidden_channels $h --num_layers $l --img_num 50
  done; done
done
