#!/usr/bin/env bash
# 1-image timing comparison GCN/Cheb/SignNet-DS/BasisNet (reference:
# LearningFilters/scripts/timing.sh)
set -e
cd "$(dirname "$0")/.."
filter_type=${1:-band}
echo GCN
python -m signnet_basisnet_tpu.train_filters --filter_type "$filter_type" --net GcnNet \
  --hidden_channels 128 --num_layers 4 --img_num 1
echo ChebNet
python -m signnet_basisnet_tpu.train_filters --filter_type "$filter_type" --net ChebNet \
  --hidden_channels 74 --num_layers 4 --img_num 1
echo "SignNet with DeepSets"
python -m signnet_basisnet_tpu.train_filters --filter_type "$filter_type" --net DS \
  --hidden_channels 32 --num_layers 3 --img_num 1 --use_eig --lap_method sign_inv --sign_inv_net DS
echo "BasisNet with DeepSets"
python -m signnet_basisnet_tpu.train_filters --filter_type "$filter_type" --net DS \
  --hidden_channels 16 --img_num 1 --use_eig --lap_method basis_inv
