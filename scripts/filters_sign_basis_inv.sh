#!/usr/bin/env bash
# SignNet-DS/Transformer + BasisNet on the band filter (reference: LearningFilters/scripts/sign_basis_inv.sh)
set -e
cd "$(dirname "$0")/.."
python -m signnet_basisnet_tpu.train_filters --filter_type band --net DS --use_eig --lap_method sign_inv --sign_inv_net DS --img_num 50
python -m signnet_basisnet_tpu.train_filters --filter_type band --net DS --use_eig --lap_method sign_inv --sign_inv_net Transformer --img_num 50
python -m signnet_basisnet_tpu.train_filters --filter_type band --net DS --use_eig --lap_method basis_inv --basis_inv_net IGN --img_num 50
