#!/bin/bash
cd /root/repo
set -x
python -m signnet_basisnet_tpu.train_filters --filter_type band --net DS --hidden_channels 32 --num_layers 3 --img_num 50 --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv --sign_inv_net DS --results_dir results/r2 > results/r2/band50_signnet_ds.log 2>&1
python -m signnet_basisnet_tpu.train_filters --filter_type band --net DS --hidden_channels 16 --img_num 50 --epochs 2000 --scan_epochs 200 --use_eig --lap_method basis_inv --ign_hidden 16 --results_dir results/r2 > results/r2/band50_basisnet.log 2>&1
python -m signnet_basisnet_tpu.train_filters --filter_type band --net Transformer --hidden_channels 16 --img_num 50 --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv --sign_inv_net DS --results_dir results/r2 > results/r2/band50_signnet_tf.log 2>&1
echo ALL_DONE
