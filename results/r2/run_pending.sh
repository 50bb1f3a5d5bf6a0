#!/bin/bash
cd /root/repo
timeout 3000 python -m signnet_basisnet_tpu.train_filters --filter_type band --net Transformer --hidden_channels 16 --img_num 50 --seed 2 --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv --sign_inv_net DS --matmul_precision highest --results_dir results/r2 > results/r2/band50_signnet_tf_s2.log 2>&1
tail -1 results/r2/band50_signnet_tf_s2.log
for s in 1 2; do
  timeout 3000 python -m signnet_basisnet_tpu.train_filters --filter_type band --net DS --hidden_channels 16 --img_num 50 --seed $s --epochs 2000 --scan_epochs 200 --use_eig --lap_method basis_inv --ign_hidden 16 --matmul_precision highest --results_dir results/r2 > results/r2/band50_basisnet_s${s}.log 2>&1
  tail -1 results/r2/band50_basisnet_s${s}.log
done
echo PENDING_ALL_DONE
