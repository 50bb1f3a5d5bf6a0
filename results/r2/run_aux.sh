#!/bin/bash
# Alchemy + GINE-ZINC end-to-end multi-seed runs (VERDICT r1 #8), synthetic.
cd /root/repo
mkdir -p results/r2/aux
echo "=== alchemy 3 seeds ==="
timeout 7200 python -m signnet_basisnet_tpu.train_alchemy --seeds 3 \
  --epochs 400 > results/r2/aux/alchemy.log 2>&1
tail -3 results/r2/aux/alchemy.log
for seed in 0 1 2; do
  echo "=== zinc_gine seed=$seed ==="
  timeout 3600 python -m signnet_basisnet_tpu.train_zinc_gine --seed $seed \
    > results/r2/aux/zinc_gine_s${seed}.log 2>&1
  tail -1 results/r2/aux/zinc_gine_s${seed}.log
done
echo AUX_ALL_DONE
