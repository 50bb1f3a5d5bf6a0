#!/bin/bash
# Alchemy + GINE-ZINC end-to-end multi-seed runs (VERDICT r3 directive #5).
# r2 scripted this and never executed it; this time the queue tees its own
# output and every run's log is committed.
cd /root/repo
mkdir -p results/r3/aux
exec > >(tee -a results/r3/aux/queue.out) 2>&1

echo "=== alchemy 3 seeds start $(date -u +%H:%M:%S) ==="
timeout 5400 python -m signnet_basisnet_tpu.train_alchemy --seeds 3 \
  --epochs 500 >> results/r3/aux/alchemy.log 2>&1
echo "--- alchemy rc=$? $(date -u +%H:%M:%S)"
tail -3 results/r3/aux/alchemy.log

for seed in 0 1 2; do
  echo "=== zinc_gine seed=$seed start $(date -u +%H:%M:%S) ==="
  timeout 2400 python -m signnet_basisnet_tpu.train_zinc_gine --seed $seed \
    >> results/r3/aux/zinc_gine_s${seed}.log 2>&1
  echo "--- zinc_gine s$seed rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r3/aux/zinc_gine_s${seed}.log)"
done
echo "AUX_QUEUE_DONE $(date -u +%H:%M:%S)"
