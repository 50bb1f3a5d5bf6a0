#!/bin/bash
# Wait for the ZINC queue, close the missing s12 GatedGCN seed (hung twice
# on tunnel flakes; watchdog now bounds each hang to ~8 min), then hand
# the chip to the post queue.
cd /root/repo
DEADLINE=${1:?deadline_epoch_s}
exec > >(tee -a results/r3/zinc/queue.out) 2>&1
while ! grep -q ZINC_QUEUE_DONE results/r3/zinc/queue.out 2>/dev/null; do
  sleep 20
done
for attempt in 3 4; do
  if grep -q "FINAL:" results/r3/zinc/gatedgcn_zinc_signinv_gin_s12.log 2>/dev/null; then break; fi
  if [ $(( DEADLINE - $(date +%s) )) -lt 2400 ]; then echo "SKIP s12 retry (deadline)"; break; fi
  echo "=== gatedgcn_s12 attempt $attempt $(date -u +%H:%M:%S) ==="
  timeout 1700 python -m signnet_basisnet_tpu.train_zinc \
    --config configs/gatedgcn_zinc_signinv_gin.json train.seed 12 \
    train.checkpoint_dir results/r3/zinc/ckpt_gatedgcn_zinc_signinv_gin_s12 \
    train.resume true out_dir results/r3/zinc name gatedgcn_zinc_signinv_gin_s12 \
    >> results/r3/zinc/gatedgcn_zinc_signinv_gin_s12.log 2>&1
  echo "--- attempt $attempt rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r3/zinc/gatedgcn_zinc_signinv_gin_s12.log)"
done
echo "S12_RETRY_DONE $(date -u +%H:%M:%S)"
setsid bash results/r3/queue_post.sh "$DEADLINE" </dev/null >/dev/null 2>&1 &
echo "post-queue launched"
