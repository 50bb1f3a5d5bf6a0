#!/bin/bash
# Deadline-gated TPU queue: each step only starts if enough margin remains
# before the driver's end-of-round bench.  $1 = pid of the in-flight
# gatedgcn_s41 run; $2 = deadline as absolute epoch seconds (required —
# a bare clock time would silently mean "today" and misbehave when started
# after the deadline or across midnight).
cd /root/repo
DEADLINE=${2:?usage: queue4.sh <pid> <deadline_epoch_s>}
left () { echo $(( DEADLINE - $(date +%s) )); }

while kill -0 $1 2>/dev/null; do sleep 15; done
tail -1 results/r2/zinc/gatedgcn_zinc_signinv_gin_s41.log >> results/r2/zinc/queue.out
echo "DONE gatedgcn_s41" >> results/r2/zinc/queue.out

# 1) roofline (VERDICT #5) — ~15 min
if [ $(left) -gt 900 ]; then
  timeout $(( $(left) > 1500 ? 1500 : $(left) )) python bench_roofline.py > results/r2/roofline.log 2>&1
  echo "ROOFLINE_DONE" >> results/r2/zinc/queue.out
fi

# 2) resume-mid-run check (VERDICT #3) — ~14 min
if [ $(left) -gt 900 ]; then
  timeout 420 python -m signnet_basisnet_tpu.train_zinc \
    --config configs/gin_zinc_signinv_gin.json train.seed 41 \
    train.checkpoint_dir results/r2/zinc/ckpt_resume train.epochs 1000 \
    out_dir '' > results/r2/zinc/resume_part1.log 2>&1
  timeout 700 python -m signnet_basisnet_tpu.train_zinc \
    --config configs/gin_zinc_signinv_gin.json train.seed 41 \
    train.checkpoint_dir results/r2/zinc/ckpt_resume train.resume true \
    train.epochs 40 out_dir '' > results/r2/zinc/resume_part2.log 2>&1
  echo "RESUME_CHECK_DONE" >> results/r2/zinc/queue.out
fi

# 3) aux numbers (VERDICT #8), epochs shortened to fit — documented in RESULTS
mkdir -p results/r2/aux
if [ $(left) -gt 700 ]; then
  timeout $(left) python -m signnet_basisnet_tpu.train_alchemy --seeds 2 \
    --epochs 150 > results/r2/aux/alchemy.log 2>&1
  tail -3 results/r2/aux/alchemy.log >> results/r2/zinc/queue.out
  echo "ALCHEMY_DONE" >> results/r2/zinc/queue.out
fi
if [ $(left) -gt 600 ]; then
  timeout $(left) python -m signnet_basisnet_tpu.train_zinc_gine --seed 0 \
    --epochs 120 > results/r2/aux/zinc_gine_s0.log 2>&1
  tail -1 results/r2/aux/zinc_gine_s0.log >> results/r2/zinc/queue.out
  echo "GINE_DONE" >> results/r2/zinc/queue.out
fi

# 4) stretch: second flagship seed, then TF band50 seeds
if [ $(left) -gt 2400 ]; then
  timeout $(left) python -m signnet_basisnet_tpu.train_zinc \
    --config configs/gin_zinc_signinv_gin.json train.seed 95 \
    out_dir results/r2/zinc name gin_zinc_signinv_gin_s95 \
    > results/r2/zinc/gin_zinc_signinv_gin_s95.log 2>&1
  tail -1 results/r2/zinc/gin_zinc_signinv_gin_s95.log >> results/r2/zinc/queue.out
fi
if [ $(left) -gt 1600 ]; then
  timeout $(left) python -m signnet_basisnet_tpu.train_filters --filter_type band --net Transformer --hidden_channels 16 --img_num 50 --seed 3 --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv --sign_inv_net DS --matmul_precision highest --results_dir results/r2 > results/r2/band50_signnet_tf_s3.log 2>&1
  tail -1 results/r2/band50_signnet_tf_s3.log >> results/r2/zinc/queue.out
fi
echo "QUEUE4_ALL_DONE $(date -u)" >> results/r2/zinc/queue.out
