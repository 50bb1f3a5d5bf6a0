#!/bin/bash
cd /root/repo
# wait for the in-flight gatedgcn_s41 run (pid passed as $1) to exit
while kill -0 $1 2>/dev/null; do sleep 15; done
tail -1 results/r2/zinc/gatedgcn_zinc_signinv_gin_s41.log >> results/r2/zinc/queue.out
echo "DONE gatedgcn_s41" >> results/r2/zinc/queue.out

# 1) roofline on the real chip (VERDICT #5)
timeout 1500 python bench_roofline.py > results/r2/roofline.log 2>&1
echo "ROOFLINE_DONE" >> results/r2/zinc/queue.out

# 2) resume-mid-run check (VERDICT #3)
timeout 420 python -m signnet_basisnet_tpu.train_zinc \
  --config configs/gin_zinc_signinv_gin.json train.seed 41 \
  train.checkpoint_dir results/r2/zinc/ckpt_resume train.epochs 1000 \
  out_dir '' > results/r2/zinc/resume_part1.log 2>&1
timeout 700 python -m signnet_basisnet_tpu.train_zinc \
  --config configs/gin_zinc_signinv_gin.json train.seed 41 \
  train.checkpoint_dir results/r2/zinc/ckpt_resume train.resume true \
  train.epochs 40 out_dir '' > results/r2/zinc/resume_part2.log 2>&1
echo "RESUME_CHECK_DONE" >> results/r2/zinc/queue.out

# 3) aux: alchemy 3 seeds + one zinc-gine seed (VERDICT #8)
mkdir -p results/r2/aux
timeout 2400 python -m signnet_basisnet_tpu.train_alchemy --seeds 3 \
  --epochs 400 > results/r2/aux/alchemy.log 2>&1
tail -3 results/r2/aux/alchemy.log >> results/r2/zinc/queue.out
echo "ALCHEMY_DONE" >> results/r2/zinc/queue.out
timeout 1800 python -m signnet_basisnet_tpu.train_zinc_gine --seed 0 \
  > results/r2/aux/zinc_gine_s0.log 2>&1
tail -1 results/r2/aux/zinc_gine_s0.log >> results/r2/zinc/queue.out
echo "AUX_DONE" >> results/r2/zinc/queue.out

# 4) second seeds for the flagship configs
for cfg in gin_zinc_signinv_gin gatedgcn_zinc_signinv_gin; do
  timeout 2700 python -m signnet_basisnet_tpu.train_zinc \
    --config configs/$cfg.json train.seed 95 \
    out_dir results/r2/zinc name ${cfg}_s95 \
    > results/r2/zinc/${cfg}_s95.log 2>&1
  tail -1 results/r2/zinc/${cfg}_s95.log >> results/r2/zinc/queue.out
  echo "DONE ${cfg}_s95" >> results/r2/zinc/queue.out
done

# 5) transformer band50 extra seeds (stretch)
for s in 3 4; do
  timeout 3000 python -m signnet_basisnet_tpu.train_filters --filter_type band --net Transformer --hidden_channels 16 --img_num 50 --seed $s --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv --sign_inv_net DS --matmul_precision highest --results_dir results/r2 > results/r2/band50_signnet_tf_s${s}.log 2>&1
  tail -1 results/r2/band50_signnet_tf_s${s}.log >> results/r2/zinc/queue.out
done
echo "QUEUE3_ALL_DONE" >> results/r2/zinc/queue.out
