#!/bin/bash
cd /root/repo
mkdir -p results/r2/zinc results/r2/aux
# wait for run 1 (gin s41) to finish
while ! grep -q RUN1_DONE results/r2/zinc/queue.out 2>/dev/null; do sleep 20; done

run_zinc () {
  cfg=$1; seed=$2
  timeout 2700 python -m signnet_basisnet_tpu.train_zinc \
    --config configs/$cfg.json train.seed $seed \
    out_dir results/r2/zinc name ${cfg}_s${seed} \
    > results/r2/zinc/${cfg}_s${seed}.log 2>&1
  tail -1 results/r2/zinc/${cfg}_s${seed}.log >> results/r2/zinc/queue.out
  echo "DONE ${cfg}_s${seed}" >> results/r2/zinc/queue.out
}
run_zinc gatedgcn_zinc_signinv_gin 41
run_zinc gin_zinc_signinv_gin 95
run_zinc gatedgcn_zinc_signinv_gin 95

# resume-mid-run check
timeout 300 python -m signnet_basisnet_tpu.train_zinc \
  --config configs/gin_zinc_signinv_gin.json train.seed 41 \
  train.checkpoint_dir results/r2/zinc/ckpt_resume train.epochs 1000 \
  out_dir '' > results/r2/zinc/resume_part1.log 2>&1
timeout 600 python -m signnet_basisnet_tpu.train_zinc \
  --config configs/gin_zinc_signinv_gin.json train.seed 41 \
  train.checkpoint_dir results/r2/zinc/ckpt_resume train.resume true \
  train.epochs 40 out_dir '' > results/r2/zinc/resume_part2.log 2>&1
echo "RESUME_CHECK_DONE" >> results/r2/zinc/queue.out

# roofline on the real chip
timeout 1800 python bench_roofline.py > results/r2/roofline.log 2>&1
echo "ROOFLINE_DONE" >> results/r2/zinc/queue.out

# aux: alchemy 3 seeds + zinc-gine 2 seeds
timeout 2400 python -m signnet_basisnet_tpu.train_alchemy --seeds 3 \
  --epochs 400 > results/r2/aux/alchemy.log 2>&1
tail -3 results/r2/aux/alchemy.log >> results/r2/zinc/queue.out
for seed in 0 1; do
  timeout 1800 python -m signnet_basisnet_tpu.train_zinc_gine --seed $seed \
    > results/r2/aux/zinc_gine_s${seed}.log 2>&1
  tail -1 results/r2/aux/zinc_gine_s${seed}.log >> results/r2/zinc/queue.out
done
echo "AUX_DONE" >> results/r2/zinc/queue.out

# transformer band50 extra seeds
for s in 3 4; do
  timeout 3000 python -m signnet_basisnet_tpu.train_filters --filter_type band --net Transformer --hidden_channels 16 --img_num 50 --seed $s --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv --sign_inv_net DS --matmul_precision highest --results_dir results/r2 > results/r2/band50_signnet_tf_s${s}.log 2>&1
  tail -1 results/r2/band50_signnet_tf_s${s}.log >> results/r2/zinc/queue.out
done
echo "QUEUE2_ALL_DONE" >> results/r2/zinc/queue.out
