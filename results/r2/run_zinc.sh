#!/bin/bash
# Flagship ZINC protocol to convergence (VERDICT r1 #3): reference seeds x
# {GIN, GatedGCN} + SignNet(GIN phi), synthetic ZINC stand-in, full plateau
# schedule to min-lr.  Seed-major order so each config gets numbers early.
cd /root/repo
mkdir -p results/r2/zinc
for seed in 41 95 12 35; do
  for cfg in gin_zinc_signinv_gin gatedgcn_zinc_signinv_gin; do
    echo "=== $cfg seed=$seed $(date +%H:%M) ==="
    timeout 5400 python -m signnet_basisnet_tpu.train_zinc \
      --config configs/$cfg.json train.seed $seed \
      out_dir results/r2/zinc name ${cfg}_s${seed} \
      > results/r2/zinc/${cfg}_s${seed}.log 2>&1
    tail -1 results/r2/zinc/${cfg}_s${seed}.log
  done
done
# resume-mid-run check: interrupt after 240 s, resume, confirm fast-forward
echo "=== resume check ==="
timeout 240 python -m signnet_basisnet_tpu.train_zinc \
  --config configs/gin_zinc_signinv_gin.json train.seed 41 \
  train.checkpoint_dir results/r2/zinc/ckpt_resume train.epochs 1000 \
  out_dir '' > results/r2/zinc/resume_part1.log 2>&1
timeout 900 python -m signnet_basisnet_tpu.train_zinc \
  --config configs/gin_zinc_signinv_gin.json train.seed 41 \
  train.checkpoint_dir results/r2/zinc/ckpt_resume train.resume true \
  train.epochs 30 out_dir '' > results/r2/zinc/resume_part2.log 2>&1
grep -iE "resume|restored|epoch" results/r2/zinc/resume_part2.log | head -5
echo ZINC_ALL_DONE
