#!/bin/bash
# Flagship ZINC protocol (VERDICT r3 directive #1): 4 reference seeds x
# {GIN, GatedGCN} + SignNet(GIN phi), run to min-lr / epoch cap so every run
# emits its `FINAL: test_mae=` line.  Seed-major so each config gets numbers
# early.  Each run checkpoints; pass 2 resumes anything the per-run timeout
# killed.  All output tee'd (VERDICT r3 directive #10: no lost provenance).
cd /root/repo
mkdir -p results/r3/zinc
MAIN=results/r3/zinc/queue.out
exec > >(tee -a "$MAIN") 2>&1

run_one() {
  local cfg=$1 seed=$2 tmo=$3 extra=$4
  local name=${cfg}_s${seed}
  local log=results/r3/zinc/${name}.log
  if grep -q "FINAL:" "$log" 2>/dev/null; then
    echo "--- $name already FINAL, skipping"
    return
  fi
  echo "=== $name start $(date -u +%H:%M:%S) tmo=${tmo}s ==="
  timeout "$tmo" python -m signnet_basisnet_tpu.train_zinc \
    --config configs/$cfg.json train.seed $seed \
    train.checkpoint_dir results/r3/zinc/ckpt_${name} \
    out_dir results/r3/zinc name ${name} $extra \
    >> "$log" 2>&1
  echo "--- $name rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
}

for seed in 41 95 12 35; do
  for cfg in gin_zinc_signinv_gin gatedgcn_zinc_signinv_gin; do
    run_one $cfg $seed 2700 ""
  done
done
# pass 2: resume runs the timeout killed
for seed in 41 95 12 35; do
  for cfg in gin_zinc_signinv_gin gatedgcn_zinc_signinv_gin; do
    run_one $cfg $seed 2400 "train.resume true"
  done
done
echo "ZINC_QUEUE_DONE $(date -u +%H:%M:%S)"
