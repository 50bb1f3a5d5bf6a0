#!/bin/bash
# r5 chip queue, phase A.  Waits for the r4 queue_c process to release the
# chip (GAT s95 tail), then:
#   0. interlude_a: pinned torch baseline + jax.profiler traces (directives
#      4 and 7)
#   1. the reference's best published rows — masked all-eigenvector SignNet
#      (directive 1): gatedgcn / transformer / pna signinv_masked, seed 41
#   2. the SignNet-vs-baselines ablation axis (directive 2): GatedGCN x
#      {nope, lappe(sign_flip), abs, canonical} x seeds {41, 95}
# Same launch()/watchdog contract as r4 (exact-PID chip.pid, resume pass).
cd /root/repo
mkdir -p results/r5/zinc
exec > >(tee -a results/r5/queue_a.out) 2>&1
echo "QUEUE_R5A_START $(date -u +%H:%M:%S)"

# wait for the r4 queue (pid recorded at authoring time) to free the chip
while kill -0 21070 2>/dev/null; do sleep 30; done
echo "R4_QUEUE_DONE $(date -u +%H:%M:%S)"

launch() {
  local tmo=$1 log=$2; shift 2
  "$@" >> "$log" 2>&1 &
  local pid=$!
  echo "$pid" > results/r5/chip.pid
  local t0=$(date +%s) rc=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 15
    if [ $(( $(date +%s) - t0 )) -gt "$tmo" ]; then
      echo "TIMEOUT pid=$pid after ${tmo}s"
      kill -TERM "$pid" 2>/dev/null; sleep 10
      kill -KILL "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; rc=$?
  rm -f results/r5/chip.pid
  return $rc
}

run_net() {
  local cfg=$1 seed=$2 tmo=$3
  local name=${cfg}_s${seed}
  local log=results/r5/zinc/${name}.log
  grep -q "^FINAL:" "$log" 2>/dev/null && return
  echo "=== $name $(date -u +%H:%M:%S) tmo=${tmo}s ==="
  launch "$tmo" "$log" \
    python -m signnet_basisnet_tpu.train_zinc \
      --config configs/$cfg.json train.seed $seed \
      train.checkpoint_dir results/r5/zinc/ckpt_${name} \
      train.resume true out_dir results/r5/zinc name ${name}
  echo "--- $name rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
}

if [ ! -f results/r5/interlude_a.log ] || \
   ! grep -q INTERLUDE_A_DONE results/r5/interlude_a.log; then
  echo "=== interlude_a $(date -u +%H:%M:%S) ==="
  launch 2400 results/r5/interlude_a.log python results/r5/interlude_a.py
  echo "--- interlude_a rc=$? $(date -u +%H:%M:%S)"
fi

# directive 1: the paper's best-row configs, first seed
run_net gatedgcn_zinc_signinv_masked    41 9000
run_net transformer_zinc_signinv_masked 41 9000
run_net pna_zinc_signinv_masked         41 14400

# directive 2: the ablation axis
for seed in 41 95; do
  for cfg in gatedgcn_zinc_nope gatedgcn_zinc_lappe \
             gatedgcn_zinc_lappe_abs gatedgcn_zinc_lappe_canonical; do
    run_net $cfg $seed 4500
  done
done

# resume pass for anything that timed out / wedged
run_net gatedgcn_zinc_signinv_masked    41 9000
run_net transformer_zinc_signinv_masked 41 9000
run_net pna_zinc_signinv_masked         41 14400
for seed in 41 95; do
  for cfg in gatedgcn_zinc_nope gatedgcn_zinc_lappe \
             gatedgcn_zinc_lappe_abs gatedgcn_zinc_lappe_canonical; do
    run_net $cfg $seed 4500
  done
done
echo "QUEUE_R5A_DONE $(date -u +%H:%M:%S)"
