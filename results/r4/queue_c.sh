#!/bin/bash
# r4 chip queue, phase C: takes over from queue_b (killed at the band50/PNA
# boundary for the rotation-retry + bench interlude).  Runs the per-net
# protocol runs (PNA / Transformer / GAT, seeds 41 then 95, resumable),
# then the roofline.  Same launch()/watchdog contract.
cd /root/repo
mkdir -p results/r4/zinc
exec > >(tee -a results/r4/queue_c.out) 2>&1
echo "QUEUE_C_START $(date -u +%H:%M:%S)"

launch() {
  local tmo=$1 log=$2; shift 2
  "$@" >> "$log" 2>&1 &
  local pid=$!
  echo "$pid" > results/r4/chip.pid
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
  rm -f results/r4/chip.pid
  return $rc
}

run_net() {
  local cfg=$1 seed=$2 tmo=$3
  local name=${cfg}_s${seed}
  local log=results/r4/zinc/${name}.log
  grep -q "^FINAL:" "$log" 2>/dev/null && return
  echo "=== $name $(date -u +%H:%M:%S) tmo=${tmo}s ==="
  launch "$tmo" "$log" \
    python -m signnet_basisnet_tpu.train_zinc \
      --config configs/$cfg.json train.seed $seed \
      train.checkpoint_dir results/r4/zinc/ckpt_${name} \
      train.resume true out_dir results/r4/zinc name ${name}
  echo "--- $name rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
}

for seed in 41 95; do
  for cfg in pna_zinc_signinv_gin transformer_zinc_signinv_gin gat_zinc_signinv_gin; do
    run_net $cfg $seed 5400
  done
done

if [ ! -f results/r4/roofline.log ]; then
  echo "=== roofline $(date -u +%H:%M:%S) ==="
  launch 2400 results/r4/roofline.log python bench_roofline.py
  echo "--- roofline rc=$? $(date -u +%H:%M:%S)"
fi

# resume pass
for seed in 41 95; do
  for cfg in pna_zinc_signinv_gin transformer_zinc_signinv_gin gat_zinc_signinv_gin; do
    run_net $cfg $seed 5400
  done
done
echo "QUEUE_C_DONE $(date -u +%H:%M:%S)"
