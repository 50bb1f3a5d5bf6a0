#!/bin/bash
# r4 chip queue, phase B (waits for phase A): kernel re-measurement under
# the honest barrier, the pallas_tile GatedGCN validation seed, band50
# SignNet(Transformer) seeds 3-5, then PNA/Transformer/GAT protocol runs
# (VERDICT r3 directives #2, #3, #4, #5).  Same launch()/watchdog contract
# as queue_a.sh.
cd /root/repo
mkdir -p results/r4/zinc results/r4/band50
exec > >(tee -a results/r4/queue_b.out) 2>&1

while ! grep -q QUEUE_A_DONE results/r4/queue_a.out 2>/dev/null; do
  sleep 20
done
echo "QUEUE_B_START $(date -u +%H:%M:%S)"

launch() {  # launch <timeout_s> <logfile> <cmd...>
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

# --- 1. kernel micro/step bench under the honest value-fetch barrier ---
if [ ! -f results/r4/bench_ops.log ] || ! grep -q DONE results/r4/bench_ops.log; then
  echo "=== bench_ops $(date -u +%H:%M:%S) ==="
  launch 2700 results/r4/bench_ops.log python bench_ops.py
  echo "DONE rc=$?" >> results/r4/bench_ops.log
  echo "--- bench_ops rc done $(date -u +%H:%M:%S)"
fi

# --- 2. flagship bench sweep (validates the tile path on the real chip) ---
if [ ! -f results/r4/bench_auto.log ]; then
  echo "=== bench auto $(date -u +%H:%M:%S) ==="
  launch 3600 results/r4/bench_auto.log python bench.py
  echo "--- bench auto rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r4/bench_auto.log)"
fi

# --- 3. pallas_tile GatedGCN training-curve validation seed (s41) ---
for attempt in 1 2; do
  grep -q "^FINAL:" results/r4/zinc/gatedgcn_tile_s41.log 2>/dev/null && break
  echo "=== gatedgcn_tile_s41 attempt $attempt $(date -u +%H:%M:%S) ==="
  launch 3300 results/r4/zinc/gatedgcn_tile_s41.log \
    python -m signnet_basisnet_tpu.train_zinc \
      --config configs/gatedgcn_zinc_signinv_gin.json train.seed 41 \
      data.tile 256 data.agg_backend pallas_tile \
      train.checkpoint_dir results/r4/zinc/ckpt_gatedgcn_tile_s41 \
      train.resume true out_dir results/r4/zinc name gatedgcn_tile_s41
  echo "--- tile_s41 rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r4/zinc/gatedgcn_tile_s41.log)"
done

# --- 4. band50 SignNet(Transformer) seeds 3-5 (chasing ref 0.00157) ---
for s in 3 4 5; do
  log=results/r4/band50/band50_signnet_tf_s${s}.log
  grep -q "RESULT" "$log" 2>/dev/null && continue
  echo "=== band50_tf s$s $(date -u +%H:%M:%S) ==="
  launch 1800 "$log" \
    python -m signnet_basisnet_tpu.train_filters --filter_type band \
      --net Transformer --hidden_channels 16 --img_num 50 --seed $s \
      --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv \
      --sign_inv_net DS --matmul_precision highest \
      --results_dir results/r4/band50
  echo "--- band50_tf s$s rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
done

# --- 5. PNA / Transformer / GAT protocol runs (seed-major; 2nd seeds after
#        every net has one) ---
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
# resume pass for anything the timeout cut
for seed in 41 95; do
  for cfg in pna_zinc_signinv_gin transformer_zinc_signinv_gin gat_zinc_signinv_gin; do
    run_net $cfg $seed 5400
  done
done

# --- 6. roofline under the honest barrier ---
if [ ! -f results/r4/roofline.log ]; then
  echo "=== roofline $(date -u +%H:%M:%S) ==="
  launch 2400 results/r4/roofline.log python bench_roofline.py
  echo "--- roofline rc=$? $(date -u +%H:%M:%S)"
fi

echo "QUEUE_B_DONE $(date -u +%H:%M:%S)"
