#!/bin/bash
# r5 chip queue, phase B.  Starts when phase A's process exits.
#   1. band50 SignNet(Transformer) seeds 6-10 (directive 6: chase the
#      published 0.00157 on the raw protocol)
#   2. LSPE configs, 1 seed each (directive 8: last un-exercised feature)
#   3. Alchemy seeds 3-4 (directive 5: reference protocol is 5 seeds)
#   4. masked second seeds (s95) if time remains
# DEADLINE: no new run is launched after this UTC epoch (driver runs
# bench.py at round end; the chip must be free).  Timeouts past the
# deadline are clamped.
cd /root/repo
mkdir -p results/r5/zinc results/r5/band50 results/r5/alchemy
exec > >(tee -a results/r5/queue_b.out) 2>&1
echo "QUEUE_R5B_START $(date -u +%H:%M:%S)"

DEADLINE=$(date -u -d "2026-08-21 23:25" +%s)

# wait for phase A (detection only — never kill by pattern)
while pgrep -f "results/r5/queue_a.sh" >/dev/null; do sleep 60; done
echo "PHASE_A_DONE $(date -u +%H:%M:%S)"

past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
clamp_tmo() {
  local want=$1 left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt "$want" ] && echo "$left" || echo "$want"
}

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
  past_deadline && { echo "SKIP $name (deadline)"; return; }
  tmo=$(clamp_tmo "$tmo")
  echo "=== $name $(date -u +%H:%M:%S) tmo=${tmo}s ==="
  launch "$tmo" "$log" \
    python -m signnet_basisnet_tpu.train_zinc \
      --config configs/$cfg.json train.seed $seed \
      train.checkpoint_dir results/r5/zinc/ckpt_${name} \
      train.resume true out_dir results/r5/zinc name ${name}
  echo "--- $name rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
}

# --- 0. interlude C: tile_dense re-bench + mp=1 halo overhead probe ---
if [ ! -f results/r5/interlude_c.log ] || \
   ! grep -q INTERLUDE_C_DONE results/r5/interlude_c.log; then
  echo "=== interlude_c $(date -u +%H:%M:%S) ==="
  launch $(clamp_tmo 2400) results/r5/interlude_c.log \
    python results/r5/interlude_c.py
  echo "--- interlude_c rc=$? $(date -u +%H:%M:%S)"
fi

# --- 1. LSPE configs (feature completeness first) ---
run_net gatedgcn_zinc_rwpe_lspe 41 5400
run_net gin_zinc_rwpe_lspe      41 5400

# --- 2b. tile_dense curve-validation seed: flagship GIN s41 under the new
#         default backend, to lay against the r3 xla s41 curve (the r4
#         standard: defaults flip only with a protocol curve validation) ---
run_net gin_zinc_signinv_gin 41 4500

# --- 2. band50 seeds 6-10 ---
for s in 6 7 8 9 10; do
  log=results/r5/band50/band50_signnet_tf_s${s}.log
  grep -q "RESULT" "$log" 2>/dev/null && continue
  past_deadline && { echo "SKIP band50 s$s (deadline)"; continue; }
  echo "=== band50_tf s$s $(date -u +%H:%M:%S) ==="
  launch $(clamp_tmo 1800) "$log" \
    python -m signnet_basisnet_tpu.train_filters --filter_type band \
      --net Transformer --hidden_channels 16 --img_num 50 --seed $s \
      --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv \
      --sign_inv_net DS --matmul_precision highest \
      --results_dir results/r5/band50
  echo "--- band50_tf s$s rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
done

# --- 3. Alchemy seeds 3-4 (reference loops 5 seeds, we have 0-2) ---
for attempt in 1 2; do
  for s in 3 4; do
    [ -f "results/r5/alchemy/alchemy_s${s}.json" ] && continue
    past_deadline && { echo "SKIP alchemy s$s (deadline)"; continue; }
    echo "=== alchemy s$s attempt $attempt $(date -u +%H:%M:%S) ==="
    launch $(clamp_tmo 4500) results/r5/alchemy/alchemy_s${s}.log \
      python -m signnet_basisnet_tpu.train_alchemy \
        --seed0 "$s" --seeds $(( s + 1 )) --epochs 500 \
        --out_dir results/r5/alchemy --ckpt_dir results/r5/alchemy/ckpt \
        --resume
    echo "--- alchemy s$s rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r5/alchemy/alchemy_s${s}.log)"
  done
done

# --- 4. masked second seeds (if time remains) ---
run_net gatedgcn_zinc_signinv_masked    95 9000
run_net transformer_zinc_signinv_masked 95 9000
run_net pna_zinc_signinv_masked         95 14400

# --- resume pass ---
for s in 6 7 8 9 10; do
  log=results/r5/band50/band50_signnet_tf_s${s}.log
  grep -q "RESULT" "$log" 2>/dev/null && continue
  past_deadline && continue
  launch $(clamp_tmo 1800) "$log" \
    python -m signnet_basisnet_tpu.train_filters --filter_type band \
      --net Transformer --hidden_channels 16 --img_num 50 --seed $s \
      --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv \
      --sign_inv_net DS --matmul_precision highest \
      --results_dir results/r5/band50
done
run_net gatedgcn_zinc_rwpe_lspe 41 5400
run_net gin_zinc_rwpe_lspe      41 5400
run_net gatedgcn_zinc_signinv_masked    95 9000
run_net transformer_zinc_signinv_masked 95 9000
run_net pna_zinc_signinv_masked         95 14400
echo "QUEUE_R5B_DONE $(date -u +%H:%M:%S)"
