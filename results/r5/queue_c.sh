#!/bin/bash
# r5 chip queue, phase C — post-restart recovery.
#
# The 22:02 driver restart reset the workspace to git state: queue B's
# processes died and the gitignored ckpt_* dirs were lost (so the PNA
# masked s41 epoch-100 state is unrecoverable; its partial log is
# committed).  ~95 min of chip time remain before the driver's bench run.
# Priorities (VERDICT r4):
#   1. band50 seeds 6-7   (directive 6: one raw seed <= 0.00157; 13 min ea)
#   2. LSPE configs x2    (directive 8: last un-exercised feature; ~30 min ea)
#   3. if time remains: band50 s8, then PNA masked s41 restart (time-capped,
#      SIGINT at deadline -> honest FINAL over the epochs it got)
# DEADLINE: no new run launched after 23:35 UTC; hard chip-free 23:50
# (driver runs bench.py at round end ~00:02).
cd /root/repo
mkdir -p results/r5/zinc results/r5/band50
exec > >(tee -a results/r5/queue_c.out) 2>&1
echo "QUEUE_R5C_START $(date -u +%H:%M:%S)"

DEADLINE=$(date -u -d "2026-08-21 23:35" +%s)
HARDSTOP=$(date -u -d "2026-08-21 23:50" +%s)

past_deadline() { [ "$(date +%s)" -ge "$DEADLINE" ]; }
clamp_tmo() {
  # never let a run live past HARDSTOP (leave 120s for the INT final eval)
  local want=$1 left=$(( HARDSTOP - 120 - $(date +%s) ))
  [ "$left" -lt "$want" ] && echo "$left" || echo "$want"
}

launch() {
  # timeout discipline: INT first (train.py catches KeyboardInterrupt and
  # runs the final eval -> FINAL lines), then TERM, then KILL.
  local tmo=$1 log=$2; shift 2
  "$@" >> "$log" 2>&1 &
  local pid=$!
  echo "$pid" > results/r5/chip.pid
  local t0=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 15
    local el=$(( $(date +%s) - t0 ))
    if [ "$el" -gt "$tmo" ]; then
      echo "TIMEOUT(INT) pid=$pid after ${el}s"
      kill -INT "$pid" 2>/dev/null; sleep 120
      kill -TERM "$pid" 2>/dev/null; sleep 10
      kill -KILL "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; local rc=$?
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
  [ "$tmo" -lt 300 ] && { echo "SKIP $name (no time)"; return; }
  echo "=== $name $(date -u +%H:%M:%S) tmo=${tmo}s ==="
  launch "$tmo" "$log" \
    python -m signnet_basisnet_tpu.train_zinc \
      --config configs/$cfg.json train.seed $seed \
      train.checkpoint_dir results/r5/zinc/ckpt_${name} \
      train.resume true out_dir results/r5/zinc name ${name}
  echo "--- $name rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
}

run_band50() {
  local s=$1
  local log=results/r5/band50/band50_signnet_tf_s${s}.log
  grep -q "RESULT" "$log" 2>/dev/null && return
  past_deadline && { echo "SKIP band50 s$s (deadline)"; return; }
  local tmo; tmo=$(clamp_tmo 1500)
  [ "$tmo" -lt 300 ] && { echo "SKIP band50 s$s (no time)"; return; }
  echo "=== band50_tf s$s $(date -u +%H:%M:%S) tmo=${tmo}s ==="
  launch "$tmo" "$log" \
    python -m signnet_basisnet_tpu.train_filters --filter_type band \
      --net Transformer --hidden_channels 16 --img_num 50 --seed $s \
      --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv \
      --sign_inv_net DS --matmul_precision highest \
      --results_dir results/r5/band50
  echo "--- band50_tf s$s rc=$? $(date -u +%H:%M:%S): $(tail -1 "$log")"
}

# --- 1. band50 seeds 6-7 (cheap, binary payoff) ---
run_band50 6
run_band50 7

# --- 2. LSPE configs (directive 8: both FINAL lines close the feature) ---
run_net gatedgcn_zinc_rwpe_lspe 41 2700
run_net gin_zinc_rwpe_lspe      41 2400

# --- 3. opportunistic tail ---
run_band50 8
run_band50 9
run_net pna_zinc_signinv_masked 41 14400

echo "QUEUE_R5C_DONE $(date -u +%H:%M:%S)"
