#!/bin/bash
# r4 chip queue, phase A — the VERDICT r3 pass/fail directive #1:
#   1. Alchemy 3 seeds to convergence (slipped 3 rounds -> runs FIRST)
#   2. GatedGCN s12 resume to min-lr (checkpointed at epoch 235)
#   3. GINE-ZINC 3 seeds x 310 epochs (StepLR protocol)
# Every run is checkpointed + resumable; the retry passes skip completed
# runs (per-seed results JSON / FINAL line present).  One process on the
# chip at a time; its PID is exported to results/r4/chip.pid for the
# watchdog (results/r4/watchdog.sh), which kills wedged (zero-CPU) runs.
cd /root/repo
mkdir -p results/r4/alchemy results/r4/gine
exec > >(tee -a results/r4/queue_a.out) 2>&1

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

# --- 1. Alchemy, 3 seeds, per-seed invocation so a hang costs one seed ---
for attempt in 1 2 3; do
  for s in 0 1 2; do
    [ -f "results/r4/alchemy/alchemy_s${s}.json" ] && continue
    echo "=== alchemy s$s attempt $attempt $(date -u +%H:%M:%S) ==="
    launch 4500 results/r4/alchemy/alchemy_s${s}.log \
      python -m signnet_basisnet_tpu.train_alchemy \
        --seed0 "$s" --seeds $(( s + 1 )) --epochs 500 \
        --out_dir results/r4/alchemy --ckpt_dir results/r4/alchemy/ckpt \
        --resume
    echo "--- alchemy s$s rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r4/alchemy/alchemy_s${s}.log)"
  done
done

# --- 2. GatedGCN s12: resume from the r3 checkpoint to min-lr ---
for attempt in 1 2 3; do
  grep -q "^FINAL:" results/r3/zinc/gatedgcn_zinc_signinv_gin_s12.log 2>/dev/null && break
  echo "=== gatedgcn_s12 resume attempt $attempt $(date -u +%H:%M:%S) ==="
  launch 2400 results/r3/zinc/gatedgcn_zinc_signinv_gin_s12.log \
    python -m signnet_basisnet_tpu.train_zinc \
      --config configs/gatedgcn_zinc_signinv_gin.json train.seed 12 \
      train.checkpoint_dir results/r3/zinc/ckpt_gatedgcn_zinc_signinv_gin_s12 \
      train.resume true out_dir results/r3/zinc \
      name gatedgcn_zinc_signinv_gin_s12
  echo "--- s12 rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r3/zinc/gatedgcn_zinc_signinv_gin_s12.log)"
done

# --- 3. GINE-ZINC, 3 seeds x 310 epochs ---
for attempt in 1 2 3; do
  for s in 0 1 2; do
    [ -f "results/r4/gine/zinc_gine_s${s}.json" ] && continue
    echo "=== zinc_gine s$s attempt $attempt $(date -u +%H:%M:%S) ==="
    launch 3300 results/r4/gine/zinc_gine_s${s}.log \
      python -m signnet_basisnet_tpu.train_zinc_gine --seed "$s" \
        --ckpt_dir results/r4/gine/ckpt_s${s} --out_dir results/r4/gine \
        --resume
    echo "--- zinc_gine s$s rc=$? $(date -u +%H:%M:%S): $(tail -1 results/r4/gine/zinc_gine_s${s}.log)"
  done
done

echo "QUEUE_A_DONE $(date -u +%H:%M:%S)"
