#!/bin/bash
# Post-ZINC chip queue (r3 v2): kernel benches -> scan probe -> roofline ->
# s95 rerun (patched FINAL_BEST_VAL reporting) -> Alchemy -> band50/GINE
# interleaved -> final bench.  Deadline-gated on absolute epoch seconds so
# the driver's end-of-round bench.py gets the chip back; every step tees
# its own log (VERDICT r3 directive #10).
cd /root/repo
DEADLINE=${1:?usage: queue_post.sh <deadline_epoch_s>}
# driver-bench grace measured: hold the chip until 05:32 UTC at most
[ "$DEADLINE" -lt 1787290320 ] && DEADLINE=1787290320
left () { echo $(( DEADLINE - $(date +%s) )); }
cap () { local want=$1; local l=$(left); echo $(( l < want ? l : want )); }

MAIN=results/r3/queue_post.out
exec > >(tee -a "$MAIN") 2>&1
mkdir -p results/r3/aux

# wait for the ZINC queue to release the chip
while ! grep -q ZINC_QUEUE_DONE results/r3/zinc/queue.out 2>/dev/null; do
  sleep 30
done
echo "POST_QUEUE_START $(date -u +%H:%M:%S) left=$(left)s"

step () {  # step <name> <want_timeout> <cmd...>
  local name=$1 want=$2; shift 2
  if [ "$(left)" -lt 240 ]; then echo "SKIP $name (deadline)"; return; fi
  echo "=== $name start $(date -u +%H:%M:%S) tmo=$(cap "$want")s ==="
  timeout "$(cap "$want")" "$@"
  echo "--- $name rc=$? $(date -u +%H:%M:%S)"
}

# 1) kernel microbench + full-train-step numbers (VERDICT #4 evidence)
step bench_ops 1400 bash -c 'python bench_ops.py > results/r3/bench_ops.log 2>&1'
tail -12 results/r3/bench_ops.log

# 3) analytic roofline (VERDICT #3)
step roofline 1500 bash -c 'python bench_roofline.py > results/r3/roofline.log 2>&1'
tail -20 results/r3/roofline.log

# 5) Alchemy + GINE first (VERDICT #5 — r2's unexecuted aux runs), then
# band50 seeds (#6); the deadline gate trims the tail.
band50 () {
  local s=$1
  if grep -q "mean loss" results/r3/band50_signnet_tf_s${s}.log 2>/dev/null; then return; fi
  step band50_tf_s$s 1500 bash -c "python -m signnet_basisnet_tpu.train_filters \
    --filter_type band --net Transformer --hidden_channels 16 --img_num 50 \
    --seed $s --epochs 2000 --scan_epochs 200 --use_eig --lap_method sign_inv \
    --sign_inv_net DS --matmul_precision highest --results_dir results/r3 \
    > results/r3/band50_signnet_tf_s${s}.log 2>&1"
  tail -1 results/r3/band50_signnet_tf_s${s}.log
}
gine () {
  local s=$1
  step zinc_gine_s$s 1400 bash -c "python -m signnet_basisnet_tpu.train_zinc_gine --seed $s > results/r3/aux/zinc_gine_s${s}.log 2>&1"
  tail -1 results/r3/aux/zinc_gine_s${s}.log
}
alchemy_cap=1400
step alchemy $alchemy_cap bash -c 'python -m signnet_basisnet_tpu.train_alchemy --seeds 3 --epochs 500 > results/r3/aux/alchemy.log 2>&1'
tail -5 results/r3/aux/alchemy.log
gine 0
# 2) scan-vs-flat bisection on the real chip (VERDICT #8)
step probe_scan 1000 bash -c 'python results/r3/probe_scan.py > results/r3/probe_scan.log 2>&1'
tail -6 results/r3/probe_scan.log

band50 3
gine 1
band50 4
gine 2
band50 5

# 7) final headline bench if time remains
step bench_final 900 bash -c 'python bench.py > results/r3/bench_final.log 2>&1'
tail -3 results/r3/bench_final.log

echo "POST_QUEUE_DONE $(date -u +%H:%M:%S) left=$(left)s"
