#!/bin/bash
# Tunnel-hang watchdog: the axon TPU tunnel occasionally wedges a client
# process mid-call (futex wait, zero CPU progress — observed twice in the
# r3 ZINC queue).  Every CHECK seconds, sample cumulative CPU jiffies of
# every python process running one of our chip workloads; kill -TERM any
# whose CPU advanced < MIN_JIFFIES since the previous sample (a live run
# dispatches constantly; a wedged one is frozen).  The queues' run loops
# log the rc and pass-2/resume picks the run back up from checkpoints.
CHECK=${1:-240}
MIN_JIFFIES=${2:-100}   # 1s of CPU per CHECK window
LOG=results/r3/watchdog.log
declare -A prev
echo "watchdog start $(date -u +%H:%M:%S) check=${CHECK}s" >> "$LOG"
while true; do
  sleep "$CHECK"
  for pid in $(pgrep -f "python (-m signnet_basisnet_tpu|bench_ops|bench_roofline|bench.py|results/r3/probe_scan)" 2>/dev/null); do
    [ -r "/proc/$pid/stat" ] || continue
    read -r -a f < "/proc/$pid/stat"
    # pgrep -f also matches the `timeout NNN python ...` wrapper, which
    # legitimately idles — only watch the python process itself
    case "${f[1]}" in "(python"*) ;; *) continue ;; esac
    cpu=$(( f[13] + f[14] ))
    if [ -n "${prev[$pid]}" ]; then
      d=$(( cpu - prev[$pid] ))
      if [ "$d" -lt "$MIN_JIFFIES" ]; then
        cmd=$(tr '\0' ' ' < "/proc/$pid/cmdline" | cut -c1-120)
        echo "KILL $(date -u +%H:%M:%S) pid=$pid cpu_delta=$d cmd=$cmd" >> "$LOG"
        kill -TERM "$pid"
      fi
    fi
    prev[$pid]=$cpu
  done
done
