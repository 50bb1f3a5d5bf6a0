#!/bin/bash
# Tunnel-hang watchdog, r5 edition (same contract as r4: only ever watches
# and kills THE exact PID recorded in results/r5/chip.pid — never a
# pattern).  Every CHECK seconds, sample cumulative CPU jiffies; kill -TERM
# if the process advanced < MIN_JIFFIES since the previous sample of the
# SAME pid (a live run dispatches constantly; a wedged one is frozen).
# The queue's launch() loop logs the rc and the retry pass resumes from
# checkpoints.
CHECK=${1:-240}
MIN_JIFFIES=${2:-100}
cd /root/repo
LOG=results/r5/watchdog.log
echo "watchdog start $(date -u +%H:%M:%S) check=${CHECK}s" >> "$LOG"
prev=""
prevpid=""
while true; do
  sleep "$CHECK"
  pid=$(cat results/r5/chip.pid 2>/dev/null)
  if [ -z "$pid" ] || [ ! -r "/proc/$pid/stat" ]; then
    prevpid=""
    continue
  fi
  read -r -a f < "/proc/$pid/stat"
  cpu=$(( f[13] + f[14] ))
  if [ "$pid" = "$prevpid" ] && [ $(( cpu - prev )) -lt "$MIN_JIFFIES" ]; then
    echo "KILL $(date -u +%H:%M:%S) pid=$pid cpu_delta=$(( cpu - prev ))" >> "$LOG"
    kill -TERM "$pid"
  fi
  prev=$cpu
  prevpid=$pid
done
