#!/bin/bash
# Tunnel-hang watchdog, r4 edition.  The axon TPU tunnel occasionally wedges
# a client process mid-call (futex wait, zero CPU progress — hit 4 runs in
# r3).  Unlike r3's pgrep-pattern watchdog, this one only ever watches/kills
# THE exact PID the queue recorded in results/r4/chip.pid (the single
# process allowed on the chip), so it can never touch an unrelated process.
# Every CHECK seconds, sample cumulative CPU jiffies; kill -TERM if the
# process advanced < MIN_JIFFIES since the previous sample of the SAME pid
# (a live run dispatches constantly; a wedged one is frozen).  The queue's
# launch() loop logs the rc and the retry pass resumes from checkpoints.
CHECK=${1:-240}
MIN_JIFFIES=${2:-100}   # ~1s of CPU per CHECK window
cd /root/repo
LOG=results/r4/watchdog.log
echo "watchdog start $(date -u +%H:%M:%S) check=${CHECK}s" >> "$LOG"
prev=""
prevpid=""
while true; do
  sleep "$CHECK"
  pid=$(cat results/r4/chip.pid 2>/dev/null)
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
