#!/bin/sh
# resume-driven MUSE bench: the axon TPU worker dies ~50min into long runs,
# so rerun from checkpoints until the final JSON line appears.
# The log is truncated once per invocation of this script, so a stale
# '"metric"' line from a previous completed run can never fake a success;
# crash tails of THIS run's attempts still survive (appends within the loop).
cd /root/repo
N="$1"
LOG="muse_bench_$N.log"
: > "$LOG"
for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
  echo "==== $(date +%H:%M:%S) attempt $i (MDT_REGION_BACKEND=${MDT_REGION_BACKEND:-auto}) ====" >> "$LOG"
  timeout "${MUSE_ATTEMPT_TIMEOUT:-3500}" python tools/muse_bench.py "$N" muse_bench_out >> "$LOG" 2>&1
  grep -q '"metric"' "$LOG" && break
  echo "$(date +%H:%M:%S) retry $i (N=$N)" >> muse_attempts.log
  sleep 15
done
