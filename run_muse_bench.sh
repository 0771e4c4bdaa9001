#!/bin/sh
# resume-driven MUSE bench: the axon TPU worker dies ~50min into long runs,
# so rerun from checkpoints until the final JSON line appears
cd /root/repo
for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
  timeout 3500 python tools/muse_bench.py "$1" muse_bench_out > "muse_bench_$1.log" 2>&1
  grep -q '"metric"' "muse_bench_$1.log" && break
  echo "$(date +%H:%M:%S) retry $i" >> muse_attempts.log
  sleep 30
done
