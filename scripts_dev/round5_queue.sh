#!/bin/bash
# Round-5 chip-job queue — SERIALIZED (one job at a time on the single
# tunneled v5e chip; round-4's 45% "variance" was contention from
# interleaved jobs, NOTES_ROUND5 task 3).
set -u
cd /root/repo
LOG=reports/round5/queue.log
mkdir -p reports/round5
run() {
  echo "=== $(date +%H:%M:%S) START: $*" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== $(date +%H:%M:%S) EXIT $?: $*" | tee -a "$LOG"
}

# Job 1 (task 6): populate the v7 bench cache — trains the 120-fruit
# orchard to 30k under the new tiered flagship default, then all bench rows
run timeout 3600 python bench.py

# Job 2 (task 2): plum-781 retrain at the flagship recipe, export N=1024
# (round-4 N=512 left 102/781 fruits with ZERO probes inside threshold —
# plum r=0.0244 is ~12.5 cells at N=512; 1024 doubles linear sampling)
run timeout 5400 python -m fruitnerf_tpu orchard-e2e \
  --num-fruits 781 --num-cameras 300 --image-size 512 --iters 30000 \
  --sparsity-loss 0.005 --export-n 1024 --seed 7 \
  --output-dir reports/round5/plum781_30k_N1024

echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$LOG"
