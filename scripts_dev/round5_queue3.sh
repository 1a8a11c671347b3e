#!/bin/bash
# Round-5 chip-job queue #3 — serialized. Jobs that need only committed
# code paths (default camera rig), so they can run while the camera-rig
# work is still being tested/committed.
set -u
cd /root/repo
LOG=reports/round5/queue3.log
mkdir -p reports/round5
run() {
  echo "=== $(date +%H:%M:%S) START: $*" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== $(date +%H:%M:%S) EXIT $?: $*" | tee -a "$LOG"
}

# Job A (task 5 closure): CLEAN no-resume path-of-record headline under the
# tiered flagship default. Fresh output dir (headline283_30k holds a
# preempted run with checkpoints that would trigger auto-resume). The scene
# is cached; expect ~700 s train + eval/export/count.
run timeout 2700 python -m fruitnerf_tpu orchard-e2e \
  --num-fruits 283 --num-cameras 300 --image-size 512 --iters 30000 \
  --sparsity-loss 0.005 --export-n 512 --seed 7 \
  --output-dir reports/round5/headline283_30k_clean

# Job B (task 4): resume the big-preset two-tier capacity probe to 8k
# iters (auto-resumes from ckpt_000002000 in the output dir).
run timeout 2400 python -m fruitnerf_tpu orchard-e2e \
  --num-fruits 283 --num-cameras 300 --image-size 512 --iters 8000 \
  --preset fruit_nerf_big --train-rays-per-batch 4096 \
  --table-size 65536 --mid-table-size 8192 --fine-levels 6 \
  --sparsity-loss 0.005 --export-n 512 --seed 7 \
  --output-dir reports/round5/big283_probe_t64kf6_8k

echo "QUEUE3 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
