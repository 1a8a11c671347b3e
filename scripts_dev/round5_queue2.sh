#!/bin/bash
# Round-5 chip-job queue #2 (run AFTER round5_queue.sh) — serialized.
set -u
cd /root/repo
LOG=reports/round5/queue2.log
mkdir -p reports/round5
run() {
  echo "=== $(date +%H:%M:%S) START: $*" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== $(date +%H:%M:%S) EXIT $?: $*" | tee -a "$LOG"
}

# Job 3 (tasks 1+5 closure): CLEAN path-of-record headline under the new
# tiered flagship default — no overrides, no resume; the committed round-5
# run resumed from step 4000 so its train_s covered only 26k iters.
run timeout 2400 python -m fruitnerf_tpu orchard-e2e \
  --num-fruits 283 --num-cameras 300 --image-size 512 --iters 30000 \
  --sparsity-loss 0.005 --export-n 512 --seed 7 \
  --output-dir reports/round5/headline283_30k

# Job 4 (task 3): speed probe with repeats — default (tiered) vs the old
# uniform-8192 recipe, 3 repeats each, median+min reported.
run timeout 3000 python -m fruitnerf_tpu speed-probe \
  --repeats 3 --only default_mid4096f4,uniform_T8192 \
  --output reports/round5/speed_probe.json

# Job 5 (task 4): big-preset two-tier capacity probe at 8k iters —
# T=65536 on the 6 finest levels, 8192 on the 10 coarser ones
# (round-4 verdict: T=32k uniform is short at max_res 4096).
run timeout 1800 python -m fruitnerf_tpu orchard-e2e \
  --num-fruits 283 --num-cameras 300 --image-size 512 --iters 8000 \
  --preset fruit_nerf_big --train-rays-per-batch 4096 \
  --table-size 65536 --mid-table-size 8192 --fine-levels 6 \
  --sparsity-loss 0.005 --export-n 512 --seed 7 \
  --output-dir reports/round5/big283_probe_t64kf6_8k

# Job 6 (task 7): non-smoke multi-scene campaign — 4 scenes x 50..101
# fruits, 256^2, 12k iters, real chip, one batched XLA program.
run timeout 3600 python -m fruitnerf_tpu multi-scene \
  --scenes 4 --num-fruits 50 --fruit-step 17 --num-cameras 200 \
  --image-size 256 --iters 12000 --export-n 384 \
  --train-rays-per-batch 2048 --seed 11 \
  --output-dir reports/round5/campaign4x

echo "QUEUE2 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
