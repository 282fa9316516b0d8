#!/bin/bash
# Round-5 on-chip queue, part 3: reprioritized after the fused-v2 in-pipeline
# A/B lost (full 6.28, c256 5.88 vs 10.64 img/s baseline — family refuted).
# Highest-value remaining jobs first, given ~35 min/job cold compiles:
#   1. geo_joint      — measure the committed d=40 (1024,1024) picker (r4: 4.77)
#   2. train_base     — train-step at HEAD (r4: 422.6 ms/step)
#   3. train_subpix   — sub-pixel decoder in the train VAE-decode sink
#   4. batch_sweep    — measured find_batch_size table (if time remains)
# Waits for any in-flight bench job (PID in /tmp/r5_wait.pid) to exit first.
set -u
cd /root/repo
mkdir -p perf/logs

if [[ -f /tmp/r5_wait.pid ]]; then
  w=$(cat /tmp/r5_wait.pid)
  while kill -0 "$w" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1"; shift
  echo "=== JOB $name: $* ==="
  local t0=$SECONDS
  timeout 2400 "$@" >"perf/logs/${name}.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc wall=$((SECONDS-t0))s tail:"; tail -4 "perf/logs/${name}.log"
}

run geo_joint     env E2EFT_BENCH=geowizard python bench.py
run train_base    env E2EFT_BENCH=train python bench.py
run train_subpix  env E2EFT_BENCH=train E2EFT_TRAIN_SUBPIX=1 python bench.py
run batch_sweep   python perf/batch_latency_sweep.py sweep

echo "=== ALL JOBS3 DONE ==="
